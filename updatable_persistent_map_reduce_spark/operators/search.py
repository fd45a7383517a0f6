"""Tier B — text retrieval over ``documents``: inverted index + BM25.

The serving-side complement of the corpus pipeline: after cleaning /
dedup, a training-data platform indexes the corpus for inspection
queries ("which docs mention X", contamination spot checks, nearest
exemplars for an eval item). Absent from the reference (whose full
surface is MapReduce/MapReduceTask.cs:8-14 + Executer.cs:31,370) —
but its Map/Reduce pair IS the textbook inverted-index construction,
so this family is the reference's own motivating example expressed
Spark-first.

Scale notes: index construction is explode -> one partial+final
aggregation (map-side combine collapses each partition's repeats
before the single shuffle). BM25 scoring against a Q-term query
touches only the posting rows of the query's terms — the term filter
is pushed below the explode's aggregation, and the corpus-level
scalars (N, avgdl) are a 1-row broadcast join.

Float determinism across engines: every score input is an integer
(tf, df, dl, N) or one fixed-shape double expression; additions are
explicitly parenthesized identically in the Spark and DuckDB forms so
IEEE evaluation matches bit-for-bit (modulo libm ln(), guarded by
rounding to 4 decimals before the top-k ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_expr
from ..sources import Catalog
from . import register

TOP_TERMS = 100

_TOK_CTE = (
    "WITH t AS (SELECT doc_id, "
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') "
    "AS toks FROM documents)"
)


@register(
    "q_inverted_index",
    oracle=(
        _TOK_CTE + ", "
        "tok AS (SELECT doc_id, unnest(toks) AS token FROM t) "
        "SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, "
        "CAST(count(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY token "
        f"ORDER BY df DESC, tf DESC, token LIMIT {TOP_TERMS}"
    ),
    doc="Inverted-index vocabulary: per token, the document frequency "
    "(posting-list length) and total term frequency, top-100 by df "
    "with a fully deterministic (df, tf, token) total order. The "
    "reference's canonical map/reduce example (emit term->doc, reduce "
    "to posting lists) as one explode + one partially-aggregated "
    "shuffle; the full posting lists themselves would be written "
    "bucketed by term hash rather than collected.",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    tok = d.select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
        )
        .orderBy(F.desc("df"), F.desc("tf"), "token")
        .limit(TOP_TERMS)
    )


# ---------------------------------------------------------------------------
# BM25 ranking — fixed query, Okapi BM25 with k1=1.2, b=0.75.

QUERY_TERMS = ["hash", "join", "window"]
TOP_DOCS = 20


def bm25_chain_sql(sfx: str = "", where: str = "") -> str:
    """THE BM25 scoring CTE chain (d{sfx} .. sc{sfx}, with sc{sfx} =
    (doc_id, rounded score)), suffix-parameterized so one oracle can
    run it several times over different corpus slices. The SINGLE
    source of the scoring SQL: q_bm25, q_text_index_persisted,
    q_rank_fusion, and q_takedown_cascade's victim-selection /
    post-delete reads all derive their oracles from this builder — a
    k1/b/rounding retune lands everywhere at once instead of
    silently diverging a copy (the bpe_train_generations lesson
    applied to oracle SQL). ``where`` filters the documents scan
    (e.g. the takedown oracle's corpus-minus-victim slice); scoring
    stays the fixed-order form whose float determinism the module
    docstring explains."""
    cases = ", ".join(
        f"coalesce(max(CASE WHEN token = '{t}' THEN sc END), 0) AS s_{t}"
        for t in QUERY_TERMS
    )
    terms = "', '".join(QUERY_TERMS)
    total = f"s_{QUERY_TERMS[0]} + (s_{QUERY_TERMS[1]} + s_{QUERY_TERMS[2]})"
    return (
        f"d{sfx} AS (SELECT doc_id, len(toks) AS dl, toks FROM "
        "(SELECT doc_id, list_filter(string_split_regex(lower(text), "
        r"'\s+'), x -> x <> '') AS toks FROM documents"
        f"{where}) ), "
        f"g{sfx} AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM d{sfx}), "
        f"tf{sfx} AS (SELECT doc_id, dl, token, "
        "CAST(count(*) AS BIGINT) AS tf "
        f"FROM (SELECT doc_id, dl, unnest(toks) AS token FROM d{sfx}) "
        f"WHERE token IN ('{terms}') GROUP BY doc_id, dl, token), "
        f"dfreq{sfx} AS (SELECT token, CAST(count(*) AS BIGINT) AS df "
        f"FROM tf{sfx} GROUP BY token), "
        f"s{sfx} AS (SELECT tf{sfx}.doc_id, tf{sfx}.token, "
        f"ln(((g{sfx}.n_docs - dfreq{sfx}.df) + 0.5) / "
        f"(dfreq{sfx}.df + 0.5) + 1.0) * "
        f"(tf{sfx}.tf * 2.2 / (tf{sfx}.tf + 1.2 * (0.25 + 0.75 * "
        f"(tf{sfx}.dl / g{sfx}.avgdl)))) AS sc "
        f"FROM tf{sfx} CROSS JOIN g{sfx} "
        f"JOIN dfreq{sfx} ON tf{sfx}.token = dfreq{sfx}.token), "
        f"p{sfx} AS (SELECT doc_id, {cases} FROM s{sfx} "
        "GROUP BY doc_id), "
        f"sc{sfx} AS (SELECT doc_id, round({total}, 4) AS score "
        f"FROM p{sfx})"
    )


def _bm25_oracle() -> str:
    return (
        "WITH "
        + bm25_chain_sql()
        + " SELECT doc_id, score FROM sc "
        f"ORDER BY score DESC, doc_id LIMIT {TOP_DOCS}"
    )


@register(
    "q_bm25",
    oracle=_bm25_oracle(),
    doc="Okapi BM25 (k1=1.2, b=0.75) ranking of the corpus against a "
    "fixed 3-term query, top-20 by rounded score with doc_id "
    "tiebreak. Plan: the token explode is filtered to the query terms "
    "BEFORE its aggregation (postings of 3 terms, not the whole "
    "vocabulary, cross the wire), corpus scalars (N, avgdl) arrive as "
    "a broadcast 1-row join, per-term partial scores pivot to columns "
    "via order-independent MAX so the final sum has a fixed, "
    "engine-identical evaluation order. At 100 TB this is the "
    "scatter-gather scoring path of a distributed index: per-partition "
    "top-k then a k*P driver merge, never a global sort.",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return (
        bm25_score_frame(d)
        .orderBy(F.desc("score"), "doc_id")
        .limit(TOP_DOCS)
    )


def query_term_tf(d: DataFrame) -> DataFrame:
    """(doc_id, dl, token, tf) for the query terms — the ONE term-
    filtered posting aggregate both rankers share (only the 3 query
    terms' postings cross the wire). q_rank_fusion's TF pool derives
    from this same frame so its exchange is plan-identical to BM25's
    and Spark's ReuseExchange executes the scan+shuffle once."""
    docs = d.select(
        "doc_id", tokens_expr(F.col("text")).alias("toks")
    ).select("doc_id", F.size("toks").alias("dl"), "toks")
    return (
        docs.select("doc_id", "dl", F.explode("toks").alias("token"))
        .filter(F.col("token").isin(QUERY_TERMS))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_score_frame(d: DataFrame) -> DataFrame:
    """(doc_id, score) — every doc matching >= 1 query term with its
    rounded BM25 score; the top-k cut is the caller's (q_bm25 takes
    TOP_DOCS, q_rank_fusion takes its candidate pool)."""
    docs = d.select(
        "doc_id", tokens_expr(F.col("text")).alias("toks")
    ).select("doc_id", F.size("toks").alias("dl"), "toks")
    g = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = query_term_tf(d)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    s = (
        tf.crossJoin(F.broadcast(g))
        .join(F.broadcast(dfreq), "token")
        .select(
            "doc_id",
            "token",
            (
                F.log(
                    ((F.col("n_docs") - F.col("df")) + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (
                    F.col("tf")
                    * F.lit(2.2)
                    / (
                        F.col("tf")
                        + F.lit(1.2)
                        * (
                            F.lit(0.25)
                            + F.lit(0.75) * (F.col("dl") / F.col("avgdl"))
                        )
                    )
                )
            ).alias("sc"),
        )
    )
    p = s.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("token") == t, F.col("sc"))), F.lit(0.0)
            ).alias(f"s_{t}")
            for t in QUERY_TERMS
        ]
    )
    total = F.col(f"s_{QUERY_TERMS[0]}") + (
        F.col(f"s_{QUERY_TERMS[1]}") + F.col(f"s_{QUERY_TERMS[2]}")
    )
    return p.select("doc_id", F.round(total, 4).alias("score"))


# ---------------------------------------------------------------------------
# TF-IDF document vectors — the sparse-vector complement of BM25.


TFIDF_TOP = 5


@register(
    "q_tfidf_vectors",
    oracle=(
        _TOK_CTE + ", "
        "tok AS (SELECT doc_id, unnest(toks) AS token FROM t), "
        "tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY 1, 2), "
        "df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
        "FROM tok GROUP BY 1), "
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), "
        "s AS (SELECT doc_id, tf.token, "
        "round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf "
        "FROM tf JOIN df ON tf.token = df.token CROSS JOIN n) "
        "SELECT doc_id, token, tfidf, CAST(rn AS INTEGER) AS rn FROM ("
        "SELECT doc_id, token, tfidf, row_number() OVER ("
        "PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn FROM s) "
        f"WHERE rn <= {TFIDF_TOP}"
    ),
    doc="Sparse TF-IDF document vectors, top-5 weighted terms per doc: "
    "tf per (doc, term), smoothed idf = ln((N+1)/(df+1)) + 1 "
    "(sklearn's smooth_idf form), score rounded to 4 decimals BEFORE "
    "ranking so both engines break libm-ln near-ties identically, "
    "then row_number per doc with a (score desc, token) total order. "
    "Plan: two aggregations sharing the exploded token frame (by "
    "(doc,term) and by term), the corpus-size scalar as a 1-row "
    "broadcast cross join (no driver collect), and the final window "
    "over per-doc groups. The featurization stage of a classical "
    "retrieval / clustering pipeline; the dense twin is "
    "q_embed_quantize.",
)
def q_tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = Catalog(spark, sf_dir).documents
    tok = d.select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df")
    )
    n = d.agg(F.count(F.lit(1)).alias("n"))
    s = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                ),
                4,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        s.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP)
        .select("doc_id", "token", "tfidf", "rn")
    )


# ---------------------------------------------------------------------------
# persisted inverted index — build once, score many (plans/text_index.py).


@register(
    "q_text_index_persisted",
    oracle=_bm25_oracle(),
    doc="BM25 through a PERSISTED inverted index (plans/text_index.py): "
    "postings (token, doc_id, tf, dl) written once into a "
    "ManifestTable bucketed by term-hash span, corpus scalars "
    "(n_docs, total_dl) as driver JSON, then the fixed 3-term query "
    "scored against ONLY the query terms' spans — manifest span "
    "pruning applied to text retrieval, the reference's "
    "materialize-once point-read contract (Executer.cs:370-376) for "
    "search. Supports incremental document appends (atomic snapshot, "
    "merged stats — tests/test_llm_ops.py lifecycle test). Shares "
    "q_bm25's oracle: same tokenization, same postings, identical "
    "fixed-order scoring.",
)
def q_text_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..plans.text_index import InvertedIndex

    d = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    idx = InvertedIndex(spark, tempfile.mkdtemp(prefix="upmr_inv_"))
    idx.build(d)
    return idx.bm25(QUERY_TERMS, k=TOP_DOCS)


# ---------------------------------------------------------------------------
# reciprocal-rank fusion — hybrid retrieval over two rankers.

RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
RRF_POOL = 50  # candidate pool depth per ranker
RRF_SCALE = 1_000_000  # integer fixed-point: floor(SCALE / (K + rank))


def _rank_fusion_oracle() -> str:
    return (
        "WITH "
        + bm25_chain_sql()
        + ", "
        "bm AS (SELECT doc_id, score FROM sc "
        f"ORDER BY score DESC, doc_id LIMIT {RRF_POOL}), "
        "bmr AS (SELECT doc_id, row_number() OVER "
        "(ORDER BY score DESC, doc_id) AS rnk FROM bm), "
        "hsum AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS hits "
        "FROM tf GROUP BY doc_id), "
        f"tfp AS (SELECT doc_id, hits FROM hsum "
        f"ORDER BY hits DESC, doc_id LIMIT {RRF_POOL}), "
        "tfr AS (SELECT doc_id, row_number() OVER "
        "(ORDER BY hits DESC, doc_id) AS rnk FROM tfp) "
        "SELECT doc_id, rrf_score, bm25_rank, tf_rank FROM ("
        "SELECT COALESCE(b.doc_id, t2.doc_id) AS doc_id, "
        f"CAST(COALESCE({RRF_SCALE} // ({RRF_K} + b.rnk), 0) "
        f"+ COALESCE({RRF_SCALE} // ({RRF_K} + t2.rnk), 0) AS BIGINT) "
        "AS rrf_score, "
        "CAST(b.rnk AS INTEGER) AS bm25_rank, "
        "CAST(t2.rnk AS INTEGER) AS tf_rank "
        "FROM bmr b FULL JOIN tfr t2 ON b.doc_id = t2.doc_id) "
        f"ORDER BY rrf_score DESC, doc_id LIMIT {TOP_DOCS}"
    )


@register(
    "q_rank_fusion",
    oracle=_rank_fusion_oracle(),
    doc="RECIPROCAL-RANK FUSION (r10, Cormack et al. 2009 — the hybrid-"
    "retrieval merge every RAG stack runs between its lexical and "
    "second ranker): two top-50 candidate lists for the same fixed "
    "query — BM25 (idf-weighted) and raw term-frequency (lexical "
    "recall) — fuse by integer RRF: floor(1e6 / (60 + rank)) summed "
    "over the lists a doc appears in, top-20 by fused score with "
    "doc_id tiebreak. Ranks come from row_number over (rounded score "
    "desc, doc_id), so both engines agree exactly, and the fused "
    "score is pure integer arithmetic — hash-exact, no float "
    "boundary. Plan: both rankers share ONE term-filtered posting "
    "aggregate (the 3 query terms' postings are the only shuffled "
    "rows); the pools are 50-row TakeOrdered results; the fusion is a "
    "full outer join of two 50-row frames — driver-trivial at any "
    "corpus size, which is the point of pool-then-fuse: at 100 TB "
    "each ranker does a distributed top-k (per-partition k + k*P "
    "merge), fusion never touches the corpus.",
)
def q_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = Catalog(spark, sf_dir).documents
    bm = (
        bm25_score_frame(d)
        .orderBy(F.desc("score"), "doc_id")
        .limit(RRF_POOL)
    )
    bmr = bm.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.desc("score"), "doc_id")),
    ).select("doc_id", F.col("rnk").alias("brnk"))
    # the TF pool re-aggregates the SAME posting frame bm25_score_frame
    # consumes (r10 review: a fresh explode/filter scan doubled the
    # dominant cost) — sum of per-term tf == total query-term hits
    hits = (
        query_term_tf(d)
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("hits"))
    )
    tfp = hits.orderBy(F.desc("hits"), "doc_id").limit(RRF_POOL)
    tfr = tfp.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.desc("hits"), "doc_id")),
    ).select("doc_id", F.col("rnk").alias("trnk"))
    fused = bmr.join(tfr, "doc_id", "full").select(
        "doc_id",
        (
            F.expr(f"coalesce({RRF_SCALE} DIV ({RRF_K} + brnk), 0)")
            + F.expr(f"coalesce({RRF_SCALE} DIV ({RRF_K} + trnk), 0)")
        )
        .cast("long")
        .alias("rrf_score"),
        F.col("brnk").cast("int").alias("bm25_rank"),
        F.col("trnk").cast("int").alias("tf_rank"),
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(TOP_DOCS)
