"""Tier B — training-data pipeline operators over ``documents``.

The corpus-preparation steps a 100 TB pretraining pipeline runs after
dedup/quality scoring (north star in BASELINE.json; all ABSENT from
the reference, whose full API is MapReduce/MapReduceTask.cs:8-14 +
Executer.cs:31,370):

- deterministic sampling  q_sample_hash    [oracle]
- decontamination         q_decontaminate  [oracle]
- shard packing           q_shard_pack     [oracle]

Scale notes inline per operator; everything is JVM-side Catalyst with
one scan + at most one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.prefix import distributed_prefix_sum
from ..functions.text import shingle_strings_udf, tokens_expr
from ..sources import Catalog
from . import register

# ---------------------------------------------------------------------------
# deterministic sampling — reproducible splits without RNG state.

_KNUTH = 2654435761  # Knuth multiplicative hash constant
_M32 = 4294967296
SAMPLE_PCT = 10


@register(
    "q_sample_hash",
    oracle=(
        f"SELECT doc_id, lang, source FROM documents "
        f"WHERE (doc_id * {_KNUTH}) % {_M32} % 100 < {SAMPLE_PCT}"
    ),
    doc="Deterministic 10% corpus sample: multiplicative hash of doc_id "
    "mod 100 — reproducible across runs/engines (unlike rand()-based "
    "sample()), composable into disjoint train/val/test splits by hash "
    "range, and pushed to the scan as a pure predicate (no shuffle, no "
    "RNG state to coordinate across 1000 executors).",
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    bucket = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_M32) % F.lit(100)
    return d.filter(bucket < SAMPLE_PCT).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# stratified sampling — per-stratum rates, still fully deterministic.

# Rebalancing rates: downsample the dominant language, oversample the
# tails — the language-mix control knob of a pretraining data recipe.
_STRATA_PCT = {"en": 10, "es": 30, "fr": 30, "de": 30}
_DEFAULT_PCT = 20  # any stratum not listed (zh, future langs)

_STRATA_CASE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_PCT.items())
    + f" ELSE {_DEFAULT_PCT} END"
)


@register(
    "q_sample_stratified",
    oracle=(
        f"SELECT doc_id, lang, source FROM documents "
        f"WHERE (doc_id * {_KNUTH}) % {_M32} % 100 < {_STRATA_CASE_SQL}"
    ),
    doc="Stratified deterministic sampling: per-language keep rates "
    "(downsample the dominant lang, oversample tails — the data-mix "
    "rebalancing step of a corpus recipe) applied through the same "
    "multiplicative doc_id hash as q_sample_hash, so strata rates can "
    "be retuned without reshuffling membership: a doc kept at 10% is "
    "still kept at 30% (nested samples by construction). Pure pushed "
    "predicate over one scan — no shuffle, no RNG state; the CASE "
    "rate table and the Spark when-chain are generated from the same "
    "dict so the two engines cannot drift.",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    bucket = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_M32) % F.lit(100)
    pct = None
    for lang, p in _STRATA_PCT.items():
        cond = F.col("lang") == lang
        pct = F.when(cond, p) if pct is None else pct.when(cond, p)
    pct = pct.otherwise(F.lit(_DEFAULT_PCT))
    return d.filter(bucket < pct).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# decontamination — remove training docs sharing n-grams with an
# evaluation/benchmark set.

_EVAL_MOD = 97  # stand-in eval set: every 97th doc


@register(
    "q_decontaminate",
    oracle=(
        "WITH sh AS (SELECT doc_id, "
        "unnest(list_distinct(list_transform(range(1, "
        "greatest(len(toks) - 2, 1) + 1), i -> "
        "array_to_string(toks[i:i+2], ' ')))) AS s FROM ("
        "SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), "
        "t -> t <> '') AS toks FROM documents)), "
        f"eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % {_EVAL_MOD} = 0), "
        f"train AS (SELECT * FROM sh WHERE doc_id % {_EVAL_MOD} <> 0) "
        "SELECT train.doc_id, CAST(count(*) AS BIGINT) AS n_shared "
        "FROM train JOIN eval_sh ON train.s = eval_sh.s "
        "GROUP BY train.doc_id"
    ),
    doc="Benchmark decontamination: word-3gram overlap between the "
    "training corpus and a held-out eval set (here: doc_id % 97 == 0). "
    "Reports each contaminated train doc with its shared-shingle count; "
    "a pipeline drops them (anti-join) or thresholds on n_shared. At "
    "scale: eval shingle sets are millions of rows vs the corpus's "
    "trillions, so the join broadcasts the eval side and the only "
    "shuffle is the per-doc count aggregation. Shingling is the "
    "Arrow-batched UDF (functions/text.py:shingle_strings_udf, "
    "measured 5x the interpreted HOF pipeline), per-doc-distinct at "
    "the source so the explode never emits repeats.",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    sh = d.select(
        "doc_id",
        F.explode(shingle_strings_udf(3, distinct=True)("text")).alias("s"),
    )
    eval_sh = (
        sh.filter(F.col("doc_id") % _EVAL_MOD == 0).select("s").distinct()
    )
    train = sh.filter(F.col("doc_id") % _EVAL_MOD != 0)
    return (
        train.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# shard packing — bin documents into fixed-budget output shards.

SHARD_BUDGET = 100_000  # chars per shard


@register(
    "q_shard_pack",
    oracle=(
        "SELECT doc_id, CAST(floor(CAST(cum_before AS DOUBLE) / "
        f"{SHARD_BUDGET}) AS BIGINT) AS shard_id FROM ("
        "SELECT doc_id, coalesce(sum(n_chars) OVER ("
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
        "), 0) AS cum_before FROM documents)"
    ),
    doc="Shard packing: assign docs (in stable doc_id order) to "
    "fixed-size output shards by running char budget — the write-side "
    "step that turns a cleaned corpus into uniform training files. "
    "Computed as a two-pass distributed prefix sum (range buckets -> "
    "bucket-partitioned local windows + broadcast bucket offsets, "
    "functions/prefix.py) — no single-partition window anywhere, so "
    "the plan survives 100 TB; the shard assignment stays a "
    "deterministic function of the sort key and the oracle unchanged.",
)
def q_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents.select("doc_id", "n_chars")
    packed = distributed_prefix_sum(d, "doc_id", F.col("n_chars"))
    return packed.select(
        "doc_id",
        F.floor(F.col("cum_before") / SHARD_BUDGET).cast("long").alias(
            "shard_id"
        ),
    )


# ---------------------------------------------------------------------------
# end-to-end corpus preparation — the stages composed into ONE plan.


@register(
    "q_corpus_prep",
    oracle=(
        "WITH scored AS (SELECT doc_id, text, lang, n_chars, "
        "len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) "
        "AS n_tokens FROM documents), "
        "filtered AS (SELECT * FROM scored WHERE n_tokens >= 10 AND n_chars >= 50), "
        "deduped AS (SELECT * FROM filtered QUALIFY row_number() OVER ("
        "PARTITION BY sha256(text) ORDER BY doc_id) = 1), "
        "packed AS (SELECT doc_id, lang, n_tokens, "
        "coalesce(sum(n_tokens) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before "
        "FROM deduped) "
        "SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST(floor(CAST(tok_before AS DOUBLE) / 5000) AS BIGINT) AS shard_id "
        "FROM packed"
    ),
    doc="End-to-end corpus preparation in ONE declarative plan: quality "
    "filter (min tokens + min chars) -> exact dedup keeping the lowest "
    "doc_id per content hash -> token-budget shard assignment. One "
    "dedup shuffle; every stage's predicate is visible to Catalyst, so "
    "filters run before the dedup shuffle and column pruning reaches "
    "the parquet scan. Shard assignment uses the two-pass distributed "
    "prefix sum (functions/prefix.py) — no single-partition window; "
    "its extra passes scan only the slim (doc_id, n_tokens) "
    "projection, the same trade Spark's own global sort makes for "
    "range-boundary sampling. The composability proof that the "
    "operator families chain without materialization barriers.",
)
def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    scored = d.select(
        "doc_id",
        "text",
        "lang",
        "n_chars",
        # counting maximal \S+ runs == len(filter(split(\s+), != ''))
        # but stays inside whole-stage codegen (q_text_stats' measured
        # trade: the HOF pipeline is interpreted)
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
        ).alias("n_tokens"),
    )
    filtered = scored.filter(
        (F.col("n_tokens") >= 10) & (F.col("n_chars") >= 50)
    )
    w_dedup = W.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    deduped = (
        filtered.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "text", "n_chars")
    )
    packed = distributed_prefix_sum(
        deduped, "doc_id", F.col("n_tokens"), out_col="tok_before"
    )
    return packed.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(F.col("tok_before") / 5000).cast("long").alias("shard_id"),
    )


# ---------------------------------------------------------------------------
# quality funnel — survival counts per pipeline stage (observability).


def _funnel_flags_sql() -> str:
    """Shared oracle CTEs ``t``/``s``/``f``: per-doc funnel flags with
    doc_id carried through — the SQL twin of ``_funnel_flags``, used
    by both the funnel counts and the drop audit so the two oracles
    can never disagree about a predicate."""
    from .text_analysis import _STOPWORDS, _hits_sql

    hits = ", ".join(f"{_hits_sql(lang)} AS h_{lang}" for lang in _STOPWORDS)
    anyhit = " + ".join(f"h_{lang}" for lang in _STOPWORDS)
    return (
        "WITH t AS (SELECT doc_id, text, n_chars, "
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') "
        "AS toks FROM documents), "
        f"s AS (SELECT doc_id, text, n_chars, toks, {hits}, "
        "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS npunct FROM t), "
        "f AS (SELECT doc_id, "
        f"(({anyhit}) > 0) AS g1, "
        "(len(toks) >= 20 AND len(toks) <= 1000 "
        "AND CAST(npunct AS DOUBLE) / greatest(n_chars, 1) < 0.1 "
        "AND CAST(h_en AS DOUBLE) / greatest(len(toks), 1) >= 0.01) AS q, "
        "(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / "
        "greatest(len(toks), 1) <= 0.5) AS nr, "
        "(row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1) "
        "AS fs FROM s)"
    )


def _funnel_oracle() -> str:
    return (
        _funnel_flags_sql() + ", "
        "g AS (SELECT CAST(count(*) AS BIGINT) AS n0, "
        "CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, "
        "CAST(sum(CASE WHEN g1 AND q THEN 1 ELSE 0 END) AS BIGINT) AS n2, "
        "CAST(sum(CASE WHEN g1 AND q AND nr THEN 1 ELSE 0 END) AS BIGINT) AS n3, "
        "CAST(sum(CASE WHEN g1 AND q AND nr AND fs THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n4 FROM f) "
        "SELECT CAST(0 AS INTEGER) AS stage_id, 'all' AS stage, n0 AS n_docs FROM g "
        "UNION ALL SELECT 1, 'lang_known', n1 FROM g "
        "UNION ALL SELECT 2, 'quality', n2 FROM g "
        "UNION ALL SELECT 3, 'non_repetitive', n3 FROM g "
        "UNION ALL SELECT 4, 'unique', n4 FROM g"
    )


def _funnel_flags(d: DataFrame) -> DataFrame:
    """Per-doc funnel flags (doc_id, g1, q, nr, fs) — every predicate
    the exact expression of its standalone operator; shared by the
    funnel counts and the drop audit so the two queries reconcile."""
    from .text_analysis import _STOPWORDS, stopword_hits

    toks = tokens_expr(F.col("text"))
    base = d.select("doc_id", "text", "n_chars", toks.alias("toks"))
    for lang, words in _STOPWORDS.items():
        base = base.withColumn(f"h_{lang}", stopword_hits(F.col("toks"), words))
    ntok = F.greatest(F.size("toks"), F.lit(1))
    npunct = F.size(
        F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))
    )
    punct_ratio = npunct.cast("double") / F.greatest(F.col("n_chars"), F.lit(1))
    stop_ratio = F.col("h_en").cast("double") / ntok
    anyhit = None
    for lang in _STOPWORDS:
        h = F.col(f"h_{lang}")
        anyhit = h if anyhit is None else anyhit + h
    return base.select(
        "doc_id",
        (anyhit > 0).alias("g1"),
        (
            (F.size("toks") >= 20)
            & (F.size("toks") <= 1000)
            & (punct_ratio < 0.1)
            & (stop_ratio >= 0.01)
        ).alias("q"),
        (
            F.lit(1.0) - F.size(F.array_distinct("toks")).cast("double") / ntok
            <= 0.5
        ).alias("nr"),
        (
            F.row_number().over(
                W.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
            )
            == 1
        ).alias("fs"),
    )


@register(
    "q_quality_funnel",
    oracle=_funnel_oracle(),
    doc="Pipeline observability: how many documents survive each "
    "cleaning stage — all -> language identified (any stopword hit) -> "
    "quality gate (length band, punctuation density, stopword ratio; "
    "the q_quality_score gate) -> non-repetitive (duplicate-token "
    "fraction <= 0.5) -> unique (first occurrence per content hash). "
    "Stages are CUMULATIVE (each applies on top of the previous), "
    "matching how the real funnel composes, and every predicate reuses "
    "the exact expression of its standalone operator so the funnel "
    "numbers reconcile with the per-doc outputs. One scan + one "
    "content-hash window shuffle + a 1-row conditional aggregate, "
    "unpivoted to (stage_id, stage, n_docs) — the per-stage counts a "
    "100 TB run logs to its dashboard every batch.",
)
def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = _funnel_flags(Catalog(spark, sf_dir).documents)
    g = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("g1").cast("int")).alias("n1"),
        F.sum((F.col("g1") & F.col("q")).cast("int")).alias("n2"),
        F.sum((F.col("g1") & F.col("q") & F.col("nr")).cast("int")).alias("n3"),
        F.sum(
            (F.col("g1") & F.col("q") & F.col("nr") & F.col("fs")).cast("int")
        ).alias("n4"),
    )
    stages = ["all", "lang_known", "quality", "non_repetitive", "unique"]
    return g.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("stage_id"),
                        F.lit(s).alias("stage"),
                        F.col(f"n{i}").cast("long").alias("n_docs"),
                    )
                    for i, s in enumerate(stages)
                ]
            )
        ).alias("s")
    ).select("s.*")


_DROP_REASON_SQL = (
    "CASE WHEN NOT g1 THEN 'lang_unknown' "
    "WHEN NOT q THEN 'low_quality' "
    "WHEN NOT nr THEN 'repetitive' "
    "WHEN NOT fs THEN 'duplicate' "
    "ELSE 'kept' END"
)


def _drop_audit_oracle() -> str:
    return (
        _funnel_flags_sql() + ", "
        f"r AS (SELECT doc_id, {_DROP_REASON_SQL} AS reason FROM f), "
        "cnt AS (SELECT reason, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM r GROUP BY reason), "
        "rk AS (SELECT reason, doc_id, row_number() OVER "
        "(PARTITION BY reason ORDER BY doc_id) AS rn FROM r), "
        "ex AS (SELECT reason, "
        "array_to_string(list_sort(list(doc_id)), ',') AS exemplars "
        "FROM rk WHERE rn <= 3 GROUP BY reason) "
        "SELECT reason, n_docs, exemplars "
        "FROM cnt JOIN ex USING (reason)"
    )


@register(
    "q_drop_audit",
    oracle=_drop_audit_oracle(),
    doc="Pipeline explainability: WHY was each document dropped — the "
    "per-doc complement of q_quality_funnel's aggregate counts. Each "
    "doc is assigned its FIRST failing stage (lang_unknown -> "
    "low_quality -> repetitive -> duplicate -> kept), reusing the "
    "funnel's exact flag expressions (_funnel_flags, shared code, so "
    "audit and funnel can never disagree about a predicate); output "
    "is per-reason counts plus the 3 smallest doc_ids as "
    "deterministic exemplars — the 'show me dropped samples' "
    "debugging loop every corpus pipeline needs. Exemplars come from "
    "a rank-filtered frame (row_number <= 3 per reason), NOT a "
    "collect_list over all members — per-group state stays O(3) at "
    "any corpus size; counts aggregate separately and join back on "
    "the tiny reason domain.",
)
def q_drop_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = _funnel_flags(Catalog(spark, sf_dir).documents)
    reason = (
        F.when(~F.col("g1"), F.lit("lang_unknown"))
        .when(~F.col("q"), F.lit("low_quality"))
        .when(~F.col("nr"), F.lit("repetitive"))
        .when(~F.col("fs"), F.lit("duplicate"))
        .otherwise(F.lit("kept"))
    )
    r = flags.select("doc_id", reason.alias("reason"))
    cnt = r.groupBy("reason").agg(F.count(F.lit(1)).alias("n_docs"))
    ex = (
        r.withColumn(
            "rn",
            F.row_number().over(W.partitionBy("reason").orderBy("doc_id")),
        )
        .filter(F.col("rn") <= 3)
        .groupBy("reason")
        .agg(
            # numeric sort FIRST, then stringify — a string sort would
            # order "10" before "2"; CSV string because the driver's
            # hash canonicalization has no array representation
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("exemplars")
        )
    )
    return cnt.join(ex, "reason")


# ---------------------------------------------------------------------------
# corpus length profile — banded histogram (observability).

_LEN_BANDS = [(0, 100), (100, 300), (300, 1000), (1000, 3000)]  # chars


def _band_case_sql() -> str:
    whens = " ".join(
        f"WHEN n_chars < {hi} THEN {i}"
        for i, (_, hi) in enumerate(_LEN_BANDS)
    )
    return f"CASE {whens} ELSE {len(_LEN_BANDS)} END"


def _band_label(i: int) -> str:
    if i < len(_LEN_BANDS):
        lo, hi = _LEN_BANDS[i]
        return f"[{lo},{hi})"
    return f"[{_LEN_BANDS[-1][1]},inf)"


def _band_label_sql() -> str:
    whens = " ".join(
        f"WHEN band_id = {i} THEN '{_band_label(i)}'"
        for i in range(len(_LEN_BANDS))
    )
    return f"CASE {whens} ELSE '{_band_label(len(_LEN_BANDS))}' END"


@register(
    "q_doc_len_histogram",
    oracle=(
        f"WITH b AS (SELECT {_band_case_sql()} AS band_id, n_chars "
        "FROM documents), "
        "g AS (SELECT band_id, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM b GROUP BY band_id), "
        "t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM g) "
        f"SELECT band_id, {_band_label_sql()} AS band, n_docs, "
        "round(CAST(n_docs AS DOUBLE) / total, 4) AS share, "
        "round(CAST(sum_chars AS DOUBLE) / n_docs, 2) AS avg_chars "
        "FROM g CROSS JOIN t"
    ),
    doc="Corpus length profile: documents banded by character count "
    "(the length-distribution panel of a data-quality dashboard; band "
    "edges are the typical too-short / short / normal / long / "
    "too-long cut points a recipe thresholds on), with per-band share "
    "of corpus and mean length. Integer sums feed every double "
    "division, so the stats are bit-identical across engines. One "
    "scan, one tiny aggregation, a broadcast 1-row total join — "
    "map-side banding, no Python.",
)
def q_doc_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    band = None
    for i, (_, hi) in enumerate(_LEN_BANDS):
        cond = F.col("n_chars") < hi
        band = F.when(cond, i) if band is None else band.when(cond, i)
    band = band.otherwise(F.lit(len(_LEN_BANDS)))
    g = (
        d.select(band.alias("band_id"), "n_chars")
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
    t = g.agg(F.sum("n_docs").alias("total"))
    label = None
    for i in range(len(_LEN_BANDS)):
        cond = F.col("band_id") == i
        lbl = F.lit(_band_label(i))
        label = F.when(cond, lbl) if label is None else label.when(cond, lbl)
    label = label.otherwise(F.lit(_band_label(len(_LEN_BANDS))))
    return g.crossJoin(F.broadcast(t)).select(
        "band_id",
        label.alias("band"),
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 4).alias(
            "share"
        ),
        F.round(
            F.col("sum_chars").cast("double") / F.col("n_docs"), 2
        ).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# weighted resampling — per-source epoch factors (data-mix upsampling).

_FACTOR_SQL = (
    "CASE WHEN CAST(substr(source, 4) AS INTEGER) < 5 THEN 3 "
    "WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 2 ELSE 1 END"
)


@register(
    "q_resample_weighted",
    oracle=(
        f"WITH w AS (SELECT doc_id, source, {_FACTOR_SQL} AS factor "
        "FROM documents) "
        "SELECT doc_id, source, CAST(copy_id AS INTEGER) AS copy_id "
        "FROM (SELECT doc_id, source, "
        "unnest(range(1, factor + 1)) AS copy_id FROM w)"
    ),
    doc="Weighted corpus resampling: integer per-source epoch factors "
    "(high-quality sources repeated 3x, mid 2x, rest 1x — the "
    "deterministic data-mix upsampling of a pretraining recipe, vs "
    "the DOWN-sampling knob of q_sample_stratified). Each doc emits "
    "factor rows tagged copy_id, so shuffling downstream (shard "
    "packing) interleaves the repeats. Map-side sequence+explode — "
    "no shuffle, no RNG; factors live in one expression shared with "
    "the oracle so the engines cannot drift. Fractional factors "
    "compose with the stratified hash sample (e.g. 2.5x = 2x + a 50% "
    "deterministic-hash extra copy).",
)
def q_resample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    n = F.substring("source", 4, 10).cast("int")
    factor = (
        F.when(n < 5, 3).when(n < 10, 2).otherwise(1)
    )
    return d.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), factor)).alias("copy_id"),
    )


# ---------------------------------------------------------------------------
# context-window chunking — fixed-size overlapping token windows.

_CHUNK_SIZE = 32  # tokens per chunk (a stand-in for a model context)
_CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@register(
    "q_chunk_split",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "COALESCE(list_filter(string_split_regex(lower(text), "
        "'\\s+'), x -> x <> ''), []) AS toks FROM documents), "
        "s AS (SELECT doc_id, toks, "
        f"unnest(range(0, len(toks), {_CHUNK_STRIDE})) AS start "
        "FROM t WHERE len(toks) > 0) "
        f"SELECT doc_id, CAST(start / {_CHUNK_STRIDE} AS INTEGER) "
        "AS chunk_id, "
        f"array_to_string(toks[start + 1 : start + {_CHUNK_SIZE}], ' ') "
        "AS chunk, "
        f"CAST(least({_CHUNK_SIZE}, len(toks) - start) AS INTEGER) "
        "AS chunk_tokens FROM s"
    ),
    doc="Context-window chunking: every document is split into "
    f"fixed-size token windows ({_CHUNK_SIZE} tokens, stride "
    f"{_CHUNK_STRIDE} = {_CHUNK_SIZE - _CHUNK_STRIDE}-token overlap) — "
    "the step that turns a cleaned corpus into training sequences. "
    "Pure Catalyst: tokenize (shared tokens_expr), sequence() the "
    "chunk starts, posexplode, slice+array_join per window. Map-side "
    "1->N emit with NO shuffle and no Python — the same scan-local "
    "shape as q_resample_weighted, so at 100 TB it streams: each "
    "input split emits its chunks straight to the sink. The overlap "
    "is carried by re-slicing the in-memory token array, never by "
    "re-reading input. Oracle reproduces tokenizer+slicing exactly "
    "(DuckDB list slicing is 1-based inclusive = slice(toks, "
    "start+1, size)).",
)
def q_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = tokens_expr(F.col("text"))
    n = F.size("toks")
    starts = F.sequence(F.lit(0), n - F.lit(1), F.lit(_CHUNK_STRIDE))
    return (
        d.select("doc_id", toks.alias("toks"))
        .filter(n > 0)
        .select("doc_id", "toks", F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            "doc_id",
            "chunk_id",
            F.array_join(
                F.slice("toks", F.col("start") + 1, _CHUNK_SIZE), " "
            ).alias("chunk"),
            F.least(F.lit(_CHUNK_SIZE), F.size("toks") - F.col("start"))
            .cast("int")
            .alias("chunk_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# data-mix scheduler — hit a target source mixture, deterministically.

# Target mixture over source groups, in integer weight units (sum 100).
# Groups bucket the 20 synthetic sources the way a recipe buckets
# crawl/curated/reference corpora.
_MIX_WEIGHTS = [("web", 60), ("curated", 25), ("reference", 15)]
_MIX_D = 1_000_000  # hash-bucket denominator for the sampling predicate

_MIX_GRP_SQL = (
    "CASE WHEN CAST(substr(source, 4) AS INT) < 10 THEN 'web' "
    "WHEN CAST(substr(source, 4) AS INT) < 15 THEN 'curated' "
    "ELSE 'reference' END"
)


@register(
    "q_data_mix",
    oracle=(
        "WITH g AS (SELECT " + _MIX_GRP_SQL + " AS grp, doc_id, n_chars "
        "FROM documents), "
        "tok AS (SELECT grp, SUM(n_chars) AS tokens FROM g GROUP BY grp), "
        "w AS (SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', {wt})" for g, wt in _MIX_WEIGHTS)
        + ") AS t(grp, wt)), "
        "b AS (SELECT MIN(tokens * 100 // wt) AS budget FROM tok "
        "JOIN w USING (grp)), "
        "thr AS (SELECT grp, "
        f"({_MIX_D} * (budget * wt // 100) // tokens) AS threshold "
        "FROM tok JOIN w USING (grp) CROSS JOIN b) "
        "SELECT grp, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS chars_kept, "
        "CAST(max(threshold) AS BIGINT) AS threshold "
        "FROM g JOIN thr USING (grp) "
        f"WHERE (doc_id * {_KNUTH}) % {_M32} % {_MIX_D} < threshold "
        "GROUP BY grp"
    ),
    doc="Data-mix scheduler (the pretraining recipe knob): given target "
    "weights over source groups (web 60 / curated 25 / reference 15), "
    "derive the LARGEST total char budget reachable without upsampling "
    "(B = min over groups of tokens*W/w), each group's char target, and "
    "an integer hash threshold per group — then apply the same "
    "deterministic multiplicative-hash predicate as q_sample_hash. "
    "Every derived quantity is integer floor-division (DuckDB // = "
    "Spark div on positives), so thresholds and the selected doc set "
    "are engine-exact — no float rate ever exists. Upsampling groups "
    "above 1x composes via q_resample_weighted. At extreme scale "
    "reorder the threshold product (D*t div tokens) to keep "
    "intermediates under 2^63; with char counts <= 1e14 it fits as "
    "written.",
)
def q_data_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    src_num = F.substring("source", 4, 10).cast("int")
    grp = (
        F.when(src_num < 10, "web")
        .when(src_num < 15, "curated")
        .otherwise("reference")
    )
    g = d.select(grp.alias("grp"), "doc_id", "n_chars")
    tok = g.groupBy("grp").agg(F.sum("n_chars").alias("tokens"))
    # inline VALUES, not createDataFrame: a LocalRelation keeps the
    # plan 100% JVM-side (a parallelized python list would audit as a
    # Python scan)
    wdf = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"('{g}', {wt})" for g, wt in _MIX_WEIGHTS)
        + " AS t(grp, wt)"
    )
    joined = tok.join(F.broadcast(wdf), "grp")
    budget = joined.agg(
        F.min(F.expr("tokens * 100 div wt")).alias("budget")
    )
    thr = (
        joined.join(F.broadcast(budget))
        .withColumn(
            "threshold",
            F.expr(f"{_MIX_D} * (budget * wt div 100) div tokens"),
        )
        .select("grp", "threshold")
    )
    keep = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_M32) % F.lit(
        _MIX_D
    ) < F.col("threshold")
    return (
        g.join(F.broadcast(thr), "grp")
        .filter(keep)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
            F.max("threshold").cast("bigint").alias("threshold"),
        )
    )


# ---------------------------------------------------------------------------
# sequence packing — concat-and-chunk token packing into fixed budgets.

_PACK_BUDGET = 256  # tokens per training sequence
_PACK_SHARDS = 16


@register(
    "q_pack_tokens",
    oracle=(
        "WITH d AS (SELECT doc_id, doc_id % 16 AS shard, "
        "len(list_filter(string_split_regex(lower(text), '\\s+'), "
        "t -> t <> '')) AS dl FROM documents), "
        "r AS (SELECT shard, dl, sum(dl) OVER (PARTITION BY shard "
        "ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS fin "
        "FROM d WHERE dl > 0), "
        "e AS (SELECT shard, dl, fin, "
        f"unnest(range(CAST((fin - dl) // {_PACK_BUDGET} AS BIGINT), "
        f"CAST((fin - 1) // {_PACK_BUDGET} + 1 AS BIGINT))) AS seq_id "
        "FROM r) "
        "SELECT shard, seq_id, CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(sum(least(fin, (seq_id + 1) * {_PACK_BUDGET}) - "
        f"greatest(fin - dl, seq_id * {_PACK_BUDGET})) AS BIGINT) "
        "AS n_tokens "
        "FROM e GROUP BY shard, seq_id"
    ),
    doc="GPT-style sequence packing (concat-and-chunk): documents are "
    "concatenated in deterministic order and cut into fixed "
    f"{_PACK_BUDGET}-token training sequences; the output maps each "
    "(shard, sequence) to how many documents contribute and how many "
    "tokens it holds (== budget except each shard's ragged tail — an "
    "in-query invariant a wrong window frame would break). Packing is "
    "computed WITHIN hash shards, not globally: a single global "
    "running sum would serialize the corpus through one partition, "
    "while per-shard prefix sums are embarrassingly parallel and are "
    "what real pretraining pipelines ship (each shard becomes a "
    "training-data file). Plan: one scan -> token count (pure "
    "codegen) -> one window shuffle keyed by shard -> explode of each "
    "doc's [first,last] sequence range (F.sequence, bounded by "
    "dl/budget + 2 elements) -> partial+final aggregate. No Python, "
    "no join, no product; the window's partition count = shard count "
    "scales freely at 100 TB.",
)
def q_pack_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = Catalog(spark, sf_dir).documents.select(
        "doc_id",
        (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(tokens_expr(F.col("text"))).alias("dl"),
    ).filter(F.col("dl") > 0)
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = d.select("shard", "dl", F.sum("dl").over(w).alias("fin"))
    start = F.col("fin") - F.col("dl")
    first_seq = F.floor(start / _PACK_BUDGET)
    last_seq = F.floor((F.col("fin") - 1) / _PACK_BUDGET)
    e = r.select(
        "shard",
        "dl",
        "fin",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    tok_in_seq = F.least(
        F.col("fin"), (F.col("seq_id") + 1) * _PACK_BUDGET
    ) - F.greatest(F.col("fin") - F.col("dl"), F.col("seq_id") * _PACK_BUDGET)
    return e.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok_in_seq).cast("bigint").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# length-bucketed batch formation — padding-waste minimization.

_LB_W = 64       # token-length band width per bucket
_LB_B = 8        # documents per training batch
# Sub-shard target within a length band: a 64-token band can hold
# O(corpus) docs (length distributions concentrate), so partitioning
# the rank window by bucket alone would pin one task per band -- the
# exact defect q_epoch_shuffle's compile-time shard count had. The
# composite (bucket, shard) key with shard count derived from corpus
# size in-plan (same 2^ceil(log2(n/target)) recipe, 1-row broadcast)
# keeps the largest single-task sort bounded at any corpus size; a
# batch never spans shards, which is how real dataloaders shard
# anyway (each (bucket, shard) is a worker's file, ragged tail each).
_LB_SHARD_TARGET = 2048


@register(
    "q_length_bucket_batches",
    oracle=(
        r"WITH d AS (SELECT doc_id, "
        r"len(list_filter(string_split_regex(lower(text), '\s+'), "
        r"t -> t <> '')) AS n FROM documents), "
        f"f AS (SELECT doc_id, n, n // {_LB_W} AS bucket, "
        f"(doc_id * {_KNUTH}) % {_M32} AS hv FROM d WHERE n > 0), "
        "s AS (SELECT greatest(1, CAST(power(2, ceil(log2("
        f"count(*) / {_LB_SHARD_TARGET}.0))) AS BIGINT)) AS sh FROM f), "
        "r AS (SELECT bucket, CAST(hv % sh AS BIGINT) AS shard, n, "
        "(row_number() OVER (PARTITION BY bucket, hv % sh "
        f"ORDER BY hv, doc_id) - 1) // {_LB_B} AS batch_id "
        "FROM f CROSS JOIN s) "
        "SELECT CAST(bucket AS INTEGER) AS bucket, shard, "
        "CAST(batch_id AS BIGINT) AS batch_id, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(max(n) AS BIGINT) AS max_len, "
        "CAST(sum(n) AS BIGINT) AS sum_len, "
        "CAST(count(*) * max(n) - sum(n) AS BIGINT) AS pad_tokens "
        "FROM r GROUP BY bucket, shard, batch_id"
    ),
    doc="LENGTH-BUCKETED batch formation (the padded-batch dataloader "
    "optimization every fine-tuning pipeline runs): documents group "
    f"into {_LB_W}-token length bands sub-sharded by a deterministic "
    "hash (shard count derives from corpus size IN-PLAN -- "
    "2^ceil(log2(n/2048)) via a 1-row broadcast, the q_epoch_shuffle "
    "recipe, because length distributions concentrate and a band "
    "would otherwise pin one task per 64-token range at any corpus "
    "size); within each (band, shard) docs take the deterministic "
    f"hash order (multiplicative hash, tie doc_id -- reproducible "
    f"across runs and partitionings) and cut into {_LB_B}-doc "
    "batches; per batch the output reports max_len (the padded "
    "width), sum_len (real tokens) and pad_tokens = n_docs*max_len - "
    "sum_len -- the waste metric bucketing exists to minimize "
    "(batching the same corpus unbucketed pads every sequence to the "
    "global max). All integers so the oracle hash is exact. Plan: "
    "token count is codegen at the scan; ONE window shuffle keyed by "
    "(bucket, shard) -- partition count scales with the corpus -- "
    "and one partial+final agg.",
)
def q_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.size(tokens_expr(F.col("text"))).alias("n")
    ).filter(F.col("n") > 0)
    f = d.select(
        "n",
        F.expr(f"n DIV {_LB_W}").cast("int").alias("bucket"),
        ((F.col("doc_id") * _KNUTH) % _M32).alias("hv"),
        "doc_id",
    )
    sh = f.agg(
        F.greatest(
            F.lit(1).cast("bigint"),
            F.pow(
                F.lit(2.0),
                F.ceil(F.log2(F.count(F.lit(1)) / F.lit(_LB_SHARD_TARGET))),
            ).cast("bigint"),
        ).alias("sh")
    )
    r = f.crossJoin(F.broadcast(sh)).withColumn(
        "shard", (F.col("hv") % F.col("sh")).cast("bigint")
    )
    w = W.partitionBy("bucket", "shard").orderBy("hv", "doc_id")
    r = r.withColumn(
        "batch_id", F.floor((F.row_number().over(w) - 1) / _LB_B)
    )
    return r.groupBy("bucket", "shard", "batch_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n").cast("bigint").alias("max_len"),
        F.sum("n").cast("bigint").alias("sum_len"),
        (F.count(F.lit(1)) * F.max("n") - F.sum("n"))
        .cast("bigint")
        .alias("pad_tokens"),
    )


# ---------------------------------------------------------------------------
# epoch-aware training-order shuffle — deterministic corpus permutation.

_EPOCH_STRIDE = 7919  # prime: decorrelates epoch hash streams
# Target shard population for the derived shard count. A shard is a
# training-data file AND the unit of window/sort parallelism, so its
# count must grow with the corpus: shards = 2^ceil(log2(n / target)),
# computed IN-PLAN from count(*) (a 1-row broadcast, no driver
# action) so one task never sorts more than ~2x target rows at any
# corpus size. The gate corpus (500 docs) derives 2 shards; sf0.1
# (5000) derives 32; a 100 TB corpus derives millions — the r7 form's
# compile-time `_SHUF_SHARDS = 8` made one task sort corpus/8 rows
# forever. Overridable via spark.upmr.epochShuffle.shards (power of
# two recommended; any positive int works — the value only changes
# which shard each doc lands in, determinism is per-configuration).
_SHUF_TARGET = 250
_SHUF_CONF = "spark.upmr.epochShuffle.shards"


def epoch_hash_frame(
    d: DataFrame, n_epochs: int, shards: int | None = None
) -> DataFrame:
    """(epoch, doc_id, hv, shard, sh) for every (epoch, doc) — the
    deterministic multiplicative-hash epoch streams behind
    q_epoch_shuffle, reused by tools/scale_shuffle.py's writer form.
    ``shards=None`` derives the count from corpus size in-plan."""
    spark = d.sparkSession
    epochs = spark.range(n_epochs).select(F.col("id").alias("epoch"))
    if shards is None:
        sh = d.agg(
            F.greatest(
                F.lit(1).cast("bigint"),
                F.pow(
                    F.lit(2.0),
                    F.ceil(F.log2(F.count(F.lit(1)) / F.lit(_SHUF_TARGET))),
                ).cast("bigint"),
            ).alias("sh")
        )
    else:
        sh = spark.range(1).select(F.lit(int(shards)).cast("bigint").alias("sh"))
    h = (
        d.select("doc_id")
        .crossJoin(F.broadcast(epochs))
        .crossJoin(F.broadcast(sh))
        .select(
            "epoch",
            "doc_id",
            (
                ((F.col("doc_id") + F.col("epoch") * _EPOCH_STRIDE) * _KNUTH)
                % _M32
            ).alias("hv"),
            "sh",
        )
    )
    return h.withColumn("shard", (F.col("hv") % F.col("sh")).cast("bigint"))


@register(
    "q_epoch_shuffle",
    oracle=(
        "WITH e AS (SELECT i AS epoch FROM range(2) t(i)), "
        "s AS (SELECT greatest(1, CAST(power(2, ceil(log2("
        f"count(*) / {_SHUF_TARGET}.0))) AS BIGINT)) AS sh "
        "FROM documents), "
        "h AS (SELECT epoch, doc_id, "
        f"((doc_id + epoch * {_EPOCH_STRIDE}) * {_KNUTH}) % {_M32} AS hv "
        "FROM documents CROSS JOIN e) "
        "SELECT epoch, CAST(hv % sh AS BIGINT) AS shard, "
        "CAST(row_number() OVER (PARTITION BY epoch, hv % sh "
        "ORDER BY hv, doc_id) AS BIGINT) AS pos, doc_id "
        "FROM h CROSS JOIN s"
    ),
    doc="EPOCH-AWARE deterministic training-order shuffle: each epoch "
    "permutes the corpus by a multiplicative hash of (doc_id + "
    "epoch*prime) — different epochs give decorrelated orders (the "
    "'reshuffle every epoch' contract of a pretraining loader) yet "
    "any (epoch, doc) position is reproducible from the ids alone: "
    "no RNG state to checkpoint, no coordination across 1000 "
    "executors, resumable mid-epoch by position. Spark's own "
    "df.sample/shuffle are seed-per-partition and change with "
    "partitioning; this is partitioning-invariant by construction. "
    "Output maps every (epoch, doc) to its (shard, position). Shard "
    "count is NOT a constant: it derives from corpus size in-plan "
    "(2^ceil(log2(n/250)), a 1-row broadcast — no driver action; "
    "override via spark.upmr.epochShuffle.shards), so the window's "
    "partition count — and therefore the largest single-task sort — "
    "scales with the corpus instead of pinning one task at corpus/8 "
    "rows (the r7 bug; the oracle derives the same count in SQL). "
    "Plan: hash is scan-stage codegen; one window shuffle keyed by "
    "(epoch, shard) — at 100 TB the physical form is "
    "repartitionByRange on (epoch, shard, hv) writing ordered files "
    "per shard per epoch, same math, no window; tools/scale_shuffle.py "
    "runs THAT form and asserts it reproduces this query's order. "
    "The tiny epoch/count sides are the sanctioned broadcast cross "
    "joins.",
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    conf = spark.conf.get(_SHUF_CONF, None)
    h = epoch_hash_frame(
        Catalog(spark, sf_dir).documents,
        n_epochs=2,
        shards=int(conf) if conf else None,
    )
    w = W.partitionBy("epoch", "shard").orderBy("hv", "doc_id")
    return h.select(
        "epoch",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
        "doc_id",
    )


# ---------------------------------------------------------------------------
# exact-count stratified split — train/val/test with exact quotas.

_SPLIT_VAL_PCT = 10   # exact ceil-quota percentages per stratum
_SPLIT_TEST_PCT = 10


@register(
    "q_split_exact",
    oracle=(
        f"WITH r AS (SELECT doc_id, lang, "
        f"row_number() OVER (PARTITION BY lang "
        f"ORDER BY (doc_id * {_KNUTH}) % {_M32}, doc_id) AS rk, "
        "count(*) OVER (PARTITION BY lang) AS n FROM documents) "
        "SELECT lang, CASE "
        f"WHEN rk <= ceil(n * {_SPLIT_TEST_PCT} / 100.0) THEN 'test' "
        f"WHEN rk <= ceil(n * {_SPLIT_TEST_PCT} / 100.0) "
        f"  + ceil(n * {_SPLIT_VAL_PCT} / 100.0) THEN 'val' "
        "ELSE 'train' END AS split, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS min_doc, "
        "CAST(max(doc_id) AS BIGINT) AS max_doc "
        "FROM r GROUP BY 1, 2"
    ),
    doc="EXACT-COUNT stratified train/val/test split: within each "
    "language stratum, docs are ranked by the deterministic "
    "multiplicative hash (tie-broken by id — a total order) and the "
    "first ceil(10%) become test, the next ceil(10%) val, the rest "
    "train. Rate-predicate sampling (q_sample_hash/stratified) gives "
    "only EXPECTED proportions — a 30-doc tail language can land 0 "
    "eval docs; quota ranking guarantees every stratum contributes "
    "exactly its ceil share, which is what a benchmark-holdout "
    "builder actually needs. Hash-ordered ranking keeps membership "
    "deterministic and REFRESH-STABLE in the common case (a new doc "
    "displaces at most the quota-boundary docs, not the whole split, "
    "unlike random ranking). One window shuffle keyed by stratum; "
    "count(*) OVER the same partition rides the same exchange.",
)
def q_split_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents.select("doc_id", "lang")
    w = W.partitionBy("lang").orderBy(
        (F.col("doc_id") * _KNUTH) % _M32, "doc_id"
    )
    r = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("n"),
    )
    q_test = F.ceil(F.col("n") * _SPLIT_TEST_PCT / 100.0)
    q_val = F.ceil(F.col("n") * _SPLIT_VAL_PCT / 100.0)
    split = (
        F.when(F.col("rk") <= q_test, "test")
        .when(F.col("rk") <= q_test + q_val, "val")
        .otherwise("train")
    )
    return (
        r.select("doc_id", "lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# ---------------------------------------------------------------------------
# chat-template assembly — turning event logs into SFT-style examples.

_CHAT_MAX_TURNS = 8


@register(
    "q_chat_template",
    oracle=(
        "WITH t AS (SELECT user_id, rn, "
        "'<|' || CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant' END "
        "|| '|>' || event_type || '#' || "
        "CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) || '#' || "
        "props || '<|end|>' AS piece "
        "FROM (SELECT user_id, event_type, value, props, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS rn FROM events) "
        f"WHERE rn <= {_CHAT_MAX_TURNS}) "
        "SELECT user_id, CAST(max(rn) AS INTEGER) AS n_turns, "
        "string_agg(piece, '' ORDER BY rn) AS template, "
        "CAST(length(string_agg(piece, '' ORDER BY rn)) AS BIGINT) "
        "AS template_chars "
        "FROM t GROUP BY user_id"
    ),
    doc="CHAT-TEMPLATE ASSEMBLY — the SFT-data step that turns raw "
    "interaction logs into role-tagged training examples: each user's "
    "first 8 events in (ts, event_id) order become alternating "
    "user/assistant turns rendered into a '<|role|>content<|end|>' "
    "template (content = type + integer-cents value + raw props; "
    "doubles are never stringified — engine float formatting differs, "
    "integer cents do not). The turn cap is the context-budget "
    "truncation every real pipeline applies. Plan: ONE window for "
    "per-user turn numbering (partition-parallel by user), then one "
    "groupBy assembling the ordered concat via "
    "array_sort(collect_list(struct(rn, piece))) — deterministic "
    "regardless of shuffle arrival order, the same discipline as "
    "q_string_agg. At 100 TB both shuffles key on user_id; no Python, "
    "no skew beyond a user's own (capped) history.",
)
def q_chat_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    role = F.when(F.col("rn") % 2 == 1, F.lit("user")).otherwise(
        F.lit("assistant")
    )
    piece = F.concat(
        F.lit("<|"),
        role,
        F.lit("|>"),
        F.col("event_type"),
        F.lit("#"),
        F.floor(F.col("value") * 100).cast("bigint").cast("string"),
        F.lit("#"),
        F.col("props"),
        F.lit("<|end|>"),
    )
    turns = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CHAT_MAX_TURNS)
        .select("user_id", "rn", piece.alias("piece"))
    )
    tmpl = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "piece"))),
            lambda x: x["piece"],
        ),
        "",
    )
    return turns.groupBy("user_id").agg(
        F.max("rn").cast("int").alias("n_turns"),
        tmpl.alias("template"),
        F.length(tmpl).cast("bigint").alias("template_chars"),
    )


# ---------------------------------------------------------------------------
# corpus-order novelty — how much of each doc is first-seen text.


@register(
    "q_ngram_novelty",
    oracle=(
        "WITH sh AS (SELECT doc_id, unnest(CASE WHEN len(tk) <= 3 "
        "THEN [array_to_string(tk, ' ')] "
        "ELSE list_distinct(list_transform(range(1, len(tk) - 1), "
        "i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) END) AS s "
        "FROM (SELECT doc_id, "
        "list_filter(string_split_regex(lower(text), '\\s+'), "
        "t -> t <> '') AS tk FROM documents)), "
        "first AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s) "
        "SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles, "
        "CAST(sum(CASE WHEN first.first_doc = sh.doc_id THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_novel, "
        "CAST(sum(CASE WHEN first.first_doc = sh.doc_id THEN 1 ELSE 0 END) "
        "* 10000 // count(*) AS BIGINT) AS novelty_bp "
        "FROM sh JOIN first ON sh.s = first.s GROUP BY sh.doc_id"
    ),
    doc="CORPUS-ORDER NOVELTY SCORING — the data-curation diagnostic "
    "behind diversity-aware sampling and curriculum ordering: per "
    "document, the fraction of its distinct word-3-shingles whose "
    "FIRST corpus occurrence (min doc_id) is this document. A doc "
    "near 0 bp is assembled entirely from text seen earlier (the "
    "boilerplate/template tail dedup thresholds miss); a doc near "
    "10000 bp is fresh material worth upweighting. Plan: the per-doc-"
    "distinct shingle explode (Arrow UDF, the measured 5x win over "
    "the interpreted HOF pipeline), ONE groupBy(shingle) min-doc "
    "aggregate, a self equi-join on the shingle, and a per-doc "
    "count — the exact shuffle skeleton of q_dedup_substring, keyed "
    "by content. Integer basis points via DIV; at 100 TB the "
    "first-occurrence table is the corpus vocabulary, hash-"
    "partitioned, and novelty is two shuffles — no windows over "
    "global order, because min(doc_id) IS the corpus-order tiebreak.",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    sh = d.select(
        "doc_id",
        F.explode(shingle_strings_udf(3, distinct=True)("text")).alias("s"),
    )
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            novel.cast("bigint").alias("n_novel"),
            F.expr(
                "sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) "
                "* 10000L DIV count(1)"
            ).alias("novelty_bp"),
        )
    )


# ---------------------------------------------------------------------------
# priority sampling — weighted, deterministic, with unbiased estimator.

# Duffield-Lund-Thorup priority sampling (JACM 2007, public): item i
# with weight w_i draws u_i uniform in (0,1] and gets priority
# q_i = w_i / u_i; the sample is the top-k priorities and any
# subset-sum estimate uses w_hat_i = max(w_i, tau) where tau is the
# (k+1)-th priority. Here u_i is hash-derived — (h+1)/2^32 from the
# repo's Knuth mix — so q_i = w * 2^32 // (h+1) is INTEGER-exact in
# both engines and the whole scheme is reproducible (no RNG state
# across 1000 executors), while keeping DLT's unbiasedness for any
# FIXED hash-independent query set.
_PRI_K = 100


@register(
    "q_sample_priority",
    oracle=(
        "WITH p AS (SELECT doc_id, greatest(n_chars, 1) AS w, "
        f"greatest(n_chars, 1) * {_M32} // "
        f"((doc_id * {_KNUTH}) % {_M32} + 1) AS priority FROM documents), "
        "r AS (SELECT doc_id, w, priority, row_number() OVER "
        "(ORDER BY priority DESC, doc_id) AS rn FROM p), "
        f"tau AS (SELECT COALESCE(max(CASE WHEN rn = {_PRI_K} + 1 "
        "THEN priority END), 0) AS t FROM r) "
        "SELECT doc_id, CAST(w AS BIGINT) AS w, "
        "CAST(priority AS BIGINT) AS priority, "
        "CAST(greatest(w, t) AS BIGINT) AS w_hat "
        f"FROM r CROSS JOIN tau WHERE rn <= {_PRI_K}"
    ),
    doc="PRIORITY SAMPLING (Duffield-Lund-Thorup) — the weighted "
    "sampling scheme a data-mix pipeline uses when it needs a SMALL "
    "reproducible sample whose subset-sum estimates are provably "
    "unbiased: priority q = w * 2^32 DIV (hash+1) (integer-exact "
    "u ~ (0,1] from the Knuth mix, so both engines agree bit-for-"
    "bit), sample = top-k by (priority DESC, doc_id), estimator "
    "w_hat = max(w, tau) with tau the (k+1)-th priority. The 100 TB "
    "shape: the top-(k+1) is TakeOrdered — per-partition heaps plus "
    "a k-row driver merge, NO global sort shuffle; tau is a 1-row "
    "scalar cross-joined back (the sanctioned scalar shape). Weights "
    "here are doc lengths — swapping in quality scores or domain "
    "weights changes one column.",
)
def q_sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    w = F.greatest(F.col("n_chars"), F.lit(1))
    # DIV via expr: Spark's `/` is double division, the quotient must
    # stay in the exact integer domain to match the oracle's `//`.
    p = d.select(
        "doc_id",
        w.cast("bigint").alias("w"),
        F.expr(
            f"greatest(n_chars, 1) * {_M32}L DIV "
            f"((doc_id * {_KNUTH}L) % {_M32}L + 1)"
        ).alias("priority"),
    )
    # top-(k+1): TakeOrdered (partition heaps + driver merge), then a
    # window over the BOUNDED k+1 rows for rank and the tau scalar.
    take = p.orderBy(F.col("priority").desc(), "doc_id").limit(_PRI_K + 1)
    rn = F.row_number().over(
        W.orderBy(F.col("priority").desc(), "doc_id")
    )
    ranked = take.select("doc_id", "w", "priority", rn.alias("rn"))
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == _PRI_K + 1, F.col("priority"))),
            F.lit(0).cast("bigint"),
        ).alias("t")
    )
    return (
        ranked.filter(F.col("rn") <= _PRI_K)
        .crossJoin(tau)
        .select(
            "doc_id",
            "w",
            "priority",
            F.greatest("w", "t").cast("bigint").alias("w_hat"),
        )
    )


# ---------------------------------------------------------------------------
# masked-LM corruption — deterministic BERT-style token masking.

_MLM_RATE_BP = 1500  # 15% of positions, the published BERT rate
# Position mixer. The hash is doc_id*KNUTH + (pos^2 mod 2^32) * MIX
# (QUADRATIC in the position): a linear pos*MIX walk advances only
# MIX mod 10000 = 3 per position through the rate window, so masks came
# out as ~500-token consecutive RUNS instead of scattered 15% (caught
# in r10 self-review); the squared term makes consecutive strides
# (2p+1)*MIX, which scatters decisions (measured 15.0% rate,
# span-length tail 1:6500/2:1199/3:315 — BERT-scattered with a T5-like
# short-span tail). pos^2 is reduced mod 2^32 BEFORE the multiply so
# the term is bounded by 2^32 * MIX ~ 4.3e15 and the hash stays inside
# int64 up to pos ~ 3.04e9 (where pos*pos ITSELF, computed before the
# mod, exits int64 — r11 advice: the bound is the squaring, not the
# product; ~3e9 tokens in one document is ~12 GB of text, far past any
# row Spark or DuckDB can hold, so the divergence class is practically
# closed, not formally). The unreduced form overflowed past ~3e6
# tokens, where ANSI DuckDB raises but non-ANSI Spark silently wraps,
# so the engines diverged instead of failing together (r10 advice).
# For every position below 65536 (pos^2 < 2^32) the reduction is the
# identity, so mask decisions — and the measured scatter stats above —
# are unchanged on any real-page-sized document.
_MLM_POS_MIX = 1000003


@register(
    "q_mask_lm",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "COALESCE(list_filter(string_split_regex(lower(text), "
        "'\\s+'), x -> x <> ''), []) AS toks FROM documents), "
        "m AS (SELECT doc_id, toks, list_transform("
        "range(1, len(toks) + 1), i -> CAST("
        f"(doc_id * {_KNUTH} + ((i * i) % {_M32}) * {_MLM_POS_MIX}) "
        f"% {_M32} % 10000 "
        f"< {_MLM_RATE_BP} AS INT)) AS mk FROM t) "
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(list_sum(mk), 0) AS BIGINT) AS n_masked, "
        "COALESCE(array_to_string(list_transform("
        "range(1, len(toks) + 1), "
        "i -> CASE WHEN mk[i] = 1 THEN '[MASK]' ELSE toks[i] END), "
        "' '), '') AS masked_text, "
        "COALESCE(array_to_string(list_filter(list_transform("
        "range(1, len(toks) + 1), "
        "i -> CASE WHEN mk[i] = 1 THEN toks[i] END), "
        "x -> x IS NOT NULL), ' '), '') AS labels FROM m"
    ),
    doc="MASKED-LM CORRUPTION — the deterministic form of BERT's 15% "
    "token masking a reproducible pretraining pipeline needs: "
    "position i of doc d is masked iff "
    "hash(d, i) mod 10000 < 1500, where the hash is the Knuth doc mix "
    "plus a QUADRATIC position term (see _MLM_POS_MIX: a linear term "
    "produces long mask runs) — re-running the job, or re-running it "
    "on a different cluster, corrupts identically, and the mask "
    "decision needs NO RNG state or stored mask table. Emits the "
    "corrupted text and the label stream (the masked-out tokens in "
    "position order). Map-only: one scan, all HOF transforms with "
    "the index-bearing lambda, no Python, no shuffle — at 100 TB "
    "this is embarrassingly parallel. Span corruption (T5) is this "
    "plus a run-length merge on the same mask column.",
)
def q_mask_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    # NULL text folds to an empty token array so the engine agrees
    # with the oracle's COALESCE(..., []) (r10 review: NULL-text
    # rows otherwise emit NULL n/streams vs the oracle's 0/'')
    toks = F.coalesce(
        tokens_expr(F.col("text")), F.array().cast("array<string>")
    )

    def mask_flag(i):  # i is the 0-based HOF index; hash uses 1-based
        # the index must be widened BEFORE the multiply: the HOF index
        # is a 32-bit int, and (i+1)*1000003 overflows int at position
        # 2147 (ANSI crash / silent wrap) while the oracle's range()
        # index is BIGINT — long docs are exactly this op's use case.
        # pos^2 is reduced mod 2^32 before the MIX multiply so the
        # hash stays in int64 at ANY position (see _MLM_POS_MIX).
        pos = (i + 1).cast("long")
        return (
            (
                F.col("doc_id") * _KNUTH
                + (pos * pos % _M32) * F.lit(_MLM_POS_MIX)
            )
            % _M32 % 10000 < _MLM_RATE_BP
        )

    t = d.select("doc_id", toks.alias("toks"))
    masked = F.transform(
        F.col("toks"),
        lambda x, i: F.when(mask_flag(i), F.lit("[MASK]")).otherwise(x),
    )
    labels = F.filter(
        F.transform(
            F.col("toks"), lambda x, i: F.when(mask_flag(i), x)
        ),
        lambda x: x.isNotNull(),
    )
    return t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.aggregate(
            F.transform(
                F.col("toks"),
                lambda x, i: F.when(mask_flag(i), 1).otherwise(0),
            ),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("n_masked"),
        F.array_join(masked, " ").alias("masked_text"),
        F.array_join(labels, " ").alias("labels"),
    )



# ---------------------------------------------------------------------------
# preference-pair assembly — DPO/RLHF training-pair construction.

# The oracle scores candidates with the SAME frozen linear classifier
# q_quality_classifier registers (text_analysis.QC_SCORE_SQL over a
# `toks` column); importing it at module level is cycle-free because
# text_analysis never imports pipeline.
from .text_analysis import QC_SCORE_SQL as _QC_SCORE_SQL  # noqa: E402


@register(
    "q_preference_pairs",
    oracle=(
        "WITH t AS (SELECT doc_id, lang, source, "
        "list_filter(string_split_regex(lower(text), '\\s+'), "
        "x -> x <> '') AS toks FROM documents), "
        f"s AS (SELECT doc_id, lang, source, {_QC_SCORE_SQL} AS score "
        "FROM t), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY lang, source "
        "ORDER BY score DESC, doc_id) AS rc, "
        "row_number() OVER (PARTITION BY lang, source "
        "ORDER BY score ASC, doc_id) AS rr FROM s) "
        "SELECT c.lang, c.source, "
        "c.doc_id AS chosen_doc, j.doc_id AS rejected_doc, "
        "c.score AS chosen_score, j.score AS rejected_score, "
        "c.score - j.score AS margin "
        "FROM (SELECT * FROM r WHERE rc = 1) c "
        "JOIN (SELECT * FROM r WHERE rr = 1) j "
        "ON c.lang = j.lang AND c.source = j.source "
        "AND c.doc_id <> j.doc_id"
    ),
    doc="PREFERENCE-PAIR ASSEMBLY — the DPO/RLHF data-prep step that "
    "turns a scored candidate pool into (chosen, rejected) training "
    "pairs: within each (lang, source) candidate group, chosen = "
    "argmax score and rejected = argmin score (doc_id tiebreak on "
    "both — fully deterministic), emitting the pair and its score "
    "margin; groups whose extremes coincide (singleton or all-equal "
    "after tiebreak) produce no pair, exactly as a margin-based "
    "trainer requires. The scorer is the SAME frozen hashed-feature "
    "linear classifier as q_quality_classifier — swapping in a "
    "reward-model score changes one column. Plan: one scan, two "
    "row_number windows over the SAME partitioning (one shuffle, "
    "both windows run in the same exchange), then a per-group 1:1 "
    "self-join on the group key — at 100 TB the group count bounds "
    "the join, not the corpus size.",
)
def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text_analysis import qc_score_col

    d = Catalog(spark, sf_dir).documents
    s = d.select(
        "doc_id",
        "lang",
        "source",
        qc_score_col(F.col("text")).alias("score"),
    )
    grp = W.partitionBy("lang", "source")
    r = s.select(
        "*",
        F.row_number()
        .over(grp.orderBy(F.col("score").desc(), "doc_id"))
        .alias("rc"),
        F.row_number()
        .over(grp.orderBy(F.col("score").asc(), "doc_id"))
        .alias("rr"),
    )
    c = r.filter(F.col("rc") == 1).select(
        "lang", "source",
        F.col("doc_id").alias("chosen_doc"),
        F.col("score").alias("chosen_score"),
    )
    j = r.filter(F.col("rr") == 1).select(
        "lang", "source",
        F.col("doc_id").alias("rejected_doc"),
        F.col("score").alias("rejected_score"),
    )
    return (
        c.join(j, ["lang", "source"])
        .filter(F.col("chosen_doc") != F.col("rejected_doc"))
        .select(
            "lang", "source", "chosen_doc", "rejected_doc",
            "chosen_score", "rejected_score",
            (F.col("chosen_score") - F.col("rejected_score")).alias(
                "margin"
            ),
        )
    )


# ---------------------------------------------------------------------------
# data-quality constraint audit — the Deequ-style validation suite.

_LQTY_LO, _LQTY_HI = 1, 50  # TPC-H l_quantity domain


@register(
    "q_constraint_audit",
    oracle=(
        "SELECT check_name, table_name, n_rows, n_violations, "
        "CAST(n_violations = 0 AS INT) AS passed FROM ("
        "SELECT 'orders_custkey_fk' AS check_name, "
        "'orders' AS table_name, "
        "(SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_rows, "
        "(SELECT CAST(count(*) AS BIGINT) FROM orders o "
        "WHERE NOT EXISTS (SELECT 1 FROM customer c "
        "WHERE c.c_custkey = o.o_custkey)) AS n_violations "
        "UNION ALL "
        "SELECT 'lineitem_orderkey_fk', 'lineitem', "
        "(SELECT CAST(count(*) AS BIGINT) FROM lineitem), "
        "(SELECT CAST(count(*) AS BIGINT) FROM lineitem l "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_orderkey = l.l_orderkey)) "
        "UNION ALL "
        "SELECT 'lineitem_qty_range', 'lineitem', "
        "(SELECT CAST(count(*) AS BIGINT) FROM lineitem), "
        "(SELECT CAST(count(*) AS BIGINT) FROM lineitem "
        f"WHERE l_quantity < {_LQTY_LO} OR l_quantity > {_LQTY_HI}) "
        "UNION ALL "
        "SELECT 'customer_pk_unique', 'customer', "
        "(SELECT CAST(count(*) AS BIGINT) FROM customer), "
        "(SELECT CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) "
        "FROM customer) "
        "UNION ALL "
        "SELECT 'documents_text_nonempty', 'documents', "
        "(SELECT CAST(count(*) AS BIGINT) FROM documents), "
        "(SELECT CAST(count(*) AS BIGINT) FROM documents "
        "WHERE text IS NULL OR length(text) = 0) "
        "UNION ALL "
        "SELECT 'events_ts_nonnull', 'events', "
        "(SELECT CAST(count(*) AS BIGINT) FROM events), "
        "(SELECT CAST(count(*) AS BIGINT) FROM events "
        "WHERE ts IS NULL)"
        ") t"
    ),
    doc="DATA-QUALITY CONSTRAINT AUDIT — the Deequ/dbt-test-style "
    "validation suite a pipeline runs BEFORE training on a new "
    "snapshot: referential integrity (orders->customer, "
    "lineitem->orders, via null-tolerant anti-joins), domain ranges "
    "(l_quantity in [1,50]), primary-key uniqueness (count vs count "
    "distinct — one aggregate, no self-join), and non-null/non-empty "
    "completeness checks, unioned into one (check, table, n_rows, "
    "n_violations, passed) report. Each check is a full-scan "
    "aggregate that reduces map-side to one row; the FK checks are "
    "the only shuffles and they are plain anti-joins AQE can turn "
    "into broadcasts when the parent side is small. At 100 TB the "
    "audit costs one read of each table regardless of how many "
    "same-table checks run (Catalyst collapses them onto a shared "
    "scan).",
)
def q_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    orders, lineitem = cat.orders, cat.lineitem
    customer, documents, events = cat.customer, cat.documents, cat.events

    def report(name, table, rows_df, viol_df):
        n = rows_df.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        v = viol_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_violations")
        )
        return n.crossJoin(v).select(
            F.lit(name).alias("check_name"),
            F.lit(table).alias("table_name"),
            "n_rows",
            "n_violations",
        )

    uniq = customer.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey"))
        .cast("bigint")
        .alias("n_violations"),
    ).select(
        F.lit("customer_pk_unique").alias("check_name"),
        F.lit("customer").alias("table_name"),
        "n_rows",
        "n_violations",
    )
    checks = (
        report(
            "orders_custkey_fk",
            "orders",
            orders,
            orders.join(
                customer,
                orders.o_custkey == customer.c_custkey,
                "left_anti",
            ),
        )
        .unionAll(
            report(
                "lineitem_orderkey_fk",
                "lineitem",
                lineitem,
                lineitem.join(
                    orders,
                    lineitem.l_orderkey == orders.o_orderkey,
                    "left_anti",
                ),
            )
        )
        .unionAll(
            report(
                "lineitem_qty_range",
                "lineitem",
                lineitem,
                lineitem.filter(
                    (F.col("l_quantity") < _LQTY_LO)
                    | (F.col("l_quantity") > _LQTY_HI)
                ),
            )
        )
        .unionAll(uniq)
        .unionAll(
            report(
                "documents_text_nonempty",
                "documents",
                documents,
                documents.filter(
                    F.col("text").isNull() | (F.length("text") == 0)
                ),
            )
        )
        .unionAll(
            report(
                "events_ts_nonnull",
                "events",
                events,
                events.filter(F.col("ts").isNull()),
            )
        )
    )
    return checks.select(
        "*", (F.col("n_violations") == 0).cast("int").alias("passed")
    )


# ---------------------------------------------------------------------------
# k-anonymity audit — privacy equivalence classes over quasi-identifiers.

_KANON_K = 5
_KANON_BAL_BUCKET = 1000  # acctbal generalization width


@register(
    "q_k_anonymity",
    oracle=(
        "SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment, "
        f"CAST(floor(c_acctbal / {_KANON_BAL_BUCKET}) AS BIGINT) "
        "AS bal_bucket, "
        "CAST(count(*) AS BIGINT) AS class_size, "
        f"CAST(count(*) < {_KANON_K} AS INT) AS at_risk "
        "FROM customer GROUP BY 1, 2, 3"
    ),
    doc="K-ANONYMITY AUDIT — the privacy gate a dataset release runs "
    "before publication (Sweeney's k-anonymity, public): rows are "
    "grouped into equivalence classes by their quasi-identifiers "
    "(nation, market segment, and account balance GENERALIZED to "
    f"width-{_KANON_BAL_BUCKET} buckets — the generalization step is "
    "what makes the lattice coarser than raw values), and any class "
    f"smaller than k={_KANON_K} is flagged: those rows are "
    "re-identifiable by linking the quasi-identifiers to an external "
    "registry. Emitting EVERY class with its at_risk flag (not just "
    "violators) keeps the audit non-vacuous at any scale and gives "
    "the suppression step its exact worklist. One groupBy — "
    "map-side partial counts, one shuffle on the QI tuple; at "
    "100 TB class counts are the same shape as any keyed rollup.",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return (
        c.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.floor(F.col("c_acctbal") / _KANON_BAL_BUCKET)
            .cast("bigint")
            .alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("class_size"))
        .select(
            "*",
            (F.col("class_size") < _KANON_K).cast("int").alias("at_risk"),
        )
    )


# ---------------------------------------------------------------------------
# span corruption — T5-style denoising objective over the same mask.


@register(
    "q_span_corruption",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "COALESCE(list_filter(string_split_regex(lower(text), "
        "'\\s+'), x -> x <> ''), []) AS toks FROM documents), "
        "m AS (SELECT doc_id, toks, list_transform("
        "range(1, len(toks) + 1), i -> CAST("
        f"(doc_id * {_KNUTH} + ((i * i) % {_M32}) * {_MLM_POS_MIX}) "
        f"% {_M32} % 10000 "
        f"< {_MLM_RATE_BP} AS INT)) AS mk FROM t), "
        "s AS (SELECT doc_id, toks, mk, list_transform("
        "range(1, len(toks) + 1), i -> CAST(mk[i] = 1 AND "
        "(i = 1 OR mk[i-1] = 0) AS INT)) AS st FROM m) "
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(list_sum(st), 0) AS BIGINT) AS n_spans, "
        "COALESCE(array_to_string(list_filter(list_transform("
        "range(1, len(toks) + 1), i -> CASE "
        "WHEN st[i] = 1 THEN '<extra_id_' || "
        "CAST(list_sum(st[1:i]) - 1 AS VARCHAR) || '>' "
        "WHEN mk[i] = 1 THEN NULL ELSE toks[i] END), "
        "x -> x IS NOT NULL), ' '), '') AS corrupted_text, "
        "COALESCE(array_to_string(list_filter(list_transform("
        "range(1, len(toks) + 1), i -> CASE "
        "WHEN st[i] = 1 THEN '<extra_id_' || "
        "CAST(list_sum(st[1:i]) - 1 AS VARCHAR) || '> ' || toks[i] "
        "WHEN mk[i] = 1 THEN toks[i] ELSE NULL END), "
        "x -> x IS NOT NULL), ' '), '') AS target_text FROM s"
    ),
    doc="SPAN CORRUPTION (T5 denoising objective) — the run-length "
    "upgrade of q_mask_lm over the SAME deterministic per-(doc, "
    "position) mask: consecutive masked positions collapse into ONE "
    "numbered sentinel <extra_id_k> in the corrupted input, and the "
    "target stream is each sentinel followed by the tokens it "
    "replaced — exactly the (inputs, targets) pair a T5-style "
    "pretraining batch needs, derived reproducibly with no RNG "
    "state. The Spark side is a SINGLE O(n) fold (F.aggregate with a "
    "struct accumulator carrying span count / previous-flag / both "
    "output streams); the oracle recomputes span ids by prefix "
    "sums — O(n^2) per doc but checker-only. Map-only: one scan, no "
    "Python, no shuffle — the q_mask_lm scale shape with sentinel "
    "numbering added.",
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    # NULL text folds to an empty token array so the engine agrees
    # with the oracle's COALESCE(..., []) (r10 review: NULL-text
    # rows otherwise emit NULL n/streams vs the oracle's 0/'')
    toks = F.coalesce(
        tokens_expr(F.col("text")), F.array().cast("array<string>")
    )

    def mask_flag(i):  # identical hash to q_mask_lm (1-based position)
        # long-widened index + pos^2 mod 2^32 reduction — see q_mask_lm
        pos = (i + 1).cast("long")
        return (
            (
                F.col("doc_id") * _KNUTH
                + (pos * pos % _M32) * F.lit(_MLM_POS_MIX)
            )
            % _M32 % 10000 < _MLM_RATE_BP
        ).cast("int")

    t = d.select("doc_id", toks.alias("toks"))
    zipped = F.zip_with(
        F.col("toks"),
        F.transform(F.col("toks"), lambda x, i: mask_flag(i)),
        lambda tok, mk: F.struct(tok.alias("tok"), mk.alias("mk")),
    )
    sent = lambda c: F.concat(  # noqa: E731
        F.lit("<extra_id_"), c.cast("string"), F.lit(">")
    )
    zero = F.struct(
        F.lit(0).alias("cnt"),
        F.lit(0).alias("prev"),
        F.array().cast("array<string>").alias("inp"),
        F.array().cast("array<string>").alias("tgt"),
    )

    def step(acc, x):
        start = (x["mk"] == 1) & (acc["prev"] == 0)
        cont = (x["mk"] == 1) & (acc["prev"] == 1)
        return F.struct(
            F.when(start, acc["cnt"] + 1).otherwise(acc["cnt"]).alias("cnt"),
            x["mk"].alias("prev"),
            F.when(
                start,
                F.concat(acc["inp"], F.array(sent(acc["cnt"]))),
            )
            .when(cont, acc["inp"])
            .otherwise(F.concat(acc["inp"], F.array(x["tok"])))
            .alias("inp"),
            F.when(
                start,
                F.concat(acc["tgt"], F.array(sent(acc["cnt"]), x["tok"])),
            )
            .when(cont, F.concat(acc["tgt"], F.array(x["tok"])))
            .otherwise(acc["tgt"])
            .alias("tgt"),
        )

    folded = F.aggregate(zipped, zero, step)
    return t.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        folded["cnt"].cast("bigint").alias("n_spans"),
        F.array_join(folded["inp"], " ").alias("corrupted_text"),
        F.array_join(folded["tgt"], " ").alias("target_text"),
    )


# ---------------------------------------------------------------------------
# competence-based curriculum pacing (r12).

# Order key packing: difficulty_ppm * _CUR_PACK + doc_id must be
# unique and exact. _CUR_PACK bounds doc_id; the packed key stays
# under 2^53 (difficulty_ppm is mean-chars-per-token in ppm, ~1e7 at
# the extreme), so range-bucket boundaries (doubles) order it
# deterministically. At a 100 TB doc count the pack widens to the
# corpus's id width — same plan, wider bigint.
_CUR_PACK = 10_000_000
_CUR_TIERS = 4
_CUR_STEPS = 1_000  # training-schedule horizon T

_CUR_NTOK_SQL = (
    "greatest(len(list_filter(string_split_regex(lower(text), '\\s+'), "
    "x -> x <> '')), 1)"
)


@register(
    "q_curriculum_pacing",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        f"(CAST(n_chars AS BIGINT) * 1000000) // {_CUR_NTOK_SQL} "
        "AS difficulty_ppm FROM documents), "
        "r AS (SELECT doc_id, difficulty_ppm, "
        "row_number() OVER (ORDER BY difficulty_ppm, doc_id) - 1 AS r0, "
        "count(*) OVER () AS n FROM t), "
        "p AS (SELECT doc_id, difficulty_ppm, "
        f"CAST((r0 * {_CUR_TIERS}) // n + 1 AS INTEGER) AS tier, "
        "(r0 * 1000000) // greatest(n - 1, 1) AS pr_ppm FROM r) "
        "SELECT doc_id, CAST(difficulty_ppm AS BIGINT) AS difficulty_ppm, "
        "tier, CAST(pr_ppm AS BIGINT) AS pr_ppm, "
        f"CAST((pr_ppm * pr_ppm * {_CUR_STEPS} + 999999999999) "
        "// 1000000000000 AS BIGINT) AS unlock_step FROM p"
    ),
    doc="COMPETENCE-BASED CURRICULUM PACING (Platanios et al. 2019, "
    "sqrt-competence schedule, integer-exact): each document gets a "
    "difficulty (mean chars per whitespace token, in ppm so both "
    "engines stay in exact bigint arithmetic), a corpus-wide "
    "difficulty percentile pr (ppm), a rank-quartile tier, and the "
    "earliest training step at which the sqrt schedule admits it — "
    "competence c(s) = sqrt(s/T) admits percentile pr when s >= "
    "T*pr^2, so unlock_step = ceil(T * pr_ppm^2 / 1e12) computed "
    "entirely in int64 (max 1e15 + 1e12, no doubles: the r11 sweep's "
    "round()-half-ulp trap class cannot occur). The corpus-wide rank "
    "is NOT a partition-less window (single-task at scale): it is "
    "functions/prefix.py's two-pass distributed prefix count over a "
    "packed (difficulty, doc_id) key — range-bucketed scan, per-"
    "bucket offsets, parallel local windows. Downstream, a trainer "
    "filters batches by unlock_step <= current_step: the curriculum "
    "IS a pushed-down scan predicate on this table's parquet, no "
    "reorder/shuffle of the corpus ever happens. Complements "
    "q_data_mix (source proportions) and q_sample_priority "
    "(quality-weighted inclusion): this is WHEN a doc enters "
    "training, not whether.",
)
def q_curriculum_pacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = tokens_expr(F.col("text"))
    t = d.select(
        "doc_id",
        (F.col("n_chars").cast("bigint") * F.lit(1_000_000)).alias("nc"),
        F.greatest(F.size(toks), F.lit(1)).cast("bigint").alias("ntok"),
    ).select("doc_id", F.expr("nc div ntok").alias("difficulty_ppm"))
    # guard the pack width (bounded 1-row scalar, never corpus rows)
    mx = t.agg(F.max("doc_id")).first()[0]
    if mx is not None and mx >= _CUR_PACK:
        raise RuntimeError(
            f"doc_id {mx} overflows the curriculum pack width "
            f"{_CUR_PACK}; widen _CUR_PACK for this corpus"
        )
    packed = t.withColumn(
        "okey",
        F.col("difficulty_ppm") * F.lit(_CUR_PACK) + F.col("doc_id"),
    )
    ranked = distributed_prefix_sum(
        packed, "okey", F.lit(1), out_col="r0"
    )
    n = t.count()  # bounded driver scalar (the schedule needs |corpus|)
    return (
        ranked.withColumn(
            "pr_ppm", F.expr(f"(r0 * 1000000) div {max(n - 1, 1)}")
        )
        .withColumn(
            "unlock_step",
            F.expr(
                f"(pr_ppm * pr_ppm * {_CUR_STEPS} + 999999999999) "
                "div 1000000000000"
            ),
        )
        .select(
            "doc_id",
            F.col("difficulty_ppm").cast("bigint").alias("difficulty_ppm"),
            (F.expr(f"(r0 * {_CUR_TIERS}) div {n}") + 1)
            .cast("int")
            .alias("tier"),
            F.col("pr_ppm").cast("bigint").alias("pr_ppm"),
            F.col("unlock_step").cast("bigint").alias("unlock_step"),
        )
    )


# ---------------------------------------------------------------------------
# checkpoint-resume dataloader schedule — reconstruct a training run's
# exact continuation from (epoch, optimizer step) with zero replay.

_DL_SHARDS = 4    # DDP world size: one shard per rank, lockstep steps
_DL_BATCH = 8     # per-rank micro-batch (drop_last=True)
_DL_WINDOW = 2    # steps emitted from the resume point


@register(
    "q_dataloader_resume",
    oracle=(
        "WITH e AS (SELECT i AS epoch FROM range(2) t(i)), "
        "h AS (SELECT epoch, doc_id, "
        f"((doc_id + epoch * {_EPOCH_STRIDE}) * {_KNUTH}) % {_M32} AS hv "
        "FROM documents CROSS JOIN e), "
        f"s AS (SELECT epoch, doc_id, hv, CAST(hv % {_DL_SHARDS} AS BIGINT) AS shard "
        "FROM h), "
        "p AS (SELECT epoch, shard, doc_id, "
        "row_number() OVER (PARTITION BY epoch, shard ORDER BY hv, doc_id) "
        "AS pos, count(*) OVER (PARTITION BY epoch, shard) AS n FROM s), "
        "b AS (SELECT epoch, shard, doc_id, "
        f"CAST(floor((pos - 1) / {_DL_BATCH}.0) AS BIGINT) AS opt_step, "
        f"CAST((pos - 1) % {_DL_BATCH} AS BIGINT) AS slot, "
        f"CAST(floor(n / {_DL_BATCH}.0) AS BIGINT) AS shard_steps FROM p "
        f"WHERE pos <= n - (n % {_DL_BATCH})), "
        "m AS (SELECT epoch, min(shard_steps) AS n_steps FROM "
        "(SELECT DISTINCT epoch, shard, shard_steps FROM b) GROUP BY epoch) "
        "SELECT b.epoch, opt_step, shard, slot, doc_id FROM b JOIN m "
        "ON b.epoch = m.epoch "
        "WHERE opt_step >= CAST(floor(n_steps / 2.0) AS BIGINT) "
        f"AND opt_step < CAST(floor(n_steps / 2.0) AS BIGINT) + {_DL_WINDOW} "
        "AND opt_step < n_steps"
    ),
    doc="CHECKPOINT-RESUME dataloader determinism: the exact "
    f"(epoch, optimizer step, rank, slot) -> doc assignment of a "
    f"{_DL_SHARDS}-rank lockstep (DDP-style) training run, "
    "reconstructed directly at the resume step — no replay of prior "
    "steps, no position log. Each epoch's order is the deterministic "
    "multiplicative-hash shuffle (q_epoch_shuffle's stream), sharded "
    "by hash to ranks; each rank batches its shard in hash order "
    f"(micro-batch {_DL_BATCH}, drop_last) and a global step consumes "
    "one batch per rank, so the epoch's step count is the MIN over "
    "shards of their full-batch counts — the lockstep length every "
    "DDP sampler truncates to. The query emits the _DL_WINDOW steps "
    "from each epoch's midpoint — precisely what a job restarted from "
    "a mid-epoch checkpoint must feed next — and the oracle "
    "recomputes the same slice from the full schedule, attesting "
    "resume == slice-of-full. Per-(epoch, shard) windows only: the "
    "sort is shard-local (the partitioned exchange a 1000-rank "
    "corpus shards anyway), never a global sort.",
)
def q_dataloader_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = epoch_hash_frame(
        Catalog(spark, sf_dir).documents, n_epochs=2, shards=_DL_SHARDS
    )
    w = W.partitionBy("epoch", "shard").orderBy("hv", "doc_id")
    p = h.select(
        "epoch",
        "shard",
        "doc_id",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1))
        .over(W.partitionBy("epoch", "shard"))
        .alias("n"),
    )
    b = p.filter(
        F.col("pos") <= F.col("n") - (F.col("n") % _DL_BATCH)
    ).select(
        "epoch",
        "shard",
        "doc_id",
        F.floor((F.col("pos") - 1) / _DL_BATCH)
        .cast("bigint")
        .alias("opt_step"),
        ((F.col("pos") - 1) % _DL_BATCH).cast("bigint").alias("slot"),
        F.floor(F.col("n") / _DL_BATCH).cast("bigint").alias("shard_steps"),
    )
    m = (
        b.select("epoch", "shard", "shard_steps")
        .distinct()
        .groupBy("epoch")
        .agg(F.min("shard_steps").alias("n_steps"))
    )
    return (
        b.join(F.broadcast(m), "epoch")
        .filter(
            (F.col("opt_step") >= F.floor(F.col("n_steps") / 2))
            & (
                F.col("opt_step")
                < F.floor(F.col("n_steps") / 2) + _DL_WINDOW
            )
            & (F.col("opt_step") < F.col("n_steps"))
        )
        .select("epoch", "opt_step", "shard", "slot", "doc_id")
    )


# ---------------------------------------------------------------------------
# packing with attention-boundary metadata — the mask a block-diagonal
# attention kernel needs, derived in the same pass as the packing.


@register(
    "q_pack_boundary_attention",
    oracle=(
        "WITH d AS (SELECT doc_id, doc_id % 16 AS shard, "
        "len(list_filter(string_split_regex(lower(text), '\\s+'), "
        "t -> t <> '')) AS dl FROM documents), "
        "r AS (SELECT shard, dl, sum(dl) OVER (PARTITION BY shard "
        "ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS fin "
        "FROM d WHERE dl > 0), "
        "e AS (SELECT shard, dl, fin, "
        f"unnest(range(CAST((fin - dl) // {_PACK_BUDGET} AS BIGINT), "
        f"CAST((fin - 1) // {_PACK_BUDGET} + 1 AS BIGINT))) AS seq_id "
        "FROM r), "
        "s AS (SELECT shard, seq_id, "
        f"greatest(fin - dl, seq_id * {_PACK_BUDGET}) "
        f"- seq_id * {_PACK_BUDGET} AS off, "
        f"(fin - dl) >= seq_id * {_PACK_BUDGET} AS is_new_doc FROM e) "
        "SELECT shard, seq_id, CAST(count(*) AS BIGINT) AS n_segments, "
        "CAST(sum(CASE WHEN is_new_doc THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_new_docs, "
        "string_agg(CAST(off AS VARCHAR), ',' ORDER BY off) AS boundaries "
        "FROM s GROUP BY shard, seq_id"
    ),
    doc="SEQUENCE PACKING WITH ATTENTION BOUNDARIES: the same "
    "concat-and-chunk packing as q_pack_tokens, additionally emitting "
    "per pack the ascending intra-pack offsets where attention must "
    "reset — one boundary per segment, INCLUDING a split document's "
    "continuation at offset 0 (each pack is an independent training "
    "sequence, so every segment is its own attention block; "
    "cross-pack attention into a document's earlier half would leak "
    "tokens the sequence does not contain). n_new_docs counts the "
    "segments that are true document starts — packs where it is less "
    "than n_segments begin with a continuation. Boundaries are "
    "emitted as a canonical comma-joined ascending string (offsets "
    "within a pack are distinct by construction), the exact payload a "
    "block-diagonal flash-attention kernel's cu_seqlens wants. Same "
    "plan as the packing itself: one window shuffle keyed by shard + "
    "a bounded explode — the boundary metadata is free at 100 TB, no "
    "extra pass over the corpus.",
)
def q_pack_boundary_attention(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        Catalog(spark, sf_dir)
        .documents.select(
            "doc_id",
            (F.col("doc_id") % _PACK_SHARDS).alias("shard"),
            F.size(tokens_expr(F.col("text"))).alias("dl"),
        )
        .filter(F.col("dl") > 0)
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    r = d.select("shard", "dl", F.sum("dl").over(w).alias("fin"))
    start = F.col("fin") - F.col("dl")
    e = r.select(
        "shard",
        "dl",
        "fin",
        F.explode(
            F.sequence(
                F.floor(start / _PACK_BUDGET),
                F.floor((F.col("fin") - 1) / _PACK_BUDGET),
            )
        ).alias("seq_id"),
    )
    seg_start = F.greatest(
        F.col("fin") - F.col("dl"), F.col("seq_id") * _PACK_BUDGET
    )
    s = e.select(
        "shard",
        "seq_id",
        (seg_start - F.col("seq_id") * _PACK_BUDGET).alias("off"),
        (
            (F.col("fin") - F.col("dl"))
            >= F.col("seq_id") * _PACK_BUDGET
        ).alias("is_new_doc"),
    )
    return s.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.col("is_new_doc").cast("bigint"))
        .cast("bigint")
        .alias("n_new_docs"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list("off")),
                lambda x: x.cast("string"),
            ),
        ).alias("boundaries"),
    )
