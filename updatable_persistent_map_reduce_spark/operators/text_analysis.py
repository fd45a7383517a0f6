"""Tier B — text analysis over the ``documents`` corpus.

Language ID (stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), document fingerprinting (rolling hash),
and per-(lang, source) corpus stats. Everything is a JVM-side Catalyst
expression — tokenizers and hashes run inside whole-stage codegen, so
at 100 TB these are single-scan map jobs (plus one partial/final agg
where grouped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    BPE_TOKEN_RE,
    fingerprint_expr,
    fingerprint_sql,
    shingle_strings_udf,
    tokens_expr,
)
from ..sources import Catalog
from . import register

# ---------------------------------------------------------------------------
# corpus stats


@register(
    "q_text_stats",
    oracle=(
        "SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs, "
        "round(CAST(avg(len(list_filter(string_split_regex(lower(text), '\\s+'), "
        "t -> t <> ''))) AS DOUBLE), 4) AS avg_tokens, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars "
        "FROM documents GROUP BY lang, source"
    ),
    doc="Corpus rollup per (lang, source): doc counts, mean token length, "
    "char volume — the word-count shape (Tier A's flagship) over text.",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    # Token COUNT needs no token array: counting maximal \S+ runs is
    # identical to len(filter(split(\s+), != '')) and regexp_extract_all
    # stays inside whole-stage codegen (the filter/split HOF pipeline is
    # interpreted — measurably slower and jittery at scan width).
    ntok = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# token counting


@register(
    "q_token_count",
    oracle=(
        "SELECT doc_id, "
        "CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), "
        "t -> t <> '')) AS INTEGER) AS ws_tokens, "
        "CAST(len(regexp_extract_all(text, "
        "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INTEGER) AS bpe_tokens "
        "FROM documents"
    ),
    doc="Token counting: whitespace tokens + BPE-ish pre-tokenization "
    "(letter runs / digit runs / single symbols) via regexp_extract_all.",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.size(tokens_expr(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_TOKEN_RE), F.lit(0))).alias(
            "bpe_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# BPE merge-table tokenizer — actual merge application, not a regex
# proxy.

_BPE_MERGES = 8  # bounded merge iterations (one pass per rule)


def _bpe_apply_expr(cs, a, b):
    """One BPE merge rule applied to a char/subword array — pure
    Catalyst. Greedy leftmost non-overlapping matching is ORDER-FREE
    here because self-pair rules (a == b) are excluded from the merge
    table: two adjacent positions can't both match (it would force
    a == b), so every match site merges and the rebuild is a plain
    per-index transform. A merged token ab can never re-create the
    (a, b) pair (ab differs from both halves), so ONE pass per rule
    is the exact fixpoint of that rule. F.get is 0-based and yields
    NULL out of bounds, which the when() treats as no-match."""
    n = F.size(cs)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.when(
                (i > 0)
                & (F.get(cs, i - 1) == a)
                & (F.get(cs, i) == b),
                F.array().cast("array<string>"),
            )
            .when(
                (i < n - 1)
                & (F.get(cs, i) == a)
                & (F.get(cs, i + 1) == b),
                F.array(F.concat(F.get(cs, i), F.get(cs, i + 1))),
            )
            .otherwise(F.array(F.get(cs, i))),
        )
    )


def _bpe_oracle() -> str:
    """DuckDB oracle: same merge table (occurrence-weighted char
    bigram counts, c DESC / a / b tie-break, self-pairs excluded,
    top-8) and the same one-pass-per-rule application, chained as
    CTEs. rules[k] beyond the table's length is NULL, making that
    rule the identity in BOTH engines."""
    apply_tpl = (
        "flatten(list_transform(range(1, len(cs) + 1), i -> "
        "CASE WHEN i > 1 AND cs[i-1] = rules[{k}]['a'] "
        "AND cs[i] = rules[{k}]['b'] THEN [] "
        "WHEN i < len(cs) AND cs[i] = rules[{k}]['a'] "
        "AND cs[i+1] = rules[{k}]['b'] THEN [cs[i] || cs[i+1]] "
        "ELSE [cs[i]] END))"
    )
    chain = []
    prev = "s0"
    for k in range(1, _BPE_MERGES + 1):
        chain.append(
            f"s{k} AS (SELECT w, rules, "
            + apply_tpl.format(k=k)
            + f" AS cs FROM {prev})"
        )
        prev = f"s{k}"
    return (
        r"WITH tok AS (SELECT doc_id, "
        r"unnest(list_filter(string_split_regex(lower(text), '\s+'), "
        r"t -> t <> '')) AS w FROM documents), "
        "occ AS (SELECT doc_id, w, count(*) AS occ FROM tok "
        "GROUP BY doc_id, w), "
        "wf AS (SELECT w, CAST(sum(occ) AS BIGINT) AS wtot FROM occ "
        "GROUP BY w), "
        "v AS (SELECT w, wtot, list_transform(range(1, len(w) + 1), "
        "i -> substr(w, i, 1)) AS cs FROM wf), "
        "bp AS (SELECT cs[i] AS a, cs[i+1] AS b, wtot FROM "
        "(SELECT cs, wtot, unnest(range(1, len(cs))) AS i FROM v)), "
        "mt AS (SELECT a, b, sum(wtot) AS c FROM bp WHERE a <> b "
        f"GROUP BY a, b ORDER BY c DESC, a, b LIMIT {_BPE_MERGES}), "
        "rl AS (SELECT list({'a': a, 'b': b} ORDER BY c DESC, a, b) "
        "AS rules FROM mt), "
        "s0 AS (SELECT v.w, v.cs, rl.rules FROM v CROSS JOIN rl), "
        + ", ".join(chain)
        + ", sub AS (SELECT w, CAST(len(cs) AS BIGINT) AS n_sub "
        f"FROM {prev}) "
        "SELECT o.doc_id, CAST(sum(o.occ) AS BIGINT) AS n_words, "
        "CAST(sum(o.occ * len(o.w)) AS BIGINT) AS n_chars, "
        "CAST(sum(o.occ * s.n_sub) AS BIGINT) AS n_subwords "
        "FROM occ o JOIN sub s ON o.w = s.w GROUP BY o.doc_id"
    )


@register(
    "q_tokenize_bpe",
    oracle=_bpe_oracle(),
    doc="BPE merge-table tokenizer (r8 — upgrades q_token_count's "
    "regex proxy to the operator a token-budget pipeline actually "
    "runs: real merge application): the merge table is the top-8 "
    "occurrence-weighted adjacent character bigrams over the corpus "
    "(count DESC / pair ASC tie-break — a deterministic "
    "single-generation table, no iterative recount, so both engines "
    "derive it bit-identically; self-pairs excluded, which PROVES "
    "one-pass-per-rule exactness — see _bpe_apply_expr), broadcast "
    "as plan literals, and applied rule-by-rule to each word's "
    "character array as pure Catalyst HOF transforms — no Python "
    "anywhere. The 100 TB shape: merges run over the DISTINCT "
    "vocabulary (corpus-frequency-weighted), never per word "
    "occurrence — tokenizing 100 TB is a vocab-sized merge job plus "
    "one corpus-sized join on the word, exactly how production "
    "tokenizer services amortize; per-doc output (word / char / "
    "subword counts) is all-integer so the oracle hash is exact.",
)
def q_tokenize_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_doc_counts(Catalog(spark, sf_dir).documents)


def chars_expr(word) -> "F.Column":
    """array<string> of a word's characters — the BPE starting state."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def bpe_merge_table(occ: DataFrame) -> list:
    """Top-_BPE_MERGES occurrence-weighted adjacent char-bigram merge
    rules from a (doc_id, w, occ) frame; deterministic (count DESC,
    pair ASC), self-pairs excluded. The bounded 8-row collect is the
    broadcast merge table."""
    wf = occ.groupBy("w").agg(F.sum("occ").alias("wtot"))
    v = wf.select("w", "wtot", chars_expr(F.col("w")).alias("cs"))
    bp = v.filter(F.size("cs") >= 2).select(
        "wtot",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("cs") - 2),
                lambda i: F.struct(
                    F.get("cs", i).alias("a"),
                    F.get("cs", i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    )
    return (
        bp.select("p.a", "p.b", "wtot")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("wtot").alias("c"))
        .orderBy(F.col("c").desc(), "a", "b")
        .limit(_BPE_MERGES)
        .collect()
    )


def bpe_apply_rules(df: DataFrame, rules: list, col: str = "cs") -> DataFrame:
    """Chain the merge rules over ``col`` (one projection per rule —
    named-attribute chaining keeps Catalyst from inlining the 5x
    self-references per level into an exponential expression tree)."""
    for r in rules:
        df = df.withColumn(
            col, _bpe_apply_expr(F.col(col), F.lit(r["a"]), F.lit(r["b"]))
        )
    return df


def bpe_doc_counts(d: DataFrame) -> DataFrame:
    """Per-doc (n_words, n_chars, n_subwords) under the corpus-derived
    merge table, computed the vocab-amortized way: merges run once per
    DISTINCT word, then one join back to per-doc occurrence counts.
    tools/scale_bpe.py measures this against the per-occurrence naive
    form."""
    tok = d.select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("w")
    )
    occ = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("occ"))
    # The merge-table build collects (materializes) occ; cache it only
    # for the duration of that build, then release. The returned plan
    # is lazy, so holding the cache until "after the caller collects"
    # would leak cached partitions for the SparkSession lifetime (gate
    # reruns, scale_bpe octaves) — instead the final join deliberately
    # recomputes the cheap token groupBy, the same trade
    # NearDupIndex.probe makes.
    occ.persist()
    try:
        rules = bpe_merge_table(occ)
    finally:
        occ.unpersist()
    v = occ.select("w").distinct().withColumn(
        "cs", chars_expr(F.col("w"))
    )
    sub = bpe_apply_rules(v, rules).select(
        "w", F.size("cs").cast("long").alias("n_sub")
    )
    return (
        occ.join(sub, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("occ").cast("bigint").alias("n_words"),
            F.sum(F.col("occ") * F.length("w")).cast("bigint").alias(
                "n_chars"
            ),
            F.sum(F.col("occ") * F.col("n_sub")).cast("bigint").alias(
                "n_subwords"
            ),
        )
    )


# ---------------------------------------------------------------------------
# language id — stopword-hit heuristic, deterministic in both engines.

_STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "a"],
    "es": ["el", "la", "de", "los", "que", "y", "en"],
    "fr": ["le", "la", "les", "des", "et", "un", "une"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
}


def _hits_sql(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return (
        f"len(list_filter(toks, t -> list_contains([{arr}], t)))"
    )


def stopword_hits(toks_col, words: list[str]):
    """Count of tokens in ``words`` — shared by lang-id, quality
    scoring, and the pipeline funnel so every consumer uses the exact
    same codegen expression (single-arg lambda: higher-order filter()
    treats a second parameter as the element index)."""
    sw = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks_col, lambda t: F.array_contains(sw, t)))


@register(
    "q_lang_id",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks "
        "FROM documents), s AS (SELECT doc_id, "
        + ", ".join(f"{_hits_sql(lang)} AS h_{lang}" for lang in _STOPWORDS)
        + " FROM t) "
        "SELECT doc_id, CASE "
        "WHEN h_en = 0 AND h_es = 0 AND h_fr = 0 AND h_de = 0 THEN 'und' "
        "WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_de THEN 'en' "
        "WHEN h_es >= h_fr AND h_es >= h_de THEN 'es' "
        "WHEN h_fr >= h_de THEN 'fr' ELSE 'de' END AS pred_lang FROM s"
    ),
    doc="Language ID by stopword-hit argmax (fixed priority tie-break): "
    "an n-gram/heuristic classifier shape — pure codegen, single scan.",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = tokens_expr(F.col("text"))
    scored = d.select("doc_id", toks.alias("toks"))
    for lang, words in _STOPWORDS.items():
        scored = scored.withColumn(
            f"h_{lang}", stopword_hits(F.col("toks"), words)
        )
    pred = (
        F.when(
            (F.col("h_en") == 0)
            & (F.col("h_es") == 0)
            & (F.col("h_fr") == 0)
            & (F.col("h_de") == 0),
            F.lit("und"),
        )
        .when(
            (F.col("h_en") >= F.col("h_es"))
            & (F.col("h_en") >= F.col("h_fr"))
            & (F.col("h_en") >= F.col("h_de")),
            F.lit("en"),
        )
        .when(
            (F.col("h_es") >= F.col("h_fr")) & (F.col("h_es") >= F.col("h_de")),
            F.lit("es"),
        )
        .when(F.col("h_fr") >= F.col("h_de"), F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return scored.select("doc_id", pred.alias("pred_lang"))


# ---------------------------------------------------------------------------
# quality scoring


@register(
    "q_quality_score",
    oracle=(
        "WITH t AS (SELECT doc_id, n_chars, "
        "len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS ntok, "
        "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS npunct, "
        + _hits_sql("en").replace(
            "toks", "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
        )
        + " AS nstop FROM documents) "
        "SELECT doc_id, CAST(ntok AS INTEGER) AS n_tokens, "
        "round(CAST(npunct AS DOUBLE) / greatest(n_chars, 1), 4) AS punct_ratio, "
        "round(CAST(nstop AS DOUBLE) / greatest(ntok, 1), 4) AS stop_ratio, "
        "CASE WHEN ntok >= 20 AND ntok <= 1000 "
        "AND CAST(npunct AS DOUBLE) / greatest(n_chars, 1) < 0.1 "
        "AND CAST(nstop AS DOUBLE) / greatest(ntok, 1) >= 0.01 "
        "THEN TRUE ELSE FALSE END AS is_quality FROM t"
    ),
    doc="Heuristic quality score: length band, punctuation density, "
    "stopword ratio -> boolean gate (the C4-style cleaning shape).",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = tokens_expr(F.col("text"))
    base = d.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("ntok"),
        F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))).alias(
            "npunct"
        ),
        stopword_hits(toks, _STOPWORDS["en"]).alias("nstop"),
    )
    punct_ratio = F.col("npunct").cast("double") / F.greatest(
        F.col("n_chars"), F.lit(1)
    )
    stop_ratio = F.col("nstop").cast("double") / F.greatest(F.col("ntok"), F.lit(1))
    return base.select(
        "doc_id",
        F.col("ntok").alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        (
            (F.col("ntok") >= 20)
            & (F.col("ntok") <= 1000)
            & (punct_ratio < 0.1)
            & (stop_ratio >= 0.01)
        ).alias("is_quality"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing

# Pattern classes a real pipeline scrubs; on the synthetic corpus only
# digit runs fire, but the operator is class-generic. Both regexes are
# RE2-safe so Spark's and DuckDB's engines agree.
_PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_NUM_RE = r"[0-9]+"


@register(
    "q_pii_scrub",
    oracle=(
        "SELECT event_id, "
        f"CAST(len(regexp_extract_all(props, '{_PII_EMAIL_RE}')) AS INTEGER) "
        "AS n_email, "
        f"CAST(len(regexp_extract_all(props, '{_PII_NUM_RE}')) AS INTEGER) "
        "AS n_num, "
        f"regexp_replace(regexp_replace(props, '{_PII_EMAIL_RE}', "
        "'<EMAIL>', 'g'), "
        f"'{_PII_NUM_RE}', '<NUM>', 'g') AS scrubbed "
        "FROM events"
    ),
    doc="PII scrubbing: count + redact pattern classes (emails, numeric "
    "identifiers) in a free-text column — the privacy pass a training "
    "pipeline runs before packing. Pure codegen regex map over one scan; "
    "at 100 TB this is embarrassingly parallel with zero shuffle, and "
    "new pattern classes are one more regexp_replace in the same "
    "projection.",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    scrubbed = F.regexp_replace(
        F.regexp_replace("props", _PII_EMAIL_RE, "<EMAIL>"),
        _PII_NUM_RE,
        "<NUM>",
    )
    return ev.select(
        "event_id",
        F.size(F.regexp_extract_all("props", F.lit(_PII_EMAIL_RE), F.lit(0))).alias(
            "n_email"
        ),
        F.size(F.regexp_extract_all("props", F.lit(_PII_NUM_RE), F.lit(0))).alias(
            "n_num"
        ),
        scrubbed.alias("scrubbed"),
    )


# ---------------------------------------------------------------------------
# repetition-based quality filtering (Gopher-style)


@register(
    "q_repetition_filter",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') "
        "AS toks FROM documents) "
        "SELECT doc_id, "
        "round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / "
        "greatest(len(toks), 1), 4) AS dup_ratio, "
        "round(CAST(list_max(list_transform(list_distinct(toks), "
        "d -> len(list_filter(toks, t -> t = d)))) AS DOUBLE) / "
        "greatest(len(toks), 1), 4) AS top_token_ratio, "
        "CASE WHEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / "
        "greatest(len(toks), 1) > 0.5 THEN TRUE ELSE FALSE END "
        "AS is_repetitive FROM t"
    ),
    doc="Repetition-based quality filter (the Gopher-rules shape): "
    "duplicate-token fraction and most-frequent-token share per doc, "
    "with a repetition gate. Array HOFs keep it a single-scan map; the "
    "per-doc top-token count is O(distinct x tokens) inside the row — "
    "fine for document-sized arrays; the at-scale alternative for huge "
    "docs is explode + two-key partial agg, same result.",
)
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = tokens_expr(F.col("text"))
    base = d.select("doc_id", toks.alias("toks"))
    n = F.greatest(F.size("toks"), F.lit(1))
    dup_ratio = F.lit(1.0) - F.size(F.array_distinct("toks")).cast("double") / n
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda dtok: F.size(F.filter(F.col("toks"), lambda t: t == dtok)),
        )
    )
    return base.select(
        "doc_id",
        F.round(dup_ratio, 4).alias("dup_ratio"),
        F.round(top_cnt.cast("double") / n, 4).alias("top_token_ratio"),
        (dup_ratio > 0.5).alias("is_repetitive"),
    )


# ---------------------------------------------------------------------------
# document fingerprint


@register(
    "q_doc_fingerprint",
    oracle=(
        "SELECT doc_id, " + fingerprint_sql("text") + " AS fingerprint "
        "FROM documents"
    ),
    doc="64-bit rolling polynomial fingerprint of the raw text "
    "(functions/text.py): exact-dup detection key and shard-stable doc "
    "identity; DECIMAL(38) fold keeps it engine-portable.",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    return d.select("doc_id", fingerprint_expr(F.col("text")).alias("fingerprint"))


# ---------------------------------------------------------------------------
# corpus n-gram frequency table

TOP_NGRAMS = 50


@register(
    "q_ngram_stats",
    oracle=(
        "WITH sh AS (SELECT doc_id, "
        "unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1), "
        "i -> array_to_string(toks[i:i+2], ' '))) AS ngram FROM ("
        "SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), "
        "t -> t <> '') AS toks FROM documents)) "
        "SELECT ngram, CAST(count(*) AS BIGINT) AS n_occur, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
        "FROM sh GROUP BY ngram "
        f"ORDER BY n_occur DESC, ngram LIMIT {TOP_NGRAMS}"
    ),
    doc="Corpus n-gram frequency table: top-50 word-3grams by total "
    "occurrences (ties broken by ngram — a deterministic total order, "
    "so both engines pick identical boundary rows), with the distinct-"
    "doc count per ngram. The frequency profile a pipeline uses for "
    "boilerplate detection and contamination analysis. Scale shape: "
    "shingling is an Arrow-batched map (measured 5x the interpreted "
    "HOF pipeline, see functions/text.py:shingle_strings_udf), explode "
    "is map-side, the count aggregates partially before the one "
    "shuffle, and the final top-k is TakeOrdered (per-partition heaps "
    "+ driver merge of k·P rows) — never a global sort.",
)
def q_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    sh = d.select(
        "doc_id",
        F.explode(shingle_strings_udf(3)("text")).alias("ngram"),
    )
    return (
        sh.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occur"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occur").desc(), "ngram")
        .limit(TOP_NGRAMS)
    )


# ---------------------------------------------------------------------------
# character entropy — the gibberish/boilerplate filter of the C4 and
# Gopher cleaning recipes, exact and oracle-checked.

ENTROPY_LOW = 3.8  # bits; english prose sits ~4.0-4.3 on [a-z0-9]


@register(
    "q_char_entropy",
    oracle=(
        "WITH ch AS (SELECT doc_id, "
        "unnest(regexp_extract_all(lower(text), '[a-z0-9]')) AS c "
        "FROM documents), "
        "f AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS cnt "
        "FROM ch GROUP BY doc_id, c) "
        "SELECT doc_id, "
        "round(log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt), 6) "
        "AS char_entropy, "
        f"CAST(round(log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt), 6) "
        f"< {ENTROPY_LOW} AS INTEGER) AS is_low_entropy "
        "FROM f GROUP BY doc_id"
    ),
    doc="Shannon character entropy per document over [a-z0-9] — the "
    "gibberish / keyboard-mash / boilerplate filter of the C4/Gopher "
    "cleaning recipes (repeated-character spam scores ~0 bits, English "
    "prose ~4.0-4.3; flagged under "
    f"{ENTROPY_LOW}). Exact, not sampled: entropy is folded to "
    "aggregate-friendly form H = log2(T) - sum(c*log2 c)/T so each "
    "stage is one partial+final HashAggregate — per-(doc,char) counts "
    "combine map-side (<= 36 rows per doc reach the wire, about the "
    "text's own width), then one row per doc. Complements "
    "q_repetition_filter (which catches LINE-level repeats; entropy "
    "catches character-level degeneracy).",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    ch = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]"), 0)
        ).alias("c"),
    )
    f = ch.groupBy("doc_id", "c").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    total = F.sum("cnt")
    entropy = F.round(
        F.log2(total) - F.sum(F.col("cnt") * F.log2("cnt")) / total, 6
    )
    return f.groupBy("doc_id").agg(
        entropy.alias("char_entropy"),
        (entropy < ENTROPY_LOW).cast("int").alias("is_low_entropy"),
    )


# ---------------------------------------------------------------------------
# corpus-statistics fluency — the perplexity-filter pattern


@register(
    "q_bigram_fluency",
    oracle=(
        "WITH toks AS (SELECT doc_id, "
        "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') "
        "AS l FROM documents), "
        "big AS (SELECT doc_id, l[CAST(i AS INTEGER)] AS w1, "
        "l[CAST(i AS INTEGER) + 1] AS w2 "
        "FROM toks, UNNEST(generate_series(1, len(l) - 1, 1)) AS u(i) "
        "WHERE len(l) >= 2), "
        "cnt AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c "
        "FROM big GROUP BY w1, w2) "
        "SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        "round(CAST(sum(c) AS DOUBLE) / count(*), 6) AS fluency "
        "FROM big b JOIN cnt USING (w1, w2) "
        "GROUP BY b.doc_id"
    ),
    doc="Corpus-statistics fluency scoring — the LM-perplexity-filter "
    "pattern (CCNet/Gopher bucket documents by how 'expected' their "
    "token sequences are) with the corpus's OWN bigram table as the "
    "language model: each document scores the mean corpus frequency "
    "of its adjacent token pairs, so gibberish (bigrams nobody else "
    "produces) scores ~1 and formulaic text scores high. Kept "
    "engine-exact by construction: the score is one division of two "
    "exact integers (sum of BIGINT bigram counts / bigram count), "
    "rounded once — unlike a sum of per-bigram log-probs, whose "
    "float addition order differs between Spark partitions and "
    "DuckDB's sequential scan. Plan: bigrams are built with ZERO "
    "shuffle (arrays_zip of two array slices, map-side explode), "
    "counted with one hash shuffle, joined back (second shuffle), "
    "and reduced per doc. At 100 TB the count table is itself "
    "corpus-scale, so both shuffles are linear and AQE-sized; a "
    "deployment chasing constant-factor wins would cap the table to "
    "top-K bigrams (rare ones contribute ~1 each regardless) and "
    "broadcast it.",
)
def q_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select(
        "doc_id", tokens_expr(F.col("text")).alias("l")
    ).filter(F.size("l") >= 2)
    n = F.size("l")
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("l", 1, n - 1).alias("w1"),
                F.slice(F.col("l"), 2, n - 1).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    return (
        pairs.join(counts, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("c").cast("double") / F.count(F.lit(1)), 6
            ).alias("fluency"),
        )
    )


@register(
    "q_heavy_hitters",
    oracle=(
        "WITH tok AS (SELECT unnest(list_filter(string_split_regex("
        "lower(text), '\\s+'), x -> x <> '')) AS tok FROM documents), "
        "c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt "
        "FROM tok GROUP BY tok) "
        "SELECT tok, cnt FROM c ORDER BY cnt DESC, tok LIMIT 20"
    ),
    doc="PROVABLY-EXACT top-k tokens by frequency (vocabulary heavy "
    "hitters, the vocab-construction / stopword-discovery op) in two "
    "passes that never shuffle the full vocabulary: pass 1 runs a "
    "Misra-Gries summary per partition (Arrow-batched mapInPandas, "
    "capacity 2048; per-batch Counter at C speed, MG merge = add "
    "counts, subtract the (c+1)-th largest, drop <=0), whose union is "
    "a candidate set guaranteed to contain every token with true "
    "count > N/c; pass 2 recounts ONLY candidates exactly (explode -> "
    "broadcast semi-join -> hash agg), so the shuffle carries "
    "candidate tokens instead of the whole vocab. The exactness "
    "certificate is checked in-query: the k-th recounted frequency "
    "must exceed N/c (then no non-candidate can displace the top-k) "
    "— a corpus where the guarantee fails raises rather than "
    "returning a silently-approximate answer. Tie-break (cnt DESC, "
    "tok ASC) pinned on both engines. At 100 TB: pass-1 state is "
    "c per partition, pass-2 shuffle is |candidates| — both "
    "independent of vocabulary size; the naive groupBy ships every "
    "distinct token through the exchange.",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections import Counter
    from itertools import chain

    import pandas as pd

    d = Catalog(spark, sf_dir).documents
    toks = d.select(tokens_expr(F.col("text")).alias("toks"))
    capacity = 2048
    k = 20

    def mg_candidates(batches):
        counters: Counter = Counter()
        for pdf in batches:
            counters.update(chain.from_iterable(pdf["toks"]))
            if len(counters) > capacity:
                # MG merge-trim: subtract the (c+1)-th largest count,
                # drop non-positive — coverage error grows by at most
                # (tokens seen)/c, preserving the N/c guarantee
                kth = sorted(counters.values(), reverse=True)[capacity]
                counters = Counter(
                    {t: n - kth for t, n in counters.items() if n > kth}
                )
        yield pd.DataFrame({"tok": pd.Series(list(counters), dtype="object")})

    candidates = (
        toks.mapInPandas(mg_candidates, "tok string").distinct()
    )
    exact = (
        d.select(F.explode(tokens_expr(F.col("text"))).alias("tok"))
        .join(F.broadcast(candidates), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(k)
    )
    top = exact.collect()
    [[n_tokens]] = toks.select(F.sum(F.size("toks"))).collect()
    kth_cnt = top[-1]["cnt"] if len(top) == k else 0
    if kth_cnt * capacity <= n_tokens:
        raise RuntimeError(
            f"heavy-hitter certificate failed: k-th count {kth_cnt} <= "
            f"N/c = {n_tokens}/{capacity} — a non-candidate token could "
            "outrank the tail of this top-k, so the two-pass answer is "
            "not provably exact on this corpus; raise the capacity"
        )
    return exact


# ---------------------------------------------------------------------------
# HTML/markup boilerplate extraction — the crawl-prep step upstream of
# quality filtering in every real pretraining pipeline.

# Deterministic markup is BUILT from document fields identically in
# both engines (documents.text contains no markup), so the oracle
# exercises the extraction pipeline on real tags rather than a no-op.
_HTML_SEG_SPLIT = "</(?:p|div|h1|title)>"
_HTML_TAG = "<[^>]*>"
_HTML_ANCHOR = "<a [^>]*>([^<]*)</a>"


def html_wrap_expr():
    """The synthetic page: title + style + script boilerplate, a
    heading, the doc's text split over two paragraphs, and a pure-link
    nav <div> whose link density must get it banded out."""
    return F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>body{margin:0}</style><script>var v="),
        F.col("doc_id").cast("string"),
        F.lit(";</script></head><body><h1>"),
        F.col("lang"),
        F.lit(" "),
        F.col("source"),
        F.lit("</h1><p>"),
        F.substring(F.col("text"), 1, 80),
        F.lit('</p><div><a href="/h">home</a> <a href="/a">about</a> '
              '<a href="/c">contact</a></div><p>'),
        F.expr("substring(text, 81)"),
        F.lit(' tail <a href="/r">ref</a></p></body></html>'),
    )


def _html_wrap_sql() -> str:
    return (
        "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
        "'</title><style>body{margin:0}</style><script>var v=' || "
        "CAST(doc_id AS VARCHAR) || ';</script></head><body><h1>' || "
        "lang || ' ' || source || '</h1><p>' || substring(text, 1, 80) || "
        "'</p><div><a href=\"/h\">home</a> <a href=\"/a\">about</a> "
        "<a href=\"/c\">contact</a></div><p>' || substring(text, 81) || "
        "' tail <a href=\"/r\">ref</a></p></body></html>'"
    )


@register(
    "q_html_extract",
    oracle=(
        "WITH pages AS (SELECT doc_id, " + _html_wrap_sql() + " AS html "
        "FROM documents), "
        "nos AS (SELECT doc_id, "
        "regexp_replace(regexp_replace(html, "
        "'<script[^>]*>.*?</script>', ' ', 'g'), "
        "'<style[^>]*>.*?</style>', ' ', 'g') AS h FROM pages), "
        "segs AS (SELECT doc_id, list_transform("
        f"string_split_regex(h, '{_HTML_SEG_SPLIT}'), s -> struct_pack("
        "norm := trim(regexp_replace(regexp_replace(s, "
        f"'{_HTML_TAG}', ' ', 'g'), ' +', ' ', 'g')), "
        "link := CAST(coalesce(list_sum(list_transform("
        f"regexp_extract_all(s, '{_HTML_ANCHOR}', 1), "
        "a -> length(a))), 0) AS BIGINT))) AS xs FROM nos), "
        "ne AS (SELECT doc_id, "
        "list_filter(xs, x -> length(x.norm) > 0) AS xs FROM segs), "
        "banded AS (SELECT doc_id, xs, "
        "list_filter(xs, x -> 2 * x.link < length(x.norm)) AS kept "
        "FROM ne) "
        "SELECT doc_id, "
        "array_to_string(list_transform(kept, x -> x.norm), ' ') "
        "AS clean_text, "
        "CAST(len(kept) AS INTEGER) AS kept_segments, "
        "CAST(len(xs) - len(kept) AS INTEGER) AS dropped_segments, "
        "CAST(coalesce(list_sum(list_transform(xs, "
        "x -> CAST(length(x.norm) AS BIGINT))), 0) AS BIGINT) AS text_chars, "
        "CAST(coalesce(list_sum(list_transform(xs, x -> x.link)), 0) "
        "AS BIGINT) AS link_chars "
        "FROM banded"
    ),
    doc="HTML BOILERPLATE EXTRACTION — the crawl-prep step upstream of "
    "q_quality_score that every pretraining pipeline runs before "
    "quality filtering. Deterministic markup is synthesized from "
    "document fields (identically in both engines — the corpus has no "
    "tags of its own), then the extraction pipeline: script/style "
    "block removal (non-greedy regex, RE2-safe so Java and RE2 agree), "
    "segmentation at block-closing tags, per-segment LINK-DENSITY "
    "banding (drop a segment when anchor text is >= half its text — "
    "integer cross-multiplication, no float ratio), tag stripping and "
    "whitespace normalization, and per-doc accounting of kept/dropped "
    "segments and text/link chars. Pure chained regexp_replace + "
    "higher-order array ops — single-scan map job, no shuffle, no "
    "Python; at 100 TB this is the classic boilerplate-strip pass "
    "(Readability/jusText's link-density heuristic, relationally).",
)
def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    nos = F.regexp_replace(
        F.regexp_replace(
            html_wrap_expr(), "<script[^>]*>.*?</script>", " "
        ),
        "<style[^>]*>.*?</style>",
        " ",
    )
    norm = lambda s: F.trim(  # noqa: E731
        F.regexp_replace(
            F.regexp_replace(s, _HTML_TAG, " "), " +", " "
        )
    )
    link_len = lambda s: F.aggregate(  # noqa: E731
        F.regexp_extract_all(s, F.lit(_HTML_ANCHOR), 1),
        F.lit(0).cast("long"),
        lambda acc, a: acc + F.length(a),
    )
    segs = F.transform(
        F.split(nos, _HTML_SEG_SPLIT),
        lambda s: F.struct(
            norm(s).alias("norm"), link_len(s).alias("link")
        ),
    )
    ne = F.filter(segs, lambda x: F.length(x["norm"]) > 0)
    kept = F.filter(ne, lambda x: 2 * x["link"] < F.length(x["norm"]))
    sum_long = lambda arr, f: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + f(x)
    )
    return d.select(
        "doc_id",
        F.array_join(
            F.transform(kept, lambda x: x["norm"]), " "
        ).alias("clean_text"),
        F.size(kept).alias("kept_segments"),
        (F.size(ne) - F.size(kept)).cast("int").alias("dropped_segments"),
        sum_long(ne, lambda x: F.length(x["norm"]).cast("long")).alias(
            "text_chars"
        ),
        sum_long(ne, lambda x: x["link"]).alias("link_chars"),
    )


# ---------------------------------------------------------------------------
# learned quality gate — linear classifier over hashed token features.

# fastText/CCNet-style linear text classifier, frozen to an integer
# weight table: 256 hash buckets, weights in [-1000, 1000] derived from
# a Knuth multiplicative mix of the bucket index (deterministic, no
# training dependency in this container — swapping in real learned
# weights changes ONLY this list). The bucket function is a fixed
# 3-feature string mix (first char, length, last char) chosen because
# BOTH engines compute it with identical integer semantics — the
# hashing-trick plumbing is the point; collisions are fine, exactly as
# in the published hashing-trick classifiers.
_QC_BUCKETS = 256
_QC_W = [
    ((i + 1) * 2654435761) % (2**31) % 2001 - 1000
    for i in range(_QC_BUCKETS)
]
_QC_BUCKET_SQL = (
    "(ascii(t) * 131 + length(t) * 31 + ascii(right(t, 1))) % 256"
)

# DuckDB expression for the per-doc integer score over a token-array
# column named ``toks`` — shared with the streaming quota gate.
QC_SCORE_SQL = (
    "CAST(COALESCE(list_sum(list_transform(toks, t -> "
    f"[{', '.join(str(w) for w in _QC_W)}][{_QC_BUCKET_SQL} + 1])), 0) "
    "AS BIGINT)"
)


def qc_score_col(text_col):
    """Spark Column: the classifier's integer dot-product score for a
    text column — the exact expression q_quality_classifier registers,
    shared with the streaming quota gate and q_preference_pairs. The
    token array is coalesced to empty so a NULL-text doc scores 0,
    matching QC_SCORE_SQL's COALESCE(list_sum(...), 0) — before this,
    NULL text scored NULL in Spark vs 0 in the oracle and a NULL-text
    doc could rank differently between the engines (r10 advice)."""
    warr = F.array(*[F.lit(w) for w in _QC_W])

    def _wt(t):
        b = (
            F.ascii(t) * 131
            + F.length(t) * 31
            + F.ascii(F.substring(t, -1, 1))
        ) % _QC_BUCKETS
        return F.element_at(warr, (b + 1).cast("int")).cast("long")

    toks = F.coalesce(
        tokens_expr(text_col), F.array().cast("array<string>")
    )
    return F.aggregate(
        F.transform(toks, _wt),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


@register(
    "q_quality_classifier",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') "
        "AS toks FROM documents), "
        "s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(list_sum(list_transform(toks, t -> "
        f"[{', '.join(str(w) for w in _QC_W)}][{_QC_BUCKET_SQL} + 1])), 0) "
        "AS BIGINT) AS score FROM t) "
        "SELECT doc_id, n_tokens, score, "
        "CASE WHEN n_tokens = 0 THEN 5000 ELSE "
        "CAST((score + 1000 * n_tokens) * 10000 // (2000 * n_tokens) "
        "AS BIGINT) END AS quality_bp, "
        "CAST(score >= 0 AS INT) AS keep FROM s"
    ),
    doc="LEARNED QUALITY GATE — a linear (fastText/CCNet-style) "
    "classifier applied at corpus scale: per document, the dot product "
    "of hashed token features with a broadcast integer weight table "
    "(256 buckets, plan-literal array = the broadcast), an integer "
    "length-normalized score in basis points, and the keep decision. "
    "Upstream q_lang_id / q_quality_score are heuristic gates; this is "
    "the LEARNED gate with the same map-only shape: one scan, the "
    "weight lookup + dot product entirely in JVM array expressions "
    "(element_at over a literal array inside aggregate/transform), no "
    "Python, no shuffle — at 100 TB this is embarrassingly parallel "
    "and reads each split once. The normalized score is shifted "
    "positive ((score + 1000n) * 10000 DIV 2000n) so integer division "
    "agrees across engines (Spark DIV truncates toward zero, DuckDB // "
    "floors — they differ on negatives).",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = tokens_expr(F.col("text"))
    scored = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        qc_score_col(F.col("text")).alias("score"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "score",
        F.when(F.col("n_tokens") == 0, F.lit(5000).cast("long"))
        .otherwise(
            F.expr(
                "(score + 1000 * n_tokens) * 10000 DIV (2000 * n_tokens)"
            )
        )
        .alias("quality_bp"),
        (F.col("score") >= 0).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# PMI collocations — corpus-level bigram association mining.

_PMI_MIN_PAIR = 5  # support floor: PMI of singletons is pure noise
_PMI_TOP = 50


@register(
    "q_pmi_collocations",
    oracle=(
        "WITH t AS (SELECT doc_id, "
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') "
        "AS toks FROM documents), "
        "big AS (SELECT toks[i] AS w1, toks[i+1] AS w2 "
        "FROM t, UNNEST(range(1, len(toks))) AS u(i)), "
        "bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c "
        f"FROM big GROUP BY w1, w2 HAVING count(*) >= {_PMI_MIN_PAIR}), "
        "uni AS (SELECT t2.tok AS w, CAST(count(*) AS BIGINT) AS c "
        "FROM (SELECT unnest(toks) AS tok FROM t) t2 GROUP BY t2.tok), "
        "n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM big) "
        "SELECT w1, w2, c_pair, pmi FROM ("
        "SELECT bc.w1, bc.w2, bc.c AS c_pair, "
        "round(ln((CAST(bc.c AS DOUBLE) * CAST(n.total AS DOUBLE)) / "
        "(CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 4) AS pmi "
        "FROM bc CROSS JOIN n "
        "JOIN uni u1 ON u1.w = bc.w1 JOIN uni u2 ON u2.w = bc.w2) "
        f"ORDER BY pmi DESC, w1, w2 LIMIT {_PMI_TOP}"
    ),
    doc="PMI COLLOCATION MINING (r10) — pointwise mutual information "
    "over adjacent-token bigrams, the corpus-analysis op behind "
    "multi-word-expression extraction and boilerplate/template "
    "detection in curation pipelines: pmi = ln(c(w1,w2)·N / "
    "(c(w1)·c(w2))), support floor of 5 pair occurrences, top-50 by "
    "(rounded pmi desc, w1, w2). The ln argument is assembled with "
    "IDENTICAL parenthesization in both engines and rounded to 4 "
    "decimals before ordering (the q_bm25 float-determinism recipe). "
    "Plan: bigrams come from ONE explode of an in-plan "
    "transform(sequence) — no self-join for adjacency; unigram and "
    "bigram counts are two partial+final aggs; N is a 1-row broadcast "
    "cross join; the unigram joins broadcast (a vocabulary is always "
    "broadcast-sized relative to its corpus). At 100 TB this is the "
    "canonical two-shuffle count pipeline — the PMI scoring itself "
    "never touches more than the distinct-bigram table.",
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    toks = d.select("doc_id", tokens_expr(F.col("text")).alias("toks"))
    # guard (bigram path only — unigrams still count every doc):
    # Spark's sequence(1, 0) DESCENDS ([1, 0] — element_at(0) then
    # throws), so a 1-token doc must never reach the transform;
    # DuckDB's range(1, 1) is already empty
    big = toks.filter(F.size("toks") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), i -> "
                "named_struct('w1', element_at(toks, i), "
                "'w2', element_at(toks, i + 1)))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bc = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_pair"))
        .filter(F.col("c_pair") >= _PMI_MIN_PAIR)
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = big.agg(F.count(F.lit(1)).cast("long").alias("total"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            (F.col("c_pair").cast("double") * F.col("total").cast("double"))
            / (F.col("c1").cast("double") * F.col("c2").cast("double"))
        ),
        4,
    )
    return (
        bc.crossJoin(F.broadcast(n))
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select("w1", "w2", "c_pair", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOP)
    )


# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING — the iterative merge-learning loop.

# q_tokenize_bpe applies a SINGLE-generation merge table (the top-8
# bigrams of the raw character corpus, no recount). Real BPE training
# (Sennrich et al. 2016, public) is iterative: learn ONE merge, apply
# it to the vocabulary, RECOUNT pairs over the merged symbols, repeat
# — later merges can pair previously-merged symbols ("th"+"e"), which
# a single-generation table can never learn. Self-pairs stay excluded
# (the q_tokenize_bpe convention) so one pass per rule is exact.
_BPE_TRAIN_GENS = 6


def _bpe_train_oracle() -> str:
    """Unrolled generation chain: for each generation k, count pairs
    over g{k-1}, pick the single top rule (count DESC, pair ASC),
    apply it; the result is one row per LEARNED rule — if the corpus
    runs out of pairs early, r{k} is empty and contributes no row,
    matching the Spark loop's early stop."""
    parts = [
        r"WITH tok AS (SELECT unnest(list_filter("
        r"string_split_regex(lower(text), '\s+'), t -> t <> '')) AS w "
        "FROM documents), "
        "wf AS (SELECT w, CAST(count(*) AS BIGINT) AS wtot FROM tok "
        "GROUP BY w), "
        "g0 AS (SELECT w, wtot, list_transform(range(1, len(w) + 1), "
        "i -> substr(w, i, 1)) AS cs FROM wf)"
    ]
    apply_tpl = (
        "flatten(list_transform(range(1, len(cs) + 1), i -> "
        "CASE WHEN i > 1 AND cs[i-1] = r.a AND cs[i] = r.b THEN [] "
        "WHEN i < len(cs) AND cs[i] = r.a AND cs[i+1] = r.b "
        "THEN [cs[i] || cs[i+1]] ELSE [cs[i]] END))"
    )
    for k in range(1, _BPE_TRAIN_GENS + 1):
        parts.append(
            f"p{k} AS (SELECT a, b, CAST(sum(wtot) AS BIGINT) AS c "
            f"FROM (SELECT cs[i] AS a, cs[i+1] AS b, wtot FROM "
            f"(SELECT cs, wtot, unnest(range(1, len(cs))) AS i "
            f"FROM g{k-1} WHERE len(cs) >= 2)) "
            f"WHERE a <> b GROUP BY a, b)"
        )
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT a, b, c FROM p{k} "
            f"ORDER BY c DESC, a, b LIMIT 1)"
        )
        parts.append(
            f"g{k} AS (SELECT w, wtot, " + apply_tpl + f" AS cs "
            f"FROM g{k-1} CROSS JOIN r{k} r)"
        )
    rows = [
        f"SELECT CAST({k} AS INT) AS gen, a, b, c AS pair_count, "
        f"(SELECT CAST(sum(wtot * len(cs)) AS BIGINT) FROM g{k}) "
        f"AS subwords_after FROM r{k}"
        for k in range(1, _BPE_TRAIN_GENS + 1)
    ]
    return ", ".join(parts) + " " + " UNION ALL ".join(rows)


@register(
    "q_bpe_train",
    oracle=_bpe_train_oracle(),
    doc="BPE TOKENIZER TRAINING (Sennrich et al. 2016) — the "
    "iterative merge-learning loop itself, not just merge "
    f"application: {_BPE_TRAIN_GENS} generations of count-pairs -> "
    "take the single most frequent pair (count DESC, pair ASC "
    "tiebreak) -> merge it across the vocabulary -> RECOUNT, so "
    "generation k can pair symbols generation k-1 created — the "
    "defining property single-generation tables (q_tokenize_bpe) "
    "lack. Output: the learned merge table, one row per generation "
    "with its winning pair, that pair's corpus-weighted count, and "
    "the corpus subword total after applying it (the compression "
    "trajectory a tokenizer-training run monitors). The 100 TB "
    "shape is what production trainers (HF tokenizers) do: ALL "
    "iteration runs over the DISTINCT-word vocabulary weighted by "
    "corpus frequency — one corpus-sized shuffle builds (word, "
    "count), then every generation is vocab-sized: a pair-count "
    "aggregate, a 1-ROW collect (the learned rule — the same "
    "bounded-scalar shape as the kmeans/PQ codebook trainers), and "
    "a pure-HOF merge projection; localCheckpoint truncates the "
    "growing lineage each generation exactly like pagerank's "
    "fixpoint loop.",
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    tok = d.select(F.explode(tokens_expr(F.col("text"))).alias("w"))
    wf = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("wtot"))
    vocab = wf.select(
        "w", "wtot", chars_expr(F.col("w")).alias("cs")
    ).localCheckpoint()
    learned, _ = bpe_train_generations(vocab)
    return spark.createDataFrame(
        learned,
        "gen int, a string, b string, pair_count long, "
        "subwords_after long",
    )


def bpe_train_generations(
    vocab: DataFrame, generations: int = _BPE_TRAIN_GENS
) -> tuple[list, DataFrame]:
    """THE Sennrich merge-learning loop over a (w, wtot, cs) vocabulary
    frame: per generation, count adjacent symbol pairs (corpus-
    frequency weighted, self-pairs excluded) -> collect the single top
    rule (count DESC, pair ASC) -> apply it with the pure-HOF merge
    projection -> localCheckpoint -> collect the corpus subword total.
    Returns ``(learned, vocab)``: ``learned`` is one
    (gen, a, b, pair_count, subwords_after) tuple per learned rule
    (the loop stops early if the corpus runs out of mergeable pairs)
    and ``vocab`` the final merged frame — callers that only need the
    trained segmentation (q_tokenizer_coverage) read ``size(cs)`` off
    it. Shared by q_bpe_train, q_tokenizer_coverage, and
    tools/scale_bpe.py, so the scale tool MEASURES the registered loop
    rather than a copy that could silently drift from it (r10
    advice)."""
    learned = []  # (gen, a, b, pair_count, subwords_after)
    for gen in range(1, generations + 1):
        bp = (
            vocab.filter(F.size("cs") >= 2)
            .select(
                "wtot",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("cs") - 2),
                        lambda i: F.struct(
                            F.get("cs", i).alias("a"),
                            F.get("cs", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .select("p.a", "p.b", "wtot")
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("wtot").alias("c"))
        )
        top = bp.orderBy(F.col("c").desc(), "a", "b").limit(1).collect()
        if not top:  # corpus ran out of mergeable pairs
            break
        rule = top[0]
        vocab = vocab.withColumn(
            "cs",
            _bpe_apply_expr(F.col("cs"), F.lit(rule["a"]), F.lit(rule["b"])),
        ).localCheckpoint()
        sub = vocab.agg(
            F.sum(F.col("wtot") * F.size("cs")).cast("long").alias("s")
        ).collect()[0]["s"]
        learned.append((gen, rule["a"], rule["b"], rule["c"], sub))
    return learned, vocab


# ---------------------------------------------------------------------------
# tokenizer-coverage audit — the go/no-go readout after BPE training.


def _tokenizer_coverage_oracle() -> str:
    """q_bpe_train's unrolled generation chain, then the per-(lang,
    source) coverage rollup over the trained segmentation. One
    robustness change vs _bpe_train_oracle: each generation applies
    its rule via LEFT JOIN ON TRUE instead of CROSS JOIN, so an
    early-exhausted corpus (r{k} empty) leaves g{k} = g{k-1} — the
    apply CASE's NULL rule comparisons all fail to the identity branch
    — matching the Spark loop's early stop instead of emptying the
    vocabulary."""
    parts = [
        r"WITH tok AS (SELECT doc_id, unnest(list_filter("
        r"string_split_regex(lower(text), '\s+'), t -> t <> '')) AS w "
        "FROM documents), "
        "occ AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS occ "
        "FROM tok GROUP BY doc_id, w), "
        "wf AS (SELECT w, CAST(sum(occ) AS BIGINT) AS wtot FROM occ "
        "GROUP BY w), "
        "g0 AS (SELECT w, wtot, list_transform(range(1, len(w) + 1), "
        "i -> substr(w, i, 1)) AS cs FROM wf)"
    ]
    apply_tpl = (
        "flatten(list_transform(range(1, len(cs) + 1), i -> "
        "CASE WHEN i > 1 AND cs[i-1] = r.a AND cs[i] = r.b THEN [] "
        "WHEN i < len(cs) AND cs[i] = r.a AND cs[i+1] = r.b "
        "THEN [cs[i] || cs[i+1]] ELSE [cs[i]] END))"
    )
    for k in range(1, _BPE_TRAIN_GENS + 1):
        parts.append(
            f"p{k} AS (SELECT a, b, CAST(sum(wtot) AS BIGINT) AS c "
            f"FROM (SELECT cs[i] AS a, cs[i+1] AS b, wtot FROM "
            f"(SELECT cs, wtot, unnest(range(1, len(cs))) AS i "
            f"FROM g{k-1} WHERE len(cs) >= 2)) "
            f"WHERE a <> b GROUP BY a, b)"
        )
        parts.append(
            f"r{k} AS MATERIALIZED (SELECT a, b, c FROM p{k} "
            f"ORDER BY c DESC, a, b LIMIT 1)"
        )
        parts.append(
            f"g{k} AS (SELECT w, wtot, " + apply_tpl + f" AS cs "
            f"FROM g{k-1} LEFT JOIN r{k} r ON TRUE)"
        )
    return (
        ", ".join(parts)
        + f", sub AS (SELECT w, CAST(len(cs) AS BIGINT) AS n_sub "
        f"FROM g{_BPE_TRAIN_GENS}), "
        "j AS (SELECT d.lang, d.source, o.doc_id, o.occ, "
        "CAST(length(o.w) AS BIGINT) AS wlen, s.n_sub "
        "FROM occ o JOIN sub s ON o.w = s.w "
        "JOIN documents d ON d.doc_id = o.doc_id) "
        "SELECT lang, source, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(sum(occ) AS BIGINT) AS n_words, "
        "CAST(sum(occ * wlen) AS BIGINT) AS n_chars, "
        "CAST(sum(occ * n_sub) AS BIGINT) AS n_subwords, "
        "CAST(sum(occ * wlen) * 10000 // sum(occ * n_sub) AS BIGINT) "
        "AS chars_per_subword_bp, "
        "CAST(sum(CASE WHEN n_sub = wlen AND wlen > 1 THEN occ "
        "ELSE 0 END) * 10000 // sum(occ) AS BIGINT) AS fallback_bp "
        "FROM j GROUP BY lang, source"
    )


@register(
    "q_tokenizer_coverage",
    oracle=_tokenizer_coverage_oracle(),
    doc="TOKENIZER-COVERAGE AUDIT (r11) — the missing last step of the "
    "BPE family (train -> apply -> AUDIT): per (lang, source), the "
    "go/no-go metrics a tokenizer-training run reads before shipping "
    "a vocabulary — corpus volume (docs with >= 1 token, word / char "
    "/ subword totals), compression (chars per subword in basis "
    "points — the bytes-per-token proxy on this all-ASCII fixture), "
    "and the FALLBACK rate: the share of word occurrences the learned "
    "merges never touched (still fully character-split despite length "
    ">= 2 — the OOV analogue of a char-level BPE, where true OOV is "
    "impossible by construction). A language whose fallback_bp is "
    "high is under-served by the vocabulary — exactly what this "
    "audit exists to surface. The trainer is the SHARED "
    "bpe_train_generations loop (the q_bpe_train rules, not the "
    "single-generation q_tokenize_bpe table); application is the "
    "vocab-amortized pure-HOF path (merges run once per DISTINCT "
    "word), then ONE (lang, source) rollup. At 100 TB: one corpus "
    "shuffle builds (doc, word, occ), training stays vocab-sized per "
    "generation (tools/scale_bpe.py), the audit joins occ to the "
    "vocab-sized segmentation and to the doc-metadata projection, "
    "and the final rollup shuffles a low-cardinality key.",
)
def q_tokenizer_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    tok = d.select(
        "doc_id", F.explode(tokens_expr(F.col("text"))).alias("w")
    )
    occ = tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("occ")
    )
    # the trainer materializes occ several times (one pair-count per
    # generation); cache for the bounded training phase only — the
    # returned audit plan recomputes the cheap token groupBy, the same
    # trade bpe_doc_counts documents
    occ.persist()
    try:
        wf = occ.groupBy("w").agg(F.sum("occ").cast("long").alias("wtot"))
        vocab = wf.select(
            "w", "wtot", chars_expr(F.col("w")).alias("cs")
        ).localCheckpoint()
        _, trained = bpe_train_generations(vocab)
    finally:
        occ.unpersist()
    sub = trained.select(
        "w",
        F.length("w").cast("long").alias("wlen"),
        F.size("cs").cast("long").alias("n_sub"),
    )
    j = occ.join(sub, "w").join(
        d.select("doc_id", "lang", "source"), "doc_id"
    )
    return j.groupBy("lang", "source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.sum("occ").cast("long").alias("n_words"),
        F.sum(F.col("occ") * F.col("wlen")).cast("long").alias("n_chars"),
        F.sum(F.col("occ") * F.col("n_sub"))
        .cast("long")
        .alias("n_subwords"),
        F.expr(
            "sum(occ * wlen) * 10000L DIV sum(occ * n_sub)"
        ).alias("chars_per_subword_bp"),
        F.expr(
            "sum(CASE WHEN n_sub = wlen AND wlen > 1 THEN occ "
            "ELSE 0L END) * 10000L DIV sum(occ)"
        ).alias("fallback_bp"),
    )
