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
from ..functions.text import shingles_expr, tokens_expr
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
    "shuffle is the per-doc count aggregation.",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_expr(tokens_expr(F.col("text")), 3))
        ).alias("s"),
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
        F.size(tokens_expr(F.col("text"))).alias("n_tokens"),
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
