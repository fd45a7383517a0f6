"""Tier A — the reference's own operator surface, Spark-first.

The reference's public API is 5 methods (MapReduce/MapReduceTask.cs:8-14,
MapReduce/Executer.cs:31,370): user Map (a projection/flat-map), user
re-reducible Reduce, id/key extraction, batch Execute and point Query.
Each row here re-expresses one of those behaviors as a declarative
DataFrame plan over the driver's star schema; the *stateful* behaviors
(incremental upsert, key migration, persisted point lookup) live in
``operators.incremental`` on top of ``plans.view.MapReduceView``.

The `customer` table plays the reference demo's `Person` role
(doc id = c_custkey ≈ Person.Id, group key = c_nationkey ≈ Person.State
— MapReduce/Person.cs:7-9, MapReduce/PeopleCountByState.cs:33-36).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bucket import bucket_expr, bucket_sql
from ..functions.text import tokens_expr
from ..sources import Catalog
from . import register


@register(
    "q_source_batch",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders",
    doc="Batch ingest of a document collection (Executer.cs:31) — a pruned parquet scan.",
)
def q_source_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Catalog(spark, sf_dir).orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@register(
    "q_map_project",
    oracle=(
        "SELECT CAST(c_custkey AS VARCHAR) AS doc_id, "
        "c_nationkey AS group_key, 1 AS cnt FROM customer"
    ),
    doc="User Map as pure projection: Person -> {State, Count:1} "
    "(PeopleCountByState.cs:9-18) over customer.",
)
def q_map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return c.select(
        F.col("c_custkey").cast("string").alias("doc_id"),
        F.col("c_nationkey").alias("group_key"),
        F.lit(1).alias("cnt"),
    )


@register(
    "q_map_flat",
    oracle=(
        "SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'), "
        "t -> t <> '')) AS token FROM documents WHERE doc_id < 20"
    ),
    doc="Map emitting 0..N tuples per document (MapReduceTask.cs:8 returns "
    "IEnumerable) — explode() of a tokenized text column.",
)
def q_map_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).documents.filter(F.col("doc_id") < 20)
    return d.select("doc_id", F.explode(tokens_expr(F.col("text"))).alias("token"))


@register(
    "q_group_count",
    oracle=(
        "SELECT c_nationkey AS group_key, CAST(count(*) AS BIGINT) AS cnt "
        "FROM customer GROUP BY c_nationkey"
    ),
    doc="Flagship: count docs per group key — the reference demo's people-per-state "
    "(PeopleCountByState.cs:20-31) as customers-per-nation.",
)
def q_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return c.groupBy(F.col("c_nationkey").alias("group_key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "q_rereduce",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty, "
        "CAST(count(*) AS BIGINT) AS cnt "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    doc="Re-reducible aggregation: reduce applied to its own output "
    "(Executer.cs:47-85 two-level tree) == Spark partial+final HashAggregate.",
)
def q_rereduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "q_bucket_hash",
    oracle=(
        "SELECT c_custkey, "
        + bucket_sql("'customer-' || CAST(c_custkey AS VARCHAR)")
        + " AS bucket FROM customer"
    ),
    doc="Stable case-insensitive doc-id bucket (Executer.cs:295-303) as a "
    "Catalyst expression; deterministic across engines.",
)
def q_bucket_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    doc_id = F.concat(F.lit("customer-"), F.col("c_custkey").cast("string"))
    return c.select("c_custkey", bucket_expr(doc_id).alias("bucket"))


@register(
    "q_batch_256",
    oracle=(
        "SELECT batch_id, CAST(count(*) AS BIGINT) AS batch_rows FROM ("
        "SELECT CAST((row_number() OVER (ORDER BY event_id) - 1) // 256 AS BIGINT) "
        "AS batch_id FROM events) GROUP BY batch_id"
    ),
    doc="256-doc batch partitioning (Extensions.cs:8-15, Executer.cs:94) — "
    "physical chunking surfaced as a deterministic batch id. "
    "row_number()-1 over unique event_id == the exclusive prefix COUNT, "
    "computed with the two-pass distributed prefix sum "
    "(functions/prefix.py) so no single-partition window appears.",
)
def q_batch_256(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.prefix import distributed_prefix_sum

    ev = Catalog(spark, sf_dir).events.select("event_id")
    counted = distributed_prefix_sum(ev, "event_id", F.lit(1))
    return (
        counted.select(
            (F.col("cum_before") / F.lit(256)).cast("bigint").alias("batch_id")
        )
        .groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("batch_rows"))
    )


@register(
    "q_distinct_ids",
    oracle="SELECT DISTINCT user_id FROM events",
    doc="Distinct incoming doc ids (HashSet at Executer.cs:89) — dropDuplicates.",
)
def q_distinct_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return Catalog(spark, sf_dir).events.select("user_id").distinct()


@register(
    "q_point_lookup",
    oracle=(
        "SELECT c_nationkey AS group_key, CAST(count(*) AS BIGINT) AS cnt "
        "FROM customer WHERE c_nationkey = 7 GROUP BY c_nationkey"
    ),
    doc="Point query of a materialized aggregate (Executer.cs:370-376): "
    "partition-pruned filter on the group key; the persisted-store variant "
    "is exercised by operators.incremental / plans.view.",
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).customer
    return (
        c.filter(F.col("c_nationkey") == 7)
        .groupBy(F.col("c_nationkey").alias("group_key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
