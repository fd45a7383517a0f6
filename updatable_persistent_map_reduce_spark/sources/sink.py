"""Write-side surface: partitioned, bucketed, and shard-packed sinks.

The reference's only sink is its own persisted result trees (one JSON
file per result, MapReduce/Executer.cs:165-203), which the engine's
MapReduceView state tables re-express. This module is the general
outbound surface a corpus pipeline needs on top of that:

- :func:`write_partitioned` — hive-style partitioned parquet, the
  layout every downstream partition-pruned scan depends on;
- :func:`write_bucketed` — pre-shuffled bucketed+sorted table so
  co-located fact-fact joins pay their shuffle once at write time
  (the read side is audited exchange-free in q_join_bucketed);
- :func:`write_packed_shards` — fixed-budget shard files in stable
  key order (the q_shard_pack assignment applied as a physical
  layout), the standard "uniform training files" output step.

Scale notes: all three produce one file per (partition|bucket|shard)
task via a pre-write repartition on the layout key — never
task_count x dir_count sliver files; pair with
``spark.sql.files.maxRecordsPerFile`` to bound file sizes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-partitioned parquet: one directory per partition value,
    one file per partition task (repartition by the partition key so
    each directory is written by a single task)."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Bucketed + sorted managed table (``bucketBy`` requires
    ``saveAsTable``): both sides of a later equi-join on
    ``bucket_col`` scan pre-shuffled, pre-sorted buckets — zero
    hash-partitioning exchange at read time."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def write_packed_shards(
    df: DataFrame,
    path: str,
    size_col: str,
    order_col: str,
    shard_budget: int,
    mode: str = "overwrite",
) -> None:
    """Pack rows (in stable ``order_col`` order) into fixed-budget
    shards by running ``size_col`` prefix sum, then write one file per
    shard (``shard=N`` hive dirs). The prefix sum is the two-pass
    distributed plan (functions/prefix.py: range buckets, parallel
    local windows, broadcast bucket offsets) — no single-partition
    stage; the shard id is a deterministic function of the sort key,
    so re-runs are stable."""
    from ..functions.prefix import distributed_prefix_sum

    sharded = distributed_prefix_sum(
        df, order_col, F.col(size_col), out_col="_cum_before"
    ).withColumn(
        "shard",
        F.floor(F.col("_cum_before") / F.lit(shard_budget)).cast("long"),
    ).drop("_cum_before")
    (
        sharded.repartition(F.col("shard"))
        .sortWithinPartitions(order_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
