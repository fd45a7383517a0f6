"""Distributed exact prefix sums — the scale-safe replacement for
``Window.orderBy(...)`` with no ``partitionBy`` (which Spark executes
by moving ALL rows to a single task; fine at sf0.1, dead at 100 TB).

Two-pass plan (the classic parallel scan, cf. Blelloch 1990):

1. bucket rows by deterministic range boundaries on the (unique,
   numeric) order key — boundaries come from ``approxQuantile`` so
   buckets are balanced even under key skew, then are frozen as
   literals so every recomputation sees identical bucketing;
2. per-bucket totals are aggregated (tiny: one row per bucket),
   cumulated on the driver (O(buckets) work), and embedded back as a
   literal bucket->offset map;
3. the exclusive prefix sum is then ``bucket_offset + local prefix``
   where the local prefix is a window PARTITIONED by bucket — every
   bucket scans in parallel, no single-task stage anywhere.

The result is bit-identical to the single-partition window (the
assignment is a pure function of the order key), so SQL oracles are
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_BKT = "_psum_bkt"


def range_bucket_expr(order_col: str, bounds: list) -> Column:
    """Deterministic range-bucket id: count of frozen boundary
    literals strictly below the key. Monotone in the key, so bucket
    order == key order."""
    bkt = F.lit(0)
    for b in bounds:
        bkt = bkt + F.when(F.col(order_col) > F.lit(b), F.lit(1)).otherwise(
            F.lit(0)
        )
    return bkt.cast("int")


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    weight: Column,
    out_col: str = "cum_before",
    num_buckets: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = exact EXCLUSIVE prefix sum of ``weight`` in
    ``order_col`` order (sum over all rows with a strictly smaller
    key). Requires ``order_col`` unique and numeric.

    Runs two lightweight preparatory jobs (quantile sample + bucket
    totals, both column-pruned scans) before the main plan; the main
    plan has no partition-less window — each range bucket computes its
    local prefix in parallel and adds its literal bucket offset.
    """
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(df.stat.approxQuantile(order_col, probs, 0.01)))

    bucketed = df.withColumn(_BKT, range_bucket_expr(order_col, bounds))

    # Pass 1: per-bucket totals -> driver (O(buckets) rows) -> running
    # offsets, embedded as a LITERAL map (cheaper than a broadcast
    # join: no extra plan node, shipped with the task closure).
    # Buckets are frozen literals, so this collect is stable across
    # recomputations of the main plan.
    totals = bucketed.groupBy(_BKT).agg(
        F.sum(weight).cast("long").alias("_t")
    ).collect()
    offsets, acc = {}, 0
    for r in sorted(totals, key=lambda r: r[_BKT]):
        offsets[r[_BKT]] = acc
        acc += r["_t"] or 0
    map_args = []
    for k, v in offsets.items():
        map_args += [F.lit(k), F.lit(v)]
    off = (
        F.element_at(F.create_map(*map_args), F.col(_BKT))
        if offsets
        else F.lit(0)
    )

    # Pass 2: bucket-partitioned local prefix + literal bucket offset.
    w_local = (
        W.partitionBy(_BKT)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(weight).over(w_local), F.lit(0))
    return (
        bucketed.withColumn(out_col, (off + local).cast("long"))
        .drop(_BKT)
    )
