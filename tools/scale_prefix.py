"""Scale experiment: distributed prefix sum vs the single-partition
window it replaced.

``functions/prefix.py`` computes exact exclusive prefix sums with the
two-pass parallel-scan plan (range buckets -> per-bucket windows +
literal bucket offsets) specifically so no stage ever moves all rows
to one task. This script measures both plans on synthetic rows and
verifies they are BIT-IDENTICAL, so the speedup is free:

for each N:
    naive  = Window.orderBy(key) with no partitionBy  (1-task stage)
    dist   = distributed_prefix_sum(...)              (32-way stage)
    assert results equal; report wall times.

The naive plan's cost is serial in N (one task scans everything); the
distributed plan's critical path is N/buckets plus two tiny prep jobs
— at 100 TB the naive plan simply does not finish, which is why
"Exchange SinglePartition" is a forbidden plan marker in
tools/explain_audit.py.

Usage: python tools/scale_prefix.py [N ...]   (default 1M 4M 16M)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.functions.prefix import (  # noqa: E402
    distributed_prefix_sum,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402


def rows(spark, n: int):
    # Unique numeric order key with a non-trivial weight; shuffled
    # key order so range bucketing actually redistributes.
    return spark.range(n).select(
        F.xxhash64("id").alias("shuffle_key"),
        F.col("id").alias("k"),
        (F.col("id") % 997 + 1).alias("w"),
    ).repartition(32, "shuffle_key").drop("shuffle_key")


def run(spark, n: int) -> dict:
    df = rows(spark, n).persist()
    df.count()

    t0 = time.perf_counter()
    naive = df.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("w").over(
                W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    naive_chk = naive.selectExpr(
        "count(*) AS c", "sum(cum_before) AS s", "max(cum_before) AS m"
    ).collect()[0]
    t_naive = time.perf_counter() - t0

    t0 = time.perf_counter()
    dist = distributed_prefix_sum(df, "k", F.col("w"))
    dist_chk = dist.selectExpr(
        "count(*) AS c", "sum(cum_before) AS s", "max(cum_before) AS m"
    ).collect()[0]
    t_dist = time.perf_counter() - t0

    assert tuple(naive_chk) == tuple(dist_chk), (naive_chk, dist_chk)
    # Spot-check bit-identity row-by-row on a deterministic slice.
    sample_pred = F.col("k") % 65537 == 0
    a = {r.k: r.cum_before for r in naive.filter(sample_pred).collect()}
    b = {r.k: r.cum_before for r in dist.filter(sample_pred).collect()}
    assert a == b, "row-level mismatch"
    df.unpersist()
    return {
        "n": n,
        "naive_s": round(t_naive, 2),
        "distributed_s": round(t_dist, 2),
        "speedup": round(t_naive / t_dist, 2),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]
    spark = get_spark("scale-prefix")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = [run(spark, n) for n in sizes]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
