"""Measure banded interval join vs nested-loop as interval count grows.

q_join_range_banded's claim (operators/relational.py): banding a
point-in-interval join onto floor(value/W) keys turns |points| x
|intervals| nested-loop work into a hash join whose probe volume is
true matches + band-boundary near-misses — so cost should stay ~flat
in interval count while the NLJ baseline grows linearly with it
(every point tests every interval). This tool measures both plans on
the same synthetic workload at increasing interval counts.

Workload: points = spark.range(N_POINTS) with value = (id * 9973) %
DOMAIN (uniform, codegen); intervals = range(n_iv) with lo = (i *
7919) % (DOMAIN - W), hi = lo + W. Expected matches per interval ~
N_POINTS * W / DOMAIN regardless of n_iv, so output size grows
linearly in n_iv for BOTH plans — the separation is probe cost.

Usage: python tools/scale_range_join.py [n_iv1 n_iv2 ...]
       (default 2000 16000 — an 8x interval growth)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

N_POINTS = 2_000_000
DOMAIN = 10_000_000
W = 1000


def points(spark: SparkSession) -> DataFrame:
    return spark.range(N_POINTS).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 9973) % DOMAIN).alias("v"),
    )


def intervals(spark: SparkSession, n_iv: int) -> DataFrame:
    return spark.range(n_iv).select(
        F.col("id").alias("interval_id"),
        ((F.col("id") * 7919) % (DOMAIN - W)).alias("lo"),
    ).withColumn("hi", F.col("lo") + W)


def banded(p: DataFrame, iv: DataFrame) -> DataFrame:
    iv_b = iv.withColumn(
        "band",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / W), F.floor((F.col("hi") - 1) / W)
            )
        ),
    )
    j = p.withColumn("band", F.floor(F.col("v") / W)).join(
        iv_b, "band"
    ).filter((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
    return j.groupBy("interval_id").agg(F.count(F.lit(1)).alias("n"))


def nlj(p: DataFrame, iv: DataFrame) -> DataFrame:
    j = p.join(
        F.broadcast(iv),
        (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")),
    )
    return j.groupBy("interval_id").agg(F.count(F.lit(1)).alias("n"))


def run(spark: SparkSession, n_iv: int) -> dict:
    p, iv = points(spark), intervals(spark, n_iv)
    out = {"n_iv": n_iv}
    for tag, fn in (("banded", banded), ("nlj", nlj)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rows = fn(p, iv).collect()
        out[f"{tag}_sec"] = round(time.perf_counter() - t0, 2)
        out[f"{tag}_rows"] = len(rows)
        out[f"{tag}_pairs"] = sum(r["n"] for r in rows)
    assert out["banded_pairs"] == out["nlj_pairs"], out  # same answer
    return out


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 16000]
    spark = get_spark("upmr-scale-rangejoin")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    results = [run(spark, n) for n in sizes]
    for r in results:
        print(f"# {r}", file=sys.stderr)
    if len(results) >= 2:
        a, b = results[0], results[-1]
        growth = b["n_iv"] / a["n_iv"]
        print(
            json.dumps(
                {
                    "interval_growth": growth,
                    "banded_time_ratio": round(
                        b["banded_sec"] / a["banded_sec"], 2
                    ),
                    "nlj_time_ratio": round(b["nlj_sec"] / a["nlj_sec"], 2),
                    "results": results,
                }
            )
        )


if __name__ == "__main__":
    main()
