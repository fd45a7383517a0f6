"""Measure the PPJoin prefix-filter claim of q_graph_jaccard.

operators/graph.py:_jaccard_prefix_filtered generates candidate pairs
only from each node's rare-first neighbor PREFIX (length
deg - ceil(t*deg) + 1 under the ascending-neighbor-degree token
order, t = _JACC_NUM/_JACC_DEN), which is provably lossless for
J >= t while keeping hubs —
the highest-frequency tokens — out of every prefix. The naive
wedge-on-shared-neighbor join enumerates a hub's full C(deg, 2)
neighbor pairs.

Both candidate volumes are exact integers from aggregates:

  naive  = sum_s C(deg(s), 2)                 (wedges at each shared
           neighbor — the join's row count before the threshold)
  prefix = |distinct (u,v) sharing a prefix token| plus, for cost
           honesty, the raw prefix-token join volume before dedup

Asserted, not just printed:
1. prefix-filtered output == naive output at the smallest octave
   (the filter is an execution strategy, not a semantics change);
2. at the largest octave the prefix candidate volume is at most a
   third of the naive wedge volume, and its max single-token fan-out
   at least 10x smaller than the naive max-key fan-out;
3. candidates-per-edge growth across octaves is no worse for the
   prefix form than the naive form.

Usage: python tools/scale_jaccard.py [E1 E2 ...] (default 20k..160k)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.operators.graph import (  # noqa: E402
    _JACC_DEN,
    _JACC_NUM,
    _jaccard_adj,
    _jaccard_naive,
    _jaccard_prefix_filtered,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402
from tools.scale_triangles import synth_powerlaw_edges  # noqa: E402


def volumes(e: DataFrame) -> dict[str, int]:
    sym = e.select(F.col("u").alias("s"), F.col("v").alias("d")).unionByName(
        e.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
    nv = (
        sym.groupBy("s")
        .agg(F.count(F.lit(1)).alias("dg"))
        .select((F.col("dg") * (F.col("dg") - 1) / 2).cast("long").alias("w"))
        .agg(
            F.coalesce(F.sum("w"), F.lit(0)).alias("total"),
            F.coalesce(F.max("w"), F.lit(0)).alias("mx"),
        )
        .collect()[0]
    )
    adj = _jaccard_adj(e)
    pre = adj.select(
        "node",
        F.explode(F.slice("ids", 1, F.col("plen").cast("int"))).alias("t"),
    )
    pv = (
        pre.groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
        .select((F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("w"))
        .agg(
            F.coalesce(F.sum("w"), F.lit(0)).alias("total"),
            F.coalesce(F.max("w"), F.lit(0)).alias("mx"),
        )
        .collect()[0]
    )
    return {
        "naive_wedges": nv["total"],
        "naive_max_key": nv["mx"],
        "prefix_cands": pv["total"],
        "prefix_max_key": pv["mx"],
    }


def rows(df: DataFrame) -> set[tuple]:
    return {tuple(r) for r in df.collect()}


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [
        20_000, 40_000, 80_000, 160_000,
    ]
    spark = get_spark("upmr-scale-jaccard")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    e0 = synth_powerlaw_edges(spark, sizes[0]).cache()
    a = rows(_jaccard_prefix_filtered(e0))
    b = rows(_jaccard_naive(e0))
    assert a == b, (
        f"prefix-filtered != naive: {len(a)} vs {len(b)} pairs"
    )
    print(f"E~{sizes[0]:>8,}  prefix == naive output "
          f"({len(a)} J>={_JACC_NUM}/{_JACC_DEN} pairs) — losslessness executed OK")
    e0.unpersist()

    stats: dict[int, dict[str, int]] = {}
    m: dict[int, int] = {}
    for n in sizes:
        e = synth_powerlaw_edges(spark, n).cache()
        m[n] = e.count()
        stats[n] = volumes(e)
        t0 = time.perf_counter()
        _jaccard_prefix_filtered(e).count()
        t_p = time.perf_counter() - t0
        t0 = time.perf_counter()
        _jaccard_naive(e).count()
        t_n = time.perf_counter() - t0
        e.unpersist()
        s = stats[n]
        print(
            f"E~{n:>8,} (m={m[n]:,})  "
            f"cands prefix={s['prefix_cands']:>12,} "
            f"naive={s['naive_wedges']:>12,}  "
            f"max-key prefix={s['prefix_max_key']:>10,} "
            f"naive={s['naive_max_key']:>10,}  "
            f"wall {t_p:5.1f}s vs {t_n:5.1f}s"
        )

    big, small = sizes[-1], sizes[0]
    sb, ss = stats[big], stats[small]
    assert sb["prefix_cands"] * 3 <= sb["naive_wedges"], (
        "prefix candidates not under a third of naive wedges at top octave"
    )
    assert sb["prefix_max_key"] * 10 <= sb["naive_max_key"], (
        "prefix max token fan-out not 10x under the naive whale"
    )
    grow_p = (sb["prefix_cands"] / m[big]) / (ss["prefix_cands"] / m[small])
    grow_n = (sb["naive_wedges"] / m[big]) / (ss["naive_wedges"] / m[small])
    assert grow_p <= grow_n * 1.05, (
        f"candidates-per-edge growth: prefix {grow_p:.2f}x vs "
        f"naive {grow_n:.2f}x"
    )
    print(
        f"cands-per-edge growth {small:,} -> {big:,}: "
        f"prefix {grow_p:.2f}x vs naive {grow_n:.2f}x"
    )


if __name__ == "__main__":
    main()
