"""Scale experiment: grid-cell spatial join vs the brute-force
distance product.

``q_join_spatial_grid`` (operators/relational.py) reduces ST_DWithin
to a (cell_x, cell_y) equi-join: cell edge == radius makes the probe
side's 3x3 neighborhood explode LOSSLESS, and the exact squared
distance is a residual filter after the hash join. This script is the
100-TB argument measured: at CONSTANT density (the plane grows with
sqrt(N), so per-point neighbor count stays flat — the realistic model
for geo data, where more rows mean more territory, not denser cities)
the grid join's candidate count is O(N) while the brute-force product
is O(N*M).

for each N:
    points   = N "customer" points, N/10 "supplier" probes, LCG
               integer coordinates on a sqrt(N)-scaled plane
    grid     = 9-cell explode on the probe side -> cell equi-join ->
               residual distance filter -> per-probe agg
    brute    = crossJoin + distance filter (smallest N only; asserted
               row-identical to the grid result there)
    report wall seconds + matched-pair count per octave.

Expected shape: grid wall grows ~linearly per octave (flat matched
pairs per probe), brute-force grows ~4x per octave — which is why the
operator never builds the product and the plan audit forbids
CartesianProduct / BroadcastNestedLoop on it.

Usage: python tools/scale_spatial.py [N ...]   (default 250k 1M 4M)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.operators.relational import (  # noqa: E402
    _SPG_AX,
    _SPG_AY,
    _SPG_BX,
    _SPG_BY,
    _SPG_R,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402


def point_sets(spark, n: int, mod: int):
    """N big-side points and N/10 probe points, LCG coordinates —
    the operator's derivation, plane width ``mod``."""
    big = spark.range(1, n + 1).select(
        F.col("id").alias("pid"),
        ((F.col("id") * _SPG_AX) % mod).cast("bigint").alias("x"),
        ((F.col("id") * _SPG_AY) % mod).cast("bigint").alias("y"),
    )
    probes = spark.range(1, n // 10 + 1).select(
        F.col("id").alias("qid"),
        ((F.col("id") * _SPG_AX + _SPG_BX) % mod).cast("bigint").alias("sx"),
        ((F.col("id") * _SPG_AY + _SPG_BY) % mod).cast("bigint").alias("sy"),
    )
    return big, probes


def grid_join(big, probes):
    r = F.lit(_SPG_R).cast("bigint")
    b = big.withColumns(
        {
            "cell_x": F.floor(F.col("x") / _SPG_R),
            "cell_y": F.floor(F.col("y") / _SPG_R),
        }
    )
    p = (
        probes.withColumn("ddx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("ddy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumns(
            {
                "cell_x": F.floor(F.col("sx") / _SPG_R) + F.col("ddx"),
                "cell_y": F.floor(F.col("sy") / _SPG_R) + F.col("ddy"),
            }
        )
    )
    dx, dy = F.col("x") - F.col("sx"), F.col("y") - F.col("sy")
    return (
        b.join(p, ["cell_x", "cell_y"])
        .filter(dx * dx + dy * dy <= r * r)
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pid").alias("pid_sum"))
    )


def brute_join(big, probes):
    r = F.lit(_SPG_R).cast("bigint")
    dx, dy = F.col("x") - F.col("sx"), F.col("y") - F.col("sy")
    return (
        big.crossJoin(probes)
        .filter(dx * dx + dy * dy <= r * r)
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pid").alias("pid_sum"))
    )


def run(spark, n: int, base_n: int, verify: bool) -> dict:
    # constant density: plane area scales with N, so edge ~ sqrt(N).
    # The base edge gives ~12 expected neighbors per probe (N=250k on
    # a 1M^2 plane, r=4000) — a realistic geo density; the operator's
    # own 100k plane at TPC-H row counts is far sparser still.
    mod = int(1_000_000 * math.sqrt(n / base_n))
    big, probes = point_sets(spark, n, mod)
    big = big.persist()
    probes = probes.persist()
    big.count(), probes.count()

    t0 = time.perf_counter()
    g = grid_join(big, probes)
    pairs, probe_hits = (
        g.agg(F.sum("n"), F.count(F.lit(1))).collect()[0][0:2]
    )
    t_grid = time.perf_counter() - t0

    out = {
        "n": n,
        "mod": mod,
        "grid_sec": round(t_grid, 3),
        "matched_pairs": int(pairs or 0),
        "probes_with_hits": int(probe_hits or 0),
    }
    if verify:
        t0 = time.perf_counter()
        bset = {tuple(r) for r in brute_join(big, probes).collect()}
        out["brute_sec"] = round(time.perf_counter() - t0, 3)
        gset = {tuple(r) for r in g.collect()}
        assert gset == bset, (
            f"grid != brute at n={n}: {len(gset)} vs {len(bset)} rows"
        )
        out["grid_equals_brute"] = True
    big.unpersist(), probes.unpersist()
    return out


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [250_000, 1_000_000, 4_000_000]
    spark = get_spark("upmr-scale-spatial")
    prev = None
    for i, n in enumerate(sizes):
        res = run(spark, n, sizes[0], verify=(i == 0))
        if prev:
            res["wall_ratio_vs_prev"] = round(
                res["grid_sec"] / max(prev["grid_sec"], 1e-9), 2
            )
            res["pairs_ratio_vs_prev"] = round(
                res["matched_pairs"] / max(prev["matched_pairs"], 1), 2
            )
        print(json.dumps(res))
        prev = res
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
