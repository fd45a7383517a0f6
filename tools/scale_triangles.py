"""Measure the degree-ordered triangle claim (q_graph_triangles).

operators/graph.py:_triangles_degree_ordered directs every edge toward
its higher-(degree, id) endpoint so wedges are enumerated from each
triangle's LOWEST-rank corner. The claim: on a power-law graph the
per-join-key wedge fan-out stays bounded (outdeg under the orientation
is O(sqrt(m)) for any degree distribution) while the plain
ordered-by-value form concentrates wedge volume on the hubs — the
shuffle whale a 100x scale-up would hit.

Both wedge volumes are exact integers computed from degree aggregates
(no join execution needed), so the assertions are deterministic and
noise-free:

  ordered   = sum_src C(outdeg_src, 2)        under degree orientation
  by-value  = sum_b  lo(b) * hi(b)            (lo = edges arriving at b
              as the larger endpoint, hi = leaving as the smaller) —
              the wedge count of the pre-r9 join keyed on the middle

Asserted, not just printed:
1. both enumerations yield IDENTICAL per-node triangle counts at the
   smallest octave (orientation is result-invariant);
2. at the largest octave the ordered wedge volume is at most half the
   by-value volume, and the MAX single-key fan-out (the whale) is at
   least 10x smaller;
3. across octaves the ordered form's wedges-per-edge grows by a
   smaller factor than the by-value form's (the skew gap widens with
   scale, it doesn't close).

Usage: python tools/scale_triangles.py [E1 E2 ...] (default 20k..160k)
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
    _triangles_degree_ordered,
    kcore_peel_trace,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402


def synth_powerlaw_edges(spark: SparkSession, n_edges: int) -> DataFrame:
    """Deterministic power-law-ish multigraph -> simple graph: each
    endpoint is floor(N * u^3) for a hash-uniform u, so low ids are
    hubs (node 0 draws ~(1/N)^(1/3) of all endpoints — ~8% at
    N = n_edges/10). Canonicalized (u < v), distinct."""
    n_nodes = max(n_edges // 10, 100)

    def endpoint(salt: int):
        h = F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(1_000_000))
        u = h / F.lit(1_000_000.0)
        return F.floor(F.lit(float(n_nodes)) * u * u * u).cast("long")

    raw = spark.range(n_edges).select(
        endpoint(1).alias("x"), endpoint(2).alias("y")
    )
    return (
        raw.filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("u"), F.greatest("x", "y").alias("v")
        )
        .distinct()
    )


def triangles_by_value(e: DataFrame) -> DataFrame:
    """The pre-r9 enumeration: wedges keyed on the MIDDLE node of the
    value order (a < b < c) — correct, but hub-skewed."""
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def node_counts(tri: DataFrame) -> dict[int, int]:
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    rows = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n")).collect()
    return {r["node"]: r["n"] for r in rows}


def wedge_stats(e: DataFrame) -> dict[str, int]:
    """Exact wedge volume + max single-key fan-out for both forms,
    from degree aggregates alone."""
    # by-value: key = middle node b; lo(b) = #(? < b) edges, hi(b) = #(b < ?)
    lo = e.groupBy(F.col("v").alias("node")).agg(
        F.count(F.lit(1)).alias("lo")
    )
    hi = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("hi")
    )
    bv = (
        lo.join(hi, "node")
        .select((F.col("lo") * F.col("hi")).alias("w"))
        .agg(
            F.coalesce(F.sum("w"), F.lit(0)).alias("total"),
            F.coalesce(F.max("w"), F.lit(0)).alias("mx"),
        )
        .collect()[0]
    )
    # ordered: key = low-rank corner; fan-out = C(outdeg, 2)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    out = (
        e.join(du, "u")
        .join(dv, "v")
        .select(F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"))
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .select((F.col("od") * (F.col("od") - 1) / 2).cast("long").alias("w"))
        .agg(
            F.coalesce(F.sum("w"), F.lit(0)).alias("total"),
            F.coalesce(F.max("w"), F.lit(0)).alias("mx"),
        )
        .collect()[0]
    )
    return {
        "byvalue_wedges": bv["total"],
        "byvalue_max_key": bv["mx"],
        "ordered_wedges": out["total"],
        "ordered_max_key": out["mx"],
    }


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [
        20_000, 40_000, 80_000, 160_000,
    ]
    spark = get_spark("upmr-scale-triangles")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    # 1. result invariance at the smallest octave
    e0 = synth_powerlaw_edges(spark, sizes[0]).cache()
    a = node_counts(_triangles_degree_ordered(e0))
    b = node_counts(triangles_by_value(e0))
    assert a == b, "degree-ordered != by-value per-node triangle counts"
    print(f"E~{sizes[0]:>8,}  ordered == by-value per-node counts "
          f"({len(a)} nodes, {sum(a.values()) // 3} triangles) — equality OK")
    e0.unpersist()

    stats: dict[int, dict[str, int]] = {}
    m: dict[int, int] = {}
    for n in sizes:
        e = synth_powerlaw_edges(spark, n).cache()
        m[n] = e.count()
        stats[n] = wedge_stats(e)
        t0 = time.perf_counter()
        _triangles_degree_ordered(e).count()
        t_ord = time.perf_counter() - t0
        t0 = time.perf_counter()
        triangles_by_value(e).count()
        t_bv = time.perf_counter() - t0
        e.unpersist()
        s = stats[n]
        print(
            f"E~{n:>8,} (m={m[n]:,})  "
            f"wedges ordered={s['ordered_wedges']:>12,} "
            f"byvalue={s['byvalue_wedges']:>12,}  "
            f"max-key ordered={s['ordered_max_key']:>10,} "
            f"byvalue={s['byvalue_max_key']:>10,}  "
            f"wall {t_ord:5.1f}s vs {t_bv:5.1f}s"
        )

    big, small = sizes[-1], sizes[0]
    sb, ss = stats[big], stats[small]
    assert sb["ordered_wedges"] * 2 <= sb["byvalue_wedges"], (
        "ordered wedge volume not under half of by-value at the top octave"
    )
    assert sb["ordered_max_key"] * 10 <= sb["byvalue_max_key"], (
        "ordered max key fan-out not 10x under the by-value whale"
    )
    grow_ord = (sb["ordered_wedges"] / m[big]) / (
        ss["ordered_wedges"] / m[small]
    )
    grow_bv = (sb["byvalue_wedges"] / m[big]) / (
        ss["byvalue_wedges"] / m[small]
    )
    assert grow_ord < grow_bv, (
        f"wedges-per-edge growth: ordered {grow_ord:.2f}x should be "
        f"below by-value {grow_bv:.2f}x"
    )
    print(
        f"wedges-per-edge growth {small:,} -> {big:,}: "
        f"ordered {grow_ord:.2f}x vs by-value {grow_bv:.2f}x — "
        "skew gap widens with scale, as claimed"
    )

    # k-core peel volume per octave (q_graph_kcore's loop on the same
    # synthetic power-law graphs, k=8 / 32 rounds for synthetic skew):
    # peel work per round is one alive-filtered degree agg, so
    # peeled-node volume and round count are the scale facts to watch.
    for n in sizes:
        e = synth_powerlaw_edges(spark, n).cache()
        m_n = e.count()
        t0 = time.perf_counter()
        trace = kcore_peel_trace(e, k=8, max_rounds=32).cache()
        rows = trace.count()
        core = trace.filter("in_core = 1").count()
        rounds = trace.agg(F.max("peel_round")).collect()[0][0]
        t_k = time.perf_counter() - t0
        trace.unpersist()
        e.unpersist()
        print(
            f"E~{n:>8,} (m={m_n:,})  kcore(k=8): nodes={rows:,} "
            f"core={core:,} peeled={rows - core:,} "
            f"rounds={rounds}  wall {t_k:5.1f}s"
        )

    # BFS reach per octave (q_graph_bfs's loop on the same graphs):
    # each round is one alive-keyed equi-join + min-agg, so the facts
    # to watch are (a) reached fraction at the fixed hop bound and
    # (b) per-round wall time growing with EDGES, not with round
    # count — the relaxation touches every edge each round, so wall
    # per round per edge should stay flat across octaves.
    from updatable_persistent_map_reduce_spark.operators.graph import (
        BFS_ROUNDS,
        bfs_distances,
    )

    per_edge: dict[int, float] = {}
    for n in sizes:
        e = synth_powerlaw_edges(spark, n).cache()
        m_n = e.count()
        t0 = time.perf_counter()
        d = bfs_distances(e).cache()
        nodes = d.count()
        reached = d.filter("dist >= 0").count()
        t_b = time.perf_counter() - t0
        d.unpersist()
        e.unpersist()
        per_edge[n] = t_b / BFS_ROUNDS / m_n * 1e6
        print(
            f"E~{n:>8,} (m={m_n:,})  bfs({BFS_ROUNDS} rounds): "
            f"nodes={nodes:,} reached={reached:,} "
            f"({reached * 100 // nodes}%)  wall {t_b:5.1f}s "
            f"({per_edge[n]:.2f} us/round/edge)"
        )
    # fixed-cost floor dominates small octaves; require only that the
    # largest octave's per-round-per-edge cost is not ABOVE the
    # smallest's (sub-linear amortization = edge-bound rounds)
    assert per_edge[sizes[-1]] <= per_edge[sizes[0]] * 1.5, (
        "BFS per-round-per-edge cost grew with scale — rounds are "
        "no longer edge-bound"
    )


if __name__ == "__main__":
    main()
