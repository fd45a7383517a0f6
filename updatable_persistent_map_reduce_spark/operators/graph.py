"""Tier B — graph analytics over the embedding similarity graph.

PageRank-style centrality over the cos>=0.9 near-duplicate graph: a
corpus-curation signal (a document whose neighborhood is dense sits in
a boilerplate/near-dup cluster; centrality ranks cluster exemplars).
Complements the connected-components clustering (dedup.q_dedup_cluster)
with a NUMERIC fixpoint — per-iteration float mass propagation — where
CC is a min-label fixpoint.

Scale shape: each iteration is one equi-join (edges x ranks, both
hash-partitioned on the join key) + one partial+final aggregation; the
dangling-mass correction is a 1-row aggregate broadcast-cross-joined
into the same job (NOT collected driver-side — a per-iteration driver
collect doubles the job count and adds a scheduler barrier each
round). ``localCheckpoint`` truncates lineage so the plan stays O(1)
per iteration instead of growing with the iteration count. At 100 TB
the edge list would be persisted bucketed by src so every iteration
reuses one co-partitioned shuffle.

Rows-only (no SQL oracle): recursive CTEs cannot aggregate in the
recursive term, so the ground truth is numpy power iteration on the
same edge set (tests/test_llm_ops.py asserts max-abs-diff < 1e-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import Catalog, spread
from . import register

PR_ITERS = 10
PR_DAMPING = 0.85


def pagerank(
    spark: SparkSession,
    nodes: DataFrame,  # (vec_id)
    edges: DataFrame,  # (va, vb) undirected pairs
    iters: int = PR_ITERS,
    damping: float = PR_DAMPING,
) -> DataFrame:
    """Power iteration with uniform teleport and dangling-mass
    redistribution: r' = (1-d)/N + d * (M r + dangling/N)."""
    n = nodes.count()
    sym = edges.select(
        F.col("va").alias("src"), F.col("vb").alias("dst")
    ).unionByName(
        edges.select(F.col("vb").alias("src"), F.col("va").alias("dst"))
    )
    sym = sym.localCheckpoint()
    outdeg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select("vec_id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        with_deg = ranks.join(
            outdeg, ranks.vec_id == outdeg.src, "left"
        ).select("vec_id", "rank", "deg")
        # rank mass sitting on nodes with no out-edges (isolated in the
        # symmetric similarity graph) teleports uniformly. Computed as
        # a 1-row aggregate and broadcast-cross-joined into the rank
        # update so the whole iteration is ONE job (the materializing
        # localCheckpoint) — no driver round-trip for the scalar.
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        contribs = (
            sym.join(with_deg, sym.src == with_deg.vec_id)
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, nodes.vec_id == contribs.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "vec_id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("dmass") / n
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


@register(
    "q_pagerank",
    oracle=None,
    doc="PageRank centrality over the cos>=0.9 similarity graph "
    "(rows-only: per-iteration float sums are not SQL-recursive-CTE "
    "expressible; ground truth is numpy power iteration on the same "
    "edge set, asserted < 1e-6 in tests). Edges come from the LSH "
    "candidate path (lsh_candidate_edges — bucket equi-join, never "
    "all-pairs); 10 iterations, damping 0.85, dangling mass "
    "redistributed uniformly. Ranks exemplar documents inside "
    "near-dup clusters for keep-the-best dedup policies.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import lsh_candidate_edges

    e = spread(Catalog(spark, sf_dir).embeddings)
    nodes = e.select("vec_id")
    edges = lsh_candidate_edges(spark, e)
    ranks = pagerank(spark, nodes, edges)
    return ranks.select("vec_id", F.round("rank", 6).alias("rank"))


# ---------------------------------------------------------------------------
# triangle counting — the classic distributed graph-analytics kernel.

_TRI_MAX_PART = 500  # node subset bound: keeps wedge volume gate-scale


@register(
    "q_graph_triangles",
    oracle=(
        "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        f"WHERE a.l_partkey < {_TRI_MAX_PART} AND b.l_partkey < {_TRI_MAX_PART}), "
        "t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c "
        "FROM e e1 JOIN e e2 ON e1.v = e2.u "
        "JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) "
        "SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM ("
        "SELECT a AS node FROM t UNION ALL SELECT b FROM t "
        "UNION ALL SELECT c FROM t) GROUP BY node"
    ),
    doc="TRIANGLE COUNTING over the co-purchase graph (nodes = parts, "
    "an undirected edge when two parts share an order — the "
    "market-basket graph), restricted to a bounded part subset so "
    "wedge volume stays gate-scale. The classic distributed "
    "graph-analytics kernel (clustering coefficient / community "
    "density), in the DEGREE-ORDERED form (Latapy's compact-forward / "
    "GraphX's canonical orientation): every undirected edge is "
    "directed toward its higher-(degree, id) endpoint, so each "
    "triangle is enumerated exactly once from its LOWEST-rank corner "
    "and wedge fan-out per join key is outdeg^2 under the "
    "orientation — bounded by O(sqrt(m)) per node for ANY degree "
    "distribution, which is what keeps a power-law hub from becoming "
    "a shuffle whale at 100x scale (tools/scale_triangles.py measures "
    "exactly this: ordered wedge volume stays near-linear in edges "
    "while the unordered form grows superlinearly). Orientation is "
    "result-invariant — per-node participation counts are a property "
    "of the undirected graph — so the oracle is the plain ordered-"
    "by-value enumeration. Plan: edge build is one self-join on "
    "l_orderkey + distinct; degree agg + orientation join; then the "
    "wedge and closure steps are two hash equi-joins on node keys — "
    "never a product.",
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    li = li.filter(F.col("l_partkey") < _TRI_MAX_PART)
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    tri = _triangles_degree_ordered(e)
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def _triangles_degree_ordered(e: DataFrame) -> DataFrame:
    """Enumerate each triangle of the undirected edge set ``e``
    (u < v, distinct) exactly once, degree-ordered: (a, b, c) with
    rank(a) < rank(b) < rank(c) under rank = (degree, node). Shared by
    the registered query and tools/scale_triangles.py."""
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Re-orient: src = the (deg, id)-smaller endpoint. Two equi-joins
    # pick up each endpoint's degree; the directed edge carries the
    # dst's rank so wedge pairs can be ordered without a third join.
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ed = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias(
                "ddeg"
            ),
        )
    )
    # Wedges from the LOW-rank corner: join key is src, whose
    # out-degree under this orientation is <= O(sqrt(m)) — per-key
    # fan-out outdeg^2 is bounded even on power-law hubs.
    e1 = ed.select(
        F.col("src").alias("a"), F.col("dst").alias("b"),
        F.col("ddeg").alias("bdeg"),
    )
    e2 = ed.select(
        F.col("src").alias("a"), F.col("dst").alias("c"),
        F.col("ddeg").alias("cdeg"),
    )
    wedges = e1.join(e2, "a").filter(
        (F.col("bdeg") < F.col("cdeg"))
        | ((F.col("bdeg") == F.col("cdeg")) & (F.col("b") < F.col("c")))
    )
    # Closure: rank(b) < rank(c), so the directed edge between them —
    # if the triangle exists — is exactly b -> c.
    e3 = ed.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return wedges.join(e3, ["b", "c"]).select("a", "b", "c")
