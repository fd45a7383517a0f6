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
    "density): ORDERED edges (u < v) make each triangle enumerable "
    "exactly once as a < b < c — wedge join (e1.v = e2.u gives "
    "a < b < c for free from the per-edge ordering) closed by an "
    "edge-existence join — so no post-hoc dedup and no double "
    "counting; output is per-node triangle participation. Plan: "
    "edge build is one self-join on l_orderkey + distinct; the "
    "wedge and closure steps are two hash equi-joins on node keys — "
    "never a product; at 100 TB the standard refinement is "
    "degree-ordered edge direction (point each edge at the "
    "higher-degree endpoint) to bound wedge skew, same join shape.",
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
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(e3, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
