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
