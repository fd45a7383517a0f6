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

The REGISTERED q_pagerank runs in integer fixed-point (scale 1e12,
damping 17/20, floor at each division) so it is hash-exact against a
DuckDB oracle that unrolls the same recurrence as chained MATERIALIZED
CTEs; the float :func:`pagerank` stays as the production variant,
ground-truthed by numpy power iteration (tests/test_llm_ops.py,
max-abs-diff < 1e-5) with the fixed-point form asserted within 1e-6 of
the same numpy ranks.
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


PR_SCALE = 10**12  # fixed-point scale: ranks are floor(rank * 1e12)


def pagerank_fp(
    spark: SparkSession,
    nodes: DataFrame,  # (vec_id)
    edges: DataFrame,  # (va, vb) undirected pairs
    iters: int = PR_ITERS,
) -> DataFrame:
    """Power iteration in INTEGER fixed-point (scale 1e12), damping as
    the exact rational 17/20 with floor at every division:

        r' = (3*S) DIV (20*N)
           + 17 * (inflow + dmass DIV N) DIV 20
        inflow(u) = sum over in-edges of r(v) DIV deg(v)

    Integer addition is exact and associative, so partition summation
    order stops mattering — which is what makes the 10 iterations
    hash-exact against an unrolled-CTE DuckDB oracle (the float
    :func:`pagerank` stays as the production variant; the fixed-point
    drift vs float is < 1e-9 per rank, asserted in tests). Same plan
    shape per iteration: one equi-join + partial/final agg, the 1-row
    dangling aggregate broadcast into the update, localCheckpoint to
    pin lineage at O(1)."""
    n = nodes.count()
    sym = edges.select(
        F.col("va").alias("src"), F.col("vb").alias("dst")
    ).unionByName(
        edges.select(F.col("vb").alias("src"), F.col("va").alias("dst"))
    )
    sym = sym.localCheckpoint()
    outdeg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = (3 * PR_SCALE) // (20 * n)
    ranks = nodes.select(
        "vec_id", F.lit(PR_SCALE // n).cast("long").alias("r")
    )
    for _ in range(iters):
        with_deg = ranks.join(
            outdeg, ranks.vec_id == outdeg.src, "left"
        ).select("vec_id", "r", "deg")
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dmass")
        )
        contribs = (
            sym.join(with_deg, sym.src == with_deg.vec_id)
            .select("dst", F.expr("r DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, nodes.vec_id == contribs.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "vec_id",
                (
                    F.lit(base)
                    + F.expr(
                        f"17 * (coalesce(inflow, 0L) + dmass DIV {n}) DIV 20"
                    )
                ).cast("long").alias("r"),
            )
            .localCheckpoint()
        )
    return ranks


def _pagerank_oracle(iters: int = PR_ITERS) -> str:
    """The identical fixed-point recurrence as ``iters`` unrolled
    non-recursive CTEs (DuckDB recursive CTEs cannot aggregate in the
    recursive term, but the iteration count is a compile-time
    constant). Edge set = brute-force cos>=0.9, which the LSH
    candidate path matches exactly at gate scales (the same
    equivalence q_dedup_cluster's green row attests)."""
    from ..functions.vectors import COS_DOUBLE_SQL, PLANTED_CORPUS_SQL

    cos = COS_DOUBLE_SQL.format(a="a.embedding", b="b.embedding")
    s = str(PR_SCALE)
    sql = [
        f"WITH planted AS MATERIALIZED ({PLANTED_CORPUS_SQL}), "
        "pairs AS MATERIALIZED (SELECT a.vec_id AS va, b.vec_id AS vb "
        "FROM planted a JOIN planted b ON a.vec_id < b.vec_id "
        f"WHERE {cos} >= 0.9), "
        "sym AS MATERIALIZED (SELECT va AS s, vb AS d FROM pairs "
        "UNION ALL SELECT vb, va FROM pairs), "
        "deg AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT) AS dg "
        "FROM sym GROUP BY s), "
        "p AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM planted), "
        f"r0 AS MATERIALIZED (SELECT vec_id, {s} // p.n AS r FROM planted, p)"
    ]
    prev = "r0"
    for k in range(1, iters + 1):
        sql.append(
            f", dm{k} AS MATERIALIZED (SELECT COALESCE(SUM(r), 0) AS m FROM {prev} "
            f"LEFT JOIN deg ON {prev}.vec_id = deg.s WHERE deg.dg IS NULL)"
            f", inf{k} AS MATERIALIZED (SELECT sym.d AS vec_id, "
            f"SUM({prev}.r // deg.dg) AS i "
            f"FROM sym JOIN {prev} ON sym.s = {prev}.vec_id "
            f"JOIN deg ON deg.s = sym.s GROUP BY sym.d)"
            f", r{k} AS MATERIALIZED (SELECT e.vec_id, "
            f"(3 * {s} // (20 * p.n)) + "
            f"17 * (COALESCE(inf{k}.i, 0) + dm{k}.m // p.n) // 20 AS r "
            f"FROM planted e "
            f"LEFT JOIN inf{k} ON e.vec_id = inf{k}.vec_id "
            f"CROSS JOIN p CROSS JOIN dm{k})"
        )
        prev = f"r{k}"
    sql.append(
        f" SELECT vec_id, CAST(r AS BIGINT) AS rank_fp FROM {prev}"
    )
    return "".join(sql)


@register(
    "q_pagerank",
    oracle=_pagerank_oracle(),
    doc="PageRank centrality over the cos>=0.9 similarity graph (the "
    "PLANTED near-dup corpus, functions/vectors.planted_corpus — the "
    "raw synthetic embeddings are near-orthogonal, so earlier rounds "
    "ranked an empty graph; ranks are now non-uniform and a zero-edge "
    "guard raises), in "
    "INTEGER FIXED-POINT (scale 1e12, damping as the exact rational "
    "17/20, floor at every division) so all 10 iterations are "
    "hash-exact against a DuckDB oracle that unrolls the same "
    "recurrence as chained CTEs — integer sums are associative, so "
    "Spark's partition-parallel aggregation and DuckDB's sequential "
    "scan cannot diverge. Edges come from the LSH candidate path "
    "(lsh_candidate_edges — bucket equi-join, never all-pairs; the "
    "oracle brute-forces the same cos>=0.9 edge set, exact at gate "
    "scales per edge_lsh_geometry). Dangling mass redistributed "
    "uniformly; the float production variant (pagerank) is "
    "numpy-attested < 1e-5 and the fixed-point drift vs float is "
    "< 1e-9 per rank. Ranks exemplar documents inside near-dup "
    "clusters for keep-the-best dedup policies.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import planted_corpus
    from .dedup import lsh_candidate_edges

    e = spread(planted_corpus(Catalog(spark, sf_dir).embeddings))
    nodes = e.select("vec_id")
    # checkpoint before the guard: the edge join otherwise executes
    # once here and again inside every pagerank iteration's lineage
    edges = lsh_candidate_edges(spark, e).localCheckpoint()
    if edges.limit(1).count() == 0:
        raise RuntimeError(
            "pagerank found zero similarity edges at cos >= 0.9 — "
            "every rank would be the uniform teleport value and the "
            "green row would attest an empty graph (the r9 "
            "vacuous-green mode)"
        )
    ranks = pagerank_fp(spark, nodes, edges)
    return ranks.select("vec_id", F.col("r").alias("rank_fp"))


# ---------------------------------------------------------------------------
# triangle counting — the classic distributed graph-analytics kernel.

_TRI_MAX_PART = 500  # node subset bound: keeps wedge volume gate-scale


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The graph family's SHARED node/edge set: undirected (u, v) with
    u < v when two parts under the _TRI_MAX_PART bound share an order.
    Triangles, jaccard, k-core, and BFS all run on this one builder so
    a bound/dedup retune can never desynchronize a kernel from its
    oracle (each oracle embeds the identical SQL edge CTE)."""
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    li = li.filter(F.col("l_partkey") < _TRI_MAX_PART)
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    return (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


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
    e = _copurchase_edges(spark, sf_dir)
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


# ---------------------------------------------------------------------------
# node similarity — common-neighbor Jaccard over the co-purchase graph.

# J >= _JACC_NUM/_JACC_DEN. r9 shipped 3/10, which is vacuously green at
# the driver gate's sf0.01 (the co-purchase graph densifies with sf, so
# 0 pairs clear 0.3 there — ADVICE r9 medium); 3/20 yields pairs at BOTH
# gate scales (19,826 at sf0.001, 18 at sf0.01) and the PPJoin prefix
# bound is lossless for any fixed threshold. A non-emptiness raise in
# the query makes a future empty-join regression loud, not green.
_JACC_NUM, _JACC_DEN = 3, 20


@register(
    "q_graph_jaccard",
    oracle=(
        "WITH e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        f"WHERE a.l_partkey < {_TRI_MAX_PART} AND b.l_partkey < {_TRI_MAX_PART}), "
        "sym AS (SELECT u AS s, v AS d FROM e UNION ALL SELECT v, u FROM e), "
        "deg AS (SELECT s, CAST(count(*) AS BIGINT) AS dg FROM sym GROUP BY s), "
        "common AS (SELECT a1.d AS u, a2.d AS v, "
        "CAST(count(*) AS BIGINT) AS c "
        "FROM sym a1 JOIN sym a2 ON a1.s = a2.s AND a1.d < a2.d "
        "GROUP BY a1.d, a2.d) "
        "SELECT u, v, c AS common_neighbors, "
        "du.dg + dv.dg - c AS union_neighbors, "
        "c * 10000 // (du.dg + dv.dg - c) AS jaccard_bp "
        "FROM common JOIN deg du ON du.s = u JOIN deg dv ON dv.s = v "
        f"WHERE {_JACC_DEN} * c >= {_JACC_NUM} * (du.dg + dv.dg - c)"
    ),
    doc="NODE-SIMILARITY JOIN — common-neighbor Jaccard over the "
    "co-purchase graph (the link-prediction / related-items kernel): "
    "for every part pair, J = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|, "
    "thresholded at J >= 0.15 by integer cross-multiplication (no "
    "float ratio in a predicate; 0.15 because the co-purchase graph "
    "densifies with sf and 0.3 is vacuously empty at the sf0.01 gate "
    "— a non-emptiness raise now guards the vacuous-green case). "
    "Candidate generation is PPJoin-"
    "style PREFIX FILTERING on neighbor sets (the same published "
    "technique q_minhash_containment uses on shingles): each node's "
    "neighbor list is ordered rare-first (ascending neighbor degree — "
    "a neighbor's degree IS its token frequency), and only the first "
    "deg - ceil(t*deg) + 1 neighbors are exploded as join tokens — "
    "any pair with J >= t provably shares a token in both prefixes, "
    "so the filter is LOSSLESS, while hubs (the highest-frequency "
    "tokens) fall out of every prefix instead of fanning out "
    "quadratically as the naive wedge-on-shared-neighbor join does "
    "(tools/scale_jaccard.py measures candidate volume per octave, "
    "naive vs prefix). Verification is one sorted-array intersection "
    "per surviving candidate against collected adjacency arrays. "
    "Same bounded part subset as q_graph_triangles; the oracle is "
    "the plain wedge-count form — prefix filtering is an execution "
    "strategy, not a semantics change.",
)
def q_graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    # checkpoint before the guard: one execution of the prefix-filtered
    # join instead of guard + collect each paying it (r10 review)
    out = _jaccard_prefix_filtered(e).localCheckpoint()
    if out.limit(1).count() == 0:
        raise RuntimeError(
            "node-similarity join found zero pairs at J >= "
            f"{_JACC_NUM}/{_JACC_DEN} — the threshold no longer matches "
            "the graph's density at this scale, so a green oracle row "
            "would be attesting an empty join (the r9 ADVICE finding)"
        )
    return out


def _jaccard_adj(e: DataFrame) -> DataFrame:
    """Per-node sorted adjacency under the PPJoin global token order
    (ascending neighbor degree, node id tiebreak): (node, dg, ids,
    plen) where ids is the rare-first neighbor array and plen the
    Jaccard-t prefix length deg - ceil(t*deg) + 1, t = 3/20."""
    sym = e.select(F.col("u").alias("s"), F.col("v").alias("d")).unionByName(
        e.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    nd = deg.select(F.col("s").alias("d"), F.col("dg").alias("ndg"))
    return (
        sym.join(nd, "d")
        .groupBy("s")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ndg", "d"))),
                lambda x: x["d"],
            ).alias("ids")
        )
        .select(
            F.col("s").alias("node"),
            "ids",
            F.size("ids").cast("long").alias("dg"),
            (
                F.size("ids").cast("long")
                - F.expr(
                    f"({_JACC_NUM} * size(ids) + {_JACC_DEN - 1}) "
                    f"DIV {_JACC_DEN}"
                )
                + 1
            ).alias("plen"),
        )
    )


def _jaccard_prefix_filtered(e: DataFrame) -> DataFrame:
    """J >= _JACC_NUM/_JACC_DEN node pairs via lossless PPJoin prefix
    filtering; result-identical to the naive wedge join
    (scale_jaccard.py pins it) with candidate volume bounded by
    rare-token collisions."""
    adj = _jaccard_adj(e)
    pre = adj.select(
        "node",
        F.explode(F.slice("ids", 1, F.col("plen").cast("int"))).alias("t"),
    )
    cand = (
        pre.select(F.col("node").alias("u"), "t")
        .join(pre.select(F.col("node").alias("v"), "t"), "t")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .dropDuplicates(["u", "v"])
    )
    au = adj.select(
        F.col("node").alias("u"), F.col("ids").alias("iu"),
        F.col("dg").alias("du"),
    )
    av = adj.select(
        F.col("node").alias("v"), F.col("ids").alias("iv"),
        F.col("dg").alias("dv"),
    )
    scored = (
        cand.join(au, "u")
        .join(av, "v")
        .select(
            "u",
            "v",
            F.size(F.array_intersect("iu", "iv")).cast("long").alias("c"),
            "du",
            "dv",
        )
    )
    uni = F.col("du") + F.col("dv") - F.col("c")
    return scored.filter(_JACC_DEN * F.col("c") >= _JACC_NUM * uni).select(
        "u",
        "v",
        F.col("c").alias("common_neighbors"),
        uni.alias("union_neighbors"),
        F.expr("c * 10000L DIV (du + dv - c)").alias("jaccard_bp"),
    )


def _jaccard_naive(e: DataFrame) -> DataFrame:
    """The wedge-on-shared-neighbor form — correct, but hub-skewed;
    kept as the baseline tools/scale_jaccard.py measures against."""
    sym = e.select(F.col("u").alias("s"), F.col("v").alias("d")).unionByName(
        e.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    a1 = sym.select("s", F.col("d").alias("u"))
    a2 = sym.select("s", F.col("d").alias("v"))
    common = (
        a1.join(a2, "s")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    du = deg.select(F.col("s").alias("u"), F.col("dg").alias("du"))
    dv = deg.select(F.col("s").alias("v"), F.col("dg").alias("dv"))
    uni = F.col("du") + F.col("dv") - F.col("c")
    return (
        common.join(du, "u")
        .join(dv, "v")
        .filter(_JACC_DEN * F.col("c") >= _JACC_NUM * uni)
        .select(
            "u",
            "v",
            F.col("c").alias("common_neighbors"),
            uni.alias("union_neighbors"),
            F.expr("c * 10000L DIV (du + dv - c)").alias("jaccard_bp"),
        )
    )


# ---------------------------------------------------------------------------
# k-core decomposition — iterative peeling over the co-purchase graph.

KCORE_K = 20  # the fixed core threshold (see docstring for the choice)
KCORE_MAX_ROUNDS = 16  # fixpoint reached in <= 6 rounds at every sf


def _kcore_oracle(k: int = KCORE_K, rounds: int = KCORE_MAX_ROUNDS) -> str:
    """The identical peel recurrence as ``rounds`` unrolled
    MATERIALIZED CTEs (the proven pagerank recipe — DuckDB recursive
    CTEs cannot aggregate in the recursive term). Round r: degree of
    every alive node within the alive set, nodes below k leave with
    (peel_round = r, their degree at that point); survivors' final
    degree is computed within the final core."""
    sql = [
        "WITH e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, "
        "b.l_partkey AS v "
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        f"WHERE a.l_partkey < {_TRI_MAX_PART} "
        f"AND b.l_partkey < {_TRI_MAX_PART}), "
        "sym AS MATERIALIZED (SELECT u AS s, v AS d FROM e "
        "UNION ALL SELECT v, u FROM e), "
        "a0 AS MATERIALIZED (SELECT DISTINCT s FROM sym)"
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        sql.append(
            f", dg{r} AS MATERIALIZED (SELECT t.s, "
            "CAST(COALESCE(c.cnt, 0) AS BIGINT) AS dg "
            f"FROM a{p} t LEFT JOIN ("
            "SELECT sym.s AS s2, count(*) AS cnt FROM sym "
            f"JOIN a{p} u2 ON sym.d = u2.s "
            f"JOIN a{p} u1 ON sym.s = u1.s "
            "GROUP BY sym.s) c ON c.s2 = t.s)"
            f", rm{r} AS MATERIALIZED (SELECT s, dg FROM dg{r} "
            f"WHERE dg < {k})"
            f", a{r} AS MATERIALIZED (SELECT s FROM dg{r} "
            f"WHERE dg >= {k})"
        )
    sql.append(
        ", dgF AS MATERIALIZED (SELECT t.s, "
        "CAST(COALESCE(c.cnt, 0) AS BIGINT) AS dg "
        f"FROM a{rounds} t LEFT JOIN ("
        "SELECT sym.s AS s2, count(*) AS cnt FROM sym "
        f"JOIN a{rounds} u2 ON sym.d = u2.s "
        f"JOIN a{rounds} u1 ON sym.s = u1.s "
        "GROUP BY sym.s) c ON c.s2 = t.s) "
        "SELECT part, CAST(peel_round AS INTEGER) AS peel_round, "
        "CAST(in_core AS INTEGER) AS in_core, deg_final FROM ("
        "SELECT s AS part, 0 AS peel_round, 1 AS in_core, dg AS deg_final "
        "FROM dgF"
    )
    for r in range(1, rounds + 1):
        sql.append(
            f" UNION ALL SELECT s, {r}, 0, dg FROM rm{r}"
        )
    sql.append(")")
    return "".join(sql)


@register(
    "q_graph_kcore",
    oracle=_kcore_oracle(),
    doc="K-CORE DECOMPOSITION (r10) — the iterative-pruning graph "
    "kernel the family was missing (fixpoint = q_pagerank, "
    "enumeration = q_graph_triangles, similarity = q_graph_jaccard; "
    "peeling is the community-mining / spam-filter kernel): "
    "repeatedly remove nodes whose degree within the surviving "
    "subgraph is < k until fixpoint. Output is the full PEEL TRACE — "
    "every node with the round it was peeled (0 = survived into the "
    "k-core), an in_core flag, and its degree at exit (within the "
    "alive set when peeled; within the final core for survivors) — "
    "so the attestation is non-vacuous at every sf even though the "
    "bounded co-purchase subgraph's density varies ~100x across "
    "scales (all-core at sf0.001, 100 peeled / 400 kept in 6 rounds "
    "at the sf0.01 gate, all peeled at sf0.1). k = 20 is the value "
    "that produces BOTH classes at the gate scale. Plan shape: each "
    "round is one alive-filtered degree aggregation (equi-joins on "
    "the edge key + partial/final agg) with localCheckpoint pinning "
    "lineage at O(1) per round, exactly the pagerank_fp skeleton; "
    "peel volume per octave is measured in tools/scale_triangles.py. "
    "Integer degrees make every round hash-exact; the oracle unrolls "
    "the same recurrence as MATERIALIZED CTEs (the pagerank recipe). "
    "At 100 TB the edge list is bucketed by node so every round "
    "reuses one co-partitioned shuffle; rounds are O(peel depth), "
    "bounded and raised on at KCORE_MAX_ROUNDS.",
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    return kcore_peel_trace(e)


def kcore_peel_trace(
    e: DataFrame, k: int = KCORE_K, max_rounds: int = KCORE_MAX_ROUNDS
) -> DataFrame:
    """Full k-core peel trace over undirected (u, v) edges: one row per
    node with (part, peel_round — 0 = in core, in_core, deg_final).
    Shared by the registered query and tools/scale_triangles.py."""
    sym = e.select(F.col("u").alias("s"), F.col("v").alias("d")).unionByName(
        e.select(F.col("v").alias("s"), F.col("u").alias("d"))
    ).localCheckpoint()
    alive = sym.select("s").distinct().localCheckpoint()
    peeled = None
    for r in range(1, max_rounds + 1):
        # degree within the alive set: edges with BOTH endpoints alive
        deg = (
            sym.join(alive, "s")
            .join(alive.select(F.col("s").alias("d")), "d")
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        dd = alive.join(deg, "s", "left").select(
            "s", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("dg")
        )
        rm = dd.filter(F.col("dg") < k).select(
            "s", F.lit(r).alias("peel_round"), "dg"
        )
        if rm.limit(1).count() == 0:
            break  # fixpoint: nothing below k remains
        rm = rm.localCheckpoint()
        peeled = rm if peeled is None else peeled.unionByName(rm).localCheckpoint()
        alive = dd.filter(F.col("dg") >= k).select("s").localCheckpoint()
    else:
        raise RuntimeError(
            f"k-core peel did not converge in {max_rounds} rounds"
        )
    deg_f = (
        sym.join(alive, "s")
        .join(alive.select(F.col("s").alias("d")), "d")
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    core = alive.join(deg_f, "s", "left").select(
        "s",
        F.lit(0).alias("peel_round"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("dg"),
    )
    both = core if peeled is None else core.unionByName(peeled)
    return both.select(
        F.col("s").alias("part"),
        F.col("peel_round").cast("int").alias("peel_round"),
        (F.col("peel_round") == 0).cast("int").alias("in_core"),
        F.col("dg").alias("deg_final"),
    )


# ---------------------------------------------------------------------------
# multi-source BFS — bounded-hop distance to a labeled seed set.

BFS_SEED_MOD = 50  # seeds: part % 50 == 0 (deterministic labeled set)
BFS_ROUNDS = 8  # hop bound; extra rounds past convergence are no-ops
_BFS_INF = 1 << 30  # unreached sentinel inside the relaxation


def _bfs_oracle(rounds: int = BFS_ROUNDS) -> str:
    """The same min-distance relaxation unrolled as MATERIALIZED CTEs
    (the pagerank/kcore recipe): d_r(v) = min(d_{r-1}(v),
    1 + min over in-neighbors d_{r-1}(u)), INF-sentinel arithmetic so
    no NULL juggling; unreached nodes surface as dist = -1."""
    sql = [
        "WITH e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, "
        "b.l_partkey AS v "
        "FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        f"WHERE a.l_partkey < {_TRI_MAX_PART} "
        f"AND b.l_partkey < {_TRI_MAX_PART}), "
        "sym AS MATERIALIZED (SELECT u AS s, v AS d FROM e "
        "UNION ALL SELECT v, u FROM e), "
        "n AS MATERIALIZED (SELECT DISTINCT s FROM sym), "
        "d0 AS MATERIALIZED (SELECT s, CASE WHEN s % "
        f"{BFS_SEED_MOD} = 0 THEN 0 ELSE {_BFS_INF} END AS dist FROM n)"
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        sql.append(
            f", d{r} AS MATERIALIZED (SELECT d{p}.s, "
            f"least(d{p}.dist, COALESCE(nb.m, {_BFS_INF})) AS dist "
            f"FROM d{p} LEFT JOIN (SELECT sym.d AS s2, "
            f"min(d{p}.dist) + 1 AS m FROM sym "
            f"JOIN d{p} ON sym.s = d{p}.s GROUP BY sym.d) nb "
            f"ON nb.s2 = d{p}.s)"
        )
    sql.append(
        f" SELECT s AS part, CAST(CASE WHEN dist >= {_BFS_INF} "
        "THEN -1 ELSE dist END AS INTEGER) AS dist, "
        f"CAST(s % {BFS_SEED_MOD} = 0 AS INT) AS is_seed "
        f"FROM d{rounds}"
    )
    return "".join(sql)


@register(
    "q_graph_bfs",
    oracle=_bfs_oracle(),
    doc="MULTI-SOURCE BFS — bounded-hop distance from a labeled seed "
    "set, the graph-traversal kernel the family was missing "
    "(fixpoint = q_pagerank, enumeration = q_graph_triangles, "
    "similarity = q_graph_jaccard, peeling = q_graph_kcore): "
    "distance from every node to the NEAREST seed (the 'distance "
    "from known-spam / known-good labels' primitive behind "
    "propagation-based trust scoring), over the bounded co-purchase "
    f"graph with seeds = nodes ≡ 0 (mod {BFS_SEED_MOD}). Exactly "
    f"{BFS_ROUNDS} relaxation rounds run in BOTH engines — rounds "
    "past convergence are identity, so no early-stop divergence is "
    "possible and every value is integer-exact; nodes beyond the "
    "hop bound surface as dist = -1 (at the gate scales the graph "
    "converges well inside the bound, so -1 rows also prove the "
    "relaxation did not leak). Plan: per round ONE alive-keyed "
    "equi-join + min-aggregate with localCheckpoint pinning lineage "
    "at O(1) — the pagerank_fp skeleton; at 100 TB the edge list is "
    "bucketed by node and every round reuses the same "
    "co-partitioned shuffle. INF-sentinel arithmetic keeps the "
    "whole relaxation in non-null integers (hash-exact).",
)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir)
    return bfs_distances(e)


def bfs_distances(
    e: DataFrame,
    seed_mod: int = BFS_SEED_MOD,
    rounds: int = BFS_ROUNDS,
) -> DataFrame:
    """Bounded-hop multi-source BFS over undirected (u, v) edges:
    (part, dist to nearest seed or -1, is_seed). Fixed round count —
    identical in the oracle — so convergence timing can't diverge."""
    sym = e.select(F.col("u").alias("s"), F.col("v").alias("d")).unionByName(
        e.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
    dist = (
        sym.select("s")
        .distinct()
        .select(
            "s",
            F.when(F.col("s") % seed_mod == 0, F.lit(0))
            .otherwise(F.lit(_BFS_INF))
            .alias("dist"),
        )
        .localCheckpoint()
    )
    for _ in range(rounds):
        nb = (
            sym.join(dist, "s")
            .groupBy(F.col("d").alias("s"))
            .agg((F.min("dist") + 1).alias("m"))
        )
        dist = (
            dist.join(nb, "s", "left")
            .select(
                "s",
                F.least(
                    F.col("dist"), F.coalesce(F.col("m"), F.lit(_BFS_INF))
                ).alias("dist"),
            )
            .localCheckpoint()
        )
    return dist.select(
        F.col("s").alias("part"),
        F.when(F.col("dist") >= _BFS_INF, F.lit(-1))
        .otherwise(F.col("dist"))
        .cast("int")
        .alias("dist"),
        (F.col("s") % seed_mod == 0).cast("int").alias("is_seed"),
    )
