"""Tier B — vector similarity search over ``embeddings.embedding``.

Brute-force cosine top-k (oracle-checked, the correctness baseline)
plus a random-hyperplane LSH-bucketed variant (the scale path).

Scale design: brute-force top-k against Q query vectors is a
broadcast of Q rows over the corpus — linear scan, no shuffle, dot
products inside whole-stage codegen (functions/vectors.py). That is
the right plan up to surprisingly large corpora (100 TB of 64-dim
floats is a pure map + per-partition top-k + driver merge of k·P
rows). When Q is large or latency matters, the LSH variant buckets
both sides by hyperplane sign bits so candidate generation is an
equi-join on the bucket key; an IVF variant would swap the bucket fn
for k-means cell ids, same join shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr
from ..sources import Catalog, spread
from . import register

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors


@register(
    "q_sim_search",
    oracle=(
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        f"WHERE vec_id < {N_QUERIES}), "
        "scored AS (SELECT q.query_id, e.vec_id, "
        "round(list_cosine_similarity(list_transform(q.qe, x -> CAST(x AS DOUBLE)), "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos_sim "
        "FROM q JOIN embeddings e ON e.vec_id <> q.query_id) "
        "SELECT query_id, vec_id, cos_sim, CAST(rnk AS INTEGER) AS rnk FROM ("
        "SELECT query_id, vec_id, cos_sim, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk FROM scored) "
        f"WHERE rnk <= {TOP_K}"
    ),
    doc="Brute-force cosine top-k per query vector: broadcast the query "
    "set, codegen'd dot products over a single corpus scan, "
    "per-partition top-k via window. The ANN baseline. No spread(): "
    "the scorer is pure whole-stage codegen, so a repartition shuffle "
    "before it only adds exchange cost (the r3 bench regression, "
    "0.52->0.83 s, was exactly that shuffle).",
)
def q_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_expr(F.col("qe"), F.col("embedding")), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path) — rows-only: bucket recall is
# approximate by design. Multiple hash tables are the recall lever
# (a single table's recall collapses — measured 2% vs brute force);
# T tables of P planes give P(candidate) ~= 1 - (1 - s^P)^T for
# similarity s.

N_TABLES = 8
N_PLANES = 4  # 16 buckets per table


def _plane_coeff(t: int, p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1):
    a splitmix-style integer hash of (table, plane, dim) —
    reproducible across runs, no RNG state."""
    x = (t * 97_561 + p * 1_000_003 + d * 7_919 + 12_345) & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x45D9F3B) & 0xFFFFFFFF
    x ^= x >> 16
    return (x / 2147483648.0) - 1.0


N_CELLS = 16
N_PROBE = 4
KMEANS_ITERS = 2


def make_assign_udf(spark: SparkSession, cmat: np.ndarray):
    """Arrow-batched nearest-centroid assignment: one numpy matmul per
    batch against the broadcast (cells × dim) centroid matrix."""
    bc = spark.sparkContext.broadcast(cmat)

    @F.pandas_udf("int")
    def assign(embs: pd.Series) -> pd.Series:
        m = np.stack(embs.to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        return pd.Series(np.argmax(m @ bc.value.T, axis=1).astype("int32"))

    # asNondeterministic: the IVF probe equi-join on the UDF-derived
    # ``cell`` column made Catalyst push an isnotnull(cell) filter
    # below the projection, DUPLICATING the centroid matmul for every
    # corpus vector (two stacked ArrowEvalPython nodes over the same
    # input). The marker blocks the duplication (guide §4.4); the
    # assignment is genuinely deterministic.
    return assign.asNondeterministic()


def fit_kmeans(
    spark: SparkSession,
    e: DataFrame,
    n_cells: int = N_CELLS,
    iters: int = KMEANS_ITERS,
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd): deterministic seeding
    (first ``n_cells`` vectors by id), Arrow-batched assignment, and
    the canonical posexplode + groupBy(cell, dim) mean update — one
    shuffle keyed by cell×dim per iteration. Centroids are KB-sized
    driver state (the legitimate collect). Shared by the IVF ANN index
    and semantic dedup so both see the same partitioning of space."""
    seed_rows = (
        e.filter(F.col("vec_id") < n_cells).orderBy("vec_id").collect()
    )
    centroids = np.array([r.embedding for r in seed_rows], dtype=np.float64)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    for _ in range(iters):
        assigned = e.select(
            "vec_id",
            "embedding",
            make_assign_udf(spark, centroids)("embedding").alias("cell"),
        )
        upd = (
            assigned.select("cell", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        nxt = centroids.copy()
        by_cell: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cell.setdefault(r.cell, {})[r.dim] = r.mu
        for cell, dims in by_cell.items():
            vec = np.array([dims[i] for i in range(len(dims))])
            n = np.linalg.norm(vec)
            if n > 0:
                nxt[cell] = vec / n
        centroids = nxt
    return centroids


@register(
    "q_sim_search_ivf",
    oracle=None,
    doc="IVF-bucketed ANN (the k-means twin of the LSH path): coarse "
    "centroids from 2 distributed Lloyd iterations (assignment = "
    "vectorized numpy argmax over a broadcast centroid matrix; update "
    "= posexplode + groupBy(cell, dim) mean — pure DataFrame ops), "
    "every vector inverted-listed under its nearest cell, queries "
    "probe their 4 nearest cells and exact cosine re-ranks the probed "
    "union. Per-query cost ~ corpus*(nprobe/cells) instead of a full "
    "scan; centroids are KB-sized driver state, the inverted list is "
    "the same (cell -> vectors) layout a 100 TB deployment would "
    "persist bucketed-by-cell so probes are partition-pruned scans.",
)
def q_sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(Catalog(spark, sf_dir).embeddings)
    e = e.select("vec_id", "embedding").persist()

    centroids = fit_kmeans(spark, e)

    listed = e.select(
        "vec_id",
        "embedding",
        make_assign_udf(spark, centroids)("embedding").alias("cell"),
    )

    # --- probe sets: per query, its N_PROBE nearest cells (numpy on
    # the driver — queries and centroids are KB-sized).
    q_rows = (
        e.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    )
    qmat = np.array([r.embedding for r in q_rows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    probe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :N_PROBE]
    probes = spark.createDataFrame(
        [
            (int(r.vec_id), r.embedding, int(c))
            for r, row in zip(q_rows, probe)
            for c in row
        ],
        "query_id long, qe array<float>, cell int",
    )

    cand = (
        listed.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine_expr(F.col("qe"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


def lsh_bucket_udf(spark: SparkSession, dim: int = 64,
                   n_tables: int = N_TABLES, n_planes: int = N_PLANES):
    """Arrow-batched random-hyperplane bucketer: embedding ->
    array<int> of one bucket id per hash table.

    All T*P plane dot products run in one numpy matmul per Arrow batch
    (the expression form — T*P interpreted higher-order dot products
    per row — measured ~3x slower end-to-end); planes come from the
    deterministic _plane_coeff hash, so bucket ids are reproducible
    across runs and consumers (ANN search and near-dup edge
    generation share the same buckets).
    """
    planes = np.array(
        [
            [_plane_coeff(t, p, d) for d in range(dim)]
            for t in range(n_tables)
            for p in range(n_planes)
        ]
    )  # (T*P, dim)
    bits = (1 << np.arange(n_planes, dtype=np.int64))  # per-plane bit value
    offs = (np.arange(n_tables, dtype=np.int64) * (1 << n_planes))
    bc = spark.sparkContext.broadcast((planes, bits, offs))

    @F.pandas_udf("array<int>")
    def bucket_ids(embs: pd.Series) -> pd.Series:
        pl, bt, of = bc.value
        m = np.stack(embs.to_numpy()).astype(np.float64)  # (n, dim)
        signs = (m @ pl.T) >= 0  # (n, T*P)
        signs = signs.reshape(len(m), n_tables, n_planes)
        ids = (signs * bt).sum(axis=2) + of  # (n, T)
        return pd.Series(list(ids.astype("int32")))

    return bucket_ids


@register(
    "q_sim_search_lsh",
    oracle=None,
    doc="Random-hyperplane LSH ANN: 8 hash tables x 4 sign bits; each "
    "vector lands in one bucket per table, queries join candidates on "
    "(table, bucket) — an equi-join shuffled by bucket key — then exact "
    "cosine re-ranks the candidate union. The scale path q_sim_search "
    "baselines: per-query cost ~ T·corpus/2^P instead of a full scan; "
    "tune T up for recall, P up for selectivity.",
)
def q_sim_search_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(Catalog(spark, sf_dir).embeddings)
    bucket_ids = lsh_bucket_udf(spark)

    base = e.select(
        "vec_id", "embedding", F.explode(bucket_ids("embedding")).alias("bucket")
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("bucket"),
    )
    cand = (
        base.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine_expr(F.col("qe"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization — the storage/serving compression step.

_QMAX = 127  # int8 symmetric range


# ---------------------------------------------------------------------------
# product quantization — the ANN memory-compression workhorse.

_PQ_M = 8  # subspaces (64-dim embedding -> 8 sub-vectors of 8 dims)
_PQ_K = 4  # centroids per subspace (2 bits) — seeded like _KM_K
_PQ_D = 8  # dims per subspace


@register(
    "q_embed_pq",
    oracle=(
        "WITH mx AS (SELECT max(greatest("
        "CAST(list_aggregate(embedding, 'max') AS DOUBLE), "
        "-CAST(list_aggregate(embedding, 'min') AS DOUBLE))) AS gmax "
        "FROM embeddings), "
        "q AS (SELECT vec_id, list_transform(embedding, x -> "
        "CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS BIGINT)) AS code "
        "FROM (SELECT vec_id, embedding, gmax / 127 AS sc "
        "FROM embeddings, mx)), "
        "cr AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 "
        f"AS INTEGER) AS k, code AS ccode FROM q ORDER BY vec_id LIMIT {_PQ_K}), "
        "sub AS (SELECT q.vec_id, m.m, cr.k, "
        f"CAST(list_sum(list_transform(range(0, {_PQ_D}), j -> "
        f"(q.code[m.m * {_PQ_D} + j + 1] - cr.ccode[m.m * {_PQ_D} + j + 1]) * "
        f"(q.code[m.m * {_PQ_D} + j + 1] - cr.ccode[m.m * {_PQ_D} + j + 1])"
        ")) AS BIGINT) AS d "
        f"FROM q CROSS JOIN (SELECT unnest(range(0, {_PQ_M})) AS m) m "
        "CROSS JOIN cr), "
        "best AS (SELECT vec_id, m, k, d, row_number() OVER "
        "(PARTITION BY vec_id, m ORDER BY d, k) AS rn FROM sub) "
        "SELECT vec_id, "
        "CAST(sum(CAST(k AS BIGINT) * (CAST(1 AS BIGINT) << "
        "CAST(2 * m AS INTEGER))) AS BIGINT) AS pq_code, "
        "CAST(sum(d) AS BIGINT) AS recon_err "
        "FROM best WHERE rn = 1 GROUP BY vec_id"
    ),
    doc="PRODUCT QUANTIZATION (Jegou et al. — the ANN memory "
    "compression workhorse IVF-PQ serving tiers run): the 64-dim "
    "embedding splits into 8 sub-vectors of 8 dims; each subspace has "
    "its own 4-entry codebook (2 bits), so a vector compresses to a "
    "16-bit PQ code — 16x smaller than int8, 256x smaller than "
    "float64 — plus the integer reconstruction error that quantifies "
    "the recall cost. Everything is EXACT integer arithmetic on the "
    "same global-scale codes as q_kmeans_assign/q_dedup_semantic "
    "(codebooks = the sub-vectors of the 4 smallest vec_ids, the "
    "deterministic seeding rule; squared-L2 assignment with ties to "
    "the lowest centroid), so the DuckDB hash compare is exact. "
    "Plan: the 8x4 subspace distances are zip_with/aggregate codegen "
    "against codebook LITERALS over slices of one scan — one "
    "projection, no shuffle, no join, no Python; at 100 TB this is "
    "the map-only encode job that writes the PQ-compressed copy of "
    "the corpus.",
)
def q_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    from ..functions.vectors import global_embed_gmax

    gmax = global_embed_gmax(e)
    scale = gmax / 127
    codes = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") / F.lit(scale) + F.lit(0.5)
            ).cast("long"),
        ).alias("code"),
    )
    seeds = codes.orderBy("vec_id").limit(_PQ_K).collect()
    sq_l2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pq_terms, err_terms = [], []
    for m in range(_PQ_M):
        sub = F.slice("code", m * _PQ_D + 1, _PQ_D)
        dists = F.array(
            *[
                sq_l2(
                    sub,
                    F.array(
                        *[
                            F.lit(int(v))
                            for v in s["code"][m * _PQ_D : (m + 1) * _PQ_D]
                        ]
                    ),
                )
                for s in seeds
            ]
        )
        dmin = F.array_min(dists)
        kidx = (F.array_position(dists, dmin) - 1).cast("long")
        pq_terms.append(kidx * F.lit(1 << (2 * m)).cast("long"))
        err_terms.append(dmin)
    pq_code = pq_terms[0]
    for t in pq_terms[1:]:
        pq_code = pq_code + t
    err = err_terms[0]
    for t in err_terms[1:]:
        err = err + t
    return codes.select(
        "vec_id",
        pq_code.cast("bigint").alias("pq_code"),
        err.cast("bigint").alias("recon_err"),
    )


@register(
    "q_embed_quantize",
    oracle=(
        "SELECT vec_id, round(scale, 6) AS scale, "
        "round(CASE WHEN max_abs = 0 THEN 0 ELSE list_aggregate("
        "list_transform(embedding, x -> abs(floor(CAST(x AS DOUBLE) / scale "
        "+ 0.5) * scale - CAST(x AS DOUBLE))), 'max') END, 6) AS max_err, "
        "CAST(CASE WHEN max_abs = 0 THEN 0 ELSE len(list_filter(embedding, "
        "x -> abs(floor(CAST(x AS DOUBLE) / scale + 0.5)) >= 127)) END "
        "AS INTEGER) AS n_sat FROM ("
        "SELECT vec_id, embedding, max_abs, max_abs / 127 AS scale FROM ("
        "SELECT vec_id, embedding, "
        "greatest(CAST(list_aggregate(embedding, 'max') AS DOUBLE), "
        "-CAST(list_aggregate(embedding, 'min') AS DOUBLE)) AS max_abs "
        "FROM embeddings))"
    ),
    doc="Symmetric int8 scalar quantization of the embedding column — "
    "the 4x storage/bandwidth compression an ANN serving tier applies "
    "before indexing. Per vector: scale = max|x|/127, code = "
    "floor(x/scale + 0.5) (floor-based symmetric rounding: exact IEEE "
    "semantics in every engine, no round-half convention drift), "
    "reporting the max reconstruction error and saturated-lane count. "
    "Pure Catalyst expressions over one scan — no shuffle, no Python; "
    "at 100 TB this is a map-only rewrite job whose output parquet is "
    "1/4 the bytes. Zero vectors degrade to scale 0 / err 0 by "
    "definition in both engines.\n\n"
    "Expression-construction constraint (wrong-answer hazard, found "
    "by the oracle gate): the internal unrounded scale column is "
    "named scale_raw, NOT scale. Aliasing the rounded output to the "
    "same name as the internal column it derives from made Spark "
    "resolve the F.col('scale') references inside the err/n_sat "
    "lambdas to the ROUNDED output after projection collapse "
    "(self-referential name shadowing), silently quantizing with the "
    "6-decimal scale — a value-level corruption no schema check "
    "catches. Never reuse an internal column's name for a transformed "
    "output of itself in the same select.",
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    max_abs = F.greatest(
        F.array_max("embedding").cast("double"),
        (-F.array_min("embedding")).cast("double"),
    )
    base = e.select("vec_id", "embedding", max_abs.alias("max_abs")).withColumn(
        "scale_raw", F.col("max_abs") / _QMAX
    )
    code = lambda x: F.floor(  # noqa: E731
        x.cast("double") / F.col("scale_raw") + F.lit(0.5)
    )
    err = F.array_max(
        F.transform(
            "embedding",
            lambda x: F.abs(code(x) * F.col("scale_raw") - x.cast("double")),
        )
    )
    n_sat = F.size(
        F.filter("embedding", lambda x: F.abs(code(x)) >= _QMAX)
    )
    zero = F.col("max_abs") == 0
    return base.select(
        "vec_id",
        F.round("scale_raw", 6).alias("scale"),
        F.round(F.when(zero, F.lit(0.0)).otherwise(err), 6).alias("max_err"),
        F.when(zero, F.lit(0)).otherwise(n_sat).cast("int").alias("n_sat"),
    )


# ---------------------------------------------------------------------------
# threshold similarity join — the LSH-bucketed scale twin of the
# brute-force q_dedup_embed pair generator.


def _sim_join_threshold_oracle() -> str:
    from ..functions.vectors import COS_DOUBLE_SQL, PLANTED_CORPUS_SQL

    cos = COS_DOUBLE_SQL.format(a="a.embedding", b="b.embedding")
    return (
        f"WITH planted AS ({PLANTED_CORPUS_SQL}) "
        "SELECT a.vec_id AS va, b.vec_id AS vb, "
        f"round({cos}, 4) AS cos_sim "
        "FROM planted a JOIN planted b ON a.vec_id < b.vec_id "
        f"WHERE {cos} >= 0.9"
    )


@register(
    "q_sim_join_threshold",
    oracle=_sim_join_threshold_oracle(),
    doc="All-pairs similarity join at cos >= 0.9 via the LSH candidate "
    "path (dedup.lsh_candidate_edges: hyperplane tables, bucket "
    "equi-join, exact-cosine verify — never a va < vb cross product), "
    "over the PLANTED near-dup corpus (functions/vectors."
    "planted_corpus — the raw synthetic embeddings are near-"
    "orthogonal, so the r5 row attested an EMPTY join; ~1300 real "
    "pairs now cross the threshold at the sf0.01 gate). Deliberately "
    "shares its oracle with the BRUTE-FORCE q_dedup_embed: a green "
    "row here is an exact-recall attestation of the bucketed "
    "generator that q_dedup_cluster and q_pagerank build on (a "
    "qualifying cos=0.9 pair escapes all 16 tables with prob ~4e-6, "
    "and the planted pairs sit at ~0.97 where the escape prob is "
    "~1e-9; every candidate is exact-verified, so precision is "
    "exact). Cost scales with near-dup density, not corpus².",
)
def q_sim_join_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import planted_corpus
    from ..operators.dedup import lsh_candidate_edges

    e = spread(planted_corpus(Catalog(spark, sf_dir).embeddings))
    # checkpoint before the guard so the LSH join runs once, not twice
    out = (
        lsh_candidate_edges(spark, e)
        .select("va", "vb", "cos_sim")
        .localCheckpoint()
    )
    if out.limit(1).count() == 0:
        raise RuntimeError(
            "LSH threshold join found zero pairs at cos >= 0.9 — the "
            "planted-twin corpus or the candidate generator regressed, "
            "so this query would be attesting an empty join"
        )
    return out


# ---------------------------------------------------------------------------
# persisted IVF index — build once, probe many (plans/ann_index.py).


@register(
    "q_sim_index_persisted",
    oracle=(
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        f"WHERE vec_id < {N_QUERIES}), "
        "scored AS (SELECT q.query_id, e.vec_id, "
        "round(list_cosine_similarity(list_transform(q.qe, x -> CAST(x AS DOUBLE)), "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos_sim "
        "FROM q JOIN embeddings e ON e.vec_id <> q.query_id) "
        "SELECT query_id, vec_id, cos_sim, CAST(rnk AS INTEGER) AS rnk FROM ("
        "SELECT query_id, vec_id, cos_sim, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk FROM scored) "
        f"WHERE rnk <= {TOP_K}"
    ),
    doc="ANN through a PERSISTED IVF index (plans/ann_index.py): "
    "centroids + a cell-listed ManifestTable built once, then probed "
    "— the probe resolves driver-side to the probed cells' files "
    "(the view store's span pruning applied to vector search) and "
    "supports incremental appends of new vectors with atomic "
    "manifest snapshots. Run here with nprobe = n_cells, which "
    "provably probes every cell — EXACT search, so it shares "
    "q_sim_search's oracle; partial-nprobe recall/cost is measured "
    "in tools/scale_ann.py. The reference's materialize-once-serve-"
    "many contract (Executer.cs:165-203, 370-376) for embeddings.",
)
def q_sim_index_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..plans.ann_index import IvfIndex

    e = spread(Catalog(spark, sf_dir).embeddings).select("vec_id", "embedding")
    idx = IvfIndex(spark, tempfile.mkdtemp(prefix="upmr_ivf_"), n_cells=N_CELLS)
    idx.build(e)
    queries = [
        (r.vec_id, list(r.embedding))
        for r in e.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    ]
    return idx.search(queries, k=TOP_K, nprobe=N_CELLS)


@register(
    "q_sim_index_pq",
    oracle=(
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        f"WHERE vec_id < {N_QUERIES}), "
        "scored AS (SELECT q.query_id, e.vec_id, "
        "round(list_cosine_similarity(list_transform(q.qe, x -> CAST(x AS DOUBLE)), "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos_sim "
        "FROM q JOIN embeddings e ON e.vec_id <> q.query_id) "
        "SELECT query_id, vec_id, cos_sim, CAST(rnk AS INTEGER) AS rnk FROM ("
        "SELECT query_id, vec_id, cos_sim, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk FROM scored) "
        f"WHERE rnk <= {TOP_K}"
    ),
    doc="ANN through the PERSISTED IVF-PQ index (plans/ann_index.py "
    "IvfPqIndex — Jegou et al.'s pairing, the actual 100 TB vector-"
    "serving architecture): cells carry a PQ-code payload (4 bits x "
    "8 subspaces per vector; normalized-domain fixed-point codes so "
    "integer-L2 ADC ranks by cosine; per-subspace codebooks trained "
    "by Lloyd on a bounded deterministic sample, centroids rounded "
    "to integers — q_embed_pq's integer-exactness discipline), "
    "probes score candidates by Asymmetric "
    "Distance Computation — per-query integer lookup tables shipped "
    "in the broadcast probe frame so the ADC sum is whole-stage "
    "codegen over the CODES spans only — then the full-vector table "
    "is read span-pruned to the survivors' cells for exact cosine "
    "re-rank. Run here with nprobe = n_cells and rerank = all, which "
    "provably covers every candidate — EXACT search sharing "
    "q_sim_search's oracle; the production partial-probe/partial-"
    "rerank trade is recall-tested in pytest with last_probe pinning "
    "the span reads (codes spans = nprobe, vector spans <= "
    "survivors' cells).",
)
def q_sim_index_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..plans.ann_index import IvfPqIndex

    e = spread(Catalog(spark, sf_dir).embeddings).select("vec_id", "embedding")
    idx = IvfPqIndex(
        spark, tempfile.mkdtemp(prefix="upmr_ivfpq_"), n_cells=N_CELLS
    )
    idx.build(e)
    queries = [
        (r.vec_id, list(r.embedding))
        for r in e.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    ]
    return idx.search_pq(queries, k=TOP_K, nprobe=N_CELLS, rerank=None)


_KM_K = 4  # clusters for the attested assignment step


@register(
    "q_kmeans_assign",
    oracle=(
        "WITH mx AS (SELECT max(greatest("
        "CAST(list_aggregate(embedding, 'max') AS DOUBLE), "
        "-CAST(list_aggregate(embedding, 'min') AS DOUBLE))) AS gmax "
        "FROM embeddings), "
        "q AS (SELECT vec_id, list_transform(embedding, x -> "
        "CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS BIGINT)) AS code "
        "FROM (SELECT vec_id, embedding, gmax / 127 AS sc "
        "FROM embeddings, mx)), "
        "cr AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster, "
        f"code AS ccode FROM q ORDER BY vec_id LIMIT {_KM_K}), "
        "d AS (SELECT q.vec_id, cr.cluster, "
        "CAST(list_sum(list_transform(list_zip(q.code, cr.ccode), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist "
        "FROM q CROSS JOIN cr), "
        "a AS (SELECT vec_id, cluster, dist, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY dist, cluster) AS rn FROM d) "
        "SELECT cluster, CAST(count(*) AS BIGINT) AS cnt, "
        "CAST(sum(dist) AS BIGINT) AS inertia "
        "FROM a WHERE rn = 1 GROUP BY cluster"
    ),
    doc="EXACT k-means assignment step (the Lloyd inner loop the IVF "
    "index's fit_kmeans runs in numpy — here as pure Catalyst integer "
    "arithmetic so both engines agree bit-for-bit): embeddings are "
    "quantized to int codes under ONE GLOBAL scale (max|x|/127 over "
    "the corpus — per-vector scales would make cross-vector distances "
    "meaningless), centroids are the codes of the 4 smallest vec_ids "
    "(deterministic seeding, same rule as fit_kmeans), every vector "
    "gets argmin squared-L2 over the k centroids with ties to the "
    "lowest cluster index, and the result is per-cluster size + "
    "integer inertia. Plan: the k distance expressions are zip_with/"
    "aggregate codegen against centroid LITERALS (k x dim ints, "
    "driver state like IVF's centroid matrix) — one scan, one hash "
    "agg, NO cross join and NO Python; at 100 TB this is exactly the "
    "assignment job of a distributed Lloyd iteration, and the oracle "
    "proves its semantics the numpy path is trusted to share.",
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    from ..functions.vectors import global_embed_gmax

    gmax = global_embed_gmax(e)
    scale = gmax / 127
    code_expr = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") / F.lit(scale) + F.lit(0.5)).cast(
            "long"
        ),
    )
    codes = e.select("vec_id", code_expr.alias("code"))
    seed_rows = codes.orderBy("vec_id").limit(_KM_K).collect()
    cents = [
        F.array(*[F.lit(int(v)) for v in r["code"]]) for r in seed_rows
    ]
    dists = [
        F.aggregate(
            F.zip_with("code", c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for c in cents
    ]
    scored = codes.select(
        "vec_id", *[d.alias(f"d{i}") for i, d in enumerate(dists)]
    )
    cluster = F.when(
        (F.col("d0") <= F.col("d1"))
        & (F.col("d0") <= F.col("d2"))
        & (F.col("d0") <= F.col("d3")),
        F.lit(0),
    ).when(
        (F.col("d1") <= F.col("d2")) & (F.col("d1") <= F.col("d3")), F.lit(1)
    ).when(F.col("d2") <= F.col("d3"), F.lit(2)).otherwise(F.lit(3))
    return (
        scored.select(
            cluster.alias("cluster"),
            F.least("d0", "d1", "d2", "d3").alias("dist"),
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("dist").cast("bigint").alias("inertia"),
        )
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation diagnostic — how much of each embedding's
# energy lives in a prefix of its dimensions.

_MRL_PREFIX = 16  # the truncation width a serving tier would keep


@register(
    "q_embed_mrl",
    oracle=(
        "WITH mx AS (SELECT max(greatest("
        "CAST(list_aggregate(embedding, 'max') AS DOUBLE), "
        "-CAST(list_aggregate(embedding, 'min') AS DOUBLE))) AS gmax "
        "FROM embeddings), "
        "q AS (SELECT vec_id, list_transform(embedding, x -> "
        "CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS BIGINT)) AS code "
        "FROM (SELECT vec_id, embedding, gmax / 127 AS sc "
        "FROM embeddings, mx)), "
        "d AS (SELECT vec_id, CAST(i AS INTEGER) AS dim, "
        "code[CAST(i AS INTEGER)] * code[CAST(i AS INTEGER)] AS e "
        "FROM q, UNNEST(generate_series(1, len(code), 1)) AS u(i)), "
        "c AS (SELECT vec_id, dim, "
        "sum(e) OVER (PARTITION BY vec_id ORDER BY dim "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
        "sum(e) OVER (PARTITION BY vec_id) AS total FROM d) "
        "SELECT vec_id, "
        "CAST(min(CASE WHEN 10 * cum >= 9 * total THEN dim END) "
        "AS INTEGER) AS dims_90, "
        f"CAST(max(CASE WHEN dim = {_MRL_PREFIX} THEN cum END) * 10000 "
        "// max(total) AS BIGINT) AS energy16_bp "
        "FROM c GROUP BY vec_id"
    ),
    doc="MATRYOSHKA TRUNCATION DIAGNOSTIC (MRL-style serving: keep a "
    "prefix of each embedding's dimensions and re-normalize): per "
    "vector, the smallest prefix length holding >= 90% of squared-L2 "
    "energy, and the energy fraction (basis points) the 16-dim "
    "truncation retains — the two numbers that decide whether a "
    "truncated index tier is safe. All arithmetic is EXACT integers "
    "on the shared global-scale codes (q_kmeans_assign's quantization "
    "rule): energies are code^2, the cumulative sum is a windowed "
    "integer sum (order-defined, so engine-internal float summation "
    "trees can never flip the 90% threshold — the repo's float-"
    "threshold rule), thresholds are integer cross-multiplications, "
    "and the retained fraction is integer DIV. Plan: posexplode + one "
    "window keyed by vec_id + one groupBy — two shuffles on vec_id; "
    "at 100 TB this is the per-vector map-side profile job that sizes "
    "a truncated serving tier before building it.",
)
def q_embed_mrl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = Catalog(spark, sf_dir).embeddings
    from ..functions.vectors import global_embed_gmax

    gmax = global_embed_gmax(e)
    scale = gmax / 127
    codes = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") / F.lit(scale) + F.lit(0.5)
            ).cast("long"),
        ).alias("code"),
    )
    d = codes.select(
        "vec_id", F.posexplode("code").alias("pos", "c")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("int").alias("dim"),
        (F.col("c") * F.col("c")).alias("e"),
    )
    wc = (
        W.partitionBy("vec_id")
        .orderBy("dim")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wt = W.partitionBy("vec_id")
    c = d.select(
        "vec_id",
        "dim",
        F.sum("e").over(wc).alias("cum"),
        F.sum("e").over(wt).alias("total"),
    )
    return c.groupBy("vec_id").agg(
        F.min(
            F.when(10 * F.col("cum") >= 9 * F.col("total"), F.col("dim"))
        )
        .cast("int")
        .alias("dims_90"),
        F.expr(
            f"max(CASE WHEN dim = {_MRL_PREFIX} THEN cum END) * 10000L "
            "DIV max(total)"
        )
        .cast("bigint")
        .alias("energy16_bp"),
    )


# ---------------------------------------------------------------------------
# binary sign-sketch ANN — the 1-bit quantized pre-rank tier.

# 64 dims pack into TWO 32-bit halves held in BIGINTs: a full 64-bit
# pack would need bit 63, where signed overflow semantics differ
# between engines (DuckDB raises, Java wraps). 32 bits per word keeps
# every intermediate exact and identical.
_BIN_DIM = 64
_BIN_HALF = 32


def _sign_word_expr(w: int):
    """BIGINT word w (0 or 1) of the sign sketch: bit i set iff
    embedding[w*32 + i] > 0."""
    return F.expr(
        f"aggregate(sequence(0, {_BIN_HALF - 1}), 0L, (acc, i) -> "
        f"acc + IF(element_at(embedding, {w * _BIN_HALF} + i + 1) > 0D, "
        "shiftleft(1L, i), 0L))"
    )


def binary_sim_search(
    spark: SparkSession,
    e: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    prerank: int = 1 << 30,
) -> DataFrame:
    """Top-k cosine through a BINARY SIGN-SKETCH pre-rank: per query,
    candidates are ordered by Hamming distance between 64-bit sign
    sketches (XOR + popcount — pure codegen integers), the best
    ``prerank`` survive, and the exact cosine re-rank runs only on the
    survivors. ``prerank`` >= corpus keeps every candidate — EXACT."""
    words = e.select(
        "vec_id",
        "embedding",
        _sign_word_expr(0).alias("w0"),
        _sign_word_expr(1).alias("w1"),
    )
    q = words.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    ham = F.expr("bit_count(w0 ^ q0) + bit_count(w1 ^ q1)")
    cand = (
        words.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "embedding", "qe", ham.alias("ham"))
    )
    hw = W.partitionBy("query_id").orderBy("ham", "vec_id")
    kept = cand.withColumn("hrnk", F.row_number().over(hw)).filter(
        F.col("hrnk") <= prerank
    )
    scored = kept.select(
        "query_id",
        "vec_id",
        F.round(cosine_expr(F.col("qe"), F.col("embedding")), 6).alias(
            "cos_sim"
        ),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "cos_sim", "rnk")
    )


@register(
    "q_sim_search_binary",
    oracle=(
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        f"WHERE vec_id < {N_QUERIES}), "
        "scored AS (SELECT q.query_id, e.vec_id, "
        "round(list_cosine_similarity(list_transform(q.qe, x -> CAST(x AS DOUBLE)), "
        "list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos_sim "
        "FROM q JOIN embeddings e ON e.vec_id <> q.query_id) "
        "SELECT query_id, vec_id, cos_sim, CAST(rnk AS INTEGER) AS rnk FROM ("
        "SELECT query_id, vec_id, cos_sim, row_number() OVER ("
        "PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk FROM scored) "
        f"WHERE rnk <= {TOP_K}"
    ),
    doc="ANN through a BINARY SIGN SKETCH (r10) — the 1-bit "
    "quantization tier production vector stores run before PQ/exact "
    "(64 dims -> 64 sign bits in two BIGINT words, 32x smaller than "
    "float32): Hamming pre-rank via XOR + popcount (bit_count — pure "
    "integer codegen, no float math until the re-rank), exact cosine "
    "re-rank on the survivors. Registered in rerank-all config so it "
    "shares q_sim_search's exact oracle (the q_sim_index_pq r9 "
    "precedent: the green row attests the sketch/pack/popcount "
    "plumbing end-to-end); the partial-prerank recall curve is pinned "
    "in tests/test_r10_ops.py — near-orthogonal random vectors are "
    "the sign sketch's WORST case (recall@10 0.88 at prerank=100, "
    "sf0.001), which is exactly why the measured curve, not a prose "
    "claim, is the deliverable. Bits pack as 2x32-bit halves because "
    "bit 63 overflows differently per engine. At 100 TB the sketch "
    "table is corpus/32 bytes, the pre-rank is a map-side integer "
    "scan, and only survivors' full vectors are read — the same "
    "two-tier read shape as the IVF-PQ index.",
)
def q_sim_search_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    return binary_sim_search(spark, e)


# ---------------------------------------------------------------------------
# embedding covariance sufficient statistics — the whitening/PCA prep.

_COV_DIM = 64  # embedding dimensionality (TESTDATA.md)


@register(
    "q_embed_covariance",
    oracle=(
        "WITH mx AS (SELECT max(greatest("
        "CAST(list_aggregate(embedding, 'max') AS DOUBLE), "
        "-CAST(list_aggregate(embedding, 'min') AS DOUBLE))) AS gmax "
        "FROM embeddings), "
        "q AS (SELECT list_transform(embedding, x -> "
        "CAST(floor(CAST(x AS DOUBLE) / sc + 0.5) AS BIGINT)) AS q "
        f"FROM (SELECT embedding, gmax / {_QMAX} AS sc "
        "FROM embeddings, mx)), "
        "p AS (SELECT ii.i AS dim_i, jj.j AS dim_j, q FROM q "
        f"CROSS JOIN (SELECT unnest(range(0, {_COV_DIM})) AS i) ii "
        f"CROSS JOIN (SELECT unnest(range(0, {_COV_DIM})) AS j) jj "
        "WHERE ii.i <= jj.j) "
        "SELECT CAST(dim_i AS INTEGER) AS dim_i, "
        "CAST(dim_j AS INTEGER) AS dim_j, "
        "CAST(sum(q[dim_i + 1] * q[dim_j + 1]) AS BIGINT) AS sum_prod, "
        "CAST(sum(q[dim_i + 1]) AS BIGINT) AS sum_i, "
        "CAST(sum(q[dim_j + 1]) AS BIGINT) AS sum_j, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM p GROUP BY dim_i, dim_j"
    ),
    doc="EMBEDDING COVARIANCE SUFFICIENT STATISTICS — the single-pass "
    "scatter-matrix job behind whitening / PCA / ZCA preprocessing of "
    "an embedding corpus (and the drift monitor comparing snapshot "
    "covariances): for every dimension pair i <= j, the EXACT integer "
    "sufficient statistics (sum q_i*q_j, sum q_i, sum q_j, n) on the "
    "shared global-scale int8 codes (q_embed_pq's quantization — one "
    "bounded 1-row gmax collect), from which any consumer derives the "
    "covariance as (n*S_ij - s_i*s_j) / n^2 WITHOUT this job ever "
    "forming the overflow-prone n*S product. Integer sums are "
    "associative, so Spark's partition-parallel accumulation and "
    "DuckDB's sequential scan cannot diverge — the d*(d+1)/2 = 2080 "
    "output rows hash-match exactly. The 100 TB shape is the textbook "
    "one: mapInPandas computes ONE d x d int64 partial scatter per "
    "PARTITION (numpy q.T @ q over Arrow batches — vectorized, not "
    "per-row), so the shuffle carries only n_partitions * 2080 "
    "partial rows into a final keyed sum; corpus bytes are read once "
    "and never re-shuffled. PCA's eigendecomposition is a driver-side "
    "d x d problem on this output, deliberately out of engine scope.",
)
def q_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).embeddings
    from ..functions.vectors import global_embed_gmax

    gmax = global_embed_gmax(e)
    scale = gmax / _QMAX
    d = _COV_DIM
    iu = np.triu_indices(d)

    def partial_scatter(batches):
        S = np.zeros((d, d), dtype=np.int64)
        s = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.floor(
                np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                / scale
                + 0.5
            ).astype(np.int64)
            S += q.T @ q
            s += q.sum(axis=0)
            n += len(q)
        if n:
            yield pd.DataFrame(
                {
                    "dim_i": iu[0].astype("int32"),
                    "dim_j": iu[1].astype("int32"),
                    "sum_prod": S[iu],
                    "sum_i": s[iu[0]],
                    "sum_j": s[iu[1]],
                    "n": np.full(len(iu[0]), n, dtype=np.int64),
                }
            )

    partials = e.select("embedding").mapInPandas(
        partial_scatter,
        "dim_i int, dim_j int, sum_prod long, sum_i long, sum_j long, "
        "n long",
    )
    return partials.groupBy("dim_i", "dim_j").agg(
        F.sum("sum_prod").cast("bigint").alias("sum_prod"),
        F.sum("sum_i").cast("bigint").alias("sum_i"),
        F.sum("sum_j").cast("bigint").alias("sum_j"),
        F.sum("n").cast("bigint").alias("n"),
    )
