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

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr, dot_expr
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
    "per-partition top-k via window. The ANN baseline.",
)
def q_sim_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spread(Catalog(spark, sf_dir).embeddings)
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
    dim = 64

    def bucket_for_table(emb, t: int):
        bits = []
        for p in range(N_PLANES):
            plane = F.array(
                *[F.lit(_plane_coeff(t, p, d)) for d in range(dim)]
            )
            bits.append(
                F.when(dot_expr(emb, plane) >= 0, F.lit(1 << p)).otherwise(
                    F.lit(0)
                )
            )
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out + F.lit(t * (1 << N_PLANES))  # disjoint id space per table

    buckets = F.array(
        *[bucket_for_table(F.col("embedding"), t) for t in range(N_TABLES)]
    )
    base = e.select(
        "vec_id", "embedding", F.explode(buckets).alias("bucket")
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
