"""Measure ANN search cost + recall vs corpus size.

The similarity family's claim (operators/similarity.py): brute-force
cosine top-k is a linear scan (the right plan at small-to-mid corpus),
and the two bucketed paths (random-hyperplane LSH, IVF) cut per-query
cost to a corpus fraction — LSH ~ T/2^P, IVF ~ nprobe/cells — at a
measured recall. This tool measures all three on synthetic corpora
(deterministic pseudo-random embeddings via xxhash64 — no RNG state,
no driver-side generation) and prints one JSON line per (n, method):
wall seconds + recall@10 against the brute-force ground truth.

Usage: python tools/scale_ann.py [n1 n2 ...]   (default 4000 32000 128000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

import numpy as np  # noqa: E402
from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.functions.vectors import (  # noqa: E402
    cosine_expr,
)
from updatable_persistent_map_reduce_spark.operators.similarity import (  # noqa: E402
    N_PROBE,
    fit_kmeans,
    lsh_bucket_udf,
    make_assign_udf,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

DIM = 64
TOP_K = 10
N_QUERIES = 5


def synth_embeddings(spark: SparkSession, n: int) -> DataFrame:
    """(vec_id, embedding array<float>): entries ~U(-1,1) from
    xxhash64(vec_id*DIM + i) — pure codegen, reproducible."""
    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda i: (
                    (
                        F.pmod(
                            F.xxhash64(F.col("id") * DIM + i), F.lit(2001)
                        )
                        - 1000
                    )
                    / 1000.0
                ).cast("float"),
            ).alias("embedding"),
        )
    )


def topk(scored: DataFrame) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id")
    )


def brute(spark: SparkSession, e: DataFrame) -> DataFrame:
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = e.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("qe"), F.col("embedding")).alias("cos_sim"),
    )
    return topk(scored)


def lsh(spark: SparkSession, e: DataFrame) -> DataFrame:
    bucket_ids = lsh_bucket_udf(spark, dim=DIM)
    base = e.select(
        "vec_id", "embedding", F.explode(bucket_ids("embedding")).alias("bucket")
    )
    q = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        "bucket",
    )
    cand = (
        base.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("qe"), F.col("embedding")).alias("cos_sim"),
    )
    return topk(scored)


def ivf(spark: SparkSession, e: DataFrame) -> DataFrame:
    centroids = fit_kmeans(spark, e)
    listed = e.select(
        "vec_id",
        "embedding",
        make_assign_udf(spark, centroids)("embedding").alias("cell"),
    )
    q_rows = (
        e.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    )
    qmat = np.array([r.embedding for r in q_rows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    probe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :N_PROBE]
    probes = spark.createDataFrame(
        [
            (int(r.vec_id), [float(x) for x in r.embedding], int(c))
            for r, cells in zip(q_rows, probe)
            for c in cells
        ],
        "query_id long, qe array<float>, cell int",
    )
    cand = listed.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("qe"), F.col("embedding")).alias("cos_sim"),
    )
    return topk(scored)


def binary(spark: SparkSession, e: DataFrame) -> DataFrame:
    # sign-sketch Hamming pre-rank (operators/similarity.py, r10) at a
    # fixed candidate budget: per-query cost ~ prerank/corpus of the
    # exact scan after an integer-only popcount pass over the sketches
    from updatable_persistent_map_reduce_spark.operators.similarity import (
        binary_sim_search,
    )

    return binary_sim_search(spark, e, prerank=200)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [4000, 32000, 128000]
    spark = get_spark("upmr-scale-ann")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for n in sizes:
        e = synth_embeddings(spark, n).persist()
        e.count()
        truth: dict[int, set] | None = None
        for name, fn in (
            ("brute", brute), ("lsh", lsh), ("ivf", ivf), ("binary", binary),
        ):
            t0 = time.perf_counter()
            rows = fn(spark, e).collect()
            dt = round(time.perf_counter() - t0, 3)
            got: dict[int, set] = {}
            for r in rows:
                got.setdefault(r.query_id, set()).add(r.vec_id)
            if name == "brute":
                truth = got
                recall = 1.0
            else:
                assert truth is not None
                hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
                recall = round(hits / sum(len(t) for t in truth.values()), 3)
            print(
                json.dumps(
                    {"n": n, "method": name, "sec": dt, "recall_at_10": recall}
                )
            )
        e.unpersist()


if __name__ == "__main__":
    main()
