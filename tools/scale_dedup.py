"""Measure near-dup dedup cost vs corpus size.

The MinHash-LSH pipeline's claim (operators/dedup.py:near_dup_pairs)
is that cost scales with corpus size × near-dup density — the banding
shuffle carries only (doc_id, band, sig) and pair generation is
per-bucket — never corpus². This tool measures it directly: synthetic
corpora where exactly 1 doc in 10 is a near-copy (one token mutated)
of its group's base doc, so the true pair count is n/10 and the
verified-pair Jaccard is ~0.9.

The corpus is generated entirely with Catalyst expressions (xxhash64
word selection over spark.range — no driver-side text building), so
generation cost is negligible next to the Arrow shingle/minhash pass
being measured.

Usage: python tools/scale_dedup.py [n1 n2 ...]   (default 50000 400000)
"""

from __future__ import annotations

import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.operators.dedup import (  # noqa: E402
    near_dup_pairs,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

N_TOKENS = 50
VOCAB = 1000


def synth_corpus(spark: SparkSession, n_docs: int) -> DataFrame:
    """(doc_id, text): doc ids 0..n-1 in groups of 10; id%10==1 docs
    are near-copies of the group base (token at id%N_TOKENS mutated),
    everything else is hash-unique text. Pure codegen expressions."""
    df = spark.range(n_docs).repartition(
        spark.sparkContext.defaultParallelism
    )
    doc_id = F.col("id")
    is_dup = doc_id % 10 == 1
    base = F.when(is_dup, doc_id - 1).otherwise(doc_id)
    mut_pos = F.pmod(doc_id, F.lit(N_TOKENS))
    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(base * N_TOKENS + i), F.lit(VOCAB))
    )
    tokens = F.transform(
        F.sequence(F.lit(0), F.lit(N_TOKENS - 1)),
        lambda i: F.when(
            is_dup & (i == mut_pos), F.concat(F.lit("m"), doc_id)
        ).otherwise(word(i)),
    )
    return df.select(
        doc_id.alias("doc_id"), F.array_join(tokens, " ").alias("text")
    )


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [50_000, 400_000]
    spark = get_spark("upmr-scale-dedup")
    # session warmers (JVM codegen, Arrow worker pool)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    @F.pandas_udf("long")
    def _w(x: pd.Series) -> pd.Series:
        return x

    spark.range(10_000).select(F.sum(_w("id"))).collect()

    results = []
    for n in sizes:
        corpus = synth_corpus(spark, n)
        t0 = time.perf_counter()
        pairs = near_dup_pairs(corpus)
        n_pairs = pairs.count()
        dt = time.perf_counter() - t0
        results.append((n, dt, n_pairs))
        print(
            f"n_docs={n:>9,}  wall={dt:6.1f}s  verified_pairs={n_pairs:,}"
            f"  (expected ~{n // 10:,})",
            flush=True,
        )
    if len(results) >= 2:
        (n0, t0_, p0), (n1, t1_, p1) = results[0], results[-1]
        print(
            f"\n{n1 / n0:.0f}x corpus -> {t1_ / t0_:.2f}x wall, "
            f"{p1 / max(p0, 1):.2f}x pairs "
            f"(quadratic candidate generation would be {(n1 / n0) ** 2:.0f}x)"
        )


if __name__ == "__main__":
    main()
