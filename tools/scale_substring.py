"""Measure exact substring-dedup cost vs corpus size, raw vs hashed.

The claim (operators/dedup.py:repeated_window_summary) is that
stride-1 repeated-window detection is LINEAR in total characters —
one map-side explode, one hash shuffle on the window key, one semi
join — and that the ``hashed=True`` path (8-byte xxhash64 keys
instead of raw 32-char strings) buys a constant-factor shuffle
saving with identical results. This tool measures both directly:
synthetic corpora where 1 doc in 10 carries a globally-shared 64-char
span (so repeated windows exist at every scale and the result is
verifiable: exactly 33 distinct duplicated windows, n/10 affected
docs), everything else hash-unique text.

Corpus generation is pure Catalyst expressions (no driver-side text
building), so generation cost is negligible next to the
explode/shuffle pass being measured.

Usage: python tools/scale_substring.py [n1 n2 ...]  (default 20000 80000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.operators.dedup import (  # noqa: E402
    repeated_window_summary,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

N_TOKENS = 40
VOCAB = 100_000
# 64 chars -> 64 - 32 + 1 = 33 distinct repeated windows, always
SHARED = "the shared training span that repeats across corpora 0123456789"


def synth_corpus(spark: SparkSession, n_docs: int) -> DataFrame:
    """(doc_id, source, text): id%10==1 docs embed the constant SHARED
    span mid-document; all other token content is hash-unique, so the
    planted span is the only cross-doc repeat."""
    df = spark.range(n_docs).repartition(
        spark.sparkContext.defaultParallelism
    )
    doc_id = F.col("id")
    words = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_TOKENS - 1)),
            lambda i: F.concat(
                F.lit("tok"),
                F.pmod(F.xxhash64(doc_id * N_TOKENS + i), F.lit(VOCAB)),
                F.lit("x"),
                doc_id,
            ),
        ),
        " ",
    )
    text = F.when(
        doc_id % 10 == 1, F.concat(words, F.lit(" " + SHARED))
    ).otherwise(words)
    return df.select(
        doc_id.alias("doc_id"),
        F.concat(F.lit("src"), doc_id % 4).alias("source"),
        text.alias("text"),
    )


def run(spark: SparkSession, n: int, hashed: bool) -> tuple[float, int, int]:
    t0 = time.perf_counter()
    rows = repeated_window_summary(
        synth_corpus(spark, n), hashed=hashed
    ).collect()
    dt = time.perf_counter() - t0
    docs = sum(r["docs_affected"] for r in rows)
    wins = sum(r["dup_windows"] for r in rows)
    return dt, docs, wins


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [20_000, 80_000]
    spark = get_spark("upmr-scale-substring")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    results: dict[tuple[int, bool], float] = {}
    for n in sizes:
        for hashed in (False, True):
            dt, docs, wins = run(spark, n, hashed)
            results[(n, hashed)] = dt
            label = "hashed" if hashed else "raw   "
            # every id%10==1 doc holds the span; per-source sums give
            # the global counts because each doc has one source
            assert docs == n // 10, (docs, n)
            print(
                f"n={n:>9,}  {label}  {dt:7.2f}s   "
                f"affected={docs:,}  dup_windows={wins}"
            )
    if len(sizes) >= 2:
        a, b = sizes[0], sizes[-1]
        for hashed in (False, True):
            ratio = results[(b, hashed)] / results[(a, hashed)]
            label = "hashed" if hashed else "raw"
            print(
                f"{label}: {b//a}x corpus -> {ratio:.1f}x time "
                f"({'sub-quadratic OK' if ratio < (b/a)**2 * 0.5 else 'CHECK'})"
            )


if __name__ == "__main__":
    main()
