"""Measure exact substring-dedup cost vs corpus size, raw vs hashed.

The claim (operators/dedup.py:repeated_window_summary) is that
stride-1 repeated-window detection is LINEAR in total characters —
one map-side explode, one hash shuffle on the window key, one semi
join — and that the ``hashed=True`` path (8-byte xxhash64 keys
instead of raw 32-char strings) buys a constant-factor shuffle
saving with identical results. This tool measures both directly:
synthetic corpora where 1 doc in 10 carries a globally-shared span
appended at end-of-doc (so repeated windows exist at every scale),
everything else hash-unique text. Two invariants are ASSERTED:
affected docs = count of planted ids exactly, and the raw and hashed
paths return byte-identical summaries (the equivalence the hashed
shuffle shape claims). dup_windows itself grows slowly with n and is
only reported: every planted doc_id ends in digit 1, so ids sharing
longer digit suffixes (…11, …211) extend the shared suffix
"…1 " + SPAN by coincident trailing digits, minting extra distinct
cross-doc windows — a corpus artifact, not a counting bug.

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
SHARED = "the shared training span that repeats across corpora 0123456789"


def synth_corpus(spark: SparkSession, n_docs: int) -> DataFrame:
    """(doc_id, source, text): id%10==1 docs append the constant SHARED
    span; all other token content is hash-unique, so planted docs are
    the only docs with cross-doc repeats (their trailing doc-id digits
    can extend the shared suffix — see module docstring)."""
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


def run(
    spark: SparkSession, n: int, hashed: bool
) -> tuple[float, int, int, list[tuple]]:
    t0 = time.perf_counter()
    rows = repeated_window_summary(
        synth_corpus(spark, n), hashed=hashed
    ).collect()
    dt = time.perf_counter() - t0
    docs = sum(r["docs_affected"] for r in rows)
    wins = sum(r["dup_windows"] for r in rows)
    summary = sorted(
        (r["source"], r["docs_affected"], r["dup_windows"]) for r in rows
    )
    return dt, docs, wins, summary


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [20_000, 80_000]
    spark = get_spark("upmr-scale-substring")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    results: dict[tuple[int, bool], float] = {}
    for n in sizes:
        summaries = {}
        for hashed in (False, True):
            dt, docs, wins, summary = run(spark, n, hashed)
            results[(n, hashed)] = dt
            summaries[hashed] = summary
            label = "hashed" if hashed else "raw   "
            # every id%10==1 doc holds the span; count of such ids in
            # [0, n) is ceil((n-1)/10) = (n+8)//10 (== n//10 only for
            # multiples of 10)
            assert docs == (n + 8) // 10, (docs, n)
            print(
                f"n={n:>9,}  {label}  {dt:7.2f}s   "
                f"affected={docs:,}  dup_windows={wins}"
            )
        # the hashed shuffle shape must change NO result
        assert summaries[False] == summaries[True], "raw != hashed"
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
