"""Measure the persisted MinHash band index's probe cost vs corpus
size — the claim that makes it an INDEX.

plans/neardup_index.py argues a batch probe costs O(batch + matched
candidates), not O(corpus): candidate generation reads only the
batch's band signatures' spans (manifest span pruning), and exact
verification reads only the candidates' shingle spans. This tool
builds the index at growing corpus sizes and probes the SAME
fixed-size batch against each, asserting:

1. planted recall 100% at every corpus size — each batch doc has one
   planted near-dup in the corpus (same text + one appended token,
   J ~ 0.97 at these lengths) and the probe must find it;
2. probe span reads are a function of the BATCH, not the corpus: the
   band-span and shingle-span read counts are asserted IDENTICAL
   across every corpus octave (same fixed batch -> same signature
   spans -> same candidate doc spans), and small fractions of the
   span space (<= batch x bands of n_spans; <= candidate count of
   n_doc_spans);
3. wall-clock is REPORTED but not asserted: at locally-feasible
   corpus sizes both build and probe are dominated by fixed Spark
   job/commit overhead (~5-8 s), which would make any timing ratio a
   measurement of noise, not of the index. The span-read counts are
   the load-bearing evidence — they are what scales the probe's I/O
   at 100 TB, where per-span bytes dwarf job overhead.

Corpus text is hash-unique tokens (no accidental near-dups);
generation is pure Catalyst.

Usage: python tools/scale_neardup_index.py [n1 n2 ...] (default 20k 40k 80k)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.plans.neardup_index import (  # noqa: E402
    NearDupIndex,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

N_TOKENS = 30
BATCH = 20  # probed batch size, fixed across octaves


def corpus_text(gid):
    """Deterministic hash-unique token text for generator id ``gid``."""
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_TOKENS - 1)),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(gid * 131 + i), F.lit(10**9))
            ),
        ),
        " ",
    )


def corpus(spark: SparkSession, n: int) -> DataFrame:
    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("id").alias("doc_id"), corpus_text(F.col("id")).alias("text"))
    )


def probe_batch(spark: SparkSession, n: int) -> DataFrame:
    """BATCH docs, each a near-dup of corpus doc k*37 (same tokens +
    one extra token: J = 28/32 = 0.875 on 3-shingles, comfortably
    over the 0.5 threshold). Batch ids live far above the corpus."""
    gid = F.col("id") * 37
    return (
        spark.range(BATCH)
        .select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat(corpus_text(gid), F.lit(" extra")).alias("text"),
            gid.alias("expect_doc"),
        )
    )


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [20_000, 40_000, 80_000]
    spark = get_spark("upmr-scale-ndi")
    # Warm up the WHOLE path (JVM, Arrow serde, first parquet writes)
    # with a discarded build+probe: without this the first measured
    # build eats ~15s of one-time cost and 'build time' appears to
    # DECREASE with corpus size.
    wtmp = tempfile.mkdtemp(prefix="upmr_ndi_w_")
    try:
        widx = NearDupIndex(spark, wtmp, n_spans=1024, n_doc_spans=64)
        widx.build(corpus(spark, 2_000))
        widx.probe(probe_batch(spark, 2_000).select("doc_id", "text")).collect()
    finally:
        shutil.rmtree(wtmp, ignore_errors=True)

    builds: dict[int, float] = {}
    probes: dict[int, float] = {}
    reads: dict[int, tuple[int, int]] = {}
    for n in sizes:
        tmp = tempfile.mkdtemp(prefix="upmr_ndi_s_")
        try:
            # wide span spaces so the batch's <= BATCH*16 signature
            # spans and the candidates' doc spans are visibly small
            # fractions of the table
            idx = NearDupIndex(
                spark, tmp, n_perm=16, n_bands=16,
                n_spans=1024, n_doc_spans=512,
            )
            t0 = time.perf_counter()
            idx.build(corpus(spark, n))
            builds[n] = time.perf_counter() - t0
            b = probe_batch(spark, n).cache()
            expect = {
                (r.doc_id, r.expect_doc)
                for r in b.select("doc_id", "expect_doc").collect()
            }
            t0 = time.perf_counter()
            hits = idx.probe(b.select("doc_id", "text")).collect()
            probes[n] = time.perf_counter() - t0
            got = {(r.doc_a, r.doc_b) for r in hits}
            missing = expect - got
            assert not missing, f"planted pairs missed at n={n}: {missing}"
            p = idx.last_probe
            assert p["band_spans_read"] <= min(BATCH * 16, p["band_spans_total"])
            reads[n] = (p["band_spans_read"], p["shingle_spans_read"])
            b.unpersist()
            print(
                f"n={n:>9,}  build={builds[n]:6.1f}s  probe={probes[n]:5.2f}s  "
                f"band_spans={p['band_spans_read']}/{p['band_spans_total']}  "
                f"shingle_spans={p['shingle_spans_read']}/"
                f"{p['shingle_spans_total']}  hits={len(got)}"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    if len(sizes) >= 2:
        vals = {reads[n] for n in sizes}
        assert len(vals) == 1, (
            f"probe span reads varied with corpus size: {reads} — "
            "they must be a function of the batch alone"
        )
        br, sr = reads[sizes[0]]
        print(
            f"{sizes[-1] // sizes[0]}x corpus: probe reads pinned at "
            f"{br}/1024 band spans + {sr}/512 shingle spans at every "
            "size — probe I/O is batch-shaped, not corpus-shaped "
            "(times above are fixed job overhead at these sizes)"
        )


if __name__ == "__main__":
    main()
