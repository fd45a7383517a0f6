"""Measure the takedown paths' cost claims vs corpus size.

The r11 delete legs document two different cost shapes:

- ``NearDupIndex.delete`` is MERGE-ON-READ: it writes O(victims x
  bands) tombstone rows and rewrites NOTHING — so delete wall time
  must stay FLAT while the corpus grows (asserted < 2.0x over the
  octave range), and a post-delete probe must not widen its span
  reads (the broadcast tombstone anti-join is the only added cost;
  span-read counts asserted identical before/after).
- ``InvertedIndex.delete`` CoW-rewrites the victims' doc-index spans
  (the postings tier is still MoR — one dead-sentinel commit). With
  the span count FIXED, a span's data grows with the corpus, so the
  rewrite grows linearly — that is the documented behavior, not a
  defect; the documented LEVER is n_doc_spans tracking corpus size
  (exactly the q_store_rescale contract). Measured here both ways:
  fixed spans (reported, expected to grow) and corpus-scaled spans
  (asserted < 2.5x over a 4x corpus: the rewrite unit is then
  constant rows and the residual growth is Spark job overhead +
  manifest size, not data).

Usage: python tools/scale_takedown.py [n1 n2 ...]  (default 20000 80000)
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
from updatable_persistent_map_reduce_spark.plans.text_index import (  # noqa: E402
    InvertedIndex,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

N_TOKENS = 30
VICTIMS = 20  # deleted per octave, fixed


def corpus_text(gid):
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
        .select(
            F.col("id").alias("doc_id"),
            corpus_text(F.col("id")).alias("text"),
        )
    )


def victims(spark: SparkSession) -> DataFrame:
    """VICTIMS docs spread across the id space's low end (ids k*37 —
    present at every octave), with their as-indexed text."""
    gid = F.col("id") * 37
    return spark.range(VICTIMS).select(
        gid.alias("doc_id"), corpus_text(gid).alias("text")
    )


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [20_000, 80_000]
    spark = get_spark("upmr-scale-takedown")
    # warm the whole path once, discarded
    wtmp = tempfile.mkdtemp(prefix="upmr_td_w_")
    try:
        w = NearDupIndex(spark, wtmp, n_spans=64, n_doc_spans=16)
        w.build(corpus(spark, 2_000))
        w.delete(victims(spark))
    finally:
        shutil.rmtree(wtmp, ignore_errors=True)

    vic = victims(spark).cache()
    vic.count()

    # ---- NearDupIndex.delete: MoR, must be flat ----------------------
    nd_del: dict[int, float] = {}
    for n in sizes:
        tmp = tempfile.mkdtemp(prefix="upmr_td_nd_")
        try:
            idx = NearDupIndex(spark, tmp, n_spans=256, n_doc_spans=64)
            idx.build(corpus(spark, n))
            probe = vic.select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
            )
            idx.probe(probe).collect()
            pre_reads = dict(idx.last_probe)
            t0 = time.perf_counter()
            idx.delete(vic)
            nd_del[n] = time.perf_counter() - t0
            got = idx.probe(probe).collect()
            post_reads = dict(idx.last_probe)
            assert not got, f"victims still probed at n={n}: {got[:3]}"
            # band reads are a function of the BATCH (identical before
            # and after); shingle reads may only SHRINK — deleting the
            # victims removes their candidate pairs, and with them the
            # need to read their verification spans
            assert (
                post_reads["band_spans_read"]
                == pre_reads["band_spans_read"]
            ), (pre_reads, post_reads)
            assert (
                post_reads["shingle_spans_read"]
                <= pre_reads["shingle_spans_read"]
            ), (pre_reads, post_reads)
            print(
                f"n={n:>9,}  neardup delete={nd_del[n]:6.2f}s  "
                f"probe reads unchanged {post_reads}"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    growth = nd_del[sizes[-1]] / nd_del[sizes[0]]
    octaves = sizes[-1] / sizes[0]
    print(
        f"FINAL neardup MoR delete growth over {octaves:.0f}x corpus: "
        f"{growth:4.2f}x (flat = O(victims x bands))"
    )
    assert growth < 2.0, (
        f"MoR delete grew {growth:.2f}x over {octaves:.0f}x corpus"
    )

    # ---- InvertedIndex.delete: CoW doc spans — fixed vs scaled -------
    for label, spans_for in (
        ("fixed spans (16)", lambda n: 16),
        ("scaled spans (n/1250)", lambda n: max(16, n // 1250)),
    ):
        ti_del: dict[int, float] = {}
        for n in sizes:
            tmp = tempfile.mkdtemp(prefix="upmr_td_ti_")
            try:
                idx = InvertedIndex(
                    spark,
                    tmp,
                    n_spans=64,
                    n_doc_spans=spans_for(n),
                    auto_compact_files_per_span=None,
                )
                idx.build(corpus(spark, n))
                t0 = time.perf_counter()
                idx.delete(vic.select("doc_id"))
                ti_del[n] = time.perf_counter() - t0
                assert idx.stats()["n_docs"] == n - VICTIMS
                print(
                    f"n={n:>9,}  text delete [{label}]="
                    f"{ti_del[n]:6.2f}s  (doc spans: {spans_for(n)})"
                )
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        growth = ti_del[sizes[-1]] / ti_del[sizes[0]]
        print(
            f"FINAL text CoW delete growth [{label}] over "
            f"{octaves:.0f}x corpus: {growth:4.2f}x"
        )
        if label.startswith("scaled"):
            assert growth < 2.5, (
                f"span-scaled CoW delete grew {growth:.2f}x — the "
                "n_doc_spans lever is not holding the rewrite unit "
                "constant"
            )


if __name__ == "__main__":
    main()
