"""Measure the epoch-shuffle WRITER form and prove it reproduces the
registered query's training order.

q_epoch_shuffle's docstring promises that at 100 TB the physical form
is not a row_number window at all: repartitionByRange on (epoch,
shard, hv) + sortWithinPartitions + write.partitionBy(epoch, shard)
emits ordered training-data files per (epoch, shard) — the position
of a doc is its offset in the shard's file sequence, no global
numbering pass. This tool runs THAT form (via the shared
epoch_hash_frame generator, derived shard count) and asserts:

1. ORDER EQUIVALENCE — for every (epoch, shard), reading the shard's
   part-files in task order (range partitioning makes file order =
   key order) yields exactly the window form's (hv, doc_id) sequence:
   membership identical, order identical. The writer IS the query.
2. SHARD SCALING — the derived shard count doubles as the corpus
   doubles past each 2x target boundary (2^ceil(log2(n/250))), so the
   largest per-task sort stays ~bounded; the r7 compile-time 8 pinned
   one task at corpus/8 rows forever.
3. near-linear wall-clock across octaves (reported; asserted loosely
   at < 2.5x per 2x corpus, leaving headroom for fixed job overhead).

Corpus is synthetic spark.range ids — the operator only consumes
doc_id, so generation is free and the shuffle/sort/write path is the
entire measurement.

Usage: python tools/scale_shuffle.py [n1 n2 ...]  (default 250k 500k 1M)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.operators.pipeline import (  # noqa: E402
    _SHUF_TARGET,
    epoch_hash_frame,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

N_EPOCHS = 2


def write_ordered(spark: SparkSession, n_docs: int, path: str) -> float:
    """The writer form: range-partition by (epoch, shard, hv) so each
    task holds a contiguous key range, sort within tasks, write
    hive-partitioned by (epoch, shard). Returns wall seconds."""
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    h = epoch_hash_frame(d, N_EPOCHS)
    n_parts = spark.sparkContext.defaultParallelism * 2
    t0 = time.perf_counter()
    (
        h.repartitionByRange(n_parts, "epoch", "shard", "hv")
        .sortWithinPartitions("epoch", "shard", "hv", "doc_id")
        .select("epoch", "shard", "hv", "doc_id")
        .write.mode("overwrite")
        .partitionBy("epoch", "shard")
        .parquet(path)
    )
    return time.perf_counter() - t0


def check_order_equivalence(
    spark: SparkSession, n_docs: int, path: str
) -> int:
    """Assert the written files reproduce the window form exactly for
    every (epoch, shard); returns the derived shard count."""
    from pyspark.sql import Window as W

    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    h = epoch_hash_frame(d, N_EPOCHS)
    w = W.partitionBy("epoch", "shard").orderBy("hv", "doc_id")
    window_form = {
        (r["epoch"], r["shard"]): None
        for r in h.select("epoch", "shard").distinct().collect()
    }
    ordered = (
        h.select(
            "epoch",
            "shard",
            F.row_number().over(w).alias("pos"),
            "hv",
            "doc_id",
        )
        .groupBy("epoch", "shard")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "hv", "doc_id"))
            ).alias("seq")
        )
        .collect()
    )
    for r in ordered:
        window_form[(r["epoch"], r["shard"])] = [
            (s["hv"], s["doc_id"]) for s in r["seq"]
        ]
    shards = {k[1] for k in window_form}
    for epoch in range(N_EPOCHS):
        for shard in sorted(shards):
            files = sorted(
                glob.glob(
                    os.path.join(
                        path, f"epoch={epoch}", f"shard={shard}", "*.parquet"
                    )
                )
            )
            seq: list[tuple[int, int]] = []
            for f in files:
                part = spark.read.parquet(f).select("hv", "doc_id").collect()
                seq.extend((r["hv"], r["doc_id"]) for r in part)
            want = window_form[(epoch, shard)]
            assert seq == want, (
                f"writer order != window order at epoch={epoch} "
                f"shard={shard}: {len(seq)} vs {len(want)} rows, first "
                f"divergence {next((i for i, (a, b) in enumerate(zip(seq, want)) if a != b), None)}"
            )
    return len(shards)


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [
        250_000,
        500_000,
        1_000_000,
    ]
    spark = get_spark("upmr-scale-shuffle")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    # order equivalence at a small corpus (exhaustive file readback)
    tmp = tempfile.mkdtemp(prefix="upmr_shuf_")
    try:
        small_n = 4_000
        write_ordered(spark, small_n, os.path.join(tmp, "small"))
        n_shards = check_order_equivalence(
            spark, small_n, os.path.join(tmp, "small")
        )
        print(
            f"n={small_n:>10,}  writer files == window order for all "
            f"{N_EPOCHS}x{n_shards} (epoch, shard) groups — "
            "order equivalence executed OK"
        )

        times: dict[int, float] = {}
        for n in sizes:
            dt = write_ordered(spark, n, os.path.join(tmp, str(n)))
            # derived shard count from the written layout
            shard_dirs = len(
                glob.glob(os.path.join(tmp, str(n), "epoch=0", "shard=*"))
            )
            import math

            expect = max(
                1, 2 ** math.ceil(math.log2(n / _SHUF_TARGET))
            )
            assert shard_dirs == expect, (n, shard_dirs, expect)
            times[n] = dt
            print(
                f"n={n:>10,}  shards={shard_dirs:>6,}  "
                f"write={dt:6.1f}s  (~{n // shard_dirs:,} docs/shard)"
            )
        if len(sizes) >= 2:
            a, b = sizes[0], sizes[-1]
            ratio = times[b] / times[a]
            per_oct = ratio ** (1 / max(1, (b // a).bit_length() - 1))
            print(
                f"{b // a}x corpus -> {ratio:.1f}x wall "
                f"({per_oct:.2f}x per 2x octave; "
                f"{'near-linear OK' if per_oct < 2.5 else 'CHECK'})"
            )
            assert per_oct < 2.5, f"super-linear writer: {per_oct:.2f}x/octave"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
