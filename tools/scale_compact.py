"""Measure table-maintenance payoff: read latency before/after compaction.

Append-heavy ingest is the engine's cheapest write path (insert-only
batches append one file per dirty pair — no copy-on-write), but it
accumulates small files: after N batches a span holds N slivers, and
every read pays N footer-opens per span. ``compact_map()`` folds each
span back to one file per span (crash-safe, same manifest-swap commit
as a batch), ``compact_index()`` drops superseded doc locations, and
``vacuum()`` reclaims unreferenced bytes.

This tool ingests ``n_batches`` insert-only batches, measures the
store's file counts and full-view read latency, compacts, and
re-measures. Usage:

  python tools/scale_compact.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.plans import MapReduceView  # noqa: E402
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402


def map_scan_latency(view, spark, reps: int = 3) -> float:
    """Full map-table scan — the read class compaction accelerates
    (maintenance re-aggregation and rebuilds read map_results; the
    doc-index probe of every batch reads doc_index slivers)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        view._map_t.read(spark).count()  # noqa: SLF001
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark("upmr-scale-compact")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    view = MapReduceView(
        spark,
        tempfile.mkdtemp(prefix="upmr_compact_"),
        id_col="doc_id",
        group_cols=["g"],
        agg_exprs=[
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("v_sum"),
        ],
        n_key_spans=8,
        n_doc_spans=8,
        # disable the engine's self-compaction to expose the raw
        # sliver-accumulation degradation this tool measures
        auto_compact_files_per_span=None,
    )
    for b in range(n_batches):
        batch = spark.range(b * rows, (b + 1) * rows).select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            F.concat(F.lit("g"), F.pmod("id", 20)).alias("g"),
            F.col("id").alias("v"),
        )
        view.execute(batch)

    def extra_batch(b):
        return spark.range(b * rows, (b + 1) * rows).select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
            F.concat(F.lit("g"), F.pmod("id", 20)).alias("g"),
            F.col("id").alias("v"),
        )

    before_stats = view.stats()
    before_files = {
        t: s["files"]
        for t, s in before_stats.items()
        if isinstance(s, dict) and "files" in s
    }
    t_before = map_scan_latency(view, spark)
    t0 = time.perf_counter()
    view.execute(extra_batch(n_batches))
    t_batch_before = time.perf_counter() - t0
    truth = {r["g"]: (r["cnt"], r["v_sum"]) for r in view.final_df().collect()}

    t0 = time.perf_counter()
    folded = view.compact_map()
    view.compact_index()
    reclaimed = view.vacuum()
    t_maint = time.perf_counter() - t0

    after_stats = view.stats()
    after_files = {
        t: s["files"]
        for t, s in after_stats.items()
        if isinstance(s, dict) and "files" in s
    }
    t_after = map_scan_latency(view, spark)
    t0 = time.perf_counter()
    view.execute(extra_batch(n_batches + 1))
    t_batch_after = time.perf_counter() - t0
    after = {r["g"]: (r["cnt"], r["v_sum"]) for r in view.final_df().collect()}
    # doc ids never overlap across batches, so the grand total counts
    # every ingested row — compaction must not lose or duplicate any
    assert sum(c for c, _ in after.values()) == (n_batches + 2) * rows, after

    print(f"batches={n_batches} rows/batch={rows}")
    print(f"files before: {before_files}")
    print(f"files after:  {after_files}  (folded {folded}, vacuumed {reclaimed})")
    print(
        f"map-table scan: {t_before:.2f}s -> {t_after:.2f}s "
        f"({t_before / t_after:.1f}x); "
        f"insert batch: {t_batch_before:.2f}s -> {t_batch_after:.2f}s; "
        f"maintenance cost {t_maint:.1f}s"
    )


if __name__ == "__main__":
    main()
