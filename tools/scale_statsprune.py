"""Measure manifest stat pruning: files read proportional to range width.

The store's second pruning axis (plans/store.py ``stat_cols`` /
``read(where=...)``): per-file min/max bounds captured once from
parquet footers at WRITE time ride in the manifest, so resolving a
range predicate to a file list at read time opens ZERO footers and
lists nothing — pure driver-side arithmetic over the manifest, the
same contract as Iceberg's manifest-level skipping. Combined with the
``write_data(sort_cols, max_records_per_file)`` sort-order layout,
each file covers a contiguous key run and the selected-file count
tracks the range's selectivity.

This tool writes one spanned fact table sort-clustered on a value
column, then sweeps range widths (1%, 10%, 50%, 100%) and reports for
each: files selected / total, manifest-resolution time (driver-side,
no Spark job), and the timed read+aggregate over the pruned file set.
The claim being measured: selected files scale with selectivity, and
resolution cost is O(manifest), independent of data size.

Usage: python tools/scale_statsprune.py [n_rows]   (default 20e6)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.plans.store import (  # noqa: E402
    ManifestTable,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

N_SPANS = 16
FILES_PER_SPAN = 8


def main() -> None:
    n_rows = int(float(sys.argv[1])) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("upmr-scale-statsprune")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = tempfile.mkdtemp(prefix="upmr_statsprune_")
    t = ManifestTable(os.path.join(base, "t"), "span", stat_cols=("v",))
    fact = spark.range(n_rows).select(
        (F.col("id") % N_SPANS).cast("int").alias("span"),
        # v uniform over [0, n_rows): the range-predicate column
        F.col("id").alias("v"),
        (F.col("id") % 97).alias("payload"),
    )
    t0 = time.perf_counter()
    t.commit(
        replace=t.write_data(
            fact,
            sort_cols=["v"],
            max_records_per_file=n_rows // (N_SPANS * FILES_PER_SPAN),
        )
    )
    n_total = len(t.select_files())
    print(
        f"wrote {n_rows:,} rows as {n_total} files "
        f"({N_SPANS} spans, sort-clustered on v) in "
        f"{time.perf_counter() - t0:.1f}s\n",
        flush=True,
    )

    for pct in (1, 10, 50, 100):
        lo, hi = 0, max(1, n_rows * pct // 100 - 1)
        r0 = time.perf_counter()
        files = t.select_files(where=("v", lo, hi))
        resolve_ms = (time.perf_counter() - r0) * 1000
        best = float("inf")
        rows = 0
        for _ in range(3):
            s0 = time.perf_counter()
            rows = (
                t.read(spark, where=("v", lo, hi))
                .filter(F.col("v").between(lo, hi))
                .agg(F.count(F.lit(1)), F.sum("payload"))
                .collect()[0][0]
            )
            best = min(best, time.perf_counter() - s0)
        print(
            f"range {pct:>3}%: {len(files):>3}/{n_total} files, "
            f"resolved in {resolve_ms:6.2f} ms (no job, no footers), "
            f"read+agg {best:5.2f}s ({rows:,} rows)",
            flush=True,
        )

    print(
        "\nselected files track selectivity (1% of the range -> ~1/"
        f"{FILES_PER_SPAN} of each span's files or less) and resolution "
        "is manifest-only driver math. Locally a warm page cache "
        "flattens the read-time curve; on object storage scan cost is "
        "proportional to files opened, so the pruned read IS the "
        "fraction. The residual filter stays on the scan (PushedFilters) "
        "— pruning shrinks the file set, never the answer."
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
