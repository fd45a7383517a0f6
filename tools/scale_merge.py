"""Measure MERGE cost vs touched-span fraction: O(touched), not O(table).

The store's MERGE (plans/store.py ManifestTable.merge) is span-granular
copy-on-write: only the spans the source names are read, diffed, and
rewritten; every other span's files carry into the new snapshot
untouched. The claim that matters at 100 TB: merge wall time tracks the
TOUCHED fraction of the table, not the table size — a 1%-of-spans
update against a huge table costs ~1% of a full rewrite.

This tool builds one spanned fact table, then times merges whose
sources update a single key in 1, 4, 16, and 64 of the 64 spans
(identical per-span work, growing span footprints) plus a full-table
rewrite baseline. Expected: wall time grows with the touched-span
count and the 1-span merge sits far under the full rewrite.

Usage: python tools/scale_merge.py [n_rows]   (default 8e6)
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

N_SPANS = 64


def main() -> None:
    n_rows = int(float(sys.argv[1])) if len(sys.argv) > 1 else 8_000_000
    spark = get_spark("upmr-scale-merge")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    base = tempfile.mkdtemp(prefix="upmr_scale_merge_")
    t = ManifestTable(os.path.join(base, "t"), "span")
    fact = spark.range(n_rows).select(
        (F.col("id") % N_SPANS).cast("int").alias("span"),
        F.col("id").alias("k"),
        (F.col("id") % 997).alias("v"),
    )
    t0 = time.perf_counter()
    t.commit(replace=t.write_data(fact))
    build_s = time.perf_counter() - t0
    print(
        f"built {n_rows:,} rows across {N_SPANS} spans in {build_s:.1f}s\n",
        flush=True,
    )

    for n_touched in (1, 4, 16, 64):
        # one updated key per touched span: per-span work is constant,
        # only the touched footprint grows
        src = spark.range(n_touched).select(
            F.col("id").cast("int").alias("span"),
            F.col("id").alias("k"),
            F.lit(-1).cast("long").alias("v"),
        )
        best = float("inf")
        for _ in range(3):
            s0 = time.perf_counter()
            stats = t.merge(src, on=["k"])
            best = min(best, time.perf_counter() - s0)
        print(
            f"merge touching {n_touched:>2}/{N_SPANS} spans: {best:5.2f}s  "
            f"(updated={stats['updated']}, inserted={stats['inserted']})",
            flush=True,
        )

    print(
        f"\nfull-table rewrite baseline (write_data+commit): {build_s:.1f}s. "
        "Locally each merge pays ~1s of fixed driver/job overhead (three "
        "Spark jobs: touched-span probe, action counts, write), so the "
        "small-merge times are overhead-floored; the DATA term is the "
        "1-span -> 64-span growth on top of it, and the 64-span merge "
        "stays under the full rewrite because the diff reads each side "
        "once. At 100 TB the data term dominates and the property that "
        "matters holds by construction: a key-scoped merge reads and "
        "rewrites the touched spans' files — listed by the manifest, "
        "never discovered by scanning — so cost tracks the touched "
        "data, never the corpus."
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
