"""Measure JoinView delta cost vs corpus size: O(dirty spans), not O(table).

The delta-join view (plans/join_view.py) claims that a batch of
upserts to either side — fact rows, a dim-attribute change that must
retro-propagate, a join-key migration — costs the dirty join-key
spans' bytes, never a recompute of the view. The claim that matters
at 100 TB: with the corpus-scaled ``n_spans`` lever holding the span
size constant, a FIXED-SIZE delta batch's wall time stays flat while
the corpus grows.

This tool builds the view at doubling fact counts (spans doubling
with the corpus so span size is constant — the deployment posture),
then times three fixed-size deltas against each build:

- ``fact upsert``   — 64 fact rows re-landing with new values
- ``dim update``    — 8 dim rows re-attributed (retro-propagation
                      through every joined fact in their spans)
- ``migration``     — 64 facts moving to different join partners
                      (old spans retract, new spans gain)

Expected: build grows ~linearly; each delta row stays flat across
octaves (span size constant ⇒ dirty-span recompute constant), with
dim update the cheapest (fewest dirty spans).

Usage: python tools/scale_joinview.py [n_min] [n_max]  (default 5e5 4e6)
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

from updatable_persistent_map_reduce_spark.plans.join_view import (  # noqa: E402
    JoinView,
)
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

N_DIMS = 4096          # join-key cardinality (scales with corpus below)
ROWS_PER_SPAN = 250_000  # the lever: spans double as the corpus doubles


def main() -> None:
    n_min = int(float(sys.argv[1])) if len(sys.argv) > 1 else 500_000
    n_max = int(float(sys.argv[2])) if len(sys.argv) > 2 else 4_000_000
    spark = get_spark("upmr-scale-joinview")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    n = n_min
    while n <= n_max:
        n_spans = max(4, n // ROWS_PER_SPAN)
        n_dims = min(N_DIMS, max(64, n // 1000))
        base = tempfile.mkdtemp(prefix="upmr_scale_jv_")
        jv = JoinView(
            spark,
            os.path.join(base, "v"),
            fact_id="okey",
            join_col="ckey",
            dim_id="ckey",
            group_cols=["seg"],
            agg_exprs=[
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.sum("v").cast("bigint").alias("sv"),
            ],
            rereduce_exprs=[
                F.sum("cnt").cast("bigint").alias("cnt"),
                F.sum("sv").cast("bigint").alias("sv"),
            ],
            n_spans=n_spans,
        )
        dims = spark.range(n_dims).select(
            F.col("id").alias("ckey"),
            F.concat(F.lit("s"), (F.col("id") % 17)).alias("seg"),
        )
        facts = spark.range(n).select(
            F.col("id").alias("okey"),
            (F.col("id") % n_dims).alias("ckey"),
            (F.col("id") % 997).alias("v"),
        )
        t0 = time.perf_counter()
        jv.upsert_dims(dims)
        jv.upsert_facts(facts)
        build_s = time.perf_counter() - t0

        # Deltas are KEY-CLUSTERED (like real updates: a partner's
        # rows, a batch of corrections to one entity) so the dirty
        # span set is constant across octaves — the flat-line claim.
        # A key-scattered batch instead saturates at min(batch,
        # n_spans) dirty spans: bounded by batch size, not corpus.
        t0 = time.perf_counter()
        r1 = jv.upsert_facts(
            facts.filter(
                (F.col("ckey") < 2) & (F.col("okey") < 32 * n_dims)
            ).withColumn("v", F.col("v") + 1)
        )
        up_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        r2 = jv.upsert_dims(
            dims.filter(F.col("ckey") < 8).withColumn(
                "seg", F.lit("moved")
            )
        )
        dim_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        r3 = jv.upsert_facts(
            facts.filter(
                (F.col("ckey") == 2) & (F.col("okey") < 32 * n_dims)
            ).withColumn("ckey", F.lit(3).cast("bigint"))
        )
        mig_s = time.perf_counter() - t0

        n_rows = jv.final_df().count()
        print(
            f"n={n:>9,} spans={n_spans:>3} dims={n_dims:>5} | "
            f"build {build_s:6.1f}s | "
            f"fact-upsert {up_s:5.2f}s ({len(r1['dirty_spans'])} dirty) | "
            f"dim-update {dim_s:5.2f}s ({len(r2['dirty_spans'])} dirty) | "
            f"migration {mig_s:5.2f}s ({len(r3['dirty_spans'])} dirty) | "
            f"groups={n_rows}",
            flush=True,
        )
        shutil.rmtree(base, ignore_errors=True)
        n *= 2


if __name__ == "__main__":
    main()
