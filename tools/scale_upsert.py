"""Scale experiment: incremental upsert cost vs corpus size.

The engine's core claim (README, plans/view.py) is that a batch costs
O(|batch| + rewritten-pair bytes + dirty-span aggregation) —
independent of corpus size — while the reference rescans its whole
MapResults tree per batch (MapReduce/Executer.cs:245,
``Directory.GetFiles(AllDirectories)``). This script measures it:

for each corpus size N:
    bootstrap a view with N docs (one batch), then
    apply a fixed-size upsert batch (UPSERT_N docs, every key-span
    dirtied) and report its wall time.

If the claim holds, upsert latency stays ~flat while N grows 8x; the
only growing term is the copy-on-write rewrite of the dirty pairs,
bounded by N/(n_key_spans * n_sub_buckets) per pair — push span
counts up with the corpus (``rescale()``) and that term is capped too.

Usage: python tools/scale_upsert.py [N ...]   (default 1M 2M 4M 8M)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.plans import MapReduceView  # noqa: E402
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

UPSERT_N = 10_000
N_GROUPS = 1_000


def corpus(spark, n: int):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % N_GROUPS).cast("int").alias("group_key"),
        (F.col("id") % 97).cast("double").alias("value"),
    )


def run(spark, n: int, *, two_level: bool) -> dict:
    store = tempfile.mkdtemp(prefix=f"upmr_scale_{n}_")
    view = MapReduceView(
        spark,
        store,
        id_col="doc_id",
        group_cols=["group_key"],
        # Two-level contract: aggs must be closed under re-application
        # to their own aliased output, so the map emits (cnt=1,
        # value_sum=value) and both levels sum those names.
        agg_exprs=(
            [
                F.count(F.lit(1)).alias("cnt"),
                F.sum("value").alias("value_sum"),
            ]
            if not two_level
            else [
                F.sum("cnt").alias("cnt"),
                F.sum("value_sum").alias("value_sum"),
            ]
        ),
        map_fn=(
            None
            if not two_level
            else lambda df: df.select(
                "doc_id",
                "group_key",
                F.lit(1).alias("cnt"),
                F.col("value").alias("value_sum"),
            )
        ),
        n_key_spans=64,
        n_doc_spans=64,
        two_level=two_level,
        n_sub_buckets=16,
    )
    t0 = time.perf_counter()
    view.execute(corpus(spark, n))
    t_boot = time.perf_counter() - t0
    # fixed-size upsert: docs 0..UPSERT_N-1 — ids cover all N_GROUPS
    # groups (id % 1000) so every key-span is dirty, and the hashed doc
    # buckets spread over every pair: the true worst case (every pair
    # copy-on-write rewritten), identical across corpus sizes. Values
    # changed so rows really differ.
    upd = corpus(spark, UPSERT_N).withColumn(
        "value", F.col("value") + 1000.0
    )
    t0 = time.perf_counter()
    view.execute(upd)
    t_upsert = time.perf_counter() - t0
    # localized upsert: one group's docs only -> 1 dirty key-span (of
    # 64), n_sub_buckets dirty pairs. This is the path the dirty-span
    # pruning exists for: cost ~ corpus/64 rewrite + one span's
    # re-aggregation, vs the all-spans worst case above.
    upd_hot = (
        corpus(spark, n)
        .filter(F.col("group_key") == 0)
        .withColumn("value", F.col("value") + 2000.0)
    )
    t0 = time.perf_counter()
    view.execute(upd_hot)
    t_hot = time.perf_counter() - t0
    total = view.final_df().selectExpr(
        "sum(cnt) as n", "round(sum(value_sum), 1) as v"
    ).collect()[0]
    assert total.n == n, f"row conservation broken: {total.n} != {n}"
    shutil.rmtree(store, ignore_errors=True)
    return {
        "corpus": n,
        "two_level": two_level,
        "bootstrap_s": round(t_boot, 2),
        "upsert_s": round(t_upsert, 2),
        "hot_group_upsert_s": round(t_hot, 2),
    }


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:] if not a.startswith("-")] or [
        1_000_000,
        2_000_000,
        4_000_000,
        8_000_000,
    ]
    spark = get_spark("upmr-scale-upsert")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm
    out = []
    for n in sizes:
        for two_level in (False, True):
            r = run(spark, n, two_level=two_level)
            print(json.dumps(r), flush=True)
            out.append(r)
    # headline: upsert latency growth across the corpus range
    for tl in (False, True):
        rows = [r for r in out if r["two_level"] is tl]
        if len(rows) >= 2:
            growth = rows[-1]["upsert_s"] / rows[0]["upsert_s"]
            span = rows[-1]["corpus"] / rows[0]["corpus"]
            print(
                f"# two_level={tl}: corpus x{span:.0f} -> "
                f"upsert x{growth:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
