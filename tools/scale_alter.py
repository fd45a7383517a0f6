"""Scale experiment: alter_reduce cost vs re-running Map.

``view.alter_reduce`` claims (plans/view.py) that evolving the Reduce
of a built view costs one pruned columnar re-aggregation of the
persisted map_results — never a corpus re-map. This measures both
sides at growing corpus sizes:

for each corpus size N:
    bootstrap a view with N docs aggregating cnt only, then
    (a) time alter_reduce adding a second metric (value_sum) whose
        column the map rows carried all along;
    (b) time the alternative the API exists to avoid: building a
        fresh view with both metrics from the source (re-map + full
        4-table write).

Both are O(N) scans, so the claim is a CONSTANT-factor one: the alter
reads one columnar table and writes only aggregate rows (l1 + finals,
O(groups)), while the re-map re-executes the map projection and
rewrites map_results + doc_index too — the dominant write volume.
Expect alter/remap << 1 and both slopes ~linear.

Usage: python tools/scale_alter.py [N ...]   (default 1M 2M 4M 8M)
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

N_GROUPS = 1_000


def corpus(spark, n: int):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % N_GROUPS).cast("int").alias("group_key"),
        F.lit(1).alias("cnt"),
        (F.col("id") % 97).cast("double").alias("value"),
    )


def make_view(spark, store: str, aggs) -> MapReduceView:
    return MapReduceView(
        spark,
        store,
        id_col="doc_id",
        group_cols=["group_key"],
        agg_exprs=aggs,
        n_key_spans=64,
        n_doc_spans=64,
        n_sub_buckets=16,
    )


def run(spark, n: int) -> dict:
    # built lazily: Column exprs need an active session
    CNT = [F.sum("cnt").alias("cnt")]
    BOTH = [F.sum("cnt").alias("cnt"), F.sum("value").alias("value_sum")]
    store = tempfile.mkdtemp(prefix=f"upmr_alter_{n}_")
    view = make_view(spark, store, CNT)
    view.execute(corpus(spark, n))
    t0 = time.perf_counter()
    view.alter_reduce(agg_exprs=BOTH)
    t_alter = time.perf_counter() - t0
    got = view.final_df().selectExpr(
        "sum(cnt) as c", "sum(value_sum) as v"
    ).collect()[0]
    assert got.c == n, f"conservation broken: {got.c} != {n}"
    shutil.rmtree(store, ignore_errors=True)

    store2 = tempfile.mkdtemp(prefix=f"upmr_remap_{n}_")
    t0 = time.perf_counter()
    view2 = make_view(spark, store2, BOTH)
    view2.execute(corpus(spark, n))
    t_remap = time.perf_counter() - t0
    shutil.rmtree(store2, ignore_errors=True)
    return {
        "corpus": n,
        "alter_s": round(t_alter, 2),
        "remap_s": round(t_remap, 2),
        "alter_over_remap": round(t_alter / t_remap, 3),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [
        1_000_000,
        2_000_000,
        4_000_000,
        8_000_000,
    ]
    spark = get_spark("upmr-scale-alter")
    spark.range(1000).count()
    for n in sizes:
        print(json.dumps(run(spark, n)))


if __name__ == "__main__":
    main()
