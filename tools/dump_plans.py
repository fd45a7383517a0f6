"""Dump .explain("formatted") for named queries to plans/r12/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
Default query set: the bench headline + suites' members whose plan is a
single DataFrame (lifecycle queries' FINAL read plan is what is dumped —
their cost is in the build, which explain cannot show, so the dump is
the serving-read shape only).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from updatable_persistent_map_reduce_spark.operators import all_queries  # noqa: E402
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "q_group_count", "q_rereduce", "q_agg_multi", "q_join_inner",
    "q_join_broadcast", "q_window_rank", "q_sort_limit", "q_dedup_exact",
    "q_sim_search", "q_text_stats", "q_token_count", "q_stream_tumbling",
    "q_mm_features", "q_upsert_recount", "q_dedup_near",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("plan-dump")
    qs = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("UPMR_PLAN_DIR", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
