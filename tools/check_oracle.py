"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value comparison. Use while
iterating:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [q_name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from updatable_persistent_map_reduce_spark.operators import all_queries  # noqa: E402
from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402
from updatable_persistent_map_reduce_spark.testing import (  # noqa: E402
    check_query,
    duck_con,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_spark("check-oracle")
    con = duck_con(args.sf)
    qs = all_queries()
    names = args.names or list(qs)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            problems = check_query(spark, con, qs[name], args.sf)
        except Exception as e:  # noqa: BLE001
            problems = [f"error: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        if qs[name].oracle is not None:
            kind = "oracle"
        elif qs[name].bound is not None:
            kind = f"bounded tol={qs[name].bound[1]}"
        else:
            kind = "rows-only"
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"ok   {name} [{kind}] ({dt:.1f}s)")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
