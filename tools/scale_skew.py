"""Measure skewed-join mitigation: naive vs AQE skew-split vs salting.

Synthetic workload: a fact table where ONE key owns half of all rows
(the classic hot-key pathology — at 100 TB this is the job that sits
at 99% for hours on one straggler task), shuffle-joined to a 1k-row
dim with broadcast disabled so the shuffle join actually happens.

Three plans over identical data:
  naive   — AQE off: the hot key's entire partition lands on ONE task;
  aqe     — AQE skew-join splitting (spark.sql.adaptive.skewJoin):
            the oversized partition is split into chunks, dim side
            duplicated per chunk at runtime;
  salted  — the manual fix (operators/relational.py q_join_salted
            pattern): fact side gets a per-row salt, dim side explodes
            xSALT, join key becomes (key, salt) — the hot key spreads
            over SALT reducers by construction.

All three return identical aggregates (asserted). Usage:
  python tools/scale_skew.py [n_rows]   (default 20e6)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "28g")

from pyspark.sql import functions as F  # noqa: E402

from updatable_persistent_map_reduce_spark.session import get_spark  # noqa: E402

N_KEYS = 1000
SALT = 32


def build(spark, n_rows: int):
    fact = spark.range(n_rows).select(
        F.when(F.pmod("id", 2) == 0, F.lit(0))
        .otherwise(F.pmod("id", N_KEYS))
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )
    return fact, dim


def agg(joined):
    return joined.groupBy().agg(
        F.sum(F.col("v") + F.col("w")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )


def run(spark, name, df):
    t0 = time.perf_counter()
    [row] = df.collect()
    dt = time.perf_counter() - t0
    print(f"{name:>7}: {dt:6.1f}s  (n={row['n']:,}, s={row['s']})", flush=True)
    return dt, (row["n"], row["s"])


def main() -> None:
    n_rows = int(float(sys.argv[1])) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark("upmr-scale-skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    fact, dim = build(spark, n_rows)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t_naive, r_naive = run(spark, "naive", agg(fact.join(dim, "k")))

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_aqe, r_aqe = run(spark, "aqe", agg(fact.join(dim, "k")))

    salted_fact = fact.withColumn("salt", F.pmod(F.xxhash64("v"), F.lit(SALT)))
    salted_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    t_salt, r_salt = run(
        spark, "salted", agg(salted_fact.join(salted_dim, ["k", "salt"]))
    )

    assert r_naive == r_aqe == r_salt, (r_naive, r_aqe, r_salt)
    print(
        f"\nhot key owns 50% of {n_rows:,} rows; "
        f"aqe {t_naive / t_aqe:.1f}x, salted {t_naive / t_salt:.1f}x "
        "faster than the single-straggler naive plan"
    )


if __name__ == "__main__":
    main()
