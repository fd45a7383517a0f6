"""Bench calibration anchor as a registered query (r11 verdict item 8).

``bench.py`` times a fixed micro-workload (``anchor_sec``) every round
so box drift and code drift can be told apart from the artifacts
alone. Registering the SAME workload as a query means the external
driver's correctness run also exercises it every round — a green row
here timestamps that the box ran the exact workload the bench times,
and the deterministic outputs (closed-form integer sums over
``range``) give the oracle a real value comparison, not a smoke test.

No engine code is on this path BY DESIGN: the whole point of the
anchor is that it moves only when the box does. Leg 1 is a pure-CPU
whole-stage-codegen aggregate over ``spark.range(50M)`` (scheduler +
CPU speed); leg 2 writes a small parquet table to a temp dir, reads it
back, and aggregates (IO + committer + filesystem speed). Both legs'
results are closed-form functions of N, so DuckDB recomputes them from
its own ``range()`` without touching the filesystem.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register

_N_CPU = 50_000_000  # leg-1 codegen rows (matches bench.py's anchor)
_N_IO = 2_000_000  # leg-2 parquet roundtrip rows
_K = 1000  # leg-2 group count


@register(
    "q_bench_anchor",
    oracle=(
        f"SELECT CAST((SELECT sum(range * 3 + 1) FROM range({_N_CPU})) "
        "AS BIGINT) AS sum_a, "
        f"CAST((SELECT sum(range % 97) FROM range({_N_CPU})) AS BIGINT) "
        "AS sum_mod_b, "
        f"CAST((SELECT count(DISTINCT range % {_K}) "
        f"FROM range({_N_IO})) AS BIGINT) AS k_groups, "
        f"CAST({_N_IO} AS BIGINT) AS rows_roundtrip, "
        f"CAST((SELECT sum(range % {_K}) FROM range({_N_IO})) AS BIGINT) "
        "AS k_weighted"
    ),
    doc="Bench calibration anchor (r12): the exact fixed workload "
    "bench.py times as anchor_sec, registered so the driver's own "
    "correctness run exercises it (and timestamps box health) every "
    "round. Leg 1: whole-stage-codegen sum over range(50M) — pure "
    "CPU/scheduler. Leg 2: 2M-row parquet write/read/aggregate under "
    "a temp dir — IO/committer. Outputs are closed-form integer sums, "
    "oracle-recomputed from DuckDB's range() with no filesystem "
    "dependence. Deliberately touches no engine code: the anchor "
    "moves only when the box does.",
)
def q_bench_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    cpu = spark.range(_N_CPU).selectExpr(
        "sum(id * 3 + 1) AS sum_a",
        "sum(pmod(id, 97)) AS sum_mod_b",
    )
    d = tempfile.mkdtemp(prefix="upmr_anchor_q_")
    try:
        p = os.path.join(d, "t")
        spark.range(_N_IO).selectExpr(
            "id", f"pmod(id, {_K}) AS k"
        ).write.parquet(p)
        io = (
            spark.read.parquet(p)
            .agg(
                F.countDistinct("k").cast("long").alias("k_groups"),
                F.count(F.lit(1)).alias("rows_roundtrip"),
                F.sum("k").alias("k_weighted"),
            )
        )
        # both legs are 1-row aggregates; the join is a trivial
        # broadcast of one row — and the result must materialize
        # BEFORE the temp dir is removed, hence the collect-free
        # createDataFrame round-trip below
        row_cpu = cpu.collect()[0]
        row_io = io.collect()[0]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                int(row_cpu["sum_a"]),
                int(row_cpu["sum_mod_b"]),
                int(row_io["k_groups"]),
                int(row_io["rows_roundtrip"]),
                int(row_io["k_weighted"]),
            )
        ],
        "sum_a long, sum_mod_b long, k_groups long, "
        "rows_roundtrip long, k_weighted long",
    )
