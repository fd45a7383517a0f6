"""Data-layout operators: Z-order clustering skips files on every
curve dimension (quantified on a dense grid), DPP injects a runtime
partition filter, and both registered queries stay layout-invariant
in their answers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from updatable_persistent_map_reduce_spark.functions.zorder import zorder_value
from updatable_persistent_map_reduce_spark.operators.layout import (
    _minmax_matching_files,
    write_zordered,
)


def test_zorder_value_is_morton_interleave(spark):
    """The expression matches the reference Morton interleave bit for
    bit (python model), including the clamp for out-of-range values."""
    rows = [(x, y) for x in (0, 1, 5, 12, 15) for y in (0, 3, 9, 15)]
    rows += [(-3, 2), (99, 1)]  # clamped to 0 and 15
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", zorder_value([F.col("x"), F.col("y")], bits=4)
        ).collect()
    }

    def model(x, y):
        x, y = max(0, min(15, x)), max(0, min(15, y))
        z = 0
        for b in range(4):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == {(x, y): model(x, y) for x, y in rows}


def test_zorder_value_rejects_sign_bit_overflow(spark):
    """bits * k > 63 would interleave into the long's sign bit and
    corrupt the sort order globally — rejected at construction."""
    import pytest

    with pytest.raises(ValueError, match="64-bit"):
        zorder_value([F.col(f"c{i}") for i in range(8)], bits=8)
    # 7 cols x 9 bits = 63 is the last legal width
    zorder_value([F.col(f"c{i}") for i in range(7)], bits=9)


def test_zorder_prunes_both_dims_linear_prunes_one(spark, tmp_path):
    """Dense 64x64 grid, 16 files. The y-linear layout answers a
    point-x predicate by reading EVERY file; the z-ordered layout
    reads at most half (in practice ~a quarter) — and for a point-y
    predicate the curve still prunes, where a naive x-major re-sort
    would not. This is the quantified file-skipping claim behind
    q_layout_zorder's milder in-query assertion."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x int, y int"
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(grid, ["x", "y"], zdir, n_files=16, bits=6)
    (
        grid.repartitionByRange(16, "y")
        .sortWithinPartitions("y")
        .write.parquet(ldir)
    )
    zx, zt = _minmax_matching_files(zdir, "x", 17, 17)
    lx, lt = _minmax_matching_files(ldir, "x", 17, 17)
    assert lx == lt == 16  # linear layout cannot skip on x at all
    assert zx <= zt // 2 <= 8  # curve reads at most half the files
    zy, _ = _minmax_matching_files(zdir, "y", 42, 42)
    assert zy <= zt // 2  # ...and still prunes on y
    # layout changed, answers did not
    assert (
        spark.read.parquet(zdir).filter("x = 17").count()
        == spark.read.parquet(ldir).filter("x = 17").count()
        == 64
    )


def test_dpp_runtime_partition_filter_in_plan(spark, tmp_path):
    """A selective IN-filtered dim joined on the fact's partition
    column injects dynamicpruningexpression into PartitionFilters;
    result equals the directly-filtered fact."""
    fact_dir, dim_dir = str(tmp_path / "fact"), str(tmp_path / "dim")
    df = spark.range(2000).select(
        (F.col("id") % 20).cast("int").alias("k"), F.col("id").alias("v")
    )
    df.write.partitionBy("k").parquet(fact_dir)
    spark.createDataFrame(
        [(i, i % 5) for i in range(20)], "k int, cls int"
    ).write.parquet(dim_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.read.parquet(dim_dir).filter(F.col("cls").isin(0)).select("k")
    out = fact.join(F.broadcast(dim), "k").agg(F.sum("v").alias("s"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan
    expect = (
        fact.filter(F.col("k").isin(0, 5, 10, 15))
        .agg(F.sum("v"))
        .collect()[0][0]
    )
    assert out.collect()[0]["s"] == expect


def test_registered_zorder_query_asserts_pruning(spark):
    """The registered query's own guard trips when the curve prunes:
    it runs clean on real data (smoke scale)."""
    from updatable_persistent_map_reduce_spark.operators import all_queries

    df = all_queries()["q_layout_zorder"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows and all(r["cnt"] > 0 for r in rows)
