"""Unit/property tests for the distributed prefix sum
(functions/prefix.py) — the scale-safe replacement for partition-less
windows. The oracle queries cover it end-to-end; these pin the
primitive itself: exactness against a driver-computed scan, skewed
key distributions (approxQuantile bucketing must still be exact),
and degenerate inputs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from updatable_persistent_map_reduce_spark.functions.prefix import (
    distributed_prefix_sum,
)


def _check(spark, pairs: list[tuple[int, int]], num_buckets=None):
    """pairs = (key, weight); keys unique."""
    df = spark.createDataFrame(pairs, "k long, w long")
    got = {
        r.k: r.cum_before
        for r in distributed_prefix_sum(
            df, "k", F.col("w"), num_buckets=num_buckets
        ).collect()
    }
    acc, want = 0, {}
    for k, w in sorted(pairs):
        want[k] = acc
        acc += w
    assert got == want


def test_empty(spark):
    df = spark.createDataFrame([], "k long, w long")
    assert distributed_prefix_sum(df, "k", F.col("w")).count() == 0


def test_single_row(spark):
    _check(spark, [(7, 42)])


def test_fewer_rows_than_buckets(spark):
    _check(spark, [(1, 5), (100, 3), (2, 9)], num_buckets=32)


def test_skewed_keys_cluster_in_one_range(spark):
    # 90% of keys in [0, 10), the rest spread to 1e9: quantile
    # boundaries collapse; buckets still partition correctly.
    pairs = [(i, i % 7 + 1) for i in range(9)] + [
        (10**9 + i * 1000, i + 1) for i in range(3)
    ]
    _check(spark, pairs)


def test_zero_weights(spark):
    _check(spark, [(i, 0) for i in range(10)])


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.integers(min_value=0, max_value=10**6),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    buckets=st.sampled_from([None, 2, 8]),
)
def test_property_matches_serial_scan(spark, data, buckets):
    _check(spark, data, num_buckets=buckets)


def test_plan_has_no_single_partition_window(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("w")
    )
    out = distributed_prefix_sum(df, "k", F.col("w"))
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange SinglePartition" not in plan, plan


@pytest.mark.parametrize("n", [0, 1, 2])
def test_negative_weights_rejected_or_exact(spark, n):
    # Negative weights are legal (prefix sums are signed): verify
    # exactness rather than rejection.
    pairs = [(i, (-1) ** i * (i + n)) for i in range(5)]
    df = spark.createDataFrame(pairs, "k long, w long")
    got = {
        r.k: r.cum_before
        for r in distributed_prefix_sum(df, "k", F.col("w")).collect()
    }
    acc, want = 0, {}
    for k, w in sorted(pairs):
        want[k] = acc
        acc += w
    assert got == want
