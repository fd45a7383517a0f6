"""r13 hardening pins: merge(touched=) exactness enforcement and the
weakly-keyed table-plan cache (r12 verdict item 8 / advice items)."""

from __future__ import annotations

import gc
import os
import tempfile
import weakref

import pytest
from pyspark.sql import functions as F

from updatable_persistent_map_reduce_spark.plans.store import ManifestTable
from updatable_persistent_map_reduce_spark.sources import tables as tables_mod


def _table_with_base(spark):
    base = tempfile.mkdtemp(prefix="upmr_touched_")
    t = ManifestTable(os.path.join(base, "t"), "span")
    df = spark.range(80).select(
        F.pmod("id", F.lit(8)).cast("int").alias("span"),
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
    )
    t.commit(replace=t.write_data(df))
    return t


def _src(spark, spans):
    return spark.range(80).select(
        F.pmod("id", F.lit(8)).cast("int").alias("span"),
        F.col("id").alias("k"),
        (F.col("id") * 100).alias("v"),
    ).filter(F.col("span").isin(spans))


def test_merge_touched_exact_hint_ok(spark):
    t = _table_with_base(spark)
    stats = t.merge(_src(spark, [0, 1]), on=["k"], touched=[0, 1])
    assert stats["spans_touched"] == 2
    # untouched span keeps its original values
    rows = {
        r.k: r.v for r in t.read(spark).filter(F.col("span") == 2).collect()
    }
    assert all(v % 100 != 0 or v == 0 or v % 10 == 0 for v in rows.values())


def test_merge_touched_superset_raises_before_commit(spark):
    t = _table_with_base(spark)
    v_before = t.version
    spans_before = t.spans()
    # span 3 has committed rows the superset hint would silently drop
    with pytest.raises(ValueError, match="actual distinct span set"):
        t.merge(_src(spark, [0, 1]), on=["k"], touched=[0, 1, 3])
    # nothing committed: version and membership unchanged, span 3 intact
    assert t.version == v_before
    assert t.spans() == spans_before


def test_merge_touched_subset_raises(spark):
    t = _table_with_base(spark)
    with pytest.raises(ValueError):
        t.merge(_src(spark, [0, 1]), on=["k"], touched=[0])


def test_plan_cache_weakly_keyed(spark):
    df1 = tables_mod.load_table(spark, "/root/testdata/sf0.001", "region")
    df2 = tables_mod.load_table(spark, "/root/testdata/sf0.001", "region")
    assert df1 is df2, "same session must hit the cached plan"
    assert isinstance(tables_mod._PLAN_CACHE, weakref.WeakKeyDictionary)

    # a collected key's entries vanish with it (no dead-session reuse
    # or unbounded growth — r12 advice item 1)
    class FakeSession:
        pass

    fake = FakeSession()
    tables_mod._PLAN_CACHE[fake] = {("x", "y"): df1}
    ref = weakref.ref(fake)
    del fake
    gc.collect()
    assert ref() is None
    assert all(
        not isinstance(k, FakeSession) for k in tables_mod._PLAN_CACHE.keys()
    )
