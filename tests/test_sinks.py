"""Write-side surface: partitioned / bucketed / shard-packed sinks
(sources/sink.py) — layout on disk plus lossless read-back."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from updatable_persistent_map_reduce_spark.sources import (
    Catalog,
    write_packed_shards,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_write_partitioned_layout_and_roundtrip(spark, tmp_path):
    c = Catalog(spark, SF).customer.select(
        "c_custkey", "c_name", "c_nationkey"
    )
    out = str(tmp_path / "part_out")
    write_partitioned(c, out, ["c_nationkey"])
    dirs = [e for e in os.listdir(out) if e.startswith("c_nationkey=")]
    n_nations = c.select("c_nationkey").distinct().count()
    assert len(dirs) == n_nations
    # one file per partition directory (single writer task per dir)
    for d in dirs:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1
    back = spark.read.parquet(out)
    assert back.count() == c.count()
    assert (
        back.selectExpr("sum(c_custkey)").first()[0]
        == c.selectExpr("sum(c_custkey)").first()[0]
    )


def test_write_packed_shards_budget_and_order(spark, tmp_path):
    d = Catalog(spark, SF).documents.select(
        "doc_id", "n_chars", "text"
    )
    out = str(tmp_path / "shards")
    budget = 50_000
    write_packed_shards(
        d, out, size_col="n_chars", order_col="doc_id", shard_budget=budget
    )
    back = spark.read.parquet(out)
    assert back.count() == d.count()
    # every shard but the last stays within budget + one doc overshoot
    sizes = {
        r["shard"]: r["total"]
        for r in back.groupBy("shard")
        .agg(F.sum("n_chars").alias("total"))
        .collect()
    }
    max_doc = d.selectExpr("max(n_chars)").first()[0]
    for shard, total in sizes.items():
        assert total <= budget + max_doc, (shard, total)
    # shards are contiguous doc_id ranges (stable order => reproducible)
    bounds = (
        back.groupBy("shard")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .orderBy("shard")
        .collect()
    )
    for prev, nxt in zip(bounds, bounds[1:]):
        assert prev["hi"] < nxt["lo"]


def test_write_bucketed_join_has_no_exchange(spark, tmp_path):
    from updatable_persistent_map_reduce_spark.sources import write_bucketed

    o = Catalog(spark, SF).orders.select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS upmr_sink_bucketed")
    write_bucketed(
        o,
        "upmr_sink_bucketed",
        "o_orderkey",
        4,
        path=str(tmp_path / "bucketed_tbl"),
    )
    back = spark.table("upmr_sink_bucketed")
    assert back.count() == o.count()
    j = (
        back.alias("a")
        .join(back.alias("b"), "o_orderkey")
        .groupBy("o_orderkey")
        .count()
    )
    plan = j._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        j._jdf.queryExecution(), "formatted"
    )
    assert "Exchange hashpartitioning" not in plan, plan
