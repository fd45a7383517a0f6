"""Data-layout operators: multi-dimensional clustering (Z-order) and
runtime partition pruning (DPP) — the two scan-elimination levers a
100 TB deployment pulls beyond predicate pushdown.

The reference has no layout story (one JSON file per document,
Executer.cs:165-183; fixed 256-bucket fan-out, Executer.cs:295-303);
these are the pieces that decide whether a selective query reads 100 TB
or 100 GB:

- **Z-order** clusters files so per-file min/max stats stay tight on
  EVERY curve dimension — point/range predicates on any of them skip
  most files (Delta OPTIMIZE ZORDER / Iceberg sort-order semantics,
  built from ~20 codegen bit ops + one range repartition).
- **Dynamic partition pruning** turns a dim-side filter into a
  runtime partition filter on the fact scan: Spark builds the
  broadcast, collects the surviving join keys, and skips every fact
  partition directory they don't cover — the star-schema scan killer.

Layout changes answers never; both queries attest that (same oracle as
the raw table) while asserting the layout actually pruned.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.zorder import zorder_value
from ..sources import Catalog
from . import register


def _minmax_matching_files(
    path: str, col: str, lo: int, hi: int
) -> tuple[int, int]:
    """(files whose parquet min/max stats intersect [lo, hi], total
    files) — driver-side footer reads, O(files), the same decision a
    manifest with per-file stats makes without touching any footer."""
    import pyarrow.parquet as pq

    match = total = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        total += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        stats = [
            md.row_group(g).column(idx).statistics
            for g in range(md.num_row_groups)
        ]
        if any(s is None or not s.has_min_max for s in stats):
            # a row group without bounds (e.g. all-null column) can
            # never be ruled out — count the file as matching, the
            # same always-safe fallback store._capture_stats takes
            match += 1
            continue
        fmin = min(s.min for s in stats)
        fmax = max(s.max for s in stats)
        if not (fmax < lo or fmin > hi):
            match += 1
    return match, total


def write_zordered(
    df: DataFrame, cols: list[str], path: str, n_files: int, bits: int
) -> None:
    """Write ``df`` as ``n_files``-ish parquet files clustered along
    the Z-curve of ``cols``: one range shuffle on the curve value, an
    in-partition sort, and the curve column dropped before write (it
    is derivable; persisting it is optional denormalization)."""
    z = zorder_value([F.col(c) for c in cols], bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "q_layout_zorder",
    oracle=(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, "
        "CAST(floor(sum(CAST(value AS DECIMAL(18,6))) * 100) AS BIGINT) "
        "AS value_cents "
        "FROM events "
        "WHERE user_id % 32 = (SELECT min(user_id % 32) FROM events) "
        "GROUP BY event_type"
    ),
    doc="Z-order clustering attested end-to-end: events written along "
    "the (user-bucket, day) Morton curve, re-read with a point "
    "predicate on the bucket dimension — the one a day-linear layout "
    "cannot skip for — and aggregated; oracle = the identical filter "
    "on the raw table (layout changes answers never). The query also "
    "writes the day-linear control layout and asserts from parquet "
    "footer stats that the curve pruned files and the control did not "
    "do better, so a silently-broken curve fails the gate. The strict "
    "quantified contrast (curve reads <=half of what linear reads on "
    "a dense grid) is pinned by tests/test_layout.py.",
)
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events.select(
        "user_id",
        "event_type",
        "value",
        F.pmod("user_id", F.lit(32)).alias("u_bucket"),
        (F.dayofmonth("ts") - 1).alias("day0"),
    )
    base = tempfile.mkdtemp(prefix="upmr_zorder_")
    zdir = os.path.join(base, "zorder")
    ldir = os.path.join(base, "linear")
    write_zordered(ev, ["u_bucket", "day0"], zdir, n_files=16, bits=5)
    # control: the time-linear layout every log pipeline has by default
    (
        ev.repartitionByRange(16, "day0")
        .sortWithinPartitions("day0")
        .write.mode("overwrite")
        .parquet(ldir)
    )
    # probe the smallest bucket actually present (sf-independent)
    probe = ev.agg(F.min("u_bucket")).collect()[0][0]
    zm, zt = _minmax_matching_files(zdir, "u_bucket", probe, probe)
    lm, _lt = _minmax_matching_files(ldir, "u_bucket", probe, probe)
    if not (zm < zt and zm <= lm):
        raise RuntimeError(
            f"z-order layout did not prune: curve {zm}/{zt} files match "
            f"bucket {probe}, linear control {lm} — the curve is broken, "
            "so this query would be attesting nothing"
        )
    return (
        spark.read.parquet(zdir)
        .filter(F.col("u_bucket") == probe)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.floor(F.sum(F.col("value").cast("decimal(18,6)")) * 100)
            .cast("bigint")
            .alias("value_cents"),
        )
    )


@register(
    "q_dpp_prune",
    oracle=(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, "
        "CAST(floor(sum(CAST(value AS DECIMAL(18,6))) * 100) AS BIGINT) "
        "AS value_cents "
        "FROM events "
        "WHERE dayofweek(CAST(ts AS DATE)) IN (0, 6) "
        "GROUP BY event_type"
    ),
    doc="Dynamic partition pruning attested: events land date-"
    "partitioned (the universal log layout), a small date dim keeps "
    "only weekends, and the fact-dim join lets Spark inject the "
    "broadcast's surviving dates as a runtime PartitionFilter — the "
    "fact scan reads ~2/7 of the directories instead of all of them. "
    "Plan-audited for the dynamicpruning expression; oracle = the "
    "same weekend filter stated directly (pruning changes answers "
    "never). DuckDB dayofweek is 0=Sunday..6, Spark's is 1=Sunday..7 "
    "— both sides say 'Saturday or Sunday'.",
)
def q_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    base = tempfile.mkdtemp(prefix="upmr_dpp_")
    fact_dir = os.path.join(base, "fact")
    dim_dir = os.path.join(base, "dates")
    ev.withColumn("event_date", F.col("ts").cast("date")).write.mode(
        "overwrite"
    ).partitionBy("event_date").parquet(fact_dir)
    # the date dim a warehouse would maintain
    (
        ev.select(F.col("ts").cast("date").alias("event_date"))
        .distinct()
        .withColumn("dow", F.dayofweek("event_date"))
        .write.mode("overwrite")
        .parquet(dim_dir)
    )
    fact = spark.read.parquet(fact_dir)
    # The dim filter must be a comparison/IN predicate: Spark's DPP
    # rule gates on isLikelySelective(), which a bare boolean-attribute
    # filter does NOT satisfy — filtering a persisted is_weekend flag
    # silently loses the runtime pruning (measured here), so the flag
    # stays a dow int and weekend-ness is an IN over it.
    dim = (
        spark.read.parquet(dim_dir)
        .filter(F.col("dow").isin(1, 7))
        .select("event_date")
    )
    return (
        fact.join(F.broadcast(dim), "event_date")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.floor(F.sum(F.col("value").cast("decimal(18,6)")) * 100)
            .cast("bigint")
            .alias("value_cents"),
        )
    )
