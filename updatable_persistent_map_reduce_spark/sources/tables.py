"""Table catalog over the driver's parquet star schema (TESTDATA.md).

The reference ingests batches of typed documents
(``MapReduce/Executer.cs:31`` — ``Execute(ICollection<TMapInput>)``);
here the source abstraction is a columnar scan: ``spark.read.parquet``
with Catalyst predicate pushdown + column pruning reaching the footer.
JSON/CSV ingestion (the reference's at-rest format is JSON,
``MapReduce/Executer.cs:181``) is exposed through the same catalog.

Scale note: at 100 TB each table is a directory of many parquet files
(ideally partitioned / Z-ordered by its join or time key); nothing here
assumes a single file — paths are passed straight to the DataFrame
reader, which parallelizes splits by ``spark.sql.files.maxPartitionBytes``.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables: always broadcast-joinable (a few MB even at
# large sf; nation/region are constant-size).
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def spread(df: DataFrame, bytes_per_task: int = 64 * 1024) -> DataFrame:
    """Widen a narrow scan for a CPU-bound kernel with a round-robin
    repartition sized from the INPUT BYTES, capped at cluster width;
    no-op when the plan is already at least that wide.

    Catalyst/codegen stages don't need this — a single small file is
    fine single-threaded — but Arrow-batched Python kernels and
    interpreted higher-order array expressions are CPU-bound per row,
    so a 1-file scan would pin them to one core. At 100 TB sources are
    many-file and already wide, making this a no-op; the test fixtures
    are single small parquet files, which is exactly the narrow case.

    The width is scale-adaptive, not the core count (guide §2.2 —
    derive partitioning from the data): ``ceil(input parquet bytes /
    bytes_per_task)``, so a small corpus gets the handful of tasks its
    kernel work can fill instead of one empty-ish Python worker
    round-trip per core (r12 scaling data: q_mm_features ran 2x FASTER
    on 8 cores than 32 because 32 near-empty Arrow tasks were pure
    dispatch), while a large corpus saturates the cluster. 64 KB of
    parquet ≈ a few MB decompressed ≈ tens of ms of vectorized kernel
    per task — comfortably above task-dispatch cost. Falls back to
    cluster width when the input isn't file-backed."""
    import math

    width = df.sparkSession.sparkContext.defaultParallelism
    cur = df.rdd.getNumPartitions()
    if cur >= width:
        return df
    n = width
    try:
        files = df.inputFiles()
        sz = sum(
            os.path.getsize(f.removeprefix("file:")) for f in files
        )
        if files:
            n = max(1, min(width, math.ceil(sz / bytes_per_task)))
    except Exception:  # noqa: BLE001 — non-file plans: cluster width
        pass
    if cur >= n:
        return df
    return df.repartition(n)


# Session-level plan cache: session -> {(sf_dir, table) -> DataFrame}.
# ``spark.read.parquet`` pays a schema-inference/listing job per call,
# and every operator builds a fresh Catalog — so a 22-query SQL suite
# re-ran ~10 such jobs (1-3 s) per query just to re-learn schemas that
# cannot change mid-session. The cached object is a LAZY PLAN (schema +
# file listing), never data: every query still scans the parquet
# fresh, exactly like Spark's own per-session file-index cache
# (optimization guide §6 — avoid repeated listings). Keyed WEAKLY on
# the session object (r12 advice: an id()-keyed dict could serve a new
# session plans bound to a dead one whose id was reused, and pinned
# JVM-backed plans forever) — a stopped/collected session's entries
# vanish with it, and a fresh driver session always re-infers from
# disk. The cached plan freezes the FILE LISTING at first load: files
# added to sf_dir mid-session are not picked up (the test corpora are
# immutable; a mutable deployment would use a real catalog).
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    per_session = _PLAN_CACHE.get(spark)
    if per_session is None:
        per_session = {}
        _PLAN_CACHE[spark] = per_session
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    per_session[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as long nanoseconds and truncate to a
        # microsecond timestamp (matches DuckDB's ns->us cast semantics).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


class Catalog:
    """Lazy table accessor bound to one scale-factor directory.

    ``cat.lineitem`` (or ``cat["lineitem"]``) returns the DataFrame;
    ``register_views`` publishes every table as a temp view so SQL-form
    operators can refer to them by name.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        # The driver may hand us a session without our factory's conf;
        # timestamp semantics (year/date_trunc vs the naive-UTC oracle)
        # depend on the session timezone, so pin it here.
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    def __getitem__(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self[name]
        raise AttributeError(name)

    def register_views(self) -> None:
        for name in TABLE_NAMES:
            self[name].createOrReplaceTempView(name)
