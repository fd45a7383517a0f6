"""SparkSession factory.

Local testing runs a single JVM (``local[N]``); the configuration is
chosen so the *logical* plans are the ones we'd want on a 1000-executor
cluster: AQE on (runtime coalescing + skew-join splitting), broadcast
threshold high enough to broadcast every dim table in the star schema,
shuffle partitions sized to cores locally (on a cluster this would be
2-3x total cores, or left to AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "upmr-spark", master: str | None = None) -> SparkSession:
    """Create (or reuse) the engine's SparkSession.

    Settings rationale (scale-first):
    - AQE enabled: runtime shuffle-partition coalescing, skew-join
      splitting, and dynamic join-strategy switching — the knobs that
      keep a fixed logical plan healthy from sf0.01 to 100 TB.
    - ``spark.sql.shuffle.partitions``: cores locally; AQE coalesces
      down when partitions are tiny and a cluster deployment raises it.
    - Arrow enabled: every Python-side exchange (pandas UDFs,
      ``applyInPandas``) moves columnar batches, not pickled rows.
    - Session timezone pinned to UTC so timestamp semantics match the
      DuckDB oracle (naive timestamps interpreted as UTC).
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS): read as long nanos
        # (Spark has no ns timestamp); the catalog converts to microsecond
        # timestamps on load.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # The manifest store tracks files itself; _SUCCESS markers are
    # never read and cost a filesystem round trip per write job —
    # material for the incremental view's many small commit-protocol
    # writes (object stores at deployment scale charge per request).
    spark.sparkContext._jsc.hadoopConfiguration().set(  # noqa: SLF001
        "mapreduce.fileoutputcommitter.marksuccessfuljobs", "false"
    )
    return spark
