"""JSON / CSV ingestion (the reference's at-rest format is JSON —
one Newtonsoft-serialized file per result, MapReduce/Executer.cs:181).

The engine's source surface is format-pluggable: the same declared
schema drives ``spark.read.json`` / ``spark.read.csv`` / parquet, so a
query plan is independent of the wire format. Reading semi-structured
formats with an *explicit* schema keeps full predicate pushdown and
avoids the schema-inference extra pass over the data (which at 100 TB
is a whole second scan).

For tests/bench the driver only ships parquet, so :func:`mirror_table`
materializes a JSON/CSV twin of a parquet table once per process into
a temp dir — the ingestion path being exercised is the read, not the
mirror.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_MIRROR_CACHE: dict[tuple[str, str, str], str] = {}


def mirror_table(
    spark: SparkSession, sf_dir: str, table: str, fmt: str
) -> str:
    """Write ``table`` (read from ``sf_dir`` parquet) as ``fmt``
    ('json' lines or 'csv' with header) into a cached temp dir and
    return the path."""
    key = (sf_dir, table, fmt)
    path = _MIRROR_CACHE.get(key)
    if path is not None and os.path.exists(path):
        return path
    from .tables import load_table

    df = load_table(spark, sf_dir, table)
    path = os.path.join(
        tempfile.mkdtemp(prefix=f"upmr_{fmt}_"), f"{table}.{fmt}"
    )
    writer = df.coalesce(1).write.mode("overwrite")
    if fmt == "json":
        writer.json(path)
    elif fmt == "csv":
        writer.option("header", "true").csv(path)
    else:
        raise ValueError(f"unsupported mirror format {fmt!r}")
    _MIRROR_CACHE[key] = path
    return path


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-first JSON-lines read (no inference pass)."""
    return spark.read.schema(schema).json(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-first CSV read with header (no inference pass)."""
    return spark.read.schema(schema).option("header", "true").csv(path)
