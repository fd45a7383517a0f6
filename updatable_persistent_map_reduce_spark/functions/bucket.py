"""Stable, case-insensitive document-id bucket hash.

The reference assigns every document a deterministic bucket so that an
update to a document always invalidates the same slice of persisted
state: ``bucket = abs(fold_hash(upper(doc_id))) % 65536`` with a
256-way span tree above it (reference: MapReduce/Executer.cs:295-303,
BatchSize=256 at Executer.cs:23).

We keep the *contract* (deterministic, case-insensitive, stable across
runs and engines) but define our own fold so it is expressible both as
a Catalyst expression (JVM-side, codegen'd — no Python in the hot
path) and as ANSI SQL for the DuckDB oracle:

    h(s) = fold over codepoints c of upper(s):  h <- (h*31 + c) mod 2^32
    bucket(s) = h(s) mod NUM_BUCKETS

Scale note: the bucket column is what ``map_results`` is repartitioned
and persisted by, so incremental maintenance rewrites only dirty
buckets. 65,536 leaf buckets matches the reference; at 100 TB you'd
keep ~2-4x total-core-count *file* partitions by grouping buckets into
spans (``bucket % n_files``) while retaining the fine-grained bucket id
in the data for dirty-set bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NUM_BUCKETS = 65536  # 256**2, matching the reference's leaf fan-out
_M32 = 4294967296  # 2**32


def _codepoints(col: Column) -> Column:
    # split("") yields single-char strings (possibly with empty edge
    # entries on some engines) -> filter empties so Spark and DuckDB
    # agree, then map to codepoints.
    chars = F.filter(F.split(F.upper(col), ""), lambda c: c != F.lit(""))
    return F.transform(chars, lambda c: F.ascii(c).cast("long"))


def bucket_expr(col: Column, num_buckets: int = NUM_BUCKETS) -> Column:
    """Catalyst expression computing the stable bucket of a string id."""
    h = F.aggregate(
        _codepoints(col),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + c) % F.lit(_M32),
    )
    return (h % F.lit(num_buckets)).cast("int")


def bucket_sql(col_sql: str, num_buckets: int = NUM_BUCKETS) -> str:
    """DuckDB SQL computing the identical bucket (oracle twin)."""
    return (
        "CAST(list_reduce("
        f"list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_filter(string_split(upper({col_sql}), ''), c -> c <> ''), "
        "c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {_M32}"
        f") % {num_buckets} AS INTEGER)"
    )
