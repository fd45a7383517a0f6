"""Query/operator registry.

Every operator the engine exposes is registered as a :class:`Query`:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are SQL-expressible) the ANSI-SQL oracle string DuckDB runs
on the same parquet tables. The driver compares the two at sf0.01 —
that is the correctness gate; rows-only queries (approximate or
engine-stateful ops) carry ``oracle=None``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for rows-only checks
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a query callable under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, Query]:
    # Import side-effect modules exactly once.
    from . import core  # noqa: F401
    from . import relational  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import text_analysis  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import windows  # noqa: F401
    from . import incremental  # noqa: F401
    from . import pipeline  # noqa: F401

    return dict(REGISTRY)
