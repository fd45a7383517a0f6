"""Reference-shaped public API: the 5-method surface, 1:1.

The reference's entire public API is ``MapReduceTask`` (4 callbacks:
``Map``, ``Reduce``, ``GetReduceKey``, ``GetDocumentId`` —
MapReduce/MapReduceTask.cs:8-14) plus ``Executer.Create``/
``Execute``/``Query`` (MapReduce/Executer.cs:13-16,31,370). This module
mirrors that surface verbatim so a reference user ports a task by
translating each member, while execution runs on the Spark-native
:class:`~..plans.view.MapReduceView` underneath:

C# (reference)                         | here
---------------------------------------|----------------------------------
``class PeopleCountByState :           | ``MapReduceTask(map_fn=...,``
``  MapReduceTask<Person, StatePop>``  | ``  agg_exprs=..., group_cols=...,``
``GetDocumentId(Person) => p.Id``      | ``  id_col="id",``
``GetReduceKey(StatePop) => s.State``  | ``  group_cols=["state"])``
``Executer.Create(task)``              | ``Executer.create(spark, task, path)``
``executer.Execute(docs)``             | ``executer.execute(batch_df)``
``executer.Query(key)``                | ``executer.query(key)``

The generic-type contract (any serializable record) maps to the full
Spark SQL type system: the batch DataFrame's schema is the document
type, the map output's schema is the reduce-record type.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from .plans.view import MapReduceView


@dataclass
class MapReduceTask:
    """User task definition (reference: MapReduce/MapReduceTask.cs:6-15).

    ``map_fn``
        DataFrame transform, documents → reduce records; may emit 0..N
        rows per document (the ``Map`` contract, MapReduceTask.cs:8).
        ``None`` means the documents already have reduce-record shape.
    ``agg_exprs``
        Aliased aggregate Columns — the *re-reducible* ``Reduce``
        (MapReduceTask.cs:10): Catalyst applies them partial+final,
        which is exactly the "Reduce over its own output" contract.
    ``reduce_fn`` / ``reduce_schema``
        Escape hatch for a non-algebraic ``Reduce`` as a grouped-map
        pandas function.
    ``id_col``
        Document-id column (``GetDocumentId``, MapReduceTask.cs:14).
    ``group_cols``
        Reduce-key column(s) (``GetReduceKey``, MapReduceTask.cs:12).
    """

    group_cols: Sequence[str]
    id_col: str = "doc_id"
    map_fn: Callable[[DataFrame], DataFrame] | None = None
    agg_exprs: Sequence[Column] | None = None
    reduce_fn: Callable | None = None
    reduce_schema: str | None = None
    options: dict = field(default_factory=dict)


class Executer:
    """Reference-shaped engine handle (MapReduce/Executer.cs:13-16)."""

    def __init__(self, view: MapReduceView):
        self._view = view

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        task: MapReduceTask,
        store_path: str,
    ) -> "Executer":
        """``Executer.Create(task)`` (Executer.cs:13-16) — binds the
        task to a persistent store."""
        return cls(
            MapReduceView(
                spark,
                store_path,
                id_col=task.id_col,
                map_fn=task.map_fn,
                group_cols=task.group_cols,
                agg_exprs=task.agg_exprs,
                reduce_fn=task.reduce_fn,
                reduce_schema=task.reduce_schema,
                **task.options,
            )
        )

    def execute(self, batch_df: DataFrame) -> None:
        """``Execute(batch)`` (Executer.cs:31-45): upsert the batch —
        re-submitted ids replace their previous map output everywhere —
        and re-materialize every dirty aggregate."""
        self._view.execute(batch_df)

    def query(self, *key_values) -> DataFrame:
        """``Query(key)`` (Executer.cs:370-376): point lookup of the
        materialized result; empty for unknown keys; no computation."""
        return self._view.query(*key_values)

    def query_local(self, *key_values) -> list[dict]:
        """Serving-path ``Query(key)``: plain dicts via a driver-side
        pyarrow read of the key's span — no Spark job (the closest
        analogue of the reference's local file read)."""
        return self._view.query_local(*key_values)

    # Spark-native extras beyond the reference surface
    def final_df(self, version: int | None = None) -> DataFrame:
        return self._view.final_df(version=version)

    def delete(self, ids) -> None:
        """Explicit document deletion (the reference only deletes on
        re-submission; see MapReduceView.delete_docs)."""
        self._view.delete_docs(ids)

    def drop_key(self, *key_values) -> None:
        self._view.drop_key(*key_values)

    def compact_index(self) -> None:
        self._view.compact_index()

    def compact_map(self, min_files: int = 4) -> int:
        return self._view.compact_map(min_files=min_files)

    def vacuum(self, keep_versions: int = 0) -> int:
        return self._view.vacuum(keep_versions=keep_versions)

    def rescale(self, **span_counts) -> None:
        self._view.rescale(**span_counts)

    def alter_reduce(self, **reduce_def) -> None:
        """Swap the task's Reduce without re-running Map: finals (and
        partials) recompute from the persisted map output — see
        MapReduceView.alter_reduce."""
        self._view.alter_reduce(**reduce_def)

    def stats(self) -> dict:
        return self._view.stats()

    def history(self) -> dict:
        """Per-table commit history (versions, commit times, span/file
        counts) — the audit trail behind ``final_df(version=N)``."""
        return self._view.history()
