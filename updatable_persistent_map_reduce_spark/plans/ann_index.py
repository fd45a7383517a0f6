"""Persisted IVF ANN index — the similarity family as a STORE artifact.

`q_sim_search_ivf` rebuilds its k-means cells on every call; a
deployment builds the index ONCE and probes it many times. `IvfIndex`
does exactly that with the engine's own storage machinery:

- **centroids**: KB-sized driver state, saved as JSON next to the data;
- **listed vectors**: one :class:`ManifestTable` with ``cell`` as the
  span column — every vector lands in its nearest cell's files, so a
  probe of ``nprobe`` cells resolves (driver-side, manifest-only) to
  exactly those cells' files and scans nothing else. This is the same
  span pruning the incremental view uses for dirty-pair reads, applied
  to vector search: at 100 TB a probe touches corpus·(nprobe/cells)
  bytes, and the manifest lookup costs no listing or footer reads.
- **incremental upsert**: new vectors are assigned to cells and
  APPENDED to the manifest (atomic snapshot swap, crash-safe like
  every other table) — the index stays serviceable during growth, and
  `compact()`-style maintenance is the store's normal file folding.
  Centroids drift as the corpus grows; :meth:`IvfIndex.rebuild` refits
  them from the live table and re-spans it in one pinned commit,
  exactly like the view's `rescale()` — tested by planting drifted
  appends, watching partial-nprobe recall decay, and pinning its
  recovery after rebuild (tests/test_llm_ops.py).

Correctness: with ``nprobe >= n_cells`` the probe covers every cell, so
search is EXACT brute force — the registered `q_sim_index_persisted`
runs in that mode and shares `q_sim_search`'s SQL oracle; recall-vs-
cost at partial nprobe is measured by `tools/scale_ann.py`.

Reference tie-in: the reference persists intermediate aggregation
state so queries never recompute (Executer.cs:165-203, 370-376); this
is the same materialize-once-serve-many contract for vector search.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr
from .store import ManifestTable


class IvfIndex:
    def __init__(self, spark: SparkSession, path: str, n_cells: int = 16):
        self.spark = spark
        self.path = path
        self.n_cells = n_cells
        self._listed = ManifestTable(os.path.join(path, "listed"), "cell")
        self._centroid_path = os.path.join(path, "centroids.json")
        self._centroids: np.ndarray | None = None

    # ----- build / maintain ------------------------------------------------

    def build(self, e: DataFrame, kmeans_iters: int = 2) -> None:
        """Fit centroids on ``e`` (vec_id, embedding) and write the
        cell-listed table in one job; atomic manifest publish."""
        from ..operators.similarity import fit_kmeans, make_assign_udf

        centroids = fit_kmeans(
            self.spark, e, n_cells=self.n_cells, iters=kmeans_iters
        )
        os.makedirs(self.path, exist_ok=True)
        with open(self._centroid_path, "w") as f:
            json.dump(centroids.tolist(), f)
        self._centroids = centroids
        listed = e.select(
            "vec_id",
            "embedding",
            make_assign_udf(self.spark, centroids)("embedding").alias("cell"),
        )
        mapping = self._listed.write_data(listed)
        self._listed.commit(replace_all=mapping)

    def upsert(self, new_vectors: DataFrame) -> None:
        """Assign new (vec_id, embedding) rows to their nearest
        existing cells and APPEND — an incremental index update with
        the store's normal crash-safe snapshot swap. (Latest-wins
        replacement of an existing vec_id would route through a
        doc-index exactly like the view's; growth-only here.)"""
        from ..operators.similarity import make_assign_udf

        assigned = new_vectors.select(
            "vec_id",
            "embedding",
            make_assign_udf(self.spark, self.centroids())("embedding").alias(
                "cell"
            ),
        )
        mapping = self._listed.write_data(assigned)
        self._listed.commit(append=mapping)

    def rebuild(self, kmeans_iters: int = 2) -> dict:
        """Refit centroids on the CURRENT corpus and re-span the listed
        table under them — the maintenance step for centroid drift.

        After heavy :meth:`upsert` growth the stored centroids describe
        the corpus the index was BUILT on, not the one it serves:
        appended vectors pile into whichever old cell is nearest, cells
        go unbalanced, and partial-``nprobe`` recall decays (full probe
        stays exact regardless — it scans every cell). Rebuild is the
        view's ``rescale()`` applied to vector search: one k-means
        refit over the live table, one write job re-assigning every
        vector to its new cell, one pinned ``replace_all`` commit
        (OCC: a concurrent upsert makes this raise
        :class:`~.store.ConcurrentCommitError` rather than silently
        dropping its rows — wrap in :func:`~.store.retry_commit` to
        coexist with ingest). The pre-rebuild snapshot stays
        time-travelable like any other commit.

        Centroids are published (atomic ``os.replace``) only AFTER the
        table commit lands, so a crash mid-rebuild leaves the old
        index fully intact; a crash in the tiny window between commit
        and centroid publish leaves new spans probed by old centroids —
        degraded partial-probe recall, never wrong results (the probe
        set is a recall choice; scoring is exact), and re-running
        ``rebuild()`` heals it. Returns ``{version, cells}``.
        """
        from ..operators.similarity import fit_kmeans, make_assign_udf

        base_v = self._listed.version
        cur = self._listed.read(self.spark)
        if cur is None:
            raise ValueError(
                f"rebuild of never-built/empty index at {self.path}"
            )
        e = cur.select("vec_id", "embedding")
        centroids = fit_kmeans(
            self.spark, e, n_cells=self.n_cells, iters=kmeans_iters
        )
        listed = e.select(
            "vec_id",
            "embedding",
            make_assign_udf(self.spark, centroids)("embedding").alias(
                "cell"
            ),
        )
        mapping = self._listed.write_data(listed)
        version = self._listed.commit(
            replace_all=mapping, base_version=base_v
        )
        tmp = self._centroid_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(centroids.tolist(), f)
        os.replace(tmp, self._centroid_path)
        self._centroids = centroids
        return {"version": version, "cells": len(mapping)}

    def centroids(self) -> np.ndarray:
        if self._centroids is None:
            with open(self._centroid_path) as f:
                self._centroids = np.array(json.load(f), dtype=np.float64)
        return self._centroids

    # ----- serve -----------------------------------------------------------

    def search(
        self,
        queries: list[tuple[int, list[float]]],
        k: int = 10,
        nprobe: int = 4,
    ) -> DataFrame:
        """Top-k cosine per query over the probed cells only. The cell
        selection is numpy over KB driver state; the scan is manifest-
        pruned to the probed cells' files; scoring is the same codegen
        cosine + per-query window as the brute-force baseline.
        ``nprobe >= n_cells`` probes everything — exact search."""
        cents = self.centroids()
        qmat = np.array([v for _, v in queries], dtype=np.float64)
        qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
        nprobe = min(nprobe, self.n_cells)
        probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]
        cells = sorted({int(c) for row in probe for c in row})
        listed = self._listed.read(self.spark, spans=cells)
        if listed is None:
            return self.spark.createDataFrame(
                [], "query_id long, vec_id long, cos_sim double, rnk int"
            )
        probes = self.spark.createDataFrame(
            [
                (int(qid), [float(x) for x in vec], int(c))
                for (qid, vec), row in zip(queries, probe)
                for c in row
            ],
            "query_id long, qe array<float>, cell int",
        )
        scored = (
            listed.join(F.broadcast(probes), "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
            .dropDuplicates(["query_id", "vec_id"])
            .select(
                "query_id",
                "vec_id",
                F.round(
                    cosine_expr(F.col("qe"), F.col("embedding")), 6
                ).alias("cos_sim"),
            )
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("vec_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "vec_id", "cos_sim", "rnk")
        )
