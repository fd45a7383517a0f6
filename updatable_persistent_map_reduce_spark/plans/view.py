"""MapReduceView — the updatable persistent map-reduce core (Tier A).

Re-designs the reference engine's semantics (NOT its machinery) on
Spark. Reference behavior being reproduced (see SURVEY §1 invariants):

- ``execute(batch)`` upserts documents: re-submitting a doc id
  *replaces* its previous map output everywhere, then re-aggregates
  (reference: MapReduce/Executer.cs:87-110 ExecuteMap +
  Executer.cs:240-261 delete-and-reschedule).
- A doc whose group key changes moves between groups with the grand
  total conserved (reference demo: MapReduce/Program.cs:35-44).
- Only state touched by the batch is recomputed (reference schedules
  dirty (key, bucket-span) markers, Executer.cs:115-151, and its
  reduce pass consumes only scheduled spans, Executer.cs:305-367).
- ``query(key)`` is a point lookup of the materialized result — no
  computation at read time; unknown key => empty
  (Executer.cs:370-376).
- Doc ids match case-insensitively on upsert (Executer.cs:245-247).

Spark-first architecture
------------------------
Three parquet state tables under ``store_path``:

``map_results/kspan=K/``
    Persisted per-document map output (the reference's
    ``MapResults/<key>/<bucket>/<docId>`` tree, Executer.cs:165-183),
    columnar and partitioned by **key-span** ``K = pmod(xxhash64(group
    key), n_key_spans)`` so recomputation of a dirty span is a
    partition-pruned scan.

``doc_index/dspan=D/``
    ``(uid, kspan)`` locations of every live doc's map output,
    partitioned by the stable case-insensitive **doc bucket** span
    (functions/bucket.py, the reference's Executer.cs:295-303 role).
    This replaces the reference's O(corpus) invalidation scan
    (``Directory.GetFiles(AllDirectories)``, Executer.cs:245) with a
    pruned lookup: an incoming batch touches only its own doc spans.

``final_results/kspan=K/``
    The materialized aggregate (the reference's ``FinalResults/<key>``,
    Executer.cs:263-276), partitioned by key-span for pruned point
    lookups.

``reduce_l1/kspan=K/`` *(two-level mode)*
    Materialized per-(key-span, doc-bucket) partial aggregates — the
    reference's level-one reduce results (``ReduceResults/One``,
    Executer.cs:80-81,192-203) with per-bucket dirty granularity: a
    batch recomputes partials only for buckets holding changed docs
    (map files are bucket-clustered, so the recompute scan is
    row-group pruned) and finals re-reduce the span's partials.
    Requires ``agg_exprs`` closed under re-application to their own
    output (the reference's re-reducible Reduce contract,
    MapReduceTask.cs:10).

Incremental maintenance per ``execute(batch)``:

1. map the batch (user map = any DataFrame transform, 0..N output
   rows per doc — the reference's ``Map`` contract,
   MapReduceTask.cs:8);
2. dirty key-spans = spans of the batch's new keys ∪ spans holding
   replaced docs' old output (via the pruned doc_index lookup);
3. copy-on-write those spans of ``map_results`` (survivors = existing
   rows minus incoming doc ids, latest-wins) — Spark's dynamic
   partition overwrite replaces exactly the dirty directories;
4. re-aggregate *only* the dirty key-spans (partition-pruned scan +
   partial/final HashAggregate — Spark's native two-level reduce tree,
   the reference's Executer.cs:47-85 for free) and dynamically
   overwrite those spans of ``final_results``.

Cost per batch is O(|batch| + rewritten-span bytes + dirty-span
aggregation), independent of corpus size — strictly better than the
reference, which rescans all map results for invalidation on every
batch. Spans holding a replaced doc are copy-on-write rewritten; spans
dirtied only by brand-new docs take an O(batch) append (the doc_index
is append-only, so "no index entry" proves "never written"), which is
what insert-heavy ingest pays.

Scale notes (100 TB): raise ``n_key_spans``/``n_doc_spans`` so a span
~= a few GB (they are the rewrite and re-aggregation granularity);
skewed group keys stay healthy because a span holds many keys and AQE
splits oversized shuffle partitions during re-aggregation; the
ping-pong staging write is two sequential executor-parallel jobs, no
driver bottleneck. On a real deployment the three tables would be
Delta/Iceberg tables (ACID partition replace); plain parquet dirs +
dynamic partition overwrite give the same single-writer semantics here.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.bucket import bucket_expr

MapFn = Callable[[DataFrame], DataFrame]


class MapReduceView:
    """A persistently materialized, incrementally updatable GROUP-BY view.

    Parameters
    ----------
    spark, store_path : session + state directory.
    id_col : column (name) in the *source batch* holding the document
        id (reference: GetDocumentId, MapReduceTask.cs:14).
    map_fn : batch DataFrame -> map-output DataFrame. Must carry
        ``id_col`` through, plus the group-key and value columns; may
        emit 0..N rows per document (flat-map contract,
        MapReduceTask.cs:8). ``None`` = identity.
    group_cols : group-key column names in the map output
        (GetReduceKey, MapReduceTask.cs:12).
    agg_exprs : aliased aggregate Columns (the re-reducible Reduce,
        MapReduceTask.cs:10) — Catalyst runs them partial+final.
    reduce_fn/reduce_schema : escape hatch for a non-algebraic user
        Reduce as a grouped-map pandas function (applyInPandas).
    """

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        *,
        id_col: str = "doc_id",
        map_fn: MapFn | None = None,
        group_cols: Sequence[str],
        agg_exprs: Sequence[Column] | None = None,
        reduce_fn: Callable | None = None,
        reduce_schema: str | None = None,
        n_key_spans: int = 64,
        n_doc_spans: int = 64,
        two_level: bool = False,
        n_sub_buckets: int = 64,
    ):
        if (agg_exprs is None) == (reduce_fn is None):
            raise ValueError("exactly one of agg_exprs / reduce_fn required")
        if reduce_fn is not None and reduce_schema is None:
            raise ValueError("reduce_fn requires reduce_schema")
        if two_level and agg_exprs is None:
            raise ValueError("two_level requires agg_exprs")
        self.spark = spark
        self.store = store_path
        self.id_col = id_col
        self.map_fn = map_fn or (lambda df: df)
        self.group_cols = list(group_cols)
        self.agg_exprs = list(agg_exprs) if agg_exprs is not None else None
        self.reduce_fn = reduce_fn
        self.reduce_schema = reduce_schema
        self.n_key_spans = n_key_spans
        self.n_doc_spans = n_doc_spans
        # Two-level mode materializes the reference's reduce tree
        # (Executer.cs:62,80-83: doc-bucketed partials below the final):
        # a ``reduce_l1`` table holds per-(kspan, doc-bucket) partial
        # aggregates; a batch recomputes partials only for buckets
        # holding changed docs and re-reduces the span's partials for
        # finals, so finals cost is O(dirty-bucket bytes + partials)
        # instead of O(dirty-span bytes). Contract (the reference's,
        # MapReduceTask.cs:10): ``agg_exprs`` must be closed under
        # re-application to their own aliased output (e.g.
        # sum("cnt").alias("cnt"); count(*) is NOT — emit 1s and sum).
        self.two_level = two_level
        self.n_sub_buckets = n_sub_buckets
        self._map_path = os.path.join(store_path, "map_results")
        self._idx_path = os.path.join(store_path, "doc_index")
        self._l1_path = os.path.join(store_path, "reduce_l1")
        self._final_path = os.path.join(store_path, "final_results")
        self._meta_path = os.path.join(store_path, "meta.json")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # ----- span expressions ------------------------------------------------

    def _kspan(self, *cols: Column | str) -> Column:
        cols = cols or [F.col(c) for c in self.group_cols]
        return F.pmod(F.xxhash64(*cols), F.lit(self.n_key_spans)).cast("int")

    def _dspan(self, id_column: Column) -> Column:
        # Case-insensitive stable doc bucket (reference parity:
        # Executer.cs:295-303 over upper-cased chars), folded to spans.
        return (bucket_expr(id_column) % F.lit(self.n_doc_spans)).cast("int")

    def _uid(self, id_column: Column) -> Column:
        return F.upper(id_column.cast("string"))

    def _bucket(self, uid_column: Column) -> Column:
        # Fine-grained doc bucket inside a key-span (two-level mode):
        # the reference's leaf bucket role (Executer.cs:295-303).
        return (bucket_expr(uid_column) % F.lit(self.n_sub_buckets)).cast("int")

    def _pair(self) -> Column:
        # (kspan, bucket) encoded as one int for driver-side sets and
        # `isin` pushdown.
        return F.col("kspan") * F.lit(self.n_sub_buckets) + F.col("bucket")

    # ----- state io --------------------------------------------------------

    def _exists(self, path: str) -> bool:
        return os.path.exists(path)

    def _read(self, path: str) -> DataFrame | None:
        return self.spark.read.parquet(path) if self._exists(path) else None

    def _stage_write(
        self,
        df: DataFrame,
        path: str,
        partition_col: str,
        sort_col: str | None = None,
    ) -> tuple[str, set[int]]:
        """Write ``df`` (which may read from ``path``) to a sibling
        staging dir with one Spark write job; return the staging path
        and the spans present in the staged data (read off the staging
        directory listing — no extra job).

        The pre-write ``repartition(partition_col)`` makes each span a
        single task writing a single file instead of every shuffle task
        writing a sliver of every span (task_count × span_count tiny
        files — a metadata storm on any object store). At 100 TB scale
        combine with ``spark.sql.files.maxRecordsPerFile`` (and more
        spans) to keep file sizes bounded."""
        staging = path + ".staging"
        out = df.repartition(F.col(partition_col))
        if sort_col is not None:
            out = out.sortWithinPartitions(sort_col)
        out.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
        prefix = f"{partition_col}="
        spans = {
            int(entry[len(prefix):])
            for entry in os.listdir(staging)
            if entry.startswith(prefix)
        }
        return staging, spans

    def _swap_staged(
        self, staging: str, path: str, partition_col: str, spans: set[int]
    ) -> None:
        """Swap staged partition directories into place with filesystem
        renames — no second write job; the swap is the cheap metadata
        operation a Delta/Iceberg commit would be on a real deployment."""
        prefix = f"{partition_col}="
        if not self._exists(path):
            if spans:
                shutil.move(staging, path)
            else:
                shutil.rmtree(staging, ignore_errors=True)
            return
        for entry in os.listdir(staging):
            if not entry.startswith(prefix):
                continue
            target = os.path.join(path, entry)
            shutil.rmtree(target, ignore_errors=True)
            shutil.move(os.path.join(staging, entry), target)
        shutil.rmtree(staging, ignore_errors=True)

    def _staged_overwrite(
        self, df: DataFrame, path: str, partition_col: str
    ) -> set[int]:
        """Copy-on-write partition replace: one staged write job, then
        the rename swap. Returns the spans written."""
        staging, spans = self._stage_write(df, path, partition_col)
        self._swap_staged(staging, path, partition_col, spans)
        return spans

    def _meta(self) -> dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {"batch_seq": 0}

    def _write_meta(self, meta: dict) -> None:
        os.makedirs(self.store, exist_ok=True)
        with open(self._meta_path, "w") as f:
            json.dump(meta, f)

    # ----- write path (Execute — reference Executer.cs:31-45) -------------

    def execute(self, batch_df: DataFrame) -> None:
        """Apply one batch of document upserts and re-materialize the
        aggregates of every dirty key-span."""
        meta = self._meta()
        ids = (
            batch_df.select(self._uid(F.col(self.id_col)).alias("uid"))
            .distinct()
        )
        ids.cache()

        mapped = self.map_fn(batch_df)
        missing = {self.id_col, *self.group_cols} - set(mapped.columns)
        if missing:
            raise ValueError(f"map output missing columns: {sorted(missing)}")
        mapped = mapped.withColumn("uid", self._uid(F.col(self.id_col)))
        mapped = mapped.withColumn("kspan", self._kspan())
        if self.two_level:
            mapped = mapped.withColumn("bucket", self._bucket(F.col("uid")))
        # The mapped batch feeds four downstream plans (span discovery,
        # map_results content, doc_index content); batches are bounded,
        # so caching beats recomputing the user map each time.
        mapped.cache()

        # --- dirty sets (reference: ScheduleReduction, Executer.cs:115-151)
        # One tagged-union job discovers everything the batch dirties:
        # new keys' spans from the mapped batch, the batch's doc-spans,
        # and replaced docs' old key-spans from the doc_index (the
        # reference's delete-and-reschedule, Executer.cs:240-261, minus
        # its full-corpus scan). The index lookup joins on
        # (dspan, uid) against the broadcast batch ids, so the
        # partition column is a join key and dynamic partition pruning
        # skips untouched dspan directories — no driver round-trip to
        # pre-collect the span list.
        ids_d = ids.withColumn("dspan", self._dspan(F.col("uid")))
        bucket_of = (
            self._bucket(F.col("uid")) if self.two_level else F.lit(0)
        )
        tagged = mapped.select(
            F.lit("k").alias("t"),
            F.col("kspan").alias("v"),
            bucket_of.alias("b"),
        )
        idx = self._read(self._idx_path)
        if idx is not None:
            old_locs = idx.join(F.broadcast(ids_d), ["dspan", "uid"], "inner")
            tagged = tagged.unionByName(
                old_locs.select(
                    F.lit("o").alias("t"),
                    F.col("kspan").alias("v"),
                    bucket_of.alias("b"),
                )
            )
        new_kspans: set[int] = set()
        old_kspans: set[int] = set()
        dirty_pairs: set[int] = set()  # (kspan, bucket) encoded; two-level
        buckets = {"k": new_kspans, "o": old_kspans}
        for r in tagged.distinct().collect():
            buckets[r.t].add(r.v)
            dirty_pairs.add(r.v * self.n_sub_buckets + r.b)
        dirty_kspans = sorted(new_kspans | old_kspans)
        if not dirty_kspans:
            # Batch mapped to nothing and replaced nothing: no index
            # entries exist for these ids (old_kspans empty) — nothing
            # to do.
            mapped.unpersist()
            ids.unpersist()
            self._write_meta({**meta, "batch_seq": meta["batch_seq"] + 1})
            return

        # --- append the batch's doc locations to doc_index, on a
        # parallel thread: it is independent of the map_results/finals
        # chain, and Spark's scheduler runs jobs from separate driver
        # threads concurrently, so the index write overlaps the
        # copy-on-write below instead of serializing after it.
        # The index is append-only (LSM-style): stale entries for a doc
        # that moved key-spans are not rewritten out, they just make a
        # later lookup report extra old key-spans — which only
        # over-dirties (recompute reads map_results, the source of
        # truth), never corrupts. A real deployment compacts
        # opportunistically (see compact_index).
        new_idx = (
            mapped.select(
                "uid",
                F.col("kspan"),
                self._dspan(F.col("uid")).alias("dspan"),
            )
            .distinct()
        )
        idx_err: list[BaseException] = []

        def _append_idx() -> None:
            try:
                new_idx.repartition(F.col("dspan")).write.mode(
                    "append"
                ).partitionBy("dspan").parquet(self._idx_path)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                idx_err.append(e)

        idx_thread = threading.Thread(target=_append_idx, daemon=True)
        idx_thread.start()

        # --- maintain map_results for dirty key-spans
        # (reference: PersistMap + delete of replaced docs,
        # Executer.cs:165-183, 258)
        #
        # Dirty spans split into two regimes:
        #   rewrite spans = ``old_kspans`` — some incoming doc has a
        #     prior version there (the append-only doc_index never
        #     loses an entry, so a doc absent from ``old_kspans`` has
        #     provably never been written); survivors must be filtered
        #     out, so the span is copy-on-write rewritten.
        #   append spans = dirty - rewrite — only brand-new rows land
        #     there; the batch's rows are *appended*, O(batch) instead
        #     of O(span). Insert-heavy ingest (the dominant 100 TB
        #     regime) therefore never pays span-rewrite amplification.
        data_cols = [
            c for c in mapped.columns if c not in ("kspan",)
        ]
        new_rows = mapped.select(*data_cols, F.col("kspan"))
        existing = self._read(self._map_path)
        if existing is not None:
            rewrite_spans = sorted(old_kspans)
            append_spans = sorted(new_kspans - old_kspans)
            span_content = existing.filter(
                F.col("kspan").isin(dirty_kspans)
            )
            if rewrite_spans:
                span_content = span_content.join(
                    F.broadcast(ids), "uid", "left_anti"
                )
            content = span_content.select(new_rows.columns).unionByName(new_rows)
        else:
            # no physical store yet: stale old_kspans (possible only
            # from a partially-built store) have no files to rewrite —
            # everything is an append
            rewrite_spans = []
            append_spans = sorted(new_kspans)
            content = new_rows
        # ``content`` is exactly what the dirty map_results spans will
        # hold afterwards, so downstream aggregation reads it directly
        # instead of re-reading the parquet it just wrote. The map
        # rewrite (a filter of the same cache), the append, and the
        # finals/L1 staging all run on concurrent driver threads (Spark
        # schedules jobs from separate threads in parallel), so the
        # critical path is the slowest write, not their sum.
        # ``existing`` snapshotted its file listing at _read() time, so
        # the concurrent append can't double-count.
        #
        # Two-level append-only batches skip the cache: the only
        # consumer is the bucket-filtered L1 recompute, and caching
        # would force a full span scan that pushdown would otherwise
        # prune to the dirty buckets' row groups.
        if not self.two_level or rewrite_spans:
            content.cache()

        # --- re-aggregate only dirty state
        # (reference: ExecuteReduce over scheduled spans,
        # Executer.cs:47-85). Single-level: Catalyst's partial+final
        # HashAggregate is the reduce tree, re-run over dirty spans.
        # Two-level: the tree is *materialized* — per-(kspan, bucket)
        # partials recompute only for dirty buckets, and finals
        # re-reduce the span's partials (the reference's
        # BucketId/BatchSize grouping, Executer.cs:62, with strictly
        # finer dirty granularity).
        l1_content = None
        if self.two_level:
            l1_existing = self._read(self._l1_path)
            pair_list = sorted(dirty_pairs)
            recomputed = (
                content.filter(self._pair().isin(pair_list))
                .groupBy("kspan", "bucket", *self.group_cols)
                .agg(*self.agg_exprs)
            )
            if l1_existing is not None:
                l1_surv = l1_existing.filter(
                    F.col("kspan").isin(dirty_kspans)
                ).filter(~self._pair().isin(pair_list))
                l1_content = l1_surv.select(recomputed.columns).unionByName(
                    recomputed
                )
            else:
                l1_content = recomputed
            l1_content.cache()
            finals = l1_content.groupBy("kspan", *self.group_cols).agg(
                *self.agg_exprs
            )
        elif self.agg_exprs is not None:
            finals = content.groupBy("kspan", *self.group_cols).agg(
                *self.agg_exprs
            )
        else:
            finals = content.groupBy("kspan", *self.group_cols).applyInPandas(
                self.reduce_fn, schema=f"kspan int, {self.reduce_schema}"
            )
        fin_out: dict[str, object] = {}
        l1_out: dict[str, object] = {}
        app_err: list[BaseException] = []

        def _stage_finals() -> None:
            try:
                fin_out["res"] = self._stage_write(
                    finals, self._final_path, "kspan"
                )
            except BaseException as e:  # noqa: BLE001 — re-raised below
                fin_out["err"] = e

        def _append_new() -> None:
            try:
                out = new_rows.filter(
                    F.col("kspan").isin(append_spans)
                ).repartition(F.col("kspan"))
                if self.two_level:
                    # bucket-clustered files -> row-group stats prune
                    # later dirty-bucket recomputes to the right groups
                    out = out.sortWithinPartitions("bucket")
                out.write.mode("append").partitionBy("kspan").parquet(
                    self._map_path
                )
            except BaseException as e:  # noqa: BLE001 — re-raised below
                app_err.append(e)

        def _stage_l1() -> None:
            try:
                l1_out["res"] = self._stage_write(
                    l1_content, self._l1_path, "kspan"
                )
            except BaseException as e:  # noqa: BLE001 — re-raised below
                l1_out["err"] = e

        # Phase 1 — every job that READS the live map_results snapshot
        # (finals staging, L1 staging, map rewrite staging) runs
        # concurrently; the live-table append is NOT among them. An
        # append committing mid-flight can make a concurrent reader of
        # ``existing`` observe the new files (the parquet relation's
        # file listing is not a transactional snapshot under a
        # same-path writer), double-counting the batch — two readers
        # racing one append produced *divergent* finals vs L1 in
        # stress runs. Writers to other paths can't perturb readers,
        # so staging jobs may overlap freely.
        fin_thread = threading.Thread(target=_stage_finals, daemon=True)
        fin_thread.start()
        l1_thread = None
        if l1_content is not None:
            l1_thread = threading.Thread(target=_stage_l1, daemon=True)
            l1_thread.start()

        map_staging, rewritten = None, set()
        if rewrite_spans and existing is not None:
            map_staging, rewritten = self._stage_write(
                content.filter(F.col("kspan").isin(rewrite_spans)),
                self._map_path,
                "kspan",
                sort_col="bucket" if self.two_level else None,
            )
        fin_thread.join()
        if l1_thread is not None:
            l1_thread.join()
        if "err" in fin_out:
            raise fin_out["err"]
        if "err" in l1_out:
            raise l1_out["err"]
        fin_staging, fin_spans = fin_out["res"]

        # Phase 2 — with all snapshot readers drained, the append runs,
        # overlapped with the directory swaps below (append spans are
        # disjoint from rewrite spans, and the swaps touch other
        # tables' directories).
        app_thread = None
        if append_spans:
            app_thread = threading.Thread(target=_append_new, daemon=True)
            app_thread.start()

        # Swap staged spans into place; a rewrite span whose content
        # became empty (every doc deleted/moved out) loses its map
        # rows, partials, and final rows (mirrors the reference's eager
        # span invalidation, Executer.cs:132-150).
        if map_staging is not None:
            self._swap_staged(map_staging, self._map_path, "kspan", rewritten)
        for span in set(rewrite_spans) - rewritten - set(append_spans):
            for p in (self._map_path, self._l1_path, self._final_path):
                shutil.rmtree(
                    os.path.join(p, f"kspan={span}"), ignore_errors=True
                )
        if l1_thread is not None:
            l1_staging, l1_spans = l1_out["res"]
            self._swap_staged(l1_staging, self._l1_path, "kspan", l1_spans)
        self._swap_staged(fin_staging, self._final_path, "kspan", fin_spans)

        if app_thread is not None:
            app_thread.join()
        if app_err:
            raise app_err[0]
        idx_thread.join()
        if idx_err:
            raise idx_err[0]

        if l1_content is not None:
            l1_content.unpersist()
        content.unpersist()
        mapped.unpersist()
        ids.unpersist()
        self._write_meta({**meta, "batch_seq": meta["batch_seq"] + 1})

    def stats(self) -> dict:
        """Operational snapshot of the store: per-table file/byte
        counts and span dirs — the numbers an operator watches to
        decide span-count resizing or index compaction (no Spark job;
        pure filesystem metadata)."""
        out: dict = {"batch_seq": self._meta()["batch_seq"]}
        for name, path in (
            ("map_results", self._map_path),
            ("doc_index", self._idx_path),
            ("reduce_l1", self._l1_path),
            ("final_results", self._final_path),
        ):
            if not os.path.exists(path):
                continue
            files = bytes_ = spans = 0
            for entry in os.listdir(path):
                sub = os.path.join(path, entry)
                if not os.path.isdir(sub):
                    continue
                spans += 1
                for f in os.listdir(sub):
                    if f.endswith(".parquet"):
                        files += 1
                        bytes_ += os.path.getsize(os.path.join(sub, f))
            out[name] = {"spans": spans, "files": files, "bytes": bytes_}
        return out

    def compact_index(self) -> None:
        """Rewrite doc_index from the map_results source of truth,
        dropping stale append-only entries (docs that moved key-spans).
        Run opportunistically — correctness never requires it; stale
        entries only over-dirty recomputation."""
        live = self._read(self._map_path)
        if live is None:
            return
        fresh = live.select(
            "uid", "kspan", self._dspan(F.col("uid")).alias("dspan")
        ).distinct()
        staging = self._idx_path + ".compact"
        fresh.repartition(F.col("dspan")).write.mode("overwrite").partitionBy(
            "dspan"
        ).parquet(staging)
        shutil.rmtree(self._idx_path, ignore_errors=True)
        shutil.move(staging, self._idx_path)

    # ----- read path (Query — reference Executer.cs:370-376) --------------

    def final_df(self) -> DataFrame:
        """The whole materialized view (all groups)."""
        df = self._read(self._final_path)
        if df is None:
            raise ValueError(f"view at {self.store} has no materialized state")
        return df.drop("kspan")

    def query(self, *key_values) -> DataFrame:
        """Point lookup of one group's materialized row(s): a
        partition-pruned read, no recomputation; empty for unknown keys
        (Executer.cs:373-374 semantics)."""
        df = self._read(self._final_path)
        if df is None:
            return self.spark.createDataFrame([], schema="key string")
        span = (
            self.spark.range(1)
            .select(self._kspan(*[F.lit(v) for v in key_values]).alias("s"))
            .first()
            .s
        )
        out = df.filter(F.col("kspan") == span)
        for col, val in zip(self.group_cols, key_values):
            out = out.filter(F.col(col) == val)
        return out.drop("kspan")

    def drop_key(self, *key_values) -> None:
        """Remove one group's materialized rows (the reference's dead
        ``Storage.Delete``, Executer.cs:222-238, exposed for real)."""
        df = self._read(self._final_path)
        if df is None:
            return
        span = (
            self.spark.range(1)
            .select(self._kspan(*[F.lit(v) for v in key_values]).alias("s"))
            .first()
            .s
        )
        keep = df.filter(F.col("kspan") == span)
        for col, val in zip(self.group_cols, key_values):
            keep = keep.filter(~(F.col(col) == val))
        if keep.isEmpty():
            shutil.rmtree(
                os.path.join(self._final_path, f"kspan={span}"), ignore_errors=True
            )
        else:
            self._staged_overwrite(keep, self._final_path, "kspan")
