"""Structured-Streaming twin of the batch MapReduceView.

The reference's call pattern — repeated ``Execute(batch)`` over a
persistent store (MapReduce/Program.cs:31,35 driving
Executer.cs:31-45) — IS Spark's micro-batch streaming model. Two
formulations are provided:

1. :class:`StreamingMapReduceView` — ``readStream`` over an input
   directory, ``foreachBatch`` feeding each micro-batch through the
   *same* batch core (plans/view.py). Every reference semantic
   (latest-wins upsert, key migration, dirty-span recompute,
   persisted point lookup) carries over unchanged, and the streaming
   checkpoint gives exactly-once per micro-batch on top.

2. :func:`streaming_tumbling_counts` — the fully-native formulation:
   watermarked update-mode stateful aggregation, where Spark's state
   store plays the role of the reference's persisted reduce tree with
   *per-group* (not per-span) incremental granularity — strictly
   finer than the reference's 256-bucket-span recompute
   (Executer.cs:305-367).

Scale notes: at 100 TB/day the input would be Kafka instead of files
(same plan shape); state-store backend RocksDB
(``spark.sql.streaming.stateStore.providerClass``); watermark bounds
state size; ``foreachBatch`` output uses the same dirty-span
partition overwrite as batch, so sink amplification is bounded by
span size not corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.view import MapFn, MapReduceView


class StreamingMapReduceView:
    """Maintain a persistent MapReduceView from a streaming source.

    ``input_path`` is a directory that upstream producers drop
    micro-batch files into (parquet). Each micro-batch is applied as
    one upsert batch. A ``seq_col`` in the data (producer-assigned,
    monotone) makes latest-wins deterministic even when the source
    coalesces several producer batches into one micro-batch.
    """

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        *,
        input_path: str,
        input_schema: str,
        checkpoint_path: str,
        id_col: str = "doc_id",
        seq_col: str | None = None,
        map_fn: MapFn | None = None,
        group_cols: Sequence[str],
        agg_exprs: Sequence[Column],
        n_key_spans: int = 64,
        n_doc_spans: int = 64,
        two_level: bool = False,
        n_sub_buckets: int = 8,
        max_files_per_trigger: int | None = None,
        maintenance_every: int | None = None,
        migrate_span_hash: bool = False,
        op_col: str | None = None,
        delete_op: str = "delete",
    ):
        self.spark = spark
        self.input_path = input_path
        self.input_schema = input_schema
        self.checkpoint = checkpoint_path
        self.seq_col = seq_col
        self.id_col = id_col
        self.max_files_per_trigger = max_files_per_trigger
        # Takedown routing (the reference's delete-and-reschedule,
        # Executer.cs:240-261, arriving ON THE STREAM): when ``op_col``
        # is set, rows whose op equals ``delete_op`` are takedown
        # events — their doc ids are removed from the view via
        # delete_docs AFTER the micro-batch's upserts apply, so a
        # delete wins over any co-batched upsert of the same doc
        # (a CDC feed's delete-after-image ordering). Both legs are
        # idempotent (latest-wins execute / no-op re-delete), so the
        # checkpoint's at-least-once foreachBatch replay converges.
        self.op_col = op_col
        self.delete_op = delete_op
        # Continuous ingest accumulates appended map files and replaced
        # spans' dead bytes; every N micro-batches fold small files,
        # drop stale index entries, and reclaim unreferenced data —
        # the table-service maintenance a long-running pipeline needs,
        # inlined into the stream (results are never affected).
        self.maintenance_every = maintenance_every
        self._batches_since_maintenance = 0
        user_map = map_fn or (lambda df: df)

        if seq_col is not None:
            # Latest-wins inside a coalesced micro-batch: keep each
            # doc's rows from its highest producer sequence only, then
            # apply the user map. (Cross-micro-batch latest-wins is the
            # view's replace semantics.)
            def seq_aware_map(df: DataFrame) -> DataFrame:
                latest = df.groupBy(F.col(id_col).alias("__id")).agg(
                    F.max(seq_col).alias("__maxseq")
                )
                newest = df.join(
                    F.broadcast(latest),
                    (df[id_col] == F.col("__id"))
                    & (df[seq_col] == F.col("__maxseq")),
                ).drop("__id", "__maxseq")
                return user_map(newest)

            effective_map = seq_aware_map
        else:
            effective_map = user_map

        self.view = MapReduceView(
            spark,
            store_path,
            id_col=id_col,
            map_fn=effective_map,
            group_cols=group_cols,
            agg_exprs=agg_exprs,
            n_key_spans=n_key_spans,
            n_doc_spans=n_doc_spans,
            two_level=two_level,
            n_sub_buckets=n_sub_buckets,
            migrate_span_hash=migrate_span_hash,
        )

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if self.op_col is not None:
            deletes = batch_df.filter(
                F.col(self.op_col) == self.delete_op
            )
            upserts = batch_df.filter(
                F.col(self.op_col) != self.delete_op
            ).drop(self.op_col)
            if not upserts.isEmpty():
                self.view.execute(upserts)
            # deletes LAST: within one micro-batch a takedown wins over
            # any upsert of the same doc (see __init__). Passed as a
            # DataFrame — a mass-takedown batch never collects ids to
            # the driver.
            dead = deletes.select(self.id_col)
            if not dead.isEmpty():
                self.view.delete_docs(dead)
        else:
            self.view.execute(batch_df)
        if self.maintenance_every:
            self._batches_since_maintenance += 1
            if self._batches_since_maintenance >= self.maintenance_every:
                self._batches_since_maintenance = 0
                self.view.compact_map()
                self.view.compact_index()
                self.view.vacuum()

    def run_available_now(self) -> None:
        """Process everything currently in the input dir, then stop
        (micro-batch replay for tests/backfill; a production run would
        use ``.trigger(processingTime=...)`` and ``.start()`` without
        awaiting)."""
        reader = self.spark.readStream.schema(self.input_schema)
        if self.max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", str(self.max_files_per_trigger)
            )
        stream = reader.parquet(self.input_path)
        q = (
            stream.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # read path delegates to the batch view (same persisted store)
    def query(self, *key_values) -> DataFrame:
        return self.view.query(*key_values)

    def final_df(self) -> DataFrame:
        return self.view.final_df()


def streaming_tumbling_counts(
    spark: SparkSession,
    *,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    agg_exprs: Sequence[Column] | None = None,
    sink_table: str = "tumbling_counts",
) -> None:
    """Native watermarked windowed aggregation: readStream ->
    withWatermark -> window groupBy -> update-mode memory sink (tests)
    — Spark's state store doing the reference's incremental
    maintenance with per-group granularity. ``slide`` turns the
    tumbling window into a sliding one (each event updates
    window/slide overlapping states — the streaming twin of
    q_stream_sliding). Returns when all currently-available input is
    processed."""
    aggs = list(agg_exprs) if agg_exprs else [F.count(F.lit(1)).alias("cnt")]
    stream = spark.readStream.schema(input_schema).parquet(input_path)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    windowed = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *key_cols)
        .agg(*aggs)
        .withColumn("win_start", F.col("w.start"))
        .drop("w")
    )
    q = (
        windowed.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_windowed_agg_resumable(
    spark: SparkSession,
    *,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    out_path: str,
    run_tag: int,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    window: str = "1 hour",
    watermark: str = "1 hour",
    agg_exprs: Sequence[Column] | None = None,
) -> None:
    """Watermarked update-mode windowed aggregation that SURVIVES a
    restart: ``foreachBatch`` appends each trigger's updated windows
    (tagged with ``run_tag``) to a parquet dir, so unlike the memory
    sink — which Spark refuses to recover from a checkpoint — a second
    call with the same ``checkpoint_path`` resumes the persisted
    watermark and aggregation state and processes only new input.
    The live result is, per (window, keys), the row with the highest
    run_tag; windows whose late arrivals were watermark-dropped are
    simply never re-emitted, so their last emission stands. At scale
    the out dir is a keyed table (Delta/Iceberg upsert or the store's
    dirty-span overwrite); append+latest-wins keeps this test shape
    deterministic under at-least-once foreachBatch."""
    aggs = list(agg_exprs) if agg_exprs else [F.count(F.lit(1)).alias("cnt")]
    stream = spark.readStream.schema(input_schema).parquet(input_path)
    windowed = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *key_cols)
        .agg(*aggs)
        .withColumn("win_start", F.col("w.start"))
        .drop("w")
    )

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.withColumn("run_tag", F.lit(run_tag)).write.mode(
            "append"
        ).parquet(out_path)

    q = (
        windowed.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_running_agg(
    spark: SparkSession,
    *,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    out_path: str,
    key_cols: Sequence[str] = ("event_type",),
    agg_exprs: Sequence[Column] | None = None,
    max_files_per_trigger: int = 1,
) -> None:
    """Un-windowed, un-watermarked update-mode running aggregation —
    the PURE cross-micro-batch key state the reference's repeated
    Execute loop maintains (dirty groups re-reduced per batch,
    Executer.cs:305-367): state is one row per distinct key, grows
    with key cardinality only (never with stream length), and each
    trigger emits exactly the keys that batch touched, with totals
    accumulated over EVERY batch so far. ``foreachBatch`` appends each
    trigger's updated keys (tagged with the batch id) to a parquet
    dir; the live table is latest-emission-wins per key. With
    ``maxFilesPerTrigger=1`` an availableNow run replays a staged
    multi-file producer as that many micro-batches, making the
    accumulation observable (per-key counts must grow across
    emissions). At scale the out dir is a keyed upsert table and the
    source is Kafka; the plan shape — shuffle by key into the state
    store, no watermark because totals never close — is identical."""
    aggs = list(agg_exprs) if agg_exprs else [F.count(F.lit(1)).alias("cnt")]
    stream = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    running = stream.groupBy(*key_cols).agg(*aggs)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_path)

    q = (
        running.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_enriched_counts(
    spark: SparkSession,
    *,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    dim_df: DataFrame,
    join_expr: Column,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("n_name",),
    window: str = "1 day",
    watermark: str = "1 hour",
    agg_exprs: Sequence[Column] | None = None,
    sink_table: str = "enriched_counts",
) -> None:
    """STREAM-STATIC enrichment join + watermarked windowed aggregate:
    readStream -> inner join against a static (batch) dimension ->
    window groupBy -> update-mode memory sink. The stream-static join
    is STATELESS — each micro-batch hash-joins against the dim with no
    state store involvement, and Spark broadcasts the dim side when it
    is small (the only sane shape: re-shuffling the stream per batch
    to co-locate with a large static side is the anti-pattern). The
    staple deployment pattern this models is Kafka events enriched
    against a slowly-changing reference table before aggregation."""
    aggs = list(agg_exprs) if agg_exprs else [F.count(F.lit(1)).alias("cnt")]
    stream = spark.readStream.schema(input_schema).parquet(input_path)
    enriched = stream.join(dim_df, join_expr)
    windowed = (
        enriched.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *key_cols)
        .agg(*aggs)
        .withColumn("win_start", F.col("w.start"))
        .drop("w")
    )
    q = (
        windowed.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_dedup(
    spark: SparkSession,
    *,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    sink_table: str = "deduped_stream",
) -> None:
    """Streaming exact dedup for a continuous ingest pipeline: keep the
    first-seen document per content hash, with the dedup state bounded
    by an event-time watermark (``dropDuplicatesWithinWatermark`` —
    duplicates arriving within the watermark horizon of the original
    are dropped; state for hashes older than the horizon is evicted, so
    state size tracks the horizon's document rate, not corpus size).

    This is the streaming twin of q_dedup_exact: the same
    ``sha2(text, 256)`` content key, applied at ingest time so
    duplicates never reach the corpus store. At 100 TB/day the content
    hash is computed map-side (codegen), the only shuffle is by hash
    key into the state store, and RocksDB holds the horizon's keys.
    Exactly-once per micro-batch via the checkpoint, as everywhere."""
    stream = spark.readStream.schema(input_schema).parquet(input_path)
    deduped = (
        stream.withColumn("content_hash", F.sha2(F.col(text_col), 256))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_sessionize(
    spark: SparkSession,
    *,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    gap_seconds: int = 1800,
    sink_table: str = "closed_sessions",
) -> None:
    """Custom stateful streaming operator: per-user sessionization via
    ``applyInPandasWithState`` — the escape hatch for stateful logic
    Spark's built-in aggregates can't express (the built-in
    ``session_window`` covers gap sessions; this demonstrates the
    *arbitrary*-state API: explicit per-key state schema, user
    open/close logic, incremental emission of closed sessions only).

    State per user = (session_start_us, last_ts_us, n_events,
    total_value). An event more than ``gap_seconds`` after the previous
    one closes the open session (emitted downstream) and opens a new
    one; the open session rides in the state store across micro-batches
    exactly as the reference's persisted partial aggregates ride across
    ``Execute`` calls (MapReduce/Executer.cs:192-203).

    Scale notes: state is partitioned by the group key across
    executors (RocksDB-backed at deployment scale); with event-time
    watermarks one would use ``GroupStateTimeout.EventTimeTimeout`` to
    also close sessions by timeout rather than only on a successor
    event — kept ``NoTimeout`` here so availableNow replays are
    deterministic for tests.
    """
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000
    out_schema = (
        "user_id bigint, session_start timestamp, session_end timestamp, "
        "n_events int, total_value double"
    )
    state_schema = "start long, last long, n int, total double"

    def sessionize(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = None, None, 0, 0.0
        closed: list[tuple] = []
        events = pd.concat(list(pdfs)).sort_values("ts")
        for ts, value in zip(events["ts"], events["value"]):
            ts_us = int(ts.value // 1_000)  # pandas ns -> us
            if last is not None and ts_us - last > gap_us:
                closed.append((user_id, start, last, n, total))
                start, n, total = ts_us, 0, 0.0
            if start is None:
                start = ts_us
            last = ts_us
            n += 1
            total += float(value)
        state.update((start, last, n, total))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([c[0] for c in closed], dtype="int64"),
                "session_start": pd.to_datetime(
                    [c[1] for c in closed], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [c[2] for c in closed], unit="us"
                ),
                "n_events": pd.Series([c[3] for c in closed], dtype="int32"),
                "total_value": pd.Series(
                    [c[4] for c in closed], dtype="float64"
                ),
            }
        )

    stream = spark.readStream.schema(input_schema).parquet(input_path)
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        sessionize,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _interval_join_frames(
    spark: SparkSession,
    input_path: str,
    input_schema: str,
    within: str,
    watermark: str,
    how: str,
) -> DataFrame:
    """Shared click->purchase attribution join for the inner and
    left-outer streaming interval-join entries: one definition of the
    sides, watermarks, and event-time-bounded condition, so the two
    registered queries can never drift apart."""
    stream = spark.readStream.schema(input_schema).parquet(input_path)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    buys = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("ts").alias("buy_ts"),
            F.col("event_id").alias("buy_id"),
        )
        .withWatermark("buy_ts", watermark)
    )
    return clicks.join(
        buys,
        F.expr(
            "c_user = b_user AND buy_ts >= click_ts "
            f"AND buy_ts <= click_ts + interval {within}"
        ),
        how,
    ).select("c_user", "b_user", "click_id", "buy_id", "click_ts", "buy_ts")


def streaming_interval_join_outer(
    spark: SparkSession,
    *,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    out_path: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "leftOuter",
) -> None:
    """LEFT OUTER (or, with ``how="fullOuter"``, FULL OUTER)
    stream-stream interval join: like
    :func:`streaming_interval_join` but clicks with NO purchase within
    ``within`` are ALSO emitted (null-extended) — once the global
    watermark proves no future purchase can still match. The global
    watermark is the MIN across both sides' watermark operators, so an
    outer result only flushes after BOTH sides observe later event
    time; a side that goes quiet pins the watermark and holds every
    unmatched row in state (the documented stream-stream outer-join
    behavior, and why the attested query advances both sides before
    draining). foreachBatch parquet sink: memory sinks refuse
    checkpoint recovery, and the two-run protocol needs a resumed
    query."""
    joined = _interval_join_frames(
        spark, input_path, input_schema, within, watermark, how
    )

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_path)

    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_interval_join(
    spark: SparkSession,
    *,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
    sink_table: str = "attributed",
) -> None:
    """Stream-stream interval join: attribute each purchase to a prior
    click of the same user within ``within`` — the classic streaming
    attribution join. Both sides carry watermarks and the join
    condition bounds event-time distance, so Spark can size and EVICT
    the join state (clicks older than watermark + interval drop from
    the state store); an unbounded stream-stream join would grow state
    forever. Append mode: a match emits once both sides are final.
    """
    joined = _interval_join_frames(
        spark, input_path, input_schema, within, watermark, "inner"
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_pattern_match(
    spark: SparkSession,
    *,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    sink_table: str = "pattern_matches",
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming CEP: MATCH_RECOGNIZE's PATTERN (view click+ purchase)
    detected INCREMENTALLY with O(1) state per user — the streaming
    twin of the batch ``q_pattern_match`` (operators/windows.py),
    which materializes the whole run sequence; here a match row is
    emitted the moment its closing purchase event arrives (the alert/
    trigger deployment shape), and the automaton carries only
    (prev_run_type, current_run_type, current_run_len, n_matches)
    across micro-batches — four scalars per user, NEVER the user's
    event history, so state size is bounded by key cardinality alone.

    Per event, in (ts, event_id) order: an event equal to the current
    run's type extends the run; a different type closes the run at a
    boundary, and the boundary IS the match test — a closing 'click'
    run whose predecessor run was 'view', closed by an arriving
    'purchase', emits (user_id, match_no, click_run). Noise types
    ('signup', 'error') close runs without matching, exactly like the
    batch form's run-level lag/lead. The open run never matches until
    a later event closes it — matching the batch form's NULL next_t
    on each user's final run.

    The reference analog is the repeated-``Execute`` micro-batch loop
    (MapReduce/Program.cs:31,35) with the automaton state riding the
    state store across calls as its persisted partial aggregates do
    (Executer.cs:192-203).
    """
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, match_no bigint, click_run bigint"
    state_schema = (
        "prev_t string, cur_t string, run_len long, n_matches long"
    )

    def advance(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            prev_t, cur_t, run_len, n_matches = state.get
        else:
            prev_t, cur_t, run_len, n_matches = None, None, 0, 0
        hits: list[tuple] = []
        ev = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for t in ev["event_type"]:
            if t == cur_t:
                run_len += 1
                continue
            # run boundary: the arriving type closes the current run,
            # and the boundary is the match test
            if cur_t == "click" and prev_t == "view" and t == "purchase":
                n_matches += 1
                hits.append((user_id, n_matches, run_len))
            prev_t, cur_t, run_len = cur_t, t, 1
        state.update((prev_t, cur_t, run_len, n_matches))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([h[0] for h in hits], dtype="int64"),
                "match_no": pd.Series([h[1] for h in hits], dtype="int64"),
                "click_run": pd.Series(
                    [h[2] for h in hits], dtype="int64"
                ),
            }
        )

    reader = spark.readStream.schema(input_schema)
    if max_files_per_trigger is not None:
        # test/backfill knob: cap files per micro-batch so a run can
        # genuinely SPAN batches — the cross-batch continuation the
        # four-scalar automaton state exists to carry
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    matches = stream.groupBy("user_id").applyInPandasWithState(
        advance,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    q = (
        matches.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_join_view(
    spark,
    input_path: str,
    input_schema: str,
    checkpoint_path: str,
    sink_table: str = "join_view_stream",
    max_files_per_trigger: int | None = None,
    out_path: str | None = None,
) -> None:
    """Streaming twin of the batch delta-join view (plans/join_view.py):
    a fact ⋈ dim aggregate maintained over ONE interleaved CDC stream
    of fact and dim images, keyed by the join key, with per-key state
    in ``applyInPandasWithState``.

    CDC contract (the Debezium/Flink changelog shape): every row is
    ``(seq, side, ckey, okey, cents, segment)`` — ``side='fact'``
    carries a fact image for join key ``ckey`` (``cents`` NULL = the
    fact's retraction), ``side='dim'`` carries the key's new dim
    attributes. An update that MOVES a fact between join keys arrives
    as two rows: a retraction at the old key and an insert at the new
    key — exactly what a changelog producer emits for a key-changing
    update, and what makes cross-key migration expressible with
    per-key state (the old key's state cannot otherwise learn the
    fact left). ``seq`` totally orders images of the same entity;
    state applies latest-wins BY SEQ, so micro-batch arrival order
    never changes the converged answer — the same out-of-order
    tolerance StreamingMapReduceView's seq_col gives doc upserts.

    State per join key: the key's live fact set as parallel arrays
    (okeys, seqs, cents — a retraction keeps a NULL-cents tombstone so
    an older straggler image cannot resurrect the fact), the current
    dim attributes, and an emission counter. Each micro-batch the key
    appears in emits one UPDATED contribution row ``(ckey, ver,
    segment, cnt, sv)``; the reader takes each key's newest row (max
    ver) and re-aggregates by segment — retro-propagation of a dim
    change therefore reaches the sink the micro-batch the change
    arrives, no fact re-delivery needed. State size is O(fact images
    ever seen per key) — live rows plus retraction tombstones (a
    tombstone must outlive any straggler image it guards against; a
    deployment would expire tombstones past a seq watermark, which
    the bounded availableNow replay here does not need) — bounded by
    key cardinality × fanout, never stream length; at deployment
    scale the per-key fact set is the same payload a shuffled batch
    join would co-locate anyway.

    Reference analog: the repeated-``Execute`` loop
    (MapReduce/Program.cs:31,35) with the view's persisted partials
    (Executer.cs:192-203) riding the state store — here extended
    across a two-table join the way plans/join_view.py extends the
    batch engine.
    """
    from collections.abc import Iterable, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "ckey bigint, ver bigint, segment string, cnt bigint, sv bigint"
    )
    state_schema = (
        "okeys array<long>, seqs array<long>, cents array<long>, "
        "dead array<boolean>, segment string, seg_seq long, ver long"
    )

    def advance(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (ckey,) = key
        if state.exists:
            okeys, seqs, cents, dead, segment, seg_seq, ver = state.get
            facts = {
                o: (s, c, d)
                for o, s, c, d in zip(okeys, seqs, cents, dead)
            }
        else:
            facts, segment, seg_seq, ver = {}, None, -1, 0
        rows = pd.concat(list(pdfs)).sort_values("seq")
        for _, r in rows.iterrows():
            seq = int(r["seq"])
            if r["side"] == "dim":
                if seq > seg_seq:
                    segment, seg_seq = r["segment"], seq
                continue
            okey = int(r["okey"])
            prev = facts.get(okey)
            if prev is not None and prev[0] >= seq:
                continue  # stale straggler image
            if pd.isna(r["cents"]):
                facts[okey] = (seq, 0, True)  # retraction tombstone
            else:
                facts[okey] = (seq, int(r["cents"]), False)
        ver += 1
        state.update(
            (
                list(facts.keys()),
                [v[0] for v in facts.values()],
                [v[1] for v in facts.values()],
                [v[2] for v in facts.values()],
                segment,
                seg_seq,
                ver,
            )
        )
        live = [v[1] for v in facts.values() if not v[2]]
        yield pd.DataFrame(
            {
                "ckey": pd.Series([ckey], dtype="int64"),
                "ver": pd.Series([ver], dtype="int64"),
                "segment": pd.Series([segment], dtype="object"),
                "cnt": pd.Series([len(live)], dtype="int64"),
                "sv": pd.Series([sum(live)], dtype="int64"),
            }
        )

    reader = spark.readStream.schema(input_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)
    contrib = stream.groupBy("ckey").applyInPandasWithState(
        advance,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
    if out_path is not None:
        # restart-capable sink: Spark refuses to recover a memory-sink
        # query from a checkpoint, so restart tests append each
        # trigger's emissions to parquet via foreachBatch (the same
        # trade streaming_windowed_counts_two_runs documents); the
        # live view stays latest-emission-wins per key (max ver).
        def sink(batch_df: DataFrame, _batch_id: int) -> None:
            batch_df.write.mode("append").parquet(out_path)

        q = (
            contrib.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return
    q = (
        contrib.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
