"""Streaming twin: the reference's repeated-Execute pattern as
Structured Streaming micro-batches (trigger(availableNow) replay)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from updatable_persistent_map_reduce_spark.streaming import (
    StreamingMapReduceView,
    streaming_tumbling_counts,
)


def _write_batch(spark, path, rows, schema, n=1, cast_ts=False):
    df = spark.createDataFrame(rows, schema)
    if cast_ts:
        df = df.withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(0.05)  # distinct mtimes so file-order == producer order


def test_streaming_upsert_scenario(spark, tmp_path):
    """The reference smoke scenario (Program.cs:26-44) delivered as a
    stream: batch files dropped into a dir, processed as micro-batches,
    same persistent store + invariants."""
    inp = str(tmp_path / "inbox")
    os.makedirs(inp)
    schema = "doc_id string, seq long, state string"
    _write_batch(
        spark,
        inp,
        [(f"people-{i}", 1, "CA") for i in range(1, 398)]
        + [(f"people-{i}", 1, "TX") for i in range(398, 654)],
        schema,
    )
    _write_batch(spark, inp, [("people-30", 2, "TX")], schema)

    sv = StreamingMapReduceView(
        spark,
        str(tmp_path / "store"),
        input_path=inp,
        input_schema=schema,
        checkpoint_path=str(tmp_path / "ckpt"),
        id_col="doc_id",
        seq_col="seq",
        group_cols=["state"],
        agg_exprs=[F.count(F.lit(1)).alias("cnt")],
        n_key_spans=8,
        n_doc_spans=8,
    )
    sv.run_available_now()
    counts = {r["state"]: r["cnt"] for r in sv.final_df().collect()}
    assert counts == {"CA": 396, "TX": 257}
    assert sum(counts.values()) == 653

    # late producer batch arrives -> incremental catch-up run
    _write_batch(spark, inp, [("people-31", 3, "TX")], schema)
    sv.run_available_now()
    counts = {r["state"]: r["cnt"] for r in sv.final_df().collect()}
    assert counts == {"CA": 395, "TX": 258}
    [row] = sv.query("TX").collect()
    assert row["cnt"] == 258


def test_streaming_tumbling_watermark(spark, tmp_path):
    """Native watermarked update-mode window agg over a file stream
    equals the batch tumbling aggregation of the same data."""
    inp = str(tmp_path / "events_in")
    os.makedirs(inp)
    schema = "event_id long, ts timestamp, event_type string, value double"
    rows = [
        (i, f"2026-01-01 {h:02d}:{m:02d}:00", t, float(i))
        for i, (h, m, t) in enumerate(
            [
                (0, 5, "click"),
                (0, 30, "click"),
                (0, 45, "view"),
                (1, 10, "click"),
                (2, 0, "view"),
                (2, 59, "view"),
            ]
        )
    ]
    df_rows = [(i, ts, t, v) for (i, ts, t, v) in rows]
    src = spark.createDataFrame(df_rows, "event_id long, ts string, event_type string, value double")
    src = src.withColumn("ts", F.to_timestamp("ts"))
    src.coalesce(1).write.mode("append").parquet(inp)

    streaming_tumbling_counts(
        spark,
        input_path=inp,
        input_schema=schema,
        checkpoint_path=str(tmp_path / "ckpt2"),
        ts_col="ts",
        key_cols=("event_type",),
        window="1 hour",
        watermark="1 hour",
        sink_table="t_tumbling",
    )
    got = {
        (str(r["win_start"]), r["event_type"]): r["cnt"]
        for r in spark.sql("select * from t_tumbling").collect()
    }
    expected = {
        ("2026-01-01 00:00:00", "click"): 2,
        ("2026-01-01 00:00:00", "view"): 1,
        ("2026-01-01 01:00:00", "click"): 1,
        ("2026-01-01 02:00:00", "view"): 2,
    }
    assert got == expected


def test_streaming_dedup(spark, tmp_path):
    """Streaming exact dedup (dropDuplicatesWithinWatermark on the
    sha2 content key): first-seen doc survives, duplicates within the
    watermark horizon are dropped, distinct texts pass through —
    including across micro-batches (state rides the checkpoint)."""
    from updatable_persistent_map_reduce_spark.streaming.stream_view import (
        streaming_dedup,
    )

    inp = str(tmp_path / "dedup_inbox")
    os.makedirs(inp)
    schema = "doc_id long, ts timestamp, text string"
    base = "2026-01-01 00:{m:02d}:00"
    _write_batch(
        spark,
        inp,
        [
            (1, base.format(m=0), "alpha beta"),
            (2, base.format(m=1), "alpha beta"),  # dup of 1, same batch
            (3, base.format(m=2), "gamma delta"),
        ],
        "doc_id long, ts string, text string",
        cast_ts=True,
    )
    _write_batch(
        spark,
        inp,
        [
            (4, base.format(m=3), "alpha beta"),  # dup of 1, next batch
            (5, base.format(m=4), "epsilon"),
        ],
        "doc_id long, ts string, text string",
        cast_ts=True,
    )
    streaming_dedup(
        spark,
        input_path=inp,
        input_schema=schema,
        checkpoint_path=str(tmp_path / "dedup_ckpt"),
        ts_col="ts",
        text_col="text",
        watermark="1 hour",
        sink_table="deduped_t",
    )
    kept = {r.doc_id for r in spark.table("deduped_t").collect()}
    assert kept == {1, 3, 5}


def test_streaming_sessionize(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-user gap
    sessionization; an event > gap after the previous closes the open
    session; open sessions persist in state across micro-batches."""
    from datetime import datetime, timedelta

    from updatable_persistent_map_reduce_spark.streaming.stream_view import (
        streaming_sessionize,
    )

    inp = str(tmp_path / "sess_inbox")
    os.makedirs(inp)
    schema = "event_id long, ts timestamp, user_id long, value double"
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + timedelta(seconds=sec)  # noqa: E731
    # user 1: events at 0s, 10s (session A), then 4000s, 4005s
    # (session B -> closes A), then 9000s (closes B, opens C).
    # user 2: one event only — never closed, stays in state.
    _write_batch(
        spark,
        inp,
        [
            (1, s(0), 1, 1.0),
            (2, s(10), 1, 2.0),
            (3, s(4000), 1, 3.0),
        ],
        schema,
    )
    _write_batch(
        spark,
        inp,
        [
            (4, s(4005), 1, 4.0),
            (5, s(9000), 1, 5.0),
            (6, s(0), 2, 9.0),
        ],
        schema,
    )
    streaming_sessionize(
        spark,
        input_path=inp,
        input_schema=schema,
        checkpoint_path=str(tmp_path / "sess_ckpt"),
        gap_seconds=1800,
        sink_table="closed_sessions_t",
    )
    rows = {
        (r.user_id, r.n_events, r.total_value, r.session_start, r.session_end)
        for r in spark.table("closed_sessions_t").collect()
    }
    assert rows == {
        (1, 2, 3.0, s(0), s(10)),      # session A: events 1,2
        (1, 2, 7.0, s(4000), s(4005)), # session B: events 3,4
    }


def test_streaming_inline_maintenance(spark, tmp_path):
    """maintenance_every compacts map files, drops stale index entries,
    and vacuums unreferenced data mid-stream without changing results."""
    inp = str(tmp_path / "inbox")
    os.makedirs(inp)
    schema = "doc_id string, seq long, state string"
    for b in range(4):  # 4 producer batches, same span -> file pile-up
        _write_batch(
            spark, inp, [(f"d-{b}-{i}", b, "CA") for i in range(5)], schema
        )

    sv = StreamingMapReduceView(
        spark,
        str(tmp_path / "store"),
        input_path=inp,
        input_schema=schema,
        checkpoint_path=str(tmp_path / "ckpt"),
        id_col="doc_id",
        seq_col="seq",
        group_cols=["state"],
        agg_exprs=[F.count(F.lit(1)).alias("cnt")],
        n_key_spans=4,
        n_doc_spans=4,
        n_sub_buckets=1,  # all of a key-span in one pair -> file pile-up
        max_files_per_trigger=1,  # one micro-batch per producer file
        maintenance_every=2,
    )
    sv.run_available_now()
    counts = {r["state"]: r["cnt"] for r in sv.final_df().collect()}
    assert counts == {"CA": 20}
    # compaction ran: the CA span holds fewer files than batches
    assert sv.view.stats()["map_results"]["files"] < 4


def test_streaming_sliding_windows(spark, tmp_path):
    """Sliding 1h/15min windows over a file stream: every event lands
    in 4 overlapping window states, matching the batch q_stream_sliding
    semantics (window starts at floor-to-15min minus k*15min)."""
    inp = str(tmp_path / "events_slide")
    os.makedirs(inp)
    schema = "event_id long, ts timestamp, event_type string, value double"
    src = spark.createDataFrame(
        [(0, "2026-01-01 01:05:00", "click", 1.0)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    src.coalesce(1).write.mode("append").parquet(inp)

    streaming_tumbling_counts(
        spark,
        input_path=inp,
        input_schema=schema,
        checkpoint_path=str(tmp_path / "ckpt_slide"),
        ts_col="ts",
        key_cols=("event_type",),
        window="1 hour",
        slide="15 minutes",
        watermark="1 hour",
        sink_table="t_sliding",
    )
    got = sorted(
        str(r["win_start"])
        for r in spark.sql("select * from t_sliding").collect()
    )
    assert got == [
        "2026-01-01 00:15:00",
        "2026-01-01 00:30:00",
        "2026-01-01 00:45:00",
        "2026-01-01 01:00:00",
    ]
    assert all(
        r["cnt"] == 1 for r in spark.sql("select * from t_sliding").collect()
    )


def test_streaming_checkpoint_recovery(spark, tmp_path):
    """Restarting a watermarked windowed aggregation from its
    checkpoint resumes STATE, not just position: a second batch into an
    already-counted window must emit the cumulative count (2+1=3), not
    a fresh one — the exactly-once recovery contract the engine's
    batch-side recovery journal mirrors (tests/test_recovery.py).
    Uses foreachBatch (the memory sink does not support checkpoint
    recovery)."""
    inp = str(tmp_path / "events_rec")
    os.makedirs(inp)
    schema = "event_id long, ts timestamp, event_type string, value double"

    def write(rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").parquet(inp)

    def run_once(out):
        stream = spark.readStream.schema(schema).parquet(inp)
        windowed = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.col("w.start").alias("win_start"), "event_type", "cnt"
            )
        )
        q = (
            windowed.writeStream.outputMode("update")
            .foreachBatch(lambda df, bid: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt_rec"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write([(0, "2026-01-01 00:05:00", "click", 1.0),
           (1, "2026-01-01 00:20:00", "click", 1.0)])
    out1 = []
    run_once(out1)
    got1 = {(str(r["win_start"]), r["event_type"]): r["cnt"] for r in out1}
    assert got1 == {("2026-01-01 00:00:00", "click"): 2}

    # restart from the same checkpoint; only the new file is processed,
    # but the window's count continues from recovered state
    write([(2, "2026-01-01 00:40:00", "click", 1.0)])
    out2 = []
    run_once(out2)
    got2 = {(str(r["win_start"]), r["event_type"]): r["cnt"] for r in out2}
    assert got2 == {("2026-01-01 00:00:00", "click"): 3}


def test_streaming_interval_join(spark, tmp_path):
    """Stream-stream attribution join: purchases match a same-user
    click within 30 minutes; outside-window or other-user purchases
    don't. Watermarks on both sides bound the join state."""
    from updatable_persistent_map_reduce_spark.streaming.stream_view import (
        streaming_interval_join,
    )

    inp = str(tmp_path / "events_join")
    os.makedirs(inp)
    schema = "event_id long, ts timestamp, event_type string, value double, user_id long"
    rows = [
        (0, "2026-01-01 00:00:00", "click", 0.0, 1),
        (1, "2026-01-01 00:10:00", "purchase", 9.0, 1),  # within 30m -> match
        (2, "2026-01-01 02:00:00", "purchase", 9.0, 1),  # too late -> no match
        (3, "2026-01-01 00:05:00", "purchase", 9.0, 2),  # no click -> no match
        (4, "2026-01-01 05:00:00", "view", 0.0, 1),  # watermark advancer
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double, user_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("append").parquet(inp)

    streaming_interval_join(
        spark,
        input_path=inp,
        input_schema=schema,
        checkpoint_path=str(tmp_path / "ckpt_join"),
        sink_table="t_attr",
    )
    got = [
        (r["c_user"], r["click_id"], r["buy_id"])
        for r in spark.sql("select * from t_attr").collect()
    ]
    assert got == [(1, 0, 1)]


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_ok(),
    reason="transformWithState's streaming Python runner needs "
    "google.protobuf, absent/broken in this container",
)
def test_transform_with_state_v2_surface(spark, tmp_path):
    """Spark 4's state-v2 API (transformWithStateInPandas): the
    successor to applyInPandasWithState. Gated on protobuf (the
    streaming Python runner's wire format); the production sessionizer
    stays on applyInPandasWithState until the environment carries it.
    Semantics under test: per-key ValueState accumulation across
    micro-batches."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
    )

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    _write_batch(
        spark, inp, [(1, 10.0), (1, 20.0), (2, 5.0)],
        "user_id long, value double",
    )
    _write_batch(spark, inp, [(1, 7.0)], "user_id long, value double")

    class Totals(StatefulProcessor):
        def init(self, handle):
            self.state = handle.getValueState("acc", "total double")

        def handleInputRows(self, key, rows, timer_values):
            prev = self.state.get()
            total = float(prev[0]) if prev is not None else 0.0
            for pdf in rows:
                total += float(pdf["value"].sum())
            self.state.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "total": [total]})

        def close(self):
            pass

    stream = spark.readStream.schema("user_id long, value double").parquet(
        inp
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType="user_id long, total double",
        outputMode="Update",
        timeMode="None",
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_v2")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r["user_id"]: r["total"]
        for r in spark.sql(
            "SELECT user_id, max(total) AS total FROM tws_v2 "
            "GROUP BY user_id"
        ).collect()
    }
    assert rows == {1: 37.0, 2: 5.0}


def test_streaming_takedown_restart_applies_deletes(spark, tmp_path):
    """Takedowns on the stream survive a RESTART: a first session
    ingests upserts; a fresh StreamingMapReduceView over the same
    store + checkpoint then receives a producer batch mixing upserts
    and op='delete' rows — the checkpoint skips the already-applied
    file, the new batch's upserts apply first and its takedowns win
    over a co-batched upsert of the same doc (CDC delete-after-image
    ordering), and re-running with no new input is a no-op."""
    inp = str(tmp_path / "inbox_td")
    os.makedirs(inp)
    schema = "doc_id string, seq long, state string, op string"

    def mk(**kw):
        return StreamingMapReduceView(
            spark,
            str(tmp_path / "store_td"),
            input_path=inp,
            input_schema=schema,
            checkpoint_path=str(tmp_path / "ckpt_td"),
            id_col="doc_id",
            seq_col="seq",
            group_cols=["state"],
            agg_exprs=[F.count(F.lit(1)).alias("cnt")],
            n_key_spans=8,
            n_doc_spans=8,
            op_col="op",
            **kw,
        )

    _write_batch(
        spark,
        inp,
        [(f"u{i}", 1, "CA", "upsert") for i in range(10)]
        + [(f"u{i}", 1, "TX", "upsert") for i in range(10, 16)],
        schema,
    )
    sv = mk()
    sv.run_available_now()
    counts = {r["state"]: r["cnt"] for r in sv.final_df().collect()}
    assert counts == {"CA": 10, "TX": 6}

    # restart: NEW view instance, same store/checkpoint; the batch
    # mixes an upsert of u20, a delete of existing u3, and an
    # upsert+delete of the SAME doc u10 (delete must win)
    _write_batch(
        spark,
        inp,
        [
            ("u20", 2, "CA", "upsert"),
            ("u3", 2, "", "delete"),
            ("u10", 2, "CA", "upsert"),
            ("u10", 3, "", "delete"),
        ],
        schema,
    )
    sv2 = mk()
    sv2.run_available_now()
    counts = {r["state"]: r["cnt"] for r in sv2.final_df().collect()}
    # CA: 10 - u3 + u20 = 10; TX: 6 - u10 = 5
    assert counts == {"CA": 10, "TX": 5}

    # idempotent catch-up: nothing new -> nothing changes
    sv2.run_available_now()
    counts = {r["state"]: r["cnt"] for r in sv2.final_df().collect()}
    assert counts == {"CA": 10, "TX": 5}


def test_streaming_pattern_match_spans_micro_batches(spark, tmp_path):
    """Streaming CEP continuation: a click run SPLIT ACROSS
    micro-batches (maxFilesPerTrigger=1) still matches exactly once
    with the full burst length — the four-scalar automaton state is
    what carries it; and a noise run between view and click kills the
    match exactly as in the batch twin."""
    from datetime import datetime, timedelta

    from updatable_persistent_map_reduce_spark.streaming.stream_view import (
        streaming_pattern_match,
    )

    inp = str(tmp_path / "pat_inbox")
    os.makedirs(inp)
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    t0 = datetime(2024, 1, 1)
    s = lambda sec: t0 + timedelta(seconds=sec)  # noqa: E731
    # batch 1: user 1 view + 2 clicks; user 2 view, then error noise
    _write_batch(
        spark,
        inp,
        [
            (1, s(0), 1, "view"),
            (1, s(10), 2, "click"),
            (1, s(20), 3, "click"),
            (2, s(0), 4, "view"),
            (2, s(10), 5, "error"),
        ],
        schema,
    )
    # batch 2: user 1's run CONTINUES (click) then closes (purchase);
    # user 2's clicks follow noise -> prev run is error, no match
    _write_batch(
        spark,
        inp,
        [
            (1, s(30), 6, "click"),
            (1, s(40), 7, "purchase"),
            (2, s(20), 8, "click"),
            (2, s(30), 9, "purchase"),
        ],
        schema,
    )
    streaming_pattern_match(
        spark,
        input_path=inp,
        input_schema=schema,
        checkpoint_path=str(tmp_path / "pat_ckpt"),
        sink_table="pattern_t",
        max_files_per_trigger=1,
    )
    rows = [tuple(r) for r in spark.table("pattern_t").collect()]
    # ONE match, burst length 3 (2 clicks from batch 1 + 1 from
    # batch 2); user 2 never matches
    assert rows == [(1, 1, 3)]


def test_streaming_join_view_out_of_order_and_migration(spark, tmp_path):
    """streaming_join_view converges to the same answer regardless of
    micro-batch arrival order (latest-wins by seq), carries state
    across batches, and handles the changelog migration contract
    (retraction at old key + insert at new key)."""
    import uuid as _uuid

    from updatable_persistent_map_reduce_spark.streaming.stream_view import (
        streaming_join_view,
    )

    schema = (
        "seq bigint, side string, ckey bigint, okey bigint, "
        "cents bigint, segment string"
    )
    dim = lambda seq, ckey, seg: (seq, "dim", ckey, None, None, seg)  # noqa: E731
    fact = lambda seq, ckey, okey, c: (seq, "fact", ckey, okey, c, None)  # noqa: E731

    # final intent: k1='a' holds fact 10 (v 5); fact 11 migrated
    # k1 -> k2 with value 9; k2='b' re-attributed to 'c'; fact 12
    # deleted. Batches arrive OUT OF ORDER (deletes and migration
    # before the facts they modify).
    batches = [
        [fact(60, 2, 12, None)],                      # delete, early
        [fact(50, 1, 11, None), fact(51, 2, 11, 9)],  # migration, early
        [dim(40, 2, "c")],                            # re-attribution
        [fact(20, 1, 10, 5), fact(20, 1, 11, 7)],
        [fact(21, 2, 12, 4)],
        [dim(10, 1, "a"), dim(10, 2, "b")],           # dims LAST
    ]
    inp = str(tmp_path / "in")
    for rows in batches:
        _write_batch(spark, inp, rows, schema)
    sink = f"sjv_test_{_uuid.uuid4().hex[:8]}"
    streaming_join_view(
        spark,
        input_path=inp,
        input_schema=schema,
        checkpoint_path=str(tmp_path / "ckpt"),
        sink_table=sink,
        max_files_per_trigger=1,
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("ckey").orderBy(F.col("ver").desc())
    latest = (
        spark.table(sink)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("segment").isNotNull())
    )
    got = {
        r["segment"]: (r["cnt"], r["sv"])
        for r in latest.collect()
        if r["cnt"] > 0
    }
    # k1: fact 10 only (11 migrated away)  -> 'a': (1, 5)
    # k2: fact 11 (migrated, v 9); 12 deleted; segment 'c' (seq 40)
    assert got == {"a": (1, 5), "c": (1, 9)}
    # every key emitted once per micro-batch it appeared in — state
    # genuinely carried across batches (k1 appears in 3 batches)
    per_batch = spark.table(sink).groupBy("ckey").count().collect()
    counts = {r["ckey"]: r["count"] for r in per_batch}
    assert counts[1] == 3 and counts[2] == 5


def test_streaming_join_view_restart_resumes_state(spark, tmp_path):
    """Per-key state survives a query RESTART on the same checkpoint:
    a first availableNow run ingests the dims and half the facts; a
    SECOND run (fresh query, same checkpoint + sink lineage) feeds a
    dim re-attribution and a fact retraction — their emissions must
    reflect the FIRST run's state (facts it never saw re-attributed,
    a fact it never saw retracted), proving the state store, not the
    replayed input, carried the view."""
    import uuid as _uuid

    from updatable_persistent_map_reduce_spark.streaming.stream_view import (
        streaming_join_view,
    )

    schema = (
        "seq bigint, side string, ckey bigint, okey bigint, "
        "cents bigint, segment string"
    )
    dim = lambda seq, ckey, seg: (seq, "dim", ckey, None, None, seg)  # noqa: E731
    fact = lambda seq, ckey, okey, c: (seq, "fact", ckey, okey, c, None)  # noqa: E731
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: dims + two facts under key 1
    _write_batch(spark, inp, [dim(10, 1, "a")], schema)
    _write_batch(
        spark, inp, [fact(20, 1, 100, 5), fact(20, 1, 101, 7)], schema
    )
    streaming_join_view(
        spark, input_path=inp, input_schema=schema,
        checkpoint_path=ckpt, out_path=out, max_files_per_trigger=1,
    )
    # run 2 (restart): re-attribute key 1 and retract fact 100 only —
    # the checkpoint skips run 1's files; only the state store can
    # supply the facts these deltas modify
    _write_batch(
        spark, inp, [dim(30, 1, "b"), fact(40, 1, 100, None)], schema
    )
    streaming_join_view(
        spark, input_path=inp, input_schema=schema,
        checkpoint_path=ckpt, out_path=out, max_files_per_trigger=1,
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("ckey").orderBy(F.col("ver").desc())
    latest = (
        spark.read.parquet(out)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    got = {
        r["segment"]: (r["cnt"], r["sv"]) for r in latest.collect()
    }
    # fact 101 (seen only by run 1) must survive under the NEW segment
    # (seen only by run 2) with fact 100 retracted
    assert got == {"b": (1, 7)}
