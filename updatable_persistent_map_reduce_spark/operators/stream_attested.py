"""Registry entries that drive the REAL Structured-Streaming path.

The batch twins in operators/windows.py prove the window semantics;
these two queries prove the streaming execution itself — readStream ->
watermarked stateful operator -> ``trigger(availableNow=True)`` ->
memory sink — and hand the drained sink to the same DuckDB oracle gate
every batch query faces. The reference's closest analog is its
repeated-``Execute`` micro-batch loop (MapReduce/Program.cs:31,35);
Spark's availableNow trigger is that loop with checkpointed
exactly-once per micro-batch.

Each run stages the input as parquet files in a fresh temp dir (the
"producer"), uses a fresh checkpoint (so every run is a cold, full
replay — the deterministic test/backfill mode), and a unique memory
sink name (memory sinks are session-global). At deployment scale the
input is Kafka and the sink a table, same plan shape; see
streaming/stream_view.py for the state-store scale notes.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import Catalog
from ..streaming.stream_view import streaming_dedup, streaming_interval_join
from . import register


def _stage(df: DataFrame, prefix: str, n_files: int = 4) -> tuple[str, str]:
    """Write ``df`` as a small multi-file parquet input dir plus a
    fresh checkpoint dir. n_files stays far under the default
    maxFilesPerTrigger, so availableNow processes everything as ONE
    micro-batch — watermark-based state eviction can then never race
    the data it would evict, keeping the replay deterministic."""
    root = tempfile.mkdtemp(prefix=prefix)
    inp = os.path.join(root, "in")
    ckpt = os.path.join(root, "ckpt")
    df.repartition(n_files).write.parquet(inp)
    return inp, ckpt


@register(
    "q_stream_interval_join",
    oracle=(
        "SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id, "
        "CAST(c.ts AS TIMESTAMP) AS click_ts, CAST(b.ts AS TIMESTAMP) AS buy_ts "
        "FROM events c JOIN events b ON c.user_id = b.user_id "
        "AND c.event_type = 'click' AND b.event_type = 'purchase' "
        "AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 30 MINUTE"
    ),
    doc="Stream-stream interval join, run on the ACTUAL streaming path: "
    "events staged to a parquet input dir, readStream on both sides, "
    "watermarked interval join (streaming/stream_view.py "
    "streaming_interval_join — click->purchase attribution within 30 "
    "min), availableNow trigger, memory sink drained as the result. "
    "Inner interval joins emit eagerly, so the single-micro-batch "
    "replay equals the batch join the oracle computes. State notes: "
    "watermark + interval bound let Spark evict click state older "
    "than horizon+interval; unbounded stream-stream joins grow state "
    "forever.",
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    inp, ckpt = _stage(ev, "upmr_stream_ij_")
    sink = f"ij_sink_{uuid.uuid4().hex[:8]}"
    streaming_interval_join(
        spark,
        input_path=inp,
        input_schema=(
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        ),
        checkpoint_path=ckpt,
        within="30 minutes",
        watermark="1 hour",
        sink_table=sink,
    )
    return spark.table(sink).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "buy_id",
        "click_ts",
        "buy_ts",
    )


@register(
    "q_stream_dedup",
    oracle="SELECT DISTINCT sha256(text) AS content_hash FROM documents",
    doc="Watermarked streaming exact dedup on the ACTUAL streaming "
    "path: documents staged with a producer ingest timestamp, "
    "readStream -> sha2(text) -> dropDuplicatesWithinWatermark "
    "(streaming/stream_view.py streaming_dedup), availableNow, memory "
    "sink. Which copy of a duplicate survives is a processing-order "
    "artifact, so the attested result is the surviving content-hash "
    "SET — exactly the distinct hashes of the corpus when every "
    "duplicate lands within the watermark horizon (single micro-batch "
    "here). The ingest-time twin of q_dedup_exact: duplicates are "
    "dropped before they ever reach the corpus store, with state "
    "bounded by the horizon's document rate, not corpus size.",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id",
        "text",
        # producer ingest timestamp: deterministic, spread over ms so
        # every duplicate pair is well inside the 1h watermark horizon.
        # Based at 2024-01-01, NOT epoch 0 — a row whose event time
        # equals the stream's initial watermark (epoch) is "late" and
        # silently dropped.
        F.timestamp_micros(
            F.col("doc_id") * 1000 + F.lit(1_704_067_200_000_000)
        ).alias("ts"),
    )
    inp, ckpt = _stage(docs, "upmr_stream_dd_")
    sink = f"dd_sink_{uuid.uuid4().hex[:8]}"
    streaming_dedup(
        spark,
        input_path=inp,
        input_schema="doc_id bigint, text string, ts timestamp",
        checkpoint_path=ckpt,
        ts_col="ts",
        text_col="text",
        watermark="1 hour",
        sink_table=sink,
    )
    return spark.table(sink).select("content_hash").distinct()


@register(
    "q_stream_sessionize",
    oracle=(
        "WITH o AS (SELECT user_id, ts, event_id, value, "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
        "FROM events), "
        "b AS (SELECT user_id, ts, event_id, value, "
        "CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE "
        "THEN 1 ELSE 0 END AS brk FROM o), "
        "s AS (SELECT user_id, ts, value, "
        "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM b), "
        "f AS (SELECT user_id, sid, CAST(min(ts) AS TIMESTAMP) AS session_start, "
        "CAST(max(ts) AS TIMESTAMP) AS session_end, "
        "CAST(count(*) AS INTEGER) AS n_events, "
        "round(CAST(sum(value) AS DOUBLE), 2) AS total_value "
        "FROM s GROUP BY user_id, sid) "
        "SELECT user_id, session_start, session_end, n_events, total_value "
        "FROM f WHERE sid < (SELECT max(sid) FROM f f2 "
        "WHERE f2.user_id = f.user_id)"
    ),
    doc="Arbitrary-state streaming sessionization run on the ACTUAL "
    "streaming path: events staged to parquet, readStream -> "
    "groupBy(user).applyInPandasWithState (explicit per-key state "
    "schema, 30-min-gap open/close logic — streaming/stream_view.py "
    "streaming_sessionize) -> availableNow -> memory sink. The "
    "operator emits a session only when a LATER event closes it "
    "(NoTimeout), so the attested result is every user's sessions "
    "EXCEPT their last — exactly what the gap-break-island oracle "
    "filters to. Session boundaries/counts/sums are tie-order "
    "independent, so the single-micro-batch replay is deterministic. "
    "Upgrades the applyInPandasWithState surface from harness-only "
    "to oracle-checked.",
)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_view import streaming_sessionize

    ev = Catalog(spark, sf_dir).events.select("user_id", "ts", "value")
    inp, ckpt = _stage(ev, "upmr_stream_sess_")
    sink = f"sess_sink_{uuid.uuid4().hex[:8]}"
    streaming_sessionize(
        spark,
        input_path=inp,
        input_schema="user_id bigint, ts timestamp, value double",
        checkpoint_path=ckpt,
        gap_seconds=1800,
        sink_table=sink,
    )
    return spark.table(sink).select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


@register(
    "q_stream_view_upsert",
    oracle=(
        "WITH latest AS (SELECT user_id, event_type, value FROM "
        "(SELECT user_id, event_type, value, "
        "row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) "
        "AS rn FROM events) WHERE rn = 1) "
        "SELECT event_type AS group_key, CAST(count(*) AS BIGINT) AS cnt, "
        "round(CAST(sum(value) AS DOUBLE), 2) AS value_sum "
        "FROM latest GROUP BY event_type"
    ),
    doc="The STREAMING twin of q_upsert_recount, driven end-to-end on "
    "the real path: events staged as three producer batch files, "
    "readStream with maxFilesPerTrigger=1 so availableNow replays "
    "them as three micro-batches, foreachBatch -> "
    "MapReduceView.execute with checkpointed exactly-once "
    "(streaming/stream_view.py StreamingMapReduceView). Producers are "
    "partitioned BY USER (user_id % 3), so each document's events "
    "land in exactly one micro-batch and seq_col=event_id resolves "
    "latest-wins inside it — the attested result is independent of "
    "micro-batch replay order (file mtime granularity, source "
    "coalescing). Cross-batch replacement order is driven "
    "deterministically by the batch twin and the streaming-harness "
    "pytest. The oracle is the identical latest-wins SQL the batch "
    "twin faces, so a green row attests that the reference's "
    "repeated-Execute call pattern (Program.cs:31,35) run as "
    "Structured Streaming converges to the same materialized groups.",
)
def q_stream_view_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_view import StreamingMapReduceView
    from .incremental import _latest_event_rereducible

    ev = Catalog(spark, sf_dir).events
    base = tempfile.mkdtemp(prefix="upmr_sview_")
    inbox = os.path.join(base, "inbox")
    os.makedirs(inbox)
    for b in range(3):
        batch = ev.filter(F.col("user_id") % 3 == b).select(
            F.col("user_id").cast("string").alias("doc_id"),
            "event_id",
            "user_id",
            "event_type",
            "value",
        )
        batch.coalesce(1).write.mode("append").parquet(inbox)
    sv = StreamingMapReduceView(
        spark,
        os.path.join(base, "store"),
        input_path=inbox,
        input_schema=(
            "doc_id string, event_id bigint, user_id bigint, "
            "event_type string, value double"
        ),
        checkpoint_path=os.path.join(base, "ckpt"),
        id_col="doc_id",
        seq_col="event_id",
        map_fn=_latest_event_rereducible,
        group_cols=["event_type"],
        agg_exprs=[
            F.sum("cnt").alias("cnt"),
            F.sum("value_sum").alias("value_sum"),
        ],
        n_key_spans=8,
        n_doc_spans=8,
        max_files_per_trigger=1,
    )
    sv.run_available_now()
    return sv.final_df().select(
        F.col("event_type").alias("group_key"),
        "cnt",
        F.round("value_sum", 2).alias("value_sum"),
    )


@register(
    "q_stream_enrich",
    oracle=(
        "SELECT CAST(date_trunc('day', CAST(e.ts AS TIMESTAMP)) "
        "AS TIMESTAMP) AS win_start, n.n_name, "
        "CAST(count(*) AS BIGINT) AS cnt, "
        "round(CAST(sum(e.value) AS DOUBLE), 2) AS value_sum "
        "FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey "
        "GROUP BY win_start, n.n_name"
    ),
    doc="STREAM-STATIC enrichment join on the ACTUAL streaming path: "
    "events staged to parquet, readStream -> inner join against the "
    "static nation dim (user_id % 25 as the foreign key — the test "
    "schema has no natural events FK, so the key is derived "
    "identically on both engines) -> watermarked daily windows per "
    "nation -> availableNow -> update-mode memory sink. The join is "
    "STATELESS (no state store): each micro-batch broadcast-hash-"
    "joins against the dim, the staple Kafka-events-enriched-by-"
    "reference-table deployment shape; only the downstream window "
    "aggregate holds state. Single micro-batch replay makes the "
    "update-mode emission set equal the batch join+aggregate the "
    "oracle computes. Completes the streaming-join surface: "
    "stream-stream is q_stream_interval_join, stream-static is this.",
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_view import streaming_enriched_counts

    cat = Catalog(spark, sf_dir)
    ev = cat.events.select("event_id", "ts", "user_id", "value")
    inp, ckpt = _stage(ev, "upmr_stream_enr_")
    sink = f"enr_sink_{uuid.uuid4().hex[:8]}"
    dim = cat.nation.select("n_nationkey", "n_name")
    streaming_enriched_counts(
        spark,
        input_path=inp,
        input_schema=(
            "event_id bigint, ts timestamp, user_id bigint, value double"
        ),
        checkpoint_path=ckpt,
        dim_df=dim,
        join_expr=F.col("user_id") % 25 == F.col("n_nationkey"),
        ts_col="ts",
        key_cols=("n_name",),
        window="1 day",
        watermark="1 hour",
        agg_exprs=[
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        ],
        sink_table=sink,
    )
    return spark.table(sink).select("win_start", "n_name", "cnt", "value_sum")


@register(
    "q_stream_late_data",
    oracle=(
        "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, "
        "event_type, value FROM events), "
        "wm AS (SELECT date_trunc('milliseconds', max(ts)) "
        "- INTERVAL 3541 SECOND AS w FROM ev WHERE event_id % 2 = 0), "
        "keep AS (SELECT * FROM ev WHERE event_id % 2 = 0 "
        "OR date_trunc('hour', ts) + INTERVAL 1 HOUR > (SELECT w FROM wm)) "
        "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, "
        "event_type, CAST(count(*) AS BIGINT) AS cnt, "
        "round(CAST(sum(value) AS DOUBLE), 2) AS value_sum "
        "FROM keep GROUP BY win_start, event_type"
    ),
    doc="Watermark LATE-DATA DROP attested end-to-end: two availableNow "
    "runs share one checkpoint. Run 1 aggregates the even-event_id "
    "half of the stream into hourly windows, persisting watermark = "
    "max(even ts, ms-truncated) - 3541 s in the checkpoint's commit "
    "log. Run 2 (a fresh query resuming that checkpoint) feeds the "
    "odd half — whose timestamps span the whole timeline, so roughly "
    "half arrive with window end <= the restored watermark and MUST "
    "be dropped (their state was evicted; at sf0.01 that is ~5k of "
    "10k run-2 rows — the oracle proves the drops happened, not just "
    "that on-time rows aggregated). The oracle recomputes Spark's "
    "exact eviction rule in SQL — keep odd rows iff window_end > "
    "watermark; the 3541 s delay is deliberately hour-unaligned so "
    "strict-vs-inclusive boundary semantics cannot coincide by "
    "accident, and the ms truncation mirrors Spark's event-time "
    "watermark granularity (verified exact at sf0.001/0.01/0.1). "
    "Update-mode emissions from both runs land tagged in a parquet "
    "dir (memory sinks refuse checkpoint recovery); the live table "
    "is latest-run-wins per window, so windows touched only by "
    "dropped rows keep their run-1 values. Moves watermark/late-data "
    "semantics from pytest-only (tests/test_streaming.py) into the "
    "driver-attested column.",
)
def q_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..streaming.stream_view import streaming_windowed_agg_resumable

    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "ts", "event_type", "value"
    )
    base = tempfile.mkdtemp(prefix="upmr_late_")
    inbox = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    os.makedirs(inbox)
    schema = "event_id bigint, ts timestamp, event_type string, value double"

    def run(tag: int) -> None:
        streaming_windowed_agg_resumable(
            spark,
            input_path=inbox,
            input_schema=schema,
            checkpoint_path=ckpt,
            out_path=out,
            run_tag=tag,
            ts_col="ts",
            key_cols=("event_type",),
            window="1 hour",
            watermark="3541 seconds",
            agg_exprs=[
                F.count(F.lit(1)).alias("cnt"),
                F.round(F.sum("value"), 2).alias("value_sum"),
            ],
        )

    # producer drop 1: the even half, one micro-batch, sets the watermark
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(inbox)
    run(1)
    # producer drop 2 AFTER run 1 stopped: the odd half, timestamps
    # spanning the whole timeline — the late ones must be dropped by
    # the watermark restored from the checkpoint
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(inbox)
    run(2)

    emitted = spark.read.parquet(out)
    return (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("win_start", "event_type").orderBy(
                    F.col("run_tag").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("win_start", "event_type", "cnt", "value_sum")
    )


@register(
    "q_stream_outer_join",
    oracle=(
        "SELECT c.user_id, c.event_id AS click_id, b.event_id AS buy_id, "
        "CAST(c.ts AS TIMESTAMP) AS click_ts, "
        "CAST(b.ts AS TIMESTAMP) AS buy_ts "
        "FROM events c LEFT JOIN events b ON c.user_id = b.user_id "
        "AND b.event_type = 'purchase' "
        "AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 30 MINUTE "
        "WHERE c.event_type = 'click'"
    ),
    doc="LEFT OUTER stream-stream interval join attested end-to-end "
    "(the outer half q_stream_interval_join's inner join can't show): "
    "matches emit eagerly in run 1; the null-extended unmatched "
    "clicks can only emit once the GLOBAL watermark — the MIN across "
    "both sides' watermark operators — passes click_ts + interval, so "
    "run 2 resumes the checkpoint and feeds one far-future dummy row "
    "PER SIDE (a click alone leaves the purchase side's watermark "
    "pinned at run-1's max and nothing would ever flush — verified "
    "while building this query). After run 2 every real unmatched "
    "click has flushed exactly once and the drained sink equals the "
    "batch LEFT JOIN the oracle computes; the dummies themselves "
    "stay in state (their own windows never close) and carry "
    "negative user_ids that are filtered out defensively. State "
    "notes: watermark + interval bound the retained rows on both "
    "sides; the quiet-side-pins-the-watermark behavior this query "
    "encodes is the thing to monitor in a deployment.",
)
def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_view import streaming_interval_join_outer

    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "ts", "user_id", "event_type"
    )
    base = tempfile.mkdtemp(prefix="upmr_outer_")
    inbox = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    os.makedirs(inbox)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"

    def run() -> None:
        streaming_interval_join_outer(
            spark,
            input_path=inbox,
            input_schema=schema,
            checkpoint_path=ckpt,
            out_path=out,
            within="30 minutes",
            watermark="1 hour",
        )

    ev.coalesce(2).write.mode("append").parquet(inbox)
    run()
    # one dummy per side, 30 days past everything: advances BOTH
    # watermark operators so every real click's join window closes
    [[mx]] = ev.agg(F.max("ts")).collect()
    dummies = spark.createDataFrame(
        [(-1, mx, -1, "click"), (-2, mx, -2, "purchase")], schema
    ).withColumn("ts", F.col("ts") + F.expr("interval 30 days"))
    dummies.coalesce(1).write.mode("append").parquet(inbox)
    run()

    emitted = spark.read.parquet(out).filter(F.col("c_user") >= 0)
    n_unmatched = emitted.filter(F.col("buy_id").isNull()).count()
    if n_unmatched == 0:
        raise RuntimeError(
            "no null-extended rows flushed — the two-run watermark "
            "advance stopped working, so this query degenerated to "
            "the inner join it exists to go beyond"
        )
    return emitted.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "buy_id",
        "click_ts",
        "buy_ts",
    )


@register(
    "q_stream_full_outer_join",
    oracle=(
        "SELECT c.user_id AS click_user, b.user_id AS buy_user, "
        "c.event_id AS click_id, b.event_id AS buy_id "
        "FROM (SELECT * FROM events WHERE event_type = 'click') c "
        "FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') b "
        "ON c.user_id = b.user_id "
        "AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 30 MINUTE"
    ),
    doc="FULL OUTER stream-stream interval join — completes the "
    "streaming join matrix (inner = q_stream_interval_join, left = "
    "q_stream_outer_join): BOTH sides' unmatched rows must flush "
    "(clicks with no purchase in-window AND purchases attributable "
    "to no click), each only when the global min-across-sides "
    "watermark proves no future match can arrive. Same two-run "
    "protocol: run 1 feeds the events and emits eager matches, run 2 "
    "resumes the checkpoint with one far-future dummy per side and "
    "drains every real unmatched row from both state stores. The "
    "oracle is the batch FULL JOIN of the filtered sides; dummies "
    "carry negative user ids and are filtered from the drained sink "
    "(their own windows never close, so they also never emit). The "
    "in-query guard requires null-extended rows from BOTH sides — "
    "degenerating to the left or inner behavior fails the gate.",
)
def q_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_view import streaming_interval_join_outer

    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "ts", "user_id", "event_type"
    )
    base = tempfile.mkdtemp(prefix="upmr_fouter_")
    inbox = os.path.join(base, "in")
    ckpt = os.path.join(base, "ckpt")
    out = os.path.join(base, "out")
    os.makedirs(inbox)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"

    def run() -> None:
        streaming_interval_join_outer(
            spark,
            input_path=inbox,
            input_schema=schema,
            checkpoint_path=ckpt,
            out_path=out,
            within="30 minutes",
            watermark="1 hour",
            how="fullOuter",
        )

    ev.coalesce(2).write.mode("append").parquet(inbox)
    run()
    [[mx]] = ev.agg(F.max("ts")).collect()
    spark.createDataFrame(
        [(-1, mx, -1, "click"), (-2, mx, -2, "purchase")], schema
    ).withColumn("ts", F.col("ts") + F.expr("interval 30 days")).coalesce(
        1
    ).write.mode("append").parquet(inbox)
    run()

    emitted = spark.read.parquet(out).filter(
        F.coalesce(F.col("c_user"), F.lit(0)) >= 0
    ).filter(F.coalesce(F.col("b_user"), F.lit(0)) >= 0)
    n_left = emitted.filter(F.col("buy_id").isNull()).count()
    n_right = emitted.filter(F.col("click_id").isNull()).count()
    if n_left == 0 or n_right == 0:
        raise RuntimeError(
            f"full-outer flush incomplete: {n_left} unmatched clicks, "
            f"{n_right} unmatched purchases — one side's state never "
            "drained, so this degenerated to a one-sided join"
        )
    return emitted.select(
        F.col("c_user").alias("click_user"),
        F.col("b_user").alias("buy_user"),
        "click_id",
        "buy_id",
    )


def _replayed_running_agg(
    spark: SparkSession,
    batches: list[DataFrame],
    input_schema: str,
    key_cols: tuple[str, ...],
    agg_exprs: list,
    grow_col: str,
    prefix: str,
) -> DataFrame:
    """Shared harness for the un-windowed update-mode attestations
    (q_stream_update_mode, q_stream_covariance): stage each pre-built
    batch frame as ONE producer file, replay with maxFilesPerTrigger=1
    so availableNow processes them as that many micro-batches, assert
    every key was emitted by >= len(batches) distinct micro-batches
    with ``grow_col`` GROWING across emissions (a single-batch
    recompute or a lost state store fails loudly), and return the
    latest emission per key. One harness, two attestations — a probe
    fix can never silently apply to only one of them."""
    from pyspark.sql import Window as W

    from ..streaming.stream_view import streaming_running_agg

    base = tempfile.mkdtemp(prefix=prefix)
    inbox = os.path.join(base, "in")
    out = os.path.join(base, "out")
    os.makedirs(inbox)
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(inbox)
    streaming_running_agg(
        spark,
        input_path=inbox,
        input_schema=input_schema,
        checkpoint_path=os.path.join(base, "ckpt"),
        out_path=out,
        key_cols=key_cols,
        agg_exprs=agg_exprs,
    )
    emitted = spark.read.parquet(out)
    probe = (
        emitted.groupBy(*key_cols)
        .agg(
            F.countDistinct("batch_id").alias("n_batches"),
            (F.max(grow_col) > F.min(grow_col)).alias("grew"),
        )
        .collect()
    )
    if not probe or any(
        r["n_batches"] < len(batches) or not r["grew"] for r in probe
    ):
        raise RuntimeError(
            f"running-state accumulation not observed: {probe[:5]}; the "
            "producer staging or maxFilesPerTrigger replay collapsed "
            "to fewer micro-batches, so this query would attest a "
            "plain batch aggregate"
        )
    return (
        emitted.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(*key_cols).orderBy(F.col("batch_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "batch_id")
    )


@register(
    "q_stream_update_mode",
    oracle=(
        "SELECT event_type AS group_key, CAST(count(*) AS BIGINT) AS cnt, "
        "round(CAST(sum(value) AS DOUBLE), 2) AS value_sum "
        "FROM events GROUP BY event_type"
    ),
    doc="UN-WINDOWED update-mode running aggregation on the ACTUAL "
    "streaming path — the purest form of the reference's architecture "
    "(per-group state accumulated across every Execute call, "
    "Executer.cs:305-367, with no window and no watermark because "
    "running totals never close): events staged as three producer "
    "files, readStream with maxFilesPerTrigger=1 so availableNow "
    "replays them as three micro-batches, groupBy(event_type) running "
    "count/sum, each trigger's updated keys appended tagged to a "
    "parquet dir. The query asserts in-query that every key was "
    "emitted by >= 3 distinct micro-batches AND that its count GREW "
    "across emissions — a single-batch recompute or a lost state "
    "store fails loudly; the attested result is the latest emission "
    "per key, hashed against the whole-corpus batch aggregate. State "
    "is one row per distinct key (cardinality-bounded, never "
    "stream-length-bounded) — the scale contract of update-mode "
    "state. Moves un-windowed update-mode state from pytest-only "
    "into the driver-attested column.",
)
def q_stream_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events.select(
        "event_id", "event_type", "value"
    )
    latest = _replayed_running_agg(
        spark,
        [ev.filter(F.col("event_id") % 3 == b) for b in range(3)],
        "event_id bigint, event_type string, value double",
        ("event_type",),
        [
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("value_sum"),
        ],
        grow_col="cnt",
        prefix="upmr_updmode_",
    )
    return latest.select(
        F.col("event_type").alias("group_key"),
        "cnt",
        F.round("value_sum", 2).alias("value_sum"),
    )


@register(
    "q_stream_checkpoint_recovery",
    oracle=(
        "WITH latest AS (SELECT user_id, event_type, value FROM "
        "(SELECT user_id, event_type, value, "
        "row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) "
        "AS rn FROM events) WHERE rn = 1) "
        "SELECT event_type AS group_key, CAST(count(*) AS BIGINT) AS cnt, "
        "round(CAST(sum(value) AS DOUBLE), 2) AS value_sum "
        "FROM latest GROUP BY event_type"
    ),
    doc="Checkpoint recovery attested end-to-end: TWO sequential "
    "availableNow runs SHARING one checkpoint and one persisted store. "
    "Run 1 processes the first half of the events (split by event_id); "
    "the query stops; a producer drops the second half; a FRESH "
    "StreamingMapReduceView (a restarted driver, as far as Spark is "
    "concerned) resumes from the same checkpoint and must process "
    "ONLY the new file. The result is hashed against the same "
    "latest-wins batch oracle as q_stream_view_upsert, which attests "
    "convergence (no loss, no duplication in the final table); the "
    "query additionally asserts the store executed exactly 2 upsert "
    "batches — if the checkpoint resume replayed run 1's file, "
    "batch_seq would be 3 and the query fails loudly rather than "
    "letting the engine's latest-wins idempotency mask the replay. "
    "This moves checkpoint-state recovery from pytest-only "
    "(tests/test_streaming.py) into the driver-attested column.",
)
def q_stream_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_view import StreamingMapReduceView
    from .incremental import _latest_event_rereducible

    ev = Catalog(spark, sf_dir).events.select(
        F.col("user_id").cast("string").alias("doc_id"),
        "event_id",
        "user_id",
        "event_type",
        "value",
    )
    [[mid]] = ev.agg(
        F.percentile_approx("event_id", F.lit(0.5), F.lit(100))
    ).collect()
    base = tempfile.mkdtemp(prefix="upmr_ckptrec_")
    inbox = os.path.join(base, "inbox")
    os.makedirs(inbox)
    schema = (
        "doc_id string, event_id bigint, user_id bigint, "
        "event_type string, value double"
    )

    def make_view() -> StreamingMapReduceView:
        # a fresh instance per run = a restarted driver: nothing
        # carries over but the checkpoint dir and the store on disk
        return StreamingMapReduceView(
            spark,
            os.path.join(base, "store"),
            input_path=inbox,
            input_schema=schema,
            checkpoint_path=os.path.join(base, "ckpt"),
            id_col="doc_id",
            seq_col="event_id",
            map_fn=_latest_event_rereducible,
            group_cols=["event_type"],
            agg_exprs=[
                F.sum("cnt").alias("cnt"),
                F.sum("value_sum").alias("value_sum"),
            ],
            n_key_spans=8,
            n_doc_spans=8,
        )

    # run 1: only the early half of the events exists yet
    ev.filter(F.col("event_id") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(inbox)
    make_view().run_available_now()

    # the producer drops the late half AFTER run 1 stopped; run 2
    # resumes from the shared checkpoint. Latest-wins is the batch
    # order: every doc's run-2 events carry higher event_ids, so the
    # converged store equals the global latest-wins oracle.
    ev.filter(F.col("event_id") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(inbox)
    sv2 = make_view()
    sv2.run_available_now()

    seq = sv2.view.stats()["batch_seq"]
    if seq != 2:
        raise AssertionError(
            f"checkpoint resume replayed input: batch_seq={seq}, want 2 "
            "(one upsert per producer file; a replayed file would be "
            "invisible in the latest-wins result, so it is checked here)"
        )
    return sv2.final_df().select(
        F.col("event_type").alias("group_key"),
        "cnt",
        F.round("value_sum", 2).alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# streaming ingest near-dup gate — the persisted band index driven by
# the real streaming path.

_GATE_JACC = (
    "2 * len(list_intersect(s.sh, c.sh)) "
    ">= len(list_distinct(list_concat(s.sh, c.sh)))"
)
_GATE_SHINGLES = r"""
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     t -> t <> '') AS tk
  FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(tk) <= 3 THEN [array_to_string(tk, ' ')]
              ELSE list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
         END AS sh
  FROM toks)
"""


def _gate_batch_sql(b: int, accepted_ctes: list[str]) -> str:
    """dup decision CTE for micro-batch ``b``: a streamed doc is a dup
    iff a J >= 1/2 neighbor exists in the corpus or in a PRIOR batch's
    accepted set (the index state when batch b is probed)."""
    allowed = "c.doc_id % 5 <> 0"
    for a in accepted_ctes:
        allowed += f" OR c.doc_id IN (SELECT doc_id FROM {a})"
    return (
        f"dup{b} AS (SELECT s.doc_id, "
        f"EXISTS (SELECT 1 FROM sh c WHERE ({allowed}) "
        f"AND {_GATE_JACC}) AS is_dup "
        f"FROM sh s WHERE s.doc_id % 5 = 0 AND (s.doc_id // 5) % 3 = {b})"
    )


@register(
    "q_stream_neardup_gate",
    oracle=(
        "WITH " + _GATE_SHINGLES + ", "
        + _gate_batch_sql(0, [])
        + ", acc0 AS (SELECT doc_id FROM dup0 WHERE NOT is_dup), "
        + _gate_batch_sql(1, ["acc0"])
        + ", acc1 AS (SELECT doc_id FROM dup1 WHERE NOT is_dup), "
        + _gate_batch_sql(2, ["acc0", "acc1"])
        + " SELECT doc_id, CAST(is_dup AS BOOLEAN) AS is_dup FROM "
        "(SELECT * FROM dup0 UNION ALL SELECT * FROM dup1 "
        "UNION ALL SELECT * FROM dup2)"
    ),
    doc="STREAMING INGEST NEAR-DUP GATE — the persisted MinHash band "
    "index (plans/neardup_index.py) driven by the real streaming "
    "path: the index is built on the corpus (doc_id % 5 != 0), the "
    "remaining docs arrive as three producer files replayed as three "
    "micro-batches (maxFilesPerTrigger=1; file mtimes spaced 100 s "
    "apart make the replay order deterministic — FileStreamSource "
    "batches by modification time), and foreachBatch PROBES each "
    "batch against the index (reading only the batch's band spans), "
    "records an accept/reject decision per doc, and APPENDS the "
    "accepted docs' signatures atomically so later batches are gated "
    "by earlier acceptances — the reference's repeated-Execute ingest "
    "loop (Program.cs:31,35) running the dedup-before-ingest policy "
    "every production corpus pipeline needs. Within a batch, docs are "
    "gated by the index only (not each other) — the standard "
    "probe-then-append semantics, which the unrolled 3-step oracle "
    "replicates exactly (dup iff a J >= 1/2 shingle-Jaccard neighbor "
    "exists in the corpus or a PRIOR batch's accepted set). The 16x1 "
    "banding + exact verify make the probe equal the oracle's "
    "brute-force EXISTS, so a green row attests the full streaming "
    "loop: deterministic replay, span-pruned probes, atomic appends, "
    "checkpointed exactly-once.",
)
def q_stream_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import shutil as _shutil

    from ..plans.neardup_index import NearDupIndex

    d = Catalog(spark, sf_dir).documents.select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="upmr_sgate_")
    idx = NearDupIndex(
        spark, os.path.join(base, "index"), n_perm=16, n_bands=16
    )
    idx.build(d.filter(F.col("doc_id") % 5 != 0))
    inbox = os.path.join(base, "inbox")
    os.makedirs(inbox)
    streamed = d.filter(F.col("doc_id") % 5 == 0)
    t0 = os.path.getmtime(base)
    for b in range(3):
        stage = os.path.join(base, f"stage{b}")
        streamed.filter(
            (F.col("doc_id") / 5).cast("long") % 3 == b
        ).coalesce(1).write.parquet(stage)
        [part] = _glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(inbox, f"batch-{b}.parquet")
        _shutil.move(part, dst)
        # replay order = file mtime order; space them far apart
        os.utime(dst, (t0 + b * 100, t0 + b * 100))
    decisions = os.path.join(base, "decisions")

    def gate(batch_df: DataFrame, _bid: int) -> None:
        hits = idx.probe(batch_df).select(
            F.col("doc_a").alias("doc_id")
        ).distinct()
        decided = batch_df.join(
            hits.withColumn("_dup", F.lit(True)), "doc_id", "left"
        ).select(
            "doc_id", F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup")
        )
        decided.write.mode("append").parquet(decisions)
        accepted = batch_df.join(hits, "doc_id", "left_anti")
        idx.append(accepted)

    (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(decisions).select("doc_id", "is_dup")


# ---------------------------------------------------------------------------
# streaming data-mix quota gate — learned classifier + per-lang budget.

_QG_CAP = 40  # per-lang acceptance budget across the whole ingest


def _qgate_batch_sql(b: int, priors: list[str]) -> str:
    """Batch ``b``'s decisions: quality-rejects (score < 0), then the
    keepers ranked per lang by doc_id, accepted while the lang's
    running budget (prior batches' acceptances + in-batch rank) holds."""
    prior = (
        "SELECT lang, CAST(count(*) AS BIGINT) AS c FROM ("
        + " UNION ALL ".join(
            f"SELECT lang FROM {p} WHERE accepted" for p in priors
        )
        + ") GROUP BY lang"
        if priors
        else "SELECT '' AS lang, CAST(0 AS BIGINT) AS c WHERE 1 = 0"
    )
    return (
        f"pr{b} AS ({prior}), "
        f"dec{b} AS (SELECT doc_id, lang, "
        "row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn "
        f"FROM sc WHERE doc_id % 3 = {b} AND score >= 0), "
        f"out{b} AS ("
        f"SELECT d.doc_id, d.lang, "
        f"d.rn + COALESCE(p.c, 0) <= {_QG_CAP} AS accepted, "
        f"CASE WHEN d.rn + COALESCE(p.c, 0) <= {_QG_CAP} THEN 'ok' "
        "ELSE 'quota' END AS reason "
        f"FROM dec{b} d LEFT JOIN pr{b} p ON p.lang = d.lang "
        "UNION ALL SELECT doc_id, lang, FALSE, 'quality' "
        f"FROM sc WHERE doc_id % 3 = {b} AND score < 0)"
    )


def _qgate_oracle() -> str:
    from .text_analysis import QC_SCORE_SQL

    return (
        "WITH s AS (SELECT doc_id, lang, "
        "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') "
        "AS toks FROM documents), "
        f"sc AS (SELECT doc_id, lang, {QC_SCORE_SQL} AS score FROM s), "
        + _qgate_batch_sql(0, [])
        + ", " + _qgate_batch_sql(1, ["out0"])
        + ", " + _qgate_batch_sql(2, ["out0", "out1"])
        + " SELECT doc_id, lang, CAST(accepted AS BOOLEAN) AS accepted, "
        "reason FROM (SELECT * FROM out0 UNION ALL SELECT * FROM out1 "
        "UNION ALL SELECT * FROM out2)"
    )


@register(
    "q_stream_quality_gate",
    oracle=_qgate_oracle(),
    doc="STREAMING DATA-MIX QUOTA GATE (r10) — the learned quality "
    "classifier (q_quality_classifier's exact integer score) plus a "
    "per-language acceptance BUDGET enforced at ingest, on the real "
    "streaming path: docs arrive as three mtime-ordered producer "
    "files replayed as three micro-batches (maxFilesPerTrigger=1), "
    "foreachBatch scores each batch in pure codegen, ranks the "
    "keepers per lang by doc_id, and accepts while the lang's running "
    "budget (40) holds — quota state is read back from the persisted "
    "decisions table, so a checkpoint restart resumes with the right "
    "budgets (state-in-storage, the q_stream_neardup_gate recipe). "
    "Every doc gets a decision with a reason ('quality' — failed the "
    "classifier; 'quota' — passed but the lang budget was spent; "
    "'ok'), which is the drop-audit contract applied to streaming "
    "mixture control: real pretraining ingest caps each source/lang's "
    "contribution WHILE data flows, not in a batch afterthought. The "
    "unrolled 3-batch oracle replicates the probe-then-append "
    "semantics exactly (in-batch docs are gated by prior batches' "
    "acceptances + in-batch rank, never by each other's rejects).",
)
def q_stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import shutil as _shutil

    from .text_analysis import qc_score_col

    d = Catalog(spark, sf_dir).documents.select("doc_id", "lang", "text")
    base = tempfile.mkdtemp(prefix="upmr_qgate_")
    inbox = os.path.join(base, "inbox")
    os.makedirs(inbox)
    t0 = os.path.getmtime(base)
    for b in range(3):
        stage = os.path.join(base, f"stage{b}")
        d.filter(F.col("doc_id") % 3 == b).coalesce(1).write.parquet(stage)
        [part] = _glob.glob(os.path.join(stage, "part-*.parquet"))
        dst = os.path.join(inbox, f"batch-{b}.parquet")
        _shutil.move(part, dst)
        os.utime(dst, (t0 + b * 100, t0 + b * 100))
    decisions = os.path.join(base, "decisions")

    def gate(batch_df: DataFrame, _bid: int) -> None:
        from pyspark.sql import Window as W

        sc = batch_df.select(
            "doc_id", "lang", qc_score_col(F.col("text")).alias("score")
        )
        if os.path.isdir(decisions):
            prior = (
                spark.read.parquet(decisions)
                .filter("accepted")
                .groupBy("lang")
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
            )
        else:
            prior = spark.createDataFrame([], "lang string, c long")
        rn = F.row_number().over(
            W.partitionBy("lang").orderBy("doc_id")
        )
        keep = (
            sc.filter(F.col("score") >= 0)
            .withColumn("rn", rn)
            .join(prior, "lang", "left")
            .select(
                "doc_id",
                "lang",
                (
                    F.col("rn") + F.coalesce(F.col("c"), F.lit(0))
                    <= _QG_CAP
                ).alias("accepted"),
            )
            .select(
                "doc_id",
                "lang",
                "accepted",
                F.when(F.col("accepted"), F.lit("ok"))
                .otherwise(F.lit("quota"))
                .alias("reason"),
            )
        )
        rej = sc.filter(F.col("score") < 0).select(
            "doc_id",
            "lang",
            F.lit(False).alias("accepted"),
            F.lit("quality").alias("reason"),
        )
        keep.unionByName(rej).write.mode("append").parquet(decisions)

    (
        spark.readStream.schema("doc_id long, lang string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(decisions).select(
        "doc_id", "lang", "accepted", "reason"
    )


# ---------------------------------------------------------------------------
# streaming covariance drift monitor — numeric state across micro-batches.


@register(
    "q_stream_covariance",
    oracle=(
        "WITH mx AS (SELECT max(greatest("
        "CAST(list_aggregate(embedding, 'max') AS DOUBLE), "
        "-CAST(list_aggregate(embedding, 'min') AS DOUBLE))) AS gmax "
        "FROM embeddings), "
        "q AS (SELECT list_transform(embedding[1:16], x -> "
        "CAST(floor(CAST(x AS DOUBLE) / (gmax / 127) + 0.5) AS BIGINT)) "
        "AS q FROM embeddings, mx), "
        "p AS (SELECT ii.i AS dim_i, jj.j AS dim_j, q FROM q "
        "CROSS JOIN (SELECT unnest(range(0, 16)) AS i) ii "
        "CROSS JOIN (SELECT unnest(range(0, 16)) AS j) jj "
        "WHERE ii.i <= jj.j) "
        "SELECT CAST(dim_i AS INTEGER) AS dim_i, "
        "CAST(dim_j AS INTEGER) AS dim_j, "
        "CAST(sum(q[dim_i + 1] * q[dim_j + 1]) AS BIGINT) AS sum_prod, "
        "CAST(sum(q[dim_i + 1]) AS BIGINT) AS sum_i, "
        "CAST(sum(q[dim_j + 1]) AS BIGINT) AS sum_j, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM p GROUP BY dim_i, dim_j"
    ),
    doc="STREAMING COVARIANCE DRIFT MONITOR — the third leg of the "
    "covariance trio (batch = q_embed_covariance, view-maintained = "
    "q_covariance_incremental, STREAMING = this): the quantized "
    "16-dim pair rows arrive as a 3-file producer replayed one file "
    "per micro-batch (the Kafka-topic-of-mapped-records shape), and "
    "an UN-windowed update-mode running aggregation accumulates the "
    "integer scatter sums per (dim_i, dim_j) key across every batch "
    "— integer sums are associative, so the drained final state is "
    "hash-exact against the whole-corpus batch oracle. Asserts "
    "in-query that every pair key was emitted by >= 3 distinct "
    "micro-batches with GROWING n (a single-batch recompute or a "
    "lost state store fails loudly). State = one row per pair key "
    "(136) — cardinality-bounded, never stream-length-bounded: the "
    "update-mode contract applied to drift statistics, so a "
    "re-embedding pipeline can watch its corpus covariance move "
    "batch by batch without ever rescanning history.",
)
def q_stream_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import global_embed_gmax
    from ..operators.incremental import _COV_INC_QMAX, cov_pair_rows

    e = Catalog(spark, sf_dir).embeddings
    pair_rows = cov_pair_rows(global_embed_gmax(e) / _COV_INC_QMAX)
    latest = _replayed_running_agg(
        spark,
        [
            pair_rows(
                e.filter(F.col("vec_id") % 3 == b).select(
                    "vec_id", "embedding"
                )
            )
            for b in range(3)
        ],
        (
            "vec_id bigint, dim_i int, dim_j int, sum_prod bigint, "
            "sum_i bigint, sum_j bigint, n bigint"
        ),
        ("dim_i", "dim_j"),
        [
            F.sum("sum_prod").alias("sum_prod"),
            F.sum("sum_i").alias("sum_i"),
            F.sum("sum_j").alias("sum_j"),
            F.sum("n").alias("n"),
        ],
        grow_col="n",
        prefix="upmr_stream_cov_",
    )
    return latest.select(
        "dim_i", "dim_j", "sum_prod", "sum_i", "sum_j", "n"
    )


@register(
    "q_stream_takedown",
    oracle=(
        "WITH latest AS (SELECT user_id, event_type, value FROM "
        "(SELECT user_id, event_type, value, "
        "row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) "
        "AS rn FROM events WHERE user_id % 7 <> 0) WHERE rn = 1) "
        "SELECT event_type AS group_key, CAST(count(*) AS BIGINT) AS cnt, "
        "round(CAST(sum(value) AS DOUBLE), 2) AS value_sum "
        "FROM latest GROUP BY event_type"
    ),
    doc="TAKEDOWNS ARRIVING ON THE STREAM (r12) — the reference's "
    "delete-and-reschedule contract (Executer.cs:240-261) as a CDC "
    "feed: each micro-batch carries upsert rows AND op='delete' "
    "takedown events, and StreamingMapReduceView routes them through "
    "the same persistent view q_stream_view_upsert maintains — "
    "execute() for the upserts, then delete_docs() for the batch's "
    "takedown ids, so a delete wins over any co-batched upsert of the "
    "same doc (CDC delete-after-image ordering). Users with "
    "user_id % 7 == 0 are taken down IN THE SAME micro-batch their "
    "events arrive in (producers partition users by user_id % 3, so "
    "each doc's whole lifecycle — upsert then takedown — replays "
    "inside one micro-batch and the attested result is independent "
    "of micro-batch replay order, the same determinism argument as "
    "the upsert twin). The oracle is latest-wins SQL over events "
    "excluding the taken-down users: a green row attests that a "
    "streaming pipeline's takedowns converge to exactly the batch "
    "engine's delete semantics, with checkpointed exactly-once per "
    "micro-batch and both legs idempotent under foreachBatch's "
    "at-least-once replay.",
)
def q_stream_takedown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_view import StreamingMapReduceView
    from .incremental import _latest_event_rereducible

    ev = Catalog(spark, sf_dir).events
    base = tempfile.mkdtemp(prefix="upmr_stakedown_")
    inbox = os.path.join(base, "inbox")
    os.makedirs(inbox)
    for b in range(3):
        part = ev.filter(F.col("user_id") % 3 == b)
        upserts = part.select(
            F.col("user_id").cast("string").alias("doc_id"),
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.lit("upsert").alias("op"),
        )
        takedowns = (
            part.filter(F.col("user_id") % 7 == 0)
            .select("user_id")
            .distinct()
            .select(
                F.col("user_id").cast("string").alias("doc_id"),
                F.lit(None).cast("bigint").alias("event_id"),
                "user_id",
                F.lit(None).cast("string").alias("event_type"),
                F.lit(None).cast("double").alias("value"),
                F.lit("delete").alias("op"),
            )
        )
        upserts.unionByName(takedowns).coalesce(1).write.mode(
            "append"
        ).parquet(inbox)
    sv = StreamingMapReduceView(
        spark,
        os.path.join(base, "store"),
        input_path=inbox,
        input_schema=(
            "doc_id string, event_id bigint, user_id bigint, "
            "event_type string, value double, op string"
        ),
        checkpoint_path=os.path.join(base, "ckpt"),
        id_col="doc_id",
        seq_col="event_id",
        map_fn=_latest_event_rereducible,
        group_cols=["event_type"],
        agg_exprs=[
            F.sum("cnt").alias("cnt"),
            F.sum("value_sum").alias("value_sum"),
        ],
        n_key_spans=8,
        n_doc_spans=8,
        max_files_per_trigger=1,
        op_col="op",
    )
    sv.run_available_now()
    return sv.final_df().select(
        F.col("event_type").alias("group_key"),
        "cnt",
        F.round("value_sum", 2).alias("value_sum"),
    )


@register(
    "q_stream_pattern",
    oracle=(
        "WITH o AS (SELECT user_id, event_type, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS rn, "
        "row_number() OVER (PARTITION BY user_id, event_type "
        "ORDER BY ts, event_id) AS rnt FROM events), "
        "r AS (SELECT user_id, event_type, min(rn) AS srn, "
        "count(*) AS run_len FROM o "
        "GROUP BY user_id, event_type, rn - rnt), "
        "seq AS (SELECT user_id, event_type, run_len, srn, "
        "lag(event_type) OVER w AS prev_t, "
        "lead(event_type) OVER w AS next_t FROM r "
        "WINDOW w AS (PARTITION BY user_id ORDER BY srn)) "
        "SELECT user_id, CAST(row_number() OVER "
        "(PARTITION BY user_id ORDER BY srn) AS BIGINT) AS match_no, "
        "CAST(run_len AS BIGINT) AS click_run FROM seq "
        "WHERE event_type = 'click' AND prev_t = 'view' "
        "AND next_t = 'purchase'"
    ),
    doc="Streaming CEP on the ACTUAL streaming path: the Kleene-plus "
    "pattern (view click+ purchase) detected INCREMENTALLY — events "
    "staged to parquet, readStream -> groupBy(user)."
    "applyInPandasWithState carrying a four-scalar automaton "
    "(prev_run_type, cur_run_type, run_len, n_matches) per user -> "
    "availableNow -> memory sink. Each match row (user_id, match_no, "
    "click_run) is emitted the moment its closing purchase arrives — "
    "the alert/trigger deployment shape — and the oracle is the batch "
    "q_pattern_match's run-compression SQL enumerating every match "
    "per user in timeline order. State is four scalars per user "
    "(bounded by key cardinality, never stream length); matches are "
    "tie-pinned by (ts, event_id) so the replay is deterministic. "
    "Streaming twin of operators/windows.py q_pattern_match "
    "(Executer.cs:192-203's persisted partials riding across "
    "Execute calls, generalized to sequence-predicate state).",
)
def q_stream_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stream_view import streaming_pattern_match

    ev = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", "event_id", "event_type"
    )
    inp, ckpt = _stage(ev, "upmr_stream_pat_")
    sink = f"pat_sink_{uuid.uuid4().hex[:8]}"
    streaming_pattern_match(
        spark,
        input_path=inp,
        input_schema=(
            "user_id bigint, ts timestamp, event_id bigint, "
            "event_type string"
        ),
        checkpoint_path=ckpt,
        sink_table=sink,
    )
    return spark.table(sink)


from .incremental import _JV_ORACLE as _SHARED_JV_ORACLE  # noqa: E402


@register(
    "q_stream_join_view",
    # the BATCH twin's oracle, verbatim — both engines maintain the
    # same five-delta scenario, so one closed-form final state attests
    # both and any semantic drift between the twins breaks a hash
    oracle=_SHARED_JV_ORACLE,
    doc="STREAMING twin of q_join_view_incremental: the same "
    "orders ⋈ customer revenue-per-segment view, maintained over ONE "
    "interleaved CDC stream (streaming/stream_view.py "
    "streaming_join_view). The changelog carries the "
    "Debezium/Flink contract — a key-changing fact update arrives as "
    "retraction-at-old-key + insert-at-new-key, deletes as NULL-image "
    "retractions — which is what makes cross-key migration "
    "expressible with per-join-key applyInPandasWithState state. "
    "Each key's state holds its live fact set + current dim "
    "attributes + a seq high-water mark per entity (latest-wins BY "
    "SEQ, so micro-batch arrival order never changes the converged "
    "answer); a dim update re-emits the key's contribution the same "
    "micro-batch, retro-propagating through already-joined facts "
    "without fact re-delivery. Six micro-batches via "
    "maxFilesPerTrigger=1 force genuine cross-batch state "
    "continuation; the reader takes each key's newest emission and "
    "re-aggregates, and the BATCH view's oracle attests the final "
    "state.",
)
def q_stream_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..streaming.stream_view import streaming_join_view
    from .incremental import _JV_MIGRATE_MOD, _jv_fact_rows

    cat = Catalog(spark, sf_dir)
    dims = cat.customer.select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("segment"),
    )
    facts = _jv_fact_rows(cat.orders)

    def dim_rows(df, seq):
        return df.select(
            F.lit(seq).cast("bigint").alias("seq"),
            F.lit("dim").alias("side"),
            "ckey",
            F.lit(None).cast("bigint").alias("okey"),
            F.lit(None).cast("bigint").alias("cents"),
            "segment",
        )

    def fact_rows(df, seq):
        return df.select(
            F.lit(seq).cast("bigint").alias("seq"),
            F.lit("fact").alias("side"),
            "ckey",
            "okey",
            "cents",
            F.lit(None).cast("string").alias("segment"),
        )

    new_ckey = F.col("okey") % _JV_MIGRATE_MOD
    cur_ckey = F.when(F.col("okey") % 11 == 0, new_ckey).otherwise(
        F.col("ckey")
    )
    batches = [
        dim_rows(dims, 10),
        fact_rows(facts.filter(F.col("okey") % 2 == 0), 20),
        fact_rows(facts.filter(F.col("okey") % 2 == 1), 30),
        dim_rows(
            dims.filter(F.col("ckey") % 10 == 3).withColumn(
                "segment", F.lit("MIGRATED")
            ),
            40,
        ),
        # the key-migrating update, in changelog form: retraction at
        # the old key (seq 50) + insert at the new key (seq 51); the
        # price-only (%7) update is a plain same-key insert
        fact_rows(
            facts.filter(F.col("okey") % 11 == 0).withColumn(
                "cents", F.lit(None).cast("bigint")
            ),
            50,
        ).unionByName(
            fact_rows(
                facts.filter(
                    (F.col("okey") % 7 == 0) | (F.col("okey") % 11 == 0)
                ).select(
                    "okey",
                    cur_ckey.cast("bigint").alias("ckey"),
                    F.when(F.col("okey") % 7 == 0, F.col("cents") * 2)
                    .otherwise(F.col("cents"))
                    .alias("cents"),
                ),
                51,
            )
        ),
        # deletes arrive as retractions at the fact's CURRENT key —
        # the changelog producer knows the current image
        fact_rows(
            facts.filter(F.col("okey") % 13 == 0)
            .select("okey", cur_ckey.cast("bigint").alias("ckey"))
            .withColumn("cents", F.lit(None).cast("bigint")),
            60,
        ),
    ]
    import shutil

    base = tempfile.mkdtemp(prefix="upmr_sjoinview_")
    try:
        inbox = os.path.join(base, "in")
        os.makedirs(inbox)
        for b in batches:
            b.coalesce(1).write.mode("append").parquet(inbox)
        sink = f"sjv_sink_{uuid.uuid4().hex[:8]}"
        streaming_join_view(
            spark,
            input_path=inbox,
            input_schema=(
                "seq bigint, side string, ckey bigint, okey bigint, "
                "cents bigint, segment string"
            ),
            checkpoint_path=os.path.join(base, "ckpt"),
            sink_table=sink,
            max_files_per_trigger=1,
        )
    finally:
        # the returned plan reads the MEMORY sink, not these files —
        # safe to reclaim (the tmpdir-leak class the r11 advice
        # flagged on the takedown operator)
        shutil.rmtree(base, ignore_errors=True)
    w = W.partitionBy("ckey").orderBy(F.col("ver").desc())
    latest = (
        spark.table(sink)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        # inner-join semantics: a key with no dim row contributes
        # nothing (cannot arise in this scenario — every stream ckey
        # has a batch-1 dim image — but the reader enforces it)
        .filter(F.col("segment").isNotNull())
    )
    return (
        latest.groupBy("segment")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_orders"),
            F.sum("sv").cast("bigint").alias("sum_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )

