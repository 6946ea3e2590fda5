"""Event-stream operators: tumbling windows, sessionization, and the
Structured Streaming variants.

The reference has no true streaming (its 'incremental' behavior is a Celery
task chain, SURVEY §2.10); these operators are the idiomatic Spark
restatement of its run-state/event semantics plus the windowed analytics a
100 TB event pipeline needs. Batch and streaming variants share the same
aggregation expressions, so the streaming query is oracle-checkable against
the batch SQL.

Scale notes: windowed streaming aggregation state is bounded by the
watermark (late rows beyond it are dropped); sessionization in batch is one
shuffle on user_id + an in-partition sort — the same cost class as
latest-per-group.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _as_stream_dir(path: str) -> str:
    """FileStreamSource wants a directory; wrap a single parquet file in a
    temp dir via symlink (a real deployment streams a landing directory)."""
    if os.path.isdir(path):
        return path
    d = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(path, os.path.join(d, os.path.basename(path)))
    return d


def event_stream(spark: SparkSession, events_parquet: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File stream over the events table with ts normalized to a proper
    TimestampType. The storage unit of ts has varied across testdata
    generations (TIMESTAMP(NANOS) vs timestamp[us]); the parquet footer is
    authoritative — see sources.registry.events_ts_unit."""
    from ..sources.registry import (convert_events_ts, events_schema,
                                    events_ts_unit)
    unit = events_ts_unit(events_parquet)
    if unit == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(events_schema(unit))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return convert_events_ts(reader.parquet(_as_stream_dir(events_parquet)),
                             unit)


def _hourly_agg(events: DataFrame) -> DataFrame:
    return (events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value")))


def hourly_counts(events: DataFrame) -> DataFrame:
    """Batch tumbling-window aggregation (1 h) per event type."""
    return (_hourly_agg(events)
            .select(F.col("w.start").alias("hour"), "event_type", "n",
                    "total_value")
            .orderBy("hour", "event_type"))


def streaming_hourly_counts(spark: SparkSession, events_parquet: str,
                            watermark: str = "2 hours") -> DataFrame:
    """The same aggregation as a Structured Streaming query: file stream ->
    watermark -> windowed agg -> in-memory sink, driven to completion with
    an availableNow trigger. Complete output mode so open windows emit and
    the result equals the batch relation (append mode would hold back
    windows above the final watermark).

    On a live source this exact query runs unchanged with
    ``trigger(processingTime=...)`` + append mode; the watermark bounds
    state and drops late rows past 2 h.
    """
    stream = event_stream(spark, events_parquet)
    agg = _hourly_agg(stream.withWatermark("ts", watermark))
    name = f"hourly_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.col("w.start").alias("hour"), "event_type", "n",
                    "total_value")
            .orderBy("hour", "event_type"))


def streaming_sliding_counts(spark: SparkSession, events_parquet: str,
                             duration: str = "2 hours", slide: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """HOPPING-window aggregation as a Structured Streaming query: each
    event lands in duration/slide overlapping windows (Spark replicates
    the row per containing window before the agg — state is bounded by
    watermark x window count). Drained availableNow in complete mode so
    the result equals the batch hopping relation."""
    stream = event_stream(spark, events_parquet)
    agg = (stream.withWatermark("ts", watermark)
           .groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total_value")))
    name = f"sliding_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "total_value")
            .orderBy("window_start", "event_type"))


def sessionize(events: DataFrame, gap_seconds: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Gap-based sessionization: a session breaks when the inter-event gap
    exceeds ``gap_seconds``. One row per session with start/end/count.

    lag + running-sum-of-breaks (the standard batch formulation); the
    streaming twin is ``groupBy(user, session_window(ts, gap))``.
    """
    from pyspark.sql import Window
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col) \
                .rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col)).over(w).cast("long")
    tagged = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0))
    sessions = tagged.withColumn("session_id", F.sum("_new").over(run))
    return (sessions.groupBy(user_col, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"))
            .orderBy(user_col, "session_id"))


def streaming_interval_join_counts(spark: SparkSession,
                                   events_parquet: str,
                                   intervals: DataFrame) -> DataFrame:
    """Stream-STATIC interval join — the streaming twin of the batch
    ``events_interval_join`` family: each live event is matched to the
    static interval containing it (equi on the key + a point-in-interval
    range residual), then counted per interval.

    The canonical production shape: a landing event stream probed
    against a reference table of time windows (sessions, campaigns,
    market-hours, maintenance windows). The static side is re-resolved
    per micro-batch and broadcast, so the stream never shuffles on the
    join; state is only the downstream aggregate's (bounded by
    |intervals|). Driven to completion with availableNow + complete
    mode, so the drained result equals the batch point-in-interval
    join aggregated per interval — which is exactly what the DuckDB
    oracle states.

    Gap-sessionized intervals PARTITION each user's events, so the
    inner join loses nothing: sum(n_events) == |events|.
    """
    stream = event_stream(spark, events_parquet).alias("e")
    iv = F.broadcast(
        intervals.select("user_id", "session_id",
                         "session_start", "session_end")).alias("iv")
    j = stream.join(
        iv,
        (F.col("e.user_id") == F.col("iv.user_id"))
        & (F.col("e.ts") >= F.col("iv.session_start"))
        & (F.col("e.ts") <= F.col("iv.session_end")))
    agg = (j.groupBy(F.col("iv.user_id").alias("user_id"),
                     F.col("iv.session_id").alias("session_id"),
                     F.col("iv.session_start").alias("session_start"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    name = f"ivjoin_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).orderBy("user_id", "session_id")


def streaming_current_state(spark: SparkSession, events_parquet: str) -> DataFrame:
    """Run-state progression as a stream reduced to current state per
    entity (SURVEY §2.10): max_by(event_type, (ts, event_id)) per user —
    the streaming form of W1/latest-per-group, driven to completion via
    availableNow + complete mode."""
    stream = event_stream(spark, events_parquet)
    agg = (stream.groupBy("user_id")
           .agg(F.max_by("event_type",
                         F.struct("ts", "event_id")).alias("current_state"),
                F.max("ts").alias("state_ts")))
    name = f"curstate_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).orderBy("user_id")


def streaming_enriched_by_segment(spark: SparkSession, events_parquet: str,
                                  customers: DataFrame) -> DataFrame:
    """Stream-static join (SURVEY §2.10): the live event stream enriched
    with a static dimension at stream time, then aggregated — the
    standard "events x reference data" streaming shape. The dim is
    broadcast per micro-batch (Spark re-resolves the static side each
    trigger, so a refreshed dim table is picked up without restarting);
    state is only the downstream aggregate's, bounded by group
    cardinality. Driven to completion with availableNow + complete mode
    so the result equals the batch join relation."""
    stream = event_stream(spark, events_parquet)
    dim = F.broadcast(
        customers.select(F.col("c_custkey").alias("user_id"),
                         "c_mktsegment"))
    agg = (stream.join(dim, "user_id")
           .groupBy("c_mktsegment", "event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total_value")))
    name = f"enriched_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).orderBy("c_mktsegment", "event_type")


def streaming_purchase_view_join(spark: SparkSession, events_parquet: str,
                                 watermark: str = "2 hours",
                                 lookback: str = "1 hour",
                                 max_files_per_trigger: int | None = None,
                                 how: str = "inner") -> DataFrame:
    """Stream-stream interval join (the remaining Structured Streaming
    operator class): each purchase joined to the same user's views in
    [purchase_ts - lookback, purchase_ts], both sides live streams.

    Both inputs carry watermarks and the join condition bounds event-time
    distance, so Spark can size the join state and evict rows older than
    watermark + lookback — the required shape for an unbounded
    stream-stream join (an unconstrained one would buffer both streams
    forever). Inner stream-stream joins emit matches as they are found;
    append is the only supported output mode and loses nothing. Driven to
    completion with availableNow, so the drained result equals the batch
    time-bounded self-join the oracle states.

    ``how="left_outer"``: purchases with no in-window view emit with NULL
    view columns — but only once the GLOBAL watermark (the min across
    BOTH sides) passes the point where a match could still arrive, in a
    subsequent micro-batch. A side that stops receiving events pins the
    global watermark and withholds outer results forever — the standard
    outer-join caveat, covered by the cross-batch pytest."""
    def side(tag: str, tcol: str):
        # max_files_per_trigger -> per-file micro-batches: lets tests
        # drive matches ACROSS batches (one side buffered in join state
        # until the other arrives) instead of the single-batch drain
        return (event_stream(spark, events_parquet, max_files_per_trigger)
                .filter(F.col("event_type") == tag)
                .select(F.col("event_id").alias(f"{tcol[0]}_id"),
                        "user_id", F.col("ts").alias(tcol))
                .withWatermark(tcol, watermark))
    purchases, views = side("purchase", "p_ts"), side("view", "v_ts")
    j = purchases.join(
        views,
        (purchases["user_id"] == views["user_id"])
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}")),
        how)
    name = f"ssjoin_{uuid.uuid4().hex[:8]}"
    q = (j.select(purchases["user_id"], "p_id", "p_ts", "v_id", "v_ts")
         .writeStream.outputMode("append")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).orderBy("p_id", "v_id")


def streaming_ohlc_bars(spark: SparkSession, events_parquet: str,
                        watermark: str = "2 hours") -> DataFrame:
    """Hourly OHLC candlesticks as a Structured Streaming query — the
    streaming twin of operators/indicators.hourly_bars, producing the
    same relation (same (ts, event_id) tie-break: ``min_by``/``max_by``
    on a struct key order lexicographically, which equals the batch
    row_number ordering).

    min_by/max_by are declarative aggregates, so the whole resample is
    ONE stateful windowed aggregation — no custom state function; state
    per (symbol, hour) is a single partial OHLC row, evicted past the
    watermark. On a live tick feed this query runs unchanged with
    append mode + processingTime trigger, emitting each bar when its
    hour closes — exactly how a market-data pipeline builds candles.
    """
    stream = event_stream(spark, events_parquet)
    agg = (stream.withWatermark("ts", watermark)
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.min_by(F.col("value"),
                         F.struct("ts", "event_id")).alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by(F.col("value"),
                         F.struct("ts", "event_id")).alias("close"),
                F.count(F.lit(1)).alias("volume"),
                F.round(F.sum("value"), 2).alias("total_value")))
    name = f"ohlc_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.col("w.start").alias("hr"), "event_type", "open",
                    "high", "low", "close", "volume", "total_value")
            .orderBy("event_type", "hr"))


def streaming_vwap_bars(spark: SparkSession, events_parquet: str,
                        watermark: str = "2 hours") -> DataFrame:
    """Hourly VWAP bars as a Structured Streaming query — the streaming
    twin of operators/indicators.vwap_daily at bar grain: one
    watermark-bounded windowed aggregation whose state per
    (symbol, hour) is two partial sums (price·size, size) — the VWAP
    monoid — so late ticks within the watermark fold in exactly and
    the bar emits when its hour closes.

    price·size products stay on the 0.01 grid (2-dp ticks × integer
    sizes from the props JSON tail), so the partial sums are exact
    under any batch assignment; the division happens once at emit,
    NULL-guarded for zero-quantity bars (ANSI). On a live feed this
    runs unchanged with append mode + a processing-time trigger.
    """
    from ..operators.windows import int_mean_half_away
    stream = event_stream(spark, events_parquet)
    kq = F.get_json_object("props", "$.k").cast("long")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    agg = (stream.withWatermark("ts", watermark)
           .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.sum(cents * kq).cast("long").alias("pv_c"),
                F.sum(kq).cast("long").alias("total_qty"),
                F.count(F.lit(1)).cast("long").alias("n_ticks")))
    name = f"vwap_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    v_e6 = int_mean_half_away(F.col("pv_c") * F.lit(10000),
                              F.col("total_qty"))
    return (spark.table(name)
            .select(F.col("w.start").alias("hr"), "event_type",
                    F.when(F.col("total_qty") > 0, v_e6 / F.lit(1e6))
                    .alias("vwap"),
                    "total_qty", "n_ticks")
            .orderBy("event_type", "hr"))


def session_sequence_examples(events: DataFrame, k: int = 3,
                              gap_seconds: int = 1800) -> DataFrame:
    """Next-event-prediction training rows from sessionized activity:
    for every event with >= ``k`` predecessors in the SAME session,
    emit (prev_k .. prev_1, label) — the sequence-model training
    extraction (recsys next-action / behavioral LM) done entirely with
    the sessionization windows: one shuffle on user, lag columns over
    (user, session) ordering, no per-session Python.

    At 100 TB sessions are bounded by the gap, so the lag frame state
    is tiny; the example count is |events| minus session heads."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = (F.col("ts").cast("long")
           - F.lag(F.col("ts")).over(w).cast("long"))
    tagged = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0))
    s = tagged.withColumn("session_id", F.sum("_new").over(run))
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id")
    lags = [F.lag("event_type", i).over(ws).alias(f"prev_{i}")
            for i in range(k, 0, -1)]
    out = s.select("user_id", "session_id", "event_id", *lags,
                   F.col("event_type").alias("label"))
    return out.filter(F.col(f"prev_{k}").isNotNull())


def streaming_hourly_topk(spark: SparkSession, events_parquet: str,
                          k: int = 3,
                          watermark: str = "2 hours") -> DataFrame:
    """Windowed heavy hitters from a live streaming aggregate: the
    streaming query maintains per-(window, event_type) counts (state
    bounded by the watermark); the top-k selection is a rank over the
    drained aggregate — the standard two-layer shape, since per-window
    ranking needs the window CLOSED before its leaderboard is final.
    On a live source the rank layer runs per-trigger on the complete
    aggregate (or downstream of an append sink once windows expire)."""
    from pyspark.sql import Window
    stream = event_stream(spark, events_parquet)
    agg = _hourly_agg(stream.withWatermark("ts", watermark))
    name = f"topk_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    w = (Window.partitionBy("w")
         .orderBy(F.desc("n"), F.col("event_type")))
    return (spark.table(name)
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(F.col("w.start").alias("hour"), "event_type", "n",
                    "rnk")
            .orderBy("hour", "rnk"))


def streaming_daily_value_histogram(spark: SparkSession,
                                    events_parquet: str,
                                    bins: int = 10, hi: float = 600.0,
                                    watermark: str = "2 days"
                                    ) -> DataFrame:
    """Per-day value histogram as a REAL Structured Streaming query:
    file stream -> watermark -> (1-day tumbling window × fixed-width
    value bucket) count -> memory sink, drained with availableNow.
    The streaming half of the drift monitor — the drained table is
    what operators/quality.psi_from_daily_histogram scores per day
    against day 1.

    Complete output mode so open windows emit and the drained
    relation equals the batch twin (operators/quality.
    daily_value_histogram); on a live source the same query runs in
    append mode with the 2-day watermark bounding state — each day's
    histogram row finalizes when the watermark passes, and the PSI
    readout picks it up from the sink (the monitor reads the sink,
    never the stream).
    """
    from ..operators.quality import value_bucket
    stream = event_stream(spark, events_parquet)
    bucket = value_bucket("value", bins, hi)
    agg = (stream.withWatermark("ts", watermark)
           .groupBy(F.window("ts", "1 day").alias("w"),
                    bucket.alias("bucket"))
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    name = f"dailyhist_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select(F.col("w.start").alias("day"), "bucket", "c"))


def streaming_srm_counts(spark: SparkSession,
                         events_parquet: str) -> DataFrame:
    """Streaming twin of the batch sample-ratio-mismatch check
    (operators/quality.srm_check): events stream → per-(unit, user)
    dedup → md5-parity arm counts per unit, drained availableNow in
    complete mode — the live experiment-health monitor a platform runs
    beside the assignment service.

    The dedup is an aggregation, not dropDuplicates: complete-mode
    chaining of a dedup under another agg is unsupported, and a
    distinct-user count per (unit, arm) is exactly a two-level
    aggregate — the first level (unit, user) collapses duplicates
    with bounded state (one row per distinct pair, the same state the
    batch DISTINCT holds), the second counts per arm. Arms come from
    the identical md5-parity expression as the batch twin, so the
    drained sink is hash-equal to the batch/oracle result.
    """
    from ..operators.quality import srm_check

    stream = event_stream(spark, events_parquet)
    pairs = (stream.filter(F.col("user_id").isNotNull())
             .groupBy("event_type", "user_id")
             .agg(F.count(F.lit(1)).alias("_dup")))
    name = f"srm_{uuid.uuid4().hex[:8]}"
    q = (pairs.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    # the drained sink is the distinct (unit, user) relation; the batch
    # operator's own DISTINCT is a no-op on it, and every arm/chi-square
    # expression is literally shared with the batch twin
    return srm_check(spark.table(name))


def streaming_benford_digits(spark: SparkSession,
                             events_parquet: str) -> DataFrame:
    """Streaming twin of the Benford chi-square audit
    (quality.benford_chi2_cells): the per-digit counting runs as a
    REAL streaming aggregate (state = at most nine rows) drained
    availableNow, and the drained counts flow through the IDENTICAL
    zero-fill/expectation/chi-square tail
    (quality.benford_cells_from_counts) — the live money-feed
    forensics a platform keeps beside the ingest path. Non-positive
    amounts are dropped BEFORE digit extraction, exactly as in the
    batch twin.
    """
    from ..operators.quality import benford_cells_from_counts

    stream = event_stream(spark, events_parquet)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    digit = F.substring(F.col("_cents").cast("string"), 1, 1) \
        .cast("long")
    g = (stream.select(cents.alias("_cents"))
         .filter(F.col("_cents") > 0)
         .select(digit.alias("digit"))
         .groupBy("digit")
         .agg(F.count(F.lit(1)).cast("long").alias("n_obs")))
    name = f"benford_{uuid.uuid4().hex[:8]}"
    q = (g.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return benford_cells_from_counts(spark, spark.table(name))


def streaming_digit_uniformity(spark: SparkSession,
                               events_parquet: str) -> DataFrame:
    """Streaming twin of the terminal-digit uniformity audit
    (quality.last_digit_uniformity): the cents-pair 00..99 counting
    runs as a REAL streaming aggregate (state = at most 100 rows)
    drained availableNow, and the drained counts flow through the
    IDENTICAL zero-fill/expectation/chi-square tail
    (quality.digit_uniformity_from_counts) — the live fabricated-
    precision monitor beside the Benford first-digit twin
    (:func:`streaming_benford_digits`). NULL buckets are dropped
    before counting, exactly as in the batch twin.
    """
    from ..operators.quality import digit_uniformity_from_counts

    stream = event_stream(spark, events_parquet)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    # double-mod: negative cents canonicalize to 0..99 (batch-twin
    # parity — see quality.last_digit_uniformity)
    g = (stream.select((((cents % 100) + 100) % 100).alias("digits"))
         .filter(F.col("digits").isNotNull())
         .groupBy("digits")
         .agg(F.count(F.lit(1)).cast("long").alias("n_obs")))
    name = f"digits_{uuid.uuid4().hex[:8]}"
    q = (g.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return digit_uniformity_from_counts(spark, spark.table(name))


def streaming_user_day_counts(spark: SparkSession,
                              events_parquet: str) -> DataFrame:
    """(user_id, day, n) counts as a REAL streaming aggregate drained
    availableNow in complete mode — the bounded-state (one row per
    active user-day) base relation for the new-user-mix monitor: the
    batch tail (operators/analytics.new_user_share_from_counts)
    computes first-seen days and per-day shares on the drained sink,
    the benford/srm/digit-twin pattern."""
    stream = event_stream(spark, events_parquet)
    g = (stream.select("user_id", F.to_date("ts").alias("day"))
         .groupBy("user_id", "day")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    name = f"userday_{uuid.uuid4().hex[:8]}"
    q = (g.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def streaming_bootstrap_partials(spark: SparkSession,
                                 events_parquet: str,
                                 reps: int | None = None) -> DataFrame:
    """Poisson-bootstrap per-replicate partial sums as a REAL
    Structured Streaming query: file stream -> stateless deterministic
    weight projection -> (event_type, rep) keyed aggregation -> memory
    sink, drained with availableNow. The drained table is what
    operators/quality.bootstrap_ci_from_partials finalizes into the
    SE/CI readout — the live experiment-monitor shape (partials update
    as data arrives; the monitor reads the sink, never the stream).

    Complete output mode so the drained relation equals the batch twin
    (operators/quality.poisson_bootstrap_partials on the same file);
    the weights are pure per-row hash functions, so arrival order and
    micro-batch boundaries cannot change the aggregated partials.
    """
    from ..operators.quality import BOOT_REPS, poisson_bootstrap_partials
    stream = event_stream(spark, events_parquet).select(
        "event_type", "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    agg = poisson_bootstrap_partials(stream, reps or BOOT_REPS)
    name = f"bootpart_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)
