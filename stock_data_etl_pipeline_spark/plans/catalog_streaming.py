"""Catalog entries: event-stream operators (batch + Structured Streaming).

The streaming entries run a REAL streaming query (file source ->
watermark/agg -> memory sink, availableNow trigger) and return the drained
result, so the DuckDB oracle checks the streaming semantics against the
equivalent batch SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from ..streaming.events import (
    hourly_counts,
    sessionize,
    streaming_current_state,
    streaming_hourly_counts,
    streaming_sliding_counts,
)
from .catalog import register

_HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""

_SLIDING_ORACLE = """
WITH x AS (SELECT unnest([date_trunc('hour', ts),
                          date_trunc('hour', ts) - INTERVAL 1 HOUR])
                      AS window_start,
                  event_type, value
           FROM events)
SELECT window_start, event_type, count(*) AS n,
       round(sum(value), 2) AS total_value
FROM x GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("events_hourly", _HOURLY_ORACLE)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # batch tumbling window (F.window == date_trunc for tumbling 1h)
    return hourly_counts(load_table(spark, sf_dir, "events"))


@register("streaming_events_hourly", _HOURLY_ORACLE)
def streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the same relation produced by an actual Structured Streaming query
    return streaming_hourly_counts(
        spark, os.path.join(sf_dir, "events.parquet"))


@register("events_hourly_sliding", _SLIDING_ORACLE)
def events_hourly_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HOPPING window (2 h duration, 1 h slide): each event lands in two
    # overlapping windows — the remaining streaming window class after
    # tumbling (events_hourly) and session (streaming_session_windows).
    # F.window replicates each row per containing window before the agg;
    # the oracle unnests the two window starts per event. Same expression
    # runs unchanged under readStream + watermark.
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"),
                       "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "total_value")
            .orderBy("window_start", "event_type"))


@register("streaming_events_sliding", _SLIDING_ORACLE)
def streaming_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the same hopping relation produced by a real Structured Streaming
    # query (watermark + overlapping windows + complete-mode drain)
    return streaming_sliding_counts(
        spark, os.path.join(sf_dir, "events.parquet"))


@register("events_sessionization", """
WITH o AS (SELECT user_id, ts, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
m AS (SELECT user_id, ts, event_id,
             CASE WHEN prev IS NULL
                       OR date_diff('second', prev, ts) > 1800 THEN 1
                  ELSE 0 END AS is_new
      FROM o),
s AS (SELECT user_id, ts, event_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
      FROM m)
SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
""")
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gap-based sessions (30 min); lag + running sum of breaks
    return sessionize(load_table(spark, sf_dir, "events"), gap_seconds=1800)


@register("streaming_dedup_survivors", """
WITH keyed AS (SELECT doc_id, md5(text) AS key, text FROM documents),
min_ids AS (SELECT key, min(doc_id) AS doc_id FROM keyed GROUP BY key)
SELECT k.doc_id, k.key, k.text
FROM keyed k JOIN min_ids m ON m.key = k.key AND m.doc_id = k.doc_id
ORDER BY k.doc_id
""")
def streaming_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the custom stateful operator (applyInPandasWithState) run as a REAL
    # streaming query: documents keyed by md5(text), drained availableNow
    # through the checkpointed dedup. One coalesced source file -> one
    # micro-batch, so the min-id survivor rule makes the drain equal the
    # batch keep-lowest-id dedup — a full hash oracle for a stateful
    # streaming operator. Cross-batch/cross-run state is pytest-covered
    # (test_streaming_dedup).
    import atexit
    import shutil
    import tempfile

    from ..streaming.dedup import streaming_dedup
    work = tempfile.mkdtemp(prefix="sdedup_")
    # survivors now land executor-side in a parquet dir under `work`, and
    # the returned DataFrame scans it lazily — so the workspace must
    # outlive this call; clean up at interpreter exit instead of finally
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src, cp = os.path.join(work, "src"), os.path.join(work, "cp")
    d = load_table(spark, sf_dir, "documents")
    (d.select("doc_id", F.md5("text").alias("key"), "text")
     .coalesce(1).write.mode("overwrite").parquet(src))
    return streaming_dedup(spark, src, cp).orderBy("doc_id")


@register("streaming_current_state", """
SELECT user_id, event_type AS current_state, ts AS state_ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
""")
def streaming_current_state_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # run-state stream reduced to current state per entity, via a real
    # streaming aggregation (max_by over (ts, event_id))
    return streaming_current_state(
        spark, os.path.join(sf_dir, "events.parquet"))


@register("streaming_enriched_segments", """
SELECT c.c_mktsegment, e.event_type, count(*) AS n,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY c.c_mktsegment, e.event_type
ORDER BY c.c_mktsegment, e.event_type
""")
def streaming_enriched_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stream-static join: live events enriched with the customer dim at
    # stream time, aggregated per segment — equals the batch join relation
    from ..streaming.events import streaming_enriched_by_segment
    return streaming_enriched_by_segment(
        spark, os.path.join(sf_dir, "events.parquet"),
        load_table(spark, sf_dir, "customer"))


@register("events_interval_join", """
WITH o AS (SELECT user_id, ts, event_id,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
m AS (SELECT user_id, ts, event_id,
             CASE WHEN prev IS NULL
                       OR date_diff('second', prev, ts) > 1800 THEN 1
                  ELSE 0 END AS is_new
      FROM o),
s AS (SELECT user_id, ts, event_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
      FROM m),
iv AS (SELECT user_id, session_id, min(ts) AS session_start,
              max(ts) AS session_end
       FROM s GROUP BY user_id, session_id)
SELECT e.event_id, e.user_id, e.ts,
       iv.session_id AS iv_session_id,
       iv.session_start AS iv_session_start
FROM events e
LEFT JOIN iv ON iv.user_id = e.user_id
            AND e.ts BETWEEN iv.session_start AND iv.session_end
ORDER BY e.event_id, iv_session_id
""")
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # point-in-interval against SELF-derived intervals: gap sessions
    # PARTITION each user's event timeline (disjoint intervals, every
    # event inside its own session's [min ts, max ts]), so the
    # containment join matches each event to exactly the session the
    # sessionize window already assigned it. The general operator
    # (operators/asof.py::interval_join — equi on key + range residual)
    # would re-shuffle the event stream a second time only to rediscover
    # that assignment; instead carry session_id AND session_start in the
    # one user-keyed window pass. Fusion equivalence vs the operator
    # composition is pinned by
    # tests/test_asof.py::test_interval_join_self_fusion_matches_operator.
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = (F.col("ts").cast("long")
           - F.lag(F.col("ts")).over(w).cast("long"))
    out = (ev.withColumn(
               "_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
           .withColumn("iv_session_id", F.sum("_new").over(run))
           .withColumn("iv_session_start",
                       F.last(F.when(F.col("_new") == 1, F.col("ts")),
                              ignorenulls=True).over(run))
           .select("event_id", "user_id", "ts",
                   "iv_session_id", "iv_session_start"))
    return out.orderBy("event_id", "iv_session_id")


@register("streaming_dedup_watermarked", """
SELECT DISTINCT md5(text) AS key FROM documents ORDER BY key
""")
def streaming_dedup_watermarked_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # native time-horizon streaming dedup; single-batch drain == DISTINCT
    from ..streaming.dedup import streaming_dedup_watermarked
    return streaming_dedup_watermarked(
        spark, os.path.join(sf_dir, "documents.parquet"))


@register("streaming_purchase_view_join", """
SELECT p.user_id, p.event_id AS p_id, p.ts AS p_ts,
       v.event_id AS v_id, v.ts AS v_ts
FROM events p JOIN events v
  ON v.user_id = p.user_id
 AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
ORDER BY p_id, v_id
""")
def streaming_purchase_view_join_q(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    # stream-stream interval join: purchases x same-user views within the
    # preceding hour, both sides watermarked live streams
    from ..streaming.events import streaming_purchase_view_join
    return streaming_purchase_view_join(
        spark, os.path.join(sf_dir, "events.parquet"))


@register("events_hourly_dense", """
WITH h AS (SELECT date_trunc('hour', ts) AS hour, event_type,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
span AS (SELECT event_type, min(hour) AS lo, max(hour) AS hi
         FROM h GROUP BY event_type),
grid AS (SELECT s.event_type, unnest(generate_series(s.lo, s.hi,
                                     INTERVAL 1 HOUR)) AS hour
         FROM span s)
SELECT g.event_type, g.hour, coalesce(h.n, 0)::BIGINT AS n
FROM grid g LEFT JOIN h ON h.event_type = g.event_type
                       AND h.hour = g.hour
ORDER BY g.event_type, g.hour
""")
def events_hourly_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    # time-series densification (resample/gap-fill): every hour between
    # each type's first and last event exists with n=0 where no events
    # fell — sequence+explode builds the grid, one left join fills it.
    # The grid is (types x hours)-sized, tiny next to the fact.
    e = load_table(spark, sf_dir, "events")
    h = (e.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
         .agg(F.count(F.lit(1)).alias("n")))
    span = h.groupBy("event_type").agg(F.min("hour").alias("lo"),
                                       F.max("hour").alias("hi"))
    grid = span.select(
        "event_type",
        F.explode(F.sequence("lo", "hi",
                             F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    return (grid.join(h, ["event_type", "hour"], "left")
            .select("event_type", "hour",
                    F.coalesce("n", F.lit(0)).cast("long").alias("n"))
            .orderBy("event_type", "hour"))


@register("streaming_dedup_ttl_survivors", """
WITH keyed AS (SELECT event_id AS doc_id,
                      CAST(user_id AS VARCHAR) || '|' || event_type AS key,
                      ts
               FROM events),
min_ids AS (SELECT key, min(doc_id) AS doc_id FROM keyed GROUP BY key)
SELECT k.doc_id, k.key, k.ts
FROM keyed k JOIN min_ids m ON m.key = k.key AND m.doc_id = k.doc_id
ORDER BY k.doc_id
""")
def streaming_dedup_ttl_survivors(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    # the TTL-bounded stateful dedup (EventTimeTimeout state, the
    # bounded-state variant of streaming_dedup) run as a REAL streaming
    # query over events keyed by (user, event_type): one coalesced
    # source file -> one micro-batch, ttl longer than the 30-day
    # timeline -> no expiry inside the drain, so the survivor set equals
    # batch keep-lowest-id dedup — a full hash oracle for the
    # EventTimeTimeout code path. Expiry/re-admission and cross-run
    # checkpoint recovery are pytest-pinned (test_streaming_dedup).
    import atexit
    import shutil
    import tempfile

    from ..streaming.dedup import streaming_dedup_ttl
    work = tempfile.mkdtemp(prefix="sttldedup_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src, cp = os.path.join(work, "src"), os.path.join(work, "cp")
    e = load_table(spark, sf_dir, "events")
    (e.select("event_id",
              F.concat_ws("|", "user_id", "event_type").alias("key"), "ts")
     .withColumnRenamed("event_id", "doc_id")
     .coalesce(1).write.mode("overwrite").parquet(src))
    return streaming_dedup_ttl(spark, src, cp, ttl="90 days").orderBy("doc_id")


@register("events_sequence_examples", """
WITH o AS (SELECT user_id, ts, event_id, event_type,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
m AS (SELECT user_id, ts, event_id, event_type,
             CASE WHEN prev IS NULL
                       OR date_diff('second', prev, ts) > 1800 THEN 1
                  ELSE 0 END AS is_new
      FROM o),
s AS (SELECT user_id, ts, event_id, event_type,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
      FROM m),
x AS (SELECT user_id, session_id, event_id,
             lag(event_type, 3) OVER ws AS prev_3,
             lag(event_type, 2) OVER ws AS prev_2,
             lag(event_type, 1) OVER ws AS prev_1,
             event_type AS label
      FROM s
      WINDOW ws AS (PARTITION BY user_id, session_id
                    ORDER BY ts, event_id))
SELECT * FROM x WHERE prev_3 IS NOT NULL
ORDER BY user_id, session_id, event_id
""")
def events_sequence_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sequence-model training rows: (3 predecessors, next event) within
    # a session — the sessionization windows reused as-is, zero Python
    from ..streaming.events import session_sequence_examples
    return (session_sequence_examples(
        load_table(spark, sf_dir, "events"), k=3)
        .orderBy("user_id", "session_id", "event_id"))


@register("streaming_hourly_topk", """
WITH h AS (SELECT date_trunc('hour', ts) AS hour, event_type,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY hour
                     ORDER BY n DESC, event_type) AS INTEGER) AS rnk
      FROM h)
SELECT hour, event_type, n, rnk FROM r WHERE rnk <= 3
ORDER BY hour, rnk
""")
def streaming_hourly_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-window heavy hitters: a REAL streaming windowed count drained
    # availableNow, then ranked — the two-layer top-k shape (the
    # leaderboard is only final once the window closes)
    from ..streaming.events import streaming_hourly_topk
    return streaming_hourly_topk(
        spark, os.path.join(sf_dir, "events.parquet"))
