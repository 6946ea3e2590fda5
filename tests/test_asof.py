"""As-of join semantics: strict ties, missing matches, multi-key."""

from __future__ import annotations

from datetime import datetime

from stock_data_etl_pipeline_spark.operators.asof import asof_join


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_strict_excludes_equal_ts(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T10:00:00"))], "id long, k long, t timestamp")
    right = spark.createDataFrame(
        [(100, 1, ts("2024-01-01T10:00:00")),   # same instant: excluded
         (101, 1, ts("2024-01-01T09:00:00"))],
        "rid long, k long, rt timestamp")
    out = asof_join(left, right, ["k"], "t", "rt", ["rid", "rt"]).collect()
    assert out[0]["asof_rid"] == 101

    out2 = asof_join(left, right, ["k"], "t", "rt", ["rid", "rt"],
                     strict=False).collect()
    assert out2[0]["asof_rid"] == 100  # <= includes the tie


def test_asof_no_prior_match_is_null(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T08:00:00")),
         (2, 2, ts("2024-01-01T12:00:00"))], "id long, k long, t timestamp")
    right = spark.createDataFrame(
        [(100, 1, ts("2024-01-01T09:00:00"))], "rid long, k long, rt timestamp")
    got = {r["id"]: r["asof_rid"]
           for r in asof_join(left, right, ["k"], "t", "rt", ["rid"]).collect()}
    assert got == {1: None, 2: None}  # before any right row / wrong key


def test_asof_picks_latest_prior_per_key(spark):
    left = spark.createDataFrame(
        [(1, 1, ts("2024-01-01T10:00:00")),
         (2, 1, ts("2024-01-01T12:00:00"))], "id long, k long, t timestamp")
    right = spark.createDataFrame(
        [(100, 1, ts("2024-01-01T09:00:00")),
         (101, 1, ts("2024-01-01T11:00:00"))], "rid long, k long, rt timestamp")
    got = {r["id"]: r["asof_rid"]
           for r in asof_join(left, right, ["k"], "t", "rt", ["rid"]).collect()}
    assert got == {1: 100, 2: 101}


def test_interval_join_containment_and_left_nulls(spark):
    from stock_data_etl_pipeline_spark.operators.asof import interval_join
    facts = spark.createDataFrame(
        [(1, "u", 5), (2, "u", 10), (3, "u", 99), (4, "v", 5)],
        "event_id long, user string, ts long")
    iv = spark.createDataFrame(
        [("u", 0, 10, "s1"), ("u", 50, 60, "s2")],
        "user string, s long, e long, name string")
    out = {r["event_id"]: r["iv_name"]
           for r in interval_join(facts, iv, on=["user"], ts="ts",
                                  start="s", end="e",
                                  payload=["name"]).collect()}
    assert out[1] == "s1"
    assert out[2] == "s1"      # end bound inclusive
    assert out[3] is None      # between intervals -> left row kept, NULL
    assert out[4] is None      # other key, no intervals


def test_interval_join_on_derived_intervals_no_ambiguity(spark):
    # the motivating composition: intervals computed FROM the fact table
    from pyspark.sql import functions as F

    from stock_data_etl_pipeline_spark.operators.asof import interval_join
    facts = spark.createDataFrame(
        [(1, "u", 5), (2, "u", 6)], "event_id long, user string, ts long")
    iv = (facts.groupBy("user")
          .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
          .withColumn("name", F.lit("span")))
    out = interval_join(facts, iv, on=["user"], ts="ts",
                        start="s", end="e", payload=["name"]).collect()
    assert all(r["iv_name"] == "span" for r in out)


def test_asof_forward_direction_and_ties(spark):
    import datetime as dt
    from stock_data_etl_pipeline_spark.operators.asof import asof_join
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "k", t(5)), (2, "k", t(20))], "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("k", t(5), 50.0), ("k", t(10), 100.0)],
        "k string, rts timestamp, px double")
    # inclusive: the t(5) right row matches the t(5) left row
    got = {r["id"]: r["asof_px"] for r in asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_payload=["px"], strict=False, direction="forward").collect()}
    assert got == {1: 50.0, 2: None}
    # strict: the equal-timestamp row is skipped, next one matches
    got = {r["id"]: r["asof_px"] for r in asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_payload=["px"], strict=True, direction="forward").collect()}
    assert got == {1: 100.0, 2: None}


def test_asof_tolerance_nulls_stale_matches(spark):
    import datetime as dt

    from stock_data_etl_pipeline_spark.operators.asof import asof_join
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, 1, t0 + dt.timedelta(seconds=100)),
         (2, 1, t0 + dt.timedelta(seconds=5000)),
         (3, 2, t0 + dt.timedelta(seconds=50))],
        "id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(10, 1, t0), (20, 2, t0 + dt.timedelta(seconds=40))],
        "rid long, k long, rts timestamp")
    out = {r["id"]: r["m_rid"] for r in asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_payload=["rid"], prefix="m_",
        tolerance_seconds=1800).collect()}
    # id 1: match 100s old -> kept; id 2: 5000s old -> nulled;
    # id 3: 10s old -> kept
    assert out == {1: 10, 2: None, 3: 20}


def test_asof_tolerance_none_keeps_all(spark):
    import datetime as dt

    from stock_data_etl_pipeline_spark.operators.asof import asof_join
    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, 1, t0 + dt.timedelta(days=300))], "id long, k long, ts timestamp")
    right = spark.createDataFrame([(10, 1, t0)],
                                  "rid long, k long, rts timestamp")
    out = asof_join(left, right, on=["k"], left_ts="ts",
                    right_ts="rts", right_payload=["rid"],
                    prefix="m_").collect()
    assert out[0]["m_rid"] == 10  # no tolerance -> any staleness OK


def test_interval_join_self_fusion_matches_operator(spark, tmp_path):
    # pins the events_interval_join catalog fusion: gap sessions partition
    # each user's timeline, so carrying (session_id, session_start) in the
    # sessionize window equals interval_join(events, sessionize(events))
    import datetime as dt

    from pyspark.sql import functions as F

    from stock_data_etl_pipeline_spark.operators.asof import interval_join
    from stock_data_etl_pipeline_spark.plans.catalog_streaming import (
        events_interval_join)
    from stock_data_etl_pipeline_spark.streaming.events import sessionize

    t = lambda m: dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=m)  # noqa: E731
    rows = [  # two users; session breaks at >30 min gaps; a ts tie
        (1, 7, t(0)), (2, 7, t(10)), (3, 7, t(10)), (4, 7, t(90)),
        (5, 7, t(95)), (6, 8, t(0)), (7, 8, t(200)), (8, 8, t(201))]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    # TIMESTAMP_MICROS: INT96 reads back as ns through the footer
    # detector and mismatches the us schema (round-12 pin)
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        ev.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")

    fused = events_interval_join(spark, str(tmp_path)).collect()
    iv = sessionize(ev, gap_seconds=1800)
    op = (interval_join(ev, iv, on=["user_id"], ts="ts",
                        start="session_start", end="session_end",
                        payload=["session_id", "session_start"])
          .orderBy("event_id", "iv_session_id").collect())
    assert [tuple(r) for r in fused] == [tuple(r) for r in op]
    assert all(r["iv_session_id"] is not None for r in fused)
