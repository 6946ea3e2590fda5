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
