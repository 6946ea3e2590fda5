"""Bucketed co-located joins: the write-once-shuffle-never contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark):
    # spark.sql.warehouse.dir is static config; tables land in the
    # session default (./spark-warehouse, gitignored) and are dropped
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") + 1).alias("b"))
    write_bucketed(left, "bk_left", "k", buckets=8)
    write_bucketed(right, "bk_right", "k", buckets=8)
    yield "bk_left", "bk_right"
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    # disable broadcast: at test scale the planner would broadcast the
    # small side (bypassing buckets entirely — at 100 TB fact-to-fact
    # neither side broadcasts, which is the case bucketing exists for)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "k")
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan[:2000]}"
    assert "Bucketed: true" in plan
    assert joined.count() == 5_000


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    lt, _ = bucketed_pair
    agg = spark.table(lt).groupBy("k").agg(F.sum("a").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, (
        f"groupBy on the bucket key shuffled:\n{plan[:2000]}")
    assert agg.count() == 10_000


def test_unbucketed_join_does_shuffle(spark):
    # control: the same join without bucketing plans an Exchange, so the
    # assertion above is meaningful
    left = spark.range(0, 10_000).select(F.col("id").alias("k"))
    right = spark.range(0, 10_000, 2).select(F.col("id").alias("k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (left.join(right, "k")._jdf.queryExecution()
                .executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange" in plan
