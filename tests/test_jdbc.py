"""S9 JDBC source/sink: real round-trip through embedded Derby (the
JDBC engine shipped in the Spark distribution), covering write, read,
partitioned read, and filter pushdown into the JDBC scan."""

from __future__ import annotations

import os

import pytest

from stock_data_etl_pipeline_spark.sources.jdbc import (
    JdbcDriverMissingError,
    read_jdbc,
    write_jdbc,
)

DERBY = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _url(tmp_path) -> str:
    return f"jdbc:derby:{os.path.join(str(tmp_path), 'ctrl')};create=true"


def test_jdbc_round_trip_and_pushdown(spark, tmp_path):
    url = _url(tmp_path)
    df = spark.createDataFrame(
        [(i, f"T{i:02d}", float(i) * 1.5) for i in range(20)],
        "id int, ticker string, score double")
    write_jdbc(df, url, "stocks", mode="overwrite", driver=DERBY)

    back = read_jdbc(spark, url, "stocks", driver=DERBY)
    assert back.count() == 20
    assert sorted(back.columns) == ["id", "score", "ticker"]

    # filter pushdown: the predicate must reach the JDBC scan node
    filtered = back.filter(back["id"] >= 15)
    assert filtered.count() == 5
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan

    # partitioned read: same data through 4 parallel range partitions
    part = read_jdbc(spark, url, "stocks", driver=DERBY,
                     partition_column="id", lower_bound=0, upper_bound=20,
                     num_partitions=4)
    assert part.rdd.getNumPartitions() == 4
    assert sorted(r["id"] for r in part.collect()) == list(range(20))


def test_jdbc_append_mode(spark, tmp_path):
    url = _url(tmp_path)
    df = spark.createDataFrame([(1, "A")], "id int, ticker string")
    write_jdbc(df, url, "runs", mode="overwrite", driver=DERBY)
    write_jdbc(df.selectExpr("id + 1 AS id", "ticker"), url, "runs",
               mode="append", driver=DERBY)
    back = read_jdbc(spark, url, "runs", driver=DERBY)
    assert sorted(r["id"] for r in back.collect()) == [1, 2]


def test_missing_driver_is_a_clear_error(spark):
    with pytest.raises(JdbcDriverMissingError):
        read_jdbc(spark, "jdbc:postgresql://nowhere/db", "t",
                  driver="org.postgresql.Driver")
