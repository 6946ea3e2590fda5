"""Bucketed tables: co-located joins without a shuffle.

SURVEY §4 marks the reference's index-backed access paths as "analog,
needs config" on Spark — bucketing is that config for the join side:
pre-hash-partition both tables into the same number of buckets on the
join key at WRITE time, and every later equi-join on that key skips the
exchange entirely (each task zips bucket i with bucket i).

At 100 TB this is the difference between shuffling the fact table per
join and never shuffling it: bucket the runs/lineitem-class facts by
their FK once, then every per-key join/aggregation is exchange-free.
Verified by test_bucketed: the joined plan contains zero Exchange nodes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str,
                   bucket_cols: Sequence[str], num_buckets: int,
                   sort_cols: Sequence[str] | None = None) -> None:
    """Save as a session-catalog parquet table bucketed (and optionally
    sorted) on ``bucket_cols``. Both join sides must use the same
    ``num_buckets`` for the exchange-free join."""
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes in the executed plan — 0 for a
    properly co-located bucketed join."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("ReusedExchange")
