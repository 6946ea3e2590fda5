"""Bucketed tables: co-located joins with NO shuffle.

At 100 TB the expensive joins are fact-to-fact (lineitem x orders,
events x events) where neither side broadcasts. Bucketing both tables
into the same number of buckets ON the join key at WRITE time makes
every subsequent join on that key shuffle-free: each task reads bucket
i of both sides and sort-merge-joins locally — `tests/test_bucketed.py`
asserts the join plan contains zero Exchange nodes.

This is the persisted twin of `repartition(...)`-before-join: pay the
shuffle once at ingest, amortize it over every downstream join and
aggregation on the key (Spark also elides the shuffle for groupBy on
the bucket key). The reference's unified table keyed by
(ticker, record_type, period_end_date) is exactly the shape that
benefits: bucket by ticker and every per-ticker merge/read stays local.

Requires `saveAsTable` (bucket metadata lives in the session catalog —
plain `.parquet(path)` cannot carry it); the local session uses the
default in-memory catalog + spark.sql.warehouse.dir, a real deployment
uses its metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   buckets: int = 8, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted)
    by ``key``. Sorting within buckets lets the sort-merge join skip
    its sort too (plan shows neither Exchange nor Sort)."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = (df.write.mode(mode).format("parquet")
              .bucketBy(buckets, *keys))
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Spark plans a shuffle-free (and, if bucket-sorted,
    sort-free) SortMergeJoin."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
