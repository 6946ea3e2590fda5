"""Bucketed co-located join: the equi-join on the bucket key must plan
without any shuffle exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.sources.bucketed import (
    exchange_count,
    read_table,
    write_bucketed,
)
from stock_data_etl_pipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])

    ob, lb = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
    # force sort-merge (broadcast would hide the bucketing story)
    joined = (lb.hint("merge")
              .join(ob, lb["l_orderkey"] == ob["o_orderkey"])
              .select("l_orderkey", "l_extendedprice", "o_totalprice"))
    rows = joined.collect()
    assert len(rows) == lineitem.count()
    assert exchange_count(joined) == 0  # co-located: no shuffle at all

    # same join on the unbucketed source tables DOES shuffle
    plain = (lineitem.hint("merge")
             .join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
             .select("l_orderkey", "l_extendedprice", "o_totalprice"))
    plain.collect()
    assert exchange_count(plain) >= 2  # both sides exchange

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
