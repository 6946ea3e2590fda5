"""Runtime scan-pruning mechanisms that carry the 100 TB story:

- Dynamic Partition Pruning: a join against a filtered dim must prune
  the partitioned fact scan to the surviving keys AT RUNTIME (the dim
  filter's matches aren't knowable at plan time). Without DPP a
  by-date/by-key partitioned 100 TB table is read in full for every
  selective dim join.
- Runtime bloom-filter join pruning: for shuffle joins too big to
  broadcast, Spark can build a bloom filter on the (filtered) build
  side and push `might_contain` into the probe-side scan — the
  row-level analogue of DPP.

Both are config-default behaviors, but silently stop firing when a
loader change breaks stats or a plan rewrite hides the join key; these
tests pin them the way test_plan_regression pins static pushdown."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, tmp_path):
    fact_dir = os.path.join(str(tmp_path), "ev_parted")
    ev = load_table(spark, SF, "events")
    ev.write.partitionBy("event_type").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [(t, 1 if t == "purchase" else 0)
         for t in ["purchase", "view", "click", "signup", "refund"]],
        "event_type string, keep int")
    q = (fact.join(dim.filter(F.col("keep") == 1), "event_type")
         .agg(F.count(F.lit(1)).alias("n")))
    n = q.collect()[0]["n"]
    # semantics: equals a direct filter on the surviving key
    expect = ev.filter(F.col("event_type") == "purchase").count()
    assert n == expect > 0
    plan = q._jdf.queryExecution().executedPlan().toString()
    part_filters = re.findall(r"PartitionFilters: \[[^\]]*", plan)
    assert any("dynamicpruningexpression(event_type" in p
               for p in part_filters), part_filters


def test_runtime_bloom_filter_prunes_shuffle_join_probe(spark):
    saved = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold":
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter."
                           "applicationSideScanSizeThreshold"),
    }
    # force a shuffle join (no broadcast) and let the tiny test scan
    # qualify as a bloom application side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter."
                   "applicationSideScanSizeThreshold", "0")
    try:
        li = load_table(spark, SF, "lineitem")
        o = (load_table(spark, SF, "orders")
             .filter(F.col("o_orderstatus") == "F"))
        q = (li.join(o, li.l_orderkey == o.o_orderkey)
             .agg(F.count(F.lit(1)).alias("n")))
        n = q.collect()[0]["n"]
        opt = q._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt  # bloom probe injected
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    # semantics unchanged vs the default (broadcastable) plan
    li = load_table(spark, SF, "lineitem")
    o = (load_table(spark, SF, "orders")
         .filter(F.col("o_orderstatus") == "F"))
    m = (li.join(o, li.l_orderkey == o.o_orderkey)
         .agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"])
    assert n == m > 0
