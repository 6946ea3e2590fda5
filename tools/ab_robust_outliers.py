"""Throwaway interleaved A/B: robust_outlier_profile with vs without
the g-keyed repartition of the bounded-domain count table.

Times the noop sink (guide §1.4) of the events_robust_outliers pipeline,
alternating variants inside ONE session so co-tenant drift hits both.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.session import get_spark
from stock_data_etl_pipeline_spark.sources.registry import load_table
from stock_data_etl_pipeline_spark.operators.aggregates import (
    _grouped_quantiles_from_counts)
from stock_data_etl_pipeline_spark.operators.pinned import pin, release_pinned


def build(spark, sf_dir, repart: bool):
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("value").isNotNull())
         .select(F.col("event_type").alias("g"),
                 F.round(F.col("value") * 100, 0).cast("long").alias("v"))
         .filter(F.col("v").isNotNull()))
    vc = v.groupBy("g", "v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    if repart:
        vc = vc.repartition("g")
    vc = pin(vc)
    med = (_grouped_quantiles_from_counts(vc, True)
           .select("g", F.col("q50").alias("med")))
    dev = (vc.join(F.broadcast(med), "g")
           .withColumn("ad", F.abs(F.col("v") - F.col("med"))))
    devc = (dev.groupBy("g", F.col("ad").alias("v"))
            .agg(F.sum("cnt").cast("long").alias("cnt")))
    mad = (_grouped_quantiles_from_counts(devc, True)
           .select("g", F.col("q50").alias("mad")))
    j = dev.join(F.broadcast(mad), "g")
    k = 3
    out = (j.groupBy("g")
           .agg(F.sum("cnt").cast("long").alias("n"),
                F.min("med").cast("long").alias("med"),
                F.min("mad").cast("long").alias("mad"),
                F.sum(F.when(F.col("ad") > k * F.col("mad"),
                             F.col("cnt")).otherwise(F.lit(0)))
                .cast("long").alias("n_outliers")))
    rate = F.expr("(1000000 * n_outliers) div n") / 1e6
    return (out.select(F.col("g").alias("event_type"), "n", "med", "mad",
                       "n_outliers", rate.alias("outlier_rate"))
            .orderBy("event_type"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_ro")
    spark.range(1).count()
    # warmup both variants once
    for rp in (False, True):
        release_pinned()
        build(spark, sf_dir, rp).write.format("noop").mode("overwrite").save()
    times = {False: [], True: []}
    for _ in range(6):
        for rp in (False, True):
            release_pinned()
            df = build(spark, sf_dir, rp)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[rp].append(round(time.perf_counter() - t0, 3))
    print("no-repart:", times[False], "min", min(times[False]))
    print("repart   :", times[True], "min", min(times[True]))


if __name__ == "__main__":
    main()
