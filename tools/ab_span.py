"""Throwaway interleaved A/B/C for duplicate_span_stats:
A = current (dsc pinned with (doc,span) groupBy partitioning),
B = dsc pinned repartition("span") — tot agg + join reuse the layout,
C = B + SHUFFLE_HASH hint on the tot join (skip the 1M-row broadcast).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.session import get_spark
from stock_data_etl_pipeline_spark.sources.registry import load_table
from stock_data_etl_pipeline_spark.operators.corpus import words
from stock_data_etl_pipeline_spark.operators.pinned import pin, release_pinned


def build(spark, sf_dir, variant, n=8, max_dup_frac=0.3):
    from stock_data_etl_pipeline_spark.functions.text import (
        span_hashes_from_word_hashes, word_hashes)
    docs = load_table(spark, sf_dir, "documents")
    id_col = "doc_id"
    spans = (docs.select(F.col(id_col), words("text").alias("_ws"))
             .select(F.col(id_col), word_hashes("_ws").alias("_wh"))
             .select(F.col(id_col),
                     F.explode(span_hashes_from_word_hashes("_wh", n))
                     .alias("span")))
    dsc = spans.groupBy(id_col, "span").agg(F.count(F.lit(1)).alias("cnt"))
    if variant in ("B", "C"):
        dsc = dsc.repartition("span")
    dsc = pin(dsc)
    tot = dsc.groupBy("span").agg(F.sum("cnt").alias("tot"))
    if variant == "C":
        tot = tot.hint("shuffle_hash")
    per = (dsc.join(tot, "span")
           .groupBy(id_col)
           .agg(F.sum("cnt").alias("n_spans"),
                F.sum(F.when(F.col("tot") >= 2, F.col("cnt"))
                      .otherwise(F.lit(0))).alias("n_dup_spans")))
    return (docs.select(id_col).join(per, id_col, "left")
            .na.fill({"n_spans": 0, "n_dup_spans": 0})
            .withColumn("dup_frac",
                        F.when(F.col("n_spans") > 0,
                               F.round(F.col("n_dup_spans")
                                       / F.col("n_spans"), 6))
                        .otherwise(F.lit(0.0)))
            .withColumn("keep", F.col("dup_frac") <= max_dup_frac)
            .orderBy(id_col))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_span")
    spark.range(1).count()
    variants = ["A", "B", "C"]
    for v in variants:
        release_pinned()
        build(spark, sf_dir, v).write.format("noop").mode("overwrite").save()
    times = {v: [] for v in variants}
    for _ in range(6):
        for v in variants:
            release_pinned()
            df = build(spark, sf_dir, v)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times[v].append(round(time.perf_counter() - t0, 3))
    for v in variants:
        print(v, times[v], "min", min(times[v]))


if __name__ == "__main__":
    main()
