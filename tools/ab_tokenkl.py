"""Throwaway interleaved A/B for token_kl_by_source:
A = current (st pinned with (source,term) layout, gt broadcast join),
B = st pinned repartition("term") + shuffle_hash on the gt join.
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


def build(spark, sf_dir, variant):
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.col("source"),
                      F.explode(words("text")).alias("term"))
    st = (tok.groupBy("source", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("c_st")))
    if variant == "B":
        st = st.repartition("term")
    st = pin(st)
    gt = st.groupBy("term").agg(F.sum("c_st").cast("long").alias("c_t"))
    if variant == "B":
        gt = gt.hint("shuffle_hash")
    ns = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("n_s"))
    n_tot = ns.agg(F.sum("n_s").cast("long").alias("n_tot"))
    t6 = F.round((F.col("c_st").cast("double")
                  * F.log(F.col("c_st").cast("double")
                          / F.col("c_t").cast("double"))) * F.lit(1e6),
                 0).cast("long")
    s = (st.join(gt, "term").select("source", t6.alias("t6"))
         .groupBy("source").agg(F.sum("t6").cast("long").alias("s6")))
    out = s.join(ns, "source").crossJoin(F.broadcast(n_tot))
    kl = F.round((F.col("s6").cast("double") / F.lit(1e6))
                 / F.col("n_s").cast("double")
                 + F.log(F.col("n_tot").cast("double")
                         / F.col("n_s").cast("double")), 6)
    return (out.select("source", F.col("n_s").alias("n_tokens"),
                       kl.alias("kl"))
            .orderBy("source"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_tkl")
    spark.range(1).count()
    variants = ["A", "B"]
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
