"""Throwaway interleaved A/B: ewma_trend via the bounded-window
collect_list fold (round-14 shape, shipped) vs the round-13 banded
rank self-join (explode + equi-join + groupBy per stage).

Adjudicates the r14 verdict's perf-weak mark on stock_ewma_trend
(driver showed 0.90x under loadavg 5.68 while the same kernel's other
callers improved: trix 1.89x, cci 1.59x). Times the noop sink
(guide 1.4), alternating variants inside ONE session.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.session import get_spark
from stock_data_etl_pipeline_spark.sources.registry import load_table
from stock_data_etl_pipeline_spark.operators import indicators as ind
from stock_data_etl_pipeline_spark.operators.pinned import release_pinned


def ewma_trend_r13(bars, decay=ind.EWMA_DECAY, lookback=ind.EWMA_LOOKBACK):
    """The pre-5dc3535 shape: banded rank self-join."""
    from stock_data_etl_pipeline_spark.operators.windows import (
        banded_rank_join)
    w = Window.partitionBy("event_type").orderBy("hr")
    b = bars.select("event_type", "hr", "close",
                    F.row_number().over(w).alias("rn"))
    joined = banded_rank_join(b, ["event_type"], "rn", lookback)
    wgt = F.pow(F.lit(decay), F.col("cur.rn") - F.col("prev.rn"))
    return (joined.groupBy(F.col("cur.event_type").alias("event_type"),
                           F.col("cur.hr").alias("hr"),
                           F.col("cur.close").alias("close"))
            .agg(F.round(F.sum(F.col("prev.close") * wgt) / F.sum(wgt), 6)
                 .alias("ewma")))


def build(spark, sf_dir, variant):
    ev = load_table(spark, sf_dir, "events")
    fn = ewma_trend_r13 if variant == "r13_banded_join" else ind.ewma_trend
    return fn(ind.hourly_bars(ev)).orderBy("event_type", "hr")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_ewma")
    spark.range(1).count()
    variants = ("r13_banded_join", "r14_window_fold")
    rows = {}
    for v in variants:
        release_pinned()
        rows[v] = [tuple(r) for r in build(spark, sf_dir, v).collect()]
    assert rows[variants[0]] == rows[variants[1]], "variant results differ"
    print(f"equivalence OK ({len(rows[variants[0]])} rows)")
    times = {v: [] for v in variants}
    for _ in range(6):
        for v in variants:
            release_pinned()
            t0 = time.perf_counter()
            df = build(spark, sf_dir, v)
            df.write.format("noop").mode("overwrite").save()
            times[v].append(round(time.perf_counter() - t0, 3))
    for v, ts in times.items():
        print(f"{v:16s} {ts} min {min(ts)} median {sorted(ts)[len(ts)//2]}")


if __name__ == "__main__":
    main()
