"""Throwaway interleaved A/B: rich_club threshold counting from the
degree/dmin HISTOGRAMS (round-14 shape, shipped) vs the round-13
row-scale crossJoin shape (deg x thr and edge x thr BNLJs).

Adjudicates the r14 verdict's perf-weak mark (driver showed 0.73x under
loadavg 5.68; builder quiet box showed 1.92->1.80 improved). Times the
noop sink (guide 1.4), alternating variants inside ONE session so
co-tenant drift hits both equally.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.session import get_spark
from stock_data_etl_pipeline_spark.sources.registry import load_table
from stock_data_etl_pipeline_spark.operators.analytics import (
    RICH_CLUB_PCTS, _canon_undirected, rich_club)
from stock_data_etl_pipeline_spark.operators.pinned import (
    pin, pin_cut, release_pinned)


def rich_club_r13(pairs, id_a, id_b, pcts=RICH_CLUB_PCTS):
    """The pre-92c8e57 shape: thresholds from the histogram, but
    member/edge counting via row-scale crossJoins with the 3-row
    threshold table (5x row amplification through two BNLJs)."""
    und = pin_cut(_canon_undirected(pairs, id_a, id_b))
    deg = pin(und.select(F.col("a").alias("node"))
              .unionByName(und.select(F.col("b").alias("node")))
              .groupBy("node")
              .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    hist = (deg.groupBy("deg")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    w_cum = (Window.partitionBy().orderBy("deg")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    hist = (hist.withColumn("cum", F.sum("cnt").over(w_cum))
            .withColumn("n_total",
                        F.sum("cnt").over(Window.partitionBy())))
    one = hist.agg(*[
        F.min(F.when(
            F.col("cum") >= F.expr(f"({p} * n_total + {p}) div 100"),
            F.col("deg"))).alias(f"t{p}")
        for p in pcts])
    stack = ", ".join(f"{p}L, t{p}" for p in pcts)
    pct_df = one.selectExpr(
        f"stack({len(pcts)}, {stack}) AS (pct, threshold_deg)")
    thr = F.broadcast(pct_df)
    members = (deg.crossJoin(thr)
               .filter(F.col("deg") >= F.col("threshold_deg"))
               .groupBy("pct", "threshold_deg")
               .agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    ed = (und.join(da, "a").join(db, "b")
          .select(F.least("da", "db").alias("dmin")))
    edges = (ed.crossJoin(thr)
             .filter(F.col("dmin") >= F.col("threshold_deg"))
             .groupBy("pct", "threshold_deg")
             .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    j = (members.join(edges, ["pct", "threshold_deg"], "left")
         .withColumn("n_edges",
                     F.coalesce(F.col("n_edges"), F.lit(0))
                     .cast("long")))
    phi = F.expr("(100000000 * 2 * n_edges) div "
                 "(n_nodes * (n_nodes - 1))") / 1e6
    return (j.select("pct", "threshold_deg", "n_nodes", "n_edges",
                     F.when(F.col("n_nodes") > 1, phi).alias("phi"))
            .orderBy("pct"))


def rich_club_hybrid(pairs, id_a, id_b, pcts=RICH_CLUB_PCTS):
    """Members from the degree histogram (no row-scale node pass, free —
    hist already exists for the thresholds); edges via the direct 3-row
    broadcast crossJoin + filter + partial agg (no extra dmin-histogram
    stage). One stage fewer than r14, node pass cheaper than r13."""
    und = pin_cut(_canon_undirected(pairs, id_a, id_b))
    deg = pin(und.select(F.col("a").alias("node"))
              .unionByName(und.select(F.col("b").alias("node")))
              .groupBy("node")
              .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    hist = (deg.groupBy("deg")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    w_cum = (Window.partitionBy().orderBy("deg")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    hist = (hist.withColumn("cum", F.sum("cnt").over(w_cum))
            .withColumn("n_total",
                        F.sum("cnt").over(Window.partitionBy())))
    one = hist.agg(*[
        F.min(F.when(
            F.col("cum") >= F.expr(f"({p} * n_total + {p}) div 100"),
            F.col("deg"))).alias(f"t{p}")
        for p in pcts])
    stack = ", ".join(f"{p}L, t{p}" for p in pcts)
    pct_df = one.selectExpr(
        f"stack({len(pcts)}, {stack}) AS (pct, threshold_deg)")
    thr = F.broadcast(pct_df)
    members = (hist.crossJoin(thr)
               .filter(F.col("deg") >= F.col("threshold_deg"))
               .groupBy("pct", "threshold_deg")
               .agg(F.sum("cnt").cast("long").alias("n_nodes")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    ed = (und.join(da, "a").join(db, "b")
          .select(F.least("da", "db").alias("dmin")))
    edges = (ed.crossJoin(thr)
             .filter(F.col("dmin") >= F.col("threshold_deg"))
             .groupBy("pct", "threshold_deg")
             .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    j = (members.join(edges, ["pct", "threshold_deg"], "left")
         .withColumn("n_edges",
                     F.coalesce(F.col("n_edges"), F.lit(0))
                     .cast("long")))
    phi = F.expr("(100000000 * 2 * n_edges) div "
                 "(n_nodes * (n_nodes - 1))") / 1e6
    return (j.select("pct", "threshold_deg", "n_nodes", "n_edges",
                     F.when(F.col("n_nodes") > 1, phi).alias("phi"))
            .orderBy("pct"))


def copurchase_pairs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    return (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                   & (F.col("a.i") < F.col("b.i")))
            .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_rich_club")
    spark.range(1).count()
    variants = {"r13_crossjoin": rich_club_r13, "r14_histogram": rich_club}
    # equivalence check first (rows must match exactly)
    rows = {}
    for name, fn in variants.items():
        release_pinned()
        rows[name] = [tuple(r) for r in
                      fn(copurchase_pairs(spark, sf_dir), "pa", "pb")
                      .collect()]
    assert rows["r13_crossjoin"] == rows["r14_histogram"], \
        (rows["r13_crossjoin"], rows["r14_histogram"])
    print("equivalence OK:", rows["r14_histogram"])
    times = {k: [] for k in variants}
    for i in range(6):
        for name, fn in variants.items():
            release_pinned()
            # pin_cut writes run eagerly at build time, so the build
            # must sit INSIDE the timed window (bench.py times the
            # builder call the same way)
            t0 = time.perf_counter()
            df = fn(copurchase_pairs(spark, sf_dir), "pa", "pb")
            df.write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in times.items():
        print(f"{name:14s} {ts} min {min(ts)} median {sorted(ts)[len(ts)//2]}")


if __name__ == "__main__":
    main()
