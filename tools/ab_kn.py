"""Throwaway interleaved A/B/C for kn_bigram_perplexity variants:
A = original (pinned occurrence stream through 4 stat joins),
B = type-first scoring, occurrence stream joined once,
C = type-first + (doc,bigram,cnt) pre-aggregate (current code shape).
Noop-sink timing (guide §1.4), alternated in one session.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.session import get_spark
from stock_data_etl_pipeline_spark.sources.registry import load_table
from stock_data_etl_pipeline_spark.operators.corpus import words, KN_NLL_GRID
from stock_data_etl_pipeline_spark.operators.pinned import pin, release_pinned


def build(spark, sf_dir, variant):
    docs = load_table(spark, sf_dir, "documents")
    id_col = "doc_id"
    base = docs.select(F.col(id_col), words("text").alias("_ws"))
    occ = (base
           .select(F.col(id_col), F.posexplode("_ws").alias("p", "w1"),
                   F.col("_ws").alias("_ws"))
           .select(F.col(id_col), "w1",
                   F.expr("get(_ws, p + 1)").alias("w2"))
           .filter(F.col("w2").isNotNull()))
    if variant == "C":
        docc = pin(occ.groupBy(F.col(id_col), "w1", "w2")
                   .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
        src = docc
        bi = pin(src.groupBy("w1", "w2")
                 .agg(F.sum("cnt").cast("long").alias("c12")))
        ctx = src.groupBy("w1").agg(F.sum("cnt").cast("long").alias("ctx1"))
    else:
        occ = pin(occ)
        src = occ
        bi = pin(src.groupBy("w1", "w2")
                 .agg(F.count(F.lit(1)).cast("long").alias("c12")))
        ctx = src.groupBy("w1").agg(F.count(F.lit(1)).cast("long")
                                    .alias("ctx1"))
    t1 = bi.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("t1"))
    cont = bi.groupBy("w2").agg(F.count(F.lit(1)).cast("long")
                                .alias("cont2"))
    btot = bi.agg(F.count(F.lit(1)).cast("long").alias("b"))
    num = (F.greatest(4 * F.col("c12") - 3, F.lit(0)).cast("long")
           * F.col("b") + 3 * F.col("t1") * F.col("cont2")).cast("long")
    den = (4 * F.col("ctx1") * F.col("b")).cast("long")
    nll = F.round(-F.log2(num.cast("double") / den.cast("double"))
                  * F.lit(KN_NLL_GRID), 0).cast("long")
    if variant == "A":
        j = (occ.join(bi, ["w1", "w2"])
             .join(ctx, "w1").join(t1, "w1").join(cont, "w2")
             .crossJoin(F.broadcast(btot)))
        per = (j.select(F.col(id_col), nll.alias("q"))
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                    F.sum("q").cast("long").alias("s")))
    else:
        scored_bi = (bi.join(ctx, "w1").join(t1, "w1").join(cont, "w2")
                     .crossJoin(F.broadcast(btot))
                     .select("w1", "w2", nll.alias("q")))
        jj = src.join(scored_bi, ["w1", "w2"])
        if variant == "C":
            per = (jj.select(F.col(id_col), "cnt", "q")
                   .groupBy(id_col)
                   .agg(F.sum("cnt").cast("long").alias("n_bigrams"),
                        F.sum(F.col("q") * F.col("cnt")).cast("long")
                        .alias("s")))
        else:
            per = (jj.select(F.col(id_col), "q")
                   .groupBy(id_col)
                   .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                        F.sum("q").cast("long").alias("s")))
    score = F.col("s").cast("double") / F.col("n_bigrams").cast("double") \
        / F.lit(KN_NLL_GRID)
    scored = per.select(F.col(id_col), "n_bigrams", score.alias("kn_score"))
    return (docs.select(id_col).join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
                    .alias("n_bigrams"), "kn_score")
            .orderBy(id_col))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_kn")
    spark.range(1).count()
    variants = ["A", "B"]
    for v in variants:
        release_pinned()
        build(spark, sf_dir, v).write.format("noop").mode("overwrite").save()
    times = {v: [] for v in variants}
    for _ in range(7):
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
