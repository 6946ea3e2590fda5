"""Interleaved A/B: lsh_band_sweep per-config joins (A, the pre-round-14
shape, inlined here) vs the fused single-join sweep (B, the live code).
Noop sink, alternating attempts in ONE session so co-tenant load hits
both variants equally. Usage: python tools/ab_bandsweep.py [rounds]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from stock_data_etl_pipeline_spark.operators.dedup import (  # noqa: E402
    _band_signature_array, lsh_band_sweep, minhash_signature,
    ngram_jaccard_pairs)
from stock_data_etl_pipeline_spark.operators.pinned import (  # noqa: E402
    pin_cut, release_pinned)
from stock_data_etl_pipeline_spark.session import get_spark  # noqa: E402
from stock_data_etl_pipeline_spark.sources.registry import (  # noqa: E402
    load_table)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def variant_a(docs, threshold=0.5, num_hashes=12,
              band_counts=(1, 2, 3, 4, 6), text_col="text",
              id_col="doc_id", k=3):
    band_counts = sorted({int(b) for b in band_counts})
    sig = pin_cut(minhash_signature(docs, num_hashes, text_col, id_col, k))
    exact = pin_cut(ngram_jaccard_pairs(docs, threshold, text_col, id_col, k)
                    .select("id_a", "id_b"))
    n_exact = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    per_config = []
    for b in band_counts:
        rows = num_hashes // b
        bt = sig.select(F.col(id_col),
                        F.posexplode(_band_signature_array(num_hashes, b))
                        .alias("band", "bsig"))
        a, c = bt.alias("a"), bt.alias("b")
        cand = (a.join(c, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bsig") == F.col("b.bsig"))
                       & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
                .select(F.col(f"a.{id_col}").alias("id_a"),
                        F.col(f"b.{id_col}").alias("id_b"))
                .distinct())
        hit = F.coalesce(F.col("h"), F.lit(0))
        per_config.append(
            cand.join(exact.withColumn("h", F.lit(1)),
                      ["id_a", "id_b"], "left")
            .agg(F.lit(b).cast("long").alias("bands"),
                 F.lit(rows).cast("long").alias("rows_per_band"),
                 F.count(F.lit(1)).cast("long").alias("n_cand"),
                 F.sum(hit).cast("long").alias("n_hit")))
    swept = per_config[0]
    for extra in per_config[1:]:
        swept = swept.unionByName(extra)
    return (swept.crossJoin(F.broadcast(n_exact))
            .select("bands", "rows_per_band", "n_cand",
                    F.coalesce(F.col("n_hit"), F.lit(0)).cast("long")
                    .alias("n_hit"), "n_exact",
                    F.round(F.when(F.col("n_cand") > 0,
                                   F.coalesce(F.col("n_hit"), F.lit(0))
                                   / F.col("n_cand")), 6).alias("precision"),
                    F.round(F.when(F.col("n_exact") > 0,
                                   F.coalesce(F.col("n_hit"), F.lit(0))
                                   / F.col("n_exact")), 6).alias("recall"))
            .orderBy("bands"))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark()
    docs = load_table(spark, SF_DIR, "documents")
    res = {"A_perconfig": [], "B_fused": []}
    for _ in range(rounds):
        for name, fn in (("A_perconfig", variant_a),
                         ("B_fused", lsh_band_sweep)):
            release_pinned()
            t0 = time.time()
            fn(docs).write.format("noop").mode("overwrite").save()
            res[name].append(round(time.time() - t0, 3))
    for name, ts in res.items():
        print(name, ts, "min", min(ts), "med", sorted(ts)[len(ts) // 2])


if __name__ == "__main__":
    main()
