"""Incremental LSH dedup: batch-vs-index probing, batch-internal pairs,
and the persisted-index round trip through ManagedTable."""

from __future__ import annotations

from stock_data_etl_pipeline_spark.operators.dedup import (
    incremental_lsh_dedup, lsh_band_table, minhash_lsh_pairs)
from stock_data_etl_pipeline_spark.sources.managed_table import ManagedTable

BASE = ("the quick brown fox jumps over the lazy dog and then naps "
        "in the warm afternoon sun near the old farm gate")
NEAR = ("the quick brown fox jumps over the lazy dog and then naps "
        "in the warm afternoon sun near the old barn gate")
OTHER = ("completely unrelated text about distributed query engines "
         "optimizing shuffle exchanges under adaptive execution plans")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_matches_full_lsh_restricted(spark):
    corpus = _docs(spark, [(1, BASE), (2, OTHER)])
    batch = _docs(spark, [(10, NEAR), (11, "tiny"), (12, NEAR)])
    index = lsh_band_table(corpus, num_hashes=8, bands=4, k=3)
    got = incremental_lsh_dedup(batch, corpus, index, threshold=0.5,
                                num_hashes=8, bands=4, k=3)
    pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}
    # batch-vs-corpus AND batch-internal pairs; never corpus-corpus
    assert (1, 10) in pairs and (1, 12) in pairs and (10, 12) in pairs
    assert all(a >= 10 or b >= 10 for a, b in pairs)
    # equals the full-corpus LSH result restricted to batch-touching pairs
    full = minhash_lsh_pairs(corpus.unionByName(batch), threshold=0.5,
                             num_hashes=8, bands=4, k=3)
    expected = {(r["id_a"], r["id_b"]) for r in full.collect()
                if r["id_a"] >= 10 or r["id_b"] >= 10}
    assert pairs == expected


def test_index_round_trip_through_managed_table(spark, tmp_path):
    corpus = _docs(spark, [(1, BASE), (2, OTHER)])
    tbl = ManagedTable(spark, str(tmp_path / "dedup_index"))
    tbl.create(lsh_band_table(corpus, num_hashes=8, bands=4, k=3))

    # batch 1 probes the STORED index (no corpus text recompute)
    batch1 = _docs(spark, [(10, NEAR)])
    got1 = incremental_lsh_dedup(batch1, corpus, tbl.read(), threshold=0.5,
                                 num_hashes=8, bands=4, k=3)
    assert {(r["id_a"], r["id_b"]) for r in got1.collect()} == {(1, 10)}

    # fold batch 1 into the index; batch 2 must now match batch 1's doc
    tbl.merge(lsh_band_table(batch1, num_hashes=8, bands=4, k=3),
              keys=["doc_id", "band"])
    batch2 = _docs(spark, [(20, NEAR)])
    corpus2 = corpus.unionByName(batch1)
    got2 = incremental_lsh_dedup(batch2, corpus2, tbl.read(), threshold=0.5,
                                 num_hashes=8, bands=4, k=3)
    assert {(r["id_a"], r["id_b"]) for r in got2.collect()} == {
        (1, 20), (10, 20)}
