"""Iterative operators: near-dup connected components, k-means-lite."""

from __future__ import annotations

import pytest

from stock_data_etl_pipeline_spark.operators.clustering import (
    cluster_near_dups,
    kmeans_lite,
)


def test_cluster_near_dups_components(spark):
    # components: {1,2,3} (chained), {7,9}; 5 appears in no pair
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in cluster_near_dups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_cluster_transitive_merge(spark):
    # two chains merged by a late edge -> single component rooted at min id
    pairs = spark.createDataFrame(
        [(10, 11), (20, 21), (11, 20)], "id_a long, id_b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in cluster_near_dups(pairs).collect()}
    assert set(got.values()) == {10}


def test_kmeans_lite_separates_clusters(spark):
    # two obvious clusters around (1,0) and (0,1); seeds at vec_id 0 and 40
    rows = ([(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(0, 5)]
            + [(40 + i, [0.0, 1.0 + 0.01 * i], 0) for i in range(0, 5)])
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = kmeans_lite(df, iterations=2, seed_stride=40).collect()
    assert [r["centroid_id"] for r in out] == [0, 40]
    assert {r["n_members"] for r in out} == {5}
    c0 = out[0]["centroid"]
    assert c0[0] == pytest.approx(1.02, abs=1e-6)  # mean of 1.00..1.04
    assert c0[1] == 0.0
    # determinism across runs
    again = kmeans_lite(df, iterations=2, seed_stride=40).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_cluster_long_path_converges(spark):
    # a 150-edge path needs 149 one-hop rounds; pointer jumping must
    # collapse it within the default iteration budget (O(log diameter))
    from stock_data_etl_pipeline_spark.operators.clustering import (
        cluster_near_dups,
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(150)], "id_a long, id_b long")
    out = cluster_near_dups(pairs).collect()
    assert len(out) == 151
    assert {r["cluster_id"] for r in out} == {0}


def test_canonical_keep_best_per_cluster(spark):
    from stock_data_etl_pipeline_spark.operators.dedup import canonical_keep
    # cluster {1,2,3} via pairs, 4 is a singleton; 2 has the longest text
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 50), (4, 7)], "doc_id long, n_chars long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long")
    got = {(r["doc_id"], r["cluster_id"], r["n_chars"])
           for r in canonical_keep(docs, pairs).collect()}
    assert got == {(2, 1, 99), (4, 4, 7)}


def test_canonical_keep_tie_breaks_to_lowest_id(spark):
    from stock_data_etl_pipeline_spark.operators.dedup import canonical_keep
    docs = spark.createDataFrame(
        [(5, 40), (6, 40)], "doc_id long, n_chars long")
    pairs = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    got = [(r["doc_id"], r["cluster_id"])
           for r in canonical_keep(docs, pairs).collect()]
    assert got == [(5, 5)]


def test_logistic_fit_learns_separable_direction(spark):
    from stock_data_etl_pipeline_spark.operators.clustering import (
        logistic_fit,
    )
    # y=1 iff x1 large: after GD the x1 weight must be positive and
    # dominate; bias pulls negative for the x1<0 class
    rows = [(1.0, 2.0) if i % 2 == 0 else (0.0, -2.0) for i in range(200)]
    df = spark.createDataFrame(rows, "y double, x1 double")
    w = {r["idx"]: r["w"] for r in
         logistic_fit(df, ["x1"], "y", iterations=8, lr=1.0).collect()}
    assert w[1] > 0.5, f"feature weight should be strongly positive: {w}"
    # prediction check: sigmoid(w0 + w1*2) > .5 > sigmoid(w0 - w1*2)
    import math
    p_pos = 1 / (1 + math.exp(-(w[0] + w[1] * 2.0)))
    p_neg = 1 / (1 + math.exp(-(w[0] - w[1] * 2.0)))
    assert p_pos > 0.8 and p_neg < 0.2


def test_calibration_table_quantile_bins_and_perfect_model(spark):
    from stock_data_etl_pipeline_spark.operators.clustering import (
        calibration_table)
    # weights chosen so p = sigmoid(10*x1 - 5): x1 > 0.5 -> p ~ 1.
    # labels agree with the model -> every bin is well-calibrated
    rows = [(i, float(i % 2), (0.2 if i % 2 == 0 else 0.8)) for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, y double, x1 double")
    out = calibration_table(d, [-5.0, 10.0], ["x1"], "y",
                            id_col="doc_id", bins=4).collect()
    assert [r["bin"] for r in out] == [1, 2, 3, 4]
    assert all(r["n"] == 10 for r in out)  # quantile bins are equal-size
    # low-confidence bins hold the negatives, high-confidence the
    # positives; confidence tracks the empirical rate closely
    assert out[0]["frac_pos"] == 0.0 and out[-1]["frac_pos"] == 1.0
    for r in out:
        assert r["gap"] <= 0.05
        assert r["gap"] == round(abs(r["avg_conf"] - r["frac_pos"]), 6)
