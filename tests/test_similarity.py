"""Similarity/embedding-space operators."""

def test_embedding_space_profile_geometry(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import (
        embedding_space_profile,
    )
    # label 0: two points symmetric about (1,0) -> centroid (1,0),
    # norm 1, every member at distance 1. label 1: a single point ->
    # centroid == the point, cohesion 0.
    emb = spark.createDataFrame(
        [(0, [1.0, 1.0], 0), (1, [1.0, -1.0], 0), (2, [3.0, 4.0], 1)],
        "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in embedding_space_profile(emb).collect()}
    assert out[0]["n_vectors"] == 2 and out[1]["n_vectors"] == 1
    assert abs(out[0]["centroid_norm"] - 1.0) < 1e-6
    assert abs(out[0]["cohesion"] - 1.0) < 1e-6
    assert abs(out[1]["centroid_norm"] - 5.0) < 1e-6
    assert out[1]["cohesion"] == 0.0


def test_trained_codebook_beats_sampled(spark):
    """k-means-trained PQ codebooks must strictly reduce quantization
    error vs the sampled codebook they are seeded from (Lloyd's descent
    property), with the same (cid, sub, codeword) schema so they drop
    into pq_adc_topk unchanged."""
    from stock_data_etl_pipeline_spark.operators.similarity import (
        pq_adc_topk,
        quantization_error,
        sampled_codebook,
        trained_codebook,
    )
    from stock_data_etl_pipeline_spark.sources.registry import load_table
    import os
    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        import pytest
        pytest.skip("testdata not present")
    e = load_table(spark, sf, "embeddings")
    sampled = sampled_codebook(e, m=4, dim=64, every=40)
    trained = trained_codebook(e, m=4, dim=64, every=40, iterations=2)
    assert sampled.columns == trained.columns
    err_s = quantization_error(e, sampled)
    err_t = quantization_error(e, trained)
    assert err_t < err_s, (err_t, err_s)
    # drop-in: top-k still runs and returns k deterministic rows
    qv = list(e.filter(e.vec_id == 0).collect()[0]["embedding"])
    top = pq_adc_topk(e, trained, qv, k=5).collect()
    assert len(top) == 5


def test_triplet_mining_semantics(spark):
    """Hand-built 2-label space: positives/negatives chosen by cosine,
    hardest negative beats a farther one, margin sign flags misranks."""
    from pyspark.sql import Row
    from stock_data_etl_pipeline_spark.operators.similarity import (
        triplet_mining,
    )
    rows = [
        # anchor (id 0, label A) points along +x
        Row(vec_id=0, label="A", embedding=[1.0, 0.0]),
        # same-label candidates: id 2 nearly parallel (pos), id 4 off-axis
        Row(vec_id=2, label="A", embedding=[0.9, 0.1]),
        Row(vec_id=4, label="A", embedding=[0.5, 0.5]),
        # different label: id 1 VERY close to anchor (hardest negative),
        # id 3 orthogonal (easy negative)
        Row(vec_id=1, label="B", embedding=[0.99, 0.01]),
        Row(vec_id=3, label="B", embedding=[0.0, 1.0]),
    ]
    out = triplet_mining(spark.createDataFrame(rows),
                         anchor_stride=10).collect()
    # only id 0 is an anchor (stride 10)
    assert [r["anchor_id"] for r in out] == [0]
    t = out[0]
    assert t["pos_id"] == 2 and t["neg_id"] == 1
    # the hardest negative is closer than the positive -> negative margin
    assert t["neg_score"] > t["pos_score"] and t["margin"] < 0


def test_triplet_mining_lsh_blocked_negatives(spark):
    """Blocked mode: negatives restricted to the anchor's sign-LSH
    bucket; when the hardest negative shares the bucket, blocked ==
    exhaustive; a cross-bucket easy negative is excluded."""
    from pyspark.sql import Row
    from stock_data_etl_pipeline_spark.operators.similarity import (
        triplet_mining,
    )
    rows = [
        Row(vec_id=0, label="A", embedding=[1.0, 0.0]),
        Row(vec_id=2, label="A", embedding=[0.9, 0.1]),
        # hardest negative: same half-space as the anchor
        Row(vec_id=1, label="B", embedding=[0.99, 0.01]),
        # easy negative: opposite half-space -> different bucket
        Row(vec_id=3, label="B", embedding=[-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows)
    # one hyperplane along +x: bucket = [x >= 0]
    blocked = triplet_mining(emb, anchor_stride=10,
                             neg_anchors=[[1.0, 0.0]]).collect()
    full = triplet_mining(emb, anchor_stride=10).collect()
    assert len(blocked) == len(full) == 1
    # the hardest negative lives in the anchor's bucket, so the blocked
    # result is identical to the exhaustive one
    assert blocked[0] == full[0]
    assert blocked[0]["neg_id"] == 1


def test_knn_label_accuracy_separable_clusters(spark):
    # two tight clusters on orthogonal axes; one point of label 1 sits
    # in cluster 0's direction and gets outvoted by its neighbors
    rows = [
        (0, [1.0, 0.05], 0), (1, [1.0, -0.05], 0), (2, [1.0, 0.1], 0),
        (3, [0.05, 1.0], 1), (4, [-0.05, 1.0], 1), (5, [0.1, 1.0], 1),
        (6, [1.0, 0.0], 1),  # mislabeled straggler
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    # one anchor with all-positive dots -> every vector in bucket 1
    from stock_data_etl_pipeline_spark.operators.similarity import (
        knn_label_accuracy)
    out = {r["label"]: r for r in
           knn_label_accuracy(e, anchors=[[1.0, 1.0]], k=3).collect()}
    # label 0: all three vote with their own cluster (the straggler is
    # among their neighbors but carries label 1 -> 2-of-3 majority holds)
    assert out[0]["n"] == 3 and out[0]["accuracy"] == 1.0
    # label 1: the straggler is classified 0 -> 3 of 4 correct
    assert out[1]["n"] == 4 and out[1]["n_correct"] == 3
    assert out[1]["accuracy"] == 0.75


def test_ndcg_at_k_perfect_and_worst_ordering(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import ndcg_at_k
    # query [1,0]; same-label vectors are the closest two -> relevant
    # hits occupy ranks 1-2 of top-3: ndcg == 1 requires ideal order
    rows = [
        (0, [1.0, 0.0], 7),          # query
        (1, [0.99, 0.1], 7), (2, [0.98, 0.15], 7),   # relevant, closest
        (3, [0.5, 0.8], 1), (4, [0.1, 0.99], 1),     # irrelevant, far
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    r = ndcg_at_k(e, [1.0, 0.0], 0, 7, k=3).collect()[0]
    assert r["n_relevant"] == 2
    assert r["ndcg"] == 1.0  # relevant hits sit at the top -> ideal
    # flip the geometry: relevant vectors now the farthest -> ndcg < 1
    rows2 = [
        (0, [1.0, 0.0], 7),
        (1, [0.1, 0.99], 7), (2, [0.0, 1.0], 7),     # relevant, far
        (3, [0.99, 0.1], 1), (4, [0.98, 0.15], 1),   # irrelevant, close
    ]
    e2 = spark.createDataFrame(rows2, "vec_id long, embedding array<float>, label int")
    r2 = ndcg_at_k(e2, [1.0, 0.0], 0, 7, k=3).collect()[0]
    assert r2["n_relevant"] == 1  # only one relevant inside top-3
    assert 0 < r2["ndcg"] < 1.0


def test_pca_power_finds_dominant_axis(spark):
    from pyspark.sql import Row
    from stock_data_etl_pipeline_spark.operators.similarity import (
        pca_power_direction)
    # 20 vectors along axis 0 with small axis-1 noise: the dominant
    # direction must be axis 0 (|v| renormalized to max 1e6)
    rows = [Row(vec_id=i,
                embedding=[(0.5 if i % 2 == 0 else -0.5),
                           0.01 * (i % 3), 0.0, 0.0])
            for i in range(20)]
    out = {r["j"]: r["v_e6"] for r in
           pca_power_direction(spark.createDataFrame(rows),
                               iters=3).collect()}
    assert len(out) == 4
    assert abs(out[0]) == 1000000          # infinity-norm peak on axis 0
    assert abs(out[1]) < 200000            # noise axis stays minor
    assert out[2] == 0 and out[3] == 0


def test_embedding_outliers_planted_far_point(spark):
    from pyspark.sql import Row
    from stock_data_etl_pipeline_spark.operators.similarity import (
        embedding_outliers)
    rows = [Row(vec_id=i, label=0, embedding=[0.1, 0.1]) for i in
            range(9)]
    rows.append(Row(vec_id=99, label=0, embedding=[5.0, -5.0]))
    out = embedding_outliers(spark.createDataFrame(rows), k=3).collect()
    assert out[0]["vec_id"] == 99
    assert out[0]["dist"] > out[1]["dist"]
