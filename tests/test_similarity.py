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
