"""Multimodal binary-column plumbing."""

from __future__ import annotations

def test_audio_chunk_plan_windows(spark):
    from pyspark.sql import functions as F

    from stock_data_etl_pipeline_spark.operators.multimodal import (
        attach_media_column,
        audio_chunk_plan,
    )
    df = spark.createDataFrame(
        [(1, b"x", 70_000), (2, b"y", 30_000), (3, b"z", None),
         (4, b"w", 10_000)],
        "media_id long, bytes binary, dur long")
    media = attach_media_column(df, "bytes", "audio", "wav") \
        .withColumn("meta", F.col("meta").withField("duration_ms",
                                                    F.col("dur")))
    out = audio_chunk_plan(media, chunk_ms=30_000, overlap_ms=5_000)
    got = {(r["media_id"], r["chunk_idx"], r["chunk_start"], r["chunk_end"])
           for r in out.collect()}
    # asset 1 (70s): starts 0, 25s, 50s; last clamped to 70s
    assert {(1, 0, 0, 30_000), (1, 1, 25_000, 55_000),
            (1, 2, 50_000, 70_000)} <= got
    # asset 2 (30s): exactly one full chunk + the 25s tail start clamps
    assert (2, 0, 0, 30_000) in got
    # asset 3 (NULL duration): no chunks; asset 4 shorter than a chunk
    assert not any(m == 3 for m, *_ in got)
    assert (4, 0, 0, 10_000) in got
    # overlap >= chunk is rejected
    import pytest
    with pytest.raises(ValueError):
        audio_chunk_plan(media, chunk_ms=1000, overlap_ms=1000)


def test_interleaved_pack_alternates_and_offsets(spark):
    from stock_data_etl_pipeline_spark.operators.multimodal import (
        interleaved_pack)
    # 70 tokens (3 chunks of 32/32/6), 250 chars -> 2 images
    tokens = " ".join(f"t{i}" for i in range(70))
    d = spark.createDataFrame([(1, tokens, 250)],
                              "doc_id long, text string, n_chars long")
    out = interleaved_pack(d, chunk_size=32, img_every_chars=100).collect()
    seq = [(r["position"], r["modality"], r["ref"], r["tokens"],
            r["token_offset"]) for r in sorted(out,
                                               key=lambda r: r["position"])]
    # interleave: chunk0, img0, chunk1, img1, chunk2
    assert [(m, ref) for _, m, ref, _, _ in seq] == [
        ("text", 0), ("image", 0), ("text", 1), ("image", 1), ("text", 2)]
    # token budget: 32 + 16 + 32 + 16 + 6; offsets are running sums
    assert [t for _, _, _, t, _ in seq] == [32, 16, 32, 16, 6]
    assert [o for _, _, _, _, o in seq] == [0, 32, 48, 80, 96]
