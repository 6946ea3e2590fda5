"""Multimodal (image/audio/video) column plumbing.

Media travels as an opaque ``binary`` column plus a typed metadata struct —
the lakehouse-native layout (bytes inline for small assets; at 100 TB the
binary column holds an object-store URI + byte-range instead, same schema).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas iterators over ``mapInPandas``: one Python worker per partition,
whole Arrow record batches in and out, media bytes never round-trip the
driver.

The actual codec calls need PIL/ffmpeg-class libraries that are not in
this environment, so the decode kernels are STUBBED: ``decode_image``
raises NotImplementedError by default, and every operator accepts a
``kernel=`` override; ``deterministic_fake_features`` is the test/oracle
kernel (pure byte arithmetic). The Spark-side contract — schema, batch
shape, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType(), True),   # image|audio|video
    T.StructField("format", T.StringType(), True),       # png|wav|mp4|...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", MEDIA_META, True),
])


def attach_media_column(df: DataFrame, bytes_col: str,
                        media_type: str, fmt: str) -> DataFrame:
    """Wrap a raw binary column into the standard (content, meta) layout."""
    return df.withColumn("meta", F.struct(
        F.lit(media_type).alias("media_type"), F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )).withColumnRenamed(bytes_col, "content")


def decode_image(content: bytes) -> "object":
    """Real decode kernel — requires an imaging library not present here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; inject a kernel= override")


def deterministic_fake_features(content: bytes) -> list[int]:
    """Oracle-checkable stand-in for a feature extractor: pure byte
    arithmetic [n_bytes, first_byte, last_byte]."""
    if content is None or len(content) == 0:
        return [0, -1, -1]
    return [len(content), content[0], content[-1]]


FEATURES_FIELD = T.StructField("features", T.ArrayType(T.LongType()), True)


def extract_features(media: DataFrame,
                     kernel: Callable[[bytes], list[int]] = deterministic_fake_features,
                     id_col: str = "media_id",
                     content_col: str = "content") -> DataFrame:
    """Per-asset feature extraction via mapInPandas (Arrow batches).

    Output schema: (id_col long, features array<long>). The kernel runs
    per row inside a batch; batches stream per partition, so peak memory
    is one Arrow batch of media bytes, not the partition.
    """
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType(), False), FEATURES_FIELD])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "features": [kernel(c) for c in pdf[content_col]],
            })

    return media.select(id_col, content_col).mapInPandas(op, out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000,
                      id_col: str = "media_id") -> DataFrame:
    """Video frame-sampling plumbing: expand each asset into the frame
    timestamps to decode ([0, duration) step every_ms) — the decode itself
    is a kernel like extract_features'. Pure Column ops (sequence+explode),
    so the expansion happens executor-side. Assets with NULL or
    non-positive duration have no frames in [0, duration) and emit no
    rows (explode of an empty array drops the row)."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0)).cast("long")
    ts = F.when(dur > 0,
                F.sequence(F.lit(0).cast("long"), dur - 1,
                           F.lit(every_ms).cast("long"))
                ).otherwise(F.array().cast("array<bigint>"))
    return (media.withColumn("frame_ts_ms", F.explode(ts))
            .select(id_col, "frame_ts_ms"))


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 30_000,
                     overlap_ms: int = 5_000,
                     id_col: str = "media_id") -> DataFrame:
    """Audio chunking plumbing: expand each asset into overlapping
    [chunk_start, chunk_end) windows over its duration — the unit an
    ASR/embedding kernel consumes (stride = chunk_ms - overlap_ms; the
    final partial chunk is kept and clamped to the duration, standard
    Whisper-style segmentation). Pure Column ops (sequence+explode),
    executor-side like frame_sample_plan; the decode/transcribe kernel
    plugs in per chunk exactly as extract_features' does per asset.
    NULL/non-positive durations emit no chunks."""
    if overlap_ms >= chunk_ms:
        raise ValueError("overlap must be smaller than the chunk")
    stride = chunk_ms - overlap_ms
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0)).cast("long")
    starts = F.when(dur > 0,
                    F.sequence(F.lit(0).cast("long"), dur - 1,
                               F.lit(stride).cast("long"))
                    ).otherwise(F.array().cast("array<long>"))
    out = media.select(F.col(id_col),
                       F.explode(starts).alias("chunk_start"), dur.alias("_d"))
    # drop tail starts that fall inside the previous chunk's overlap
    # with nothing new to cover (start >= duration never emits; a start
    # whose window would be pure overlap only arises when stride covers
    # the rest: start > duration - overlap AND start > 0)
    return (out.filter(F.col("chunk_start") < F.col("_d"))
            .select(id_col, "chunk_start",
                    F.least(F.col("chunk_start") + chunk_ms,
                            F.col("_d")).alias("chunk_end"))
            .withColumn("chunk_idx",
                        ((F.col("chunk_start") / stride).cast("long"))))


def interleaved_pack(docs, chunk_size: int = 32,
                     img_every_chars: int = 100,
                     patch_tokens: int = 16,
                     text_col: str = "text",
                     id_col: str = "doc_id"):
    """Interleaved image-text training-sample assembly (the MMC4/
    OBELICS document shape): each document's text is chunked, media
    placeholders are slotted between chunks (image k after chunk k),
    and the result is a per-document POSITION-ORDERED sequence of
    (modality, ref, tokens, token_offset) rows — exactly the layout a
    multimodal dataloader consumes, with the media cell standing in as
    ``patch_tokens`` sequence positions.

    Real image bytes stay out of this plan on purpose: the sequence
    table carries REFS, and the (stubbed-codec) media pipeline joins
    in by ref at materialization — at 100 TB you never shuffle pixels
    to plan a curriculum. Pure explode + union + one per-doc window;
    all integers, no Python."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.text import words
    from .corpus import chunk_documents
    chunks = chunk_documents(docs, size=chunk_size, overlap=0,
                             text_col=text_col, id_col=id_col)
    t = chunks.select(F.col(id_col),
                      F.col("chunk_id").alias("ref"),
                      F.col("chunk_id").alias("_k1"),
                      F.lit(0).alias("_k2"),
                      F.lit("text").alias("modality"),
                      F.col("n_tokens").alias("tokens"))
    imgs = (docs.filter(F.col("n_chars") >= img_every_chars)
            .select(F.col(id_col),
                    F.posexplode(F.sequence(
                        F.lit(0),
                        F.expr(f"n_chars div {img_every_chars}")
                        .cast("int") - 1))
                    .alias("_p", "_v")))
    i = imgs.select(F.col(id_col),
                    F.col("_p").cast("long").alias("ref"),
                    F.col("_p").cast("long").alias("_k1"),
                    F.lit(1).alias("_k2"),
                    F.lit("image").alias("modality"),
                    F.lit(patch_tokens).cast("long").alias("tokens"))
    u = t.unionByName(i)
    w = Window.partitionBy(id_col).orderBy("_k1", "_k2")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return (u.select(
        F.col(id_col),
        (F.row_number().over(w) - 1).cast("long").alias("position"),
        "modality", "ref", "tokens",
        (F.sum("tokens").over(run) - F.col("tokens")).cast("long")
        .alias("token_offset"))
        .orderBy(id_col, "position"))


def shard_modality_balance(docs, n_shards: int = 8,
                           chunk_size: int = 32,
                           img_every_chars: int = 100,
                           patch_tokens: int = 16,
                           text_col: str = "text",
                           id_col: str = "doc_id"):
    """Modality-balanced shard audit for interleaved multimodal packs:
    assign every document to the deterministic md5 shard (the
    corpus.shard_plan key, so text and media of one document always
    land together) and report per-(shard, modality) item/token counts
    plus each cell's token share of its modality — the pre-flight
    check before writing N multimodal training shards (a shard
    starved of images degrades every batch it feeds).

    Composes :func:`interleaved_pack`'s item relation (refs only —
    pixels never shuffle) with the shard key; counts are exact
    BIGINTs and the skew ratio is ONE double expression per emitted
    cell (exactly 1.0 = this shard holds its fair 1/n share of the
    modality's tokens).

    Shape at 100 TB: the pack relation is token-chunk-cardinality; one
    (shard, modality) hash-agg plus a modality-total broadcast.
    """
    from pyspark.sql import functions as F

    items = interleaved_pack(docs, chunk_size, img_every_chars,
                             patch_tokens, text_col, id_col)
    shard = F.expr(
        f"cast(conv(substr(md5(cast({id_col} AS STRING)), 1, 15), 16, 10) "
        f"AS BIGINT) % {n_shards}")
    g = (items.select(shard.alias("shard"), "modality", "tokens")
         .groupBy("shard", "modality")
         .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
              F.sum("tokens").cast("long").alias("n_tokens")))
    tot = (g.groupBy("modality")
           .agg(F.sum("n_tokens").cast("long").alias("mt")))
    return (g.join(F.broadcast(tot), "modality")
            .select("shard", "modality", "n_items", "n_tokens",
                    (F.col("n_tokens").cast("double") * n_shards
                     / F.col("mt").cast("double")).alias("token_skew"))
            .orderBy("shard", "modality"))
