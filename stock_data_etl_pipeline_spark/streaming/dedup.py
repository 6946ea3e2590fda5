"""Streaming deduplication — a custom stateful operator.

Exactly-once, cross-batch dedup of a document stream by an arbitrary key
(e.g. the text fingerprint): the first occurrence of a key passes, every
later one — in the same micro-batch, a later batch, or a later RUN of the
stream (state lives in the checkpointed state store) — is dropped.

Built on ``applyInPandasWithState`` (the custom-stateful-operator API):
one state entry per key holding the first-seen flag. This is the
streaming twin of ``operators/dedup.exact_dedup`` and the building block
for continuous training-data ingestion (dedup-before-land).

State size = O(distinct keys); at 100 TB you bound it by keying on a
fingerprint (64-128 bits) and sharding the stream, or add a TTL timeout
for sliding-window dedup semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("key", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
])

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType(), True)])


def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        # key seen in an earlier batch or an earlier RUN: drop everything
        for _ in pdfs:
            pass
        return
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) == 0:
        return
    # deterministic survivor: the min-doc_id row of this batch (matches
    # exact_dedup's keep-lowest-id rule, so the single-batch drain is
    # oracle-checkable); earlier batches still beat later ones via state
    yield batch.loc[[batch["doc_id"].idxmin()]]
    state.update((True,))


def _alloc_run_dir(base: str) -> str:
    """Atomically allocate the next ``run_NNNNN`` directory under
    ``base``. ``makedirs(exist_ok=False)`` is the atomicity primitive:
    two concurrent (or crash-interleaved) runs sharing ``base`` race to
    the same number, the loser EEXISTs and retries with the next — so
    survivor sets from different runs can never interleave in one
    directory ("rows that passed THIS run" stays exact)."""
    import os

    os.makedirs(base, exist_ok=True)
    while True:
        nxt = len([d for d in os.listdir(base) if d.startswith("run_")])
        run_dir = os.path.join(base, f"run_{nxt:05d}")
        try:
            os.makedirs(run_dir, exist_ok=False)
            return run_dir
        except FileExistsError:
            continue


def _drain_to_parquet(stream_df: DataFrame, spark: SparkSession,
                      checkpoint_dir: str, schema: T.StructType,
                      out_dir: str | None) -> DataFrame:
    """Drain a streaming DataFrame (availableNow) through a foreachBatch
    parquet append into a fresh per-run directory and return a lazy scan
    of it. The write happens executor-side — survivors never transit the
    driver — and, unlike a memory sink, the checkpoint is recoverable: a
    later run against the same checkpoint resumes state instead of
    throwing, which is the whole cross-run dedup story."""
    import os

    base = out_dir or f"{checkpoint_dir.rstrip('/')}_survivors"
    run_dir = _alloc_run_dir(base)

    def sink(batch_df, _epoch: int) -> None:  # noqa: ANN001
        batch_df.write.mode("append").parquet(run_dir)

    q = (stream_df.writeStream.foreachBatch(sink)
         .outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    if not any(f.endswith(".parquet")
               for f in os.listdir(run_dir)):  # empty-source run
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(run_dir)


def streaming_dedup(spark: SparkSession, source_dir: str,
                    checkpoint_dir: str,
                    key_col: str = "key",
                    out_dir: str | None = None) -> DataFrame:
    """Drain ``source_dir`` (parquet docs with DOC_SCHEMA) through the
    stateful dedup and return the rows that passed this run. Re-running
    with the same checkpoint drops keys seen in earlier runs.

    Survivors land EXECUTOR-SIDE: the foreachBatch sink appends each
    micro-batch to a per-run parquet directory under ``out_dir``
    (default ``<checkpoint_dir>_survivors``) — a distributed write, so
    at 100 TB the survivor set never transits the driver (a real
    deployment points this at the curated table / MERGE target). The
    returned DataFrame is a lazy scan of that directory; a per-run
    subdirectory keeps "rows that passed THIS run" distinct from earlier
    runs that share the checkpoint.

    foreachBatch instead of a plain parquet sink: the stateful operator
    needs the checkpoint for cross-run state, and foreachBatch lets a
    real deployment swap the append for a MERGE without touching the
    dedup logic. The write inside is executor-parallel."""
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(source_dir)
    deduped = (stream.groupBy(key_col)
               .applyInPandasWithState(_dedup_fn, DOC_SCHEMA, _STATE_SCHEMA,
                                       "append", GroupStateTimeout.NoTimeout))
    return _drain_to_parquet(deduped, spark, checkpoint_dir, DOC_SCHEMA,
                             out_dir)


TTL_DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("key", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
])

_TTL_STATE_SCHEMA = T.StructType([T.StructField("seen_ms", T.LongType(), True)])


def _make_ttl_fn(ttl_ms: int, session_tz: str):
    def _fn(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # no data for the key and the watermark passed admission +
            # TTL: forget it — the next occurrence is new. THIS bounds
            # state at 100 TB (NoTimeout state only ever grows).
            state.remove()
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        # the timeout callback only fires for keys WITHOUT data in a
        # batch; a key arriving WITH data must check expiry itself
        # against the watermark Spark computed at batch start
        wm = state.getCurrentWatermarkMs()
        expired = state.exists and wm > state.get[0] + ttl_ms
        if not state.exists or expired:
            yield batch.loc[[batch["doc_id"].idxmin()]]
            # applyInPandasWithState hands the UDF TZ-NAIVE timestamps
            # rendered in spark.sql.session.timeZone, while the
            # watermark is a UTC epoch — localize before .timestamp()
            # or admission is offset by the tz offset on any non-UTC
            # session (tests run UTC and would never catch it)
            ts_max = (batch["ts"]
                      .dt.tz_localize(session_tz, ambiguous=True,
                                      nonexistent="shift_forward")
                      .max())
            admitted_ms = int(ts_max.timestamp() * 1000)
            # TTL counts from ADMISSION; suppressed repeats do not
            # refresh it (otherwise a steady duplicate stream would pin
            # the key alive forever). Clamp to just past the watermark:
            # a NEW key whose only data is already late (admission+ttl
            # <= watermark) would otherwise set a timeout in the past,
            # and Spark fails the whole query, not just the key.
            state.update((admitted_ms,))
            state.setTimeoutTimestamp(max(admitted_ms + ttl_ms, wm + 1))
    return _fn


def streaming_dedup_ttl(spark: SparkSession, source_dir: str,
                        checkpoint_dir: str, ttl: str = "1 hour",
                        key_col: str = "key",
                        max_files_per_trigger: int | None = None,
                        out_dir: str | None = None) -> DataFrame:
    """Time-bounded stateful dedup: the first occurrence of a key
    passes; repeats are dropped while the key's state is alive. State
    expires via ``GroupStateTimeout.EventTimeTimeout`` once the
    WATERMARK passes admission-time + ttl (suppressed repeats do NOT
    refresh it) — after that the key re-admits (a re-crawl of a page a
    month later is a fresh observation, and state stays bounded by the
    active-key set instead of growing forever).

    Differs from ``dropDuplicatesWithinWatermark`` in keeping an
    explicit per-key state row (extensible to counts/payloads) and from
    ``streaming_dedup`` in bounding state. Event-time timeouts only fire
    when a later micro-batch advances the watermark; the drained
    single-batch result equals batch keep-lowest-id dedup."""
    import re as _re
    m = _re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", ttl.strip())
    if not m:
        raise ValueError(f"unparseable ttl {ttl!r}")
    ttl_ms = int(m.group(1)) * {"second": 1, "minute": 60, "hour": 3600,
                                "day": 86400}[m.group(2)] * 1000
    session_tz = spark.conf.get("spark.sql.session.timeZone")
    reader = spark.readStream.schema(TTL_DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (reader.parquet(source_dir)
              .withWatermark("ts", "0 seconds")
              .groupBy(key_col)
              .applyInPandasWithState(_make_ttl_fn(ttl_ms, session_tz),
                                      TTL_DOC_SCHEMA,
                                      _TTL_STATE_SCHEMA, "append",
                                      GroupStateTimeout.EventTimeTimeout))
    # executor-side parquet sink (same pattern as streaming_dedup): a
    # memory sink with a checkpoint throws on the SECOND run against the
    # same checkpoint — which would make the cross-run bounded-state
    # story (re-crawl a month later re-admits) untestable end-to-end
    return _drain_to_parquet(stream, spark, checkpoint_dir, TTL_DOC_SCHEMA,
                             out_dir)


def streaming_dedup_watermarked(spark: SparkSession, docs_parquet: str,
                                horizon: str = "1 hour") -> DataFrame:
    """Time-bounded streaming dedup with the NATIVE operator
    (``dropDuplicatesWithinWatermark``): duplicates of a key arriving
    within ``horizon`` of each other are dropped; state for a key is
    evicted once the watermark passes it — bounded state without a custom
    stateful function, the right default when dedup only needs a time
    horizon rather than forever-semantics (that case is
    ``streaming_dedup`` above, whose state lives until explicitly
    removed).

    Returns the surviving keys of one availableNow drain. Key-only
    output on purpose: within a micro-batch WHICH duplicate row survives
    is arrival-order-dependent, but the surviving key set is exact — a
    single-batch drain equals batch DISTINCT, which is the oracle."""
    from pyspark.sql import functions as F
    from .events import _as_stream_dir
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ])
    stream = (spark.readStream.schema(schema)
              .parquet(_as_stream_dir(docs_parquet))
              .select(F.md5("text").alias("key"),
                      # synthetic event time: docs carry none; offset off
                      # epoch 0 — the state store's initial watermark is
                      # 0, and a row AT the watermark is judged late
                      F.timestamp_seconds(F.col("doc_id") + F.lit(86400))
                      .alias("ts"))
              .withWatermark("ts", horizon)
              .dropDuplicatesWithinWatermark(["key"])
              .select("key"))
    import uuid as _uuid
    name = f"wmdedup_{_uuid.uuid4().hex[:8]}"
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName(name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).orderBy("key")
