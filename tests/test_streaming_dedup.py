"""Stateful streaming dedup: within-batch, cross-batch, cross-run."""

from __future__ import annotations

from stock_data_etl_pipeline_spark.streaming.dedup import streaming_dedup


def _land(spark, path, rows):
    (spark.createDataFrame(rows, "doc_id long, key string, text string")
     .coalesce(1).write.mode("append").parquet(path))


def test_streaming_dedup_state(spark, tmp_path):
    src = str(tmp_path / "docs")
    cp = str(tmp_path / "cp")

    # run 1: duplicate keys inside one drain -> one survivor per key
    _land(spark, src, [(1, "ka", "a1"), (2, "kb", "b1"), (3, "ka", "a2")])
    out1 = streaming_dedup(spark, src, cp).collect()
    assert sorted({r["key"] for r in out1}) == ["ka", "kb"]
    assert len(out1) == 2

    # run 2: new files repeat an old key and add a new one; state in the
    # checkpoint drops the repeat across RUNS
    _land(spark, src, [(4, "ka", "a3"), (5, "kc", "c1")])
    out2 = streaming_dedup(spark, src, cp).collect()
    assert [(r["doc_id"], r["key"]) for r in out2] == [(5, "kc")]


def test_streaming_dedup_sink_is_executor_side(spark, tmp_path):
    """The survivor set must come back as a parquet scan of the sink
    directory (distributed write), never a driver-materialized local
    relation — at 100 TB the survivors are corpus-sized."""
    src, cp = str(tmp_path / "docs"), str(tmp_path / "cp")
    _land(spark, src, [(1, "ka", "a1"), (2, "kb", "b1")])
    out = streaming_dedup(spark, src, cp)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan or "Scan parquet" in plan
    assert "LocalTableScan" not in plan
    # and the per-run directory exists next to the checkpoint
    import os
    base = f"{cp}_survivors"
    assert os.path.isdir(base) and any(
        d.startswith("run_") for d in os.listdir(base))


def test_watermarked_dedup_drops_in_batch_duplicates(spark, tmp_path):
    from stock_data_etl_pipeline_spark.streaming.dedup import (
        streaming_dedup_watermarked,
    )
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "same text", "en", "s", 9), (1, "same text", "en", "s", 9),
         (2, "other", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(src)
    out = streaming_dedup_watermarked(spark, src).collect()
    assert len(out) == 2  # duplicate key collapsed, distinct keys kept


def test_streaming_dedup_ttl_readmits_after_expiry(spark, tmp_path):
    """EventTimeTimeout state TTL: a key repeats inside the TTL -> dropped;
    the same key seen after the watermark passes last-seen + TTL -> state
    was evicted, so it re-admits as new. State is bounded by the active
    key set (the 100 TB requirement the NoTimeout variant lacks)."""
    import datetime as dt

    from stock_data_etl_pipeline_spark.streaming.dedup import (
        streaming_dedup_ttl,
    )
    src, cp = str(tmp_path / "docs"), str(tmp_path / "cp")

    def t(minute):
        return dt.datetime(2024, 1, 1, 0, minute)

    schema = "doc_id long, key string, ts timestamp"
    # one file per micro-batch (maxFilesPerTrigger=1); event time advances
    # file to file, carrying the watermark with it
    (spark.createDataFrame([(1, "ka", t(0)), (2, "ka", t(1))], schema)
     .coalesce(1).write.mode("append").parquet(src))      # ka admitted once
    (spark.createDataFrame([(3, "ka", t(30)), (4, "kb", t(30))], schema)
     .coalesce(1).write.mode("append").parquet(src))      # ka still live -> drop
    (spark.createDataFrame([(5, "ka", t(50))], schema)
     .coalesce(1).write.mode("append").parquet(src))      # wm 30 > 1+10min: expired -> re-admit
    out = streaming_dedup_ttl(spark, src, cp, ttl="10 minutes",
                              max_files_per_trigger=1).collect()
    got = sorted((r["doc_id"], r["key"]) for r in out)
    assert (1, "ka") in got and (4, "kb") in got
    assert (2, "ka") not in got and (3, "ka") not in got
    assert (5, "ka") in got, "expired key must re-admit"


def test_streaming_dedup_ttl_checkpoint_recoverable_across_runs(spark,
                                                                tmp_path):
    """The TTL variant must survive a SECOND run against the same
    checkpoint (the memory sink it previously used throws on checkpoint
    recovery) — without this, the docstring's own story (a re-crawl a
    month later re-admits) cannot be exercised. Survivors come back as a
    parquet scan, executor-side like streaming_dedup."""
    import datetime as dt

    from stock_data_etl_pipeline_spark.streaming.dedup import (
        streaming_dedup_ttl,
    )
    src, cp = str(tmp_path / "docs"), str(tmp_path / "cp")
    schema = "doc_id long, key string, ts timestamp"

    def t(minute):
        return dt.datetime(2024, 1, 1, 0, minute)

    (spark.createDataFrame([(1, "ka", t(0))], schema)
     .coalesce(1).write.mode("append").parquet(src))
    out1 = streaming_dedup_ttl(spark, src, cp, ttl="10 minutes")
    plan = out1._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan  # not driver-materialized
    assert [(r["doc_id"], r["key"]) for r in out1.collect()] == [(1, "ka")]

    # second run, same checkpoint: repeat within TTL is dropped; a
    # watermark-carrier batch (kb @ t30) advances the watermark past
    # ka's expiry, so the t50 occurrence re-admits
    (spark.createDataFrame([(2, "ka", t(1))], schema)
     .coalesce(1).write.mode("append").parquet(src))
    (spark.createDataFrame([(4, "kb", t(30))], schema)
     .coalesce(1).write.mode("append").parquet(src))
    (spark.createDataFrame([(3, "ka", t(50))], schema)
     .coalesce(1).write.mode("append").parquet(src))
    out2 = streaming_dedup_ttl(spark, src, cp, ttl="10 minutes",
                               max_files_per_trigger=1).collect()
    got = sorted((r["doc_id"], r["key"]) for r in out2)
    assert (2, "ka") not in got, "repeat within TTL must stay dropped"
    assert (4, "kb") in got
    assert (3, "ka") in got, "expired key must re-admit in run 2"


def test_streaming_dedup_ttl_non_utc_session_timezone(spark, tmp_path):
    """Admission time must be derived timezone-consistently: the UDF
    receives tz-naive timestamps rendered in spark.sql.session.timeZone
    while the watermark is a UTC epoch. Under a non-UTC session tz a
    naive .timestamp() offsets admission by the tz offset (hours), so
    TTL expiry fires wildly early/late. Same scenario as the UTC readmit
    test — the outcome must be identical under America/New_York."""
    import datetime as dt

    from stock_data_etl_pipeline_spark.streaming.dedup import (
        streaming_dedup_ttl,
    )
    src, cp = str(tmp_path / "docs"), str(tmp_path / "cp")
    schema = "doc_id long, key string, ts timestamp"
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        def t(minute):
            return dt.datetime(2024, 1, 1, 0, minute)

        (spark.createDataFrame([(1, "ka", t(0)), (2, "ka", t(1))], schema)
         .coalesce(1).write.mode("append").parquet(src))
        (spark.createDataFrame([(3, "ka", t(30)), (4, "kb", t(30))], schema)
         .coalesce(1).write.mode("append").parquet(src))
        (spark.createDataFrame([(5, "ka", t(50))], schema)
         .coalesce(1).write.mode("append").parquet(src))
        out = streaming_dedup_ttl(spark, src, cp, ttl="10 minutes",
                                  max_files_per_trigger=1).collect()
        got = sorted((r["doc_id"], r["key"]) for r in out)
        assert (1, "ka") in got and (4, "kb") in got
        assert (2, "ka") not in got and (3, "ka") not in got
        assert (5, "ka") in got, "expired key must re-admit under any tz"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_run_dir_allocation_is_race_free(tmp_path):
    """Concurrent runs sharing one survivor base must never land in the
    same run_NNNNN (mixing survivor sets breaks the 'rows that passed
    THIS run' contract). makedirs(exist_ok=False) is the atomic claim."""
    from concurrent.futures import ThreadPoolExecutor

    from stock_data_etl_pipeline_spark.streaming.dedup import _alloc_run_dir
    base = str(tmp_path / "survivors")
    with ThreadPoolExecutor(max_workers=8) as ex:
        dirs = list(ex.map(lambda _: _alloc_run_dir(base), range(32)))
    assert len(set(dirs)) == 32


def test_streaming_dedup_under_rocksdb_state_store(spark, tmp_path):
    """State semantics must be backend-independent: the same dedup drain
    under RocksDBStateStoreProvider (the bounded-memory backend for
    100 TB key cardinalities) yields the same survivors. providerClass
    is a runtime conf read at query start, so it can flip per-query."""
    from stock_data_etl_pipeline_spark.streaming.dedup import streaming_dedup
    src, cp = str(tmp_path / "docs"), str(tmp_path / "cp")
    _land(spark, src, [(1, "ka", "a1"), (2, "kb", "b1"), (3, "ka", "a2")])
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state."
                        "RocksDBStateStoreProvider")
    try:
        out = streaming_dedup(spark, src, cp).collect()
    finally:
        spark.conf.set(key, old)
    assert sorted((r["doc_id"], r["key"]) for r in out) == [(1, "ka"),
                                                            (2, "kb")]
