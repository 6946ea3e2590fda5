"""Incremental OHLC bar maintenance (operators/incremental.py):
multi-batch folds equal the single-pass batch resample; replayed
batches are skipped via the epoch committed atomically with the fold."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row

from stock_data_etl_pipeline_spark.operators import indicators as ind
from stock_data_etl_pipeline_spark.operators.incremental import (
    read_ohlc_bars,
    streaming_maintain_ohlc,
)
from stock_data_etl_pipeline_spark.sources.managed_table import ManagedTable

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double")


def _ticks(spark):
    rows = [
        Row(event_id=i, ts=dt.datetime(2024, 1, 1, h, m), user_id=1,
            event_type=t, value=float(v))
        for i, (h, m, t, v) in enumerate([
            (0, 5, "A", 10.0), (0, 6, "A", 14.0), (0, 7, "B", 5.0),
            (0, 55, "A", 11.0), (1, 1, "A", 9.0), (1, 2, "B", 6.0),
            (1, 30, "B", 4.0), (2, 0, "A", 20.0), (2, 59, "B", 7.0),
        ])
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def maintained(spark, tmp_path):
    """Drive the maintainer over a 3-file source, one file per batch."""
    src = str(tmp_path / "src")
    ticks = _ticks(spark)
    # three slices -> three micro-batches (maxFilesPerTrigger=1)
    for i in range(3):
        (ticks.filter((ticks.event_id % 3) == i).coalesce(1)
         .write.mode("append" if i else "overwrite")
         .parquet(os.path.join(src, f"slice={i}")))
    table = ManagedTable(spark, str(tmp_path / "bars"),
                         partition_by=["event_type"])
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/slice=*"))
    q = streaming_maintain_ohlc(stream, table,
                                str(tmp_path / "cp"))
    q.awaitTermination()
    return table, ticks, src


def test_multi_batch_fold_equals_batch_resample(maintained):
    table, ticks, _ = maintained
    got = {(r["event_type"], r["hr"]): r
           for r in read_ohlc_bars(table).collect()}
    want = {(r["event_type"], r["hr"]): r
            for r in ind.hourly_bars(
                ticks.withColumn("value", ticks.value)).collect()}
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        for c in ("open", "high", "low", "close", "volume", "total_value"):
            assert g[c] == w[c], (k, c, g[c], w[c])
    # epoch of the last fold is recorded in the commit manifest
    assert table.commit_meta()["epoch"] == 2


def test_replayed_epoch_is_skipped(maintained, spark, tmp_path):
    table, _, src = maintained
    before = sorted(map(tuple, read_ohlc_bars(table).collect()))
    v_before = table.latest_version()
    # a FRESH checkpoint re-delivers old epochs (at-least-once replay);
    # the epoch guard must skip them — folding is not idempotent
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/slice=*"))
    q = streaming_maintain_ohlc(stream, table,
                                str(tmp_path / "cp_replay"))
    q.awaitTermination()
    assert table.latest_version() == v_before  # no new commits
    assert sorted(map(tuple, read_ohlc_bars(table).collect())) == before


def test_indicators_compose_over_maintained_bars(maintained):
    """Downstream indicators read the MAINTAINED bars table unchanged:
    bollinger over read_ohlc_bars(table) == bollinger over the batch
    resample (the bars relation is identical, so any indicator in
    operators/indicators.py composes with incremental maintenance)."""
    table, ticks, _ = maintained
    from_table = sorted(
        map(tuple, ind.bollinger(read_ohlc_bars(table)).collect()))
    from_batch = sorted(
        map(tuple, ind.bollinger(ind.hourly_bars(ticks)).collect()))
    assert from_table == from_batch


def test_late_tick_updates_only_its_bar(maintained, spark, tmp_path):
    """A late tick for an old hour folds into exactly that bar (new
    min over the combine keys can even move open/low); other bars'
    rows are untouched — the backfill story of the maintainer."""
    table, _, src = maintained
    before = {(r["event_type"], r["hr"]): r
              for r in read_ohlc_bars(table).collect()}
    late = spark.createDataFrame(
        [Row(event_id=999, ts=dt.datetime(2024, 1, 1, 0, 1), user_id=1,
             event_type="A", value=1.0)], SCHEMA)
    (late.coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(src, "slice=late")))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/slice=*"))
    # same checkpoint dir as the original run: only the NEW file forms
    # a batch; its epoch advances past the recorded one so it folds
    q = streaming_maintain_ohlc(stream, table,
                                str(tmp_path / "cp"))
    q.awaitTermination()
    after = {(r["event_type"], r["hr"]): r
             for r in read_ohlc_bars(table).collect()}
    key = ("A", dt.datetime(2024, 1, 1, 0))
    # the late tick is now the earliest and smallest in its hour
    assert after[key]["open"] == 1.0 and after[key]["low"] == 1.0
    assert after[key]["volume"] == before[key]["volume"] + 1
    for k in before:
        if k != key:
            assert after[k] == before[k]
