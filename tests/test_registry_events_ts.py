"""Regression tests for the events ts loader.

Round-2 postmortem: testdata regenerations flipped events.ts between
TIMESTAMP(NANOS) and timestamp[us]; a constant-unit loader silently
compressed the 30-day timeline 1000x and corrupted every event-time
query. The loader now reads the parquet footer's logical type and
branches; these tests pin load_table to a pyarrow ground-truth read for
BOTH units so either generation loads correctly.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from stock_data_etl_pipeline_spark.sources.registry import (
    convert_events_ts, events_schema, events_ts_unit, load_table)

SF_DIR = "/root/testdata/sf0.001"


def _pyarrow_minmax_us(path: str) -> tuple[int, int, int]:
    """(n_rows, min_us, max_us) straight from the file, unit-normalized."""
    t = pq.read_table(path, columns=["ts"])
    col = t.column("ts")
    typ = col.type
    if pa.types.is_timestamp(typ):
        ints = col.cast(pa.int64())
        scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}[typ.unit]
        lo, hi = pc.min(ints).as_py(), pc.max(ints).as_py()
        if scale is None:  # ns -> us truncation, matching the loader
            lo, hi = lo // 1000, hi // 1000
        else:
            lo, hi = lo * scale, hi * scale
    else:  # plain int64: historical generations meant nanos
        lo = pc.min(col).as_py() // 1000
        hi = pc.max(col).as_py() // 1000
    return t.num_rows, lo, hi


@pytest.mark.skipif(not os.path.exists(os.path.join(SF_DIR, "events.parquet")),
                    reason="testdata not present")
def test_load_table_events_matches_pyarrow(spark):
    from pyspark.sql import functions as F
    path = os.path.join(SF_DIR, "events.parquet")
    n_expect, lo_expect, hi_expect = _pyarrow_minmax_us(path)

    df = load_table(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi")).collect()[0]
    assert row["n"] == n_expect
    assert row["lo"] == lo_expect
    assert row["hi"] == hi_expect
    # the timeline must span days, not minutes (the exact failure mode a
    # wrong unit produces: 30 days -> 43 minutes)
    assert (hi_expect - lo_expect) > 24 * 3600 * 1_000_000


@pytest.mark.skipif(not os.path.exists(os.path.join(SF_DIR, "events.parquet")),
                    reason="testdata not present")
def test_footer_unit_detection(spark):
    path = os.path.join(SF_DIR, "events.parquet")
    unit = events_ts_unit(path)
    arrow_t = pq.ParquetFile(path).schema_arrow.field("ts").type
    expected = "us" if getattr(arrow_t, "unit", None) == "us" else "ns"
    assert unit == expected


def test_nanos_generation_round_trip(spark, tmp_path):
    """Synthesize a TIMESTAMP(NANOS) events file (the round-1 layout) and
    prove the ns branch still loads it to the correct microsecond
    timestamps."""
    from pyspark.sql import functions as F
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    rows = [(i, (base_us + i * 3_600_000_000) * 1000, i % 5, "view",
             float(i), "{}") for i in range(48)]
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("ns")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    sf_dir = tmp_path / "sfns"
    sf_dir.mkdir()
    pq.write_table(table, str(sf_dir / "events.parquet"),
                   store_schema=False)  # force physical int64+NANOS path

    path = str(sf_dir / "events.parquet")
    assert events_ts_unit(path) == "ns"
    ns_ts_field = [f for f in events_schema("ns").fields if f.name == "ts"][0]
    assert ns_ts_field.dataType.typeName() == "long"

    df = load_table(spark, str(sf_dir), "events")
    got = (df.agg(F.unix_micros(F.min("ts")).alias("lo"),
                  F.unix_micros(F.max("ts")).alias("hi"),
                  F.count(F.lit(1)).alias("n")).collect()[0])
    assert got["n"] == 48
    assert got["lo"] == base_us
    assert got["hi"] == base_us + 47 * 3_600_000_000


def test_convert_is_noop_for_us(spark):
    from pyspark.sql import types as T
    df = spark.createDataFrame([], T.StructType(
        [T.StructField("ts", T.TimestampType(), True)]))
    assert convert_events_ts(df, "us") is df


@pytest.mark.parametrize("unit", ["ms", "s", None])
def test_unknown_storage_unit_raises(tmp_path, unit):
    """A future generation shipping timestamp[ms]/[s] or a plain int64
    must fail loudly: defaulting to the nanos branch would scan it as
    long and divide by 1000 — a silent 1000x timeline corruption."""
    ts_type = pa.timestamp(unit) if unit else pa.int64()
    table = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([1_704_067_200_000], pa.int64()).cast(ts_type),
        "user_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["view"], pa.string()),
        "value": pa.array([1.0], pa.float64()),
        "props": pa.array(["{}"], pa.string()),
    })
    path = str(tmp_path / "events.parquet")
    pq.write_table(table, path, store_schema=False)
    with pytest.raises(ValueError, match="unsupported storage unit"):
        events_ts_unit(path)
