"""Structured Streaming ingest + event operators."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.sources.managed_table import ManagedTable
from stock_data_etl_pipeline_spark.streaming.ingest import stream_ingest_bronze

DOC = {"data": {"financials": {
    "quarterly": {"period_end_date": ["2024-03"], "revenue": [1.0]},
    "ttm": {"period_end_date": "TTM", "revenue": 4.0}},
    "metadata": {"name": "A Corp"}}}


def _land_events_ns(src: str, rows, name: str) -> None:
    """Write one events file with ts as REAL timestamp[ns] (physical
    int64 + TIMESTAMP(NANOS), the round-1 testdata layout). The loader
    now refuses plain int64 ts — unit-less semantics are exactly the
    silent-1000x hazard — so fixtures must carry the logical type."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("ns")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(table, os.path.join(src, name), store_schema=False)


def _write_bronze(spark, path, rows):
    (spark.createDataFrame(rows, "ticker string, run_id string, json_str string")
     .coalesce(1).write.mode("append").parquet(path))


def test_stream_ingest_merges_and_is_exactly_once(spark, tmp_path):
    bronze = str(tmp_path / "bronze")
    cp = str(tmp_path / "cp")
    silver = ManagedTable(spark, str(tmp_path / "silver"),
                          partition_by=["record_type"])

    _write_bronze(spark, bronze, [("AAPL", "r1", json.dumps(DOC))])
    n1 = stream_ingest_bronze(spark, bronze, silver, cp)
    assert n1 == 1
    assert silver.read().count() == 3  # financials + ttm + metadata

    # restart with same checkpoint, nothing new -> no re-processing
    n2 = stream_ingest_bronze(spark, bronze, silver, cp)
    assert n2 == 0
    assert silver.read().count() == 3

    # second doc arrives; only the delta is processed, merge dedups the key
    doc2 = json.loads(json.dumps(DOC))
    doc2["data"]["financials"]["quarterly"] = {
        "period_end_date": ["2024-03", "2024-06"], "revenue": [2.0, 3.0]}
    _write_bronze(spark, bronze, [("AAPL", "r2", json.dumps(doc2))])
    n3 = stream_ingest_bronze(spark, bronze, silver, cp)
    assert n3 == 1
    fin = {r["period_end_date"]: r["revenue"] for r in
           silver.read().filter(F.col("record_type") == "financials").collect()}
    assert fin == {"2024-03": 2.0, "2024-06": 3.0}  # updated + appended


def test_stream_stream_join_matches_across_micro_batches(spark, tmp_path):
    from stock_data_etl_pipeline_spark.streaming.events import (
        streaming_purchase_view_join,
    )
    import time

    src = str(tmp_path / "events_src")
    os.makedirs(src)
    base_ns = 1_700_000_000 * 1_000_000_000  # well away from epoch 0

    def ev(eid, offset_s, user, etype):
        return (eid, base_ns + offset_s * 1_000_000_000, user, etype,
                1.0, "{}")
    def land(rows, name):
        # FileStreamSource lists plain files, not dataset directories
        _land_events_ns(src, rows, name)

    # batch 1: the views (buffered in join state, no purchase yet)
    land([ev(1, 0, 7, "view"), ev(2, 600, 7, "view"),
          ev(3, 0, 8, "view")], "a.parquet")
    time.sleep(1.1)  # distinct mod times -> deterministic file order
    # batch 2: purchases; user 7 in-window, user 9 has no views,
    # user 8's purchase is 2h after the view (outside the 1h lookback)
    land([ev(10, 1200, 7, "purchase"), ev(11, 7200, 8, "purchase"),
          ev(12, 1200, 9, "purchase")], "b.parquet")

    out = streaming_purchase_view_join(spark, src,
                                       max_files_per_trigger=1).collect()
    got = {(r["p_id"], r["v_id"]) for r in out}
    # purchase 10 matches both earlier views of user 7 — found only via
    # state buffered from the first micro-batch
    assert got == {(10, 1), (10, 2)}


def test_stream_stream_left_outer_emits_null_after_watermark(spark, tmp_path):
    from stock_data_etl_pipeline_spark.streaming.events import (
        streaming_purchase_view_join,
    )
    import time

    src = str(tmp_path / "ev_lo")
    os.makedirs(src)
    base_ns = 1_700_000_000 * 1_000_000_000

    def ev(eid, offset_s, user, etype):
        return (eid, base_ns + offset_s * 1_000_000_000, user, etype,
                1.0, "{}")

    def land(rows, name):
        _land_events_ns(src, rows, name)

    # batch 1: a purchase that will never match
    land([ev(1, 0, 7, "purchase")], "a.parquet")
    time.sleep(1.1)
    # batches 2-3: later events on BOTH sides — the global watermark is
    # the min across sides, so both must advance for the outer row to
    # flush; the flush lands in the batch AFTER the advance
    land([ev(98, 86400, 42, "purchase"), ev(99, 86400, 42, "view")],
         "b.parquet")
    time.sleep(1.1)
    land([ev(101, 172800, 42, "purchase"), ev(100, 172800, 42, "view")],
         "c.parquet")

    out = streaming_purchase_view_join(
        spark, src, watermark="10 minutes", max_files_per_trigger=1,
        how="left_outer").collect()
    got = {(r["p_id"], r["v_id"]) for r in out}
    # purchase 1: unmatched -> NULL view, emitted only via watermark flush;
    # purchases 98/101 match their same-timestamp views
    assert got == {(1, None), (98, 99), (101, 100)}
