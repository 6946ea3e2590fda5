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
