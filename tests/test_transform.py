"""Transform correctness on the reference's own fixture shapes
(FIXTURES.md §1; reference tests services/workers/tests/queue_for_delta.py).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.plans.stock_transform import (
    parse_raw,
    transform_stock_json,
)

BASE_DOC = {
    "data": {
        "financials": {
            "quarterly": {
                "period_end_date": ["2024-03", "2024-06", "2024-09"],
                "revenue": [90753000000, 85777000000, 94930000000],
                "cogs": [54428000000, 52498000000, 55800000000],
                "gross_profit": [36325000000, 33279000000, 39130000000],
            },
            "ttm": {
                "period_end_date": "TTM",
                "revenue": 416161000000,
                "cogs": 220960000000,
                "gross_profit": 195201000000,
                "ebitda": 144748000000,
                "fcf": 98767000000,
            },
        },
        "metadata": {
            "sector": "Information Technology",
            "name": "Apple Inc",
            "exchange": "NASDAQ",
            "symbol": "AAPL",
            "country": "US",
            "currency": "USD",
        },
    }
}


def _run(spark, docs):
    raw = spark.createDataFrame(docs, "ticker string, json_str string")
    return transform_stock_json(raw)


def rows_by_type(df, rt):
    return [r.asDict() for r in
            df.filter(F.col("record_type") == rt).collect()]


def test_base_doc_row_grain(spark):
    out = _run(spark, [("aapl ", json.dumps(BASE_DOC))]).cache()
    fin = rows_by_type(out, "financials")
    assert len(fin) == 3
    # ticker normalized strip().upper()
    assert {r["ticker"] for r in fin} == {"AAPL"}
    by_period = {r["period_end_date"]: r for r in fin}
    assert by_period["2024-03"]["revenue"] == 90753000000.0
    assert isinstance(by_period["2024-03"]["revenue"], float)  # int -> double

    # TTM row: 'TTM' placeholder replaced by the LAST quarterly period
    ttm = rows_by_type(out, "ttm")
    assert len(ttm) == 1
    assert ttm[0]["period_end_date"] == "2024-09"
    assert ttm[0]["ebitda"] == 144748000000.0

    meta = rows_by_type(out, "metadata")
    assert len(meta) == 1
    assert meta[0]["period_end_date"] is None
    assert meta[0]["name"] == "Apple Inc"
    assert meta[0]["sector"] == "Information Technology"

    # financials rows have no metadata values; ebitda (ttm-only) is null
    assert by_period["2024-03"]["name"] is None
    assert by_period["2024-03"]["ebitda"] is None


def test_ragged_arrays_null_padded(spark):
    doc = json.loads(json.dumps(BASE_DOC))
    doc["data"]["financials"]["quarterly"]["revenue"] = [1.0]  # shorter
    out = _run(spark, [("T", json.dumps(doc))])
    fin = {r["period_end_date"]: r for r in rows_by_type(out, "financials")}
    assert fin["2024-03"]["revenue"] == 1.0
    assert fin["2024-06"]["revenue"] is None
    assert fin["2024-09"]["revenue"] is None


def test_null_sentinels_normalized(spark):
    doc = json.loads(json.dumps(BASE_DOC))
    doc["data"]["financials"]["quarterly"]["revenue"] = [" n/a ", "NA", 5]
    doc["data"]["metadata"]["country"] = "NONE"
    out = _run(spark, [("T", json.dumps(doc))])
    fin = {r["period_end_date"]: r for r in rows_by_type(out, "financials")}
    assert fin["2024-03"]["revenue"] is None
    assert fin["2024-06"]["revenue"] is None
    assert fin["2024-09"]["revenue"] == 5.0  # survives, column still double
    assert rows_by_type(out, "metadata")[0]["country"] is None


def test_mixed_numeric_becomes_double_strings_stay(spark):
    doc = json.loads(json.dumps(BASE_DOC))
    doc["data"]["financials"]["quarterly"]["mixed"] = [1, 2.5, 3]
    doc["data"]["financials"]["quarterly"]["texty"] = ["a", "b", "c"]
    out = _run(spark, [("T", json.dumps(doc))])
    types = dict(out.dtypes)
    assert types["mixed"] == "double"
    assert types["texty"] == "string"


def test_all_null_column_is_string(spark):
    doc = json.loads(json.dumps(BASE_DOC))
    doc["data"]["financials"]["quarterly"]["ghost"] = ["N/A", "NULL", "-"]
    out = _run(spark, [("T", json.dumps(doc))])
    assert dict(out.dtypes)["ghost"] == "string"
    assert all(r["ghost"] is None for r in rows_by_type(out, "financials"))


def test_ttm_dropped_without_quarterly_dates(spark):
    doc = {"data": {"financials": {"ttm": BASE_DOC["data"]["financials"]["ttm"]},
                    "metadata": BASE_DOC["data"]["metadata"]}}
    out = _run(spark, [("T", json.dumps(doc))])
    assert rows_by_type(out, "ttm") == []
    assert rows_by_type(out, "financials") == []
    assert len(rows_by_type(out, "metadata")) == 1


def test_excluded_metric_dropped(spark):
    doc = json.loads(json.dumps(BASE_DOC))
    doc["data"]["financials"]["quarterly"]["roic_5yr_avg"] = [1, 2, 3]
    out = _run(spark, [("T", json.dumps(doc))])
    assert "roic_5yr_avg" not in out.columns


def test_invalid_documents_flagged_and_skipped(spark):
    docs = [("A", json.dumps(BASE_DOC)),
            ("B", "not json at all"),
            ("C", json.dumps({"nodata": 1})),
            ("D", json.dumps([1, 2, 3]))]
    raw = spark.createDataFrame(docs, "ticker string, json_str string")
    flags = {r["ticker"]: r["is_valid"] for r in parse_raw(raw).collect()}
    assert flags == {"A": True, "B": False, "C": False, "D": False}
    out = transform_stock_json(raw)
    assert {r["ticker"] for r in out.collect()} == {"A"}


def test_multi_doc_batch_schema_union(spark):
    doc2 = json.loads(json.dumps(BASE_DOC))
    doc2["data"]["financials"]["quarterly"]["eps"] = [1.1, 1.2, 1.3]
    out = _run(spark, [("A", json.dumps(BASE_DOC)), ("B", json.dumps(doc2))])
    fin = rows_by_type(out, "financials")
    assert len(fin) == 6
    a = {r["period_end_date"]: r for r in fin if r["ticker"] == "A"}
    b = {r["period_end_date"]: r for r in fin if r["ticker"] == "B"}
    assert a["2024-03"]["eps"] is None  # A never reported eps
    assert b["2024-03"]["eps"] == 1.1
