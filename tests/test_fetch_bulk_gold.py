"""S1 fetch taxonomy, S8 raw passthrough, A3/M5 bulk queue, C1-C3 gold
views."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.plans.bulk import bulk_run_stats, queue_all_stocks
from stock_data_etl_pipeline_spark.plans.gold import GoldViews
from stock_data_etl_pipeline_spark.plans.pipeline import StockLake
from stock_data_etl_pipeline_spark.sources.fetch import classify, fetch_tickers
from stock_data_etl_pipeline_spark.state_machine import IngestionState as S

DOC = {"data": {"financials": {
    "quarterly": {"period_end_date": ["2024-03"], "revenue": [1.0]},
    "ttm": {"period_end_date": "TTM", "revenue": 4.0}},
    "metadata": {"sector": "Tech", "name": "A", "exchange": "NYSE"}}}


# -- S1 fetch ---------------------------------------------------------------

RESPONSES = {
    "GOOD": (200, json.dumps(DOC)),
    "AUTH": (401, ""),
    "MISSING": (404, "nope"),
    "THROTTLED": (429, ""),
    "TEAPOT": (418, ""),
    "BROKEN": (500, "err"),
    "EMPTY": (200, "   "),
    "GARBAGE": (200, "{not json"),
    "SCALAR": (200, "42"),
}


def test_fetch_error_taxonomy(spark):
    responses = dict(RESPONSES)

    # local closure: cloudpickle ships it by value to executors (a module-
    # level function would be pickled by reference to the test module,
    # which executors can't import)
    def fake_transport(ticker: str):
        if ticker == "BOOM":
            raise ConnectionError("no route")
        return responses[ticker]

    tickers = spark.createDataFrame(
        [(t,) for t in [*RESPONSES, "BOOM"]], "ticker string")
    out = {r["ticker"]: r for r in
           fetch_tickers(tickers, fake_transport).collect()}
    assert out["GOOD"]["error_code"] is None
    assert json.loads(out["GOOD"]["json_str"]) == DOC
    expect = {"AUTH": "AUTH_ERROR", "MISSING": "NOT_FOUND",
              "THROTTLED": "RATE_LIMITED", "TEAPOT": "CLIENT_ERROR",
              "BROKEN": "SERVER_ERROR", "EMPTY": "EMPTY_RESPONSE",
              "GARBAGE": "INVALID_JSON", "SCALAR": "INVALID_JSON",
              "BOOM": "CONNECTION_ERROR"}
    got = {t: r["error_code"] for t, r in out.items() if t != "GOOD"}
    assert got == expect
    assert all(out[t]["json_str"] is None for t in expect)


def test_classify_is_pure():
    assert classify(200, '{"a": 1}') is None
    assert classify(None, None) == "CONNECTION_ERROR"


# -- S8 raw passthrough -----------------------------------------------------

def test_read_raw_json_latest_done(spark, tmp_path):
    lake = StockLake(spark, str(tmp_path / "lake"))
    lake.ingest_batch([("AAPL", json.dumps(DOC))])
    doc2 = json.loads(json.dumps(DOC))
    doc2["data"]["metadata"]["name"] = "A2"
    lake.ingest_batch([("AAPL", json.dumps(doc2))])

    payload = lake.read_raw_json("aapl ")
    assert json.loads(payload)["data"]["metadata"]["name"] == "A2"  # latest
    assert lake.read_raw_json("MISSING") is None


# -- A3/M5 bulk queue -------------------------------------------------------

def test_queue_all_stocks_counters(spark, tmp_path):
    lake = StockLake(spark, str(tmp_path / "lake"))
    lake.get_or_create_stocks(["AAA", "BBB", "CCC"])
    # give AAA an active run -> it must be skipped
    from stock_data_etl_pipeline_spark.state_machine import new_run_row, runs_dataframe
    sid = {r["ticker"]: r["id"] for r in lake.read_stocks().collect()}
    lake.runs.overwrite(runs_dataframe(
        spark, [new_run_row(sid["AAA"], "AAA")]))

    res = queue_all_stocks(lake, requested_by="ops")
    assert res["total_stocks"] == 3
    assert res["queued_count"] == 2
    assert res["skipped_count"] == 1
    assert res["error_count"] == 0

    runs = lake.runs.read()
    assert runs.count() == 3
    assert runs.filter(F.col("bulk_queue_run_id").isNotNull()).count() == 2

    stats = {r["state"]: r["count"] for r in
             bulk_run_stats(lake, res["bulk_queue_run_id"]).collect()}
    assert stats[S.QUEUED_FOR_FETCH] == 2
    assert stats[S.DONE] == 0  # zero-filled
    assert len(stats) == 8

    bulk = lake.bulk_runs.read().collect()[0]
    assert (bulk["total_stocks"], bulk["queued_count"],
            bulk["skipped_count"], bulk["error_count"]) == (3, 2, 1, 0)
    assert bulk["completed_at"] is not None


# -- C1-C3 gold views -------------------------------------------------------

def test_gold_views_cache_and_invalidation(spark):
    calls = {"n": 0}

    def builder():
        calls["n"] += 1
        return spark.range(5)

    gv = GoldViews()
    gv.register("tickers_page", builder, tags={"ticker_views"})
    gv.register("exchanges_page", lambda: spark.range(2),
                tags={"exchange_views"})

    assert gv.get("tickers_page").count() == 5
    gv.get("tickers_page")
    assert calls["n"] == 1  # C1: served from cache

    # C2: a sector write invalidates ticker views but not exchange views
    hit = gv.notify_write("sectors")
    assert hit == ["tickers_page"]
    gv.get("tickers_page")
    assert calls["n"] == 2

    # unknown table -> nothing invalidated
    assert gv.notify_write("lineitem") == []


def test_gold_ttl_expiry(spark, monkeypatch):
    import stock_data_etl_pipeline_spark.plans.gold as gold_mod
    t = {"now": 1000.0}
    monkeypatch.setattr(gold_mod.time, "monotonic", lambda: t["now"])
    calls = {"n": 0}

    def builder():
        calls["n"] += 1
        return builder.spark.range(1)

    builder.spark = spark
    gv = GoldViews()
    gv.register("stats", builder, tags=set(), ttl_seconds=300)
    gv.get("stats"); gv.get("stats")
    assert calls["n"] == 1
    t["now"] += 301  # C3: TTL elapsed
    gv.get("stats")
    assert calls["n"] == 2
