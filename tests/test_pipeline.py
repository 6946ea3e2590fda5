"""End-to-end data-plane test: the §3.1 flagship path on fixture docs."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.plans.pipeline import StockLake
from stock_data_etl_pipeline_spark.state_machine import IngestionState as S

DOC = {
    "data": {
        "financials": {
            "quarterly": {"period_end_date": ["2024-03", "2024-06"],
                          "revenue": [10.0, 20.0]},
            "ttm": {"period_end_date": "TTM", "revenue": 30.0},
        },
        "metadata": {"sector": "Tech", "name": "Apple Inc",
                     "exchange": " nasdaq ", "country": "US"},
    }
}


def test_ingest_batch_end_to_end(spark, tmp_path):
    lake = StockLake(spark, str(tmp_path / "lake"))
    res = lake.ingest_batch([("aapl", json.dumps(DOC))])

    # silver: 2 financials + 1 ttm + 1 metadata
    silver = lake.silver.read()
    assert silver.count() == 4
    ttm = silver.filter(F.col("record_type") == "ttm").collect()[0]
    assert ttm["period_end_date"] == "2024-06"

    # runs reached DONE with all phase timestamps
    run = lake.runs.read().collect()[0]
    assert run["state"] == S.DONE
    assert run["raw_data_uri"] and run["processed_data_uri"]
    assert run["done_at"] is not None

    # metadata sync: stock row carries name, FK-resolved dims
    stock = lake.stocks.read().collect()[0]
    assert stock["ticker"] == "AAPL"
    assert stock["name"] == "Apple Inc"
    assert stock["exchange_id"] is not None and stock["sector_id"] is not None
    exch = lake.exchanges.read().collect()[0]
    assert exch["name"] == "NASDAQ"  # normalized UPPER+trim
    sect = lake.sectors.read().collect()[0]
    assert sect["name"] == "Tech"  # case preserved

    # idempotency: re-ingesting the same doc leaves silver unchanged
    lake.ingest_batch([("AAPL", json.dumps(DOC))])
    assert lake.silver.read().count() == 4


def test_second_batch_updates_and_extends(spark, tmp_path):
    lake = StockLake(spark, str(tmp_path / "lake"))
    lake.ingest_batch([("AAPL", json.dumps(DOC))])

    doc2 = json.loads(json.dumps(DOC))
    doc2["data"]["financials"]["quarterly"] = {
        "period_end_date": ["2024-06", "2024-09"],
        "revenue": [21.0, 40.0],       # restated 2024-06
        "eps": [1.0, 2.0],             # brand-new metric column
    }
    doc2["data"]["metadata"]["name"] = "Apple Inc."
    lake.ingest_batch([("AAPL", json.dumps(doc2))])

    silver = lake.silver.read()
    fin = {r["period_end_date"]: r.asDict()
           for r in silver.filter(F.col("record_type") == "financials").collect()}
    assert set(fin) == {"2024-03", "2024-06", "2024-09"}
    assert fin["2024-06"]["revenue"] == 21.0          # updated in place
    assert fin["2024-09"]["eps"] == 2.0               # schema evolved
    assert fin["2024-03"]["eps"] is None              # old rows null-filled

    stock = lake.stocks.read().collect()[0]
    assert stock["name"] == "Apple Inc."              # changed field synced

    # two DONE runs; latest-per-stock window sees the newer one
    runs = lake.runs.read()
    assert runs.filter(F.col("state") == S.DONE).count() == 2


def test_dim_get_or_create_case_rules(spark, tmp_path):
    lake = StockLake(spark, str(tmp_path / "lake"))
    doc_a = json.loads(json.dumps(DOC))
    doc_b = json.loads(json.dumps(DOC))
    doc_b["data"]["metadata"]["sector"] = "tech"       # same sector, diff case
    doc_b["data"]["metadata"]["exchange"] = "Nasdaq"   # same exchange, diff case
    lake.ingest_batch([("AAPL", json.dumps(doc_a))])
    lake.ingest_batch([("MSFT", json.dumps(doc_b))])
    # matched case-insensitively -> still one row each
    assert lake.sectors.read().count() == 1
    assert lake.exchanges.read().count() == 1
    # sector kept its first-seen case
    assert lake.sectors.read().collect()[0]["name"] == "Tech"
    # both stocks resolve to the same dim ids
    stocks = {r["ticker"]: r for r in lake.stocks.read().collect()}
    assert stocks["AAPL"]["sector_id"] == stocks["MSFT"]["sector_id"]
    assert stocks["AAPL"]["exchange_id"] == stocks["MSFT"]["exchange_id"]


def test_batch_dedupes_tickers_first_payload_wins(spark, tmp_path):
    lake = StockLake(spark, str(tmp_path / "lake"))
    doc2 = json.loads(json.dumps(DOC))
    doc2["data"]["metadata"]["name"] = "Second Payload"
    res = lake.ingest_batch([("AAPL", json.dumps(DOC)),
                             (" aapl ", json.dumps(doc2))])
    # one run, one stock; the first payload's metadata won
    assert len(res["run_ids"]) == 1
    assert lake.read_stocks().count() == 1
    assert lake.stocks.read().collect()[0]["name"] == "Apple Inc"
    assert lake.runs.read().count() == 1


def test_batch_skips_stocks_with_active_run(spark, tmp_path):
    from stock_data_etl_pipeline_spark.state_machine import (
        new_run_row,
        runs_dataframe,
    )
    lake = StockLake(spark, str(tmp_path / "lake"))
    lake.ingest_batch([("AAPL", json.dumps(DOC))])
    # plant a non-terminal run for MSFT (as if another request is mid-flight)
    stocks = lake.get_or_create_stocks(["MSFT"])
    sid = {r["ticker"]: r["id"] for r in stocks.collect()}
    active = new_run_row(sid["MSFT"], "MSFT")
    lake.runs.overwrite(lake.read_runs().unionByName(
        runs_dataframe(spark, [active])))

    res = lake.ingest_batch([("MSFT", json.dumps(DOC)),
                             ("GOOG", json.dumps(DOC))])
    # MSFT skipped (created=False path, existing run id reported);
    # GOOG ingested
    assert res["skipped"] == {"MSFT": active["id"]}
    assert len(res["run_ids"]) == 1
    runs = {(r["ticker"], r["state"]) for r in lake.runs.read().collect()}
    # MSFT's planted run is untouched (still the only MSFT run, still
    # queued); GOOG went through to DONE
    assert ("MSFT", S.QUEUED_FOR_FETCH) in runs
    assert ("MSFT", S.DONE) not in runs
    assert ("GOOG", S.DONE) in runs
