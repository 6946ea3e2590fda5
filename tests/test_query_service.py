"""Control-plane query service (§3.2/§3.3 endpoints)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.plans.pipeline import StockLake
from stock_data_etl_pipeline_spark.plans.queries import (
    latest_run_for_stock,
    list_runs,
    stock_detail,
)
from stock_data_etl_pipeline_spark.state_machine import (
    IngestionState as S,
    new_run_row,
    runs_dataframe,
    transition,
)

DOC = {"data": {"financials": {
    "quarterly": {"period_end_date": ["2024-03"], "revenue": [1.0]},
    "ttm": {"period_end_date": "TTM", "revenue": 4.0}},
    "metadata": {"sector": "Tech", "name": "Apple", "exchange": "NASDAQ"}}}


def _lake_with_runs(spark, tmp_path):
    lake = StockLake(spark, str(tmp_path / "lake"))
    lake.ingest_batch([("AAPL", json.dumps(DOC)), ("MSFT", json.dumps(DOC))])
    # add one FAILED and one in-progress run
    sid = {r["ticker"]: r["id"] for r in lake.read_stocks().collect()}
    extra = [new_run_row(sid["AAPL"], "AAPL"), new_run_row(sid["MSFT"], "MSFT")]
    runs = lake.read_runs().unionByName(runs_dataframe(spark, extra))
    runs = transition(runs, extra[0]["id"], S.FAILED,
                      error_code="API_ERROR", error_message="boom")
    lake.runs.overwrite(runs)
    return lake


def test_list_runs_filters_and_pagination(spark, tmp_path):
    lake = _lake_with_runs(spark, tmp_path)

    assert list_runs(lake).count() == 4  # 2 DONE + FAILED + QUEUED

    failed = list_runs(lake, {"state": "FAILED"}).collect()
    assert len(failed) == 1 and failed[0]["error_code"] == "API_ERROR"

    # through-FK icontains on ticker (J3) + virtual boolean
    aapl_term = list_runs(lake, {"ticker__icontains": "aap",
                                 "is_terminal": True}).collect()
    assert {r["state"] for r in aapl_term} == {S.DONE, S.FAILED}

    in_prog = list_runs(lake, {"is_in_progress": True}).collect()
    assert [r["state"] for r in in_prog] == [S.QUEUED_FOR_FETCH]

    # keyset paging walks all rows without overlap
    p1 = list_runs(lake, page_size=2).collect()
    cursor = [p1[-1]["created_at"], p1[-1]["id"]]
    p2 = list_runs(lake, page_size=2, cursor=cursor).collect()
    ids = [r["id"] for r in p1 + p2]
    assert len(ids) == 4 and len(set(ids)) == 4


def test_stock_detail_joins_dims(spark, tmp_path):
    lake = _lake_with_runs(spark, tmp_path)
    row = stock_detail(lake, " aapl ").collect()[0]
    assert row["name"] == "Apple"
    assert row["exchange_name"] == "NASDAQ"
    assert row["sector_name"] == "Tech"


def test_latest_run_for_stock(spark, tmp_path):
    lake = _lake_with_runs(spark, tmp_path)
    newest = latest_run_for_stock(lake, "AAPL").collect()[0]
    assert newest["state"] == S.FAILED  # the most recent AAPL run
    done = latest_run_for_stock(lake, "AAPL", only_done=True).collect()[0]
    assert done["state"] == S.DONE
