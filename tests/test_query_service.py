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


def test_opaque_cursor_round_trip_and_reverse(spark, tmp_path):
    import datetime

    import pytest

    from stock_data_etl_pipeline_spark.operators.pagination import (
        InvalidCursorError,
        decode_cursor,
        encode_cursor,
        keyset_page,
        page_cursor,
    )

    # token round-trips every cursor-able type exactly
    vals = [datetime.datetime(2024, 3, 1, 12, 30, 15, 123456),
            datetime.date(2024, 3, 1), 42, 1.5, "run-id", None, True]
    assert decode_cursor(encode_cursor(vals)) == vals
    with pytest.raises(InvalidCursorError):
        decode_cursor("not!a@cursor")

    df = spark.createDataFrame([(i, f"r{i:02d}") for i in range(10)],
                               "seq long, id string")
    order = [("seq", True), ("id", False)]  # seq DESC, id ASC

    # forward walk with opaque tokens: pages partition the relation
    p1 = keyset_page(df, order, page_size=4).collect()
    tok = page_cursor(p1[-1], order)
    assert isinstance(tok, str)
    p2 = keyset_page(df, order, cursor=tok, page_size=4).collect()
    assert [r["seq"] for r in p1] == [9, 8, 7, 6]
    assert [r["seq"] for r in p2] == [5, 4, 3, 2]

    # backward from p2's first row recovers exactly p1, in base order
    back_tok = page_cursor(p2[0], order)
    back = keyset_page(df, order, cursor=back_tok, page_size=4,
                       reverse=True).collect()
    assert [r["seq"] for r in back] == [9, 8, 7, 6]
