"""S1 via the PySpark 4 Python Data Source API (sources/fetch_datasource)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.sources.fetch_datasource import (
    StockFetchDataSource,
)

CANNED = ("stock_data_etl_pipeline_spark.sources.fetch_datasource"
          ":canned_transport")


def _read(spark, tickers, **opts):
    spark.dataSource.register(StockFetchDataSource)
    r = (spark.read.format("stock_fetch")
         .option("tickers", tickers).option("transport", CANNED))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_datasource_taxonomy_and_payloads(spark):
    out = {r["ticker"]: r for r in
           _read(spark, "aapl, ERR1, GONE2, EMPTY3, BAD4, msft").collect()}
    assert out["AAPL"]["error_code"] is None
    assert '"ticker": "AAPL"' in out["AAPL"]["json_str"]
    assert out["ERR1"]["error_code"] == "SERVER_ERROR"
    assert out["GONE2"]["error_code"] == "NOT_FOUND"
    assert out["EMPTY3"]["error_code"] == "EMPTY_RESPONSE"
    assert out["BAD4"]["error_code"] == "INVALID_JSON"
    assert out["MSFT"]["error_code"] is None
    # failed fetches carry no payload
    assert all(out[t]["json_str"] is None
               for t in ("ERR1", "GONE2", "EMPTY3", "BAD4"))


def test_datasource_dedupes_and_partitions(spark):
    df = _read(spark, "a,b,a,c,b,d,e", numPartitions="3")
    assert df.rdd.getNumPartitions() == 3
    assert sorted(r["ticker"] for r in df.collect()) == \
        ["A", "B", "C", "D", "E"]


def test_datasource_matches_mapinpandas_fetch(spark):
    # the two S1 surfaces agree row-for-row on the same transport
    from stock_data_etl_pipeline_spark.sources.fetch import fetch_tickers
    from stock_data_etl_pipeline_spark.sources.fetch_datasource import (
        canned_transport,
    )
    tickers = "AAPL,ERR9,GONE8,XYZ"
    via_ds = _read(spark, tickers).orderBy("ticker").collect()
    tick_df = spark.createDataFrame(
        [(t,) for t in tickers.split(",")], "ticker string")
    via_map = (fetch_tickers(tick_df, canned_transport({}))
               .orderBy("ticker").collect())
    assert [tuple(r) for r in via_ds] == [tuple(r) for r in via_map]


def test_streaming_datasource_polls_per_microbatch(spark, tmp_path):
    from stock_data_etl_pipeline_spark.sources.fetch_datasource import (
        StockFetchStreamDataSource,
    )
    spark.dataSource.register(StockFetchStreamDataSource)
    name = "fetch_stream_sink"
    q = (spark.readStream.format("stock_fetch_stream")
         .option("tickers", "AAPL,ERR1,MSFT").option("transport", CANNED)
         .load()
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / "cp"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.table(name).collect()
    # availableNow drains exactly one poll: one row per ticker, poll 0
    assert {(r["poll"], r["ticker"], r["error_code"]) for r in rows} == {
        (0, "AAPL", None), (0, "ERR1", "SERVER_ERROR"), (0, "MSFT", None)}


def test_datasource_pushes_ticker_filter_into_fetch_list(spark, tmp_path):
    from stock_data_etl_pipeline_spark.sources.fetch_datasource import (
        StockFetchDataSource,
    )
    import os
    spark.dataSource.register(StockFetchDataSource)
    spy = str(tmp_path / "spy")
    os.makedirs(spy)
    out = (spark.read.format("stock_fetch")
           .option("tickers", "AAPL,MSFT,GOOG,NFLX")
           .option("transport", CANNED).option("spydir", spy)
           .load()
           .filter("ticker = 'MSFT'").collect())
    assert [r["ticker"] for r in out] == ["MSFT"]
    # the pushed filter pruned the fetch list ON THE SOURCE: only MSFT
    # was ever requested from the transport
    assert os.listdir(spy) == ["MSFT"]
