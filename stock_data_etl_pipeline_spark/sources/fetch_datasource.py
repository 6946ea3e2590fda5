"""S1 surfaced through PySpark 4's Python Data Source API (DataSource V2):
the same per-ticker HTTP fetch + status taxonomy as ``sources/fetch.py``
(reference: services/workers/tasks/queue_for_fetch.py:310-405), but as a
first-class readable format —

    spark.dataSource.register(StockFetchDataSource)
    spark.read.format("stock_fetch")
         .option("tickers", "AAPL,MSFT")
         .option("baseUrl", "https://api.example.com/stocks")
         .option("numPartitions", "8")
         .load()

Why both surfaces exist: ``fetch_tickers`` (mapInPandas) composes with an
existing ticker DataFrame mid-plan; the data source is the catalog-style
entry point — the ticker list lives in the read options, partitions() is
the executor-parallelism contract (one fetch partition per executor slot,
the Celery ``--concurrency`` knob restated), and the result is a plain
scannable relation any downstream query can use.

The transport stays injectable across the serialization boundary: options
are strings, so tests pass ``transport`` as a ``module:factory`` dotted
path resolved on the executor; ``canned_transport`` below is the
deterministic offline kernel. Without ``transport``, the real
``http_transport`` is built from baseUrl/timeout/apiKey.
"""

from __future__ import annotations

import importlib
import json
import math
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .fetch import Transport, classify, http_transport

FETCH_DDL = "ticker string, status_code int, error_code string, json_str string"


class _TickerPartition(InputPartition):
    def __init__(self, tickers: list[str]) -> None:
        self.tickers = tickers


def _lower(options: dict) -> dict:
    return {k.lower(): v for k, v in options.items()}


def resolve_transport(options: dict) -> Transport:
    """Build the transport on the EXECUTOR from string options: either the
    ``module:factory`` dotted path (factory receives the options dict), or
    the real HTTP transport from baseUrl/timeout/apiKey."""
    opts = _lower(options)
    path = opts.get("transport")
    if path:
        mod, _, fn = path.partition(":")
        return getattr(importlib.import_module(mod), fn)(opts)
    return http_transport(opts["baseurl"],
                          timeout=float(opts.get("timeout", "300")),
                          api_key=opts.get("apikey"))


def canned_transport(options: dict) -> Transport:
    """Deterministic offline transport (tests / air-gapped demo): ticker
    prefixes drive the taxonomy — ERR => 500, GONE => 404, EMPTY => empty
    body, BAD => invalid JSON, anything else => a minimal valid doc.
    Option ``spydir``: record each REQUESTED ticker as a file there —
    executors run in separate processes, so tests observe which tickers
    the transport was actually asked for (pushdown pruning) via the
    filesystem, not a driver-side mock."""
    import os
    spydir = _lower(options).get("spydir")

    def call(ticker: str) -> tuple[int, str]:
        if spydir:
            open(os.path.join(spydir, ticker), "w").close()
        if ticker.startswith("ERR"):
            return 500, ""
        if ticker.startswith("GONE"):
            return 404, ""
        if ticker.startswith("EMPTY"):
            return 200, ""
        if ticker.startswith("BAD"):
            return 200, "{not json"
        return 200, json.dumps({"data": {"ticker": ticker}})
    return call


class StockFetchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.options = options
        self._wanted: set[str] | None = None  # ticker pushdown, None = all

    def pushFilters(self, filters):
        """DSv2 filter pushdown, the source-side kind that matters here:
        an equality/IN predicate on ``ticker`` prunes the FETCH LIST
        itself — the pruned tickers are never requested from the
        upstream API, not merely dropped post-read. Every other filter
        is returned as unsupported and evaluated by Spark."""
        from pyspark.sql.datasource import EqualTo, In
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("ticker",):
                self._wanted = {str(f.value).strip().upper()}
            elif isinstance(f, In) and f.attribute == ("ticker",):
                self._wanted = {str(v).strip().upper() for v in f.values}
            else:
                unsupported.append(f)  # Spark applies these post-scan
        return unsupported

    def partitions(self) -> list[InputPartition]:
        # the parallelism contract: tickers deduped (first wins, like
        # ingest_batch) and range-chunked into numPartitions fetch tasks
        opts = _lower(self.options)
        tickers = list(dict.fromkeys(
            t.strip().upper() for t in opts.get("tickers", "").split(",")
            if t.strip()))
        if self._wanted is not None:
            tickers = [t for t in tickers if t in self._wanted]
        n = max(1, int(opts.get("numpartitions", "4")))
        size = max(1, math.ceil(len(tickers) / n)) if tickers else 1
        chunks = [tickers[i:i + size] for i in range(0, len(tickers), size)]
        return [_TickerPartition(c) for c in (chunks or [[]])]

    def read(self, partition: _TickerPartition) -> Iterator[tuple]:
        transport = resolve_transport(self.options)
        for t in partition.tickers:
            code: int | None
            try:
                code, body = transport(t)
            except Exception:  # noqa: BLE001 — transport failures are rows
                code, body = None, None
            err = classify(code, body)
            yield (t, code, err, body if err is None else None)


class StockFetchDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "stock_fetch"

    def schema(self) -> str:
        return FETCH_DDL

    def reader(self, schema) -> StockFetchReader:  # noqa: ARG002
        return StockFetchReader(self.options)


class StockFetchStreamReader(SimpleDataSourceStreamReader):
    """Streaming S1: a polling source — every micro-batch re-fetches the
    ticker list once and emits one row per ticker with the same taxonomy
    as the batch reader, plus the poll sequence number. The offset is
    {"poll": n}; replay (readBetweenOffsets) re-runs the fetch, so
    exactly-once across restarts holds only for deterministic transports
    (true of any poller over a mutable upstream — downstream dedup by
    (poll, ticker) is the usual guard, and streaming/dedup.py provides
    it)."""

    def __init__(self, options: dict) -> None:
        self.options = options

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def _poll(self, poll: int):
        transport = resolve_transport(self.options)
        opts = _lower(self.options)
        tickers = list(dict.fromkeys(
            t.strip().upper() for t in opts.get("tickers", "").split(",")
            if t.strip()))
        for t in tickers:
            code: int | None
            try:
                code, body = transport(t)
            except Exception:  # noqa: BLE001 — transport failures are rows
                code, body = None, None
            err = classify(code, body)
            yield (poll, t, code, err, body if err is None else None)

    def read(self, start: dict):
        return iter(list(self._poll(start["poll"]))), \
            {"poll": start["poll"] + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for poll in range(start["poll"], end["poll"]):
            yield from self._poll(poll)


class StockFetchStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "stock_fetch_stream"

    def schema(self) -> str:
        return "poll long, " + FETCH_DDL

    def simpleStreamReader(self, schema) -> StockFetchStreamReader:  # noqa: ARG002
        return StockFetchStreamReader(self.options)
