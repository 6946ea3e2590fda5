"""Custom stateful streaming via ``transformWithStateInPandas`` —
Spark 4's arbitrary-state API (the successor to
``applyInPandasWithState`` used by streaming/dedup.py).

Exemplar operator: per-symbol running tick extremes — a ValueState
holding (min_cents, max_cents, n_ticks) that folds every micro-batch's
ticks into the running snapshot and emits the updated snapshot per key
per batch. The semantics are deliberately oracle-checkable: after an
``availableNow`` drain of a static source, the LAST snapshot per key
equals the batch ``groupBy(symbol).agg(min, max, count)`` — proving the
stateful path end-to-end against the same DuckDB oracle as a batch
aggregate.

Why TWS over applyInPandasWithState: typed named state slots (value/
list/map) instead of one tuple, explicit timers, schema evolution, and
initial-state bootstrap — the API surface a production stateful
pipeline needs. Requires the RocksDB state store provider (set
per-drain below and restored after).

State size: O(|symbols|) fixed-width rows — the smallest possible
keyed state; at 100 TB the key count, not the tick count, bounds it.

ENV LIMIT (dated 2026-08-14): TWS's Python state-server protocol
imports ``google.protobuf``, which this sandbox does not ship — the
end-to-end drain raises "TransformWithStateInPySpark driver worker
exited" here and is covered by a protobuf-skip-gated integration test
(tests/test_stateful_tws.py) plus env-independent unit tests of the
processor's fold logic. The operator runs unchanged on a standard
cluster image (protobuf is a stock PySpark extra).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

EXTREMES_OUTPUT = ("event_type string, min_cents long, max_cents long, "
                   "n_ticks long")
_STATE_SCHEMA = "mn long, mx long, cnt long"

_ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")


class RunningExtremes(StatefulProcessor):
    """Fold each batch's integer-cent ticks into a per-key running
    (min, max, count) ValueState; emit the updated snapshot."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("extremes", _STATE_SCHEMA)

    def handleInputRows(self, key: tuple,
                        rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:  # noqa: N803
        mn = mx = None
        cnt = 0
        for pdf in rows:
            if len(pdf) == 0:
                continue
            c = pdf["cents"]
            lo, hi = int(c.min()), int(c.max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
            cnt += int(len(pdf))
        if cnt == 0:
            return
        if self._state.exists():
            pmn, pmx, pcnt = self._state.get()
            mn, mx, cnt = min(mn, pmn), max(mx, pmx), cnt + pcnt
        self._state.update((mn, mx, cnt))
        yield pd.DataFrame({"event_type": [key[0]], "min_cents": [mn],
                            "max_cents": [mx], "n_ticks": [cnt]})

    def close(self) -> None:
        pass


def streaming_running_extremes(spark: SparkSession,
                               events_parquet: str) -> DataFrame:
    """Drain the event ticks through the TWS running-extremes operator
    (availableNow, memory sink) and return the FINAL snapshot per
    symbol — the row with the highest n_ticks, which is monotone per
    key across batches, so the pick is deterministic regardless of how
    the drain was micro-batched.
    """
    from .events import event_stream
    stream = (event_stream(spark, events_parquet)
              .filter(F.col("value").isNotNull())
              .select("event_type",
                      F.round(F.col("value") * 100, 0).cast("long")
                      .alias("cents")))
    out = stream.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=RunningExtremes(),
        outputStructType=EXTREMES_OUTPUT,
        outputMode="Update",
        timeMode="None")
    name = f"tws_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   _ROCKSDB)
    # the checkpoint dir and the uniquely-named memory sink are
    # per-drain scratch: both are torn down before returning so a
    # long-lived session draining repeatedly doesn't accumulate disk
    # state and catalog entries. That forces materializing the snapshot
    # here — safe because it is O(|symbols|) rows (the smallest keyed
    # state), and the caller gets a plain local DataFrame.
    cp_dir = tempfile.mkdtemp(prefix="tws_cp_")
    try:
        q = (out.writeStream.outputMode("update")
             .format("memory").queryName(name)
             .option("checkpointLocation", os.path.join(cp_dir, "cp"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        snap = spark.table(name)
        from ..operators.windows import latest_per_group
        latest = (latest_per_group(snap, ["event_type"],
                                   [F.col("n_ticks").desc()])
                  .orderBy("event_type"))
        rows = latest.collect()
        schema = latest.schema
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)
        try:
            spark.catalog.dropTempView(name)
        except Exception:  # noqa: BLE001 — sink never registered if start failed
            pass
        shutil.rmtree(cp_dir, ignore_errors=True)
    return spark.createDataFrame(rows, schema)
