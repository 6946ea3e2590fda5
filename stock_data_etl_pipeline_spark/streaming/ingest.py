"""Continuous bronze -> silver ingest via Structured Streaming.

foreachBatch + MERGE is the canonical streaming-upsert pattern: each
micro-batch runs the same transform + merge as the batch pipeline, and the
sink executes batches serially — subsuming the reference's hard
delta-worker concurrency=1 constraint (queue_for_delta.py:21-23,
entrypoint.worker.delta.sh:20-31) without a queue.

Exactly-once: the checkpoint records which bronze files each epoch
consumed; a restarted stream skips completed epochs, and the merge itself
is idempotent on the silver key, so replays of a half-finished epoch
converge. This is the same two-layer guarantee Delta's streaming sink
gives (transaction log + idempotent txn ids).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..plans.stock_transform import transform_stock_json
from ..schemas import SILVER_KEY_COLUMNS
from ..sources.managed_table import ManagedTable

BRONZE_SCHEMA = "ticker string, run_id string, json_str string"


def stream_ingest_bronze(spark: SparkSession, bronze_dir: str,
                         silver: ManagedTable, checkpoint_dir: str,
                         available_now: bool = True) -> int:
    """Stream bronze parquet docs into the silver table. Returns the number
    of micro-batches executed this invocation.

    With ``available_now`` the stream drains everything currently in
    ``bronze_dir`` and stops (batch-like operation, the test mode); with a
    live trigger the same code tails the directory forever.
    """
    processed = {"n": 0}

    def process(batch_df, epoch_id: int) -> None:  # noqa: ANN001
        if batch_df.isEmpty():
            return
        wide = transform_stock_json(batch_df)
        silver.merge(wide, SILVER_KEY_COLUMNS)
        processed["n"] += 1

    stream = spark.readStream.schema(BRONZE_SCHEMA).parquet(bronze_dir)
    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", os.path.join(checkpoint_dir, "cp")))
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination()
    return processed["n"]
