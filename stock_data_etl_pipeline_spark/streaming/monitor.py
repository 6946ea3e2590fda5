"""Streaming data-quality monitoring: the dq_check suite attached to a
stream via foreachBatch, appending one audit row per (micro-batch,
constraint) to an audit log.

This is the continuous form of the batch audit (operators/quality.py):
each micro-batch pays the same at-most-three-pass cost over ONLY its own
rows, and the audit log becomes a time series a scheduler can alert on
(violations > 0) or trend (checked per batch = ingest volume).  The
foreachBatch boundary is the same serialization point the ingest
pipeline uses for its MERGE (streaming/ingest.py) — batch-scoped
DataFrame ops inside a streaming query, the canonical Spark shape for
sinks the streaming engine doesn't natively speak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.quality import RefRule, RowRule, UniqueRule, dq_check

AUDIT_SCHEMA = T.StructType([
    T.StructField("batch_id", T.LongType()),
    T.StructField("constraint_name", T.StringType()),
    T.StructField("violations", T.LongType()),
    T.StructField("checked", T.LongType()),
])


def streaming_dq_monitor(spark: SparkSession, src: str, checkpoint: str,
                         rules: list[RowRule | UniqueRule | RefRule],
                         audit_path: str,
                         schema: T.StructType | None = None) -> DataFrame:
    """Drain all available files from the parquet directory ``src``
    through the DQ suite; append per-batch audit rows to ``audit_path``
    and return the full audit log.

    The checkpoint makes monitoring incremental across RUNS: files
    audited once are never re-audited, so the log is append-only per
    batch — re-running on an unchanged directory adds nothing.
    """
    if schema is None:
        schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)

    def _audit(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        (dq_check(batch_df, rules)
         .withColumn("batch_id", F.lit(batch_id).cast("long"))
         .select([f.name for f in AUDIT_SCHEMA.fields])
         .write.mode("append").parquet(audit_path))

    (stream.writeStream.foreachBatch(_audit)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start().awaitTermination())
    try:
        return spark.read.schema(AUDIT_SCHEMA).parquet(audit_path)
    except Exception:  # noqa: BLE001 — no batch ever had rows
        return spark.createDataFrame([], AUDIT_SCHEMA)
