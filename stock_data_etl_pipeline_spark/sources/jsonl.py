"""JSONL document source — the standard interchange format for text
corpora (one JSON object per line, e.g. {"doc_id":1,"text":"..."}).

Spark-native: ``spark.read.json`` with an explicit schema (no inference
pass over 100 TB) in PERMISSIVE mode, with malformed lines captured into
a corrupt-record column and routed to a quarantine relation instead of
poisoning the load — the same validate-don't-crash policy as the
reference's raw-JSON ingestion (S4, queue_for_delta.py:463-470: invalid
documents fail their own run, the batch proceeds).

At scale: JSONL is splittable line-wise, so a directory of .jsonl files
parallelizes like parquet (minus columnar pruning — land to parquet
after the first pass; ``to_parquet_documents`` is that step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
])

_CORRUPT = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = DOCUMENTS_SCHEMA,
               ) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): schema-conforming rows, and the raw text of
    every malformed line. A line is quarantined, never dropped silently
    and never fatal."""
    full = T.StructType(list(schema.fields)
                        + [T.StructField(_CORRUPT, T.StringType(), True)])
    df = (spark.read.schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", _CORRUPT)
          .json(path))
    # Spark disallows filtering raw JSON on the corrupt column alone;
    # cache materializes the parse so both splits read the same pass
    # (registered for release at the next catalog entry point)
    from ..operators.pinned import pin
    df = pin(df)
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = (df.filter(F.col(_CORRUPT).isNotNull())
           .select(F.col(_CORRUPT).alias("raw_line")))
    return good, bad


def to_parquet_documents(docs: DataFrame, path: str) -> None:
    """Land a JSONL-sourced corpus as parquet with the derived n_chars
    column — the columnar handoff every downstream operator scans."""
    (docs.withColumn("n_chars", F.length("text").cast("long"))
     .write.mode("overwrite").parquet(path))
