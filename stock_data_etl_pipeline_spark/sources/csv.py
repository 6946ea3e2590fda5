"""CSV source/sink — the lowest-common-denominator interchange format
every upstream system can emit (exports, vendor feeds, spreadsheet
dumps).

Spark-native: ``spark.read.csv`` with an EXPLICIT schema (no inference
pass over 100 TB) in PERMISSIVE mode, malformed rows captured into a
corrupt-record column and routed to a quarantine relation — the same
validate-don't-crash policy as the JSONL source (reference S4 parity:
invalid rows fail their own run, the batch proceeds,
services/workers/tasks/queue_for_delta.py:463-470).

At scale: uncompressed/bzip2 CSV splits by line like JSONL; gzip does
NOT split (one task per file — repack or land to parquet immediately;
``jsonl.to_parquet_documents`` is the same handoff). CSV scans carry no
column pruning or predicate pushdown, so the first hop to parquet is
mandatory before analytical reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             header: bool = True, sep: str = ",",
             ) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): schema-conforming rows, and the raw text of
    every malformed line (wrong arity, uncastable field). A row is
    quarantined, never dropped silently and never fatal."""
    full = T.StructType(list(schema.fields)
                        + [T.StructField(_CORRUPT, T.StringType(), True)])
    df = (spark.read.schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", _CORRUPT)
          .option("header", str(header).lower())
          .option("sep", sep)
          .csv(path))
    # same materialize-once split as the JSONL source: Spark disallows
    # filtering a raw scan on the corrupt column alone
    from ..operators.pinned import pin
    df = pin(df)
    good = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    bad = (df.filter(F.col(_CORRUPT).isNotNull())
           .select(F.col(_CORRUPT).alias("raw_line")))
    return good, bad


def write_csv(df: DataFrame, path: str, header: bool = True,
              sep: str = ",", mode: str = "overwrite") -> None:
    """Export a relation as CSV (the outbound interchange hop). Nested
    types are not CSV-representable — callers flatten first; Spark
    raises otherwise, which is the correct loud failure."""
    (df.write.mode(mode)
     .option("header", str(header).lower())
     .option("sep", sep)
     .csv(path))
