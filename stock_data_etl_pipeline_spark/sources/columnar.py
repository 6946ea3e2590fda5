"""Columnar file source/sink beyond parquet: ORC (and parquet through
the same door, for symmetry).

ORC ships in Spark's classpath (no extra jars), reads vectorized, and
carries the same pushdown machinery as parquet: min/max stripe stats
serve predicate pushdown, and column projection prunes stripes at the
reader.  ``read_columnar`` + a filter must therefore show
``PushedFilters`` in the scan node exactly like the parquet scans do
(asserted by test_columnar_source) — if a format choice silently drops
pushdown, a 100 TB scan becomes a full read.

Partitioned writes use directory-style partitioning
(``col=value/...``), so partition pruning on the partition column is a
file-listing operation, never a data read.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = ("orc", "parquet")


def write_columnar(df: DataFrame, path: str, fmt: str = "orc",
                   partition_by: Sequence[str] = (),
                   mode: str = "overwrite") -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported columnar format: {fmt!r}")
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_columnar(spark: SparkSession, path: str, fmt: str = "orc",
                  schema: T.StructType | None = None) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported columnar format: {fmt!r}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)
