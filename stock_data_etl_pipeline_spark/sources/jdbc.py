"""S9: JDBC source/sink for control-plane Postgres parity.

The reference's control plane lives in Postgres (services/api/models.py);
this engine keeps control tables in the lake, but when Postgres parity is
required `spark.read.jdbc` provides it. The wrappers validate the driver
class eagerly and raise a clear error instead of an opaque
ClassNotFoundException (no Postgres jar ships here); the full read/write/
partitioned-read/pushdown path is exercised against embedded Derby — the
JDBC engine inside the Spark distribution — in tests/test_jdbc.py.

Scale notes for real use: always pass ``partition_column/num_partitions/
lower/upper`` — an unpartitioned JDBC read is a single-task scan through
one connection; predicate pushdown works for filters on the partition
column and simple comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JdbcDriverMissingError(RuntimeError):
    pass


def _check_driver(spark: SparkSession, driver: str) -> None:
    try:
        spark._jvm.java.lang.Class.forName(driver)  # type: ignore[union-attr]
    except Exception as exc:  # noqa: BLE001
        raise JdbcDriverMissingError(
            f"JDBC driver {driver!r} not on the Spark classpath; add the "
            f"driver jar via spark.jars to use the JDBC source") from exc


def read_jdbc(spark: SparkSession, url: str, table: str,
              driver: str = "org.postgresql.Driver",
              partition_column: str | None = None,
              lower_bound: int | None = None, upper_bound: int | None = None,
              num_partitions: int = 8,
              properties: dict[str, str] | None = None) -> DataFrame:
    _check_driver(spark, driver)
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table)
              .option("driver", driver))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str,
               mode: str = "append",
               driver: str = "org.postgresql.Driver",
               properties: dict[str, str] | None = None) -> None:
    _check_driver(df.sparkSession, driver)
    writer = (df.write.format("jdbc").mode(mode)
              .option("url", url).option("dbtable", table)
              .option("driver", driver))
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
