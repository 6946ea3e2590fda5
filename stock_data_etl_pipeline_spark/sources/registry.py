"""Parquet source registry for the synthetic star schema.

Explicit schemas (no runtime inference) so the scan plan is stable and
column pruning / predicate pushdown work from the first query. At 100 TB
these tables would be directories of many files (partitioned by date for
the facts); `spark.read.parquet` handles both a single file and a
partitioned directory identically, so nothing here changes at scale.

Mirrors the reference's source surface: the control-plane tables are served
by Postgres via the ORM (reference services/api/models.py), the lake zone by
Delta scans (reference services/workers/tasks/update_stock_metadata.py:228-238);
here both become columnar scans with Catalyst pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_S = T.StructType
_F = T.StructField


def _schema(*fields: tuple[str, T.DataType]) -> T.StructType:
    return _S([_F(name, dtype, True) for name, dtype in fields])


TABLES: dict[str, T.StructType] = {
    "region": _schema(("r_regionkey", T.IntegerType()), ("r_name", T.StringType())),
    "nation": _schema(("n_nationkey", T.IntegerType()), ("n_name", T.StringType()),
                      ("n_regionkey", T.IntegerType())),
    "customer": _schema(("c_custkey", T.LongType()), ("c_name", T.StringType()),
                        ("c_nationkey", T.IntegerType()), ("c_acctbal", T.DoubleType()),
                        ("c_mktsegment", T.StringType())),
    "supplier": _schema(("s_suppkey", T.LongType()), ("s_name", T.StringType()),
                        ("s_nationkey", T.IntegerType()), ("s_acctbal", T.DoubleType())),
    "part": _schema(("p_partkey", T.LongType()), ("p_name", T.StringType()),
                    ("p_brand", T.StringType()), ("p_type", T.StringType()),
                    ("p_size", T.IntegerType()), ("p_retailprice", T.DoubleType())),
    "orders": _schema(("o_orderkey", T.LongType()), ("o_custkey", T.LongType()),
                      ("o_orderstatus", T.StringType()), ("o_totalprice", T.DoubleType()),
                      ("o_orderdate", T.TimestampType()), ("o_orderpriority", T.StringType())),
    "lineitem": _schema(("l_orderkey", T.LongType()), ("l_partkey", T.LongType()),
                        ("l_suppkey", T.LongType()), ("l_linenumber", T.IntegerType()),
                        ("l_quantity", T.DoubleType()), ("l_extendedprice", T.DoubleType()),
                        ("l_discount", T.DoubleType()), ("l_tax", T.DoubleType()),
                        ("l_returnflag", T.StringType()), ("l_linestatus", T.StringType()),
                        ("l_shipdate", T.TimestampType())),
    # events.ts storage unit VARIES across testdata generations:
    # TIMESTAMP(NANOS) (round 1) vs timestamp[us] (round 2+). load_table
    # reads the parquet footer's logical type and branches — see
    # events_ts_unit / events_schema. The entry here is the micros variant
    # (the current files); the nanos variant substitutes LongType for ts.
    "events": _schema(("event_id", T.LongType()), ("ts", T.TimestampType()),
                      ("user_id", T.LongType()), ("event_type", T.StringType()),
                      ("value", T.DoubleType()), ("props", T.StringType())),
    "documents": _schema(("doc_id", T.LongType()), ("text", T.StringType()),
                         ("lang", T.StringType()), ("source", T.StringType()),
                         ("n_chars", T.LongType())),
    "embeddings": _S([_F("vec_id", T.LongType(), True),
                      _F("embedding", T.ArrayType(T.FloatType(), True), True),
                      _F("label", T.IntegerType(), True)]),
}


# footer-derived ts unit per events file, cached so repeated load_table
# calls cost one pyarrow metadata read per distinct path (driver-side,
# a few KB — never touches row data)
_EVENTS_TS_UNIT: dict[str, str] = {}


def events_ts_unit(path: str) -> str:
    """Storage unit of events.ts from the parquet footer: 'us' | 'ns'.

    Testdata regenerations have flipped between TIMESTAMP(NANOS) and
    timestamp[us]; trusting a constant silently corrupts every event-time
    query 1000x (round-2 postmortem), so the footer is authoritative.
    Anything other than us/ns (ms, s, or a plain int64 with no logical
    type) raises — a wrong-unit default is precisely the silent
    corruption this detector exists to prevent."""
    if path not in _EVENTS_TS_UNIT:
        import glob

        import pyarrow.parquet as pq
        f = path
        if not os.path.isfile(f):
            hits = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                    recursive=True))
            if not hits:
                raise FileNotFoundError(f"no parquet files under {path}")
            f = hits[0]
        t = pq.ParquetFile(f).schema_arrow.field("ts").type
        unit = getattr(t, "unit", None)  # None for plain int64
        if unit not in ("us", "ns"):
            # ms/s (or an int64 column with unknown semantics) must fail
            # loudly: defaulting to the nanos branch would scan it as
            # long and divide by 1000 — the exact silent-1000x timeline
            # corruption this detector exists to prevent
            raise ValueError(
                f"events.ts in {f} has unsupported storage unit "
                f"{unit!r} (arrow type {t}); supported: timestamp[us], "
                f"timestamp[ns]. Extend events_schema/convert_events_ts "
                f"before loading this generation.")
        _EVENTS_TS_UNIT[path] = unit
    return _EVENTS_TS_UNIT[path]


def events_schema(unit: str) -> T.StructType:
    """Read schema for the events table given the footer ts unit.

    'us' -> native TimestampType scan (pushdown-friendly); 'ns' -> int64
    scan (Spark's parquet reader rejects TIMESTAMP(NANOS); requires the
    spark.sql.legacy.parquet.nanosAsLong conf) + convert_events_ts."""
    if unit == "us":
        return TABLES["events"]
    return _S([_F("ts", T.LongType(), True) if f.name == "ts" else f
               for f in TABLES["events"].fields])


def convert_events_ts(df: DataFrame, unit: str) -> DataFrame:
    """Normalize the scanned ts column to a proper TimestampType."""
    if unit == "us":
        return df  # already a timestamp
    from pyspark.sql import functions as F
    # integer ns -> us division (double division would lose precision
    # at 1.7e18 ns epoch values); matches DuckDB's ns -> us truncation
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table with its explicit schema."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.schema(TABLES[name]).parquet(path)
    unit = events_ts_unit(path)
    if unit == "ns":
        # defensive for sessions not built by session.get_spark (e.g. the
        # harness driver's): nanosAsLong is a runtime-settable SQL conf
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.schema(events_schema(unit)).parquet(path)
    return convert_events_ts(df, unit)


def register_views(spark: SparkSession, sf_dir: str,
                   names: list[str] | None = None) -> None:
    """Register tables as temp views for the SQL API."""
    for name in names or list(TABLES):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def footer_stats(spark, path: str, col: str):
    """COUNT/MIN/MAX of a numeric column from parquet FOOTERS only — no
    row data is ever read. This is how lakehouse metadata serves
    ``SELECT count(*), min(x), max(x)`` (Delta/Iceberg answer from file
    stats; Spark's own parquet aggregate pushdown does the same but only
    under the V2 reader, which this repo avoids session-wide for the
    ns-timestamp handling). File list is discovered driver-side (cheap:
    names only); footers are read IN PARALLEL on executors via
    mapPartitions — at 100 TB / ~100k files the footer pass is a few MB
    of reads total, vs scanning the table.

    Raises if any row group lacks min/max statistics for ``col`` (a
    stats-less file would silently corrupt the answer; writers here
    always emit stats)."""
    import glob
    import os

    from pyspark.sql import functions as F

    files = ([path] if os.path.isfile(path) else
             sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                              recursive=True)))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    fdf = (spark.createDataFrame([(f,) for f in files], "file string")
           .repartition(min(len(files), 64)))

    def read_footers(rows):
        import pyarrow.parquet as pq
        for r in rows:
            md = pq.ParquetFile(r["file"]).metadata
            n, lo, hi = md.num_rows, None, None
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                names = [rg.column(i).path_in_schema
                         for i in range(rg.num_columns)]
                st = rg.column(names.index(col)).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        f"{r['file']} row group {g}: no min/max stats "
                        f"for {col}")
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            yield (n, float(lo), float(hi))

    partials = fdf.rdd.mapPartitions(
        lambda rows: read_footers(rows)).toDF(
        "n_rows long, min_v double, max_v double")
    return partials.agg(F.sum("n_rows").alias("n_rows"),
                        F.min("min_v").alias("min_v"),
                        F.max("max_v").alias("max_v"))
