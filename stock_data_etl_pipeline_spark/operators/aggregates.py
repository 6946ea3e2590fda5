"""Aggregation operators.

Parity targets (reference, /root/reference/):
- A1 group-by-state count zero-filled across the full state enum:
  services/api/serializers.py:313-368 (DB-side aggregation, never in-memory:
  services/api/views/bulk_queue_runs.py:118-122)
- A2/A5 counts: trivial df.count()
- A4 distinct values: queue_for_delta.py:232,261

Scale notes: groupBy on a low-cardinality key is a partial (map-side)
aggregation followed by a tiny shuffle — the canonical cheap Spark agg.
The zero-fill join is against a literal DataFrame of the enum domain:
broadcast by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def group_count_zerofill(df: DataFrame, key: str, domain: Sequence[str],
                         count_col: str = "n") -> DataFrame:
    """Count rows per ``key`` value, zero-filling every value in ``domain``
    (including values absent from ``df``), ordered by ``key``.

    Mirrors the reference's stats serializer: all 8 states always present
    in the payload, 0 when no runs (serializers.py:354-368).
    """
    spark = df.sparkSession
    domain_df = spark.createDataFrame([(v,) for v in domain], [key])
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias(count_col))
    # left outer join can only broadcast the right (non-preserved) side;
    # counts is post-aggregation and at most |domain| distinct keys big.
    return (domain_df.join(F.broadcast(counts), key, "left")
            .na.fill({count_col: 0})
            .orderBy(key))


def profile_columns(df, cols):
    """dbt-style data-quality profile: per column, row count, null count,
    exact distinct count and min/max (stringified) — ONE pass over the
    table (all measures in a single aggregation, then the 1-row result
    explodes to a row per column; no per-column scans). countDistinct is
    the exact form; swap approx_count_distinct at 100 TB where a 2%
    estimate is fine (the sketch query shows that shape)."""
    from pyspark.sql import functions as F
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"),
                 F.countDistinct(c).alias(f"_nd_{c}"),
                 F.min(c).cast("string").alias(f"_mn_{c}"),
                 F.max(c).cast("string").alias(f"_mx_{c}")]
    row = df.agg(*aggs)
    packed = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col("_n").alias("n_rows"),
                 F.col(f"_nn_{c}").alias("n_nulls"),
                 F.col(f"_nd_{c}").alias("n_distinct"),
                 F.col(f"_mn_{c}").alias("min_s"),
                 F.col(f"_mx_{c}").alias("max_s"))
        for c in cols])
    return (row.select(F.explode(packed).alias("p")).select("p.*")
            .orderBy("column"))
