"""Per-group ranking operators (the reference's latest-run-per-stock family).

Parity targets (reference, /root/reference/):
- W1 latest run per stock: services/api/models.py:247-279
- W2 latest DONE run per stock: models.py:291-298
- W3 first-row dedup pick: services/workers/tasks/update_stock_metadata.py:247-254
- top-K per group generalizes the keyset page-1 pattern.

Scale notes: row_number over partitionBy(keys) is a single hash shuffle on
the group keys followed by an in-partition sort — the same cost profile as
the groupBy it replaces. For heavily skewed group keys AQE skew-join/
partition splitting applies; for the common "latest per key" case over an
append-ordered fact, a partition-pruned scan (date-partitioned table) keeps
the shuffle input small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(names: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in names]


def latest_per_group(df: DataFrame, keys: Sequence[str],
                     order: Sequence[str | Column],
                     rn_col: str = "_rn") -> DataFrame:
    """Keep the first row per group under ``order`` (pass desc() columns for
    'latest'). Always include a unique tie-breaker column in ``order`` for
    determinism — the reference relies on Postgres' stable pk ordering."""
    w = Window.partitionBy(*keys).orderBy(*_cols(order))
    return (df.withColumn(rn_col, F.row_number().over(w))
              .filter(F.col(rn_col) == 1).drop(rn_col))


def top_k_per_group(df: DataFrame, keys: Sequence[str],
                    order: Sequence[str | Column], k: int,
                    rank_col: str = "rank") -> DataFrame:
    """Top-K rows per group with the rank kept as ``rank_col``."""
    w = Window.partitionBy(*keys).orderBy(*_cols(order))
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= k))


def first_row_per_group(df: DataFrame, keys: Sequence[str],
                        tiebreaker: Sequence[str | Column]) -> DataFrame:
    """Arbitrary-but-deterministic single row per group (reference W3:
    'take row(0), warn if more than one')."""
    return latest_per_group(df, keys, tiebreaker)
