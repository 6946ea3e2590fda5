"""Join operators.

Parity targets (reference, /root/reference/):
- J1/J2 FK equi-joins via select_related (services/api/views/list_views.py:137-157;
  models.py:258,276,294) -> broadcast hash joins: the dimension side
  (stocks/exchanges/sectors ~ 20k rows) is orders of magnitude smaller than
  the fact (runs), so at 100 TB the fact never shuffles for these joins.
- J3 join-predicate filter through the FK (filters.py:131-132) -> left-semi.
- J4 null-safe composite merge key (queue_for_delta.py:736-746) -> eqNullSafe.
- J5 existence probe (list_views.py:233) -> left-semi / anti.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fk_join(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
            how: str = "left", hint_broadcast: bool = True) -> DataFrame:
    """FK equi-join with the dimension broadcast (the select_related shape).
    AQE would usually pick broadcast on its own from stats; the explicit
    hint makes the plan deterministic."""
    d = F.broadcast(dim) if hint_broadcast else dim
    return fact.join(d, fact[fact_key] == d[dim_key], how)


def semi_join(df: DataFrame, other: DataFrame, on: Column | Sequence[str]) -> DataFrame:
    """EXISTS: keep df rows with a match in other (no columns from other)."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: Column | Sequence[str]) -> DataFrame:
    """NOT EXISTS: keep df rows with no match in other."""
    return df.join(other, on, "left_anti")


def null_safe_key_condition(left: DataFrame, right: DataFrame,
                            keys: Sequence[str],
                            nullable_keys: Sequence[str] = ()) -> Column:
    """Composite-key equality with NULL = NULL on the nullable components —
    the reference's Delta MERGE predicate where metadata rows carry a null
    period_end_date (J4). eqNullSafe compiles to SQL's <=> and stays a
    hashable equi-join key, so the merge join is still a plain shuffle/
    broadcast hash join, not a nested loop."""
    cond = F.lit(True)
    for k in keys:
        cond = cond & (left[k] == right[k])
    for k in nullable_keys:
        cond = cond & left[k].eqNullSafe(right[k])
    return cond
