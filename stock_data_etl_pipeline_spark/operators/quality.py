"""Declarative data-quality constraint checking (Deequ-lite).

A constraint suite compiles to AT MOST three passes over the data,
whatever the constraint count:

- all row-level predicates (not-null, range, set-membership, regex)
  fold into ONE aggregation — each constraint is a ``sum(violates)``
  column, map-side combinable, zero extra shuffles;
- each uniqueness constraint is one groupBy on its key counting
  groups with multiplicity > 1;
- each referential constraint is one left-anti join against the
  (broadcastable) referenced key set.

Output is the long-form audit table (constraint, violations, checked) —
the shape a scheduler alerts on and a warehouse appends to a history
table.  The reference enforces its invariants in the write path
(partial unique constraint models.py:386-399, serializer validation
serializers.py:227-242); this operator is the engine-side equivalent
for data already landed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowRule:
    """Row-level constraint: ``violates`` marks the BAD rows."""
    name: str
    violates: Column


@dataclass(frozen=True)
class UniqueRule:
    """Key-uniqueness constraint: violations = rows beyond the first
    of each duplicated key (so a clean column reports 0)."""
    name: str
    cols: tuple[str, ...]


@dataclass(frozen=True)
class RefRule:
    """Referential constraint: every non-null value of ``col`` must
    exist in ``ref_df[ref_col]``."""
    name: str
    col: str
    ref_df: DataFrame
    ref_col: str


def not_null(col: str) -> RowRule:
    return RowRule(f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo: float | None = None,
             hi: float | None = None) -> RowRule:
    bad = F.lit(False)
    if lo is not None:
        bad = bad | (F.col(col) < lo)
    if hi is not None:
        bad = bad | (F.col(col) > hi)
    return RowRule(f"{col}_in_range", F.col(col).isNotNull() & bad)


def in_set(col: str, values: tuple[str, ...]) -> RowRule:
    return RowRule(f"{col}_in_set",
                   F.col(col).isNotNull() & ~F.col(col).isin(*values))


def matches(col: str, pattern: str) -> RowRule:
    return RowRule(f"{col}_matches",
                   F.col(col).isNotNull() & ~F.col(col).rlike(pattern))


def dq_check(df: DataFrame,
             rules: list[RowRule | UniqueRule | RefRule]) -> DataFrame:
    """Run the suite; one row per constraint:
    (constraint, violations: long, checked: long), constraint-ordered."""
    row_rules = [r for r in rules if isinstance(r, RowRule)]
    uniq_rules = [r for r in rules if isinstance(r, UniqueRule)]
    ref_rules = [r for r in rules if isinstance(r, RefRule)]

    parts: list[DataFrame] = []
    if row_rules:
        aggs = [F.sum(F.when(r.violates, 1).otherwise(0)).alias(r.name)
                for r in row_rules]
        wide = df.agg(*aggs, F.count(F.lit(1)).alias("_n"))
        # unpivot the 1-row wide result to the long audit shape
        stack = ", ".join(f"'{r.name}', {r.name}" for r in row_rules)
        parts.append(wide.select(
            F.expr(f"stack({len(row_rules)}, {stack}) "
                   "AS (constraint_name, violations)"), F.col("_n")
        ).select("constraint_name", F.col("violations").cast("long"),
                 F.col("_n").alias("checked")))
    for r in uniq_rules:
        parts.append(
            df.groupBy(*r.cols).agg(F.count(F.lit(1)).alias("_c"))
            .agg(F.lit(r.name).alias("constraint_name"),
                 F.sum(F.when(F.col("_c") > 1, F.col("_c") - 1)
                       .otherwise(0)).cast("long").alias("violations"),
                 F.sum("_c").cast("long").alias("checked")))
    for r in ref_rules:
        probe = df.select(F.col(r.col)).filter(F.col(r.col).isNotNull())
        keys = r.ref_df.select(F.col(r.ref_col).alias(r.col)).distinct()
        missing = probe.join(F.broadcast(keys), r.col, "left_anti")
        parts.append(missing.agg(
            F.lit(r.name).alias("constraint_name"),
            F.count(F.lit(1)).cast("long").alias("violations"),
            F.lit(None).cast("long").alias("checked"))
            .crossJoin(probe.agg(F.count(F.lit(1)).alias("_t")))
            .select("constraint_name", "violations",
                    F.col("_t").cast("long").alias("checked")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("constraint_name")
