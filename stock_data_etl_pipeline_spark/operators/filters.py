"""Declarative filter compilation: (field, lookup, value) -> Column.

The reference exposes its whole query surface as declarative filtersets
(django-filter, /root/reference/services/api/filters.py): every query param
becomes one lookup, all params are ANDed (filters.py:30,86,127-128). This
module is the Spark equivalent: a tiny lookup->Column compiler, so API-level
query specs translate to Catalyst predicates that push down to the scan.

Supported lookups (reference filters.py line refs in parens):
    exact      equality (:130,133)
    iexact     case-insensitive equality (:32,59,88-91)
    icontains  case-insensitive substring (:36-37,63-64,95-97)
    gte / lte / gt / lt   range & numeric predicates (:136-137,217-224)
    in / not_in           set membership / negation (:138-180)
    isnull     null-ness, value True/False (:223)
    rlike      regex gate (serializers.py:227-242)

All compiled predicates are plain Column expressions: they stay inside
whole-stage codegen and are eligible for parquet pushdown — at 100 TB the
filter happens in the scan, not after it.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOOKUPS = {"exact", "iexact", "icontains", "gte", "lte", "gt", "lt",
            "in", "not_in", "isnull", "rlike"}


def compile_filter(field: str, lookup: str, value: Any) -> Column:
    c = F.col(field)
    if lookup == "exact":
        return c == F.lit(value)
    if lookup == "iexact":
        return F.upper(c) == F.lit(str(value).upper())
    if lookup == "icontains":
        return F.upper(c).contains(str(value).upper())
    if lookup == "gte":
        return c >= F.lit(value)
    if lookup == "lte":
        return c <= F.lit(value)
    if lookup == "gt":
        return c > F.lit(value)
    if lookup == "lt":
        return c < F.lit(value)
    if lookup == "in":
        return c.isin(*list(value))
    if lookup == "not_in":
        return ~c.isin(*list(value))
    if lookup == "isnull":
        return c.isNull() if value else c.isNotNull()
    if lookup == "rlike":
        return c.rlike(value)
    raise ValueError(f"unknown lookup {lookup!r}; known: {sorted(_LOOKUPS)}")


def apply_filters(df: DataFrame,
                  spec: Iterable[tuple[str, str, Any]] | Mapping[str, Any]) -> DataFrame:
    """AND-combine a filter spec, mirroring the reference's conjunctive
    composition. Mapping keys use ``field__lookup`` syntax (django-style);
    a bare ``field`` means ``exact``."""
    if isinstance(spec, Mapping):
        triples = []
        for key, value in spec.items():
            field, sep, lookup = key.partition("__")
            triples.append((field, lookup if sep else "exact", value))
    else:
        triples = list(spec)
    for field, lookup, value in triples:
        df = df.filter(compile_filter(field, lookup, value))
    return df
