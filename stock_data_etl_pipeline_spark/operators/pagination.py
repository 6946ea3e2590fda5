"""Keyset (cursor) pagination.

Parity target: DRF CursorPagination ordered -created_at, page_size 50,
max 100 (reference /root/reference/services/api/views/paginator.py:24-29).
The reference explicitly chose keyset over OFFSET so page N doesn't scan
N*page_size rows — the same argument holds 1000x harder on Spark: an
OFFSET would force a global sort + skip, while a keyset cursor is a
pushdown-able range predicate + a small top-K sort.

Cursor = the (order columns..., tiebreaker) tuple of the last row of the
previous page. The predicate is the row-wise "strictly after cursor"
lexicographic comparison.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PAGE_SIZE = 50
MAX_PAGE_SIZE = 100


def _after_cursor(order: Sequence[tuple[str, bool]], cursor: Sequence[Any]) -> Column:
    """Lexicographic 'row comes strictly after cursor' predicate.
    ``order`` is [(column, descending)]."""
    pred = F.lit(False)
    for i in range(len(order) - 1, -1, -1):
        col, desc = order[i]
        c = F.col(col)
        strict = (c < F.lit(cursor[i])) if desc else (c > F.lit(cursor[i]))
        pred = strict | ((c == F.lit(cursor[i])) & pred)
    return pred


def keyset_page(df: DataFrame, order: Sequence[tuple[str, bool]],
                cursor: Sequence[Any] | None = None,
                page_size: int = DEFAULT_PAGE_SIZE) -> DataFrame:
    """One page: rows strictly after ``cursor`` in ``order``, limited.

    ``order``: [(column_name, descending)] — include a unique tiebreaker
    (e.g. the pk) as the last component, like the reference's implicit
    (created_at, id) ordering.
    """
    page_size = min(page_size, MAX_PAGE_SIZE)
    if cursor is not None:
        df = df.filter(_after_cursor(order, cursor))
    sort_cols = [F.col(c).desc() if d else F.col(c).asc() for c, d in order]
    return df.orderBy(*sort_cols).limit(page_size)
