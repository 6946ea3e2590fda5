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

DRF parity extras (paginator.py:24-29 + CursorPagination semantics):
- opaque client-safe tokens: ``encode_cursor``/``decode_cursor`` wrap the
  value tuple in type-tagged JSON + urlsafe base64, so clients carry a
  string, never raw values; a tampered/garbled token raises
  InvalidCursorError (the reference's 404-invalid-cursor path).
- ``reverse=True`` pages strictly BEFORE the cursor (DRF's ``?cursor=r...``
  backward paging); rows still come back in the base ordering.
"""

from __future__ import annotations

import base64
import datetime
import json
from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PAGE_SIZE = 50
MAX_PAGE_SIZE = 100


class InvalidCursorError(ValueError):
    """Unparseable/tampered cursor token (reference: DRF raises NotFound)."""


def _enc_val(v: Any) -> list:
    if v is None:
        return ["z", None]
    if isinstance(v, bool):
        return ["b", v]
    if isinstance(v, int):
        return ["i", v]
    if isinstance(v, float):
        return ["f", v]
    if isinstance(v, datetime.datetime):
        return ["t", v.isoformat()]
    if isinstance(v, datetime.date):
        return ["d", v.isoformat()]
    return ["s", str(v)]


_DEC = {
    "z": lambda v: None,
    "b": bool,
    "i": int,
    "f": float,
    "t": datetime.datetime.fromisoformat,
    "d": datetime.date.fromisoformat,
    "s": str,
}


def encode_cursor(values: Sequence[Any]) -> str:
    """Opaque, urlsafe cursor token for a (order columns..., tiebreaker)
    value tuple. Type-tagged so timestamps/dates round-trip exactly."""
    raw = json.dumps([_enc_val(v) for v in values], separators=(",", ":"))
    return base64.urlsafe_b64encode(raw.encode()).decode().rstrip("=")


def decode_cursor(token: str) -> list[Any]:
    try:
        pad = "=" * (-len(token) % 4)
        raw = base64.urlsafe_b64decode((token + pad).encode())
        vals = json.loads(raw)
        return [_DEC[tag](v) for tag, v in vals]
    except Exception as exc:  # noqa: BLE001 — any malformation is one error
        raise InvalidCursorError(f"invalid cursor token: {token!r}") from exc


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
                cursor: Sequence[Any] | str | None = None,
                page_size: int = DEFAULT_PAGE_SIZE,
                reverse: bool = False) -> DataFrame:
    """One page: rows strictly after ``cursor`` in ``order``, limited.

    ``order``: [(column_name, descending)] — include a unique tiebreaker
    (e.g. the pk) as the last component, like the reference's implicit
    (created_at, id) ordering.

    ``cursor`` may be the raw value tuple or an opaque ``encode_cursor``
    token. ``reverse=True`` returns the page_size rows strictly BEFORE the
    cursor (backward paging), still emitted in the base ordering — the
    predicate and the top-K sort run in the flipped ordering, then only
    the k returned rows re-sort.
    """
    page_size = min(page_size, MAX_PAGE_SIZE)
    if isinstance(cursor, str):
        cursor = decode_cursor(cursor)
    eff = [(c, not d) for c, d in order] if reverse else list(order)
    if cursor is not None:
        df = df.filter(_after_cursor(eff, cursor))
    sort_cols = [F.col(c).desc() if d else F.col(c).asc() for c, d in eff]
    page = df.orderBy(*sort_cols).limit(page_size)
    if reverse:
        base = [F.col(c).desc() if d else F.col(c).asc() for c, d in order]
        page = page.orderBy(*base)
    return page


def page_cursor(last_row, order: Sequence[tuple[str, bool]]) -> str:
    """Opaque token for the NEXT page, from the last collected row of the
    current page (pass the first row + reverse=True to page backward)."""
    return encode_cursor([last_row[c] for c, _ in order])
