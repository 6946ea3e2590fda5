"""As-of join: for each left row, the most recent right row strictly
before it (per key).

Spark has no native as-of join; the scalable formulation is NOT a range
join (which degenerates to nested loops) but union + window:

    tag left=0 / right=1, sort per key by (ts, tag),
    carry last right payload forward (ignoreNulls),
    keep left rows.

One shuffle on the key, in-partition sort — the same cost class as any
per-key window, independent of time-range density. Tie rule: a right row
at exactly the left timestamp is NOT matched (strict <) because the left
row sorts first on the tag; pass ``strict=False`` to include ties.

(`pd.merge_asof` via applyInPandas is the alternative the PySpark guide
suggests; this version stays JVM-side and handles any column set.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              right_payload: Sequence[str],
              prefix: str = "asof_",
              strict: bool = True,
              direction: str = "backward",
              tolerance_seconds: int | None = None) -> DataFrame:
    """Left as-of join. Output: all left columns + ``prefix``-renamed
    payload columns from the matched right row (NULL when no prior row).

    ``direction='backward'`` (default) matches the most recent right row
    before the left timestamp; ``'forward'`` matches the EARLIEST right
    row after it (the tick-data "next fill" lookup) — same union+window
    shape with the frame reversed, so the cost class is identical.
    ``strict`` excludes an exactly-equal timestamp in either direction.

    ``tolerance_seconds`` bounds staleness (pd.merge_asof's tolerance):
    a match farther than the bound from the left timestamp is nulled
    out AFTER the carry — a pure projection on exact integer seconds
    (both engines truncate via unix-seconds), adding zero shuffles.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    on = list(on)
    # tag ordering controls the tie rule: a right row at the left's exact
    # timestamp is matched iff it sorts INSIDE the left row's frame —
    # before the left row for backward, after it for forward.
    if direction == "backward":
        l_tag, r_tag = (0, 1) if strict else (1, 0)
    else:
        l_tag, r_tag = (1, 0) if strict else (0, 1)
    lcols = [c for c in left.columns]
    payload = F.struct(*[F.col(c) for c in right_payload])

    l_tagged = left.select(
        *on, F.col(left_ts).alias("_ts"), F.lit(l_tag).alias("_tag"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.select(payload.alias("_p")).schema["_p"].dataType
        ).alias("_p"))
    r_tagged = right.select(
        *on, F.col(right_ts).alias("_ts"), F.lit(r_tag).alias("_tag"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("_l"))
            .schema["_l"].dataType).alias("_l"),
        payload.alias("_p"))

    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        w = (Window.partitionBy(*on).orderBy("_ts", "_tag")
             .rowsBetween(Window.unboundedPreceding, 0))
        carry = F.last("_p", ignorenulls=True)
    else:
        w = (Window.partitionBy(*on).orderBy("_ts", "_tag")
             .rowsBetween(0, Window.unboundedFollowing))
        carry = F.first("_p", ignorenulls=True)
    carried = unioned.withColumn("_match", carry.over(w))
    if tolerance_seconds is not None:
        # right ts rides the carry as exact integer seconds; the bound
        # is a projection — matches beyond it become non-matches
        rts = F.when(F.col("_p").isNotNull(),
                     F.unix_timestamp(F.col("_ts"))).alias("_rsec")
        unioned2 = unioned.withColumn("_rsec", rts)
        mt = (F.last("_rsec", ignorenulls=True)
              if direction == "backward"
              else F.first("_rsec", ignorenulls=True))
        carried = (unioned2.withColumn("_match", carry.over(w))
                   .withColumn("_msec", mt.over(w)))
        gap = F.abs(F.unix_timestamp(F.col("_ts")) - F.col("_msec"))
        carried = carried.withColumn(
            "_match",
            F.when(gap <= tolerance_seconds, F.col("_match")))
    out = carried.filter(F.col("_l").isNotNull())
    sel = [F.col(f"_l.{c}").alias(c) for c in lcols]
    sel += [F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in right_payload]
    return out.select(*sel)


def interval_join(facts: DataFrame, intervals: DataFrame,
                  on: Sequence[str], ts: str,
                  start: str, end: str,
                  payload: Sequence[str],
                  prefix: str = "iv_") -> DataFrame:
    """Point-in-interval join: each fact row matched to the interval(s)
    of its key with ``start <= ts <= end``. Output: all fact columns +
    ``prefix``-renamed interval payload (NULL when nothing contains the
    point — the join is left).

    Scale shape: an equi hash-join on the key with the range predicate as
    a residual — NOT a cross/range join, because the key carries the
    locality (per-key interval counts are bounded in the motivating uses:
    a user's sessions, a ticker's trading halts, an entity's validity
    epochs). A keyless range join degenerates to nested loops; callers
    with no key should bucket ``ts`` into coarse bins first and use the
    bin as the key (the standard binned range-join construction)."""
    on = list(on)
    # explicit aliases: intervals are routinely DERIVED from the facts
    # (sessions from events), so unqualified refs would be ambiguous
    f = facts.alias("_f")
    iv = intervals.select(
        *on, F.col(start).alias("_s"), F.col(end).alias("_e"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload]).alias("_iv")
    cond = [F.col(f"_f.{k}") == F.col(f"_iv.{k}") for k in on]
    joined = f.join(
        iv, cond + [F.col(f"_f.{ts}") >= F.col("_iv._s"),
                    F.col(f"_f.{ts}") <= F.col("_iv._e")],
        "left")
    return joined.select(
        *[F.col(f"_f.{c}") for c in facts.columns],
        *[F.col(f"{prefix}{c}") for c in payload])
