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

import math
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


def value_bucket(value_col: str, bins: int = 10,
                 hi: float = 600.0) -> Column:
    """Fixed-width value bucket over [0, hi], top bucket catching
    overflow — THE binning shared by :func:`psi_drift`,
    :func:`daily_value_histogram` and the streaming twin
    (streaming/events.py): the batch/streaming parity contract and the
    DuckDB oracles all assume this one expression, so it lives in one
    place."""
    width = hi / bins
    return F.least(F.lit(bins - 1),
                   F.floor(F.col(value_col) / width)).cast("int")


def psi_drift(events: DataFrame, bins: int = 10, hi: float = 600.0,
              threshold: float = 0.2, value_col: str = "value",
              key_col: str = "event_type",
              ts_col: str = "ts") -> DataFrame:
    """Population Stability Index per key between the first and second
    half of the timeline — the standard ML-monitoring drift score for a
    feature distribution (PSI > 0.2 is the conventional "investigate"
    threshold).

    Values land in ``bins`` fixed-width buckets over [0, hi] (top
    bucket catches overflow); the split point is the integer-microsecond
    midpoint of the observed time range. Laplace-smoothed proportions
    ((c+1)/(n+bins)) keep empty buckets finite without a dense-grid
    join — every (key, bucket) present in EITHER half contributes, and
    absent-in-both buckets contribute exactly 0 under smoothing only
    through the denominator, which the (c=0) terms of neither side can
    reach; so the score is computed over the union of observed buckets
    plus nothing else, deterministically. All counts are exact integers;
    the final Σ over ≤ ``bins`` float terms is rounded to 6 dp.

    Shape at 100 TB: one scalar min/max agg (broadcast), one
    map-side-combinable count per (key, half, bucket), then key-scale
    arithmetic. Nothing scales past the bucket table."""
    eus = F.unix_micros(F.col(ts_col))
    bounds = events.agg(F.min(eus).alias("_mn"), F.max(eus).alias("_mx"))
    bucket = value_bucket(value_col, bins, hi)
    marked = (events.crossJoin(F.broadcast(bounds))
              .select(F.col(key_col), bucket.alias("bucket"),
                      (eus >= (F.col("_mn") + F.col("_mx")) / 2)
                      .alias("second_half")))
    cnt = (marked.groupBy(key_col, "bucket")
           .agg(F.sum(F.when(~F.col("second_half"), 1).otherwise(0))
                .alias("c0"),
                F.sum(F.when(F.col("second_half"), 1).otherwise(0))
                .alias("c1")))
    tot = (cnt.groupBy(key_col)
           .agg(F.sum("c0").alias("n0"), F.sum("c1").alias("n1")))
    j = cnt.join(tot, key_col)
    p0 = (F.col("c0") + 1) / (F.col("n0") + bins)
    p1 = (F.col("c1") + 1) / (F.col("n1") + bins)
    term = (p1 - p0) * F.log(p1 / p0)
    out = (j.groupBy(key_col)
           .agg(F.max("n0").alias("n_first"),
                F.max("n1").alias("n_second"),
                F.round(F.sum(term), 6).alias("psi")))
    return (out.select(key_col, "n_first", "n_second", "psi",
                       (F.col("psi") > threshold).alias("drifted"))
            .orderBy(key_col))


def daily_value_histogram(events: DataFrame, bins: int = 10,
                          hi: float = 600.0,
                          value_col: str = "value",
                          ts_col: str = "ts") -> DataFrame:
    """Per-day fixed-width value histogram — the batch twin of the
    streaming windowed histogram (streaming/events.py:
    streaming_daily_value_histogram); both feed
    :func:`psi_from_daily_histogram`. Binning shared structurally via
    :func:`value_bucket`."""
    bucket = value_bucket(value_col, bins, hi)
    return (events.groupBy(F.date_trunc("day", F.col(ts_col))
                           .alias("day"), bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("c")))


def psi_from_daily_histogram(h: DataFrame, bins: int = 10,
                             threshold: float = 0.2) -> DataFrame:
    """Per-day Population Stability Index against the FIRST day's
    distribution, from a (day, bucket, c) histogram — the
    drift-monitor readout over a streaming sink: the expensive pass
    (the per-day histogram) is the streaming aggregation; this
    post-processing is matrix-sized arithmetic a monitor runs on the
    drained table.

    Dense-grid smoothing: every day is filled to the full
    ``bins``-bucket support and every bucket contributes a
    Laplace-smoothed term ((c+1)/(n+bins)) — deterministic with no
    union-of-observed bookkeeping (contrast :func:`psi_drift`'s
    sparse variant; both are standard). Each term is quantized to the
    1e-9 grid as BIGINT before the per-day sum (ln on rationals never
    sits on grid boundaries — the perplexity precedent), so the
    reported psi is exact S/1e9 and the threshold boolean is a
    function of the emitted value. Everything after the histogram is
    O(days × bins).
    """
    # pin_cut, not pin (round 12): dense is re-referenced four times
    # (tot, ref, j twice-nested) and the analyzed tree reached 924
    # nodes / 32 scalar BNLJs in the round-12 audit; as parquet leaves
    # the readout plan is days*bins-sized arithmetic, as documented.
    from .pinned import pin_cut
    spark = h.sparkSession
    days = h.select("day").distinct()
    grid = days.crossJoin(F.broadcast(
        spark.range(bins).select(F.col("id").cast("int").alias("bucket"))))
    dense = pin_cut(grid.join(h, ["day", "bucket"], "left")
                    .select("day", "bucket",
                            F.coalesce(F.col("c"), F.lit(0)).cast("long")
                            .alias("c")))
    tot = pin_cut(dense.groupBy("day")
                  .agg(F.sum("c").cast("long").alias("n")))
    rday = tot.agg(F.min("day").alias("rday"))
    ref = (dense.join(tot, "day")
           .join(F.broadcast(rday), F.col("day") == F.col("rday"))
           .select("bucket", F.col("c").alias("cr"),
                   F.col("n").alias("nr")))
    j = dense.join(tot, "day").join(F.broadcast(ref), "bucket")
    pd_ = (F.col("c") + 1) / (F.col("n") + F.lit(float(bins)))
    pr_ = (F.col("cr") + 1) / (F.col("nr") + F.lit(float(bins)))
    term9 = F.round(F.lit(1e9) * ((pd_ - pr_) * F.log(pd_ / pr_)), 0) \
        .cast("long")
    s = (j.groupBy("day")
         .agg(F.max("n").cast("long").alias("n_events"),
              F.sum(term9).cast("long").alias("s9")))
    psi = F.col("s9") / 1e9
    return (s.select("day", "n_events", psi.alias("psi"),
                     (psi > F.lit(threshold)).alias("drifted"))
            .orderBy("day"))


def referential_orphan_census(
        relations: list[tuple[str, DataFrame, str, DataFrame, str]]
) -> DataFrame:
    """Referential-integrity orphan census across a whole schema: one
    row per FK relationship — (relationship, n_child_rows, n_null_keys,
    n_orphans, orphan_pct). The cross-table companion of
    :func:`dq_check`'s single-table ``RefRule``: run it on every FK of
    the warehouse at once and alert on any n_orphans > 0 (the
    reference enforces FKs in Postgres DDL —
    services/api/models.py:144-160 Stock.sector/exchange SET_NULL,
    models.py:327-342 run FKs — this is the engine-side audit for data
    already landed in the lake, where nothing enforces them).

    ``relations`` rows are (name, child_df, fk_col, parent_df, pk_col).
    A NULL FK is a "no reference", never an orphan (SET_NULL parity) —
    counted separately in n_null_keys. Per relation: one left-anti join
    of the non-null FK projection against the broadcast parent key set
    plus one count aggregate — parent key sets are dimension-sized by
    construction (they are the primary keys being referenced), so the
    anti-join never shuffles the child table at any scale. orphan_pct
    is the only float: one division of exact counts at emit, over
    non-null rows, NULL when there are none.
    """
    parts: list[DataFrame] = []
    for name, child, fk, parent, pk in relations:
        base = child.select(F.col(fk).alias("_k"))
        keys = parent.select(F.col(pk).alias("_k")).distinct()
        nn = base.filter(F.col("_k").isNotNull())
        orphans = nn.join(F.broadcast(keys), "_k", "left_anti")
        counts = (base.agg(
            F.count(F.lit(1)).cast("long").alias("n_child_rows"),
            F.sum(F.when(F.col("_k").isNull(), 1).otherwise(0))
            .cast("long").alias("n_null_keys"))
            .crossJoin(orphans.agg(  # 1-row scalar join
                F.count(F.lit(1)).cast("long").alias("n_orphans"))))
        parts.append(counts.select(
            F.lit(name).alias("relationship"),
            "n_child_rows", "n_null_keys", "n_orphans",
            F.when(F.col("n_child_rows") > F.col("n_null_keys"),
                   F.round(100.0 * F.col("n_orphans")
                           / (F.col("n_child_rows")
                              - F.col("n_null_keys")), 6))
            .alias("orphan_pct")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("relationship")


SRM_CHI2_MILLI_95 = 3841  # 3.841 = chi-square 95% critical value, df=1


def srm_check(events: DataFrame, user_col: str = "user_id",
              unit_col: str = "event_type") -> DataFrame:
    """Sample-ratio-mismatch check per experiment unit: each distinct
    user is deterministically assigned to arm 0/1 by md5 parity (the
    engine-portable bucketing of corpus.sample_bucket — an assignment
    never changes across runs/engines), and the observed split is
    tested against the designed 50/50 with the one-df chi-square
    statistic chi2 = (n0 − n1)² / (n0 + n1). An SRM flag is the
    standard pre-gate before reading ANY experiment metric (a skewed
    split means broken assignment/logging, invalidating downstream
    CUPED/t-tests — events_ab_test_cuped's companion).

    Exactness: counts are integers; the flag is the pure-integer
    comparison 1000·(n0 − n1)² > 3841·n — no float decides it (chi2
    itself is emitted as one double division of exact integers).
    Headroom: 1000·(n0−n1)² needs |n0−n1| ≤ ~3e6 distinct users per
    unit at int64 — far beyond any real SRM (which alerts at ~2σ);
    beyond that ANSI raises rather than wrapping. Two aggregates
    (distinct users per unit×arm, then per unit), nothing wider than
    the unit×arm matrix after the dedup.
    """
    from .corpus import sample_bucket

    ua = (events.select(F.col(unit_col).alias("unit"),
                        F.col(user_col).alias("u"))
          .filter(F.col("u").isNotNull()).distinct()
          .select("unit", "u",
                  (sample_bucket(F.col("u")) % 2).alias("arm")))
    g = (ua.groupBy("unit")
         .agg(F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
              .cast("long").alias("n_arm0"),
              F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
              .cast("long").alias("n_arm1")))
    d = F.col("n_arm0") - F.col("n_arm1")
    n = F.col("n_arm0") + F.col("n_arm1")
    chi2 = F.when(n > 0, (d * d).cast("double") / n.cast("double"))
    flag = (F.lit(1000) * d * d) > (F.lit(SRM_CHI2_MILLI_95) * n)
    return (g.select("unit", "n_arm0", "n_arm1",
                     chi2.alias("chi2"), flag.alias("srm_flag"))
            .orderBy("unit"))


def benford_chi2_cells(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-digit audit of a positive money column with
    PER-CELL chi-square contributions — the goodness-of-fit refinement
    of ``analytics.benford_first_digit`` (which emits observed-vs-
    expected deviations over the digits that occur): this variant
    zero-fills all nine digits via a broadcast domain grid (the
    dow×hour precedent) and adds each digit's (obs − n·p)²/(n·p) term.
    Per-digit rows on purpose: the total chi-square would be a 9-term
    float sum whose value an auditor can fold in any order downstream,
    while each contribution here is a deterministic expression of the
    exact integer counts and the shared ``analytics.BENFORD_EXPECTED``
    literals (ONE constant table for both operators and both oracles).

    Digit extraction is integer-exact and positive-only: the value is
    quantized to cents (2-dp money) and non-positive amounts are
    dropped BEFORE the leading digit is read off the decimal string —
    reading first would feed '-' to an ANSI cast and crash the audit
    on exactly the malformed rows it exists to screen (the analytics
    operator's documented rule, mirrored in the oracle's WHERE).
    One digit-keyed aggregate + one 1-row total broadcast.
    """
    from .analytics import BENFORD_EXPECTED

    spark = df.sparkSession
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    digit = F.substring(F.col("_cents").cast("string"), 1, 1) \
        .cast("long")
    base = (df.select(cents.alias("_cents"))
            .filter(F.col("_cents") > 0)
            .select(digit.alias("digit")))
    g = base.groupBy("digit").agg(F.count(F.lit(1)).cast("long")
                                  .alias("n_obs"))
    return benford_cells_from_counts(spark, g)


def benford_cells_from_counts(spark, g: DataFrame) -> DataFrame:
    """Zero-fill + expectation + chi-square emit over a prepared
    (digit, n_obs) relation — the shared tail of
    :func:`benford_chi2_cells`, split out so the STREAMING twin can
    drain its per-digit streaming aggregate into the identical
    arithmetic (the srm_check reuse pattern: the batch and streaming
    queries must differ only in how the counts were produced)."""
    from .analytics import BENFORD_EXPECTED

    dom = spark.createDataFrame([(d,) for d in range(1, 10)],
                                "digit long")
    filled = (dom.join(g, "digit", "left")
              .select("digit", F.coalesce(F.col("n_obs"), F.lit(0))
                      .cast("long").alias("n_obs")))
    tot = filled.agg(F.sum("n_obs").cast("long").alias("n"))
    j = filled.crossJoin(F.broadcast(tot))  # 1-row scalar join
    p = F.element_at(
        F.array(*[F.lit(BENFORD_EXPECTED[d]) for d in range(1, 10)]),
        F.col("digit").cast("int"))
    nd = F.col("n").cast("double")
    od = F.col("n_obs").cast("double")
    dev = od - nd * p
    contrib = F.when(F.col("n") > 0, dev * dev / (nd * p))
    return (j.select("digit", "n_obs",
                     F.when(F.col("n") > 0, od / nd).alias("obs_pct"),
                     p.alias("expected_pct"),
                     contrib.alias("chi2_term"))
            .orderBy("digit"))


def column_profile_drift(df: DataFrame, ts_col: str,
                         cols: list[str]) -> DataFrame:
    """Schema-health drift between the first and second half of the
    timeline, per column: row counts, null rates, and exact distinct
    counts — the "did an upstream producer start dropping/defaulting a
    field" monitor that catches breakage BEFORE value-distribution
    drift (:func:`psi_drift`) can see it.

    One pass for the null/count side (every column is two conditional
    sums in a single aggregate, map-side combinable) plus one
    conditional count-distinct pair per column in the same aggregate;
    the split point is the integer-microsecond midpoint of the
    observed range (the psi_drift convention, broadcast). Output one
    row per column: (column, n_first, n_second, null_pct_first,
    null_pct_second, null_pct_delta, distinct_first, distinct_second)
    — every pct is a single division of exact integers and the delta
    is the difference of the two identically-computed doubles.
    """
    eus = F.unix_micros(F.col(ts_col))
    bounds = df.agg(F.min(eus).alias("_mn"), F.max(eus).alias("_mx"))
    half = (eus >= (F.col("_mn") + F.col("_mx")) / 2)
    m = df.crossJoin(F.broadcast(bounds)).withColumn("_h", half)
    aggs = [F.sum(F.when(~F.col("_h"), 1).otherwise(0)).cast("long")
            .alias("n_first"),
            F.sum(F.when(F.col("_h"), 1).otherwise(0)).cast("long")
            .alias("n_second")]
    for c in cols:
        aggs += [
            F.sum(F.when(~F.col("_h") & F.col(c).isNull(), 1)
                  .otherwise(0)).cast("long").alias(f"{c}__nul1"),
            F.sum(F.when(F.col("_h") & F.col(c).isNull(), 1)
                  .otherwise(0)).cast("long").alias(f"{c}__nul2"),
            F.countDistinct(F.when(~F.col("_h"), F.col(c)))
            .cast("long").alias(f"{c}__dst1"),
            F.countDistinct(F.when(F.col("_h"), F.col(c)))
            .cast("long").alias(f"{c}__dst2")]
    wide = m.agg(*aggs)
    parts = []
    for c in cols:
        p1 = F.col(f"{c}__nul1").cast("double") / F.col("n_first").cast("double")
        p2 = F.col(f"{c}__nul2").cast("double") / F.col("n_second").cast("double")
        parts.append(wide.select(
            F.lit(c).alias("column"), "n_first", "n_second",
            F.when(F.col("n_first") > 0, p1).alias("null_pct_first"),
            F.when(F.col("n_second") > 0, p2).alias("null_pct_second"),
            F.when((F.col("n_first") > 0) & (F.col("n_second") > 0),
                   p2 - p1).alias("null_pct_delta"),
            F.col(f"{c}__dst1").alias("distinct_first"),
            F.col(f"{c}__dst2").alias("distinct_second")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("column")


def contingency_chi2(df: DataFrame, row_col: str,
                     col_col: str) -> DataFrame:
    """Two-way independence audit: the full contingency table of two
    categorical columns with per-cell expectations and chi-square
    contributions — "is order priority independent of order status",
    the categorical companion of the Benford screen. Per-cell rows on
    purpose (the Benford rule): each contribution is a deterministic
    expression of exact integer counts, while the total chi-square
    would be a float sum the auditor can fold in any order downstream.

    The grid is zero-filled via a broadcast cross join of the two
    observed margins, so absent combinations emit (n_obs = 0) rows
    with their full expected mass. expected = n_row·n_col/n is ONE
    double expression of three exact integers; the cell term is
    (n_obs − expected)²/expected. One (row, col) aggregate, two margin
    aggregates, margin-sized broadcast joins.
    """
    from .pinned import pin

    base = df.select(F.col(row_col).alias("r"), F.col(col_col).alias("c"))
    cells = base.groupBy("r", "c").agg(F.count(F.lit(1)).cast("long")
                                       .alias("n_obs"))
    rm = pin(cells.groupBy("r").agg(F.sum("n_obs").cast("long")
                                    .alias("n_row")))
    cm = pin(cells.groupBy("c").agg(F.sum("n_obs").cast("long")
                                    .alias("n_col")))
    tot = rm.agg(F.sum("n_row").cast("long").alias("n"))
    grid = (rm.crossJoin(F.broadcast(cm))
            .join(cells, ["r", "c"], "left")
            .crossJoin(F.broadcast(tot))  # 1-row scalar join
            .select("r", "c", "n_row", "n_col", "n",
                    F.coalesce(F.col("n_obs"), F.lit(0)).cast("long")
                    .alias("n_obs")))
    e = (F.col("n_row").cast("double") * F.col("n_col").cast("double")
         / F.col("n").cast("double"))
    dev = F.col("n_obs").cast("double") - e
    return (grid.select(F.col("r").alias(row_col),
                        F.col("c").alias(col_col),
                        "n_obs", "n_row", "n_col",
                        e.alias("expected"),
                        F.when(F.col("n") > 0, dev * dev / e)
                        .alias("chi2_term"))
            .orderBy(row_col, col_col))


def last_digit_uniformity(df: DataFrame, value_col: str) -> DataFrame:
    """Terminal-two-digit uniformity audit of a 2-dp money column: the
    cents-pair 00..99 of genuine prices is near-uniform, while
    fabricated or rounded-by-hand figures pile on 00/50/99 — the
    complement of the Benford FIRST-digit test (benford_chi2_cells):
    Benford catches invented magnitudes, last-digit catches invented
    precision.

    Exact: the bucket is ``round(100·v) % 100`` on integer cents; the
    zero-filled 100-bucket census is exact BIGINT counts; each χ²
    term against uniform expected n/100 simplifies to
    ``(100·obs − n)²/(100·n)`` — ONE double expression of two exact
    integers per bucket (sum the column for the full statistic, 99
    df). Output: (digits, n_obs, expected, chi2_term), all 100 rows.

    Shape at 100 TB: one hash-agg to ≤ 100 groups, a sequence-explode
    zero-fill, a 1-row total broadcast.
    """
    # ((c % 100) + 100) % 100, NOT c % 100: both engines' % is
    # dividend-signed, so a refund/credit (negative cents) would land
    # in a negative bucket the 0..99 grid drops while the total still
    # counts it — inflating every bucket's expectation (round-12
    # review finding). The double-mod canonicalizes to 0..99.
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    obs = (df.select((((cents % 100) + 100) % 100).alias("digits"))
           .filter(F.col("digits").isNotNull())
           .groupBy("digits")
           .agg(F.count(F.lit(1)).cast("long").alias("n_obs")))
    return digit_uniformity_from_counts(df.sparkSession, obs)


def digit_uniformity_from_counts(spark, obs: DataFrame) -> DataFrame:
    """Zero-fill/expectation/χ² tail of :func:`last_digit_uniformity`
    over a pre-aggregated (digits, n_obs) relation — split out so the
    streaming twin (streaming/events.streaming_digit_uniformity) can
    drain its 100-row streaming aggregate through the IDENTICAL tail
    (the benford_cells_from_counts pattern)."""
    grid = spark.range(100).select(
        F.col("id").cast("long").alias("digits"))
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    g = (grid.join(obs, "digits", "left")
         .crossJoin(F.broadcast(tot))  # 1-row scalar
         .select("digits",
                 F.coalesce(F.col("n_obs"), F.lit(0)).cast("long")
                 .alias("n_obs"), "n"))
    dev = 100.0 * F.col("n_obs").cast("double") - F.col("n").cast("double")
    return (g.select("digits", "n_obs",
                     (F.col("n").cast("double") / 100.0).alias("expected"),
                     F.when(F.col("n") > 0,
                            dev * dev / (100.0 * F.col("n").cast("double")))
                     .alias("chi2_term"))
            .orderBy("digits"))


DUP_INVOICE_WINDOW_DAYS = 7
DUP_INVOICE_REL_GAP_PCT = 1  # flag pairs within this relative gap


def near_duplicate_invoices(orders: DataFrame,
                            window_days: int = DUP_INVOICE_WINDOW_DAYS,
                            rel_gap_pct: int = DUP_INVOICE_REL_GAP_PCT
                            ) -> DataFrame:
    """Near-duplicate-invoice forensic: pairs of orders by the SAME
    customer within ``window_days`` whose amounts agree to within
    ``rel_gap_pct`` percent — the double-billing / replayed-submission
    audit every AP control suite runs (amount repeats at short range
    are far likelier fraud or system retry than coincidence on wide
    price distributions; the relative band also catches resubmissions
    with a tweaked fee line).

    Exact arithmetic: amounts are integer cents, the band test is the
    integer cross-multiplication ``(100/pct)·|Δ| ≤ min(amounts)`` (no
    float ratio), and the reported gap rides the non-negative integer
    grid ``(1e6·|Δ|) div min``. The earlier order is side A (ties by
    orderkey), so each pair appears once. Output: (o_custkey, okey_a,
    okey_b, amount_a, amount_b, days_apart, rel_gap_e6), pair-ordered.

    Shape at 100 TB: a self-equi-join on custkey with the day window
    as residual — per-bucket work is one customer's orders inside a
    week, bounded by customer activity, never by table size.
    """
    if rel_gap_pct <= 0 or 100 % rel_gap_pct != 0:
        # 100 // pct must be the EXACT reciprocal for the integer
        # cross-multiplication to encode "within pct percent" (pct=3
        # would silently test 3.03%, pct>100 would flag everything)
        raise ValueError(
            "rel_gap_pct must be a positive divisor of 100, got "
            f"{rel_gap_pct}")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    base = orders.select(F.col("o_orderkey").alias("k"),
                         F.col("o_custkey").alias("c"),
                         cents.alias("amt"),
                         F.col("o_orderdate").alias("d"))
    a, b = base.alias("a"), base.alias("b")
    days = F.datediff(F.col("b.d"), F.col("a.d"))
    earlier = (F.col("a.d") < F.col("b.d")) | (
        (F.col("a.d") == F.col("b.d")) & (F.col("a.k") < F.col("b.k")))
    gap = F.abs(F.col("a.amt") - F.col("b.amt"))
    lo = F.least(F.col("a.amt"), F.col("b.amt"))
    pairs = a.join(b, (F.col("a.c") == F.col("b.c"))
                   & earlier
                   & (days <= window_days)
                   & ((100 // rel_gap_pct) * gap <= lo))
    return (pairs.select(F.col("a.c").alias("o_custkey"),
                         F.col("a.k").alias("okey_a"),
                         F.col("b.k").alias("okey_b"),
                         (F.col("a.amt") / 100.0).alias("amount_a"),
                         (F.col("b.amt") / 100.0).alias("amount_b"),
                         days.cast("long").alias("days_apart"),
                         F.expr("(1000000 * abs(a.amt - b.amt)) div "
                                "least(a.amt, b.amt)").cast("long")
                         .alias("rel_gap_e6"))
            .orderBy("o_custkey", "okey_a", "okey_b"))


# -- Poisson bootstrap -------------------------------------------------------
#
# Chamandy-style map-reduce resampling: each row contributes a
# DETERMINISTIC hash-derived Poisson(1) weight per replicate, so B
# resamples cost one B-amplified aggregation pass and no resampled copy
# of the data ever exists. Split into partials + finalize (the
# benford_cells_from_counts pattern) so the partial aggregation can run
# as a Structured Streaming query and the finalize on its drained sink.

BOOT_REPS = 16
BOOT_PRIME = 2147483647
# Poisson(1) inverse-CDF thresholds on the 31-bit hash: weight = number
# of thresholds <= h, capping at 7 (P(X>7) ~ 1e-5). Integer thresholds
# make the comparison exact on any engine.
BOOT_THRESHOLDS = [
    int(math.floor(sum(math.exp(-1.0) / math.factorial(j)
                       for j in range(i + 1)) * BOOT_PRIME))
    for i in range(7)]


def poisson_bootstrap_partials(df: DataFrame, reps: int = BOOT_REPS,
                               key_col: str = "event_type",
                               id_col: str = "event_id",
                               cents_col: str = "cents") -> DataFrame:
    """(key, rep, s, n, c_all, cnt): per-replicate weighted integer sums.

    The replicate hash multiplier EXCEEDS the modulus so small ids wrap
    (a multiplier below p leaves h = a*id+b linear — and every weight 0 —
    for small id ranges); rep is widened before its multiply because a
    32-bit rep times a 31-bit constant overflows INTEGER under ANSI mode.
    Stateless projections + one keyed aggregation: runs unchanged as a
    streaming query (streaming.events.streaming_bootstrap_partials).
    """
    x = df.select(
        F.col(key_col), F.col(id_col), F.col(cents_col),
        F.explode(F.array(*[F.lit(i) for i in range(reps)])).alias("rep"))
    h = (F.col(id_col) * 2654435761
         + F.col("rep").cast("long") * 1103515245 + 12345) % BOOT_PRIME
    wt = None
    for t in BOOT_THRESHOLDS:
        term = F.when(F.col("h") >= t, 1).otherwise(0)
        wt = term if wt is None else wt + term
    return (x.withColumn("h", h).withColumn("wt", wt)
            .groupBy(key_col, "rep")
            .agg(F.sum(F.col("wt") * F.col(cents_col)).cast("long")
                 .alias("s"),
                 F.sum("wt").cast("long").alias("n"),
                 F.sum(cents_col).cast("long").alias("c_all"),
                 F.count(F.lit(1)).cast("long").alias("cnt")))


def bootstrap_ci_from_partials(g1: DataFrame, reps: int = BOOT_REPS,
                               key_col: str = "event_type") -> DataFrame:
    """Finalize: replicate means -> bootstrap SE -> normal CI around the
    full-sample point estimate (sum(c_all)/sum(cnt) is the original
    mean exactly — every event appears in all ``reps`` replicates, so
    the B-fold numerator and denominator cancel)."""
    m = (g1.filter(F.col("n") > 0)
         .withColumn("mr", F.col("s") / (100.0 * F.col("n"))))
    # n_events divides by b_eff (surviving replicates), NOT by reps:
    # a tiny key can draw weight 0 in some replicates and lose those
    # g1 rows to the n > 0 filter; cnt is constant across surviving
    # rows, so sum(cnt)/b_eff recovers the true count EXACTLY (an
    # exact integer — no truncate-vs-round cast divergence between
    # engines). The SE is NULL below 2 surviving replicates: the
    # (b_eff - 1) divisor would be 0 and Spark's ANSI mode turns that
    # into a query-aborting error, not a NULL.
    g2 = (m.groupBy(key_col)
          .agg((F.sum("cnt") / F.count(F.lit(1))).cast("long")
               .alias("n_events"),
               (F.sum("c_all") / (100.0 * F.sum("cnt")))
               .alias("point_mean"),
               F.count(F.lit(1)).cast("long").alias("b_eff"),
               F.sum("mr").alias("sum_m"),
               F.sum(F.col("mr") * F.col("mr")).alias("sum_m2")))
    se = F.when(F.col("b_eff") > 1, F.sqrt(F.greatest(
        (F.col("sum_m2") - F.col("sum_m") * F.col("sum_m")
         / F.col("b_eff")) / (F.col("b_eff") - 1), F.lit(0.0))))
    return (g2.select(key_col, "n_events",
                      F.round(F.col("point_mean"), 6).alias("point_mean"),
                      F.round(se, 6).alias("boot_se"),
                      F.round(F.col("point_mean") - 1.96 * se, 6)
                      .alias("ci_lo"),
                      F.round(F.col("point_mean") + 1.96 * se, 6)
                      .alias("ci_hi"))
            .orderBy(key_col))
