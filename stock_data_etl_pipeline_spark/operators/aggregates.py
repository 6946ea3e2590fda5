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

from pyspark.sql import DataFrame, SparkSession, Window
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


def exact_quantiles_by_rank(df: DataFrame, value_col: str,
                            grid: int = 100) -> DataFrame:
    """EXACT p50/p90/p99 of a numeric column without a global sort —
    the order-statistic dual of ``approx_percentile``, for the audits
    where "approximately the p99" is not an answer (SLA cutoffs,
    labeling thresholds).

    The trick that makes exactness scale: quantize to the data's own
    ``1/grid`` value grid and aggregate COUNTS PER DISTINCT VALUE
    first — the working set collapses from |rows| to |distinct
    values| (bounded by the grid span, independent of row count) —
    then take a prefix sum of the counts in value order via
    ``distributed_running_total`` (no single-partition WindowExec) and
    pick the smallest value whose cumulative count reaches the integer
    target rank ``ceil(p·N)`` (lower quantile_disc semantics). Ranks
    are computed with integer ``div`` arithmetic so both engines agree
    exactly; the /grid re-scale is the single IEEE division at emit.

    One hash-agg + one range shuffle + a 1-row broadcast scalar join.
    """
    from .windows import distributed_running_total
    v = (df.select(F.round(F.col(value_col) * grid, 0)
                   .cast("long").alias("v"))
         .filter(F.col("v").isNotNull()))
    counts = v.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    run = distributed_running_total(counts, [F.col("v")], "cnt",
                                    out="cum")
    n = counts.agg(F.sum("cnt").cast("long").alias("n_values"))
    withn = run.crossJoin(F.broadcast(n))  # 1-row scalar join
    rk = lambda num, den: F.expr(  # noqa: E731 — ceil(num·N/den) exactly
        f"({num} * n_values + {den} - 1) div {den}")
    pick = lambda r: F.round(  # noqa: E731
        F.min(F.when(F.col("cum") >= r, F.col("v"))) / grid, 2)
    return (withn.agg(
        F.min("n_values").alias("n_values"),  # constant per row: exact
        pick(rk(1, 2)).alias("q50"),
        pick(rk(9, 10)).alias("q90"),
        pick(rk(99, 100)).alias("q99"))
        # empty input: a global agg still emits one all-NULL row while
        # a GROUP BY (the oracle shape) emits none — align on none
        .filter(F.col("n_values").isNotNull()))


def grouped_exact_quantiles(df: DataFrame, group_col: str,
                            value_col: str) -> DataFrame:
    """EXACT per-group p50/p90/p99 of an INTEGER column without a
    per-group sort task — the grouped twin of
    :func:`exact_quantiles_by_rank`, for the "hot group" regime where
    a plain rank window would pull one group's whole history through a
    single task (few groups ⟹ the per-group partition IS the table).

    Same collapse: counts per (group, value) first — the working set
    becomes |group × distinct value|, independent of row count — then
    a per-group prefix sum over the value order via
    ``grouped_running_total`` (range-partitioned on (group, value), so
    a hot group spans many partitions) and the pick is the smallest
    value whose cumulative count reaches ``ceil(p·n_g)``. Group totals
    ride a broadcast join (groups are bounded). All output values are
    exact integers — no division anywhere.
    """
    v = (df.select(F.col(group_col).alias("g"),
                   F.col(value_col).cast("long").alias("v"))
         .filter(F.col("v").isNotNull()))
    counts = v.groupBy("g", "v").agg(F.count(F.lit(1)).alias("cnt"))
    return (_grouped_quantiles_from_counts(counts)
            .withColumnRenamed("g", group_col))


def _grouped_quantiles_from_counts(counts: DataFrame,
                                   bounded_domain: bool = False
                                   ) -> DataFrame:
    """Per-group exact p50/p90/p99 from a WEIGHTED value-count table
    (g, v, cnt) — the shared kernel of :func:`grouped_exact_quantiles`
    and :func:`robust_outlier_profile`, factored so a caller that
    already holds (or pins) the pre-aggregated counts pays no second
    scan of the underlying rows. Output: (g, n_rows, q50, q90, q99).

    ``bounded_domain=True`` asserts the VALUE DOMAIN (not the row
    count) bounds each group's slice of the count table — e.g. a
    cents-grid price column has ≤ ~10⁵ distinct values per group no
    matter how many events exist. Then a plain per-group running
    window over the counts IS scale-safe (the partition is
    domain-sized), and it replaces the distributed prefix-sum
    kernel's eager checkpoint + driver offset collect with one
    window sort — the right trade exactly when the domain cap holds.
    Leave False for unbounded-domain integers (timestamps, lags),
    where a hot group's distinct values grow with the data."""
    if bounded_domain:
        wrun = (Window.partitionBy("g").orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0))
        wall = Window.partitionBy("g")
        j = counts.select(
            "g", "v",
            F.sum("cnt").over(wrun).cast("long").alias("cum"),
            F.sum("cnt").over(wall).cast("long").alias("n_rows"))
    else:
        from .windows import grouped_running_total
        run = grouped_running_total(counts, ["g"], [F.col("v")], "cnt",
                                    out="cum")
        n = (counts.groupBy("g")
             .agg(F.sum("cnt").cast("long").alias("n_rows")))
        j = run.join(F.broadcast(n), "g")
    rk = lambda num, den: F.expr(  # noqa: E731 — ceil(num·n/den) exactly
        f"({num} * n_rows + {den} - 1) div {den}")
    pick = lambda r: F.min(F.when(F.col("cum") >= r, F.col("v")))  # noqa: E731
    return (j.groupBy("g")
            .agg(F.min("n_rows").alias("n_rows"),
                 pick(rk(1, 2)).alias("q50"),
                 pick(rk(9, 10)).alias("q90"),
                 pick(rk(99, 100)).alias("q99")))


def robust_outlier_profile(df: DataFrame, group_col: str,
                           value_col: str, k: int = 3,
                           bounded_domain: bool = False) -> DataFrame:
    """Median/MAD robust outlier census per group: flag rows whose
    absolute deviation from the group median exceeds ``k``·MAD — the
    z-score's heavy-tail-safe cousin, composed from TWO passes of
    :func:`grouped_exact_quantiles` (median of the values, then median
    of the absolute deviations), so no per-group sort task exists even
    for a hot group.

    Everything is exact integers: medians are order statistics of an
    integer column, deviations are integer |v − med|, the outlier flag
    is the integer comparison ad > k·mad, and the emitted rate is the
    exact quotient ``(1e6·n_out) div n`` — one division by 1e6. The
    per-group median/MAD frames are broadcast (group cardinality is
    bounded by construction of the caller's group key).

    One scan of ``df`` total: the whole profile is a function of the
    (g, v, cnt) value-count table, which is pinned and reused by the
    median pass, the deviation re-count, the MAD pass, AND the final
    census (weighted by cnt) — the r7 shape re-read the input rows for
    each of the two quantile passes plus the census.
    """
    from .pinned import pin
    v = (df.select(F.col(group_col).alias("g"),
                   F.col(value_col).cast("long").alias("v"))
         .filter(F.col("v").isNotNull()))
    vc = v.groupBy("g", "v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    if bounded_domain:
        # One g-keyed repartition of the DOMAIN-BOUNDED count table
        # (|g x v| rows, never row-scale) lets every downstream stage
        # — the median window, the deviation re-count groupBy(g, ad),
        # the MAD window and the final census groupBy(g) — reuse the
        # partitioning via the subset rule instead of each planning
        # its own exchange (round-14, guide §2.4 "two operations keyed
        # the same way can share one exchange"). The row-scale shuffle
        # above keeps its (g, v) key for map-side combining; only the
        # tiny combined table moves again.
        vc = vc.repartition("g")
    vc = pin(vc)
    med = (_grouped_quantiles_from_counts(vc, bounded_domain)
           .select("g", F.col("q50").alias("med")))
    dev = (vc.join(F.broadcast(med), "g")
           .withColumn("ad", F.abs(F.col("v") - F.col("med"))))
    # merge distinct values that land on the same deviation before the
    # prefix sum (|v - med| is 2-to-1 around the median)
    devc = (dev.groupBy("g", F.col("ad").alias("v"))
            .agg(F.sum("cnt").cast("long").alias("cnt")))
    mad = (_grouped_quantiles_from_counts(devc, bounded_domain)
           .select("g", F.col("q50").alias("mad")))
    j = dev.join(F.broadcast(mad), "g")
    out = (j.groupBy("g")
           .agg(F.sum("cnt").cast("long").alias("n"),
                F.min("med").cast("long").alias("med"),
                F.min("mad").cast("long").alias("mad"),
                F.sum(F.when(F.col("ad") > k * F.col("mad"),
                             F.col("cnt")).otherwise(F.lit(0)))
                .cast("long").alias("n_outliers")))
    rate = F.expr("(1000000 * n_outliers) div n") / 1e6
    return (out.select(F.col("g").alias(group_col), "n", "med", "mad",
                       "n_outliers", rate.alias("outlier_rate"))
            .orderBy(group_col))


def one_way_anova(df: DataFrame, group_col: str,
                  value_col: str) -> DataFrame:
    """One-way ANOVA F-statistic for an INTEGER response across groups
    — "do the group means differ more than chance?" for lead times,
    latencies, scores.

    Sum decomposition on the integer value² grid: with per-group
    (n_g, s_g) and global (n, S, Σy²) all exact BIGINTs, the
    between-group sum rides ``Σ_g (s_g² div n_g)`` and the correction
    term ``S² div n`` — integer quotients (truncation loses < 1 unit²
    per group, and the SAME definition runs on both engines), so
    SSB/SSW are exact integers and F is ONE fixed-association IEEE
    expression over them, emitted unrounded. Headroom: s_g² ≲ 3.6e13
    at sf0.1 lead times; re-grid past |Σy| ≈ 3e9. Output: one row
    (k_groups, n, ssb, ssw, f_stat); F is NULL when SSW = 0 or
    degrees of freedom vanish.

    Scale: one hash-agg per group + one 5-row rollup — nothing wider
    than |groups| after the first aggregate.
    """
    v = (df.select(F.col(group_col).alias("g"),
                   F.col(value_col).cast("long").alias("y"))
         .filter(F.col("y").isNotNull()))
    per = (v.groupBy("g")
           .agg(F.count(F.lit(1)).cast("long").alias("ng"),
                F.sum("y").cast("long").alias("sg"),
                F.sum(F.col("y") * F.col("y")).cast("long").alias("qg")))
    g = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").cast("long").alias("n"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("qg").cast("long").alias("q"),
        F.sum(F.expr("(sg * sg) div ng")).cast("long").alias("t"))
    ssb = F.col("t") - F.expr("(s * s) div n")
    ssw = F.col("q") - F.col("t")
    f = (ssb.cast("double") / (F.col("k") - 1).cast("double")) \
        / (ssw.cast("double") / (F.col("n") - F.col("k")).cast("double"))
    return g.select(
        F.col("k").alias("k_groups"), F.col("n"),
        ssb.cast("long").alias("ssb"), ssw.cast("long").alias("ssw"),
        F.when((F.col("k") > 1) & (F.col("n") > F.col("k"))
               & (ssw > 0), f).alias("f_stat"))
