"""Catalog entries batch 3: the remaining SURVEY §2 shapes plus standard
OLAP extensions — isnull lookups, pivot, cube, set ops, exact distincts,
JSON extraction, as-of join, window frames, existence flags, percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.filters import apply_filters
from ..sources.registry import load_table
from .catalog import register


@register("filter_is_completed", """
WITH runs AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderdate END AS completed_at
  FROM orders
)
SELECT o_orderkey, completed_at FROM runs
WHERE completed_at IS NOT NULL
ORDER BY o_orderkey
""")
def filter_is_completed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P8: is_completed = completed_at IS NOT NULL (reference filters.py:223);
    # open orders model in-flight runs with a NULL completion timestamp.
    # The is-not-null filter on the DERIVED column would be a post-scan
    # CASE predicate; pre-filtering with the equivalent base-column
    # conjunction keeps the same rows and pushes to the parquet reader
    # (pinned by tests/test_plan_regression.py).
    o = load_table(spark, sf_dir, "orders")
    completed = o.filter((F.col("o_orderstatus") != "O")
                         & F.col("o_orderdate").isNotNull())
    return (completed.select(
                "o_orderkey",
                F.col("o_orderdate").alias("completed_at"))
            .orderBy("o_orderkey"))


@register("pivot_status_by_priority", """
SELECT o_orderpriority AS priority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders GROUP BY o_orderpriority ORDER BY priority
""")
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pivot: state columns per bulk-run row (the stats matrix, transposed)
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy(F.col("o_orderpriority").alias("priority"))
            .pivot("o_orderstatus", ["F", "O", "P"])
            .count()
            .na.fill(0)
            .orderBy("priority"))


@register("cube_revenue_flags", """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_extendedprice), 2) AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""")
def cube_revenue_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                    "revenue", "n")
            .orderBy("returnflag", "linestatus"))


@register("set_ops_customers", """
SELECT c_custkey FROM (
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
) ORDER BY c_custkey
""")
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.7 set operations: INTERSECT / EXCEPT across sub-queries
    o = load_table(spark, sf_dir, "orders")
    by = lambda s: (o.filter(F.col("o_orderstatus") == s)  # noqa: E731
                    .select(F.col("o_custkey").alias("c_custkey")))
    return (by("F").intersect(by("O")).exceptAll(by("P").distinct())
            .distinct().orderBy("c_custkey"))


@register("distinct_counts_by_flag", """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""")
def distinct_counts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact distinct aggregation (expand + two-phase agg under the hood);
    # approx_count_distinct is the at-scale variant but has no cross-engine
    # oracle, so the gate uses the exact form.
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("n_parts"),
                 F.countDistinct("l_suppkey").alias("n_supps"),
                 F.countDistinct("l_orderkey").alias("n_orders"))
            .orderBy("l_returnflag"))


@register("json_props_extract", """
SELECT event_type,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS k_total,
       count(*) FILTER (WHERE json_extract_string(props, '$.k')::BIGINT > 50) AS k_gt50
FROM events GROUP BY event_type ORDER BY event_type
""")
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F11/S4: JSON field extraction from a string column (the reference
    # validates/parses raw JSON payloads; props is the semi-structured tail)
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (e.groupBy("event_type")
            .agg(F.sum(k).alias("k_total"),
                 F.count(F.when(k > 50, 1)).alias("k_gt50"))
            .orderBy("event_type"))


@register("asof_purchase_last_view", """
WITH tagged AS (
  SELECT user_id, ts AS _ts, 0 AS _tag, event_id, ts,
         NULL::BIGINT AS v_id, NULL::TIMESTAMP AS v_ts
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts AS _ts, 1 AS _tag, NULL, NULL, event_id, ts
  FROM events WHERE event_type = 'view'
),
carried AS (
  SELECT user_id, _tag, event_id, ts,
         last_value(v_id IGNORE NULLS) OVER w AS view_event_id,
         last_value(v_ts IGNORE NULLS) OVER w AS view_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY _ts, _tag
               ROWS UNBOUNDED PRECEDING)
)
SELECT event_id, user_id, ts, view_event_id, view_ts
FROM carried WHERE _tag = 0
ORDER BY event_id
""")
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    # custom operator Spark lacks natively: as-of join via union+window
    # (one shuffle, no range-join nested loop). For each purchase, the
    # user's most recent strictly-earlier view.
    e = load_table(spark, sf_dir, "events")
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    views = (e.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("view_event_id"),
                     "user_id", F.col("ts").alias("view_ts")))
    return (asof_join(purchases, views, on=["user_id"],
                      left_ts="ts", right_ts="view_ts",
                      right_payload=["view_event_id", "view_ts"], prefix="")
            .orderBy("event_id"))


@register("running_totals_window", """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 2) AS running_total,
       round(avg(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS 2 PRECEDING), 3) AS moving_avg3
FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey
""")
def running_totals_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # analytic frames (rowsBetween): running totals + 3-row moving average
    o = load_table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    mov = base.rowsBetween(-2, 0)
    return (o.select("o_custkey", "o_orderkey", "o_orderdate",
                     F.round(F.sum("o_totalprice").over(run), 2).alias("running_total"),
                     F.round(F.avg("o_totalprice").over(mov), 3).alias("moving_avg3"))
            .orderBy("o_custkey", "o_orderdate", "o_orderkey"))


@register("existence_flags_by_segment", """
SELECT c_mktsegment AS segment,
       bool_or(c_acctbal < 0) AS has_debtors,
       bool_or(c_acctbal > 9000) AS has_whales,
       count(*) AS n
FROM customer GROUP BY c_mktsegment ORDER BY segment
""")
def existence_flags_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J5 existence probes as grouped boolean aggregation
    c = load_table(spark, sf_dir, "customer")
    return (c.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.bool_or(F.col("c_acctbal") < 0).alias("has_debtors"),
                 F.bool_or(F.col("c_acctbal") > 9000).alias("has_whales"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("segment"))


@register("approx_distinct_and_quantiles", """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       quantile_cont(l_extendedprice, 0.5) AS exact_median_price,
       true AS distinct_within_tol,
       true AS median_within_tol
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""")
def approx_distinct_and_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sketch outputs (HLL/KLL) are engine-specific, so raw approx values
    # can't hash-match a DuckDB oracle. Instead the query computes approx
    # AND exact in the same grouped pass and emits the exact values plus
    # deterministic within-tolerance booleans; the oracle computes the
    # exact values and literal true. The approx operators stay on the
    # executed plan (they ARE the at-scale variants — one pass, bounded
    # mergeable state), and the output is hash-stable.
    li = load_table(spark, sf_dir, "lineitem")
    tol = 0.10  # approx_count_distinct default rsd=0.05; 2x headroom
    agged = (li.groupBy("l_returnflag")
             .agg(F.countDistinct("l_partkey").alias("exact_parts"),
                  F.approx_count_distinct("l_partkey").alias("_ad"),
                  F.percentile("l_extendedprice", F.lit(0.5))
                  .alias("exact_median_price"),
                  F.percentile_approx("l_extendedprice", F.lit(0.5),
                                      F.lit(1000)).alias("_am")))
    rel = lambda a, b: F.abs(a - b) / F.greatest(F.abs(b), F.lit(1.0))  # noqa: E731
    return (agged.select(
                "l_returnflag", "exact_parts", "exact_median_price",
                (rel(F.col("_ad"), F.col("exact_parts")) <= tol)
                .alias("distinct_within_tol"),
                (rel(F.col("_am"), F.col("exact_median_price")) <= tol)
                .alias("median_within_tol"))
            .orderBy("l_returnflag"))


@register("median_price_by_status", """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""")
def median_price_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact interpolated percentiles (parity: Spark `percentile` ==
    # DuckDB quantile_cont); percentile_approx is the 100 TB variant.
    o = load_table(spark, sf_dir, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(F.round(F.percentile("o_totalprice", F.lit(0.5)), 2)
                 .alias("median_price"),
                 F.round(F.percentile("o_totalprice", F.lit(0.9)), 2)
                 .alias("p90_price"))
            .orderBy("o_orderstatus"))


@register("ntile_quartiles_by_status", """
SELECT o_orderkey, o_orderstatus,
       (ntile(4) OVER (PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey))::BIGINT AS quartile
FROM orders ORDER BY o_orderkey
""")
def ntile_quartiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    # analytic bucketing: price quartile within each status (the
    # reference's percentile-style stats endpoints as a window)
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (o.select("o_orderkey", "o_orderstatus",
                     F.ntile(4).over(w).cast("long").alias("quartile"))
            .orderBy("o_orderkey"))


@register("percent_rank_price", """
SELECT o_orderkey,
       round(percent_rank() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice), 6) AS pr
FROM orders ORDER BY o_orderkey
""")
def percent_rank_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rank-based relative standing; tie-stable by definition (equal
    # prices share a rank), rounded for float parity
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return (o.select("o_orderkey",
                     F.round(F.percent_rank().over(w), 6).alias("pr"))
            .orderBy("o_orderkey"))


@register("salted_join_revenue", """
SELECT n.n_name AS nation, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name ORDER BY nation
""")
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # skew fallback surfaced in the gate: the orders->customer join run
    # through 8-way key salting must equal the plain equi-join (the
    # oracle IS the plain join) — salting changes only the shuffle
    # distribution, never the result.
    from ..operators.skew import salted_join
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    j = salted_join(o, c, "o_custkey", salt=8)
    return (j.join(F.broadcast(n), j["c_nationkey"] == n["n_nationkey"])
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            .orderBy("nation"))


@register("gold_cached_revenue", """
SELECT n.n_name AS nation, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name ORDER BY nation
""")
def gold_cached_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # C1 in the gate: the same revenue rollup served through the gold
    # cached-view registry. Two gets must hit one build (the in-query
    # assertion fails the whole entry if the cache path broke), and the
    # cached result must still hash-match the plain SQL oracle.
    from .gold import GoldViews

    def build() -> DataFrame:
        o = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice")
        c = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey")
        n = load_table(spark, sf_dir, "nation")
        return (o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
                .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
                .groupBy(F.col("n_name").alias("nation"))
                .agg(F.count(F.lit(1)).alias("n_orders"),
                     F.round(F.sum("o_totalprice"), 2).alias("revenue"))
                .orderBy("nation"))

    gold = GoldViews()
    gold.register("rev_by_nation", build, {"ticker_views"})
    gold.get("rev_by_nation").count()      # first get: builds + caches
    out = gold.get("rev_by_nation")        # second get: must be a hit
    if gold.build_count("rev_by_nation") != 1:
        raise AssertionError("gold view rebuilt on second get — cache broken")
    return out


@register("grouping_sets_revenue", """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_extendedprice), 2) AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
ORDER BY returnflag, linestatus
""")
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # arbitrary GROUPING SETS (beyond rollup/cube's fixed lattices): the
    # (flag x status), per-status, and grand-total slices in ONE pass —
    # Expand + a single aggregation, not three scans unioned
    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupingSets([["l_returnflag", "l_linestatus"],
                             ["l_linestatus"], []],
                            "l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                    "revenue", "n")
            .orderBy("returnflag", "linestatus"))


@register("winsorize_events_value", """
WITH b AS (SELECT event_type,
                  round(quantile_cont(value, 0.05), 6) AS lo,
                  round(quantile_cont(value, 0.95), 6) AS hi
           FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, e.value,
       least(greatest(e.value, b.lo), b.hi) AS value_clipped
FROM events e JOIN b USING (event_type)
ORDER BY e.event_id
""")
def winsorize_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # percentile winsorization (outlier clipping before model features):
    # per-group p05/p95 bounds from ONE tiny aggregate, broadcast back,
    # clip as pure least/greatest codegen — the fact is scanned once and
    # never shuffles (parity: Spark percentile == DuckDB quantile_cont;
    # bounds rounded so the interpolated doubles agree across engines)
    e = load_table(spark, sf_dir, "events")
    b = (e.groupBy("event_type")
         .agg(F.round(F.percentile("value", F.lit(0.05)), 6).alias("lo"),
              F.round(F.percentile("value", F.lit(0.95)), 6).alias("hi")))
    return (e.join(F.broadcast(b), "event_type")
            .select("event_id", "event_type", "value",
                    F.least(F.greatest(F.col("value"), F.col("lo")),
                            F.col("hi")).alias("value_clipped"))
            .orderBy("event_id"))


@register("incremental_rollup_result", """
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0 THEN floor(o_totalprice) + 100
              ELSE floor(o_totalprice) END AS p
  FROM orders WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus, floor(o_totalprice)
  FROM orders WHERE o_orderkey % 11 = 0
)
SELECT o_orderstatus, count(*)::BIGINT AS n,
       sum(p)::BIGINT AS total
FROM v1 GROUP BY o_orderstatus ORDER BY o_orderstatus
""")
def incremental_rollup_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    # incremental view maintenance surfaced in the gate: the rollup is
    # NOT recomputed from v1 — it is v0's rollup folded with the change
    # feed between two ManagedTable versions (delete %7, update %5,
    # insert %11 as new keys), and must equal the oracle's direct v1
    # aggregation. Integer-valued measures keep the incremental sums
    # exact and addition-order-independent.
    import shutil
    import tempfile

    from ..operators.incremental import incremental_rollup
    from ..sources.managed_table import ManagedTable
    o = load_table(spark, sf_dir, "orders")
    base = o.select("o_orderkey", "o_orderstatus",
                    F.floor("o_totalprice").alias("p"))
    v1 = (base.filter(F.col("o_orderkey") % 7 != 0)
          .withColumn("p", F.when(F.col("o_orderkey") % 5 == 0,
                                  F.col("p") + 100).otherwise(F.col("p")))
          .unionByName(
              base.filter(F.col("o_orderkey") % 11 == 0)
              .withColumn("o_orderkey",
                          F.col("o_orderkey") + F.lit(10000000))))
    work = tempfile.mkdtemp(prefix="ivm_")
    try:
        t = ManagedTable(spark, work + "/t")
        t.create(base)
        t.overwrite(v1)
        cdf = t.diff(0, 1, keys=["o_orderkey"], include_preimage=True)
        agg0 = base.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"), F.sum("p").alias("p"))
        out = incremental_rollup(agg0, cdf, ["o_orderstatus"], ["p"])
        return (out.select("o_orderstatus", F.col("n").cast("long").alias("n"),
                           F.col("p").cast("long").alias("total"))
                .orderBy("o_orderstatus")
                .localCheckpoint())  # materialize before the table dir dies
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register("metadata_table_stats", """
SELECT count(*)::BIGINT AS n_rows,
       min(o_totalprice) AS min_v,
       max(o_totalprice) AS max_v
FROM orders
""")
def metadata_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # COUNT/MIN/MAX answered from parquet footers alone (no data read),
    # footer reads parallelized across executors; the oracle recomputes
    # the same stats by scanning rows
    import os

    from ..sources.registry import footer_stats
    return footer_stats(spark, os.path.join(sf_dir, "orders.parquet"),
                        "o_totalprice")


@register("scd2_customer_segments", """
WITH upd AS (SELECT c_custkey, 'MACHINERY' AS c_mktsegment
             FROM customer WHERE c_custkey % 10 = 0),
base AS (SELECT c_custkey, c_mktsegment FROM customer),
chg AS (SELECT b.c_custkey
        FROM base b JOIN upd u USING (c_custkey)
        WHERE b.c_mktsegment <> u.c_mktsegment)
SELECT b.c_custkey, b.c_mktsegment,
       DATE '2024-01-01' AS effective_from,
       CASE WHEN chg.c_custkey IS NOT NULL THEN DATE '2024-06-01' END
           AS effective_to,
       chg.c_custkey IS NULL AS is_current
FROM base b LEFT JOIN chg ON chg.c_custkey = b.c_custkey
UNION ALL
SELECT c.c_custkey, 'MACHINERY', DATE '2024-06-01', NULL, true
FROM chg c
ORDER BY c_custkey, effective_from
""")
def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SCD Type 2: a segment-change batch closes out changed current rows
    # and appends open-ended new versions; the oracle restates the same
    # close-out/insert union directly
    from ..operators.merge import scd2_merge
    import datetime
    c = load_table(spark, sf_dir, "customer")
    dim = (c.select("c_custkey", "c_mktsegment")
           .withColumn("effective_from", F.lit(datetime.date(2024, 1, 1)))
           .withColumn("effective_to", F.lit(None).cast("date"))
           .withColumn("is_current", F.lit(True)))
    upd = (c.filter(F.col("c_custkey") % 10 == 0)
           .select("c_custkey", F.lit("MACHINERY").alias("c_mktsegment")))
    out = scd2_merge(dim, upd, ["c_custkey"], ["c_mktsegment"],
                     datetime.date(2024, 6, 1))
    return out.orderBy("c_custkey", "effective_from")


@register("profile_orders_columns", """
SELECT 'o_orderdate' AS "column", count(*)::BIGINT AS n_rows,
       (count(*) - count(o_orderdate))::BIGINT AS n_nulls,
       count(DISTINCT o_orderdate)::BIGINT AS n_distinct,
       min(o_orderdate)::VARCHAR AS min_s, max(o_orderdate)::VARCHAR AS max_s
FROM orders
UNION ALL
SELECT 'o_orderkey', count(*)::BIGINT, (count(*) - count(o_orderkey))::BIGINT,
       count(DISTINCT o_orderkey)::BIGINT,
       min(o_orderkey)::VARCHAR, max(o_orderkey)::VARCHAR FROM orders
UNION ALL
SELECT 'o_orderstatus', count(*)::BIGINT,
       (count(*) - count(o_orderstatus))::BIGINT,
       count(DISTINCT o_orderstatus)::BIGINT,
       min(o_orderstatus), max(o_orderstatus) FROM orders
ORDER BY "column"
""")
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-pass per-column data-quality profile (nulls, distincts,
    # min/max); columns chosen with engine-stable string casts
    # (bigint/date/string — double formatting differs across engines)
    from ..operators.aggregates import profile_columns
    o = load_table(spark, sf_dir, "orders")
    return profile_columns(o, ["o_orderdate", "o_orderkey", "o_orderstatus"])


@register("unpivot_status_counts", """
WITH p AS (SELECT o_orderpriority AS priority,
                  count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
                  count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
                  count(*) FILTER (WHERE o_orderstatus = 'P') AS P
           FROM orders GROUP BY o_orderpriority)
SELECT priority, s AS status, n FROM (
  SELECT priority, 'F' AS s, F AS n FROM p
  UNION ALL SELECT priority, 'O', O FROM p
  UNION ALL SELECT priority, 'P', P FROM p
) WHERE n IS NOT NULL
ORDER BY priority, status
""")
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UNPIVOT/melt (the pivot inverse, Spark's native df.unpivot):
    # wide per-priority status counts back to tidy (priority, status, n)
    o = load_table(spark, sf_dir, "orders")
    wide = (o.groupBy(F.col("o_orderpriority").alias("priority"))
            .pivot("o_orderstatus", ["F", "O", "P"]).count())
    return (wide.unpivot("priority", ["F", "O", "P"], "status", "n")
            .filter(F.col("n").isNotNull())
            .orderBy("priority", "status"))


@register("mad_by_event_type", """
WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
             FROM events GROUP BY event_type)
SELECT e.event_type,
       round(med.med, 6) AS median_value,
       round(quantile_cont(abs(e.value - med.med), 0.5), 6) AS mad
FROM events e JOIN med USING (event_type)
GROUP BY e.event_type, med.med ORDER BY e.event_type
""")
def mad_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # robust dispersion: median absolute deviation per group (the
    # outlier-detection scale statistic) — two tiny aggregates with a
    # broadcast join between them; the fact is scanned twice but never
    # shuffled beyond group keys
    e = load_table(spark, sf_dir, "events")
    med = (e.groupBy("event_type")
           .agg(F.percentile("value", F.lit(0.5)).alias("med")))
    return (e.join(F.broadcast(med), "event_type")
            .groupBy("event_type", "med")
            .agg(F.round(F.percentile(F.abs(F.col("value") - F.col("med")),
                                      F.lit(0.5)), 6).alias("mad"))
            .select("event_type", F.round("med", 6).alias("median_value"),
                    "mad")
            .orderBy("event_type"))


@register("histogram_event_values", """
SELECT event_type,
       least(floor(value / 50), 9)::BIGINT AS bucket,
       count(*) AS n
FROM events WHERE value >= 0
GROUP BY 1, 2 ORDER BY event_type, bucket
""")
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fixed-width histogram (10 buckets of 50, top bucket open-ended):
    # one combiner-friendly aggregation; floor arithmetic is portable
    # where width_bucket is not
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("long")
    return (e.filter(F.col("value") >= 0)
            .groupBy("event_type", bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("event_type", "bucket"))


@register("lateral_top_nations", """
SELECT r.r_name, n.n_name
FROM region r, LATERAL (SELECT n_name FROM nation
                        WHERE n_regionkey = r.r_regionkey
                        ORDER BY n_name LIMIT 2) n
ORDER BY r_name, n_name
""")
def lateral_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    # correlated LATERAL subquery with per-row ORDER BY/LIMIT — Catalyst
    # decorrelates it to a partitioned rank, not a per-row re-execution
    from ..sources.registry import register_views
    register_views(spark, sf_dir, ["region", "nation"])
    return spark.sql("""
        SELECT r.r_name, n.n_name
        FROM region r, LATERAL (SELECT n_name FROM nation
                                WHERE n_regionkey = r.r_regionkey
                                ORDER BY n_name LIMIT 2) n
        ORDER BY r_name, n_name""")


@register("vector_hof_stats", """
SELECT vec_id,
       round(list_sum(list_transform(embedding, x -> (x::DOUBLE)
                                     * (x::DOUBLE))), 4) AS sq_norm,
       len(list_filter(embedding, x -> x > 0))::BIGINT AS n_positive,
       round(list_max(list_transform(embedding, x -> abs(x::DOUBLE))), 6)
           AS max_abs
FROM embeddings
WHERE vec_id < 200
ORDER BY vec_id
""")
def vector_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # higher-order array functions (aggregate/filter/transform) over the
    # embedding column — the JVM-side vector math the ANN family builds
    # on, with no Python in the loop
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"),
                      lambda x: x.cast("double"))
    sq = F.aggregate(F.transform(dbl, lambda x: x * x),
                     F.lit(0.0), lambda a, x: a + x)
    return (e.filter(F.col("vec_id") < 200)
            .select("vec_id",
                    F.round(sq, 4).alias("sq_norm"),
                    F.size(F.filter(F.col("embedding"),
                                    lambda x: x > 0)).cast("long")
                    .alias("n_positive"),
                    F.round(F.array_max(F.transform(dbl, F.abs)), 6)
                    .alias("max_abs"))
            .orderBy("vec_id"))


@register("json_prop_keys", """
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS keys,
       len(json_keys(props))::BIGINT AS n_keys
FROM events WHERE event_id < 500
ORDER BY event_id
""")
def json_prop_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # map-function family over semi-structured props: parse to a map,
    # enumerate keys (sorted — map iteration order is engine-defined),
    # count them; stringified so the gate can hash the result
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (e.filter(F.col("event_id") < 500)
            .select("event_id",
                    F.array_join(F.array_sort(F.map_keys(m)), ",")
                    .alias("keys"),
                    F.size(F.map_keys(m)).cast("long").alias("n_keys"))
            .orderBy("event_id"))


@register("asof_view_next_purchase", """
SELECT e.event_id, e.user_id, e.ts,
       (SELECT min(p.ts) FROM events p
        WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
          AND p.ts >= e.ts) AS asof_pts
FROM events e WHERE e.event_type = 'view'
ORDER BY e.event_id
""")
def asof_view_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FORWARD as-of join: each view matched to the user's next purchase
    # at-or-after it (direction='forward', strict=False) — the union+
    # window shape with the frame reversed, one shuffle on the key.
    # The oracle's correlated min() decorrelates to the same thing.
    from ..operators.asof import asof_join
    e = load_table(spark, sf_dir, "events")
    views = (e.filter(F.col("event_type") == "view")
             .select("event_id", "user_id", "ts"))
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("ts").alias("pts")))
    return (asof_join(views, purchases, on=["user_id"],
                      left_ts="ts", right_ts="pts",
                      right_payload=["pts"], strict=False,
                      direction="forward")
            .orderBy("event_id"))


_ZORDER_SQL = """
WITH p AS (SELECT o_orderkey, o_custkey,
                  CAST(o_totalprice * 100 AS BIGINT) AS price_c
           FROM orders),
b AS (SELECT min(o_custkey) AS lo1, max(o_custkey) AS hi1,
             min(price_c) AS lo2, max(price_c) AS hi2 FROM p),
r AS (SELECT o_orderkey,
             CAST(floor((o_custkey - lo1) * 255 / greatest(hi1 - lo1, 1))
                  AS BIGINT) AS r1,
             CAST(floor((price_c - lo2) * 255 / greatest(hi2 - lo2, 1))
                  AS BIGINT) AS r2
      FROM p, b)
SELECT o_orderkey, CAST((((r1 >> 0) & 1) << 0) + (((r2 >> 0) & 1) << 1) + (((r1 >> 1) & 1) << 2) + (((r2 >> 1) & 1) << 3) + (((r1 >> 2) & 1) << 4) + (((r2 >> 2) & 1) << 5) + (((r1 >> 3) & 1) << 6) + (((r2 >> 3) & 1) << 7) + (((r1 >> 4) & 1) << 8) + (((r2 >> 4) & 1) << 9) + (((r1 >> 5) & 1) << 10) + (((r2 >> 5) & 1) << 11) + (((r1 >> 6) & 1) << 12) + (((r2 >> 6) & 1) << 13) + (((r1 >> 7) & 1) << 14) + (((r2 >> 7) & 1) << 15) AS BIGINT) AS zkey
FROM r ORDER BY zkey, o_orderkey
"""


@register("layout_zorder_orders", _ZORDER_SQL)
def layout_zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Morton (Z-order) clustering key over (customer, price): the file
    # layout that lets footer min/max stats prune scans on EITHER
    # column. operators/layout.zorder_key; integer-pure arithmetic so
    # any engine computes the identical key.
    from ..operators.layout import zorder_key
    o = (load_table(spark, sf_dir, "orders")
         .select("o_orderkey", "o_custkey",
                 (F.col("o_totalprice") * 100).cast("long")
                 .alias("price_c")))
    z = zorder_key(o, ["o_custkey", "price_c"], bits=8)
    return z.select("o_orderkey", "zkey").orderBy("zkey", "o_orderkey")


@register("scd2_point_in_time_join", """
WITH upd AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0),
dim AS (
  SELECT b.c_custkey, b.c_mktsegment,
         TIMESTAMP '1992-01-01' AS effective_from,
         CASE WHEN u.c_custkey IS NOT NULL
              THEN TIMESTAMP '1996-06-01' END AS effective_to
  FROM customer b LEFT JOIN upd u ON u.c_custkey = b.c_custkey
  UNION ALL
  SELECT c_custkey, 'MACHINERY', TIMESTAMP '1996-06-01', NULL
  FROM upd
)
SELECT d.c_mktsegment AS segment_asof,
       count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o JOIN dim d
  ON o.o_custkey = d.c_custkey
 AND o.o_orderdate >= d.effective_from
 AND (d.effective_to IS NULL OR o.o_orderdate < d.effective_to)
GROUP BY d.c_mktsegment
ORDER BY segment_asof
""")
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Point-in-time (as-of) join against SCD2 history: every order is
    # attributed to the dimension VERSION valid at its order date —
    # the temporal-correctness join every warehouse needs once dims
    # keep history. Keyed equi-join on the business key with the
    # validity-interval residual; versions-per-key is small by
    # construction, so amplification is bounded and the join stays a
    # hash/merge join at any scale (never a range cross-join).
    import datetime
    c = load_table(spark, sf_dir, "customer")
    upd = c.filter(F.col("c_custkey") % 10 == 0).select("c_custkey")
    base = (c.select("c_custkey", "c_mktsegment")
            .join(upd.withColumn("_chg", F.lit(True)), "c_custkey",
                  "left")
            .select("c_custkey", "c_mktsegment",
                    F.lit("1992-01-01").cast("timestamp")
                    .alias("effective_from"),
                    F.when(F.col("_chg"),
                           F.lit("1996-06-01").cast("timestamp"))
                    .alias("effective_to")))
    newver = upd.select(
        "c_custkey", F.lit("MACHINERY").alias("c_mktsegment"),
        F.lit("1996-06-01").cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"))
    dim = base.unionByName(newver)
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice")
    pit = o.join(dim, (o["o_custkey"] == dim["c_custkey"])
                 & (o["o_orderdate"] >= dim["effective_from"])
                 & (dim["effective_to"].isNull()
                    | (o["o_orderdate"] < dim["effective_to"])))
    return (pit.groupBy(F.col("c_mktsegment").alias("segment_asof"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price"))
            .orderBy("segment_asof"))


@register("lineitem_lead_time_stats", """
WITH d AS (
  SELECT o.o_orderpriority,
         CAST(datediff('day', o.o_orderdate, l.l_shipdate) AS BIGINT)
             AS ship_lag_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       count(*) AS n,
       round(quantile_cont(ship_lag_days, 0.5), 4) AS lag_p50,
       round(quantile_cont(ship_lag_days, 0.9), 4) AS lag_p90,
       round(quantile_cont(ship_lag_days, 0.99), 4) AS lag_p99,
       CAST(sum(ship_lag_days) AS BIGINT) AS lag_total,
       CASE WHEN sum(ship_lag_days) >= 0
            THEN CAST(floor((2 * (sum(ship_lag_days) * 1000000)
                             + count(*)) / (2 * count(*))) AS BIGINT)
            ELSE -CAST(floor((2 * -(sum(ship_lag_days) * 1000000)
                              + count(*)) / (2 * count(*))) AS BIGINT)
       END / 1000000.0 AS lag_mean
FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def lineitem_lead_time_stats(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    # logistics SLA profile per order priority: exact interpolated
    # order->ship lag percentiles (integer day diffs) + half-away mean;
    # the orders side joins broadcast on the FK
    from ..operators.windows import int_mean_half_away
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    d = (li.join(orders.select("o_orderkey", "o_orderpriority",
                               "o_orderdate"),
                 li["l_orderkey"] == orders["o_orderkey"])
         .select("o_orderpriority",
                 F.datediff("l_shipdate", "o_orderdate").cast("long")
                 .alias("ship_lag_days")))
    agg = (d.groupBy("o_orderpriority")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.round(F.percentile("ship_lag_days", F.lit(0.5)), 4)
                .alias("lag_p50"),
                F.round(F.percentile("ship_lag_days", F.lit(0.9)), 4)
                .alias("lag_p90"),
                F.round(F.percentile("ship_lag_days", F.lit(0.99)), 4)
                .alias("lag_p99"),
                F.sum("ship_lag_days").cast("long").alias("lag_total")))
    mean = int_mean_half_away(F.col("lag_total") * F.lit(1000000),
                              F.col("n"))
    return (agg.select("o_orderpriority", "n", "lag_p50", "lag_p90",
                       "lag_p99", "lag_total",
                       (mean / F.lit(1e6)).alias("lag_mean"))
            .orderBy("o_orderpriority"))
