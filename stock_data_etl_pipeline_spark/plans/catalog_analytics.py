"""Catalog entries: behavioral/diagnostic analytics over the synthetic
tables — ordered funnel, weekly cohort retention, market-basket pairs,
per-group OLS regression, join-key skew profiling, and blocked fuzzy
name matching.  Implementations live in ``operators/analytics.py``; each
entry here is the oracle-checked query twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.analytics import (cohort_retention, cuped_ab_test,
                                   frequent_pairs, funnel, fuzzy_match,
                                   key_skew_profile, multi_touch_attribution,
                                   pagerank, survival_curve, triangle_stats)
from ..sources.registry import load_table
from .catalog import register

# fuzzy-name pair CTEs shared by fuzzy_part_names and the entity-
# resolution composition below
_FUZZY_CTES = """
fn AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL),
fnb AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM fn),
fpairs AS (SELECT a.p_name AS name_a, b.p_name AS name_b,
                  levenshtein(a.p_name, b.p_name) AS dist
           FROM fnb a JOIN fnb b ON a.blk = b.blk AND a.p_name < b.p_name
           WHERE levenshtein(a.p_name, b.p_name) <= 2)"""


@register("funnel_user_day", """
WITH ev AS (SELECT user_id || '/' || strftime(ts, '%Y-%m-%d') AS uk,
                   event_type, ts
            FROM events),
s1 AS (SELECT uk, min(ts) AS f FROM ev WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.uk, min(e.ts) AS f FROM ev e JOIN s1 USING (uk)
       WHERE e.event_type = 'click' AND e.ts >= s1.f GROUP BY 1),
s3 AS (SELECT e.uk, min(e.ts) AS f FROM ev e JOIN s2 USING (uk)
       WHERE e.event_type = 'purchase' AND e.ts >= s2.f GROUP BY 1)
SELECT 1 AS stage, 'view' AS step, (SELECT count(*) FROM s1) AS users
UNION ALL
SELECT 2, 'click', (SELECT count(*) FROM s2)
UNION ALL
SELECT 3, 'purchase', (SELECT count(*) FROM s3)
ORDER BY stage
""")
def funnel_user_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered funnel view -> click -> purchase within a (user, day) key:
    # greedy first-occurrence frontiers, one same-key join per step
    # (operators/analytics.funnel — see its scale notes).  The composite
    # key is what makes the funnel selective: per-day conversion, not
    # lifetime conversion.
    e = load_table(spark, sf_dir, "events")
    keyed = e.select(
        F.concat(F.col("user_id").cast("string"), F.lit("/"),
                 F.date_format("ts", "yyyy-MM-dd")).alias("uk"),
        "event_type", "ts")
    return funnel(keyed, ["view", "click", "purchase"], user_col="uk")


@register("cohort_weekly_retention", """
WITH first AS (SELECT user_id,
                      CAST(date_trunc('week', min(ts)) AS TIMESTAMP)
                        AS cohort_week
               FROM events GROUP BY 1),
act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events)
SELECT f.cohort_week,
       CAST(floor(datediff('day', f.cohort_week, a.week) / 7.0) AS BIGINT)
         AS week_offset,
       count(DISTINCT a.user_id) AS active_users
FROM act a JOIN first f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
""")
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weekly cohorts: first-seen week x activity-week offset, distinct
    # users.  Monday-start ISO weeks on both engines (Spark date_trunc
    # and DuckDB date_trunc agree).
    e = load_table(spark, sf_dir, "events")
    return cohort_retention(e)


@register("basket_part_pairs", """
WITH oi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem)
SELECT a.i AS item_a, b.i AS item_b, count(*) AS support
FROM oi a JOIN oi b ON a.b = b.b AND a.i < b.i
GROUP BY 1, 2
HAVING count(*) >= 2
ORDER BY support DESC, item_a, item_b
LIMIT 25
""")
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # market-basket co-occurrence: parts appearing in the same order,
    # support >= 2, top 25.  Per-basket self-join bounded by order size
    # (<= 7 lineitems), a-priori distinct-first — never |parts|^2.
    li = load_table(spark, sf_dir, "lineitem")
    return frequent_pairs(li, "l_orderkey", "l_partkey",
                          min_support=2, k=25)


@register("regression_price_on_qty", """
SELECT l_returnflag,
       round(covar_pop(l_extendedprice, l_quantity)
             / var_pop(l_quantity), 3) + 0.0 AS slope,
       round(avg(l_extendedprice)
             - covar_pop(l_extendedprice, l_quantity) / var_pop(l_quantity)
               * avg(l_quantity), 3) + 0.0 AS intercept,
       round(corr(l_extendedprice, l_quantity), 3) + 0.0 AS r,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""")
def regression_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-group OLS (price ~ qty) from single-pass co-moments:
    # slope = cov/var, intercept = E[y] - slope*E[x].  All map-side
    # combinable streaming aggregates; 3dp + '+0.0' per the statistical-
    # aggregate rounding policy (engines' update order differs ~1e-5,
    # and round() can emit IEEE -0.0).
    li = load_table(spark, sf_dir, "lineitem")
    slope = F.covar_pop("l_extendedprice", "l_quantity") / \
        F.var_pop("l_quantity")
    return (li.groupBy("l_returnflag")
            .agg((F.round(slope, 3) + F.lit(0.0)).alias("slope"),
                 (F.round(F.avg("l_extendedprice")
                          - slope * F.avg("l_quantity"), 3)
                  + F.lit(0.0)).alias("intercept"),
                 (F.round(F.corr("l_extendedprice", "l_quantity"), 3)
                  + F.lit(0.0)).alias("r"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("l_returnflag"))


@register("skew_profile_partkey", """
WITH k AS (SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1),
t AS (SELECT sum(cnt) AS total, avg(cnt) AS mean FROM k)
SELECT k.key, k.cnt,
       round(100.0 * k.cnt / t.total, 4) AS pct,
       round(k.cnt / t.mean, 4) AS skew_x
FROM k, t
ORDER BY cnt DESC, key
LIMIT 10
""")
def skew_profile_partkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    # heavy-hitter profile of lineitem.l_partkey — the pre-flight
    # diagnostic for the salted join (operators/skew.py): per-key counts
    # + broadcast 2-number summary, top 10 hot keys.
    li = load_table(spark, sf_dir, "lineitem")
    return key_skew_profile(li, "l_partkey", top=10)


@register("fuzzy_part_names", f"""
WITH {_FUZZY_CTES}
SELECT name_a, name_b, dist FROM fpairs
ORDER BY name_a, name_b
""")
def fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    # blocked Levenshtein self-match on distinct part names; block key =
    # last token, so the quadratic step runs per noun-block over value-
    # level distincts, not per row (operators/analytics.fuzzy_match).
    p = load_table(spark, sf_dir, "part")
    return fuzzy_match(p, "p_name",
                       F.element_at(F.split(F.col("_n"), " "), -1),
                       max_dist=2)


@register("entity_clusters_from_fuzzy", f"""
WITH RECURSIVE {_FUZZY_CTES},
edges AS (SELECT name_a AS src, name_b AS dst FROM fpairs
          UNION
          SELECT name_b AS src, name_a AS dst FROM fpairs),
walk(nm, lbl) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, w.lbl FROM edges e JOIN walk w ON w.nm = e.dst
)
SELECT nm AS name, min(lbl) AS entity_id
FROM walk GROUP BY nm ORDER BY nm
""")
def entity_clusters_from_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # entity resolution composed from two scale-safe pieces: blocked
    # Levenshtein pairs (fuzzy_match) -> distributed min-label connected
    # components (operators/clustering.cluster_near_dups); entity_id =
    # lexicographically-smallest member name.  The oracle is the
    # recursive transitive-closure twin of the iterative propagation.
    from ..operators.clustering import cluster_near_dups
    p = load_table(spark, sf_dir, "part")
    pairs = fuzzy_match(p, "p_name",
                        F.element_at(F.split(F.col("_n"), " "), -1),
                        max_dist=2)
    return (cluster_near_dups(pairs, id_a="name_a", id_b="name_b")
            .select(F.col("doc_id").alias("name"),
                    F.col("cluster_id").alias("entity_id"))
            .orderBy("name"))


@register("graph_triangle_census", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
e AS (SELECT DISTINCT a.i AS ea, b.i AS eb
      FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
w AS (SELECT e1.ea AS a, e1.eb AS b, e2.eb AS c
      FROM e e1 JOIN e e2 ON e1.eb = e2.ea),
t AS (SELECT * FROM w
      WHERE EXISTS (SELECT 1 FROM e WHERE e.ea = w.a AND e.eb = w.c))
SELECT (SELECT count(*) FROM (SELECT ea AS v FROM e
                              UNION SELECT eb FROM e)) AS n_nodes,
       (SELECT count(*) FROM e) AS n_edges,
       (SELECT count(*) FROM t) AS n_triangles
""")
def graph_triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    # triangle census of the co-purchase graph (parts = nodes, edges =
    # co-occurrence in an order): ordered wedge join + semi-join closure,
    # operators/analytics.triangle_stats.
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return triangle_stats(pairs, "pa", "pb")


@register("twap_by_user", """
WITH w AS (SELECT user_id, value,
                  epoch(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
                    - epoch(ts) AS dur
           FROM events)
SELECT user_id, round(sum(value * dur) / sum(dur), 4) AS twap
FROM w WHERE dur IS NOT NULL
GROUP BY user_id ORDER BY user_id
""")
def twap_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # time-weighted average price per user: each observation weighted by
    # its holding duration (seconds to the next event, microsecond
    # precision via double-seconds timestamps).  One per-key window +
    # one aggregation on the same key — a single shuffle.
    from pyspark.sql import Window
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (F.lead(F.col("ts").cast("double")).over(w)
           - F.col("ts").cast("double"))
    return (e.select("user_id", "value", dur.alias("dur"))
            .filter(F.col("dur").isNotNull())
            .groupBy("user_id")
            .agg(F.round(F.sum(F.col("value") * F.col("dur"))
                         / F.sum("dur"), 4).alias("twap"))
            .orderBy("user_id"))


@register("wow_revenue_growth", """
WITH wk AS (SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP)
              AS week,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1)
SELECT week, revenue,
       round(revenue - lag(revenue) OVER (ORDER BY week), 2) AS delta,
       round(100.0 * (revenue - lag(revenue) OVER (ORDER BY week))
             / lag(revenue) OVER (ORDER BY week), 4) AS pct_change
FROM wk ORDER BY week
""")
def wow_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # week-over-week revenue growth over the ALREADY-AGGREGATED weekly
    # frame (rows = distinct weeks, bounded by the calendar).  lag() is
    # expressed as a broadcast self-join + max_by (previous existing
    # week's revenue) rather than a global Window, so no single-partition
    # WindowExec stage appears — exact lag semantics, gaps included.
    o = load_table(spark, sf_dir, "orders")
    wk = (o.groupBy(F.date_trunc("week", F.col("o_orderdate"))
                    .alias("week"))
          .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue")))
    earlier = wk.select(F.col("week").alias("pweek"),
                        F.col("revenue").alias("prev_rev"))
    prev = F.max_by("prev_rev", "pweek")
    lagged = (wk.join(F.broadcast(earlier),
                      F.col("pweek") < F.col("week"), "left")
              .groupBy("week", "revenue")
              .agg(prev.alias("prev")))
    return (lagged.select(
        "week", "revenue",
        F.round(F.col("revenue") - F.col("prev"), 2).alias("delta"),
        F.round(100.0 * (F.col("revenue") - F.col("prev")) / F.col("prev"), 4)
        .alias("pct_change"))
        .orderBy("week"))


@register("zscore_outliers_by_type", """
WITH s AS (SELECT event_type, avg(value) AS m, stddev_pop(value) AS sd
           FROM events GROUP BY 1)
SELECT e.event_type, count(*) AS n,
       CAST(sum(CASE WHEN round(abs((e.value - s.m) / s.sd), 4) >= 2.5
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(max(abs((e.value - s.m) / s.sd)), 3) AS max_z
FROM events e JOIN s USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
""")
def zscore_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-group z-score outlier counts: group moments broadcast back
    # onto the rows (two-pass standardization).  The z is rounded to 4dp
    # BEFORE the threshold compare so the engines' 1e-12-level moment
    # differences can't flip a boundary row.
    e = load_table(spark, sf_dir, "events")
    s = e.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_pop("value").alias("sd"))
    z = F.abs((F.col("value") - F.col("m")) / F.col("sd"))
    return (e.join(F.broadcast(s), "event_type")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.round(z, 4) >= 2.5, 1).otherwise(0))
                 .cast("long").alias("n_outliers"),
                 F.round(F.max(z), 3).alias("max_z"))
            .orderBy("event_type"))


@register("dq_orders_constraints", """
WITH ra AS (SELECT count(*) AS n,
    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS nn,
    CAST(sum(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS rng,
    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                   AND o_orderstatus NOT IN ('O', 'F', 'P')
                  THEN 1 ELSE 0 END) AS BIGINT) AS st
  FROM orders),
u AS (SELECT CAST(sum(c) AS BIGINT) AS checked,
             CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
               AS viol
      FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)),
r AS (SELECT
    CAST((SELECT count(*) FROM orders o
          WHERE o.o_custkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
      AS viol,
    CAST((SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL)
      AS BIGINT) AS checked)
SELECT 'o_custkey_not_null' AS constraint_name, nn AS violations, n AS checked
  FROM ra
UNION ALL
SELECT 'o_custkey_ref_customer', viol, checked FROM r
UNION ALL
SELECT 'o_orderkey_unique', viol, checked FROM u
UNION ALL
SELECT 'o_orderstatus_in_set', st, n FROM ra
UNION ALL
SELECT 'o_totalprice_in_range', rng, n FROM ra
ORDER BY constraint_name
""")
def dq_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # declarative data-quality suite over orders (operators/quality.py):
    # three row-level rules folded into ONE aggregation, key uniqueness
    # as one groupBy, referential integrity as one broadcast anti-join.
    from ..operators.quality import (RefRule, UniqueRule, dq_check,
                                     in_range, in_set, not_null)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return dq_check(o, [
        not_null("o_custkey"),
        in_range("o_totalprice", lo=0),
        in_set("o_orderstatus", ("O", "F", "P")),
        UniqueRule("o_orderkey_unique", ("o_orderkey",)),
        RefRule("o_custkey_ref_customer", "o_custkey", c, "c_custkey"),
    ])


@register("trailing_30d_revenue", """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 2505600 PRECEDING AND CURRENT ROW), 2) AS rev_30d,
       round(cume_dist() OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice), 6) AS cd_price,
       nth_value(o_orderkey, 2) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS second_order
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
""")
def trailing_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RANGE-frame analytic windows: per-customer trailing-30-day revenue
    # (range on epoch seconds — peers at equal timestamps share one
    # frame, so date ties stay deterministic), cumulative distribution
    # of order value, and nth_value over the default running frame.
    # All three windows share the o_custkey partitioning: ONE shuffle,
    # three in-partition sorts at most.
    from pyspark.sql import Window
    o = load_table(spark, sf_dir, "orders")
    epoch = F.col("o_orderdate").cast("long")
    w_range = (Window.partitionBy("o_custkey").orderBy(epoch)
               .rangeBetween(-29 * 86400, 0))
    w_cd = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    w_nth = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey")
    return (o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.round(F.sum("o_totalprice").over(w_range), 2).alias("rev_30d"),
        F.round(F.cume_dist().over(w_cd), 6).alias("cd_price"),
        F.nth_value("o_orderkey", 2).over(w_nth).alias("second_order"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey"))


@register("hourly_value_percentiles", """
SELECT date_trunc('hour', ts) AS hour, event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(quantile_cont(value, 0.99), 4) AS p99,
       count(*) AS n
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
""")
def hourly_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the observability rollup: exact interpolated p50/p95/p99 per
    # (hour, type).  Exact percentile is a sort-based aggregate — fine
    # per bounded group; percentile_approx (t-digest) is the swap-in
    # when groups stop fitting (same call shape, no plan change).
    e = load_table(spark, sf_dir, "events")
    return (e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                      "event_type")
            .agg(F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
                 F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
                 F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("hour", "event_type"))


@register("rank_top_suppliers_with_ties", """
WITH r AS (SELECT l_suppkey, round(sum(l_extendedprice), 2) AS rev
           FROM lineitem GROUP BY 1),
rk AS (SELECT l_suppkey, rev, rank() OVER (ORDER BY rev DESC) AS rnk
       FROM r)
SELECT l_suppkey, rev, rnk FROM rk WHERE rnk <= 10
ORDER BY rnk, l_suppkey
""")
def rank_top_suppliers_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-N with TIES (rank(), not row_number()): equal revenues share a
    # rank and all qualify, so the result can exceed N rows — the
    # correct semantics for leaderboards.  Scale-safe shape: the cutoff
    # (10th-highest DISTINCT revenue) comes from a TakeOrderedAndProject
    # over distinct revenues — no global window over all suppliers —
    # then only the >= cutoff survivors (a handful of rows) are ranked
    # via a broadcast self-join count (rank = 1 + #rows strictly above),
    # avoiding a single-partition WindowExec stage entirely.
    li = load_table(spark, sf_dir, "lineitem")
    r = (li.groupBy("l_suppkey")
         .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev")))
    cut = (r.select("rev").distinct()
           .orderBy(F.col("rev").desc()).limit(10)
           .agg(F.min("rev").alias("cut")))
    top = r.join(F.broadcast(cut), r["rev"] >= cut["cut"]).drop("cut")
    other = top.select(F.col("rev").alias("rev2"))
    rk = (top.join(F.broadcast(other), F.col("rev2") > F.col("rev"), "left")
          .groupBy("l_suppkey", "rev")
          .agg((F.count("rev2") + 1).cast("long").alias("rnk")))
    return (rk.filter(F.col("rnk") <= 10)
            .orderBy("rnk", "l_suppkey"))


@register("graph_pagerank_parts", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
und AS (SELECT DISTINCT a.i AS ea, b.i AS eb
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
e AS (SELECT ea AS src, eb AS dst FROM und
      UNION ALL SELECT eb, ea FROM und),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
n AS (SELECT count(*) AS nn FROM deg),
r0 AS (SELECT src AS node, 1000000000000 // nn AS r FROM deg, n),
base AS (SELECT (1000000000000 * 15 // 100) // nn AS b FROM n),
s1 AS (SELECT e.dst AS node,
          CAST(sum(r.r // d.outdeg) AS BIGINT) AS s
       FROM e JOIN r0 r ON e.src = r.node
              JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
r1 AS (SELECT node, b + (85 * s) // 100 AS r FROM s1, base),
s2 AS (SELECT e.dst AS node,
          CAST(sum(r.r // d.outdeg) AS BIGINT) AS s
       FROM e JOIN r1 r ON e.src = r.node
              JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
r2 AS (SELECT node, b + (85 * s) // 100 AS r FROM s2, base),
s3 AS (SELECT e.dst AS node,
          CAST(sum(r.r // d.outdeg) AS BIGINT) AS s
       FROM e JOIN r2 r ON e.src = r.node
              JOIN deg d ON e.src = d.src
       GROUP BY e.dst),
r3 AS (SELECT node, b + (85 * s) // 100 AS r FROM s3, base)
SELECT node, r AS rank_e12 FROM r3
ORDER BY r DESC, node LIMIT 100
""")
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # PageRank over the co-purchase part graph (3 power iterations in
    # exact fixed-point integer arithmetic — bit-identical on any
    # engine/partitioning); top-100 hubs by rank.
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return pagerank(pairs, "pa", "pb", iters=3)


@register("events_psi_drift", """
WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
           FROM events),
m AS (SELECT event_type,
             least(9, floor(value / 60.0))::INT AS bucket,
             (epoch_us(ts) >= (mn + mx) / 2) AS second_half
      FROM events, b),
cnt AS (SELECT event_type, bucket,
               CAST(sum(CASE WHEN NOT second_half THEN 1 ELSE 0 END)
                    AS BIGINT) AS c0,
               CAST(sum(CASE WHEN second_half THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1
        FROM m GROUP BY event_type, bucket),
tot AS (SELECT event_type, CAST(sum(c0) AS BIGINT) AS n0,
               CAST(sum(c1) AS BIGINT) AS n1
        FROM cnt GROUP BY event_type),
j AS (SELECT c.*, t.n0, t.n1 FROM cnt c JOIN tot t USING (event_type)),
s AS (SELECT event_type, max(n0) AS n_first, max(n1) AS n_second,
             round(sum(((c1+1)/(n1+10.0) - (c0+1)/(n0+10.0))
                       * ln(((c1+1)/(n1+10.0))
                            / ((c0+1)/(n0+10.0)))), 6) AS psi
      FROM j GROUP BY event_type)
SELECT event_type, n_first, n_second, psi, psi > 0.2 AS drifted
FROM s ORDER BY event_type
""")
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # feature-drift monitoring: Population Stability Index of the value
    # distribution, first vs second half of the timeline, per type;
    # Laplace-smoothed fixed bins, exact integer counts
    from ..operators.quality import psi_drift
    ev = load_table(spark, sf_dir, "events")
    return psi_drift(ev)


@register("events_outlier_ticks", """
WITH m1 AS (SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY event_type),
st AS (SELECT e.event_type, any_value(m1.med) AS med,
              quantile_cont(abs(e.value - m1.med), 0.5) AS mad
       FROM events e JOIN m1 USING (event_type)
       GROUP BY e.event_type),
z AS (SELECT e.event_id, e.event_type, e.value,
             round(st.med, 6) AS med, round(st.mad, 6) AS mad,
             round(abs(e.value - st.med) / (1.4826 * st.mad), 6)
                 AS abs_z
      FROM events e JOIN st USING (event_type)
      WHERE st.mad > 0)
SELECT event_id, event_type, value, med, mad, abs_z
FROM z ORDER BY abs_z DESC, event_id LIMIT 50
""")
def events_outlier_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # robust per-tick outlier detection: |value - median| / (1.4826*MAD)
    # per type — median/MAD resist the very outliers a mean/std z-score
    # would absorb; per-type stats are a tiny broadcast, the top-50 a
    # map-side TakeOrdered
    ev = load_table(spark, sf_dir, "events")
    med = (ev.groupBy("event_type")
           .agg(F.percentile("value", F.lit(0.5)).alias("med")))
    mad = (ev.join(F.broadcast(med), "event_type")
           .groupBy("event_type")
           .agg(F.first("med").alias("med"),
                F.percentile(F.abs(F.col("value") - F.col("med")),
                             F.lit(0.5)).alias("mad")))
    z = (ev.join(F.broadcast(mad), "event_type")
         .filter(F.col("mad") > 0)
         .select("event_id", "event_type", "value",
                 F.round("med", 6).alias("med"),
                 F.round("mad", 6).alias("mad"),
                 F.round(F.abs(F.col("value") - F.col("med"))
                         / (1.4826 * F.col("mad")), 6).alias("abs_z")))
    return z.orderBy(F.col("abs_z").desc(), "event_id").limit(50)


@register("events_rfm_segments", """
WITH mx AS (SELECT max(ts) AS now FROM events),
base AS (SELECT user_id,
                CAST(sum(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS BIGINT) AS frequency,
                round(sum(CASE WHEN event_type = 'purchase'
                               THEN value ELSE 0 END), 2) AS monetary,
                CAST(date_diff('second', max(ts), (SELECT now FROM mx))
                     AS BIGINT) AS recency_s
         FROM events GROUP BY user_id),
scored AS (SELECT *,
                  ntile(4) OVER (ORDER BY recency_s, user_id) AS r,
                  ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f,
                  ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m
           FROM base)
SELECT user_id, recency_s, frequency, monetary,
       CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
       CAST(m AS BIGINT) AS m,
       CASE WHEN r = 1 AND f = 1 THEN 'champion'
            WHEN r >= 3 AND f = 1 THEN 'at_risk'
            WHEN r = 1 AND f >= 3 THEN 'new'
            ELSE 'regular' END AS segment
FROM scored ORDER BY user_id
""")
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # classic RFM segmentation: recency/frequency/monetary quartiles per
    # user (exact rank-based quartiles over total orderings with id
    # tie-breaks, so the segmentation is exact on any engine); computed
    # via distributed_ntile — range-partitioned local sorts, never a
    # global single-partition window sort; quartile 1 = best
    from ..operators.windows import distributed_ntile
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("now"))
    base = (ev.crossJoin(F.broadcast(mx))
            .groupBy("user_id")
            .agg(F.sum(F.when(F.col("event_type") == "purchase", 1)
                       .otherwise(0)).alias("frequency"),
                 F.round(F.sum(F.when(F.col("event_type") == "purchase",
                                      F.col("value")).otherwise(0.0)), 2)
                 .alias("monetary"),
                 (F.unix_timestamp(F.max(F.col("now")))
                  - F.unix_timestamp(F.max("ts"))).alias("recency_s")))
    scored = base
    for col, order in [("r", ["recency_s", "user_id"]),
                       ("f", [F.desc("frequency"), "user_id"]),
                       ("m", [F.desc("monetary"), "user_id"])]:
        scored = distributed_ntile(scored, 4, order, out=col)
    scored = scored.select("user_id", "recency_s", "frequency", "monetary",
                           F.col("r").cast("long").alias("r"),
                           F.col("f").cast("long").alias("f"),
                           F.col("m").cast("long").alias("m"))
    seg = (F.when((F.col("r") == 1) & (F.col("f") == 1), "champion")
           .when((F.col("r") >= 3) & (F.col("f") == 1), "at_risk")
           .when((F.col("r") == 1) & (F.col("f") >= 3), "new")
           .otherwise("regular"))
    return (scored.withColumn("segment", seg).orderBy("user_id"))


@register("events_attribution", """
WITH p AS (SELECT user_id AS p_user, ts AS p_ts, event_id AS p_id,
                  value AS p_value
           FROM events WHERE event_type = 'purchase'),
t AS (SELECT user_id AS t_user, ts AS t_ts, event_id AS t_id,
             event_type AS channel
      FROM events WHERE event_type IN ('view', 'click')),
pairs AS (
  SELECT p.*, t.t_ts, t.t_id, t.channel
  FROM p JOIN t ON p.p_user = t.t_user
   AND (t.t_ts < p.p_ts OR (t.t_ts = p.p_ts AND t.t_id < p.p_id))
   AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
scored AS (
  SELECT channel, p_value,
         CAST(round(p_value * 100, 0) AS BIGINT) AS p_cents,
         count(*) OVER (PARTITION BY p_id) AS k,
         CASE WHEN row_number() OVER (PARTITION BY p_id
                ORDER BY t_ts DESC, t_id DESC) = 1
              THEN 1 ELSE 0 END AS is_last
  FROM pairs)
SELECT channel,
       count(*) AS n_touchpoints,
       CAST(sum(is_last) AS BIGINT) AS n_last_touch,
       round(CAST(sum(is_last * p_cents) AS BIGINT) / 100.0, 2)
           AS last_touch_value,
       round(CAST(sum(CAST(round(p_value * 1e6 / k, 0) AS BIGINT))
                  AS BIGINT) / 1e6, 6) AS linear_value
FROM scored GROUP BY channel ORDER BY channel
""")
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # last-touch + linear multi-touch attribution of purchase value to
    # preceding view/click touches within 7 days; user-keyed join with
    # time residual, per-purchase windows, channel rollup
    ev = load_table(spark, sf_dir, "events")
    return multi_touch_attribution(ev).orderBy("channel")


@register("events_survival_curve", """
WITH b AS (SELECT max(ts) AS obs_end FROM events),
pu AS (SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
       FROM events GROUP BY user_id),
u AS (SELECT CAST(floor((floor(epoch(last_ts)) - floor(epoch(first_ts)))
                        / (7 * 86400)) AS BIGINT) AS week,
             floor(epoch(last_ts)) < floor(epoch((SELECT obs_end FROM b)))
                              - 14 * 86400 AS churned
      FROM pu),
tot AS (SELECT count(*) AS n_total FROM u),
wk AS (SELECT week,
              CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_churned,
              CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
                  AS n_censored
       FROM u GROUP BY week),
lt AS (SELECT *,
              CAST(sum(n_churned + n_censored) OVER (
                ORDER BY week DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_risk,
              CAST(sum(n_churned + n_censored) OVER (
                ORDER BY week ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS gone_thru
       FROM wk)
SELECT week, n_risk, n_churned, n_censored,
       round(n_churned / CAST(n_risk AS DOUBLE), 6) AS hazard,
       round((tot.n_total - gone_thru)
             / CAST(tot.n_total AS DOUBLE), 6) AS survival_emp
FROM lt, tot ORDER BY week
""")
def events_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weekly churn life table: at-risk / churned / censored / discrete
    # hazard / empirical survival; per-user reduction is one hash-agg,
    # the cumulative windows run on the |weeks|-row life table only
    ev = load_table(spark, sf_dir, "events")
    return survival_curve(ev).orderBy("week")


@register("events_ab_test_cuped", """
WITH b AS (SELECT min(ts) AS t0 FROM events),
pu AS (SELECT user_id,
              CAST(sum(CASE WHEN event_type = 'purchase'
                             AND ts < (SELECT t0 FROM b) + INTERVAL 15 DAY
                            THEN CAST(round(value * 100, 0) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS x,
              CAST(sum(CASE WHEN event_type = 'purchase'
                             AND ts >= (SELECT t0 FROM b) + INTERVAL 15 DAY
                            THEN CAST(round(value * 100, 0) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS y
       FROM events GROUP BY user_id),
u AS (SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 2
                 AS arm, x, y
      FROM pu),
pooled AS (SELECT count(*) AS n,
                  CAST(sum(x) AS BIGINT) AS sx,
                  CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x * y) AS BIGINT) AS sxy,
                  CAST(sum(x * x) AS BIGINT) AS sx2
           FROM u),
pa AS (SELECT arm, count(*) AS n_a,
              CAST(sum(x) AS BIGINT) AS sx_a,
              CAST(sum(y) AS BIGINT) AS sy_a,
              CAST(sum(y * y) AS BIGINT) AS sy2_a,
              CAST(sum(x * y) AS BIGINT) AS sxy_a,
              CAST(sum(x * x) AS BIGINT) AS sx2_a
       FROM u GROUP BY arm),
c AS (SELECT arm, n_a, sx_a, sy_a, sy2_a, sxy_a, sx2_a,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                    / CAST(n AS DOUBLE))
             / (CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                      / CAST(n AS DOUBLE)) AS theta,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS gx
      FROM pa, pooled),
m AS (SELECT arm, n_a, theta,
             CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_pre,
             CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_post,
             CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               - theta * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - gx)
                 AS mean_adj,
             CASE WHEN n_a > 1 THEN
               (CAST(sy2_a AS DOUBLE) - CAST(sy_a AS DOUBLE)
                  * CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))
               / (CAST(n_a AS DOUBLE) - 1) END AS var_post,
             CASE WHEN n_a > 1 THEN
               ((CAST(sy2_a AS DOUBLE) - 2 * theta * CAST(sxy_a AS DOUBLE)
                 + theta * theta * CAST(sx2_a AS DOUBLE))
                - (CAST(sy_a AS DOUBLE) - theta * CAST(sx_a AS DOUBLE))
                  * (CAST(sy_a AS DOUBLE) - theta * CAST(sx_a AS DOUBLE))
                  / CAST(n_a AS DOUBLE))
               / (CAST(n_a AS DOUBLE) - 1) END AS var_adj
      FROM c)
SELECT arm, n_a AS n_users,
       round(mean_pre / 100, 6) AS mean_pre,
       round(mean_post / 100, 6) AS mean_post,
       round(mean_adj / 100, 6) AS mean_adj,
       round(theta, 6) AS theta,
       round(1.0 - var_adj / var_post, 6) AS var_reduction
FROM m ORDER BY arm
""")
def events_ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CUPED variance-reduced A/B readout: md5-hash arms, pre-period
    # purchase value as covariate; every moment an exact integer-cents
    # sum, the theta/mean/variance chain identical IEEE math in both
    # engines
    ev = load_table(spark, sf_dir, "events")
    return cuped_ab_test(ev).orderBy("arm")


@register("graph_adamic_adar", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
und AS (SELECT DISTINCT a.i AS ea, b.i AS eb
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
adj AS (SELECT ea AS node, eb AS nb FROM und
        UNION ALL SELECT eb, ea FROM und),
deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),
cen AS (SELECT node,
               CAST(round(1e6 / ln(CAST(deg AS DOUBLE)), 0) AS BIGINT)
                   AS cw
        FROM deg WHERE deg BETWEEN 2 AND 64),
ac AS (SELECT adj.node, adj.nb, cen.cw FROM adj JOIN cen USING (node)),
w AS (SELECT l.nb AS a, r.nb AS b, l.cw
      FROM ac l JOIN ac r ON l.node = r.node AND l.nb < r.nb),
sc AS (SELECT a, b, CAST(sum(cw) AS BIGINT) AS score_e6,
              count(*) AS common_neighbors
       FROM w GROUP BY a, b),
na AS (SELECT sc.* FROM sc WHERE NOT EXISTS
         (SELECT 1 FROM und WHERE und.ea = sc.a AND und.eb = sc.b))
SELECT a, b, common_neighbors,
       round(score_e6 / 1e6, 6) AS aa_score
FROM na ORDER BY score_e6 DESC, a, b LIMIT 50
""")
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Adamic-Adar link prediction on the co-purchase graph: top-50
    # non-adjacent part pairs by sum of 1/ln(deg) over common
    # neighbors; hub centers capped at deg 64, contributions quantized
    # to 1e-6 integers (operators/analytics.adamic_adar)
    from ..operators.analytics import adamic_adar
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return adamic_adar(pairs, "pa", "pb", max_center_degree=64, k=50)


@register("events_markov_transitions", """
WITH t AS (SELECT user_id, ts, event_id, event_type AS to_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                      AS from_type
           FROM events),
m AS (SELECT from_type, to_type, count(*) AS n
      FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2),
r AS (SELECT *, CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
                    AS row_total
      FROM m)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n, row_total,
       round(n / CAST(row_total AS DOUBLE), 6) AS p
FROM r ORDER BY from_type, to_type
""")
def events_markov_transitions(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    # first-order Markov transition matrix over per-user event-type
    # sequences: deterministic (ts, event_id) ordering, exact counts,
    # one row-normalizing division (operators/analytics.
    # markov_transitions)
    from ..operators.analytics import markov_transitions
    ev = load_table(spark, sf_dir, "events")
    return markov_transitions(ev).orderBy("from_type", "to_type")


@register("graph_k_core", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
und AS (SELECT DISTINCT a.i AS ea, b.i AS eb
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
e AS (SELECT ea AS src, eb AS dst FROM und
      UNION ALL SELECT eb, ea FROM und),
a0 AS (SELECT DISTINCT src FROM e),
d1 AS (SELECT e.src, count(*) AS d FROM e
       JOIN a0 x ON e.src = x.src JOIN a0 y ON e.dst = y.src
       GROUP BY e.src),
a1 AS (SELECT src FROM d1 WHERE d >= 3),
d2 AS (SELECT e.src, count(*) AS d FROM e
       JOIN a1 x ON e.src = x.src JOIN a1 y ON e.dst = y.src
       GROUP BY e.src),
a2 AS (SELECT src FROM d2 WHERE d >= 3),
d3 AS (SELECT e.src, count(*) AS d FROM e
       JOIN a2 x ON e.src = x.src JOIN a2 y ON e.dst = y.src
       GROUP BY e.src),
a3 AS (SELECT src FROM d3 WHERE d >= 3),
d4 AS (SELECT e.src, count(*) AS d FROM e
       JOIN a3 x ON e.src = x.src JOIN a3 y ON e.dst = y.src
       GROUP BY e.src),
a4 AS (SELECT src FROM d4 WHERE d >= 3),
d5 AS (SELECT e.src, count(*) AS d FROM e
       JOIN a4 x ON e.src = x.src JOIN a4 y ON e.dst = y.src
       GROUP BY e.src)
SELECT src AS node, CAST(d AS BIGINT) AS deg
FROM d5 WHERE d >= 3 ORDER BY node
""")
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bounded-round 3-core of the co-purchase graph: 5 peel rounds
    # (degree recount vs survivors), unrolled CTE-for-CTE in the
    # oracle; operators/analytics.k_core
    from ..operators.analytics import k_core
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return k_core(pairs, "pa", "pb", k=3, rounds=5)


@register("events_bot_flags", """
WITH pm AS (SELECT user_id, date_trunc('minute', ts) AS mn, count(*) AS c
            FROM events GROUP BY 1, 2),
peak AS (SELECT user_id, CAST(max(c) AS BIGINT) AS peak_per_min
         FROM pm GROUP BY user_id),
g AS (SELECT user_id,
             floor(epoch(ts))
               - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id))) AS g
      FROM events),
f AS (SELECT user_id, CAST(g AS BIGINT) AS g FROM g WHERE g IS NOT NULL),
mom AS (SELECT user_id, count(*) AS n,
               CAST(sum(g) AS BIGINT) AS s1,
               CAST(sum(g * g) AS BIGINT) AS s2
        FROM f GROUP BY user_id),
cv AS (SELECT user_id, n AS n_gaps,
              CASE WHEN n > 1 AND s1 > 0 THEN
                CAST(round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                        / (CAST(n AS DOUBLE) - 1))
                     / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * 1e6, 0) AS BIGINT)
              END AS cv_e6
       FROM mom)
SELECT p.user_id, p.peak_per_min, cv.n_gaps,
       cv.cv_e6 / 1000000.0 AS gap_cv,
       (p.peak_per_min >= 10
        OR (cv.cv_e6 IS NOT NULL AND cv.cv_e6 < 300000)) AS bot_suspect
FROM peak p LEFT JOIN cv USING (user_id)
ORDER BY p.user_id
""")
def events_bot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rule-based bot screening: burst rate (peak events/minute) +
    # inter-arrival regularity (CV of whole-second gaps) with
    # thresholds compared on quantized values
    # (operators/analytics.bot_flags)
    from ..operators.analytics import bot_flags
    ev = load_table(spark, sf_dir, "events")
    return bot_flags(ev)


def _markov_attr_sql(iters: int = 8) -> str:
    """Generated oracle for markov_attribution: the same shared
    transition CTEs, then per scenario (full + one per removed
    channel) the power iteration unrolled ``iters`` times with
    identical per-edge floor arithmetic."""
    touches = ("click", "signup", "view")
    parts = ["""
WITH fe AS (SELECT user_id, ts, event_id,
                   CASE WHEN event_type = 'purchase' THEN 'CONV'
                        ELSE event_type END AS st
            FROM events
            WHERE event_type IN ('view', 'click', 'signup', 'purchase')),
o AS (SELECT st,
             lag(st) OVER w AS prev_st,
             lead(st) OVER w AS next_st
      FROM fe WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
tr AS (SELECT prev_st AS f, st AS t FROM o
       WHERE prev_st IS NOT NULL AND prev_st <> 'CONV'
       UNION ALL
       SELECT 'START', st FROM o
       WHERE st <> 'CONV' AND (prev_st IS NULL OR prev_st = 'CONV')
       UNION ALL
       SELECT st, 'NULL' FROM o
       WHERE st <> 'CONV' AND next_st IS NULL),
cnt AS (SELECT f, t, count(*) AS c FROM tr GROUP BY f, t),
tot AS (SELECT f, CAST(sum(c) AS BIGINT) AS rt FROM cnt GROUP BY f),
m_full AS (SELECT cnt.f, cnt.t,
                  CAST((cnt.c * 1000000) // tot.rt AS BIGINT) AS p
           FROM cnt JOIN tot USING (f))"""]
    for ch in touches:
        parts.append(f""",
m_{ch} AS (SELECT f,
                  CASE WHEN t = '{ch}' THEN 'NULL' ELSE t END AS t,
                  CAST(sum(p) AS BIGINT) AS p
           FROM m_full WHERE f <> '{ch}' GROUP BY 1, 2)""")
    for scen in ("full",) + touches:
        parts.append(f""",
v_{scen}_0 AS (SELECT 'CONV' AS s, CAST(1000000 AS BIGINT) AS v)""")
        for k in range(1, iters + 1):
            parts.append(f""",
v_{scen}_{k} AS (
  SELECT m.f AS s, CAST(sum((m.p * vv.v) // 1000000) AS BIGINT) AS v
  FROM m_{scen} m JOIN v_{scen}_{k - 1} vv ON m.t = vv.s
  GROUP BY m.f
  UNION ALL SELECT 'CONV', CAST(1000000 AS BIGINT))""")
    union = "\n  UNION ALL\n".join(
        f"""  SELECT '{ch}' AS channel,
         coalesce((SELECT v FROM v_full_{iters} WHERE s = 'START'), 0)
             AS fullv,
         coalesce((SELECT v FROM v_{ch}_{iters} WHERE s = 'START'), 0)
             AS remv""" for ch in touches)
    parts.append(f""",
res AS (
{union}
)
SELECT channel,
       fullv / 1000000.0 AS p_conv,
       remv / 1000000.0 AS p_conv_removed,
       CASE WHEN fullv - remv >= 0
            THEN CAST(floor((2 * ((fullv - remv) * 1000000) + fullv)
                            / (2 * fullv)) AS BIGINT)
            ELSE -CAST(floor((2 * -((fullv - remv) * 1000000) + fullv)
                             / (2 * fullv)) AS BIGINT)
       END / 1000000.0 AS removal_effect
FROM res ORDER BY channel""")
    return "".join(parts)


@register("events_markov_attribution", _markov_attr_sql(8))
def events_markov_attribution(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    # Markov removal-effect attribution: distributed path/transition
    # extraction, control-plane-sized absorbing-chain iteration in
    # exact 1e-6 fixed-point (operators/analytics.markov_attribution);
    # the oracle unrolls the same iterations from a generator
    from ..operators.analytics import markov_attribution
    ev = load_table(spark, sf_dir, "events")
    return markov_attribution(ev)


@register("graph_degree_distribution", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
und AS (SELECT DISTINCT a.i AS ea, b.i AS eb
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
adj AS (SELECT ea AS node FROM und UNION ALL SELECT eb FROM und),
deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY node),
h AS (SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS deg_bin,
             count(*) AS n_nodes
      FROM deg GROUP BY 1),
tot AS (SELECT CAST(sum(n_nodes) AS BIGINT) AS n_total FROM h),
lt AS (SELECT deg_bin, CAST(n_nodes AS BIGINT) AS n_nodes,
              CAST(sum(n_nodes) OVER (ORDER BY deg_bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS tail_nodes
       FROM h)
SELECT deg_bin, n_nodes, tail_nodes,
       CAST(floor((2 * (tail_nodes * 1000000) + tot.n_total)
                  / (2 * tot.n_total)) AS BIGINT) / 1000000.0
           AS tail_share
FROM lt, tot ORDER BY deg_bin
""")
def graph_degree_distribution(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    # log2-binned degree histogram (integer bit-length bins, no float
    # log) + cumulative tail shares — the hub-cap sizing profile for
    # the wedge-expansion graph operators
    from ..operators.analytics import degree_distribution
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return degree_distribution(pairs, "pa", "pb")


@register("orders_abc_pareto", """
WITH rev AS (SELECT l_partkey,
                    CAST(sum(CAST(round(l_extendedprice * 100, 0)
                                  AS BIGINT)) AS BIGINT) AS rev_c
             FROM lineitem GROUP BY l_partkey),
tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total_c FROM rev),
run AS (SELECT l_partkey, rev_c,
               CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS running_c
        FROM rev),
cls AS (SELECT rev_c,
               CASE WHEN floor((running_c * 1000000) / tot.total_c)
                         <= 700000 THEN 'A'
                    WHEN floor((running_c * 1000000) / tot.total_c)
                         <= 900000 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM run, tot),
agg AS (SELECT abc_class, count(*) AS n_keys,
               CAST(sum(rev_c) AS BIGINT) AS class_rev_c
        FROM cls GROUP BY abc_class)
SELECT abc_class, n_keys,
       class_rev_c / 100.0 AS revenue,
       CAST(floor((2 * (class_rev_c * 1000000) + tot.total_c)
                  / (2 * tot.total_c)) AS BIGINT) / 1000000.0
           AS rev_share
FROM agg, tot ORDER BY abc_class
""")
def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ABC/Pareto inventory classes over part revenue, built on
    # distributed_running_total (range-partitioned prefix sums — no
    # single-partition cumulative window); exact integer cents and
    # floor/half-away arithmetic throughout
    from ..operators.analytics import abc_pareto
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return abc_pareto(li, "l_partkey", cents)


@register("events_engagement_dau_mau", """
WITH ud AS (SELECT DISTINCT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
            FROM events),
days AS (SELECT DISTINCT day FROM ud),
dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM ud GROUP BY day),
fan AS (SELECT d.day AS day, u.user_id, u.day AS uday
        FROM ud u JOIN days d
          ON u.day <= d.day AND u.day > d.day - INTERVAL 30 DAY),
roll AS (SELECT day,
                CAST(count(DISTINCT CASE WHEN uday > day - INTERVAL 7 DAY
                                         THEN user_id END) AS BIGINT)
                    AS wau,
                CAST(count(DISTINCT user_id) AS BIGINT) AS mau
         FROM fan GROUP BY day)
SELECT d.day, d.dau, r.wau, r.mau,
       CAST(floor((2 * (d.dau * 1000000) + r.mau) / (2 * r.mau))
            AS BIGINT) / 1000000.0 AS stickiness
FROM dau d JOIN roll r USING (day)
ORDER BY d.day
""")
def events_engagement_dau_mau(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    # DAU/WAU/MAU + stickiness: (user, day) reduction first, bounded
    # 30x fan-out against the calendar grid, half-away ratio
    from ..operators.analytics import engagement_metrics
    ev = load_table(spark, sf_dir, "events")
    return engagement_metrics(ev)
