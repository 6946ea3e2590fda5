"""Catalog entries: TPC-H-shaped analytics over the star schema — the
classic OLAP patterns (fact-dim join + agg + top-N, multi-dim join chain,
having-style group filter) that exercise join ordering, partial
aggregation and broadcast planning at once. Names follow the TPC-H query
each is shaped after (adapted to the columns this schema has).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import register


@register("q3_shipping_priority", """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3 shape: selective dim filter -> fact join -> agg -> top-N.
    # Catalyst pushes both date predicates to the scans; customer is
    # broadcast; only the grouped aggregate shuffles.
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
           .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]))
    return (j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
            .limit(10))


@register("q1_pricing_summary_sql", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")
def q1_pricing_summary_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the SQL-API surface: same engine, same Catalyst plan — queries can be
    # written as SQL over the registered views (sources.register_views)
    from ..sources.registry import register_views
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")


@register("q5_local_supplier_volume", """
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
""")
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5 shape: 5-way join with a same-nation co-location predicate
    # between customer and supplier. All dims broadcast; the only big
    # shuffle is lineitem->orders.
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
           .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
           .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
           .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
           .join(F.broadcast(s), (li["l_suppkey"] == s["s_suppkey"])
                 & (s["s_nationkey"] == n["n_nationkey"])))
    return (j.groupBy(F.col("n_name").alias("nation"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "nation"))


@register("q17_small_quantity_revenue", """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""")
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q17 shape: correlated scalar subquery (per-part average)
    # decorrelated into an aggregate + join. The per-part average only
    # matters for the brand-filtered parts, so the fact is semi-joined to
    # the (broadcast) filtered part dim FIRST — the threshold aggregate
    # runs over that small slice, not the whole fact, and the resulting
    # per-key threshold table is small enough to broadcast back. At 100x
    # this avoids a full-fact shuffle whose output is mostly discarded.
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_brand") == "Brand#13").select("p_partkey"))
    brand_li = li.join(
        F.broadcast(p), li["l_partkey"] == p["p_partkey"], "left_semi")
    thresholds = (brand_li.groupBy("l_partkey")
                  .agg((F.avg("l_quantity") * 0.2).alias("qty_threshold")))
    j = (brand_li.join(F.broadcast(thresholds), "l_partkey")
         .filter(F.col("l_quantity") < F.col("qty_threshold")))
    return j.agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))


@register("q18_large_volume_customer", """
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
""")
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q18 shape: HAVING-filtered semi-join back onto the fact —
    # the grouped subquery is tiny after the HAVING, so it broadcasts
    # into the semi-join.
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
           .filter(F.col("q") > 150).select("l_orderkey"))
    j = (li.join(F.broadcast(big), "l_orderkey", "left_semi")
           .join(o, li["l_orderkey"] == o["o_orderkey"])
           .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]))
    return (j.groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
            .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(20))


@register("q6_revenue_change", """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q6 shape: pure filter+agg, zero joins — the query whose whole
    # cost is the scan, so every predicate must reach the parquet reader
    # (plan shows all four in PushedFilters).
    li = load_table(spark, sf_dir, "lineitem")
    f = (li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                   & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                   & (F.col("l_discount") >= 0.05)
                   & (F.col("l_discount") <= 0.07)
                   & (F.col("l_quantity") < 24)))
    return f.agg(F.round(F.sum(F.col("l_extendedprice")
                               * F.col("l_discount")), 2).alias("revenue"))


@register("q10_returned_items", """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       c.c_acctbal
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q10 shape: who returned the most revenue — fact filtered on
    # returnflag, one shuffle for the grouped agg, customer broadcast.
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
           .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]))
    return (j.groupBy("c_custkey", "c_name", "c_acctbal")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "c_acctbal")
            .orderBy(F.col("revenue").desc(), "c_custkey").limit(20))


@register("q13_customer_distribution", """
SELECT c_count, count(*) AS custdist
FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""")
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q13 shape: two-level aggregation (orders per customer, then
    # the histogram of those counts) with an outer join preserving
    # zero-order customers.
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (c.join(o, c["c_custkey"] == o["o_custkey"], "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@register("q14_promo_effect", """
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4)
       AS promo_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
""")
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q14 shape: conditional aggregation ratio over a broadcast dim
    # join — one scan, no extra shuffle for the CASE split.
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4)
                 .alias("promo_revenue_pct")))


@register("q15_top_supplier", """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s.s_suppkey
""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q15 shape: aggregate -> max-of-aggregate filter (ties kept).
    # Rounding the per-supplier revenue BEFORE the max comparison makes
    # the tie set engine-stable. The scalar max broadcasts.
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp")))
    s = load_table(spark, sf_dir, "supplier")
    rev = (li.groupBy("l_suppkey")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev") == F.col("mx"))
            .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
            .select("s_suppkey", "s_name", "total_rev")
            .orderBy("s_suppkey"))


@register("q16_supplier_counts", """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13' AND p.p_size IN (5, 11, 28, 37)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""")
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q16 shape (adapted to this schema's lineitem-derived
    # supplier-part relation): negated dim filter + IN-list, exact
    # distinct count per 3-part key.
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(5, 11, 28, 37))
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


@register("q19_bracket_or", """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""")
def q19_bracket_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q19 shape: disjunctive bracket predicates spanning both join
    # sides — the join stays an equi-join on partkey, the OR brackets
    # evaluate post-join (Catalyst can't split them), part broadcast.
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    def bracket(brand, s_lo, s_hi, q_lo, q_hi):
        return ((F.col("p_brand") == brand)
                & F.col("p_size").between(s_lo, s_hi)
                & F.col("l_quantity").between(q_lo, q_hi))
    cond = (bracket("Brand#2", 1, 15, 1, 11)
            | bracket("Brand#17", 10, 30, 10, 20)
            | bracket("Brand#25", 20, 50, 20, 30))
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2).alias("revenue"))
