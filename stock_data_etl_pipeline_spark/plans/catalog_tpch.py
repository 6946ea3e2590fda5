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
