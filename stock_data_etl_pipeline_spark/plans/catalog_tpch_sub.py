"""Catalog entries: subquery-heavy TPC-H shapes — correlated scalar
subqueries, EXISTS / NOT EXISTS double correlation, scalar-threshold
HAVING — each decorrelated into the aggregate+join plans Spark executes
well at scale (no per-row re-execution, no driver loops).

Schema adaptations (this star schema has no partsupp, l_shipmode,
l_commitdate/l_receiptdate or c_phone):
- the supplier-part "offer" relation (Q2/Q11/Q20's partsupp) is derived
  from lineitem: a supplier offers a part iff it ever shipped it, at
  unit price l_extendedprice / l_quantity;
- Q4's "committed late" predicate becomes l_shipdate > o_orderdate + 60d;
- Q9's supply cost becomes 0.6 * p_retailprice per unit;
- Q21's "failed delivery" lineitem predicate becomes l_linestatus = 'F';
- Q22's phone-prefix filter becomes a market-segment filter.
The decorrelation strategy (the part that matters for parity) follows the
reference's query semantics; shapes are the standard TPC-H ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .catalog import register


@register("q2_min_cost_supplier", """
WITH eu_supp AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'),
fp AS (SELECT p_partkey, p_name FROM part WHERE p_type = 'LARGE'),
offers AS (
  SELECT l.l_partkey, l.l_suppkey,
         min(floor(l.l_extendedprice / l.l_quantity * 100 + 0.5) / 100) AS cost
  FROM lineitem l
  JOIN fp ON fp.p_partkey = l.l_partkey
  JOIN eu_supp es ON es.s_suppkey = l.l_suppkey
  GROUP BY 1, 2),
mins AS (SELECT l_partkey, min(cost) AS min_cost FROM offers GROUP BY 1)
SELECT es.s_acctbal, es.s_name, es.n_name AS nation,
       fp.p_partkey, fp.p_name, o.cost AS min_cost
FROM offers o
JOIN mins m ON m.l_partkey = o.l_partkey AND o.cost = m.min_cost
JOIN eu_supp es ON es.s_suppkey = o.l_suppkey
JOIN fp ON fp.p_partkey = o.l_partkey
ORDER BY es.s_acctbal DESC, es.s_name, fp.p_partkey
LIMIT 20
""")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q2 shape: correlated min subquery ("the supplier offering this
    # part at the region-wide minimum cost"), decorrelated into a per-part
    # min aggregate joined back on (partkey, cost). Scale plan: the offer
    # relation is built only over the part-filtered, region-filtered slice
    # (two broadcast semi-joins BEFORE the groupBy), so the only shuffle
    # over real data is the per-(part,supplier) aggregate; the per-part
    # min table is tiny and broadcasts back. Unit cost is rounded to 2 dp
    # BEFORE the min so the tie set is engine-stable; the rounding is
    # explicit integer-cents (floor(x*100+0.5)/100) because engines'
    # round(double, 2) disagree exactly at .xx5 boundaries (shortest-
    # decimal HALF_UP vs double multiply) and both sides here run the
    # same double arithmetic.
    eu_supp = (load_table(spark, sf_dir, "supplier")
               .join(F.broadcast(load_table(spark, sf_dir, "nation")),
                     F.col("s_nationkey") == F.col("n_nationkey"))
               .join(F.broadcast(load_table(spark, sf_dir, "region")
                                 .filter(F.col("r_name") == "EUROPE")),
                     F.col("n_regionkey") == F.col("r_regionkey"))
               .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    fp = (load_table(spark, sf_dir, "part")
          .filter(F.col("p_type") == "LARGE")
          .select("p_partkey", "p_name"))
    li = load_table(spark, sf_dir, "lineitem")
    offers = (li.join(F.broadcast(fp.select("p_partkey")),
                      li["l_partkey"] == F.col("p_partkey"), "left_semi")
              .join(F.broadcast(eu_supp.select("s_suppkey")),
                    li["l_suppkey"] == F.col("s_suppkey"), "left_semi")
              .groupBy("l_partkey", "l_suppkey")
              .agg(F.min(F.floor(F.col("l_extendedprice")
                                 / F.col("l_quantity") * 100 + 0.5) / 100)
                   .alias("cost")))
    mins = (offers.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
            .withColumnRenamed("l_partkey", "m_partkey"))
    return (offers.join(F.broadcast(mins),
                        (offers["l_partkey"] == F.col("m_partkey"))
                        & (offers["cost"] == F.col("min_cost")))
            .join(F.broadcast(eu_supp),
                  offers["l_suppkey"] == eu_supp["s_suppkey"])
            .join(F.broadcast(fp), offers["l_partkey"] == fp["p_partkey"])
            .select("s_acctbal", "s_name", F.col("n_name").alias("nation"),
                    "p_partkey", "p_name", F.col("cost").alias("min_cost"))
            .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
            .limit(20))


@register("q4_priority_exists", """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""")
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q4 shape: correlated EXISTS over the fact -> left-semi join
    # with a non-equi residual (shipdate > orderdate + 60d). The date
    # window prunes orders at the scan; the semi-join is a single
    # hash-join on orderkey with the residual evaluated on matches —
    # no distinct, no double-read of lineitem.
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (o.join(li, late, "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@register("q7_volume_shipping", """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01') shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""")
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q7 shape: bilateral trade volume between two nations by year.
    # The nation-pair disjunction is evaluated after both broadcast dim
    # joins; supplier and customer joins broadcast, so the only shuffle
    # over the date-pruned fact is lineitem->orders and the final
    # 3-key aggregate.
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = load_table(spark, sf_dir, "nation")
    s = (load_table(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("supp_nation"))
         .filter(F.col("supp_nation").isin("NATION_1", "NATION_2")))
    c = (load_table(spark, sf_dir, "customer")
         .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .select("c_custkey", F.col("n_name").alias("cust_nation"))
         .filter(F.col("cust_nation").isin("NATION_1", "NATION_2")))
    j = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
         .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
         .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
         .filter(F.col("supp_nation") != F.col("cust_nation")))
    return (j.withColumn("l_year", F.year("l_shipdate"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


@register("q8_market_share", """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 4) AS mkt_share
FROM (SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01') all_nations
GROUP BY o_year
ORDER BY o_year
""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q8 shape: one nation's share of a region's market for a part
    # type, by year — conditional-sum ratio, so a single pass computes
    # both numerator and denominator (no second scan, no self-join).
    # Every dim broadcasts; the fact shuffles once (to orders).
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    n = load_table(spark, sf_dir, "nation")
    r = (load_table(spark, sf_dir, "region")
         .filter(F.col("r_name") == "AMERICA"))
    c = (load_table(spark, sf_dir, "customer")
         .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
         .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
         .select("c_custkey"))
    s = (load_table(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"], "left_semi")
         .join(o, F.col("l_orderkey") == o["o_orderkey"])
         .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "left_semi")
         .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"]))
    return (j.withColumn("o_year", F.year("o_orderdate"))
            .groupBy("o_year")
            .agg(F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                      .otherwise(F.lit(0.0))) / F.sum(vol), 4)
                 .alias("mkt_share"))
            .orderBy("o_year"))


@register("q9_product_profit", """
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%red%') profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""")
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q9 shape: profit by supplier nation and year for a part-name
    # slice; supply cost adapted to 0.6 * p_retailprice per unit (no
    # partsupp table). The p_name LIKE filter prunes via broadcast
    # semi-ish join (inner, since p_retailprice is needed); nation and
    # supplier broadcast; one fact shuffle to orders.
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_name").contains("red"))
         .select("p_partkey", "p_retailprice"))
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation")
    s = (load_table(spark, sf_dir, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", F.col("n_name").alias("nation")))
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.6 * F.col("p_retailprice") * F.col("l_quantity"))
    j = (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
         .join(o, li["l_orderkey"] == o["o_orderkey"])
         .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"]))
    return (j.withColumn("o_year", F.year("o_orderdate"))
            .groupBy("nation", "o_year")
            .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
            .orderBy("nation", F.col("o_year").desc()))


@register("q11_important_parts", """
WITH asia_supp AS (
  SELECT s.s_suppkey FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'),
pv AS (SELECT l.l_partkey,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS part_value
       FROM lineitem l
       WHERE l.l_suppkey IN (SELECT s_suppkey FROM asia_supp)
       GROUP BY 1)
SELECT l_partkey AS p_partkey, part_value
FROM pv
WHERE part_value > (SELECT sum(part_value) * 0.001 FROM pv)
ORDER BY part_value DESC, p_partkey
""")
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q11 shape: parts whose (region-restricted) traded value
    # exceeds a fraction of the total — a HAVING against a scalar
    # subquery over the same aggregate. Decorrelated: compute the
    # per-part aggregate once, cache-reuse it for both the scalar total
    # (one extra reduce over already-aggregated rows) and the filter;
    # the scalar broadcasts via crossJoin. Per-part values are rounded
    # before both the total and the comparison so the threshold set is
    # engine-stable.
    supp = (load_table(spark, sf_dir, "supplier")
            .join(F.broadcast(load_table(spark, sf_dir, "nation")),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(load_table(spark, sf_dir, "region")
                              .filter(F.col("r_name") == "ASIA")),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("s_suppkey"))
    li = load_table(spark, sf_dir, "lineitem")
    pv = (li.join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"],
                  "left_semi")
          .groupBy("l_partkey")
          .agg(F.round(F.sum(F.col("l_extendedprice")
                             * (1 - F.col("l_discount"))), 2)
               .alias("part_value")))
    total = pv.agg((F.sum("part_value") * 0.001).alias("threshold"))
    return (pv.crossJoin(F.broadcast(total))
            .filter(F.col("part_value") > F.col("threshold"))
            .select(F.col("l_partkey").alias("p_partkey"), "part_value")
            .orderBy(F.col("part_value").desc(), "p_partkey"))


@register("q20_part_promotion", """
WITH rp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
shipped AS (SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
            FROM lineitem l
            JOIN rp ON rp.p_partkey = l.l_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2)
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (SELECT DISTINCT l_suppkey FROM shipped WHERE qty > 40)
ORDER BY s.s_name
""")
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q20 shape: nested IN-subqueries (suppliers who moved real
    # volume of a name-sliced part family in a year) -> two broadcast
    # semi-joins and one small aggregate. The fact is pruned by date at
    # the scan and by part via broadcast semi-join BEFORE the
    # (suppkey, partkey) aggregate, so the aggregate input is tiny.
    rp = (load_table(spark, sf_dir, "part")
          .filter(F.col("p_name").startswith("red")).select("p_partkey"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    qual = (li.join(F.broadcast(rp), li["l_partkey"] == rp["p_partkey"],
                    "left_semi")
            .groupBy("l_suppkey", "l_partkey")
            .agg(F.sum("l_quantity").alias("qty"))
            .filter(F.col("qty") > 40)
            .select("l_suppkey").distinct())
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (s.join(F.broadcast(qual), s["s_suppkey"] == qual["l_suppkey"],
                   "left_semi")
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_name", F.col("n_name").alias("nation"))
            .orderBy("s_name"))


@register("q21_waiting_supplier", """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F' AND l1.l_linestatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_linestatus = 'F')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""")
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q21 shape: double-correlated EXISTS / NOT EXISTS ("another
    # supplier touched the order" / "no OTHER supplier also failed it").
    # Decorrelated into ONE per-order aggregate instead of two extra
    # fact joins: for the 'F'-status orders compute
    # n_supp = countDistinct(supplier) and f_supp = the set-size of
    # failing suppliers; then a row of supplier s qualifies iff
    # n_supp >= 2 (someone else exists) AND f_supp == 1 (s is the only
    # failer — l1 itself is failing, so the lone failer IS s). The
    # order-stats table is one narrow row per order, joined back to the
    # failing lineitems on the (already co-shuffled) orderkey.
    o_f = (load_table(spark, sf_dir, "orders")
           .filter(F.col("o_orderstatus") == "F").select("o_orderkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_linestatus")
          .join(F.broadcast(o_f), F.col("l_orderkey") == o_f["o_orderkey"],
                "left_semi"))
    # two-level distinct instead of two countDistinct aggregates: the
    # per-(order,supplier) pre-agg is map-side-combinable and avoids the
    # Expand x2 a multi-distinct plan needs — ~20% faster at sf0.1 and
    # the skew-safe shape at 100 TB (a hot order never expands)
    pair = (li.groupBy("l_orderkey", "l_suppkey")
            .agg(F.max(F.when(F.col("l_linestatus") == "F", 1)
                       .otherwise(0)).alias("failed")))
    stats = (pair.groupBy("l_orderkey")
             .agg(F.count(F.lit(1)).alias("n_supp"),
                  F.sum("failed").alias("f_supp")))
    l1 = li.filter(F.col("l_linestatus") == "F")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    qual = (l1.join(stats, "l_orderkey")
            .filter((F.col("n_supp") >= 2) & (F.col("f_supp") == 1)))
    return (qual.join(F.broadcast(s), qual["l_suppkey"] == s["s_suppkey"])
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(20))


@register("q22_idle_customers", """
WITH seg AS (SELECT * FROM customer
             WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')),
avg_bal AS (SELECT avg(c_acctbal) AS ab FROM seg WHERE c_acctbal > 0.0)
SELECT c_mktsegment, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM seg
WHERE c_acctbal > (SELECT ab FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = seg.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""")
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q22 shape: wealthy-but-idle accounts — scalar-average
    # subquery threshold + anti-join against the order fact (segment
    # filter stands in for the phone-prefix slice; "idle" = no order in
    # the trailing window, so the date filter prunes the anti side at
    # the scan). The scalar avg broadcasts via crossJoin; NOT EXISTS is
    # a left-anti join on the customer key, only o_custkey read.
    seg = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY"))
    avg_bal = (seg.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("ab")))
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
         .select("o_custkey"))
    return (seg.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("ab"))
            .join(o, seg["c_custkey"] == o["o_custkey"], "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
            .orderBy("c_mktsegment"))


@register("q12_priority_classes", """
SELECT l.l_returnflag AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""")
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q12 shape (l_returnflag standing in for l_shipmode): urgent
    # vs non-urgent line counts per class — both classes counted in ONE
    # pass via conditional sums, date window pruned at the scan, single
    # fact-to-orders shuffle.
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy(F.col("l_returnflag").alias("ship_class"))
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("ship_class"))
