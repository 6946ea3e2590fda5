"""Catalog entries (round 7): quant signal-quality metrics over the
tick stream and layout/packing report cards over the corpus.

Stock side — the standard next steps after the indicator family: a
candlestick-pattern census (integer-cents comparisons), the
Lo–MacKinlay variance-ratio test (random-walk diagnostic), and the
daily cross-sectional Spearman information coefficient (signal quality
for a cross-sectional strategy). Corpus/ops side — the packing report
that decides attention-masking policy (how many docs get split across
sequences) and the small-file compaction planner (sequential
target-size rewrite bins on the hot-safe prefix-sum primitive).

Determinism follows the house rules: integer grids for every summed
quantity, leaf-cast doubles with identical association for the one
cubic-in-n formula (variance ratio), booleans and ranks as pure
functions of exact integers, and a single IEEE division at emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import corpus as CP
from ..operators import indicators as ind
from ..operators.layout import compaction_bins
from ..sources.registry import load_table
from .catalog import register
from .catalog_stock import _BARS_CTE
from .catalog_text import _WORDS


@register("stock_candlestick_flags", _BARS_CTE + """
, cts AS (
  SELECT event_type, hr,
         CAST(round(open * 100, 0) AS BIGINT) AS o,
         CAST(round(high * 100, 0) AS BIGINT) AS h,
         CAST(round(low  * 100, 0) AS BIGINT) AS l,
         CAST(round(close * 100, 0) AS BIGINT) AS c
  FROM bars
), lagd AS (
  SELECT *,
         lag(o) OVER (PARTITION BY event_type ORDER BY hr) AS po,
         lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM cts
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_bars,
       CAST(sum(CASE WHEN h - l > 0 AND abs(c - o) * 10 <= h - l
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_doji,
       CAST(sum(CASE WHEN abs(c - o) > 0
                      AND least(o, c) - l >= 2 * abs(c - o)
                      AND h - greatest(o, c) <= abs(c - o)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hammer,
       CAST(sum(CASE WHEN pc < po AND c > o AND c >= po AND o <= pc
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bull_engulf,
       CAST(sum(CASE WHEN pc > po AND c < o AND o >= pc AND c <= po
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bear_engulf
FROM lagd
GROUP BY event_type
ORDER BY event_type
""")
def stock_candlestick_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pattern census on exact integer cents — every boolean an integer
    # comparison, one lag window + one hash-agg per symbol.
    ev = load_table(spark, sf_dir, "events")
    return (ind.candlestick_flags(ind.hourly_bars(ev))
            .orderBy("event_type"))


@register("stock_variance_ratio", _BARS_CTE + f"""
, f AS (SELECT event_type, hr, close FROM bars WHERE low > 0),
lr AS (
  SELECT event_type, hr,
         CAST(round(ln(close / lag(close) OVER (
             PARTITION BY event_type ORDER BY hr)) * 1e6, 0) AS BIGINT)
           AS r
  FROM f
), rr AS (
  SELECT event_type, hr, r,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM lr WHERE r IS NOT NULL
), rq AS (
  SELECT event_type, rn,
         sum(r) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN {ind.VR_Q - 1} PRECEDING
                      AND CURRENT ROW) AS rqs
  FROM rr
), one AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n1,
         CAST(sum(r) AS BIGINT) AS s1,
         CAST(sum(r * r) AS BIGINT) AS ss1
  FROM rr GROUP BY event_type
), qs AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nq,
         CAST(sum(rqs) AS BIGINT) AS sq,
         CAST(sum(rqs * rqs) AS BIGINT) AS ssq
  FROM rq WHERE rn >= {ind.VR_Q} GROUP BY event_type
)
SELECT o.event_type, o.n1, q.nq,
       CASE WHEN CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0.0
             AND nq > 0
            THEN round(
              (CAST(nq AS DOUBLE) * CAST(ssq AS DOUBLE)
               - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
              * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
              / ((CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
                  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                 * {float(ind.VR_Q)} * CAST(nq AS DOUBLE)
                 * CAST(nq AS DOUBLE)), 6)
       END AS vr
FROM one o JOIN qs q USING (event_type)
ORDER BY event_type
""")
def stock_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Random-walk diagnostic: VR(24h) per symbol over overlapping
    # q-bar log-return sums; exact integer component sums, leaf-cast
    # double formula (cubic-in-n headroom rule).
    ev = load_table(spark, sf_dir, "events")
    return ind.variance_ratio(ind.hourly_bars(ev))


@register("stock_info_coefficient", _BARS_CTE + """
, dc AS (
  SELECT event_type, CAST(date_trunc('day', hr) AS TIMESTAMP) AS day,
         close,
         row_number() OVER (PARTITION BY event_type,
                            date_trunc('day', hr)
                            ORDER BY hr DESC) AS rn
  FROM bars WHERE close > 0
), daily AS (
  -- close > 0 is applied to BARS (before the daily last-bar pick),
  -- matching the Spark side exactly: if a day's last bar were
  -- non-positive but an earlier bar positive, both engines now pick
  -- the same (earlier) bar as that day's close
  SELECT event_type, day, close FROM dc WHERE rn = 1
), rets AS (
  SELECT event_type, day,
         close / lag(close) OVER (PARTITION BY event_type
                                  ORDER BY day) - 1.0 AS sig,
         lead(close) OVER (PARTITION BY event_type
                           ORDER BY day) / close - 1.0 AS fwd
  FROM daily
), x AS (
  SELECT * FROM rets WHERE sig IS NOT NULL AND fwd IS NOT NULL
), rk AS (
  SELECT day,
         row_number() OVER (PARTITION BY day
                            ORDER BY sig, event_type) AS rank_sig,
         row_number() OVER (PARTITION BY day
                            ORDER BY fwd, event_type) AS rank_fwd
  FROM x
)
SELECT day, CAST(count(*) AS BIGINT) AS n_syms,
       CAST(sum((rank_sig - rank_fwd) * (rank_sig - rank_fwd))
            AS BIGINT) AS sum_d2,
       CASE WHEN count(*) > 1
            THEN round(1.0 - 6.0 * sum((rank_sig - rank_fwd)
                                       * (rank_sig - rank_fwd))
                       / CAST(count(*) * (count(*) * count(*) - 1)
                              AS DOUBLE), 6)
       END AS ic
FROM rk
GROUP BY day
ORDER BY day
""")
def stock_info_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Daily cross-sectional Spearman IC: exact integer rank distances,
    # one division per day. Zero daily closes drop before the lag
    # (ANSI x/0 raises in Spark where DuckDB floats to inf).
    ev = load_table(spark, sf_dir, "events")
    return ind.info_coefficient(
        ind.hourly_bars(ev).filter(F.col("close") > 0))


@register("corpus_packing_efficiency", f"""
WITH w AS (SELECT doc_id, source, len({_WORDS}) AS n_tokens
           FROM documents),
c AS (SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM w),
p AS (SELECT source, n_tokens,
             floor(cum_before / 256) AS pid,
             floor((cum_before + n_tokens - 1) / 256) AS pid_end
      FROM c),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN n_tokens >= 1 AND pid_end > pid
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
      FROM p GROUP BY source)
SELECT source, n_docs, total_tokens, n_split_docs,
       CAST(floor((total_tokens + 255) / 256) AS BIGINT) AS n_packs,
       CAST(floor((total_tokens + 255) / 256) * 256 - total_tokens
            AS BIGINT) AS tail_waste,
       CASE WHEN floor((total_tokens + 255) / 256) > 0
            THEN round(total_tokens
                       / CAST(floor((total_tokens + 255) / 256) * 256
                              AS DOUBLE) * 100.0, 6)
       END AS fill_pct
FROM a
ORDER BY source
""")
def corpus_packing_efficiency(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    # Packing report card: split-doc share decides attention masking;
    # tail waste and fill are pure integers + one division at emit.
    d = load_table(spark, sf_dir, "documents")
    return CP.packing_efficiency(d, budget=256).orderBy("source")


@register("layout_compaction_bins", """
WITH f AS (SELECT source, doc_id,
                  CAST(length(text) AS BIGINT) AS bytes
           FROM documents),
r AS (SELECT source, doc_id, bytes,
             sum(bytes) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run
      FROM f),
b AS (SELECT source, bytes,
             CAST(floor((run - bytes) / 2048) AS BIGINT) AS bin_id
      FROM r)
SELECT source, bin_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS bin_bytes,
       CAST(sum(bytes) AS BIGINT) < 1024 AS undersized
FROM b
GROUP BY source, bin_id
ORDER BY source, bin_id
""")
def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Small-file compaction plan on the hot-safe prefix-sum primitive:
    # whole files binned at 2 KiB boundaries of the per-source byte
    # stream (documents stand in for data files; at 100 TB the input
    # is the table's file manifest).
    d = load_table(spark, sf_dir, "documents")
    sized = d.select("source", "doc_id",
                     F.length("text").alias("bytes"))
    return (compaction_bins(sized, "bytes", 2048,
                            group_col="source", id_col="doc_id")
            .orderBy("source", "bin_id"))


@register("events_exact_quantiles", """
WITH v AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS v
           FROM events WHERE value IS NOT NULL),
c AS (SELECT v, count(*) AS cnt FROM v GROUP BY v),
r AS (SELECT v, sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS cum
      FROM c),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_values FROM c)
SELECT n.n_values,
       round(min(CASE WHEN r.cum >= (1 * n.n_values + 1) // 2
                      THEN r.v END) / 100.0, 2) AS q50,
       round(min(CASE WHEN r.cum >= (9 * n.n_values + 9) // 10
                      THEN r.v END) / 100.0, 2) AS q90,
       round(min(CASE WHEN r.cum >= (99 * n.n_values + 99) // 100
                      THEN r.v END) / 100.0, 2) AS q99
FROM r, n
GROUP BY n.n_values
""")
def events_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXACT global p50/p90/p99 with no global sort: counts per
    # distinct grid value, then the distributed prefix sum + integer
    # target ranks (the order-statistic consumer of
    # distributed_running_total).
    from ..operators.aggregates import exact_quantiles_by_rank
    ev = load_table(spark, sf_dir, "events")
    return exact_quantiles_by_rank(ev, "value", grid=100)


@register("graph_bfs_distance", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
            FROM lineitem),
und AS (SELECT DISTINCT a.i AS ea, b.i AS eb
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
e AS (SELECT ea AS src, eb AS dst FROM und
      UNION ALL SELECT eb, ea FROM und),
nodes AS (SELECT DISTINCT src AS node FROM e),
d0 AS (SELECT node, 0 AS dist FROM nodes WHERE node % 50 = 0),
u1 AS (SELECT e.dst AS node, d.dist + 1 AS dist
       FROM e JOIN d0 d ON e.src = d.node
       UNION ALL SELECT node, dist FROM d0),
d1 AS (SELECT node, min(dist) AS dist FROM u1 GROUP BY node),
u2 AS (SELECT e.dst AS node, d.dist + 1 AS dist
       FROM e JOIN d1 d ON e.src = d.node
       UNION ALL SELECT node, dist FROM d1),
d2 AS (SELECT node, min(dist) AS dist FROM u2 GROUP BY node),
u3 AS (SELECT e.dst AS node, d.dist + 1 AS dist
       FROM e JOIN d2 d ON e.src = d.node
       UNION ALL SELECT node, dist FROM d2),
d3 AS (SELECT node, min(dist) AS dist FROM u3 GROUP BY node)
SELECT CAST(dist AS BIGINT) AS dist,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM d3 GROUP BY dist ORDER BY dist
""")
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multi-source BFS over the co-purchase part graph (landmark seeds
    # node % 50 == 0, 3 unrolled relaxation rounds, exact integer
    # distances) — the frontier-expansion primitive the graph family
    # lacked.
    from ..operators.analytics import bfs_distance
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return bfs_distance(pairs, "pa", "pb", seed_mod=50, hops=3)


@register("embedding_scalar_quantization", """
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS x
           FROM embeddings),
dims AS (SELECT t.i AS pos, x[t.i] AS val
         FROM v, (SELECT unnest(generate_series(1, 64)) AS i) t),
s AS (SELECT pos, min(val) AS mn, max(val) AS mx FROM dims
      GROUP BY pos),
arrs AS (SELECT list(mn ORDER BY pos) AS amn,
                list(mx ORDER BY pos) AS amx
         FROM s),
r AS (
  SELECT label,
         CAST(round(list_reduce(
           list_transform(generate_series(1, 64), i ->
             CASE WHEN amx[i] - amn[i] > 0.0 THEN
               (x[i] - (amn[i]
                 + (least(floor((x[i] - amn[i]) / (amx[i] - amn[i])
                                * 256.0), 255.0) + 0.5)
                   * (amx[i] - amn[i]) / 256.0))
               * (x[i] - (amn[i]
                 + (least(floor((x[i] - amn[i]) / (amx[i] - amn[i])
                                * 256.0), 255.0) + 0.5)
                   * (amx[i] - amn[i]) / 256.0))
             ELSE 0.0 END),
           (a, b) -> a + b) * 1e12, 0) AS BIGINT) AS e
  FROM v, arrs
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(floor((2 * sum(e) + count(*)) / (2 * count(*)))
            AS BIGINT) / 1e12 AS mse
FROM r GROUP BY label ORDER BY label
""")
def embedding_scalar_quantization(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    # Int8 SQ audit: floor-bucket codes (no round() half-rule in the
    # quantize path), bucket-center dequantization, per-label MSE on a
    # 1e-12 exact integer grid. The vector-compression tier between
    # raw float32 and PQ.
    from ..operators.similarity import scalar_quantization_error
    emb = load_table(spark, sf_dir, "embeddings")
    return scalar_quantization_error(emb, "embedding", "vec_id", "label")


_CENTS_CTE = """
, cts AS (
  SELECT event_type, hr, volume,
         CAST(round(high * 100, 0) AS BIGINT) AS h,
         CAST(round(low  * 100, 0) AS BIGINT) AS l,
         CAST(round(close * 100, 0) AS BIGINT) AS c
  FROM bars
)"""


@register("stock_stochastic_kd", _BARS_CTE + _CENTS_CTE + f"""
, wn AS (
  SELECT event_type, hr, c,
         max(h) OVER win AS hh, min(l) OVER win AS ll
  FROM cts
  WINDOW win AS (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN {ind.STOCH_N - 1} PRECEDING
                 AND CURRENT ROW)
), k AS (
  SELECT event_type, hr,
         CASE WHEN hh > ll
              THEN (100000000 * (c - ll)) // (hh - ll) END AS k8
  FROM wn
), dd AS (
  SELECT event_type, hr, k8,
         CAST(sum(k8) OVER wd AS BIGINT) AS sk,
         CAST(count(k8) OVER wd AS BIGINT) AS ck
  FROM k
  WINDOW wd AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {ind.STOCH_D - 1} PRECEDING
                AND CURRENT ROW)
)
SELECT event_type, hr, k8 / 1e6 AS pct_k,
       CASE WHEN ck > 0
            THEN CAST(floor((2 * sk + ck) / (2 * ck)) AS BIGINT) / 1e6
       END AS pct_d
FROM dd ORDER BY event_type, hr
""")
def stock_stochastic_kd(spark: SparkSession, sf_dir: str) -> DataFrame:
    # %K as an exact integer quotient on cents, %D as the half-away
    # integer mean of the last 3 grid values — integer-associative
    # under any sliding-window implementation.
    ev = load_table(spark, sf_dir, "events")
    return (ind.stochastic_kd(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("stock_williams_r", _BARS_CTE + _CENTS_CTE + f"""
, wn AS (
  SELECT event_type, hr, c,
         max(h) OVER win AS hh, min(l) OVER win AS ll
  FROM cts
  WINDOW win AS (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN {ind.STOCH_N - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT event_type, hr,
       CASE WHEN hh > ll
            THEN -(((100000000 * (hh - c)) // (hh - ll)) / 1e6)
       END AS wr
FROM wn ORDER BY event_type, hr
""")
def stock_williams_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the stochastic's mirror; quotient on the non-negative numerator,
    # negated AFTER the emit division (div truncates, // floors —
    # they only agree on non-negative operands)
    ev = load_table(spark, sf_dir, "events")
    return (ind.williams_r(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("stock_obv", _BARS_CTE + _CENTS_CTE + """
, s AS (
  SELECT event_type, hr, volume,
         CAST(CASE WHEN lag(c) OVER w IS NULL THEN 0
                   WHEN c > lag(c) OVER w THEN volume
                   WHEN c < lag(c) OVER w THEN -volume
                   ELSE 0 END AS BIGINT) AS sv
  FROM cts
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
)
SELECT event_type, hr, CAST(volume AS BIGINT) AS volume,
       CAST(sum(sv) OVER (PARTITION BY event_type ORDER BY hr
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS obv
FROM s ORDER BY event_type, hr
""")
def stock_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # signed-volume running sum — pure integer cumulative window
    ev = load_table(spark, sf_dir, "events")
    return ind.obv(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_mfi", _BARS_CTE + _CENTS_CTE + f"""
, t AS (
  SELECT event_type, hr, h + l + c AS tp3,
         CAST(volume AS BIGINT) AS vol
  FROM cts
), m AS (
  SELECT event_type, hr,
         CASE WHEN lag(tp3) OVER w IS NOT NULL
                   AND tp3 > lag(tp3) OVER w
              THEN tp3 * vol ELSE 0 END AS pos,
         CASE WHEN lag(tp3) OVER w IS NOT NULL
                   AND tp3 < lag(tp3) OVER w
              THEN tp3 * vol ELSE 0 END AS neg
  FROM t
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), ww AS (
  SELECT event_type, hr,
         CAST(sum(pos) OVER wn AS BIGINT) AS p,
         CAST(sum(neg) OVER wn AS BIGINT) AS g
  FROM m
  WINDOW wn AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {ind.MFI_N - 1} PRECEDING
                AND CURRENT ROW)
)
SELECT event_type, hr,
       CASE WHEN p + g > 0
            THEN ((100000000 * p) // (p + g)) / 1e6 END AS mfi
FROM ww ORDER BY event_type, hr
""")
def stock_mfi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # money-flow index on the ×3-scaled integer typical price — every
    # flow, window sum and quotient exact
    ev = load_table(spark, sf_dir, "events")
    return ind.mfi(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("events_did_estimator", """
WITH b AS (SELECT min(ts) AS t0 FROM events),
e AS (SELECT user_id % 2 AS arm,
             CASE WHEN ts >= t0 + INTERVAL 15 DAY THEN 1 ELSE 0 END
               AS post,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events, b WHERE value IS NOT NULL),
g AS (SELECT arm, post, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
      FROM e GROUP BY arm, post),
m AS (SELECT arm, post, n,
             CASE WHEN s >= 0
                  THEN CAST(floor((2 * (s * 10000) + n) / (2 * n))
                            AS BIGINT)
                  ELSE -CAST(floor((2 * -(s * 10000) + n) / (2 * n))
                             AS BIGINT)
             END / 1e6 AS mean
      FROM g)
SELECT
  max(CASE WHEN arm = 1 AND post = 0 THEN n END) AS n_t_pre,
  max(CASE WHEN arm = 1 AND post = 1 THEN n END) AS n_t_post,
  max(CASE WHEN arm = 0 AND post = 0 THEN n END) AS n_c_pre,
  max(CASE WHEN arm = 0 AND post = 1 THEN n END) AS n_c_post,
  max(CASE WHEN arm = 1 AND post = 0 THEN mean END) AS mean_t_pre,
  max(CASE WHEN arm = 1 AND post = 1 THEN mean END) AS mean_t_post,
  max(CASE WHEN arm = 0 AND post = 0 THEN mean END) AS mean_c_pre,
  max(CASE WHEN arm = 0 AND post = 1 THEN mean END) AS mean_c_post,
  (max(CASE WHEN arm = 1 AND post = 1 THEN mean END)
   - max(CASE WHEN arm = 1 AND post = 0 THEN mean END))
  - (max(CASE WHEN arm = 0 AND post = 1 THEN mean END)
     - max(CASE WHEN arm = 0 AND post = 0 THEN mean END)) AS did
FROM m
""")
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    # difference-in-differences on deterministic arms (user_id % 2)
    # and a pre/post split 15 days after the first event; cell means
    # on the exact half-away integer grid, DiD a pure function of the
    # emitted means
    from ..operators.analytics import did_estimator
    ev = load_table(spark, sf_dir, "events")
    return did_estimator(ev, split_days=15)


@register("leadtime_quantiles_by_priority", """
WITH d AS (
  SELECT o_orderpriority AS priority,
         CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS v
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate IS NOT NULL
), c AS (SELECT priority, v, count(*) AS cnt FROM d GROUP BY 1, 2),
r AS (SELECT priority, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY priority ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM c),
n AS (SELECT priority, CAST(sum(cnt) AS BIGINT) AS n_rows
      FROM c GROUP BY priority)
SELECT r.priority, min(n.n_rows) AS n_rows,
       CAST(min(CASE WHEN cum >= (1 * n_rows + 1) // 2 THEN v END)
            AS BIGINT) AS q50,
       CAST(min(CASE WHEN cum >= (9 * n_rows + 9) // 10 THEN v END)
            AS BIGINT) AS q90,
       CAST(min(CASE WHEN cum >= (99 * n_rows + 99) // 100 THEN v END)
            AS BIGINT) AS q99
FROM r JOIN n ON r.priority = n.priority
GROUP BY r.priority
ORDER BY r.priority
""")
def leadtime_quantiles_by_priority(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    # per-priority EXACT ship-lead-time quantiles on the hot-safe
    # grouped prefix sum — no per-group sort task, all-integer output
    from ..operators.aggregates import grouped_exact_quantiles
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
         .filter(F.col("l_shipdate").isNotNull())
         .select(F.col("o_orderpriority").alias("priority"),
                 F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                 .cast("long").alias("days")))
    return (grouped_exact_quantiles(d, "priority", "days")
            .orderBy("priority"))


@register("stock_ichimoku", _BARS_CTE + _CENTS_CTE + f"""
, mids AS (
  SELECT event_type, hr, c,
         max(h) OVER w9  + min(l) OVER w9  AS t2,
         max(h) OVER w26 + min(l) OVER w26 AS k2,
         max(h) OVER w52 + min(l) OVER w52 AS s2
  FROM cts
  WINDOW w9  AS (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN {ind.ICHI_TENKAN - 1} PRECEDING
                 AND CURRENT ROW),
         w26 AS (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN {ind.ICHI_KIJUN - 1} PRECEDING
                 AND CURRENT ROW),
         w52 AS (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN {ind.ICHI_SENKOU - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT event_type, hr,
       t2 / 200.0 AS tenkan,
       k2 / 200.0 AS kijun,
       lag(t2 + k2, {ind.ICHI_KIJUN}) OVER w / 400.0 AS senkou_a,
       lag(s2, {ind.ICHI_KIJUN}) OVER w / 200.0 AS senkou_b,
       lead(c, {ind.ICHI_KIJUN}) OVER w / 100.0 AS chikou
FROM mids
WINDOW w AS (PARTITION BY event_type ORDER BY hr)
ORDER BY event_type, hr
""")
def stock_ichimoku(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cloud components as integer midline sums with one exact division
    # each at emit; shifts are integer lags/leads
    ev = load_table(spark, sf_dir, "events")
    return (ind.ichimoku(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("corpus_bigram_entropy", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
b AS (SELECT doc_id,
             unnest(list_transform(
                 generate_series(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i + 1])) AS bg
      FROM w WHERE len(ws) >= 2),
c AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY doc_id, bg),
a AS (SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(CAST(round(c * ln(c) * 1e6, 0) AS BIGINT))
                  AS BIGINT) AS t
      FROM c GROUP BY doc_id)
SELECT doc_id, n_bigrams, n_distinct,
       round(ln(n_bigrams) - (t / 1e6) / n_bigrams, 6) AS entropy
FROM a
ORDER BY doc_id
""")
def corpus_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bigram diversity signal on the perplexity-style exact c·ln c grid
    from ..operators.corpus import bigram_entropy
    d = load_table(spark, sf_dir, "documents")
    return bigram_entropy(d).orderBy("doc_id")


def _sq_recall_sql(k: int = 10, dims: int = 64) -> str:
    # explicit left-fold cosine so both engines run bit-identical
    # arithmetic (list_reduce == F.aggregate with a 0.0 seed)
    def cos(xa: str, xb: str) -> str:
        return (f"round(list_reduce(list_transform(generate_series(1, "
                f"{dims}), i -> {xa}[i] * {xb}[i]), (a, b) -> a + b) / "
                f"(sqrt(list_reduce(list_transform({xa}, e -> e * e), "
                f"(a, b) -> a + b)) * "
                f"sqrt(list_reduce(list_transform({xb}, e -> e * e), "
                f"(a, b) -> a + b))), 6)")
    dq_elem = ("CASE WHEN amx[i] - amn[i] > 0.0 THEN amn[i] + "
               "(least(floor((x[i] - amn[i]) / (amx[i] - amn[i]) "
               "* 256.0), 255.0) + 0.5) * (amx[i] - amn[i]) / 256.0 "
               "ELSE x[i] END")
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
dims AS (SELECT t.i AS pos, x[t.i] AS val
         FROM v, (SELECT unnest(generate_series(1, {dims})) AS i) t),
s AS (SELECT pos, min(val) AS mn, max(val) AS mx FROM dims
      GROUP BY pos),
arrs AS (SELECT list(mn ORDER BY pos) AS amn,
                list(mx ORDER BY pos) AS amx FROM s),
dq AS (SELECT vec_id,
              list_transform(generate_series(1, {dims}),
                             i -> {dq_elem}) AS x
       FROM v, arrs),
qe AS (SELECT x AS qv FROM v WHERE vec_id = 0),
qd AS (SELECT x AS qv FROM dq WHERE vec_id = 0),
te AS (SELECT vec_id FROM (
         SELECT v.vec_id, {cos('v.x', 'qe.qv')} AS s FROM v, qe)
       ORDER BY s DESC, vec_id LIMIT {k}),
td AS (SELECT vec_id FROM (
         SELECT dq.vec_id, {cos('dq.x', 'qd.qv')} AS s FROM dq, qd)
       ORDER BY s DESC, vec_id LIMIT {k}),
h AS (SELECT CASE WHEN td.vec_id IS NOT NULL THEN 1 ELSE 0 END AS h
      FROM te LEFT JOIN td USING (vec_id))
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(h) AS BIGINT) AS n_sq_hits,
       round(sum(h) / count(*)::DOUBLE, 6) AS recall
FROM h
"""


@register("ann_sq_recall_at_k", _sq_recall_sql())
def ann_sq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the accuracy half of the int8-SQ trade-off: recall@10 of
    # dequantized-cosine search vs the exact float ranking, both as
    # TakeOrdered limit-sorts over the explicit fold cosine
    from ..operators.similarity import sq_recall_at_k
    emb = load_table(spark, sf_dir, "embeddings")
    return sq_recall_at_k(emb, "embedding", "vec_id", k=10, query_id=0)


@register("stock_donchian", _BARS_CTE + _CENTS_CTE + f"""
, wn AS (
  SELECT event_type, hr, c,
         max(h) OVER win AS u, min(l) OVER win AS d
  FROM cts
  WINDOW win AS (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN {ind.DON_N - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT event_type, hr,
       u / 100.0 AS don_upper,
       d / 100.0 AS don_lower,
       (u + d) / 200.0 AS don_mid,
       CASE WHEN u > d
            THEN ((100000000 * (c - d)) // (u - d)) / 1e6
       END AS pct_pos
FROM wn ORDER BY event_type, hr
""")
def stock_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    # channel bounds as window max/min of integer cents; midline one
    # dyadic division; position the exact non-negative integer quotient
    ev = load_table(spark, sf_dir, "events")
    return ind.donchian(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_aroon", _BARS_CTE + _CENTS_CTE + f"""
, rk AS (
  SELECT event_type, hr, h, l,
         CAST(row_number() OVER w AS BIGINT) AS rn
  FROM cts
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), ar AS (
  SELECT event_type, hr,
         rn - ((max(h * {ind._AROON_ENC} + rn) OVER wn)
               % {ind._AROON_ENC}) AS bs_h,
         rn - ((max(({1 << 40} - l) * {ind._AROON_ENC} + rn) OVER wn)
               % {ind._AROON_ENC}) AS bs_l
  FROM rk
  WINDOW wn AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {ind.AROON_N - 1} PRECEDING
                AND CURRENT ROW)
)
SELECT event_type, hr,
       CAST(bs_h AS BIGINT) AS bars_since_high,
       CAST(bs_l AS BIGINT) AS bars_since_low,
       ((100000000 * ({ind.AROON_N - 1} - bs_h)) // {ind.AROON_N - 1})
         / 1e6 AS aroon_up,
       ((100000000 * ({ind.AROON_N - 1} - bs_l)) // {ind.AROON_N - 1})
         / 1e6 AS aroon_down
FROM ar ORDER BY event_type, hr
""")
def stock_aroon(spark: SparkSession, sf_dir: str) -> DataFrame:
    # argmax/argmin recency via the price*2^20+rank integer encoding —
    # price ties resolve to the most recent bar on both engines
    ev = load_table(spark, sf_dir, "events")
    return ind.aroon(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_chaikin_ad", _BARS_CTE + _CENTS_CTE + f"""
, fl AS (
  SELECT event_type, hr,
         CASE WHEN h > l
              THEN CAST(sign(2*c - h - l) AS BIGINT)
                   * ((abs(2*c - h - l) * CAST(volume AS BIGINT)
                       * 1000000) // (h - l))
              ELSE 0 END AS mfv6,
         CAST(volume AS BIGINT) AS vol
  FROM cts
)
SELECT event_type, hr,
       CAST(sum(mfv6) OVER (PARTITION BY event_type ORDER BY hr
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS BIGINT) / 1e6 AS ad_line,
       CASE WHEN sum(vol) OVER wn > 0
            THEN CAST(sum(mfv6) OVER wn AS BIGINT)
                 / CAST(1000000 * sum(vol) OVER wn AS DOUBLE)
       END AS cmf
FROM fl
WINDOW wn AS (PARTITION BY event_type ORDER BY hr
              ROWS BETWEEN {ind.CMF_N - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_type, hr
""")
def stock_chaikin_ad(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sign-split integer money-flow volume (div/// agree only on
    # non-negative operands), pure-integer AD running sum, CMF one
    # IEEE division of exact window sums
    ev = load_table(spark, sf_dir, "events")
    return ind.chaikin_ad(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_ulcer", _BARS_CTE + _CENTS_CTE + f"""
, mm AS (
  SELECT event_type, hr, c, max(c) OVER wn AS mc
  FROM cts
  WINDOW wn AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {ind.ULCER_N - 1} PRECEDING
                AND CURRENT ROW)
), q AS (
  SELECT event_type, hr,
         CASE WHEN mc > 0 THEN ((mc - c) * 1000000) // mc END AS dd6
  FROM mm
), s AS (
  SELECT event_type, hr,
         CAST(sum(dd6 * dd6) OVER wn AS BIGINT) AS ssq,
         CAST(count(dd6) OVER wn AS BIGINT) AS cnt
  FROM q
  WINDOW wn AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {ind.ULCER_N - 1} PRECEDING
                AND CURRENT ROW)
)
SELECT event_type, hr,
       CASE WHEN cnt > 0
            THEN round(sqrt(CAST(ssq AS DOUBLE) / CAST(cnt AS DOUBLE))
                       / 1e4, 6)
       END AS ulcer
FROM s ORDER BY event_type, hr
""")
def stock_ulcer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # RMS drawdown from the rolling high on the exact 1e-6 integer
    # grid; the only float op is the final sqrt (transcendental, so
    # the 6-dp round is knife-edge-free)
    ev = load_table(spark, sf_dir, "events")
    return ind.ulcer_index(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_parkinson", _BARS_CTE + _CENTS_CTE + f"""
, pv AS (
  SELECT event_type,
         CAST(round((ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE))
                     * ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE)))
                    * 1e12, 0) AS BIGINT) AS t
  FROM cts WHERE l > 0 AND h >= l
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_bars,
         CAST(sum(t) AS BIGINT) AS s
  FROM pv GROUP BY event_type
)
SELECT event_type, n_bars,
       CASE WHEN n_bars > 0
            THEN round(sqrt(CAST(s AS DOUBLE)
                            / ({ind.PARKINSON_4LN2!r}
                               * CAST(n_bars AS DOUBLE))) / 1e6, 6)
       END AS parkinson_vol
FROM g ORDER BY event_type
""")
def stock_parkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    # range-based volatility: ln(h/l)^2 terms on an exact 1e-12 integer
    # grid, BIGINT sum, leaf-cast-double final formula with the 4ln2
    # constant as a shared literal
    ev = load_table(spark, sf_dir, "events")
    return ind.parkinson_vol(ind.hourly_bars(ev)).orderBy("event_type")


@register("stock_cci", _BARS_CTE + _CENTS_CTE + f"""
, t AS (
  SELECT event_type, hr, h + l + c AS tp3 FROM cts
), rw AS (
  SELECT event_type, hr, tp3,
         CAST(row_number() OVER w AS BIGINT) AS rn,
         CAST(sum(tp3) OVER wn AS BIGINT) AS s,
         CAST(count(*) OVER wn AS BIGINT) AS cnt
  FROM t
  WINDOW w AS (PARTITION BY event_type ORDER BY hr),
         wn AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {ind.CCI_N - 1} PRECEDING AND CURRENT ROW)
), dd AS (
  SELECT cur.event_type AS event_type, cur.hr AS hr, cur.tp3 AS tp3,
         cur.s AS s, cur.cnt AS cnt,
         CAST(sum(abs(cur.cnt * prev.tp3 - cur.s)) AS BIGINT) AS d
  FROM rw cur JOIN rw prev
    ON cur.event_type = prev.event_type
   AND prev.rn > cur.rn - {ind.CCI_N} AND prev.rn <= cur.rn
  GROUP BY cur.event_type, cur.hr, cur.tp3, cur.s, cur.cnt
)
SELECT event_type, hr,
       CASE WHEN d > 0
            THEN round(CAST(cnt * (cnt * tp3 - s) AS DOUBLE)
                       / (0.015 * CAST(d AS DOUBLE)), 6)
       END AS cci
FROM dd ORDER BY event_type, hr
""")
def stock_cci(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mean-deviation without ever forming the float mean: with S and
    # cnt exact window integers, D = sum|cnt*tp3_j - S| is integer and
    # CCI = cnt*(cnt*tp3 - S) / (0.015*D); the window members come from
    # the _trailing_vals bounded window frame (O(n) per row at any
    # symbol cardinality; round-14 replaced the banded self-join)
    ev = load_table(spark, sf_dir, "events")
    return ind.cci(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("orders_supplier_hhi", """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)))
              AS BIGINT) AS r4
  FROM lineitem GROUP BY l_suppkey
), xs AS (SELECT l_suppkey, r4 // 10000 AS x FROM rev),
g AS (
  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS ssq
  FROM xs JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY s_nationkey
)
SELECT n_name AS nation, n_suppliers,
       CASE WHEN s > 0
            THEN CAST(ssq AS DOUBLE)
                 / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) * 10000.0
       END AS hhi
FROM g JOIN nation ON s_nationkey = n_nationkey
ORDER BY nation
""")
def orders_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-nation supplier-revenue concentration; exact integer sums of
    # squares, unrounded identically-associated double emit
    from ..operators.analytics import supplier_hhi
    return supplier_hhi(load_table(spark, sf_dir, "lineitem"),
                        load_table(spark, sf_dir, "supplier"),
                        load_table(spark, sf_dir, "nation"))


@register("customer_spend_gini", """
WITH sp AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS c4
  FROM orders GROUP BY o_custkey
), xs AS (SELECT o_custkey, c4 // 100 AS x FROM sp),
cu AS (
  SELECT c_nationkey, x, c_custkey,
         CAST(row_number() OVER (PARTITION BY c_nationkey
                                 ORDER BY x, c_custkey) AS BIGINT) AS i
  FROM xs JOIN customer ON o_custkey = c_custkey
), g AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(i * x) AS BIGINT) AS s1
  FROM cu GROUP BY c_nationkey
)
SELECT n_name AS nation, n,
       CASE WHEN n * s > 0
            THEN ((1000000 * (2 * s1 - (n + 1) * s)) // (n * s)) / 1e6
       END AS gini
FROM g JOIN nation ON c_nationkey = n_nationkey
ORDER BY nation
""")
def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rank-formula Gini on whole-unit integer spend; numerator is
    # non-negative by the sorted-rank inequality so div == //
    from ..operators.analytics import gini_by_nation
    return gini_by_nation(load_table(spark, sf_dir, "orders"),
                          load_table(spark, sf_dir, "customer"),
                          load_table(spark, sf_dir, "nation"))


@register("stock_cusum", _BARS_CTE + _CENTS_CTE + f"""
, cs AS (
  SELECT event_type, hr, c,
         CAST(row_number() OVER w AS BIGINT) AS rn,
         CAST(count(*) OVER p AS BIGINT) AS n,
         CAST(sum(c) OVER p AS BIGINT) AS s,
         CAST(sum(c) OVER wr AS BIGINT) AS a
  FROM cts
  WINDOW w AS (PARTITION BY event_type ORDER BY hr),
         p AS (PARTITION BY event_type),
         wr AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), pq AS (
  SELECT event_type, hr, n,
         n * a - rn * s - rn * n * {ind.CUSUM_K_CENTS} AS p_up,
         rn * s - n * a - rn * n * {ind.CUSUM_K_CENTS} AS q_dn
  FROM cs
), mm AS (
  SELECT event_type, hr, n,
         p_up - least(0, min(p_up) OVER wr) AS sp,
         q_dn - least(0, min(q_dn) OVER wr) AS sq
  FROM pq
  WINDOW wr AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, hr,
       sp / CAST(100 * n AS DOUBLE) AS cusum_up,
       sq / CAST(100 * n AS DOUBLE) AS cusum_down,
       sp > n * {ind.CUSUM_H_CENTS} AS alert_up,
       sq > n * {ind.CUSUM_H_CENTS} AS alert_down
FROM mm ORDER BY event_type, hr
""")
def stock_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # clamped CUSUM recurrence via the max-drawdown closed form
    # (prefix sum minus running min), fully integer at n-scaled grid
    ev = load_table(spark, sf_dir, "events")
    return ind.cusum(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("corpus_token_kl", """
WITH tok AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), x -> x != ''))
           AS term
  FROM documents
), st AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c_st
  FROM tok GROUP BY source, term
), gt AS (
  SELECT term, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY term
), ns AS (
  SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY source
), tt AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot FROM ns),
tm AS (
  SELECT source,
         CAST(round((CAST(c_st AS DOUBLE)
                     * ln(CAST(c_st AS DOUBLE) / CAST(c_t AS DOUBLE)))
                    * 1e6, 0) AS BIGINT) AS t6
  FROM st JOIN gt USING (term)
), s AS (SELECT source, CAST(sum(t6) AS BIGINT) AS s6
         FROM tm GROUP BY source)
SELECT s.source, n_s AS n_tokens,
       round((CAST(s6 AS DOUBLE) / 1e6) / CAST(n_s AS DOUBLE)
             + ln(CAST(n_tot AS DOUBLE) / CAST(n_s AS DOUBLE)), 6) AS kl
FROM s JOIN ns USING (source) CROSS JOIN tt
ORDER BY source
""")
def corpus_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unigram-distribution KL per source vs the whole corpus on the
    # perplexity-style 1e-6 c*ln grid; global counts reuse the
    # (source, term) aggregate — one pass over raw text
    return CP.token_kl_by_source(load_table(spark, sf_dir, "documents"))


@register("events_robust_outliers", """
WITH v AS (
  SELECT event_type AS g,
         CAST(round(value * 100, 0) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
), c AS (SELECT g, v, count(*) AS cnt FROM v GROUP BY g, v),
r AS (SELECT g, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM c),
n AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_rows FROM c GROUP BY g),
med AS (SELECT r.g,
               CAST(min(CASE WHEN cum >= (1 * n_rows + 1) // 2
                             THEN v END) AS BIGINT) AS med
        FROM r JOIN n USING (g) GROUP BY r.g),
d AS (SELECT v.g, abs(v.v - med) AS ad, med FROM v JOIN med USING (g)),
c2 AS (SELECT g, ad, count(*) AS cnt FROM d GROUP BY g, ad),
r2 AS (SELECT g, ad, cnt,
              CAST(sum(cnt) OVER (PARTITION BY g ORDER BY ad
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
       FROM c2),
n2 AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n_rows FROM c2 GROUP BY g),
mad AS (SELECT r2.g,
               CAST(min(CASE WHEN cum >= (1 * n_rows + 1) // 2
                             THEN ad END) AS BIGINT) AS mad
        FROM r2 JOIN n2 USING (g) GROUP BY r2.g)
SELECT d.g AS event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(min(d.med) AS BIGINT) AS med,
       CAST(min(mad.mad) AS BIGINT) AS mad,
       CAST(sum(CASE WHEN d.ad > 3 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       ((1000000 * CAST(sum(CASE WHEN d.ad > 3 * mad.mad THEN 1
                                 ELSE 0 END) AS BIGINT))
        // CAST(count(*) AS BIGINT)) / 1e6 AS outlier_rate
FROM d JOIN mad USING (g)
GROUP BY d.g ORDER BY event_type
""")
def events_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # median/MAD outlier census on cents, two grouped-exact-quantile
    # passes; the cents grid bounds each group's distinct values
    # (≤ ~10^5 whatever the row count), so the domain-bounded window
    # ladder applies — no checkpoint/offset-collect machinery needed
    from ..operators.aggregates import robust_outlier_profile
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"))
    return robust_outlier_profile(v, "event_type", "vc",
                                  bounded_domain=True)


@register("customer_k_anonymity", """
WITH cls AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS k
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT k, CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_rows,
       k < 10 AS at_risk
FROM cls GROUP BY k ORDER BY k
""")
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # equivalence-class size census over the (nation, segment)
    # quasi-identifier pair — all-integer, two keyed aggregates
    from ..operators.analytics import k_anonymity_profile
    return k_anonymity_profile(
        load_table(spark, sf_dir, "customer"),
        ["c_nationkey", "c_mktsegment"])


@register("graph_clustering_coeff", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
            FROM lineitem),
e AS (SELECT DISTINCT a.i AS ea, b.i AS eb
      FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
w AS (SELECT e1.ea AS a, e1.eb AS b, e2.eb AS c
      FROM e e1 JOIN e e2 ON e1.eb = e2.ea),
t AS (SELECT * FROM w
      WHERE EXISTS (SELECT 1 FROM e WHERE e.ea = w.a AND e.eb = w.c)),
dg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
       FROM (SELECT ea AS v FROM e UNION ALL SELECT eb FROM e)
       GROUP BY v),
m AS (SELECT CAST(sum(d * (d - 1)) AS BIGINT) AS w2,
             CAST(count(*) AS BIGINT) AS n_nodes
      FROM dg)
SELECT n_nodes,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_triangles,
       w2 // 2 AS n_wedges,
       CASE WHEN w2 > 0
            THEN ((6000000 * (SELECT CAST(count(*) AS BIGINT) FROM t))
                  // w2) / 1e6
       END AS transitivity
FROM m
""")
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # global transitivity 3T/W of the co-purchase graph; wedge count
    # from one degree aggregate, C on the (6e6*T) div quotient grid
    from ..operators.analytics import clustering_coefficient
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return clustering_coefficient(pairs, "pa", "pb")


_GOPHER_F_CTE = f"""
WITH w AS (SELECT doc_id, text, {{words}} AS ws FROM documents),
f AS (SELECT doc_id, len(ws) AS n,
             (length(text) - (len(ws) - 1)) / len(ws)::DOUBLE AS mean_wl,
             (len(string_split(text, '#')) - 1
              + len(string_split(text, '...')) - 1) / len(ws)::DOUBLE
                 AS sym_ratio,
             len(list_intersect(list_distinct(ws), ['a', 'and', 'as', 'at', 'by', 'for', 'in', 'is', 'it', 'of', 'on', 'the', 'to', 'with'])) AS n_stops
      FROM w)"""


@register("corpus_filter_attrition", _GOPHER_F_CTE.format(words=_WORDS) + """,
r AS (SELECT (n >= 20 AND n <= 100000) AS r1,
             (mean_wl >= 3.0 AND mean_wl <= 10.0) AS r2,
             (sym_ratio <= 0.1) AS r3,
             (n_stops >= 2) AS r4
      FROM f),
a AS (SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS f1,
             CAST(sum(CASE WHEN r1 AND NOT r2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS f2,
             CAST(sum(CASE WHEN r1 AND r2 AND NOT r3 THEN 1 ELSE 0 END)
                  AS BIGINT) AS f3,
             CAST(sum(CASE WHEN r1 AND r2 AND r3 AND NOT r4
                           THEN 1 ELSE 0 END) AS BIGINT) AS f4
      FROM r),
st AS (
  SELECT 1 AS stage, 'word_count' AS rule, n0 AS n_in, f1 AS n_removed
  FROM a
  UNION ALL SELECT 2, 'mean_word_len', n0 - f1, f2 FROM a
  UNION ALL SELECT 3, 'symbol_ratio', n0 - f1 - f2, f3 FROM a
  UNION ALL SELECT 4, 'stopwords', n0 - f1 - f2 - f3, f4 FROM a
)
SELECT CAST(stage AS BIGINT) AS stage, rule,
       CAST(n_in AS BIGINT) AS n_in,
       CAST(n_removed AS BIGINT) AS n_removed,
       CAST(n_in - n_removed AS BIGINT) AS n_out,
       CASE WHEN n_in > 0
            THEN ((1000000 * n_removed) // n_in) / 1e6
       END AS removal_rate
FROM st ORDER BY stage
""")
def corpus_filter_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sequential Gopher-rule funnel: one shuffle-free projection + ONE
    # global conditional-count aggregate; 4-row report via stack
    return CP.filter_attrition(load_table(spark, sf_dir, "documents"))


def _hurst_scale_ctes(m: int) -> str:
    return f"""
b{m} AS (SELECT event_type, hr, r, (rn - 1) // {m} AS blk FROM rr),
d{m} AS (
  SELECT event_type, blk, r,
         CAST(sum(r) OVER (PARTITION BY event_type, blk ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS a,
         CAST(sum(r) OVER (PARTITION BY event_type, blk) AS BIGINT) AS s,
         CAST(row_number() OVER (PARTITION BY event_type, blk
                                 ORDER BY hr) AS BIGINT) AS k,
         CAST(count(*) OVER (PARTITION BY event_type, blk) AS BIGINT)
             AS n
  FROM b{m}),
g{m} AS (
  SELECT event_type, blk,
         max({m} * a - k * s) - min({m} * a - k * s) AS num,
         {m} * CAST(sum(r * r) AS BIGINT) - min(s) * min(s) AS den
  FROM d{m} WHERE n = {m} GROUP BY event_type, blk),
t{m} AS (
  SELECT event_type,
         CAST(round(ln(CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)))
                    * 1e6, 0) AS BIGINT) AS t6
  FROM g{m} WHERE den > 0 AND num > 0),
y{m} AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nb,
         CAST(sum(t6) AS BIGINT) AS s6
  FROM t{m} GROUP BY event_type),
m{m} AS (
  SELECT event_type, nb,
         CASE WHEN s6 >= 0
              THEN CAST(floor((2 * s6 + nb) / (2 * nb)) AS BIGINT)
              ELSE -CAST(floor((2 * -s6 + nb) / (2 * nb)) AS BIGINT)
         END AS y6
  FROM y{m})"""


@register("stock_hurst", _BARS_CTE + _CENTS_CTE + f"""
, lr AS (
  SELECT event_type, hr,
         c - lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS r
  FROM cts
), rr AS (
  SELECT event_type, hr, r,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr)
              AS BIGINT) AS rn
  FROM lr WHERE r IS NOT NULL
),{_hurst_scale_ctes(ind.HURST_M_SMALL)},{_hurst_scale_ctes(ind.HURST_M_LARGE)}
SELECT s.event_type,
       s.nb AS n_blocks_small, l.nb AS n_blocks_large,
       s.y6 / 1e6 AS mean_ln_rs_small,
       l.y6 / 1e6 AS mean_ln_rs_large,
       round((CAST(l.y6 - s.y6 AS DOUBLE) / 1e6)
             / {ind.PARKINSON_4LN2!r}, 6) AS hurst
FROM m{ind.HURST_M_SMALL} s JOIN m{ind.HURST_M_LARGE} l
  USING (event_type)
ORDER BY s.event_type
""")
def stock_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rescaled-range Hurst exponent: n-scaled integer cumulative
    # deviations (P_m = 0 gives the include-zero range convention for
    # free), exact-integer R and S^2, transcendental-safe 1e-6 block
    # grid, half-away block means, slope = one difference / 4ln2
    ev = load_table(spark, sf_dir, "events")
    return ind.hurst_rs(ind.hourly_bars(ev)).orderBy("event_type")


@register("embedding_centroid_drift", """
WITH v AS (SELECT label, embedding::DOUBLE[] AS x FROM embeddings),
d AS (SELECT label, t.i AS pos,
             CAST(round(x[t.i] * 1000000, 0) AS BIGINT) AS q
      FROM v, (SELECT unnest(generate_series(1, 64)) AS i) t),
ld AS (SELECT label, pos, CAST(sum(q) AS BIGINT) AS s
       FROM d GROUP BY label, pos),
gd AS (SELECT pos, CAST(sum(s) AS BIGINT) AS sg FROM ld GROUP BY pos),
la AS (SELECT label, list(CAST(s AS DOUBLE) ORDER BY pos) AS a
       FROM ld GROUP BY label),
ga AS (SELECT list(CAST(sg AS DOUBLE) ORDER BY pos) AS g FROM gd),
n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vectors
      FROM v GROUP BY label),
c AS (SELECT label,
             list_reduce(list_transform(generate_series(1, 64),
                                        i -> a[i] * g[i]),
                         (p, q) -> p + q) AS dot,
             list_reduce(list_transform(a, e -> e * e),
                         (p, q) -> p + q) AS na,
             list_reduce(list_transform(g, e -> e * e),
                         (p, q) -> p + q) AS ng
      FROM la, ga)
SELECT n.label, n.n_vectors,
       CASE WHEN na > 0 AND ng > 0
            THEN round(dot / (sqrt(na) * sqrt(ng)), 6)
       END AS cos_to_global
FROM c JOIN n USING (label) ORDER BY label
""")
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-label centroid vs global centroid cosine on EXACT integer
    # per-dim sum vectors (cosine is scale-invariant, so centroids
    # never become float ratios); explicit-fold arithmetic both sides
    from ..operators.similarity import centroid_drift
    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_drift(emb, "embedding", "label")


@register("cube_revenue_segment_priority", """
SELECT c_mktsegment AS segment, o_orderpriority AS priority,
       CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_segment,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            AS BIGINT) / 100.0 AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderpriority)
ORDER BY g_segment, g_priority, segment, priority
""")
def cube_revenue_segment_priority(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    # full CUBE over (segment, priority): all four grouping-set levels
    # in ONE pass (Spark expands the cube before the hash aggregate —
    # no per-level rescan); exact integer cents, explicit per-column
    # GROUPING flags so subtotal rows are engine-identical
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    g = (j.cube("c_mktsegment", "o_orderpriority")
         .agg(F.grouping("c_mktsegment").cast("long")
              .alias("g_segment"),
              F.grouping("o_orderpriority").cast("long")
              .alias("g_priority"),
              F.count(F.lit(1)).cast("long").alias("n_orders"),
              (F.sum(cents).cast("long") / 100.0).alias("revenue")))
    return (g.select(F.col("c_mktsegment").alias("segment"),
                     F.col("o_orderpriority").alias("priority"),
                     "g_segment", "g_priority", "n_orders", "revenue")
            .orderBy("g_segment", "g_priority", "segment", "priority"))


@register("stock_vortex", _BARS_CTE + _CENTS_CTE + f"""
, vm AS (
  SELECT event_type, hr,
         abs(h - lag(l) OVER w) AS vmp,
         abs(l - lag(h) OVER w) AS vmm,
         CASE WHEN lag(c) OVER w IS NOT NULL
              THEN greatest(h - l, abs(h - lag(c) OVER w),
                            abs(l - lag(c) OVER w))
         END AS tr
  FROM cts
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), s AS (
  SELECT event_type, hr,
         CAST(sum(vmp) OVER wn AS BIGINT) AS sp,
         CAST(sum(vmm) OVER wn AS BIGINT) AS sm,
         CAST(sum(tr) OVER wn AS BIGINT) AS st
  FROM vm
  WINDOW wn AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {ind.VORTEX_N - 1} PRECEDING
                AND CURRENT ROW)
)
SELECT event_type, hr,
       CASE WHEN st > 0 THEN ((1000000 * sp) // st) / 1e6 END AS vi_plus,
       CASE WHEN st > 0 THEN ((1000000 * sm) // st) / 1e6 END AS vi_minus
FROM s ORDER BY event_type, hr
""")
def stock_vortex(spark: SparkSession, sf_dir: str) -> DataFrame:
    # vortex movement vs true range, exact integer window sums and
    # non-negative quotient grids; first-bar NULL terms drop out of
    # both engines' window sums identically
    ev = load_table(spark, sf_dir, "events")
    return ind.vortex(ind.hourly_bars(ev)).orderBy("event_type", "hr")


def _lang_confusion_sql() -> str:
    from ..functions import text as TX
    score_exprs = ", ".join(
        "len(list_filter(ws, x -> x IN ({}))) AS s_{}".format(
            ", ".join(repr(m) for m in TX.LANG_MARKERS[lang]), lang)
        for lang in sorted(TX.LANG_MARKERS))
    langs = sorted(TX.LANG_MARKERS)
    g = "greatest(" + ", ".join(f"s_{la}" for la in langs) + ")"
    case = " ".join(f"WHEN s_{la} = {g} THEN '{la}'" for la in langs)
    return f"""
WITH w AS (SELECT lang, {_WORDS} AS ws FROM documents),
s AS (SELECT lang, {score_exprs} FROM w),
p AS (SELECT lang AS labeled_lang,
             CASE WHEN {g} = 0 THEN 'und' {case} END AS pred_lang
      FROM s),
cm AS (SELECT labeled_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       FROM p GROUP BY labeled_lang, pred_lang),
tot AS (SELECT labeled_lang, CAST(sum(n) AS BIGINT) AS n_label
        FROM cm GROUP BY labeled_lang)
SELECT cm.labeled_lang, cm.pred_lang, cm.n,
       (cm.labeled_lang = cm.pred_lang) AS correct,
       ((1000000 * cm.n) // tot.n_label) / 1e6 AS frac_of_label
FROM cm JOIN tot USING (labeled_lang)
ORDER BY labeled_lang, pred_lang
"""


@register("text_lang_confusion", _lang_confusion_sql())
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # language-ID confusion matrix vs the labeled lang column: the
    # eval every classifier-based curation stage reports; counts exact,
    # per-label fractions on the quotient grid
    from ..functions import text as TX
    d = load_table(spark, sf_dir, "documents")
    p = d.select(F.col("lang").alias("labeled_lang"),
                 TX.lang_id("text").alias("pred_lang"))
    cm = (p.groupBy("labeled_lang", "pred_lang")
          .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = (cm.groupBy("labeled_lang")
           .agg(F.sum("n").cast("long").alias("n_label")))
    j = cm.join(F.broadcast(tot), "labeled_lang")
    frac = F.expr("(1000000 * n) div n_label") / 1e6
    return (j.select("labeled_lang", "pred_lang", "n",
                     (F.col("labeled_lang") == F.col("pred_lang"))
                     .alias("correct"),
                     frac.alias("frac_of_label"))
            .orderBy("labeled_lang", "pred_lang"))


@register("orders_open_backlog", """
WITH span AS (SELECT l_orderkey, max(l_shipdate) AS end_day
              FROM lineitem GROUP BY l_orderkey),
o AS (SELECT o_orderdate AS start_day, end_day
      FROM orders JOIN span ON o_orderkey = l_orderkey),
d AS (SELECT day, CAST(sum(dd) AS BIGINT) AS delta FROM (
        SELECT start_day AS day, 1 AS dd FROM o
        UNION ALL SELECT end_day, -1 FROM o)
      GROUP BY day)
SELECT day, delta,
       CAST(sum(delta) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS open_orders
FROM d ORDER BY day
""")
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    # interval-concurrency curve (orders open from order date to last
    # ship date) on distributed_running_total — no global
    # single-partition window even over a decades-long calendar
    from ..operators.analytics import open_order_backlog
    return open_order_backlog(load_table(spark, sf_dir, "orders"),
                              load_table(spark, sf_dir, "lineitem"))


@register("stock_keltner", _BARS_CTE + f"""
, rb AS (
  SELECT event_type, hr, ((high + low) + close) / 3.0 AS tp,
         high, low, close,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM bars
), pb AS (
  SELECT event_type, tp, rn,
         (rn - 1) // {ind.EWMA_LOOKBACK} AS band FROM rb
), cb AS (
  SELECT event_type, hr, rn,
         unnest([(rn - 1) // {ind.EWMA_LOOKBACK},
                 (rn - 1) // {ind.EWMA_LOOKBACK} - 1]) AS probe
  FROM rb
), ctr AS (
  SELECT cur.event_type AS event_type, cur.hr AS hr,
         round(sum(prev.tp * pow({ind.EWMA_DECAY}, cur.rn - prev.rn))
               / sum(pow({ind.EWMA_DECAY}, cur.rn - prev.rn)), 6)
             AS center
  FROM cb cur JOIN pb prev
    ON cur.event_type = prev.event_type
   AND cur.probe = prev.band
   AND prev.rn > cur.rn - {ind.EWMA_LOOKBACK}
   AND prev.rn <= cur.rn
  GROUP BY cur.event_type, cur.hr
), l AS (
  SELECT event_type, hr, high, low,
         lag(close) OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM rb
), t AS (
  SELECT event_type, hr,
         CASE WHEN pc IS NULL THEN NULL
              ELSE greatest(high - low, abs(high - pc), abs(low - pc))
         END AS true_range
  FROM l
), av AS (
  SELECT event_type, hr,
         round(avg(true_range) OVER (
           PARTITION BY event_type ORDER BY hr
           ROWS BETWEEN {ind.ATR_N - 1} PRECEDING AND CURRENT ROW), 6)
             AS atr
  FROM t
)
SELECT c.event_type, c.hr, c.center,
       c.center + {ind.KELT_MULT} * av.atr AS kelt_upper,
       c.center - {ind.KELT_MULT} * av.atr AS kelt_lower
FROM ctr c JOIN av ON c.event_type = av.event_type AND c.hr = av.hr
ORDER BY c.event_type, c.hr
""")
def stock_keltner(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EWMA(typical price) center via the banded rank join + ATR bands;
    # bands UNROUNDED (pure IEEE on bit-identical rounded inputs)
    ev = load_table(spark, sf_dir, "events")
    return ind.keltner(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_data_gaps", _BARS_CTE + """
, ee AS (SELECT event_type, hr, CAST(floor(epoch(hr)) AS BIGINT) AS e
         FROM bars),
gp AS (SELECT event_type, e,
              (e - lag(e) OVER (PARTITION BY event_type ORDER BY e))
                // 3600 - 1 AS gap
       FROM ee)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_bars,
       CAST((max(e) - min(e)) // 3600 + 1 AS BIGINT) AS expected_hours,
       CAST((max(e) - min(e)) // 3600 + 1 - count(*) AS BIGINT)
           AS n_missing,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS longest_gap_hours
FROM gp GROUP BY event_type ORDER BY event_type
""")
def stock_data_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bar-continuity census: integer epoch deltas on the hourly grid
    # (DuckDB epoch() is fractional -> floor; Spark unix_timestamp
    # truncates), longest gap via lag diffs
    ev = load_table(spark, sf_dir, "events")
    return ind.data_gaps(ind.hourly_bars(ev))


@register("leadtime_trend_by_priority", """
WITH d AS (
  SELECT o_orderpriority AS priority,
         (year(o_orderdate) * 12 + month(o_orderdate)) - 23904 AS x,
         CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS y
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate IS NOT NULL
), g AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM d GROUP BY priority
), q AS (
  SELECT priority, n, n * sxy - sx * sy AS num,
         n * sxx - sx * sx AS den
  FROM g
)
SELECT priority, n,
       CASE WHEN den > 0
            THEN (CAST(sign(num) AS BIGINT) * ((10000 * abs(num)) // den))
                 / 10000.0
       END AS slope
FROM q ORDER BY priority
""")
def leadtime_trend_by_priority(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    # grouped OLS: ship-lead-time drift (days/month) per priority on
    # exact integer sums; x anchored at 1992-00 (fixed literal) so
    # n*sum(x^2) holds ~50x int64 headroom at sf0.1 scale growth
    from ..operators.analytics import grouped_ols_slope
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
         .filter(F.col("l_shipdate").isNotNull())
         .select(F.col("o_orderpriority").alias("priority"),
                 F.expr("(year(o_orderdate) * 12 + month(o_orderdate))"
                        " - 23904").cast("long").alias("x"),
                 F.datediff("l_shipdate", "o_orderdate").cast("long")
                 .alias("y")))
    return grouped_ols_slope(d, "priority", "x", "y")


from .catalog_text import _JACCARD_CTES  # noqa: E402


@register("dedup_similarity_histogram", f"""
WITH {_JACCARD_CTES.replace('jac AS', '_jac_unused AS')}
SELECT (10 * c) // (sa.sz + sb.sz - c) AS bucket,
       CAST(count(*) AS BIGINT) AS n_pairs,
       ((10 * c) // (sa.sz + sb.sz - c)) / 10.0 AS jaccard_lo
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
GROUP BY bucket ORDER BY bucket
""")
def dedup_similarity_histogram(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    # threshold-sweep report: candidate-pair Jaccard distribution in
    # exact integer-quotient 0.1 buckets (bucket 10 = identical sets);
    # same inverted-index candidates as the dedup pass itself
    from ..operators.dedup import similarity_histogram
    return similarity_histogram(load_table(spark, sf_dir, "documents"))


@register("events_transition_entropy", """
WITH t AS (
  SELECT event_type AS to_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events
), m AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM t WHERE from_type IS NOT NULL GROUP BY from_type, to_type
), tot AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS c_s,
         CAST(count(*) AS BIGINT) AS n_next
  FROM m GROUP BY from_type
), s AS (
  SELECT m.from_type, tot.c_s, tot.n_next,
         CAST(sum(CAST(round((CAST(n AS DOUBLE)
                  * ln(CAST(c_s AS DOUBLE) / CAST(n AS DOUBLE))) * 1e6,
                  0) AS BIGINT)) AS BIGINT) AS s6
  FROM m JOIN tot USING (from_type)
  GROUP BY m.from_type, tot.c_s, tot.n_next
)
SELECT from_type, c_s AS n_out, n_next,
       round((CAST(s6 AS DOUBLE) / 1e6) / CAST(c_s AS DOUBLE), 6)
           AS entropy
FROM s ORDER BY from_type
""")
def events_transition_entropy(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    # conditional next-event entropy per state on the perplexity
    # integer grid; matrix-sized work on top of the transition counts
    from ..operators.analytics import transition_entropy
    return transition_entropy(load_table(spark, sf_dir, "events"))
