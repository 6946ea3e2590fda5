"""Round-8 catalog entries.

Stock microstructure + trend additions (ADX, force index, pivot
points, Kyle's lambda, Roll's implied spread), graph degree
assortativity, corpus containment / vocabulary-growth / hapax ops,
event burst & inter-arrival analytics, and the ANN bucket-balance
audit. Every entry follows the exact-integer oracle discipline
(COVERAGE.md): integer-grid summands, single-division emits, shared
transcendental literals, identical association both engines.

Reference parity: the reference's surface stops at filter/join/
aggregate over ingested series (SURVEY §2); these extend the engine's
quant/curation north star like plans/catalog_quant.py (round 7).

MUST import after the other catalog modules (see plans/__init__) so
the never-checked rotation ranks these behind earlier waiting
families if any exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import analytics as ana
from ..operators import corpus as corpus_ops
from ..operators import dedup as dd
from ..operators import indicators as ind
from ..sources.registry import load_table
from .catalog import register
from .catalog_stock import _BARS_CTE
from .catalog_quant import _CENTS_CTE


@register("stock_adx", _BARS_CTE + _CENTS_CTE + f"""
, dmv AS (
  SELECT event_type, hr, h, l, c,
         lag(h) OVER w AS ph, lag(l) OVER w AS pl, lag(c) OVER w AS pc
  FROM cts WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), dm AS (
  SELECT event_type, hr,
         CASE WHEN pc IS NULL THEN NULL
              WHEN (h - ph) > (pl - l) AND (h - ph) > 0 THEN h - ph
              ELSE 0 END AS pdm,
         CASE WHEN pc IS NULL THEN NULL
              WHEN (pl - l) > (h - ph) AND (pl - l) > 0 THEN pl - l
              ELSE 0 END AS mdm,
         CASE WHEN pc IS NOT NULL
              THEN greatest(h - l, abs(h - pc), abs(l - pc)) END AS tr
  FROM dmv
), s AS (
  SELECT event_type, hr,
         CAST(sum(pdm) OVER wn AS BIGINT) AS sp,
         CAST(sum(mdm) OVER wn AS BIGINT) AS sm,
         CAST(sum(tr) OVER wn AS BIGINT) AS st
  FROM dm WINDOW wn AS (PARTITION BY event_type ORDER BY hr
                        ROWS BETWEEN {ind.ADX_N - 1} PRECEDING
                        AND CURRENT ROW)
), dxt AS (
  SELECT event_type, hr,
         CASE WHEN st > 0 THEN (100000000 * sp) // st END AS dip,
         CASE WHEN st > 0 THEN (100000000 * sm) // st END AS dim,
         CASE WHEN sp + sm > 0
              THEN (100000000 * abs(sp - sm)) // (sp + sm) END AS dx
  FROM s
)
SELECT event_type, hr, dip / 1e6 AS di_plus, dim / 1e6 AS di_minus,
       dx / 1e6 AS dx,
       CASE WHEN count(dx) OVER wn > 0
            THEN ((CAST(sum(dx) OVER wn AS BIGINT))
                  // (CAST(count(dx) OVER wn AS BIGINT))) / 1e6
       END AS adx
FROM dxt
WINDOW wn AS (PARTITION BY event_type ORDER BY hr
              ROWS BETWEEN {ind.ADX_N - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_type, hr
""")
def stock_adx(spark: SparkSession, sf_dir: str) -> DataFrame:
    # directional-movement system: ±DI on the (1e8·Σdm) div ΣTR percent
    # grid, DX with the shared-ΣTR denominator cancelled, ADX as the
    # integer quotient of DX-grid sums — no float before the emit
    ev = load_table(spark, sf_dir, "events")
    return ind.adx(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_force_index", _BARS_CTE + _CENTS_CTE + f"""
, fiv AS (
  SELECT event_type, hr,
         (c - lag(c) OVER (PARTITION BY event_type ORDER BY hr))
         * volume AS fi
  FROM cts
), fr AS (
  SELECT event_type, hr, fi,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM fiv WHERE fi IS NOT NULL
), pb AS (
  SELECT *, (rn - 1) // {ind.EWMA_LOOKBACK} AS band FROM fr
), cb AS (
  SELECT event_type, hr, rn,
         unnest([(rn - 1) // {ind.EWMA_LOOKBACK},
                 (rn - 1) // {ind.EWMA_LOOKBACK} - 1]) AS probe
  FROM fr
)
SELECT cur.event_type, cur.hr,
       round(sum(prev.fi * pow({ind.EWMA_DECAY}, cur.rn - prev.rn))
             / sum(pow({ind.EWMA_DECAY}, cur.rn - prev.rn))
             / 100.0, 6) AS force_index
FROM cb cur JOIN pb prev
  ON cur.event_type = prev.event_type
 AND cur.probe = prev.band
 AND prev.rn > cur.rn - {ind.EWMA_LOOKBACK}
 AND prev.rn <= cur.rn
GROUP BY cur.event_type, cur.hr
ORDER BY cur.event_type, cur.hr
""")
def stock_force_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    # truncated-EWMA force index over exact integer cents-move × volume
    # terms; the EWMA rides the _trailing_vals bounded window frame
    # (O(lookback)/bar; round-14 replaced the banded self-join) with
    # first bars dropped BEFORE the window so Σweights needs no guard
    ev = load_table(spark, sf_dir, "events")
    return (ind.force_index(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("stock_pivot_points", """
WITH e AS (
  SELECT event_type, ts, event_id, value,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
), dg AS (
  SELECT event_type, d AS hr,
         CAST(round(max(value) * 100, 0) AS BIGINT) AS h,
         CAST(round(min(value) * 100, 0) AS BIGINT) AS l
  FROM e GROUP BY event_type, d
), rc AS (
  SELECT event_type, ts, event_id, value, d,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
), dc AS (
  SELECT event_type, d AS hr,
         CAST(round(max(CASE WHEN rn_d = 1 THEN value END) * 100, 0)
              AS BIGINT) AS c
  FROM rc GROUP BY event_type, d
), daily AS (
  SELECT dg.event_type, dg.hr, dg.h, dg.l, dc.c
  FROM dg JOIN dc ON dg.event_type = dc.event_type AND dg.hr = dc.hr
), lagged AS (
  SELECT event_type, hr,
         lag(h) OVER w AS ph, lag(l) OVER w AS pl, lag(c) OVER w AS pc
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY hr)
)
SELECT event_type, hr,
       CAST(ph + pl + pc AS DOUBLE) / 300.0 AS pivot,
       2.0 * (CAST(ph + pl + pc AS DOUBLE) / 300.0)
         - CAST(pl AS DOUBLE) / 100.0 AS r1,
       2.0 * (CAST(ph + pl + pc AS DOUBLE) / 300.0)
         - CAST(ph AS DOUBLE) / 100.0 AS s1,
       CAST(ph + pl + pc AS DOUBLE) / 300.0
         + CAST(ph - pl AS DOUBLE) / 100.0 AS r2,
       CAST(ph + pl + pc AS DOUBLE) / 300.0
         - CAST(ph - pl AS DOUBLE) / 100.0 AS s2
FROM lagged
ORDER BY event_type, hr
""")
def stock_pivot_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    # floor-trader pivots from the PREVIOUS day's OHLC; raw IEEE
    # doubles with identical association both engines (k/300 rationals
    # can sit on rounding boundaries, so no round() anywhere)
    ev = load_table(spark, sf_dir, "events")
    return (ind.pivot_points(ind.daily_ohlc(ev))
            .orderBy("event_type", "hr"))


@register("stock_kyle_lambda", _BARS_CTE + _CENTS_CTE + """
, d AS (
  SELECT event_type, volume AS vol,
         c - lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS y
  FROM cts
), xy AS (
  SELECT event_type, y,
         CAST((CASE WHEN y > 0 THEN 1 WHEN y < 0 THEN -1 ELSE 0 END)
              * vol AS BIGINT) AS x
  FROM d WHERE y IS NOT NULL
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy GROUP BY event_type
)
SELECT event_type, n AS n_obs,
       CASE WHEN n * sxx - sx * sx > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS kyle_lambda
FROM g ORDER BY event_type
""")
def stock_kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    # price-impact regression slope on exact integer sums; UNROUNDED
    # single IEEE division (ratio of exact integers — raw double is
    # the only knife-edge-free canonical form)
    ev = load_table(spark, sf_dir, "events")
    return ind.kyle_lambda(ind.hourly_bars(ev))


@register("stock_roll_spread", _BARS_CTE + _CENTS_CTE + """
, dv AS (
  SELECT event_type, hr,
         c - lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS d
  FROM cts
), p AS (
  SELECT event_type, d,
         lag(d) OVER (PARTITION BY event_type ORDER BY hr) AS dl
  FROM dv
), q AS (
  SELECT event_type, d, dl FROM p
  WHERE d IS NOT NULL AND dl IS NOT NULL
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS sd,
         CAST(sum(dl) AS BIGINT) AS sdl,
         CAST(sum(d * dl) AS BIGINT) AS sddl
  FROM q GROUP BY event_type
)
SELECT event_type, n AS n_obs,
       CASE WHEN n * sddl - sd * sdl < 0
            THEN round(2.0 * sqrt(CAST(-(n * sddl - sd * sdl) AS DOUBLE))
                       / CAST(n AS DOUBLE) / 100.0, 6)
       END AS roll_spread
FROM g ORDER BY event_type
""")
def stock_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Roll's implied spread from the serial covariance of cents moves;
    # integer covariance numerator, sqrt guarded on the INTEGER sign
    # (DuckDB sqrt(negative) hard-crashes), 6-dp round after the
    # transcendental
    ev = load_table(spark, sf_dir, "events")
    return ind.roll_spread(ind.hourly_bars(ev))


@register("graph_assortativity", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
            FROM lineitem),
e AS (SELECT DISTINCT a.i AS ea, b.i AS eb
      FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
dg AS (SELECT v, CAST(count(*) AS BIGINT) AS d
       FROM (SELECT ea AS v FROM e UNION ALL SELECT eb FROM e)
       GROUP BY v),
j AS (SELECT da.d AS da, db.d AS db
      FROM e JOIN dg da ON e.ea = da.v JOIN dg db ON e.eb = db.v),
g AS (SELECT CAST(2 * count(*) AS BIGINT) AS m2,
             CAST(sum(da + db) AS BIGINT) AS sx,
             CAST(2 * sum(da * db) AS BIGINT) AS sxy,
             CAST(sum(da * da + db * db) AS BIGINT) AS sxx
      FROM j)
SELECT m2 // 2 AS n_edges,
       CASE WHEN m2 * sxx - sx * sx > 0
            THEN CAST(m2 * sxy - sx * sx AS DOUBLE)
                 / CAST(m2 * sxx - sx * sx AS DOUBLE)
       END AS assortativity
FROM g
""")
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # degree-degree Pearson over the co-purchase graph's 2m stubs:
    # four exact BIGINT sums over the degree-joined edge list, one
    # unrounded division — operators/analytics.degree_assortativity
    from ..operators.analytics import degree_assortativity
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return degree_assortativity(pairs, "pa", "pb")


from .catalog_text import _JACCARD_CTES, _WORDS  # noqa: E402
from .catalog_text import _STOPS as _QSTOPS  # noqa: E402


@register("dedup_containment", f"""
WITH {_JACCARD_CTES.replace('jac AS', '_jac_unused AS')}
SELECT id_a, id_b,
       ((1000000 * c) // least(sa.sz, sb.sz)) / 1e6 AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE (1000000 * c) // least(sa.sz, sb.sz) >= 500000
ORDER BY id_a, id_b
""")
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # asymmetric containment |∩|/min(|A|,|B|) over the same inverted
    # shingle index as the Jaccard pass — catches excerpt/wrapper
    # duplicates symmetric Jaccard dilutes; exact (1e6·|∩|) div grid
    from ..operators.dedup import containment_pairs
    return containment_pairs(load_table(spark, sf_dir, "documents"),
                             threshold=0.5, k=5)


@register("corpus_hapax_rate", f"""
WITH w AS (SELECT source, {_WORDS} AS ws FROM documents),
tf AS (SELECT source, t AS wd, CAST(count(*) AS BIGINT) AS cnt
       FROM (SELECT source, unnest(ws) AS t FROM w) GROUP BY source, t),
g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_vocab,
             CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hapax,
             CAST(sum(cnt) AS BIGINT) AS n_tokens
      FROM tf GROUP BY source)
SELECT source, n_tokens, n_vocab, n_hapax,
       CASE WHEN n_vocab > 0
            THEN ((1000000 * n_hapax) // n_vocab) / 1e6
       END AS hapax_rate
FROM g ORDER BY source
""")
def corpus_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-source hapax-legomena share of the vocabulary — OCR-noise /
    # boilerplate health signal; |source × vocab|-bounded work
    from ..operators.corpus import hapax_profile
    return hapax_profile(load_table(spark, sf_dir, "documents"))


@register("corpus_heaps_curve", f"""
WITH w AS (SELECT doc_id AS d, {_WORDS} AS ws FROM documents),
pd AS (SELECT d, CAST(len(ws) AS BIGINT) AS n_tok FROM w),
fo AS (SELECT t, min(d) AS d
       FROM (SELECT d, unnest(list_distinct(ws)) AS t FROM w)
       GROUP BY t),
nt AS (SELECT d, CAST(count(*) AS BIGINT) AS new_types
       FROM fo GROUP BY d),
base AS (SELECT pd.d, pd.n_tok,
                CAST(COALESCE(nt.new_types, 0) AS BIGINT) AS new_types
         FROM pd LEFT JOIN nt ON pd.d = nt.d),
cum AS (SELECT d,
               CAST(sum(n_tok) OVER (ORDER BY d) AS BIGINT)
                   AS cum_tokens,
               CAST(sum(new_types) OVER (ORDER BY d) AS BIGINT)
                   AS cum_vocab,
               ntile(10) OVER (ORDER BY d) AS decile
        FROM base),
lastd AS (SELECT decile, max(d) AS d FROM cum GROUP BY decile),
pick AS (SELECT c.decile, c.d, c.cum_tokens, c.cum_vocab
         FROM cum c JOIN lastd l ON c.decile = l.decile AND c.d = l.d),
anch AS (SELECT cum_tokens AS n1, cum_vocab AS v1 FROM pick
         WHERE decile = 1)
SELECT CAST(p.decile AS BIGINT) AS decile, p.d AS last_doc_id,
       p.cum_tokens, p.cum_vocab,
       CASE WHEN p.decile > 1 AND anch.v1 > 0
                 AND p.cum_tokens > anch.n1
            THEN round(ln(CAST(p.cum_vocab AS DOUBLE)
                          / CAST(anch.v1 AS DOUBLE))
                       / ln(CAST(p.cum_tokens AS DOUBLE)
                            / CAST(anch.n1 AS DOUBLE)), 6)
       END AS beta
FROM pick p, anch
ORDER BY decile
""")
def corpus_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # vocabulary-growth curve at doc deciles with the Heaps exponent
    # vs the first decile; first occurrences via one (type, min doc)
    # aggregate, both cumulatives on distributed_running_total, decile
    # pick via distributed_ntile — no single-partition window anywhere
    from ..operators.corpus import heaps_curve
    return heaps_curve(load_table(spark, sf_dir, "documents"))


@register("events_interarrival_quantiles", """
WITH g AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
         - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY event_type ORDER BY ts, event_id) AS v
  FROM events
), d AS (SELECT event_type, v FROM g WHERE v IS NOT NULL),
c AS (SELECT event_type, v, count(*) AS cnt FROM d GROUP BY 1, 2),
r AS (SELECT event_type, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM c),
n AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_rows
      FROM c GROUP BY event_type)
SELECT r.event_type, min(n.n_rows) AS n_rows,
       CAST(min(CASE WHEN cum >= (1 * n_rows + 1) // 2 THEN v END)
            AS BIGINT) AS q50,
       CAST(min(CASE WHEN cum >= (9 * n_rows + 9) // 10 THEN v END)
            AS BIGINT) AS q90,
       CAST(min(CASE WHEN cum >= (99 * n_rows + 99) // 100 THEN v END)
            AS BIGINT) AS q99
FROM r JOIN n ON r.event_type = n.event_type
GROUP BY r.event_type
ORDER BY r.event_type
""")
def events_interarrival_quantiles(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    # exact per-type inter-arrival-seconds quantiles on the hot-safe
    # grouped prefix sum (a hot event type spans many partitions);
    # integer epoch diffs (unix_timestamp truncates == floor(epoch))
    from ..operators.aggregates import grouped_exact_quantiles
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    e = F.unix_timestamp("ts")
    d = (ev.select("event_type", (e - F.lag(e).over(w)).alias("gap"))
         .filter(F.col("gap").isNotNull()))
    return (grouped_exact_quantiles(d, "event_type", "gap")
            .withColumnRenamed("gap", "v")
            .orderBy("event_type"))


@register("events_burst_minutes", """
WITH m AS (
  SELECT event_type, date_trunc('minute', ts) AS minute,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cnt) AS BIGINT) AS s,
         CAST(sum(cnt * cnt) AS BIGINT) AS sq,
         CAST(max(cnt) AS BIGINT) AS max_cnt
  FROM m GROUP BY event_type
)
SELECT m.event_type, min(g.n) AS n_minutes,
       min(g.s) AS total_events, min(g.max_cnt) AS max_minute_cnt,
       CAST(sum(CASE WHEN g.n * m.cnt - g.s > 0
                      AND (g.n * m.cnt - g.s) * (g.n * m.cnt - g.s)
                          > 9 * (g.n * g.sq - g.s * g.s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts
FROM m JOIN g ON m.event_type = g.event_type
GROUP BY m.event_type
ORDER BY m.event_type
""")
def events_burst_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-type burst census: minutes whose count exceeds mean + 3
    # POPULATION σ, decided entirely in integers —
    # (n·cnt − S) > 0 ∧ (n·cnt − S)² > 9·(n·Σc² − S²) — no float, no
    # sqrt, no rounding anywhere. Only minutes WITH events are scored
    # (sparse minutes are not zero-filled; the census is over active
    # minutes). Headroom: (n·cnt)² ≲ (4.3e4·x)²; inside int64 while
    # n·max_cnt < 3e9 — document re-grid past that.
    ev = load_table(spark, sf_dir, "events")
    m = (ev.groupBy("event_type",
                    F.date_trunc("minute", F.col("ts")).alias("minute"))
         .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    g = (m.groupBy("event_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("cnt").cast("long").alias("s"),
              F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sq"),
              F.max("cnt").cast("long").alias("max_cnt")))
    j = m.join(F.broadcast(g), "event_type")
    dev = F.col("n") * F.col("cnt") - F.col("s")
    var9 = 9 * (F.col("n") * F.col("sq") - F.col("s") * F.col("s"))
    return (j.groupBy("event_type")
            .agg(F.min("n").alias("n_minutes"),
                 F.min("s").alias("total_events"),
                 F.min("max_cnt").alias("max_minute_cnt"),
                 F.sum(F.when((dev > 0) & (dev * dev > var9), 1)
                       .otherwise(0)).cast("long").alias("n_bursts"))
            .orderBy("event_type"))


@register("embedding_bucket_balance", """
WITH a AS (SELECT vec_id AS aid, embedding::DOUBLE[] AS av
           FROM embeddings WHERE vec_id IN (1, 2, 3)),
b AS (SELECT e.vec_id,
             CAST(sum(CASE WHEN list_inner_product(
                                    e.embedding::DOUBLE[], a.av) >= 0
                      THEN power(2, a.aid - 1)::BIGINT ELSE 0 END)
                  AS BIGINT) AS bucket
      FROM embeddings e, a GROUP BY e.vec_id),
g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_vecs
      FROM b GROUP BY bucket),
t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_buckets
      FROM g)
SELECT g.bucket, g.n_vecs,
       ((1000000 * g.n_vecs) // t.total) / 1e6 AS share,
       ((1000000 * g.n_vecs * t.n_buckets) // t.total) / 1e6 AS skew_x
FROM g, t
ORDER BY g.bucket
""")
def embedding_bucket_balance(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    # sign-LSH bucket-occupancy audit for the ANN index: per-bucket
    # share and multiple-of-uniform skew on exact integer-quotient
    # grids — the load-balance report that decides whether the bucket
    # column can BE the scale-out partition key. Anchors are data
    # vectors (vec_id 1..3), identical both engines.
    from ..operators.similarity import as_double, sign_lsh_bucket
    e = load_table(spark, sf_dir, "embeddings")
    anchors = [[float(x) for x in r["embedding"]] for r in
               (e.filter(F.col("vec_id").isin(1, 2, 3))
                .orderBy("vec_id").select("embedding").collect())]
    b = e.select(sign_lsh_bucket(as_double("embedding"), anchors)
                 .alias("bucket"))
    g = (b.groupBy("bucket")
         .agg(F.count(F.lit(1)).cast("long").alias("n_vecs")))
    t = g.agg(F.sum("n_vecs").cast("long").alias("total"),
              F.count(F.lit(1)).cast("long").alias("n_buckets"))
    j = g.crossJoin(F.broadcast(t))  # 1-row broadcast scalar join
    return (j.select(
        "bucket", "n_vecs",
        (F.expr("(1000000 * n_vecs) div total") / 1e6).alias("share"),
        (F.expr("(1000000 * n_vecs * n_buckets) div total") / 1e6)
        .alias("skew_x"))
        .orderBy("bucket"))


def _ewma_stage_sql(i: int, src: str, vin: str, vout: str) -> str:
    """One banded-EWMA oracle stage (the stock_ewma_trend SQL shape),
    chained for TRIX: rank bands + probe unnest + weighted join-agg."""
    L, D = ind.EWMA_LOOKBACK, ind.EWMA_DECAY
    return f"""
p{i} AS (SELECT *, (rn - 1) // {L} AS band FROM {src}),
c{i} AS (SELECT event_type, hr, rn,
                unnest([(rn - 1) // {L}, (rn - 1) // {L} - 1]) AS probe
         FROM {src}),
e{i} AS (SELECT cur.event_type AS event_type, cur.hr AS hr,
                cur.rn AS rn,
                round(sum(prev.{vin} * pow({D}, cur.rn - prev.rn))
                      / sum(pow({D}, cur.rn - prev.rn)), 6) AS {vout}
         FROM c{i} cur JOIN p{i} prev
           ON cur.event_type = prev.event_type
          AND cur.probe = prev.band
          AND prev.rn > cur.rn - {L} AND prev.rn <= cur.rn
         GROUP BY cur.event_type, cur.hr, cur.rn)"""


@register("stock_trix", _BARS_CTE + """
, r0 AS (SELECT event_type, hr, close AS v0,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
         FROM bars),""" + _ewma_stage_sql(0, "r0", "v0", "v1") + ","
          + _ewma_stage_sql(1, "e0", "v1", "v2") + ","
          + _ewma_stage_sql(2, "e1", "v2", "v3") + """
SELECT event_type, hr, v3 AS ew3,
       (v3 / lag(v3) OVER (PARTITION BY event_type ORDER BY hr) - 1.0)
         * 10000.0 AS trix
FROM e2 ORDER BY event_type, hr
""")
def stock_trix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # triple-EWMA rate of change in basis points: three chained banded
    # rank-join stages (each 6-dp canonical), UNROUNDED final ratio
    # (ratio of exact 6-dp decimals — raw double is knife-edge-free)
    ev = load_table(spark, sf_dir, "events")
    return ind.trix(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_elder_ray", _BARS_CTE + """
, r0 AS (SELECT event_type, hr, high, low, close AS v0,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
         FROM bars),""" + _ewma_stage_sql(0, "r0", "v0", "ema") + """
SELECT b.event_type, b.hr, e0.ema,
       b.high - e0.ema AS bull_power,
       b.low - e0.ema AS bear_power
FROM bars b JOIN e0 ON b.event_type = e0.event_type AND b.hr = e0.hr
ORDER BY b.event_type, b.hr
""")
def stock_elder_ray(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bull/bear power vs the truncated-EWMA consensus; unrounded
    # differences of exact decimals
    ev = load_table(spark, sf_dir, "events")
    return (ind.elder_ray(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("stock_chande_momentum", _BARS_CTE + _CENTS_CTE + f"""
, dl AS (
  SELECT event_type, hr,
         c - lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS delta
  FROM cts
), gl AS (
  SELECT event_type, hr,
         CASE WHEN delta IS NULL THEN NULL
              ELSE greatest(delta, 0) END AS g,
         CASE WHEN delta IS NULL THEN NULL
              ELSE greatest(-delta, 0) END AS l
  FROM dl
), s AS (
  SELECT event_type, hr,
         CAST(sum(g) OVER wn AS BIGINT) AS sg,
         CAST(sum(l) OVER wn AS BIGINT) AS sl
  FROM gl WINDOW wn AS (PARTITION BY event_type ORDER BY hr
                        ROWS BETWEEN {ind.CMO_N - 1} PRECEDING
                        AND CURRENT ROW)
)
SELECT event_type, hr,
       CASE WHEN sg + sl > 0
            THEN (CASE WHEN sg - sl > 0 THEN 1
                       WHEN sg - sl < 0 THEN -1 ELSE 0 END)
                 * ((100000000 * abs(sg - sl)) // (sg + sl)) / 1e6
       END AS cmo
FROM s ORDER BY event_type, hr
""")
def stock_chande_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CMO on the sign-split quotient grid (div == // only for
    # non-negative operands — magnitude divided, sign reapplied)
    ev = load_table(spark, sf_dir, "events")
    return (ind.chande_momentum(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("graph_jaccard_linkpred", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
            FROM lineitem),
und AS (SELECT DISTINCT a.i AS ea, b.i AS eb
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
adj AS (SELECT ea AS node, eb AS nb FROM und
        UNION ALL SELECT eb, ea FROM und),
dd AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
       FROM adj GROUP BY node),
cen AS (SELECT node FROM dd WHERE deg BETWEEN 2 AND 64),
ac AS (SELECT adj.node, adj.nb FROM adj JOIN cen USING (node)),
w AS (SELECT l.nb AS a, r.nb AS b
      FROM ac l JOIN ac r ON l.node = r.node AND l.nb < r.nb),
sc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY a, b),
jn AS (SELECT sc.a, sc.b, sc.c, da.deg AS dda, db.deg AS ddb
       FROM sc JOIN dd da ON sc.a = da.node
               JOIN dd db ON sc.b = db.node),
na AS (SELECT * FROM jn WHERE NOT EXISTS
         (SELECT 1 FROM und WHERE und.ea = jn.a AND und.eb = jn.b)),
fin AS (SELECT a, b, c,
               (1000000 * c) // (dda + ddb - c) AS j6 FROM na)
SELECT a, b, c AS common_neighbors, j6 / 1e6 AS jaccard
FROM fin ORDER BY j6 DESC, a, b LIMIT 50
""")
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unweighted common-neighbor Jaccard link prediction with the
    # adamic_adar hub-cap contract; integer score grid, deterministic
    # top-k on (score, pair)
    from ..operators.analytics import jaccard_link_prediction
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return jaccard_link_prediction(pairs, "pa", "pb",
                                   max_center_degree=64, k=50)


@register("orders_basket_lift", """
WITH oi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem),
nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM oi),
ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM oi GROUP BY i),
p AS (SELECT a.i AS item_a, b.i AS item_b,
             CAST(count(*) AS BIGINT) AS support
      FROM oi a JOIN oi b ON a.b = b.b AND a.i < b.i
      GROUP BY 1, 2 HAVING count(*) >= 2),
j AS (SELECT p.item_a, p.item_b, p.support, ca.ci AS ca, cb.ci AS cb,
             nb.n_baskets
      FROM p JOIN ic ca ON p.item_a = ca.i
             JOIN ic cb ON p.item_b = cb.i, nb)
SELECT item_a, item_b, support, ca, cb,
       ((1000000 * support) // ca) / 1e6 AS confidence,
       CAST(n_baskets * support AS DOUBLE) / CAST(ca * cb AS DOUBLE)
           AS lift
FROM j ORDER BY support DESC, item_a, item_b LIMIT 25
""")
def orders_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # association-rule report over the co-purchase pairs: confidence on
    # the exact quotient grid, lift as an unrounded single division of
    # leaf-cast integer products; deterministic (support, pair) top-k
    from ..operators.analytics import association_rules
    return association_rules(load_table(spark, sf_dir, "lineitem"),
                             "l_orderkey", "l_partkey",
                             min_support=2, k=25)


@register("leadtime_anova", """
WITH d AS (
  SELECT o_orderpriority AS g,
         CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS y
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate IS NOT NULL
), per AS (
  SELECT g, CAST(count(*) AS BIGINT) AS ng,
         CAST(sum(y) AS BIGINT) AS sg,
         CAST(sum(y * y) AS BIGINT) AS qg
  FROM d GROUP BY g
), gg AS (
  SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(ng) AS BIGINT) AS n,
         CAST(sum(qg) AS BIGINT) AS q,
         CAST(sum(sg) AS BIGINT) AS s,
         CAST(sum((sg * sg) // ng) AS BIGINT) AS t
  FROM per
)
SELECT k AS k_groups, n,
       CAST(t - (s * s) // n AS BIGINT) AS ssb,
       CAST(q - t AS BIGINT) AS ssw,
       CASE WHEN k > 1 AND n > k AND q - t > 0
            THEN (CAST(t - (s * s) // n AS DOUBLE)
                  / CAST(k - 1 AS DOUBLE))
                 / (CAST(q - t AS DOUBLE) / CAST(n - k AS DOUBLE))
       END AS f_stat
FROM gg
""")
def leadtime_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-way ANOVA of ship lead time across order priorities on the
    # integer days-squared grid (integer-quotient SSB terms, unrounded
    # fixed-association F emit) — operators/aggregates.one_way_anova
    from ..operators.aggregates import one_way_anova
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
         .filter(F.col("l_shipdate").isNotNull())
         .select(F.col("o_orderpriority").alias("priority"),
                 F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                 .cast("long").alias("days")))
    return one_way_anova(d, "priority", "days")


@register("corpus_js_divergence", f"""
WITH tf AS (SELECT s, t AS w, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT source AS s, unnest({_WORDS}) AS t
                  FROM documents)
            GROUP BY s, t),
tot AS (SELECT s, CAST(sum(c) AS BIGINT) AS n FROM tf GROUP BY s),
aa AS (SELECT tf.s AS sa, w, c AS ca, n AS na FROM tf JOIN tot USING (s)),
bb AS (SELECT tf.s AS sb, w, c AS cb, n AS nb FROM tf JOIN tot USING (s)),
sh AS (SELECT aa.sa, bb.sb, aa.ca, aa.na, bb.cb, bb.nb
       FROM aa JOIN bb ON aa.w = bb.w AND aa.sa < bb.sb),
t AS (SELECT sa, sb, min(na) AS na, min(nb) AS nb,
             CAST(sum(ca) AS BIGINT) AS sca,
             CAST(sum(cb) AS BIGINT) AS scb,
             CAST(sum(CAST(round(1e6 * CAST(ca AS DOUBLE)
                      * ln(CAST(2 * ca * nb AS DOUBLE)
                           / CAST(ca * nb + cb * na AS DOUBLE)), 0)
                      AS BIGINT)) AS BIGINT) AS ta,
             CAST(sum(CAST(round(1e6 * CAST(cb AS DOUBLE)
                      * ln(CAST(2 * cb * na AS DOUBLE)
                           / CAST(ca * nb + cb * na AS DOUBLE)), 0)
                      AS BIGINT)) AS BIGINT) AS tb
      FROM sh GROUP BY sa, sb)
SELECT sa AS source_a, sb AS source_b,
       (CAST(ta + (na - sca) * 693147 AS DOUBLE) / 1e6
          / CAST(na AS DOUBLE)
        + CAST(tb + (nb - scb) * 693147 AS DOUBLE) / 1e6
          / CAST(nb AS DOUBLE)) / 2.0 AS js_divergence
FROM t ORDER BY source_a, source_b
""")
def corpus_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pairwise Jensen-Shannon matrix between source unigram
    # distributions on the c·ln integer grid; p/m reduces to a ratio
    # of exact BIGINTs, absent mass contributes exactly ln2 per token
    from ..operators.corpus import js_divergence_matrix
    return js_divergence_matrix(load_table(spark, sf_dir, "documents"))


@register("embedding_dim_variance", """
WITH q AS (
  SELECT unnest(range(0, len(embedding))) AS dim,
         CAST(round(unnest(embedding::DOUBLE[]) * 10000, 0) AS BIGINT)
             AS qq
  FROM embeddings
), g AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qq) AS BIGINT) AS s,
         CAST(sum(qq * qq) AS BIGINT) AS ss
  FROM q GROUP BY dim
), f AS (
  SELECT dim, n, s, ss, n * ss - s * s AS vn
  FROM g WHERE n > 1
)
SELECT CAST(dim AS BIGINT) AS dim, n,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 10000.0 AS mean,
       CAST(vn AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
         / 100000000.0 AS variance
FROM f ORDER BY vn DESC, dim LIMIT 16
""")
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-dimension mean/variance audit on the 1e-4 integer grid;
    # top-16 ordered on the INTEGER variance numerator so the cut is
    # float-free — operators/similarity.dimension_variance_profile
    from ..operators.similarity import dimension_variance_profile
    return dimension_variance_profile(
        load_table(spark, sf_dir, "embeddings"), top=16)


@register("orders_cohort_ltv", """
WITH o AS (
  SELECT o_custkey AS u,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
             AS m,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
), f AS (SELECT u, min(m) AS m0 FROM o GROUP BY u),
cell AS (
  SELECT f.m0 AS cohort_month, o.m - f.m0 AS month_offset,
         CAST(count(DISTINCT o.u) AS BIGINT) AS n_customers,
         CAST(sum(o.cents) AS BIGINT) AS rev_cents
  FROM o JOIN f ON o.u = f.u
  GROUP BY 1, 2
)
SELECT cohort_month, month_offset, n_customers, rev_cents,
       CAST(sum(rev_cents) OVER (PARTITION BY cohort_month
            ORDER BY month_offset
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_rev_cents
FROM cell ORDER BY cohort_month, month_offset
""")
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first-order-month cohort LTV triangle: active customers, period
    # revenue and running cumulative revenue per (cohort, offset) —
    # all integer cents; the window runs over the matrix, not orders
    from ..operators.analytics import cohort_ltv_triangle
    return cohort_ltv_triangle(load_table(spark, sf_dir, "orders"))


@register("events_path_trigrams", """
WITH t AS (
  SELECT lag(event_type, 2) OVER w AS e1,
         lag(event_type, 1) OVER w AS e2,
         event_type AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
FROM t WHERE e1 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3 LIMIT 20
""")
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-20 ordered 3-step event sequences over the deterministic
    # (user, ts, id) stream order; |types|^3-bounded key space
    from ..operators.analytics import path_trigrams
    return path_trigrams(load_table(spark, sf_dir, "events"))


@register("events_type_user_overlap", """
WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
per AS (SELECT t, CAST(count(*) AS BIGINT) AS nu FROM tu GROUP BY t),
c AS (SELECT a.t AS type_a, b.t AS type_b,
             CAST(count(*) AS BIGINT) AS common_users
      FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t
      GROUP BY 1, 2)
SELECT c.type_a, c.type_b, pa.nu AS users_a, pb.nu AS users_b,
       c.common_users,
       ((1000000 * c.common_users)
        // (pa.nu + pb.nu - c.common_users)) / 1e6 AS jaccard
FROM c JOIN per pa ON c.type_a = pa.t JOIN per pb ON c.type_b = pb.t
ORDER BY c.type_a, c.type_b
""")
def events_type_user_overlap(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    # audience-overlap Jaccard matrix between event types; user-keyed
    # pair join bounded by per-user type counts, exact quotient grid
    from ..operators.analytics import type_user_overlap
    return type_user_overlap(load_table(spark, sf_dir, "events"))


@register("corpus_length_histogram", """
SELECT source, CAST(length(bin(n_chars)) - 1 AS BIGINT) AS bucket,
       CAST(power(2, length(bin(n_chars)) - 1) AS BIGINT) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE n_chars > 0
GROUP BY source, bucket, bucket_lo
ORDER BY source, bucket
""")
def corpus_length_histogram(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    # power-of-two doc-length histogram per source; buckets via the
    # integer bit length (length(bin(x))-1) — never floor(log2(x)),
    # which can misbucket exact powers of two through the float
    from ..operators.corpus import length_histogram
    return length_histogram(load_table(spark, sf_dir, "documents"))


@register("dedup_cluster_sizes", f"""
WITH RECURSIVE {_JACCARD_CTES},
pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.5),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs),
walk(doc_id, lbl) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, w.lbl FROM edges e JOIN walk w ON w.doc_id = e.dst
),
assign AS (SELECT doc_id, min(lbl) AS cluster_id
           FROM walk GROUP BY doc_id),
sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       FROM assign GROUP BY cluster_id)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM sz GROUP BY cluster_size ORDER BY cluster_size
""")
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # near-dup cluster-size distribution — the dedup-impact histogram
    # (how much mass sits in big duplicate families) layered on the
    # same min-label connected components as dedup_cluster_assignment
    from ..operators.clustering import cluster_near_dups
    from ..operators import dedup as DD
    d = load_table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(d, threshold=0.5, k=5)
    sz = (cluster_near_dups(pairs)
          .groupBy("cluster_id")
          .agg(F.count(F.lit(1)).cast("long").alias("cluster_size")))
    return (sz.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
            .withColumn("n_docs", (F.col("cluster_size")
                                   * F.col("n_clusters")).cast("long"))
            .orderBy("cluster_size"))


@register("stock_updown_streaks", _BARS_CTE + _CENTS_CTE + """
, d AS (
  SELECT event_type, hr,
         CASE WHEN c - lag(c) OVER w > 0 THEN 1
              WHEN c - lag(c) OVER w < 0 THEN -1
              WHEN c - lag(c) OVER w = 0 THEN 0 END AS dir
  FROM cts WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), f AS (SELECT event_type, hr, CAST(dir AS BIGINT) AS dir
         FROM d WHERE dir IS NOT NULL AND dir != 0),
g AS (
  SELECT event_type, dir,
         row_number() OVER (PARTITION BY event_type ORDER BY hr)
         - row_number() OVER (PARTITION BY event_type, dir
                              ORDER BY hr) AS grp
  FROM f
), runs AS (
  SELECT event_type, dir, grp,
         CAST(count(*) AS BIGINT) AS streak_len
  FROM g GROUP BY event_type, dir, grp
)
SELECT event_type, dir AS direction, streak_len,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY event_type, dir, streak_len
ORDER BY event_type, direction, streak_len
""")
def stock_updown_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gaps-and-islands run-length census of up/down closes; tie bars
    # break streaks and are excluded on both engines
    ev = load_table(spark, sf_dir, "events")
    return ind.updown_streaks(ind.hourly_bars(ev))


@register("stock_overnight_gaps", """
WITH e AS (
  SELECT event_type, ts, event_id, value,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
), ro AS (
  SELECT event_type, ts, event_id, value, d,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
), daily AS (
  SELECT event_type, d AS hr,
         CAST(round(max(CASE WHEN rn_a = 1 THEN value END) * 100, 0)
              AS BIGINT) AS o,
         CAST(round(max(CASE WHEN rn_d = 1 THEN value END) * 100, 0)
              AS BIGINT) AS c
  FROM ro GROUP BY event_type, d
), gp AS (
  SELECT event_type,
         o - lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS gap
  FROM daily
), f AS (SELECT event_type, gap FROM gp WHERE gap IS NOT NULL),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gap_up,
         CAST(sum(CASE WHEN gap < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gap_down,
         CAST(max(gap) AS BIGINT) AS max_gap_up_cents,
         CAST(min(gap) AS BIGINT) AS max_gap_down_cents,
         CAST(sum(gap) AS BIGINT) AS net_gap_cents
  FROM f GROUP BY event_type
)
SELECT event_type, n_days, n_gap_up, n_gap_down, max_gap_up_cents,
       max_gap_down_cents, net_gap_cents,
       CASE WHEN n_days > 0
            THEN ((1000000 * n_gap_up) // n_days) / 1e6
       END AS gap_up_share
FROM g ORDER BY event_type
""")
def stock_overnight_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # overnight open-vs-prior-close gap census on daily bars — all
    # integer cents, up-share on the exact quotient grid
    ev = load_table(spark, sf_dir, "events")
    return ind.overnight_gaps(ind.daily_ohlc(ev))


@register("stock_volume_profile", _BARS_CTE + _CENTS_CTE + f"""
, vb AS (
  SELECT event_type, c - (c % {ind.VP_BUCKET_CENTS}) AS bucket_cents,
         CAST(sum(volume) AS BIGINT) AS bucket_volume
  FROM cts GROUP BY event_type, c - (c % {ind.VP_BUCKET_CENTS})
), rk AS (
  SELECT event_type, bucket_cents, bucket_volume,
         CAST(sum(bucket_volume) OVER (PARTITION BY event_type)
              AS BIGINT) AS total_volume,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY bucket_volume DESC,
                                          bucket_cents ASC)
              AS INTEGER) AS rank
  FROM vb
)
SELECT event_type, rank, bucket_cents, bucket_volume, total_volume,
       CASE WHEN total_volume > 0
            THEN ((100000000 * bucket_volume) // total_volume) / 1e6
       END AS volume_share_pct
FROM rk WHERE rank <= {ind.VP_TOP_K}
ORDER BY event_type, rank
""")
def stock_volume_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # volume-at-price point-of-control map: integer $1 buckets of the
    # close, exact volume sums, share on the (1e8·v) div total grid;
    # the total windows over the symbol × bucket matrix, not bars
    ev = load_table(spark, sf_dir, "events")
    return ind.volume_profile(ind.hourly_bars(ev))


@register("stock_weekly_bars", _BARS_CTE + """
, wb AS (
  SELECT event_type, CAST(date_trunc('week', hr) AS TIMESTAMP) AS wk, hr,
         open, high, low, close, volume,
         row_number() OVER (PARTITION BY event_type,
                                         date_trunc('week', hr)
                            ORDER BY hr) AS rn_a,
         row_number() OVER (PARTITION BY event_type,
                                         date_trunc('week', hr)
                            ORDER BY hr DESC) AS rn_d
  FROM bars
)
SELECT event_type, wk,
       max(CASE WHEN rn_a = 1 THEN open END) AS open,
       max(high) AS high, min(low) AS low,
       max(CASE WHEN rn_d = 1 THEN close END) AS close,
       CAST(sum(volume) AS BIGINT) AS volume,
       CAST(count(*) AS BIGINT) AS n_bars
FROM wb GROUP BY event_type, wk
ORDER BY event_type, wk
""")
def stock_weekly_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # weekly OHLC resample of the hourly bars — first/last picks are
    # tie-broken on the unique hr, extremes order-independent, volume
    # an exact integer sum; no float aggregation so raw doubles pass
    ev = load_table(spark, sf_dir, "events")
    return ind.weekly_bars(ind.hourly_bars(ev))


@register("stock_gap_fill_rate", """
WITH e AS (
  SELECT event_type, ts, event_id, value,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
), ro AS (
  SELECT event_type, ts, event_id, value, d,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
), daily AS (
  SELECT event_type, d AS hr,
         CAST(round(max(CASE WHEN rn_a = 1 THEN value END) * 100, 0)
              AS BIGINT) AS o,
         CAST(round(max(value) * 100, 0) AS BIGINT) AS h,
         CAST(round(min(value) * 100, 0) AS BIGINT) AS l,
         CAST(round(max(CASE WHEN rn_d = 1 THEN value END) * 100, 0)
              AS BIGINT) AS c
  FROM ro GROUP BY event_type, d
), gp AS (
  SELECT event_type, o, h, l,
         lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM daily
), f AS (SELECT * FROM gp WHERE pc IS NOT NULL),
g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN o > pc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gap_up,
         CAST(sum(CASE WHEN o > pc AND l <= pc THEN 1 ELSE 0 END)
              AS BIGINT) AS n_up_filled,
         CAST(sum(CASE WHEN o < pc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gap_down,
         CAST(sum(CASE WHEN o < pc AND h >= pc THEN 1 ELSE 0 END)
              AS BIGINT) AS n_down_filled
  FROM f GROUP BY event_type
)
SELECT event_type, n_gap_up, n_up_filled, n_gap_down, n_down_filled,
       CASE WHEN n_gap_up > 0
            THEN ((1000000 * n_up_filled) // n_gap_up) / 1e6
       END AS up_fill_share,
       CASE WHEN n_gap_down > 0
            THEN ((1000000 * n_down_filled) // n_gap_down) / 1e6
       END AS down_fill_share
FROM g ORDER BY event_type
""")
def stock_gap_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same-day gap-fill census on daily bars: integer-cents touch
    # tests against the prior close, fill shares on the exact
    # (1e6·filled) div gaps quotient grid (NULL when never gapped)
    ev = load_table(spark, sf_dir, "events")
    return ind.gap_fill_rate(ind.daily_ohlc(ev))


@register("stock_intraday_curve", _BARS_CTE + """
, hv AS (
  SELECT event_type, CAST(hour(hr) AS INTEGER) AS hour_of_day,
         CAST(sum(volume) AS BIGINT) AS hour_volume
  FROM bars GROUP BY event_type, CAST(hour(hr) AS INTEGER)
), t AS (
  SELECT event_type, hour_of_day, hour_volume,
         CAST(sum(hour_volume) OVER (PARTITION BY event_type)
              AS BIGINT) AS total_volume
  FROM hv
)
SELECT event_type, hour_of_day, hour_volume,
       CASE WHEN total_volume > 0
            THEN ((100000000 * hour_volume) // total_volume) / 1e6
       END AS volume_share_pct
FROM t ORDER BY event_type, hour_of_day
""")
def stock_intraday_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hour-of-day volume seasonality (the VWAP-scheduler U-curve):
    # exact integer volume sums, share on the quotient grid, totals
    # windowed over the symbol × 24-hour matrix
    ev = load_table(spark, sf_dir, "events")
    return ind.intraday_volume_curve(ind.hourly_bars(ev))


@register("dedup_prefix_groups", f"""
WITH p AS (
  SELECT array_to_string(
           list_slice(list_filter(string_split(text, ' '),
                                  x -> x != ''),
                      1, {dd.PREFIX_WORDS}), ' ') AS prefix
  FROM documents
), g AS (
  SELECT prefix, CAST(count(*) AS BIGINT) AS group_size
  FROM p GROUP BY prefix HAVING count(*) >= 2
)
SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(group_size) AS BIGINT) AS n_docs
FROM g GROUP BY group_size ORDER BY group_size
""")
def dedup_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # boilerplate-opening detector: one hash-agg on the 8-word prefix
    # key, census over the group-size matrix — exact counts only
    docs = load_table(spark, sf_dir, "documents")
    return dd.prefix_dup_census(docs)


@register("dedup_edit_distance", f"""
WITH d AS (
  SELECT doc_id, lang, source, n_chars // 8 AS lb, text FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL
), sizes AS (
  SELECT lang, source, lb, CAST(count(*) AS BIGINT) AS bsz
  FROM d GROUP BY lang, source, lb
), census AS (
  SELECT lang,
         CAST(sum(bsz * (bsz - 1) // 2) AS BIGINT) AS n_candidate_pairs,
         CAST(sum(CASE WHEN bsz <= {dd.EDIT_DIST_BLOCK_CAP}
                       THEN bsz * (bsz - 1) // 2 ELSE 0 END)
              AS BIGINT) AS n_pairs_evaluated,
         CAST(sum(CASE WHEN bsz > {dd.EDIT_DIST_BLOCK_CAP} THEN 1
                  ELSE 0 END) AS BIGINT) AS n_blocks_skipped,
         CAST(sum(CASE WHEN bsz > {dd.EDIT_DIST_BLOCK_CAP}
                       THEN bsz * (bsz - 1) // 2 ELSE 0 END)
              AS BIGINT) AS n_pairs_skipped
  FROM sizes GROUP BY lang
), small AS (
  SELECT d.* FROM d
  JOIN sizes s ON d.lang = s.lang AND d.source = s.source
              AND d.lb = s.lb
  WHERE s.bsz <= {dd.EDIT_DIST_BLOCK_CAP}
), pairs AS (
  SELECT a.lang, CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
  FROM small a JOIN small b
    ON a.lang = b.lang AND a.source = b.source AND a.lb = b.lb
   AND a.doc_id < b.doc_id
), stats AS (
  SELECT lang,
         CAST(sum(CASE WHEN dist <= {dd.EDIT_DIST_MAX} THEN 1 ELSE 0
                  END) AS BIGINT) AS n_near_dup,
         CAST(min(dist) AS BIGINT) AS min_distance,
         CAST(sum(dist) AS BIGINT) AS sum_distance
  FROM pairs GROUP BY lang
)
SELECT c.lang, c.n_candidate_pairs, c.n_pairs_evaluated,
       c.n_blocks_skipped, c.n_pairs_skipped,
       CAST(coalesce(s.n_near_dup, 0) AS BIGINT) AS n_near_dup,
       s.min_distance,
       CASE WHEN c.n_pairs_evaluated > 0
            THEN ((1000000 * s.sum_distance) // c.n_pairs_evaluated)
                 / 1e6
       END AS mean_distance,
       CAST({dd.EDIT_DIST_BLOCK_CAP} AS BIGINT) AS block_cap
FROM census c LEFT JOIN stats s ON c.lang = s.lang
WHERE c.n_candidate_pairs > 0 ORDER BY c.lang
""")
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # block-keyed Levenshtein near-dup report with a HARD per-block
    # cap: pair mass of over-cap blocks is counted arithmetically
    # (C(bsz,2) off the size agg) and audited as skipped — one hot
    # template-crawl block costs one agg row, never a quadratic join
    docs = load_table(spark, sf_dir, "documents")
    return dd.edit_distance_report(docs)


@register("corpus_char_classes", """
WITH c AS (
  SELECT source, CAST(length(text) AS BIGINT) AS n,
         CAST(length(text)
              - length(regexp_replace(text, '[a-z]', '', 'g'))
              AS BIGINT) AS a,
         CAST(length(text)
              - length(regexp_replace(text, '[0-9]', '', 'g'))
              AS BIGINT) AS d,
         CAST(length(text)
              - length(regexp_replace(text, ' ', '', 'g'))
              AS BIGINT) AS s
  FROM documents
), g AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_chars,
         CAST(sum(a) AS BIGINT) AS n_alpha,
         CAST(sum(d) AS BIGINT) AS n_digit,
         CAST(sum(s) AS BIGINT) AS n_space
  FROM c GROUP BY source
), w AS (
  SELECT *, n_chars - n_alpha - n_digit - n_space AS n_other FROM g
)
SELECT source, n_chars, n_alpha, n_digit, n_space, n_other,
       CASE WHEN n_chars > 0
            THEN ((100000000 * n_alpha) // n_chars) / 1e6
       END AS alpha_share,
       CASE WHEN n_chars > 0
            THEN ((100000000 * n_space) // n_chars) / 1e6
       END AS space_share,
       CASE WHEN n_chars > 0
            THEN ((100000000 * n_other) // n_chars) / 1e6
       END AS other_share
FROM w ORDER BY source
""")
def corpus_char_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # encoding/noise audit: char-class counts as regexp-strip length
    # diffs (pure projections), BIGINT sums, quotient-grid shares
    docs = load_table(spark, sf_dir, "documents")
    return corpus_ops.char_class_profile(docs)


@register("events_dow_hour_profile", """
WITH b AS (
  SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
         CAST(hour(ts) AS INTEGER) AS hour_of_day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), t AS (
  SELECT *, CAST(sum(n_events) OVER () AS BIGINT) AS total_events
  FROM b
)
SELECT dow, hour_of_day, n_events,
       CASE WHEN total_events > 0
            THEN ((100000000 * n_events) // total_events) / 1e6
       END AS event_share_pct
FROM t ORDER BY dow, hour_of_day
""")
def events_dow_hour_profile(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    # weekly-seasonality heatmap: day-of-week (0 = Sunday, DuckDB's
    # dayofweek grid; Spark's 1-based dayofweek shifted by −1) × hour
    # counts; the global total windows over the ≤168-row matrix
    ev = load_table(spark, sf_dir, "events")
    b = (ev.select((F.dayofweek("ts") - 1).cast("int").alias("dow"),
                   F.hour("ts").cast("int").alias("hour_of_day"))
         .groupBy("dow", "hour_of_day")
         .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    t = b.withColumn(
        "total_events",
        F.sum("n_events").over(Window.partitionBy()).cast("long"))
    share = F.expr("(100000000 * n_events) div total_events") / 1e6
    return (t.select("dow", "hour_of_day", "n_events",
                     F.when(F.col("total_events") > 0, share)
                     .alias("event_share_pct"))
            .orderBy("dow", "hour_of_day"))


@register("orders_pareto_deciles", """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY o_custkey
), t AS (
  SELECT rev_cents,
         ntile(10) OVER (ORDER BY rev_cents DESC, o_custkey) AS decile
  FROM rev
), g AS (
  SELECT CAST(decile AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(rev_cents) AS BIGINT) AS decile_rev_cents
  FROM t GROUP BY decile
), w AS (
  SELECT *,
         CAST(sum(decile_rev_cents) OVER () AS BIGINT) AS total_cents,
         CAST(sum(decile_rev_cents)
              OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS cum_cents
  FROM g
)
SELECT decile, n_customers, decile_rev_cents,
       CASE WHEN total_cents > 0
            THEN CAST(decile_rev_cents AS DOUBLE)
                 / CAST(total_cents AS DOUBLE)
       END AS revenue_share,
       CASE WHEN total_cents > 0
            THEN CAST(cum_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
       END AS cum_share
FROM w ORDER BY decile
""")
def orders_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 80/20 revenue-concentration curve: integer-cents sums, exact
    # decile cut via distributed_ntile (no single-partition sort),
    # shares + cumulative over the 10-row decile matrix
    from ..operators.analytics import pareto_decile_share
    return pareto_decile_share(load_table(spark, sf_dir, "orders"))


@register("orders_reorder_census", f"""
WITH g AS (
  SELECT date_diff('day',
           CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS DATE),
           CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
), f AS (SELECT CAST(gap_days AS BIGINT) AS gap_days FROM g
         WHERE gap_days IS NOT NULL),
b AS (
  SELECT gap_days // {ana.REORDER_BUCKET_DAYS} AS bucket,
         CAST(count(*) AS BIGINT) AS n_intervals
  FROM f GROUP BY 1
), t AS (
  SELECT *, CAST(sum(n_intervals) OVER () AS BIGINT)
            AS total_intervals
  FROM b
)
SELECT CAST(bucket * {ana.REORDER_BUCKET_DAYS} AS BIGINT)
           AS bucket_start_days,
       n_intervals,
       CASE WHEN total_intervals > 0
            THEN ((100000000 * n_intervals) // total_intervals) / 1e6
       END AS interval_share_pct
FROM t ORDER BY bucket_start_days
""")
def orders_reorder_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repurchase-cadence histogram: exact DATE-grid day gaps under the
    # (date, orderkey) total order, week-wide integer buckets,
    # quotient-grid shares over the bucket matrix
    from ..operators.analytics import reorder_interval_census
    return reorder_interval_census(load_table(spark, sf_dir, "orders"))


@register("embedding_centroid_sim", """
WITH x AS (
  SELECT label, unnest(range(0, len(embedding))) AS dim,
         CAST(round(unnest(embedding::DOUBLE[]) * 10000, 0) AS BIGINT)
             AS xi
  FROM embeddings
), s AS (
  SELECT label, dim, CAST(sum(xi) AS BIGINT) AS s
  FROM x GROUP BY label, dim
), norms AS (
  SELECT label, CAST(sum(s * s) AS BIGINT) AS nsq FROM s GROUP BY label
), dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         CAST(sum(a.s * b.s) AS BIGINT) AS dot
  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT CAST(d.label_a AS BIGINT) AS label_a,
       CAST(d.label_b AS BIGINT) AS label_b, d.dot,
       CASE WHEN na.nsq > 0 AND nb.nsq > 0
            THEN CAST(d.dot AS DOUBLE)
                 / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE))
       END AS cosine
FROM dots d
JOIN norms na ON d.label_a = na.label
JOIN norms nb ON d.label_b = nb.label
ORDER BY label_a, label_b
""")
def embedding_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    # class-separation audit: cosine between per-label centroid SUM
    # vectors (cos(mean,mean) == cos(sum,sum) — no integer ratio ever
    # formed); exact BIGINT (label, dim) sums, unrounded double emit
    # with the na·nb product formed in doubles on both engines
    from ..operators.similarity import label_centroid_similarity
    return label_centroid_similarity(
        load_table(spark, sf_dir, "embeddings"))


@register("graph_rich_club", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
            FROM lineitem),
und AS (SELECT DISTINCT a.i AS ea, b.i AS eb
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT ea AS node FROM und
              UNION ALL SELECT eb FROM und)
        GROUP BY node),
h AS (SELECT deg AS d, count(*) AS cnt FROM deg GROUP BY 1),
c AS (SELECT d,
             sum(cnt) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW) AS cum,
             sum(cnt) OVER () AS n_total
      FROM h),
thr AS (
  SELECT 50 AS pct, min(d) AS threshold_deg FROM c
  WHERE cum >= (50 * n_total + 50) // 100
  UNION ALL
  SELECT 75, min(d) FROM c WHERE cum >= (75 * n_total + 75) // 100
  UNION ALL
  SELECT 90, min(d) FROM c WHERE cum >= (90 * n_total + 90) // 100
),
mem AS (SELECT t.pct, t.threshold_deg,
               CAST(count(*) AS BIGINT) AS n_nodes
        FROM deg d JOIN thr t ON d.deg >= t.threshold_deg
        GROUP BY 1, 2),
ed AS (SELECT least(da.deg, db.deg) AS dmin
       FROM und u
       JOIN deg da ON u.ea = da.node
       JOIN deg db ON u.eb = db.node),
eg AS (SELECT t.pct, CAST(count(*) AS BIGINT) AS n_edges
       FROM ed JOIN thr t ON ed.dmin >= t.threshold_deg
       GROUP BY 1)
SELECT CAST(m.pct AS BIGINT) AS pct,
       CAST(m.threshold_deg AS BIGINT) AS threshold_deg,
       m.n_nodes,
       CAST(coalesce(eg.n_edges, 0) AS BIGINT) AS n_edges,
       CASE WHEN m.n_nodes > 1
            THEN ((100000000 * 2 * coalesce(eg.n_edges, 0))
                  // (m.n_nodes * (m.n_nodes - 1))) / 1e6
       END AS phi
FROM mem m LEFT JOIN eg ON m.pct = eg.pct
ORDER BY pct
""")
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rich-club density at exact degree-quantile thresholds over the
    # co-purchase part graph: histogram-matrix prefix sums for the
    # thresholds, broadcast 3-row threshold table onto the
    # degree-annotated edges, quotient-grid phi
    from ..operators.analytics import rich_club
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    # no .distinct() here: rich_club canonicalizes + dedups the pair
    # list itself — a pre-distinct would just add a full-edge shuffle
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return rich_club(pairs, "pa", "pb")


_DAILY_CENTS_CTE = """
WITH e AS (
  SELECT event_type, ts, event_id, value,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
), ro AS (
  SELECT event_type, ts, event_id, value, d,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
), daily AS (
  SELECT event_type, d AS hr,
         CAST(round(max(CASE WHEN rn_d = 1 THEN value END) * 100, 0)
              AS BIGINT) AS c
  FROM ro GROUP BY event_type, d
)"""


@register("stock_monthly_returns", _DAILY_CENTS_CTE + """
, m AS (
  SELECT event_type, hr,
         CAST(date_trunc('month', hr) AS TIMESTAMP) AS month, c,
         row_number() OVER (PARTITION BY event_type,
                                         date_trunc('month', hr)
                            ORDER BY hr) AS rn_a,
         row_number() OVER (PARTITION BY event_type,
                                         date_trunc('month', hr)
                            ORDER BY hr DESC) AS rn_d
  FROM daily
), g AS (
  SELECT event_type, month,
         max(CASE WHEN rn_a = 1 THEN c END) AS first_close_cents,
         max(CASE WHEN rn_d = 1 THEN c END) AS last_close_cents,
         CAST(count(*) AS BIGINT) AS n_days
  FROM m GROUP BY event_type, month
)
SELECT event_type, month, first_close_cents, last_close_cents, n_days,
       CASE WHEN first_close_cents > 0
            THEN CAST(last_close_cents - first_close_cents AS DOUBLE)
                 / CAST(first_close_cents AS DOUBLE)
       END AS monthly_return
FROM g ORDER BY event_type, month
""")
def stock_monthly_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    # calendar-month return panel: tie-broken first/last close picks,
    # integer cents, UNROUNDED double ratio emit (single IEEE
    # division), zero-close guard on both engines
    ev = load_table(spark, sf_dir, "events")
    return ind.monthly_returns(ind.daily_ohlc(ev))


@register("stock_return_histogram", _DAILY_CENTS_CTE + f"""
, lagd AS (
  SELECT event_type,
         c, lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM daily
), r AS (
  SELECT event_type,
         CASE WHEN c >= pc THEN (10000 * abs(c - pc)) // pc
              ELSE -((10000 * abs(c - pc)) // pc) END AS r_bp
  FROM lagd WHERE pc IS NOT NULL AND pc > 0
), b AS (
  SELECT event_type,
         ((r_bp + {ind.RET_HIST_OFFSET}) // {ind.RET_HIST_BUCKET})
             * {ind.RET_HIST_BUCKET} - {ind.RET_HIST_OFFSET}
             AS bucket_bp,
         CAST(count(*) AS BIGINT) AS n_days
  FROM r GROUP BY 1, 2
), t AS (
  SELECT *, CAST(sum(n_days) OVER (PARTITION BY event_type)
                 AS BIGINT) AS total_days
  FROM b
)
SELECT event_type, CAST(bucket_bp AS BIGINT) AS bucket_bp, n_days,
       CASE WHEN total_days > 0
            THEN ((100000000 * n_days) // total_days) / 1e6
       END AS day_share_pct
FROM t ORDER BY event_type, bucket_bp
""")
def stock_return_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fat-tail census: sign-split bp-grid daily returns (trunc-div ==
    # // only for non-negative magnitudes), +1e4 shift BEFORE the
    # bucket div so floor-vs-trunc can't split engines on negatives
    ev = load_table(spark, sf_dir, "events")
    return ind.return_histogram(ind.daily_ohlc(ev))


@register("corpus_source_vocab_overlap", """
WITH st AS (
  SELECT DISTINCT source,
         unnest(list_filter(string_split(text, ' '), x -> x != ''))
             AS tok
  FROM documents
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS vocab
  FROM st GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
), j AS (
  SELECT i.source_a, i.source_b,
         sa.vocab AS vocab_a, sb.vocab AS vocab_b, i.n_shared,
         CAST(sa.vocab + sb.vocab - i.n_shared AS BIGINT) AS n_union
  FROM inter i
  JOIN sizes sa ON i.source_a = sa.source
  JOIN sizes sb ON i.source_b = sb.source
)
SELECT source_a, source_b, vocab_a, vocab_b, n_shared, n_union,
       CASE WHEN n_union > 0
            THEN ((1000000 * n_shared) // n_union) / 1e6
       END AS jaccard
FROM j ORDER BY source_a, source_b
""")
def corpus_source_vocab_overlap(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    # domain-shift screen: distinct (source, token) projection,
    # token-keyed pair join (shared tokens only — never vocab×vocab),
    # Jaccard on the exact quotient grid over the source-pair matrix
    docs = load_table(spark, sf_dir, "documents")
    return corpus_ops.source_vocab_overlap(docs)


_BENFORD_SQL_CASE = " ".join(
    f"WHEN {d} THEN CAST({v!r} AS DOUBLE)"
    for d, v in ana.BENFORD_EXPECTED.items())


@register("events_benford_digits", f"""
WITH v AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events
), d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n_values
  FROM v WHERE cents > 0 GROUP BY 1
), t AS (
  SELECT *, CAST(sum(n_values) OVER () AS BIGINT) AS total_values
  FROM d
), o AS (
  SELECT digit, n_values,
         CASE WHEN total_values > 0
              THEN ((100000000 * n_values) // total_values) / 1e8
         END AS observed_share,
         CASE digit {_BENFORD_SQL_CASE} END AS expected_share
  FROM t
)
SELECT digit, n_values, observed_share, expected_share,
       observed_share - expected_share AS deviation
FROM o ORDER BY digit
""")
def events_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benford first-digit audit: leading digit from the DECIMAL STRING
    # of integer cents (no float log10 boundary), quotient-grid
    # observed shares, hardcoded shared expected literals
    from ..operators.analytics import benford_first_digit
    ev = load_table(spark, sf_dir, "events")
    return benford_first_digit(ev)


@register("events_session_concurrency", """
WITH o AS (SELECT user_id, ts, event_id,
                  lag(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
           FROM events),
m AS (SELECT user_id, ts, event_id,
             CASE WHEN prev IS NULL
                       OR date_diff('second', prev, ts) > 1800 THEN 1
                  ELSE 0 END AS is_new
      FROM o),
s AS (SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS session_id
      FROM m),
sess AS (SELECT user_id, session_id,
                min(ts) AS session_start, max(ts) AS session_end
         FROM s GROUP BY user_id, session_id),
dl AS (SELECT session_start AS t, 1 AS d FROM sess
       UNION ALL
       SELECT session_end + INTERVAL 1 SECOND, -1 FROM sess),
ag AS (SELECT t, CAST(sum(d) AS BIGINT) AS delta FROM dl GROUP BY t),
r AS (SELECT CAST(sum(delta) OVER (ORDER BY t ROWS UNBOUNDED
                                   PRECEDING) AS BIGINT) AS level
      FROM ag)
SELECT level, CAST(count(*) AS BIGINT) AS n_instants
FROM r GROUP BY level ORDER BY level
""")
def events_session_concurrency(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    # sweep-line concurrency census over 30-min gap sessions: ±1
    # deltas (closed intervals — the −1 at end+1s), per-instant
    # pre-agg, exact prefix sum via distributed_running_total, level
    # histogram — the capacity-planning curve
    from ..operators.analytics import session_concurrency_census
    ev = load_table(spark, sf_dir, "events")
    return session_concurrency_census(ev)


@register("stock_advance_decline", _DAILY_CENTS_CTE + """
, lagd AS (
  SELECT event_type, hr, c,
         lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM daily
), f AS (SELECT * FROM lagd WHERE pc IS NOT NULL),
g AS (
  SELECT hr AS day,
         CAST(sum(CASE WHEN c > pc THEN 1 ELSE 0 END) AS BIGINT)
             AS advancers,
         CAST(sum(CASE WHEN c < pc THEN 1 ELSE 0 END) AS BIGINT)
             AS decliners,
         CAST(sum(CASE WHEN c = pc THEN 1 ELSE 0 END) AS BIGINT)
             AS unchanged
  FROM f GROUP BY hr
)
SELECT day, advancers, decliners, unchanged,
       CAST(advancers - decliners AS BIGINT) AS net,
       CAST(sum(advancers - decliners)
            OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS ad_line
FROM g ORDER BY day
""")
def stock_advance_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # market-breadth A/D line: integer-cents up/down/flat counts per
    # day across symbols, cumulative net over the calendar-bounded
    # day matrix
    from ..operators.analytics import advance_decline_line
    ev = load_table(spark, sf_dir, "events")
    return advance_decline_line(ind.daily_ohlc(ev))


@register("graph_copurchase_weights", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
            FROM lineitem),
w AS (SELECT a.i AS ia, b.i AS ib, CAST(count(*) AS BIGINT) AS weight
      FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i
      GROUP BY 1, 2),
h AS (SELECT weight, CAST(count(*) AS BIGINT) AS n_edges
      FROM w GROUP BY 1),
t AS (SELECT *, CAST(sum(n_edges) OVER () AS BIGINT) AS total FROM h)
SELECT weight, n_edges,
       CASE WHEN total > 0
            THEN ((1000000 * n_edges) // total) / 1e6
       END AS edge_share
FROM t ORDER BY weight
""")
def graph_copurchase_weights(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    # co-purchase edge-weight (support) histogram: basket-keyed pair
    # join (bounded fan-out), exact weights, quotient-grid share over
    # the weight matrix — the min-support tuning curve
    from ..operators.analytics import copurchase_weight_histogram
    li = load_table(spark, sf_dir, "lineitem")
    return copurchase_weight_histogram(
        li.select(F.col("l_orderkey").alias("bk"),
                  F.col("l_partkey").alias("i")))


@register("corpus_bigram_pmi", f"""
WITH w AS (SELECT doc_id, {{_W}} AS ws FROM documents),
uni AS (SELECT unnest(ws) AS tok FROM w),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok),
nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uc),
bg AS (SELECT unnest(list_transform(range(1, len(ws)),
                                    i -> ws[i] || ' ' || ws[i + 1]))
              AS bigram
       FROM w),
bc AS (SELECT split_part(bigram, ' ', 1) AS w1,
              split_part(bigram, ' ', 2) AS w2,
              CAST(count(*) AS BIGINT) AS c_ab
       FROM bg GROUP BY 1, 2),
nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS nb FROM bc),
top AS (SELECT * FROM bc ORDER BY c_ab DESC, w1, w2
        LIMIT {corpus_ops.PMI_TOP_K})
SELECT t.w1, t.w2, t.c_ab, ua.c AS c_a, ub.c AS c_b,
       ln((CAST(t.c_ab AS DOUBLE) * CAST(nu.nu AS DOUBLE)
           * CAST(nu.nu AS DOUBLE))
          / (CAST(nb.nb AS DOUBLE) * CAST(ua.c AS DOUBLE)
             * CAST(ub.c AS DOUBLE))) AS pmi
FROM top t
JOIN uc ua ON t.w1 = ua.tok
JOIN uc ub ON t.w2 = ub.tok, nu, nb
ORDER BY t.c_ab DESC, t.w1, t.w2
""".replace("{_W}", "list_filter(string_split(text, ' '), x -> x != '')"))
def corpus_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collocation PMI for the top-20 bigrams: integer top-k cut
    # (count desc, lexicographic), ln of ONE double division with
    # identical triple-product association both engines
    docs = load_table(spark, sf_dir, "documents")
    return corpus_ops.bigram_pmi(docs)


@register("events_retention_triangle", """
WITH uw AS (
  SELECT DISTINCT user_id AS u,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
  FROM events
), c AS (
  SELECT u, w, min(w) OVER (PARTITION BY u) AS cohort FROM uw
), cells AS (
  SELECT cohort,
         CAST(date_diff('day', CAST(cohort AS DATE), CAST(w AS DATE))
              // 7 AS BIGINT) AS week_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM c GROUP BY 1, 2
), sz AS (
  SELECT cohort, n_active AS cohort_size FROM cells
  WHERE week_offset = 0
)
SELECT cells.cohort, cells.week_offset, cells.n_active,
       sz.cohort_size,
       CASE WHEN sz.cohort_size > 0
            THEN ((1000000 * cells.n_active) // sz.cohort_size) / 1e6
       END AS retention
FROM cells JOIN sz ON cells.cohort = sz.cohort
ORDER BY cells.cohort, cells.week_offset
""")
def events_retention_triangle(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    # weekly cohort-retention triangle: distinct (user, week)
    # projection, min-window cohort, integer day-diff div 7 offsets,
    # cohort size joined back from the offset-0 cell, quotient-grid
    # retention over the cohort×offset matrix
    from ..operators.analytics import retention_triangle
    return retention_triangle(load_table(spark, sf_dir, "events"))


@register("lineitem_discount_impact", """
WITH li AS (
  SELECT CAST(round(l_discount * 100, 0) AS BIGINT) AS discount_pct,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS ec
  FROM lineitem
), g AS (
  SELECT discount_pct, CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(ec) AS BIGINT) AS gross_cents,
         CAST(sum(ec * discount_pct) AS BIGINT) AS disc_weighted
  FROM li GROUP BY discount_pct
)
SELECT discount_pct, n_items, gross_cents,
       CAST(disc_weighted // 100 AS BIGINT) AS discount_given_cents,
       CASE WHEN gross_cents > 0
            THEN CAST(disc_weighted AS DOUBLE)
                 / (CAST(gross_cents AS DOUBLE) * 100.0)
       END AS effective_discount
FROM g ORDER BY discount_pct
""")
def lineitem_discount_impact(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    # discount-tier economics: exact cents×bp integer products, the
    # given-away revenue as one trunc-div, effective discount as ONE
    # association-mirrored double division
    from ..operators.analytics import discount_impact
    return discount_impact(load_table(spark, sf_dir, "lineitem"))


@register("orders_first_vs_repeat", """
WITH r AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) = 1
             AS is_first,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
), g AS (
  SELECT month, is_first, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(cents) AS BIGINT) AS revenue_cents
  FROM r GROUP BY month, is_first
), t AS (
  SELECT *, CAST(sum(revenue_cents) OVER (PARTITION BY month)
                 AS BIGINT) AS month_cents
  FROM g
)
SELECT month, is_first, n_orders, revenue_cents,
       CASE WHEN month_cents > 0
            THEN CAST(revenue_cents AS DOUBLE)
                 / CAST(month_cents AS DOUBLE)
       END AS revenue_share
FROM t ORDER BY month, is_first
""")
def orders_first_vs_repeat(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    # acquisition-vs-retention revenue mix: first order = row 1 under
    # the per-customer (date, orderkey) total order; integer cents;
    # within-month share as an unrounded double ratio (pareto
    # precedent), totals over the month×2 matrix
    from ..operators.analytics import first_vs_repeat_revenue
    return first_vs_repeat_revenue(load_table(spark, sf_dir, "orders"))


@register("graph_degree_gini", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
            FROM lineitem),
und AS (SELECT DISTINCT a.i AS ea, b.i AS eb
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS x
        FROM (SELECT ea AS node FROM und
              UNION ALL SELECT eb FROM und) GROUP BY node),
h AS (SELECT x, CAST(count(*) AS BIGINT) AS w FROM deg GROUP BY x),
c AS (SELECT x, w,
             CAST(sum(w) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                  - w AS BIGINT) AS c
      FROM h),
g AS (SELECT CAST(sum(w) AS BIGINT) AS n,
             CAST(sum(x * w) AS BIGINT) AS sx,
             CAST(sum(x * (c * w + (w * (w + 1)) // 2)) AS BIGINT)
                 AS s1
      FROM c),
f AS (SELECT n, sx, 2 * s1 - (n + 1) * sx AS num, n * sx AS den
      FROM g)
SELECT n, sx AS sum_degree,
       CASE WHEN den > 0
            THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
       END AS gini
FROM f
""")
def graph_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    # degree-inequality summary on the HISTOGRAM matrix (rank-block
    # prefix sums, never a node sort); exact BIGINT terms, one double
    # division at emit
    from ..operators.analytics import degree_gini
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"),
                     F.col("b.i").alias("pb")))
    return degree_gini(pairs, "pa", "pb")


def _lsh_precision_sql(num_hashes: int = 8, bands: int = 4,
                       threshold: float = 0.5) -> str:
    """Precision of the banded-LSH candidate generator against the
    TRUE Jaccard-threshold pair set — the cost side of the index
    tuning curve (recall says what the bands keep; precision says how
    much the verifier must re-check). Mirrors catalog_text's
    _lsh_recall_sql with the join direction flipped: FROM candidates,
    LEFT JOIN truth."""
    rows = num_hashes // bands
    p = dd.MINHASH_PRIME
    consts = dd.minhash_constants(num_hashes)
    mh = ", ".join(
        f"list_aggregate(list_transform(hv, v -> ({a} * v + {b}) % {p}),"
        f" 'min') AS mh_{i}"
        for i, (a, b) in enumerate(consts))
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(concat_ws('|', "
        + ", ".join(f"mh_{b * rows + r}" for r in range(rows))
        + ")) AS sig FROM sig"
        for b in range(bands))
    return f"""
WITH {{_JC}},
ne AS (SELECT doc_id, shs AS hv FROM sh WHERE len(shs) > 0),
sig AS (SELECT doc_id, {mh} FROM ne),
bandsrc AS ({band_selects}),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bandsrc a JOIN bandsrc b
           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
exact AS (SELECT id_a, id_b FROM jac WHERE jaccard >= {threshold}),
hit AS (SELECT CASE WHEN e.id_a IS NOT NULL THEN 1 ELSE 0 END AS h
        FROM cand c LEFT JOIN exact e
          ON e.id_a = c.id_a AND e.id_b = c.id_b)
SELECT CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(h) AS BIGINT) AS n_true,
       round(sum(h) / count(*)::DOUBLE, 6) AS precision
FROM hit
"""


@register("dedup_lsh_precision",
          _lsh_precision_sql().replace("{_JC}", _JACCARD_CTES))
def dedup_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    # precision twin of dedup_lsh_recall: RAW banded candidates (the
    # persistable index self-joined on (band, sig)) scored against the
    # exact shingle-Jaccard truth — how much work verification faces
    d = load_table(spark, sf_dir, "documents")
    bt = dd.lsh_band_table(d, num_hashes=8, bands=4, k=5)
    a, b = bt.alias("a"), bt.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.sig") == F.col("b.sig"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("id_a"),
                    F.col("b.doc_id").alias("id_b"))
            .distinct())
    exact = (dd.ngram_jaccard_pairs(d, threshold=0.5, k=5)
             .select("id_a", "id_b").withColumn("h", F.lit(1)))
    hits = F.sum(F.coalesce("h", F.lit(0)))
    return (cand.join(exact, ["id_a", "id_b"], "left")
            .agg(F.count(F.lit(1)).alias("n_candidates"),
                 hits.alias("n_true"),
                 F.round(hits / F.count(F.lit(1)), 6)
                 .alias("precision")))


@register("corpus_quality_by_source", """
WITH w AS (SELECT source, text, _W_ AS ws FROM documents),
f AS (SELECT source,
             len(ws)::BIGINT AS n_words,
             round(len(list_filter(ws, x -> x IN (_ST_)))
                   / len(ws)::DOUBLE, 4) AS stopword_ratio,
             round(len(list_distinct(ws)) / len(ws)::DOUBLE, 4)
                 AS distinct_ratio
      FROM w WHERE len(ws) > 0),
q AS (SELECT source,
             CAST(round(round((least(n_words / 100.0, 1.0)
                               + least(stopword_ratio * 4, 1.0)
                               + distinct_ratio) / 3, 4) * 10000, 0)
                  AS BIGINT) AS qi
      FROM f),
g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(qi) AS BIGINT) AS s,
             CAST(sum(CASE WHEN qi >= 5000 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pass
      FROM q GROUP BY source)
SELECT source, n_docs,
       CAST(floor((2 * (s * 100) + n_docs) / (2 * n_docs)) AS BIGINT)
           / 1e6 AS mean_quality,
       CASE WHEN n_docs > 0
            THEN ((1000000 * n_pass) // n_docs) / 1e6
       END AS pass_share
FROM g ORDER BY source
""".replace("_W_", _WORDS).replace("_ST_", _QSTOPS))
def corpus_quality_by_source(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    # per-source quality rollup: per-doc composite score on the 1e-4
    # grid (the text_quality formula), integer sums, half-away integer
    # mean (6dp), pass rate compared ON THE INTEGER GRID (qi >= 5000 -
    # never a float threshold)
    from ..functions import text as TX
    from ..operators.windows import int_mean_half_away
    d = load_table(spark, sf_dir, "documents")
    nw = F.size(TX.words(F.col("text")))
    qi = (F.round(TX.quality_score("text") * 10000, 0).cast("long"))
    g = (d.filter(nw > 0)
         .select("source", qi.alias("qi"))
         .groupBy("source")
         .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
              F.sum("qi").cast("long").alias("s"),
              F.sum(F.when(F.col("qi") >= 5000, 1).otherwise(0))
              .cast("long").alias("n_pass")))
    mean = int_mean_half_away(F.col("s") * 100, F.col("n_docs")) / 1e6
    pr = F.expr("(1000000 * n_pass) div n_docs") / 1e6
    return (g.select("source", "n_docs", mean.alias("mean_quality"),
                     F.when(F.col("n_docs") > 0, pr).alias("pass_share"))
            .orderBy("source"))


@register("asof_tolerance_last_view", """
WITH tagged AS (
  SELECT user_id, ts AS _ts, 0 AS _tag, event_id, ts,
         NULL::BIGINT AS v_id, NULL::TIMESTAMP AS v_ts
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts AS _ts, 1 AS _tag, NULL, NULL, event_id, ts
  FROM events WHERE event_type = 'view'
),
carried AS (
  SELECT user_id, _tag, event_id, ts, _ts,
         last_value(v_id IGNORE NULLS) OVER w AS view_event_id,
         last_value(v_ts IGNORE NULLS) OVER w AS view_ts,
         last_value(CASE WHEN v_id IS NOT NULL
                         THEN CAST(floor(epoch(_ts)) AS BIGINT) END
                    IGNORE NULLS) OVER w AS _msec
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY _ts, _tag
               ROWS UNBOUNDED PRECEDING)
),
g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN abs(CAST(floor(epoch(_ts)) AS BIGINT) - _msec)
                   <= 1800
              THEN view_event_id END AS view_event_id,
         CASE WHEN abs(CAST(floor(epoch(_ts)) AS BIGINT) - _msec)
                   <= 1800
              THEN view_ts END AS view_ts
  FROM carried WHERE _tag = 0
)
SELECT event_id, user_id, ts, view_event_id, view_ts
FROM g ORDER BY event_id
""")
def asof_tolerance_last_view(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    # tolerance-bounded as-of join (pd.merge_asof's tolerance): each
    # purchase matched to the most recent strictly-earlier view ONLY
    # if within 30 min — the staleness bound is a projection on exact
    # unix seconds after the same union+window carry, zero extra
    # shuffles
    from ..operators.asof import asof_join
    e = load_table(spark, sf_dir, "events")
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    views = (e.filter(F.col("event_type") == "view")
             .select(F.col("event_id").alias("view_event_id"),
                     "user_id", F.col("ts").alias("view_ts")))
    return (asof_join(purchases, views, on=["user_id"],
                      left_ts="ts", right_ts="view_ts",
                      right_payload=["view_event_id", "view_ts"],
                      prefix="", tolerance_seconds=1800)
            .orderBy("event_id"))


@register("events_conversion_lag", """
WITH u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS fv,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
  FROM events GROUP BY user_id
), l AS (
  SELECT CAST(floor(epoch(fp)) - floor(epoch(fv)) AS BIGINT) AS v
  FROM u WHERE fv IS NOT NULL AND fp IS NOT NULL
), c AS (SELECT v, count(*) AS cnt FROM l GROUP BY v),
r AS (SELECT v, sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                               PRECEDING AND CURRENT ROW) AS cum
      FROM c),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_values FROM c)
SELECT n.n_values,
       round(min(CASE WHEN r.cum >= (1 * n.n_values + 1) // 2
                      THEN r.v END) / 1, 2) AS q50,
       round(min(CASE WHEN r.cum >= (9 * n.n_values + 9) // 10
                      THEN r.v END) / 1, 2) AS q90,
       round(min(CASE WHEN r.cum >= (99 * n.n_values + 99) // 100
                      THEN r.v END) / 1, 2) AS q99
FROM r, n GROUP BY n.n_values
""")
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    # funnel latency: exact p50/p90/p99 of (first purchase − first
    # view) in whole seconds per user (negative = bought before ever
    # viewing — kept, the order statistics handle signed values);
    # the distributed prefix-sum quantile kernel at grid=1
    from ..operators.aggregates import exact_quantiles_by_rank
    ev = load_table(spark, sf_dir, "events")
    u = (ev.groupBy("user_id")
         .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts")))
              .alias("fv"),
              F.min(F.when(F.col("event_type") == "purchase",
                           F.col("ts"))).alias("fp")))
    lag = (u.filter(F.col("fv").isNotNull() & F.col("fp").isNotNull())
           .select((F.unix_timestamp("fp") - F.unix_timestamp("fv"))
                   .cast("long").alias("lag_s")))
    return exact_quantiles_by_rank(lag, "lag_s", grid=1)


@register("dedup_impact_by_source", """
WITH RECURSIVE {_JC},
pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.5),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b AS src, id_a AS dst FROM pairs),
walk(doc_id, lbl) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, w.lbl FROM edges e JOIN walk w ON w.doc_id = e.dst
),
cl AS (SELECT doc_id, min(lbl) AS cluster_id FROM walk GROUP BY doc_id),
g AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN cl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_near_dup,
         CAST(sum(CASE WHEN cl.doc_id IS NOT NULL
                       AND cl.doc_id != cl.cluster_id
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
  GROUP BY d.source
)
SELECT source, n_docs, n_near_dup, n_removed,
       CASE WHEN n_docs > 0
            THEN ((1000000 * n_near_dup) // n_docs) / 1e6
       END AS near_dup_share,
       CASE WHEN n_docs > 0
            THEN ((1000000 * n_removed) // n_docs) / 1e6
       END AS removed_share
FROM g ORDER BY source
""".replace("{_JC}", _JACCARD_CTES))
def dedup_impact_by_source(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    # per-source dedup impact under the keep-min-id policy: which
    # feeds are boilerplate-heavy (same CC fixpoint as the global
    # impact report, rolled up by source; quotient-grid shares)
    from ..operators.clustering import cluster_near_dups
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(d, threshold=0.5, k=5)
    cl = cluster_near_dups(pairs)
    j = (d.select("doc_id", "source")
         .join(cl.withColumnRenamed("doc_id", "cdoc"),
               F.col("doc_id") == F.col("cdoc"), "left"))
    g = (j.groupBy("source")
         .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
              F.sum(F.when(F.col("cdoc").isNotNull(), 1).otherwise(0))
              .cast("long").alias("n_near_dup"),
              F.sum(F.when(F.col("cdoc").isNotNull()
                           & (F.col("cdoc") != F.col("cluster_id")),
                           1).otherwise(0))
              .cast("long").alias("n_removed")))
    nd = F.expr("(1000000 * n_near_dup) div n_docs") / 1e6
    rm = F.expr("(1000000 * n_removed) div n_docs") / 1e6
    return (g.select("source", "n_docs", "n_near_dup", "n_removed",
                     F.when(F.col("n_docs") > 0, nd)
                     .alias("near_dup_share"),
                     F.when(F.col("n_docs") > 0, rm)
                     .alias("removed_share"))
            .orderBy("source"))
