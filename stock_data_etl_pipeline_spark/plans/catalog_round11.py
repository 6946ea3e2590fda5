"""Round-11 catalog entries.

Families this module registers:

* volatility-estimator ladder completion — Garman–Klass and
  Yang–Zhang (overnight-jump-aware) range volatility;
* trend/momentum completion — MACD triplet on truncated EWMAs,
  Ultimate Oscillator, Price-Volume Trend;
* corpus statistics — Good–Turing frequency smoothing, tokenizer
  fertility, Kneser–Ney bigram perplexity, RAKE keyword scores;
* embedding-space audits — isotropy (min/max per-dim variance
  ratio), Matryoshka truncation recall, one-bit (sign) quantization
  recall;
* graph fixed-point — HITS hubs/authorities, label-propagation
  communities, Hill power-law tail exponent, 4-truss peel census;
* experiment / privacy / data-quality — sample-ratio-mismatch check,
  t-closeness, QI generalization ladder, referential-integrity orphan
  census, Benford first-digit forensics;
* liquidity/behavior/mix — Calmar ratio, per-session event-type
  entropy by size class, pairwise source vocabulary Jaccard,
  per-source stopword drift.

Every entry follows the exact-integer oracle discipline (COVERAGE.md):
integer-grid summands, single-division emits, shared transcendental
literals, identical association both engines, unrounded raw-double
emits for ratios of exact integers, non-negative-operand integer
quotients only (Spark ``div`` truncates, DuckDB ``//`` floors).

Reference parity: the reference's surface stops at filter/join/
aggregate over ingested series (SURVEY §2); these extend the engine's
quant/curation north star like plans/catalog_quant.py (round 7),
plans/catalog_round8.py (round 8) and plans/catalog_round10.py.

MUST import after the other catalog modules (see plans/__init__) so
the never-checked rotation ranks these behind anything still waiting
for a first driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import indicators as ind
from ..sources.registry import load_table
from .catalog import register
from .catalog_round9 import _OHLC_CENTS_CTE
from .catalog_stock import _BARS_CTE

_D = "CAST({} AS DOUBLE)"

# portable tokenization + stopword list for the round-11 corpus
# oracles: the ONE definition in catalog_text (a second copy here
# would silently desync half the corpus family on a tokenizer change
# — round-11 review finding)
from .catalog_text import _STOPS as _STOPS_R11  # noqa: E402
from .catalog_text import _WORDS as _WORDS_R11  # noqa: E402


# ---------------------------------------------------------------------------
# volatility-estimator ladder completion
# ---------------------------------------------------------------------------

@register("stock_garman_klass", _BARS_CTE + _OHLC_CENTS_CTE + f"""
, pv AS (
  SELECT event_type,
         CAST(round((0.5 * (ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE))
                            * ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE)))
                     - {ind.GK_2LN2M1!r}
                       * (ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE))
                          * ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE))))
                    * {ind.RS_GRID!r}, 0) AS BIGINT) AS t
  FROM cts4 WHERE l > 0 AND h >= l
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_bars,
         CAST(sum(t) AS BIGINT) AS s
  FROM pv GROUP BY event_type
)
SELECT event_type, n_bars,
       CASE WHEN n_bars > 0 AND s >= 0
            THEN round(sqrt(CAST(s AS DOUBLE) / CAST(n_bars AS DOUBLE))
                       / 1e6, 6)
       END AS gk_vol
FROM g ORDER BY event_type
""")
def stock_garman_klass(spark: SparkSession, sf_dir: str) -> DataFrame:
    # minimum-variance zero-drift OHLC estimator: per-bar term on the
    # exact 1e-12 grid with 2ln2−1 as a shared literal, BIGINT sum,
    # Σ ≥ 0 guard both sides (a single bar's term CAN be negative)
    ev = load_table(spark, sf_dir, "events")
    return ind.garman_klass_vol(ind.hourly_bars(ev))


@register("stock_yang_zhang", _BARS_CTE + _OHLC_CENTS_CTE + f"""
, lagd AS (
  SELECT event_type, hr, o, h, l, c,
         lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM cts4 WHERE l > 0 AND h >= l
), d AS (
  SELECT event_type,
         CAST(round(ln(CAST(o AS DOUBLE) / CAST(pc AS DOUBLE))
                    * {ind.YZ_RET_GRID!r}, 0) AS BIGINT) AS qo,
         CAST(round(ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE))
                    * {ind.YZ_RET_GRID!r}, 0) AS BIGINT) AS qc,
         CAST(round((ln(CAST(h AS DOUBLE) / CAST(c AS DOUBLE))
                     * ln(CAST(h AS DOUBLE) / CAST(o AS DOUBLE))
                     + ln(CAST(l AS DOUBLE) / CAST(c AS DOUBLE))
                       * ln(CAST(l AS DOUBLE) / CAST(o AS DOUBLE)))
                    * {ind.RS_GRID!r}, 0) AS BIGINT) AS qrs
  FROM lagd WHERE pc IS NOT NULL AND pc > 0
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qo) AS BIGINT) AS so1,
         CAST(sum(qo * qo) AS BIGINT) AS so2,
         CAST(sum(qc) AS BIGINT) AS sc1,
         CAST(sum(qc * qc) AS BIGINT) AS sc2,
         CAST(sum(qrs) AS BIGINT) AS srs
  FROM d GROUP BY event_type
), t AS (
  SELECT event_type, n,
         (CAST(n AS DOUBLE) * CAST(so2 AS DOUBLE)
          - CAST(so1 AS DOUBLE) * CAST(so1 AS DOUBLE))
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 1e12 AS vo,
         (CAST(n AS DOUBLE) * CAST(sc2 AS DOUBLE)
          - CAST(sc1 AS DOUBLE) * CAST(sc1 AS DOUBLE))
           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) / 1e12 AS vc,
         CAST(srs AS DOUBLE) / CAST(n AS DOUBLE) / {ind.RS_GRID!r} AS vrs,
         0.34 / (1.34 + (CAST(n AS DOUBLE) + 1.0)
                          / (CAST(n AS DOUBLE) - 1.0)) AS k
  FROM g
)
SELECT event_type, n,
       CASE WHEN n > 1
            THEN sqrt(greatest(0.0, vo + k * vc + (1.0 - k) * vrs))
       END AS yz_vol
FROM t ORDER BY event_type
""")
def stock_yang_zhang(spark: SparkSession, sf_dir: str) -> DataFrame:
    # overnight + open-close + Rogers–Satchell blend: exact BIGINT
    # power sums per leg, n²-scaled variance numerators on leaf-cast
    # doubles with identical association (rolling_corr rule),
    # greatest(0, ·) sqrt guard both sides
    ev = load_table(spark, sf_dir, "events")
    return ind.yang_zhang_vol(ind.hourly_bars(ev))


# ---------------------------------------------------------------------------
# trend/momentum completion
# ---------------------------------------------------------------------------

def _ew_sql(i: int, src: str, vin: str, vout: str,
            decay: float, lookback: int) -> str:
    """One banded-EWMA oracle stage with explicit (decay, lookback) —
    the catalog_round8._ewma_stage_sql shape, parametrized so MACD can
    chain fast/slow/signal legs with different decays."""
    return f"""
p{i} AS (SELECT *, (rn - 1) // {lookback} AS band FROM {src}),
c{i} AS (SELECT event_type, hr, rn,
                unnest([(rn - 1) // {lookback},
                        (rn - 1) // {lookback} - 1]) AS probe
         FROM {src}),
e{i} AS (SELECT cur.event_type AS event_type, cur.hr AS hr,
                cur.rn AS rn,
                round(sum(prev.{vin} * pow({decay}, cur.rn - prev.rn))
                      / sum(pow({decay}, cur.rn - prev.rn)), 6) AS {vout}
         FROM c{i} cur JOIN p{i} prev
           ON cur.event_type = prev.event_type
          AND cur.probe = prev.band
          AND prev.rn > cur.rn - {lookback} AND prev.rn <= cur.rn
         GROUP BY cur.event_type, cur.hr, cur.rn)"""


@register("stock_macd", _BARS_CTE + """
, r0 AS (SELECT event_type, hr, close AS v0,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
         FROM bars),"""
          + _ew_sql(0, "r0", "v0", "vf",
                    ind.MACD_FAST_DECAY, ind.MACD_LOOKBACK) + ","
          + _ew_sql(1, "r0", "v0", "vs",
                    ind.MACD_SLOW_DECAY, ind.MACD_LOOKBACK) + """,
m AS (SELECT e0.event_type AS event_type, e0.hr AS hr, e0.rn AS rn,
             e0.vf AS ema_fast, e1.vs AS ema_slow,
             e0.vf - e1.vs AS vm
      FROM e0 JOIN e1 ON e0.event_type = e1.event_type
                     AND e0.hr = e1.hr AND e0.rn = e1.rn),"""
          + _ew_sql(2, "m", "vm", "sig",
                    ind.MACD_SIGNAL_DECAY, ind.MACD_LOOKBACK) + """
SELECT m.event_type AS event_type, m.hr AS hr, m.vm AS macd,
       e2.sig AS signal, m.vm - e2.sig AS histogram
FROM m JOIN e2 ON m.event_type = e2.event_type AND m.hr = e2.hr
ORDER BY m.event_type, m.hr
""")
def stock_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fast−slow truncated-EWMA spread + its own EWMA signal line:
    # three banded rank-join stages (each 6-dp canonical), every emit
    # a 6-dp stage output or an exact difference of two of them
    ev = load_table(spark, sf_dir, "events")
    return ind.macd(ind.hourly_bars(ev))


_UO_P1, _UO_P2, _UO_P3 = ind.UO_PERIODS


@register("stock_ultimate_osc", _BARS_CTE + f"""
, lagd AS (
  SELECT event_type, hr,
         CAST(round(high  * 100, 0) AS BIGINT) AS h,
         CAST(round(low   * 100, 0) AS BIGINT) AS l,
         CAST(round(close * 100, 0) AS BIGINT) AS c,
         lag(CAST(round(close * 100, 0) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM bars
), d AS (
  SELECT event_type, hr,
         CAST(c - least(l, pc) AS BIGINT) AS bp,
         CAST(greatest(h, pc) - least(l, pc) AS BIGINT) AS tr
  FROM lagd WHERE pc IS NOT NULL
), s AS (
  SELECT event_type, hr,
         CAST(sum(bp) OVER w1 AS BIGINT) AS bp1,
         CAST(sum(bp) OVER w2 AS BIGINT) AS bp2,
         CAST(sum(bp) OVER w3 AS BIGINT) AS bp3,
         CAST(sum(tr) OVER w1 AS BIGINT) AS tr1,
         CAST(sum(tr) OVER w2 AS BIGINT) AS tr2,
         CAST(sum(tr) OVER w3 AS BIGINT) AS tr3,
         CAST(count(*) OVER w3 AS BIGINT) AS cnt
  FROM d
  WINDOW w1 AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {_UO_P1 - 1} PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {_UO_P2 - 1} PRECEDING AND CURRENT ROW),
         w3 AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {_UO_P3 - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, hr,
       CASE WHEN tr1 > 0 AND tr2 > 0 AND tr3 > 0 THEN
         100.0 * (4.0 * (CAST(bp1 AS DOUBLE) / CAST(tr1 AS DOUBLE))
                  + 2.0 * (CAST(bp2 AS DOUBLE) / CAST(tr2 AS DOUBLE))
                  + CAST(bp3 AS DOUBLE) / CAST(tr3 AS DOUBLE)) / 7.0
       END AS uo
FROM s WHERE cnt = {_UO_P3}
ORDER BY event_type, hr
""")
def stock_ultimate_osc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multi-horizon buying-pressure blend: integer-cents BP/TR, six
    # exact BIGINT rolling sums over ONE ordering, one IEEE emit of
    # leaf-cast sums guarded on every ΣTR > 0, full-window rows only
    ev = load_table(spark, sf_dir, "events")
    return ind.ultimate_oscillator(ind.hourly_bars(ev))


@register("stock_pvt", _BARS_CTE + f"""
, lagd AS (
  SELECT event_type, hr,
         CAST(round(close * 100, 0) AS BIGINT) AS c,
         CAST(volume AS BIGINT) AS vol,
         lag(CAST(round(close * 100, 0) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM bars
), t AS (
  SELECT event_type, hr,
         CASE WHEN pc IS NOT NULL AND pc > 0 THEN
           CAST(CASE WHEN c > pc THEN 1 WHEN c < pc THEN -1
                     ELSE 0 END AS BIGINT)
           * CAST((2 * {int(ind.PVT_GRID)} * abs(c - pc) * vol + pc)
                  // (2 * pc) AS BIGINT)
         ELSE 0 END AS t
  FROM lagd
)
SELECT event_type, hr,
       CAST(sum(t) OVER (PARTITION BY event_type ORDER BY hr
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS DOUBLE)
         / {ind.PVT_GRID!r} AS pvt
FROM t ORDER BY event_type, hr
""")
def stock_pvt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # volume-weighted cumulative return proxy: per-term half-away
    # integer quotient with non-negative div operands (sign re-applied
    # after — Spark div truncates, DuckDB // floors), exact BIGINT
    # running total, one grid division at emit
    ev = load_table(spark, sf_dir, "events")
    return ind.pvt(ind.hourly_bars(ev))


# ---------------------------------------------------------------------------
# corpus statistics
# ---------------------------------------------------------------------------

from ..operators import corpus as CP  # noqa: E402
from .catalog_text import _STOPS, _WORDS  # noqa: E402


@register("corpus_good_turing", f"""
WITH w AS (SELECT {_WORDS} AS ws FROM documents),
tok AS (SELECT unnest(ws) AS w FROM w),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY w),
coc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM uni GROUP BY r),
tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens FROM coc),
j AS (SELECT a.r AS r, a.n_r AS n_r,
             CAST(coalesce(b.n_r, 0) AS BIGINT) AS n_next, t.n_tokens
      FROM coc a LEFT JOIN coc b ON b.r = a.r + 1 CROSS JOIN tot t)
SELECT r, n_r, n_next,
       CAST((r + 1) * n_next AS DOUBLE) / CAST(n_r AS DOUBLE) AS r_star,
       CAST((r + 1) * n_next AS DOUBLE) / CAST(n_r AS DOUBLE)
         / CAST(n_tokens AS DOUBLE) AS p_gt
FROM j ORDER BY r
""")
def corpus_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # count-of-counts smoothing table: exact integer histogram +
    # left self-join on r+1, UNROUNDED raw-double ratio emits
    d = load_table(spark, sf_dir, "documents")
    return CP.good_turing_counts(d)


@register("corpus_tokenizer_fertility", f"""
WITH d AS (
  SELECT source,
         CAST(len({_WORDS}) AS BIGINT) AS nw,
         CAST(ceil(length(text) / 4.0) AS BIGINT) AS ns,
         CAST(length(text) AS BIGINT) AS nc
  FROM documents
), g AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nw) AS BIGINT) AS n_words,
         CAST(sum(ns) AS BIGINT) AS n_subwords,
         CAST(sum(nc) AS BIGINT) AS n_chars
  FROM d GROUP BY source
)
SELECT source, n_docs, n_words, n_subwords,
       CASE WHEN n_words > 0
            THEN CAST(n_subwords AS DOUBLE) / CAST(n_words AS DOUBLE)
       END AS fertility,
       CASE WHEN n_words > 0
            THEN CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
       END AS chars_per_word
FROM g ORDER BY source
""")
def corpus_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    # whitespace-vs-BPE-estimate inflation profile per source: integer
    # sums, UNROUNDED ratio emits guarded per denominator
    d = load_table(spark, sf_dir, "documents")
    return CP.tokenizer_fertility(d)


@register("corpus_kn_perplexity", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
occ AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                       i -> {{'w1': ws[i], 'w2': ws[i+1]}})) AS p
        FROM w),
o2 AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM occ),
bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
       FROM o2 GROUP BY w1, w2),
ctx AS (SELECT w1, CAST(count(*) AS BIGINT) AS ctx1 FROM o2 GROUP BY w1),
t1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS t1 FROM bi GROUP BY w1),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont2
         FROM bi GROUP BY w2),
btot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bi),
j AS (SELECT o2.doc_id,
             CAST(CAST(greatest(4 * bi.c12 - 3, 0) AS BIGINT) * bt.b
                  + 3 * t1.t1 * cont.cont2 AS BIGINT) AS num,
             CAST(4 * ctx.ctx1 * bt.b AS BIGINT) AS den
      FROM o2 JOIN bi ON o2.w1 = bi.w1 AND o2.w2 = bi.w2
              JOIN ctx ON o2.w1 = ctx.w1
              JOIN t1 ON o2.w1 = t1.w1
              JOIN cont ON o2.w2 = cont.w2
              CROSS JOIN btot bt),
q AS (SELECT doc_id,
             CAST(round(-log2(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                        * {CP.KN_NLL_GRID!r}, 0) AS BIGINT) AS q
      FROM j),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(q) AS BIGINT) AS s
        FROM q GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(per.s AS DOUBLE) / CAST(per.n_bigrams AS DOUBLE)
         / {CP.KN_NLL_GRID!r} AS kn_score
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
""")
def corpus_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # interpolated Kneser-Ney with D = 3/4: the probability is the
    # exact integer rational (max(4c12-3,0)*B + 3*T1*cont2)/(4*ctx1*B),
    # one -log2 per position on the 1e-6 grid, UNROUNDED s/n/grid emit
    d = load_table(spark, sf_dir, "documents")
    return CP.kn_bigram_perplexity(d)


@register("corpus_rake_keywords", f"""
WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
tk AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, ws FROM w),
tok AS (SELECT doc_id, pos, ws[pos] AS w FROM tk
        WHERE ws[pos] NOT IN ({_STOPS})),
g0 AS (SELECT doc_id, pos, w,
              pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                AS grp
       FROM tok),
ph AS (SELECT doc_id, w,
              CAST(count(*) OVER (PARTITION BY doc_id, grp) AS BIGINT)
                AS plen
       FROM g0),
g AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS degree
      FROM ph GROUP BY w)
SELECT word, freq, degree,
       CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE) AS rake_score
FROM g ORDER BY degree DESC, word LIMIT 100
""")
def corpus_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    # stopword-boundary phrase segmentation via gaps-and-islands on the
    # non-stopword token stream; integer freq/degree, integer-keyed
    # top-N, UNROUNDED degree/freq emit
    d = load_table(spark, sf_dir, "documents")
    return CP.rake_word_scores(d, top_n=100)


# ---------------------------------------------------------------------------
# data-quality / experiment / privacy
# ---------------------------------------------------------------------------

@register("dq_referential_orphans", """
WITH rel AS (
  SELECT 'customer.nation' AS relationship,
         (SELECT count(*) FROM customer) AS n_child_rows,
         (SELECT count(*) FROM customer WHERE c_nationkey IS NULL)
           AS n_null_keys,
         (SELECT count(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = c.c_nationkey))
           AS n_orphans
  UNION ALL
  SELECT 'lineitem.orders',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL),
         (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem.part',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
         (SELECT count(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'lineitem.supplier',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL),
         (SELECT count(*) FROM lineitem l WHERE l.l_suppkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM supplier s
                            WHERE s.s_suppkey = l.l_suppkey))
  UNION ALL
  SELECT 'orders.customer',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders WHERE o_custkey IS NULL),
         (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'supplier.nation',
         (SELECT count(*) FROM supplier),
         (SELECT count(*) FROM supplier WHERE s_nationkey IS NULL),
         (SELECT count(*) FROM supplier s WHERE s.s_nationkey IS NOT NULL
            AND NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = s.s_nationkey))
)
SELECT relationship, CAST(n_child_rows AS BIGINT) AS n_child_rows,
       CAST(n_null_keys AS BIGINT) AS n_null_keys,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       CASE WHEN n_child_rows > n_null_keys
            THEN round(100.0 * n_orphans / (n_child_rows - n_null_keys), 6)
       END AS orphan_pct
FROM rel ORDER BY relationship
""")
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # whole-schema FK orphan census: one broadcast anti-join per
    # relationship, NULL FKs counted separately (SET_NULL parity with
    # the reference's Postgres FKs, models.py:144-160)
    from ..operators.quality import referential_orphan_census
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return referential_orphan_census([
        ("customer.nation", c, "c_nationkey", n, "n_nationkey"),
        ("lineitem.orders", li, "l_orderkey", o, "o_orderkey"),
        ("lineitem.part", li, "l_partkey", p, "p_partkey"),
        ("lineitem.supplier", li, "l_suppkey", s, "s_suppkey"),
        ("orders.customer", o, "o_custkey", c, "c_custkey"),
        ("supplier.nation", s, "s_nationkey", n, "n_nationkey"),
    ])


@register("events_srm", """
WITH ua AS (
  SELECT DISTINCT event_type AS unit, user_id,
         (('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 100) % 2
           AS arm
  FROM events WHERE user_id IS NOT NULL
), g AS (
  SELECT unit,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_arm0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_arm1
  FROM ua GROUP BY unit
)
SELECT unit, n_arm0, n_arm1,
       CASE WHEN n_arm0 + n_arm1 > 0
            THEN CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1) AS DOUBLE)
                 / CAST(n_arm0 + n_arm1 AS DOUBLE)
       END AS chi2,
       1000 * (n_arm0 - n_arm1) * (n_arm0 - n_arm1)
         > 3841 * (n_arm0 + n_arm1) AS srm_flag
FROM g ORDER BY unit
""")
def events_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sample-ratio-mismatch pre-gate per experiment unit: md5-parity
    # arms, chi-square vs 50/50, pure-integer flag at the 95% critical
    # value (the CUPED query's mandatory precondition)
    from ..operators.quality import srm_check
    ev = load_table(spark, sf_dir, "events")
    return srm_check(ev)


@register("customer_t_closeness", """
WITH base AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS b
  FROM customer WHERE c_acctbal IS NOT NULL
), cb AS (
  SELECT c_nationkey, c_mktsegment, b, CAST(count(*) AS BIGINT) AS cp
  FROM base GROUP BY 1, 2, 3
), classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(sum(cp) AS BIGINT) AS m
  FROM cb GROUP BY 1, 2
), gb AS (
  SELECT b, CAST(sum(cp) AS BIGINT) AS cq FROM cb GROUP BY b
), tot AS (
  SELECT CAST(sum(cq) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS nb
  FROM gb
), grid AS (
  SELECT c.c_nationkey, c.c_mktsegment, c.m, g.b,
         coalesce(cb.cp, 0) AS cp, g.cq
  FROM classes c CROSS JOIN gb g
  LEFT JOIN cb ON cb.c_nationkey = c.c_nationkey
              AND cb.c_mktsegment = c.c_mktsegment AND cb.b = g.b
), cum AS (
  SELECT c_nationkey, c_mktsegment, m, b,
         CAST(sum(cp) OVER (PARTITION BY c_nationkey, c_mktsegment
                            ORDER BY b) AS BIGINT) AS cpc,
         CAST(sum(cq) OVER (PARTITION BY c_nationkey, c_mktsegment
                            ORDER BY b) AS BIGINT) AS cqc
  FROM grid
), interior AS (
  SELECT * FROM cum WHERE b < (SELECT max(b) FROM gb)
), agg AS (
  SELECT c_nationkey, c_mktsegment, m,
         CAST(sum(abs(cpc * (SELECT n FROM tot)
                      - cqc * m)) AS BIGINT) AS s
  FROM interior GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment, m AS class_rows,
       CASE WHEN (SELECT nb FROM tot) > 1
            THEN CAST(s AS DOUBLE)
                 / CAST(m * (SELECT n FROM tot)
                        * ((SELECT nb FROM tot) - 1) AS DOUBLE)
       END AS t_emd
FROM agg ORDER BY c_nationkey, c_mktsegment
""")
def customer_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ordered-EMD t-closeness per (nation, segment) QI class over the
    # acctbal thousand-bucket — the similarity-attack audit that
    # completes the k-anonymity / l-diversity ladder; exact-integer
    # prefix-difference numerators, one double division at emit
    from ..operators.analytics import t_closeness_profile
    c = load_table(spark, sf_dir, "customer")
    return t_closeness_profile(
        c, ["c_nationkey", "c_mktsegment"],
        F.floor(F.col("c_acctbal") / 1000.0))


# ---------------------------------------------------------------------------
# graph fixed-point: HITS, label propagation
# ---------------------------------------------------------------------------

@register("graph_hits", """
WITH e AS (SELECT DISTINCT o.o_custkey AS s, l.l_partkey AS d
           FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
nh AS (SELECT count(DISTINCT s) AS n FROM e),
h0 AS (SELECT s AS node, 1000000000000 // n AS r FROM (SELECT DISTINCT s FROM e), nh),
a1r AS (SELECT e.d AS node, CAST(sum(h.r) AS BIGINT) AS r
        FROM e JOIN h0 h ON e.s = h.node GROUP BY e.d),
a1 AS (SELECT node, r // greatest(CAST((SELECT sum(r) FROM a1r) AS BIGINT)
                                  // 1000000000000, 1) AS r
       FROM a1r),
h1r AS (SELECT e.s AS node, CAST(sum(a.r) AS BIGINT) AS r
        FROM e JOIN a1 a ON e.d = a.node GROUP BY e.s),
h1 AS (SELECT node, r // greatest(CAST((SELECT sum(r) FROM h1r) AS BIGINT)
                                  // 1000000000000, 1) AS r
       FROM h1r),
a2r AS (SELECT e.d AS node, CAST(sum(h.r) AS BIGINT) AS r
        FROM e JOIN h1 h ON e.s = h.node GROUP BY e.d),
a2 AS (SELECT node, r // greatest(CAST((SELECT sum(r) FROM a2r) AS BIGINT)
                                  // 1000000000000, 1) AS r
       FROM a2r),
h2r AS (SELECT e.s AS node, CAST(sum(a.r) AS BIGINT) AS r
        FROM e JOIN a2 a ON e.d = a.node GROUP BY e.s),
h2 AS (SELECT node, r // greatest(CAST((SELECT sum(r) FROM h2r) AS BIGINT)
                                  // 1000000000000, 1) AS r
       FROM h2r),
ta AS (SELECT 'authority' AS kind, node, r AS score_e12 FROM a2
       ORDER BY r DESC, node LIMIT 20),
th AS (SELECT 'hub' AS kind, node, r AS score_e12 FROM h2
       ORDER BY r DESC, node LIMIT 20)
SELECT kind, node, CAST(score_e12 AS BIGINT) AS score_e12 FROM (
  SELECT * FROM ta UNION ALL SELECT * FROM th)
ORDER BY kind, score_e12 DESC, node
""")
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HITS over the directed customer -> purchased-part bipartite
    # graph: 2 power iterations in exact fixed-point integers with
    # two-stage L1 renormalization (hub = broad buyer, authority =
    # widely-bought part); top-20 per kind
    from ..operators.analytics import hits_bipartite
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
             .select(F.col("o_custkey").alias("cust"),
                     F.col("l_partkey").alias("part")))
    return hits_bipartite(edges, "cust", "part", iters=2, top=20)


# shared 3-round deterministic LPA over the co-purchase part graph —
# the ONE definition used by graph_label_prop here and
# graph_modularity (catalog_round12): a second copy would silently
# desync the two on any tie-break change
_LPA_CTE = """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
und AS (SELECT DISTINCT a.i AS x, b.i AS y
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
e AS (SELECT x AS src, y AS dst FROM und
      UNION ALL SELECT y, x FROM und),
l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),
n1 AS (SELECT e.src AS node, l.lab, count(*) AS cnt
       FROM e JOIN l0 l ON e.dst = l.node GROUP BY 1, 2),
l1 AS (SELECT node, lab FROM (
         SELECT node, lab,
                row_number() OVER (PARTITION BY node
                                   ORDER BY cnt DESC, lab) AS rn
         FROM n1) WHERE rn = 1),
n2 AS (SELECT e.src AS node, l.lab, count(*) AS cnt
       FROM e JOIN l1 l ON e.dst = l.node GROUP BY 1, 2),
l2 AS (SELECT node, lab FROM (
         SELECT node, lab,
                row_number() OVER (PARTITION BY node
                                   ORDER BY cnt DESC, lab) AS rn
         FROM n2) WHERE rn = 1),
n3 AS (SELECT e.src AS node, l.lab, count(*) AS cnt
       FROM e JOIN l2 l ON e.dst = l.node GROUP BY 1, 2),
l3 AS (SELECT node, lab FROM (
         SELECT node, lab,
                row_number() OVER (PARTITION BY node
                                   ORDER BY cnt DESC, lab) AS rn
         FROM n3) WHERE rn = 1)"""


@register("graph_label_prop", _LPA_CTE + """
SELECT lab AS label, CAST(count(*) AS BIGINT) AS n_members
FROM l3 GROUP BY lab
ORDER BY n_members DESC, label LIMIT 20
""")
def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic synchronous LPA (modal neighbor label, ties to the
    # smallest) over the co-purchase part graph, 3 fixed rounds;
    # top-20 communities by size
    from ..operators.analytics import label_propagation
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return label_propagation(pairs, "pa", "pb", iters=3, top=20)


# ---------------------------------------------------------------------------
# embedding-space audits: isotropy, Matryoshka truncation, sign bits
# ---------------------------------------------------------------------------

@register("embedding_isotropy", """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
q AS (SELECT t.i - 1 AS dim,
             CAST(round(x[t.i] * 10000, 0) AS BIGINT) AS q
      FROM v, (SELECT unnest(generate_series(1, 64)) AS i) t),
g AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(q) AS BIGINT) AS s,
             CAST(sum(q * q) AS BIGINT) AS ss
      FROM q GROUP BY dim),
d AS (SELECT dim, n, CAST(n * ss - s * s AS BIGINT) AS vn FROM g),
mn AS (SELECT vn, dim FROM d ORDER BY vn, dim LIMIT 1),
mx AS (SELECT max(vn) AS v FROM d),
mxd AS (SELECT CAST(min(dim) AS BIGINT) AS max_var_dim,
               CAST(max(vn) AS BIGINT) AS maxvn
        FROM d JOIN mx ON d.vn = mx.v)
SELECT (SELECT CAST(max(n) AS BIGINT) FROM d) AS n_vectors,
       (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_dims,
       (SELECT CAST(sum(CASE WHEN vn = 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM d) AS dead_dims,
       (SELECT CAST(dim AS BIGINT) FROM mn) AS min_var_dim,
       max_var_dim,
       CASE WHEN maxvn > 0
            THEN CAST((SELECT vn FROM mn) AS DOUBLE)
                 / CAST(maxvn AS DOUBLE)
       END AS var_ratio
FROM mxd
""")
def embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # whole-space anisotropy audit: min/max per-dimension variance
    # ratio on exact integer numerators (denominators cancel), dead
    # dims counted, ties to the smaller dim on both ends
    from ..operators.similarity import isotropy_profile
    emb = load_table(spark, sf_dir, "embeddings")
    return isotropy_profile(emb)


def _matryoshka_sql(k: int = 10, dims: int = 64,
                    prefixes: tuple = (4, 8, 16)) -> str:
    def cos(m: int, xa: str, xb: str) -> str:
        return (f"round(list_reduce(list_transform(generate_series(1, "
                f"{m}), i -> {xa}[i] * {xb}[i]), (a, b) -> a + b) / "
                f"(sqrt(list_reduce(list_transform({xa}[1:{m}], "
                f"e -> e * e), (a, b) -> a + b)) * "
                f"sqrt(list_reduce(list_transform({xb}[1:{m}], "
                f"e -> e * e), (a, b) -> a + b))), 6)")

    blocks = []
    for m in prefixes:
        blocks.append(f"""
SELECT CAST({m} AS BIGINT) AS prefix_dims,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(h) AS BIGINT) AS n_hits,
       round(sum(h) / count(*)::DOUBLE, 6) AS recall
FROM (
  SELECT CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END AS h
  FROM te LEFT JOIN (
    SELECT vec_id FROM (
      SELECT v.vec_id, {cos(m, 'v.x', 'qe.qv')} AS s FROM v, qe)
    ORDER BY s DESC, vec_id LIMIT {k}) t USING (vec_id))""")
    body = "\nUNION ALL\n".join(blocks)
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
qe AS (SELECT x AS qv FROM v WHERE vec_id = 0),
te AS (SELECT vec_id FROM (
         SELECT v.vec_id, {cos(dims, 'v.x', 'qe.qv')} AS s FROM v, qe)
       ORDER BY s DESC, vec_id LIMIT {k})
SELECT * FROM ({body}) ORDER BY prefix_dims
"""


@register("embedding_matryoshka_recall", _matryoshka_sql())
def embedding_matryoshka_recall(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    # truncation retrieval curve: recall@10 of the first-4/8/16-dim
    # cosine rankings against the full 64-dim exact ranking
    from ..operators.similarity import matryoshka_recall_at_k
    emb = load_table(spark, sf_dir, "embeddings")
    return matryoshka_recall_at_k(emb, "embedding", "vec_id", k=10,
                                  query_id=0, prefixes=(4, 8, 16))


@register("embedding_sign_recall", """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
qe AS (SELECT x AS qv FROM v WHERE vec_id = 0),
te AS (SELECT vec_id FROM (
         SELECT v.vec_id,
                round(list_reduce(list_transform(generate_series(1, 64),
                        i -> v.x[i] * qe.qv[i]), (a, b) -> a + b) /
                      (sqrt(list_reduce(list_transform(v.x, e -> e * e),
                                        (a, b) -> a + b)) *
                       sqrt(list_reduce(list_transform(qe.qv, e -> e * e),
                                        (a, b) -> a + b))), 6) AS s
         FROM v, qe)
       ORDER BY s DESC, vec_id LIMIT 10),
ts AS (SELECT vec_id FROM (
         SELECT v.vec_id,
                CAST(list_reduce(list_transform(generate_series(1, 64),
                       i -> CASE WHEN (v.x[i] >= 0) = (qe.qv[i] >= 0)
                                 THEN 1 ELSE 0 END),
                     (a, b) -> a + b) AS BIGINT) AS a
         FROM v, qe)
       ORDER BY a DESC, vec_id LIMIT 10)
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       CAST(sum(CASE WHEN ts.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sign_hits,
       round(sum(CASE WHEN ts.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             / count(*)::DOUBLE, 6) AS recall
FROM te LEFT JOIN ts USING (vec_id)
""")
def embedding_sign_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-bit quantization floor: recall@10 of the sign-agreement
    # (Hamming) ranking against the exact cosine ranking
    from ..operators.similarity import sign_recall_at_k
    emb = load_table(spark, sf_dir, "embeddings")
    return sign_recall_at_k(emb, "embedding", "vec_id", k=10, query_id=0)


# ---------------------------------------------------------------------------
# heavy-tail / liquidity / behavioral / corpus-mix diagnostics
# ---------------------------------------------------------------------------

@register("graph_powerlaw_alpha", """
WITH oi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
und AS (SELECT DISTINCT a.i AS x, b.i AS y
        FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
          SELECT x AS v FROM und UNION ALL SELECT y FROM und)
        GROUP BY v),
hist AS (SELECT d, CAST(count(*) AS BIGINT) AS cnt FROM deg GROUP BY d),
g AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_nodes,
             CAST(sum(CASE WHEN d >= 2 THEN cnt ELSE 0 END) AS BIGINT)
               AS n_tail,
             CAST(sum(CASE WHEN d >= 2 THEN cnt *
                    CAST(round(ln(CAST(d AS DOUBLE) / 2.0)
                               * 1000000000, 0) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS s
      FROM hist)
SELECT CAST(2 AS BIGINT) AS d_min, n_nodes, n_tail,
       CASE WHEN s > 0
            THEN 1.0 + CAST(n_tail AS DOUBLE) * 1000000000
                 / CAST(s AS DOUBLE)
       END AS alpha
FROM g
""")
def graph_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hill MLE of the co-purchase degree tail exponent on the degree
    # HISTOGRAM (exact 1e-9 ln grid, one division at emit)
    from ..operators.analytics import powerlaw_alpha
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return powerlaw_alpha(pairs, "pa", "pb", d_min=2)


@register("stock_calmar", _BARS_CTE + """
, cts AS (
  SELECT event_type, hr,
         CAST(round(close * 100, 0) AS BIGINT) AS c
  FROM bars
), rcal AS (
  SELECT event_type, hr, c,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn_a,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY hr DESC) AS rn_d,
         max(c) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS UNBOUNDED PRECEDING) AS peak
  FROM cts
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_bars,
         max(CASE WHEN rn_a = 1 THEN c END) AS c0,
         max(CASE WHEN rn_d = 1 THEN c END) AS c1,
         round(min((c - peak) / peak), 6) AS max_drawdown
  FROM rcal GROUP BY event_type
)
SELECT event_type, n_bars,
       round(ln(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)), 6) AS total_ret,
       max_drawdown,
       CASE WHEN max_drawdown < 0
            THEN round(round(ln(CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)), 6)
                       / -max_drawdown, 6)
       END AS calmar
FROM g ORDER BY event_type
""")
def stock_calmar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # total log return / |max drawdown| per symbol, both legs rounded
    # before the final division (pure function of emitted values)
    ev = load_table(spark, sf_dir, "events")
    return ind.calmar_ratio(ind.hourly_bars(ev))


@register("corpus_vocab_overlap", f"""
WITH sv AS (SELECT DISTINCT source AS src, unnest({_WORDS_R11}) AS w
            FROM documents),
sizes AS (SELECT src, CAST(count(*) AS BIGINT) AS vsz
          FROM sv GROUP BY src),
c AS (SELECT a.src AS source_a, b.src AS source_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM sv a JOIN sv b ON a.w = b.w AND a.src < b.src
      GROUP BY 1, 2)
SELECT c.source_a, c.source_b,
       za.vsz AS vocab_a, zb.vsz AS vocab_b, c.n_common,
       CAST(c.n_common AS DOUBLE)
         / CAST(za.vsz + zb.vsz - c.n_common AS DOUBLE) AS jaccard
FROM c JOIN sizes za ON za.src = c.source_a
       JOIN sizes zb ON zb.src = c.source_b
ORDER BY c.source_a, c.source_b
""")
def corpus_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pairwise source vocabulary Jaccard (mixture-design diagnostic):
    # inverted-index self-join on the word, integer counts, one
    # division at emit
    from ..operators.corpus import vocab_overlap
    d = load_table(spark, sf_dir, "documents")
    return vocab_overlap(d)


@register("events_session_entropy", """
WITH o AS (SELECT user_id, ts, event_id, event_type,
                  lag(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev
           FROM events),
m AS (SELECT user_id, ts, event_id, event_type,
             CASE WHEN prev IS NULL
                       OR date_diff('second', prev, ts) > 1800 THEN 1
                  ELSE 0 END AS is_new
      FROM o),
s AS (SELECT user_id, event_type,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS sid
      FROM m),
cnt AS (SELECT user_id, sid, event_type,
               CAST(count(*) AS BIGINT) AS c
        FROM s GROUP BY 1, 2, 3),
per AS (SELECT user_id, sid, CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CAST(round(c * ln(c) * 1000000.0, 0) AS BIGINT))
                    AS BIGINT) AS t
        FROM cnt GROUP BY 1, 2),
hq AS (SELECT CASE WHEN n = 1 THEN '1' WHEN n = 2 THEN '2'
                   WHEN n <= 5 THEN '3-5' WHEN n <= 10 THEN '6-10'
                   ELSE '11+' END AS size_class,
              CAST(round((ln(CAST(n AS DOUBLE))
                          - (t / 1000000.0) / n) * 1000000.0, 0)
                   AS BIGINT) AS h
       FROM per),
g AS (SELECT size_class, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(h) AS BIGINT) AS sh
      FROM hq GROUP BY size_class)
SELECT size_class, n_sessions,
       round(CAST(sh AS DOUBLE) / CAST(n_sessions AS DOUBLE)
             / 1000000.0, 6) AS mean_entropy
FROM g ORDER BY CASE size_class WHEN '1' THEN 1 WHEN '2' THEN 2
                WHEN '3-5' THEN 3 WHEN '6-10' THEN 4 ELSE 5 END
""")
def events_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-session event-type Shannon entropy (exact c·ln c grid,
    # session H re-quantized to 1e-6 BIGINT) rolled up by session size
    # class — the bot/loop behavioral profile
    from ..operators.analytics import session_entropy_profile
    ev = load_table(spark, sf_dir, "events")
    return session_entropy_profile(ev)


@register("corpus_stopword_drift", f"""
WITH pd AS (SELECT source AS src,
                   CAST(len({_WORDS_R11}) AS BIGINT) AS nt,
                   CAST(len(list_filter({_WORDS_R11},
                                        x -> x IN ({_STOPS_R11})))
                        AS BIGINT) AS nsw
            FROM documents),
g AS (SELECT src, CAST(sum(nt) AS BIGINT) AS n_tokens,
             CAST(sum(nsw) AS BIGINT) AS n_stopwords
      FROM pd GROUP BY src),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS ct,
               CAST(sum(n_stopwords) AS BIGINT) AS cs
        FROM g)
SELECT src AS source, n_tokens, n_stopwords,
       CASE WHEN n_tokens > 0
            THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       END AS stopword_ratio,
       CASE WHEN ct > 0
            THEN CAST(cs AS DOUBLE) / CAST(ct AS DOUBLE)
       END AS corpus_ratio,
       CASE WHEN n_tokens > 0 AND ct > 0
            THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                 - CAST(cs AS DOUBLE) / CAST(ct AS DOUBLE)
       END AS drift
FROM g, tot ORDER BY source
""")
def corpus_stopword_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-source stopword-share drift vs the corpus baseline — the
    # cheapest register/quality drift monitor; exact integer counts,
    # ratios as single divisions
    from ..operators.corpus import stopword_drift
    d = load_table(spark, sf_dir, "documents")
    return stopword_drift(d)


# ---------------------------------------------------------------------------
# privacy generalization ladder, k-truss cohesion, Benford forensics
# ---------------------------------------------------------------------------

@register("customer_generalization_ladder", """
WITH cj AS (SELECT c.*, n.n_regionkey FROM customer c
            JOIN nation n ON n.n_nationkey = c.c_nationkey),
l1 AS (SELECT CAST(count(*) AS BIGINT) AS k
       FROM cj GROUP BY c_nationkey, c_mktsegment),
l2 AS (SELECT CAST(count(*) AS BIGINT) AS k
       FROM cj GROUP BY n_regionkey, c_mktsegment),
l3 AS (SELECT CAST(count(*) AS BIGINT) AS k
       FROM cj GROUP BY c_mktsegment),
l4 AS (SELECT CAST(count(*) AS BIGINT) AS k
       FROM cj GROUP BY n_regionkey),
u AS (
  SELECT '1_nation_segment' AS level, CAST(count(*) AS BIGINT) AS n_classes,
         CAST(min(k) AS BIGINT) AS min_k,
         CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
           AS rows_at_risk,
         CAST(sum(k) AS BIGINT) AS n_rows
  FROM l1
  UNION ALL
  SELECT '2_region_segment', CAST(count(*) AS BIGINT), CAST(min(k) AS BIGINT),
         CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT),
         CAST(sum(k) AS BIGINT) FROM l2
  UNION ALL
  SELECT '3_segment', CAST(count(*) AS BIGINT), CAST(min(k) AS BIGINT),
         CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT),
         CAST(sum(k) AS BIGINT) FROM l3
  UNION ALL
  SELECT '4_region', CAST(count(*) AS BIGINT), CAST(min(k) AS BIGINT),
         CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT),
         CAST(sum(k) AS BIGINT) FROM l4
)
SELECT level, n_classes, min_k, rows_at_risk,
       CASE WHEN n_rows > 0
            THEN round(100.0 * rows_at_risk / n_rows, 6)
       END AS at_risk_pct
FROM u ORDER BY level
""")
def customer_generalization_ladder(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    # k-anonymity across four QI generalization rungs (nation+segment
    # -> region+segment -> segment -> region): the utility-vs-privacy
    # table behind choosing the coarsest level that clears k >= 5
    from ..operators.analytics import generalization_ladder
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cj = c.join(F.broadcast(n),
                c["c_nationkey"] == n["n_nationkey"])
    return generalization_ladder(cj, [
        ("1_nation_segment", ["c_nationkey", "c_mktsegment"]),
        ("2_region_segment", ["n_regionkey", "c_mktsegment"]),
        ("3_segment", ["c_mktsegment"]),
        ("4_region", ["n_regionkey"]),
    ])


@register("graph_ktruss", """
WITH oi AS MATERIALIZED (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
u0 AS MATERIALIZED (SELECT DISTINCT a.i AS x, b.i AS y
       FROM oi a JOIN oi b ON a.bk = b.bk AND a.i < b.i),
d0 AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
         SELECT x AS v FROM u0 UNION ALL SELECT y FROM u0) GROUP BY v),
o0 AS MATERIALIZED (SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
                   THEN u.x ELSE u.y END AS a,
              CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
                   THEN u.y ELSE u.x END AS b
       FROM u0 u JOIN d0 dx ON dx.v = u.x JOIN d0 dy ON dy.v = u.y),
t0 AS MATERIALIZED (SELECT e1.a, e1.b, e2.b AS c
       FROM o0 e1 JOIN o0 e2 ON e2.a = e1.b
       WHERE EXISTS (SELECT 1 FROM o0 e3
                     WHERE e3.a = e1.a AND e3.b = e2.b)),
s0 AS MATERIALIZED (SELECT x, y, CAST(count(*) AS BIGINT) AS sup FROM (
         SELECT least(a, b) AS x, greatest(a, b) AS y FROM t0
         UNION ALL SELECT least(a, c), greatest(a, c) FROM t0
         UNION ALL SELECT least(b, c), greatest(b, c) FROM t0)
       GROUP BY x, y),
u1 AS MATERIALIZED (SELECT u0.x, u0.y FROM u0 LEFT JOIN s0
         ON s0.x = u0.x AND s0.y = u0.y
       WHERE coalesce(s0.sup, 0) >= 2),
d1 AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
         SELECT x AS v FROM u1 UNION ALL SELECT y FROM u1) GROUP BY v),
o1 AS MATERIALIZED (SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
                   THEN u.x ELSE u.y END AS a,
              CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
                   THEN u.y ELSE u.x END AS b
       FROM u1 u JOIN d1 dx ON dx.v = u.x JOIN d1 dy ON dy.v = u.y),
t1 AS MATERIALIZED (SELECT e1.a, e1.b, e2.b AS c
       FROM o1 e1 JOIN o1 e2 ON e2.a = e1.b
       WHERE EXISTS (SELECT 1 FROM o1 e3
                     WHERE e3.a = e1.a AND e3.b = e2.b)),
s1 AS MATERIALIZED (SELECT x, y, CAST(count(*) AS BIGINT) AS sup FROM (
         SELECT least(a, b) AS x, greatest(a, b) AS y FROM t1
         UNION ALL SELECT least(a, c), greatest(a, c) FROM t1
         UNION ALL SELECT least(b, c), greatest(b, c) FROM t1)
       GROUP BY x, y),
u2 AS MATERIALIZED (SELECT u1.x, u1.y FROM u1 LEFT JOIN s1
         ON s1.x = u1.x AND s1.y = u1.y
       WHERE coalesce(s1.sup, 0) >= 2),
d2 AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
         SELECT x AS v FROM u2 UNION ALL SELECT y FROM u2) GROUP BY v),
o2 AS MATERIALIZED (SELECT CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
                   THEN u.x ELSE u.y END AS a,
              CASE WHEN dx.d < dy.d OR (dx.d = dy.d AND u.x < u.y)
                   THEN u.y ELSE u.x END AS b
       FROM u2 u JOIN d2 dx ON dx.v = u.x JOIN d2 dy ON dy.v = u.y),
t2 AS MATERIALIZED (SELECT e1.a, e1.b, e2.b AS c
       FROM o2 e1 JOIN o2 e2 ON e2.a = e1.b
       WHERE EXISTS (SELECT 1 FROM o2 e3
                     WHERE e3.a = e1.a AND e3.b = e2.b))
SELECT CAST(0 AS BIGINT) AS iter,
       (SELECT CAST(count(*) AS BIGINT) FROM u0) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM t0) AS n_triangles
UNION ALL
SELECT 1, (SELECT count(*) FROM u1), (SELECT count(*) FROM t1)
UNION ALL
SELECT 2, (SELECT count(*) FROM u2), (SELECT count(*) FROM t2)
ORDER BY iter
""")
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 4-truss peel census over the co-purchase graph: two fixed peels
    # (edge support from the degree-oriented triangle list, pin_cut
    # bounded), (iter, n_edges, n_triangles) per round
    from ..operators.analytics import ktruss_peel_census
    li = load_table(spark, sf_dir, "lineitem")
    oi = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a, b = oi.alias("a"), oi.alias("b")
    pairs = (a.join(b, (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("a.i") < F.col("b.i")))
             .select(F.col("a.i").alias("pa"), F.col("b.i").alias("pb")))
    return ktruss_peel_census(pairs, "pa", "pb", k=4, iters=2)


from ..operators import analytics as _AN  # noqa: E402

# ONE Benford constant table for both operators and both oracles
# (analytics.BENFORD_EXPECTED, the round-8 literals). ::DOUBLE per
# element — DuckDB types bare high-precision numeric literals as
# DECIMAL, whose Python fetch is decimal.Decimal and whose arithmetic
# would diverge from Spark's double literals
_BENFORD_SQL_LIST = "[" + ", ".join(
    f"{_AN.BENFORD_EXPECTED[d]!r}::DOUBLE" for d in range(1, 10)) + "]"


@register("orders_benford", f"""
WITH cz AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
), d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM cz WHERE cents > 0
), g AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY digit
), dom AS (SELECT unnest(generate_series(1, 9)) AS digit),
filled AS (
  SELECT dom.digit, CAST(coalesce(g.n_obs, 0) AS BIGINT) AS n_obs
  FROM dom LEFT JOIN g ON g.digit = dom.digit
), tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM filled)
SELECT digit, n_obs,
       CASE WHEN n > 0
            THEN CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
       END AS obs_pct,
       list_extract({_BENFORD_SQL_LIST}, CAST(digit AS INT)) AS expected_pct,
       CASE WHEN n > 0
            THEN (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE)
                    * list_extract({_BENFORD_SQL_LIST}, CAST(digit AS INT)))
                 * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE)
                    * list_extract({_BENFORD_SQL_LIST}, CAST(digit AS INT)))
                 / (CAST(n AS DOUBLE)
                    * list_extract({_BENFORD_SQL_LIST}, CAST(digit AS INT)))
       END AS chi2_term
FROM filled, tot ORDER BY digit
""")
def orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Benford first-digit forensic screen on order totals: per-digit
    # observed vs log10(1+1/d) expectation with chi-square
    # contributions (the ONE shared constant table, exact counts)
    from ..operators.quality import benford_chi2_cells
    o = load_table(spark, sf_dir, "orders")
    return benford_chi2_cells(o, "o_totalprice")


# ---------------------------------------------------------------------------
# streaming SRM twin + Markov steady state
# ---------------------------------------------------------------------------

_SRM_ORACLE = """
WITH ua AS (
  SELECT DISTINCT event_type AS unit, user_id,
         (('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 100) % 2
           AS arm
  FROM events WHERE user_id IS NOT NULL
), g AS (
  SELECT unit,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_arm0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_arm1
  FROM ua GROUP BY unit
)
SELECT unit, n_arm0, n_arm1,
       CASE WHEN n_arm0 + n_arm1 > 0
            THEN CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1) AS DOUBLE)
                 / CAST(n_arm0 + n_arm1 AS DOUBLE)
       END AS chi2,
       1000 * (n_arm0 - n_arm1) * (n_arm0 - n_arm1)
         > 3841 * (n_arm0 + n_arm1) AS srm_flag
FROM g ORDER BY unit
"""


@register("streaming_srm", _SRM_ORACLE)
def streaming_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the batch SRM check as a REAL streaming query: per-(unit, user)
    # streaming aggregate (bounded dedup state) drained availableNow,
    # arms + chi-square literally shared with the batch twin — same
    # oracle as events_srm
    import os

    from ..streaming.events import streaming_srm_counts
    return streaming_srm_counts(
        spark, os.path.join(sf_dir, "events.parquet"))


@register("events_markov_steady", """
WITH t AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS i,
         event_type AS j
  FROM events
), c AS (
  SELECT i, j, CAST(count(*) AS BIGINT) AS c FROM t
  WHERE i IS NOT NULL GROUP BY i, j
), rs AS (SELECT i, CAST(sum(c) AS BIGINT) AS rs FROM c GROUP BY i),
m AS (SELECT c.i, c.j, c.c, rs.rs FROM c JOIN rs ON rs.i = c.i),
states AS (SELECT DISTINCT s FROM (
             SELECT i AS s FROM m UNION ALL SELECT j FROM m)),
n AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM states),
p0 AS (SELECT s AS node, 1000000000000 // ns AS r FROM states, n),
a1 AS (SELECT m.j AS node, CAST(sum((p.r * m.c) // m.rs) AS BIGINT) AS r
       FROM m JOIN p0 p ON p.node = m.i GROUP BY m.j),
p1 AS (SELECT s AS node, coalesce(a1.r, 0) AS r
       FROM states LEFT JOIN a1 ON a1.node = states.s),
a2 AS (SELECT m.j AS node, CAST(sum((p.r * m.c) // m.rs) AS BIGINT) AS r
       FROM m JOIN p1 p ON p.node = m.i GROUP BY m.j),
p2 AS (SELECT s AS node, coalesce(a2.r, 0) AS r
       FROM states LEFT JOIN a2 ON a2.node = states.s),
a3 AS (SELECT m.j AS node, CAST(sum((p.r * m.c) // m.rs) AS BIGINT) AS r
       FROM m JOIN p2 p ON p.node = m.i GROUP BY m.j),
p3 AS (SELECT s AS node, coalesce(a3.r, 0) AS r
       FROM states LEFT JOIN a3 ON a3.node = states.s)
SELECT node AS event_type, CAST(r AS BIGINT) AS pi_e12
FROM p3 ORDER BY event_type
""")
def events_markov_steady(spark: SparkSession, sf_dir: str) -> DataFrame:
    # steady-state of the event-type transition chain: 3 exact
    # fixed-point power iterations over the (tiny) transition matrix —
    # the chain analogue of graph_pagerank_parts
    from ..operators.analytics import markov_steady_state
    ev = load_table(spark, sf_dir, "events")
    return markov_steady_state(ev)


# ---------------------------------------------------------------------------
# schema drift, categorical independence, runs test
# ---------------------------------------------------------------------------

@register("events_schema_drift", """
WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
           FROM events),
m AS (SELECT e.*, epoch_us(e.ts) >= (b.mn + b.mx) / 2 AS h
      FROM events e, b),
wide AS (
  SELECT CAST(sum(CASE WHEN NOT h THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN NOT h AND user_id IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS u_nul1,
         CAST(sum(CASE WHEN h AND user_id IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS u_nul2,
         CAST(count(DISTINCT CASE WHEN NOT h THEN user_id END)
              AS BIGINT) AS u_dst1,
         CAST(count(DISTINCT CASE WHEN h THEN user_id END)
              AS BIGINT) AS u_dst2,
         CAST(sum(CASE WHEN NOT h AND event_type IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS t_nul1,
         CAST(sum(CASE WHEN h AND event_type IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS t_nul2,
         CAST(count(DISTINCT CASE WHEN NOT h THEN event_type END)
              AS BIGINT) AS t_dst1,
         CAST(count(DISTINCT CASE WHEN h THEN event_type END)
              AS BIGINT) AS t_dst2,
         CAST(sum(CASE WHEN NOT h AND value IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS v_nul1,
         CAST(sum(CASE WHEN h AND value IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS v_nul2,
         CAST(count(DISTINCT CASE WHEN NOT h THEN value END)
              AS BIGINT) AS v_dst1,
         CAST(count(DISTINCT CASE WHEN h THEN value END)
              AS BIGINT) AS v_dst2
  FROM m)
SELECT col AS "column", n1 AS n_first, n2 AS n_second,
       CASE WHEN n1 > 0 THEN CAST(nul1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       END AS null_pct_first,
       CASE WHEN n2 > 0 THEN CAST(nul2 AS DOUBLE) / CAST(n2 AS DOUBLE)
       END AS null_pct_second,
       CASE WHEN n1 > 0 AND n2 > 0
            THEN CAST(nul2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                 - CAST(nul1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       END AS null_pct_delta,
       dst1 AS distinct_first, dst2 AS distinct_second
FROM (
  SELECT 'event_type' AS col, n1, n2, t_nul1 AS nul1, t_nul2 AS nul2,
         t_dst1 AS dst1, t_dst2 AS dst2 FROM wide
  UNION ALL
  SELECT 'user_id', n1, n2, u_nul1, u_nul2, u_dst1, u_dst2 FROM wide
  UNION ALL
  SELECT 'value', n1, n2, v_nul1, v_nul2, v_dst1, v_dst2 FROM wide)
ORDER BY col
""")
def events_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-column null-rate / exact-distinct drift between timeline
    # halves — the producer-breakage monitor upstream of value drift
    from ..operators.quality import column_profile_drift
    ev = load_table(spark, sf_dir, "events")
    return column_profile_drift(ev, "ts",
                                ["event_type", "user_id", "value"])


@register("orders_priority_status_chi2", """
WITH cells AS (
  SELECT o_orderpriority AS r, o_orderstatus AS c,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM orders GROUP BY 1, 2
), rm AS (SELECT r, CAST(sum(n_obs) AS BIGINT) AS n_row
          FROM cells GROUP BY r),
cm AS (SELECT c, CAST(sum(n_obs) AS BIGINT) AS n_col
       FROM cells GROUP BY c),
tot AS (SELECT CAST(sum(n_row) AS BIGINT) AS n FROM rm),
grid AS (
  SELECT rm.r, cm.c, rm.n_row, cm.n_col, tot.n,
         CAST(coalesce(cells.n_obs, 0) AS BIGINT) AS n_obs
  FROM rm CROSS JOIN cm
  LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c, tot)
SELECT r AS o_orderpriority, c AS o_orderstatus, n_obs, n_row, n_col,
       CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE)
         / CAST(n AS DOUBLE) AS expected,
       CASE WHEN n > 0
            THEN (CAST(n_obs AS DOUBLE)
                  - CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE)
                    / CAST(n AS DOUBLE))
                 * (CAST(n_obs AS DOUBLE)
                    - CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE)
                      / CAST(n AS DOUBLE))
                 / (CAST(n_row AS DOUBLE) * CAST(n_col AS DOUBLE)
                    / CAST(n AS DOUBLE))
       END AS chi2_term
FROM grid ORDER BY o_orderpriority, o_orderstatus
""")
def orders_priority_status_chi2(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    # priority × status independence audit: zero-filled contingency
    # grid with per-cell chi-square contributions (the Benford rule:
    # per-cell rows, no order-dependent float total)
    from ..operators.quality import contingency_chi2
    o = load_table(spark, sf_dir, "orders")
    return contingency_chi2(o, "o_orderpriority", "o_orderstatus")


@register("stock_updown_runs", _BARS_CTE + """
, cts AS (
  SELECT event_type, hr,
         CAST(round(close * 100, 0) AS BIGINT) AS c
  FROM bars
), d AS (
  SELECT event_type, hr,
         c - lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS diff
  FROM cts
), s AS (
  SELECT event_type, hr,
         CASE WHEN diff > 0 THEN 1 ELSE -1 END AS s
  FROM d WHERE diff IS NOT NULL AND diff != 0
), seg AS (
  SELECT event_type, s,
         CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY hr)
                   IS NULL
                   OR lag(s) OVER (PARTITION BY event_type ORDER BY hr)
                      = s THEN 0
              ELSE 1 END AS chg
  FROM s
), g AS (
  SELECT event_type,
         CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_down,
         CAST(sum(chg) + 1 AS BIGINT) AS n_runs
  FROM seg GROUP BY event_type
)
SELECT event_type, n_up, n_down, n_runs,
       CASE WHEN (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                  * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                     - (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))))
                 / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                    * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                    * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)
                       - 1.0)) > 0
            THEN (CAST(n_runs AS DOUBLE)
                  - (1.0 + 2.0 * CAST(n_up AS DOUBLE)
                       * CAST(n_down AS DOUBLE)
                       / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))))
                 / sqrt((2.0 * CAST(n_up AS DOUBLE)
                         * CAST(n_down AS DOUBLE)
                         * (2.0 * CAST(n_up AS DOUBLE)
                            * CAST(n_down AS DOUBLE)
                            - (CAST(n_up AS DOUBLE)
                               + CAST(n_down AS DOUBLE))))
                        / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                           * (CAST(n_up AS DOUBLE)
                              + CAST(n_down AS DOUBLE))
                           * (CAST(n_up AS DOUBLE)
                              + CAST(n_down AS DOUBLE) - 1.0)))
       END AS z
FROM g ORDER BY event_type
""")
def stock_updown_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Wald-Wolfowitz runs test on close-to-close move signs per symbol
    # (ties excluded identically both sides); z from exact integer
    # counts with fixed association
    ev = load_table(spark, sf_dir, "events")
    return ind.updown_runs_test(ind.hourly_bars(ev))


# ---------------------------------------------------------------------------
# streaming Benford twin, arrival overdispersion, Roll implied spread
# ---------------------------------------------------------------------------

_BENFORD_EVENTS_ORACLE = f"""
WITH cz AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events
), d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM cz WHERE cents > 0
), g AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY digit
), dom AS (SELECT unnest(generate_series(1, 9)) AS digit),
filled AS (
  SELECT dom.digit, CAST(coalesce(g.n_obs, 0) AS BIGINT) AS n_obs
  FROM dom LEFT JOIN g ON g.digit = dom.digit
), tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM filled)
SELECT digit, n_obs,
       CASE WHEN n > 0
            THEN CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
       END AS obs_pct,
       list_extract({{lst}}, CAST(digit AS INT)) AS expected_pct,
       CASE WHEN n > 0
            THEN (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE)
                    * list_extract({{lst}}, CAST(digit AS INT)))
                 * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE)
                    * list_extract({{lst}}, CAST(digit AS INT)))
                 / (CAST(n AS DOUBLE)
                    * list_extract({{lst}}, CAST(digit AS INT)))
       END AS chi2_term
FROM filled, tot ORDER BY digit
""".format(lst=_BENFORD_SQL_LIST)


@register("streaming_benford", _BENFORD_EVENTS_ORACLE)
def streaming_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the Benford money-feed forensic as a REAL streaming query:
    # nine-row streaming aggregate drained availableNow, the batch
    # zero-fill/chi-square tail applied unchanged to the drained sink
    import os

    from ..streaming.events import streaming_benford_digits
    return streaming_benford_digits(
        spark, os.path.join(sf_dir, "events.parquet"))


@register("events_overdispersion", """
WITH b AS (SELECT min(date_trunc('hour', ts)) AS mn,
                  max(date_trunc('hour', ts)) AS mx
           FROM events),
hours AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
          FROM b),
types AS (SELECT DISTINCT event_type AS et FROM events),
grid AS (SELECT t.et, h.hr FROM types t CROSS JOIN hours h),
cnt AS (SELECT event_type AS et, date_trunc('hour', ts) AS hr,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
filled AS (
  SELECT g.et, coalesce(c.c, 0) AS c
  FROM grid g LEFT JOIN cnt c ON c.et = g.et AND c.hr = g.hr
), agg AS (
  SELECT et, CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(c * c) AS BIGINT) AS q
  FROM filled GROUP BY et)
SELECT et AS event_type, n_hours, s AS n_events,
       CASE WHEN s > 0 AND n_hours > 1
            THEN CAST(n_hours * q - s * s AS DOUBLE)
                 / CAST((n_hours - 1) * s AS DOUBLE)
       END AS dispersion,
       CASE WHEN s > 0 AND n_hours > 1
            THEN 2 * (n_hours * q - s * s) > 3 * (n_hours - 1) * s
       END AS overdispersed
FROM agg ORDER BY event_type
""")
def events_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Poisson index-of-dispersion audit of hourly arrivals per type
    # over the DENSE hour grid (zeros count); exact integer power
    # sums, pure-integer D > 1.5 flag
    from ..operators.analytics import poisson_overdispersion
    ev = load_table(spark, sf_dir, "events")
    return poisson_overdispersion(ev)
