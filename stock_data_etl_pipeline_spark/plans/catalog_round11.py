"""Round-11 catalog entries.

Families this module registers:

* volatility-estimator ladder completion — Garman–Klass and
  Yang–Zhang (overnight-jump-aware) range volatility;
* trend/momentum completion — MACD triplet on truncated EWMAs,
  Ultimate Oscillator, Price-Volume Trend;
* corpus statistics — Good–Turing frequency smoothing, tokenizer
  fertility, Kneser–Ney bigram perplexity, RAKE keyword scores;
* embedding-space audits — isotropy score, Matryoshka truncation
  recall, one-bit (sign) quantization recall;
* graph fixed-point — HITS hubs/authorities, label-propagation
  communities;
* experiment / privacy / data-quality — sample-ratio-mismatch check,
  t-closeness, referential-integrity orphan census.

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
