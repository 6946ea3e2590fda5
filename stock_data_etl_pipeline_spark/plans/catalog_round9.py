"""Round-9 catalog entries.

Volatility-estimator / mean-reversion / cross-series stock additions:
Rogers–Satchell range volatility, return moments (skew/kurtosis),
lead–lag cross-correlation, OU half-life, and daily volume HHI — the
five entries this module actually registers. (The distribution tests,
embedding-geometry audits, graph closure curves and corpus profiles
originally sketched for this round live in plans/catalog_round10.py.)
Every entry follows the exact-integer oracle discipline (COVERAGE.md):
integer-grid summands, single-division emits, shared transcendental
literals, identical association both engines, unrounded raw-double
emits for ratios of exact integers.

Reference parity: the reference's surface stops at filter/join/
aggregate over ingested series (SURVEY §2); these extend the engine's
quant/curation north star like plans/catalog_quant.py (round 7) and
plans/catalog_round8.py (round 8).

MUST import after the other catalog modules (see plans/__init__) so
the never-checked rotation ranks these behind the six round-8 entries
already waiting for their first driver window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import indicators as ind
from ..sources.registry import load_table
from .catalog import register
from .catalog_stock import _BARS_CTE

# cents CTE with the open leg (catalog_quant's _CENTS_CTE drops open;
# Rogers–Satchell needs all four legs)
_OHLC_CENTS_CTE = """
, cts4 AS (
  SELECT event_type, hr, volume,
         CAST(round(open  * 100, 0) AS BIGINT) AS o,
         CAST(round(high  * 100, 0) AS BIGINT) AS h,
         CAST(round(low   * 100, 0) AS BIGINT) AS l,
         CAST(round(close * 100, 0) AS BIGINT) AS c
  FROM bars
)"""

# close-to-close log returns on a parametric grid, low>0 bars only —
# shared by the moments and lead-lag oracles
_RET_CTE = """
, lr AS (
  SELECT event_type, hr, close,
         lag(close) OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM bars WHERE low > 0
), rr AS (
  SELECT event_type, hr,
         CAST(round(ln(close / pc) * {grid}, 0) AS BIGINT) AS r
  FROM lr WHERE pc IS NOT NULL AND pc > 0
)"""


@register("stock_rogers_satchell", _BARS_CTE + _OHLC_CENTS_CTE + f"""
, pv AS (
  SELECT event_type,
         CAST(round((ln(CAST(h AS DOUBLE) / CAST(c AS DOUBLE))
                     * ln(CAST(h AS DOUBLE) / CAST(o AS DOUBLE))
                     + ln(CAST(l AS DOUBLE) / CAST(c AS DOUBLE))
                       * ln(CAST(l AS DOUBLE) / CAST(o AS DOUBLE)))
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
       END AS rs_vol
FROM g ORDER BY event_type
""")
def stock_rogers_satchell(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drift-independent OHLC range volatility: per-bar term on the
    # exact 1e-12 grid, BIGINT sum, Σ ≥ 0 guard on BOTH sides (DuckDB
    # sqrt(negative) is a hard crash)
    ev = load_table(spark, sf_dir, "events")
    return ind.rogers_satchell_vol(ind.hourly_bars(ev))


@register("stock_return_moments", _BARS_CTE
          + _RET_CTE.format(grid=ind.MOM_RET_GRID) + """
, g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r) AS BIGINT) AS s1,
         CAST(sum(r * r) AS BIGINT) AS s2,
         CAST(sum(r * r * r) AS BIGINT) AS s3,
         CAST(sum(r * r * r * r) AS BIGINT) AS s4
  FROM rr GROUP BY event_type
), t AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS q2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS q3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS q4
  FROM g
), u AS (SELECT *, q2 - m * m AS v FROM t)
SELECT event_type, n,
       CASE WHEN v > 0
            THEN (q3 - 3.0 * m * q2 + 2.0 * m * m * m) / (v * sqrt(v))
       END AS skewness,
       CASE WHEN v > 0
            THEN (q4 - 4.0 * m * q3 + 6.0 * m * m * q2
                  - 3.0 * m * m * m * m) / (v * v) - 3.0
       END AS excess_kurtosis
FROM u ORDER BY event_type
""")
def stock_return_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tail-shape screen: exact BIGINT power sums of 1e-2-grid log
    # returns (grid cancels in the standardized moments), UNROUNDED
    # double formulas with identical association both engines
    ev = load_table(spark, sf_dir, "events")
    return ind.return_moments(ind.hourly_bars(ev))


@register("stock_lead_lag_corr", _BARS_CTE
          + _RET_CTE.format(grid=ind.LL_RET_GRID) + f"""
, re AS (
  SELECT event_type,
         CAST(floor(epoch(hr)) // 3600 AS BIGINT) AS he, r
  FROM rr
), x AS (SELECT he AS hx, r AS rx FROM re WHERE event_type = 'purchase'),
y AS (SELECT he AS hy, r AS ry FROM re WHERE event_type = 'view'),
lags AS (SELECT unnest(generate_series(-{ind.LL_MAX_LAG},
                                       {ind.LL_MAX_LAG})) AS lag),
j AS (
  SELECT lag, rx, ry
  FROM x CROSS JOIN lags JOIN y ON hx + lag = hy
), g AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
         CAST(sum(rx * rx) AS BIGINT) AS sxx,
         CAST(sum(ry * ry) AS BIGINT) AS syy,
         CAST(sum(rx * ry) AS BIGINT) AS sxy
  FROM j GROUP BY lag
), d AS (
  SELECT lag, n_pairs,
         CAST(n_pairs * sxy - sx * sy AS BIGINT) AS num,
         CAST(n_pairs * sxx - sx * sx AS BIGINT) AS denx,
         CAST(n_pairs * syy - sy * sy AS BIGINT) AS deny
  FROM g
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       CASE WHEN denx > 0 AND deny > 0
            THEN CAST(num AS DOUBLE)
                 / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE))
       END AS xcorr
FROM d ORDER BY lag
""")
def stock_lead_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lag profile of the purchase/view return correlation: integer
    # epoch-hour keys shifted by the broadcast lag dim, exact BIGINT
    # correlation sums, variance factors guarded as integers and
    # leaf-cast double only inside the sqrt (the product overflows)
    ev = load_table(spark, sf_dir, "events")
    return ind.lead_lag_corr(ind.hourly_bars(ev), "purchase", "view")


@register("stock_ou_halflife", _BARS_CTE + f"""
, ct AS (
  SELECT event_type, hr,
         CAST(round(close * 100, 0) AS BIGINT) AS c
  FROM bars
), lx AS (
  SELECT event_type, c,
         lag(c) OVER (PARTITION BY event_type ORDER BY hr) AS x
  FROM ct
), d AS (
  SELECT event_type, x, c - x AS y FROM lx WHERE x IS NOT NULL
), g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM d GROUP BY event_type
), b AS (
  SELECT event_type, n,
         CASE WHEN CAST(n * sxx - sx * sx AS BIGINT) > 0
              THEN CAST(CAST(n * sxy - sx * sy AS BIGINT) AS DOUBLE)
                   / CAST(CAST(n * sxx - sx * sx AS BIGINT) AS DOUBLE)
         END AS beta
  FROM g
), p AS (SELECT *, 1.0 + beta AS phi FROM b)
SELECT event_type, n, beta,
       CASE WHEN phi > 0 AND phi < 1
            THEN round({-ind.OU_LN2!r} / ln(phi) * 1e6, 0) / 1e6
       END AS halflife_hours
FROM p ORDER BY event_type
""")
def stock_ou_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    # AR(1)/OU mean-reversion half-life: exact BIGINT regression sums
    # on the cents grid, beta UNROUNDED (exact-integer ratio), the
    # transcendental half-life quantized at 6 dp with ln2 shared
    ev = load_table(spark, sf_dir, "events")
    return ind.ou_halflife(ind.hourly_bars(ev))


@register("stock_volume_hhi", _BARS_CTE + """
, per AS (
  SELECT CAST(date_trunc('day', hr) AS TIMESTAMP) AS day, event_type,
         CAST(sum(volume) AS BIGINT) AS v
  FROM bars GROUP BY 1, 2
), tot AS (
  SELECT day, CAST(sum(v) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_symbols
  FROM per GROUP BY day
), s AS (
  SELECT per.day, tot.n_symbols,
         (1000000 * per.v) // tot.total AS s6
  FROM per JOIN tot ON per.day = tot.day
), g AS (
  SELECT day, CAST(min(n_symbols) AS BIGINT) AS n_symbols,
         CAST(sum(s6 * s6) AS BIGINT) AS hhi12,
         CAST(max(s6) AS BIGINT) AS top6
  FROM s GROUP BY day
)
SELECT day, n_symbols, hhi12 / 1e12 AS hhi, top6 / 1e6 AS top_share
FROM g ORDER BY day
""")
def stock_volume_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # daily cross-symbol volume concentration: quotient-grid shares,
    # BIGINT HHI, single 1e12 division — two hash-aggs, no windows
    ev = load_table(spark, sf_dir, "events")
    return ind.volume_hhi_daily(ind.hourly_bars(ev))
