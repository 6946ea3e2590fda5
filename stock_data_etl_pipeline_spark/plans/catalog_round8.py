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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    # terms; the EWMA rides banded_rank_join (O(lookback)/bar) with
    # first bars dropped BEFORE ranking so Σweights needs no guard
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
