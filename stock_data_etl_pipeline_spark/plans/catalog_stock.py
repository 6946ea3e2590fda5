"""Catalog entries: stock-style time-series analytics over the event
stream — the indicator family a stock-data pipeline computes downstream
of ingestion (the reference ingests per-ticker series and derives
trailing metrics, e.g. the TTM substitution in
services/workers/tasks/transform_stock_data.py; these are the standard
technical-analysis continuations of that series: OHLC resampling,
Bollinger bands, RSI, EWMA trend, forward-fill, rolling correlation,
drawdown). `event_type` plays the symbol and `value` the tick price.

Every oracle restates the same hourly-bars CTE so Spark and DuckDB run
the identical resample + window formulas; outputs are rounded in-engine
(6 dp for derived ratios, the 0.01 tick grid for sums) so the hash
compare sees one canonical value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import indicators as ind
from ..sources.registry import load_table
from .catalog import register

# shared hourly-OHLC CTE for all oracles (tie-break mirrors
# operators/indicators.hourly_bars: row_number on (ts, event_id))
_BARS_CTE = """
WITH e AS (
  SELECT event_type, ts, event_id, value,
         date_trunc('hour', ts) AS hr
  FROM events
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, hr
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, hr
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
), bars AS (
  SELECT event_type, hr,
         max(CASE WHEN rn_a = 1 THEN value END) AS open,
         max(value) AS high,
         min(value) AS low,
         max(CASE WHEN rn_d = 1 THEN value END) AS close,
         count(*) AS volume,
         round(sum(value), 2) AS total_value
  FROM r
  GROUP BY event_type, hr
)
"""


@register("stock_ohlc_bars", _BARS_CTE + """
SELECT event_type, hr, open, high, low, close, volume, total_value
FROM bars
ORDER BY event_type, hr
""")
def stock_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Candlestick resample: ticks -> hourly OHLC per symbol. ONE
    # exchange total — the tie-break windows and the aggregate share
    # the (event_type, hr) partitioning.
    ev = load_table(spark, sf_dir, "events")
    return ind.hourly_bars(ev).orderBy("event_type", "hr")


@register("stock_bollinger", _BARS_CTE + f"""
SELECT event_type, hr, close,
       round(avg(close) OVER w, 6) AS ma,
       round(avg(close) OVER w + 2 * stddev_samp(close) OVER w, 6)
         AS upper_band,
       round(avg(close) OVER w - 2 * stddev_samp(close) OVER w, 6)
         AS lower_band,
       close > round(avg(close) OVER w
                     + 2 * stddev_samp(close) OVER w, 6) AS breakout_up,
       close < round(avg(close) OVER w
                     - 2 * stddev_samp(close) OVER w, 6) AS breakout_down
FROM bars
WINDOW w AS (PARTITION BY event_type ORDER BY hr
             ROWS BETWEEN {ind.BOLL_N - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_type, hr
""")
def stock_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rolling mean ± 2σ bands; breakout flags compare against the
    # ROUNDED band so the boolean is a function of emitted values.
    ev = load_table(spark, sf_dir, "events")
    return ind.bollinger(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_rsi", _BARS_CTE + f"""
, l AS (
  SELECT event_type, hr, close,
         close - lag(close) OVER (PARTITION BY event_type
                                  ORDER BY hr) AS delta
  FROM bars
), d AS (
  SELECT event_type, hr, close,
         CASE WHEN delta IS NULL THEN NULL
              ELSE greatest(delta, 0) END AS gain,
         CASE WHEN delta IS NULL THEN NULL
              ELSE greatest(-delta, 0) END AS loss
  FROM l
)
SELECT event_type, hr, close,
       round(CASE WHEN avg(loss) OVER w = 0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + avg(gain) OVER w
                                              / avg(loss) OVER w)
             END, 6) AS rsi
FROM d
WINDOW w AS (PARTITION BY event_type ORDER BY hr
             ROWS BETWEEN {ind.RSI_N - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_type, hr
""")
def stock_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Wilder-style RSI (simple-average variant); all-gain windows pin
    # to exactly 100 (loss terms are exactly 0 — no float hazard).
    ev = load_table(spark, sf_dir, "events")
    return ind.rsi(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_ewma_trend", _BARS_CTE + f"""
, rb AS (
  SELECT event_type, hr, close,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM bars
), pb AS (
  SELECT *, (rn - 1) // {ind.EWMA_LOOKBACK} AS band FROM rb
), cb AS (
  SELECT event_type, hr, close, rn,
         unnest([(rn - 1) // {ind.EWMA_LOOKBACK},
                 (rn - 1) // {ind.EWMA_LOOKBACK} - 1]) AS probe
  FROM rb
)
SELECT cur.event_type, cur.hr, cur.close,
       round(sum(prev.close * pow({ind.EWMA_DECAY}, cur.rn - prev.rn))
             / sum(pow({ind.EWMA_DECAY}, cur.rn - prev.rn)), 6) AS ewma
FROM cb cur JOIN pb prev
  ON cur.event_type = prev.event_type
 AND cur.probe = prev.band
 AND prev.rn > cur.rn - {ind.EWMA_LOOKBACK}
 AND prev.rn <= cur.rn
GROUP BY cur.event_type, cur.hr, cur.close
ORDER BY cur.event_type, cur.hr
""")
def stock_ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Truncated EWMA via the _trailing_vals bounded window frame on
    # the symbol partitioning (round-14: one exchange, no self-join —
    # adjudicated CONFIRMED faster by the r15 interleaved A/B,
    # tools/ab_ewma.py); decay^40 ~ 1e-4 keeps 6-dp identity with the
    # unbounded recurrence. The oracle SQL keeps the banded-join FORM
    # (DuckDB has no bounded array_agg frame) — same values.
    ev = load_table(spark, sf_dir, "events")
    return (ind.ewma_trend(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("stock_locf_fill", _BARS_CTE + """
, bounds AS (SELECT min(hr) AS mn, max(hr) AS mx FROM bars),
grid AS (
  SELECT s.event_type, h.hr
  FROM (SELECT DISTINCT event_type FROM bars) s
  CROSS JOIN (SELECT unnest(generate_series(
                (SELECT mn FROM bounds), (SELECT mx FROM bounds),
                INTERVAL 1 HOUR)) AS hr) h
)
SELECT g.event_type, g.hr,
       last_value(b.close IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close_filled,
       b.close IS NULL AS gap
FROM grid g LEFT JOIN bars b
  ON g.event_type = b.event_type AND g.hr = b.hr
ORDER BY g.event_type, g.hr
""")
def stock_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Forward-fill over a dense symbol x hour grid; grid size is
    # independent of event count (|symbols| x |hours|).
    ev = load_table(spark, sf_dir, "events")
    return (ind.locf_fill(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("stock_rolling_corr", _BARS_CTE + f"""
, x AS (SELECT hr, close AS x FROM bars WHERE event_type = 'purchase'),
y AS (SELECT hr, close AS y FROM bars WHERE event_type = 'view'),
xy AS (SELECT x.hr, x.x, y.y FROM x JOIN y ON x.hr = y.hr)
SELECT hr, x, y,
       round(CASE WHEN
                (cast(count(*) OVER w AS DOUBLE) * sum(x*x) OVER w
                 - sum(x) OVER w * sum(x) OVER w)
              * (cast(count(*) OVER w AS DOUBLE) * sum(y*y) OVER w
                 - sum(y) OVER w * sum(y) OVER w) > 0
         THEN (cast(count(*) OVER w AS DOUBLE) * sum(x*y) OVER w
               - sum(x) OVER w * sum(y) OVER w)
              / sqrt(
                (cast(count(*) OVER w AS DOUBLE) * sum(x*x) OVER w
                 - sum(x) OVER w * sum(x) OVER w)
              * (cast(count(*) OVER w AS DOUBLE) * sum(y*y) OVER w
                 - sum(y) OVER w * sum(y) OVER w))
         END, 6) AS corr_24h
FROM xy
WINDOW w AS (ORDER BY hr
             ROWS BETWEEN {ind.CORR_N - 1} PRECEDING AND CURRENT ROW)
ORDER BY hr
""")
def stock_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rolling Pearson between two symbols from explicit component sums
    # (identical arithmetic on both engines). The single unpartitioned
    # window is over BARS (|hours| rows), not ticks — at 100 TB this
    # row count is fixed by the calendar, and a real deployment keys
    # it by (pair) for many-pairs parallelism.
    ev = load_table(spark, sf_dir, "events")
    return (ind.rolling_corr(ind.hourly_bars(ev), "purchase", "view")
            .orderBy("hr"))


@register("stock_max_drawdown", _BARS_CTE + """
, dd AS (
  SELECT event_type,
         (close - max(close) OVER (PARTITION BY event_type ORDER BY hr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         / max(close) OVER (PARTITION BY event_type ORDER BY hr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dd
  FROM bars
)
SELECT event_type, round(min(dd), 6) AS max_drawdown,
       count(*) AS n_bars
FROM dd
GROUP BY event_type
ORDER BY event_type
""")
def stock_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Running-peak drawdown; window max is exact (no float summation),
    # so the quotient is bit-identical across engines.
    ev = load_table(spark, sf_dir, "events")
    return ind.max_drawdown(ind.hourly_bars(ev))


@register("streaming_ohlc_bars", _BARS_CTE + """
SELECT event_type, hr, open, high, low, close, volume, total_value
FROM bars
ORDER BY event_type, hr
""")
def streaming_ohlc_bars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The SAME candlestick relation produced by a real Structured
    # Streaming query (windowed min_by/max_by agg, watermark-bounded
    # state) — checked against the identical batch bars oracle.
    import os
    from ..streaming.events import streaming_ohlc_bars
    return streaming_ohlc_bars(
        spark, os.path.join(sf_dir, "events.parquet"))


@register("stock_atr", _BARS_CTE + f"""
, l AS (
  SELECT event_type, hr, high, low, close,
         lag(close) OVER (PARTITION BY event_type ORDER BY hr) AS pc
  FROM bars
), t AS (
  SELECT event_type, hr, close,
         CASE WHEN pc IS NULL THEN NULL
              ELSE greatest(high - low, abs(high - pc), abs(low - pc))
         END AS true_range
  FROM l
)
SELECT event_type, hr, close,
       round(true_range, 6) AS true_range,
       round(avg(true_range) OVER (
         PARTITION BY event_type ORDER BY hr
         ROWS BETWEEN {ind.ATR_N - 1} PRECEDING AND CURRENT ROW), 6) AS atr
FROM t
ORDER BY event_type, hr
""")
def stock_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Average True Range — candle-range volatility; first bar has no
    # prev_close and stays NULL (excluded from the window mean).
    ev = load_table(spark, sf_dir, "events")
    return ind.atr(ind.hourly_bars(ev)).orderBy("event_type", "hr")


@register("stock_cov_matrix", _BARS_CTE + """
SELECT a.event_type AS sym_a, b.event_type AS sym_b,
       count(*) AS n_obs,
       round((sum(a.close * b.close)
              - sum(a.close) * sum(b.close) / count(*))
             / (count(*) - 1), 6) AS cov
FROM bars a JOIN bars b ON a.hr = b.hr
GROUP BY a.event_type, b.event_type
ORDER BY sym_a, sym_b
""")
def stock_cov_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full pairwise covariance of hourly closes (portfolio risk): bars
    # self-joined on the hour, one grouped aggregate per ordered pair,
    # explicit E[xy]-E[x]E[y]/(n-1) form for engine portability.
    ev = load_table(spark, sf_dir, "events")
    return ind.cov_matrix(ind.hourly_bars(ev))


@register("incremental_ohlc_result", _BARS_CTE + """
SELECT event_type, hr, open, high, low, close, volume, total_value
FROM bars
ORDER BY event_type, hr
""")
def incremental_ohlc_result(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The bars table produced by the INCREMENTAL maintainer (3 forced
    # micro-batches, epoch-guarded foreachBatch folds into a
    # ManagedTable) must equal the single-pass batch resample — the
    # associativity contract, hash-checked against the same bars oracle.
    import atexit
    import os
    import shutil
    import tempfile

    from ..operators.incremental import (read_ohlc_bars,
                                         streaming_maintain_ohlc)
    from ..sources.managed_table import ManagedTable

    work = tempfile.mkdtemp(prefix="iohlc_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    src = os.path.join(work, "src")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    for i in range(3):  # three slices -> three micro-batches
        (ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i).coalesce(1)
         .write.mode("overwrite").parquet(os.path.join(src, f"s={i}")))
    table = ManagedTable(spark, os.path.join(work, "bars"),
                         partition_by=["event_type"])
    stream = (spark.readStream
              .schema("event_id long, ts timestamp, user_id long, "
                      "event_type string, value double")
              .option("maxFilesPerTrigger", 1).parquet(src + "/s=*"))
    q = streaming_maintain_ohlc(stream, table, os.path.join(work, "cp"))
    q.awaitTermination()
    return read_ohlc_bars(table).orderBy("event_type", "hr")


@register("stock_lag_features", _BARS_CTE + f"""
, m AS (
  SELECT event_type, hr, close,
         {', '.join(f'lag(close, {i}) OVER w AS lag_{i}'
                    for i in range(1, ind.LAG_K + 1))},
         round(avg(close) OVER wk, 6) AS mean_{ind.LAG_K},
         round(stddev_samp(close) OVER wk, 6) AS std_{ind.LAG_K},
         lead(close) OVER w AS label_next_close
  FROM bars
  WINDOW w AS (PARTITION BY event_type ORDER BY hr),
         wk AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {ind.LAG_K - 1} PRECEDING AND CURRENT ROW)
)
SELECT * FROM m
WHERE lag_{ind.LAG_K} IS NOT NULL AND label_next_close IS NOT NULL
ORDER BY event_type, hr
""")
def stock_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Train-matrix extraction for per-symbol forecasting: k lag closes
    # + rolling moments + next-close label, dense rows only. One window
    # partitioning serves every feature column.
    ev = load_table(spark, sf_dir, "events")
    return (ind.lag_features(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("stock_momentum_backtest", _BARS_CTE + f"""
, sig AS (
  SELECT event_type, hr, close,
         sign(round(avg(close) OVER wf - avg(close) OVER ws, 6)) AS signal
  FROM bars
  WINDOW wf AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         ws AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
), pos AS (
  SELECT event_type, hr,
         lag(signal) OVER w AS position,
         close / lag(close) OVER w - 1.0 AS bar_ret
  FROM sig
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
), t AS (
  SELECT * FROM pos
  WHERE position IS NOT NULL AND bar_ret IS NOT NULL
)
SELECT event_type,
       round(sum(position * bar_ret), 6) AS total_pnl,
       CAST(sum(CASE WHEN position <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS bars_in_market,
       CAST(sum(CASE WHEN position * bar_ret > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS winning_bars,
       count(*) AS n_bars
FROM t GROUP BY event_type ORDER BY event_type
""")
def stock_momentum_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # MA-crossover backtest: signal lagged one bar (no look-ahead),
    # position x bar-return folded per symbol — two window passes and
    # one aggregate, embarrassingly parallel across symbols.
    ev = load_table(spark, sf_dir, "events")
    return ind.momentum_backtest(ind.hourly_bars(ev))


@register("stock_daily_bars", """
WITH e AS (
  SELECT event_type, ts, event_id, value,
         -- duckdb's day-trunc yields DATE; Spark keeps TIMESTAMP
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, d
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT event_type, d AS hr,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS volume,
       round(sum(value), 2) AS total_value
FROM r
GROUP BY event_type, d
ORDER BY event_type, hr
""")
def stock_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Daily candles derived from HOURLY PARTIALS (never from ticks) via
    # the bar monoid's re-combine; the oracle computes daily bars
    # directly from ticks — equality IS the associativity proof at
    # external-gate strength. The total rounds once at the day level
    # (the hourly partials carry the raw sum).
    from ..operators.incremental import ohlc_partial
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    hourly = ohlc_partial(ev)
    daily = ind.rollup_bars(hourly, "day")
    return (daily.select("event_type", "hr", "open", "high", "low",
                         "close", "volume",
                         F.round(F.col("sum_value"), 2)
                         .alias("total_value"))
            .orderBy("event_type", "hr"))


@register("dq_stock_bars", _BARS_CTE + """
SELECT 'high_ge_low' AS constraint_name,
       CAST(sum(CASE WHEN high < low THEN 1 ELSE 0 END) AS BIGINT)
         AS violations,
       count(*) AS checked
FROM bars
UNION ALL
SELECT 'open_within_range',
       CAST(sum(CASE WHEN open > high OR open < low THEN 1 ELSE 0 END)
            AS BIGINT),
       count(*)
FROM bars
UNION ALL
SELECT 'close_within_range',
       CAST(sum(CASE WHEN close > high OR close < low THEN 1 ELSE 0 END)
            AS BIGINT),
       count(*)
FROM bars
UNION ALL
SELECT 'volume_positive',
       CAST(sum(CASE WHEN volume IS NULL OR volume <= 0
                     THEN 1 ELSE 0 END) AS BIGINT),
       count(*)
FROM bars
UNION ALL
SELECT bk.constraint_name,
       CAST(sum(CASE WHEN bk.c > 1 THEN bk.c - 1 ELSE 0 END) AS BIGINT),
       CAST(sum(bk.c) AS BIGINT)
FROM (SELECT 'bar_key_unique' AS constraint_name, count(*) AS c
      FROM bars GROUP BY event_type, hr) bk
GROUP BY bk.constraint_name
ORDER BY constraint_name
""")
def dq_stock_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the declarative DQ suite (operators/quality.py) applied to the
    # DERIVED bars relation: candle invariants (OHLC ordering bounds,
    # positive volume) folded into one aggregation + key uniqueness —
    # the expectation gate a bar pipeline runs before publishing. All
    # constraints hold on the resample by construction, and the oracle
    # re-derives that from ticks independently.
    from ..operators.quality import RowRule, UniqueRule, dq_check
    ev = load_table(spark, sf_dir, "events")
    bars = ind.hourly_bars(ev)
    out = dq_check(bars, [
        RowRule("close_within_range",
                (F.col("close") > F.col("high"))
                | (F.col("close") < F.col("low"))),
        RowRule("high_ge_low", F.col("high") < F.col("low")),
        RowRule("open_within_range",
                (F.col("open") > F.col("high"))
                | (F.col("open") < F.col("low"))),
        RowRule("volume_positive",
                F.col("volume").isNull() | (F.col("volume") <= 0)),
        UniqueRule("bar_key_unique", ("event_type", "hr")),
    ])
    return out.orderBy("constraint_name")


@register("stock_seasonality_profile", _BARS_CTE + """
, rets AS (
  SELECT event_type, hr, volume, total_value,
         CAST(round(abs(close / lag(close) OVER (PARTITION BY event_type
                                                 ORDER BY hr) - 1.0)
                    * 1000000, 0) AS BIGINT) AS ri
  FROM bars
)
SELECT event_type,
       CAST(extract(hour FROM hr) AS BIGINT) AS hour_of_day,
       CAST(sum(volume) AS BIGINT) AS total_volume,
       count(*) AS n_bars,
       round(sum(total_value), 2) AS total_traded,
       round(cast(cast(sum(ri) AS BIGINT) AS DOUBLE)
             / count(ri) / 1000000, 6) AS mean_abs_ret
FROM rets
GROUP BY event_type, extract(hour FROM hr)
ORDER BY event_type, hour_of_day
""")
def stock_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Intraday seasonality: per (symbol, hour-of-day), total volume and
    # mean absolute bar return (the volatility smile a trading calendar
    # shows). Calendar-bucket re-keying of the bars relation — one
    # extra hash-agg, |symbols| x 24 output rows at any scale.
    # mean_abs_ret is quantized to micro-units so its sum is an exact
    # integer (the fixed-point determinism rule); money totals stay on
    # the 0.01 sum grid.
    from pyspark.sql import Window
    ev = load_table(spark, sf_dir, "events")
    bars = ind.hourly_bars(ev)
    w = Window.partitionBy("event_type").orderBy("hr")
    r = bars.withColumn(
        "ri", F.round(F.abs(F.col("close") / F.lag("close").over(w) - 1.0)
                      * 1_000_000, 0).cast("long"))
    return (r.groupBy("event_type",
                      F.hour("hr").cast("long").alias("hour_of_day"))
            .agg(F.sum("volume").alias("total_volume"),
                 F.count(F.lit(1)).alias("n_bars"),
                 F.round(F.sum("total_value"), 2).alias("total_traded"),
                 F.round(F.sum("ri").cast("double")
                         / F.count("ri") / 1_000_000, 6)
                 .alias("mean_abs_ret"))
            .orderBy("event_type", "hour_of_day"))


@register("stock_beta_alpha", _BARS_CTE + """
, ret AS (
  SELECT event_type, hr,
         CASE WHEN close > 0
               AND lag(close) OVER (PARTITION BY event_type ORDER BY hr) > 0
              THEN CAST(round((ln(close) - ln(lag(close) OVER (
                       PARTITION BY event_type ORDER BY hr))) * 1000000,
                   0) AS BIGINT) END AS ri
  FROM bars
), rr AS (SELECT * FROM ret WHERE ri IS NOT NULL),
mkt AS (SELECT hr, CAST(round(avg(ri), 0) AS BIGINT) AS rmi
        FROM rr GROUP BY hr),
j AS (SELECT rr.event_type, rr.ri, mkt.rmi FROM rr JOIN mkt USING (hr)),
a AS (SELECT event_type, cast(count(*) AS DOUBLE) AS n,
             cast(cast(sum(ri) AS BIGINT) AS DOUBLE) AS sr,
             cast(cast(sum(rmi) AS BIGINT) AS DOUBLE) AS sm,
             cast(cast(sum(ri*rmi) AS BIGINT) AS DOUBLE) AS srm,
             cast(cast(sum(rmi*rmi) AS BIGINT) AS DOUBLE) AS sm2,
             cast(cast(sum(ri*ri) AS BIGINT) AS DOUBLE) AS sr2
      FROM j GROUP BY event_type)
SELECT event_type, cast(n AS BIGINT) AS n_obs,
       round(CASE WHEN n*sm2 - sm*sm != 0
                  THEN (n*srm - sr*sm) / (n*sm2 - sm*sm) END, 6) AS beta,
       round((sr/n - (CASE WHEN n*sm2 - sm*sm != 0
                           THEN (n*srm - sr*sm) / (n*sm2 - sm*sm) END)
                     * (sm/n)) * 0.000001, 6) AS alpha,
       round(CASE WHEN n > 1
                  THEN sqrt((n*sr2 - sr*sr) / (n*(n-1))) * 0.000001
                       * sqrt(8760.0) END, 6) AS vol_annual,
       round(CASE WHEN n > 1 AND (n*sr2 - sr*sr) / (n*(n-1)) > 0
                  THEN (sr/n) / sqrt((n*sr2 - sr*sr) / (n*(n-1)))
                       * sqrt(8760.0) END, 6) AS sharpe_annual
FROM a ORDER BY event_type
""")
def stock_beta_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    # CAPM beta/alpha vs the equal-weight market + annualized vol and
    # Sharpe. Returns are quantized to integer micro-log-returns so all
    # regression moments are EXACT integer sums (order-independent —
    # float-sum reduction order flipped a 6-dp rounding once between
    # runs); only the final scalar formulas run in floating point.
    ev = load_table(spark, sf_dir, "events")
    return ind.beta_alpha(ind.hourly_bars(ev))


@register("stock_pairs_zscore", _BARS_CTE + f"""
, x AS (SELECT hr, close AS x FROM bars WHERE event_type = 'purchase'),
y AS (SELECT hr, close AS y FROM bars WHERE event_type = 'view'),
xy AS (SELECT x.hr, x.x, y.y,
              CAST(round(x.x * 10000, 0) AS BIGINT) AS xi,
              CAST(round(y.y * 10000, 0) AS BIGINT) AS yi
       FROM x JOIN y ON x.hr = y.hr),
h AS (SELECT (cast(count(*) AS DOUBLE)
                * cast(cast(sum(xi*yi) AS BIGINT) AS DOUBLE)
              - cast(cast(sum(xi) AS BIGINT) AS DOUBLE)
                * cast(cast(sum(yi) AS BIGINT) AS DOUBLE))
             / (cast(count(*) AS DOUBLE)
                  * cast(cast(sum(yi*yi) AS BIGINT) AS DOUBLE)
                - cast(cast(sum(yi) AS BIGINT) AS DOUBLE)
                  * cast(cast(sum(yi) AS BIGINT) AS DOUBLE)) AS beta_h
      FROM xy),
sp AS (SELECT hr, x, y, round(beta_h, 6) AS beta_h,
              CAST(round((x - beta_h * y) * 10000, 0) AS BIGINT) AS si
       FROM xy, h)
SELECT hr, x, y, beta_h,
       cast(si AS DOUBLE) / 10000 AS spread,
       round(CASE WHEN (cast(count(*) OVER w AS DOUBLE)
                          * cast(cast(sum(si*si) OVER w AS BIGINT) AS DOUBLE)
                        - cast(cast(sum(si) OVER w AS BIGINT) AS DOUBLE)
                          * cast(cast(sum(si) OVER w AS BIGINT) AS DOUBLE))
                       / (cast(count(*) OVER w AS DOUBLE)
                          * (cast(count(*) OVER w AS DOUBLE) - 1)) > 0
             THEN (si - cast(cast(sum(si) OVER w AS BIGINT) AS DOUBLE)
                          / cast(count(*) OVER w AS DOUBLE))
                  / sqrt((cast(count(*) OVER w AS DOUBLE)
                            * cast(cast(sum(si*si) OVER w AS BIGINT) AS DOUBLE)
                          - cast(cast(sum(si) OVER w AS BIGINT) AS DOUBLE)
                            * cast(cast(sum(si) OVER w AS BIGINT) AS DOUBLE))
                         / (cast(count(*) OVER w AS DOUBLE)
                            * (cast(count(*) OVER w AS DOUBLE) - 1)))
             END, 6) AS z_24h
FROM sp
WINDOW w AS (ORDER BY hr
             ROWS BETWEEN {ind.CORR_N - 1} PRECEDING AND CURRENT ROW)
ORDER BY hr
""")
def stock_pairs_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pairs-trading spread z-score: integer-quantized hedge regression
    # (exact component sums), residual spread on the 1e-4 grid, rolling
    # 24-bar standardization from exact integer window sums — identical
    # doubles on both engines, same calendar-bounded window cost class
    # as stock_rolling_corr.
    ev = load_table(spark, sf_dir, "events")
    return (ind.pairs_zscore(ind.hourly_bars(ev), "purchase", "view")
            .orderBy("hr"))


@register("stock_mean_shift_alerts", _BARS_CTE + f"""
, ci AS (SELECT event_type, hr,
                CAST(round(close * 10000, 0) AS BIGINT) AS ci
         FROM bars),
m AS (
  SELECT event_type, hr,
         count(*) OVER w1 AS c1, count(*) OVER w0 AS c0,
         cast(cast(sum(ci) OVER w1 AS BIGINT) AS DOUBLE) AS s1,
         cast(cast(sum(ci*ci) OVER w1 AS BIGINT) AS DOUBLE) AS q1,
         cast(cast(sum(ci) OVER w0 AS BIGINT) AS DOUBLE) AS s0,
         cast(cast(sum(ci*ci) OVER w0 AS BIGINT) AS DOUBLE) AS q0
  FROM ci
  WINDOW w1 AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {ind.SHIFT_N - 1} PRECEDING AND CURRENT ROW),
         w0 AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN {2 * ind.SHIFT_N - 1} PRECEDING
                         AND {ind.SHIFT_N} PRECEDING)
)
SELECT event_type, hr,
       s1 / {float(ind.SHIFT_N)} / 10000 AS mean_recent,
       s0 / {float(ind.SHIFT_N)} / 10000 AS mean_prior,
       round(CASE WHEN ((q1 - s1*s1/{float(ind.SHIFT_N)})
                        + (q0 - s0*s0/{float(ind.SHIFT_N)}))
                       / (2.0 * {float(ind.SHIFT_N)} - 2.0) > 0
             THEN (s1/{float(ind.SHIFT_N)} - s0/{float(ind.SHIFT_N)})
                  / sqrt(((q1 - s1*s1/{float(ind.SHIFT_N)})
                          + (q0 - s0*s0/{float(ind.SHIFT_N)}))
                         / (2.0 * {float(ind.SHIFT_N)} - 2.0)
                         * (2.0 / {float(ind.SHIFT_N)}))
             END, 6) AS shift_z,
       abs(round(CASE WHEN ((q1 - s1*s1/{float(ind.SHIFT_N)})
                            + (q0 - s0*s0/{float(ind.SHIFT_N)}))
                           / (2.0 * {float(ind.SHIFT_N)} - 2.0) > 0
                 THEN (s1/{float(ind.SHIFT_N)} - s0/{float(ind.SHIFT_N)})
                      / sqrt(((q1 - s1*s1/{float(ind.SHIFT_N)})
                              + (q0 - s0*s0/{float(ind.SHIFT_N)}))
                             / (2.0 * {float(ind.SHIFT_N)} - 2.0)
                             * (2.0 / {float(ind.SHIFT_N)}))
                 END, 6)) > 3.0 AS alert
FROM m
WHERE c1 = {ind.SHIFT_N} AND c0 = {ind.SHIFT_N}
ORDER BY event_type, hr
""")
def stock_mean_shift_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rolling two-sample mean-shift detector (CUSUM's window-expressible
    # cousin): 12-vs-12 bar z-statistic from exact integer window sums,
    # |z| > 3 flags a level change
    ev = load_table(spark, sf_dir, "events")
    return (ind.mean_shift_alerts(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("stock_forecast_eval", _BARS_CTE + f"""
, ci AS (SELECT event_type, hr,
                CAST(round(close * 10000, 0) AS BIGINT) AS ci
         FROM bars),
sc AS (SELECT event_type,
              abs(ci - lag(ci, {ind.SEASON_LAG}) OVER w) AS ae_s,
              abs(ci - lag(ci, 1) OVER w) AS ae_n,
              lag(ci, {ind.SEASON_LAG}) OVER w AS chk
       FROM ci
       WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
f AS (SELECT * FROM sc WHERE chk IS NOT NULL),
a AS (SELECT event_type, count(*)::BIGINT AS n_evals,
             CAST(sum(ae_s) AS BIGINT) AS ss,
             CAST(sum(ae_n) AS BIGINT) AS sn
      FROM f GROUP BY event_type)
SELECT event_type, n_evals,
       round(cast(ss AS DOUBLE) / n_evals / 10000, 6) AS mae_seasonal,
       round(cast(sn AS DOUBLE) / n_evals / 10000, 6) AS mae_naive,
       round(CASE WHEN sn > 0
                  THEN cast(ss AS DOUBLE) / cast(sn AS DOUBLE) END, 6)
           AS mase,
       round(CASE WHEN sn > 0
                  THEN cast(ss AS DOUBLE) / cast(sn AS DOUBLE) END, 6)
           < 1.0 AS seasonal_wins
FROM a ORDER BY event_type
""")
def stock_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # forecast-baseline eval: seasonal-naive vs naive MAE + MASE on the
    # 1e-4 integer price grid (exact error sums) — the scale-free gate
    # any forecasting model must beat
    ev = load_table(spark, sf_dir, "events")
    return ind.forecast_eval(ind.hourly_bars(ev))


@register("stock_temporal_split", _BARS_CTE + f"""
, hrs AS (SELECT DISTINCT hr FROM bars),
rk AS (SELECT hr, row_number() OVER (ORDER BY hr) AS r FROM hrs),
cut AS (SELECT hr AS boundary_hr FROM rk, (SELECT CAST(ceil(count(*) * 0.8)
             AS INT) AS c FROM hrs) t WHERE r = c + 1),
rows_ AS (SELECT event_type, hr,
                 lag(hr, {ind.LAG_K}) OVER w AS lagk,
                 lead(hr) OVER w AS label_hr
          FROM bars
          WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
m AS (SELECT * FROM rows_ WHERE lagk IS NOT NULL
                            AND label_hr IS NOT NULL)
SELECT event_type, boundary_hr,
       CAST(sum(CASE WHEN label_hr < boundary_hr THEN 1 ELSE 0 END)
            AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN NOT (label_hr < boundary_hr)
                      AND NOT (hr >= boundary_hr) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purged,
       CAST(sum(CASE WHEN hr >= boundary_hr THEN 1 ELSE 0 END)
            AS BIGINT) AS n_test
FROM m, cut
GROUP BY event_type, boundary_hr
ORDER BY event_type
""")
def stock_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # purged temporal train/test split accounting for the lag-feature
    # matrix: rows whose label crosses the boundary are PURGED (the
    # time-series CV embargo rule); pure rank/timestamp comparisons,
    # exact on any engine
    ev = load_table(spark, sf_dir, "events")
    return ind.temporal_split_audit(ind.hourly_bars(ev))


@register("stock_vwap_daily", """
WITH t AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(round(value * 100, 0) AS BIGINT)
           * json_extract_string(props, '$.k')::BIGINT AS pv_c,
         json_extract_string(props, '$.k')::BIGINT AS k
  FROM events
), a AS (
  SELECT event_type, day,
         CAST(sum(pv_c) AS BIGINT) AS pv_c,
         CAST(sum(k) AS BIGINT) AS total_qty,
         count(*) AS n_ticks
  FROM t GROUP BY event_type, day
)
SELECT event_type, day,
       CASE WHEN total_qty > 0 THEN
         CASE WHEN pv_c >= 0
              THEN CAST(floor((2 * (pv_c * 10000) + total_qty)
                              / (2 * total_qty)) AS BIGINT)
              ELSE -CAST(floor((2 * -(pv_c * 10000) + total_qty)
                               / (2 * total_qty)) AS BIGINT)
         END / 1000000.0
       END AS vwap,
       total_qty, n_ticks
FROM a ORDER BY event_type, day
""")
def stock_vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # daily VWAP per symbol with trade size from the props JSON tail;
    # price*size products stay on the 0.01 grid so the sums are exact
    # and the single division + round is engine-identical
    ev = load_table(spark, sf_dir, "events")
    return ind.vwap_daily(ev).orderBy("event_type", "day")


@register("stock_realized_vol", _BARS_CTE + """
, l AS (
  SELECT event_type, hr, open, high, low, close,
         CAST(date_trunc('day', hr) AS TIMESTAMP) AS day,
         lag(close) OVER (PARTITION BY event_type ORDER BY hr)
             AS prev_close,
         lag(CAST(date_trunc('day', hr) AS TIMESTAMP))
             OVER (PARTITION BY event_type ORDER BY hr) AS prev_day
  FROM bars WHERE low > 0
), q AS (
  SELECT event_type, day,
         CASE WHEN prev_day = day THEN
           CAST(round(ln(close / prev_close) * 1e6, 0) AS BIGINT)
         END AS r,
         CAST(round(ln(high / low) * 1e6, 0) AS BIGINT) AS lhl,
         CAST(round(ln(close / open) * 1e6, 0) AS BIGINT) AS lco
  FROM l
)
SELECT event_type, day,
       count(*) AS n_bars,
       CAST(count(r) AS BIGINT) AS n_ret,
       round(sqrt(CAST(sum(r * r) AS BIGINT)) / 1e6, 6) AS rv_cc,
       round(sqrt(CAST(sum(lhl * lhl) AS BIGINT)
                  / (2.772588722239781 * count(*))) / 1e6, 6) AS rv_park,
       round(sqrt(greatest(0.0,
                  (0.5 * CAST(sum(lhl * lhl) AS BIGINT)
                   - 0.3862943611198906 * CAST(sum(lco * lco) AS BIGINT))
                  / count(*))) / 1e6, 6) AS rv_gk
FROM q GROUP BY event_type, day
ORDER BY event_type, day
""")
def stock_realized_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    # daily realized-vol estimators (close-to-close, Parkinson,
    # Garman-Klass) from hourly bars; log terms quantized to 1e-6
    # integers BEFORE summation so the aggregates are exact BIGINTs
    ev = load_table(spark, sf_dir, "events")
    return (ind.realized_vol_daily(ind.hourly_bars(ev))
            .orderBy("event_type", "day"))


@register("stock_sharpe_sortino", _BARS_CTE + """
, l AS (
  SELECT event_type, hr, close,
         CAST(round(ln(close / lag(close) OVER (
                PARTITION BY event_type ORDER BY hr)) * 1e6, 0)
              AS BIGINT) AS r
  FROM bars WHERE low > 0
), f AS (SELECT * FROM l WHERE r IS NOT NULL),
a AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(r) AS BIGINT) AS s1,
         CAST(sum(r * r) AS BIGINT) AS s2,
         CAST(sum(CASE WHEN r < 0 THEN r * r ELSE 0 END) AS BIGINT)
             AS sneg2
  FROM f GROUP BY event_type
)
SELECT event_type, n,
       round(s1 / CAST(n AS DOUBLE) / 1e6, 6) AS mean_r,
       CASE WHEN n > 1 THEN
         round(sqrt(greatest(0.0, (s2 - s1 * s1 / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1))) / 1e6, 6) END AS vol,
       CASE WHEN n > 1
             AND greatest(0.0, (s2 - s1 * s1 / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1)) > 0.0 THEN
         round((s1 / CAST(n AS DOUBLE))
               / sqrt(greatest(0.0, (s2 - s1 * s1 / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1))), 6) END AS sharpe,
       CASE WHEN n > 1 AND sneg2 > 0 THEN
         round((s1 / CAST(n AS DOUBLE))
               / sqrt(sneg2 / (CAST(n AS DOUBLE) - 1)), 6) END AS sortino
FROM a ORDER BY event_type
""")
def stock_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-symbol Sharpe/Sortino over hourly log returns; 1e-6 integer
    # quantization makes Sum-R / Sum-R^2 / downside sums exact, and the
    # ratio arithmetic runs on those exact scalars in both engines
    ev = load_table(spark, sf_dir, "events")
    return (ind.sharpe_sortino(ind.hourly_bars(ev))
            .orderBy("event_type"))


@register("stock_var_es", _BARS_CTE + """
, l AS (
  SELECT event_type, hr, close,
         CAST(round(ln(close / lag(close) OVER (
                PARTITION BY event_type ORDER BY hr)) * 1e6, 0)
              AS BIGINT) AS r
  FROM bars WHERE low > 0
), f AS (SELECT event_type, r FROM l WHERE r IS NOT NULL),
q AS (SELECT event_type,
             CAST(round(quantile_cont(r, 0.05) * 20, 0) AS BIGINT)
                 AS var20,
             count(*) AS n
      FROM f GROUP BY event_type),
t AS (SELECT f.event_type, CAST(sum(f.r) AS BIGINT) AS ts_,
             count(*) AS tail_n
      FROM f JOIN q USING (event_type)
      WHERE f.r * 20 <= q.var20 GROUP BY f.event_type),
esx AS (SELECT event_type,
             CASE WHEN ts_ >= 0
                  THEN CAST(floor((2 * ts_ + tail_n)
                                  / (2 * tail_n)) AS BIGINT)
                  ELSE -CAST(floor((2 * -ts_ + tail_n)
                                   / (2 * tail_n)) AS BIGINT)
             END AS es_us, tail_n
      FROM t)
SELECT q.event_type, q.n,
       q.var20 / 20000000.0 AS var_95,
       esx.es_us / 1000000.0 AS es_95,
       esx.tail_n
FROM q JOIN esx USING (event_type) ORDER BY q.event_type
""")
def stock_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    # historical VaR(95) + Expected Shortfall per symbol: interpolated
    # 5% quantile of 1e-6-quantized hourly log returns, tail mean as an
    # exact integer sum / one division
    ev = load_table(spark, sf_dir, "events")
    return (ind.var_expected_shortfall(ind.hourly_bars(ev))
            .orderBy("event_type"))


@register("stock_amihud_illiquidity", """
WITH t AS (
  SELECT event_type, ts, event_id, value,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(round(value * 100, 0) AS BIGINT)
           * json_extract_string(props, '$.k')::BIGINT AS dv
  FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type, day
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM t
), d AS (
  SELECT event_type, day,
         max(CASE WHEN rn = 1 THEN value END) AS close,
         CAST(sum(dv) AS BIGINT) AS dv_cents
  FROM r GROUP BY event_type, day
), l AS (
  SELECT event_type, day, dv_cents, close,
         lag(close) OVER (PARTITION BY event_type ORDER BY day) AS pc
  FROM d
), q AS (
  SELECT event_type, dv_cents,
         CAST(round(ln(close / pc) * 1e6, 0) AS BIGINT) AS rr
  FROM l WHERE close > 0 AND pc > 0 AND dv_cents > 0
), g AS (
  SELECT event_type,
         CAST(floor((2 * (abs(rr) * 10000 * 1000000) + dv_cents)
                    / (2 * dv_cents)) AS BIGINT) AS ratio_e10
  FROM q
), a AS (
  SELECT event_type, CAST(sum(ratio_e10) AS BIGINT) AS rs,
         count(*) AS n_days
  FROM g GROUP BY event_type
)
SELECT event_type, n_days,
       CAST(floor((2 * rs + n_days) / (2 * n_days)) AS BIGINT)
         / 10000000000.0 AS illiq
FROM a ORDER BY event_type
""")
def stock_amihud_illiquidity(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    # Amihud price-impact proxy: mean over days of |daily log return| /
    # dollar volume, all divisions via integer half-away rounding
    # (operators/indicators.amihud_illiquidity)
    ev = load_table(spark, sf_dir, "events")
    return ind.amihud_illiquidity(ev)


@register("stock_order_flow_imbalance", """
WITH s AS (
  SELECT event_type, ts, event_id,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
         CASE WHEN value - lag(value) OVER w > 0 THEN 1
              WHEN value - lag(value) OVER w < 0 THEN -1 END AS raw_sign
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), c AS (
  SELECT event_type, hr,
         last_value(raw_sign IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sign
  FROM s
), a AS (
  SELECT event_type, hr,
         CAST(sum(CASE WHEN sign = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS buys,
         CAST(sum(CASE WHEN sign = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS sells
  FROM c WHERE sign IS NOT NULL
  GROUP BY event_type, hr
)
SELECT event_type, hr, buys, sells,
       CASE WHEN buys - sells >= 0
            THEN CAST(floor((2 * ((buys - sells) * 1000000)
                             + (buys + sells))
                            / (2 * (buys + sells))) AS BIGINT)
            ELSE -CAST(floor((2 * -((buys - sells) * 1000000)
                              + (buys + sells))
                             / (2 * (buys + sells))) AS BIGINT)
       END / 1000000.0 AS ofi
FROM a ORDER BY event_type, hr
""")
def stock_order_flow_imbalance(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    # tick-rule buy/sell classification (zero ticks carry the last
    # nonzero sign) -> hourly order-flow imbalance; one half-away
    # division per bar (operators/indicators.order_flow_imbalance)
    ev = load_table(spark, sf_dir, "events")
    return (ind.order_flow_imbalance(ev)
            .orderBy("event_type", "hr"))


@register("stock_riskmetrics_vol", _BARS_CTE + f"""
, l AS (
  SELECT event_type, hr,
         CAST(round(ln(close / lag(close) OVER (
                PARTITION BY event_type ORDER BY hr)) * 1e6, 0)
              AS BIGINT) AS r
  FROM bars WHERE low > 0
), rb AS (
  SELECT event_type, hr, r,
         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS rn
  FROM l WHERE r IS NOT NULL
), pb AS (
  SELECT *, (rn - 1) // {ind.RM_LOOKBACK} AS band FROM rb
), cb AS (
  SELECT event_type, hr, rn,
         unnest([(rn - 1) // {ind.RM_LOOKBACK},
                 (rn - 1) // {ind.RM_LOOKBACK} - 1]) AS probe
  FROM rb
)
SELECT cur.event_type, cur.hr,
       round(sqrt(sum(prev.r * prev.r
                      * pow({ind.RM_DECAY}, cur.rn - prev.rn))
                  / sum(pow({ind.RM_DECAY}, cur.rn - prev.rn)))
             / 1e6, 6) AS rm_vol
FROM cb cur JOIN pb prev
  ON cur.event_type = prev.event_type
 AND cur.probe = prev.band
 AND prev.rn > cur.rn - {ind.RM_LOOKBACK}
 AND prev.rn <= cur.rn
GROUP BY cur.event_type, cur.hr
ORDER BY cur.event_type, cur.hr
""")
def stock_riskmetrics_vol(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EWMA variance (RiskMetrics lambda=0.9, truncated at 120 bars)
    # via the BANDED rank join — O(lookback) probe work per bar
    ev = load_table(spark, sf_dir, "events")
    return (ind.riskmetrics_vol(ind.hourly_bars(ev))
            .orderBy("event_type", "hr"))


@register("streaming_vwap_bars", """
WITH t AS (
  SELECT event_type,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
         CAST(round(value * 100, 0) AS BIGINT)
           * json_extract_string(props, '$.k')::BIGINT AS pv_c,
         json_extract_string(props, '$.k')::BIGINT AS k
  FROM events
), a AS (
  SELECT hr, event_type,
         CAST(sum(pv_c) AS BIGINT) AS pv_c,
         CAST(sum(k) AS BIGINT) AS total_qty,
         count(*) AS n_ticks
  FROM t GROUP BY hr, event_type
)
SELECT hr, event_type,
       CASE WHEN total_qty > 0 THEN
         CASE WHEN pv_c >= 0
              THEN CAST(floor((2 * (pv_c * 10000) + total_qty)
                              / (2 * total_qty)) AS BIGINT)
              ELSE -CAST(floor((2 * -(pv_c * 10000) + total_qty)
                               / (2 * total_qty)) AS BIGINT)
         END / 1000000.0
       END AS vwap,
       total_qty, n_ticks
FROM a ORDER BY event_type, hr
""")
def streaming_vwap_bars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hourly VWAP produced by a real Structured Streaming query (the
    # VWAP monoid: two partial sums per watermarked window), checked
    # against the identical batch SQL
    import os
    from ..streaming.events import streaming_vwap_bars
    return streaming_vwap_bars(
        spark, os.path.join(sf_dir, "events.parquet"))


@register("stock_dow_effects", """
WITH t AS (
  SELECT event_type, ts, event_id, value,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type, day
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM t
), d AS (
  SELECT event_type, day,
         max(CASE WHEN rn = 1 THEN value END) AS close
  FROM r GROUP BY event_type, day
), l AS (
  SELECT event_type, day, close,
         lag(close) OVER (PARTITION BY event_type ORDER BY day) AS pc
  FROM d
), q AS (
  SELECT event_type,
         CAST(dayofweek(day) AS BIGINT) AS dow,
         CAST(round(ln(close / pc) * 1e6, 0) AS BIGINT) AS r
  FROM l WHERE close > 0 AND pc > 0
)
SELECT event_type, dow, count(*) AS n_days,
       CASE WHEN sum(r) >= 0
            THEN CAST(floor((2 * (CAST(sum(r) AS BIGINT) * 1) + count(*))
                            / (2 * count(*))) AS BIGINT)
            ELSE -CAST(floor((2 * -(CAST(sum(r) AS BIGINT) * 1)
                              + count(*)) / (2 * count(*))) AS BIGINT)
       END / 1000000.0 AS mean_ret
FROM q GROUP BY event_type, dow
ORDER BY event_type, dow
""")
def stock_dow_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    # day-of-week return profile per symbol (calendar-effect scan):
    # daily closes, per-(symbol, dow) half-away mean of 1e-6 returns.
    # Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is 0=Sunday..6 —
    # normalized to the DuckDB convention
    from pyspark.sql import Window

    from ..operators.windows import int_mean_half_away
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    w_d = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    base = (ev.select("event_type", "ts", "event_id", "value",
                      day.alias("day"))
            .withColumn("rn", F.row_number().over(w_d)))
    daily = (base.groupBy("event_type", "day")
             .agg(F.max(F.when(F.col("rn") == 1, F.col("value")))
                  .alias("close")))
    w = Window.partitionBy("event_type").orderBy("day")
    pc = F.lag("close").over(w)
    q = (daily.select(
        "event_type", "day", "close", pc.alias("pc"))
        .filter((F.col("close") > 0) & (F.col("pc") > 0))
        .select("event_type",
                (F.dayofweek("day") - 1).cast("long").alias("dow"),
                F.round(F.log(F.col("close") / F.col("pc")) * 1e6, 0)
                .cast("long").alias("r")))
    agg = (q.groupBy("event_type", "dow")
           .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                F.sum("r").cast("long").alias("sr")))
    mean = int_mean_half_away(F.col("sr"), F.col("n_days"))
    return (agg.select("event_type", "dow", "n_days",
                       (mean / F.lit(1e6)).alias("mean_ret"))
            .orderBy("event_type", "dow"))
