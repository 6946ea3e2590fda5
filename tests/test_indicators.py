"""Semantic pins for the stock-indicator operators (operators/
indicators.py) on a tiny hand-built tick series, independent of the
DuckDB oracle gate: OHLC tie-breaks, Bollinger band algebra, RSI
boundary cases (all-gain -> 100), EWMA truncation vs the exact
recurrence, LOCF density/gap flags, drawdown sign."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.operators import indicators as ind


def _ts(h: int, m: int = 0, s: int = 0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def ticks(spark):
    rows = [
        # hour 0 of A: open is the (ts, event_id) minimum -> value 10
        Row(event_type="A", ts=_ts(0, 5), event_id=2, value=11.0),
        Row(event_type="A", ts=_ts(0, 5), event_id=1, value=10.0),
        Row(event_type="A", ts=_ts(0, 50), event_id=3, value=14.0),
        # hour 1 of A: single tick
        Row(event_type="A", ts=_ts(1, 0), event_id=4, value=12.0),
        # hour 2 of A: strictly rising within the hour
        Row(event_type="A", ts=_ts(2, 10), event_id=5, value=13.0),
        Row(event_type="A", ts=_ts(2, 20), event_id=6, value=15.0),
        # B: one tick per hour, strictly rising (all-gain RSI)
        Row(event_type="B", ts=_ts(0), event_id=7, value=1.0),
        Row(event_type="B", ts=_ts(1), event_id=8, value=2.0),
        Row(event_type="B", ts=_ts(2), event_id=9, value=3.0),
        # C: gap at hour 1 (for LOCF), then a crash (for drawdown)
        Row(event_type="C", ts=_ts(0), event_id=10, value=100.0),
        Row(event_type="C", ts=_ts(2), event_id=11, value=25.0),
    ]
    return spark.createDataFrame(rows)


def test_ohlc_tie_break_and_bounds(ticks):
    bars = {(r["event_type"], r["hr"].hour): r
            for r in ind.hourly_bars(ticks).collect()}
    a0 = bars[("A", 0)]
    # open tie-broken by event_id at equal ts; close is the latest tick
    assert a0["open"] == 10.0 and a0["close"] == 14.0
    assert a0["low"] == 10.0 and a0["high"] == 14.0 and a0["volume"] == 3
    a1 = bars[("A", 1)]
    assert (a1["open"] == a1["close"] == a1["low"] == a1["high"] == 12.0
            and a1["volume"] == 1)
    assert bars[("A", 2)]["open"] == 13.0 and bars[("A", 2)]["close"] == 15.0


def test_bollinger_band_algebra(ticks):
    rows = ind.bollinger(ind.hourly_bars(ticks)).collect()
    for r in rows:
        if r["upper_band"] is None:  # 1-bar window: stddev_samp is NULL
            continue
        assert r["upper_band"] >= r["ma"] >= r["lower_band"]
        assert r["breakout_up"] == (r["close"] > r["upper_band"])
        assert r["breakout_down"] == (r["close"] < r["lower_band"])


def test_rsi_all_gain_pins_to_100(ticks):
    rows = {(r["event_type"], r["hr"].hour): r["rsi"]
            for r in ind.rsi(ind.hourly_bars(ticks)).collect()}
    # B rises every bar -> avg loss exactly 0 -> RSI exactly 100
    assert rows[("B", 1)] == 100.0 and rows[("B", 2)] == 100.0
    # first bar of a symbol has no delta -> NULL
    assert rows[("B", 0)] is None and rows[("A", 0)] is None


def test_ewma_matches_exact_recurrence(ticks):
    out = {(r["event_type"], r["hr"].hour): r["ewma"]
           for r in ind.ewma_trend(ind.hourly_bars(ticks)).collect()}
    # closes of A by hour: 14, 12, 15 — exact truncated-EWMA by hand
    d = ind.EWMA_DECAY
    for hour, closes in [(0, [14.0]), (1, [14.0, 12.0]),
                         (2, [14.0, 12.0, 15.0])]:
        wts = [d ** (len(closes) - 1 - i) for i in range(len(closes))]
        exact = sum(c * w for c, w in zip(closes, wts)) / sum(wts)
        assert math.isclose(out[("A", hour)], round(exact, 6),
                            abs_tol=1e-6)


def test_banded_rank_join_equals_naive_range_join(spark):
    """banded_rank_join must produce EXACTLY the naive rank-range join's
    pair set across band boundaries (rn at multiples of width, first
    band's empty b-1 probe, key isolation). 2 keys x 23 rows, width 7 —
    ranks cross three band edges."""
    from stock_data_etl_pipeline_spark.operators.windows import (
        banded_rank_join)

    width = 7
    df = spark.createDataFrame(
        [Row(k=k, rn=i, v=float(10 * i)) for k in ("x", "y")
         for i in range(1, 24)])
    banded = {(r["ck"], r["crn"], r["prn"]) for r in banded_rank_join(
        df, ["k"], "rn", width).select(
            F.col("cur.k").alias("ck"), F.col("cur.rn").alias("crn"),
            F.col("prev.rn").alias("prn")).collect()}
    naive = {(k, c, p) for k in ("x", "y") for c in range(1, 24)
             for p in range(1, 24) if c - width < p <= c}
    assert banded == naive


def test_ewma_long_series_matches_exact_recurrence(spark):
    """EWMA over a series LONGER than the lookback band (90 bars vs
    L=40): the banded join must stitch bands b/b-1 correctly so every
    bar still sees exactly its trailing-L window."""
    rows = [Row(event_type="Z", ts=_ts(0) + dt.timedelta(hours=i),
                event_id=i, value=100.0 + math.sin(i) * 7) for i in
            range(90)]
    out = {r["hr"]: r["ewma"] for r in
           ind.ewma_trend(ind.hourly_bars(spark.createDataFrame(rows)))
           .collect()}
    closes = [100.0 + math.sin(i) * 7 for i in range(90)]
    d, L = ind.EWMA_DECAY, ind.EWMA_LOOKBACK
    for t in (0, 39, 40, 41, 79, 80, 89):  # band edges + interior
        window = closes[max(0, t - L + 1):t + 1]
        wts = [d ** (len(window) - 1 - i) for i in range(len(window))]
        exact = sum(c * w for c, w in zip(window, wts)) / sum(wts)
        got = out[_ts(0) + dt.timedelta(hours=t)]
        assert math.isclose(got, round(exact, 6), abs_tol=2e-6), (t, got)


def test_locf_fills_gaps_on_dense_grid(ticks):
    rows = {(r["event_type"], r["hr"].hour): r
            for r in ind.locf_fill(ind.hourly_bars(ticks)).collect()}
    # grid is dense: every symbol has all 3 hours
    assert len(rows) == 9
    # C has no hour-1 bar: gap=True, close carried from hour 0
    c1 = rows[("C", 1)]
    assert c1["gap"] and c1["close_filled"] == 100.0
    assert not rows[("C", 0)]["gap"] and not rows[("C", 2)]["gap"]
    assert rows[("C", 2)]["close_filled"] == 25.0


def test_max_drawdown_sign_and_value(ticks):
    out = {r["event_type"]: r for r in
           ind.max_drawdown(ind.hourly_bars(ticks)).collect()}
    # C: peak 100 -> trough 25 = -75%
    assert out["C"]["max_drawdown"] == -0.75
    # B strictly rises: drawdown never below 0
    assert out["B"]["max_drawdown"] == 0.0
    assert out["A"]["n_bars"] == 3


def test_rolling_corr_perfect_on_linear_series(spark):
    # x and y perfectly linearly related -> corr exactly 1 after round
    rows = [Row(event_type=t, ts=_ts(h), event_id=h * 10 + i,
                value=float(v))
            for h in range(4)
            for i, (t, v) in enumerate(
                [("purchase", 10 + 2 * h), ("view", 5 + h)])]
    bars = ind.hourly_bars(spark.createDataFrame(rows))
    out = ind.rolling_corr(bars, "purchase", "view").collect()
    assert len(out) == 4
    assert out[0]["corr_24h"] is None  # 1-point window: den == 0
    for r in out[1:]:
        assert r["corr_24h"] == 1.0


def test_atr_true_range_cases(ticks):
    rows = {(r["event_type"], r["hr"].hour): r
            for r in ind.atr(ind.hourly_bars(ticks)).collect()}
    # first bar per symbol: no prev close -> NULL TR and NULL ATR
    assert rows[("A", 0)]["true_range"] is None
    assert rows[("A", 0)]["atr"] is None
    # A hour1: high=low=close=12, prev close 14 -> TR = |12-14| = 2
    assert rows[("A", 1)]["true_range"] == 2.0
    # A hour2: high 15 low 13, prev close 12 -> max(2, 3, 1) = 3
    assert rows[("A", 2)]["true_range"] == 3.0
    # ATR at hour2 = mean(2, 3); NULL first bar excluded
    assert rows[("A", 2)]["atr"] == 2.5


def test_cov_matrix_symmetry_and_variance(ticks):
    out = {(r["sym_a"], r["sym_b"]): r
           for r in ind.cov_matrix(ind.hourly_bars(ticks)).collect()}
    # symmetric, all ordered pairs present (3 symbols -> 9 pairs)
    assert len(out) == 9
    for (a, b), r in out.items():
        assert r["cov"] == out[(b, a)]["cov"]
    # diagonal = sample variance; B closes 1,2,3 -> var exactly 1
    assert out[("B", "B")]["cov"] == 1.0
    # co-observation counts: A and B share all 3 hours
    assert out[("A", "B")]["n_obs"] == 3


def test_lag_features_dense_matrix(spark):
    # one symbol, closes 1..8 -> with k=2: rows where lag_2 and the
    # next-close label both exist
    rows = [Row(event_type="X", ts=_ts(h), event_id=h, value=float(h + 1))
            for h in range(8)]
    out = ind.lag_features(ind.hourly_bars(spark.createDataFrame(rows)),
                           k=2).collect()
    # bars 0..7 (closes 1..8): need lag_2 (bar>=2) and lead (bar<=6)
    assert len(out) == 5
    by_close = {r["close"]: r for r in out}
    r = by_close[4.0]  # bar 3
    assert r["lag_1"] == 3.0 and r["lag_2"] == 2.0
    assert r["label_next_close"] == 5.0
    assert r["mean_2"] == 3.5  # mean(3, 4)


def test_momentum_backtest_long_rising_series(spark):
    # strictly rising closes -> fast MA >= slow MA, long position,
    # every in-market bar wins
    rows = [Row(event_type="X", ts=_ts(h), event_id=h,
                value=float(10 + h))
            for h in range(24)]
    out = ind.momentum_backtest(
        ind.hourly_bars(spark.createDataFrame(rows))).collect()
    assert len(out) == 1
    r = out[0]
    assert r["total_pnl"] > 0
    assert r["winning_bars"] == r["bars_in_market"] > 0
    assert r["n_bars"] == 23  # first bar has no position/return


def test_beta_alpha_single_symbol_market(spark):
    # with ONE symbol the market return IS the symbol's return
    # (quantized), so beta pins to 1 and alpha to 0
    rows = [Row(event_type="S", ts=_ts(h), event_id=h, value=float(v))
            for h, v in enumerate([100.0, 101.0, 99.5, 102.0, 103.5,
                                   102.8, 104.0, 105.5])]
    out = ind.beta_alpha(ind.hourly_bars(spark.createDataFrame(rows))) \
             .collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_obs"] == 7
    assert r["beta"] == pytest.approx(1.0, abs=1e-6)
    assert r["alpha"] == pytest.approx(0.0, abs=1e-6)
    assert r["vol_annual"] > 0 and r["sharpe_annual"] is not None


def test_beta_alpha_leveraged_symbol(spark):
    # Y's log-returns are exactly 2x X's -> market is 1.5x X,
    # beta_X = 2/3, beta_Y = 4/3; vol_Y = 2 * vol_X
    import math as m
    xs = [100.0]
    for d in [0.01, -0.02, 0.015, 0.03, -0.01, 0.02, -0.005]:
        xs.append(xs[-1] * m.exp(d))
    rows = []
    for h, v in enumerate(xs):
        rows.append(Row(event_type="X", ts=_ts(h), event_id=2 * h,
                        value=v))
        rows.append(Row(event_type="Y", ts=_ts(h), event_id=2 * h + 1,
                        value=100.0 * (v / 100.0) ** 2))
    out = {r["event_type"]: r for r in
           ind.beta_alpha(ind.hourly_bars(spark.createDataFrame(rows)))
           .collect()}
    assert out["X"]["beta"] == pytest.approx(2 / 3, abs=1e-4)
    assert out["Y"]["beta"] == pytest.approx(4 / 3, abs=1e-4)
    assert out["Y"]["vol_annual"] == pytest.approx(
        2 * out["X"]["vol_annual"], rel=1e-3)


def test_beta_alpha_skips_nonpositive_prices(spark):
    # a zero close yields no return on either side of it
    rows = [Row(event_type="Z", ts=_ts(h), event_id=h, value=v)
            for h, v in enumerate([10.0, 0.0, 12.0, 13.0])]
    out = ind.beta_alpha(ind.hourly_bars(spark.createDataFrame(rows))) \
             .collect()
    assert out[0]["n_obs"] == 1  # only the 12 -> 13 transition survives


def test_pairs_zscore_constant_hedged_spread(spark):
    # y = x/2 exactly -> hedge ratio 2... no: regress x on y gives
    # beta_h = 2, spread == 0 everywhere, z null (zero variance)
    rows = []
    xs = [100.0, 102.0, 101.0, 104.0, 103.0, 106.0]
    for h, v in enumerate(xs):
        rows.append(Row(event_type="purchase", ts=_ts(h),
                        event_id=2 * h, value=v))
        rows.append(Row(event_type="view", ts=_ts(h),
                        event_id=2 * h + 1, value=v / 2.0))
    out = ind.pairs_zscore(ind.hourly_bars(spark.createDataFrame(rows)),
                           "purchase", "view").collect()
    assert len(out) == len(xs)
    for r in out:
        assert r["beta_h"] == pytest.approx(2.0, abs=1e-6)
        assert r["spread"] == pytest.approx(0.0, abs=1e-4)
        assert r["z_24h"] is None  # zero-variance spread
    # divergence: bump the last x away from the hedge relation
    rows[-2] = Row(event_type="purchase", ts=_ts(len(xs) - 1),
                   event_id=2 * (len(xs) - 1), value=xs[-1] + 5.0)
    out2 = ind.pairs_zscore(ind.hourly_bars(spark.createDataFrame(rows)),
                            "purchase", "view").orderBy("hr").collect()
    assert out2[-1]["z_24h"] is not None and out2[-1]["z_24h"] > 1.0


def test_mean_shift_alert_fires_on_level_jump(spark):
    # 12 flat bars at 100, then 12 flat-ish bars at 110 with tiny noise
    # (pooled variance must be nonzero for a finite z): the last rows
    # compare an all-110 recent window against an all-100 prior window
    vals = [100.0] * 12 + [110.0 + (0.001 * (i % 3)) for i in range(12)]
    # spread over two days to get 24 distinct hourly bars
    rows = [Row(event_type="J",
                ts=dt.datetime(2024, 1, 1 + h // 24, h % 24),
                event_id=h, value=v)
            for h, v in enumerate(vals)]
    out = (ind.mean_shift_alerts(ind.hourly_bars(
        spark.createDataFrame(rows))).orderBy("hr").collect())
    # only bars with two full 12-bar windows survive: bars 23.. -> 1 row
    assert len(out) == 1
    r = out[0]
    assert r["mean_prior"] == pytest.approx(100.0, abs=1e-3)
    assert r["mean_recent"] == pytest.approx(110.0, abs=0.01)
    assert r["alert"] and r["shift_z"] > 3


def test_mean_shift_zero_variance_yields_null_z(spark):
    # perfectly constant series: pooled variance 0 -> z null, no alert
    rows = [Row(event_type="K", ts=dt.datetime(2024, 1, 1 + h // 24,
                                               h % 24),
                event_id=h, value=50.0) for h in range(24)]
    out = (ind.mean_shift_alerts(ind.hourly_bars(
        spark.createDataFrame(rows))).collect())
    assert len(out) == 1
    assert out[0]["shift_z"] is None and out[0]["alert"] is None


def test_forecast_eval_perfect_seasonality_wins(spark):
    # period-3 cycle repeated: seasonal predictor (lag 3) is exact,
    # naive (lag 1) always misses -> mase == 0, seasonal wins
    cycle = [100.0, 110.0, 120.0]
    rows = [Row(event_type="C3", ts=dt.datetime(2024, 1, 1 + h // 24,
                                                h % 24),
                event_id=h, value=cycle[h % 3]) for h in range(12)]
    out = ind.forecast_eval(
        ind.hourly_bars(spark.createDataFrame(rows)), season=3).collect()
    r = out[0]
    assert r["n_evals"] == 9
    # naive errors cycle (|110-100|, |120-110|, |100-120|) -> avg 40/3
    assert r["mae_seasonal"] == 0.0
    assert r["mae_naive"] == pytest.approx(40 / 3, abs=1e-5)
    assert r["mase"] == 0.0 and r["seasonal_wins"]


def test_temporal_split_purges_boundary_crossers(spark):
    # one symbol, 20 hourly bars, k=2: matrix rows are bars 2..18.
    # 20 distinct hours -> cut = ceil(16)=16 -> boundary = 17th hour
    # (index 16). train: label_hr < boundary -> bars 2..14 (label at
    # bar+1 <= 15 < 16). purged: bar 15 (label 16 crosses). test: bars
    # 16..18.
    rows = [Row(event_type="T", ts=dt.datetime(2024, 1, 1 + h // 24,
                                               h % 24),
                event_id=h, value=float(h))
            for h in range(20)]
    out = ind.temporal_split_audit(
        ind.hourly_bars(spark.createDataFrame(rows)), k=2).collect()
    r = out[0]
    assert r["boundary_hr"].hour == 16
    assert r["n_train"] == 13 and r["n_purged"] == 1 and r["n_test"] == 3
    # invariant: every matrix row lands in exactly one class
    assert r["n_train"] + r["n_purged"] + r["n_test"] == 17


def test_vwap_daily_weighting_and_zero_qty_day(spark):
    rows = [
        # day 1: vwap = (10*1 + 20*3) / 4 = 17.5
        Row(event_type="A", ts=_ts(1), event_id=1, value=10.0,
            props='{"k": 1}'),
        Row(event_type="A", ts=_ts(2), event_id=2, value=20.0,
            props='{"k": 3}'),
        # day 2 (A): all-zero quantity -> NULL vwap, qty 0, 1 tick
        Row(event_type="A", ts=_ts(1) + dt.timedelta(days=1), event_id=3,
            value=50.0, props='{"k": 0}'),
    ]
    out = {r["day"].day: r for r in
           ind.vwap_daily(spark.createDataFrame(rows)).collect()}
    assert out[1]["vwap"] == 17.5 and out[1]["total_qty"] == 4
    assert out[1]["n_ticks"] == 2
    assert out[2]["vwap"] is None and out[2]["total_qty"] == 0


def test_realized_vol_constant_price_is_zero(spark):
    rows = [Row(event_type="A", ts=_ts(0) + dt.timedelta(hours=i),
                event_id=i, value=100.0) for i in range(30)]
    out = ind.realized_vol_daily(
        ind.hourly_bars(spark.createDataFrame(rows))).collect()
    for r in out:
        assert r["rv_cc"] in (0.0, None)  # day's first bar may lack a ret
        assert r["rv_park"] == 0.0 and r["rv_gk"] == 0.0


def test_realized_vol_two_bar_day_matches_hand_calc(spark):
    rows = [Row(event_type="A", ts=_ts(1), event_id=1, value=100.0),
            Row(event_type="A", ts=_ts(2), event_id=2, value=110.0)]
    (r,) = ind.realized_vol_daily(
        ind.hourly_bars(spark.createDataFrame(rows))).collect()
    ret_us = round(math.log(110.0 / 100.0) * 1e6)
    assert r["n_bars"] == 2 and r["n_ret"] == 1
    assert math.isclose(r["rv_cc"], round(abs(ret_us) / 1e6, 6),
                        abs_tol=1e-9)
    assert r["rv_park"] == 0.0  # single-tick bars: high == low


def test_realized_vol_drops_nonpositive_bars(spark):
    rows = [Row(event_type="A", ts=_ts(1), event_id=1, value=0.0),
            Row(event_type="A", ts=_ts(2), event_id=2, value=100.0)]
    (r,) = ind.realized_vol_daily(
        ind.hourly_bars(spark.createDataFrame(rows))).collect()
    assert r["n_bars"] == 1 and r["n_ret"] == 0 and r["rv_cc"] is None


def test_sharpe_sortino_rising_series_has_null_sortino(spark):
    rows = [Row(event_type="A", ts=_ts(0) + dt.timedelta(hours=i),
                event_id=i, value=100.0 * (1.01 ** i)) for i in range(10)]
    (r,) = ind.sharpe_sortino(
        ind.hourly_bars(spark.createDataFrame(rows))).collect()
    assert r["n"] == 9 and r["mean_r"] > 0
    # strictly rising: no downside squares -> sortino NULL; constant
    # 1% log-return means ~zero variance -> sharpe NULL or huge
    assert r["sortino"] is None


def test_sharpe_sortino_hand_moments(spark):
    closes = [100.0, 110.0, 99.0, 105.0, 101.0]
    rows = [Row(event_type="A", ts=_ts(0) + dt.timedelta(hours=i),
                event_id=i, value=c) for i, c in enumerate(closes)]
    (r,) = ind.sharpe_sortino(
        ind.hourly_bars(spark.createDataFrame(rows))).collect()
    rus = [round(math.log(b / a) * 1e6)
           for a, b in zip(closes, closes[1:])]
    n, s1 = len(rus), sum(rus)
    s2 = sum(x * x for x in rus)
    sneg2 = sum(x * x for x in rus if x < 0)
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    assert r["n"] == n
    assert math.isclose(r["mean_r"], round(mean / 1e6, 6), abs_tol=1e-9)
    assert math.isclose(r["sharpe"], round(mean / math.sqrt(var), 6),
                        abs_tol=1e-6)
    assert math.isclose(
        r["sortino"], round(mean / math.sqrt(sneg2 / (n - 1)), 6),
        abs_tol=1e-6)


def test_var_es_python_replica(spark):
    # 40 hourly bars with varied returns; replicate quantile_cont +
    # tail mean with integer half-away rounding exactly
    closes = [100.0]
    for i in range(1, 40):
        closes.append(round(closes[-1] * (1 + ((i * 13) % 11 - 5) / 200.0),
                            2))
    rows = [Row(event_type="A", ts=_ts(0) + dt.timedelta(hours=i),
                event_id=i, value=c) for i, c in enumerate(closes)]
    (r,) = ind.var_expected_shortfall(
        ind.hourly_bars(spark.createDataFrame(rows))).collect()
    rus = sorted(round(math.log(b / a) * 1e6)
                 for a, b in zip(closes, closes[1:]))
    n = len(rus)
    pos = 0.05 * (n - 1)
    lo = int(pos)
    var_us = rus[lo] + (pos - lo) * (rus[lo + 1] - rus[lo])
    var20 = round(var_us * 20)
    tail = [x for x in rus if x * 20 <= var20]
    s, tn = sum(tail), len(tail)
    es_us = (math.floor((2 * s + tn) / (2 * tn)) if s >= 0
             else -math.floor((2 * -s + tn) / (2 * tn)))
    assert r["n"] == n and r["tail_n"] == tn
    assert r["var_95"] == var20 / 20000000.0
    assert r["es_95"] == es_us / 1000000.0
    assert r["es_95"] <= r["var_95"]  # ES at least as severe as VaR


def test_amihud_illiquidity_hand_calc(spark):
    import json
    # symbol A: 2 ticks/day over 3 days; constant k=10
    closes = [100.0, 110.0, 99.0]
    rows = []
    eid = 0
    for day, c in enumerate(closes):
        for j, v in enumerate([c - 1.0, c]):  # last tick of day = close
            eid += 1
            rows.append(Row(event_type="A",
                            ts=_ts(0) + dt.timedelta(days=day, hours=j),
                            event_id=eid, value=v,
                            props=json.dumps({"k": 10})))
    (r,) = ind.amihud_illiquidity(
        spark.createDataFrame(rows)).collect()
    assert r["n_days"] == 2  # first day has no return

    def day_ratio(prev_c, c, ticks):
        rr = abs(round(math.log(c / prev_c) * 1e6))
        dv = sum(round(v * 100) * 10 for v in ticks)
        return math.floor((2 * (rr * 10**10) + dv) / (2 * dv))

    r1 = day_ratio(100.0, 110.0, [109.0, 110.0])
    r2 = day_ratio(110.0, 99.0, [98.0, 99.0])
    rs, n = r1 + r2, 2
    want = math.floor((2 * rs + n) / (2 * n)) / 1e10
    assert r["illiq"] == want


def test_order_flow_imbalance_tick_rule(spark):
    # prices: 10 -> 11 (+) -> 11 (0, carries +) -> 9 (-) -> 9 (0, -)
    vals = [10.0, 11.0, 11.0, 9.0, 9.0]
    rows = [Row(event_type="A", ts=_ts(0, i), event_id=i, value=v)
            for i, v in enumerate(vals)]
    (r,) = ind.order_flow_imbalance(
        spark.createDataFrame(rows)).collect()
    # first tick unsigned/excluded; buys=2 (the + and its carry),
    # sells=2 (the - and its carry)
    assert r["buys"] == 2 and r["sells"] == 2 and r["ofi"] == 0.0


def test_order_flow_imbalance_all_up(spark):
    rows = [Row(event_type="A", ts=_ts(0, i), event_id=i,
                value=10.0 + i) for i in range(4)]
    (r,) = ind.order_flow_imbalance(
        spark.createDataFrame(rows)).collect()
    assert r["buys"] == 3 and r["sells"] == 0 and r["ofi"] == 1.0


def test_riskmetrics_vol_constant_and_recurrence(spark):
    rows = [Row(event_type="A", ts=_ts(0) + dt.timedelta(hours=i),
                event_id=i, value=100.0) for i in range(10)]
    out = ind.riskmetrics_vol(
        ind.hourly_bars(spark.createDataFrame(rows))).collect()
    assert all(r["rm_vol"] == 0.0 for r in out)  # zero returns

    closes = [100.0, 105.0, 98.0, 103.0]
    rows2 = [Row(event_type="B", ts=_ts(0) + dt.timedelta(hours=i),
                 event_id=i, value=c) for i, c in enumerate(closes)]
    got = {r["hr"].hour: r["rm_vol"] for r in ind.riskmetrics_vol(
        ind.hourly_bars(spark.createDataFrame(rows2))).collect()}
    rus = [round(math.log(b / a) * 1e6) for a, b in
           zip(closes, closes[1:])]
    lam = ind.RM_DECAY
    for t in range(len(rus)):
        wts = [lam ** (t - i) for i in range(t + 1)]
        want = round(math.sqrt(
            sum(r * r * w for r, w in zip(rus[:t + 1], wts))
            / sum(wts)) / 1e6, 6)
        assert math.isclose(got[t + 1], want, abs_tol=2e-6)
