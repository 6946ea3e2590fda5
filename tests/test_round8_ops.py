"""Hand-computed fixtures for the round-8 operators: stock
microstructure/trend indicators, graph assortativity, corpus
containment/vocab-growth, event bursts, ANN bucket balance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.operators import indicators as ind

T0 = dt.datetime(2024, 1, 1)


def _bars(spark, rows):
    # rows: (symbol, hour_offset, open, high, low, close, volume)
    return spark.createDataFrame(
        [(s, T0 + dt.timedelta(hours=h), float(o), float(hi), float(lo),
          float(c), int(v)) for s, h, o, hi, lo, c, v in rows],
        "event_type string, hr timestamp, open double, high double, "
        "low double, close double, volume long")


def test_adx_hand_computed(spark):
    # symbol A: steady uptrend — every bar's high/low/close rise by
    # 1.00 exactly; +DM = 100 cents each bar, −DM = 0, TR = range 100.
    rows = [("A", i, 10 + i, 11 + i, 10 + i, 11 + i, 10)
            for i in range(4)]
    out = {r["hr"]: r for r in
           ind.adx(_bars(spark, rows), n=14).collect()}
    h1 = T0 + dt.timedelta(hours=1)
    # bar 1: sp=100, sm=0, st=100 → +DI=100, −DI=0, DX=100, ADX=100
    r = out[h1]
    assert (r["di_plus"], r["di_minus"], r["dx"], r["adx"]) == \
        (100.0, 0.0, 100.0, 100.0)
    # first bar: no prev close → all NULL
    r0 = out[T0]
    assert r0["di_plus"] is None and r0["adx"] is None


def test_adx_mixed_direction(spark):
    # bar1 up: +DM = h1−h0 = 100, TR = 100; bar2 down: −DM = l1−l2 =
    # 100, TR = max(200, 0, 200) = 200. Window at bar2: sp = 100,
    # sm = 100, st = 300 → ±DI = 1e8·100//300/1e6; DX = 0 (sp == sm);
    # ADX = (dx1 + dx2)//2 = (1e8 + 0)//2/1e6 = 50 (dx1 = 100: bar1's
    # window is all-up).
    rows = [("A", 0, 10, 11, 10, 11, 5),
            ("A", 1, 11, 12, 11, 12, 5),
            ("A", 2, 12, 12, 10, 10, 5)]
    out = sorted(ind.adx(_bars(spark, rows), n=14).collect(),
                 key=lambda r: r["hr"])
    r2 = out[2]
    assert r2["di_plus"] == 33.333333
    assert r2["di_minus"] == 33.333333
    assert r2["dx"] == 0.0
    assert r2["adx"] == 50.0


def test_force_index_first_bar_dropped_and_weighted(spark):
    # fi_t = Δcents·vol; bars: Δ=+100·vol10 → fi=1000 cents·sh,
    # Δ=−50·vol20 → fi=−1000. EWMA(d=0.8) at second force bar:
    # (−1000 + 0.8·1000)/(1 + 0.8)/100 = −200/1.8/100
    rows = [("A", 0, 10, 10, 10, 10.0, 7),
            ("A", 1, 11, 11, 11, 11.0, 10),
            ("A", 2, 10.5, 10.5, 10.5, 10.5, 20)]
    out = sorted(ind.force_index(_bars(spark, rows)).collect(),
                 key=lambda r: r["hr"])
    assert len(out) == 2          # first bar has no force
    assert out[0]["force_index"] == 10.0      # 1000/1/100
    assert out[1]["force_index"] == round(-200 / 1.8 / 100, 6)


def test_pivot_points_previous_day_levels(spark):
    # day 1: H=12, L=8, C=10 → P=10, R1=2·10−8=12, S1=8, R2=14, S2=6
    d = _bars(spark, [("A", 0, 9, 12, 8, 10, 5),
                      ("A", 24, 10, 11, 9, 10, 5)])
    out = sorted(ind.pivot_points(d).collect(), key=lambda r: r["hr"])
    assert out[0]["pivot"] is None            # no previous day
    r = out[1]
    assert (r["pivot"], r["r1"], r["s1"], r["r2"], r["s2"]) == \
        (10.0, 12.0, 8.0, 14.0, 6.0)


def test_kyle_lambda_exact_slope(spark):
    # moves: +100c on 10 shares, −100c on 10 sh, +200c on 20 sh
    # x = (+10, −10, +20), y = (+100, −100, +200): y = 10·x exactly
    rows = [("A", 0, 10, 10, 10, 10, 1),
            ("A", 1, 11, 11, 11, 11, 10),
            ("A", 2, 10, 10, 10, 10, 10),
            ("A", 3, 12, 12, 12, 12, 20)]
    r = ind.kyle_lambda(_bars(spark, rows)).collect()[0]
    assert r["n_obs"] == 3
    assert r["kyle_lambda"] == 10.0


def test_kyle_lambda_zero_variance_null(spark):
    # all moves zero → x ≡ 0 → den = 0 → NULL
    rows = [("A", i, 10, 10, 10, 10, 5) for i in range(3)]
    r = ind.kyle_lambda(_bars(spark, rows)).collect()[0]
    assert r["kyle_lambda"] is None


def test_roll_spread_alternating_bounce(spark):
    # closes 10, 11, 10, 11, 10: d = (+100, −100, +100, −100),
    # pairs (d, dl): (−100,+100), (+100,−100), (−100,+100) → n=3,
    # sd=−100+100−100=−100, sdl=+100−100+100=100, sddl=−3e4
    # cov_n = 3·(−3e4) − (−100·100) = −9e4 + 1e4 = −8e4 < 0
    # roll = 2·sqrt(8e4)/3/100
    import math
    closes = [10, 11, 10, 11, 10]
    rows = [("A", i, c, c, c, c, 5) for i, c in enumerate(closes)]
    r = ind.roll_spread(_bars(spark, rows)).collect()[0]
    assert r["n_obs"] == 3
    assert r["roll_spread"] == round(2 * math.sqrt(8e4) / 3 / 100, 6)


def test_roll_spread_trending_null(spark):
    # monotone rise: d all +100 → cov_n = 3·3e4 − (300·300)/... wait
    # n=3 pairs: sddl=3e4·3? d=dl=+100 → cov_n = n·Σddl − Σd·Σdl =
    # 3·3e4 − 300·300 = 9e4 − 9e4 = 0 → not < 0 → NULL
    closes = [10, 11, 12, 13, 14]
    rows = [("A", i, c, c, c, c, 5) for i, c in enumerate(closes)]
    r = ind.roll_spread(_bars(spark, rows)).collect()[0]
    assert r["roll_spread"] is None


def test_daily_ohlc_tie_break(spark):
    # two ticks in one day: open = first by (ts, event_id), close =
    # last; high/low exact
    ev = spark.createDataFrame(
        [("A", T0, 1, 10.0), ("A", T0 + dt.timedelta(hours=5), 2, 12.0),
         ("A", T0, 0, 9.0)],
        "event_type string, ts timestamp, event_id long, value double")
    r = ind.daily_ohlc(ev).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"], r["volume"]) == \
        (9.0, 12.0, 9.0, 12.0, 3)
