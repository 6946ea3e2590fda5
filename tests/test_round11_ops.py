"""Hand-computed fixtures for the round-11 operators: Garman–Klass and
Yang–Zhang range volatility, MACD on truncated EWMAs, Ultimate
Oscillator, and Price-Volume Trend."""

from __future__ import annotations

import datetime as dt
import math

from stock_data_etl_pipeline_spark.operators import indicators as ind

H0 = dt.datetime(2024, 1, 8, 10, 0)


def _bars(spark, rows):
    # rows: (event_type, hr_offset, open, high, low, close, volume)
    return spark.createDataFrame(
        [(t, H0 + dt.timedelta(hours=i), float(o), float(h), float(l),
          float(c), int(v)) for (t, i, o, h, l, c, v) in rows],
        "event_type string, hr timestamp, open double, high double, "
        "low double, close double, volume long")


def test_garman_klass_hand_computed(spark):
    b = _bars(spark, [("a", 0, 100.0, 110.0, 90.0, 105.0, 10),
                      ("a", 1, 105.0, 120.0, 100.0, 110.0, 10)])
    out = ind.garman_klass_vol(b).collect()
    assert len(out) == 1 and out[0]["n_bars"] == 2

    def term(o, h, l, c):
        hl = math.log((h * 100) / (l * 100))
        co = math.log((c * 100) / (o * 100))
        return round((0.5 * (hl * hl)
                      - ind.GK_2LN2M1 * (co * co)) * ind.RS_GRID)

    s = term(100, 110, 90, 105) + term(105, 120, 100, 110)
    exp = round(math.sqrt(s / 2.0) / 1e6, 6)
    assert out[0]["gk_vol"] == exp

    # inverted range / nonpositive low excluded
    bad = _bars(spark, [("b", 0, 1.0, 1.0, -1.0, 1.0, 1)])
    assert ind.garman_klass_vol(bad).count() == 0


def test_yang_zhang_hand_computed(spark):
    rows = [("a", 0, 100.0, 110.0, 90.0, 105.0, 10),
            ("a", 1, 106.0, 112.0, 100.0, 108.0, 10),
            ("a", 2, 107.0, 115.0, 101.0, 110.0, 10)]
    out = ind.yang_zhang_vol(_bars(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 2  # first bar dropped from all legs

    # independent recomputation on the quantized grids
    cents = [(int(o * 100), int(h * 100), int(l * 100), int(c * 100))
             for (_, _, o, h, l, c, _) in rows]
    qo, qc, qrs = [], [], []
    for i in (1, 2):
        o, h, l, c = cents[i]
        pc = cents[i - 1][3]
        qo.append(round(math.log(o / pc) * ind.YZ_RET_GRID))
        qc.append(round(math.log(c / o) * ind.YZ_RET_GRID))
        qrs.append(round((math.log(h / c) * math.log(h / o)
                          + math.log(l / c) * math.log(l / o))
                         * ind.RS_GRID))
    n = 2.0
    vo = (n * sum(x * x for x in qo) - sum(qo) ** 2) / (n * (n - 1)) / 1e12
    vc = (n * sum(x * x for x in qc) - sum(qc) ** 2) / (n * (n - 1)) / 1e12
    vrs = sum(qrs) / n / ind.RS_GRID
    k = 0.34 / (1.34 + (n + 1.0) / (n - 1.0))
    exp = math.sqrt(max(0.0, vo + k * vc + (1.0 - k) * vrs))
    assert abs(r["yz_vol"] - exp) < 1e-12

    # n = 1 after the first-bar drop -> NULL (variance undefined)
    out2 = ind.yang_zhang_vol(_bars(spark, rows[:2])).collect()
    assert out2[0]["n"] == 1 and out2[0]["yz_vol"] is None


def test_macd_constant_series_is_zero(spark):
    b = _bars(spark, [("a", i, 50.0, 50.0, 50.0, 50.0, 1)
                      for i in range(6)])
    for r in ind.macd(b).collect():
        assert r["macd"] == 0.0
        assert r["signal"] == 0.0
        assert r["histogram"] == 0.0


def test_macd_rising_series_positive(spark):
    # strictly rising close: the fast EWMA (decay 0.85) tracks the
    # ramp closer than the slow one (0.93), so macd > 0 after bar 1
    b = _bars(spark, [("a", i, 1.0, 1.0, 1.0, float(10 + i), 1)
                      for i in range(10)])
    rows = {r["hr"]: r for r in ind.macd(b).collect()}
    assert len(rows) == 10
    later = [r["macd"] for hr, r in sorted(rows.items())][2:]
    assert all(m > 0 for m in later)


def test_ultimate_oscillator_hand_computed(spark):
    # periods (1,2,3): only the 4th bar (3rd with a prev close) has a
    # full 3-window
    rows = [("a", 0, 100.0, 101.0, 99.0, 100.0, 1),
            ("a", 1, 100.0, 103.0, 98.0, 102.0, 1),
            ("a", 2, 102.0, 105.0, 101.0, 104.0, 1),
            ("a", 3, 104.0, 106.0, 100.0, 105.0, 1)]
    out = ind.ultimate_oscillator(_bars(spark, rows),
                                  periods=(1, 2, 3)).collect()
    assert len(out) == 1
    cents = [(int(o * 100), int(h * 100), int(l * 100), int(c * 100))
             for (_, _, o, h, l, c, _) in rows]
    bp, tr = [], []
    for i in (1, 2, 3):
        o, h, l, c = cents[i]
        pc = cents[i - 1][3]
        bp.append(c - min(l, pc))
        tr.append(max(h, pc) - min(l, pc))
    a1 = bp[2] / tr[2]
    a2 = (bp[1] + bp[2]) / (tr[1] + tr[2])
    a3 = sum(bp) / sum(tr)
    exp = 100.0 * (4.0 * a1 + 2.0 * a2 + a3) / 7.0
    assert abs(out[0]["uo"] - exp) < 1e-9


def test_pvt_hand_computed(spark):
    b = _bars(spark, [("a", 0, 1.0, 1.0, 1.0, 100.0, 10),
                      ("a", 1, 1.0, 1.0, 1.0, 110.0, 20),
                      ("a", 2, 1.0, 1.0, 1.0, 99.0, 30)])
    vals = [r["pvt"] for r in ind.pvt(b).orderBy("hr").collect()]
    # +10% on vol 20 -> +2.0; -10% on vol 30 -> -3.0 (running: -1.0)
    assert vals == [0.0, 2.0, -1.0]
