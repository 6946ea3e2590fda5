"""Hand-computed fixtures for the round-9 operators: volatility
estimators (Rogers–Satchell), return moments, lead-lag correlation,
OU half-life, and volume concentration (HHI) — the five entries
catalog_round9 registers. The families originally sketched alongside
them (distribution tests, embedding geometry, graph closure curves,
corpus profiles) are covered by tests/test_round10_ops.py."""

from __future__ import annotations

import datetime as dt
import math

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


def test_rogers_satchell_hand_computed(spark):
    # one bar: o=10, h=12, l=8, c=11 — term computed in cents exactly
    rows = [("A", 0, 10, 12, 8, 11, 5)]
    out = ind.rogers_satchell_vol(_bars(spark, rows)).collect()[0]
    term = (math.log(1200 / 1100) * math.log(1200 / 1000)
            + math.log(800 / 1100) * math.log(800 / 1000))
    t = round(term * 1e12)
    exp = round(math.sqrt(t / 1.0) / 1e6, 6)
    assert out["n_bars"] == 1 and abs(out["rs_vol"] - exp) < 1e-12

    # an inverted-range bar (h < l) is excluded entirely
    rows2 = rows + [("A", 1, 10, 7, 9, 10, 5)]
    out2 = ind.rogers_satchell_vol(_bars(spark, rows2)).collect()[0]
    assert out2["n_bars"] == 1


def test_return_moments_symmetric_series_zero_skew(spark):
    # closes 10 -> 20 -> 10 -> 20 ... : returns alternate ±ln2 exactly
    # (on the grid: ±round(100·ln2) = ±69). Symmetric two-point mass:
    # skew 0; kurtosis of ±c is 1 → excess −2.
    rows = [("A", i, 1, 30, 1, 10 if i % 2 == 0 else 20, 1)
            for i in range(9)]
    out = ind.return_moments(_bars(spark, rows)).collect()[0]
    assert out["n"] == 8
    assert abs(out["skewness"]) < 1e-12
    assert abs(out["excess_kurtosis"] + 2.0) < 1e-12


def test_lead_lag_corr_shifted_series_peak_at_lag(spark):
    # y's return at hour t+1 equals x's return at hour t: build x as a
    # price path and y as the same path delayed one hour.
    px = [10, 20, 5, 40, 8, 32, 4, 24, 12]
    rows = [("purchase", i, 1, 100, 1, px[i], 1)
            for i in range(len(px))]
    rows += [("view", i + 1, 1, 100, 1, px[i], 1)
             for i in range(len(px))]
    res = {r["lag"]: r for r in
           ind.lead_lag_corr(_bars(spark, rows), "purchase", "view")
           .collect()}
    assert abs(res[1]["xcorr"] - 1.0) < 1e-9  # perfect at lag +1
    assert res[1]["n_pairs"] == 8
    # at lag 0 the series are independent permutations — |corr| < 1
    assert res[0]["xcorr"] is None or abs(res[0]["xcorr"]) < 0.999999


def test_ou_halflife_exact_ar1(spark):
    # c_t − 1000 = 0.5·(c_{t−1} − 1000) exactly on the cents grid:
    # closes 20.00, 15.00, 12.50 … → beta = −0.5, φ = 0.5,
    # half-life = −ln2/ln(0.5) = 1 hour.
    dev, closes = 1600, []
    for i in range(6):
        closes.append((1000 + dev) / 100.0)
        dev //= 2  # 1600 → 800 → … → 50: exact halvings, every point
        #            lands exactly on the y = 500 − 0.5·x line
    rows = [("A", i, c, c, c, c, 1) for i, c in enumerate(closes)]
    out = ind.ou_halflife(_bars(spark, rows)).collect()[0]
    assert abs(out["beta"] + 0.5) < 1e-12
    assert abs(out["halflife_hours"] - 1.0) < 1e-6


def test_volume_hhi_hand_computed(spark):
    # one day, two symbols with volumes 3 and 1: shares 0.75/0.25,
    # HHI = 0.5625 + 0.0625 = 0.625
    rows = [("A", 0, 1, 1, 1, 1, 3), ("B", 1, 1, 1, 1, 1, 1)]
    out = ind.volume_hhi_daily(_bars(spark, rows)).collect()[0]
    assert out["n_symbols"] == 2
    assert abs(out["hhi"] - 0.625) < 1e-12
    assert abs(out["top_share"] - 0.75) < 1e-12
