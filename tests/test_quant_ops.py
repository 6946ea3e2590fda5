"""Unit tests for the round-7 quant + layout family: candlestick
pattern census, variance ratio, information coefficient, packing
efficiency, compaction bins — hand-computed fixtures per convention."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.operators.corpus import (
    packing_efficiency)
from stock_data_etl_pipeline_spark.operators.indicators import (
    candlestick_flags, info_coefficient, variance_ratio)
from stock_data_etl_pipeline_spark.operators.layout import compaction_bins

T0 = dt.datetime(2024, 1, 1)


def _bars(spark, rows):
    # rows: (sym, hour_index, o, h, l, c)
    return spark.createDataFrame(
        [Row(event_type=s, hr=T0 + dt.timedelta(hours=i),
             open=o, high=h, low=lo, close=c)
         for s, i, o, h, lo, c in rows],
        "event_type string, hr timestamp, open double, high double, "
        "low double, close double")


def test_candlestick_flags_hand_patterns(spark):
    # b1 doji (body 5c <= 10% of 60c range); b2 hammer (45c lower
    # shadow >= 2x5c body, 5c upper <= body) AND doji (50 <= 55);
    # b3 bullish engulf of b2's red body; b4 bearish engulf of b3's
    # green body.
    bars = _bars(spark, [
        ("A", 0, 10.00, 10.60, 10.00, 10.05),
        ("A", 1, 10.50, 10.55, 10.00, 10.45),
        ("A", 2, 10.30, 10.70, 10.25, 10.60),
        ("A", 3, 10.65, 10.70, 10.20, 10.25),
    ])
    out = candlestick_flags(bars).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_bars"], r["n_doji"], r["n_hammer"],
            r["n_bull_engulf"], r["n_bear_engulf"]) == (4, 2, 1, 1, 1)


def test_variance_ratio_matches_reference_formula(spark):
    # Recompute VR(q=3) from the same quantized integer returns with
    # plain Python; operator must match exactly (identical IEEE path).
    closes = [100.0, 102.0, 101.0, 104.0, 103.0, 107.0, 106.0, 110.0]
    bars = _bars(spark, [
        ("A", i, c, c, c, c) for i, c in enumerate(closes)])
    out = variance_ratio(bars, q=3).collect()
    assert len(out) == 1
    r = [round(math.log(b / a) * 1e6)
         for a, b in zip(closes, closes[1:])]
    rq = [sum(r[i - 2:i + 1]) for i in range(2, len(r))]
    n1, s1, ss1 = len(r), sum(r), sum(v * v for v in r)
    nq, sq, ssq = len(rq), sum(rq), sum(v * v for v in rq)
    want = round((float(nq) * float(ssq) - float(sq) * float(sq))
                 * float(n1) * float(n1)
                 / ((float(n1) * float(ss1) - float(s1) * float(s1))
                    * 3.0 * float(nq) * float(nq)), 6)
    got = out[0]
    assert (got["n1"], got["nq"]) == (n1, nq)
    assert got["vr"] == want


def test_variance_ratio_constant_series_is_null(spark):
    # zero variance -> guarded NULL, no division error
    bars = _bars(spark, [("A", i, 10.0, 10.0, 10.0, 10.0)
                         for i in range(6)])
    out = variance_ratio(bars, q=2).collect()
    assert len(out) == 1 and out[0]["vr"] is None


def test_info_coefficient_perfect_and_inverted_days(spark):
    # Daily closes built so day2's signal/forward ranks agree exactly
    # (IC=+1) and day3's are fully inverted (IC=-1; sum_d2 = 8 for
    # n=3: 1 - 6*8/(3*8) = -1). One bar per (symbol, day).
    closes = {"X": [10.0, 11.0, 13.0, 20.0],
              "Y": [10.0, 12.0, 15.0, 18.0],
              "Z": [10.0, 13.0, 17.0, 17.5]}
    rows = [(s, 24 * d, c, c, c, c)
            for s, cs in closes.items() for d, c in enumerate(cs)]
    out = {r["day"]: r for r in
           info_coefficient(_bars(spark, rows)).collect()}
    assert len(out) == 2  # day0 has no signal, day3 no forward
    d2 = out[T0 + dt.timedelta(days=1)]
    d3 = out[T0 + dt.timedelta(days=2)]
    assert (d2["n_syms"], d2["sum_d2"], d2["ic"]) == (3, 0, 1.0)
    assert (d3["n_syms"], d3["sum_d2"], d3["ic"]) == (3, 8, -1.0)


def test_packing_efficiency_hand_layout(spark):
    # budget 4, tokens [3, 2, 4] laid end-to-end: total 9, packs
    # ceil(9/4)=3, tail 3, docs 2 and 3 cross pack boundaries.
    docs = spark.createDataFrame(
        [Row(doc_id=1, source="s1", text="a b c"),
         Row(doc_id=2, source="s1", text="d e"),
         Row(doc_id=3, source="s1", text="f g h i")],
        "doc_id long, source string, text string")
    out = packing_efficiency(docs, budget=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_docs"], r["total_tokens"], r["n_split_docs"],
            r["n_packs"], r["tail_waste"]) == (3, 9, 2, 3, 3)
    assert r["fill_pct"] == 75.0


def test_compaction_bins_whole_files_cut_at_start_offsets(spark):
    # target 10: byte sizes [4,5,3,7,2,2] -> start offsets
    # [0,4,9,12,19,21] -> bins [0,0,0,1,1,2]; the 2-byte tail bin is
    # undersized (< target/2). Files never split across bins.
    sizes = [4, 5, 3, 7, 2, 2]
    docs = spark.createDataFrame(
        [Row(source="s", doc_id=i, text="x" * n)
         for i, n in enumerate(sizes)],
        "source string, doc_id long, text string")
    sized = docs.select("source", "doc_id",
                        F.length("text").alias("bytes"))
    out = {r["bin_id"]: r for r in
           compaction_bins(sized, "bytes", 10).collect()}
    assert len(out) == 3
    assert (out[0]["n_files"], out[0]["bin_bytes"],
            out[0]["undersized"]) == (3, 12, False)
    assert (out[1]["n_files"], out[1]["bin_bytes"],
            out[1]["undersized"]) == (2, 9, False)
    assert (out[2]["n_files"], out[2]["bin_bytes"],
            out[2]["undersized"]) == (1, 2, True)
    assert sum(r["n_files"] for r in out.values()) == len(sizes)


def test_exact_quantiles_by_rank_known_ranks(spark):
    from stock_data_etl_pipeline_spark.operators.aggregates import (
        exact_quantiles_by_rank)
    # 0.01..1.00: lower quantile_disc picks exactly ceil(p*N)
    df = spark.createDataFrame(
        [Row(value=i / 100.0) for i in range(1, 101)], "value double")
    r = exact_quantiles_by_rank(df, "value", grid=100).collect()[0]
    assert (r["n_values"], r["q50"], r["q90"], r["q99"]) == \
        (100, 0.50, 0.90, 0.99)
    # duplicate-heavy: 9x 1.00 + 1x 2.00 -> q50/q90 stay on the mode,
    # q99 needs rank ceil(9.9)=10 -> the single 2.00
    df2 = spark.createDataFrame(
        [Row(value=1.0)] * 9 + [Row(value=2.0)], "value double")
    r2 = exact_quantiles_by_rank(df2, "value", grid=100).collect()[0]
    assert (r2["n_values"], r2["q50"], r2["q90"], r2["q99"]) == \
        (10, 1.0, 1.0, 2.0)


def test_bfs_distance_path_graph(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        bfs_distance)
    # path 0-1-2-3-4 plus a detached edge 100-101; seeds {0, 100}
    # (node % 100 == 0). 3 hops: node 4 stays unreached.
    pairs = spark.createDataFrame(
        [Row(pa=0, pb=1), Row(pa=1, pb=2), Row(pa=2, pb=3),
         Row(pa=3, pb=4), Row(pa=100, pb=101)],
        "pa long, pb long")
    out = {r["dist"]: r["n_nodes"] for r in
           bfs_distance(pairs, "pa", "pb", seed_mod=100,
                        hops=3).collect()}
    assert out == {0: 2, 1: 2, 2: 1, 3: 1}


def test_scalar_quantization_error_hand_grid(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import (
        scalar_quantization_error)
    # dim1 span [0,1], dim2 span [0,2]: every value sits exactly
    # span/512 from its bucket center, so per-row error is
    # (1/512)^2 + (2/512)^2 = 1.9073486328125e-05 for every vector.
    vecs = spark.createDataFrame(
        [Row(vec_id=1, label=0, embedding=[0.0, 0.0]),
         Row(vec_id=2, label=0, embedding=[1.0, 2.0]),
         Row(vec_id=3, label=1, embedding=[0.5, 1.0])],
        "vec_id long, label int, embedding array<double>")
    out = {r["label"]: r for r in
           scalar_quantization_error(vecs).collect()}
    e_row = 19073486  # round(1.9073486328125e-05 * 1e12)
    assert out[0]["n_vecs"] == 2 and out[1]["n_vecs"] == 1
    assert out[0]["mse"] == e_row / 1e12
    assert out[1]["mse"] == e_row / 1e12


def test_scalar_quantization_constant_dim_is_exact(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import (
        scalar_quantization_error)
    # a zero-span dimension reconstructs exactly (guarded, no x/0)
    vecs = spark.createDataFrame(
        [Row(vec_id=1, label=0, embedding=[5.0]),
         Row(vec_id=2, label=0, embedding=[5.0])],
        "vec_id long, label int, embedding array<double>")
    out = scalar_quantization_error(vecs).collect()
    assert len(out) == 1 and out[0]["mse"] == 0.0


def _bars_v(spark, rows):
    # rows: (sym, hour_index, o, h, l, c, volume)
    return spark.createDataFrame(
        [Row(event_type=s, hr=T0 + dt.timedelta(hours=i),
             open=o, high=h, low=lo, close=c, volume=v)
         for s, i, o, h, lo, c, v in rows],
        "event_type string, hr timestamp, open double, high double, "
        "low double, close double, volume long")


_OHLCV = [
    ("A", 0, 1.00, 1.10, 0.90, 1.00, 10),
    ("A", 1, 1.10, 1.20, 1.00, 1.15, 20),
    ("A", 2, 1.05, 1.30, 0.95, 1.05, 30),
    ("A", 3, 1.10, 1.25, 1.05, 1.20, 40),
]


def test_stochastic_kd_exact_quotients(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        stochastic_kd)
    out = sorted(stochastic_kd(_bars_v(spark, _OHLCV), n=3, d=2)
                 .collect(), key=lambda r: r["hr"])
    # k8 = (1e8*(c-ll)) div (hh-ll) on partial 3-bar windows
    assert [r["pct_k"] for r in out] == [
        50.0, 83.333333, 37.5, 71.428571]
    # d8 = half-away integer mean of the last 2 k8 values
    assert [r["pct_d"] for r in out] == [
        50.0, 66.666667, 60.416667, 54.464286]


def test_williams_r_mirror(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        williams_r)
    out = sorted(williams_r(_bars_v(spark, _OHLCV), n=3).collect(),
                 key=lambda r: r["hr"])
    assert [r["wr"] for r in out] == [
        -50.0, -16.666666, -62.5, -28.571428]


def test_obv_signed_running_volume(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import obv
    out = sorted(obv(_bars_v(spark, _OHLCV)).collect(),
                 key=lambda r: r["hr"])
    # closes 100,115,105,120 cents: +20, -30, +40 after the 0 origin
    assert [r["obv"] for r in out] == [0, 20, -10, 30]


def test_mfi_integer_flows(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import mfi
    out = sorted(mfi(_bars_v(spark, _OHLCV), n=2).collect(),
                 key=lambda r: r["hr"])
    # tp3 = 300,335,330,350; flows pos 6700/14000, neg 9900 (n=2)
    assert out[0]["mfi"] is None          # no directional flow yet
    assert out[1]["mfi"] == 100.0
    assert out[2]["mfi"] == 40.361445     # (1e8*6700) div 16600 / 1e6
    assert out[3]["mfi"] == 58.577405     # (1e8*14000) div 23900 / 1e6


def test_did_estimator_hand_cells(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        did_estimator)
    # arms by user parity; split 15 days after the first event.
    # T: pre mean 1.00, post mean 3.00 (lift 2.00)
    # C: pre mean 1.00, post mean 1.50 (drift 0.50) -> DiD = 1.50
    rows = []
    base = T0

    def ev(uid, day, val):
        rows.append(Row(event_id=len(rows), user_id=uid,
                        ts=base + dt.timedelta(days=day),
                        event_type="purchase", value=val))
    ev(1, 0, 1.00); ev(3, 1, 1.00)      # T pre  (users 1,3)
    ev(1, 20, 2.50); ev(3, 21, 3.50)    # T post
    ev(2, 0, 0.50); ev(4, 1, 1.50)      # C pre  (users 2,4)
    ev(2, 20, 1.00); ev(4, 21, 2.00)    # C post
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double")
    r = did_estimator(df, split_days=15).collect()[0]
    assert (r["n_t_pre"], r["n_t_post"], r["n_c_pre"],
            r["n_c_post"]) == (2, 2, 2, 2)
    assert (r["mean_t_pre"], r["mean_t_post"]) == (1.0, 3.0)
    assert (r["mean_c_pre"], r["mean_c_post"]) == (1.0, 1.5)
    assert r["did"] == 1.5


def test_grouped_exact_quantiles_two_groups(spark):
    from stock_data_etl_pipeline_spark.operators.aggregates import (
        grouped_exact_quantiles)
    rows = ([Row(g="a", v=i) for i in range(1, 11)]
            + [Row(g="b", v=7)] * 3)
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in
           grouped_exact_quantiles(df, "g", "v").collect()}
    a, b = out["a"], out["b"]
    assert (a["n_rows"], a["q50"], a["q90"], a["q99"]) == (10, 5, 9, 10)
    assert (b["n_rows"], b["q50"], b["q90"], b["q99"]) == (3, 7, 7, 7)


def test_ichimoku_hand_midlines(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        ichimoku)
    # ramp h=l=c=t dollars, t=1..30: mid_n(t) = (t + max(1, t-n+1))/2
    bars = _bars_v(spark, [("A", t - 1, float(t), float(t), float(t),
                            float(t), 1) for t in range(1, 31)])
    out = {int(r["hr"].hour + 24 * (r["hr"].day - 1)) + 1: r
           for r in ichimoku(bars).collect()}
    assert out[10]["tenkan"] == (10 + 2) / 2        # 9-bar window
    assert out[30]["kijun"] == (30 + 5) / 2         # 26-bar window
    assert out[3]["kijun"] == (3 + 1) / 2           # partial window
    # shifted spans: senkou at t=30 comes from t=4 (26 back)
    assert out[30]["senkou_a"] == 2.5
    assert out[30]["senkou_b"] == 2.5
    assert out[26]["senkou_a"] is None              # no bar 26 back yet
    # chikou at t=4 is the close 26 ahead (t=30)
    assert out[4]["chikou"] == 30.0
    assert out[5]["chikou"] is None                 # t=31 doesn't exist


def test_bigram_entropy_hand_values(spark):
    import math

    from stock_data_etl_pipeline_spark.operators.corpus import (
        bigram_entropy)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b a"),   # bigrams {a b:2, b a:2}
         Row(doc_id=2, text="a b c"),        # two distinct singletons
         Row(doc_id=3, text="solo")],        # <2 words: no row
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_entropy(docs).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1["n_bigrams"], r1["n_distinct"]) == (4, 2)
    t = round(2 * math.log(2) * 1e6) * 2
    assert r1["entropy"] == round(math.log(4) - (t / 1e6) / 4, 6)
    r2 = out[2]
    assert (r2["n_bigrams"], r2["n_distinct"]) == (2, 2)
    assert r2["entropy"] == round(math.log(2), 6)


def test_sq_recall_identical_when_quantization_preserves_order(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import (
        sq_recall_at_k)
    # well-separated directions: bucket quantization cannot reorder
    vecs = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 0.0]),
         Row(vec_id=1, embedding=[0.9, 0.1]),
         Row(vec_id=2, embedding=[0.0, 1.0]),
         Row(vec_id=3, embedding=[-1.0, 0.2])],
        "vec_id long, embedding array<double>")
    r = sq_recall_at_k(vecs, k=2, query_id=0).collect()[0]
    assert (r["n_exact"], r["n_sq_hits"], r["recall"]) == (2, 2, 1.0)


def test_donchian_channel_hand_quotients(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import donchian
    out = sorted(donchian(_bars_v(spark, _OHLCV), n=3).collect(),
                 key=lambda r: r["hr"])
    assert [r["don_upper"] for r in out] == [1.10, 1.20, 1.30, 1.30]
    assert [r["don_lower"] for r in out] == [0.90, 0.90, 0.90, 0.95]
    assert [r["don_mid"] for r in out] == [1.0, 1.05, 1.10, 1.125]
    # same integer quotients as the stochastic %K on this fixture
    assert [r["pct_pos"] for r in out] == [
        50.0, 83.333333, 37.5, 71.428571]


def test_aroon_recency_and_tie_to_most_recent(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import aroon
    rows = _OHLCV + [
        ("B", 0, 1.00, 1.00, 1.00, 1.00, 1),
        ("B", 1, 0.95, 1.00, 0.90, 0.95, 1),  # high TIES bar 0's
    ]
    out = {(r["event_type"], r["hr"].hour): r
           for r in aroon(_bars_v(spark, rows), n=3).collect()}
    a = [out[("A", i)] for i in range(4)]
    assert [r["bars_since_high"] for r in a] == [0, 0, 0, 1]
    assert [r["bars_since_low"] for r in a] == [0, 1, 2, 1]
    assert [r["aroon_up"] for r in a] == [100.0, 100.0, 100.0, 50.0]
    assert [r["aroon_down"] for r in a] == [100.0, 50.0, 0.0, 50.0]
    # equal highs resolve to the MOST RECENT bar
    assert out[("B", 1)]["bars_since_high"] == 0


def test_chaikin_ad_sign_split_flows(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        chaikin_ad)
    out = sorted(chaikin_ad(_bars_v(spark, _OHLCV), n=2).collect(),
                 key=lambda r: r["hr"])
    # mfv6: 0, +1e7, -(450e6 div 35)=-12857142, +2e7
    assert [r["ad_line"] for r in out] == [0.0, 10.0, -2.857142,
                                           17.142858]
    assert out[0]["cmf"] == 0.0
    assert out[1]["cmf"] == 1e7 / 30_000_000
    assert out[2]["cmf"] == -2857142 / 50_000_000
    assert out[3]["cmf"] == 7142858 / 70_000_000


def test_ulcer_index_rms_drawdown(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        ulcer_index)
    out = sorted(ulcer_index(_bars_v(spark, _OHLCV), n=3).collect(),
                 key=lambda r: r["hr"])
    # only bar 2 draws down: dd6 = (10*1e6) div 115 = 86956
    exp = round(math.sqrt(86956 * 86956 / 3) / 1e4, 6)
    assert [r["ulcer"] for r in out] == [0.0, 0.0, exp, exp]


def test_parkinson_vol_python_replica(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        parkinson_vol)
    out = parkinson_vol(_bars_v(spark, _OHLCV)).collect()
    assert len(out) == 1 and out[0]["n_bars"] == 4
    s = sum(round(math.log(h / lo) * math.log(h / lo) * 1e12)
            for h, lo in [(110, 90), (120, 100), (130, 95), (125, 105)])
    exp = round(math.sqrt(s / (2.772588722239781 * 4)) / 1e6, 6)
    assert out[0]["parkinson_vol"] == exp


def test_cci_integer_mean_deviation(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import cci
    out = sorted(cci(_bars_v(spark, _OHLCV), n=3).collect(),
                 key=lambda r: r["hr"])
    # tp3 = 300,335,330,350; D = sum|cnt*tp3_j - S| stays integer
    assert out[0]["cci"] is None  # zero deviation window
    assert [r["cci"] for r in out[1:]] == [66.666667, 38.461538, 100.0]


def test_supplier_hhi_two_supplier_nation(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        supplier_hhi)
    li = spark.createDataFrame(
        [Row(l_suppkey=1, l_extendedprice=100.0, l_discount=0.0),
         Row(l_suppkey=2, l_extendedprice=300.0, l_discount=0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double")
    sup = spark.createDataFrame(
        [Row(s_suppkey=1, s_nationkey=7), Row(s_suppkey=2, s_nationkey=7)],
        "s_suppkey long, s_nationkey long")
    nat = spark.createDataFrame([Row(n_nationkey=7, n_name="X")],
                                "n_nationkey long, n_name string")
    out = supplier_hhi(li, sup, nat).collect()
    # shares 1/4 and 3/4: HHI = (0.0625 + 0.5625) * 10000 = 6250
    assert len(out) == 1 and out[0]["n_suppliers"] == 2
    assert out[0]["hhi"] == 6250.0


def test_gini_by_nation_hand_ranks(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        gini_by_nation)
    orders = spark.createDataFrame(
        [Row(o_custkey=1, o_totalprice=100.0),
         Row(o_custkey=2, o_totalprice=200.0),
         Row(o_custkey=3, o_totalprice=300.0),
         Row(o_custkey=4, o_totalprice=50.0),
         Row(o_custkey=5, o_totalprice=50.0)],
        "o_custkey long, o_totalprice double")
    cust = spark.createDataFrame(
        [Row(c_custkey=i, c_nationkey=1 if i <= 3 else 2)
         for i in range(1, 6)], "c_custkey long, c_nationkey long")
    nat = spark.createDataFrame(
        [Row(n_nationkey=1, n_name="A"), Row(n_nationkey=2, n_name="B")],
        "n_nationkey long, n_name string")
    out = {r["nation"]: r for r in gini_by_nation(orders, cust, nat)
           .collect()}
    # A: x=100,200,300 -> (2*1400 - 4*600)/(3*600) = 400/1800
    assert out["A"]["gini"] == 0.222222
    # B: equal spends -> perfectly equal
    assert out["B"]["gini"] == 0.0


def test_cusum_matches_clamped_recurrence(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import cusum
    bars = _bars_v(spark, [
        ("A", 0, 1.0, 1.0, 1.0, 1.00, 1),
        ("A", 1, 1.0, 1.0, 1.0, 1.00, 1),
        ("A", 2, 1.0, 1.0, 1.0, 2.00, 1),
        ("A", 3, 1.0, 1.0, 1.0, 2.00, 1),
    ])
    out = sorted(cusum(bars, k_cents=0, h_cents=50).collect(),
                 key=lambda r: r["hr"])
    # mu = 1.50; deviations -0.5,-0.5,+0.5,+0.5 (dollars)
    assert [r["cusum_up"] for r in out] == [0.0, 0.0, 0.5, 1.0]
    assert [r["cusum_down"] for r in out] == [0.5, 1.0, 0.5, 0.0]
    assert [r["alert_up"] for r in out] == [False, False, False, True]
    assert [r["alert_down"] for r in out] == [False, True, False, False]


def test_token_kl_python_replica(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        token_kl_by_source)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a a b", source="s1"),
         Row(doc_id=2, text="a b b b", source="s2")],
        "doc_id long, text string, source string")
    out = {r["source"]: r for r in token_kl_by_source(docs).collect()}
    # global: a=3, b=4, N=7
    def kl(counts, n_s):
        s6 = sum(round(c * math.log(c / ct) * 1e6)
                 for c, ct in counts)
        return round((s6 / 1e6) / n_s + math.log(7 / n_s), 6)
    assert out["s1"]["n_tokens"] == 3
    assert out["s1"]["kl"] == kl([(2, 3), (1, 4)], 3)
    assert out["s2"]["kl"] == kl([(1, 3), (3, 4)], 4)


def test_robust_outlier_profile_hand_median_mad(spark):
    from stock_data_etl_pipeline_spark.operators.aggregates import (
        robust_outlier_profile)
    vals = list(range(1, 10)) + [100]
    df = spark.createDataFrame([Row(g="A", v=v) for v in vals],
                               "g string, v long")
    out = robust_outlier_profile(df, "g", "v").collect()
    assert len(out) == 1
    r = out[0]
    # lower median of 1..9,100 is 5; ads sorted 0,1,1,2,2,3,3,4,4,95
    assert (r["n"], r["med"], r["mad"]) == (10, 5, 2)
    assert r["n_outliers"] == 1 and r["outlier_rate"] == 0.1


def test_k_anonymity_class_census(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        k_anonymity_profile)
    df = spark.createDataFrame(
        [Row(a=1, b="X"), Row(a=1, b="X"), Row(a=2, b="Y")],
        "a long, b string")
    out = {r["k"]: r for r in k_anonymity_profile(df, ["a", "b"],
                                                  k_thresh=2).collect()}
    assert out[1]["n_classes"] == 1 and out[1]["n_rows"] == 1
    assert out[2]["n_classes"] == 1 and out[2]["n_rows"] == 2
    assert out[1]["at_risk"] is True and out[2]["at_risk"] is False


def test_clustering_coefficient_triangle_plus_pendant(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        clustering_coefficient)
    pairs = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=2, b=3), Row(a=1, b=3), Row(a=3, b=4)],
        "a long, b long")
    out = clustering_coefficient(pairs, "a", "b").collect()
    assert len(out) == 1
    r = out[0]
    # degrees 2,2,3,1 -> wedges 5; one triangle -> C = 3/5
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"],
            r["n_wedges"]) == (4, 4, 1, 5)
    assert r["transitivity"] == 0.6


def test_filter_attrition_funnel_order(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        filter_attrition)
    w = lambda s, n: " ".join([s] * n)  # noqa: E731
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="one two three"),            # fails count
         Row(doc_id=2, text=w("a", 20)),                 # fails mean wl
         Row(doc_id=3, text=w("ab#d", 20)),              # fails symbols
         Row(doc_id=4, text=w("word", 20)),              # fails stopwords
         Row(doc_id=5, text=w("word", 18) + " the of")],  # keeps
        "doc_id long, text string")
    out = sorted(filter_attrition(docs).collect(),
                 key=lambda r: r["stage"])
    assert [(r["rule"], r["n_in"], r["n_removed"], r["n_out"])
            for r in out] == [
        ("word_count", 5, 1, 4), ("mean_word_len", 4, 1, 3),
        ("symbol_ratio", 3, 1, 2), ("stopwords", 2, 1, 1)]
    assert [r["removal_rate"] for r in out] == [0.2, 0.25, 0.333333, 0.5]


def test_hurst_rs_python_replica(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        hurst_rs)
    closes = [10000]
    for t in range(140):
        closes.append(closes[-1] + ((t * 37) % 11) - 5)
    bars = _bars_v(spark, [
        ("A", i, c / 100, c / 100, c / 100, c / 100, 1)
        for i, c in enumerate(closes)])
    out = hurst_rs(bars).collect()
    assert len(out) == 1

    r = [b - a for a, b in zip(closes, closes[1:])]

    def y(m):
        t6s = []
        for i in range(len(r) // m):
            blk = r[i * m:(i + 1) * m]
            s, a, ps = sum(blk), 0, []
            for k, x in enumerate(blk, 1):
                a += x
                ps.append(m * a - k * s)
            num = max(ps) - min(ps)
            den = m * sum(x * x for x in blk) - s * s
            if den > 0 and num > 0:
                t6s.append(round(math.log(num / math.sqrt(den)) * 1e6))
        s6, nb = sum(t6s), len(t6s)
        y6 = ((2 * s6 + nb) // (2 * nb) if s6 >= 0
              else -((2 * -s6 + nb) // (2 * nb)))
        return y6, nb

    y6s, nbs = y(8)
    y6l, nbl = y(128)
    row = out[0]
    assert (row["n_blocks_small"], row["n_blocks_large"]) == (nbs, nbl)
    assert row["mean_ln_rs_small"] == y6s / 1e6
    assert row["mean_ln_rs_large"] == y6l / 1e6
    assert row["hurst"] == round(((y6l - y6s) / 1e6)
                                 / 2.772588722239781, 6)


def test_centroid_drift_orthogonal_labels(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import (
        centroid_drift)
    vecs = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 0.0], label=0),
         Row(vec_id=2, embedding=[1.0, 0.0], label=0),
         Row(vec_id=3, embedding=[0.0, 1.0], label=1)],
        "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in
           centroid_drift(vecs, dims=2).collect()}
    # global sum vector (2, 1)/1e-6 grid: cos = 2/sqrt5, 1/sqrt5
    assert out[0]["n_vectors"] == 2
    assert out[0]["cos_to_global"] == round(2 / math.sqrt(5), 6)
    assert out[1]["cos_to_global"] == round(1 / math.sqrt(5), 6)


def test_cube_grouping_levels(spark, tmp_path):
    import os
    from stock_data_etl_pipeline_spark.plans.catalog import CATALOG
    orders = spark.createDataFrame(
        [Row(o_custkey=1, o_orderpriority="P1", o_totalprice=10.0),
         Row(o_custkey=1, o_orderpriority="P2", o_totalprice=20.0),
         Row(o_custkey=2, o_orderpriority="P1", o_totalprice=30.0)],
        "o_custkey long, o_orderpriority string, o_totalprice double")
    cust = spark.createDataFrame(
        [Row(c_custkey=1, c_mktsegment="A"),
         Row(c_custkey=2, c_mktsegment="B")],
        "c_custkey long, c_mktsegment string")
    orders.write.parquet(os.path.join(tmp_path, "orders.parquet"))
    cust.write.parquet(os.path.join(tmp_path, "customer.parquet"))
    fn = CATALOG["cube_revenue_segment_priority"][0]
    rows = {(r["segment"], r["priority"]): r
            for r in fn(spark, str(tmp_path)).collect()}
    assert len(rows) == 3 + 2 + 2 + 1  # detail + 2 rollup axes + grand
    assert rows[("A", "P1")]["revenue"] == 10.0
    assert rows[("A", None)]["revenue"] == 30.0
    assert rows[(None, "P1")]["revenue"] == 40.0
    g = rows[(None, None)]
    assert (g["revenue"], g["n_orders"]) == (60.0, 3)
    assert (g["g_segment"], g["g_priority"]) == (1, 1)


def test_vortex_hand_terms(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import vortex
    out = sorted(vortex(_bars_v(spark, _OHLCV), n=2).collect(),
                 key=lambda r: r["hr"])
    assert out[0]["vi_plus"] is None and out[0]["vi_minus"] is None
    # windows {0,1}: 30/20, 10/20; {1,2}: 60/55, 35/55; {2,3}: 60/55, 50/55
    assert [(r["vi_plus"], r["vi_minus"]) for r in out[1:]] == [
        (1.5, 0.5), (1.090909, 0.636363), (1.090909, 0.90909)]


def test_lang_confusion_counts_and_fracs(spark, tmp_path):
    import os
    from stock_data_etl_pipeline_spark.plans.catalog import CATALOG
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="the and of it", lang="en"),
         Row(doc_id=2, text="the is on at", lang="en"),
         Row(doc_id=3, text="the with by for", lang="fr")],
        "doc_id long, text string, lang string")
    docs.write.parquet(os.path.join(tmp_path, "documents.parquet"))
    fn = CATALOG["text_lang_confusion"][0]
    rows = {(r["labeled_lang"], r["pred_lang"]): r
            for r in fn(spark, str(tmp_path)).collect()}
    en = rows[("en", "en")]
    assert (en["n"], en["correct"], en["frac_of_label"]) == (2, True, 1.0)
    fr_mis = rows[("fr", "en")]
    assert fr_mis["n"] == 1 and fr_mis["correct"] is False


def test_open_order_backlog_concurrency(spark):
    import datetime as _dt
    from stock_data_etl_pipeline_spark.operators.analytics import (
        open_order_backlog)
    d = lambda i: _dt.date(2024, 1, i)  # noqa: E731
    orders = spark.createDataFrame(
        [Row(o_orderkey=1, o_orderdate=d(1)),
         Row(o_orderkey=2, o_orderdate=d(2))],
        "o_orderkey long, o_orderdate date")
    li = spark.createDataFrame(
        [Row(l_orderkey=1, l_shipdate=d(2)),
         Row(l_orderkey=1, l_shipdate=d(3)),
         Row(l_orderkey=2, l_shipdate=d(3))],
        "l_orderkey long, l_shipdate date")
    out = sorted(open_order_backlog(orders, li).collect(),
                 key=lambda r: r["day"])
    assert [(r["day"].day, r["delta"], r["open_orders"])
            for r in out] == [(1, 1, 1), (2, 1, 2), (3, -2, 0)]


def test_keltner_single_bar_and_band_algebra(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        keltner)
    out = sorted(keltner(_bars_v(spark, _OHLCV), decay=0.5, lookback=3,
                         n_atr=2, mult=2).collect(),
                 key=lambda r: r["hr"])
    # bar 0: EWMA window = itself -> center = tp = (1.10+0.90+1.00)/3
    tp0 = round((1.10 + 0.90 + 1.00) / 3.0, 6)
    assert out[0]["center"] == tp0
    # bar 0 has no prev close -> atr NULL -> bands NULL
    assert out[0]["kelt_upper"] is None and out[0]["kelt_lower"] is None
    # bar 1: tr = max(0.20, |1.20-1.00|, |1.00-1.00|) = 0.2 = atr
    tp1 = (1.20 + 1.00 + 1.15) / 3.0
    # recompute center exactly as the operator does
    tpr0 = (1.10 + 0.90 + 1.00) / 3.0
    c1 = round((tp1 * 1.0 + tpr0 * 0.5) / 1.5, 6)
    assert out[1]["center"] == c1
    assert out[1]["kelt_upper"] == c1 + 2 * 0.2
    assert out[1]["kelt_lower"] == c1 - 2 * 0.2


def test_data_gaps_census(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        data_gaps)
    bars = _bars_v(spark, [
        ("A", 0, 1.0, 1.0, 1.0, 1.0, 1),
        ("A", 1, 1.0, 1.0, 1.0, 1.0, 1),
        ("A", 4, 1.0, 1.0, 1.0, 1.0, 1),   # 2-hour gap (hours 2,3)
        ("A", 5, 1.0, 1.0, 1.0, 1.0, 1),
        ("B", 0, 1.0, 1.0, 1.0, 1.0, 1),   # single bar
    ])
    out = {r["event_type"]: r for r in data_gaps(bars).collect()}
    a = out["A"]
    assert (a["n_bars"], a["expected_hours"], a["n_missing"],
            a["longest_gap_hours"]) == (4, 6, 2, 2)
    b = out["B"]
    assert (b["n_bars"], b["expected_hours"], b["n_missing"],
            b["longest_gap_hours"]) == (1, 1, 0, 0)


def test_grouped_ols_slope_exact_line_and_sign(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        grouped_ols_slope)
    rows = ([Row(g="up", x=x, y=3 * x + 7) for x in range(5)]
            + [Row(g="down", x=x, y=100 - 2 * x) for x in range(5)]
            + [Row(g="flat", x=0, y=1), Row(g="flat", x=0, y=9)])
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r["g"]: r for r in grouped_ols_slope(df, "g", "x", "y")
           .collect()}
    assert out["up"]["slope"] == 3.0
    assert out["down"]["slope"] == -2.0       # sign-split quotient
    assert out["flat"]["slope"] is None       # zero x-variance


def test_similarity_histogram_exact_buckets(spark):
    from stock_data_etl_pipeline_spark.operators.dedup import (
        similarity_histogram)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"),
         Row(doc_id=2, text="a b c"),    # identical -> bucket 10
         Row(doc_id=3, text="a b x")],   # 1/3 overlap -> bucket 3
        "doc_id long, text string")
    out = {r["bucket"]: r for r in
           similarity_histogram(docs, k=2).collect()}
    assert out[10]["n_pairs"] == 1 and out[10]["jaccard_lo"] == 1.0
    assert out[3]["n_pairs"] == 2 and out[3]["jaccard_lo"] == 0.3


def test_transition_entropy_hand_matrix(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        transition_entropy)
    ev = spark.createDataFrame(
        [Row(user_id=1, ts=T0 + dt.timedelta(minutes=i), event_id=i,
             event_type=t)
         for i, t in enumerate(["A", "B", "A", "C"])],
        "user_id long, ts timestamp, event_id long, event_type string")
    out = {r["from_type"]: r for r in transition_entropy(ev).collect()}
    # A -> {B, C} uniformly: H = ln 2 on the 1e-6 grid
    a = out["A"]
    assert (a["n_out"], a["n_next"]) == (2, 2)
    assert a["entropy"] == round(2 * round(math.log(2) * 1e6) / 1e6 / 2,
                                 6)
    assert out["B"]["entropy"] == 0.0
