"""Hand-computed fixtures for the round-12 operators: DEMA, KST,
hourly-count ACF, inter-arrival burstiness, SPRT trace, IPS off-policy
value, simplified silhouette, last-digit uniformity, token-budget
apportionment, positional template profile, shard plan, and LPA
modularity."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.operators import analytics as AN
from stock_data_etl_pipeline_spark.operators import corpus as CP
from stock_data_etl_pipeline_spark.operators import indicators as ind
from stock_data_etl_pipeline_spark.operators import quality as Q
from stock_data_etl_pipeline_spark.operators import similarity as SIM

SAT = dt.datetime(2024, 1, 6, 10, 0)   # Saturday  -> weekend
MON = dt.datetime(2024, 1, 8, 10, 0)   # Monday    -> weekday
H0 = dt.datetime(2024, 1, 8, 10, 0)


def _events(spark, rows):
    # rows: (event_type, user_id, ts, value)
    return spark.createDataFrame(
        [(int(i), ts, int(u), t, float(v))
         for i, (t, u, ts, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")


def _bars(spark, rows):
    # rows: (event_type, hr_offset, close)
    return spark.createDataFrame(
        [(t, H0 + dt.timedelta(hours=i), float(c), float(c), float(c),
          float(c), 1) for (t, i, c) in rows],
        "event_type string, hr timestamp, open double, high double, "
        "low double, close double, volume long")


# -- DEMA / KST --------------------------------------------------------------

def test_dema_constant_series_equals_close(spark):
    b = _bars(spark, [("a", i, 50.0) for i in range(5)])
    for r in ind.dema(b).collect():
        assert r["ema"] == 50.0
        assert r["dema"] == 50.0  # 2*50 - 50


def test_dema_rising_series_leads_ema(spark):
    # on a rising ramp the double-EMA term lags the single EMA, so
    # dema = 2*e1 - e2 > e1 (the lag-compensation property)
    b = _bars(spark, [("a", i, 100.0 + i) for i in range(8)])
    rows = ind.dema(b).collect()
    for r in rows[2:]:
        assert r["dema"] > r["ema"]


def test_kst_constant_series_is_zero_after_warmup(spark):
    b = _bars(spark, [("a", i, 50.0) for i in range(40)])
    rows = ind.kst(b).orderBy("hr").collect()
    # all four ROCs are exactly 0 once their lags exist; before the
    # shortest lag (10 bars) every term is NULL
    assert all(r["kst"] is None for r in rows[:10])
    assert rows[-1]["kst"] == 0.0


def test_kst_rising_series_positive(spark):
    b = _bars(spark, [("a", i, 100.0 + 2 * i) for i in range(40)])
    rows = ind.kst(b).orderBy("hr").collect()
    assert rows[-1]["kst"] > 0


# -- hourly ACF / burstiness -------------------------------------------------

def test_hourly_acf_alternating_series(spark):
    # hourly counts 2,4,2,4,2,4: lag-1 ACF is exactly -1, lag-2 +1
    rows = []
    for h in range(6):
        n = 2 if h % 2 == 0 else 4
        for k in range(n):
            rows.append(("a", 1, H0 + dt.timedelta(hours=h, minutes=k), 1.0))
    out = {r["lag"]: r for r in AN.hourly_count_acf(_events(spark, rows),
                                                    max_lag=3).collect()}
    assert out[1]["acf"] == -1.0
    assert out[2]["acf"] == 1.0
    assert out[1]["n"] == 5 and out[2]["n"] == 4


def test_burstiness_periodic_is_minus_one(spark):
    # constant 10-second gaps: sigma = 0 -> B = (0-10)/(0+10) = -1
    rows = [("a", 1, H0 + dt.timedelta(seconds=10 * i), 1.0)
            for i in range(4)]
    out = AN.interarrival_burstiness(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 3 and r["mean_gap_s"] == 10.0
    assert r["burstiness"] == -1.0


def test_burstiness_single_gap_null(spark):
    rows = [("b", 1, H0, 1.0), ("b", 1, H0 + dt.timedelta(seconds=5), 1.0)]
    out = AN.interarrival_burstiness(_events(spark, rows)).collect()
    assert out[0]["n"] == 1 and out[0]["burstiness"] is None


# -- SPRT / IPS --------------------------------------------------------------

def test_sprt_trace_hand_computed(spark):
    # one weekday day (4 events, 2 purchases), one weekend day
    # (4 events, 0 purchases); pooled p0 = 2/8
    rows = ([("purchase", 1, MON, 1.0)] * 2 + [("view", 1, MON, 1.0)] * 2
            + [("view", 2, SAT, 1.0)] * 4)
    out = {r["arm"]: r for r in
           AN.sprt_conversion_trace(_events(spark, rows)).collect()}
    p0 = 2 / 8
    p1 = min(p0 * AN.SPRT_LIFT, 0.999)
    la, lb = math.log(p1 / p0), math.log((1 - p1) / (1 - p0))
    wd = round((2 * la + 2 * lb) * AN.SPRT_LLR_GRID)
    we = round((0 * la + 4 * lb) * AN.SPRT_LLR_GRID)
    assert out["weekday"]["final_llr9"] == wd
    assert out["weekend"]["final_llr9"] == we
    assert out["weekday"]["n_days"] == 1
    # neither single day crosses ln(19)
    assert out["weekday"]["decision"] == "censored"
    assert out["weekend"]["crossing_day"] is None


def test_ips_single_type_recovers_mean(spark):
    # one event type: every weight is exactly 1, IPS == SNIPS == mean
    rows = [("a", 1, H0 + dt.timedelta(minutes=i), v)
            for i, v in enumerate([1.0, 2.0, 3.0, 6.0])]
    out = AN.ips_uniform_policy_value(_events(spark, rows)).collect()[0]
    assert out["n_events"] == 4 and out["n_types"] == 1
    assert out["ips_value"] == 3.0
    assert out["snips_value"] == 3.0


def test_ips_two_types_hand_computed(spark):
    # same hour: type a 3 events value 2, type b 1 event value 8;
    # n_hour=4, K=2 -> w_a = 4/(2*3) = 2/3, w_b = 4/(2*1) = 2
    rows = ([("a", 1, H0, 2.0)] * 3 + [("b", 1, H0, 8.0)])
    out = AN.ips_uniform_policy_value(_events(spark, rows)).collect()[0]
    c6 = 3 * round(2.0 * (4 / (2 * 3)) * AN.IPS_GRID) \
        + round(8.0 * 2.0 * AN.IPS_GRID)
    w6 = 3 * round((4 / (2 * 3)) * AN.IPS_GRID) + 2 * AN.IPS_GRID
    assert abs(out["ips_value"] - c6 / (4 * AN.IPS_GRID)) < 1e-12
    assert abs(out["snips_value"] - c6 / w6) < 1e-12


# -- silhouette --------------------------------------------------------------

def test_silhouette_separated_clusters(spark):
    vecs = [(1, [0.0, 0.0], 0), (2, [0.0, 0.0], 0),
            (3, [10.0, 0.0], 1), (4, [10.0, 0.0], 1)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label int")
    out = {r["label"]: r for r in SIM.simplified_silhouette(df).collect()}
    # every vector sits ON its centroid (a=0) and 10 units from the
    # other centroid (b=10): s = (b-0)/b = 1
    assert out[0]["mean_silhouette"] == 1.0
    assert out[1]["mean_silhouette"] == 1.0
    assert out[0]["n_vecs"] == 2


def test_silhouette_degenerate_same_point(spark):
    # both labels share one point: a = b = 0 -> s = 0 by contract
    vecs = [(1, [1.0, 1.0], 0), (2, [1.0, 1.0], 1)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label int")
    out = SIM.simplified_silhouette(df).collect()
    assert all(r["mean_silhouette"] == 0.0 for r in out)


# -- last-digit uniformity ---------------------------------------------------

def test_last_digit_uniformity_hand_computed(spark):
    df = spark.createDataFrame(
        [(i, 100.00) for i in range(4)], "id long, v double")
    out = {r["digits"]: r for r in
           Q.last_digit_uniformity(df, "v").collect()}
    assert len(out) == 100
    assert out[0]["n_obs"] == 4
    assert out[0]["expected"] == 0.04
    # chi2 term at bucket 0: (100*4 - 4)^2 / (100*4)
    assert out[0]["chi2_term"] == (396.0 * 396.0) / 400.0
    assert out[37]["n_obs"] == 0
    assert out[37]["chi2_term"] == (0.0 - 4.0) ** 2 / 400.0


# -- token budget / template / shards ----------------------------------------

def test_token_budget_hamilton_exact(spark):
    df = spark.createDataFrame(
        [(1, "w w w", "a"), (2, "w w w", "b"), (3, "w w w", "c")],
        "doc_id long, text string, source string")
    out = {r["source"]: r["quota"]
           for r in CP.token_budget_plan(df, budget=1_000_000).collect()}
    # 1e6 over three equal sources: floors 333333, remainder seat to
    # the lexicographically first source
    assert out == {"a": 333334, "b": 333333, "c": 333333}
    assert sum(out.values()) == 1_000_000


def test_positional_template_modal_share(spark):
    df = spark.createDataFrame(
        [(1, "a b", "s"), (2, "a c", "s")],
        "doc_id long, text string, source string")
    out = {(r["source"], r["pos"]): r
           for r in CP.positional_template_profile(df).collect()}
    assert out[("s", 1)]["top_word"] == "a"
    assert out[("s", 1)]["share"] == 1.0
    # tie at pos 2 between b and c -> word-asc tie-break
    assert out[("s", 2)]["top_word"] == "b"
    assert out[("s", 2)]["share"] == 0.5


def test_shard_plan_matches_md5(spark):
    df = spark.createDataFrame(
        [(7, "x y z")], "doc_id long, text string")
    out = CP.shard_plan(df).collect()
    assert len(out) == 1
    exp = int(hashlib.md5(b"7").hexdigest()[:15], 16) % CP.SHARD_COUNT
    assert out[0]["shard"] == exp
    assert out[0]["n_docs"] == 1 and out[0]["n_tokens"] == 3
    assert out[0]["doc_skew"] == float(CP.SHARD_COUNT)


# -- LPA modularity ----------------------------------------------------------

def test_lpa_modularity_triangle_single_community(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "pa long, pb long")
    out = AN.lpa_modularity(pairs, "pa", "pb").collect()[0]
    # triangle converges to one community: Q = e/m - (d/2m)^2 = 0
    assert out["n_nodes"] == 3 and out["m_edges"] == 3
    assert out["n_communities"] == 1
    assert out["modularity"] == 0.0


def test_lpa_modularity_two_disjoint_edges(spark):
    # a single edge OSCILLATES under synchronous LPA (labels swap each
    # round), so after 3 rounds every node is a singleton community:
    # e_c = 0, d_c = 1, m = 2 -> Q = sum(-1)/(4*4) = -0.25
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "pa long, pb long")
    out = AN.lpa_modularity(pairs, "pa", "pb").collect()[0]
    assert out["n_nodes"] == 4 and out["m_edges"] == 2
    assert out["n_communities"] == 4
    assert out["modularity"] == -0.25


# -- batch 2: EMV / BOP / Chaikin volatility / Corwin-Schultz ----------------

def _ohlc(spark, rows):
    # rows: (event_type, hr_offset, open, high, low, close, volume)
    return spark.createDataFrame(
        [(t, H0 + dt.timedelta(hours=i), float(o), float(h), float(l),
          float(c), int(v)) for (t, i, o, h, l, c, v) in rows],
        "event_type string, hr timestamp, open double, high double, "
        "low double, close double, volume long")


def test_emv_hand_computed(spark):
    b = _ohlc(spark, [("a", 0, 9.5, 10.0, 9.0, 9.5, 2),
                      ("a", 1, 11.5, 12.0, 11.0, 11.5, 4)])
    rows = ind.ease_of_movement(b).orderBy("hr").collect()
    assert rows[0]["emv"] is None  # no previous midpoint
    # dm2 = (1200+1100) - (1000+900) = 400 half-cents; rng = 100 cents
    # emv = 400*100/(20000*4) = 0.5
    assert rows[1]["emv"] == 0.5
    assert rows[1]["emv_sma"] == 0.5  # only one non-null term in frame


def test_bop_hand_computed(spark):
    b = _ohlc(spark, [("a", 0, 9.0, 10.0, 9.0, 9.75, 1)])
    r = ind.balance_of_power(b).collect()[0]
    assert r["bop"] == 0.75  # (975-900)/(1000-900)
    assert r["bop_sma"] == 0.75
    # zero-range bar -> NULL, excluded from SMA
    b2 = _ohlc(spark, [("b", 0, 5.0, 5.0, 5.0, 5.0, 1)])
    r2 = ind.balance_of_power(b2).collect()[0]
    assert r2["bop"] is None and r2["bop_sma"] is None


def test_chaikin_vol_constant_range_zero(spark):
    b = _ohlc(spark, [("a", i, 10.0, 11.0, 10.0, 10.5, 1)
                      for i in range(13)])
    rows = ind.chaikin_volatility(b).orderBy("hr").collect()
    assert all(r["chaikin_vol"] is None for r in rows[:10])
    assert rows[-1]["ema_range"] == 1.0
    assert rows[-1]["chaikin_vol"] == 0.0


def test_corwin_schultz_hand_computed(spark):
    # flat bars (H == L): every log range is 0 -> spread exactly 0
    flat = _ohlc(spark, [("a", i, 5.0, 5.0, 5.0, 5.0, 1)
                         for i in range(3)])
    r = ind.corwin_schultz_spread(flat).collect()[0]
    assert r["n_pairs"] == 2 and r["mean_spread"] == 0.0

    # one real pair, recomputed independently on the same grids
    b = _ohlc(spark, [("b", 0, 10.0, 11.0, 10.0, 10.5, 1),
                      ("b", 1, 10.6, 12.0, 10.4, 11.5, 1)])
    out = ind.corwin_schultz_spread(b).collect()
    r = [x for x in out if x["event_type"] == "b"][0]
    q0 = round(math.log(1100 / 1000) ** 2 * ind.CS_GRID)
    q1 = round(math.log(1200 / 1040) ** 2 * ind.CS_GRID)
    g = round(math.log(1200 / 1000) ** 2 * ind.CS_GRID)
    beta = (q0 + q1) / ind.CS_GRID
    gamma = g / ind.CS_GRID
    den = 3.0 - 2.0 * math.sqrt(2.0)
    alpha = ((math.sqrt(2.0 * beta) - math.sqrt(beta)) / den
             - math.sqrt(gamma / den))
    s = 2.0 * (math.exp(alpha) - 1.0) / (1.0 + math.exp(alpha))
    exp = round(max(s, 0.0) * 1e6) / 1e6
    assert r["n_pairs"] == 1
    assert abs(r["mean_spread"] - exp) < 1e-12


# -- near-duplicate invoices --------------------------------------------------

def test_near_duplicate_invoices_hand_fixture(spark):
    d0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(1, 10, 100.00, d0),
         (2, 10, 100.50, d0 + dt.timedelta(days=2)),   # within 1%, 2d
         (3, 10, 150.00, d0 + dt.timedelta(days=1)),   # amount far off
         (4, 10, 100.00, d0 + dt.timedelta(days=20)),  # outside window
         (5, 11, 100.00, d0)],                         # other customer
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp")
    out = Q.near_duplicate_invoices(orders).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["okey_a"], r["okey_b"]) == (1, 2)
    assert r["days_apart"] == 2
    # gap 50 cents over min 10000 cents -> 5000 on the 1e-6 grid
    assert r["rel_gap_e6"] == 5000
    assert r["amount_a"] == 100.0 and r["amount_b"] == 100.5


# -- streaming digit-uniformity twin ------------------------------------------

def test_streaming_digit_uniformity_matches_batch(spark, tmp_path):
    rows = [("a", 1, H0 + dt.timedelta(minutes=i), 100.00 + i)
            for i in range(6)]
    ev = _events(spark, rows)
    p = str(tmp_path / "ev.parquet")
    ev.write.parquet(p)
    from stock_data_etl_pipeline_spark.streaming.events import (
        streaming_digit_uniformity)
    got = {r["digits"]: r["n_obs"]
           for r in streaming_digit_uniformity(spark, p).collect()}
    exp = {r["digits"]: r["n_obs"]
           for r in Q.last_digit_uniformity(ev, "value").collect()}
    assert got == exp
    assert sum(got.values()) == 6


# -- batch 3: VPIN / eigencentrality / coverage curve / new-user share -------

def test_vpin_hand_computed(spark):
    # rising tape: every tick-rule sign is +1, so each complete
    # bucket's imbalance is its full size -> vpin exactly 1.0
    up = [("a", 1, H0 + dt.timedelta(seconds=i), 1.00 + i * 0.01)
          for i in range(5)]
    r = ind.vpin(_events(spark, up), bucket_size=2).collect()[0]
    assert r["vpin"] == 1.0
    # alternating tail: signs (+1, +1, -1, +1); first tick has no
    # sign; bucket rn//2 = 1 holds (+1, -1) -> imbalance 0
    alt = [("b", 1, H0 + dt.timedelta(seconds=i), v)
           for i, v in enumerate([1.00, 1.01, 1.02, 1.01, 1.02])]
    r2 = ind.vpin(_events(spark, alt), bucket_size=2).collect()[0]
    assert r2["n_buckets"] == 1 and r2["vpin"] == 0.0


def test_eigencentrality_star_graph(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "pa long, pb long")
    out = {r["node"]: r["score_e6"] for r in
           AN.eigenvector_centrality(pairs, "pa", "pb", iters=3).collect()}
    # after an odd iteration the hub holds the inf-norm max; each leaf
    # carries (1e6 * 999999) // 3e6 = 333333 (one floor-div quantum
    # below the exact 1/3)
    assert out[1] == AN.EIG_SCALE
    assert out[2] == out[3] == out[4] == 333333


def test_coverage_curve_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c")], "doc_id long, text string")
    out = {r["cutoff"]: r for r in
           CP.vocab_coverage_curve(df, cutoffs=(1, 2, 10)).collect()}
    assert out[1]["covered_tokens"] == 3 and out[1]["coverage"] == 0.5
    assert out[2]["covered_tokens"] == 5
    assert out[10]["n_vocab"] == 3  # min(cutoff, |vocab|)
    assert out[10]["coverage"] == 1.0


def test_new_user_share_hand_computed(spark):
    d0, d1 = MON, MON + dt.timedelta(days=1)
    rows = [("a", 1, d0, 1.0), ("a", 1, d0, 1.0),
            ("a", 1, d1, 1.0), ("a", 2, d1, 1.0)]
    out = {str(r["day"]): r for r in
           AN.new_user_share(_events(spark, rows)).collect()}
    assert out["2024-01-08"]["n_events"] == 2
    assert out["2024-01-08"]["new_share"] == 1.0
    assert out["2024-01-09"]["n_events"] == 2
    assert out["2024-01-09"]["n_new_user_events"] == 1
    assert out["2024-01-09"]["new_share"] == 0.5


# -- round-12 self-review regression fixtures ---------------------------------

def test_last_digit_uniformity_negative_cents(spark):
    # refunds: -12.34 -> cents -1234 -> canonical bucket 66; the
    # pre-fix dividend-signed % dropped it from the grid while the
    # total still counted it
    df = spark.createDataFrame(
        [(1, 100.00), (2, -12.34)], "id long, v double")
    out = {r["digits"]: r for r in
           Q.last_digit_uniformity(df, "v").collect()}
    assert out[0]["n_obs"] == 1
    assert out[66]["n_obs"] == 1
    assert sum(r["n_obs"] for r in out.values()) == 2
    assert out[0]["expected"] == 0.02


def test_pagerank_empty_graph_returns_empty(spark):
    only_loops = spark.createDataFrame([(1, 1)], "pa long, pb long")
    out = AN.pagerank(only_loops, "pa", "pb")
    assert out.count() == 0
    assert out.columns == ["node", "rank_e12"]


def test_silhouette_singleton_label_scores_zero(spark):
    # label 1 is a singleton: a=0 would fake a perfect score; the
    # convention assigns 0 (no cohesion evidence)
    vecs = [(1, [0.0, 0.0], 0), (2, [0.2, 0.0], 0),
            (3, [10.0, 0.0], 1)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label int")
    out = {r["label"]: r for r in SIM.simplified_silhouette(df).collect()}
    assert out[1]["mean_silhouette"] == 0.0
    assert out[0]["mean_silhouette"] > 0.9


def test_near_duplicate_invoices_rejects_bad_pct(spark):
    import pytest
    orders = spark.createDataFrame(
        [(1, 10, 100.00, MON)],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp")
    for bad in (0, 3, 101):
        with pytest.raises(ValueError):
            Q.near_duplicate_invoices(orders, rel_gap_pct=bad)


def test_coverage_curve_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = {r["cutoff"]: r for r in
           CP.vocab_coverage_curve(df, cutoffs=(100,)).collect()}
    assert out[100]["n_vocab"] == 0
    assert out[100]["covered_tokens"] == 0
    assert out[100]["coverage"] is None


# -- property tests (Hypothesis) for the round-12 math ------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

SLOW = settings(max_examples=6, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@SLOW
@given(toks=st.lists(st.integers(min_value=1, max_value=500),
                     min_size=1, max_size=8),
       budget=st.integers(min_value=1, max_value=100_000))
def test_token_budget_sums_exactly_and_is_proportional(spark, toks, budget):
    # Hamilton invariants: quotas sum EXACTLY to the budget and each
    # quota is within 1 of the real-valued proportional share
    rows = [(i, " ".join(["w"] * t), f"s{i:02d}")
            for i, t in enumerate(toks)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    out = {r["source"]: r["quota"]
           for r in CP.token_budget_plan(df, budget=budget).collect()}
    assert sum(out.values()) == budget
    total = sum(toks)
    for i, t in enumerate(toks):
        exact = budget * t / total
        q = out[f"s{i:02d}"]
        assert exact - 1 < q < exact + 1


@SLOW
@given(gaps=st.lists(st.integers(min_value=1, max_value=10_000),
                     min_size=2, max_size=12))
def test_burstiness_stays_in_range(spark, gaps):
    # B = (sd - m)/(sd + m) with m > 0: always in [-1, 1)
    t, rows = H0, []
    rows.append(("a", 1, t, 1.0))
    for g in gaps:
        t = t + dt.timedelta(seconds=g)
        rows.append(("a", 1, t, 1.0))
    r = AN.interarrival_burstiness(_events(spark, rows)).collect()[0]
    assert r["n"] == len(gaps)
    assert -1.0 <= r["burstiness"] < 1.0


@SLOW
@given(vecs=st.lists(
    st.tuples(st.floats(min_value=-5, max_value=5, allow_nan=False),
              st.floats(min_value=-5, max_value=5, allow_nan=False),
              st.integers(min_value=0, max_value=2)),
    min_size=2, max_size=10).filter(
        lambda v: len({lbl for _, _, lbl in v}) >= 2))
def test_silhouette_bounded(spark, vecs):
    df = spark.createDataFrame(
        [(i, [float(x), float(y)], int(lbl))
         for i, (x, y, lbl) in enumerate(vecs)],
        "vec_id long, embedding array<double>, label int")
    for r in SIM.simplified_silhouette(df).collect():
        assert -1.0 <= r["mean_silhouette"] <= 1.0


@SLOW
@given(counts=st.lists(st.integers(min_value=1, max_value=40),
                       min_size=2, max_size=10))
def test_coverage_curve_monotone_and_complete(spark, counts):
    # coverage is monotone in the cutoff and reaches exactly 1.0 at
    # (or past) the full vocabulary
    text = " ".join(f"w{i:02d}" for i, c in enumerate(counts)
                    for _ in range(c))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    cuts = (1, 2, len(counts), len(counts) + 5)
    rows = CP.vocab_coverage_curve(df, cutoffs=cuts).orderBy("cutoff") \
        .collect()
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs)
    assert rows[-1]["coverage"] == 1.0
    assert rows[-1]["n_vocab"] == len(counts)


@SLOW
@given(amts=st.lists(st.floats(min_value=1.0, max_value=1000.0,
                               allow_nan=False),
                     min_size=2, max_size=8))
def test_near_duplicate_invoices_symmetric_band(spark, amts):
    # the integer cross-multiplication band must agree with the
    # real-valued 1% test on exact cents
    d0 = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(i, 1, round(float(a), 2), d0 + dt.timedelta(days=i % 3))
         for i, a in enumerate(amts)],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp")
    got = {(r["okey_a"], r["okey_b"])
           for r in Q.near_duplicate_invoices(orders).collect()}
    cents = [round(round(float(a), 2) * 100) for a in amts]
    exp = set()
    for i in range(len(amts)):
        for j in range(len(amts)):
            if i == j:
                continue
            di, dj = i % 3, j % 3
            a_first = (di < dj) or (di == dj and i < j)
            if not a_first or abs(dj - di) > 7:
                continue
            if 100 * abs(cents[i] - cents[j]) <= min(cents[i], cents[j]):
                exp.add((i, j))
    assert got == exp


# -- batch 4 fixtures ----------------------------------------------------------

def test_streaming_new_user_share_matches_batch(spark, tmp_path):
    d0, d1 = MON, MON + dt.timedelta(days=1)
    rows = [("a", 1, d0, 1.0), ("a", 1, d1, 1.0),
            ("a", 2, d1, 1.0), ("a", 2, d1, 1.0)]
    ev = _events(spark, rows)
    p = str(tmp_path / "ev.parquet")
    # write ts as TIMESTAMP_MICROS: Spark's INT96 default reads back
    # as ns through the footer detector and mismatches the us schema
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        ev.write.parquet(p)
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    from stock_data_etl_pipeline_spark.operators.analytics import (
        new_user_share_from_counts)
    from stock_data_etl_pipeline_spark.streaming.events import (
        streaming_user_day_counts)
    got = {str(r["day"]): (r["n_events"], r["n_new_user_events"])
           for r in new_user_share_from_counts(
               streaming_user_day_counts(spark, p)).collect()}
    exp = {str(r["day"]): (r["n_events"], r["n_new_user_events"])
           for r in AN.new_user_share(ev).collect()}
    assert got == exp
    assert got["2024-01-09"] == (3, 2)  # u2's two events are new


def test_dq_events_suite_flags_violations(spark):
    ev = spark.createDataFrame(
        [(1, H0, 1, "view", 5.0),
         (1, H0, 2, "view", -1.0),       # dup event_id + negative value
         (3, None, None, "bogus", 1.0)],  # null ts/user + bad type
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")
    from stock_data_etl_pipeline_spark.operators.quality import (
        UniqueRule, dq_check, in_range, in_set, not_null)
    out = {r["constraint_name"]: r["violations"]
           for r in dq_check(ev, [
               not_null("user_id"), not_null("ts"),
               in_range("value", lo=0.0),
               in_set("event_type",
                      ("click", "error", "purchase", "signup", "view")),
               UniqueRule("event_id_unique", ("event_id",)),
           ]).collect()}
    assert out["user_id_not_null"] == 1
    assert out["ts_not_null"] == 1
    assert out["value_in_range"] == 1
    assert out["event_type_in_set"] == 1
    assert out["event_id_unique"] == 1


# -- batch 5 fixtures ----------------------------------------------------------

def test_shard_modality_balance_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.multimodal import (
        shard_modality_balance)
    # one doc: 3 words (1 text chunk of 3 tokens), 250 chars -> 2
    # image refs of 16 patch tokens each
    df = spark.createDataFrame(
        [(7, "a b c", 250)], "doc_id long, text string, n_chars long")
    out = {r["modality"]: r for r in
           shard_modality_balance(df).collect()}
    exp_shard = int(hashlib.md5(b"7").hexdigest()[:15], 16) % CP.SHARD_COUNT
    assert out["text"]["shard"] == exp_shard
    assert out["text"]["n_items"] == 1 and out["text"]["n_tokens"] == 3
    assert out["image"]["n_items"] == 2 and out["image"]["n_tokens"] == 32
    # one shard holds everything -> it carries n_shards x the fair share
    assert out["text"]["token_skew"] == float(CP.SHARD_COUNT)


def test_hour_entropy_hand_computed(spark):
    # type a: 2 events in one hour -> H = ln2 - (2 ln2)/2 = 0
    # type b: 1 event in each of two hours -> H = ln2 exactly
    rows = [("a", 1, H0, 1.0), ("a", 1, H0 + dt.timedelta(minutes=5), 1.0),
            ("b", 1, H0, 1.0), ("b", 1, H0 + dt.timedelta(hours=1), 1.0)]
    out = {r["event_type"]: r for r in
           AN.hour_of_day_entropy(_events(spark, rows)).collect()}
    assert out["a"]["n_hours_active"] == 1
    # the c*ln(c) grid is 1e-6: |H| <= n_terms/1e6/n
    assert abs(out["a"]["entropy"]) < 1e-6
    assert out["b"]["n_hours_active"] == 2
    assert abs(out["b"]["entropy"] - math.log(2)) < 1e-6


def test_doc_length_gini_equal_lengths_zero(spark):
    from stock_data_etl_pipeline_spark.functions.text import words as W
    df = spark.createDataFrame(
        [(1, "a b c", "s"), (2, "d e f", "s")],
        "doc_id long, text string, source string")
    tok = df.select("source", "doc_id", F.explode(W("text")).alias("_w"))
    out = AN.grouped_count_gini(tok, "source", "doc_id").collect()[0]
    assert out["n_entities"] == 2 and out["n_rows"] == 6
    assert out["gini"] == 0.0  # equal lengths: perfect equality
