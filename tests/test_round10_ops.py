"""Hand-computed fixtures for the round-10 operators: two-sample KS,
dow×hour seasonal decomposition, grouped activity Gini, embedding
hubness / two-NN intrinsic dimension / JL distortion, graph closure and
neighbor-degree curves, and corpus sentence/diversity profiles."""

from __future__ import annotations

import datetime as dt
import math

from stock_data_etl_pipeline_spark.operators import analytics as AN
from stock_data_etl_pipeline_spark.operators import corpus as CP
from stock_data_etl_pipeline_spark.operators import similarity as SIM

SAT = dt.datetime(2024, 1, 6, 10, 0)   # Saturday  -> weekend
MON = dt.datetime(2024, 1, 8, 10, 0)   # Monday    -> weekday


def _events(spark, rows):
    # rows: (event_type, user_id, ts, value)
    return spark.createDataFrame(
        [(int(i), ts, int(u), t, float(v))
         for i, (t, u, ts, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")


def test_ks_two_sample_hand_computed(spark):
    # weekday values {1, 2}, weekend values {2, 3}: ECDF gap peaks at
    # 0.5 (at v=1: 0.5 vs 0, and at v=2: 1.0 vs 0.5)
    ev = _events(spark, [("a", 1, MON, 1.0), ("a", 1, MON, 2.0),
                         ("a", 2, SAT, 2.0), ("a", 2, SAT, 3.0)])
    out = AN.ks_two_sample(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_weekend"] == 2 and r["n_weekday"] == 2
    assert abs(r["ks_stat"] - 0.5) < 1e-12

    # identical distributions -> KS = 0
    ev2 = _events(spark, [("b", 1, MON, 5.0), ("b", 2, SAT, 5.0)])
    assert AN.ks_two_sample(ev2).collect()[0]["ks_stat"] == 0.0


def test_dow_hour_decomposition_zero_fills_and_decomposes(spark):
    # two events Monday 10:00, one Monday 11:00 -> dow=1 (0=Sun)
    ev = _events(spark, [("a", 1, MON, 1.0), ("a", 1, MON, 1.0),
                         ("a", 1, MON.replace(hour=11), 1.0)])
    rows = {(r["dow"], r["hr"]): r
            for r in AN.dow_hour_decomposition(ev).collect()}
    assert len(rows) == 168  # full domain, zero-filled
    cell = rows[(1, 10)]
    assert cell["n"] == 2
    exp = 3 / 24.0 + 2 / 7.0 - 3 / 168.0
    assert abs(cell["expected"] - exp) < 1e-12
    assert abs(cell["residual"] - (2.0 - exp)) < 1e-12
    assert rows[(0, 0)]["n"] == 0  # untouched cell present with n=0


def test_grouped_count_gini_hand_computed(spark):
    # group a: user counts [1, 1, 2] -> S1 = 1+2+6 = 9? no:
    # sorted x = 1,1,2 at ranks 1,2,3: S1 = 1·1 + 1·2 + 2·3 = 9,
    # n=3, sx=4 -> num = 2·9 − 4·4 = 2, den = 12 -> G = 1/6.
    # group b: equal counts -> G = 0.
    ev = _events(spark, [("a", 1, MON, 0.0),
                         ("a", 2, MON, 0.0),
                         ("a", 3, MON, 0.0), ("a", 3, MON, 0.0),
                         ("b", 1, MON, 0.0), ("b", 1, MON, 0.0),
                         ("b", 2, MON, 0.0), ("b", 2, MON, 0.0)])
    out = {r["event_type"]: r
           for r in AN.grouped_count_gini(ev, "event_type",
                                          "user_id").collect()}
    a, b = out["a"], out["b"]
    assert a["n_entities"] == 3 and a["n_rows"] == 4
    assert abs(a["gini"] - 2.0 / 12.0) < 1e-12
    assert b["gini"] == 0.0


def _vecs(spark, rows):
    # rows: (vec_id, [floats], label)
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v], int(g)) for i, v, g in rows],
        "vec_id long, embedding array<float>, label int")


def test_knn_hubness_counts_antihubs(spark):
    # v1<->v2 are mutual 1-NNs; v3's NN is v2; v3 is nobody's NN
    e = _vecs(spark, [(1, [1.0, 0.0], 0),
                      (2, [0.9, 0.1], 0),
                      (3, [0.1, 0.9], 0)])
    out = {r["k_occurrence"]: r["n_vectors"]
           for r in SIM.knn_hubness(e, k=1).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_twonn_intrinsic_dim_hand_computed(spark):
    # unit vectors with exact cosines: a·b=0.8, a·c=0.6, b·c=0.96
    e = _vecs(spark, [(1, [1.0, 0.0], 0),
                      (2, [0.8, 0.6], 0),
                      (3, [0.6, 0.8], 0)])
    out = SIM.twonn_intrinsic_dim(e).collect()
    assert len(out) == 1
    r = out[0]
    s = (round(1e6 * math.log((1 - 0.6) / (1 - 0.8)))      # a: ln 2
         + round(1e6 * math.log((1 - 0.8) / (1 - 0.96)))   # b: ln 5
         + round(1e6 * math.log((1 - 0.6) / (1 - 0.96))))  # c: ln 10
    assert r["n_vectors"] == 3 and r["n_used"] == 3
    assert abs(r["twonn_dim"] - 2000000.0 * 3 / s) < 1e-9


def test_twonn_excludes_duplicate_nn(spark):
    # v1 == v2 exactly -> their s1 = 1.0 -> excluded from the MLE
    e = _vecs(spark, [(1, [1.0, 0.0], 0),
                      (2, [1.0, 0.0], 0),
                      (3, [0.8, 0.6], 0)])
    r = SIM.twonn_intrinsic_dim(e).collect()[0]
    assert r["n_vectors"] == 3 and r["n_used"] == 1  # only v3 usable


def test_jl_distortion_single_axis_pair_is_exact(spark):
    # consecutive ids differing in ONE coordinate: every projected
    # coordinate is ±q0, so the ratio is exactly 1.0, decile 10
    e = _vecs(spark, [(1, [1.0, 0.0, 0.0, 0.0], 0),
                      (2, [0.5, 0.0, 0.0, 0.0], 0)])
    out = SIM.jl_distortion(e, in_dim=4, out_dim=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ratio_decile"] == 10 and r["n_pairs"] == 1
    assert r["min_ratio"] == 1.0 and r["max_ratio"] == 1.0


def test_jl_sign_matrix_is_md5_parity():
    m = SIM.jl_sign_matrix(4, 2)
    import hashlib
    for j in range(2):
        for i in range(4):
            h = int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:15], 16)
            assert m[j][i] == (1 if h % 2 == 0 else -1)


def _pairs(spark, edges):
    return spark.createDataFrame([(int(a), int(b)) for a, b in edges],
                                 "pa long, pb long")


def test_closure_by_degree_triangle_plus_pendant(spark):
    # K3 {1,2,3} plus pendant 4-3: degrees 2,2,3,1; each K3 node in
    # one triangle. bucket 2 = degrees 2..3, bucket 1 = degree 1.
    p = _pairs(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    out = {r["degree_bucket"]: r
           for r in AN.closure_by_degree(p, "pa", "pb").collect()}
    b2 = out[2]
    assert b2["n_nodes"] == 3 and b2["n_triangles"] == 3
    assert abs(b2["closure"] - 6.0 / 10.0) < 1e-12  # 2·3 / (2+2+6)
    b1 = out[1]
    assert b1["n_nodes"] == 1 and b1["n_triangles"] == 0
    assert b1["closure"] is None  # no wedges at degree 1


def test_neighbor_degree_curve_hand_computed(spark):
    # same graph: snd(1)=5, snd(2)=5, snd(3)=5, snd(4)=3
    p = _pairs(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    out = {r["degree_bucket"]: r
           for r in AN.neighbor_degree_curve(p, "pa", "pb").collect()}
    assert out[1]["n_nodes"] == 1 and out[1]["sum_degree"] == 1
    assert abs(out[1]["avg_nbr_degree"] - 3.0) < 1e-12
    assert out[2]["sum_degree"] == 7
    assert abs(out[2]["avg_nbr_degree"] - 15.0 / 7.0) < 1e-12


def _docs(spark, rows):
    return spark.createDataFrame(
        [(int(i), t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def test_sentence_profile_hand_computed(spark):
    d = _docs(spark, [("s1", "Hello world. Bye!"), ("s1", "One")])
    out = CP.sentence_profile(d).collect()
    assert len(out) == 1
    r = out[0]
    # sentences: ["Hello world", "Bye"] (11+3 chars) and ["One"] (3)
    assert r["n_docs"] == 2 and r["n_sentences"] == 3
    assert r["max_sentences"] == 2
    assert abs(r["mean_sentences_per_doc"] - 1.5) < 1e-12
    assert abs(r["mean_sentence_chars"] - 17.0 / 3.0) < 1e-12


def test_diversity_profile_hand_computed(spark):
    d = _docs(spark, [("s1", "a a b")])
    r = CP.diversity_profile(d).collect()[0]
    assert r["vocab"] == 2 and r["n_tokens"] == 3
    assert abs(r["ttr"] - 2.0 / 3.0) < 1e-12
    s = round(1e6 * (2.0 * math.log(2.0)))
    assert abs(r["word_entropy"] - (math.log(3.0) - s / 1e6 / 3.0)) < 1e-12


def test_readability_profile_hand_computed(spark):
    # "Hello world. Bye!": words [Hello, world., Bye!] -> syllables
    # 2 + 1 + 1 (vowel runs, [aeiouy]); sentences 2
    d = _docs(spark, [("s1", "Hello world. Bye!")])
    r = CP.readability_profile(d).collect()[0]
    assert (r["sw"], r["ss"], r["sy"]) == (3, 2, 4)
    wps, spw = 3.0 / 2.0, 4.0 / 3.0
    assert abs(r["flesch_ease"] - (206.835 - 1.015 * wps - 84.6 * spw)) \
        < 1e-9
    assert abs(r["fk_grade"] - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-9


def test_word_burstiness_hand_computed(spark):
    # docs "a a b" and "a c": VMR(a) = (2·5−9)/(2·3) = 1/6,
    # VMR(b) = VMR(c) = (2·1−1)/(2·1) = 1/2
    d = _docs(spark, [("s1", "a a b"), ("s1", "a c")])
    out = CP.word_burstiness(d, top=3).collect()
    assert [r["word"] for r in out] == ["a", "b", "c"]  # t desc, word
    byw = {r["word"]: r for r in out}
    assert byw["a"]["total_count"] == 3 and byw["a"]["doc_freq"] == 2
    assert abs(byw["a"]["vmr"] - 1.0 / 6.0) < 1e-12
    assert abs(byw["b"]["vmr"] - 0.5) < 1e-12


def test_closure_by_degree_star_graph_has_no_triangles(spark):
    # hub stress: K1,40 — degree orientation must not fan the hub out;
    # no triangles anywhere, every bucket closure NULL or 0 wedges at
    # the leaves
    p = _pairs(spark, [(0, i) for i in range(1, 41)])
    out = AN.closure_by_degree(p, "pa", "pb").collect()
    assert sum(r["n_triangles"] for r in out) == 0
    leaves = [r for r in out if r["degree_bucket"] == 1][0]
    assert leaves["n_nodes"] == 40 and leaves["closure"] is None
    hub = [r for r in out if r["degree_bucket"] == 6][0]  # bin(40)=6 bits
    assert hub["n_nodes"] == 1 and hub["closure"] == 0.0


def test_neighbor_degree_star_graph(spark):
    # leaves' only neighbor is the hub (deg 40); hub's neighbors are
    # all leaves (deg 1): knn(leaf bucket)=40, knn(hub bucket)=1
    p = _pairs(spark, [(0, i) for i in range(1, 41)])
    out = {r["degree_bucket"]: r
           for r in AN.neighbor_degree_curve(p, "pa", "pb").collect()}
    assert abs(out[1]["avg_nbr_degree"] - 40.0) < 1e-12
    assert abs(out[6]["avg_nbr_degree"] - 1.0) < 1e-12


def test_grouped_count_gini_matches_bruteforce(spark):
    # pseudo-random count multiset vs the sorted-rank formula in
    # plain Python — pins the histogram algebra end to end
    counts = [((i * 7919) % 13) + 1 for i in range(40)]  # deterministic
    rows = []
    for u, c in enumerate(counts):
        rows += [("a", u, MON, 0.0)] * c
    ev = _events(spark, rows)
    r = AN.grouped_count_gini(ev, "event_type", "user_id").collect()[0]
    xs = sorted(counts)
    n, sx = len(xs), sum(xs)
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    exp = (2 * s1 - (n + 1) * sx) / (n * sx)
    assert r["n_entities"] == n and r["n_rows"] == sx
    assert abs(r["gini"] - exp) < 1e-12


def test_ks_disjoint_supports_is_one(spark):
    # weekday mass entirely below weekend mass -> KS = 1
    ev = _events(spark, [("a", 1, MON, 1.0), ("a", 1, MON, 2.0),
                         ("a", 2, SAT, 5.0), ("a", 2, SAT, 6.0)])
    assert abs(AN.ks_two_sample(ev).collect()[0]["ks_stat"] - 1.0) < 1e-12


def test_jl_distortion_requires_consecutive_ids(spark):
    # non-consecutive ids -> no pairs -> empty histogram (never a
    # cross join fallback)
    e = _vecs(spark, [(1, [1.0, 0.0], 0), (5, [0.0, 1.0], 0)])
    assert SIM.jl_distortion(e, in_dim=2, out_dim=4).collect() == []


def test_psi_from_daily_histogram_hand_computed(spark):
    import datetime as dt

    from stock_data_etl_pipeline_spark.operators.quality import (
        psi_from_daily_histogram)
    d1, d2, d3 = (dt.datetime(2024, 1, i, 0, 0) for i in (1, 2, 3))
    h = spark.createDataFrame(
        # day1 == day2 (identical dists -> psi 0); day3 all mass in
        # bucket 9
        [(d1, 0, 2), (d1, 1, 2),
         (d2, 0, 2), (d2, 1, 2),
         (d3, 9, 4)],
        "day timestamp, bucket int, c long")
    out = {r["day"]: r for r in psi_from_daily_histogram(h).collect()}
    assert len(out) == 3
    assert out[d1]["psi"] == 0.0 and not out[d1]["drifted"]
    assert out[d2]["psi"] == 0.0 and not out[d2]["drifted"]
    # day3 vs day1 across the dense 10-bucket grid, Laplace (c+1)/(n+10)
    s9 = 0
    for b in range(10):
        c3 = 4 if b == 9 else 0
        c1 = 2 if b in (0, 1) else 0
        p, q = (c3 + 1) / 14.0, (c1 + 1) / 14.0
        s9 += round(1e9 * ((p - q) * math.log(p / q)))
    assert abs(out[d3]["psi"] - s9 / 1e9) < 1e-12
    assert out[d3]["n_events"] == 4
    assert out[d3]["drifted"] == (s9 / 1e9 > 0.2)


def test_l_diversity_hand_computed(spark):
    from pyspark.sql import functions as F

    from stock_data_etl_pipeline_spark.operators.analytics import (
        l_diversity_profile)
    df = spark.createDataFrame(
        # class (a,x): 3 rows, 1 distinct sensitive -> l=1 (at risk)
        # class (a,y): 2 rows, 2 distinct -> l=2 (at risk under l>=3)
        # class (b,x): 3 rows, 3 distinct -> l=3 (safe)
        [("a", "x", 1), ("a", "x", 1), ("a", "x", 1),
         ("a", "y", 1), ("a", "y", 2),
         ("b", "x", 1), ("b", "x", 2), ("b", "x", 3)],
        "q1 string, q2 string, s int")
    out = {r["l"]: r for r in l_diversity_profile(
        df, ["q1", "q2"], F.col("s")).collect()}
    assert out[1]["n_classes"] == 1 and out[1]["n_rows"] == 3
    assert out[1]["at_risk"] and out[2]["at_risk"]
    assert out[3]["n_classes"] == 1 and not out[3]["at_risk"]


def test_minvar_pair_weights_hand_computed(spark):
    import datetime as dt

    from stock_data_etl_pipeline_spark.operators import indicators as ind
    T0 = dt.datetime(2024, 1, 1)
    rows = []
    for h, (ca, cb) in enumerate([(10, 10), (20, 40), (10, 10),
                                  (20, 40)]):
        rows.append(("A", T0 + dt.timedelta(hours=h), 1.0, 100.0, 1.0,
                     float(ca), 1))
        rows.append(("B", T0 + dt.timedelta(hours=h), 1.0, 100.0, 1.0,
                     float(cb), 1))
    bars = spark.createDataFrame(
        rows, "event_type string, hr timestamp, open double, "
              "high double, low double, close double, volume long")
    out = ind.minvar_pair_weights(bars).collect()
    assert len(out) == 1
    r = out[0]
    # A returns ±ln2, B returns ±ln4 on the 1e-4 grid, perfectly
    # correlated: algebra collapses to w_a = rb/(rb − ra)
    ra, rb = round(1e4 * math.log(2)), round(1e4 * math.log(4))
    assert r["n_obs"] == 3
    assert abs(r["w_a"] - rb / (rb - ra)) < 1e-12
    assert abs(r["w_a"] + r["w_b"] - 1.0) < 1e-12


def test_dow_hour_anomalies_integer_flag(spark):
    # uniform background (1 event per cell) + one hot cell: the hot
    # cell's residual dominates ΣR² and must be the only flag
    rows = []
    base = dt.datetime(2024, 1, 1)  # Monday
    i = 0
    for d in range(7):
        for h in range(24):
            rows.append(("a", 1, base + dt.timedelta(days=d, hours=h),
                         0.0))
            i += 1
    hot = base + dt.timedelta(days=1, hours=3)
    rows += [("a", 1, hot, 0.0)] * 80
    ev = _events(spark, rows)
    out = AN.dow_hour_anomalies(ev).collect()
    assert len(out) == 1
    r = out[0]
    # Monday 2024-01-01 -> dow=1; hot cell is Tuesday (dow=2), hr=3
    assert (r["dow"], r["hr"], r["n"]) == (2, 3, 81)
    # exact integer residual numerator: R = 168n − 7rs − 24cs + g
    R = 168 * 81 - 7 * (24 + 80) - 24 * (7 + 80) + (168 + 80)
    assert abs(r["residual"] - R / 168.0) < 1e-12
