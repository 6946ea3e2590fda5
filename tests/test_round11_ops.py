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


def _docs(spark, texts, sources=None):
    srcs = sources or ["s0"] * len(texts)
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(zip(texts, srcs))],
        "doc_id long, text string, lang string, source string, n_chars long")


def test_good_turing_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators import corpus as CP
    # counts: a:2, b:2, c:1 -> N_1=1, N_2=2, N=5
    out = {r["r"]: r for r in
           CP.good_turing_counts(_docs(spark, ["a a b", "b c"])).collect()}
    assert set(out) == {1, 2}
    r1, r2 = out[1], out[2]
    assert r1["n_r"] == 1 and r1["n_next"] == 2
    assert r1["r_star"] == 4.0 and abs(r1["p_gt"] - 0.8) < 1e-15
    assert r2["n_r"] == 2 and r2["n_next"] == 0 and r2["r_star"] == 0.0


def test_tokenizer_fertility_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators import corpus as CP
    out = CP.tokenizer_fertility(_docs(spark, ["ab cd"])).collect()
    assert len(out) == 1
    r = out[0]
    # nw=2, ns=ceil(5/4)=2, nc=5
    assert r["n_words"] == 2 and r["n_subwords"] == 2
    assert r["fertility"] == 1.0 and r["chars_per_word"] == 2.5


def test_kn_perplexity_hand_computed(spark):
    import math
    from stock_data_etl_pipeline_spark.operators import corpus as CP
    # d0="a b", d1="a b a c": B=3, ctx(a)=3 ctx(b)=1, T1(a)=2 T1(b)=1,
    # cont(a)=cont(b)=cont(c)=1
    out = {r["doc_id"]: r for r in CP.kn_bigram_perplexity(
        _docs(spark, ["a b", "a b a c", "z"])).collect()}
    q_ab = round(-math.log2(21 / 36) * 1e6)      # (a,b): p = 7/12
    q_ba = round(-math.log2(6 / 12) * 1e6)       # (b,a): p = 1/2
    q_ac = round(-math.log2(9 / 36) * 1e6)       # (a,c): p = 1/4
    assert out[0]["n_bigrams"] == 1
    assert out[0]["kn_score"] == q_ab / 1 / 1e6
    assert out[1]["n_bigrams"] == 3
    assert out[1]["kn_score"] == (q_ab + q_ba + q_ac) / 3 / 1e6
    assert out[2]["n_bigrams"] == 0 and out[2]["kn_score"] is None


def test_rake_word_scores_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators import corpus as CP
    # stopword-delimited phrases: [quick fox], [lazy dog], [park]
    out = {r["word"]: r for r in CP.rake_word_scores(
        _docs(spark, ["the quick fox and lazy dog in park"])).collect()}
    assert set(out) == {"quick", "fox", "lazy", "dog", "park"}
    for w in ("quick", "fox", "lazy", "dog"):
        assert out[w]["freq"] == 1 and out[w]["degree"] == 2
        assert out[w]["rake_score"] == 2.0
    assert out["park"]["degree"] == 1 and out["park"]["rake_score"] == 1.0


# ---------------------------------------------------------------------------
# round-11 session 2: promised families — RI orphans, SRM, t-closeness,
# HITS, label propagation, isotropy, Matryoshka recall, sign recall
# ---------------------------------------------------------------------------

def test_referential_orphan_census_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.quality import (
        referential_orphan_census)
    child = spark.createDataFrame(
        [(1,), (2,), (None,), (5,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = referential_orphan_census(
        [("child.parent", child, "fk", parent, "pk")]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_child_rows"], r["n_null_keys"], r["n_orphans"]) \
        == (4, 1, 1)                       # only fk=5 is an orphan
    assert r["orphan_pct"] == round(100.0 * 1 / 3, 6)

    # all-null FK column: zero orphans, pct NULL (no checkable rows)
    allnull = spark.createDataFrame([(None,), (None,)], "fk long")
    r2 = referential_orphan_census(
        [("x.parent", allnull, "fk", parent, "pk")]).collect()[0]
    assert (r2["n_null_keys"], r2["n_orphans"]) == (2, 0)
    assert r2["orphan_pct"] is None


def test_srm_check_matches_independent_md5_assignment(spark):
    import hashlib
    from stock_data_etl_pipeline_spark.operators.quality import srm_check

    users = list(range(1, 41))
    rows = [(u, "exp_a") for u in users]
    # duplicate events for some users must not double-count (distinct)
    rows += [(u, "exp_a") for u in users[:10]]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = srm_check(ev).collect()
    assert len(out) == 1
    r = out[0]

    def arm(u: int) -> int:
        return (int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
                % 100) % 2

    n0 = sum(1 for u in users if arm(u) == 0)
    n1 = len(users) - n0
    assert (r["n_arm0"], r["n_arm1"]) == (n0, n1)
    assert r["chi2"] == (n0 - n1) ** 2 / (n0 + n1)
    assert r["srm_flag"] == (1000 * (n0 - n1) ** 2 > 3841 * (n0 + n1))


def test_t_closeness_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        t_closeness_profile)
    from pyspark.sql import functions as F
    # classes: A = 3 rows in bucket 0; B = 1×b0 + 2×b1; C = 2×b1
    # global: n=8, cq=(4,4), B buckets nb=2 (one interior cut at b0)
    rows = ([("A", 0)] * 3 + [("B", 0)] + [("B", 1)] * 2 + [("C", 1)] * 2)
    df = spark.createDataFrame(rows, "qi string, b long")
    out = {r["qi"]: r for r in
           t_closeness_profile(df, ["qi"], F.col("b")).collect()}
    # t = |cpc·n − cqc·m| / (m·n·(nb−1)) at the single interior cut
    assert out["A"]["class_rows"] == 3
    assert out["A"]["t_emd"] == abs(3 * 8 - 4 * 3) / (3 * 8 * 1)  # 0.5
    assert out["B"]["t_emd"] == abs(1 * 8 - 4 * 3) / (3 * 8 * 1)
    assert out["C"]["t_emd"] == abs(0 * 8 - 4 * 2) / (2 * 8 * 1)  # 0.5
    # the class matching the global distribution exactly scores 0
    balanced = spark.createDataFrame(
        [("D", 0), ("D", 1), ("E", 0), ("E", 1)], "qi string, b long")
    for r in t_closeness_profile(balanced, ["qi"], F.col("b")).collect():
        assert r["t_emd"] == 0.0


def test_hits_bipartite_one_iteration_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        HITS_SCALE, hits_bipartite)
    e = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "cust long, part long")
    out = hits_bipartite(e, "cust", "part", iters=1, top=10).collect()
    scores = {(r["kind"], r["node"]): r["score_e12"] for r in out}
    h0 = HITS_SCALE // 2
    # a1 raw: part10 = 2·h0 = SCALE, part11 = h0; total 1.5·SCALE → g=1
    assert scores[("authority", 10)] == 2 * h0
    assert scores[("authority", 11)] == h0
    # h1 raw: cust1 = a(10)+a(11) = 1.5·SCALE, cust2 = SCALE;
    # total 2.5·SCALE → g=2 → floor-halved
    assert scores[("hub", 1)] == (2 * h0 + h0) // 2
    assert scores[("hub", 2)] == (2 * h0) // 2
    # rank order inside each kind: score desc then node asc
    kinds = [(r["kind"], r["node"]) for r in out]
    assert kinds == [("authority", 10), ("authority", 11),
                     ("hub", 1), ("hub", 2)]


def test_label_propagation_two_triangles(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        label_propagation)
    tri = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
    pairs = spark.createDataFrame(tri, "a long, b long")
    out = label_propagation(pairs, "a", "b", iters=2).collect()
    # each triangle converges onto its minimum node id as the label
    assert [(r["label"], r["n_members"]) for r in out] \
        == [(1, 3), (4, 3)]


def test_isotropy_profile_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import (
        isotropy_profile)
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [-1.0, 0.0, 0.0]),
         (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    r = isotropy_profile(vecs).collect()[0]
    assert (r["n_vectors"], r["n_dims"], r["dead_dims"]) == (3, 3, 2)
    assert r["min_var_dim"] == 1     # vn ties (dims 1,2) -> smaller dim
    assert r["max_var_dim"] == 0
    assert r["var_ratio"] == 0.0


def test_matryoshka_recall_prefix_inversion(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import (
        matryoshka_recall_at_k)
    # vid1's 2-dim prefix is PERFECTLY aligned with the query even
    # though its full-dim cosine ranks below vid2 — truncation must
    # cost recall at m=2 and restore it at m=4
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]),
         (1, [0.7, 0.0, 0.9, 0.0]),
         (2, [0.8, 0.2, 0.0, 0.0])],
        "vec_id long, embedding array<float>")
    out = {r["prefix_dims"]: r for r in matryoshka_recall_at_k(
        vecs, k=2, query_id=0, prefixes=(2, 4)).collect()}
    assert out[2]["n_exact"] == 2
    assert out[2]["recall"] == 0.5   # m=2 top-2 = {0,1}, exact = {0,2}
    assert out[4]["recall"] == 1.0


def test_sign_recall_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import (
        sign_recall_at_k)
    vecs = spark.createDataFrame(
        [(0, [1.0, -1.0, 1.0, -1.0]),
         (1, [2.0, -3.0, 1.0, -1.0]),   # signs agree 4/4, cos ~0.904
         (2, [1.0, 1.0, 1.0, 1.0]),     # agree 2/4, cos 0
         (3, [-1.0, 1.0, -1.0, 1.0])],  # agree 0/4, cos -1
        "vec_id long, embedding array<float>")
    r = sign_recall_at_k(vecs, k=2, query_id=0).collect()[0]
    assert (r["n_exact"], r["n_sign_hits"]) == (2, 2)
    assert r["recall"] == 1.0


def test_powerlaw_alpha_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        powerlaw_alpha)
    # triangle {1,2,3} plus leaves 4,5 on node 1:
    # degrees 1:4, 2:2, 3:2, 4:1, 5:1 -> tail(d>=2) = {1,2,3}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4), (1, 5)], "a long, b long")
    r = powerlaw_alpha(pairs, "a", "b", d_min=2).collect()[0]
    assert (r["d_min"], r["n_nodes"], r["n_tail"]) == (2, 5, 3)
    s = round(math.log(4 / 2.0) * 1e9)  # d=2 terms are ln(1)=0
    assert r["alpha"] == 1.0 + 3.0 * 1e9 / s

    # all-tail-at-dmin: MLE undefined -> NULL
    path = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    assert powerlaw_alpha(path, "a", "b", d_min=2).collect()[0]["alpha"] \
        is None


def test_calmar_ratio_hand_computed(spark):
    b = _bars(spark, [("a", 0, 100.0, 100.0, 100.0, 100.0, 1),
                      ("a", 1, 120.0, 120.0, 120.0, 120.0, 1),
                      ("a", 2, 90.0, 90.0, 90.0, 90.0, 1),
                      ("a", 3, 110.0, 110.0, 110.0, 110.0, 1)])
    r = ind.calmar_ratio(b).collect()[0]
    assert r["n_bars"] == 4
    total = round(math.log(11000 / 10000), 6)
    assert r["total_ret"] == total
    assert r["max_drawdown"] == -0.25  # trough 90 off the 120 peak
    assert r["calmar"] == round(total / 0.25, 6)

    # monotone tape: no drawdown -> NULL calmar
    mono = _bars(spark, [("b", 0, 1.0, 1.0, 1.0, 1.0, 1),
                         ("b", 1, 2.0, 2.0, 2.0, 2.0, 1)])
    assert ind.calmar_ratio(mono).collect()[0]["calmar"] is None


def test_vocab_overlap_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        vocab_overlap)
    docs = spark.createDataFrame(
        [(0, "a b c", "A"), (1, "b c", "A"), (2, "b c d", "B")],
        "doc_id long, text string, source string")
    r = vocab_overlap(docs).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["source_a"], row["source_b"]) == ("A", "B")
    assert (row["vocab_a"], row["vocab_b"], row["n_common"]) == (3, 3, 2)
    assert row["jaccard"] == 2 / 4


def test_session_entropy_hand_computed(spark):
    import datetime as _dt
    from stock_data_etl_pipeline_spark.operators.analytics import (
        session_entropy_profile)
    t0 = _dt.datetime(2024, 1, 8, 10, 0)
    rows = [
        # user 1: one 3-event session, types x, x, y
        (1, t0, 1, "x"), (1, t0 + _dt.timedelta(seconds=60), 2, "x"),
        (1, t0 + _dt.timedelta(seconds=120), 3, "y"),
        # user 2: one singleton session (H = 0)
        (2, t0, 4, "x"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string")
    out = {r["size_class"]: r
           for r in session_entropy_profile(ev).collect()}
    t = round(2 * math.log(2) * 1e6)  # the c=2 term; c=1 contributes 0
    hq = round((math.log(3) - (t / 1e6) / 3) * 1e6)
    assert out["3-5"]["n_sessions"] == 1
    assert out["3-5"]["mean_entropy"] == round(hq / 1 / 1e6, 6)
    assert out["1"]["mean_entropy"] == 0.0


def test_stopword_drift_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        stopword_drift)
    docs = spark.createDataFrame(
        [(0, "the cat", "A"), (1, "cat dog", "B")],
        "doc_id long, text string, source string")
    out = {r["source"]: r for r in stopword_drift(docs).collect()}
    assert (out["A"]["n_tokens"], out["A"]["n_stopwords"]) == (2, 1)
    assert out["A"]["stopword_ratio"] == 0.5
    assert out["A"]["corpus_ratio"] == 0.25
    assert out["A"]["drift"] == 0.25
    assert out["B"]["drift"] == -0.25


def test_generalization_ladder_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        generalization_ladder)
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "x")],
        "g1 string, g2 string")
    out = {r["level"]: r for r in generalization_ladder(
        df, [("1_fine", ["g1", "g2"]), ("2_coarse", ["g1"])],
        k_thresh=2).collect()}
    f = out["1_fine"]
    assert (f["n_classes"], f["min_k"], f["rows_at_risk"]) == (3, 1, 2)
    assert f["at_risk_pct"] == 50.0
    c = out["2_coarse"]
    assert (c["n_classes"], c["min_k"], c["rows_at_risk"]) == (2, 1, 1)
    assert c["at_risk_pct"] == 25.0


def test_ktruss_peel_census_k4_clique_plus_pendant(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        ktruss_peel_census)
    # K4 on {1..4} (every edge in 2 triangles -> survives a 4-truss
    # peel) plus pendant edge 4-5 (support 0 -> peeled in round 1)
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    pairs = spark.createDataFrame(k4, "a long, b long")
    out = {r["iter"]: r for r in
           ktruss_peel_census(pairs, "a", "b", k=4, iters=2).collect()}
    assert (out[0]["n_edges"], out[0]["n_triangles"]) == (7, 4)
    assert (out[1]["n_edges"], out[1]["n_triangles"]) == (6, 4)
    assert (out[2]["n_edges"], out[2]["n_triangles"]) == (6, 4)


def test_benford_chi2_cells_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        BENFORD_EXPECTED)
    from stock_data_etl_pipeline_spark.operators.quality import (
        benford_chi2_cells)
    # negative and zero amounts drop BEFORE digit extraction (an ANSI
    # cast of '-' would otherwise crash the audit) — round-11 review
    df = spark.createDataFrame(
        [(1.00,), (1.50,), (2.00,), (9.99,), (-3.50,), (0.0,)],
        "v double")
    rows = benford_chi2_cells(df, "v").collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    by = {r["digit"]: r for r in rows}
    assert by[1]["n_obs"] == 2 and by[1]["obs_pct"] == 0.5
    assert by[2]["n_obs"] == 1 and by[9]["n_obs"] == 1
    assert by[3]["n_obs"] == 0          # zero-filled absent digit
    p1 = BENFORD_EXPECTED[1]            # the ONE shared constant table
    assert by[1]["expected_pct"] == p1
    dev = 2.0 - 4.0 * p1
    assert by[1]["chi2_term"] == dev * dev / (4.0 * p1)


def test_markov_steady_state_hand_computed(spark):
    import datetime as _dt
    from stock_data_etl_pipeline_spark.operators.analytics import (
        MARKOV_SCALE, markov_steady_state)
    t0 = _dt.datetime(2024, 1, 8, 10, 0)
    # user 1 walks a -> b -> a -> b: transitions a->b (2), b->a (1)
    rows = [(1, t0 + _dt.timedelta(seconds=i), i, ty)
            for i, ty in enumerate(["a", "b", "a", "b"])]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string")
    out = {r["event_type"]: r["pi_e12"]
           for r in markov_steady_state(ev, iters=1).collect()}
    # rows: a -> b always (rs=2, c=2); b -> a always (rs=1, c=1)
    p0 = MARKOV_SCALE // 2
    assert out["b"] == (p0 * 2) // 2   # all of a's mass
    assert out["a"] == (p0 * 1) // 1   # all of b's mass

    # an absorbing source state keeps a zero-filled row (never vanishes)
    rows2 = [(1, t0, 1, "x"), (1, t0 + _dt.timedelta(seconds=1), 2, "y")]
    ev2 = spark.createDataFrame(
        rows2, "user_id long, ts timestamp, event_id long, "
               "event_type string")
    out2 = {r["event_type"]: r["pi_e12"]
            for r in markov_steady_state(ev2, iters=1).collect()}
    assert out2["x"] == 0              # no incoming edge, zero-filled
    assert out2["y"] == MARKOV_SCALE // 2  # holds what x pushed
    # a second iteration drains y too (no outgoing row = absorbing
    # leak; the chain is deliberately not made stochastic-complete,
    # and the oracle mirrors the same semantics)
    out3 = {r["event_type"]: r["pi_e12"]
            for r in markov_steady_state(ev2, iters=2).collect()}
    assert out3 == {"x": 0, "y": 0}


def test_column_profile_drift_hand_computed(spark):
    import datetime as _dt
    from stock_data_etl_pipeline_spark.operators.quality import (
        column_profile_drift)
    t0 = _dt.datetime(2024, 1, 8, 0, 0)
    # first half: rows at t+0h, t+1h; second half: t+9h, t+10h
    rows = [(t0, "a", 1), (t0 + _dt.timedelta(hours=1), "a", None),
            (t0 + _dt.timedelta(hours=9), None, 2),
            (t0 + _dt.timedelta(hours=10), "b", 2)]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v long")
    out = {r["column"]: r
           for r in column_profile_drift(df, "ts", ["k", "v"]).collect()}
    k = out["k"]
    assert (k["n_first"], k["n_second"]) == (2, 2)
    assert k["null_pct_first"] == 0.0
    assert k["null_pct_second"] == 0.5
    assert k["null_pct_delta"] == 0.5
    assert (k["distinct_first"], k["distinct_second"]) == (1, 1)
    v = out["v"]
    assert v["null_pct_first"] == 0.5 and v["null_pct_second"] == 0.0
    assert (v["distinct_first"], v["distinct_second"]) == (1, 1)


def test_contingency_chi2_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators.quality import (
        contingency_chi2)
    rows = [("p1", "A")] * 3 + [("p1", "B")] + [("p2", "A")] * 2
    df = spark.createDataFrame(rows, "pri string, st string")
    out = {(r["pri"], r["st"]): r
           for r in contingency_chi2(df, "pri", "st").collect()}
    # margins: p1=4, p2=2; A=5, B=1; n=6 — grid zero-fills (p2, B)
    assert len(out) == 4
    cell = out[("p1", "A")]
    e = 4.0 * 5.0 / 6.0
    assert cell["n_obs"] == 3 and cell["expected"] == e
    assert cell["chi2_term"] == (3.0 - e) ** 2 / e
    zf = out[("p2", "B")]
    assert zf["n_obs"] == 0 and zf["expected"] == 2.0 * 1.0 / 6.0


def test_updown_runs_test_hand_computed(spark):
    from stock_data_etl_pipeline_spark.operators import indicators as _i
    # closes 100,101,102,101,101,102: diffs +,+,-,0,+ -> signs
    # (+,+,-,+) after tie exclusion: n_up=3, n_down=1, runs=3
    b = _bars(spark, [("a", i, c, c, c, c, 1) for i, c in
                      enumerate([100.0, 101.0, 102.0, 101.0, 101.0,
                                 102.0])])
    r = _i.updown_runs_test(b).collect()[0]
    assert (r["n_up"], r["n_down"], r["n_runs"]) == (3, 1, 3)
    n1, n2 = 3.0, 1.0
    n = n1 + n2
    mu = 1.0 + 2.0 * n1 * n2 / n
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1.0))
    assert r["z"] == (3.0 - mu) / math.sqrt(var)

    # monotone tape: n_down = 0 -> variance 0 -> NULL z
    mono = _bars(spark, [("b", i, c, c, c, c, 1)
                         for i, c in enumerate([1.0, 2.0, 3.0])])
    assert _i.updown_runs_test(mono).collect()[0]["z"] is None


def test_hits_and_markov_empty_inputs_return_empty(spark):
    # round-11 review: an all-filtered-out upstream must yield an
    # EMPTY relation, never a ZeroDivisionError at plan-build time
    import pytest as _pytest
    from stock_data_etl_pipeline_spark.operators.analytics import (
        hits_bipartite, markov_steady_state)
    empty_e = spark.createDataFrame([], "cust long, part long")
    out = hits_bipartite(empty_e, "cust", "part")
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] \
        == ["kind", "node", "score_e12"]
    with _pytest.raises(ValueError):
        hits_bipartite(empty_e, "cust", "part", iters=0)

    import datetime as _dt
    one_per_user = spark.createDataFrame(
        [(1, _dt.datetime(2024, 1, 8), 1, "a"),
         (2, _dt.datetime(2024, 1, 8), 2, "b")],
        "user_id long, ts timestamp, event_id long, event_type string")
    out2 = markov_steady_state(one_per_user)
    assert out2.collect() == []
    assert [f.name for f in out2.schema.fields] \
        == ["event_type", "pi_e12"]


def test_poisson_overdispersion_hand_computed(spark):
    import datetime as _dt
    from stock_data_etl_pipeline_spark.operators.analytics import (
        poisson_overdispersion)
    t0 = _dt.datetime(2024, 1, 8, 0, 0)
    # global hour span 0..3 (4 grid hours). type "b": bursty — 4
    # events in hour 0, none elsewhere: counts (4,0,0,0):
    # n=4, S=4, Q=16 -> D = (4*16-16)/(3*4) = 4.0 -> overdispersed.
    # type "u": uniform — 1 event/hour: D = 0 (constant counts).
    rows = ([("b", t0 + _dt.timedelta(minutes=m)) for m in range(4)]
            + [("u", t0 + _dt.timedelta(hours=h)) for h in range(4)])
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["event_type"]: r
           for r in poisson_overdispersion(ev).collect()}
    b = out["b"]
    assert (b["n_hours"], b["n_events"]) == (4, 4)
    assert b["dispersion"] == 4.0 and b["overdispersed"]
    u = out["u"]
    assert u["dispersion"] == 0.0 and not u["overdispersed"]
