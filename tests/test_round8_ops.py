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


def test_degree_assortativity_star_is_minus_one(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        degree_assortativity)
    star = spark.createDataFrame([(0, i) for i in (1, 2, 3)],
                                 "x long, y long")
    r = degree_assortativity(star, "x", "y").collect()[0]
    assert r["n_edges"] == 3
    assert r["assortativity"] == -1.0


def test_degree_assortativity_regular_graph_null(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import (
        degree_assortativity)
    tri = spark.createDataFrame([(1, 2), (2, 3), (3, 1)],
                                "x long, y long")
    r = degree_assortativity(tri, "x", "y").collect()[0]
    assert r["assortativity"] is None  # zero degree variance


def test_degree_assortativity_k4_plus_pendant(spark):
    # K4 on {1..4} + pendant (1,5): M=14, Σx=44, Σxy=134, Σxx=146
    # r = (14·134 − 44²)/(14·146 − 44²) = −60/108
    import itertools
    from stock_data_etl_pipeline_spark.operators.analytics import (
        degree_assortativity)
    edges = list(itertools.combinations(range(1, 5), 2)) + [(1, 5)]
    df = spark.createDataFrame(edges, "x long, y long")
    r = degree_assortativity(df, "x", "y").collect()[0]
    assert r["n_edges"] == 7
    assert r["assortativity"] == -60.0 / 108.0


def test_containment_catches_embedded_doc(spark):
    # B's 6 words are A's first 6: both of B's 5-shingles ⊂ A →
    # containment 1.0 while Jaccard is only 2/6
    from stock_data_etl_pipeline_spark.operators.dedup import (
        containment_pairs, ngram_jaccard_pairs)
    a_text = " ".join(f"w{i}" for i in range(10))
    b_text = " ".join(f"w{i}" for i in range(6))
    docs = spark.createDataFrame(
        [(1, a_text), (2, b_text), (3, "x y z q r s t")],
        "doc_id long, text string")
    out = containment_pairs(docs, threshold=0.5, k=5).collect()
    assert len(out) == 1
    assert (out[0]["id_a"], out[0]["id_b"], out[0]["containment"]) == \
        (1, 2, 1.0)
    jac = ngram_jaccard_pairs(docs, threshold=0.5, k=5).collect()
    assert jac == []  # symmetric Jaccard misses the embedded doc


def test_hapax_profile_hand_counts(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        hapax_profile)
    docs = spark.createDataFrame(
        [(1, "a a b", "X"), (2, "c c c", "Y")],
        "doc_id long, text string, source string")
    out = {r["source"]: r for r in hapax_profile(docs).collect()}
    assert (out["X"]["n_vocab"], out["X"]["n_hapax"],
            out["X"]["hapax_rate"]) == (2, 1, 0.5)
    assert (out["Y"]["n_vocab"], out["Y"]["n_hapax"],
            out["Y"]["hapax_rate"]) == (1, 0, 0.0)


def test_heaps_curve_linear_vocab_growth(spark):
    # doc i contributes tokens (t_i, common): cum_tokens(d) = 2d,
    # cum_vocab(d) = d + 1 (common is new only once)
    import math
    from stock_data_etl_pipeline_spark.operators.corpus import heaps_curve
    docs = spark.createDataFrame(
        [(i, f"t{i} common") for i in range(10)],
        "doc_id long, text string")
    out = sorted(heaps_curve(docs).collect(), key=lambda r: r["decile"])
    assert [r["cum_tokens"] for r in out] == [2 * d for d in range(1, 11)]
    assert [r["cum_vocab"] for r in out] == [d + 1 for d in range(1, 11)]
    assert out[0]["beta"] is None
    assert out[9]["beta"] == round(
        math.log(11 / 2) / math.log(20 / 2), 6)


def test_burst_minutes_integer_threshold(spark):
    # 10 calm minutes (1 event) + one 100-event minute: only the spike
    # clears mean + 3σ; all arithmetic integer
    import datetime as dtm
    rows = []
    for i in range(10):
        rows.append(("A", dtm.datetime(2024, 1, 1, 0, i, 30), i, 1.0, 1))
    for j in range(100):
        rows.append(("A", dtm.datetime(2024, 1, 1, 1, 0, j % 60),
                     100 + j, 1.0, 1))
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, "
              "value double, user_id long")
    # drive the same integer-threshold logic as events_burst_minutes
    m = (ev.groupBy("event_type",
                    F.date_trunc("minute", F.col("ts")).alias("minute"))
         .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    g = (m.groupBy("event_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("cnt").cast("long").alias("s"),
              F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sq")))
    j = m.join(F.broadcast(g), "event_type")
    dev = F.col("n") * F.col("cnt") - F.col("s")
    var9 = 9 * (F.col("n") * F.col("sq") - F.col("s") * F.col("s"))
    n_bursts = (j.filter((dev > 0) & (dev * dev > var9)).count())
    assert n_bursts == 1


def test_interarrival_quantiles_hand_gaps(spark):
    # type A at t = 0, 10, 30 s → gaps 10, 20: q50 = 10, q90 = 20
    import datetime as dtm
    base = dtm.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [("A", base + dtm.timedelta(seconds=s), i, 1.0, 1)
         for i, s in enumerate((0, 10, 30))],
        "event_type string, ts timestamp, event_id long, value double, "
        "user_id long")
    from pyspark.sql import Window as W
    from stock_data_etl_pipeline_spark.operators.aggregates import (
        grouped_exact_quantiles)
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    e = F.unix_timestamp("ts")
    d = (ev.select("event_type", (e - F.lag(e).over(w)).alias("gap"))
         .filter(F.col("gap").isNotNull()))
    r = grouped_exact_quantiles(d, "event_type", "gap").collect()[0]
    assert (r["n_rows"], r["q50"], r["q90"], r["q99"]) == (2, 10, 20, 20)


def test_bucket_balance_partitions_everything(spark):
    # every vector lands in exactly one bucket; shares ride the exact
    # integer grid and sum within one grid step of 1
    from stock_data_etl_pipeline_spark.plans.catalog_round8 import (
        embedding_bucket_balance)
    out = embedding_bucket_balance(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    total = sum(r["n_vecs"] for r in rows)
    import duckdb
    want = duckdb.sql("SELECT count(*) FROM "
                      "'/root/testdata/sf0.001/embeddings.parquet'"
                      ).fetchone()[0]
    assert total == want
    assert all(0.0 <= r["share"] <= 1.0 for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < len(rows) * 1e-6


def test_chande_momentum_hand_values(spark):
    # deltas +100, +100 → window all-gain: CMO = 100; then −100:
    # window (g=200, l=100): CMO = sign(+100)·(1e8·100)//300/1e6
    rows = [("A", 0, 10, 10, 10, 10, 5),
            ("A", 1, 11, 11, 11, 11, 5),
            ("A", 2, 12, 12, 12, 12, 5),
            ("A", 3, 11, 11, 11, 11, 5)]
    out = sorted(ind.chande_momentum(_bars(spark, rows)).collect(),
                 key=lambda r: r["hr"])
    assert out[0]["cmo"] is None          # no delta yet
    assert out[1]["cmo"] == 100.0
    assert out[2]["cmo"] == 100.0
    assert out[3]["cmo"] == 33.333333
    # symmetric down-leg: sign must flip through the split grid
    rows_dn = [("A", 0, 12, 12, 12, 12, 5),
               ("A", 1, 11, 11, 11, 11, 5),
               ("A", 2, 10, 10, 10, 10, 5),
               ("A", 3, 11, 11, 11, 11, 5)]
    dn = sorted(ind.chande_momentum(_bars(spark, rows_dn)).collect(),
                key=lambda r: r["hr"])
    assert dn[1]["cmo"] == -100.0
    assert dn[3]["cmo"] == -33.333333


def test_trix_constant_series_is_zero(spark):
    # constant close → every EWMA stage equals the close → trix = 0
    rows = [("A", i, 10, 10, 10, 10, 5) for i in range(5)]
    out = sorted(ind.trix(_bars(spark, rows)).collect(),
                 key=lambda r: r["hr"])
    assert out[0]["trix"] is None
    assert all(r["ew3"] == 10.0 for r in out)
    assert all(r["trix"] == 0.0 for r in out[1:])


def test_elder_ray_powers_bracket_ema(spark):
    # first bar: EMA = close exactly; bull = high − close, bear = low −
    # close
    rows = [("A", 0, 10, 12, 9, 10, 5)]
    r = ind.elder_ray(_bars(spark, rows)).collect()[0]
    assert (r["ema"], r["bull_power"], r["bear_power"]) == \
        (10.0, 2.0, -1.0)


def test_jaccard_linkpred_square_with_diagonalless_corners(spark):
    # square 1-2-3-4-1: non-adjacent diagonals (1,3) and (2,4) each
    # share BOTH neighbors: c=2, deg=2+2 → jaccard = 2/(4-2) = 1.0
    from stock_data_etl_pipeline_spark.operators.analytics import (
        jaccard_link_prediction)
    sq = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)],
                               "x long, y long")
    out = jaccard_link_prediction(sq, "x", "y").collect()
    got = {(r["a"], r["b"]): (r["common_neighbors"], r["jaccard"])
           for r in out}
    assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}


def test_jaccard_linkpred_excludes_existing_edges(spark):
    # triangle + pendant: every wedge pair is already an edge except
    # (2,4)/(3,4) via center 1
    from stock_data_etl_pipeline_spark.operators.analytics import (
        jaccard_link_prediction)
    g = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (1, 4)],
                              "x long, y long")
    out = jaccard_link_prediction(g, "x", "y").collect()
    pairs = {(r["a"], r["b"]) for r in out}
    assert (1, 2) not in pairs and (2, 3) not in pairs
    # (2,4): c=1 (center 1), deg2=2, deg4=1 → 1/(3-1) = 0.5
    got = {(r["a"], r["b"]): r["jaccard"] for r in out}
    assert got[(2, 4)] == 0.5 and got[(3, 4)] == 0.5


def test_association_rules_hand_counts(spark):
    # 4 baskets: {1,2} ×3, {1} ×1 → c1=4, c2=3, c12=3, N=4
    # confidence(1→2) = 3/4; lift = 4·3/(4·3) = 1.0 (independent-ish)
    from stock_data_etl_pipeline_spark.operators.analytics import (
        association_rules)
    rows = [(b, i) for b in (10, 20, 30) for i in (1, 2)] + [(40, 1)]
    df = spark.createDataFrame(rows, "bk long, it long")
    out = association_rules(df, "bk", "it", min_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["support"], r["ca"], r["cb"]) \
        == (1, 2, 3, 4, 3)
    assert r["confidence"] == 0.75
    assert r["lift"] == (4 * 3) / (4 * 3)


def test_association_rules_positive_lift(spark):
    # pair always together, plus unrelated baskets → lift > 1
    from stock_data_etl_pipeline_spark.operators.analytics import (
        association_rules)
    rows = [(1, 7), (1, 8), (2, 7), (2, 8), (3, 9), (4, 9)]
    df = spark.createDataFrame(rows, "bk long, it long")
    out = {(r["item_a"], r["item_b"]): r for r in
           association_rules(df, "bk", "it", min_support=2).collect()}
    r = out[(7, 8)]
    # N=4, c78=2, c7=c8=2 → lift = 4·2/(2·2) = 2.0; conf = 1.0
    assert r["lift"] == 2.0 and r["confidence"] == 1.0


def test_one_way_anova_hand_decomposition(spark):
    # groups: A = (0, 0), B = (10, 10): S=20, n=4, Σy²=200
    # t = (0² div 2) + (20² div 2) = 200; ssb = 200 − 400 div 4 = 100
    # ssw = 200 − 200 = 0 → F NULL (perfect separation, zero within)
    from stock_data_etl_pipeline_spark.operators.aggregates import (
        one_way_anova)
    df = spark.createDataFrame(
        [("A", 0), ("A", 0), ("B", 10), ("B", 10)], "g string, y long")
    r = one_way_anova(df, "g", "y").collect()[0]
    assert (r["k_groups"], r["n"], r["ssb"], r["ssw"]) == (2, 4, 100, 0)
    assert r["f_stat"] is None
    # add within-group noise: A = (0, 2), B = (10, 12): S=24, Σy²=248
    # t = (2² div 2) + (22² div 2) = 2 + 242 = 244
    # ssb = 244 − 576 div 4 = 100; ssw = 248 − 244 = 4
    # F = (100/1)/(4/2) = 50
    df2 = spark.createDataFrame(
        [("A", 0), ("A", 2), ("B", 10), ("B", 12)], "g string, y long")
    r2 = one_way_anova(df2, "g", "y").collect()[0]
    assert (r2["ssb"], r2["ssw"], r2["f_stat"]) == (100, 4, 50.0)


def test_js_divergence_identical_and_disjoint(spark):
    # identical unigram distributions → JS = 0 exactly;
    # disjoint vocabularies → JS = ln 2 (on the 693147/1e6 grid)
    from stock_data_etl_pipeline_spark.operators.corpus import (
        js_divergence_matrix)
    docs = spark.createDataFrame(
        [(1, "a b", "S1"), (2, "a b", "S2"), (3, "x y", "S3")],
        "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): r["js_divergence"]
           for r in js_divergence_matrix(docs).collect()}
    assert out[("S1", "S2")] == 0.0
    # disjoint pairs never share a word → no shared row → absent from
    # the inner-join matrix; only the identical pair appears
    assert ("S1", "S3") not in out
    # half-overlap: S1 = "a b", S4 = "a c": shared word a with
    # p = q = 1/2 → a contributes 0; absent mass = 1 token each side
    # → JS = (ln2/2 + ln2/2)/2 = ln2/2 on the integer grid
    docs2 = spark.createDataFrame(
        [(1, "a b", "S1"), (2, "a c", "S4")],
        "doc_id long, text string, source string")
    out2 = {(r["source_a"], r["source_b"]): r["js_divergence"]
            for r in js_divergence_matrix(docs2).collect()}
    assert out2[("S1", "S4")] == (693147 / 1e6 / 2 + 693147 / 1e6 / 2) / 2


def test_dimension_variance_exact_grid(spark):
    # dim 0: values (1.0, 3.0) → mean 2, var 2; dim 1 constant → var 0
    from stock_data_etl_pipeline_spark.operators.similarity import (
        dimension_variance_profile)
    emb = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [3.0, 5.0])],
        "vec_id long, embedding array<float>")
    out = {r["dim"]: r for r in
           dimension_variance_profile(emb, top=4).collect()}
    assert (out[0]["mean"], out[0]["variance"]) == (2.0, 2.0)
    assert (out[1]["mean"], out[1]["variance"]) == (5.0, 0.0)


def test_cohort_ltv_triangle_hand_cells(spark):
    import datetime as dtm
    from stock_data_etl_pipeline_spark.operators.analytics import (
        cohort_ltv_triangle)
    # cust 1: orders Jan(10.00), Feb(20.00); cust 2: Feb(5.00) only
    rows = [(1, dtm.date(2024, 1, 15), 10.0),
            (1, dtm.date(2024, 2, 10), 20.0),
            (2, dtm.date(2024, 2, 20), 5.0)]
    o = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double")
    out = {(r["cohort_month"], r["month_offset"]): r
           for r in cohort_ltv_triangle(o).collect()}
    jan = 2024 * 12 + 1
    r00 = out[(jan, 0)]
    assert (r00["n_customers"], r00["rev_cents"],
            r00["cum_rev_cents"]) == (1, 1000, 1000)
    r01 = out[(jan, 1)]
    assert (r01["n_customers"], r01["rev_cents"],
            r01["cum_rev_cents"]) == (1, 2000, 3000)
    r10 = out[(jan + 1, 0)]
    assert (r10["n_customers"], r10["rev_cents"],
            r10["cum_rev_cents"]) == (1, 500, 500)


def test_path_trigrams_counts_ordered_windows(spark):
    import datetime as dtm
    from stock_data_etl_pipeline_spark.operators.analytics import (
        path_trigrams)
    base = dtm.datetime(2024, 1, 1)
    seq = ["a", "b", "c", "a", "b", "c"]  # trigrams: abc, bca, cab, abc
    ev = spark.createDataFrame(
        [(1, t, base + dtm.timedelta(minutes=i), i)
         for i, t in enumerate(seq)],
        "user_id long, event_type string, ts timestamp, event_id long")
    out = {(r["e1"], r["e2"], r["e3"]): r["n"]
           for r in path_trigrams(ev).collect()}
    assert out[("a", "b", "c")] == 2
    assert out[("b", "c", "a")] == 1
    assert out[("c", "a", "b")] == 1


def test_type_user_overlap_exact_jaccard(spark):
    import datetime as dtm
    from stock_data_etl_pipeline_spark.operators.analytics import (
        type_user_overlap)
    base = dtm.datetime(2024, 1, 1)
    # type x: users {1,2,3}; type y: users {2,3,4}: common 2,
    # union 4 → jaccard 0.5
    rows = [("x", u) for u in (1, 2, 3)] + [("y", u) for u in (2, 3, 4)]
    ev = spark.createDataFrame(
        [(t, u, base, i) for i, (t, u) in enumerate(rows)],
        "event_type string, user_id long, ts timestamp, event_id long")
    r = type_user_overlap(ev).collect()[0]
    assert (r["type_a"], r["type_b"], r["users_a"], r["users_b"],
            r["common_users"], r["jaccard"]) == ("x", "y", 3, 3, 2, 0.5)


def test_length_histogram_power_of_two_edges(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import (
        length_histogram)
    # exact powers of two must land in THEIR OWN bucket (bit length),
    # never the previous one via a float log
    docs = spark.createDataFrame(
        [(1, "S", 1), (2, "S", 2), (3, "S", 1023), (4, "S", 1024),
         (5, "S", 0)],
        "doc_id long, source string, n_chars long")
    out = {r["bucket"]: r for r in length_histogram(docs).collect()}
    assert out[0]["bucket_lo"] == 1 and out[0]["n_docs"] == 1
    assert out[1]["bucket_lo"] == 2 and out[1]["n_docs"] == 1
    assert out[9]["bucket_lo"] == 512 and out[9]["n_docs"] == 1   # 1023
    assert out[10]["bucket_lo"] == 1024 and out[10]["n_docs"] == 1
    # the n_chars=0 doc is dropped: only 4 docs remain
    assert sum(r["n_docs"] for r in out.values()) == 4


def test_updown_streaks_hand_runs(spark):
    # closes: 10 11 12 11 10 10 11 → dirs: + + − − (0 dropped) +
    # runs: up(2), down(2), up(1)
    closes = [10, 11, 12, 11, 10, 10, 11]
    rows = [("A", i, c, c, c, c, 5) for i, c in enumerate(closes)]
    out = {(r["direction"], r["streak_len"]): r["n_streaks"]
           for r in ind.updown_streaks(_bars(spark, rows)).collect()}
    assert out == {(1, 2): 1, (-1, 2): 1, (1, 1): 1}


def test_overnight_gaps_hand_census(spark):
    # day closes 10, opens next day 11 (gap +100), then open 9.5 after
    # close 11.5 (gap −200)
    d = _bars(spark, [("A", 0, 10, 10, 9, 10, 5),
                      ("A", 24, 11, 12, 11, 11.5, 5),
                      ("A", 48, 9.5, 10, 9, 9.8, 5)])
    r = ind.overnight_gaps(d).collect()[0]
    assert (r["n_days"], r["n_gap_up"], r["n_gap_down"]) == (2, 1, 1)
    assert (r["max_gap_up_cents"], r["max_gap_down_cents"],
            r["net_gap_cents"]) == (100, -200, -100)
    assert r["gap_up_share"] == 0.5


# ---------------------------------------------------------------------------
# property tests: pure-Python references for the round-8 integer kernels
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

SLOW = settings(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

closes = st.lists(st.integers(min_value=1, max_value=50),
                  min_size=1, max_size=24)


@SLOW
@given(cs=closes)
def test_updown_streaks_matches_groupby_reference(spark, cs):
    import itertools
    rows = [("A", i, c, c, c, c, 1) for i, c in enumerate(cs)]
    got = {(r["direction"], r["streak_len"]): r["n_streaks"]
           for r in ind.updown_streaks(_bars(spark, rows)).collect()}
    dirs = [(1 if b > a else -1) for a, b in zip(cs, cs[1:]) if b != a]
    want: dict = {}
    for d, grp in itertools.groupby(dirs):
        k = (d, len(list(grp)))
        want[k] = want.get(k, 0) + 1
    assert got == want


@SLOW
@given(cs=closes)
def test_chande_momentum_matches_python_grid(spark, cs):
    rows = [("A", i, c, c, c, c, 1) for i, c in enumerate(cs)]
    out = sorted(ind.chande_momentum(_bars(spark, rows)).collect(),
                 key=lambda r: r["hr"])
    cents = [c * 100 for c in cs]
    deltas = [None] + [b - a for a, b in zip(cents, cents[1:])]
    n = 14
    for i, r in enumerate(out):
        win = [d for d in deltas[max(0, i - n + 1):i + 1] if d is not None]
        sg = sum(d for d in win if d > 0)
        sl = sum(-d for d in win if d < 0)
        if sg + sl == 0:
            assert r["cmo"] is None
        else:
            num = sg - sl
            sign = (num > 0) - (num < 0)
            want = sign * ((100_000_000 * abs(num)) // (sg + sl)) / 1e6
            assert r["cmo"] == want


@SLOW
@given(vals=st.lists(st.integers(min_value=-100, max_value=100),
                     min_size=3, max_size=40))
def test_robust_outlier_profile_matches_python_median_mad(spark, vals):
    # lower-median (quantile_disc) reference: the smallest value whose
    # cumulative count reaches ceil(n/2)
    from stock_data_etl_pipeline_spark.operators.aggregates import (
        robust_outlier_profile)

    def lower_median(xs):
        xs = sorted(xs)
        return xs[(len(xs) + 1) // 2 - 1]

    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp string, v long")
    r = robust_outlier_profile(df, "grp", "v").collect()[0]
    med = lower_median(vals)
    mad = lower_median([abs(v - med) for v in vals])
    n_out = sum(1 for v in vals if abs(v - med) > 3 * mad)
    assert (r["med"], r["mad"], r["n"], r["n_outliers"]) == \
        (med, mad, len(vals), n_out)
    assert r["outlier_rate"] == ((1_000_000 * n_out) // len(vals)) / 1e6


def test_volume_profile_hand_buckets(spark):
    # A: closes 10.50, 10.99 (bucket 1000), 12.00 (bucket 1200).
    # bucket 1000 vol = 3+5 = 8, bucket 1200 vol = 2; total 10.
    rows = [("A", 0, 10, 11, 10, 10.50, 3),
            ("A", 1, 10, 11, 10, 10.99, 5),
            ("A", 2, 12, 12, 12, 12.00, 2)]
    out = ind.volume_profile(_bars(spark, rows)).collect()
    assert [(r["rank"], r["bucket_cents"], r["bucket_volume"],
             r["volume_share_pct"]) for r in out] == \
        [(1, 1000, 8, 80.0), (2, 1200, 2, 20.0)]


def test_volume_profile_rank_tie_breaks_low_bucket(spark):
    # equal volumes: the LOWER bucket must rank first
    rows = [("A", 0, 10, 10, 10, 10.00, 4),
            ("A", 1, 20, 20, 20, 20.00, 4)]
    out = ind.volume_profile(_bars(spark, rows)).collect()
    assert [(r["rank"], r["bucket_cents"]) for r in out] == \
        [(1, 1000), (2, 2000)]


def test_weekly_bars_resample_picks_and_extremes(spark):
    # Mon Jan 1 2024 .. Sun Jan 7 are one week; Mon Jan 8 the next.
    rows = [("A", 0, 10.0, 12.0, 9.0, 11.0, 3),     # Mon 00:00
            ("A", 30, 11.5, 15.0, 11.0, 14.0, 2),   # Tue 06:00
            ("A", 24 * 7, 20.0, 21.0, 19.0, 20.5, 7)]  # next Mon
    out = sorted(ind.weekly_bars(_bars(spark, rows)).collect(),
                 key=lambda r: r["wk"])
    w1, w2 = out
    assert (w1["open"], w1["high"], w1["low"], w1["close"],
            w1["volume"], w1["n_bars"]) == (10.0, 15.0, 9.0, 14.0, 5, 2)
    assert w2["open"] == 20.0 and w2["n_bars"] == 1
    assert w1["wk"] == T0  # 2024-01-01 IS a Monday


def test_gap_fill_rate_hand_census(spark):
    # daily bars via the _bars helper (hr spacing 24h apart).
    # d0 close 10. d1 opens 11 (gap up), low 9.5 <= 10 → filled.
    # d2 opens 8 (gap down vs d1 close 11), high 10 < 11 → NOT filled.
    rows = [("A", 0, 10.0, 10.0, 10.0, 10.0, 1),
            ("A", 24, 11.0, 11.0, 9.5, 11.0, 1),
            ("A", 48, 8.0, 10.0, 8.0, 9.0, 1)]
    daily = _bars(spark, rows)
    r = ind.gap_fill_rate(daily).collect()[0]
    assert (r["n_gap_up"], r["n_up_filled"],
            r["n_gap_down"], r["n_down_filled"]) == (1, 1, 1, 0)
    assert r["up_fill_share"] == 1.0
    assert r["down_fill_share"] == 0.0


def test_gap_fill_rate_null_share_when_never_gapped(spark):
    # only gap-up days → down share NULL
    rows = [("A", 0, 10.0, 10.0, 10.0, 10.0, 1),
            ("A", 24, 11.0, 11.0, 10.5, 11.0, 1)]
    r = ind.gap_fill_rate(_bars(spark, rows)).collect()[0]
    assert r["n_gap_down"] == 0 and r["down_fill_share"] is None


def test_intraday_curve_shares(spark):
    # hour 0 vol 6, hour 1 vol 2 (two days), total 8 → 75% / 25%
    rows = [("A", 0, 1, 1, 1, 1.0, 4),
            ("A", 24, 1, 1, 1, 1.0, 2),
            ("A", 1, 1, 1, 1, 1.0, 2)]
    out = sorted(ind.intraday_volume_curve(_bars(spark, rows)).collect(),
                 key=lambda r: r["hour_of_day"])
    assert [(r["hour_of_day"], r["hour_volume"], r["volume_share_pct"])
            for r in out] == [(0, 6, 75.0), (1, 2, 25.0)]


def _orders(spark, rows):
    # rows: (orderkey, custkey, totalprice, day_offset)
    return spark.createDataFrame(
        [(ok, ck, float(tp), T0 + dt.timedelta(days=d))
         for ok, ck, tp, d in rows],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp")


def test_pareto_decile_share_exact_cuts(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        pareto_decile_share
    rows = [(1, 1, 40.0, 0), (2, 2, 30.0, 0), (3, 3, 20.0, 0),
            (4, 4, 10.0, 0)]
    out = pareto_decile_share(_orders(spark, rows)).collect()
    # 4 customers into 10 buckets → buckets 1..4, one customer each
    assert [(r["decile"], r["decile_rev_cents"]) for r in out] == \
        [(1, 4000), (2, 3000), (3, 2000), (4, 1000)]
    assert [r["revenue_share"] for r in out] == [0.4, 0.3, 0.2, 0.1]
    assert out[-1]["cum_share"] == 1.0


def test_reorder_interval_census_buckets(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        reorder_interval_census
    rows = [(1, 1, 5.0, 0), (2, 1, 5.0, 3), (3, 1, 5.0, 17)]
    out = reorder_interval_census(_orders(spark, rows)).collect()
    # gaps 3 and 14 days → buckets starting 0 and 14, half each
    assert [(r["bucket_start_days"], r["n_intervals"],
             r["interval_share_pct"]) for r in out] == \
        [(0, 1, 50.0), (14, 1, 50.0)]


def test_rich_club_triangle_plus_pendant(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        rich_club
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "pa long, pb long")
    out = {r["pct"]: r for r in rich_club(df, "pa", "pb").collect()}
    # degrees 1:3 2:2 3:2 4:1; p50/p75 threshold deg 2 → the triangle
    r50 = out[50]
    assert (r50["threshold_deg"], r50["n_nodes"], r50["n_edges"],
            r50["phi"]) == (2, 3, 3, 100.0)
    # p90 threshold deg 3 → single node, phi NULL
    r90 = out[90]
    assert (r90["threshold_deg"], r90["n_nodes"], r90["n_edges"],
            r90["phi"]) == (3, 1, 0, None)


def test_label_centroid_similarity_orthogonal_and_parallel(spark):
    from stock_data_etl_pipeline_spark.operators.similarity import \
        label_centroid_similarity
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1),
         (3, [1.0, 0.0], 2), (4, [1.0, 0.0], 2)],
        "vec_id long, embedding array<float>, label int")
    out = {(r["label_a"], r["label_b"]): r["cosine"]
           for r in label_centroid_similarity(df).collect()}
    assert out[(0, 1)] == 0.0
    assert out[(0, 2)] == 1.0   # parallel sums → exact 1.0
    assert out[(1, 2)] == 0.0


def test_monthly_returns_first_last_and_guard(spark):
    # Jan: first close 10.00, last 12.50 → +0.25; Feb: single day,
    # first == last → 0.0; zero first close → NULL return
    rows = [("A", 0, 1, 1, 1, 10.00, 1),
            ("A", 24 * 10, 1, 1, 1, 11.00, 1),
            ("A", 24 * 30, 1, 1, 1, 12.50, 1),   # Jan 31
            ("A", 24 * 31, 1, 1, 1, 9.00, 1),    # Feb 1
            ("Z", 0, 0, 0, 0, 0.00, 1),
            ("Z", 24, 0, 0, 0, 5.00, 1)]
    out = {(r["event_type"], r["month"].month): r
           for r in ind.monthly_returns(_bars(spark, rows)).collect()}
    jan = out[("A", 1)]
    assert (jan["first_close_cents"], jan["last_close_cents"],
            jan["n_days"], jan["monthly_return"]) == (1000, 1250, 3, 0.25)
    assert out[("A", 2)]["monthly_return"] == 0.0
    assert out[("Z", 1)]["monthly_return"] is None


def test_return_histogram_sign_split_buckets(spark):
    # closes 100 → 103 (+300bp, bucket 300) → 101.94 (−200.1% → mag
    # (10000·106)//10300 = 102 → r −102 → bucket (−102+10000)//100
    # *100−10000 = −200)
    rows = [("A", 0, 1, 1, 1, 100.00, 1),
            ("A", 24, 1, 1, 1, 103.00, 1),
            ("A", 48, 1, 1, 1, 101.94, 1)]
    out = sorted(ind.return_histogram(_bars(spark, rows)).collect(),
                 key=lambda r: r["bucket_bp"])
    assert [(r["bucket_bp"], r["n_days"], r["day_share_pct"])
            for r in out] == [(-200, 1, 50.0), (300, 1, 50.0)]


def test_source_vocab_overlap_jaccard(spark):
    from stock_data_etl_pipeline_spark.operators.corpus import \
        source_vocab_overlap
    df = spark.createDataFrame(
        [(1, "a b c", "s1"), (2, "b c d", "s2"), (3, "x y", "s3")],
        "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): r
           for r in source_vocab_overlap(df).collect()}
    r12 = out[("s1", "s2")]
    # vocab 3/3, shared {b,c} → union 4 → jaccard 0.5
    assert (r12["n_shared"], r12["n_union"], r12["jaccard"]) == (2, 4, 0.5)
    # disjoint sources never pair (token-keyed join)
    assert ("s1", "s3") not in out


def test_benford_first_digit_counts_and_literals(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        BENFORD_EXPECTED, benford_first_digit
    df = spark.createDataFrame(
        [(1.00,), (1.50,), (19.99,), (0.92,), (3.00,), (0.0,),
         (None,)], "value double")
    out = {r["digit"]: r for r in benford_first_digit(df).collect()}
    # cents: 100, 150, 1999, 92, 300 → digits 1,1,1,9,3 (0/null drop)
    assert out[1]["n_values"] == 3 and out[9]["n_values"] == 1
    assert out[1]["observed_share"] == 0.6
    assert out[3]["expected_share"] == BENFORD_EXPECTED[3]
    assert out[9]["deviation"] == 0.2 - BENFORD_EXPECTED[9]


def test_session_concurrency_overlap_census(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        session_concurrency_census
    # user 1: one session 00:00–00:10; user 2: one session 00:05–00:15
    # (overlap); user 3: isolated session at 02:00. Events 1 min apart
    # stay in-session (gap 60s < 1800s).
    rows = []
    eid = 0
    for u, start_min, n in [(1, 0, 11), (2, 5, 11), (3, 120, 1)]:
        for k in range(n):
            eid += 1
            rows.append((eid, u, T0 + dt.timedelta(minutes=start_min + k)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    out = {r["level"]: r["n_instants"]
           for r in session_concurrency_census(df).collect()}
    # boundaries: +1@0:00 → 1, +1@0:05 → 2, −1@0:10:01 → 1,
    # −1@0:15:01 → 0, +1@2:00 → 1, −1@2:00:01 → 0
    assert out == {0: 2, 1: 3, 2: 1}


def test_advance_decline_hand_line(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        advance_decline_line
    # day1→day2: A up, B down; day2→day3: both up
    rows = [("A", 0, 1, 1, 1, 10.0, 1), ("B", 0, 1, 1, 1, 20.0, 1),
            ("A", 24, 1, 1, 1, 11.0, 1), ("B", 24, 1, 1, 1, 19.0, 1),
            ("A", 48, 1, 1, 1, 12.0, 1), ("B", 48, 1, 1, 1, 19.5, 1)]
    out = advance_decline_line(_bars(spark, rows)).collect()
    assert [(r["advancers"], r["decliners"], r["net"], r["ad_line"])
            for r in out] == [(1, 1, 0, 0), (2, 0, 2, 2)]


def test_copurchase_weight_histogram(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        copurchase_weight_histogram
    # baskets: {1,2,3}, {1,2} → pair (1,2) weight 2; (1,3),(2,3)
    # weight 1 → histogram {1: 2 edges, 2: 1 edge}
    df = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2)],
        "bk long, i long")
    out = {r["weight"]: (r["n_edges"], r["edge_share"])
           for r in copurchase_weight_histogram(df).collect()}
    assert out == {1: (2, 0.666666), 2: (1, 0.333333)}


def test_bigram_pmi_perfect_collocation(spark):
    import math

    from stock_data_etl_pipeline_spark.operators.corpus import bigram_pmi
    # "x y" always adjacent: c_ab=2, c_x=c_y=2, Nu=8, Nb=6
    # pmi = ln((2·8·8)/(6·2·2)) = ln(16/3)
    df = spark.createDataFrame(
        [(1, "x y a b"), (2, "b a x y")], "doc_id long, text string")
    out = {(r["w1"], r["w2"]): r for r in bigram_pmi(df).collect()}
    r = out[("x", "y")]
    assert (r["c_ab"], r["c_a"], r["c_b"]) == (2, 2, 2)
    assert r["pmi"] == math.log((2.0 * 8.0 * 8.0) / (6.0 * 2.0 * 2.0))


@SLOW
@given(cs=closes)
def test_return_histogram_matches_python_reference(spark, cs):
    rows = [("A", i * 24, c, c, c, c, 1) for i, c in enumerate(cs)]
    got = {r["bucket_bp"]: r["n_days"] for r in
           ind.return_histogram(_bars(spark, rows)).collect()}
    cents = [c * 100 for c in cs]
    want: dict = {}
    for pc, c in zip(cents, cents[1:]):
        if pc <= 0:
            continue
        mag = (10000 * abs(c - pc)) // pc
        r_bp = mag if c >= pc else -mag
        b = ((r_bp + 10000) // 100) * 100 - 10000
        want[b] = want.get(b, 0) + 1
    assert got == want


@SLOW
@given(cs=closes)
def test_gap_fill_rate_matches_python_reference(spark, cs):
    # open = close - 25c, high = close + 50c, low = close - 50c
    rows = [("A", i * 24, c - 0.25, c + 0.5, c - 0.5, c, 1)
            for i, c in enumerate(cs)]
    out = ind.gap_fill_rate(_bars(spark, rows)).collect()
    o = [c * 100 - 25 for c in cs]
    h = [c * 100 + 50 for c in cs]
    l = [c * 100 - 50 for c in cs]  # noqa: E741
    pc = [c * 100 for c in cs][:-1]
    nu = nuf = nd = ndf = 0
    for i, p in enumerate(pc, start=1):
        if o[i] > p:
            nu += 1
            nuf += l[i] <= p
        elif o[i] < p:
            nd += 1
            ndf += h[i] >= p
    if nu + nd == 0:
        assert out == [] or (out[0]["n_gap_up"] == 0
                             and out[0]["n_gap_down"] == 0)
    else:
        r = out[0]
        assert (r["n_gap_up"], r["n_up_filled"],
                r["n_gap_down"], r["n_down_filled"]) == (nu, nuf, nd, ndf)


edges_strat = st.lists(
    st.tuples(st.integers(min_value=1, max_value=8),
              st.integers(min_value=1, max_value=8)),
    min_size=1, max_size=20)


@SLOW
@given(es=edges_strat)
def test_rich_club_matches_bruteforce(spark, es):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        rich_club
    und = {(min(a, b), max(a, b)) for a, b in es if a != b}
    if not und:
        return
    df = spark.createDataFrame(sorted(und), "pa long, pb long")
    got = {r["pct"]: (r["threshold_deg"], r["n_nodes"], r["n_edges"])
           for r in rich_club(df, "pa", "pb").collect()}
    deg: dict = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ds = sorted(deg.values())
    n = len(ds)
    for p in (50, 75, 90):
        target = (p * n + p) // 100
        cum = 0
        thr = None
        for d in sorted(set(ds)):
            cum += ds.count(d)
            if cum >= target:
                thr = d
                break
        members = {v for v, dv in deg.items() if dv >= thr}
        e_k = sum(1 for a, b in und if a in members and b in members)
        assert got[p] == (thr, len(members), e_k)


@SLOW
@given(vals=st.lists(
    st.integers(min_value=1, max_value=99999), min_size=1, max_size=30))
def test_benford_matches_python_reference(spark, vals):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        benford_first_digit
    df = spark.createDataFrame([(v / 100.0,) for v in vals],
                               "value double")
    got = {r["digit"]: r["n_values"]
           for r in benford_first_digit(df).collect()}
    want: dict = {}
    for v in vals:
        d = int(str(v)[0])
        want[d] = want.get(d, 0) + 1
    assert got == want


def test_retention_triangle_hand_cells(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        retention_triangle
    # cohort Mon Jan 1: users 1,2 first week; user 1 returns week 1.
    # cohort Jan 8: user 3 only.
    rows = [(1, 1, T0), (2, 2, T0 + dt.timedelta(days=2)),
            (3, 1, T0 + dt.timedelta(days=8)),
            (4, 3, T0 + dt.timedelta(days=9))]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    out = {(r["cohort"], r["week_offset"]):
           (r["n_active"], r["cohort_size"], r["retention"])
           for r in retention_triangle(df).collect()}
    w2 = T0 + dt.timedelta(days=7)
    assert out[(T0, 0)] == (2, 2, 1.0)
    assert out[(T0, 1)] == (1, 2, 0.5)
    assert out[(w2, 0)] == (1, 1, 1.0)


def test_discount_impact_exact_tiers(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        discount_impact
    df = spark.createDataFrame(
        [(100.0, 0.10), (200.0, 0.10), (50.0, 0.0)],
        "l_extendedprice double, l_discount double")
    out = {r["discount_pct"]: r for r in
           discount_impact(df).collect()}
    r10 = out[10]
    # gross 30000c; disc_weighted = 30000·10 = 300000 → given 3000c
    assert (r10["n_items"], r10["gross_cents"],
            r10["discount_given_cents"]) == (2, 30000, 3000)
    assert r10["effective_discount"] == 300000.0 / (30000.0 * 100.0)
    assert out[0]["discount_given_cents"] == 0


def test_first_vs_repeat_split(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        first_vs_repeat_revenue
    # cust 1: first order day 0 (Jan), repeat day 40 (Feb);
    # cust 2: first order day 40 (Feb)
    rows = [(1, 1, 100.0, 0), (2, 1, 50.0, 40), (3, 2, 150.0, 40)]
    out = {(r["month"].month, r["is_first"]): r
           for r in first_vs_repeat_revenue(_orders(spark, rows))
           .collect()}
    assert out[(1, True)]["revenue_share"] == 1.0
    feb_first = out[(2, True)]
    assert (feb_first["revenue_cents"], feb_first["revenue_share"]) == \
        (15000, 0.75)
    assert out[(2, False)]["revenue_share"] == 0.25


@SLOW
@given(revs=st.lists(st.integers(min_value=0, max_value=500),
                     min_size=1, max_size=25))
def test_pareto_deciles_match_python_ntile(spark, revs):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        pareto_decile_share
    rows = [(i, i, float(r), 0) for i, r in enumerate(revs, start=1)]
    got = {r["decile"]: (r["n_customers"], r["decile_rev_cents"])
           for r in pareto_decile_share(_orders(spark, rows)).collect()}
    ranked = sorted(((r * 100, i) for i, r in enumerate(revs, start=1)),
                    key=lambda t: (-t[0], t[1]))
    n = len(ranked)
    q, rem = divmod(n, 10)
    want: dict = {}
    pos = 0
    for b in range(1, 11):
        size = q + 1 if b <= rem else q
        chunk = ranked[pos:pos + size]
        pos += size
        if chunk:
            want[b] = (len(chunk), sum(c for c, _ in chunk))
    assert got == want


@SLOW
@given(gaps=st.lists(st.integers(min_value=0, max_value=40),
                     min_size=0, max_size=15))
def test_reorder_census_matches_python(spark, gaps):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        reorder_interval_census
    days, acc = [0], 0
    for g in gaps:
        acc += g
        days.append(acc)
    rows = [(i, 1, 5.0, d) for i, d in enumerate(days, start=1)]
    got = {r["bucket_start_days"]: r["n_intervals"] for r in
           reorder_interval_census(_orders(spark, rows)).collect()}
    want: dict = {}
    for a, b in zip(days, days[1:]):
        k = ((b - a) // 7) * 7
        want[k] = want.get(k, 0) + 1
    assert got == want


@SLOW
@given(es=edges_strat)
def test_copurchase_weights_match_python(spark, es):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        copurchase_weight_histogram
    # baskets keyed 0..4, items 1..8
    baskets = [(bi % 5, it) for bi, (it, _) in enumerate(es)] + \
              [(bi % 5, it) for bi, (_, it) in enumerate(es)]
    df = spark.createDataFrame(baskets, "bk long, i long")
    got = {r["weight"]: r["n_edges"] for r in
           copurchase_weight_histogram(df).collect()}
    from collections import Counter
    from itertools import combinations
    per_basket: dict = {}
    for bk, i in set(baskets):
        per_basket.setdefault(bk, set()).add(i)
    wt: Counter = Counter()
    for items in per_basket.values():
        for a, b in combinations(sorted(items), 2):
            wt[(a, b)] += 1
    want: Counter = Counter(wt.values())
    assert got == dict(want)


@SLOW
@given(evs=st.lists(
    st.tuples(st.integers(min_value=1, max_value=4),      # user
              st.integers(min_value=0, max_value=7200)),  # seconds
    min_size=1, max_size=25))
def test_session_concurrency_matches_bruteforce(spark, evs):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        session_concurrency_census
    rows = [(i, u, T0 + dt.timedelta(seconds=s))
            for i, (u, s) in enumerate(evs, start=1)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    got = {r["level"]: r["n_instants"] for r in
           session_concurrency_census(df).collect()}
    # python sessions: per user, split at gaps > 1800s
    sess = []
    per_user: dict = {}
    for u, s in evs:
        per_user.setdefault(u, []).append(s)
    for u, ss in per_user.items():
        ss = sorted(set(ss))
        start = prev = ss[0]
        for s in ss[1:]:
            if s - prev > 1800:
                sess.append((start, prev))
                start = s
            prev = s
        sess.append((start, prev))
    deltas: dict = {}
    for a, b in sess:
        deltas[a] = deltas.get(a, 0) + 1
        deltas[b + 1] = deltas.get(b + 1, 0) - 1
    level, want = 0, {}
    for t in sorted(deltas):
        level += deltas[t]
        want[level] = want.get(level, 0) + 1
    assert got == want


def test_degree_gini_star_vs_regular(spark):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        degree_gini
    # regular triangle: all degrees equal → gini 0
    tri = spark.createDataFrame([(1, 2), (2, 3), (3, 1)],
                                "pa long, pb long")
    assert degree_gini(tri, "pa", "pb").collect()[0]["gini"] == 0.0
    # star K1,3: degrees (3,1,1,1); sorted x=(1,1,1,3), n=4, Σx=6
    # S1 = 1+2+3+12 = 18 → num = 36 − 5·6 = 6, den = 24 → 0.25
    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)],
                                 "pa long, pb long")
    r = degree_gini(star, "pa", "pb").collect()[0]
    assert (r["n"], r["sum_degree"], r["gini"]) == (4, 6, 0.25)


@SLOW
@given(es=edges_strat)
def test_degree_gini_matches_python(spark, es):
    from stock_data_etl_pipeline_spark.operators.analytics import \
        degree_gini
    und = {(min(a, b), max(a, b)) for a, b in es if a != b}
    if not und:
        return
    df = spark.createDataFrame(sorted(und), "pa long, pb long")
    r = degree_gini(df, "pa", "pb").collect()[0]
    deg: dict = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = sorted(deg.values())
    n, sx = len(xs), sum(xs)
    s1 = sum(i * x for i, x in enumerate(xs, start=1))
    assert r["gini"] == (2 * s1 - (n + 1) * sx) / (n * sx)


def test_quality_by_source_hand_rollup(spark):
    from pyspark.sql import functions as FF

    from stock_data_etl_pipeline_spark.functions import text as TX
    from stock_data_etl_pipeline_spark.operators.windows import \
        int_mean_half_away
    docs = spark.createDataFrame(
        [(1, "the is was a b c d e", "en", "s1", 8),
         (2, "z z z z", "en", "s1", 7),
         (3, "the cat is on the mat now", "en", "s2", 25)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    # reference: per-doc grid score via the same public scorer, then a
    # pure-Python rollup of the integer grid values
    qi = {r["doc_id"]: int(round(r["q"] * 10000)) for r in docs.select(
        "doc_id", TX.quality_score("text").alias("q")).collect()}
    g = docs.select(
        "source",
        FF.round(TX.quality_score("text") * 10000, 0).cast("long")
        .alias("qi")).groupBy("source").agg(
        FF.count(FF.lit(1)).cast("long").alias("n"),
        FF.sum("qi").cast("long").alias("s"),
        FF.sum(FF.when(FF.col("qi") >= 5000, 1).otherwise(0))
        .cast("long").alias("n_pass"))
    mean = int_mean_half_away(FF.col("s") * 100, FF.col("n")) / 1e6
    out = {r["source"]: r for r in g.select(
        "source", "n", mean.alias("m"), "n_pass").collect()}
    s1 = out["s1"]
    want_mean = round((qi[1] + qi[2]) * 100 / 2) / 1e6
    assert (s1["n"], s1["m"]) == (2, want_mean)
    assert out["s2"]["n_pass"] == (1 if qi[3] >= 5000 else 0)


def test_conversion_lag_signed_quantiles(spark):
    from stock_data_etl_pipeline_spark.operators.aggregates import \
        exact_quantiles_by_rank
    # lags (−10, 0, 50): p50 = 0 (ceil(3/2)=2nd), p90/p99 = 50
    df = spark.createDataFrame([(-10,), (0,), (50,)], "lag_s long")
    r = exact_quantiles_by_rank(df, "lag_s", grid=1).collect()[0]
    assert (r["n_values"], r["q50"], r["q90"], r["q99"]) == \
        (3, 0.0, 50.0, 50.0)


def test_dedup_impact_by_source_rollup(spark):
    from stock_data_etl_pipeline_spark.plans.catalog_round8 import \
        dedup_impact_by_source  # noqa: F401 — registration touch
    from stock_data_etl_pipeline_spark.operators import dedup as DD2
    from stock_data_etl_pipeline_spark.operators.clustering import \
        cluster_near_dups
    from pyspark.sql import functions as FF
    # docs 1,2 near-identical (same source s1); 3 unique in s2
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    docs = spark.createDataFrame(
        [(1, base, "en", "s1", 1), (2, base + " tail", "en", "s1", 1),
         (3, "x0 x1 x2 x3 x4 x5 x6 x7", "en", "s2", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    pairs = DD2.ngram_jaccard_pairs(docs, threshold=0.5, k=5)
    cl = cluster_near_dups(pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in cl.collect()}
    assert got == {1: 1, 2: 1}  # keep-min-id: doc 2 removed
    j = (docs.select("doc_id", "source")
         .join(cl.withColumnRenamed("doc_id", "cdoc"),
               FF.col("doc_id") == FF.col("cdoc"), "left"))
    s1 = j.filter(FF.col("source") == "s1").collect()
    assert sum(1 for r in s1 if r["cdoc"] is not None) == 2
