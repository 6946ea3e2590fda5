"""Round-14 consolidation tests.

Covers the round-13 advice closures:

- ``tools.plan_audit._count_global_windows`` anchors on literal node
  names (``Window`` / ``ArrowWindowPython`` / ``WindowInPandas``); a
  Spark upgrade renaming the PYTHON window node would silently zero
  the count. A live-plan canary runs a pandas-UDF window and asserts
  the counter sees its unpartitioned form (advice item 2).
- ``operators.similarity.ivf_recall_sweep`` normalizes ``nprobes``
  (dedup + sort) at entry and rejects an empty sweep, restoring the
  one-row-per-nprobe output contract (advice item 3).
- ``bench.py`` samples the 1-min loadavg once BEFORE a query's first
  attempt so the per-query samples bracket the window instead of
  claiming per-attempt resolution the EWMA can't deliver
  (advice item 1).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from tools.plan_audit import _count_global_windows


# ------------------------------------------------ arrow window canary


def test_arrow_window_node_counted_live(spark):
    """Canary for the Python/Arrow window node NAME: if a Spark upgrade
    renames ArrowWindowPython/WindowInPandas, this live plan stops
    matching and the suite fails loudly instead of the globalwin gate
    silently zeroing (round-13 advice). Mirrors
    test_global_window_counter_live_plans, which only exercises the
    JVM Window node."""

    @F.pandas_udf("double")
    def pmean(v: pd.Series) -> float:
        return float(v.mean())

    df = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").cast("double").alias("v"))
    frame_all = Window.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing)
    gl = df.select(pmean("v").over(frame_all).alias("m"))
    gl.collect()
    plan = gl._jdf.queryExecution().executedPlan().toString()
    # the plan must contain a Python window node at all (the canary's
    # premise), and the counter must flag its unpartitioned form
    assert ("ArrowWindowPython" in plan or "WindowInPandas" in plan), plan
    assert _count_global_windows(plan) >= 1

    pt = df.select(pmean("v").over(
        Window.partitionBy("k").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("m"))
    pt.collect()
    assert _count_global_windows(
        pt._jdf.queryExecution().executedPlan().toString()) == 0


# ------------------------------------------------ ivf sweep contract


def test_ivf_recall_sweep_dedups_and_sorts_nprobes(spark):
    from stock_data_etl_pipeline_spark.operators import similarity as SIM
    emb = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(40)],
        ["vec_id", "embedding"])
    cents = (emb.filter(F.col("vec_id") % 10 == 0)
             .select(F.col("vec_id").alias("centroid_id"),
                     F.col("embedding").alias("centroid")))
    out = SIM.ivf_recall_sweep(emb, cents, [1.0, 0.5, 0.25], k=3,
                               nprobes=(4, 1, 4, 2, 1)).collect()
    assert [r["nprobe"] for r in out] == [1, 2, 4]
    # recall is monotone non-decreasing in nprobe (more cells probed
    # can only add candidates)
    recalls = [r["recall"] for r in out]
    assert recalls == sorted(recalls)


def test_ivf_recall_sweep_rejects_empty_nprobes(spark):
    from stock_data_etl_pipeline_spark.operators import similarity as SIM
    emb = spark.createDataFrame([(0, [1.0, 0.0])], ["vec_id", "embedding"])
    cents = emb.select(F.col("vec_id").alias("centroid_id"),
                       F.col("embedding").alias("centroid"))
    with pytest.raises(ValueError, match="non-empty"):
        SIM.ivf_recall_sweep(emb, cents, [1.0, 0.0], nprobes=())


# ------------------------------------------------ bench loadavg bracket


def test_bench_loadavg_brackets_each_query():
    """The per-query loadavg list must START with a pre-sample (length
    attempts+1): the 1-min EWMA lags tens of seconds, so the honest
    claim is a bracket of the query window, not per-attempt
    attribution (round-13 advice)."""
    import os
    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    assert "loads = [round(os.getloadavg()[0], 2)]" in src
    assert "BRACKET" in src


# ------------------------------------------------ round-14 operators
#
# Hand/reference fixtures for every new round-14 operator — the driver
# oracle proves cross-engine parity; these prove the SEMANTICS against
# independent pure-Python reimplementations on inputs small enough to
# reason about.



def _write_events_micros(spark, df, td):
    """Write a handmade events.parquet with µs timestamps: Spark's
    default INT96 footer trips load_table's unit detector (memory:
    registry ts-unit rule)."""
    old = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
    finally:
        if old is not None:
            spark.conf.set("spark.sql.parquet.outputTimestampType", old)


def _mk_daily(spark, closes, highs=None, lows=None):
    import datetime
    rows = []
    for i, c in enumerate(closes):
        hr = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=i)
        h = highs[i] if highs else c + 1.0
        lo = lows[i] if lows else c - 1.0
        rows.append(("sym", hr, c + 0.5, h, lo, float(c), 1))
    return spark.createDataFrame(
        rows, ["event_type", "hr", "open", "high", "low", "close",
               "volume"])


def test_kama_matches_reference_recursion(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        KAMA_FAST, KAMA_N, KAMA_SLOW, kama)
    closes = [10.0, 11.0, 10.5, 12.0, 13.0, 12.5, 14.0, 13.5, 15.0,
              16.0, 15.5, 17.0, 16.5, 18.0, 19.0]
    out = {r["hr"].day: r["kama"]
           for r in kama(_mk_daily(spark, closes)).collect()}
    # pure-Python reference: cents-exact ER, float recursion
    cents = [round(c * 100) for c in closes]
    sf_fast, sf_slow = 2.0 / (KAMA_FAST + 1), 2.0 / (KAMA_SLOW + 1)
    prev = None
    for t in range(KAMA_N, len(cents)):
        mom = abs(cents[t] - cents[t - KAMA_N])
        vol = sum(abs(cents[i] - cents[i - 1])
                  for i in range(t - KAMA_N + 1, t + 1))
        er = mom / vol if vol > 0 else 0.0
        sc = (er * (sf_fast - sf_slow) + sf_slow) ** 2
        cd = cents[t] / 100.0
        prev = cd if prev is None else prev + sc * (cd - prev)
        assert out[t + 1] == pytest.approx(round(prev, 6), abs=1e-6)
    assert len(out) == len(closes) - KAMA_N


def test_mass_index_matches_reference(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        MASS_SUM_N, mass_index)
    import random
    rng = random.Random(7)
    n = 30
    closes = [50.0 + i for i in range(n)]
    highs = [c + round(rng.uniform(0.5, 3.0), 2) for c in closes]
    lows = [c - round(rng.uniform(0.5, 3.0), 2) for c in closes]
    out = {r["hr"].day: r["mass_index"]
           for r in mass_index(_mk_daily(spark, closes, highs, lows))
           .collect()}
    ranges = [(round(h * 100) - round(lo * 100)) / 100.0
              for h, lo in zip(highs, lows)]
    ema1, ema2 = [], []
    for i, r in enumerate(ranges):
        ema1.append(r if i == 0 else ema1[-1] * 0.8 + r * 0.2)
    for i, v in enumerate(ema1):
        ema2.append(v if i == 0 else ema2[-1] * 0.8 + v * 0.2)
    ratio = [a / b if b > 0 else 0.0 for a, b in zip(ema1, ema2)]
    for t in range(n):
        if t + 1 >= MASS_SUM_N:
            want = round(sum(ratio[t - MASS_SUM_N + 1:t + 1]), 6)
            assert out[t + 1] == pytest.approx(want, abs=1e-6)
        else:
            assert out[t + 1] is None


def test_coppock_matches_reference(spark):
    from stock_data_etl_pipeline_spark.operators.indicators import (
        COPPOCK_ROC_LONG, COPPOCK_ROC_SHORT, COPPOCK_WMA_N, coppock)
    closes = [100.0 + ((i * 7) % 13) for i in range(30)]
    out = {r["hr"].day: r["coppock"]
           for r in coppock(_mk_daily(spark, closes)).collect()}
    cents = [round(c * 100) for c in closes]

    def roc(t, k):
        return (cents[t] - cents[t - k]) / cents[t - k]

    first = COPPOCK_ROC_LONG + COPPOCK_WMA_N - 1
    for t in range(len(cents)):
        if t < first:
            assert out[t + 1] is None
        else:
            s = [roc(t - j, COPPOCK_ROC_LONG) + roc(t - j, COPPOCK_ROC_SHORT)
                 for j in range(COPPOCK_WMA_N)]
            want = sum(v * (COPPOCK_WMA_N - j) for j, v in enumerate(s)) \
                / (COPPOCK_WMA_N * (COPPOCK_WMA_N + 1) / 2)
            assert out[t + 1] == pytest.approx(round(want, 6), abs=1e-6)


def test_lsh_band_sweep_nested_configs_monotone(spark):
    """Candidate sets are NESTED along band chains whose block
    boundaries align (1->2->3 and 4->6 for H=12), so n_cand and recall
    must be monotone along those chains; identical docs must be
    candidates and hits at EVERY config."""
    from stock_data_etl_pipeline_spark.operators.dedup import lsh_band_sweep
    docs = [(0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "totally different words entirely unrelated text here now"),
            (3, "alpha beta gamma delta epsilon zeta eta iota")]
    d = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["bands"]: r for r in
           lsh_band_sweep(d, threshold=0.5, num_hashes=12,
                          band_counts=(1, 2, 3, 4, 6), k=3).collect()}
    assert set(out) == {1, 2, 3, 4, 6}
    for chain in [(1, 2, 3), (4, 6)]:
        for a, b in zip(chain, chain[1:]):
            assert out[a]["n_cand"] <= out[b]["n_cand"]
            assert out[a]["n_hit"] <= out[b]["n_hit"]
    # the exact duplicate pair (0,1) collides on every band of every
    # config: n_cand >= 1 and the pair is a true positive everywhere
    for b in out.values():
        assert b["n_cand"] >= 1 and b["n_hit"] >= 1
        assert b["n_exact"] >= 1
        assert b["recall"] is not None and b["recall"] > 0


def test_lsh_band_sweep_rejects_bad_configs(spark):
    from stock_data_etl_pipeline_spark.operators.dedup import lsh_band_sweep
    d = spark.createDataFrame([(0, "a b c d")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="non-empty"):
        lsh_band_sweep(d, band_counts=())
    with pytest.raises(ValueError, match="does not divide"):
        lsh_band_sweep(d, num_hashes=12, band_counts=(5,))
    with pytest.raises(ValueError, match="rows_per_band=1"):
        lsh_band_sweep(d, num_hashes=12, band_counts=(12,))


def test_bloom_prune_matches_python_simulation(spark):
    from stock_data_etl_pipeline_spark.operators.joins import (
        BLOOM_PRIME, bloom_constants, bloom_prune_report)
    m, k = 64, 3  # tiny filter => false positives guaranteed
    build = list(range(0, 40, 2))      # 20 even keys
    probe = list(range(0, 60))         # 60 keys, 40 non-members
    bdf = spark.createDataFrame([(x,) for x in build], ["event_id"])
    pdf = spark.createDataFrame([(x,) for x in probe], ["event_id"])
    row = bloom_prune_report(bdf, pdf, key="event_id", m=m, k=k).collect()[0]

    consts = bloom_constants(k)
    pos = lambda x: {((a * (x + 1) + b) % BLOOM_PRIME) % m
                     for a, b in consts}
    bits = set().union(*[pos(x) for x in build])
    passed = [x for x in probe if pos(x) <= bits]
    members = set(build)
    fpos = [x for x in passed if x not in members]
    assert row["n_keys"] == len(build)
    assert row["bits_set"] == len(bits)
    assert row["n_probed"] == len(probe)
    assert row["n_pass"] == len(passed)
    assert row["n_members"] == len(members)
    assert row["n_false_pos"] == len(fpos)
    # no false negatives, ever
    assert members <= set(passed)
    assert row["fp_rate"] == pytest.approx(
        round(len(fpos) / (len(probe) - len(members)), 6), abs=1e-6)


def test_bootstrap_ci_matches_python_reference(spark):
    import math

    from stock_data_etl_pipeline_spark.plans.catalog_round14 import (
        BOOT_PRIME, BOOT_REPS, BOOT_THRESHOLDS)
    # independent pure-Python reference on a handmade events table
    rows = [(i, "t", 1.0 + (i % 5)) for i in range(40)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    means = {}
    for rep in range(BOOT_REPS):
        s = n = 0
        for i, _, v in rows:
            h = (i * 2654435761 + rep * 1103515245 + 12345) % BOOT_PRIME
            w = sum(1 for t in BOOT_THRESHOLDS if h >= t)
            s += w * round(v * 100)
            n += w
        if n:
            means[rep] = s / (100.0 * n)
    b = len(means)
    sum_m = sum(means.values())
    sum_m2 = sum(v * v for v in means.values())
    se = math.sqrt(max((sum_m2 - sum_m * sum_m / b) / (b - 1), 0.0))
    point = sum(round(v * 100) for _, _, v in rows) / (100.0 * len(rows))

    from stock_data_etl_pipeline_spark.plans import catalog_round14 as C14
    out = C14.events_bootstrap_ci  # register() returns the raw builder
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        import datetime
        _write_events_micros(
            spark,
            df.withColumn("ts", F.lit(datetime.datetime(2024, 1, 2)))
            .withColumn("user_id", F.col("event_id") % 7)
            .withColumn("props", F.lit("{}")), td)
        got = out(spark, td).collect()[0]
    assert got["n_events"] == len(rows)
    assert got["point_mean"] == pytest.approx(round(point, 6), abs=1e-6)
    assert got["boot_se"] == pytest.approx(round(se, 6), abs=1e-6)
    assert got["ci_lo"] == pytest.approx(round(point - 1.96 * se, 6),
                                         abs=1e-6)


def test_wasserstein_hand_fixture(spark):
    import datetime

    from stock_data_etl_pipeline_spark.plans import catalog_round14 as C14
    # weekday (Mon 2024-01-01) values: [1.00, 2.00]
    # weekend (Sat 2024-01-06) values: [2.00, 3.00]
    # CDFs over grid 100,200,300 cents: F_wd = [.5, 1, 1]; F_we = [0, .5, 1]
    # W1 = |.5-0|*(200-100)/100 + |1-.5|*(300-200)/100 = 0.5+0.5 = 1.00
    rows = [(0, datetime.datetime(2024, 1, 1, 10), 1, "x", 1.00, "{}"),
            (1, datetime.datetime(2024, 1, 1, 11), 1, "x", 2.00, "{}"),
            (2, datetime.datetime(2024, 1, 6, 10), 1, "x", 2.00, "{}"),
            (3, datetime.datetime(2024, 1, 6, 11), 1, "x", 3.00, "{}")]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"])
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        _write_events_micros(spark, df, td)
        got = C14.events_wasserstein_shift(spark, td).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_weekday"], r["n_weekend"]) == (2, 2)
    assert r["w1_distance"] == pytest.approx(1.0, abs=1e-6)


def test_propensity_strata_hand_fixture(spark):
    import datetime

    from stock_data_etl_pipeline_spark.plans import catalog_round14 as C14
    pre = datetime.datetime(2024, 1, 5)
    post = datetime.datetime(2024, 1, 20)
    rows = []
    eid = 0
    # user 1: treated (big pre purchase), 2 post purchases, pre_cnt=2
    rows += [(eid + i, pre, 1, "purchase", 460.0, "{}") for i in range(2)]
    rows += [(100 + i, post, 1, "purchase", 10.0, "{}") for i in range(2)]
    # user 2: control (small pre purchases), 1 post purchase, pre_cnt=2
    rows += [(200 + i, pre, 2, "purchase", 10.0, "{}") for i in range(2)]
    rows += [(300, post, 2, "purchase", 10.0, "{}")]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"])
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        _write_events_micros(spark, df, td)
        got = C14.events_propensity_strata(spark, td).collect()
    # both users: pre_cnt=2, avg=2 => stratum = min(2*2*2 div 4, 3) = 2
    assert len(got) == 1 and got[0]["stratum"] == 2
    r = got[0]
    assert (r["n_treated"], r["n_control"]) == (1, 1)
    assert r["mean_outcome_treated"] == pytest.approx(2.0)
    assert r["mean_outcome_control"] == pytest.approx(1.0)


def test_pq_m_sweep_self_codebook_perfect_recall(spark):
    """With every vector its own codeword (every=1) the quantization is
    lossless at ANY m, so ADC distances equal exact distances and
    recall@k is 1.0 across the sweep — the identity the sweep's
    arithmetic must preserve."""
    from stock_data_etl_pipeline_spark.operators import similarity as SIM
    dim = 8
    emb = spark.createDataFrame(
        [(i, [float((i * 3 + j * 7) % 11) + j * 0.125
              for j in range(dim)]) for i in range(30)],
        ["vec_id", "embedding"])
    q = [float(j) for j in range(dim)]
    out = SIM.pq_m_sweep(emb, q, k=5, ms=(1, 2, 4), dim=dim,
                         every=1).collect()
    assert [r["m"] for r in out] == [1, 2, 4]
    for r in out:
        assert r["sub_dim"] == dim // r["m"]
        assert r["n_hits"] == 5 and r["recall"] == pytest.approx(1.0)


def test_pq_m_sweep_rejects_bad_configs(spark):
    from stock_data_etl_pipeline_spark.operators import similarity as SIM
    emb = spark.createDataFrame([(0, [1.0] * 8)], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="non-empty"):
        SIM.pq_m_sweep(emb, [0.0] * 8, ms=(), dim=8)
    with pytest.raises(ValueError, match="does not divide"):
        SIM.pq_m_sweep(emb, [0.0] * 8, ms=(3,), dim=8)


def test_streaming_bootstrap_partials_equal_batch(spark):
    """The streaming drain must equal the batch partials row-for-row:
    the replicate weights are pure per-row hash functions, so
    micro-batch boundaries cannot change the aggregation."""
    from stock_data_etl_pipeline_spark.operators.quality import (
        poisson_bootstrap_partials)
    from stock_data_etl_pipeline_spark.sources.registry import load_table
    from stock_data_etl_pipeline_spark.streaming.events import (
        streaming_bootstrap_partials)
    src = "/root/testdata/sf0.001/events.parquet"
    e = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
    batch = {tuple(r) for r in poisson_bootstrap_partials(e).collect()}
    stream = {tuple(r) for r in
              streaming_bootstrap_partials(spark, src).collect()}
    assert batch == stream and len(batch) > 0


def test_bootstrap_tiny_key_survives_dropped_replicates(spark):
    """A 1-event key draws Poisson weight 0 in ~1/e of replicates, so
    some (key, rep) partials vanish: n_events must still be EXACT
    (divide by surviving replicates, not by reps) and the SE must be
    NULL — never an ANSI divide-by-zero — when fewer than 2 replicates
    survive (round-14 review findings 1-2)."""
    from stock_data_etl_pipeline_spark.operators.quality import (
        BOOT_PRIME, BOOT_REPS, BOOT_THRESHOLDS, bootstrap_ci_from_partials,
        poisson_bootstrap_partials)
    df = spark.createDataFrame(
        [(7, "solo", 12300), (100, "pair", 4500), (101, "pair", 500)],
        ["event_id", "event_type", "cents"])
    out = {r["event_type"]: r for r in bootstrap_ci_from_partials(
        poisson_bootstrap_partials(df)).collect()}
    # python reference for the surviving-replicate count of 'solo'
    surv = 0
    for rep in range(BOOT_REPS):
        h = (7 * 2654435761 + rep * 1103515245 + 12345) % BOOT_PRIME
        if sum(1 for t in BOOT_THRESHOLDS if h >= t) > 0:
            surv += 1
    assert surv < BOOT_REPS  # the fixture genuinely drops replicates
    assert out["solo"]["n_events"] == 1
    assert out["solo"]["point_mean"] == pytest.approx(123.0)
    if surv < 2:
        assert out["solo"]["boot_se"] is None
    else:
        # a single value has zero bootstrap variance across replicates
        assert out["solo"]["boot_se"] == pytest.approx(0.0)
    assert out["pair"]["n_events"] == 2
