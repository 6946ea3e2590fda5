"""Unit tests for the data-selection family (catalog_select): weighted
reservoir sampling, token-budget greedy selection, per-symbol OLS."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.plans.catalog_select import (
    budget_selection, ols_trend, weighted_sample)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows],
        "doc_id long, text string")


def _es_key(doc_id: int, w: int) -> float:
    h = hashlib.md5(f"{doc_id}:es".encode()).hexdigest()
    u = int(h[:15], 16) % 1000000 + 1
    return math.log(u / 1000000.0) / w


def test_weighted_sample_matches_reference_keys(spark):
    # 30 docs with token counts 1..30; recompute the A-Res keys with
    # plain hashlib/math and require the EXACT same top-10 in the same
    # order with 6-dp-rounded keys
    rows = [(i, " ".join(["tok"] * i)) for i in range(1, 31)]
    out = weighted_sample(_docs(spark, rows), k=10).collect()
    expect = sorted(((i, i, _es_key(i, i)) for i in range(1, 31)),
                    key=lambda t: (-t[2], t[0]))[:10]
    assert [(r["doc_id"], r["n_tokens"]) for r in out] == \
        [(i, w) for i, w, _ in expect]
    for r, (_, _, k) in zip(out, expect):
        assert abs(r["es_key"] - round(k, 6)) < 1e-9


def test_weighted_sample_drops_empty_docs(spark):
    rows = [(1, "a b c"), (2, "   "), (3, "")]
    out = weighted_sample(_docs(spark, rows), k=10).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_budget_selection_is_maximal_quality_prefix(spark):
    # identical text => identical quality; selection must then be the
    # id-ordered prefix fitting the budget, and adding the next doc
    # must overflow it
    rows = [(i, " ".join(["the", "cat", "sat", "on", "mat"] * 4))
            for i in range(1, 11)]  # 20 tokens each
    out = budget_selection(_docs(spark, rows), budget=70).collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3]  # 60 <= 70 < 80
    assert out[-1]["running"] == 60
    assert len({r["quality"] for r in out}) == 1


def test_budget_selection_orders_by_quality_first(spark):
    # doc 9 is low-quality (one repeated word), docs 1-2 higher; the
    # low-quality doc must be cut first even though its id is larger
    good = "the quick brown fox jumps over the lazy dog near a river"
    rows = [(1, good), (2, good + " today"), (9, " ".join(["spam"] * 12))]
    out = budget_selection(_docs(spark, rows), budget=25).collect()
    ids = [r["doc_id"] for r in out]
    assert 9 not in ids and set(ids) == {1, 2}


def test_ols_trend_exact_line(spark):
    # close = 100 + 0.25 * xi on symbol A (exact on the 1e-4 grid) and
    # a flat series on B: slope/intercept/r2 must come out exact, and
    # the zero-variance symbol must NULL its r2 (den2 = 0)
    t0 = dt.datetime(2024, 1, 1)
    bars = spark.createDataFrame(
        [Row(event_type="A", hr=t0 + dt.timedelta(hours=i),
             close=100.0 + 0.25 * (i + 1)) for i in range(8)]
        + [Row(event_type="B", hr=t0 + dt.timedelta(hours=i), close=50.0)
           for i in range(8)],
        "event_type string, hr timestamp, close double")
    out = {r["event_type"]: r for r in ols_trend(bars).collect()}
    a, b = out["A"], out["B"]
    assert a["slope"] == 0.25 and a["intercept"] == 100.0
    assert a["r2"] == 1.0 and a["n"] == 8
    assert b["slope"] == 0.0 and b["intercept"] == 50.0
    assert b["r2"] is None


def test_ols_trend_handles_single_bar(spark):
    bars = spark.createDataFrame(
        [Row(event_type="A", hr=dt.datetime(2024, 1, 1), close=10.0)],
        "event_type string, hr timestamp, close double")
    r = ols_trend(bars).collect()[0]
    assert r["n"] == 1 and r["slope"] is None and r["intercept"] is None \
        and r["r2"] is None


def test_mad_anomaly_hand_computed(spark):
    # counts 10,10,10,11,9,50 for key A: lower median over
    # (value, hour) order = 10; deviations 0,0,0,1,1,40 -> lower
    # median (MAD) = 0... with MAD 0 every nonzero deviation flags.
    # Key B is a clean series with one mild outlier under 3*MAD.
    from stock_data_etl_pipeline_spark.plans.catalog_select import (
        mad_anomaly)
    t0 = dt.datetime(2024, 1, 1)
    rows_a = [10, 10, 10, 11, 9, 50]
    rows_b = [5, 6, 7, 8, 9, 10]
    df = spark.createDataFrame(
        [Row(event_type="A", hr=t0 + dt.timedelta(hours=i), c=c)
         for i, c in enumerate(rows_a)]
        + [Row(event_type="B", hr=t0 + dt.timedelta(hours=i), c=c)
           for i, c in enumerate(rows_b)],
        "event_type string, hr timestamp, c long")
    out = {(r["event_type"], r["c"]): r for r in mad_anomaly(df).collect()}
    assert out[("A", 50)]["med"] == 10 and out[("A", 50)]["mad"] == 0
    assert out[("A", 50)]["anomaly"] is True
    assert out[("A", 11)]["anomaly"] is True   # MAD 0: any deviation flags
    assert out[("A", 10)]["anomaly"] is False
    # B: sorted 5..10, lower median = 7; devs 2,1,0,1,2,3 sorted
    # 0,1,1,2,2,3 lower median = 1 -> threshold 3, only dev>3 flags: none
    assert out[("B", 10)]["med"] == 7 and out[("B", 10)]["mad"] == 1
    assert not any(r["anomaly"] for (k, _), r in out.items() if k == "B")


def test_drawdown_duration_hand_computed(spark):
    # closes 10, 9, 8, 11, 10, 10, 10, 12: underwater at idx 1,2
    # (peak 10) and idx 4,5,6 (peak 11) -> runs of 2 and 3; bar 7 sets
    # a new peak. Strictly-below semantics: a bar AT the peak is not
    # underwater.
    from stock_data_etl_pipeline_spark.plans.catalog_select import (
        drawdown_duration)
    t0 = dt.datetime(2024, 1, 1)
    closes = [10.0, 9.0, 8.0, 11.0, 10.0, 10.0, 10.0, 12.0]
    bars = spark.createDataFrame(
        [Row(event_type="A", hr=t0 + dt.timedelta(hours=i), close=c)
         for i, c in enumerate(closes)]
        + [Row(event_type="UP", hr=t0 + dt.timedelta(hours=i),
               close=float(i)) for i in range(4)],
        "event_type string, hr timestamp, close double")
    out = {r["event_type"]: r for r in drawdown_duration(bars).collect()}
    assert out["A"]["n_bars"] == 8
    assert out["A"]["n_underwater"] == 5
    assert out["A"]["max_underwater_run"] == 3
    # monotone series never goes underwater -> zero-filled
    assert out["UP"]["n_underwater"] == 0
    assert out["UP"]["max_underwater_run"] == 0


def test_grouped_running_total_equals_window_and_splits_hot_group(spark):
    # 9000 of 10000 rows in one hot group: per-group prefix sums must
    # equal the plain partitionBy window EXACTLY, while the hot group's
    # rows span multiple range partitions (the parallelism a window
    # partition cannot offer)
    from stock_data_etl_pipeline_spark.operators.windows import (
        grouped_running_total)
    df = (spark.range(10_000).select(
        F.when(F.col("id") < 9000, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 7).cast("string")))
        .alias("g"),
        F.col("id").alias("i"),
        (F.col("id") % 13 + 1).alias("v"))
        .repartition(16))
    got = grouped_running_total(df, ["g"], [F.col("i")], "v", out="run")
    w = Window.partitionBy("g").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0)
    want = df.withColumn("run", F.sum("v").over(w).cast("long"))
    assert got.count() == 10_000
    assert (got.join(want.withColumnRenamed("run", "want"), ["g", "i"])
            .filter(F.col("run") != F.col("want")).count()) == 0
    # spread evidence: range layout puts the hot group on > 1 partition
    # (what hash-on-group can never do). Pin an explicit partition
    # count: on 10k in-memory rows AQE rightly coalesces an un-sized
    # range exchange to one partition (at scale the shuffle stats keep
    # it wide), so the un-sized layout can't witness the spread here.
    n_parts = (df.repartitionByRange(8, F.col("g"), F.col("i"))
               .withColumn("p", F.spark_partition_id())
               .filter(F.col("g") == "hot")
               .select("p").distinct().count())
    assert n_parts > 1


def test_grouped_running_total_keeps_null_group_keys(spark):
    # NULL group keys form a window partition of their own in both
    # Spark's partitionBy and the SQL oracles; the offset join must be
    # null-safe or every NULL-keyed row silently vanishes (round-6
    # advisory). Equality vs the plain window on a NULL-heavy fixture.
    from stock_data_etl_pipeline_spark.operators.windows import (
        grouped_running_total)
    df = (spark.range(300).select(
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 4).cast("string")))
        .alias("g"),
        F.col("id").alias("i"),
        (F.col("id") % 5 + 1).alias("v"))
        .repartition(8))
    got = grouped_running_total(df, ["g"], [F.col("i")], "v", out="run")
    assert got.count() == 300  # no dropped rows
    w = Window.partitionBy("g").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0)
    want = df.withColumn("want", F.sum("v").over(w).cast("long"))
    joined = got.join(want, (F.col("run") != F.col("want"))
                      & got["g"].eqNullSafe(want["g"])
                      & (got["i"] == want["i"]))
    assert joined.count() == 0


def test_released_checkpoint_fails_fast_not_silently_recomputes(spark):
    # The build-then-materialize contract is now enforced, not assumed:
    # a prefix-sum result re-executed AFTER release_pinned() must raise
    # (checkpoint blocks gone, lineage truncated) — never silently
    # recompute against freshly sampled range boundaries while the
    # collected offsets describe the old layout (round-6 advisory).
    import pytest

    from stock_data_etl_pipeline_spark.operators.pinned import (
        release_pinned)
    from stock_data_etl_pipeline_spark.operators.windows import (
        distributed_running_total)
    df = spark.range(1000).select(
        F.col("id").alias("i"), (F.col("id") % 7 + 1).alias("v"))
    out = distributed_running_total(df, [F.col("i")], "v", out="run")
    assert out.count() == 1000  # materializes fine while pinned
    release_pinned()
    with pytest.raises(Exception, match="CHECKPOINT|Checkpoint"):
        out.collect()


def test_release_pinned_warns_once_if_checkpoint_accessor_breaks(
        spark, monkeypatch, caplog):
    # If a Spark upgrade moves the private LogicalRDD accessor,
    # release_pinned must stay non-raising BUT make the degradation
    # visible: exactly one warning on a live context (not one per
    # release, not silence) — the silent-swallow path would quietly
    # recreate the storage growth the registry exists to prevent.
    import logging

    from stock_data_etl_pipeline_spark.operators import pinned

    def boom(df):
        raise AttributeError("accessor moved")

    monkeypatch.setattr(pinned, "_unpersist_checkpoint", boom)
    monkeypatch.setattr(pinned, "_warned_checkpoint_accessor", False)
    df = spark.range(10).localCheckpoint(eager=True)
    pinned._PINNED.append(("checkpoint", df))
    pinned._PINNED.append(("checkpoint", df))
    with caplog.at_level(logging.WARNING,
                         logger="stock_data_etl_pipeline_spark."
                                "operators.pinned"):
        pinned.release_pinned()
    warns = [r for r in caplog.records
             if "localCheckpoint block release failed" in r.message]
    assert len(warns) == 1
    assert not pinned._PINNED


def test_acf_known_series(spark):
    # perfectly alternating series 10, 20, 10, 20 ... (n=8): ACF is
    # exactly -1 at odd lags and +1 at even lags (mean 15, deviations
    # +-5 alternate); denominator n*sum(y^2) - sy^2 > 0. Closes on the
    # 1e-2 grid keep everything exact, so the assertion is equality.
    from stock_data_etl_pipeline_spark.plans.catalog_select import acf
    t0 = dt.datetime(2024, 1, 1)
    bars = spark.createDataFrame(
        [Row(event_type="A", hr=t0 + dt.timedelta(hours=i),
             close=10.0 if i % 2 == 0 else 20.0) for i in range(8)],
        "event_type string, hr timestamp, close double")
    out = {r["k"]: r for r in acf(bars).collect()}
    # finite-sample estimator: r_k = (n^2*sxy - n*sy*(sh+st) + m*sy^2)
    # / (n*(n*sy2 - sy^2)); for the alternating series with n=8 the
    # exact values follow from the integer sums (computed by hand
    # below) rather than the infinite-series +-1
    yv = [1000 if i % 2 == 0 else 2000 for i in range(8)]
    n, sy = 8, sum(yv)
    sy2 = sum(v * v for v in yv)
    for k in range(1, 6):
        pairs = [(yv[t], yv[t + k]) for t in range(8 - k)]
        m = len(pairs)
        sxy = sum(a * b for a, b in pairs)
        sh = sum(a for a, _ in pairs)
        st = sum(b for _, b in pairs)
        expect = (n * n * sxy - n * sy * (sh + st) + m * sy * sy) \
            / (n * (n * sy2 - sy * sy))
        assert abs(out[k]["acf"] - round(expect, 6)) < 1e-12, k
        assert out[k]["m"] == 8 - k
    # sign structure of the alternating series survives the
    # finite-sample correction
    assert out[1]["acf"] < 0 < out[2]["acf"]


def test_acf_constant_series_nulls(spark):
    from stock_data_etl_pipeline_spark.plans.catalog_select import acf
    t0 = dt.datetime(2024, 1, 1)
    bars = spark.createDataFrame(
        [Row(event_type="A", hr=t0 + dt.timedelta(hours=i), close=5.0)
         for i in range(6)],
        "event_type string, hr timestamp, close double")
    assert all(r["acf"] is None for r in acf(bars).collect())


def test_source_balance_hand_computed(spark):
    # sources with 1, 1, 2, 4 docs: N=8, n=4, sorted sizes (1,1,2,4)
    # Gini numerator = sum c_i*(2i-n-1) = 1*(-3)+1*(-1)+2*1+4*3 = 10
    # -> gini = 10/(4*8) = 0.3125; top_share = 0.5; entropy =
    # ln(8) - (0 + 0 + 2ln2 + 4ln4)/8 with 1e-6-quantized terms
    import math
    from stock_data_etl_pipeline_spark.plans.catalog_select import (
        source_balance)
    rows = [("s1", 1), ("s2", 1), ("s3", 2), ("s4", 4)]
    docs = spark.createDataFrame(
        [Row(doc_id=100 * j + i, source=s)
         for j, (s, n) in enumerate(rows) for i in range(n)],
        "doc_id long, source string")
    r = source_balance(docs).collect()[0]
    assert r["n_sources"] == 4 and r["n_docs"] == 8
    assert r["gini"] == 0.3125 and r["top_share"] == 0.5
    hsum = sum(round(c * math.log(c) * 1e6) for _, c in rows)
    assert abs(r["entropy"]
               - round(math.log(8) - hsum / 1e6 / 8, 6)) < 1e-12


def test_pin_cut_roundtrip_memoization_and_release(spark):
    # pin_cut must (1) preserve rows/schema through the parquet
    # roundtrip, (2) reuse the existing cut for a semantically
    # identical plan (a bench re-attempt must not pay the write job
    # again), (3) delete the files and the reuse index on release.
    import os
    from pyspark.sql import functions as F
    from stock_data_etl_pipeline_spark.operators import pinned
    from stock_data_etl_pipeline_spark.operators.pinned import (
        pin_cut, release_pinned)

    release_pinned()
    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    cut1 = pin_cut(base)
    # names and types survive the roundtrip; Spark marks every
    # file-source column nullable on read, so only nullability widens
    assert [(f.name, f.dataType) for f in cut1.schema.fields] \
        == [(f.name, f.dataType) for f in base.schema.fields]
    assert sorted(r.id for r in cut1.collect()) == list(range(100))
    n_cuts = len(pinned._CUTS)
    assert n_cuts == 1
    path1 = pinned._CUTS[0][1]

    # identical plan, rebuilt from scratch -> no new write
    again = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    cut2 = pin_cut(again)
    assert len(pinned._CUTS) == 1
    assert cut2.count() == 100

    # different plan -> its own cut
    other = pin_cut(spark.range(50))
    assert len(pinned._CUTS) == 2
    assert other.count() == 50

    released = release_pinned()
    assert released >= 2
    assert pinned._CUTS == []
    assert not os.path.exists(path1)
    # a consumer re-executed after release fails loudly, never
    # silently recomputes (same contract as pin_checkpoint)
    import pytest as _pytest
    with _pytest.raises(Exception):
        cut1.collect()
