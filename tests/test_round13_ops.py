"""Round-13 consolidation tests.

Covers the round-12 verdict/advice closures:

- ``vocab_coverage_curve`` no longer runs an unpartitioned window over
  the data-scaled vocab relation — the vocab is top-k'd through a
  distributed ``TakeOrderedAndProject`` and only the ≤ max(cutoffs)-row
  result is ranked (verdict item 1).
- ``tools.plan_audit._count_global_windows`` detects unpartitioned
  physical Window nodes so the plan-regression gate can allowlist the
  constant-bounded sites and fail on any new data-scaled one
  (verdict item 2).
- ``operators.pinned._cut_root`` treats an ABSENT ``spark.master`` as
  non-local and memoizes per (pinCutDir, master) configuration instead
  of once per process (round-12 advice).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from stock_data_etl_pipeline_spark.operators import corpus as CP
from stock_data_etl_pipeline_spark.operators import pinned
from tools.plan_audit import _count_global_windows, audit_one


# ---------------------------------------------------------------- coverage


def test_coverage_curve_vocab_never_globally_sorted(spark):
    """The vocab relation must reach the rank window through a
    distributed top-k (TakeOrderedAndProject), never a global sort —
    the round-12 scale defect was the full |vocab| relation moving to
    one partition."""
    df = spark.createDataFrame(
        [(i, "alpha beta beta gamma") for i in range(50)], ["id", "text"])
    out = CP.vocab_coverage_curve(df, cutoffs=(2, 100))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    # the one remaining global window ranks the ≤ max(cutoffs)-row
    # top-k relation — bounded by a constant, which is the allowlisted
    # shape; it must sit ABOVE the TakeOrdered, so the full-vocab sort
    # never happens
    assert _count_global_windows(plan) >= 1


def test_coverage_curve_values_unchanged_by_bounding(spark):
    """Bounding the ranked relation must not change any emitted value:
    hand-computed curve on a corpus where |vocab| straddles the
    cutoffs (2 < |vocab|=3 < 100)."""
    df = spark.createDataFrame(
        [(1, "a a a b b c")], ["id", "text"])
    rows = {r["cutoff"]: r for r in
            CP.vocab_coverage_curve(df, cutoffs=(2, 100)).collect()}
    assert rows[2]["n_vocab"] == 2
    assert rows[2]["covered_tokens"] == 5          # a:3 + b:2
    assert rows[2]["coverage"] == pytest.approx(5 / 6)
    assert rows[100]["n_vocab"] == 3
    assert rows[100]["covered_tokens"] == 6
    assert rows[100]["coverage"] == pytest.approx(1.0)


def test_coverage_curve_empty_corpus_still_zero(spark):
    """count()-based totals: an empty corpus yields n_vocab=0 /
    covered=0 / NULL coverage (the round-12 review finding must stay
    closed after the rewrite)."""
    df = spark.createDataFrame([], "id long, text string")
    rows = CP.vocab_coverage_curve(df, cutoffs=(100,)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_vocab"], r["covered_tokens"], r["coverage"]) == (0, 0, None)


# ------------------------------------------------------ global-win counter


GLOBAL_LINE = (
    "+- Window [row_number() windowspecdefinition(v#2L ASC NULLS FIRST, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
    "AS r#3], [v#2L ASC NULLS FIRST]")
PART_LINE = (
    "+- Window [row_number() windowspecdefinition(k#1L, v#2L ASC NULLS "
    "FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
    "currentrow$())) AS r#5], [k#1L], [v#2L ASC NULLS FIRST]")


ARROW_GLOBAL_LINE = (
    "+- ArrowWindowPython [pmean(v#2)#3 windowspecdefinition(v#2 ASC "
    "NULLS FIRST, specifiedwindowframe(RowFrame, -2, currentrow$())) "
    "AS m#5], [v#2 ASC NULLS FIRST], 203")
ARROW_PART_LINE = (
    "+- ArrowWindowPython [pmean(v#2)#3 windowspecdefinition(k#1L, v#2 "
    "ASC NULLS FIRST, specifiedwindowframe(RowFrame, -2, currentrow$())) "
    "AS m#5], [k#1L], [v#2 ASC NULLS FIRST], 203")
PART_NO_ORDER_LINE = (
    "+- Window [sum(v#2L) windowspecdefinition(k#1L, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
    "unboundedfollowing$())) AS s#3L], [k#1L]")
GLOBAL_NO_ORDER_LINE = (
    "+- Window [sum(v#2L) windowspecdefinition(specifiedwindowframe("
    "RowFrame, unboundedpreceding$(), unboundedfollowing$())) AS s#5L]")


def test_global_window_counter_on_plan_strings():
    assert _count_global_windows(GLOBAL_LINE) == 1
    assert _count_global_windows(PART_LINE) == 0
    # partitionBy WITHOUT orderBy also prints 2 bracket groups but is
    # NOT global — the last group has no ASC/DESC sort markers
    assert _count_global_windows(PART_NO_ORDER_LINE) == 0
    # empty partitionBy and no orderBy: 1 group, global
    assert _count_global_windows(GLOBAL_NO_ORDER_LINE) == 1
    # pandas/Arrow window nodes plan the SAME single-partition exchange
    # — the counter must see them (round-13 review finding); the
    # trailing batch-size argument adds no bracket group
    assert _count_global_windows(ARROW_GLOBAL_LINE) == 1
    assert _count_global_windows(ARROW_PART_LINE) == 0
    assert _count_global_windows(GLOBAL_LINE + "\n" + PART_LINE
                                 + "\n" + GLOBAL_LINE) == 2
    # WindowGroupLimit / unrelated lines never match the anchor
    assert _count_global_windows(
        "+- WindowGroupLimit [v#2L ASC], rank(v#2L), 5\n"
        "+- Exchange SinglePartition, ENSURE_REQUIREMENTS") == 0
    assert _count_global_windows("") == 0


def test_global_window_counter_live_plans(spark):
    """The counter must agree with Spark's own WindowExec warning on
    live plans: a partitionBy window counts 0, an empty-partitionBy
    window counts ≥1."""
    df = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    from pyspark.sql import Window
    gl = df.select(F.row_number().over(Window.orderBy("v")).alias("r"))
    gl.collect()
    assert _count_global_windows(
        gl._jdf.queryExecution().executedPlan().toString()) >= 1
    pt = df.select(F.row_number().over(
        Window.partitionBy("k").orderBy("v")).alias("r"))
    pt.collect()
    assert _count_global_windows(
        pt._jdf.queryExecution().executedPlan().toString()) == 0
    pno = df.select(F.sum("v").over(Window.partitionBy("k")).alias("s"))
    pno.collect()
    assert _count_global_windows(
        pno._jdf.queryExecution().executedPlan().toString()) == 0
    gno = df.select(F.sum("v").over(Window.partitionBy()).alias("s"))
    gno.collect()
    assert _count_global_windows(
        gno._jdf.queryExecution().executedPlan().toString()) >= 1


def test_audit_one_exports_globalwin(spark, tmp_path):
    """audit_one must expose the counter so the committed PLAN_AUDIT
    artifact carries a globalwin= column for the regression gate."""
    import __spark_entry__ as entrymod
    props, _ = audit_one(
        spark, entrymod.queries()["q6_revenue_change"],
        "/root/testdata/sf0.001")
    assert "globalwin" in props
    assert props["globalwin"] == 0


# ------------------------------------------------------ window interleave


def test_changed_and_never_checked_tiers_interleave(tmp_path):
    """A hub-helper edit that moves MANY green fingerprints must not
    flood the driver's fixed 50-row window and starve never-checked
    rookies (the r13 hazard: one pin_cut-resolver edit moved 39 green
    closures while 18 rookies awaited their first row) — and a rookie
    flood must not starve changed-code re-attestation either. The
    window order must alternate the two tiers."""
    import json

    from stock_data_etl_pipeline_spark.plans import (CATALOG,
                                                     _query_fingerprint,
                                                     _window_order)

    names = list(CATALOG)
    changed = names[:6]          # green rows whose fingerprint moved
    rookies = names[6:10]        # never driver-checked
    greens = names[10:12]        # green, fingerprint current
    art = {n: {"rows_match": True, "schema_match": True,
               "hash_match": True} for n in changed + greens}
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps(art))
    (tmp_path / "tools").mkdir()
    manifest = {n: {"fp": "feed0000dead0000", "round": 7} for n in changed}
    manifest.update({n: {"fp": _query_fingerprint(n), "round": 7}
                     for n in greens})
    (tmp_path / "tools" / "QUERY_FINGERPRINTS.json").write_text(
        json.dumps(manifest))
    order = _window_order(str(tmp_path))
    # head alternates changed, rookie, changed, rookie ... — after 4
    # pairs the rookie tier is exhausted and changed continues; the
    # first 8 slots must contain BOTH whole tiers' fair shares
    head8 = order[:8]
    assert sum(n in changed for n in head8) == 4
    assert sum(n in rookies for n in head8) == 4
    assert order[0] in changed                   # changed leads the pair
    # both tiers fully precede every fresh green
    last_tiered = max(order.index(n) for n in changed + rookies)
    assert all(order.index(g) > last_tiered for g in greens)
    assert sorted(order) == sorted(CATALOG)


# ------------------------------------------------------------- _cut_root


class _FakeConf:
    def __init__(self, d):
        self._d = d

    def get(self, k, default=None):
        return self._d.get(k, default)


class _FakeSpark:
    def __init__(self, **conf):
        self.conf = _FakeConf(conf)


@pytest.fixture()
def fresh_cut_roots():
    saved = dict(pinned._CUT_ROOTS)
    pinned._CUT_ROOTS.clear()
    yield pinned._CUT_ROOTS
    pinned._CUT_ROOTS.clear()
    pinned._CUT_ROOTS.update(saved)


def test_cut_root_absent_master_is_not_local(fresh_cut_roots, tmp_path):
    """No spark.master conf (Spark Connect) must NOT resolve to a
    driver-local tempdir — it falls to the cluster-visible warehouse
    branch (round-12 advice)."""
    wh = str(tmp_path / "warehouse")
    root = pinned._cut_root(_FakeSpark(**{"spark.sql.warehouse.dir": wh}))
    assert root.startswith(wh)
    assert "spark-pin-cut-" in root


def test_cut_root_memo_keyed_on_config(fresh_cut_roots, tmp_path):
    """A later session that sets spark.stockDataEtl.pinCutDir must get
    a root under THAT dir, not the memoized earlier root; asking twice
    with the same config reuses the memo."""
    local = _FakeSpark(**{"spark.master": "local[4]"})
    r1 = pinned._cut_root(local)
    assert pinned._cut_root(local) == r1  # memo hit
    conf_dir = str(tmp_path / "shared")
    confd = _FakeSpark(**{"spark.master": "local[4]",
                          "spark.stockDataEtl.pinCutDir": conf_dir})
    r2 = pinned._cut_root(confd)
    assert r2 != r1
    assert r2.startswith(conf_dir)
    assert "spark-pin-cut-" in r2


def test_cut_root_nonlocal_master_uses_warehouse(fresh_cut_roots, tmp_path):
    wh = str(tmp_path / "wh2")
    sp = _FakeSpark(**{"spark.master": "spark://host:7077",
                       "spark.sql.warehouse.dir": wh})
    root = pinned._cut_root(sp)
    assert root.startswith(wh)
    assert "spark-pin-cut-" in root


# ------------------------------------------------- round-13 rookie fixtures


def test_ivf_recall_sweep_hand_computed(spark):
    """2-D geometry where the curve is hand-checkable: the true top-2
    split across two cells, so nprobe=1 recalls half and nprobe=2
    recalls all (recall must be non-decreasing in nprobe)."""
    from stock_data_etl_pipeline_spark.operators.similarity import (
        ivf_recall_sweep)
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]),      # cell c1; cos(q)=0.8
         (2, [0.0, 1.0]),      # cell c2; cos(q)=0.6
         (3, [0.6, 0.8]),      # nearest centroid c2; cos(q)=0.96 (best)
         (4, [-1.0, 0.0])],    # cell c2 (0 > -1); cos(q)=-0.8
        "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0])],
        "centroid_id long, centroid array<double>")
    q = [0.8, 0.6]  # probes c1 (cos .8) before c2 (cos .6)
    rows = {r["nprobe"]: r for r in
            ivf_recall_sweep(emb, cents, q, k=2, nprobes=(1, 2)).collect()}
    # exact top-2 = {3 (.96), 1 (.8)}; cell c1 holds only vec 1
    assert (rows[1]["n_hits"], rows[1]["recall"]) == (1, 0.5)
    assert (rows[2]["n_hits"], rows[2]["recall"]) == (2, 1.0)
    assert all(r["k"] == 2 for r in rows.values())


def test_ivf_recall_sweep_monotone_on_real_data(spark):
    """On the sf0.001 embeddings the curve must be non-decreasing in
    nprobe and hit recall=1.0 once every cell is probed (probing all
    cells IS the brute-force scan)."""
    from stock_data_etl_pipeline_spark.operators.similarity import (
        ivf_recall_sweep)
    from stock_data_etl_pipeline_spark.sources.registry import load_table
    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n_cells = e.filter(F.col("vec_id") % 40 == 0).count()
    cents = (e.filter(F.col("vec_id") % 40 == 0)
             .select(F.col("vec_id").alias("centroid_id"),
                     F.col("embedding").alias("centroid")))
    qv = list(e.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    rows = (ivf_recall_sweep(e, cents, qv, k=10,
                             nprobes=(1, 2, n_cells))
            .orderBy("nprobe").collect())
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0


def test_streaming_interval_counts_matches_batch_sessionize(spark, tmp_path):
    """Drained stream-static interval join == batch sessionization's
    per-session counts; inner join loses nothing (sessions partition
    each user's events)."""
    import datetime as dt

    from stock_data_etl_pipeline_spark.streaming.events import (
        sessionize, streaming_interval_join_counts)
    t0 = dt.datetime(2024, 1, 8, 10, 0)
    rows = []
    # user 1: two sessions (31-min gap breaks); user 2: one session
    for i, (u, mins) in enumerate([(1, 0), (1, 10), (1, 41), (1, 50),
                                   (2, 0), (2, 29)]):
        rows.append((i, t0 + dt.timedelta(minutes=mins), u, "view", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    p = str(tmp_path / "ev.parquet")
    # TIMESTAMP_MICROS: INT96 reads back as ns through the footer
    # detector and mismatches the us schema (round-12 pin)
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        ev.write.parquet(p)
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    iv = sessionize(ev.select("event_id", "user_id", "ts"),
                    gap_seconds=1800)
    got = {(r["user_id"], r["session_id"]): (r["n_events"],
                                             r["session_start"])
           for r in streaming_interval_join_counts(spark, p, iv).collect()}
    exp = {(r["user_id"], r["session_id"]): (r["n_events"],
                                             r["session_start"])
           for r in iv.collect()}
    assert got == exp
    assert sum(n for n, _ in got.values()) == 6      # nothing dropped
    assert got[(1, 1)][0] == 2 and got[(1, 2)][0] == 2


# ----------------------------------------------------------------- bench


def test_bench_records_attempt_loadavg():
    """bench.py must stamp a per-attempt loadavg list next to
    attempt_times (round-12 verdict item 6) — checked statically so
    the test doesn't pay a bench run."""
    import os
    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")).read()
    assert "attempt_loadavg" in src
    assert "os.getloadavg()[0]" in src
    # loadavg_inrun_max is recorded but must stay INFORMATIONAL — two
    # r13 runs proved it can't separate co-tenant contamination from
    # our own local[32] bursts (clean run peaked 8.42, contaminated
    # run 6.95), so routing keys on the pre-JVM baseline only
    assert "loadavg_inrun_max" in src
    assert "inrun_loaded" not in src
