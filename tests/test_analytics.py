"""Semantic tests for operators/analytics.py — funnel greediness,
cohort offsets, pair-support multiplicity, skew math, fuzzy blocking."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stock_data_etl_pipeline_spark.operators.analytics import (
    cohort_retention, frequent_pairs, funnel, fuzzy_match,
    key_skew_profile)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_funnel_greedy_counts_late_click_ignores_early_only(spark):
    # u1: click BEFORE first view, plus another click after -> converts.
    # u2: click ONLY before first view -> stuck at stage 1.
    # u3: full ordered path.
    rows = [
        ("u1", "click", _ts(0)), ("u1", "view", _ts(1)),
        ("u1", "click", _ts(2)),
        ("u2", "click", _ts(0)), ("u2", "view", _ts(1)),
        ("u3", "view", _ts(0)), ("u3", "click", _ts(1)),
        ("u3", "purchase", _ts(2)),
    ]
    e = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    got = {r["step"]: r["users"]
           for r in funnel(e, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_qualifies(spark):
    # an event AT the frontier timestamp counts (>=, not >)
    e = spark.createDataFrame(
        [("u", "view", _ts(5)), ("u", "click", _ts(5))],
        "user_id string, event_type string, ts timestamp")
    got = {r["step"]: r["users"] for r in funnel(e, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_cohort_retention_offsets(spark):
    # first event Mon Jan 1 2024 (week 0); active again 2 weeks later
    e = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 3)), (1, dt.datetime(2024, 1, 16)),
         (2, dt.datetime(2024, 1, 10))],
        "user_id long, ts timestamp")
    rows = cohort_retention(e).collect()
    got = {(r["cohort_week"].date().isoformat(), r["week_offset"]):
           r["active_users"] for r in rows}
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
                   ("2024-01-08", 0): 1}


def test_frequent_pairs_multiplicity_and_support(spark):
    # basket 1 holds item a twice + b once: support(a,b) must be 1 from
    # that basket (distinct-first), 2 total with basket 2; (a,c) support
    # 1 falls below min_support=2.
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = frequent_pairs(df, "basket", "item", min_support=2).collect()
    assert [(r["item_a"], r["item_b"], r["support"]) for r in out] == [
        ("a", "b", 2)]


def test_key_skew_profile_math(spark):
    # keys: a x6, b x2, c x1, d x1 -> mean 2.5, skew_x(a) = 2.4
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", top=2).collect()
    assert out[0]["key"] == "a" and out[0]["cnt"] == 6
    assert abs(out[0]["skew_x"] - 2.4) < 1e-9
    assert abs(out[0]["pct"] - 60.0) < 1e-9
    assert out[1]["key"] == "b"


def test_fuzzy_match_blocked_and_thresholded(spark):
    df = spark.createDataFrame(
        [("red ring",), ("rad ring",), ("red ring",),  # dup collapses
         ("red bolt",),            # different block, never compared
         ("crimson ring",)],       # same block, dist > 2
        "name string")
    out = fuzzy_match(df, "name",
                      F.element_at(F.split(F.col("_n"), " "), -1),
                      max_dist=2).collect()
    assert [(r["name_a"], r["name_b"], r["dist"]) for r in out] == [
        ("rad ring", "red ring", 1)]


def test_pagerank_star_graph_exact_integer_semantics(spark):
    # star: hub 0 <-> leaves 1,2,3. Replicate the fixed-point integer
    # recurrence in Python and expect BIT-EQUAL ranks from Spark.
    from stock_data_etl_pipeline_spark.operators.analytics import (
        PR_SCALE, pagerank)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "pa long, pb long")
    out = {r["node"]: r["rank_e12"]
           for r in pagerank(pairs, "pa", "pb", iters=3).collect()}

    deg = {0: 3, 1: 1, 2: 1, 3: 1}
    edges = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 0)]
    n = 4
    r = {v: PR_SCALE // n for v in deg}
    base = (PR_SCALE * 15 // 100) // n
    for _ in range(3):
        s = {v: 0 for v in deg}
        for src, dst in edges:
            s[dst] += r[src] // deg[src]
        r = {v: base + (85 * s[v]) // 100 for v in deg}
    assert out == r
    # the hub dominates and leaves tie exactly
    assert out[0] > out[1] == out[2] == out[3]
    # mass stays within floor-leak tolerance of the full scale
    assert abs(sum(out.values()) - PR_SCALE) < 100 * len(deg)


def test_rfm_segments_rank_semantics(spark):
    import datetime as dt
    from stock_data_etl_pipeline_spark.plans.catalog_analytics import (
        events_rfm_segments)
    # build a tmp sf-dir shaped events table via a registered loader is
    # overkill — call the Spark side's logic through the catalog by
    # pointing at real testdata and checking invariants instead
    out = events_rfm_segments(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert 1 <= r["r"] <= 4 and 1 <= r["f"] <= 4 and 1 <= r["m"] <= 4
        assert r["segment"] in {"champion", "at_risk", "new", "regular"}
        if r["segment"] == "champion":
            assert r["r"] == 1 and r["f"] == 1
    # quartiles partition users near-evenly
    from collections import Counter
    c = Counter(r["r"] for r in out)
    assert max(c.values()) - min(c.values()) <= 1


@pytest.mark.parametrize("n,rows", [
    (4, 23),   # remainder buckets: 23 = 4*5+3 -> sizes 6,6,6,5
    (4, 24),   # exact division
    (10, 7),   # fewer rows than buckets -> bucket == rank
    (3, 1),    # single row
])
def test_distributed_ntile_matches_spark_ntile(spark, n, rows):
    """distributed_ntile must reproduce F.ntile's bucket assignment
    bit-for-bit on asc and desc total orders, including the remainder
    (first r buckets fat) rule and N < n."""
    from pyspark.sql import Window
    from stock_data_etl_pipeline_spark.operators.windows import (
        distributed_ntile)
    df = spark.createDataFrame(
        [(i, float((i * 7) % rows)) for i in range(rows)], "id long, v double")
    for order in ([ "v", "id"], [F.desc("v"), "id"]):
        want = {r["id"]: r["b"] for r in df.select(
            "id", F.ntile(n).over(Window.orderBy(*[
                F.col(c) if isinstance(c, str) else c
                for c in order])).alias("b")).collect()}
        got = {r["id"]: r["b"] for r in
               distributed_ntile(df, n, order, out="b").collect()}
        assert got == want


def test_distributed_ntile_empty_input(spark):
    from stock_data_etl_pipeline_spark.operators.windows import (
        distributed_ntile)
    df = spark.createDataFrame([], "id long, v double")
    assert distributed_ntile(df, 4, ["v", "id"], out="b").count() == 0
