"""Semantic tests for operators/quality.py and the graph/time-series
analytics added alongside it."""

from __future__ import annotations

from stock_data_etl_pipeline_spark.operators.analytics import triangle_stats
from stock_data_etl_pipeline_spark.operators.quality import (
    RefRule, UniqueRule, dq_check, in_range, in_set, matches, not_null)


def test_dq_check_all_rule_kinds(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A", "x1"), (2, -5.0, "A", "x2"),
         (2, 3.0, "Z", "no"), (None, None, None, None)],
        "id long, amount double, status string, code string")
    ref = spark.createDataFrame([(1,), (2,)], "k long")
    out = dq_check(df, [
        not_null("id"),
        in_range("amount", lo=0),
        in_set("status", ("A", "B")),
        matches("code", r"^x\d$"),
        UniqueRule("id_unique", ("id",)),
        RefRule("id_ref", "id", ref, "k"),
    ])
    got = {r["constraint_name"]: (r["violations"], r["checked"])
           for r in out.collect()}
    assert got["id_not_null"] == (1, 4)
    assert got["amount_in_range"] == (1, 4)      # NULL amount not a violation
    assert got["status_in_set"] == (1, 4)        # 'Z'
    assert got["code_matches"] == (1, 4)         # 'no'
    assert got["id_unique"] == (1, 4)            # one extra row for key 2
    assert got["id_ref"] == (0, 3)               # nulls skipped from checked


def test_dq_check_clean_table_reports_zero(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    out = dq_check(df, [not_null("id"), UniqueRule("id_unique", ("id",))])
    assert all(r["violations"] == 0 for r in out.collect())


def test_triangle_stats_counts_each_triangle_once(spark):
    # K4 on {1,2,3,4} = 4 triangles; duplicate + reversed edges collapse
    edges = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    df = spark.createDataFrame(edges + [(1, 2)], "x long, y long")
    row = triangle_stats(df, "x", "y").collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 6, 4)


def test_triangle_stats_open_wedge_is_not_a_triangle(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "x long, y long")
    row = triangle_stats(df, "x", "y").collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (3, 2, 0)


def test_triangle_orientation_invariance(spark):
    # Hub-heavy fixture: hub 0 joined to 60 leaves, consecutive leaves
    # joined (fan of triangles at the hub), plus a disjoint K4.  The
    # degree-oriented wedge join must count exactly what the raw-id
    # orientation counts — triangle counts are orientation-invariant.
    import itertools
    from pyspark.sql import functions as F
    from stock_data_etl_pipeline_spark.operators.analytics import (
        clustering_coefficient)
    edges = [(0, i) for i in range(1, 61)]
    edges += [(i, i + 1) for i in range(1, 60)]
    edges += list(itertools.combinations(range(100, 104), 2))
    df = spark.createDataFrame(edges, "x long, y long")
    row = triangle_stats(df, "x", "y").collect()[0]
    # raw-id-oriented reference count, computed with the pre-r8 plan
    e = (df.select(F.least("x", "y").alias("a"),
                   F.greatest("x", "y").alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    w = (e.alias("e1").join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
         .select(F.col("e1.a").alias("a"), F.col("e2.b").alias("c")))
    ref_tri = (w.join(e.alias("e3"), (w["a"] == F.col("e3.a"))
                      & (w["c"] == F.col("e3.b")), "left_semi").count())
    assert row["n_triangles"] == ref_tri == 59 + 4
    assert (row["n_nodes"], row["n_edges"]) == (65, 125)
    cc = clustering_coefficient(df, "x", "y").collect()[0]
    assert cc["n_triangles"] == 63
    # wedges: hub 0 has degree 60 -> C(60,2)=1770; leaf degrees vary
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert cc["n_wedges"] == wedges
    assert cc["transitivity"] == (6_000_000 * 63 // (2 * wedges)) / 1e6


def test_psi_drift_flags_shifted_distribution(spark):
    import datetime as dt
    from stock_data_etl_pipeline_spark.operators.quality import psi_drift
    rows = []
    # 'stable': identical uniform values in both halves -> psi ~ 0
    # 'shifted': low values first half, high values second -> psi large
    for i in range(200):
        first = i < 100
        ts = dt.datetime(2024, 1, 1 if first else 20, i % 24)
        rows.append(("stable", ts, float((i % 10) * 60 + 5), i))
        rows.append(("shifted", ts,
                     5.0 if first else 595.0, 10_000 + i))
    e = spark.createDataFrame(
        [(k, t, v, eid) for k, t, v, eid in rows],
        "event_type string, ts timestamp, value double, event_id long")
    out = {r["event_type"]: r for r in psi_drift(e).collect()}
    assert out["stable"]["psi"] < 0.01 and not out["stable"]["drifted"]
    assert out["shifted"]["psi"] > 1.0 and out["shifted"]["drifted"]
    assert out["shifted"]["n_first"] == out["shifted"]["n_second"] == 100
