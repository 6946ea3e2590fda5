"""Physical-plan regression gate.

A loader/schema change can silently kill predicate pushdown (the round-2
events-ts incident: an int64 scan path made every time predicate a
post-scan filter) or flip a keyed join into a cartesian product — both
invisible to correctness tests and only caught by reading the plan.
This gate executes a pinned, representative subset of the catalog at
sf0.001 through ``tools.plan_audit.audit_one`` and asserts the plan
invariants the per-round PLAN_AUDIT report tracks:

- scan-level predicates actually reach the parquet reader
  (``PushedFilters`` non-empty),
- small-side joins broadcast,
- no ``CartesianProduct``/``BroadcastNestedLoopJoin`` appears anywhere.

Subset, not the full 147: the full sweep is the per-round
``tools/plan_audit.py`` run; this keeps pytest latency bounded while
still covering every loader path (lineitem/orders date+range filters,
the events ts path, dim broadcast joins, a window query).
"""

from __future__ import annotations

import pytest

from tools.plan_audit import audit_one

SF_DIR = "/root/testdata/sf0.001"

# query -> required plan properties ({prop: minimum}, checked as >=)
PINNED = {
    # lineitem date-range predicate must reach the scan
    "q6_revenue_change": {"pushed": 1},
    # lineitem shipdate window + orders broadcast-side join
    "q12_priority_classes": {"pushed": 1},
    # events ts predicate pushes ONLY on the native-timestamp path —
    # the exact property the round-2 regression destroyed
    "events_hourly": {"pushed": 1},
    # dim joins must broadcast, never shuffle the small side
    "join_revenue_by_nation": {"bhj": 1},
    "join_semi_exists": {"bhj": 1},
    # scan-level equality/range filter family
    "filter_range_set_numeric": {"pushed": 1},
    "filter_is_completed": {"pushed": 1},
    # stock family: keyed rank-range self-join must stay a hash/merge
    # join on the symbol key (cartesian/bnlj asserted == 0 below)
    "stock_ewma_trend": {},
}


def test_ohlc_resample_single_data_exchange(spark):
    """The tick->bar resample's tie-break windows and aggregate must
    share ONE hash exchange on (event_type, hr) — a second
    hashpartitioning means a window/groupBy key drifted and the plan
    re-shuffles the full tick stream."""
    import __spark_entry__ as entrymod
    props, plan = audit_one(
        spark, entrymod.queries()["stock_ohlc_bars"], SF_DIR)
    # the AQE plan string appends the pre-adaptive plan after an
    # "== Initial Plan ==" marker — count only the final plan
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1, final[:4000]


@pytest.fixture(scope="module")
def audits(spark):
    import __spark_entry__ as entrymod
    queries = entrymod.queries()
    return {name: audit_one(spark, queries[name], SF_DIR)
            for name in PINNED}


@pytest.mark.parametrize("name", sorted(PINNED))
def test_pinned_plan_invariants(audits, name):
    props, plan = audits[name]
    for prop, minimum in PINNED[name].items():
        assert props[prop] >= minimum, (
            f"{name}: expected {prop} >= {minimum}, got {props[prop]}\n"
            f"plan:\n{plan[:4000]}")


def test_ewma_rides_bounded_window_not_self_join(spark):
    """The truncated EWMA must be a BOUNDED window-frame fold on the
    symbol partitioning (the round-14 form): one exchange, no self-join
    — and specifically never a rank-range join keyed only on the symbol
    (O(n²) probes per key, the round-4 finding). Pinned invariants:
    a collect_list window frame is present, every window partitions by
    the symbol, and the plan contains no join at all."""
    import __spark_entry__ as entrymod
    props, plan = audit_one(
        spark, entrymod.queries()["stock_ewma_trend"], SF_DIR)
    final = plan.split("== Initial Plan ==")[0]
    assert "collect_list" in final, (
        "EWMA window-member frame missing\n" + final[:4000])
    assert "Join" not in final, (
        "EWMA must not plan any join\n" + final[:4000])
    for ln in final.splitlines():
        if "windowspecdefinition(" in ln:
            assert "event_type" in ln, (
                "EWMA window not partitioned by symbol:\n"
                + ln.strip()[:300])


@pytest.mark.parametrize(
    "name", ["events_rfm_segments", "corpus_classifier_calibration"])
def test_quantile_binning_never_sorts_on_one_partition(spark, name):
    """RFM segmentation and classifier calibration must assign quantile
    bins via distributed_ntile: every window sort partitioned by the
    range-partition id, no global ntile (an empty-partitionBy window
    sorts the whole table through ONE task — the round-4 finding)."""
    import __spark_entry__ as entrymod
    props, plan = audit_one(
        spark, entrymod.queries()[name], SF_DIR)
    final = plan.split("== Initial Plan ==")[0]
    assert "ntile(" not in final, (
        f"{name} still plans a global ntile\n{final[:4000]}")
    for ln in final.splitlines():
        if "windowspecdefinition(" in ln:
            assert "_dnt_pid" in ln, (
                f"{name} has a window not partitioned by the range id:\n"
                f"{ln.strip()[:300]}")


def test_exact_quantiles_never_sorts_on_one_partition(spark):
    """The exact-quantile pick must ride the distributed prefix sum:
    every window partitioned by the range-partition id, no
    empty-partitionBy cumulative window pulling all distinct values
    through one task."""
    import __spark_entry__ as entrymod
    props, plan = audit_one(
        spark, entrymod.queries()["events_exact_quantiles"], SF_DIR)
    final = plan.split("== Initial Plan ==")[0]
    for ln in final.splitlines():
        if "windowspecdefinition(" in ln:
            assert "_drt_pid" in ln, (
                "exact quantiles has a window not partitioned by the "
                f"range id:\n{ln.strip()[:300]}")


@pytest.mark.parametrize("name", sorted(PINNED))
def test_no_unkeyed_join_strategies(audits, name):
    props, plan = audits[name]
    assert props["cartesian"] == 0, f"{name} plans a CartesianProduct"
    assert props["bnlj"] == 0, (
        f"{name} plans a BroadcastNestedLoopJoin (unkeyed join)\n"
        f"plan:\n{plan[:4000]}")


@pytest.mark.parametrize("name", ["stock_cci", "stock_keltner"])
def test_banded_members_ride_bounded_window(spark, name):
    """CCI's mean-deviation members and Keltner's EWMA center must come
    from a bounded window frame on the symbol partitioning (round-14
    form): a collect_list frame in the plan, no join anywhere, and
    every window partitioned by the symbol — never a rank-range
    self-join keyed only on the symbol (O(n²) probes per key)."""
    import __spark_entry__ as entrymod
    props, plan = audit_one(spark, entrymod.queries()[name], SF_DIR)
    final = plan.split("== Initial Plan ==")[0]
    assert "collect_list" in final, (
        f"{name}: window-member frame missing\n" + final[:4000])
    assert "Join" not in final, (
        f"{name}: must not plan any join\n" + final[:4000])
    for ln in final.splitlines():
        if "windowspecdefinition(" in ln:
            assert "event_type" in ln, (
                f"{name}: window not partitioned by symbol:\n"
                + ln.strip()[:300])


def test_open_backlog_rides_distributed_prefix_sum(spark):
    """The backlog curve must cumulate via distributed_running_total:
    every window partitioned by the range-partition id — never an
    empty-partitionBy running sum through one task."""
    import __spark_entry__ as entrymod
    props, plan = audit_one(
        spark, entrymod.queries()["orders_open_backlog"], SF_DIR)
    final = plan.split("== Initial Plan ==")[0]
    for ln in final.splitlines():
        if "windowspecdefinition(" in ln:
            assert "_drt_pid" in ln, (
                "backlog window not partitioned by the range id:\n"
                f"{ln.strip()[:300]}")


def test_robust_outliers_rides_grouped_prefix_sum(spark):
    """Both median/MAD passes must use the grouped prefix sum — every
    cumulative window partitioned by the (_grt_pid, group) keys."""
    import __spark_entry__ as entrymod
    props, plan = audit_one(
        spark, entrymod.queries()["events_robust_outliers"], SF_DIR)
    final = plan.split("== Initial Plan ==")[0]
    for ln in final.splitlines():
        if "windowspecdefinition(" in ln:
            assert "_grt_pid" in ln, (
                "robust-outlier window not partitioned by the range id:"
                f"\n{ln.strip()[:300]}")


def test_committed_plan_audit_is_fresh_and_clean():
    """The newest tools/PLAN_AUDIT_r*.txt must cover the ENTIRE current
    catalog with zero errors — otherwise its "0 cartesian / 0 errors
    across the catalog" claim silently under-counts whenever queries
    are registered after the audit was generated (the round-7 staleness:
    272 audited vs 281 registered). Adding a query now REQUIRES
    regenerating the audit (python tools/plan_audit.py > tools/
    PLAN_AUDIT_r<N>.txt) before the suite goes green."""
    import glob
    import os
    import re

    from stock_data_etl_pipeline_spark.plans import CATALOG

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    audits = []
    for p in glob.glob(os.path.join(root, "PLAN_AUDIT_r*.txt")):
        m = re.search(r"PLAN_AUDIT_r(\d+)\.txt$", p)
        if m:
            audits.append((int(m.group(1)), p))
    assert audits, "no committed PLAN_AUDIT_r*.txt under tools/"
    _, latest = max(audits)
    text = open(latest).read()
    m = re.search(r"^(\d+) queries, (\d+) errors", text, re.M)
    assert m, f"summary line missing in {latest}"
    audited, errors = int(m.group(1)), int(m.group(2))
    assert errors == 0, f"{latest} recorded {errors} audit errors"
    assert audited == len(CATALOG), (
        f"{latest} audited {audited} queries but the catalog has "
        f"{len(CATALOG)} — regenerate the plan audit")
    # the audit's headline safety claim, re-asserted from the artifact:
    # no cartesian products anywhere in the catalog
    for line in text.splitlines():
        cm = re.search(r"cartesian=(\d+)", line)
        if cm:
            assert cm.group(1) == "0", f"cartesian product: {line}"


# Queries ALLOWED a nonzero globalwin count (unpartitioned physical
# Window nodes) because the window's input relation is bounded by a
# CONSTANT, never by data size — verified by reading each site
# (round-12 verdict swept all 11 Window.orderBy-without-partitionBy
# sources; round 13 bounded the one data-scaled offender,
# vocab_coverage_curve, to max(cutoffs) rows via TakeOrdered). Any
# query outside this list with globalwin > 0 is a scale defect: Spark
# moves the window's entire input to ONE task.
GLOBALWIN_ALLOWED = {
    # post-TakeOrdered top-k relations (≤ a constant row count)
    "corpus_coverage_curve",   # ≤ max(cutoffs)=10k rows after limit
    "corpus_zipf_fit",         # ≤ top_n=500 rows after limit
    "corpus_bm25_search",      # ≤ k rows after limit (corpus.py:774)
    "hybrid_rrf_retrieval",    # ≤ k rows after limit (same site)
    "ann_recall_vs_nprobe",    # centroid prank over ≤ max(nprobes)=8
    #                            rows after TakeOrdered (similarity.py
    #                            ivf_recall_sweep)
    # fixed-bin histograms / tiny fixed matrices
    "graph_rich_club",         # ≤64 log2 degree bins (analytics.py:874)
    "graph_degree_distribution",   # ≤64 log2 degree bins
    "events_benford_digits",   # 9 leading digits
    "orders_pareto_deciles",   # 10-row decile matrix
    "orders_reorder_census",   # gap-day buckets (span-bounded)
    # calendar-bounded grids (|hours| / |weeks| / 7x24 rows — grow
    # with observation span, never with data volume)
    "events_survival_curve",
    "events_dow_hour_profile",
    "events_dow_hour_decomposition",
    "events_seasonal_anomalies",
    "stock_rolling_corr",
    "stock_pairs_zscore",
    "stock_temporal_split",
    "stock_advance_decline",
    # |sources|-row relations (groups of a low-cardinality dimension)
    "corpus_source_balance",
    "corpus_token_budget",
    # sub-linear relations: |distinct degree/weight values| ≤ 2*sqrt(2E)
    # (k distinct values need k(k+1)/2 <= sum(deg)=2E) — ~2e6 tiny rows
    # through one task even at E=1e12
    "graph_degree_gini",
    "graph_copurchase_weights",
}


def test_no_unbounded_global_windows_in_committed_audit():
    """Every globalwin= count in the newest committed PLAN_AUDIT must be
    zero unless the query is explicitly allowlisted as constant-bounded
    (the round-12 vocab_coverage_curve class: an unpartitioned window
    whose input scales with data runs on ONE task at 100 TB). A new
    query that plans a data-scaled global window goes red here until it
    is bounded or consciously allowlisted."""
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools")
    audits = []
    for p in glob.glob(os.path.join(root, "PLAN_AUDIT_r*.txt")):
        m = re.search(r"PLAN_AUDIT_r(\d+)\.txt$", p)
        if m:
            audits.append((int(m.group(1)), p))
    _, latest = max(audits)
    text = open(latest).read()
    assert "globalwin=" in text, (
        f"{latest} predates the globalwin column — regenerate the audit")
    offenders = []
    for line in text.splitlines():
        gm = re.search(r"^(\S+)\s.*\bglobalwin=(\d+)", line)
        if gm and int(gm.group(2)) > 0 and gm.group(1) not in GLOBALWIN_ALLOWED:
            offenders.append(line.split()[0])
    assert not offenders, (
        "unallowlisted unpartitioned-window queries (bound the window's "
        f"input or allowlist with a reading): {offenders}")
    stale = GLOBALWIN_ALLOWED - {
        line.split()[0] for line in text.splitlines()
        if re.search(r"\bglobalwin=[1-9]", line)}
    assert not stale, (
        f"allowlist entries with globalwin=0 in the audit — prune: {stale}")


def test_triangle_queries_never_materialize_wedges(spark):
    """The r8 triangle formulation: degree-oriented edges + per-edge
    adjacency intersection. The executed plans must carry the
    array_intersect kernel and NO wedge self-join closure (the
    left-semi probe of the pre-r8 plan) — reverting to the 49M-row
    wedge shuffle is the regression this pins."""
    import __spark_entry__ as entrymod
    for name in ("graph_triangle_census", "graph_clustering_coeff"):
        props, plan = audit_one(spark, entrymod.queries()[name], SF_DIR)
        # the top-level AQE Final Plan is just the 3-aggregate cross of
        # scalars — the intersect kernel executes inside materialized
        # query stages / cached subtrees, which print under the Initial
        # Plan section, so the assertions read the WHOLE plan string
        assert "array_intersect" in plan, (
            f"{name}: adjacency-intersect kernel missing")
        assert "LeftSemi" not in plan, (
            f"{name}: wedge-closure semi join reappeared")
        assert props["cartesian"] == 0


def test_heaps_curve_rides_distributed_kernels(spark):
    """Both cumulative curves and the decile pick must come from the
    distributed prefix-sum/ntile kernels — every window partitioned
    by a range-partition id, never an empty partitionBy."""
    import __spark_entry__ as entrymod
    props, plan = audit_one(
        spark, entrymod.queries()["corpus_heaps_curve"], SF_DIR)
    final = plan.split("== Initial Plan ==")[0]
    for ln in final.splitlines():
        if "windowspecdefinition(" in ln:
            assert "_pid" in ln or "_drt_pid" in ln or "_dnt_pid" in ln, (
                "heaps window not partitioned by a range id:\n"
                f"{ln.strip()[:300]}")


def test_round8_graph_and_dedup_plans_stay_keyed(spark):
    """Assortativity, Jaccard link-pred and containment must stay
    equi-keyed end to end: zero cartesian products, and the only
    nested-loop joins are 1-row broadcast scalar joins."""
    import __spark_entry__ as entrymod
    for name in ("graph_assortativity", "graph_jaccard_linkpred",
                 "dedup_containment", "orders_basket_lift"):
        props, _ = audit_one(spark, entrymod.queries()[name], SF_DIR)
        assert props["cartesian"] == 0, f"{name}: cartesian product"


def test_late_round8_joins_stay_keyed(spark):
    """The late-round-8 pair-join queries must stay equi-keyed end to
    end: the edit-distance blocks, the vocab-overlap token join, the
    centroid-sim dim join, the rich-club degree joins and the
    co-purchase weight join may never degenerate into a cartesian
    (nested-loop hits are only the 1-row scalar broadcasts)."""
    import __spark_entry__ as entrymod
    for name in ("dedup_edit_distance", "corpus_source_vocab_overlap",
                 "embedding_centroid_sim", "graph_rich_club",
                 "graph_copurchase_weights", "corpus_bigram_pmi"):
        props, _ = audit_one(spark, entrymod.queries()[name], SF_DIR)
        assert props["cartesian"] == 0, f"{name}: cartesian product"


def test_concurrency_and_pareto_ride_distributed_kernels(spark):
    """The sweep-line concurrency census must cumulate via
    distributed_running_total and the Pareto deciles must cut via
    distributed_ntile — every cumulative/rank window partitioned by
    the respective range-partition id (the only other windows are
    over the bucket/decile MATRIX, which carry their own keys)."""
    import __spark_entry__ as entrymod
    props, plan = audit_one(
        spark, entrymod.queries()["events_session_concurrency"], SF_DIR)
    final = plan.split("== Initial Plan ==")[0]
    assert "_drt_pid" in final, "concurrency census lost the prefix-sum kernel"
    props, plan = audit_one(
        spark, entrymod.queries()["orders_pareto_deciles"], SF_DIR)
    final = plan.split("== Initial Plan ==")[0]
    assert "_dnt_pid" in final, "pareto deciles lost the ntile kernel"


def test_edit_distance_sizes_relation_is_pinned(spark):
    """The edit-distance block-size relation has TWO consumers (the
    per-language census aggregate and the cap-filter join); pinned
    through operators/pinned it must compute its docs-scan + hash-agg
    ONCE, with both consumers reading the cache — at least two
    InMemoryTableScans in the executed plan. Reverting the pin makes
    the documents scan + sizes agg run twice per query (the r9 bench
    regression on dedup_edit_distance)."""
    import __spark_entry__ as entrymod
    props, plan = audit_one(
        spark, entrymod.queries()["dedup_edit_distance"], SF_DIR)
    assert props["inmem"] >= 2, (
        f"sizes relation not read from cache by both consumers "
        f"(inmem={props['inmem']})\n{plan[:3000]}")
    assert props["cartesian"] == 0


def test_edit_distance_levenshtein_is_spread(spark):
    """The Levenshtein compute must sit above the explicit pair-key
    repartition (REPARTITION_BY_NUM on the id pair), not directly on
    the block-key join output: AQE's byte-based coalescing sees only
    a few MB of pair rows and collapsed them into ONE partition at
    sf0.1, serializing the whole O(len²) distance pass (r14 measured:
    2.9 s -> 0.7 s noop with the spread). An explicit partition count
    is the documented way to keep a compute-bound exchange out of
    AQE's byte-based coalescing."""
    import __spark_entry__ as entrymod
    _, plan = audit_one(
        spark, entrymod.queries()["dedup_edit_distance"], SF_DIR)
    assert "REPARTITION_BY_NUM" in plan and "hashpartitioning(ia" in plan, (
        "pair-key spread repartition missing before the Levenshtein "
        "compute\n" + plan[:3000])


def test_round10_matrix_windows_stay_group_partitioned(spark):
    """The KS ECDF and Gini prefix windows run over domain-bounded
    MATRICES partitioned by the group key — an empty partitionBy
    here would serialize the whole matrix into one task and, worse,
    silently change which rows cumulate together."""
    import __spark_entry__ as entrymod
    for name in ("events_ks_weekend", "events_user_gini"):
        props, plan = audit_one(spark, entrymod.queries()[name], SF_DIR)
        final = plan.split("== Initial Plan ==")[0]
        for ln in final.splitlines():
            if "windowspecdefinition(" in ln:
                assert "windowspecdefinition(g#" in ln, (
                    f"{name}: window lost its group partitioning:\n"
                    f"{ln.strip()[:300]}")
        assert props["cartesian"] == 0
