"""Physical-plan regression guards: the scale properties the engine
promises (broadcasts, pushdown, no driver-side collects) asserted on the
executed plans, so a plan regression fails CI rather than surfacing as a
100x slowdown at scale."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def catalog():
    # import from plans.catalog, NOT `from plans import queries`: the
    # package also has a queries.py submodule (the control-plane query
    # service) which shadows the re-exported function once imported
    import stock_data_etl_pipeline_spark.plans  # registers all entries
    from stock_data_etl_pipeline_spark.plans.catalog import queries
    return queries()


def test_q17_thresholds_broadcast_no_sortmerge(spark, catalog):
    # the decorrelated per-part average must broadcast against the fact;
    # a sort-merge join here means the full-fact shuffle came back
    df = catalog["q17_small_quantity_revenue"](spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tpch_dims_broadcast(spark, catalog):
    for name in ("q3_shipping_priority", "q5_local_supplier_volume",
                 "q18_large_volume_customer"):
        df = catalog[name](spark, SF)
        df.collect()
        assert "BroadcastHashJoin" in plan_of(df), name


def test_filters_reach_parquet_scan(spark, catalog):
    # pushdown guard: the scan itself must carry the predicate
    df = catalog["filter_range_set_numeric"](spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "PushedFilters: [" in plan
    # at least one non-empty pushed-filter list
    assert any(seg.strip() and not seg.startswith("]")
               for seg in plan.split("PushedFilters: [")[1:])


def test_scan_projection_pruned(spark, catalog):
    # keyset page reads 3 columns; the scan must not read the whole table
    df = catalog["keyset_page2"](spark, SF)
    df.collect()
    plan = plan_of(df)
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "o_orderkey" in read and "o_comment" not in read


def test_brute_force_topk_no_window_warning_shape(spark, catalog):
    # the rank window must be partitioned (single-partition by constant,
    # post-limit) — an unpartitioned Window over the full relation is the
    # regression this guards
    df = catalog["ann_topk_cosine"](spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "GlobalLimit" in plan or "TakeOrderedAndProject" in plan


def test_cluster_near_dups_never_collects_edges(spark):
    # API-level guard: label propagation must accept a pair DataFrame and
    # return without materializing edges driver-side; we proxy this by
    # checking the function source has no .collect( on the pair set
    import inspect

    from stock_data_etl_pipeline_spark.operators.clustering import (
        cluster_near_dups,
    )
    src = inspect.getsource(cluster_near_dups)
    assert ".collect(" not in src


def test_tpch_sub_decorrelated_shapes(spark, catalog):
    # the subquery-heavy shapes must decorrelate to broadcast joins:
    # a SortMergeJoin in q2/q20/q22 means a scalar/semi side stopped
    # broadcasting and the full-fact shuffle came back
    for name in ("q2_min_cost_supplier", "q20_part_promotion",
                 "q22_idle_customers"):
        df = catalog[name](spark, SF)
        df.collect()
        plan = plan_of(df)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_q21_single_stats_aggregate(spark, catalog):
    # the EXISTS / NOT EXISTS pair must fold into ONE per-order
    # aggregate, not two extra joins against the fact: exactly one
    # distinct-count HashAggregate chain and no more than one
    # orderkey-keyed shuffle-join of fact vs fact
    df = catalog["q21_waiting_supplier"](spark, SF)
    df.collect()
    plan = plan_of(df)
    assert plan.count("SortMergeJoin") <= 1
