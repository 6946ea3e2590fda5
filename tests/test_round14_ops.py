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
    import pathlib
    src = pathlib.Path("bench.py").read_text()
    assert "loads = [round(os.getloadavg()[0], 2)]" in src
    assert "BRACKET" in src
