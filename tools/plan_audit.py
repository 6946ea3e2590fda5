"""Physical-plan audit over the whole catalog.

For every query: executes it at the given SF and reports plan properties —
scan pushdown (PushedFilters non-empty where a scan-level filter exists),
pruned ReadSchema, join strategies, shuffle-exchange count, codegen spans.
Regression radar: a query suddenly losing pushdown or gaining exchanges
shows up as a diff in this report.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _count_global_windows(plan: str) -> int:
    """Count physical ``Window`` nodes with an EMPTY partition spec —
    the "Moving all data to a single partition" shape. A WindowExec
    line prints top-level bracket groups as:

    - ``Window [exprs], [partSpec], [orderSpec]`` — partitioned (3)
    - ``Window [exprs], [partSpec]``   — partitioned, no order (2,
      last group has NO ASC/DESC sort markers)
    - ``Window [exprs], [orderSpec]``  — GLOBAL ordered window (2,
      last group carries ASC/DESC)
    - ``Window [exprs]``               — GLOBAL unordered window (1)

    Python/Arrow window nodes (``ArrowWindowPython`` on this Spark
    build, ``WindowInPandas`` on older ones) print the same bracket
    layout plus a trailing batch-size argument and plan the same
    single-partition exchange, so the anchor matches them too — a
    pandas-UDF window with an empty partition spec is exactly as much
    of a scale defect as a JVM one (round-13 review finding). Nested
    brackets inside expressions are handled by depth counting;
    ``WindowGroupLimit`` lines don't match any anchor. A nonzero
    count is only ACCEPTABLE when the
    window's input relation is bounded by a constant (post-limit
    top-k, fixed histogram bins, calendar-bounded domains) — the
    regression gate allowlists exactly those queries; anything else is
    the round-12 ``vocab_coverage_curve`` defect (a data-scaled
    relation forced through one task). AQE plan strings repeat nodes
    (final + initial plan), so counts are typically even — treat the
    value as a flag, not a site count."""
    n = 0
    for line in plan.splitlines():
        m = re.search(r"\b(?:Window|ArrowWindowPython|WindowInPandas) \[",
                      line)
        if not m:
            continue
        depth = 0
        groups: list[str] = []
        buf: list[str] = []
        for ch in line[m.end() - 1:]:
            if ch == "[":
                if depth == 0:
                    buf = []
                depth += 1
                if depth > 1:
                    buf.append(ch)
            elif ch == "]" and depth:
                depth -= 1
                if depth == 0:
                    groups.append("".join(buf))
                else:
                    buf.append(ch)
            elif depth:
                buf.append(ch)
        if len(groups) == 1 or (
                len(groups) == 2
                and re.search(r"\b(ASC|DESC)\b", groups[-1])):
            n += 1
    return n


def audit_one(spark, fn, sf_dir: str) -> tuple[dict, str]:
    """Execute one catalog query and return (plan-properties, plan
    string). Importable so the pytest plan-regression gate asserts the
    same invariants this report prints (pushdown present, no cartesian
    product) without duplicating the extraction."""
    df = fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    props = {
        "scans": plan.count("Scan parquet") + plan.count("FileScan parquet"),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "exch": plan.count("Exchange ") - plan.count("ReusedExchange"),
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        # persisted subtrees: a consumer reads the cache, but the
        # plan STRING repeats the cached child under every
        # InMemoryTableScan — so a big `scans` next to a nonzero
        # `inmem` is string inflation, not read amplification
        "inmem": plan.count("InMemoryTableScan"),
        "reuse": plan.count("ReusedExchange"),
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        # plan-TREE size (round 11): execution can be bounded by pins
        # while the analyzed tree still repeats a shared subtree per
        # reference, multiplicatively through nesting — Catalyst
        # analysis on a 56k-line tree costs real driver CPU
        # (graph_closure_by_degree, round-10 audit). pin_cut replaces
        # such subtrees with a parquet re-read of a session-temp
        # "spark-pin-cut-*" directory — `cuts` counts those FileScan
        # leaves so a row's scan count reads correctly ("N of the
        # scans are cut re-reads, not source rescans"). `rddleaf`
        # counts Scan ExistingRDD leaves (pin_checkpoint / CC-style
        # localCheckpoint users).
        "nodes": plan.count("\n") + 1,
        "cuts": plan.count("spark-pin-cut-"),
        "rddleaf": plan.count("Scan ExistingRDD"),
        # unpartitioned Window nodes (single-partition sort) — must be
        # 0 unless the query is in the regression gate's bounded-input
        # allowlist (see tests/test_plan_regression.py)
        "globalwin": _count_global_windows(plan),
    }
    return props, plan


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from stock_data_etl_pipeline_spark.session import get_spark

    spark = get_spark()
    rows = []
    for name, fn in entrymod.queries().items():
        try:
            props, _ = audit_one(spark, fn, sf_dir)
        except Exception as e:  # noqa: BLE001
            rows.append((name, f"ERROR {type(e).__name__}: {e}"))
            continue
        rows.append((name, " ".join(f"{k}={v}" for k, v in props.items())))
    width = max(len(n) for n, _ in rows)
    for name, info in rows:
        print(f"{name:<{width}}  {info}")
    errs = [n for n, i in rows if i.startswith("ERROR")]
    print(f"\n{len(rows)} queries, {len(errs)} errors" + (f": {errs}" if errs else ""))
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
