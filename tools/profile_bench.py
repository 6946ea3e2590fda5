"""Per-query profiling for the optimization rounds (guide §1).

For each headline query (or an explicit subset) at $SPARK_GRAFT_SF_DIR:

- build time (DataFrame construction — catches eager pin_cut writes,
  control-plane collects inside builders),
- noop-sink execution time (guide §1.4: computes every column, no
  result transfer to the driver) AND collect time (the bench's metric),
- number of Spark jobs and completed stages/tasks the execution ran
  (via a job group + the status tracker) — the stage count is the
  structural cost that survives to 100 TB,
- Exchange / BatchEvalPython / ArrowEvalPython node counts from the
  formatted physical plan.

Writes a JSON report to tools/PROFILE_<tag>.json and (optionally)
the formatted plans to plans/r14/<query>_<tag>.txt.

Usage:
  python tools/profile_bench.py [--tag before] [--plans] [q1 q2 ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i:i + 2]
    dump_plans = "--plans" in args
    if dump_plans:
        args.remove("--plans")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench
    import __spark_entry__ as entrymod
    from stock_data_etl_pipeline_spark.session import get_spark
    from stock_data_etl_pipeline_spark.operators.pinned import release_pinned

    names = args or list(bench.HEADLINE)
    spark = get_spark(app_name="profile")
    queries = entrymod.queries()
    sc = spark.sparkContext
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(repo, "plans", "r14")
    os.makedirs(plan_dir, exist_ok=True)

    # warm JVM/codegen at the smallest SF so profile numbers are
    # steady-state, mirroring bench.py
    spark.range(1).count()
    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            queries[n](spark, warm).collect()
        except Exception as e:  # noqa: BLE001
            print(f"WARN warmup {n}: {e}", file=sys.stderr)

    report = {}
    for n in names:
        release_pinned()
        fn = getattr(queries[n], "__wrapped__", queries[n])
        sc.setJobGroup(f"prof-{n}", n)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        if dump_plans:
            with open(os.path.join(plan_dir, f"{n}_{tag}.txt"), "w") as f:
                f.write(plan)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_noop = time.perf_counter() - t0
        t0 = time.perf_counter()
        nrows = len(df.collect())
        t_collect = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(f"prof-{n}")
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        report[n] = {
            "build_s": round(t_build, 3),
            "noop_s": round(t_noop, 3),
            "collect_s": round(t_collect, 3),
            "rows": nrows,
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "aqe_reads": len(re.findall(r"AQEShuffleRead", plan)),
            "sorts": len(re.findall(r"^\s*[*+:_\- ]*Sort ", plan,
                                    re.MULTILINE)),
            "py_eval": len(re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInArrow|"
                r"FlatMapGroupsInPandas|WindowInPandas", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "scans": len(re.findall(r"Scan parquet", plan)),
        }
        print(json.dumps({n: report[n]}), flush=True)

    out = os.path.join(repo, "tools", f"PROFILE_{tag}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    total = {
        "build_s": round(sum(r["build_s"] for r in report.values()), 2),
        "noop_s": round(sum(r["noop_s"] for r in report.values()), 2),
        "collect_s": round(sum(r["collect_s"] for r in report.values()), 2),
        "jobs": sum(r["jobs"] for r in report.values()),
        "stages": sum(r["stages"] for r in report.values()),
    }
    print("TOTAL", json.dumps(total))


if __name__ == "__main__":
    main()
