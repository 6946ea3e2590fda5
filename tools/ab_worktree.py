"""Interleaved A/B of catalog queries: working tree vs a git worktree
of the baseline (default /root/wt_head = HEAD).

One Spark session; variants alternate per attempt by swapping which
checkout's package is on sys.path and re-importing, so co-tenant drift
hits both sides equally (the only valid instrument on this round's
noisy box — two back-to-back full benches disagreed up to 8x per
query). Times fn(spark, sf_dir) + collect() exactly like bench.py.

Usage:
  SPARK_GRAFT_SF_DIR=... python tools/ab_worktree.py [-n ROUNDS] q1 q2 ...
"""
from __future__ import annotations

import importlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.environ.get("SPARK_GRAFT_AB_BASE", "/root/wt_head")


def load_entry(root: str):
    """(Re)import __spark_entry__ and the whole package from ``root``,
    dropping every previously-imported module of ours first."""
    for name in list(sys.modules):
        if name.startswith("stock_data_etl_pipeline_spark") \
                or name == "__spark_entry__":
            del sys.modules[name]
    sys.path[:] = [p for p in sys.path if p not in (REPO, BASE)]
    sys.path.insert(0, root)
    return importlib.import_module("__spark_entry__")


def release(root: str) -> None:
    mod = sys.modules.get("stock_data_etl_pipeline_spark.operators.pinned")
    if mod is not None:
        mod.release_pinned()


def main() -> None:
    args = sys.argv[1:]
    rounds = 6
    if args and args[0] == "-n":
        rounds = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, REPO)
    from stock_data_etl_pipeline_spark.session import get_spark
    spark = get_spark(app_name="ab_worktree")
    spark.range(1).count()

    variants = {"base": BASE, "new": REPO}
    # correctness first: both variants must return identical rows
    for q in names:
        rows = {}
        for v, root in variants.items():
            release(root)
            entry = load_entry(root)
            rows[v] = sorted(map(tuple, entry.queries()[q](
                spark, sf_dir).collect()))
        assert rows["base"] == rows["new"], f"{q}: results differ"
        print(f"{q}: equivalence OK ({len(rows['new'])} rows)")
    # each cycle mirrors one bench measurement per variant: release
    # pins, then 3 attempts with pins/cuts held (attempt 1 = cold with
    # every cut write, attempts 2-3 = warm via the sameResult memos,
    # median = the bench's warm-leaning statistic)
    cold: dict[tuple[str, str], list[float]] = {
        (q, v): [] for q in names for v in variants}
    warm: dict[tuple[str, str], list[float]] = {
        (q, v): [] for q in names for v in variants}
    for i in range(rounds):
        for v, root in variants.items():
            # release the PREVIOUS variant's pins before its module
            # instance (and registry) is dropped by the re-import
            release(root)
            entry = load_entry(root)
            qs = entry.queries()
            for q in names:
                release(root)
                fn = getattr(qs[q], "__wrapped__", qs[q])
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).collect()
                    ts.append(round(time.perf_counter() - t0, 3))
                cold[(q, v)].append(ts[0])
                warm[(q, v)].append(sorted(ts)[1])
    for q in names:
        for v in variants:
            c, w = sorted(cold[(q, v)]), sorted(warm[(q, v)])
            print(f"{q:32s} {v:5s} "
                  f"cold min {c[0]:7.3f} med {c[len(c) // 2]:7.3f} | "
                  f"warm min {w[0]:7.3f} med {w[len(w) // 2]:7.3f}  "
                  f"warm {warm[(q, v)]}")


if __name__ == "__main__":
    main()
