"""Dump `.explain("formatted")` for named catalog queries to files —
the per-round plan evidence the judge checks claims against.

Usage: python tools/dump_plan.py <outdir> <query> [query ...]
Writes <outdir>/<query>.txt with the formatted plan of the EXECUTED
query (collected first, so AQE shows the final adaptive plan where the
formatted dump includes it) over $SPARK_GRAFT_SF_DIR.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from stock_data_etl_pipeline_spark.session import get_spark
    from stock_data_etl_pipeline_spark.operators.pinned import release_pinned

    spark = get_spark(app_name="dump_plan")
    queries = entrymod.queries()
    for name in names:
        release_pinned()
        df = queries[name](spark, sf_dir)
        df.collect()  # execute so AQE finalizes
        plan = df._jdf.queryExecution().explainString(  # noqa: SLF001
            spark._jvm.org.apache.spark.sql.execution  # noqa: SLF001
            .ExplainMode.fromString("formatted"))
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")


if __name__ == "__main__":
    main()
