"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and the matching
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, schema (column names, order-insensitive), and an
order-insensitive value hash. Strict canonicalization: floats rounded to
6 dp before hashing, timestamps/dates rendered ISO, None -> "NULL".

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLE_NAMES = ("region nation customer supplier part orders lineitem "
               "events documents embeddings").split()


def canon_value(v) -> str:
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def run_checks(sf_dir: str, only: set[str] | None = None,
               spark=None) -> list[str]:
    """Run every (or the selected) catalog query against its DuckDB
    oracle at ``sf_dir``; returns the list of failing query names.
    Importable so the test suite can run the whole gate locally (a
    testdata regeneration between rounds must fail HERE, not first in
    the driver's CORRECTNESS file)."""
    only = only or set()

    import __spark_entry__ as entrymod
    from stock_data_etl_pipeline_spark.session import get_spark

    spark = spark or get_spark()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle, rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            hs, hd = hash_rows(scols, srows), hash_rows(dcols, drows)
            if hs != hd:
                problems.append("value-hash mismatch")
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("|".join(canon_value(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dset = sorted("|".join(canon_value(r[i]) for i in dorder) for r in drows)
                for a, b in zip(sset, dset):
                    if a != b:
                        problems.append(f"  first diff:\n   spark: {a}\n   duck:  {b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok    {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")

    missing = [k for k in oracles if k not in queries]
    if missing:
        print(f"WARN: oracle_sql keys with no query: {missing}")
    print(f"\n{len(failures)} failures" if failures else "\nall green")
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    return 1 if run_checks(sf_dir, set(sys.argv[2:])) else 0


if __name__ == "__main__":
    raise SystemExit(main())
