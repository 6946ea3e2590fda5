"""Audit every oracle's DuckDB output column types against the Spark
query's schema.

The driver's canonicalizer hash-mismatches when DuckDB yields a type
Spark doesn't (round-3's only red: ``sum(CASE..THEN 1..)`` over INTEGER
literals -> HUGEINT vs Spark bigint). The local gate's ``str()``
canonicalization hides this class, so this audit inspects the declared
types directly: run each oracle with LIMIT 0 semantics (DuckDB still
types the projection), report any HUGEINT / UTINYINT / unexpected
column, and diff against the Spark DataFrame schema categories.

Usage: python tools/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLE_NAMES = ("region nation customer supplier part orders lineitem "
               "events documents embeddings").split()

# DuckDB type -> comparison category the driver can canonicalize safely.
SAFE = {
    "BIGINT": "int", "INTEGER": "int", "SMALLINT": "int", "TINYINT": "int",
    "UBIGINT": "int",
    "DOUBLE": "float", "FLOAT": "float",
    "VARCHAR": "str", "BOOLEAN": "bool",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts", "DATE": "date",
}


def audit(sf_dir: str) -> list[str]:
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracles = entrymod.oracle_sql()
    flagged = []
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            cols = rel.columns
            types = [str(t) for t in rel.types]
        except Exception as e:  # noqa: BLE001
            flagged.append(f"{name}: oracle error: {e}")
            continue
        for c, ty in zip(cols, types):
            base = ty.split("(")[0]
            if base == "HUGEINT":
                flagged.append(f"{name}.{c}: HUGEINT (cast to BIGINT)")
            elif base == "DECIMAL":
                flagged.append(f"{name}.{c}: {ty} (decimal — verify Spark "
                               f"side matches or cast to DOUBLE)")
            elif base not in SAFE and not base.endswith("[]"):
                flagged.append(f"{name}.{c}: {ty} (unusual type)")
    return flagged


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = audit(sf)
    for line in out:
        print(line)
    print(f"-- {len(out)} flagged")
