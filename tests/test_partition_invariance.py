"""Partition-count invariance.

A correct distributed plan returns the SAME relation no matter how many
shuffle partitions execute it. Hidden tie-break nondeterminism (a window
ordered on a non-unique key, a first()/head() that depends on partition
layout) passes at one fixed partitioning and silently breaks at another —
exactly what changes between local[32] and a 1000-executor cluster. Run
representative queries under two very different partition counts and
require identical results.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "q1_pricing_summary",
    "latest_order_per_customer",
    "top3_lineitems_per_supplier",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "keyset_page2",
    "merge_upsert_result",
    "events_sessionization",
    "dedup_canonical_keep",
    "corpus_temperature_mix",
    # stock family: OHLC tie-breaks and the EWMA rank self-join must
    # not depend on partition layout
    "stock_ohlc_bars",
    "stock_ewma_trend",
    "embedding_triplet_mining",
]


def _rows(spark, name):
    import __spark_entry__ as E
    df = E.queries()[name](spark, SF_DIR)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_is_partitioning_invariant(spark, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        low = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        high = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert low == high, f"{name} differs across shuffle partitionings"
