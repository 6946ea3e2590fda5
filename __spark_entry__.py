"""Driver contract for the spark-graft builder (PySpark target).

Thin delegation layer: the real catalog lives in
``stock_data_etl_pipeline_spark.plans.catalog`` — every entry is one
operator family from SURVEY.md §2 implemented through the engine's public
operator modules, paired with a DuckDB oracle SQL string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stock_data_etl_pipeline_spark.plans import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return _catalog.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
