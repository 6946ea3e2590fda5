from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from stock_data_etl_pipeline_spark.session import get_spark
    # small core count: test DataFrames are tiny, scheduling dominates
    s = get_spark(cores=4)
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "tbl")
