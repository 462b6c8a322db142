from __future__ import annotations

import os

import duckdb
import pytest

import spark_graft
from spark_graft.session import get_spark
from spark_graft.sources.tables import TABLES

spark_graft.load_all_queries()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spark-graft-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the same tables registered as views — the
    exact setup the driver uses for CORRECTNESS_r{N}.json."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()
