"""Driver-contract regression: every queries() entry runs and matches its
DuckDB oracle at sf0.001 (the full sf0.01 gate is scripts/check_oracle.py /
the round driver)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from scripts.check_oracle import TABLES, normalize

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "keep" in df.columns


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, con, name):
    fn = entry_mod.queries()[name]
    sdf = normalize(fn(spark, SF_DIR).toPandas())
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(sdf) >= 0  # rows-only contract
        return
    odf = normalize(con.execute(sql).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf)
    pd.testing.assert_frame_equal(
        sdf, odf, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
