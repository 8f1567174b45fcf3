"""Every registered query with an oracle must match DuckDB exactly at the
test scale factor — the local twin of the driver's correctness gate."""

from __future__ import annotations

import pytest

from dirhash_spark.registry import all_queries

from .oracle_harness import compare, make_duckdb

QUERIES = all_queries()
WITH_ORACLE = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = make_duckdb(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(name, spark, sf_dir, duck):
    q = QUERIES[name]
    report = compare(q.fn(spark, sf_dir), duck, q.oracle)
    assert report["match"], f"{name}: {report}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
