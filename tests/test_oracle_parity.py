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


def test_no_oracle_emits_hugeint(sf_dir):
    """No oracle result column may be HUGEINT/UHUGEINT.

    DuckDB widens ``sum(BIGINT)`` (plain and windowed) to HUGEINT.  The
    local harness compares Python values (``fetchall``), where a HUGEINT
    is just an int — but the driver's pandas-hash path cannot keep
    HUGEINT in a 64-bit dtype (it lands as float64/object) and the hash
    diverges from Spark's int64 even when every value is equal.  That
    dtype leak was the ONE driver-red row of round 9
    (``ts_seasonal_decompose``: uncast windowed sums, CORRECTNESS_r09).
    64-bit-width/sign differences (UBIGINT, TINYINT) are fine — pandas
    hashes the 64-bit value — so only the 128-bit types are banned.
    Types are data-independent, so checking at any sf covers all.
    """
    duck = make_duckdb(sf_dir)
    try:
        offenders = []
        for name in WITH_ORACLE:
            rel = duck.sql(QUERIES[name].oracle)
            for col, typ in zip(rel.columns, rel.types):
                if "HUGEINT" in str(typ).upper():
                    offenders.append((name, col, str(typ)))
        assert not offenders, (
            f"oracles emitting 128-bit ints (cast to BIGINT): {offenders}"
        )
    finally:
        duck.close()
