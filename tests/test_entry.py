"""Driver-contract stability: the host harness calls entry() for its
smoke check and may call it repeatedly; queries()/oracle_sql() must
stay consistent with each other.
"""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_idempotent_and_stable_schema(spark):
    df1 = E.entry(spark)
    df2 = E.entry(spark)
    assert df1.schema == df2.schema
    rows1 = sorted(map(tuple, df1.collect()))
    rows2 = sorted(map(tuple, df2.collect()))
    assert rows1 == rows2 and len(rows1) > 0


def test_every_oracle_has_a_query():
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 90
    # oracles are non-empty SQL strings
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
