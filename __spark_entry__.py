"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash).  The implementation lives in the ``dirhash_spark`` package;
this module only adapts its query registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation
    (lineitem ⋈ orders ⋈ customer ⋈ broadcast(nation) ⋈ broadcast(region)
    → hash agg → sort)."""
    from dirhash_spark.operators.scans import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dirhash_spark.registry import all_queries

    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for ops without
    an exact SQL equivalent — approximate sketches, UDF-opaque or
    stateful operators get the driver's rows-only check)."""
    from dirhash_spark.registry import all_queries

    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
