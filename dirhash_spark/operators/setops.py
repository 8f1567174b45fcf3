"""Set operators (SURVEY §2.B B31-B33).

REF analog A4: the reference folds per-file RDD unions (bag semantics,
dirhash.py:404-406).  Distinct set ops add the dedup shuffle on top.
``df.subtract`` is SQL's distinct EXCEPT; ``exceptAll`` would be the bag
variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import query


@query(
    "set_union_dist",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_union_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31: union distinct (bag union + dedup shuffle)."""
    cat = Catalog(spark, sf_dir)
    c = cat.customer.select(F.col("c_nationkey").alias("nationkey"))
    s = cat.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: intersect (distinct semantics, like SQL INTERSECT)."""
    cat = Catalog(spark, sf_dir)
    c = cat.customer.where(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").alias("nationkey"))
    s = cat.supplier.where(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33: except (distinct semantics; ``subtract`` == SQL EXCEPT)."""
    cat = Catalog(spark, sf_dir)
    c = cat.customer.select(F.col("c_nationkey").alias("nationkey"))
    s = cat.supplier.where(F.col("s_acctbal") > 8000).select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "set_union_all",
    oracle="""
    SELECT nationkey, count(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REF A4 semantics: bag union (the reference folds per-file RDDs
    with plain `union`, dirhash.py:404-406 — duplicates preserved).
    Counted per key so the oracle can hash-compare multiplicities.
    No shuffle for the union itself; only the verification groupBy."""
    cat = Catalog(spark, sf_dir)
    c = cat.customer.select(F.col("c_nationkey").alias("nationkey"))
    s = cat.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return c.unionAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_intersect_all",
    # Bag intersection keeps min(multiplicity) copies of each value —
    # the modulo-bucketed balances collide across tables with different
    # repeat counts, so the ALL/DISTINCT difference is load-bearing.
    oracle="""
    SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket FROM customer
    INTERSECT ALL
    SELECT CAST(floor(s_acctbal / 1000) AS BIGINT) AS bal_bucket FROM supplier
    """,
    tags=("setop", "bag"),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: a value appearing m times on the
    left and n times on the right survives min(m, n) times (SQL:2016;
    ``df.intersectAll``).  Physically still one shuffle on the value:
    Catalyst counts multiplicities per side and replays the minimum —
    no pairwise join, so scale cost equals the distinct variant's."""
    cat = Catalog(spark, sf_dir)
    c = cat.customer.select(
        F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias("bal_bucket")
    )
    s = cat.supplier.select(
        F.expr("CAST(floor(s_acctbal / 1000) AS BIGINT)").alias("bal_bucket")
    )
    return c.intersectAll(s)


@query(
    "set_except_all",
    oracle="""
    SELECT CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket FROM customer
    EXCEPT ALL
    SELECT CAST(floor(s_acctbal / 1000) AS BIGINT) AS bal_bucket FROM supplier
    """,
    tags=("setop", "bag"),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: m left copies minus n right copies
    leaves max(m − n, 0) (``df.exceptAll``), vs. the distinct EXCEPT
    of B33 which drops a value entirely on any right-side hit.  Same
    single-shuffle multiplicity-counting plan as INTERSECT ALL."""
    cat = Catalog(spark, sf_dir)
    c = cat.customer.select(
        F.expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").alias("bal_bucket")
    )
    s = cat.supplier.select(
        F.expr("CAST(floor(s_acctbal / 1000) AS BIGINT)").alias("bal_bucket")
    )
    return c.exceptAll(s)
