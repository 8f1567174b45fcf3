"""Filter operators (SURVEY §2.B B5-B7): comparison/boolean predicates,
IN / LIKE / BETWEEN, and SQL three-valued null semantics.

Scale note: every predicate here is a Catalyst expression, so it folds
into the parquet scan (``PushedFilters``) — at 100 TB these queries read
only the row groups whose min/max statistics can match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import query


@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_quantity > 30 AND (l_discount < 0.02 OR l_tax > 0.07) AND NOT l_returnflag = 'A'
    """,
    tags=("filter",),
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5: comparison + AND/OR/NOT boolean predicate tree."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.where(
        (F.col("l_quantity") > 30)
        & ((F.col("l_discount") < 0.02) | (F.col("l_tax") > 0.07))
        & ~(F.col("l_returnflag") == "A")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round("l_extendedprice", 2).alias("price"),
    )


@query(
    "filter_in_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND p_name LIKE '%re%'
      AND p_size BETWEEN 10 AND 40
    """,
    tags=("filter",),
)
def filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6: IN-list, LIKE pattern, BETWEEN range — all pushdown-friendly."""
    cat = Catalog(spark, sf_dir)
    return cat.part.where(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & F.col("p_name").like("%re%")
        & F.col("p_size").between(10, 40)
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@query(
    "filter_null",
    oracle="""
    WITH e AS (
      SELECT event_id,
             CASE WHEN value > 50 THEN NULL ELSE value END AS v,
             NULLIF(event_type, 'click') AS et
      FROM events
    )
    SELECT event_id, round(v, 3) AS v, et,
           (v IS NULL) AS v_is_null
    FROM e
    WHERE v IS NULL OR (v < 10 AND et IS NOT NULL)
    """,
    tags=("filter", "null"),
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: IS NULL / IS NOT NULL and three-valued logic.

    The fixtures carry no physical NULLs, so NULLs are synthesized with
    CASE/NULLIF; the WHERE clause exercises NULL-propagating comparisons
    (``v < 10`` is UNKNOWN for NULL v and must not leak rows through the
    AND branch).
    """
    cat = Catalog(spark, sf_dir)
    e = cat.events.select(
        "event_id",
        F.when(F.col("value") > 50, F.lit(None)).otherwise(F.col("value")).alias("v"),
        F.nullif(F.col("event_type"), F.lit("click")).alias("et"),
    )
    return e.where(F.col("v").isNull() | ((F.col("v") < 10) & F.col("et").isNotNull())).select(
        "event_id",
        F.round("v", 3).alias("v"),
        "et",
        F.col("v").isNull().alias("v_is_null"),
    )
