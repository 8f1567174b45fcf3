"""SQL subquery surface: correlated EXISTS / NOT EXISTS and scalar
subqueries, submitted as SQL text through ``spark.sql``.

The reference exposes its query surface programmatically; a Spark user
reaches the same semantics through either the DataFrame API (the rest
of this package) or SQL strings.  These queries exercise the SQL
entry point specifically on the constructs Catalyst must *rewrite* to
execute at all — subqueries have no physical operator of their own:

- correlated ``EXISTS`` / ``NOT EXISTS`` decorrelate to left-semi /
  left-anti hash joins (``RewritePredicateSubquery``);
- a correlated scalar aggregate subquery decorrelates to an aggregate
  + left outer join;
- an uncorrelated scalar subquery executes once and is injected as a
  literal (a one-row broadcast at scale).

tests/test_plans.py asserts the decorrelated shapes: semi/anti joins
for the predicates, no nested-loop join anywhere.  Because the text is
ANSI SQL, the oracle runs the *identical string* — any divergence is an
engine bug, not a transcription gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views
from ..registry import query

_EXISTS_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
      )
"""

_SCALAR_SQL = """
SELECT o_orderkey,
       o_totalprice,
       round((SELECT max(o2.o_totalprice) FROM orders o2
              WHERE o2.o_custkey = o.o_custkey) - o_totalprice, 2)
         AS below_cust_max,
       round(o_totalprice / (SELECT max(o3.o_totalprice) FROM orders o3),
             6) AS frac_of_global_max
FROM orders o
WHERE o_orderkey % 50 = 0
"""


@query("sql_correlated_exists", oracle=_EXISTS_SQL, tags=("sql", "subquery", "join"))
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS over the orders table: customers
    with at least one 350k+ order and no order stuck in status P.

    Catalyst rewrites the pair into one left-semi and one left-anti
    hash join on ``o_custkey`` — each a single key-partitioned shuffle
    with early-out probing (a semi join emits a customer on first
    match and never materializes the order rows).  At 100 TB this is
    exactly the plan you would hand-write; the SQL form costs nothing.
    """
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


@query("sql_scalar_subquery", oracle=_SCALAR_SQL, tags=("sql", "subquery"))
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated and uncorrelated scalar subqueries in one projection:
    each order's gap to its customer's own max order, and its fraction
    of the global max.

    The correlated ``max`` decorrelates to a per-customer aggregate
    joined back on ``o_custkey`` (the aggregate input is the orders
    table itself, so the join's build side is one row per customer —
    far smaller than the probe).  The uncorrelated ``max`` runs once
    and enters the plan as a literal subquery result: zero per-row
    cost, one tiny job before the main stage.  ``max`` (not ``avg``)
    keeps the scalar exact, so the cross-engine comparison is
    bit-stable without rounding tricks on the aggregate itself.
    """
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)
