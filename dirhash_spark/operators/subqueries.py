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


_RECURSIVE_SQL = """
WITH RECURSIVE walk(seed, node, depth) AS (
  SELECT doc_id AS seed, doc_id AS node, CAST(0 AS INT) AS depth
  FROM documents WHERE doc_id % 97 = 0
  UNION ALL
  SELECT seed, (node * 31 + 7) % 1000 AS node, depth + 1
  FROM walk WHERE depth < 15
)
SELECT seed, count(DISTINCT node) AS n_distinct_nodes,
       CAST(max(depth) AS INT) AS max_depth
FROM walk GROUP BY seed
"""

_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_SQL, tags=("sql", "recursive", "graph"))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): walk a deterministic
    functional graph (``node → (node·31+7) mod 1000``) 15 steps from
    every 97th document and count the distinct nodes each seed reaches
    — the iterate-to-frontier shape behind hierarchy expansion, BOM
    rollups, and reachability, expressed declaratively instead of a
    driver-side loop (cf. dedup_cluster_canonical, which hand-builds
    the same iteration with localCheckpoint because it predates this).

    Each recursion level is one self-join-free projection of the
    previous frontier — Spark executes levels as successive plans with
    a union at the end; out-degree 1 keeps every frontier exactly
    seed-count sized, so depth bounds total work linearly.  The oracle
    is the identical SQL string on DuckDB.
    """
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


@query("sql_lateral_topk", oracle=_LATERAL_SQL, tags=("sql", "lateral", "topk"))
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: each
    customer's two largest orders — SQL's per-row table expression,
    the form analysts reach for before they know window functions.

    Catalyst decorrelates the lateral limit into exactly the plan the
    window form would give (rank ≤ 2 over a partitioned window, then a
    broadcast/hash join back to customer) — asserted in
    tests/test_plans.py: no nested-loop join, a Window operator
    appears.  Deterministic (price DESC, orderkey) tie-break keeps the
    cutoff identical across engines.
    """
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
