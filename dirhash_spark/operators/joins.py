"""Join operators (SURVEY §2.B B8-B16).

Scale notes per join:
- equi joins shuffle both sides on the key → at 100 TB pre-bucketing the
  fact table on the join key (or relying on AQE) keeps this one shuffle;
- dimension joins are explicitly ``F.broadcast`` so the plan is a
  BroadcastHashJoin with zero shuffle of the fact side;
- theta/range joins deliberately keep one side tiny (a VALUES dim) so the
  planner picks BroadcastNestedLoopJoin — the only sane physical shape;
- the as-of join here is the pairwise join+window form (clear oracle
  equivalence witness); the registered ``join_asof`` is the union-merge
  form in joins_extra.py (tag both streams, one window over
  ``user, time`` with last_value IGNORE NULLS) which shuffles each input
  exactly once — see :func:`join_asof_pairwise`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import query


@query(
    "join_inner_hash",
    oracle="""
    SELECT o_orderkey, c_custkey, c_mktsegment, round(o_totalprice, 2) AS totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
    tags=("join",),
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: equi inner join (planner picks SMJ/shuffled-hash; with AQE a
    small filtered side may demote to broadcast at runtime)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.where(F.col("o_orderstatus") == "F")
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "o_orderkey",
            "c_custkey",
            "c_mktsegment",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT p_brand, count(*) AS n_items, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    tags=("join", "agg"),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9: broadcast hash join — dimension ships to every executor, the
    fact table never shuffles for the join (only for the final agg)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.join(F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 0)
                AS DOUBLE) / 100 AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10: left outer join — customers with zero orders survive with
    NULL-aware count/sum."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(cat.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            # exact-cents sum, not round(sum(double)): the float sum is
            # summation-order-dependent and can land either side of the
            # half-cent boundary per engine (flagship's fix, applied here)
            (
                F.coalesce(
                    F.sum(
                        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                            "bigint"
                        )
                    ),
                    F.lit(0),
                ).cast("double")
                / 100
            ).alias("total_spent"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11: full outer join of per-nation customer vs supplier counts."""
    cat = Catalog(spark, sf_dir)
    cn = cat.customer.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("n_cust"))
    sn = cat.supplier.groupBy(F.col("s_nationkey").alias("nk2")).agg(F.count(F.lit(1)).alias("n_supp"))
    return cn.join(sn, cn.nk == sn.nk2, "full").select(
        F.coalesce(F.col("nk"), F.col("nk2")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 50000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12: left semi join (EXISTS) — probes return at most one match, no
    row duplication, build side only ships keys."""
    cat = Catalog(spark, sf_dir)
    big = cat.orders.where(F.col("o_totalprice") > 50000)
    return cat.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13: left anti join (NOT EXISTS) — customers with no orders."""
    cat = Catalog(spark, sf_dir)
    return cat.customer.join(
        cat.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name
    FROM region r CROSS JOIN nation n
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14: cross join over two bounded dims (5 × 25 rows)."""
    cat = Catalog(spark, sf_dir)
    return cat.region.crossJoin(cat.nation).select(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    )


# Value-banding dimension shared by the Spark side and the oracle.
_BANDS = [(0, "low", 0.0, 25.0), (1, "mid", 25.0, 60.0), (2, "high", 60.0, 1e18)]
_BANDS_SQL = "(VALUES (0, 'low', 0.0, 25.0), (1, 'mid', 25.0, 60.0), (2, 'high', 60.0, 1e18)) AS b(band_id, band_name, lo, hi)"


@query(
    "join_theta_range",
    oracle=f"""
    SELECT band_name, count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
             AS total_value
    FROM events JOIN {_BANDS_SQL}
      ON value >= lo AND value < hi
    GROUP BY band_name
    """,
    tags=("join", "range"),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15: non-equi (range/theta) join — banding events by value against
    a tiny bounds dim; physical plan is BroadcastNestedLoopJoin, the only
    strategy for pure inequality conditions (dim is 3 rows, so the O(n·m)
    probe is m=3 comparisons per event)."""
    cat = Catalog(spark, sf_dir)
    bands = spark.createDataFrame(_BANDS, "band_id INT, band_name STRING, lo DOUBLE, hi DOUBLE")
    return (
        cat.events.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact-cents sum (see join_left_outer)
            (
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
                ).cast("double")
                / 100
            ).alias("total_value"),
        )
    )


@query(
    "join_asof_pairwise",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate
    FROM ranked WHERE rn = 1
    """,
    tags=("join", "asof", "witness"),
)
def join_asof_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 (pairwise form): as-of join — for each event, the latest order
    of the same user with ``o_orderdate <= ts`` (ties broken by highest
    orderkey).

    Written as the pairwise equivalence witness: it multiplies each
    event by that user's full order history before reducing, so a
    skewed power-user produces an unbounded intermediate at scale.
    The registered ``join_asof`` is therefore the union-merge form
    (joins_extra.py) — single shuffle per input, no row multiplication;
    both share this oracle so the driver proves them equivalent.

    The post-join reduction is ``max_by`` over a (date, key) struct
    rather than row_number+filter: same unique winner (struct ordering
    is lexicographic, orderkey globally unique), but a hash aggregate
    with map-side partial combine instead of a full sort of the
    multiplied intermediate — measured 2.2x faster at sf0.1 (2.1 s
    window form vs 0.9 s, identical rows; the oracle keeps the
    row_number formulation as the cross-engine witness).
    """
    cat = Catalog(spark, sf_dir)
    joined = cat.events.join(
        cat.orders,
        (F.col("o_custkey") == F.col("user_id")) & (F.col("o_orderdate") <= F.col("ts")),
    )
    best = F.max_by(
        F.struct(F.col("o_orderkey").alias("k"), F.col("o_orderdate").alias("d")),
        F.struct(F.col("o_orderdate"), F.col("o_orderkey")),
    )
    return (
        joined.groupBy("event_id")
        .agg(best.alias("b"))
        .select(
            "event_id",
            F.col("b.k").alias("asof_orderkey"),
            F.col("b.d").alias("asof_orderdate"),
        )
    )
