"""Window functions, sorts and top-k (SURVEY §2.B B24-B30).

Scale notes: a window ``PARTITION BY k ORDER BY s`` is one shuffle on
``k`` plus a per-partition sort — the same cost shape as a groupBy, so
per-group top-k (B30) via row_number is the scalable idiom (no global
sort).  Global top-k (B29) compiles to TakeOrderedAndProject: each task
keeps k rows, only k·tasks rows reach the driver-side merge — safe at any
scale.  Every ORDER BY carries a unique tie-break key so results are
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from ..registry import query


@query(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24: ranking windows (row_number/rank/dense_rank/ntile)."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return cat.customer.select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(lag(value)  OVER w, 3) AS prev_value,
           round(lead(value) OVER w, 3) AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window",),
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: analytic lag/lead over each user's event timeline."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return cat.events.select(
        "event_id",
        "user_id",
        F.round(F.lag("value").over(w), 3).alias("prev_value"),
        F.round(F.lead("value").over(w), 3).alias("next_value"),
    )


@query(
    "win_running",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_total
    FROM events
    """,
    tags=("window", "frame"),
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26: running sum (ROWS UNBOUNDED PRECEDING..CURRENT).

    ROWS (not the RANGE default) + unique tie-break makes prefix sums
    identical across engines even when timestamps collide.
    """
    cat = Catalog(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cat.events.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_total"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
           ), 4) AS moving_avg
    FROM events
    """,
    tags=("window", "frame"),
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: moving average over a 4-row trailing frame."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return cat.events.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg"),
    )


@query(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio,
           round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY prio ASC NULLS LAST, totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("sort",),
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28: multi-key sort with explicit null ordering (REF analog A6:
    sortBy (path, block), dirhash.py:413).  LIMIT makes the sort
    observable under the order-insensitive set comparison."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.select(
            "o_orderkey",
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy(F.col("prio").asc_nulls_last(), F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "topk"),
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29: global top-k → TakeOrderedAndProject (no full sort/shuffle)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
             row_number() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ) AS rn
      FROM customer
    )
    SELECT c_nationkey, c_custkey, acctbal, rn FROM ranked WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: per-group top-k via row_number — one shuffle on the group key,
    no global sort; the filter prunes inside each partition."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cat.customer.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "win_first_last",
    oracle="""
    SELECT event_id, user_id,
           round(first_value(value) OVER w, 3) AS first_val,
           round(last_value(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ), 3) AS last_val,
           round(nth_value(value, 2) OVER w, 3) AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "analytic"),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over each user's timeline.  last_value needs
    the UNBOUNDED FOLLOWING frame (the default frame ends at CURRENT ROW,
    where last_value degenerates to the row itself — a classic cross-
    engine semantic trap both sides must spell out identically)."""
    cat = Catalog(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return cat.events.select(
        "event_id",
        "user_id",
        F.round(F.first("value").over(w), 3).alias("first_val"),
        F.round(F.last("value").over(w_full), 3).alias("last_val"),
        F.round(F.nth_value("value", 2).over(w), 3).alias("second_val"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ), 2) AS hour_sum,
           count(*) OVER (
             PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS hour_events
    FROM events
    """,
    tags=("window", "frame", "range"),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per-user trailing-hour sum/count.  Unlike
    ROWS frames this is value-based — all rows within 3600 *seconds*,
    ties included as peers — so both engines must order by the SAME
    numeric key: whole epoch seconds, explicitly floored on the DuckDB
    side (its epoch() keeps sub-second fractions while Spark's
    unix_timestamp truncates — at sf0.1 one event pair straddled a
    fractional-second frame boundary and the engines disagreed)."""
    cat = Catalog(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return cat.events.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("hour_sum"),
        F.count(F.lit(1)).over(w).alias("hour_events"),
    )


@query(
    "win_percent_rank",
    oracle="""
    SELECT c_custkey,
           floor(percent_rank() OVER w * 1000000) / 1000000 AS pct_rank,
           floor(cume_dist() OVER w * 1000000) / 1000000 AS cume,
           ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "rank"),
)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position windows: percent_rank, cume_dist, ntile over
    account balance within each nation (unique tie-break key keeps both
    engines' orderings identical).  The ratios are FLOOR-scaled, not
    rounded: k/n produces exact decimal halves (e.g. 41/640 =
    0.0640625) where Spark rounds half-up and DuckDB half-even — floor
    of the same IEEE double is tie-free on both."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    scale = F.lit(1000000)
    return cat.customer.select(
        "c_custkey",
        (F.floor(F.percent_rank().over(w) * scale) / scale).alias("pct_rank"),
        (F.floor(F.cume_dist().over(w) * scale) / scale).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )
