"""Aggregation operators (SURVEY §2.B B17-B23).

Scale notes: every ``groupBy().agg()`` compiles to partial (map-side)
aggregation + one shuffle on the group key + final aggregation — the
shuffle carries *aggregated* partials, not raw rows.  Rollup/cube expand
grouping sets before the shuffle; AQE coalesces the post-shuffle
partitions when group cardinality is small.  DuckDB's ``sum(INTEGER)``
returns HUGEINT, so integer sums are cast to BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog, register_views
from ..registry import query


@query(
    "agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_price,
           round(avg(l_discount), 6) AS avg_disc,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17: hash aggregate with sum/avg/min/max/count (TPC-H Q1 shape)."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18: exact distinct aggregate (expands to a two-phase plan:
    de-dup on (group, value), then count — Catalyst handles the
    expansion; at scale prefer approx_count_distinct, see B19)."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("agg_approx_distinct", oracle=None, tags=("agg", "approx"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19: approximate count-distinct (HyperLogLog++).  rows-only check:
    Spark's HLL++ and DuckDB's HLL give different estimates by design.
    This is the 100 TB path for cardinality: constant memory per group
    vs. the exact distinct's shuffle of every distinct value."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_cust,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20: rollup — region/nation hierarchy totals + grand total."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21: cube — all 2^2 grouping-set combinations."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "grouping_sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22: explicit grouping sets via SQL (the DataFrame API has no
    grouping-sets verb; spark.sql is the idiomatic route)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15 AND sum(o_totalprice) > 100000
    """,
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23: post-aggregation filter (HAVING)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_total_raw"),
        )
        .where((F.col("n_orders") >= 15) & (F.col("_total_raw") > 100000))
        .select("o_custkey", "n_orders", F.round("_total_raw", 2).alias("total"))
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, both linear-interpolation).  Exact
    percentile buffers each group's values — fine for bounded groups;
    unbounded groups at scale should use approx_percentile (see
    agg_approx_percentile, rows-only: t-digest internals differ)."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("price_p99"),
    )


@query(
    "agg_approx_percentile",
    # Exact-regime oracle (same trick as agg_approx_top_k): with
    # accuracy >= group size the GK sketch stores every value and
    # Spark's rank convention equals DuckDB's quantile_disc exactly
    # (verified for odd/even N).  At real scale accuracy < N and the
    # answer degrades gracefully toward the sketch guarantee.
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.5) AS p50_approx,
           quantile_disc(l_quantity, 0.9) AS p90_approx
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (constant memory per group) — the scale
    path when groups are unbounded.  The accuracy parameter (1M) puts
    the Greenwald-Khanna sketch in its exact regime at every test SF
    (largest group ~200k values), which is what lets the driver verify
    this op by hash instead of rows-only; production use at accuracy <
    group size keeps the same plan with bounded memory and ±1/accuracy
    rank error."""
    cat = Catalog(spark, sf_dir)
    acc = F.lit(1_000_000)
    return cat.lineitem.groupBy("l_returnflag").agg(
        F.approx_percentile("l_quantity", F.lit(0.5), acc).alias("p50_approx"),
        F.approx_percentile("l_quantity", F.lit(0.9), acc).alias("p90_approx"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT o_custkey,
           array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_ids,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
    tags=("agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group collected list, deterministically sorted then joined to
    a string (collect_list order is partition-dependent; sort_array
    pins it — and the string form hashes identically across engines)."""
    cat = Catalog(spark, sf_dir)
    return cat.orders.groupBy("o_custkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("o_orderkey"))).alias("order_ids"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
           round(skewness(l_quantity), 4) AS skew_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (one-pass moment computations, partial+
    final like any hash aggregate): stddev/variance/correlation/
    covariance/skewness per return flag."""
    cat = Catalog(spark, sf_dir)
    return cat.lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("covar_qty_disc"),
        F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("agg", "distinct", "bitmap"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via roaring-style bitmaps (Spark 3.5+
    ``bitmap_*`` functions): bucket each user id (32768 ids per bucket),
    OR the per-bucket bit positions into a bitmap, then sum the bitmap
    cardinalities per group.

    This is the scale path for exact COUNT(DISTINCT): the classic
    expand-distinct plan shuffles every (group, user) pair; the bitmap
    plan shuffles at most one 4KB bitmap per (group, bucket) — partial
    ``bitmap_construct_agg`` runs map-side, so pre-aggregated bitmaps can
    also be persisted per partition and merged incrementally with
    ``bitmap_or_agg`` (the mergeable-summary pattern, same as HLL but
    exact).  The oracle is plain COUNT(DISTINCT): two different
    algorithms, one answer.
    """
    cat = Catalog(spark, sf_dir)
    per_bucket = (
        cat.events.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("n"))
    )
    return per_bucket.groupBy("event_type").agg(F.sum("n").alias("n_users"))


@query("agg_hll_sketch_merge", oracle=None, tags=("agg", "approx", "sketch"))
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Spark 3.5+ Apache DataSketches surface):
    build one ``hll_sketch_agg`` per (event_type, hour), then roll the
    per-hour sketches up to per-type distinct-user estimates with
    ``hll_union_agg`` — the two-level shape a 100 TB pipeline uses, where
    hourly partitions persist their sketch column once and every later
    rollup (day/month/all-time) merges sketches instead of rescanning
    raw data.  rows-only by design: the estimate is
    implementation-defined (DuckDB's approx_count_distinct uses a
    different sketch), so there is no cross-engine exact oracle;
    tests/test_llm_ops.py asserts the estimate lands within 5% of the
    exact count locally.
    """
    cat = Catalog(spark, sf_dir)
    hourly = (
        cat.events.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    )
    return (
        hourly.groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_users"))
    )


@query(
    "agg_approx_top_k",
    oracle="""
    SELECT event_type AS item, count(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("agg", "approx", "sketch"),
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (Spark 4 ``approx_top_k``): top event types
    by frequency, exploded to (item, n) rows.  The sketch tracks up to
    10000 items by default; the events table has far fewer distinct
    types, so the sketch is in its exact regime and an exact GROUP
    BY/COUNT oracle applies — the comparison is order-insensitive, so
    sketch-internal tie ordering can't flake the check.  At real scale
    the same expression bounds memory per partition where a full GROUP
    BY of a hot-key column would skew.
    """
    cat = Catalog(spark, sf_dir)
    topk = cat.events.agg(F.expr("approx_top_k(event_type, 16)").alias("t"))
    return topk.select(F.explode("t").alias("e")).select(
        F.col("e.item").alias("item"), F.col("e.count").alias("n")
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE value > 10) AS n_big,
           round(coalesce(sum(value) FILTER (WHERE user_id % 2 = 0), 0), 2) AS even_user_value,
           count(DISTINCT user_id) FILTER (WHERE value <= 10) AS n_small_users
    FROM events GROUP BY event_type
    """,
    tags=("agg", "filter"),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregation: per-predicate partial aggregates in a
    single scan — the idiom that replaces N self-joins ("count of X,
    sum over Y, distinct over Z, each under its own predicate") with one
    hash aggregate.  All three conditionals fold into the same partial
    agg; the scan happens once."""
    cat = Catalog(spark, sf_dir)
    return cat.events.groupBy("event_type").agg(
        F.count_if(F.col("value") > 10).alias("n_big"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("user_id") % 2 == 0, F.col("value"))), F.lit(0.0)), 2
        ).alias("even_user_value"),
        F.count_distinct(
            F.when(F.col("value") <= 10, F.col("user_id"))
        ).alias("n_small_users"),
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT event_type,
           CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 100 THEN 21
                     ELSE floor(value / 5) + 1 END AS INT) AS bucket,
           count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events
    GROUP BY event_type, bucket
    """,
    tags=("agg", "histogram", "profiling"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram per event type (20 buckets over
    [0, 100), out-of-range values land in the 0 / 21 overflow buckets)
    — the data-profiling primitive behind distribution drift checks and
    range sanity dashboards.

    ``width_bucket`` is a pure JVM expression, so binning rides the
    scan and the histogram is one hash aggregate over (type, bucket) —
    cardinality ≈ types × 22 no matter how many input rows, which makes
    the shuffle byte count effectively constant at 100 TB.
    """
    cat = Catalog(spark, sf_dir)
    return (
        cat.events.groupBy(
            "event_type",
            F.width_bucket("value", F.lit(0), F.lit(100), F.lit(20))
            .cast("int")
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@query(
    "funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts >= s1.signup_ts
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= s2.click_ts
      GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 1 AS ord, 'signup' AS stage, count(*) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'signup>click', count(*) FROM s2
      UNION ALL
      SELECT 3, 'signup>click>purchase', count(*) FROM s3
    ) ORDER BY ord
    """,
    tags=("agg", "funnel", "events"),
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who signed up, then clicked at
    or after their first signup, then purchased at or after that first
    qualifying click — the product-analytics query where event ORDER
    matters, not mere presence (a purchase before signup doesn't
    convert).

    Scale shape: ONE events scan and ONE user-keyed shuffle.  The
    per-stage aggregate-and-join-back form read the corpus three times
    and paid four user-keyed exchanges (r8 plan audit; this form
    measured bit-identical and 42% faster at sf0.1).  Instead the
    single per-user aggregate carries min(signup ts) plus the user's
    click/purchase timestamp lists, and the ordered-funnel condition
    resolves in-row with ``array_min(filter(...))`` — null signup ⇒
    null comparison ⇒ empty filter ⇒ null stage, exactly the join
    semantics.  Per-user list size is bounded by per-user event counts,
    the same bound every user-keyed aggregate here already accepts; the
    final count is a single-row aggregate exploded to the 3-row report.
    Timestamps compare exactly, so both engines agree on every
    boundary.
    """
    cat = Catalog(spark, sf_dir)
    ev = cat.events.select("user_id", "event_type", "ts").where(
        F.col("event_type").isin("signup", "click", "purchase")
    )
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
                "signup_ts"
            ),
            F.collect_list(
                F.when(F.col("event_type") == "click", F.col("ts"))
            ).alias("clicks"),
            F.collect_list(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("purchases"),
        )
        .select(
            "signup_ts",
            F.array_min(
                F.filter("clicks", lambda t: t >= F.col("signup_ts"))
            ).alias("click_ts"),
            "purchases",
        )
        .select(
            "signup_ts",
            "click_ts",
            F.array_min(
                F.filter("purchases", lambda t: t >= F.col("click_ts"))
            ).alias("purchase_ts"),
        )
    )
    row = pu.agg(
        F.count("signup_ts").alias("n1"),
        F.count("click_ts").alias("n2"),
        F.count("purchase_ts").alias("n3"),
    )
    return row.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("signup").alias("stage"), F.col("n1").alias("n_users")
                ),
                F.struct(
                    F.lit("signup>click").alias("stage"),
                    F.col("n2").alias("n_users"),
                ),
                F.struct(
                    F.lit("signup>click>purchase").alias("stage"),
                    F.col("n3").alias("n_users"),
                ),
            )
        ).alias("s")
    ).select("s.stage", "s.n_users")


@query(
    "profile_columns",
    oracle="""
    SELECT 'o_orderkey' AS col, count(*) - count(o_orderkey) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_val,
           CAST(max(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(round(min(o_totalprice), 2) AS VARCHAR),
           CAST(round(max(o_totalprice), 2) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
    FROM orders
    """,
    tags=("agg", "profiling"),
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling: null count, exact distinct count, and min/max
    per column of the orders table — the schema-drift / data-quality
    summary every ingestion pipeline runs on arrival.

    One scan computes all per-column aggregates in a single hash
    aggregate row (Catalyst plans the distinct-expansions together),
    then the row unpivots to the long (col, stats) form.  Values are
    rendered to strings with explicit per-type formatting so both
    engines print identically.  At 100 TB the exact count-distincts are
    the expensive part — the same query swaps them for
    ``approx_count_distinct`` with no shape change (cf.
    ``agg_approx_distinct``).
    """
    cat = Catalog(spark, sf_dir)
    o = cat.orders

    def stats(col, minmax_fmt):
        return [
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).alias(f"{col}__distinct"),
            minmax_fmt(F.min(col)).alias(f"{col}__min"),
            minmax_fmt(F.max(col)).alias(f"{col}__max"),
        ]

    as_str = lambda c: c.cast("string")  # noqa: E731
    num2 = lambda c: F.round(c, 2).cast("string")  # noqa: E731
    ts_fmt = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731

    wide = o.agg(
        *stats("o_orderkey", as_str),
        *stats("o_orderstatus", as_str),
        *stats("o_totalprice", num2),
        *stats("o_orderdate", ts_fmt),
    )
    rows = []
    for col in ("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"):
        rows.append(
            F.struct(
                F.lit(col).alias("col"),
                F.col(f"{col}__nulls").alias("n_nulls"),
                F.col(f"{col}__distinct").alias("n_distinct"),
                F.col(f"{col}__min").alias("min_val"),
                F.col(f"{col}__max").alias("max_val"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


@query(
    "agg_mode_median",
    # Mode stated deterministically (count desc, value asc) rather than
    # via mode(): both engines' native mode() picks an ARBITRARY value
    # among tied-frequency candidates, which can never hash-match; the
    # rank formulation is the same aggregate with the tie pinned.
    # Median runs over integer cents: interpolation of two integers is
    # exact IEEE arithmetic under either (a+b)/2 or a+(b-a)*0.5, so the
    # engines agree bit-for-bit without a rounding guard.
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, c_nationkey, count(*) AS n
      FROM customer GROUP BY 1, 2
    ),
    m AS (
      SELECT c_mktsegment, c_nationkey AS mode_nation,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, c_nationkey) AS rk
      FROM counts
    ),
    med AS (
      SELECT c_mktsegment,
             CAST(median(CAST(floor(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               AS median_cents
      FROM customer GROUP BY 1
    )
    SELECT m.c_mktsegment, m.mode_nation, med.median_cents
    FROM m JOIN med USING (c_mktsegment)
    WHERE rk = 1
    """,
    tags=("agg", "mode", "median"),
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode + exact median — the two order
    statistics ``agg_basic``'s algebraic aggregates can't express.

    Physical shape: the mode branch is a two-level aggregate — partial
    counts shuffle on (group, value), then a group-keyed window picks
    the max-count value — and the median branch is one sort-based
    aggregate on the group key.  Both branches shuffle *aggregated or
    group-local* data only; the broadcast join reassembling them moves
    five rows.  At 100 TB the (group, value) pre-aggregation is what
    keeps the mode exact without ever materializing a per-group value
    list (contrast collect_list-based formulations, which OOM at scale).
    """
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    counts = cat.customer.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("n"), "c_nationkey")
    mode = (
        counts.select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nation"),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") == 1)
        .drop("rk")
    )
    med = (
        cat.customer.select(
            "c_mktsegment",
            F.floor(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("c_mktsegment")
        .agg(F.median("cents").cast("double").alias("median_cents"))
    )
    return mode.join(F.broadcast(med), "c_mktsegment")


@query(
    "agg_grouping_id",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
             AS gid,
           count(*) AS n,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "rollup"),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``grouping()``/``grouping_id()`` metadata over a ROLLUP: the
    bitmask that tells a subtotal row apart from a data row whose key
    really IS null — without it, rollup output is ambiguous the moment
    a grouping column is nullable.  (agg_rollup/B20 shows the lattice;
    this shows the disambiguation contract.)  The gid is composed from
    per-column ``grouping()`` bits so both engines state the same
    number regardless of their internal bitmask conventions.  Plan is
    the standard expand+aggregate: one shuffle, rollup rows expanded
    map-side."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("bigint")
            .alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n",
            "total_qty",
        )
    )


@query(
    "agg_boolean",
    oracle="""
    SELECT c_mktsegment,
           bool_and(c_acctbal > 0) AS all_positive,
           bool_or(c_acctbal > 9000) AS any_premium,
           CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_debtors
    FROM customer GROUP BY 1 ORDER BY 1
    """,
    tags=("aggregate", "boolean"),
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (``every``/``bool_and``, ``any``/``bool_or``,
    ``count_if``) — the predicate-rollup vocabulary that turns row-level
    assertions into group-level facts without a CASE-sum workaround.
    Ordinary partial+final hash agg: booleans combine map-side like any
    other aggregate."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.groupBy("c_mktsegment")
        .agg(
            F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_premium"),
            F.count_if(F.col("c_acctbal") < 0).cast("bigint").alias("n_debtors"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT n_nationkey,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("aggregate", "string", "spark4"),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (Spark 4 ``listagg`` WITHIN GROUP ≡
    DuckDB ``string_agg(... ORDER BY)``): supplier roster per nation.
    The in-group ORDER BY is the correctness load-bearing part — an
    unordered concat is nondeterministic under shuffle partitioning and
    can never hash-match a second engine (or a re-run of the same one).
    Group sizes here are dim-bounded; at scale an unbounded LISTAGG is
    the string-blowup smell to cap or replace with collect+slice."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.nation.join(
            cat.supplier, F.expr("s_nationkey = n_nationkey")
        )
        .groupBy("n_nationkey")
        .agg(
            F.expr("listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)").alias(
                "suppliers"
            )
        )
        .orderBy("n_nationkey")
    )
