"""Scale-path join variants.

``join_asof`` (registered here) is the union-merge as-of join: the
shape that survives 100 TB.  The pairwise join+row_number form
(joins.py, registered as ``join_asof_pairwise``) multiplies each event
by the user's whole order history before pruning; this form tags both
inputs, unions them, and runs ONE window pass per user over the merged
timeline — each input shuffles exactly once and no intermediate blow-up
exists.  Both forms share the same oracle, so the driver proves them
equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from ..registry import REGISTRY, query


@query(
    "join_asof",
    oracle=None,  # set below: shares join_asof_pairwise's oracle
    tags=("join", "asof", "scale"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via merge-sorted union (see module docstring).

    Mechanics: orders become (user, time=o_orderdate, order payload)
    rows, events become (user, time=ts, event payload) rows.  Sorting
    the union by (user, time, is_event, orderkey) and carrying
    ``last_value(order) IGNORE NULLS`` gives every event row the latest
    order at-or-before its timestamp; the is_event=1 sort position puts
    an order *at* the same instant before the event (<= semantics), and
    orderkey ordering resolves same-date ties to the highest key —
    matching join_asof_pairwise exactly.
    """
    cat = Catalog(spark, sf_dir)
    orders = cat.orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        "o_orderdate",
    )
    # Both sides arrive as plain TIMESTAMP: the catalog normalizes every
    # timestamp_ntz fixture column (catalog.load_table), so no per-operator
    # harmonizing cast is needed for the unionByName.
    events = cat.events.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    merged = orders.unionByName(events)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.select(
            "is_event",
            "event_id",
            F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
            F.last("o_orderdate", ignorenulls=True).over(w).alias("asof_orderdate"),
        )
        .where((F.col("is_event") == 1) & F.col("asof_orderkey").isNotNull())
        .select("event_id", "asof_orderkey", "asof_orderdate")
    )


# Same semantics, same oracle: the driver verifies both physical forms
# against one SQL definition.
REGISTRY["join_asof"].oracle = REGISTRY["join_asof_pairwise"].oracle


def _tagged_click_purchase_union(cat: Catalog) -> DataFrame:
    """The tagged union-merge input all three click→purchase as-of
    variants (forward / tolerance / nearest) share: clicks carry their
    event_id, purchases carry (p_event_id, p_ts), is_click tags the
    side.  ONE definition — the variants' tie-break conventions differ
    only in how their window sorts read these columns, so a drifted
    copy would silently change join semantics."""
    clicks = cat.events.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_click"),
        "event_id",
        F.lit(None).cast("long").alias("p_event_id"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )
    purchases = cat.events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_click"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
    )
    return clicks.unionByName(purchases)


@query(
    "join_asof_forward",
    # Anchored click→purchase WITHIN events (orders end 2001, events
    # start 2024, so an orders-anchored forward probe would be vacuous;
    # clicks and purchases interleave, so this one isn't).
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS p_event_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
      SELECT c.event_id, p.p_event_id, p.p_ts,
             row_number() OVER (
               PARTITION BY c.event_id ORDER BY p.p_ts, p.p_event_id
             ) AS rn
      FROM c JOIN p ON p.user_id = c.user_id AND p.p_ts >= c.ts
    )
    SELECT event_id AS click_event_id,
           p_event_id AS next_purchase_id,
           p_ts AS next_purchase_ts
    FROM ranked WHERE rn = 1
    """,
    tags=("join", "asof", "scale"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join — for each click, the user's EARLIEST purchase
    at-or-after it (ties to the lowest event id): the "next action after
    the signal" lookup, pandas ``merge_asof(direction='forward')``.
    Completes the as-of family: ``join_asof`` (backward, union-merge),
    ``join_asof_pairwise`` (backward witness), this (forward).

    Same union-merge machinery as ``join_asof``, mirrored: one tagged
    union, one window pass per user — but the frame looks FORWARD
    (``first IGNORE NULLS`` over currentRow..unboundedFollowing) and the
    tie sort puts clicks BEFORE same-instant purchases (``is_click``
    descending) so ``>=`` includes a purchase at the exact click
    timestamp.  Each input shuffles exactly once and no pairwise
    intermediate exists; the oracle states the semantics as the
    readable join+rank form.
    """
    cat = Catalog(spark, sf_dir)
    merged = _tagged_click_purchase_union(cat)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", F.desc("is_click"), "p_event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        merged.select(
            "is_click",
            F.col("event_id").alias("click_event_id"),
            F.first("p_event_id", ignorenulls=True).over(w).alias("next_purchase_id"),
            F.first("p_ts", ignorenulls=True).over(w).alias("next_purchase_ts"),
        )
        .where((F.col("is_click") == 1) & F.col("next_purchase_id").isNotNull())
        .select("click_event_id", "next_purchase_id", "next_purchase_ts")
    )


@query(
    "join_range_binned",
    oracle="""
    WITH iv AS (
      SELECT CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE) + CAST(l_orderkey % 14 + 1 AS INTEGER) AS e,
             l_quantity
      FROM lineitem
    ),
    pts AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
    SELECT d, count(*) AS n_open, round(sum(l_quantity), 2) AS total_qty
    FROM pts JOIN iv ON d BETWEEN s AND e
    GROUP BY d
    """,
    tags=("join", "range", "scale"),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big interval join via day-bin explosion: for every distinct
    order date, count the lineitem ship windows (ship date .. ship date +
    1-14 days, span derived deterministically from the order key) open on
    that date.

    ``join_theta_range`` (joins.py) handles the non-equi case where one
    side is tiny — BroadcastNestedLoopJoin is fine at 3 dim rows.  When
    BOTH sides are large, BNLJ is O(n·m) and there is no open-source
    range-join hint to save you; the scalable rewrite is binning: explode
    each interval into its covered day bins (cost = total interval length
    in bins, not pairs), then the point side equi-joins on the bin key —
    one ordinary shuffle, AQE-skew-splittable like any equi join.  At day
    granularity with date points the bin IS the containment predicate;
    with coarser bins (weeks) the same plan adds a residual
    ``BETWEEN s AND e`` filter after the equi join.

    The DuckDB oracle states the same join declaratively (``d BETWEEN s
    AND e``, executed there as an IEJoin) — two genuinely different
    physical algorithms must meet on the same answer.
    """
    cat = Catalog(spark, sf_dir)
    span = (F.col("l_orderkey") % 14 + 1).cast("int")
    iv = cat.lineitem.select(
        F.to_date("l_shipdate").alias("s"),
        F.date_add(F.to_date("l_shipdate"), span).alias("e"),
        "l_quantity",
    )
    days = iv.select(F.explode(F.sequence("s", "e")).alias("d"), "l_quantity")
    pts = cat.orders.select(F.to_date("o_orderdate").alias("d")).distinct()
    return (
        pts.join(days, "d")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_open"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@query(
    "join_null_safe",
    oracle="""
    WITH ev AS (
      SELECT nullif(user_id % 10, 0) AS k, value FROM events
    ),
    lku AS (
      SELECT nullif(i, 0) AS k, 'bucket_' || i AS label
      FROM (SELECT unnest(generate_series(0, 9)) AS i)
    )
    SELECT label, count(*) AS n, round(sum(value), 2) AS total_value
    FROM ev JOIN lku ON ev.k IS NOT DISTINCT FROM lku.k
    GROUP BY label
    """,
    tags=("join", "null"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): bucket keys
    where bucket 0 is encoded as NULL on both sides — a plain equi-join
    silently drops those rows (NULL = NULL is never true); the null-safe
    operator matches them.  Crucially ``<=>`` is still a *hash* join key
    for Catalyst (NULL hashes like any value under null-safe equality),
    so the plan stays a broadcast/shuffled hash join, not a nested loop.
    The lookup side is built inline from ``spark.range`` and
    broadcasts.
    """
    cat = Catalog(spark, sf_dir)
    ev = cat.events.select(
        F.nullif(F.col("user_id") % 10, F.lit(0)).alias("k"), "value"
    )
    lku = spark.range(0, 10).select(
        F.nullif(F.col("id"), F.lit(0)).alias("k"),
        F.concat(F.lit("bucket_"), F.col("id")).alias("label"),
    )
    return (
        ev.join(F.broadcast(lku), ev["k"].eqNullSafe(lku["k"]))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "join_asof_tolerance",
    # Readable pairwise+rank form with the tolerance as a join predicate;
    # LEFT join keeps unmatched clicks.  Restricting to the tolerance
    # band before taking the latest is equivalent to latest-then-check:
    # if the overall latest purchase is out of band, every earlier one
    # is further away still.
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS p_event_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
      SELECT c.event_id, c.ts, p.p_event_id, p.p_ts,
             row_number() OVER (
               PARTITION BY c.event_id ORDER BY p.p_ts DESC, p.p_event_id DESC
             ) AS rn
      FROM c JOIN p ON p.user_id = c.user_id AND p.p_ts <= c.ts
        AND epoch_us(c.ts) - epoch_us(p.p_ts) <= 600000000
    )
    SELECT c.event_id AS click_event_id,
           r.p_event_id AS purchase_id,
           CASE WHEN r.p_event_id IS NOT NULL
                THEN epoch_us(c.ts) - epoch_us(r.p_ts) END AS staleness_us
    FROM c LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON c.event_id = r.event_id
    """,
    tags=("join", "asof", "tolerance", "scale"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with bounded staleness — pandas ``merge_asof(...,
    tolerance=...)``: each click matches the user's latest purchase
    at-or-before it ONLY if that purchase is at most 10 minutes stale;
    otherwise the click keeps NULLs (left semantics).  This is the
    feature-freshness contract of every point-in-time feature store
    lookup: a stale feature is worse than a missing one.

    Same single-window-pass union-merge machinery as ``join_asof`` —
    the tolerance adds one map-side comparison AFTER the carry-forward,
    never a second pass: the latest at-or-before purchase is also the
    closest, so checking only it against the band is exact.  Each input
    shuffles exactly once (plan pinned with the other as-of forms).
    """
    cat = Catalog(spark, sf_dir)
    tol_us = 10 * 60 * 1_000_000
    merged = _tagged_click_purchase_union(cat)
    # purchases (is_click=0) sort before same-instant clicks => <= ;
    # p_event_id ascending => `last` resolves purchase-time ties to the
    # highest id, matching join_asof's convention.
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_click", "p_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staleness = F.unix_micros(F.col("t")) - F.unix_micros(F.col("lp_ts"))
    in_band = F.col("lp_ts").isNotNull() & (staleness <= tol_us)
    return (
        merged.select(
            "is_click",
            F.col("event_id").alias("click_event_id"),
            "t",
            F.last("p_event_id", ignorenulls=True).over(w).alias("lp_id"),
            F.last("p_ts", ignorenulls=True).over(w).alias("lp_ts"),
        )
        .where(F.col("is_click") == 1)
        .select(
            "click_event_id",
            F.when(in_band, F.col("lp_id")).alias("purchase_id"),
            F.when(in_band, staleness).alias("staleness_us"),
        )
    )


@query(
    "join_asof_nearest",
    # Pairwise argmin form: every (click, purchase) pair of a user,
    # ranked by |Δt|, ties to the earlier (backward) purchase, then
    # within a side: backward keeps the highest id (join_asof's
    # convention), forward the lowest (join_asof_forward's) — the
    # (CASE sign) * p_event_id term encodes both in one key.
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS p_event_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
      SELECT c.event_id, p.p_event_id,
             abs(epoch_us(c.ts) - epoch_us(p.p_ts)) AS dist_us,
             CASE WHEN p.p_ts <= c.ts THEN 'backward' ELSE 'forward' END AS direction,
             row_number() OVER (
               PARTITION BY c.event_id
               ORDER BY abs(epoch_us(c.ts) - epoch_us(p.p_ts)),
                        p.p_ts,
                        (CASE WHEN p.p_ts <= c.ts THEN -1 ELSE 1 END) * p.p_event_id
             ) AS rn
      FROM c JOIN p ON p.user_id = c.user_id
    )
    SELECT c.event_id AS click_event_id,
           r.p_event_id AS purchase_id,
           CAST(r.dist_us AS BIGINT) AS dist_us,
           r.direction
    FROM c LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON c.event_id = r.event_id
    """,
    tags=("join", "asof", "scale"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof(direction=
    'nearest')``): each click matches the user's closest purchase in
    either time direction; equidistant ties prefer the backward
    (earlier) purchase.  Completes the as-of family — backward
    (``join_asof``), forward (``join_asof_forward``), tolerance-bounded
    (``join_asof_tolerance``), nearest (this).

    Single-sort trick: under the ONE merged ordering (t, is_click,
    p_event_id) — purchases before same-instant clicks — the backward
    carry (``last IGNORE NULLS`` over preceding) sees every purchase
    at-or-before the click, and the forward carry (``first IGNORE
    NULLS`` over following) sees every one strictly after; a
    same-instant purchase lands only in the backward carry, which any
    tie prefers anyway, so nothing is lost.  Both windows share the
    partitioning AND the sort: one shuffle, one sort, two frame scans —
    vs. the oracle's pairwise form, which materializes every
    (click, purchase) pair of a user before the argmin prunes it.
    Left semantics: clicks of purchase-less users keep NULLs."""
    cat = Catalog(spark, sf_dir)
    merged = _tagged_click_purchase_union(cat)
    order = [F.col("t"), F.col("is_click"), F.col("p_event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = merged.select(
        "is_click",
        F.col("event_id").alias("click_event_id"),
        "t",
        F.last("p_event_id", ignorenulls=True).over(wb).alias("b_id"),
        F.last("p_ts", ignorenulls=True).over(wb).alias("b_ts"),
        F.first("p_event_id", ignorenulls=True).over(wf).alias("f_id"),
        F.first("p_ts", ignorenulls=True).over(wf).alias("f_ts"),
    ).where(F.col("is_click") == 1)
    b_dist = F.unix_micros(F.col("t")) - F.unix_micros(F.col("b_ts"))
    f_dist = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("t"))
    # backward wins when it exists and is at least as close (<= = tie
    # preference); otherwise forward wins whenever it exists; neither
    # leaves the click with NULLs (left semantics).
    pick_b = F.col("b_ts").isNotNull() & (F.col("f_ts").isNull() | (b_dist <= f_dist))
    pick_f = F.col("f_ts").isNotNull()
    return carried.select(
        "click_event_id",
        F.when(pick_b, F.col("b_id"))
        .when(pick_f, F.col("f_id"))
        .alias("purchase_id"),
        F.when(pick_b, b_dist).when(pick_f, f_dist).cast("bigint").alias("dist_us"),
        F.when(pick_b, F.lit("backward"))
        .when(pick_f, F.lit("forward"))
        .alias("direction"),
    )
