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
    events = cat.events.select(
        "user_id",
        F.col("ts").cast("timestamp_ntz").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
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
