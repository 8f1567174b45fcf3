"""Streaming transformations over an events stream.

Each function takes any events-shaped DataFrame — batch or streaming —
and returns the transformed DataFrame; callers attach sources and sinks.
Watermarks bound state: a 1000-executor job processing a firehose keeps
per-window partial aggregates / dedup keys only until the watermark
passes, then emits and drops them.

Scale notes: streaming aggregation state is partitioned by the group key
(window, user) across executors exactly like a batch shuffle; the
watermark delay is the knob trading late-data tolerance for state size.
``dropDuplicates`` under a watermark keeps one key per (user, type)
until expiry — bounded by key cardinality, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """B49: per-hour event counts with a watermark for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """B50: 1-hour windows sliding every 30 minutes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_counts(events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes") -> DataFrame:
    """B51: gap-based session windows per user (stateful merge of
    overlapping session fragments across micro-batches)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def watermark_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """B52: stateful exactly-once-per-key dedup under a watermark —
    late duplicates beyond the watermark are dropped with their state."""
    return events.withWatermark("ts", watermark).dropDuplicates(["user_id", "event_type"])


def clicks_errors_joined(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Stream-stream inner join: pair each error with the clicks of the
    same user in the preceding 5 minutes.  Both sides carry a watermark
    and the join has a time-band condition, so each side's state store
    evicts rows once the other side's watermark passes the band — the
    state bound that makes an unbounded-stream join feasible (without
    it, both full streams would be retained forever).  The batch twin
    (same pairs, aggregated) is ``join_event_window`` in
    operators/timeseries.py.
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", watermark)
    )
    errors = (
        events.where(F.col("event_type") == "error")
        .select(F.col("user_id").alias("e_user"), F.col("ts").alias("err_ts"))
        .withWatermark("err_ts", watermark)
    )
    return clicks.join(
        errors,
        F.expr(
            "user_id = e_user AND err_ts >= click_ts "
            "AND err_ts < click_ts + INTERVAL 5 MINUTES"
        ),
    ).select("user_id", "click_ts", "err_ts")


def enrich_with_nation(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join: enrich a streaming event feed with a static
    dimension (customer → nation key), then count per nation.

    The static side is planned per micro-batch as an ordinary batch
    relation — Spark broadcasts it under the threshold, and no
    watermark is needed because static rows never expire.  This is the
    canonical dimension-enrichment topology: the 100 TB stream flows
    partition-parallel; the dimension rides along broadcast.
    """
    dim = customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_nationkey").alias("nation_key"),
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("nation_key")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )
