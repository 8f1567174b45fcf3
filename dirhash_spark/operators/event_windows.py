"""Event-time windows, batch-checkable forms (SURVEY §2.B B49-B52).

These run the *batch* equivalents of the streaming operators so the
DuckDB oracle can verify window semantics exactly; the Structured
Streaming path (readStream/writeStream, watermarks, stateful dedup) over
the same expressions lives in ``dirhash_spark.streaming`` with its own
smoke tests — Spark's unified API makes the window expressions
identical in both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import query
from ..streaming.ops import (
    session_counts,
    sliding_counts,
    tumbling_counts,
    watermark_dedup,
)


@query(
    "stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
    tags=("streaming", "window"),
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B49: tumbling 1-hour window aggregate (same F.window expression a
    streaming query uses; epoch-aligned like DuckDB's time_bucket).

    DELEGATES to streaming/ops.py's tumbling_counts — one definition of
    the window expression for both modes (withWatermark is a no-op on a
    batch frame), so the oracle-checked batch form and the streaming
    smoke test can never drift apart."""
    cat = Catalog(spark, sf_dir)
    return tumbling_counts(cat.events)


@query(
    "stream_sliding",
    oracle="""
    WITH halves AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS half_start, value FROM events
    ),
    expanded AS (
      SELECT half_start AS window_start, value FROM halves
      UNION ALL
      SELECT half_start - INTERVAL '30 minutes' AS window_start, value FROM halves
    )
    SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM expanded
    GROUP BY window_start
    """,
    tags=("streaming", "window"),
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B50: sliding window (1 hour every 30 minutes) — each event lands
    in exactly two windows; the oracle expands the two half-aligned
    window starts explicitly.  Delegates to ops.sliding_counts (shared
    expression, both modes — the two copies had already drifted: the
    streaming twin was missing total_value)."""
    cat = Catalog(spark, sf_dir)
    return sliding_counts(cat.events)


@query(
    "stream_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '10 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    islands AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '10 minutes' AS session_end,
           count(*) AS n_events
    FROM islands
    GROUP BY user_id, session_no
    """,
    tags=("streaming", "window", "session"),
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B51: gap-based session windows (10-minute gap) per user.  Spark's
    session_window end = last event + gap; the oracle reconstructs the
    same islands with lag + running sum.  Delegates to
    ops.session_counts (shared expression, both modes)."""
    cat = Catalog(spark, sf_dir)
    return session_counts(cat.events)


@query(
    "stream_watermark_dedup",
    # WHICH row survives dropDuplicates is nondeterministic, but this
    # query only emits per-type survivor COUNTS — and |distinct (user,
    # type) pairs| per type is exactly count(DISTINCT user_id), fully
    # deterministic.  So the op gets an exact oracle after all.
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_unique_users
    FROM events
    GROUP BY event_type
    """,
    tags=("streaming", "stateful"),
)
def stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B52 batch stand-in: event dedup on (user_id, event_type) — the
    same dropDuplicates that runs stateful under a watermark in the
    streaming smoke test (tests/test_streaming.py).  The keeper row is
    nondeterministic, but the emitted counts are not (see oracle).
    The dedup itself delegates to ops.watermark_dedup (shared
    expression, both modes)."""
    cat = Catalog(spark, sf_dir)
    return (
        watermark_dedup(cat.events)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_users"))
    )


@query(
    "ts_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour,
             count(*) AS n_events,
             floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                   / count(*)) / 100 AS avg_value
      FROM events WHERE user_id < 8
      GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour
      FROM spans
    ),
    joined AS (
      SELECT g.user_id, g.hour,
             coalesce(n_events, 0) AS n_events,
             avg_value
      FROM grid g LEFT JOIN hourly h USING (user_id, hour)
    )
    SELECT user_id, hour, n_events,
           last_value(avg_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_avg_value
    FROM joined
    """,
    tags=("window", "timeseries"),
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: densify each user's hourly activity onto
    a complete hour grid (missing hours appear with zero counts) and
    forward-fill the last observed hourly average across the gaps — the
    standard densify + LOCF step before any rolling metric or chart.

    Scale shape: the grid is generated per user from that user's own
    [min, max] span (``sequence`` + ``explode``), so grid size is
    bounded by span-hours per user, not global-span × users; the fill
    is one window pass per user.  All expressions exist identically in
    streaming mode except the grid — real-time gap filling instead uses
    the tumbling window with watermarks and emits empty buckets
    downstream.
    """
    cat = Catalog(spark, sf_dir)
    # avg over EXACT per-row cents (floor(value*100+0.5) as BIGINT),
    # not floor(avg(double)*100): most groups' averages land exactly on
    # the floor discontinuity (cents-valued fixture), where a 1-ulp
    # summation-order difference between engines flips the output by
    # 0.01 and propagates through the LOCF fill.  Integer sums are
    # order-invariant; the single int/int double division is exactly
    # rounded, so the floor is engine-stable (DESIGN.md float
    # discipline, the agg_regression idiom).
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    hourly = (
        cat.events.where(F.col("user_id") < 8)
        .groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.floor(F.sum(cents).cast("double") / F.count(F.lit(1))) / 100
            ).alias("avg_value"),
        )
        .select("user_id", F.col("w.start").alias("hour"), "n_events", "avg_value")
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour",
        "n_events",
        F.last("avg_value", ignorenulls=True).over(w).alias("last_avg_value"),
    )
