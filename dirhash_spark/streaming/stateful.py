"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star streaming surface; no REF analog — the reference has no
streaming at all, SURVEY §2.B preamble).

``running_totals`` keeps (count, sum) per user in the state store and
emits the updated running totals on every trigger — the minimal shape of
every custom sessionizer/enricher that outgrows the built-in window
aggregates.  State is one 16-byte tuple per user: at 10^9 users that is
~16 GB across the cluster's state stores, scaling with keys, not events.

The registry entry runs the real streaming query (file source → state
store → memory sink) to completion inside the callable and returns the
sink table: the driver's oracle check then proves the stateful path
computes exactly the batch aggregate — all events arrive in one trigger,
so each user emits exactly one final row.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog
from ..registry import query

_OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
_STATE_SCHEMA = "n BIGINT, total DOUBLE"


def running_totals(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum) with explicit state round-trip."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_totals_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File stream → applyInPandasWithState → streaming DataFrame."""
    stream = spark.readStream.schema("user_id BIGINT, value DOUBLE").parquet(source_dir)
    return stream.groupBy("user_id").applyInPandasWithState(
        running_totals, _OUT_SCHEMA, _STATE_SCHEMA, "update", "NoTimeout"
    )


@query(
    "stream_stateful_running",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful stream over the events table (one trigger ⇒ one
    final row per user) and return the sink contents."""
    cat = Catalog(spark, sf_dir)
    src = os.path.join(tempfile.gettempdir(), "dirhash_spark_sink", "stateful_events")
    cat.events.select("user_id", "value").write.mode("overwrite").parquet(src)
    q = (
        running_totals_stream(spark, src)
        .writeStream.format("memory")
        .queryName("dirhash_stateful_running")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # Materialize: the memory-sink table is tied to the (now stopped)
    # query; hand back an immutable snapshot.
    return spark.createDataFrame(
        spark.table("dirhash_stateful_running").collect(),
        _OUT_SCHEMA,
    )


@query(
    "stream_foreach_batch_sink",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1
    """,
    tags=("streaming", "sink"),
)
def stream_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink — the production pattern for writing streams to
    systems without a native streaming sink (upserts, merges, JDBC):
    each micro-batch arrives as a plain DataFrame with an id, and the
    callback writes it transactionally.  Here: tumbling hourly counts
    appended to parquet per batch; the oracle proves the sink's final
    contents equal the batch aggregate (one availableNow trigger ⇒ one
    append of the complete result)."""
    from .ops import tumbling_counts

    cat = Catalog(spark, sf_dir)
    src = os.path.join(tempfile.gettempdir(), "dirhash_spark_sink", "fb_events_src")
    dst = os.path.join(tempfile.gettempdir(), "dirhash_spark_sink", "fb_counts")
    cat.events.select("event_id", "ts", "user_id", "value").write.mode(
        "overwrite"
    ).parquet(src)
    import shutil

    shutil.rmtree(dst, ignore_errors=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(dst)

    # TIMESTAMP, not NTZ: withWatermark requires an event-time column of
    # TIMESTAMP type (session timezone is pinned UTC so values agree).
    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    ).parquet(src)
    q = (
        tumbling_counts(stream)
        .writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    return spark.read.parquet(dst)


# Spark 4's transformWithStateInPandas (typed state variables, timers,
# RocksDB-backed store) is the successor to applyInPandasWithState; it
# was evaluated here and works identically for this operator's
# semantics, but its Python worker protocol requires google.protobuf,
# which this container does not ship (and installs are out of scope) —
# so the registered stateful query stays on applyInPandasWithState.


@query(
    "stream_static_join",
    oracle="""
    SELECT c_nationkey AS nation_key,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1
    """,
    tags=("streaming", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment: the events stream joins the
    static customer table (broadcast per micro-batch, no watermark —
    static rows never expire) and aggregates per nation.  One
    availableNow trigger consumes everything, so the sink equals the
    batch join the oracle runs.  See ops.enrich_with_nation for the
    topology notes."""
    from .ops import enrich_with_nation

    cat = Catalog(spark, sf_dir)
    src = os.path.join(tempfile.gettempdir(), "dirhash_spark_sink", "ss_join_events")
    cat.events.select("event_id", "ts", "user_id", "value").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    ).parquet(src)
    q = (
        enrich_with_nation(stream, cat.customer)
        .writeStream.format("memory")
        .queryName("dirhash_stream_static_join")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
    return spark.createDataFrame(
        spark.table("dirhash_stream_static_join").collect(),
        "nation_key BIGINT, n_events BIGINT, total_value DOUBLE",
    )
