"""Batch time-series operators over the events table: gaps-and-islands
sessionization and OHLC bar resampling.

``event_windows.py`` holds the window-function *streaming twins* (its
``stream_session`` uses Spark's ``session_window``); this module is the
batch-analytics side a warehouse user expects: explicit islands with
per-session metrics, and financial-style bar aggregation via
``min_by``/``max_by``.

Scale shape: both operators are one shuffle on the grouping key
(``user_id`` / ``(event_type, hour)``) — window partitions and hash
aggregates never materialize cross-key state, and the OHLC aggregate is
a partial+final hash agg (no sort, no window pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Catalog
from ..registry import REGISTRY, query

#: session gap in microseconds (10 minutes) — compared on exact integer
#: microsecond timestamps so both engines make identical break decisions.
_GAP_US = 10 * 60 * 1_000_000


@query(
    "sessionize_batch",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           CAST(session_no AS INT) AS session_no,
           min(ts) AS session_start,
           max(ts) AS session_end,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM islands
    GROUP BY user_id, session_no
    """,
    tags=("timeseries", "window", "session"),
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (10-minute inactivity gap): mark
    session breaks with ``lag``, number islands with a running sum, then
    aggregate per-session metrics (start/end, duration, count, value).

    This is the batch twin of ``stream_session`` (event_windows.py) —
    same sessions, but built from first principles with window functions
    (the form that also yields per-session metrics ``session_window``
    can't express, like exact duration and value totals), and the
    numbered ``session_no`` gives downstream joins a stable key.
    Gap comparisons use integer microseconds (``unix_micros`` /
    ``epoch_us``) so the two engines can't disagree on a boundary.
    """
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    new_session = (
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > F.lit(_GAP_US))
    ).cast("int")
    islands = (
        cat.events.select("user_id", "ts", "value", "event_id")
        .withColumn("new_session", new_session)
        .withColumn(
            "session_no",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("int"),
        )
    )
    return islands.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH b AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
             value, ts, event_id
      FROM events
    ),
    w AS (
      SELECT event_type, hour, value,
             first_value(value) OVER (PARTITION BY event_type, hour
                                      ORDER BY ts, event_id) AS open,
             first_value(value) OVER (PARTITION BY event_type, hour
                                      ORDER BY ts DESC, event_id DESC) AS close
      FROM b
    )
    SELECT event_type, hour,
           min(open) AS open,
           max(value) AS high,
           min(value) AS low,
           min(close) AS close,
           count(*) AS n_ticks,
           round(sum(value), 2) AS total_value
    FROM w
    GROUP BY event_type, hour
    """,
    tags=("timeseries", "agg"),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the event stream into hourly OHLC bars per event type:
    open/close = first/last value by (ts, event_id), high/low = max/min.

    Spark side is a single hash aggregate — ``min_by``/``max_by`` over a
    ``struct(ts, event_id)`` ordering key pick the endpoint values with
    deterministic tie-breaks, so there is no sort and no window pass
    (partial aggregation runs map-side; only one shuffle on the group
    key).  The oracle reconstructs the same endpoints with window
    ``first_value`` in both directions — DuckDB's ``arg_min`` takes no
    composite ordering key, which is exactly the gap ``min_by(value,
    struct(...))`` closes.  open/close/high/low are untouched stored
    doubles (no arithmetic), so they compare bit-exactly.
    """
    cat = Catalog(spark, sf_dir)
    b = cat.events.select(
        "event_type",
        F.window("ts", "1 hour").alias("w"),
        "value",
        "ts",
        "event_id",
    ).select(
        "event_type", F.col("w.start").alias("hour"), "value", "ts", "event_id"
    )
    key = F.struct("ts", "event_id")
    return b.groupBy("event_type", "hour").agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "join_event_window",
    oracle=f"""
    WITH c AS (
      SELECT user_id, ts AS click_ts, event_id AS click_id
      FROM events WHERE event_type = 'click'
    ),
    e AS (
      SELECT user_id, ts AS err_ts FROM events WHERE event_type = 'error'
    )
    SELECT c.user_id, count(*) AS n_errors_after_click,
           min(epoch_us(e.err_ts) - epoch_us(c.click_ts)) AS min_lag_us
    FROM c JOIN e ON c.user_id = e.user_id
      AND epoch_us(e.err_ts) >= epoch_us(c.click_ts)
      AND epoch_us(e.err_ts) <  epoch_us(c.click_ts) + {5 * 60 * 1_000_000}
    GROUP BY c.user_id
    """,
    tags=("timeseries", "join", "streaming"),
)
def join_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-correlation interval join: for each user, count error
    events landing within 5 minutes after one of their clicks (and the
    tightest click→error lag) — the batch twin of a watermarked
    stream-stream join (same equi + time-band predicate; in streaming
    mode the band doubles as the state-retention bound on both sides).

    The join is an equi-join on ``user_id`` with the time band as a
    residual filter — per-user event streams are bounded, so the
    intermediate stays proportional to matched pairs, and Catalyst
    plans an ordinary hash join, not a nested loop.  A pathologically
    hot user is exactly the skew case ``join_skew_salted`` handles; at
    day-scale spans the band would additionally become a day-bin equi
    key per ``join_range_binned``.  Timestamps compare as exact integer
    microseconds on both engines.
    """
    cat = Catalog(spark, sf_dir)
    band_us = 5 * 60 * 1_000_000
    c = cat.events.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("click_us")
    )
    e = cat.events.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.unix_micros("ts").alias("err_us")
    )
    return (
        c.join(
            e,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("err_us") >= F.col("click_us"))
            & (F.col("err_us") < F.col("click_us") + F.lit(band_us)),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_errors_after_click"),
            F.min(F.col("err_us") - F.col("click_us")).alias("min_lag_us"),
        )
    )


@query(
    "ts_zscore",
    oracle="""
    WITH stats AS (
      SELECT event_id, event_type, value,
             floor(avg(value)         OVER (PARTITION BY event_type) * 1e8) / 1e8 AS mu,
             floor(stddev_samp(value) OVER (PARTITION BY event_type) * 1e8) / 1e8 AS sigma
      FROM events
    )
    SELECT event_id, event_type,
           floor((value - mu) / sigma * 10000) / 10000 AS zscore
    FROM stats
    """,
    tags=("timeseries", "window", "normalize"),
)
def ts_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization: every event's value standardized
    against its event type's mean and sample standard deviation — the
    feature-scaling step before anomaly thresholds or model input.

    Registered form = two-pass broadcast: a tiny groupBy aggregate
    (partial/map-side combine, output rows = #groups) broadcast-joined
    back onto the events.  With FEW groups a whole-partition window
    would shuffle 100 TB onto #groups partitions — one reducer per
    event type, the textbook skew cliff; here the wide side never
    shuffles at all (map-side agg + broadcast probe).
    ``ts_zscore_window`` keeps the single-window form as an equivalence
    witness on the same oracle.

    Float discipline: stddev_samp accumulates in a different order per
    plan, so mu/sigma are floor-scaled to 1e-8 BEFORE the per-row
    z-score math on both engines — the per-row expression then sees
    bit-identical inputs in every form.
    """
    cat = Catalog(spark, sf_dir)
    stats = cat.events.groupBy("event_type").agg(
        (F.floor(F.avg("value") * 1e8) / 1e8).alias("mu"),
        (F.floor(F.stddev_samp("value") * 1e8) / 1e8).alias("sigma"),
    )
    return cat.events.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        (F.floor((F.col("value") - F.col("mu")) / F.col("sigma") * 10000) / 10000).alias(
            "zscore"
        ),
    )


@query(
    "ts_zscore_window",
    oracle=None,  # set below: shares ts_zscore's oracle (equivalence witness)
    tags=("timeseries", "window", "normalize"),
)
def ts_zscore_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence witness for :func:`ts_zscore`: the same semantics as
    one whole-partition window pass (no ORDER BY → Spark computes the
    aggregate once per partition and fans it back, no running frame).
    Fine when groups are plentiful; skew-prone when they are few — the
    broadcast form above is the 100-TB shape.  Same oracle proves the
    two plans equivalent."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("event_type")
    mu = F.floor(F.avg("value").over(w) * 1e8) / 1e8
    sigma = F.floor(F.stddev_samp("value").over(w) * 1e8) / 1e8
    return cat.events.select(
        "event_id",
        "event_type",
        (F.floor((F.col("value") - mu) / sigma * 10000) / 10000).alias("zscore"),
    )


# Same semantics, same oracle: the driver proves both physical forms
# (broadcast two-pass vs whole-partition window) equivalent.
REGISTRY["ts_zscore_window"].oracle = REGISTRY["ts_zscore"].oracle


@query(
    "ts_interpolate_linear",
    oracle="""
    WITH hourly AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS hour,
             floor(avg(value) * 100) / 100 AS obs
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
      SELECT g.user_id, g.hour, obs
      FROM grid g LEFT JOIN hourly h USING (user_id, hour)
    ),
    anchored AS (
      SELECT user_id, hour, obs,
             last_value(obs IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN obs IS NOT NULL THEN hour END IGNORE NULLS)
               OVER wb AS ph,
             first_value(obs IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN obs IS NOT NULL THEN hour END IGNORE NULLS)
               OVER wf AS nh
      FROM joined
      WINDOW wb AS (PARTITION BY user_id ORDER BY hour
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY hour
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, hour,
           CASE WHEN obs IS NOT NULL THEN 'observed' ELSE 'interp' END AS src,
           CASE WHEN obs IS NOT NULL THEN obs
                ELSE floor((pv + (nv - pv)
                            * ((epoch_us(hour) - epoch_us(ph))
                               / (epoch_us(nh) - epoch_us(ph)))) * 10000) / 10000
           END AS val
    FROM anchored
    """,
    tags=("timeseries", "window", "interpolate"),
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across hourly gaps: densify each user's
    hourly average onto a complete grid (as in ``ts_gap_fill``), then
    fill every missing hour with the straight line between the nearest
    observed hours on either side — the resampling step LOCF can't do
    when the metric trends (sensor feeds, rates, prices).

    Two window passes per user — a backward pass carrying the last
    observed (value, hour) anchor and a forward pass carrying the next
    — then pure arithmetic on integer microseconds.  Interior gaps get
    the interpolated value; grid edges can't occur here because each
    user's grid spans exactly [first, last] observation.  Anchors and
    result are floor-rounded so both engines compare bit-identical
    doubles.
    """
    cat = Catalog(spark, sf_dir)
    hourly = (
        cat.events.where(F.col("user_id") < 8)
        .groupBy("user_id", F.window("ts", "1 hour").alias("w"))
        .agg((F.floor(F.avg("value") * 100) / 100).alias("obs"))
        .select("user_id", F.col("w.start").alias("hour"), "obs")
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    joined = grid.join(hourly, ["user_id", "hour"], "left")
    wb = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("obs").isNotNull(), F.col("hour"))
    anchored = joined.select(
        "user_id",
        "hour",
        "obs",
        F.last("obs", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(wb).alias("ph"),
        F.first("obs", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_hour, ignorenulls=True).over(wf).alias("nh"),
    )
    frac = (F.unix_micros("hour") - F.unix_micros("ph")).cast("double") / (
        F.unix_micros("nh") - F.unix_micros("ph")
    )
    interp = F.floor((F.col("pv") + (F.col("nv") - F.col("pv")) * frac) * 10000) / 10000
    return anchored.select(
        "user_id",
        "hour",
        F.when(F.col("obs").isNotNull(), F.lit("observed"))
        .otherwise(F.lit("interp"))
        .alias("src"),
        F.when(F.col("obs").isNotNull(), F.col("obs")).otherwise(interp).alias("val"),
    )


@query(
    "scd2_history",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 100) / 100 AS DOUBLE) AS attr
      FROM events
      WHERE event_type = 'signup' OR event_type = 'purchase'
    )
    SELECT user_id, attr,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current
    FROM changes
    """,
    tags=("warehouse", "scd", "window"),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a change stream into
    validity-interval history rows — each change opens a version
    (`valid_from` = its timestamp) and the NEXT change for the same key
    closes it (`valid_to`, open/NULL on the current version).  This is
    the warehouse pattern behind every `dim_*_history` table and the
    batch form of CDC apply; `join_asof` is then the point-in-time
    lookup against this table.

    One window pass per key (lead over ts): exactly one shuffle on the
    dimension key, no self-join — the join-based formulation
    ("match each row to its successor") would shuffle twice and break
    under duplicate timestamps, which the (ts, event_id) tiebreak here
    handles deterministically.
    """
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = cat.events.where(
        (F.col("event_type") == "signup") | (F.col("event_type") == "purchase")
    ).select(
        "user_id",
        "event_id",
        "ts",
        (F.floor(F.col("value") * 100) / 100).alias("attr"),
    )
    return changes.select(
        "user_id",
        "attr",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "ts_anomaly_mad",
    # All arithmetic stays exact: cents are integers, each median of
    # integers (or of their 0.5-multiples deviations) lands on an exact
    # binary fraction, and k*MAD multiplies exactly — so the strict `>`
    # cut is engine-independent with no rounding guard needed.
    oracle="""
    WITH c AS (
      SELECT event_id, event_type, CAST(floor(value * 100) AS BIGINT) AS value_cents
      FROM events
    ),
    med AS (
      SELECT event_type, CAST(median(value_cents) AS DOUBLE) AS med
      FROM c GROUP BY 1
    ),
    d AS (
      SELECT c.event_id, c.event_type, c.value_cents,
             abs(c.value_cents - med.med) AS deviation
      FROM c JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, CAST(median(deviation) AS DOUBLE) AS mad
      FROM d GROUP BY 1
    )
    SELECT d.event_id, d.event_type, d.value_cents, d.deviation
    FROM d JOIN mad USING (event_type)
    WHERE d.deviation > 3 * mad.mad
    """,
    tags=("timeseries", "anomaly", "robust"),
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: flag
    events whose |value - median| exceeds 3x the per-type MAD.  MAD is
    the robust twin of ``ts_zscore``'s stddev — a few extreme values
    shift mean/stddev enough to mask each other, while the two medians
    here ignore them (50% breakdown point), which is why quality
    pipelines cut on MAD rather than z-score.

    Physical shape: three fact passes, zero fact-side shuffles — pass 1
    aggregates the per-type median (5 rows), pass 2 aggregates the MAD
    against the broadcast median, pass 3 filters against the combined
    broadcast (med, mad) stats table; only per-type aggregation
    partials ever cross an exchange (same design as ``ts_zscore``).  At 100 TB the exact
    medians would switch to ``approx_percentile`` sketches — same
    plan, constant memory — at the documented cost of the exact-hash
    oracle (the sketch twin is ``agg_approx_percentile``).
    """
    cat = Catalog(spark, sf_dir)
    c = cat.events.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    # The 5-row median table is consumed by TWO branches (MAD's build
    # side and the final stats join); Spark has no automatic cross-
    # branch CSE (see scan_cached_branches), so without pinning it each
    # branch would re-run the full fact scan behind it.  localCheckpoint
    # over persist(): lineage truncates the same way and no CacheManager
    # entry outlives the query (r8 audit; bit-identical at sf0.1).
    med = (
        c.groupBy("event_type")
        .agg(F.median("value_cents").cast("double").alias("med"))
        .localCheckpoint()
    )
    mad = (
        c.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.abs(F.col("value_cents") - F.col("med")).alias("deviation"),
        )
        .groupBy("event_type")
        .agg(F.median("deviation").cast("double").alias("mad"))
    )
    # One combined 5-row stats table for the final pass: joining med and
    # mad separately would re-execute the deviation lineage inside the
    # mad build side — a fourth full fact scan for nothing.
    stats = med.join(mad, "event_type")
    dev = F.abs(F.col("value_cents") - F.col("med"))
    return (
        c.join(F.broadcast(stats), "event_type")
        .where(dev > 3 * F.col("mad"))
        .select("event_id", "event_type", "value_cents", dev.alias("deviation"))
    )


@query(
    "ts_event_transitions",
    # DuckDB's windowed sum(BIGINT) returns HUGEINT — cast before the
    # division; the probability is floor-scaled (integer/integer via
    # double is the same IEEE value in both engines, floor pins it).
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           floor(CAST(n AS DOUBLE)
                 / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE)
                 * 10000) / 10000 AS p
    FROM t
    """,
    tags=("timeseries", "markov", "funnel"),
)
def ts_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every (previous event type -> next event type) pair,
    its count and conditional probability.  The behavioral-analytics
    primitive behind funnel drop-off ("what follows a click?") and
    sequence-anomaly detection; ``funnel_stages`` checks one fixed
    path, this measures all 25 empirical edges at once.

    Physical shape: one shuffle on user_id for the lag window (ordered
    by (ts, event_id) — exact-microsecond deterministic), then pairs
    pre-aggregate map-side into a type-squared-sized table (25 cells
    here; bounded by |event vocabulary|^2 regardless of corpus size),
    and the conditional-probability window runs over those 25 rows.
    Nothing downstream of the lag scales with the data.
    """
    cat = Catalog(spark, sf_dir)
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = cat.events.select(
        "event_type",
        F.lag("event_type").over(w_seq).alias("prev_type"),
    )
    t = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    w_tot = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "next_type",
        "n",
        (
            F.floor(
                F.col("n").cast("double")
                / F.sum("n").over(w_tot).cast("double")
                * 10000
            )
            / 10000
        ).alias("p"),
    )


@query(
    "ts_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS x
      FROM events GROUP BY 1
    ),
    tot AS (SELECT count(*) AS n, sum(x) AS s FROM daily),
    pre AS (
      SELECT day, x,
             row_number() OVER (ORDER BY day) AS k,
             sum(x) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prefix
      FROM daily
    ),
    cu AS (
      SELECT day, CAST(x AS BIGINT) AS x,
             CAST(tot.n * pre.prefix - pre.k * tot.s AS BIGINT) AS cusum
      FROM pre, tot
    ),
    m AS (
      SELECT day, x, cusum,
             max(abs(cusum)) OVER () AS peak
      FROM cu
    )
    SELECT day, x, cusum,
           day = min(CASE WHEN abs(cusum) = peak THEN day END) OVER ()
             AS is_changepoint
    FROM m ORDER BY day
    """,
    tags=("timeseries", "stats"),
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily event-count series: the
    day where the cumulative deviation from the series mean peaks is
    the single most likely level-shift point (the classic offline CUSUM
    statistic).  Kept integer-exact by clearing the mean's denominator:
    CUSUM_k = Σ_{i≤k}(x_i − S/n) scaled by n is n·prefix_k − k·S — all
    BIGINT, no float anywhere, so the argmax (ties to the earliest day)
    is bit-stable at any scale factor.

    Scale shape: the only corpus-sized work is the per-day count
    (map-side combined, one shuffle); the CUSUM windows then run over
    the DAILY series, which is calendar-sized — a deliberately
    unpartitioned window over dim-sized data, the same tier as
    PageRank's rank state.  At 100 TB the daily rollup is what you'd
    checkpoint; the detector re-runs on it in milliseconds."""
    cat = Catalog(spark, sf_dir)
    # Calendar-sized: checkpointed so the corpus-sized count underneath
    # runs once, not once per derived branch (totals + prefix series) —
    # and, unlike cache(), nothing outlives the query in the
    # CacheManager (r8 audit; bit-identical at sf0.1).
    daily = (
        cat.events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint()
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    wo = Window.orderBy("day")
    pre = daily.select(
        "day",
        "x",
        F.row_number().over(wo).alias("k"),
        F.sum("x")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("prefix"),
    )
    cu = pre.crossJoin(F.broadcast(tot)).select(
        "day",
        F.col("x").cast("bigint").alias("x"),
        (F.col("n") * F.col("prefix") - F.col("k") * F.col("s"))
        .cast("bigint")
        .alias("cusum"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    peak = F.max(F.abs(F.col("cusum"))).over(wall)
    first_peak_day = F.min(
        F.when(F.abs(F.col("cusum")) == peak, F.col("day"))
    ).over(wall)
    return cu.select(
        "day", "x", "cusum", (F.col("day") == first_peak_day).alias("is_changepoint")
    ).orderBy("day")


@query(
    "sessionize_pattern_match",
    oracle="""
    WITH paths AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, day, path, CAST(n_events AS BIGINT) AS n_events
    FROM paths
    WHERE regexp_matches(path, 'click(>[a-z]+)*>purchase')
    ORDER BY user_id, day
    """,
    tags=("timeseries", "session", "pattern"),
)
def sessionize_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: per user-day session, serialize the
    event-type sequence into a path string ('view>click>...') and keep
    sessions where a click is EVENTUALLY followed by a purchase — the
    regex-over-event-sequences idiom that covers most funnel/pattern
    queries without a dedicated CEP operator (Spark has no
    MATCH_RECOGNIZE; a path string + RLIKE is the portable encoding).

    Determinism: the path is built from an array sorted by (ts,
    event_id) — sort_array on structs, the engine-side twin of the
    oracle's ``ORDER BY`` inside string_agg — so tie-stamped events
    serialize identically on both engines.  Scale shape: one shuffle
    on (user, day); each group folds to one path row, so the regex
    runs on session-count rows, not event-count.  Path length is
    bounded by session size (daily sessions here); a pathological hot
    session would cap the path, not the shuffle."""
    cat = Catalog(spark, sf_dir)
    path = F.array_join(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    return (
        cat.events.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(path.alias("path"), F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .where(F.col("path").rlike("click(>[a-z]+)*>purchase"))
        .orderBy("user_id", "day")
    )


@query(
    "ts_autocorr",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS x
      FROM events GROUP BY 1
    ),
    lagk AS (
      SELECT k.k,
             d.x AS x,
             lag(d.x, k.k) OVER (PARTITION BY k.k ORDER BY d.day) AS y
      FROM daily d CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS k) k
    ),
    s AS (
      SELECT k, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM lagk WHERE y IS NOT NULL GROUP BY 1
    )
    SELECT CAST(k AS INT) AS lag_days,
           CAST(n AS BIGINT) AS n_pairs,
           floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * 1e6) / 1e6 AS acf
    FROM s ORDER BY lag_days
    """,
    tags=("timeseries", "stats"),
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event-count series at lags
    1-7 days — the seasonality probe (a weekly cycle shows as a peak at
    lag 7).  Same engine-stable machinery as ``agg_regression``: the
    (x_t, x_{t-k}) pair moments are exact integer sums, so the Pearson
    formula runs once per lag on identical IEEE inputs (sqrt is
    correctly-rounded; no transcendentals).  Each lag uses its own
    pairwise-complete mean (the statistically honest variant when the
    series is short).  Scale shape: corpus work is the daily rollup
    (cached); the lag windows and moment sums run over calendar-sized
    data × 7 lags."""
    cat = Catalog(spark, sf_dir)
    # Checkpoint, not cache: same single corpus pass, no CacheManager
    # entry left behind (r8 audit; bit-identical at sf0.1).
    daily = (
        cat.events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint()
    )
    ks = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    # Spark's lag() needs a literal offset, so the per-lag shift is an
    # rn-offset self-join on the (tiny, cached) daily series instead of
    # a window per k.
    ord_ = daily.withColumn(
        "rn", F.row_number().over(Window.orderBy("day"))
    )
    prev = ord_.select(F.col("rn").alias("prn"), F.col("x").alias("y"))
    lagk = (
        ord_.crossJoin(F.broadcast(ks))
        .join(
            F.broadcast(prev),
            F.col("prn") == F.col("rn") - F.col("k"),
        )
    )
    # Second-order sums ride DECIMAL(38,0)/HUGEINT, like agg_regression:
    # daily counts near 2e9 square to ~4e18 per row — a BIGINT sum
    # overflows (wrapping silently under non-ANSI) within a year.
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    s = lagk.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx", "syy")
    )
    acf = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return s.select(
        F.col("k").cast("int").alias("lag_days"),
        F.col("n").cast("bigint").alias("n_pairs"),
        (F.floor(acf * 1e6) / 1e6).alias("acf"),
    ).orderBy("lag_days")


@query(
    "ts_ewma_fixed_point",
    # alpha = 1/4 as an integer recurrence: s_t = (3*s_{t-1} + x_t*SCALE) div 4,
    # s_0 = x_0*SCALE, SCALE = 1e6.  The oracle replays the same recurrence
    # with a recursive CTE over the day-ordered series.
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS x
      FROM events GROUP BY 1
    ),
    ord AS (
      SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    rec AS (
      SELECT day, x, rn, x * 1000000 AS s FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.day, o.x, o.rn, (3 * rec.s + o.x * 1000000) // 4
      FROM ord o JOIN rec ON o.rn = rec.rn + 1
    )
    SELECT day, CAST(x AS BIGINT) AS x, CAST(s AS BIGINT) AS ewma_fp
    FROM rec ORDER BY day
    """,
    tags=("timeseries", "recurrence"),
)
def ts_ewma_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily event counts as an
    INTEGER recurrence (alpha = 1/4, fixed-point scale 1e6): s_t =
    div(3·s_{t-1} + x_t·1e6, 4).  EWMA is the textbook sequential
    dependency — no window frame expresses it — and the float version
    is unverifiable cross-engine (every step compounds rounding).  The
    fixed-point form is bit-exact, so the DuckDB oracle can replay it
    with a recursive CTE and hash-match.

    Scale shape: the recurrence is inherently sequential, so it runs
    where sequential work belongs — on the CALENDAR-sIZED daily rollup,
    not the corpus: one corpus-sized count (map-side combined), then a
    single sorted fold via ``F.aggregate`` over the collected
    (day, x) series.  This is the same dim-sized-state tier as
    PageRank's rank table; the corpus never sees the loop."""
    cat = Catalog(spark, sf_dir)
    daily = cat.events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    # One row: the day-ordered series folded through the recurrence.
    # acc is an array of (day, x, s) structs built left-to-right.
    folded = daily.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("day", "x"))),
            F.expr(
                "CAST(array() AS ARRAY<STRUCT<day: DATE, x: BIGINT, s: BIGINT>>)"
            ),
            lambda acc, e: F.concat(
                acc,
                F.array(
                    F.struct(
                        e["day"].alias("day"),
                        e["x"].cast("bigint").alias("x"),
                        F.when(
                            F.size(acc) == 0, e["x"].cast("bigint") * 1_000_000
                        )
                        .otherwise(
                            # TRUE integer division: div-by-4 on the
                            # non-negative accumulator is shiftright 2,
                            # a pure BIGINT op.  (`/ 4` + cast would
                            # round-trip through DOUBLE and silently
                            # diverge from the oracle's `// 4` once
                            # 3*s + x*1e6 exceeds 2^53.)
                            F.shiftright(
                                3 * F.element_at(acc, -1)["s"]
                                + e["x"].cast("bigint") * 1_000_000,
                                2,
                            )
                        )
                        .alias("s"),
                    )
                ),
            ),
        ).alias("series")
    )
    return (
        folded.select(F.explode("series").alias("r"))
        .select(
            F.col("r.day").alias("day"),
            F.col("r.x").alias("x"),
            F.col("r.s").alias("ewma_fp"),
        )
        .orderBy("day")
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH fc AS (
      SELECT user_id, min(ts) AS first_click
      FROM events WHERE event_type = 'click' GROUP BY 1
    ),
    conv AS (
      SELECT fc.user_id,
             min(epoch_us(p.ts) - epoch_us(fc.first_click)) AS lat_us
      FROM fc JOIN events p
        ON p.user_id = fc.user_id
       AND p.event_type = 'purchase' AND p.ts >= fc.first_click
      GROUP BY 1
    ),
    base AS (SELECT count(*) AS n_users FROM fc),
    stats AS (
      SELECT count(*) AS n_converted,
             median(lat_us) AS med,
             quantile_cont(lat_us, 0.9) AS p90
      FROM conv
    )
    SELECT CAST(base.n_users AS BIGINT) AS n_users,
           CAST(stats.n_converted AS BIGINT) AS n_converted,
           CAST((stats.n_converted * 10000) // nullif(base.n_users, 0) AS BIGINT)
             AS conversion_bp,
           floor(stats.med / 1e6 * 100) / 100 AS median_latency_s,
           floor(stats.p90 / 1e6 * 100) / 100 AS p90_latency_s
    FROM base, stats
    """,
    tags=("timeseries", "funnel", "stats"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for each user, latency from their
    FIRST click to their first purchase at-or-after it; reported as
    conversion rate (integer basis points) plus median and p90 latency
    — the product-analytics summary next to ``funnel_stages`` (counts)
    and ``ts_event_transitions`` (paths).

    Exactness: latencies are integer microseconds, and both engines
    interpolate percentiles with the same (1−g)·a[j] + g·a[j+1]
    formula on those exact integers (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``), so the halves-only results floor-scale
    cleanly.  Scale shape: ONE events scan, ONE user-keyed shuffle,
    ONE global aggregate.  The old first-click-aggregate → purchase
    join → per-user min chain read events twice and re-derived the
    click subtree for the base count (a lineage diamond: 3 scans, 2
    joins — r8 plan audit); instead the per-user aggregate carries
    first_click plus the purchase-timestamp list, the at-or-after
    latency resolves in-row with ``array_min(transform(filter(...)))``
    (null click ⇒ null comparison ⇒ empty filter ⇒ null latency,
    exactly the join semantics), and because count/percentile all
    ignore nulls, base and stats fuse into a single global aggregate —
    no crossJoin, no diamond (bit-identical, −23% at sf0.1)."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events.where(F.col("event_type").isin("click", "purchase"))
    pu = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "first_click"
        ),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("purchases"),
    )
    lat = pu.select(
        "first_click",
        F.array_min(
            F.transform(
                F.filter("purchases", lambda p: p >= F.col("first_click")),
                lambda p: F.unix_micros(p) - F.unix_micros(F.col("first_click")),
            )
        ).alias("lat_us"),
    )
    return lat.agg(
        F.count("first_click").alias("_nu"),
        F.count("lat_us").alias("_nc"),
        F.expr("percentile(lat_us, 0.5D)").alias("_med"),
        F.expr("percentile(lat_us, 0.9D)").alias("_p90"),
    ).select(
        F.col("_nu").cast("bigint").alias("n_users"),
        F.col("_nc").cast("bigint").alias("n_converted"),
        # nullif: a corpus with zero click-users reports NULL rate, not
        # an ANSI DIVIDE_BY_ZERO (hypothesis-found empty-log edge).
        F.expr("CAST(div(_nc * 10000, nullif(_nu, 0)) AS BIGINT)").alias(
            "conversion_bp"
        ),
        (F.floor(F.col("_med") / 1e6 * 100) / 100).alias("median_latency_s"),
        (F.floor(F.col("_p90") / 1e6 * 100) / 100).alias("p90_latency_s"),
    )


@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH sparse AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS daily_cents
      FROM events GROUP BY 1, 2
    ),
    cal AS (
      SELECT event_type,
             CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM (SELECT event_type, min(day) AS mn, max(day) AS mx
            FROM sparse GROUP BY 1)
    ),
    daily AS (
      SELECT c.event_type, c.day,
             COALESCE(s.daily_cents, 0) AS daily_cents
      FROM cal c LEFT JOIN sparse s
        ON s.event_type = c.event_type AND s.day = c.day
    ),
    t AS (
      -- CAST: DuckDB windowed sum(BIGINT) returns HUGEINT; without the
      -- cast trend/seasonal/residual surface as float64/object on the
      -- driver's pandas-hash path (the ONE driver-red row of r9) even
      -- though the builder harness's multiset canonicalizer forgave the
      -- dtype.  The repo float-discipline rule: every window-sum output
      -- is cast back to BIGINT in the oracle.
      SELECT event_type, day, daily_cents,
             CASE WHEN count(*) OVER w = 7
                  THEN CAST(sum(daily_cents) OVER w // 7 AS BIGINT)
             END AS trend_cents
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    d AS (
      SELECT event_type, day, daily_cents, trend_cents,
             daily_cents - trend_cents AS detr,
             CAST(isodow(day) AS INT) AS dow
      FROM t
    )
    SELECT event_type, day, daily_cents, trend_cents, dow,
           CAST(CASE WHEN count(detr) OVER p > 0
                     THEN sum(detr) OVER p // count(detr) OVER p
                END AS BIGINT) AS seasonal_cents,
           CAST(detr - (CASE WHEN count(detr) OVER p > 0
                             THEN sum(detr) OVER p // count(detr) OVER p
                        END) AS BIGINT)
             AS residual_cents
    FROM d
    WINDOW p AS (PARTITION BY event_type, dow)
    """,
    tags=("timeseries", "window"),
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of the daily revenue series per
    event type: trend = centered 7-day moving average (full windows
    only), seasonal = per-day-of-week mean of the detrended series,
    residual = daily - trend - seasonal.

    The daily rollup is densified over each event type's full calendar
    span first (a zero-activity day IS a zero observation), so the
    7-row trend window always spans exactly 7 CALENDAR days — without
    the gap-fill a missing day would silently widen the window to
    non-adjacent days (r8 advisor finding; pinned on a gapped fixture
    in tests/test_properties.py).

    Exact-integer throughout (the repo's float discipline): daily
    totals are half-up cents, the two means are integer ``div`` —
    Spark ``div`` and DuckDB ``//`` BOTH truncate toward zero
    (verified on negative operands: -7 div 2 == -7 // 2 == -3), so
    the possibly-negative detrended means cannot diverge.  Day-of-week
    via ``weekday()+1`` == DuckDB ``isodow`` (1=Monday).

    Scale shape: one corpus-scale shuffle (the daily rollup groupBy);
    both window passes run on the rollup — O(days x event_types) rows,
    thousands at any corpus size — so the decomposition itself is
    free at 100 TB.  Trend/seasonal/residual are NULL on the 3-day
    series edges by design (no partial windows).
    """
    cat = Catalog(spark, sf_dir)
    # localCheckpoint: the rollup feeds BOTH the calendar-span aggregate
    # and the gap-fill join's probe side — without materialization that
    # lineage diamond plans as two full corpus scans (the r8 sweep's
    # defect class, reintroduced by densification and caught by the
    # plan pin).  The checkpoint holds O(days x event_types) rows.
    sparse = (
        cat.events.select(
            "event_type",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("daily_cents"))
        .localCheckpoint()
    )
    # densify: every calendar day in each type's span, gap-filled 0.
    # The calendar is O(days x event_types) rows — broadcast-trivial.
    cal = (
        sparse.groupBy("event_type")
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .select("event_type", F.explode(F.sequence("mn", "mx")).alias("day"))
    )
    daily = cal.join(sparse, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("daily_cents", F.lit(0)).alias("daily_cents"),
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    t = (
        daily.withColumn("s7", F.sum("daily_cents").over(w))
        .withColumn("n7", F.count(F.lit(1)).over(w))
        .withColumn("trend_cents", F.when(F.col("n7") == 7, F.expr("s7 div 7")))
        .drop("s7", "n7")
    )
    d = t.withColumn("detr", F.col("daily_cents") - F.col("trend_cents")).withColumn(
        "dow", (F.weekday("day") + 1).cast("int")
    )
    p = Window.partitionBy("event_type", "dow")
    return (
        d.withColumn("sd", F.sum("detr").over(p))
        .withColumn("nd", F.count("detr").over(p))
        .withColumn("seasonal_cents", F.when(F.col("nd") > 0, F.expr("sd div nd")))
        .select(
            "event_type",
            "day",
            "daily_cents",
            "trend_cents",
            "dow",
            "seasonal_cents",
            (F.col("detr") - F.col("seasonal_cents")).alias("residual_cents"),
        )
    )
