"""Query registry backing ``__spark_entry__``.

Each operator from SURVEY.md §2 registers one named query: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the equivalent
ANSI SQL a DuckDB oracle can run on the same parquet tables.  Operators
without an exact SQL oracle (approximate sketches, UDF-opaque or stateful
ops) register ``oracle=None`` and get a rows-only check.

Contract details that live here so every operator honors them:
- column names must match between the Spark result and the oracle SQL
  (the comparison sorts columns by name before hashing values);
- floating-point outputs are rounded *inside* the query on both sides
  (summation order differs between engines; rounding makes values
  bit-comparable).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


#: name -> Query; populated by importing dirhash_spark.operators.
REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering an operator query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


#: Names pinned to the FRONT of ``all_queries()`` order, in this order.
#: The external driver's CORRECTNESS run verifies a prefix window of the
#: registry (50 entries per round), so we rotate which queries appear
#: first.  Rounds 1-3 covered the relational / dedup+text+streaming /
#: codec+asof+SQL slices; round 4 fronted the never-checked + fixed +
#: new queries; round 5 fronted the hex-projected binary outputs plus
#: every remaining r1-code row; round 6 re-fronted the 40 r2-code rows
#: plus 10 never-checked; round 7 drained the 39-query never-checked
#: backlog plus the 11 oldest r3 rows; round 8 drained the 23 remaining
#: r3 rows, the 8 r7 registrations, and the first 19 r4 rows.  Round 9
#: (per the r8 plan): (a) the 28 remaining r4-code rows — they hit MUST
#: age 5 the moment CORRECTNESS_r09 lands; (b) the 6 queries registered
#: during r8 (never driver-checked; green in ORACLE_SNAPSHOT_r08{,_sf01}
#: at both scale factors); (c) 16 slack slots on the oldest r5-code
#: rows, MAY-front tier (age >= 3), taken alphabetically (first 16 of
#: 50).  Exactly 50 names.
#: Names not listed keep registration (insertion) order after these.
#: Every name listed here MUST exist in the registry — ``all_queries()``
#: raises otherwise (a silently skipped name is how coverage gaps hide).
#: tests/test_entry.py::test_window_covers_stalest_driver_rows enforces
#: the rotation policy against the committed CORRECTNESS_r*.json files.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) the 28 remaining r4-code rows — MUST tier at r9 close
    "mm_meta_extract",
    "mm_resize",
    "pack_sequences",
    "pipeline_incremental_refresh",
    "query_observe_metrics",
    "recursive_listing",
    "scan_cached_branches",
    "scd2_history",
    "sessionize_batch",
    "sink_time_travel",
    "sort_multi",
    "sql_correlated_exists",
    "sql_scalar_subquery",
    "stream_foreach_batch_sink",
    "stream_python_datasource",
    "stream_session",
    "stream_sliding",
    "stream_stateful_running",
    "stream_static_join",
    "stream_tumbling",
    "stream_watermark_dedup",
    "text_repetition_score",
    "ts_interpolate_linear",
    "ts_zscore",
    "ts_zscore_window",
    "udtf_cogroup_asof",
    "udtf_group_apply_arrow",
    "udtf_python_chunker",
    # (b) the 6 r8 registrations, never driver-checked
    "sim_ann_ivfpq",
    "dedup_embedding_ann",
    "pipeline_semdedup_e2e",
    "ts_seasonal_decompose",
    "text_perplexity_bigram",
    "corpus_quality_filter_funnel",
    # (c) slack → pre-emptive rotation of the oldest r5-code rows
    # (age 4 = MAY-front tier; first 16 of 50 alphabetically)
    "agg_approx_distinct",
    "agg_collect_sorted",
    "agg_count_distinct",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "agg_percentile",
    "agg_rollup",
    "agg_stats",
    "corpus_temperature_sampling",
    "dedup_containment",
    "dirhash_chunk_digests",
    "dirhash_full",
    "filter_in_like",
    "filter_null",
    "fn_array",
)
# r10 rotation backlog: after r9's window lands, the oldest driver rows
# are the 34 remaining r5-code queries (the 50 r5 rows minus the 16
# fronted above: fn_math_cond, fn_string, join_anti, join_asof_forward,
# join_broadcast, join_cross, join_full_outer, join_inner_hash,
# join_left_outer, join_semi, join_theta_range, limit_topk,
# merge_upsert, mm_frame_sample, project_rename, scan_binary_file,
# scan_csv_infer, scan_fixed_binary, scan_parquet, set_except,
# set_intersect, set_union_all, set_union_dist, sim_ann_ivf_distfit,
# sink_parquet, topk_per_group, ts_anomaly_mad, win_first_last,
# win_lag_lead, win_moving_avg, win_percent_rank, win_range_frame,
# win_rank, win_running) — they hit MUST age 5 when CORRECTNESS_r10
# lands —
# plus the queries registered during r9 (text_span_dedup,
# corpus_dsir_importance, embedding_pca — green in ORACLE_SNAPSHOT_r09
# at registration), with remaining slack on the oldest r6 rows.
# Backlog arithmetic after r9's window: 237 registered = 28 (r4, this
# window) + 6 (r8 regs, this window) + 16 (r5, this window) + 34 (r5
# remainder, r10 MUST) + 50 (r6) + 50 (r7) + 50 (r8) + 3 (r9
# registrations, r10 fill) — every query has either a driver row or a
# dated slot here.


def all_queries() -> dict[str, Query]:
    """Import all operator modules and return the populated registry,
    reordered so :data:`PRIORITY_ORDER` names come first (see its doc).

    Raises ValueError if a PRIORITY_ORDER name is not registered: an
    unknown name means a planned query was never implemented (or a
    rename went stale), and silently skipping it would quietly drop the
    intended verification coverage.
    """
    from . import operators  # noqa: F401  (import populates REGISTRY)

    unknown = [name for name in PRIORITY_ORDER if name not in REGISTRY]
    if unknown:
        raise ValueError(f"PRIORITY_ORDER names not in registry: {unknown}")
    ordered: dict[str, Query] = {}
    for name in PRIORITY_ORDER:
        ordered[name] = REGISTRY[name]
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered
