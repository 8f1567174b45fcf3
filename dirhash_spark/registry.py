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
#: new queries (all 50 r4 rows green except the 3 binary-output ERRs).
#: Round 5 fronts (a) the 3 binary-output queries re-projected to hex
#: STRINGs so the driver's pandas canonicalizer can hash them (the only
#: red r4 rows), then (b) every query whose NEWEST driver row is still
#: round-1 code — 41 queries; the r3 TIMESTAMP_NTZ incident proved
#: driver-config divergence is the one bug class the builder's own HEAD
#: sweep cannot catch, so no registry query's newest driver row may
#: predate r2 code after this rotation — then (c) the 5 stalest r2-code
#: rows (the dirhash columnar chain + the dedup anchors, including the
#: twice-noisy dedup_minhash) and the round-5-new distributed-IVF
#: query, which has no driver row yet.  Exactly 50 names.
#: Names not listed keep registration (insertion) order after these.
#: Every name listed here MUST exist in the registry — ``all_queries()``
#: raises otherwise (a silently skipped name is how coverage gaps hide).
#: tests/test_entry.py::test_window_covers_stalest_driver_rows enforces
#: the rotation policy against the committed CORRECTNESS_r*.json files.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) r4 driver ERRs (bytearray unhashable), now hex-projected
    "scan_fixed_binary",
    "scan_binary_file",
    "mm_frame_sample",
    # (b) newest driver row is r1 code — scans/sinks
    "scan_parquet",
    "scan_csv_infer",
    "sink_parquet",
    "project_rename",
    # joins
    "join_inner_hash",
    "join_broadcast",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta_range",
    # filters
    "filter_in_like",
    "filter_null",
    # aggregates
    "agg_count_distinct",
    "agg_approx_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "agg_stats",
    "agg_percentile",
    "agg_collect_sorted",
    # windows / ordering
    "win_rank",
    "win_lag_lead",
    "win_running",
    "win_moving_avg",
    "win_first_last",
    "win_percent_rank",
    "win_range_frame",
    "limit_topk",
    "topk_per_group",
    # set ops
    "set_union_all",
    "set_union_dist",
    "set_intersect",
    "set_except",
    # scalar functions
    "fn_string",
    "fn_math_cond",
    "fn_array",
    # dirhash rows-only exposures last touched r1
    "dirhash_chunk_digests",
    "dirhash_full",
    # (c) new this round (never driver-checked): distributed-trained
    # IVF, temperature resampling, forward as-of, and three of the
    # round-5 widening ops.  The r2-code anchors considered for these
    # slots (hash_sha2_text / merkle_fold_group / dedup_minhash) lost
    # the tiebreak: their r2 rows are green and golden-backed, while a
    # never-checked query has no driver row at all; the two widening
    # ops that didn't fit (agg_mode_median, fn_regexp_all) front at r6.
    "sim_ann_ivf_distfit",
    "corpus_temperature_sampling",
    "join_asof_forward",
    "merge_upsert",
    "dedup_containment",
    "ts_anomaly_mad",
)
# r6 rotation backlog (queries with no driver row after r5, all green in
# ORACLE_SNAPSHOT_r05 — tests/test_entry.py pins that invariant): the
# r5 widening batch (agg_regression, agg_corr_matrix, ts_cohort_retention,
# ts_rolling_distinct, graph_pagerank, graph_triangle_count,
# fn_aes_roundtrip, text_rarity_score, corpus_drift_chi2,
# stream_stream_join, stream_stream_left_outer, snapshot_diff,
# quality_expectations, join_asof_nearest, join_asof_tolerance,
# sim_maxsim_late_interaction, ts_changepoint_cusum, ts_event_transitions,
# sessionize_pattern_match, sample_balanced_classes,
# join_dynamic_partition_prune) plus the two r5 leftovers
# (agg_mode_median, fn_regexp_all).  These fill the r6 window's slack
# after the then-stale r2/r3-code rows take their mandatory slots.


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
