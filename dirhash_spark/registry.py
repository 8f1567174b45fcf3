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
#: backlog plus the 11 oldest r3 rows.  Round 8 (per the r7 plan):
#: (a) the 23 remaining r3-code rows — they hit MUST age 5 the moment
#: CORRECTNESS_r08 lands; (b) the 8 queries registered during r7
#: (never driver-checked; green in ORACLE_SNAPSHOT_r07{,_sf01} at both
#: scale factors); (c) 19 slack slots on the oldest r4-code rows,
#: MAY-front tier (age >= 3), taken alphabetically (first 19 of 47).
#: Exactly 50 names.
#: Names not listed keep registration (insertion) order after these.
#: Every name listed here MUST exist in the registry — ``all_queries()``
#: raises otherwise (a silently skipped name is how coverage gaps hide).
#: tests/test_entry.py::test_window_covers_stalest_driver_rows enforces
#: the rotation policy against the committed CORRECTNESS_r*.json files.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) the 23 r3-code rows — MUST tier at r8 close
    "fn_higher_order",
    "fn_url_parse",
    "fn_variant",
    "funnel_stages",
    "join_null_safe",
    "join_range_binned",
    "profile_columns",
    "sample_stratified",
    "scan_csv_dropmalformed",
    "scan_csv_permissive",
    "scan_parquet_schema_evolution",
    "scan_python_datasource",
    "sim_ann_ivf_indexed",
    "sim_ann_lsh_indexed",
    "sink_upsert_parquet",
    "sql_lateral_topk",
    "sql_recursive_cte",
    "text_common_ngrams",
    "text_pii_mask",
    "text_tfidf",
    "ts_gap_fill",
    "ts_resample_ohlc",
    "udtf_map_in_arrow",
    # (b) the 8 r7 registrations, never driver-checked
    "pipeline_neardup_e2e_lsh_union",
    "dedup_cluster_canonical_bigstar",
    "text_gopher_quality_rules",
    "sim_ann_pq",
    "stream_cdc_merge_upsert",
    "vocab_bpe_encode",
    "dirhash_incremental_rehash",
    "scan_xml",
    # (c) slack → pre-emptive rotation of the oldest r4-code rows
    # (age 4 = MAY-front tier; first 19 of 47 alphabetically)
    "agg_approx_percentile",
    "agg_basic",
    "agg_histogram",
    "blocksize_codec",
    "corpus_mixture_weights",
    "dirhash_verify",
    "embedding_quantize_int8",
    "filter_pred",
    "flagship_revenue_by_nation",
    "fn_collation",
    "fn_datetime",
    "fn_try_arith",
    "fn_xml_parse",
    "hash_string_codec",
    "join_asof",
    "join_asof_pairwise",
    "join_event_window",
    "maintenance_compact",
    "mm_feature_extract",
)
# r9 rotation backlog: after r8's window lands, the oldest driver rows
# are the 28 remaining r4-code queries (mm_meta_extract onward
# alphabetically: mm_meta_extract, mm_resize, pack_sequences,
# pipeline_incremental_refresh, query_observe_metrics,
# recursive_listing, scan_cached_branches, scd2_history,
# sessionize_batch, sink_time_travel, sort_multi, sql_correlated_exists,
# sql_scalar_subquery, stream_foreach_batch_sink,
# stream_python_datasource, stream_session, stream_sliding,
# stream_stateful_running, stream_static_join, stream_tumbling,
# stream_watermark_dedup, text_repetition_score, ts_interpolate_linear,
# ts_zscore, ts_zscore_window, udtf_cogroup_asof,
# udtf_group_apply_arrow, udtf_python_chunker) — they hit MUST age 5
# when CORRECTNESS_r09 lands — plus the queries registered during r8
# (sim_ann_ivfpq, dedup_embedding_ann, pipeline_semdedup_e2e,
# ts_seasonal_decompose, text_perplexity_bigram,
# corpus_quality_filter_funnel — each green in ORACLE_SNAPSHOT_r08 at
# registration), with remaining slack on the oldest r5 rows.  Backlog
# arithmetic after the r8 registrations: 234 registered = 23 (r3, this
# window) + 8 (r7 regs, this window) + 19 (r4, this window) + 28 (r4
# remainder, r9 MUST) + 50 (r5) + 50 (r6) + 50 (r7) + 6 (r8
# registrations, r9 fill) — every query has either a driver row or a
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
