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
#: plus 10 never-checked.  Round 7: the MUST-front stale set is empty
#: (age histogram after r6: 34×r3, 47×r4, 50×r5, 50×r6), so per the
#: two-tier contract the whole window drains backlog: (a) all 39
#: never-checked queries (the 28-query r5 backlog + the 11 r6
#: registrations), then (b) 11 slack slots on the oldest driver rows —
#: r3-code rows, MAY-front tier (age >= 3), taken alphabetically.
#: Exactly 50 names.
#: Names not listed keep registration (insertion) order after these.
#: Every name listed here MUST exist in the registry — ``all_queries()``
#: raises otherwise (a silently skipped name is how coverage gaps hide).
#: tests/test_entry.py::test_window_covers_stalest_driver_rows enforces
#: the rotation policy against the committed CORRECTNESS_r*.json files.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) never-checked: the 28 queries registered by r5 whose rows
    # never fit a window...
    "agg_boolean",
    "agg_corr_matrix",
    "agg_grouping_id",
    "agg_listagg",
    "corpus_cross_source_overlap",
    "fn_aes_roundtrip",
    "fn_surrogate_key",
    "funnel_time_to_convert",
    "graph_triangle_count",
    "join_asof_tolerance",
    "join_dynamic_partition_prune",
    "pipeline_training_export",
    "sample_balanced_classes",
    "scan_csv_multiline",
    "scan_nested_pruning",
    "sessionize_pattern_match",
    "set_except_all",
    "set_intersect_all",
    "snapshot_diff",
    "sql_exchange_reuse",
    "stream_stream_left_outer",
    "text_rarity_score",
    "ts_autocorr",
    "ts_changepoint_cusum",
    "ts_event_transitions",
    "ts_ewma_fixed_point",
    "ts_rolling_distinct",
    "udf_python_arrow",
    # ...plus the 11 registered during r6 (green in
    # ORACLE_SNAPSHOT_r06{,_sf01} at both scale factors)
    "pipeline_neardup_e2e",
    "dedup_bloom_manifest",
    "dedup_bloom_probe",
    "dedup_verbatim_runs",
    "text_chunk_sliding",
    "text_surprisal_bits",
    "corpus_vocab_coverage",
    "text_winnow_fingerprints",
    "vocab_bpe_merges",
    "sink_csv_roundtrip",
    "stream_bloom_ingest_gate",
    # (b) slack → pre-emptive rotation of the oldest driver rows (r3
    # code, age 3 = MAY-front tier; first 11 of 34 alphabetically)
    "agg_approx_top_k",
    "agg_bitmap_distinct",
    "agg_filtered",
    "agg_hll_sketch_merge",
    "csv_corrupt_records",
    "decontaminate_ngram_overlap",
    "dedup_cluster_canonical",
    "dedup_incremental",
    "dedup_levenshtein",
    "dedup_url_canonical",
    "dirhash_tree_fold",
)
# r8 rotation backlog: after r7's window lands, the oldest rows are the
# 23 remaining r3-code queries — fn_higher_order, fn_url_parse,
# fn_variant, funnel_stages, join_null_safe, join_range_binned,
# profile_columns, sample_stratified, scan_csv_dropmalformed,
# scan_csv_permissive, scan_parquet_schema_evolution,
# scan_python_datasource, sim_ann_ivf_indexed, sim_ann_lsh_indexed,
# sink_upsert_parquet, sql_lateral_topk, sql_recursive_cte,
# text_common_ngrams, text_pii_mask, text_tfidf, ts_gap_fill,
# ts_resample_ohlc, udtf_map_in_arrow — which become MUST-front (age 5)
# when CORRECTNESS_r08 lands, so the r8 window takes all 23 plus the
# eight queries registered during r7 (pipeline_neardup_e2e_lsh_union,
# dedup_cluster_canonical_bigstar, text_gopher_quality_rules,
# sim_ann_pq, stream_cdc_merge_upsert, vocab_bpe_encode,
# dirhash_incremental_rehash, scan_xml — all green in
# ORACLE_SNAPSHOT_r07{,_sf01}), then the oldest r4-code rows.  Backlog
# arithmetic: 228 registered = 39 (r7 window never-checked) + 11 (r7
# window r3 rows) + 23 (r8 must) + 8 (r7 registrations, r8 fill) + 47
# (r4) + 100 (r5/r6) — every query has either a driver row or a dated
# slot here.


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
