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
#: every remaining r1-code row.  Round 6 fronts (a) the 40 queries
#: whose newest driver row is r2 code — now three rounds behind, the
#: mandatory stale set under tests/test_entry.py's rotation guard —
#: then (b) 10 slack slots drained from the never-checked backlog,
#: starting with the two r5 leftovers (agg_mode_median, fn_regexp_all)
#: the r5 comment promised would front.  Exactly 50 names.
#: Names not listed keep registration (insertion) order after these.
#: Every name listed here MUST exist in the registry — ``all_queries()``
#: raises otherwise (a silently skipped name is how coverage gaps hide).
#: tests/test_entry.py::test_window_covers_stalest_driver_rows enforces
#: the rotation policy against the committed CORRECTNESS_r*.json files.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) newest driver row is r2 code — the dirhash columnar chain
    "hash_sha2_text",
    "chunk_split_text",
    "merkle_fold_group",
    # dedup family anchors
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    # similarity anchors
    "sim_topk_cosine",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_knn_join",
    # text anchors
    "text_tokens",
    "text_token_count",
    "text_lang_id",
    "text_quality",
    "text_fingerprint",
    # UDF surfaces
    "udf_python",
    "udaf_pandas",
    "udtf_map_in_pandas",
    # scans / sinks / layout family
    "scan_json_lines",
    "scan_text_lines",
    "sink_orc",
    "sink_parquet_partitioned",
    "sink_parquet_clustered",
    "sink_parquet_zorder",
    # joins (physical strategies)
    "join_bucketed",
    "join_skew_salted",
    # aggregates / reshape
    "agg_pivot",
    "agg_skew_salted",
    "reshape_unpivot",
    "reshape_posexplode",
    # functions
    "fn_json",
    "fn_map",
    "fn_struct_nested",
    "fn_bitwise",
    "fn_interval",
    # corpus ops
    "sample_hash_deterministic",
    "pipeline_corpus_curation",
    # (b) slack → never-checked backlog (38 waiting; these 10 front,
    # the rest are enumerated below for r7)
    "agg_mode_median",
    "fn_regexp_all",
    "agg_regression",
    "graph_pagerank",
    "stream_stream_join",
    "ts_cohort_retention",
    "quality_expectations",
    "join_asof_nearest",
    "sim_maxsim_late_interaction",
    "corpus_drift_chi2",
)
# r7 rotation backlog (queries with no driver row after r6, all green in
# ORACLE_SNAPSHOT_r06 — tests/test_entry.py pins that invariant):
# agg_boolean, agg_corr_matrix, agg_grouping_id, agg_listagg,
# corpus_cross_source_overlap, fn_aes_roundtrip, fn_surrogate_key,
# funnel_time_to_convert, graph_triangle_count, join_asof_tolerance,
# join_dynamic_partition_prune, pipeline_training_export,
# sample_balanced_classes, scan_csv_multiline, scan_nested_pruning,
# sessionize_pattern_match, set_except_all, set_intersect_all,
# snapshot_diff, sql_exchange_reuse, stream_stream_left_outer,
# text_rarity_score, ts_autocorr, ts_changepoint_cusum,
# ts_event_transitions, ts_ewma_fixed_point, ts_rolling_distinct,
# udf_python_arrow — plus the eleven queries registered during r6
# (pipeline_neardup_e2e, dedup_bloom_manifest, dedup_bloom_probe,
# dedup_verbatim_runs, text_chunk_sliding, text_surprisal_bits,
# corpus_vocab_coverage, text_winnow_fingerprints, vocab_bpe_merges,
# sink_csv_roundtrip, stream_bloom_ingest_gate; all green in
# ORACLE_SNAPSHOT_r06{,_sf01}).  These fill the r7 window's slack
# after the then-stale rows take their slots.  NOTE the rotation
# contract changed in r6 (tests/test_entry.py): at 217 queries the
# 50-slot window re-checks each query every ~5 rounds, so MUST-front
# is now age >= 5 and slots MAY also go to rows aged >= 3 —
# the r7 window should take every never-checked query first, then the
# oldest r3-code rows pre-emptively.


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
