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
#: first.  Round 1 verified the relational surface; round 2 the dedup/
#: similarity/text/UDF/streaming/sink/skew surface.  Round 3 fronts
#: (a) the 7 queries that have never had a driver row, (b) the queries
#: added or renamed this round, then (c) a re-verification slice of the
#: round-1 relational core at the current code state, so the green wall
#: stops being a union across two old code snapshots.
#: Names not listed keep registration (insertion) order after these.
#: Every name listed here MUST exist in the registry — ``all_queries()``
#: raises otherwise (a silently skipped name is how coverage gaps hide).
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) never inside a driver window in rounds 1-2
    "hash_string_codec",
    "blocksize_codec",
    "dirhash_verify",
    "mm_resize",
    "mm_feature_extract",
    "scan_binary_file",
    "stream_watermark_dedup",
    # (b) new/renamed in round 3
    "scan_csv_permissive",
    "scan_csv_dropmalformed",
    "csv_corrupt_records",
    "dirhash_tree_fold",
    "join_asof",           # scale-safe merge form (renamed this round)
    "join_asof_pairwise",  # equivalence witness (old join+prune form)
    "sim_ann_ivf_indexed",  # persisted index, partition-pruned nprobe
    "sim_ann_lsh_indexed",  # persisted signatures, no per-query recompute
    "dedup_cluster_canonical",  # CC clustering over near-dup pairs
    "join_range_binned",    # big-big interval join via day-bin explosion
    "scan_parquet_schema_evolution",  # mergeSchema over mixed-schema batches
    "dedup_incremental",    # batch-vs-corpus hash-manifest dedup
    "fn_higher_order",      # lambda surface (transform/filter/aggregate/exists)
    "ts_gap_fill",          # densify hour grid + LOCF forward fill
    "fn_variant",           # Spark-4 VARIANT encode/extract round-trip
    "udtf_map_in_arrow",    # Arrow-tier table function (1→N)
    "sessionize_batch",     # gaps-and-islands sessions w/ per-session metrics
    "ts_resample_ohlc",     # hourly OHLC bars via min_by/max_by(struct)
    "agg_bitmap_distinct",  # exact distinct via mergeable bitmaps
    "agg_hll_sketch_merge", # two-level HLL sketch rollup (rows-only)
    "agg_approx_top_k",     # frequent-items sketch, exact-regime oracle
    "agg_filtered",         # FILTER-clause conditional aggregation
    "text_tfidf",           # top-3 tf-idf terms per document
    "text_pii_mask",        # email/phone detection + masking digest
    "dedup_levenshtein",    # blocked edit-distance near-dup verifier
    "join_null_safe",       # <=> join stays a hash join
    "decontaminate_ngram_overlap",  # train/eval 8-gram leakage check
    "text_common_ngrams",   # boilerplate 5-gram phrase mining
    "join_event_window",    # event-to-tumbling-window enrichment join
    "sample_stratified",    # exact per-stratum rate sampling
    "ts_zscore",            # per-group standardization (outlier channel)
    "fn_url_parse",         # URL component extraction + host rollup
    # (c) late-round-3 additions — never had a driver row; the 9 that
    # don't fit the 50-slot window (sql_correlated_exists,
    # sql_scalar_subquery, text_repetition_score, corpus_mixture_weights,
    # agg_histogram, maintenance_compact, fn_xml_parse,
    # udtf_group_apply_arrow, fn_try_arith) roll to round 4; ALL queries
    # are oracle-verified at one commit in ORACLE_SNAPSHOT_r03*.json,
    # which also supersedes the round-1 re-verification slice this
    # section previously held (full-registry sweep at HEAD > 11 cherry-
    # picked driver rows).
    "sql_recursive_cte",    # Spark-4 WITH RECURSIVE frontier walk
    "sql_lateral_topk",     # correlated LATERAL LIMIT → window rank
    "scan_python_datasource",  # custom Python DataSource, 8 splits
    "udtf_cogroup_asof",    # cogrouped applyInPandas + merge_asof
    "stream_static_join",   # stream-static broadcast enrichment
    "ts_interpolate_linear",  # linear interpolation across hour gaps
    "dedup_url_canonical",  # crawl URL canonicalization dedup
    "funnel_stages",        # ordered signup→click→purchase funnel
    "profile_columns",      # per-column null/distinct/min/max profile
    "sink_upsert_parquet",  # merge/upsert sink (round-1 row predates fix-ups)
    "flagship_revenue_by_nation",  # anchor: also the entry() smoke
)


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
