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
#: similarity/text/UDF/streaming/sink/skew surface; round 3 the codec/
#: asof/time-series/SQL-surface slice.  Round 4 fronts (a) the 11
#: queries that have NEVER had a driver row in any round, (b) the 4
#: queries whose r3 rows were hard ERRs, now fixed (the TIMESTAMP_NTZ
#: catalog normalization + the mm_feature_extract hashable reshape),
#: (c) queries whose code or input dtypes changed this round (join_asof
#: lost its per-operator NTZ casts; every streaming query consumes the
#: retyped events.ts), then (d) a re-verification slice of the round-1
#: relational core — chosen to favor timestamp consumers, since
#: o_orderdate/l_shipdate/ts all changed from TIMESTAMP_NTZ to TIMESTAMP
#: at the catalog this round.
#: Names not listed keep registration (insertion) order after these.
#: Every name listed here MUST exist in the registry — ``all_queries()``
#: raises otherwise (a silently skipped name is how coverage gaps hide).
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) never inside any driver window (rounds 1-3)
    "sql_correlated_exists",
    "sql_scalar_subquery",
    "agg_histogram",
    "fn_xml_parse",
    "fn_try_arith",
    "text_repetition_score",
    "corpus_mixture_weights",
    "maintenance_compact",
    "udtf_group_apply_arrow",
    "pipeline_incremental_refresh",
    "scan_cached_branches",
    # (b) r3 hard ERRs, fixed this round
    "sessionize_batch",       # was: unix_micros over NTZ ts
    "join_event_window",      # same
    "ts_interpolate_linear",  # same (window() over NTZ)
    "mm_feature_extract",     # was: unhashable array cells; now exploded + oracle
    # (c) code/dtype changed this round
    "join_asof",              # per-operator NTZ casts removed (catalog owns it)
    "join_asof_pairwise",     # equivalence witness, same inputs
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_watermark_dedup",  # + NEW exact oracle (counts are deterministic)
    "stream_stateful_running",
    "stream_foreach_batch_sink",
    "stream_static_join",
    "stream_python_datasource",  # NEW: streaming Python DataSource (r4)
    "embedding_quantize_int8",   # NEW: int8 PTQ of the embedding column (r4)
    "scd2_history",              # NEW: SCD type-2 validity intervals (r4)
    "fn_collation",              # NEW: UTF8_LCASE collation grouping (r4)
    "pack_sequences",            # NEW: token-budget training-bin packing (r4)
    "udtf_python_chunker",       # NEW: class-based @udtf via SQL LATERAL (r4)
    "query_observe_metrics",     # NEW: df.observe one-pass metrics (r4)
    "sink_time_travel",          # NEW: manifest-versioned snapshots (r4)
    "dirhash_verify",            # r4: golden-pinned oracle (was rows-only)
    "agg_approx_percentile",     # r4: exact-regime oracle (was rows-only)
    "ts_zscore",              # now the broadcast two-pass form
    "ts_zscore_window",       # NEW equivalence witness (same oracle)
    "udtf_cogroup_asof",      # now bucketed (64-way) instead of per-user
    # (e) rows-only → exact-oracle flips this round: the driver can now
    # hash-verify what it previously only counted
    "mm_meta_extract",        # sha256-derived fake decode restated in SQL
    "mm_resize",              # same + half-up resize math on both sides
    "mm_frame_sample",        # positional slices via hex/unhex in DuckDB
    "hash_string_codec",      # v1 grammar rebuilt in SQL from the domain
    "blocksize_codec",        # blocksize rules re-implemented in SQL
    "scan_binary_file",       # read_blob as the independent reader
    "recursive_listing",      # dirs reconstructed from file-path prefixes
    "scan_fixed_binary",      # independent positional chunker
    # (d) round-1 relational core at current code, timestamp consumers
    # first (the dropped r1 queries keep their green r1 rows)
    "flagship_revenue_by_nation",  # anchor: also the entry() smoke
    "fn_datetime",
    "filter_pred",
    "sort_multi",
    "agg_basic",
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
