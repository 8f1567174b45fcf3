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
  bit-comparable);
- construction is NOT guaranteed side-effect free: the index- and
  parameter-deriving ops (``sim_ann_ivfpq``, the ``*_indexed`` ANN
  forms, ``dedup_simhash``, ``dedup_embedding_ann``) do bounded work
  at query-construction time — index build for the indexed forms, one
  cached corpus row count per sf_dir for the derived-sizing rules
  (answered from local parquet footers without a Spark job where
  possible; a distributed count on non-local layouts) — see SURVEY
  §2.C's eager-construction note.
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
#: r3 rows, the 8 r7 registrations, and the first 19 r4 rows; round 9
#: drained the 28 remaining r4 rows, the 6 r8 registrations, and the
#: first 16 r5 rows; round 10 drained the 34 remaining r5 rows, the
#: r9 driver-red ``ts_seasonal_decompose`` (confirmed green), the 3 r9
#: registrations, and the first 12 r6 rows; round 11 drained the 38
#: remaining r6 rows, the 2 r10 registrations, and the first 10
#: r7-code rows (alphabetical); round 12 drained the 40 remaining
#: r7-code rows plus the first 10 r8-code rows (alphabetical); round
#: 13 drained the 40 remaining r8-code rows plus the first 10 r9-code
#: rows (alphabetical).  Round 14 (per the r13 plan): (a) the 39
#: remaining r9-code rows — they hit MUST age 5 the moment
#: CORRECTNESS_r14 lands (r13 registered NO new queries, so there is
#: no never-checked tier this round); (b) 11 slack slots on the
#: oldest r10-code rows, MAY-front tier (age >= 4 at r14 close),
#: taken alphabetically (first 11 of 50).  Exactly 50 names.
#: Names not listed keep registration (insertion) order after these.
#: Every name listed here MUST exist in the registry — ``all_queries()``
#: raises otherwise (a silently skipped name is how coverage gaps hide).
#: tests/test_entry.py::test_window_covers_stalest_driver_rows enforces
#: the rotation policy against the committed CORRECTNESS_r*.json files.
PRIORITY_ORDER: tuple[str, ...] = (
    # (a) the 39 remaining r9-code rows — MUST tier at r14 close
    "corpus_temperature_sampling",
    "dedup_containment",
    "dedup_embedding_ann",
    "dirhash_chunk_digests",
    "dirhash_full",
    "filter_in_like",
    "filter_null",
    "fn_array",
    "mm_meta_extract",
    "mm_resize",
    "pack_sequences",
    "pipeline_incremental_refresh",
    "pipeline_semdedup_e2e",
    "query_observe_metrics",
    "recursive_listing",
    "scan_cached_branches",
    "scd2_history",
    "sessionize_batch",
    "sim_ann_ivfpq",
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
    "text_perplexity_bigram",
    "text_repetition_score",
    "ts_interpolate_linear",
    "ts_zscore",
    "ts_zscore_window",
    "udtf_cogroup_asof",
    "udtf_group_apply_arrow",
    "udtf_python_chunker",
    # (b) slack → pre-emptive rotation of the oldest r10-code rows
    # (age 4 at r14 close = MAY-front tier; first 11 of 50
    # alphabetically)
    "agg_mode_median",
    "agg_pivot",
    "agg_regression",
    "agg_skew_salted",
    "chunk_split_text",
    "corpus_drift_chi2",
    "corpus_dsir_importance",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_minhash",
)
# r15 rotation backlog: after r14's window lands, the oldest driver rows
# are the 39 remaining r10-code queries (the 50 r10 rows minus the 11
# fronted above; alphabetically they run dedup_ngram_jaccard ...
# through the rest of the r10 cohort) — they hit MUST age 5 when
# CORRECTNESS_r15 lands — with remaining slack on the oldest r11 rows
# and any queries registered during r14.
# Backlog arithmetic after r14's window: 239 registered = 39 (r9
# remainder, this window) + 11 (r10, this window) + 39 (r10 remainder,
# r15 MUST) + 50 (r11) + 50 (r12) + 50 (r13) — every query has either
# a driver row or a dated slot here.


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
