"""Operator modules — importing this package populates the query registry.

Module map (SURVEY.md §2 rows in parentheses):
  scans.py             B1-B4  scans/sources/sinks/projection + flagship
  filters.py           B5-B7  predicates, IN/LIKE/BETWEEN, null semantics
  joins.py             B8-B16 equi/broadcast/outer/semi/anti/cross/theta/asof
  aggregates.py        B17-B23 hash agg, distinct, HLL, rollup/cube/sets, having
  windows.py           B24-B30 ranking/analytic/frames, sorts, top-k
  setops.py            B31-B33 union/intersect/except
  functions.py         B34-B38 string/datetime/math/array/JSON scalar fns
  dirhash_columnar.py  B39-B41 columnar twins of the reference pipeline
  dedup.py             B42-B43 + simhash / ngram-jaccard / embedding near-dup
  similarity.py        B44 + LSH-bucketed ANN
  text.py              B45 + lang-id / quality / token counting / fingerprint
  udfs.py              B46-B48 UDF / pandas-UDAF / mapInPandas UDTF surface
  event_windows.py     B49-B52 event-time windows (batch-checkable forms)
  multimodal.py        binary-column plumbing (decode stub, frame sampling)
  codec_queries.py     A8-A10 codec + verify exposure
  joins_extra.py       scale-path as-of join (merge-sorted union form)
  sources_extra.py     JSON/ORC/partitioned/bucketed sources and sinks
  skew.py              salted two-phase distinct + salted hot-key join
  reshape.py           pivot / unpivot / lateral explode / hash sampling
  timeseries.py        batch sessionization (gaps-and-islands) + OHLC bars
  subqueries.py        SQL-text surface: correlated EXISTS / scalar subqueries
  warehouse.py         batch MERGE (broadcast CDC apply)
  analytics.py         regression/corr sufficient-statistics aggs, cohort
                       retention, rolling distinct, fixed-point PageRank,
                       AES round-trip, corpus rarity scoring
"""

from . import (  # noqa: F401
    scans,
    dirhash_pipeline,
    filters,
    joins,
    aggregates,
    windows,
    setops,
    functions,
    dirhash_columnar,
    dedup,
    similarity,
    text,
    udfs,
    event_windows,
    multimodal,
    codec_queries,
    joins_extra,
    sources_extra,
    skew,
    reshape,
    timeseries,
    subqueries,
    warehouse,
    analytics,
)
from ..streaming import stateful  # noqa: E402,F401  (registers stream_stateful_running)
