"""Empty-input semantics: a query over a zero-row corpus returns a
zero-row (or trivially-reduced) result — it does not crash.

A 100 TB deployment hits empty inputs constantly (a new partition, a
fully-filtered branch, a source that hasn't landed yet); "empty in,
empty out" has to be a property of the engine, not luck.  The round-9
full-registry sweep ran all 237 queries against 0-row copies of every
table: 226 were already graceful, 11 crashed in two classes — ANN
trainers sampling an empty corpus (np.random.choice on 0 rows /
IndexError on missing dims) and parquet read-back after a 0-row
partitioned write (no data files ⇒ UNABLE_TO_INFER_SCHEMA).  All 11
are fixed (trainers return None and queries short-circuit to typed
empty frames; read-backs pass the written schema explicitly); this
test keeps the fixed set plus a representative slice of the always-
graceful classes pinned.
"""

from __future__ import annotations

import pytest

from dirhash_spark.registry import all_queries

#: The 11 queries the r9 sweep found crashing on empty input.
FIXED = [
    "sim_ann_ivf",
    "sim_ann_ivf_distfit",
    "sim_ann_ivf_indexed",
    "sim_ann_lsh_indexed",
    "sim_ann_pq",
    "sim_ann_ivfpq",
    "dedup_embedding_ann",
    "pipeline_semdedup_e2e",
    "pipeline_training_export",
    "sink_parquet_partitioned",
    "join_dynamic_partition_prune",
]

#: One representative per always-graceful class, so a regression in a
#: shared helper (catalog load, window, Arrow batch plumbing) trips too.
REPRESENTATIVE = [
    "flagship_revenue_by_nation",  # join + agg
    "win_running",                 # window
    "dedup_exact",                 # hash groupBy
    "text_span_dedup",             # explode + global window + reassembly
    "embedding_pca",               # driver-reduced moment partials
    "corpus_dsir_importance",      # vocab checkpoint + score join
    "ts_seasonal_decompose",       # checkpointed rollup + densify
    "mm_meta_extract",             # Arrow binary batch
]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    import pyarrow.parquet as pq

    from dirhash_spark.catalog import TABLE_NAMES

    dst = tmp_path_factory.mktemp("empty_sf")
    for t in TABLE_NAMES:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(schema.empty_table(), str(dst / f"{t}.parquet"))
    return str(dst)


@pytest.mark.parametrize("name", FIXED + REPRESENTATIVE)
def test_empty_corpus_is_graceful(spark, empty_sf, name):
    rows = all_queries()[name].fn(spark, empty_sf).collect()
    assert rows == []
