#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints TWO JSON lines — a compact totals line first (truncation
insurance for fixed-size tail captures), then the FULL record LAST,
because the driver parses the final JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "extra_queries": {...},
   "sf": <scale factor>, ...}

Each query is forced end-to-end with a noop sink (full execution, no
driver collect bottleneck, mirroring a cluster write).  Every query runs
twice and the second run is timed (JMH-style steady state): the first
execution pays one-time plan compilation + whole-stage codegen class
generation (~1-4 s each, measured 5x the execution cost at sf0.1), a
cost that amortizes to zero on real workloads where a plan runs over
TBs, so steady-state is the number that predicts cluster throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "flagship_revenue_by_nation",
    "agg_basic",
    "join_inner_hash",
    "join_broadcast",
    "join_asof",           # scale-safe merge form (renamed in round 3)
    "join_asof_pairwise",  # pairwise witness (was "join_asof" pre-rename)
    "win_running",
    "topk_per_group",
    "agg_rollup",
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "sim_topk_cosine",
    "text_tokens",
    "text_quality",
    "pipeline_corpus_curation",
    "stream_session",
    "merkle_fold_group",
]

#: Timed identically but reported under "extra_queries" and EXCLUDED
#: from the headline total, which must stay composition-stable so
#: BENCH_r{N} totals compare against BASELINE.md round over round.
EXTRA = [
    "sessionize_batch",
    "ts_resample_ohlc",
    "agg_bitmap_distinct",
    "text_tfidf",
    "dedup_levenshtein",
    "decontaminate_ngram_overlap",
    "join_event_window",
    "text_common_ngrams",
    "text_repetition_score",
    "sql_lateral_topk",
    "sql_recursive_cte",
    "funnel_stages",
    "agg_histogram",
    "dedup_url_canonical",
    "udtf_cogroup_asof",
    # round-4 additions
    "ts_zscore",            # broadcast two-pass form
    "pack_sequences",       # per-shard token packing
    "udtf_python_chunker",  # row-wise Python UDTF fan-out
    "mm_feature_extract",   # Arrow batch + posexplode
    "embedding_quantize_int8",  # map-only array math
    "scd2_history",         # one window pass per key
    # round-5 additions
    "corpus_temperature_sampling",  # broadcast quotas + output-sized rank
    "sim_ann_ivf_distfit",          # IVF with distributed-trained centroids
    "merge_upsert",                 # broadcast CDC apply, base never shuffles
    "ts_anomaly_mad",               # 3-pass broadcast-stats robust outliers
    "dedup_containment",            # inverted-index shingle containment
    "join_asof_tolerance",          # bounded-staleness as-of, same 1-pass form
    "ts_event_transitions",         # Markov edges, vocab^2-bounded tail
    # round-6 additions
    "pipeline_neardup_e2e",         # LSH ∪ posting-index → verify → CC
    "dedup_verbatim_runs",          # diagonal islands over window postings
    "dedup_bloom_probe",            # bloom manifest + probe + exact truth
    "text_chunk_sliding",           # map-only sliding-window chunking
    "text_surprisal_bits",          # integer unigram-LM surprisal
    "corpus_vocab_coverage",        # top-K token coverage curve
    "text_winnow_fingerprints",     # winnowing (MOSS) fingerprint sampling
    "vocab_bpe_merges",             # bounded BPE merge-rule trainer
    # round-7 additions
    "dedup_simhash",                # bucket-collect rewrite (was banded self-join)
    "text_gopher_quality_rules",    # integer-exact Gopher filter rules
    "sim_ann_pq",                   # product-quantization ANN + ADC rerank
    "vocab_bpe_encode",             # trained-BPE apply (dictionary broadcast join)
    # round-8 additions
    "sim_ann_ivfpq",                # IVF partition pruning + PQ-ADC + exact rerank
    "dedup_embedding_ann",          # label-free semantic dedup, IVF-blocked
    "pipeline_semdedup_e2e",        # SemDeDup capstone: ANN pairs -> CC -> keep-list
    "graph_pagerank",               # checkpointed fixed-point iteration
    "ts_cohort_retention",          # single-scan fused cohort matrix
    "funnel_time_to_convert",       # single-scan fused latency funnel
    "pipeline_incremental_refresh", # checkpointed-batch admission gate
    # round-9 additions
    "text_span_dedup",              # C4-style global span dedup + reassembly
    "corpus_dsir_importance",       # integer DSIR importance weights
    "embedding_pca",                # moment-partial PCA + map-only projection
    # round-10 additions
    "stream_session_native",        # watermark-flushed session windows, real micro-batches
]

#: headline_v2 = HEADLINE plus the round-4 operators promoted at the
#: round-5 composition change.  The v1 headline total stays
#: composition-stable (comparable to BASELINE.md r1); v2 is the total
#: that accrues trend history for the promoted set too.  The members
#: are timed once (they're in EXTRA) — v2 is derived, not re-run.
HEADLINE_V2_PROMOTED = [
    "scd2_history",
    "embedding_quantize_int8",
    "pack_sequences",
    "udtf_python_chunker",
]


def _cpu_canary_mbps() -> float:
    """Single-thread sha256 throughput over a fixed in-memory buffer —
    a machine-state fingerprint recorded alongside the timings.  The
    suite's numbers have twice been observed to drift ~1.4× uniformly
    on UNCHANGED code (co-tenant load; see BASELINE.md round-3 drift
    investigation); the canary lets a reader separate "the machine was
    slow" from "the code got slow" after the fact."""
    import hashlib
    import time as _t

    buf = b"\0" * (64 << 20)
    hashlib.sha256(buf[: 1 << 20]).hexdigest()  # warm
    t0 = _t.perf_counter()
    hashlib.sha256(buf).hexdigest()
    return round(64 / (_t.perf_counter() - t0), 1)


def _cpu_canary_mt_mbps(threads: int = 32) -> float:
    """Multi-core twin of :func:`_cpu_canary_mbps`: aggregate sha256
    throughput across ``threads`` concurrent hashers (hashlib releases
    the GIL on large buffers).  The single-core canary read HEALTHY in
    both the r7 and r8 closing runs while every multi-core Spark timing
    drifted +15-25% uniformly — co-tenant load steals parallel
    bandwidth the one-thread probe can't see.  Recording both lets
    drift adjudication happen from the artifact instead of manual
    isolated re-measures (r8 verdict item 4)."""
    import hashlib
    import time as _t
    from concurrent.futures import ThreadPoolExecutor

    per = 64 << 20
    buf = b"\0" * per
    with ThreadPoolExecutor(threads) as pool:
        list(pool.map(lambda _: hashlib.sha256(buf[: 1 << 20]).hexdigest(), range(threads)))
        t0 = _t.perf_counter()
        list(pool.map(lambda _: hashlib.sha256(buf).hexdigest(), range(threads)))
        dt = _t.perf_counter() - t0
    return round(threads * (per >> 20) / dt, 1)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # sf is reporting metadata only — a corpus dir not named 'sfN'
    # (e.g. /data/tpch_small) must not kill the whole suite on a
    # ValueError before any benchmark runs; report 0 for unknown
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    except ValueError:
        sf = 0.0

    from dirhash_spark.registry import all_queries
    from dirhash_spark.session import get_spark

    spark = get_spark("dirhash_spark_bench")
    queries = all_queries()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Global warmup: JVM + parquet footer caches, plus the Python
    # worker pool (numpy/pandas imports) used by Arrow-batched stages.
    run(queries["agg_basic"].fn(spark, sf_dir))
    run(queries["mm_meta_extract"].fn(spark, sf_dir))

    import gc

    def measure(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            run(queries[name].fn(spark, sf_dir))  # warm: plan compile + codegen
            best = float("inf")
            for _ in range(2):  # min-of-2 shields the record from GC hiccups
                t0 = time.perf_counter()
                run(queries[name].fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
            print(f"# {name}: {out[name]}s", file=sys.stderr)
            # Drain accumulated garbage outside any timed window so one
            # query's allocations never bill the next query's measurement.
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        return out

    timings = measure(HEADLINE)
    extra = measure(EXTRA)

    total = round(sum(timings.values()), 3)
    headline_v2 = dict(timings, **{n: extra[n] for n in HEADLINE_V2_PROMOTED})
    canary = _cpu_canary_mbps()
    canary_mt = _cpu_canary_mt_mbps()
    # Compact totals line FIRST: if the driver's fixed-size tail capture
    # truncates the stdout (the r7 failure mode), the totals + canaries
    # survive somewhere in the tail.  The FULL per-query JSON is the
    # LAST line because the driver parses the final JSON line — r14's
    # PERF artifact lost per-query and scaling comparisons when the
    # compact trailer sat last (r14 verdict item 1).
    print(
        json.dumps(
            {
                "metric": "headline_totals_compact",
                "value": total,
                "unit": "sec",
                "headline_v2_total": round(sum(headline_v2.values()), 3),
                "sf": sf,
                "canary_sha256_mbps": canary,
                "canary_mt_mbps": canary_mt,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline suite wall-clock (noop sink, local[%s])"
                % os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extra_queries": extra,
                "headline_v2_total": round(sum(headline_v2.values()), 3),
                "headline_v2_members": sorted(headline_v2),
                "sf": sf,
                "canary_sha256_mbps": canary,
                "canary_mt_mbps": canary_mt,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
