"""Driver-contract stability: the host harness calls entry() for its
smoke check and may call it repeatedly; queries()/oracle_sql() must
stay consistent with each other.
"""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_idempotent_and_stable_schema(spark):
    df1 = E.entry(spark)
    df2 = E.entry(spark)
    assert df1.schema == df2.schema
    rows1 = sorted(map(tuple, df1.collect()))
    rows2 = sorted(map(tuple, df2.collect()))
    assert rows1 == rows2 and len(rows1) > 0


def test_every_oracle_has_a_query():
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 90
    # oracles are non-empty SQL strings
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


def test_priority_order_names_all_registered():
    """Every PRIORITY_ORDER name resolves — all_queries() raises on
    phantoms, so a stale planned-query name can't silently drop its
    intended driver-row coverage (round-2 postmortem)."""
    from dirhash_spark.registry import PRIORITY_ORDER, all_queries

    qs = all_queries()
    assert set(PRIORITY_ORDER) <= set(qs)
    # The driver's correctness window is a 50-entry prefix: the
    # must-cover names (never driver-checked before round 3) must all
    # sit inside it.
    window = list(qs)[:50]
    for must in (
        # never inside any driver window through round 3
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
        # round-3 hard ERRs, fixed in round 4 — need green rows
        "sessionize_batch",
        "join_event_window",
        "ts_interpolate_linear",
        "mm_feature_extract",
        # rows-only → exact-oracle flips (round 4) — first hash verdicts
        "mm_meta_extract",
        "mm_resize",
        "mm_frame_sample",
        "stream_watermark_dedup",
        "hash_string_codec",
        "blocksize_codec",
        "scan_binary_file",
        "recursive_listing",
        "scan_fixed_binary",
        # physical-form changes (round 4) — re-verify at current code
        "join_asof",
        "ts_zscore",
        "ts_zscore_window",
        "udtf_cogroup_asof",
        # new operators (round 4) — first driver rows
        "stream_python_datasource",
        "embedding_quantize_int8",
        "scd2_history",
        "fn_collation",
        "pack_sequences",
        "udtf_python_chunker",
        "query_observe_metrics",
        "sink_time_travel",
        "dirhash_verify",
        "agg_approx_percentile",
    ):
        assert must in window, must
