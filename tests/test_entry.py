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
        "hash_string_codec",
        "blocksize_codec",
        "dirhash_verify",
        "mm_resize",
        "mm_feature_extract",
        "scan_binary_file",
        "stream_watermark_dedup",
        "scan_csv_permissive",
        "scan_csv_dropmalformed",
        "csv_corrupt_records",
        "dirhash_tree_fold",
        "join_asof",
        "join_asof_pairwise",
        # round-3 additions — need their first driver row this round
        "sessionize_batch",
        "ts_resample_ohlc",
        "agg_bitmap_distinct",
        "agg_hll_sketch_merge",
        "agg_approx_top_k",
        "agg_filtered",
        "text_tfidf",
        "text_pii_mask",
        "dedup_levenshtein",
        "join_null_safe",
    ):
        assert must in window, must
