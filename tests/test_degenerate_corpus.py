"""Degenerate-data semantics: inputs the fixture corpora never produce
but a real crawl / real warehouse does.

Review passes found several crash or divergence classes that shipped
green for rounds because every fixture row happens to be well-formed:

1. ``F.sequence(1, greatest(size - (n-1), 0))`` — Spark's
   ``sequence(1, 0)`` is the DESCENDING ``[1, 0]``, so a document with
   fewer than n tokens fed ``slice`` a 0 start and crashed the whole
   job (INVALID_PARAMETER_VALUE.START) where the oracle's
   ``generate_series(1, 0)`` is simply empty.  Four queries shared the
   shape; all now route through ``text.gram_start_indices``.
2. ``element_at`` under Spark 4's ANSI default throws on an empty
   array instead of returning NULL — a doc with no regexp match (or a
   zero-length embedding) killed fn_regexp_all / fn_array.
3. The BPE oracle's unrolled ``w{k}`` CTE chain collapsed to EMPTY
   when the vocabulary merged fully before ``_BPE_STEPS``, while the
   Spark trainer breaks and keeps the last vocabulary.
4. merge_upsert's fresh-insert keys used a fixed +10M offset that
   collides with live keys once the table exceeds 10M rows; the
   offset is now derived (next power of ten above max(c_custkey)).
5. corpus_temperature_sampling's Knuth scramble ran in plain BIGINT,
   overflowing (ANSI throw / DuckDB raise) at doc_id ≳ 3.5e9 — the
   corpus sizes the operator targets; it now rides DECIMAL/HUGEINT
   like its sibling sample_balanced_classes.
"""

from __future__ import annotations

import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dirhash_spark.catalog import TABLE_NAMES
from dirhash_spark.registry import all_queries
from tests.oracle_harness import compare

_BASE = "/root/testdata/sf0.001"


def _make_sf(tmp_path, texts=None, patches=None):
    """sf0.001 clone; ``texts`` replaces the first document bodies,
    ``patches`` maps table name -> (pandas df -> pandas df)."""
    patches = dict(patches or {})
    for t in TABLE_NAMES:
        src = f"{_BASE}/{t}.parquet"
        tbl = None
        if t == "documents" and texts is not None:
            tbl = pq.read_table(src)
            pdf = tbl.to_pandas().head(max(len(texts), 5)).copy()
            for i, txt in enumerate(texts):
                pdf.loc[pdf.index[i], "text"] = txt
        if t in patches:
            tbl = tbl if tbl is not None else pq.read_table(src)
            pdf = patches[t]((pdf if t == "documents" and texts is not None else tbl.to_pandas()).copy())
        if tbl is not None:
            pq.write_table(
                pa.Table.from_pandas(pdf, schema=tbl.schema, preserve_index=False),
                str(tmp_path / f"{t}.parquet"),
            )
        else:
            shutil.copy(src, str(tmp_path / f"{t}.parquet"))
    return str(tmp_path)


def _con_for(sf):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def _assert_match(spark, sf, name):
    q = all_queries()[name]
    r = compare(q.fn(spark, sf), _con_for(sf), q.oracle)
    assert r["match"], (name, r)


@pytest.mark.parametrize(
    "name",
    [
        "text_common_ngrams",
        "text_repetition_score",
        "decontaminate_ngram_overlap",
        "dedup_containment",
        "fn_regexp_all",  # "one"/""/"a b" have no [a-z]{5,} match
        "mm_feature_extract",  # ""-payload: 16 zeros, not 16 NULLs (0/0)
    ],
)
def test_short_docs_match_oracle_not_crash(spark, tmp_path, name):
    """Docs with 0–4 tokens (empty, whitespace-only, 1..4 words) must
    produce the oracle's row set — previously a SparkRuntimeException
    killed the job on the first short document."""
    sf = _make_sf(
        tmp_path,
        texts=["", "   ", "one", "a b", "a b c d", "one two three four five six"],
    )
    _assert_match(spark, sf, name)


def test_bpe_fully_merged_corpus_matches_oracle(spark, tmp_path):
    """A corpus of one distinct 2-char word merges fully at step 1;
    the trainer breaks early and the encode must still agree with the
    oracle (whose w-chain previously collapsed to empty rows)."""
    sf = _make_sf(tmp_path, texts=["ab ab ab"] * 5)
    for name in ("vocab_bpe_merges", "vocab_bpe_encode"):
        _assert_match(spark, sf, name)


def test_empty_embedding_array_matches_oracle(spark, tmp_path):
    """A zero-length embedding (real-pipeline failure output) must not
    crash fn_array's element_at under ANSI, and head_sum must be NULL
    like DuckDB's list_sum([])."""

    def drop_vec(pdf):
        pdf.at[pdf.index[1], "embedding"] = []
        return pdf

    sf = _make_sf(tmp_path, patches={"embeddings": drop_vec})
    _assert_match(spark, sf, "fn_array")


def test_merge_fresh_keys_clear_a_10m_key_table(spark, tmp_path):
    """Customer keys pushed past the old fixed +10M offset: the derived
    power-of-ten offset must keep inserted keys collision-free (unique
    snapshot PK) and both engines agreeing."""

    def bump(pdf):
        pdf["c_custkey"] = pdf["c_custkey"] + 10_000_000
        return pdf

    sf = _make_sf(tmp_path, patches={"customer": bump})
    for name in ("merge_upsert", "snapshot_diff"):
        _assert_match(spark, sf, name)
    out = all_queries()["merge_upsert"].fn(spark, sf)
    assert out.count() == out.select("c_custkey").distinct().count()


def test_temperature_sampling_survives_huge_doc_ids(spark, tmp_path):
    """doc_id past 2^63 / 2654435761 ≈ 3.47e9 overflowed the BIGINT
    scramble on both engines (ANSI throw / DuckDB raise); the
    DECIMAL/HUGEINT form must agree cross-engine instead."""

    def huge(pdf):
        pdf["doc_id"] = pdf["doc_id"] + 4_000_000_000
        return pdf

    sf = _make_sf(tmp_path, patches={"documents": huge})
    for name in ("corpus_temperature_sampling", "sample_balanced_classes"):
        _assert_match(spark, sf, name)


def test_null_custkey_matches_oracle(spark, tmp_path):
    """A NULL o_custkey row must count as a not_null violation but NOT
    as an FK violation (previously Spark's anti-join counted it while
    the oracle's NOT IN dropped it), and the surrogate key must
    coalesce the NULL field instead of silently skipping it."""

    def null_one(pdf):
        pdf["o_custkey"] = pdf["o_custkey"].astype("object")
        pdf.at[pdf.index[2], "o_custkey"] = None
        return pdf

    sf = _make_sf(tmp_path, patches={"orders": null_one})
    for name in ("quality_expectations", "fn_surrogate_key"):
        _assert_match(spark, sf, name)


def test_repetition_score_null_text_dropped_like_oracle(spark, tmp_path):
    """A NULL text must vanish from text_repetition_score exactly as it
    does in the oracle (split(NULL) -> NULL -> no token rows).  The r14
    Arrow rewrite moved the drop from explode semantics into Python
    (`t is None`), so it needs its own pin."""
    sf = _make_sf(
        tmp_path,
        patches={
            "documents": lambda df: df.assign(
                text=[None] + list(df["text"][1:])
            )
        },
    )
    _assert_match(spark, sf, "text_repetition_score")
