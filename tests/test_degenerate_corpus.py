"""Degenerate-document semantics: short docs and fully-merged BPE.

Two crash/divergence classes a review pass found in the n-gram family
(none reachable from the fixture corpora, all reachable from a real
crawl):

1. ``F.sequence(1, greatest(size - (n-1), 0))`` — Spark's
   ``sequence(1, 0)`` is the DESCENDING ``[1, 0]``, so a document with
   fewer than n tokens fed ``slice`` a 0 start and crashed the whole
   job (INVALID_PARAMETER_VALUE.START) where the oracle's
   ``generate_series(1, 0)`` is simply empty.  Four queries shared the
   shape (text_common_ngrams, text_repetition_score,
   decontaminate_ngram_overlap, dedup_containment); all now route
   through ``text.gram_start_indices``.

2. The BPE oracle's unrolled ``w{k}`` CTE chain collapsed to EMPTY
   when the vocabulary merged fully before ``_BPE_STEPS`` (empty
   ``m{k}`` → empty CROSS JOIN), while the Spark trainer breaks and
   keeps the last vocabulary — so vocab_bpe_encode returned rows
   against a zero-row oracle.  The oracle now carries ``w{k}`` through
   unchanged when ``m{k}`` is empty, mirroring the Python break.
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


def _make_sf(tmp_path, texts):
    """sf0.001 clone with the first len(texts) document bodies replaced."""
    for t in TABLE_NAMES:
        src = f"{_BASE}/{t}.parquet"
        if t == "documents":
            tbl = pq.read_table(src)
            pdf = tbl.to_pandas().head(max(len(texts), 5)).copy()
            for i, txt in enumerate(texts):
                pdf.loc[pdf.index[i], "text"] = txt
            pq.write_table(
                pa.Table.from_pandas(pdf, schema=tbl.schema, preserve_index=False),
                str(tmp_path / "documents.parquet"),
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


@pytest.mark.parametrize(
    "name",
    [
        "text_common_ngrams",
        "text_repetition_score",
        "decontaminate_ngram_overlap",
        "dedup_containment",
    ],
)
def test_short_docs_match_oracle_not_crash(spark, tmp_path, name):
    """Docs with 0–4 tokens (empty, whitespace-only, 1..4 words) must
    produce the oracle's row set — previously a SparkRuntimeException
    killed the job on the first short document."""
    sf = _make_sf(
        tmp_path,
        ["", "   ", "one", "a b", "a b c d", "one two three four five six"],
    )
    q = all_queries()[name]
    r = compare(q.fn(spark, sf), _con_for(sf), q.oracle)
    assert r["match"], r


def test_bpe_fully_merged_corpus_matches_oracle(spark, tmp_path):
    """A corpus of one distinct 2-char word merges fully at step 1;
    the trainer breaks early and the encode must still agree with the
    oracle (whose w-chain previously collapsed to empty rows)."""
    sf = _make_sf(tmp_path, ["ab ab ab"] * 5)
    con = _con_for(sf)
    qs = all_queries()
    for name in ("vocab_bpe_merges", "vocab_bpe_encode"):
        q = qs[name]
        r = compare(q.fn(spark, sf), con, q.oracle)
        assert r["match"], (name, r)
