"""Registry exposure of the byte-faithful dirhash pipeline (REF A1-A7).

These run on the committed fixture tree ``data/hashtree`` (sf_dir is
ignored — the reference's domain is directories, not tables).  DuckDB
cannot replay positioned file reads, so these are rows-only checks; the
byte-exact semantics are pinned by tests/test_dirhash_e2e.py against an
independent pure-Python fold, and the columnar twins (B39-B41) carry the
SQL oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..dirhash.chunks import read_chunks
from ..dirhash.hashdir import chunk_digests, hash_directory
from ..dirhash.listing import list_entries

HASHTREE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
    "hashtree",
)


@query("scan_fixed_binary", oracle=None, tags=("dirhash", "scan"))
def scan_fixed_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: fixed-length binary scan — 4 KiB blocks over the fixture tree,
    global block index, short final block at true length."""
    entries = list_entries(HASHTREE)
    chunks = read_chunks(spark, entries, 4096)
    return chunks.select(
        "path",
        "block_num",
        F.length("content").alias("content_len"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )


@query("recursive_listing", oracle=None, tags=("dirhash", "scan"))
def recursive_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: recursive directory listing as a DataFrame (dirs suffixed '/',
    relative paths — dirhash.py:339-386 conventions)."""
    entries = list_entries(HASHTREE)
    return spark.createDataFrame(
        [(e.relative_path, e.is_dir, e.size) for e in entries],
        "relative_path STRING, is_dir BOOLEAN, size BIGINT",
    )


@query("dirhash_chunk_digests", oracle=None, tags=("dirhash", "hash"))
def dirhash_chunk_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: per-chunk v1 digests (JVM-side sha2 over the exact preimage
    ``path ‖ NUL ‖ ascii(num) ‖ NUL ‖ content``, dirhash.py:288-303)."""
    entries = list_entries(HASHTREE)
    chunks = read_chunks(spark, entries, 4096)
    return chunk_digests(chunks, "sha256").select(
        "path", "block_num", F.hex(F.col("digest")).alias("digest_hex")
    )


@query("dirhash_full", oracle=None, tags=("dirhash", "e2e"))
def dirhash_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+A8: full pipeline — list → chunk → hash → sort → fold →
    versioned hash string (one row)."""
    hs = hash_directory(spark, HASHTREE, "sha256", "4k")
    return spark.createDataFrame([(HASHTREE, hs)], "directory STRING, hash_string STRING")
