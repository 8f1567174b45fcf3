"""Directory hashing pipeline (REF A5-A7; lifecycle SURVEY §3.1).

Stages (mirroring dirhash.py:307-444, re-expressed Spark-first):
  1. LIST   driver-side recursive listing (metadata only)
  2. PLAN   chunk metadata DataFrame (no bytes touched)
  3. READ   mapInPandas positioned range reads
  4. HASH   per-chunk digest of the v1 preimage — **before** any
            shuffle, so only (path, block_num, digest) ever crosses the
            wire (the reference's one good physical choice,
            dirhash.py:412-413, kept deliberately)
  5. SORT+COLLECT   orderBy(path, block_num) on digests (tiny rows)
  6. FOLD   driver-side sequential Merkle chain (inherently ordered)

SHA-2 digests are computed JVM-side with ``F.sha2`` over a binary concat
(whole-stage codegen, zero Python in the hot path); sha3/blake2 fall
back to an Arrow-batched pandas pipeline inside the same read stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

from ..session import configure
from .chunks import read_chunks
from .codec import (
    DEFAULT_BLOCK_SIZE,
    build_hash_string,
    chunk_preimage,
    fold_digest,
    get_hash_func,
    parse_blocksize,
)
from .listing import Entry, list_entries, strip_trailing_slash

_SHA2_BITS = {"sha224": 224, "sha256": 256, "sha384": 384, "sha512": 512}

DIGEST_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("block_num", LongType(), False),
        StructField("digest", BinaryType(), False),
    ]
)


def chunk_digests(chunks: DataFrame, algo: str) -> DataFrame:
    """(path, block_num, content) → (path, block_num, digest)."""
    canonical = algo.lower() if algo.lower().startswith("sha") else algo
    if canonical in _SHA2_BITS:
        bits = _SHA2_BITS[canonical]
        preimage = F.concat(
            F.encode(F.col("path"), "UTF-8"),
            F.lit(b"\x00"),
            F.encode(F.col("block_num").cast("string"), "UTF-8"),
            F.lit(b"\x00"),
            F.col("content"),
        )
        return chunks.select(
            "path", "block_num", F.unhex(F.sha2(preimage, bits)).alias("digest")
        )

    get_hash_func(canonical)  # validate against the whitelist up front

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        func = get_hash_func(canonical)
        for pdf in batches:
            digests = [
                func(chunk_preimage(p, int(n), c)).digest()
                for p, n, c in zip(pdf["path"], pdf["block_num"], pdf["content"])
            ]
            yield pd.DataFrame(
                {"path": pdf["path"], "block_num": pdf["block_num"], "digest": digests}
            )

    return chunks.mapInPandas(hash_batches, DIGEST_SCHEMA)


def hash_directory_raw(
    spark: SparkSession,
    directory: str,
    hash_algorithm: str = "sha256",
    blocksize: int | None = None,
) -> str:
    """Compute the v1 hex digest of a directory tree (dirhash.py:307-444)."""
    configure(spark)
    blocksize = blocksize or parse_blocksize(DEFAULT_BLOCK_SIZE)
    directory = strip_trailing_slash(directory)

    entries = list_entries(directory, spark)
    listing = [e.relative_path for e in entries]

    has_bytes = any((not e.is_dir) and e.size > 0 for e in entries)
    if has_bytes:
        chunks = read_chunks(spark, entries, blocksize)
        digests = chunk_digests(chunks, hash_algorithm)
        ordered = digests.orderBy("path", "block_num").select("digest").collect()
        digest_list = [bytes(r["digest"]) for r in ordered]
    else:
        digest_list = []

    return fold_digest(hash_algorithm, listing, digest_list)


def hash_directory(
    spark: SparkSession,
    directory: str,
    hash_algorithm: str = "sha256",
    blocksize: str = DEFAULT_BLOCK_SIZE,
) -> str:
    """Full lifecycle → versioned hash string ``v1-<algo>-<bs>-<hex>``."""
    hex_digest = hash_directory_raw(
        spark, directory, hash_algorithm, parse_blocksize(blocksize)
    )
    return build_hash_string(hash_algorithm, blocksize, hex_digest)
