"""Columnar twins of the reference pipeline (SURVEY §2.B B39-B41).

The reference hashes fixed-size file chunks and Merkle-folds the ordered
digests (dirhash.py:288-303, 413-441; chunking
FixedLengthBinaryRecordReader.scala:105-142).  These operators re-express
each stage over the ``documents`` table so the DuckDB oracle can verify
the exact same semantics columnarly; the byte-faithful file pipeline
lives in ``dirhash_spark.dirhash``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog
from ..registry import query

_BLOCK = 32  # chars per chunk for the columnar twin


@query(
    "hash_sha2_text",
    oracle="SELECT doc_id, sha256(text) AS text_sha256 FROM documents",
    tags=("dirhash", "hash"),
)
def hash_sha2_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B39 (REF A5, dirhash.py:288-303): per-row SHA-256 — JVM-side
    ``F.sha2``, no Python in the hot path."""
    cat = Catalog(spark, sf_dir)
    return cat.documents.select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha256"))


@query(
    "chunk_split_text",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, text,
             unnest(generate_series(0, CAST(ceil(length(text) / {_BLOCK}.0) AS BIGINT) - 1)) AS g
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, CAST(g AS BIGINT) AS block_num,
           substr(text, CAST(g * {_BLOCK} + 1 AS INT), {_BLOCK}) AS content,
           CAST(length(substr(text, CAST(g * {_BLOCK} + 1 AS INT), {_BLOCK})) AS INT) AS content_len
    FROM c
    """,
    tags=("dirhash", "chunk"),
)
def chunk_split_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B40 (REF A1, FixedLengthBinaryRecordReader.scala:105-142): split
    text into fixed-size blocks with global block index; the last block is
    short if length % blocksize != 0; empty documents yield zero chunks
    (the reference's empty-file semantics, dirhash_test.py:205-208)."""
    cat = Catalog(spark, sf_dir)
    n_blocks = F.ceil(F.length("text") / F.lit(float(_BLOCK))).cast("bigint")
    return (
        cat.documents.where(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_blocks - 1)).alias("block_num"),
            F.col("text"),
        )
        .select(
            "doc_id",
            "block_num",
            F.expr(f"substr(text, CAST(block_num * {_BLOCK} + 1 AS INT), {_BLOCK})").alias(
                "content"
            ),
        )
        .select("doc_id", "block_num", "content", F.length("content").alias("content_len"))
    )


@query(
    "merkle_fold_group",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           sha256(concat(CAST(count(*) AS VARCHAR), chr(0),
                         string_agg(sha256(text), chr(0) ORDER BY doc_id))) AS group_digest
    FROM documents
    GROUP BY source
    """,
    tags=("dirhash", "merkle"),
)
def merkle_fold_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B41 (REF A7, dirhash.py:422-441): per-group Merkle-style fold —
    hash of (count, NUL, ordered concatenation of member digests).

    Mirrors the reference's final-fold framing (count prefix + NUL joins)
    per group.  Implementation: partial per-row sha256 (map-side), then
    ``collect_list(struct)`` + ``array_sort`` so ordering happens inside
    each group *after* the shuffle of small digests — the same
    "hash before shuffle" shape the reference uses (digests, never
    content, cross the wire; dirhash.py:412-413).
    """
    cat = Catalog(spark, sf_dir)
    row_digest = F.sha2(F.col("text"), 256)
    return (
        cat.documents.select("source", "doc_id", row_digest.alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_sort(F.collect_list(F.struct("doc_id", "h"))).alias("sorted"),
        )
        .select(
            "source",
            "n_docs",
            F.sha2(
                F.concat(
                    F.col("n_docs").cast("string"),
                    F.lit("\x00"),
                    F.concat_ws("\x00", F.transform(F.col("sorted"), lambda s: s["h"])),
                ),
                256,
            ).alias("group_digest"),
        )
    )
