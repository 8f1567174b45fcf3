"""Registry exposure of the driver-side codecs (REF A8-A10).

The codecs are pure functions (dirhash.py:223-274); these queries run
them over a generated domain so the driver sees them as data, and the
verify operator (A10) closes the loop on the fixture tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..dirhash.codec import (
    build_hash_string,
    parse_blocksize,
    parse_hash_string,
    supported_algorithms,
)


@query(
    "hash_string_codec",
    # Independent SQL restatement of the v1 grammar (``v1-<algo>-<bs>-
    # <hex>``, algo lowercased — /root/reference/dirhash.py:250-274):
    # the oracle rebuilds every hash string from the same algo×blocksize
    # domain and asserts the round trip, without touching the Python
    # codec.  All 10 whitelisted algorithms exist in CPython's hashlib,
    # so the domain is static.
    oracle="""
    WITH algos AS (
      SELECT unnest(['sha224','sha256','sha384','sha512','sha3_224',
                     'sha3_256','sha3_384','sha3_512','blake2b','blake2s']) AS algo
    ),
    bss AS (
      SELECT unnest(['1','32k','4M','128M','1G','1023']) AS blocksize
    )
    SELECT algo, blocksize,
           'v1-' || algo || '-' || blocksize || '-' || repeat('ab', 16) AS hash_string,
           true AS roundtrip_ok
    FROM algos, bss
    """,
    tags=("dirhash", "codec"),
)
def hash_string_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: build/parse round-trip over the algorithm × blocksize domain
    (every row must survive the round trip intact — asserted columnar)."""
    rows = []
    for algo in supported_algorithms():
        for bs in ("1", "32k", "4M", "128M", "1G", "1023"):
            hs = build_hash_string(algo, bs, "ab" * 16)
            back_algo, back_bs, back_hex = parse_hash_string(hs)
            rows.append(
                (
                    algo,
                    bs,
                    hs,
                    back_algo == algo and back_bs == bs and back_hex == "ab" * 16,
                )
            )
    return spark.createDataFrame(
        rows, "algo STRING, blocksize STRING, hash_string STRING, roundtrip_ok BOOLEAN"
    )


@query(
    "blocksize_codec",
    # Independent SQL re-implementation of the blocksize rules
    # (/root/reference/dirhash.py:223-248): ``\\A\\d+[kKMG]?\\Z`` with the
    # integer part in 1..1023.  The suffix arithmetic is stated with
    # literal factors so a codec bug cannot hide on both sides.  Error
    # classes are deliberately normalized to ValueError: the reference
    # raises an accidental AttributeError for regex non-matches
    # (match.group on None) and ValueError only for out-of-range
    # integers; the accepted/rejected domain — what this oracle pins —
    # is identical (see dirhash/codec.py:parse_blocksize).
    oracle="""
    WITH inputs AS (
      SELECT unnest(['1','8','1023','1k','1K','16M','128M','1G',
                     '0','1024','2G5','x','-3']) AS input
    ),
    parsed AS (
      SELECT input,
             regexp_full_match(input, '[0-9]+[kKMG]?')
               AND TRY_CAST(regexp_extract(input, '([0-9]+)', 1) AS BIGINT)
                   BETWEEN 1 AND 1023 AS ok,
             TRY_CAST(regexp_extract(input, '([0-9]+)', 1) AS BIGINT) AS i,
             CASE regexp_extract(input, '[0-9]+([kKMG]?)', 1)
                  WHEN 'k' THEN 1024 WHEN 'K' THEN 1024
                  WHEN 'M' THEN 1048576 WHEN 'G' THEN 1073741824
                  ELSE 1 END AS factor
      FROM inputs
    )
    SELECT input,
           CASE WHEN ok THEN i * factor END AS bytes,
           CASE WHEN NOT ok THEN 'ValueError' END AS error
    FROM parsed
    """,
    tags=("dirhash", "codec"),
)
def blocksize_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: blocksize domain table — accepted forms with byte values,
    rejected forms with their error class."""
    rows = []
    for s in ("1", "8", "1023", "1k", "1K", "16M", "128M", "1G", "0", "1024", "2G5", "x", "-3"):
        try:
            rows.append((s, int(parse_blocksize(s)), None))
        except ValueError as e:
            rows.append((s, None, type(e).__name__))
    return spark.createDataFrame(rows, "input STRING, bytes BIGINT, error STRING")


#: v1-sha256-4k hash of the committed fixture tree (data/hashtree).  A
#: golden constant, not a recomputation: the v1 codec's byte framing is
#: pinned against the reference's published digests in tests/test_codec.py
#: and tests/test_dirhash_e2e.py, so any fold/chunking/listing regression
#: changes this hex and the driver's hash check catches it.  Update ONLY
#: when the fixture tree itself changes.
_HASHTREE_SHA256_4K = "e687b3476de36d217a71426fa9f91dff15bfa2afb00c4af180c321cbd1d7eecd"


@query(
    "dirhash_verify",
    oracle=f"""
    SELECT 'good' AS case, true AS match, '{_HASHTREE_SHA256_4K}' AS actual_hex
    UNION ALL
    SELECT 'corrupted', false, '{_HASHTREE_SHA256_4K}'
    """,
    tags=("dirhash", "verify"),
)
def dirhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: verify — check a matching and a corrupted hash string
    against the fixture tree (one row each; the matching row must have
    match=true, the corrupted one match=false).

    The expected strings come from the GOLDEN constant, not a third
    recomputation: verify_directory_hash recomputes the tree's digest
    internally anyway, so hashing it first just tripled the
    distributed fold for identical regression coverage (the oracle
    already pins actual_hex to the same constant)."""
    from ..dirhash.verify import verify_directory_hash
    from .dirhash_pipeline import HASHTREE

    good = build_hash_string("sha256", "4k", _HASHTREE_SHA256_4K)
    bad = good[:-8] + "00000000"
    r_good = verify_directory_hash(spark, HASHTREE, good)
    r_bad = verify_directory_hash(spark, HASHTREE, bad)
    return spark.createDataFrame(
        [("good", bool(r_good), r_good.actual_hash_value), ("corrupted", bool(r_bad), r_bad.actual_hash_value)],
        "case STRING, match BOOLEAN, actual_hex STRING",
    )
