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


@query("hash_string_codec", oracle=None, tags=("dirhash", "codec"))
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


@query("blocksize_codec", oracle=None, tags=("dirhash", "codec"))
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


@query("dirhash_verify", oracle=None, tags=("dirhash", "verify"))
def dirhash_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: verify — recompute the fixture tree's hash, then check a
    matching and a corrupted hash string (one row each; the matching row
    must have match=true, the corrupted one match=false)."""
    from ..dirhash.hashdir import hash_directory
    from ..dirhash.verify import verify_directory_hash
    from .dirhash_pipeline import HASHTREE

    good = hash_directory(spark, HASHTREE, "sha256", "4k")
    bad = good[:-8] + "00000000"
    r_good = verify_directory_hash(spark, HASHTREE, good)
    r_bad = verify_directory_hash(spark, HASHTREE, bad)
    return spark.createDataFrame(
        [("good", bool(r_good), r_good.actual_hash_value), ("corrupted", bool(r_bad), r_bad.actual_hash_value)],
        "case STRING, match BOOLEAN, actual_hex STRING",
    )
