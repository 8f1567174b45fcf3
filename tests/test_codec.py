"""Known-answer + unit tests for the v1 codec (SURVEY §5 layer 1).

The single published golden value: the reference's chunk digest for
``dir/subdir3/abc.txt`` block 0 content b"abc"
(/root/reference/dirhash_test.py:78-79) pins the Py3 byte semantics of
the preimage framing.
"""

from __future__ import annotations

import hashlib

import pytest

from dirhash_spark.dirhash.codec import (
    build_hash_string,
    chunk_preimage,
    fold_digest,
    get_hash_func,
    parse_blocksize,
    parse_hash_string,
    supported_algorithms,
)

ABC_CHUNK_SHA256 = "b4f567d6c89cd9998bf08292ba1f04190b2213236d5691b2a24a6adcef1dc663"


def test_golden_chunk_preimage():
    pre = chunk_preimage("dir/subdir3/abc.txt", 0, b"abc")
    assert pre == b"dir/subdir3/abc.txt\x000\x00abc"
    assert hashlib.sha256(pre).hexdigest() == ABC_CHUNK_SHA256


def test_preimage_empty_content():
    assert chunk_preimage("a.txt", 3, b"") == b"a.txt\x003\x00"


@pytest.mark.parametrize(
    "s,expected",
    [
        ("1", 1),
        ("1023", 1023),
        ("1k", 1024),
        ("1K", 1024),
        ("32M", 32 * 2**20),
        ("1G", 2**30),
        ("128M", 128 * 2**20),
    ],
)
def test_blocksize_parse(s, expected):
    assert parse_blocksize(s) == expected


@pytest.mark.parametrize("s", ["0", "1024", "4096", "-1", "12X", "abc", "", "1m", "1g"])
def test_blocksize_rejects(s):
    with pytest.raises(ValueError):
        parse_blocksize(s)


def test_algo_whitelist():
    for algo in ("sha224", "sha256", "sha384", "sha512", "SHA256"):
        assert get_hash_func(algo) is not None
    for bad in ("md5", "sha1", "MD5", "crc32", ""):
        with pytest.raises(ValueError):
            get_hash_func(bad)
    assert "sha256" in supported_algorithms()
    assert "md5" not in supported_algorithms()


def test_hash_string_roundtrip():
    hx = "ab" * 32
    s = build_hash_string("sha256", "128M", hx)
    assert s == f"v1-sha256-128M-{hx}"
    assert parse_hash_string(s) == ("sha256", "128M", hx)


@pytest.mark.parametrize(
    "s",
    [
        "v2-sha256-128M-" + "ab" * 32,  # bad version
        "v1-md5-128M-" + "ab" * 32,  # blacklisted algo
        "v1-sha256-4096-" + "ab" * 32,  # blocksize out of range
        "v1-sha256-128M-XYZ",  # non-hex digest
        "v1-sha256-128M",  # missing part
    ],
)
def test_hash_string_rejects(s):
    with pytest.raises(ValueError):
        parse_hash_string(s)


def test_fold_digest_composition():
    """The fold must equal the documented framing computed by hand
    (mirrors the reference's hand-recomputation test, dirhash_test.py:246-267)."""
    entries = ["b.txt", "a/", "a/x.txt"]
    d1, d2 = hashlib.sha256(b"1").digest(), hashlib.sha256(b"2").digest()
    expected = hashlib.sha256(
        b"3\x00" + "\x00".join(sorted(entries)).encode() + b"\x00" + d1 + d2
    ).hexdigest()
    assert fold_digest("sha256", entries, [d1, d2]) == expected


def test_fold_digest_empty_tree():
    assert fold_digest("sha256", [], []) == hashlib.sha256(b"0\x00\x00").hexdigest()
