"""Recursive directory listing (REF A2, dirhash.py:339-386).

The reference shells out to ``hadoop fs -ls -R`` and regex-parses the
output (fragile for filenames with newlines — a known reference quirk).
Here the listing is a structured filesystem walk: the Hadoop FileSystem
API via the JVM gateway when a SparkSession is available (works for any
Hadoop-visible scheme: hdfs://, s3a://, file://), plain ``os.walk`` for
local paths otherwise.  Output convention matches the reference:
relative paths, directories suffixed '/', the root itself excluded.

Scale note: listing is metadata-only; at 100 TB the listing of even
millions of files is a few hundred MB of strings — driver-side is fine
(and the reference's final fold needs the complete ordered listing on
the driver anyway).  For listings too large for one driver, the chunk
*plan* (chunks.py) already distributes; only the fold would need a
tree-reduce variant.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class Entry:
    relative_path: str  # dirs carry a trailing '/'
    is_dir: bool
    size: int  # 0 for dirs
    full_path: str  # absolute/scheme path usable for reads


def strip_trailing_slash(path: str) -> str:
    """The reference strips one trailing '/' from the input dir
    (dirhash.py:323; regression test dirhash_test.py:275-279)."""
    return path[:-1] if path.endswith("/") and len(path) > 1 else path


def list_entries(root: str, spark=None) -> list[Entry]:
    """Recursively list ``root`` → entries with reference conventions."""
    root = strip_trailing_slash(root)
    if spark is not None and "://" in root:
        return _list_hadoop(spark, root)
    return _list_local(root)


def _list_local(root: str) -> list[Entry]:
    if not os.path.isdir(root):
        raise FileNotFoundError(f"not a directory: {root}")
    entries: list[Entry] = []
    for dirpath, dirnames, filenames in os.walk(root):
        for d in dirnames:
            full = os.path.join(dirpath, d)
            rel = os.path.relpath(full, root).replace(os.sep, "/")
            entries.append(Entry(rel + "/", True, 0, full))
        for f in filenames:
            full = os.path.join(dirpath, f)
            rel = os.path.relpath(full, root).replace(os.sep, "/")
            entries.append(Entry(rel, False, os.path.getsize(full), full))
    return entries


def _list_hadoop(spark, root: str) -> list[Entry]:
    """Walk any Hadoop-visible filesystem through the JVM gateway."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(conf)
    root_uri = fs.makeQualified(jpath).toString().rstrip("/")
    entries: list[Entry] = []

    def walk(p):
        for status in fs.listStatus(p):
            full = status.getPath().toString()
            rel = full[len(root_uri) + 1 :]
            if status.isDirectory():
                entries.append(Entry(rel + "/", True, 0, full))
                walk(status.getPath())
            else:
                entries.append(Entry(rel, False, status.getLen(), full))

    walk(fs.makeQualified(jpath))
    return entries
