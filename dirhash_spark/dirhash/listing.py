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


def parallel_list_entries(
    spark, root: str, level_partitions: int = 32
) -> list[Entry]:
    """:func:`list_entries` with the per-directory listing calls fanned
    out across the cluster — the scale path for trees whose DIRECTORY
    COUNT makes a serial walk latency-bound.

    A driver-serial walk issues one listing round-trip per directory:
    at 1M directories × ~1 ms metadata latency (NFS/Lustre; worse on
    object stores) that is ~17 minutes of pure driver wait.  This walk
    proceeds level by level: the current frontier of directories
    becomes a DataFrame, every executor ``os.scandir``s its slice of
    the frontier in parallel (one ``mapInPandas`` job per tree LEVEL,
    so a 1M-dir tree of depth 10 costs 10 jobs of ~100k parallel
    listings instead of 1M serial ones), and the children directories
    form the next frontier.

    Output is the same ``Entry`` list with the same conventions —
    byte-identical fold input, pinned against :func:`list_entries` in
    tests/test_dirhash_e2e.py.  The listing itself still returns to
    the driver (metadata: ~hundred MB at millions of files — the
    accepted bound; the digest set no longer needs to, see
    ``hash_directory_raw_streamed``).

    Local/shared-filesystem paths only: executors list with
    ``os.scandir``, which is correct wherever the tree is mounted on
    every worker (local mode, NFS, Lustre).  For ``hdfs://``-scheme
    roots the executors would need a worker-side Hadoop client
    (pyarrow ``HadoopFileSystem`` + libhdfs — not shipped in this
    container), so those fall back to the serial JVM-gateway walk
    rather than silently producing an empty listing.
    """
    import pandas as pd

    root = strip_trailing_slash(root)
    if "://" in root and not root.startswith("file://"):
        return list_entries(root, spark)  # serial fallback (see doc)
    local_root = root[len("file://"):] if root.startswith("file://") else root
    if not os.path.isdir(local_root):
        raise FileNotFoundError(f"not a directory: {local_root}")

    def scan_level(batches):
        for pdf in batches:
            rows = []
            for d in pdf["dir"]:
                for de in os.scandir(d):
                    is_dir = de.is_dir(follow_symlinks=False)
                    rows.append(
                        (
                            de.path,
                            is_dir,
                            0 if is_dir else de.stat(follow_symlinks=False).st_size,
                        )
                    )
            yield pd.DataFrame(rows, columns=["path", "is_dir", "size"])

    entries: list[Entry] = []
    frontier = [local_root]
    while frontier:
        level = (
            spark.createDataFrame(
                [(d,) for d in frontier], "dir string"
            )
            .repartition(min(level_partitions, max(1, len(frontier))))
            .mapInPandas(scan_level, "path string, is_dir boolean, size long")
            .collect()
            # bounded: one tree LEVEL of (path, is_dir, size) metadata
            # triples — the same rows a serial walk would hold anyway
        )
        frontier = []
        for r in level:
            rel = os.path.relpath(r["path"], local_root).replace(os.sep, "/")
            if r["is_dir"]:
                entries.append(Entry(rel + "/", True, 0, r["path"]))
                frontier.append(r["path"])
            else:
                entries.append(Entry(rel, False, int(r["size"]), r["path"]))
    return entries
