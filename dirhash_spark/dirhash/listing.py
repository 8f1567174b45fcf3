"""Recursive directory listing (REF A2, dirhash.py:339-386).

The reference shells out to ``hadoop fs -ls -R`` and regex-parses the
output (fragile for filenames with newlines — a known reference quirk).
Here the listing is a structured filesystem walk: the Hadoop FileSystem
API via the JVM gateway when a SparkSession is available (works for any
Hadoop-visible scheme: hdfs://, s3a://, file://), plain ``os.walk`` for
local paths otherwise.  Output convention matches the reference:
relative paths, directories suffixed '/', the root itself excluded.

Scale routing: a serial walk issues one listing round-trip per
directory, so it is latency-bound on networked metadata (NFS/Lustre/
object stores) and CPU-bound only on huge local trees.  Rather than
guess which case we are in, :func:`list_entries` runs the serial walk
under a TIME BUDGET when a SparkSession is available: most trees finish
well inside it; a tree that trips the budget is, by that very
measurement, one where listing time dominates — so the walk restarts as
the level-parallel cluster walk (:func:`parallel_list_entries`), losing
at most the budget against a listing already known to be slow.

Driver residency: the ``Entry``-list forms hold the full listing on the
driver (metadata: ~hundred MB at millions of files — fine, and the
collect-fold needs it there anyway).  :func:`list_entries_df` is the
form for folds that stream the listing (``hash_directory_raw_streamed``):
rows stay cluster-side; only one level's directory frontier ever
returns to the driver.
"""

from __future__ import annotations

import os
import re
import time
from collections.abc import Iterator
from dataclasses import dataclass

#: A URI scheme with an authority marker ("scheme://...").  Plain local
#: paths — including pathological names containing ':' — never match.
_SCHEME_RE = re.compile(r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<rest>.*)$", re.S)


def local_root(root: str) -> str | None:
    """The local filesystem path for ``root`` when it IS local: a bare
    path, or a ``file://`` URI (scheme matched case-insensitively, per
    RFC 3986) with an empty or ``localhost`` authority.  Returns None
    for any other scheme — the caller routes those to the JVM-gateway
    walk.  A ``file://`` URI with a REAL authority is refused loudly:
    neither a local walk nor Hadoop's LocalFileSystem (which silently
    ignores the authority) can honour "that other host's filesystem",
    and a silently wrong route here means a silently wrong digest.

    Every listing form routes through this ONE helper so the serial,
    parallel, fold-router, and DataFrame walks can never desynchronize
    on scheme handling (they share one symlink semantics by design).
    """
    m = _SCHEME_RE.match(root)
    if not m:
        return root
    if m.group("scheme").lower() != "file":
        return None
    authority, sep, path = m.group("rest").partition("/")
    if authority and authority.lower() != "localhost":
        raise ValueError(
            f"unsupported file:// authority {authority!r} in {root!r}: "
            "file URIs must address this host (empty or 'localhost')"
        )
    if not sep:
        # 'file://' / 'file://localhost' (no path component at all) is a
        # truncated URI, not a spelling of '/': mapping it to the
        # filesystem root would serially walk and hash THE WHOLE HOST
        # where the caller almost certainly meant a specific tree.
        # 'file:///' stays valid — its path component IS '/'.
        raise ValueError(
            f"malformed file:// URI {root!r}: missing path component "
            "(use 'file:///' to address the filesystem root explicitly)"
        )
    return sep + path


@dataclass(frozen=True)
class Entry:
    relative_path: str  # dirs carry a trailing '/'
    is_dir: bool
    size: int  # 0 for dirs
    full_path: str  # absolute/scheme path usable for reads


#: Schema of the DataFrame listing (list_entries_df).
ENTRY_DF_SCHEMA = "relative_path string, is_dir boolean, size long, full_path string"
#: The same listing with the stat's mtime (list_entries_df(with_mtime=True)).
ENTRY_MTIME_DF_SCHEMA = ENTRY_DF_SCHEMA + ", mtime_ns long"

#: Serial-walk budget before list_entries restarts as the parallel
#: cluster walk (seconds).  Local filesystems list ~1M entries/s, so
#: only trees that are huge or metadata-latency-bound trip this.
SERIAL_WALK_BUDGET_S = 2.0


def strip_trailing_slash(path: str) -> str:
    """The reference strips one trailing '/' from the input dir
    (dirhash.py:323; regression test dirhash_test.py:275-279).

    A URI's ROOT slash is not a trailing slash: stripping 'file:///'
    to 'file://' (or 'hdfs://nn/' to the authority-only 'hdfs://nn')
    would turn the documented filesystem-root spelling into exactly
    the truncated URI local_root rejects — the error message would
    recommend the input the caller already provided."""
    if not (path.endswith("/") and len(path) > 1):
        return path
    head = path[:-1]
    if head.endswith("//"):
        return path  # 'file:///' — the slash IS the path component
    if "://" in head and "/" not in head.split("://", 1)[1]:
        return path  # 'hdfs://nn/' — root of an authority
    return head


def list_entries(
    root: str, spark=None, serial_budget_s: float | None = None
) -> list[Entry]:
    """Recursively list ``root`` → entries with reference conventions.

    With a SparkSession and a local path, the serial walk runs under
    ``serial_budget_s`` (default: :data:`SERIAL_WALK_BUDGET_S`, read at
    call time); on trip it restarts as the cluster-parallel walk (see
    module doc).  ``serial_budget_s=0`` forces the parallel walk;
    ``spark=None`` always walks serially with no budget.
    """
    root = strip_trailing_slash(root)
    # file:// is walked LOCALLY, same as a bare path: every listing form
    # (serial, parallel, DataFrame) must share one symlink semantics —
    # Hadoop's LocalFileSystem reports a symlinked dir as a directory
    # and walks INTO it, so routing file:// through _list_hadoop made
    # the collect and streamed folds diverge on symlink trees (and made
    # hash("file:///t") != hash("/t") on the same tree).
    local = local_root(root)
    if local is None:
        if spark is None:
            raise FileNotFoundError(f"not a directory: {root}")
        return _list_hadoop(spark, root)
    if spark is None:
        return _list_local(local)
    if serial_budget_s is None:
        serial_budget_s = SERIAL_WALK_BUDGET_S
    entries = _list_local(local, budget_s=serial_budget_s)
    if entries is None:  # budget tripped → latency/size-bound tree
        entries = parallel_list_entries(spark, local)
    return entries


def reject_undecodable_paths(entries: list[Entry]) -> None:
    """Fail CLEARLY on filenames that are not valid UTF-8.

    ``os.walk`` surrogateescapes undecodable bytes (Linux filenames are
    bytes), and such a path later explodes deep inside the pipeline —
    ``UnicodeEncodeError: surrogates not allowed`` from a worker's
    ``path.encode('utf-8')``, the fold's NUL-join, or py4j string
    transport — an opaque traceback long after the listing.  The v1
    format frames paths AS UTF-8 (the reference shares the constraint),
    so these names are unsupported by the format, not by this engine;
    say so up front, naming the path."""
    for e in entries:
        try:
            e.relative_path.encode("utf-8")
        except UnicodeEncodeError:
            raise ValueError(
                f"filename is not valid UTF-8: {e.relative_path!r} — the "
                "v1 hash format frames paths as UTF-8 (reference "
                "dirhash.py:418-441), so this tree cannot be hashed; "
                "rename the file or exclude it"
            ) from None


def _list_local(root: str, budget_s: float | None = None) -> list[Entry] | None:
    """Serial ``os.walk`` listing; returns None if ``budget_s`` elapses
    first (checked every 64 directories — cheap vs. the walk itself)."""
    if not os.path.isdir(root):
        raise FileNotFoundError(f"not a directory: {root}")
    if budget_s is not None and budget_s <= 0:
        return None
    deadline = None if budget_s is None else time.perf_counter() + budget_s
    entries: list[Entry] = []
    n_dirs = 0
    for dirpath, dirnames, filenames in os.walk(root):
        n_dirs += 1
        if deadline is not None and n_dirs % 64 == 0 and time.perf_counter() > deadline:
            return None
        for d in dirnames:
            full = os.path.join(dirpath, d)
            rel = os.path.relpath(full, root).replace(os.sep, "/")
            entries.append(Entry(rel + "/", True, 0, full))
        for f in filenames:
            full = os.path.join(dirpath, f)
            rel = os.path.relpath(full, root).replace(os.sep, "/")
            entries.append(Entry(rel, False, os.path.getsize(full), full))
            # getsize is one metadata round-trip per FILE — re-check the
            # budget inside file-heavy directories too
            if (
                deadline is not None
                and len(entries) % 1024 == 0
                and time.perf_counter() > deadline
            ):
                return None
    return entries


def _list_hadoop(spark, root: str) -> list[Entry]:
    """Walk any Hadoop-visible filesystem through the JVM gateway."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = jpath.getFileSystem(conf)
    root_uri = fs.makeQualified(jpath).toString().rstrip("/")
    entries: list[Entry] = []

    # explicit stack, not recursion: both local walks are iterative
    # (os.walk; the frontier walk), and an object-store tree nested
    # past ~1000 synthetic prefixes must not die with RecursionError
    # on the one route scheme paths are forced onto
    stack = [fs.makeQualified(jpath)]
    while stack:
        p = stack.pop()
        for status in fs.listStatus(p):
            full = status.getPath().toString()
            rel = full[len(root_uri) + 1 :]
            if status.isDirectory():
                entries.append(Entry(rel + "/", True, 0, full))
                stack.append(status.getPath())
            else:
                entries.append(Entry(rel, False, status.getLen(), full))
    return entries


def _scan_level(batches) -> Iterator:
    """Per-directory ``os.scandir`` with ``os.walk`` parity (the serial
    walk is the semantic contract; equivalence is pinned in
    tests/test_dirhash_e2e.py, including symlink trees):

    - classification FOLLOWS symlinks (``de.is_dir()``): a symlink to a
      directory lists as a dir entry, exactly as ``os.walk`` puts it in
      ``dirnames``;
    - sizes FOLLOW symlinks (``de.stat().st_size`` == the serial walk's
      ``os.path.getsize``): a symlink to a file records the target's
      byte length (a broken symlink raises OSError on both walks);
    - only REAL directories are walked into (``walk_into`` =
      ``is_dir and not is_symlink`` == ``os.walk(followlinks=False)``),
      so a symlinked directory is listed but its contents are not.
    """
    import pandas as pd

    for pdf in batches:
        rows = []
        for d in pdf["dir"]:
            for de in os.scandir(d):
                try:
                    is_dir = de.is_dir()
                except OSError:  # os.walk treats an unstatable entry as a file
                    is_dir = False
                # one stat per file entry serves size AND mtime_ns: the
                # incremental diff consumes mtime from the SAME stat
                # that sized the file (a second stat pass both doubled
                # the metadata round-trips on the latency-bound trees
                # this route exists for, and could observe a different
                # version of a concurrently-rewritten file than the
                # size did)
                st = None if is_dir else de.stat()
                rows.append(
                    (
                        de.path,
                        is_dir,
                        0 if is_dir else st.st_size,
                        is_dir and not de.is_symlink(),
                        0 if is_dir else st.st_mtime_ns,
                    )
                )
        yield pd.DataFrame(
            rows, columns=["path", "is_dir", "size", "walk_into", "mtime_ns"]
        )


_SCAN_LEVEL_SCHEMA = (
    "path string, is_dir boolean, size long, walk_into boolean, mtime_ns long"
)


def _level_frontier_walk(spark, local_root: str, level_partitions: int):
    """Shared core of the cluster walks: yield one localCheckpoint'd
    DataFrame of ``_SCAN_LEVEL_SCHEMA`` rows per tree level.  Only the
    directory frontier — one level at a time — returns to the driver;
    the checkpoint means later consumers (union / collect) re-read
    materialized metadata rows, never the filesystem."""
    frontier = [local_root]
    while frontier:
        level = (
            spark.createDataFrame([(d,) for d in frontier], "dir string")
            .repartition(min(level_partitions, max(1, len(frontier))))
            .mapInPandas(_scan_level, _SCAN_LEVEL_SCHEMA)
            .localCheckpoint()
        )
        frontier = [
            r["path"]
            for r in level.where("walk_into").select("path").collect()
            # bounded: one tree LEVEL of directory paths — the walk
            # frontier a serial walk would also hold
        ]
        yield level


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
    listings instead of 1M serial ones), and the non-symlink children
    directories form the next frontier.

    Output is the same ``Entry`` list with the same conventions —
    byte-identical fold input, pinned against :func:`list_entries` in
    tests/test_dirhash_e2e.py (symlink trees included; see
    :func:`_scan_level` for the parity rules).  The listing itself
    still returns to the driver (metadata: ~hundred MB at millions of
    files — the accepted bound; :func:`list_entries_df` is the form
    that keeps it cluster-side).

    Local/shared-filesystem paths only: executors list with
    ``os.scandir``, which is correct wherever the tree is mounted on
    every worker (local mode, NFS, Lustre).  For ``hdfs://``-scheme
    roots the executors would need a worker-side Hadoop client
    (pyarrow ``HadoopFileSystem`` + libhdfs — not shipped in this
    container), so those fall back to the serial JVM-gateway walk
    rather than silently producing an empty listing.
    """
    root = strip_trailing_slash(root)
    local = local_root(root)
    if local is None:
        return list_entries(root, spark)  # serial fallback (see doc)
    if not os.path.isdir(local):
        raise FileNotFoundError(f"not a directory: {local}")

    entries: list[Entry] = []
    for level in _level_frontier_walk(spark, local, level_partitions):
        for r in level.collect():
            # bounded: one tree LEVEL of (path, is_dir, size) metadata
            # triples — the same rows a serial walk would hold anyway
            rel = os.path.relpath(r["path"], local).replace(os.sep, "/")
            if r["is_dir"]:
                entries.append(Entry(rel + "/", True, 0, r["path"]))
            else:
                entries.append(Entry(rel, False, int(r["size"]), r["path"]))
    return entries


def listing_for_fold(
    spark,
    root: str,
    serial_budget_s: float | None = None,
    with_mtime: bool = False,
) -> tuple[list[Entry] | None, "object"]:
    """Serial-budget router for the streamed fold: returns
    ``(entries, None)`` when the serial walk finishes inside the budget
    — by that very measurement the listing fits the driver, so the fold
    keeps its zero-Spark-job driver-side header (each metadata job on a
    warm local session costs ~0.3-0.6 s of fixed overhead; paying three
    of them to "stream" a 9-row listing halved the measured streamed-
    fold throughput in r11 profiling) — else ``(None, entries_df)``
    with the cluster-side level walk, where the listing never
    materializes on the driver at all.  Scheme paths use the serial
    JVM-gateway walk (same reason as :func:`parallel_list_entries`)."""
    root = strip_trailing_slash(root)
    local = local_root(root)
    if local is None:
        return list_entries(root, spark), None
    if not os.path.isdir(local):
        raise FileNotFoundError(f"not a directory: {local}")
    if serial_budget_s is None:
        serial_budget_s = SERIAL_WALK_BUDGET_S
    if serial_budget_s > 0:
        entries = _list_local(local, budget_s=serial_budget_s)
        if entries is not None:
            return entries, None
    return None, list_entries_df(
        spark, root, serial_budget_s=0, with_mtime=with_mtime
    )


def list_entries_df(
    spark,
    root: str,
    level_partitions: int = 32,
    serial_budget_s: float | None = None,
    with_mtime: bool = False,
):
    """DataFrame twin of :func:`list_entries` (schema
    :data:`ENTRY_DF_SCHEMA`) for folds that stream the listing
    (``hash_directory_raw_streamed``): entry rows stay cluster-side in
    per-level localCheckpoint'd DataFrames; only the directory
    frontier — one level at a time — ever returns to the driver.

    Small/fast trees (the serial walk finishes inside
    ``serial_budget_s``) short-circuit to the driver walk +
    ``createDataFrame``: their metadata fits the driver by that very
    measurement, and a per-level Spark-job cadence would only add fixed
    overhead.  ``serial_budget_s=0`` forces the cluster-side walk
    (tests pin route equality).  Scheme paths go through the serial
    JVM-gateway walk (same reason as :func:`parallel_list_entries`).

    ``with_mtime=True`` appends an ``mtime_ns`` column (0 for dirs) for
    consumers that diff listings against a manifest — on the cluster
    route it rides the SAME ``scandir`` stat that sized the entry (no
    second metadata pass over a latency-bound tree, and size/mtime are
    a consistent snapshot under concurrent rewrites); on the serial
    short-circuit the budget already proved the tree driver-sized, so
    the driver stats it.  Local roots only (a non-local scheme with
    ``with_mtime`` raises — no caller needs it, better loud than a
    silent schema change).
    """
    root = strip_trailing_slash(root)
    local = local_root(root)
    if local is None:
        if with_mtime:
            raise ValueError(
                f"with_mtime requires a locally-walkable root, got {root!r}"
            )
        entries = list_entries(root, spark)
        return spark.createDataFrame(
            [(e.relative_path, e.is_dir, e.size, e.full_path) for e in entries],
            ENTRY_DF_SCHEMA,
        )
    if not os.path.isdir(local):
        raise FileNotFoundError(f"not a directory: {local}")
    if serial_budget_s is None:
        serial_budget_s = SERIAL_WALK_BUDGET_S
    if serial_budget_s > 0:
        entries = _list_local(local, budget_s=serial_budget_s)
        if entries is not None:
            if with_mtime:
                return spark.createDataFrame(
                    [
                        (
                            e.relative_path,
                            e.is_dir,
                            e.size,
                            e.full_path,
                            0 if e.is_dir else os.stat(e.full_path).st_mtime_ns,
                        )
                        for e in entries
                    ],
                    ENTRY_MTIME_DF_SCHEMA,
                )
            return spark.createDataFrame(
                [(e.relative_path, e.is_dir, e.size, e.full_path) for e in entries],
                ENTRY_DF_SCHEMA,
            )

    from pyspark.sql import functions as F

    levels = list(_level_frontier_walk(spark, local, level_partitions))
    df = levels[0]
    for lv in levels[1:]:
        df = df.union(lv)
    # Children paths are os.path.join(parent, name) descending from
    # the local root, so the relative path is a fixed-length prefix strip
    # (substring positions count the same code points Python len does).
    # The joining '/' is only appended when the local root doesn't already
    # end with one — computing the strip length from the rstrip'd root
    # keeps a '/' root (children '/name') from silently losing
    # the first character of every relative path.
    rel = F.expr(f"substring(path, {len(local.rstrip('/')) + 2})")
    cols = [
        F.when(F.col("is_dir"), F.concat(rel, F.lit("/"))).otherwise(rel).alias(
            "relative_path"
        ),
        F.col("is_dir"),
        F.col("size").cast("long").alias("size"),
        F.col("path").alias("full_path"),
    ]
    if with_mtime:
        cols.append(F.col("mtime_ns").cast("long").alias("mtime_ns"))
    return df.select(*cols)
