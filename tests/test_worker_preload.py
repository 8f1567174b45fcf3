"""Python-worker daemon preload (dirhash_spark.worker_preload).

get_spark points ``spark.python.daemon.module`` at a daemon that
imports numpy/pandas/pyarrow BEFORE forking workers, so every worker
inherits the initialized modules copy-on-write instead of paying the
import chain per process (the r14 "spawn storm" fix — see
OPTIMIZATION_r14.md).  These tests pin (a) that the session the suite
runs under actually carries the conf, and (b) that forked workers
really do see the modules pre-imported — if the daemon module failed
to import, Spark would fall back loudly (worker creation errors), but
a silent regression to the stock daemon would only show up as the
variance class returning, which no functional test catches.
"""

from __future__ import annotations


def test_session_uses_preload_daemon(spark):
    conf = spark.sparkContext.getConf()
    assert (
        conf.get("spark.python.daemon.module", "pyspark.daemon")
        == "dirhash_spark.worker_preload"
    )


def test_workers_inherit_heavy_imports(spark):
    def probe(_):
        import sys

        return [("pandas" in sys.modules, "numpy" in sys.modules)]

    got = (
        spark.sparkContext.parallelize(range(2), 2).mapPartitions(probe).collect()
    )
    assert got and all(p and n for p, n in got), got


def test_preload_module_is_daemon_compatible():
    """The module must stay importable with no side effects beyond the
    imports (the daemon runs `python -m dirhash_spark.worker_preload`;
    an exception at import time would kill EVERY Python stage)."""
    import importlib

    import dirhash_spark.worker_preload as wp

    importlib.reload(wp)
