"""Python-worker daemon with the heavyweight imports preloaded.

Spark's Python workers are forked from a per-executor daemon process
(``pyspark.daemon``).  A freshly forked worker that hits an
Arrow/pandas stage pays the numpy+pandas+pyarrow import chain at first
use — measured ~1 s wall / ~3 s sys EACH on this box, and the first
task wave spawns one worker per core, so the imports land concurrently
and serialize on kernel time (the "spawn storm" behind the bimodal
1x→3x swings recorded for dedup_verbatim_runs / pipeline_neardup_e2e /
dedup_containment in OPTIMIZATION_r14.md).

Importing those modules ONCE in the daemon parent — before it forks —
makes every forked worker inherit the already-initialized modules
through copy-on-write memory: guide §4.3 "heavyweight init once per
task" applied one level earlier, once per EXECUTOR.  At cluster scale
the same preload amortizes worker churn across thousands of task
slots; nothing here is local-mode-specific.

Wired up by ``session.get_spark`` via ``spark.python.daemon.module``
(a plain Spark conf, read at SparkContext start).  The import failures
are tolerated so a slim environment (no pandas) degrades to exactly
the stock daemon behavior.
"""

from __future__ import annotations

import importlib

for _mod in ("numpy", "pandas", "pyarrow", "pyarrow.parquet"):
    try:  # pragma: no cover - trivial import loop
        importlib.import_module(_mod)
    except Exception:
        pass

if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
