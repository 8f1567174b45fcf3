#!/usr/bin/env python
"""Layout-invariance sweep: every registered query must produce the
SAME value multiset under two radically different physical layouts.

On a 1000-executor cluster nothing about the physical layout local
tests run under survives: task counts differ, scan splits differ,
partial-aggregation grouping differs, and any result that depends on
them (float summation order reaching an un-rounded output, a first()/
limit() without a total order, a per-partition id leaking into output)
is a silent wrong-answer that no single-layout test can see.  This
sweep is the empirical check of the repo's float/determinism
discipline, in the spirit of the round-8 scan-diamond sweep:

  pass A: the test default (spark.sql.shuffle.partitions=32, default
          file split sizing);
  pass B: spark.sql.shuffle.partitions=7 (prime, != any fixture's file
          count) and spark.sql.files.maxPartitionBytes=1MB +
          openCostInBytes=0, which fractures every parquet scan into
          many small input splits.

Both passes run in ONE session (these are runtime confs), so trained
in-process artifacts (IVF centroids, PQ codebooks) are shared and the
comparison isolates LAYOUT, not training.

Usage: python scripts/layout_invariance_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The adversarial layout — single source of truth, imported by the
#: pytest tripwire (tests/test_layout_invariance.py) so the sampled
#: check can never drift from the round-end artifact's layout.
LAYOUT_B = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(1 << 20),
    "spark.sql.files.openCostInBytes": "0",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "LAYOUT_INVARIANCE.json"

    from dirhash_spark.registry import all_queries
    from dirhash_spark.session import get_spark
    from tests.oracle_harness import _rows_to_multiset

    spark = get_spark("layout_invariance_sweep")
    baseline = {
        k: spark.conf.get(k, None) for k in LAYOUT_B
    }
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip()

    def run_all(tag: str) -> dict[str, tuple]:
        out: dict[str, tuple] = {}
        for name, q in all_queries().items():
            try:
                df = q.fn(spark, sf_dir)
                cols = list(df.columns)
                ms = _rows_to_multiset([tuple(r) for r in df.collect()], cols)
                out[name] = (sorted(cols), ms)
            except Exception as e:  # noqa: BLE001 — record, don't abort sweep
                out[name] = ("ERROR", repr(e)[:200])
            status = "ERROR" if out[name][0] == "ERROR" else "ok"
            print(f"# {tag} {name}: {status}", file=sys.stderr)
        return out

    a = run_all("A")
    for k, v in LAYOUT_B.items():
        spark.conf.set(k, v)
    try:
        b = run_all("B")
    finally:
        for k, v in baseline.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    results: dict[str, dict] = {}
    n_ok = n_fail = 0
    for name in a:
        ca, ma = a[name]
        cb, mb = b[name]
        if ca == "ERROR" or cb == "ERROR":
            ok, detail = False, f"error: A={ma if ca == 'ERROR' else ''} B={mb if cb == 'ERROR' else ''}"
        elif ca != cb:
            ok, detail = False, "column sets differ"
        elif ma != mb:
            only_a = list((ma - mb).items())[:2]
            only_b = list((mb - ma).items())[:2]
            ok, detail = False, f"multisets differ; A-only={only_a} B-only={only_b}"
        else:
            ok, detail = True, ""
        n_ok += ok
        n_fail += not ok
        results[name] = {"invariant": ok, "detail": detail}

    artifact = {
        "commit": commit,
        "sf_dir": sf_dir,
        "layout_b": LAYOUT_B,
        "n_queries": len(results),
        "n_invariant": n_ok,
        "n_fail": n_fail,
        "failures": sorted(n for n, r in results.items() if not r["invariant"]),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({k: artifact[k] for k in (
        "commit", "n_queries", "n_invariant", "n_fail", "failures")}))
    spark.stop()
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
