#!/usr/bin/env python
"""One-snapshot oracle sweep: run EVERY registered query at a single
code state and record the verdicts in one artifact.

The external driver verifies a 50-query prefix window per round, so its
green wall accumulates across rounds (and code states).  This sweep
removes that caveat: one run, all queries, one commit hash.

Usage: python scripts/oracle_snapshot.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "ORACLE_SNAPSHOT.json"

    from dirhash_spark.registry import all_queries
    from dirhash_spark.session import get_spark
    from tests.oracle_harness import compare, make_duckdb

    spark = get_spark("oracle_snapshot")
    con = make_duckdb(sf_dir)
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip()

    results: dict[str, dict] = {}
    n_ok = n_rows_only = n_fail = 0
    for name, q in all_queries().items():
        try:
            if q.oracle is None:
                df = q.fn(spark, sf_dir)
                results[name] = {
                    "mode": "rows_only",
                    "spark_rows": df.count(),
                    "match": None,
                }
                n_rows_only += 1
            else:
                rep = compare(q.fn(spark, sf_dir), con, q.oracle)
                results[name] = {
                    "mode": "oracle",
                    "match": rep["match"],
                    "spark_rows": rep["spark_rows"],
                    "duck_rows": rep["duck_rows"],
                    "detail": rep["detail"],
                }
                if rep["match"]:
                    n_ok += 1
                else:
                    n_fail += 1
        except Exception as e:  # noqa: BLE001 — record, don't abort the sweep
            results[name] = {"mode": "error", "match": False, "detail": repr(e)[:300]}
            n_fail += 1
        print(f"# {name}: {results[name].get('match')}", file=sys.stderr)

    artifact = {
        "commit": commit,
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "n_oracle_match": n_ok,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({k: artifact[k] for k in
                      ("commit", "n_queries", "n_oracle_match", "n_rows_only", "n_fail")}))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
