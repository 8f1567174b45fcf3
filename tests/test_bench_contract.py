"""bench.py output contract — the driver parses the LAST JSON line
from stdout per run, so the FINAL line must be the full per-query
record (the r14 PERF artifact lost per-query and scaling comparisons
when a compact trailer sat last — r14 verdict item 1).  The compact
totals line comes FIRST so the driver's fixed-size tail capture can
never truncate away the headline numbers (it lost them in the r7
artifact).  A silent format regression would lose the round's
performance record, so the contract is tested end-to-end
(subprocess, tiny SF).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_full_json_last():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001", SPARK_GRAFT_CPUS="8")
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 2, lines
    # leading line: compact totals that must agree with the full line
    t = json.loads(lines[0])
    # LAST line: the full record the driver parses — must carry "queries"
    d = json.loads(lines[1])
    assert t["metric"] == "headline_totals_compact"
    assert t["value"] == d["value"]
    assert t["headline_v2_total"] == d["headline_v2_total"]
    assert t["canary_sha256_mbps"] == d["canary_sha256_mbps"]
    assert set(d) >= {"metric", "value", "unit", "queries", "sf"}
    assert d["unit"] == "sec" and d["sf"] == 0.001
    assert len(d["queries"]) >= 15
    assert all(isinstance(v, (int, float)) and v >= 0 for v in d["queries"].values())
    assert abs(d["value"] - round(sum(d["queries"].values()), 3)) < 0.01
    # headline_v2 (round-5 composition change): v1 total stays stable
    # for trend comparison; v2 = v1 members + the promoted round-4 ops,
    # all timed once under extra_queries and summed, never re-run.
    promoted = {
        "scd2_history",
        "embedding_quantize_int8",
        "pack_sequences",
        "udtf_python_chunker",
    }
    assert set(d["headline_v2_members"]) == set(d["queries"]) | promoted
    expect_v2 = sum(d["queries"].values()) + sum(
        d["extra_queries"][n] for n in promoted
    )
    assert abs(d["headline_v2_total"] - round(expect_v2, 3)) < 0.01
