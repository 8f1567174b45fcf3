#!/usr/bin/env python
"""ANN-family scaling measurement: brute force vs IVF-indexed vs IVFPQ
as the corpus grows 2k → 20k → 100k vectors.

The similarity family's 100 TB claim decomposes into two levers this
script separates:

- the PRUNING lever measured here at fixed K=16/nprobe=6: the indexed
  queries read nprobe/K of the corpus (partition pruning), and IVFPQ
  reads that slice as ~50x-compressed codes — so their wall should
  grow far slower than the brute-force scan's as N grows;
- the LIST-SIZE lever (K ∝ N) measured by scripts/semdedup_bench.py —
  production scales K to hold |list| fixed, which keeps per-task work
  constant; it is deliberately NOT applied here so the same query
  plans are compared across sizes.

Corpora: the real sf0.1 table (2000 vectors) plus seeded gaussian
synthetics at 20k/100k (same 64-dim shape, vec_id 0 = probe).  Also
records recall@10 vs brute force per size (near-uniform gaussian is
the recall worst case — candidate share ~ nprobe/K) and the one-time
index build wall (the ingest-side cost the query path amortizes).

Usage: python scripts/ann_scale_bench.py
Prints one JSON line per size plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_corpus(n: int, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(4242)
    V = rng.standard_normal((n, 64)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "embedding": pa.array([v.tolist() for v in V], pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32), pa.int32()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, os.path.join(path, "embeddings.parquet"))


def main() -> int:
    from dirhash_spark.operators.similarity import build_ann_index
    from dirhash_spark.registry import all_queries
    from dirhash_spark.session import get_spark

    spark = get_spark("ann_scale_bench")
    qs = all_queries()
    variants = ["sim_topk_cosine", "sim_ann_ivf_indexed", "sim_ann_ivfpq"]
    summary: dict[str, dict] = {}

    for n in (2000, 20_000, 100_000):
        if n == 2000:
            sf_dir = "/root/testdata/sf0.1"
        else:
            sf_dir = os.path.join(tempfile.gettempdir(), f"ann_scale_{n}")
            _write_corpus(n, sf_dir)

        t0 = time.perf_counter()
        assert build_ann_index(spark, sf_dir) is not None  # corpora are non-empty
        build_s = round(time.perf_counter() - t0, 2)

        row = {"build_index_s": build_s}
        exact: set[int] = set()
        for name in variants:
            got = qs[name].fn(spark, sf_dir).collect()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                rows = qs[name].fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            ids = {r["vec_id"] for r in rows}
            if name == "sim_topk_cosine":
                exact = ids
            else:
                row[f"recall_{name}"] = round(len(ids & exact) / len(exact), 2)
            row[f"{name}_s"] = round(best, 3)
        summary[str(n)] = row
        print(f"# n={n}: {row}", file=sys.stderr)

    print(json.dumps({"metric": "ann wall vs corpus size (fixed K=16/nprobe=6)",
                      "sizes": summary}))
    for n in (20_000, 100_000):
        shutil.rmtree(os.path.join(tempfile.gettempdir(), f"ann_scale_{n}"), True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
