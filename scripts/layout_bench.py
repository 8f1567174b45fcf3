#!/usr/bin/env python
"""Write-time layout, measured: does Z-order clustering actually pay?

10M rows (cust 0..9999, day 0..3649, payload) written three ways —
unsorted, single-column sorted (cust), Morton Z-ordered (cust, day) —
with small parquet row groups so min/max statistics have something to
skip.  The probe queries filter a narrow range on ONE dimension or on
BOTH; each scan is timed steady-state (warm + min-of-2).

Expected shape (and why): single-column sort wins its own column and
does nothing for the other; Z-order is slightly worse than the
dedicated sort on either single column but close-to-sorted on BOTH —
the standard multi-dimensional clustering trade (numbers in
BASELINE.md).

Run: python scripts/layout_bench.py
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = 10_000_000
BASE = "/tmp/dirhash_bench/layout"


def morton16(a, b):
    code = F.lit(0).cast("long")
    for i in range(16):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return code


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        # small row groups -> many min/max stat ranges per file
        .config("spark.hadoop.parquet.block.size", str(1 * 1024 * 1024))
        .getOrCreate()
    )
    df = spark.range(N).select(
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("cust"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(3_650)).alias("day"),
        F.pmod(F.xxhash64(F.col("id") + 2), F.lit(1_000_000)).alias("payload"),
    )
    layouts = {
        "unsorted": lambda d: d.repartition(8),
        "sorted_cust": lambda d: d.repartition(8).sortWithinPartitions("cust"),
        "zorder": lambda d: d.withColumn("z", morton16(F.col("cust"), F.col("day")))
        .repartition(8)
        .sortWithinPartitions("z")
        .drop("z"),
    }
    for name, fn in layouts.items():
        path = os.path.join(BASE, name)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            fn(df).write.mode("overwrite").parquet(path)

    # Deterministic, noise-free measurement: the fraction of row groups
    # whose [min, max] statistics overlap the predicate — exactly what
    # the parquet reader must read (wall-clock at this scale is noise).
    probes = {
        "cust_range": {"cust": (100, 199)},
        "day_range": {"day": (1000, 1099)},
        "both_ranges": {"cust": (100, 199), "day": (1000, 1099)},
    }

    def overlap_share(path: str, preds: dict) -> float:
        import pyarrow.parquet as pq

        total = kept = 0
        for fname in os.listdir(path):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, fname)).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                total += 1
                ok = True
                for col, (lo, hi) in preds.items():
                    st = md.row_group(rg).column(names[col]).statistics
                    if st is not None and (st.max < lo or st.min > hi):
                        ok = False
                        break
                kept += ok
        return kept / total if total else 1.0

    print(f"{'probe':<12}" + "".join(f"{k:>14}" for k in layouts) + "   (row groups read, lower=better)")
    for pname, preds in probes.items():
        shares = [overlap_share(os.path.join(BASE, k), preds) for k in layouts]
        print(f"{pname:<12}" + "".join(f"{s:>13.1%}" for s in shares))
    spark.stop()


if __name__ == "__main__":
    main()
