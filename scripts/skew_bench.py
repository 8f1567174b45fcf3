#!/usr/bin/env python
"""Skew mitigation, measured: 10M-row synthetic table where ONE key owns
half the rows.

Finding 1 (negative, kept on purpose): COUNT(DISTINCT) per key does NOT
need manual salting — Catalyst's distinct-aggregate rewrite already
shuffles on (key, value) first, which splits the hot key across
reducers (measured 0.92x: salting adds a shuffle for nothing).

Finding 2: aggregations Catalyst cannot rewrite — set/list-building
state like collect_set, exact medians, custom UDAF state — DO pile the
hot key's entire state onto one reducer, and the salted two-phase form
fixes exactly that.  This script measures that case: distinct-user-set
size per key via collect_set, naive vs salted.

Run: python scripts/skew_bench.py   (numbers recorded in BASELINE.md)
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = 10_000_000


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    # Half the rows share key 'hot'; the rest spread over 1000 keys.
    # user ids: ~1M distinct under the hot key (the state that lands on
    # ONE reducer in the naive plan).
    df = spark.range(N).select(
        F.when(F.col("id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.pmod(F.xxhash64("id"), F.lit(1000))))
        .alias("key"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(1_000_000)).alias("user"),
    )
    df.write.mode("overwrite").parquet("/tmp/dirhash_bench/skewed")
    t = spark.read.parquet("/tmp/dirhash_bench/skewed")

    def run(frame) -> float:
        frame.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            frame.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    # collect_set state cannot be rewritten by the planner: the naive
    # form builds the hot key's ~1M-element set on ONE reducer.
    naive = t.groupBy("key").agg(F.size(F.collect_set("user")).alias("n_users"))

    # Salt by hash(value): each distinct user lands in exactly one
    # (key, salt) cell, so summing per-cell set sizes is exact.
    salted = (
        t.select("key", "user", F.pmod(F.xxhash64("user"), F.lit(64)).alias("salt"))
        .groupBy("key", "salt")
        .agg(F.size(F.collect_set("user")).alias("cell"))
        .groupBy("key")
        .agg(F.sum("cell").alias("n_users"))
    )

    a, b = run(naive), run(salted)
    same = sorted(map(tuple, naive.collect())) == sorted(map(tuple, salted.collect()))
    print(f"rows={N}  naive={a:.2f}s  salted={b:.2f}s  speedup={a / b:.2f}x  identical={same}")
    spark.stop()


if __name__ == "__main__":
    main()
