#!/usr/bin/env python
"""A/B: window-form vs aggregate-form span dedup on a hot-span corpus.

The r10 rewrite replaced ``row_number() OVER (PARTITION BY span_text)``
with ``groupBy(span_text).agg(min(struct(doc_id, span_idx)))`` in
``text_span_dedup`` on the argument that a window admits no map-side
partial aggregation, so a mega-hot boilerplate span funnels every
occurrence into ONE task.  This script measures that argument instead
of asserting it: it builds a corpus where one 5-word boilerplate span
recurs ``HOT_REPEATS`` times inside every document (so the hot key owns
``n_docs x HOT_REPEATS`` of all spans), then times both forms end to
end and reports the max-task skew of the span-keyed stage.

Usage: python scripts/span_dedup_skew_ab.py [n_doc_copies] [hot_repeats]
Defaults: 20 copies of sf0.01 documents (10k docs), 40 hot repeats per
doc -> the hot span owns ~400k of ~1.5M spans (~27%).

Both forms compute the identical keep-set (asserted on the per-doc
n_kept multiset) — this is a physical-plan A/B, not a semantics change.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from dirhash_spark.operators.text import _SPAN_W  # noqa: E402
from dirhash_spark.session import get_spark  # noqa: E402

BOILER = "terms of service apply here"  # exactly _SPAN_W words


def build_corpus(spark, n_copies: int, hot_repeats: int) -> str:
    out = os.path.join(tempfile.gettempdir(), "hotspan_corpus")
    shutil.rmtree(out, ignore_errors=True)
    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    n_base = base.count()
    hot = " ".join([BOILER] * hot_repeats)
    copies = spark.range(n_copies).select(F.col("id").alias("copy"))
    (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * (n_base * 10)).alias("doc_id"),
            # hot block FIRST and span-aligned: every document contributes
            # hot_repeats occurrences of the identical boilerplate span
            F.concat(F.lit(hot + " "), F.col("text")).alias("text"),
        )
        # 32 scan partitions: a single-file corpus would run BOTH forms
        # as one task and erase the skew contrast this A/B exists for
        .repartition(32)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def spans_of(docs):
    w = F.split("text", " ")
    n_spans = F.ceil(F.size(w) / _SPAN_W).cast("int")
    return docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.array_join(F.slice(w, i * _SPAN_W + 1, _SPAN_W), " "),
            )
        ).alias("span_idx", "span_text"),
    )


def window_form(docs):
    """The pre-r10 plan: first occurrence via row_number window."""
    first = Window.partitionBy("span_text").orderBy("doc_id", "span_idx")
    ranked = spans_of(docs).withColumn("rn", F.row_number().over(first))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        )
    )


def aggregate_form(docs):
    """The r10 plan: groupBy + min(struct), winners are the kept set."""
    winners = (
        spans_of(docs)
        .groupBy("span_text")
        .agg(F.min(F.struct("doc_id", "span_idx")).alias("first_at"))
        .select(F.col("first_at.doc_id").alias("doc_id"))
    )
    kept = winners.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_kept"))
    w = F.split("text", " ")
    totals = docs.select(
        "doc_id", F.ceil(F.size(w) / _SPAN_W).cast("bigint").alias("n_spans")
    )
    return totals.join(kept, "doc_id", "left").select(
        "doc_id", "n_spans", F.coalesce("n_kept", F.lit(0)).alias("n_kept")
    )


def main() -> int:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    hot_repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark("span_dedup_skew_ab")
    src = build_corpus(spark, n_copies, hot_repeats)
    docs = spark.read.parquet(src)
    n_docs = docs.count()
    hot_share = spans_of(docs).where(F.col("span_text") == BOILER).count()
    total = spans_of(docs).count()
    print(f"# corpus: {n_docs} docs, {total} spans, hot span owns "
          f"{hot_share} ({100 * hot_share // total}%)", file=sys.stderr)

    results = {}
    for name, fn in (("window", window_form), ("aggregate", aggregate_form)):
        fn(docs).count()  # warm (plan compile + codegen + scan cache)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)
        print(f"# {name}: {results[name]} s", file=sys.stderr)

    a = sorted(map(tuple, window_form(docs).collect()))  # bounded: n_docs rows
    b = sorted(map(tuple, aggregate_form(docs).collect()))  # bounded: n_docs rows
    assert a == b, "keep-sets diverge — the A/B is void"
    import json

    print(json.dumps({
        "n_docs": n_docs, "n_spans": total, "hot_span_rows": hot_share,
        "window_s": results["window"], "aggregate_s": results["aggregate"],
        "speedup": round(results["window"] / results["aggregate"], 2),
    }))
    spark.stop()
    shutil.rmtree(src, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
