"""Sampled skew tripwire — correctness under pathological key distribution.

The layout sweep attacks physical partitioning; this attacks the OTHER
cluster-scale axis: a corpus where one key owns 20-30% of the rows.
scripts/make_skewed_corpus.py builds a deterministic skewed copy of
sf0.01 (one order with ~12k lineitems, one user with ~3k events, a
~125-doc near-dup template cluster sharing a lang/length block, a
143-vector dense cosine cone); the round-end artifact
SKEW_SNAPSHOT_r{N}.json replays the FULL oracle harness against it
(r9: 237 queries / 220 oracle-exact / 0 fail).  This pytest version
keeps one query per hot-key shape under the same Spark-vs-DuckDB
check so a skew regression trips at commit time:

- ``flagship_revenue_by_nation`` — hot FK through the join/agg chain
- ``sessionize_batch``           — hot user under a session window
- ``dedup_levenshtein``          — hot (lang, length-bucket) block,
                                   5 -> ~8k verified pairs
- ``dedup_containment``          — hot gram bucket, 50 -> ~16k pairs
- ``topk_per_group``             — skewed group sizes under rank-k
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from dirhash_spark.registry import all_queries
from tests.oracle_harness import compare, make_duckdb

SAMPLE = [
    "flagship_revenue_by_nation",
    "sessionize_batch",
    "dedup_levenshtein",
    "dedup_containment",
    "topk_per_group",
]


def _builder():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "make_skewed_corpus",
        os.path.join(repo, "scripts", "make_skewed_corpus.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skewdata"))
    info = _builder().build("/root/testdata/sf0.01", out)
    assert info["dense_cone_vectors"] > 100
    return out


def test_skew_is_actually_injected(skew_dir, spark):
    """The fixture must stay adversarial: if the generator regresses to
    a balanced corpus, every downstream assertion here goes vacuous."""
    li = spark.read.parquet(f"{skew_dir}/lineitem.parquet")
    top = li.groupBy("l_orderkey").count().orderBy("count", ascending=False).first()
    assert top["count"] > 10_000, top
    ev = spark.read.parquet(f"{skew_dir}/events.parquet")
    top_u = ev.groupBy("user_id").count().orderBy("count", ascending=False).first()
    assert top_u["count"] > 2_000, top_u


def test_sampled_queries_oracle_exact_under_skew(skew_dir, spark):
    qs = all_queries()
    con = make_duckdb(skew_dir)
    failures = []
    for name in SAMPLE:
        df = qs[name].fn(spark, skew_dir)
        report = compare(df, con, qs[name].oracle)
        if not report["match"]:
            failures.append(f"{name}: {report['detail']}")
    assert not failures, "skew mismatches:\n" + "\n".join(failures)


def test_witness_queries_are_tagged_and_mechanically_skippable():
    """Deliberate scale-witness queries (pairwise as-of: unbounded
    row-multiplication on a skewed corpus — the recorded r9 sf0.1
    by-design negative) must be excluded from skew sweeps by TAG, not
    by footnote: the tag exists, the sweep's --skip-tags parser honors
    it, and no production query accidentally carries it."""
    qs = all_queries()
    witnesses = sorted(n for n, q in qs.items() if "witness" in q.tags)
    assert witnesses == ["join_asof_pairwise"]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "oracle_snapshot", os.path.join(repo, "scripts", "oracle_snapshot.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sf, out, tags = mod.parse_args(
        ["/tmp/x", "OUT.json", "--skip-tags", "witness"]
    )
    assert (sf, out) == ("/tmp/x", "OUT.json")
    assert tags & set(qs["join_asof_pairwise"].tags)
    assert not tags & set(qs["join_asof"].tags)  # production form runs
