"""Sampled layout-invariance tripwire.

The full sweep (scripts/layout_invariance_sweep.py, artifact
LAYOUT_INVARIANCE_r{N}.json) runs every registered query under two
radically different physical layouts and requires identical value
multisets — the 1000-executor concern a single-layout test never
exercises (task counts, scan splits, and partial-aggregation grouping
all change on a cluster; any result depending on them is a silent
wrong answer).  This pytest version keeps a representative sample of
the riskiest shapes under the same check so a regression trips at
commit time, not at round end.
"""

from __future__ import annotations

from dirhash_spark.registry import all_queries
from tests.oracle_harness import _rows_to_multiset

SF = "/root/testdata/sf0.01"

#: One of each risk shape: float aggregation (flagship), window with
#: tie-break ordering (win_running), checkpointed diamond (text_tfidf),
#: global-first-occurrence window (text_span_dedup), per-partition
#: numpy partials reduced on the driver (embedding_pca), Arrow-batched
#: groupBy-applyInPandas with per-list BLAS blocks (dedup_embedding_ann).
SAMPLE = [
    "flagship_revenue_by_nation",
    "win_running",
    "text_tfidf",
    "text_span_dedup",
    "embedding_pca",
    "dedup_embedding_ann",
]


def _layout_b():
    """The sweep's adversarial layout — imported, not copied, so this
    tripwire can never drift from the round-end artifact's layout."""
    import importlib.util
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "layout_invariance_sweep",
        os.path.join(repo, "scripts", "layout_invariance_sweep.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.LAYOUT_B


LAYOUT_B = _layout_b()


def test_sampled_queries_layout_invariant(spark):
    qs = all_queries()

    def run(name):
        df = qs[name].fn(spark, SF)
        cols = list(df.columns)
        return sorted(cols), _rows_to_multiset([tuple(r) for r in df.collect()], cols)

    a = {n: run(n) for n in SAMPLE}
    saved = {k: spark.conf.get(k, None) for k in LAYOUT_B}
    try:
        for k, v in LAYOUT_B.items():
            spark.conf.set(k, v)
        b = {n: run(n) for n in SAMPLE}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    for n in SAMPLE:
        assert a[n][0] == b[n][0], f"{n}: column sets differ across layouts"
        if a[n][1] != b[n][1]:
            only_a = list((a[n][1] - b[n][1]).items())[:2]
            only_b = list((b[n][1] - a[n][1]).items())[:2]
            raise AssertionError(
                f"{n}: result depends on physical layout; "
                f"A-only={only_a} B-only={only_b}"
            )
