"""Driver-materialization discipline — the no-unbounded-collect guard.

An operator that iterates over ``.collect()`` results is not
distributed: at 100 TB the driver becomes the bottleneck (or OOMs)
long before any executor does.  The engine's rule is that every
driver-side materialization must be BOUNDED — by a ``limit()``, by the
group cardinality of a K-row aggregate, by digest-only rows, or by a
memory sink that is driver-resident by definition — and must SAY SO at
the call site.

This static guard scans every ``.py`` under ``dirhash_spark/`` for
``.collect()`` / ``.toPandas()`` / ``.toLocalIterator()`` call sites
and fails unless a ``bounded`` justification comment sits within two
lines.  A new operator that quietly ships rows to the driver therefore
fails the suite until its author states the bound — the same
self-enforcing shape as the CacheManager-leak guard in test_plans.py.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "dirhash_spark"

_CALL = re.compile(r"\.(collect|toPandas|toLocalIterator)\(\)")
_MARK = re.compile(r"bounded", re.IGNORECASE)

# Two lines of slack: the justification may lead the fluent chain or
# trail the call as an inline comment.
_WINDOW = 2


def _sites(path: pathlib.Path):
    lines = path.read_text().splitlines()
    for i, line in enumerate(lines):
        if line.lstrip().startswith("#"):
            continue  # commented-out code / prose mentioning the call
        if _CALL.search(line):
            lo, hi = max(0, i - _WINDOW), min(len(lines), i + _WINDOW + 1)
            yield i + 1, line.strip(), any(
                _MARK.search(lines[j]) for j in range(lo, hi)
            )


def test_every_driver_materialization_declares_its_bound():
    unjustified = []
    total = 0
    for path in sorted(PKG.rglob("*.py")):
        for lineno, src, ok in _sites(path):
            total += 1
            if not ok:
                unjustified.append(f"{path.relative_to(PKG.parent)}:{lineno}: {src}")
    # The corpus of sites must exist (the scan itself is being tested)
    # and every one of them must carry a bound.
    assert total >= 10, f"scan found only {total} sites — regex broke?"
    assert not unjustified, "driver materialization without a stated bound:\n" + "\n".join(
        unjustified
    )
