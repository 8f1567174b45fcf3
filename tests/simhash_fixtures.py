"""Shared simhash hot-bucket fixtures — ONE definition for the pair
sets that both the pytest pins (tests/test_llm_ops.py) and the
permanent rows-only gate (scripts/rows_only_gate.py) replay.  The
generators were previously copy-pasted at three/two sites; a fixture
tweak (anchor keys, hamming bound, stranger count) applied to one copy
would have left the gate and the tests silently validating different
scenarios.  Both are deterministic (seeded ``random.Random``)."""

from __future__ import annotations

import random


def window_bucket_fps() -> list[tuple[int, int]]:
    """19 docs in ONE quarter-0 band bucket, every fingerprint
    distinct: a hamming-1 anchor pair (docs 0 and 1) plus 17 far
    strangers (pairwise hamming > 12) BETWEEN the anchors in rotated
    sort order.  Past the rep budget the bucket must degrade to the
    Manku rotated-order window and still emit exactly {(0, 1): 1} —
    the old adjacent-only chain could never bridge 17 strangers.

    Anchors sit in the TOP bits of the 48-bit rotated key so the
    strangers can live in a ~42-bit space between them (pairwise
    hamming > 12 for 19 points is impossible in a 23-bit range —
    Plotkin bound — so low anchors would make the loop diverge).
    """
    a_key, b_key = 0x100000000000, 0x900000000000  # fp xor = 1 bit
    rng = random.Random(0)
    strangers: list[int] = []
    while len(strangers) < 17:
        k = rng.randrange(0x200000000000, 0x880000000000)  # between a and b
        if (k & 0xFFFF) == 0 or ((k >> 16) & 0xFFFF) == 0:
            continue  # keep the quarter-1/2 {a,b} buckets stranger-free
        if all(
            bin(k ^ o).count("1") > 12
            for o in [a_key, b_key] + strangers
        ):
            strangers.append(k)
    # fp = key << 16 (wrapped to signed int64 — b's fp sets bit 63):
    # quarter 0 is zero for everyone -> ONE band-0 bucket holds all
    # 19 docs, every fp distinct
    return [
        (i, ((k << 16) ^ (1 << 63)) - (1 << 63))
        for i, k in enumerate([a_key, b_key] + strangers)
    ]


def cliff_bucket_fps() -> list[tuple[int, int]]:
    """530 distinct fingerprints in one quarter-0 bucket — past the
    old fixed-512 cliff: the hamming-1 anchor pair (docs 0 and 1), a
    stranger BETWEEN them in rotated sort order (what the old chain
    could never bridge), and 527 far strangers.  With the corpus
    count pinned at 50M docs the derived budget saturates at the 2048
    ceiling, so the bucket must keep EXACT all-pairs (brute-force
    equality over hamming <= 12)."""
    keys = [0x100000, 0x900000, 0x7F7F55]
    rng = random.Random(1)
    while len(keys) < 530:
        k = rng.randrange(1 << 21, 1 << 47)
        if (k & 0xFFFF) and all(
            bin(k ^ o).count("1") > 12 for o in (0x100000, 0x900000)
        ):
            keys.append(k)
    return [(i, k << 16) for i, k in enumerate(keys)]
