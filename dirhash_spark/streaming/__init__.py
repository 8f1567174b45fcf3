"""Structured Streaming operators (SURVEY §2.B B49-B52, streaming path).

The window/dedup *expressions* are shared with the batch twins in
``operators/event_windows.py`` — Spark's unified API means the same
``F.window``/``session_window``/``dropDuplicates`` calls run incrementally
here with state stores and watermarks.
"""

from .ops import (
    clicks_errors_joined,
    session_counts,
    sliding_counts,
    tumbling_counts,
    watermark_dedup,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "watermark_dedup",
    "clicks_errors_joined",
]
