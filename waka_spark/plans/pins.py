"""Scoped DataFrame persistence: pin multi-consumer stages, release them
as DATAFRAMES when the enclosing run finishes.

Why not raw-RDD unpersist: ``DataFrame.persist()`` registers an entry in
the session's CacheManager keyed by the analyzed plan. Releasing at the
RDD level (``getPersistentRDDs`` → ``jrdd.unpersist()``) frees executor
blocks but leaves that driver-side registry entry alive forever — a
long-lived endpoint whose every request persists request-unique plans
(the text literal differs per request, so entries never deduplicate)
leaks driver memory and adds O(entries) cache-lookup work to every
subsequent query's planning. Only ``DataFrame.unpersist()`` removes the
CacheManager entry, and only the code that called ``persist()`` knows
which frames those were — hence this registry.

Operators call :func:`pin` instead of ``df.persist()``. Inside a
:func:`pin_scope` block (per-request endpoints, tests), every pinned
frame is unpersisted on exit; outside any scope, :func:`pin` degrades to
a plain ``persist()`` — batch jobs keep their caches for the session,
exactly as before.

Scopes are thread-local so concurrent pipelines in one JVM don't release
each other's pins (the serve endpoint additionally serializes runs).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_SCOPES = threading.local()


def _stack() -> list:
    if not hasattr(_SCOPES, "stack"):
        _SCOPES.stack = []
    return _SCOPES.stack


def pin(df: DataFrame) -> DataFrame:
    """``df.persist()``, registered with the innermost active scope (if
    any) for DataFrame-level release on scope exit."""
    out = df.persist()
    stack = _stack()
    if stack:
        stack[-1].append(out)
    return out


@contextmanager
def pin_scope():
    """Release every frame pinned inside the block — blocks AND
    CacheManager entries — when the block exits (even on error).

    CONTRACT (round-5, ADVICE): some pins are load-bearing, not caches —
    ``plans/zipindex.with_global_order_stats`` and
    ``plans/incremental.negative_samples`` collect driver-side offsets
    against ONE pinned range partitioning; recomputing that partitioning
    after the pin is released may resample different range boundaries
    while the offsets stay frozen, silently corrupting global ranks.
    Any lazy frame built from such operators must be consumed (collect /
    write / count) BEFORE the enclosing scope exits."""
    frames: list[DataFrame] = []
    _stack().append(frames)
    try:
        yield frames
    finally:
        _stack().pop()
        for df in frames:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
