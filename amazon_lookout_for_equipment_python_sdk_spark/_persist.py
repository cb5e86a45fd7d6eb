"""Explicit persist registry (r12 — retires the r9 monkeypatch probe).

``foreach_batch_apply`` must release the caches its batch fn created
each epoch without touching anyone else's.  The r9 solution patched the
concrete ``DataFrame.persist``/``cache`` methods with a thread-local
probe — exact, but global-API-touching and fragile against Spark's
class layout (flagged three rounds running).  This module replaces it
with an EXPLICIT registry:

- every persist call site inside this package routes through
  :func:`tracked_persist`, which persists the frame and, when a
  collector is open on the current thread, records it there;
- :func:`collect_persists` opens a collector (nesting-safe — an inner
  context owns its frames; the outer one never sees them) and is what
  ``foreach_batch_apply`` wraps each micro-batch in.

Outside any collector, :func:`tracked_persist` is exactly
``df.persist(level)`` — zero behavior change for plain batch calls.
Thread-locality gives the same concurrency guarantee the probe had:
foreachBatch callbacks run on their own per-stream thread, so
concurrent streams never see each other's persists.

What changed vs the probe: a USER batch fn persisting through the raw
``DataFrame.persist`` API is no longer captured — those caches fall to
``foreach_batch_apply``'s advisory leak warning (persistent-RDD count
growth with an empty registry), the same path that already covered
``rdd.persist`` and Connect frames.  User fns that want epoch cleanup
call :func:`tracked_persist` themselves — it is part of the public
contract of ``foreach_batch_apply``.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_collector = threading.local()


def note_persist(df: DataFrame) -> DataFrame:
    """Record an ALREADY-persisted frame in the innermost
    :func:`collect_persists` context open on THIS thread (no-op when
    none is).  Chainable — library call sites append
    ``.persist(level).transform(note_persist)`` so the registration
    rides the existing expression chain."""
    frames = getattr(_collector, "frames", None)
    if frames is not None:
        frames.append(df)
    return df


def tracked_persist(df: DataFrame, level=None) -> DataFrame:
    """``df.persist(level)`` that also records the frame in the
    innermost :func:`collect_persists` context open on THIS thread (if
    any).  The public spelling for USER batch fns passed to
    ``foreach_batch_apply`` that want per-epoch cache cleanup."""
    return note_persist(df.persist(level) if level is not None else df.persist())


class collect_persists:
    """Context manager collecting every :func:`tracked_persist` frame
    on this thread while open.  Nesting-safe: the previous collector is
    restored on exit and never sees the inner context's frames — the
    inner context owns their cleanup."""

    def __enter__(self) -> "list[DataFrame]":
        self._prev = getattr(_collector, "frames", None)
        frames: list[DataFrame] = []
        _collector.frames = frames
        return frames

    def __exit__(self, *exc) -> None:
        _collector.frames = self._prev
