"""Explicit cache ownership for operators that persist plan forks.

Several operators ``persist()`` intermediates that the RETURNED plan
still reads (posting lists, iteration state, tokenized corpora) — they
cannot unpersist before the caller materializes, so the caller owns
eviction.  Historically that contract was implicit ("call
``spark.catalog.clearCache()`` like bench.py does"), which silently
accumulates executor memory for a library user who doesn't.

This module makes the contract explicit and cheap:

  * operators route their caller-owned persists through :func:`pin`,
    which registers the frame in a module-level ledger;
  * :func:`cache_scope` is a context manager that unpersists everything
    pinned inside its body — wrap each query of a catalog sweep and no
    net cached blocks survive (asserted in tests/test_cache.py);
  * :func:`release_all` drops every ledger entry — the coarse hammer for
    REPL/bench loops, strictly gentler than ``clearCache()`` because it
    leaves the USER's own cached frames alone.

Unpersist here is blocking=False (Spark's default): eviction is async,
but the blocks leave the cache manager immediately — the ledger is
about ownership, not reclamation latency.  Not thread-safe by design
(Spark queries from one session are driver-serialized anyway).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() + register in the ledger; returns the same frame."""
    df.persist()
    _PINNED.append(df)
    return df


def _drop(df: DataFrame) -> None:
    try:
        df.unpersist()
    except Exception:
        pass  # session already stopped — nothing to evict


def release_all() -> int:
    """Unpersist every ledger entry; returns how many were dropped."""
    n = len(_PINNED)
    while _PINNED:
        _drop(_PINNED.pop())
    return n


@contextmanager
def cache_scope():
    """Unpersist every frame pinned inside the ``with`` body on exit —
    materialize results BEFORE leaving the scope, or the plan recomputes
    its upstream on next use (the same rule the implicit contract had)."""
    mark = len(_PINNED)
    try:
        yield
    finally:
        while len(_PINNED) > mark:
            _drop(_PINNED.pop())
