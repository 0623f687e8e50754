"""Parquet-checkpoint tier for K-round iterative operators and
cross-query reuse.

Iterative DataFrame algorithms (pagerank, kmeans, GESD rounds, BPE
merges) must cut lineage every round or the logical plan grows
geometrically when the round output feeds >1 consumer (5 references →
5^K nodes; the round-11 pagerank lesson).  Two tiers cut lineage:

  * ``localCheckpoint(eager=True)`` — executor-memory-pinned blocks.
    Fast locally, but NOT fault-tolerant: on a real cluster a lost
    executor loses the blocks and the job dies (no lineage to rebuild
    from).  It also erases size stats, so AQE can't pick broadcasts.
  * **parquet checkpoint (this module)** — write the round frame to a
    scratch directory, read it back.  Durable across executor loss,
    gives the reader real file statistics, and measured cost-neutral
    at bench scale (round-12 pipeline_e2e A/B: persist 9.43 s ≈
    parquet-checkpoint 9.31 s ≪ no-pin 11.95 s).

This is the DEFAULT tier for the engine's K-round operators (round-13
promotion).  ``TSU_CHECKPOINT_MODE=local`` flips back to
``localCheckpoint`` for A/B measurements.

Scratch location: ``<repo>/.checkpoints/<pid>-<token>/`` (gitignored),
one subdirectory per checkpoint call, removed at process exit.  On a
real deployment this would be a durable object-store prefix instead —
the call sites don't change.

``checkpoint_once`` adds process-scoped memoization so SEVERAL catalog
queries can share ONE expensive intermediate (the matrix profile feeds
both the ``matrix_profile`` and ``motif_discord`` queries; the profile
is built and materialized once, both read the same parquet).
"""

from __future__ import annotations

import atexit
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame

_ROOT: Path | None = None
_SEQ = {"n": 0}
_MEMO: dict[str, str] = {}


def _scratch_root() -> Path:
    global _ROOT
    if _ROOT is None:
        base = Path(__file__).resolve().parents[2] / ".checkpoints"
        _ROOT = base / f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
        _ROOT.mkdir(parents=True, exist_ok=True)
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def parquet_checkpoint(df: DataFrame, tag: str = "ckpt") -> DataFrame:
    """Materialize ``df`` to scratch parquet and return the read-back
    frame (lineage cut, durable, real file stats for AQE).

    With ``TSU_CHECKPOINT_MODE=local`` in the environment this degrades
    to ``localCheckpoint(eager=True)`` — the executor-pinned tier, kept
    only as the A/B control."""
    if os.environ.get("TSU_CHECKPOINT_MODE", "").lower() == "local":
        return df.localCheckpoint(eager=True)
    spark = df.sparkSession
    _SEQ["n"] += 1
    path = str(_scratch_root() / f"{tag}-{_SEQ['n']:04d}")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def checkpoint_once(key: str, builder, spark) -> DataFrame:
    """Process-scoped memoized checkpoint: the first caller for ``key``
    runs ``builder()`` and materializes it; every caller (including the
    first) gets the parquet read-back.  Lets several catalog queries
    share one expensive intermediate without a cross-query persist
    (which ``cache_scope`` would evict between queries)."""
    _TOUCHED.append(key)
    path = _MEMO.get(key)
    if path is None or not os.path.isdir(path):
        _SEQ["n"] += 1
        safe = "".join(c if c.isalnum() or c in "-_" else "_" for c in key)
        path = str(_scratch_root() / f"{safe[:64]}-{_SEQ['n']:04d}")
        builder().write.mode("overwrite").parquet(path)
        _MEMO[key] = path
    return spark.read.parquet(path)


# bench instrumentation (VERDICT r13 #2): which memo keys the current
# query touched, so the bench can auto-detect checkpoint_once CONSUMERS
# and publish their memo-cleared one-shot cost next to the steady-state
# number — a regression in a shared build must never hide behind the
# memo making later reads free.
_TOUCHED: list[str] = []


def drain_touched() -> list[str]:
    """Return and clear the memo keys touched since the last drain."""
    out = list(_TOUCHED)
    _TOUCHED.clear()
    return out


def clear_memo() -> None:
    """Forget every memoized build (files stay on scratch; the next
    checkpoint_once caller rebuilds) — the bench's cold-cost lever."""
    _MEMO.clear()
