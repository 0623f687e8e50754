"""Streaming table maintenance: a ``foreachBatch`` MERGE sink.

Spark's file sinks are append-only; maintaining an upserted snapshot
(SCD-1 "current state" table) from a stream normally requires a
transactional format.  Without one, the portable pattern is versioned
snapshots: every micro-batch MERGEs into the latest snapshot
(operators/relational.merge_upsert — full-outer + COALESCE) and writes a
NEW immutable version directory; readers resolve the highest committed
version.  This is the same new-files-plus-pointer design a transactional
log formalizes, reduced to what plain parquet + a directory listing can
guarantee:

* a version directory is named only after its write completes (parquet
  job commit), with a ``_v{n}`` suffix ordering versions;
* readers list and take the max — a torn write leaves a half-written
  dir that is never the max *committed* name because Spark's commit
  protocol renames task files into place before the job succeeds;
* micro-batch ids are monotone per query, so replays after a restart
  overwrite the same version id (idempotent re-run, the foreachBatch
  exactly-once contract).

Scale shape: each batch rewrites the snapshot — right for dimension-
table-sized state (the SCD-1 use case), wrong for fact tables (use the
append sink + compaction there).  The MERGE itself is one
co-partitioned full-outer join; the base side scan prunes to the join
keys' columns.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from timeseriesutils_spark.operators.relational import merge_upsert

_V = re.compile(r"_v(\d+)$")


def _versions(path: str) -> list[tuple[int, str]]:
    # local-FS listing; on an object store / HDFS swap this for the
    # Hadoop FileSystem API (same contract: committed dirs have _SUCCESS)
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        m = _V.search(name)
        if m and os.path.exists(os.path.join(path, name, "_SUCCESS")):
            out.append((int(m.group(1)), os.path.join(path, name)))
    return sorted(out)


def read_upsert_snapshot(
    spark: SparkSession, path: str, before: int | None = None
) -> DataFrame | None:
    """Latest committed snapshot, or None before the first batch.

    ``before``: consider only versions with id strictly less than it.
    The foreachBatch closures pass their own ``batch_id`` here so a
    replayed batch (crash between the snapshot's parquet commit and the
    stream's checkpoint commit) re-derives snap_v{batch_id} from the SAME
    base it used the first time, instead of reading its own half-applied
    output — which would double-count rollup partials and make the upsert
    sink overwrite a path it is reading from."""
    vs = _versions(path)
    if before is not None:
        vs = [v for v in vs if v[0] < before]
    return spark.read.parquet(vs[-1][1]) if vs else None


def apply_upsert_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    key_cols,
    delete_col: str | None = None,
) -> None:
    """One micro-batch of the upsert sink (module-level so replay
    semantics are directly testable): MERGE ``batch`` into the latest
    snapshot with version < ``batch_id``, write ``snap_v{batch_id}``.
    Re-invoking with the same batch_id (crash-replay) is a no-op
    rewrite of the identical snapshot."""
    spark = batch.sparkSession
    base = read_upsert_snapshot(spark, path, before=batch_id)
    if delete_col is not None and base is not None:
        base = base.drop(delete_col) if delete_col in base.columns else base
    merged = (
        batch if base is None else merge_upsert(base, batch, key_cols, delete_col)
    )
    if delete_col is not None and delete_col in merged.columns:
        # first batch with no base: apply its own delete flags
        merged = merged.filter(~merged[delete_col].eqNullSafe(True)).drop(
            delete_col
        )
    merged.write.mode("overwrite").parquet(os.path.join(path, f"snap_v{batch_id}"))


def stream_upsert_sink(
    updates: DataFrame,
    path: str,
    key_cols,
    delete_col: str | None = None,
    checkpoint: str | None = None,
    query_name: str = "upsert_sink",
):
    """Start a foreachBatch query MERGE-ing ``updates`` (a streaming
    DataFrame of upsert rows) into the versioned snapshot at ``path``.
    Returns the StreamingQuery; callers control the trigger lifecycle
    (tests drain with availableNow)."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        apply_upsert_batch(batch, batch_id, path, key_cols, delete_col)

    writer = (
        updates.writeStream.foreachBatch(apply_batch)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def apply_rollup_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    key_cols,
    partial_aggs: dict,
    merge_aggs: dict,
) -> None:
    """One micro-batch of the rollup sink (module-level for replay
    tests): reduce the batch to per-key partials, merge additively into
    the latest snapshot with version < ``batch_id``.  A crash-replay of
    the same batch re-reads the same pre-batch base, so partials are
    never double-counted."""
    keys = list(key_cols)
    spark = batch.sparkSession
    part = batch.groupBy(*keys).agg(*[c.alias(n) for n, c in partial_aggs.items()])
    base = read_upsert_snapshot(spark, path, before=batch_id)
    merged = (
        part
        if base is None
        else base.unionByName(part)
        .groupBy(*keys)
        .agg(*[c.alias(n) for n, c in merge_aggs.items()])
    )
    merged.write.mode("overwrite").parquet(os.path.join(path, f"snap_v{batch_id}"))


def stream_rollup_sink(
    updates: DataFrame,
    path: str,
    key_cols,
    partial_aggs: dict,
    merge_aggs: dict,
    checkpoint: str | None = None,
    query_name: str = "rollup_sink",
):
    """Continuous-aggregate maintenance (the streaming twin of
    ``operators/analytics.time_rollup``): each micro-batch is reduced to
    per-key PARTIAL aggregates, then merged ADDITIVELY into the snapshot
    — old partials union new, re-aggregated with ``merge_aggs``.  Works
    for any algebraic aggregate (count/sum/min/max and the engine's
    exact DECIMAL sums — associative, so merge order cannot perturb the
    result; same contract as functions/skew.salted_agg).

    Unlike a stateful windowed agg, NO stream state is held: the
    snapshot IS the state, batches only ship their partials — the shape
    that survives an unbounded key space (hourly buckets forever).

    ``partial_aggs``: name → aggregate over the raw batch rows.
    ``merge_aggs``: name → aggregate over (snapshot ∪ batch) partials,
    referencing partial columns by name.
    """
    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        apply_rollup_batch(batch, batch_id, path, key_cols, partial_aggs, merge_aggs)

    writer = (
        updates.writeStream.foreachBatch(apply_batch)
        .queryName(query_name)
        .outputMode("update")
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
