"""Relational operators the reference delegates to pandas users
(SURVEY §2.2): as-of join, per-group top-k, deterministic exact dedup.

All are compositions of DataFrame built-ins — Catalyst picks the physical
strategy — but each encodes a scale decision worth naming:

  * as-of join: implemented as union + last-value window, NOT a range
    join.  A conditional range join explodes to |L|·|R| candidate pairs
    per key before picking the max; the union trick is one shuffle on the
    key, one sort, linear work — the classic distributed as-of plan.
  * top-k: row_number over (group, order) with a required *total* order —
    ties would otherwise make results nondeterministic on any engine.
  * exact dedup: groupBy-min (or row_number=1) with an explicit tie-break
    instead of ``dropDuplicates``, whose surviving row is partitioning-
    dependent — not reproducible run to run on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tie_break: str | None = None,
    suffix: str = "",
    direction: str = "backward",
    tolerance_ms: int | None = None,
) -> DataFrame:
    """As-of join (pandas ``merge_asof`` parity): for each left row, the
    nearest right row per key — ``direction='backward'`` (default) takes
    the greatest ``right_time`` ≤ ``left_time``, ``'forward'`` the
    smallest ``right_time`` ≥ ``left_time``; ties broken by the greatest
    ``tie_break`` value.  ``tolerance_ms`` (epoch-millisecond delta for
    timestamp columns, plain delta for numeric time columns) nulls out
    matches farther than the bound — the standard staleness guard.

    Plan shape: union the two sides with right payload packed in a struct,
    window ``last(payload, ignorenulls=True)`` ordered by
    (time, side, tie_break) with right-before-left at equal times so an
    equal timestamp matches (forward = same running frame over the
    REVERSED time order — still one incremental pass, never a shrinking
    frame).  One hash exchange on the key; no candidate explosion;
    whole-stage codegen throughout.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction={direction!r}")
    on = _as_list(on)
    payload = F.struct(
        *[F.col(c) for c in right_values],
        *( [F.col(tie_break).alias("_tb")] if tie_break else [] ),
        *( [F.col(right_time).alias("_mt")] if tolerance_ms is not None else [] ),
    )
    # left_time rides along as _t only (passing it through AND renaming _t
    # back would emit the time column twice → AMBIGUOUS_REFERENCE for
    # callers selecting it)
    passthrough = [c for c in left.columns if c not in on and c != left_time]
    r = right.select(
        *on,
        F.col(right_time).alias("_t"),
        # right rows sort before left rows at the same timestamp (equal ts
        # matches), and among equal (ts) the greatest tie_break must win →
        # sort right rows ascending by tie_break and take last()
        F.lit(0).alias("_side"),
        (F.col(tie_break) if tie_break else F.lit(0)).alias("_order2"),
        payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in passthrough],
    )
    l = left.select(
        *on,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_order2"].dataType).alias("_order2"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in passthrough],
    )
    t_ord = F.col("_t") if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(t_ord, F.col("_side"), F.col("_order2").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).drop("_side", "_order2", "_r")
    if tolerance_ms is not None:
        def _num(c):
            return (
                F.unix_millis(c.cast("timestamp"))
                if dict(left.dtypes).get(left_time, "").startswith("timestamp")
                else c.cast("double")
            )
        gap = (
            _num(F.col("_t")) - _num(F.col("_m").getField("_mt"))
            if direction == "backward"
            else _num(F.col("_m").getField("_mt")) - _num(F.col("_t"))
        )
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(tolerance_ms), F.col("_m"))
        )
    for c in right_values:
        out = out.withColumn(f"{c}{suffix}", F.col("_m").getField(c))
    return out.drop("_m", "_tb").withColumnRenamed("_t", left_time)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_time: str,
    on=None,
    bucket: int = 3_600_000_000,
) -> DataFrame:
    """Binned interval (range) join: pairs where ``on`` keys match and
    ``right_time`` ∈ [``left_start``, ``left_end``).  Time columns must be
    numeric (e.g. epoch micros); ``bucket`` is the bin width in the same
    unit, ideally ≥ the typical interval span.

    Plan: each right row lands in exactly ONE time bin; each left interval
    explodes to the (few) bins it covers; equi-join on (keys…, bin) then
    the exact range filter.  Shuffle volume is |L|·span/bucket + |R| rows
    — versus the |L|·|R| blow-up of a naive theta join, which is the plan
    Spark would otherwise pick (BroadcastNestedLoopJoin).  Because right
    rows are in one bin, no post-join dedup is needed.
    """
    on = _as_list(on) if on is not None else []
    l = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / F.lit(bucket)),
                F.floor((F.col(left_end) - 1) / F.lit(bucket)),
            )
        ),
    )
    r = right.withColumn("_bin", F.floor(F.col(right_time) / F.lit(bucket)))
    return (
        l.join(r, on=on + ["_bin"], how="inner")
        .filter(
            (F.col(right_time) >= F.col(left_start))
            & (F.col(right_time) < F.col(left_end))
        )
        .drop("_bin")
    )


def top_k_per_group(
    df: DataFrame,
    group_columns,
    order_by: list[Column | str],
    k: int,
    rank_name: str = "rn",
) -> DataFrame:
    """Per-group top-k via row_number.  ``order_by`` must be a total order
    (include a unique key as final tie-break) for deterministic output."""
    w = Window.partitionBy(*_as_list(group_columns)).orderBy(*order_by)
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )


def dedup_exact(
    df: DataFrame,
    keys,
    tie_break: list[Column | str] | None = None,
) -> DataFrame:
    """Keep exactly one row per key group, deterministically.

    With ``tie_break``: the first row under that total order (row_number=1).
    Without: requires the non-key columns to be functionally dependent on
    the key (first() under an arbitrary order would be nondeterministic).
    """
    keys = _as_list(keys)
    if tie_break is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*tie_break)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols,
    delete_col: str | None = None,
) -> DataFrame:
    """Batch MERGE (SCD-1 upsert): apply ``updates`` to ``base`` by key —
    matching rows take the update's values, unmatched updates insert,
    unmatched base rows persist; rows whose update has ``delete_col`` =
    true are removed.  The batch-engine equivalent of ``MERGE INTO``
    (Spark without a transactional table format has no MERGE statement;
    this produces the post-merge snapshot for a write-back).

    Plan: one full-outer equi-join on the key + per-column COALESCE
    (update wins) — a single co-partitioned shuffle pair, broadcastable
    when the update batch is small.  Requires ``updates`` to carry the
    same value columns as ``base`` (checked).
    """
    keys = _as_list(key_cols)
    vals = [c for c in base.columns if c not in keys]
    missing = [c for c in vals if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing value columns: {missing}")
    # `_upd` is an always-non-null presence marker for "an update row
    # exists" — the delete flag itself can legitimately be NULL on an
    # update row, so it must not double as the matched test; `_del` is
    # coalesced to false on the update side for the same reason.
    u = updates.select(
        *[F.col(k).alias(f"_uk_{k}") for k in keys],
        *[F.col(c).alias(f"_uv_{c}") for c in vals],
        (
            F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
            if delete_col
            else F.lit(False)
        ).alias("_del"),
        F.lit(True).alias("_upd"),
    )
    cond = None
    for k in keys:
        eq = base[k].eqNullSafe(F.col(f"_uk_{k}"))
        cond = eq if cond is None else cond & eq
    joined = base.join(u, cond, "full_outer")
    matched_update = F.col("_upd").isNotNull()  # an update row exists
    out = joined.filter(
        ~F.coalesce(F.col("_del"), F.lit(False))  # drop deletes
    ).select(
        *[F.coalesce(base[k], F.col(f"_uk_{k}")).alias(k) for k in keys],
        *[
            F.when(matched_update, F.col(f"_uv_{c}")).otherwise(base[c]).alias(c)
            for c in vals
        ],
    )
    return out


def temporal_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts_ms: str,
    valid_from_ms: str = "valid_from_ms",
    valid_to_ms: str = "valid_to_ms",
    dim_cols: list[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Point-in-time (temporal) dimension lookup: each fact row joins
    the dimension VERSION valid at its timestamp — key equality plus
    ``valid_from <= ts < valid_to`` (NULL ``valid_to`` = current/open
    version).  The SCD-2 consumption pattern: as-of semantics with an
    explicit validity interval instead of nearest-earlier-event.

    Implementation: equi-join on the key with the interval predicate as
    a join condition — Catalyst plans a hash join on the key; the
    interval filter prunes version candidates per key.  Versions per
    key are bounded (dimension CHANGES, not events), so the pre-filter
    fan-out is |versions-per-key|, not a range-join blowup; a dimension
    with monster version counts should go through the binned range join
    (:func:`range_join_binned`) instead.  Intervals are half-open and
    non-overlapping per key (the scd2_history contract), so each fact
    row matches at most one version — row counts are preserved under
    ``how='left'``.
    """
    dcols = dim_cols if dim_cols is not None else [
        c for c in dim.columns if c not in (key, valid_from_ms, valid_to_ms)
    ]
    d = dim.select(
        F.col(key).alias("_tk"),
        F.col(valid_from_ms).alias("_vf"),
        F.col(valid_to_ms).alias("_vt"),
        *[F.col(c) for c in dcols],
    )
    cond = (
        (fact[key] == d["_tk"])
        & (fact[fact_ts_ms] >= d["_vf"])
        & (d["_vt"].isNull() | (fact[fact_ts_ms] < d["_vt"]))
    )
    out = fact.join(d, cond, how)
    return out.select(*fact.columns, F.col("_vf").alias("version_from_ms"), *dcols)
