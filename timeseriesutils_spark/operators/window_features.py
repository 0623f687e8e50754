"""Grouped time-series window features: lag, rollmean, horizon_targets.

Reference semantics (verified empirically, SURVEY §2.1):
  * ``lag``            — reference featurize.py:174-227 (pandas groupby.shift)
  * ``rollmean``       — reference featurize.py:116-171 (pandas rolling.mean)
  * ``horizon_targets``— reference featurize.py:230-297 (negative shift)

Spark-first design: the reference assumes the caller pre-sorted the frame by
(group, time) and silently misaligns otherwise (SURVEY §2.4.1).  Here every
op takes an explicit ``order_by`` and builds
``Window.partitionBy(groups).orderBy(order_by)`` — results are invariant to
input row order.  ``order_by`` should be a *total* order within each group
(add tie-breaker key columns after the time column); otherwise ties make
lag/lead values nondeterministic on any engine.

Scale notes:
  * All features over the same (groups, order) share one hash-partition
    exchange and one sort; Spark collapses same-spec window functions into a
    single WindowExec pass.  Everything is built-in expressions — the whole
    feature chain stays inside whole-stage codegen, no Python on the hot path.
  * ``rollmean`` accumulates through DECIMAL by default (``exact=True``) so
    results are bit-identical regardless of partitioning (functions/exact.py).
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.names import (
    lag_name,
    rollmean_name,
    target_name,
)


def _as_list(x) -> list:
    if x is None:
        return []
    return x if isinstance(x, list) else [x]


def make_window(group_columns, order_by) -> WindowSpec:
    """Shared window-spec builder for every grouped time-series feature."""
    order_by = _as_list(order_by)
    if not order_by:
        raise ValueError("order_by is required (explicit time ordering)")
    groups = _as_list(group_columns)
    if groups:
        return Window.partitionBy(*groups).orderBy(*order_by)
    # group_columns=None → one global series (reference featurize.py:150-153
    # ungrouped path).  Single-partition window: correct, but not scalable —
    # callers at scale should always group.
    return Window.partitionBy().orderBy(*order_by)


def lag(
    data: DataFrame,
    columns,
    group_columns=None,
    feature_names: list | None = None,
    window_size: int = 1,
    lags: list[int] | None = None,
    order_by=None,
) -> tuple[DataFrame, list]:
    """Per group and column, append ``{c}_lag{k}`` for each lag k.

    Defaults ``lags = 1..window_size`` (reference featurize.py:219-220);
    first k rows of each group are NULL.
    """
    if feature_names is None:
        feature_names = []
    columns = _as_list(columns)
    if lags is None:
        lags = list(range(1, window_size + 1))
    w = make_window(group_columns, order_by)

    new_cols: list[Column] = []
    for c, k in product(columns, lags):
        name = lag_name(c, k)
        new_cols.append(F.lag(c, k).over(w).alias(name))
        feature_names.append(name)
    return data.select("*", *new_cols), feature_names


def rollmean(
    data: DataFrame,
    columns,
    group_columns=None,
    feature_names: list | None = None,
    window_size=7,
    min_periods: int | None = None,
    order_by=None,
    exact: bool = True,
    decimal_scale: int = 6,
) -> tuple[DataFrame, list]:
    """Trailing moving average over the last ``w`` rows *including* the
    current row, per group and column: ``{c}_rollmean_w{w}``.

    ``min_periods=None`` → pandas defaults it to ``w`` → first w-1 rows of
    each group NULL; ``min_periods=m`` → NULL until m non-null observations
    are in the frame (reference featurize.py:164-169, verified).  Spark's
    window AVG has no min_periods, so a COUNT-over-the-same-frame guard
    reproduces it.

    ``exact=True`` computes mean = decimal-sum/count: order-independent,
    bit-reproducible across partitionings and engines.
    """
    if feature_names is None:
        feature_names = []
    columns = _as_list(columns)
    window_sizes = _as_list(window_size)
    w = make_window(group_columns, order_by)

    # two-stage select: the window aggregates land ONCE as named columns
    # (Catalyst keeps each inlined reference as a separate WindowExec slot
    # — the count is needed by both the min_periods guard and the exact
    # mean's denominator, so inlining would run it twice per feature)
    tmp_cols: list[Column] = []
    out_cols: list[Column] = []
    for i, (c, ws) in enumerate(product(columns, window_sizes)):
        frame = w.rowsBetween(-(ws - 1), Window.currentRow)
        mp = ws if min_periods is None else min_periods
        cn, sn = f"_rm_n{i}", f"_rm_s{i}"
        tmp_cols.append(F.count(c).over(frame).alias(cn))
        if exact:
            # precision 18, not 38: a ≤18-digit Decimal is Long-backed in
            # Spark (integer adds, ~1.5× faster measured) and a BOUNDED
            # frame of w business-magnitude values cannot overflow its
            # 10^(18-scale) integral capacity.  The exact rational sum is
            # identical at any sufficient precision, so results (and the
            # DECIMAL(38,6) oracle SQL) are unchanged bit-for-bit.
            # Unbounded running sums elsewhere keep PRECISION=38.
            tmp_cols.append(
                F.sum(F.col(c).cast(f"decimal(18,{decimal_scale})"))
                .over(frame)
                .alias(sn)
            )
            mean = F.col(sn).cast("double") / F.col(cn)
        else:
            tmp_cols.append(F.avg(c).over(frame).alias(sn))
            mean = F.col(sn)
        name = rollmean_name(c, ws)
        out_cols.append(F.when(F.col(cn) >= mp, mean).alias(name))
        feature_names.append(name)
    tmp = data.select("*", *tmp_cols)
    return tmp.select(*data.columns, *out_cols), feature_names


def horizon_targets(
    data: DataFrame,
    columns,
    group_columns=None,
    feature_names: list | None = None,
    horizons=1,
    layout: str = "wide",
    order_by=None,
) -> tuple[DataFrame, list]:
    """Per-group lead values as prediction targets.

    wide (reference featurize.py:293-295): one ``{c}_target{h}`` column per
    (column, horizon); last h rows of each group NULL; no feature names
    added (reference :266-267).

    long (reference featurize.py:283-292): one full copy of the frame per
    horizon, each with constant ``horizon`` column and ``{c}_target`` =
    lead-h; copies concatenated → ``len(horizons) × N`` rows; adds feature
    ``'horizon'``.  Implemented as ONE window pass computing every lead,
    then an explode of the per-horizon structs (unpivot): one scan + one
    exchange + one sort total, versus scan+shuffle per horizon for the
    naive union plan — at the reference's 28-horizon demo workload that
    is 28× less IO/shuffle.
    """
    if feature_names is None:
        feature_names = []
    columns = _as_list(columns)
    horizons = _as_list(horizons)
    w = make_window(group_columns, order_by)

    if layout == "wide":
        new_cols = []
        for c, h in product(columns, horizons):
            new_cols.append(F.lead(c, h).over(w).alias(target_name(c, h)))
        return data.select("*", *new_cols), feature_names

    if layout == "long":
        per_h = F.array(
            *[
                F.struct(
                    F.lit(h).cast("bigint").alias("horizon"),
                    *[F.lead(c, h).over(w).alias(target_name(c)) for c in columns],
                )
                for h in horizons
            ]
        )
        # window exprs must evaluate in a Project, not inside the Generate:
        # build the struct array first, then explode the bound column
        out = (
            data.select("*", per_h.alias("_hs"))
            .select(*data.columns, F.explode("_hs").alias("_h"))
            .select(
                *data.columns,
                F.col("_h.horizon").alias("horizon"),
                *[F.col(f"_h.{target_name(c)}").alias(target_name(c)) for c in columns],
            )
        )
        feature_names.append("horizon")
        return out, feature_names

    raise ValueError(f"layout must be 'wide' or 'long', got {layout!r}")
