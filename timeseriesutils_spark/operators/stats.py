"""Grouped statistics helpers: deterministic mode, percentile
winsorization.

Scale design: ``mode_per_group`` is two map-combinable aggregations
(value-count then arg-max) — no row explosion, two light exchanges.
``winsorize`` computes per-group clip bounds from an exact sorted-array
quantile (bounded by rows-per-group — the exact tier; swap the bounds
stage for ``approx_percentile`` at monster-group scale, the clip stage
is unchanged) and broadcast-joins them back: the fact table is scanned
once and never re-shuffled.  Clipping is pure selection
(least/greatest) — no float arithmetic, so results are bit-exact in any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mode_per_group", "mode_per_group_sql", "winsorize", "winsorize_sql"]


def mode_per_group(
    df: DataFrame, group_columns, value_col: str
) -> DataFrame:
    """Most frequent value of ``value_col`` per group, ties broken by
    smallest value — the deterministic categorical summary (Spark's
    ``mode()`` and DuckDB's ``mode()`` both pick an arbitrary tied
    value; an explicit (count DESC, value ASC) rank does not).

    Output: group columns, ``mode_value``, ``mode_count``.
    """
    g = list(group_columns) if not isinstance(group_columns, str) else [group_columns]
    counts = df.groupBy(*g, value_col).agg(F.count(F.lit(1)).alias("mode_count"))
    w = Window.partitionBy(*g).orderBy(F.desc("mode_count"), F.asc(value_col))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*g, F.col(value_col).alias("mode_value"), "mode_count")
    )


def mode_per_group_sql(table: str, group_columns, value_col: str) -> str:
    """DuckDB twin of :func:`mode_per_group`."""
    g = ", ".join(group_columns)
    return f"""
WITH c AS (
  SELECT {g}, {value_col}, COUNT(*) AS mode_count
  FROM {table} GROUP BY {g}, {value_col}
), r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {g} ORDER BY mode_count DESC, {value_col} ASC) AS _rn
  FROM c
)
SELECT {g}, {value_col} AS mode_value, mode_count FROM r WHERE _rn = 1
"""


def _qcont(arr, n, q: float):
    """quantile_cont over a sorted array column — selection plus the
    SAME lerp DuckDB computes: base·(1−frac) + nxt·frac.  The
    algebraically-equal base + frac·(nxt−base) rounds differently in
    the last ulp for some inputs (seen live at sf0.1), so the exact
    form of the interpolation is part of the cross-engine contract."""
    h = (n - 1).cast("double") * F.lit(float(q))
    lo = F.floor(h).cast("int")
    frac = h - lo.cast("double")
    base = F.element_at(arr, lo + 1).cast("double")
    nxt = F.element_at(arr, F.least(lo + 2, n)).cast("double")
    return base * (F.lit(1.0) - frac) + nxt * frac


def winsorize(
    df: DataFrame,
    column: str,
    group_columns,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
) -> DataFrame:
    """Clip ``column`` to its per-group [q_lo, q_hi] exact continuous
    quantiles (winsorization — the standard outlier treatment before
    fitting).  Appends ``{c}_wins``; clip bounds are quantile_cont
    semantics, the clip itself is least/greatest selection (bit-exact).
    """
    g = list(group_columns) if not isinstance(group_columns, str) else [group_columns]
    bounds = df.groupBy(*g).agg(
        F.sort_array(F.collect_list(column)).alias("_arr"),
    )
    arr, n = F.col("_arr"), F.size("_arr")
    bounds = bounds.select(
        *g,
        F.when(n > 0, _qcont(arr, n, q_lo)).alias("_lo"),
        F.when(n > 0, _qcont(arr, n, q_hi)).alias("_hi"),
    )
    out = df.join(F.broadcast(bounds), on=g, how="left")
    clipped = F.least(F.greatest(F.col(column).cast("double"), F.col("_lo")), F.col("_hi"))
    return out.select(*df.columns, clipped.alias(f"{column}_wins"))


def winsorize_sql(
    table: str,
    column: str,
    group_columns,
    select_cols: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
) -> str:
    """DuckDB twin of :func:`winsorize`; ``select_cols`` = the
    passthrough projection (must match the Spark frame's columns)."""
    g = ", ".join(group_columns)
    return f"""
WITH b AS (
  SELECT {g},
    quantile_cont({column}, {q_lo}) AS _lo,
    quantile_cont({column}, {q_hi}) AS _hi
  FROM {table} GROUP BY {g}
)
SELECT {select_cols},
  LEAST(GREATEST(CAST(t.{column} AS DOUBLE), b._lo), b._hi) AS {column}_wins
FROM {table} t LEFT JOIN b USING ({g})
"""
