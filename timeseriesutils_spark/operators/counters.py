"""Monotonic-counter rate extraction with reset handling — the
Prometheus ``rate()`` / TimescaleDB ``counter_agg`` semantics: a
counter only increases, except when the producing process restarts and
it snaps back toward zero; the true increase over a bucket is the sum
of non-negative deltas, with a reset's post-restart value counted as
fresh increase.

    delta_i = v_i − v_{i−1}          if ≥ 0   (normal increment)
            = v_i                    if < 0   (reset: restart at 0,
                                               then counted up to v_i)

One LAG per series partition, then a map-combinable bucket sum — a
single exchange on the series key, no iteration, the same plan family
as diff_pct (operators/series_math.py).

Exactness: counters are integers (or quantized to integers by the
caller); every delta and bucket sum is exact int64 — bit-identical in
any engine and partitioning.  The first sample of a series has no
predecessor and contributes no delta (standard rate() behavior:
an interval needs two samples).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list


def counter_rate(
    data: DataFrame,
    counter_col: str,
    ts_col: str,
    group_columns,
    bucket: str = "hour",
    id_col: str | None = None,
) -> DataFrame:
    """Per-(series, time-bucket) counter increase.

    ``counter_col`` must be integral (cast/quantize upstream).  Returns
    (groups…, bucket_ts, increase, n_samples, n_resets).
    """
    groups = _as_list(group_columns)
    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = Window.partitionBy(*groups).orderBy(*order)
    prev = F.lag(counter_col).over(w)
    delta = F.col(counter_col) - prev
    inc = F.when(prev.isNull(), F.lit(None).cast("bigint")).otherwise(
        F.when(delta >= 0, delta).otherwise(F.col(counter_col))
    )
    reset = (prev.isNotNull() & (delta < 0)).cast("bigint")
    return (
        data.select(
            *groups,
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
            inc.alias("_inc"),
            reset.alias("_reset"),
        )
        .groupBy(*groups, "bucket_ts")
        .agg(
            F.coalesce(F.sum("_inc"), F.lit(0)).cast("bigint").alias("increase"),
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("_reset").cast("bigint").alias("n_resets"),
        )
    )


def counter_rate_sql(
    inner_sql: str,
    counter_col: str,
    ts_col: str,
    group_columns,
    bucket: str = "hour",
    id_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`counter_rate` over ``inner_sql``."""
    groups = _as_list(group_columns)
    g = ", ".join(groups)
    order = f"{ts_col} ASC" + (f", {id_col} ASC" if id_col else "")
    return f"""
WITH src AS ({inner_sql}),
d AS (
  SELECT {g}, date_trunc('{bucket}', {ts_col}) AS bucket_ts,
    {counter_col} AS v,
    LAG({counter_col}) OVER (PARTITION BY {g} ORDER BY {order}) AS prev
  FROM src
)
SELECT {g}, bucket_ts,
  CAST(COALESCE(SUM(CASE WHEN prev IS NULL THEN NULL
                         WHEN v - prev >= 0 THEN v - prev
                         ELSE v END), 0) AS BIGINT) AS increase,
  COUNT(*) AS n_samples,
  CAST(SUM(CASE WHEN prev IS NOT NULL AND v - prev < 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_resets
FROM d GROUP BY {g}, bucket_ts
"""
