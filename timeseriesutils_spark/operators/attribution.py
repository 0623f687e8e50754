"""Multi-touch conversion attribution — the marketing-analytics
workhorse: distribute credit for each conversion across the touchpoints
(channel = event type) that preceded it, under the three standard
models at once:

* first-touch — full credit to the earliest touch,
* last-touch — full credit to the latest touch before conversion,
* linear — 1/n credit to each of the n touches,
* time-decay — weight 2^(−Δt/halflife) of the gap to conversion,
  normalized to 1 per converting user (recent touches earn more).

One join (touches ← per-user first conversion time) and one per-user
window pass; credits aggregate per channel map-combinably.  The
reference has no attribution op (SURVEY.md §2.3 — aggregation is the
caller's job there); this is §2.2 event-analytics surface.

Exactness: first/last flags are integer; linear credit is quantized to
int64 units of 1e-9 per touch (floor(1e9/n + 0.5)) BEFORE the channel
sum, so the aggregation is exact integer addition in any partitioning
and engine — the shared discipline of functions/exact.py.  First/last
ties break on (ts, event id), fully deterministic.

Scale shape: the conversions table is one row per converting user;
the touch join shuffles on user — the same key the window pass needs,
so Spark reuses one Exchange for both.  No driver state, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit, sq


def multi_touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    convert_type: str = "purchase",
    decay_halflife_hours: float = 24.0,
) -> DataFrame:
    """Per-channel attribution report: (channel, first_touch,
    last_touch, linear_credit, decay_credit, n_touches) over each
    user's touches strictly before their first ``convert_type`` event.

    Decay weights are quantized to int64 units of 1e-9 right after the
    single pow() call (the ln-once-then-quantize discipline), and the
    per-user normalization divides exact integers, so the channel sums
    are exact in any partitioning."""
    conv = (
        events.filter(F.col(type_col) == F.lit(convert_type))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_conv_ts"))
    )
    touches = (
        events.filter(F.col(type_col) != F.lit(convert_type))
        .join(conv, user_col)
        .filter(F.col(ts_col) < F.col("_conv_ts"))
    )
    w = Window.partitionBy(user_col)
    w_asc = w.orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    w_desc = w.orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
    hl_us = int(decay_halflife_hours * 3_600_000_000)
    dt = F.unix_micros(F.col("_conv_ts").cast("timestamp")) - F.unix_micros(
        F.col(ts_col).cast("timestamp")
    )
    wq = F.floor(
        F.pow(F.lit(2.0), -(dt.cast("double") / F.lit(float(hl_us)))) * F.lit(1e9)
        + F.lit(0.5)
    ).cast("bigint")
    scored = touches.select(
        F.col(type_col).alias("channel"),
        (F.row_number().over(w_asc) == 1).cast("bigint").alias("_first"),
        (F.row_number().over(w_desc) == 1).cast("bigint").alias("_last"),
        F.floor(F.lit(1e9) / F.count(F.lit(1)).over(w) + F.lit(0.5))
        .cast("bigint")
        .alias("_lin_q"),
        F.floor(
            F.lit(1e9) * wq.cast("double") / F.sum(wq).over(w).cast("double")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("_dec_q"),
    )
    return scored.groupBy("channel").agg(
        F.sum("_first").alias("first_touch"),
        F.sum("_last").alias("last_touch"),
        (F.sum("_lin_q").cast("double") / F.lit(1e9)).alias("linear_credit"),
        (F.sum("_dec_q").cast("double") / F.lit(1e9)).alias("decay_credit"),
        F.count(F.lit(1)).alias("n_touches"),
    )


def multi_touch_attribution_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    convert_type: str = "purchase",
    decay_halflife_hours: float = 24.0,
) -> str:
    """DuckDB twin of :func:`multi_touch_attribution`."""
    hl_us = int(decay_halflife_hours * 3_600_000_000)
    return f"""
WITH conv AS (
  SELECT {user_col}, MIN({ts_col}) AS _conv_ts
  FROM {table} WHERE {type_col} = {sq(convert_type)} GROUP BY {user_col}
),
t AS (
  SELECT e.{user_col}, e.{ts_col}, e.{id_col}, e.{type_col} AS channel,
    CAST(FLOOR(pow(2.0e0, -(CAST(epoch_us(conv._conv_ts) - epoch_us(e.{ts_col})
      AS DOUBLE) / {dlit(hl_us)})) * 1e9 + 0.5) AS BIGINT) AS _wq
  FROM {table} e JOIN conv USING ({user_col})
  WHERE e.{type_col} <> '{convert_type}' AND e.{ts_col} < conv._conv_ts
),
s AS (
  SELECT channel,
    CASE WHEN row_number() OVER (PARTITION BY {user_col}
           ORDER BY {ts_col} ASC, {id_col} ASC) = 1 THEN 1 ELSE 0 END AS _first,
    CASE WHEN row_number() OVER (PARTITION BY {user_col}
           ORDER BY {ts_col} DESC, {id_col} DESC) = 1 THEN 1 ELSE 0 END AS _last,
    CAST(FLOOR(1e9 / (COUNT(*) OVER (PARTITION BY {user_col})) + 0.5) AS BIGINT) AS _lin_q,
    CAST(FLOOR(1e9 * CAST(_wq AS DOUBLE)
      / CAST(SUM(_wq) OVER (PARTITION BY {user_col}) AS DOUBLE) + 0.5) AS BIGINT)
      AS _dec_q
  FROM t
)
SELECT channel,
  CAST(SUM(_first) AS BIGINT) AS first_touch,
  CAST(SUM(_last) AS BIGINT) AS last_touch,
  CAST(SUM(_lin_q) AS DOUBLE) / 1e9 AS linear_credit,
  CAST(SUM(_dec_q) AS DOUBLE) / 1e9 AS decay_credit,
  COUNT(*) AS n_touches
FROM s GROUP BY channel
"""
