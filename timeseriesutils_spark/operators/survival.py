"""Kaplan–Meier survival estimation as pure window expressions.

Survival analysis is the canonical retention/churn/time-to-failure tool
(user lifetime curves, hardware failure, subscription churn).  The
reference has no survival op (it stops at rolling features —
/root/reference/src/timeseriesutils/featurize.py); this is part of the
§2.2 capability surface a production analytics engine needs.

The estimator: with d_t events ("deaths") and n_t subjects at risk at
each distinct event time t,

    S(t) = Π_{u ≤ t} (1 − d_u / n_u)

Right-censored subjects (still alive at the observation horizon) leave
the risk set at their censoring time but contribute no factor.  The
whole computation is two shuffles — one groupBy to the per-(stratum,
time) table, one window pass per stratum for the risk-set countdown and
the running product — no iteration, no Python.

Exactness discipline (cross-engine bit-identity): the product is
computed in log space, Π(1 − d/n) = exp(Σ ln((n−d)/n)).  Each ln term
is floor-quantized to int64 units of 1e-9 *before* the cumulative sum
(ln may differ by 1 ulp across libm builds; the quantized integers do
not), the sum is exact integer addition, and the final exp output is
floor-quantized to ``out_scale`` decimals — the same
ln-once-then-quantize pattern as unigram_logprob / pmi_cooccur
(operators/text.py).  When the risk set is exhausted (n_t = d_t,
survival hits exactly 0) the log term would be −∞; a −1e15 sentinel
drives exp to underflow so the quantized survival is exactly 0.0.

Scale shape: the per-(stratum, t) table is tiny (|strata| × |distinct
durations|) regardless of input size; all heavy lifting is the
map-combinable per-subject aggregation.  At 100 TB of events the plan
is one partial-agg shuffle on subject, one on (stratum, t), then a
window over a table of a few thousand rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NEG_INF_Q = -(10**15)  # ln-term sentinel when survival reaches exactly 0


def kaplan_meier(
    subjects: DataFrame,
    stratum_col: str = "stratum",
    duration_col: str = "t_day",
    event_col: str = "died",
    out_scale: int = 6,
) -> DataFrame:
    """Per-stratum Kaplan–Meier curve from a per-subject table.

    ``subjects`` has one row per subject: its stratum, its duration
    (integer time units to event or censoring), and ``event_col``
    (1 = event observed, 0 = right-censored).

    Returns one row per (stratum, event time): ``n_risk``, ``n_events``,
    ``n_censored`` (censored AT that time), and ``survival`` —
    S(t) quantized to ``out_scale`` decimals.  Censoring-only times are
    folded into the risk-set countdown but emit no row (standard KM:
    the curve only steps at event times).
    """
    died = F.col(event_col).cast("bigint")
    agg = subjects.groupBy(stratum_col, duration_col).agg(
        F.sum(died).alias("_d"),
        F.sum(F.lit(1) - died).alias("_c"),
    )
    w_cum = (
        Window.partitionBy(stratum_col)
        .orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(stratum_col)
    # at-risk at t = stratum total − everyone who left strictly before t
    agg = agg.withColumn(
        "n_risk",
        F.sum(F.col("_d") + F.col("_c")).over(w_all)
        - F.sum(F.col("_d") + F.col("_c")).over(w_cum)
        + F.col("_d")
        + F.col("_c"),
    )
    term_q = F.when(
        F.col("n_risk") > F.col("_d"),
        F.floor(
            F.log((F.col("n_risk") - F.col("_d")) / F.col("n_risk").cast("double"))
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.lit(_NEG_INF_Q))
    steps = agg.filter(F.col("_d") > 0).withColumn("_q", term_q)
    cum_q = F.sum("_q").over(w_cum)
    mult = float(10**out_scale)
    return steps.select(
        F.col(stratum_col),
        F.col(duration_col),
        F.col("n_risk"),
        F.col("_d").alias("n_events"),
        F.col("_c").alias("n_censored"),
        (
            F.floor(F.exp(cum_q.cast("double") / F.lit(1e9)) * F.lit(mult) + F.lit(0.5))
            / F.lit(mult)
        ).alias("survival"),
    )


def kaplan_meier_sql(
    subjects_sql: str,
    stratum_col: str = "stratum",
    duration_col: str = "t_day",
    event_col: str = "died",
    out_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`kaplan_meier` over ``subjects_sql`` (a
    SELECT producing the per-subject relation)."""
    mult = 10**out_scale
    win_cum = (
        f"PARTITION BY {stratum_col} ORDER BY {duration_col} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    return f"""
WITH subj AS ({subjects_sql}),
agg AS (
  SELECT {stratum_col}, {duration_col},
    CAST(SUM(CAST({event_col} AS BIGINT)) AS BIGINT) AS _d,
    CAST(SUM(1 - CAST({event_col} AS BIGINT)) AS BIGINT) AS _c
  FROM subj GROUP BY {stratum_col}, {duration_col}
),
r AS (
  SELECT *,
    CAST(SUM(_d + _c) OVER (PARTITION BY {stratum_col}) AS BIGINT)
      - CAST(SUM(_d + _c) OVER ({win_cum}) AS BIGINT) + _d + _c AS n_risk
  FROM agg
),
t AS (
  SELECT {stratum_col}, {duration_col}, n_risk, _d, _c,
    CASE WHEN n_risk > _d
      THEN CAST(FLOOR(ln((n_risk - _d) / CAST(n_risk AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
      ELSE CAST({_NEG_INF_Q} AS BIGINT) END AS _q
  FROM r WHERE _d > 0
)
SELECT {stratum_col}, {duration_col}, n_risk,
  _d AS n_events, _c AS n_censored,
  FLOOR(exp(CAST(CAST(SUM(_q) OVER ({win_cum}) AS BIGINT) AS DOUBLE) / 1e9)
        * {mult} + 0.5) / {mult} AS survival
FROM t
"""


def conversion_lifetimes(
    events: DataFrame,
    dim: DataFrame,
    window_hours: int = 72,
    user_col: str = "user_id",
    ts_col: str = "ts",
    convert_type: str = "purchase",
    type_col: str = "event_type",
    dim_key: str = "c_custkey",
    stratum_from: str = "c_mktsegment",
) -> DataFrame:
    """Per-user time-to-conversion table from an event log: duration =
    whole hours from a user's first event to their first
    ``convert_type`` event, administratively right-censored at
    ``window_hours`` (users who haven't converted inside the window —
    or never do — are censored at the window edge; the standard
    fixed-follow-up design).  Stratum comes from a broadcast dimension
    join (market segment).

    The hour difference is exact int64 arithmetic on epoch microseconds
    (no float division), so both engines bucket identically.
    """
    per_user = events.groupBy(user_col).agg(
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("_first_us"),
        F.min(
            F.when(
                F.col(type_col) == F.lit(convert_type),
                F.unix_micros(F.col(ts_col).cast("timestamp")),
            )
        ).alias("_buy_us"),
    )
    hours = F.expr("(_buy_us - _first_us) div 3600000000")
    died = F.when(hours < F.lit(window_hours), F.lit(1)).otherwise(F.lit(0))
    return per_user.join(
        F.broadcast(dim), F.col(user_col) == F.col(dim_key)
    ).select(
        F.col(stratum_from).alias("stratum"),
        F.least(F.coalesce(hours, F.lit(window_hours)), F.lit(window_hours))
        .cast("bigint")
        .alias("t_hour"),
        F.coalesce(died, F.lit(0)).cast("int").alias("died"),
    )


def conversion_lifetimes_sql(
    events_table: str = "events",
    dim_table: str = "customer",
    window_hours: int = 72,
    convert_type: str = "purchase",
) -> str:
    """DuckDB twin of :func:`conversion_lifetimes` (inner SELECT for
    :func:`kaplan_meier_sql`)."""
    return f"""
SELECT c.c_mktsegment AS stratum,
  CAST(LEAST(COALESCE((u._buy_us - u._first_us) // 3600000000,
                      {window_hours}), {window_hours}) AS BIGINT) AS t_hour,
  COALESCE(CASE WHEN (u._buy_us - u._first_us) // 3600000000 < {window_hours}
                THEN 1 ELSE 0 END, 0) AS died
FROM (SELECT user_id, MIN(epoch_us(ts)) AS _first_us,
        MIN(CASE WHEN event_type = '{convert_type}' THEN epoch_us(ts) END) AS _buy_us
      FROM {events_table} GROUP BY user_id) u
JOIN {dim_table} c ON u.user_id = c.c_custkey
"""


def nelson_aalen(
    subjects: DataFrame,
    stratum_col: str = "stratum",
    duration_col: str = "t_day",
    event_col: str = "died",
    out_scale: int = 6,
) -> DataFrame:
    """Per-stratum Nelson–Aalen cumulative hazard — the additive sibling
    of :func:`kaplan_meier`: H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ.  Where KM gives
    survival probability, the cumulative hazard is what epidemiologists
    difference to read instantaneous risk and what feeds the common
    S(t) ≈ exp(−H(t)) approximation for heavy-censoring regimes.

    Same frame as KM (one (stratum, t) aggregation, the at-risk
    countdown window); the increments dᵢ/nᵢ are single double divisions
    of exact int64s, floor-quantized to 10⁻⁹ before the cumulative
    window SUM so the accumulation is exact-integer and
    accumulation-order-free (the repo's windowed-double rule).

    Returns one row per (stratum, event time): ``n_risk``, ``n_events``,
    ``n_censored``, ``cum_hazard`` (quantized to ``out_scale``).
    """
    died = F.col(event_col).cast("bigint")
    agg = subjects.groupBy(stratum_col, duration_col).agg(
        F.sum(died).alias("_d"),
        F.sum(F.lit(1) - died).alias("_c"),
    )
    w_cum = (
        Window.partitionBy(stratum_col)
        .orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(stratum_col)
    agg = agg.withColumn(
        "n_risk",
        F.sum(F.col("_d") + F.col("_c")).over(w_all)
        - F.sum(F.col("_d") + F.col("_c")).over(w_cum)
        + F.col("_d")
        + F.col("_c"),
    )
    inc_q = F.floor(
        F.col("_d").cast("double") / F.col("n_risk").cast("double") * F.lit(1e9)
        + F.lit(0.5)
    ).cast("bigint")
    steps = agg.filter(F.col("_d") > 0).withColumn("_q", inc_q)
    cum_q = F.sum("_q").over(w_cum)
    mult = float(10**out_scale)
    return steps.select(
        F.col(stratum_col),
        F.col(duration_col),
        F.col("n_risk"),
        F.col("_d").alias("n_events"),
        F.col("_c").alias("n_censored"),
        (
            F.floor(cum_q.cast("double") / F.lit(1e9) * F.lit(mult) + F.lit(0.5))
            / F.lit(mult)
        ).alias("cum_hazard"),
    )


def nelson_aalen_sql(
    subjects_sql: str,
    stratum_col: str = "stratum",
    duration_col: str = "t_day",
    event_col: str = "died",
    out_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`nelson_aalen`."""
    from timeseriesutils_spark.functions.exact import dlit

    mult = 10**out_scale
    win_cum = (
        f"PARTITION BY {stratum_col} ORDER BY {duration_col} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    return f"""
WITH subj AS ({subjects_sql}),
agg AS (
  SELECT {stratum_col}, {duration_col},
    CAST(SUM(CAST({event_col} AS BIGINT)) AS BIGINT) AS _d,
    CAST(SUM(1 - CAST({event_col} AS BIGINT)) AS BIGINT) AS _c
  FROM subj GROUP BY {stratum_col}, {duration_col}
),
r AS (
  SELECT *,
    CAST(SUM(_d + _c) OVER (PARTITION BY {stratum_col}) AS BIGINT)
      - CAST(SUM(_d + _c) OVER ({win_cum}) AS BIGINT) + _d + _c AS n_risk
  FROM agg
),
t AS (
  SELECT {stratum_col}, {duration_col}, n_risk, _d, _c,
    CAST(FLOOR(CAST(_d AS DOUBLE) / CAST(n_risk AS DOUBLE) * 1e9 + 0.5)
         AS BIGINT) AS _q
  FROM r WHERE _d > 0
),
c AS (
  SELECT *, CAST(SUM(_q) OVER ({win_cum}) AS BIGINT) AS _cq FROM t
)
SELECT {stratum_col}, {duration_col}, n_risk, _d AS n_events,
  _c AS n_censored,
  FLOOR(CAST(_cq AS DOUBLE) / 1e9 * {dlit(float(mult))} + 0.5) / {dlit(float(mult))}
    AS cum_hazard
FROM c
"""
