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

from timeseriesutils_spark.functions.exact import sq
from timeseriesutils_spark.operators.nonparam import (
    two_sided_p_expr,
    two_sided_p_sql,
)
from timeseriesutils_spark.operators.window_features import _as_list

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
        MIN(CASE WHEN event_type = {sq(convert_type)} THEN epoch_us(ts) END) AS _buy_us
      FROM {events_table} GROUP BY user_id) u
JOIN {dim_table} c ON u.user_id = c.c_custkey
"""


def logrank_test(
    subjects: DataFrame,
    arm_col: str,
    level_a: str,
    level_b: str,
    duration_col: str,
    event_col: str,
    group_columns,
) -> DataFrame:
    """Two-group log-rank test per group/stratum: do the survival
    curves of ``arm_col = level_a`` vs ``level_b`` differ?  THE
    inferential companion of :func:`kaplan_meier` — KM draws the
    curves, log-rank says whether the gap is signal (churn A/B tests,
    treatment-vs-control time-to-event).

    At each distinct event time t (pooled arms): with d_t total events,
    d1_t in arm A, n_t at risk, n1_t at risk in arm A,

        E1 = Σ d_t·n1_t/n_t
        V  = Σ d_t·(n1_t/n_t)·(1−n1_t/n_t)·(n_t−d_t)/(n_t−1)
        χ² = (O1 − E1)²/V,   O1 = Σ d1_t

    p-value via the engine p-value kernel on √χ² (χ²₁ tail ≡ two-sided
    normal tail).  One per-(group, time) aggregation + the KM risk-set
    countdown windows (run twice in the same partition: pooled and
    arm-A) — one scan, no joins, no plan forks.  Per-time E/V
    increments are floor-quantized to 10⁻⁹ and DECIMAL-accumulated, so
    the decision is bit-identical across engines.

    Returns (groups…, n_a, n_b, observed_a, expected_a, chi2, p_value,
    reject_05).
    """
    g = _as_list(group_columns)
    died = F.col(event_col).cast("bigint")
    ia = (F.col(arm_col) == F.lit(level_a)).cast("bigint")
    d = subjects.filter(
        F.col(arm_col).isin([level_a, level_b])
    ).select(
        *g,
        F.col(duration_col).alias("_t"),
        (died * ia).alias("_e1"),
        ((F.lit(1) - died) * ia).alias("_x1"),
        died.alias("_e"),
        (F.lit(1) - died).alias("_x"),
    )
    agg = d.groupBy(*g, "_t").agg(
        F.sum("_e1").alias("_d1"),
        F.sum("_x1").alias("_c1"),
        F.sum("_e").alias("_d"),
        F.sum("_x").alias("_c"),
    )
    w_cum = (
        Window.partitionBy(*g)
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*g)
    r = agg.select(
        *g,
        "_t",
        "_d1",
        "_d",
        F.sum(F.col("_d") + F.col("_c")).over(w_all).alias("_ntot"),
        F.sum(F.col("_d1") + F.col("_c1")).over(w_all).alias("_natot"),
        (
            F.sum(F.col("_d") + F.col("_c")).over(w_all)
            - F.sum(F.col("_d") + F.col("_c")).over(w_cum)
            + F.col("_d")
            + F.col("_c")
        ).alias("_n"),
        (
            F.sum(F.col("_d1") + F.col("_c1")).over(w_all)
            - F.sum(F.col("_d1") + F.col("_c1")).over(w_cum)
            + F.col("_d1")
            + F.col("_c1")
        ).alias("_n1"),
    ).filter(F.col("_d") > 0)
    dd = F.col("_d").cast("double")
    nd = F.col("_n").cast("double")
    n1d = F.col("_n1").cast("double")
    frac = n1d / nd
    e1 = dd * frac
    v = F.when(
        F.col("_n") > 1,
        dd * frac * (F.lit(1.0) - frac) * ((nd - dd) / (nd - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    qi = lambda c: F.floor(c * F.lit(1e9) + F.lit(0.5)).cast(  # noqa: E731
        "decimal(38,0)"
    )
    top = r.groupBy(*g).agg(
        F.max("_natot").alias("n_a"),
        (F.max("_ntot") - F.max("_natot")).alias("n_b"),
        F.sum("_d1").alias("observed_a"),
        F.sum(qi(e1)).alias("_se1"),
        F.sum(qi(v)).alias("_sv"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    e1d = s2d("_se1") / F.lit(1e9)
    vd = s2d("_sv") / F.lit(1e9)
    diff = F.col("observed_a").cast("double") - e1d
    chi2 = diff * diff / vd
    ok = vd > 0
    p = two_sided_p_expr(F.sqrt(chi2))
    return top.select(
        *g,
        "n_a",
        "n_b",
        "observed_a",
        e1d.alias("expected_a"),
        F.when(ok, chi2).alias("chi2"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def logrank_test_sql(
    subjects_sql: str,
    arm_col: str,
    level_a: str,
    level_b: str,
    duration_col: str,
    event_col: str,
    group_columns,
) -> str:
    """DuckDB twin of :func:`logrank_test`."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    win_cum = (
        f"PARTITION BY {gsel} ORDER BY _t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    win_all = f"PARTITION BY {gsel}"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    frac = "(CAST(_n1 AS DOUBLE) / CAST(_n AS DOUBLE))"
    e1 = f"(CAST(_d AS DOUBLE) * {frac})"
    v = (
        f"CASE WHEN _n > 1 THEN CAST(_d AS DOUBLE) * {frac} * (1.0 - {frac})"
        f" * ((CAST(_n AS DOUBLE) - CAST(_d AS DOUBLE))"
        f" / (CAST(_n AS DOUBLE) - 1.0)) ELSE 0.0 END"
    )
    qi = lambda x: (  # noqa: E731
        f"CAST(FLOOR(({x}) * 1e9 + 0.5) AS DECIMAL(38,0))"
    )
    e1d = f"({s2d('_se1')} / 1e9)"
    vd = f"({s2d('_sv')} / 1e9)"
    diff = f"(CAST(observed_a AS DOUBLE) - {e1d})"
    chi2 = f"({diff} * {diff} / {vd})"
    p = two_sided_p_sql(f"SQRT({chi2})")
    return f"""
WITH subj AS ({subjects_sql}),
d AS (
  SELECT {gsel}, {duration_col} AS _t,
    CAST({event_col} AS BIGINT)
      * CAST({arm_col} = {sq(level_a)} AS BIGINT) AS _e1,
    (1 - CAST({event_col} AS BIGINT))
      * CAST({arm_col} = {sq(level_a)} AS BIGINT) AS _x1,
    CAST({event_col} AS BIGINT) AS _e,
    1 - CAST({event_col} AS BIGINT) AS _x
  FROM subj WHERE {arm_col} IN ({sq(level_a)}, {sq(level_b)})
),
agg AS (
  SELECT {gsel}, _t,
    CAST(SUM(_e1) AS BIGINT) AS _d1, CAST(SUM(_x1) AS BIGINT) AS _c1,
    CAST(SUM(_e) AS BIGINT) AS _d, CAST(SUM(_x) AS BIGINT) AS _c
  FROM d GROUP BY {gsel}, _t
),
r AS (
  SELECT {gsel}, _t, _d1, _d,
    CAST(SUM(_d + _c) OVER ({win_all}) AS BIGINT) AS _ntot,
    CAST(SUM(_d1 + _c1) OVER ({win_all}) AS BIGINT) AS _natot,
    CAST(SUM(_d + _c) OVER ({win_all}) AS BIGINT)
      - CAST(SUM(_d + _c) OVER ({win_cum}) AS BIGINT) + _d + _c AS _n,
    CAST(SUM(_d1 + _c1) OVER ({win_all}) AS BIGINT)
      - CAST(SUM(_d1 + _c1) OVER ({win_cum}) AS BIGINT) + _d1 + _c1 AS _n1
  FROM agg
),
s AS (SELECT * FROM r WHERE _d > 0),
top AS (
  SELECT {gsel}, MAX(_natot) AS n_a, MAX(_ntot) - MAX(_natot) AS n_b,
    CAST(SUM(_d1) AS BIGINT) AS observed_a,
    SUM({qi(e1)}) AS _se1,
    SUM({qi(v)}) AS _sv
  FROM s GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b, observed_a,
  {e1d} AS expected_a,
  CASE WHEN {vd} > 0 THEN {chi2} END AS chi2,
  CASE WHEN {vd} > 0 THEN {p} END AS p_value,
  CASE WHEN {vd} > 0 THEN {p} < 0.05 END AS reject_05
FROM top
"""


def cumulative_incidence(
    subjects: DataFrame,
    cause_col: str,
    duration_col: str,
    group_columns,
    out_scale: int = 6,
) -> DataFrame:
    """Aalen–Johansen cumulative incidence under competing risks — the
    estimator naive "1 − KM of cause 1" gets WRONG when a competing
    event removes subjects (conversion vs churn, failure mode A vs B,
    death vs discharge).  ``cause_col`` codes each subject's terminal
    state: 0 = right-censored, 1 = the cause of interest, anything
    else = a competing event.

        CIF₁(t) = Σ_{u ≤ t} S(u⁻) · d₁ᵤ/nᵤ

    with S the ALL-cause KM curve.  Same single-chain frame as
    :func:`kaplan_meier`: one (group, time) aggregation, the risk-set
    countdown window, the ln-quantized exclusive-prefix KM product for
    S(u⁻), and per-time increments floor-quantized to 10⁻⁹ before the
    exact-integer cumulative SUM — bit-identical across engines.
    Curve rows step only at cause-1 event times (competing-event and
    censoring times fold into the risk set silently, the standard AJ
    presentation).

    Returns (groups…, duration, n_risk, n_cause, n_competing,
    n_censored, cuminc).
    """
    g = _as_list(group_columns)
    cause = F.col(cause_col).cast("bigint")
    agg = subjects.groupBy(*g, duration_col).agg(
        F.sum((cause == 1).cast("bigint")).alias("_d1"),
        F.sum(((cause != 0) & (cause != 1)).cast("bigint")).alias("_d2"),
        F.sum((cause == 0).cast("bigint")).alias("_c"),
    )
    w_cum = (
        Window.partitionBy(*g)
        .orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_excl = (
        Window.partitionBy(*g)
        .orderBy(duration_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*g)
    leave = F.col("_d1") + F.col("_d2") + F.col("_c")
    r = agg.withColumn(
        "n_risk",
        F.sum(leave).over(w_all) - F.sum(leave).over(w_cum) + leave,
    )
    dall = F.col("_d1") + F.col("_d2")
    # all-cause KM ln term, quantized (the kaplan_meier discipline)
    term_q = F.when(
        dall == 0, F.lit(0)
    ).when(
        F.col("n_risk") > dall,
        F.floor(
            F.log((F.col("n_risk") - dall) / F.col("n_risk").cast("double"))
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.lit(_NEG_INF_Q))
    r = r.withColumn("_lq", term_q)
    # S(t−): exp of the EXCLUSIVE prefix of quantized ln terms
    s_prev = F.exp(
        F.coalesce(F.sum("_lq").over(w_excl), F.lit(0)).cast("double")
        / F.lit(1e9)
    )
    inc_q = F.floor(
        s_prev
        * (F.col("_d1").cast("double") / F.col("n_risk").cast("double"))
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("bigint")
    r = r.withColumn("_iq", inc_q).withColumn(
        "_ciq", F.sum("_iq").over(w_cum)
    )
    mult = float(10**out_scale)
    return r.filter(F.col("_d1") > 0).select(
        *g,
        F.col(duration_col),
        F.col("n_risk"),
        F.col("_d1").alias("n_cause"),
        F.col("_d2").alias("n_competing"),
        F.col("_c").alias("n_censored"),
        (
            F.floor(
                F.col("_ciq").cast("double") / F.lit(1e9) * F.lit(mult)
                + F.lit(0.5)
            )
            / F.lit(mult)
        ).alias("cuminc"),
    )


def cumulative_incidence_sql(
    subjects_sql: str,
    cause_col: str,
    duration_col: str,
    group_columns,
    out_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`cumulative_incidence`."""
    from timeseriesutils_spark.functions.exact import dlit

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    mult = 10**out_scale
    win_cum = (
        f"PARTITION BY {gsel} ORDER BY {duration_col} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    win_excl = (
        f"PARTITION BY {gsel} ORDER BY {duration_col} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    )
    win_all = f"PARTITION BY {gsel}"
    return f"""
WITH subj AS ({subjects_sql}),
agg AS (
  SELECT {gsel}, {duration_col},
    CAST(SUM(CASE WHEN CAST({cause_col} AS BIGINT) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS _d1,
    CAST(SUM(CASE WHEN CAST({cause_col} AS BIGINT) NOT IN (0, 1) THEN 1 ELSE 0 END) AS BIGINT) AS _d2,
    CAST(SUM(CASE WHEN CAST({cause_col} AS BIGINT) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS _c
  FROM subj GROUP BY {gsel}, {duration_col}
),
r AS (
  SELECT *,
    CAST(SUM(_d1 + _d2 + _c) OVER ({win_all}) AS BIGINT)
      - CAST(SUM(_d1 + _d2 + _c) OVER ({win_cum}) AS BIGINT)
      + _d1 + _d2 + _c AS n_risk
  FROM agg
),
t AS (
  SELECT *,
    CASE WHEN _d1 + _d2 = 0 THEN 0
      WHEN n_risk > _d1 + _d2
      THEN CAST(FLOOR(ln((n_risk - (_d1 + _d2)) / CAST(n_risk AS DOUBLE))
           * 1e9 + 0.5) AS BIGINT)
      ELSE CAST({_NEG_INF_Q} AS BIGINT) END AS _lq
  FROM r
),
s AS (
  SELECT *,
    CAST(FLOOR(exp(CAST(COALESCE(CAST(SUM(_lq) OVER ({win_excl}) AS BIGINT), 0)
          AS DOUBLE) / 1e9)
      * (CAST(_d1 AS DOUBLE) / CAST(n_risk AS DOUBLE)) * 1e9 + 0.5)
      AS BIGINT) AS _iq
  FROM t
),
c AS (SELECT *, CAST(SUM(_iq) OVER ({win_cum}) AS BIGINT) AS _ciq FROM s)
SELECT {gsel}, {duration_col}, n_risk, _d1 AS n_cause, _d2 AS n_competing,
  _c AS n_censored,
  FLOOR(CAST(_ciq AS DOUBLE) / 1e9 * {dlit(float(mult))} + 0.5)
    / {dlit(float(mult))} AS cuminc
FROM c WHERE _d1 > 0
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


# --------------------------------------------------------------------------
# restricted mean survival time
# --------------------------------------------------------------------------


def rmst(
    subjects: DataFrame,
    tau: int,
    stratum_col: str = "stratum",
    duration_col: str = "t_day",
    event_col: str = "died",
    out_scale: int = 6,
) -> DataFrame:
    """Per-stratum restricted mean survival time RMST(τ) = ∫₀^τ S(t)dt
    — the area under the Kaplan–Meier curve up to a fixed horizon: the
    "average survival time over the next τ units" summary that stays
    meaningful when the median is never reached and that compares arms
    without the proportional-hazards assumption log-rank leans on.

    S is the step function from :func:`kaplan_meier` (S = 1 before the
    first event time), so the integral is an exact rectangle sum:

        RMST = Σ_i S(t_{i−1})·(t_i − t_{i−1}) + S(t_last)·(τ − t_last)

    over event times t_i ≤ τ.  Exactness: the KM survival values are
    already 10^-out_scale-quantized — the rectangle areas are integer
    units × integer widths, DECIMAL-summed (order-free), one double
    division at the end.  Strata whose first event time exceeds τ (or
    with no events) have RMST ≡ τ and emit no row, matching KM's
    events-only output contract (documented).

    Returns (stratum, tau, n_events_within, rmst).
    """
    km = kaplan_meier(
        subjects, stratum_col, duration_col, event_col, out_scale
    )
    m = 10**out_scale
    sq = F.floor(F.col("survival") * F.lit(float(m)) + F.lit(0.5)).cast(
        "bigint"
    )
    steps = km.filter(F.col(duration_col) <= tau).select(
        F.col(stratum_col),
        F.col(duration_col).cast("bigint").alias("_t"),
        sq.alias("_sq"),
        F.col("n_events"),
    )
    w = Window.partitionBy(stratum_col).orderBy("_t")
    prev_t = F.lag("_t", 1, 0).over(w)
    prev_s = F.lag("_sq", 1, m).over(w)  # S = 1 before the first event
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rect = steps.select(
        stratum_col,
        "_t",
        "_sq",
        "n_events",
        (prev_s * (F.col("_t") - prev_t)).alias("_area_q"),
    )
    agg = rect.groupBy(stratum_col).agg(
        F.sum("n_events").alias("n_events_within"),
        F.sum(dec(F.col("_area_q"))).alias("_aq"),
        F.max(F.struct(F.col("_t"), F.col("_sq"))).alias("_last"),
    )
    tail_q = F.col("_last._sq") * (F.lit(int(tau)) - F.col("_last._t"))
    total = (
        F.col("_aq").cast("string").cast("double")
        + tail_q.cast("double")
    ) / F.lit(float(m))
    return agg.select(
        F.col(stratum_col),
        F.lit(int(tau)).alias("tau"),
        F.col("n_events_within"),
        total.alias("rmst"),
    )


def rmst_sql(
    subjects_sql: str,
    tau: int,
    stratum_col: str = "stratum",
    duration_col: str = "t_day",
    event_col: str = "died",
    out_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`rmst` (same rectangle integers over the
    kaplan_meier twin)."""
    km = kaplan_meier_sql(
        subjects_sql, stratum_col, duration_col, event_col, out_scale
    )
    m = 10**out_scale
    over = f"(PARTITION BY {stratum_col} ORDER BY _t)"
    return f"""
WITH km AS ({km}),
steps AS (
  SELECT {stratum_col}, CAST({duration_col} AS BIGINT) AS _t,
    CAST(FLOOR(survival * {float(m)!r} + 0.5) AS BIGINT) AS _sq,
    n_events
  FROM km WHERE {duration_col} <= {int(tau)}
),
rect AS (
  SELECT {stratum_col}, _t, _sq, n_events,
    COALESCE(LAG(_sq, 1) OVER {over}, {m})
      * (_t - COALESCE(LAG(_t, 1) OVER {over}, 0)) AS _area_q
  FROM steps
),
agg AS (
  SELECT {stratum_col},
    CAST(SUM(n_events) AS BIGINT) AS n_events_within,
    SUM(CAST(_area_q AS DECIMAL(38,0))) AS _aq,
    arg_max(_sq, _t) AS _last_sq,
    CAST(MAX(_t) AS BIGINT) AS _last_t
  FROM rect GROUP BY {stratum_col}
)
SELECT {stratum_col}, {int(tau)} AS tau, n_events_within,
  (CAST(CAST(_aq AS VARCHAR) AS DOUBLE)
   + CAST(_last_sq * ({int(tau)} - _last_t) AS DOUBLE))
  / {float(m)!r} AS rmst
FROM agg
"""


def weibull_fit(
    subjects: DataFrame,
    stratum_col: str = "stratum",
    duration_col: str = "t_day",
    event_col: str = "died",
    out_scale: int = 6,
) -> DataFrame:
    """Weibull probability-plot fit per stratum (the classic
    linearization, public): the Kaplan–Meier curve handles censoring;
    regressing its event-time points on

        ln(−ln S(t)) = k·ln t − k·ln λ

    recovers the Weibull shape ``k`` (k < 1: infant mortality /
    improving hazard, k ≈ 1: exponential, k > 1: wear-out) and scale
    ``λ`` (the 63.2% lifetime) — the parametric summary next to the
    non-parametric KM/Nelson–Aalen rows, and the standard quick
    reliability fit before an MLE.

    Exact path: KM survival is already quantized; both plot
    coordinates are 1e-9-quantized lns; every OLS sufficient statistic
    (Σx, Σy, Σxy, Σx²) is a 1e-9-quantized per-point term summed as
    exact integers through DECIMAL; the slope/intercept/exp(−b/k) tree
    is one shared double form (exp re-quantized).  Points with S = 0,
    S = 1 (after quantization) or t ≤ 0 are outside the double-log
    domain and drop, per the standard plot convention.

    Returns (stratum, n_points, shape_k, scale_lambda, r_squared).
    """
    km = kaplan_meier(
        subjects, stratum_col, duration_col, event_col, out_scale
    )
    q9 = F.lit(1.0e9)
    s = F.col("survival")
    t = F.col(duration_col).cast("double")
    pts = km.filter((s > 0) & (s < 1) & (t > 0))
    lns = F.floor(F.log(s) * q9 + F.lit(0.5)) / q9
    y = F.floor(F.log(-lns) * q9 + F.lit(0.5)) / q9
    x = F.floor(F.log(t) * q9 + F.lit(0.5)) / q9
    dec = lambda c: F.floor(c * q9 + F.lit(0.5)).cast("decimal(38,0)")  # noqa: E731
    agg = pts.select(
        stratum_col,
        dec(x).alias("_x"),
        dec(y).alias("_y"),
        dec(x * y).alias("_xy"),
        dec(x * x).alias("_xx"),
        (dec(y) * dec(y)).cast("decimal(38,0)").alias("_yy2"),
    ).groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum("_xy").alias("_sxy"),
        F.sum("_xx").alias("_sxx"),
        F.sum("_yy2").alias("_syy2"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double") / F.lit(1.0e9)  # noqa: E731
    nn = F.col("n_points").cast("double")
    sx, sy = s2d("_sx"), s2d("_sy")
    sxy, sxx = s2d("_sxy"), s2d("_sxx")
    # Σy² carries TWO 1e-9 factors (product of two quantized ints)
    syy = (
        F.col("_syy2").cast("string").cast("double") / F.lit(1.0e18)
    )
    den = nn * sxx - sx * sx
    k = F.when(den != 0, (nn * sxy - sx * sy) / den)
    b = (sy - k * sx) / nn
    eq = F.floor(F.exp(-b / k) * q9 + F.lit(0.5)) / q9
    sst = nn * syy - sy * sy
    r2 = F.when(sst > 0, (nn * sxy - sx * sy) * (nn * sxy - sx * sy)
                / (den * sst))
    return agg.filter(F.col("n_points") >= 2).select(
        stratum_col,
        "n_points",
        k.alias("shape_k"),
        F.when(k > 0, eq).alias("scale_lambda"),
        r2.alias("r_squared"),
    )


def weibull_fit_sql(
    subjects_sql: str,
    stratum_col: str = "stratum",
    duration_col: str = "t_day",
    event_col: str = "died",
    out_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`weibull_fit` (same KM twin inside, same
    quantize points, same OLS tree)."""
    km = kaplan_meier_sql(
        subjects_sql, stratum_col, duration_col, event_col, out_scale
    )
    q9 = "1000000000.0"
    lns = f"(FLOOR(LN(survival) * {q9} + 0.5) / {q9})"
    y = f"(FLOOR(LN(-{lns}) * {q9} + 0.5) / {q9})"
    x = f"(FLOOR(LN(CAST({duration_col} AS DOUBLE)) * {q9} + 0.5) / {q9})"
    dec = lambda c: f"CAST(FLOOR({c} * {q9} + 0.5) AS DECIMAL(38,0))"  # noqa: E731
    s2d = lambda c: f"(CAST(CAST({c} AS VARCHAR) AS DOUBLE) / {q9})"  # noqa: E731
    nn = "CAST(n_points AS DOUBLE)"
    sx, sy = s2d("_sx"), s2d("_sy")
    sxy, sxx = s2d("_sxy"), s2d("_sxx")
    syy = f"(CAST(CAST(_syy2 AS VARCHAR) AS DOUBLE) / 1e18)"
    den = f"({nn} * {sxx} - {sx} * {sx})"
    k = f"(CASE WHEN {den} <> 0 THEN ({nn} * {sxy} - {sx} * {sy}) / {den} END)"
    b = f"(({sy} - {k} * {sx}) / {nn})"
    eq = f"(FLOOR(EXP(-{b} / {k}) * {q9} + 0.5) / {q9})"
    sst = f"({nn} * {syy} - {sy} * {sy})"
    r2 = (f"(CASE WHEN {sst} > 0 THEN ({nn} * {sxy} - {sx} * {sy})"
          f" * ({nn} * {sxy} - {sx} * {sy}) / ({den} * {sst}) END)")
    return f"""
WITH km AS ({km}),
pts AS (
  SELECT {stratum_col}, {dec(x)} AS _x, {dec(y)} AS _y,
    {dec(f'({x} * {y})')} AS _xy, {dec(f'({x} * {x})')} AS _xx,
    CAST({dec(y)} * {dec(y)} AS DECIMAL(38,0)) AS _yy2
  FROM km
  WHERE survival > 0 AND survival < 1 AND {duration_col} > 0
),
agg AS (
  SELECT {stratum_col}, COUNT(*) AS n_points,
    CAST(SUM(_x) AS DECIMAL(38,0)) AS _sx,
    CAST(SUM(_y) AS DECIMAL(38,0)) AS _sy,
    CAST(SUM(_xy) AS DECIMAL(38,0)) AS _sxy,
    CAST(SUM(_xx) AS DECIMAL(38,0)) AS _sxx,
    CAST(SUM(_yy2) AS DECIMAL(38,0)) AS _syy2
  FROM pts GROUP BY {stratum_col}
)
SELECT {stratum_col}, n_points,
  {k} AS shape_k,
  CASE WHEN {k} > 0 THEN {eq} END AS scale_lambda,
  {r2} AS r_squared
FROM agg WHERE n_points >= 2
"""
