"""Automatic forecast-model selection by AICc (`ets_select`) — the
missing "which model do I run?" step over the engine's smoothing
family.  Public knowledge: Hyndman & Khandakar 2008 (the `ets`/
`auto.arima` selection loop: fit a candidate family, score each by
AICc, keep the argmin) and the FPP3 benchmark set (naive / seasonal
naive / drift / mean) — no counterpart in the 686-line reference.

Candidates (all ONE-STEP trailing-lag linear filters with
driver-precomputed impulse weights, the holt_smooth discipline —
k = smoothing-parameter count for the AICc penalty):

    naive        k=0   ŷ_t = y_{t-1}
    snaive       k=0   ŷ_t = y_{t-m}                 (m = season)
    drift        k=1   ŷ_t = y_{t-1} + (y_{t-1} - y_{t-w})/(w-1)
    mean         k=1   ŷ_t = mean(y_{t-1} .. y_{t-w})
    ses          k=1   truncated SES(α)
    holt         k=2   truncated Holt(α, β): level + trend
    holt_damped  k=3   truncated damped Holt(α, β, φ): level + φ·trend
    holt_winters k=3   truncated additive HW(α, β, γ, m):
                       level + trend + next-phase seasonal

This is the fixed-parameter (grid) variant of the selection loop: the
smoothing constants are the caller's literals, not per-group optimized
— what changes per group is WHICH structure wins, which is the
question AICc answers.  Selection criterion (FPP3 §7.5 convention,
σ² counted as a parameter, profile likelihood):

    AICc = n·ln(SSE/n) + 2(k+1) + 2(k+1)(k+2)/(n-k-2)

Spark-first shape: every candidate's in-sample one-step forecast and
the next-step forecast from each group's last row are window
expressions over the SAME (group, order) window spec — Catalyst
collapses them into ONE Window operator on ONE hash exchange; the
per-group reduction is a single map-combinable groupBy (no joins, no
plan forks); the model unpivot explodes a CANDIDATE-COUNT-sized array
per group row.  At 100 TB: one exchange on the group key + one
aggregation — the same shape as a grouped sum.

Exactness (the repo's lockstep discipline): values quantize to
10^-scale ints; each candidate's forecast is one fixed double tree
(literal weights × integer lags, identical term order and association
in both engines); residuals re-quantize at 1e-4 of the value grid so
SSE accumulates as EXACT integers in DECIMAL(38,0)/HUGEINT; AICc's
single ln() output is floor-quantized at 1e-6 (the libm-grid rule:
quantum ≥ 10³ ulps of the n·ln(·) noise) and the argmin tiebreak is
total (aicc_q, model name) — both engines pick the same winner.

Reference scope note: cites featurize.py only as the feature producer
this selects a downstream model for; the reference implements no
forecasting or model selection (SURVEY.md §0).
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit
from timeseriesutils_spark.operators.forecast import (
    holt_damped_weights,
    holt_weights,
    holt_winters_weights,
)
from timeseriesutils_spark.operators.window_features import _as_list, make_window

__all__ = ["ets_candidates", "ets_select", "ets_select_sql"]

# residual sub-grid: e quantizes at (value grid)·1e-4, so SSE integers
# live at 1e-8 of the value grid squared
_RQ = 10**4


def ets_candidates(
    window_size: int = 14,
    season: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    phi: float = 0.9,
    gamma: float = 0.2,
) -> list[tuple[str, int, list[tuple[int, float]]]]:
    """The candidate family as (name, k, sparse one-step weights):
    weights[(j, w_j)] means the forecast FOR row t made from data
    through t-1 is Σ w_j·y_{t-j} (j ≥ 1).  Driver float64, emitted as
    literals into both expression trees."""
    w = int(window_size)
    m = int(season)
    if w < m:
        raise ValueError("window_size must be >= season")
    out: list[tuple[str, int, list[tuple[int, float]]]] = []
    out.append(("naive", 0, [(1, 1.0)]))
    out.append(("snaive", 0, [(m, 1.0)]))
    drift = [(1, 1.0 + 1.0 / (w - 1)), (w, -1.0 / (w - 1))]
    out.append(("drift", 1, drift))
    out.append(("mean", 1, [(j, 1.0 / w) for j in range(1, w + 1)]))
    a = float(alpha)
    out.append(
        ("ses", 1, [(j + 1, a * (1.0 - a) ** j) for j in range(w)])
    )
    wl, wb = holt_weights(alpha, beta, w)
    out.append(
        ("holt", 2, [(j + 1, wl[j] + wb[j]) for j in range(w)])
    )
    dl, db = holt_damped_weights(alpha, beta, phi, w)
    out.append(
        (
            "holt_damped",
            3,
            [(j + 1, dl[j] + float(phi) * db[j]) for j in range(w)],
        )
    )
    hl, hb, hs = holt_winters_weights(alpha, beta, gamma, m, w)
    out.append(
        (
            "holt_winters",
            3,
            [(j + 1, hl[j] + hb[j] + hs[j]) for j in range(w)],
        )
    )
    return out


def ets_select(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    window_size: int = 14,
    season: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    phi: float = 0.9,
    gamma: float = 0.2,
    scale: int = 2,
    min_obs: int = 8,
    engine: str = "sql",
) -> DataFrame:
    """Per-group AICc argmin over the candidate family (module doc).

    Returns ONE row per group with ≥ ``min_obs`` scoreable rows:
    (groups…, model, k, n_obs, sse, aicc, forecast) — the winning
    structure, its in-sample fit, and its next-step forecast from the
    group's last row (NULL if the last row lacks a full window).

    ``engine="sql"`` (round-14, the fasttext IRLS precedent): the
    ~450-term candidate projection renders as SQL text — ONE
    ``selectExpr`` py4j round trip instead of ~900 Column-construction
    calls; the parsed tree is the identical expression shape (same
    ``dlit`` double literals, same left-associated sums), pinned
    bit-identical to ``engine="colapi"`` in tests/test_round14_opt.py.
    """
    g = _as_list(group_columns)
    order = _as_list(order_by)
    w = make_window(g, order)
    wall = Window.partitionBy(*g)
    wsz = int(window_size)
    mult = float(10**scale)
    cands = ets_candidates(wsz, season, alpha, beta, phi, gamma)

    q = F.floor(F.col(column) * F.lit(mult) + F.lit(0.5)).cast("bigint")
    d = (
        data.filter(F.col(column).isNotNull())
        .select(*g, *order, q.cast("double").alias("_qd"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_nrows", F.count(F.lit(1)).over(wall))
    )

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    if engine == "sql":
        from timeseriesutils_spark.functions.exact import dlit as _dl

        over = (
            f"PARTITION BY {', '.join(g)} ORDER BY {', '.join(order)}"
        )

        def lag_txt(j: int) -> str:
            return f"lag(_qd, {j}) OVER ({over})" if j else "_qd"

        def combo_txt(weights, shift: int) -> str:
            return " + ".join(
                f"{_dl(wt)} * {lag_txt(j - shift)}" for j, wt in weights
            )

        proj_t = [*g, "_rn", "_nrows", f"_rn > {wsz} AS _ok"]
        for name, k, wts in cands:
            proj_t.append(
                f"CASE WHEN _rn > {wsz} THEN CAST(FLOOR((_qd - "
                f"({combo_txt(wts, 0)})) * {_dl(float(_RQ))} + {_dl(0.5)}) "
                f"AS BIGINT) END AS _e_{name}"
            )
            # next-step forecast made FROM the last row (lags shift by
            # one); complete-window guard: rn >= wsz
            proj_t.append(
                f"CASE WHEN _rn = _nrows AND _rn >= {wsz} THEN "
                f"({combo_txt(wts, 1)}) / {_dl(mult)} END AS _f_{name}"
            )
        staged = d.selectExpr(*proj_t)
    else:
        def combo(weights, shift):
            terms = [
                F.lit(wt) * F.lag("_qd", j - shift).over(w)
                if j - shift
                else F.lit(wt) * F.col("_qd")
                for j, wt in weights
            ]
            return _reduce(lambda x, y: x + y, terms)

        # scoreable rows: a full window of true predecessors
        valid = F.col("_rn") > F.lit(wsz)
        proj = [*g, F.col("_rn"), F.col("_nrows"), valid.alias("_ok")]
        for name, k, wts in cands:
            eq = F.floor(
                (F.col("_qd") - combo(wts, 0)) * F.lit(float(_RQ))
                + F.lit(0.5)
            ).cast("bigint")
            proj.append(F.when(valid, eq).alias(f"_e_{name}"))
            # next-step forecast made FROM the last row (lags shift by
            # one); complete-window guard = the last row is itself
            # scoreable-plus-one: rn >= wsz (w-1 predecessors + current)
            proj.append(
                F.when(
                    (F.col("_rn") == F.col("_nrows")) & (F.col("_rn") >= wsz),
                    combo(wts, 1) / F.lit(mult),
                ).alias(f"_f_{name}")
            )
        staged = d.select(*proj)

    aggs = [F.sum(F.when(F.col("_ok"), 1).otherwise(0)).alias("_n")]
    for name, _, _ in cands:
        aggs.append(
            F.sum(dec(F.col(f"_e_{name}")) * dec(F.col(f"_e_{name}"))).alias(
                f"_s_{name}"
            )
        )
        aggs.append(F.max(F.col(f"_f_{name}")).alias(f"_fn_{name}"))
    per_group = staged.groupBy(*g).agg(*aggs).filter(
        F.col("_n") >= int(min_obs)
    )

    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731
    sseden = float(mult * mult * _RQ * _RQ)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("model"),
                F.lit(int(k)).alias("k"),
                s2d(F.greatest(F.col(f"_s_{name}"), F.lit(1).cast("decimal(38,0)"))).alias(
                    "_sseq"
                ),
                (s2d(F.col(f"_s_{name}")) / F.lit(sseden)).alias("sse"),
                F.col(f"_fn_{name}").alias("forecast"),
            )
            for name, k, _ in cands
        ]
    )
    exploded = per_group.select(*g, F.col("_n"), F.explode(rows).alias("c"))
    nd = F.col("_n").cast("double")
    kd = F.col("c.k").cast("double")
    kp = kd + F.lit(1.0)
    aicc = (
        nd * F.log(F.col("c._sseq") / (nd * F.lit(sseden)))
        + F.lit(2.0) * kp
        + F.lit(2.0) * kp * (kp + F.lit(1.0)) / (nd - kp - F.lit(1.0))
    )
    aicc_q = F.when(
        nd - kd - F.lit(2.0) > F.lit(0.0),
        F.floor(aicc * F.lit(1.0e6) + F.lit(0.5)).cast("bigint"),
    )
    scored = exploded.select(
        *g,
        F.col("c.model").alias("model"),
        F.col("c.k").alias("k"),
        F.col("_n").alias("n_obs"),
        F.col("c.sse").alias("sse"),
        aicc_q.alias("_aq"),
        F.col("c.forecast").alias("forecast"),
    )
    rank_w = Window.partitionBy(*g).orderBy(
        F.when(F.col("_aq").isNull(), 1).otherwise(0),
        F.col("_aq"),
        F.col("model"),
    )
    return (
        scored.withColumn("_r", F.row_number().over(rank_w))
        .filter(F.col("_r") == 1)
        .select(
            *g,
            "model",
            "k",
            "n_obs",
            "sse",
            (F.col("_aq").cast("double") / F.lit(1.0e6)).alias("aicc"),
            "forecast",
        )
    )


def ets_select_sql(
    table_sql: str,
    column: str,
    group_columns,
    order_by,
    window_size: int = 14,
    season: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    phi: float = 0.9,
    gamma: float = 0.2,
    scale: int = 2,
    min_obs: int = 8,
) -> str:
    """DuckDB twin of :func:`ets_select` — same literals, same term
    order, same association, same quantization grids."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    osel = ", ".join(_as_list(order_by))
    over = f"(PARTITION BY {gsel} ORDER BY {osel})"
    wall = f"(PARTITION BY {gsel})"
    wsz = int(window_size)
    mult = float(10**scale)
    cands = ets_candidates(wsz, season, alpha, beta, phi, gamma)
    s2d = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731
    sseden = float(mult * mult * _RQ * _RQ)

    def combo(weights, shift):
        terms = [
            f"{dlit(wt)} * "
            + (f"LAG(_qd, {j - shift}) OVER {over}" if j - shift else "_qd")
            for j, wt in weights
        ]
        return "(" + " + ".join(terms) + ")"

    ecols, acols, ucols = [], [], []
    for name, k, wts in cands:
        ecols.append(
            f"CASE WHEN _rn > {wsz} THEN CAST(FLOOR((_qd - {combo(wts, 0)})"
            f" * {dlit(float(_RQ))} + 0.5) AS BIGINT) END AS _e_{name}"
        )
        ecols.append(
            f"CASE WHEN _rn = _nrows AND _rn >= {wsz}"
            f" THEN {combo(wts, 1)} / {dlit(mult)} END AS _f_{name}"
        )
        acols.append(
            f"SUM(CAST(_e_{name} AS HUGEINT) * _e_{name}) AS _s_{name}"
        )
        acols.append(f"MAX(_f_{name}) AS _fn_{name}")
        ucols.append(
            f"SELECT {gsel}, _n, '{name}' AS model, {int(k)} AS k,\n"
            f"    {s2d(f'GREATEST(_s_{name}, CAST(1 AS HUGEINT))')} AS _sseq,\n"
            f"    {s2d(f'_s_{name}')} / {dlit(sseden)} AS sse,\n"
            f"    _fn_{name} AS forecast FROM agg"
        )
    unioned = "\n  UNION ALL\n  ".join(ucols)
    nd = "CAST(_n AS DOUBLE)"
    kd = "CAST(k AS DOUBLE)"
    kp = f"({kd} + 1.0)"
    aicc = (
        f"({nd} * ln(_sseq / ({nd} * {dlit(sseden)}))"
        f" + 2.0 * {kp} + 2.0 * {kp} * ({kp} + 1.0) / ({nd} - {kp} - 1.0))"
    )
    esel = ",\n    ".join(ecols)
    asel = ",\n    ".join(acols)
    return f"""
WITH d AS (
  SELECT {gsel}, {osel},
    CAST(CAST(FLOOR({column} * {dlit(mult)} + 0.5) AS BIGINT) AS DOUBLE)
      AS _qd,
    ROW_NUMBER() OVER {over} AS _rn,
    COUNT(*) OVER {wall} AS _nrows
  FROM ({table_sql}) WHERE {column} IS NOT NULL
),
staged AS (
  SELECT {gsel}, _rn, _nrows, (_rn > {wsz}) AS _ok,
    {esel}
  FROM d
),
agg AS (
  SELECT {gsel},
    CAST(SUM(CASE WHEN _ok THEN 1 ELSE 0 END) AS BIGINT) AS _n,
    {asel}
  FROM staged GROUP BY {gsel}
  HAVING CAST(SUM(CASE WHEN _ok THEN 1 ELSE 0 END) AS BIGINT)
         >= {int(min_obs)}
),
long AS (
  {unioned}
),
scored AS (
  SELECT {gsel}, model, k, _n AS n_obs, sse,
    CASE WHEN {nd} - {kd} - 2.0 > 0.0
      THEN CAST(FLOOR({aicc} * 1000000.0 + 0.5) AS BIGINT) END AS _aq,
    forecast
  FROM long
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {gsel}
    ORDER BY CASE WHEN _aq IS NULL THEN 1 ELSE 0 END, _aq, model) AS _r
  FROM scored
)
SELECT {gsel}, model, CAST(k AS INT) AS k, n_obs, sse,
  CAST(_aq AS DOUBLE) / 1000000.0 AS aicc, forecast
FROM ranked WHERE _r = 1
"""
