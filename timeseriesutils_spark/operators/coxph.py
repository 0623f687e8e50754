"""Cox proportional-hazards regression (single covariate, Breslow
ties, fixed unrolled Newton schedule) — the inference layer on top of
the engine's survival family (kaplan_meier/nelson_aalen describe ONE
arm; logrank compares two; Cox QUANTIFIES a continuous covariate's
effect on the hazard, the workhorse of time-to-event analysis):

    h(t|x) = h₀(t)·exp(βx)

β̂ maximizes the Breslow partial likelihood; with one covariate the
Newton update is scalar,

    U(β) = Σ_events (x_i − S1(t_i)/S0(t_i))
    I(β) = Σ_events d_t·(S2/S0 − (S1/S0)²)
    β ← β + U/I,      S_k(t) = Σ_{j: t_j ≥ t} x_j^k·exp(βx_j)

run from β = 0 for a FIXED number of steps (the kmeans/binseg unrolled
-iteration discipline — a fixed DAG both engines replay; the partial
likelihood is concave, 3 steps give ~quadratic-convergence accuracy
for O(1)-bounded covariates, pinned against a reference implementation
in tests).

Exactness contract: covariates quantize to int64 (callers keep x
O(1)-bounded — standardize first; grids below assume |x| ≲ 100).
Rows collapse to (t, xq) CELLS with counts, so exp(β·x) evaluates once
per cell; each cell's exp output is floor-quantized at 1e-9 BEFORE the
integer multiply by its count (the libm rule), risk-set sums are exact
suffix sums of those integers (one cumulative window per step over the
per-time frame), and each event-time's U/I contribution re-quantizes
at 1e-9 before the final integer reduce.  β's update is one shared
double tree — bit-identical cross-engine, which is what lets a
Newton-iterated estimator be oracle-checked at all.

Scale shape: the cell collapse is the only row-scale aggregation; every
Newton step runs on the per-(group, time) frame (≤ distinct event
times — tiny), with the β frame broadcast back.  At 100 TB the cells
frame is the working set; int64 cell sums hold to ~10^17 mass per
group (DECIMAL swap documented at the aggregation sites).

Round-14 optimization (guide §1.2/§4.2 — the seasonal_esd precedent):
the default ``engine="arrow"`` runs ALL Newton rounds as ONE grouped
Arrow kernel over the cells frame — the cell collapse stays the only
row-scale stage, and the 4 broadcast-join + window + double-aggregation
eval passes (each with an eager localCheckpoint barrier, ~16 sequential
scheduler rounds) collapse to a single applyInPandas.  The kernel
replays the identical integer/double recurrence: exp() evaluates via
scalar libm (math.exp) once per DISTINCT covariate cell — the same
last-ulp surface the DuckDB twin's EXP sees, absorbed by the q9 grid
(the libm rule) exactly as the relational chain's JVM exp was; risk-set
suffix sums are exact int64 (a loud ValueError replaces ANSI's loud
overflow beyond the envelope); the u/i double tree and the β update are
the same IEEE operation sequence.  The relational unroll is kept
verbatim as ``engine="relational"`` (A/B control).

No counterpart in the reference engine — §2.2b survival-inference
extension (Cox 1972, public).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.cache import pin
from timeseriesutils_spark.functions.exact import dlit
from timeseriesutils_spark.operators.nonparam import (
    two_sided_p_expr,
    two_sided_p_sql,
)
from timeseriesutils_spark.operators.window_features import _as_list

__all__ = ["cox_ph", "cox_ph_sql"]


def cox_ph(
    df: DataFrame,
    time_col: str,
    event_col: str,
    x_col: str,
    group_columns,
    n_steps: int = 3,
    scale_x: int = 6,
    engine: str = "arrow",
) -> DataFrame:
    """See module docstring.  ``event_col``: 1 = event, 0 = censored.

    Returns (groups…, n, n_events, beta, se, z_stat, p_value,
    hazard_ratio); NULL inference where the information is 0 (constant
    covariate or no events)."""
    groups = _as_list(group_columns)
    mx = 10**scale_x
    xq = F.floor(
        F.col(x_col).cast("double") * F.lit(float(mx)) + F.lit(0.5)
    ).cast("bigint")
    d = df.filter(
        F.col(time_col).isNotNull()
        & F.col(event_col).isNotNull()
        & F.col(x_col).isNotNull()
    ).select(
        *groups,
        F.col(time_col).cast("bigint").alias("_t"),
        F.col(event_col).cast("int").alias("_e"),
        xq.alias("_xq"),
    )
    cells_raw = d.groupBy(*groups, "_t", "_xq").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum("_e").cast("bigint").alias("_d"),
    )
    if engine == "arrow":
        return _cox_finish(
            _cox_newton_np(cells_raw, groups, n_steps, mx), groups
        )
    cells = pin(cells_raw)
    xf = F.col("_xq").cast("double") / F.lit(float(mx))
    q9 = lambda c: F.floor(c * F.lit(1.0e9) + F.lit(0.5)).cast("bigint")  # noqa: E731

    # materialize the pinned cells at the session's full shuffle width
    # (the cell collapse is the only row-scale stage), then narrow the
    # loop: every Newton-step exchange moves per-(group, time) frames —
    # ≤ distinct event times per group — and full-width shuffles there
    # are pure scheduling overhead (the pagerank narrowing rule;
    # measured ~4.2 → ~3.4 s at sf0.1).  Restored in the finally below.
    cells.count()
    betas = cells.groupBy(*groups).agg(
        F.sum("_cnt").cast("bigint").alias("n"),
        F.sum("_d").cast("bigint").alias("n_events"),
    ).select(*groups, "n", "n_events", F.lit(0.0).alias("beta"))

    wprefix = (
        Window.partitionBy(*groups)
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy(*groups)

    def eval_pass(betas_df: DataFrame) -> DataFrame:
        """(groups, u_int, i_int) at the current β (exact-int reduce)."""
        j = cells.join(
            F.broadcast(betas_df.select(*groups, "beta")), on=groups
        )
        e = F.exp(F.col("beta") * xf)
        w = j.select(
            *groups,
            "_t",
            "_d",
            (q9(e) * F.col("_cnt")).alias("_q0"),
            (q9(e * xf) * F.col("_cnt")).alias("_q1"),
            (q9(e * xf * xf) * F.col("_cnt")).alias("_q2"),
            (F.col("_xq") * F.col("_d")).alias("_sxq"),
        )
        per_t = w.groupBy(*groups, "_t").agg(
            F.sum("_q0").alias("_w0"),
            F.sum("_q1").alias("_w1"),
            F.sum("_q2").alias("_w2"),
            F.sum("_d").cast("bigint").alias("_dt"),
            F.sum("_sxq").alias("_sx"),
        )
        sfx = per_t.select(
            *groups,
            "_t",
            "_dt",
            "_sx",
            (
                F.sum("_w0").over(wall)
                - F.coalesce(F.sum("_w0").over(wprefix), F.lit(0).cast("bigint"))
            ).alias("_s0"),
            (
                F.sum("_w1").over(wall)
                - F.coalesce(F.sum("_w1").over(wprefix), F.lit(0).cast("bigint"))
            ).alias("_s1"),
            (
                F.sum("_w2").over(wall)
                - F.coalesce(F.sum("_w2").over(wprefix), F.lit(0).cast("bigint"))
            ).alias("_s2"),
        ).filter(F.col("_dt") > 0)
        s0 = F.col("_s0").cast("double")
        s1 = F.col("_s1").cast("double")
        s2 = F.col("_s2").cast("double")
        dt = F.col("_dt").cast("double")
        r1 = s1 / s0
        u_t = F.col("_sx").cast("double") / F.lit(float(mx)) - dt * r1
        i_t = dt * (s2 / s0 - r1 * r1)
        contrib = sfx.select(
            *groups, q9(u_t).alias("_uq"), q9(i_t).alias("_iq")
        )
        return contrib.groupBy(*groups).agg(
            F.sum("_uq").alias("_u"), F.sum("_iq").alias("_i")
        )

    spark = df.sparkSession
    cur_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(min(int(cur_parts), 8))
    )
    try:
        out = _newton_loop(betas, eval_pass, groups, n_steps)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", cur_parts)
    return _cox_finish(out, groups)


def _cox_finish(out: DataFrame, groups) -> DataFrame:
    """Shared inference tail over (groups…, n, n_events, beta, _u, _i) —
    identical for both engines (se/z/p/hazard_ratio stay relational, the
    same double tree the DuckDB twin renders)."""
    i_f = F.col("_i").cast("double") / F.lit(1.0e9)
    ok = F.col("_i") > 0
    se = F.lit(1.0) / F.sqrt(i_f)
    z = F.col("beta") / se
    p = two_sided_p_expr(z)
    hr = F.floor(F.exp(F.col("beta")) * F.lit(1.0e9) + F.lit(0.5)) / F.lit(
        1.0e9
    )
    return out.select(
        *groups,
        "n",
        "n_events",
        F.when(ok, F.col("beta")).alias("beta"),
        F.when(ok, se).alias("se"),
        F.when(ok, z).alias("z_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, hr).alias("hazard_ratio"),
    )


def _cox_newton_np(cells: DataFrame, groups, n_steps: int, mx: int):
    """All Newton rounds as ONE grouped Arrow pass over the cells frame
    (columns: groups…, _t, _xq, _cnt, _d) — the exact integer/double
    recurrence of the relational eval_pass/_newton_loop chain, per group:

    per round at the current β: e = exp(β·x) once per DISTINCT cell
    covariate (scalar libm — the q9 grid absorbs the last ulp, the libm
    rule), q9-quantized moments multiplied by exact integer counts,
    risk-set sums as exact int64 suffix cumsums over the ascending
    event-time grid, the identical u/i IEEE double tree re-quantized at
    1e-9, and β ← β + (U/1e9)/(I/1e9) iff I > 0.  Envelope guards raise
    a loud ValueError exactly where the relational chain's ANSI int64
    sums would raise.  Emits (groups…, n, n_events, beta, _u, _i) — one
    row per group; _u/_i NULL when no event time exists (the relational
    left-join's NULL)."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [StructField(c, cells.schema[c].dataType) for c in groups]
        + [
            StructField("n", LongType()),
            StructField("n_events", LongType()),
            StructField("beta", DoubleType()),
            StructField("_u", LongType()),
            StructField("_i", LongType()),
        ]
    )
    fmx = float(mx)
    I63 = 2**63

    def newton(pdf: pd.DataFrame) -> pd.DataFrame:
        xq = pdf["_xq"].to_numpy(np.int64)
        tt = pdf["_t"].to_numpy(np.int64)
        cnt = pdf["_cnt"].to_numpy(np.int64)
        dd = pdf["_d"].to_numpy(np.int64)
        n = int(cnt.sum(dtype=object))
        n_ev = int(dd.sum(dtype=object))
        ux, inv = np.unique(xq, return_inverse=True)
        xfu = ux.astype(np.float64) / fmx  # same IEEE cast-divide
        ut, tinv = np.unique(tt, return_inverse=True)  # ascending _t grid
        nt = ut.size
        # β-independent per-t sums (exact: |xq·d| ≤ 1e8·n, |Σ| < 2^63
        # for any realistic mass; guard anyway)
        if len(xq) and max(abs(int(xq.max())), abs(int(xq.min()))) * max(
            n, 1
        ) >= I63:
            raise ValueError("cox_ph arrow kernel: xq·d mass exceeds int64")
        w_dt = np.zeros(nt, np.int64)
        np.add.at(w_dt, tinv, dd)
        w_sx = np.zeros(nt, np.int64)
        np.add.at(w_sx, tinv, xq * dd)
        evt = w_dt > 0
        dtf = w_dt[evt].astype(np.float64)
        sxf = w_sx[evt].astype(np.float64)

        def eval_ui(beta: float):
            # exp once per DISTINCT covariate cell, scalar libm
            e_u = np.array([math.exp(v) for v in (beta * xfu)], np.float64)
            exfu = e_u * xfu
            q0u = np.floor(e_u * 1.0e9 + 0.5)
            q1u = np.floor(exfu * 1.0e9 + 0.5)
            q2u = np.floor(exfu * xfu * 1.0e9 + 0.5)
            qmax = max(
                float(np.abs(q0u).max()),
                float(np.abs(q1u).max()),
                float(np.abs(q2u).max()),
            )
            if not math.isfinite(qmax) or qmax * max(n, 1) >= I63:
                # the relational chain's ANSI int64 sums raise here too
                raise ValueError(
                    "cox_ph arrow kernel: q9(exp) mass exceeds the int64 "
                    "envelope (DECIMAL swap needed — see module docstring)"
                )
            w0 = np.zeros(nt, np.int64)
            np.add.at(w0, tinv, q0u.astype(np.int64)[inv] * cnt)
            w1 = np.zeros(nt, np.int64)
            np.add.at(w1, tinv, q1u.astype(np.int64)[inv] * cnt)
            w2 = np.zeros(nt, np.int64)
            np.add.at(w2, tinv, q2u.astype(np.int64)[inv] * cnt)
            # exact int64 suffix sums over the ascending _t grid — the
            # same integers as SUM OVER (all) − SUM OVER (preceding)
            s0 = np.cumsum(w0[::-1])[::-1][evt].astype(np.float64)
            s1 = np.cumsum(w1[::-1])[::-1][evt].astype(np.float64)
            s2 = np.cumsum(w2[::-1])[::-1][evt].astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                r1 = s1 / s0
                u_t = sxf / fmx - dtf * r1
                i_t = dtf * (s2 / s0 - r1 * r1)
            # ADVICE r14: if every q9(exp) in a suffix risk set quantizes
            # to 0 (β·x < ~-21), s0 = 0 makes u_t/i_t NaN or Inf; the
            # envelope compare below is False for NaN, so without this
            # check the int64 cast would silently produce INT64_MIN
            # garbage.  Raise loudly — the relational chain's ANSI
            # double→long cast raises on non-finite values here too.
            if not (np.isfinite(u_t).all() and np.isfinite(i_t).all()):
                raise ValueError(
                    "cox_ph arrow kernel: zero risk-set mass (q9(exp) "
                    "underflow) made u/i non-finite"
                )
            uq = np.floor(u_t * 1.0e9 + 0.5)
            iq = np.floor(i_t * 1.0e9 + 0.5)
            if uq.size and (
                float(np.abs(uq).max()) * uq.size >= I63
                or float(np.abs(iq).max()) * iq.size >= I63
            ):
                raise ValueError(
                    "cox_ph arrow kernel: u/i reduce exceeds int64"
                )
            return (
                int(uq.astype(np.int64).sum()),
                int(iq.astype(np.int64).sum()),
            )

        beta = 0.0
        if not evt.any():
            u_f = i_f = None  # relational left join: no contrib rows
        else:
            for _ in range(n_steps):
                u, i = eval_ui(beta)
                if i > 0:
                    # the identical two-division double tree
                    beta = beta + (float(u) / 1.0e9) / (float(i) / 1.0e9)
            u_f, i_f = eval_ui(beta)
        keys = pdf.iloc[0][list(groups)]
        return pd.DataFrame(
            {
                **{c: [keys[c]] for c in groups},
                "n": [n],
                "n_events": [n_ev],
                "beta": [beta],
                "_u": pd.Series([u_f], dtype="object"),
                "_i": pd.Series([i_f], dtype="object"),
            }
        )

    return cells.groupBy(*groups).applyInPandas(newton, schema)


def _newton_loop(betas, eval_pass, groups, n_steps):
    """Unrolled Newton steps + the final information evaluation, every
    stage eagerly checkpointed group-sized so (a) lineage stays flat
    and (b) all loop exchanges execute under the narrowed shuffle
    width scoped by the caller (a lazily-returned stats frame would
    run after the restore and miss it — the pagerank last-round
    rule)."""
    for _ in range(n_steps):
        ui = eval_pass(betas)
        betas = betas.join(ui, on=groups, how="left").select(
            *groups,
            "n",
            "n_events",
            F.when(
                F.col("_i") > 0,
                F.col("beta")
                + (F.col("_u").cast("double") / F.lit(1.0e9))
                / (F.col("_i").cast("double") / F.lit(1.0e9)),
            )
            .otherwise(F.col("beta"))
            .alias("beta"),
        )
        # truncate lineage between Newton steps: without this the
        # final plan nests n_steps levels of window+join trees and
        # Catalyst re-optimizes the whole stack at every reference;
        # the β frame is group-sized — one tiny eager executor-local
        # materialization per step (values are deterministic doubles,
        # unchanged by materialization).  Measured 7.4 → 4.2 s alone,
        # → ~3.4 s with the narrowed loop width.
        # Deliberately NOT the round-13 parquet tier: the payload is a
        # handful of rows per step, so a per-step parquet round-trip
        # costs far more than it protects (a lost executor re-runs the
        # whole op; acceptable for a seconds-long group-sized loop).
        betas = betas.coalesce(1).localCheckpoint(eager=True)

    fin = eval_pass(betas)
    return (
        betas.join(fin, on=groups, how="left")
        .coalesce(1)
        .localCheckpoint(eager=True)
    )


def cox_ph_sql(
    data_sql: str,
    time_col: str,
    event_col: str,
    x_col: str,
    group_columns,
    n_steps: int = 3,
    scale_x: int = 6,
) -> str:
    """DuckDB twin of :func:`cox_ph` — the identical unrolled Newton
    chain as MATERIALIZED CTE stages (the kmeans re-expansion rule)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    mx = 10**scale_x
    mxd = dlit(float(mx))
    xqs = (
        f"CAST(FLOOR(CAST({x_col} AS DOUBLE) * {mxd} + 0.5) AS BIGINT)"
    )
    q9 = lambda c: f"CAST(FLOOR(({c}) * 1e9 + 0.5) AS BIGINT)"  # noqa: E731
    xf = f"(CAST(_xq AS DOUBLE) / {mxd})"
    parts = [
        f"""
cells AS MATERIALIZED (
  SELECT {gsel}, CAST({time_col} AS BIGINT) AS _t, {xqs} AS _xq,
    COUNT(*) AS _cnt, CAST(SUM(CAST({event_col} AS INT)) AS BIGINT) AS _d
  FROM ({data_sql})
  WHERE {time_col} IS NOT NULL AND {event_col} IS NOT NULL
    AND {x_col} IS NOT NULL
  GROUP BY {gsel}, CAST({time_col} AS BIGINT), {xqs}
),
b0 AS (
  SELECT {gsel}, CAST(SUM(_cnt) AS BIGINT) AS n,
    CAST(SUM(_d) AS BIGINT) AS n_events, 0e0 AS beta
  FROM cells GROUP BY {gsel}
)"""
    ]

    def eval_sql(k: int, bprev: str) -> str:
        e = f"EXP(beta * {xf})"
        over_all = f"(PARTITION BY {gsel})"
        over_pre = (
            f"(PARTITION BY {gsel} ORDER BY _t"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
        )
        s0 = "CAST(_s0 AS DOUBLE)"
        s1 = "CAST(_s1 AS DOUBLE)"
        s2 = "CAST(_s2 AS DOUBLE)"
        dt = "CAST(_dt AS DOUBLE)"
        r1 = f"({s1} / {s0})"
        u_t = f"(CAST(_sx AS DOUBLE) / {mxd} - {dt} * {r1})"
        i_t = f"({dt} * ({s2} / {s0} - {r1} * {r1}))"
        return f"""
w{k} AS (
  SELECT {gsel}, _t, _d,
    {q9(e)} * _cnt AS _q0,
    {q9(f"{e} * {xf}")} * _cnt AS _q1,
    {q9(f"{e} * {xf} * {xf}")} * _cnt AS _q2,
    _xq * _d AS _sxq
  FROM cells JOIN {bprev} USING ({gsel})
),
t{k} AS (
  SELECT {gsel}, _t,
    CAST(SUM(_q0) AS BIGINT) AS _w0, CAST(SUM(_q1) AS BIGINT) AS _w1,
    CAST(SUM(_q2) AS BIGINT) AS _w2, CAST(SUM(_d) AS BIGINT) AS _dt,
    CAST(SUM(_sxq) AS BIGINT) AS _sx
  FROM w{k} GROUP BY {gsel}, _t
),
s{k} AS (
  SELECT {gsel}, _t, _dt, _sx,
    CAST(SUM(_w0) OVER {over_all} AS BIGINT)
      - COALESCE(CAST(SUM(_w0) OVER {over_pre} AS BIGINT), 0) AS _s0,
    CAST(SUM(_w1) OVER {over_all} AS BIGINT)
      - COALESCE(CAST(SUM(_w1) OVER {over_pre} AS BIGINT), 0) AS _s1,
    CAST(SUM(_w2) OVER {over_all} AS BIGINT)
      - COALESCE(CAST(SUM(_w2) OVER {over_pre} AS BIGINT), 0) AS _s2
  FROM t{k}
),
ui{k} AS (
  SELECT {gsel},
    CAST(SUM({q9(u_t)}) AS BIGINT) AS _u,
    CAST(SUM({q9(i_t)}) AS BIGINT) AS _i
  FROM s{k} WHERE _dt > 0 GROUP BY {gsel}
)"""

    bprev = "b0"
    for k in range(1, n_steps + 1):
        parts.append(eval_sql(k, bprev))
        parts.append(
            f"""
b{k} AS MATERIALIZED (
  SELECT b.{gsel.replace(', ', ', b.')}, b.n, b.n_events,
    CASE WHEN ui{k}._i > 0 THEN
      b.beta + (CAST(ui{k}._u AS DOUBLE) / 1e9)
             / (CAST(ui{k}._i AS DOUBLE) / 1e9)
    ELSE b.beta END AS beta
  FROM {bprev} b LEFT JOIN ui{k} USING ({gsel})
)"""
        )
        bprev = f"b{k}"
    kf = n_steps + 1
    parts.append(eval_sql(kf, bprev))
    i_f = "(CAST(_i AS DOUBLE) / 1e9)"
    se = f"(1.0 / SQRT({i_f}))"
    z = f"(beta / {se})"
    p = two_sided_p_sql(z)
    hr = "(FLOOR(EXP(beta) * 1e9 + 0.5) / 1e9)"
    body = f"""
SELECT {gsel}, n, n_events,
  CASE WHEN _i > 0 THEN beta END AS beta,
  CASE WHEN _i > 0 THEN {se} END AS se,
  CASE WHEN _i > 0 THEN {z} END AS z_stat,
  CASE WHEN _i > 0 THEN {p} END AS p_value,
  CASE WHEN _i > 0 THEN {hr} END AS hazard_ratio
FROM {bprev} LEFT JOIN ui{kf} USING ({gsel})
"""
    return "WITH " + ",".join(parts) + body
