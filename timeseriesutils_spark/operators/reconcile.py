"""Hierarchical forecast reconciliation (Hyndman, Ahmed, Athanasopoulos
& Shang 2011): make per-node base forecasts COHERENT across a
two-level aggregation hierarchy (bottom → group → total), the standard
post-processing for hub-style hierarchical forecasting — the
reference's own domain is location-hierarchical (reichlab hub data:
``/root/reference/docs/demo_data.csv`` is 51 states rolling up to US),
and the catalog has every forecaster and scorer but had no coherence
layer before this.

Four reconciliation methods, all emitted:

  * **bottom-up** — ỹ_bottom = ŷ_bottom, aggregates re-summed from the
    bottom (P = [0 | I]).  Coherent by construction, ignores the
    aggregate-level forecasts.
  * **OLS (MinT with W = I)** — the orthogonal projection of the FULL
    base-forecast vector onto the coherent subspace,
    ỹ = S(SᵀS)⁻¹Sᵀŷ.  For the two-level hierarchy the inverse has a
    CLOSED FORM via block Sherman–Morrison: with A = I + Σ_r J_r
    (block all-ones per group) and SᵀS = A + 𝟙𝟙ᵀ,

        A⁻¹x |_i            = x_i − (Σ_{j∈r(i)} x_j)/(1 + m_r)
        (SᵀS)⁻¹x            = A⁻¹x − u·(uᵀx)/(1 + c),
        u_i = 1/(1 + m_{r(i)}),   c = Σ_r m_r/(1 + m_r)

    so the whole projection is per-group aggregates + broadcasts —
    exact-sufficient-stats shaped, no matrix library, no driver-side
    linear algebra.
  * **structural WLS MinT** (Wickramasuriya, Athanasopoulos &
    Hyndman 2019, W = diag(S·𝟙) — variance proportional to the number
    of bottom series each node aggregates): the same Sherman–Morrison
    machinery with level weights (m, m_r, 1); the algebra collapses
    further (A⁻¹𝟙 = ½·𝟙), and every cross-group aggregate has an
    ANALYTIC integer closed form, so no double summation crosses a
    group boundary.
  * **top-down** (Gross & Sohl 1990, historical proportions) —
    ỹ_bottom_i = p_i · ŷ_total with p_i the node's share of window
    revenue; coherent by construction, uses ONLY the total-level
    forecast (the classic choice when bottom series are too noisy to
    forecast individually).

Base forecasts here are per-node MEDIANS of the last ``window_days``
daily totals (two-middle ROW_NUMBER median, the house deterministic
idiom).  Medians are deliberately NONLINEAR: a linear base forecaster
(mean/drift on a shared grid) is already coherent and reconciliation
would be a no-op; the median hierarchy genuinely disagrees across
levels, which is the realistic input.

Exactness: daily totals are exact integer cent sums; medians are
two-middle integer sums (med2 = 2·median); the two float-order-fragile
scalars are pre-quantized with INTEGER division so both engines sum
identical integers —

    c_q  = Σ_r (m_r · 10¹²) div (1 + m_r)
    uv_q = Σ_r (sv_r · 10⁶) div (1 + m_r)   (DECIMAL operands)

— and β is ONE shared double tree over string-cast exact integers,
floor-quantized at 1e-6 cents before the coherent re-aggregation, so
group/total sums add INTEGERS (aggregation-order free).

Scale shape: one scan → per-(node, day) integer aggregation (map-
combinable), per-node median windows over day-count-sized frames, one
group-level aggregate (dimension-sized) broadcast back, one shared
double tree.  Nothing pairwise; the hierarchy frames are dimension-
sized at any data volume.

Returns one row per node: (level, node, base, reconciled_bu,
reconciled_ols, reconciled_td, reconciled_wls); level ∈ ('bottom',
'group', 'total'), node is the key string ('ALL' for the total row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_CQ = 10**12  # c-term integer-division grid
_UVQ = 10**6  # u'v-term integer-division grid
_BQ = 10**6  # reconciled-beta quantization grid (cents * 1e-6)


def reconcile_forecasts(
    df: DataFrame,
    value_col: str,
    date_col: str,
    bottom_col: str,
    group_col: str,
    window_days: int = 28,
    scale: int = 2,
) -> DataFrame:
    """Two-level hierarchical reconciliation (module doc): bottom
    nodes ``bottom_col`` inside groups ``group_col``, daily totals of
    ``value_col``, per-node median base forecasts over the trailing
    ``window_days``; bottom-up + closed-form OLS + structural-WLS
    MinT + historical-share top-down reconciliations."""
    m = 10 ** int(scale)
    W = int(window_days)
    if W < 1:
        raise ValueError("window_days must be >= 1")
    vq = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(
        F.col(value_col).isNotNull()
        & F.col(bottom_col).isNotNull()
        & F.col(group_col).isNotNull()
    ).select(
        F.col(bottom_col).cast("string").alias("_b"),
        F.col(group_col).cast("string").alias("_g"),
        F.to_date(F.col(date_col)).alias("_day"),
        vq.alias("_vq"),
    )
    maxd = d.groupBy().agg(F.max("_day").alias("_maxd"))
    daily = (
        d.crossJoin(F.broadcast(maxd))
        .filter(F.col("_day") > F.date_sub(F.col("_maxd"), W))
        .groupBy("_b", "_g", "_day")
        .agg(F.sum("_vq").alias("_dv"))
    )
    from timeseriesutils_spark.functions.cache import pin

    daily = pin(daily)  # feeds all three level medians

    def med2(frame: DataFrame, keys: list) -> DataFrame:
        """Two-middle median sum (2x median) of _dv per key set."""
        wr = Window.partitionBy(*keys).orderBy("_dv", "_day")
        wn = Window.partitionBy(*keys)
        r = frame.select(
            *keys, "_dv", "_day",
            F.row_number().over(wr).alias("_rn"),
            F.count(F.lit(1)).over(wn).alias("_n"),
        )
        m1 = F.floor((F.col("_n") + 1) / 2).cast("bigint")
        m2 = F.floor((F.col("_n") + 2) / 2).cast("bigint")
        mult = (F.col("_rn") == m1).cast("bigint") + (
            F.col("_rn") == m2
        ).cast("bigint")
        return r.groupBy(*keys).agg(F.sum(F.col("_dv") * mult).alias("_med2"))

    bot = med2(daily, ["_b", "_g"])  # bottom base (2x median, cents)
    grp = med2(
        daily.groupBy("_g", "_day").agg(F.sum("_dv").alias("_dv")), ["_g"]
    ).withColumnRenamed("_med2", "_gmed2")
    tot = med2(
        daily.groupBy("_day").agg(F.sum("_dv").alias("_dv")), []
    ).withColumnRenamed("_med2", "_tmed2")

    # historical per-node revenue shares for the top-down method
    hists = daily.groupBy("_b", "_g").agg(F.sum("_dv").alias("_hs"))
    htot = daily.groupBy().agg(F.sum("_dv").alias("_ht"))
    # v = S'yhat per bottom node: own base + its group's base + total's
    v = (
        bot.join(F.broadcast(grp), "_g")
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(hists), ["_b", "_g"])
        .crossJoin(F.broadcast(htot))
        .select(
            "_b", "_g", "_med2", "_gmed2", "_tmed2", "_hs", "_ht",
            (F.col("_med2") + F.col("_gmed2") + F.col("_tmed2")).alias("_v"),
        )
    )
    v = pin(v)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731
    # per-group sufficient stats: m_r, sv_r (exact ints)
    gstats = v.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum("_v").alias("_sv"),
        F.sum("_med2").alias("_svm"),
        F.max("_gmed2").alias("_gm2"),
    )
    # float-order-fragile scalars pre-quantized with INTEGER division
    # (module doc): both engines then sum identical integers
    consts = gstats.groupBy().agg(
        F.sum(
            F.expr(f"(_m * CAST({_CQ} AS BIGINT)) div (1 + _m)")
        ).alias("_cq"),
        F.sum(
            F.expr(
                f"(CAST(_sv AS DECIMAL(38,0)) * {_UVQ}) div (1 + _m)"
            )
        ).alias("_uvq"),
        F.sum("_m").alias("_mt"),
        F.sum("_svm").alias("_tm"),
        F.sum("_gm2").alias("_gm"),
    )
    j = v.join(F.broadcast(gstats), "_g").crossJoin(F.broadcast(consts))
    c_ = s2d(F.col("_cq")) / F.lit(float(_CQ))
    uv = s2d(F.col("_uvq")) / F.lit(float(_UVQ))
    mr = F.col("_m").cast("double")
    # beta_i = (v_i - sv_r/(1+m_r)) - (uv/(1+c))/(1+m_r)   [cents]
    beta = (
        s2d(F.col("_v")) - s2d(F.col("_sv")) / (F.lit(1.0) + mr)
    ) - (uv / (F.lit(1.0) + c_)) / (F.lit(1.0) + mr)
    # structural-WLS MinT (Wickramasuriya et al. 2019, W = diag(S·1)):
    # with level weights (mtot, m_r, 1), A = I + Σ(1/m_r)J_r gives
    # A⁻¹𝟙 = ½·𝟙 exactly, so the Sherman–Morrison projection collapses
    # to  β_i = (v'_i − Σ_r v'/(2m_r)) − Σv'/(6·mtot)  with
    # v'_i = ŷ_b + ŷ_r/m_r + ŷ_tot/mtot.  Every aggregate below is an
    # ANALYTIC closed form over exact integers (no cross-group double
    # summation): Σ_r v' = Σ_r med2 + gmed2 + m_r·tmed2/mtot and
    # Σv' = Σmed2 + Σgmed2 + tmed2.
    mt = F.col("_mt").cast("double")
    vp = (
        s2d(F.col("_med2"))
        + s2d(F.col("_gmed2")) / mr
        + s2d(F.col("_tmed2")) / mt
    )
    svp = (
        s2d(F.col("_svm"))
        + s2d(F.col("_gmed2"))
        + mr * s2d(F.col("_tmed2")) / mt
    )
    sv_all = s2d(F.col("_tm")) + s2d(F.col("_gm")) + s2d(F.col("_tmed2"))
    wls = (vp - svp / (F.lit(2.0) * mr)) - sv_all / (F.lit(6.0) * mt)
    # top-down (Gross–Sohl historical proportions): disaggregate the
    # TOTAL base by each bottom's share of window revenue
    td = F.when(
        F.col("_ht") > 0,
        s2d(F.col("_tmed2")) * (s2d(F.col("_hs")) / s2d(F.col("_ht"))),
    )
    # quantize beta/td to integers BEFORE the coherent re-aggregation
    # so group/total sums add exact integers (aggregation-order free)
    bq = F.floor(beta * F.lit(_BQ) + F.lit(0.5)).cast("decimal(38,0)")
    tdq = F.floor(td * F.lit(_BQ) + F.lit(0.5)).cast("decimal(38,0)")
    wq = F.floor(wls * F.lit(_BQ) + F.lit(0.5)).cast("decimal(38,0)")
    bb = j.select(
        "_b", "_g", F.col("_med2").alias("_base2"), bq.alias("_bq"),
        tdq.alias("_tdq"), wq.alias("_wq"),
    )
    bb = pin(bb)  # feeds bottom rows + the re-aggregations

    den_base = float(2 * m)  # med2 -> value units
    den_ols = float(_BQ * 2 * m)  # bq is in med2 units (2x cents)
    bottom_rows = bb.select(
        F.lit("bottom").alias("level"),
        F.col("_b").alias("node"),
        (F.col("_base2").cast("double") / F.lit(den_base)).alias("base"),
        (F.col("_base2").cast("double") / F.lit(den_base)).alias(
            "reconciled_bu"
        ),
        (s2d(F.col("_bq")) / F.lit(den_ols)).alias("reconciled_ols"),
        (s2d(F.col("_tdq")) / F.lit(den_ols)).alias("reconciled_td"),
        (s2d(F.col("_wq")) / F.lit(den_ols)).alias("reconciled_wls"),
    )
    gagg = bb.groupBy("_g").agg(
        F.sum("_base2").alias("_sb2"), F.sum("_bq").alias("_sbq"),
        F.sum("_tdq").alias("_stq"), F.sum("_wq").alias("_swq"),
    )
    group_rows = gagg.join(grp, "_g").select(
        F.lit("group").alias("level"),
        F.col("_g").alias("node"),
        (F.col("_gmed2").cast("double") / F.lit(den_base)).alias("base"),
        (F.col("_sb2").cast("double") / F.lit(den_base)).alias(
            "reconciled_bu"
        ),
        (s2d(F.col("_sbq")) / F.lit(den_ols)).alias("reconciled_ols"),
        (s2d(F.col("_stq")) / F.lit(den_ols)).alias("reconciled_td"),
        (s2d(F.col("_swq")) / F.lit(den_ols)).alias("reconciled_wls"),
    )
    tagg = bb.groupBy().agg(
        F.sum("_base2").alias("_sb2"), F.sum("_bq").alias("_sbq"),
        F.sum("_tdq").alias("_stq"), F.sum("_wq").alias("_swq"),
    )
    total_rows = tagg.crossJoin(F.broadcast(tot)).select(
        F.lit("total").alias("level"),
        F.lit("ALL").alias("node"),
        (F.col("_tmed2").cast("double") / F.lit(den_base)).alias("base"),
        (F.col("_sb2").cast("double") / F.lit(den_base)).alias(
            "reconciled_bu"
        ),
        (s2d(F.col("_sbq")) / F.lit(den_ols)).alias("reconciled_ols"),
        (s2d(F.col("_stq")) / F.lit(den_ols)).alias("reconciled_td"),
        (s2d(F.col("_swq")) / F.lit(den_ols)).alias("reconciled_wls"),
    )
    return bottom_rows.unionByName(group_rows).unionByName(total_rows)


def reconcile_forecasts_sql(
    data_sql: str,
    value_col: str,
    date_col: str,
    bottom_col: str,
    group_col: str,
    window_days: int = 28,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`reconcile_forecasts` (same two-middle
    medians, same integer-division pre-quantized scalars, same shared
    double tree, same quantize-then-sum coherence)."""
    from timeseriesutils_spark.functions.exact import dlit

    m = 10 ** int(scale)
    W = int(window_days)
    s2d = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731
    den_base = dlit(float(2 * m))
    den_ols = dlit(float(_BQ * 2 * m))
    med_sql = (
        "SUM(_dv * (CASE WHEN _rn = (_n + 1) // 2 THEN 1 ELSE 0 END"
        " + CASE WHEN _rn = (_n + 2) // 2 THEN 1 ELSE 0 END))"
    )
    c_ = f"({s2d('_cq')} / {dlit(float(_CQ))})"
    uv = f"({s2d('_uvq')} / {dlit(float(_UVQ))})"
    mr = "CAST(_m AS DOUBLE)"
    beta = (
        f"(({s2d('_v')} - {s2d('_sv')} / (1.0 + {mr}))"
        f" - ({uv} / (1.0 + {c_})) / (1.0 + {mr}))"
    )
    td = (
        f"(CASE WHEN _ht > 0 THEN {s2d('_tmed2')}"
        f" * ({s2d('_hs')} / {s2d('_ht')}) END)"
    )
    mt = "CAST(_mt AS DOUBLE)"
    vp = (
        f"({s2d('_med2')} + {s2d('_gmed2')} / {mr}"
        f" + {s2d('_tmed2')} / {mt})"
    )
    svp = (
        f"({s2d('_svm')} + {s2d('_gmed2')}"
        f" + {mr} * {s2d('_tmed2')} / {mt})"
    )
    sv_all = f"({s2d('_tm')} + {s2d('_gm')} + {s2d('_tmed2')})"
    wls = (
        f"(({vp} - {svp} / (2.0 * {mr}))"
        f" - {sv_all} / (6.0 * {mt}))"
    )
    return f"""
WITH d AS (
  SELECT CAST({bottom_col} AS VARCHAR) AS _b,
    CAST({group_col} AS VARCHAR) AS _g,
    CAST({date_col} AS DATE) AS _day,
    CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT) AS _vq
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL AND {bottom_col} IS NOT NULL
    AND {group_col} IS NOT NULL
),
daily AS MATERIALIZED (
  SELECT _b, _g, _day, CAST(SUM(_vq) AS BIGINT) AS _dv
  FROM d
  WHERE _day > (SELECT MAX(_day) - {W} FROM d)
  GROUP BY _b, _g, _day
),
br AS (
  SELECT _b, _g, _dv,
    ROW_NUMBER() OVER (PARTITION BY _b, _g ORDER BY _dv, _day) AS _rn,
    COUNT(*) OVER (PARTITION BY _b, _g) AS _n
  FROM daily
),
bot AS (SELECT _b, _g, {med_sql} AS _med2 FROM br GROUP BY _b, _g),
gd AS (
  SELECT _g, _day, CAST(SUM(_dv) AS BIGINT) AS _dv
  FROM daily GROUP BY _g, _day
),
gr AS (
  SELECT _g, _dv,
    ROW_NUMBER() OVER (PARTITION BY _g ORDER BY _dv, _day) AS _rn,
    COUNT(*) OVER (PARTITION BY _g) AS _n
  FROM gd
),
grp AS (SELECT _g, {med_sql} AS _gmed2 FROM gr GROUP BY _g),
td AS (
  SELECT _day, CAST(SUM(_dv) AS BIGINT) AS _dv FROM daily GROUP BY _day
),
tr AS (
  SELECT _dv, ROW_NUMBER() OVER (ORDER BY _dv, _day) AS _rn,
    COUNT(*) OVER () AS _n
  FROM td
),
tot AS (SELECT {med_sql} AS _tmed2 FROM tr),
hists AS (
  SELECT _b, _g, CAST(SUM(_dv) AS BIGINT) AS _hs FROM daily GROUP BY _b, _g
),
htot AS (SELECT CAST(SUM(_dv) AS BIGINT) AS _ht FROM daily),
v AS MATERIALIZED (
  SELECT bot._b, bot._g, bot._med2, grp._gmed2, tot._tmed2,
    hists._hs, htot._ht,
    bot._med2 + grp._gmed2 + tot._tmed2 AS _v
  FROM bot JOIN grp USING (_g) CROSS JOIN tot
  JOIN hists USING (_b, _g) CROSS JOIN htot
),
gstats AS (
  SELECT _g, CAST(COUNT(*) AS BIGINT) AS _m, CAST(SUM(_v) AS BIGINT) AS _sv,
    CAST(SUM(_med2) AS BIGINT) AS _svm, CAST(MAX(_gmed2) AS BIGINT) AS _gm2
  FROM v GROUP BY _g
),
consts AS (
  SELECT CAST(SUM((_m * CAST({_CQ} AS BIGINT)) // (1 + _m)) AS BIGINT)
      AS _cq,
    CAST(SUM((CAST(_sv AS HUGEINT) * {_UVQ}) // (1 + _m)) AS HUGEINT)
      AS _uvq,
    CAST(SUM(_m) AS BIGINT) AS _mt,
    CAST(SUM(_svm) AS BIGINT) AS _tm,
    CAST(SUM(_gm2) AS BIGINT) AS _gm
  FROM gstats
),
bb AS MATERIALIZED (
  SELECT v._b, v._g, v._med2 AS _base2,
    CAST(FLOOR({beta} * {dlit(float(_BQ))} + 0.5) AS HUGEINT) AS _bq,
    CAST(FLOOR({td} * {dlit(float(_BQ))} + 0.5) AS HUGEINT) AS _tdq,
    CAST(FLOOR({wls} * {dlit(float(_BQ))} + 0.5) AS HUGEINT) AS _wq
  FROM v JOIN gstats USING (_g) CROSS JOIN consts
)
SELECT 'bottom' AS level, _b AS node,
  CAST(_base2 AS DOUBLE) / {den_base} AS base,
  CAST(_base2 AS DOUBLE) / {den_base} AS reconciled_bu,
  {s2d('_bq')} / {den_ols} AS reconciled_ols,
  {s2d('_tdq')} / {den_ols} AS reconciled_td,
  {s2d('_wq')} / {den_ols} AS reconciled_wls
FROM bb
UNION ALL
SELECT 'group', g._g,
  CAST(g2._gmed2 AS DOUBLE) / {den_base},
  CAST(g._sb2 AS DOUBLE) / {den_base},
  {s2d('g._sbq')} / {den_ols},
  {s2d('g._stq')} / {den_ols},
  {s2d('g._swq')} / {den_ols}
FROM (
  SELECT _g, CAST(SUM(_base2) AS BIGINT) AS _sb2, SUM(_bq) AS _sbq,
    SUM(_tdq) AS _stq, SUM(_wq) AS _swq
  FROM bb GROUP BY _g
) g JOIN grp g2 USING (_g)
UNION ALL
SELECT 'total', 'ALL',
  CAST(tot._tmed2 AS DOUBLE) / {den_base},
  CAST(t._sb2 AS DOUBLE) / {den_base},
  {s2d('t._sbq')} / {den_ols},
  {s2d('t._stq')} / {den_ols},
  {s2d('t._swq')} / {den_ols}
FROM (
  SELECT CAST(SUM(_base2) AS BIGINT) AS _sb2, SUM(_bq) AS _sbq,
    SUM(_tdq) AS _stq, SUM(_wq) AS _swq FROM bb
) t CROSS JOIN tot
"""
