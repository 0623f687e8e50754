"""Epidemiological-forecasting operators — the domain family the
reference serves (reichlab: case-count series, forecast targets,
evaluation; SURVEY §1).  The reference's featurize surface produces
model *inputs*; these operators cover the surrounding workflow a
forecast-hub user runs on the same tables: a renewal-equation
reproduction-number estimate, a reporting-delay (chain-ladder) nowcast,
and proper-scoring-rule evaluation of quantile forecasts.

Scale/exactness discipline (the repo standard): counts stay exact
int64/DECIMAL through every aggregation; doubles appear only in final
fixed-shape expression trees mirrored verbatim by the DuckDB twins; all
aggregations are map-combinable single exchanges; the only window
functions are per-group LAG/arrays bounded by the series length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.cache import pin
from timeseriesutils_spark.functions.exact import dlit
from timeseriesutils_spark.operators.window_features import _as_list

__all__ = [
    "renewal_rt",
    "renewal_rt_sql",
    "nowcast_triangle",
    "nowcast_triangle_sql",
    "pinball_scores",
    "pinball_scores_sql",
    "wis_scores",
    "wis_scores_sql",
    "excess_incidence",
    "excess_incidence_sql",
    "crps_sample",
    "crps_sample_sql",
    "pit_histogram",
    "pit_histogram_sql",
    "wallinga_teunis",
    "wallinga_teunis_sql",
]


# --------------------------------------------------------------------------
# renewal-equation Rt
# --------------------------------------------------------------------------


def renewal_rt(
    counts: DataFrame,
    count_col: str,
    day_col: str,
    group_columns,
    weights: tuple[int, ...] = (1, 2, 3, 2, 1),
    min_count: int = 1,
) -> DataFrame:
    """Instantaneous reproduction number via the renewal equation:

        R_t = n_t / Σ_s w_s · n_{t−s},   w = weights / Σ weights

    with an integer-quantized serial-interval kernel ``weights`` (the
    discretized generation-interval pmf; integers keep the force of
    infection Λ_t exact).  The day grid is densified per group from its
    first to last observed day with zero counts in the gaps — the epi
    convention (no report = no cases), and required for the lag kernel
    to mean "s days ago" rather than "s records ago".

    R_t is NULL until a full kernel of history exists, and when the
    force of infection is zero (0/0 days at a series tail).
    ``min_count`` additionally suppresses estimates on days with fewer
    observed cases than the floor (low-count Rt is noise).

    Scale shape: one groupBy for the spine bounds, one (group)-keyed
    left join onto the generated grid (co-partitioned — both sides hash
    on the group), one window pass for the lags.  Σw·lag is a fixed
    linear combination — codegen-resident, no shuffle beyond the one
    exchange the window needs.

    Returns (groups…, day, n, force_q, rt): ``force_q`` = Σ w_s·n_{t−s}
    exact int64; ``rt`` = (n·Σw)/force_q as double.
    """
    g = _as_list(group_columns)
    W = [int(x) for x in weights]
    if not W or any(x <= 0 for x in W):
        raise ValueError("weights must be positive integers")
    D = sum(W)
    n = F.col(count_col).cast("bigint")
    d = counts.select(*g, F.col(day_col).alias("_day"), n.alias("_n"))
    spine = (
        d.groupBy(*g)
        .agg(F.min("_day").alias("_lo"), F.max("_day").alias("_hi"))
        .select(*g, F.explode(F.sequence("_lo", "_hi")).alias("_day"))
    )
    filled = spine.join(d, on=[*g, "_day"], how="left").select(
        *g, "_day", F.coalesce("_n", F.lit(0).cast("bigint")).alias("_n")
    )
    w = Window.partitionBy(*g).orderBy("_day")
    force = None
    for s, wt in enumerate(W, start=1):
        term = F.lit(wt).cast("bigint") * F.lag("_n", s).over(w)
        force = term if force is None else force + term
    rt = F.when(
        force.isNotNull() & (force > 0) & (F.col("_n") >= min_count),
        (F.col("_n") * F.lit(D)).cast("double") / force.cast("double"),
    )
    return filled.select(
        *g,
        F.col("_day").alias(day_col),
        F.col("_n").alias(count_col),
        force.alias("force_q"),
        rt.alias("rt"),
    )


def renewal_rt_sql(
    counts_sql: str,
    count_col: str,
    day_col: str,
    group_columns,
    weights: tuple[int, ...] = (1, 2, 3, 2, 1),
    min_count: int = 1,
) -> str:
    """DuckDB twin of :func:`renewal_rt`; ``counts_sql`` is a SELECT
    producing (groups…, day_col, count_col)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    W = [int(x) for x in weights]
    D = sum(W)
    over = f"(PARTITION BY {gsel} ORDER BY _day)"
    force = " + ".join(
        f"CAST({wt} AS BIGINT) * LAG(_n, {s}) OVER {over}"
        for s, wt in enumerate(W, start=1)
    )
    return f"""
WITH src AS (
  SELECT {gsel}, {day_col} AS _day, CAST({count_col} AS BIGINT) AS _n
  FROM ({counts_sql})
),
b AS (SELECT {gsel}, MIN(_day) AS _lo, MAX(_day) AS _hi FROM src GROUP BY {gsel}),
spine AS (SELECT {gsel}, UNNEST(generate_series(_lo, _hi)) AS _day FROM b),
filled AS (
  SELECT s.*, COALESCE(d._n, CAST(0 AS BIGINT)) AS _n
  FROM spine s LEFT JOIN src d USING ({gsel}, _day)
),
k AS (SELECT {gsel}, _day, _n, ({force}) AS force_q FROM filled)
SELECT {gsel}, _day AS {day_col}, _n AS {count_col}, force_q,
  CASE WHEN force_q IS NOT NULL AND force_q > 0 AND _n >= {min_count}
       THEN CAST(_n * {D} AS DOUBLE) / CAST(force_q AS DOUBLE) END AS rt
FROM k
"""


# --------------------------------------------------------------------------
# chain-ladder reporting-delay nowcast
# --------------------------------------------------------------------------


def nowcast_triangle(
    events: DataFrame,
    occ_col: str,
    delay_col: str,
    max_delay: int,
) -> DataFrame:
    """Chain-ladder nowcast over a reporting-delay triangle: events
    occur in period ``occ_col`` (integer, e.g. week index) and are
    reported ``delay_col`` periods later (clamped into 0..``max_delay``).
    Recent occurrence periods are right-censored — their late reports
    have not arrived — and the nowcast estimates the eventual total from
    the development pattern of fully-observed history.

    Classic chain-ladder: with the as-of period T = max(occ + delay)
    observed, the triangle's known region is delay ≤ T − occ.  Each
    development factor

        f_d = Σ_occ K[occ, d+1] / Σ_occ K[occ, d]   over occ ≤ T − (d+1)

    is a ratio of two exact int64 sums of cumulative counts (summed
    over exactly the periods that have observed BOTH levels — the
    standard volume-weighted estimator).  The ultimate for a period
    with observed depth d* is K[occ, d*] · Π_{d=d*}^{max_delay−1} f_d;
    ``max_delay`` is small (reporting tails are short), so the products
    unroll as fixed per-depth expression chains, multiplied high-d →
    low-d — one shared tree with the twin, no exp/ln.

    Scale shape: one groupBy over (occ, delay) — map-combinable, output
    bounded by periods × delays — then all remaining algebra happens on
    that tiny frame (one-row factor aggregate broadcast back).  The
    event table is scanned once.

    Returns (occ, observed_depth, reported_q, ultimate, outstanding):
    ``reported_q`` exact int64 cumulative-to-date, ``ultimate`` the
    chain-ladder estimate (double), ``outstanding`` = ultimate −
    reported.
    """
    if max_delay < 1:
        raise ValueError("max_delay must be >= 1")
    occ = F.col(occ_col).cast("bigint")
    delay = F.least(
        F.greatest(F.col(delay_col).cast("bigint"), F.lit(0)), F.lit(max_delay)
    )
    # the triangle (periods × delays rows — tiny) feeds FOUR branches
    # (cutoff, factor pairing twice, latest); without a pin each branch
    # re-runs the fact scan + aggregation (measured 12 parquet scans in
    # the un-pinned plan)
    sparse = pin(
        events.select(occ.alias("_occ"), delay.alias("_d"))
        .groupBy("_occ", "_d")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # as-of period: latest (occ + delay) actually observed
    asof = sparse.agg(F.max(F.col("_occ") + F.col("_d")).alias("_T"))
    # DENSIFY: a delay level with zero events is still an observed cell
    # of the triangle (K[d] = K[d-1]); leaving it out would drop ratio-1
    # contributions from the development factors and understate mature
    # periods' observed depth (caught by the chain-ladder identity
    # property test) — zero-fill d = 0..max_delay per period
    spine = sparse.select("_occ").distinct().select(
        "_occ",
        F.explode(F.sequence(F.lit(0), F.lit(max_delay))).alias("_d"),
    )
    # the pinned triangle is periods × delays rows — broadcast it into
    # the spine join (the cached frame's stats don't reach the planner)
    tri = spine.join(F.broadcast(sparse), on=["_occ", "_d"], how="left").select(
        "_occ", "_d", F.coalesce("_c", F.lit(0).cast("bigint")).alias("_c")
    )
    w = Window.partitionBy("_occ").orderBy("_d")
    cum = tri.withColumn("_k", F.sum("_c").over(w)).crossJoin(F.broadcast(asof))
    # cumulative at each observed depth, only inside the known region
    cum = cum.filter(F.col("_d") <= F.col("_T") - F.col("_occ"))
    # development factors: pair K[occ,d] with K[occ,d+1] per occ (the
    # known-region filter on the d+1 row already restricts to periods
    # that have observed both levels)
    nxt = cum.select(
        F.col("_occ").alias("_occ2"),
        F.col("_d").alias("_dnext"),
        F.col("_k").alias("_knext"),
    )
    # cum is the windowed tiny triangle — broadcast the shifted copy so
    # the pairing never becomes a shuffled self-join
    paired = cum.join(
        F.broadcast(nxt),
        (F.col("_occ") == F.col("_occ2"))
        & (F.col("_dnext") == F.col("_d") + 1),
    )
    factors = paired.groupBy("_d").agg(
        F.sum("_knext").alias("_num"), F.sum("_k").alias("_den")
    )
    # one guaranteed row even when a level has no pairs (NULL there):
    # pivot the <= max_delay factor levels into columns
    # _den = 0 happens when every contributing period still has zero
    # cumulative count at level d (first events arrive at later delays);
    # a multiplicative estimator has no information there — NULL factor,
    # treated as 1 in the product like any other missing level
    fwide = factors.agg(
        *[
            F.max(
                F.when(
                    (F.col("_d") == d) & (F.col("_den") > 0),
                    F.col("_num").cast("double") / F.col("_den").cast("double"),
                )
            ).alias(f"_f{d}")
            for d in range(max_delay)
        ]
    )
    latest = cum.groupBy("_occ").agg(
        F.max("_d").alias("_dstar"), F.max("_k").alias("_kstar")
    )
    out = latest.crossJoin(F.broadcast(fwide))
    # ultimate = kstar * f_{dstar} * ... * f_{max_delay-1}, multiplied
    # low-d -> high-d in a left-to-right chain per CASE arm; a level with
    # no observed development pairs contributes factor 1 (no information)
    arms = F.when(F.col("_dstar") >= max_delay, F.col("_kstar").cast("double"))
    for dstar in range(max_delay - 1, -1, -1):
        expr = F.col("_kstar").cast("double")
        for d in range(dstar, max_delay):
            expr = expr * F.coalesce(F.col(f"_f{d}"), F.lit(1.0))
        arms = arms.when(F.col("_dstar") == dstar, expr)
    return out.select(
        F.col("_occ").alias("occ"),
        F.col("_dstar").cast("bigint").alias("observed_depth"),
        F.col("_kstar").alias("reported_q"),
        arms.alias("ultimate"),
        (arms - F.col("_kstar").cast("double")).alias("outstanding"),
    )


def nowcast_triangle_sql(
    events_sql: str,
    occ_col: str,
    delay_col: str,
    max_delay: int,
) -> str:
    """DuckDB twin of :func:`nowcast_triangle`; ``events_sql`` is a
    SELECT producing (occ_col, delay_col)."""
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    fcols = ", ".join(
        f"MAX(CASE WHEN _d = {d} AND _den > 0 "
        f"THEN {s2d('_num')} / {s2d('_den')} END) AS _f{d}"
        for d in range(max_delay)
    )
    arms = []
    for dstar in range(max_delay - 1, -1, -1):
        chain = "CAST(_kstar AS DOUBLE)"
        for d in range(dstar, max_delay):
            chain = f"({chain} * COALESCE(_f{d}, 1.0))"
        arms.append(f"WHEN _dstar = {dstar} THEN {chain}")
    case = (
        f"CASE WHEN _dstar >= {max_delay} THEN CAST(_kstar AS DOUBLE) "
        + " ".join(arms)
        + " END"
    )
    return f"""
WITH sparse AS (
  SELECT CAST({occ_col} AS BIGINT) AS _occ,
    LEAST(GREATEST(CAST({delay_col} AS BIGINT), 0), {max_delay}) AS _d,
    COUNT(*) AS _c
  FROM ({events_sql})
  GROUP BY 1, 2
),
cutoff AS (SELECT MAX(_occ + _d) AS _T FROM sparse),
spine AS (
  SELECT _occ, UNNEST(generate_series(0, {max_delay})) AS _d
  FROM (SELECT DISTINCT _occ FROM sparse)
),
tri AS (
  SELECT s._occ, s._d, COALESCE(x._c, 0) AS _c
  FROM spine s LEFT JOIN sparse x USING (_occ, _d)
),
cum AS (
  SELECT _occ, _d,
    CAST(SUM(_c) OVER (PARTITION BY _occ ORDER BY _d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS _k
  FROM tri CROSS JOIN cutoff
  WHERE _d <= _T - _occ
),
paired AS (
  SELECT c._d, n._k AS _knext, c._k
  FROM cum c JOIN cum n ON c._occ = n._occ AND n._d = c._d + 1
),
factors AS (
  SELECT _d, CAST(SUM(_knext) AS BIGINT) AS _num, CAST(SUM(_k) AS BIGINT) AS _den
  FROM paired GROUP BY _d
),
fwide AS (SELECT {fcols} FROM factors),
latest AS (
  SELECT _occ, MAX(_d) AS _dstar, MAX(_k) AS _kstar FROM cum GROUP BY _occ
),
wide AS (SELECT latest.*, fwide.* FROM latest CROSS JOIN fwide)
SELECT _occ AS occ, CAST(_dstar AS BIGINT) AS observed_depth,
  _kstar AS reported_q,
  {case} AS ultimate,
  ({case}) - CAST(_kstar AS DOUBLE) AS outstanding
FROM wide
"""


# --------------------------------------------------------------------------
# quantile-forecast evaluation (pinball / interval scores)
# --------------------------------------------------------------------------


def _pinball_col_name(q: float) -> str:
    """Column name for quantile level q.  Whole-percent levels keep the
    legacy two-digit form (0.5 -> pinball_50); sub-percent levels (the
    forecast-hub 0.025/0.975 tails) use the full level string so they
    neither collapse onto a neighboring percent nor collide with each
    other (0.02 -> pinball_02, 0.025 -> pinball_0p025)."""
    pct = q * 100.0
    if abs(pct - round(pct)) < 1e-9:
        return f"pinball_{int(round(pct)):02d}"
    return "pinball_" + f"{float(q):g}".replace(".", "p").replace("-", "m")


def pinball_scores(
    forecasts: DataFrame,
    actual_col: str,
    quantile_cols: dict[float, str],
    group_columns,
    interval: tuple[float, float] | None = None,
    scale: int = 6,
) -> DataFrame:
    """Proper-scoring-rule evaluation of quantile forecasts — the
    forecast-hub scoring step (pinball loss per quantile level; mean
    pinball across levels approximates the weighted interval score up
    to a constant, and empirical central-interval coverage).

    ``quantile_cols`` maps level q → forecast column.  Per row:

        pinball_q = (y − f_q)·q        if y ≥ f_q
                    (f_q − y)·(1 − q)  otherwise

    Per-row doubles are floor-quantized to 10^-scale units and
    accumulated in DECIMAL (order-independent — the repo's exact-mean
    discipline), so group means are bit-identical across engines.
    ``interval=(lo_q, hi_q)`` adds the empirical coverage of that
    central interval (exact integer count / n).

    One map-combinable aggregation; output = one row per group.
    Returns (groups…, n, pinball_q{…} means, mean_pinball, coverage).
    """
    g = _as_list(group_columns)
    m = 10**scale
    y = F.col(actual_col).cast("double")
    rows = forecasts.filter(y.isNotNull())
    aggs = [F.count(F.lit(1)).alias("n")]
    qnames = []
    for q, col in sorted(quantile_cols.items()):
        fq = F.col(col).cast("double")
        loss = F.when(y >= fq, (y - fq) * F.lit(float(q))).otherwise(
            (fq - y) * F.lit(1.0 - float(q))
        )
        lq = F.floor(loss * F.lit(m) + F.lit(0.5)).cast("decimal(38,0)")
        nm = _pinball_col_name(q)
        if nm in qnames:
            raise ValueError(f"duplicate pinball column for level {q}: {nm}")
        qnames.append(nm)
        aggs.append(F.sum(lq).alias(f"_s_{nm}"))
    if interval is not None:
        lo, hi = interval
        flo = F.col(quantile_cols[lo]).cast("double")
        fhi = F.col(quantile_cols[hi]).cast("double")
        aggs.append(
            F.sum(((y >= flo) & (y <= fhi)).cast("bigint")).alias("_cov")
        )
    agg = rows.groupBy(*g).agg(*aggs)
    nn = F.col("n").cast("double")
    means = [
        (
            F.col(f"_s_{nm}").cast("string").cast("double")
            / F.lit(float(m))
            / nn
        ).alias(nm)
        for nm in qnames
    ]
    total = None
    for nm in qnames:
        t = F.col(f"_s_{nm}").cast("string").cast("double")
        total = t if total is None else total + t
    mean_pinball = (
        total / F.lit(float(m)) / nn / F.lit(float(len(qnames)))
    ).alias("mean_pinball")
    out = [*g, F.col("n"), *means, mean_pinball]
    if interval is not None:
        out.append((F.col("_cov").cast("double") / nn).alias("coverage"))
    return agg.select(*out)


def pinball_scores_sql(
    forecasts_sql: str,
    actual_col: str,
    quantile_cols: dict[float, str],
    group_columns,
    interval: tuple[float, float] | None = None,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`pinball_scores`; ``forecasts_sql`` is a
    SELECT producing groups, actual, and the quantile columns."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    aggs = ["COUNT(*) AS n"]
    qnames = []
    for q, col in sorted(quantile_cols.items()):
        nm = _pinball_col_name(q)
        if nm in qnames:
            raise ValueError(f"duplicate pinball column for level {q}: {nm}")
        qnames.append(nm)
        loss = (
            f"CASE WHEN CAST({actual_col} AS DOUBLE) >= CAST({col} AS DOUBLE) "
            f"THEN (CAST({actual_col} AS DOUBLE) - CAST({col} AS DOUBLE)) * {dlit(float(q))} "
            f"ELSE (CAST({col} AS DOUBLE) - CAST({actual_col} AS DOUBLE)) * {dlit(1.0 - float(q))} END"
        )
        aggs.append(
            f"SUM(CAST(FLOOR(({loss}) * {m} + 0.5) AS DECIMAL(38,0))) AS _s_{nm}"
        )
    if interval is not None:
        lo, hi = interval
        aggs.append(
            f"CAST(SUM(CASE WHEN CAST({actual_col} AS DOUBLE) >= CAST({quantile_cols[lo]} AS DOUBLE) "
            f"AND CAST({actual_col} AS DOUBLE) <= CAST({quantile_cols[hi]} AS DOUBLE) "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS _cov"
        )
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    means = [
        f"{s2d(f'_s_{nm}')} / {dlit(float(m))} / CAST(n AS DOUBLE) AS {nm}"
        for nm in qnames
    ]
    total = " + ".join(s2d(f"_s_{nm}") for nm in qnames)
    sel = [gsel, "n", *means,
           f"({total}) / {dlit(float(m))} / CAST(n AS DOUBLE) / {dlit(float(len(qnames)))} AS mean_pinball"]
    if interval is not None:
        sel.append("CAST(_cov AS DOUBLE) / CAST(n AS DOUBLE) AS coverage")
    return f"""
WITH agg AS (
  SELECT {gsel}, {', '.join(aggs)}
  FROM ({forecasts_sql})
  WHERE {actual_col} IS NOT NULL
  GROUP BY {gsel}
)
SELECT {', '.join(sel)} FROM agg
"""


# --------------------------------------------------------------------------
# weighted interval score (WIS)
# --------------------------------------------------------------------------


def wis_scores(
    forecasts: DataFrame,
    actual_col: str,
    median_col: str,
    interval_cols: dict[float, tuple[str, str]],
    group_columns,
    scale: int = 6,
) -> DataFrame:
    """Weighted interval score — THE forecast-hub headline metric
    (Bracher/Ray/Reich/Gneiting 2021), the evaluation the reference's
    ecosystem runs on every submitted quantile forecast.  Where
    :func:`pinball_scores` reports per-level losses, WIS is the single
    weighted summary over a median and K central prediction intervals,
    with the canonical additive decomposition that tells a modeler WHY
    the score is bad:

        IS_α = (u−l) + (2/α)(l−y)·1[y<l] + (2/α)(y−u)·1[y>u]
        WIS  = ( ½|y−m| + Σ_k (α_k/2)·IS_{α_k} ) / (K + ½)
             = dispersion + overprediction + underprediction

    ``interval_cols`` maps central-interval miss-level α (e.g. 0.2 for
    the 80 % PI) → (lower_col, upper_col).  Per row the three
    decomposition components are formed as fixed double trees,
    floor-quantized to 10^-scale units, and DECIMAL-accumulated (the
    repo's exact-mean discipline) — so group means are bit-identical
    across engines and the decomposition identity holds exactly:
    wis = dispersion + overprediction + underprediction by construction
    (the same three quantized sums).

    One map-combinable aggregation; output one row per group:
    (groups…, n, wis, dispersion, overprediction, underprediction).
    """
    g = _as_list(group_columns)
    m = 10**scale
    k = len(interval_cols)
    denom_w = float(k) + 0.5
    y = F.col(actual_col).cast("double")
    med = F.col(median_col).cast("double")
    # dispersion: Σ (α/2)(u−l); over: Σ (l−y)⁺ + ½(m−y)⁺; under: mirror
    disp = None
    over = F.when(y < med, (med - y) * F.lit(0.5)).otherwise(F.lit(0.0))
    under = F.when(y > med, (y - med) * F.lit(0.5)).otherwise(F.lit(0.0))
    for alpha, (lo_col, hi_col) in sorted(interval_cols.items()):
        lo = F.col(lo_col).cast("double")
        hi = F.col(hi_col).cast("double")
        w = F.lit(float(alpha) / 2.0)
        term = (hi - lo) * w
        disp = term if disp is None else disp + term
        over = over + F.when(y < lo, lo - y).otherwise(F.lit(0.0))
        under = under + F.when(y > hi, y - hi).otherwise(F.lit(0.0))
    if disp is None:
        disp = F.lit(0.0)

    def q(c):
        return F.floor(c * F.lit(m) + F.lit(0.5)).cast("decimal(38,0)")

    # complete-case: a NULL median or bound would silently drop its
    # quantized term from the DECIMAL sums while the row still counted
    # toward n, biasing the group means (the mann_whitney/ks_test
    # convention — ADVICE r7)
    cc = y.isNotNull() & med.isNotNull()
    for _, (lo_col, hi_col) in sorted(interval_cols.items()):
        cc = cc & F.col(lo_col).isNotNull() & F.col(hi_col).isNotNull()
    agg = forecasts.filter(cc).groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q(disp)).alias("_sd"),
        F.sum(q(over)).alias("_so"),
        F.sum(q(under)).alias("_su"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    den = F.lit(float(m)) * nn * F.lit(denom_w)
    return agg.select(
        *g,
        "n",
        ((s2d("_sd") + s2d("_so") + s2d("_su")) / den).alias("wis"),
        (s2d("_sd") / den).alias("dispersion"),
        (s2d("_so") / den).alias("overprediction"),
        (s2d("_su") / den).alias("underprediction"),
    )


def wis_scores_sql(
    forecasts_sql: str,
    actual_col: str,
    median_col: str,
    interval_cols: dict[float, tuple[str, str]],
    group_columns,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`wis_scores`; ``forecasts_sql`` is a SELECT
    producing groups, actual, median, and the interval bound columns."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    k = len(interval_cols)
    denom_w = float(k) + 0.5
    yy = f"CAST({actual_col} AS DOUBLE)"
    mm = f"CAST({median_col} AS DOUBLE)"
    disp_terms = []
    over_terms = [f"CASE WHEN {yy} < {mm} THEN ({mm} - {yy}) * 0.5 ELSE 0.0 END"]
    under_terms = [f"CASE WHEN {yy} > {mm} THEN ({yy} - {mm}) * 0.5 ELSE 0.0 END"]
    for alpha, (lo_col, hi_col) in sorted(interval_cols.items()):
        lo = f"CAST({lo_col} AS DOUBLE)"
        hi = f"CAST({hi_col} AS DOUBLE)"
        w = dlit(float(alpha) / 2.0)
        disp_terms.append(f"({hi} - {lo}) * {w}")
        over_terms.append(f"CASE WHEN {yy} < {lo} THEN {lo} - {yy} ELSE 0.0 END")
        under_terms.append(f"CASE WHEN {yy} > {hi} THEN {yy} - {hi} ELSE 0.0 END")
    disp = " + ".join(disp_terms) if disp_terms else "0.0"
    over = " + ".join(over_terms)
    under = " + ".join(under_terms)

    def q(expr):
        return f"CAST(FLOOR(({expr}) * {m} + 0.5) AS DECIMAL(38,0))"

    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    den = f"({dlit(float(m))} * CAST(n AS DOUBLE) * {dlit(denom_w)})"
    cc = [f"{actual_col} IS NOT NULL", f"{median_col} IS NOT NULL"]
    for _, (lo_col, hi_col) in sorted(interval_cols.items()):
        cc += [f"{lo_col} IS NOT NULL", f"{hi_col} IS NOT NULL"]
    where = " AND ".join(cc)
    return f"""
WITH agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM({q(disp)}) AS _sd,
    SUM({q(over)}) AS _so,
    SUM({q(under)}) AS _su
  FROM ({forecasts_sql})
  WHERE {where}
  GROUP BY {gsel}
)
SELECT {gsel}, n,
  ({s2d('_sd')} + {s2d('_so')} + {s2d('_su')}) / {den} AS wis,
  {s2d('_sd')} / {den} AS dispersion,
  {s2d('_so')} / {den} AS overprediction,
  {s2d('_su')} / {den} AS underprediction
FROM agg
"""


# --------------------------------------------------------------------------
# excess incidence vs day-of-week baseline
# --------------------------------------------------------------------------


def excess_incidence(
    counts: DataFrame,
    count_col: str,
    day_col: str,
    group_columns,
    split_day: int,
    period: int = 7,
    scale: int = 6,
) -> DataFrame:
    """Excess incidence against a seasonal baseline — the
    excess-mortality / outbreak-burden computation: days before
    ``split_day`` form the baseline, each evaluation day's expected
    count is the baseline mean for its phase (day-of-week by default),
    and excess = observed − expected, accumulated per group.

    Exactness: the baseline mean is one double division of exact int64
    sums; it is then floor-quantized to 10^-scale units so the running
    cumulative sum is an integer window SUM — exact and
    accumulation-order-free (a windowed double SUM would diverge across
    engines; see the repo's exactness notes).  Evaluation days whose
    phase has no baseline observations are dropped (no expectation to
    compare against).

    Scale shape: one baseline groupBy (group × period rows out), one
    broadcast-sized join back, one window pass per group.

    Returns (groups…, day, n, expected, excess, cum_excess).
    """
    g = _as_list(group_columns)
    m = 10**scale
    n = F.col(count_col).cast("bigint")
    d = counts.select(*g, F.col(day_col).alias("_day"), n.alias("_n"))
    phase = ((F.col("_day") % period) + period) % period
    base = (
        d.filter(F.col("_day") < split_day)
        .select(*g, phase.alias("_ph"), "_n")
        .groupBy(*g, "_ph")
        .agg(F.sum("_n").alias("_sb"), F.count(F.lit(1)).alias("_cb"))
    )
    ev = d.filter(F.col("_day") >= split_day).select(
        *g, "_day", "_n", phase.alias("_ph")
    )
    j = ev.join(base, on=[*g, "_ph"])
    expected = F.col("_sb").cast("double") / F.col("_cb").cast("double")
    eq = F.floor(expected * F.lit(m) + F.lit(0.5)).cast("bigint")
    excess_q = F.col("_n") * F.lit(m) - eq
    w = (
        Window.partitionBy(*g)
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = j.select(
        *g,
        "_day",
        F.col("_n").alias(count_col),
        expected.alias("expected"),
        excess_q.alias("_xq"),
    ).withColumn("_cxq", F.sum("_xq").over(w))
    mf = float(m)
    return out.select(
        *g,
        F.col("_day").alias(day_col),
        count_col,
        "expected",
        (F.col("_xq").cast("double") / F.lit(mf)).alias("excess"),
        (F.col("_cxq").cast("double") / F.lit(mf)).alias("cum_excess"),
    )


def excess_incidence_sql(
    counts_sql: str,
    count_col: str,
    day_col: str,
    group_columns,
    split_day: int,
    period: int = 7,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`excess_incidence`."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    over = (
        f"(PARTITION BY {gsel} ORDER BY _day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return f"""
WITH src AS (
  SELECT {gsel}, {day_col} AS _day, CAST({count_col} AS BIGINT) AS _n,
    ((({day_col}) % {period}) + {period}) % {period} AS _ph
  FROM ({counts_sql})
),
base AS (
  SELECT {gsel}, _ph, CAST(SUM(_n) AS BIGINT) AS _sb, COUNT(*) AS _cb
  FROM src WHERE _day < {split_day} GROUP BY {gsel}, _ph
),
ev AS (SELECT * FROM src WHERE _day >= {split_day}),
j AS (
  SELECT ev.*, base._sb, base._cb,
    CAST(base._sb AS DOUBLE) / CAST(base._cb AS DOUBLE) AS expected
  FROM ev JOIN base USING ({gsel}, _ph)
),
q AS (
  SELECT *, _n * {m} - CAST(FLOOR(expected * {m} + 0.5) AS BIGINT) AS _xq
  FROM j
),
c AS (SELECT *, CAST(SUM(_xq) OVER {over} AS BIGINT) AS _cxq FROM q)
SELECT {gsel}, _day AS {day_col}, _n AS {count_col}, expected,
  CAST(_xq AS DOUBLE) / {m}.0e0 AS excess,
  CAST(_cxq AS DOUBLE) / {m}.0e0 AS cum_excess
FROM c
"""


# --------------------------------------------------------------------------
# sample-based CRPS (continuous ranked probability score)
# --------------------------------------------------------------------------


def crps_sample(
    forecasts: DataFrame,
    actual_col: str,
    sample_col: str,
    m: int,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group mean CRPS of an m-member ensemble forecast — the
    sample form of the proper score the forecast-hub quantile metrics
    (pinball/WIS, above) approximate, completing the scoring family for
    models that emit trajectories rather than quantiles:

        CRPS(x₁..x_m; y) = (1/m)·Σᵢ|xᵢ − y| − (1/m²)·Σ_{i<j}(x₍ⱼ₎ − x₍ᵢ₎)

    (Gneiting & Raftery 2007 eq. 21, sample estimator).  ``sample_col``
    must be an ascending-sorted array of exactly ``m`` members (the
    caller filters; the trailing-window empirical forecaster already
    sorts).  Exactness: members and observation are floor-quantized to
    10^-scale units, so the absolute-error sum is an exact int64 fold
    and the pairwise spread collapses to the sorted-order identity
    Σ_{i<j}(x₍ⱼ₎−x₍ᵢ₎) = Σᵢ(2i−1−m)·x₍ᵢ₎ — an UNROLLED fixed linear
    combination of array slots (integer, tie-permutation invariant), no
    pairwise join anywhere.  Per-row numerators are exact ints summed
    in DECIMAL(38,0); each output is one double division.

    Scale shape: one map-combinable aggregation over rows that each
    carry an O(m) array — no shuffle beyond the single groupBy
    exchange, constant memory per row; at 100 TB the cost is the scan.

    Returns (groups…, n, crps, abs_term, spread_term) with
    crps = abs_term − spread_term by construction.
    """
    g = _as_list(group_columns)
    mm = int(m)
    mq = 10**scale
    y = F.col(actual_col).cast("double")
    qy = F.floor(y * F.lit(mq) + F.lit(0.5)).cast("bigint")
    qarr = F.transform(
        F.col(sample_col),
        lambda x: F.floor(x.cast("double") * F.lit(mq) + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    rows = forecasts.filter(
        y.isNotNull() & (F.size(F.col(sample_col)) == mm)
    ).select(*g, qy.alias("_qy"), qarr.alias("_qa"))
    abs_sum = F.aggregate(
        F.col("_qa"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.abs(x - F.col("_qy")),
    )
    pair = None
    for i in range(1, mm + 1):
        c = 2 * i - 1 - mm
        if c == 0:
            continue
        t = F.lit(c).cast("bigint") * F.element_at("_qa", i)
        pair = t if pair is None else pair + t
    q = rows.select(
        *g,
        abs_sum.alias("_abs"),
        (pair if pair is not None else F.lit(0).cast("bigint")).alias("_pair"),
    )
    agg = q.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_abs").cast("decimal(38,0)")).alias("_sa"),
        F.sum(F.col("_pair").cast("decimal(38,0)")).alias("_sp"),
    )
    nn = F.col("n").cast("double")
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    mf = float(mq)
    abs_term = s2d("_sa") / F.lit(float(mm)) / F.lit(mf) / nn
    spread = s2d("_sp") / F.lit(float(mm * mm)) / F.lit(mf) / nn
    crps = (
        (s2d("_sa") * F.lit(float(mm)) - s2d("_sp"))
        / F.lit(float(mm * mm))
        / F.lit(mf)
        / nn
    )
    return agg.select(
        *g,
        "n",
        crps.alias("crps"),
        abs_term.alias("abs_term"),
        spread.alias("spread_term"),
    )


def crps_sample_sql(
    forecasts_sql: str,
    actual_col: str,
    sample_col: str,
    m: int,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`crps_sample` (same quantization, same
    unrolled sorted-pair identity, same DECIMAL accumulators)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    mm = int(m)
    mq = 10**scale
    qy = f"CAST(FLOOR(CAST({actual_col} AS DOUBLE) * {mq} + 0.5) AS BIGINT)"
    qa = (
        f"list_transform({sample_col}, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {mq} + 0.5) AS BIGINT))"
    )
    pair_terms = " + ".join(
        f"CAST({2 * i - 1 - mm} AS BIGINT) * _qa[{i}]"
        for i in range(1, mm + 1)
        if 2 * i - 1 - mm != 0
    ) or "CAST(0 AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    mf = dlit(float(mq))
    return f"""
WITH rows_q AS (
  SELECT {gsel}, {qy} AS _qy, {qa} AS _qa
  FROM ({forecasts_sql})
  WHERE {actual_col} IS NOT NULL AND len({sample_col}) = {mm}
),
t AS (
  SELECT {gsel},
    CAST(list_sum(list_transform(_qa, x -> abs(x - _qy))) AS BIGINT) AS _abs,
    ({pair_terms}) AS _pair
  FROM rows_q
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_abs AS DECIMAL(38,0))) AS _sa,
    SUM(CAST(_pair AS DECIMAL(38,0))) AS _sp
  FROM t GROUP BY {gsel}
)
SELECT {gsel}, n,
  ({s2d('_sa')} * {dlit(float(mm))} - {s2d('_sp')}) / {dlit(float(mm * mm))} / {mf} / {nn} AS crps,
  {s2d('_sa')} / {dlit(float(mm))} / {mf} / {nn} AS abs_term,
  {s2d('_sp')} / {dlit(float(mm * mm))} / {mf} / {nn} AS spread_term
FROM agg
"""


# --------------------------------------------------------------------------
# PIT / Talagrand rank histogram
# --------------------------------------------------------------------------


def pit_histogram(
    forecasts: DataFrame,
    actual_col: str,
    sample_col: str,
    m: int,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Talagrand (verification-rank / PIT) histogram of an
    m-member ensemble: the rank of each observation among its ensemble
    members, binned 1..m+1 — flat for a calibrated forecaster, ∪-shaped
    when under-dispersed, ∩-shaped when over-dispersed (Hamill 2001).
    The calibration diagnostic that pairs with the CRPS level metric.

    Tie handling is DETERMINISTIC (no random splitting): with
    ``less`` = #{xᵢ < y} and ``leq`` = #{xᵢ ≤ y} on 10^-scale-quantized
    values, rank = less + ⌊(leq − less)/2⌋ + 1 — ties split to the
    middle, bit-identical across engines.

    Scale shape: one O(m) fold per row, one groupBy(group, bin) count,
    one window sum for the fraction — two exchanges total.

    Returns (groups…, pit_bin, n_bin, frac).
    """
    g = _as_list(group_columns)
    mm = int(m)
    mq = 10**scale
    y = F.col(actual_col).cast("double")
    qy = F.floor(y * F.lit(mq) + F.lit(0.5)).cast("bigint")
    qarr = F.transform(
        F.col(sample_col),
        lambda x: F.floor(x.cast("double") * F.lit(mq) + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    rows = forecasts.filter(
        y.isNotNull() & (F.size(F.col(sample_col)) == mm)
    ).select(*g, qy.alias("_qy"), qarr.alias("_qa"))
    # one fold computes both counts: acc = less·(m+1) + leq packed in
    # a single int (m+1 > any leq, so the fields cannot carry) — halves
    # the per-row array traversals vs two aggregate() calls (bench r11:
    # the fold is this op's entire cost at scale)
    pack = F.lit(mm + 1).cast("bigint")
    packed = F.aggregate(
        F.col("_qa"),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + (x < F.col("_qy")).cast("bigint") * pack
        + (x <= F.col("_qy")).cast("bigint"),
    )
    less = F.floor(packed.cast("double") / pack.cast("double")).cast("bigint")
    leq = packed - less * pack
    half = F.floor((leq - less).cast("double") / F.lit(2.0)).cast("bigint")
    binc = (less + half + F.lit(1).cast("bigint")).alias("pit_bin")
    counted = (
        rows.select(*g, binc)
        .groupBy(*g, "pit_bin")
        .agg(F.count(F.lit(1)).alias("n_bin"))
    )
    w = Window.partitionBy(*g)
    return counted.select(
        *g,
        "pit_bin",
        "n_bin",
        (
            F.col("n_bin").cast("double")
            / F.sum("n_bin").over(w).cast("double")
        ).alias("frac"),
    )


def pit_histogram_sql(
    forecasts_sql: str,
    actual_col: str,
    sample_col: str,
    m: int,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`pit_histogram` (same quantization, same
    middle-split tie rank)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    mm = int(m)
    mq = 10**scale
    qy = f"CAST(FLOOR(CAST({actual_col} AS DOUBLE) * {mq} + 0.5) AS BIGINT)"
    qa = (
        f"list_transform({sample_col}, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {mq} + 0.5) AS BIGINT))"
    )
    return f"""
WITH rows_q AS (
  SELECT {gsel}, {qy} AS _qy, {qa} AS _qa
  FROM ({forecasts_sql})
  WHERE {actual_col} IS NOT NULL AND len({sample_col}) = {mm}
),
r AS (
  SELECT {gsel},
    CAST(list_sum(list_transform(_qa, x ->
      CASE WHEN x < _qy THEN {mm + 1} ELSE 0 END
      + CASE WHEN x <= _qy THEN 1 ELSE 0 END)) AS BIGINT) AS _packed
  FROM rows_q
),
r2 AS (
  SELECT {gsel},
    CAST(FLOOR(CAST(_packed AS DOUBLE) / {mm + 1}.0) AS BIGINT) AS _less,
    _packed - CAST(FLOOR(CAST(_packed AS DOUBLE) / {mm + 1}.0) AS BIGINT)
      * {mm + 1} AS _leq
  FROM r
),
b AS (
  SELECT {gsel},
    _less + CAST(FLOOR(CAST(_leq - _less AS DOUBLE) / 2.0) AS BIGINT) + 1
      AS pit_bin
  FROM r2
),
c AS (SELECT {gsel}, pit_bin, COUNT(*) AS n_bin FROM b GROUP BY {gsel}, pit_bin)
SELECT {gsel}, pit_bin, n_bin,
  CAST(n_bin AS DOUBLE)
    / CAST(SUM(n_bin) OVER (PARTITION BY {gsel}) AS DOUBLE) AS frac
FROM c
"""


# --------------------------------------------------------------------------
# Wallinga–Teunis case reproduction number
# --------------------------------------------------------------------------


def wallinga_teunis(
    counts: DataFrame,
    count_col: str,
    day_col: str,
    group_columns,
    weights: tuple[int, ...] = (1, 2, 3, 2, 1),
    min_count: int = 1,
) -> DataFrame:
    """Cohort (case) reproduction number of Wallinga & Teunis (2004) —
    the retrospective twin of :func:`renewal_rt`: where the renewal R_t
    asks "how infectious is today given the past", the WT R_t asks "how
    many secondary cases did today's cases ultimately cause", looking
    FORWARD over the generation interval:

        R_t^WT = Σ_d w_d · N_{t+d} / Λ_{t+d},
        Λ_s   = Σ_d w_d · N_{s−d}   (the renewal force of infection)

    with the same integer generation-interval kernel ``weights``
    (w = weights/Σweights; the Σweights normalizers cancel so the
    implementation uses W_d·N_s/force_q_s directly).  Day grid densified
    with zeros exactly as renewal_rt.  R_t^WT is NULL wherever any
    forward day's force is zero/undefined (unattributable cases — the
    documented deterministic policy) or the series ends within the
    kernel horizon, and on days with fewer than ``min_count`` cases.

    Scale shape: identical to renewal_rt — one spine groupBy, one
    co-partitioned left join, ONE window pass computing both the lag
    kernel (force) and the lead kernel (attribution); the sums are
    fixed linear combinations in codegen.

    Returns (groups…, day, n, force_q, rt_wt); rt_wt is a fixed-order
    sum of per-day ratios (mul/div only — no libm, bit-stable).
    """
    g = _as_list(group_columns)
    W = [int(x) for x in weights]
    if not W or any(x <= 0 for x in W):
        raise ValueError("weights must be positive integers")
    n = F.col(count_col).cast("bigint")
    d = counts.select(*g, F.col(day_col).alias("_day"), n.alias("_n"))
    spine = (
        d.groupBy(*g)
        .agg(F.min("_day").alias("_lo"), F.max("_day").alias("_hi"))
        .select(*g, F.explode(F.sequence("_lo", "_hi")).alias("_day"))
    )
    filled = spine.join(d, on=[*g, "_day"], how="left").select(
        *g, "_day", F.coalesce("_n", F.lit(0).cast("bigint")).alias("_n")
    )
    w = Window.partitionBy(*g).orderBy("_day")
    force = None
    for s, wt in enumerate(W, start=1):
        term = F.lit(wt).cast("bigint") * F.lag("_n", s).over(w)
        force = term if force is None else force + term
    ratio = F.when(
        force.isNotNull() & (force > 0),
        F.col("_n").cast("double") / force.cast("double"),
    )
    k = filled.select(
        *g, "_day", "_n", force.alias("force_q"), ratio.alias("_ratio")
    )
    rt = None
    for s, wt in enumerate(W, start=1):
        term = F.lit(float(wt)) * F.lead("_ratio", s).over(w)
        rt = term if rt is None else rt + term
    rt = F.when(F.col("_n") >= min_count, rt)
    return k.select(
        *g,
        F.col("_day").alias(day_col),
        F.col("_n").alias(count_col),
        "force_q",
        rt.alias("rt_wt"),
    )


def wallinga_teunis_sql(
    counts_sql: str,
    count_col: str,
    day_col: str,
    group_columns,
    weights: tuple[int, ...] = (1, 2, 3, 2, 1),
    min_count: int = 1,
) -> str:
    """DuckDB twin of :func:`wallinga_teunis` (same grid, same kernel
    order, same NULL policy)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    W = [int(x) for x in weights]
    over = f"(PARTITION BY {gsel} ORDER BY _day)"
    force = " + ".join(
        f"CAST({wt} AS BIGINT) * LAG(_n, {s}) OVER {over}"
        for s, wt in enumerate(W, start=1)
    )
    rt = " + ".join(
        f"{dlit(float(wt))} * LEAD(_ratio, {s}) OVER {over}"
        for s, wt in enumerate(W, start=1)
    )
    return f"""
WITH src AS (
  SELECT {gsel}, {day_col} AS _day, CAST({count_col} AS BIGINT) AS _n
  FROM ({counts_sql})
),
b AS (SELECT {gsel}, MIN(_day) AS _lo, MAX(_day) AS _hi FROM src GROUP BY {gsel}),
spine AS (SELECT {gsel}, UNNEST(generate_series(_lo, _hi)) AS _day FROM b),
filled AS (
  SELECT s.*, COALESCE(d._n, CAST(0 AS BIGINT)) AS _n
  FROM spine s LEFT JOIN src d USING ({gsel}, _day)
),
k AS (
  SELECT {gsel}, _day, _n, ({force}) AS force_q
  FROM filled
),
r AS (
  SELECT *, CASE WHEN force_q IS NOT NULL AND force_q > 0
                 THEN CAST(_n AS DOUBLE) / CAST(force_q AS DOUBLE) END
            AS _ratio
  FROM k
)
SELECT {gsel}, _day AS {day_col}, _n AS {count_col}, force_q,
  CASE WHEN _n >= {min_count} THEN ({rt}) END AS rt_wt
FROM r
"""
