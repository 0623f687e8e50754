"""Nonparametric statistics battery: two-sample Kolmogorov–Smirnov,
Kruskal–Wallis rank ANOVA, Spearman rank correlation, and
Benjamini–Hochberg FDR control.

The rank-based siblings of the parametric family in operators/stats.py
(anova_oneway, welch_ttest) and operators/regression.py (mann_kendall):
distribution-free tests that survive outliers, heavy tails, and any
monotone transform of the data — the right defaults for messy
production metrics.  Capability parity: the reference's users run these
via scipy.stats (ks_2samp, kruskal, spearmanr) on collected frames; here
each is one or two distributed aggregations.

Scale design (100 TB answer): every op is ranks-via-window or
count-merge — no pair joins, no driver collects.  KS and KW rank over
(group, quantized-value) COUNTS, so the shuffled width is the number of
DISTINCT values per group, not rows; Spearman is two rank windows plus
one sufficient-stats aggregation; BH-FDR is two ordered windows over the
m test rows (m = number of hypotheses, tiny by construction).

Exactness: values are quantized to a fixed grid first, ranks and ECDF
steps are exact integers, and every cross-row sum runs through
DECIMAL(38,0) (the anova floor-in-double-domain pattern for the k-level
reduces).  Normal-CDF p-values use the Bowling et al. logistic
approximation (|err| < 1.4e-4 — documented engine kernel, shared
literal text in both renderers) and are floor-quantized to 1e-9 before
any comparison, so accept/reject decisions are bit-identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit, sq
from timeseriesutils_spark.operators.window_features import _as_list

# two-sample KS asymptotic 5% critical value c(0.05) for
# D * sqrt(n*m/(n+m)):  c = sqrt(-ln(alpha/2)/2) = 1.3581015157406195
_KS_CRIT_05 = 1.3581015157406195


# --------------------------------------------------------------------------
# two-sample Kolmogorov–Smirnov
# --------------------------------------------------------------------------


def ks_test(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Two-sample KS test per group: is ``value_col`` distributed the
    same under ``factor_col = level_a`` vs ``level_b``?  The
    distribution-level drift test — Welch answers "same mean?", KS
    answers "same SHAPE?" (location, spread, and tails at once).

    D = max_v |F_a(v) − F_b(v)| over the merged support.  Computed on
    per-(group, quantized value) COUNTS: one aggregation collapses rows
    to distinct values, one window pass forms both ECDFs, and
    |cum_a·n_b − cum_b·n_a| keeps the max EXACT in integers (divide by
    n_a·n_b only at the end).  Integer bound: cum·n ≤ n_a·n_b < 2^63
    for any two arms under ~3e9 rows each — beyond that, swap the
    product columns to DECIMAL(38,0) (same plan shape).

    reject_05 flags D·sqrt(n_a·n_b/(n_a+n_b)) > 1.3581 (asymptotic 5%
    critical value), the ADF-style pinned-threshold convention.

    Returns (groups…, n_a, n_b, d_stat, ks_stat, reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = F.col(factor_col)
    d = df.filter(
        F.col(value_col).isNotNull() & lvl.isin([level_a, level_b])
    ).select(*groups, q.alias("_q"), (lvl == level_a).alias("_ia"))
    per = d.groupBy(*groups, "_q").agg(
        F.sum(F.col("_ia").cast("bigint")).alias("_ca"),
        F.sum((~F.col("_ia")).cast("bigint")).alias("_cb"),
    )
    w = Window.partitionBy(*groups).orderBy("_q")
    wg = Window.partitionBy(*groups)
    cum = per.select(
        *groups,
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"),
        F.sum("_ca").over(wg).alias("_na"),
        F.sum("_cb").over(wg).alias("_nb"),
    )
    diff = F.abs(
        F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na")
    )
    agg = cum.groupBy(*groups).agg(
        F.max(diff).alias("_dnum"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    d_stat = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.col("_dnum").cast("double") / (na * nb),
    )
    ks = d_stat * F.sqrt(na * nb / (na + nb))
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        d_stat.alias("d_stat"),
        ks.alias("ks_stat"),
        (ks > F.lit(_KS_CRIT_05)).alias("reject_05"),
    )


def ks_test_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`ks_test`.  Windowed/aggregate SUM(BIGINT)
    returns HUGEINT in DuckDB — every cumulative/total is cast back."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q, ({factor_col} = {sq(level_a)}) AS _ia
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL AND {factor_col} IN ({sq(level_a)}, {sq(level_b)})
),
per AS (
  SELECT {gsel}, _q,
    CAST(SUM(CASE WHEN _ia THEN 1 ELSE 0 END) AS BIGINT) AS _ca,
    CAST(SUM(CASE WHEN _ia THEN 0 ELSE 1 END) AS BIGINT) AS _cb
  FROM d GROUP BY {gsel}, _q
),
cum AS (
  SELECT {gsel},
    CAST(SUM(_ca) OVER (PARTITION BY {gsel} ORDER BY _q) AS BIGINT) AS _cuma,
    CAST(SUM(_cb) OVER (PARTITION BY {gsel} ORDER BY _q) AS BIGINT) AS _cumb,
    CAST(SUM(_ca) OVER (PARTITION BY {gsel}) AS BIGINT) AS _na,
    CAST(SUM(_cb) OVER (PARTITION BY {gsel}) AS BIGINT) AS _nb
  FROM per
),
agg AS (
  SELECT {gsel}, MAX(ABS(_cuma * _nb - _cumb * _na)) AS _dnum,
    MAX(_na) AS n_a, MAX(_nb) AS n_b
  FROM cum GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN n_a > 0 AND n_b > 0
    THEN CAST(_dnum AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END
    AS d_stat,
  CASE WHEN n_a > 0 AND n_b > 0
    THEN CAST(_dnum AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
      * SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
             / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) END AS ks_stat,
  CASE WHEN n_a > 0 AND n_b > 0
    THEN (CAST(_dnum AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
      * SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
             / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))
      > {dlit(_KS_CRIT_05)} END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Kruskal–Wallis rank ANOVA
# --------------------------------------------------------------------------


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Kruskal–Wallis H test per group: does ``factor_col`` shift the
    DISTRIBUTION of ``value_col``?  The rank-based anova_oneway — no
    normality assumption, immune to outliers and monotone transforms.

        H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)
        H_corrected = H / (1 − Σ_t (t³−t)/(N³−N))     (tie correction)

    Average ranks via counts, never row-ranks: per (group, quantized
    value) counts t_v, a window cumsum gives each value's DOUBLED
    average rank r2_v = 2·(before_v) + t_v + 1 exactly in integers;
    per-level rank sums R2_g = Σ t_{g,v}·r2_v stay integral (DECIMAL
    accumulate), and the k-level reduce of R2_g²/n_g uses the anova
    floor-in-double-domain pattern (≤ k quantized units of |H| error
    from the floor, zero from summation order).

    Returns (groups…, k_levels, n, h_stat, h_corrected, df).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(F.col(value_col).isNotNull()).select(
        *groups, F.col(factor_col).alias("_lvl"), q.alias("_q")
    )
    # ONE forward chain — no plan forks, no join-back (the decompose
    # ReusedExchange=0 lesson; count-collapsed frames are too large to
    # pin profitably, measured 3.30 s pinned vs 2.4 s chained):
    #   * per-(group, level, value) counts _tl (one aggregation);
    #   * the per-VALUE total _t (all levels) via a peers-only RANGE
    #     frame — ORDER BY _q, CURRENT ROW..CURRENT ROW sums exactly
    #     the tie block, so no (group, value) re-aggregation exists;
    #   * cumulative ≤-value count via the default RANGE frame (peers
    #     included), giving the doubled average rank in exact integers;
    #   * the tie correction folds into the level aggregation with the
    #     exact identity Σ_lvl _tl·(t²−1) = t³−t.
    # Both windows share HashPartitioning(groups): 1 scan, 4 exchanges.
    plv = d.groupBy(*groups, "_lvl", "_q").agg(
        F.count(F.lit(1)).alias("_tl")
    )
    wpeer = (
        Window.partitionBy(*groups)
        .orderBy("_q")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    wcum = Window.partitionBy(*groups).orderBy("_q")
    ranked = plv.select(
        *groups,
        "_lvl",
        "_tl",
        F.sum("_tl").over(wpeer).alias("_t"),
        F.sum("_tl").over(wcum).alias("_cum"),
    ).select(
        *groups,
        "_lvl",
        "_tl",
        "_t",
        # doubled average rank: 2*(# strictly below) + t + 1
        (2 * (F.col("_cum") - F.col("_t")) + F.col("_t") + 1).alias("_r2"),
    )
    lv = ranked.groupBy(*groups, "_lvl").agg(
        F.sum(F.col("_tl")).alias("_ng"),
        F.sum((F.col("_tl") * F.col("_r2")).cast("decimal(38,0)")).alias("_R2"),
        F.sum(
            (F.col("_tl") * (F.col("_t") * F.col("_t") - 1)).cast(
                "decimal(38,0)"
            )
        ).alias("_tiep"),
    )
    r2d = F.col("_R2").cast("string").cast("double")
    ngd = F.col("_ng").cast("double")
    # per-level contribution R2²/(4 n_g), floored then DECIMAL-summed
    contrib = r2d * r2d / (F.lit(4.0) * ngd)
    out = lv.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("k_levels"),
        F.sum("_ng").alias("n"),
        F.sum(
            (contrib - contrib % F.lit(1.0)).cast("decimal(38,0)")
        ).alias("_sr"),
        F.sum("_tiep").alias("_tie"),
    )
    nn = F.col("n").cast("double")
    sr = F.col("_sr").cast("string").cast("double")
    h = F.lit(12.0) / (nn * (nn + 1.0)) * sr - F.lit(3.0) * (nn + 1.0)
    tied = F.col("_tie").cast("string").cast("double")
    corr = F.lit(1.0) - tied / (nn * nn * nn - nn)
    hc = F.when(corr != 0, h / corr)
    ok = (F.col("k_levels") > 1) & (F.col("n") > F.col("k_levels"))
    return out.select(
        *groups,
        "k_levels",
        "n",
        F.when(ok, h).alias("h_stat"),
        F.when(ok, hc).alias("h_corrected"),
        (F.col("k_levels") - 1).alias("df"),
    )


def kruskal_wallis_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`kruskal_wallis`."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    contrib = f"({s2d('_R2')} * {s2d('_R2')} / (4.0 * CAST(_ng AS DOUBLE)))"
    h = (
        f"(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) * {s2d('_sr')}"
        f" - 3.0 * (CAST(n AS DOUBLE) + 1.0))"
    )
    corr = (
        f"(1.0 - {s2d('_tie')} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
        f" * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))"
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {factor_col} AS _lvl, {qq} AS _q
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
plv AS (
  SELECT {gsel}, _lvl, _q, COUNT(*) AS _tl
  FROM d GROUP BY {gsel}, _lvl, _q
),
ranked AS (
  SELECT {gsel}, _lvl, _tl,
    CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q
      RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT) AS _t,
    2 * (CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q) AS BIGINT)
      - CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q
          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT))
      + CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q
          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT) + 1 AS _r2
  FROM plv
),
lv AS (
  SELECT {gsel}, _lvl, CAST(SUM(_tl) AS BIGINT) AS _ng,
    SUM(CAST(_tl * _r2 AS DECIMAL(38,0))) AS _R2,
    SUM(CAST(_tl * (_t * _t - 1) AS DECIMAL(38,0))) AS _tiep
  FROM ranked
  GROUP BY {gsel}, _lvl
),
top AS (
  SELECT {gsel}, COUNT(*) AS k_levels, CAST(SUM(_ng) AS BIGINT) AS n,
    SUM(CAST({contrib} - {contrib} % 1.0 AS DECIMAL(38,0))) AS _sr,
    SUM(_tiep) AS _tie
  FROM lv GROUP BY {gsel}
)
SELECT {gsel}, k_levels, n,
  CASE WHEN k_levels > 1 AND n > k_levels THEN {h} END AS h_stat,
  CASE WHEN k_levels > 1 AND n > k_levels AND {corr} <> 0
    THEN {h} / {corr} END AS h_corrected,
  k_levels - 1 AS df
FROM top
"""


# --------------------------------------------------------------------------
# Mann–Whitney U (Wilcoxon rank-sum)
# --------------------------------------------------------------------------


def mann_whitney(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Two-sample Mann–Whitney U (Wilcoxon rank-sum) test per group:
    does ``factor_col = level_a`` stochastically dominate ``level_b``?
    The rank-based welch_ttest — the A/B default when metrics are
    skewed/heavy-tailed (revenue, latency) and the mean is the wrong
    summary.  Complements ks_test (any-shape difference) with a
    DIRECTIONAL location test; the two-level sibling of kruskal_wallis.

        U = R_a − n_a(n_a+1)/2,  μ = n_a n_b/2
        σ² = (n_a n_b/12)·((N+1) − Σ_t(t³−t)/(N(N−1)))   (tie-corrected)
        z = (U − μ)/σ,  two-sided p via the engine p-value kernel

    Rank machinery is the kruskal_wallis single chain — counts per
    (group, level, quantized value), the peers-only RANGE frame for tie
    blocks, the cumulative RANGE frame for doubled average ranks; rank
    sums and the tie term accumulate in DECIMAL(38,0), and the z / p
    tree combines the exact sums in one shared double expression
    (string-route casts), so decisions are bit-identical across
    engines.  One scan, no joins, no plan forks.

    Returns (groups…, n_a, n_b, u_stat, z_stat, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = F.col(factor_col)
    d = df.filter(
        F.col(value_col).isNotNull() & lvl.isin([level_a, level_b])
    ).select(*groups, (lvl == level_a).alias("_ia"), q.alias("_q"))
    plv = d.groupBy(*groups, "_ia", "_q").agg(F.count(F.lit(1)).alias("_tl"))
    wpeer = (
        Window.partitionBy(*groups)
        .orderBy("_q")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    wcum = Window.partitionBy(*groups).orderBy("_q")
    ranked = plv.select(
        *groups,
        "_ia",
        "_tl",
        F.sum("_tl").over(wpeer).alias("_t"),
        F.sum("_tl").over(wcum).alias("_cum"),
    ).select(
        *groups,
        "_ia",
        "_tl",
        "_t",
        (2 * (F.col("_cum") - F.col("_t")) + F.col("_t") + 1).alias("_r2"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.groupBy(*groups).agg(
        F.sum(F.when(F.col("_ia"), F.col("_tl")).otherwise(F.lit(0))).alias(
            "n_a"
        ),
        F.sum(F.when(~F.col("_ia"), F.col("_tl")).otherwise(F.lit(0))).alias(
            "n_b"
        ),
        F.sum(
            dec(
                F.when(F.col("_ia"), F.col("_tl") * F.col("_r2")).otherwise(
                    F.lit(0)
                )
            )
        ).alias("_R2a"),
        F.sum(dec(F.col("_tl") * (F.col("_t") * F.col("_t") - 1))).alias(
            "_tie"
        ),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = na + nb
    u = (s2d("_R2a") - na * (na + F.lit(1.0))) / F.lit(2.0)
    mu = na * nb / F.lit(2.0)
    sig2 = (
        na
        * nb
        / F.lit(12.0)
        * ((nn + F.lit(1.0)) - s2d("_tie") / (nn * (nn - F.lit(1.0))))
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (sig2 > 0)
    z = (u - mu) / F.sqrt(sig2)
    p = two_sided_p_expr(z)
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), u).alias("u_stat"),
        F.when(ok, z).alias("z_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def mann_whitney_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`mann_whitney`."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    na = "CAST(n_a AS DOUBLE)"
    nb = "CAST(n_b AS DOUBLE)"
    nn = f"({na} + {nb})"
    u = f"(({s2d('_R2a')} - {na} * ({na} + 1.0)) / 2.0)"
    mu = f"({na} * {nb} / 2.0)"
    sig2 = (
        f"({na} * {nb} / 12.0 * (({nn} + 1.0)"
        f" - {s2d('_tie')} / ({nn} * ({nn} - 1.0))))"
    )
    z = f"(({u} - {mu}) / SQRT({sig2}))"
    p = two_sided_p_sql(z)
    ok = f"n_a > 0 AND n_b > 0 AND {sig2} > 0"
    return f"""
WITH d AS (
  SELECT {gsel}, ({factor_col} = {sq(level_a)}) AS _ia, {qq} AS _q
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL AND {factor_col} IN ({sq(level_a)}, {sq(level_b)})
),
plv AS (
  SELECT {gsel}, _ia, _q, COUNT(*) AS _tl
  FROM d GROUP BY {gsel}, _ia, _q
),
ranked AS (
  SELECT {gsel}, _ia, _tl,
    CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q
      RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT) AS _t,
    2 * (CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q) AS BIGINT)
      - CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q
          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT))
      + CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q
          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT) + 1 AS _r2
  FROM plv
),
agg AS (
  SELECT {gsel},
    CAST(SUM(CASE WHEN _ia THEN _tl ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN _ia THEN 0 ELSE _tl END) AS BIGINT) AS n_b,
    SUM(CAST(CASE WHEN _ia THEN _tl * _r2 ELSE 0 END AS DECIMAL(38,0))) AS _R2a,
    SUM(CAST(_tl * (_t * _t - 1) AS DECIMAL(38,0))) AS _tie
  FROM ranked GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN n_a > 0 AND n_b > 0 THEN {u} END AS u_stat,
  CASE WHEN {ok} THEN {z} END AS z_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Spearman rank correlation
# --------------------------------------------------------------------------


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Spearman rank correlation ρ between two columns —
    Pearson on average ranks: the monotone-association measure that
    ignores outliers and nonlinearity (corr_matrix's Pearson answers
    "linear?"; this answers "monotone?").

    Average ranks via two window passes over the quantized values
    (rank + count of equals → doubled average rank, exact integers),
    then one sufficient-stats aggregation.  Products of doubled ranks
    are ≤ (2n)², so Sxy ≤ 4n³ — DECIMAL(38,0) accumulators keep the
    reduce exact to ~1e9 rows/group; the ρ formula combines the exact
    sums in one shared double tree (string-route casts).

    Returns (groups…, n, rho).
    """
    groups = _as_list(group_columns)
    m = 10**scale

    def qz(c):
        return F.floor(F.col(c).cast("double") * F.lit(m) + F.lit(0.5)).cast(
            "bigint"
        )

    d = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*groups, qz(x_col).alias("_qx"), qz(y_col).alias("_qy"))
    # doubled average rank of v among the group's values:
    # 2*(# strictly below) + (# equal) + 1  — two RANK windows
    wx = Window.partitionBy(*groups).orderBy("_qx")
    wy = Window.partitionBy(*groups).orderBy("_qy")
    ranked = d.select(
        *groups,
        (
            2 * (F.rank().over(wx) - 1)
            + F.count(F.lit(1)).over(
                Window.partitionBy(*groups, "_qx")
            )
            + 1
        ).alias("_rx"),
        (
            2 * (F.rank().over(wy) - 1)
            + F.count(F.lit(1)).over(
                Window.partitionBy(*groups, "_qy")
            )
            + 1
        ).alias("_ry"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_rx"))).alias("_sx"),
        F.sum(dec(F.col("_ry"))).alias("_sy"),
        F.sum(dec(F.col("_rx") * F.col("_ry"))).alias("_sxy"),
        F.sum(dec(F.col("_rx") * F.col("_rx"))).alias("_sxx"),
        F.sum(dec(F.col("_ry") * F.col("_ry"))).alias("_syy"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    cov = nn * s2d("_sxy") - s2d("_sx") * s2d("_sy")
    vx = nn * s2d("_sxx") - s2d("_sx") * s2d("_sx")
    vy = nn * s2d("_syy") - s2d("_sy") * s2d("_sy")
    rho = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return agg.select(*groups, "n", rho.alias("rho"))


def spearman_corr_sql(
    data_sql: str,
    x_col: str,
    y_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`spearman_corr`."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qx = f"CAST(FLOOR(CAST({x_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    qy = f"CAST(FLOOR(CAST({y_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    cov = f"(CAST(n AS DOUBLE) * {s2d('_sxy')} - {s2d('_sx')} * {s2d('_sy')})"
    vx = f"(CAST(n AS DOUBLE) * {s2d('_sxx')} - {s2d('_sx')} * {s2d('_sx')})"
    vy = f"(CAST(n AS DOUBLE) * {s2d('_syy')} - {s2d('_sy')} * {s2d('_sy')})"
    return f"""
WITH d AS (
  SELECT {gsel}, {qx} AS _qx, {qy} AS _qy
  FROM ({data_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
ranked AS (
  SELECT {gsel},
    2 * (RANK() OVER (PARTITION BY {gsel} ORDER BY _qx) - 1)
      + CAST(COUNT(*) OVER (PARTITION BY {gsel}, _qx) AS BIGINT) + 1 AS _rx,
    2 * (RANK() OVER (PARTITION BY {gsel} ORDER BY _qy) - 1)
      + CAST(COUNT(*) OVER (PARTITION BY {gsel}, _qy) AS BIGINT) + 1 AS _ry
  FROM d
),
agg AS (
  SELECT {gsel}, CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(_rx AS DECIMAL(38,0))) AS _sx,
    SUM(CAST(_ry AS DECIMAL(38,0))) AS _sy,
    SUM(CAST(_rx * _ry AS DECIMAL(38,0))) AS _sxy,
    SUM(CAST(_rx * _rx AS DECIMAL(38,0))) AS _sxx,
    SUM(CAST(_ry * _ry AS DECIMAL(38,0))) AS _syy
  FROM ranked GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN {vx} > 0 AND {vy} > 0
    THEN {cov} / SQRT({vx} * {vy}) END AS rho
FROM agg
"""


# --------------------------------------------------------------------------
# Benjamini–Hochberg FDR control
# --------------------------------------------------------------------------

# Bowling et al. (2009) logistic approximation of the standard normal
# CDF: Phi(z) ~= 1 / (1 + exp(-1.5976 z - 0.070566 z^3)), |err| < 1.4e-4.
# Used ONLY to map z-scores to p-values for ranking/thresholding; the
# approximation text is identical in both renderers and the result is
# floor-quantized to 1e-9 before any comparison, so decisions are
# bit-identical across engines.
_PQ = 10**9


def two_sided_p_expr(z) -> "F.Column":
    """Two-sided normal p-value of a z-score column, quantized to 1e-9:
    p = 2·(1 − Phi(|z|)) = 2 / (1 + exp(1.5976|z| + 0.070566|z|³))."""
    az = F.abs(z.cast("double"))
    praw = F.lit(2.0) / (
        F.lit(1.0)
        + F.exp(F.lit(1.5976) * az + F.lit(0.070566) * az * az * az)
    )
    return F.floor(praw * F.lit(float(_PQ)) + F.lit(0.5)) / F.lit(float(_PQ))


def two_sided_p_sql(z_sql: str) -> str:
    """SQL text twin of :func:`two_sided_p_expr` (same literals)."""
    az = f"ABS(CAST({z_sql} AS DOUBLE))"
    praw = (
        f"(2.0 / (1.0 + EXP(1.5976 * {az}"
        f" + 0.070566 * {az} * {az} * {az})))"
    )
    return f"(FLOOR({praw} * {dlit(float(_PQ))} + 0.5) / {dlit(float(_PQ))})"


def bh_fdr(
    df: DataFrame,
    p_col: str,
    key_columns,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini–Hochberg step-up FDR control over a battery of
    hypotheses — the meta-operator that makes the per-group test
    families honest: run mann_kendall/welch/ks over 10k groups and 5%
    of the "significant" flags are false by construction; BH bounds
    the false-discovery RATE instead.

        sort p ascending, rank i of m;  k* = max{i : p_i ≤ i·α/m}
        reject hypotheses 1..k*;  q_i = min_{j ≥ i} (m·p_j / j)

    Two window passes over the m hypothesis rows (m = number of tests,
    orders of magnitude below data size — this op runs on the OUTPUT
    of a grouped test, never on raw rows).  The threshold comparison is
    integerized (p quantized at 1e-9 by the p-value kernel; both sides
    scaled by m·1e20) so the step-up decision is exact.

    Returns (keys…, p, rank, m, q_value, reject) ordered by p.
    """
    keys = _as_list(key_columns)
    # deterministic total order: ties on p broken by the key columns
    wr = Window.orderBy("_pq", *keys)
    wall = Window.partitionBy()
    d = df.filter(F.col(p_col).isNotNull()).select(
        *keys,
        F.col(p_col).cast("double").alias("_p"),
        F.floor(F.col(p_col).cast("double") * F.lit(float(_PQ)) + F.lit(0.5))
        .cast("bigint")
        .alias("_pq"),
    )
    ranked = d.select(
        "*",
        F.row_number().over(wr).alias("rank"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    # integer step-up test: p_i <= i*alpha/m  <=>  pq*m*1e11 <= i*alpha*1e20
    # (alpha*1e20 exceeds int64 for alpha > ~0.09 — route via string lit)
    athr = int(round(alpha * 10**20))
    hit = (
        F.col("_pq").cast("decimal(38,0)")
        * F.col("m").cast("decimal(38,0)")
        * F.lit(str(10**11)).cast("decimal(38,0)")
    ) <= (
        F.col("rank").cast("decimal(38,0)")
        * F.lit(str(athr)).cast("decimal(38,0)")
    )
    flagged = ranked.select(
        "*",
        F.max(F.when(hit, F.col("rank")).otherwise(F.lit(0)))
        .over(wall)
        .alias("_kstar"),
    )
    # q-value: reverse running min of m*p/rank, quantized at 1e-9
    mq = F.floor(
        F.col("m").cast("double")
        * F.col("_p")
        / F.col("rank").cast("double")
        * F.lit(float(_PQ))
        + F.lit(0.5)
    ).cast("bigint")
    wrev = Window.orderBy(F.col("rank").desc())
    out = flagged.select(
        *[F.col(k) for k in keys],
        F.col("_p").alias("p"),
        "rank",
        "m",
        (
            F.least(F.min(mq).over(wrev), F.lit(_PQ)).cast("double")
            / F.lit(float(_PQ))
        ).alias("q_value"),
        (F.col("rank") <= F.col("_kstar")).alias("reject"),
    )
    return out.orderBy("rank")


def bh_fdr_sql(
    data_sql: str,
    p_col: str,
    key_columns,
    alpha: float = 0.05,
) -> str:
    """DuckDB twin of :func:`bh_fdr`."""
    keys = _as_list(key_columns)
    ksel = ", ".join(keys)
    athr = int(round(alpha * 10**20))
    return f"""
WITH d AS (
  SELECT {ksel}, CAST({p_col} AS DOUBLE) AS _p,
    CAST(FLOOR(CAST({p_col} AS DOUBLE) * {dlit(float(_PQ))} + 0.5) AS BIGINT) AS _pq
  FROM ({data_sql}) WHERE {p_col} IS NOT NULL
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY _pq, {ksel}) AS rank,
    CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM d
),
flagged AS (
  SELECT *,
    CAST(MAX(CASE WHEN CAST(_pq AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))
          * CAST('100000000000' AS DECIMAL(38,0))
        <= CAST(rank AS DECIMAL(38,0)) * CAST('{athr}' AS DECIMAL(38,0))
        THEN rank ELSE 0 END) OVER () AS BIGINT) AS _kstar,
    CAST(FLOOR(CAST(m AS DOUBLE) * _p / CAST(rank AS DOUBLE)
        * {dlit(float(_PQ))} + 0.5) AS BIGINT) AS _mq
  FROM ranked
),
out AS (
  SELECT {ksel}, _p AS p, rank, m,
    CAST(LEAST(CAST(MIN(_mq) OVER (ORDER BY rank DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
        {_PQ}) AS DOUBLE) / {dlit(float(_PQ))} AS q_value,
    rank <= _kstar AS reject
  FROM flagged
)
SELECT * FROM out ORDER BY rank
"""


# --------------------------------------------------------------------------
# Wald–Wolfowitz runs test
# --------------------------------------------------------------------------


def runs_test(
    df: DataFrame,
    value_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> DataFrame:
    """Wald–Wolfowitz runs test per group: is the series RANDOM around
    its mean, or does it trend / mean-revert?  The randomness check that
    complements mann_kendall (monotone trend) and acf_features
    (linear autocorrelation): too FEW runs = positive persistence
    (trending), too MANY = negative persistence (oscillation).

    Each observation is dichotomized against the group mean with an
    EXACT integer comparison (q·n > Σq — no division, no float mean),
    rows equal to the mean count as "not above".  With n₁ above, n₂
    not-above, and R runs:

        μ_R = 1 + 2n₁n₂/N,  σ²_R = 2n₁n₂(2n₁n₂−N) / (N²(N−1))
        z = (R − μ_R)/σ_R,  two-sided p via the engine p-value kernel

    One scan: a partition-wide SUM/COUNT window for the mean test, a
    LAG window for run boundaries (both share the partitioning), one
    map-combinable aggregation.  Integer bound: q·n ≤ ~1e7·rows — swap
    to DECIMAL beyond ~1e11 rows/group.

    Returns (groups…, n, n_above, n_runs, z_stat, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    wall = Window.partitionBy(*groups)
    word = Window.partitionBy(*groups).orderBy(*order)
    d = df.filter(F.col(value_col).isNotNull()).select(
        *groups, *order, q.alias("_q")
    )
    signed = d.select(
        *groups,
        *order,
        (
            F.col("_q") * F.count(F.lit(1)).over(wall)
            > F.sum("_q").over(wall)
        ).alias("_ab"),
    )
    chg = (
        F.col("_ab") != F.lag("_ab", 1).over(word)
    ).cast("bigint")
    staged = signed.select(
        *groups,
        F.col("_ab").cast("bigint").alias("_a"),
        F.coalesce(chg, F.lit(0)).alias("_chg"),
    )
    agg = staged.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_a").alias("n_above"),
        (F.sum("_chg") + 1).alias("n_runs"),
    )
    nn = F.col("n").cast("double")
    n1 = F.col("n_above").cast("double")
    n2 = nn - n1
    two = F.lit(2.0) * n1 * n2
    mu = F.lit(1.0) + two / nn
    sig2 = two * (two - nn) / (nn * nn * (nn - F.lit(1.0)))
    ok = (F.col("n") > 1) & (sig2 > 0)
    z = (F.col("n_runs").cast("double") - mu) / F.sqrt(sig2)
    p = two_sided_p_expr(z)
    return agg.select(
        *groups,
        "n",
        "n_above",
        "n_runs",
        F.when(ok, z).alias("z_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def runs_test_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`runs_test`."""
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    gsel = ", ".join(groups)
    osel = ", ".join(order)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    wall = f"(PARTITION BY {gsel})"
    word = f"(PARTITION BY {gsel} ORDER BY {osel})"
    nn = "CAST(n AS DOUBLE)"
    n1 = "CAST(n_above AS DOUBLE)"
    n2 = f"({nn} - {n1})"
    two = f"(2.0 * {n1} * {n2})"
    mu = f"(1.0 + {two} / {nn})"
    sig2 = f"({two} * ({two} - {nn}) / ({nn} * {nn} * ({nn} - 1.0)))"
    z = f"((CAST(n_runs AS DOUBLE) - {mu}) / SQRT({sig2}))"
    p = two_sided_p_sql(z)
    ok = f"n > 1 AND {sig2} > 0"
    return f"""
WITH d AS (
  SELECT {gsel}, {osel}, {qq} AS _q
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
signed AS (
  SELECT {gsel}, {osel},
    _q * CAST(COUNT(*) OVER {wall} AS BIGINT)
      > CAST(SUM(_q) OVER {wall} AS BIGINT) AS _ab
  FROM d
),
staged AS (
  SELECT {gsel}, CAST(_ab AS BIGINT) AS _a,
    COALESCE(CAST(_ab <> LAG(_ab, 1) OVER {word} AS BIGINT), 0) AS _chg
  FROM signed
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    CAST(SUM(_a) AS BIGINT) AS n_above,
    CAST(SUM(_chg) AS BIGINT) + 1 AS n_runs
  FROM staged GROUP BY {gsel}
)
SELECT {gsel}, n, n_above, n_runs,
  CASE WHEN {ok} THEN {z} END AS z_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# ROC AUC (rank-based, ties-averaged)
# --------------------------------------------------------------------------


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col,
    group_columns,
    scale: int = 6,
) -> DataFrame:
    """Per-group ROC AUC of a score against a binary label — THE
    ranking-quality metric for classifiers/retrieval scores, computed
    exactly by the rank-sum identity (never by trapezoid sweeps):

        AUC = (R₊ − n₊(n₊+1)/2) / (n₊ n₋)

    with R₊ the ties-AVERAGED rank sum of the positives (ties get the
    midrank, the standard ROC convention — equivalent to counting each
    tied pair ½).  ``label_col`` may be a column name or a boolean
    Column expression.

    Rank machinery is the mann_whitney single chain: counts per
    (group, label, quantized score), peers-only + cumulative RANGE
    frames for exact doubled midranks, DECIMAL rank-sum accumulation —
    the shuffled width is DISTINCT scores per group, not rows.  One
    scan, no joins.  gini = 2·AUC − 1 rides along.

    Returns (groups…, n_pos, n_neg, auc, gini).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(score_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    d = df.filter(
        F.col(score_col).isNotNull() & lab.isNotNull()
    ).select(*groups, lab.cast("boolean").alias("_y"), q.alias("_q"))
    plv = d.groupBy(*groups, "_y", "_q").agg(F.count(F.lit(1)).alias("_tl"))
    wpeer = (
        Window.partitionBy(*groups)
        .orderBy("_q")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    wcum = Window.partitionBy(*groups).orderBy("_q")
    ranked = plv.select(
        *groups,
        "_y",
        "_tl",
        F.sum("_tl").over(wpeer).alias("_t"),
        F.sum("_tl").over(wcum).alias("_cum"),
    ).select(
        *groups,
        "_y",
        "_tl",
        (2 * (F.col("_cum") - F.col("_t")) + F.col("_t") + 1).alias("_r2"),
    )
    agg = ranked.groupBy(*groups).agg(
        F.sum(F.when(F.col("_y"), F.col("_tl")).otherwise(F.lit(0))).alias(
            "n_pos"
        ),
        F.sum(F.when(~F.col("_y"), F.col("_tl")).otherwise(F.lit(0))).alias(
            "n_neg"
        ),
        F.sum(
            F.when(F.col("_y"), F.col("_tl") * F.col("_r2"))
            .otherwise(F.lit(0))
            .cast("decimal(38,0)")
        ).alias("_R2p"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    np_ = F.col("n_pos").cast("double")
    nn_ = F.col("n_neg").cast("double")
    auc = (s2d("_R2p") / F.lit(2.0) - np_ * (np_ + F.lit(1.0)) / F.lit(2.0)) / (
        np_ * nn_
    )
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        *groups,
        "n_pos",
        "n_neg",
        F.when(ok, auc).alias("auc"),
        F.when(ok, F.lit(2.0) * auc - F.lit(1.0)).alias("gini"),
    )


def roc_auc_sql(
    data_sql: str,
    score_col: str,
    label_sql: str,
    group_columns,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`roc_auc` (``label_sql`` is the boolean
    label expression)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({score_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    np_ = "CAST(n_pos AS DOUBLE)"
    nn_ = "CAST(n_neg AS DOUBLE)"
    auc = (
        f"(({s2d('_R2p')} / 2.0 - {np_} * ({np_} + 1.0) / 2.0)"
        f" / ({np_} * {nn_}))"
    )
    return f"""
WITH d AS (
  SELECT {gsel}, CAST({label_sql} AS BOOLEAN) AS _y, {qq} AS _q
  FROM ({data_sql})
  WHERE {score_col} IS NOT NULL AND ({label_sql}) IS NOT NULL
),
plv AS (
  SELECT {gsel}, _y, _q, COUNT(*) AS _tl
  FROM d GROUP BY {gsel}, _y, _q
),
ranked AS (
  SELECT {gsel}, _y, _tl,
    2 * (CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q) AS BIGINT)
      - CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q
          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT))
      + CAST(SUM(_tl) OVER (PARTITION BY {gsel} ORDER BY _q
          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT) + 1 AS _r2
  FROM plv
),
agg AS (
  SELECT {gsel},
    CAST(SUM(CASE WHEN _y THEN _tl ELSE 0 END) AS BIGINT) AS n_pos,
    CAST(SUM(CASE WHEN _y THEN 0 ELSE _tl END) AS BIGINT) AS n_neg,
    SUM(CAST(CASE WHEN _y THEN _tl * _r2 ELSE 0 END AS DECIMAL(38,0))) AS _R2p
  FROM ranked GROUP BY {gsel}
)
SELECT {gsel}, n_pos, n_neg,
  CASE WHEN n_pos > 0 AND n_neg > 0 THEN {auc} END AS auc,
  CASE WHEN n_pos > 0 AND n_neg > 0 THEN 2.0 * {auc} - 1.0 END AS gini
FROM agg
"""


# --------------------------------------------------------------------------
# Friedman test (rank ANOVA for blocked designs)
# --------------------------------------------------------------------------


def friedman_test(
    df: DataFrame,
    value_col: str,
    treatment_col: str,
    block_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Friedman test per group: across ``block_col`` blocks (weeks,
    machines, panels), does ``treatment_col`` shift the value when each
    block is only compared WITH ITSELF?  The repeated-measures sibling
    of kruskal_wallis — blocking removes between-block level
    differences that would drown the treatment signal in a pooled rank
    test.

        χ²_F = [12/(n·k·(k+1))]·Σ_j R_j² − 3·n·(k+1)

    with n complete blocks, k treatments, R_j the sum over blocks of
    treatment j's WITHIN-BLOCK midrank.  Only blocks observing all k
    treatments count (the standard complete-block rule); cell values
    collapse to per-(block, treatment) quantized MEANS first (exact
    integer sums, floor-quantized ratio) so unbalanced cell sizes
    don't bias ranks.

    One chain: cell aggregation → within-block midranks (two RANGE
    frames over (group, block), the kruskal peer-window form) →
    completeness filter → one reduce.  Midranks are exact doubled
    integers; R_j² accumulates through the floor-in-double-domain
    DECIMAL pattern.  df = k − 1.

    Returns (groups…, k_treatments, n_blocks, chi2_f, df).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(F.col(value_col).isNotNull()).select(
        *groups,
        F.col(block_col).alias("_blk"),
        F.col(treatment_col).alias("_trt"),
        q.alias("_q"),
    )
    # per-cell quantized mean (exact ratio of ints, floor-quantized)
    cell = d.groupBy(*groups, "_blk", "_trt").agg(
        F.sum("_q").alias("_s"), F.count(F.lit(1)).alias("_c")
    )
    cq = F.floor(
        F.col("_s").cast("double") / F.col("_c").cast("double") + F.lit(0.5)
    ).cast("bigint")
    cell = cell.select(*groups, "_blk", "_trt", cq.alias("_cq"))
    wblk = Window.partitionBy(*groups, "_blk")
    wpeer = (
        Window.partitionBy(*groups, "_blk")
        .orderBy("_cq")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    wcum = Window.partitionBy(*groups, "_blk").orderBy("_cq")
    ranked = cell.select(
        *groups,
        "_blk",
        "_trt",
        F.count(F.lit(1)).over(wblk).alias("_kb"),
        F.sum(F.lit(1)).over(wpeer).alias("_t"),
        F.sum(F.lit(1)).over(wcum).alias("_cum"),
    ).select(
        *groups,
        "_blk",
        "_trt",
        "_kb",
        (2 * (F.col("_cum") - F.col("_t")) + F.col("_t") + 1).alias("_r2"),
    )
    # k = DISTINCT treatments in the group (not max block size: two
    # equal-size blocks covering different treatment subsets must NOT
    # both count as complete — ADVICE r7); a block is complete iff its
    # cell count _kb equals k, which (cells being unique per (blk,trt))
    # means it contains exactly the full treatment set
    wg = Window.partitionBy(*groups)
    ranked = ranked.withColumn(
        "_k", F.size(F.collect_set("_trt").over(wg)).cast("bigint")
    ).filter(F.col("_kb") == F.col("_k"))
    # per-treatment doubled rank sums over complete blocks
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    trt = ranked.groupBy(*groups, "_trt").agg(
        F.max("_k").alias("_k"),
        F.count(F.lit(1)).alias("_nb"),
        F.sum(dec(F.col("_r2"))).alias("_R2"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    r2d = s2d("_R2")
    contrib = r2d * r2d / F.lit(4.0)
    out = trt.groupBy(*groups).agg(
        F.max("_k").alias("k_treatments"),
        F.max("_nb").alias("n_blocks"),
        F.sum((contrib - contrib % F.lit(1.0)).cast("decimal(38,0)")).alias(
            "_sr"
        ),
    )
    kk = F.col("k_treatments").cast("double")
    nn = F.col("n_blocks").cast("double")
    chi2 = (
        F.lit(12.0) / (nn * kk * (kk + F.lit(1.0))) * s2d("_sr")
        - F.lit(3.0) * nn * (kk + F.lit(1.0))
    )
    ok = (F.col("k_treatments") > 1) & (F.col("n_blocks") > 1)
    return out.select(
        *groups,
        "k_treatments",
        "n_blocks",
        F.when(ok, chi2).alias("chi2_f"),
        (F.col("k_treatments") - 1).alias("df"),
    )


def friedman_test_sql(
    data_sql: str,
    value_col: str,
    treatment_col: str,
    block_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`friedman_test`."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    r2d = s2d("_R2")
    contrib = f"({r2d} * {r2d} / 4.0)"
    kk = "CAST(k_treatments AS DOUBLE)"
    nn = "CAST(n_blocks AS DOUBLE)"
    chi2 = (
        f"(12.0 / ({nn} * {kk} * ({kk} + 1.0)) * {s2d('_sr')}"
        f" - 3.0 * {nn} * ({kk} + 1.0))"
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {block_col} AS _blk, {treatment_col} AS _trt, {qq} AS _q
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
cell AS (
  SELECT {gsel}, _blk, _trt,
    CAST(FLOOR(CAST(CAST(SUM(_q) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) + 0.5) AS BIGINT) AS _cq
  FROM d GROUP BY {gsel}, _blk, _trt
),
ranked AS (
  SELECT {gsel}, _blk, _trt,
    CAST(COUNT(*) OVER (PARTITION BY {gsel}, _blk) AS BIGINT) AS _kb,
    2 * (CAST(SUM(1) OVER (PARTITION BY {gsel}, _blk ORDER BY _cq) AS BIGINT)
      - CAST(SUM(1) OVER (PARTITION BY {gsel}, _blk ORDER BY _cq
          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT))
      + CAST(SUM(1) OVER (PARTITION BY {gsel}, _blk ORDER BY _cq
          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT) + 1 AS _r2
  FROM cell
),
kk_ AS (
  SELECT *, CAST(COUNT(DISTINCT _trt) OVER (PARTITION BY {gsel}) AS BIGINT)
    AS _k
  FROM ranked
),
complete AS (SELECT * FROM kk_ WHERE _kb = _k),
trt AS (
  SELECT {gsel}, _trt, MAX(_k) AS _k, COUNT(*) AS _nb,
    SUM(CAST(_r2 AS DECIMAL(38,0))) AS _R2
  FROM complete GROUP BY {gsel}, _trt
),
top AS (
  SELECT {gsel}, CAST(MAX(_k) AS BIGINT) AS k_treatments,
    CAST(MAX(_nb) AS BIGINT) AS n_blocks,
    SUM(CAST({contrib} - {contrib} % 1.0 AS DECIMAL(38,0))) AS _sr
  FROM trt GROUP BY {gsel}
)
SELECT {gsel}, k_treatments, n_blocks,
  CASE WHEN k_treatments > 1 AND n_blocks > 1 THEN {chi2} END AS chi2_f,
  k_treatments - 1 AS df
FROM top
"""


# --------------------------------------------------------------------------
# Kendall's tau-b rank correlation
# --------------------------------------------------------------------------


def _inversion_count(a) -> int:
    """Strict inversions (#pairs i<j with a_i > a_j) by recursive merge
    counting — O(n log² n) with vectorized cross-counts; exact integer
    arithmetic, so the Arrow kendall engine is bit-identical to the
    O(n²) pair join."""
    import numpy as np

    a = np.asarray(a)
    if len(a) <= 1:
        return 0

    def rec(v):
        if len(v) <= 1:
            return v, 0
        mid = len(v) // 2
        l, cl = rec(v[:mid])
        r, cr = rec(v[mid:])
        # elements of l STRICTLY greater than each r_j
        cross = int(
            (len(l) - np.searchsorted(l, r, side="right")).sum()
        )
        return np.sort(np.concatenate([l, r]), kind="mergesort"), (
            cl + cr + cross
        )

    return rec(a)[1]


def _kendall_counts_int(qx, qy) -> tuple[int, int, int, int]:
    """(s_stat, n_tie_x, n_tie_y, n) from int64 series — Knight's
    O(n log n) formulation: sort by (x, y), count x-/y-/joint-tie
    pairs, count strict y-inversions (within an x-tie block the y's
    are ascending, so only cross-x pairs invert), then

        S = n₀ − xtie − ytie + ntie − 2·D    (scipy's identity)

    every term an exact integer."""
    import numpy as np

    n = len(qx)
    if n == 0:
        return 0, 0, 0, 0
    perm = np.lexsort((qy, qx))
    x, y = qx[perm], qy[perm]

    def tie_pairs(sorted_vals) -> int:
        _, counts = np.unique(sorted_vals, return_counts=True)
        c = counts.astype(object)
        return int((c * (c - 1) // 2).sum())

    xtie = tie_pairs(x)
    ytie = tie_pairs(np.sort(qy, kind="mergesort"))
    # joint ties: run lengths of equal (x, y) in the lexsorted order
    both = (x[1:] == x[:-1]) & (y[1:] == y[:-1])
    ntie = 0
    run = 1
    for b in both:
        if b:
            run += 1
        else:
            ntie += run * (run - 1) // 2
            run = 1
    ntie += run * (run - 1) // 2
    dis = _inversion_count(y)
    n0 = n * (n - 1) // 2
    s = n0 - xtie - ytie + ntie - 2 * dis
    return int(s), int(xtie), int(ytie), int(n)


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_columns,
    order_by,
    scale: int = 2,
    engine: str = "pairs",
) -> DataFrame:
    """Per-group Kendall's τ-b between two columns — the
    concordance-based sibling of :func:`spearman_corr` (Spearman ranks
    VALUES, Kendall counts PAIR ORDERINGS; τ is more robust to a few
    wild ranks and is the correlation behind mann_kendall's S):

        S  = Σ_{i<j} sign(x_j − x_i)·sign(y_j − y_i)
        τ_b = S / √((n₀ − n₁)(n₀ − n₂)),   n₀ = n(n−1)/2,
        n₁/n₂ = Σ_t t(t−1)/2 over x/y tie groups

    S and the tie counts are EXACT integers (quantized comparisons);
    τ_b is one shared double tree.

    ``engine``:
      * ``'pairs'`` (default, the declared hash-green mode) — O(n²)
        pair self-join, pure JVM expressions; the verify-tier envelope
        for dimension-sized series.
      * ``'arrow'`` — Knight's O(n log n) merge-sort inversion count
        per group (``applyInPandas``); exact integer arithmetic, so it
        is BIT-IDENTICAL to ``'pairs'`` (pinned in tests) — the
        production engine for monster groups, benched as
        ``kendall_prod``.

    ``order_by`` supplies the strict pair order (any total key).

    Returns (groups…, n, s_stat, n_tie_x, n_tie_y, tau_b).
    """
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    if engine == "arrow":
        return _kendall_tau_arrow(df, x_col, y_col, groups, scale)
    m = 10**scale
    qx = F.floor(F.col(x_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    qy = F.floor(F.col(y_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    from timeseriesutils_spark.functions.cache import pin

    # d (the quantized series, dimension-sized per the O(n²) envelope)
    # feeds the pair self-join AND both tie rollups — pin it or three
    # branches re-run the upstream prep (the decompose fork lesson)
    d = pin(
        df.filter(
            F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
        ).select(*groups, *order, qx.alias("_qx"), qy.alias("_qy"))
    )
    a, b = d.alias("a"), d.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in groups]
    lt = F.lit(False)
    for c in reversed(order):
        lt = (F.col(f"a.{c}") < F.col(f"b.{c}")) | (
            (F.col(f"a.{c}") == F.col(f"b.{c}")) & lt
        )
    pairs = a.join(b, on).filter(lt)
    sgn = (
        F.signum((F.col("b._qx") - F.col("a._qx")).cast("double"))
        * F.signum((F.col("b._qy") - F.col("a._qy")).cast("double"))
    ).cast("bigint")
    s_df = pairs.groupBy(*[F.col(f"a.{c}").alias(c) for c in groups]).agg(
        F.sum(sgn).alias("s_stat")
    )
    tie = lambda col, alias: (  # noqa: E731
        d.groupBy(*groups, col)
        .agg(F.count(F.lit(1)).alias("_tc"))
        .groupBy(*groups)
        .agg(
            F.sum("_tc").alias(f"_n{alias}"),
            F.sum(F.col("_tc") * (F.col("_tc") - 1) / 2)
            .cast("bigint")
            .alias(alias),
        )
    )
    tx = tie("_qx", "n_tie_x")
    ty = tie("_qy", "n_tie_y").withColumnRenamed("_nn_tie_y", "_ny")
    out = (
        tx.withColumnRenamed("_nn_tie_x", "n")
        .join(ty.select(*groups, "n_tie_y"), groups, "inner")
        .join(s_df, groups, "left")
    )
    return _tau_b_select(out, groups)


def _tau_b_select(out: DataFrame, groups) -> DataFrame:
    """Shared τ_b double tree over (n, s_stat, n_tie_x, n_tie_y) — the
    identical final expressions for both kendall engines."""
    nn = F.col("n").cast("double")
    n0 = nn * (nn - F.lit(1.0)) / F.lit(2.0)
    n1 = F.col("n_tie_x").cast("double")
    n2 = F.col("n_tie_y").cast("double")
    s = F.coalesce(F.col("s_stat"), F.lit(0).cast("bigint"))
    den = (n0 - n1) * (n0 - n2)
    tau = s.cast("double") / F.sqrt(den)
    return out.select(
        *groups,
        "n",
        s.alias("s_stat"),
        "n_tie_x",
        "n_tie_y",
        F.when(den > 0, tau).alias("tau_b"),
    )


def _kendall_tau_arrow(
    df: DataFrame, x_col: str, y_col: str, groups: list, scale: int
) -> DataFrame:
    """Knight-formulation production engine (see :func:`kendall_tau`):
    one hash exchange on the group key, per-group O(n log n) numpy
    kernel over Arrow batches, the same τ_b tree on the way out."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    m = 10**scale
    qx = F.floor(F.col(x_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    qy = F.floor(F.col(y_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    src = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*groups, qx.alias("_qx"), qy.alias("_qy"))
    fields = [src.schema[c] for c in groups]
    schema = StructType(
        list(fields)
        + [
            StructField("n", LongType()),
            StructField("s_stat", LongType()),
            StructField("n_tie_x", LongType()),
            StructField("n_tie_y", LongType()),
        ]
    )

    def per_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        s, xtie, ytie, n = _kendall_counts_int(
            pdf["_qx"].to_numpy(np.int64), pdf["_qy"].to_numpy(np.int64)
        )
        row = dict(zip([f.name for f in fields], keys))
        row.update(n=n, s_stat=s, n_tie_x=xtie, n_tie_y=ytie)
        return pd.DataFrame([row])

    counts = src.groupBy(*groups).applyInPandas(per_group, schema)
    return _tau_b_select(counts, groups)


def kendall_tau_sql(
    data_sql: str,
    x_col: str,
    y_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`kendall_tau` (same double tree)."""
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    gsel = ", ".join(groups)
    osel = ", ".join(order)
    m = 10**scale
    qx = f"CAST(FLOOR(CAST({x_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    qy = f"CAST(FLOOR(CAST({y_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    jon = " AND ".join(f"a.{c} = b.{c}" for c in groups)
    lt = "FALSE"
    for c in reversed(order):
        lt = f"(a.{c} < b.{c} OR (a.{c} = b.{c} AND {lt}))"
    ja = ", ".join(f"a.{c} AS {c}" for c in groups)
    nn = "CAST(n AS DOUBLE)"
    n0 = f"({nn} * ({nn} - 1.0) / 2.0)"
    n1 = "CAST(n_tie_x AS DOUBLE)"
    n2 = "CAST(n_tie_y AS DOUBLE)"
    den = f"(({n0} - {n1}) * ({n0} - {n2}))"
    tau = f"(CAST(COALESCE(s_stat, 0) AS DOUBLE) / SQRT({den}))"
    return f"""
WITH d AS (
  SELECT {gsel}, {osel}, {qx} AS _qx, {qy} AS _qy
  FROM ({data_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
s AS (
  SELECT {ja},
    CAST(SUM(CAST(SIGN(CAST(b._qx - a._qx AS DOUBLE))
      * SIGN(CAST(b._qy - a._qy AS DOUBLE)) AS BIGINT)) AS BIGINT)
      AS s_stat
  FROM d a JOIN d b ON {jon} AND {lt}
  GROUP BY {", ".join(f"a.{c}" for c in groups)}
),
tx AS (
  SELECT {gsel}, CAST(SUM(_tc) AS BIGINT) AS n,
    CAST(SUM(_tc * (_tc - 1) / 2) AS BIGINT) AS n_tie_x
  FROM (SELECT {gsel}, _qx, COUNT(*) AS _tc FROM d GROUP BY {gsel}, _qx)
  GROUP BY {gsel}
),
ty AS (
  SELECT {gsel}, CAST(SUM(_tc * (_tc - 1) / 2) AS BIGINT) AS n_tie_y
  FROM (SELECT {gsel}, _qy, COUNT(*) AS _tc FROM d GROUP BY {gsel}, _qy)
  GROUP BY {gsel}
)
SELECT tx.{groups[0]}{"".join(f", tx.{c}" for c in groups[1:])}, n,
  CAST(COALESCE(s_stat, 0) AS BIGINT) AS s_stat, n_tie_x, n_tie_y,
  CASE WHEN {den} > 0 THEN {tau} END AS tau_b
FROM tx
JOIN ty ON {" AND ".join(f"tx.{c} = ty.{c}" for c in groups)}
LEFT JOIN s ON {" AND ".join(f"tx.{c} = s.{c}" for c in groups)}
"""


# --------------------------------------------------------------------------
# chi-squared survival kernel (Wilson–Hilferty) — shared by every
# chi^2_{df>1} test (ljung_box_test, bartlett_test; friedman/KW report
# the statistic, this kernel turns it into a decision)
# --------------------------------------------------------------------------


def chi2_sf_expr(chi2, df) -> "F.Column":
    """Upper-tail P(χ²_df > x) via the Wilson–Hilferty cube-root
    normalization — the χ² sibling of :func:`two_sided_p_expr` (no
    incomplete-gamma in either engine; WH error < ~1e-3 for df ≥ 1,
    an approximation the decision threshold absorbs):

        z = ((x/df)^⅓ − (1 − 2/(9df))) / sqrt(2/(9df))
        sf = 1 − Φ(z) = p₂(|z|)/2 if z ≥ 0 else 1 − p₂(|z|)/2

    The cube root is the one cross-engine transcendental — quantized
    at 1e-9 before use (libm pow may differ in the last ulp); the
    Bowling kernel inside p₂ is already quantized; the final sf is
    re-floored at 1e-9 so accept/reject is bit-identical.
    """
    x = chi2.cast("double") if hasattr(chi2, "cast") else F.lit(float(chi2))
    d = df.cast("double") if hasattr(df, "cast") else F.lit(float(df))
    cbrt_q = (
        F.floor(
            F.pow(x / d, F.lit(1.0 / 3.0)) * F.lit(float(_PQ)) + F.lit(0.5)
        )
        / F.lit(float(_PQ))
    )
    z = (cbrt_q - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * d))) / F.sqrt(
        F.lit(2.0) / (F.lit(9.0) * d)
    )
    p2 = two_sided_p_expr(z)
    sf = F.when(z >= 0, p2 / F.lit(2.0)).otherwise(
        F.lit(1.0) - p2 / F.lit(2.0)
    )
    return F.floor(sf * F.lit(float(_PQ)) + F.lit(0.5)) / F.lit(float(_PQ))


def chi2_sf_sql(chi2_sql: str, df_sql: str) -> str:
    """SQL text twin of :func:`chi2_sf_expr` (same literals, same
    quantize points)."""
    x = f"CAST({chi2_sql} AS DOUBLE)"
    d = f"CAST({df_sql} AS DOUBLE)"
    q = dlit(float(_PQ))
    cbrt_q = f"(FLOOR(POW({x} / {d}, {dlit(1.0 / 3.0)}) * {q} + 0.5) / {q})"
    z = (
        f"(({cbrt_q} - (1.0 - 2.0 / (9.0 * {d})))"
        f" / SQRT(2.0 / (9.0 * {d})))"
    )
    p2 = two_sided_p_sql(z)
    sf = f"(CASE WHEN {z} >= 0 THEN {p2} / 2.0 ELSE 1.0 - {p2} / 2.0 END)"
    return f"(FLOOR({sf} * {q} + 0.5) / {q})"


# --------------------------------------------------------------------------
# two-sample Cramér–von Mises
# --------------------------------------------------------------------------

# asymptotic 5% critical value of the CvM limiting distribution
# (Anderson–Darling 1952 table: P(W² > 0.4614) = 0.05)
_CVM_CRIT_05 = 0.4614


def cvm_test(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Two-sample Cramér–von Mises test per group — ks_test's
    integrated sibling: KS reacts to the single LARGEST ECDF gap, CvM
    to the SUM of squared gaps over the whole support, so it sees
    broad mild drift KS underweights:

        T = (n_a·n_b / N²) · Σ_{all N obs} (F_a(x) − F_b(x))²
          = Σ_v t_v · d_v² / (n_a·n_b·N²),
        d_v = cum_a(v)·n_b − cum_b(v)·n_a   (exact integers)

    Same count-collapse + one-window plan as ks_test (the exchange
    carries distinct quantized values, never rows); d_v² runs through
    DECIMAL(19,0)² so two ~3e9-row arms cannot wrap.  reject_05 pins
    the asymptotic 5% critical value T > 0.4614 (the ks_test
    convention).

    Returns (groups…, n_a, n_b, t_stat, reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = F.col(factor_col)
    d = df.filter(
        F.col(value_col).isNotNull() & lvl.isin([level_a, level_b])
    ).select(*groups, q.alias("_q"), (lvl == level_a).alias("_ia"))
    per = d.groupBy(*groups, "_q").agg(
        F.sum(F.col("_ia").cast("bigint")).alias("_ca"),
        F.sum((~F.col("_ia")).cast("bigint")).alias("_cb"),
    )
    w = Window.partitionBy(*groups).orderBy("_q")
    wg = Window.partitionBy(*groups)
    cum = per.select(
        *groups,
        (F.col("_ca") + F.col("_cb")).alias("_tv"),
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"),
        F.sum("_ca").over(wg).alias("_na"),
        F.sum("_cb").over(wg).alias("_nb"),
    )
    dec19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    dv = F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na")
    agg = cum.groupBy(*groups).agg(
        F.sum(dec19(F.col("_tv")) * dec19(dv) * dec19(dv)).alias("_u"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = na + nb
    t = F.col("_u").cast("string").cast("double") / (na * nb * nn * nn)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        F.when(ok, t).alias("t_stat"),
        F.when(ok, t > F.lit(_CVM_CRIT_05)).alias("reject_05"),
    )


def cvm_test_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`cvm_test` (same integer tree)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    na, nb = "CAST(n_a AS DOUBLE)", "CAST(n_b AS DOUBLE)"
    nn = f"({na} + {nb})"
    t = f"(CAST(CAST(_u AS VARCHAR) AS DOUBLE) / ({na} * {nb} * {nn} * {nn}))"
    ok = "n_a > 0 AND n_b > 0"
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q, ({factor_col} = {sq(level_a)}) AS _ia
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL
    AND {factor_col} IN ({sq(level_a)}, {sq(level_b)})
),
per AS (
  SELECT {gsel}, _q,
    CAST(SUM(CASE WHEN _ia THEN 1 ELSE 0 END) AS BIGINT) AS _ca,
    CAST(SUM(CASE WHEN _ia THEN 0 ELSE 1 END) AS BIGINT) AS _cb
  FROM d GROUP BY {gsel}, _q
),
cum AS (
  SELECT {gsel}, _ca + _cb AS _tv,
    CAST(SUM(_ca) OVER (PARTITION BY {gsel} ORDER BY _q) AS BIGINT) AS _cuma,
    CAST(SUM(_cb) OVER (PARTITION BY {gsel} ORDER BY _q) AS BIGINT) AS _cumb,
    CAST(SUM(_ca) OVER (PARTITION BY {gsel}) AS BIGINT) AS _na,
    CAST(SUM(_cb) OVER (PARTITION BY {gsel}) AS BIGINT) AS _nb
  FROM per
),
agg AS (
  SELECT {gsel},
    SUM(CAST(_tv AS HUGEINT)
        * CAST(_cuma * _nb - _cumb * _na AS HUGEINT)
        * CAST(_cuma * _nb - _cumb * _na AS HUGEINT)) AS _u,
    MAX(_na) AS n_a, MAX(_nb) AS n_b
  FROM cum GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN {ok} THEN {t} END AS t_stat,
  CASE WHEN {ok} THEN {t} > {dlit(_CVM_CRIT_05)} END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Pettitt change-point test
# --------------------------------------------------------------------------


def pettitt_test(
    df: DataFrame,
    value_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> DataFrame:
    """Pettitt rank-based change-point test per group: WHERE does the
    distribution shift, and is the shift significant?  The
    nonparametric single-change-point locator — cusum_drift tracks a
    known baseline, best_breakpoint fits two regression lines; Pettitt
    needs no model and survives outliers:

        U_t = 2·W_t − t·(N+1),  W_t = Σ_{i≤t} rank(x_i)  (midranks)
        K = max_t |U_t|,   p ≈ 2·exp(−6K² / (N³ + N²))

    Midranks come from the doubled-rank trick (2·rank + ties − 1, exact
    integers), so U_t = W2_t − t·(N+1) with W2_t the cumulative DOUBLED
    rank sum — everything integer until the final exp (1e-9-quantized,
    the one-transcendental rule).  change_pos is the earliest position
    attaining K (deterministic tie-break).  Two windows (rank by value,
    cumsum by time) on ONE group exchange.

    Returns (groups…, n, k_stat, change_pos, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(F.col(value_col).isNotNull()).select(
        *groups, *order, q.alias("_q")
    )
    wv = Window.partitionBy(*groups).orderBy("_q")
    wpeer = (
        Window.partitionBy(*groups)
        .orderBy("_q")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    wt = Window.partitionBy(*groups).orderBy(*[F.col(c) for c in order])
    wg = Window.partitionBy(*groups)
    # doubled midrank: 2*min_rank + ties - 1
    ranked = d.select(
        *groups,
        *order,
        (2 * F.rank().over(wv) + F.count(F.lit(1)).over(wpeer) - 1).alias(
            "_r2"
        ),
    )
    nn = F.count(F.lit(1)).over(wg)
    t = F.row_number().over(wt)
    u = F.sum("_r2").over(wt) - t * (nn + F.lit(1))
    cur = ranked.select(
        *groups,
        nn.alias("_n"),
        t.alias("_t"),
        F.abs(u).alias("_au"),
    ).filter(F.col("_t") < F.col("_n"))  # U_N ≡ 0, not a candidate
    k = F.max("_au").over(wg)
    top = cur.withColumn("_k", k).filter(F.col("_au") == F.col("_k"))
    agg = top.groupBy(*groups).agg(
        F.max("_n").alias("n"),
        F.max("_k").alias("k_stat"),
        F.min("_t").alias("change_pos"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k_stat").cast("double")
    praw = F.lit(2.0) * F.exp(
        F.lit(-6.0) * kd * kd / (nd * nd * nd + nd * nd)
    )
    p = F.floor(
        F.least(praw, F.lit(1.0)) * F.lit(float(_PQ)) + F.lit(0.5)
    ) / F.lit(float(_PQ))
    ok = F.col("n") > 2
    return agg.select(
        *groups,
        "n",
        "k_stat",
        "change_pos",
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def pettitt_test_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`pettitt_test` (same integer tree)."""
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    gsel = ", ".join(groups)
    osel = ", ".join(order)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    nd = "CAST(n AS DOUBLE)"
    kd = "CAST(k_stat AS DOUBLE)"
    praw = f"(2.0 * EXP(-6.0 * {kd} * {kd} / ({nd}*{nd}*{nd} + {nd}*{nd})))"
    q9 = dlit(float(_PQ))
    p = f"(FLOOR(LEAST({praw}, 1.0) * {q9} + 0.5) / {q9})"
    return f"""
WITH d AS (
  SELECT {gsel}, {osel}, {qq} AS _q
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
ranked AS (
  SELECT {gsel}, {osel},
    2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _q)
      + CAST(COUNT(*) OVER (PARTITION BY {gsel} ORDER BY _q
          RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT) - 1 AS _r2
  FROM d
),
cur AS (
  SELECT {gsel},
    CAST(COUNT(*) OVER (PARTITION BY {gsel}) AS BIGINT) AS _n,
    CAST(ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY {osel}) AS BIGINT)
      AS _t,
    ABS(CAST(SUM(_r2) OVER (PARTITION BY {gsel} ORDER BY {osel})
        AS BIGINT)
      - CAST(ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY {osel})
          AS BIGINT)
        * (CAST(COUNT(*) OVER (PARTITION BY {gsel}) AS BIGINT) + 1)) AS _au
  FROM ranked
  QUALIFY _t < _n
),
top AS (
  SELECT * FROM (
    SELECT *, MAX(_au) OVER (PARTITION BY {gsel}) AS _k FROM cur
  ) WHERE _au = _k
),
agg AS (
  SELECT {gsel}, MAX(_n) AS n, MAX(_k) AS k_stat, MIN(_t) AS change_pos
  FROM top GROUP BY {gsel}
)
SELECT {gsel}, n, k_stat, change_pos,
  CASE WHEN n > 2 THEN {p} END AS p_value,
  CASE WHEN n > 2 THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Cox–Stuart trend test
# --------------------------------------------------------------------------


def cox_stuart(
    df: DataFrame,
    value_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> DataFrame:
    """Cox–Stuart sign trend test per group: pair each point in the
    first half with its counterpart one half-length later and count
    rises vs falls — the assumption-free trend screen (mann_kendall
    weighs EVERY pair, O(n²); Cox–Stuart is one pass over n/2 paired
    signs, the cheap first look):

        c = ⌈n/2⌉;  S⁺ = #{x_{i+c} > x_i},  S⁻ = #{x_{i+c} < x_i}
        z = sign(S⁺ − S⁻)·(|S⁺ − n'/2| − ½)/√(n'/4),  n' = S⁺ + S⁻

    Ties drop (standard).  The series assembles into one per-group
    position array (the sample_entropy plan shape) and the sign count
    is an engine-side aggregate over exact quantized integers; the
    only doubles are the closed-form z and the kernel p.

    Returns (groups…, n, n_rise, n_fall, z_stat, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    w = Window.partitionBy(*groups).orderBy(*[F.col(c) for c in order])
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *groups, F.row_number().over(w).alias("_p"), q.alias("_s")
    )
    grp = rows.groupBy(*groups).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("_p").alias("p"), F.col("_s").alias("s"))
                )
            ),
            lambda x: x["s"],
        ).alias("_arr"),
        F.count(F.lit(1)).alias("n"),
    )
    # shift c = ceil(n/2); pairs i = 1 .. floor(n/2)
    cnt = (
        "aggregate(sequence(1, CAST(n div 2 AS INT)), "
        "named_struct('up', 0L, 'dn', 0L), (acc, i) -> named_struct("
        "'up', acc.up + IF(element_at(_arr, CAST(i + (n - n div 2) AS INT))"
        " > element_at(_arr, CAST(i AS INT)), 1L, 0L), "
        "'dn', acc.dn + IF(element_at(_arr, CAST(i + (n - n div 2) AS INT))"
        " < element_at(_arr, CAST(i AS INT)), 1L, 0L)))"
    )
    counted = grp.select(
        *groups,
        "n",
        F.expr(
            f"CASE WHEN n >= 2 THEN {cnt} ELSE "
            "named_struct('up', 0L, 'dn', 0L) END"
        ).alias("_ud"),
    ).select(
        *groups,
        "n",
        F.col("_ud.up").alias("n_rise"),
        F.col("_ud.dn").alias("n_fall"),
    )
    np_ = (F.col("n_rise") + F.col("n_fall")).cast("double")
    sp = F.col("n_rise").cast("double")
    num = F.abs(sp - np_ / F.lit(2.0)) - F.lit(0.5)
    z = (
        F.signum(F.col("n_rise") - F.col("n_fall")).cast("double")
        * F.greatest(num, F.lit(0.0))
        / F.sqrt(np_ / F.lit(4.0))
    )
    p = two_sided_p_expr(z)
    ok = np_ > 0
    return counted.select(
        *groups,
        "n",
        "n_rise",
        "n_fall",
        F.when(ok, z).alias("z_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def cox_stuart_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`cox_stuart` (list-comprehension pair
    signs over the same quantized array)."""
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    gsel = ", ".join(groups)
    osel = ", ".join(order)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    up = (
        "CAST(len(list_filter([CAST(_arr[CAST(i + (n - n // 2) AS INT)]"
        " > _arr[CAST(i AS INT)] AS INT) FOR i IN range(1, n // 2 + 1)],"
        " x -> x = 1)) AS BIGINT)"
    )
    dn = (
        "CAST(len(list_filter([CAST(_arr[CAST(i + (n - n // 2) AS INT)]"
        " < _arr[CAST(i AS INT)] AS INT) FOR i IN range(1, n // 2 + 1)],"
        " x -> x = 1)) AS BIGINT)"
    )
    np_ = "CAST(n_rise + n_fall AS DOUBLE)"
    sp = "CAST(n_rise AS DOUBLE)"
    num = f"GREATEST(ABS({sp} - {np_} / 2.0) - 0.5, 0.0)"
    z = (
        f"(CAST(SIGN(n_rise - n_fall) AS DOUBLE) * {num}"
        f" / SQRT({np_} / 4.0))"
    )
    p = two_sided_p_sql(z)
    ok = "n_rise + n_fall > 0"
    return f"""
WITH grp AS (
  SELECT {gsel}, CAST(COUNT(*) AS BIGINT) AS n,
    list(_s ORDER BY {osel}) AS _arr
  FROM (
    SELECT {gsel}, {osel}, {qq} AS _s
    FROM ({data_sql}) WHERE {value_col} IS NOT NULL
  ) GROUP BY {gsel}
),
counted AS (
  SELECT {gsel}, n,
    CASE WHEN n >= 2 THEN {up} ELSE 0 END AS n_rise,
    CASE WHEN n >= 2 THEN {dn} ELSE 0 END AS n_fall
  FROM grp
)
SELECT {gsel}, n, n_rise, n_fall,
  CASE WHEN {ok} THEN {z} END AS z_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM counted
"""


# --------------------------------------------------------------------------
# two-sample Anderson–Darling (Scholz–Stephens k=2)
# --------------------------------------------------------------------------

# 5% critical value of the standardized k-sample AD statistic at
# m = k−1 = 1 (Scholz & Stephens 1987, Table 1 — public reference)
_AD_CRIT_05 = 1.960

# harmonic terms quantize 1/i to integer units of 1e15 so every
# cross-i sum is EXACT integer arithmetic (order-free in any engine)
_HQ = 10**15
# per-value A² terms and the g double-sum quantize at 1e-9 before
# their DECIMAL reduce (the one-transcendental-rule discipline,
# applied here to division results)
_ADQ = 10**9


def ad_test(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Two-sample Anderson–Darling test per group — the tail-weighted
    member of the ECDF family (ks_test: largest gap; cvm_test: sum of
    squared gaps; AD: squared gaps weighted by 1/(F(1−F)), which blows
    up in the TAILS — the test to reach for when distributional drift
    hides in extremes).  Scholz–Stephens k-sample form at k = 2
    (discrete/ties version, their eq. 6), using the same exact-integer
    gap as cvm_test (d_v = cum_a·n_b − cum_b·n_a):

        A² = (1/n_a + 1/n_b)/N · Σ_{v: B_v<N} t_v·d_v² / (B_v(N−B_v))
        T  = (A² − 1) / σ_N,    reject at T ≥ 1.960 (5%, m = 1)

    σ_N is the exact Scholz–Stephens variance (their eq. 4), whose
    harmonic ingredients h = Σ_{i<N} 1/i and the double sum
    g = Σ_{i<j<N} 1/((N−i)j) are computed from 1e15-quantized integer
    reciprocals, so both engines sum EXACT integers (g's outer fold
    runs over an exploded per-group index — one extra N-row frame, not
    N², thanks to g = Σ_i (h_{N−1} − h_i)/(N−i) with h_x the integer
    harmonic prefix).

    Plan: the cvm_test count-collapse + one window, plus the harmonic
    frame (sequence explode on the already-collapsed group row).  All
    cross-row sums are exact integers; per-term divisions quantize at
    1e-9 before their DECIMAL reduce.

    Returns (groups…, n_a, n_b, a2_stat, sigma_n, t_stat, reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = F.col(factor_col)
    d = df.filter(
        F.col(value_col).isNotNull() & lvl.isin([level_a, level_b])
    ).select(*groups, q.alias("_q"), (lvl == level_a).alias("_ia"))
    per = d.groupBy(*groups, "_q").agg(
        F.sum(F.col("_ia").cast("bigint")).alias("_ca"),
        F.sum((~F.col("_ia")).cast("bigint")).alias("_cb"),
    )
    w = Window.partitionBy(*groups).orderBy("_q")
    wg = Window.partitionBy(*groups)
    cum = per.select(
        *groups,
        (F.col("_ca") + F.col("_cb")).alias("_tv"),
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"),
        F.sum("_ca").over(wg).alias("_na"),
        F.sum("_cb").over(wg).alias("_nb"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dec19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    nn = F.col("_na") + F.col("_nb")
    bv = F.col("_cuma") + F.col("_cumb")
    dv = F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na")
    # exact integer numerator t·d², VARCHAR-routed to double (>2^53
    # safe), one division per distinct value, 1e-9-quantized
    num = (dec19(F.col("_tv")) * dec19(dv) * dec19(dv)).cast("string").cast(
        "double"
    )
    term = num / (bv * (nn - bv)).cast("double")
    tq = F.floor(term * F.lit(float(_ADQ)) + F.lit(0.5)).cast("decimal(38,0)")
    agg = cum.filter(bv < nn).groupBy(*groups).agg(
        F.sum(tq).alias("_s"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
    )
    # --- σ_N from integer-harmonic h and g over an exploded index ---
    # base feeds BOTH the harmonic frame and the final join: pin() the
    # one-row-per-group frame or the count-collapse + window upstream
    # runs twice (the decompose_series fork lesson)
    from timeseriesutils_spark.functions.cache import pin

    hterm = "CAST(FLOOR(1e15 / CAST(i AS DOUBLE) + 0.5) AS BIGINT)"
    base = pin(
        agg.select(
            *groups, "n_a", "n_b", "_s",
            (F.col("n_a") + F.col("n_b")).alias("_n"),
        )
    )
    # _n >= 2 guard (round-10 ADVICE): Spark sequence(1, 0) DESCENDS to
    # [1, 0] — an i=0 harmonic row (1e15/0 = Inf) — while DuckDB's
    # range(1, 1) is empty.  CASE-gate to NULL so explode drops the
    # degenerate group in Spark exactly as the empty range + inner
    # join drops it in the twin.  (Unreachable through the bv < nn
    # filter for grouped data, but the operator is public API.)
    idx = base.select(
        *groups, "_n",
        F.explode(F.expr(
            "CASE WHEN _n >= 2 THEN sequence(1, CAST(_n - 1 AS INT)) END"
        )).alias("_i"),
    ).select(*groups, "_n", "_i", F.expr(hterm.replace("i", "_i")).alias("_hq"))
    wi = Window.partitionBy(*groups).orderBy("_i")
    pref = idx.select(
        *groups, "_n", "_i", "_hq",
        F.sum("_hq").over(wi).alias("_hpre"),
    )
    # g term at i ∈ 1..N−2: (h_{N−1} − h_i)/(N − i), 1e-9-quantized
    wgg = Window.partitionBy(*groups)
    gterm = (
        (F.max("_hpre").over(wgg) - F.col("_hpre")).cast("double")
        / F.lit(float(_HQ))
        / (F.col("_n") - F.col("_i")).cast("double")
    )
    gq = F.floor(gterm * F.lit(float(_ADQ)) + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    harm = pref.select(
        *groups, "_hq",
        F.when(F.col("_i") <= F.col("_n") - 2, gq).alias("_gq"),
    ).groupBy(*groups).agg(
        F.sum(dec(F.col("_hq"))).alias("_hsum"),
        F.sum("_gq").alias("_gsum"),
    )
    j = base.join(harm, on=groups, how="inner")
    h_ = F.col("_hsum").cast("string").cast("double") / F.lit(float(_HQ))
    g_ = F.col("_gsum").cast("string").cast("double") / F.lit(float(_ADQ))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nd = F.col("_n").cast("double")
    hh = F.lit(1.0) / na + F.lit(1.0) / nb
    k = F.lit(2.0)
    a_ = (F.lit(4.0) * g_ - F.lit(6.0)) * (k - 1) + (
        F.lit(10.0) - F.lit(6.0) * g_
    ) * hh
    b_ = (
        (F.lit(2.0) * g_ - F.lit(4.0)) * k * k
        + F.lit(8.0) * h_ * k
        + (F.lit(2.0) * g_ - F.lit(14.0) * h_ - F.lit(4.0)) * hh
        - F.lit(8.0) * h_
        + F.lit(4.0) * g_
        - F.lit(6.0)
    )
    c_ = (
        (F.lit(6.0) * h_ + F.lit(2.0) * g_ - F.lit(2.0)) * k * k
        + (F.lit(4.0) * h_ - F.lit(4.0) * g_ + F.lit(6.0)) * k
        + (F.lit(2.0) * h_ - F.lit(6.0)) * hh
        + F.lit(4.0) * h_
    )
    d2_ = (F.lit(2.0) * h_ + F.lit(6.0)) * k * k - F.lit(4.0) * h_ * k
    var = (
        a_ * nd * nd * nd + b_ * nd * nd + c_ * nd + d2_
    ) / ((nd - 1) * (nd - 2) * (nd - 3))
    a2v = (
        F.col("_s").cast("string").cast("double") / F.lit(float(_ADQ))
        * hh / nd
    )
    sig = F.sqrt(var)
    t = (a2v - F.lit(1.0)) / sig
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (F.col("_n") > 3) & (
        var > 0
    )
    return j.select(
        *groups,
        "n_a",
        "n_b",
        F.when(ok, a2v).alias("a2_stat"),
        F.when(ok, sig).alias("sigma_n"),
        F.when(ok, t).alias("t_stat"),
        F.when(ok, t >= F.lit(_AD_CRIT_05)).alias("reject_05"),
    )


def ad_test_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`ad_test` (same exact-integer gaps, same
    quantized harmonic frame, same variance tree)."""
    from timeseriesutils_spark.functions.exact import dlit, sq

    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    adq = dlit(float(_ADQ))
    num = (
        "CAST(CAST(_tv AS DECIMAL(19,0)) * CAST(_dv AS DECIMAL(19,0))"
        " * CAST(_dv AS DECIMAL(19,0)) AS VARCHAR)"
    )
    term = f"(CAST({num} AS DOUBLE) / CAST(_bv * (_nn - _bv) AS DOUBLE))"
    hterm = "CAST(FLOOR(1e15 / CAST(i AS DOUBLE) + 0.5) AS BIGINT)"
    gterm = (
        f"((CAST(_hmax - _hpre AS DOUBLE) / {dlit(float(_HQ))})"
        " / CAST(_n - _i AS DOUBLE))"
    )
    hh = "(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))"
    nd = "CAST(_n AS DOUBLE)"
    a2 = f"({s2d('_s')} / {adq} * {hh} / {nd})"
    h_ = f"({s2d('_hsum')} / {dlit(float(_HQ))})"
    g_ = f"({s2d('_gsum')} / {adq})"
    a_ = f"((4.0 * {g_} - 6.0) * 1.0 + (10.0 - 6.0 * {g_}) * {hh})"
    b_ = (
        f"((2.0 * {g_} - 4.0) * 4.0 + 8.0 * {h_} * 2.0"
        f" + (2.0 * {g_} - 14.0 * {h_} - 4.0) * {hh}"
        f" - 8.0 * {h_} + 4.0 * {g_} - 6.0)"
    )
    c_ = (
        f"((6.0 * {h_} + 2.0 * {g_} - 2.0) * 4.0"
        f" + (4.0 * {h_} - 4.0 * {g_} + 6.0) * 2.0"
        f" + (2.0 * {h_} - 6.0) * {hh} + 4.0 * {h_})"
    )
    d2_ = f"((2.0 * {h_} + 6.0) * 4.0 - 4.0 * {h_} * 2.0)"
    var = (
        f"(({a_} * {nd} * {nd} * {nd} + {b_} * {nd} * {nd}"
        f" + {c_} * {nd} + {d2_})"
        f" / (({nd} - 1.0) * ({nd} - 2.0) * ({nd} - 3.0)))"
    )
    sig = f"SQRT({var})"
    t = f"(({a2} - 1.0) / {sig})"
    ok = f"(n_a > 0 AND n_b > 0 AND _n > 3 AND {var} > 0)"
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q, ({factor_col} = {sq(level_a)}) AS _ia
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL
    AND {factor_col} IN ({sq(level_a)}, {sq(level_b)})
),
per AS (
  SELECT {gsel}, _q,
    CAST(SUM(CASE WHEN _ia THEN 1 ELSE 0 END) AS BIGINT) AS _ca,
    CAST(SUM(CASE WHEN _ia THEN 0 ELSE 1 END) AS BIGINT) AS _cb
  FROM d GROUP BY {gsel}, _q
),
cum AS (
  SELECT {gsel}, _ca + _cb AS _tv,
    CAST(SUM(_ca) OVER (PARTITION BY {gsel} ORDER BY _q) AS BIGINT) AS _cuma,
    CAST(SUM(_cb) OVER (PARTITION BY {gsel} ORDER BY _q) AS BIGINT) AS _cumb,
    CAST(SUM(_ca) OVER (PARTITION BY {gsel}) AS BIGINT) AS _na,
    CAST(SUM(_cb) OVER (PARTITION BY {gsel}) AS BIGINT) AS _nb
  FROM per
),
gap AS (
  SELECT {gsel}, _tv, _na, _nb, _na + _nb AS _nn,
    _cuma + _cumb AS _bv,
    _cuma * _nb - _cumb * _na AS _dv
  FROM cum
),
agg AS (
  SELECT {gsel},
    SUM(CAST(FLOOR({term} * {adq} + 0.5) AS DECIMAL(38,0))) AS _s,
    MAX(_na) AS n_a, MAX(_nb) AS n_b, MAX(_na) + MAX(_nb) AS _n
  FROM gap WHERE _bv < _nn GROUP BY {gsel}
),
idx AS (
  SELECT {gsel}, _n, UNNEST(range(1, CAST(_n AS INT))) AS _i
  FROM agg
),
pref AS (
  SELECT {gsel}, _n, _i,
    {hterm.replace('i', '_i')} AS _hq,
    CAST(SUM({hterm.replace('i', '_i')})
      OVER (PARTITION BY {gsel} ORDER BY _i) AS BIGINT) AS _hpre
  FROM idx
),
harm AS (
  SELECT {gsel},
    SUM(CAST(_hq AS DECIMAL(38,0))) AS _hsum,
    SUM(CASE WHEN _i <= _n - 2 THEN
      CAST(FLOOR({gterm} * {adq} + 0.5) AS DECIMAL(38,0)) END) AS _gsum
  FROM (
    SELECT *, MAX(_hpre) OVER (PARTITION BY {gsel}) AS _hmax FROM pref
  ) GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN {ok} THEN {a2} END AS a2_stat,
  CASE WHEN {ok} THEN {sig} END AS sigma_n,
  CASE WHEN {ok} THEN {t} END AS t_stat,
  CASE WHEN {ok} THEN {t} >= {dlit(_AD_CRIT_05)} END AS reject_05
FROM agg JOIN harm USING ({gsel})
"""


def emd_1d(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Two-sample 1-D earth mover's (Wasserstein-1) distance per group
    — the member of the ECDF family that reports distributional drift
    in the VALUE'S OWN UNITS (ks_test: largest gap, unitless;
    cvm/ad_test: squared-gap statistics; EMD: the literal area between
    the ECDFs, i.e. the average distance probability mass must move —
    the number a drift dashboard can threshold in dollars or
    milliseconds):

        EMD = ∫ |F_a(v) − F_b(v)| dv
            = Σ_v |cum_a·n_b − cum_b·n_a| · Δv / (n_a·n_b)

    Exact-integer core (the cvm_test collapse): values quantize to
    10^-scale ints, the gap d_v = cum_a·n_b − cum_b·n_a and the bin
    width Δv are exact int64, each |d_v|·Δv term is int64, and the
    cross-value sum runs in DECIMAL(38,0) (merge-order-free) before
    ONE final double division.  One count collapse + one window.

    Returns (groups…, n_a, n_b, emd).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = F.col(factor_col)
    d = df.filter(
        F.col(value_col).isNotNull() & lvl.isin([level_a, level_b])
    ).select(*groups, q.alias("_q"), (lvl == level_a).alias("_ia"))
    per = d.groupBy(*groups, "_q").agg(
        F.sum(F.col("_ia").cast("bigint")).alias("_ca"),
        F.sum((~F.col("_ia")).cast("bigint")).alias("_cb"),
    )
    w = Window.partitionBy(*groups).orderBy("_q")
    wg = Window.partitionBy(*groups)
    cum = per.select(
        *groups,
        "_q",
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"),
        F.sum("_ca").over(wg).alias("_na"),
        F.sum("_cb").over(wg).alias("_nb"),
        (F.coalesce(F.lead("_q").over(w), F.col("_q")) - F.col("_q")).alias(
            "_dv"
        ),
    )
    dv = F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na")
    term = (F.abs(dv) * F.col("_dv")).cast("decimal(38,0)")
    agg = cum.groupBy(*groups).agg(
        F.sum(term).alias("_s"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
    )
    denom = (
        (F.col("n_a") * F.col("n_b")).cast("double") * F.lit(float(m))
    )
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        F.when(
            ok, F.col("_s").cast("string").cast("double") / denom
        ).alias("emd"),
    )


def emd_1d_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`emd_1d` (same exact-integer gaps, widths,
    and DECIMAL sum)."""
    from timeseriesutils_spark.functions.exact import dlit, sq

    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q, ({factor_col} = {sq(level_a)}) AS _ia
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL
    AND {factor_col} IN ({sq(level_a)}, {sq(level_b)})
),
per AS (
  SELECT {gsel}, _q,
    CAST(SUM(CAST(_ia AS BIGINT)) AS BIGINT) AS _ca,
    CAST(SUM(CAST(NOT _ia AS BIGINT)) AS BIGINT) AS _cb
  FROM d GROUP BY {gsel}, _q
),
cum AS (
  SELECT {gsel}, _q,
    CAST(SUM(_ca) OVER w AS BIGINT) AS _cuma,
    CAST(SUM(_cb) OVER w AS BIGINT) AS _cumb,
    CAST(SUM(_ca) OVER wg AS BIGINT) AS _na,
    CAST(SUM(_cb) OVER wg AS BIGINT) AS _nb,
    COALESCE(LEAD(_q) OVER w, _q) - _q AS _dv
  FROM per
  WINDOW w AS (PARTITION BY {gsel} ORDER BY _q),
         wg AS (PARTITION BY {gsel})
),
agg AS (
  SELECT {gsel},
    SUM(CAST(abs(_cuma * _nb - _cumb * _na) * _dv AS DECIMAL(38,0))) AS _s,
    MAX(_na) AS n_a, MAX(_nb) AS n_b
  FROM cum GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN n_a > 0 AND n_b > 0 THEN
    CAST(CAST(_s AS VARCHAR) AS DOUBLE)
      / (CAST(n_a * n_b AS DOUBLE) * {dlit(float(m))})
  END AS emd
FROM agg
"""


def mood_median_test(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Mood's median test per group — the blunt-but-assumption-free
    member of the two-sample location family (mann_whitney needs
    comparable shapes to read as a location test; Mood's only asks
    "does each sample straddle the POOLED median the same way?", which
    survives wild outliers and censoring at the cost of power):

        M = pooled lower median;  2×2 table of (sample × above/≤ M);
        χ² = N(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)),  p via χ²₁

    Exact path: quantized-value count collapse (the ks/cvm frame), the
    pooled median as the smallest value with 2·cum ≥ N (exact integer
    rule, no interpolation — the classic discrete contract), exact
    int64 cell counts, one double χ² tree, Wilson–Hilferty p (the
    chi2_sf kernel, quantized).

    Returns (groups…, n_a, n_b, median, a_above, b_above, chi2,
    p_value, reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = F.col(factor_col)
    d = df.filter(
        F.col(value_col).isNotNull() & lvl.isin([level_a, level_b])
    ).select(*groups, q.alias("_q"), (lvl == level_a).alias("_ia"))
    per = d.groupBy(*groups, "_q").agg(
        F.sum(F.col("_ia").cast("bigint")).alias("_ca"),
        F.sum((~F.col("_ia")).cast("bigint")).alias("_cb"),
    )
    w = Window.partitionBy(*groups).orderBy("_q")
    wg = Window.partitionBy(*groups)
    cum = per.select(
        *groups, "_q", "_ca", "_cb",
        (F.sum("_ca").over(w) + F.sum("_cb").over(w)).alias("_cum"),
        (F.sum("_ca").over(wg) + F.sum("_cb").over(wg)).alias("_nn"),
    )
    med = cum.filter(F.lit(2) * F.col("_cum") >= F.col("_nn")).groupBy(
        *groups
    ).agg(F.min("_q").alias("_med"))
    j = per.join(med, on=groups)
    agg = j.groupBy(*groups).agg(
        F.sum("_ca").alias("n_a"),
        F.sum("_cb").alias("n_b"),
        F.max("_med").alias("_medq"),
        F.sum(F.when(F.col("_q") > F.col("_med"), F.col("_ca")).otherwise(
            F.lit(0))).alias("a_above"),
        F.sum(F.when(F.col("_q") > F.col("_med"), F.col("_cb")).otherwise(
            F.lit(0))).alias("b_above"),
    )
    a = F.col("a_above").cast("double")
    b = (F.col("n_a") - F.col("a_above")).cast("double")
    c = F.col("b_above").cast("double")
    dd = (F.col("n_b") - F.col("b_above")).cast("double")
    nn = (F.col("n_a") + F.col("n_b")).cast("double")
    denom = (a + b) * (c + dd) * (a + c) * (b + dd)
    chi2 = F.when(
        denom > 0, nn * (a * dd - b * c) * (a * dd - b * c) / denom
    )
    p = chi2_sf_expr(chi2, F.lit(1.0))
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        (F.col("_medq").cast("double") / F.lit(float(m))).alias("median"),
        "a_above",
        "b_above",
        chi2.alias("chi2"),
        p.alias("p_value"),
        (p < F.lit(0.05)).alias("reject_05"),
    )


def mood_median_test_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`mood_median_test` (same integer median
    rule, same χ² tree, same WH p kernel)."""
    from timeseriesutils_spark.functions.exact import sq

    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    a = "CAST(a_above AS DOUBLE)"
    b = "CAST(n_a - a_above AS DOUBLE)"
    c = "CAST(b_above AS DOUBLE)"
    dd = "CAST(n_b - b_above AS DOUBLE)"
    nn = "CAST(n_a + n_b AS DOUBLE)"
    denom = f"(({a} + {b}) * ({c} + {dd}) * ({a} + {c}) * ({b} + {dd}))"
    chi2 = (
        f"(CASE WHEN {denom} > 0 THEN {nn} * ({a} * {dd} - {b} * {c})"
        f" * ({a} * {dd} - {b} * {c}) / {denom} END)"
    )
    p = chi2_sf_sql(chi2, "1.0")
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q, ({factor_col} = {sq(level_a)}) AS _ia
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL
    AND {factor_col} IN ({sq(level_a)}, {sq(level_b)})
),
per AS (
  SELECT {gsel}, _q,
    CAST(SUM(CAST(_ia AS BIGINT)) AS BIGINT) AS _ca,
    CAST(SUM(CAST(NOT _ia AS BIGINT)) AS BIGINT) AS _cb
  FROM d GROUP BY {gsel}, _q
),
cum AS (
  SELECT {gsel}, _q, _ca, _cb,
    CAST(SUM(_ca + _cb) OVER w AS BIGINT) AS _cum,
    CAST(SUM(_ca + _cb) OVER wg AS BIGINT) AS _nn
  FROM per
  WINDOW w AS (PARTITION BY {gsel} ORDER BY _q
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
   wg AS (PARTITION BY {gsel})
),
med AS (
  SELECT {gsel}, MIN(_q) AS _med FROM cum
  WHERE 2 * _cum >= _nn GROUP BY {gsel}
),
agg AS (
  SELECT {', '.join('per.' + g for g in groups)},
    CAST(SUM(_ca) AS BIGINT) AS n_a,
    CAST(SUM(_cb) AS BIGINT) AS n_b,
    MAX(_med) AS _medq,
    CAST(SUM(CASE WHEN _q > _med THEN _ca ELSE 0 END) AS BIGINT)
      AS a_above,
    CAST(SUM(CASE WHEN _q > _med THEN _cb ELSE 0 END) AS BIGINT)
      AS b_above
  FROM per JOIN med USING ({gsel})
  GROUP BY {', '.join('per.' + g for g in groups)}
)
SELECT {gsel}, n_a, n_b,
  CAST(_medq AS DOUBLE) / {float(m)!r} AS median,
  a_above, b_above,
  {chi2} AS chi2,
  {p} AS p_value,
  ({p} < 0.05) AS reject_05
FROM agg
"""


def cliffs_delta(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Cliff's delta ordinal effect size per group — the
    distribution-free companion of cohens_d (d assumes comparable
    spreads; δ only counts order):

        δ = (#{a > b} − #{a < b}) / (n_a·n_b) ∈ [−1, 1]

    with the conventional |δ| bands 0.147/0.33/0.474 =
    negligible/small/medium/large (Romano 2006).  Computed EXACTLY
    from the ks/cvm count collapse — #{a>b} = Σ_v ca_v·cum_b(v⁻) via
    one cumulative window, never an O(n²) pair join; all counts and
    the big products are exact integers through DECIMAL.

    Returns (groups…, n_a, n_b, n_gt, n_lt, delta, magnitude).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = F.col(factor_col)
    d = df.filter(
        F.col(value_col).isNotNull() & lvl.isin([level_a, level_b])
    ).select(*groups, q.alias("_q"), (lvl == level_a).alias("_ia"))
    per = d.groupBy(*groups, "_q").agg(
        F.sum(F.col("_ia").cast("bigint")).alias("_ca"),
        F.sum((~F.col("_ia")).cast("bigint")).alias("_cb"),
    )
    w = Window.partitionBy(*groups).orderBy("_q")
    wg = Window.partitionBy(*groups)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cum = per.select(
        *groups, "_ca", "_cb",
        (F.sum("_cb").over(w) - F.col("_cb")).alias("_bless"),
        (F.sum("_cb").over(wg) - F.sum("_cb").over(w)).alias("_bmore"),
    )
    agg = cum.groupBy(*groups).agg(
        F.sum("_ca").alias("n_a"),
        F.sum("_cb").alias("n_b"),
        F.sum(dec(F.col("_ca") * F.col("_bless"))).alias("_gt"),
        F.sum(dec(F.col("_ca") * F.col("_bmore"))).alias("_lt"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    denom = (F.col("n_a") * F.col("n_b")).cast("double")
    delta = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        (s2d("_gt") - s2d("_lt")) / denom,
    )
    mag = (
        F.when(delta.isNull(), F.lit(None).cast("string"))
        .when(F.abs(delta) < 0.147, F.lit("negligible"))
        .when(F.abs(delta) < 0.33, F.lit("small"))
        .when(F.abs(delta) < 0.474, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        F.col("_gt").cast("bigint").alias("n_gt"),
        F.col("_lt").cast("bigint").alias("n_lt"),
        delta.alias("delta"),
        mag.alias("magnitude"),
    )


def cliffs_delta_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`cliffs_delta` (same collapse, same
    integer products)."""
    from timeseriesutils_spark.functions.exact import sq

    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    delta = (f"(CASE WHEN n_a > 0 AND n_b > 0 THEN"
             f" ({s2d('_gt')} - {s2d('_lt')})"
             f" / CAST(n_a * n_b AS DOUBLE) END)")
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q, ({factor_col} = {sq(level_a)}) AS _ia
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL
    AND {factor_col} IN ({sq(level_a)}, {sq(level_b)})
),
per AS (
  SELECT {gsel}, _q,
    CAST(SUM(CAST(_ia AS BIGINT)) AS BIGINT) AS _ca,
    CAST(SUM(CAST(NOT _ia AS BIGINT)) AS BIGINT) AS _cb
  FROM d GROUP BY {gsel}, _q
),
cum AS (
  SELECT {gsel}, _ca, _cb,
    CAST(SUM(_cb) OVER w - _cb AS BIGINT) AS _bless,
    CAST(SUM(_cb) OVER wg - SUM(_cb) OVER w AS BIGINT) AS _bmore
  FROM per
  WINDOW w AS (PARTITION BY {gsel} ORDER BY _q
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
   wg AS (PARTITION BY {gsel})
),
agg AS (
  SELECT {gsel},
    CAST(SUM(_ca) AS BIGINT) AS n_a,
    CAST(SUM(_cb) AS BIGINT) AS n_b,
    CAST(SUM(CAST(_ca * _bless AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS _gt,
    CAST(SUM(CAST(_ca * _bmore AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS _lt
  FROM cum GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CAST(_gt AS BIGINT) AS n_gt,
  CAST(_lt AS BIGINT) AS n_lt,
  {delta} AS delta,
  CASE WHEN {delta} IS NULL THEN CAST(NULL AS VARCHAR)
    WHEN ABS({delta}) < 0.147 THEN 'negligible'
    WHEN ABS({delta}) < 0.33 THEN 'small'
    WHEN ABS({delta}) < 0.474 THEN 'medium'
    ELSE 'large' END AS magnitude
FROM agg
"""


def hodges_lehmann(
    df: DataFrame,
    value_col: str,
    group_columns,
    scale: int = 2,
    engine: str = "expr",
) -> DataFrame:
    """Per-group one-sample Hodges–Lehmann estimator (1963): the
    median of the n(n+1)/2 Walsh averages (x_i + x_j)/2, i ≤ j — the
    location estimate the Wilcoxon signed-rank test inverts: ~86%
    Gaussian efficiency WITH a 29% breakdown point, the standard
    robust center when a trimmed mean's α is arbitrary.

    Exact: quantized int64 values → integer Walsh SUMS (array
    comprehension over the sorted collect, n(n+1)/2 ints) → exact
    sorted median via the shared quantile_cont lerp → one final /2m
    division.  O(n²) memory per group — the same verify-tier envelope
    as kendall's pair join (n ≈ series length, thousands at most; a
    monster-group HL needs the O(n log n) selection algorithm,
    documented swap).

    ``engine``: ``'expr'`` (default, the declared hash-green mode —
    pure expressions, interpreted HOF comprehension) or ``'arrow'``
    (numpy broadcast Walsh + the same lerp median per Arrow group —
    bit-identical on the exact integers, ~5× faster on thousand-group
    frames; benched as ``hodges_lehmann_prod``).

    Returns (groups…, n, hl_estimate).
    """
    from timeseriesutils_spark.operators.stats import _qcont

    groups = _as_list(group_columns)
    m = 10**scale
    if engine == "arrow":
        return _hodges_lehmann_arrow(df, value_col, groups, m)
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    arr = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, q.alias("_q"))
        .groupBy(*groups)
        .agg(F.sort_array(F.collect_list("_q")).alias("_a"))
    )
    a = F.col("_a")
    n = F.size(a)
    walsh = F.sort_array(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.transform(
                    F.sequence(i, n),
                    lambda j: F.element_at(a, i.cast("int"))
                    + F.element_at(a, j.cast("int")),
                ),
            )
        )
    )
    wn = F.size(walsh)
    med = _qcont(walsh, wn, 0.5)
    hl = med / F.lit(2.0 * m)
    return arr.select(
        *groups,
        n.cast("bigint").alias("n"),
        F.when(n > 0, hl).alias("hl_estimate"),
    )


def hodges_lehmann_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`hodges_lehmann` (same Walsh comprehension,
    same lerp median)."""
    from timeseriesutils_spark.operators.stats import _qcont_sql

    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    med = _qcont_sql("_w", "len(_w)", 0.5)
    return f"""
WITH arr AS (
  SELECT {gsel}, list_sort(list({qq})) AS _a
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL GROUP BY {gsel}
),
w AS (
  SELECT {gsel}, len(_a) AS n,
    list_sort(flatten([[_a[i] + _a[j] FOR j IN range(i, len(_a) + 1)]
                       FOR i IN range(1, len(_a) + 1)])) AS _w
  FROM arr
)
SELECT {gsel}, CAST(n AS BIGINT) AS n,
  CASE WHEN n > 0 THEN {med} / {float(2 * m)!r} END AS hl_estimate
FROM w
"""


def jonckheere_terpstra(
    df: DataFrame,
    value_col: str,
    level_col: str,
    levels: list,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Jonckheere–Terpstra ordered-alternative trend test
    (Jonckheere 1954, Terpstra 1952; Hollander & Wolfe variance with
    ties): does ``value_col`` INCREASE across the ordered ``levels`` of
    ``level_col``?  The a-priori-ordered replacement for
    kruskal–wallis — pooling every upward pairwise Mann–Whitney count:

        U = Σ_{g<h} Σ (1[x_g < x_h] + ½·1[x_g = x_h])

    Exactness: rows collapse to per-(group, quantized value) level
    counts; ONE cumulative window (ROWS … 1 PRECEDING over the
    distinct-value frame) yields every below-value count; U is summed
    in DOUBLED integer units (2U = Σ c_h(2·cum_g + c_g), no halves);
    the tie-corrected null mean/variance are exact integer sums of
    n_k- and tie-multiplicity polynomials (int64-safe to ~3e5 rows per
    group; swap the cubic sums to DECIMAL beyond — documented), and z
    /p are one shared double tree + the engine's logistic normal
    kernel.

    Returns (groups…, n, u_stat2 (=2U), z_stat, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    g_n = len(levels)
    if g_n < 2:
        raise ValueError("jonckheere_terpstra needs >= 2 ordered levels")
    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = None
    for k, name in enumerate(levels):
        cond = F.col(level_col) == F.lit(name)
        lvl = F.when(cond, k + 1) if lvl is None else lvl.when(cond, k + 1)
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, lvl.alias("_k"), qv.alias("_qv"))
        .filter(F.col("_k").isNotNull())
    )
    cnt = d.groupBy(*groups, "_qv").agg(
        *[
            F.sum(F.when(F.col("_k") == k + 1, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_c{k + 1}")
            for k in range(g_n)
        ]
    )
    w = (
        Window.partitionBy(*groups)
        .orderBy("_qv")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = cnt.select(
        *groups,
        "_qv",
        *[F.col(f"_c{k + 1}") for k in range(g_n)],
        *[
            F.coalesce(F.sum(f"_c{k + 1}").over(w), F.lit(0).cast("bigint"))
            .alias(f"_m{k + 1}")
            for k in range(g_n)
        ],
    )
    u2_row = None
    for gk in range(1, g_n + 1):
        for h in range(gk + 1, g_n + 1):
            term = F.col(f"_c{h}") * (
                F.lit(2) * F.col(f"_m{gk}") + F.col(f"_c{gk}")
            )
            u2_row = term if u2_row is None else u2_row + term
    t = None
    for k in range(g_n):
        c = F.col(f"_c{k + 1}")
        t = c if t is None else t + c
    tie1 = t * (t - 1)
    agg = cum.select(*groups, u2_row.alias("_u2r"), t.alias("_t"),
                     *[F.col(f"_c{k + 1}") for k in range(g_n)]).groupBy(
        *groups
    ).agg(
        F.sum("_u2r").alias("_u2"),
        F.sum("_t").alias("n"),
        *[F.sum(f"_c{k + 1}").alias(f"_n{k + 1}") for k in range(g_n)],
        F.sum(F.col("_t") * (F.col("_t") - 1)).alias("_t1"),
        F.sum(
            F.col("_t") * (F.col("_t") - 1) * (F.col("_t") - 2)
        ).alias("_t2"),
        F.sum(
            F.col("_t") * (F.col("_t") - 1) * (F.lit(2) * F.col("_t") + 5)
        ).alias("_t3"),
    )
    nn = F.col("n").cast("double")
    sum_nk2 = None
    a_lvl = None  # Σ n_k(n_k−1)(2n_k+5)
    b_lvl = None  # Σ n_k(n_k−1)(n_k−2)
    c_lvl = None  # Σ n_k(n_k−1)
    for k in range(g_n):
        nk = F.col(f"_n{k + 1}")
        nk2 = nk * nk
        sum_nk2 = nk2 if sum_nk2 is None else sum_nk2 + nk2
        av = nk * (nk - 1) * (F.lit(2) * nk + 5)
        bv = nk * (nk - 1) * (nk - 2)
        cv = nk * (nk - 1)
        a_lvl = av if a_lvl is None else a_lvl + av
        b_lvl = bv if b_lvl is None else b_lvl + bv
        c_lvl = cv if c_lvl is None else c_lvl + cv
    n_big = F.col("n")
    a_all = n_big * (n_big - 1) * (F.lit(2) * n_big + 5)
    mean2 = (nn * nn - sum_nk2.cast("double")) / F.lit(2.0)
    term1 = (
        a_all.cast("double") - a_lvl.cast("double")
        - F.col("_t3").cast("double")
    ) / F.lit(72.0)
    term2 = (
        b_lvl.cast("double") * F.col("_t2").cast("double")
        / (F.lit(36.0) * nn * (nn - 1.0) * (nn - 2.0))
    )
    term3 = (
        c_lvl.cast("double") * F.col("_t1").cast("double")
        / (F.lit(8.0) * nn * (nn - 1.0))
    )
    var = term1 + term2 + term3
    z = (F.col("_u2").cast("double") - mean2) / (
        F.lit(2.0) * F.sqrt(var)
    )
    p = two_sided_p_expr(z)
    ok = (F.col("n") > 2) & (var > 0)
    return agg.select(
        *groups,
        "n",
        F.col("_u2").alias("u_stat2"),
        F.when(ok, z).alias("z_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def jonckheere_terpstra_sql(
    data_sql: str,
    value_col: str,
    level_col: str,
    levels: list,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`jonckheere_terpstra` (same doubled-U
    window chain, same tie-polynomial sums, same z/p tree)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    g_n = len(levels)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    lvl = "CASE " + " ".join(
        f"WHEN {level_col} = {name!r} THEN {k + 1}"
        if isinstance(name, str)
        else f"WHEN {level_col} = {name} THEN {k + 1}"
        for k, name in enumerate(levels)
    ) + " END"
    csel = ",\n    ".join(
        f"CAST(SUM(CASE WHEN _k = {k + 1} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS _c{k + 1}"
        for k in range(g_n)
    )
    over = (
        f"(PARTITION BY {gsel} ORDER BY _qv"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    msel = ",\n    ".join(
        f"COALESCE(CAST(SUM(_c{k + 1}) OVER {over} AS BIGINT), 0) AS _m{k + 1}"
        for k in range(g_n)
    )
    u2 = " + ".join(
        f"_c{h} * (2 * _m{gk} + _c{gk})"
        for gk in range(1, g_n + 1)
        for h in range(gk + 1, g_n + 1)
    )
    t = " + ".join(f"_c{k + 1}" for k in range(g_n))
    nsel = ",\n    ".join(
        f"CAST(SUM(_c{k + 1}) AS BIGINT) AS _n{k + 1}" for k in range(g_n)
    )
    nn = "CAST(n AS DOUBLE)"
    sum_nk2 = " + ".join(f"_n{k + 1} * _n{k + 1}" for k in range(g_n))
    a_lvl = " + ".join(
        f"_n{k + 1} * (_n{k + 1} - 1) * (2 * _n{k + 1} + 5)"
        for k in range(g_n)
    )
    b_lvl = " + ".join(
        f"_n{k + 1} * (_n{k + 1} - 1) * (_n{k + 1} - 2)" for k in range(g_n)
    )
    c_lvl = " + ".join(
        f"_n{k + 1} * (_n{k + 1} - 1)" for k in range(g_n)
    )
    mean2 = f"(({nn} * {nn} - CAST({sum_nk2} AS DOUBLE)) / 2.0)"
    term1 = (
        f"((CAST(n * (n - 1) * (2 * n + 5) AS DOUBLE)"
        f" - CAST({a_lvl} AS DOUBLE) - CAST(_t3 AS DOUBLE)) / 72.0)"
    )
    term2 = (
        f"(CAST({b_lvl} AS DOUBLE) * CAST(_t2 AS DOUBLE)"
        f" / (36.0 * {nn} * ({nn} - 1.0) * ({nn} - 2.0)))"
    )
    term3 = (
        f"(CAST({c_lvl} AS DOUBLE) * CAST(_t1 AS DOUBLE)"
        f" / (8.0 * {nn} * ({nn} - 1.0)))"
    )
    var = f"({term1} + {term2} + {term3})"
    z = f"((CAST(_u2 AS DOUBLE) - {mean2}) / (2.0 * SQRT({var})))"
    p = two_sided_p_sql(z)
    ok = f"(n > 2 AND {var} > 0)"
    return f"""
WITH d AS (
  SELECT {gsel}, {lvl} AS _k, {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
cnt AS (
  SELECT {gsel}, _qv,
    {csel}
  FROM d WHERE _k IS NOT NULL GROUP BY {gsel}, _qv
),
cum AS (
  SELECT {gsel}, _qv, {", ".join(f"_c{k + 1}" for k in range(g_n))},
    {msel}
  FROM cnt
),
agg AS (
  SELECT {gsel},
    CAST(SUM({u2}) AS BIGINT) AS _u2,
    CAST(SUM({t}) AS BIGINT) AS n,
    {nsel},
    CAST(SUM(({t}) * (({t}) - 1)) AS BIGINT) AS _t1,
    CAST(SUM(({t}) * (({t}) - 1) * (({t}) - 2)) AS BIGINT) AS _t2,
    CAST(SUM(({t}) * (({t}) - 1) * (2 * ({t}) + 5)) AS BIGINT) AS _t3
  FROM cum GROUP BY {gsel}
)
SELECT {gsel}, n, _u2 AS u_stat2,
  CASE WHEN {ok} THEN {z} END AS z_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


def page_trend(
    df: DataFrame,
    value_col: str,
    block_col: str,
    treat_col: str,
    treatments: list,
    group_columns=(),
    scale: int = 2,
) -> DataFrame:
    """Per-group Page trend test (Page 1963) for an ORDERED alternative
    across k treatments in b blocks — friedman_test's directional
    sibling (friedman asks "any difference?", Page asks "do they rise
    in THIS order?"):

        L = Σ_j j·R_j,   R_j = Σ_blocks rank of treatment j in its block

    E[L] = b·k(k+1)²/4,  Var[L] = b·k²(k+1)(k²−1)/144 (tie-free null;
    mid-ranks are used for ties — the standard approximation, which
    only shrinks Var, i.e. the reported |z| is conservative-to-slightly
    -liberal exactly as in the textbook treatment).

    Exactness: within-block mid-ranks come from RANK + tie-peer counts
    in DOUBLED integer units (2r = 2·rank + peers − 1); L is an exact
    integer in the same doubled units; only complete blocks (all k
    treatments present) count.  One window pass + two reduces.

    Input must carry ONE row per (group, block, treatment).
    Returns (groups…, n_blocks, l_stat2 (=2L), z_stat, p_value,
    reject_05).
    """
    groups = _as_list(group_columns) if group_columns else []
    k = len(treatments)
    if k < 3:
        raise ValueError("page_trend needs >= 3 ordered treatments")
    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    widx = None
    for j, name in enumerate(treatments):
        cond = F.col(treat_col) == F.lit(name)
        widx = F.when(cond, j + 1) if widx is None else widx.when(cond, j + 1)
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, F.col(block_col).alias("_b"), widx.alias("_j"),
                qv.alias("_qv"))
        .filter(F.col("_j").isNotNull())
    )
    # complete blocks only
    wb = Window.partitionBy(*groups, "_b")
    d = d.select("*", F.count(F.lit(1)).over(wb).alias("_bk")).filter(
        F.col("_bk") == k
    )
    wrank = Window.partitionBy(*groups, "_b").orderBy("_qv")
    wtie = Window.partitionBy(*groups, "_b", "_qv")
    ranked = d.select(
        *groups,
        "_j",
        (
            F.lit(2) * F.rank().over(wrank)
            + F.count(F.lit(1)).over(wtie)
            - F.lit(1)
        ).cast("bigint").alias("_r2"),
    )
    agg = ranked.groupBy(*groups).agg(
        F.expr(f"CAST(COUNT(1) div {k} AS BIGINT)").alias("n_blocks"),
        F.sum(F.col("_j").cast("bigint") * F.col("_r2")).alias("_l2"),
    )
    bb = F.col("n_blocks").cast("double")
    kk = float(k)
    mean2 = bb * F.lit(kk * (kk + 1.0) ** 2 / 2.0)  # 2·E[L]
    var = bb * F.lit(kk * kk * (kk + 1.0) * (kk * kk - 1.0) / 144.0)
    z = (F.col("_l2").cast("double") - mean2) / (
        F.lit(2.0) * F.sqrt(var)
    )
    p = two_sided_p_expr(z)
    ok = (F.col("n_blocks") > 1) & (var > 0)
    return agg.select(
        *groups,
        "n_blocks",
        F.col("_l2").alias("l_stat2"),
        F.when(ok, z).alias("z_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def page_trend_sql(
    data_sql: str,
    value_col: str,
    block_col: str,
    treat_col: str,
    treatments: list,
    group_columns=(),
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`page_trend` (same doubled mid-ranks, same
    null-moment tree)."""
    groups = _as_list(group_columns) if group_columns else []
    gsel = ", ".join(groups)
    gcomma = f"{gsel}, " if groups else ""
    gby = gsel if groups else "1"
    k = len(treatments)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    widx = "CASE " + " ".join(
        f"WHEN {treat_col} = {name!r} THEN {j + 1}"
        if isinstance(name, str)
        else f"WHEN {treat_col} = {name} THEN {j + 1}"
        for j, name in enumerate(treatments)
    ) + " END"
    kk = float(k)
    bb = "CAST(n_blocks AS DOUBLE)"
    mean2 = f"({bb} * {dlit(kk * (kk + 1.0) ** 2 / 2.0)})"
    var = f"({bb} * {dlit(kk * kk * (kk + 1.0) * (kk * kk - 1.0) / 144.0)})"
    z = f"((CAST(_l2 AS DOUBLE) - {mean2}) / (2.0 * SQRT({var})))"
    p = two_sided_p_sql(z)
    ok = f"(n_blocks > 1 AND {var} > 0)"
    sel_g = f"{gsel}, " if groups else ""
    return f"""
WITH d AS (
  SELECT {gcomma}{block_col} AS _b, {widx} AS _j, {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
cb AS (
  SELECT *, COUNT(*) OVER (PARTITION BY {gcomma}_b) AS _bk
  FROM d WHERE _j IS NOT NULL
),
ranked AS (
  SELECT {gcomma}_j,
    CAST(2 * RANK() OVER (PARTITION BY {gcomma}_b ORDER BY _qv)
         + COUNT(*) OVER (PARTITION BY {gcomma}_b, _qv) - 1 AS BIGINT) AS _r2
  FROM cb WHERE _bk = {k}
),
agg AS (
  SELECT {sel_g}CAST(COUNT(*) // {k} AS BIGINT) AS n_blocks,
    CAST(SUM(CAST(_j AS BIGINT) * _r2) AS BIGINT) AS _l2
  FROM ranked{(" GROUP BY " + gsel) if groups else ""}
)
SELECT {sel_g}n_blocks, _l2 AS l_stat2,
  CASE WHEN {ok} THEN {z} END AS z_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


def brunner_munzel(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Brunner–Munzel test (Brunner & Munzel 2000; the scipy
    formulation): the heteroscedasticity-robust replacement for
    mann_whitney — MW's variance assumes the two distributions differ
    only by shift; BM estimates each arm's own rank variance, testing
    H₀: P(X<Y) + ½P(X=Y) = ½ without an equal-variance assumption.

        p̂ = (R̄_b − (n_b+1)/2)/n_a
        W = n_a·n_b·(R̄_b − R̄_a) / ((n_a+n_b)·√(n_a·S_a² + n_b·S_b²))
        S_i² = Var of (pooled midrank − within-arm midrank)

    Exactness: pooled and within-arm midranks in DOUBLED integer units
    (2r = 2·rank + peers − 1 via one RANGE-free rank window + tie
    windows); the variance uses the shift-cancelling difference D =
    pooled − within midrank, so Σ(2D) and Σ(2D)² are exact integers;
    W and p̂ are one shared double tree; the p-value uses the
    engine's logistic normal kernel (the t_df refinement matters below
    n ≈ 30 — documented approximation, reject_05 conservative there).

    Returns (groups…, n_a, n_b, p_hat, w_stat, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    arm = F.when(F.col(factor_col) == F.lit(level_a), 1).when(
        F.col(factor_col) == F.lit(level_b), 2
    )
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, arm.alias("_arm"), qv.alias("_qv"))
        .filter(F.col("_arm").isNotNull())
    )
    wpool = Window.partitionBy(*groups).orderBy("_qv")
    tpool = Window.partitionBy(*groups, "_qv")
    warm = Window.partitionBy(*groups, "_arm").orderBy("_qv")
    tarm = Window.partitionBy(*groups, "_arm", "_qv")
    ranked = d.select(
        *groups,
        "_arm",
        (
            F.lit(2) * F.rank().over(wpool)
            + F.count(F.lit(1)).over(tpool)
            - F.lit(1)
        ).cast("bigint").alias("_rp2"),
        (
            F.lit(2) * F.rank().over(warm)
            + F.count(F.lit(1)).over(tarm)
            - F.lit(1)
        ).cast("bigint").alias("_rw2"),
    )
    d2 = (F.col("_rp2") - F.col("_rw2")).alias("_d2")
    from timeseriesutils_spark.functions.cache import pin

    # a/b arm branches read per_arm twice: pin the (groups x 2)-row
    # aggregate so the doubled-midrank window pass runs once
    per_arm = pin(
        ranked.select(*groups, "_arm", "_rp2", d2).groupBy(
            *groups, "_arm"
        ).agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_rp2").alias("_sr2"),
            F.sum("_d2").alias("_sd2"),
            F.sum(F.col("_d2") * F.col("_d2")).alias("_sdd4"),
        )
    )
    a = per_arm.filter(F.col("_arm") == 1).select(
        *groups,
        F.col("_n").alias("n_a"),
        F.col("_sr2").alias("_sra"),
        F.col("_sd2").alias("_sda"),
        F.col("_sdd4").alias("_sdda"),
    )
    b = per_arm.filter(F.col("_arm") == 2).select(
        *groups,
        F.col("_n").alias("n_b"),
        F.col("_sr2").alias("_srb"),
        F.col("_sd2").alias("_sdb"),
        F.col("_sdd4").alias("_sddb"),
    )
    j = a.join(b, on=groups, how="inner")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    # means of doubled ranks /2
    rma = F.col("_sra").cast("double") / na / F.lit(2.0)
    rmb = F.col("_srb").cast("double") / nb / F.lit(2.0)
    # S² from doubled D: (Σ(2D)² − (Σ2D)²/n)/(4(n−1))
    sa2 = (
        F.col("_sdda").cast("double")
        - F.col("_sda").cast("double") * F.col("_sda").cast("double") / na
    ) / (F.lit(4.0) * (na - 1.0))
    sb2 = (
        F.col("_sddb").cast("double")
        - F.col("_sdb").cast("double") * F.col("_sdb").cast("double") / nb
    ) / (F.lit(4.0) * (nb - 1.0))
    p_hat = (rmb - (nb + 1.0) / F.lit(2.0)) / na
    den = (na + nb) * F.sqrt(na * sa2 + nb * sb2)
    w = na * nb * (rmb - rma) / den
    p = two_sided_p_expr(w)
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1) & (den > 0)
    return j.select(
        *groups,
        "n_a",
        "n_b",
        F.when(ok, p_hat).alias("p_hat"),
        F.when(ok, w).alias("w_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def brunner_munzel_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`brunner_munzel` (same doubled midranks,
    same shift-cancelled variance tree)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    na = "CAST(n_a AS DOUBLE)"
    nb = "CAST(n_b AS DOUBLE)"
    rma = f"(CAST(_sra AS DOUBLE) / {na} / 2.0)"
    rmb = f"(CAST(_srb AS DOUBLE) / {nb} / 2.0)"
    sa2 = (
        f"((CAST(_sdda AS DOUBLE)"
        f" - CAST(_sda AS DOUBLE) * CAST(_sda AS DOUBLE) / {na})"
        f" / (4.0 * ({na} - 1.0)))"
    )
    sb2 = (
        f"((CAST(_sddb AS DOUBLE)"
        f" - CAST(_sdb AS DOUBLE) * CAST(_sdb AS DOUBLE) / {nb})"
        f" / (4.0 * ({nb} - 1.0)))"
    )
    p_hat = f"(({rmb} - ({nb} + 1.0) / 2.0) / {na})"
    den = f"(({na} + {nb}) * SQRT({na} * {sa2} + {nb} * {sb2}))"
    w = f"({na} * {nb} * ({rmb} - {rma}) / {den})"
    p = two_sided_p_sql(w)
    ok = f"(n_a > 1 AND n_b > 1 AND {den} > 0)"
    return f"""
WITH d AS (
  SELECT {gsel},
    CASE WHEN {factor_col} = {level_a!r} THEN 1
         WHEN {factor_col} = {level_b!r} THEN 2 END AS _arm,
    {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
ranked AS (
  SELECT {gsel}, _arm,
    CAST(2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _qv)
         + COUNT(*) OVER (PARTITION BY {gsel}, _qv) - 1 AS BIGINT) AS _rp2,
    CAST(2 * RANK() OVER (PARTITION BY {gsel}, _arm ORDER BY _qv)
         + COUNT(*) OVER (PARTITION BY {gsel}, _arm, _qv) - 1 AS BIGINT)
      AS _rw2
  FROM d WHERE _arm IS NOT NULL
),
per_arm AS (
  SELECT {gsel}, _arm, COUNT(*) AS _n,
    CAST(SUM(_rp2) AS BIGINT) AS _sr2,
    CAST(SUM(_rp2 - _rw2) AS BIGINT) AS _sd2,
    CAST(SUM((_rp2 - _rw2) * (_rp2 - _rw2)) AS BIGINT) AS _sdd4
  FROM ranked GROUP BY {gsel}, _arm
),
j AS (
  SELECT a.*, b._n AS n_b, b._sr2 AS _srb, b._sd2 AS _sdb,
    b._sdd4 AS _sddb
  FROM (SELECT {gsel}, _n AS n_a, _sr2 AS _sra, _sd2 AS _sda,
          _sdd4 AS _sdda FROM per_arm WHERE _arm = 1) a
  JOIN (SELECT * FROM per_arm WHERE _arm = 2) b USING ({gsel})
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN {ok} THEN {p_hat} END AS p_hat,
  CASE WHEN {ok} THEN {w} END AS w_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM j
"""


def _hodges_lehmann_arrow(
    df: DataFrame, value_col: str, groups: list, m: int
) -> DataFrame:
    """Arrow production engine for :func:`hodges_lehmann`: the same
    quantized integers through numpy broadcasting (upper-triangle Walsh
    sums) and the same quantile_cont lerp — min/plus/sort of exact
    int64 reproduce the expression engine bit-for-bit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    src = df.filter(F.col(value_col).isNotNull()).select(
        *groups, q.alias("_q")
    )
    fields = [src.schema[c] for c in groups]
    schema = StructType(
        list(fields)
        + [StructField("n", LongType()), StructField("hl_estimate", DoubleType())]
    )

    def per_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        a = np.sort(pdf["_q"].to_numpy(np.int64), kind="mergesort")
        n = len(a)
        iu = np.triu_indices(n)
        w = np.sort(a[iu[0]] + a[iu[1]], kind="mergesort")
        # the shared quantile_cont lerp at q=0.5 over exact ints
        nn = len(w)
        h = (nn - 1) * 0.5
        lo = int(np.floor(h))
        frac = h - float(lo)
        base = float(w[lo])
        nxt = float(w[min(lo + 1, nn - 1)])
        med = base * (1.0 - frac) + nxt * frac
        row = dict(zip([f.name for f in fields], keys))
        row.update(n=n, hl_estimate=med / (2.0 * m))
        return pd.DataFrame([row])

    return src.groupBy(*groups).applyInPandas(per_group, schema)


# --------------------------------------------------------------------------
# inverse normal CDF kernel (Acklam's rational approximation, public;
# |relative error| < 1.15e-9 over (0,1)) — the Φ⁻¹ neither engine has,
# unlocking normal-scores tests / qq analyses.  One engine-neutral
# expression text (arithmetic + LN + SQRT + CASE), output quantized at
# 1e-9 per the libm rule.
# --------------------------------------------------------------------------

_ACKLAM_A = (
    -3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
    1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00,
)
_ACKLAM_B = (
    -5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
    6.680131188771972e01, -1.328068155288572e01,
)
_ACKLAM_C = (
    -7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
    -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00,
)
_ACKLAM_D = (
    7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
    3.754408661907416e00,
)
_ACKLAM_PLOW = 0.02425


def _horner(coeffs, var: str) -> str:
    out = dlit(coeffs[0])
    for c in coeffs[1:]:
        out = f"({out} * {var} + {dlit(c)})"
    return out


def norm_ppf_sql_text(p: str) -> str:
    """Engine-neutral Φ⁻¹(p) expression text (Acklam): central rational
    in r = (p−½)², tail rationals in q = √(−2·ln p) with the symmetric
    upper tail, floor-quantized at 1e-9.  Valid for p ∈ (0, 1); NULL
    outside.  Run it through F.expr on Spark and verbatim in DuckDB —
    identical doubles (the taylor renderer discipline)."""
    plow = dlit(_ACKLAM_PLOW)
    phigh = f"(1e0 - {plow})"
    qc = f"(({p}) - 0.5e0)"
    rc = f"({qc} * {qc})"
    central = (
        f"({_horner(_ACKLAM_A, rc)} * {qc}"
        f" / ({_horner(_ACKLAM_B, rc)} * {rc} + 1e0))"
    )
    ql = f"SQRT(-2e0 * LN({p}))"
    lower = (
        f"({_horner(_ACKLAM_C, ql)}"
        f" / ({_horner(_ACKLAM_D, ql)} * {ql} + 1e0))"
    )
    qh = f"SQRT(-2e0 * LN(1e0 - ({p})))"
    upper = (
        f"(-({_horner(_ACKLAM_C, qh)}"
        f" / ({_horner(_ACKLAM_D, qh)} * {qh} + 1e0)))"
    )
    raw = (
        f"CASE WHEN ({p}) > {plow} AND ({p}) < {phigh} THEN {central} "
        f"WHEN ({p}) > 0e0 AND ({p}) <= {plow} THEN {lower} "
        f"WHEN ({p}) >= {phigh} AND ({p}) < 1e0 THEN {upper} END"
    )
    return f"(FLOOR(({raw}) * 1e9 + 0.5) / 1e9)"


def van_der_waerden(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    levels: list,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Van der Waerden normal-scores test (1952/53): the
    k-sample location test that converts pooled midranks to normal
    quantiles s_i = Φ⁻¹(r_i/(N+1)) before the ANOVA-style statistic —
    kruskal_wallis's asymptotically-most-efficient sibling (full ARE 1
    vs the F-test under normality, while keeping rank robustness):

        T = (N−1)·Σ_j n_j·s̄_j² / Σ_i s_i²  ~ χ²_{k−1}

    Exactness: doubled-integer midranks → one shared double p_i →
    Φ⁻¹ through the quantized Acklam kernel → scores re-quantized to
    int64, so every cross-row sum is exact; T is one double tree and
    the decision uses the engine's Wilson–Hilferty χ² survival.

    Returns (groups…, n, t_stat, df, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    k = len(levels)
    if k < 2:
        raise ValueError("van_der_waerden needs >= 2 levels")
    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = None
    for i, name in enumerate(levels):
        cond = F.col(factor_col) == F.lit(name)
        lvl = F.when(cond, i + 1) if lvl is None else lvl.when(cond, i + 1)
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, lvl.alias("_k"), qv.alias("_qv"))
        .filter(F.col("_k").isNotNull())
    )
    wrank = Window.partitionBy(*groups).orderBy("_qv")
    wtie = Window.partitionBy(*groups, "_qv")
    wall = Window.partitionBy(*groups)
    ranked = d.select(
        *groups,
        "_k",
        (
            F.lit(2) * F.rank().over(wrank)
            + F.count(F.lit(1)).over(wtie)
            - F.lit(1)
        ).cast("bigint").alias("_r2"),
        F.count(F.lit(1)).over(wall).alias("_n"),
    )
    p_i = (
        F.col("_r2").cast("double")
        / (F.lit(2.0) * (F.col("_n").cast("double") + F.lit(1.0)))
    )
    scored = ranked.select(*groups, "_k", p_i.alias("_p")).select(
        *groups,
        "_k",
        F.expr(
            "CAST(FLOOR(("
            + norm_ppf_sql_text("_p")
            + ") * 1e9 + 0.5) AS BIGINT)"
        ).alias("_sq"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # per-level sums pivot into FIXED-ORDER columns (never a float SUM
    # across level rows — the bm25/dirichlet pivot rule): the k-term
    # numerator is one ordered expression both engines share
    agg = scored.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_sq")) * dec(F.col("_sq"))).alias("_ss2"),
        *[
            F.sum(F.when(F.col("_k") == j + 1, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_nj{j + 1}")
            for j in range(k)
        ],
        *[
            F.sum(F.when(F.col("_k") == j + 1, F.col("_sq"))).alias(
                f"_ssj{j + 1}"
            )
            for j in range(k)
        ],
    )
    num = None
    for j in range(k):
        nj = F.col(f"_nj{j + 1}").cast("double")
        mean_j = (
            F.coalesce(F.col(f"_ssj{j + 1}"), F.lit(0).cast("bigint"))
            .cast("double")
            / F.lit(1.0e9)
            / nj
        )
        term = F.when(F.col(f"_nj{j + 1}") > 0, nj * mean_j * mean_j).otherwise(
            F.lit(0.0)
        )
        num = term if num is None else num + term
    nn = F.col("n").cast("double")
    ss2 = (
        F.col("_ss2").cast("string").cast("double")
        / F.lit(1.0e9)
        / F.lit(1.0e9)
    )
    t = (nn - 1.0) * num / ss2
    p = chi2_sf_expr(t, F.lit(float(k - 1)))
    j = agg
    ok = (F.col("n") > k) & (ss2 > 0)
    return j.select(
        *groups,
        "n",
        F.when(ok, t).alias("t_stat"),
        F.lit(k - 1).alias("df"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def van_der_waerden_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    levels: list,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`van_der_waerden` (same midranks, same
    Acklam text, same sums)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    k = len(levels)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    lvl = "CASE " + " ".join(
        f"WHEN {factor_col} = {name!r} THEN {i + 1}"
        if isinstance(name, str)
        else f"WHEN {factor_col} = {name} THEN {i + 1}"
        for i, name in enumerate(levels)
    ) + " END"
    p_i = "(CAST(_r2 AS DOUBLE) / (2.0 * (CAST(_n AS DOUBLE) + 1.0)))"
    sq = f"CAST(FLOOR(({norm_ppf_sql_text(p_i)}) * 1e9 + 0.5) AS BIGINT)"
    nj_sel = ",\n    ".join(
        f"CAST(SUM(CASE WHEN _k = {j + 1} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS _nj{j + 1}"
        for j in range(k)
    )
    ssj_sel = ",\n    ".join(
        f"CAST(SUM(CASE WHEN _k = {j + 1} THEN _sq END) AS BIGINT)"
        f" AS _ssj{j + 1}"
        for j in range(k)
    )
    terms = []
    for j in range(k):
        nj = f"CAST(_nj{j + 1} AS DOUBLE)"
        mean_j = f"(CAST(COALESCE(_ssj{j + 1}, 0) AS DOUBLE) / 1e9 / {nj})"
        terms.append(
            f"CASE WHEN _nj{j + 1} > 0 THEN {nj} * {mean_j} * {mean_j}"
            f" ELSE 0e0 END"
        )
    num = "(" + " + ".join(terms) + ")"
    nn = "CAST(n AS DOUBLE)"
    ss2 = "(CAST(CAST(_ss2 AS VARCHAR) AS DOUBLE) / 1e9 / 1e9)"
    t = f"(({nn} - 1.0) * {num} / {ss2})"
    p = chi2_sf_sql(t, str(float(k - 1)))
    ok = f"(n > {k} AND {ss2} > 0)"
    return f"""
WITH d AS (
  SELECT {gsel}, {lvl} AS _k, {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
ranked AS (
  SELECT {gsel}, _k,
    CAST(2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _qv)
         + COUNT(*) OVER (PARTITION BY {gsel}, _qv) - 1 AS BIGINT) AS _r2,
    COUNT(*) OVER (PARTITION BY {gsel}) AS _n
  FROM d WHERE _k IS NOT NULL
),
scored AS (
  SELECT {gsel}, _k, {sq} AS _sq FROM ranked
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_sq AS HUGEINT) * _sq) AS _ss2,
    {nj_sel},
    {ssj_sel}
  FROM scored GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN {ok} THEN {t} END AS t_stat,
  {k - 1} AS df,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


def fligner_killeen(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    levels: list,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Fligner–Killeen test (1976; Conover–Johnson–Johnson
    1981 normal-scores form): the robust k-sample SCALE test — the
    rank-based member beside bartlett_test (normal-theory, fragile)
    and levene_bf (mean/median deviations): do the levels differ in
    SPREAD?

        a_i = Φ⁻¹(½ + r_i/(2(N+1))),  r_i = pooled midrank of
              |x_i − median(level)|
        X² = Σ_j n_j(ā_j − ā)² / Var(a)  ~ χ²_{k−1}

    Exactness: per-level medians via the shared sorted-collect lerp,
    |deviations| quantized to int64, pooled midranks in doubled
    integer units, scores through the quantized Acklam Φ⁻¹ kernel and
    re-quantized to int64 — every cross-row sum exact; the statistic
    is one double tree over fixed-order per-level pivots, the decision
    the Wilson–Hilferty χ² survival.

    Returns (groups…, n, x2_stat, df, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    k = len(levels)
    if k < 2:
        raise ValueError("fligner_killeen needs >= 2 levels")
    from timeseriesutils_spark.operators.stats import _qcont

    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = None
    for i, name in enumerate(levels):
        cond = F.col(factor_col) == F.lit(name)
        lvl = F.when(cond, i + 1) if lvl is None else lvl.when(cond, i + 1)
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, lvl.alias("_k"), qv.alias("_qv"))
        .filter(F.col("_k").isNotNull())
    )
    med = d.groupBy(*groups, "_k").agg(
        F.sort_array(F.collect_list("_qv")).alias("_arr")
    )
    med = med.select(
        *groups, "_k",
        _qcont(F.col("_arr"), F.size("_arr"), 0.5).alias("_med"),
    )
    jd = d.join(F.broadcast(med), on=[*groups, "_k"])
    # |x − median| back on the quantized grid: median is a lerp double
    # in q units; the abs deviation re-quantizes via floor(|.|·2+0.5)
    # (doubled units make the .5-lerp exact: 2·med is integer-valued)
    dev = F.floor(
        F.abs(F.col("_qv").cast("double") - F.col("_med")) * F.lit(2.0)
        + F.lit(0.5)
    ).cast("bigint")
    dd = jd.select(*groups, "_k", dev.alias("_dv"))
    wrank = Window.partitionBy(*groups).orderBy("_dv")
    wtie = Window.partitionBy(*groups, "_dv")
    wall = Window.partitionBy(*groups)
    ranked = dd.select(
        *groups,
        "_k",
        (
            F.lit(2) * F.rank().over(wrank)
            + F.count(F.lit(1)).over(wtie)
            - F.lit(1)
        ).cast("bigint").alias("_r2"),
        F.count(F.lit(1)).over(wall).alias("_n"),
    )
    p_i = (
        F.lit(0.5)
        + F.col("_r2").cast("double")
        / (F.lit(4.0) * (F.col("_n").cast("double") + F.lit(1.0)))
    )
    scored = ranked.select(*groups, "_k", p_i.alias("_p")).select(
        *groups,
        "_k",
        F.expr(
            "CAST(FLOOR(("
            + norm_ppf_sql_text("_p")
            + ") * 1e9 + 0.5) AS BIGINT)"
        ).alias("_sq"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = scored.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_sq").alias("_st"),
        F.sum(dec(F.col("_sq")) * dec(F.col("_sq"))).alias("_ss2"),
        *[
            F.sum(F.when(F.col("_k") == j + 1, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_nj{j + 1}")
            for j in range(k)
        ],
        *[
            F.sum(F.when(F.col("_k") == j + 1, F.col("_sq"))).alias(
                f"_ssj{j + 1}"
            )
            for j in range(k)
        ],
    )
    nn = F.col("n").cast("double")
    abar = F.col("_st").cast("double") / F.lit(1.0e9) / nn
    var = (
        F.col("_ss2").cast("string").cast("double") / F.lit(1.0e9) / F.lit(1.0e9)
        - nn * abar * abar
    ) / (nn - 1.0)
    num = None
    for j in range(k):
        nj = F.col(f"_nj{j + 1}").cast("double")
        mean_j = (
            F.coalesce(F.col(f"_ssj{j + 1}"), F.lit(0).cast("bigint"))
            .cast("double")
            / F.lit(1.0e9)
            / nj
        )
        term = F.when(
            F.col(f"_nj{j + 1}") > 0,
            nj * (mean_j - abar) * (mean_j - abar),
        ).otherwise(F.lit(0.0))
        num = term if num is None else num + term
    x2 = num / var
    ok = (F.col("n") > k) & (var > 0)
    # round-14 (the dagostino_k2 staging rule, guide §7.3): x2 expands
    # the k per-level mean terms and p re-expands x2 inside the
    # Wilson–Hilferty tree — emitting all outputs from one projection
    # duplicated that tree ~5x and the per-write Catalyst/codegen pass
    # dominated a group-count-sized stage.  Stage at (x2, ok), then the
    # second projection computes p over a plain column reference —
    # identical IEEE doubles, same op sequence.
    xstage = agg.select(
        *groups, "n", x2.alias("_x2"), ok.alias("_ok")
    )
    x2c = F.col("_x2")
    okc = F.col("_ok")
    p = chi2_sf_expr(x2c, F.lit(float(k - 1)))
    return xstage.select(
        *groups,
        "n",
        F.when(okc, x2c).alias("x2_stat"),
        F.lit(k - 1).alias("df"),
        F.when(okc, p).alias("p_value"),
        F.when(okc, p < F.lit(0.05)).alias("reject_05"),
    )


def fligner_killeen_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    levels: list,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`fligner_killeen` (same median lerp, same
    doubled deviations/midranks, same Acklam scores and pivots)."""
    from timeseriesutils_spark.operators.stats import _qcont_sql

    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    k = len(levels)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    lvl = "CASE " + " ".join(
        f"WHEN {factor_col} = {name!r} THEN {i + 1}"
        if isinstance(name, str)
        else f"WHEN {factor_col} = {name} THEN {i + 1}"
        for i, name in enumerate(levels)
    ) + " END"
    med = _qcont_sql("_arr", "len(_arr)", 0.5)
    p_i = (
        "(0.5e0 + CAST(_r2 AS DOUBLE)"
        " / (4.0 * (CAST(_n AS DOUBLE) + 1.0)))"
    )
    sq = f"CAST(FLOOR(({norm_ppf_sql_text(p_i)}) * 1e9 + 0.5) AS BIGINT)"
    nj_sel = ",\n    ".join(
        f"CAST(SUM(CASE WHEN _k = {j + 1} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS _nj{j + 1}"
        for j in range(k)
    )
    ssj_sel = ",\n    ".join(
        f"CAST(SUM(CASE WHEN _k = {j + 1} THEN _sq END) AS BIGINT)"
        f" AS _ssj{j + 1}"
        for j in range(k)
    )
    nn = "CAST(n AS DOUBLE)"
    abar = f"(CAST(_st AS DOUBLE) / 1e9 / {nn})"
    var = (
        f"((CAST(CAST(_ss2 AS VARCHAR) AS DOUBLE) / 1e9 / 1e9"
        f" - {nn} * {abar} * {abar}) / ({nn} - 1.0))"
    )
    terms = []
    for j in range(k):
        nj = f"CAST(_nj{j + 1} AS DOUBLE)"
        mean_j = f"(CAST(COALESCE(_ssj{j + 1}, 0) AS DOUBLE) / 1e9 / {nj})"
        terms.append(
            f"CASE WHEN _nj{j + 1} > 0 THEN"
            f" {nj} * ({mean_j} - {abar}) * ({mean_j} - {abar})"
            f" ELSE 0e0 END"
        )
    num = "(" + " + ".join(terms) + ")"
    x2 = f"({num} / {var})"
    p = chi2_sf_sql(x2, str(float(k - 1)))
    ok = f"(n > {k} AND {var} > 0)"
    return f"""
WITH d AS (
  SELECT {gsel}, {lvl} AS _k, {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
med AS (
  SELECT {gsel}, _k, {med} AS _med FROM (
    SELECT {gsel}, _k, list_sort(list(_qv)) AS _arr
    FROM d WHERE _k IS NOT NULL GROUP BY {gsel}, _k
  )
),
dd AS (
  SELECT d.{gsel.replace(', ', ', d.')}, d._k,
    CAST(FLOOR(ABS(CAST(_qv AS DOUBLE) - _med) * 2e0 + 0.5) AS BIGINT)
      AS _dv
  FROM d JOIN med USING ({gsel}, _k)
  WHERE d._k IS NOT NULL
),
ranked AS (
  SELECT {gsel}, _k,
    CAST(2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _dv)
         + COUNT(*) OVER (PARTITION BY {gsel}, _dv) - 1 AS BIGINT) AS _r2,
    COUNT(*) OVER (PARTITION BY {gsel}) AS _n
  FROM dd
),
scored AS (
  SELECT {gsel}, _k, {sq} AS _sq FROM ranked
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    CAST(SUM(_sq) AS BIGINT) AS _st,
    SUM(CAST(_sq AS HUGEINT) * _sq) AS _ss2,
    {nj_sel},
    {ssj_sel}
  FROM scored GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN {ok} THEN {x2} END AS x2_stat,
  {k - 1} AS df,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# two-sample energy distance (Székely–Rizzo E-statistic)
# --------------------------------------------------------------------------


def energy_distance(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group two-sample energy distance (Székely & Rizzo 2004) —
    the OMNIBUS distributional two-sample statistic: where KS sees the
    worst ECDF gap and mann_whitney sees location, the E-statistic is
    zero iff the two distributions are identical and responds to ANY
    difference (location, scale, shape):

        E = 2·E|X−Y| − E|X−X′| − E|Y−Y′|
        T = (n_a·n_b/(n_a+n_b))·E        (the test statistic)

    Exactness: with 10^-scale-quantized values, every pair-distance
    expectation collapses to the sorted-order identity
    ΣΣ_{i<j}|z_i−z_j| = Σ_i(2i−1−n)·z_(i) — row_number windows ordered
    by (value, arm) so every tie block is arm-contiguous: the per-arm
    pooled partials are then tie-permutation invariant (not just their
    total), which the a/b self-join requires because engines may
    re-execute the ranking per branch with different tie orders.  Cross-pair mass = pooled − within_a − within_b, all exact
    DECIMAL(38,0); E and T are one shared double tree.

    Scale shape: two rank windows + one groupBy — identical to the
    brunner_munzel plan; NO pair join at any size.

    Returns (groups…, n_a, n_b, e_dist, t_stat).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    arm = F.when(F.col(factor_col) == F.lit(level_a), 1).when(
        F.col(factor_col) == F.lit(level_b), 2
    )
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, arm.alias("_arm"), qv.alias("_qv"))
        .filter(F.col("_arm").isNotNull())
    )
    # pooled order key includes _arm: value-ties that straddle arms get a
    # deterministic arm-contiguous block, making the PER-ARM pooled
    # partial sums tie-invariant — required because the a/b self-join
    # can re-execute the window (CTE inlining / DAG duplication) with a
    # different tie permutation per execution.
    wp = Window.partitionBy(*groups).orderBy("_qv", "_arm")
    ww = Window.partitionBy(*groups, "_arm").orderBy("_qv")
    cp = Window.partitionBy(*groups)
    cw = Window.partitionBy(*groups, "_arm")
    ranked = d.select(
        *groups,
        "_arm",
        "_qv",
        (
            F.lit(2) * F.row_number().over(wp)
            - F.lit(1)
            - F.count(F.lit(1)).over(cp)
        ).cast("bigint").alias("_cp"),
        (
            F.lit(2) * F.row_number().over(ww)
            - F.lit(1)
            - F.count(F.lit(1)).over(cw)
        ).cast("bigint").alias("_cw"),
    )
    from timeseriesutils_spark.functions.cache import pin

    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # the a/b arm split reads per_arm twice: pin the TINY (groups x 2)
    # aggregate so the expensive rank-window pass runs once
    per_arm = pin(
        ranked.groupBy(*groups, "_arm").agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec(F.col("_cp") * F.col("_qv"))).alias("_pp"),
            F.sum(dec(F.col("_cw") * F.col("_qv"))).alias("_ww"),
        )
    )
    a = per_arm.filter(F.col("_arm") == 1).select(
        *groups,
        F.col("_n").alias("n_a"),
        F.col("_pp").alias("_ppa"),
        F.col("_ww").alias("_wwa"),
    )
    b = per_arm.filter(F.col("_arm") == 2).select(
        *groups,
        F.col("_n").alias("n_b"),
        F.col("_pp").alias("_ppb"),
        F.col("_ww").alias("_wwb"),
    )
    j = a.join(b, on=groups, how="inner")
    cross = (
        F.col("_ppa") + F.col("_ppb") - F.col("_wwa") - F.col("_wwb")
    )
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    mf = F.lit(float(m))
    e = (
        F.lit(2.0) * s2d(cross) / (na * nb)
        - F.lit(2.0) * s2d(F.col("_wwa")) / (na * na)
        - F.lit(2.0) * s2d(F.col("_wwb")) / (nb * nb)
    ) / mf
    t = na * nb / (na + nb) * e
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return j.select(
        *groups,
        "n_a",
        "n_b",
        F.when(ok, e).alias("e_dist"),
        F.when(ok, t).alias("t_stat"),
    )


def energy_distance_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`energy_distance` (same sorted-order
    identity, same DECIMAL cross-pair algebra)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    na = "CAST(n_a AS DOUBLE)"
    nb = "CAST(n_b AS DOUBLE)"
    cross = "(_ppa + _ppb - _wwa - _wwb)"
    e = (
        f"((2.0 * {s2d(cross)} / ({na} * {nb})"
        f" - 2.0 * {s2d('_wwa')} / ({na} * {na})"
        f" - 2.0 * {s2d('_wwb')} / ({nb} * {nb})) / {dlit(float(m))})"
    )
    t = f"({na} * {nb} / ({na} + {nb}) * {e})"
    return f"""
WITH d AS (
  SELECT {gsel},
    CASE WHEN {factor_col} = {level_a!r} THEN 1
         WHEN {factor_col} = {level_b!r} THEN 2 END AS _arm,
    {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
ranked AS (
  SELECT {gsel}, _arm, _qv,
    CAST(2 * ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _qv, _arm)
         - 1 - COUNT(*) OVER (PARTITION BY {gsel}) AS BIGINT) AS _cp,
    CAST(2 * ROW_NUMBER() OVER (PARTITION BY {gsel}, _arm ORDER BY _qv)
         - 1 - COUNT(*) OVER (PARTITION BY {gsel}, _arm) AS BIGINT) AS _cw
  FROM d WHERE _arm IS NOT NULL
),
per_arm AS (
  SELECT {gsel}, _arm, COUNT(*) AS _n,
    SUM(CAST(_cp * _qv AS DECIMAL(38,0))) AS _pp,
    SUM(CAST(_cw * _qv AS DECIMAL(38,0))) AS _ww
  FROM ranked GROUP BY {gsel}, _arm
),
j AS (
  SELECT a.{gsel.replace(', ', ', a.')}, a._n AS n_a, a._pp AS _ppa,
    a._ww AS _wwa, b._n AS n_b, b._pp AS _ppb, b._ww AS _wwb
  FROM (SELECT * FROM per_arm WHERE _arm = 1) a
  JOIN (SELECT * FROM per_arm WHERE _arm = 2) b USING ({gsel})
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN n_a > 0 AND n_b > 0 THEN {e} END AS e_dist,
  CASE WHEN n_a > 0 AND n_b > 0 THEN {t} END AS t_stat
FROM j
"""


# --------------------------------------------------------------------------
# Ansari–Bradley scale test
# --------------------------------------------------------------------------


def ansari_bradley(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Ansari–Bradley two-sample SCALE test (1960) — the
    rank-based member of the dispersion family (bartlett_test assumes
    normality, levene_bf means-of-deviations, fligner_killeen normal
    scores; AB is the pure-rank classic): score each pooled observation
    by its distance from the NEAREST END of the ordering,

        a_i = min(r_i, N+1−r_i)   (midranks under ties),
        AB  = Σ_{i ∈ arm B} a_i

    small-scale samples concentrate in the middle (high scores), so AB
    far from its null mean flags a scale difference.

        E[AB]   = n_b·ΣA/N,
        Var[AB] = n_a·n_b·(N·ΣA² − (ΣA)²) / (N²·(N−1))

    (the tie-robust conditional moments over the realized score
    multiset — scipy's normal-approximation branch).

    Exactness: midranks in DOUBLED integer units (2r = 2·rank+peers−1),
    so doubled scores 2a = min(2r, 2(N+1)−2r) are exact ints; AB, ΣA,
    ΣA² accumulate in DECIMAL; z and the engine-kernel p are one shared
    double tree.  Same two-window count shape as brunner_munzel.

    Returns (groups…, n_a, n_b, ab_stat, z, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    arm = F.when(F.col(factor_col) == F.lit(level_a), 1).when(
        F.col(factor_col) == F.lit(level_b), 2
    )
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, arm.alias("_arm"), qv.alias("_qv"))
        .filter(F.col("_arm").isNotNull())
    )
    wpool = Window.partitionBy(*groups).orderBy("_qv")
    tpool = Window.partitionBy(*groups, "_qv")
    cp = Window.partitionBy(*groups)
    r2 = (
        F.lit(2) * F.rank().over(wpool)
        + F.count(F.lit(1)).over(tpool)
        - F.lit(1)
    ).cast("bigint")
    nn = F.count(F.lit(1)).over(cp)
    a2 = F.least(r2, F.lit(2) * (nn + 1) - r2)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = d.select(*groups, "_arm", a2.alias("_a2"))
    agg = scored.groupBy(*groups).agg(
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("_arm") == 2, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("_arm") == 2, F.col("_a2")).otherwise(0)).alias(
            "_ab2"
        ),
        F.sum(dec(F.col("_a2"))).alias("_sa2"),
        F.sum(dec(F.col("_a2")) * dec(F.col("_a2"))).alias("_ssa4"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    N = na + nb
    ab = F.col("_ab2").cast("double") / F.lit(2.0)
    mean = nb * s2d("_sa2") / F.lit(2.0) / N
    var = (
        na
        * nb
        * (N * s2d("_ssa4") - s2d("_sa2") * s2d("_sa2"))
        / (F.lit(4.0) * N * N * (N - F.lit(1.0)))
    )
    z = (ab - mean) / F.sqrt(var)
    p = two_sided_p_expr(z)
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1) & (var > 0)
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        F.when(ok, ab).alias("ab_stat"),
        F.when(ok, z).alias("z"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def ansari_bradley_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`ansari_bradley` (same doubled end-distance
    scores, same conditional moments)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    na = "CAST(n_a AS DOUBLE)"
    nb = "CAST(n_b AS DOUBLE)"
    N = f"({na} + {nb})"
    ab = "(CAST(_ab2 AS DOUBLE) / 2.0)"
    mean = f"({nb} * {s2d('_sa2')} / 2.0 / {N})"
    var = (
        f"({na} * {nb} * ({N} * {s2d('_ssa4')}"
        f" - {s2d('_sa2')} * {s2d('_sa2')})"
        f" / (4.0 * {N} * {N} * ({N} - 1.0)))"
    )
    z = f"(({ab} - {mean}) / SQRT({var}))"
    p = two_sided_p_sql(z)
    ok = f"(n_a > 1 AND n_b > 1 AND {var} > 0)"
    return f"""
WITH d AS (
  SELECT {gsel},
    CASE WHEN {factor_col} = {level_a!r} THEN 1
         WHEN {factor_col} = {level_b!r} THEN 2 END AS _arm,
    {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
scored AS (
  SELECT {gsel}, _arm,
    LEAST(
      CAST(2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _qv)
           + COUNT(*) OVER (PARTITION BY {gsel}, _qv) - 1 AS BIGINT),
      2 * (COUNT(*) OVER (PARTITION BY {gsel}) + 1)
        - CAST(2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _qv)
               + COUNT(*) OVER (PARTITION BY {gsel}, _qv) - 1 AS BIGINT)
    ) AS _a2
  FROM d WHERE _arm IS NOT NULL
),
agg AS (
  SELECT {gsel},
    CAST(SUM(CASE WHEN _arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN _arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN _arm = 2 THEN _a2 ELSE 0 END) AS BIGINT) AS _ab2,
    SUM(CAST(_a2 AS HUGEINT)) AS _sa2,
    SUM(CAST(_a2 AS HUGEINT) * _a2) AS _ssa4
  FROM scored GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN {ok} THEN {ab} END AS ab_stat,
  CASE WHEN {ok} THEN {z} END AS z,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Kuiper two-sample test
# --------------------------------------------------------------------------

# Kuiper asymptotic 5% critical value for V*sqrt(n_e) (the circular /
# tail-balanced analogue of the KS constant above)
_KUIPER_CRIT_05 = 1.747


def kuiper_test(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Two-sample Kuiper test per group: V = D⁺ + D⁻, the sum of the
    largest ECDF exceedances in EACH direction — ks_test's rotation-
    invariant sibling with equal sensitivity in both tails (KS's single
    max under-weights the tail opposite its extremum; Kuiper is the
    standard fix for cyclic quantities and tail-symmetric drift).

    Same exact count-collapse machinery as ks_test: the signed gap
    cum_a·n_b − cum_b·n_a stays integer, D⁺/D⁻ are its max/−min, and
    the single division happens at the end.

    Returns (groups…, n_a, n_b, v_stat, kuiper_stat, reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = F.col(factor_col)
    d = df.filter(
        F.col(value_col).isNotNull() & lvl.isin([level_a, level_b])
    ).select(*groups, q.alias("_q"), (lvl == level_a).alias("_ia"))
    per = d.groupBy(*groups, "_q").agg(
        F.sum(F.col("_ia").cast("bigint")).alias("_ca"),
        F.sum((~F.col("_ia")).cast("bigint")).alias("_cb"),
    )
    w = Window.partitionBy(*groups).orderBy("_q")
    wg = Window.partitionBy(*groups)
    gap = (
        F.sum("_ca").over(w) * F.sum("_cb").over(wg)
        - F.sum("_cb").over(w) * F.sum("_ca").over(wg)
    )
    cum = per.select(
        *groups,
        gap.alias("_gap"),
        F.sum("_ca").over(wg).alias("_na"),
        F.sum("_cb").over(wg).alias("_nb"),
    )
    agg = cum.groupBy(*groups).agg(
        F.greatest(F.max("_gap"), F.lit(0).cast("bigint")).alias("_dp"),
        F.greatest(-F.min("_gap"), F.lit(0).cast("bigint")).alias("_dm"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    v = F.when(
        ok, (F.col("_dp") + F.col("_dm")).cast("double") / (na * nb)
    )
    kp = v * F.sqrt(na * nb / (na + nb))
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        v.alias("v_stat"),
        kp.alias("kuiper_stat"),
        (kp > F.lit(_KUIPER_CRIT_05)).alias("reject_05"),
    )


def kuiper_test_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`kuiper_test` (same integer signed gaps)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    na = "CAST(n_a AS DOUBLE)"
    nb = "CAST(n_b AS DOUBLE)"
    v = f"(CAST(_dp + _dm AS DOUBLE) / ({na} * {nb}))"
    kp = f"({v} * SQRT({na} * {nb} / ({na} + {nb})))"
    ok = "(n_a > 0 AND n_b > 0)"
    return f"""
WITH d AS (
  SELECT {gsel}, {qv} AS _q,
    {factor_col} = {level_a!r} AS _ia
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL
    AND {factor_col} IN ({level_a!r}, {level_b!r})
),
per AS (
  SELECT {gsel}, _q,
    CAST(SUM(CASE WHEN _ia THEN 1 ELSE 0 END) AS BIGINT) AS _ca,
    CAST(SUM(CASE WHEN _ia THEN 0 ELSE 1 END) AS BIGINT) AS _cb
  FROM d GROUP BY {gsel}, _q
),
cum AS (
  SELECT {gsel},
    CAST(SUM(_ca) OVER (PARTITION BY {gsel} ORDER BY _q)
         * SUM(_cb) OVER (PARTITION BY {gsel})
         - SUM(_cb) OVER (PARTITION BY {gsel} ORDER BY _q)
         * SUM(_ca) OVER (PARTITION BY {gsel}) AS BIGINT) AS _gap,
    CAST(SUM(_ca) OVER (PARTITION BY {gsel}) AS BIGINT) AS _na,
    CAST(SUM(_cb) OVER (PARTITION BY {gsel}) AS BIGINT) AS _nb
  FROM per
),
agg AS (
  SELECT {gsel},
    GREATEST(CAST(MAX(_gap) AS BIGINT), 0) AS _dp,
    GREATEST(CAST(-MIN(_gap) AS BIGINT), 0) AS _dm,
    MAX(_na) AS n_a, MAX(_nb) AS n_b
  FROM cum GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN {ok} THEN {v} END AS v_stat,
  CASE WHEN {ok} THEN {kp} END AS kuiper_stat,
  CASE WHEN {ok} THEN {kp} > {_KUIPER_CRIT_05!r} END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Cucconi joint location–scale test
# --------------------------------------------------------------------------


def cucconi_test(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Cucconi test (1968; Marozzi 2009 revival) for a JOINT
    location–scale alternative: mann_whitney sees shift, ansari_bradley
    sees scale — Cucconi tests both at once from squared ranks taken
    from BOTH ends, and is the classical one-shot "did this metric
    move or widen" screen:

        U = (6·ΣR² − n_b(N+1)(2N+1)) / √(n_a·n_b(N+1)(2N+1)(8N+11)/5)
        V = same with R → N+1−R (contrary ranks)
        ρ = 2(N²−4)/((2N+1)(8N+11)) − 1
        C = (U² + V² − 2ρUV) / (2(1−ρ²)),   p = exp(−C)

    (the asymptotic null of C is exactly standard exponential — the
    rare test whose p-value needs only exp).  Exactness: midranks in
    doubled integer units make 4·ΣR² and 4·Σ(N+1−R)² exact ints; the
    moment constants are integer products; U, V, ρ, C are one shared
    double tree and p is exp() floor-quantized at 1e-9 (the libm rule).

    Returns (groups…, n_a, n_b, c_stat, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    arm = F.when(F.col(factor_col) == F.lit(level_a), 1).when(
        F.col(factor_col) == F.lit(level_b), 2
    )
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, arm.alias("_arm"), qv.alias("_qv"))
        .filter(F.col("_arm").isNotNull())
    )
    wpool = Window.partitionBy(*groups).orderBy("_qv")
    tpool = Window.partitionBy(*groups, "_qv")
    cp = Window.partitionBy(*groups)
    r2 = (
        F.lit(2) * F.rank().over(wpool)
        + F.count(F.lit(1)).over(tpool)
        - F.lit(1)
    ).cast("bigint")
    nn = F.count(F.lit(1)).over(cp)
    c2 = (F.lit(2) * (nn + 1) - r2).cast("bigint")  # doubled contrary rank
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = d.select(*groups, "_arm", r2.alias("_r2"), c2.alias("_c2"))
    agg = scored.groupBy(*groups).agg(
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("_arm") == 2, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("_arm") == 2, dec(F.col("_r2")) * dec(F.col("_r2")))
        ).alias("_sr4"),
        F.sum(
            F.when(F.col("_arm") == 2, dec(F.col("_c2")) * dec(F.col("_c2")))
        ).alias("_sc4"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    N = na + nb
    # 4·ΣR² = Σ(2R)² ; U numerator doubled by 4: 6ΣR² = 1.5·Σ(2R)²
    den = F.sqrt(
        na * nb * (N + 1.0) * (2.0 * N + 1.0) * (8.0 * N + 11.0) / F.lit(5.0)
    )
    u = (F.lit(1.5) * s2d("_sr4") - nb * (N + 1.0) * (2.0 * N + 1.0)) / den
    vv = (F.lit(1.5) * s2d("_sc4") - nb * (N + 1.0) * (2.0 * N + 1.0)) / den
    rho = F.lit(2.0) * (N * N - 4.0) / (
        (2.0 * N + 1.0) * (8.0 * N + 11.0)
    ) - F.lit(1.0)
    cstat = (u * u + vv * vv - F.lit(2.0) * rho * u * vv) / (
        F.lit(2.0) * (F.lit(1.0) - rho * rho)
    )
    pq = F.lit(1.0e9)
    p = F.floor(F.exp(-cstat) * pq + F.lit(0.5)) / pq
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        F.when(ok, cstat).alias("c_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def cucconi_test_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`cucconi_test` (same doubled squared ranks,
    same exponential p)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    na = "CAST(n_a AS DOUBLE)"
    nb = "CAST(n_b AS DOUBLE)"
    N = f"({na} + {nb})"
    den = (
        f"SQRT({na} * {nb} * ({N} + 1.0) * (2.0 * {N} + 1.0)"
        f" * (8.0 * {N} + 11.0) / 5.0)"
    )
    u = f"((1.5 * {s2d('_sr4')} - {nb} * ({N} + 1.0) * (2.0 * {N} + 1.0)) / {den})"
    vv = f"((1.5 * {s2d('_sc4')} - {nb} * ({N} + 1.0) * (2.0 * {N} + 1.0)) / {den})"
    rho = f"(2.0 * ({N} * {N} - 4.0) / ((2.0 * {N} + 1.0) * (8.0 * {N} + 11.0)) - 1.0)"
    cstat = (
        f"(({u} * {u} + {vv} * {vv} - 2.0 * {rho} * {u} * {vv})"
        f" / (2.0 * (1.0 - {rho} * {rho})))"
    )
    p = f"(FLOOR(EXP(-{cstat}) * 1000000000.0 + 0.5) / 1000000000.0)"
    ok = "(n_a > 1 AND n_b > 1)"
    return f"""
WITH d AS (
  SELECT {gsel},
    CASE WHEN {factor_col} = {level_a!r} THEN 1
         WHEN {factor_col} = {level_b!r} THEN 2 END AS _arm,
    {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
ranked AS (
  SELECT {gsel}, _arm,
    CAST(2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _qv)
         + COUNT(*) OVER (PARTITION BY {gsel}, _qv) - 1 AS BIGINT) AS _r2,
    CAST(2 * (COUNT(*) OVER (PARTITION BY {gsel}) + 1)
         - (2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _qv)
            + COUNT(*) OVER (PARTITION BY {gsel}, _qv) - 1) AS BIGINT) AS _c2
  FROM d WHERE _arm IS NOT NULL
),
agg AS (
  SELECT {gsel},
    CAST(SUM(CASE WHEN _arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN _arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    SUM(CASE WHEN _arm = 2 THEN CAST(_r2 AS HUGEINT) * _r2 END) AS _sr4,
    SUM(CASE WHEN _arm = 2 THEN CAST(_c2 AS HUGEINT) * _c2 END) AS _sc4
  FROM ranked GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN {ok} THEN {cstat} END AS c_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Lepage joint location–scale test
# --------------------------------------------------------------------------


def lepage_test(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Lepage test (1971): the CLASSICAL joint location–scale
    screen — the sum of the squared standardized Wilcoxon rank-sum
    (location) and Ansari–Bradley (scale) statistics,

        L = z_W² + z_AB²,   L ~ χ²₂ under H₀  ⇒  p = exp(−L/2)

    (cucconi_test is the modern correlated-squared-ranks alternative;
    Lepage is what the textbooks and scipy users reach for).  Both
    component scores come from ONE doubled-midrank window pass: the
    Wilcoxon tie correction Σ_t(t³−t) collapses to the row-level sum
    Σ(t²−1) over peer counts, and the AB moments are the realized-score
    conditional ones — everything an exact DECIMAL sum, z's and p one
    shared double tree with exp() floor-quantized at 1e-9.

    Returns (groups…, n_a, n_b, z_w, z_ab, l_stat, p_value, reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    arm = F.when(F.col(factor_col) == F.lit(level_a), 1).when(
        F.col(factor_col) == F.lit(level_b), 2
    )
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, arm.alias("_arm"), qv.alias("_qv"))
        .filter(F.col("_arm").isNotNull())
    )
    wpool = Window.partitionBy(*groups).orderBy("_qv")
    tpool = Window.partitionBy(*groups, "_qv")
    cp = Window.partitionBy(*groups)
    t = F.count(F.lit(1)).over(tpool)
    r2 = (F.lit(2) * F.rank().over(wpool) + t - F.lit(1)).cast("bigint")
    nn = F.count(F.lit(1)).over(cp)
    a2 = F.least(r2, F.lit(2) * (nn + 1) - r2)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    scored = d.select(
        *groups,
        "_arm",
        r2.alias("_r2"),
        a2.alias("_a2"),
        t.cast("bigint").alias("_t"),
    )
    agg = scored.groupBy(*groups).agg(
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("_arm") == 2, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("_arm") == 2, F.col("_r2")).otherwise(0)).alias(
            "_w2"
        ),
        F.sum(F.when(F.col("_arm") == 2, F.col("_a2")).otherwise(0)).alias(
            "_ab2"
        ),
        F.sum(dec(F.col("_a2"))).alias("_sa2"),
        F.sum(dec(F.col("_a2")) * dec(F.col("_a2"))).alias("_ssa4"),
        F.sum(dec(F.col("_t") * F.col("_t") - F.lit(1))).alias("_tie"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    N = na + nb
    # Wilcoxon on doubled ranks: E[W2] = n_b(N+1), Var[W2] = 4 Var[W]
    varw4 = (
        F.lit(4.0)
        * (na * nb / F.lit(12.0))
        * ((N + 1.0) - s2d("_tie") / (N * (N - 1.0)))
    )
    z_w = (F.col("_w2").cast("double") - nb * (N + 1.0)) / F.sqrt(varw4)
    ab = F.col("_ab2").cast("double") / F.lit(2.0)
    mean_ab = nb * s2d("_sa2") / F.lit(2.0) / N
    var_ab = (
        na
        * nb
        * (N * s2d("_ssa4") - s2d("_sa2") * s2d("_sa2"))
        / (F.lit(4.0) * N * N * (N - F.lit(1.0)))
    )
    z_ab = (ab - mean_ab) / F.sqrt(var_ab)
    l_stat = z_w * z_w + z_ab * z_ab
    pq = F.lit(1.0e9)
    p = F.floor(F.exp(-l_stat / F.lit(2.0)) * pq + F.lit(0.5)) / pq
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1) & (varw4 > 0) & (var_ab > 0)
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        F.when(ok, z_w).alias("z_w"),
        F.when(ok, z_ab).alias("z_ab"),
        F.when(ok, l_stat).alias("l_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def lepage_test_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`lepage_test` (same one-pass doubled-rank
    scores, same χ²₂ exponential p)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    na = "CAST(n_a AS DOUBLE)"
    nb = "CAST(n_b AS DOUBLE)"
    N = f"({na} + {nb})"
    varw4 = (
        f"(4.0 * ({na} * {nb} / 12.0)"
        f" * (({N} + 1.0) - {s2d('_tie')} / ({N} * ({N} - 1.0))))"
    )
    z_w = f"((CAST(_w2 AS DOUBLE) - {nb} * ({N} + 1.0)) / SQRT({varw4}))"
    ab = "(CAST(_ab2 AS DOUBLE) / 2.0)"
    mean_ab = f"({nb} * {s2d('_sa2')} / 2.0 / {N})"
    var_ab = (
        f"({na} * {nb} * ({N} * {s2d('_ssa4')}"
        f" - {s2d('_sa2')} * {s2d('_sa2')})"
        f" / (4.0 * {N} * {N} * ({N} - 1.0)))"
    )
    z_ab = f"(({ab} - {mean_ab}) / SQRT({var_ab}))"
    l_stat = f"({z_w} * {z_w} + {z_ab} * {z_ab})"
    p = f"(FLOOR(EXP(-{l_stat} / 2.0) * 1000000000.0 + 0.5) / 1000000000.0)"
    ok = f"(n_a > 1 AND n_b > 1 AND {varw4} > 0 AND {var_ab} > 0)"
    return f"""
WITH d AS (
  SELECT {gsel},
    CASE WHEN {factor_col} = {level_a!r} THEN 1
         WHEN {factor_col} = {level_b!r} THEN 2 END AS _arm,
    {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
scored AS (
  SELECT {gsel}, _arm,
    CAST(2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _qv)
         + COUNT(*) OVER (PARTITION BY {gsel}, _qv) - 1 AS BIGINT) AS _r2,
    LEAST(
      CAST(2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _qv)
           + COUNT(*) OVER (PARTITION BY {gsel}, _qv) - 1 AS BIGINT),
      2 * (COUNT(*) OVER (PARTITION BY {gsel}) + 1)
        - CAST(2 * RANK() OVER (PARTITION BY {gsel} ORDER BY _qv)
               + COUNT(*) OVER (PARTITION BY {gsel}, _qv) - 1 AS BIGINT)
    ) AS _a2,
    CAST(COUNT(*) OVER (PARTITION BY {gsel}, _qv) AS BIGINT) AS _t
  FROM d WHERE _arm IS NOT NULL
),
agg AS (
  SELECT {gsel},
    CAST(SUM(CASE WHEN _arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN _arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN _arm = 2 THEN _r2 ELSE 0 END) AS BIGINT) AS _w2,
    CAST(SUM(CASE WHEN _arm = 2 THEN _a2 ELSE 0 END) AS BIGINT) AS _ab2,
    SUM(CAST(_a2 AS HUGEINT)) AS _sa2,
    SUM(CAST(_a2 AS HUGEINT) * _a2) AS _ssa4,
    SUM(CAST(_t AS HUGEINT) * _t - 1) AS _tie
  FROM scored GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN {ok} THEN {z_w} END AS z_w,
  CASE WHEN {ok} THEN {z_ab} END AS z_ab,
  CASE WHEN {ok} THEN {l_stat} END AS l_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""
