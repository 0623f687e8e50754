"""Distance correlation (Székely, Rizzo & Bakirov 2007): per-group
dCor between two columns — the dependence measure that is ZERO if and
only if the variables are independent, so it detects the nonlinear /
non-monotone relationships pearson (linear), spearman (monotone) and
kendall (concordance) all miss.  The modern first-look dependence
screen; completes the catalog's correlation family.

    A_ij = d_ij − ā_i· − ā_·j + ā_··   (double-centered |x_i − x_j|)
    dCov²(x,y) = (1/n²) Σ_ij A_ij B_ij
    dCor² = dCov² / √(dVar_x · dVar_y)

Exactness: x/y floor-quantize to integers; with the common denominator
n², every centered entry is the exact integer

    n²·A_ij = n²·d_ij − n·a_i − n·a_j + S

(a_i = Σ_j d_ij row sums, S the grand sum), products accumulate in
DECIMAL(38,0) / HUGEINT, and the three final ratios are one shared
double tree (string-cast numerators).  Aggregation-order free.

Scale shape and envelope: the n² pair self-join is the kendall_tau
'pairs' envelope — DIMENSION-SIZED series per group (the declared
query's monthly supplier series is n ≈ 40-80; magnitudes bound the
DECIMAL accumulator at n ≲ 10⁴ with 1e8-quantized values).  Row sums
are computed once on a vocabulary-sized (g, i) frame and broadcast
back into a single pair pass — one shuffle for the self-join, one
map-combinable aggregation out.

Reference scope note: the reference engine has no dependence measures
at all (featurize.py:1-686); this is a §2.2b capability row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distance_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group distance correlation (module doc).

    Returns (group..., n, dcov2, dvar_x, dvar_y, dcor) with dcor NULL
    for degenerate groups (n < 2 or a zero-variance side).
    """
    from timeseriesutils_spark.functions.cache import pin
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    m = 10 ** int(scale)
    q = lambda c: F.floor(  # noqa: E731
        F.col(c).cast("double") * F.lit(m) + F.lit(0.5)
    ).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731

    from pyspark.sql import Window

    wrow = Window.partitionBy(*g).orderBy("_x", "_y")
    d = pin(
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(*g, q(x_col).alias("_x"), q(y_col).alias("_y"))
        # duplicate (x, y) points are real observations: give every row
        # an identity so the pair frame keeps their multiplicity
        # (identical points are exchangeable, so the tie order under
        # row_number cannot change any sum)
        .select("*", F.row_number().over(wrow).alias("_i"))
    )
    pairs = d.alias("a").join(d.alias("b"), g)
    dx = F.abs(F.col("a._x") - F.col("b._x"))
    dy = F.abs(F.col("a._y") - F.col("b._y"))
    rows = pin(
        pairs.groupBy(*g, "a._i")
        .agg(
            F.max(F.col("a._x")).alias("_xi"),
            F.max(F.col("a._y")).alias("_yi"),
            F.count(F.lit(1)).alias("_cnt"),  # n, constant per group
            F.sum(dec(dx)).alias("_ax"),
            F.sum(dec(dy)).alias("_ay"),
        )
        .select(*g, F.col("_i"), "_xi", "_yi", "_cnt", "_ax", "_ay")
    )
    tot = rows.groupBy(*g).agg(
        F.max("_cnt").cast("decimal(38,0)").alias("_n"),
        F.sum("_ax").alias("_sx"),
        F.sum("_ay").alias("_sy"),
    )
    ri = rows.join(tot, g).select(
        *g, "_xi", "_yi", "_n", "_ax", "_ay", "_sx", "_sy"
    )
    p2 = (
        ri.alias("a")
        .join(ri.alias("b"), g)
        .select(
            *g,
            F.col("a._n").alias("_n"),
            (
                dec(F.abs(F.col("a._xi") - F.col("b._xi")))
                * F.col("a._n") * F.col("a._n")
                - F.col("a._ax") * F.col("a._n")
                - F.col("b._ax") * F.col("a._n")
                + F.col("a._sx")
            ).alias("_A"),
            (
                dec(F.abs(F.col("a._yi") - F.col("b._yi")))
                * F.col("a._n") * F.col("a._n")
                - F.col("a._ay") * F.col("a._n")
                - F.col("b._ay") * F.col("a._n")
                + F.col("a._sy")
            ).alias("_B"),
        )
    )
    agg = p2.groupBy(*g).agg(
        F.max("_n").alias("_n"),
        F.sum(F.col("_A") * F.col("_B")).alias("_sabd"),
        F.sum(F.col("_A") * F.col("_A")).alias("_saad"),
        F.sum(F.col("_B") * F.col("_B")).alias("_sbbd"),
    ).select(
        *g, "_n",
        s2d(F.col("_sabd")).alias("_sab"),
        s2d(F.col("_saad")).alias("_saa"),
        s2d(F.col("_sbbd")).alias("_sbb"),
    )
    nd = s2d(F.col("_n"))
    den6m2 = nd * nd * nd * nd * nd * nd * F.lit(float(m)) * F.lit(float(m))
    dcov2 = F.col("_sab") / den6m2
    dvx = F.col("_saa") / den6m2
    dvy = F.col("_sbb") / den6m2
    ok = (F.col("_n") >= 2) & (F.col("_saa") > 0) & (F.col("_sbb") > 0)
    dcor = F.when(
        ok, F.sqrt(F.greatest(dcov2 / F.sqrt(dvx * dvy), F.lit(0.0)))
    )
    # dcov2/dvar are one shared division tree over exact-int numerators
    # (deterministic raw doubles); only the sqrt-chained dcor takes the
    # libm 1e-9 grid — and it is in [0, 1], safely inside the
    # F.floor-BIGINT ceiling that value-scaled outputs would overflow
    q9 = 1.0e9
    qz = lambda c: F.floor(c * F.lit(q9) + F.lit(0.5)) / F.lit(q9)  # noqa: E731
    return agg.select(
        *g,
        F.col("_n").cast("bigint").alias("n"),
        dcov2.alias("dcov2"),
        dvx.alias("dvar_x"),
        dvy.alias("dvar_y"),
        qz(dcor).alias("dcor"),
    )


def distance_correlation_sql(
    data_sql: str,
    x_col: str,
    y_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`distance_correlation` (same integer
    double-centering over HUGEINT, same shared double tree)."""
    from timeseriesutils_spark.functions.exact import dlit
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10 ** int(scale)
    ga = ", ".join(f"a.{c}" for c in g)
    s2d = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731
    qz = lambda x: f"(FLOOR(({x}) * 1000000000.0 + 0.5) / 1000000000.0)"  # noqa: E731
    nd = s2d("_n")
    den = (
        f"({nd} * {nd} * {nd} * {nd} * {nd} * {nd}"
        f" * {dlit(float(m))} * {dlit(float(m))})"
    )
    dcov2 = f"(_sab / {den})"
    dvx = f"(_saa / {den})"
    dvy = f"(_sbb / {den})"
    dcor = (
        f"CASE WHEN _n >= 2 AND _saa > 0 AND _sbb > 0 THEN "
        f"SQRT(GREATEST({dcov2} / SQRT({dvx} * {dvy}), 0.0)) END"
    )
    return f"""
WITH d AS MATERIALIZED (
  SELECT {gsel},
    CAST(FLOOR(CAST({x_col} AS DOUBLE) * {m} + 0.5) AS BIGINT) AS _x,
    CAST(FLOOR(CAST({y_col} AS DOUBLE) * {m} + 0.5) AS BIGINT) AS _y,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY
      CAST(FLOOR(CAST({x_col} AS DOUBLE) * {m} + 0.5) AS BIGINT),
      CAST(FLOOR(CAST({y_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)) AS _i
  FROM ({data_sql})
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
rows0 AS MATERIALIZED (
  SELECT {ga}, a._i AS _i, MAX(a._x) AS _xi, MAX(a._y) AS _yi,
    CAST(COUNT(*) AS HUGEINT) AS _cnt,
    SUM(CAST(abs(a._x - b._x) AS HUGEINT)) AS _ax,
    SUM(CAST(abs(a._y - b._y) AS HUGEINT)) AS _ay
  FROM d a JOIN d b USING ({gsel})
  GROUP BY {ga}, a._i
),
tot AS (
  SELECT {gsel}, MAX(_cnt) AS _n, SUM(_ax) AS _sx, SUM(_ay) AS _sy
  FROM rows0 GROUP BY {gsel}
),
ri AS MATERIALIZED (
  SELECT r.*, t._n, t._sx, t._sy FROM rows0 r JOIN tot t USING ({gsel})
),
p2 AS (
  SELECT {ga}, a._n AS _n,
    CAST(abs(a._xi - b._xi) AS HUGEINT) * a._n * a._n
      - a._ax * a._n - b._ax * a._n + a._sx AS _A,
    CAST(abs(a._yi - b._yi) AS HUGEINT) * a._n * a._n
      - a._ay * a._n - b._ay * a._n + a._sy AS _B
  FROM ri a JOIN ri b USING ({gsel})
),
agg AS (
  SELECT {gsel}, MAX(_n) AS _n,
    {s2d('SUM(_A * _B)')} AS _sab,
    {s2d('SUM(_A * _A)')} AS _saa,
    {s2d('SUM(_B * _B)')} AS _sbb
  FROM p2 GROUP BY {gsel}
)
SELECT {gsel}, CAST(_n AS BIGINT) AS n,
  {dcov2} AS dcov2, {dvx} AS dvar_x, {dvy} AS dvar_y,
  {qz(dcor)} AS dcor
FROM agg
"""
