"""Granger causality F-test (Granger 1969), bivariate, lag 1: does X's
past improve the prediction of Y beyond Y's own past?

    unrestricted:  y_t ~ c + a·y_{t-1} + b·x_{t-1}   → RSS_u
    restricted:    y_t ~ c + a·y_{t-1}               → RSS_r
    F = (RSS_r − RSS_u) / (RSS_u / (n − 3))

The catalog's ``granger_lag`` ranks lead-lag CORRELATIONS; this is the
actual nested-model test (the field's causality screen).  RSS comes
from the Schur-complement identity — for design moments M = Z'Z,
v = Z'y:

    RSS = det([[M, v], [v', S_yy]]) / det(M)

so no matrix inversion: each RSS is a ratio of two determinants over
the exact second-moment sums.  Both engines evaluate the SAME
determinant expansion: one Python generator emits the permutation
terms in one fixed order as a Spark Column tree AND the SQL text, so
the float summation order is identical (the shared-tree rule applied
to generated code).

Exactness: y/x floor-quantize to integers; every moment is an exact
DECIMAL/HUGEINT sum; determinants are fixed double trees over the
string-cast moments; F is floor-quantized at 1e-9.  Lags are
observation lags over the (group, order) window — on a gappy series
this is previous-OBSERVATION Granger (regularize first for calendar
lags), identical in both engines.

Scale shape: one window pass for the lags, one map-combinable
aggregation of 10 moments per group, then per-group scalar math —
nothing pairwise, reduce state constant in series length.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _perm_sign(p) -> int:
    s, seen = 1, set()
    p = list(p)
    for i in range(len(p)):
        if i in seen:
            continue
        j, ln = i, 0
        while j not in seen:
            seen.add(j)
            j = p[j]
            ln += 1
        if ln % 2 == 0:
            s = -s
    return s


def _det_pair(mat):
    """Determinant of a matrix of (Column, sql_str) pairs as a
    (Column, sql_str) pair — same Leibniz term order on both sides.

    The Spark sum is an ARRAY FOLD, not a + chain: Catalyst flattens
    and reorders long Add chains (measured: the 24-term 4×4 expansion
    diverged from DuckDB's left-associated chain in the last ulps), and
    a higher-order aggregate evaluates strictly sequentially —
    ((0+t₁)+t₂)+… equals the twin's left association exactly."""
    k = len(mat)
    col_terms, sql_terms = [], []
    for p in permutations(range(k)):
        sgn = _perm_sign(p)
        c = mat[0][p[0]][0]
        s = mat[0][p[0]][1]
        for i in range(1, k):
            c = c * mat[i][p[i]][0]
            s = f"{s} * {mat[i][p[i]][1]}"
        col_terms.append(c if sgn > 0 else -c)
        sql_terms.append(f"{'' if sgn > 0 else '-'}({s})")
    from pyspark.sql import Column

    if isinstance(col_terms[0], Column):
        col_acc = F.aggregate(
            F.array(*col_terms), F.lit(0.0), lambda a, x: a + x
        )
    else:  # SQL-renderer stand-ins: only the sql side is consumed
        col_acc = col_terms[0]
    return col_acc, "(" + " + ".join(sql_terms) + ")"


_MOMS = (
    ("n", None, None), ("sy1", "y1", None), ("sx1", "x1", None),
    ("sy1y1", "y1", "y1"), ("sy1x1", "y1", "x1"), ("sx1x1", "x1", "x1"),
    ("sy", "y", None), ("syy1", "y", "y1"), ("syx1", "y", "x1"),
    ("syy", "y", "y"),
)


def _granger_exprs(get):
    """Build (rss_r, rss_u, detm_r, detm_u) as (Column, sql) pairs from
    a moment accessor ``get(name) -> (Column, sql)``."""
    n, sy1, sx1 = get("n"), get("sy1"), get("sx1")
    sy1y1, sy1x1, sx1x1 = get("sy1y1"), get("sy1x1"), get("sx1x1")
    sy, syy1, syx1, syy = get("sy"), get("syy1"), get("syx1"), get("syy")
    m_r = [[n, sy1], [sy1, sy1y1]]
    b_r = [[n, sy1, sy], [sy1, sy1y1, syy1], [sy, syy1, syy]]
    m_u = [[n, sy1, sx1], [sy1, sy1y1, sy1x1], [sx1, sy1x1, sx1x1]]
    b_u = [
        [n, sy1, sx1, sy],
        [sy1, sy1y1, sy1x1, syy1],
        [sx1, sy1x1, sx1x1, syx1],
        [sy, syy1, syx1, syy],
    ]
    return (
        _det_pair(b_r), _det_pair(m_r), _det_pair(b_u), _det_pair(m_u)
    )


def granger_causality(
    df: DataFrame,
    y_col: str,
    x_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> DataFrame:
    """Per-group lag-1 Granger F-test of ``x_col`` → ``y_col`` (module
    doc).  Returns (group..., n, rss_r, rss_u, f_stat); NULL stats for
    degenerate groups (n <= 3 or singular moments)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    o = _as_list(order_by)
    m = 10 ** int(scale)
    q = lambda c: F.floor(  # noqa: E731
        F.col(c).cast("double") * F.lit(m) + F.lit(0.5)
    ).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731

    w = Window.partitionBy(*g).orderBy(*o)
    lagged = df.select(
        *g, q(y_col).alias("_y"),
        F.lag(q(y_col)).over(w).alias("_y1"),
        F.lag(q(x_col)).over(w).alias("_x1"),
    ).filter(F.col("_y1").isNotNull() & F.col("_x1").isNotNull())

    def prod(a, b):
        # cast each OPERAND to decimal before multiplying: a BIGINT
        # product wraps silently past ~9.2e18 in Spark (DuckDB raises),
        # so the widening must happen before the multiply (ADVICE r12)
        if a is None:
            return F.lit(1).cast("decimal(38,0)")
        c = dec(F.col(f"_{a}"))
        return c if b is None else c * dec(F.col(f"_{b}"))

    agg = lagged.groupBy(*g).agg(
        *[F.sum(dec(prod(a, b))).alias(name) for name, a, b in _MOMS]
    )
    # Materialize each determinant ONCE over pre-cast double moments:
    # inlining the folds into every consumer column re-evaluated ~15
    # interpreted 24-term folds (with fresh decimal->string->double
    # casts) per output row -- measured near-LINEAR 10x scaling until
    # this split (0.90 -> scan-bound)
    dbl = agg.select(
        *g,
        F.col("n").cast("bigint").alias("n"),
        *[s2d(F.col(name)).alias(f"{name}_d") for name, _, _ in _MOMS],
    )
    get = lambda name: (F.col(f"{name}_d"), name)  # noqa: E731
    (br_c, _), (mr_c, _), (bu_c, _), (mu_c, _) = _granger_exprs(get)
    dets = dbl.select(
        *g, "n", F.col("n_d"),
        br_c.alias("_br"), mr_c.alias("_mr"),
        bu_c.alias("_bu"), mu_c.alias("_mu"),
    )
    rss_r = F.col("_br") / F.col("_mr")
    rss_u = F.col("_bu") / F.col("_mu")
    f = (rss_r - rss_u) / (rss_u / (F.col("n_d") - F.lit(3.0)))
    ok = (F.col("n") > 3) & (F.col("_mr") != F.lit(0.0)) & (
        F.col("_mu") != F.lit(0.0)
    ) & (rss_u > F.lit(0.0))
    q9 = 1.0e9
    qz = lambda c: F.floor(c * F.lit(q9) + F.lit(0.5)) / F.lit(q9)  # noqa: E731
    mm = F.lit(float(m * m))
    return dets.select(
        *g,
        F.col("n"),
        F.when(ok, rss_r / mm).alias("rss_r"),
        F.when(ok, rss_u / mm).alias("rss_u"),
        F.when(ok, qz(f)).alias("f_stat"),
    )


def granger_causality_sql(
    data_sql: str,
    y_col: str,
    x_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`granger_causality` (same generated
    determinant expansion, same term order)."""
    from timeseriesutils_spark.functions.exact import dlit
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    o = _as_list(order_by)
    gsel = ", ".join(g)
    osel = ", ".join(o)
    m = 10 ** int(scale)
    q = lambda c: f"CAST(FLOOR(CAST({c} AS DOUBLE) * {m} + 0.5) AS BIGINT)"  # noqa: E731
    s2d = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731

    def prod(a, b):
        # operand-first HUGEINT cast (the Spark side widens each
        # operand to DECIMAL before the multiply — same no-wrap window)
        if a is None:
            return "CAST(1 AS HUGEINT)"
        if b is None:
            return f"CAST(_{a} AS HUGEINT)"
        return f"CAST(_{a} AS HUGEINT) * _{b}"

    moms = ", ".join(
        f"SUM({prod(a, b)}) AS {name}" for name, a, b in _MOMS
    )
    get = lambda name: (None, s2d(name))  # noqa: E731
    # reuse the shared generator; take the sql side of each pair
    import types

    class _S:  # minimal Column stand-in so the generator's * and + work
        def __init__(self, s):
            self.s = s
        def __mul__(self, other):
            return _S(f"{self.s} * {other.s}")
        def __add__(self, other):
            return _S(f"{self.s} + {other.s}")
        def __neg__(self):
            return _S(f"-({self.s})")

    get2 = lambda name: (_S(s2d(name)), s2d(name))  # noqa: E731
    (_, br), (_, mr), (_, bu), (_, mu) = _granger_exprs(get2)
    rss_r = f"({br} / {mr})"
    rss_u = f"({bu} / {mu})"
    f_expr = f"(({rss_r} - {rss_u}) / ({rss_u} / ({s2d('n')} - 3.0)))"
    ok = f"(n > 3 AND {mr} <> 0.0 AND {mu} <> 0.0 AND {rss_u} > 0.0)"
    qz = lambda x: f"(FLOOR(({x}) * 1000000000.0 + 0.5) / 1000000000.0)"  # noqa: E731
    mm = dlit(float(m * m))
    return f"""
WITH lagged AS (
  SELECT {gsel}, {q(y_col)} AS _y,
    LAG({q(y_col)}) OVER (PARTITION BY {gsel} ORDER BY {osel}) AS _y1,
    LAG({q(x_col)}) OVER (PARTITION BY {gsel} ORDER BY {osel}) AS _x1
  FROM ({data_sql})
),
agg AS (
  SELECT {gsel}, {moms}
  FROM lagged WHERE _y1 IS NOT NULL AND _x1 IS NOT NULL
  GROUP BY {gsel}
)
SELECT {gsel}, CAST(n AS BIGINT) AS n,
  CASE WHEN {ok} THEN {rss_r} / {mm} END AS rss_r,
  CASE WHEN {ok} THEN {rss_u} / {mm} END AS rss_u,
  CASE WHEN {ok} THEN {qz(f_expr)} END AS f_stat
FROM agg
"""
