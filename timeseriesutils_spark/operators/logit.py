"""Logistic-regression quality classifier trained by IRLS — the
GPT-3-style trained corpus filter (Brown et al. 2020 trained a linear
classifier over document features to select "high-quality" web text;
CCNet, FineWeb and Dolma all ship the same shape).  The catalog's
closed-form NB (:func:`text.nb_classifier`) is generative; this is the
DISCRIMINATIVE trainable filter, fit by iteratively reweighted least
squares:

    per round:  η = Xβ,  p = σ(η),  W = diag(p(1−p)),
                β ← (XᵀWX)⁻¹ Xᵀ(Wη + (y − p))

with the 4×4 normal-equations solve done by CRAMER over the SAME
generated Leibniz expansion both engines evaluate (the granger
``_det_pair`` machinery) — no matrix library, no driver-side linear
algebra beyond collecting four scalars per round (the kmeans/bpe
bounded-driver-state precedent).

Features (per document, all deterministic text statistics):
    x₀ = 1 (intercept), x₁ = ln(1 + n_words), x₂ = stopword ratio,
    x₃ = mean word length — the classic quality-signal triple.

Exactness (the lockstep-round discipline): features quantize at 1e-6;
β lives at 1e-6; per round η re-quantizes at 1e-6 and p at 1e-6
(clamped to [1, 10⁶−1] — the standard ε-clamp, which also keeps a
separable fit finite), so w = p_q(10⁶ − p_q) and the working response
are EXACT integers; every moment (10 upper-triangle XᵀWX entries + 4
RHS entries) accumulates in DECIMAL(38,0)/HUGEINT; with these grids
the unit factors cancel exactly and

    βq_j ← round( det(A with col j ← b) / det(A) )

— the determinant ratio IS the next 1e-6-unit coefficient, evaluated
as one generated double fold over string-cast exact integers.  Both
engines walk identical integer states round by round; the oracle is
one self-contained SQL statement (β rounds as chained one-row CTEs).

Scale shape: one feature projection (scan-bound), then per round ONE
map-combinable 14-sum aggregation over the feature frame + a 1-row
solve — constant reduce state at any corpus size, K rounds total.

Returns one row per document: (doc_id, label, p_hat, predicted,
correct) — the fitted probability and thresholded class, ready for
classification_report / gains_curve / calibration_curve.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.granger import _det_pair

_FX = 10**6  # feature grid
_FB = 10**6  # coefficient grid
_FP = 10**6  # probability grid
# η clamp, in 1e-6 units (ADVICE r13): beyond |η| = ln(10⁶−1) ≈ 13.82 the
# 1e-6-grid probability clamp saturates p at 1/10⁶ (and w with it), so
# clamping η itself at ±14 changes no non-saturated row while bounding
# the b-moment magnitudes BOTH engines accumulate: per row
# |x_j·_nz| ≤ 2·10⁷ · (2.5·10¹¹·1.4·10⁷ + 10¹⁸)·10⁶ ≈ 10³², giving
# DECIMAL(38,0)/HUGEINT lockstep headroom of ≥10⁶ worst-case-saturated
# documents and ≥10¹¹ typical ones — without the clamp a separable fit
# could push η past the grid and overflow Spark's DECIMAL silently
# (NULL) while DuckDB's HUGEINT raises, failing asymmetrically.
_ECAP = 14 * _FX


def _feature_cols(text_col: str):
    """Spark columns for the quantized feature triple (built lazily —
    HOF lambdas need an active SparkContext, so this must not run at
    catalog-import time)."""
    from timeseriesutils_spark.operators.text import GOPHER_STOPWORDS

    arr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    nw = F.size(arr)
    nstop = F.size(F.filter(arr, lambda x: x.isin(*GOPHER_STOPWORDS)))
    totlen = F.aggregate(
        F.transform(arr, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    qx = lambda c: F.floor(c * F.lit(_FX) + F.lit(0.5)).cast("bigint")  # noqa: E731
    cols = [
        F.lit(_FX).cast("bigint"),
        qx(F.log(F.lit(1.0) + nw.cast("double"))),
        qx(nstop.cast("double") / nw.cast("double")),
        qx(totlen.cast("double") / nw.cast("double")),
    ]
    return cols, nw


def _feature_sqls(text_col: str):
    """DuckDB strings for the same quantized feature triple (the
    shared-generator rule, rendered engine-side)."""
    from timeseriesutils_spark.operators.text import GOPHER_STOPWORDS

    sw = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    w_sql = f"string_split_regex(lower(trim({text_col})), '\\s+')"
    nw_s = f"len({w_sql})"
    nstop_s = f"len(list_filter({w_sql}, x -> x IN ({sw})))"
    totlen_s = f"list_sum(list_transform({w_sql}, x -> len(x)))"
    qx_s = lambda x: f"CAST(FLOOR(({x}) * {_FX} + 0.5) AS BIGINT)"  # noqa: E731
    sqls = [
        f"CAST({_FX} AS BIGINT)",
        qx_s(f"ln(1.0 + CAST({nw_s} AS DOUBLE))"),
        qx_s(f"CAST({nstop_s} AS DOUBLE) / CAST({nw_s} AS DOUBLE)"),
        qx_s(f"CAST({totlen_s} AS DOUBLE) / CAST({nw_s} AS DOUBLE)"),
    ]
    return sqls, nw_s


def _solve_exprs(get):
    """β update as Cramer det ratios over a moment accessor
    ``get(name) -> (Column, sql)`` — same generated expansion both
    engines (granger's shared-tree rule).  Moment names: a{j}{k}
    (j<=k), b{j}."""
    A = [[get(f"a{min(j, k)}{max(j, k)}") for k in range(4)] for j in range(4)]
    det_c, det_s = _det_pair(A)
    outs = []
    for j in range(4):
        Aj = [
            [get(f"b{r}") if c == j else A[r][c] for c in range(4)]
            for r in range(4)
        ]
        outs.append(_det_pair(Aj))
    return (det_c, det_s), outs


_dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
_s2d = lambda c: c.cast("string").cast("double")  # noqa: E731


def eta_q_col(beta, cols=None):
    """η re-quantized at 1e-6 from β literals (exact-int Σβq·xq over
    the feature columns, default _x0.._x3), clamped at ±_ECAP."""
    names = cols if cols is not None else [f"_x{j}" for j in range(4)]
    etan = None  # Σ βq_j xq_j  (1e-12 units of η)
    for j in range(4):
        term = _dec(F.lit(int(beta[j]))) * _dec(F.col(names[j]))
        etan = term if etan is None else etan + term
    eta = _s2d(etan) / F.lit(1.0e12)
    raw = F.floor(eta * F.lit(float(_FX)) + F.lit(0.5)).cast("bigint")
    return F.greatest(F.lit(-_ECAP), F.least(F.lit(_ECAP), raw))


def pq_from_eq_col(eq_col: str = "_eq"):
    """Clamped 1e-6-grid probability from a staged η column."""
    p = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.col(eq_col).cast("double") / F.lit(float(_FP))))
    )
    pq_raw = F.floor(p * F.lit(float(_FP)) + F.lit(0.5)).cast("bigint")
    return F.greatest(F.lit(1), F.least(F.lit(_FP - 1), pq_raw))


def _det_float(mat) -> float:
    """Leibniz determinant over plain floats with EXACTLY the term
    order and association of granger._det_pair's two arms (products
    left-associated, sum accumulated from 0.0 like the Spark fold and
    DuckDB's left-assoc + chain) — so a driver-side solve over the
    collected string-cast moments is bit-identical to evaluating the
    generated expression in either engine, without planting 24-term
    trees in the plan."""
    from itertools import permutations

    from timeseriesutils_spark.operators.granger import _perm_sign

    acc = 0.0
    k = len(mat)
    for p in permutations(range(k)):
        sgn = _perm_sign(p)
        c = mat[0][p[0]]
        for i in range(1, k):
            c = c * mat[i][p[i]]
        acc = acc + (c if sgn > 0 else -c)
    return acc


def solve_float(m: dict) -> tuple:
    """Cramer β solve over a {a{j}{k}/b{j}: float} moment dict — the
    float twin of :func:`_solve_exprs` (same matrices, same det
    shapes).  Returns (det, [det_j])."""
    A = [
        [m[f"a{min(j, k)}{max(j, k)}"] for k in range(4)] for j in range(4)
    ]
    d = _det_float(A)
    outs = []
    for j in range(4):
        Aj = [
            [m[f"b{r}"] if c == j else A[r][c] for c in range(4)]
            for r in range(4)
        ]
        outs.append(_det_float(Aj))
    return d, outs


def irls_fit(feats: DataFrame, n_rounds: int, init_beta=(0.0,) * 4):
    """The IRLS loop over a quantized feature frame (columns _y,
    _x0.._x3): K rounds of one map-combinable 14-sum aggregation + a
    1-row Cramer solve; returns the fitted β as 1e-6-grid ints.
    Shared by quality_logit (binary) and fasttext_classifier
    (one-vs-rest per class)."""
    beta = [int(math.floor(float(b) * _FB + 0.5)) for b in init_beta]
    for _ in range(int(n_rounds)):
        staged = (
            feats.select("*", eta_q_col(beta).alias("_eq"))
            .select("*", pq_from_eq_col().alias("_pq"))
            .select(
                "*", (F.col("_pq") * (F.lit(_FP) - F.col("_pq"))).alias("_w")
            )
        )
        # x1e6 (_FB): the Cramer ratio then lands directly in 1e-6
        # coefficient units (unit algebra in the module doc)
        num_z = (
            _dec(F.col("_w")) * _dec(F.col("_eq"))
            + _dec(
                (F.col("_y") * F.lit(_FP) - F.col("_pq")) * F.lit(_FP)
            ) * F.lit(_FP)
        ) * F.lit(_FB)
        staged = staged.select("*", num_z.alias("_nz"))
        aggs = []
        for j in range(4):
            for k in range(j, 4):
                aggs.append(
                    F.sum(
                        _dec(F.col(f"_x{j}")) * _dec(F.col(f"_x{k}"))
                        * _dec(F.col("_w"))
                    ).alias(f"a{j}{k}")
                )
        for j in range(4):
            aggs.append(
                F.sum(_dec(F.col(f"_x{j}")) * F.col("_nz")).alias(f"b{j}")
            )
        mom = staged.groupBy().agg(*aggs)
        # collect the string-cast double moments, then solve driver-side
        # (bit-identical to the generated det expressions — _det_float)
        row = mom.select(
            *[_s2d(F.col(c)).alias(c) for c in mom.columns]
        ).collect()[0]
        if any(row[c] is None for c in row.asDict()):
            break  # degenerate moments: keep the previous β
        d, outs = solve_float(row.asDict())
        if d == 0.0:
            break  # singular: keep the previous β (degenerate corpus)
        beta = [int(math.floor(outs[j] / d + 0.5)) for j in range(4)]
    return beta


def quality_logit(
    docs: DataFrame,
    label_expr=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_rounds: int = 4,
    init_beta: tuple = (0.0, 0.0, 0.0, 0.0),
) -> DataFrame:
    """IRLS-trained logistic quality classifier (module doc).
    ``label_expr``: boolean Column for the training label (default:
    ``lang = 'en'``).  ``init_beta``: warm-start coefficients (float
    units; quantized to the 1e-6 grid) — for incremental refits on a
    refreshed corpus, and the direct test surface for the η clamp."""
    spark = docs.sparkSession
    from timeseriesutils_spark.functions.cache import pin

    y = label_expr if label_expr is not None else (F.col("lang") == "en")
    cols, nw = _feature_cols(text_col)
    feats = pin(
        docs.filter(F.col(text_col).isNotNull())
        .filter(nw >= 1)
        .select(
            F.col(id_col).alias("_id"),
            y.cast("int").alias("_y"),
            *[c.alias(f"_x{j}") for j, c in enumerate(cols)],
        )
    )
    beta = irls_fit(feats, n_rounds, init_beta)
    scored = feats.select("*", eta_q_col(beta).alias("_eq")).select(
        "*", pq_from_eq_col().alias("_pq")
    )
    return scored.select(
        F.col("_id").alias(id_col),
        (F.col("_y") == 1).alias("label"),
        (F.col("_pq").cast("double") / F.lit(float(_FP))).alias("p_hat"),
        (F.col("_pq") * 2 > F.lit(_FP)).alias("predicted"),
        ((F.col("_pq") * 2 > F.lit(_FP)) == (F.col("_y") == 1)).alias(
            "correct"
        ),
    )


class _S:  # sql-side stand-in so _det_pair's * and + compose text
    def __init__(self, s):
        self.s = s

    def __mul__(self, other):
        return _S(f"{self.s} * {other.s}")

    def __add__(self, other):
        return _S(f"{self.s} + {other.s}")

    def __neg__(self):
        return _S(f"-({self.s})")


_s2d_sql = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731

# Σ βq_j·xq_j in 1e-12 η units, from a β CTE's q0..q3
ETAN_SQL = " + ".join(f"CAST(q{j} AS HUGEINT) * _x{j}" for j in range(4))


def irls_sql_chain(
    pfx: str,
    y_sql: str,
    n_rounds: int,
    init_beta=(0.0,) * 4,
    feat_cte: str = "f",
) -> tuple[list[str], str]:
    """One IRLS chain as CTE strings over a feature CTE (``feat_cte``
    must expose _x0.._x3 plus whatever ``y_sql`` reads): per round a
    per-doc state stage cross-joined with β, a 14-sum HUGEINT moment
    aggregate, and the generated Cramer expansion; a singular round
    keeps the previous β.  Names are prefixed with ``pfx`` so several
    chains (one-vs-rest classes) coexist in one statement.  Returns
    (ctes, final_beta_cte_name)."""
    K = int(n_rounds)
    s2d = _s2d_sql
    ctes = [
        f"{pfx}b0 AS (SELECT " + ", ".join(
            f"CAST({int(math.floor(float(init_beta[j]) * _FB + 0.5))} "
            f"AS BIGINT) AS q{j}"
            for j in range(4)
        ) + ")",
    ]
    state = f"""
  SELECT CAST(({y_sql}) AS INT) AS _y, _x0, _x1, _x2, _x3,
    GREATEST(CAST(-{_ECAP} AS BIGINT), LEAST(CAST({_ECAP} AS BIGINT),
      CAST(FLOOR(({s2d(f'({ETAN_SQL})')} / 1e12) * {_FX} + 0.5) AS BIGINT)
    )) AS _eq
  FROM {feat_cte} CROSS JOIN {{prev}}"""
    state2 = f"""
  SELECT *,
    GREATEST(1, LEAST({_FP - 1},
      CAST(FLOOR((1.0 / (1.0 + exp(-(CAST(_eq AS DOUBLE) / {float(_FP)!r}))))
           * {_FP} + 0.5) AS BIGINT))) AS _pq
  FROM {pfx}s{{k}}a"""
    get = lambda name: (_S(name), name)  # noqa: E731
    (det_pair, outs) = _solve_exprs(get)
    det_s = det_pair[1]
    moment_sums = []
    for j in range(4):
        for k2 in range(j, 4):
            moment_sums.append(
                f"SUM(CAST(_x{j} AS HUGEINT) * _x{k2} * _w) AS a{j}{k2}"
            )
    for j in range(4):
        moment_sums.append(f"SUM(CAST(_x{j} AS HUGEINT) * _nz) AS b{j}")
    mom_names = [f"a{j}{k2}" for j in range(4) for k2 in range(j, 4)] + [
        f"b{j}" for j in range(4)
    ]
    dbls = ", ".join(f"{s2d(n)} AS {n}" for n in mom_names)
    for k in range(1, K + 1):
        prev = f"{pfx}b{k - 1}"
        ctes.append(f"{pfx}s{k}a AS ({state.format(prev=prev)}\n)")
        ctes.append(f"{pfx}s{k}b AS ({state2.format(k=k)}\n)")
        ctes.append(
            f"""{pfx}s{k} AS (
  SELECT *, _pq * ({_FP} - _pq) AS _w,
    (CAST(_pq * ({_FP} - _pq) AS HUGEINT) * _eq
      + CAST((_y * {_FP} - _pq) * {_FP} AS HUGEINT) * {_FP}) * {_FB} AS _nz
  FROM {pfx}s{k}b
)"""
        )
        ctes.append(
            f"{pfx}m{k} AS (SELECT {', '.join(moment_sums)} FROM {pfx}s{k})"
        )
        ctes.append(f"{pfx}md{k} AS (SELECT {dbls} FROM {pfx}m{k})")
        qs = ", ".join(
            f"CASE WHEN d._d IS NULL OR d._d = 0.0 THEN p.q{j} "
            f"ELSE CAST(FLOOR(d._d{j} / d._d + 0.5) AS BIGINT) END AS q{j}"
            for j in range(4)
        )
        dets = ", ".join(
            [f"({det_s}) AS _d"]
            + [f"({outs[j][1]}) AS _d{j}" for j in range(4)]
        )
        ctes.append(f"{pfx}d{k} AS (SELECT {dets} FROM {pfx}md{k})")
        # MATERIALIZED: b{k} is referenced 4x by round k+1's eta chain
        # (and the singular fallback) — without it DuckDB re-inlines the
        # whole prior chain per reference, a 4^K planning blowup that
        # made deep-round twins unplannable (round-12 CTE discipline)
        ctes.append(
            f"{pfx}b{k} AS MATERIALIZED "
            f"(SELECT {qs} FROM {pfx}d{k} d CROSS JOIN {prev} p)"
        )
    return ctes, f"{pfx}b{K}"


def quality_logit_sql(
    table: str = "documents",
    label_sql: str = "lang = 'en'",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_rounds: int = 4,
    init_beta: tuple = (0.0, 0.0, 0.0, 0.0),
) -> str:
    """DuckDB twin of :func:`quality_logit`: the feature CTE plus one
    :func:`irls_sql_chain` (the bpe_train chained-CTE precedent), then
    the final scoring stage."""
    xs, nw_s = _feature_sqls(text_col)
    K = int(n_rounds)
    s2d = _s2d_sql
    feat_cols = ", ".join(f"{x} AS _x{j}" for j, x in enumerate(xs))
    ctes = [
        f"""f AS MATERIALIZED (
  SELECT {id_col} AS _id, CAST(({label_sql}) AS INT) AS _y, {feat_cols}
  FROM {table}
  WHERE {text_col} IS NOT NULL AND {nw_s} >= 1
)""",
    ]
    chain, _ = irls_sql_chain("", "_y", K, init_beta)
    ctes.extend(chain)
    fin_eta = ETAN_SQL
    return (
        "WITH " + ",\n".join(ctes) + f""",
fin AS (
  SELECT f._id, f._y,
    GREATEST(1, LEAST({_FP - 1},
      CAST(FLOOR((1.0 / (1.0 + exp(-(
        CAST(CAST(FLOOR(({s2d(f'({fin_eta})')} / 1e12) * {_FX} + 0.5)
             AS BIGINT) AS DOUBLE) / {float(_FP)!r}))))
        * {_FP} + 0.5) AS BIGINT))) AS _pq
  FROM f CROSS JOIN b{K}
)
SELECT _id AS {id_col}, _y = 1 AS label,
  CAST(_pq AS DOUBLE) / {float(_FP)!r} AS p_hat,
  _pq * 2 > {_FP} AS predicted,
  (_pq * 2 > {_FP}) = (_y = 1) AS correct
FROM fin
"""
    )
