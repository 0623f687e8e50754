"""Distributed PCA over an embedding column (array<float>).

The classic two-pass shape for covariance-based PCA at corpus scale:

  1. ONE distributed pass accumulates the sufficient statistics — count,
     per-dimension sum, and the d×d Gram matrix — as PARTIAL results per
     Arrow batch (``mapInPandas``: each batch reduces to a single
     (n, Σx, XᵀX) row, so the driver collect is O(#batches · d²), never
     O(rows)).  Products are quantized to int64 (see _QUANT_G) and the
     driver merges with arbitrary-precision Python ints — the statistics
     are therefore EXACT and associative: any partitioning yields
     bit-identical results.
  2. The driver eigendecomposes the d×d covariance (d ≤ a few thousand —
     microseconds for embedding-sized d) and broadcasts the top-k
     eigenvectors back as literal arrays; the projection pass is a pure
     JVM expression (quantized dot product, operators/similarity._QUANT)
     — no Python in the per-row path.

Eigenvector sign is normalized (largest-|component| coordinate made
positive) so the output is unique.  Not SQL-expressible (eigh) → the
declared query is rows-only; determinism across partitionings is what
the tests pin.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.similarity import _dot_dec

# Gram/mean quantization unit: embedding components are O(1), so per-batch
# int64 partial sums of round(x_i·x_j·1e12) stay far inside int64 for any
# realistic Arrow batch (10k rows × |x·x|≤~10² → ~1e18 worst case); the
# DRIVER merge uses Python ints (unbounded), so total corpus size never
# overflows.
_QUANT_G = 1e12


def _stats_schema(dim: int) -> str:
    return "n long, s array<long>, g array<long>"


def gram_stats(embeddings: DataFrame, vec_col: str, dim: int):
    """Exact (count, Σx·Q, XᵀX·Q) from one distributed pass; returns the
    merged Python-int triple on the driver."""

    def part(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            # quantize PER ROW, then integer-sum: the rounding never sees
            # batch boundaries, so any partitioning/batching yields the
            # same totals (per-batch float matmul then quantize would not)
            s = np.floor(x * _QUANT_G + 0.5).astype("int64").sum(axis=0)
            g = np.zeros((x.shape[1], x.shape[1]), dtype="int64")
            for lo in range(0, len(x), 256):  # bound the n×d×d temp
                xc = x[lo : lo + 256]
                g += (
                    np.floor(np.einsum("ni,nj->nij", xc, xc) * _QUANT_G + 0.5)
                    .astype("int64")
                    .sum(axis=0)
                )
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [s.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    rows = embeddings.select(vec_col).mapInPandas(part, _stats_schema(dim)).collect()
    n = sum(r.n for r in rows)
    s = [sum(int(r.s[i]) for r in rows) for i in range(dim)]
    g = [sum(int(r.g[i]) for r in rows) for i in range(dim * dim)]
    return n, s, g


def pca_project(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 2,
) -> DataFrame:
    """Project every vector onto the top-k principal components of the
    (mean-centered) corpus covariance.  Output: (id, pc1..pck) doubles.

    The Gram pass quantizes per row and sums integers, so the statistics
    — and therefore the components and projections — are bit-identical
    under any partitioning or Arrow batch size.
    """
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embeddings frame")
    dim = first.d
    n, s_q, g_q = gram_stats(embeddings, vec_col, dim)
    if n < 2:
        raise ValueError("need at least 2 vectors for PCA")
    mu = np.array(s_q, dtype="float64") / (_QUANT_G * n)
    gram = np.array(g_q, dtype="float64").reshape(dim, dim) / _QUANT_G
    cov = (gram - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh((cov + cov.T) / 2.0)  # exact symmetry
    comps = vecs[:, ::-1][:, :k]  # columns = top-k eigenvectors
    # sign convention: the largest-|x| coordinate of each component > 0
    for j in range(comps.shape[1]):
        i = int(np.abs(comps[:, j]).argmax())
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    cols = [F.col(id_col)]
    v = F.col(vec_col)
    for j in range(k):
        axis = F.array(*[F.lit(float(c)) for c in comps[:, j]])
        centered_dot = _dot_dec(v, axis) - F.lit(float(mu @ comps[:, j]))
        cols.append(centered_dot.alias(f"pc{j + 1}"))
    return embeddings.select(*cols)


# --- hash-checkable PCA: exact-integer power iteration --------------------
#
# eigh is driver-side LAPACK — no SQL twin can reproduce it bit-for-bit.
# The top component, however, is reachable through arithmetic BOTH engines
# (and the driver) compute identically:
#
#   * sufficient statistics (n, Σ floor(x·Qg+½), Σ floor(x_i·x_j·Qg+½))
#     are exact int64 sums — order-independent, already what gram_stats
#     produces and what SQL SUM(floor(...)) re-derives;
#   * the iteration matrix M = floor(cov·Qm+½) is built from those ints
#     through a FIXED double expression (int64→double conversion is
#     correctly rounded on every engine — hardware cvtsi2sd — so even
#     values beyond 2^53 convert identically);
#   * each power step w = M·v is exact integer arithmetic (|w| ≤
#     d·max|M|·Vs ≈ 2e18 < 2^63 for |cov| ≤ 0.6, the testdata bound;
#     the driver uses unbounded Python ints, DuckDB sums in HUGEINT);
#   * normalization divides by max|w| (an exact integer max — unlike an
#     L2 norm it needs no overflowing squares and no ordered float sum)
#     and re-quantizes through floor(w/mx·Vs+½) — identical IEEE ops;
#   * sign is fixed by the largest-|v| coordinate (ties → lower index),
#     the unit vector and projection reuse the quantized-dot pattern.
#
# The driver loop below and pca_power_project_sql express the SAME
# operation sequence, so the declared query hash-matches: PCA training,
# not just projection, is cross-engine verified.

_QM = 1e12   # cov quantization for the iteration matrix
_VSCALE = 100_000  # iteration vector fixed-point scale


def _power_component(
    n: int, s_q: list[int], g_q: list[int], dim: int, n_iter: int
) -> tuple[list[float], list[float]]:
    """Driver-side mirror of the SQL iteration CTEs: exact ints + fixed
    double expressions only.  Returns (mu, unit_component)."""
    import math

    mu = [float(s) / _QUANT_G / n for s in s_q]
    m_int: list[list[int]] = []
    for i in range(dim):
        row = []
        for j in range(dim):
            covd = (float(g_q[i * dim + j]) / _QUANT_G - n * mu[i] * mu[j]) / (n - 1)
            row.append(math.floor(covd * _QM + 0.5))
        m_int.append(row)
    v = [_VSCALE] * dim
    for _ in range(n_iter):
        w = [sum(m_int[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        mx = max(abs(x) for x in w)
        if mx == 0:  # degenerate (zero covariance) — direction undefined
            break
        v = [math.floor(float(x) / float(mx) * _VSCALE + 0.5) for x in w]
    i_star = min(range(dim), key=lambda i: (-abs(v[i]), i))
    if v[i_star] < 0:
        v = [-x for x in v]
    nm = math.sqrt(float(sum(x * x for x in v)))
    return mu, [float(x) / nm for x in v]


def pca_power_project(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 15,
) -> DataFrame:
    """(id, pc1): projection onto the top principal component derived by
    the exact-integer power iteration above — the hash-checkable PCA
    tier.  ``pca_project`` (eigh, any k) remains the general path."""
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embeddings frame")
    dim = first.d
    n, s_q, g_q = gram_stats(embeddings, vec_col, dim)
    if n < 2:
        raise ValueError("need at least 2 vectors for PCA")
    mu, u = _power_component(n, s_q, g_q, dim, n_iter)
    mus = ",".join(repr(x) for x in mu)
    us = ",".join(repr(x) for x in u)
    proj = (
        f"cast(aggregate(transform(sequence(0, {dim - 1}), i -> "
        f"floor((cast(element_at({vec_col}, i + 1) as double)"
        f" - element_at(array({mus}), i + 1))"
        f" * element_at(array({us}), i + 1) * 1e14 + 0.5)), "
        f"cast(0 as bigint), (a, x) -> a + x) as double) / 1e14"
    )
    return embeddings.select(F.col(id_col), F.expr(proj).alias("pc1"))


def pca_power_project_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 15,
) -> str:
    """DuckDB twin of :func:`pca_power_project` — statistics, iteration,
    sign/unit normalization, and projection as one unrolled CTE chain."""
    parts = [
        f"""
el AS MATERIALIZED (
  SELECT {id_col}, u.i AS i, CAST(u.x AS DOUBLE) AS x FROM (
    SELECT {id_col},
      unnest([{{'i': i, 'x': {vec_col}[i]}} FOR i IN range(1, len({vec_col}) + 1)]) AS u
    FROM {table}
  )
),
cnt AS (SELECT COUNT(*) AS n FROM {table}),
sq AS (SELECT i, CAST(SUM(CAST(floor(x * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
       FROM el GROUP BY i),
gq AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
         CAST(SUM(CAST(floor(a.x * b.x * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS g
       FROM el a JOIN el b ON a.{id_col} = b.{id_col} GROUP BY a.i, b.i),
mu AS (SELECT i, CAST(s AS DOUBLE) / 1e12 / n AS mu FROM sq, cnt),
m AS MATERIALIZED (
  SELECT g.i, g.j,
    CAST(floor((CAST(g.g AS DOUBLE) / 1e12 - n * ma.mu * mb.mu) / (n - 1)
               * 1e12 + 0.5) AS BIGINT) AS mv
  FROM gq g JOIN mu ma ON ma.i = g.i JOIN mu mb ON mb.i = g.j, cnt
),
v0 AS (SELECT i, CAST({_VSCALE} AS BIGINT) AS v FROM sq)"""
    ]
    prev = "v0"
    for t in range(1, n_iter + 1):
        parts.append(
            f"""
w{t} AS (SELECT m.i, CAST(SUM(m.mv * p.v) AS BIGINT) AS w
         FROM m JOIN {prev} p ON p.i = m.j GROUP BY m.i),
x{t} AS (SELECT MAX(ABS(w)) AS mx FROM w{t}),
v{t} AS MATERIALIZED (SELECT i,
           CAST(floor(CAST(w AS DOUBLE) / CAST(mx AS DOUBLE) * {_VSCALE} + 0.5)
                AS BIGINT) AS v
         FROM w{t}, x{t})"""
        )
        prev = f"v{t}"
    parts.append(
        f"""
st AS (SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
       FROM {prev} ORDER BY ABS(v) DESC, i LIMIT 1),
vf AS (SELECT i, v * sg AS v FROM {prev}, st),
nr AS (SELECT SQRT(CAST(SUM(v * v) AS DOUBLE)) AS nm FROM vf),
un AS (SELECT i, CAST(v AS DOUBLE) / nm AS u FROM vf, nr)"""
    )
    body = f"""
SELECT el.{id_col},
  CAST(SUM(CAST(floor((el.x - mu.mu) * un.u * 1e14 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1e14 AS pc1
FROM el JOIN mu ON mu.i = el.i JOIN un ON un.i = el.i
GROUP BY el.{id_col}
"""
    return "WITH " + ",".join(parts) + body


# --- k=2 power-deflation variant (hash-capable) ----------------------------


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division — DuckDB's ``//`` truncates toward
    zero (−7//2 = −3) while Python's floors (−4); every deflation
    division below uses THIS so the driver mirror and the SQL twin
    agree on negative operands."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _power_iterate(m_int: list[list[int]], dim: int, n_iter: int) -> list[int]:
    """Raw fixed-point power iteration (no sign/unit normalization) —
    the driver mirror of one unrolled SQL chain."""
    import math

    v = [_VSCALE] * dim
    for _ in range(n_iter):
        w = [sum(m_int[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            break
        v = [math.floor(float(x) / float(mx) * _VSCALE + 0.5) for x in w]
    return v


def _sign_unit(v: list[int]) -> list[float]:
    """Largest-|coordinate|-positive sign convention + unit norm (the
    same double tree the SQL twin renders)."""
    import math

    i_star = min(range(len(v)), key=lambda i: (-abs(v[i]), i))
    if v[i_star] < 0:
        v = [-x for x in v]
    nm = math.sqrt(float(sum(x * x for x in v)))
    return [float(x) / nm for x in v]


_QM_INT = 10**12  # integer twin of _QM for the deflation divisions


def _deflate_int(
    m_int: list[list[int]], v: list[int], dim: int
) -> list[list[int]]:
    """Integer Hotelling deflation M − λ·v vᵀ/(vᵀv) with a FIXED
    truncating-division schedule (λ̂ = ⌊vᵀMv / vᵀv⌋ at the matrix's
    own 1e12 quantization; the rank-1 term routes through one
    pre-scaled ⌊v_i·v_j·1e12 / vᵀv⌋ so no intermediate leaves HUGEINT
    range) — bit-identical to the SQL twin's HUGEINT arithmetic."""
    den = sum(x * x for x in v)
    lam_num = sum(
        v[i] * m_int[i][j] * v[j] for i in range(dim) for j in range(dim)
    )
    lam = _tdiv(lam_num, den)
    out = []
    for i in range(dim):
        row = []
        for j in range(dim):
            c = _tdiv(v[i] * v[j] * _QM_INT, den)
            row.append(m_int[i][j] - _tdiv(lam * c, _QM_INT))
        out.append(row)
    return out


def _cov_int(n: int, s_q: list[int], g_q: list[int], dim: int):
    """(mu, 1e12-quantized covariance ints) — shared by both power
    tiers (the same expressions :func:`_power_component` renders)."""
    import math

    mu = [float(s) / _QUANT_G / n for s in s_q]
    m_int: list[list[int]] = []
    for i in range(dim):
        row = []
        for j in range(dim):
            covd = (float(g_q[i * dim + j]) / _QUANT_G - n * mu[i] * mu[j]) / (
                n - 1
            )
            row.append(math.floor(covd * _QM + 0.5))
        m_int.append(row)
    return mu, m_int


def pca_power2_project(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 15,
) -> DataFrame:
    """(id, pc1, pc2): top-2 principal projection via exact-integer
    power iteration + integer Hotelling deflation — the hash-capable
    k=2 tier (``pca_project``'s driver eigh stays the general-k
    production path; the two agree to the iteration's convergence,
    pinned in tests).  Every stage is exact ints or one shared double
    tree, so the DuckDB twin (:func:`pca_power2_project_sql`)
    reproduces the components and projections bit-for-bit."""
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embeddings frame")
    dim = first.d
    n, s_q, g_q = gram_stats(embeddings, vec_col, dim)
    if n < 2:
        raise ValueError("need at least 2 vectors for PCA")
    mu, m_int = _cov_int(n, s_q, g_q, dim)
    v1 = _power_iterate(m_int, dim, n_iter)
    v2 = _power_iterate(_deflate_int(m_int, v1, dim), dim, n_iter)
    u1, u2 = _sign_unit(v1), _sign_unit(v2)
    mus = ",".join(repr(x) for x in mu)

    def proj(u: list[float], name: str):
        us = ",".join(repr(x) for x in u)
        return F.expr(
            f"cast(aggregate(transform(sequence(0, {dim - 1}), i -> "
            f"floor((cast(element_at({vec_col}, i + 1) as double)"
            f" - element_at(array({mus}), i + 1))"
            f" * element_at(array({us}), i + 1) * 1e14 + 0.5)), "
            f"cast(0 as bigint), (a, x) -> a + x) as double) / 1e14"
        ).alias(name)

    return embeddings.select(F.col(id_col), proj(u1, "pc1"), proj(u2, "pc2"))


def _iter_chain_sql(mat: str, pfx: str, n_iter: int, start: str) -> tuple[str, str]:
    """Unrolled power-iteration CTE chain over matrix CTE ``mat``
    (columns i, j, mv), vectors named {pfx}v{t}; returns (sql, final)."""
    parts = []
    prev = start
    for t in range(1, n_iter + 1):
        parts.append(
            f"""
{pfx}w{t} AS (SELECT m.i, CAST(SUM(m.mv * p.v) AS BIGINT) AS w
         FROM {mat} m JOIN {prev} p ON p.i = m.j GROUP BY m.i),
{pfx}x{t} AS (SELECT MAX(ABS(w)) AS mx FROM {pfx}w{t}),
{pfx}v{t} AS MATERIALIZED (SELECT i,
           CAST(floor(CAST(w AS DOUBLE) / CAST(mx AS DOUBLE) * {_VSCALE} + 0.5)
                AS BIGINT) AS v
         FROM {pfx}w{t}, {pfx}x{t})"""
        )
        prev = f"{pfx}v{t}"
    return ",".join(parts), prev


def pca_power2_project_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_iter: int = 15,
) -> str:
    """DuckDB twin of :func:`pca_power2_project`: stats + chain 1 +
    HUGEINT deflation + chain 2 + two projections, one WITH pipeline."""
    chain1, v1 = _iter_chain_sql("m", "a", n_iter, "v0")
    chain2, v2 = _iter_chain_sql("m2", "b", n_iter, "b0")
    stats = f"""
el AS MATERIALIZED (
  SELECT {id_col}, u.i AS i, CAST(u.x AS DOUBLE) AS x FROM (
    SELECT {id_col},
      unnest([{{'i': i, 'x': {vec_col}[i]}} FOR i IN range(1, len({vec_col}) + 1)]) AS u
    FROM {table}
  )
),
cnt AS (SELECT COUNT(*) AS n FROM {table}),
sq AS (SELECT i, CAST(SUM(CAST(floor(x * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
       FROM el GROUP BY i),
gq AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
         CAST(SUM(CAST(floor(a.x * b.x * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS g
       FROM el a JOIN el b ON a.{id_col} = b.{id_col} GROUP BY a.i, b.i),
mu AS (SELECT i, CAST(s AS DOUBLE) / 1e12 / n AS mu FROM sq, cnt),
m AS MATERIALIZED (
  SELECT g.i, g.j,
    CAST(floor((CAST(g.g AS DOUBLE) / 1e12 - n * ma.mu * mb.mu) / (n - 1)
               * 1e12 + 0.5) AS BIGINT) AS mv
  FROM gq g JOIN mu ma ON ma.i = g.i JOIN mu mb ON mb.i = g.j, cnt
),
v0 AS (SELECT i, CAST({_VSCALE} AS BIGINT) AS v FROM sq)"""
    deflate = f"""
dden AS (SELECT CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS den FROM {v1}),
dlam AS (SELECT ln // den AS lam FROM (
    SELECT CAST(SUM(CAST(p.v AS HUGEINT) * m.mv * q.v) AS HUGEINT) AS ln
    FROM m JOIN {v1} p ON p.i = m.i JOIN {v1} q ON q.i = m.j
  ), dden),
m2 AS MATERIALIZED (
  SELECT m.i, m.j,
    m.mv - CAST(
      (lam * ((CAST(p.v AS HUGEINT) * q.v * {_QM_INT}) // den)) // {_QM_INT}
      AS BIGINT) AS mv
  FROM m JOIN {v1} p ON p.i = m.i JOIN {v1} q ON q.i = m.j, dlam, dden
),
b0 AS (SELECT i, CAST({_VSCALE} AS BIGINT) AS v FROM sq)"""

    def unit(v: str, pfx: str) -> str:
        return f"""
{pfx}st AS (SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END AS sg
       FROM {v} ORDER BY ABS(v) DESC, i LIMIT 1),
{pfx}vf AS (SELECT i, v * sg AS v FROM {v}, {pfx}st),
{pfx}nr AS (SELECT SQRT(CAST(SUM(v * v) AS DOUBLE)) AS nm FROM {pfx}vf),
{pfx}un AS (SELECT i, CAST(v AS DOUBLE) / nm AS u FROM {pfx}vf, {pfx}nr)"""

    body = f"""
SELECT el.{id_col},
  CAST(SUM(CAST(floor((el.x - mu.mu) * u1.u * 1e14 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1e14 AS pc1,
  CAST(SUM(CAST(floor((el.x - mu.mu) * u2.u * 1e14 + 0.5) AS BIGINT)) AS DOUBLE)
    / 1e14 AS pc2
FROM el JOIN mu ON mu.i = el.i
JOIN aun u1 ON u1.i = el.i JOIN bun u2 ON u2.i = el.i
GROUP BY el.{id_col}
"""
    return (
        "WITH "
        + stats
        + ","
        + chain1
        + ","
        + deflate
        + ","
        + chain2
        + ","
        + unit(v1, "a")
        + ","
        + unit(v2, "b")
        + body
    )
