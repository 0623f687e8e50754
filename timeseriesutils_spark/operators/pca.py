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
