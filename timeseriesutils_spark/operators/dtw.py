"""Banded Dynamic Time Warping distance against a reference pattern —
the classic elastic similarity measure for "which series look like this
shape" queries (pattern scan / template matching), which no SQL window
algebra expresses: the DP recurrence's horizontal move makes each cell
depend on the cell just computed, so this is a genuine grouped-map
(``applyInPandas``) operator, the same tier as the FFT domfreq variant.

Per group: the series (ordered by ``order_by``, optionally z-normalized
per group) is aligned to the broadcast ``reference`` sequence with the
Sakoe–Chiba banded DP (moves: diagonal, vertical, horizontal; cost =
|x_i − y_j|).  The band is centered on the warped diagonal j ≈ i·m/n and widened
to at least |n−m| (the Sakoe–Chiba feasibility bound) so unequal
lengths stay finite; ``band=None`` means unconstrained.

Output: one row per group — ``n_obs``, ``dtw_dist`` (total alignment
cost), ``dtw_per_step`` (cost / (n + m), the length-normalized form
used for cross-series ranking).

Scale shape: one hash exchange on the group key; Arrow moves only
(group, value, order) columns; per-group work is O(n·band).  Three
kernels behind one boundary:

* ``loop`` — the executable spec: per-cell Python loop, the direct
  transcription of the recurrence.  Verify-tier only.
* ``vec`` (default) — the min-plus prefix-scan vectorization: within a
  row, ``cur[j] = c_j + min(a_j, cur[j-1])`` with
  ``a_j = min(prev[j], prev[j-1])`` unrolls to
  ``cur[j] = S_j + min_{k≤j}(a_k − S_{k-1})`` over the cost prefix sum
  ``S`` — one cumsum + one running-min per row, so the per-group cost
  is O(n) numpy calls instead of O(n·band) interpreter steps (~20×).
  The reassociated additions can differ from ``loop`` in the last ulp
  on float inputs (bit-identical on integer-valued costs below 2^53);
  both kernels are deterministic for a given input.
* ``numba`` — optional JIT of the loop kernel (bit-identical to
  ``loop``), picked automatically when numba is importable; this repo's
  container ships without it, the hook is for production clusters.

The operator output is rows-only vs the oracle by nature — the driver
records the weaker check; kernel equivalence and DP properties are
pinned in tests/test_dtw.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from timeseriesutils_spark.operators.window_features import _as_list


def _band_window(i: int, n: int, m: int, band: int | None) -> tuple[int, int]:
    """Row i's j-window [lo, hi] (1-based, inclusive).  Sakoe–Chiba
    feasibility: the band must cover at least the length difference or
    a length-skewed pair has rows with no finite predecessor."""
    if band is None:
        return 1, m
    r = max(band, abs(n - m))
    center = int(round(i * m / n))
    return max(1, center - r), min(m, center + r)


def dtw_kernel_loop(x: np.ndarray, y: np.ndarray, band: int | None) -> float:
    """Banded DTW alignment cost between 1-D float arrays (L1 step
    cost).  Per-cell Python loop — the executable spec the vectorized
    kernel is tested against."""
    n, m = len(x), len(y)
    if n == 0 or m == 0:
        return float("nan")
    INF = float("inf")
    prev = np.full(m + 1, INF)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, INF)
        lo, hi = _band_window(i, n, m, band)
        xi = x[i - 1]
        for j in range(lo, hi + 1):
            c = abs(xi - y[j - 1])
            best = prev[j]  # vertical
            if prev[j - 1] < best:
                best = prev[j - 1]  # diagonal
            if cur[j - 1] < best:
                best = cur[j - 1]  # horizontal
            cur[j] = c + best
        prev = cur
    return float(prev[m])


def dtw_kernel_vec(x: np.ndarray, y: np.ndarray, band: int | None) -> float:
    """Min-plus prefix-scan DTW kernel (see module docstring): the
    horizontal recurrence ``cur[j] = c_j + min(a_j, cur[j-1])`` is a
    running minimum over ``a_k − S_{k-1}`` shifted by the cost prefix
    sum ``S_j``, so each row is a handful of vectorized ops.  The
    window's left edge contributes no predecessor (``cur[lo-1] = inf``)
    because the scan simply starts at ``lo``."""
    n, m = len(x), len(y)
    if n == 0 or m == 0:
        return float("nan")
    INF = np.inf
    prev = np.full(m + 1, INF)
    prev[0] = 0.0
    for i in range(1, n + 1):
        lo, hi = _band_window(i, n, m, band)
        c = np.abs(x[i - 1] - y[lo - 1 : hi])  # c_j for j = lo..hi
        a = np.minimum(prev[lo : hi + 1], prev[lo - 1 : hi])  # min(vert, diag)
        s = np.cumsum(c)  # S_j − S_{lo-1}
        b = a.copy()
        b[1:] -= s[:-1]  # a_k − S_{k-1}  (S_{lo-1} = 0)
        cur = np.full(m + 1, INF)
        cur[lo : hi + 1] = s + np.minimum.accumulate(b)
        prev = cur
    return float(prev[m])


def _dtw_loop_flat(x, y, band):  # numba-compilable transcription of
    # dtw_kernel_loop: same ops in the same order (bit-identical), with
    # the band window inlined and band=None encoded as band=-1
    n, m = len(x), len(y)
    if n == 0 or m == 0:
        return np.nan
    INF = np.inf
    prev = np.full(m + 1, INF)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, INF)
        if band < 0:
            lo, hi = 1, m
        else:
            r = max(band, abs(n - m))
            center = int(round(i * m / n))
            lo = max(1, center - r)
            hi = min(m, center + r)
        xi = x[i - 1]
        for j in range(lo, hi + 1):
            c = abs(xi - y[j - 1])
            best = prev[j]
            if prev[j - 1] < best:
                best = prev[j - 1]
            if cur[j - 1] < best:
                best = cur[j - 1]
            cur[j] = c + best
        prev = cur
    return prev[m]


try:  # pragma: no cover - numba absent in this container
    from numba import njit as _njit

    _dtw_numba_jit = _njit(cache=True)(_dtw_loop_flat)

    def _dtw_numba(x, y, band):
        return float(_dtw_numba_jit(x, y, -1 if band is None else int(band)))

except Exception:  # ImportError or jit failure
    _dtw_numba = None


def dtw_kernel(
    x: np.ndarray, y: np.ndarray, band: int | None, engine: str = "auto"
) -> float:
    """Kernel dispatcher: ``auto`` → numba JIT when importable (bit-
    identical to ``loop``), else the vectorized scan.

    Orientation canonicalization: the DP's Python-level loop runs over
    the FIRST argument, so the shorter sequence is made the outer one —
    for a long series against a short template this cuts the
    interpreted step count by n/m (e.g. 19× for a 530-point series vs a
    28-point template) while each vectorized row grows to the longer
    length (where numpy is at its best).  DTW cost is symmetric in its
    arguments (L1 cell cost, symmetric move set); the Sakoe–Chiba
    window is computed in the canonical orientation, so every kernel
    sees the identical cell set and all engines agree bit-for-bit."""
    if len(x) > len(y):
        x, y = y, x
    if engine == "auto":
        engine = "numba" if _dtw_numba is not None else "vec"
    if engine == "numba" and _dtw_numba is not None:
        return _dtw_numba(x, y, band)
    if engine == "loop":
        return dtw_kernel_loop(x, y, band)
    return dtw_kernel_vec(x, y, band)


def dtw_to_reference(
    data: DataFrame,
    value_col: str,
    group_columns,
    order_by,
    reference: list[float],
    band: int | None = 10,
    z_normalize: bool = True,
    engine: str = "auto",
) -> DataFrame:
    """See module docstring."""
    g = _as_list(group_columns)
    order = _as_list(order_by)
    ref = np.asarray(list(reference), dtype=float)
    if z_normalize:
        rs = ref.std()
        ref = (ref - ref.mean()) / rs if rs > 0 else ref - ref.mean()
    ref_b = ref  # closed over; Spark serializes it with the UDF

    fields = [data.schema[c] for c in g]
    schema = StructType(
        list(fields)
        + [
            StructField("n_obs", LongType()),
            StructField("dtw_dist", DoubleType()),
            StructField("dtw_per_step", DoubleType()),
        ]
    )

    def per_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=float)
        x = x[~np.isnan(x)]
        if z_normalize and len(x):
            s = x.std()
            x = (x - x.mean()) / s if s > 0 else x - x.mean()
        d = dtw_kernel(x, ref_b, band, engine) if len(x) else float("nan")
        row = dict(zip([f.name for f in fields], keys))
        row.update(
            n_obs=len(x),
            dtw_dist=d,
            dtw_per_step=(d / (len(x) + len(ref_b))) if len(x) else None,
        )
        return pd.DataFrame([row])

    return (
        data.select(*g, value_col, *order)
        .groupBy(*g)
        .applyInPandas(per_group, schema)
    )
