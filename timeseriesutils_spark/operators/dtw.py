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
(group, value, order) columns; per-group work is O(n·band).  The inner
DP is a numpy row loop (the horizontal dependency serializes each row)
— adequate for verify-tier and moderate series; swap the kernel for a
numba/C implementation for monster groups, the call signature is the
boundary.  Deterministic: same group rows → same doubles, independent
of partitioning (rows-only vs the oracle by nature — the driver records
the weaker check; properties are pinned in tests/test_dtw.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from timeseriesutils_spark.operators.window_features import _as_list


def dtw_kernel(x: np.ndarray, y: np.ndarray, band: int | None) -> float:
    """Banded DTW alignment cost between 1-D float arrays (L1 step
    cost).  Pure numpy/python — deterministic, no randomness."""
    n, m = len(x), len(y)
    if n == 0 or m == 0:
        return float("nan")
    INF = float("inf")
    prev = np.full(m + 1, INF)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, INF)
        if band is None:
            lo, hi = 1, m
        else:
            # Sakoe–Chiba feasibility: the band must cover at least the
            # length difference or a length-skewed pair has rows with no
            # finite predecessor (cost = inf)
            r = max(band, abs(n - m))
            center = int(round(i * m / n))
            lo = max(1, center - r)
            hi = min(m, center + r)
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


def dtw_to_reference(
    data: DataFrame,
    value_col: str,
    group_columns,
    order_by,
    reference: list[float],
    band: int | None = 10,
    z_normalize: bool = True,
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
        d = dtw_kernel(x, ref_b, band) if len(x) else float("nan")
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
