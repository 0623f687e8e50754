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


def _band_arrays(n: int, m: int, band: int | None):
    """Per-row [lo, hi] windows (1-based, length-n int64 arrays) for the
    ORIGINAL (x, y) orientation — identical to calling
    :func:`_band_window` for each row."""
    if band is None:
        lo = np.ones(n, dtype=np.int64)
        hi = np.full(n, m, dtype=np.int64)
        return lo, hi
    r = max(band, abs(n - m))
    c = np.rint(np.arange(1, n + 1, dtype=np.float64) * m / n).astype(np.int64)
    return np.maximum(1, c - r), np.minimum(m, c + r)


def _band_arrays_transposed(n0: int, m0: int, band: int | None):
    """Per-row windows for running the DP TRANSPOSED (outer over the
    original y of length m0, inner over the original x of length n0)
    while visiting EXACTLY the original orientation's cell set.

    Cell (i, j) is in the original band iff |j − round(i·m0/n0)| ≤ r
    (the max/min clamps only trim to [1, m0], which every j satisfies),
    so for fixed j the admissible i's are a contiguous run of the
    nondecreasing centers array — two searchsorteds per row.  Without
    this transposition the Sakoe–Chiba window is NOT symmetric in its
    arguments (the half-width r is measured along different axes), and
    a shorter-outer swap would silently change banded costs for
    length-skewed pairs."""
    if band is None:
        lo = np.ones(m0, dtype=np.int64)
        hi = np.full(m0, n0, dtype=np.int64)
        return lo, hi
    r = max(band, abs(n0 - m0))
    c = np.rint(
        np.arange(1, n0 + 1, dtype=np.float64) * m0 / n0
    ).astype(np.int64)
    j = np.arange(1, m0 + 1, dtype=np.int64)
    lo = np.searchsorted(c, j - r, side="left").astype(np.int64) + 1
    hi = np.searchsorted(c, j + r, side="right").astype(np.int64)
    return lo, np.minimum(hi, n0)


def dtw_kernel_loop(
    x: np.ndarray, y: np.ndarray, band: int | None, windows=None
) -> float:
    """Banded DTW alignment cost between 1-D float arrays (L1 step
    cost).  Per-cell Python loop — the executable spec the vectorized
    kernel is tested against.  ``windows`` (optional (lo, hi) int64
    arrays, one entry per outer row) overrides the band computation —
    the dispatcher uses it to visit the original orientation's cell set
    after transposing."""
    n, m = len(x), len(y)
    if n == 0 or m == 0:
        return float("nan")
    INF = float("inf")
    prev = np.full(m + 1, INF)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, INF)
        if windows is not None:
            lo, hi = int(windows[0][i - 1]), int(windows[1][i - 1])
        else:
            lo, hi = _band_window(i, n, m, band)
        if lo > hi:
            prev = cur
            continue
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


def dtw_kernel_vec(
    x: np.ndarray, y: np.ndarray, band: int | None, windows=None
) -> float:
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
        if windows is not None:
            lo, hi = int(windows[0][i - 1]), int(windows[1][i - 1])
        else:
            lo, hi = _band_window(i, n, m, band)
        if lo > hi:
            prev = np.full(m + 1, INF)
            continue
        c = np.abs(x[i - 1] - y[lo - 1 : hi])  # c_j for j = lo..hi
        a = np.minimum(prev[lo : hi + 1], prev[lo - 1 : hi])  # min(vert, diag)
        s = np.cumsum(c)  # S_j − S_{lo-1}
        b = a.copy()
        b[1:] -= s[:-1]  # a_k − S_{k-1}  (S_{lo-1} = 0)
        cur = np.full(m + 1, INF)
        cur[lo : hi + 1] = s + np.minimum.accumulate(b)
        prev = cur
    return float(prev[m])


def _dtw_loop_flat(x, y, los, his):  # numba-compilable transcription of
    # dtw_kernel_loop: same ops in the same order (bit-identical), with
    # the per-row band window precomputed by the dispatcher (int64
    # arrays; full-range arrays encode band=None)
    n, m = len(x), len(y)
    if n == 0 or m == 0:
        return np.nan
    INF = np.inf
    prev = np.full(m + 1, INF)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, INF)
        lo = int(los[i - 1])
        hi = int(his[i - 1])
        if lo > hi:
            prev = cur
            continue
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

    def _dtw_numba(x, y, band, windows=None):
        if windows is None:
            windows = _band_arrays(len(x), len(y), band)
        return float(_dtw_numba_jit(x, y, windows[0], windows[1]))

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
    length (where numpy is at its best).  The cell cost |x_i − y_j| and
    the move set are symmetric, but the Sakoe–Chiba window is NOT —
    its half-width is measured along the outer axis — so after a swap
    the band is TRANSPOSED back into the original (x, y) orientation
    (:func:`_band_arrays_transposed`): every kernel visits exactly the
    original orientation's cell set regardless of which argument ends
    up outer, and the banded cost is invariant under the swap."""
    n0, m0 = len(x), len(y)
    windows = None
    if n0 > m0 and n0 and m0:
        windows = _band_arrays_transposed(n0, m0, band)
        x, y = y, x
    if engine == "auto":
        engine = "numba" if _dtw_numba is not None else "vec"
    if engine == "numba" and _dtw_numba is not None:
        return _dtw_numba(x, y, band, windows)
    if engine == "loop":
        return dtw_kernel_loop(x, y, band, windows)
    return dtw_kernel_vec(x, y, band, windows)


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


# --- exact (hash-capable) variant ------------------------------------------

_SENT = 1 << 50  # "infinity" for the integer DP: larger than any real
# alignment cost (≤ (n+m)·max|zq−rq| ≈ 600·6e7 ≈ 4e10) by five orders of
# magnitude, small enough that the bounded drift on unreachable cells
# (≤ one window cost-sum per row) can never approach int64 overflow.


def _znorm_quantized(vq: np.ndarray, scale_z: int) -> np.ndarray:
    """Exact per-group z-normalization of int64-quantized values,
    re-quantized to int64 z-scores.  Every float op is one fixed tree
    over exact-int-derived doubles — the SQL twin renders the SAME tree
    (sums < 2^53 cast exactly; the Σx² that can exceed 2^53 routes
    through round-to-nearest on both engines: Python float(int) here,
    VARCHAR→DOUBLE in DuckDB — the r8 HUGEINT-cast rule)."""
    n = len(vq)
    s = int(vq.sum(dtype=object)) if n else 0
    s2 = sum(int(v) * int(v) for v in vq)
    mean = float(s) / n
    var = (float(s2) - float(s) * float(s) / n) / n
    std = np.sqrt(var)  # nan when rounding makes var < 0 → unscaled branch
    zmult = float(10**scale_z)
    xf = vq.astype(np.float64)
    if std > 0:
        z = (xf - mean) / std * zmult + 0.5
    else:
        z = (xf - mean) + 0.5
    return np.floor(z).astype(np.int64)


def dtw_exact_kernel_int(zq: np.ndarray, rq: np.ndarray) -> int:
    """UNBANDED min-plus DTW over int64 sequences — exact integer
    arithmetic, so the prefix-scan reassociation is bit-identical to
    the per-cell loop (``dtw_kernel_loop``) and to the DuckDB
    ``list_reduce`` fold (:func:`dtw_to_reference_exact_sql`): sums and
    mins of integers below 2^53 are order-free."""
    m = len(rq)
    prev = np.full(m + 1, _SENT, dtype=np.int64)
    prev[0] = 0
    for xi in zq:
        c = np.abs(xi - rq)
        a = np.minimum(prev[1:], prev[:-1])
        s = np.cumsum(c)
        b = a.copy()
        b[1:] -= s[:-1]
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = _SENT
        cur[1:] = s + np.minimum.accumulate(b)
        prev = cur
    return int(prev[m])


def quantize_reference(reference, scale_z: int = 6) -> list[int]:
    """Driver-side z-normalize + quantize of the template — the int64
    literals BOTH engines embed (the literal-planes/permutations
    precedent: driver float math is fine, it renders once)."""
    ref = np.asarray(list(reference), dtype=float)
    rs = ref.std()
    ref = (ref - ref.mean()) / rs if rs > 0 else ref - ref.mean()
    return [int(v) for v in np.floor(ref * 10**scale_z + 0.5).astype(np.int64)]


def dtw_to_reference_exact(
    data: DataFrame,
    value_col: str,
    group_columns,
    order_by,
    reference: list[float],
    scale_in: int = 6,
    scale_z: int = 6,
) -> DataFrame:
    """Hash-capable declared variant of :func:`dtw_to_reference`:
    UNBANDED DTW over per-group z-normalized series with every float
    collapsed to int64 before any cross-row arithmetic —
    input quantized at ``scale_in``, z-scores re-quantized at
    ``scale_z`` (one shared double tree for mean/std), alignment cost
    in exact integers, one final /10^scale_z division.  The DuckDB
    twin (:func:`dtw_to_reference_exact_sql`) folds the identical DP
    with ``list_reduce`` — both engines produce the SAME int64, so the
    query is hash-green (the banded float-kernel
    :func:`dtw_to_reference` stays the production path; equivalence on
    integer-valued costs is pinned in tests/test_dtw.py)."""
    g = _as_list(group_columns)
    order = _as_list(order_by)
    rq = np.asarray(quantize_reference(reference, scale_z), dtype=np.int64)
    m = len(rq)
    zdiv = float(10**scale_z)
    mult = float(10**scale_in)

    fields = [data.schema[c] for c in g]
    schema = StructType(
        list(fields)
        + [
            StructField("n_obs", LongType()),
            StructField("dtw_dist", DoubleType()),
            StructField("dtw_per_step", DoubleType()),
        ]
    )

    src = data.filter(F.col(value_col).isNotNull()).select(
        *g,
        *order,
        F.floor(F.col(value_col).cast("double") * F.lit(mult) + F.lit(0.5))
        .cast("bigint")
        .alias("_vq"),
    )

    def per_group(keys, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        vq = pdf["_vq"].to_numpy(dtype=np.int64)
        n = len(vq)
        zq = _znorm_quantized(vq, scale_z)
        d_int = dtw_exact_kernel_int(zq, rq)
        dist = float(d_int) / zdiv
        row = dict(zip([f.name for f in fields], keys))
        row.update(n_obs=n, dtw_dist=dist, dtw_per_step=dist / (n + m))
        return pd.DataFrame([row])

    return src.groupBy(*g).applyInPandas(per_group, schema)


def dtw_to_reference_exact_sql(
    table: str,
    value_col: str,
    group_col: str,
    order_col: str,
    reference: list[float],
    scale_in: int = 6,
    scale_z: int = 6,
) -> str:
    """DuckDB twin of :func:`dtw_to_reference_exact`: the min-plus DP
    as a ``list_reduce`` fold — the accumulator is the current DP row
    (list of int64, index 1 = the j=0 boundary), each series element is
    a one-element list consumed per step, and the step body binds its
    per-row cost and prefix-sum vectors with single-element
    ``list_transform`` lambdas (DuckDB has no named step locals).
    Integer min/plus is associativity-free, so this fold, the Spark
    Arrow kernel, and the per-cell loop agree bit-for-bit."""
    rq = quantize_reference(reference, scale_z)
    m = len(rq)
    rq_lit = "[" + ", ".join(f"CAST({v} AS BIGINT)" for v in rq) + "]"
    mult = float(10**scale_in)
    zdiv = float(10**scale_z)
    init = (
        "[CAST(0 AS BIGINT)"
        + "".join(f", CAST({_SENT} AS BIGINT)" for _ in range(m))
        + "]"
    )
    # step(acc, e): bind cl (costs), then sl (prefix sums), then emit
    # the scanned row; acc[t+1]=prev[t], acc[t]=prev[t-1]
    step = f"""list_transform([[abs(e[1] - r) FOR r IN {rq_lit}]], cl ->
        list_transform([[CAST(list_sum(cl[1:k]) AS BIGINT) FOR k IN range(1, {m + 1})]], sl ->
          list_prepend(CAST({_SENT} AS BIGINT),
            [sl[k] + list_min([LEAST(acc[t + 1], acc[t])
                               - CASE WHEN t = 1 THEN 0 ELSE sl[t - 1] END
                               FOR t IN range(1, k + 1)])
             FOR k IN range(1, {m + 1})])
        )[1]
      )[1]"""
    return f"""
WITH src AS (
  SELECT {group_col} AS g, {order_col} AS o,
    CAST(FLOOR(CAST({value_col} AS DOUBLE) * {mult!r} + 0.5) AS BIGINT) AS vq
  FROM {table} WHERE {value_col} IS NOT NULL
),
st AS (
  SELECT g, COUNT(*) AS n,
    CAST(SUM(CAST(vq AS HUGEINT)) AS BIGINT) AS s,
    SUM(CAST(vq AS HUGEINT) * vq) AS s2
  FROM src GROUP BY g
),
mz AS (
  SELECT g, n, CAST(s AS DOUBLE) / n AS mean,
    SQRT((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / n) AS std
  FROM st
),
z AS (
  SELECT src.g, src.o,
    CASE WHEN std > 0
      THEN CAST(FLOOR((CAST(vq AS DOUBLE) - mean) / std * {zdiv!r} + 0.5) AS BIGINT)
      ELSE CAST(FLOOR((CAST(vq AS DOUBLE) - mean) + 0.5) AS BIGINT)
    END AS zq
  FROM src JOIN mz USING (g)
),
arr AS (
  SELECT g, MAX(n) AS n, list(zq ORDER BY o) AS xs
  FROM z JOIN st USING (g) GROUP BY g
),
dp AS (
  SELECT g, n,
    list_reduce(
      list_prepend({init}, [[x] FOR x IN xs]),
      (acc, e) -> {step}
    ) AS row
  FROM arr
)
SELECT g AS {group_col}, CAST(n AS BIGINT) AS n_obs,
  CAST(row[{m + 1}] AS DOUBLE) / {zdiv!r} AS dtw_dist,
  (CAST(row[{m + 1}] AS DOUBLE) / {zdiv!r}) / (n + {m}) AS dtw_per_step
FROM dp
"""
