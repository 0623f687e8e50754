"""Series-complexity features: permutation entropy and the Hurst
exponent — the catch22/tsfresh-style signal-complexity summaries that
sit next to ACF/seasonal-strength in a feature screen ("is this series
structured or noise, mean-reverting or trending?").

Both are expressed entirely with built-in expressions on one series
exchange (window pass) plus map-combinable aggregations — no Python in
the hot path, and every cross-row float reduction follows the repo's
exactness discipline (integer counts, or quantize-to-int64 before the
sum), so results are bit-identical to the DuckDB twins.

Reference parity: the reference engine (featurize.py) has no
complexity features; these extend the §2.2 capability surface the way
domfreq extends its spectral intent — standard definitions from the
public literature (Bandt & Pompe 2002 for permutation entropy; the
aggregated-variance method of Beran 1994 for Hurst).

Scale shape: permutation entropy is one window pass + two
map-combinable aggregations (rows → (group, pattern) → group).  Hurst
is one window pass (per-group row index) + two pipelined aggregations
on the SAME group-key partitioning (rows → top-size blocks carrying a
position-ordered array → group), with every level's block statistics
fixed array expressions — one exchange, one fact scan, zero joins.
Nothing is driver-side; both hold at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit
from timeseriesutils_spark.operators.window_features import _as_list, make_window

# permutation codes of the 6 orderings of a (lag2, lag1, current)
# triple under rank-with-position-tie-break; code = r0*9 + r1*3 + r2
# where r_i = #{j: x_j < x_i} + #{j < i: x_j = x_i}
_PERM3_CODES = (5, 7, 11, 15, 19, 21)
_LN6 = math.log(6.0)


def permutation_entropy(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
) -> DataFrame:
    """Per-group normalized permutation entropy of order m=3
    (Bandt & Pompe 2002): embed the series as overlapping
    (x_{t-2}, x_{t-1}, x_t) triples, map each to one of 3! = 6 ordinal
    patterns, and return the Shannon entropy of the pattern histogram
    normalized by ln 6 — 0 for a monotone series, →1 for white noise.

    Ties break by position (the earlier element ranks lower), so the
    pattern id is a total function of the raw doubles — comparisons
    are deterministic across engines, no quantization needed.  The
    6-term entropy sum is a FIXED expression tree over the pivoted
    pattern counts (never a float SUM across rows), so the result is
    bit-identical to the SQL twin.

    Returns (groups…, n_triples, pe_norm); groups with fewer than 3
    observations yield no row (no triples exist).
    """
    g = _as_list(group_columns)
    w = make_window(g, _as_list(order_by))
    x0 = F.lag(column, 2).over(w)
    x1 = F.lag(column, 1).over(w)
    x2 = F.col(column)
    b = lambda c: c.cast("int")  # noqa: E731
    r0 = b(x1 < x0) + b(x2 < x0)
    r1 = b(x0 < x1) + b(x2 < x1) + b(x0 == x1)
    r2 = b(x0 < x2) + b(x1 < x2) + b(x0 == x2) + b(x1 == x2)
    code = (r0 * 9 + r1 * 3 + r2).cast("int")
    codes = data.select(*g, code.alias("_pat")).filter(F.col("_pat").isNotNull())
    agg = codes.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_triples"),
        *[
            F.sum(F.when(F.col("_pat") == k, 1).otherwise(0)).alias(f"_c{k}")
            for k in _PERM3_CODES
        ],
    )
    # each −p·ln p term quantizes to 1e-9 int units before the 6-term
    # combine (the value_entropy discipline): engine ln() can differ by
    # one ulp between the JVM and DuckDB, and quantization absorbs it
    n = F.col("n_triples").cast("double")
    ent = None
    for k in _PERM3_CODES:
        p = F.col(f"_c{k}").cast("double") / n
        t = F.when(
            F.col(f"_c{k}") > 0,
            F.floor(-(p * F.log(p)) * F.lit(1e9) + F.lit(0.5)).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        ent = t if ent is None else ent + t
    pe = ent.cast("double") / F.lit(1e9) / F.lit(_LN6)
    return agg.select(*g, "n_triples", pe.alias("pe_norm"))


def permutation_entropy_sql(
    table: str,
    column: str,
    group_columns,
    order_by,
) -> str:
    """DuckDB twin of :func:`permutation_entropy` — identical rank
    expressions, identical fixed-order 6-term entropy tree."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    o = ", ".join(_as_list(order_by))
    over = f"(PARTITION BY {gsel} ORDER BY {o})"
    x0 = f"LAG({column}, 2) OVER {over}"
    x1 = f"LAG({column}, 1) OVER {over}"
    x2 = column
    b = lambda c: f"CAST(({c}) AS INT)"  # noqa: E731
    r0 = f"({b(f'{x1} < {x0}')} + {b(f'{x2} < {x0}')})"
    r1 = f"({b(f'{x0} < {x1}')} + {b(f'{x2} < {x1}')} + {b(f'{x0} = {x1}')})"
    r2 = (
        f"({b(f'{x0} < {x2}')} + {b(f'{x1} < {x2}')}"
        f" + {b(f'{x0} = {x2}')} + {b(f'{x1} = {x2}')})"
    )
    counts = ",\n    ".join(
        f"SUM(CASE WHEN _pat = {k} THEN 1 ELSE 0 END) AS _c{k}"
        for k in _PERM3_CODES
    )
    p = lambda k: f"(CAST(_c{k} AS DOUBLE) / CAST(n_triples AS DOUBLE))"  # noqa: E731
    term = lambda k: (  # noqa: E731
        f"CASE WHEN _c{k} > 0 THEN "
        f"CAST(FLOOR(-({p(k)} * ln({p(k)})) * 1e9 + 0.5) AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END"
    )
    # identical left-fold order as the Spark expression tree
    ent = term(_PERM3_CODES[0])
    for k in _PERM3_CODES[1:]:
        ent = f"({ent} + {term(k)})"
    return f"""
WITH pats AS (
  SELECT {gsel}, ({r0} * 9 + {r1} * 3 + {r2}) AS _pat
  FROM {table}
  QUALIFY _pat IS NOT NULL
), agg AS (
  SELECT {gsel}, COUNT(*) AS n_triples,
    {counts}
  FROM pats GROUP BY {gsel}
)
SELECT {gsel}, n_triples,
  CAST(({ent}) AS DOUBLE) / 1e9 / {dlit(_LN6)} AS pe_norm
FROM agg
"""


_LN2 = math.log(2.0)


def hurst_exponent(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    n_levels: int = 5,
    scale: int = 2,
    engine: str = "sql",
) -> DataFrame:
    """Per-group Hurst exponent by the aggregated-variance method
    (Beran 1994): aggregate the series into non-overlapping blocks of
    size s = 1, 2, 4, …, 2^(n_levels−1), compute the variance of the
    complete-block means at each size, and fit
    ln Var(s) ≈ c + (2H − 2)·ln s by least squares over the level
    ladder — H ≈ 0.5 for iid noise, > 0.5 for trending/persistent
    series, < 0.5 for mean-reverting ones.

    Because the block-size grid is fixed, the OLS slope collapses to a
    centered weighted sum Σ_k (k − k̄)·ln Var_k / (Σ_k (k − k̄)²·ln 2)
    — a fixed expression tree over one ln per level, bit-identical to
    the SQL twin (values are quantized to 10^-scale units, block sums
    and squared block sums accumulate exactly in DECIMAL(38,0) /
    HUGEINT, and each Var_k is one double expression over those exact
    integers).

    Distribution: ONE pass — a per-group row_number assigns positions,
    rows group into top-size blocks (2^(n_levels−1) rows) carrying a
    position-ordered value array, and every level's block-sum
    statistics are FIXED array expressions over that array (a size-s
    block at any level is an aligned slice of its top block; a group's
    row positions are contiguous, so the only incomplete block is the
    tail and its present positions are a prefix).  Net plan: one
    exchange on the group key, two pipelined aggregations, zero joins,
    zero plan forks — the branched per-level formulation re-scans the
    fact table once per level (measured; the nowcast-triangle lesson).
    Incomplete sub-blocks are excluded from every variance.

    Returns (groups…, n, hurst) — one row per group; groups lacking
    ≥ 2 complete blocks at the top level or with any zero variance
    level carry a NULL hurst (underpowered, not dropped).
    """
    if n_levels < 2:
        raise ValueError("need at least 2 levels for a slope")
    g = _as_list(group_columns)
    w = make_window(g, _as_list(order_by))
    m = float(10**scale)
    top = 2 ** (n_levels - 1)
    q = F.floor(F.col(column) * F.lit(m) + F.lit(0.5)).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rows = data.filter(F.col(column).isNotNull()).select(
        *g,
        (F.row_number().over(w) - 1).alias("_b"),
        q.alias("_s"),
    )
    blocks = rows.groupBy(*g, F.floor(F.col("_b") / top).alias("_blk")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct((F.col("_b") % top).alias("p"), F.col("_s").alias("s")))),
            lambda x: x["s"],
        ).alias("_arr"),
    )
    arr = F.col("_arr")
    sz = F.size(arr)

    def subsum(k: int, j: int):
        """Exact sum of the j-th size-2^k slice, DECIMAL to keep the
        square exact; None-guarded by completeness at the call site."""
        s = 2**k
        e = F.element_at(arr, j * s + 1).cast("decimal(38,0)")
        for i in range(2, s + 1):
            e = e + F.element_at(arr, j * s + i).cast("decimal(38,0)")
        return e

    aggs = []
    if engine == "sql":
        # round-14 (guide §7.3, the ets/simhash precedent): the
        # ~31-sub-block level ladder renders as SQL text — a handful
        # of py4j round trips instead of ~700 Column calls.  Every
        # staged quantity here is an EXACT integer (BIGINT counts,
        # DECIMAL slice sums/squares), so association order is free
        # and the aggregated values are identical by construction
        # (pinned vs engine="colapi").
        D = "DECIMAL(38,0)"

        def subsum_t(k: int, j: int) -> str:
            s = 2**k
            return " + ".join(
                f"CAST(element_at(_arr, {j * s + i}) AS {D})"
                for i in range(1, s + 1)
            )

        for k in range(n_levels):
            s = 2**k
            nsub = top // s
            cnt_t, ssum_t, qsum_t = [], [], []
            for j in range(nsub):
                full = f"size(_arr) >= {(j + 1) * s}"
                v = f"({subsum_t(k, j)})"
                cnt_t.append(f"(CASE WHEN {full} THEN 1 ELSE 0 END)")
                ssum_t.append(
                    f"(CASE WHEN {full} THEN {v} ELSE CAST(0 AS {D}) END)"
                )
                qsum_t.append(
                    f"(CASE WHEN {full} THEN {v} * {v} "
                    f"ELSE CAST(0 AS {D}) END)"
                )
            aggs += [
                F.expr(
                    f"SUM(CAST({' + '.join(cnt_t)} AS BIGINT)) AS _B{k}"
                ),
                F.expr(
                    f"SUM(CAST({' + '.join(ssum_t)} AS {D})) AS _S{k}"
                ),
                F.expr(
                    f"SUM(CAST({' + '.join(qsum_t)} AS {D})) AS _Q{k}"
                ),
            ]
    else:
        for k in range(n_levels):
            s = 2**k
            nsub = top // s
            # complete sub-blocks of this top block: the present
            # positions are a prefix, so sub-block j is complete iff
            # size ≥ (j+1)·s
            cnt = None
            ssum = None
            qsum = None
            for j in range(nsub):
                full = sz >= (j + 1) * s
                v = subsum(k, j)
                c1 = F.when(full, F.lit(1)).otherwise(F.lit(0))
                sv = F.when(full, v).otherwise(F.lit(0).cast("decimal(38,0)"))
                qv = F.when(full, v * v).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
                cnt = c1 if cnt is None else cnt + c1
                ssum = sv if ssum is None else ssum + sv
                qsum = qv if qsum is None else qsum + qv
            aggs += [
                F.sum(cnt.cast("bigint")).alias(f"_B{k}"),
                F.sum(dec(ssum)).alias(f"_S{k}"),
                F.sum(dec(qsum)).alias(f"_Q{k}"),
            ]
    out = blocks.groupBy(*g).agg(*aggs)
    # Var_k of block MEANS in original units:
    #   (B·ΣS² − (ΣS)²) / (B² · (size·10^scale)²)
    def var_k(k: int):
        B = F.col(f"_B{k}").cast("double")
        S = F.col(f"_S{k}").cast("double")
        Q = F.col(f"_Q{k}").cast("double")
        unit = float(2**k) * m
        return (B * Q - S * S) / (B * B * unit * unit)

    kbar = (n_levels - 1) / 2.0
    denom = sum((k - kbar) ** 2 for k in range(n_levels)) * _LN2
    slope_terms = None
    guard = None
    for k in range(n_levels):
        v = var_k(k)
        # ln(var) quantized to 1e-9 units (engine ln can differ by an
        # ulp between JVM and DuckDB; the value_entropy discipline)
        lq = (
            F.floor(F.log(v) * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
            .cast("double")
            / F.lit(1e9)
        )
        t = F.lit((k - kbar) / denom) * lq
        slope_terms = t if slope_terms is None else slope_terms + t
        ok = (F.col(f"_B{k}") >= 2) & (v > 0)
        guard = ok if guard is None else guard & ok
    hurst = F.when(guard, F.lit(1.0) + slope_terms / F.lit(2.0))
    return out.select(
        *g, F.col("_B0").alias("n"), hurst.alias("hurst")
    )


def hurst_exponent_sql(
    table: str,
    column: str,
    group_columns,
    order_by,
    n_levels: int = 5,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`hurst_exponent` — same single-pass block
    array, same exact-integer variance inputs, same fixed slope tree.
    (Integer slice sums are exact, so their association order is free;
    only the double expressions must — and do — mirror Spark's.)"""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    o = ", ".join(_as_list(order_by))
    m = float(10**scale)
    top = 2 ** (n_levels - 1)
    q = f"CAST(FLOOR({column} * {dlit(m)} + 0.5) AS BIGINT)"

    def subsum(k: int, j: int) -> str:
        s = 2**k
        return "(" + " + ".join(
            f"CAST(_arr[{j * s + i}] AS HUGEINT)" for i in range(1, s + 1)
        ) + ")"

    agg_cols = []
    for k in range(n_levels):
        s = 2**k
        nsub = top // s
        cnt = " + ".join(
            f"CASE WHEN len(_arr) >= {(j + 1) * s} THEN 1 ELSE 0 END"
            for j in range(nsub)
        )
        ssum = " + ".join(
            f"CASE WHEN len(_arr) >= {(j + 1) * s} THEN {subsum(k, j)}"
            f" ELSE CAST(0 AS HUGEINT) END"
            for j in range(nsub)
        )
        qsum = " + ".join(
            f"CASE WHEN len(_arr) >= {(j + 1) * s} THEN {subsum(k, j)} * {subsum(k, j)}"
            f" ELSE CAST(0 AS HUGEINT) END"
            for j in range(nsub)
        )
        agg_cols += [
            f"SUM(CAST(({cnt}) AS BIGINT)) AS _B{k}",
            f"SUM({ssum}) AS _S{k}",
            f"SUM({qsum}) AS _Q{k}",
        ]
    agg_sql = ",\n    ".join(agg_cols)
    ctes = [
        f"""rws AS (
  SELECT {gsel},
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY {o}) - 1 AS _b,
    {q} AS _s
  FROM {table} WHERE {column} IS NOT NULL
)""",
        f"""blocks AS (
  SELECT {gsel}, CAST(FLOOR(_b / {top}) AS BIGINT) AS _blk,
    list(_s ORDER BY _b) AS _arr
  FROM rws GROUP BY {gsel}, CAST(FLOOR(_b / {top}) AS BIGINT)
)""",
        f"""va AS (
  SELECT {gsel},
    {agg_sql}
  FROM blocks GROUP BY {gsel}
)""",
    ]
    joined = "va"

    # HUGEINT→DOUBLE casts of exact integers above 2^53 truncate in
    # DuckDB but round-to-nearest in Spark — route via VARCHAR so both
    # engines round identically (ΣS² exceeds 2^53 at realistic scales)
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731

    def var_k(k: int) -> str:
        unit = float(2**k) * m
        B = f"CAST(_B{k} AS DOUBLE)"
        S = s2d(f"_S{k}")
        Q = s2d(f"_Q{k}")
        return (
            f"(({B} * {Q} - {S} * {S})"
            f" / ({B} * {B} * {dlit(unit)} * {dlit(unit)}))"
        )

    kbar = (n_levels - 1) / 2.0
    denom = sum((k - kbar) ** 2 for k in range(n_levels)) * _LN2
    slope = None
    guard = None
    for k in range(n_levels):
        v = var_k(k)
        lq = (
            f"(CAST(CAST(FLOOR(ln({v}) * 1e9 + 0.5) AS BIGINT) AS DOUBLE) / 1e9)"
        )
        t = f"{dlit((k - kbar) / denom)} * {lq}"
        slope = t if slope is None else f"({slope} + {t})"
        ok = f"(_B{k} >= 2 AND {v} > 0)"
        guard = ok if guard is None else f"({guard} AND {ok})"
    all_ctes = ",\n".join(ctes)
    return f"""
WITH {all_ctes}
SELECT {gsel}, CAST(_B0 AS BIGINT) AS n,
  CASE WHEN {guard} THEN 1.0 + ({slope}) / 2.0 END AS hurst
FROM {joined}
"""


# --------------------------------------------------------------------------
# sample entropy
# --------------------------------------------------------------------------


def _sampen_pair_kernel(groups, m: int, mq: float):
    """mapInPandas kernel for :func:`sample_entropy`: exact int64
    Chebyshev pair counts per group row, blocked numpy broadcasting.

    For each group's quantized array: W = all length-mm windows
    starting at i ≤ n−m (mm = m and m+1 share the SAME i<j ≤ n−m
    bounds — the Richman–Moorman convention the HOF form pins);
    D[i,j] = max_k |W[i,k] − W[j,k]|; count strictly-upper-triangle
    cells ≤ r.  The distance matrix is built 512 outer rows at a time
    so peak memory is O(512·n·mm), not O(n²·mm).
    """

    def fn(batches):
        import numpy as np
        import pandas as pd

        def count_pairs(arr, mm, nm, r):
            # windows of length mm at starts 0..nm-1 (0-indexed)
            W = np.lib.stride_tricks.sliding_window_view(arr, mm)[:nm]
            total = 0
            cols = np.arange(nm)
            for s in range(0, nm, 512):
                e = min(s + 512, nm)
                d = np.abs(W[s:e, None, :] - W[None, :, :]).max(axis=2)
                upper = cols[None, :] > np.arange(s, e)[:, None]
                total += int(((d <= r) & upper).sum())
            return total

        for pdf in batches:
            out = {c: pdf[c].to_numpy() for c in groups}
            ns, rts, bs, as_ = [], [], [], []
            for arr, n, r in zip(pdf["_arr"], pdf["n"], pdf["_r"]):
                a = np.asarray(arr, dtype=np.int64)
                n, r = int(n), int(r)
                nm = n - m
                if nm >= 2:
                    b_cnt = count_pairs(a, m, nm, r)
                    a_cnt = count_pairs(a, m + 1, nm, r)
                else:
                    b_cnt = a_cnt = 0
                ns.append(n)
                rts.append(r / mq)
                bs.append(b_cnt)
                as_.append(a_cnt)
            out.update(
                {"n": np.array(ns, dtype=np.int64),
                 "r_tol": np.array(rts, dtype=np.float64),
                 "b_pairs": np.array(bs, dtype=np.int64),
                 "a_pairs": np.array(as_, dtype=np.int64)}
            )
            yield pd.DataFrame(out)

    return fn


def sample_entropy(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    m: int = 2,
    r_frac: float = 0.2,
    scale: int = 2,
    engine: str = "arrow",
) -> DataFrame:
    """Per-group sample entropy SampEn(m, r) (Richman & Moorman 2000)
    — the regularity measure that complements permutation_entropy:
    PE sees ordinal structure, SampEn sees amplitude-scale
    repeatability (low = self-similar/periodic, high = irregular).
    r = ``r_frac``·σ, the standard tolerance.

        B = #{i<j ≤ n−m : max_{k<m}   |x_{i+k} − x_{j+k}| ≤ r}
        A = #{i<j ≤ n−m : max_{k≤m}   |x_{i+k} − x_{j+k}| ≤ r}
        SampEn = −ln(A/B)

    Exactness: values quantize to 10^-scale ints; σ comes from exact
    DECIMAL sufficient statistics and the tolerance floor-quantizes to
    an INTEGER, so every pair comparison is exact int arithmetic — A
    and B are bit-identical across engines (ANY correct counting
    method yields the same integers); the single −ln(A/B) is
    1e-9-floor-quantized (the one-ln rule).

    Scale: one exchange assembles each group's position-ordered array
    (hurst's array-plan discipline).  ``engine='arrow'`` (default)
    runs the O(n²) pair count as a blocked numpy Chebyshev-distance
    kernel over that array (mapInPandas) — the round-8 nested
    ``aggregate(sequence…)`` HOF form evaluated interpreted, one pair
    per iterator step, and made the weekly-grid query SLOWER than the
    monthly op it accelerates (9.6 s vs 1.4 s, VERDICT r9 item 6);
    the vectorized kernel counts the same exact integers.
    ``engine='expr'`` keeps that engine-side HOF form (the shape the
    DuckDB twin mirrors); tests pin the two engines identical.  Pair
    counting is quadratic in series length by definition — aggregate
    long series to a coarser grid first (:func:`coarse_grid`; the
    kernel blocks the distance matrix at 512 rows so memory stays
    O(512·n), not O(n²)).

    Returns (groups…, n, r_tol, b_pairs, a_pairs, sampen); sampen is
    NULL when n ≤ m+1 or A or B is 0 (undefined, not dropped).
    """
    g = _as_list(group_columns)
    w = make_window(g, _as_list(order_by))
    mq = float(10**scale)
    q = F.floor(F.col(column) * F.lit(mq) + F.lit(0.5)).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    rows = data.filter(F.col(column).isNotNull()).select(
        *g,
        F.row_number().over(w).alias("_p"),
        q.alias("_s"),
    )
    grp = rows.groupBy(*g).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_p").alias("p"), F.col("_s").alias("s")))
            ),
            lambda x: x["s"],
        ).alias("_arr"),
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_s"))).alias("_sq"),
        F.sum(dec(F.col("_s") * F.col("_s"))).alias("_sqq"),
    )
    # integer tolerance r = floor(r_frac · σ_q + 0.5) — σ_q from exact
    # sums, one double tree, then every pair test is pure int compare
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    sigq = F.sqrt(nn * s2d("_sqq") - s2d("_sq") * s2d("_sq")) / nn
    rtol = F.floor(F.lit(float(r_frac)) * sigq + F.lit(0.5)).cast("bigint")
    grp = grp.withColumn("_r", rtol)

    def pair_count(mm: int) -> str:
        """Engine-side nested aggregate counting i<j template matches
        of length ``mm`` (Spark SQL text)."""
        conds = " , ".join(
            f"abs(element_at(_arr, CAST(i + {k} AS INT))"
            f" - element_at(_arr, CAST(j + {k} AS INT)))"
            for k in range(mm)
        )
        dist = f"greatest({conds})" if mm > 1 else conds
        return (
            f"CASE WHEN n - {m} >= 2 THEN "
            f"aggregate(sequence(1, n - {m} - 1), 0L, (acc, i) -> acc + "
            f"aggregate(sequence(i + 1, n - {m}), 0L, (a2, j) -> a2 + "
            f"IF({dist} <= _r, 1L, 0L))) ELSE 0L END"
        )

    if engine == "arrow":
        gtypes = ", ".join(
            f"{c} {data.schema[c].dataType.simpleString()}" for c in g
        )
        schema = (
            f"{gtypes}, n bigint, r_tol double,"
            " b_pairs bigint, a_pairs bigint"
        )
        counted = grp.select(*g, "n", "_r", "_arr").mapInPandas(
            _sampen_pair_kernel(g, int(m), mq), schema
        )
    else:
        counted = grp.select(
            *g,
            "n",
            (F.col("_r").cast("double") / F.lit(mq)).alias("r_tol"),
            F.expr(pair_count(m)).alias("b_pairs"),
            F.expr(pair_count(m + 1)).alias("a_pairs"),
        )
    ok = (F.col("b_pairs") > 0) & (F.col("a_pairs") > 0)
    se = (
        F.floor(
            -F.log(
                F.col("a_pairs").cast("double") / F.col("b_pairs").cast("double")
            )
            * F.lit(1e9)
            + F.lit(0.5)
        ).cast("bigint")
        .cast("double")
        / F.lit(1e9)
    )
    return counted.select(
        *g, "n", "r_tol", "b_pairs", "a_pairs",
        F.when(ok, se).alias("sampen"),
    )


def sample_entropy_sql(
    table_sql: str,
    column: str,
    group_columns,
    order_by,
    m: int = 2,
    r_frac: float = 0.2,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`sample_entropy` (list-comprehension pair
    counts over the same quantized array; identical integer tolerance
    tree)."""
    from timeseriesutils_spark.functions.exact import dlit

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    osel = ", ".join(_as_list(order_by))
    mq = float(10**scale)
    qq = f"CAST(FLOOR({column} * {dlit(mq)} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    sigq = f"(SQRT({nn} * {s2d('_sqq')} - {s2d('_sq')} * {s2d('_sq')}) / {nn})"
    rtol = f"CAST(FLOOR({dlit(float(r_frac))} * {sigq} + 0.5) AS BIGINT)"

    def pair_count(mm: int) -> str:
        conds = ", ".join(
            f"abs(_arr[i + {k}] - _arr[j + {k}])" for k in range(mm)
        )
        dist = f"greatest({conds})" if mm > 1 else conds
        return (
            f"CASE WHEN n - {m} >= 2 THEN CAST(len(flatten("
            f"[[1 FOR j IN range(i + 1, n - {m} + 1) IF {dist} <= _r] "
            f"FOR i IN range(1, n - {m})])) AS BIGINT) ELSE 0 END"
        )

    se = (
        "CAST(FLOOR(-ln(CAST(a_pairs AS DOUBLE) / CAST(b_pairs AS DOUBLE))"
        " * 1e9 + 0.5) AS BIGINT)"
    )
    return f"""
WITH rows_ AS (
  SELECT {gsel}, ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY {osel}) AS _p,
    {qq} AS _s
  FROM ({table_sql}) WHERE {column} IS NOT NULL
),
grp AS (
  SELECT {gsel},
    list(_s ORDER BY _p) AS _arr,
    COUNT(*) AS n,
    SUM(CAST(_s AS DECIMAL(38,0))) AS _sq,
    SUM(CAST(_s * _s AS DECIMAL(38,0))) AS _sqq
  FROM rows_ GROUP BY {gsel}
),
tol AS (SELECT *, {rtol} AS _r FROM grp),
counted AS (
  SELECT {gsel}, n,
    CAST(_r AS DOUBLE) / {dlit(mq)} AS r_tol,
    {pair_count(m)} AS b_pairs,
    {pair_count(m + 1)} AS a_pairs
  FROM tol
)
SELECT {gsel}, n, r_tol, b_pairs, a_pairs,
  CASE WHEN b_pairs > 0 AND a_pairs > 0
    THEN CAST({se} AS DOUBLE) / 1e9 END AS sampen
FROM counted
"""


# --------------------------------------------------------------------------
# coarse-grid pre-aggregation (the sample_entropy O(n²) envelope helper)
# --------------------------------------------------------------------------


def coarse_grid(
    data: DataFrame,
    value_col: str,
    order_col: str,
    group_columns,
    factor: int,
    scale: int = 2,
) -> DataFrame:
    """Collapse an integer-ordered series onto a grid ``factor`` ticks
    wide (grid_pos = order div factor, value = quantized cell mean) —
    the pre-aggregation the O(n²) pair-count operators
    (:func:`sample_entropy`, theilsen, DTW) tell users to apply before
    feeding long series: n drops ×factor, pairs drop ×factor².

    Exactness: values quantize to 10^-scale ints, the cell mean is one
    double division of the exact integer sum rounded back onto the
    same grid (floor(Σq/c + 0.5)/10^scale), so a downstream operator
    re-quantizing at the same scale recovers exact integers — the
    friedman cell-mean discipline.  One map-combinable aggregation;
    survives any partitioning.

    Returns (groups…, grid_pos, value_col) with one row per occupied
    cell (empty cells stay absent — gappy in, gappy out).
    """
    g = _as_list(group_columns)
    mq = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(mq) + F.lit(0.5)).cast(
        "bigint"
    )
    pos = F.floor(F.col(order_col).cast("bigint") / F.lit(int(factor))).cast(
        "bigint"
    )
    cell = (
        data.filter(F.col(value_col).isNotNull())
        .select(*g, pos.alias("grid_pos"), q.alias("_q"))
        .groupBy(*g, "grid_pos")
        .agg(F.sum("_q").alias("_s"), F.count(F.lit(1)).alias("_c"))
    )
    mean_q = F.floor(
        F.col("_s").cast("double") / F.col("_c").cast("double") + F.lit(0.5)
    )
    return cell.select(
        *g, "grid_pos", (mean_q / F.lit(float(mq))).alias(value_col)
    )


def coarse_grid_sql(
    data_sql: str,
    value_col: str,
    order_col: str,
    group_columns,
    factor: int,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`coarse_grid` (same quantize/mean tree)."""
    from timeseriesutils_spark.functions.exact import dlit

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    mq = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {mq} + 0.5) AS BIGINT)"
    pos = f"CAST(FLOOR(CAST({order_col} AS BIGINT) / {int(factor)}) AS BIGINT)"
    mean_q = (
        "FLOOR(CAST(CAST(SUM(_q) AS BIGINT) AS DOUBLE)"
        " / CAST(COUNT(*) AS DOUBLE) + 0.5)"
    )
    return f"""
SELECT {gsel}, grid_pos, {mean_q} / {dlit(float(mq))} AS {value_col}
FROM (
  SELECT {gsel}, {pos} AS grid_pos, {qq} AS _q
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
)
GROUP BY {gsel}, grid_pos
"""
