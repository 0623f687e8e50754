"""Banded matrix profile: z-normalized subsequence nearest-neighbor
distance per series — the standard motif/discord discovery primitive
(Yeh et al. 2016, "Matrix Profile I", STOMP formulation).  The
reference engine has no counterpart (its featurize.py stops at window
stats); this is the §2.2b capability row for self-join time-series
mining, complementing dtw_pattern (template matching against a GIVEN
pattern — here the series is mined against ITSELF).

For every length-``w`` subsequence ``i`` of each series, the profile is
the minimum z-normalized Euclidean distance to any other subsequence
``j`` within the search band ``excl < |i-j| <= band``:

    dist²(i,j) = 2w·(1 − corr(i,j)),
    corr(i,j)  = (w·QT(i,j) − S_i·S_j) / (√(w·SS_i−S_i²)·√(w·SS_j−S_j²))

where QT is the subsequence dot product and S/SS the window sum /
sum-of-squares (the classic normalized-cross-correlation identity that
makes STOMP O(1) per cell).  The exclusion zone ``excl`` (default w/2)
discards trivial self-matches, exactly as in the paper; the band bound
``band`` is the bounded-search variant — at 100 TB an unbounded profile
is an all-pairs self-join per series, while the band caps work at
O(n·(band−excl)) per series and loses only matches farther than
``band`` steps away (the standard streaming/anytime compromise).

Spark-first shape — NO self-join at all: for each literal lag
``d ∈ (excl, band]`` the dot product QT(i, i+d) is a rolling sum of the
lag-product series ``x[t]·x[t+d]`` (one ``lead`` + one windowed sum),
the j-side window stats are ``lead(S, d)``, and the BACKWARD pair
(i−d, i) is ``lag(dist_d, d)`` of the forward distance — so the whole
banded profile is window expressions over ONE exchange per series,
entirely inside whole-stage codegen.  The plan at any scale: one
shuffle on the group key, one sort, no joins, no Python.

Exactness (cross-engine): values are floor-quantized to integers at
``10^-scale``; S/SS/QT accumulate in DECIMAL(38,0) (Spark) / HUGEINT
(DuckDB) so every numerator ``w·QT − S_i·S_j`` and variance term
``w·SS − S²`` is an EXACT integer, string-cast to double (correctly
rounded in both engines); the final distance is one shared expression
tree on those doubles, floor-quantized at 1e-9 (the libm grid rule).
Ties in the nearest-neighbor argmin break on the smaller neighbor
index via the two-pass LEAST(CASE...) idiom — no struct-ordering
dependence.  Constant windows (zero variance) yield NULL distance and
drop out of the min, as in the noise-robust MP variants.

Returns one row per valid subsequence: (group..., idx, nn_idx,
mp_dist) where idx is the 1-based subsequence start and nn_idx its
nearest neighbor's start within the band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Q9 = 1.0e9


def _mp_group_np(x, valid, gi, m, lags):
    """Banded profile for ONE series frame — the relational 16-lag
    window chain as exact integer numpy (round-14, guide §4.2).

    Bit-identity argument: every S/SS/QT/da/db/num term is the same
    exact integer the DECIMAL(38,0) chain produces (int64 numpy under
    an asserted envelope — numpy cannot silently wrap where ANSI would
    raise — with a Python-int object-dtype fallback beyond it); the
    int→double conversions are correctly rounded exactly like the
    relational ``decimal→string→double`` cast; the double tree
    (num/(√da·√db), 2w(1−corr), √max(·,0), floor(·1e9+0.5)) is the
    identical IEEE expression shape; gating (complete product window,
    positive variances) and the min/argmin tiebreaks replicate the
    LEAST semantics including NULL-skip.

    Returns (keep_mask, mp, nn) positional arrays.
    """
    import numpy as np

    n = int(x.size)
    NMAX = np.iinfo(np.int64).max
    mp = np.full(n, NMAX, dtype=np.int64)
    nn = np.full(n, NMAX, dtype=np.int64)
    if n < m:
        return np.zeros(n, dtype=bool), mp, nn
    A = int(np.abs(x).max()) if n else 0
    # envelope: cumsums bounded by n·A², cross terms by 2·m²·A²
    if A and (n * A * A >= 2**62 or (m * A) * (m * A) >= 2**62):
        x = x.astype(object)  # Python ints: exact at any magnitude
    xv = np.where(valid, x, 0)
    z = np.zeros(1, dtype=xv.dtype)
    cs = np.concatenate([z, np.cumsum(xv)])
    cs2 = np.concatenate([z, np.cumsum(xv * xv)])
    cv = np.concatenate([[0], np.cumsum(valid.astype(np.int64))])
    S = cs[m:] - cs[:-m]          # complete-window stats at i ≤ n−m
    SS = cs2[m:] - cs2[:-m]
    CNT = cv[m:] - cv[:-m]
    da = m * SS - S * S
    cols = []
    for d in lags:
        L = n - d
        iN = L - m + 1
        col = np.full(n, -1, dtype=np.int64)  # −1 ≡ NULL (dist_q ≥ 0)
        if iN > 0:
            pv = valid[:L] & valid[d:]
            prod = np.where(pv, xv[:L] * xv[d:], 0)
            cp = np.concatenate([z, np.cumsum(prod)])
            cpv = np.concatenate([[0], np.cumsum(pv.astype(np.int64))])
            QT = cp[m:] - cp[:-m]
            CQ = cpv[m:] - cpv[:-m]
            Si, Sj = S[:iN], S[d:d + iN]
            dai, dbi = da[:iN], da[d:d + iN]
            ok = (CQ == m) & (CNT[:iN] == m) & (dai > 0) & (dbi > 0)
            num = m * QT - Si * Sj
            numf = num.astype(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                corr = numf / (
                    np.sqrt(dai.astype(np.float64))
                    * np.sqrt(dbi.astype(np.float64))
                )
                d2 = (2.0 * m) * (1.0 - corr)
                dist = np.sqrt(np.maximum(d2, 0.0))
                q = np.floor(dist * 1.0e9 + 0.5).astype(np.int64)
            col[:iN] = np.where(ok, q, -1)
        cols.append(col)
    for col, d in zip(cols, lags):
        fwd = col >= 0
        mp = np.minimum(mp, np.where(fwd, col, NMAX))
        bcol = np.concatenate(
            [np.full(min(d, n), -1, dtype=np.int64), col[: max(0, n - d)]]
        )
        mp = np.minimum(mp, np.where(bcol >= 0, bcol, NMAX))
    keep = mp < NMAX
    for col, d in zip(cols, lags):
        hit = (col == mp) & (col >= 0)
        nn = np.minimum(nn, np.where(hit, gi + d, NMAX))
        bcol = np.concatenate(
            [np.full(min(d, n), -1, dtype=np.int64), col[: max(0, n - d)]]
        )
        bhit = (bcol == mp) & (bcol >= 0)
        nn = np.minimum(nn, np.where(bhit, gi - d, NMAX))
    return keep, mp, nn


def _mp_arrow(base, pk, m, lags):
    """:func:`matrix_profile`'s lag chain as ONE grouped Arrow pass;
    emits (pk…, _i, _mp, _nn) for rows with a defined profile."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(c, base.schema[c].dataType) for c in pk]
        + [
            StructField("_i", LongType()),
            StructField("_mp", LongType()),
            StructField("_nn", LongType()),
        ]
    )

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_i")
        s = pdf["_xq"]
        if s.isna().any():
            valid = s.notna().to_numpy()
            xf = s.fillna(0).to_numpy(np.float64)
            assert np.abs(xf).max() < 2**53, "null-path float envelope"
            x = xf.astype(np.int64)
        else:
            x = s.to_numpy(np.int64)
            valid = np.ones(x.size, dtype=bool)
        gi = pdf["_i"].to_numpy(np.int64)
        keep, mp, nn = _mp_group_np(x, valid, gi, m, lags)
        out = {c: pdf[c].to_numpy()[keep] for c in pk}
        out["_i"] = gi[keep]
        out["_mp"] = mp[keep]
        out["_nn"] = nn[keep]
        return pd.DataFrame(out)

    return base.groupBy(*pk).applyInPandas(kern, schema)


def matrix_profile(
    df: DataFrame,
    value_col: str,
    group_columns,
    order_columns,
    w: int = 8,
    band: int = 20,
    excl: int | None = None,
    scale: int = 2,
    chunk_rows: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Banded z-normalized matrix profile per series (module doc).

    ``engine="arrow"`` (default, round-14): the 16-lag DECIMAL window
    chain runs as ONE grouped Arrow kernel per series/chunk
    (:func:`_mp_group_np` — exact int64/Python-int arithmetic, the
    identical double tree and tiebreaks; bit-identity pinned in
    tests/test_round14_opt.py and by the unchanged oracle).
    ``engine="relational"`` keeps the window-expression chain (A/B
    control).  The chunking machinery is engine-independent.

    ``chunk_rows``: monster-series mitigation (the operators/chunked.py
    precedent, adapted to a BANDED two-sided reach).  A window over
    (group, time) serializes each series into one task, so one monster
    series bounds the whole stage.  Every cell of the banded profile
    reads at most ``band`` rows back and ``band + w − 1`` rows forward,
    so each length-``chunk_rows`` chunk extended with that fixed
    context computes its core rows EXACTLY as the unchunked plan does
    (equivalence property-tested and driver-hash-checked against the
    same oracle).  The chunk id rides the partition key, turning
    parallelism from rows/series into rows/chunk at the cost of one
    cheap row_number pass and ≤(2·band+w−1)/chunk_rows row replication.
    Requires ``chunk_rows >= band + w`` (context fits one neighbor).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    o = _as_list(order_columns)
    m = int(w)
    e = m // 2 if excl is None else int(excl)
    B = int(band)
    if not (0 <= e < B):
        raise ValueError("need 0 <= excl < band")
    if m < 2:
        raise ValueError("w must be >= 2")
    lags = list(range(e + 1, B + 1))
    mult = 10 ** int(scale)

    word = Window.partitionBy(*g).orderBy(*o)
    base = df.select(
        *g,
        F.row_number().over(word).cast("bigint").alias("_i"),
        F.floor(F.col(value_col).cast("double") * F.lit(mult) + F.lit(0.5))
        .cast("bigint")
        .alias("_xq"),
    )
    pk = list(g)
    if chunk_rows is not None:
        C = int(chunk_rows)
        if C < B + m:
            raise ValueError("chunk_rows must be >= band + w")
        # replicate each row into the <= 3 chunks whose extended frame
        # needs it: its own, the previous (as forward context, reach
        # band + w - 1) and the next (as backward context, reach band)
        p = F.col("_i") - F.lit(1)
        k0 = F.floor(p / F.lit(C)).cast("bigint")
        off = p - k0 * F.lit(C)
        cand = F.array(
            k0,
            F.when((off <= F.lit(B + m - 2)) & (k0 > 0), k0 - 1),
            F.when(off >= F.lit(C - B), k0 + 1),
        )
        base = base.select(
            "*",
            F.explode(
                F.filter(cand, lambda c: c.isNotNull())
            ).alias("_ck"),
        )
        pk = [*g, "_ck"]
        # explicit partition count: the exchange's INPUT is 4 narrow
        # columns, so AQE's size-based coalescing folds it into ~2
        # tasks and re-serializes the heavy 16-lag chain (measured at
        # 2.4M rows / 25% monster series: plain 116 s, chunked-but-
        # coalesced 94 s, chunked-pinned 30 s).  A user-specified
        # repartition is exempt from coalescing and satisfies the
        # window distribution, so no second exchange is added.
        par = base.sparkSession.sparkContext.defaultParallelism
        base = base.repartition(par, *pk)
    if engine == "arrow":
        out = _mp_arrow(base.select(*pk, "_i", "_xq"), pk, m, lags)
        if chunk_rows is not None:
            out = out.filter(
                F.floor((F.col("_i") - F.lit(1)) / F.lit(int(chunk_rows)))
                .cast("bigint")
                == F.col("_ck")
            )
        return out.select(
            *g,
            F.col("_i").alias("idx"),
            F.col("_nn").alias("nn_idx"),
            (F.col("_mp").cast("double") / F.lit(_Q9)).alias("mp_dist"),
        )
    wi = Window.partitionBy(*pk).orderBy("_i")
    ws = wi.rowsBetween(0, m - 1)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    s1 = base.select(
        "*",
        F.sum(dec(F.col("_xq"))).over(ws).alias("_S"),
        F.sum(dec(F.col("_xq") * F.col("_xq"))).over(ws).alias("_SS"),
        F.count(F.lit(1)).over(ws).alias("_cnt"),
        *[
            (F.col("_xq") * F.lead("_xq", d).over(wi)).alias(f"_p{d}")
            for d in lags
        ],
    )
    s2 = s1.select(
        "*",
        *[F.sum(dec(F.col(f"_p{d}"))).over(ws).alias(f"_qt{d}") for d in lags],
        *[F.count(F.col(f"_p{d}")).over(ws).alias(f"_cq{d}") for d in lags],
    )
    s3 = s2.select(
        "*",
        *[F.lead("_S", d).over(wi).alias(f"_Sj{d}") for d in lags],
        *[F.lead("_SS", d).over(wi).alias(f"_SSj{d}") for d in lags],
    )

    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731

    def dist_q(d: int):
        da = F.lit(m) * F.col("_SS") - F.col("_S") * F.col("_S")
        db = F.lit(m) * F.col(f"_SSj{d}") - F.col(f"_Sj{d}") * F.col(f"_Sj{d}")
        num = F.lit(m) * F.col(f"_qt{d}") - F.col("_S") * F.col(f"_Sj{d}")
        corr = s2d(num) / (F.sqrt(s2d(da)) * F.sqrt(s2d(db)))
        d2 = F.lit(2.0 * m) * (F.lit(1.0) - corr)
        dist = F.sqrt(F.greatest(d2, F.lit(0.0)))
        ok = (
            (F.col(f"_cq{d}") == m)
            & (da > F.lit(0).cast("decimal(38,0)"))
            & (db > F.lit(0).cast("decimal(38,0)"))
        )
        return F.when(ok, F.floor(dist * F.lit(_Q9) + F.lit(0.5)).cast("bigint"))

    s4 = s3.select("*", *[dist_q(d).alias(f"_dq{d}") for d in lags])
    s5 = s4.select(
        "*", *[F.lag(f"_dq{d}", d).over(wi).alias(f"_bq{d}") for d in lags]
    )
    cands = [F.col(f"_dq{d}") for d in lags] + [F.col(f"_bq{d}") for d in lags]
    mp = F.least(*cands) if len(cands) > 1 else cands[0]
    s6 = s5.select("*", mp.alias("_mp"))
    nns = [
        F.when(F.col(f"_dq{d}") == F.col("_mp"), F.col("_i") + F.lit(d))
        for d in lags
    ] + [
        F.when(F.col(f"_bq{d}") == F.col("_mp"), F.col("_i") - F.lit(d))
        for d in lags
    ]
    nn = F.least(*nns) if len(nns) > 1 else nns[0]
    out = s6.filter(F.col("_mp").isNotNull())
    if chunk_rows is not None:
        # keep each chunk's CORE rows only — context copies computed
        # identical values and would duplicate output rows
        out = out.filter(
            F.floor((F.col("_i") - F.lit(1)) / F.lit(int(chunk_rows)))
            .cast("bigint")
            == F.col("_ck")
        )
    return (
        out
        .select(
            *g,
            F.col("_i").alias("idx"),
            nn.alias("nn_idx"),
            (F.col("_mp").cast("double") / F.lit(_Q9)).alias("mp_dist"),
        )
    )


def matrix_profile_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    order_columns,
    w: int = 8,
    band: int = 20,
    excl: int | None = None,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`matrix_profile` (same integer sufficient
    stats via HUGEINT, same shared double tree, same LEAST argmin)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    o = _as_list(order_columns)
    m = int(w)
    e = m // 2 if excl is None else int(excl)
    B = int(band)
    if not (0 <= e < B):
        raise ValueError("need 0 <= excl < band")
    lags = list(range(e + 1, B + 1))
    mult = 10 ** int(scale)
    gsel = ", ".join(g)
    osel = ", ".join(o)

    p_cols = ", ".join(
        f"_xq * LEAD(_xq, {d}) OVER word AS _p{d}" for d in lags
    )
    qt_cols = ", ".join(
        f"SUM(CAST(_p{d} AS HUGEINT)) OVER ws AS _qt{d}, "
        f"COUNT(_p{d}) OVER ws AS _cq{d}"
        for d in lags
    )
    sj_cols = ", ".join(
        f"LEAD(_S, {d}) OVER word AS _Sj{d}, "
        f"LEAD(_SS, {d}) OVER word AS _SSj{d}"
        for d in lags
    )
    s2d = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731

    def dist_q(d: int) -> str:
        da = f"({m} * _SS - _S * _S)"
        db = f"({m} * _SSj{d} - _Sj{d} * _Sj{d})"
        num = f"({m} * _qt{d} - _S * _Sj{d})"
        corr = f"({s2d(num)} / (SQRT({s2d(da)}) * SQRT({s2d(db)})))"
        dist = f"SQRT(GREATEST({2.0 * m} * (1.0 - {corr}), 0.0))"
        return (
            f"CASE WHEN _cq{d} = {m} AND {da} > 0 AND {db} > 0 "
            f"THEN CAST(FLOOR({dist} * 1000000000.0 + 0.5) AS BIGINT) END"
        )

    dq_cols = ", ".join(f"{dist_q(d)} AS _dq{d}" for d in lags)
    bq_cols = ", ".join(
        f"LAG(_dq{d}, {d}) OVER word AS _bq{d}" for d in lags
    )
    cands = ", ".join([f"_dq{d}" for d in lags] + [f"_bq{d}" for d in lags])
    nns = ", ".join(
        [f"CASE WHEN _dq{d} = _mp THEN _i + {d} END" for d in lags]
        + [f"CASE WHEN _bq{d} = _mp THEN _i - {d} END" for d in lags]
    )
    word = f"(PARTITION BY {gsel} ORDER BY _i)"
    ws = (
        f"(PARTITION BY {gsel} ORDER BY _i "
        f"ROWS BETWEEN CURRENT ROW AND {m - 1} FOLLOWING)"
    )
    return f"""
WITH base AS (
  SELECT {gsel},
    CAST(ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY {osel}) AS BIGINT) AS _i,
    CAST(FLOOR(CAST({value_col} AS DOUBLE) * {mult} + 0.5) AS BIGINT) AS _xq
  FROM ({data_sql})
),
s1 AS (
  SELECT *, SUM(CAST(_xq AS HUGEINT)) OVER ws AS _S,
    SUM(CAST(_xq * _xq AS HUGEINT)) OVER ws AS _SS,
    COUNT(*) OVER ws AS _cnt, {p_cols}
  FROM base WINDOW word AS {word}, ws AS {ws}
),
s2 AS (SELECT *, {qt_cols} FROM s1 WINDOW ws AS {ws}),
s3 AS (SELECT *, {sj_cols} FROM s2 WINDOW word AS {word}),
s4 AS (SELECT *, {dq_cols} FROM s3),
s5 AS (SELECT *, {bq_cols} FROM s4 WINDOW word AS {word}),
s6 AS (SELECT *, LEAST({cands}) AS _mp FROM s5)
SELECT {gsel}, _i AS idx, LEAST({nns}) AS nn_idx,
  CAST(_mp AS DOUBLE) / 1000000000.0 AS mp_dist
FROM s6 WHERE _mp IS NOT NULL
"""


def motif_discord(
    df: DataFrame,
    value_col: str,
    group_columns,
    order_columns,
    w: int = 8,
    band: int = 20,
    excl: int | None = None,
    scale: int = 2,
    profile: DataFrame | None = None,
) -> DataFrame:
    """Motif/discord extraction from the banded matrix profile (the
    Yeh et al. 2016 use-case the profile exists for): per series, the
    MOTIF is the subsequence pair at the minimum profile distance (the
    best-repeated pattern) and the DISCORD the subsequence at the
    maximum (the most anomalous window — the profile-based anomaly
    dual of seasonal_esd's residual test).

    Ties break on the integer-quantized distance then the smaller
    index (both engines identical).  One window pass over the profile
    rows per series — the profile plan's single exchange is reused.

    ``profile``: a PRECOMPUTED :func:`matrix_profile` frame (columns
    group..., idx, nn_idx, mp_dist).  The profile is the expensive
    part and callers that also need the profile itself should compute
    it ONCE (e.g. via a parquet checkpoint) and pass it here — the
    catalog does exactly that, so the ``matrix_profile`` and
    ``motif_discord`` queries share one build (round-13 de-dup of the
    r12 bench's #2+#4 heaviest entries).  When given, ``df``/
    ``value_col``/``order_columns`` and the profile parameters are
    ignored.

    Returns one row per series: (group..., motif_idx, motif_nn,
    motif_dist, discord_idx, discord_dist).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    mp = profile if profile is not None else matrix_profile(
        df, value_col, group_columns, order_columns,
        w=w, band=band, excl=excl, scale=scale,
    )
    dq = F.floor(F.col("mp_dist") * F.lit(_Q9) + F.lit(0.5)).cast("bigint")
    rows = mp.select(*g, "idx", "nn_idx", dq.alias("_dq"))
    agg = rows.groupBy(*g).agg(
        F.min(F.struct(F.col("_dq"), F.col("idx"), F.col("nn_idx"))).alias("_mo"),
        F.max(F.struct(F.col("_dq"), (-F.col("idx")).alias("_ni"))).alias("_di"),
    )
    return agg.select(
        *g,
        F.col("_mo.idx").alias("motif_idx"),
        F.col("_mo.nn_idx").alias("motif_nn"),
        (F.col("_mo._dq").cast("double") / F.lit(_Q9)).alias("motif_dist"),
        (-F.col("_di._ni")).alias("discord_idx"),
        (F.col("_di._dq").cast("double") / F.lit(_Q9)).alias("discord_dist"),
    )


def motif_discord_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    order_columns,
    w: int = 8,
    band: int = 20,
    excl: int | None = None,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`motif_discord` (same integer-distance
    tiebreaks over the matrix_profile twin)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    mp = matrix_profile_sql(
        data_sql, value_col, group_columns, order_columns,
        w=w, band=band, excl=excl, scale=scale,
    )
    return f"""
WITH mp AS MATERIALIZED (
  SELECT {gsel}, idx, nn_idx,
    CAST(FLOOR(mp_dist * 1000000000.0 + 0.5) AS BIGINT) AS _dq
  FROM ({mp})
),
mo AS (
  SELECT {gsel}, idx, nn_idx, _dq,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _dq, idx, nn_idx) AS _r
  FROM mp
),
di AS (
  SELECT {gsel}, idx, _dq,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _dq DESC, idx) AS _r
  FROM mp
)
SELECT {gsel},
  mo.idx AS motif_idx, mo.nn_idx AS motif_nn,
  CAST(mo._dq AS DOUBLE) / 1000000000.0 AS motif_dist,
  di.idx AS discord_idx,
  CAST(di._dq AS DOUBLE) / 1000000000.0 AS discord_dist
FROM (SELECT * FROM mo WHERE _r = 1) mo
JOIN (SELECT * FROM di WHERE _r = 1) di USING ({gsel})
"""
