"""STL seasonal-trend decomposition (Cleveland et al. 1990) on a
regular integer time grid — the field-standard LOESS decomposition the
catalog's classical forms (decompose_series: centered-MA trend;
decompose_robust: median forms) do not cover.

One inner STL iteration, exactly the paper's steps with the initial
trend T⁰ = 0 and no robustness (outer) loop:

  1. cycle-subseries smoothing — each phase-p subseries (t ≡ p mod P)
     is LOESS(degree-1)-smoothed; at the CENTER of a symmetric ±hs
     window on a regular grid the degree-1 fit equals the tricube-
     weighted mean (Σ w_k·k = 0 by symmetry), so the smoother is a
     fixed linear filter with literal weights,
  2. low-pass — MA_P ∘ MA_P ∘ MA_3 of the raw seasonal (the paper's
     step 3), a composite integer kernel of width 2P+1 with exact
     rational weights c_j / 3P²,
  3. seasonal = raw − low-pass (step 4),
  4. trend — tricube LOESS-at-center (±ht rows) of the deseasonalized
     series (step 6),
  5. remainder = value − seasonal − trend.

The taylor/holt impulse-weight discipline: every smoother weight is a
DRIVER-computed literal (tricube weights floor-quantized at 1e-6, the
low-pass counts exact integers), so each stage is a Σ literal·lead/lag
expression over ONE ordered window per group — the whole decomposition
is window expressions on a single exchange, no joins, no Python, and
identical literal trees in the DuckDB twin.

Exactness: input values floor-quantized at 10^-scale; every stage sum
is an exact integer (trend accumulates in DECIMAL/HUGEINT — its terms
reach ~1e22); outputs are single divisions by driver-literal
denominators (string-cast where the numerator exceeds 2^53).  Edges
follow the complete-window NULL discipline: a window that runs off the
series yields NULL seasonal/trend/remainder (NULL propagates through
the chained + automatically).

Precondition: ``time_col`` is a REGULAR integer grid with step 1 per
group (compose ``timegrid.regularize`` first — the declared query
does); phase anchoring is calendar-stable (t mod P), so two engines
computing on the same grid agree row-for-row.

Reference scope note: reichlab/timeseriesutils has no decomposition
operator (featurize.py is windowed Taylor polynomials); STL here is
the §2.2b capability row for the standard public algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WQ = 10**6  # tricube weight quantum (per-stage literal denominators)


def _tricube_q(h: int) -> list[int]:
    """Quantized symmetric tricube weights for offsets -h..h."""
    out = []
    for k in range(-h, h + 1):
        u = abs(k) / (h + 1.0)
        w = (1.0 - u**3) ** 3
        out.append(int(w * _WQ + 0.5))
    return out


def _lowpass_counts(period: int) -> list[int]:
    """Integer kernel of MA_P ∘ MA_P ∘ MA_3, offsets -P..P; sums 3P²."""
    p = int(period)
    box = [1] * p

    def conv(a, b):
        n = len(a) + len(b) - 1
        out = [0] * n
        for i, x in enumerate(a):
            for j, y in enumerate(b):
                out[i + j] += x * y
        return out

    k = conv(conv(box, box), [1, 1, 1])
    assert len(k) == 2 * p + 1 and sum(k) == 3 * p * p
    return k


def _stl_once_np(v, P, hs, ht, mult, Wq, Uq, cj):
    """One STL inner pass over ONE series (numpy, row-adjacency), in
    integer lockstep with the relational window chain — returns
    (seasonal, trend, remainder) float64 arrays with NaN at exactly the
    relational NULL margins.

    Exactness argument, stage by stage (vs the bigint/decimal chain):

    * ``xq = floor(v·mult + 0.5)`` — the identical IEEE double ops,
      then an exact int64.
    * seasonal/low-pass sums are plain int64 arithmetic on the same
      literal weights; the |xq| envelope under which the relational
      bigint chain is itself exact (ANSI would raise beyond it) is
      asserted, so silent numpy wraparound cannot occur.
    * the trend numerator Σ Uq·vn (decimal(38) relationally, terms
      ~1e22) splits each vn = (vn >> c)·2^c + low with
      c = ⌊log2(2^53/ΣUq)⌋: both partial convolutions stay exact
      int64 AND exact float64 (< 2^53), so
      ``S_h·2^c + S_l`` — one float multiply by a power of two (exact)
      and one addition (single rounding of an exactly-represented
      sum) — is the CORRECTLY-ROUNDED double of the exact integer,
      bit-identical to the relational ``decimal → string → double``
      cast.  Series whose |vn| exceeds the split's double-exactness
      envelope (≈2^(53+c)/ΣUq, far beyond the bigint stages' own
      envelope for real data) take a per-element Python-int fallback
      (exact at any magnitude, like DuckDB's HUGEINT).
    * divisions by the literal denominators and the remainder
      subtraction replicate the relational double tree order.
    """
    import numpy as np

    n = v.shape[0]
    SW = sum(Wq)
    SU = sum(Uq)
    PP = 3 * P * P
    DL = SW * PP
    valid = ~np.isnan(v)
    xq = np.zeros(n, dtype=np.int64)
    xq[valid] = np.floor(v[valid] * float(mult) + 0.5).astype(np.int64)
    # relational-envelope assert: the bigint chain's worst stage is
    # |vn| <= 3*DL*max|xq| (see stage bounds) — beyond int64 the
    # relational form raises under ANSI; refuse rather than wrap
    if valid.any() and int(np.abs(xq[valid]).max()) > (2**63 - 1) // (3 * DL):
        raise ValueError("stl arrow kernel: |value| exceeds the bigint"
                         " envelope of the relational chain")

    def shift_sum(arr, ok, weights, offsets):
        acc = np.zeros(n, dtype=np.int64)
        allok = np.ones(n, dtype=bool)
        for w, off in zip(weights, offsets):
            sh = np.zeros(n, dtype=np.int64)
            so = np.zeros(n, dtype=bool)
            if off >= 0:
                if off < n:
                    sh[: n - off] = arr[off:]
                    so[: n - off] = ok[off:]
            else:
                if -off < n:
                    sh[-off:] = arr[: n + off]
                    so[-off:] = ok[: n + off]
            sh[~so] = 0
            acc += int(w) * sh
            allok &= so
        return acc, allok

    offs_s = [k * P for k in range(-hs, hs + 1)]
    sn, ok_sn = shift_sum(xq, valid, Wq, offs_s)
    ln, ok_ln = shift_sum(sn, ok_sn, cj, list(range(-P, P + 1)))
    seasn = sn * PP - ln
    ok_seasn = ok_ln  # lowpass reach contains the seasonal reach
    vn = xq * DL - seasn
    ok_vn = ok_seasn & valid

    # trend split constant: SU * 2^c < 2^53 keeps the low half float-exact
    c = 53 - max(1, SU).bit_length() - 1
    offs_t = list(range(-ht, ht + 1))
    vn_cap = ((2**53 - 1) // SU - 1) << c
    vmax = int(np.abs(vn[ok_vn]).max()) if ok_vn.any() else 0
    if vmax <= vn_cap:
        bh = vn >> c
        bl = vn - (bh << c)
        sh_, ok_h = shift_sum(bh, ok_vn, Uq, offs_t)
        sl_, _ = shift_sum(bl, ok_vn, Uq, offs_t)
        ok_tr = ok_h
        trn_f = sh_.astype(np.float64) * float(2**c) + sl_.astype(np.float64)
    else:  # exact big-int fallback (rare): float(int) is correctly rounded
        trn_f = np.zeros(n, dtype=np.float64)
        ok_tr = np.zeros(n, dtype=bool)
        vn_l = vn.tolist()
        ok_l = ok_vn.tolist()
        for t in range(n):
            tot = 0
            good = True
            for w, off in zip(Uq, offs_t):
                j = t + off
                if j < 0 or j >= n or not ok_l[j]:
                    good = False
                    break
                tot += int(w) * vn_l[j]
            if good:
                ok_tr[t] = True
                trn_f[t] = float(tot)

    seasonal = np.where(ok_seasn, seasn.astype(np.float64) / float(DL * mult),
                        np.nan)
    trend = np.where(ok_tr, trn_f / float(DL * SU * mult), np.nan)
    remainder = (v - seasonal) - trend
    seasonal[~ok_seasn] = np.nan
    trend[~ok_tr] = np.nan
    remainder[~(ok_seasn & ok_tr & valid)] = np.nan
    return seasonal, trend, remainder


def _stl_arrow(base, g, time_col, P, hs, ht, mult, keep):
    """:func:`stl_decompose` stages 1-5 as ONE grouped Arrow pass —
    ``applyInPandas`` per series running :func:`_stl_once_np`.  Emits
    the same row set as the relational chain (every input row, NULL
    components at the complete-window margins)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    Wq = _tricube_q(hs)
    Uq = _tricube_q(ht)
    cj = _lowpass_counts(P)
    schema = StructType(
        [StructField(c, base.schema[c].dataType) for c in g]
        + [
            StructField(time_col, base.schema["_t"].dataType),
            StructField("value", DoubleType()),
            StructField("seasonal", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("remainder", DoubleType()),
        ]
        + [StructField(c, base.schema[c].dataType) for c in keep]
    )

    def decomp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_t")
        v = pdf["_v"].to_numpy(np.float64)
        seasonal, trend, remainder = _stl_once_np(
            v, P, hs, ht, mult, Wq, Uq, cj
        )
        # positional arrays only — a sorted pdf's index would otherwise
        # re-align Series rows against the numpy outputs
        out = {c: pdf[c].to_numpy() for c in g}
        out[time_col] = pdf["_t"].to_numpy()
        out["value"] = v
        out["seasonal"] = seasonal
        out["trend"] = trend
        out["remainder"] = remainder
        for c in keep:
            out[c] = pdf[c].to_numpy()
        return pd.DataFrame(out)

    return base.groupBy(*g).applyInPandas(decomp, schema)


def _sh_np(arr, ok, off: int):
    """Row-shift (relational ``lead(off)``/``lag(-off)``) with validity:
    returns (shifted values, shifted ok) — positions whose source falls
    outside the series come back ok=False (the window-edge NULL)."""
    import numpy as np

    n = arr.shape[0]
    sh = np.zeros(n, dtype=arr.dtype)
    so = np.zeros(n, dtype=bool)
    if off >= 0:
        if off < n:
            sh[: n - off] = arr[off:]
            so[: n - off] = ok[off:]
    else:
        if -off < n:
            sh[-off:] = arr[: n + off]
            so[-off:] = ok[: n + off]
    return sh, so


def _stl_robust_np(v, P, hs, ht, mult, rm, Wq, Uq, cj):
    """Full robust STL (both passes) over ONE series — the relational
    pin + median-join + hi/lo-split window chain as exact numpy, in
    integer/IEEE lockstep stage by stage:

    * pass 1 is :func:`_stl_once_np` (already bit-identical);
    * the two-middle median of |remainder₁| replicates the
      (ROW_NUMBER, multiplicity) sum — value-determined, tie-free;
    * ρ/​_pq/_dxq/_xq are the identical double→floor-int expressions;
    * the weighted seasonal numerator uses the SAME dx = hi·2²⁰ + lo
      int64 split as the relational chain (same envelope — a loud
      ValueError replaces ANSI's loud overflow), with the decimal
      recombination done in exact Python ints (float(int) is correctly
      rounded, exactly like the relational decimal→string→double);
    * the trend numerator uses the SAME A@2²⁰ × vn@2³¹ four-way split;
    * every NULL-propagation edge (incomplete window, sd/td guards,
      all-NULL group dropped by the inner median join) is replicated.

    Returns None when the group has no scoreable |remainder₁| (the
    relational inner join drops it), else (seasonal, trend, remainder,
    rho) float64 arrays with NaN at exactly the relational NULLs.
    """
    import numpy as np

    n = v.shape[0]
    frm = float(rm)
    PP = 3 * P * P
    SWq = sum(Wq)

    _, tr1, r1 = _stl_once_np(v, P, hs, ht, mult, Wq, Uq, cj)

    aqf = np.floor(np.abs(r1) * frm + 0.5)  # NaN margins propagate
    ok_aq = ~np.isnan(aqf)
    if not ok_aq.any():
        return None
    if float(np.abs(aqf[ok_aq]).max()) >= 2**53:
        raise ValueError("stl_robust arrow kernel: |remainder| exceeds"
                         " the float-exact envelope")
    srt = np.sort(aqf[ok_aq].astype(np.int64))
    nn = srt.size
    med2 = int(srt[(nn + 1) // 2 - 1]) + int(srt[(nn + 2) // 2 - 1])
    if med2 == 0:
        rho = np.where(ok_aq, 1.0, 0.0)
    else:
        with np.errstate(invalid="ignore"):
            u = aqf / (3.0 * float(med2))
            b = 1.0 - u * u
            rho = np.where(~ok_aq, 0.0, np.where(u < 1.0, b * b, 0.0))
    pq = np.floor(rho * frm + 0.5).astype(np.int64)

    with np.errstate(invalid="ignore"):
        dx = v - tr1
        dxf = np.where(np.isnan(dx), 0.0, np.floor(dx * frm + 0.5))
        xqf = np.floor(v * frm + 0.5)
    ok_x = ~np.isnan(xqf)
    if float(np.abs(dxf).max(initial=0.0)) >= 2**53 or float(
        np.abs(xqf[ok_x]).max(initial=0.0)
    ) >= 2**53:
        raise ValueError("stl_robust arrow kernel: quantized magnitude"
                         " exceeds the float-exact envelope")
    dxq = dxf.astype(np.int64)
    xq = np.where(ok_x, xqf, 0.0).astype(np.int64)

    # ---- pass-2 seasonal: Σ (Wq·ρ)·dx over ±hs cycles, dx split @2^20
    dxh = dxq >> 20
    dxl = dxq - (dxh << 20)
    mh = int(np.abs(dxh).max(initial=0))
    if SWq * rm * (mh + 1) >= 2**63:
        raise ValueError("stl_robust arrow kernel: |value - trend1|"
                         " exceeds the int64 split envelope")
    ones = np.ones(n, dtype=bool)
    snh = np.zeros(n, dtype=np.int64)
    snl = np.zeros(n, dtype=np.int64)
    sd = np.zeros(n, dtype=np.int64)
    ok_sn = np.ones(n, dtype=bool)
    for i, k in enumerate(range(-hs, hs + 1)):
        off = k * P
        A = Wq[i] * pq
        s1_, o1 = _sh_np(A * dxh, ones, off)
        s2_, _ = _sh_np(A * dxl, ones, off)
        s3_, _ = _sh_np(A, ones, off)
        snh += s1_
        snl += s2_
        sd += s3_
        ok_sn &= o1
    sn_obj = (snh.astype(object) << 20) + snl
    snf = np.array([float(x) for x in sn_obj], dtype=np.float64)
    sdf = sd.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        srq_f = np.floor(snf / sdf / frm * frm + 0.5)
    ok_srq = ok_sn & (sd > 0)
    srq = np.where(ok_srq, np.where(np.isfinite(srq_f), srq_f, 0.0), 0.0).astype(
        np.int64
    )

    # ---- low-pass of the weighted seasonal (integer kernel ±P)
    ln = np.zeros(n, dtype=np.int64)
    ok_ln = np.ones(n, dtype=bool)
    for i, j in enumerate(range(-P, P + 1)):
        s_, o_ = _sh_np(np.int64(cj[i]) * srq, ok_srq, j)
        ln += s_
        ok_ln &= o_
    s2n = srq * PP - ln
    ok_s2n = ok_srq & ok_ln
    vn = xq * PP - np.where(ok_s2n, s2n, 0)
    ok_vn = ok_x & ok_s2n
    if ok_vn.any() and int(np.abs(vn[ok_vn]).max()) >= 2**62:
        raise ValueError("stl_robust arrow kernel: |vn| exceeds the"
                         " int64 envelope")

    # ---- pass-2 trend: Σ (Uq·ρ)·vn, A@2^20 × vn@2^31 four-way split
    vn = np.where(ok_vn, vn, 0)
    vnh = vn >> 31
    vnl = vn - (vnh << 31)
    t1 = np.zeros(n, dtype=np.int64)
    t2 = np.zeros(n, dtype=np.int64)
    t3 = np.zeros(n, dtype=np.int64)
    t4 = np.zeros(n, dtype=np.int64)
    td = np.zeros(n, dtype=np.int64)
    ok_tn = np.ones(n, dtype=bool)
    ok_td = np.ones(n, dtype=bool)
    for i, m in enumerate(range(-ht, ht + 1)):
        a = Uq[i] * pq
        ah = a >> 20
        al = a - (ah << 20)
        p1, o1 = _sh_np(ah * vnh, ok_vn, m)
        p2, _ = _sh_np(ah * vnl, ok_vn, m)
        p3, _ = _sh_np(al * vnh, ok_vn, m)
        p4, _ = _sh_np(al * vnl, ok_vn, m)
        d_, od = _sh_np(a, ones, m)
        t1 += p1
        t2 += p2
        t3 += p3
        t4 += p4
        td += d_
        ok_tn &= o1
        ok_td &= od
    tn_obj = (
        (t1.astype(object) << 51)
        + (t2.astype(object) << 20)
        + (t3.astype(object) << 31)
        + t4
    )
    tnf = np.array([float(x) for x in tn_obj], dtype=np.float64)
    tdf = td.astype(np.float64)
    ppr = float(PP * rm)

    seasonal = np.where(ok_s2n, s2n.astype(np.float64) / ppr, np.nan)
    ok_tr = ok_tn & ok_td & (td > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        trend = np.where(ok_tr, tnf / (tdf * ppr), np.nan)
    seasonal[~ok_s2n] = np.nan
    trend[~ok_tr] = np.nan
    remainder = (v - seasonal) - trend
    rho_out = pq.astype(np.float64) / frm
    return seasonal, trend, remainder, rho_out


def _stl_robust_arrow(base, g, time_col, P, hs, ht, mult, rm):
    """:func:`stl_robust` (both passes + median join) as ONE grouped
    Arrow pass per series running :func:`_stl_robust_np`; groups with
    no scoreable pass-1 remainder emit no rows (the relational inner
    median join)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    Wq = _tricube_q(hs)
    Uq = _tricube_q(ht)
    cj = _lowpass_counts(P)
    schema = StructType(
        [StructField(c, base.schema[c].dataType) for c in g]
        + [
            StructField(time_col, base.schema["_t"].dataType),
            StructField("value", DoubleType()),
            StructField("seasonal", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("remainder", DoubleType()),
            StructField("rho", DoubleType()),
        ]
    )

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_t")
        v = pdf["_v"].to_numpy(np.float64)
        res = _stl_robust_np(v, P, hs, ht, mult, rm, Wq, Uq, cj)
        if res is None:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in schema.fields}
            )
        seasonal, trend, remainder, rho = res
        out = {c: pdf[c].to_numpy() for c in g}
        out[time_col] = pdf["_t"].to_numpy()
        out["value"] = v
        out["seasonal"] = seasonal
        out["trend"] = trend
        out["remainder"] = remainder
        out["rho"] = rho
        return pd.DataFrame(out)

    return base.groupBy(*g).applyInPandas(kern, schema)


def _chunk_explode(base, g, C: int, R: int):
    """Monster-series chunk replication (the matrix_profile chunked
    precedent): each row lands in its own chunk plus, when inside the
    two-sided reach ``R``, the adjacent chunk that needs it as context.
    Adds ``_p`` (0-based row position per group) and ``_ck`` (chunk id)
    and pins the partition count — AQE's size-based coalescing would
    fold the narrow-input exchange and re-serialize the heavy stage
    (measured in r13; see matrixprofile.py)."""
    word0 = Window.partitionBy(*g).orderBy("_t")
    p = F.row_number().over(word0).cast("bigint") - F.lit(1)
    base = base.select("*", p.alias("_p"))
    k0 = F.floor(F.col("_p") / F.lit(C)).cast("bigint")
    off0 = F.col("_p") - k0 * F.lit(C)
    cand = F.array(
        k0,
        F.when((off0 <= F.lit(R - 1)) & (k0 > 0), k0 - 1),
        F.when(off0 >= F.lit(C - R), k0 + 1),
    )
    base = base.select(
        "*",
        F.explode(F.filter(cand, lambda c: c.isNotNull())).alias("_ck"),
    )
    par = base.sparkSession.sparkContext.defaultParallelism
    return base.repartition(par, *g, "_ck")


def stl_decompose(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
    seasonal_h: int = 3,
    trend_h: int = 10,
    scale: int = 2,
    keep: tuple = (),
    chunk_rows: int | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """One-iteration STL with literal quantized-LOESS weights (module
    doc).  Returns (group..., time, value, seasonal, trend, remainder
    [, keep...]); ``keep`` columns pass through untouched (the MSTL
    composition carries the original value and prior seasonals).

    ``chunk_rows``: monster-series mitigation (the matrix_profile
    chunked precedent, two-sided reach R = hs·P + P + ht each side —
    the seasonal smoother's ±hs·P, the low-pass ±P, the trend ±ht
    compound): rows replicate into the ≤3 chunks whose extended frame
    needs them, the chunk id rides the partition key with a pinned
    partition count (AQE's size-based coalescing would fold the
    narrow-input exchange), core rows are kept — bit-identical to the
    unchunked plan (property-tested; the declared query hash-matches
    the SAME oracle).  Requires ``chunk_rows >= R + 1``."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    P = int(period)
    hs, ht = int(seasonal_h), int(trend_h)
    if P < 2 or hs < 1 or ht < 1:
        raise ValueError("need period >= 2, seasonal_h >= 1, trend_h >= 1")
    mult = 10 ** int(scale)
    Wq = _tricube_q(hs)  # seasonal weights, offsets -hs..hs (in cycles)
    Uq = _tricube_q(ht)  # trend weights, offsets -ht..ht (in rows)
    cj = _lowpass_counts(P)  # low-pass counts, offsets -P..P
    SW = sum(Wq)
    SU = sum(Uq)
    DL = SW * 3 * P * P  # seasonal-numerator denominator

    t = F.col(time_col).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731

    R = hs * P + P + ht  # two-sided compound window reach
    if chunk_rows is not None and int(chunk_rows) < R + 1:
        raise ValueError(
            f"chunk_rows must be >= seasonal_h*period + period"
            f" + trend_h + 1 = {R + 1}"
        )
    if engine == "arrow":
        # round-14 optimization (guide §1.2/§4.2): the whole window
        # chain as one grouped Arrow pass — bit-identical to the
        # relational chain (see _stl_once_np's exactness argument;
        # engine="relational" is the kept A/B control).  Only the
        # columns the kernel needs cross the Python boundary (§4.1).
        # The chunk_rows scale path reuses the kernel per (group,
        # chunk): the extended frame IS a standalone series to every
        # stage (row-shift convolutions), exactly as the relational
        # chunked chain treats it.
        ab = df.select(
            *g,
            t.alias("_t"),
            F.col(value_col).cast("double").alias("_v"),
            *[F.col(c) for c in keep],
        )
        if chunk_rows is None:
            return _stl_arrow(ab, g, time_col, P, hs, ht, mult, keep)
        C = int(chunk_rows)
        ab = _chunk_explode(ab, g, C, R)
        out = _stl_arrow(
            ab, [*g, "_ck"], time_col, P, hs, ht, mult, [*keep, "_p"]
        )
        return out.filter(
            F.floor(F.col("_p") / F.lit(C)).cast("bigint") == F.col("_ck")
        ).select(
            *g, time_col, "value", "seasonal", "trend", "remainder",
            *[F.col(c) for c in keep],
        )

    base = df.select(
        *g,
        t.alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
        F.floor(F.col(value_col).cast("double") * F.lit(mult) + F.lit(0.5))
        .cast("bigint")
        .alias("_xq"),
        *[F.col(c) for c in keep],
    )
    pk = list(g)
    if chunk_rows is not None:
        base = _chunk_explode(base, g, int(chunk_rows), R)
        pk = [*g, "_ck"]
    wi = Window.partitionBy(*pk).orderBy("_t")

    def off(col, k):
        return F.lead(col, k).over(wi) if k > 0 else (
            F.lag(col, -k).over(wi) if k < 0 else F.col(col)
        )
    # 1. cycle-subseries tricube smoothing: neighbors k cycles away are
    # exactly k*P rows away on the regular grid — one window partition
    # serves every stage
    s_num = None
    for i, k in enumerate(range(-hs, hs + 1)):
        term = F.lit(Wq[i]) * off("_xq", k * P)
        s_num = term if s_num is None else s_num + term
    s1 = base.select("*", s_num.alias("_sn"))
    # 2./3. seasonal = raw - lowpass(raw), over the common denom DL
    l_num = None
    for i, j in enumerate(range(-P, P + 1)):
        term = F.lit(cj[i]) * off("_sn", j)
        l_num = term if l_num is None else l_num + term
    s2 = s1.select(
        "*", (F.col("_sn") * F.lit(3 * P * P) - l_num).alias("_seasn")
    )
    # 4. trend: tricube LOESS-at-center of (x - seasonal), denom DL*SU
    s3 = s2.select(
        "*", (F.col("_xq") * F.lit(DL) - F.col("_seasn")).alias("_vn")
    )
    t_num = None
    for i, m in enumerate(range(-ht, ht + 1)):
        term = dec(F.lit(Uq[i])) * dec(off("_vn", m))
        t_num = term if t_num is None else t_num + term
    s4 = s3.select("*", t_num.alias("_trn"))

    den_s = float(DL * mult)
    den_t = float(DL * SU * mult)
    seasonal = s2d(F.col("_seasn")) / F.lit(den_s)
    trend = s2d(F.col("_trn")) / F.lit(den_t)
    out = s4
    if chunk_rows is not None:
        # keep each chunk's CORE rows only (context copies duplicate)
        out = out.filter(
            F.floor(F.col("_p") / F.lit(int(chunk_rows))).cast("bigint")
            == F.col("_ck")
        )
    return out.select(
        *g,
        F.col("_t").alias(time_col),
        F.col("_v").alias("value"),
        seasonal.alias("seasonal"),
        trend.alias("trend"),
        (F.col("_v") - seasonal - trend).alias("remainder"),
        *[F.col(c) for c in keep],
    )


def stl_decompose_sql(
    data_sql: str,
    value_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
    seasonal_h: int = 3,
    trend_h: int = 10,
    scale: int = 2,
    keep: tuple = (),
) -> str:
    """DuckDB twin of :func:`stl_decompose` (same literal weights,
    same integer stages via HUGEINT, same division order; ``keep``
    columns pass through like the Spark side)."""
    from timeseriesutils_spark.functions.exact import dlit
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    P = int(period)
    hs, ht = int(seasonal_h), int(trend_h)
    mult = 10 ** int(scale)
    Wq = _tricube_q(hs)
    Uq = _tricube_q(ht)
    cj = _lowpass_counts(P)
    SW = sum(Wq)
    SU = sum(Uq)
    DL = SW * 3 * P * P
    gsel = ", ".join(g)
    word = f"(PARTITION BY {gsel} ORDER BY _t)"

    def off(col: str, k: int) -> str:
        if k > 0:
            return f"LEAD({col}, {k}) OVER word"
        if k < 0:
            return f"LAG({col}, {-k}) OVER word"
        return col

    s_num = " + ".join(
        f"{Wq[i]} * {off('_xq', k * P)}"
        for i, k in enumerate(range(-hs, hs + 1))
    )
    l_num = " + ".join(
        f"{cj[i]} * {off('_sn', j)}" for i, j in enumerate(range(-P, P + 1))
    )
    t_num = " + ".join(
        f"{Uq[i]} * CAST({off('_vn', m)} AS HUGEINT)"
        for i, m in enumerate(range(-ht, ht + 1))
    )
    s2d = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731
    seasonal = f"({s2d('_seasn')} / {dlit(float(DL * mult))})"
    trend = f"({s2d('_trn')} / {dlit(float(DL * SU * mult))})"
    keep_base = "".join(f", {c}" for c in keep)
    return f"""
WITH base AS (
  SELECT {gsel}, CAST({time_col} AS BIGINT) AS _t,
    CAST({value_col} AS DOUBLE) AS _v,
    CAST(FLOOR(CAST({value_col} AS DOUBLE) * {mult} + 0.5) AS BIGINT) AS _xq{keep_base}
  FROM ({data_sql})
),
s1 AS (SELECT *, {s_num} AS _sn FROM base WINDOW word AS {word}),
s2 AS (SELECT *, _sn * {3 * P * P} - ({l_num}) AS _seasn
       FROM s1 WINDOW word AS {word}),
s3 AS (SELECT *, _xq * {DL} - _seasn AS _vn FROM s2),
s4 AS (SELECT *, {t_num} AS _trn FROM s3 WINDOW word AS {word})
SELECT {gsel}, _t AS {time_col}, _v AS value,
  {seasonal} AS seasonal, {trend} AS trend,
  _v - {seasonal} - {trend} AS remainder{keep_base}
FROM s4
"""


def _gesd_rounds_arrow(base, g, time_col, K, kq, rm):
    """The K GESD rounds as ONE grouped Arrow pass over the quantized
    remainder frame ``base`` (columns: group..., _t, _rq) — the exact
    integer recurrence of :func:`seasonal_esd`, per series:

    per round over the ACTIVE values: med2 = two-middle sum of sorted
    rq; dev = |2·rq − med2|; mad4 = two-middle sum of sorted dev;
    flag the max-dev row (min-t tiebreak) iff n ≥ 3, maxdev > 0 and
    20000·maxdev > kq·mad4, then remove it.  A round with no hit ends
    the series (the relational unroll recomputes the identical state
    and also never fires again).  Products use Python ints, so the
    firing comparison is exact at any magnitude (the relational form
    relied on the values staying under int64 — same envelope DuckDB's
    HUGEINT enforces).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField(c, base.schema[c].dataType) for c in g]
        + [
            StructField(time_col, base.schema["_t"].dataType),
            StructField("remainder", DoubleType()),
            StructField("anom_rank", IntegerType()),
        ]
    )
    out_cols = [*g, time_col, "remainder", "anom_rank"]
    frm = float(rm)

    def gesd(pdf: pd.DataFrame) -> pd.DataFrame:
        rq = pdf["_rq"].to_numpy(np.int64)
        tt = pdf["_t"].to_numpy(np.int64)
        active = np.ones(len(rq), dtype=bool)
        hits: list[tuple[int, int, int]] = []  # (_t, _rq, rank)
        for k in range(1, K + 1):
            idx = np.flatnonzero(active)
            m = idx.size
            if m < 3:
                break
            a = rq[idx]
            srt = np.sort(a)
            m1, m2 = (m + 1) // 2, (m + 2) // 2  # 1-based two-middle
            med2 = int(srt[m1 - 1]) + int(srt[m2 - 1])
            dev = np.abs(a * 2 - med2)
            dsrt = np.sort(dev)
            mad4 = int(dsrt[m1 - 1]) + int(dsrt[m2 - 1])
            maxdev = int(dev.max())
            if maxdev <= 0 or 20000 * maxdev <= kq * mad4:
                break
            cand = idx[dev == maxdev]
            j = int(cand[np.argmin(tt[cand])])
            active[j] = False
            hits.append((int(tt[j]), int(rq[j]), k))
        if not hits:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        keys = pdf.iloc[0][list(g)]
        return pd.DataFrame(
            {
                **{c: [keys[c]] * len(hits) for c in g},
                time_col: [h[0] for h in hits],
                # same IEEE op as the relational cast-divide: int64 →
                # float64, then /rm
                "remainder": [float(np.float64(h[1]) / frm) for h in hits],
                "anom_rank": [h[2] for h in hits],
            }
        )

    return base.groupBy(*g).applyInPandas(gesd, schema)


def seasonal_esd(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
    seasonal_h: int = 3,
    trend_h: int = 10,
    scale: int = 2,
    max_anomalies: int = 5,
    thresh: float = 3.0,
    r_scale: int = 6,
    engine: str = "arrow",
) -> DataFrame:
    """Seasonal anomaly detection à la S-H-ESD (Hochenbaum, Vallis &
    Kejariwal 2017): decompose with :func:`stl_decompose`, then run the
    ROBUST iterative extreme-deviate test on the remainder — up to
    ``max_anomalies`` rounds per series of "flag the largest
    |r − median| if it exceeds ``thresh`` robust z-scores, remove it,
    re-estimate median/MAD".  (The median/MAD form is the paper's
    robust variant of Rosner's 1983 GESD; the mean/sd original needs
    per-n Student-t critical values — a table, not a threshold.)

    Why iterative re-estimation, when mad_outliers / hampel_filter
    already exist: a CLUSTER of anomalies inflates even the MAD enough
    to mask its own members; GESD removes the top deviate before
    re-testing, so each round's scale estimate excludes what's already
    flagged (the "masking" failure mode, Rosner §1).

    Exactness: remainders floor-quantize at 10^-``r_scale`` and the
    whole test runs in INTEGER space — median as the two-middle sum
    (med2 = 2·median over the rq-sorted actives), deviations as
    dev = |2·rq − med2| (= 2·|r − med|), MAD as the two-middle sum of
    sorted deviations (mad4 = 4·MAD), and the firing rule
    |r − med| > thresh·1.4826·MAD  (thresh in sigma units via the
    mad_outliers consistency constant) as the integer comparison
    20000·maxdev > round(14826·thresh)·mad4.  Argmax ties break on the
    smaller time index; both engines run the identical integer
    recurrence, so flags, ranks, and order match exactly.  MAD = 0
    with a positive deviation fires (infinite robust z); all-equal
    actives stop the loop; series shrink below 3 actives stop.

    Scale shape (round-14 optimization, guide §1.2/§4.2): the stl
    window chain (one exchange per series), then ALL K rounds in ONE
    grouped Arrow pass — ``applyInPandas`` per series runs the exact
    integer recurrence above in numpy/Python-int arithmetic, emitting
    only the flagged rows.  The kernel is bit-identical to the
    relational unroll (``engine="relational"``, kept as the A/B
    control): both compute med2/mad4 as two-middle sums over the same
    (value, t) total order, the same integer firing rule with
    arbitrary-precision products, the same min-t argmax tiebreak; the
    declared query hash-matches the SAME DuckDB oracle.  Rationale:
    the unroll paid per round two rank-window exchanges, three
    aggregations, three joins and a durable-parquet lineage barrier —
    10 shuffles + 5 materializations of the full remainder frame for
    what is per series a ≤K-step fold over ≤series-length values
    (measured 31.8 → ~8 s at sf0.1; the residual is the STL chain).
    Per-group state is one series (the window chain already imposes
    that envelope); rounds are sequential only WITHIN a series, so
    the pass scales as one Pregel-free map over groups at 100 TB.
    The DuckDB twin stays the relational unroll as MATERIALIZED CTEs
    (inlining would recompute the upstream chain 2^K times).

    Returns flagged rows only: (group..., time, remainder, anom_rank),
    anom_rank = 1 for the most extreme.
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    K = int(max_anomalies)
    # |r - med| > thresh * 1.4826 * MAD (the mad_outliers consistency
    # constant, so thresh reads in sigma units), as the integer rule
    # 20000 * maxdev > kq * mad4 with maxdev = 2|r-med|max, mad4 = 4*MAD
    kq = int(round(float(thresh) * 1.4826 * 10000))
    rm = 10 ** int(r_scale)
    dec = stl_decompose(
        df, value_col, time_col, group_columns,
        period=period, seasonal_h=seasonal_h, trend_h=trend_h, scale=scale,
    )
    base = dec.filter(F.col("remainder").isNotNull()).select(
        *g,
        F.col(time_col).cast("bigint").alias("_t"),
        F.floor(F.col("remainder") * F.lit(rm) + F.lit(0.5))
        .cast("bigint")
        .alias("_rq"),
    )
    if engine == "arrow":
        return _gesd_rounds_arrow(base, g, time_col, K, kq, rm)
    # relational unroll — the A/B control (engine="relational"): per
    # round two rank windows, three aggregations, three joins, one
    # durable lineage checkpoint.  Kept verbatim so the arrow kernel's
    # equivalence stays measurable (tests/test_round14_opt.py).
    # Per-round lineage checkpoint (the pagerank precedent,
    # graph.py:166): cur(k-1) is referenced ~5 times per round, so an
    # un-truncated logical plan grows 5^K over the stl subtree and
    # Catalyst analysis alone takes minutes; the checkpoint severs it.
    # Parquet tier (round-13 default, functions/checkpoint.py): durable
    # across executor loss at cluster scale, measured cost-neutral vs
    # the executor-pinned localCheckpoint (BASELINE.md r13 A/B).
    from timeseriesutils_spark.functions.checkpoint import parquet_checkpoint

    cur = parquet_checkpoint(
        base.select(*g, "_t", "_rq", F.lit(0).cast("int").alias("_rnk")),
        "esd",
    )
    for k in range(1, K + 1):
        wrq = Window.partitionBy(*g).orderBy("_rq", "_t")
        wg = Window.partitionBy(*g)
        act = cur.filter(F.col("_rnk") == 0).select(
            *g, "_t", "_rq",
            F.row_number().over(wrq).alias("_rn"),
            F.count(F.lit(1)).over(wg).alias("_n"),
        )
        m1 = F.floor((F.col("_n") + 1) / 2).cast("bigint")
        m2 = F.floor((F.col("_n") + 2) / 2).cast("bigint")
        mult = (F.col("_rn") == m1).cast("bigint") + (
            F.col("_rn") == m2
        ).cast("bigint")
        med = act.groupBy(*g).agg(F.sum(F.col("_rq") * mult).alias("_med2"))
        wdev = Window.partitionBy(*g).orderBy("_dev", "_t")
        dev = act.join(med, g).select(
            *g, "_t", "_n",
            F.abs(F.col("_rq") * 2 - F.col("_med2")).alias("_dev"),
        ).select("*", F.row_number().over(wdev).alias("_drn"))
        dmult = (F.col("_drn") == m1).cast("bigint") + (
            F.col("_drn") == m2
        ).cast("bigint")
        mad = dev.groupBy(*g).agg(
            F.sum(F.col("_dev") * dmult).alias("_mad4"),
            F.max("_dev").alias("_maxdev"),
            F.max("_n").alias("_nn"),
        )
        hit = (
            dev.join(mad, g)
            .filter(
                (F.col("_dev") == F.col("_maxdev"))
                & (F.col("_nn") >= 3)
                & (F.col("_maxdev") > 0)
                & (
                    F.col("_maxdev") * F.lit(20000)
                    > F.lit(kq) * F.col("_mad4")
                )
            )
            .groupBy(*g)
            .agg(F.min("_t").alias("_hit_t"))
        )
        cur = parquet_checkpoint(
            cur.join(hit, g, "left").select(
                *g, "_t", "_rq",
                F.when(
                    (F.col("_rnk") == 0) & (F.col("_t") == F.col("_hit_t")),
                    F.lit(k),
                )
                .otherwise(F.col("_rnk"))
                .cast("int")
                .alias("_rnk"),
            ),
            f"esd{k}",
        )
    return cur.filter(F.col("_rnk") > 0).select(
        *g,
        F.col("_t").alias(time_col),
        (F.col("_rq").cast("double") / F.lit(float(rm))).alias("remainder"),
        F.col("_rnk").alias("anom_rank"),
    )


def seasonal_esd_sql(
    data_sql: str,
    value_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
    seasonal_h: int = 3,
    trend_h: int = 10,
    scale: int = 2,
    max_anomalies: int = 5,
    thresh: float = 3.0,
    r_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`seasonal_esd`: the same integer GESD
    recurrence with the K rounds UNROLLED as relational CTEs — per
    round, windowed two-middle medians (ROW_NUMBER over a (value, t)
    total order, the deterministic-tie rule), one deviation join, one
    max/threshold gate, one rank update.  Odd-n medians count the
    middle row twice (the multiplicity CASE) so med2/mad4 stay exactly
    2·median / the doubled MAD sum of the Spark fold."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    K = int(max_anomalies)
    kq = int(round(float(thresh) * 1.4826 * 10000))
    rm = 10 ** int(r_scale)
    stl = stl_decompose_sql(
        data_sql, value_col, time_col, group_columns,
        period=period, seasonal_h=seasonal_h, trend_h=trend_h, scale=scale,
    )
    # AS MATERIALIZED on the chain carriers: each s{k} is referenced
    # twice (act{k} and s{k+1}); inlining would recompute the whole
    # upstream chain per reference -- 2^K blowup over the stl subquery
    ctes = [
        f"""s0 AS MATERIALIZED (
  SELECT {gsel}, CAST({time_col} AS BIGINT) AS t,
    CAST(FLOOR(remainder * {rm} + 0.5) AS BIGINT) AS rq,
    CAST(0 AS INT) AS rnk
  FROM ({stl}) WHERE remainder IS NOT NULL
)"""
    ]
    for k in range(1, K + 1):
        prev = f"s{k - 1}"
        ctes.append(
            f"""act{k} AS MATERIALIZED (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY rq, t) AS rn,
         COUNT(*) OVER (PARTITION BY {gsel}) AS n
  FROM {prev} WHERE rnk = 0
)"""
        )
        ctes.append(
            f"""med{k} AS (
  SELECT {gsel}, SUM(rq * (CASE WHEN rn = (n + 1) // 2 THEN 1 ELSE 0 END
                         + CASE WHEN rn = (n + 2) // 2 THEN 1 ELSE 0 END)) AS med2
  FROM act{k} GROUP BY {gsel}
)"""
        )
        ctes.append(
            f"""dev{k} AS MATERIALIZED (
  SELECT a.*, abs(a.rq * 2 - m.med2) AS dev,
    ROW_NUMBER() OVER (PARTITION BY {gsel}
                       ORDER BY abs(a.rq * 2 - m.med2), a.t) AS drn
  FROM act{k} a JOIN med{k} m USING ({gsel})
)"""
        )
        ctes.append(
            f"""mad{k} AS (
  SELECT {gsel},
    SUM(dev * (CASE WHEN drn = (n + 1) // 2 THEN 1 ELSE 0 END
             + CASE WHEN drn = (n + 2) // 2 THEN 1 ELSE 0 END)) AS mad4,
    MAX(dev) AS maxdev, MAX(n) AS n
  FROM dev{k} GROUP BY {gsel}
)"""
        )
        ctes.append(
            f"""hit{k} AS (
  SELECT d.{gsel.replace(', ', ', d.')}, MIN(d.t) AS hit_t
  FROM dev{k} d JOIN mad{k} x USING ({gsel})
  WHERE d.dev = x.maxdev AND x.n >= 3 AND x.maxdev > 0
    AND x.maxdev * 20000 > {kq} * x.mad4
  GROUP BY d.{gsel.replace(', ', ', d.')}
)"""
        )
        ctes.append(
            f"""s{k} AS MATERIALIZED (
  SELECT p.{gsel.replace(', ', ', p.')}, p.t, p.rq,
    CASE WHEN h.hit_t = p.t AND p.rnk = 0 THEN {k} ELSE p.rnk END AS rnk
  FROM {prev} p LEFT JOIN hit{k} h USING ({gsel})
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT {gsel}, t AS {time_col},
  CAST(rq AS DOUBLE) / {float(rm)} AS remainder, rnk AS anom_rank
FROM s{K} WHERE rnk > 0"""
    )


def stl_robust(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
    seasonal_h: int = 3,
    trend_h: int = 10,
    scale: int = 2,
    r_scale: int = 6,
    engine: str = "arrow",
) -> DataFrame:
    """STL with ONE robustness (outer) iteration — the full Cleveland
    1990 algorithm's outlier-resistant mode: after the
    :func:`stl_decompose` inner pass, each point gets a bisquare
    robustness weight from the remainder,

        ρ_t = (1 − u²)²,  u = |r_t| / (6·median|r|),  ρ = 0 for u ≥ 1

    (paper §3.3, the B(u) weight with h = 6·median), and the second
    inner pass re-runs both LOESS smoothers WEIGHTED — so a spike that
    leaked into its neighbors' fits in the plain pass (see the
    seasonal_esd echo-flag note) is down-weighted to ρ ≈ 0 and stops
    polluting the decomposition.

    Weighted LOESS-at-center is still a ratio of window sums,
    Σ w_k·ρ_k·x_k / Σ w_k·ρ_k — but the denominator is now
    data-dependent, so exact single-denominator rational chaining
    (stl_decompose's trick) is impossible across stages.  The
    discipline instead: every stage's ratio is evaluated as ONE shared
    double tree over exact-integer numerator/denominator and
    floor-RE-QUANTIZED at 10^-``r_scale`` before feeding the next
    stage (the standing libm-grid rule, applied stage-wise), so both
    engines walk identical integer stage inputs.  All-zero weight
    windows (an outlier cluster wider than the smoother) yield NULL;
    a perfect pass-1 fit (median|r| = 0) sets every ρ = 1.

    Detrending: pass 2 smooths (value − trend₁) cycle-subseries, per
    the paper's step-1-of-iteration-2 (pass 1 used T⁰ = 0).

    Plan shape: the stl_decompose window chain plus one per-group
    median aggregation (two-middle ROW_NUMBER multiplicity, the
    deterministic-tie rule) broadcast-joined back, then the same
    lead/lag smoother chain again with weight products — still one
    exchange per series plus one broadcastable aggregate, no Python.

    Returns (group..., time, value, seasonal, trend, remainder,
    rho) — pass-2 components and the robustness weight.
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    P = int(period)
    hs, ht = int(seasonal_h), int(trend_h)
    rm = 10 ** int(r_scale)
    Wq = _tricube_q(hs)
    Uq = _tricube_q(ht)
    cj = _lowpass_counts(P)
    PP = 3 * P * P

    if engine == "arrow":
        # round-14 (guide §1.2/§4.2): both passes + the median join as
        # ONE grouped Arrow pass per series (_stl_robust_np) — removes
        # the pin materialization, the median windows/join, and the
        # post-kernel re-exchange the split-relational pass 2 paid.
        # engine="relational" keeps that chain as the A/B control.
        ab = df.select(
            *g,
            F.col(time_col).cast("bigint").alias("_t"),
            F.col(value_col).cast("double").alias("_v"),
        )
        return _stl_robust_arrow(
            ab, g, time_col, P, hs, ht, 10 ** int(scale), rm
        )

    d1 = stl_decompose(
        df, value_col, time_col, group_columns,
        period=period, seasonal_h=seasonal_h, trend_h=trend_h, scale=scale,
    )
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    q6 = lambda c: F.floor(c * F.lit(rm) + F.lit(0.5)).cast("bigint")  # noqa: E731

    from timeseriesutils_spark.functions.cache import pin

    # base feeds the median aggregation AND the weight join -- pin the
    # fork or the whole pass-1 window chain executes twice
    base = pin(
        d1.select(
            *g,
            F.col(time_col).alias("_t"),
            F.col("value").alias("_v"),
            F.col("trend").alias("_tr1"),
            q6(F.abs(F.col("remainder"))).alias("_aq"),
        )
    )
    # per-series median|r| as the two-middle sum (med2 = 2*median);
    # NULL-remainder edge rows carry no weight vote but stay on the grid
    wrq = Window.partitionBy(*g).orderBy("_aq", "_t")
    wg = Window.partitionBy(*g)
    act = base.filter(F.col("_aq").isNotNull()).select(
        *g, "_aq",
        F.row_number().over(wrq).alias("_rn"),
        F.count(F.lit(1)).over(wg).alias("_n"),
    )
    m1 = F.floor((F.col("_n") + 1) / 2).cast("bigint")
    m2 = F.floor((F.col("_n") + 2) / 2).cast("bigint")
    mlt = (F.col("_rn") == m1).cast("bigint") + (F.col("_rn") == m2).cast("bigint")
    med = act.groupBy(*g).agg(F.sum(F.col("_aq") * mlt).alias("_med2"))

    u = s2d(F.col("_aq")) / (F.lit(3.0) * s2d(F.col("_med2")))  # |r|/(6*med)
    bisq = (F.lit(1.0) - u * u) * (F.lit(1.0) - u * u)
    rho_d = F.when(F.col("_aq").isNull(), F.lit(0.0)).otherwise(
        F.when(F.col("_med2") == 0, F.lit(1.0)).otherwise(
            F.when(u < F.lit(1.0), bisq).otherwise(F.lit(0.0))
        )
    )
    # pass-1 margin rows (trend₁ NULL) carry rho = 0 — coalesce their
    # detrended term to 0 so the zero-weight product stays 0 instead of
    # 0·NULL = NULL poisoning every smoother window that touches an
    # edge row (ADVICE r12: keeps the NULL margin at stl_decompose's
    # documented complete-window margin, not hs·P + P + ht wider)
    w0 = base.join(F.broadcast(med), g).select(
        *g, "_t", "_v",
        q6(rho_d).alias("_pq"),
        F.coalesce(
            q6(F.col("_v") - F.col("_tr1")), F.lit(0)
        ).alias("_dxq"),
        q6(F.col("_v")).alias("_xq"),
    )

    wi = Window.partitionBy(*g).orderBy("_t")

    def off(col, k):
        return F.lead(col, k).over(wi) if k > 0 else (
            F.lag(col, -k).over(wi) if k < 0 else F.col(col)
        )

    # weighted cycle-subseries smoothing on the detrended series.
    # Round-14 (guide §1.2): the Σ dec(w·ρ)·dec(dx) numerator (a
    # BigDecimal multiply per term per row — measured to dominate the
    # pass-2 chain) is computed by the hi/lo INT64 split
    #   dx = (dx >> 20)·2^20 + lo,   Σ A·dx = 2^20·Σ A·hi + Σ A·lo
    # (exact integer identity), so the per-term work is int64 and ONE
    # decimal recombination per row remains.  Envelope: |Σ A·lo| ≤
    # ΣWq·ρmax·2^20 ≈ 4.9e18 and |Σ A·hi| ≤ ΣWq·ρmax·|dx|/2^20 —
    # int64-safe for |v − trend₁| up to ~2e6 at r_scale 6; beyond
    # that ANSI raises loudly (the decimal form's envelope was wider,
    # but real data sits 5 orders of magnitude inside).
    w0 = w0.select(
        "*",
        F.shiftright(F.col("_dxq"), 20).alias("_dxh"),
        (F.col("_dxq") - F.shiftright(F.col("_dxq"), 20) * F.lit(1 << 20))
        .alias("_dxl"),
    )
    snh = None
    snl = None
    sd = None
    for i, k in enumerate(range(-hs, hs + 1)):
        a = F.lit(Wq[i]) * off("_pq", k * P)
        th = a * off("_dxh", k * P)
        tl = a * off("_dxl", k * P)
        den = F.lit(Wq[i]) * off("_pq", k * P)
        snh = th if snh is None else snh + th
        snl = tl if snl is None else snl + tl
        sd = den if sd is None else sd + den
    sn = dec(snh) * dec(F.lit(1 << 20)) + dec(snl)
    s1 = w0.select(
        "*",
        q6(
            F.when(sd > 0, s2d(sn) / s2d(sd) / F.lit(float(rm)))
        ).alias("_srq"),
    )
    # low-pass (exact integer kernel) and seasonal numerator
    ln = None
    for i, j in enumerate(range(-P, P + 1)):
        term = F.lit(cj[i]) * off("_srq", j)
        ln = term if ln is None else ln + term
    s2 = s1.select("*", (F.col("_srq") * F.lit(PP) - ln).alias("_s2n"))
    # weighted trend on the deseasonalized series (common denom PP*rm)
    s3 = s2.select("*", (F.col("_xq") * F.lit(PP) - F.col("_s2n")).alias("_vn"))
    # trend numerator Σ dec(w·ρ)·dec(vn): |vn| reaches ~4e13 and
    # A = w·ρ ~1e12, so BOTH factors split — A at 2^20 (ρ and the
    # tricube quantum are each ≤ 1e6, so A's halves are ≤ ~1e6) and
    # vn at 2^31.  The four partial convolutions are int64-safe by the
    # same ΣUq·ρmax envelope arithmetic as the seasonal stage; the
    # exact-integer recombination is THREE decimal multiplies per row
    # instead of twenty-one:
    #   Σ A·vn = 2^51·Σah·vh + 2^20·Σah·vl + 2^31·Σal·vh + Σal·vl
    s3 = s3.select(
        "*",
        F.shiftright(F.col("_vn"), 31).alias("_vnh"),
        (F.col("_vn") - F.shiftright(F.col("_vn"), 31) * F.lit(1 << 31))
        .alias("_vnl"),
    )
    t1 = None
    t2 = None
    t3 = None
    t4 = None
    td = None
    for i, m in enumerate(range(-ht, ht + 1)):
        a = F.lit(Uq[i]) * off("_pq", m)
        ah = F.shiftright(a, 20)
        al = a - F.shiftright(a, 20) * F.lit(1 << 20)
        vh = off("_vnh", m)
        vl = off("_vnl", m)
        den = F.lit(Uq[i]) * off("_pq", m)
        t1 = ah * vh if t1 is None else t1 + ah * vh
        t2 = ah * vl if t2 is None else t2 + ah * vl
        t3 = al * vh if t3 is None else t3 + al * vh
        t4 = al * vl if t4 is None else t4 + al * vl
        td = den if td is None else td + den
    tn = (
        dec(t1) * dec(F.lit(1 << 51))
        + dec(t2) * dec(F.lit(1 << 20))
        + dec(t3) * dec(F.lit(1 << 31))
        + dec(t4)
    )
    s4 = s3.select("*", tn.alias("_tn"), td.alias("_td"))

    seasonal = s2d(F.col("_s2n")) / F.lit(float(PP * rm))
    trend = F.when(
        F.col("_td") > 0,
        s2d(F.col("_tn")) / (s2d(F.col("_td")) * F.lit(float(PP * rm))),
    )
    return s4.select(
        *g,
        F.col("_t").alias(time_col),
        F.col("_v").alias("value"),
        seasonal.alias("seasonal"),
        trend.alias("trend"),
        (F.col("_v") - seasonal - trend).alias("remainder"),
        (F.col("_pq").cast("double") / F.lit(float(rm))).alias("rho"),
    )


def stl_robust_sql(
    data_sql: str,
    value_col: str,
    time_col: str,
    group_columns,
    period: int = 7,
    seasonal_h: int = 3,
    trend_h: int = 10,
    scale: int = 2,
    r_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`stl_robust` (same stage-wise re-quantized
    integer chain, HUGEINT weighted sums, same division order)."""
    from timeseriesutils_spark.functions.exact import dlit
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    P = int(period)
    hs, ht = int(seasonal_h), int(trend_h)
    rm = 10 ** int(r_scale)
    Wq = _tricube_q(hs)
    Uq = _tricube_q(ht)
    cj = _lowpass_counts(P)
    PP = 3 * P * P
    stl = stl_decompose_sql(
        data_sql, value_col, time_col, group_columns,
        period=period, seasonal_h=seasonal_h, trend_h=trend_h, scale=scale,
    )
    word = f"(PARTITION BY {gsel} ORDER BY _t)"

    def off(col: str, k: int) -> str:
        if k > 0:
            return f"LEAD({col}, {k}) OVER word"
        if k < 0:
            return f"LAG({col}, {-k}) OVER word"
        return col

    s2d = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731
    q6 = lambda x: f"CAST(FLOOR(({x}) * {rm} + 0.5) AS BIGINT)"  # noqa: E731

    sn = " + ".join(
        f"CAST({Wq[i]} * {off('_pq', k * P)} AS HUGEINT) * CAST({off('_dxq', k * P)} AS HUGEINT)"
        for i, k in enumerate(range(-hs, hs + 1))
    )
    sd = " + ".join(
        f"{Wq[i]} * {off('_pq', k * P)}" for i, k in enumerate(range(-hs, hs + 1))
    )
    ln = " + ".join(
        f"{cj[i]} * {off('_srq', j)}" for i, j in enumerate(range(-P, P + 1))
    )
    tn = " + ".join(
        f"CAST({Uq[i]} * {off('_pq', m)} AS HUGEINT) * CAST({off('_vn', m)} AS HUGEINT)"
        for i, m in enumerate(range(-ht, ht + 1))
    )
    td = " + ".join(
        f"{Uq[i]} * {off('_pq', m)}" for i, m in enumerate(range(-ht, ht + 1))
    )
    u = f"({s2d('_aq')} / (3.0 * {s2d('_med2')}))"
    bisq = f"((1.0 - {u} * {u}) * (1.0 - {u} * {u}))"
    rho = (
        f"CASE WHEN _aq IS NULL THEN 0.0 WHEN _med2 = 0 THEN 1.0 "
        f"WHEN {u} < 1.0 THEN {bisq} ELSE 0.0 END"
    )
    seasonal = f"({s2d('_s2n')} / {dlit(float(PP * rm))})"
    trend = (
        f"(CASE WHEN _td > 0 THEN {s2d('_tn')} / ({s2d('_td')} * {dlit(float(PP * rm))}) END)"
    )
    return f"""
WITH d1 AS MATERIALIZED (
  SELECT {gsel}, {time_col} AS _t, value AS _v, trend AS _tr1,
    {q6(f'abs(remainder)')} AS _aq
  FROM ({stl})
),
act AS (
  SELECT {gsel}, _aq,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY _aq, _t) AS _rn,
    COUNT(*) OVER (PARTITION BY {gsel}) AS _n
  FROM d1 WHERE _aq IS NOT NULL
),
med AS (
  SELECT {gsel}, SUM(_aq * (CASE WHEN _rn = (_n + 1) // 2 THEN 1 ELSE 0 END
                          + CASE WHEN _rn = (_n + 2) // 2 THEN 1 ELSE 0 END)) AS _med2
  FROM act GROUP BY {gsel}
),
w0 AS (
  SELECT {gsel}, _t, _v, {q6(rho)} AS _pq,
    COALESCE({q6('_v - _tr1')}, 0) AS _dxq, {q6('_v')} AS _xq
  FROM d1 JOIN med USING ({gsel})
),
s1 AS (
  SELECT *, {q6(f"CASE WHEN ({sd}) > 0 THEN {s2d(f'({sn})')} / {s2d(f'({sd})')} / {dlit(float(rm))} END")} AS _srq
  FROM w0 WINDOW word AS {word}
),
s2 AS (SELECT *, _srq * {PP} - ({ln}) AS _s2n FROM s1 WINDOW word AS {word}),
s3 AS (SELECT *, _xq * {PP} - _s2n AS _vn FROM s2),
s4 AS (SELECT *, {tn} AS _tn, {td} AS _td FROM s3 WINDOW word AS {word})
SELECT {gsel}, _t AS {time_col}, _v AS value,
  {seasonal} AS seasonal, {trend} AS trend,
  _v - {seasonal} - {trend} AS remainder,
  CAST(_pq AS DOUBLE) / {dlit(float(rm))} AS rho
FROM s4
"""


def mstl_decompose(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_columns,
    periods: tuple = (7, 14),
    seasonal_h: int = 3,
    trend_h: int = 10,
    scale: int = 2,
) -> DataFrame:
    """MSTL — multi-seasonal STL (Bandara, Hyndman & Bergmeir 2021):
    decompose a series with SEVERAL seasonal periods (e.g. daily series
    with weekly + biweekly cycles) by iterating :func:`stl_decompose`
    over an ascending literal period list — each pass extracts one
    seasonal component from the previous pass's deseasonalized series,
    the FINAL pass's trend is the trend, and the remainder subtracts
    every component:

        s₁ = STL_{P₁}(x).seasonal
        s₂ = STL_{P₂}(x − s₁).seasonal,  T = STL_{P₂}(x − s₁).trend
        r  = x − s₁ − s₂ − T

    One refinement sweep (the paper's ``iterate=1`` default re-runs
    each seasonal against the others' latest estimates; this is the
    iterate=0 single forward sweep — documented, and the standard
    cheap mode when periods are well separated).

    Exactness: pass k's input x − Σs is the SAME IEEE double in both
    engines (value double minus exact-ratio seasonals, one shared
    tree), so pass k's 10^-scale floor-quantization lands identically;
    from there each pass is the stl_decompose integer machinery.  NULL
    margins compound: pass 2's complete-window margin applies on top
    of pass 1's (rows where s₁ is NULL quantize to NULL and propagate)
    — the documented MSTL edge cost.

    Scale shape: the stl window chain twice on the SAME partition key
    — one exchange, two sort-window sweeps, no joins (the ``keep``
    passthrough carries the original value and s₁ through pass 2
    instead of a join-back).

    Returns (group..., time, value, seasonal_p{P1}, seasonal_p{P2},
    trend, remainder).
    """
    ps = [int(p) for p in periods]
    if len(ps) != 2:
        raise ValueError("mstl_decompose: exactly two periods supported")
    if ps[0] >= ps[1]:
        raise ValueError("periods must be ascending")
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    d1 = stl_decompose(
        df, value_col, time_col, group_columns,
        period=ps[0], seasonal_h=seasonal_h, trend_h=trend_h, scale=scale,
    )
    in2 = d1.select(
        *g,
        F.col(time_col),
        F.col("value").alias("_v0"),
        F.col("seasonal").alias("_s1"),
        (F.col("value") - F.col("seasonal")).alias("_v2"),
    )
    d2 = stl_decompose(
        in2, "_v2", time_col, group_columns,
        period=ps[1], seasonal_h=seasonal_h, trend_h=trend_h, scale=scale,
        keep=("_v0", "_s1"),
    )
    return d2.select(
        *g,
        F.col(time_col),
        F.col("_v0").alias("value"),
        F.col("_s1").alias(f"seasonal_p{ps[0]}"),
        F.col("seasonal").alias(f"seasonal_p{ps[1]}"),
        F.col("trend"),
        (
            F.col("_v0") - F.col("_s1") - F.col("seasonal") - F.col("trend")
        ).alias("remainder"),
    )


def mstl_decompose_sql(
    data_sql: str,
    value_col: str,
    time_col: str,
    group_columns,
    periods: tuple = (7, 14),
    seasonal_h: int = 3,
    trend_h: int = 10,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`mstl_decompose` (the same two chained
    stl_decompose twins; pass-2 input is the identical double
    expression, so the pass-2 quantization grid lands identically)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    ps = [int(p) for p in periods]
    if len(ps) != 2:
        raise ValueError("mstl_decompose: exactly two periods supported")
    if ps[0] >= ps[1]:
        raise ValueError("periods must be ascending")
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    stage1 = stl_decompose_sql(
        data_sql, value_col, time_col, group_columns,
        period=ps[0], seasonal_h=seasonal_h, trend_h=trend_h, scale=scale,
    )
    in2 = f"""
SELECT {gsel}, {time_col}, value AS _v0, seasonal AS _s1,
  value - seasonal AS _v2
FROM ({stage1})
"""
    stage2 = stl_decompose_sql(
        f"({in2})", "_v2", time_col, group_columns,
        period=ps[1], seasonal_h=seasonal_h, trend_h=trend_h, scale=scale,
        keep=("_v0", "_s1"),
    )
    return f"""
SELECT {gsel}, {time_col}, _v0 AS value,
  _s1 AS seasonal_p{ps[0]}, seasonal AS seasonal_p{ps[1]}, trend,
  _v0 - _s1 - seasonal - trend AS remainder
FROM ({stage2})
"""
