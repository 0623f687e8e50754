"""Dominant-frequency (periodogram) features.

Reference: ``domfreq`` + helpers (featurize.py:604-686, 557-601, 519-554).
As shipped the reference **crashes unconditionally** — iterating
``ext_data.rolling(w)`` yields partial leading windows whose PSD has fewer
bins than ``n_domfreq``, so ``np.argpartition`` raises on the first window
(SURVEY §2.4.5; no reference test covers it).  This module implements the
*documented intent*: per group/column/(w, align), compute the power
spectral density of each complete length-w window (scipy-``periodogram``
semantics: boxcar window, one-sided, linear detrend by default) and emit
the top ``n_domfreq`` frequencies by power (descending) as
``{c}_domfreq{i}_w{w}{a}`` plus their log-powers
``{c}_domfreq{i}_logpow_w{w}{a}``.

Edge policy (reference featurize.py:574-587): the group's frame is padded
by *duplicating* head/tail blocks — centered: first ``w//2`` rows
prepended and last ``w//2`` appended; trailing: first ``w`` rows prepended
— so every original row has a complete window.  Windows containing NULL
produce NULL features.

Spark mapping: an FFT is not expressible in relational builtins, so this is
the one operator on the featurization surface that runs Python — a grouped
``applyInPandas`` where *all* windows of a group are computed in a single
vectorized ``numpy.fft.rfft`` call over a strided window matrix (the
reference re-enters Python once per window; here it's once per group,
Arrow-batched).  Scale: parallel across groups; a single monster group
serializes — split such series upstream into overlapping chunks of
``chunk + w - 1`` rows if that ever binds.
"""

from __future__ import annotations

from itertools import product

import numpy as np
from pyspark.sql import DataFrame

from timeseriesutils_spark.functions.names import domfreq_logpow_name, domfreq_name
from timeseriesutils_spark.operators.window_features import _as_list


def _detrend(x: np.ndarray, mode) -> np.ndarray:
    """scipy.signal.detrend semantics for 'linear'/'constant'/False, applied
    along axis=-1 of a (num_windows, w) matrix."""
    if mode in (False, None, "none"):
        return x
    if mode == "constant":
        return x - x.mean(axis=-1, keepdims=True)
    if mode == "linear":
        n = x.shape[-1]
        t = np.arange(n, dtype="float64")
        # least-squares line per row: slope/intercept via closed form
        t_mean = t.mean()
        x_mean = x.mean(axis=-1, keepdims=True)
        denom = ((t - t_mean) ** 2).sum()
        slope = ((t - t_mean) * (x - x_mean)).sum(axis=-1, keepdims=True) / denom
        return x - x_mean - slope * (t - t_mean)
    raise ValueError(f"unsupported detrend {mode!r}")


def _periodogram(windows: np.ndarray, fs: float, detrend) -> tuple[np.ndarray, np.ndarray]:
    """One-sided periodogram of each row; returns (freqs, psd[num_windows, bins]).

    Matches scipy.signal.periodogram defaults (boxcar window, nfft = w):
    psd = |rfft(x)|² / (fs·w), doubled for non-DC/non-Nyquist bins.
    """
    w = windows.shape[-1]
    det = _detrend(windows.astype("float64"), detrend)
    spec = np.fft.rfft(det, axis=-1)
    psd = (spec.real**2 + spec.imag**2) / (fs * w)
    if w % 2 == 0:
        psd[..., 1:-1] *= 2.0
    else:
        psd[..., 1:] *= 2.0
    freqs = np.fft.rfftfreq(w, d=1.0 / fs)
    return freqs, psd


def domfreq_matrix(
    window_size: int, fs: float = 1.0, detrend="linear"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Constant matrices that make the fixed-w periodogram a LINEAR map
    (the taylor trick, taylor.py:82): detrending is a projection
    ``(I - P)`` and the DFT a fixed complex matrix ``F``, so

        spec_m = Σ_j C[m, j] · x_j,   C = F · (I - P)

    and ``psd_m = |spec_m|² · mult_m`` — two squared linear combinations
    of the window elements.  Returns (C complex (B, w), mult (B,),
    freqs (B,)) for the B = w//2 + 1 one-sided bins, matching
    scipy.signal.periodogram defaults (boxcar, nfft = w)."""
    w = window_size
    t = np.arange(w, dtype="float64")
    if detrend in (False, None, "none"):
        D = np.eye(w)
    elif detrend == "constant":
        D = np.eye(w) - np.ones((w, w)) / w
    elif detrend == "linear":
        X = np.stack([np.ones(w), t], axis=1)
        D = np.eye(w) - X @ np.linalg.pinv(X)
    else:
        raise ValueError(f"unsupported detrend {detrend!r}")
    m = np.arange(w // 2 + 1)
    C = np.exp(-2j * np.pi * np.outer(m, t) / w) @ D
    mult = np.full(w // 2 + 1, 2.0 / (fs * w))
    mult[0] = 1.0 / (fs * w)
    if w % 2 == 0:
        mult[-1] = 1.0 / (fs * w)
    freqs = np.fft.rfftfreq(w, d=1.0 / fs)
    return C, mult, freqs


def _elem_sql(y: str, off: int, over: str) -> str:
    if off < 0:
        return f"LAG({y}, {-off}) OVER {over}"
    if off > 0:
        return f"LEAD({y}, {off}) OVER {over}"
    return y


def domfreq_sql_parts(
    y: str,
    partition_sql: str,
    seq: str = "seq",
    window_size: int = 8,
    window_align: str = "trailing",
    fs: float = 1.0,
    detrend="linear",
    include_dc: bool = False,
) -> tuple[list[int], np.ndarray, list[tuple[str, str]], list[tuple[str, str]]]:
    """Dialect-neutral SQL twin of the periodogram: identical text runs
    on Spark (selectExpr) and DuckDB, so double arithmetic is
    bit-identical — the same renderer-IS-the-oracle design as
    taylor_sql_columns.

    Window elements reproduce the edge-duplication policy
    (featurize.py:574-587) with pure RELATIVE offsets: duplicating the
    head/tail block means an edge row's window re-reads values at small
    offsets from itself, so every element is a per-row CASE between two
    LAG/LEAD offsets on the row's position ``seq`` (0-based row number
    within the group, computed by the caller; ordering by ``seq`` itself
    keeps the OVER clause tiny).

    Returns (bins, freqs, re_im_exprs, psd_exprs); ``psd_exprs`` reference
    the re/im columns by name, so render them in a second SELECT stage.
    ``include_dc=False`` drops bin 0: after detrending, DC power is
    numerical noise (~1e-30) whose top-k rank would be a float-noise
    lottery — the dominant-frequency intent is the positive bins.
    """
    w = window_size
    over = f"(PARTITION BY {partition_sql} ORDER BY {seq})"
    if window_align == "trailing":
        # ext = concat(y[:w], y); row r reads ext[r+1 : r+1+w]
        elems = []
        for j in range(w):
            dup = _elem_sql(y, j + 1, over)       # head block: y[r+1+j]
            interior = _elem_sql(y, j + 1 - w, over)
            if j == w - 1:
                elems.append(interior)            # head cond r+w < w impossible
            else:
                elems.append(
                    f"CASE WHEN {seq} + {j + 1} < {w} THEN {dup} ELSE {interior} END"
                )
    elif window_align == "centered":
        # ext = concat(y[:hw], y, y[n-hw:]); row r reads ext[r : r+w]
        hw = w // 2
        nexpr = f"COUNT(*) OVER (PARTITION BY {partition_sql})"
        elems = []
        for j in range(w):
            if j < hw:
                dup = _elem_sql(y, j, over)       # head block: y[r+j]
                interior = _elem_sql(y, j - hw, over)
                elems.append(
                    f"CASE WHEN {seq} + {j} < {hw} THEN {dup} ELSE {interior} END"
                )
            elif j == hw:
                elems.append(y)
            else:
                dup = _elem_sql(y, j - 2 * hw, over)  # tail block: y[r+j-2hw]
                interior = _elem_sql(y, j - hw, over)
                elems.append(
                    f"CASE WHEN {seq} + {j} >= {hw} + {nexpr} THEN {dup} "
                    f"ELSE {interior} END"
                )
    else:
        raise ValueError("window_align must be 'centered' or 'trailing'")

    C, mult, freqs = domfreq_matrix(w, fs, detrend)
    bins = list(range(0 if include_dc else 1, w // 2 + 1))
    re_im: list[tuple[str, str]] = []
    psd: list[tuple[str, str]] = []
    for m in bins:
        for part, coefs in (("re", C.real[m]), ("im", C.imag[m])):
            terms = " + ".join(
                f"CAST('{float(c)!r}' AS DOUBLE) * {e}" for c, e in zip(coefs, elems)
            )
            re_im.append((f"_{part}{m}", f"({terms})"))
        psd.append(
            (
                f"_psd{m}",
                f"(_re{m} * _re{m} + _im{m} * _im{m})"
                f" * CAST('{float(mult[m])!r}' AS DOUBLE)",
            )
        )
    return bins, freqs, re_im, psd


def domfreq(
    data: DataFrame,
    columns,
    group_columns=None,
    feature_names: list | None = None,
    window_size=21,
    window_align="centered",
    n_domfreq: int = 5,
    fs: float = 1.0,
    detrend="linear",
    order_by=None,
) -> tuple[DataFrame, list]:
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    if feature_names is None:
        feature_names = []
    columns = _as_list(columns)
    window_sizes = _as_list(window_size)
    aligns = _as_list(window_align)
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    if not order:
        raise ValueError("order_by is required (explicit time ordering)")
    for a in aligns:
        if a not in ("centered", "trailing"):
            raise ValueError("window_align must be 'centered' or 'trailing'")

    combos = list(product(columns, window_sizes, aligns))
    new_names: list[str] = []
    for c, w, a in combos:
        new_names += [domfreq_name(c, i + 1, w, a) for i in range(n_domfreq)]
        new_names += [domfreq_logpow_name(c, i + 1, w, a) for i in range(n_domfreq)]
    schema = StructType(
        list(data.schema.fields)
        + [StructField(nm, DoubleType()) for nm in new_names]
    )

    def featurize_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        for c, w, a in combos:
            y = pdf[c].to_numpy(dtype="float64")
            if a == "centered":
                hw = w // 2
                ext = np.concatenate([y[:hw], y, y[len(y) - hw :]])
                start_off = 0
            else:
                ext = np.concatenate([y[:w], y])
                start_off = 1
            fnames = [domfreq_name(c, i + 1, w, a) for i in range(n_domfreq)]
            lnames = [domfreq_logpow_name(c, i + 1, w, a) for i in range(n_domfreq)]
            if len(ext) < w + start_off or n == 0:
                for nm in fnames + lnames:
                    pdf[nm] = np.nan
                continue
            wins = np.lib.stride_tricks.sliding_window_view(ext, w)[start_off:][:n]
            freqs, psd = _periodogram(wins, fs, detrend)
            k = min(n_domfreq, psd.shape[-1])
            # top-k by power, descending (reference argpartition+argsort,
            # featurize.py:545-551)
            part = np.argpartition(-psd, k - 1, axis=-1)[..., :k]
            pows = np.take_along_axis(psd, part, axis=-1)
            order_ix = np.argsort(-pows, axis=-1)
            pows = np.take_along_axis(pows, order_ix, axis=-1)
            inds = np.take_along_axis(part, order_ix, axis=-1)
            dfreqs = freqs[inds]
            bad = np.isnan(wins).any(axis=-1)
            nrows = wins.shape[0]
            for i in range(n_domfreq):
                fcol = np.full(n, np.nan)
                lcol = np.full(n, np.nan)
                if i < k:
                    fcol[:nrows] = np.where(bad, np.nan, dfreqs[:, i])
                    with np.errstate(divide="ignore", invalid="ignore"):
                        lcol[:nrows] = np.where(bad, np.nan, np.log(pows[:, i]))
                pdf[fnames[i]] = fcol
                pdf[lnames[i]] = lcol
        return pdf

    if groups:
        out = data.groupBy(*groups).applyInPandas(featurize_group, schema=schema)
    else:
        out = data.groupBy().applyInPandas(featurize_group, schema=schema)
    feature_names.extend(new_names)
    return out, feature_names


def spectral_entropy_sql_parts(
    y: str,
    partition_sql: str,
    seq: str = "seq",
    window_size: int = 8,
    window_align: str = "trailing",
    detrend="linear",
    out_scale: int = 9,
) -> tuple[list[tuple[str, str]], list[tuple[str, str]], str]:
    """Windowed spectral entropy — the forecastability score that closes
    the complexity triple (permutation_entropy: ordinal structure;
    hurst_exponent: long-range memory; this: how concentrated the
    short-window SPECTRUM is).  H = −Σ p_m ln p_m / ln(B) over the
    positive one-sided periodogram bins p_m = psd_m / Σ psd (B = w//2
    bins after dropping DC): 0 = pure tone (predictable), 1 = white
    noise (nothing to forecast).

    Reuses :func:`domfreq_sql_parts` — the renderer-IS-the-oracle
    design: the identical expression text runs on Spark (selectExpr)
    and DuckDB, so the psd doubles are bit-identical; the final
    entropy is floor-quantized to 1e-``out_scale`` (LN is the one
    last-ulp-risk primitive — the gmean/growth_rates convention).

    Returns (re_im exprs, psd exprs, entropy expr referencing the psd
    columns by name — render in a third SELECT stage).
    """
    bins, _freqs, re_im, psd = domfreq_sql_parts(
        y,
        partition_sql,
        seq=seq,
        window_size=window_size,
        window_align=window_align,
        detrend=detrend,
        include_dc=False,
    )
    # CAST('…' AS DOUBLE) literal form: a bare decimal literal parses as
    # DECIMAL in BOTH Spark SQL and DuckDB (decimal division would then
    # poison the whole tree) — the domfreq coefficient convention.
    om = f"CAST('{float(10 ** out_scale)!r}' AS DOUBLE)"
    total = "(" + " + ".join(f"_psd{m}" for m in bins) + ")"
    plogp = " + ".join(
        f"CASE WHEN _psd{m} > 0 THEN (_psd{m} / {total}) * LN(_psd{m} / {total}) "
        f"ELSE CAST('0.0' AS DOUBLE) END"
        for m in bins
    )
    lnb = f"LN(CAST({len(bins)} AS DOUBLE))"
    raw = f"(-({plogp}) / {lnb})"
    entropy = (
        f"CASE WHEN {total} > 0 THEN "
        f"FLOOR({raw} * {om} + CAST('0.5' AS DOUBLE)) / {om} END"
    )
    return re_im, psd, entropy
