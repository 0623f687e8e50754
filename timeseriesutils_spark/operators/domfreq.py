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
