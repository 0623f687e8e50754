"""domfreq ground truth: the reference crashes as shipped (SURVEY §2.4.5),
so these tests pin OUR documented semantics — scipy-periodogram math on
complete (padded) windows, top-k by power, NULL on windows with NULLs."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.domfreq import _periodogram, domfreq


def test_periodogram_matches_scipy_semantics():
    """Vectorized batch periodogram == the per-window numpy-FFT equivalent
    of scipy.signal.periodogram (same formula the survey verified)."""
    rng = np.random.default_rng(7)
    wins = rng.normal(size=(5, 16))
    freqs, psd = _periodogram(wins, fs=1.0, detrend="linear")
    for i in range(5):
        x = wins[i]
        t = np.arange(16)
        slope, intercept = np.polyfit(t, x, 1)
        d = x - (slope * t + intercept)
        spec = np.fft.rfft(d)
        ref = (spec.real**2 + spec.imag**2) / 16.0
        ref[1:-1] *= 2
        # atol: the DC bin is ~1e-32 residual noise — the closed-form
        # detrend and np.polyfit zero it with different rounding
        np.testing.assert_allclose(psd[i], ref, rtol=1e-10, atol=1e-15)
    np.testing.assert_allclose(freqs, np.fft.rfftfreq(16, 1.0))


def test_domfreq_pure_sine_finds_frequency(spark):
    """Sine of period 8 → dominant frequency 1/8 on every full window."""
    n, period, w = 64, 8, 16
    rows = [("a", t, math.sin(2 * math.pi * t / period)) for t in range(n)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out, names = domfreq(
        df, "y", ["g"], window_size=w, window_align="trailing", n_domfreq=2, order_by=["t"]
    )
    assert names[0] == "y_domfreq1_w16t"
    got = out.orderBy("t").collect()
    # every row has a complete (possibly padded) window → non-NULL
    for r in got:
        assert r["y_domfreq1_w16t"] is not None
    # rows with a genuine (unpadded) trailing window: exact bin 2/16
    for r in got[w:]:
        assert r["y_domfreq1_w16t"] == pytest.approx(1.0 / period)
        assert r["y_domfreq1_logpow_w16t"] is not None


def test_domfreq_null_window_propagates(spark):
    rows = [("a", t, None if t == 20 else float(t % 5)) for t in range(40)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out, _ = domfreq(
        df, "y", ["g"], window_size=8, window_align="trailing", n_domfreq=1, order_by=["t"]
    )
    got = {r["t"]: r["y_domfreq1_w8t"] for r in out.collect()}
    # any trailing window containing t=20 → NULL feature
    for t in range(20, 28):
        assert got[t] is None
    assert got[35] is not None


def test_domfreq_centered_pads_all_rows(spark):
    rows = [("a", t, float(t % 7)) for t in range(30)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out, names = domfreq(
        df, "y", ["g"], window_size=9, window_align="centered", n_domfreq=1, order_by=["t"]
    )
    assert names[0] == "y_domfreq1_w9c"
    vals = [r["y_domfreq1_w9c"] for r in out.orderBy("t").collect()]
    assert len(vals) == 30 and all(v is not None for v in vals)
