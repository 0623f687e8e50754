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


def _expr_domfreq(df, w, align, k):
    """Run the hash-checkable expression path (queries.featurize_queries
    q_domfreq structure) on a (g, t, y) frame; {(g, seq, rank): (freq, pow)}."""
    from pyspark.sql import Window

    from timeseriesutils_spark.operators.domfreq import domfreq_sql_parts

    bins, freqs, re_im, psd = domfreq_sql_parts(
        "y", "g", window_size=w, window_align=align
    )
    b0 = df.selectExpr(
        "g",
        "CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY t) - 1 AS BIGINT) AS seq",
        "y",
    )
    b = b0.selectExpr("g", "seq", *[f"{e} AS {n}" for n, e in re_im])
    p = b.selectExpr("g", "seq", *[f"{e} AS {n}" for n, e in psd])
    e = p.select(
        "g",
        "seq",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("bin"),
                        F.lit(float(freqs[m])).alias("freq0"),
                        F.col(f"_psd{m}").alias("pow"),
                    )
                    for m in bins
                ]
            )
        ).alias("u"),
    ).select("g", "seq", "u.bin", "u.freq0", "u.pow")
    wnd = Window.partitionBy("g", "seq").orderBy(
        F.col("pow").desc_nulls_last(), F.col("bin")
    )
    out = (
        e.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .collect()
    )
    return {(r["g"], r["seq"], r["rank"]): (r["freq0"], r["pow"]) for r in out}


def _np_domfreq(y, w, align, k):
    """Independent numpy recomputation of the expression path's spec:
    same edge-duplicated windows, same C = F·(I−P) linear map, same
    (−psd, bin) top-k rule over the positive bins."""
    from timeseriesutils_spark.operators.domfreq import domfreq_matrix

    C, mult, freqs = domfreq_matrix(w)
    if align == "trailing":
        ext = np.concatenate([y[:w], y])
        off = 1
    else:
        hw = w // 2
        ext = np.concatenate([y[:hw], y, y[len(y) - hw :]])
        off = 0
    wins = np.lib.stride_tricks.sliding_window_view(ext, w)[off:][: len(y)]
    spec = wins @ C.T
    psd = (spec.real**2 + spec.imag**2) * mult
    out = {}
    for r in range(len(y)):
        order = sorted(range(1, w // 2 + 1), key=lambda m: (-psd[r, m], m))
        for i, m in enumerate(order[:k]):
            out[(r, i + 1)] = (float(freqs[m]), float(psd[r, m]))
    return out


@pytest.mark.parametrize("align", ["trailing", "centered"])
def test_domfreq_expr_matches_numpy(spark, align):
    """The SQL-rendered linear-combo path (the oracle-checkable declared
    query) must reproduce an independent numpy computation of the same
    spec on every row — including the edge rows, whose duplicated-block
    windows are per-element CASEs in the renderer."""
    w, k, n = 9 if align == "centered" else 8, 3, 40
    # well-separated spectrum so top-k selection is float-noise-proof
    y = np.array(
        [
            3.0 * math.sin(2 * math.pi * t / 8)
            + 2.0 * math.sin(2 * math.pi * t / 4)
            + 1.0 * math.cos(math.pi * t)
            + 0.01 * t
            for t in range(n)
        ]
    )
    rows = [("a", t, float(y[t])) for t in range(n)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    got = _expr_domfreq(df, w, align, k)
    want = _np_domfreq(y, w, align, k)
    assert len(got) == n * k
    for (g, seq, rank), (freq, pow_) in got.items():
        wf, wp = want[(seq, rank)]
        assert freq == wf, (seq, rank)
        assert pow_ == pytest.approx(wp, rel=1e-9, abs=1e-18), (seq, rank)


def test_domfreq_expr_null_window(spark):
    """NULL inside a window → NULL pow AND freq at every rank for the
    affected rows, with ranks still emitted deterministically (bin order)."""
    rows = [("a", t, None if t == 10 else float(t % 7)) for t in range(24)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    got = _expr_domfreq(df, 8, "trailing", 3)
    # trailing w=8: rows 10..17 contain t=10
    for t in range(10, 18):
        for rank in (1, 2, 3):
            freq, pow_ = got[("a", t, rank)]
            assert pow_ is None, (t, rank)
    freq, pow_ = got[("a", 20, 1)]
    assert pow_ is not None
