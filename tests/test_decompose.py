"""Unit tests for operators/decompose.decompose_series and
analytics.ab_test_report."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.analytics import ab_test_report
from timeseriesutils_spark.operators.decompose import decompose_series


def _manual_decompose(y, m=7):
    """Classical additive decomposition, matching the operator's spec."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    half = m // 2
    trend = np.full(n, np.nan)
    for i in range(half, n - half):
        trend[i] = y[i - half : i + half + 1].mean()
    det = y - trend
    phase_mean = {}
    for d in range(m):
        vals = [det[i] for i in range(n) if i % m == d and not math.isnan(det[i])]
        phase_mean[d] = float(np.mean(vals))
    center = sum(phase_mean[d] for d in range(m)) / m
    seasonal = np.array([phase_mean[i % m] - center for i in range(n)])
    return trend, seasonal, y - trend - seasonal


def test_decompose_matches_manual(spark):
    rng = np.random.default_rng(9)
    m = 7
    n = 70
    # integer series with genuine weekly pattern + trend
    y = (
        100
        + np.arange(n) // 2
        + np.array([15 * (t % m == 2) - 10 * (t % m == 5) for t in range(n)])
        + rng.integers(0, 5, n)
    )
    df = spark.createDataFrame(
        [("g", t, int(v)) for t, v in enumerate(y)], "g string, t long, y long"
    )
    out = decompose_series(df, "y", "t", ["g"], period=m).orderBy("t").collect()
    trend, seasonal, rem = _manual_decompose(y, m)
    for i, r in enumerate(out):
        if math.isnan(trend[i]):
            assert r.trend is None and r.remainder is None
        else:
            assert r.trend == pytest.approx(trend[i], rel=1e-12)
            assert r.remainder == pytest.approx(rem[i], rel=1e-9, abs=1e-9)
        assert r.seasonal == pytest.approx(seasonal[i], rel=1e-9)
    # the strong phase effects are recovered
    s_by_phase = {r.t % m: r.seasonal for r in out}
    assert s_by_phase[2] > 10 and s_by_phase[5] < -5


def test_decompose_validates_period(spark):
    df = spark.createDataFrame([("g", 0, 1)], "g string, t long, y long")
    with pytest.raises(ValueError):
        decompose_series(df, "y", "t", ["g"], period=6)


def _arm(uid: int) -> str:
    b = int(hashlib.md5(str(uid).encode()).hexdigest()[:4], 16) % 100
    return "A" if b % 2 == 0 else "B"


def test_ab_test_report_counts(spark):
    # users 1..40: all view; users converting: multiples of 3
    rows = []
    for u in range(1, 41):
        rows.append((u, "view"))
        if u % 3 == 0:
            rows.append((u, "purchase"))
    # one user converts without exposure -> excluded entirely
    rows.append((99, "purchase"))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    df = df.withColumn("ts", F.lit("2024-01-01").cast("timestamp"))
    r = ab_test_report(df).collect()[0]
    arms = {u: _arm(u) for u in range(1, 41)}
    n_a = sum(1 for u in arms if arms[u] == "A")
    conv_a = sum(1 for u in arms if arms[u] == "A" and u % 3 == 0)
    n_b = 40 - n_a
    conv_b = sum(1 for u in arms if arms[u] == "B" and u % 3 == 0)
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (n_a, conv_a, n_b, conv_b)
    assert r.rate_a == pytest.approx(conv_a / n_a)
    assert r.lift == pytest.approx(conv_b / n_b - conv_a / n_a)
    p = (conv_a + conv_b) / 40
    se = math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b))
    assert r.z_stat == pytest.approx((conv_b / n_b - conv_a / n_a) / se, rel=1e-12)


def test_holt_smooth_matches_recursion(spark):
    """Truncated-filter output equals the textbook recursion run over
    exactly the trailing w observations with zero initial state."""
    import random

    from timeseriesutils_spark.operators.forecast import holt_smooth

    rng = random.Random(13)
    vals = [round(rng.uniform(10, 100), 2) for _ in range(40)]
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(vals)], "g string, t long, v double"
    )
    a, b, w = 0.4, 0.2, 12
    out = (
        holt_smooth(df, "v", ["g"], ["t"], alpha=a, beta=b, window_size=w)
        .orderBy("t")
        .collect()
    )
    lvl_col = f"v_holt_level_a0p4_b0p2_w{w}"
    fc_col = f"v_holt_fc_a0p4_b0p2_w{w}"
    for i, r in enumerate(out):
        if i < w - 1:
            assert r[lvl_col] is None
            continue
        l = t_ = 0.0
        for y in vals[i - w + 1 : i + 1]:
            l_new = a * y + (1 - a) * (l + t_)
            t_ = b * (l_new - l) + (1 - b) * t_
            l = l_new
        assert r[lvl_col] == pytest.approx(l, rel=1e-9)
        assert r[fc_col] == pytest.approx(l + t_, rel=1e-9)


def test_seasonal_strength_extremes(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.decompose import (
        decompose_series,
        seasonal_strength,
    )

    # pure period-3 cycle: strength ~ 1; pure noise-free constant+trendless
    rows = []
    cyc = [10, 30, 20]
    for t in range(30):
        rows.append(("cyc", t, float(cyc[t % 3])))
        rows.append(("flat", t, 5.0))
    df = spark.createDataFrame(rows, "g string, t long, y double")
    dec = decompose_series(df, "y", "t", ["g"], period=3)
    out = {r.g: r for r in seasonal_strength(dec, ["g"]).collect()}
    assert out["cyc"].strength > 0.99
    # flat series: Var(seasonal+remainder)=0 -> NULL (no seasonal signal)
    assert out["flat"].strength is None or out["flat"].strength == 0.0


def test_decompose_robust_outlier_immunity(spark):
    """A single wild spike perturbs the mean-based decomposition's
    seasonal profile but leaves the robust version's seasonal component
    untouched away from the spike's own window, and the spike lands in
    the remainder."""
    from timeseriesutils_spark.operators.decompose import decompose_robust

    rows = []
    for t in range(35):
        y = 100 + (t % 7) * 10 + (5000 if t == 17 else 0)
        rows.append(("a", t, y))
    df = spark.createDataFrame(rows, "g string, t long, y long")
    out = {r.t: r for r in decompose_robust(df, "y", "t", ["g"], period=7).collect()}
    # rows with full centered windows: t in 3..31
    assert out[2].trend is None and out[3].trend is not None
    # the spike's remainder carries (almost all of) the spike
    assert out[17].remainder > 4000
    # clean rows far from the spike: remainder ~ 0 (median trend and
    # median phase effects reproduce the sawtooth exactly)
    for t in (5, 10, 25, 30):
        assert abs(out[t].remainder) < 1e-9, (t, out[t].remainder)


def test_decompose_robust_additivity(spark):
    """y == trend + seasonal + remainder wherever defined (exact double
    identity by construction: remainder = (y - trend) - seasonal)."""
    import random

    from timeseriesutils_spark.operators.decompose import decompose_robust

    rng = random.Random(3)
    rows = [("a", t, rng.randint(0, 100)) for t in range(40)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    for r in decompose_robust(df, "y", "t", ["g"], period=7).collect():
        if r.trend is not None:
            assert r.y == (r.trend + r.seasonal + r.remainder) or \
                   abs(r.y - (r.trend + r.seasonal + r.remainder)) < 1e-9
