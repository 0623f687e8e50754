"""Unit tests for operators/acf.py (ACF features, lead-lag scan) and
series_math.rolling_moments: numpy ground-truth parity and row-order
invariance."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.acf import acf_features, lead_lag_corr
from timeseriesutils_spark.operators.series_math import rolling_moments


def _np_acf(x, k):
    """Standard estimator: shared mean/variance normalization."""
    x = np.asarray(x, dtype=float)
    xb = x.mean()
    num = ((x[k:] - xb) * (x[:-k] - xb)).sum()
    den = ((x - xb) ** 2).sum()
    return num / den


@pytest.fixture(scope="module")
def series(spark):
    rng = random.Random(7)
    rows = []
    for g in ("a", "b"):
        # AR(1)-ish integer series so the ACF is decidedly nonzero
        v = 50.0
        for t in range(60):
            v = 0.7 * v + rng.uniform(0, 30)
            rows.append((g, t, float(round(v))))
    return spark.createDataFrame(rows, "g string, t long, v double")


def test_acf_matches_numpy(series, spark):
    out = acf_features(series, "v", ["g"], ["t"], max_lag=3, scale=0)
    got = {(r.g, r.lag_k): r for r in out.collect()}
    pdf = series.toPandas()
    for g in ("a", "b"):
        x = pdf[pdf.g == g].sort_values("t").v.to_numpy()
        n = len(x)
        expect_q = 0.0
        for k in (1, 2, 3):
            r = got[(g, k)]
            assert r.n_pairs == n - k
            assert r.acf == pytest.approx(_np_acf(x, k), abs=1e-12)
            expect_q += _np_acf(x, k) ** 2 / (n - k)
            assert r.ljung_box_q == pytest.approx(
                n * (n + 2) * expect_q, rel=1e-12
            )


def test_acf_row_order_invariance(series):
    shuffled = series.orderBy(F.rand(31))
    a = {(r.g, r.lag_k): r.acf for r in acf_features(series, "v", ["g"], ["t"], max_lag=4).collect()}
    b = {(r.g, r.lag_k): r.acf for r in acf_features(shuffled, "v", ["g"], ["t"], max_lag=4).collect()}
    assert a == b


def test_lead_lag_recovers_known_shift(spark):
    # y is x shifted forward by 2 steps (x leads y by 2) plus tiny noise
    rng = random.Random(3)
    x = [float(rng.randint(0, 1000)) for _ in range(80)]
    rows = []
    for t in range(80):
        y = x[t - 2] if t >= 2 else 0.0
        rows.append(("g", t, x[t], y + 0.01 * rng.random()))
    df = spark.createDataFrame(rows, "g string, t long, x double, y double")
    out = lead_lag_corr(df, "x", "y", ["g"], ["t"], max_shift=4, scale_x=0, scale_y=2)
    rowmap = {r.shift: r for r in out.collect()}
    assert len(rowmap) == 9
    best = [s for s, r in rowmap.items() if r.is_best]
    assert best == [2]
    assert rowmap[2].xcorr > 0.999
    # pair counts shrink with |shift|
    assert rowmap[4].n_pairs == 76 and rowmap[0].n_pairs == 80


def test_lead_lag_corr_matches_numpy(spark):
    rng = random.Random(11)
    rows = [
        ("g", t, float(rng.randint(0, 500)), float(rng.randint(0, 50)))
        for t in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, t long, x double, y double")
    out = lead_lag_corr(df, "x", "y", ["g"], ["t"], max_shift=2, scale_x=0, scale_y=0)
    rowmap = {r.shift: r.xcorr for r in out.collect()}
    xs = np.array([r[2] for r in rows])
    ys = np.array([r[3] for r in rows])
    for s in (-2, -1, 0, 1, 2):
        if s >= 0:
            a, b = xs[: len(xs) - s or None], ys[s:]
        else:
            a, b = xs[-s:], ys[:s]
        expect = np.corrcoef(a, b)[0, 1]
        assert rowmap[s] == pytest.approx(expect, abs=1e-9)


def test_rolling_moments_numpy_parity(spark):
    rng = random.Random(5)
    vals = [round(rng.uniform(1, 50), 2) for _ in range(40)]
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(vals)], "g string, t long, v double"
    )
    out = (
        rolling_moments(df, "v", ["g"], window_size=10, order_by=["t"], scale=2)
        .orderBy("t")
        .collect()
    )
    q = np.floor(np.array(vals) * 100.0 + 0.5)
    for i, r in enumerate(out):
        if i < 9:
            assert r.v_skew_w10 is None and r.v_kurt_w10 is None
            continue
        w = q[i - 9 : i + 1]
        m2 = ((w - w.mean()) ** 2).mean()
        m3 = ((w - w.mean()) ** 3).mean()
        m4 = ((w - w.mean()) ** 4).mean()
        assert r.v_skew_w10 == pytest.approx(m3 / m2**1.5, rel=1e-9)
        assert r.v_kurt_w10 == pytest.approx(m4 / m2**2 - 3.0, rel=1e-9)


def test_acf_single_exchange_plan(spark):
    """The lag window and the groupBy share the group-key partitioning:
    the whole ACF op must run on ONE hash exchange."""
    import re

    df = spark.createDataFrame(
        [("g", t, float(t % 7)) for t in range(30)], "g string, t long, v double"
    )
    plan = (
        acf_features(df.repartition("g"), "v", ["g"], ["t"], max_lag=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_new_rowscale_ops_single_exchange(spark):
    """The row-scale round-4 ops must stay single-exchange: one hash
    partitioning on the group key, no Python eval, no extra sort-merge."""
    import re

    from timeseriesutils_spark.operators.forecast import holt_smooth, seasonal_zscore

    df = spark.createDataFrame(
        [("g", f"2024-01-{d:02d}", float(d)) for d in range(1, 29)],
        "g string, d string, v double",
    )
    plans = {
        "seasonal_zscore": seasonal_zscore(df, "v", "d", ["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString(),
        "holt_smooth": holt_smooth(df, "v", ["g"], ["d"], window_size=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString(),
    }
    for name, plan in plans.items():
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, name
        assert "EvalPython" not in plan, name


def test_lead_lag_no_winner_when_all_null(spark):
    """A group below min_pairs has NO best shift (code-review
    regression: rank 1 was flagged even with NULL xcorr)."""
    df = spark.createDataFrame(
        [("g", t, float(t), float(t * 2)) for t in range(3)],
        "g string, t long, x double, y double",
    )
    out = lead_lag_corr(df, "x", "y", ["g"], ["t"], max_shift=2, min_pairs=8).collect()
    assert all(r.xcorr is None for r in out)
    assert not any(r.is_best for r in out)
