"""Unit tests for grouped closed-form OLS (operators/regression.py):
numpy lstsq parity, degenerate groups, partition invariance."""

import numpy as np
import pytest

from timeseriesutils_spark.operators.regression import grouped_ols2


def _fit_numpy(rows):
    X = np.array([[1.0, r[1], r[2]] for r in rows])
    y = np.array([r[3] for r in rows])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    ssr = ((pred - y.mean()) ** 2).sum()
    sst = ((y - y.mean()) ** 2).sum()
    return beta, ssr / sst


def test_ols2_matches_numpy(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g in ("a", "b"):
        for _ in range(200):
            x1 = round(float(rng.uniform(1, 50)), 2)
            x2 = round(float(rng.uniform(0, 0.1)), 2)
            noise = round(float(rng.normal(0, 5)), 2)
            y = round(3.0 + 2.5 * x1 - 40.0 * x2 + noise, 2)
            rows.append((g, x1, x2, y))
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    out = {r.g: r for r in grouped_ols2(df, "y", "x1", "x2", ["g"]).collect()}
    for g in ("a", "b"):
        beta, r2 = _fit_numpy([r for r in rows if r[0] == g])
        assert out[g].b0 == pytest.approx(beta[0], rel=1e-6, abs=1e-6)
        assert out[g].b1 == pytest.approx(beta[1], rel=1e-6)
        assert out[g].b2 == pytest.approx(beta[2], rel=1e-4)
        assert out[g].r2 == pytest.approx(r2, rel=1e-6)
        assert out[g].n == 200


def test_ols2_collinear_is_null(spark):
    # x2 = 2*x1 exactly -> singular normal equations -> NULLs, not inf
    rows = [("g", float(i), float(2 * i), float(3 * i + 1)) for i in range(1, 20)]
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    r = grouped_ols2(df, "y", "x1", "x2", ["g"]).collect()[0]
    assert r.b0 is None and r.b1 is None and r.b2 is None and r.r2 is None


def test_ols2_partition_invariant(spark):
    rows = [
        ("g", float(i % 13), float((i * 7) % 5), float(i % 11) + 0.5)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, x1 double, x2 double, y double")
    a = grouped_ols2(df.coalesce(1), "y", "x1", "x2", ["g"]).collect()[0]
    b = grouped_ols2(df.repartition(32), "y", "x1", "x2", ["g"]).collect()[0]
    assert (a.b0, a.b1, a.b2, a.r2) == (b.b0, b.b1, b.b2, b.r2)  # bit-equal


def test_mahalanobis_catches_correlation_breaker(spark):
    # x2 ~ 10*x1 tightly; one point is per-axis plausible but off-ridge
    from timeseriesutils_spark.operators.regression import mahalanobis_outliers

    rows = [("g", i, float(i % 50 + 1), float((i % 50 + 1) * 10 + (i % 3))) for i in range(300)]
    rows.append(("g", 999, 50.0, 10.0))  # high x1, low x2: off the ridge
    df = spark.createDataFrame(rows, "g string, id long, x1 double, x2 double")
    out = mahalanobis_outliers(df, "x1", "x2", ["g"], ["id"], threshold=13.8)
    ids = [r.id for r in out.collect()]
    assert 999 in ids
    assert len(ids) <= 3  # the ridge points themselves stay in


def test_mahalanobis_singular_group_empty(spark):
    from timeseriesutils_spark.operators.regression import mahalanobis_outliers

    # x2 = 2*x1 exactly -> singular covariance -> no rows, no crash
    rows = [("g", i, float(i), float(2 * i)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, id long, x1 double, x2 double")
    assert mahalanobis_outliers(df, "x1", "x2", ["g"], ["id"]).count() == 0


def test_theilsen_recovers_line_through_outliers(spark):
    from timeseriesutils_spark.operators.regression import theilsen_slope

    # y = 3 + 2t with two wild outliers; OLS would bend, Theil-Sen not
    rows = []
    for t in range(21):
        y = 3.0 + 2.0 * t
        if t in (5, 12):
            y += 500.0
        rows.append(("a", t, y))
    df = spark.createDataFrame(rows, "g string, t long, y double")
    out = theilsen_slope(df, "y", "t", ["g"], scale=2).collect()[0]
    assert out.n_obs == 21
    assert out.n_pairs == 21 * 20 // 2
    assert out.slope == 2.0
    assert out.intercept == 3.0


def test_theilsen_null_rows_dropped(spark):
    from timeseriesutils_spark.operators.regression import theilsen_slope

    rows = [("a", 0, 1.0), ("a", 1, None), ("a", 2, 5.0), ("a", 3, 7.0)]
    df = spark.createDataFrame(rows, "g string, t long, y double")
    out = theilsen_slope(df, "y", "t", ["g"], scale=2).collect()[0]
    assert out.n_obs == 3
    assert out.n_pairs == 3
