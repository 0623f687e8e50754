"""Tests for the round-6 operator additions: complexity features
(permutation entropy, Hurst), technical indicators, MASE, Granger,
Gopher rules, and per-key caps — numpy mirrors for the numeric ops,
constructed corner cases for the rule/cap ops."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.complexity import (
    hurst_exponent,
    permutation_entropy,
)
from timeseriesutils_spark.operators.technical import tech_indicators


def _series_df(spark, ys, group="g"):
    return spark.createDataFrame(
        [(group, t, float(y)) for t, y in enumerate(ys)], "g string, t long, y double"
    )


def _pe_numpy(ys):
    """Reference permutation entropy, order 3, position tie-break."""
    pats = {}
    for i in range(2, len(ys)):
        tri = (ys[i - 2], ys[i - 1], ys[i])
        ranks = []
        for a, x in enumerate(tri):
            r = sum(1 for b, v in enumerate(tri) if v < x or (v == x and b < a))
            ranks.append(r)
        code = ranks[0] * 9 + ranks[1] * 3 + ranks[2]
        pats[code] = pats.get(code, 0) + 1
    n = sum(pats.values())
    ent = 0.0
    for c in sorted(pats):
        p = pats[c] / n
        ent += math.floor(-(p * math.log(p)) * 1e9 + 0.5)
    return ent / 1e9 / math.log(6.0)


class TestPermutationEntropy:
    def test_monotone_is_zero(self, spark):
        out = permutation_entropy(
            _series_df(spark, range(50)), "y", ["g"], ["t"]
        ).collect()
        assert len(out) == 1
        assert out[0].n_triples == 48
        assert out[0].pe_norm == 0.0

    def test_matches_numpy_mirror(self, spark):
        rng = np.random.RandomState(7)
        ys = rng.randn(200).tolist()
        out = permutation_entropy(_series_df(spark, ys), "y", ["g"], ["t"]).collect()
        assert out[0].pe_norm == pytest.approx(_pe_numpy(ys), abs=1e-12)
        # noisy series: near-uniform patterns
        assert out[0].pe_norm > 0.9

    def test_ties_use_position_order(self, spark):
        # constant series: every triple is the "012" pattern -> entropy 0
        out = permutation_entropy(
            _series_df(spark, [5.0] * 20), "y", ["g"], ["t"]
        ).collect()
        assert out[0].pe_norm == 0.0

    def test_short_group_emits_nothing(self, spark):
        out = permutation_entropy(_series_df(spark, [1.0, 2.0]), "y", ["g"], ["t"])
        assert out.count() == 0


def _hurst_numpy(ys, n_levels=5, scale=2):
    """Mirror of the aggregated-variance ladder incl. quantization."""
    q = [math.floor(y * 10**scale + 0.5) for y in ys]
    lnvars = []
    for k in range(n_levels):
        size = 2**k
        nb = len(q) // size
        if nb < 2:
            return None
        sums = [sum(q[i * size : (i + 1) * size]) for i in range(nb)]
        B = float(nb)
        S = float(sum(sums))
        Q = float(sum(s * s for s in sums))
        unit = float(size) * 10**scale
        v = (B * Q - S * S) / (B * B * unit * unit)
        if v <= 0:
            return None
        lnvars.append(math.floor(math.log(v) * 1e9 + 0.5) / 1e9)
    kbar = (n_levels - 1) / 2.0
    denom = sum((k - kbar) ** 2 for k in range(n_levels)) * math.log(2.0)
    slope = sum((k - kbar) / denom * lv for k, lv in enumerate(lnvars))
    return 1.0 + slope / 2.0


class TestHurst:
    def test_matches_numpy_mirror(self, spark):
        rng = np.random.RandomState(11)
        ys = (rng.randn(300).cumsum() + 100.0).tolist()
        out = hurst_exponent(_series_df(spark, ys), "y", ["g"], ["t"]).collect()
        assert len(out) == 1
        assert out[0].hurst == pytest.approx(_hurst_numpy(ys), abs=1e-9)

    def test_random_walk_above_noise(self, spark):
        """A random walk must measure as more persistent than its own
        increments (H_walk > H_noise) — the ordering the exponent
        exists to detect."""
        rng = np.random.RandomState(3)
        steps = rng.randn(512)
        walk = (steps.cumsum() + 50.0).tolist()
        noise = (steps + 50.0).tolist()
        rows = [("walk", t, float(y)) for t, y in enumerate(walk)]
        rows += [("noise", t, float(y)) for t, y in enumerate(noise)]
        df = spark.createDataFrame(rows, "g string, t long, y double")
        out = {r.g: r.hurst for r in hurst_exponent(df, "y", ["g"], ["t"]).collect()}
        assert out["walk"] > out["noise"]
        assert out["walk"] > 0.75  # persistent
        assert out["noise"] < 0.75

    def test_short_series_null_not_dropped(self, spark):
        # 10 rows -> zero complete 16-blocks -> row kept, hurst NULL
        out = hurst_exponent(
            _series_df(spark, range(10)), "y", ["g"], ["t"]
        ).collect()
        assert len(out) == 1
        assert out[0].n == 10 and out[0].hurst is None


class TestTechIndicators:
    def test_rsi_extremes_and_bounds(self, spark):
        up = tech_indicators(
            _series_df(spark, [float(i) for i in range(40)]), "y", ["g"], ["t"]
        ).collect()
        vals = [r.rsi for r in up if r.rsi is not None]
        assert vals and all(v == 100.0 for v in vals)
        rng = np.random.RandomState(5)
        mixed = tech_indicators(
            _series_df(spark, (rng.randn(80) * 3 + 50).tolist()),
            "y", ["g"], ["t"],
        ).collect()
        vals = [r.rsi for r in mixed if r.rsi is not None]
        assert vals and all(0.0 <= v <= 100.0 for v in vals)

    def test_null_until_complete_window(self, spark):
        out = tech_indicators(
            _series_df(spark, [float(i % 7) for i in range(30)]),
            "y", ["g"], ["t"],
        ).orderBy("t").collect()
        # rsi needs 14 diffs -> first 14 rows NULL; boll needs 20 rows
        assert all(r.rsi is None for r in out[:14])
        assert all(r.rsi is not None for r in out[14:])
        assert all(r.boll_mid is None for r in out[:19])
        assert all(r.boll_mid is not None for r in out[19:])
        # macd needs 26 lags, signal 9 more
        assert all(r.macd is None for r in out[:25])
        assert all(r.macd is not None for r in out[25:])
        assert all(r.macd_sig is None for r in out[:33])
        assert all(r.macd_sig is not None for r in out[33:])

    def test_bollinger_matches_numpy(self, spark):
        rng = np.random.RandomState(9)
        ys = (rng.randn(60) * 2 + 30).tolist()
        out = (
            tech_indicators(_series_df(spark, ys), "y", ["g"], ["t"])
            .orderBy("t")
            .collect()
        )
        q = np.array([math.floor(y * 100 + 0.5) for y in ys], dtype=float)
        for i in range(19, 60):
            win = q[i - 19 : i + 1]
            mid = win.sum() / 20.0 / 100.0
            sd = math.sqrt(
                max((20.0 * (win * win).sum() - win.sum() ** 2) / 400.0, 0.0)
            ) / 100.0
            assert out[i].boll_mid == pytest.approx(mid, abs=1e-12)
            assert out[i].boll_up == pytest.approx(mid + 2 * sd, abs=1e-12)


class TestMase:
    def test_hand_case(self, spark):
        from timeseriesutils_spark.operators.forecast import mase_eval

        ys = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
        out = mase_eval(
            _series_df(spark, ys), "y", ["g"], ["t"], window=2, scale=0
        ).collect()[0]
        # model err (window=2): |2y_t - (y_{t-2}+y_{t-1})| = 3 each, t=2..5
        # naive err: |y_t - y_{t-1}| = 1 each, t=1..5
        assert out.n_model == 4 and out.n_naive == 5
        assert out.mae_model == pytest.approx(1.5)
        assert out.mae_naive == pytest.approx(1.0)
        assert out.mase == pytest.approx(1.5)

    def test_window_one_equals_naive(self, spark):
        from timeseriesutils_spark.operators.forecast import mase_eval

        rng = np.random.RandomState(2)
        ys = (rng.randn(50) * 5 + 20).tolist()
        out = mase_eval(
            _series_df(spark, ys), "y", ["g"], ["t"], window=1, scale=2
        ).collect()[0]
        assert out.mase == pytest.approx(1.0)


class TestGranger:
    def test_detects_lagged_driver(self, spark):
        from timeseriesutils_spark.operators.regression import granger_lag_test

        rng = np.random.RandomState(4)
        n = 400
        x = rng.randn(n) * 2 + 10
        y = np.zeros(n)
        for t in range(1, n):
            y[t] = 0.2 * y[t - 1] + 2.0 * x[t - 1] + rng.randn() * 0.1
        rows = [("caused", t, float(y[t]), float(x[t])) for t in range(n)]
        # control: y' is an AR(1) ignoring x
        y2 = np.zeros(n)
        for t in range(1, n):
            y2[t] = 0.5 * y2[t - 1] + rng.randn() * 0.1
        rows += [("indep", t, float(y2[t]), float(x[t])) for t in range(n)]
        df = spark.createDataFrame(rows, "g string, t long, y double, x double")
        out = {
            r.g: r
            for r in granger_lag_test(df, "y", "x", ["g"], ["t"], scale=4).collect()
        }
        assert out["caused"].f_stat > 1000.0
        assert out["indep"].f_stat < 10.0
        assert out["caused"].r2_u > out["caused"].r2_r

    def test_matches_numpy_ftest(self, spark):
        from timeseriesutils_spark.operators.regression import granger_lag_test

        rng = np.random.RandomState(8)
        n = 120
        scale = 4
        x = rng.randn(n) + 5
        y = rng.randn(n).cumsum() + 30
        df = spark.createDataFrame(
            [("g", t, float(y[t]), float(x[t])) for t in range(n)],
            "g string, t long, y double, x double",
        )
        got = granger_lag_test(df, "y", "x", ["g"], ["t"], scale=scale).collect()[0]
        # numpy mirror on the quantized data
        qy = np.floor(y * 10**scale + 0.5)
        qx = np.floor(x * 10**scale + 0.5)
        yy, ly, lx = qy[1:], qy[:-1], qx[:-1]
        X_u = np.column_stack([np.ones_like(ly), ly, lx])
        X_r = np.column_stack([np.ones_like(ly), ly])
        bu, *_ = np.linalg.lstsq(X_u, yy, rcond=None)
        br, *_ = np.linalg.lstsq(X_r, yy, rcond=None)
        rss_u = ((yy - X_u @ bu) ** 2).sum()
        rss_r = ((yy - X_r @ br) ** 2).sum()
        f_ref = (rss_r - rss_u) / (rss_u / (len(yy) - 3))
        assert got.f_stat == pytest.approx(f_ref, rel=1e-6)
        assert got.b_lagy == pytest.approx(bu[1], rel=1e-6)
        assert got.b_lagx == pytest.approx(bu[2], rel=1e-6)


class TestGopherRules:
    def _flags(self, spark, text):
        from timeseriesutils_spark.operators.text import gopher_rules

        df = spark.createDataFrame([("d1", text)], "doc_id string, text string")
        return gopher_rules(df).collect()[0]

    def test_good_doc_passes(self, spark):
        text = " ".join(
            "the quick brown fox jumps over that lazy dog with verve and"
            .split() * 10
        )
        r = self._flags(spark, text)
        assert r.gopher_pass
        assert r.r_words and r.r_mwl and r.r_alpha and r.r_stop

    def test_short_doc_fails_word_count_only_that_rule(self, spark):
        r = self._flags(spark, "the cat sat with that hat and all of it")
        assert not r.r_words and not r.gopher_pass
        assert r.r_alpha and r.r_stop

    def test_bullet_doc_fails_bullet_rule(self, spark):
        lines = "\n".join(f"- item {i} of the list that we have" for i in range(30))
        r = self._flags(spark, lines)
        assert not r.r_bullet and not r.gopher_pass

    def test_symbol_heavy_fails(self, spark):
        base = "the code with that have and of to be " * 10
        r = self._flags(spark, base + "#" * 60)
        assert not r.r_symbol

    def test_no_stopwords_fails_stop(self, spark):
        r = self._flags(spark, " ".join(["lorem", "ipsum", "dolor"] * 40))
        assert not r.r_stop and not r.gopher_pass


class TestCapPerKey:
    def test_counts_and_determinism(self, spark):
        from timeseriesutils_spark.operators.splits import cap_per_key

        rows = [(f"id{i}", f"s{i % 3}") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id string, source string")
        got = (
            cap_per_key(df, "source", "doc_id", cap=10)
            .groupBy("source")
            .agg(F.sum(F.col("kept").cast("int")).alias("k"))
            .collect()
        )
        assert {r.source: r.k for r in got} == {"s0": 10, "s1": 10, "s2": 10}
        # under-cap key keeps everything
        got2 = cap_per_key(df.limit(5), "source", "doc_id", cap=10)
        assert got2.filter("kept").count() == 5
        # deterministic member set across repartitionings
        a = sorted(
            r.doc_id
            for r in cap_per_key(df, "source", "doc_id", cap=10)
            .filter("kept").collect()
        )
        b = sorted(
            r.doc_id
            for r in cap_per_key(df.repartition(7), "source", "doc_id", cap=10)
            .filter("kept").collect()
        )
        assert a == b


class TestAdf:
    def test_stationary_vs_random_walk(self, spark):
        from timeseriesutils_spark.operators.regression import adf_test

        rng = np.random.RandomState(13)
        n = 500
        ar = np.zeros(n)
        for t in range(1, n):
            ar[t] = 0.5 * ar[t - 1] + rng.randn()
        walk = rng.randn(n).cumsum()
        rows = [("ar", t, float(ar[t] + 100)) for t in range(n)]
        rows += [("walk", t, float(walk[t] + 100)) for t in range(n)]
        df = spark.createDataFrame(rows, "g string, t long, y double")
        out = {r.g: r for r in adf_test(df, "y", ["g"], ["t"], scale=4).collect()}
        assert out["ar"].t_rho < -5.0 and out["ar"].stationary_5pct
        assert out["walk"].t_rho > -2.86 and not out["walk"].stationary_5pct

    def test_matches_numpy_tstat(self, spark):
        from timeseriesutils_spark.operators.regression import adf_test

        rng = np.random.RandomState(17)
        n, scale = 200, 4
        y = rng.randn(n).cumsum() + 40
        df = spark.createDataFrame(
            [("g", t, float(y[t])) for t in range(n)], "g string, t long, y double"
        )
        got = adf_test(df, "y", ["g"], ["t"], scale=scale).collect()[0]
        q = np.floor(y * 10**scale + 0.5)
        dy = q[2:] - q[1:-1]
        x1 = q[1:-1]
        x2 = q[1:-1] - q[:-2]
        X = np.column_stack([np.ones_like(x1), x1, x2])
        b, *_ = np.linalg.lstsq(X, dy, rcond=None)
        resid = dy - X @ b
        s2 = (resid @ resid) / (len(dy) - 3)
        cov = s2 * np.linalg.inv(X.T @ X)
        t_ref = b[1] / math.sqrt(cov[1, 1])
        assert got.t_rho == pytest.approx(t_ref, rel=1e-6)
        assert got.rho == pytest.approx(b[1], rel=1e-6)


class TestMannKendall:
    def test_monotone_and_constant(self, spark):
        from timeseriesutils_spark.operators.regression import mann_kendall

        rows = [("up", t, float(t)) for t in range(30)]
        rows += [("flat", t, 5.0) for t in range(30)]
        df = spark.createDataFrame(rows, "g string, t long, y double")
        out = {r.g: r for r in mann_kendall(df, "y", ["g"], "t", scale=0).collect()}
        assert out["up"].s_stat == 30 * 29 // 2
        assert out["up"].z > 5.0
        # all-tied group: S = 0, tie term kills the variance, z = 0
        assert out["flat"].s_stat == 0
        assert out["flat"].var_s == 0.0 and out["flat"].z == 0.0

    def test_matches_numpy_mirror(self, spark):
        from timeseriesutils_spark.operators.regression import mann_kendall

        rng = np.random.RandomState(21)
        ys = rng.randint(0, 15, size=80).astype(float)  # ties guaranteed
        df = spark.createDataFrame(
            [("g", t, float(y)) for t, y in enumerate(ys)],
            "g string, t long, y double",
        )
        got = mann_kendall(df, "y", ["g"], "t", scale=0).collect()[0]
        s = sum(
            np.sign(ys[j] - ys[i])
            for i in range(len(ys))
            for j in range(i + 1, len(ys))
        )
        n = len(ys)
        _, counts = np.unique(ys, return_counts=True)
        tie = sum(int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in counts)
        var_s = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        z = (s - np.sign(s)) / math.sqrt(var_s) if s != 0 else 0.0
        assert got.s_stat == int(s)
        assert got.var_s == pytest.approx(var_s)
        assert got.z == pytest.approx(z, abs=1e-12)
