"""Tests for the round-7 inference batch: weighted interval score,
Mann–Whitney U, log-rank, Aalen–Johansen cumulative incidence, and
Diebold–Mariano — known hand-worked values plus the structural
invariants that pin each estimator's semantics."""

import math

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.epi import wis_scores
from timeseriesutils_spark.operators.forecast import diebold_mariano
from timeseriesutils_spark.operators.nonparam import mann_whitney
from timeseriesutils_spark.operators.survival import (
    cumulative_incidence,
    kaplan_meier,
    logrank_test,
)


# --- WIS ------------------------------------------------------------------


def _wis_df(spark, rows):
    return spark.createDataFrame(
        rows, "g string, y double, f10 double, f50 double, f90 double"
    )


def test_wis_known_values(spark):
    # y=10, median 8, interval [5, 12] (alpha=0.2):
    #   dispersion = 0.1*(12-5) = 0.7 ; under = 0.5*(10-8) = 1.0 ; over = 0
    #   wis = (0.7 + 1.0 + 0)/1.5
    df = _wis_df(spark, [("a", 10.0, 5.0, 8.0, 12.0)])
    out = wis_scores(df, "y", "f50", {0.2: ("f10", "f90")}, ["g"]).first()
    assert out.dispersion == pytest.approx(0.7 / 1.5)
    assert out.underprediction == pytest.approx(1.0 / 1.5)
    assert out.overprediction == 0.0
    assert out.wis == pytest.approx(1.7 / 1.5)


def test_wis_outside_interval_penalty(spark):
    # y=20 above u=12: under += (20-12)=8 plus median part 0.5*(20-8)=6
    df = _wis_df(spark, [("a", 20.0, 5.0, 8.0, 12.0)])
    out = wis_scores(df, "y", "f50", {0.2: ("f10", "f90")}, ["g"]).first()
    assert out.underprediction == pytest.approx((8.0 + 6.0) / 1.5)
    assert out.overprediction == 0.0


def test_wis_decomposition_identity(spark):
    rows = [
        ("a", float(y), float(y - 3), float(y + d), float(y + 5))
        for y, d in zip(range(1, 30), [-4, 0, 3, 9, -1] * 6)
    ]
    df = _wis_df(spark, rows)
    out = wis_scores(df, "y", "f50", {0.2: ("f10", "f90")}, ["g"]).first()
    assert out.wis == pytest.approx(
        out.dispersion + out.overprediction + out.underprediction, abs=1e-12
    )


def test_wis_pinball_equivalence(spark):
    # WIS with K intervals + median == (2/(K+1/2)) * mean of (K*2+1)
    # pinball losses * (K+1/2)... use the direct known relation: for one
    # interval {0.2: (q10,q90)} + median, WIS = (|y-m|/2 + 0.1*(u-l)
    # + (l-y)^+ + (y-u)^+)/1.5 ; pinball: L_.1+L_.9 = 0.1(u-l)+(l-y)^+
    # +(y-u)^+ ... check numerically vs independent pinball sums.
    from timeseriesutils_spark.operators.epi import pinball_scores

    rows = [
        ("a", float(y), float(y - 3 + (y % 5)), float(y + (y % 3) - 1),
         float(y + 4 - (y % 4)))
        for y in range(1, 40)
    ]
    rows = [
        (g, y, min(l, m, u), sorted((l, m, u))[1], max(l, m, u))
        for (g, y, l, m, u) in rows
    ]
    df = _wis_df(spark, rows)
    w = wis_scores(df, "y", "f50", {0.2: ("f10", "f90")}, ["g"]).first()
    p = pinball_scores(
        df, "y", {0.1: "f10", 0.5: "f50", 0.9: "f90"}, ["g"]
    ).first()
    # the three pinball means sum to exactly (K + 1/2) * WIS = 1.5 * WIS
    total_pinball = p.pinball_10 + p.pinball_50 + p.pinball_90
    assert total_pinball == pytest.approx(1.5 * w.wis, rel=1e-9)


# --- Mann–Whitney ---------------------------------------------------------


def test_mann_whitney_known_u(spark):
    # classic: A = {1,2,3}, B = {4,5,6}: R_a = 6, U = 6 - 6 = 0
    rows = [("g", "A", v) for v in (1.0, 2.0, 3.0)] + [
        ("g", "B", v) for v in (4.0, 5.0, 6.0)
    ]
    df = spark.createDataFrame(rows, "g string, arm string, y double")
    out = mann_whitney(df, "y", "arm", "A", "B", ["g"]).first()
    assert out.n_a == 3 and out.n_b == 3
    assert out.u_stat == 0.0
    # mu = 4.5, sigma^2 = 3*3/12*(7 - 0) = 5.25 (no ties)
    assert out.z_stat == pytest.approx((0.0 - 4.5) / math.sqrt(5.25))


def test_mann_whitney_symmetric_no_reject(spark):
    # identical arms: U = n*n/2, z = 0, p = 1
    rows = [("g", a, float(v)) for a in ("A", "B") for v in range(10)]
    df = spark.createDataFrame(rows, "g string, arm string, y double")
    out = mann_whitney(df, "y", "arm", "A", "B", ["g"]).first()
    assert out.u_stat == pytest.approx(50.0)
    assert out.z_stat == 0.0
    assert out.p_value == pytest.approx(1.0)
    assert out.reject_05 is False


def test_mann_whitney_tie_correction(spark):
    # all values identical: sigma^2 = 0 -> NULL stats, not a crash
    rows = [("g", a, 7.0) for a in ("A", "B") for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, arm string, y double")
    out = mann_whitney(df, "y", "arm", "A", "B", ["g"]).first()
    assert out.u_stat == pytest.approx(12.5)
    assert out.z_stat is None and out.p_value is None


# --- log-rank -------------------------------------------------------------


def _subjects(spark, rows):
    return spark.createDataFrame(
        rows, "g string, arm string, t bigint, died int"
    )


def test_logrank_identical_arms(spark):
    rows = [("g", a, t, 1) for a in ("A", "B") for t in (1, 2, 3, 4)]
    out = logrank_test(
        _subjects(spark, rows), "arm", "A", "B", "t", "died", ["g"]
    ).first()
    assert out.observed_a == 4
    assert out.expected_a == pytest.approx(4.0, abs=1e-6)
    assert out.chi2 == pytest.approx(0.0, abs=1e-6)


def test_logrank_hand_worked(spark):
    # A dies at 1,2 ; B dies at 3,4.  Event times: t=1 (n=4, n1=2, d=1)
    # E1 += 0.5, V += 1*(2/4)*(2/4)*(3/3) = 0.25
    # t=2 (n=3, n1=1, d=1): E1 += 1/3, V += (1/3)(2/3)(2/2) = 2/9
    # t=3 (n=2, n1=0): E1 += 0 ; t=4: n=1 -> V term 0
    # O1 = 2, E1 = 5/6, V = 0.25 + 2/9
    rows = [("g", "A", 1, 1), ("g", "A", 2, 1), ("g", "B", 3, 1),
            ("g", "B", 4, 1)]
    out = logrank_test(
        _subjects(spark, rows), "arm", "A", "B", "t", "died", ["g"]
    ).first()
    assert out.observed_a == 2
    assert out.expected_a == pytest.approx(5.0 / 6.0, abs=1e-6)
    v = 0.25 + 2.0 / 9.0
    assert out.chi2 == pytest.approx((2 - 5.0 / 6.0) ** 2 / v, rel=1e-5)


def test_logrank_censoring_shrinks_risk_set(spark):
    # censored subjects leave the risk set but add no events
    rows = [("g", "A", 1, 1), ("g", "A", 2, 0), ("g", "B", 2, 1),
            ("g", "B", 3, 0)]
    out = logrank_test(
        _subjects(spark, rows), "arm", "A", "B", "t", "died", ["g"]
    ).first()
    # t=1: n=4, n1=2, d=1 -> E1 += 0.5 ; t=2: n=3, n1=1, d=1 -> E1 += 1/3
    assert out.observed_a == 1
    assert out.expected_a == pytest.approx(0.5 + 1.0 / 3.0, abs=1e-6)


# --- cumulative incidence -------------------------------------------------


def test_cuminc_no_competing_equals_1_minus_km(spark):
    rows = [("g", 1, t) for t in (1, 2, 2, 3)] + [("g", 0, 4)]
    subj = spark.createDataFrame(rows, "g string, cause int, t bigint")
    cif = {
        r.t: r.cuminc
        for r in cumulative_incidence(subj, "cause", "t", ["g"]).collect()
    }
    km_subj = spark.createDataFrame(
        [("g", t, 1 if c == 1 else 0) for (_, c, t) in rows],
        "stratum string, t_day bigint, died int",
    )
    km = {r.t_day: r.survival for r in kaplan_meier(km_subj).collect()}
    for t, v in cif.items():
        assert v == pytest.approx(1.0 - km[t], abs=2e-6)


def test_cuminc_hand_worked_competing(spark):
    # n=4: cause1 at t=1 ; cause2 at t=2 ; cause1 at t=3 ; censored t=4
    # t=1: S(0-)=1, inc = 1 * 1/4 = 0.25
    # t=2: competing event, no cause-1 row; S drops to (3/4)*(2/3)=1/2
    # t=3: S(3-) = 0.75 * (2/3) = 0.5, inc = 0.5 * 1/2 = 0.25 -> CIF 0.5
    rows = [("g", 1, 1), ("g", 2, 2), ("g", 1, 3), ("g", 0, 4)]
    subj = spark.createDataFrame(rows, "g string, cause int, t bigint")
    out = {
        r.t: r
        for r in cumulative_incidence(subj, "cause", "t", ["g"]).collect()
    }
    assert set(out) == {1, 3}
    assert out[1].cuminc == pytest.approx(0.25, abs=1e-6)
    assert out[3].cuminc == pytest.approx(0.5, abs=1e-6)
    assert out[3].n_competing == 0 and out[1].n_competing == 0


def test_cuminc_bounded_by_one(spark):
    rows = [("g", 1 + (i % 2), i % 7 + 1) for i in range(40)]
    subj = spark.createDataFrame(rows, "g string, cause int, t bigint")
    vals = [
        r.cuminc
        for r in cumulative_incidence(subj, "cause", "t", ["g"]).collect()
    ]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals == sorted(vals)  # monotone nondecreasing


# --- Diebold–Mariano ------------------------------------------------------


def _dm_df(spark, ys):
    rows = [("g", "s", i, float(y)) for i, y in enumerate(ys)]
    return spark.createDataFrame(rows, "g string, s string, i long, y double")


def test_dm_constant_series_degenerate(spark):
    # constant series: both forecasts perfect, d == 0 everywhere ->
    # variance 0 -> NULL stats (no false significance)
    out = diebold_mariano(
        _dm_df(spark, [5.0] * 20), "y", ["s"], ["i"], ["g"], window=3
    ).first()
    assert out.mean_loss_diff == 0.0
    assert out.dm_stat is None and out.reject_05 is None


def test_dm_mean_beats_naive_on_alternating(spark):
    # alternating series (with a small wobble so the loss differential
    # is not constant): naive is maximally wrong, trailing mean is
    # close to center -> d_t < 0 strongly, reject with negative DM
    ys = [float((i % 2) * 10 + (i % 5)) for i in range(60)]
    out = diebold_mariano(
        _dm_df(spark, ys), "y", ["s"], ["i"], ["g"], window=4
    ).first()
    assert out.mean_loss_diff < 0
    assert out.dm_stat < 0
    assert out.reject_05 is True


def test_dm_complete_case_count(spark):
    # n = len - window (window full from index `window`; lag exists too)
    ys = [float(i * i % 13) for i in range(25)]
    out = diebold_mariano(
        _dm_df(spark, ys), "y", ["s"], ["i"], ["g"], window=7
    ).first()
    assert out.n == 25 - 7


# --- runs test ------------------------------------------------------------


def _series_df(spark, ys):
    from pyspark.sql import Row

    rows = [("g", i, float(y)) for i, y in enumerate(ys)]
    return spark.createDataFrame(rows, "g string, i long, y double")


def test_runs_alternating_rejects_high(spark):
    from timeseriesutils_spark.operators.nonparam import runs_test

    ys = [0.0, 10.0] * 20
    out = runs_test(_series_df(spark, ys), "y", ["g"], ["i"]).first()
    assert out.n_runs == 40  # every step flips side
    assert out.z_stat > 0 and out.reject_05 is True


def test_runs_monotone_rejects_low(spark):
    from timeseriesutils_spark.operators.nonparam import runs_test

    ys = list(range(40))
    out = runs_test(_series_df(spark, ys), "y", ["g"], ["i"]).first()
    assert out.n_runs == 2  # below-mean block then above-mean block
    assert out.z_stat < 0 and out.reject_05 is True


def test_runs_constant_degenerate(spark):
    from timeseriesutils_spark.operators.nonparam import runs_test

    out = runs_test(_series_df(spark, [5.0] * 20), "y", ["g"], ["i"]).first()
    assert out.n_above == 0  # q*n == sum exactly -> "not above"
    assert out.z_stat is None and out.p_value is None


def test_runs_known_moments(spark):
    from timeseriesutils_spark.operators.nonparam import runs_test

    # n1 = n2 = 3, R = 2: mu = 1 + 2*9/6 = 4, sig2 = 18*(18-6)/(36*5) = 1.2
    ys = [0, 0, 0, 10, 10, 10]
    out = runs_test(_series_df(spark, ys), "y", ["g"], ["i"]).first()
    assert out.n_runs == 2 and out.n_above == 3
    assert out.z_stat == pytest.approx((2 - 4.0) / math.sqrt(1.2))


# --- theta forecast -------------------------------------------------------


def _theta_mirror(ys, alpha=0.5, w=28, horizons=(1, 7, 28), m=100.0):
    from timeseriesutils_spark.operators.forecast import theta_weights

    ws, W, S1 = theta_weights(alpha, w)
    q = [math.floor(y * m + 0.5) for y in ys]
    n = len(q)
    sy = float(sum(q))
    sty = float(sum((i + 1) * v for i, v in enumerate(q)))
    nd = float(n)
    st = nd * (nd + 1.0) / 2.0
    sxx = nd * (nd + 1.0) * (2.0 * nd + 1.0) / 6.0
    b = (nd * sty - st * sy) / (nd * sxx - st * st)
    a = (sy - b * st) / nd
    ses = None
    if n >= w:
        ses = 0.0
        for j, wt in enumerate(ws):
            ses = ses + wt * q[n - 1 - j]
    if ses is None:
        return a / m, b / m, None, {}
    lvl2 = 2.0 * ses - a * W - b * (nd * W - S1)
    fcs = {
        h: ((a + b * (nd + float(h))) + lvl2) * 0.5 / m for h in horizons
    }
    return a / m, b / m, lvl2 / m, fcs


def test_theta_constant_series(spark):
    from timeseriesutils_spark.operators.forecast import theta_forecast

    out = theta_forecast(
        _series_df(spark, [7.0] * 40), "y", ["g"], ["i"],
        window_size=28, horizons=(1, 7),
    ).first()
    assert out.intercept == pytest.approx(7.0, abs=1e-6)
    assert out.slope == pytest.approx(0.0, abs=1e-9)
    # truncation residual (1-alpha)^28 ~ 3.7e-9
    assert out.fc_1 == pytest.approx(7.0, abs=1e-5)
    assert out.fc_7 == pytest.approx(7.0, abs=1e-5)


def test_theta_matches_mirror(spark):
    from timeseriesutils_spark.operators.forecast import theta_forecast

    ys = [10.0 + 0.5 * i + 3.0 * ((i * 7) % 5) for i in range(45)]
    out = theta_forecast(
        _series_df(spark, ys), "y", ["g"], ["i"],
        window_size=28, horizons=(1, 7, 28),
    ).first()
    a, b, lvl2, fcs = _theta_mirror(ys)
    assert out.intercept == pytest.approx(a, rel=1e-12)
    assert out.slope == pytest.approx(b, rel=1e-12)
    assert out.theta_level == pytest.approx(lvl2, rel=1e-12)
    for h in (1, 7, 28):
        assert getattr(out, f"fc_{h}") == pytest.approx(fcs[h], rel=1e-12)


def test_theta_short_group_null_forecast(spark):
    from timeseriesutils_spark.operators.forecast import theta_forecast

    out = theta_forecast(
        _series_df(spark, [1.0, 2.0, 3.0]), "y", ["g"], ["i"],
        window_size=28, horizons=(1,),
    ).first()
    assert out.n == 3
    assert out.slope == pytest.approx(1.0, abs=1e-9)
    assert out.fc_1 is None  # truncated filter needs a full window


# --- DSIR -----------------------------------------------------------------


def _dsir_docs(spark):
    target = [
        (i, "alpha beta gamma alpha beta", True) for i in range(10)
    ]
    pool_like = [
        (100 + i, "alpha beta gamma delta", False) for i in range(5)
    ]
    pool_unlike = [
        (200 + i, "zzz qqq www rrr xxx yyy", False) for i in range(5)
    ]
    return spark.createDataFrame(
        target + pool_like + pool_unlike,
        "doc_id long, text string, is_t boolean",
    )


def test_dsir_target_like_scores_higher(spark):
    from timeseriesutils_spark.operators.text import dsir_weights

    out = dsir_weights(
        _dsir_docs(spark), "is_t", buckets=256, top_k=5
    ).collect()
    by_id = {r.doc_id: r for r in out}
    like = [by_id[100 + i].log_weight for i in range(5)]
    unlike = [by_id[200 + i].log_weight for i in range(5)]
    assert min(like) > max(unlike)
    # the 5 target-like pool docs win all 5 slots
    sel = {r.doc_id for r in out if r.selected}
    assert sel == {100 + i for i in range(5)}


def test_dsir_targets_never_selected(spark):
    from timeseriesutils_spark.operators.text import dsir_weights

    out = dsir_weights(
        _dsir_docs(spark), "is_t", buckets=256, top_k=100
    ).collect()
    assert all(not r.selected for r in out if r.is_target)
    # pool smaller than k: every pool doc selected
    assert all(r.selected for r in out if not r.is_target)


def test_dsir_top_k_exact_count(spark):
    from timeseriesutils_spark.operators.text import dsir_weights

    docs = spark.createDataFrame(
        [(i, f"tok{i % 17} tok{i % 5} tok{(i * 3) % 11}", i % 4 == 0)
         for i in range(80)],
        "doc_id long, text string, is_t boolean",
    )
    out = dsir_weights(docs, "is_t", buckets=128, top_k=12).collect()
    assert sum(1 for r in out if r.selected) == 12


# --- ROC AUC --------------------------------------------------------------


def test_auc_perfect_separation(spark):
    from timeseriesutils_spark.operators.nonparam import roc_auc

    rows = [("g", float(v), v >= 5) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = roc_auc(df, "s", "y", ["g"]).first()
    assert out.auc == pytest.approx(1.0)
    assert out.gini == pytest.approx(1.0)


def test_auc_random_ties_half(spark):
    from timeseriesutils_spark.operators.nonparam import roc_auc

    # constant score: every pair tied -> AUC = 0.5 by midranks
    rows = [("g", 3.0, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = roc_auc(df, "s", "y", ["g"]).first()
    assert out.auc == pytest.approx(0.5)
    assert out.gini == pytest.approx(0.0)


def test_auc_hand_worked(spark):
    from timeseriesutils_spark.operators.nonparam import roc_auc

    # pos = {3, 1}, neg = {2, 0}: pairs (3>2,3>0,1>0 win; 1<2 lose)
    # AUC = 3/4
    rows = [("g", 3.0, True), ("g", 1.0, True),
            ("g", 2.0, False), ("g", 0.0, False)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = roc_auc(df, "s", "y", ["g"]).first()
    assert out.auc == pytest.approx(0.75)


def test_auc_inverted_score(spark):
    from timeseriesutils_spark.operators.nonparam import roc_auc

    rows = [("g", float(-v), v >= 5) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = roc_auc(df, "s", "y", ["g"]).first()
    assert out.auc == pytest.approx(0.0)


# --- calibration ----------------------------------------------------------


def test_calibration_perfectly_calibrated_bins(spark):
    from timeseriesutils_spark.operators.forecast import calibration_curve

    # p=0.25 bucket: 1 of 4 positive; p=0.75 bucket: 3 of 4 positive
    rows = [("g", 0.25, i == 0) for i in range(4)] + [
        ("g", 0.75, i != 0) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "g string, p double, y boolean")
    out = {
        r.bin: r
        for r in calibration_curve(df, "p", "y", ["g"], bins=10).collect()
    }
    assert set(out) == {2, 7}
    assert out[2].mean_pred == pytest.approx(0.25)
    assert out[2].frac_pos == pytest.approx(0.25)
    assert out[2].gap == pytest.approx(0.0, abs=1e-9)
    assert out[2].ece == pytest.approx(0.0, abs=1e-9)
    # Brier for perfectly calibrated p: mean p(1-p) = 0.1875
    assert out[2].brier == pytest.approx(0.25 * 0.75, rel=1e-6)


def test_calibration_top_edge_folds_into_last_bin(spark):
    from timeseriesutils_spark.operators.forecast import calibration_curve

    df = spark.createDataFrame(
        [("g", 1.0, True), ("g", 0.95, True)], "g string, p double, y boolean"
    )
    out = calibration_curve(df, "p", "y", ["g"], bins=10).collect()
    assert len(out) == 1 and out[0].bin == 9


def test_calibration_ece_known(spark):
    from timeseriesutils_spark.operators.forecast import calibration_curve

    # one bin, p=0.8 but only 25% positive: ECE = |0.25 - 0.8| = 0.55
    rows = [("g", 0.8, i == 0) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, p double, y boolean")
    out = calibration_curve(df, "p", "y", ["g"], bins=10).first()
    assert out.ece == pytest.approx(0.55, abs=1e-9)
    # Brier = (0.2^2 + 3*0.8^2)/4
    assert out.brier == pytest.approx((0.04 + 3 * 0.64) / 4, rel=1e-6)


# --- Page–Hinkley ---------------------------------------------------------


def test_page_hinkley_flat_no_alarm(spark):
    from timeseriesutils_spark.operators.changepoint import page_hinkley

    out = page_hinkley(
        _series_df(spark, [5.0] * 30), "y", ["g"], ["i"], lam=1.0
    ).collect()
    assert all(r.ph == 0.0 and r.alarm is False for r in out)


def test_page_hinkley_step_alarms(spark):
    from timeseriesutils_spark.operators.changepoint import page_hinkley

    ys = [0.0] * 20 + [10.0] * 20
    out = page_hinkley(
        _series_df(spark, ys), "y", ["g"], ["i"], lam=20.0
    ).collect()
    out.sort(key=lambda r: r.i)
    assert not any(r.alarm for r in out[:20])
    assert out[-1].alarm is True
    # ph is nondecreasing during the post-step run-up at the end
    tail = [r.ph for r in out[-5:]]
    assert tail == sorted(tail)


def test_page_hinkley_known_values(spark):
    from timeseriesutils_spark.operators.changepoint import page_hinkley

    # series 0, 6: running means 0, 3; terms 0, 3; U = 0, 3; min U = 0
    out = page_hinkley(
        _series_df(spark, [0.0, 6.0]), "y", ["g"], ["i"], lam=2.0
    ).collect()
    out.sort(key=lambda r: r.i)
    assert out[0].ph == 0.0
    assert out[1].ph == pytest.approx(3.0)
    assert out[1].alarm is True


# --- Cochran–Armitage -----------------------------------------------------


def test_cochran_armitage_perfect_trend(spark):
    from timeseriesutils_spark.operators.stats import cochran_armitage

    # rate rises with score: 0/10 at t=0, 5/10 at t=1, 10/10 at t=2
    rows = [("g", t, i < t * 5) for t in (0, 1, 2) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, t long, y boolean")
    out = cochran_armitage(df, "t", "y", ["g"]).first()
    assert out.n == 30 and out.n_success == 15
    assert out.z_stat > 0 and out.reject_05 is True


def test_cochran_armitage_flat_rate(spark):
    from timeseriesutils_spark.operators.stats import cochran_armitage

    rows = [("g", t, i % 2 == 0) for t in (0, 1, 2) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, t long, y boolean")
    out = cochran_armitage(df, "t", "y", ["g"]).first()
    assert out.z_stat == pytest.approx(0.0, abs=1e-9)
    assert out.reject_05 is False


def test_cochran_armitage_known_z(spark):
    from timeseriesutils_spark.operators.stats import cochran_armitage

    # t=0: 1/2 ; t=1: 2/2 -> N=4, R=3, St=2, Stt=2, Sty=2
    # pbar=.75, T = 2 - .75*2 = .5, Var = .75*.25*(2 - 4/4) = 0.1875
    rows = [("g", 0, True), ("g", 0, False), ("g", 1, True), ("g", 1, True)]
    df = spark.createDataFrame(rows, "g string, t long, y boolean")
    out = cochran_armitage(df, "t", "y", ["g"]).first()
    assert out.z_stat == pytest.approx(0.5 / math.sqrt(0.1875))


# --- Holt–Winters ---------------------------------------------------------


def _hw_mirror(ys, alpha=0.3, beta=0.1, gamma=0.3, season=7, w=28):
    """Direct zero-initialized recursion over the LAST w observations —
    must equal the impulse-weight filter exactly up to float assoc."""
    window = ys[-w:]
    m = season
    l = b = 0.0
    s = [0.0] * m  # s[j] = seasonal updated j steps ago (rotating)
    for y in window:
        s_old = s[m - 1]
        lp = (1 - alpha) * (l + b) + alpha * (y - s_old)
        bp = beta * (lp - l) + (1 - beta) * b
        sp = gamma * (y - lp) + (1 - gamma) * s_old
        s = [sp] + s[:-1]
        l, b = lp, bp
    return l, b, s[m - 1]


def test_holt_winters_matches_recursion(spark):
    from timeseriesutils_spark.operators.forecast import holt_winters

    ys = [50.0 + 10.0 * ((i % 7) - 3) + 0.2 * i for i in range(40)]
    out = holt_winters(
        _series_df(spark, ys), "y", ["g"], ["i"],
        alpha=0.3, beta=0.1, gamma=0.3, season=7, window_size=28,
    ).orderBy("i").collect()
    l, b, snext = _hw_mirror(ys)
    last = out[-1]
    assert last.y_hw_level_a0p3_g0p3_m7_w28 == pytest.approx(l, rel=1e-9)
    assert last.y_hw_trend_a0p3_g0p3_m7_w28 == pytest.approx(b, rel=1e-9)
    assert last.y_hw_season_a0p3_g0p3_m7_w28 == pytest.approx(snext, rel=1e-9)
    assert last.y_hw_fc_a0p3_g0p3_m7_w28 == pytest.approx(
        l + b + snext, rel=1e-9
    )
    # NULL until a full window exists
    assert out[26].y_hw_fc_a0p3_g0p3_m7_w28 is None
    assert out[27].y_hw_fc_a0p3_g0p3_m7_w28 is not None


def test_holt_winters_learns_pure_seasonality(spark):
    from timeseriesutils_spark.operators.forecast import holt_winters

    # strictly periodic series: the 1-step forecast should approach the
    # true next value as gamma-truncation allows
    pat = [10.0, 20.0, 5.0, 30.0, 15.0, 25.0, 8.0]
    ys = pat * 10
    out = holt_winters(
        _series_df(spark, ys), "y", ["g"], ["i"],
        alpha=0.3, beta=0.05, gamma=0.5, season=7, window_size=49,
    ).orderBy("i").collect()
    last = out[-1]  # index 69, next value would be pat[0] = 10.0
    fc = last.y_hw_fc_a0p3_g0p5_m7_w49
    assert fc == pytest.approx(10.0, abs=3.5)


# --- sample entropy -------------------------------------------------------


def _sampen_mirror(ys, m=2, r_frac=0.2, scale=0):
    q = [math.floor(y * 10**scale + 0.5) for y in ys]
    n = len(q)
    sq = sum(q)
    sqq = sum(v * v for v in q)
    sig = math.sqrt(n * float(sqq) - float(sq) * float(sq)) / n
    r = math.floor(r_frac * sig + 0.5)
    B = A = 0
    for i in range(n - m):
        for j in range(i + 1, n - m):
            if max(abs(q[i + k] - q[j + k]) for k in range(m)) <= r:
                B += 1
            if max(abs(q[i + k] - q[j + k]) for k in range(m + 1)) <= r:
                A += 1
    return B, A, r


def test_sample_entropy_matches_mirror(spark):
    from timeseriesutils_spark.operators.complexity import sample_entropy

    ys = [float((i * 37) % 23 + (i % 5)) for i in range(60)]
    out = sample_entropy(
        _series_df(spark, ys), "y", ["g"], ["i"], m=2, r_frac=0.2, scale=0
    ).first()
    # python mirror counts i<j<=n-m ; engine counts i<j<=n-m (1-based
    # i in 1..n-m-1, j in i+1..n-m) — same unordered pair set
    q = [math.floor(y + 0.5) for y in ys]
    n = len(q)
    B = A = 0
    for i in range(0, n - 2):
        for j in range(i + 1, n - 2):
            pass
    B_, A_, r = _sampen_mirror(ys)
    # recompute with the engine's exact index convention
    B = sum(
        1
        for i in range(0, n - 2 - 1)
        for j in range(i + 1, n - 2)
        if max(abs(q[i] - q[j]), abs(q[i + 1] - q[j + 1])) <= out.r_tol
    )
    A = sum(
        1
        for i in range(0, n - 2 - 1)
        for j in range(i + 1, n - 2)
        if max(abs(q[i + k] - q[j + k]) for k in range(3)) <= out.r_tol
    )
    assert out.b_pairs == B and out.a_pairs == A
    if A > 0 and B > 0:
        assert out.sampen == pytest.approx(-math.log(A / B), abs=1e-8)


def test_sample_entropy_periodic_lower_than_noise(spark):
    from timeseriesutils_spark.operators.complexity import sample_entropy

    periodic = [float(10 * (i % 4)) for i in range(80)]
    noisy = [float((i * 7919) % 101) for i in range(80)]
    rows = [("p", i, v) for i, v in enumerate(periodic)] + [
        ("n", i, v) for i, v in enumerate(noisy)
    ]
    df = spark.createDataFrame(rows, "g string, i long, y double")
    out = {
        r.g: r
        for r in sample_entropy(
            df, "y", ["g"], ["i"], m=2, r_frac=0.2, scale=0
        ).collect()
    }
    assert out["p"].sampen is not None
    # perfectly periodic: every m-match extends -> SampEn == 0
    assert out["p"].sampen == pytest.approx(0.0, abs=1e-9)
    # the aperiodic series is strictly less regular than the periodic one
    assert out["n"].sampen is None or out["n"].sampen > out["p"].sampen


# --- Friedman -------------------------------------------------------------


def test_friedman_hand_worked(spark):
    from timeseriesutils_spark.operators.nonparam import friedman_test

    # 3 blocks x 3 treatments, consistent ordering A<B<C in every block:
    # ranks 1,2,3 per block -> R = (3,6,9); chi2 = 12/(3*3*4)*(9+36+81)
    #                                             - 3*3*4 = 42 - 36 = 6
    rows = []
    for blk in range(3):
        base = blk * 100
        rows += [("g", "A", blk, base + 1.0), ("g", "B", blk, base + 2.0),
                 ("g", "C", blk, base + 3.0)]
    df = spark.createDataFrame(rows, "g string, trt string, blk long, y double")
    out = friedman_test(df, "y", "trt", "blk", ["g"]).first()
    assert out.k_treatments == 3 and out.n_blocks == 3
    assert out.chi2_f == pytest.approx(6.0, abs=1e-9)
    assert out.df == 2


def test_friedman_blocking_removes_level_shift(spark):
    from timeseriesutils_spark.operators.nonparam import friedman_test

    # huge block-level differences, no treatment effect: chi2 ~ 0
    rows = []
    for blk in range(6):
        base = blk * 1000
        # rotate which treatment is "highest" so rank sums equalize
        vals = [1.0, 2.0, 3.0]
        vals = vals[blk % 3:] + vals[:blk % 3]
        for t, v in zip("ABC", vals):
            rows.append(("g", t, blk, base + v))
    df = spark.createDataFrame(rows, "g string, trt string, blk long, y double")
    out = friedman_test(df, "y", "trt", "blk", ["g"]).first()
    assert out.chi2_f == pytest.approx(0.0, abs=1e-9)


def test_friedman_incomplete_blocks_dropped(spark):
    from timeseriesutils_spark.operators.nonparam import friedman_test

    rows = [("g", t, 0, v) for t, v in zip("ABC", (1.0, 2.0, 3.0))]
    rows += [("g", t, 1, v) for t, v in zip("ABC", (1.0, 2.0, 3.0))]
    rows += [("g", "A", 2, 9.0)]  # incomplete block: only one treatment
    df = spark.createDataFrame(rows, "g string, trt string, blk long, y double")
    out = friedman_test(df, "y", "trt", "blk", ["g"]).first()
    assert out.n_blocks == 2  # block 2 excluded


# --- distinct n-grams -----------------------------------------------------


def test_distinct_ngrams_known_counts(spark):
    from timeseriesutils_spark.operators.text import distinct_ngrams

    docs = spark.createDataFrame(
        [(1, "a b a b", "x"), (2, "a b c", "x")],
        "doc_id long, text string, lang string",
    )
    out = {
        r.n: r for r in distinct_ngrams(docs, "lang", n_max=2).collect()
    }
    # unigrams: a,b,a,b + a,b,c = 7 total, 3 distinct
    assert out[1].total_ngrams == 7 and out[1].distinct_ngrams == 3
    # bigrams: 'a b','b a','a b' + 'a b','b c' = 5 total, 3 distinct
    assert out[2].total_ngrams == 5 and out[2].distinct_ngrams == 3
    assert out[2].distinct_ratio == pytest.approx(3 / 5)


def test_distinct_ngrams_template_spam_low_ratio(spark):
    from timeseriesutils_spark.operators.text import distinct_ngrams

    docs = spark.createDataFrame(
        [(i, "buy now click here buy now", "spam") for i in range(20)]
        + [(100 + i, f"unique text number {i} content {i * 7}", "real")
           for i in range(20)],
        "doc_id long, text string, lang string",
    )
    out = {
        (r.lang, r.n): r
        for r in distinct_ngrams(docs, "lang", n_max=2).collect()
    }
    assert out[("spam", 2)].distinct_ratio < out[("real", 2)].distinct_ratio
