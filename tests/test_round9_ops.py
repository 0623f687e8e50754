"""Tests for the round-8 late-wave operators that shipped without
coverage (VERDICT r8 item 4): ljung_box_test, holt_damped, owa_eval,
pettitt_test, cox_stuart, cvm_test, bartlett_test, rmst, kmv_overlap,
mad_outliers — plus regression tests for the two round-8 wrong-answer
bugs: intradoc_dedup with a regex-metachar separator (text.py split
treated sep as a Java regex) and gibberish_score arrow/expr engine
parity (the 26-regexp expression form is now the twin-mirror only).
"""

import math

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.acf import ljung_box_test
from timeseriesutils_spark.operators.forecast import (
    holt_damped,
    holt_damped_weights,
    owa_eval,
)
from timeseriesutils_spark.operators.nonparam import (
    cox_stuart,
    cvm_test,
    pettitt_test,
)
from timeseriesutils_spark.operators.sketches import kmv_overlap
from timeseriesutils_spark.operators.stats import bartlett_test, mad_outliers
from timeseriesutils_spark.operators.survival import rmst
from timeseriesutils_spark.operators.text import gibberish_score, intradoc_dedup


def _q9(x: float) -> float:
    return math.floor(x * 1e9 + 0.5) / 1e9


def _bowling_p(z: float) -> float:
    az = abs(z)
    return _q9(2.0 / (1.0 + math.exp(1.5976 * az + 0.070566 * az**3)))


# --- intradoc_dedup (round-8 wrong-answer regression) -----------------------


def test_intradoc_dedup_metachar_separator(spark):
    # '. ' must split on the LITERAL two-char string, not regex
    # <any-char><space> — the round-8 bug mangled every word
    df = spark.createDataFrame(
        [(1, "ab cd. ef gh. ab cd")], "doc_id int, text string"
    )
    r = intradoc_dedup(df, sep=". ").first()
    assert r.n_lines == 3
    assert r.n_unique_lines == 2
    assert r.dedup_text == "ab cd. ef gh"
    assert r.dup_line_frac == pytest.approx(1 / 3)


def test_intradoc_dedup_default_newline_keep_first_order(spark):
    df = spark.createDataFrame(
        [(1, "header\nbody A\nheader\nbody B\nheader")],
        "doc_id int, text string",
    )
    r = intradoc_dedup(df).first()
    assert r.n_lines == 5 and r.n_unique_lines == 3
    assert r.dedup_text == "header\nbody A\nbody B"


def test_intradoc_dedup_no_dups_roundtrip(spark):
    text = "only one line here"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = intradoc_dedup(df, sep=". ").first()
    assert r.dedup_text == text and r.dup_line_frac == 0.0


# --- gibberish_score: engines bit-equal + hand-worked ------------------------

_GIB_DOCS = [
    (1, "aaab"),
    (2, ""),
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "bcdfghjklmnp"),  # one long consonant run
    (5, "a\t\n b  c"),  # whitespace stripped from alpha_frac base
    (6, "1234 !!! ..."),  # no letters at all
    (7, "zqzqzqzqzqzq"),
    (8, None),  # NULL text == empty text in BOTH engines (r10 ADVICE)
]


def test_gibberish_engines_bit_equal(spark):
    df = spark.createDataFrame(_GIB_DOCS, "doc_id int, text string")
    cols = ["n_chars", "alpha_frac", "char_entropy", "max_letter_frac",
            "max_consonant_run", "gibberish"]
    a = {r.doc_id: r for r in gibberish_score(df, engine="arrow").collect()}
    e = {r.doc_id: r for r in gibberish_score(df, engine="expr").collect()}
    assert set(a) == set(e) == {d for d, _ in _GIB_DOCS}
    for d in a:
        for c in cols:
            assert a[d][c] == e[d][c], f"doc {d} col {c}: {a[d][c]} != {e[d][c]}"


def test_gibberish_hand_worked(spark):
    df = spark.createDataFrame([(1, "aaab")], "doc_id int, text string")
    r = gibberish_score(df).first()
    assert r.n_chars == 4
    assert r.alpha_frac == 1.0
    assert r.max_letter_frac == 0.75
    assert r.max_consonant_run == 1  # the lone 'b'
    ent = -(0.75 * _q9(math.log(0.75)) + 0.25 * _q9(math.log(0.25)))
    assert r.char_entropy == _q9(ent)
    # entropy 0.562 < 2.0 -> gibberish
    assert r.gibberish is True


def test_gibberish_empty_and_no_letters(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "123 456")], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in gibberish_score(df).collect()}
    for d in (1, 2):
        r = out[d]
        assert r.char_entropy == 0.0 and r.max_letter_frac == 0.0
        assert r.alpha_frac == 0.0 and r.max_consonant_run == 0
        assert r.gibberish is True


def test_gibberish_consonant_run_breaks_at_doc_boundary(spark):
    # two docs ending/starting with consonants must not merge runs in
    # the arrow kernel's concatenated codepoint buffer
    df = spark.createDataFrame(
        [(1, "xyz"), (2, "bcd")], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in gibberish_score(df).collect()}
    assert out[1].max_consonant_run == 3
    assert out[2].max_consonant_run == 3


# --- sample_entropy arrow kernel ---------------------------------------------


def test_sample_entropy_engines_identical(spark):
    """The blocked-numpy pair-count kernel must produce the SAME exact
    integers as the engine-side HOF form (the DuckDB twin mirror) —
    including the n−m < 2 degenerate and a series long enough to
    exercise the 512-row blocking."""
    from timeseriesutils_spark.operators.complexity import sample_entropy

    rows = [("g1", i, float((i * 37) % 23 + (i % 5))) for i in range(700)]
    rows += [("g2", i, float((i * 7919) % 101)) for i in range(150)]
    rows += [("g3", i, 1.0) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, i long, y double")
    a = {r.g: r for r in sample_entropy(df, "y", ["g"], ["i"],
                                        engine="arrow").collect()}
    e = {r.g: r for r in sample_entropy(df, "y", ["g"], ["i"],
                                        engine="expr").collect()}
    assert set(a) == set(e) == {"g1", "g2", "g3"}
    for g in a:
        assert tuple(a[g]) == tuple(e[g]), (g, a[g], e[g])
    assert a["g3"].b_pairs == 0 and a["g3"].sampen is None


# --- ljung_box_test ----------------------------------------------------------


def test_ljung_box_rejects_alternating_series(spark):
    rows = [("a", t, 1.0 if t % 2 == 0 else -1.0) for t in range(40)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    r = ljung_box_test(df, "y", ["g"], ["t"], h=5).first()
    assert r.df == 5
    assert r.n == 40  # n_pairs at lag 5 (35) + h
    assert r.q_stat > 50.0  # |r_1| ~ 1 -> Q explodes
    assert r.reject_05 is True and r.p_value < 0.001


def test_ljung_box_small_q_for_single_spike(spark):
    # one outlier in an otherwise flat-ish varied series: autocorrs are
    # small; mostly checks the plumbing end-to-end (n/df wiring)
    vals = [1.0, 2.0, 1.5, 2.5, 1.2, 2.2, 1.8, 2.8, 1.1, 2.1,
            1.6, 2.6, 1.3, 2.3, 1.9, 2.9, 1.4, 2.4, 1.7, 2.7]
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    r = ljung_box_test(df, "y", ["g"], ["t"], h=3).first()
    assert r.df == 3 and r.q_stat is not None and 0.0 <= r.p_value <= 1.0


# --- holt_damped -------------------------------------------------------------


def test_holt_damped_constant_series_matches_weights(spark):
    # for constant input the level/trend are c * sum(weights) exactly
    # (tests the lag alignment, association order, and horizon damping)
    c, w = 5.0, 20
    rows = [("a", t, c) for t in range(60)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = holt_damped(df, "y", ["g"], ["t"], window_size=w, horizons=(1, 7))
    r = out.orderBy(F.desc("t")).first()
    wl, wb = holt_damped_weights(0.3, 0.1, 0.9, w)
    lvl = 0.0
    for wt in wl:
        lvl = lvl + wt * c  # same left-to-right association
    trd = 0.0
    for wt in wb:
        trd = trd + wt * c
    assert r.y_hd_level == lvl
    assert r.y_hd_trend == trd
    damp1 = sum(0.9**i for i in range(1, 2))
    assert r.y_hd_fc1 == lvl + damp1 * trd
    # constant series: level ~ c, trend ~ 0, forecasts ~ c
    assert abs(r.y_hd_level - c) < 0.75  # zero-init truncation tail
    assert abs(r.y_hd_trend) < 0.2


# --- owa_eval ----------------------------------------------------------------


def test_owa_perfect_forecast_scores_zero(spark):
    rows = [("a", t, float(t), float(t)) for t in range(1, 15)]
    df = spark.createDataFrame(rows, "g string, t int, y double, f double")
    r = owa_eval(df, "y", "f", ["g"], ["t"], season=7).first()
    assert r.n == 7  # rows 8..14 have the seasonal lag
    assert r.smape == 0.0 and r.mase == 0.0 and r.owa == 0.0
    assert r.smape_snaive > 0.0


def test_owa_snaive_forecast_scores_one(spark):
    # forecast == the seasonal-naive reference -> sMAPE ratio 1 and
    # MASE 1 -> OWA 1 (up to the 1e-6 per-row quantization)
    base = [3.0, 7.0, 4.0, 9.0, 5.0, 8.0, 6.0] * 3
    ys = [b + 0.5 * t for t, b in enumerate(base)]  # trend: y_t != y_{t-7}
    rows = []
    for t in range(1, 22):
        y = ys[t - 1]
        f = ys[t - 8] if t > 7 else y
        rows.append(("a", t, y, f))
    df = spark.createDataFrame(rows, "g string, t int, y double, f double")
    r = owa_eval(df, "y", "f", ["g"], ["t"], season=7).first()
    assert r.mase == pytest.approx(1.0, abs=1e-5)
    assert r.owa == pytest.approx(1.0, abs=1e-5)


# --- pettitt_test ------------------------------------------------------------


def test_pettitt_hand_worked_change_point(spark):
    # [1,1,1,10,10,10]: midranks 2,2,2,5,5,5 -> U = (-3,-6,-9,-6,-3)
    # K = 9 at t = 3
    rows = [("a", t, v) for t, v in enumerate([1.0, 1.0, 1.0, 10.0, 10.0, 10.0])]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    r = pettitt_test(df, "y", ["g"], ["t"]).first()
    assert r.n == 6
    assert r.k_stat == 9
    assert r.change_pos == 3
    expected_p = _q9(2.0 * math.exp(-6.0 * 81.0 / (216.0 + 36.0)))
    assert r.p_value == expected_p
    assert r.reject_05 is False  # tiny n: p ~ 0.29


def test_pettitt_long_shift_rejects(spark):
    vals = [1.0] * 25 + [50.0] * 25
    rows = [("a", t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    r = pettitt_test(df, "y", ["g"], ["t"]).first()
    assert r.change_pos == 25
    assert r.reject_05 is True


# --- cox_stuart --------------------------------------------------------------


def test_cox_stuart_hand_worked_monotone(spark):
    rows = [("a", t, float(t)) for t in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    r = cox_stuart(df, "y", ["g"], ["t"]).first()
    assert (r.n, r.n_rise, r.n_fall) == (10, 5, 0)
    z = (abs(5.0 - 2.5) - 0.5) / math.sqrt(5.0 / 4.0)
    assert r.z_stat == pytest.approx(z)
    assert r.p_value == _bowling_p(z)
    assert r.reject_05 is False  # p ~ 0.074 with only 5 pairs


def test_cox_stuart_ties_drop_and_flat_series(spark):
    rows = [("a", t, 1.0) for t in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    r = cox_stuart(df, "y", ["g"], ["t"]).first()
    assert (r.n_rise, r.n_fall) == (0, 0)
    assert r.z_stat is None and r.p_value is None and r.reject_05 is None


# --- cvm_test ----------------------------------------------------------------


def test_cvm_identical_samples_zero(spark):
    rows = [("g", lvl, float(v)) for lvl in ("A", "B") for v in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, lvl string, y double")
    r = cvm_test(df, "y", "lvl", "A", "B", ["g"]).first()
    assert (r.n_a, r.n_b) == (10, 10)
    assert r.t_stat == 0.0 and r.reject_05 is False


def test_cvm_complete_separation_hand_worked(spark):
    rows = [("g", "A", float(v)) for v in range(1, 21)]
    rows += [("g", "B", float(v)) for v in range(101, 121)]
    df = spark.createDataFrame(rows, "g string, lvl string, y double")
    r = cvm_test(df, "y", "lvl", "A", "B", ["g"]).first()
    # d_v = 20*cum_a - 20*cum_b; sum(t_v d_v^2) = 400*(sum v^2, v=1..20)
    # + 400*(sum j^2, j=0..19) = 400*(2870+2470); T = U/(20*20*40*40)
    assert r.t_stat == pytest.approx(400 * (2870 + 2470) / (20 * 20 * 40 * 40.0))
    assert r.reject_05 is True


# --- bartlett_test -----------------------------------------------------------


def test_bartlett_equal_variances_chi2_zero(spark):
    rows = [("g", "A", v) for v in (1.0, 2.0, 3.0)]
    rows += [("g", "B", v) for v in (4.0, 5.0, 6.0)]
    df = spark.createDataFrame(rows, "g string, lvl string, y double")
    r = bartlett_test(df, "y", "lvl", ["g"]).first()
    assert (r.k_levels, r.n, r.df) == (2, 6, 1)
    assert r.chi2_stat == pytest.approx(0.0, abs=1e-6)
    assert r.reject_05 is False


def test_bartlett_unequal_variances_reject(spark):
    rows = [("g", "A", float(v)) for v in range(10)]  # var ~ 9.17
    rows += [("g", "B", float(100 * v)) for v in range(10)]  # var ~ 91700
    df = spark.createDataFrame(rows, "g string, lvl string, y double")
    r = bartlett_test(df, "y", "lvl", ["g"]).first()
    assert r.chi2_stat > 20.0
    assert r.reject_05 is True


# --- rmst --------------------------------------------------------------------


def test_rmst_hand_worked_rectangles(spark):
    # 2 subjects, deaths at t=1 and t=2: S(1)=.5, S(2)=0
    # RMST(3) = 1*1 + .5*1 + 0*1 = 1.5
    df = spark.createDataFrame(
        [("x", 1, 1), ("x", 2, 1)], "stratum string, t_day bigint, died int"
    )
    r = rmst(df, tau=3).first()
    assert r.tau == 3 and r.n_events_within == 2
    assert r.rmst == pytest.approx(1.5)


def test_rmst_censoring_extends_tail(spark):
    # death at t=1 (1 of 3 at risk -> S=2/3), censored at 2 and 5;
    # RMST(6) = 1*1 + (2/3)*(6-1) = 4.3333…
    df = spark.createDataFrame(
        [("x", 1, 1), ("x", 2, 0), ("x", 5, 0)],
        "stratum string, t_day bigint, died int",
    )
    r = rmst(df, tau=6).first()
    assert r.n_events_within == 1
    assert r.rmst == pytest.approx(1.0 + (2 / 3) * 5.0, abs=1e-5)


# --- kmv_overlap -------------------------------------------------------------


def test_kmv_exact_when_k_covers_union(spark):
    rows = [("A", v) for v in range(1, 11)] + [("B", v) for v in range(6, 16)]
    df = spark.createDataFrame(rows, "seg string, key int")
    r = kmv_overlap(df, "key", "seg", k=256).first()
    assert (r.group_a, r.group_b) == ("A", "B")
    assert r.exact_jaccard == pytest.approx(5 / 15)
    # k >= |union|: the sketch IS the set, estimator exact
    assert r.kmv_jaccard == pytest.approx(r.exact_jaccard)
    assert r.abs_error == pytest.approx(0.0)
    assert r.k_used == 15


def test_kmv_small_k_estimates_within_band(spark):
    rows = [("A", v) for v in range(2000)]
    rows += [("B", v) for v in range(1000, 3000)]
    df = spark.createDataFrame(rows, "seg string, key int")
    r = kmv_overlap(df, "key", "seg", k=256).first()
    true_j = 1000 / 3000
    assert r.exact_jaccard == pytest.approx(true_j)
    # +-1/sqrt(k) ~ 0.0625: allow 3x
    assert abs(r.kmv_jaccard - true_j) < 3 / math.sqrt(256)
    assert r.k_used == 256


# --- mad_outliers ------------------------------------------------------------


def test_mad_outliers_hand_worked(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4, 100)], "grp string, y double"
    )
    out = {r.y: r for r in mad_outliers(df, "y", ["grp"]).collect()}
    # median 3, MAD = median(|x-3|) = median(2,1,0,1,97) = 1
    assert out[100.0].y_robust_z == pytest.approx(97 / 1.4826)
    assert out[100.0].y_robust_outlier == 1
    assert out[3.0].y_robust_z == 0.0 and out[3.0].y_robust_outlier == 0
    assert out[1.0].y_robust_outlier == 0  # 2/1.4826 ~ 1.35 < 3.5


def test_mad_outliers_zero_mad_nulls(spark):
    df = spark.createDataFrame(
        [("g", 5.0), ("g", 5.0), ("g", 5.0)], "grp string, y double"
    )
    for r in mad_outliers(df, "y", ["grp"]).collect():
        assert r.y_robust_z is None and r.y_robust_outlier is None


# --- round-9 additions: theil_u / pacf / ar2 / flesch / simpson --------------


def test_theil_u_perfect_and_naive(spark):
    from timeseriesutils_spark.operators.forecast import theil_u

    ys = [float(v) for v in (3, 7, 4, 9, 5, 8, 6, 10)]
    rows = []
    for t, y in enumerate(ys):
        rows.append(("a", t, y, y))            # perfect forecast
        rows.append(("b", t, y, ys[t - 1] if t else None))  # = naive
    df = spark.createDataFrame(rows, "g string, t int, y double, f double")
    out = {r.g: r for r in theil_u(df, "y", "f", ["g"], ["t"]).collect()}
    assert out["a"].theil_u2 == 0.0 and out["a"].rmse_fc == 0.0
    # forecast == the lag-1 naive reference -> U2 exactly 1
    assert out["b"].theil_u2 == pytest.approx(1.0)
    assert out["b"].n == 7  # first row lacks the naive


def test_pacf_lag1_equals_acf_and_mirror(spark):
    from timeseriesutils_spark.operators.acf import acf_features, pacf_features

    ys = [float((i * 37) % 23 + 3 * (i % 4)) for i in range(60)]
    rows = [("a", i, v) for i, v in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, i long, y double")
    acf = {r.lag_k: r.acf for r in
           acf_features(df, "y", ["g"], ["i"], max_lag=4).collect()}
    pacf = {r.lag_k: r.pacf for r in
            pacf_features(df, "y", ["g"], ["i"], max_lag=4).collect()}
    assert pacf[1] == acf[1]
    # python Durbin-Levinson mirror over the engine's own r_k
    phi = {(1, 1): acf[1]}
    for k in range(2, 5):
        num = acf[k] - sum(phi[(k - 1, j)] * acf[k - j] for j in range(1, k))
        den = 1.0 - sum(phi[(k - 1, j)] * acf[j] for j in range(1, k))
        phi[(k, k)] = num / den
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - phi[(k, k)] * phi[(k - 1, k - j)]
    for k in range(2, 5):
        assert pacf[k] == pytest.approx(phi[(k, k)], abs=1e-12), k


def test_pacf_ar1_cuts_off_after_lag1(spark):
    # deterministic AR(1)-like decaying oscillation: |pacf_1| large,
    # |pacf_2..| near zero relative to it
    ys, y = [], 100.0
    for i in range(200):
        y = 0.8 * y + ((i * 2654435761) % 97 - 48) / 97.0
        ys.append(y)
    rows = [("a", i, v) for i, v in enumerate(ys)]
    from timeseriesutils_spark.operators.acf import pacf_features

    df = spark.createDataFrame(rows, "g string, i long, y double")
    out = {r.lag_k: r.pacf for r in
           pacf_features(df, "y", ["g"], ["i"], max_lag=4,
                         scale=6).collect()}
    assert out[1] > 0.7
    for k in (2, 3, 4):
        assert abs(out[k]) < 0.25, (k, out[k])


def test_ar2_forecast_mirror(spark):
    from timeseriesutils_spark.operators.forecast import ar2_forecast

    ys = [float((i * 37) % 23 + 3 * (i % 4)) for i in range(80)]
    rows = [("a", i, v) for i, v in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, i long, y double")
    out = {r.horizon: r for r in
           ar2_forecast(df, "y", ["g"], ["i"], horizons=(1, 2, 7),
                        scale=2).collect()}
    # python mirror: quantized ints, engine ACF estimator, YW, recursion
    q = [math.floor(v * 100 + 0.5) for v in ys]
    n = len(q)
    sx, sxx = sum(q), sum(v * v for v in q)
    xbar = sx / n
    den = sxx - xbar * sx
    r = {}
    for k in (1, 2):
        pairs = [(q[i], q[i - k]) for i in range(k, n)]
        sxy = sum(a * b for a, b in pairs)
        aa = sum(a for a, _ in pairs)
        bb = sum(b for _, b in pairs)
        r[k] = (sxy - xbar * (aa + bb) + len(pairs) * xbar * xbar) / den
    d1 = 1.0 - r[1] * r[1]
    phi1 = r[1] * (1.0 - r[2]) / d1
    phi2 = (r[2] - r[1] * r[1]) / d1
    mu = sx / 100.0 / n
    v1, v2 = q[-1] / 100.0, q[-2] / 100.0
    devs = [v2 - mu, v1 - mu]
    fc = {}
    for h in range(1, 8):
        devs.append(phi1 * devs[-1] + phi2 * devs[-2])
        fc[h] = mu + devs[-1]
    for h in (1, 2, 7):
        assert out[h].phi1 == pytest.approx(phi1, abs=1e-12)
        assert out[h].forecast == pytest.approx(fc[h], abs=1e-9), h
    assert out[1].n == 80


def test_flesch_hand_worked(spark):
    from timeseriesutils_spark.operators.text import flesch_readability

    # "the cat sat. it ran fast!" -> 6 words, 2 sentences,
    # vowel groups: e,a,a,i,a,a -> 6 syllables
    df = spark.createDataFrame(
        [(1, "the cat sat. it ran fast!"), (2, "...")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in flesch_readability(df).collect()}
    r1 = out[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (6, 2, 6)
    wps, spw = 6 / 2, 6 / 6
    assert r1.flesch_ease == pytest.approx(
        206.835 - 1.015 * wps - 84.6 * spw, abs=1e-6
    )
    assert r1.fk_grade == pytest.approx(
        0.39 * wps + 11.8 * spw - 15.59, abs=1e-6
    )
    # "..." -> 1 word (the dots are a \S+ run), 0 syllables
    assert out[2].n_words == 1 and out[2].n_syllables == 0


def test_simpson_hand_worked(spark):
    from timeseriesutils_spark.operators.text import simpson_diversity

    df = spark.createDataFrame(
        [("s1", "a A b"), ("s1", "a"), ("s2", "x y z"), ("s3", "w w")],
        "source string, text string",
    )
    out = {r.source: r for r in
           simpson_diversity(df, "source").collect()}
    # s1: tokens a,a,b,a (lowercased) -> N=4, sum n(n-1) = 6 -> 1-6/12
    assert out["s1"].n_tokens == 4 and out["s1"].n_distinct == 2
    assert out["s1"].simpson == pytest.approx(0.5)
    # s2: all distinct -> D = 1
    assert out["s2"].simpson == pytest.approx(1.0)
    # s3: all same -> D = 0
    assert out["s3"].simpson == pytest.approx(0.0)


def test_classification_report_hand_worked(spark):
    from timeseriesutils_spark.operators.mleval import classification_report

    # actual:  a a a b b c ; pred: a b a b c c
    rows = [("g", a, p) for a, p in
            [("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"),
             ("b", "c"), ("c", "c")]]
    df = spark.createDataFrame(rows, "g string, actual string, pred string")
    out = {r["class"]: r for r in
           classification_report(df, "actual", "pred", ["g"]).collect()}
    a = out["a"]
    assert (a.tp, a.fp, a.fn, a.support) == (2, 0, 1, 3)
    assert a.precision == 1.0 and a.recall == pytest.approx(2 / 3)
    assert a.f1 == pytest.approx(4 / 5)
    b = out["b"]
    assert (b.tp, b.fp, b.fn) == (1, 1, 1)
    c = out["c"]
    assert (c.tp, c.fp, c.fn) == (1, 1, 0)
    assert c.recall == 1.0 and c.precision == 0.5


def test_classification_report_class_only_predicted(spark):
    from timeseriesutils_spark.operators.mleval import classification_report

    # a class that never appears in actuals still gets a row (fp only)
    rows = [("g", "x", "x"), ("g", "x", "z")]
    df = spark.createDataFrame(rows, "g string, actual string, pred string")
    out = {r["class"]: r for r in
           classification_report(df, "actual", "pred", ["g"]).collect()}
    z = out["z"]
    assert (z.tp, z.fp, z.fn, z.support) == (0, 1, 0, 0)
    assert z.precision == 0.0 and z.recall is None


def test_gains_curve_hand_worked(spark):
    from timeseriesutils_spark.operators.mleval import gains_curve

    # 10 rows, scores 10..1, positives at the top 3 scores
    rows = [("g", float(10 - i), i < 3) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = {r.bucket: r for r in
           gains_curve(df, "s", "y", ["g"]).collect()}
    assert len(out) == 10
    # decile 1 = top score row only; decile 3 captures all 3 positives
    assert out[1].n_included == 1 and out[1].pos_included == 1
    assert out[1].gains == pytest.approx(1 / 3)
    assert out[1].lift == pytest.approx((1 / 3) / (1 / 10))
    assert out[3].pos_included == 3 and out[3].gains == 1.0
    assert out[10].n_included == 10 and out[10].gains == 1.0
    assert out[10].lift == pytest.approx(1.0)


def test_gains_curve_tie_blocks_whole(spark):
    from timeseriesutils_spark.operators.mleval import gains_curve

    # all rows share ONE score: no bucket below 10 may include the
    # partial tie block -> n_included = 0 until the full block fits
    rows = [("g", 5.0, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = {r.bucket: r for r in gains_curve(df, "s", "y", ["g"]).collect()}
    for b in range(1, 10):
        assert out[b].n_included == 0, b
    assert out[10].n_included == 10 and out[10].gains == 1.0


def test_paired_ttest_hand_worked(spark):
    from timeseriesutils_spark.operators.stats import paired_ttest

    # diffs: +1 +1 +1 +3 -> mean 1.5, sd = 1, t = 1.5/(1/2) = 3
    rows = [("g", 2.0, 1.0), ("g", 3.0, 2.0), ("g", 4.0, 3.0),
            ("g", 6.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, a double, b double")
    r = paired_ttest(df, "a", "b", ["g"]).first()
    assert r.n == 4 and r.df == 3
    assert r.mean_diff == pytest.approx(1.5)
    assert r.sd_diff == pytest.approx(1.0)
    assert r.t_stat == pytest.approx(3.0)
    assert r.p_value == _bowling_p(3.0)


def test_paired_ttest_zero_variance_nulls(spark):
    from timeseriesutils_spark.operators.stats import paired_ttest

    rows = [("g", 2.0, 1.0), ("g", 3.0, 2.0)]
    df = spark.createDataFrame(rows, "g string, a double, b double")
    r = paired_ttest(df, "a", "b", ["g"]).first()
    assert r.mean_diff == pytest.approx(1.0)
    assert r.t_stat is None and r.p_value is None  # all diffs equal


def test_ad_test_mirror_and_semantics(spark):
    """ad_test matches an independent python mirror of the published
    Scholz–Stephens k=2 formulas bit-for-bit, rejects a clear shift,
    and does not reject identical samples."""
    from timeseriesutils_spark.operators.nonparam import ad_test

    def mirror(xa, xb, scale=2):
        m = 10**scale
        qa = [math.floor(x * m + 0.5) for x in xa]
        qb = [math.floor(x * m + 0.5) for x in xb]
        na, nb, N = len(qa), len(qb), len(qa) + len(qb)
        s, cuma, cumb = 0.0, 0, 0
        for v in sorted(set(qa + qb)):
            ta, tb = qa.count(v), qb.count(v)
            cuma, cumb = cuma + ta, cumb + tb
            B, t = cuma + cumb, ta + tb
            if B < N:
                d = cuma * nb - cumb * na
                s += math.floor(t * d * d / (B * (N - B)) * 1e9 + 0.5)
        H = 1 / na + 1 / nb
        a2 = s / 1e9 * H / N
        hq = [math.floor(1e15 / i + 0.5) for i in range(1, N)]
        h = sum(hq) / 1e15
        pre, gs, hmax = 0, 0, sum(hq)
        for i in range(1, N - 1):
            pre += hq[i - 1]
            gs += math.floor((hmax - pre) / 1e15 / (N - i) * 1e9 + 0.5)
        g = gs / 1e9
        k = 2.0
        a = (4 * g - 6) * (k - 1) + (10 - 6 * g) * H
        b = (2 * g - 4) * k * k + 8 * h * k + (2 * g - 14 * h - 4) * H \
            - 8 * h + 4 * g - 6
        c = (6 * h + 2 * g - 2) * k * k + (4 * h - 4 * g + 6) * k \
            + (2 * h - 6) * H + 4 * h
        d2 = (2 * h + 6) * k * k - 4 * h * k
        var = (a * N**3 + b * N * N + c * N + d2) / (
            (N - 1) * (N - 2) * (N - 3)
        )
        return a2, math.sqrt(var)

    xa = [float((i * 37) % 23) for i in range(30)]
    xb = [float((i * 53) % 29 + 5) for i in range(25)]
    rows = [("g", "A", v) for v in xa] + [("g", "B", v) for v in xb]
    df = spark.createDataFrame(rows, "g string, lvl string, y double")
    r = ad_test(df, "y", "lvl", "A", "B", ["g"]).first()
    ma, ms = mirror(xa, xb)
    assert r.a2_stat == ma and r.sigma_n == ms
    assert r.t_stat == (ma - 1.0) / ms
    assert r.reject_05 is True  # shifted by +5

    same = [("g", lvl, float(v)) for lvl in ("A", "B") for v in range(1, 41)]
    df2 = spark.createDataFrame(same, "g string, lvl string, y double")
    r2 = ad_test(df2, "y", "lvl", "A", "B", ["g"]).first()
    assert r2.reject_05 is False and r2.t_stat < 0  # A² below its mean


def test_ad_vs_cvm_tail_sensitivity(spark):
    """AD's 1/(F(1−F)) weight makes it reject a pure TAIL change that
    CvM (flat weight) misses — the reason the operator exists."""
    from timeseriesutils_spark.operators.nonparam import ad_test, cvm_test

    # same body, B moves 12.5% of its mass to an extreme tail — enough
    # for the 1/(F(1−F)) weight to trip, not enough for CvM's flat one
    xa = [float(v % 50) for v in range(200)]
    xb = [float(v % 50) for v in range(175)] + [5000.0 + i for i in range(25)]
    rows = [("g", "A", v) for v in xa] + [("g", "B", v) for v in xb]
    df = spark.createDataFrame(rows, "g string, lvl string, y double")
    ad = ad_test(df, "y", "lvl", "A", "B", ["g"]).first()
    cvm = cvm_test(df, "y", "lvl", "A", "B", ["g"]).first()
    assert ad.reject_05 is True
    assert cvm.reject_05 is False  # the flat-weight test misses it


def test_silhouette_audit_separated_clusters(spark):
    from timeseriesutils_spark.operators.kmeans import silhouette_audit

    # two tight, well-separated 2-D blobs -> mean silhouette near 1
    rows = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(5)]
    rows += [(10 + i, [100.0, 100.0 + 0.01 * i]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = silhouette_audit(df, k=2, n_iter=2).collect()
    assert len(out) == 2 and sum(r.n for r in out) == 10
    for r in out:
        assert r.mean_silhouette > 0.99
        assert r.mean_dist < 0.1


def test_silhouette_audit_k1_null(spark):
    from timeseriesutils_spark.operators.kmeans import silhouette_audit

    rows = [(i, [float(i), 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    r = silhouette_audit(df, k=1, n_iter=1).first()
    assert r.n == 4 and r.mean_silhouette is None
    assert r.mean_dist > 0


def test_chi2_gof_hand_worked(spark):
    from timeseriesutils_spark.operators.stats import chi2_gof

    # perfectly balanced 3 categories -> chi2 exactly 0
    rows = [("g", c) for c in ("a", "b", "c") for _ in range(10)]
    df = spark.createDataFrame(rows, "g string, cat string")
    r = chi2_gof(df, "cat", ["g"]).first()
    assert (r.n, r.n_categories, r.df) == (30, 3, 2)
    assert r.chi2_stat == 0.0 and r.reject_05 is False

    # skew: O = (25, 4, 1) -> chi2 = 3*(625+16+1)/30 - 30 = 34.2
    rows2 = [("g", "a")] * 25 + [("g", "b")] * 4 + [("g", "c")]
    df2 = spark.createDataFrame(rows2, "g string, cat string")
    r2 = chi2_gof(df2, "cat", ["g"]).first()
    assert r2.chi2_stat == pytest.approx(3 * 642 / 30 - 30)
    assert r2.reject_05 is True


def test_chi2_gof_single_category_null(spark):
    from timeseriesutils_spark.operators.stats import chi2_gof

    df = spark.createDataFrame([("g", "only")] * 5, "g string, cat string")
    r = chi2_gof(df, "cat", ["g"]).first()
    assert r.n_categories == 1 and r.chi2_stat is None and r.p_value is None


def test_cuped_hand_worked(spark):
    from timeseriesutils_spark.operators.analytics import cuped_adjust

    # y = 2x + arm effect: after CUPED the x-driven variance vanishes
    rows = []
    for i in range(1, 11):
        rows.append(("A", 2.0 * i, float(i)))
        rows.append(("B", 2.0 * i + 1.0, float(i)))
    df = spark.createDataFrame(rows, "arm string, y double, x double")
    out = {r.arm: r for r in cuped_adjust(df, "y", "x", "arm").collect()}
    # pooled theta: y = 2x + arm-dependent constant -> cov/var = 2
    assert out["A"].theta == pytest.approx(2.0, abs=1e-9)
    # identical x per arm -> adjusted means equal the raw means
    assert out["A"].mean_adj == pytest.approx(out["A"].mean_raw)
    # adjusted lift = the true +1 effect
    assert out["B"].mean_adj - out["A"].mean_adj == pytest.approx(1.0)
    # y is almost perfectly predicted by x -> var_reduction near 1
    assert out["A"].var_reduction > 0.97


def test_cuped_zero_covariate_variance_nulls(spark):
    from timeseriesutils_spark.operators.analytics import cuped_adjust

    rows = [("A", float(i), 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "arm string, y double, x double")
    r = cuped_adjust(df, "y", "x", "arm").first()
    assert r.theta is None and r.mean_adj is None
    assert r.mean_raw == pytest.approx(4.5)


def test_ratio_metric_ci_hand_worked(spark):
    from timeseriesutils_spark.operators.analytics import ratio_metric_ci

    # constant ratio y = 3x -> ratio exactly 3, zero variance
    rows = [("g", 3.0 * v, float(v)) for v in range(1, 9)]
    df = spark.createDataFrame(rows, "g string, y double, x double")
    r = ratio_metric_ci(df, "y", "x", ["g"]).first()
    assert r.ratio == pytest.approx(3.0)
    assert r.se == pytest.approx(0.0, abs=1e-9)
    assert r.ci_lo == pytest.approx(3.0) and r.ci_hi == pytest.approx(3.0)


def test_ratio_metric_ci_mirror(spark):
    from timeseriesutils_spark.operators.analytics import ratio_metric_ci

    ys = [float((i * 7) % 13 + 1) for i in range(50)]
    xs = [float((i * 5) % 11 + 2) for i in range(50)]
    rows = [("g", y, x) for y, x in zip(ys, xs)]
    df = spark.createDataFrame(rows, "g string, y double, x double")
    r = ratio_metric_ci(df, "y", "x", ["g"]).first()
    n = 50
    my, mx = sum(ys) / n, sum(xs) / n
    vy = sum(y * y for y in ys) / n - my * my
    vx = sum(x * x for x in xs) / n - mx * mx
    cxy = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    rr = my / mx
    varr = (vy - 2 * rr * cxy + rr * rr * vx) / n / (mx * mx)
    assert r.ratio == pytest.approx(rr, abs=1e-9)
    assert r.se == pytest.approx(math.sqrt(varr), abs=1e-9)


def test_knn_pq_recovers_separated_neighbors(spark):
    """PQ-ADC must rank same-blob vectors above cross-blob ones when
    blobs are far apart — the approximate index's minimal contract."""
    from timeseriesutils_spark.operators.similarity import knn_pq_portable

    rows = []
    for b in range(2):  # two blobs at 0 and 100 in 8-dim
        for i in range(12):
            base = 100.0 * b
            rows.append(
                (b * 100 + i,
                 [base + 0.05 * ((i * 7 + d) % 5) for d in range(8)])
            )
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = knn_pq_portable(
        df.filter(F.col("vec_id") < 3), df, k=5, m=2, n_codes=4,
        n_sample=24, dim=8,
    ).collect()
    assert len(out) == 15  # 3 queries x 5
    for r in out:
        assert r.vec_id < 100  # every neighbor from the query's blob
        assert r.adc_dist < 100.0


def test_knn_pq_adc_is_deterministic_and_ranked(spark):
    from timeseriesutils_spark.operators.similarity import knn_pq_portable

    rows = [(i, [float((i * 13 + d * 7) % 11) for d in range(8)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    a = knn_pq_portable(df.filter(F.col("vec_id") < 4), df, k=3, m=2,
                        n_codes=4, n_sample=30, dim=8).collect()
    b = knn_pq_portable(df.filter(F.col("vec_id") < 4), df, k=3, m=2,
                        n_codes=4, n_sample=30, dim=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_q = {}
    for r in sorted(a, key=lambda r: (r.query_id, r.rn)):
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)  # rank follows ADC
        assert all(r.vec_id != q for r in rs)  # self excluded


def test_knn_pq_engines_identical(spark):
    """Arrow path (driver numpy Lloyd + encode kernels) must equal the
    expression path (distributed Lloyd + HOF argmins) row for row —
    training, codes, and ADC ranks included."""
    from timeseriesutils_spark.operators.similarity import knn_pq_portable

    rows = [(i, [float((i * 13 + d * 7) % 11) for d in range(8)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = df.filter(F.col("vec_id") < 4)
    a = sorted(map(tuple, knn_pq_portable(
        q, df, k=3, m=2, n_codes=4, n_sample=40, dim=8,
        engine="arrow").collect()))
    e = sorted(map(tuple, knn_pq_portable(
        q, df, k=3, m=2, n_codes=4, n_sample=40, dim=8,
        engine="expr").collect()))
    assert a == e and len(a) == 12


def test_pq_driver_trainer_matches_distributed(spark):
    """_pq_train_books_driver reproduces kmeans_centroids bit-for-bit
    on the same sample/sub-space (the arrow path's training claim)."""
    from timeseriesutils_spark.operators.kmeans import (
        _quantize,
        kmeans_centroids,
    )
    from timeseriesutils_spark.operators.similarity import (
        _pq_train_books_driver,
    )

    rows = [(i, [float((i * 29 + d * 3) % 17) for d in range(8)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    qrows = [
        (r[0], list(r[1]))
        for r in df.select("vec_id", _quantize(F.col("embedding"), 6))
        .orderBy("vec_id").collect()
    ]
    books = _pq_train_books_driver(qrows, m=2, sub=4, n_codes=4, n_iter=3)
    for s_i in range(2):
        s_df = df.select(
            "vec_id", F.slice(F.col("embedding"), s_i * 4 + 1, 4).alias("_sv")
        )
        dist = kmeans_centroids(s_df, "vec_id", "_sv", k=4, n_iter=3, scale=6)
        assert books[s_i] == [list(map(int, c)) for c in dist], s_i
