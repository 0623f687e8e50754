"""Tests for the round-8 wirings: the ML-eval scorecards
(pr_curve, log_loss, ranking_metrics), the stats appends
(jarque_bera, levene_bf, mcnemar_test, cohens_kappa), the portable
sketches (cms_estimate, hll_estimate), and Kendall's tau-b — plus
regression tests for the round-7 ADVICE fixes (ranking IDCG over all
judged rows, Friedman full-treatment-set blocks, WIS complete-case,
sq() literal quoting)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.mleval import (
    log_loss,
    pr_curve,
    ranking_metrics,
)
from timeseriesutils_spark.operators.nonparam import (
    friedman_test,
    kendall_tau,
)
from timeseriesutils_spark.operators.sketches import (
    cms_estimate,
    hll_estimate,
)
from timeseriesutils_spark.operators.stats import (
    cohens_kappa,
    jarque_bera,
    levene_bf,
    mcnemar_test,
)


# --- pr_curve ---------------------------------------------------------------


def _scored(spark, rows):
    return spark.createDataFrame(rows, "g string, p double, y boolean")


def test_pr_curve_hand_worked(spark):
    # scores .1 .4 .6 .9 with labels F F T T; threshold 0.5:
    # predicted positive = {.6, .9} -> tp=2 fp=0 fn=0
    # threshold 0.3: positive = {.4, .6, .9} -> tp=2 fp=1 fn=0
    df = _scored(
        spark,
        [("a", 0.1, False), ("a", 0.4, False), ("a", 0.6, True),
         ("a", 0.9, True)],
    )
    out = {
        round(r.threshold, 2): r
        for r in pr_curve(
            df, "p", "y", ["g"], thresholds=[0.3, 0.5]
        ).collect()
    }
    r5 = out[0.5]
    assert (r5.tp, r5.fp, r5.fn) == (2, 0, 0)
    assert r5.precision == 1.0 and r5.recall == 1.0 and r5.f1 == 1.0
    r3 = out[0.3]
    assert (r3.tp, r3.fp, r3.fn) == (2, 1, 0)
    assert r3.precision == pytest.approx(2 / 3)
    assert r3.recall == 1.0
    assert r3.f1 == pytest.approx(4 / 5)


def test_pr_curve_grid_size_and_null_law(spark):
    df = _scored(
        spark,
        [("a", 0.7, True), ("a", None, True), ("a", 0.2, None)],
    )
    out = pr_curve(df, "p", "y", ["g"]).collect()
    # default grid = 19 thresholds; NULL score/label rows dropped
    assert len(out) == 19
    assert all(r.tp + r.fn == 1 for r in out)


def test_pr_curve_degenerate_no_positives(spark):
    df = _scored(spark, [("a", 0.8, False)])
    r = pr_curve(df, "p", "y", ["g"], thresholds=[0.5]).first()
    assert r.tp == 0 and r.fp == 1 and r.fn == 0
    assert r.precision == 0.0 and r.recall is None


# --- log_loss ---------------------------------------------------------------


def test_log_loss_known_value(spark):
    # -(ln .8 + ln .75)/2, each term floor-quantized at 1e-9
    df = _scored(spark, [("a", 0.8, True), ("a", 0.25, False)])
    out = log_loss(df, "p", "y", ["g"]).first()
    t1 = math.floor(-math.log(0.8) * 1e9 + 0.5)
    t2 = math.floor(-math.log(0.75) * 1e9 + 0.5)
    assert out.n == 2
    assert out.log_loss == pytest.approx((t1 + t2) / 2 / 1e9, abs=1e-12)


def test_log_loss_clamps_extremes(spark):
    # p=0 with y=1 clamps to eps -> -ln(1e-6), finite
    df = _scored(spark, [("a", 0.0, True), ("a", 1.0, False)])
    out = log_loss(df, "p", "y", ["g"]).first()
    expected = math.floor(-math.log(1.0e-6) * 1e9 + 0.5) / 1e9
    assert out.log_loss == pytest.approx(expected, rel=1e-9)


# --- ranking_metrics --------------------------------------------------------


def _rank_df(spark, rows):
    return spark.createDataFrame(
        rows, "q string, rep string, item int, s double, rel bigint"
    )


def _w(i):
    return 1.0 / math.log2(i + 1)


def test_ranking_perfect_list(spark):
    rows = [("q1", "r", i, 10.0 - i, 1 if i <= 2 else 0) for i in range(1, 6)]
    out = ranking_metrics(
        df=_rank_df(spark, rows), query_columns=["q"],
        report_columns=["rep"], score_col="s", rel_col="rel", k=5,
        tie_break=["item"],
    ).first()
    assert out.mean_ndcg_at_k == pytest.approx(1.0, abs=1e-9)
    assert out.mean_mrr == pytest.approx(1.0)
    assert out.hit_rate_at_k == 1.0


def test_ranking_idcg_counts_missed_relevant(spark):
    # ADVICE r7 regression: 3 judged items, rel = [0, 1, 1]; retrieval
    # scores put the irrelevant item first and one relevant item OUTSIDE
    # the top-2.  DCG@2 = w2; IDCG@2 must use ALL judged rows ->
    # w1 + w2; local-IDCG (old bug) would give w1 and inflate NDCG.
    rows = [
        ("q1", "r", 1, 9.0, 0),
        ("q1", "r", 2, 8.0, 1),
        ("q1", "r", 3, 7.0, 1),
    ]
    out = ranking_metrics(
        _rank_df(spark, rows), ["q"], ["rep"], "s", "rel", k=2,
        tie_break=["item"],
    ).first()
    expect = _w(2) / (_w(1) + _w(2))
    inflated = _w(2) / _w(1)
    assert out.mean_ndcg_at_k == pytest.approx(expect, abs=1e-8)
    assert abs(out.mean_ndcg_at_k - inflated) > 0.1
    # first relevant retrieved at rank 2
    assert out.mean_mrr == pytest.approx(0.5)
    assert out.hit_rate_at_k == 1.0


def test_ranking_no_relevant_in_topk(spark):
    # relevant item exists but ranks below k -> hit 0, mrr 0, ndcg 0
    rows = [
        ("q1", "r", 1, 9.0, 0),
        ("q1", "r", 2, 8.0, 0),
        ("q1", "r", 3, 7.0, 1),
    ]
    out = ranking_metrics(
        _rank_df(spark, rows), ["q"], ["rep"], "s", "rel", k=2,
        tie_break=["item"],
    ).first()
    assert out.mean_ndcg_at_k == 0.0
    assert out.mean_mrr == 0.0
    assert out.hit_rate_at_k == 0.0


def test_ranking_graded_relevance_and_report_mean(spark):
    # q1: graded rel (3 at rank 2, 1 at rank 1) vs ideal (3,1)
    rows = [
        ("q1", "r", 1, 9.0, 1),
        ("q1", "r", 2, 8.0, 3),
        ("q2", "r", 1, 5.0, 1),
    ]
    out = ranking_metrics(
        _rank_df(spark, rows), ["q"], ["rep"], "s", "rel", k=2,
        tie_break=["item"],
    ).first()
    ndcg_q1 = (1 * _w(1) + 3 * _w(2)) / (3 * _w(1) + 1 * _w(2))
    # per-query scalars quantize at 1e-9 before the report mean
    q1q = math.floor(ndcg_q1 * 1e9 + 0.5) / 1e9
    assert out.n_queries == 2
    assert out.mean_ndcg_at_k == pytest.approx((q1q + 1.0) / 2, abs=1e-9)
    assert out.mean_mrr == pytest.approx(1.0)


# --- jarque_bera ------------------------------------------------------------


def _jb_numpy(vals, scale=2):
    q = np.floor(np.asarray(vals, dtype="float64") * 10**scale + 0.5)
    n = len(q)
    mean = q.mean()
    m2 = ((q - mean) ** 2).mean()
    m3 = ((q - mean) ** 3).mean()
    m4 = ((q - mean) ** 4).mean()
    s = m3 / m2**1.5
    kx = m4 / m2**2 - 3.0
    jb = n / 6.0 * (s * s + kx * kx / 4.0)
    return s, kx, jb


def test_jarque_bera_matches_numpy_mirror(spark):
    vals = [float(v) for v in
            [1.2, 3.4, 2.2, 5.6, 4.4, 3.1, 2.8, 9.9, 1.1, 4.0, 3.3, 2.7]]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, x double")
    out = jarque_bera(df, "x", ["g"]).first()
    s, kx, jb = _jb_numpy(vals)
    assert out.n == len(vals)
    assert out.skewness == pytest.approx(s, rel=1e-9)
    assert out.kurtosis_excess == pytest.approx(kx, rel=1e-9)
    assert out.jb_stat == pytest.approx(jb, rel=1e-9)
    assert out.p_value == pytest.approx(
        math.floor(math.exp(-jb / 2) * 1e9 + 0.5) / 1e9, abs=1e-12
    )


def test_jarque_bera_symmetric_low_skew(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, x double")
    out = jarque_bera(df, "x", ["g"]).first()
    assert out.skewness == pytest.approx(0.0, abs=1e-12)


def test_jarque_bera_degenerate_constant(spark):
    df = spark.createDataFrame(
        [("a", 5.0)] * 6, "g string, x double"
    )
    out = jarque_bera(df, "x", ["g"]).first()
    assert out.jb_stat is None and out.p_value is None


# --- levene_bf --------------------------------------------------------------


def _bf_numpy(levels, scale=2):
    """Brown–Forsythe mirror on the quantized/doubled-integer path."""
    zs, labels = [], []
    for name, vals in levels.items():
        q = np.floor(np.asarray(vals) * 10**scale + 0.5)
        med2 = 2.0 * np.percentile(q, 50, method="linear")
        z = np.abs(2 * q - np.floor(med2))
        zs.append(z)
        labels += [name] * len(z)
    allz = np.concatenate(zs)
    k = len(levels)
    n = len(allz)
    gm = allz.mean()
    ssb = sum(len(z) * (z.mean() - gm) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    return (ssb / (k - 1)) / (ssw / (n - k))


def test_levene_bf_unequal_spread_significant(spark):
    tight = [10.0 + 0.1 * i for i in range(-5, 6)]
    wide = [10.0 + 3.0 * i for i in range(-5, 6)]
    rows = [("a", "T", v) for v in tight] + [("a", "W", v) for v in wide]
    df = spark.createDataFrame(rows, "g string, lvl string, x double")
    out = levene_bf(df, "x", "lvl", ["g"]).first()
    assert out.k_levels == 2 and out.n == 22
    ref = _bf_numpy({"T": tight, "W": wide})
    assert out.f_stat == pytest.approx(ref, rel=1e-6)
    assert out.f_stat > 10.0
    assert out.df1 == 1 and out.df2 == 20


def test_levene_bf_identical_levels_zero(spark):
    vals = [1.0, 5.0, 9.0, 2.0, 7.0]
    rows = [("a", lv, v) for lv in ("A", "B") for v in vals]
    df = spark.createDataFrame(rows, "g string, lvl string, x double")
    out = levene_bf(df, "x", "lvl", ["g"]).first()
    assert out.f_stat == pytest.approx(0.0, abs=1e-12)


# --- mcnemar ----------------------------------------------------------------


def test_mcnemar_hand_worked(spark):
    # b = 6 (a only), c = 2 (b only): chi2 = (|6-2|-1)^2/8 = 9/8
    rows = (
        [("g", True, False)] * 6
        + [("g", False, True)] * 2
        + [("g", True, True)] * 5
        + [("g", False, False)] * 3
    )
    df = spark.createDataFrame(rows, "g string, fa boolean, fb boolean")
    out = mcnemar_test(df, "fa", "fb", ["g"]).first()
    assert out.n == 16
    assert out.n_a_only == 6 and out.n_b_only == 2
    assert out.chi2_stat == pytest.approx(9 / 8)


def test_mcnemar_symmetric_disagreement(spark):
    # b = c -> continuity-corrected chi2 uses max(|b-c|-1, 0) = 0
    rows = [("g", True, False)] * 4 + [("g", False, True)] * 4
    df = spark.createDataFrame(rows, "g string, fa boolean, fb boolean")
    out = mcnemar_test(df, "fa", "fb", ["g"]).first()
    assert out.chi2_stat == pytest.approx(0.0)
    assert out.p_value == pytest.approx(1.0)
    assert out.reject_05 is False


def test_mcnemar_no_discordant_null(spark):
    rows = [("g", True, True)] * 5
    df = spark.createDataFrame(rows, "g string, fa boolean, fb boolean")
    out = mcnemar_test(df, "fa", "fb", ["g"]).first()
    assert out.chi2_stat is None and out.p_value is None


# --- cohens_kappa -----------------------------------------------------------


def test_kappa_perfect_agreement(spark):
    rows = [("g", lv, lv) for lv in ("x", "y", "z") for _ in range(4)]
    df = spark.createDataFrame(rows, "g string, ra string, rb string")
    out = cohens_kappa(df, "ra", "rb", ["g"]).first()
    assert out.p_observed == 1.0
    assert out.kappa == pytest.approx(1.0)


def test_kappa_hand_worked_2x2(spark):
    # classic: a=20 agree-yes, d=15 agree-no, b=5, c=10
    rows = (
        [("g", "Y", "Y")] * 20
        + [("g", "Y", "N")] * 5
        + [("g", "N", "Y")] * 10
        + [("g", "N", "N")] * 15
    )
    df = spark.createDataFrame(rows, "g string, ra string, rb string")
    out = cohens_kappa(df, "ra", "rb", ["g"]).first()
    n = 50.0
    po = 35 / n
    pe = (25 * 30 + 25 * 20) / (n * n)
    assert out.n == 50
    assert out.p_observed == pytest.approx(po)
    assert out.p_expected == pytest.approx(pe)
    assert out.kappa == pytest.approx((po - pe) / (1 - pe))


def test_kappa_single_label_degenerate(spark):
    # both raters always say the same single label: pe = 1 -> NULL kappa
    rows = [("g", "x", "x")] * 5
    df = spark.createDataFrame(rows, "g string, ra string, rb string")
    out = cohens_kappa(df, "ra", "rb", ["g"]).first()
    assert out.p_expected == 1.0 and out.kappa is None


# --- kendall_tau ------------------------------------------------------------


def _tau_df(spark, xy):
    rows = [("g", i, float(x), float(y)) for i, (x, y) in enumerate(xy)]
    return spark.createDataFrame(rows, "g string, t int, x double, y double")


def test_kendall_perfect_concordance(spark):
    out = kendall_tau(
        _tau_df(spark, [(i, 2 * i) for i in range(8)]), "x", "y", ["g"],
        ["t"],
    ).first()
    assert out.tau_b == pytest.approx(1.0)
    assert out.s_stat == 8 * 7 // 2


def test_kendall_perfect_discordance(spark):
    out = kendall_tau(
        _tau_df(spark, [(i, -3 * i) for i in range(8)]), "x", "y", ["g"],
        ["t"],
    ).first()
    assert out.tau_b == pytest.approx(-1.0)


def test_kendall_tau_b_with_ties_hand_worked(spark):
    # x = [1,1,2,3], y = [1,2,2,3]
    # pairs: (1,2): x tie -> 0 ; (1,3): +1 ; (1,4): +1 ; (2,3): y tie 0
    # (2,4): +1 ; (3,4): +1  => S = 4
    # n0 = 6, n1 (x ties) = 1, n2 (y ties) = 1 -> tau = 4/sqrt(25) = 0.8
    out = kendall_tau(
        _tau_df(spark, [(1, 1), (1, 2), (2, 2), (3, 3)]), "x", "y",
        ["g"], ["t"],
    ).first()
    assert out.n == 4
    assert out.s_stat == 4
    assert out.n_tie_x == 1 and out.n_tie_y == 1
    assert out.tau_b == pytest.approx(0.8)


def test_kendall_constant_series_null(spark):
    out = kendall_tau(
        _tau_df(spark, [(5, i) for i in range(6)]), "x", "y", ["g"], ["t"]
    ).first()
    assert out.tau_b is None  # denominator 0 when one side all-tied


# --- sketches ---------------------------------------------------------------


def _keys_df(spark, counts):
    rows = [(k,) for k, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates(spark):
    counts = {f"key{i}": (i % 7) + 1 for i in range(40)}
    df = _keys_df(spark, counts)
    out = cms_estimate(df, "k", depth=4, width=64, top_k=10).collect()
    assert len(out) == 10
    for r in out:
        assert r.true_count == counts[r.key]
        assert r.cms_count >= r.true_count
        assert r.overestimate == r.cms_count - r.true_count


def test_cms_wide_sketch_exact(spark):
    # width >> distinct keys: collisions vanishingly unlikely with
    # 4 independent rows -> min over rows equals truth here
    counts = {f"k{i}": i + 1 for i in range(8)}
    out = cms_estimate(
        _keys_df(spark, counts), "k", depth=4, width=4096, top_k=8
    ).collect()
    assert all(r.overestimate == 0 for r in out)


def test_cms_deterministic(spark):
    counts = {f"id{i}": (i * 13) % 9 + 1 for i in range(30)}
    df = _keys_df(spark, counts)
    a = sorted(map(tuple, cms_estimate(df, "k", width=64).collect()))
    b = sorted(map(tuple, cms_estimate(df, "k", width=64).collect()))
    assert a == b


def test_hll_exact_and_bounded_error(spark):
    rows = [(f"g", f"v{i % 500}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, k string")
    out = hll_estimate(df, "k", ["g"], b=8).first()
    assert out.exact_distinct == 500
    # m = 256 registers -> ~1.04/16 ≈ 6.5% std error; allow 4 sigma
    assert abs(out.rel_error) < 0.26
    assert out.hll_count == pytest.approx(
        out.exact_distinct * (1 + out.rel_error), rel=1e-6
    )


def test_hll_small_range_correction(spark):
    # 3 distinct << m: linear-counting branch, near-exact
    rows = [("g", k) for k in ("a", "b", "c")] * 4
    df = spark.createDataFrame(rows, "g string, k string")
    out = hll_estimate(df, "k", ["g"], b=8).first()
    assert out.exact_distinct == 3
    assert abs(out.rel_error) < 0.05


def test_hll_deterministic(spark):
    rows = [("g", f"v{i}") for i in range(300)]
    df = spark.createDataFrame(rows, "g string, k string")
    a = hll_estimate(df, "k", ["g"], b=8).first()
    b_ = hll_estimate(df, "k", ["g"], b=8).first()
    assert a.hll_count == b_.hll_count


# --- round-7 ADVICE regressions ---------------------------------------------


def test_friedman_blocks_must_cover_full_treatment_set(spark):
    # treatments {A,B,C}; two size-2 blocks covering DIFFERENT subsets
    # must not count as complete (old bug: size == max size passed)
    rows = [
        ("g", 1, "A", 1.0), ("g", 1, "B", 2.0),
        ("g", 2, "B", 3.0), ("g", 2, "C", 4.0),
    ]
    df = spark.createDataFrame(rows, "g string, blk int, trt string, x double")
    out = friedman_test(df, "x", "trt", "blk", ["g"]).collect()
    # no block contains all 3 treatments -> no complete blocks -> no row
    assert out == []


def test_friedman_complete_block_hand_worked(spark):
    # 3 complete blocks, k=3; within-block ranks for A,B,C = 1,2,3
    # every time: R = (3,6,9) doubled (2,4,6)*3... chi2 = 12/(3*3*4)
    # * (9+36+81) - 3*3*4 = 42 - 36 = 6 (max possible for n=3,k=3)
    rows = [
        ("g", b, t, float(v))
        for b in (1, 2, 3)
        for t, v in (("A", 1.0), ("B", 2.0), ("C", 3.0))
    ]
    df = spark.createDataFrame(rows, "g string, blk int, trt string, x double")
    out = friedman_test(df, "x", "trt", "blk", ["g"]).first()
    assert out.k_treatments == 3 and out.n_blocks == 3
    assert out.chi2_f == pytest.approx(6.0)
    # incomplete extra block must not change the statistic
    rows2 = rows + [("g", 4, "A", 9.0), ("g", 4, "B", 1.0)]
    df2 = spark.createDataFrame(
        rows2, "g string, blk int, trt string, x double"
    )
    out2 = friedman_test(df2, "x", "trt", "blk", ["g"]).first()
    assert out2.n_blocks == 3
    assert out2.chi2_f == pytest.approx(6.0)


def test_wis_null_bound_complete_case(spark):
    from timeseriesutils_spark.operators.epi import wis_scores

    rows = [
        ("a", 10.0, 5.0, 8.0, 12.0),
        ("a", 10.0, None, 8.0, 12.0),   # NULL lower bound -> dropped
        ("a", 10.0, 5.0, None, 12.0),   # NULL median -> dropped
    ]
    df = spark.createDataFrame(
        rows, "g string, y double, f10 double, f50 double, f90 double"
    )
    out = wis_scores(df, "y", "f50", {0.2: ("f10", "f90")}, ["g"]).first()
    assert out.n == 1  # only the complete row counts toward the mean
    assert out.wis == pytest.approx(1.7 / 1.5)


def test_sq_quoting_helper():
    from timeseriesutils_spark.functions.exact import sq

    assert sq("plain") == "'plain'"
    assert sq("O'BRIEN") == "'O''BRIEN'"
    import duckdb

    val = duckdb.sql(f"SELECT {sq(chr(39) + 'x')} AS v").fetchone()[0]
    assert val == "'x"


def test_mann_whitney_sql_quote_safe():
    # renderer must produce parseable SQL for quote-bearing levels
    import duckdb

    from timeseriesutils_spark.operators.nonparam import mann_whitney_sql

    sql = mann_whitney_sql(
        "SELECT 'g' AS g, 'O''BRIEN' AS arm, 1.0 AS y", "y", "arm",
        "O'BRIEN", "SMITH", ["g"],
    )
    duckdb.sql(sql).fetchall()  # must not raise


# --- coarse_grid ------------------------------------------------------------


def test_coarse_grid_exact_cell_means(spark):
    from timeseriesutils_spark.operators.complexity import coarse_grid

    rows = [("g", 0, 1.0), ("g", 1, 2.0), ("g", 2, 4.0), ("g", 3, 8.0),
            ("g", 7, 5.0)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    out = {r.grid_pos: r.x for r in
           coarse_grid(df, "x", "t", ["g"], factor=2).collect()}
    # cells: {0,1} -> 1.5 ; {2,3} -> 6.0 ; {7} -> 5.0 at pos 3
    assert out == {0: 1.5, 1: 6.0, 3: 5.0}


def test_coarse_grid_factor_one_is_identity_for_sampen(spark):
    from timeseriesutils_spark.operators.complexity import (
        coarse_grid,
        sample_entropy,
    )

    rows = [("g", i, float((i * 7) % 5) + 0.25) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    a = sample_entropy(df, "x", ["g"], ["t"]).first()
    cg = coarse_grid(df, "x", "t", ["g"], factor=1)
    b = sample_entropy(cg, "x", ["g"], ["grid_pos"]).first()
    assert (a.n, a.b_pairs, a.a_pairs, a.sampen) == (
        b.n, b.b_pairs, b.a_pairs, b.sampen
    )


def test_coarse_grid_shrinks_pair_count(spark):
    from timeseriesutils_spark.operators.complexity import (
        coarse_grid,
        sample_entropy,
    )

    rows = [("g", i, float((i * 3) % 11)) for i in range(70)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    full = sample_entropy(df, "x", ["g"], ["t"]).first()
    wk = sample_entropy(
        coarse_grid(df, "x", "t", ["g"], factor=7), "x", ["g"],
        ["grid_pos"],
    ).first()
    assert wk.n == 10 and full.n == 70
    assert wk.b_pairs < full.b_pairs / 10
