"""Round-11 second-session wave: the ensemble-forecast verification
family (sample CRPS, PIT/Talagrand histogram) and the Wallinga–Teunis
case reproduction number — numpy/hand parity plus the determinism
contracts the twins rely on."""

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# --- crps_sample ------------------------------------------------------------


def _crps_ref(sample, y):
    """Direct O(m^2) sample-CRPS (Gneiting & Raftery 2007 eq. 21)."""
    m = len(sample)
    t1 = sum(abs(x - y) for x in sample) / m
    t2 = sum(
        abs(a - b) for i, a in enumerate(sample) for b in sample[i + 1:]
    ) / (m * m)
    return t1 - t2


def test_crps_sample_matches_direct_pairwise(spark):
    from timeseriesutils_spark.operators.epi import crps_sample

    ens = [
        [1.0, 2.0, 3.0, 4.0],
        [0.5, 0.5, 2.5, 10.0],   # ties + outlier
        [7.25, 7.25, 7.25, 7.25],  # degenerate ensemble
    ]
    ys = [2.5, 0.5, 9.0]
    rows = [("g", y, sorted(e)) for y, e in zip(ys, ens)]
    df = spark.createDataFrame(rows, ["g", "y", "ens"])
    out = crps_sample(df, "y", "ens", 4, ["g"], scale=2).collect()[0]
    want = sum(_crps_ref(e, y) for e, y in zip(ens, ys)) / len(ys)
    assert out.n == 3
    assert abs(out.crps - want) < 1e-9
    # identity: crps = abs_term - spread_term (shared exact numerators)
    assert abs(out.crps - (out.abs_term - out.spread_term)) < 1e-12


def test_crps_sample_perfect_forecast_is_spread_only(spark):
    """y equal to every member -> abs term = 0, CRPS = -spread?  No:
    CRPS >= 0 always; for a constant ensemble equal to y it is exactly
    0 (both terms vanish)."""
    from timeseriesutils_spark.operators.epi import crps_sample

    df = spark.createDataFrame(
        [("g", 5.0, [5.0, 5.0, 5.0])], ["g", "y", "ens"]
    )
    out = crps_sample(df, "y", "ens", 3, ["g"]).collect()[0]
    assert out.crps == 0.0 and out.abs_term == 0.0 and out.spread_term == 0.0


def test_crps_sample_drops_partial_windows(spark):
    from timeseriesutils_spark.operators.epi import crps_sample

    df = spark.createDataFrame(
        [("g", 1.0, [1.0, 2.0]), ("g", 1.0, [1.0, 2.0, 3.0])],
        ["g", "y", "ens"],
    )
    out = crps_sample(df, "y", "ens", 3, ["g"]).collect()
    assert len(out) == 1 and out[0].n == 1


# --- pit_histogram ----------------------------------------------------------


def test_pit_histogram_ranks_and_ties(spark):
    from timeseriesutils_spark.operators.epi import pit_histogram

    # members [10,20,30]; y below all -> bin 1; above all -> bin 4;
    # equal to the middle member -> less=1, leq=2 -> 1 + 0 + 1 = bin 2
    rows = [
        ("g", 5.0, [10.0, 20.0, 30.0]),
        ("g", 35.0, [10.0, 20.0, 30.0]),
        ("g", 20.0, [10.0, 20.0, 30.0]),
        ("g", 20.0, [20.0, 20.0, 30.0]),  # less=0, leq=2 -> bin 2
    ]
    df = spark.createDataFrame(rows, ["g", "y", "ens"])
    out = {
        r.pit_bin: r.n_bin
        for r in pit_histogram(df, "y", "ens", 3, ["g"]).collect()
    }
    assert out == {1: 1, 4: 1, 2: 2}


def test_pit_histogram_fracs_sum_to_one(spark):
    from timeseriesutils_spark.operators.epi import pit_histogram

    rows = [("g", float(i % 7), [1.0, 3.0, 5.0]) for i in range(20)]
    df = spark.createDataFrame(rows, ["g", "y", "ens"])
    fr = [r.frac for r in pit_histogram(df, "y", "ens", 3, ["g"]).collect()]
    assert abs(sum(fr) - 1.0) < 1e-12


# --- wallinga_teunis --------------------------------------------------------


def _wt_ref(ns, W, min_count=1):
    """Direct Wallinga–Teunis over a dense series: R_t = sum_d
    W_d * n_{t+d} / force_{t+d}, force_s = sum_d W_d * n_{s-d};
    NULL (None) when any forward ratio is undefined."""
    L = len(W)
    n = len(ns)
    force = [None] * n
    for s in range(n):
        if s < L:  # LAG(n, L) needs a full kernel of history
            continue
        force[s] = sum(W[d - 1] * ns[s - d] for d in range(1, L + 1))
    out = [None] * n
    for t in range(n):
        acc = 0.0
        ok = True
        for d in range(1, L + 1):
            s = t + d
            if s >= n or force[s] is None or force[s] <= 0:
                ok = False
                break
            acc += float(W[d - 1]) * (ns[s] / force[s])
        out[t] = acc if (ok and ns[t] >= min_count) else None
    return out


def test_wallinga_teunis_matches_direct(spark):
    from timeseriesutils_spark.operators.epi import wallinga_teunis

    ns = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]
    W = (1, 2, 3, 2, 1)
    df = spark.createDataFrame(
        [("g", d, c) for d, c in enumerate(ns)], ["g", "day", "n"]
    )
    got = {
        r.day: r.rt_wt
        for r in wallinga_teunis(df, "n", "day", ["g"], weights=W).collect()
    }
    want = _wt_ref(ns, list(W))
    for t, w in enumerate(want):
        if w is None:
            assert got[t] is None, t
        else:
            assert got[t] is not None and abs(got[t] - w) < 1e-12, t


def test_wallinga_teunis_total_attribution(spark):
    """Mass-balance sanity (exact on an interior-complete series):
    sum_t n_t * R_t^WT == sum_s n_s over the days s fully attributed
    backwards — checked on a constant series where R = 1 identically
    in the interior."""
    from timeseriesutils_spark.operators.epi import wallinga_teunis

    ns = [4] * 20
    df = spark.createDataFrame(
        [("g", d, c) for d, c in enumerate(ns)], ["g", "day", "n"]
    )
    rows = wallinga_teunis(df, "n", "day", ["g"]).collect()
    interior = [r.rt_wt for r in rows if r.rt_wt is not None]
    assert interior, "no interior rows"
    assert all(abs(v - 1.0) < 1e-12 for v in interior)


def test_wallinga_teunis_zero_force_gap_nulls_upstream(spark):
    """A zero-case gap longer than the kernel makes the restart day's
    force zero -> every day whose forward kernel crosses it is NULL
    (the documented unattributable-cases policy)."""
    from timeseriesutils_spark.operators.epi import wallinga_teunis

    ns = [5, 5, 5, 0, 0, 0, 0, 0, 0, 5, 5, 5]
    df = spark.createDataFrame(
        [("g", d, c) for d, c in enumerate(ns)], ["g", "day", "n"]
    )
    got = {r.day: r.rt_wt for r in wallinga_teunis(df, "n", "day", ["g"]).collect()}
    # day 9 restarts after >kernel gap: its own force is 0 -> days 4..8
    # (zero-count, gated by min_count) and any day needing day 9's
    # ratio (days 4..8) are NULL; day 0..1 look at days 1..6 where
    # forces exist but day 4+ ratios are 0/positive -> defined.
    assert got[8] is None  # needs day 9 ratio (force 0 there)
    ref = _wt_ref(ns, [1, 2, 3, 2, 1])
    for t in range(len(ns)):
        if ref[t] is None:
            assert got[t] is None, t
        else:
            assert got[t] is not None and abs(got[t] - ref[t]) < 1e-12, t


# --- energy_distance --------------------------------------------------------


def _energy_ref(x, y):
    cross = sum(abs(a - b) for a in x for b in y)
    wx = sum(abs(a - b) for a in x for b in x) / 2
    wy = sum(abs(a - b) for a in y for b in y) / 2
    nx, ny = len(x), len(y)
    return 2 * cross / (nx * ny) - 2 * wx / nx**2 - 2 * wy / ny**2


def test_energy_distance_matches_brute_force_with_ties(spark):
    from timeseriesutils_spark.operators.nonparam import energy_distance

    x = [1.0, 2.0, 2.0, 3.0, 7.0, 7.0, 7.0]
    y = [2.0, 2.0, 4.0, 7.0, 9.0]
    rows = [("g", "A", v) for v in x] + [("g", "R", v) for v in y]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = energy_distance(df, "v", "f", "A", "R", ["g"], scale=0).collect()[0]
    want = _energy_ref(x, y)
    assert abs(out.e_dist - want) < 1e-12
    assert out.e_dist >= 0
    t = len(x) * len(y) / (len(x) + len(y)) * want
    assert abs(out.t_stat - t) < 1e-9


def test_energy_distance_identical_samples_is_zero(spark):
    from timeseriesutils_spark.operators.nonparam import energy_distance

    v = [3.0, 1.0, 4.0, 1.0, 5.0]
    rows = [("g", "A", x) for x in v] + [("g", "R", x) for x in v]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = energy_distance(df, "v", "f", "A", "R", ["g"], scale=0).collect()[0]
    assert abs(out.e_dist) < 1e-12


# --- kpss_test --------------------------------------------------------------


def _kpss_ref(y, L=4):
    n = len(y)
    ybar = sum(y) / n
    e = [v - ybar for v in y]
    s = 0.0
    ss = 0.0
    for v in e:
        s += v
        ss += s * s
    g = [sum(e[t] * e[t - k] for t in range(k, n)) / n for k in range(L + 1)]
    lrv = g[0] + 2 * sum((1 - k / (L + 1)) * g[k] for k in range(1, L + 1))
    return ss / (n * n * lrv)


def test_kpss_matches_direct(spark):
    from timeseriesutils_spark.operators.regression import kpss_test

    import random

    rng = random.Random(7)
    y = [10.0 + rng.random() * 4 for _ in range(60)]  # stationary noise
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(y)], ["g", "t", "v"]
    )
    out = kpss_test(df, "v", ["g"], ["t"], lags=4, scale=6).collect()[0]
    want = _kpss_ref([round(v * 1e6) / 1e6 for v in y])
    assert abs(out.kpss_stat - want) < 1e-6
    assert bool(out.level_stationary_5pct) is (want < 0.463)


def test_kpss_random_walk_rejects_level_stationarity(spark):
    from timeseriesutils_spark.operators.regression import kpss_test

    import random

    rng = random.Random(3)
    y, acc = [], 0.0
    for _ in range(120):
        acc += rng.random() - 0.2
        y.append(acc)
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(y)], ["g", "t", "v"]
    )
    out = kpss_test(df, "v", ["g"], ["t"], lags=4, scale=6).collect()[0]
    assert out.kpss_stat > 0.463 and bool(out.level_stationary_5pct) is False


def test_kpss_constant_series_is_null(spark):
    from timeseriesutils_spark.operators.regression import kpss_test

    df = spark.createDataFrame(
        [("g", t, 5.0) for t in range(20)], ["g", "t", "v"]
    )
    out = kpss_test(df, "v", ["g"], ["t"]).collect()[0]
    assert out.kpss_stat is None


# --- icc_oneway -------------------------------------------------------------


def test_icc_oneway_matches_anova_by_hand(spark):
    from timeseriesutils_spark.operators.stats import icc_oneway

    # 3 units x ratings (unbalanced)
    data = {"u1": [8.0, 9.0, 10.0], "u2": [1.0, 2.0], "u3": [5.0, 5.0, 6.0, 6.0]}
    rows = [("g", u, v) for u, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, ["g", "u", "v"])
    out = icc_oneway(df, "v", "u", ["g"], scale=6).collect()[0]
    vals = [v for vs in data.values() for v in vs]
    N, I = len(vals), len(data)
    S = sum(vals)
    ssb = sum(sum(vs) ** 2 / len(vs) for vs in data.values()) - S**2 / N
    ssw = sum(v * v for v in vals) - sum(
        sum(vs) ** 2 / len(vs) for vs in data.values()
    )
    msb, msw = ssb / (I - 1), ssw / (N - I)
    k0 = (N - sum(len(vs) ** 2 for vs in data.values()) / N) / (I - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    assert out.n_units == I and out.n_obs == N
    assert abs(out.msb - msb) < 1e-6
    assert abs(out.msw - msw) < 1e-6
    assert abs(out.k0 - k0) < 1e-9
    assert abs(out.icc - icc) < 1e-6
    assert out.icc > 0.9  # strong between-unit separation by design


def test_icc_oneway_pure_noise_units_near_zero(spark):
    from timeseriesutils_spark.operators.stats import icc_oneway

    import random

    rng = random.Random(11)
    rows = [
        ("g", f"u{i}", rng.gauss(0.0, 1.0))
        for i in range(40)
        for _ in range(3)
    ]
    df = spark.createDataFrame(rows, ["g", "u", "v"])
    out = icc_oneway(df, "v", "u", ["g"], scale=6).collect()[0]
    assert abs(out.icc) < 0.35


# --- chrf_pairs -------------------------------------------------------------


def _chrf_ref(cand, ref, max_n=4, beta=2.0):
    import re
    from collections import Counter

    c = re.sub(r"\s+", "", cand.lower())[:200]
    r = re.sub(r"\s+", "", ref.lower())[:200]
    ps, rs = [], []
    for n in range(1, max_n + 1):
        cg = Counter(c[i:i + n] for i in range(len(c) - n + 1))
        rg = Counter(r[i:i + n] for i in range(len(r) - n + 1))
        m = sum((cg & rg).values())
        ps.append(m / sum(cg.values()))
        rs.append(m / sum(rg.values()))
    p, q = sum(ps) / max_n, sum(rs) / max_n
    b2 = beta * beta
    return 0.0 if (b2 * p + q) == 0 else (1 + b2) * p * q / (b2 * p + q)


def test_chrf_matches_direct(spark):
    from timeseriesutils_spark.operators.text import chrf_pairs

    rows = [
        (1, "the cat sat on the mat", "the cat sat on a mat"),
        (2, "completely different text here", "nothing shared at all xyz"),
        (3, "identical strings match", "identical strings match"),
    ]
    df = spark.createDataFrame(rows, ["pair", "cand", "ref"])
    out = {r.pair: r for r in chrf_pairs(df, "pair", "cand", "ref").collect()}
    for pid, cand, ref in rows:
        want = _chrf_ref(cand, ref)
        assert abs(out[pid].chrf - want) < 1e-12, pid
    assert abs(out[3].chrf - 1.0) < 1e-12


def test_chrf_drops_too_short_pairs(spark):
    from timeseriesutils_spark.operators.text import chrf_pairs

    df = spark.createDataFrame(
        [(1, "ab", "abcdef"), (2, "abcdef", "abcdef")],
        ["pair", "cand", "ref"],
    )
    out = chrf_pairs(df, "pair", "cand", "ref", max_n=4).collect()
    assert [r.pair for r in out] == [2]


# --- wer_pairs --------------------------------------------------------------


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def test_wer_matches_token_level_dp(spark):
    from timeseriesutils_spark.operators.text import wer_pairs

    rows = [
        (1, "the quick brown fox", "the quick red fox"),
        (2, "a b c d e", "a c d e f g"),
        (3, "same same same", "same same same"),
        (4, "one two", "three four five"),
    ]
    df = spark.createDataFrame(rows, ["pair", "cand", "ref"])
    out = {r.pair: r for r in wer_pairs(df, "pair", "cand", "ref").collect()}
    for pid, cand, ref in rows:
        ct, rt = cand.lower().split(), ref.lower().split()
        want = _lev(ct, rt)
        assert out[pid].dist == want, (pid, out[pid].dist, want)
        assert abs(out[pid].wer - want / len(rt)) < 1e-12
    assert out[3].dist == 0


def test_wer_truncates_to_max_tokens(spark):
    from timeseriesutils_spark.operators.text import wer_pairs

    cand = " ".join(f"w{i}" for i in range(100))
    ref = " ".join(f"w{i}" for i in range(50)) + " " + " ".join(
        f"x{i}" for i in range(50)
    )
    df = spark.createDataFrame([(1, cand, ref)], ["pair", "cand", "ref"])
    out = wer_pairs(df, "pair", "cand", "ref", max_tokens=60).collect()[0]
    assert out.cand_tokens == 60 and out.ref_tokens == 60
    # first 50 tokens agree, last 10 of each differ -> dist 10
    assert out.dist == 10


# --- bayes_ab ---------------------------------------------------------------


def test_bayes_ab_symmetric_arms_is_half(spark):
    from timeseriesutils_spark.operators.analytics import bayes_ab

    rows = [("g", "ctl", i < 10) for i in range(40)] + [
        ("g", "trt", i < 10) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["g", "arm", "s"])
    out = bayes_ab(df, "arm", "ctl", "trt", "s", ["g"]).collect()[0]
    assert abs(out.prob_b_beats_a - 0.5) < 1e-12  # identical posteriors
    assert bool(out.decide_b) is False


def test_bayes_ab_matches_numerical_integration(spark):
    from math import lgamma

    import numpy as np

    from timeseriesutils_spark.operators.analytics import bayes_ab

    rows = [("g", "ctl", i < 30) for i in range(100)] + [
        ("g", "trt", i < 40) for i in range(110)
    ]
    df = spark.createDataFrame(rows, ["g", "arm", "s"])
    out = bayes_ab(df, "arm", "ctl", "trt", "s", ["g"]).collect()[0]

    def logbeta(a, b):
        return lgamma(a) + lgamma(b) - lgamma(a + b)

    a1, b1, a2, b2 = 31, 71, 41, 71
    x = np.linspace(1e-9, 1 - 1e-9, 200001)
    pdfA = np.exp((a1 - 1) * np.log(x) + (b1 - 1) * np.log(1 - x) - logbeta(a1, b1))
    cdfA = np.cumsum(pdfA) * (x[1] - x[0])
    pdfB = np.exp((a2 - 1) * np.log(x) + (b2 - 1) * np.log(1 - x) - logbeta(a2, b2))
    want = float(np.sum(pdfB * cdfA) * (x[1] - x[0]))
    assert abs(out.prob_b_beats_a - want) < 1e-4  # grid error dominates
    assert out.n_a == 100 and out.conv_b == 40


def test_bayes_ab_overwhelming_evidence_decides(spark):
    from timeseriesutils_spark.operators.analytics import bayes_ab

    rows = [("g", "ctl", i < 5) for i in range(200)] + [
        ("g", "trt", i < 60) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["g", "arm", "s"])
    out = bayes_ab(df, "arm", "ctl", "trt", "s", ["g"]).collect()[0]
    assert out.prob_b_beats_a > 0.9999 and bool(out.decide_b) is True


# --- qini_curve -------------------------------------------------------------


def test_qini_perfect_uplift_model(spark):
    """Score separates a segment where treatment causes response from
    one where it does nothing: the top deciles capture all incremental
    responders and the final bucket equals the overall incremental
    count."""
    from timeseriesutils_spark.operators.mleval import qini_curve

    rows = []
    # persuadables: score 0.9, treated respond, control never (40 t, 40 c)
    for i in range(40):
        rows.append(("g", 0.9, True, True))
        rows.append(("g", 0.9, False, False))
    # sure-nothings: score 0.1, nobody responds
    for i in range(60):
        rows.append(("g", 0.1, True, False))
        rows.append(("g", 0.1, False, False))
    df = spark.createDataFrame(rows, ["g", "score", "treated", "resp"])
    out = {r.bucket: r for r in qini_curve(
        df, "score", "treated", "resp", ["g"]).collect()}
    # bucket 4 = top 80 rows = exactly the persuadable block
    assert out[4].resp_treat == 40 and out[4].resp_ctl == 0
    assert abs(out[4].qini - 40.0) < 1e-12
    assert abs(out[4].uplift - 1.0) < 1e-12
    # final bucket: whole population, uplift = 40/100
    assert abs(out[10].qini - 40.0) < 1e-12
    assert abs(out[10].uplift - 0.4) < 1e-12


def test_qini_null_when_arm_missing_in_slice(spark):
    from timeseriesutils_spark.operators.mleval import qini_curve

    rows = [("g", 0.9, True, True)] * 10 + [("g", 0.1, False, False)] * 10
    df = spark.createDataFrame(rows, ["g", "score", "treated", "resp"])
    out = {r.bucket: r for r in qini_curve(
        df, "score", "treated", "resp", ["g"]).collect()}
    # top half has no control rows -> NULL uplift/qini
    assert out[5].uplift is None and out[5].qini is None
    assert out[10].uplift is not None


# --- adamic_adar ------------------------------------------------------------


def test_adamic_adar_matches_hand_graph(spark):
    import math

    from timeseriesutils_spark.operators.graph import adamic_adar

    # square 1-2-3-4-1 plus hub 5 connected to all: AA(1,3) via 2,4,5
    edges = [(1, 2), (2, 3), (3, 4), (1, 4), (1, 5), (2, 5), (3, 5), (4, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {(r.src, r.dst): r for r in adamic_adar(df, top_k=50).collect()}
    deg = {1: 3, 2: 3, 3: 3, 4: 3, 5: 4}

    def q9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    def w(z):
        return math.floor(1.0 / q9(math.log(deg[z])) * 1e9 + 0.5) / 1e9

    want13 = w(2) + w(4) + w(5)
    got = out[(1, 3)]
    assert got.common == 3
    assert abs(got.aa_score - want13) < 1e-9
    assert bool(got.already_linked) is False
    assert bool(out[(1, 2)].already_linked) is True


def test_adamic_adar_ranks_nonedges_for_prediction(spark):
    from timeseriesutils_spark.operators.graph import adamic_adar

    # path 1-2-3: only candidate pair is (1,3) via 2
    df = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    out = adamic_adar(df, top_k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.src, r.dst) == (1, 3) and r.common == 1
    assert bool(r.already_linked) is False


# --- variance_ratio ---------------------------------------------------------


def _vr_ref(y, q=5):
    T = len(y) - 1
    D = y[-1] - y[0]
    a1 = sum((T * (y[t] - y[t - 1]) - D) ** 2 for t in range(1, len(y)))
    aq = sum(
        (T * (y[t] - y[t - q]) - q * D) ** 2 for t in range(q, len(y))
    )
    return aq * (T - 1) * T / (a1 * q * (T - q + 1) * (T - q))


def test_variance_ratio_random_walk_near_one(spark):
    import random

    from timeseriesutils_spark.operators.regression import variance_ratio

    rng = random.Random(5)
    y, acc = [], 0.0
    for _ in range(400):
        acc += rng.gauss(0, 1)
        y.append(acc)
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(y)], ["g", "t", "v"]
    )
    out = variance_ratio(df, "v", ["g"], ["t"], q=5, scale=6).collect()[0]
    want = _vr_ref([round(v * 1e6) for v in y], 5)
    assert abs(out.vr - want) < 1e-9
    assert 0.6 < out.vr < 1.5  # random walk: VR ~ 1
    assert bool(out.random_walk_rejected_5pct) is (abs(out.z_stat) > 1.96)


def test_variance_ratio_mean_reversion_below_one(spark):
    import random

    from timeseriesutils_spark.operators.regression import variance_ratio

    rng = random.Random(9)
    y = [rng.gauss(0, 1) for _ in range(400)]  # iid noise: VR(5) ~ 1/5... no:
    # iid LEVELS (not increments) -> differences are MA(1)-like with
    # strong negative autocorrelation -> VR well below 1
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(y)], ["g", "t", "v"]
    )
    out = variance_ratio(df, "v", ["g"], ["t"], q=5, scale=6).collect()[0]
    assert out.vr < 0.6
    assert bool(out.random_walk_rejected_5pct) is True


# --- plan-shape pins for the second-session wave ----------------------------


@pytest.fixture(scope="module")
def catalog(spark):
    import __spark_entry__ as e

    return e.queries()


def _plan(spark, catalog, name):
    return catalog[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_wave_plans_stay_jvm_side(spark, catalog):
    """None of the second-session operators may fall back to Python
    evaluation — folds, codebooks, and rank identities are all
    built-in expressions."""
    for name in (
        "crps_sample", "pit_histogram", "wallinga_teunis", "kpss_test",
        "icc_oneway", "energy_distance", "variance_ratio", "bayes_ab",
        "qini_curve", "chrf_pairs", "wer_pairs", "adamic_adar",
        "ansari_bradley", "gumbel_lmom", "mmd_drift", "forecast_e2e",
        "kuiper_test", "cucconi_test", "lepage_test", "tost_equivalence",
    ):
        plan = _plan(spark, catalog, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_kpss_and_vr_single_exchange(spark, catalog):
    """kpss_test and variance_ratio share the adf plan shape: the
    ordered window pass and the sufficient-stats aggregation ride ONE
    exchange (the _daily_pq supplier partitioning)."""
    import re

    for name in ("kpss_test", "variance_ratio"):
        plan = _plan(spark, catalog, name)
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, name


def test_two_arm_rank_ops_pin_per_arm(spark, catalog):
    """energy_distance (and brunner_munzel, same fix) must read the
    per-arm aggregate from cache in BOTH join branches — without the
    pin the expensive rank-window pass executes twice."""
    import re

    for name in ("energy_distance", "brunner_munzel"):
        plan = _plan(spark, catalog, name)
        assert len(re.findall(r"InMemoryTableScan", plan)) >= 2, name


# --- ansari_bradley ---------------------------------------------------------


def test_ansari_bradley_matches_scipy_formulation(spark):
    """Parity against the documented conditional-moment formulas on a
    hand multiset (odd N, ties) — scores via midranks from both ends."""
    from timeseriesutils_spark.operators.nonparam import ansari_bradley

    xa = [1.0, 3.0, 5.0, 7.0, 9.0]        # wide
    xb = [4.0, 5.0, 5.0, 6.0]             # narrow, with ties
    rows = [("g", "A", v) for v in xa] + [("g", "B", v) for v in xb]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = ansari_bradley(df, "v", "f", "A", "B", ["g"], scale=0).collect()[0]
    # hand scores: pooled sorted [1,3,4,5,5,5,6,7,9], N=9
    # midranks: 1->1, 3->2, 4->3, 5->(4+5+6)/3=5, 6->7, 7->8, 9->9
    # a_i = min(r, 10-r): 1,2,3,5,3,2,1 ; with 5's midrank 5 -> a=5
    # arm B: 4->3, 5->5 (x2), 6->3  => AB = 3+5+5+3 = 16
    assert abs(out.ab_stat - 16.0) < 1e-12
    # moments from the realized multiset of scores
    scores = [1.0, 2.0, 3.0, 5.0, 5.0, 5.0, 3.0, 2.0, 1.0]
    N, nb, na = 9.0, 4.0, 5.0
    sa, ssa = sum(scores), sum(v * v for v in scores)
    mean = nb * sa / N
    var = na * nb * (N * ssa - sa * sa) / (N * N * (N - 1.0))
    want_z = (16.0 - mean) / var**0.5
    assert abs(out.z - want_z) < 1e-9
    # narrow sample concentrates in the middle -> AB above its mean
    assert out.z > 0


def test_ansari_bradley_identical_arms_z_zero_ish(spark):
    from timeseriesutils_spark.operators.nonparam import ansari_bradley

    v = [float(i) for i in range(20)]
    rows = [("g", "A", x) for x in v] + [("g", "B", x) for x in v]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = ansari_bradley(df, "v", "f", "A", "B", ["g"], scale=0).collect()[0]
    assert abs(out.z) < 1e-9 and bool(out.reject_05) is False


# --- gumbel_lmom ------------------------------------------------------------


def test_gumbel_lmom_recovers_known_parameters(spark):
    """Sampling from Gumbel(mu=10, beta=2) via the inverse CDF on a
    deterministic uniform grid makes the L-moment estimates land near
    the true parameters (the grid IS the quantile function sweep)."""
    import math

    from timeseriesutils_spark.operators.forecast import gumbel_lmom

    mu, beta, n = 10.0, 2.0, 400
    xs = [
        mu - beta * math.log(-math.log((i + 0.5) / n)) for i in range(n)
    ]
    df = spark.createDataFrame(
        [("g", v) for v in xs], ["g", "v"]
    )
    out = gumbel_lmom(df, "v", ["g"], scale=4).collect()[0]
    assert abs(out.mu - mu) < 0.05
    assert abs(out.beta - beta) < 0.05
    # return level is the quantile at 1 - 1/T
    want_rl52 = mu - beta * math.log(-math.log(1 - 1.0 / 52))
    assert abs(out.rl_52 - want_rl52) < 0.2
    assert out.rl_10 < out.rl_52 < out.rl_100


def test_gumbel_lmom_l2_is_half_mean_abs_diff(spark):
    """l2 identity: lambda_2 = (1/2)E|X1-X2| — cross-check the rank
    weights against the brute-force pair sum."""
    from timeseriesutils_spark.operators.forecast import gumbel_lmom

    xs = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame([("g", v) for v in xs], ["g", "v"])
    out = gumbel_lmom(df, "v", ["g"], scale=2).collect()[0]
    n = len(xs)
    pair = sum(abs(a - b) for i, a in enumerate(xs) for b in xs[i + 1:])
    want_l2 = pair / (n * (n - 1))
    assert abs(out.l2 - want_l2) < 1e-9


# --- mmd_quad_drift ---------------------------------------------------------


def test_mmd_identical_samples_zero(spark):
    from timeseriesutils_spark.operators.similarity import mmd_quad_drift

    vecs = [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6], [-0.2, 0.0, 0.7]]
    rows = [(1, v) for v in vecs] + [(2, v) for v in vecs]
    df = spark.createDataFrame(rows, ["half", "embedding"])
    out = mmd_quad_drift(df, "embedding", "half", scale=4).collect()[0]
    assert out.mmd2 == 0.0 and out.mmd2_linear == 0.0


def test_mmd_matches_direct_kernel_vstat(spark):
    """Closed-form moments == direct V-statistic of k(x,y)=(1+x.y)^2
    on quantized vectors."""
    import itertools

    from timeseriesutils_spark.operators.similarity import mmd_quad_drift

    import random

    rng = random.Random(2)
    A = [[rng.uniform(-1, 1) for _ in range(4)] for _ in range(6)]
    B = [[rng.uniform(-1, 1) + 0.3 for _ in range(4)] for _ in range(5)]
    rows = [(1, v) for v in A] + [(2, v) for v in B]
    df = spark.createDataFrame(rows, ["half", "embedding"])
    out = mmd_quad_drift(df, "embedding", "half", scale=4).collect()[0]

    def qz(v):
        import math

        return [math.floor(x * 1e4 + 0.5) / 1e4 for x in v]

    Aq, Bq = [qz(v) for v in A], [qz(v) for v in B]

    def k(x, y):
        d = sum(a * b for a, b in zip(x, y))
        return (1.0 + d) ** 2

    kxx = sum(k(x, y) for x in Aq for y in Aq) / len(Aq) ** 2
    kyy = sum(k(x, y) for x in Bq for y in Bq) / len(Bq) ** 2
    kxy = sum(k(x, y) for x in Aq for y in Bq) / (len(Aq) * len(Bq))
    want = kxx + kyy - 2 * kxy
    assert abs(out.mmd2 - want) < 1e-9
    assert out.mmd2 > 0


def test_mmd_sees_covariance_rotation_centroid_misses(spark):
    """Mean-preserving shape change: sample 2 swaps two coordinates of
    a correlated cloud — centroids match (linear term ~0) but the
    second-moment term fires."""
    from timeseriesutils_spark.operators.similarity import mmd_quad_drift

    import random

    rng = random.Random(4)
    A, B = [], []
    for _ in range(80):
        a = rng.uniform(-1, 1)
        b = rng.uniform(-0.1, 0.1)
        A.append([a, a, b, -b])       # corr(x1,x2) = 1
        B.append([a, -a, b, b])       # corr flipped
    rows = [(1, v) for v in A] + [(2, v) for v in B]
    df = spark.createDataFrame(rows, ["half", "embedding"])
    out = mmd_quad_drift(df, "embedding", "half", scale=4).collect()[0]
    assert out.mmd2_linear < 0.05
    assert out.mmd2_quad > 0.2


# --- forecast_e2e -----------------------------------------------------------


def test_forecast_e2e_plan_pins_the_fold_fork(spark, catalog):
    """The train/test fork must read ONE pinned featurized frame (no
    re-running the three-window featurize per side), and the fit joins
    back as a broadcast."""
    plan = _plan(spark, catalog, "forecast_e2e")
    import re

    assert len(re.findall(r"InMemoryTableScan", plan)) >= 2
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_forecast_e2e_learns_a_learnable_series(spark):
    """On a series where the target IS a linear function of the
    features, the fitted model's test MAE beats the naive baseline
    (positive skill) and r2 ~ 1."""
    from timeseriesutils_spark.operators.forecast_pipeline import (
        backtest_forecast_pipeline,
    )

    rows = []
    for s in range(4):
        for t in range(120):
            wig = ((t * 2654435761 + s) % 97) / 10.0  # breaks collinearity
            rows.append((s, t, 50.0 + 2.0 * t + 5.0 * s + wig))
    df = spark.createDataFrame(rows, ["l_suppkey", "ship_day", "day_price"])
    out = backtest_forecast_pipeline(
        df, "day_price", "ship_day", "l_suppkey",
        cohort_modulus=2, cutoff=80,
    ).collect()
    assert out, "no cohorts scored"
    for r in out:
        assert r.n_train > 0 and r.n_test > 0
        assert r.r2 > 0.99
        assert r.skill > 0.5  # linear trend: OLS crushes carry-forward
        assert r.mae < r.naive_mae


# --- stream_crps ------------------------------------------------------------


def test_stream_crps_cross_batch_ring_matches_batch_closed_form(
    spark, tmp_path
):
    """Two parquet files -> (at least) two micro-batches: the ring state
    must carry the last m values across the batch boundary so every
    scored row sees its true trailing ensemble; drained totals equal
    the direct per-row CRPS numerator sum."""
    import math

    from timeseriesutils_spark.streaming.windows import streaming_crps

    m, mult = 4, 100
    vals = [3.1, 1.2, 4.7, 1.9, 5.5, 9.2, 2.6, 6.1, 5.3, 3.8, 7.7, 2.2]
    rows = [(1, i, float(i), v) for i, v in enumerate(vals)]
    import pandas as pd

    d1 = pd.DataFrame(rows[:7], columns=["user_id", "event_id", "ts", "value"])
    d2 = pd.DataFrame(rows[7:], columns=["user_id", "event_id", "ts", "value"])
    src = tmp_path / "stream_src"
    src.mkdir()
    d1.to_parquet(src / "a.parquet")
    d2.to_parquet(src / "b.parquet")
    sdf = (
        spark.readStream.schema(
            "user_id bigint, event_id bigint, ts double, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    import uuid

    name = f"t_scrps_{uuid.uuid4().hex[:6]}"
    q = (
        streaming_crps(
            sdf, key_col="user_id", value_col="value",
            order_cols=("ts", "event_id"), members=m, scale=2,
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows_out = spark.sql(
        f"SELECT * FROM {name} ORDER BY n_seen DESC LIMIT 1"
    ).collect()
    got = rows_out[0]
    # direct closed form
    qv = [math.floor(v * mult + 0.5) for v in vals]
    snum, scored = 0, 0
    for i in range(m, len(qv)):
        win = sorted(qv[i - m:i])
        y = qv[i]
        t1 = sum(abs(x - y) for x in win)
        pair = sum((2 * (j + 1) - 1 - m) * x for j, x in enumerate(win))
        snum += m * t1 - pair
        scored += 1
    assert got.n_seen == len(vals)
    assert got.n_scored == scored
    assert abs(got.mean_crps - snum / (m * m * mult * scored)) < 1e-12


# --- kuiper_test ------------------------------------------------------------


def test_kuiper_dominates_ks_on_two_sided_shift(spark):
    """A pure scale difference pushes one arm's ECDF above in the left
    tail and below in the right: KS keeps only the larger excursion,
    Kuiper adds both — V >= D always, strictly greater here."""
    from timeseriesutils_spark.operators.nonparam import ks_test, kuiper_test

    wide = [float(v) for v in range(0, 40)]
    narrow = [15.0 + v / 4.0 for v in range(0, 40)]
    rows = [("g", "A", v) for v in wide] + [("g", "R", v) for v in narrow]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    kp = kuiper_test(df, "v", "f", "A", "R", ["g"], scale=2).collect()[0]
    ks = ks_test(df, "v", "f", "A", "R", ["g"], scale=2).collect()[0]
    assert kp.v_stat > ks.d_stat + 0.1


def test_kuiper_matches_direct_ecdf(spark):
    from timeseriesutils_spark.operators.nonparam import kuiper_test

    xa = [1.0, 2.0, 2.0, 5.0, 9.0]
    xb = [2.0, 3.0, 7.0, 8.0]
    rows = [("g", "A", v) for v in xa] + [("g", "R", v) for v in xb]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = kuiper_test(df, "v", "f", "A", "R", ["g"], scale=0).collect()[0]
    support = sorted(set(xa + xb))
    dp = max(
        sum(1 for x in xa if x <= t) / len(xa)
        - sum(1 for x in xb if x <= t) / len(xb)
        for t in support
    )
    dm = max(
        sum(1 for x in xb if x <= t) / len(xb)
        - sum(1 for x in xa if x <= t) / len(xa)
        for t in support
    )
    assert abs(out.v_stat - (max(dp, 0) + max(dm, 0))) < 1e-12


# --- cucconi_test -----------------------------------------------------------


def test_cucconi_matches_published_formulation(spark):
    """Direct check of U/V/rho/C against the Marozzi (2009) formulas on
    a tie-free sample."""
    from timeseriesutils_spark.operators.nonparam import cucconi_test

    import math

    xa = [1.0, 4.0, 6.0, 9.0, 12.0, 15.0]
    xb = [2.0, 3.0, 10.0, 11.0]
    rows = [("g", "A", v) for v in xa] + [("g", "R", v) for v in xb]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = cucconi_test(df, "v", "f", "A", "R", ["g"], scale=0).collect()[0]
    pooled = sorted(xa + xb)
    ranks_b = [pooled.index(v) + 1 for v in xb]
    n1, n2 = len(xa), len(xb)
    N = n1 + n2
    den = math.sqrt(n1 * n2 * (N + 1) * (2 * N + 1) * (8 * N + 11) / 5.0)
    U = (6 * sum(r * r for r in ranks_b) - n2 * (N + 1) * (2 * N + 1)) / den
    V = (
        6 * sum((N + 1 - r) ** 2 for r in ranks_b)
        - n2 * (N + 1) * (2 * N + 1)
    ) / den
    rho = 2.0 * (N * N - 4) / ((2 * N + 1) * (8 * N + 11)) - 1.0
    C = (U * U + V * V - 2 * rho * U * V) / (2 * (1 - rho * rho))
    assert abs(out.c_stat - C) < 1e-9
    assert abs(out.p_value - math.exp(-C)) < 1e-8


def test_cucconi_fires_on_scale_only_change(spark):
    """Same median, different spread: mann_whitney-style shift tests
    stay quiet, Cucconi rejects."""
    from timeseriesutils_spark.operators.nonparam import cucconi_test

    center = 50.0
    wide = [center + (v - 30) * 1.5 for v in range(61)]
    narrow = [center + (v - 30) * 0.2 for v in range(61)]
    rows = [("g", "A", v) for v in wide] + [("g", "R", v) for v in narrow]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = cucconi_test(df, "v", "f", "A", "R", ["g"], scale=2).collect()[0]
    assert out.p_value < 0.01 and bool(out.reject_05) is True


# --- lepage_test ------------------------------------------------------------


def test_lepage_components_match_published_formulas(spark):
    """z_W against the tie-corrected Wilcoxon moments and z_AB against
    the Ansari conditional moments, on a tied sample; L = z_W²+z_AB²
    and p = exp(-L/2)."""
    import math

    from timeseriesutils_spark.operators.nonparam import lepage_test

    xa = [1.0, 3.0, 5.0, 5.0, 9.0, 11.0]
    xb = [4.0, 5.0, 6.0, 8.0]
    rows = [("g", "A", v) for v in xa] + [("g", "R", v) for v in xb]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = lepage_test(df, "v", "f", "A", "R", ["g"], scale=0).collect()[0]
    pooled = sorted(xa + xb)
    N, n1, n2 = len(pooled), len(xa), len(xb)

    def midrank(v):
        lo = sum(1 for x in pooled if x < v)
        t = sum(1 for x in pooled if x == v)
        return lo + (t + 1) / 2.0

    W = sum(midrank(v) for v in xb)
    from collections import Counter

    ties = Counter(pooled)
    tie_term = sum(t**3 - t for t in ties.values())
    varw = (n1 * n2 / 12.0) * ((N + 1) - tie_term / (N * (N - 1)))
    z_w = (W - n2 * (N + 1) / 2.0) / math.sqrt(varw)
    scores = [min(midrank(v), N + 1 - midrank(v)) for v in pooled]
    AB = sum(min(midrank(v), N + 1 - midrank(v)) for v in xb)
    sa, ssa = sum(scores), sum(s * s for s in scores)
    mean_ab = n2 * sa / N
    var_ab = n1 * n2 * (N * ssa - sa * sa) / (N * N * (N - 1))
    z_ab = (AB - mean_ab) / math.sqrt(var_ab)
    L = z_w * z_w + z_ab * z_ab
    assert abs(out.z_w - z_w) < 1e-9
    assert abs(out.z_ab - z_ab) < 1e-9
    assert abs(out.l_stat - L) < 1e-9
    assert abs(out.p_value - math.exp(-L / 2)) < 1e-8


# --- tost_equivalence -------------------------------------------------------


def test_tost_tight_arms_are_equivalent(spark):
    from timeseriesutils_spark.operators.stats import tost_equivalence

    import random

    rng = random.Random(6)
    rows = [("g", "A", 10.0 + rng.gauss(0, 0.5)) for _ in range(400)] + [
        ("g", "R", 10.05 + rng.gauss(0, 0.5)) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = tost_equivalence(
        df, "v", "f", "A", "R", ["g"], margin=0.5, scale=4
    ).collect()[0]
    assert abs(out.diff) < 0.2
    assert bool(out.equivalent_05) is True


def test_tost_large_difference_not_equivalent(spark):
    from timeseriesutils_spark.operators.stats import tost_equivalence

    rows = [("g", "A", 10.0 + (i % 5) / 10.0) for i in range(100)] + [
        ("g", "R", 12.0 + (i % 5) / 10.0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = tost_equivalence(
        df, "v", "f", "A", "R", ["g"], margin=0.5, scale=4
    ).collect()[0]
    assert out.diff > 1.5
    assert bool(out.equivalent_05) is False


def test_tost_nonsignificant_but_not_equivalent(spark):
    """The case TOST exists for: tiny samples — the welch difference is
    not significant AND equivalence cannot be claimed either."""
    from timeseriesutils_spark.operators.stats import tost_equivalence

    rows = [("g", "A", v) for v in (9.0, 11.0, 10.0)] + [
        ("g", "R", v) for v in (10.5, 12.5, 9.5)
    ]
    df = spark.createDataFrame(rows, ["g", "f", "v"])
    out = tost_equivalence(
        df, "v", "f", "A", "R", ["g"], margin=0.5, scale=4
    ).collect()[0]
    assert bool(out.equivalent_05) is False


# --- sequential_ab ----------------------------------------------------------


def test_sequential_ab_boundary_shape_and_null_effect(spark):
    """Identical arms: no look crosses; boundaries strictly decrease to
    z*(K) at the final look."""
    from timeseriesutils_spark.operators.analytics import sequential_ab

    rows = []
    for k in range(1, 6):
        for i in range(100):
            rows.append(("ctl", i < 20, k))
            rows.append(("trt", i < 20, k))
    df = spark.createDataFrame(rows, ["arm", "s", "wk"])
    out = sorted(
        sequential_ab(df, "arm", "ctl", "trt", "s", "wk").collect(),
        key=lambda r: r.look,
    )
    bounds = [r.boundary for r in out]
    assert all(a > b for a, b in zip(bounds, bounds[1:]))
    assert abs(bounds[-1] - 2.04) < 1e-12
    assert all(abs(r.z) < 1e-9 and bool(r.crossed) is False for r in out)
    # looks accumulate: n at look k = 200k
    assert [r.n_a + r.n_b for r in out] == [200 * k for k in range(1, 6)]


def test_sequential_ab_strong_effect_crosses_late_not_early(spark):
    """A moderate persistent lift: the strict early boundary holds at
    look 1 while a later look crosses — the OBF behavior that makes
    weekly peeking legitimate."""
    from timeseriesutils_spark.operators.analytics import sequential_ab

    rows = []
    for k in range(1, 6):
        for i in range(400):
            rows.append(("ctl", i < 80, k))      # 20%
            rows.append(("trt", i < 112, k))     # 28%
    df = spark.createDataFrame(rows, ["arm", "s", "wk"])
    out = {r.look: r for r in sequential_ab(
        df, "arm", "ctl", "trt", "s", "wk").collect()}
    assert bool(out[1].crossed) is False   # |z1| ~ 2.7 < 4.56
    assert bool(out[5].crossed) is True    # |z5| ~ 6 > 2.04
    assert out[5].z > 0


# --- cmh_test ---------------------------------------------------------------


def test_cmh_matches_hand_computation(spark):
    """Two strata with known 2x2 tables: CMH statistic, MH odds ratio,
    and the RBG CI against the published formulas."""
    import math

    from timeseriesutils_spark.operators.analytics import cmh_test

    # stratum 1: a=20 b=80 / c=10 d=90 ; stratum 2: a=30 b=20 / c=20 d=30
    rows = []
    rows += [("s1", "t", True)] * 20 + [("s1", "t", False)] * 80
    rows += [("s1", "c", True)] * 10 + [("s1", "c", False)] * 90
    rows += [("s2", "t", True)] * 30 + [("s2", "t", False)] * 20
    rows += [("s2", "c", True)] * 20 + [("s2", "c", False)] * 30
    df = spark.createDataFrame(rows, ["st", "arm", "y"])
    out = cmh_test(df, "arm", "t", "c", "y", "st").collect()[0]
    tables = [(20, 80, 10, 90), (30, 20, 20, 30)]
    sdev = sv = sr = ss = 0.0
    for a, b, c, d in tables:
        n = a + b + c + d
        sdev += a - (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        sr += a * d / n
        ss += b * c / n
    cmh = (abs(sdev) - 0.5) ** 2 / sv
    assert abs(out.cmh_stat - cmh) < 1e-6
    assert abs(out.or_mh - sr / ss) < 1e-9
    assert out.n_strata == 2 and out.n == 300
    assert out.or_lo95 < out.or_mh < out.or_hi95
    assert bool(out.reject_05) is (out.p_value < 0.05)


def test_cmh_defuses_simpsons_paradox(spark):
    """Arms identical WITHIN each stratum but exposure mix differs:
    the pooled rates differ (the paradox) while CMH sees no effect."""
    from timeseriesutils_spark.operators.analytics import cmh_test

    rows = []
    # stratum hi: 60% conversion, treatment over-represented
    rows += [("hi", "t", i < 120) for i in range(200)]
    rows += [("hi", "c", i < 30) for i in range(50)]
    # stratum lo: 10% conversion, control over-represented
    rows += [("lo", "t", i < 5) for i in range(50)]
    rows += [("lo", "c", i < 20) for i in range(200)]
    df = spark.createDataFrame(rows, ["st", "arm", "y"])
    out = cmh_test(df, "arm", "t", "c", "y", "st").collect()[0]
    # pooled rates: t = 125/250 = 50%, c = 50/250 = 20% — looks huge;
    # within-stratum ORs are exactly 1 -> CMH must not reject
    assert abs(out.or_mh - 1.0) < 1e-9
    assert bool(out.reject_05) is False


# --- woolf_test -------------------------------------------------------------


def test_woolf_matches_hand_computation(spark):
    import math

    from timeseriesutils_spark.operators.analytics import woolf_test

    rows = []
    rows += [("s1", "t", True)] * 20 + [("s1", "t", False)] * 80
    rows += [("s1", "c", True)] * 10 + [("s1", "c", False)] * 90
    rows += [("s2", "t", True)] * 30 + [("s2", "t", False)] * 20
    rows += [("s2", "c", True)] * 20 + [("s2", "c", False)] * 30
    df = spark.createDataFrame(rows, ["st", "arm", "y"])
    out = woolf_test(df, "arm", "t", "c", "y", "st").collect()[0]
    sw = swl = swl2 = 0.0
    for a, b, c, d in [(20, 80, 10, 90), (30, 20, 20, 30)]:
        a, b, c, d = a + 0.5, b + 0.5, c + 0.5, d + 0.5
        lo = math.log(a * d / (b * c))
        w = 1.0 / (1 / a + 1 / b + 1 / c + 1 / d)
        sw += w
        swl += w * lo
        swl2 += w * lo * lo
    x2 = swl2 - swl * swl / sw
    assert abs(out.woolf_stat - x2) < 1e-6
    assert out.df == 1 and out.n_strata == 2


def test_woolf_homogeneous_strata_accept(spark):
    """Same within-stratum OR everywhere -> homogeneity not rejected."""
    from timeseriesutils_spark.operators.analytics import woolf_test

    rows = []
    for st, scalef in (("s1", 1), ("s2", 2), ("s3", 3)):
        rows += [(st, "t", True)] * (40 * scalef)
        rows += [(st, "t", False)] * (60 * scalef)
        rows += [(st, "c", True)] * (20 * scalef)
        rows += [(st, "c", False)] * (80 * scalef)
    df = spark.createDataFrame(rows, ["st", "arm", "y"])
    out = woolf_test(df, "arm", "t", "c", "y", "st").collect()[0]
    assert out.woolf_stat < 2.0
    assert bool(out.homogeneous_05) is True


def test_woolf_heterogeneous_strata_reject(spark):
    """Effect reverses direction between strata -> homogeneity
    rejected (the case where CMH's pooled OR would be misleading)."""
    from timeseriesutils_spark.operators.analytics import woolf_test

    rows = []
    rows += [("s1", "t", True)] * 80 + [("s1", "t", False)] * 20
    rows += [("s1", "c", True)] * 20 + [("s1", "c", False)] * 80
    rows += [("s2", "t", True)] * 20 + [("s2", "t", False)] * 80
    rows += [("s2", "c", True)] * 80 + [("s2", "c", False)] * 20
    df = spark.createDataFrame(rows, ["st", "arm", "y"])
    out = woolf_test(df, "arm", "t", "c", "y", "st").collect()[0]
    assert out.woolf_stat > 30
    assert bool(out.homogeneous_05) is False


# --- fleiss_kappa -----------------------------------------------------------


def test_fleiss_matches_textbook_example(spark):
    """Direct check against the published formulas on a small panel
    (3 items x 4 raters, 2 categories) plus an unbalanced item that
    must be excluded and counted."""
    from timeseriesutils_spark.operators.stats import fleiss_kappa

    ratings = {
        "i1": ["a", "a", "a", "b"],
        "i2": ["a", "b", "b", "b"],
        "i3": ["a", "a", "b", "b"],
        "i4": ["a", "a"],  # only 2 raters -> excluded
    }
    rows = [("g", it, c) for it, cs in ratings.items() for c in cs]
    df = spark.createDataFrame(rows, ["g", "item", "cat"])
    out = fleiss_kappa(df, "item", "cat", 4, ["g"]).collect()[0]
    inc = {k: v for k, v in ratings.items() if len(v) == 4}
    N, n = len(inc), 4
    ssq = sum(
        sum(cs.count(c) ** 2 for c in set(cs)) for cs in inc.values()
    )
    p_bar = (ssq - N * n) / (N * n * (n - 1))
    from collections import Counter

    tot = Counter(c for cs in inc.values() for c in cs)
    p_e = sum((v / (N * n)) ** 2 for v in tot.values())
    kappa = (p_bar - p_e) / (1 - p_e)
    assert out.n_items == 3 and out.n_excluded == 1
    assert abs(out.p_bar - p_bar) < 1e-12
    assert abs(out.p_e - p_e) < 1e-12
    assert abs(out.kappa - kappa) < 1e-12


def test_fleiss_perfect_agreement_is_one(spark):
    from timeseriesutils_spark.operators.stats import fleiss_kappa

    rows = [("g", f"i{k}", "a" if k % 2 else "b") for k in range(10)
            for _ in range(3)]
    df = spark.createDataFrame(rows, ["g", "item", "cat"])
    out = fleiss_kappa(df, "item", "cat", 3, ["g"]).collect()[0]
    assert abs(out.kappa - 1.0) < 1e-12 and abs(out.p_bar - 1.0) < 1e-12
