"""Tests for the round-7 nonparametric battery (operators/nonparam.py):
numpy mirrors for KS / Kruskal–Wallis / Spearman, a hand-worked BH-FDR
step-up case, and the p-value kernel's monotonicity/range laws."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.nonparam import (
    bh_fdr,
    kruskal_wallis,
    ks_test,
    spearman_corr,
    two_sided_p_expr,
)


def _two_sample_df(spark, xs_a, xs_b):
    rows = [("g", "A", float(x)) for x in xs_a] + [
        ("g", "B", float(x)) for x in xs_b
    ]
    return spark.createDataFrame(rows, "g string, lvl string, v double")


# --- numpy mirrors --------------------------------------------------------


def _ks_numpy(a, b, scale=2):
    m = 10**scale
    qa = np.floor(np.asarray(a, dtype="float64") * m + 0.5).astype("int64")
    qb = np.floor(np.asarray(b, dtype="float64") * m + 0.5).astype("int64")
    vals = np.unique(np.concatenate([qa, qb]))
    fa = np.searchsorted(np.sort(qa), vals, side="right") / len(qa)
    fb = np.searchsorted(np.sort(qb), vals, side="right") / len(qb)
    return float(np.max(np.abs(fa - fb)))


def _avg_ranks(q):
    """Average ranks (1-based) of a quantized vector, ties averaged."""
    q = np.asarray(q)
    order = np.argsort(q, kind="mergesort")
    ranks = np.empty(len(q), dtype="float64")
    i = 0
    while i < len(q):
        j = i
        while j < len(q) and q[order[j]] == q[order[i]]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    return ranks


def _kw_numpy(groups, scale=2):
    """groups: list of 1-d arrays; returns tie-corrected H."""
    m = 10**scale
    qs = [
        np.floor(np.asarray(g, dtype="float64") * m + 0.5).astype("int64")
        for g in groups
    ]
    allq = np.concatenate(qs)
    ranks = _avg_ranks(allq)
    n = len(allq)
    h = 0.0
    start = 0
    for g in qs:
        r = ranks[start : start + len(g)].sum()
        h += r * r / len(g)
        start += len(g)
    h = 12.0 / (n * (n + 1)) * h - 3.0 * (n + 1)
    _, counts = np.unique(allq, return_counts=True)
    corr = 1.0 - (counts.astype("float64") ** 3 - counts).sum() / (
        float(n) ** 3 - n
    )
    return h / corr if corr != 0 else float("nan")


def _spearman_numpy(x, y, scale=2):
    m = 10**scale
    qx = np.floor(np.asarray(x, dtype="float64") * m + 0.5).astype("int64")
    qy = np.floor(np.asarray(y, dtype="float64") * m + 0.5).astype("int64")
    rx, ry = _avg_ranks(qx), _avg_ranks(qy)
    rx = rx - rx.mean()
    ry = ry - ry.mean()
    denom = math.sqrt((rx * rx).sum() * (ry * ry).sum())
    return float((rx * ry).sum() / denom) if denom > 0 else None


# --- KS -------------------------------------------------------------------


def test_ks_identical_distributions_zero(spark):
    xs = [1.0, 2.0, 3.0, 4.0, 5.0] * 4
    out = ks_test(
        _two_sample_df(spark, xs, xs), "v", "lvl", "A", "B", ["g"]
    ).collect()[0]
    assert out["d_stat"] == 0.0
    assert out["ks_stat"] == 0.0
    assert not out["reject_05"]


def test_ks_disjoint_supports_one(spark):
    out = ks_test(
        _two_sample_df(spark, [1.0, 2.0, 3.0], [10.0, 11.0, 12.0]),
        "v", "lvl", "A", "B", ["g"],
    ).collect()[0]
    assert out["d_stat"] == 1.0


def test_ks_matches_numpy_mirror(spark):
    rng = np.random.RandomState(7)
    a = rng.normal(0, 1, 200).round(2)
    b = rng.normal(0.5, 1.3, 150).round(2)
    out = ks_test(
        _two_sample_df(spark, a, b), "v", "lvl", "A", "B", ["g"]
    ).collect()[0]
    assert out["n_a"] == 200 and out["n_b"] == 150
    assert out["d_stat"] == pytest.approx(_ks_numpy(a, b), abs=1e-12)


def test_ks_reject_flag_on_shifted_sample(spark):
    rng = np.random.RandomState(3)
    a = rng.normal(0, 1, 300).round(2)
    b = (rng.normal(0, 1, 300) + 1.5).round(2)
    out = ks_test(
        _two_sample_df(spark, a, b), "v", "lvl", "A", "B", ["g"]
    ).collect()[0]
    assert out["reject_05"]


def test_ks_ignores_other_levels_and_nulls(spark):
    rows = (
        [("g", "A", 1.0), ("g", "A", 2.0), ("g", "B", 1.0), ("g", "B", 2.0)]
        + [("g", "C", 99.0), ("g", "A", None)]
    )
    df = spark.createDataFrame(rows, "g string, lvl string, v double")
    out = ks_test(df, "v", "lvl", "A", "B", ["g"]).collect()[0]
    assert out["n_a"] == 2 and out["n_b"] == 2
    assert out["d_stat"] == 0.0


# --- Kruskal–Wallis -------------------------------------------------------


def _kw_df(spark, groups):
    rows = []
    for lvl, xs in groups.items():
        rows += [("g", lvl, float(x)) for x in xs]
    return spark.createDataFrame(rows, "g string, lvl string, v double")


def test_kw_matches_numpy_mirror(spark):
    rng = np.random.RandomState(11)
    gs = {
        "a": rng.normal(0, 1, 80).round(2),
        "b": rng.normal(0.4, 1, 90).round(2),
        "c": rng.normal(-0.2, 2, 70).round(2),
    }
    out = kruskal_wallis(_kw_df(spark, gs), "v", "lvl", ["g"]).collect()[0]
    expect = _kw_numpy([gs["a"], gs["b"], gs["c"]])
    assert out["k_levels"] == 3 and out["n"] == 240 and out["df"] == 2
    # the engine floors per-level R²/4n contributions (≤ k units of H
    # numerator error at the 12/(N(N+1)) scale)
    tol = 3 * 12.0 / (240 * 241) + 1e-9
    assert out["h_corrected"] == pytest.approx(expect, abs=tol)


def test_kw_identical_groups_near_zero(spark):
    xs = list(range(1, 31))
    out = kruskal_wallis(
        _kw_df(spark, {"a": xs, "b": xs, "c": xs}), "v", "lvl", ["g"]
    ).collect()[0]
    assert abs(out["h_corrected"]) < 0.01


def test_kw_single_level_null_stat(spark):
    out = kruskal_wallis(
        _kw_df(spark, {"a": [1.0, 2.0, 3.0]}), "v", "lvl", ["g"]
    ).collect()[0]
    assert out["h_stat"] is None and out["h_corrected"] is None


def test_kw_monotone_transform_invariance(spark):
    """Ranks see only order: exp-transforming the values (then
    re-quantizing at a fine scale) must keep H within quantization
    noise.  Uses integer-spaced values so quantization cannot merge
    distinct values under the transform."""
    rng = np.random.RandomState(5)
    gs = {lvl: rng.permutation(40)[:20] * 1.0 for lvl in ("a", "b", "c")}
    h1 = kruskal_wallis(_kw_df(spark, gs), "v", "lvl", ["g"]).collect()[0][
        "h_corrected"
    ]
    gs2 = {lvl: np.exp(xs / 10.0) for lvl, xs in gs.items()}
    h2 = kruskal_wallis(
        _kw_df(spark, gs2), "v", "lvl", ["g"], scale=6
    ).collect()[0]["h_corrected"]
    assert h1 == pytest.approx(h2, abs=1e-3)


# --- Spearman -------------------------------------------------------------


def _xy_df(spark, xs, ys):
    return spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in zip(xs, ys)],
        "g string, x double, y double",
    )


def test_spearman_perfect_monotone(spark):
    xs = np.arange(1.0, 21.0)
    ys = np.exp(xs / 5.0).round(2)  # nonlinear but strictly increasing
    out = spearman_corr(_xy_df(spark, xs, ys), "x", "y", ["g"]).collect()[0]
    assert out["rho"] == pytest.approx(1.0, abs=1e-12)


def test_spearman_reversed_is_minus_one(spark):
    xs = np.arange(1.0, 16.0)
    out = spearman_corr(_xy_df(spark, xs, xs[::-1]), "x", "y", ["g"]).collect()[0]
    assert out["rho"] == pytest.approx(-1.0, abs=1e-12)


def test_spearman_matches_numpy_with_ties(spark):
    rng = np.random.RandomState(13)
    xs = rng.randint(0, 15, 120) / 2.0  # heavy ties
    ys = (xs * 3 + rng.normal(0, 2, 120)).round(2)
    out = spearman_corr(_xy_df(spark, xs, ys), "x", "y", ["g"]).collect()[0]
    assert out["n"] == 120
    assert out["rho"] == pytest.approx(_spearman_numpy(xs, ys), rel=1e-12)


def test_spearman_constant_column_null(spark):
    xs = np.ones(10)
    ys = np.arange(10.0)
    out = spearman_corr(_xy_df(spark, xs, ys), "x", "y", ["g"]).collect()[0]
    assert out["rho"] is None


# --- p-value kernel -------------------------------------------------------


def test_two_sided_p_kernel_laws(spark):
    zs = [0.0, 0.5, 1.0, 1.96, 2.5758, 4.0, -1.96, 30.0]
    df = spark.createDataFrame([(float(z),) for z in zs], "z double")
    got = {
        r["z"]: r["p"]
        for r in df.select("z", two_sided_p_expr(F.col("z")).alias("p")).collect()
    }
    assert got[0.0] == 1.0
    assert got[1.96] == pytest.approx(0.05, abs=2e-3)   # |err| < 1.4e-4 on Phi
    assert got[2.5758] == pytest.approx(0.01, abs=1e-3)
    assert got[-1.96] == got[1.96]                      # symmetric
    assert got[30.0] == 0.0                             # overflow-safe
    ordered = [got[z] for z in (0.0, 0.5, 1.0, 1.96, 2.5758, 4.0)]
    assert ordered == sorted(ordered, reverse=True)     # monotone in |z|


# --- BH-FDR ---------------------------------------------------------------


def test_bh_fdr_hand_worked_case(spark):
    """Hand-worked m=6, alpha=0.1 (thresholds i/60): rank 2's p=0.04 >
    2/60 fails its own threshold but is RESCUED by the step-up (rank 3
    hits 0.05 <= 3/60 exactly — boundary equality — and rank 4's
    0.055 <= 4/60 sets k*=4); ranks 5-6 stay accepted."""
    ps = [0.008, 0.04, 0.05, 0.055, 0.3, 0.9]
    df = spark.createDataFrame(
        [(f"t{i}", p) for i, p in enumerate(ps)], "test string, p double"
    )
    rows = bh_fdr(df, "p", ["test"], alpha=0.1).collect()
    assert [r["rank"] for r in rows] == list(range(1, 7))
    rejected = {r["test"] for r in rows if r["reject"]}
    assert rejected == {"t0", "t1", "t2", "t3"}
    # q-values are the reverse running min of m*p/rank, capped at 1
    mq = [6 * p / (i + 1) for i, p in enumerate(ps)]
    expect_q = [min(mq[i:]) for i in range(6)]
    for r, eq in zip(rows, expect_q):
        assert r["q_value"] == pytest.approx(min(eq, 1.0), abs=1e-9)


def test_bh_fdr_no_rejections(spark):
    df = spark.createDataFrame(
        [(f"t{i}", 0.5 + i / 100.0) for i in range(5)], "test string, p double"
    )
    rows = bh_fdr(df, "p", ["test"], alpha=0.05).collect()
    assert not any(r["reject"] for r in rows)
    assert all(r["m"] == 5 for r in rows)


def test_bh_fdr_all_tiny_rejects_all(spark):
    df = spark.createDataFrame(
        [(f"t{i}", 1e-6) for i in range(8)], "test string, p double"
    )
    rows = bh_fdr(df, "p", ["test"], alpha=0.05).collect()
    assert all(r["reject"] for r in rows)


def test_bh_fdr_skips_null_p(spark):
    df = spark.createDataFrame(
        [("a", 0.001), ("b", None), ("c", 0.9)], "test string, p double"
    )
    rows = bh_fdr(df, "p", ["test"], alpha=0.05).collect()
    assert len(rows) == 2 and all(r["m"] == 2 for r in rows)
