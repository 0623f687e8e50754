"""Unit tests for the round-4 audit/flow operators: seasonal_zscore,
event_transitions, fk_audit, benford_audit."""

import math

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.analytics import event_transitions
from timeseriesutils_spark.operators.forecast import seasonal_zscore
from timeseriesutils_spark.operators.profile import benford_audit, fk_audit


def test_seasonal_zscore_strata(spark):
    # Mondays (2024-01-01/08/15/22/29) valued ~100, one outlier 200;
    # stratum mean/std computed within Mondays only
    rows = [
        ("g", "2024-01-01", 100.0),
        ("g", "2024-01-08", 102.0),
        ("g", "2024-01-15", 98.0),
        ("g", "2024-01-22", 100.0),
        ("g", "2024-01-29", 200.0),
        # Tuesdays: constant -> zero variance -> NULL z
        ("g", "2024-01-02", 7.0),
        ("g", "2024-01-09", 7.0),
        ("g", "2024-01-16", 7.0),
        ("g", "2024-01-23", 7.0),
        ("g", "2024-01-30", 7.0),
    ]
    df = spark.createDataFrame(rows, "g string, d string, v double")
    out = seasonal_zscore(df, "v", "d", ["g"], threshold=1.5, scale=0, min_n=5)
    got = {(r.d): r for r in out.collect()}
    assert all(got[d].isodow == 1 for d in ("2024-01-01", "2024-01-29"))
    # Monday stratum: q = [100,102,98,100,200], mean=120, var=1600.8
    q = [100, 102, 98, 100, 200]
    mean = sum(q) / 5
    var = sum(x * x for x in q) / 5 - mean * mean
    expect = (200 - mean) / math.sqrt(var)
    assert got["2024-01-29"].seasonal_z == pytest.approx(expect, rel=1e-12)
    assert got["2024-01-29"].is_seasonal_anomaly is True
    assert got["2024-01-01"].is_seasonal_anomaly is False
    # zero-variance stratum -> NULLs
    assert got["2024-01-02"].seasonal_z is None
    assert got["2024-01-02"].is_seasonal_anomaly is None


def test_event_transitions_counts_probs(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),   # a->b, b->a
        (2, 1, "a"), (2, 2, "b"), (2, 3, "b"),   # a->b, b->b
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string")
    df = df.withColumn("ts", F.col("event_id").cast("timestamp"))
    out = {(r.from_type, r.to_type): r for r in event_transitions(df).collect()}
    assert out[("a", "b")].n_transitions == 2
    assert out[("a", "b")].prob == 1.0
    assert out[("b", "a")].n_transitions == 1
    assert out[("b", "a")].prob == 0.5
    assert out[("b", "b")].prob == 0.5
    assert ("a", "a") not in out


def test_fk_audit_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = fk_audit([("c->p", child, "fk", parent, "pk")]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.edge == "c->p"
    assert r.child_rows == 5
    assert r.distinct_keys == 3          # 1, 2, 99 (NULL excluded)
    assert r.null_keys == 1
    assert r.orphan_rows == 1            # 99


def test_benford_digit_extraction(spark):
    # values whose first significant digits are known after scale=0
    # quantization; includes a log10-boundary value (1000.0)
    vals = [1000.0, 999.4, 123.0, 0.0, -5.0, 2.0, 25.0, 2500.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r.digit: r for r in benford_audit(df, "v", scale=0).collect()}
    # positive values only: 1000->1, 999->9, 123->1, 2->2, 25->2, 2500->2
    assert out[1].n_obs == 2
    assert out[9].n_obs == 1
    assert out[2].n_obs == 3
    total = 6.0
    assert out[2].obs_frac == pytest.approx(3 / total)
    assert out[1].benford_frac == pytest.approx(math.log10(2.0), rel=1e-15)
    chi = total * (3 / total - math.log10(1.5)) ** 2 / math.log10(1.5)
    assert out[2].chi2_term == pytest.approx(chi, rel=1e-12)


def test_categorical_assoc_independent_and_dependent(spark):
    import math as m

    from timeseriesutils_spark.operators.stats import categorical_assoc

    # perfectly dependent: y == x -> V = 1, MI = ln(2) for a 50/50 split
    rows = [("a", "a")] * 10 + [("b", "b")] * 10
    df = spark.createDataFrame(rows, "x string, y string")
    r = categorical_assoc(df, "x", "y").collect()[0]
    assert (r.n, r.nx_cats, r.ny_cats, r.dof) == (20, 2, 2, 1)
    assert r.cramers_v == pytest.approx(1.0, abs=1e-6)
    assert r.mi == pytest.approx(m.log(2), abs=1e-6)
    # independent uniform: chi2 = 0, MI = 0
    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(5)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = categorical_assoc(df, "x", "y").collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)
    assert r.mi == pytest.approx(0.0, abs=1e-6)


def test_value_entropy_uniform_vs_spike(spark):
    import math as m

    from timeseriesutils_spark.operators.stats import value_entropy

    rows = [("u", float(i % 8)) for i in range(80)]          # uniform 8 bins
    rows += [("s", 1.0)] * 80                                 # one spike
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in value_entropy(df, "v", ["g"], bin_width=1.0, scale=2).collect()}
    assert out["u"].n_bins == 8
    assert out["u"].entropy == pytest.approx(m.log(8), abs=1e-6)
    assert out["u"].entropy_norm == pytest.approx(1.0, abs=1e-6)
    assert out["s"].n_bins == 1
    assert out["s"].entropy == pytest.approx(0.0, abs=1e-9)
    assert out["s"].entropy_norm is None


def test_psi_drift_identical_vs_shifted(spark):
    import math as m

    from timeseriesutils_spark.operators.profile import psi_drift

    # identical distributions -> psi ~ 0; shifted -> clearly positive
    rows = []
    for i in range(100):
        for isb in (False, True):
            rows.append(("same", float(i % 10), isb))
            rows.append(("shift", float(i % 10) + (5.0 if isb else 0.0), isb))
    df = spark.createDataFrame(rows, "g string, v double, isb boolean")
    out = {
        r.g: r
        for r in psi_drift(
            df, "v", F.col("isb"), ["g"], bin_width=1.0, scale=0
        ).collect()
    }
    assert out["same"].n_a == 100 and out["same"].n_b == 100
    assert out["same"].psi == pytest.approx(0.0, abs=1e-9)
    assert out["shift"].psi > 1.0
    # manual check on the shifted group: A occupies bins 0-9, B bins 5-14
    k = out["shift"].n_bins
    assert k == 15
    pa = {b: (10 if b < 10 else 0) for b in range(15)}
    pb = {b: (10 if b >= 5 else 0) for b in range(15)}
    psi = 0.0
    for b in range(15):
        qa = (pa[b] + 0.5) / (100 + 0.5 * k)
        qb = (pb[b] + 0.5) / (100 + 0.5 * k)
        psi += m.floor((qa - qb) * m.log(qa / qb) * 1e9 + 0.5) / 1e9
    assert out["shift"].psi == pytest.approx(psi, abs=1e-9)


def test_categorical_assoc_excludes_nulls(spark):
    from timeseriesutils_spark.operators.stats import categorical_assoc

    rows = [("a", "a")] * 5 + [("b", "b")] * 5 + [(None, "a"), ("a", None)]
    df = spark.createDataFrame(rows, "x string, y string")
    r = categorical_assoc(df, "x", "y").collect()[0]
    assert (r.n, r.nx_cats, r.ny_cats, r.dof) == (10, 2, 2, 1)
    assert r.cramers_v == pytest.approx(1.0, abs=1e-6)


def test_snapshot_diff_classifies(spark):
    from timeseriesutils_spark.operators.stats import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 99.0), (4, "D", 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "changed", 5: "added"}


def test_snapshot_diff_identical_is_empty(spark):
    from timeseriesutils_spark.operators.stats import snapshot_diff

    df = spark.createDataFrame([(1, "a", 1.5), (2, None, None)], "k long, s string, v double")
    assert snapshot_diff(df, df, ["k"]).count() == 0


def test_snapshot_diff_narrow_shuffle(spark):
    # the exchanges must carry only (key, hash) — never payload columns
    from timeseriesutils_spark.operators.stats import snapshot_diff

    old = spark.range(100).selectExpr(
        "id AS k", "CAST(id AS STRING) AS payload_a", "id * 1.5 AS payload_b"
    )
    new = old.withColumn("payload_b", F.col("payload_b") + 1)
    plan = snapshot_diff(old, new, ["k"])._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload_a" not in line and "payload_b" not in line


def test_constraint_audit_kinds(spark):
    from timeseriesutils_spark.operators.profile import constraint_audit

    df = spark.createDataFrame(
        [
            (1, "A", 10.0, 100),
            (2, "A", -5.0, 100),   # range violation
            (2, "B", 20.0, None),  # duplicate key + null fk
            (3, "X", 30.0, 999),   # domain violation + orphan fk
            (4, None, None, 100),  # in_set/range ignore NULL (not_null col is 's')
        ],
        "k long, s string, v double, fk int",
    )
    dim = spark.createDataFrame([(100,), (200,)], "d int")
    spec = [
        {"name": "k_unique", "kind": "unique", "cols": ["k"]},
        {"name": "s_not_null", "kind": "not_null", "col": "s"},
        {"name": "s_domain", "kind": "in_set", "col": "s", "values": ["A", "B"]},
        {"name": "v_range", "kind": "range", "col": "v", "lo": 0.0, "hi": 25.0},
        {"name": "fk_dim", "kind": "fk", "col": "fk", "dim": "d", "dim_col": "d"},
    ]
    out = {r.constraint_name: r for r in
           constraint_audit(df, spec, dims={"d": dim}).collect()}
    assert out["k_unique"].violations == 1 and not out["k_unique"]["pass"]
    assert out["s_not_null"].violations == 1
    assert out["s_domain"].violations == 1          # NULL s not counted here
    assert out["v_range"].violations == 2           # -5 and 30
    assert out["fk_dim"].violations == 1            # 999; NULL fk not an orphan
    assert all(r.total == 5 for r in out.values())


def test_constraint_audit_clean_passes(spark):
    from timeseriesutils_spark.operators.profile import constraint_audit

    df = spark.createDataFrame([(1, "A"), (2, "B")], "k long, s string")
    spec = [
        {"name": "k_unique", "kind": "unique", "cols": ["k"]},
        {"name": "s_not_null", "kind": "not_null", "col": "s"},
    ]
    out = constraint_audit(df, spec).collect()
    assert all(r["pass"] and r.violations == 0 for r in out)


def test_gini_extremes(spark):
    from timeseriesutils_spark.operators.stats import gini_index

    rows = [("even", 10.0, i) for i in range(4)] + [
        ("skew", 0.0, 1), ("skew", 0.0, 2), ("skew", 0.0, 3), ("skew", 100.0, 4),
    ]
    df = spark.createDataFrame(rows, "g string, v double, k long")
    out = {r.g: r for r in gini_index(df, ["g"], "v", "k").collect()}
    assert out["even"].gini == pytest.approx(0.0, abs=1e-12)
    # one holder of everything among n=4 -> G = (n-1)/n = 0.75
    assert out["skew"].gini == pytest.approx(0.75, rel=1e-12)
    assert out["skew"].total == pytest.approx(100.0)


def test_weighted_median_pulls_toward_weight(spark):
    from timeseriesutils_spark.operators.stats import weighted_median

    rows = [
        ("g", 1.0, 1.0, 1),
        ("g", 2.0, 1.0, 2),
        ("g", 10.0, 8.0, 3),  # heavy weight at 10 -> weighted median = 10
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double, k long")
    r = weighted_median(df, ["g"], "v", "w", "k").collect()[0]
    assert r.wmedian == 10.0 and r.weight_total == 10.0 and r.n == 3
    # unweighted sanity: equal weights -> lower median of {1,2,10} = 2
    df2 = df.withColumn("w", F.lit(1.0))
    assert weighted_median(df2, ["g"], "v", "w", "k").collect()[0].wmedian == 2.0


def test_bootstrap_ci_matches_analytic_se(spark):
    from timeseriesutils_spark.operators.bootstrap import bootstrap_mean_ci

    # values 0..999 repeated: sd ~= 288.67, n = 4000 -> se ~= 4.56
    rows = [(i, float(i % 1000)) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, v double")
    r = bootstrap_mean_ci(df, "v", "id", replicates=32).collect()[0]
    import math
    sd = math.sqrt(sum((x - 499.5) ** 2 for x in range(1000)) / 1000)
    se_analytic = sd / math.sqrt(4000)
    assert r.n == 4000 and abs(r.mean - 499.5) < 1e-9
    assert 0.5 * se_analytic < r.boot_se < 2.0 * se_analytic
    assert r.ci_lo < r.mean < r.ci_hi


def test_bootstrap_ci_partition_invariant(spark):
    from timeseriesutils_spark.operators.bootstrap import bootstrap_mean_ci

    rows = [(i, float((i * 7) % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double")
    a = bootstrap_mean_ci(df.coalesce(1), "v", "id").collect()[0]
    b = bootstrap_mean_ci(df.repartition(16), "v", "id").collect()[0]
    assert (a.mean, a.boot_se, a.ci_lo, a.ci_hi) == (b.mean, b.boot_se, b.ci_lo, b.ci_hi)


def test_anova_oneway_matches_manual(spark):
    from timeseriesutils_spark.operators.stats import anova_oneway

    groups = {"a": [10.0, 12.0, 11.0, 13.0], "b": [20.0, 22.0, 21.0, 23.0],
              "c": [10.5, 11.5, 12.5, 13.5]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "v", "g").collect()[0]
    allv = [v for vs in groups.values() for v in vs]
    mu = sum(allv) / len(allv)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - mu) ** 2 for vs in groups.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs)
    k, n = 3, 12
    assert r.k_levels == k and r.n == n
    assert r.ss_between == pytest.approx(ssb, rel=1e-6)
    assert r.ss_within == pytest.approx(ssw, rel=1e-6)
    assert r.f_stat == pytest.approx((ssb / (k - 1)) / (ssw / (n - k)), rel=1e-6)
    assert r.eta_sq == pytest.approx(ssb / (ssb + ssw), rel=1e-6)


def test_anova_no_effect_small_f(spark):
    from timeseriesutils_spark.operators.stats import anova_oneway

    rows = [("g%d" % (i % 3), float(i % 10)) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "v", "g").collect()[0]
    assert r.f_stat < 1.0 and r.eta_sq < 0.01  # identical distributions


def test_bootstrap_arrow_equals_expr(spark):
    # the vectorized partial-sum kernel and the pure-expression form
    # compute the same exact integers -> bit-identical intervals
    from timeseriesutils_spark.operators.bootstrap import bootstrap_mean_ci

    rows = [(i, float((i * 13) % 101) + 0.25) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v double")
    a = bootstrap_mean_ci(df, "v", "id", engine="arrow").collect()[0]
    b = bootstrap_mean_ci(df, "v", "id", engine="expr").collect()[0]
    assert tuple(a) == tuple(b)


def test_business_days_against_numpy(spark):
    import numpy as np

    from timeseriesutils_spark.operators.busdays import business_days_between

    pairs = [
        ("2024-01-01", "2024-01-08"),  # Mon -> next Mon
        ("2024-01-05", "2024-01-06"),  # Fri -> Sat
        ("2024-01-06", "2024-01-07"),  # Sat -> Sun
        ("2024-01-01", "2024-01-31"),
        ("2024-02-29", "2024-03-04"),
        ("2024-01-10", "2024-01-10"),  # empty interval
    ]
    df = spark.createDataFrame(pairs, "d1 string, d2 string")
    out = df.select(
        "d1", "d2", business_days_between(F.col("d1"), F.col("d2")).alias("bd")
    ).collect()
    for r in out:
        # numpy counts [d1, d2); ours counts (d1, d2] — shift both by 1 day
        want = int(np.busday_count(
            (np.datetime64(r.d1) + 1), (np.datetime64(r.d2) + 1)
        ))
        assert r.bd == want, (r.d1, r.d2, r.bd, want)


def test_business_days_holidays(spark):
    from timeseriesutils_spark.operators.busdays import business_days_between

    df = spark.createDataFrame([("2023-12-22", "2023-12-27")], "d1 string, d2 string")
    # (Fri, Wed]: Mon 25, Tue 26, Wed 27 = 3 business days; Christmas Mon off -> 2
    plain = df.select(business_days_between(F.col("d1"), F.col("d2")).alias("b")).collect()[0].b
    hol = df.select(
        business_days_between(F.col("d1"), F.col("d2"), holidays=("2023-12-25", "2023-12-23")).alias("b")
    ).collect()[0].b
    assert plain == 3 and hol == 2  # the Saturday "holiday" is a no-op


def test_corr_matrix_known_values(spark):
    from timeseriesutils_spark.operators.profile import corr_matrix

    rows = [(float(i), 2.0 * i + 1.0, float((i * 7) % 5), 3.0) for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    out = {(r.col_a, r.col_b): r.corr for r in
           corr_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert out[("a", "b")] == pytest.approx(1.0, abs=1e-9)   # exact line
    assert abs(out[("a", "c")]) < 0.3                         # ~uncorrelated
    assert out[("a", "d")] is None                            # constant col
    assert len(out) == 6


def test_fd_audit_holds_and_violates(spark):
    from timeseriesutils_spark.operators.profile import fd_audit

    rows = [(1, "x", 10), (1, "x", 11), (2, "y", 20), (2, "z", 21)]
    df = spark.createDataFrame(rows, "k long, s string, v long")
    out = {(r.determinant, r.dependent): r for r in
           fd_audit(df, [("k", "s"), ("k", "v")]).collect()}
    assert out[("k", "s")].violating_keys == 1 and not out[("k", "s")].holds
    assert out[("k", "v")].violating_keys == 2


def test_id_gap_audit_ranges(spark):
    from timeseriesutils_spark.operators.profile import id_gap_audit

    df = spark.createDataFrame([(i,) for i in [1, 2, 5, 6, 10]], "k long")
    out = sorted(id_gap_audit(df, "k").collect(), key=lambda r: r.gap_start)
    assert [(r.gap_start, r.gap_end, r.missing) for r in out] == [
        (3, 4, 2), (7, 9, 3),
    ]
    # dense sequence: no gaps
    dense = spark.createDataFrame([(i,) for i in range(1, 20)], "k long")
    assert id_gap_audit(dense, "k").count() == 0


def test_gini_weighted_median_gmean_ignore_nulls(spark):
    """NULL values are complete-case-filtered everywhere a COUNT pairs
    with NULL-skipping sums (ADVICE-r4 class, extended in round 5)."""
    from timeseriesutils_spark.operators.stats import (
        gini_index,
        gmean_exact,
        weighted_median,
    )

    clean = [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4])]
    dirty = clean + [("a", 99, None)]
    dc = spark.createDataFrame(clean, "g string, id long, v double")
    dd = spark.createDataFrame(dirty, "g string, id long, v double")
    assert gini_index(dc, ["g"], "v", "id").collect() == \
           gini_index(dd, ["g"], "v", "id").collect()
    assert gmean_exact(dc, "v", ["g"]).collect() == \
           gmean_exact(dd, "v", ["g"]).collect()
    wc = dc.withColumn("w", dc.v)
    wd = dd.withColumn("w", dd.v)
    assert weighted_median(wc, ["g"], "v", "w", "id").collect() == \
           weighted_median(wd, ["g"], "v", "w", "id").collect()


def test_psi_drift_curve_stable_vs_shifted(spark):
    """Baseline-identical periods score ~0 PSI; a shifted period scores
    high; the curve has one row per evaluation period."""
    from timeseriesutils_spark.operators.profile import psi_drift_curve

    rows = []
    for m in range(4):   # baseline months 0-3: values 0..99
        rows += [(m, float(v % 100)) for v in range(500)]
    rows += [(4, float(v % 100)) for v in range(500)]     # same dist
    rows += [(5, float(v % 100) + 500.0) for v in range(500)]  # shifted
    df = spark.createDataFrame(rows, "m long, v double")
    out = {r.period: r for r in psi_drift_curve(
        df, "v", "m", baseline_end=4, bin_width=10.0
    ).collect()}
    assert set(out) == {4, 5}
    assert out[4].n_b == 500 and out[4].n_a == 2000
    assert abs(out[4].psi) < 0.01
    assert out[5].psi > 1.0
    # disjoint supports: bin universe covers both sides
    assert out[5].n_bins == 20


def test_quantile_transform_midrank_and_nulls(spark):
    from timeseriesutils_spark.operators.stats import quantile_transform
    from pyspark.sql import functions as F

    rows = [("a", 1, 30.0), ("a", 2, 10.0), ("a", 3, 20.0), ("a", 4, None)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = {r.id: r.v_qt for r in quantile_transform(
        df, "v", ["g"], F.col("id")
    ).collect()}
    # observed ranks: 10->1, 20->2, 30->3 of n=3 -> (r-0.5)/3
    assert out[2] == pytest.approx(0.5 / 3)
    assert out[3] == pytest.approx(1.5 / 3)
    assert out[1] == pytest.approx(2.5 / 3)
    assert out[4] is None
