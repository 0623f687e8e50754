"""Unit/property tests for the epi-forecast operator family
(operators/epi.py): renewal-equation Rt, chain-ladder nowcast,
pinball scoring."""

import pytest

from timeseriesutils_spark.operators.epi import (
    nowcast_triangle,
    pinball_scores,
    renewal_rt,
)


def test_renewal_rt_constant_series_is_one(spark):
    # constant incidence: force = n * sum(w) / sum(w) -> Rt = 1 exactly
    rows = [("a", d, 50) for d in range(20)]
    df = spark.createDataFrame(rows, "g string, day long, n long")
    out = {r.day: r for r in renewal_rt(df, "n", "day", ["g"]).collect()}
    assert len(out) == 20
    W = (1, 2, 3, 2, 1)
    for d in range(len(W)):  # incomplete kernel -> NULL
        assert out[d].rt is None
    for d in range(len(W), 20):
        assert out[d].force_q == 50 * sum(W)
        assert out[d].rt == 1.0


def test_renewal_rt_densifies_gaps_with_zeros(spark):
    # day 2 missing entirely -> treated as zero cases, not skipped
    rows = [("a", 0, 10), ("a", 1, 10), ("a", 3, 10), ("a", 4, 10)]
    df = spark.createDataFrame(rows, "g string, day long, n long")
    out = {r.day: r for r in
           renewal_rt(df, "n", "day", ["g"], weights=(1, 1)).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[2].n == 0
    # day 3: force = 1*n2 + 1*n1 = 0 + 10
    assert out[3].force_q == 10
    assert out[3].rt == pytest.approx(10 * 2 / 10)
    # day 4: force = n3 + n2 = 10 + 0
    assert out[4].force_q == 10


def test_renewal_rt_growth(spark):
    # doubling cases: Rt > 1 and equals n_t*D/force exactly
    rows = [("a", d, 2**d) for d in range(10)]
    df = spark.createDataFrame(rows, "g string, day long, n long")
    out = {r.day: r for r in renewal_rt(df, "n", "day", ["g"]).collect()}
    W = (1, 2, 3, 2, 1)
    d = 8
    force = sum(w * 2 ** (d - s) for s, w in enumerate(W, start=1))
    assert out[d].force_q == force
    assert out[d].rt == (2**d * sum(W)) / force
    assert out[d].rt > 1.0


def test_nowcast_complete_triangle_identity(spark):
    # every period fully observed (delays all present up to max_delay and
    # a trailing period beyond) -> ultimate == reported for mature rows
    rows = []
    for occ in range(3):
        for d in range(3):
            rows += [(occ, d)] * (10 * (d + 1))
    # sentinel late period so T is large and all three rows are mature
    rows += [(10, 0)]
    df = spark.createDataFrame(rows, "occ long, delay long")
    out = {r.occ: r for r in nowcast_triangle(df, "occ", "delay", 2).collect()}
    for occ in range(3):
        assert out[occ].observed_depth == 2
        assert out[occ].reported_q == 60
        assert out[occ].ultimate == 60.0
        assert out[occ].outstanding == 0.0


def test_nowcast_censored_period_projects(spark):
    # two mature periods with doubling development (10 then +10 at d=1),
    # one censored period seen only at depth 0 -> ultimate = k * f0
    rows = []
    for occ in (0, 1):
        rows += [(occ, 0)] * 10 + [(occ, 1)] * 10
    rows += [(2, 0)] * 7  # T = max(occ+d) = 2 -> depth(2) = 0
    df = spark.createDataFrame(rows, "occ long, delay long")
    out = {r.occ: r for r in nowcast_triangle(df, "occ", "delay", 1).collect()}
    # f0 = (K[0,1]+K[1,1]) / (K[0,0]+K[1,0]) = 40/20 = 2.0
    assert out[2].observed_depth == 0
    assert out[2].reported_q == 7
    assert out[2].ultimate == 14.0
    assert out[2].outstanding == 7.0
    assert out[0].ultimate == 20.0


def test_pinball_known_values(spark):
    # y=10; f10=8, f50=10, f90=14:
    # pinball_10 = (10-8)*0.1 = 0.2 ; pinball_50 = 0 ; pinball_90 = 4*0.1=0.4
    rows = [("a", 10.0, 8.0, 10.0, 14.0)]
    df = spark.createDataFrame(rows, "g string, y double, f10 double, f50 double, f90 double")
    out = pinball_scores(
        df, "y", {0.1: "f10", 0.5: "f50", 0.9: "f90"}, ["g"],
        interval=(0.1, 0.9),
    ).collect()[0]
    assert out.n == 1
    assert out.pinball_10 == pytest.approx(0.2)
    assert out.pinball_50 == 0.0
    assert out.pinball_90 == pytest.approx(0.4)
    assert out.mean_pinball == pytest.approx((0.2 + 0 + 0.4) / 3)
    assert out.coverage == 1.0


def test_pinball_subpercent_levels_get_distinct_names(spark):
    """Round-6 ADVICE regression: forecast-hub tail levels 0.025/0.975
    must not collapse onto 0.02/0.98 (int(round(q*100)) did), and using
    0.02 AND 0.025 together must not alias-collide."""
    from timeseriesutils_spark.operators.epi import (
        _pinball_col_name,
        pinball_scores_sql,
    )

    assert _pinball_col_name(0.5) == "pinball_50"  # legacy form kept
    assert _pinball_col_name(0.02) == "pinball_02"
    assert _pinball_col_name(0.025) == "pinball_0p025"
    assert _pinball_col_name(0.975) == "pinball_0p975"

    rows = [("a", 10.0, 8.0, 8.5, 14.0)]
    df = spark.createDataFrame(
        rows, "g string, y double, f02 double, f025 double, f975 double"
    )
    out = pinball_scores(
        df, "y", {0.02: "f02", 0.025: "f025", 0.975: "f975"}, ["g"]
    )
    cols = out.columns
    assert "pinball_02" in cols and "pinball_0p025" in cols
    assert "pinball_0p975" in cols and "pinball_98" not in cols
    r = out.collect()[0]
    assert r.pinball_02 == pytest.approx((10.0 - 8.0) * 0.02)
    assert r.pinball_0p025 == pytest.approx((10.0 - 8.5) * 0.025)
    assert r.pinball_0p975 == pytest.approx((14.0 - 10.0) * (1 - 0.975))
    # SQL twin renders the identical names
    sql = pinball_scores_sql(
        "SELECT 1", "y", {0.02: "f02", 0.025: "f025", 0.975: "f975"}, ["g"]
    )
    for nm in ("pinball_02", "pinball_0p025", "pinball_0p975"):
        assert f"AS {nm}" in sql


def test_pinball_coverage_counts_interval_misses(spark):
    rows = [
        ("a", 5.0, 8.0, 10.0, 14.0),   # below the 80% interval
        ("a", 10.0, 8.0, 10.0, 14.0),  # inside
        ("a", 20.0, 8.0, 10.0, 14.0),  # above
        ("a", None, 8.0, 10.0, 14.0),  # NULL actual dropped entirely
    ]
    df = spark.createDataFrame(rows, "g string, y double, f10 double, f50 double, f90 double")
    out = pinball_scores(
        df, "y", {0.1: "f10", 0.5: "f50", 0.9: "f90"}, ["g"],
        interval=(0.1, 0.9),
    ).collect()[0]
    assert out.n == 3
    assert out.coverage == pytest.approx(1 / 3)


def test_excess_incidence_flat_history_zero_excess(spark):
    from timeseriesutils_spark.operators.epi import excess_incidence

    # constant 5/day in baseline and eval: expected=5, excess=0 everywhere
    rows = [("a", d, 5) for d in range(28)]
    df = spark.createDataFrame(rows, "g string, day long, n long")
    out = excess_incidence(df, "n", "day", ["g"], split_day=14).collect()
    assert len(out) == 14
    for r in out:
        assert r.expected == 5.0
        assert r.excess == 0.0
        assert r.cum_excess == 0.0


def test_excess_incidence_surge_accumulates(spark):
    from timeseriesutils_spark.operators.epi import excess_incidence

    rows = [("a", d, 10) for d in range(14)]
    rows += [("a", d, 13) for d in range(14, 21)]  # +3/day surge
    df = spark.createDataFrame(rows, "g string, day long, n long")
    out = sorted(
        excess_incidence(df, "n", "day", ["g"], split_day=14).collect(),
        key=lambda r: r.day,
    )
    assert [r.excess for r in out] == [3.0] * 7
    assert [r.cum_excess for r in out] == [3.0 * (i + 1) for i in range(7)]


def test_excess_incidence_phase_matching(spark):
    from timeseriesutils_spark.operators.epi import excess_incidence

    # weekday-dependent baseline: n = phase; eval repeats it -> excess 0
    rows = [("a", d, d % 7 + 1) for d in range(35)]
    df = spark.createDataFrame(rows, "g string, day long, n long")
    out = excess_incidence(df, "n", "day", ["g"], split_day=21).collect()
    assert len(out) == 14
    assert all(r.excess == 0.0 for r in out)


def test_corpus_jsd_identical_halves_zero(spark):
    from timeseriesutils_spark.operators.text import corpus_jsd
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, True, "a b c"), (2, False, "a b c")],
        "doc_id long, fl boolean, text string",
    )
    out = corpus_jsd(docs, F.col("fl")).collect()[0]
    assert out.n_tokens_a == 3 and out.n_tokens_b == 3
    assert out.n_vocab == 3
    assert out.jsd == 0.0


def test_corpus_jsd_disjoint_is_ln2(spark):
    import math

    from timeseriesutils_spark.operators.text import corpus_jsd
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, True, "x y z"), (2, False, "p q r")],
        "doc_id long, fl boolean, text string",
    )
    out = corpus_jsd(docs, F.col("fl")).collect()[0]
    assert out.jsd == pytest.approx(math.log(2), abs=1e-9)
