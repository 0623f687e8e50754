"""Hypothesis property tests for the invariants the session operators
are built on — randomized inputs, algebraic laws, one shared Spark
session.  Hypothesis drives the INPUT generation; each property is an
exact assertion (the engine's determinism discipline means no
tolerances are needed on integer-domain laws)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    txns=st.lists(
        st.tuples(
            st.integers(1, 3),          # item
            st.integers(1, 20),         # qty
            st.booleans(),              # is_buy
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_fifo_conservation_law(spark, txns):
    """Σ allocations per item == min(total buys, total sells) — FIFO's
    conservation law, for ANY interleaving of lots and sells."""
    from timeseriesutils_spark.operators.fifo import fifo_allocation

    rows = [
        (item, qty, buy, seq, seq) for seq, (item, qty, buy) in enumerate(txns)
    ]
    df = spark.createDataFrame(
        rows, "item long, qty long, is_buy boolean, seq long, id long"
    )
    out = fifo_allocation(df, "item", "qty", "is_buy", ["seq"], "id").collect()
    alloc = {}
    for r in out:
        assert r.qty_alloc > 0
        alloc[r.item] = alloc.get(r.item, 0) + r.qty_alloc
    for item in {t[0] for t in txns}:
        buys = sum(q for i, q, b in txns if i == item and b)
        sells = sum(q for i, q, b in txns if i == item and not b)
        assert alloc.get(item, 0) == min(buys, sells)


@given(
    iv=st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 10)),  # (start, len)
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_merge_intervals_coverage_law(spark, iv):
    """Merged episodes cover exactly the union of the inputs: total
    merged length == |union of integer points|, episodes are disjoint
    and sorted."""
    from timeseriesutils_spark.operators.sessions import merge_intervals

    rows = [("k", s, s + ln) for s, ln in iv]
    df = spark.createDataFrame(rows, "k string, start_ms long, end_ms long")
    out = sorted(merge_intervals(df, ["k"]).collect(), key=lambda r: r.start)
    covered = set()
    for s, ln in iv:
        covered.update(range(s, s + ln))
    assert sum(r["end"] - r.start for r in out) == len(covered)
    for a, b in zip(out, out[1:]):
        assert a["end"] < b.start  # strictly disjoint after merging
    assert sum(r.n_merged for r in out) == len(iv)


@given(
    vals=st.lists(
        st.integers(-50, 50).map(lambda v: v / 2.0), min_size=2, max_size=40
    )
)
@settings(**_SETTINGS)
def test_counter_rate_telescoping_law(spark, vals):
    """For a RESET-FREE (monotone) counter, total increase telescopes to
    last − first, regardless of the sample pattern."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.counters import counter_rate

    mono = []
    acc = 0.0
    for v in vals:
        acc += abs(v)
        mono.append(acc)
    rows = [("g", f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", i, float(m))
            for i, m in enumerate(mono)]
    df = spark.createDataFrame(rows, "g string, ts string, id long, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "id",
        F.floor(F.col("v") * 2 + F.lit(0.5)).cast("bigint").alias("v"),
    )
    out = counter_rate(df, "v", "ts", ["g"], bucket="year", id_col="id").collect()
    total = sum(r.increase for r in out)
    assert total == round(mono[-1] * 2) - round(mono[0] * 2)
    assert all(r.n_resets == 0 for r in out)


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 300)),  # (stratum, t)
        min_size=3,
        max_size=40,
    ),
    horizon=st.integers(1, 100),
)
@settings(**_SETTINGS)
def test_kaplan_meier_monotone_law(spark, rows, horizon):
    """KM survival is non-increasing in t within every stratum and lies
    in [0, 1], for any censoring pattern (died iff t < horizon)."""
    from timeseriesutils_spark.operators.survival import kaplan_meier

    subj = [
        (f"s{s}", min(t, horizon), 1 if t < horizon else 0) for s, t in rows
    ]
    df = spark.createDataFrame(subj, "stratum string, t_day long, died int")
    out = sorted(kaplan_meier(df).collect(), key=lambda r: (r.stratum, r.t_day))
    prev = {}
    for r in out:
        assert -1e-9 <= r.survival <= 1.0 + 1e-9
        if r.stratum in prev:
            assert r.survival <= prev[r.stratum] + 1e-9
        prev[r.stratum] = r.survival


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=18,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cc_tiers_agree(spark, edges):
    """connected_components' two execution tiers — driver union-find
    (edges <= driver_threshold) and distributed large-star/small-star —
    produce the IDENTICAL (id, comp) labeling for any graph, including
    self-loops, duplicate edges, and chains.  Closes the one untested
    equivalence in the dedup stack (the tier switch is a pure
    performance decision and must never change results)."""
    from timeseriesutils_spark.operators.dedup import connected_components

    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    uf = {
        (r.id, r.comp)
        for r in connected_components(df, driver_threshold=10**9).collect()
    }
    stars = {
        (r.id, r.comp)
        for r in connected_components(df, driver_threshold=0).collect()
    }
    # the star path's converged edge set never includes isolated
    # self-loop-only nodes (u != v filtered) while union-find registers
    # them as singletons; both conventions label every node that has a
    # real neighbor -- compare on those, and check singleton nodes map
    # to themselves in the union-find tier
    real = {a for a, b in edges if a != b} | {b for a, b in edges if a != b}
    assert {p for p in uf if p[0] in real} == stars
    for node, comp in uf:
        if node not in real:
            assert comp == node


@given(
    counts=st.lists(st.integers(0, 50), min_size=6, max_size=25),
    c=st.integers(2, 9),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_renewal_rt_scale_invariance(spark, counts, c):
    """Rt is a ratio of linear functionals of the incidence series, so
    scaling every count by a constant leaves every Rt unchanged (and
    scales every force of infection by exactly c)."""
    from timeseriesutils_spark.operators.epi import renewal_rt

    rows = [("g", d, n) for d, n in enumerate(counts)]
    base = spark.createDataFrame(rows, "g string, day long, n long")
    scaled = spark.createDataFrame(
        [("g", d, n * c) for d, n in enumerate(counts)],
        "g string, day long, n long",
    )
    # min_count=0 so the low-count guard can't differ between the two
    a = {r.day: r for r in renewal_rt(base, "n", "day", ["g"], min_count=0).collect()}
    b = {r.day: r for r in renewal_rt(scaled, "n", "day", ["g"], min_count=0).collect()}
    assert set(a) == set(b)
    for d in a:
        fa, fb = a[d].force_q, b[d].force_q
        assert (fa is None) == (fb is None)
        if fa is not None:
            assert fb == fa * c
        ra, rb = a[d].rt, b[d].rt
        assert (ra is None) == (rb is None)
        if ra is not None:
            # n*D/force is invariant under n -> c*n exactly in rationals;
            # the double division computes (c*n*D)/(c*force) vs (n*D)/force
            assert rb == pytest.approx(ra, rel=1e-12)


@given(
    tri=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(1, 30)),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_nowcast_conservation_and_identity(spark, tri):
    """Chain-ladder laws: (a) ultimate >= reported for every period
    (factors >= 1 since cumulative counts are nondecreasing); (b) on a
    triangle where every period is fully mature (a late sentinel makes
    the whole region observed), ultimate == reported exactly."""
    from timeseriesutils_spark.operators.epi import nowcast_triangle

    rows = []
    for occ, d, c in tri:
        rows += [(occ, d)] * c
    rows += [(50, 0)]  # sentinel: T = 50, every real period mature
    df = spark.createDataFrame(rows, "occ long, delay long")
    out = nowcast_triangle(df, "occ", "delay", max_delay=3).collect()
    assert len(out) > 0
    for r in out:
        assert r.ultimate >= r.reported_q - 1e-9
        if r.occ != 50:
            assert r.observed_depth == 3
            assert r.ultimate == float(r.reported_q)
            assert r.outstanding == 0.0


@given(
    vals=st.lists(
        st.floats(-100, 100, allow_nan=False, width=32),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pinball_perfect_forecast_is_zero(spark, vals):
    """A forecast equal to the actual at every quantile scores exactly
    zero pinball loss and 100% coverage."""
    from timeseriesutils_spark.operators.epi import pinball_scores

    rows = [("g", float(v), float(v), float(v), float(v)) for v in vals]
    df = spark.createDataFrame(
        rows, "g string, y double, f10 double, f50 double, f90 double"
    )
    out = pinball_scores(
        df, "y", {0.1: "f10", 0.5: "f50", 0.9: "f90"}, ["g"],
        interval=(0.1, 0.9),
    ).collect()[0]
    assert out.mean_pinball == 0.0
    assert out.coverage == 1.0


@given(
    ys=st.lists(st.integers(-50, 50), min_size=4, max_size=25),
    a=st.integers(1, 5),
    b=st.integers(-20, 20),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_theilsen_affine_equivariance(spark, ys, a, b):
    """Theil-Sen is affine-equivariant: y -> a*y + b maps slope ->
    a*slope and intercept -> a*intercept + b (medians of affinely
    transformed slope/residual sets)."""
    from timeseriesutils_spark.operators.regression import theilsen_slope

    base = spark.createDataFrame(
        [("g", t, float(y)) for t, y in enumerate(ys)],
        "g string, t long, y double",
    )
    mapped = spark.createDataFrame(
        [("g", t, float(a * y + b)) for t, y in enumerate(ys)],
        "g string, t long, y double",
    )
    r0 = theilsen_slope(base, "y", "t", ["g"], scale=2).collect()[0]
    r1 = theilsen_slope(mapped, "y", "t", ["g"], scale=2).collect()[0]
    assert r1.slope == pytest.approx(a * r0.slope, rel=1e-9, abs=1e-9)
    assert r1.intercept == pytest.approx(a * r0.intercept + b, rel=1e-9, abs=1e-9)


def _rows_equal(a, b):
    """Exact row-multiset equality with NULL==NULL and NaN==NaN (both
    sides run identical code on equal frames, so floats must be
    bitwise-equal)."""
    import math

    def norm(rows):
        out = []
        for r in rows:
            t = []
            for v in r:
                if v is None:
                    t.append(("null",))
                elif isinstance(v, float) and math.isnan(v):
                    t.append(("nan",))
                else:
                    t.append(v)
            out.append(tuple(t))
        return sorted(out, key=repr)

    return norm(a) == norm(b)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),                              # group
            st.one_of(st.none(), st.integers(0, 5000)),     # y  (cents)
            st.one_of(st.none(), st.integers(0, 5000)),     # x1
            st.one_of(st.none(), st.integers(0, 5000)),     # x2
            st.one_of(st.none(), st.integers(1, 500)),      # w  (cents)
        ),
        min_size=2,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_complete_case_null_discipline_family_law(spark, rows):
    """Round-6 brief item: the a03fd6d bug class (NULL-deflated counts)
    pinned as a family-wide law — every stats-family op on a frame WITH
    NULLs equals the same op on the pre-filtered complete-case frame
    (listwise over exactly the columns that op consumes)."""
    from timeseriesutils_spark.operators.profile import corr_matrix
    from timeseriesutils_spark.operators.regression import (
        grouped_ols2,
        mahalanobis_outliers,
    )
    from timeseriesutils_spark.operators.stats import (
        anova_oneway,
        gini_index,
        weighted_median,
        welch_ttest,
    )

    data = [
        (
            i,
            "a" if g == 0 else "b",
            None if y is None else y / 100.0,
            None if x1 is None else x1 / 100.0,
            None if x2 is None else x2 / 100.0,
            None if w is None else w / 100.0,
        )
        for i, (g, y, x1, x2, w) in enumerate(rows)
    ]
    schema = "id long, g string, y double, x1 double, x2 double, w double"
    df = spark.createDataFrame(data, schema)

    def clean(*cols):
        out = df
        for c in cols:
            out = out.filter(out[c].isNotNull())
        return out

    cases = [
        (lambda d: gini_index(d, ["g"], "y", "id"), ("y",)),
        (lambda d: weighted_median(d, ["g"], "y", "w", "id"), ("y", "w")),
        (lambda d: anova_oneway(d, "y", "g"), ("y",)),
        (lambda d: welch_ttest(d, "y", "g", "a", "b"), ("y",)),
        (lambda d: grouped_ols2(d, "y", "x1", "x2", ["g"]), ("y", "x1", "x2")),
        (lambda d: corr_matrix(d, ["y", "x1", "x2"]), ("y", "x1", "x2")),
        (
            lambda d: mahalanobis_outliers(
                d, "x1", "x2", ["g"], ["id"], threshold=1.0
            ),
            ("x1", "x2"),
        ),
    ]
    for op, cols in cases:
        with_nulls = op(df).collect()
        pre_filtered = op(clean(*cols)).collect()
        assert _rows_equal(with_nulls, pre_filtered), (cols, with_nulls, pre_filtered)


@given(
    ys=st.lists(
        st.integers(-50, 50), min_size=5, max_size=60
    ),
)
@settings(**_SETTINGS)
def test_permutation_entropy_ordinal_invariance(spark, ys):
    """Permutation entropy depends only on ORDINAL structure: any
    strictly increasing transform (here x → x³, monotone over the
    whole integer range) leaves every pattern — hence pe_norm —
    bit-identical.  Ties map to ties, so the position tie-break is
    exercised too."""
    from timeseriesutils_spark.operators.complexity import permutation_entropy

    rows = [("g", t, float(y)) for t, y in enumerate(ys)]
    rows3 = [("g", t, float(y**3)) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, t long, y double")
    df3 = spark.createDataFrame(rows3, "g string, t long, y double")
    a = permutation_entropy(df, "y", ["g"], ["t"]).collect()
    b = permutation_entropy(df3, "y", ["g"], ["t"]).collect()
    assert [(r.n_triples, r.pe_norm) for r in a] == [
        (r.n_triples, r.pe_norm) for r in b
    ]


@given(
    ys=st.lists(st.integers(0, 1000), min_size=32, max_size=80),
    a=st.integers(1, 5),
    b=st.integers(-100, 100),
)
@settings(**_SETTINGS)
def test_hurst_affine_invariance(spark, ys, a, b):
    """H(a·y + b) == H(y) for a > 0: every level's block-mean variance
    scales by a², shifting each ln Var_k by the same 2·ln a — the
    centered slope is unchanged.  Integer inputs at scale=0 quantize
    exactly, so the only wiggle is the 1e-9 ln-term quantization."""
    from timeseriesutils_spark.operators.complexity import hurst_exponent

    df = spark.createDataFrame(
        [("g", t, float(y)) for t, y in enumerate(ys)],
        "g string, t long, y double",
    )
    df2 = spark.createDataFrame(
        [("g", t, float(a * y + b)) for t, y in enumerate(ys)],
        "g string, t long, y double",
    )
    h1 = hurst_exponent(df, "y", ["g"], ["t"], scale=0).collect()[0].hurst
    h2 = hurst_exponent(df2, "y", ["g"], ["t"], scale=0).collect()[0].hurst
    if h1 is None or h2 is None:
        assert (h1 is None) == (h2 is None)
    else:
        assert abs(h1 - h2) < 1e-8


@given(
    ys=st.lists(st.integers(-20, 20), min_size=3, max_size=40),
)
@settings(**_SETTINGS)
def test_mann_kendall_monotone_invariance(spark, ys):
    """S, the tie spectrum, and therefore z are invariant under any
    strictly increasing transform (x → x³ over signed ints): the test
    is purely rank-based.  Exact equality — all inputs integer at
    scale=0."""
    from timeseriesutils_spark.operators.regression import mann_kendall

    df = spark.createDataFrame(
        [("g", t, float(y)) for t, y in enumerate(ys)],
        "g string, t long, y double",
    )
    df3 = spark.createDataFrame(
        [("g", t, float(y**3)) for t, y in enumerate(ys)],
        "g string, t long, y double",
    )
    r1 = mann_kendall(df, "y", ["g"], "t", scale=0).collect()[0]
    r3 = mann_kendall(df3, "y", ["g"], "t", scale=0).collect()[0]
    assert (r1.n, r1.s_stat, r1.var_s, r1.z) == (r3.n, r3.s_stat, r3.var_s, r3.z)


@given(
    rows=st.lists(
        st.tuples(st.floats(0.0, 1.0), st.booleans()),
        min_size=2,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_gains_curve_laws(spark, rows):
    """For ANY scored sample: gains and n_included are non-decreasing
    in the bucket, the last bucket includes everything, and lift·
    (included fraction) == gains exactly."""
    from timeseriesutils_spark.operators.mleval import gains_curve

    df = spark.createDataFrame(
        [("g", s, y) for s, y in rows], "g string, s double, y boolean"
    )
    out = sorted(gains_curve(df, "s", "y", ["g"]).collect(),
                 key=lambda r: r.bucket)
    n = len(rows)
    npos = sum(1 for _, y in rows if y)
    assert [r.bucket for r in out] == list(range(1, 11))
    prev_inc, prev_g = -1, -1.0
    for r in out:
        assert r.n_included >= prev_inc
        prev_inc = r.n_included
        if npos:
            assert r.gains is not None and r.gains >= prev_g - 1e-15
            prev_g = r.gains
    assert out[-1].n_included == n
    if npos:
        assert out[-1].pos_included == npos and out[-1].gains == 1.0


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("abc")),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_classification_report_conservation(spark, rows):
    """Σ support over classes == n rows; Σ tp == # correct; Σ fp ==
    Σ fn == # errors (every error is one class's fn and another's fp)."""
    from timeseriesutils_spark.operators.mleval import classification_report

    df = spark.createDataFrame(
        [("g", a, p) for a, p in rows], "g string, actual string, pred string"
    )
    out = classification_report(df, "actual", "pred", ["g"]).collect()
    correct = sum(1 for a, p in rows if a == p)
    errors = len(rows) - correct
    assert sum(r.support for r in out) == len(rows)
    assert sum(r.tp for r in out) == correct
    assert sum(r.fp for r in out) == errors
    assert sum(r.fn for r in out) == errors


@given(
    vals=st.lists(st.integers(0, 30), min_size=4, max_size=40),
)
@settings(**_SETTINGS)
def test_pacf_lag1_equals_acf_lag1_law(spark, vals):
    """φ₁₁ ≡ r₁ for any series (the Durbin–Levinson base case)."""
    from timeseriesutils_spark.operators.acf import acf_features, pacf_features

    rows = [("g", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, i long, y double")
    a = {r.lag_k: r.acf for r in
         acf_features(df, "y", ["g"], ["i"], max_lag=2).collect()}
    p = {r.lag_k: r.pacf for r in
         pacf_features(df, "y", ["g"], ["i"], max_lag=2).collect()}
    assert p[1] == a[1]


@given(
    texts=st.lists(
        st.text(alphabet="ab x.", min_size=0, max_size=20),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_simpson_bounds_and_token_conservation(spark, texts):
    """0 ≤ D ≤ 1 and n_tokens == the python token count for any text."""
    from timeseriesutils_spark.operators.text import simpson_diversity

    df = spark.createDataFrame(
        [("s", t) for t in texts], "source string, text string"
    )
    out = simpson_diversity(df, "source").collect()
    toks = [w for t in texts for w in t.lower().split() if w]
    if not toks:
        assert out == []
        return
    r = out[0]
    assert r.n_tokens == len(toks)
    assert r.n_distinct == len(set(toks))
    if r.simpson is not None:
        assert -1e-15 <= r.simpson <= 1.0 + 1e-15


@given(
    vals=st.lists(st.integers(0, 5), min_size=2, max_size=40),
)
@settings(**_SETTINGS)
def test_chi2_gof_nonnegative_and_counts(spark, vals):
    """χ² ≥ 0 always, 0 iff perfectly balanced; n == len(vals)."""
    from timeseriesutils_spark.operators.stats import chi2_gof

    df = spark.createDataFrame(
        [("g", str(v)) for v in vals], "g string, cat string"
    )
    r = chi2_gof(df, "cat", ["g"]).first()
    assert r.n == len(vals)
    if r.chi2_stat is not None:
        assert r.chi2_stat >= -1e-9
        from collections import Counter

        counts = Counter(vals).values()
        if len(set(counts)) == 1:
            assert r.chi2_stat == pytest.approx(0.0, abs=1e-9)


@given(
    diffs=st.lists(st.integers(-20, 20), min_size=2, max_size=30),
)
@settings(**_SETTINGS)
def test_paired_vs_welch_shift_consistency(spark, diffs):
    """paired_ttest on (a, b) == paired_ttest on (a+c, b+c): the test
    only sees differences (translation invariance of the pairing)."""
    from timeseriesutils_spark.operators.stats import paired_ttest

    rows1 = [("g", float(d), 0.0) for d in diffs]
    rows2 = [("g", float(d) + 7.0, 7.0) for d in diffs]
    df1 = spark.createDataFrame(rows1, "g string, a double, b double")
    df2 = spark.createDataFrame(rows2, "g string, a double, b double")
    r1 = paired_ttest(df1, "a", "b", ["g"]).first()
    r2 = paired_ttest(df2, "a", "b", ["g"]).first()
    assert r1.mean_diff == r2.mean_diff and r1.t_stat == r2.t_stat
