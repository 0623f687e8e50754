"""Round-11 additions: the composed corpus pipeline, the ADVICE-r10
NULL contracts, and the parameterized knn oracle builder."""

import re

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def catalog(spark):
    import __spark_entry__ as e

    return e.queries()


# --- pipeline_e2e -----------------------------------------------------------


def test_pipeline_e2e_plan_shape(spark, catalog):
    """The composed pipeline's plan: every fork where two stage tiers
    consume one earlier result reads a CUT frame — the d2/d3 survivor
    tiers are eager localCheckpoints (the r14 production
    parquet-checkpoint mirror, read back as ExistingRDD scans) and the
    remaining operator-internal forks (shingle/posting/signal frames)
    stay pinned (InMemoryTableScan) — no unpinned recompute of a
    stage's upstream, and the whole chain stays JVM-side (no Python
    evaluation)."""
    df = catalog["pipeline_e2e"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Scan ExistingRDD", plan)) >= 2  # d2, d3
    assert len(re.findall(r"InMemoryTableScan", plan)) >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_e2e_semantics(spark, catalog):
    """Output invariants of the assembled corpus: training side only
    (even doc ids), epochs ≥ 1 per the mixture weights, src2 dropped,
    shard positions dense per shard, JSONL lines non-empty."""
    rows = catalog["pipeline_e2e"](spark, SF_DIR).collect()
    assert rows, "pipeline produced an empty corpus"
    assert all(r.doc_id % 2 == 0 for r in rows)
    assert all(r.epoch >= 1 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # (doc_id, epoch) unique — the resample key survives sharding
    keys = [(r.doc_id, r.epoch) for r in rows]
    assert len(keys) == len(set(keys))
    # per-shard positions are 0..n-1 (the writer-layout contract)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard


def test_pipeline_e2e_stage_monotone(spark):
    """Each dedup/filter tier only shrinks the corpus: the assembled
    doc set is a subset of the raw even-id docs, and every kept doc
    passed the quality funnel."""
    from timeseriesutils_spark.operators.corpus_pipeline import (
        assemble_training_corpus,
    )
    from timeseriesutils_spark.operators.text import quality_score
    from timeseriesutils_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    out = assemble_training_corpus(docs)
    kept = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    raw_even = {
        r.doc_id for r in docs.filter(F.col("doc_id") % 2 == 0).collect()
    }
    assert kept <= raw_even
    qual = {
        r.doc_id
        for r in quality_score(docs).filter(F.col("quality") >= 0.75).collect()
    }
    assert kept <= qual


# --- ADVICE r10: NULL contracts --------------------------------------------


def _null_docs_frame(spark):
    return spark.createDataFrame(
        [("g", 1, 1.0), ("g", 2, None), ("g", 3, 5.0), ("g", 4, 9.0),
         ("g", 5, 2.0), ("h", 6, None), ("h", 7, 3.0)],
        "grp string, id bigint, v double",
    )


def test_robust_scaler_null_consistency(spark):
    """A NULL in a group must not shift the quantile bounds: both
    engines compute q25/med/q75 over the non-NULL sample only."""
    import duckdb

    from timeseriesutils_spark.operators.stats import (
        robust_scaler,
        robust_scaler_sql,
    )

    df = _null_docs_frame(spark)
    got = {
        (r.id): (r.v_robust, r.v_median, r.v_iqr)
        for r in robust_scaler(df, "v", ["grp"]).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = robust_scaler_sql("t", "v", ["grp"], "id")
    want = {
        int(r[0]): (r[1], r[2], r[3])
        for r in con.sql(sql).fetchall()
    }
    assert got == want
    # the non-NULL g-side sample is (1,2,5,9): median 3.5, iqr q75-q25
    assert got[1][1] == 3.5


def test_quantile_mapping_null_consistency(spark):
    """NULL source or reference values must not shift ranks or the
    reference lerp array; NULL rows are dropped on both engines."""
    import duckdb

    from timeseriesutils_spark.operators.stats import (
        quantile_mapping,
        quantile_mapping_sql,
    )

    df = spark.createDataFrame(
        [("g", 1, 1.0, False), ("g", 2, None, False), ("g", 3, 5.0, False),
         ("g", 4, 2.0, True), ("g", 5, None, True), ("g", 6, 8.0, True),
         ("g", 7, 4.0, True)],
        "grp string, id bigint, v double, is_ref boolean",
    )
    got = {
        r.id: r.v_mapped
        for r in quantile_mapping(df, "v", ["grp"], "is_ref").collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = quantile_mapping_sql("t", "v", ["grp"], "is_ref", "grp, id, v, is_ref")
    want = {r[1]: r[4] for r in con.sql(sql).fetchall()}
    assert got == want
    # NULL rows dropped entirely, not passed through
    assert 2 not in got and 5 not in got
    # ranks computed over the 2 non-NULL source rows only
    assert len([k for k in got if k in (1, 3)]) == 2


def test_sql_knn_parameterized():
    """The brute-force knn oracle takes k as a real parameter — the
    rrf top-10 list is rendered, never string-surgered."""
    from timeseriesutils_spark.queries.llm_queries import _SQL_KNN, _sql_knn

    assert "rn <= 5" in _SQL_KNN
    assert "rn <= 10" in _sql_knn(10)
    assert "rn <= 5" not in _sql_knn(10)


def test_jsonl_pack_extra_cols(spark):
    """extra_cols pass through verbatim and default () keeps the
    legacy 4-column contract."""
    from timeseriesutils_spark.operators.text import jsonl_pack

    df = spark.createDataFrame(
        [(1, "hello", "en", "s", 3)],
        "doc_id bigint, text string, lang string, source string, shard int",
    )
    legacy = jsonl_pack(df)
    assert legacy.columns == ["id", "line", "line_md5", "n_bytes"]
    extra = jsonl_pack(df, extra_cols=("shard",))
    assert extra.columns == ["id", "line", "line_md5", "n_bytes", "shard"]
    assert extra.collect()[0].shard == 3


# --- dtw_pattern exact conversion -------------------------------------------


def test_dtw_exact_kernel_matches_loop_on_ints():
    """The int64 min-plus kernel is bit-identical to the per-cell loop
    spec on integer costs (unbanded), across shapes and signs."""
    import numpy as np

    from timeseriesutils_spark.operators.dtw import (
        dtw_exact_kernel_int,
        dtw_kernel_loop,
    )

    rng = np.random.RandomState(7)
    for n, m in [(1, 1), (3, 7), (40, 28), (90, 28), (5, 30)]:
        x = rng.randint(-(10**7), 10**7, size=n).astype(np.int64)
        y = rng.randint(-(10**7), 10**7, size=m).astype(np.int64)
        exact = dtw_exact_kernel_int(x, y)
        ref = dtw_kernel_loop(x.astype(float), y.astype(float), band=None)
        assert float(exact) == ref, (n, m)


def test_dtw_exact_query_tracks_float_kernel(spark, catalog):
    """The declared exact distances agree with the float production
    kernel (unbanded) to quantization tolerance on real data."""
    import numpy as np

    from timeseriesutils_spark.operators.dtw import dtw_to_reference
    from timeseriesutils_spark.queries.series_queries import (
        _DTW_REF,
        _period_price,
    )

    exact = {
        r.l_suppkey: (r.n_obs, r.dtw_dist)
        for r in catalog["dtw_pattern"](spark, SF_DIR).collect()
    }
    prod = {
        r.l_suppkey: r.dtw_dist
        for r in dtw_to_reference(
            _period_price(spark, SF_DIR),
            "period_price",
            ["l_suppkey"],
            ["ship_period"],
            reference=_DTW_REF,
            band=None,
        ).collect()
    }
    assert set(exact) == set(prod)
    for k, (n, d) in exact.items():
        tol = 3e-6 * (n + len(_DTW_REF)) + 1e-9 * max(1.0, abs(d))
        assert abs(d - prod[k]) <= tol, (k, d, prod[k])


# --- pca_project power-deflation conversion ----------------------------------


def test_tdiv_matches_duckdb_semantics():
    import duckdb

    from timeseriesutils_spark.operators.pca import _tdiv

    con = duckdb.connect()
    for a, b in [(-7, 2), (7, 2), (-7, -2), (7, -2), (0, 5), (-1, 3)]:
        got = con.sql(
            f"SELECT CAST({a} AS HUGEINT) // CAST({b} AS HUGEINT)"
        ).fetchone()[0]
        assert _tdiv(a, b) == int(got), (a, b)


def test_pca_power2_tracks_eigh(spark):
    """On a separated spectrum the power-deflation projections match
    the driver-eigh production path on BOTH components (the existing
    pca_power convergence contract, extended through the deflation),
    and are bit-identical across repartitionings.  (The sf testdata
    embeddings are near-isotropic — λ2/λ1 ≈ 1 — where NO fixed
    -iteration power method converges; the declared query's contract
    there is determinism, which the oracle hash pins.)"""
    import numpy as np

    from timeseriesutils_spark.operators.pca import (
        pca_power2_project,
        pca_project,
    )

    rng = np.random.default_rng(5)
    base = rng.normal(size=(150, 6)) @ np.diag([5.0, 2.0, 1.0, 0.5, 0.3, 0.1])
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    pw = pca_power2_project(df).toPandas().set_index("vec_id").sort_index()
    pw2 = (
        pca_power2_project(df.repartition(7))
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert (pw["pc1"] == pw2["pc1"]).all()
    assert (pw["pc2"] == pw2["pc2"]).all()

    eig = pca_project(df, k=2).toPandas().set_index("vec_id").sort_index()
    np.testing.assert_allclose(
        pw["pc1"].to_numpy(), eig["pc1"].to_numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        pw["pc2"].to_numpy(), eig["pc2"].to_numpy(), atol=5e-3
    )


# --- lomb_scargle ------------------------------------------------------------


def test_lomb_scargle_matches_numpy_reference(spark):
    """The quantized-exact engine tracks a plain float numpy Lomb
    implementation (Press & Rybicki / Scargle 1982 normalized form) on
    an irregular series with a planted 7-day cycle — and the planted
    frequency wins."""
    import numpy as np

    from timeseriesutils_spark.operators.lomb import lomb_scargle

    rng = np.random.default_rng(11)
    t = np.sort(rng.choice(np.arange(400), size=160, replace=False)).astype(
        float
    )
    x = 3.0 * np.sin(2 * np.pi * t / 7.0) + rng.normal(scale=0.5, size=len(t))
    freqs = [1.0 / 7.0, 1.0 / 28.0, 1.0 / 91.0]

    def lomb_np(t, x, f):
        w = 2 * np.pi * f
        dx = x - x.mean()
        s2 = x.var(ddof=1)
        tau = np.arctan2(np.sin(2 * w * t).sum(), np.cos(2 * w * t).sum()) / (
            2 * w
        )
        ct, st = np.cos(w * (t - tau)), np.sin(w * (t - tau))
        return (
            (dx @ ct) ** 2 / (ct @ ct) + (dx @ st) ** 2 / (st @ st)
        ) / (2 * s2)

    rows = [("g", float(ti), float(xi)) for ti, xi in zip(t, x)]
    df = spark.createDataFrame(rows, "g string, t double, x double")
    got = {
        round(r.freq, 9): r.power
        for r in lomb_scargle(df, "x", "t", ["g"], freqs).collect()
    }
    for f in freqs:
        ref = lomb_np(t, x, f)
        assert abs(got[round(f, 9)] - ref) < 1e-3 * max(1.0, ref), (f, ref)
    # the planted weekly cycle dominates
    assert got[round(1.0 / 7.0, 9)] > 10 * got[round(1.0 / 91.0, 9)]


def test_lomb_scargle_null_and_rejects(spark):
    """NULL rows are dropped (complete-case) and >5 frequencies are
    rejected (the codegen envelope is part of the API contract)."""
    import pytest as _pytest

    from timeseriesutils_spark.operators.lomb import lomb_scargle

    df = spark.createDataFrame(
        [("g", 1.0, 2.0), ("g", 2.0, None), ("g", None, 4.0),
         ("g", 3.0, 5.0), ("g", 5.0, 3.0)],
        "g string, t double, x double",
    )
    out = lomb_scargle(df, "x", "t", ["g"], [0.25]).collect()
    assert out[0].n_obs == 3
    with _pytest.raises(ValueError):
        lomb_scargle(df, "x", "t", ["g"], [0.1] * 6)


# --- arma11_forecast ---------------------------------------------------------


def test_arma11_matches_numpy_innovations(spark):
    """The truncated-filter forecast tracks the exact sequential
    innovations recursion (same MoM φ, θ) on a planted ARMA(1,1)
    series, and the MoM fit recovers the planted parameters roughly."""
    import numpy as np

    from timeseriesutils_spark.operators.forecast import arma11_forecast

    rng = np.random.default_rng(3)
    phi_true, theta_true = 0.6, 0.4
    n = 400
    eps = rng.normal(size=n)
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = phi_true * y[t - 1] + eps[t] + theta_true * eps[t - 1]
    y = y + 10.0
    rows = [("g", t, float(round(y[t], 2))) for t in range(n)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = {
        r.horizon: r
        for r in arma11_forecast(
            df, "y", ["g"], ["t"], horizons=(1, 7), scale=2
        ).collect()
    }
    r1h = out[1]
    assert r1h.mom_valid
    assert abs(r1h.phi - phi_true) < 0.25
    assert abs(r1h.theta - theta_true) < 0.35

    # exact sequential innovations recursion with the FITTED params
    yv = np.round(y, 2)
    mu = yv.mean()
    d = yv - mu
    e = 0.0
    for t in range(len(yv)):
        f_t = (r1h.phi * d[t - 1] + r1h.theta * e) if t else 0.0
        e = d[t] - f_t
    fc1_seq = mu + r1h.phi * d[-1] + r1h.theta * e
    # truncation at W=20: |theta|^20 residual
    assert abs(out[1].forecast - fc1_seq) < 1e-3 * max(1.0, abs(fc1_seq))
    # h-step decay through phi
    dev1 = out[1].forecast - mu
    assert abs((out[7].forecast - mu) - r1h.phi ** 6 * dev1) < 1e-9


def test_arma11_ar1_fallback(spark):
    """A pure AR(1) series (θ=0) makes the MoM quadratic degenerate
    (r₂/r₁ = r₁ → a = 0): the op falls back to AR(1) with θ = 0 and
    still forecasts."""
    import numpy as np

    from timeseriesutils_spark.operators.forecast import arma11_forecast

    # a deterministic geometric series has r2/r1 == r1 exactly-ish
    rows = [("g", t, float(2.0 + 0.5 ** t)) for t in range(30)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = arma11_forecast(df, "y", ["g"], ["t"], horizons=(1,), scale=6)
    r = out.collect()[0]
    assert r.forecast is not None
    assert r.theta in (0.0,) or abs(r.theta) < 1.0


# --- kendall arrow engine -----------------------------------------------------


def test_kendall_arrow_bit_equal_to_pairs(spark):
    """Knight's O(n log n) Arrow engine is bit-identical to the O(n²)
    pair-join engine — exact integer S/tie counts, same τ_b tree —
    including heavy-tie and constant-series groups."""
    import numpy as np

    from timeseriesutils_spark.operators.nonparam import kendall_tau

    rng = np.random.default_rng(19)
    rows = []
    for g in range(6):
        n = int(rng.integers(2, 120))
        x = rng.integers(0, 8, size=n) * 0.5          # heavy x ties
        y = rng.normal(size=n).round(1)                # some y ties
        if g == 5:
            y = np.zeros(n)                            # constant y
        rows += [
            (f"g{g}", t, float(x[t]), float(y[t])) for t in range(n)
        ]
    df = spark.createDataFrame(rows, "g string, t int, x double, y double")
    a = {
        r.g: (r.n, r.s_stat, r.n_tie_x, r.n_tie_y, r.tau_b)
        for r in kendall_tau(df, "x", "y", ["g"], ["t"]).collect()
    }
    b = {
        r.g: (r.n, r.s_stat, r.n_tie_x, r.n_tie_y, r.tau_b)
        for r in kendall_tau(
            df, "x", "y", ["g"], ["t"], engine="arrow"
        ).collect()
    }
    assert a == b


def test_kendall_counts_match_scipy_formula():
    """The Knight kernel agrees with the direct O(n²) sign-product sum
    on random int series."""
    import numpy as np

    from timeseriesutils_spark.operators.nonparam import _kendall_counts_int

    rng = np.random.default_rng(23)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        x = rng.integers(-5, 5, size=n).astype(np.int64)
        y = rng.integers(-5, 5, size=n).astype(np.int64)
        s_ref = sum(
            int(np.sign(x[j] - x[i])) * int(np.sign(y[j] - y[i]))
            for i in range(n)
            for j in range(i + 1, n)
        )
        s, xt, yt, nn = _kendall_counts_int(x, y)
        assert s == s_ref and nn == n


# --- round-11 plan-shape pins -------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lomb_scargle_two_stage_broadcast(spark, catalog):
    """lomb_scargle: the per-group τ statistics join back BROADCAST
    (never a sort-merge on the fact side) and the whole chain stays
    JVM-side."""
    plan = _plan(catalog["lomb_scargle"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_arma11_no_python_broadcastable(spark, catalog):
    """arma11_forecast: acf + state collapse to one row per group
    before the fit; no Python, no quadratic joins."""
    plan = _plan(catalog["arma11_forecast"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bleu_rouge_no_quadratic_kernel(spark, catalog):
    """bleu/rouge: clipped-count joins over exploded grams — no
    per-row quadratic Python kernel, no nested-loop join."""
    for name in ("bleu_pairs", "rouge_n"):
        plan = _plan(catalog[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_winnow_single_window_no_join(spark, catalog):
    """winnow_fingerprints: one per-doc window over the gram stream —
    no joins at all, pure JVM."""
    plan = _plan(catalog["winnow_fingerprints"](spark, SF_DIR))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan


def test_van_der_waerden_fligner_single_chain(spark, catalog):
    """normal-scores tests: rank windows + one reduce with fixed-order
    level pivots — no per-level join fan-out, no Python."""
    for name in ("van_der_waerden", "fligner_killeen"):
        plan = _plan(catalog[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_cox_ph_checkpointed_projection(spark, catalog):
    """cox_ph (r14 Arrow-kernel shape): all Newton rounds run inside ONE
    FlatMapGroupsInPandas over the cells frame — no Window operators, no
    per-step checkpoint barriers (lineage stays visible down to the
    scans), and construction runs no eager jobs.  The relational A/B
    control still narrows and restores the session's shuffle width."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    df = catalog["cox_ph"](spark, SF_DIR)
    plan = _plan(df)
    assert "FlatMapGroupsInPandas" in plan  # the Newton kernel
    assert "Scan parquet" in plan  # no eager checkpoint barrier
    assert "ExistingRDD" not in plan
    assert "Window" not in plan
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    # relational control: eagerly-checkpointed projection + width restore
    from timeseriesutils_spark.operators.coxph import cox_ph
    from timeseriesutils_spark.sources.tables import load_table

    li = (
        load_table(spark, SF_DIR, "lineitem")
        .limit(400)
        .selectExpr(
            "l_returnflag AS g",
            "CAST(l_linenumber AS BIGINT) AS t",
            "CAST(l_quantity % 2 AS INT) AS e",
            "CAST(l_discount AS DOUBLE) AS x",
        )
    )
    rdf = cox_ph(li, "t", "e", "x", ["g"], engine="relational")
    rplan = _plan(rdf)
    assert "ExistingRDD" in rplan  # the checkpointed stats frame
    assert "Join" not in rplan and "Window" not in rplan
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
