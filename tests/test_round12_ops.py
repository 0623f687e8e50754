"""Round-12 tests: ADVICE-r11 regression fixes + new operators."""

import numpy as np
import pytest


# --- ADVICE r11 fixes -----------------------------------------------------


def test_bayes_ab_rejects_sub_one_priors(spark):
    from timeseriesutils_spark.operators.analytics import bayes_ab, bayes_ab_sql

    df = spark.createDataFrame(
        [("a", 1), ("b", 1)], "arm string, success int"
    )
    with pytest.raises(ValueError, match="prior_alpha"):
        bayes_ab(df, "arm", "a", "b", "success", [], prior_beta=0)
    with pytest.raises(ValueError, match="prior_alpha"):
        bayes_ab_sql("SELECT 1", "arm", "a", "b", "success", [], prior_alpha=0)


def test_sequential_ab_sql_rejects_bad_n_looks(spark):
    from timeseriesutils_spark.operators.analytics import sequential_ab_sql

    with pytest.raises(ValueError, match="n_looks"):
        sequential_ab_sql("SELECT 1", "arm", "a", "b", "success", "lk", n_looks=7)


def test_adamic_adar_duplicate_edges_are_deduped(spark):
    """Duplicate input edges must not double-count degrees or fan out
    the already_linked join (ADVICE r11: graph.py contract)."""
    from timeseriesutils_spark.operators.graph import adamic_adar

    edges = [(1, 2), (1, 3), (2, 3), (2, 4)]
    clean = spark.createDataFrame(edges, "src int, dst int")
    dup = spark.createDataFrame(edges + edges + edges[:2], "src int, dst int")
    a = sorted(map(tuple, adamic_adar(clean, top_k=50).collect()))
    b = sorted(map(tuple, adamic_adar(dup, top_k=50).collect()))
    assert a == b
    assert len(a) == len(set((r[0], r[1]) for r in a))  # no dup pairs


def test_mmd_quad_drift_max_dim_guard(spark):
    from timeseriesutils_spark.operators.similarity import mmd_quad_drift

    rows = [([float(i) for i in range(8)], s) for s in (1, 2) for _ in range(3)]
    df = spark.createDataFrame(rows, "vec array<double>, s int")
    # d=8 <= max_dim: runs
    assert mmd_quad_drift(df, "vec", "s").count() == 1
    # max_dim below d: the plan raises at execution, no silent explode
    with pytest.raises(Exception) as ei:
        mmd_quad_drift(df, "vec", "s", max_dim=4).collect()
    assert "max_dim" in str(ei.value)


def _run_crps_stream(spark, tmp_path, pdf, name):
    from timeseriesutils_spark.streaming.windows import streaming_crps

    src = str(tmp_path / name)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("k string, t bigint, value double").parquet(src)
    out = streaming_crps(stream, key_col="k", value_col="value",
                         order_cols=("t",), members=3)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name} ORDER BY k").collect()[-1]


def test_streaming_crps_drops_nulls(spark, tmp_path):
    """streaming_crps must score WHERE value IS NOT NULL like its oracle
    (ADVICE r11: a NaN corrupts the int64 ring)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "k": ["a"] * 12,
            "t": list(range(12)),
            "value": [float(i % 5 + 1) if i % 4 else None for i in range(12)],
        }
    )
    with_nulls = _run_crps_stream(spark, tmp_path, pdf, "r12_crps_nulls")
    clean = _run_crps_stream(
        spark, tmp_path, pdf.dropna(subset=["value"]), "r12_crps_clean"
    )
    assert with_nulls["n_seen"] == 9  # 3 nulls dropped
    assert with_nulls["n_scored"] == clean["n_scored"]
    assert np.isfinite(with_nulls["mean_crps"])
    assert with_nulls["mean_crps"] == clean["mean_crps"]


# --- matrix_profile -------------------------------------------------------


def _mp_numpy(x, w, band, excl, scale):
    """Straight-line banded matrix profile reference (STOMP identity
    recomputed naively per pair) with the operator's quantization."""
    mult = 10 ** scale
    xq = np.floor(np.asarray(x, dtype="float64") * mult + 0.5).astype("int64")
    n = len(xq)
    out = {}
    nsub = n - w + 1
    for i in range(nsub):
        best = None
        for j in range(nsub):
            d = abs(j - i)
            if d <= excl or d > band:
                continue
            a, b = xq[i:i + w], xq[j:j + w]
            Sa, SSa = a.sum(), (a * a).sum()
            Sb, SSb = b.sum(), (b * b).sum()
            da = w * SSa - Sa * Sa
            db = w * SSb - Sb * Sb
            if da <= 0 or db <= 0:
                continue
            num = w * int(a @ b) - Sa * Sb
            corr = float(num) / (np.sqrt(float(da)) * np.sqrt(float(db)))
            dist = np.sqrt(max(2.0 * w * (1.0 - corr), 0.0))
            dq = int(np.floor(dist * 1e9 + 0.5))
            if best is None or (dq, j + 1) < best:
                best = (dq, j + 1)
        if best is not None:
            out[i + 1] = (best[1], best[0] / 1e9)
    return out


def test_matrix_profile_matches_numpy(spark):
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    rng = np.random.default_rng(7)
    x = np.cumsum(rng.normal(0, 1, 120)) + 50.0
    # plant a repeated motif far apart (inside the band from one side)
    x[30:38] = x[80:88] = np.array([1, 5, 2, 8, 3, 9, 4, 7], dtype="float64")
    rows = [("s", int(t), float(v)) for t, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    got = {
        r["idx"]: (r["nn_idx"], r["mp_dist"])
        for r in matrix_profile(
            df, "v", ["g"], ["t"], w=8, band=60, excl=4, scale=2
        ).collect()
    }
    want = _mp_numpy(x, w=8, band=60, excl=4, scale=2)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], (i, got[i], want[i])
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-9)


def test_matrix_profile_finds_planted_motif(spark):
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    rng = np.random.default_rng(3)
    x = np.cumsum(rng.normal(0, 5, 100)) + 200.0
    motif = np.array([10, 80, 20, 90, 30, 70, 40, 60], dtype="float64")
    x[10:18] = motif
    x[40:48] = motif
    rows = [("s", int(t), float(v)) for t, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    res = {
        r["idx"]: (r["nn_idx"], r["mp_dist"])
        for r in matrix_profile(
            df, "v", ["g"], ["t"], w=8, band=40, excl=4, scale=2
        ).collect()
    }
    # the two planted motif subsequences are each other's nearest
    # neighbor at (near-)zero z-normalized distance
    assert res[11][0] == 41 and res[41][0] == 11
    assert res[11][1] < 1e-6 and res[41][1] < 1e-6


def test_matrix_profile_constant_windows_drop_out(spark):
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    rows = [("s", t, 5.0) for t in range(30)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    assert matrix_profile(df, "v", ["g"], ["t"], w=4, band=10, excl=2).count() == 0


def test_matrix_profile_plan_single_exchange_no_joins(spark):
    """The banded-STOMP formulation must stay pure window expressions:
    one exchange per series, zero joins, no Python eval."""
    import re

    from timeseriesutils_spark.queries import catalog

    df = catalog()["matrix_profile"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
