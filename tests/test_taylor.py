import numpy as np
import pandas as pd
import pytest

from timeseriesutils_spark.operators.taylor import (
    taylor_matrices,
    windowed_taylor_coefs,
    windowed_taylor_coefs_pandas,
)


@pytest.fixture(scope="module")
def sinusoid(spark):
    """The reference's own unit-test input (tests/test_taylor_coefs_one_column_grp.py:33-51)."""
    rng = np.random.default_rng(12345)
    t = np.arange(50)
    phi, a, b = 10.0, 1.0, 0.2
    mean = a * np.cos(t / phi) + b * np.sin(t / phi)
    y = rng.normal(mean, 0.1)
    pdf = pd.DataFrame({"g": "one", "t": t, "y": y})
    return spark.createDataFrame(pdf), pdf, (a, b, phi)


def test_sinusoid_ground_truth(spark, sinusoid):
    """Port of the reference's only unit test: trailing d=2 w=14
    fill_edges=False — β₀≈mean, β₁≈μ′, β₂≈μ″/2-ish within tolerances."""
    sdf, pdf, (a, b, phi) = sinusoid
    out, names = windowed_taylor_coefs(
        sdf,
        "y",
        ["g"],
        taylor_degree=2,
        window_size=14,
        window_align="trailing",
        fill_edges=False,
        order_by=["t"],
    )
    assert names == [
        "y_taylor_d2_c0_w14t_sNone",
        "y_taylor_d2_c1_w14t_sNone",
        "y_taylor_d2_c2_w14t_sNone",
    ]
    rows = out.orderBy("t").collect()
    got = {nm: np.array([r[nm] for r in rows], dtype="float64") for nm in names}
    # rows 0..13 NULL (reference trailing off-by-one, SURVEY §2.4.2)
    for nm in names:
        assert all(r[nm] is None for r in rows[:14]), nm
        assert all(r[nm] is not None for r in rows[14:]), nm
    t = np.arange(50)
    mean = a * np.cos(t / phi) + b * np.sin(t / phi)
    d1 = -a / phi * np.sin(t / phi) + b / phi * np.cos(t / phi)
    d2 = -a / phi**2 * np.cos(t / phi) - b / phi**2 * np.sin(t / phi)
    assert np.nanmax(np.abs(got[names[0]][14:] - mean[14:])) < 0.2
    assert np.nanmax(np.abs(got[names[1]][14:] - d1[14:])) < 0.1
    assert np.nanmax(np.abs(got[names[2]][14:] - d2[14:] / 2)) < 0.02


@pytest.mark.parametrize(
    "align,w,degree,span,fill_edges",
    [
        ("trailing", 7, 1, None, False),
        ("trailing", 7, 2, None, True),
        ("trailing", 5, 1, 10, True),
        ("centered", 7, 2, None, False),
        ("centered", 7, 1, None, True),
        ("centered", 9, 2, 14, True),
    ],
)
def test_parity_with_reference(spark, reference_featurize, align, w, degree, span, fill_edges):
    """The Spark closed-form must match the reference lstsq to float noise,
    including edge fits, NaN propagation, and both quirky off-by-ones."""
    ref = reference_featurize
    rng = np.random.default_rng(7)
    frames = []
    for g in ["g0", "g1"]:
        n = 30
        y = rng.normal(np.linspace(0, 5, n) + 3 * np.sin(np.arange(n) / 3), 0.5)
        y[5] = np.nan  # exercise NaN propagation
        frames.append(pd.DataFrame({"g": g, "t": np.arange(n), "y": y}))
    pdf = pd.concat(frames, ignore_index=True)

    ref_out, ref_names = ref.windowed_taylor_coefs(
        pdf.copy(),
        columns=["y"],
        group_columns=["g"],
        taylor_degree=degree,
        window_size=w,
        window_align=align,
        ew_span=span,
        fill_edges=fill_edges,
    )

    sdf = spark.createDataFrame(pdf)
    out, names = windowed_taylor_coefs(
        sdf,
        ["y"],
        ["g"],
        taylor_degree=degree,
        window_size=w,
        window_align=align,
        ew_span=span,
        fill_edges=fill_edges,
        order_by=["t"],
    )
    assert names == ref_names
    got = out.orderBy("g", "t").toPandas()
    ref_sorted = ref_out.sort_values(["g", "t"]).reset_index(drop=True)
    for nm in names:
        g = got[nm].to_numpy(dtype="float64")
        r = ref_sorted[nm].to_numpy(dtype="float64")
        both_nan = np.isnan(g) & np.isnan(r)
        assert (np.isnan(g) == np.isnan(r)).all(), f"{nm}: NaN mask differs"
        diff = np.abs(g - r)[~both_nan]
        assert diff.size == 0 or np.max(diff) < 1e-8, f"{nm}: max diff {np.max(diff)}"


def test_expr_path_matches_pandas_path(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c"], 25),
            "t": np.tile(np.arange(25), 3),
            "y": rng.normal(0, 1, 75).cumsum(),
        }
    )
    sdf = spark.createDataFrame(pdf)
    kw = dict(
        taylor_degree=2,
        window_size=7,
        window_align="centered",
        ew_span=8,
        fill_edges=True,
    )
    a, names = windowed_taylor_coefs(sdf, ["y"], ["g"], order_by=["t"], **kw)
    b = windowed_taylor_coefs_pandas(sdf, ["y"], ["g"], order_by=["t"], **kw)
    pa = a.orderBy("g", "t").toPandas()
    pb = b.orderBy("g", "t").toPandas()
    for nm in names:
        x = pa[nm].to_numpy(dtype="float64")
        y = pb[nm].to_numpy(dtype="float64")
        assert (np.isnan(x) == np.isnan(y)).all()
        m = ~np.isnan(x)
        assert np.allclose(x[m], y[m], atol=1e-9)


def test_matrices_empty_edge_is_zero():
    m = taylor_matrices(2, 5, "trailing", None, True)
    lags0, P0, zero_mask, contaminated = m.start[0]
    assert lags0 == [] and P0.shape == (3, 0)
    assert zero_mask == [True, True, True] and not contaminated


def test_even_centered_rejected():
    with pytest.raises(ValueError):
        taylor_matrices(1, 8, "centered", None, True)


def test_matrices_parity_with_reference(spark, reference_featurize):
    """df_to_train_test_matrices: shapes and values must match the
    reference pivot/reshape (featurize.py:52-113) on a demo-shaped frame."""
    import numpy as np
    import pandas as pd

    from timeseriesutils_spark.operators.matrices import df_to_train_test_matrices

    rng = np.random.default_rng(5)
    locs, dates = ["x", "y", "z"], pd.date_range("2021-01-01", periods=9)
    pdf = pd.DataFrame(
        [
            {
                "location": l,
                "date": d,
                "f1": rng.normal(),
                "f2": rng.normal(),
                "tgt": rng.normal(),
            }
            for l in locs
            for d in dates
        ]
    )
    # poke some NaNs so the dropna path is exercised (whole dates, keeping
    # the post-drop frame rectangular as the reference implicitly requires)
    pdf.loc[pdf["date"] == dates[0], "f1"] = np.nan
    ref_x, ref_y, ref_xT = reference_featurize.df_to_train_test_matrices(
        pdf.copy(), ["f1", "f2"], "tgt"
    )
    sdf = spark.createDataFrame(pdf)
    got_x, got_y, got_xT = df_to_train_test_matrices(sdf, ["f1", "f2"], "tgt")
    assert got_x.shape == ref_x.shape and got_y.shape == ref_y.shape
    assert got_xT.shape == ref_xT.shape
    np.testing.assert_allclose(got_x, ref_x, rtol=1e-12)
    np.testing.assert_allclose(got_y, ref_y, rtol=1e-12)
    np.testing.assert_allclose(got_xT, ref_xT, rtol=1e-12)


def test_demo_shaped_full_pipeline_parity(spark, reference_featurize):
    """FIXTURES §F3: demo-data-shaped frame (51 locations × 120 daily
    dates), full reference pipeline (lags + rollmean + trailing taylor +
    horizon target) + df_to_train_test_matrices — engine matches the
    reference end-to-end (shapes exact, values to float noise)."""
    import numpy as np
    import pandas as pd

    from timeseriesutils_spark.operators.matrices import df_to_train_test_matrices
    from timeseriesutils_spark.operators.pipeline import featurize_data

    ref = reference_featurize
    rng = np.random.default_rng(99)
    locs = [f"{a}{b}" for a in "ABCDE" for b in "ABCDEFGHIJ"][:51]
    dates = pd.date_range("2020-10-01", periods=120)
    t = np.arange(len(dates))
    rows = []
    for loc in locs:
        base = rng.uniform(5, 50)
        curve = base * (1 + np.sin(t / 20 + rng.uniform(0, 6))) + rng.normal(0, 1, len(t))
        curve = np.round(np.clip(curve, 0, None), 6)
        for d, v in zip(dates, curve):
            rows.append({"location": loc, "date": d, "inc_hosp": float(v)})
    pdf = pd.DataFrame(rows).sort_values(["location", "date"]).reset_index(drop=True)

    features = [
        {"fun": "lag", "args": {"columns": "inc_hosp", "window_size": 3}},
        {"fun": "rollmean", "args": {"columns": "inc_hosp", "window_size": 7}},
        {
            "fun": "windowed_taylor_coefs",
            "args": {
                "columns": "inc_hosp",
                "taylor_degree": 2,
                "window_size": 14,
                "window_align": "trailing",
            },
        },
        {"fun": "horizon_targets", "args": {"columns": "inc_hosp", "horizons": 1, "layout": "wide"}},
    ]
    ref_df = pdf.copy()
    ref_names = []
    for f in features:
        fn = getattr(ref, f["fun"] if f["fun"] != "lag" else "lag")
        ref_df, ref_names = fn(
            ref_df, ["inc_hosp"], ["location"], feature_names=ref_names, **{
                k: v for k, v in f["args"].items() if k != "columns"
            }
        )
    ref_x, ref_y, ref_xT = ref.df_to_train_test_matrices(
        ref_df, ref_names, "inc_hosp_target1"
    )

    sdf = spark.createDataFrame(pdf)
    out, names = featurize_data(
        sdf, group_columns=["location"], features=features, order_by=["date"]
    )
    assert names == ref_names
    got_x, got_y, got_xT = df_to_train_test_matrices(out, names, "inc_hosp_target1")
    assert got_x.shape == ref_x.shape and got_y.shape == ref_y.shape and got_xT.shape == ref_xT.shape
    np.testing.assert_allclose(got_x, ref_x, rtol=1e-6, atol=2e-6)
    np.testing.assert_allclose(got_y, ref_y, rtol=1e-9)
    np.testing.assert_allclose(got_xT, ref_xT, rtol=1e-6, atol=2e-6)
