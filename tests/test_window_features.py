import math

import pytest

from timeseriesutils_spark.operators.window_features import (
    horizon_targets,
    lag,
    rollmean,
)


def _by_group(df, cols):
    out = {}
    for r in df.orderBy("g", "t").collect():
        out.setdefault(r["g"], []).append(tuple(r[c] for c in cols))
    return out


def test_lag_values_and_names(toy_frame):
    df, names = lag(toy_frame, "y", ["g"], window_size=2, order_by=["t"])
    assert names == ["y_lag1", "y_lag2"]
    got = _by_group(df, ["y_lag1", "y_lag2"])
    assert got["a"] == [(None, None), (1.0, None), (2.0, 1.0), (3.0, 2.0), (4.0, 3.0), (5.0, 4.0)]
    assert got["b"] == [(None, None), (10.0, None), (20.0, 10.0), (30.0, 20.0), (40.0, 30.0), (50.0, 40.0)]


def test_lag_explicit_lags(toy_frame):
    df, names = lag(toy_frame, ["y"], ["g"], lags=[3], order_by=["t"])
    assert names == ["y_lag3"]
    got = _by_group(df, ["y_lag3"])
    assert got["a"] == [(None,), (None,), (None,), (1.0,), (2.0,), (3.0,)]


def test_lag_invariant_to_input_order(toy_frame, toy_frame_shuffled):
    a, _ = lag(toy_frame, "y", ["g"], window_size=2, order_by=["t"])
    b, _ = lag(toy_frame_shuffled, "y", ["g"], window_size=2, order_by=["t"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_rollmean_default_min_periods(toy_frame):
    df, names = rollmean(toy_frame, "y", ["g"], window_size=3, order_by=["t"])
    assert names == ["y_rollmean_w3"]
    got = _by_group(df, ["y_rollmean_w3"])
    assert got["a"] == [(None,), (None,), (2.0,), (3.0,), (4.0,), (5.0,)]
    assert got["b"] == [(None,), (None,), (20.0,), (30.0,), (40.0,), (50.0,)]


def test_rollmean_min_periods_one(toy_frame):
    df, _ = rollmean(toy_frame, "y", ["g"], window_size=3, min_periods=1, order_by=["t"])
    got = _by_group(df, ["y_rollmean_w3"])
    assert got["a"] == [(1.0,), (1.5,), (2.0,), (3.0,), (4.0,), (5.0,)]


def test_rollmean_null_handling(spark):
    rows = [("a", 0, 1.0), ("a", 1, None), ("a", 2, 3.0), ("a", 3, 5.0)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out, _ = rollmean(df, "y", ["g"], window_size=2, min_periods=1, order_by=["t"])
    vals = [r["y_rollmean_w2"] for r in out.orderBy("t").collect()]
    # pandas rolling mean skips NaN when min_periods satisfied
    assert vals == [1.0, 1.0, 3.0, 4.0]


def test_rollmean_exact_matches_plain(toy_frame):
    a, _ = rollmean(toy_frame, "y", ["g"], window_size=3, order_by=["t"], exact=True)
    b, _ = rollmean(toy_frame, "y", ["g"], window_size=3, order_by=["t"], exact=False)
    for ra, rb in zip(a.orderBy("g", "t").collect(), b.orderBy("g", "t").collect()):
        va, vb = ra["y_rollmean_w3"], rb["y_rollmean_w3"]
        assert (va is None and vb is None) or math.isclose(va, vb, rel_tol=1e-12)


def test_horizon_targets_wide(toy_frame):
    df, names = horizon_targets(toy_frame, "y", ["g"], horizons=[1, 2], order_by=["t"])
    assert names == []  # wide adds no feature names (featurize.py:266-267)
    got = _by_group(df, ["y_target1", "y_target2"])
    assert got["a"] == [(2.0, 3.0), (3.0, 4.0), (4.0, 5.0), (5.0, 6.0), (6.0, None), (None, None)]


def test_horizon_targets_long(toy_frame):
    df, names = horizon_targets(
        toy_frame, "y", ["g"], horizons=[1, 2], layout="long", order_by=["t"]
    )
    assert names == ["horizon"]
    assert df.count() == 24  # len(horizons) × N  (12 → 24, SURVEY §2.1)
    h1 = df.filter("horizon = 1 and g = 'a'").orderBy("t").collect()
    assert [r["y_target"] for r in h1] == [2.0, 3.0, 4.0, 5.0, 6.0, None]
    h2 = df.filter("horizon = 2 and g = 'a'").orderBy("t").collect()
    assert [r["y_target"] for r in h2] == [3.0, 4.0, 5.0, 6.0, None, None]


def test_order_by_required(toy_frame):
    with pytest.raises(ValueError):
        lag(toy_frame, "y", ["g"])


def test_parity_with_reference(spark, reference_featurize, toy_frame):
    """Run the actual reference on the same frame; compare all features."""
    import pandas as pd

    ref = reference_featurize
    pdf = toy_frame.orderBy("g", "t").toPandas()
    ref_df = pdf.copy()
    ref_df, ref_names = ref.lag(ref_df, ["y"], ["g"], window_size=2)
    ref_df, ref_names = ref.rollmean(ref_df, ["y"], ["g"], feature_names=ref_names, window_size=3)
    ref_df, ref_names = ref.horizon_targets(
        ref_df, ["y"], ["g"], feature_names=ref_names, horizons=[1], layout="wide"
    )

    df, names = lag(toy_frame, ["y"], ["g"], window_size=2, order_by=["t"])
    df, names = rollmean(df, ["y"], ["g"], feature_names=names, window_size=3, order_by=["t"])
    df, names = horizon_targets(
        df, ["y"], ["g"], feature_names=names, horizons=[1], layout="wide", order_by=["t"]
    )
    assert names == ref_names
    got = df.orderBy("g", "t").toPandas()
    for c in ["y_lag1", "y_lag2", "y_rollmean_w3", "y_target1"]:
        pd.testing.assert_series_equal(
            got[c], ref_df[c].astype("float64"), check_names=False, check_index=False
        )


def test_randomized_parity_with_reference(spark, reference_featurize):
    """Seeded random frames (varying group sizes, NaN holes): lag/rollmean/
    horizon must match the reference exactly, including null masks."""
    import numpy as np
    import pandas as pd

    ref = reference_featurize
    rng = np.random.default_rng(314)
    for trial in range(5):
        rows = []
        for g in range(rng.integers(2, 5)):
            n = int(rng.integers(1, 12))
            for t in range(n):
                v = float(rng.normal())
                if rng.random() < 0.15:
                    v = np.nan
                rows.append((f"g{g}", t, v))
        pdf = pd.DataFrame(rows, columns=["g", "t", "y"])
        ref_df = pdf.copy()
        ref_df, _ = ref.lag(ref_df, ["y"], ["g"], window_size=3)
        ref_df, _ = ref.rollmean(ref_df, ["y"], ["g"], window_size=4)
        ref_df, _ = ref.horizon_targets(ref_df, ["y"], ["g"], horizons=[2], layout="wide")

        sdf = spark.createDataFrame(pdf)
        out, _ = lag(sdf, ["y"], ["g"], window_size=3, order_by=["t"])
        out, _ = rollmean(out, ["y"], ["g"], window_size=4, order_by=["t"])
        out, _ = horizon_targets(out, ["y"], ["g"], horizons=[2], layout="wide", order_by=["t"])
        got = out.orderBy("g", "t").toPandas()
        for c in ["y_lag1", "y_lag2", "y_lag3", "y_target2"]:
            # shift-based features move values untouched → bitwise equal
            np.testing.assert_array_equal(
                got[c].to_numpy(dtype="float64"),
                ref_df[c].to_numpy(dtype="float64"),
                err_msg=f"trial {trial} col {c}",
            )
        # rollmean accumulates through DECIMAL(38,6) for cross-engine /
        # cross-partitioning determinism → agrees with the raw-double
        # pandas mean to the 1e-6 quantum, not to the ulp
        np.testing.assert_allclose(
            got["y_rollmean_w4"].to_numpy(dtype="float64"),
            ref_df["y_rollmean_w4"].to_numpy(dtype="float64"),
            atol=2e-6,
            rtol=0,
            equal_nan=True,
            err_msg=f"trial {trial} col y_rollmean_w4",
        )


def test_ungrouped_single_series(spark, reference_featurize):
    """group_columns=None → one global series (reference featurize.py:150-153)."""
    import pandas as pd

    ref = reference_featurize
    pdf = pd.DataFrame({"t": range(8), "y": [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6]]})
    ref_df, _ = ref.lag(pdf.copy(), ["y"], None, window_size=2)
    ref_df, _ = ref.rollmean(ref_df, ["y"], None, window_size=3)

    sdf = spark.createDataFrame(pdf)
    out, _ = lag(sdf, ["y"], None, window_size=2, order_by=["t"])
    out, _ = rollmean(out, ["y"], None, window_size=3, order_by=["t"])
    got = out.orderBy("t").toPandas()
    for c in ["y_lag1", "y_lag2", "y_rollmean_w3"]:
        pd.testing.assert_series_equal(
            got[c], ref_df[c].astype("float64"), check_names=False, check_index=False
        )


def test_rollmean_invariant_to_input_order(toy_frame, toy_frame_shuffled):
    a, _ = rollmean(toy_frame, "y", ["g"], window_size=3, order_by=["t"])
    b, _ = rollmean(toy_frame_shuffled, "y", ["g"], window_size=3, order_by=["t"])
    ka = {(r["g"], r["t"]): r["y_rollmean_w3"] for r in a.collect()}
    kb = {(r["g"], r["t"]): r["y_rollmean_w3"] for r in b.collect()}
    assert ka == kb  # the reference's silent-misalignment bug (SURVEY 2.4.1) fixed
