"""featurize_data dispatcher: registry dispatch (string and callable),
name accumulation order, unknown-function error."""

import pytest

from timeseriesutils_spark.operators.pipeline import featurize_data
from timeseriesutils_spark.operators.window_features import rollmean


def test_pipeline_accumulates_names_in_order(spark, toy_frame):
    df, names = featurize_data(
        toy_frame,
        group_columns=["g"],
        features=[
            {"fun": "lag", "args": {"columns": "y", "window_size": 2}},
            {"fun": "rollmean", "args": {"columns": "y", "window_size": 3}},
            {"fun": "horizon_targets", "args": {"columns": "y", "horizons": [1, 2], "layout": "long"}},
        ],
        order_by=["t"],
    )
    assert names == ["y_lag1", "y_lag2", "y_rollmean_w3", "horizon"]
    assert df.count() == 24  # long layout doubled the 12 rows
    assert set(names) - {"horizon"} <= set(df.columns)


def test_pipeline_accepts_callables(spark, toy_frame):
    df, names = featurize_data(
        toy_frame,
        group_columns=["g"],
        features=[{"fun": rollmean, "args": {"columns": "y", "window_size": 2}}],
        order_by=["t"],
    )
    assert names == ["y_rollmean_w2"]


def test_pipeline_rejects_unknown_name(spark, toy_frame):
    with pytest.raises(ValueError, match="unknown feature function"):
        featurize_data(
            toy_frame,
            group_columns=["g"],
            features=[{"fun": "exec_evil", "args": {}}],
            order_by=["t"],
        )


def test_pipeline_dispatches_engine_native_signals(spark):
    """ewma/diff/pct_change compose through featurize_data like the
    reference-core ops, still one lazy plan."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.pipeline import featurize_data

    df = spark.createDataFrame(
        [("a", i, float(i * i)) for i in range(10)], "g string, t long, v double"
    )
    out, names = featurize_data(
        df,
        group_columns=["g"],
        features=[
            {"fun": "ewma", "args": {"columns": "v", "window_size": 3, "ew_span": 2.0}},
            {"fun": "diff", "args": {"columns": "v", "periods": 1}},
            {"fun": "pct_change", "args": {"columns": "v", "periods": 1}},
        ],
        order_by=["t"],
    )
    assert len(names) == 3 and len(out.columns) == 3 + 3
    row = {r.t: r for r in out.collect()}
    assert row[5].v_diff1 == 25.0 - 16.0
    assert abs(row[5].v_pctchg1 - (25.0 / 16.0 - 1.0)) < 1e-12
