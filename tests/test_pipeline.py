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
