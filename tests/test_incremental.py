"""Incremental featurization (operators/incremental): the
watermark-bounded run must be bit-identical to the full recompute
restricted to the new rows, for every trailing feature family."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.incremental import featurize_increment
from timeseriesutils_spark.operators.window_features import lag, rollmean


def _series(spark):
    rows = []
    base = datetime.date(2024, 1, 1)
    for gid in ("a", "b"):
        for i in range(40):
            rows.append((gid, base + datetime.timedelta(days=i), float(i) + (3.0 if gid == "b" else 0.0)))
    return spark.createDataFrame(rows, "g string, d date, v double")


WM = datetime.date(2024, 1, 30)


@pytest.mark.parametrize(
    "builder,context",
    [
        (lambda df, g: lag(df, "v", g, window_size=5, order_by="d"), 5),
        (lambda df, g: rollmean(df, "v", g, window_size=7, order_by="d"), 6),
        (
            lambda df, g: rollmean(
                df, "v", g, window_size=[3, 7], min_periods=1, order_by="d"
            ),
            6,
        ),
    ],
)
def test_incremental_equals_full(spark, builder, context):
    df = _series(spark)
    full, names = builder(df, ["g"])
    want = sorted(map(tuple, full.filter(F.col("d") > F.lit(WM)).collect()))
    inc, names2 = featurize_increment(df, WM, builder, ["g"], ["d"], context)
    got = sorted(map(tuple, inc.collect()))
    assert names == names2
    assert got == want


def test_incremental_taylor_strict_edges(spark):
    from timeseriesutils_spark.operators.taylor import windowed_taylor_coefs

    def builder(df, g):
        return windowed_taylor_coefs(
            df, "v", g, taylor_degree=2, window_size=8,
            window_align="trailing", order_by="d",
        )

    df = _series(spark)
    full, _ = builder(df, ["g"])
    want = sorted(map(tuple, full.filter(F.col("d") > F.lit(WM)).collect()))
    # taylor's strict edge dispatch keys on the group-start row index, so
    # context must cover the full window (w, not w-1) — chunked_taylor's
    # +1 rationale
    inc, _ = featurize_increment(df, WM, builder, ["g"], ["d"], 8)
    got = sorted(map(tuple, inc.collect()))
    assert got == want


def test_incremental_insufficient_context_detected(spark):
    # too-small context visibly changes early-window features (no silent
    # wrong answers hidden by NULLs): rollmean w7 with only 2 context rows
    df = _series(spark)

    def builder(d, g):
        return rollmean(d, "v", g, window_size=7, min_periods=1, order_by="d")

    full, _ = builder(df, ["g"])
    want = sorted(map(tuple, full.filter(F.col("d") > F.lit(WM)).collect()))
    inc, _ = featurize_increment(df, WM, builder, ["g"], ["d"], 2)
    got = sorted(map(tuple, inc.collect()))
    assert got != want
