"""Unit tests for multi-touch attribution (operators/attribution.py)."""

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.attribution import multi_touch_attribution


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_attribution_models(spark):
    rows = [
        # u1: view -> click -> view -> purchase (3 touches)
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 01:00:00", 1, "click"),
        (3, "2024-01-01 02:00:00", 1, "view"),
        (4, "2024-01-01 03:00:00", 1, "purchase"),
        # post-conversion events carry no credit
        (5, "2024-01-01 04:00:00", 1, "click"),
        # u2: click -> purchase (1 touch)
        (6, "2024-01-02 00:00:00", 2, "click"),
        (7, "2024-01-02 01:00:00", 2, "purchase"),
        # u3: never converts -> no credit
        (8, "2024-01-03 00:00:00", 3, "view"),
    ]
    out = {r.channel: r for r in multi_touch_attribution(_events(spark, rows)).collect()}
    assert set(out) == {"view", "click"}
    # first touch: u1 -> view, u2 -> click
    assert out["view"].first_touch == 1 and out["click"].first_touch == 1
    # last touch before conversion: u1 -> view (t=02), u2 -> click
    assert out["view"].last_touch == 1 and out["click"].last_touch == 1
    # linear: u1 gives 2/3 view + 1/3 click; u2 gives 1 click
    assert out["view"].linear_credit == pytest.approx(2 / 3, abs=1e-6)
    assert out["click"].linear_credit == pytest.approx(1 + 1 / 3, abs=1e-6)
    assert out["view"].n_touches == 2 and out["click"].n_touches == 2


def test_attribution_tie_break_on_event_id(spark):
    # two touches at the identical timestamp: ids decide first/last
    rows = [
        (11, "2024-01-01 00:00:00", 1, "view"),
        (10, "2024-01-01 00:00:00", 1, "click"),
        (12, "2024-01-01 01:00:00", 1, "purchase"),
    ]
    out = {r.channel: r for r in multi_touch_attribution(_events(spark, rows)).collect()}
    assert out["click"].first_touch == 1  # id 10 < 11
    assert out["view"].last_touch == 1


def test_attribution_decay_favors_recent(spark):
    rows = [
        # u1: view 48h before purchase, click just before -> decay credit
        # heavily favors click (w=2^-2=0.25 vs w=2^0=1.0 at 24h halflife)
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-02 23:59:59.999999", 1, "click"),  # ~0h before
        (3, "2024-01-03 00:00:00", 1, "purchase"),
    ]
    out = {r.channel: r for r in multi_touch_attribution(_events(spark, rows)).collect()}
    assert out["click"].decay_credit == pytest.approx(1.0 / 1.25, abs=1e-6)
    assert out["view"].decay_credit == pytest.approx(0.25 / 1.25, abs=1e-6)
    # decay credits of a user sum to ~1
    assert out["click"].decay_credit + out["view"].decay_credit == pytest.approx(1.0, abs=1e-6)
