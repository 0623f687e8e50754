"""Unit tests for the Kaplan-Meier survival operator
(operators/survival.py)."""

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.survival import (
    conversion_lifetimes,
    kaplan_meier,
)


def _km(spark, rows):
    df = spark.createDataFrame(rows, "stratum string, t_day bigint, died int")
    out = kaplan_meier(df)
    return {(r.stratum, r.t_day): r for r in out.collect()}


def test_km_textbook(spark):
    # classic worked example: 5 subjects, deaths at t=1 (1), t=3 (2),
    # censor at t=2 (1), death at t=5 (1)
    rows = [
        ("a", 1, 1),
        ("a", 2, 0),
        ("a", 3, 1),
        ("a", 3, 1),
        ("a", 5, 1),
    ]
    got = _km(spark, rows)
    # t=1: n=5 d=1 -> S=4/5
    assert got[("a", 1)].n_risk == 5
    assert got[("a", 1)].survival == pytest.approx(0.8, abs=1e-6)
    # t=3: n=3 (5 - death - censor) d=2 -> S=0.8*(1/3)
    assert got[("a", 3)].n_risk == 3
    assert got[("a", 3)].survival == pytest.approx(0.8 / 3, abs=1e-6)
    # t=5: n=1 d=1 -> risk set exhausted -> S exactly 0
    assert got[("a", 5)].survival == 0.0
    # censoring-only times emit no row
    assert ("a", 2) not in got


def test_km_monotone_and_stratified(spark):
    rows = [("s%d" % (i % 2), (i * 7) % 11, 1 if i % 3 else 0) for i in range(60)]
    df = spark.createDataFrame(rows, "stratum string, t_day bigint, died int")
    out = kaplan_meier(df).collect()
    by_stratum = {}
    for r in sorted(out, key=lambda r: (r.stratum, r.t_day)):
        prev = by_stratum.get(r.stratum, 1.0)
        assert r.survival <= prev + 1e-12  # non-increasing within stratum
        assert 0.0 <= r.survival <= 1.0
        assert r.n_events > 0
        by_stratum[r.stratum] = r.survival


def test_km_all_censored_is_empty(spark):
    rows = [("a", 1, 0), ("a", 2, 0)]
    assert _km(spark, rows) == {}


def test_conversion_lifetimes_window(spark):
    events = spark.createDataFrame(
        [
            # u1: first event t0, purchase 2h later -> died at t=2
            (1, "2024-01-01 00:00:00", 1, "view"),
            (2, "2024-01-01 02:30:00", 1, "purchase"),
            # u2: never purchases -> censored at the 72h edge
            (3, "2024-01-01 00:00:00", 2, "view"),
            (4, "2024-01-05 00:00:00", 2, "click"),
            # u3: purchases after the window -> censored at 72
            (5, "2024-01-01 00:00:00", 3, "view"),
            (6, "2024-01-08 00:00:00", 3, "purchase"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    dim = spark.createDataFrame(
        [(1, "SEG_A"), (2, "SEG_A"), (3, "SEG_B")],
        "c_custkey long, c_mktsegment string",
    )
    out = {
        (r.stratum, r.t_hour): r
        for r in conversion_lifetimes(events, dim, window_hours=72).collect()
    }
    assert out[("SEG_A", 2)].died == 1
    assert out[("SEG_A", 72)].died == 0  # never purchased
    assert out[("SEG_B", 72)].died == 0  # purchased past the window
    assert len(out) == 3


def test_nelson_aalen_hand_computed(spark):
    """Textbook 5-subject example: deaths at t=1 (n=5), t=3 (n=3, after a
    censor at 2), censor at 4, death at 5 (n=1).
    H = 1/5, then 1/5+1/3, then +1/1."""
    from timeseriesutils_spark.operators.survival import nelson_aalen

    rows = [
        ("a", 1, 1), ("a", 2, 0), ("a", 3, 1), ("a", 4, 0), ("a", 5, 1),
    ]
    df = spark.createDataFrame(rows, "stratum string, t_day int, died int")
    out = {r.t_day: r for r in nelson_aalen(df).collect()}
    assert set(out) == {1, 3, 5}
    assert out[1].n_risk == 5 and out[1].cum_hazard == 0.2
    assert out[3].n_risk == 3
    assert out[3].cum_hazard == pytest.approx(0.2 + 1 / 3, abs=2e-6)
    assert out[5].n_risk == 1
    assert out[5].cum_hazard == pytest.approx(0.2 + 1 / 3 + 1.0, abs=2e-6)


def test_nelson_aalen_monotone_nondecreasing(spark):
    import random

    from timeseriesutils_spark.operators.survival import nelson_aalen

    rng = random.Random(5)
    rows = [
        ("s", rng.randint(1, 30), rng.randint(0, 1)) for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "stratum string, t_day int, died int")
    curve = sorted(nelson_aalen(df).collect(), key=lambda r: r.t_day)
    hz = [r.cum_hazard for r in curve]
    assert all(b >= a for a, b in zip(hz, hz[1:]))
