"""Event-analytics operators: rollup levels, funnel ordering, cohort
math, cross-doc boilerplate, BM25 ranking."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.analytics import (
    cohort_retention,
    funnel_counts,
    time_rollup,
)
from timeseriesutils_spark.operators.text import bm25_search, cross_doc_dup_fraction


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, t, v) for i, (ts, u, t, v) in enumerate(rows)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_time_rollup_levels_are_consistent(spark):
    ev = _events(
        spark,
        [
            ("2024-01-01 00:00:10", 1, "view", 1.0),
            ("2024-01-01 00:00:50", 1, "view", 2.0),
            ("2024-01-01 00:05:00", 2, "click", 3.0),
            ("2024-01-01 01:00:00", 2, "view", 4.0),
            ("2024-01-02 00:00:00", 3, "view", 5.0),
        ],
    )
    out = time_rollup(ev).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r.level, []).append(r)
    # every level partitions all 5 events; finer levels have >= rows
    assert sum(r.n for r in by_level["day"]) == 5
    assert sum(r.n for r in by_level["hour"]) == 5
    assert sum(r.n for r in by_level["minute"]) == 5
    assert [r.n for r in by_level["total"]] == [5]
    assert by_level["total"][0].bucket_ms is None
    assert len(by_level["day"]) == 2
    assert len(by_level["hour"]) == 3
    assert len(by_level["minute"]) == 4
    assert math.isclose(by_level["total"][0].value_sum, 15.0)


def test_funnel_requires_step_order(spark):
    ev = _events(
        spark,
        [
            # u1: full ordered funnel
            ("2024-01-01 00:00:00", 1, "view", 0.0),
            ("2024-01-01 00:01:00", 1, "click", 0.0),
            ("2024-01-01 00:02:00", 1, "purchase", 0.0),
            # u2: purchase BEFORE view/click → reaches only step 1+2
            ("2024-01-01 00:00:00", 2, "purchase", 0.0),
            ("2024-01-01 00:01:00", 2, "view", 0.0),
            ("2024-01-01 00:02:00", 2, "click", 0.0),
            # u3: never clicks
            ("2024-01-01 00:00:00", 3, "view", 0.0),
            # u4: no view at all → not even step 1
            ("2024-01-01 00:00:00", 4, "click", 0.0),
        ],
    )
    rows = {r.step_name: r for r in funnel_counts(ev).collect()}
    assert rows["view"].n_users == 3
    assert rows["click"].n_users == 2
    assert rows["purchase"].n_users == 1
    assert rows["view"].conversion is None
    assert math.isclose(rows["click"].conversion, 2 / 3)
    assert math.isclose(rows["purchase"].conversion, 1 / 2)


def test_cohort_retention_offsets(spark):
    ev = _events(
        spark,
        [
            ("2024-01-01 10:00:00", 1, "view", 0.0),
            ("2024-01-03 10:00:00", 1, "view", 0.0),  # day-0 cohort, offset 2
            ("2024-01-03 10:00:00", 2, "view", 0.0),  # day-2 cohort, offset 0
            ("2024-01-01 11:00:00", 3, "view", 0.0),  # day-0 cohort, offset 0
        ],
    )
    got = {
        (r.cohort_day, r.day_offset): r.n_users for r in cohort_retention(ev).collect()
    }
    assert got == {(0, 0): 2, (0, 2): 1, (2, 0): 1}


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_cross_doc_dup_fraction(spark):
    shared = "a b c d e"
    docs = _docs(
        spark,
        [
            f"{shared} x y z",  # grams: 4 total, 1 shared
            f"{shared} p q r",
            "completely different words here now",  # nothing shared
        ],
    )
    got = {
        r.doc_id: r
        for r in cross_doc_dup_fraction(docs, n=5, min_docs=2).collect()
    }
    # 8 words → 4 5-grams; only "a b c d e" appears in 2 docs
    assert got[0].n_grams == 4 and got[0].n_shared == 1
    assert math.isclose(got[0].shared_frac, 0.25)
    assert got[2].n_shared == 0 and got[2].shared_frac == 0.0


def test_bm25_ranks_rarer_terms_higher(spark):
    docs = _docs(
        spark,
        [
            "rare common filler filler",
            "common filler filler filler",
            "common common filler filler",
            "filler filler filler filler",
        ],
    )
    out = bm25_search(docs, terms=("rare", "common"), top_k=10).collect()
    assert out[0].doc_id == 0  # holds the rare term → highest score
    ids = {r.doc_id for r in out}
    assert 3 not in ids  # no query term → not scored
    assert all(out[i].score >= out[i + 1].score for i in range(len(out) - 1))


def test_bm25_tf_saturation(spark):
    # doubling tf must increase the score sublinearly (k1 saturation)
    docs = _docs(
        spark,
        ["t x x x", "t t x x", "t t t t t t x x"],
    )
    s = {r.doc_id: r.score for r in bm25_search(docs, terms=("t",), top_k=10).collect()}
    assert s[1] > s[0]
    assert (s[1] - s[0]) < s[0]  # gain from the 2nd occurrence < base score


def test_scd2_history_collapses_unchanged_runs(spark):
    from timeseriesutils_spark.operators.sessions import scd2_history

    ev = _events(
        spark,
        [
            ("2024-01-01 00:00:00", 1, "view", 0.0),
            ("2024-01-01 00:01:00", 1, "view", 0.0),   # same attr → same interval
            ("2024-01-01 00:02:00", 1, "click", 0.0),  # change
            ("2024-01-01 00:03:00", 1, "view", 0.0),   # change back → NEW interval
            ("2024-01-01 00:00:00", 2, "error", 0.0),
        ],
    )
    rows = sorted(
        scd2_history(ev).collect(), key=lambda r: (r.user_id, r.valid_from_ms)
    )
    u1 = [r for r in rows if r.user_id == 1]
    assert [r.event_type for r in u1] == ["view", "click", "view"]
    assert [r.n_events for r in u1] == [2, 1, 1]
    # intervals tile: each valid_to equals the next valid_from; last open
    assert u1[0].valid_to_ms == u1[1].valid_from_ms
    assert u1[1].valid_to_ms == u1[2].valid_from_ms
    assert u1[2].valid_to_ms is None
    assert [r.event_type for r in rows if r.user_id == 2] == ["error"]


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_ohlc_deterministic_open_close(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # same-hour bucket, includes a timestamp TIE at t0+60s: the id
        # tie-break must pick id=2 for open ordering, not id=3
        (2, t0 + dt.timedelta(seconds=60), 1, "a", 5.0),
        (3, t0 + dt.timedelta(seconds=60), 1, "a", 9.0),
        (4, t0 + dt.timedelta(seconds=120), 1, "a", 1.0),
        (5, t0 + dt.timedelta(seconds=180), 1, "a", 7.0),
        (6, t0 + dt.timedelta(hours=2), 1, "a", 3.0),  # different bucket
    ]
    from timeseriesutils_spark.operators.analytics import ohlc

    out = {r["bucket_ms"]: r for r in ohlc(_ev(spark, rows)).collect()}
    assert len(out) == 2
    bar = out[min(out)]
    assert (bar["open"], bar["high"], bar["low"], bar["close"]) == (5.0, 9.0, 1.0, 7.0)
    assert bar["n"] == 4
    solo = out[max(out)]
    assert (solo["open"], solo["close"], solo["n"]) == (3.0, 3.0, 1)


def test_time_weighted_avg_trapezoid(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # value 0 for 10s then 10 for 30s: plain mean of samples = (0+10+10)/3,
    # but the trapezoidal TWA = (10s*5 + 30s*10)/40s = 8.75
    rows = [
        (1, t0, 1, "a", 0.0),
        (2, t0 + dt.timedelta(seconds=10), 1, "a", 10.0),
        (3, t0 + dt.timedelta(seconds=40), 1, "a", 10.0),
    ]
    from timeseriesutils_spark.operators.analytics import time_weighted_avg

    r = time_weighted_avg(_ev(spark, rows)).collect()[0]
    assert r["twa"] == pytest.approx(8.75, abs=1e-6)
    assert r["span_ms"] == 40_000
    # single-point group → NULL twa
    solo = time_weighted_avg(_ev(spark, [(9, t0, 2, "b", 4.0)])).collect()[0]
    assert solo["twa"] is None and solo["span_ms"] == 0


def test_detect_gaps(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a", 1.0),
        (2, t0 + dt.timedelta(minutes=5), 7, "a", 1.0),
        (3, t0 + dt.timedelta(minutes=200), 7, "a", 1.0),  # 195-min gap
        (4, t0 + dt.timedelta(minutes=210), 7, "a", 1.0),
    ]
    from timeseriesutils_spark.operators.analytics import detect_gaps

    gaps = detect_gaps(_ev(spark, rows), gap_minutes=120, group_columns=("user_id",)).collect()
    assert len(gaps) == 1
    assert gaps[0]["gap_ms"] == 195 * 60_000


def test_rolling_active_users_bruteforce(spark):
    """Interval-stabbing WAU == brute-force distinct count per day,
    including users with gappy multi-interval activity."""
    import datetime

    from timeseriesutils_spark.operators.analytics import rolling_active_users

    base = datetime.datetime(2024, 3, 1)
    # (user, day offset) activity; user 1 has a gap straddling windows
    acts = [(1, 0), (1, 1), (1, 9), (2, 0), (2, 12), (3, 5), (3, 6), (3, 7)]
    rows = [
        (u, base + datetime.timedelta(days=d, hours=h))
        for (u, d) in acts
        for h in (3, 15)  # two events per active day: dedup must collapse
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r.day: r.active_users
        for r in rolling_active_users(df, window_days=7).collect()
    }
    days = {d for _, d in acts}
    lo, hi = min(days), max(days)
    for e in range(lo, hi + 1):
        want = len({u for (u, d) in acts if e - 6 <= d <= e})
        key = (base + datetime.timedelta(days=e)).strftime("%Y-%m-%d")
        assert got[key] == want, (e, got[key], want)
    assert len(got) == hi - lo + 1


def test_funnel_latency_semantics(spark):
    """First view -> first at-or-after purchase; pre-view purchases are
    ignored; non-converting users drop out; quantiles are exact."""
    import datetime

    from timeseriesutils_spark.operators.analytics import funnel_latency

    t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
    s = lambda sec: t0 + datetime.timedelta(seconds=sec)
    rows = [
        # user 1: view at 0, purchases at -50 (ignored) and 10 -> 10s
        (1, s(-50), "purchase"), (1, s(0), "view"), (1, s(10), "purchase"),
        # user 2: view at 0, purchase at 30 -> 30s
        (2, s(0), "view"), (2, s(5), "view"), (2, s(30), "purchase"),
        # user 3: view only -> excluded
        (3, s(0), "view"),
        # user 4: purchase only -> excluded
        (4, s(1), "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, t, e, 0.0, "{}") for u, t, e in rows],
        "user_id long, ts timestamp, event_type string, value double, props string",
    )
    got = funnel_latency(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r.day == "2024-05-01" and r.n_converted == 2
    assert r.p50_ms == 20000.0 and r.p75_ms == 25000.0


def test_top_paths_order_and_truncation(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.sessions import top_paths

    rows = [
        # u1 day1: a>b ; u2 day1: a>b ; u3 day1: b>a  -> "a>b" wins
        (1, "2024-01-01 00:00:00", 1, "a"),
        (2, "2024-01-01 01:00:00", 1, "b"),
        (3, "2024-01-01 00:00:00", 2, "a"),
        (4, "2024-01-01 01:00:00", 2, "b"),
        (5, "2024-01-01 00:00:00", 3, "b"),
        (6, "2024-01-01 01:00:00", 3, "a"),
        # u1 day2: single-step path
        (7, "2024-01-02 00:00:00", 1, "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = top_paths(df, max_steps=8, top_n=10).collect()
    assert [(r.path, r.n_sessions, r.rnk) for r in sorted(out, key=lambda r: r.rnk)] == [
        ("a>b", 2, 1), ("b>a", 1, 2), ("c", 1, 3),
    ]
    # max_steps truncates: same data, paths capped at 1 step
    out1 = {r.path: r.n_sessions for r in top_paths(df, max_steps=1, top_n=10).collect()}
    assert out1 == {"a": 2, "b": 1, "c": 1}


def test_collapse_bursts_semantics(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.sessions import collapse_bursts

    rows = [
        # burst 1: chain 0s -> 5s -> 9s (each gap <= 8s); 20s starts burst 2
        ("a", 1, "2024-01-01 00:00:00"),
        ("a", 2, "2024-01-01 00:00:05"),
        ("a", 3, "2024-01-01 00:00:09"),
        ("a", 4, "2024-01-01 00:00:20"),
        # other key: independent bursts
        ("b", 5, "2024-01-01 00:00:06"),
    ]
    df = spark.createDataFrame(rows, "k string, event_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = sorted(
        collapse_bursts(df, ["k"], gap_seconds=8).collect(),
        key=lambda r: (r.k, r.burst_n),
    )
    assert [(r.k, r.event_id, r.burst_n, r.burst_size, r.burst_span_ms) for r in out] == [
        ("a", 1, 1, 3, 9000),
        ("a", 4, 2, 1, 0),
        ("b", 5, 1, 1, 0),
    ]


def test_funnel_window_depth_and_bound(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.analytics import funnel_window

    rows = [
        # u1 converts fully within 24h
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 01:00:00", 1, "click"),
        (3, "2024-01-01 02:00:00", 1, "purchase"),
        # u2: purchase BEFORE click -> order violated -> depth 1
        (4, "2024-01-01 00:00:00", 2, "view"),
        (5, "2024-01-01 01:00:00", 2, "purchase"),
        (6, "2024-01-01 02:00:00", 2, "click"),
        # u3: click past the 24h window -> depth 0
        (7, "2024-01-01 00:00:00", 3, "view"),
        (8, "2024-01-03 00:00:00", 3, "click"),
        # u4: no view at all -> excluded
        (9, "2024-01-01 00:00:00", 4, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.depth: r.n_users for r in
           funnel_window(df, ("view", "click", "purchase"), 24).collect()}
    assert out == {2: 1, 1: 1, 0: 1}


def test_merge_intervals_islands(spark):
    from timeseriesutils_spark.operators.sessions import merge_intervals

    rows = [
        ("u", 0, 10), ("u", 5, 20), ("u", 20, 30),   # chain: merge to [0,30]
        ("u", 40, 50),                                  # separate island
        ("v", 0, 5),                                    # other key isolated
        ("u", 7, 8),                                    # nested inside first
    ]
    df = spark.createDataFrame(rows, "k string, start_ms long, end_ms long")
    out = sorted(
        merge_intervals(df, ["k"]).collect(), key=lambda r: (r.k, r.episode_n)
    )
    assert [(r.k, r.start, r["end"], r.n_merged) for r in out] == [
        ("u", 0, 30, 4), ("u", 40, 50, 1), ("v", 0, 5, 1),
    ]


def test_state_dwell_intervals(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.analytics import state_dwell

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view"),     # 1h in view
        (2, "2024-01-01 01:00:00", 1, "cart"),     # 30m in cart
        (3, "2024-01-01 01:30:00", 1, "purchase"), # open episode: excluded
        (4, "2024-01-01 00:00:00", 2, "view"),     # 2h in view
        (5, "2024-01-01 02:00:00", 2, "view"),     # open: excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.state: r for r in state_dwell(df).collect()}
    assert out["view"].n_intervals == 2
    assert out["view"].total_dwell_ms == 3 * 3_600_000
    assert out["cart"].total_dwell_ms == 1_800_000
    assert "purchase" not in out


def test_period_over_period_dense_zero_fill(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.analytics import period_over_period

    rows = [
        (1, "2024-01-01 10:00:00", "a", 5.0),
        (2, "2024-01-03 10:00:00", "a", 7.0),  # Jan 2 missing -> dense 0
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.day: r for r in period_over_period(df, lag_days=2).collect()}
    # spine Jan1..Jan3; lag 2 -> only Jan 3 comparable: cur 7 vs prev 5
    assert list(out) == ["2024-01-03"]
    r = out["2024-01-03"]
    assert r.cur == 7.0 and r.prev == 5.0 and r.delta == 2.0
    assert abs(r.pct_change - 0.4) < 1e-12


def test_welch_ttest_detects_shift(spark):
    import math

    from timeseriesutils_spark.operators.stats import welch_ttest

    rows = [("a", 10.0 + (i % 5) * 0.1) for i in range(100)]
    rows += [("b", 12.0 + (i % 5) * 0.1) for i in range(80)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = welch_ttest(df, "v", "g", "a", "b").collect()[0]
    assert r.n_a == 100 and r.n_b == 80
    assert abs(r.mean_a - 10.2) < 1e-9 and abs(r.mean_b - 12.2) < 1e-9
    assert r.t_stat < -50  # huge shift vs tiny variance
    assert 100 < r.dof < 180 and math.isfinite(r.dof)


def test_wilson_daily_bounds(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.analytics import wilson_daily

    rows = []
    eid = 0
    for u in range(20):
        eid += 1
        rows.append((eid, "2024-01-01 10:00:00", u, "view"))
        if u < 5:
            eid += 1
            rows.append((eid, "2024-01-01 11:00:00", u, "purchase"))
    # a converter who was never exposed that day must not count
    rows.append((999, "2024-01-01 12:00:00", 777, "purchase"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = wilson_daily(df).collect()[0]
    assert r.n_exposed == 20 and r.n_converted == 5 and r.rate == 0.25
    assert 0.0 < r.wilson_lo < 0.25 < r.wilson_hi < 1.0
    # Wilson never escapes [0, 1] even at extreme p
    assert r.wilson_lo > 0.08 and r.wilson_hi < 0.5


def test_stickiness_ratio_bounds(spark):
    from pyspark.sql import functions as F

    rows = []
    eid = 0
    # users 1..5 active every day; user 6 only on day 3
    for d in range(1, 8):
        for u in range(1, 6):
            eid += 1
            rows.append((eid, f"2024-01-{d:02d} 09:00:00", u, "view"))
    rows.append((999, "2024-01-03 09:00:00", 6, "view"))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    from timeseriesutils_spark.operators.analytics import rolling_active_users

    dau = {r.day: r.active_users for r in rolling_active_users(df, window_days=1).collect()}
    wau = {r.day: r.active_users for r in rolling_active_users(df, window_days=7).collect()}
    assert dau["2024-01-03"] == 6 and dau["2024-01-04"] == 5
    assert wau["2024-01-07"] == 6  # user 6 still inside the 7-day window
    assert all(dau[d] <= wau[d] for d in dau)


def test_peak_concurrency_overlaps(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.analytics import peak_concurrency

    rows = [
        # three users online together 10:00-10:10 (30-min TTL extends all)
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:05:00", 2, "view"),
        (3, "2024-01-01 10:10:00", 3, "view"),
        # a lone user late that evening (others' TTLs long expired)
        (4, "2024-01-01 22:00:00", 1, "view"),
        # next day: single user
        (5, "2024-01-02 09:00:00", 2, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.day: r for r in peak_concurrency(df).collect()}
    assert out["2024-01-01"].peak_concurrent == 3
    assert out["2024-01-02"].peak_concurrent == 1
    assert out["2024-01-01"].n_sessions_touching == 4


def test_dirichlet_lm_prefers_matching_docs(spark):
    from timeseriesutils_spark.operators.text import dirichlet_lm_search
    import math

    docs = spark.createDataFrame(
        [
            (1, "spark joins windows spark"),
            (2, "spark only once here today"),
            (3, "nothing relevant at all friend"),
        ],
        "doc_id long, text string",
    )
    out = dirichlet_lm_search(docs, terms=("spark",), mu=10.0, top_k=10).collect()
    got = {r.doc_id: r.score for r in out}
    # doc 3 never matches a term -> not a candidate
    assert set(got) == {1, 2}
    assert got[1] > got[2]
    # closed form for doc 1: tf=2, dl=4, cf=3, T=14 (13 words? count):
    # corpus tokens = 4 + 5 + 5 = 14
    expect = math.log((2 + 10.0 * (3 / 14)) / (4 + 10.0))
    assert got[1] == math.floor(expect * 1e6 + 0.5) / 1e6


def test_dirichlet_lm_absent_corpus_term_contributes_zero(spark):
    from timeseriesutils_spark.operators.text import dirichlet_lm_search

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha beta")],
        "doc_id long, text string",
    )
    both = dirichlet_lm_search(docs, terms=("alpha",), mu=5.0).collect()
    with_ghost = dirichlet_lm_search(docs, terms=("alpha", "zzz"), mu=5.0).collect()
    assert {(r.doc_id, r.score) for r in both} == {
        (r.doc_id, r.score) for r in with_ghost
    }
