"""Unit tests for the time-grid and derived-signal operators
(operators/timegrid.py, series_math.py, sessions.py)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.sessions import session_stats, sessionize
from timeseriesutils_spark.operators.series_math import (
    diff,
    ewma,
    ewma_weights,
    pct_change,
    rolling_zscore,
)
from timeseriesutils_spark.operators.timegrid import (
    bfill,
    ffill,
    fill_gaps,
    interpolate_linear,
)


@pytest.fixture(scope="module")
def gappy(spark):
    # group a: days 0,1,4,5 (gap 2-3); group b: days 10,13 (gap 11-12)
    rows = [
        ("a", 0, 10.0),
        ("a", 1, 20.0),
        ("a", 4, 50.0),
        ("a", 5, None),
        ("b", 10, 1.0),
        ("b", 13, 7.0),
    ]
    return spark.createDataFrame(rows, "g string, t long, v double")


def test_fill_gaps_densifies(gappy):
    out = fill_gaps(gappy, "t", ["g"]).orderBy("g", "t").collect()
    assert [(r.g, r.t) for r in out] == [
        ("a", 0), ("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 5),
        ("b", 10), ("b", 11), ("b", 12), ("b", 13),
    ]
    by_key = {(r.g, r.t): r.v for r in out}
    assert by_key[("a", 2)] is None and by_key[("b", 12)] is None
    assert by_key[("a", 4)] == 50.0


def test_fill_gaps_chunked_matches_unchunked(gappy):
    a = fill_gaps(gappy, "t", ["g"], chunk=2).orderBy("g", "t").collect()
    b = fill_gaps(gappy, "t", ["g"], chunk=65536).orderBy("g", "t").collect()
    assert a == b


def test_ffill_bfill(gappy):
    filled = fill_gaps(gappy, "t", ["g"])
    out = bfill(
        ffill(filled, "v", ["g"], order_by=["t"]), "v", ["g"], order_by=["t"]
    )
    r = {(x.g, x.t): x for x in out.collect()}
    # interior gap carries last obs forward; bfill carries next obs back
    assert r[("a", 2)].v_ffill == 20.0 and r[("a", 3)].v_ffill == 20.0
    assert r[("a", 2)].v_bfill == 50.0
    # trailing null (a,5 observed as NULL) ffills from day 4
    assert r[("a", 5)].v_ffill == 50.0 and r[("a", 5)].v_bfill is None
    assert r[("b", 11)].v_ffill == 1.0 and r[("b", 11)].v_bfill == 7.0


def test_interpolate_linear(gappy):
    filled = fill_gaps(gappy, "t", ["g"])
    out = interpolate_linear(filled, "v", "t", ["g"], order_by=["t"])
    r = {(x.g, x.t): x.v_interp for x in out.collect()}
    assert r[("a", 2)] == pytest.approx(30.0)  # 20 + (50-20) * (1/3)
    assert r[("a", 3)] == pytest.approx(40.0)
    assert r[("b", 11)] == pytest.approx(3.0)  # 1 + (7-1) * (1/3)
    assert r[("b", 12)] == pytest.approx(5.0)
    assert r[("a", 0)] == 10.0  # observed rows pass through
    assert r[("a", 5)] is None  # trailing NULL: no next observation


def test_ewma_matches_manual(spark):
    vals = [1.0, 2.0, 4.0, 8.0, 16.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, t long, v double"
    )
    out, names = ewma(df, "v", ["g"], window_size=3, ew_span=5.0, order_by=["t"])
    assert names == ["v_ewma_w3_s5"]
    got = {r.t: r.v_ewma_w3_s5 for r in out.collect()}
    w = ewma_weights(3, 5.0)
    assert math.isclose(sum(w), 1.0, rel_tol=1e-12)
    assert got[0] is None and got[1] is None  # no full window yet
    for t in (2, 3, 4):
        expect = w[0] * vals[t] + w[1] * vals[t - 1] + w[2] * vals[t - 2]
        assert got[t] == pytest.approx(expect, rel=1e-12)


def test_diff_pct_change(spark):
    df = spark.createDataFrame(
        [("g", 0, 10.0), ("g", 1, 15.0), ("g", 2, 0.0), ("g", 3, 8.0)],
        "g string, t long, v double",
    )
    out, _ = diff(df, "v", ["g"], periods=1, order_by=["t"])
    out, _ = pct_change(out, "v", ["g"], periods=1, order_by=["t"])
    r = {x.t: x for x in out.collect()}
    assert r[0].v_diff1 is None
    assert r[1].v_diff1 == 5.0 and r[1].v_pctchg1 == pytest.approx(0.5)
    assert r[3].v_diff1 == 8.0
    assert r[3].v_pctchg1 is None  # base 0 → NULL, not inf/error


def test_rolling_zscore_flags_outlier(spark):
    vals = [10.0] * 9 + [11.0, 10.0, 10.0, 25.0]  # spike at the end
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, t long, v double"
    )
    out = rolling_zscore(df, "v", ["g"], window_size=10, order_by=["t"], threshold=2.0)
    r = {x.t: x for x in out.collect()}
    assert r[8].v_rollmean is None  # only 9 rows: not a full window
    assert r[9].v_rollmean == pytest.approx(10.1)
    assert r[12].v_anomaly == 1 and r[11].v_anomaly == 0
    # all-constant window: std 0 → z undefined, flag NULL not divide-by-zero
    flat = rolling_zscore(
        df.withColumn("v", F.lit(5.0)), "v", ["g"], window_size=10, order_by=["t"]
    )
    assert all(x.v_zscore is None for x in flat.collect())


def test_sessionize_gap_split(spark):
    m = 60_000
    rows = [
        # user 1: events at 0,10,20 min (one session), then 60,65 (second)
        Row(user_id=1, event_id=1, ts=0, value=1.0),
        Row(user_id=1, event_id=2, ts=10 * m, value=2.0),
        Row(user_id=1, event_id=3, ts=20 * m, value=3.0),
        Row(user_id=1, event_id=4, ts=60 * m, value=4.0),
        Row(user_id=1, event_id=5, ts=65 * m, value=5.0),
        # user 2: single event
        Row(user_id=2, event_id=6, ts=0, value=9.0),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.timestamp_millis(F.col("ts"))
    )
    s = sessionize(df, gap_minutes=30)
    got = {r.event_id: r.sess_n for r in s.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1}
    agg = session_stats(df, gap_minutes=30)
    r = {(x.user_id, x.sess_n): x for x in agg.collect()}
    assert r[(1, 1)].n_events == 3 and r[(1, 1)].duration_ms == 20 * m
    assert r[(1, 2)].value_sum == 9.0
    assert r[(2, 1)].n_events == 1 and r[(2, 1)].duration_ms == 0


def test_regularize_equals_composed_pipeline(spark):
    """Fused regularize must be row-identical to fill_gaps + ffill /
    interpolate_linear, including with a tiny chunk bound forcing the
    two-level gap explode."""
    import random

    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.timegrid import (
        ffill,
        fill_gaps,
        interpolate_linear,
        regularize,
    )

    rng = random.Random(11)
    rows = []
    for g in range(5):
        t = 0
        for _ in range(rng.randint(2, 30)):
            rows.append((g, t, round(rng.uniform(-5, 5), 3)))
            t += rng.randint(1, 40)  # gaps up to 40 ticks
    df = spark.createDataFrame(rows, "g long, t long, v double")

    def canon(d):
        return sorted(map(tuple, d.collect()))

    for chunk in (65536, 7):
        fused_f = regularize(df, "v", "t", ["g"], how="ffill", chunk=chunk)
        composed_f = ffill(
            fill_gaps(df, "t", ["g"], chunk=chunk), "v", ["g"], order_by=["t"]
        ).select("g", "t", "v", "v_ffill")
        assert canon(fused_f) == canon(composed_f)

        fused_i = regularize(df, "v", "t", ["g"], how="interp", chunk=chunk)
        composed_i = interpolate_linear(
            fill_gaps(df, "t", ["g"], chunk=chunk), "v", "t", ["g"], order_by=["t"]
        ).select("g", "t", "v", "v_interp")
        assert canon(fused_i) == canon(composed_i)

    spine = regularize(df, "v", "t", ["g"], how="spine")
    assert canon(spine) == canon(
        fill_gaps(df, "t", ["g"]).select("g", "t", "v")
    )
    # spine is dense: per group, rowcount = max - min + 1
    got = spine.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), (F.max("t") - F.min("t") + 1).alias("want")
    )
    assert all(r.n == r.want for r in got.collect())


def test_cusum_matches_recursion(spark):
    """Closed-form prefix-extrema CUSUM == the textbook max(0, ...)
    recursion, on random gappy series (including negative drift)."""
    import random

    from timeseriesutils_spark.operators.changepoint import cusum

    rng = random.Random(7)
    rows = []
    for g in range(6):
        t = 0
        base = rng.uniform(-10, 10)
        for _ in range(rng.randint(3, 60)):
            rows.append((g, t, round(base + rng.uniform(-3, 3), 2)))
            t += rng.randint(1, 5)
    df = spark.createDataFrame(rows, "g long, t long, v double")

    k, h, scale = 1.5, 4.0, 2
    got = {
        (r.g, r.t): (r.v_cusum_pos, r.v_cusum_neg, r.v_cusum_alarm)
        for r in cusum(df, "v", "t", ["g"], target=k, threshold=h, scale=scale).collect()
    }

    mult = 10**scale
    kq, hq = round(k * mult), round(h * mult)
    by_g = {}
    for g, t, v in rows:
        by_g.setdefault(g, []).append((t, v))
    checked = 0
    for g, series in by_g.items():
        sp = sn = 0
        for t, v in sorted(series):
            d = int(math_floor(v * mult + 0.5)) - kq
            sp = max(0, sp + d)
            sn = max(0, sn - d)
            want = (sp / mult, sn / mult, sp > hq or sn > hq)
            assert got[(g, t)] == want, (g, t, got[(g, t)], want)
            checked += 1
    assert checked == len(rows)


def math_floor(x):
    import math

    return math.floor(x)


def test_rolling_mad_textbook(spark):
    """MAD is the median of deviations from the WINDOW's median (one
    spike can't mask itself), cross-checked against numpy per row."""
    import numpy as np

    from timeseriesutils_spark.operators.series_math import MAD_K, rolling_mad

    vals = [10.0, 11.0, 9.0, 10.5, 10.0, 200.0, 10.2, 9.8, 10.1, 10.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g long, t long, v double")
    got = {
        r.t: (r.v_med_w5, r.v_mad_w5, r.v_mad_anomaly)
        for r in rolling_mad(df, "v", ["g"], window_size=5, order_by=["t"]).collect()
    }
    for t in range(len(vals)):
        w = np.array(vals[max(0, t - 4) : t + 1])
        med = float(np.quantile(w, 0.5, method="linear"))
        mad = float(np.quantile(np.abs(w - med), 0.5, method="linear"))
        gm, gmad, gflag = got[t]
        assert abs(gm - med) < 1e-9 and abs(gmad - mad) < 1e-9, (t, got[t], med, mad)
        assert gflag == (abs(vals[t] - med) > 3.0 * MAD_K * mad)
    # the spike itself is flagged; its neighbors are not masked
    assert got[5][2] is True and got[6][2] is False


def test_ew_volatility_numpy_parity(spark):
    """EW var/vol == numpy weighted moments with the same reference
    weights; constant windows clamp to exactly vol=0."""
    import numpy as np

    from timeseriesutils_spark.operators.series_math import (
        ew_volatility,
        ewma_weights,
    )

    vals = [3.0, 4.0, 5.5, 2.0, 2.0, 2.0, 2.0, 2.0, 7.5, 1.0, 6.0, 6.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    # constant group: vol must be a float-residue epsilon, never NaN
    # (negative residue is clamped; positive residue is inherent to
    # the m2 - mu^2 form and bounded by ~ulp(x^2))
    rows += [(2, i, 5.0) for i in range(8)]
    df = spark.createDataFrame(rows, "g long, t long, v double")
    w, span = 4, 3.0
    out = ew_volatility(df, "v", ["g"], window_size=w, ew_span=span, order_by=["t"])
    got = {(r.g, r.t): (r.v_ewma_w4_s3, r.v_ewvar_w4_s3, r.v_ewvol_w4_s3)
           for r in out.collect()}
    wts = np.array(ewma_weights(w, span))
    for t in range(len(vals)):
        if t < w - 1:
            assert got[(1, t)] == (None, None, None)
            continue
        win = np.array(vals[t - w + 1 : t + 1])[::-1]
        mu = float(wts @ win)
        var = float(wts @ (win * win)) - mu * mu
        gm, gv, gs = got[(1, t)]
        assert abs(gm - mu) < 1e-9 and abs(gv - var) < 1e-9
        assert abs(gs - np.sqrt(max(var, 0.0))) < 1e-9
    for t in range(w - 1, 8):
        v = got[(2, t)][2]
        assert v == v and 0.0 <= v < 1e-6  # not NaN, residue-sized


def test_local_peaks_plateau_and_bounds(spark):
    from timeseriesutils_spark.operators.series_math import local_peaks

    vals = [1.0, 5.0, 5.0, 2.0, 1.0, 9.0, 1.0, 3.0]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = sorted(
        local_peaks(df, "v", "t", ["g"], neighborhood=2).collect(),
        key=lambda r: r.t,
    )
    # plateau 5,5: only the FIRST (t=1) is a peak; 9 at t=5 is a peak;
    # 3 at t=7 beats its left neighborhood {9? no: prev 2 = [9,1]} -> not
    assert [(r.t, r.v) for r in out] == [(1, 5.0), (5, 9.0)]
    got = {r.t: r.prominence for r in out}
    assert got[5] == 6.0  # 9 - max(prev {2,1}, next {1,3}) = 9 - 3


def test_local_peaks_min_value(spark):
    from timeseriesutils_spark.operators.series_math import local_peaks

    rows = [("g", 1, 1.0), ("g", 2, 3.0), ("g", 3, 1.0)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    assert local_peaks(df, "v", "t", ["g"], min_value=5.0).count() == 0
    assert local_peaks(df, "v", "t", ["g"], min_value=2.0).count() == 1


def test_rolling_slope_linear_series(spark):
    from timeseriesutils_spark.operators.series_math import rolling_slope

    # exact line y = 3t + 1: every full window has slope exactly 3
    rows = [("g", i, 3.0 * i + 1.0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = {r.t: r.v_slope for r in
           rolling_slope(df, "v", "t", ["g"], window=5, min_periods=3).collect()}
    assert out[1] is None and out[2] is None  # below min_periods
    assert all(abs(out[t] - 3.0) < 1e-9 for t in range(3, 21))

    # flat series -> slope 0
    df2 = spark.createDataFrame([("g", i, 7.0) for i in range(1, 11)],
                                "g string, t long, v double")
    out2 = [r.v_slope for r in
            rolling_slope(df2, "v", "t", ["g"], window=5).collect()]
    assert all(s is None or abs(s) < 1e-12 for s in out2)


def test_threshold_crossings_edges_only(spark):
    from timeseriesutils_spark.operators.series_math import threshold_crossings

    vals = [5.0, 3.0, 2.0, 1.0, 4.0, 6.0, 2.0]  # crossings of 3.5: down@3, up@4(v=4)... see asserts
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = sorted(
        threshold_crossings(df, "v", ["t"], ["g"], threshold=3.5).collect(),
        key=lambda r: r.t,
    )
    # 5->3 crosses down once (stays below through 2,1 without re-firing),
    # 1->4 crosses up once, 6->2 crosses down again
    assert [(r.t, r.direction) for r in out] == [
        (1, "down"), (4, "up"), (6, "down"),
    ]
    # first sample never fires even when below threshold
    df2 = spark.createDataFrame([("g", 1, 0.0), ("g", 2, 0.5)], "g string, t long, v double")
    assert threshold_crossings(df2, "v", ["t"], ["g"], threshold=3.5).count() == 0


def test_rolling_quantile_window_bound_and_values(spark):
    from timeseriesutils_spark.operators.stats import rolling_quantile

    rows = [("a", t, float(t)) for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = {
        r.t: r
        for r in rolling_quantile(
            df, "v", ["g"], ["t"], qs=(0.5,), window_size=4
        ).collect()
    }
    # full window at t>=3: median of {t-3..t} = t - 1.5
    for t in range(3, 10):
        assert out[t].v_p50_w4 == t - 1.5
    # partial windows: median of {0..t}
    assert out[0].v_p50_w4 == 0.0
    assert out[1].v_p50_w4 == 0.5
    assert out[2].v_p50_w4 == 1.0


def test_best_breakpoint_finds_planted_shift(spark):
    from timeseriesutils_spark.operators.changepoint import best_breakpoint

    rows = [("a", t, 10.0) for t in range(20)]
    rows += [("a", t, 30.0) for t in range(20, 40)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = best_breakpoint(df, "v", "t", ["g"]).collect()[0]
    assert out.n == 40
    assert out.break_t == 19  # last index of the left segment
    assert out.cost_best == 0.0
    # cost_nosplit = n * var = 40 * 100 (two equal halves +-10 from mean 20)
    assert out.cost_nosplit == pytest.approx(4000.0)
    assert out.gain == pytest.approx(4000.0)


def test_best_breakpoint_tie_breaks_earliest_and_min_seg(spark):
    from timeseriesutils_spark.operators.changepoint import best_breakpoint

    # constant series: every split costs the same (0) -> earliest valid k
    rows = [("a", t, 5.0) for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = best_breakpoint(df, "v", "t", ["g"], min_seg=3).collect()[0]
    assert out.break_t == 2  # k = min_seg -> 0-based t index 2
    assert out.gain == 0.0


def test_rolling_slope_nulls_excluded_from_all_stats(spark):
    """A NULL inside the window contributes to NONE of the sufficient
    statistics: the slope over [0,2,NULL,6] at t=0..3 equals the OLS of
    the three observed points against their positions."""
    from timeseriesutils_spark.operators.series_math import rolling_slope

    rows = [("a", 0, 0.0), ("a", 1, 2.0), ("a", 2, None), ("a", 3, 6.0)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = {r.t: r for r in rolling_slope(
        df, "v", "t", ["g"], window=4, min_periods=3
    ).collect()}
    # positions i = 1,2,4 (row_number), y = 0,2,6: exact OLS slope
    import numpy as np
    i = np.array([1.0, 2.0, 4.0]); y = np.array([0.0, 2.0, 6.0])
    n = 3; num = n * (i * y).sum() - i.sum() * y.sum()
    den = n * (i * i).sum() - i.sum() ** 2
    assert out[3].v_slope == pytest.approx(num / den)
