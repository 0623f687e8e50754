"""Round-13 tests: ADVICE-r12 regression fixes + new operators."""

import math

import pytest
from pyspark.sql import functions as F


# --- ADVICE r12 fixes -------------------------------------------------------


def test_mmd_quad_drift_sql_twin_has_max_dim_guard():
    """The DuckDB twin must raise for d > max_dim like the Spark plan
    does (ADVICE r12: the guard was Spark-only, so the two sides of the
    query contract diverged — driver error vs oracle rows)."""
    import duckdb
    import pandas as pd

    from timeseriesutils_spark.operators.similarity import mmd_quad_drift_sql

    t = pd.DataFrame(
        {
            "vec": [[float(i) for i in range(8)] for _ in range(6)],
            "s": [1, 1, 1, 2, 2, 2],
        }
    )
    con = duckdb.connect()
    con.register("t", t)
    # d=8 <= max_dim default: runs
    rows = con.execute(
        mmd_quad_drift_sql("SELECT * FROM t", "vec", "s")
    ).fetchall()
    assert len(rows) == 1
    # max_dim below d: raises with the same message family as Spark
    with pytest.raises(Exception, match="max_dim"):
        con.execute(
            mmd_quad_drift_sql("SELECT * FROM t", "vec", "s", max_dim=4)
        ).fetchall()


def test_granger_moments_widen_before_multiply(spark):
    """Values whose quantized square exceeds int64 (~9.2e18) must not
    wrap silently on the Spark side (ADVICE r12: operand-first DECIMAL
    cast).  The DuckDB twin is exact in HUGEINT, so agreement on the
    moments/RSS is the wrap-free witness."""
    import duckdb

    from timeseriesutils_spark.operators.granger import (
        granger_causality,
        granger_causality_sql,
    )

    # scale=2 quantization -> _y ~ 3.2e9, _y*_y ~ 1.0e19 > 2^63-1
    big = 3.2e7
    rows = [
        ("g", i, big + 1000.0 * i + (37 * i % 11), big / 2 + 500.0 * i)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "g string, t int, y double, x double")
    got = granger_causality(df, "y", "x", ["g"], ["t"]).collect()[0]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = granger_causality_sql("SELECT * FROM t", "y", "x", ["g"], ["t"])
    exp = con.execute(sql).fetchdf().iloc[0]
    assert got["n"] == exp["n"]
    for c in ("rss_r", "rss_u", "f_stat"):
        if exp[c] is None or (isinstance(exp[c], float) and math.isnan(exp[c])):
            assert got[c] is None
        else:
            assert got[c] == pytest.approx(float(exp[c]), rel=1e-9, abs=1e-9)
    # and the stats are sane, not wrap garbage
    assert got["rss_u"] is None or got["rss_u"] >= 0.0


def test_yuen_big_values_no_int64_wrap(spark):
    """yuen_test's Σv² accumulates values whose squares exceed int64;
    the operand-first DECIMAL/HUGEINT cast keeps both engines exact and
    agreeing (ADVICE r12)."""
    import duckdb

    from timeseriesutils_spark.operators.stats import yuen_test, yuen_test_sql

    big = 3.2e7  # quantized square ~1.0e19 > 2^63-1
    rows = [("a", big + 100.0 * i) for i in range(10)] + [
        ("b", big + 130.0 * i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "arm string, v double")
    got = yuen_test(df, "v", "arm", "a", "b").collect()[0]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    exp = con.execute(yuen_test_sql("t", "v", "arm", "a", "b")).fetchdf().iloc[0]
    for c in ("tmean_a", "tmean_b", "diff", "se", "t_stat", "df"):
        assert got[c] == pytest.approx(float(exp[c]), rel=1e-9, abs=1e-9)
    assert got["se"] > 0.0  # a wrapped Σv² gives negative variance


def test_did_estimator_degenerate_cell_is_null_not_nan(spark):
    """An empty 2x2 cell must yield NULL means/did, not the 0/0 NaN
    (ADVICE r12: the ok predicate gated only se/t_stat)."""
    from timeseriesutils_spark.operators.analytics import did_estimator

    # every event pre-cutover -> both post cells empty
    rows = [(f"u{i}", "2024-01-0%d" % (1 + i % 9), float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "user_id string, ts string, value double")
    r = did_estimator(df, "value", cutover="2024-06-01").collect()[0]
    assert r["n_ctrl_post"] == 0 and r["n_treat_post"] == 0
    for c in ("mean_ctrl_post", "mean_treat_post", "did", "se", "t_stat"):
        assert r[c] is None, c
    for c in ("mean_ctrl_pre", "mean_treat_pre"):
        v = r[c]
        assert v is not None and not math.isnan(v), c


# --- chunked matrix profile (monster-series mitigation) ---------------------


def test_matrix_profile_chunked_bit_identical(spark):
    """Chunk-parallel banded profile must equal the unchunked plan
    bit-for-bit at any chunk size >= band + w (two-sided context
    correctness), including chunks larger than the series."""
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    rows = [
        ("s", i, 10.0 + 3.0 * math.sin(i / 3.0) + (0.37 * i % 2.1))
        for i in range(300)
    ] + [("t", i, 5.0 + (i * i * 0.37 % 7.0)) for i in range(97)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    plain = sorted(
        map(tuple, matrix_profile(df, "v", ["g"], ["t"], w=8, band=20, excl=4).collect())
    )
    assert len(plain) > 0
    for C in (28, 64, 400):
        chunked = sorted(
            map(
                tuple,
                matrix_profile(
                    df, "v", ["g"], ["t"], w=8, band=20, excl=4, chunk_rows=C
                ).collect(),
            )
        )
        assert chunked == plain, f"chunk_rows={C}"


def test_matrix_profile_chunked_rejects_thin_chunks(spark):
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    df = spark.createDataFrame([("s", 1, 1.0)], "g string, t int, v double")
    with pytest.raises(ValueError, match="chunk_rows"):
        matrix_profile(df, "v", ["g"], ["t"], w=8, band=20, excl=4, chunk_rows=20)


def test_stl_robust_edge_margin_matches_stl_decompose(spark):
    """rho=0 pass-1 margin rows must not widen stl_robust's NULL margin
    past stl_decompose's complete-window margin (ADVICE r12: 0*NULL
    poisoning of the weighted smoother)."""
    from timeseriesutils_spark.operators.stl import stl_decompose, stl_robust

    n, P = 120, 7
    rows = [
        ("s", i, 10.0 + 0.05 * i + 3.0 * math.sin(2 * math.pi * i / P))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    base = stl_decompose(df, "v", "t", ["g"], period=P)
    rob = stl_robust(df, "v", "t", ["g"], period=P)
    n_seas_base = base.filter(F.col("seasonal").isNotNull()).count()
    n_seas_rob = rob.filter(F.col("seasonal").isNotNull()).count()
    n_tr_base = base.filter(F.col("trend").isNotNull()).count()
    n_tr_rob = rob.filter(F.col("trend").isNotNull()).count()
    assert n_seas_rob >= n_seas_base
    assert n_tr_rob >= n_tr_base
    assert n_tr_rob > 0


# --- reconcile_forecasts -----------------------------------------------------


def _hier_data(spark):
    import numpy as np
    import datetime as dt

    rng = np.random.RandomState(7)
    rows = []
    for i in range(9):
        b, g = f"n{i}", f"r{i % 3}"
        for day in range(40):
            for _ in range(rng.randint(1, 4)):
                rows.append(
                    (
                        b, g,
                        (dt.date(2024, 1, 1) + dt.timedelta(days=day)).isoformat(),
                        float(rng.uniform(10, 500)),
                    )
                )
    return spark.createDataFrame(rows, "b string, g string, d string, v double")


def test_reconcile_matches_numpy_ols_projection(spark):
    """The block Sherman-Morrison closed form must equal the literal
    S(S'S)^-1 S' projection of the base forecasts."""
    import numpy as np

    from timeseriesutils_spark.operators.reconcile import reconcile_forecasts

    got = reconcile_forecasts(_hier_data(spark), "v", "d", "b", "g").toPandas()
    bot = got[got.level == "bottom"].sort_values("node")
    grp = got[got.level == "group"].sort_values("node")
    tot = got[got.level == "total"]
    nodes = list(bot.node)
    groups = sorted(set(grp.node))
    gi = {n: f"r{int(n[1:]) % 3}" for n in nodes}
    S, yhat = [[1] * len(nodes)], [float(tot.base.iloc[0])]
    for gg in groups:
        yhat.append(float(grp[grp.node == gg].base.iloc[0]))
        S.append([1 if gi[n] == gg else 0 for n in nodes])
    for n in nodes:
        yhat.append(float(bot[bot.node == n].base.iloc[0]))
        S.append([1 if nn == n else 0 for nn in nodes])
    S = np.array(S, float)
    yhat = np.array(yhat)
    ols = S @ np.linalg.solve(S.T @ S, S.T @ yhat)
    got_ols = (
        [float(tot.reconciled_ols.iloc[0])]
        + [float(grp[grp.node == gg].reconciled_ols.iloc[0]) for gg in groups]
        + [float(bot[bot.node == n].reconciled_ols.iloc[0]) for n in nodes]
    )
    assert np.abs(np.array(got_ols) - ols).max() < 1e-5


def test_reconcile_coherence_exact(spark):
    """Aggregated reconciled == reconciled aggregate, EXACTLY (the
    quantize-then-sum design): bottoms sum to groups sum to total for
    both methods."""
    from timeseriesutils_spark.operators.reconcile import reconcile_forecasts

    got = reconcile_forecasts(_hier_data(spark), "v", "d", "b", "g").toPandas()
    bot = got[got.level == "bottom"]
    grp = got[got.level == "group"]
    tot = got[got.level == "total"]
    for col in ("reconciled_bu", "reconciled_ols"):
        for gg, sub in bot.groupby(bot.node.str[1:].astype(int) % 3):
            pass  # group membership asserted via sums below
        assert abs(bot[col].sum() - tot[col].iloc[0]) < 1e-9
        assert abs(grp[col].sum() - tot[col].iloc[0]) < 1e-9
    # base forecasts are genuinely incoherent (medians), so OLS != BU
    assert (bot.reconciled_ols - bot.reconciled_bu).abs().max() > 1e-6


# --- conformal_intervals -----------------------------------------------------


def test_conformal_coverage_and_rank(spark):
    """Empirical coverage >= nominal on planted iid data, and the rank
    selection is the exact ceil((n+1)(1-alpha)) order statistic."""
    import numpy as np

    from timeseriesutils_spark.operators.conformal import conformal_intervals

    rng = np.random.RandomState(11)
    W, n = 14, 80
    rows = []
    for gi in range(40):
        y = 50 + rng.normal(0, 5, n)
        rows += [(f"g{gi}", t, float(y[t])) for t in range(n)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = conformal_intervals(df, "v", "t", ["g"], fit_window=W).toPandas()
    assert len(out) == 40 and out.q_score.notna().all()
    # replicate one group's rank selection in numpy (quantized grid)
    y = np.array([r[2] for r in rows if r[0] == "g0"])
    yq = np.floor(y * 100 + 0.5)
    resid = sorted(
        abs(yq[i] * W - yq[i - W:i].sum()) for i in range(W, n - 1)
    )
    ncal = len(resid)
    rank = ((ncal + 1) * 9 + 9) // 10
    exp_q = resid[rank - 1] / (W * 100)
    assert float(out[out.g == "g0"].q_score.iloc[0]) == exp_q
    # coverage: the next point falls inside the interval >= ~90%
    hits = 0
    for gi in range(40):
        yg = np.array([r[2] for r in rows if r[0] == f"g{gi}"])
        row = out[out.g == f"g{gi}"].iloc[0]
        nxt = 50 + rng.normal(0, 5)  # fresh draw from the same dist
        hits += row.lo - (yg[-W:].mean() - row.point_forecast) <= nxt <= row.hi + 1e-9 or (
            row.lo <= nxt <= row.hi
        )
    assert hits / 40 >= 0.8  # finite-sample slack on 40 groups


def test_conformal_short_series_unbounded(spark):
    """Too little calibration data -> NULL interval (rank > n_cal),
    and series shorter than the fit window drop out entirely."""
    from timeseriesutils_spark.operators.conformal import conformal_intervals

    rows = [("a", t, float(t)) for t in range(16)] + [
        ("tiny", t, float(t)) for t in range(5)
    ]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = conformal_intervals(df, "v", "t", ["g"], fit_window=14).toPandas()
    assert list(out.g) == ["a"]
    r = out.iloc[0]
    assert r.n_cal == 1 and r.point_forecast is not None
    import math

    assert r.q_score is None or math.isnan(r.q_score)


# --- mstl_decompose ----------------------------------------------------------


def test_mstl_recovers_planted_multi_seasonality(spark):
    """Two planted sinusoids (P=7, P=14) must land in their own
    seasonal components with near-planted variance and a small
    remainder."""
    import numpy as np

    from timeseriesutils_spark.operators.stl import mstl_decompose

    rows = []
    for gi in range(2):
        for t in range(500):
            v = (
                100 + 0.2 * t
                + 8 * math.sin(2 * math.pi * t / 7)
                + 5 * math.sin(2 * math.pi * t / 14)
                + ((t * 37) % 11) * 0.3
            )
            rows.append((f"g{gi}", t, v + gi))
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = mstl_decompose(df, "v", "t", ["g"], periods=(7, 14)).toPandas()
    r = out.dropna()
    assert len(r) > 500  # margins cost ~190 rows/side/series
    assert abs(r.seasonal_p7.var() - 32.0) < 4.0  # 8^2/2
    assert abs(r.seasonal_p14.var() - 12.5) < 3.0  # 5^2/2
    assert r.remainder.var() < 1.0
    # identity holds row-wise
    resid = (
        r.value - r.seasonal_p7 - r.seasonal_p14 - r.trend - r.remainder
    )
    assert resid.abs().max() < 1e-9


def test_mstl_rejects_bad_periods(spark):
    from timeseriesutils_spark.operators.stl import (
        mstl_decompose,
        mstl_decompose_sql,
    )

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, t int, v double")
    with pytest.raises(ValueError, match="ascending"):
        mstl_decompose(df, "v", "t", ["g"], periods=(14, 7))
    with pytest.raises(ValueError, match="two periods"):
        mstl_decompose_sql("t", "v", "t", ["g"], periods=(7,))


def test_reconcile_topdown_shares_and_coherence(spark):
    """Top-down rows must be the total base split by historical revenue
    share (numpy parity) and exactly coherent after quantize-then-sum."""
    import numpy as np

    from timeseriesutils_spark.operators.reconcile import reconcile_forecasts

    got = reconcile_forecasts(_hier_data(spark), "v", "d", "b", "g").toPandas()
    bot = got[got.level == "bottom"].sort_values("node")
    tot = got[got.level == "total"].iloc[0]
    grp = got[got.level == "group"]
    # shares proportional to each node's window revenue; bottoms sum to total
    assert abs(bot.reconciled_td.sum() - tot.reconciled_td) < 1e-9
    assert abs(grp.reconciled_td.sum() - tot.reconciled_td) < 1e-9
    # the total-level td approximately re-assembles the total base
    assert abs(tot.reconciled_td - tot.base) < 1e-3
    # every bottom share positive and below the total
    assert (bot.reconciled_td > 0).all()
    assert (bot.reconciled_td < tot.reconciled_td).all()


def test_cqr_width_tracks_heteroskedasticity(spark):
    """CQR's interval width must grow with per-group noise scale (the
    adaptive-width property conformal_intervals lacks), and bottoms out
    near the planted quantile spread."""
    import numpy as np

    from timeseriesutils_spark.operators.conformal import cqr_intervals

    rng = np.random.RandomState(5)
    rows = []
    for gi, sd in ((0, 1.0), (1, 8.0)):
        for t in range(120):
            rows.append((f"g{gi}", t, 50.0 + float(rng.normal(0, sd))))
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = cqr_intervals(df, "v", "t", ["g"], fit_window=20).toPandas()
    w = {r.g: r.hi - r.lo for r in out.itertuples()}
    assert w["g1"] > 3.0 * w["g0"]  # width scales with noise


def test_cqr_signed_scores_can_shrink(spark):
    """With a wide base quantile pair and tight data, the calibrated
    adjustment is NEGATIVE (the base interval shrinks) — the property
    that distinguishes CQR's signed score from absolute-residual
    conformal."""
    from timeseriesutils_spark.operators.conformal import cqr_intervals

    rows = [("g", t, 100.0 + (t % 3) * 0.01) for t in range(200)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = cqr_intervals(
        df, "v", "t", ["g"], fit_window=40, alpha_num=3, alpha_den=10
    ).toPandas()
    assert len(out) == 1 and float(out.q_adjust.iloc[0]) <= 0.0


def test_bpe_encode_matches_pure_python(spark):
    """Per-doc token counts must equal a straight-line Python BPE
    (train greedy argmax with the same tiebreak, then greedy leftmost
    merge application per word)."""
    from collections import Counter

    from timeseriesutils_spark.operators.bpe import bpe_encode

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the thematic theme of the thesis"),
        (3, "a cat and another cat sat"),
    ]

    def py_train(texts, n_merges, min_len=2):
        vocab = Counter(
            w for t in texts for w in t.lower().split() if len(w) >= min_len
        )
        words = {w: list(w) for w in vocab}
        merges = []
        for _ in range(n_merges):
            pairs = Counter()
            for w, syms in words.items():
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] += vocab[w]
            if not pairs:
                break
            (l, r), _ = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((l, r, l + r))
            for w, syms in words.items():
                out = []
                for x in syms:
                    if out and out[-1] == l and x == r:
                        out[-1] = l + r
                    else:
                        out.append(x)
                words[w] = out
        return merges

    def py_encode(word, merges):
        syms = list(word)
        for l, r, m in merges:
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = m
                else:
                    out.append(x)
            syms = out
        return len(syms)

    merges = py_train([t for _, t in docs], 4)
    exp = {
        i: sum(py_encode(w, merges) for w in t.lower().split())
        for i, t in docs
    }
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_encode(df, n_merges=4).collect()
    }
    assert got == exp


def test_reconcile_wls_matches_numpy_projection(spark):
    """The structural-WLS closed form must equal the literal
    S(S'W^-1 S)^-1 S'W^-1 projection with W = diag(S*1)."""
    import numpy as np

    from timeseriesutils_spark.operators.reconcile import reconcile_forecasts

    got = reconcile_forecasts(_hier_data(spark), "v", "d", "b", "g").toPandas()
    bot = got[got.level == "bottom"].sort_values("node")
    grp = got[got.level == "group"].sort_values("node")
    tot = got[got.level == "total"]
    nodes = list(bot.node)
    groups = sorted(set(grp.node))
    gi = {n: f"r{int(n[1:]) % 3}" for n in nodes}
    S, yhat = [[1] * len(nodes)], [float(tot.base.iloc[0])]
    for gg in groups:
        yhat.append(float(grp[grp.node == gg].base.iloc[0]))
        S.append([1 if gi[n] == gg else 0 for n in nodes])
    for n in nodes:
        yhat.append(float(bot[bot.node == n].base.iloc[0]))
        S.append([1 if nn == n else 0 for nn in nodes])
    S = np.array(S, float)
    yhat = np.array(yhat)
    Winv = np.diag(1.0 / S.sum(axis=1))
    wls = S @ np.linalg.solve(S.T @ Winv @ S, S.T @ Winv @ yhat)
    got_wls = (
        [float(tot.reconciled_wls.iloc[0])]
        + [float(grp[grp.node == gg].reconciled_wls.iloc[0]) for gg in groups]
        + [float(bot[bot.node == n].reconciled_wls.iloc[0]) for n in nodes]
    )
    assert np.abs(np.array(got_wls) - wls).max() < 1e-5
    assert abs(bot.reconciled_wls.sum() - tot.reconciled_wls.iloc[0]) < 1e-9


def test_streaming_conformal_multi_batch_equals_batch(spark, tmp_path):
    """streaming_conformal's drained state across forced micro-batch
    boundaries must equal the single-pass batch closed form — rings and
    the residual window survive the batch cut."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window as W

    from timeseriesutils_spark.streaming.windows import streaming_conformal

    rng = np.random.RandomState(2)
    rows = []
    for k in ("a", "b"):
        for t in range(60):
            rows.append((k, t, t, 50.0 + float(rng.normal(0, 4))))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "value"])
    src = tmp_path / "src"
    src.mkdir()
    # split mid-stream so windows straddle the micro-batch boundary
    pdf[pdf.ts < 25].to_parquet(src / "a.parquet")
    pdf[pdf.ts >= 25].to_parquet(src / "b.parquet")
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_conformal(
        stream, fit_window=10, cal_window=20, scale=2
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_sconf")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    upd = spark.sql("SELECT * FROM t_sconf")
    w = W.partitionBy("user_id").orderBy(F.col("n_seen").desc())
    got = {
        r.user_id: (r.n_seen, r.n_cal, r.q_score, r.point_forecast, r.lo, r.hi)
        for r in upd.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .collect()
    }
    # straight-line batch replication
    Wf, K = 10, 20
    want = {}
    for k in ("a", "b"):
        v = pdf[pdf.user_id == k].sort_values("ts").value.to_numpy()
        qv = np.floor(v * 100 + 0.5).astype("int64")
        res = [
            abs(int(qv[i]) * Wf - int(qv[i - Wf:i].sum()))
            for i in range(Wf, len(qv))
        ][-K:]
        n_eff = len(res)
        rank = ((n_eff + 1) * 9 + 9) // 10
        den = Wf * 100.0
        qq = sorted(res)[rank - 1] / den if 0 < rank <= n_eff else None
        point = int(qv[-Wf:].sum()) / den
        want[k] = (
            len(qv), n_eff, qq, point,
            point - qq if qq is not None else None,
            point + qq if qq is not None else None,
        )
    assert got == want


def test_kn_trigram_quality_ordering(spark):
    """KN trigram NLL must rank natural repeated-phrase text better
    than shuffled/rare-context text, and match the DuckDB twin."""
    import duckdb
    import pandas as pd

    from timeseriesutils_spark.operators.text import (
        kn_trigram_logprob,
        kn_trigram_logprob_sql,
    )

    docs = [
        (1, "the cat sat on the mat and the cat ran"),
        (2, "the dog sat on the mat and the dog ran away"),
        (3, "colorless green ideas sleep furiously tonight again"),
        (4, "the cat sat on the mat"),
        (5, "xx"),  # < 3 words: dropped
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = (
        kn_trigram_logprob(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = (
        con.execute(kn_trigram_logprob_sql("documents"))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    g = {r.doc_id: r.mean_nll_kn for r in got.itertuples()}
    assert set(g) == {1, 2, 3, 4}
    assert g[4] < g[3]  # common phrase beats the one-off sentence
    # probabilities are valid: every per-doc NLL positive
    assert all(v > 0 for v in g.values())


def test_nb_classifier_learns_separable_classes(spark):
    """NB must classify clearly-separable vocabularies perfectly and
    break argmax ties deterministically (score DESC, class ASC)."""
    import pandas as pd

    from timeseriesutils_spark.operators.text import nb_classifier

    docs = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "a dog ran in the park"),
        (3, "en", "the sun is bright today"),
        (4, "fr", "le chat est sur le tapis"),
        (5, "fr", "un chien court dans le parc"),
        (6, "fr", "le soleil est brillant"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "lang", "text"])
    )
    out = nb_classifier(df).toPandas()
    assert out.correct.all()
    assert (out.margin_nats > 0).all()


def test_stl_chunked_bit_identical(spark):
    """Chunk-parallel STL must equal the unchunked plan bit-for-bit at
    any chunk size >= R + 1 (two-sided compound reach), including
    chunks larger than the series, and short series survive intact."""
    from timeseriesutils_spark.operators.stl import stl_decompose

    rows = []
    for gi in range(2):
        for t in range(300):
            v = 100 + 0.2 * t + 8 * math.sin(2 * math.pi * t / 7)
            rows.append((f"g{gi}", t, v + gi))
    rows += [("short", t, float(t)) for t in range(45)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    plain = sorted(map(tuple, stl_decompose(df, "v", "t", ["g"]).collect()))
    for C in (39, 100, 1000):
        chunked = sorted(
            map(
                tuple,
                stl_decompose(df, "v", "t", ["g"], chunk_rows=C).collect(),
            )
        )
        assert chunked == plain, f"chunk_rows={C}"
    with pytest.raises(ValueError, match="chunk_rows"):
        stl_decompose(df, "v", "t", ["g"], chunk_rows=38)


def test_quality_logit_matches_float_irls(spark):
    """The lockstep quantized IRLS must match a straight-line float
    IRLS to the probability grid, and learn a separable problem."""
    import numpy as np
    import pandas as pd

    from timeseriesutils_spark.operators.logit import quality_logit

    rng = np.random.RandomState(4)
    docs = []
    for i in range(150):
        en = rng.rand() < 0.5
        n = rng.randint(5, 40)
        base = ["the", "be", "to", "of"]
        ws = [
            (
                base[rng.randint(4)]
                if en and rng.rand() < 0.25
                else ("w" + str(rng.randint(99)) if en else "mmmmot" + str(rng.randint(40)))
            )
            for _ in range(n)
        ]
        docs.append((i, "en" if en else "fr", " ".join(ws)))
    pdf = pd.DataFrame(docs, columns=["doc_id", "lang", "text"])
    got = (
        quality_logit(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    X, y = [], []
    stop = ("the", "be", "to", "of", "and", "that", "have", "with")
    for _, r in pdf.iterrows():
        ws = r.text.lower().strip().split()
        nw = len(ws)
        X.append(
            [
                1.0,
                np.log(1.0 + nw),
                sum(w in stop for w in ws) / nw,
                sum(len(w) for w in ws) / nw,
            ]
        )
        y.append(1.0 if r.lang == "en" else 0.0)
    X, y = np.array(X), np.array(y)
    b = np.zeros(4)
    for _ in range(4):
        p = np.clip(1 / (1 + np.exp(-X @ b)), 1e-6, 1 - 1e-6)
        w = p * (1 - p)
        b = np.linalg.solve((X * w[:, None]).T @ X, X.T @ (w * (X @ b) + (y - p)))
    pf = 1 / (1 + np.exp(-X @ b))
    assert np.abs(got.p_hat.to_numpy() - pf).max() < 5e-4
    assert got.correct.mean() > 0.95


def test_quality_logit_degenerate_corpus_stays_finite(spark):
    """A single-class or constant-feature corpus must not blow up: the
    singular-solve guard keeps beta at the previous round's value."""
    import pandas as pd

    from timeseriesutils_spark.operators.logit import quality_logit

    pdf = pd.DataFrame(
        [(i, "en", "aa bb cc") for i in range(10)],
        columns=["doc_id", "lang", "text"],
    )
    out = quality_logit(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == 10
    assert out.p_hat.notna().all()
    assert ((out.p_hat > 0) & (out.p_hat < 1)).all()
