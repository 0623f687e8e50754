"""Round-12 tests: ADVICE-r11 regression fixes + new operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# --- ADVICE r11 fixes -----------------------------------------------------


def test_bayes_ab_rejects_sub_one_priors(spark):
    from timeseriesutils_spark.operators.analytics import bayes_ab, bayes_ab_sql

    df = spark.createDataFrame(
        [("a", 1), ("b", 1)], "arm string, success int"
    )
    with pytest.raises(ValueError, match="prior_alpha"):
        bayes_ab(df, "arm", "a", "b", "success", [], prior_beta=0)
    with pytest.raises(ValueError, match="prior_alpha"):
        bayes_ab_sql("SELECT 1", "arm", "a", "b", "success", [], prior_alpha=0)


def test_sequential_ab_sql_rejects_bad_n_looks(spark):
    from timeseriesutils_spark.operators.analytics import sequential_ab_sql

    with pytest.raises(ValueError, match="n_looks"):
        sequential_ab_sql("SELECT 1", "arm", "a", "b", "success", "lk", n_looks=7)


def test_adamic_adar_duplicate_edges_are_deduped(spark):
    """Duplicate input edges must not double-count degrees or fan out
    the already_linked join (ADVICE r11: graph.py contract)."""
    from timeseriesutils_spark.operators.graph import adamic_adar

    edges = [(1, 2), (1, 3), (2, 3), (2, 4)]
    clean = spark.createDataFrame(edges, "src int, dst int")
    dup = spark.createDataFrame(edges + edges + edges[:2], "src int, dst int")
    a = sorted(map(tuple, adamic_adar(clean, top_k=50).collect()))
    b = sorted(map(tuple, adamic_adar(dup, top_k=50).collect()))
    assert a == b
    assert len(a) == len(set((r[0], r[1]) for r in a))  # no dup pairs


def test_mmd_quad_drift_max_dim_guard(spark):
    from timeseriesutils_spark.operators.similarity import mmd_quad_drift

    rows = [([float(i) for i in range(8)], s) for s in (1, 2) for _ in range(3)]
    df = spark.createDataFrame(rows, "vec array<double>, s int")
    # d=8 <= max_dim: runs
    assert mmd_quad_drift(df, "vec", "s").count() == 1
    # max_dim below d: the plan raises at execution, no silent explode
    with pytest.raises(Exception) as ei:
        mmd_quad_drift(df, "vec", "s", max_dim=4).collect()
    assert "max_dim" in str(ei.value)


def _run_crps_stream(spark, tmp_path, pdf, name):
    from timeseriesutils_spark.streaming.windows import streaming_crps

    src = str(tmp_path / name)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("k string, t bigint, value double").parquet(src)
    out = streaming_crps(stream, key_col="k", value_col="value",
                         order_cols=("t",), members=3)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name} ORDER BY k").collect()[-1]


def test_streaming_crps_drops_nulls(spark, tmp_path):
    """streaming_crps must score WHERE value IS NOT NULL like its oracle
    (ADVICE r11: a NaN corrupts the int64 ring)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "k": ["a"] * 12,
            "t": list(range(12)),
            "value": [float(i % 5 + 1) if i % 4 else None for i in range(12)],
        }
    )
    with_nulls = _run_crps_stream(spark, tmp_path, pdf, "r12_crps_nulls")
    clean = _run_crps_stream(
        spark, tmp_path, pdf.dropna(subset=["value"]), "r12_crps_clean"
    )
    assert with_nulls["n_seen"] == 9  # 3 nulls dropped
    assert with_nulls["n_scored"] == clean["n_scored"]
    assert np.isfinite(with_nulls["mean_crps"])
    assert with_nulls["mean_crps"] == clean["mean_crps"]


# --- matrix_profile -------------------------------------------------------


def _mp_numpy(x, w, band, excl, scale):
    """Straight-line banded matrix profile reference (STOMP identity
    recomputed naively per pair) with the operator's quantization."""
    mult = 10 ** scale
    xq = np.floor(np.asarray(x, dtype="float64") * mult + 0.5).astype("int64")
    n = len(xq)
    out = {}
    nsub = n - w + 1
    for i in range(nsub):
        best = None
        for j in range(nsub):
            d = abs(j - i)
            if d <= excl or d > band:
                continue
            a, b = xq[i:i + w], xq[j:j + w]
            Sa, SSa = a.sum(), (a * a).sum()
            Sb, SSb = b.sum(), (b * b).sum()
            da = w * SSa - Sa * Sa
            db = w * SSb - Sb * Sb
            if da <= 0 or db <= 0:
                continue
            num = w * int(a @ b) - Sa * Sb
            corr = float(num) / (np.sqrt(float(da)) * np.sqrt(float(db)))
            dist = np.sqrt(max(2.0 * w * (1.0 - corr), 0.0))
            dq = int(np.floor(dist * 1e9 + 0.5))
            if best is None or (dq, j + 1) < best:
                best = (dq, j + 1)
        if best is not None:
            out[i + 1] = (best[1], best[0] / 1e9)
    return out


def test_matrix_profile_matches_numpy(spark):
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    rng = np.random.default_rng(7)
    x = np.cumsum(rng.normal(0, 1, 120)) + 50.0
    # plant a repeated motif far apart (inside the band from one side)
    x[30:38] = x[80:88] = np.array([1, 5, 2, 8, 3, 9, 4, 7], dtype="float64")
    rows = [("s", int(t), float(v)) for t, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    got = {
        r["idx"]: (r["nn_idx"], r["mp_dist"])
        for r in matrix_profile(
            df, "v", ["g"], ["t"], w=8, band=60, excl=4, scale=2
        ).collect()
    }
    want = _mp_numpy(x, w=8, band=60, excl=4, scale=2)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], (i, got[i], want[i])
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-9)


def test_matrix_profile_finds_planted_motif(spark):
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    rng = np.random.default_rng(3)
    x = np.cumsum(rng.normal(0, 5, 100)) + 200.0
    motif = np.array([10, 80, 20, 90, 30, 70, 40, 60], dtype="float64")
    x[10:18] = motif
    x[40:48] = motif
    rows = [("s", int(t), float(v)) for t, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    res = {
        r["idx"]: (r["nn_idx"], r["mp_dist"])
        for r in matrix_profile(
            df, "v", ["g"], ["t"], w=8, band=40, excl=4, scale=2
        ).collect()
    }
    # the two planted motif subsequences are each other's nearest
    # neighbor at (near-)zero z-normalized distance
    assert res[11][0] == 41 and res[41][0] == 11
    assert res[11][1] < 1e-6 and res[41][1] < 1e-6


def test_matrix_profile_constant_windows_drop_out(spark):
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    rows = [("s", t, 5.0) for t in range(30)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    assert matrix_profile(df, "v", ["g"], ["t"], w=4, band=10, excl=2).count() == 0


def test_matrix_profile_plan_single_exchange_no_joins(spark):
    """The banded-STOMP formulation must stay pure window expressions:
    one exchange per series, zero joins, no Python eval.  (Pinned on
    the OPERATOR plan — since round 13 the catalog query serves the
    shared parquet-checkpointed profile, see next test.)"""
    import re

    from timeseriesutils_spark.operators.matrixprofile import matrix_profile
    from timeseriesutils_spark.queries.series_queries import _daily

    df = matrix_profile(
        _daily(spark, "/root/testdata/sf0.001"), "day_price",
        ["l_suppkey"], ["ship_day"], w=8, band=20, excl=4, scale=2,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_matrix_profile_and_motif_discord_share_one_build(spark):
    """Round-13 de-dup: both catalog queries must serve from ONE
    matrix-profile build (a parquet checkpoint scan — no window chain,
    no second 16-lag computation) and stay value-identical to the
    direct operator output."""
    from timeseriesutils_spark.functions import checkpoint as ck
    from timeseriesutils_spark.queries import catalog

    before = ck._SEQ["n"]
    q1 = catalog()["matrix_profile"].spark(spark, "/root/testdata/sf0.001")
    q2 = catalog()["motif_discord"].spark(spark, "/root/testdata/sf0.001")
    built = ck._SEQ["n"] - before
    assert built <= 1  # 0 if an earlier test already memoized this sf
    # the motif query's plan reads the checkpoint: no window chain left
    plan = q2._jdf.queryExecution().executedPlan().toString()
    assert "_qt5" not in plan  # no per-lag QT rolling sums rebuilt
    assert q1.count() > 0 and q2.count() > 0


# --- stl_decompose --------------------------------------------------------


def _stl_numpy(x, P, hs, ht, scale):
    """Straight-line reference of the quantized-weight one-iteration
    STL: same integer stages, same division order."""
    from timeseriesutils_spark.operators.stl import _lowpass_counts, _tricube_q

    mult = 10 ** scale
    Wq, Uq, cj = _tricube_q(hs), _tricube_q(ht), _lowpass_counts(P)
    SW, SU = sum(Wq), sum(Uq)
    DL = SW * 3 * P * P
    n = len(x)
    xq = np.floor(np.asarray(x, dtype="float64") * mult + 0.5).astype(object)

    def at(arr, i):
        return arr[i] if 0 <= i < n and arr[i] is not None else None

    sn = [None] * n
    for t in range(n):
        terms = [at(xq, t + k * P) for k in range(-hs, hs + 1)]
        if all(v is not None for v in terms):
            sn[t] = sum(w * v for w, v in zip(Wq, terms))
    seasn = [None] * n
    for t in range(n):
        terms = [at(np.array(sn, dtype=object), t + j) for j in range(-P, P + 1)]
        if sn[t] is not None and all(v is not None for v in terms):
            seasn[t] = sn[t] * 3 * P * P - sum(c * v for c, v in zip(cj, terms))
    vn = [None if seasn[t] is None else xq[t] * DL - seasn[t] for t in range(n)]
    trn = [None] * n
    for t in range(n):
        terms = [at(np.array(vn, dtype=object), t + m) for m in range(-ht, ht + 1)]
        if all(v is not None for v in terms):
            trn[t] = sum(u * v for u, v in zip(Uq, terms))
    out = {}
    for t in range(n):
        s = None if seasn[t] is None else float(seasn[t]) / float(DL * mult)
        tr = None if trn[t] is None else float(trn[t]) / float(DL * SU * mult)
        out[t] = (s, tr)
    return out


def test_stl_decompose_matches_numpy(spark):
    from timeseriesutils_spark.operators.stl import stl_decompose

    rng = np.random.default_rng(11)
    n, P = 120, 7
    t = np.arange(n)
    x = 100 + 0.5 * t + 10 * np.sin(2 * np.pi * (t % P) / P) + rng.normal(0, 1, n)
    df = spark.createDataFrame(
        [("s", int(i), float(v)) for i, v in enumerate(x)],
        "g string, t int, v double",
    )
    got = {
        r["t"]: (r["seasonal"], r["trend"], r["remainder"])
        for r in stl_decompose(
            df, "v", "t", ["g"], period=P, seasonal_h=3, trend_h=10, scale=2
        ).collect()
    }
    want = _stl_numpy(x, P, 3, 10, 2)
    assert set(got) == set(want)
    for i in want:
        ws, wt = want[i]
        gs, gt, gr = got[i]
        if ws is None:
            assert gs is None
        else:
            assert gs == pytest.approx(ws, abs=1e-12)
        if wt is None:
            assert gt is None
        else:
            assert gt == pytest.approx(wt, abs=1e-12)
        if ws is not None and wt is not None:
            assert gr == pytest.approx(x[i] - ws - wt, abs=1e-9)


def test_stl_decompose_recovers_planted_seasonality(spark):
    """A clean weekly pattern + linear trend: the seasonal component
    tracks the planted cycle and the trend tracks the line (interior
    rows, away from the NULL edges)."""
    from timeseriesutils_spark.operators.stl import stl_decompose

    n, P = 200, 7
    t = np.arange(n)
    pattern = np.array([5.0, -3.0, 1.0, 4.0, -2.0, -6.0, 1.0])
    x = 50 + 0.2 * t + pattern[t % P]
    df = spark.createDataFrame(
        [("s", int(i), float(v)) for i, v in enumerate(x)],
        "g string, t int, v double",
    )
    rows = {
        r["t"]: r
        for r in stl_decompose(
            df, "v", "t", ["g"], period=P, seasonal_h=3, trend_h=10, scale=2
        ).collect()
    }
    centered = pattern - pattern.mean()
    mid = [i for i in range(60, 140) if rows[i]["seasonal"] is not None]
    assert len(mid) >= 70
    for i in mid:
        assert rows[i]["seasonal"] == pytest.approx(centered[i % P], abs=0.2)
        assert rows[i]["trend"] == pytest.approx(50 + 0.2 * i, abs=0.5)
        assert abs(rows[i]["remainder"]) < 0.5


# --- bpe_train ------------------------------------------------------------


def _bpe_python(word_freqs, n_merges):
    """Pure-Python BPE trainer (Sennrich et al. 2016), same tiebreak."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), score = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, l + r, score))
        new = {}
        for syms, f in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
    return merges, vocab


def test_bpe_train_matches_pure_python(spark):
    from timeseriesutils_spark.operators.bpe import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low newer wide wide lowest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["merge_step"], r["lhs"], r["rhs"], r["merged"], r["score"])
        for r in bpe_train(df, n_merges=6).orderBy("merge_step").collect()
    ]
    wf = {}
    for t in texts:
        for w in t.lower().split():
            if len(w) >= 2:
                wf[w] = wf.get(w, 0) + 1
    want, _ = _bpe_python(wf, 6)
    assert got == want


def test_bpe_train_greedy_leftmost_rewrite(spark):
    """'aaaa' + merge (a,a) must become [aa, aa], never [a, aa, a] —
    and a merged tail token must not re-merge within the round."""
    from timeseriesutils_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [("aaaa aaaa aaaa ab",)], "text string"
    )
    rows = bpe_train(df, n_merges=2).orderBy("merge_step").collect()
    # round 1: (a,a) dominates, score = pairs-after-greedy semantics on
    # counting (3 words x 3 adjacent occurrences) + ab contributes (a,b)
    assert (rows[0]["lhs"], rows[0]["rhs"]) == ("a", "a")
    # round 2 on [aa, aa]: the pair (aa, aa) exists => greedy rewrite
    # produced exactly two 'aa' tokens per word
    assert (rows[1]["lhs"], rows[1]["rhs"]) == ("aa", "aa")


def test_bpe_train_improves_tokenizer_fertility(spark):
    """The trained merges strictly shrink the corpus token count: mean
    symbols per word decreases monotonically with each merge round
    (the re-measure VERDICT r11 item 6 asks for)."""
    from timeseriesutils_spark.operators.bpe import bpe_train
    from timeseriesutils_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    merges = [
        (r["lhs"], r["rhs"], r["merged"])
        for r in bpe_train(docs, n_merges=8).orderBy("merge_step").collect()
    ]
    assert len(merges) == 8
    pdf = docs.select("text").toPandas()
    wf = {}
    for t in pdf["text"]:
        for w in str(t).lower().split():
            if len(w) >= 2:
                wf[w] = wf.get(w, 0) + 1
    vocab = {tuple(w): f for w, f in wf.items()}
    last = None
    for l, r, m in merges:
        new = {}
        for syms, f in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = m
                else:
                    out.append(x)
            new[tuple(out)] = new.get(tuple(out), 0) + f
        vocab = new
        tokens = sum(len(s) * f for s, f in vocab.items())
        if last is not None:
            assert tokens < last
        last = tokens


# --- pipeline_incremental -------------------------------------------------


def test_incremental_minhash_pairs_equal_filtered_full(spark):
    """minhash_lsh_pairs(new_flags=...) == full pairs restricted to
    new-touching pairs (the banding analogue of the
    incremental_jaccard_pairs contract)."""
    from timeseriesutils_spark.operators.dedup import minhash_lsh_pairs
    from timeseriesutils_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kw = dict(n=3, num_hashes=32, bands=8, threshold=0.5, hash_mode="md5")
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, "doc_id", "text", **kw).collect()
    }
    W = 30
    new_ids = docs.filter(F.col("doc_id") >= W).select("doc_id")
    inc = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", new_flags=new_ids, **kw
        ).collect()
    }
    want = {k: v for k, v in full.items() if k[0] >= W or k[1] >= W}
    assert inc == want
    assert any(k[0] < W for k in want)  # the cut actually bites


def test_pipeline_incremental_equals_filtered_full(spark):
    """The composed incremental pipeline == full recompute filtered to
    the batch, row for row (several watermarks, including one where
    the batch is most of the corpus)."""
    from timeseriesutils_spark.operators.corpus_pipeline import (
        assemble_training_corpus,
        incremental_training_corpus,
    )
    from timeseriesutils_spark.queries.llm_queries import E2E_PARAMS
    from timeseriesutils_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    full = assemble_training_corpus(docs, **E2E_PARAMS)
    for W in (25, 40):
        want = sorted(
            map(tuple, full.filter(F.col("doc_id") >= W).collect())
        )
        got = sorted(
            map(tuple, incremental_training_corpus(docs, W, **E2E_PARAMS).collect())
        )
        assert got == want and len(got) > 0, W


# --- seasonal_esd ---------------------------------------------------------


def test_seasonal_esd_finds_planted_anomalies(spark):
    """Clean weekly series + 3 planted spikes: the spikes are flagged
    in deviation order, and nothing else is."""
    from timeseriesutils_spark.operators.stl import seasonal_esd

    n, P = 200, 7
    t = np.arange(n)
    pattern = np.array([5.0, -3.0, 1.0, 4.0, -2.0, -6.0, 1.0])
    x = 50 + 0.2 * t + pattern[t % P]
    x[60] += 40.0
    x[100] -= 30.0
    x[150] += 20.0
    df = spark.createDataFrame(
        [("s", int(i), float(v)) for i, v in enumerate(x)],
        "g string, t int, v double",
    )
    rows = seasonal_esd(
        df, "v", "t", ["g"], period=P, seasonal_h=3, trend_h=10,
        scale=2, max_anomalies=5, thresh=3.0,
    ).collect()
    by_rank = {r["anom_rank"]: r["t"] for r in rows}
    assert by_rank[1] == 60 and by_rank[2] == 100 and by_rank[3] == 150
    # a spike leaks into its neighbors' LOESS fits, so lower-rank
    # echo flags may appear NEAR a spike — but nowhere else
    for r in rows:
        assert min(abs(r["t"] - s0) for s0 in (60, 100, 150)) <= P


def test_seasonal_esd_masking_resistance(spark):
    """Two adjacent large spikes (the masking scenario): iterative
    re-estimation flags both; a ONE-SHOT 3-MAD rule on the same
    remainder would flag them too, but GESD's guarantee is the
    re-test — assert both flagged with ranks 1 and 2."""
    from timeseriesutils_spark.operators.stl import seasonal_esd

    n, P = 150, 7
    t = np.arange(n)
    x = 100 + 2 * np.sin(2 * np.pi * t / P)
    x[70] += 50.0
    x[71] += 48.0
    df = spark.createDataFrame(
        [("s", int(i), float(v)) for i, v in enumerate(x)],
        "g string, t int, v double",
    )
    flags = {
        r["t"]: r["anom_rank"]
        for r in seasonal_esd(
            df, "v", "t", ["g"], period=P, seasonal_h=3, trend_h=10,
            scale=2, max_anomalies=5, thresh=3.0,
        ).collect()
    }
    assert 70 in flags and 71 in flags


def test_seasonal_esd_quiet_series_flags_nothing(spark):
    from timeseriesutils_spark.operators.stl import seasonal_esd

    n, P = 120, 7
    t = np.arange(n)
    rng = np.random.default_rng(5)
    x = 100 + 3 * np.sin(2 * np.pi * t / P) + rng.normal(0, 1.0, n)
    df = spark.createDataFrame(
        [("s", int(i), float(v)) for i, v in enumerate(x)],
        "g string, t int, v double",
    )
    assert (
        seasonal_esd(
            df, "v", "t", ["g"], period=P, seasonal_h=3, trend_h=10,
            scale=2, max_anomalies=5, thresh=4.0,
        ).count()
        == 0
    )


# --- stl_robust -------------------------------------------------------------


def test_stl_robust_downweights_spikes(spark):
    """A big spike gets rho ~ 0, and the robust trend near the spike
    stays close to the true line while the plain pass-1 trend is
    pulled; the robust seasonal stays close to the planted pattern."""
    from timeseriesutils_spark.operators.stl import stl_decompose, stl_robust

    rng = np.random.default_rng(9)
    # the robust pass's complete-window NULL edge is ~76 rows per side
    # (pass-1 trend edge + weighted-smoother offsets compound), so use
    # a long series with the spike far from both edges
    n, P = 400, 7
    t = np.arange(n)
    pattern = np.array([5.0, -3.0, 1.0, 4.0, -2.0, -6.0, 1.0])
    # real noise, so 6*median|r| is a meaningful band (a noise-free fit
    # makes the band razor-thin and legitimately zero-weights any row
    # with curvature leakage -- correct Cleveland behavior, bad fixture)
    x = 50 + 0.2 * t + pattern[t % P] + rng.normal(0, 0.5, n)
    x[300] += 60.0
    rows = [("s", int(i), float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    kw = dict(period=P, seasonal_h=3, trend_h=10, scale=2)
    rob = {r["t"]: r for r in stl_robust(df, "v", "t", ["g"], **kw).collect()}
    plain = {
        r["t"]: r for r in stl_decompose(df, "v", "t", ["g"], **kw).collect()
    }
    assert rob[300]["rho"] < 0.05  # the spike is nearly zero-weighted
    # interior clean points (remainder defined, outside the spike's
    # leak radius) keep high weight
    leak = 31  # ht + hs*P
    highs = [
        r["rho"] for i, r in rob.items()
        if abs(i - 300) > leak and r["remainder"] is not None
    ]
    assert len(highs) > 50
    assert np.median(highs) > 0.7
    # trend recovery in the spike neighborhood: robust beats plain
    for i in (295, 298, 302, 305):
        true_tr = 50 + 0.2 * i
        if rob[i]["trend"] is not None and plain[i]["trend"] is not None:
            assert abs(rob[i]["trend"] - true_tr) <= abs(
                plain[i]["trend"] - true_tr
            ) + 1e-9


def test_stl_robust_clean_series_matches_plain_closely(spark):
    """With no outliers (median|r| small but nonzero), rho ~ 1 and the
    robust components track the plain pass within a small tolerance."""
    from timeseriesutils_spark.operators.stl import stl_decompose, stl_robust

    rng = np.random.default_rng(4)
    n, P = 400, 7
    t = np.arange(n)
    x = 80 + 0.1 * t + 5 * np.sin(2 * np.pi * t / P) + rng.normal(0, 0.5, n)
    df = spark.createDataFrame(
        [("s", int(i), float(v)) for i, v in enumerate(x)],
        "g string, t int, v double",
    )
    kw = dict(period=P, seasonal_h=3, trend_h=10, scale=2)
    rob = {r["t"]: r for r in stl_robust(df, "v", "t", ["g"], **kw).collect()}
    plain = {
        r["t"]: r for r in stl_decompose(df, "v", "t", ["g"], **kw).collect()
    }
    both = [
        i for i in rob
        if rob[i]["trend"] is not None and plain[i]["trend"] is not None
    ]
    assert len(both) > 150
    dev = [abs(rob[i]["trend"] - plain[i]["trend"]) for i in both]
    assert np.median(dev) < 0.5


# --- distance_correlation ---------------------------------------------------


def _dcor_numpy(x, y, scale):
    mq = 10 ** scale
    xq = np.floor(np.asarray(x) * mq + 0.5).astype("int64")
    yq = np.floor(np.asarray(y) * mq + 0.5).astype("int64")
    n = len(xq)

    def centered(v):
        d = np.abs(v[:, None] - v[None, :]).astype(object)
        a = d.sum(axis=1)
        S = a.sum()
        return d * n * n - a[:, None] * n - a[None, :] * n + S

    A, B = centered(xq), centered(yq)
    sab = float((A * B).sum())
    saa = float((A * A).sum())
    sbb = float((B * B).sum())
    den = float(n) ** 6 * mq * mq
    dcov2, dvx, dvy = sab / den, saa / den, sbb / den
    dcor = np.sqrt(max(dcov2 / np.sqrt(dvx * dvy), 0.0))
    return dcov2, dvx, dvy, dcor


def test_distance_correlation_matches_numpy(spark):
    from timeseriesutils_spark.operators.distcorr import distance_correlation

    rng = np.random.default_rng(12)
    x = rng.normal(10, 3, 60)
    y = 2.0 * x + rng.normal(0, 1, 60)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(x, y)],
        "g string, x double, y double",
    )
    r = distance_correlation(df, "x", "y", ["g"]).collect()[0]
    dcov2, dvx, dvy, dcor = _dcor_numpy(x, y, 2)
    assert r["n"] == 60
    assert r["dcov2"] == pytest.approx(dcov2, rel=1e-12)
    assert r["dvar_x"] == pytest.approx(dvx, rel=1e-12)
    assert r["dvar_y"] == pytest.approx(dvy, rel=1e-12)
    assert r["dcor"] == pytest.approx(dcor, abs=2e-9)


def test_distance_correlation_sees_nonmonotone_dependence(spark):
    """y = x^2 on symmetric x: pearson ~ 0, spearman ~ 0 — dcor must
    still be decisively large; and independent noise stays small."""
    from timeseriesutils_spark.operators.distcorr import distance_correlation

    rng = np.random.default_rng(3)
    x = np.linspace(-5, 5, 80)
    rows = [("dep", float(a), float(a * a)) for a in x] + [
        ("ind", float(a), float(b))
        for a, b in zip(rng.normal(0, 5, 80), rng.normal(0, 5, 80))
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = {
        row["g"]: row["dcor"]
        for row in distance_correlation(df, "x", "y", ["g"]).collect()
    }
    assert r["dep"] > 0.4
    assert r["ind"] < 0.25
    # the linear correlation on the dep group really is ~0
    assert abs(float(np.corrcoef(x, x * x)[0, 1])) < 0.05


def test_distance_correlation_duplicate_points_kept(spark):
    """Duplicate (x, y) observations must keep their multiplicity (a
    groupBy-on-values implementation would collapse them)."""
    from timeseriesutils_spark.operators.distcorr import distance_correlation

    base = [(1.0, 2.0), (2.0, 4.0), (3.0, 5.0), (1.0, 2.0), (1.0, 2.0)]
    df = spark.createDataFrame(
        [("g", a, b) for a, b in base], "g string, x double, y double"
    )
    r = distance_correlation(df, "x", "y", ["g"]).collect()[0]
    want = _dcor_numpy([a for a, _ in base], [b for _, b in base], 2)
    assert r["n"] == 5
    assert r["dcov2"] == pytest.approx(want[0], rel=1e-12)
    assert r["dcor"] == pytest.approx(want[3], abs=2e-9)


# --- label_propagation ------------------------------------------------------


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: LPA puts each clique in
    one community (labeled by its min node id)."""
    from timeseriesutils_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(c1 + c2 + [(4, 10)], "src int, dst int")
    rows = label_propagation(edges, n_iter=5).collect()
    comm = {r["node"]: r["community"] for r in rows}
    assert len({comm[n] for n in (1, 2, 3)}) == 1
    assert len({comm[n] for n in (11, 12, 13)}) == 1
    assert comm[1] != comm[13]
    sizes = {r["node"]: r["community_size"] for r in rows}
    assert sizes[1] + sizes[13] == 8


def test_label_propagation_matches_python_rounds(spark):
    """Exact parity with a straight-line synchronous LPA using the
    same (count DESC, label ASC) tiebreak."""
    from timeseriesutils_spark.operators.graph import label_propagation

    rng = np.random.default_rng(8)
    nodes = list(range(20))
    edges = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in zip(
                rng.integers(0, 20, 60), rng.integers(0, 20, 60)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, n_iter=5).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {n: n for n in adj}
    for _ in range(5):
        new = {}
        for n, nbrs in adj.items():
            cnt = {}
            for m in nbrs:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            new[n] = min(cnt, key=lambda c: (-cnt[c], c))
        lab = new
    assert got == lab


# --- did_estimator ----------------------------------------------------------


def test_did_estimator_recovers_planted_effect(spark):
    """Synthetic panel with a known +7 treatment effect, parallel
    trends, and arm/period assignment matching the operator's md5
    parity x cutover: DiD ~ 7, and the naive post-minus-pre treat
    difference is biased by the +3 common time trend."""
    import hashlib

    rng = np.random.default_rng(21)
    rows = []
    for uid in range(200):
        treat = (
            int(hashlib.md5(str(uid).encode()).hexdigest()[:4], 16) % 100
        ) % 2
        for day in (5, 20):  # pre: Jan 5, post: Jan 20 vs Jan-16 cutover
            post = 1 if day >= 16 else 0
            y = 50 + 10 * treat + 3 * post + 7 * treat * post + rng.normal(0, 1)
            rows.append((uid, f"2024-01-{day:02d} 12:00:00", float(y)))
    df = spark.createDataFrame(rows, "user_id bigint, ts string, value double")
    from timeseriesutils_spark.operators.analytics import did_estimator

    r = did_estimator(df, "value").collect()[0]
    assert r["n_ctrl_pre"] > 50 and r["n_treat_post"] > 50
    assert r["did"] == pytest.approx(7.0, abs=0.8)
    naive = r["mean_treat_post"] - r["mean_treat_pre"]
    assert naive == pytest.approx(10.0, abs=0.8)  # trend-contaminated
    assert r["t_stat"] > 10  # the effect is many SEs out


def test_did_estimator_null_effect_small_t(spark):
    import hashlib

    rng = np.random.default_rng(22)
    rows = []
    for uid in range(1000):
        treat = (
            int(hashlib.md5(str(uid).encode()).hexdigest()[:4], 16) % 100
        ) % 2
        for day in (5, 20):
            post = 1 if day >= 16 else 0
            y = 50 + 5 * treat + 2 * post + rng.normal(0, 1)
            rows.append((uid, f"2024-01-{day:02d} 12:00:00", float(y)))
    df = spark.createDataFrame(rows, "user_id bigint, ts string, value double")
    from timeseriesutils_spark.operators.analytics import did_estimator

    r = did_estimator(df, "value").collect()[0]
    assert abs(r["did"]) < 0.5
    assert abs(r["t_stat"]) < 3.5


# --- granger_causality ------------------------------------------------------


def test_granger_matches_numpy_ols(spark):
    """F statistic parity with explicit numpy least squares on the
    quantized series."""
    rng = np.random.default_rng(17)
    n = 120
    x = rng.normal(10, 2, n)
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = 0.5 * y[t - 1] + 1.2 * x[t - 1] + rng.normal(0, 1)
    df = spark.createDataFrame(
        [("g", int(t), float(y[t]), float(x[t])) for t in range(n)],
        "g string, t int, y double, x double",
    )
    from timeseriesutils_spark.operators.granger import granger_causality

    r = granger_causality(df, "y", "x", ["g"], ["t"]).collect()[0]
    yq = np.floor(y * 100 + 0.5)
    xq = np.floor(x * 100 + 0.5)
    yy, y1, x1 = yq[1:], yq[:-1], xq[:-1]
    Zr = np.column_stack([np.ones(n - 1), y1])
    Zu = np.column_stack([np.ones(n - 1), y1, x1])
    rss = lambda Z: float(
        yy @ yy - yy @ Z @ np.linalg.solve(Z.T @ Z, Z.T @ yy)
    )
    rss_r, rss_u = rss(Zr), rss(Zu)
    f = (rss_r - rss_u) / (rss_u / (n - 1 - 3))
    assert r["n"] == n - 1
    assert r["rss_r"] == pytest.approx(rss_r / 1e4, rel=1e-6)
    assert r["rss_u"] == pytest.approx(rss_u / 1e4, rel=1e-6)
    assert r["f_stat"] == pytest.approx(f, rel=1e-6)
    assert r["f_stat"] > 50  # x really does drive y


def test_granger_null_direction_small_f(spark):
    """y drives itself only; x is independent noise — F should be
    small (and far below the driven case)."""
    rng = np.random.default_rng(18)
    n = 150
    x = rng.normal(0, 1, n)
    y = np.zeros(n)
    for t in range(1, n):
        y[t] = 0.6 * y[t - 1] + rng.normal(0, 1)
    df = spark.createDataFrame(
        [("g", int(t), float(y[t]), float(x[t])) for t in range(n)],
        "g string, t int, y double, x double",
    )
    from timeseriesutils_spark.operators.granger import granger_causality

    r = granger_causality(df, "y", "x", ["g"], ["t"], scale=4).collect()[0]
    assert r["f_stat"] < 6.0


def test_motif_discord_finds_planted_structures(spark):
    """Exactly periodic series + one spike: every clean window has a
    perfect twin one period away (profile ~ 0), so the discord MUST be
    a spike-contaminated window; the motif tiebreak picks the smallest
    zero-distance pair."""
    from timeseriesutils_spark.operators.matrixprofile import motif_discord

    t = np.arange(120)
    x = 100.0 + 10.0 * np.sin(2 * np.pi * t / 8.0)
    x[95] += 500.0
    df = spark.createDataFrame(
        [("s", int(i), float(v)) for i, v in enumerate(x)],
        "g string, t int, v double",
    )
    r = motif_discord(
        df, "v", ["g"], ["t"], w=8, band=60, excl=4, scale=2
    ).collect()[0]
    assert r["motif_dist"] < 1e-6
    assert (r["motif_nn"] - r["motif_idx"]) % 8 == 0  # a one-period twin
    # spike at 0-based 95 = 1-based 96: contaminated windows are 89..96
    assert 89 <= r["discord_idx"] <= 96
    assert r["discord_dist"] > 1.0


# --- yuen_test --------------------------------------------------------------


def test_yuen_matches_scipy_formulation(spark):
    """Parity with the textbook trimmed-mean / winsorized-variance
    computation on the quantized values."""
    rng = np.random.default_rng(31)
    a = rng.normal(50, 5, 60)
    b = np.concatenate([rng.normal(53, 5, 55), [500.0] * 5])  # heavy tail
    rows = [("A", float(v)) for v in a] + [("B", float(v)) for v in b]
    df = spark.createDataFrame(rows, "arm string, v double")
    from timeseriesutils_spark.operators.stats import yuen_test

    r = yuen_test(df, "v", "arm", "A", "B", trim=0.2).collect()[0]

    def ref(x):
        xq = np.sort(np.floor(np.asarray(x) * 100 + 0.5))
        n = len(xq)
        g = int(np.floor(n * 0.2))
        h = n - 2 * g
        trimmed = xq[g:n - g]
        tmean = trimmed.sum() / h / 100.0
        wins = np.concatenate([[xq[g]] * g, trimmed, [xq[n - g - 1]] * g])
        s2w = wins.var(ddof=1) / 1e4
        d = s2w * (n - 1) / (h * (h - 1))
        return tmean, d, h

    ta, da, ha = ref(a)
    tb, db, hb = ref(b)
    t = (ta - tb) / np.sqrt(da + db)
    dfree = (da + db) ** 2 / (da * da / (ha - 1) + db * db / (hb - 1))
    assert r["tmean_a"] == pytest.approx(ta, abs=2e-9)
    assert r["tmean_b"] == pytest.approx(tb, abs=2e-9)
    assert r["t_stat"] == pytest.approx(t, rel=1e-9)
    assert r["df"] == pytest.approx(dfree, rel=1e-9)
    # robustness: the outliers must not drag the trimmed mean of B
    assert abs(r["tmean_b"] - 53) < 3


def test_yuen_validates_trim(spark):
    from timeseriesutils_spark.operators.stats import yuen_test, yuen_test_sql

    df = spark.createDataFrame([("A", 1.0)], "arm string, v double")
    with pytest.raises(ValueError):
        yuen_test(df, "v", "arm", "A", "B", trim=0.5)
    with pytest.raises(ValueError):
        yuen_test_sql("t", "v", "arm", "A", "B", trim=0.6)
