"""Round-10 regression tests: the three round-9 ADVICE items
(gains_curve ceil contract, ad_test degenerate-group parity,
gibberish_score NULL contract) plus the round-10 operator wave."""
from __future__ import annotations

import pytest


# --- gains_curve: cutoff is a TRUE ceil (r9 ADVICE #1) -----------------------


def test_gains_curve_ceil_cutoffs_non_divisible(spark):
    from timeseriesutils_spark.operators.mleval import gains_curve

    # n = 7 rows, distinct scores 7..1, positives at the top 2 scores.
    # cutoff_b = ceil(7*b/10) = [1,2,3,3,4,5,5,6,7,7] — the old
    # floor form gave [0,1,2,2,3,...] (bucket 1 EMPTY), so this pins
    # the documented ceil contract.
    rows = [("g", float(7 - i), i < 2) for i in range(7)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = {r.bucket: r for r in gains_curve(df, "s", "y", ["g"]).collect()}
    expected_cut = {b: -(-7 * b // 10) for b in range(1, 11)}
    for b in range(1, 11):
        assert out[b].n_included == expected_cut[b], (b, out[b])
    assert out[1].pos_included == 1 and out[1].gains == pytest.approx(0.5)
    assert out[2].pos_included == 2 and out[2].gains == 1.0


def test_gains_curve_ceil_matches_duckdb_twin(spark):
    import duckdb

    from timeseriesutils_spark.operators.mleval import (
        gains_curve,
        gains_curve_sql,
    )

    rows = [("g", float(7 - i), i < 2) for i in range(7)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    got = sorted(
        (r.bucket, r.n_included, r.pos_included)
        for r in gains_curve(df, "s", "y", ["g"]).collect()
    )
    vals = ", ".join(
        f"('g', {s}, {str(y).lower()})" for _, s, y in rows
    )
    data = f"SELECT * FROM (VALUES {vals}) AS t(g, s, y)"
    sql = gains_curve_sql(data, "s", "y", ["g"])
    res = duckdb.sql(sql).fetchall()
    # twin columns: (g, bucket, cutoff_frac, n_included, pos_included, ...)
    cols = [d[0] for d in duckdb.sql(sql).description]
    bi, ni, pi = (
        cols.index("bucket"),
        cols.index("n_included"),
        cols.index("pos_included"),
    )
    want = sorted((int(r[bi]), int(r[ni]), int(r[pi])) for r in res)
    assert got == want


# --- ad_test: degenerate single-row groups drop in BOTH engines --------------


def test_ad_test_single_row_group_drops_identically(spark):
    import duckdb

    from timeseriesutils_spark.operators.nonparam import ad_test, ad_test_sql

    rows = [("solo", "a", 1.0)]
    for i in range(8):
        rows.append(("ok", "a" if i % 2 == 0 else "b", float(i)))
    df = spark.createDataFrame(rows, "g string, f string, v double")
    out = {r.g for r in ad_test(df, "v", "f", "a", "b", ["g"]).collect()}
    assert out == {"ok"}  # solo dropped, not surfaced with Inf/NULL junk

    vals = ", ".join(f"('{g}', '{f}', {v})" for g, f, v in rows)
    data = f"SELECT * FROM (VALUES {vals}) AS t(g, f, v)"
    res = duckdb.sql(ad_test_sql(data, "v", "f", "a", "b", ["g"])).fetchall()
    assert {r[0] for r in res} == {"ok"}


# --- gibberish_score: NULL text == empty text in all three paths -------------


def test_gibberish_null_contract_all_paths(spark):
    import duckdb

    from timeseriesutils_spark.operators.text import (
        gibberish_score,
        gibberish_score_sql,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id int, text string"
    )
    for eng in ("arrow", "expr"):
        out = {
            r.doc_id: r
            for r in gibberish_score(df, engine=eng).collect()
        }
        for d in (1, 2):
            r = out[d]
            assert r.n_chars == 0, (eng, d, r)
            assert r.alpha_frac == 0.0 and r.char_entropy == 0.0
            assert r.gibberish is True

    data = (
        "SELECT * FROM (VALUES (1, CAST(NULL AS VARCHAR)), (2, ''))"
        " AS t(doc_id, text)"
    )
    res = duckdb.sql(gibberish_score_sql(data)).fetchall()
    cols = [d[0] for d in duckdb.sql(gibberish_score_sql(data)).description]
    nc, gi = cols.index("n_chars"), cols.index("gibberish")
    assert len(res) == 2
    for r in res:
        assert r[nc] == 0 and r[gi] is True


# --- knn_ivfpq: IVFADC compound index (round-10 wave) ------------------------


def _toy_emb(spark, n=60, dim=8, seed_groups=3):
    # deterministic synthetic embeddings: three well-separated lobes so
    # the coarse quantizer has real structure to find
    rows = []
    for i in range(n):
        g = i % seed_groups
        base = [float(g * 10)] * dim
        vec = [base[d] + ((i * 7 + d * 3) % 5) * 0.1 for d in range(dim)]
        rows.append((i, vec))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_ivfpq_arrow_equals_expr_engine(spark):
    from timeseriesutils_spark.operators.similarity import knn_ivfpq_portable

    emb = _toy_emb(spark)
    q = emb.filter("vec_id < 4")
    kw = dict(k=3, n_centroids=3, nprobe=2, m=2, n_codes=4, n_sample=60,
              n_iter_coarse=2, n_iter_pq=2, dim=8)
    a = knn_ivfpq_portable(q, emb, engine="arrow", **kw).orderBy(
        "query_id", "rn").collect()
    e = knn_ivfpq_portable(q, emb, engine="expr", **kw).orderBy(
        "query_id", "rn").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in e]
    assert len(a) == 4 * 3


def test_ivfpq_residual_trainer_matches_distributed(spark):
    # the driver numpy residual Lloyd must be bit-identical to
    # kmeans_centroids over the residual frames (the knn_pq precedent)
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.kmeans import (
        _dist_expr,
        _quantize,
        kmeans_centroids,
    )
    from timeseriesutils_spark.operators.similarity import (
        _ivfpq_train_books_driver,
    )

    emb = _toy_emb(spark)
    m, sub, n_codes, scale = 2, 4, 4, 6
    cents = kmeans_centroids(emb, k=3, n_iter=2, scale=scale)
    qrows = [
        (r[0], list(r[1]))
        for r in emb.select(
            "vec_id", _quantize(F.col("embedding"), scale)
        ).orderBy("vec_id").collect()
    ]
    books_np = _ivfpq_train_books_driver(qrows, cents, m, sub, n_codes, 2)
    dist_structs = F.array(
        *[F.struct(_dist_expr("_q", c).alias("d"), F.lit(j).alias("j"))
          for j, c in enumerate(cents)]
    )
    cents_arr = "array(" + ",".join(
        "array(" + ",".join(f"{int(v)}L" for v in c) + ")" for c in cents
    ) + ")"
    rs = emb.select(
        "vec_id", _quantize(F.col("embedding"), scale).alias("_q")
    ).select(
        "vec_id",
        F.element_at(F.array_sort(dist_structs), 1)["j"].alias("_lst"),
        "_q",
    ).select(
        "vec_id",
        F.expr(f"zip_with(_q, element_at({cents_arr}, _lst + 1),"
               " (x, y) -> x - y)").alias("_r"),
    )
    for s_i in range(m):
        s_df = rs.select(
            "vec_id", F.slice(F.col("_r"), s_i * sub + 1, sub).alias("_sv")
        )
        dist = kmeans_centroids(s_df, "vec_id", "_sv", k=n_codes,
                                n_iter=2, scale=0)
        assert dist == books_np[s_i], f"sub-space {s_i} books diverge"


def test_ivfpq_plan_joins_on_list_not_cross(spark):
    # the IVF lever: candidates come from a _lst equi-join against a
    # broadcast of the per-(query, probed list) tables — never a
    # corpus-wide cross join
    from timeseriesutils_spark.operators.similarity import knn_ivfpq_portable

    emb = _toy_emb(spark)
    q = emb.filter("vec_id < 4")
    df = knn_ivfpq_portable(q, emb, k=3, n_centroids=3, nprobe=1, m=2,
                            n_codes=4, n_sample=60, dim=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# --- kalman_local_level: state-space forecaster (round-10 wave) ---------------


def test_kalman_weights_match_sequential_numpy_filter():
    import numpy as np

    from timeseriesutils_spark.operators.forecast import kalman_weights

    q, r, W = 0.1, 1.0, 20
    wts, gains, P = kalman_weights(q, r, W)
    # hand-rolled sequential Kalman over a random-but-fixed window must
    # be reproduced by the impulse-weight expansion summed in the SAME
    # order the operator uses (lag j ascending == newest first)
    rng = [((i * 37) % 11) - 5.0 for i in range(W)]  # deterministic data
    p0 = 1.0e7 * (q + r)
    Pv, lvl = p0, 0.0
    for t in range(W):
        pp = Pv + q
        k = pp / (pp + r)
        lvl = lvl + k * (rng[t] - lvl)
        Pv = (1.0 - k) * pp
    expanded = 0.0
    for j in range(W):
        expanded = expanded + wts[j] * rng[W - 1 - j]
    assert expanded == pytest.approx(lvl, rel=1e-12)
    assert Pv == P
    # diffuse prior renormalizes: weights sum to ~1, all positive
    assert sum(wts) == pytest.approx(1.0, abs=1e-9)
    assert all(w > 0 for w in wts)
    # gains decrease monotonically toward the Riccati fixed point
    assert all(gains[i] >= gains[i + 1] for i in range(W - 1))


def test_kalman_local_level_operator(spark):
    from timeseriesutils_spark.operators.forecast import (
        kalman_local_level,
        kalman_weights,
    )

    W = 5
    rows = [("g", i, float(10 + (i % 3))) for i in range(8)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = kalman_local_level(df, "y", ["g"], ["t"], q=0.5, r=1.0,
                             window_size=W).orderBy("t").collect()
    wts, gains, P = kalman_weights(0.5, 1.0, W)
    # NULL until a full window exists
    for i in range(W - 1):
        assert out[i]["y_kll_level_q0p5_r1p0_w5"] is None
        assert out[i]["y_kll_fcvar_q0p5_r1p0_w5"] is None
    for i in range(W - 1, 8):
        ys = [r[2] for r in rows[: i + 1]]
        want = 0.0
        want = sum((wts[j] * ys[i - j] for j in range(W)), 0.0)
        # same association as the operator: fold j ascending
        acc = wts[0] * ys[i]
        for j in range(1, W):
            acc = acc + wts[j] * ys[i - j]
        assert out[i]["y_kll_level_q0p5_r1p0_w5"] == acc
        assert out[i]["y_kll_fcvar_q0p5_r1p0_w5"] == P + 0.5 + 1.0


# --- round-10 fast wave: hampel, robust_scaler, emd_1d, keyness_llr ----------


def test_hampel_filter_replaces_spike_only(spark):
    from timeseriesutils_spark.operators.series_math import hampel_filter

    vals = [10.0, 11.0, 10.0, 12.0, 100.0, 11.0, 10.0, 12.0, 11.0]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = {r.t: r for r in hampel_filter(
        df, "y", ["g"], half_window=2, order_by=["t"]).collect()}
    assert out[4].y_hampel_replaced is True
    assert out[4].y_hampel == 11.0  # local median of [10,12,100,11,10]
    for t in (0, 1, 2, 3, 5, 6, 7, 8):
        assert out[t].y_hampel_replaced is False, t
        assert out[t].y_hampel == vals[t]


def test_hampel_filter_centered_edges_defined(spark):
    from timeseriesutils_spark.operators.series_math import hampel_filter

    rows = [("g", i, float(i)) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = hampel_filter(df, "y", ["g"], half_window=3,
                        order_by=["t"]).collect()
    assert all(r.y_hampel is not None for r in out)  # truncated edges


def test_robust_scaler_hand_worked(spark):
    from timeseriesutils_spark.operators.stats import robust_scaler

    # values 1..5: med=3, q25=2, q75=4, iqr=2
    rows = [("g", float(v)) for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = sorted(
        robust_scaler(df, "x", ["g"]).collect(), key=lambda r: r.x
    )
    assert [r.x_robust for r in out] == [-1.0, -0.5, 0.0, 0.5, 1.0]
    assert out[0].x_median == 3.0 and out[0].x_iqr == 2.0


def test_robust_scaler_zero_iqr_null(spark):
    from timeseriesutils_spark.operators.stats import robust_scaler

    df = spark.createDataFrame(
        [("g", 7.0)] * 5, "g string, x double"
    )
    out = robust_scaler(df, "x", ["g"]).collect()
    assert all(r.x_robust is None for r in out)


def test_emd_1d_hand_worked(spark):
    from timeseriesutils_spark.operators.nonparam import emd_1d

    # A = {0, 1}, B = {1, 2}: W1 distance = 1.0 (shift by one)... with
    # two points each: F_a - F_b = 0.5 on [0,1) and 0.5 on [1,2) -> 1·0.5
    # + 1·0.5 = 1.0?  Careful: F_a(0)=.5, F_b(0)=0; F_a(1)=1, F_b(1)=.5
    # -> |gap| 0.5 over width 1 (0->1) + 0.5 over width 1 (1->2) = 1.0
    rows = [("g", "a", 0.0), ("g", "a", 1.0), ("g", "b", 1.0),
            ("g", "b", 2.0)]
    df = spark.createDataFrame(rows, "g string, f string, v double")
    r = emd_1d(df, "v", "f", "a", "b", ["g"]).first()
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.emd == pytest.approx(1.0)


def test_emd_1d_identical_distributions_zero(spark):
    from timeseriesutils_spark.operators.nonparam import emd_1d

    rows = [("g", f, float(v)) for v in (1, 2, 3) for f in ("a", "b")]
    df = spark.createDataFrame(rows, "g string, f string, v double")
    assert emd_1d(df, "v", "f", "a", "b", ["g"]).first().emd == 0.0


def test_keyness_llr_hand_worked(spark):
    import math

    from timeseriesutils_spark.operators.text import keyness_llr

    # A: "x" x4 + "z" x4; B: "y" x4 + "z" x4 -> x is an A-keyword,
    # y a B-keyword, z neutral (LLR 0)
    rows = [(1, True, "x x x x z z z z"), (2, False, "y y y y z z z z")]
    df = spark.createDataFrame(rows, "doc_id int, fa boolean, text string")
    out = {r.word: r for r in keyness_llr(
        df, "fa", min_total=1, top_k=10).collect()}
    assert out["z"].llr == 0.0  # perfectly balanced
    assert out["x"].side == "a" and out["y"].side == "b"
    assert out["x"].llr == out["y"].llr > 0
    # hand value: a=4, b=0, Ea=8*4/16=2 -> 2*4*ln(2) with quantized ln
    lnq = math.floor(math.log(2.0) * 1e9 + 0.5) / 1e9
    want = math.floor(2.0 * 4.0 * lnq * 1e9 + 0.5) / 1e9
    assert out["x"].llr == want


# --- mmr_diversify ------------------------------------------------------------


def test_mmr_skips_near_duplicate_of_first_pick(spark):
    from timeseriesutils_spark.operators.similarity import mmr_diversify

    # corpus: two nearly-identical vectors very close to the query, one
    # moderately relevant but orthogonal-ish vector.  Plain top-2 takes
    # the twin pair; MMR's second pick must be the diverse one.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # query
        (1, [0.9, 0.1, 0.0, 0.0]),       # near-dup of 2
        (2, [0.9, 0.101, 0.0, 0.0]),     # near-dup of 1 (sim ≈ 1)
        (3, [0.8, -0.6, 0.0, 0.0]),      # diverse: rel .8, sim-to-1 .73
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = df.filter("vec_id = 0")
    out = mmr_diversify(q, df, k=2, n_candidates=3, lam=0.5).orderBy(
        "mmr_rank").collect()
    assert out[0].vec_id in (1, 2)         # most relevant first
    assert out[1].vec_id == 3              # diversity beats the twin
    assert out[0].mmr_rank == 1 and out[1].mmr_rank == 2


def test_mmr_lambda_one_is_plain_relevance_ranking(spark):
    from timeseriesutils_spark.operators.similarity import (
        knn_bruteforce,
        mmr_diversify,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + d * 7) % 10) for d in range(4)])
         for i in range(12)],
        "vec_id int, embedding array<double>",
    )
    q = emb.filter("vec_id < 2")
    got = {
        (r.query_id, r.mmr_rank): r.vec_id
        for r in mmr_diversify(q, emb, k=4, n_candidates=8,
                               lam=1.0).collect()
    }
    want = {
        (r.query_id, r.rn): r.vec_id
        for r in knn_bruteforce(q, emb, k=4).collect()
    }
    assert got == want


# --- isotonic_calibrate --------------------------------------------------------


def test_isotonic_hand_worked_pooling(spark):
    from timeseriesutils_spark.operators.mleval import isotonic_calibrate

    # rates by score: 0.0 -> 0.0, 0.5 -> 1.0, 1.0 -> 0.5 (violation:
    # 1.0 then 0.5 must pool to 0.75 across the last two bins)
    rows = []
    for s, ys in ((0.0, [0, 0]), (0.5, [1, 1]), (1.0, [1, 0])):
        rows += [("g", s, y == 1) for y in ys]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = {r.score: r for r in isotonic_calibrate(
        df, "s", "y", ["g"]).collect()}
    assert out[0.0].calibrated == 0.0
    assert out[0.5].calibrated == 0.75
    assert out[1.0].calibrated == 0.75
    assert (out[0.5].n, out[0.5].n_pos) == (2, 2)


def test_isotonic_monotone_and_matches_sorted_rates_when_no_violation(spark):
    from timeseriesutils_spark.operators.mleval import isotonic_calibrate

    rows = []
    for s, pos, n in ((0.1, 1, 10), (0.2, 3, 10), (0.3, 7, 10)):
        rows += [("g", s, i < pos) for i in range(n)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = sorted(isotonic_calibrate(df, "s", "y", ["g"]).collect(),
                 key=lambda r: r.score)
    assert [r.calibrated for r in out] == [0.1, 0.3, 0.7]  # already isotonic
    assert all(out[i].calibrated <= out[i + 1].calibrated
               for i in range(len(out) - 1))


# --- vif_audit ------------------------------------------------------------------


def test_vif_audit_collinear_feature_flags(spark):
    from timeseriesutils_spark.operators.profile import vif_audit

    # z ~ x + y with tiny noise -> near-singular R, VIF explodes for z
    # (exact z = x + y makes det = 0 and the operator's singular guard
    # returns NULL — also covered below)
    rows = [(float(i % 7), float((i * 3) % 5),
             float(i % 7 + (i * 3) % 5 + 0.05 * (i % 2)))
            for i in range(40)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {r.feature: r for r in vif_audit(df, ["x", "y", "z"]).collect()}
    assert out["z"].vif > 5 and out["z"].flag_5 is True


def test_vif_audit_exact_collinearity_null_guard(spark):
    from timeseriesutils_spark.operators.profile import vif_audit

    rows = [(float(i % 7), float((i * 3) % 5), float(i % 7 + (i * 3) % 5))
            for i in range(40)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = vif_audit(df, ["x", "y", "z"]).collect()
    assert all(r.vif is None for r in out)  # det == 0: NULL, not Inf


def test_vif_audit_independent_features_near_one(spark):
    import math

    from timeseriesutils_spark.operators.profile import vif_audit

    rows = [(float(i % 7), float((i * 5 + 3) % 11),
             float((i * i + 1) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = vif_audit(df, ["x", "y", "z"]).collect()
    for r in out:
        assert 0.8 < r.vif < 2.0, r
        assert math.isclose(r.r_squared, 1 - 1 / r.vif, rel_tol=1e-12)


# --- dedup_band_audit -----------------------------------------------------------


def test_band_audit_monotone_candidates_and_recall(spark):
    from timeseriesutils_spark.operators.dedup import dedup_band_audit

    # build a corpus with genuine near-dups: pairs share most tokens
    rows = []
    for i in range(12):
        base = " ".join(f"tok{i}_{j}" for j in range(12))
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base + " extra"))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = sorted(dedup_band_audit(df, threshold=0.5).collect(),
                 key=lambda r: r.bands)
    # more bands (shorter rows) => more candidates, monotone
    cands = [r.n_candidates for r in out]
    assert cands == sorted(cands)
    # the most permissive config catches its own truth set completely
    most = out[-1]
    assert most.n_truth > 0 and most.recall == 1.0
    # theory literal sane and monotone in bands
    ths = [r.p_catch_theory for r in out]
    assert all(0 <= t <= 1 for t in ths) and ths == sorted(ths)
    for r in out:
        assert r.n_caught <= r.n_truth


# --- second wave: mood, partial_corr, trimmed_mean, lorenz, qmapping ----------


def test_mood_median_hand_worked(spark):
    from timeseriesutils_spark.operators.nonparam import mood_median_test

    # A all below pooled median, B all above -> maximal chi2, reject
    rows = [("g", "a", float(v)) for v in (1, 2, 3, 4)]
    rows += [("g", "b", float(v)) for v in (10, 11, 12, 13)]
    df = spark.createDataFrame(rows, "g string, f string, v double")
    r = mood_median_test(df, "v", "f", "a", "b", ["g"]).first()
    # pooled lower median = 4th of 8 sorted values = 4
    assert r.median == 4.0
    assert (r.a_above, r.b_above) == (0, 4)
    assert r.chi2 == pytest.approx(8.0)  # N(ad-bc)^2/prod = 8*16^2/256
    assert r.reject_05 is True


def test_mood_median_identical_samples_accept(spark):
    from timeseriesutils_spark.operators.nonparam import mood_median_test

    rows = [("g", f, float(v)) for v in range(10) for f in ("a", "b")]
    df = spark.createDataFrame(rows, "g string, f string, v double")
    r = mood_median_test(df, "v", "f", "a", "b", ["g"]).first()
    assert r.a_above == r.b_above and r.chi2 == 0.0
    assert r.reject_05 is False


def test_partial_corr_confounder_vanishes(spark):
    from timeseriesutils_spark.operators.profile import partial_corr

    # x and y are both driven by z (plus tiny independent noise): the
    # raw r_xy is strong, the partial r_xy.z collapses toward 0
    rows = []
    for i in range(210):
        z = float(i % 17)
        # independent noise digits: i mod 5 and (i div 5) mod 7
        rows.append((z + 0.3 * (i % 5), z + 0.3 * ((i // 5) % 7), z))
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r.col_a, r.col_b): r for r in
           partial_corr(df, ["x", "y", "z"]).collect()}
    r = out[("x", "y")]
    assert r.r_raw > 0.9
    assert abs(r.r_partial) < 0.3


def test_trimmed_mean_hand_worked(spark):
    from timeseriesutils_spark.operators.stats import trimmed_mean

    # 10 values incl. a wild outlier; 10% trim drops 1 from each end
    vals = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 1000)]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, x double")
    r = trimmed_mean(df, "x", ["g"], trim=0.1).first()
    assert r.n == 10 and r.n_trimmed_each == 1
    assert r.trimmed_mean == pytest.approx(sum(vals[1:-1]) / 8)


def test_lorenz_curve_hand_worked(spark):
    from timeseriesutils_spark.operators.analytics import lorenz_curve

    # 10 units: nine of value 1, one of value 91 -> bottom 90% hold 9%
    rows = [("g", 1.0)] * 9 + [("g", 91.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.bucket: r for r in lorenz_curve(df, "v", ["g"]).collect()}
    assert out[9].cum_share == pytest.approx(0.09)
    assert out[10].cum_share == pytest.approx(1.0)
    assert out[9].equality_gap == pytest.approx(0.81)
    # monotone, ends at 1
    shares = [out[b].cum_share for b in range(1, 11)]
    assert shares == sorted(shares)


def test_quantile_mapping_shifts_onto_reference(spark):
    from timeseriesutils_spark.operators.stats import quantile_mapping

    # source = reference + 100: mapping must remove the shift exactly
    # at matching quantile positions
    rows = [("g", True, float(v)) for v in range(11)]
    rows += [("g", False, float(v + 100)) for v in range(11)]
    df = spark.createDataFrame(rows, "g string, ref boolean, v double")
    out = quantile_mapping(df, "v", ["g"], "ref").collect()
    src = sorted((r.v, r.v_mapped) for r in out if not r.ref)
    # v=100 (p=0) -> 0 ... v=110 (p=1) -> 10
    for i, (v, mv) in enumerate(src):
        assert mv == pytest.approx(float(i))
    ref = [(r.v, r.v_mapped) for r in out if r.ref]
    assert all(v == mv for v, mv in ref)  # reference passes through


# --- third wave: hhi, theil, mutual_info, rrf --------------------------------


def test_hhi_hand_worked(spark):
    from timeseriesutils_spark.operators.analytics import hhi_concentration

    rows = [("g", "s1")] * 8 + [("g", "s2")] * 2
    df = spark.createDataFrame(rows, "g string, src string")
    r = hhi_concentration(df, "src", ["g"]).first()
    assert (r.n, r.n_keys) == (10, 2)
    assert r.hhi == pytest.approx(0.64 + 0.04)
    assert r.hhi_norm == pytest.approx((0.68 - 0.5) / 0.5)


def test_hhi_single_key_is_one(spark):
    from timeseriesutils_spark.operators.analytics import hhi_concentration

    df = spark.createDataFrame([("g", "only")] * 5, "g string, src string")
    r = hhi_concentration(df, "src", ["g"]).first()
    assert r.hhi == 1.0 and r.hhi_norm == 1.0


def test_theil_zero_for_equal_values(spark):
    from timeseriesutils_spark.operators.analytics import theil_index

    df = spark.createDataFrame([("g", 7.0)] * 6, "g string, v double")
    r = theil_index(df, "v", ["g"]).first()
    assert r.theil_t == 0.0 and r.n == 6 and r.mean == 7.0


def test_theil_positive_and_drops_nonpositive(spark):
    import math

    from timeseriesutils_spark.operators.analytics import theil_index

    df = spark.createDataFrame(
        [("g", 1.0), ("g", 1.0), ("g", 4.0), ("g", 0.0), ("g", -2.0)],
        "g string, v double",
    )
    r = theil_index(df, "v", ["g"]).first()
    assert r.n == 3 and r.n_dropped == 2
    mu = 2.0
    want = sum((x / mu) * math.log(x / mu) for x in (1.0, 1.0, 4.0)) / 3
    assert r.theil_t == pytest.approx(want, abs=1e-6)


def test_mutual_info_determined_and_independent(spark):
    from timeseriesutils_spark.operators.profile import mutual_info

    # y determined by x -> NMI = 1
    det = spark.createDataFrame(
        [(f"x{i % 3}", f"y{i % 3}") for i in range(30)], "a string, b string"
    )
    r = mutual_info(det, "a", "b").first()
    assert r.nmi == pytest.approx(1.0, abs=1e-6)
    # independent uniform grid -> MI = 0
    ind = spark.createDataFrame(
        [(f"x{i % 3}", f"y{(i // 3) % 4}") for i in range(36)],
        "a string, b string",
    )
    r2 = mutual_info(ind, "a", "b").first()
    assert abs(r2.mi) < 1e-6 and r2.k_x == 3 and r2.k_y == 4


def test_rrf_fuse_hand_worked(spark):
    from timeseriesutils_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id int, vec_id int, rn int"
    )
    b = spark.createDataFrame(
        [(1, 12, 1), (1, 10, 2), (1, 13, 3)], "query_id int, vec_id int, rn int"
    )
    out = {r.vec_id: r for r in rrf_fuse([a, b], k=60, top_k=4).collect()}
    # 10: 1/61 + 1/62; 12: 1/63 + 1/61; 11: 1/62; 13: 1/63
    assert out[10].fused_rank == 1      # largest sum
    assert out[12].fused_rank == 2
    assert out[11].fused_rank == 3 and out[13].fused_rank == 4
    assert out[10].rrf_score == pytest.approx(1 / 61 + 1 / 62, abs=1e-9)


# --- fourth wave: seasonal MK, cronbach, ks-uniform ---------------------------


def test_seasonal_mk_detects_trend_plain_mk_misses(spark):
    from timeseriesutils_spark.operators.regression import (
        mann_kendall,
        seasonal_mann_kendall,
    )

    # strong seasonal cycle + small upward yearly trend
    rows = []
    for yr in range(6):
        for mon in range(4):
            rows.append(("g", yr, mon, 100.0 * mon + yr))
    df = spark.createDataFrame(rows, "g string, yr int, mon int, v double")
    smk = seasonal_mann_kendall(df, "v", ["g"], "yr", "mon").first()
    assert smk.n == 24 and smk.n_seasons == 4
    # within each season the series strictly rises: S = 4 * C(6,2) = 60
    assert smk.s_stat == 60 and smk.z > 1.96
    # pooled variance = 4 * one-season variance (integer pooling)
    one = mann_kendall(
        df.filter("mon = 0"), "v", ["g"], "yr"
    ).first()
    assert smk.var_s == pytest.approx(4 * one.var_s)


def test_cronbach_alpha_parallel_items_high(spark):
    from timeseriesutils_spark.operators.stats import cronbach_alpha

    # three items = same signal + tiny idiosyncratic wiggles -> alpha ~ 1
    rows = []
    for i in range(60):
        s = float(i % 9)
        rows.append(("g", s + 0.01 * (i % 3), s + 0.01 * ((i // 3) % 3),
                     s + 0.01 * ((i // 9) % 3)))
    df = spark.createDataFrame(rows, "g string, a double, b double, c double")
    r = cronbach_alpha(df, ["a", "b", "c"], ["g"], scale=4).first()
    assert r.alpha > 0.95 and r.k_items == 3


def test_cronbach_alpha_independent_items_low(spark):
    from timeseriesutils_spark.operators.stats import cronbach_alpha

    rows = []
    for i in range(180):
        rows.append(("g", float(i % 5), float((i // 5) % 6),
                     float((i // 30) % 6)))
    df = spark.createDataFrame(rows, "g string, a double, b double, c double")
    r = cronbach_alpha(df, ["a", "b", "c"], ["g"], scale=4).first()
    assert abs(r.alpha) < 0.05  # independent grid -> ~0


def test_ks_uniform_accepts_uniform_rejects_skewed(spark):
    from timeseriesutils_spark.operators.profile import ks_uniform_audit

    uni = [("u", (i + 0.5) / 400.0) for i in range(400)]
    skew = [("s", ((i + 0.5) / 400.0) ** 3) for i in range(400)]
    df = spark.createDataFrame(uni + skew, "g string, u double")
    out = {r.g: r for r in ks_uniform_audit(df, "u", ["g"]).collect()}
    assert out["u"].reject_05 is False and out["u"].d_stat < 0.01
    assert out["s"].reject_05 is True and out["s"].d_stat > 0.3


def test_driver_lloyd_matches_distributed_kmeans(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.kmeans import (
        _quantize,
        kmeans_centroids,
    )
    from timeseriesutils_spark.operators.similarity import _lloyd_driver

    emb = _toy_emb(spark)
    dist = kmeans_centroids(emb, k=5, n_iter=3, scale=6)
    qrows = [
        list(r[1])
        for r in emb.select(
            "vec_id", _quantize(F.col("embedding"), 6)
        ).orderBy("vec_id").collect()
    ]
    drv = _lloyd_driver(np.array(qrows, dtype=np.int64), 5, 3)
    assert drv == dist


def test_binseg_finds_two_planted_shifts(spark):
    from timeseriesutils_spark.operators.changepoint import (
        binseg_breakpoints,
    )

    # three level regimes: 0..9 @10, 10..19 @50, 20..29 @90
    rows = [("g", t, 10.0 + 40.0 * (t // 10)) for t in range(30)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = binseg_breakpoints(df, "v", "t", ["g"]).collect()
    by = {(r.level, r.segment): r for r in out}
    # level 1 finds one boundary; level 2 finds the other in one half
    b1 = by[(1, "*")].break_t
    assert b1 in (9, 19)
    other = 19 if b1 == 9 else 9
    lvl2_breaks = {r.break_t for r in out if r.level == 2}
    assert other in lvl2_breaks
    assert by[(1, "*")].gain > 0


# --- fifth wave: weibull_fit, cohens_d, cliffs_delta --------------------------


def test_weibull_fit_recovers_exponential_shape(spark):
    import math

    from timeseriesutils_spark.operators.survival import weibull_fit

    # exact Weibull(k=2, lambda=10) quantiles as "observed" lifetimes:
    # t_p = 10 * (-ln(1-p))^(1/2); all events observed (no censoring)
    n = 200
    rows = []
    for i in range(n):
        p = (i + 0.5) / n
        t = 10.0 * (-math.log(1.0 - p)) ** 0.5
        rows.append(("g", max(1, int(round(t * 10))), 1))  # 0.1-unit grid
    df = spark.createDataFrame(rows, "stratum string, t_day int, died int")
    r = weibull_fit(df).first()
    # shape recovered within plot-regression tolerance; scale in grid
    # units (lambda = 100 tenths)
    assert 1.7 < r.shape_k < 2.3, r
    assert 80 < r.scale_lambda < 120, r
    assert r.r_squared > 0.97


def test_cohens_d_hand_worked(spark):
    from timeseriesutils_spark.operators.stats import cohens_d

    # A = {0,2} (mean 1, var 2), B = {4,6} (mean 5, var 2) -> d = -4/sqrt(2)
    rows = [("g", "a", 0.0), ("g", "a", 2.0), ("g", "b", 4.0),
            ("g", "b", 6.0)]
    df = spark.createDataFrame(rows, "g string, f string, v double")
    r = cohens_d(df, "v", "f", "a", "b", ["g"]).first()
    assert r.mean_diff == pytest.approx(-4.0)
    assert r.cohens_d == pytest.approx(-4.0 / 2.0**0.5)
    assert r.hedges_g == pytest.approx(r.cohens_d * (1 - 3 / (4 * 4 - 9)))


def test_cliffs_delta_hand_worked(spark):
    from timeseriesutils_spark.operators.nonparam import cliffs_delta

    # A = {1,2,3}, B = {2,3,4}: gt pairs (2>?),(3>?) -> a=2:{1}, a=3:{2}
    # => n_gt = 0+1+2? enumerate: (1,_) none; (2,2)tie,(2,3)no,(2,4)no ->
    # gt from a=2: b=... b values {2,3,4}: 2>2 no; so gt: a=2 vs none? b<2
    # none. a=3: b in {2} -> 1. total gt = 1... recount: a=1: b<1 none;
    # a=2: b<2 none (b min 2); a=3: b<3 -> {2} = 1. n_gt = 1.
    # lt: a=1: b>1 -> 3; a=2: b>2 -> {3,4} = 2; a=3: b>3 -> {4} = 1. = 6
    rows = [("g", "a", 1.0), ("g", "a", 2.0), ("g", "a", 3.0),
            ("g", "b", 2.0), ("g", "b", 3.0), ("g", "b", 4.0)]
    df = spark.createDataFrame(rows, "g string, f string, v double")
    r = cliffs_delta(df, "v", "f", "a", "b", ["g"]).first()
    assert (r.n_gt, r.n_lt) == (1, 6)
    assert r.delta == pytest.approx((1 - 6) / 9)
    assert r.magnitude == "large"


def test_cliffs_delta_identical_is_zero(spark):
    from timeseriesutils_spark.operators.nonparam import cliffs_delta

    rows = [("g", f, float(v)) for v in (1, 2, 3) for f in ("a", "b")]
    df = spark.createDataFrame(rows, "g string, f string, v double")
    r = cliffs_delta(df, "v", "f", "a", "b", ["g"]).first()
    assert r.delta == 0.0 and r.magnitude == "negligible"


def test_brier_decomposition_identity_and_perfect_calibration(spark):
    from timeseriesutils_spark.operators.mleval import brier_decomposition

    # perfectly calibrated forecaster: p=0.2 bin has 20% positives,
    # p=0.8 bin has 80% -> reliability ~ 0, brier = unc - resolution
    rows = []
    for i in range(10):
        rows.append(("g", 0.2, i < 2))
    for i in range(10):
        rows.append(("g", 0.8, i < 8))
    df = spark.createDataFrame(rows, "g string, p double, y boolean")
    r = brier_decomposition(df, "p", "y", ["g"]).first()
    assert r.n == 20 and r.n_bins == 2
    assert r.reliability == pytest.approx(0.0, abs=1e-9)
    obar = 0.5
    assert r.uncertainty == pytest.approx(obar * (1 - obar))
    # resolution: both bins deviate 0.3 from obar
    assert r.resolution == pytest.approx(0.09, abs=1e-9)
    assert r.brier == pytest.approx(r.reliability - r.resolution
                                    + r.uncertainty)
    # cross-check vs the direct mean squared error
    mse = (2 * (0.2 - 1) ** 2 + 8 * 0.2**2
           + 8 * (0.8 - 1) ** 2 + 2 * 0.8**2) / 20
    assert r.brier == pytest.approx(mse, abs=1e-9)
