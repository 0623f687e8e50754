"""Round-14 tests: ADVICE-r13 regression fixes + new operators."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


# --- ADVICE r13 fixes -------------------------------------------------------


def test_drain_sorted_merges_out_of_order_chunks():
    """A key's micro-batch can arrive as MULTIPLE Arrow chunks; the old
    per-chunk sort silently assumed chunks never interleave (ADVICE
    r13).  _drain_sorted must produce one globally-sorted frame."""
    from timeseriesutils_spark.streaming.windows import _drain_sorted

    c1 = pd.DataFrame({"ts": [5, 1], "event_id": [50, 10], "value": [5.0, 1.0]})
    c2 = pd.DataFrame({"ts": [3, 2], "event_id": [30, 20], "value": [3.0, None]})
    out = _drain_sorted(iter([c1, c2]), ("ts", "event_id"))
    assert out["ts"].tolist() == [1, 2, 3, 5]
    # dropna applied BEFORE the sort, matching the oracle's filtered src
    out2 = _drain_sorted(iter([c1, c2]), ("ts", "event_id"), dropna_col="value")
    assert out2["ts"].tolist() == [1, 3, 5]
    # all-empty / all-null drains to None
    assert _drain_sorted(iter([c1.iloc[0:0]]), ("ts",)) is None
    allnull = pd.DataFrame({"ts": [1], "event_id": [1], "value": [None]})
    assert _drain_sorted(iter([allnull]), ("ts",), dropna_col="value") is None


def _write_events_with_null_user(spark, tmp_path):
    """Events-shaped parquet: user 1 has real values, user 2 ALL-NULL."""
    rows = (
        [(1, i, float(i)) for i in range(20)]
        + [(2, 100 + i, None) for i in range(5)]
    )
    df = spark.createDataFrame(
        [(u, e, "2024-01-01 00:0%d:00" % (e % 10), v) for u, e, v in rows],
        "user_id bigint, event_id bigint, ts_s string, value double",
    ).select(
        "user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts"),
        "value",
    )
    path = str(tmp_path / "events_nulluser")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path, df


def _drain(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_conformal_all_null_key_emits_no_row(spark, tmp_path):
    """A key whose rows are ALL null-valued must not surface in the
    output — the SQL oracle's seen CTE filters WHERE value IS NOT NULL,
    so a streaming n_seen=0 row would have no oracle counterpart
    (ADVICE r13)."""
    from timeseriesutils_spark.streaming.windows import streaming_conformal

    path, batch = _write_events_with_null_user(spark, tmp_path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    got = _drain(
        spark,
        streaming_conformal(stream, fit_window=4, cal_window=8),
        "t_r14_sconf_null",
    )
    users = {r["user_id"] for r in got.collect()}
    assert users == {1}


def test_stream_crps_all_null_key_emits_no_row(spark, tmp_path):
    from timeseriesutils_spark.streaming.windows import streaming_crps

    path, batch = _write_events_with_null_user(spark, tmp_path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    got = _drain(
        spark, streaming_crps(stream, members=4), "t_r14_scrps_null"
    )
    users = {r["user_id"] for r in got.collect()}
    assert users == {1}


def test_bpe_encode_sql_takes_text_col(tmp_path):
    """bpe_encode_sql must honor a non-default text column like the
    Spark operator's text_col (ADVICE r13: asymmetric signatures)."""
    import duckdb

    from timeseriesutils_spark.operators.bpe import bpe_encode_sql

    sql = bpe_encode_sql("docs", text_col="body", n_merges=2)
    assert "trim(body)" in sql and "trim(text)" not in sql
    con = duckdb.connect()
    con.register(
        "docs",
        pd.DataFrame(
            {"doc_id": [1, 2], "body": ["aa ab aa", "ab ab ba"]}
        ),
    )
    rows = con.execute(sql).fetchall()
    assert len(rows) == 2 and all(r[1] == 3 for r in rows)  # n_words


def test_quality_logit_eta_clamp_lockstep(spark):
    """A corpus engineered to blow |η| far past the probability-clamp
    saturation point (huge mean-word-length feature) must keep both
    engines in lockstep — pre-clamp, Spark's DECIMAL(38,0) b-moments
    could overflow to silent NULL while DuckDB's HUGEINT raises
    (ADVICE r13)."""
    import duckdb

    from timeseriesutils_spark.operators.logit import (
        _ECAP,
        quality_logit,
        quality_logit_sql,
    )

    assert f"LEAST(CAST({_ECAP} AS BIGINT)" in quality_logit_sql()
    # full-IRLS separable escalation only reaches |η| > 14 after ~13
    # rounds (measured: ~+1.1 η/round), and DuckDB's planner can't
    # chain 13 Cramer CTEs in test time — so drive the clamp directly
    # via a warm start: β₃ = 1.0 and mean word length ~400 put η ≈ 400
    # on positives, 25× past the clamp, in round 1
    rows = []
    for i in range(8):
        rows.append((i, "x" * (380 + 5 * i) + " " + "y" * 400, "en"))
    for i in range(8, 16):
        rows.append((i, "a bb c ddd e f"[: 6 + (i % 5)], "de"))
    init = (0.0, 0.0, 0.0, 1.0)
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {
        r["doc_id"]: (r["label"], r["p_hat"], r["predicted"], r["correct"])
        for r in quality_logit(docs, n_rounds=2, init_beta=init).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]),
    )
    exp = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            quality_logit_sql(n_rounds=2, init_beta=init)
        ).fetchall()
    }
    assert set(got) == set(exp)
    for k in got:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], abs=0)
        assert got[k][2:] == exp[k][2:]
    # the clamp's domain was actually reached: warm-started η saturates
    # some fitted probability at a 1e-6-grid clamp end
    assert any(v[1] in (0.000001, 0.999999) for v in got.values())


# --- ets_select -------------------------------------------------------------


def _ets_toy_rows():
    import random

    random.seed(7)
    rows = []
    for t in range(60):
        rows.append(("A", t, 10.0 + 2.5 * t + random.gauss(0, 0.3)))
        rows.append(("B", t, 20.0 + 8.0 * (t % 7 == 3) + random.gauss(0, 0.2)))
        rows.append(("C", t, 5.0 + random.gauss(0, 1.0)))
    return rows


def test_ets_select_picks_planted_models_and_matches_oracle(spark):
    """The AICc argmin must recover each series' planted structure
    (trend → drift family, period-7 seasonality → seasonal family,
    iid noise → level family) and agree with the DuckDB twin
    bit-for-bit on every output column."""
    import struct

    import duckdb

    from timeseriesutils_spark.operators.ets import ets_select, ets_select_sql

    rows = _ets_toy_rows()
    df = spark.createDataFrame(rows, "g string, t int, y double")
    got = {
        r["g"]: (r["model"], r["k"], r["n_obs"], r["sse"], r["aicc"], r["forecast"])
        for r in ets_select(df, "y", ["g"], ["t"]).collect()
    }
    assert got["A"][0] in ("drift", "holt", "holt_damped")
    assert got["B"][0] in ("snaive", "holt_winters")
    assert got["C"][0] in ("mean", "ses", "naive")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "t", "y"]))
    exp = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            ets_select_sql("SELECT * FROM t", "y", ["g"], ["t"])
        ).fetchall()
    }
    assert set(got) == set(exp)
    for k in got:
        for a, b in zip(got[k], exp[k]):
            if isinstance(a, float):
                assert struct.pack("d", a) == struct.pack("d", b)
            else:
                assert a == b


def test_ets_select_sse_matches_numpy_reference(spark):
    """Straight-line per-group reference: recompute each candidate's
    quantized one-step residual SSE and AICc in pure numpy from the
    same impulse weights and confirm the selected row's numbers."""
    import numpy as np

    from timeseriesutils_spark.operators.ets import ets_candidates, ets_select

    rows = [r for r in _ets_toy_rows() if r[0] == "A"]
    y = np.array([v for _, _, v in rows])
    df = spark.createDataFrame(rows, "g string, t int, y double")
    got = ets_select(df, "y", ["g"], ["t"]).collect()[0]
    q = np.floor(y * 100.0 + 0.5)
    w = 14
    best = None
    n = len(q) - w
    for name, k, wts in ets_candidates():
        fc = np.zeros(len(q))
        for j, wt in wts:
            fc[w:] += wt * q[w - j : len(q) - j]
        eq = np.floor((q[w:] - fc[w:]) * 1e4 + 0.5)
        sse_q = float((eq * eq).sum())
        sse = sse_q / 1e12
        kp = k + 1.0
        aicc = (
            n * np.log(max(sse_q, 1.0) / (n * 1e12))
            + 2 * kp
            + 2 * kp * (kp + 1) / (n - kp - 1)
        )
        aicc_quant = np.floor(aicc * 1e6 + 0.5) / 1e6
        if best is None or (aicc_quant, name) < best[:2]:
            best = (aicc_quant, name, k, sse)
    assert got["model"] == best[1]
    assert got["k"] == best[2]
    assert got["n_obs"] == n
    assert got["sse"] == pytest.approx(best[3], rel=1e-12)
    assert got["aicc"] == pytest.approx(best[0], abs=2e-6)
    # next-step forecast: winner's weights applied to the series tail
    _, _, wts = next(
        c for c in ets_candidates() if c[0] == best[1]
    )
    fc_next = sum(wt * q[len(q) - j] for j, wt in wts) / 100.0
    assert got["forecast"] == pytest.approx(fc_next, rel=1e-12)


def test_ets_select_plan_single_exchange(spark):
    """The candidate family must share ONE window chain: exactly one
    hash exchange for the window/aggregation lineage and zero joins."""
    rows = _ets_toy_rows()
    df = spark.createDataFrame(rows, "g string, t int, y double")
    from timeseriesutils_spark.operators.ets import ets_select

    plan = ets_select(df, "y", ["g"], ["t"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 1, plan[:2000]


def test_ets_select_short_groups_filtered(spark):
    """Groups with fewer than min_obs scoreable rows emit no row."""
    from timeseriesutils_spark.operators.ets import ets_select

    rows = [("S", t, float(t)) for t in range(16)]  # 2 scoreable rows
    df = spark.createDataFrame(rows, "g string, t int, y double")
    assert ets_select(df, "y", ["g"], ["t"], min_obs=8).count() == 0
    assert ets_select(df, "y", ["g"], ["t"], min_obs=2).count() == 1


# --- fasttext_classifier ----------------------------------------------------


def _ft_planted_rows():
    """Two classes distinguishable ONLY by character-bigram families
    (random words over alphabet 'abcd' vs 'wxyz'); test docs
    (id >= 40) use NOVEL words — lengths 9-14 vs training's 3-8, so no
    test word ever appeared in training — drawn from the same bigram
    distributions.  A word-memorizing classifier has zero signal on
    the test half; subword features generalize.  (Fixed seed; the
    words must be DIVERSE — repeats of one short unit make every doc
    of a class the same feature point and the normal equations
    singular.)"""
    import random

    rng = random.Random(11)

    def word(alpha, n):
        return "".join(rng.choice(alpha) for _ in range(n))

    rows = []
    for i in range(20):
        rows.append(
            (i, " ".join(word("abcd", rng.randint(3, 8)) for _ in range(6)), "aa")
        )
        rows.append(
            (20 + i, " ".join(word("wxyz", rng.randint(3, 8)) for _ in range(6)), "zz")
        )
    for i in range(10):
        rows.append(
            (40 + i, " ".join(word("abcd", rng.randint(9, 14)) for _ in range(5)), "aa")
        )
        rows.append(
            (50 + i, " ".join(word("wxyz", rng.randint(9, 14)) for _ in range(5)), "zz")
        )
    return rows


def test_fasttext_generalizes_to_unseen_words(spark):
    """Fit on the train half, score everything: test-half accuracy must
    be high even though every test word is novel.  nb_classifier's
    score for an all-unseen-words doc is prior - n·ln(T_k + V) — a
    CONSTANT argmax across all test docs (≤ 0.5 accuracy on this
    balanced test set), which is exactly the off-vocabulary collapse
    the hashed subword features avoid."""
    from timeseriesutils_spark.operators.fasttext import fasttext_classifier

    rows = _ft_planted_rows()
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {
        r["doc_id"]: r["correct"]
        for r in fasttext_classifier(
            docs,
            classes=("aa", "zz"),
            n_rounds=3,
            fit_filter=F.col("_id") < 40,
        ).collect()
    }
    test_ids = [k for k in out if k >= 40]
    assert len(test_ids) == 20
    acc = sum(1 for k in test_ids if out[k]) / len(test_ids)
    assert acc >= 0.9, acc
    # train half fits too
    train_acc = sum(1 for k in out if k < 40 and out[k]) / 40
    assert train_acc >= 0.9, train_acc


def test_fasttext_matches_duckdb_twin(spark):
    """Every output row (class pick included) must agree with the SQL
    twin exactly — training rounds, argmax tiebreak and all."""
    import duckdb

    from timeseriesutils_spark.operators.dedup import (
        portable_hash64,
        portable_hash64_sql,
    )
    from timeseriesutils_spark.operators.fasttext import (
        fasttext_classifier,
        fasttext_classifier_sql,
    )

    rows = _ft_planted_rows()
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {
        r["doc_id"]: (r["label"], r["predicted"], r["correct"], r["p_top"])
        for r in fasttext_classifier(
            docs,
            classes=("aa", "zz"),
            n_rounds=2,
            fit_filter=portable_hash64(F.col("_id").cast("string")) % 10 < 7,
        ).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]),
    )
    exp = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            fasttext_classifier_sql(
                "documents",
                classes=("aa", "zz"),
                n_rounds=2,
                fit_where=(
                    f"{portable_hash64_sql('CAST(_id AS VARCHAR)')} % 10 < 7"
                ),
            )
        ).fetchall()
    }
    assert got == exp


def test_fasttext_one_char_words_parity(spark):
    """1-char words must contribute NO bigrams in either engine —
    Spark's sequence(1, 0) descends instead of being empty, so an
    unguarded transform would emit phantom bigrams Spark-side only."""
    import duckdb

    from timeseriesutils_spark.operators.fasttext import (
        fasttext_classifier,
        fasttext_classifier_sql,
    )

    rows = [
        (1, "a b c ab ab ba", "aa"),
        (2, "z y zy yz zy", "zz"),
        (3, "q w e", "aa"),  # only 1-char words -> no feature row
        (4, "ab ba ab", "aa"),
        (5, "zy yz yz", "zz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {
        r["doc_id"]: (r["predicted"], r["p_top"])
        for r in fasttext_classifier(
            docs, classes=("aa", "zz"), n_rounds=1
        ).collect()
    }
    assert 3 not in got  # all-1-char doc: no bigrams, no row
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    exp = {
        r[0]: (r[2], r[4])
        for r in con.execute(
            fasttext_classifier_sql(
                "documents", classes=("aa", "zz"), n_rounds=1
            )
        ).fetchall()
    }
    assert got == exp


# --- dup_span_exact_audit ---------------------------------------------------


def test_dup_span_exact_audit_quantifies_granularity_miss(spark):
    """A 6-word common span (>= L=4, < n=8) must be found EXACTLY and
    reported as missed by the 8-window detector; a 12-word span must be
    fully recovered.  Engines must agree row-for-row."""
    import duckdb

    from timeseriesutils_spark.operators.dupspan import (
        dup_span_exact_audit,
        dup_span_exact_audit_sql,
    )

    common6 = "alpha beta gamma delta epsilon zeta"
    common12 = (
        "one two three four five six seven eight nine ten eleven twelve"
    )
    rows = [
        (1, "xx yy " + common6 + " qq ww ee rr tt", "en"),
        (2, "aa bb cc " + common6 + " dd ff gg hh jj", "en"),
        (3, "start " + common12 + " endx", "en"),
        (4, "other words here " + common12 + " tail bits", "en"),
        (5, "completely unrelated text with no duplicated span here ok", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["exact_len"],
            r["exact_a_start"],
            r["exact_b_start"],
            r["detected_len"],
            r["missed"],
            r["recovered"],
        )
        for r in dup_span_exact_audit(docs).collect()
    }
    assert got[(1, 2)] == (6, 2, 3, 0, 6, False)
    assert got[(3, 4)] == (12, 1, 3, 12, 0, True)
    assert (1, 5) not in got and (2, 5) not in got
    # exact_len >= detected_len always (a detected span IS a common span)
    assert all(v[0] >= v[3] for v in got.values())
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    exp = {
        (r[0], r[1]): (r[3], r[4], r[5], r[6], r[7], r[8])
        for r in con.execute(dup_span_exact_audit_sql()).fetchall()
    }
    assert got == exp


def test_dup_span_exact_audit_posting_cap_skips_hot_hashes(spark):
    """An L-gram shared by MORE than max_posting documents must not
    generate candidate pairs (the boilerplate-explosion guard)."""
    from timeseriesutils_spark.operators.dupspan import dup_span_exact_audit

    hot = "the same four words"
    rows = [(i, f"doc {i} prefix " + hot, "en") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    # posting list size 10 > cap 4 -> no eligible hash -> no pairs
    assert dup_span_exact_audit(docs, max_posting=4).count() == 0
    # raising the cap surfaces them
    assert dup_span_exact_audit(docs, max_posting=16).count() > 0


# --- bench cold-cost instrumentation ----------------------------------------


def test_checkpoint_once_touch_tracking(spark, tmp_path):
    """The bench auto-detects checkpoint_once consumers via the touch
    log, and clear_memo forces a rebuild (the one-shot cost lever —
    VERDICT r13 #2)."""
    from timeseriesutils_spark.functions import checkpoint as cp

    cp.drain_touched()
    builds = {"n": 0}

    def builder():
        builds["n"] += 1
        return spark.range(5).toDF("x")

    a = cp.checkpoint_once("t_r14_memo", builder, spark)
    assert a.count() == 5 and builds["n"] == 1
    assert cp.drain_touched() == ["t_r14_memo"]
    # second consumer: memo hit (no rebuild) but still TOUCHES
    cp.checkpoint_once("t_r14_memo", builder, spark)
    assert builds["n"] == 1
    assert cp.drain_touched() == ["t_r14_memo"]
    # cleared memo -> next consumer pays the build again
    cp.clear_memo()
    cp.checkpoint_once("t_r14_memo", builder, spark)
    assert builds["n"] == 2
    assert cp.drain_touched() == ["t_r14_memo"]


# --- cluster_balanced_sample ------------------------------------------------


def test_cluster_sample_modes_and_balance(spark):
    """All three modes: per-cluster cap respected, hard/easy pick
    opposite distance extremes, and each mode matches its DuckDB twin
    exactly."""
    import duckdb

    from timeseriesutils_spark.operators.kmeans import (
        cluster_balanced_sample,
        cluster_balanced_sample_sql,
    )

    # two well-separated blobs + distinguishable radii
    rows = []
    for i in range(20):
        rows.append((i, [float(10 + (i % 5)), 0.0]))
        rows.append((100 + i, [0.0, float(50 + (i % 7))]))
    docs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(rows, columns=["vec_id", "embedding"]),
    )
    for mode in ("uniform", "hard", "easy"):
        got = sorted(
            map(
                tuple,
                cluster_balanced_sample(
                    docs, k=2, n_iter=2, scale=2, per_cluster=5, mode=mode
                ).collect(),
            )
        )
        exp = sorted(
            map(
                tuple,
                con.execute(
                    cluster_balanced_sample_sql(
                        k=2, n_iter=2, scale=2, per_cluster=5, mode=mode
                    )
                ).fetchall(),
            )
        )
        assert got == exp, mode
        from collections import Counter

        by_cluster = Counter(r[1] for r in got)
        assert all(v == 5 for v in by_cluster.values()), (mode, by_cluster)
    hard = cluster_balanced_sample(
        docs, k=2, n_iter=2, scale=2, per_cluster=5, mode="hard"
    ).collect()
    easy = cluster_balanced_sample(
        docs, k=2, n_iter=2, scale=2, per_cluster=5, mode="easy"
    ).collect()
    assert min(r["dist_q"] for r in hard) >= 0
    # hard picks sit at least as far out as easy picks, per cluster
    for cl in {r["cluster"] for r in hard}:
        hmin = min(r["dist_q"] for r in hard if r["cluster"] == cl)
        emax = max(r["dist_q"] for r in easy if r["cluster"] == cl)
        assert hmin >= emax or len(
            [r for r in hard if r["cluster"] == cl]
        ) == len([r for r in easy if r["cluster"] == cl]) == 5


# --- unimax_mixture ---------------------------------------------------------


def test_unimax_water_filling_closed_form(spark):
    """The closed form must reproduce the paper's sequential greedy:
    skewed domains -> low-resource capped at max_epochs, high-resource
    at the shared water level; extremes (nobody capped / everybody
    capped) behave; engines agree exactly."""
    import duckdb

    from timeseriesutils_spark.operators.splits import (
        unimax_mixture,
        unimax_mixture_sql,
    )

    rows = []
    did = 0
    for dom, ndocs in (("small", 2), ("mid", 4), ("big", 20)):
        for _ in range(ndocs):
            rows.append((did, "w " * 9 + "w", dom))  # 10 tokens/doc
            did += 1
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")

    def greedy(counts, B, E):
        """The paper's sequential loop, as the independent reference."""
        doms = sorted(counts, key=lambda d: (counts[d] * E, d))
        out, R, m = {}, B, len(doms)
        for d in doms:
            out[d] = min(counts[d] * E, R // m)
            R -= out[d]
            m -= 1
        return out

    counts = {"small": 20, "mid": 40, "big": 200}
    for bn, E in ((3, 4), (1, 1), (100, 2), (1, 100)):
        got = {
            r["domain"]: (r["n_tokens"], r["allocated"], r["capped"])
            for r in unimax_mixture(
                docs, budget_num=bn, budget_den=1, max_epochs=E
            ).collect()
        }
        exp_alloc = greedy(counts, sum(counts.values()) * bn, E)
        for d in counts:
            assert got[d][0] == counts[d]
            cap = counts[d] * E
            if got[d][2]:
                assert got[d][1] == cap
            else:
                # uncapped water level == greedy's equal share
                assert got[d][1] == exp_alloc[d], (bn, E, d, got)
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(rows, columns=["doc_id", "text", "lang"]),
        )
        exp = {
            r[0]: (r[1], r[3], r[5])
            for r in con.execute(
                unimax_mixture_sql(budget_num=bn, budget_den=1, max_epochs=E)
            ).fetchall()
        }
        assert got == exp, (bn, E)
    # budget >= sum of caps: everyone capped at full epochs
    allc = {
        r["domain"]: r
        for r in unimax_mixture(
            docs, budget_num=100, budget_den=1, max_epochs=2
        ).collect()
    }
    assert all(r["capped"] and r["epochs"] == 2.0 for r in allc.values())
