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
