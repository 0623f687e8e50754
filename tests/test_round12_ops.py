"""Round-12 tests: ADVICE-r11 regression fixes + new operators."""

import numpy as np
import pytest


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
