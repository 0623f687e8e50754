"""Unit tests for RFM segmentation and ABC analysis
(operators/segments.py)."""

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.segments import abc_analysis, rfm_segments


def test_abc_classes(spark):
    # revenues 60, 25, 10, 5 -> cum shares .60, .85, .95, 1.00
    rows = [(1, 60.0), (2, 25.0), (3, 10.0), (4, 5.0)]
    df = spark.createDataFrame(rows, "p long, amt double")
    out = {r.p: r for r in abc_analysis(df, "p", "amt").collect()}
    assert out[1].abc_class == "A" and out[1].rnk == 1
    assert out[2].abc_class == "B"          # 0.85 <= 0.95
    assert out[3].abc_class == "B"          # 0.95 <= 0.95 (inclusive)
    assert out[4].abc_class == "C"
    assert out[1].cum_share == pytest.approx(0.6, rel=1e-12)
    assert out[4].cum_share == pytest.approx(1.0, rel=1e-12)


def test_abc_aggregates_entity_revenue(spark):
    rows = [(1, 30.0), (1, 30.0), (2, 25.0)]
    df = spark.createDataFrame(rows, "p long, amt double")
    out = {r.p: r for r in abc_analysis(df, "p", "amt").collect()}
    assert out[1].revenue == 60.0 and out[1].rnk == 1


def test_rfm_scores_and_segments(spark):
    # 10 customers: customer i ordered i times, most recent = higher i,
    # spend grows with i -> customer 10 is a champion, customer 1 hibernates
    rows = []
    for c in range(1, 11):
        for k in range(c):
            rows.append((c, f"2024-01-{c:02d}", 100.0 * c))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string, o_totalprice double"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    out = {r.o_custkey: r for r in rfm_segments(df).collect()}
    assert out[10].r_score == 5 and out[10].f_score == 5 and out[10].m_score == 5
    assert out[10].segment == "champions"
    assert out[1].r_score == 1 and out[1].f_score == 1
    assert out[1].segment == "hibernating"
    assert out[10].recency_days == 0 and out[1].recency_days == 9
    assert out[3].monetary == pytest.approx(3 * 300.0)
