"""Unit tests for counter-rate extraction (operators/counters.py)."""

from pyspark.sql import functions as F

from timeseriesutils_spark.operators.counters import counter_rate


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "g string, ts string, id long, v long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_counter_rate_resets(spark):
    rows = [
        ("a", "2024-01-01 00:05:00", 1, 100),
        ("a", "2024-01-01 00:15:00", 2, 250),  # +150
        ("a", "2024-01-01 00:45:00", 3, 40),   # reset -> +40
        ("a", "2024-01-01 01:10:00", 4, 90),   # +50, next hour
    ]
    out = {
        r.bucket_ts.isoformat(): r
        for r in counter_rate(_df(spark, rows), "v", "ts", ["g"], id_col="id").collect()
    }
    h0, h1 = out["2024-01-01T00:00:00"], out["2024-01-01T01:00:00"]
    assert h0.increase == 190 and h0.n_samples == 3 and h0.n_resets == 1
    assert h1.increase == 50 and h1.n_samples == 1 and h1.n_resets == 0


def test_counter_rate_first_sample_no_delta(spark):
    rows = [("a", "2024-01-01 00:00:00", 1, 500)]
    r = counter_rate(_df(spark, rows), "v", "ts", ["g"], id_col="id").collect()[0]
    assert r.increase == 0 and r.n_samples == 1 and r.n_resets == 0


def test_counter_rate_series_isolation(spark):
    # the LAG never crosses series: b's first sample sees no a-predecessor
    rows = [
        ("a", "2024-01-01 00:00:00", 1, 1000),
        ("b", "2024-01-01 00:30:00", 2, 5),
        ("b", "2024-01-01 00:40:00", 3, 9),
    ]
    out = {r.g: r for r in
           counter_rate(_df(spark, rows), "v", "ts", ["g"], id_col="id").collect()}
    assert out["b"].increase == 4 and out["b"].n_resets == 0
    assert out["a"].increase == 0
