"""Unit tests for operators/sax.sax_symbolize."""

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.sax import sax_symbolize


def test_sax_known_word(spark):
    # 16 points: first half low (0), second half high (10) -> with 4
    # segments the PAA is [0, 0, 10, 10]; z = ±1 -> symbols 'a a d d'
    rows = [("g", t, 0.0 if t < 8 else 10.0) for t in range(16)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = sax_symbolize(df, "v", ["g"], ["t"], n_segments=4, alphabet=4).collect()
    assert len(out) == 1
    assert out[0].n_obs == 16
    assert out[0].sax == "aadd"


def test_sax_constant_series_null_word(spark):
    rows = [("g", t, 5.0) for t in range(12)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = sax_symbolize(df, "v", ["g"], ["t"], n_segments=4).collect()
    assert out[0].sax is None


def test_sax_row_order_invariance(spark):
    import random

    rng = random.Random(21)
    rows = [("g", t, float(rng.randint(0, 100))) for t in range(50)]
    rows += [("h", t, float(rng.randint(0, 100))) for t in range(37)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    a = {r.g: r.sax for r in sax_symbolize(df, "v", ["g"], ["t"]).collect()}
    b = {
        r.g: r.sax
        for r in sax_symbolize(df.orderBy(F.rand(5)), "v", ["g"], ["t"]).collect()
    }
    assert a == b and all(len(v) == 8 for v in a.values())


def test_sax_validates_alphabet(spark):
    df = spark.createDataFrame([("g", 0, 1.0)], "g string, t long, v double")
    with pytest.raises(ValueError):
        sax_symbolize(df, "v", ["g"], ["t"], alphabet=26)


def test_sax_null_values_dropped_not_fatal(spark):
    """A NULL observation must not shift ranks into a phantom segment
    (code-review regression: rank ran over all rows, count over
    non-null)."""
    rows = [("g", t, 0.0 if t < 8 else 10.0) for t in range(16)]
    rows.insert(5, ("g", 99, None))  # one NULL row
    df = spark.createDataFrame(rows, "g string, t long, v double")
    out = sax_symbolize(df, "v", ["g"], ["t"], n_segments=4, alphabet=4).collect()
    assert out[0].n_obs == 16
    assert out[0].sax == "aadd"
