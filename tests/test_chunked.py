"""Chunked trailing-window features must equal the unchunked plan exactly
— the skewed-monster-group mitigation cannot change results."""

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.chunked import chunked_trailing_features
from timeseriesutils_spark.operators.window_features import lag, rollmean
from timeseriesutils_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _series(spark):
    return load_table(spark, SF_DIR, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"
    )


ORDER = ["l_shipdate", "l_orderkey", "l_linenumber"]
KEY = ["l_suppkey", "l_orderkey", "l_linenumber"]


@pytest.mark.parametrize("chunk_rows", [7, 50])
def test_chunked_equals_plain(spark, chunk_rows):
    li = _series(spark)

    def features(df, groups):
        out, names = lag(df, "l_extendedprice", groups, window_size=3, order_by=ORDER)
        return rollmean(
            out, "l_extendedprice", groups, feature_names=names, window_size=4, order_by=ORDER
        )

    plain_df, names = features(li, ["l_suppkey"])
    chunked_df, names2 = chunked_trailing_features(
        li, ["l_suppkey"], ORDER, features, chunk_rows=chunk_rows, context_rows=4
    )
    assert names2 == names
    key = lambda r: tuple(r[k] for k in KEY)
    plain = {key(r): tuple(r[n] for n in names) for r in plain_df.collect()}
    chunked = {key(r): tuple(r[n] for n in names) for r in chunked_df.collect()}
    assert chunked == plain


def _canon_val(v):
    import math

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return v


@pytest.mark.parametrize("chunk_rows", [20, 64])
def test_chunked_domfreq_equals_plain(spark, chunk_rows):
    """Chunk-parallel trailing domfreq ≡ unchunked, bitwise (same windows
    → same FFT inputs; numpy rfft is row-independent)."""
    from timeseriesutils_spark.operators.chunked import chunked_domfreq
    from timeseriesutils_spark.operators.domfreq import domfreq

    li = _series(spark)
    plain_df, names = domfreq(
        li, "l_extendedprice", ["l_suppkey"],
        window_size=8, window_align="trailing", n_domfreq=2, order_by=ORDER,
    )
    chunked_df, names2 = chunked_domfreq(
        li, "l_extendedprice", ["l_suppkey"], ORDER,
        window_size=8, n_domfreq=2, chunk_rows=chunk_rows,
    )
    assert names2 == names
    key = lambda r: tuple(r[k] for k in KEY)
    plain = {key(r): tuple(_canon_val(r[n]) for n in names) for r in plain_df.collect()}
    chunked = {key(r): tuple(_canon_val(r[n]) for n in names) for r in chunked_df.collect()}
    assert chunked == plain


def test_chunked_taylor_trailing_equals_plain(spark):
    """Chunk-parallel trailing taylor (strict reference edges) ≡ unchunked:
    edge rows exist only in the group's first chunk; later chunks' rows all
    land on the interior fit with identical window contents."""
    from timeseriesutils_spark.operators.chunked import chunked_taylor_trailing
    from timeseriesutils_spark.operators.taylor import windowed_taylor_coefs

    li = _series(spark)
    plain_df, names = windowed_taylor_coefs(
        li, "l_extendedprice", ["l_suppkey"],
        taylor_degree=1, window_size=6, window_align="trailing", order_by=ORDER,
    )
    chunked_df, names2 = chunked_taylor_trailing(
        li, "l_extendedprice", ["l_suppkey"], ORDER,
        taylor_degree=1, window_size=6, chunk_rows=25,
    )
    assert names2 == names
    key = lambda r: tuple(r[k] for k in KEY)
    plain = {key(r): tuple(_canon_val(r[n]) for n in names) for r in plain_df.collect()}
    chunked = {key(r): tuple(_canon_val(r[n]) for n in names) for r in chunked_df.collect()}
    assert chunked == plain


def test_chunked_context_guard():
    from timeseriesutils_spark.operators.chunked import chunked_trailing_features

    with pytest.raises(ValueError, match="context_rows"):
        chunked_trailing_features(None, ["g"], ["t"], None, chunk_rows=4, context_rows=5)


def test_salted_broadcast_join_equals_plain(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.functions.skew import salted_broadcast_join

    # one monster key (90% of rows) + a long tail
    fact = spark.createDataFrame(
        [(0 if i % 10 else i % 7, i) for i in range(5000)], "k long, v long"
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(7)], "k long, name string")
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_broadcast_join(fact, dim, "k").select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    lj = salted_broadcast_join(fact, dim, "k", how="left").select("k", "v", "name")
    plain_lj = fact.join(dim, "k", "left").select("k", "v", "name")
    assert sorted(map(tuple, plain_lj.collect())) == sorted(map(tuple, lj.collect()))


def test_distributed_chunk_assignment_equals_serial(spark):
    """with_row_chunks_distributed must assign the IDENTICAL _chunk id
    per row as the group-serial with_row_chunks, for any monotone
    bucketing of the (unique) order key — including buckets that split
    groups unevenly and groups missing from early buckets."""
    import random

    from timeseriesutils_spark.operators.chunked import (
        with_row_chunks,
        with_row_chunks_distributed,
    )

    random.seed(6)
    rows = []
    for g in range(5):
        ts = random.sample(range(1000), random.randint(1, 400))
        rows += [(f"g{g}", t, float(t % 7)) for t in ts]
    df = spark.createDataFrame(rows, "g string, t long, y double")
    for chunk_rows, width in ((16, 100), (50, 13), (7, 1000)):
        a = with_row_chunks(df, ["g"], ["t"], chunk_rows)
        b = with_row_chunks_distributed(
            df, ["g"], ["t"], chunk_rows, F.floor(F.col("t") / width)
        )
        got_a = {(r.g, r.t): r._chunk for r in a.collect()}
        got_b = {(r.g, r.t): r._chunk for r in b.collect()}
        assert got_a == got_b


def test_chunked_taylor_bucket_path_equals_plain(spark):
    """chunked_taylor_trailing with a distributed bucket chunker is
    bit-identical to the unchunked op (the same law the serial chunker
    obeys).  Uses the fixture's TOTAL order — raw (orderkey, linenumber)
    alone has in-group duplicates, and a non-total order makes chunk-
    boundary tie-breaks legitimately nondeterministic for ANY chunker."""
    from timeseriesutils_spark.operators.chunked import chunked_taylor_trailing
    from timeseriesutils_spark.operators.taylor import windowed_taylor_coefs

    li = _series(spark)
    kw = dict(taylor_degree=1, window_size=7, ew_span=None, fill_edges=True)
    plain, names = windowed_taylor_coefs(
        li, "l_extendedprice", ["l_suppkey"], window_align="trailing",
        order_by=ORDER, **kw
    )
    # bucket = month of the leading order column: monotone in ORDER,
    # equal order values share a bucket
    bucket = F.date_trunc("month", F.col("l_shipdate")).cast("long")
    chunked, _ = chunked_taylor_trailing(
        li, "l_extendedprice", ["l_suppkey"], ORDER,
        chunk_rows=64, bucket=bucket, **kw
    )
    pa = {tuple(r[k] for k in KEY): tuple(r[n] for n in names)
          for r in plain.collect()}
    pb = {tuple(r[k] for k in KEY): tuple(r[n] for n in names)
          for r in chunked.collect()}
    assert pa == pb
