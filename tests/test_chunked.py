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
