"""Structured Streaming: the windows.py transformations must produce the
same results on a real readStream (file source, availableNow) as on the
batch frame — the equivalence the driver's batch-mode oracle relies on."""

import pytest

from timeseriesutils_spark.sources.tables import load_table
from timeseriesutils_spark.streaming.windows import (
    read_events_stream,
    session_counts,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.mark.parametrize(
    "fn,kwargs,name",
    [
        (tumbling_counts, dict(window="1 hour"), "t_tumbling"),
        (session_counts, dict(gap="30 minutes"), "t_session"),
    ],
)
def test_stream_equals_batch(spark, fn, kwargs, name):
    batch = fn(load_events_batch(spark), **kwargs)
    stream = fn(read_events_stream(spark, SF_DIR), watermark="1 day", **kwargs)
    got_stream = _run_stream(spark, stream, name)
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, got_stream.collect()))
    assert b == s


def load_events_batch(spark):
    return load_table(spark, SF_DIR, "events")


def test_running_user_stats_stateful(spark):
    """applyInPandasWithState: after the stream drains, the LAST update per
    user must equal the batch groupBy (count, max) — state accumulated
    correctly across micro-batches."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.streaming.windows import running_user_stats

    stream = read_events_stream(spark, SF_DIR)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # multiple update rows per user (one per batch it appeared in); the
    # final state is the row with the greatest n
    got = {
        r["user_id"]: (r["n"], r["max_value"])
        for r in spark.sql(
            "SELECT user_id, n, max_value FROM (SELECT *,"
            " ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC) AS rn"
            " FROM t_stateful) WHERE rn = 1"
        ).collect()
    }
    batch = load_events_batch(spark)
    want = {
        r["user_id"]: (r["n"], r["mx"])
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == want
