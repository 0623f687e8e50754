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


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a watermark: rows arriving after the
    watermark passed their window are dropped, not merged."""
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    src = tmp_path / "stream_src"
    src.mkdir()

    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def write_batch(name, ts_list):
        tbl = pa.table(
            {
                "ts": pa.array(pd.to_datetime(ts_list), type=pa.timestamp("us")),
                "v": pa.array(range(len(ts_list)), type=pa.int64()),
            }
        )
        pq.write_table(tbl, src / name)

    def run_once():
        stream = spark.readStream.schema("ts timestamp, v long").parquet(str(src))
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").cast("string").alias("start"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: hours 10 and 12 → watermark persisted at 12:00 − 1h = 11:00
    write_batch("a.parquet", ["2024-01-01 10:15", "2024-01-01 10:45", "2024-01-01 12:00"])
    run_once()
    # run 2 (same checkpoint): one LATE row for hour 10 — older than the
    # restored watermark → dropped — and one fresh row for hour 12
    write_batch("b.parquet", ["2024-01-01 10:30", "2024-01-01 12:30"])
    run_once()
    got = {
        r["start"]: r["n"] for r in spark.read.parquet(out_dir).collect()
    }
    # hour-10 window closed with 2 rows; the late 10:30 row never counted
    assert got.get("2024-01-01 10:00:00") == 2


def test_stream_interval_join_equals_batch(spark):
    """Stream-stream inner join (both sides watermarked, time-bounded
    condition): append-mode results over the drained stream equal the
    batch interval join."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.streaming.windows import stream_interval_join

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    bl, br = split(load_events_batch(spark))
    batch = stream_interval_join(bl, br, within="10 minutes")
    sl, sr = split(read_events_stream(spark, SF_DIR))
    stream = stream_interval_join(sl, sr, within="10 minutes", watermark="1 day")
    q = (
        stream.writeStream.format("memory")
        .queryName("t_sj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_sj")
    assert sorted(map(tuple, batch.collect())) == sorted(map(tuple, got.collect()))
    assert batch.count() > 0


def test_stream_upsert_sink(spark, tmp_path):
    """foreachBatch MERGE sink: drain a stream of upsert rows in two
    micro-batches; the final snapshot must equal applying the batches
    sequentially with merge_upsert (insert, update-wins, delete)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from timeseriesutils_spark.streaming.sinks import (
        read_upsert_snapshot,
        stream_upsert_sink,
    )

    src = tmp_path / "upd_src"
    src.mkdir()
    out = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        tbl = pa.table(
            {
                "k": pa.array([r[0] for r in rows], type=pa.int64()),
                "v": pa.array([r[1] for r in rows], type=pa.float64()),
                "is_delete": pa.array([r[2] for r in rows], type=pa.bool_()),
            }
        )
        pq.write_table(tbl, src / name)

    def drain():
        stream = spark.readStream.schema("k long, v double, is_delete boolean") \
            .option("maxFilesPerTrigger", 1).parquet(str(src))
        q = (
            stream_upsert_sink(stream, out, "k", "is_delete", checkpoint=ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: three inserts
    write_batch("a.parquet", [(1, 1.0, False), (2, 2.0, False), (3, 3.0, False)])
    drain()
    got1 = {r.k: r.v for r in read_upsert_snapshot(spark, out).collect()}
    assert got1 == {1: 1.0, 2: 2.0, 3: 3.0}

    # batch 2 (restart, same checkpoint): update 1, delete 2, insert 4
    write_batch("b.parquet", [(1, 10.0, False), (2, 0.0, True), (4, 4.0, False)])
    drain()
    got2 = {r.k: r.v for r in read_upsert_snapshot(spark, out).collect()}
    assert got2 == {1: 10.0, 3: 3.0, 4: 4.0}


def test_stream_rollup_sink(spark, tmp_path):
    """Continuous-aggregate sink: draining a two-batch stream through the
    additive-merge foreachBatch sink must equal one batch groupBy over
    all the data (exact decimal sums merge associatively)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from timeseriesutils_spark.functions.exact import dsum
    from timeseriesutils_spark.streaming.sinks import (
        read_upsert_snapshot,
        stream_rollup_sink,
    )

    src = tmp_path / "roll_src"
    src.mkdir()
    out = str(tmp_path / "roll_snap")
    ckpt = str(tmp_path / "roll_ckpt")

    def write_batch(name, rows):
        tbl = pa.table(
            {
                "g": pa.array([r[0] for r in rows], type=pa.string()),
                "v": pa.array([r[1] for r in rows], type=pa.float64()),
            }
        )
        pq.write_table(tbl, src / name)

    batch1 = [("a", 1.25), ("a", 2.5), ("b", 10.0)]
    batch2 = [("a", 0.25), ("c", 7.0), ("b", -3.5)]
    write_batch("a.parquet", batch1)
    write_batch("b.parquet", batch2)

    stream = spark.readStream.schema("g string, v double") \
        .option("maxFilesPerTrigger", 1).parquet(str(src))
    q = stream_rollup_sink(
        stream, out, ["g"],
        {"n": F.count(F.lit(1)), "s": dsum("v")},
        {"n": F.sum("n"), "s": dsum("s", scale=6)},
        checkpoint=ckpt,
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {
        r.g: (r.n, float(r.s))
        for r in read_upsert_snapshot(spark, out).collect()
    }
    assert got == {"a": (3, 4.0), "b": (2, 6.5), "c": (1, 7.0)}


def test_sink_replay_idempotent(spark, tmp_path):
    """Crash-replay contract: if the engine dies between a batch's
    snapshot parquet commit and the stream's checkpoint commit, the batch
    is re-applied with the same batch_id.  The replay must merge against
    the latest base with version < batch_id — reading its own committed
    output would double-count rollup partials and make the upsert sink
    overwrite a path it is reading from."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.streaming.sinks import (
        apply_rollup_batch,
        apply_upsert_batch,
        read_upsert_snapshot,
    )

    out_u = str(tmp_path / "u")
    b0 = spark.createDataFrame([(1, 1.0)], "k long, v double")
    b1 = spark.createDataFrame([(1, 10.0), (2, 2.0)], "k long, v double")
    apply_upsert_batch(b0, 0, out_u, "k")
    apply_upsert_batch(b1, 1, out_u, "k")
    # replay of batch 1: pre-fix this read snap_v1 as its own base and
    # raised "Cannot overwrite a path that is also being read from"
    apply_upsert_batch(b1, 1, out_u, "k")
    got = {r.k: r.v for r in read_upsert_snapshot(spark, out_u).collect()}
    assert got == {1: 10.0, 2: 2.0}

    out_r = str(tmp_path / "r")
    r0 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")
    r1 = spark.createDataFrame([("a", 3.0)], "g string, v double")
    partial = {"n": F.count(F.lit(1)), "s": F.sum("v")}
    merge = {"n": F.sum("n"), "s": F.sum("s")}
    apply_rollup_batch(r0, 0, out_r, ["g"], partial, merge)
    apply_rollup_batch(r1, 1, out_r, ["g"], partial, merge)
    # replay of batch 1: pre-fix this re-added the batch's partials on
    # top of snap_v1 (double count: a -> (3, 7.0))
    apply_rollup_batch(r1, 1, out_r, ["g"], partial, merge)
    got = {r.g: (r.n, r.s) for r in read_upsert_snapshot(spark, out_r).collect()}
    assert got == {"a": (2, 4.0), "b": (1, 2.0)}


def test_stream_static_join_equals_batch(spark):
    """stream_enrich on a readStream frame joined to the static batch
    dim == the pure-batch form (stream-static joins need no state)."""
    from timeseriesutils_spark.streaming.windows import (
        stream_enrich,
        user_profile,
    )

    batch_ev = load_events_batch(spark)
    dim = user_profile(batch_ev)
    batch = stream_enrich(batch_ev, dim)
    stream = stream_enrich(read_events_stream(spark, SF_DIR), dim, watermark="1 day")
    got_stream = _run_stream(spark, stream, "t_static_join")
    assert sorted(map(tuple, batch.collect())) == sorted(
        map(tuple, got_stream.collect())
    )


def test_streaming_cusum_equals_batch_closed_form(spark):
    """The O(1)-state streaming CUSUM's drained final state equals the
    batch closed-form operator's last row per key — the two independent
    implementations (numpy fold vs prefix-extrema windows) agree."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.changepoint import cusum
    from timeseriesutils_spark.streaming.windows import (
        read_events_stream,
        streaming_cusum,
    )

    params = dict(target=50.0, threshold=500.0, scale=2)
    stream = streaming_cusum(read_events_stream(spark, SF_DIR), **params)
    got = _run_stream_update(spark, stream, "t_scusum")
    w = W.partitionBy("user_id").orderBy(F.col("n").desc())
    final = {
        r.user_id: (r.n, r.cusum_pos, r.cusum_neg, r.alarm)
        for r in got.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .collect()
    }

    ev = load_events_batch(spark).select("user_id", "ts", "event_id", "value")
    b = cusum(ev, "value", "ts", ["user_id"], **params)
    wl = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    want = {
        r.user_id: (r.n, r.value_cusum_pos, r.value_cusum_neg, r.value_cusum_alarm)
        for r in b.withColumn("_rn", F.row_number().over(wl))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("user_id")))
        .where("_rn = 1")
        .collect()
    }
    assert final == want and len(final) > 0


def _run_stream_update(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_counter_rate_equals_batch(spark):
    """The stateful streaming counter-rate's drained totals equal the
    batch LAG closed form (operators/counters.counter_rate summed over
    all buckets) — state carries the last reading across micro-batches."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.counters import counter_rate
    from timeseriesutils_spark.streaming.windows import (
        read_events_stream,
        streaming_counter_rate,
    )

    stream = streaming_counter_rate(read_events_stream(spark, SF_DIR), scale=2)
    got = _run_stream_update(spark, stream, "t_sctr")
    w = W.partitionBy("user_id").orderBy(F.col("n").desc())
    final = {
        r.user_id: (r.n, r.increase, r.n_resets)
        for r in got.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .collect()
    }

    ev = load_events_batch(spark).select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("ctr"),
    )
    b = (
        counter_rate(ev, "ctr", "ts", ["user_id"], bucket="year", id_col="event_id")
        .groupBy("user_id")
        .agg(
            F.sum("n_samples").alias("n"),
            F.sum("increase").alias("increase"),
            F.sum("n_resets").alias("n_resets"),
        )
    )
    want = {r.user_id: (r.n, r.increase, r.n_resets) for r in b.collect()}
    assert final == want and len(final) > 0


def test_streaming_renewal_rt_equals_batch_across_batches(spark, tmp_path):
    """streaming_renewal_rt's final emission per (key, day) equals the
    batch renewal_rt closed form at observed days, with state carried
    across micro-batches (each file = one batch) and a skipped day
    zero-filled inside the serial-interval buffer."""
    import pandas as pd
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.epi import renewal_rt
    from timeseriesutils_spark.streaming.windows import streaming_renewal_rt

    src = tmp_path / "src"
    src.mkdir()
    # key 'a': days 0-3 then (gap: day 4 missing) 5-8, counts vary; the
    # second file starts mid-stream so day 3 closes across the boundary
    rows1 = [("a", d) for d, c in [(0, 3), (1, 2), (2, 5), (3, 1)] for _ in range(c)]
    rows2 = [("a", d) for d, c in [(3, 2), (5, 4), (6, 2), (7, 3), (8, 1)] for _ in range(c)]
    pd.DataFrame(rows1, columns=["k", "day"]).to_parquet(src / "a.parquet")
    pd.DataFrame(rows2, columns=["k", "day"]).to_parquet(src / "b.parquet")

    batch_schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_renewal_rt(
        stream, key_col="k", day_col="day", weights=(1, 2)
    )
    got_df = _run_stream_update(spark, out, "t_srrt")
    w = W.partitionBy("k", "day").orderBy(F.col("n").desc())
    got = {
        (r.k, r.day): (r.n, r.force_q, r.rt)
        for r in got_df.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .collect()
    }

    counts = (
        spark.read.parquet(str(src))
        .groupBy("k", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    batch = renewal_rt(counts, "n", "day", ["k"], weights=(1, 2))
    want = {
        (r.k, r.day): (r.n, r.force_q, r.rt)
        for r in batch.join(
            counts.select("k", "day"), on=["k", "day"]
        ).collect()
    }
    assert got == want and len(got) == 8  # 9 days minus the gap day


def test_streaming_renewal_rt_drops_late_days_without_corrupting_state(
    spark, tmp_path
):
    """Round-6 ADVICE regression: a day EARLIER than the open day
    arriving in a later micro-batch (out-of-order beyond the ordering
    contract) must be DROPPED, not folded in as if consecutive — the
    old behavior shifted the serial-interval buffer as if the stale
    day were new, corrupting force_q/rt for every later emission."""
    import pandas as pd
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.epi import renewal_rt
    from timeseriesutils_spark.streaming.windows import streaming_renewal_rt

    src = tmp_path / "src"
    src.mkdir()
    rows1 = [("a", d) for d, c in [(0, 3), (1, 2), (2, 5), (3, 1)] for _ in range(c)]
    # batch 2 leads with a STALE day 1 (should be dropped), then advances
    rows2 = [("a", d) for d, c in [(1, 7), (4, 4), (5, 2)] for _ in range(c)]
    pd.DataFrame(rows1, columns=["k", "day"]).to_parquet(src / "a.parquet")
    pd.DataFrame(rows2, columns=["k", "day"]).to_parquet(src / "b.parquet")

    batch_schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_renewal_rt(stream, key_col="k", day_col="day", weights=(1, 2))
    got_df = _run_stream_update(spark, out, "t_srrt_late")
    w = W.partitionBy("k", "day").orderBy(F.col("n").desc())
    got = {
        (r.k, r.day): (r.n, r.force_q, r.rt)
        for r in got_df.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .collect()
    }

    # oracle: batch closed form over the stream WITHOUT the stale rows
    # (day 1 keeps only batch-1's count of 2; batch-2's 7 late rows drop)
    clean = spark.createDataFrame(
        [("a", d, c) for d, c in [(0, 3), (1, 2), (2, 5), (3, 1), (4, 4), (5, 2)]],
        "k string, day long, n long",
    )
    batch = renewal_rt(clean, "n", "day", ["k"], weights=(1, 2))
    want = {
        (r.k, r.day): (r.n, r.force_q, r.rt)
        for r in batch.join(clean.select("k", "day"), on=["k", "day"]).collect()
    }
    assert got == want and len(got) == 6


def test_stream_pq_encode_equals_batch_encode(spark):
    """The streaming PQ encode's drained sink equals the batch encode
    of the full table row-for-row — codebooks frozen by the batch
    trainer, the stream only applies them (round-10 wave)."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.operators.kmeans import _quantize
    from timeseriesutils_spark.operators.similarity import (
        _pq_train_books_driver,
    )
    from timeseriesutils_spark.streaming.windows import (
        read_embeddings_stream,
        stream_pq_encode,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sample = emb.orderBy(
        portable_hash64(F.col("vec_id").cast("string")), F.col("vec_id")
    ).limit(64)
    qrows = [
        (r[0], list(r[1]))
        for r in sample.select(
            "vec_id", _quantize(F.col("embedding"), 6)
        ).orderBy("vec_id").collect()
    ]
    books = _pq_train_books_driver(qrows, 4, 16, 8, 2)

    stream = stream_pq_encode(read_embeddings_stream(spark, SF_DIR), books)
    q = (
        stream.writeStream.format("memory")
        .queryName("t_spq")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_spq").collect()}

    batch = stream_pq_encode(emb, books)  # same fn, batch frame
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) == emb.count()
