"""Streaming operators, checked batch-mode (SURVEY §2.2 streaming row):
the same transformation functions run on readStream frames in
production (timeseriesutils_spark/streaming/windows.py); the driver
verifies their batch-mode results against window SQL in DuckDB.
"""

from __future__ import annotations

from timeseriesutils_spark.functions.exact import dsum_sql
from pyspark.sql import functions as F

from timeseriesutils_spark.queries import Q
from timeseriesutils_spark.sources.tables import load_table
from timeseriesutils_spark.streaming.windows import (
    stream_interval_join_sql,
    session_counts,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def q_stream_tumbling(spark, sf_dir):
    """Tumbling 1-hour window counts + exact value sums (streaming/windows.tumbling_counts; batch-equivalent oracle, readStream path tested)."""
    return tumbling_counts(_events(spark, sf_dir), window="1 hour")


_SQL_TUMBLING = f"""
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type,
  COUNT(*) AS n, {dsum_sql('value')} AS sum_value
FROM events GROUP BY 1, 2
"""


def q_stream_sliding(spark, sf_dir):
    """Sliding 1-hour/30-min hopping window counts (streaming/windows.sliding_counts)."""
    return sliding_counts(_events(spark, sf_dir), window="1 hour", slide="30 minutes")


# each event belongs to 2 windows: floor30(ts) and floor30(ts) − 30 min
_SQL_SLIDING = """
WITH floored AS (
  SELECT date_trunc('hour', ts)
    + CASE WHEN EXTRACT(MINUTE FROM ts) >= 30 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS f
  FROM events
),
w AS (
  SELECT f AS ws FROM floored
  UNION ALL
  SELECT f - INTERVAL 30 MINUTE AS ws FROM floored
)
SELECT CAST(ws AS VARCHAR) AS window_start, COUNT(*) AS n FROM w GROUP BY 1
"""


def q_stream_session(spark, sf_dir):
    """Session windows with 30-min gap per user (streaming/windows.session_counts; F.session_window)."""
    return session_counts(_events(spark, sf_dir), gap="30 minutes")


# gaps-and-islands: new session when gap ≥ 30 min; session key = its start
_SQL_SESSION = """
WITH marked AS (
  SELECT user_id, ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= INTERVAL 30 MINUTE
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_s
  FROM events
),
sess AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, CAST(MIN(ts) AS VARCHAR) AS session_start, COUNT(*) AS n
FROM sess GROUP BY user_id, sid
"""


def q_stream_dedup(spark, sf_dir):
    """Streaming dropDuplicates on (user, event_type) within the watermark horizon (batch twin: DISTINCT)."""
    return stream_dedup(_events(spark, sf_dir))


def q_stream_join(spark, sf_dir):
    """Stream-stream attribution join (streaming/windows.
    stream_interval_join): every purchase paired with the same user's
    clicks in the preceding 10 minutes.  Batch-equivalent check; the
    streaming path (watermarks both sides, bounded state) is exercised in
    tests/test_streaming.py."""
    from timeseriesutils_spark.streaming.windows import stream_interval_join

    ev = _events(spark, sf_dir)
    return stream_interval_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        within="10 minutes",
    )


_SQL_STREAM_DEDUP = "SELECT DISTINCT user_id, event_type FROM events"


QUERIES = {
    "stream_tumbling": Q(q_stream_tumbling, _SQL_TUMBLING),
    "stream_sliding": Q(q_stream_sliding, _SQL_SLIDING),
    "stream_session": Q(q_stream_session, _SQL_SESSION),
    "stream_dedup": Q(q_stream_dedup, _SQL_STREAM_DEDUP),
    "stream_join": Q(q_stream_join, stream_interval_join_sql()),
}


def q_stream_stateful(spark, sf_dir):
    """Custom stateful operator on the REAL streaming path
    (streaming/windows.running_user_stats, applyInPandasWithState over a
    file-source readStream, availableNow): drains the stream into a
    memory sink, then reduces the per-batch update rows to each user's
    final state (n and max_value are monotone, so MAX over updates = the
    last update).  The final state equals batch COUNT/MAX per user —
    which the SQL oracle checks exactly; the declared query therefore
    gate-checks custom stateful streaming end-to-end, not a batch
    stand-in."""
    import uuid

    from timeseriesutils_spark.streaming.windows import (
        read_events_stream,
        running_user_stats,
    )

    name = f"q_stateful_{uuid.uuid4().hex[:8]}"
    # state partitions = the stream's shuffle partitions at first start;
    # size them for state volume (150 users), not CPU count — 32 state
    # stores for 150 keys is pure per-instance overhead (measured 3.3 →
    # 2.5 s at sf0.1).  Restore the session conf for the batch queries.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            running_user_stats(read_events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    upd = spark.table(name)
    return upd.groupBy("user_id").agg(
        F.max("n").alias("n"), F.max("max_value").alias("max_value")
    )


_SQL_STATEFUL = """
SELECT user_id, COUNT(*) AS n, MAX(value) AS max_value
FROM events GROUP BY user_id
"""

QUERIES.update({"stream_stateful": Q(q_stream_stateful, _SQL_STATEFUL)})


def q_stream_static_join(spark, sf_dir):
    """Stream-static enrichment (streaming/windows.stream_enrich): each
    event joins the broadcast per-user first-seen dimension
    (windows.user_profile), rolled up to counts + exact value sums per
    (event_type, tenure week).  No state store -- the static side is
    re-resolved per micro-batch; readStream parity in test_streaming."""
    from timeseriesutils_spark.streaming.windows import stream_enrich, user_profile

    ev = _events(spark, sf_dir)
    return stream_enrich(ev, user_profile(ev))


def _sql_stream_static_join():
    from timeseriesutils_spark.streaming.windows import stream_enrich_sql

    return stream_enrich_sql()


QUERIES.update(
    {"stream_static_join": Q(q_stream_static_join, _sql_stream_static_join())}
)


STREAM_CUSUM_PARAMS = dict(target=50.0, threshold=500.0, scale=2)


def q_stream_cusum(spark, sf_dir):
    """Streaming CUSUM changepoint detection on the REAL streaming path
    (streaming/windows.streaming_cusum, applyInPandasWithState over a
    file-source readStream, availableNow): per-user O(1) state — the
    running sum and its prefix extrema, four int64s — folds each
    micro-batch vectorized; the drained final state is reduced per key
    (n is monotone across updates) and equals the batch closed-form
    CUSUM's last row per user, which the SQL oracle checks exactly."""
    import uuid

    from pyspark.sql import Window as W

    from timeseriesutils_spark.streaming.windows import (
        read_events_stream,
        streaming_cusum,
    )

    name = f"q_scusum_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            streaming_cusum(
                read_events_stream(spark, sf_dir), **STREAM_CUSUM_PARAMS
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    upd = spark.sql(f"SELECT * FROM {name}")
    w = W.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        upd.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "n", "cusum_pos", "cusum_neg", "alarm")
    )


def _sql_stream_cusum():
    mult = 10 ** STREAM_CUSUM_PARAMS["scale"]
    kq = int(round(STREAM_CUSUM_PARAMS["target"] * mult))
    hq = int(round(STREAM_CUSUM_PARAMS["threshold"] * mult))
    return f"""
WITH p AS (
  SELECT user_id, ts, event_id,
    SUM(CAST(FLOOR(value * {mult} + 0.5) AS BIGINT) - {kq}) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
  FROM events
),
fin AS (
  SELECT user_id, p,
    LEAST(CAST(0 AS BIGINT), MIN(p) OVER (PARTITION BY user_id)) AS lo,
    GREATEST(CAST(0 AS BIGINT), MAX(p) OVER (PARTITION BY user_id)) AS hi,
    COUNT(*) OVER (PARTITION BY user_id) AS n,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM p
)
SELECT user_id, n,
  CAST(p - lo AS DOUBLE) / {mult} AS cusum_pos,
  CAST(hi - p AS DOUBLE) / {mult} AS cusum_neg,
  ((p - lo) > {hq} OR (hi - p) > {hq}) AS alarm
FROM fin WHERE rn = 1
"""


QUERIES.update({"stream_cusum": Q(q_stream_cusum, _sql_stream_cusum())})


def q_stream_topk(spark, sf_dir):
    """Top-3 trending event types per tumbling hour
    (streaming/windows.windowed_topk): streaming-legal count aggregation
    + deterministic rank (the rank half runs foreachBatch in a live
    deployment)."""
    from timeseriesutils_spark.streaming.windows import windowed_topk

    return windowed_topk(_events(spark, sf_dir), window="1 hour", k=3)


_SQL_STREAM_TOPK = """
WITH counts AS (
  SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type,
    COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n,
  CAST(ROW_NUMBER() OVER (
    PARTITION BY window_start ORDER BY n DESC, event_type ASC
  ) AS INT) AS rank
FROM counts QUALIFY rank <= 3
"""

QUERIES.update({"stream_topk": Q(q_stream_topk, _SQL_STREAM_TOPK)})


def q_stream_counter_rate(spark, sf_dir):
    """Streaming counter-rate with reset handling on the REAL streaming
    path (streaming/windows.streaming_counter_rate,
    applyInPandasWithState over a file-source readStream, availableNow):
    per-user O(1) state -- last reading, cumulative increase, reset
    count, n -- folded vectorized per micro-batch; the drained final
    state equals the batch LAG closed form, which the oracle checks."""
    import uuid

    from pyspark.sql import Window as W

    from timeseriesutils_spark.streaming.windows import (
        read_events_stream,
        streaming_counter_rate,
    )

    name = f"q_sctr_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            streaming_counter_rate(read_events_stream(spark, sf_dir), scale=2)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    upd = spark.sql(f"SELECT * FROM {name}")
    w = W.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        upd.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "n", "increase", "n_resets")
    )


def _sql_stream_counter_rate():
    return """
WITH q AS (
  SELECT user_id, ts, event_id,
    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
d AS (
  SELECT user_id, v,
    LAG(v) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM q
)
SELECT user_id, COUNT(*) AS n,
  CAST(COALESCE(SUM(CASE WHEN prev IS NULL THEN NULL
                         WHEN v - prev >= 0 THEN v - prev
                         ELSE v END), 0) AS BIGINT) AS increase,
  CAST(SUM(CASE WHEN prev IS NOT NULL AND v - prev < 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_resets
FROM d GROUP BY user_id
"""


QUERIES.update(
    {"stream_counter_rate": Q(q_stream_counter_rate, _sql_stream_counter_rate())}
)


def q_stream_renewal_rt(spark, sf_dir):
    """Streaming renewal-equation Rt on the real streaming path
    (streaming/windows.streaming_renewal_rt, applyInPandasWithState over
    a file-source readStream, availableNow): per event-type O(S) state
    — open-day count + the S most recent closed-day counts — with
    zero-fill for skipped days.  The final emission per (key, day)
    equals the batch closed form (operators/epi.renewal_rt) restricted
    to observed days, which the oracle checks exactly."""
    import uuid

    from pyspark.sql import Window as W

    from timeseriesutils_spark.streaming.windows import (
        read_events_stream,
        streaming_renewal_rt,
    )

    name = f"q_srrt_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        src = read_events_stream(spark, sf_dir).select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("day"),
        )
        q = (
            streaming_renewal_rt(src, key_col="event_type", day_col="day")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    upd = spark.sql(f"SELECT * FROM {name}")
    w = W.partitionBy("event_type", "day").orderBy(F.col("n").desc())
    return (
        upd.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("event_type", "day", "n", "force_q", "rt")
    )


def _sql_stream_renewal_rt():
    from timeseriesutils_spark.operators.epi import renewal_rt_sql

    counts = (
        "SELECT event_type, "
        "CAST(datediff('day', DATE '1992-01-01', CAST(ts AS DATE)) AS BIGINT) "
        "AS day, COUNT(*) AS n FROM events GROUP BY 1, 2"
    )
    base = renewal_rt_sql(counts, "n", "day", ["event_type"])
    return f"""
WITH counts AS ({counts}),
base AS ({base})
SELECT b.event_type, b.day, b.n, b.force_q, b.rt
FROM base b JOIN counts c ON b.event_type = c.event_type AND b.day = c.day
"""


QUERIES.update(
    {"stream_renewal_rt": Q(q_stream_renewal_rt, _sql_stream_renewal_rt())}
)


def q_stream_pq_encode(spark, sf_dir):
    """Streaming PQ index ingest on the REAL streaming path
    (streaming/windows.stream_pq_encode over a file-source readStream,
    availableNow): embeddings arrive, compress to 8 sub-space codes
    against codebooks FROZEN by the batch trainer — one stateless
    Arrow pass per micro-batch, no state store, no shuffle; the loop
    that keeps a knn_pq index current for a continuously-growing
    corpus.  The drained sink must equal the batch encode row-for-row
    (training is batch-only by contract), which the SQL oracle
    re-derives end to end."""
    import uuid

    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.operators.kmeans import _quantize
    from timeseriesutils_spark.operators.similarity import (
        _pq_train_books_driver,
    )
    from timeseriesutils_spark.streaming.windows import (
        read_embeddings_stream,
        stream_pq_encode,
    )

    m, n_codes, n_sample, n_iter, scale, dim = 8, 64, 256, 3, 6, 64
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sample = emb.orderBy(
        portable_hash64(F.col("vec_id").cast("string")), F.col("vec_id")
    ).limit(n_sample)
    qrows = [
        (r[0], list(r[1]))
        for r in sample.select(
            "vec_id", _quantize(F.col("embedding"), scale)
        ).orderBy("vec_id").collect()
    ]
    books = _pq_train_books_driver(qrows, m, dim // m, n_codes, n_iter)

    name = f"q_spq_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream_pq_encode(read_embeddings_stream(spark, sf_dir), books,
                             scale=scale)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {name}")


def _sql_stream_pq_encode():
    from timeseriesutils_spark.operators.similarity import pq_encode_sql

    return pq_encode_sql(m=8, n_codes=64, n_sample=256, n_iter=3)


QUERIES.update(
    {"stream_pq_encode": Q(q_stream_pq_encode, _sql_stream_pq_encode())}
)


_SCRPS_M = 16
_SCRPS_SCALE = 2


def q_stream_crps(spark, sf_dir):
    """Streaming sample-CRPS of the trailing-16 empirical ensemble on
    the REAL streaming path (streaming/windows.streaming_crps,
    applyInPandasWithState over a file-source readStream, availableNow):
    per-user O(m) ring state, exact int64 score numerators folded
    vectorized per micro-batch; the drained final state per user equals
    the batch closed form (operators/epi.crps_sample semantics) the SQL
    oracle checks exactly."""
    import uuid

    from pyspark.sql import Window as W

    from timeseriesutils_spark.streaming.windows import (
        read_events_stream,
        streaming_crps,
    )

    name = f"q_scrps_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            streaming_crps(
                read_events_stream(spark, sf_dir),
                members=_SCRPS_M,
                scale=_SCRPS_SCALE,
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    upd = spark.sql(f"SELECT * FROM {name}")
    w = W.partitionBy("user_id").orderBy(F.col("n_seen").desc())
    return (
        upd.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "n_seen", "n_scored", "mean_crps")
    )


def _sql_stream_crps():
    m = _SCRPS_M
    mult = 10**_SCRPS_SCALE
    pair_terms = " + ".join(
        f"CAST({2 * i - 1 - m} AS BIGINT) * _qa[{i}]"
        for i in range(1, m + 1)
        if 2 * i - 1 - m != 0
    )
    over = (
        "(PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {m} PRECEDING AND 1 PRECEDING)"
    )
    return f"""
WITH src AS (
  SELECT user_id, event_id, ts,
    CAST(FLOOR(CAST(value AS DOUBLE) * {mult} + 0.5) AS BIGINT) AS _qv
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT user_id, _qv AS _qy,
    list_sort(list(_qv) OVER {over}) AS _qa
  FROM src
),
t AS (
  SELECT user_id,
    CAST(list_sum(list_transform(_qa, x -> abs(x - _qy))) AS BIGINT) AS _abs,
    ({pair_terms}) AS _pair
  FROM w WHERE len(_qa) = {m}
),
seen AS (SELECT user_id, COUNT(*) AS n_seen FROM src GROUP BY user_id),
agg AS (
  SELECT user_id, COUNT(*) AS n_scored,
    CAST(SUM({m} * _abs - _pair) AS BIGINT) AS _snum
  FROM t GROUP BY user_id
)
SELECT s.user_id, s.n_seen,
  CAST(COALESCE(a.n_scored, 0) AS BIGINT) AS n_scored,
  CASE WHEN a.n_scored > 0
    THEN CAST(_snum AS DOUBLE)
         / CAST({m * m * mult} * a.n_scored AS DOUBLE) END AS mean_crps
FROM seen s LEFT JOIN agg a USING (user_id)
"""


QUERIES.update({"stream_crps": Q(q_stream_crps, _sql_stream_crps())})


_SCONF_W, _SCONF_K, _SCONF_SCALE = 14, 64, 2


def q_stream_conformal(spark, sf_dir):
    """Streaming split-conformal intervals on the REAL streaming path
    (streaming/windows.streaming_conformal, applyInPandasWithState over
    a file-source readStream, availableNow): per-user rings of the last
    14 values + last 64 exact-integer residuals; the drained final
    state per user — trailing-mean point forecast ± the rank-selected
    sliding-calibration quantile — equals the batch closed form the SQL
    oracle checks exactly.  Live calibrated uncertainty with O(W+K)
    state per key."""
    import uuid

    from pyspark.sql import Window as W

    from timeseriesutils_spark.streaming.windows import (
        read_events_stream,
        streaming_conformal,
    )

    name = f"q_sconf_{uuid.uuid4().hex[:8]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            streaming_conformal(
                read_events_stream(spark, sf_dir),
                fit_window=_SCONF_W,
                cal_window=_SCONF_K,
                scale=_SCONF_SCALE,
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    upd = spark.sql(f"SELECT * FROM {name}")
    w = W.partitionBy("user_id").orderBy(F.col("n_seen").desc())
    return (
        upd.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "user_id", "n_seen", "n_cal", "q_score",
            "point_forecast", "lo", "hi",
        )
    )


def _sql_stream_conformal():
    W, K = _SCONF_W, _SCONF_K
    mult = 10**_SCONF_SCALE
    den = f"{float(W * mult)!r}"
    over_p = (
        "(PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {W} PRECEDING AND 1 PRECEDING)"
    )
    over_l = (
        "(PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW)"
    )
    return f"""
WITH src AS (
  SELECT user_id, event_id, ts,
    CAST(FLOOR(CAST(value AS DOUBLE) * {mult} + 0.5) AS BIGINT) AS _qv
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT user_id, ts, event_id, _qv,
    SUM(_qv) OVER {over_p} AS _sp,
    COUNT(*) OVER {over_p} AS _cp,
    SUM(_qv) OVER {over_l} AS _sl,
    COUNT(*) OVER {over_l} AS _cl,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS _rd
  FROM src
),
cal AS (
  SELECT user_id, abs(_qv * {W} - _sp) AS _r,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS _k
  FROM w WHERE _cp = {W}
),
lastk AS (SELECT user_id, _r FROM cal WHERE _k <= {K}),
ranked AS (
  SELECT user_id, _r,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY _r) AS _rn,
    COUNT(*) OVER (PARTITION BY user_id) AS _n
  FROM lastk
),
qs AS (
  SELECT user_id, CAST(MAX(_n) AS BIGINT) AS n_cal,
    MAX(CASE WHEN _rn = ((_n + 1) * 9 + 9) // 10 THEN _r END) AS _q
  FROM ranked GROUP BY user_id
),
nxt AS (
  SELECT user_id, CAST(_sl AS BIGINT) AS _sn
  FROM w WHERE _rd = 1 AND _cl = {W}
),
seen AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_seen
         FROM src GROUP BY user_id)
SELECT s.user_id, s.n_seen,
  CAST(COALESCE(q.n_cal, 0) AS BIGINT) AS n_cal,
  CAST(q._q AS DOUBLE) / {den} AS q_score,
  CAST(n._sn AS DOUBLE) / {den} AS point_forecast,
  CAST(n._sn AS DOUBLE) / {den} - CAST(q._q AS DOUBLE) / {den} AS lo,
  CAST(n._sn AS DOUBLE) / {den} + CAST(q._q AS DOUBLE) / {den} AS hi
FROM seen s
LEFT JOIN qs q USING (user_id)
LEFT JOIN nxt n USING (user_id)
"""


QUERIES.update(
    {"stream_conformal": Q(q_stream_conformal, _sql_stream_conformal())}
)
