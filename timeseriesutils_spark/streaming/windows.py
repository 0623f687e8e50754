"""Structured Streaming operators over the events stream.

Every transformation here is expressed on the unified DataFrame API, so
the SAME function works on a batch frame (how the driver's oracle checks
it — batch-mode results equal streaming results once all data arrives)
and on a ``readStream`` frame (how production runs it, with watermarks
bounding state).

Scale notes: windowed aggregations keep per-(window, key) state in the
state store; the watermark is what lets Spark evict state — always set
it.  Session windows merge state per key; ``dropDuplicates`` within
watermark is the streaming dedup idiom (state = seen keys inside the
watermark horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dsum, sq


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch by default).  ts arrives as long nanoseconds (legacy
    conf) and is normalized exactly like the batch reader."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        # restrict to the events file: the sf dir holds every table, and a
        # bare directory source would ingest them all under this schema
        # (null-padded rows for the 9 other tables); the file source wants
        # a directory basePath, so pass it plus a glob for the one file
        .option("basePath", sf_dir)
        .parquet(f"{sf_dir}/events.parque[t]")
    )
    # watermarks require a zone-aware TIMESTAMP event-time column; the
    # parquet may surface ts as long nanos (legacy nanosAsLong) or as
    # TIMESTAMP_NTZ (micros file + NTZ inference) depending on how the
    # testdata was written — normalize both (session tz is UTC, so the
    # NTZ→LTZ cast is wall-clock-identity and matches the batch reader)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df


def _drain_sorted(pdfs, order_cols, dropna_col=None):
    """Drain a micro-batch's Arrow chunk iterator into ONE frame sorted
    by ``order_cols`` (optionally dropping rows whose ``dropna_col`` is
    null first, the oracle's WHERE value IS NOT NULL).

    applyInPandasWithState hands each key's batch as an ITERATOR of
    pandas chunks; sorting each chunk independently (the pre-r14 shape)
    silently assumed a key's rows never span chunks out of order.  For
    the ring/prefix kernels here, processing chunk-by-chunk with state
    carry-over is algebraically identical to processing the
    concatenated sorted sequence once, so accumulating first is the
    strictly safer form at the cost of holding one key's micro-batch
    rows in memory (bounded by the trigger size).  (ADVICE r13.)
    """
    import pandas as pd

    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return None
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    if dropna_col is not None:
        pdf = pdf.dropna(subset=[dropna_col])
    if not len(pdf):
        return None
    return pdf.sort_values(list(order_cols))


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    group_cols: list[str] = ["event_type"],
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts + exact value sum per group."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            *group_cols,
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Sliding (hopping) window counts — each event lands in
    window/slide overlapping windows."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("window_start"), "n")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    group_cols: list[str] = ["user_id"],
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Session windows: maximal event chains with inter-event gap < gap.

    Batch-mode equivalent of streaming ``session_window`` state merging;
    sessions are identified by their start timestamp.
    """
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *group_cols,
            F.col("w.start").cast("string").alias("session_start"),
            "n",
        )
    )


def running_user_stats(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (event count, max value), emitted as an update row
    every micro-batch the user appears in.

    This is the escape hatch for stateful logic Spark's built-in windows
    can't express (per-key counters, custom session logic, model state).
    State is one tiny tuple per user; the watermark bounds how long idle
    state lives (here NoTimeout — the caller's retention policy applies).
    At 100 TB the state store shards by the group key across executors,
    exactly like the shuffle of a groupBy.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n bigint, max_value double"
    state_schema = "n bigint, mx double"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            n, mx = state.get
        else:
            n, mx = 0, float("-inf")
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "max_value": [mx]})

    df = _maybe_watermark(events, ts_col, watermark)
    return df.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "10 minutes",
    watermark: str | None = "10 minutes",
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """Stream-stream inner join: pair each right-side event with every
    left-side event of the same key in the trailing ``within`` interval
    (right.ts ∈ [left.ts, left.ts + within]).

    The canonical attribution join (click → purchase).  In streaming
    mode BOTH sides carry watermarks and the join condition bounds event
    time on both sides — that is what lets Spark evict join state (a
    side's buffered rows older than watermark + interval are dropped);
    an unbounded-condition stream-stream join would grow state forever.
    In batch mode the same expression is an equi-join on the key plus a
    range predicate — per-key sort-merge, no BNLJ (the equi half is the
    join key; the range is a post-join filter on co-located rows).

    Output: (key, left id, right id, gap_ms ≥ 0).
    """
    l = _maybe_watermark(left, ts_col, watermark).select(
        F.col(key).alias("_k"),
        F.col(left_id).alias("left_id"),
        F.col(ts_col).alias("_lts"),
    )
    r = _maybe_watermark(right, ts_col, watermark).select(
        F.col(key).alias("_rk"),
        F.col(right_id).alias("right_id"),
        F.col(ts_col).alias("_rts"),
    )
    cond = (
        (l["_k"] == r["_rk"])
        & (r["_rts"] >= l["_lts"])
        & (r["_rts"] <= l["_lts"] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").select(
        F.col("_k").alias(key),
        "left_id",
        "right_id",
        (F.unix_millis(F.col("_rts").cast("timestamp"))
         - F.unix_millis(F.col("_lts").cast("timestamp"))).alias("gap_ms"),
    )


def stream_interval_join_sql(
    key: str = "user_id",
    ts_col: str = "ts",
    within_ms: int = 600_000,
    left_type: str = "click",
    right_type: str = "purchase",
    table: str = "events",
) -> str:
    """DuckDB twin of the batch-equivalent click→purchase attribution."""
    return f"""
WITH l AS (
  SELECT {key} AS k, event_id AS left_id, epoch_ms({ts_col}) AS lts
  FROM {table} WHERE event_type = {sq(left_type)}
), r AS (
  SELECT {key} AS k, event_id AS right_id, epoch_ms({ts_col}) AS rts
  FROM {table} WHERE event_type = {sq(right_type)}
)
SELECT l.k AS {key}, left_id, right_id, rts - lts AS gap_ms
FROM l JOIN r ON l.k = r.k AND rts >= lts AND rts <= lts + {within_ms}
"""


def stream_dedup(
    events: DataFrame,
    keys: list[str] = ["user_id", "event_type"],
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Streaming dedup: first event per key within the watermark horizon.
    In batch mode this is plain dropDuplicates on the keys (output keyed
    columns only, so the surviving-row choice can't leak in)."""
    df = _maybe_watermark(events, ts_col, watermark)
    return df.select(*keys).dropDuplicates(keys)


def user_profile(events_batch: DataFrame) -> DataFrame:
    """Static per-user dimension for stream enrichment: first-seen day.

    In production this is the slowly-refreshed dim table (rebuilt from
    history on a schedule); here it is derived from the batch events
    relation.  User-count-sized — broadcastable for any realistic user
    population per executor memory."""
    return events_batch.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts")).cast("date")).alias("first_day")
    )


def stream_enrich(
    events: DataFrame,
    dim: DataFrame,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Stream-static join enrichment + windowless rollup: join each
    event to the broadcast user dimension, bucket users by tenure
    (whole weeks since first seen at event time), aggregate counts and
    exact value sums per (event_type, tenure_week).

    Stream-static joins need NO state store (the static side is
    re-resolved per micro-batch; Spark broadcasts it), so this is the
    cheapest streaming enrichment there is — the dim never shuffles the
    stream.  The same code path runs batch frames; the driver's oracle
    checks that form, test_streaming checks stream==batch."""
    df = _maybe_watermark(events, ts_col, watermark)
    joined = df.join(F.broadcast(dim), "user_id")
    tenure_week = F.floor(
        F.datediff(F.date_trunc("day", F.col(ts_col)).cast("date"), F.col("first_day"))
        / F.lit(7)
    ).alias("tenure_week")
    return joined.groupBy("event_type", tenure_week).agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value")
    )


def stream_enrich_sql(table: str = "events") -> str:
    """DuckDB twin of ``stream_enrich(events, user_profile(events))``."""
    from timeseriesutils_spark.functions.exact import dsum_sql

    return f"""
WITH dim AS (
  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
  FROM {table} GROUP BY 1
)
SELECT e.event_type,
  CAST(FLOOR(datediff('day', d.first_day, CAST(date_trunc('day', e.ts) AS DATE))
    / 7) AS BIGINT) AS tenure_week,
  COUNT(*) AS n, {dsum_sql('value')} AS sum_value
FROM {table} e JOIN dim d USING (user_id)
GROUP BY 1, 2
"""


def streaming_cusum(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    order_cols: tuple = ("ts", "event_id"),
    target: float = 0.0,
    threshold: float = 1.0,
    scale: int = 2,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming CUSUM changepoint detection via applyInPandasWithState.

    The batch op (operators/changepoint.cusum) computes the recursion
    closed-form over prefix extrema; the SAME sufficient statistic makes
    the op streamable with O(1) state per key — (P, min-prefix,
    max-prefix, n) as four int64s — because

        S+ = P - min(0, min_prefix P),   S- = max(0, max_prefix P) - P

    only ever needs the current running sum and its extrema, never the
    history.  Each micro-batch folds its (ts-ordered) rows into the
    state vectorized (numpy cumsum over the batch, one update per key
    per batch) and emits the key's current statistics.

    Ordering contract: rows are sorted by ``order_cols`` WITHIN a batch;
    batches are assumed source-ordered (true for file sources /
    replayable logs).  Out-of-order arrival across batches needs an
    event-time buffer upstream — the standard caveat for any
    order-sensitive stateful op.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    mult = 10**scale
    kq = int(round(target * mult))
    hq = int(round(threshold * mult))
    out_schema = (
        f"{key_col} bigint, n bigint, cusum_pos double, cusum_neg double, "
        "alarm boolean"
    )
    state_schema = "p bigint, lo bigint, hi bigint, n bigint"
    oc = list(order_cols)

    def fn(key, pdfs, state: GroupState):
        p, lo, hi, n = state.get if state.exists else (0, 0, 0, 0)
        # drain + sort the batch ONCE (chunk-order-safe); nulls dropped
        # to match the oracle's WHERE value IS NOT NULL (a NaN would
        # make floor(...).astype(int64) undefined and corrupt state)
        pdf = _drain_sorted(pdfs, oc, dropna_col=value_col)
        if pdf is not None:
            v = pdf[value_col].to_numpy(dtype="float64")
            q = np.floor(v * mult + 0.5).astype("int64")
            pref = p + np.cumsum(q - kq)
            p = int(pref[-1])
            lo = min(lo, int(pref.min()))
            hi = max(hi, int(pref.max()))
            n += len(pdf)
        state.update((p, lo, hi, n))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "cusum_pos": [(p - lo) / mult],
                "cusum_neg": [(hi - p) / mult],
                "alarm": [(p - lo) > hq or (hi - p) > hq],
            }
        )

    df = _maybe_watermark(events, ts_col, watermark)
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def windowed_topk(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    group_col: str = "event_type",
    k: int = 3,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Top-k trending keys per tumbling window (count-ranked, ties by
    key ascending — deterministic) — the "what's hot right now" feed.

    The aggregation half is the streaming-legal part (same shape as
    :func:`tumbling_counts`; runs under readStream with a watermark).
    The RANKING half is a window function, which Structured Streaming
    forbids on unbounded frames — in a live deployment it runs
    per-micro-batch in ``foreachBatch`` (rank the completed windows the
    batch emitted) or over the complete-mode sink table; this builder
    composes both halves for the batch/verification path, where they
    are one plan.
    """
    counts = (
        _maybe_watermark(events, ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("string").alias("window_start"), group_col, "n"
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.col("n").desc(), F.col(group_col).asc()
        )
    )
    return counts.select(
        "window_start", group_col, "n", rank.cast("int").alias("rank")
    ).filter(F.col("rank") <= k)


def streaming_counter_rate(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    order_cols: tuple = ("ts", "event_id"),
    scale: int = 2,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming monotonic-counter rate with reset handling — the
    stateful twin of operators/counters.counter_rate, same delta rule
    (non-negative delta accumulates; a drop means the producer restarted
    and the post-reset reading counts from zero).

    O(1) state per key: (last reading, total increase, reset count, n) —
    four int64s — because the delta rule only ever needs the previous
    sample.  Each micro-batch sorts its rows, folds them vectorized
    (numpy diff against the carried last value), and emits the key's
    cumulative totals; the final update equals the batch closed form
    over the whole series, which the SQL oracle checks exactly.

    Ordering contract: identical to streaming_cusum (sorted within
    batch, source-ordered across batches — file sources / replayable
    logs).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    mult = 10**scale
    out_schema = f"{key_col} bigint, n bigint, increase bigint, n_resets bigint"
    state_schema = "last bigint, inc bigint, resets bigint, n bigint"
    oc = list(order_cols)

    def fn(key, pdfs, state: GroupState):
        last, inc, resets, n = state.get if state.exists else (0, 0, 0, 0)
        pdf = _drain_sorted(pdfs, oc)
        if pdf is not None:
            v = pdf[value_col].to_numpy(dtype="float64")
            # same quantizer as the batch closed form / SQL twin:
            # FLOOR(v*mult + 0.5) — no abs(), else negative readings
            # diverge from the oracle (ADVICE r4)
            q = np.floor(v * mult + 0.5).astype("int64")
            if n == 0:
                cur, prev = q[1:], q[:-1]
            else:
                cur, prev = q, np.concatenate(([last], q[:-1]))
            d = cur - prev
            inc += int(np.where(d >= 0, d, cur).sum())
            resets += int((d < 0).sum())
            last = int(q[-1])
            n += len(pdf)
        state.update((last, inc, resets, n))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "increase": [inc],
                "n_resets": [resets],
            }
        )

    df = _maybe_watermark(events, ts_col, watermark)
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_renewal_rt(
    events: DataFrame,
    key_col: str = "event_type",
    day_col: str = "day",
    weights: tuple = (1, 2, 3, 2, 1),
    min_count: int = 1,
    watermark_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming renewal-equation Rt (the stateful twin of
    operators/epi.renewal_rt): per key, O(S) state — first/last day, the
    open day's running count, and the final counts of the S most recent
    closed days (S = len(weights)) — folded per micro-batch.

    Input rows are (key, day) event occurrences; the kernel counts per
    day itself, so no upstream stateful aggregation is needed.  A day
    CLOSES when a later day arrives (the streaming_cusum ordering
    contract: rows sorted within batch, source-ordered across batches),
    at which point its count shifts into the serial-interval buffer with
    zero-fill for skipped days — exactly the batch op's dense spine.
    Every batch emits the current row for each day it touched; a day's
    LAST emission carries its final count, so the batch-equivalence
    reconciliation is "max n per (key, day)" — the same pattern
    streaming_counter_rate uses.  force_q for a day depends only on
    CLOSED days, so it is stable across re-emissions.

    Emitted rows equal the batch closed form (renewal_rt) restricted to
    observed days — the oracle the declared query checks exactly.

    Ordering contract: days must arrive non-decreasing per key across
    batches (within a batch the kernel sorts).  A row for a day EARLIER
    than the open day is dropped explicitly (it cannot be folded into
    already-shifted buffer slots) rather than silently corrupting
    state; bound lateness with ``watermark`` to make drops principled.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    W = [int(x) for x in weights]
    S = len(W)
    D = sum(W)
    key_type = dict(events.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, {day_col} bigint, n bigint, "
        "force_q bigint, rt double"
    )
    state_schema = "first_day bigint, last_day bigint, cur bigint, " + ", ".join(
        f"buf{i} bigint" for i in range(S)
    )

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            st = state.get
            first, last, cur = st[0], st[1], st[2]
            buf = list(st[3:])
        else:
            first = last = cur = None
            buf = [0] * S
        out_day, out_n, out_f, out_rt = [], [], [], []

        def force_of():
            return sum(w * buf[s] for s, w in enumerate(W))

        def emit(day, n):
            valid = (day - first) >= S
            f = force_of() if valid else None
            r = (
                (n * D) / f
                if valid and f is not None and f > 0 and n >= min_count
                else None
            )
            out_day.append(day)
            out_n.append(n)
            out_f.append(f)
            out_rt.append(float(r) if r is not None else None)

        for pdf in pdfs:
            if not len(pdf):
                continue
            days, counts = np.unique(
                pdf[day_col].to_numpy(dtype="int64"), return_counts=True
            )
            for day, c in zip(days.tolist(), counts.tolist()):
                if first is None:
                    first, last, cur = day, day, int(c)
                elif day == last:
                    cur += int(c)
                elif day < last:
                    # ordering-contract guard: a day EARLIER than the
                    # open one arrived (late beyond the source-ordering
                    # contract / watermark).  Its slot already shifted
                    # into the buffer; silently treating it as
                    # consecutive would corrupt force_q/rt for every
                    # later emission (round-6 ADVICE).  Drop it — the
                    # watermark semantics for data later than the
                    # engine's state bound.
                    continue
                else:
                    # close `last`: final emission FIRST (force must see
                    # the buffer still relative to `last` as the open
                    # day), THEN shift its count + gap zeros in
                    emit(last, cur)
                    gap = day - last
                    buf = ([0] * (gap - 1) + [cur] + buf)[:S]
                    last, cur = day, int(c)
            # partial emission for the still-open day
            emit(last, cur)
        state.update((first, last, cur, *buf))
        yield pd.DataFrame(
            {
                key_col: pd.Series([key[0]] * len(out_day)),
                day_col: pd.Series(out_day, dtype="int64"),
                "n": pd.Series(out_n, dtype="int64"),
                "force_q": pd.Series(out_f, dtype="object"),
                "rt": pd.Series(out_rt, dtype="float64"),
            }
        )

    df = events
    if watermark and watermark_col:
        df = df.withWatermark(watermark_col, watermark)
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the embeddings parquet (the continuous-
    ingest side of the ANN family: newly arriving vectors encode
    against a FROZEN index)."""
    batch = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .option("basePath", sf_dir)
        .parquet(f"{sf_dir}/embeddings.parque[t]")
    )


def stream_pq_encode(
    vectors: DataFrame,
    books: list[list[list[int]]],
    scale: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming PQ encode: each arriving embedding compresses to its
    m sub-space code ids against FROZEN codebooks — the ingest loop
    that keeps a knn_pq index current for a continuously growing
    corpus (train once on the bootstrap sample, encode forever; at
    100 TB/day the encode is the only per-row work and it is one
    stateless Arrow pass per micro-batch, no state store, no shuffle).

    ``books`` are the driver-state codebooks from the batch trainer
    (operators/similarity._pq_train_books_driver) — the point of the
    split: a stream must NOT retrain (codes would silently re-mean),
    so training stays a batch job and this op is pure mapInPandas,
    valid on batch and stream frames alike.  Batch-equivalence (run
    on the full table, equals the batch encode row-for-row) is the
    oracle contract.

    Returns (id, code_0..code_{m-1}) — exact int64 argmin codes, ties
    to the lower code id.
    """
    from timeseriesutils_spark.operators.similarity import _pq_encode_kernel

    m = len(books)
    sub = len(books[0][0])
    mult = float(10**scale)
    id_type = vectors.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, " + ", ".join(
        f"_c{s_i} int" for s_i in range(m)
    )
    enc = vectors.select(id_col, F.col(vec_col).alias("_v")).mapInPandas(
        _pq_encode_kernel(id_col, m, sub, books, mult, False), schema
    )
    return enc.select(
        id_col,
        *[F.col(f"_c{s_i}").alias(f"code_{s_i}") for s_i in range(m)],
    )


def streaming_crps(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple = ("ts", "event_id"),
    members: int = 16,
    scale: int = 2,
    watermark_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming sample-CRPS of the trailing-window empirical-ensemble
    forecaster (the stateful twin of operators/epi.crps_sample): per
    key, each arriving observation is scored against the ensemble of
    its ``members`` most recent predecessors, and the running mean CRPS
    is emitted — live forecast-quality monitoring with O(m) state per
    key (the ring of the last m quantized values + three counters).

    Exactness: the per-observation numerator  m·Σ|xᵢ−y| − Σᵢ(2i−1−m)x₍ᵢ₎
    is an exact int64 (same identity as the batch op), accumulated as
    an exact int64 running sum — so the drained final state equals the
    batch closed form restricted to scored rows, which the declared
    query's oracle checks exactly.

    Vectorization: each micro-batch concatenates (state ring ‖ batch
    values) and scores every full window with one
    ``sliding_window_view`` + row-sort — no per-row Python beyond the
    numpy kernel.

    Ordering contract: rows sorted by ``order_cols`` within a batch,
    batches source-ordered (the streaming_cusum contract).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    m = int(members)
    mult = 10**scale
    key_type = dict(events.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, n_seen bigint, n_scored bigint, "
        "mean_crps double"
    )
    state_schema = "n bigint, scored bigint, snum bigint, " + ", ".join(
        f"r{i} bigint" for i in range(m)
    )
    oc = list(order_cols)
    coef = np.array([2 * i - 1 - m for i in range(1, m + 1)], dtype="int64")

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            st = state.get
            n, scored, snum = int(st[0]), int(st[1]), int(st[2])
            # the saved ring is zero-padded at the FRONT to m slots;
            # only the last min(n, m) entries are real history
            ring = list(st[3:])[m - min(n, m):] if min(n, m) else []
        else:
            n, scored, snum = 0, 0, 0
            ring = []
        # drain + sort the batch ONCE (chunk-order-safe, ADVICE r13);
        # nulls dropped to match the oracle's WHERE value IS NOT NULL
        pdf = _drain_sorted(pdfs, oc, dropna_col=value_col)
        if pdf is not None:
            v = pdf[value_col].to_numpy(dtype="float64")
            q = np.floor(v * mult + 0.5).astype("int64")
            seq = np.concatenate([np.asarray(ring, dtype="int64"), q])
            if len(seq) > m:
                # ring holds exactly min(n, m) true predecessors, so the
                # window at offset i forecasts seq[i+m] — an element
                # with >= m true predecessors by construction
                wins = np.lib.stride_tricks.sliding_window_view(seq, m)
                W = np.sort(wins[: len(seq) - m], axis=1)
                ys = seq[m:]
                t1 = np.abs(W - ys[:, None]).sum(axis=1)
                pair = W @ coef
                snum += int((m * t1 - pair).sum())
                scored += len(ys)
            ring = (ring + q.tolist())[-m:]
            n += len(pdf)
        pad = [0] * (m - len(ring))
        state.update((n, scored, snum, *(pad + ring)))
        if n == 0:
            # a key whose rows were ALL null-valued: the oracle's seen
            # CTE (built from src WHERE value IS NOT NULL) has no row
            # for it, so emit nothing (ADVICE r13)
            return
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_seen": [n],
                "n_scored": [scored],
                "mean_crps": [
                    snum / (m * m * mult * scored) if scored else None
                ],
            }
        )

    df = events
    if watermark and watermark_col:
        df = df.withWatermark(watermark_col, watermark)
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_conformal(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple = ("ts", "event_id"),
    fit_window: int = 14,
    cal_window: int = 64,
    alpha_num: int = 1,
    alpha_den: int = 10,
    scale: int = 2,
    watermark_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming split-conformal next-step interval (the stateful twin
    of operators/conformal.conformal_intervals, SLIDING-calibration
    variant): per key, each arriving observation with a full
    ``fit_window`` of predecessors contributes the exact-integer
    residual |W·y − Σ_prior| to a ring of the last ``cal_window``
    scores; the emitted interval is the trailing-mean point forecast ±
    the ⌈(n_cal+1)(1−α)⌉-th smallest ring score — live calibrated
    uncertainty with O(W + K) state per key, the practical form for
    drifting streams (old residuals age out of the ring).

    Exactness: quantized int64 values, exact integer residuals, exact
    integer rank selection — the drained final state equals the batch
    closed form (last-K residuals per key, same rank), which the
    declared query's oracle checks hash-exactly.

    Ordering contract: rows sorted by ``order_cols`` within a batch,
    batches source-ordered (the streaming_cusum contract).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    W = int(fit_window)
    K = int(cal_window)
    an, ad = int(alpha_num), int(alpha_den)
    if not (0 < an < ad):
        raise ValueError("need 0 < alpha_num < alpha_den")
    mult = 10**scale
    key_type = dict(events.dtypes)[key_col]
    out_schema = (
        f"{key_col} {key_type}, n_seen bigint, n_cal bigint, "
        "q_score double, point_forecast double, lo double, hi double"
    )
    state_schema = (
        "n bigint, ncal bigint, "
        + ", ".join(f"r{i} bigint" for i in range(W))
        + ", "
        + ", ".join(f"c{i} bigint" for i in range(K))
    )
    oc = list(order_cols)
    den = float(W * mult)

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            st = state.get
            n, ncal = int(st[0]), int(st[1])
            ring = list(st[2 : 2 + W])[W - min(n, W):] if min(n, W) else []
            cal = (
                list(st[2 + W :])[K - min(ncal, K):] if min(ncal, K) else []
            )
        else:
            n, ncal = 0, 0
            ring, cal = [], []
        # drain + sort the batch ONCE (chunk-order-safe, ADVICE r13);
        # nulls dropped to match the oracle's WHERE value IS NOT NULL
        pdf = _drain_sorted(pdfs, oc, dropna_col=value_col)
        if pdf is not None:
            q = (
                np.floor(pdf[value_col].to_numpy(dtype="float64") * mult + 0.5)
                .astype("int64")
            )
            seq = np.concatenate([np.asarray(ring, dtype="int64"), q])
            if len(seq) > W:
                wins = np.lib.stride_tricks.sliding_window_view(seq, W)
                sums = wins[: len(seq) - W].sum(axis=1)
                ys = seq[W:]
                res = np.abs(W * ys - sums)
                cal = (cal + res.tolist())[-K:]
                ncal += len(res)
            ring = (ring + q.tolist())[-W:]
            n += len(q)
        state.update(
            (
                n,
                ncal,
                *([0] * (W - len(ring)) + ring),
                *([0] * (K - len(cal)) + cal),
            )
        )
        if n == 0:
            # a key whose rows were ALL null-valued: the oracle's seen
            # CTE (built from src WHERE value IS NOT NULL) has no row
            # for it, so emit nothing (ADVICE r13)
            return
        n_eff = min(ncal, K)
        rank = ((n_eff + 1) * (ad - an) + ad - 1) // ad
        qv = sorted(cal)[rank - 1] / den if 0 < rank <= n_eff else None
        point = sum(ring) / den if n >= W else None
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_seen": [n],
                "n_cal": [n_eff],
                "q_score": [qv],
                "point_forecast": [point],
                "lo": [point - qv if point is not None and qv is not None else None],
                "hi": [point + qv if point is not None and qv is not None else None],
            }
        )

    df = events
    if watermark and watermark_col:
        df = df.withWatermark(watermark_col, watermark)
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
