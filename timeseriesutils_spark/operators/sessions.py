"""Batch sessionization of event streams.

Assigns gap-based session ids per user — the batch twin of
``streaming/windows.session_window_agg`` (Spark's ``session_window`` is
streaming/grouping-only; the batch formulation is the classic
break-flag + running-sum window pair, fully oracle-expressible):

    brk_t  = 1 if ts_t − ts_{t−1} > gap (or first event)   [one LAG]
    sess_n = Σ brk over rows ≤ t                           [running SUM]

Both passes share one (user) exchange + one sort; the per-session
aggregate then re-uses the same partitioning (groupBy on a superset key
(user, sess_n) — no second wide shuffle at scale with AQE coalescing).

Timestamps are compared in integer epoch milliseconds (``unix_millis`` /
DuckDB ``epoch_ms``) — exact, no float time arithmetic.  Value sums go
through DECIMAL(38,6) like every exact aggregate in this engine
(functions/exact.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dsum, dsum_sql


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tie_break: str = "event_id",
) -> DataFrame:
    """Per-event session assignment: appends ``ts_ms`` (bigint) and
    ``sess_n`` (1-based session index within user).  ``tie_break`` makes
    the event order total when timestamps collide."""
    gap_ms = gap_minutes * 60_000
    # UTC session tz makes the NTZ→TZ cast an identity (same convention as
    # queries/relational_queries.q_range_join)
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy("ts_ms", tie_break)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = events.withColumn("ts_ms", ms)
    prev = F.lag("ts_ms").over(w)
    brk = F.when(prev.isNull() | (F.col("ts_ms") - prev > gap_ms), 1).otherwise(0)
    return base.withColumn("sess_n", F.sum(brk).over(run))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
    tie_break: str = "event_id",
) -> DataFrame:
    """One row per (user, session): event count, start/end (epoch ms),
    duration, exact value sum."""
    s = sessionize(events, user_col, ts_col, gap_minutes, tie_break)
    return s.groupBy(user_col, "sess_n").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_ms").alias("start_ms"),
        F.max("ts_ms").alias("end_ms"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
        dsum(value_col, scale=8).alias("value_sum"),
    )


def scd2_history(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_cols: tuple[str, ...] = ("event_type",),
    tie_break: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event log: one
    row per (key, change interval) with ``valid_from_ms`` /
    ``valid_to_ms`` (epoch ms; open interval end = NULL for the current
    row) and the attribute values in force during the interval.

    Consecutive events with identical attributes collapse into one
    interval (the classic change-detection LAG compare + running-sum
    block id), so the history records CHANGES, not events.  One key
    exchange + one ordered pass + a block-id aggregation that reuses the
    same partitioning — the standard warehouse dimension-history build,
    expressed as two window functions.
    """
    w = Window.partitionBy(key_col).orderBy("ts_ms", tie_break)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = events.select(
        key_col,
        tie_break,
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("ts_ms"),
        *attr_cols,
    )
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(c).over(w)
        changed = changed | ~(F.col(c).eqNullSafe(prev))
    first = F.lag("ts_ms").over(w).isNull()
    blk = F.sum(F.when(first | changed, 1).otherwise(0)).over(run)
    blocks = base.withColumn("_blk", blk)
    agg = blocks.groupBy(key_col, "_blk", *attr_cols).agg(
        F.min("ts_ms").alias("valid_from_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from_ms")
    return agg.select(
        key_col,
        *attr_cols,
        "valid_from_ms",
        F.lead("valid_from_ms").over(w2).alias("valid_to_ms"),
        "n_events",
    )


def scd2_history_sql(
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_cols: tuple[str, ...] = ("event_type",),
    tie_break: str = "event_id",
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`scd2_history`."""
    over = f"(PARTITION BY {key_col} ORDER BY ts_ms, {tie_break})"
    run = (
        f"(PARTITION BY {key_col} ORDER BY ts_ms, {tie_break} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    attrs = ", ".join(attr_cols)
    changed = " OR ".join(
        f"NOT ({c} IS NOT DISTINCT FROM LAG({c}) OVER {over})" for c in attr_cols
    )
    return f"""
WITH e AS (
  SELECT {key_col}, {tie_break}, epoch_ms({ts_col}) AS ts_ms, {attrs}
  FROM {table}
), b AS (
  SELECT *, CASE WHEN LAG(ts_ms) OVER {over} IS NULL OR ({changed})
            THEN 1 ELSE 0 END AS brk
  FROM e
), s AS (
  SELECT *, SUM(brk) OVER {run} AS blk FROM b
), g AS (
  SELECT {key_col}, blk, {attrs},
    MIN(ts_ms) AS valid_from_ms, COUNT(*) AS n_events
  FROM s GROUP BY {key_col}, blk, {attrs}
)
SELECT {key_col}, {attrs}, valid_from_ms,
  LEAD(valid_from_ms) OVER (PARTITION BY {key_col} ORDER BY valid_from_ms)
    AS valid_to_ms,
  n_events
FROM g
"""


def session_stats_sql(
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str = "value",
    tie_break: str = "event_id",
    table: str = "events",
) -> str:
    """DuckDB twin of ``session_stats`` (same integer-ms arithmetic)."""
    gap_ms = gap_minutes * 60_000
    over = f"(PARTITION BY {user_col} ORDER BY ts_ms, {tie_break})"
    run = (
        f"(PARTITION BY {user_col} ORDER BY ts_ms, {tie_break} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return f"""
WITH e AS (
  SELECT {user_col}, {tie_break}, {value_col},
         epoch_ms({ts_col}) AS ts_ms
  FROM {table}
), b AS (
  SELECT *, CASE WHEN LAG(ts_ms) OVER {over} IS NULL
                   OR ts_ms - LAG(ts_ms) OVER {over} > {gap_ms}
            THEN 1 ELSE 0 END AS brk
  FROM e
), s AS (
  -- CAST: DuckDB SUM(int) yields HUGEINT, which lands in pandas as
  -- float64 and diverges from Spark's BIGINT in the driver's value hash
  SELECT *, CAST(SUM(brk) OVER {run} AS BIGINT) AS sess_n FROM b
)
SELECT {user_col}, sess_n,
  COUNT(*) AS n_events,
  MIN(ts_ms) AS start_ms,
  MAX(ts_ms) AS end_ms,
  MAX(ts_ms) - MIN(ts_ms) AS duration_ms,
  {dsum_sql(value_col, scale=8)} AS value_sum
FROM s GROUP BY {user_col}, sess_n
"""


def top_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    max_steps: int = 8,
    top_n: int = 20,
) -> DataFrame:
    """Top-N behavioral paths: the most common ordered event-type
    sequences per (user, day) session — the path-analysis report behind
    "how do users actually move through the product".

    Each session's path is its first ``max_steps`` events joined as
    ``a>b>c`` (deterministic order: ts, then event id on ties).  Paths
    are counted across all sessions and ranked (count DESC, path ASC).

    Scale shape: one (user, day) exchange builds the per-session rows
    — the path string is assembled row-locally from a sorted in-row
    array (collect_list + array_sort on the unique step index, no
    second sort pass) and is bounded by ``max_steps`` — then the
    path-frequency table (≤ |event types|^max_steps in theory, tiny in
    practice) is ranked; only that pre-aggregated table crosses the
    final single-partition ranking window, the classic top-k shape
    (same discipline as streaming/windows.stream_topk).
    """
    day = F.to_date(F.col(ts_col))
    w = Window.partitionBy(user_col, "_day").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    steps = (
        events.withColumn("_day", day)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_steps)
    )
    paths = steps.groupBy(user_col, "_day").agg(
        F.concat_ws(
            ">",
            F.expr(f"transform(array_sort(collect_list(struct(_rn, {type_col}))), x -> x.{type_col})"),
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    w_rank = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return (
        counts.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= top_n)
    )


def top_paths_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    max_steps: int = 8,
    top_n: int = 20,
) -> str:
    """DuckDB twin of :func:`top_paths`."""
    return f"""
WITH s AS (
  SELECT {user_col}, CAST({ts_col} AS DATE) AS _day, {type_col},
    row_number() OVER (PARTITION BY {user_col}, CAST({ts_col} AS DATE)
                       ORDER BY {ts_col} ASC, {id_col} ASC) AS rn
  FROM {table}
),
p AS (
  SELECT {user_col}, _day, string_agg({type_col}, '>' ORDER BY rn) AS path
  FROM s WHERE rn <= {max_steps} GROUP BY {user_col}, _day
),
c AS (SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path)
SELECT path, n_sessions,
  CAST(row_number() OVER (ORDER BY n_sessions DESC, path ASC) AS INT) AS rnk
FROM c QUALIFY rnk <= {top_n}
"""


def collapse_bursts(
    events: DataFrame,
    group_columns,
    ts_col: str = "ts",
    gap_seconds: int = 600,
    tie_break: str = "event_id",
) -> DataFrame:
    """Leading-edge debounce / burst collapse: keep only the FIRST event
    of each burst, where a burst is a maximal chain of events each
    within ``gap_seconds`` of the previous one — the telemetry-cleaning
    step that collapses alert storms, retry floods, and double-clicks
    into single logical events (with the burst's size and span kept as
    evidence).

    Same closed form as :func:`sessionize` (break flag + running sum,
    one LAG), generalized to a multi-column series key and a seconds
    gap; the burst summary is a second window over the (key, burst)
    superset partition.  Exact integer-ms arithmetic throughout.

    Returns the first event per (groups…, burst_n) with ``ts_ms``,
    ``burst_n``, ``burst_size``, ``burst_span_ms`` appended.
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    gap_ms = gap_seconds * 1000
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(*groups).orderBy("ts_ms", tie_break)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = events.withColumn("ts_ms", ms)
    prev = F.lag("ts_ms").over(w)
    brk = F.when(prev.isNull() | (F.col("ts_ms") - prev > gap_ms), 1).otherwise(0)
    bursts = base.withColumn("burst_n", F.sum(brk).over(run))
    wb = Window.partitionBy(*groups, "burst_n").orderBy("ts_ms", tie_break)
    wb_all = Window.partitionBy(*groups, "burst_n")
    return (
        bursts.withColumn("_rn", F.row_number().over(wb))
        .withColumn("burst_size", F.count(F.lit(1)).over(wb_all))
        .withColumn(
            "burst_span_ms",
            F.max("ts_ms").over(wb_all) - F.min("ts_ms").over(wb_all),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def collapse_bursts_sql(
    inner_sql: str,
    group_columns,
    select_cols: str,
    ts_col: str = "ts",
    gap_seconds: int = 600,
    tie_break: str = "event_id",
) -> str:
    """DuckDB twin of :func:`collapse_bursts`; ``select_cols`` lists the
    passthrough output columns (comma-joined, pre-aliased)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    g = ", ".join(groups)
    gap_ms = gap_seconds * 1000
    return f"""
WITH src AS ({inner_sql}),
m AS (SELECT *, epoch_ms({ts_col}) AS ts_ms FROM src),
b AS (
  SELECT *, CASE WHEN LAG(ts_ms) OVER (PARTITION BY {g} ORDER BY ts_ms, {tie_break})
                      IS NULL
                 OR ts_ms - LAG(ts_ms) OVER (PARTITION BY {g} ORDER BY ts_ms, {tie_break})
                      > {gap_ms}
            THEN 1 ELSE 0 END AS brk
  FROM m
),
s AS (
  SELECT *, CAST(SUM(brk) OVER (PARTITION BY {g} ORDER BY ts_ms, {tie_break}
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS burst_n
  FROM b
),
f AS (
  SELECT *,
    row_number() OVER (PARTITION BY {g}, burst_n ORDER BY ts_ms, {tie_break}) AS _rn,
    COUNT(*) OVER (PARTITION BY {g}, burst_n) AS burst_size,
    MAX(ts_ms) OVER (PARTITION BY {g}, burst_n)
      - MIN(ts_ms) OVER (PARTITION BY {g}, burst_n) AS burst_span_ms
  FROM s
)
SELECT {select_cols} FROM f WHERE _rn = 1
"""


def merge_intervals(
    intervals: DataFrame,
    group_columns,
    start_col: str = "start_ms",
    end_col: str = "end_ms",
) -> DataFrame:
    """Union of overlapping/touching intervals per key — the classic
    gaps-and-islands coverage problem (uptime episodes from heartbeat
    leases, user activity coverage, maintenance-window flattening;
    the same primitive rolling_active_users uses internally, exposed
    first-class).

    Closed form: order by start; an interval starts a new island iff its
    start exceeds the running max of all previous ends (one window max
    + one running sum — a single (key)-exchange, no self-join, no
    iteration).  Interval bounds are exact integers (epoch ms).

    Returns one row per island: (groups…, episode_n, start, end,
    n_merged).  Touching intervals (start = previous end) merge.
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    w = Window.partitionBy(*groups).orderBy(F.col(start_col).asc(), F.col(end_col).asc())
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = intervals.withColumn("episode_n", F.sum(brk).over(run))
    return marked.groupBy(*groups, "episode_n").agg(
        F.min(start_col).alias("start"),
        F.max(end_col).alias("end"),
        F.count(F.lit(1)).alias("n_merged"),
    )


def merge_intervals_sql(
    inner_sql: str,
    group_columns,
    start_col: str = "start_ms",
    end_col: str = "end_ms",
) -> str:
    """DuckDB twin of :func:`merge_intervals` over ``inner_sql``."""
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    g = ", ".join(groups)
    ordr = f"{start_col} ASC, {end_col} ASC"
    return f"""
WITH src AS ({inner_sql}),
m AS (
  SELECT *, MAX({end_col}) OVER (PARTITION BY {g} ORDER BY {ordr}
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS _pme
  FROM src
),
b AS (
  SELECT *, CASE WHEN _pme IS NULL OR {start_col} > _pme THEN 1 ELSE 0 END AS _brk
  FROM m
),
i AS (
  SELECT *, CAST(SUM(_brk) OVER (PARTITION BY {g} ORDER BY {ordr}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS episode_n
  FROM b
)
SELECT {g}, episode_n, MIN({start_col}) AS start, MAX({end_col}) AS "end",
  COUNT(*) AS n_merged
FROM i GROUP BY {g}, episode_n
"""
