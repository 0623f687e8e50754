"""Event-analytics operators: multi-resolution time rollups, ordered
funnels, cohort retention.

These are the hypertable/product-analytics queries a time-series engine
is used for day-to-day; the reference delegates all aggregation to its
caller (SURVEY.md §2.3), so these are capability-parity ops built on
Spark primitives.

Scale design:

* ``time_rollup`` — ONE pass over the fact table produces every
  resolution level at once via ``ROLLUP`` over hierarchically-nested
  truncations (minute ⊂ hour ⊂ day).  Partial (map-side) aggregation
  applies per level, so the shuffle carries pre-combined rows — at
  100 TB this is a single fact scan + one exchange keyed by the finest
  bucket, never N scans for N resolutions.  This is the batch form of a
  TimescaleDB continuous aggregate / materialized rollup.
* ``funnel_counts`` — the step timestamps are conditional MINs over one
  ``Window.partitionBy(user)``: every step reuses the SAME partitioning,
  so the whole funnel costs exactly one exchange + one in-partition pass
  regardless of step count (no per-step join/shuffle chain).
* ``cohort_retention`` — first-touch assignment is a window MIN over the
  same user partitioning; the (cohort, offset) aggregation that follows
  is map-combinable.  ``countDistinct`` over (user) is exact and
  partial-aggregated; at extreme cardinality swap for
  ``approx_count_distinct`` (sketches merge associatively).

All timestamps are compared/emitted as integer epoch milliseconds or
day indexes (no float time arithmetic), value sums through exact
DECIMAL (functions/exact.py) — results are bit-identical across
partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit, dsum, dsum_sql, sq

EPOCH = "2024-01-01"  # day-index origin for cohort math (events table era)


def _ms(ts_col: str) -> Column:
    return F.unix_millis(F.col(ts_col).cast("timestamp"))


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    levels: tuple[str, ...] = ("day", "hour", "minute"),
) -> DataFrame:
    """Multi-resolution time-bucketed aggregate: one output row per
    (level, bucket) with event count and exact value sum, computed in a
    single pass via ROLLUP over nested truncations.

    ``levels`` must be ordered coarse → fine (each bucket nested in the
    previous).  Output: ``level`` (the resolution name, 'total' for the
    grand-total row), ``bucket_ms`` (bucket start, epoch ms; NULL for
    'total'), ``n`` , ``value_sum``.
    """
    bucket_cols = [
        F.unix_millis(F.date_trunc(lv, F.col(ts_col).cast("timestamp"))).alias(f"b_{lv}")
        for lv in levels
    ]
    names = [f"b_{lv}" for lv in levels]
    rolled = (
        events.select(*bucket_cols, value_col)
        .rollup(*names)
        .agg(
            F.grouping_id(*names).alias("_gid"),
            F.count(F.lit(1)).alias("n"),
            dsum(value_col, scale=8).alias("value_sum"),
        )
    )
    # grouping_id bit i set ⇔ names[i] rolled away; rollup yields exactly
    # len(levels)+1 masks: 0 (finest) … all-set (grand total)
    gid = F.col("_gid")
    n_lv = len(levels)
    level = F.lit("total")
    bucket = F.lit(None).cast("bigint")
    for i, lv in enumerate(levels):
        mask = (1 << (n_lv - 1 - i)) - 1  # levels[i] kept, finer ones rolled
        level = F.when(gid == mask, F.lit(lv)).otherwise(level)
        bucket = F.when(gid == mask, F.col(names[i])).otherwise(bucket)
    return rolled.select(
        level.alias("level"), bucket.alias("bucket_ms"), "n", "value_sum"
    )


def time_rollup_sql(
    ts_col: str = "ts",
    value_col: str = "value",
    levels: tuple[str, ...] = ("day", "hour", "minute"),
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`time_rollup` (same bucket-ms integers)."""
    names = [f"b_{lv}" for lv in levels]
    trunc = ",\n    ".join(
        f"epoch_ms(date_trunc('{lv}', {ts_col})) AS b_{lv}" for lv in levels
    )
    n_lv = len(levels)
    lvl_case = "CASE "
    bkt_case = "CASE "
    for i, lv in enumerate(levels):
        mask = (1 << (n_lv - 1 - i)) - 1
        lvl_case += f"WHEN GROUPING({', '.join(names)}) = {mask} THEN '{lv}' "
        bkt_case += f"WHEN GROUPING({', '.join(names)}) = {mask} THEN {names[i]} "
    lvl_case += "ELSE 'total' END"
    bkt_case += "ELSE NULL END"
    return f"""
WITH e AS (
  SELECT {trunc},
    {value_col}
  FROM {table}
)
SELECT {lvl_case} AS level, {bkt_case} AS bucket_ms,
  COUNT(*) AS n, {dsum_sql(value_col, scale=8)} AS value_sum
FROM e GROUP BY ROLLUP ({', '.join(names)})
"""


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: users reaching step i must have an event of type
    ``steps[i]`` at/after their step-i−1 timestamp (first-touch per step,
    ``>=`` so same-millisecond progressions count).

    Output: one row per step — ``step`` (1-based), ``step_name``,
    ``n_users`` reaching it, ``conversion`` (n / step-1 users, double).
    """
    w = Window.partitionBy(user_col)
    e = events.select(user_col, type_col, _ms(ts_col).alias("ts_ms"))
    prev: Column | None = None
    t_cols = []
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col("ts_ms") >= prev)
        e = e.withColumn(f"t{i}", F.min(F.when(cond, F.col("ts_ms"))).over(w))
        prev = F.col(f"t{i}")
        t_cols.append(f"t{i}")
    per_user = e.groupBy(user_col).agg(*[F.max(t).alias(t) for t in t_cols])
    counts = per_user.agg(
        *[F.count(t).alias(f"n{i}") for i, t in enumerate(t_cols)]
    )
    stack = ", ".join(
        f"{i + 1}, '{s}', n{i}, {'cast(NULL as double)' if i == 0 else f'n{i} / cast(n{i - 1} as double)'}"
        for i, s in enumerate(steps)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack}) AS (step, step_name, n_users, conversion)"
    )


def funnel_counts_sql(
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`funnel_counts` (chained window CTEs)."""
    ctes = [f"s0 AS (\n  SELECT {user_col}, {type_col}, epoch_ms({ts_col}) AS ts_ms FROM {table}\n)"]
    prev_src = "s0"
    for i, s in enumerate(steps):
        cond = f"{type_col} = {sq(s)}"
        if i > 0:
            cond += f" AND ts_ms >= t{i - 1}"
        ctes.append(
            f"s{i + 1} AS (\n  SELECT *, MIN(CASE WHEN {cond} THEN ts_ms END) "
            f"OVER (PARTITION BY {user_col}) AS t{i} FROM {prev_src}\n)"
        )
        prev_src = f"s{i + 1}"
    t_cols = [f"t{i}" for i in range(len(steps))]
    maxes = ", ".join(f"MAX({t}) AS {t}" for t in t_cols)
    cnts = ", ".join(f"COUNT({t}) AS n{i}" for i, t in enumerate(t_cols))
    rows = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS step, '{s}' AS step_name, n{i} AS n_users, "
        + ("CAST(NULL AS DOUBLE) AS conversion" if i == 0 else f"n{i} / CAST(n{i - 1} AS DOUBLE) AS conversion")
        + " FROM c"
        for i, s in enumerate(steps)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f",\nu AS (\n  SELECT {user_col}, {maxes} FROM {prev_src} GROUP BY {user_col}\n)"
        + f",\nc AS (\n  SELECT {cnts} FROM u\n)\n"
        + rows
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    epoch: str = EPOCH,
) -> DataFrame:
    """Day-granularity cohort retention: cohort = day index of the user's
    first event; one output row per (cohort_day, day_offset) with the
    exact distinct-user count active at that offset.
    """
    day = F.datediff(F.col(ts_col).cast("date"), F.lit(epoch).cast("date")).cast(
        "bigint"
    )
    w = Window.partitionBy(user_col)
    e = events.select(F.col(user_col), day.alias("day"))
    e = e.withColumn("cohort_day", F.min("day").over(w))
    return (
        e.groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def cohort_retention_sql(
    user_col: str = "user_id",
    ts_col: str = "ts",
    epoch: str = EPOCH,
    table: str = "events",
) -> str:
    return f"""
WITH e AS (
  SELECT {user_col},
    CAST(datediff('day', DATE '{epoch}', CAST({ts_col} AS DATE)) AS BIGINT) AS day
  FROM {table}
), c AS (
  SELECT *, MIN(day) OVER (PARTITION BY {user_col}) AS cohort_day FROM e
)
SELECT cohort_day, day - cohort_day AS day_offset,
  COUNT(DISTINCT {user_col}) AS n_users
FROM c GROUP BY 1, 2
"""


def ohlc(
    events: DataFrame,
    group_columns=("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    id_col: str = "event_id",
) -> DataFrame:
    """Candlestick downsampling: per (group, time bucket) the open /
    high / low / close of ``value_col`` plus count and exact sum — the
    canonical irregular-series → bar-chart rollup (continuous-aggregate
    material at scale).

    Open/close are the values at the first/last row of the bucket under
    the total order (ts, id) — the id tie-break makes the pick
    deterministic when timestamps collide (min_by/arg_min pick an
    arbitrary tied row; a rank over an explicit total order does not).
    One window pass + one aggregate, both partitioned by (group, bucket)
    — a single hash exchange end-to-end.
    """
    g = list(group_columns)
    b = F.unix_millis(F.date_trunc(bucket, F.col(ts_col).cast("timestamp"))).alias(
        "bucket_ms"
    )
    w = Window.partitionBy(*g, "bucket_ms").orderBy("_tms", id_col)
    cnt = Window.partitionBy(*g, "bucket_ms")
    staged = events.select(*g, b, _ms(ts_col).alias("_tms"), id_col, value_col).select(
        *g,
        "bucket_ms",
        value_col,
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(cnt).alias("_n"),
    )
    v = F.col(value_col)
    return staged.groupBy(*g, "bucket_ms").agg(
        F.max(F.when(F.col("_rn") == 1, v)).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max(F.when(F.col("_rn") == F.col("_n"), v)).alias("close"),
        F.count(v).alias("n"),
        dsum(value_col, scale=8).alias("value_sum"),
    )


def ohlc_sql(
    table: str = "events",
    group_columns=("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "hour",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`ohlc` (same rank-based open/close)."""
    g = ", ".join(group_columns)
    ms = f"epoch_ms(CAST({ts_col} AS TIMESTAMP))"
    over = f"(PARTITION BY {g}, bucket_ms ORDER BY _tms, {id_col})"
    cnt = f"(PARTITION BY {g}, bucket_ms)"
    return f"""
WITH staged AS (
  SELECT {g},
    epoch_ms(date_trunc('{bucket}', CAST({ts_col} AS TIMESTAMP))) AS bucket_ms,
    {ms} AS _tms, {id_col}, {value_col}
  FROM {table}
), ranked AS (
  SELECT {g}, bucket_ms, {value_col},
    ROW_NUMBER() OVER {over} AS _rn,
    COUNT(*) OVER {cnt} AS _n
  FROM staged
)
SELECT {g}, bucket_ms,
  MAX(CASE WHEN _rn = 1 THEN {value_col} END) AS open,
  MAX({value_col}) AS high,
  MIN({value_col}) AS low,
  MAX(CASE WHEN _rn = _n THEN {value_col} END) AS close,
  COUNT({value_col}) AS n,
  {dsum_sql(value_col, scale=8)} AS value_sum
FROM ranked GROUP BY {g}, bucket_ms
"""


def time_weighted_avg(
    events: DataFrame,
    group_columns=("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 6,
) -> DataFrame:
    """Trapezoidal time-weighted average per group over an irregular
    series: Σ Δt·(v_i+v_{i-1})/2 / (t_n − t_0) — the correct mean when
    observation spacing varies (an unweighted AVG over-counts bursts).

    Δt in exact integer ms; each trapezoid area is a fixed double
    expression, quantized to an integer (floor(area·10^scale + 0.5))
    and summed as BIGINT — exact, associative, and its BIGINT→DOUBLE
    cast is a single rounding in both engines (a DECIMAL sum past 2^53
    unscaled units double-rounds in DuckDB's decimal→double cast).
    NULL for groups with a single point (zero span).  One window + one
    aggregate on the group key — a single exchange.  Range guard:
    Σ|area|·10^scale must stay below ~9.2e18 (bigint).
    """
    g = list(group_columns)
    w = Window.partitionBy(*g).orderBy(_ms(ts_col), "event_id")
    tms = _ms(ts_col)
    dt = (tms - F.lag(tms).over(w)).cast("double")
    area = dt * (F.col(value_col) + F.lag(value_col).over(w)) / F.lit(2.0)
    mult = float(10**scale)
    qarea = F.floor(area * F.lit(mult) + F.lit(0.5)).cast("bigint")
    staged = events.select(*g, tms.alias("_tms"), qarea.alias("_qarea"))
    span = (F.max("_tms") - F.min("_tms")).cast("double")
    return staged.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("_tms") - F.min("_tms")).alias("span_ms"),
        F.when(
            span > 0, F.sum("_qarea").cast("double") / F.lit(mult) / span
        ).alias("twa"),
    )


def time_weighted_avg_sql(
    table: str = "events",
    group_columns=("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`time_weighted_avg` (same tree/order)."""
    g = ", ".join(group_columns)
    ms = f"epoch_ms(CAST({ts_col} AS TIMESTAMP))"
    over = f"(PARTITION BY {g} ORDER BY {ms}, event_id)"
    dt = f"CAST(({ms} - LAG({ms}) OVER {over}) AS DOUBLE)"
    area = f"({dt} * ({value_col} + LAG({value_col}) OVER {over}) / 2.0)"
    mult = float(10**scale)
    qarea = f"CAST(FLOOR({area} * {mult!r} + 0.5) AS BIGINT)"
    return f"""
WITH staged AS (
  SELECT {g}, {ms} AS _tms, {qarea} AS _qarea
  FROM {table}
)
SELECT {g}, COUNT(*) AS n,
  MAX(_tms) - MIN(_tms) AS span_ms,
  CASE WHEN CAST(MAX(_tms) - MIN(_tms) AS DOUBLE) > 0
       THEN CAST(SUM(_qarea) AS DOUBLE) / {mult!r} / CAST(MAX(_tms) - MIN(_tms) AS DOUBLE)
  END AS twa
FROM staged GROUP BY {g}
"""


def detect_gaps(
    events: DataFrame,
    gap_minutes: float = 60.0,
    group_columns=("user_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Series-quality check: every inter-observation gap longer than
    ``gap_minutes`` per group, as (group, gap_start_ms, gap_end_ms,
    gap_ms) — the missing-data report behind any fill/interpolate
    decision.  Exact integer-ms arithmetic; one window on the group key.
    """
    g = list(group_columns)
    w = Window.partitionBy(*g).orderBy(_ms(ts_col), "event_id")
    tms = _ms(ts_col)
    prev = F.lag(tms).over(w)
    out = events.select(
        *g, prev.alias("gap_start_ms"), tms.alias("gap_end_ms")
    ).withColumn("gap_ms", F.col("gap_end_ms") - F.col("gap_start_ms"))
    return out.filter(F.col("gap_ms") > int(gap_minutes * 60_000))


def detect_gaps_sql(
    table: str = "events",
    gap_minutes: float = 60.0,
    group_columns=("user_id",),
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`detect_gaps`."""
    g = ", ".join(group_columns)
    ms = f"epoch_ms(CAST({ts_col} AS TIMESTAMP))"
    over = f"(PARTITION BY {g} ORDER BY {ms}, event_id)"
    return f"""
WITH staged AS (
  SELECT {g}, LAG({ms}) OVER {over} AS gap_start_ms, {ms} AS gap_end_ms
  FROM {table}
)
SELECT {g}, gap_start_ms, gap_end_ms, gap_end_ms - gap_start_ms AS gap_ms
FROM staged WHERE gap_end_ms - gap_start_ms > {int(gap_minutes * 60_000)}
"""


def rolling_active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Rolling N-day distinct active users (WAU/MAU) per calendar day.

    A windowed COUNT(DISTINCT ...) does not exist in Spark (or ANSI)
    window functions, and the join-per-day brute force touches each
    user-day window_days times.  Instead: per user, consecutive active
    days collapse into DISJOINT coverage intervals —

        user covers day e  iff  some active day d in (e-N, e]
        ⇔  e in [d, min(d+N-1, next_active_day-1)]   (disjoint per user)

    — so the rolling distinct count is an interval-stabbing count:
    +1/-1 deltas at interval ends, summed per day, prefix-summed over
    the dense day spine.  Cost: one dedup exchange on (user, day), one
    lead window per user, one day-level aggregation.  The only
    single-partition step is the final cumulative sum over the DAY
    spine (calendar-sized metadata, ~365 rows/year — never the data).

    Returns (day [string], active_users) for every day in the observed
    range, exact bigint arithmetic end-to-end.
    """
    n = int(window_days)
    ud = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"),
    ).distinct()
    wl = Window.partitionBy("u").orderBy("day")
    iv = ud.select(
        F.col("day").alias("s"),
        F.least(
            F.date_add("day", n - 1),
            F.coalesce(
                F.date_sub(F.lead("day").over(wl), 1), F.date_add("day", n - 1)
            ),
        ).alias("e"),
    )
    deltas = iv.select(F.col("s").alias("day"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.date_add("e", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    agg = deltas.groupBy("day").agg(F.sum("delta").alias("delta"))
    spine = (
        ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("day")
        )
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(agg, "day", "left")
        .select("day", F.coalesce("delta", F.lit(0)).alias("delta"))
        .select(
            F.col("day").cast("string").alias("day"),
            F.sum("delta").over(wc).cast("bigint").alias("active_users"),
        )
    )


def rolling_active_users_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> str:
    """DuckDB twin of :func:`rolling_active_users`."""
    n = int(window_days)
    return f"""
WITH ud AS (
  SELECT DISTINCT {user_col} AS u, CAST(date_trunc('day', {ts_col}) AS DATE) AS day
  FROM {table}
),
iv AS (
  SELECT day AS s,
    LEAST(day + {n - 1},
          COALESCE(LEAD(day) OVER (PARTITION BY u ORDER BY day) - 1, day + {n - 1})
    ) AS e
  FROM ud
),
d AS (
  SELECT s AS day, 1 AS delta FROM iv
  UNION ALL
  SELECT e + 1 AS day, -1 AS delta FROM iv
),
agg AS (SELECT day, SUM(delta) AS delta FROM d GROUP BY 1),
spine AS (
  SELECT CAST(UNNEST(generate_series(
    (SELECT MIN(day) FROM ud), (SELECT MAX(day) FROM ud), INTERVAL 1 DAY
  )) AS DATE) AS day
)
SELECT CAST(s.day AS VARCHAR) AS day,
  CAST(SUM(COALESCE(a.delta, 0)) OVER (ORDER BY s.day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS active_users
FROM spine s LEFT JOIN agg a ON s.day = a.day
"""


def funnel_latency(
    events: DataFrame,
    first_step: str = "view",
    last_step: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Conversion-latency distribution: per user, the time from first
    ``first_step`` to the first ``last_step`` at-or-after it, summarized
    per first-step day as (n_converted, p50, p75) in integer ms.

    Complements funnel_counts (how many convert) with HOW FAST — the
    product-analytics latency report.  Quantiles are exact
    ``percentile``/``quantile_cont`` over int64 ms; the probe points are
    dyadic (0.5, 0.75), so h = q·(n−1) and the lerp are exact dyadic
    arithmetic on integers — both engines' algebraically-different lerp
    forms (a+(b−a)f vs a(1−f)+bf) compute the identical double.

    Two per-user min-aggregations + one user-keyed join + one day-level
    aggregation; everything partial-aggregated, no window over the raw
    event stream."""
    v = (
        events.where(F.col("event_type") == first_step)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_vt"))
    )
    p = (
        events.where(F.col("event_type") == last_step)
        .join(v, user_col)
        .where(F.col(ts_col) >= F.col("_vt"))
        .groupBy(user_col, "_vt")
        .agg(F.min(ts_col).alias("_pt"))
    )
    lat = p.select(
        F.date_trunc("day", F.col("_vt")).cast("date").cast("string").alias("day"),
        (
            F.unix_millis(F.col("_pt").cast("timestamp"))
            - F.unix_millis(F.col("_vt").cast("timestamp"))
        ).alias("_ms"),
    )
    return lat.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile("_ms", 0.5).alias("p50_ms"),
        F.percentile("_ms", 0.75).alias("p75_ms"),
    )


def funnel_latency_sql(
    table: str = "events",
    first_step: str = "view",
    last_step: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of :func:`funnel_latency`."""
    return f"""
WITH v AS (
  SELECT {user_col}, MIN({ts_col}) AS vt FROM {table}
  WHERE event_type = {sq(first_step)} GROUP BY 1
),
p AS (
  SELECT e.{user_col}, v.vt, MIN(e.{ts_col}) AS pt
  FROM {table} e JOIN v ON e.{user_col} = v.{user_col}
  WHERE e.event_type = {sq(last_step)} AND e.{ts_col} >= v.vt
  GROUP BY 1, 2
),
lat AS (
  SELECT CAST(CAST(date_trunc('day', vt) AS DATE) AS VARCHAR) AS day,
    epoch_ms(pt) - epoch_ms(vt) AS ms
  FROM p
)
SELECT day, COUNT(*) AS n_converted,
  quantile_cont(ms, 0.5) AS p50_ms,
  quantile_cont(ms, 0.75) AS p75_ms
FROM lat GROUP BY day
"""


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_break: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every ordered (from_type → to_type) pair of
    *consecutive* events of the same user, the transition count and the
    row-normalized probability P(to | from) — the behavioral-flow
    summary behind funnel design and next-event prediction.

    Pipeline: one LEAD over (user ORDER BY ts, tie_break) pairs each
    event with its successor (sequence ends drop out), then a
    map-combinable groupBy (from, to).  The row normalization divides
    by a whole-partition window sum over the tiny |types|² matrix — no
    second scan.  Counts are exact BIGINTs; the probability is one
    deterministic double division.

    Scale shape: one hash exchange on user for the window, one on
    (from, to) for the count — both shuffle only (user, type, ts)-width
    rows; the matrix itself is |types|² rows, trivially small.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_break)
    nxt = F.lead(type_col).over(w)
    pairs = events.select(
        F.col(type_col).alias("from_type"), nxt.alias("to_type")
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    row_tot = F.sum("n_transitions").over(Window.partitionBy("from_type"))
    prob = F.col("n_transitions").cast("double") / row_tot.cast("double")
    return counts.select(
        "from_type", "to_type", "n_transitions", prob.alias("prob")
    )


def event_transitions_sql(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_break: str = "event_id",
) -> str:
    """DuckDB twin of :func:`event_transitions`."""
    return f"""
WITH pairs AS (
  SELECT {type_col} AS from_type,
    LEAD({type_col}) OVER (PARTITION BY {user_col} ORDER BY {ts_col}, {tie_break}) AS to_type
  FROM {table}
), counts AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
  CAST(n_transitions AS DOUBLE) /
    CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
FROM counts
"""


def ab_test_report(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    exposure_type: str = "view",
    conversion_type: str = "purchase",
) -> DataFrame:
    """Two-variant A/B conversion report: users are deterministically
    assigned to arms by md5-bucket parity of their user id (the
    splits.hash_bucket convention — stable across engines and runs),
    exposure = any ``exposure_type`` event, conversion = any
    ``conversion_type`` event among exposed users.  One summary row:
    per-arm exposed/converted counts and rates, absolute lift
    (B − A), and the two-proportion pooled z statistic

        z = (p_b − p_a) / sqrt( p·(1−p) · (1/n_a + 1/n_b) )

    with p the pooled conversion rate.  Counts are exact; rates/z are
    fixed double expressions over them, identical in the twin.

    Scale shape: one per-user aggregate (map-combinable bool_or-style
    MAX flags), then a single global conditional-count row — two light
    reduce stages regardless of event volume.
    """
    from timeseriesutils_spark.operators.splits import hash_bucket

    arm = F.when(hash_bucket(F.col("_u")) % 2 == 0, "A").otherwise("B")
    per_user = (
        events.select(
            F.col(user_col).alias("_u"),
            F.col(type_col).alias("_ty"),
        )
        .groupBy("_u")
        .agg(
            F.max(F.when(F.col("_ty") == exposure_type, F.lit(1)).otherwise(F.lit(0))).alias("_exp"),
            F.max(F.when(F.col("_ty") == conversion_type, F.lit(1)).otherwise(F.lit(0))).alias("_cv"),
        )
        .select("_u", "_exp", "_cv", arm.alias("_arm"))
        .filter(F.col("_exp") == 1)
    )
    agg = per_user.agg(
        F.count(F.when(F.col("_arm") == "A", F.lit(1))).alias("n_a"),
        F.count(F.when((F.col("_arm") == "A") & (F.col("_cv") == 1), F.lit(1))).alias("conv_a"),
        F.count(F.when(F.col("_arm") == "B", F.lit(1))).alias("n_b"),
        F.count(F.when((F.col("_arm") == "B") & (F.col("_cv") == 1), F.lit(1))).alias("conv_b"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    # empty-arm guards: x/0 on doubles is engine-lumpy (Spark NULL,
    # DuckDB IEEE inf/nan) — every ratio is gated on its denominator
    pa = F.when(F.col("n_a") > 0, F.col("conv_a").cast("double") / na)
    pb = F.when(F.col("n_b") > 0, F.col("conv_b").cast("double") / nb)
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    z = F.when(both & (se > 0), (pb - pa) / se)
    return agg.select(
        "n_a",
        "conv_a",
        pa.alias("rate_a"),
        "n_b",
        "conv_b",
        pb.alias("rate_b"),
        (pb - pa).alias("lift"),
        z.alias("z_stat"),
    )


def ab_test_report_sql(
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    exposure_type: str = "view",
    conversion_type: str = "purchase",
) -> str:
    """DuckDB twin of :func:`ab_test_report`."""
    # hash_bucket twin: first 4 md5 hex digits → int, mod 100 (the
    # splits.hash_bucket convention as rendered by the hash_split oracle)
    bucket = "CAST(CONCAT('0x', substring(md5(CAST(_u AS VARCHAR)), 1, 4)) AS INT) % 100"
    arm = f"CASE WHEN ({bucket}) % 2 = 0 THEN 'A' ELSE 'B' END"
    na = "CAST(n_a AS DOUBLE)"
    nb = "CAST(n_b AS DOUBLE)"
    pa = f"(CASE WHEN n_a > 0 THEN CAST(conv_a AS DOUBLE) / {na} END)"
    pb = f"(CASE WHEN n_b > 0 THEN CAST(conv_b AS DOUBLE) / {nb} END)"
    pooled = "(CAST((conv_a + conv_b) AS DOUBLE) / CAST((n_a + n_b) AS DOUBLE))"
    se = f"SQRT({pooled} * (1.0 - {pooled}) * (1.0 / {na} + 1.0 / {nb}))"
    z = f"CASE WHEN n_a > 0 AND n_b > 0 AND {se} > 0 THEN ({pb} - {pa}) / {se} END"
    return f"""
WITH per_user AS (
  SELECT _u,
    MAX(CASE WHEN _ty = {sq(exposure_type)} THEN 1 ELSE 0 END) AS _exp,
    MAX(CASE WHEN _ty = {sq(conversion_type)} THEN 1 ELSE 0 END) AS _cv
  FROM (SELECT {user_col} AS _u, {type_col} AS _ty FROM {table})
  GROUP BY _u
), armed AS (
  SELECT _u, _exp, _cv, {arm} AS _arm FROM per_user WHERE _exp = 1
), agg AS (
  SELECT
    COUNT(CASE WHEN _arm = 'A' THEN 1 END) AS n_a,
    COUNT(CASE WHEN _arm = 'A' AND _cv = 1 THEN 1 END) AS conv_a,
    COUNT(CASE WHEN _arm = 'B' THEN 1 END) AS n_b,
    COUNT(CASE WHEN _arm = 'B' AND _cv = 1 THEN 1 END) AS conv_b
  FROM armed
)
SELECT n_a, conv_a, {pa} AS rate_a,
  n_b, conv_b, {pb} AS rate_b,
  ({pb} - {pa}) AS lift,
  {z} AS z_stat
FROM agg
"""


def funnel_window(
    events: DataFrame,
    steps: tuple[str, ...],
    window_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-bounded ordered funnel (the ClickHouse ``windowFunnel``
    semantics): per user, the deepest step prefix completed IN ORDER
    within ``window_hours`` of that user's first step-1 event; report
    user counts per reached depth.  The plain :func:`funnel_counts`
    ignores time — marketing funnels almost always bound conversion to
    a window ("purchased within 24 h of first view").

    Chained semantics — step k's timestamp is the user's earliest
    step-k event at-or-after step k−1 and inside the window — resolve
    as k stacked conditional-min window passes over ONE user partition
    (each pass reads the previous pass's column; same partition key, so
    Spark reuses a single exchange + sort).  All comparisons are exact
    integer-µs timestamp logic.

    Returns (depth, n_users): depth 0 = had step-1 but nothing further…
    depth = len(steps) − 1 fully converted; users with no step-1 event
    don't appear.
    """
    w = Window.partitionBy(user_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = events.select(user_col, F.col(type_col).alias("_et"), us.alias("_us"))
    d = d.withColumn(
        "_s0", F.min(F.when(F.col("_et") == steps[0], F.col("_us"))).over(w)
    )
    deadline = F.col("_s0") + F.lit(window_hours * 3_600_000_000)
    for i, step in enumerate(steps[1:], start=1):
        prev = F.col(f"_s{i - 1}")
        d = d.withColumn(
            f"_s{i}",
            F.min(
                F.when(
                    (F.col("_et") == step)
                    & (F.col("_us") >= prev)
                    & (F.col("_us") <= deadline),
                    F.col("_us"),
                )
            ).over(w),
        )
    per_user = d.groupBy(user_col).agg(
        *[F.max(f"_s{i}").alias(f"_s{i}") for i in range(len(steps))]
    )
    # deepest reached step: first non-null scanning from the deep end
    depth = F.lit(None).cast("int")
    for i in range(len(steps)):
        depth = F.when(F.col(f"_s{i}").isNotNull(), F.lit(i)).otherwise(depth)
    return (
        per_user.select(depth.alias("depth"))
        .filter(F.col("depth").isNotNull())
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_window_sql(
    steps: tuple[str, ...],
    window_hours: int = 24,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`funnel_window`."""
    us = f"epoch_us({ts_col})"
    ctes = [
        f"""d0 AS (
  SELECT {user_col}, {type_col} AS _et, {us} AS _us,
    MIN(CASE WHEN {type_col} = {sq(steps[0])} THEN {us} END)
      OVER (PARTITION BY {user_col}) AS _s0
  FROM {table}
)"""
    ]
    deadline = f"_s0 + {window_hours * 3_600_000_000}"
    for i, step in enumerate(steps[1:], start=1):
        ctes.append(
            f"""d{i} AS (
  SELECT *, MIN(CASE WHEN _et = {sq(step)} AND _us >= _s{i - 1}
                      AND _us <= {deadline} THEN _us END)
      OVER (PARTITION BY {user_col}) AS _s{i}
  FROM d{i - 1}
)"""
        )
    n = len(steps)
    depth_case = "CASE " + " ".join(
        f"WHEN _s{i} IS NOT NULL THEN {i}" for i in range(n - 1, -1, -1)
    ) + " END"
    cte_block = ",\n".join(ctes)
    max_cols = ", ".join(f"MAX(_s{i}) AS _s{i}" for i in range(n))
    return f"""
WITH {cte_block},
pu AS (
  SELECT {user_col}, {max_cols}
  FROM d{n - 1} GROUP BY {user_col}
)
SELECT CAST({depth_case} AS INT) AS depth, COUNT(*) AS n_users
FROM pu WHERE _s0 IS NOT NULL
GROUP BY 1
"""


def state_dwell(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-in-state report: treating each user's event stream as state
    transitions (the state between event i and i+1 is event i's type),
    total and mean dwell time per state — "how long do users sit on the
    cart page" — the duration companion of :func:`event_transitions`.

    One LEAD per user partition, then a map-combinable per-state
    reduce; dwell is exact integer milliseconds, the mean one double
    division.  Each user's last event has no successor and contributes
    no interval (standard open-episode exclusion).

    Returns (state, n_intervals, total_dwell_ms, mean_dwell_ms).
    """
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    d = events.select(
        F.col(type_col).alias("state"),
        ms.alias("_ms"),
        F.lead(ms).over(w).alias("_nxt"),
    ).filter(F.col("_nxt").isNotNull())
    return d.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("_nxt") - F.col("_ms")).alias("total_dwell_ms"),
        (
            F.sum(F.col("_nxt") - F.col("_ms")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_dwell_ms"),
    )


def state_dwell_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`state_dwell`."""
    return f"""
WITH d AS (
  SELECT {type_col} AS state, epoch_ms({ts_col}) AS _ms,
    LEAD(epoch_ms({ts_col})) OVER (PARTITION BY {user_col}
      ORDER BY {ts_col} ASC, {id_col} ASC) AS _nxt
  FROM {table}
)
SELECT state, COUNT(*) AS n_intervals,
  CAST(SUM(_nxt - _ms) AS BIGINT) AS total_dwell_ms,
  CAST(SUM(_nxt - _ms) AS DOUBLE) / COUNT(*) AS mean_dwell_ms
FROM d WHERE _nxt IS NOT NULL
GROUP BY state
"""


def period_over_period(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_col: str = "event_type",
    lag_days: int = 7,
    scale: int = 6,
) -> DataFrame:
    """Week-over-week (or any ``lag_days``) comparison per series: daily
    exact sums joined against the same series ``lag_days`` earlier via
    one LAG over the dense day grid — the standard BI "vs same day last
    week" column, with the day spine densified first so a missing day
    compares as 0 instead of silently lagging to the wrong date.

    Exactness: daily sums are quantized int64; pct change is one double
    division; the spine densification reuses the fill_gaps discipline
    (operators/timegrid.py) in miniature — per-series min..max day
    sequence, row-local explode, no join.

    Returns (group, day, cur, prev, delta, pct_change) for days with a
    comparable prior period.
    """
    q = F.floor(F.col(value_col) * F.lit(10**scale) + F.lit(0.5)).cast("bigint")
    daily = (
        events.select(
            F.col(group_col).alias("_g"), F.to_date(ts_col).alias("_d"), q.alias("_q")
        )
        .groupBy("_g", "_d")
        .agg(F.sum("_q").alias("_s"))
    )
    spine = (
        daily.groupBy("_g")
        .agg(F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
        .select(
            "_g",
            F.explode(F.expr("sequence(_lo, _hi, interval 1 day)")).alias("_d"),
        )
    )
    dense = spine.join(daily, ["_g", "_d"], "left").select(
        "_g", "_d", F.coalesce("_s", F.lit(0)).alias("_s")
    )
    w = Window.partitionBy("_g").orderBy("_d")
    prev = F.lag("_s", lag_days).over(w)
    mult = float(10**scale)
    return (
        dense.withColumn("_p", prev)
        .filter(F.col("_p").isNotNull())
        .select(
            F.col("_g").alias(group_col),
            F.col("_d").cast("string").alias("day"),
            (F.col("_s").cast("double") / F.lit(mult)).alias("cur"),
            (F.col("_p").cast("double") / F.lit(mult)).alias("prev"),
            ((F.col("_s") - F.col("_p")).cast("double") / F.lit(mult)).alias("delta"),
            F.when(
                F.col("_p") != 0,
                (F.col("_s") - F.col("_p")).cast("double") / F.col("_p").cast("double"),
            ).alias("pct_change"),
        )
    )


def period_over_period_sql(
    table: str = "events",
    value_col: str = "value",
    ts_col: str = "ts",
    group_col: str = "event_type",
    lag_days: int = 7,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`period_over_period`."""
    m = 10**scale
    mult = float(m)
    return f"""
WITH daily AS (
  SELECT {group_col} AS _g, CAST({ts_col} AS DATE) AS _d,
    CAST(SUM(CAST(FLOOR({value_col} * {m} + 0.5) AS BIGINT)) AS BIGINT) AS _s
  FROM {table} GROUP BY 1, 2
),
spine_raw AS (
  SELECT _g, unnest(generate_series(MIN(_d), MAX(_d), INTERVAL 1 DAY)) AS _t
  FROM daily GROUP BY _g
),
spine AS (SELECT _g, CAST(_t AS DATE) AS _d FROM spine_raw),
dense AS (
  SELECT s._g, s._d, COALESCE(d._s, 0) AS _s
  FROM spine s LEFT JOIN daily d ON s._g = d._g AND s._d = d._d
),
lagged AS (
  SELECT *, LAG(_s, {lag_days}) OVER (PARTITION BY _g ORDER BY _d) AS _p
  FROM dense
)
SELECT _g AS {group_col}, CAST(_d AS VARCHAR) AS day,
  CAST(_s AS DOUBLE) / {mult!r} AS cur,
  CAST(_p AS DOUBLE) / {mult!r} AS prev,
  CAST(_s - _p AS DOUBLE) / {mult!r} AS delta,
  CASE WHEN _p <> 0 THEN CAST(_s - _p AS DOUBLE) / CAST(_p AS DOUBLE) END AS pct_change
FROM lagged WHERE _p IS NOT NULL
"""


def wilson_daily(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    expose_type: str = "view",
    convert_type: str = "purchase",
    z: float = 1.96,
) -> DataFrame:
    """Daily conversion rate with Wilson-score 95% interval: per day,
    distinct exposed users, distinct converters among them, and the
    Wilson bounds — the interval that behaves at small n and p near
    0/1 where the normal approximation fails; the time-series companion
    of :func:`ab_test_report`.

    Two distinct-aggregations per day (map-combinable); the Wilson
    closed form is a fixed double chain on exact integer counts.

    Returns (day, n_exposed, n_converted, rate, wilson_lo, wilson_hi).
    """
    day = F.to_date(F.col(ts_col))
    base = events.select(
        day.alias("_d"), F.col(user_col).alias("_u"), F.col(type_col).alias("_t")
    )
    exposed = base.filter(F.col("_t") == expose_type).select("_d", "_u").distinct()
    converted = (
        base.filter(F.col("_t") == convert_type)
        .select("_d", "_u")
        .distinct()
        .join(exposed, ["_d", "_u"])  # converted among the exposed
    )
    n_e = exposed.groupBy("_d").agg(F.count(F.lit(1)).alias("n_exposed"))
    n_c = converted.groupBy("_d").agg(F.count(F.lit(1)).alias("n_converted"))
    j = n_e.join(n_c, "_d", "left").select(
        "_d", "n_exposed", F.coalesce("n_converted", F.lit(0)).alias("n_converted")
    )
    n = F.col("n_exposed").cast("double")
    p = F.col("n_converted").cast("double") / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = p + z2 / (2.0 * n)
    spread = F.lit(z) * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    return j.select(
        F.col("_d").cast("string").alias("day"),
        "n_exposed",
        "n_converted",
        p.alias("rate"),
        ((center - spread) / denom).alias("wilson_lo"),
        ((center + spread) / denom).alias("wilson_hi"),
    )


def wilson_daily_sql(
    table: str = "events",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    expose_type: str = "view",
    convert_type: str = "purchase",
    z: float = 1.96,
) -> str:
    """DuckDB twin of :func:`wilson_daily`."""
    z2 = z * z
    return f"""
WITH base AS (
  SELECT CAST({ts_col} AS DATE) AS _d, {user_col} AS _u, {type_col} AS _t
  FROM {table}
),
exposed AS (SELECT DISTINCT _d, _u FROM base WHERE _t = {sq(expose_type)}),
conv AS (
  SELECT DISTINCT b._d, b._u FROM base b
  JOIN exposed e ON b._d = e._d AND b._u = e._u
  WHERE b._t = {sq(convert_type)}
),
ne AS (SELECT _d, COUNT(*) AS n_exposed FROM exposed GROUP BY _d),
nc AS (SELECT _d, COUNT(*) AS n_converted FROM conv GROUP BY _d),
j AS (
  SELECT ne._d, ne.n_exposed, COALESCE(nc.n_converted, 0) AS n_converted
  FROM ne LEFT JOIN nc ON ne._d = nc._d
),
k AS (
  SELECT *, CAST(n_exposed AS DOUBLE) AS n,
    CAST(n_converted AS DOUBLE) / CAST(n_exposed AS DOUBLE) AS p
  FROM j
)
SELECT CAST(_d AS VARCHAR) AS day, n_exposed, n_converted, p AS rate,
  ((p + {dlit(z2)} / (2.0 * n))
    - {dlit(z)} * sqrt(p * (1.0 - p) / n + {dlit(z2)} / (4.0 * n * n)))
    / (1.0 + {dlit(z2)} / n) AS wilson_lo,
  ((p + {dlit(z2)} / (2.0 * n))
    + {dlit(z)} * sqrt(p * (1.0 - p) / n + {dlit(z2)} / (4.0 * n * n)))
    / (1.0 + {dlit(z2)} / n) AS wilson_hi
FROM k
"""


def peak_concurrency(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    session_ttl_minutes: int = 30,
) -> DataFrame:
    """Peak concurrent sessions per calendar day — the capacity-planning
    number ("how many users were on AT ONCE at the worst moment").
    Each event opens/extends a TTL lease; concurrency is the classic
    interval-stabbing sweep: +1 at session start, −1 after session end,
    running max of the prefix sum.

    Scale shape: per-user session intervals come from the sessionize
    closed form (one user exchange); the sweep then partitions BY DAY
    (boundaries clipped at midnight, carry-in counted as a day-start
    offset), so no global single-partition pass exists — each day's
    sweep is independent and the whole op is two bounded exchanges.
    Exact integer-ms arithmetic.

    Returns (day, peak_concurrent, n_sessions_touching).
    """
    from timeseriesutils_spark.operators.sessions import sessionize

    ttl_ms = session_ttl_minutes * 60_000
    s = sessionize(events, user_col, ts_col, gap_minutes=session_ttl_minutes)
    iv = s.groupBy(user_col, "sess_n").agg(
        F.min("ts_ms").alias("_s"),
        (F.max("ts_ms") + F.lit(ttl_ms)).alias("_e"),
    )
    day_ms = 86_400_000
    # explode each interval into the days it touches; clip to day bounds
    days = iv.select(
        "_s",
        "_e",
        F.explode(
            F.sequence(
                F.floor(F.col("_s") / day_ms).cast("bigint"),
                F.floor((F.col("_e") - 1) / day_ms).cast("bigint"),
            )
        ).alias("_day"),
    )
    clipped = days.select(
        "_day",
        F.greatest(F.col("_s"), F.col("_day") * day_ms).alias("_cs"),
        F.least(F.col("_e"), (F.col("_day") + 1) * day_ms).alias("_ce"),
    )
    deltas = clipped.select(
        "_day", F.col("_cs").alias("_t"), F.lit(1).alias("_d")
    ).unionAll(
        clipped.select("_day", F.col("_ce").alias("_t"), F.lit(-1).alias("_d"))
    )
    agg = deltas.groupBy("_day", "_t").agg(F.sum("_d").alias("_d"))
    w = (
        Window.partitionBy("_day")
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = agg.withColumn("_run", F.sum("_d").over(w))
    # carry-in: sessions open at midnight start the day already counted
    # (their clipped start == day start, so they're in the sweep) — the
    # running max IS the day's peak
    per_day = run.groupBy("_day").agg(F.max("_run").alias("peak_concurrent"))
    touch = clipped.groupBy("_day").agg(
        F.count(F.lit(1)).alias("n_sessions_touching")
    )
    return per_day.join(touch, "_day").select(
        F.date_format(
            F.to_date(F.timestamp_millis(F.col("_day") * day_ms)), "yyyy-MM-dd"
        ).alias("day"),
        F.col("peak_concurrent").cast("bigint"),
        "n_sessions_touching",
    )


def peak_concurrency_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    session_ttl_minutes: int = 30,
) -> str:
    """DuckDB twin of :func:`peak_concurrency`."""
    ttl_ms = session_ttl_minutes * 60_000
    gap_ms = ttl_ms
    day_ms = 86_400_000
    return f"""
WITH m AS (
  SELECT {user_col} AS u, epoch_ms({ts_col}) AS ts_ms FROM {table}
),
b AS (
  SELECT *, CASE WHEN LAG(ts_ms) OVER (PARTITION BY u ORDER BY ts_ms) IS NULL
                  OR ts_ms - LAG(ts_ms) OVER (PARTITION BY u ORDER BY ts_ms)
                     > {gap_ms}
             THEN 1 ELSE 0 END AS brk
  FROM m
),
sx AS (
  SELECT *, SUM(brk) OVER (PARTITION BY u ORDER BY ts_ms
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_n
  FROM b
),
iv AS (
  SELECT u, sess_n, MIN(ts_ms) AS _s, MAX(ts_ms) + {ttl_ms} AS _e
  FROM sx GROUP BY u, sess_n
),
days AS (
  SELECT _s, _e, unnest(generate_series(
    CAST(FLOOR(_s / {day_ms}) AS BIGINT),
    CAST(FLOOR((_e - 1) / {day_ms}) AS BIGINT))) AS _day
  FROM iv
),
clipped AS (
  SELECT _day,
    GREATEST(_s, _day * {day_ms}) AS _cs,
    LEAST(_e, (_day + 1) * {day_ms}) AS _ce
  FROM days
),
deltas AS (
  SELECT _day, _cs AS _t, 1 AS _d FROM clipped
  UNION ALL
  SELECT _day, _ce AS _t, -1 AS _d FROM clipped
),
agg AS (SELECT _day, _t, SUM(_d) AS _d FROM deltas GROUP BY _day, _t),
run AS (
  SELECT _day, CAST(SUM(_d) OVER (PARTITION BY _day ORDER BY _t
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS _run
  FROM agg
),
pk AS (SELECT _day, MAX(_run) AS peak_concurrent FROM run GROUP BY _day),
tc AS (SELECT _day, COUNT(*) AS n_sessions_touching FROM clipped GROUP BY _day)
SELECT strftime(CAST(epoch_ms(pk._day * {day_ms}) AS DATE), '%Y-%m-%d') AS day,
  pk.peak_concurrent, tc.n_sessions_touching
FROM pk JOIN tc ON pk._day = tc._day
"""


# --------------------------------------------------------------------------
# CUPED variance-reduced A/B metric
# --------------------------------------------------------------------------


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    arm_col: str,
    scale: int = 4,
) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data,
    Deng et al. 2013 — public) variance reduction for an A/B metric:
    with a pre-experiment covariate X correlated with the metric Y,

        θ      = cov(Y, X) / var(X)        (pooled across arms)
        Ȳ_adj  = Ȳ_arm − θ·(X̄_arm − X̄)     (adjusted arm mean)
        vr     = 1 − var(Y − θX) / var(Y)  = ρ²(Y, X)

    — the industry-standard way to shrink experiment runtimes; pairs
    with welch_ttest/ab_test_report (run the t-test on the adjusted
    metric).  EVERYTHING derives from exact sufficient statistics:
    per-arm (n, ΣY, ΣX) and pooled (ΣXX, ΣYY, ΣXY) of 10^-scale
    quantized values through DECIMAL — ONE map-combinable aggregation,
    no second pass over rows, no per-row adjusted column needed.

    Returns one row per arm: (arm, n, mean_raw, mean_adj, theta,
    var_reduction); theta/adj NULL when var(X) = 0.
    """
    m = 10**scale
    qy = F.floor(F.col(metric_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    qx = F.floor(
        F.col(covariate_col).cast("double") * F.lit(m) + F.lit(0.5)
    ).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dec19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    d = df.filter(
        F.col(metric_col).isNotNull()
        & F.col(covariate_col).isNotNull()
        & F.col(arm_col).isNotNull()
    ).select(F.col(arm_col).alias("arm"), qy.alias("_y"), qx.alias("_x"))
    per = d.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
        F.sum(dec(F.col("_x"))).alias("_sx"),
        F.sum(dec19(F.col("_x")) * dec19(F.col("_x"))).alias("_sxx"),
        F.sum(dec19(F.col("_y")) * dec19(F.col("_y"))).alias("_syy"),
        F.sum(dec19(F.col("_x")) * dec19(F.col("_y"))).alias("_sxy"),
    )
    # pooled stats broadcast back onto the (tiny) per-arm frame via a
    # partition-wide window — the frame is |arms| rows, nothing moves
    wall = Window.partitionBy()
    tot = per.select(
        "arm", "n", "_sy", "_sx",
        F.sum("n").over(wall).alias("_N"),
        F.sum("_sy").over(wall).alias("_ty"),
        F.sum("_sx").over(wall).alias("_tx"),
        F.sum("_sxx").over(wall).alias("_txx"),
        F.sum("_syy").over(wall).alias("_tyy"),
        F.sum("_sxy").over(wall).alias("_txy"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    mf = F.lit(float(m))
    nn = F.col("_N").cast("double")
    # pooled moments in original units
    mx = s2d("_tx") / mf / nn
    my = s2d("_ty") / mf / nn
    varx = s2d("_txx") / (mf * mf) / nn - mx * mx
    vary = s2d("_tyy") / (mf * mf) / nn - my * my
    covxy = s2d("_txy") / (mf * mf) / nn - mx * my
    theta = F.when(varx > 0, covxy / varx)
    na = F.col("n").cast("double")
    mean_raw = s2d("_sy") / mf / na
    mean_x = s2d("_sx") / mf / na
    mean_adj = mean_raw - theta * (mean_x - mx)
    vr = F.when((varx > 0) & (vary > 0), covxy * covxy / (varx * vary))
    return tot.select(
        "arm",
        "n",
        mean_raw.alias("mean_raw"),
        mean_adj.alias("mean_adj"),
        theta.alias("theta"),
        vr.alias("var_reduction"),
    )


def cuped_adjust_sql(
    data_sql: str,
    metric_col: str,
    covariate_col: str,
    arm_col: str,
    scale: int = 4,
) -> str:
    """DuckDB twin of :func:`cuped_adjust` (same exact sums, same
    double tree)."""
    m = 10**scale
    mf = f"{float(m)!r}"
    qy = f"CAST(FLOOR(CAST({metric_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    qx = f"CAST(FLOOR(CAST({covariate_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(_N AS DOUBLE)"
    na = "CAST(n AS DOUBLE)"
    mx = f"({s2d('_tx')} / {mf} / {nn})"
    my = f"({s2d('_ty')} / {mf} / {nn})"
    varx = f"({s2d('_txx')} / ({mf} * {mf}) / {nn} - {mx} * {mx})"
    vary = f"({s2d('_tyy')} / ({mf} * {mf}) / {nn} - {my} * {my})"
    covxy = f"({s2d('_txy')} / ({mf} * {mf}) / {nn} - {mx} * {my})"
    theta = f"(CASE WHEN {varx} > 0 THEN {covxy} / {varx} END)"
    mean_raw = f"({s2d('_sy')} / {mf} / {na})"
    mean_x = f"({s2d('_sx')} / {mf} / {na})"
    mean_adj = f"({mean_raw} - {theta} * ({mean_x} - {mx}))"
    vr = (
        f"(CASE WHEN {varx} > 0 AND {vary} > 0"
        f" THEN {covxy} * {covxy} / ({varx} * {vary}) END)"
    )
    return f"""
WITH d AS (
  SELECT {arm_col} AS arm, {qy} AS _y, {qx} AS _x
  FROM ({data_sql})
  WHERE {metric_col} IS NOT NULL AND {covariate_col} IS NOT NULL
    AND {arm_col} IS NOT NULL
),
per AS (
  SELECT arm, COUNT(*) AS n,
    SUM(CAST(_y AS DECIMAL(38,0))) AS _sy,
    SUM(CAST(_x AS DECIMAL(38,0))) AS _sx,
    SUM(CAST(_x AS DECIMAL(19,0)) * CAST(_x AS DECIMAL(19,0))) AS _sxx,
    SUM(CAST(_y AS DECIMAL(19,0)) * CAST(_y AS DECIMAL(19,0))) AS _syy,
    SUM(CAST(_x AS DECIMAL(19,0)) * CAST(_y AS DECIMAL(19,0))) AS _sxy
  FROM d GROUP BY arm
),
tot AS (
  SELECT arm, n, _sy, _sx,
    SUM(n) OVER () AS _N,
    SUM(_sy) OVER () AS _ty,
    SUM(_sx) OVER () AS _tx,
    SUM(_sxx) OVER () AS _txx,
    SUM(_syy) OVER () AS _tyy,
    SUM(_sxy) OVER () AS _txy
  FROM per
)
SELECT arm, n,
  {mean_raw} AS mean_raw,
  {mean_adj} AS mean_adj,
  {theta} AS theta,
  {vr} AS var_reduction
FROM tot
"""


# --------------------------------------------------------------------------
# delta-method CI for a ratio metric
# --------------------------------------------------------------------------


def ratio_metric_ci(
    df: DataFrame,
    num_col: str,
    den_col: str,
    group_columns,
    scale: int = 4,
) -> DataFrame:
    """Per-group delta-method 95% CI for a ratio-of-means metric
    R = ΣY/ΣX (revenue per session, tokens per document, clicks per
    impression) — the correct interval when the DENOMINATOR is random
    too (a naive per-row-average CI is biased for ratio metrics; the
    delta method is the standard fix, e.g. Deng et al. KDD'18,
    public):

        Var(R) ≈ (1/n)·(var(Y) − 2R·cov(Y,X) + R²·var(X)) / X̄²

    All from ONE pass of exact quantized sufficient statistics (n, ΣY,
    ΣX, ΣYY, ΣXX, ΣXY) through DECIMAL — map-combinable, one exchange.

    Returns (groups…, n, ratio, se, ci_lo, ci_hi); NULL when X̄ = 0 or
    n < 2.
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    m = 10**scale
    qy = F.floor(F.col(num_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    qx = F.floor(F.col(den_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dec19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    d = df.filter(
        F.col(num_col).isNotNull() & F.col(den_col).isNotNull()
    ).select(*g, qy.alias("_y"), qx.alias("_x"))
    agg = d.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_y"))).alias("_sy"),
        F.sum(dec(F.col("_x"))).alias("_sx"),
        F.sum(dec19(F.col("_y")) * dec19(F.col("_y"))).alias("_syy"),
        F.sum(dec19(F.col("_x")) * dec19(F.col("_x"))).alias("_sxx"),
        F.sum(dec19(F.col("_x")) * dec19(F.col("_y"))).alias("_sxy"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    mf = F.lit(float(m))
    nn = F.col("n").cast("double")
    my = s2d("_sy") / mf / nn
    mx = s2d("_sx") / mf / nn
    vy = s2d("_syy") / (mf * mf) / nn - my * my
    vx = s2d("_sxx") / (mf * mf) / nn - mx * mx
    cxy = s2d("_sxy") / (mf * mf) / nn - mx * my
    r = my / mx
    varr = (vy - F.lit(2.0) * r * cxy + r * r * vx) / nn / (mx * mx)
    se = F.sqrt(F.greatest(varr, F.lit(0.0)))
    ok = (F.col("n") > 1) & (mx != 0)
    return agg.select(
        *g,
        "n",
        F.when(mx != 0, r).alias("ratio"),
        F.when(ok, se).alias("se"),
        F.when(ok, r - F.lit(1.96) * se).alias("ci_lo"),
        F.when(ok, r + F.lit(1.96) * se).alias("ci_hi"),
    )


def ratio_metric_ci_sql(
    data_sql: str,
    num_col: str,
    den_col: str,
    group_columns,
    scale: int = 4,
) -> str:
    """DuckDB twin of :func:`ratio_metric_ci` (same exact sums, same
    delta-method tree)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    mf = f"{float(m)!r}"
    qy = f"CAST(FLOOR(CAST({num_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    qx = f"CAST(FLOOR(CAST({den_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    my = f"({s2d('_sy')} / {mf} / {nn})"
    mx = f"({s2d('_sx')} / {mf} / {nn})"
    vy = f"({s2d('_syy')} / ({mf} * {mf}) / {nn} - {my} * {my})"
    vx = f"({s2d('_sxx')} / ({mf} * {mf}) / {nn} - {mx} * {mx})"
    cxy = f"({s2d('_sxy')} / ({mf} * {mf}) / {nn} - {mx} * {my})"
    r = f"({my} / {mx})"
    varr = f"(({vy} - 2.0 * {r} * {cxy} + {r} * {r} * {vx}) / {nn} / ({mx} * {mx}))"
    se = f"SQRT(GREATEST({varr}, 0.0))"
    ok = f"(n > 1 AND {mx} <> 0)"
    return f"""
WITH d AS (
  SELECT {gsel}, {qy} AS _y, {qx} AS _x
  FROM ({data_sql})
  WHERE {num_col} IS NOT NULL AND {den_col} IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_y AS DECIMAL(38,0))) AS _sy,
    SUM(CAST(_x AS DECIMAL(38,0))) AS _sx,
    SUM(CAST(_y AS DECIMAL(19,0)) * CAST(_y AS DECIMAL(19,0))) AS _syy,
    SUM(CAST(_x AS DECIMAL(19,0)) * CAST(_x AS DECIMAL(19,0))) AS _sxx,
    SUM(CAST(_x AS DECIMAL(19,0)) * CAST(_y AS DECIMAL(19,0))) AS _sxy
  FROM d GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN {mx} <> 0 THEN {r} END AS ratio,
  CASE WHEN {ok} THEN {se} END AS se,
  CASE WHEN {ok} THEN {r} - 1.96 * {se} END AS ci_lo,
  CASE WHEN {ok} THEN {r} + 1.96 * {se} END AS ci_hi
FROM agg
"""


def lorenz_curve(
    df: DataFrame,
    value_col: str,
    group_columns,
    n_buckets: int = 10,
    scale: int = 2,
) -> DataFrame:
    """Lorenz curve at population-decile cutoffs per group — the
    concentration CURVE behind gini_index's single number ("the bottom
    70% of customers carry what share of revenue?"): rows sort by
    value ascending, bucket d covers the first ⌈n·d/B⌉ rows (the
    gains_curve whole-tie-block ceil contract — no ntile, engines
    can't disagree on tie assignment), and the curve reports the
    cumulative VALUE share against the population share.

    Exact path: quantized-value count collapse → one cumulative window
    over collapsed rows → B-literal bucket fan-out; cumulative value
    sums are exact int64 through DECIMAL, the share is one final
    double division.  equality_gap = d/B − share ≥ 0 measures the
    bow (integrates to gini/2).

    Returns (groups…, bucket, pop_frac, n_included, cum_share,
    equality_gap).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(F.col(value_col).isNotNull()).select(*g, q.alias("_q"))
    per = d.groupBy(*g, "_q").agg(F.count(F.lit(1)).alias("_r"))
    w = Window.partitionBy(*g).orderBy(F.col("_q"))
    wg = Window.partitionBy(*g)
    cum = per.select(
        *g,
        F.sum("_r").over(w).alias("_cr"),
        F.sum((F.col("_q") * F.col("_r")).cast("decimal(38,0)")).over(w)
        .alias("_cv"),
        F.sum("_r").over(wg).alias("_n"),
        F.sum((F.col("_q") * F.col("_r")).cast("decimal(38,0)")).over(wg)
        .alias("_tv"),
    )
    buckets = []
    for b in range(1, n_buckets + 1):
        cut = F.expr(
            f"CAST((_n * {b} + {n_buckets - 1}) div {n_buckets} AS BIGINT)"
        )
        inc = F.col("_cr") <= cut
        buckets.append(
            F.struct(
                F.lit(b).alias("bucket"),
                F.max(F.when(inc, F.col("_cr"))).alias("n_included"),
                F.max(F.when(inc, F.col("_cv"))).alias("v_included"),
            )
        )
    agg = cum.groupBy(*g).agg(
        F.max("_n").alias("_n"),
        F.max("_tv").alias("_tv"),
        F.array(*buckets).alias("_bs"),
    )
    ex = agg.select(*g, "_n", "_tv", F.explode("_bs").alias("_s")).select(
        *g,
        "_n",
        "_tv",
        F.col("_s.bucket").alias("bucket"),
        F.coalesce(F.col("_s.n_included"), F.lit(0)).alias("n_included"),
        F.coalesce(F.col("_s.v_included"), F.lit(0).cast("decimal(38,0)"))
        .alias("_vi"),
    )
    share = F.when(
        F.col("_tv").cast("string").cast("double") != 0,
        F.col("_vi").cast("string").cast("double")
        / F.col("_tv").cast("string").cast("double"),
    )
    pf = F.col("bucket").cast("double") / F.lit(float(n_buckets))
    return ex.select(
        *g,
        "bucket",
        pf.alias("pop_frac"),
        "n_included",
        share.alias("cum_share"),
        (pf - share).alias("equality_gap"),
    )


def lorenz_curve_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    n_buckets: int = 10,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`lorenz_curve` (same ceil cutoffs, same
    DECIMAL value sums)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    rows = " UNION ALL ".join(
        f"SELECT {gsel}, _n, _tv, {b} AS bucket, "
        f"COALESCE(MAX(CASE WHEN _cr <= (_n * {b} + {n_buckets - 1})"
        f" // {n_buckets} THEN _cr END), 0) AS n_included, "
        f"COALESCE(MAX(CASE WHEN _cr <= (_n * {b} + {n_buckets - 1})"
        f" // {n_buckets} THEN _cv END), 0) AS _vi "
        f"FROM cum GROUP BY {gsel}, _n, _tv"
        for b in range(1, n_buckets + 1)
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q FROM ({data_sql})
  WHERE {value_col} IS NOT NULL
),
per AS (
  SELECT {gsel}, _q, COUNT(*) AS _r FROM d GROUP BY {gsel}, _q
),
cum AS (
  SELECT {gsel},
    CAST(SUM(_r) OVER w AS BIGINT) AS _cr,
    CAST(SUM(CAST(_q * _r AS DECIMAL(38,0))) OVER w AS DECIMAL(38,0))
      AS _cv,
    CAST(SUM(_r) OVER wg AS BIGINT) AS _n,
    CAST(SUM(CAST(_q * _r AS DECIMAL(38,0))) OVER wg AS DECIMAL(38,0))
      AS _tv
  FROM per
  WINDOW w AS (PARTITION BY {gsel} ORDER BY _q
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
   wg AS (PARTITION BY {gsel})
),
fan AS ({rows})
SELECT {gsel}, bucket,
  CAST(bucket AS DOUBLE) / {float(n_buckets)!r} AS pop_frac,
  n_included,
  CASE WHEN {s2d('_tv')} <> 0 THEN {s2d('_vi')} / {s2d('_tv')} END
    AS cum_share,
  (CAST(bucket AS DOUBLE) / {float(n_buckets)!r}
    - CASE WHEN {s2d('_tv')} <> 0 THEN {s2d('_vi')} / {s2d('_tv')} END)
    AS equality_gap
FROM fan
"""


def hhi_concentration(
    df: DataFrame,
    key_col: str,
    group_columns,
) -> DataFrame:
    """Herfindahl–Hirschman concentration of a categorical key per
    group — the one-number "how dominated is this corpus/market by a
    few sources?" gauge (1/K = perfectly even, 1 = single source;
    the antitrust thresholds 0.15/0.25 transfer surprisingly well to
    training-data source mixes):

        HHI = Σ_k (n_k/N)²  =  (Σ_k n_k²) / N²

    — the numerator is an EXACT integer (one count collapse, one
    squared-count sum through DECIMAL), so the only float op is the
    final division.  ``hhi_norm`` rescales to [0,1] via
    (HHI − 1/K)/(1 − 1/K); single-key groups report 1.

    Returns (groups…, n, n_keys, hhi, hhi_norm).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    per = df.filter(F.col(key_col).isNotNull()).groupBy(*g, key_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    agg = per.groupBy(*g).agg(
        F.sum("_c").alias("n"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("_c") * F.col("_c")).cast("decimal(38,0)")).alias("_sq"),
    )
    nn = F.col("n").cast("double")
    hhi = F.col("_sq").cast("string").cast("double") / (nn * nn)
    kk = F.col("n_keys").cast("double")
    norm = F.when(
        F.col("n_keys") > 1,
        (hhi - F.lit(1.0) / kk) / (F.lit(1.0) - F.lit(1.0) / kk),
    ).otherwise(F.lit(1.0))
    return agg.select(*g, "n", "n_keys", hhi.alias("hhi"),
                      norm.alias("hhi_norm"))


def hhi_concentration_sql(
    data_sql: str,
    key_col: str,
    group_columns,
) -> str:
    """DuckDB twin of :func:`hhi_concentration`."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    hhi = f"({s2d('_sq')} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"
    kk = "CAST(n_keys AS DOUBLE)"
    return f"""
WITH per AS (
  SELECT {gsel}, {key_col}, COUNT(*) AS _c
  FROM ({data_sql}) WHERE {key_col} IS NOT NULL
  GROUP BY {gsel}, {key_col}
),
agg AS (
  SELECT {gsel}, CAST(SUM(_c) AS BIGINT) AS n,
    COUNT(*) AS n_keys,
    CAST(SUM(CAST(_c * _c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS _sq
  FROM per GROUP BY {gsel}
)
SELECT {gsel}, n, n_keys, {hhi} AS hhi,
  CASE WHEN n_keys > 1
    THEN ({hhi} - 1.0 / {kk}) / (1.0 - 1.0 / {kk})
    ELSE 1.0 END AS hhi_norm
FROM agg
"""


def theil_index(
    df: DataFrame,
    value_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Theil T inequality index per group over positive values — the
    decomposable member of the inequality family (gini_index: rank-
    based single number; lorenz_curve: the full curve; Theil:
    entropy-based, and the only one whose total splits exactly into
    within-group + between-group terms, which is why mix audits use
    it):

        T = (1/N) Σ_i (x_i/μ)·ln(x_i/μ),   μ = exact mean

    Exactness: values quantize to int64 (μ is exact-sum/N in the
    double domain, one shared tree); each row's ln is 1e-9-quantized,
    each row TERM re-quantizes at 1e-9 and sums as exact integers —
    the unordered-sum discipline.  Zero/negative rows are excluded
    (ln domain), reported in ``n_dropped``.

    Returns (groups…, n, n_dropped, mean, theil_t).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    base = df.filter(F.col(value_col).isNotNull()).select(
        *g, q.alias("_q")
    )
    d = base.withColumn("_pos", F.col("_q") > 0)
    tot = d.groupBy(*g).agg(
        F.sum(F.when(F.col("_pos"), F.col("_q")).otherwise(F.lit(0)))
        .cast("decimal(38,0)").alias("_s"),
        F.sum(F.col("_pos").cast("bigint")).alias("n"),
        F.sum((~F.col("_pos")).cast("bigint")).alias("n_dropped"),
    )
    j = d.filter(F.col("_pos")).join(F.broadcast(tot), on=g)
    mu = F.col("_s").cast("string").cast("double") / F.col("n").cast(
        "double"
    )
    ratio = F.col("_q").cast("double") / mu
    q9 = F.lit(1.0e9)
    lnq = F.floor(F.log(ratio) * q9 + F.lit(0.5)) / q9
    term = F.floor(ratio * lnq * q9 + F.lit(0.5)).cast("decimal(38,0)")
    agg = j.groupBy(*g).agg(
        F.max("n").alias("n"),
        F.max("n_dropped").alias("n_dropped"),
        F.max("_s").alias("_s"),
        F.sum(term).alias("_t"),
    )
    mu2 = F.col("_s").cast("string").cast("double") / F.col("n").cast(
        "double"
    )
    t = (
        F.col("_t").cast("string").cast("double") / F.lit(1.0e9)
        / F.col("n").cast("double")
    )
    return agg.select(
        *g,
        "n",
        "n_dropped",
        (mu2 / F.lit(float(m))).alias("mean"),
        t.alias("theil_t"),
    )


def theil_index_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`theil_index` (same quantize points, same
    integer term sum)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    mu = f"({s2d('_s')} / CAST(n AS DOUBLE))"
    ratio = f"(CAST(_q AS DOUBLE) / {mu})"
    lnq = f"(FLOOR(LN({ratio}) * 1000000000.0 + 0.5) / 1000000000.0)"
    term = (
        f"CAST(FLOOR({ratio} * {lnq} * 1000000000.0 + 0.5)"
        " AS DECIMAL(38,0))"
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q FROM ({data_sql})
  WHERE {value_col} IS NOT NULL
),
tot AS (
  SELECT {gsel},
    CAST(SUM(CASE WHEN _q > 0 THEN _q ELSE 0 END) AS DECIMAL(38,0)) AS _s,
    CAST(SUM(CAST(_q > 0 AS BIGINT)) AS BIGINT) AS n,
    CAST(SUM(CAST(NOT _q > 0 AS BIGINT)) AS BIGINT) AS n_dropped
  FROM d GROUP BY {gsel}
),
agg AS (
  SELECT {gsel}, MAX(n) AS n, MAX(n_dropped) AS n_dropped,
    MAX(_s) AS _s,
    CAST(SUM({term}) AS DECIMAL(38,0)) AS _t
  FROM d JOIN tot USING ({gsel})
  WHERE _q > 0
  GROUP BY {gsel}
)
SELECT {gsel}, n, n_dropped,
  ({s2d('_s')} / CAST(n AS DOUBLE)) / {float(m)!r} AS mean,
  {s2d('_t')} / 1000000000.0 / CAST(n AS DOUBLE) AS theil_t
FROM agg
"""


def bayes_ab(
    df: DataFrame,
    arm_col: str,
    level_a: str,
    level_b: str,
    success_col: str,
    group_columns,
    prior_alpha: int = 1,
    prior_beta: int = 1,
    decision_threshold: float = 0.95,
) -> DataFrame:
    """EXACT Bayesian A/B conversion comparison: with Beta(α,β)
    posteriors from integer success/failure counts (conjugate to the
    Bernoulli conversions), the probability that B's true rate beats
    A's has a closed form (Cook 2005, the standard Beta inequality):

        P(p_B > p_A) = Σ_{i=0}^{α_B−1} h(i),
        h(0) = Π_{j=0}^{β_B−1} (β_A+j)/(α_A+β_A+j),
        h(i+1)/h(i) = (α_A+i)(β_B+i) / ((α_A+β_A+β_B+i)(i+1))

    — no incomplete-beta routine, no Monte Carlo: every factor is a
    RATIO OF INTEGERS, so the whole probability is two left folds of
    exact rational factors (one product for h(0), one running-sum ×
    running-product recurrence for the series).  Both engines fold in
    the identical ascending order (Spark ``aggregate`` over
    ``sequence``, DuckDB ``list_reduce`` — the dtw_pattern precedent),
    and the arithmetic is mul/div only, so the result is bit-identical
    without any quantization.

    The frequentist siblings ab_test_report / wilson_daily answer
    "is the difference significant"; this answers the decision-maker's
    actual question "what is the probability B is better", exactly.

    Scale shape: one count aggregation (map-combinable) + one
    one-row-per-group fold whose length is α_B = successes_B + prior —
    driver-free, join-free; the fold cost lives on |groups| rows.

    Returns (groups…, n_a, conv_a, n_b, conv_b, rate_a, rate_b,
    expected_lift, prob_b_beats_a, decide_b).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    pa, pb = int(prior_alpha), int(prior_beta)
    if pa < 1 or pb < 1:
        # pa/pb = 0 with zero failures (successes) makes the fold's
        # F.sequence(0, -1) DESCENDING, not empty -> silently wrong
        raise ValueError("prior_alpha and prior_beta must be >= 1")
    arm = F.when(F.col(arm_col) == F.lit(level_a), 1).when(
        F.col(arm_col) == F.lit(level_b), 2
    )
    s = F.col(success_col).cast("boolean").cast("bigint")
    d = df.select(*g, arm.alias("_arm"), s.alias("_s")).filter(
        F.col("_arm").isNotNull() & F.col("_s").isNotNull()
    )
    per = d.groupBy(*g).agg(
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("_arm") == 1, F.col("_s")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("_arm") == 2, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("_arm") == 2, F.col("_s")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    a1 = (F.col("conv_a") + F.lit(pa)).cast("double")
    b1 = (F.col("n_a") - F.col("conv_a") + F.lit(pb)).cast("double")
    a2 = (F.col("conv_b") + F.lit(pa)).cast("bigint")
    b2 = (F.col("n_b") - F.col("conv_b") + F.lit(pb)).cast("bigint")
    a2d = a2.cast("double")
    b2d = b2.cast("double")
    h0 = F.aggregate(
        F.sequence(F.lit(0).cast("bigint"), b2 - 1),
        F.lit(1.0),
        lambda acc, j: acc
        * ((b1 + j.cast("double")) / (a1 + b1 + j.cast("double"))),
    )
    # fold state [p_acc, term]; term starts at h(0)
    fold = F.aggregate(
        F.sequence(F.lit(0).cast("bigint"), a2 - 1),
        F.array(F.lit(0.0), h0),
        lambda acc, i: F.array(
            F.element_at(acc, 1) + F.element_at(acc, 2),
            F.element_at(acc, 2)
            * (
                (a1 + i.cast("double"))
                * (b2d + i.cast("double"))
                / (
                    (a1 + b1 + b2d + i.cast("double"))
                    * (F.lit(1.0) + i.cast("double"))
                )
            ),
        ),
    )
    prob = F.element_at(fold, 1)
    rate_a = a1 / (a1 + b1)
    rate_b = a2d / (a2d + b2d)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    prob = F.when(ok, prob)
    return per.select(
        *g,
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.when(ok, rate_a).alias("rate_a"),
        F.when(ok, rate_b).alias("rate_b"),
        F.when(ok, rate_b - rate_a).alias("expected_lift"),
        prob.alias("prob_b_beats_a"),
        (prob > F.lit(float(decision_threshold))).alias("decide_b"),
    )


def bayes_ab_sql(
    data_sql: str,
    arm_col: str,
    level_a: str,
    level_b: str,
    success_col: str,
    group_columns,
    prior_alpha: int = 1,
    prior_beta: int = 1,
    decision_threshold: float = 0.95,
) -> str:
    """DuckDB twin of :func:`bayes_ab` (same two ascending rational
    folds; single-element-list elements, list accumulator — the
    dtw_pattern list_reduce pattern)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    pa, pb = int(prior_alpha), int(prior_beta)
    if pa < 1 or pb < 1:
        # pa/pb = 0 with zero failures (successes) makes the fold's
        # F.sequence(0, -1) DESCENDING, not empty -> silently wrong
        raise ValueError("prior_alpha and prior_beta must be >= 1")
    a1 = "CAST(conv_a + {pa} AS DOUBLE)".format(pa=pa)
    b1 = f"CAST(n_a - conv_a + {pb} AS DOUBLE)"
    a2 = f"CAST(conv_b + {pa} AS BIGINT)"
    b2 = f"CAST(n_b - conv_b + {pb} AS BIGINT)"
    h0 = (
        f"list_reduce(list_prepend(CAST(1.0 AS DOUBLE),"
        f" [CAST(j AS DOUBLE) FOR j IN range(0, {b2})]),"
        f" (acc, j) -> acc * (({b1} + j) / ({a1} + {b1} + j)))"
    )
    step = (
        f"[acc[1] + acc[2],"
        f" acc[2] * (({a1} + e[1]) * (CAST({b2} AS DOUBLE) + e[1])"
        f" / (({a1} + {b1} + CAST({b2} AS DOUBLE) + e[1]) * (1.0 + e[1])))]"
    )
    fold = (
        f"list_reduce(list_prepend([CAST(0.0 AS DOUBLE), {h0}],"
        f" [[CAST(i AS DOUBLE)] FOR i IN range(0, {a2})]),"
        f" (acc, e) -> {step})"
    )
    prob = f"({fold})[1]"
    rate_a = f"({a1} / ({a1} + {b1}))"
    rate_b = f"(CAST({a2} AS DOUBLE) / (CAST({a2} AS DOUBLE) + CAST({b2} AS DOUBLE)))"
    ok = "(n_a > 0 AND n_b > 0)"
    return f"""
WITH d AS (
  SELECT {gsel},
    CASE WHEN {arm_col} = {level_a!r} THEN 1
         WHEN {arm_col} = {level_b!r} THEN 2 END AS _arm,
    CAST(CAST({success_col} AS BOOLEAN) AS BIGINT) AS _s
  FROM ({data_sql})
),
per AS (
  SELECT {gsel},
    CAST(SUM(CASE WHEN _arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN _arm = 1 THEN _s ELSE 0 END) AS BIGINT) AS conv_a,
    CAST(SUM(CASE WHEN _arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN _arm = 2 THEN _s ELSE 0 END) AS BIGINT) AS conv_b
  FROM d WHERE _arm IS NOT NULL AND _s IS NOT NULL
  GROUP BY {gsel}
)
SELECT {gsel}, n_a, conv_a, n_b, conv_b,
  CASE WHEN {ok} THEN {rate_a} END AS rate_a,
  CASE WHEN {ok} THEN {rate_b} END AS rate_b,
  CASE WHEN {ok} THEN {rate_b} - {rate_a} END AS expected_lift,
  CASE WHEN {ok} THEN {prob} END AS prob_b_beats_a,
  CASE WHEN {ok} THEN {prob} > {decision_threshold!r} END AS decide_b
FROM per
"""


# O'Brien–Fleming-type group-sequential critical constants z*(K) for
# two-sided alpha = 0.05 at K equally-spaced looks (the classical OBF
# table — Pocock 1977 / O'Brien & Fleming 1979; boundary at look k is
# z*(K)·sqrt(K/k)).  Public textbook values.
_OBF_CONST = {2: 1.977, 3: 2.004, 4: 2.024, 5: 2.040}


def sequential_ab(
    df: DataFrame,
    arm_col: str,
    level_a: str,
    level_b: str,
    success_col: str,
    look_col: str,
    n_looks: int = 5,
) -> DataFrame:
    """Group-sequential A/B monitoring with O'Brien–Fleming boundaries:
    the peeking-correct way to watch an experiment — the fixed-horizon
    z-test (ab_test_report) is only valid at ONE pre-registered look,
    and re-testing weekly inflates false positives several-fold; OBF
    spends almost no alpha early (boundary z*(K)·√(K/k) is very strict
    at look 1) and converges to ~1.96 at the final look:

        z_k = (p̂_b − p̂_a) / √(p̂(1−p̂)(1/n_a + 1/n_b))   (pooled, look k)
        stop at look k  ⇔  |z_k| > z*(K)·√(K/k)

    ``look_col`` is the unit's 1-based look index (e.g. the week its
    exposure started); look k aggregates every unit with index ≤ k.
    Exactness: per-look counts are K conditional integer sums in ONE
    map-combinable aggregation (no per-look scans), the z tree is
    shared doubles, and the boundaries are compile-time literals — the
    crossed flags are bit-identical across engines.

    Returns one row per look: (look, n_a, n_b, conv_a, conv_b, z,
    boundary, crossed).
    """
    K = int(n_looks)
    if K not in _OBF_CONST:
        raise ValueError(f"n_looks must be one of {sorted(_OBF_CONST)}")
    c = _OBF_CONST[K]
    arm = F.when(F.col(arm_col) == F.lit(level_a), 1).when(
        F.col(arm_col) == F.lit(level_b), 2
    )
    s = F.col(success_col).cast("boolean").cast("bigint")
    lk = F.col(look_col).cast("bigint")
    d = df.select(arm.alias("_arm"), s.alias("_s"), lk.alias("_lk")).filter(
        F.col("_arm").isNotNull() & F.col("_s").isNotNull()
        & F.col("_lk").isNotNull()
    )
    aggs = []
    for k in range(1, K + 1):
        ink = F.col("_lk") <= k
        aggs += [
            F.sum(F.when(ink & (F.col("_arm") == 1), 1).otherwise(0)).alias(
                f"_na{k}"
            ),
            F.sum(F.when(ink & (F.col("_arm") == 2), 1).otherwise(0)).alias(
                f"_nb{k}"
            ),
            F.sum(
                F.when(ink & (F.col("_arm") == 1), F.col("_s")).otherwise(0)
            ).alias(f"_ca{k}"),
            F.sum(
                F.when(ink & (F.col("_arm") == 2), F.col("_s")).otherwise(0)
            ).alias(f"_cb{k}"),
        ]
    agg = d.groupBy().agg(*aggs)
    looks = []
    for k in range(1, K + 1):
        na = F.col(f"_na{k}").cast("double")
        nb = F.col(f"_nb{k}").cast("double")
        ca = F.col(f"_ca{k}").cast("double")
        cb = F.col(f"_cb{k}").cast("double")
        p = (ca + cb) / (na + nb)
        se = F.sqrt(p * (F.lit(1.0) - p) * (F.lit(1.0) / na + F.lit(1.0) / nb))
        z = (cb / nb - ca / na) / se
        bound = F.lit(c) * F.sqrt(F.lit(float(K)) / F.lit(float(k)))
        ok = (
            (F.col(f"_na{k}") > 0)
            & (F.col(f"_nb{k}") > 0)
            & (F.col(f"_ca{k}") + F.col(f"_cb{k}") > 0)
            & (
                F.col(f"_ca{k}") + F.col(f"_cb{k}")
                < F.col(f"_na{k}") + F.col(f"_nb{k}")
            )
        )
        looks.append(
            F.struct(
                F.lit(k).cast("bigint").alias("look"),
                F.col(f"_na{k}").alias("n_a"),
                F.col(f"_nb{k}").alias("n_b"),
                F.col(f"_ca{k}").alias("conv_a"),
                F.col(f"_cb{k}").alias("conv_b"),
                F.when(ok, z).alias("z"),
                bound.alias("boundary"),
                F.when(ok, F.abs(z) > bound).alias("crossed"),
            )
        )
    return agg.select(F.explode(F.array(*looks)).alias("_l")).select("_l.*")


def sequential_ab_sql(
    data_sql: str,
    arm_col: str,
    level_a: str,
    level_b: str,
    success_col: str,
    look_col: str,
    n_looks: int = 5,
) -> str:
    """DuckDB twin of :func:`sequential_ab` (same one-pass conditional
    sums, same literal boundaries)."""
    from timeseriesutils_spark.functions.exact import dlit

    K = int(n_looks)
    if K not in _OBF_CONST:
        raise ValueError(f"n_looks must be one of {sorted(_OBF_CONST)}")
    c = _OBF_CONST[K]
    aggs = []
    for k in range(1, K + 1):
        aggs += [
            f"CAST(SUM(CASE WHEN _lk <= {k} AND _arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS _na{k}",
            f"CAST(SUM(CASE WHEN _lk <= {k} AND _arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS _nb{k}",
            f"CAST(SUM(CASE WHEN _lk <= {k} AND _arm = 1 THEN _s ELSE 0 END) AS BIGINT) AS _ca{k}",
            f"CAST(SUM(CASE WHEN _lk <= {k} AND _arm = 2 THEN _s ELSE 0 END) AS BIGINT) AS _cb{k}",
        ]
    rows = []
    for k in range(1, K + 1):
        na = f"CAST(_na{k} AS DOUBLE)"
        nb = f"CAST(_nb{k} AS DOUBLE)"
        ca = f"CAST(_ca{k} AS DOUBLE)"
        cb = f"CAST(_cb{k} AS DOUBLE)"
        p = f"(({ca} + {cb}) / ({na} + {nb}))"
        se = f"SQRT({p} * (1.0 - {p}) * (1.0 / {na} + 1.0 / {nb}))"
        z = f"(({cb} / {nb} - {ca} / {na}) / {se})"
        bound = f"({dlit(c)} * SQRT({dlit(float(K))} / {dlit(float(k))}))"
        ok = (
            f"(_na{k} > 0 AND _nb{k} > 0 AND _ca{k} + _cb{k} > 0"
            f" AND _ca{k} + _cb{k} < _na{k} + _nb{k})"
        )
        rows.append(
            f"SELECT CAST({k} AS BIGINT) AS look, _na{k} AS n_a,"
            f" _nb{k} AS n_b, _ca{k} AS conv_a, _cb{k} AS conv_b,"
            f" CASE WHEN {ok} THEN {z} END AS z,"
            f" {bound} AS boundary,"
            f" CASE WHEN {ok} THEN ABS({z}) > {bound} END AS crossed"
            f" FROM agg"
        )
    union = " UNION ALL ".join(rows)
    return f"""
WITH d AS (
  SELECT CASE WHEN {arm_col} = {level_a!r} THEN 1
              WHEN {arm_col} = {level_b!r} THEN 2 END AS _arm,
    CAST(CAST({success_col} AS BOOLEAN) AS BIGINT) AS _s,
    CAST({look_col} AS BIGINT) AS _lk
  FROM ({data_sql})
),
agg AS (
  SELECT {', '.join(aggs)}
  FROM d
  WHERE _arm IS NOT NULL AND _s IS NOT NULL AND _lk IS NOT NULL
)
{union}
"""


def cmh_test(
    df: DataFrame,
    arm_col: str,
    level_a: str,
    level_b: str,
    success_col: str,
    stratum_col: str,
    term_scale: int = 9,
) -> DataFrame:
    """Cochran–Mantel–Haenszel stratified 2×2 analysis: the
    Simpson's-paradox-proof two-proportion comparison — when exposure
    mix differs across strata (time, geography, segment), the pooled
    z-test (ab_test_report) can reverse sign; CMH tests the common
    effect WITHIN strata and pools only the evidence:

        CMH = (|Σ(aᵢ − Eᵢ)| − ½)² / ΣVᵢ            (χ²₁, continuity-corrected)
        Eᵢ = n₁ᵢm₁ᵢ/nᵢ,  Vᵢ = n₁ᵢn₀ᵢm₁ᵢm₀ᵢ/(nᵢ²(nᵢ−1))
        OR_MH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ)            (Mantel–Haenszel 1959)

    with the Robins–Breslow–Greenland variance for the OR's CI (the
    sparse-strata-safe estimator).  Exactness: per-stratum cell counts
    are exact ints from ONE conditional aggregation; every per-stratum
    rational (Eᵢ, Vᵢ, the six RBG component terms) is floor-quantized
    at 10^-term_scale and summed in DECIMAL — cross-stratum order
    free; the final statistic/CI tree is shared doubles, p via the
    engine kernel, ln for the CI floor-quantized at 1e-9.

    Scale shape: one groupBy(stratum) count collapse (map-combinable),
    one stratum-level projection, one global reduce — three tiers,
    each output rows ≤ strata.

    Returns one row: (n_strata, n, cmh_stat, p_value, or_mh, or_lo95,
    or_hi95, reject_05).
    """
    from timeseriesutils_spark.operators.nonparam import (
        two_sided_p_expr,
    )

    tm = 10**term_scale
    arm = F.when(F.col(arm_col) == F.lit(level_a), 1).when(
        F.col(arm_col) == F.lit(level_b), 2
    )
    s = F.col(success_col).cast("boolean").cast("bigint")
    d = df.select(
        F.col(stratum_col).alias("_st"), arm.alias("_arm"), s.alias("_s")
    ).filter(F.col("_arm").isNotNull() & F.col("_s").isNotNull())
    per = d.groupBy("_st").agg(
        F.sum(F.when(F.col("_arm") == 1, F.col("_s")).otherwise(0)).alias("_a"),
        F.sum(
            F.when(F.col("_arm") == 1, 1 - F.col("_s")).otherwise(0)
        ).alias("_b"),
        F.sum(F.when(F.col("_arm") == 2, F.col("_s")).otherwise(0)).alias("_c"),
        F.sum(
            F.when(F.col("_arm") == 2, 1 - F.col("_s")).otherwise(0)
        ).alias("_d"),
    )
    a = F.col("_a").cast("double")
    b = F.col("_b").cast("double")
    c = F.col("_c").cast("double")
    dd = F.col("_d").cast("double")
    n = a + b + c + dd
    n1 = a + b
    n0 = c + dd
    m1 = a + c
    m0 = b + dd
    q9 = lambda x: F.floor(x * F.lit(float(tm)) + F.lit(0.5)).cast(  # noqa: E731
        "decimal(38,0)"
    )
    # per-stratum quantized rationals (strata with n < 2 contribute 0)
    okst = n > 1
    terms = per.select(
        (F.col("_a") + F.col("_b") + F.col("_c") + F.col("_d")).alias("_n"),
        q9(F.when(okst, a - n1 * m1 / n).otherwise(F.lit(0.0))).alias("_dev"),
        q9(
            F.when(okst, n1 * n0 * m1 * m0 / (n * n * (n - 1.0))).otherwise(
                F.lit(0.0)
            )
        ).alias("_v"),
        q9(F.when(okst, a * dd / n).otherwise(F.lit(0.0))).alias("_r"),
        q9(F.when(okst, b * c / n).otherwise(F.lit(0.0))).alias("_s2"),
        q9(
            F.when(okst, (a + dd) / n * (a * dd / n)).otherwise(F.lit(0.0))
        ).alias("_p1"),
        q9(
            F.when(
                okst,
                (a + dd) / n * (b * c / n) + (b + c) / n * (a * dd / n),
            ).otherwise(F.lit(0.0))
        ).alias("_p2"),
        q9(
            F.when(okst, (b + c) / n * (b * c / n)).otherwise(F.lit(0.0))
        ).alias("_p3"),
    )
    agg = terms.groupBy().agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("_n").alias("n"),
        F.sum("_dev").alias("_sdev"),
        F.sum("_v").alias("_sv"),
        F.sum("_r").alias("_sr"),
        F.sum("_s2").alias("_ss"),
        F.sum("_p1").alias("_sp1"),
        F.sum("_p2").alias("_sp2"),
        F.sum("_p3").alias("_sp3"),
    )
    s2d = lambda col: F.col(col).cast("string").cast("double")  # noqa: E731
    tmf = F.lit(float(tm))
    sdev = s2d("_sdev") / tmf
    sv = s2d("_sv") / tmf
    sr = s2d("_sr") / tmf
    ss = s2d("_ss") / tmf
    cmh = (F.abs(sdev) - F.lit(0.5)) * (F.abs(sdev) - F.lit(0.5)) / sv
    z = F.sqrt(cmh)
    p = two_sided_p_expr(z)
    or_mh = sr / ss
    # RBG variance of ln OR_MH
    var_ln = (
        s2d("_sp1") / tmf / (F.lit(2.0) * sr * sr)
        + s2d("_sp2") / tmf / (F.lit(2.0) * sr * ss)
        + s2d("_sp3") / tmf / (F.lit(2.0) * ss * ss)
    )
    pq = F.lit(1.0e9)
    ln_or = F.floor(F.log(or_mh) * pq + F.lit(0.5)) / pq
    half = F.lit(1.959963984540054) * F.sqrt(var_ln)
    lo = F.exp(ln_or - half)
    hi = F.exp(ln_or + half)
    q9d = lambda x: F.floor(x * pq + F.lit(0.5)) / pq  # noqa: E731
    ok = (sv > 0) & (sr > 0) & (ss > 0)
    return agg.select(
        "n_strata",
        "n",
        F.when(sv > 0, cmh).alias("cmh_stat"),
        F.when(sv > 0, p).alias("p_value"),
        F.when(ok, or_mh).alias("or_mh"),
        F.when(ok & (var_ln > 0), q9d(lo)).alias("or_lo95"),
        F.when(ok & (var_ln > 0), q9d(hi)).alias("or_hi95"),
        F.when(sv > 0, p < F.lit(0.05)).alias("reject_05"),
    )


def cmh_test_sql(
    data_sql: str,
    arm_col: str,
    level_a: str,
    level_b: str,
    success_col: str,
    stratum_col: str,
    term_scale: int = 9,
) -> str:
    """DuckDB twin of :func:`cmh_test` (same quantized per-stratum
    rationals, same RBG tree)."""
    from timeseriesutils_spark.functions.exact import dlit
    from timeseriesutils_spark.operators.nonparam import two_sided_p_sql

    tm = 10**term_scale
    tmf = dlit(float(tm))
    a, b, c, dd = (
        "CAST(_a AS DOUBLE)",
        "CAST(_b AS DOUBLE)",
        "CAST(_c AS DOUBLE)",
        "CAST(_d AS DOUBLE)",
    )
    n = f"({a} + {b} + {c} + {dd})"
    n1 = f"({a} + {b})"
    n0 = f"({c} + {dd})"
    m1 = f"({a} + {c})"
    m0 = f"({b} + {dd})"
    q9 = lambda x: (  # noqa: E731
        f"CAST(FLOOR(({x}) * {tmf} + 0.5) AS DECIMAL(38,0))"
    )
    okst = f"({n} > 1.0)"
    z0 = "CAST(0.0 AS DOUBLE)"
    s2d = lambda col: f"CAST(CAST({col} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    sdev = f"({s2d('_sdev')} / {tmf})"
    sv = f"({s2d('_sv')} / {tmf})"
    sr = f"({s2d('_sr')} / {tmf})"
    ss = f"({s2d('_ss')} / {tmf})"
    cmh = f"((ABS({sdev}) - 0.5) * (ABS({sdev}) - 0.5) / {sv})"
    p = two_sided_p_sql(f"SQRT({cmh})")
    or_mh = f"({sr} / {ss})"
    var_ln = (
        f"({s2d('_sp1')} / {tmf} / (2.0 * {sr} * {sr})"
        f" + {s2d('_sp2')} / {tmf} / (2.0 * {sr} * {ss})"
        f" + {s2d('_sp3')} / {tmf} / (2.0 * {ss} * {ss}))"
    )
    ln_or = f"(FLOOR(LN({or_mh}) * 1000000000.0 + 0.5) / 1000000000.0)"
    half = f"({dlit(1.959963984540054)} * SQRT({var_ln}))"
    lo = f"(FLOOR(EXP({ln_or} - {half}) * 1000000000.0 + 0.5) / 1000000000.0)"
    hi = f"(FLOOR(EXP({ln_or} + {half}) * 1000000000.0 + 0.5) / 1000000000.0)"
    ok = f"({sv} > 0 AND {sr} > 0 AND {ss} > 0)"
    return f"""
WITH d AS (
  SELECT {stratum_col} AS _st,
    CASE WHEN {arm_col} = {level_a!r} THEN 1
         WHEN {arm_col} = {level_b!r} THEN 2 END AS _arm,
    CAST(CAST({success_col} AS BOOLEAN) AS BIGINT) AS _s
  FROM ({data_sql})
),
per AS (
  SELECT _st,
    CAST(SUM(CASE WHEN _arm = 1 THEN _s ELSE 0 END) AS BIGINT) AS _a,
    CAST(SUM(CASE WHEN _arm = 1 THEN 1 - _s ELSE 0 END) AS BIGINT) AS _b,
    CAST(SUM(CASE WHEN _arm = 2 THEN _s ELSE 0 END) AS BIGINT) AS _c,
    CAST(SUM(CASE WHEN _arm = 2 THEN 1 - _s ELSE 0 END) AS BIGINT) AS _d
  FROM d WHERE _arm IS NOT NULL AND _s IS NOT NULL
  GROUP BY _st
),
terms AS (
  SELECT (_a + _b + _c + _d) AS _n,
    {q9(f"CASE WHEN {okst} THEN {a} - {n1} * {m1} / {n} ELSE {z0} END")} AS _dev,
    {q9(f"CASE WHEN {okst} THEN {n1} * {n0} * {m1} * {m0} / ({n} * {n} * ({n} - 1.0)) ELSE {z0} END")} AS _v,
    {q9(f"CASE WHEN {okst} THEN {a} * {dd} / {n} ELSE {z0} END")} AS _r,
    {q9(f"CASE WHEN {okst} THEN {b} * {c} / {n} ELSE {z0} END")} AS _s2,
    {q9(f"CASE WHEN {okst} THEN ({a} + {dd}) / {n} * ({a} * {dd} / {n}) ELSE {z0} END")} AS _p1,
    {q9(f"CASE WHEN {okst} THEN ({a} + {dd}) / {n} * ({b} * {c} / {n}) + ({b} + {c}) / {n} * ({a} * {dd} / {n}) ELSE {z0} END")} AS _p2,
    {q9(f"CASE WHEN {okst} THEN ({b} + {c}) / {n} * ({b} * {c} / {n}) ELSE {z0} END")} AS _p3
  FROM per
),
agg AS (
  SELECT COUNT(*) AS n_strata, CAST(SUM(_n) AS BIGINT) AS n,
    SUM(_dev) AS _sdev, SUM(_v) AS _sv, SUM(_r) AS _sr, SUM(_s2) AS _ss,
    SUM(_p1) AS _sp1, SUM(_p2) AS _sp2, SUM(_p3) AS _sp3
  FROM terms
)
SELECT n_strata, n,
  CASE WHEN {sv} > 0 THEN {cmh} END AS cmh_stat,
  CASE WHEN {sv} > 0 THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {or_mh} END AS or_mh,
  CASE WHEN {ok} AND {var_ln} > 0 THEN {lo} END AS or_lo95,
  CASE WHEN {ok} AND {var_ln} > 0 THEN {hi} END AS or_hi95,
  CASE WHEN {sv} > 0 THEN {p} < 0.05 END AS reject_05
FROM agg
"""


def woolf_test(
    df: DataFrame,
    arm_col: str,
    level_a: str,
    level_b: str,
    success_col: str,
    stratum_col: str,
    term_scale: int = 9,
) -> DataFrame:
    """Woolf's test of odds-ratio homogeneity across strata (Woolf
    1955, with the Haldane–Anscombe +½ correction): the companion
    :func:`cmh_test` needs — CMH pools a COMMON odds ratio; Woolf asks
    whether one common ratio is even defensible, or the effect genuinely
    differs by stratum (in which case report per-stratum effects, not
    the pooled one):

        X² = Σ wᵢ·(ln ORᵢ − ln ŌR)²  =  Σw·ln²OR − (Σw·lnOR)²/Σw
        wᵢ = (1/aᵢ′+1/bᵢ′+1/cᵢ′+1/dᵢ′)⁻¹,  cells′ = cells + ½
        X² ~ χ²_{k−1}

    Exactness: per-stratum ln OR and weight are floor-quantized at
    10^-term_scale, their three products are re-quantized to DECIMAL
    ints (cross-stratum sums order-free), the sufficient-stats
    collapse above avoids a second pass against the pooled mean, and
    the p-value uses the engine's Wilson–Hilferty χ² kernel.

    Returns one row: (n_strata, woolf_stat, df, p_value,
    homogeneous_05).
    """
    from timeseriesutils_spark.operators.nonparam import chi2_sf_expr

    tm = 10**term_scale
    tmf = F.lit(float(tm))
    arm = F.when(F.col(arm_col) == F.lit(level_a), 1).when(
        F.col(arm_col) == F.lit(level_b), 2
    )
    s = F.col(success_col).cast("boolean").cast("bigint")
    d = df.select(
        F.col(stratum_col).alias("_st"), arm.alias("_arm"), s.alias("_s")
    ).filter(F.col("_arm").isNotNull() & F.col("_s").isNotNull())
    per = d.groupBy("_st").agg(
        F.sum(F.when(F.col("_arm") == 1, F.col("_s")).otherwise(0)).alias("_a"),
        F.sum(
            F.when(F.col("_arm") == 1, 1 - F.col("_s")).otherwise(0)
        ).alias("_b"),
        F.sum(F.when(F.col("_arm") == 2, F.col("_s")).otherwise(0)).alias("_c"),
        F.sum(
            F.when(F.col("_arm") == 2, 1 - F.col("_s")).otherwise(0)
        ).alias("_d"),
    )
    h = lambda col: F.col(col).cast("double") + F.lit(0.5)  # noqa: E731
    q = lambda x: F.floor(x * tmf + F.lit(0.5)) / tmf  # noqa: E731
    lnor = q(
        F.log(h("_a") * h("_d") / (h("_b") * h("_c")))
    )
    w = q(
        F.lit(1.0)
        / (
            F.lit(1.0) / h("_a")
            + F.lit(1.0) / h("_b")
            + F.lit(1.0) / h("_c")
            + F.lit(1.0) / h("_d")
        )
    )
    qd = lambda x: F.floor(x * tmf + F.lit(0.5)).cast(  # noqa: E731
        "decimal(38,0)"
    )
    terms = per.select(
        qd(w).alias("_t1"),
        qd(w * lnor).alias("_t2"),
        qd(w * lnor * lnor).alias("_t3"),
    )
    agg = terms.groupBy().agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("_t1").alias("_s1"),
        F.sum("_t2").alias("_s2"),
        F.sum("_t3").alias("_s3"),
    )
    s2d = lambda col: F.col(col).cast("string").cast("double")  # noqa: E731
    sw = s2d("_s1") / tmf
    swl = s2d("_s2") / tmf
    swl2 = s2d("_s3") / tmf
    x2 = swl2 - swl * swl / sw
    dfree = (F.col("n_strata") - 1).cast("bigint")
    p = chi2_sf_expr(x2, dfree)
    ok = (F.col("n_strata") > 1) & (sw > 0)
    return agg.select(
        "n_strata",
        F.when(ok, x2).alias("woolf_stat"),
        dfree.alias("df"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p >= F.lit(0.05)).alias("homogeneous_05"),
    )


def woolf_test_sql(
    data_sql: str,
    arm_col: str,
    level_a: str,
    level_b: str,
    success_col: str,
    stratum_col: str,
    term_scale: int = 9,
) -> str:
    """DuckDB twin of :func:`woolf_test` (same Haldane cells, same
    quantize points, same WH kernel)."""
    from timeseriesutils_spark.functions.exact import dlit
    from timeseriesutils_spark.operators.nonparam import chi2_sf_sql

    tm = 10**term_scale
    tmf = dlit(float(tm))
    h = lambda c: f"(CAST({c} AS DOUBLE) + 0.5)"  # noqa: E731
    q = lambda x: f"(FLOOR(({x}) * {tmf} + 0.5) / {tmf})"  # noqa: E731
    lnor = q(
        f"LN({h('_a')} * {h('_d')} / ({h('_b')} * {h('_c')}))"
    )
    w = q(
        f"(1.0 / (1.0 / {h('_a')} + 1.0 / {h('_b')}"
        f" + 1.0 / {h('_c')} + 1.0 / {h('_d')}))"
    )
    qd = lambda x: (  # noqa: E731
        f"CAST(FLOOR(({x}) * {tmf} + 0.5) AS DECIMAL(38,0))"
    )
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    sw = f"({s2d('_s1')} / {tmf})"
    swl = f"({s2d('_s2')} / {tmf})"
    swl2 = f"({s2d('_s3')} / {tmf})"
    x2 = f"({swl2} - {swl} * {swl} / {sw})"
    p = chi2_sf_sql(x2, "(n_strata - 1)")
    ok = f"(n_strata > 1 AND {sw} > 0)"
    return f"""
WITH d AS (
  SELECT {stratum_col} AS _st,
    CASE WHEN {arm_col} = {level_a!r} THEN 1
         WHEN {arm_col} = {level_b!r} THEN 2 END AS _arm,
    CAST(CAST({success_col} AS BOOLEAN) AS BIGINT) AS _s
  FROM ({data_sql})
),
per AS (
  SELECT _st,
    CAST(SUM(CASE WHEN _arm = 1 THEN _s ELSE 0 END) AS BIGINT) AS _a,
    CAST(SUM(CASE WHEN _arm = 1 THEN 1 - _s ELSE 0 END) AS BIGINT) AS _b,
    CAST(SUM(CASE WHEN _arm = 2 THEN _s ELSE 0 END) AS BIGINT) AS _c,
    CAST(SUM(CASE WHEN _arm = 2 THEN 1 - _s ELSE 0 END) AS BIGINT) AS _d
  FROM d WHERE _arm IS NOT NULL AND _s IS NOT NULL
  GROUP BY _st
),
terms AS (
  SELECT {qd(w)} AS _t1,
    {qd(f"{w} * {lnor}")} AS _t2,
    {qd(f"{w} * {lnor} * {lnor}")} AS _t3
  FROM per
),
agg AS (
  SELECT COUNT(*) AS n_strata, SUM(_t1) AS _s1, SUM(_t2) AS _s2,
    SUM(_t3) AS _s3
  FROM terms
)
SELECT n_strata,
  CASE WHEN {ok} THEN {x2} END AS woolf_stat,
  CAST(n_strata - 1 AS BIGINT) AS df,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} >= 0.05 END AS homogeneous_05
FROM agg
"""


def did_estimator(
    events: DataFrame,
    value_col: str,
    user_col: str = "user_id",
    time_col: str = "ts",
    cutover: str = "2024-01-16",
    scale: int = 2,
) -> DataFrame:
    """Difference-in-differences treatment-effect estimate (Card &
    Krueger 1994 design, the 2×2 OLS-equivalent closed form): users
    are assigned to treatment by md5-bucket parity (the ab_test_report
    convention), periods split at the ``cutover`` timestamp, and

        DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)

    with the heteroskedasticity-unpooled standard error

        SE² = Σ_cells s²_c / n_c,   t = DiD / SE

    — identical to the interaction coefficient (and its HC robust SE)
    of the saturated OLS  y ~ treat·post, which is why the 2×2 needs
    no regression machinery.  Completes the experimentation family:
    ab_test_report is the randomized-exposure test, cuped_adjust the
    variance-reduced one; DiD is the QUASI-experimental design for
    cutovers that were not randomized over time.

    Exactness: per-cell Σy and Σy² accumulate from 10^-scale-quantized
    integers in DECIMAL/HUGEINT; means, the four-term DiD, cell
    variances, SE and t are one shared double tree over those exact
    sums (string-cast) — aggregation-order free.

    Scale shape: ONE map-combinable conditional aggregation over the
    event scan (8 sums + 4 counts), one output row — constant reduce
    state at any volume.

    Returns one row: (n_/mean_ for cc, ct, tc, tt  [treat×post],
    did, se, t_stat).
    """
    from timeseriesutils_spark.operators.splits import hash_bucket

    m = 10 ** int(scale)
    treat = (hash_bucket(F.col(user_col)) % 2 == 1).cast("int")
    post = (
        F.col(time_col).cast("timestamp")
        >= F.lit(cutover).cast("timestamp")
    ).cast("int")
    vq = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = events.filter(F.col(value_col).isNotNull()).select(
        treat.alias("_tr"), post.alias("_po"), vq.alias("_v")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731
    cells = {}
    for t in (0, 1):
        for p in (0, 1):
            w = ((F.col("_tr") == t) & (F.col("_po") == p)).cast("bigint")
            k = f"{t}{p}"
            cells[f"n{k}"] = F.sum(w)
            # operand-first DECIMAL casts: a BIGINT _v*_v wraps
            # silently past ~9.2e18 in Spark (ADVICE r12)
            cells[f"s{k}"] = F.sum(dec(F.col("_v")) * w)
            cells[f"q{k}"] = F.sum(dec(F.col("_v")) * dec(F.col("_v")) * w)
    agg = d.groupBy().agg(*[v.alias(k) for k, v in cells.items()])

    md = float(m)

    def mean(k):
        return s2d(F.col(f"s{k}")) / F.col(f"n{k}").cast("double") / F.lit(md)

    def var(k):  # unbiased cell variance in value units
        n = F.col(f"n{k}").cast("double")
        return (
            (s2d(F.col(f"q{k}")) - s2d(F.col(f"s{k}")) * s2d(F.col(f"s{k}")) / n)
            / (n - F.lit(1.0))
            / F.lit(md * md)
        )

    did = (mean("11") - mean("10")) - (mean("01") - mean("00"))
    se2 = sum(
        var(k) / F.col(f"n{k}").cast("double") for k in ("00", "01", "10", "11")
    )
    ok = (
        (F.col("n00") > 1) & (F.col("n01") > 1)
        & (F.col("n10") > 1) & (F.col("n11") > 1)
    )
    se = F.sqrt(se2)
    # degenerate-cell contract: an empty 2x2 cell returns NULL (not
    # the 0/0 NaN), like the rest of the catalog (ADVICE r12)
    okm = lambda k: F.col(f"n{k}") >= 1  # noqa: E731
    ok_all = okm("00") & okm("01") & okm("10") & okm("11")
    q9 = 1.0e9
    qz = lambda c: F.floor(c * F.lit(q9) + F.lit(0.5)) / F.lit(q9)  # noqa: E731
    return agg.select(
        F.col("n00").alias("n_ctrl_pre"),
        F.col("n01").alias("n_ctrl_post"),
        F.col("n10").alias("n_treat_pre"),
        F.col("n11").alias("n_treat_post"),
        F.when(okm("00"), qz(mean("00"))).alias("mean_ctrl_pre"),
        F.when(okm("01"), qz(mean("01"))).alias("mean_ctrl_post"),
        F.when(okm("10"), qz(mean("10"))).alias("mean_treat_pre"),
        F.when(okm("11"), qz(mean("11"))).alias("mean_treat_post"),
        F.when(ok_all, qz(did)).alias("did"),
        F.when(ok, qz(se)).alias("se"),
        F.when(ok, qz(did / se)).alias("t_stat"),
    )


def did_estimator_sql(
    table: str = "events",
    value_col: str = "value",
    user_col: str = "user_id",
    time_col: str = "ts",
    cutover: str = "2024-01-16",
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`did_estimator` (same md5-parity arms,
    same exact cell sums, same double tree)."""
    from timeseriesutils_spark.functions.exact import dlit

    m = 10 ** int(scale)
    md = dlit(float(m))
    # hash_bucket twin (the ab_test_report oracle idiom): first 4 md5
    # hex digits -> int, mod 100, then parity
    treat = (
        f"CAST(((CAST(CONCAT('0x', substring(md5(CAST({user_col} AS VARCHAR)),"
        f" 1, 4)) AS INT) % 100) % 2) = 1 AS INT)"
    )
    post = f"CAST(CAST({time_col} AS TIMESTAMP) >= TIMESTAMP '{cutover}' AS INT)"
    vq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    aggs = []
    for t in (0, 1):
        for p in (0, 1):
            k = f"{t}{p}"
            w = f"CASE WHEN _tr = {t} AND _po = {p} THEN 1 ELSE 0 END"
            aggs += [
                f"CAST(SUM({w}) AS BIGINT) AS n{k}",
                f"SUM(CAST(_v AS HUGEINT) * ({w})) AS s{k}",
                f"SUM(CAST(_v AS HUGEINT) * _v * ({w})) AS q{k}",
            ]
    s2d = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731

    def mean(k):
        return f"({s2d(f's{k}')} / CAST(n{k} AS DOUBLE) / {md})"

    def var(k):
        n = f"CAST(n{k} AS DOUBLE)"
        return (
            f"(({s2d(f'q{k}')} - {s2d(f's{k}')} * {s2d(f's{k}')} / {n})"
            f" / ({n} - 1.0) / ({md} * {md}))"
        )

    did = f"(({mean('11')} - {mean('10')}) - ({mean('01')} - {mean('00')}))"
    se2 = " + ".join(f"({var(k)} / CAST(n{k} AS DOUBLE))" for k in ("00", "01", "10", "11"))
    ok = "(n00 > 1 AND n01 > 1 AND n10 > 1 AND n11 > 1)"
    ok_all = "(n00 >= 1 AND n01 >= 1 AND n10 >= 1 AND n11 >= 1)"
    se = f"SQRT({se2})"
    qz = lambda x: f"(FLOOR(({x}) * 1000000000.0 + 0.5) / 1000000000.0)"  # noqa: E731
    return f"""
WITH d AS (
  SELECT {treat} AS _tr, {post} AS _po, {vq} AS _v
  FROM {table} WHERE {value_col} IS NOT NULL
),
agg AS (SELECT {', '.join(aggs)} FROM d)
SELECT n00 AS n_ctrl_pre, n01 AS n_ctrl_post,
  n10 AS n_treat_pre, n11 AS n_treat_post,
  CASE WHEN n00 >= 1 THEN {qz(mean('00'))} END AS mean_ctrl_pre,
  CASE WHEN n01 >= 1 THEN {qz(mean('01'))} END AS mean_ctrl_post,
  CASE WHEN n10 >= 1 THEN {qz(mean('10'))} END AS mean_treat_pre,
  CASE WHEN n11 >= 1 THEN {qz(mean('11'))} END AS mean_treat_post,
  CASE WHEN {ok_all} THEN {qz(did)} END AS did,
  CASE WHEN {ok} THEN {qz(se)} END AS se,
  CASE WHEN {ok} THEN {qz(f'{did} / {se}')} END AS t_stat
FROM agg
"""
