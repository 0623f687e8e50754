"""Declared queries for the event-analytics operators
(operators/analytics.py) plus the corpus-retrieval text ops — the
product-analytics / hypertable workload a time-series engine serves
(SURVEY.md §2.2 capability-parity; the reference delegates all
aggregation to its caller, SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseriesutils_spark.operators.analytics import (
    cohort_retention,
    cohort_retention_sql,
    detect_gaps,
    detect_gaps_sql,
    funnel_counts,
    funnel_counts_sql,
    ohlc,
    ohlc_sql,
    time_rollup,
    time_rollup_sql,
    time_weighted_avg,
    time_weighted_avg_sql,
)
from timeseriesutils_spark.operators.text import (
    bm25_search,
    bm25_search_sql,
    cross_doc_dup_fraction,
    cross_doc_dup_fraction_sql,
)
from timeseriesutils_spark.queries import Q
from timeseriesutils_spark.sources.tables import load_table

FUNNEL_STEPS = ("view", "click", "purchase")
BM25_TERMS = ("spark", "window", "join")


def q_time_rollup(spark, sf_dir):
    """Multi-resolution continuous aggregate over the events stream:
    day/hour/minute buckets + grand total from ONE rollup pass
    (analytics.time_rollup) — the batch form of a hypertable rollup."""
    return time_rollup(load_table(spark, sf_dir, "events"))


def q_funnel(spark, sf_dir):
    """Ordered view→click→purchase funnel (analytics.funnel_counts):
    per-step reached-user counts and step-over-step conversion, one
    user-partition window pass."""
    return funnel_counts(load_table(spark, sf_dir, "events"), steps=FUNNEL_STEPS)


def q_cohort_retention(spark, sf_dir):
    """Day-cohort retention triangle (analytics.cohort_retention):
    distinct active users per (first-seen day, day offset)."""
    return cohort_retention(load_table(spark, sf_dir, "events"))


def q_boilerplate_frac(spark, sf_dir):
    """Corpus-level boilerplate signal (text.cross_doc_dup_fraction):
    per-doc fraction of word 5-grams shared with ≥2 other documents —
    the cross-document complement of repetition_stats."""
    return cross_doc_dup_fraction(
        load_table(spark, sf_dir, "documents"), n=5, min_docs=3
    )


def q_bm25(spark, sf_dir):
    """Exact BM25 keyword retrieval (text.bm25_search): top-20 documents
    for a fixed 3-term query, deterministic fixed-order scoring."""
    return bm25_search(load_table(spark, sf_dir, "documents"), terms=BM25_TERMS)


def q_ohlc(spark, sf_dir):
    """Hourly candlestick bars per event type (analytics.ohlc):
    open/high/low/close + count + exact sum, rank-deterministic
    open/close under timestamp ties."""
    return ohlc(load_table(spark, sf_dir, "events"))


def q_twa(spark, sf_dir):
    """Trapezoidal time-weighted average of value per event type
    (analytics.time_weighted_avg) — the spacing-correct mean over the
    irregular events series."""
    return time_weighted_avg(load_table(spark, sf_dir, "events"))


GAP_MINUTES = 120.0


def q_gap_detect(spark, sf_dir):
    """Missing-data report (analytics.detect_gaps): every >2 h silence
    per user in the events stream, exact integer-ms bounds."""
    return detect_gaps(load_table(spark, sf_dir, "events"), gap_minutes=GAP_MINUTES)


QUERIES = {
    "time_rollup": Q(q_time_rollup, time_rollup_sql()),
    "ohlc_bars": Q(q_ohlc, ohlc_sql()),
    "time_weighted_avg": Q(q_twa, time_weighted_avg_sql()),
    "gap_detect": Q(q_gap_detect, detect_gaps_sql(gap_minutes=GAP_MINUTES)),
    "funnel": Q(q_funnel, funnel_counts_sql(steps=FUNNEL_STEPS)),
    "cohort_retention": Q(q_cohort_retention, cohort_retention_sql()),
    "boilerplate_frac": Q(
        q_boilerplate_frac, cross_doc_dup_fraction_sql(n=5, min_docs=3)
    ),
    "bm25_search": Q(q_bm25, bm25_search_sql(terms=BM25_TERMS)),
}


PART_NS = 10_000_000  # part node ids = PART_NS + l_partkey (disjoint from suppkeys)
PR_PARAMS = dict(n_iter=5, d_num=17, d_den=20, scale=10**9)

_PR_EDGES_SQL = f"""
SELECT l_suppkey AS src, {PART_NS} + l_partkey AS dst FROM lineitem
UNION ALL
SELECT {PART_NS} + l_partkey AS src, l_suppkey AS dst FROM lineitem
"""


def q_pagerank(spark, sf_dir):
    """Integer-exact PageRank (operators/graph.pagerank) over the
    supplier↔part supply graph (distinct lineitem pairs, both
    directions, part ids namespaced) — centrality with fixed 5-round
    integer power iteration, hash-checked against the unrolled-CTE
    oracle."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_suppkey").alias("src"), (F.lit(PART_NS) + F.col("l_partkey")).alias("dst")
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return pagerank(fwd.unionByName(rev), **PR_PARAMS)


def _sql_pagerank():
    from timeseriesutils_spark.operators.graph import pagerank_sql

    return pagerank_sql(_PR_EDGES_SQL, **PR_PARAMS)


QUERIES.update({"pagerank": Q(q_pagerank, _sql_pagerank())})


TRI_QTY = 49  # rare-lineitem filter: keeps the co-supply graph sparse


def q_triangle_count(spark, sf_dir):
    """Per-node triangle counts (operators/graph.triangle_count) on the
    supplier co-supply graph: suppliers are linked when both shipped the
    same part in a high-quantity (>= 49) lineitem.  Degree-ordered
    orientation bounds the wedge join by sqrt(m) fan-out -- the
    hub-safe distributed triangle algorithm."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= TRI_QTY)
    ps = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    edges = (
        ps.alias("a")
        .join(ps.alias("b"), "p")
        .where(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    return triangle_count(edges)


def _sql_triangle_count():
    from timeseriesutils_spark.operators.graph import triangle_count_sql

    edges = f"""
  WITH ps AS (
    SELECT DISTINCT l_partkey AS p, l_suppkey AS s
    FROM lineitem WHERE l_quantity >= {TRI_QTY}
  )
  SELECT DISTINCT a.s AS src, b.s AS dst
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
"""
    return triangle_count_sql(edges)


QUERIES.update({"triangle_count": Q(q_triangle_count, _sql_triangle_count())})


def q_rolling_active_users(spark, sf_dir):
    """Rolling 7-day distinct active users per day
    (analytics.rolling_active_users): windowed COUNT DISTINCT -- not
    expressible as a window function -- computed exactly via per-user
    disjoint coverage intervals + an interval-stabbing diff array; the
    only single-partition step is the prefix sum over the calendar-day
    spine."""
    from timeseriesutils_spark.operators.analytics import rolling_active_users

    return rolling_active_users(load_table(spark, sf_dir, "events"))


def _sql_rolling_active_users():
    from timeseriesutils_spark.operators.analytics import rolling_active_users_sql

    return rolling_active_users_sql()


QUERIES.update(
    {"rolling_active_users": Q(q_rolling_active_users, _sql_rolling_active_users())}
)


def q_funnel_latency(spark, sf_dir):
    """Conversion-latency report (analytics.funnel_latency): per
    first-view day, count + exact p50/p75 ms from first view to first
    at-or-after purchase -- dyadic probe points keep both engines'
    quantile lerp exactly equal on int64 ms."""
    from timeseriesutils_spark.operators.analytics import funnel_latency

    return funnel_latency(load_table(spark, sf_dir, "events"))


def _sql_funnel_latency():
    from timeseriesutils_spark.operators.analytics import funnel_latency_sql

    return funnel_latency_sql()


QUERIES.update({"funnel_latency": Q(q_funnel_latency, _sql_funnel_latency())})


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix (analytics.event_transitions)
    over per-user event sequences: count + P(to|from) for every
    consecutive event-type pair — the behavioral-flow summary."""
    from timeseriesutils_spark.operators.analytics import event_transitions

    return event_transitions(load_table(spark, sf_dir, "events"))


def _sql_event_transitions():
    from timeseriesutils_spark.operators.analytics import event_transitions_sql

    return event_transitions_sql("events")


QUERIES.update({"event_transitions": Q(q_event_transitions, _sql_event_transitions())})


def q_ab_test(spark, sf_dir):
    """A/B conversion report (analytics.ab_test_report): md5-parity arm
    assignment, view-exposed users, purchase conversion, pooled
    two-proportion z — one summary row from two reduce stages."""
    from timeseriesutils_spark.operators.analytics import ab_test_report

    return ab_test_report(load_table(spark, sf_dir, "events"))


def _sql_ab_test():
    from timeseriesutils_spark.operators.analytics import ab_test_report_sql

    return ab_test_report_sql("events")


QUERIES.update({"ab_test_report": Q(q_ab_test, _sql_ab_test())})


def q_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier time-to-conversion survival curves per market
    segment (operators/survival.kaplan_meier): per-user hours from first
    event to first purchase (72-hour follow-up window, non-converters
    right-censored at the edge), stratum from a broadcast customer join,
    then the product-limit estimator in quantized log space -- two
    map-combinable shuffles plus a window over the tiny (stratum, t)
    table."""
    from timeseriesutils_spark.operators.survival import (
        conversion_lifetimes,
        kaplan_meier,
    )

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return kaplan_meier(
        conversion_lifetimes(events, customer), duration_col="t_hour"
    )


def _sql_kaplan_meier():
    from timeseriesutils_spark.operators.survival import (
        conversion_lifetimes_sql,
        kaplan_meier_sql,
    )

    return kaplan_meier_sql(
        conversion_lifetimes_sql("events", "customer"), duration_col="t_hour"
    )


QUERIES.update({"kaplan_meier": Q(q_kaplan_meier, _sql_kaplan_meier())})


def _lifetime_subjects(spark, sf_dir):
    """Per-user conversion lifetimes with BOTH an arm (market segment)
    and a stratum (nation bucket) — the two-factor variant of
    operators/survival.conversion_lifetimes feeding the inferential
    survival queries (logrank_test)."""
    from timeseriesutils_spark.sources.tables import load_table as _lt

    events = _lt(spark, sf_dir, "events")
    customer = _lt(spark, sf_dir, "customer")
    per_user = events.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("_first_us"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.unix_micros(F.col("ts").cast("timestamp")),
            )
        ).alias("_buy_us"),
    )
    hours = F.expr("(_buy_us - _first_us) div 3600000000")
    died = F.when(hours < F.lit(72), F.lit(1)).otherwise(F.lit(0))
    return per_user.join(
        F.broadcast(customer), F.col("user_id") == F.col("c_custkey")
    ).select(
        (F.col("c_nationkey") % 5).alias("region_bucket"),
        F.col("c_mktsegment").alias("arm"),
        F.least(F.coalesce(hours, F.lit(72)), F.lit(72))
        .cast("bigint")
        .alias("t_hour"),
        F.coalesce(died, F.lit(0)).cast("int").alias("died"),
    )


_SQL_LIFETIME_SUBJECTS = """
SELECT c.c_nationkey % 5 AS region_bucket, c.c_mktsegment AS arm,
  CAST(LEAST(COALESCE((u._buy_us - u._first_us) // 3600000000, 72), 72)
       AS BIGINT) AS t_hour,
  COALESCE(CASE WHEN (u._buy_us - u._first_us) // 3600000000 < 72
                THEN 1 ELSE 0 END, 0) AS died
FROM (SELECT user_id, MIN(epoch_us(ts)) AS _first_us,
        MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS _buy_us
      FROM events GROUP BY user_id) u
JOIN customer c ON u.user_id = c.c_custkey
"""


def q_logrank_test(spark, sf_dir):
    """Log-rank test per nation bucket: do BUILDING and MACHINERY
    customers convert at different rates over the 72-hour follow-up?
    (operators/survival.logrank_test) — the inferential companion of
    the kaplan_meier query on the same lifetimes: O−E accumulation over
    pooled event times, tie-corrected hypergeometric variance, χ²₁
    p-value via the engine p-value kernel."""
    from timeseriesutils_spark.operators.survival import logrank_test

    return logrank_test(
        _lifetime_subjects(spark, sf_dir),
        "arm", "BUILDING", "MACHINERY", "t_hour", "died",
        ["region_bucket"],
    )


def _sql_logrank_test():
    from timeseriesutils_spark.operators.survival import logrank_test_sql

    return logrank_test_sql(
        _SQL_LIFETIME_SUBJECTS,
        "arm", "BUILDING", "MACHINERY", "t_hour", "died",
        ["region_bucket"],
    )


QUERIES.update({"logrank_test": Q(q_logrank_test, _sql_logrank_test())})


def q_cumulative_incidence(spark, sf_dir):
    """Aalen–Johansen cumulative incidence of conversion under the
    competing risk of an error event (operators/survival.
    cumulative_incidence): per market segment, each user's first
    terminal event within 72 h is either a purchase (cause 1) or an
    error (cause 2, the abandonment proxy); naive 1−KM overstates
    conversion because errored users can never convert — AJ weights
    each conversion increment by the all-cause survival S(t⁻)."""
    from timeseriesutils_spark.operators.survival import cumulative_incidence
    from timeseriesutils_spark.sources.tables import load_table as _lt

    events = _lt(spark, sf_dir, "events")
    customer = _lt(spark, sf_dir, "customer")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    per_user = events.groupBy("user_id").agg(
        F.min(us("ts")).alias("_first_us"),
        F.min(F.when(F.col("event_type") == "purchase", us("ts"))).alias(
            "_buy_us"
        ),
        F.min(F.when(F.col("event_type") == "error", us("ts"))).alias(
            "_err_us"
        ),
    )
    buy_h = F.expr("(_buy_us - _first_us) div 3600000000")
    err_h = F.expr("(_err_us - _first_us) div 3600000000")
    cause = (
        F.when(
            buy_h.isNotNull()
            & (buy_h < F.lit(72))
            & (err_h.isNull() | (buy_h <= err_h)),
            F.lit(1),
        )
        .when(err_h.isNotNull() & (err_h < F.lit(72)), F.lit(2))
        .otherwise(F.lit(0))
    )
    subj = per_user.join(
        F.broadcast(customer), F.col("user_id") == F.col("c_custkey")
    ).select(
        F.col("c_mktsegment").alias("segment"),
        cause.alias("cause"),
        F.when(cause == 1, buy_h)
        .when(cause == 2, err_h)
        .otherwise(F.lit(72))
        .cast("bigint")
        .alias("t_hour"),
    )
    return cumulative_incidence(subj, "cause", "t_hour", ["segment"])


def _sql_cumulative_incidence():
    from timeseriesutils_spark.operators.survival import (
        cumulative_incidence_sql,
    )

    buy_h = "((u._buy_us - u._first_us) // 3600000000)"
    err_h = "((u._err_us - u._first_us) // 3600000000)"
    cause = f"""CASE
      WHEN {buy_h} IS NOT NULL AND {buy_h} < 72
           AND ({err_h} IS NULL OR {buy_h} <= {err_h}) THEN 1
      WHEN {err_h} IS NOT NULL AND {err_h} < 72 THEN 2
      ELSE 0 END"""
    subj = f"""
SELECT c.c_mktsegment AS segment, {cause} AS cause,
  CAST(CASE WHEN ({cause}) = 1 THEN {buy_h}
            WHEN ({cause}) = 2 THEN {err_h}
            ELSE 72 END AS BIGINT) AS t_hour
FROM (SELECT user_id, MIN(epoch_us(ts)) AS _first_us,
        MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS _buy_us,
        MIN(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) AS _err_us
      FROM events GROUP BY user_id) u
JOIN customer c ON u.user_id = c.c_custkey
"""
    return cumulative_incidence_sql(subj, "cause", "t_hour", ["segment"])


QUERIES.update(
    {"cumulative_incidence": Q(q_cumulative_incidence, _sql_cumulative_incidence())}
)


def q_item_cooccur(spark, sf_dir):
    """Item-item basket co-occurrence similarity
    (operators/cooccur.item_cooccur): top-5 'also bought' neighbors per
    part by cosine on the order-incidence matrix -- pairs generated
    row-locally per basket (no self-join), mega-baskets bounded by
    max_basket, singleton pairs pruned by min_support before the count
    join."""
    from timeseriesutils_spark.operators.cooccur import item_cooccur

    return item_cooccur(load_table(spark, sf_dir, "lineitem"))


def _sql_item_cooccur():
    from timeseriesutils_spark.operators.cooccur import item_cooccur_sql

    return item_cooccur_sql("lineitem")


QUERIES.update({"item_cooccur": Q(q_item_cooccur, _sql_item_cooccur())})


def q_attribution(spark, sf_dir):
    """Multi-touch conversion attribution
    (operators/attribution.multi_touch_attribution): first-touch /
    last-touch / linear credit per channel for every user's touches
    before their first purchase -- one user-keyed join plus one window
    pass, linear credit quantized to int64 before the channel sum."""
    from timeseriesutils_spark.operators.attribution import (
        multi_touch_attribution,
    )

    return multi_touch_attribution(load_table(spark, sf_dir, "events"))


def _sql_attribution():
    from timeseriesutils_spark.operators.attribution import (
        multi_touch_attribution_sql,
    )

    return multi_touch_attribution_sql("events")


QUERIES.update({"attribution": Q(q_attribution, _sql_attribution())})


def q_top_paths(spark, sf_dir):
    """Top-20 behavioral paths (operators/sessions.top_paths): most
    common ordered event-type sequences per (user, day) session, paths
    assembled row-locally from sorted in-row arrays, only the
    pre-aggregated path-frequency table crossing the final ranking
    window."""
    from timeseriesutils_spark.operators.sessions import top_paths

    return top_paths(load_table(spark, sf_dir, "events"))


def _sql_top_paths():
    from timeseriesutils_spark.operators.sessions import top_paths_sql

    return top_paths_sql("events")


QUERIES.update({"top_paths": Q(q_top_paths, _sql_top_paths())})


def q_dedup_debounce(spark, sf_dir):
    """Leading-edge debounce of event storms
    (operators/sessions.collapse_bursts): per event type, collapse each
    chain of events with <10-minute inter-event gaps into its first
    event, keeping burst size and span as evidence -- the alert-storm /
    retry-flood collapse every telemetry pipeline needs, exact
    integer-ms closed form."""
    from timeseriesutils_spark.operators.sessions import collapse_bursts

    ev = load_table(spark, sf_dir, "events")
    return collapse_bursts(ev, ["event_type"], gap_seconds=600).select(
        "event_type", "event_id", "ts_ms", "burst_n", "burst_size", "burst_span_ms"
    )


def _sql_dedup_debounce():
    from timeseriesutils_spark.operators.sessions import collapse_bursts_sql

    return collapse_bursts_sql(
        "SELECT event_type, event_id, ts FROM events",
        ["event_type"],
        "event_type, event_id, ts_ms, burst_n, burst_size, burst_span_ms",
        gap_seconds=600,
    )


QUERIES.update({"dedup_debounce": Q(q_dedup_debounce, _sql_dedup_debounce())})


def q_rfm_segments(spark, sf_dir):
    """RFM customer segmentation (operators/segments.rfm_segments):
    recency/frequency/monetary quintiles with deterministic tie-breaks
    and the standard named-segment map -- facts reduce to one row per
    customer before the total-order NTILE stage."""
    from timeseriesutils_spark.operators.segments import rfm_segments

    return rfm_segments(load_table(spark, sf_dir, "orders"))


def _sql_rfm_segments():
    from timeseriesutils_spark.operators.segments import rfm_segments_sql

    return rfm_segments_sql("orders")


QUERIES.update({"rfm_segments": Q(q_rfm_segments, _sql_rfm_segments())})


def q_abc_analysis(spark, sf_dir):
    """ABC / Pareto revenue classification
    (operators/segments.abc_analysis): parts ranked by exact-cents
    revenue, classed A/B/C at 80/95% cumulative share -- the heavy scan
    is one map-combinable aggregation; only the part-sized table crosses
    the cumulative window."""
    from timeseriesutils_spark.operators.segments import abc_analysis

    return abc_analysis(load_table(spark, sf_dir, "lineitem"))


def _sql_abc_analysis():
    from timeseriesutils_spark.operators.segments import abc_analysis_sql

    return abc_analysis_sql("lineitem")


QUERIES.update({"abc_analysis": Q(q_abc_analysis, _sql_abc_analysis())})


def q_funnel_window(spark, sf_dir):
    """Time-bounded ordered funnel (analytics.funnel_window, the
    windowFunnel semantics): deepest view->click->purchase prefix
    completed in order within 24h of first view, user counts per depth
    -- chained conditional-min window passes over one user partition,
    exact integer-microsecond timestamp logic."""
    from timeseriesutils_spark.operators.analytics import funnel_window

    return funnel_window(
        load_table(spark, sf_dir, "events"), FUNNEL_STEPS, window_hours=24
    )


def _sql_funnel_window():
    from timeseriesutils_spark.operators.analytics import funnel_window_sql

    return funnel_window_sql(FUNNEL_STEPS, window_hours=24)


QUERIES.update({"funnel_window": Q(q_funnel_window, _sql_funnel_window())})


def q_merge_intervals(spark, sf_dir):
    """Activity-coverage episodes (operators/sessions.merge_intervals):
    every event opens a 30-minute lease per user; overlapping leases
    merge into coverage episodes via the gaps-and-islands running-max
    closed form -- one user exchange, no self-join."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.sessions import merge_intervals

    ev = load_table(spark, sf_dir, "events")
    leases = ev.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("start_ms"),
        (F.unix_millis(F.col("ts").cast("timestamp")) + F.lit(1_800_000)).alias(
            "end_ms"
        ),
    )
    return merge_intervals(leases, ["user_id"])


def _sql_merge_intervals():
    from timeseriesutils_spark.operators.sessions import merge_intervals_sql

    inner = """
SELECT user_id, epoch_ms(ts) AS start_ms, epoch_ms(ts) + 1800000 AS end_ms
FROM events
"""
    return merge_intervals_sql(inner, ["user_id"])


QUERIES.update({"merge_intervals": Q(q_merge_intervals, _sql_merge_intervals())})


def q_state_dwell(spark, sf_dir):
    """Time-in-state report (analytics.state_dwell): total and mean
    dwell per event type from one LEAD pass -- exact integer-ms
    intervals, open episodes excluded."""
    from timeseriesutils_spark.operators.analytics import state_dwell

    return state_dwell(load_table(spark, sf_dir, "events"))


def _sql_state_dwell():
    from timeseriesutils_spark.operators.analytics import state_dwell_sql

    return state_dwell_sql("events")


QUERIES.update({"state_dwell": Q(q_state_dwell, _sql_state_dwell())})


def q_period_over_period(spark, sf_dir):
    """Week-over-week comparison per event type
    (analytics.period_over_period): dense day spine (missing days
    compare as 0), quantized-exact daily sums, one LAG(7) -- the BI
    'vs same day last week' column."""
    from timeseriesutils_spark.operators.analytics import period_over_period

    return period_over_period(load_table(spark, sf_dir, "events"))


def _sql_period_over_period():
    from timeseriesutils_spark.operators.analytics import period_over_period_sql

    return period_over_period_sql("events")


QUERIES.update(
    {"period_over_period": Q(q_period_over_period, _sql_period_over_period())}
)


def q_welch_ttest(spark, sf_dir):
    """Welch two-sample t-test (operators/stats.welch_ttest): does mean
    order value differ between urgent and low priority?  One
    DECIMAL-exact pass per arm, closed-form t and Welch-Satterthwaite
    dof -- the numeric-metric A/B significance companion of
    ab_test_report."""
    from timeseriesutils_spark.operators.stats import welch_ttest

    return welch_ttest(
        load_table(spark, sf_dir, "orders"),
        "o_totalprice",
        "o_orderpriority",
        "1-URGENT",
        "5-LOW",
    )


def _sql_welch_ttest():
    from timeseriesutils_spark.operators.stats import welch_ttest_sql

    return welch_ttest_sql(
        "orders", "o_totalprice", "o_orderpriority", "1-URGENT", "5-LOW"
    )


QUERIES.update({"welch_ttest": Q(q_welch_ttest, _sql_welch_ttest())})


def q_wilson_daily(spark, sf_dir):
    """Daily view->purchase conversion with Wilson-score intervals
    (analytics.wilson_daily): distinct exposed/converted users per day,
    closed-form bounds on exact integer counts -- the small-n-safe
    conversion time series."""
    from timeseriesutils_spark.operators.analytics import wilson_daily

    return wilson_daily(load_table(spark, sf_dir, "events"))


def _sql_wilson_daily():
    from timeseriesutils_spark.operators.analytics import wilson_daily_sql

    return wilson_daily_sql("events")


QUERIES.update({"wilson_daily": Q(q_wilson_daily, _sql_wilson_daily())})


def q_stickiness(spark, sf_dir):
    """DAU/WAU stickiness ratio per day: two invocations of the
    coverage-interval distinct-counter (analytics.rolling_active_users,
    windows 1 and 7) joined on the day spine -- the engagement-quality
    time series; ratio is one double division of exact counts."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.analytics import rolling_active_users

    ev = load_table(spark, sf_dir, "events")
    dau = rolling_active_users(ev, window_days=1).withColumnRenamed(
        "active_users", "dau"
    )
    wau = rolling_active_users(ev, window_days=7).withColumnRenamed(
        "active_users", "wau"
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


def _sql_stickiness():
    from timeseriesutils_spark.operators.analytics import rolling_active_users_sql

    d1 = rolling_active_users_sql("events", window_days=1)
    d7 = rolling_active_users_sql("events", window_days=7)
    return f"""
SELECT dau.day, dau.active_users AS dau, wau.active_users AS wau,
  CAST(dau.active_users AS DOUBLE) / CAST(wau.active_users AS DOUBLE)
    AS stickiness
FROM ({d1}) dau JOIN ({d7}) wau ON dau.day = wau.day
"""


QUERIES.update({"stickiness": Q(q_stickiness, _sql_stickiness())})


def q_latency_bands(spark, sf_dir):
    """P50/P90/P99 bands of event value per (event type, hour-of-day)
    (operators/stats.bucket_percentiles): the observability rollup shape
    -- all percentiles from ONE sorted array per bucket, engine-pinned
    quantile lerp."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.stats import bucket_percentiles

    ev = load_table(spark, sf_dir, "events").withColumn(
        "hr", F.hour(F.col("ts").cast("timestamp"))
    )
    return bucket_percentiles(
        ev, "value", "hr", qs=(0.5, 0.9, 0.99), group_columns=["event_type"]
    )


def _sql_latency_bands():
    from timeseriesutils_spark.operators.stats import bucket_percentiles_sql

    return bucket_percentiles_sql(
        "events",
        "value",
        "CAST(EXTRACT(hour FROM ts) AS INT) AS hr",
        qs=(0.5, 0.9, 0.99),
        group_columns=["event_type"],
    )


QUERIES.update({"latency_bands": Q(q_latency_bands, _sql_latency_bands())})


def q_peak_concurrency(spark, sf_dir):
    """Peak concurrent sessions per day (analytics.peak_concurrency):
    30-minute-TTL session leases swept with the +1/-1 interval-stabbing
    prefix max, partitioned BY DAY so no global single-partition pass
    exists -- the capacity-planning number."""
    from timeseriesutils_spark.operators.analytics import peak_concurrency

    return peak_concurrency(load_table(spark, sf_dir, "events"))


def _sql_peak_concurrency():
    from timeseriesutils_spark.operators.analytics import peak_concurrency_sql

    return peak_concurrency_sql("events")


QUERIES.update({"peak_concurrency": Q(q_peak_concurrency, _sql_peak_concurrency())})


def q_dirichlet_lm(spark, sf_dir):
    """Dirichlet-smoothed query-likelihood retrieval
    (text.dirichlet_lm_search): top-20 documents for the same 3-term
    query bm25_search runs — the language-modeling scorer next to the
    tf-idf one, same fixed-order / rounded-score determinism contract."""
    from timeseriesutils_spark.operators.text import dirichlet_lm_search

    return dirichlet_lm_search(
        load_table(spark, sf_dir, "documents"), terms=BM25_TERMS
    )


def _sql_dirichlet_lm():
    from timeseriesutils_spark.operators.text import dirichlet_lm_search_sql

    return dirichlet_lm_search_sql(terms=BM25_TERMS)


QUERIES.update({"dirichlet_lm_search": Q(q_dirichlet_lm, _sql_dirichlet_lm())})


def q_corpus_jsd(spark, sf_dir):
    """Unigram Jensen-Shannon divergence between the English and
    non-English halves of the corpus (text.corpus_jsd) — the
    training-mix drift number; per-term contributions are quantized to
    integers so the vocabulary-order float sum is exact."""
    from timeseriesutils_spark.operators.text import corpus_jsd

    return corpus_jsd(
        load_table(spark, sf_dir, "documents"), F.col("lang") == "en"
    )


def _sql_corpus_jsd():
    from timeseriesutils_spark.operators.text import corpus_jsd_sql

    return corpus_jsd_sql("lang = 'en'")


QUERIES.update({"corpus_jsd": Q(q_corpus_jsd, _sql_corpus_jsd())})


def q_nelson_aalen(spark, sf_dir):
    """Nelson-Aalen cumulative conversion hazard per market segment
    (operators/survival.nelson_aalen): the additive sibling of the
    kaplan_meier query on the same per-user lifetimes — quantized d/n
    increments, exact-integer cumulative sum."""
    from timeseriesutils_spark.operators.survival import (
        conversion_lifetimes,
        nelson_aalen,
    )

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return nelson_aalen(
        conversion_lifetimes(events, customer), duration_col="t_hour"
    )


def _sql_nelson_aalen():
    from timeseriesutils_spark.operators.survival import (
        conversion_lifetimes_sql,
        nelson_aalen_sql,
    )

    return nelson_aalen_sql(
        conversion_lifetimes_sql("events", "customer"), duration_col="t_hour"
    )


QUERIES.update({"nelson_aalen": Q(q_nelson_aalen, _sql_nelson_aalen())})


def q_rmst(spark, sf_dir):
    """Restricted mean survival time at τ=48h per market segment
    (operators/survival.rmst): the area under the KM conversion curve
    — "average un-converted hours over the first two days", the
    summary that stays meaningful when the median is never reached and
    needs no proportional-hazards assumption.  Exact rectangle sum
    over the quantized KM steps."""
    from timeseriesutils_spark.operators.survival import rmst

    return rmst(
        _lifetime_subjects(spark, sf_dir), tau=48, stratum_col="arm",
        duration_col="t_hour", event_col="died",
    )


def _sql_rmst():
    from timeseriesutils_spark.operators.survival import rmst_sql

    return rmst_sql(
        _SQL_LIFETIME_SUBJECTS, tau=48, stratum_col="arm",
        duration_col="t_hour", event_col="died",
    )


QUERIES.update({"rmst": Q(q_rmst, _sql_rmst())})


def q_chi2_gof(spark, sf_dir):
    """χ² uniformity screen of the md5 hash split per return flag
    (operators/stats.chi2_gof): are the train/val/test buckets balanced
    within every return-flag segment?  The balance audit for hash routing —
    exact integer C·ΣO²/N − N identity, no per-category rounding;
    Wilson–Hilferty p."""
    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.operators.stats import chi2_gof
    from timeseriesutils_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        "l_returnflag",
        (portable_hash64(F.col("l_orderkey").cast("string")) % 10).alias(
            "_b"
        ),
    )
    return chi2_gof(d, "_b", ["l_returnflag"])


def _sql_chi2_gof():
    from timeseriesutils_spark.operators.stats import chi2_gof_sql

    from timeseriesutils_spark.operators.dedup import portable_hash64_sql

    h = portable_hash64_sql("CAST(l_orderkey AS VARCHAR)")
    d = f"SELECT l_returnflag, ({h}) % 10 AS _b FROM lineitem"
    return chi2_gof_sql(d, "_b", ["l_returnflag"])


QUERIES.update({"chi2_gof": Q(q_chi2_gof, _sql_chi2_gof())})


def q_cuped(spark, sf_dir):
    """CUPED variance-reduced A/B metric on a deterministic md5 split
    of lineitem (operators/analytics.cuped_adjust): metric = extended
    price, covariate = quantity (strongly correlated — exactly the
    pre-experiment-covariate setting); θ and the adjusted arm means
    come from ONE pass of exact sufficient statistics."""
    from timeseriesutils_spark.operators.analytics import cuped_adjust
    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    arm = F.when(
        portable_hash64(F.col("l_orderkey").cast("string")) % 2 == 0,
        F.lit("control"),
    ).otherwise(F.lit("treatment"))
    d = li.select(
        arm.alias("arm"),
        F.col("l_extendedprice").alias("y"),
        F.col("l_quantity").alias("x"),
    )
    return cuped_adjust(d, "y", "x", "arm", scale=2)


def _sql_cuped():
    from timeseriesutils_spark.operators.analytics import cuped_adjust_sql
    from timeseriesutils_spark.operators.dedup import portable_hash64_sql

    h = portable_hash64_sql("CAST(l_orderkey AS VARCHAR)")
    d = (
        f"SELECT CASE WHEN ({h}) % 2 = 0 THEN 'control' ELSE 'treatment'"
        " END AS arm, l_extendedprice AS y, l_quantity AS x FROM lineitem"
    )
    return cuped_adjust_sql(d, "y", "x", "arm", scale=2)


QUERIES.update({"cuped_adjust": Q(q_cuped, _sql_cuped())})


def q_ratio_metric_ci(spark, sf_dir):
    """Delta-method 95% CI for price-per-unit (Σ extendedprice / Σ
    quantity) per return flag (operators/analytics.ratio_metric_ci):
    the correct interval for ratio-of-means metrics where the
    denominator is random too — one exact-sufficient-statistics
    pass."""
    from timeseriesutils_spark.operators.analytics import ratio_metric_ci
    from timeseriesutils_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return ratio_metric_ci(
        li, "l_extendedprice", "l_quantity", ["l_returnflag"], scale=2
    )


def _sql_ratio_metric_ci():
    from timeseriesutils_spark.operators.analytics import ratio_metric_ci_sql

    return ratio_metric_ci_sql(
        "SELECT * FROM lineitem", "l_extendedprice", "l_quantity",
        ["l_returnflag"], scale=2,
    )


QUERIES.update(
    {"ratio_metric_ci": Q(q_ratio_metric_ci, _sql_ratio_metric_ci())}
)


def q_weibull_fit(spark, sf_dir):
    """Weibull probability-plot fit of the time-to-conversion curves
    per market segment (operators/survival.weibull_fit): the
    parametric summary over the same censored lifetimes kaplan_meier
    charts — shape k < 1 says conversion hazard FALLS with time (act
    early), k > 1 says it builds; λ is the 63.2% lifetime.  Quantized
    double-log plot points, exact-integer OLS sums."""
    from timeseriesutils_spark.operators.survival import (
        conversion_lifetimes,
        weibull_fit,
    )

    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return weibull_fit(
        conversion_lifetimes(events, customer), duration_col="t_hour"
    )


def _sql_weibull_fit():
    from timeseriesutils_spark.operators.survival import (
        conversion_lifetimes_sql,
        weibull_fit_sql,
    )

    return weibull_fit_sql(
        conversion_lifetimes_sql("events", "customer"), duration_col="t_hour"
    )


QUERIES.update({"weibull_fit": Q(q_weibull_fit, _sql_weibull_fit())})


def _lifetimes_with_activity(spark, sf_dir):
    """conversion_lifetimes + an O(1)-bounded activity covariate
    (capped event count / 10) — the Cox regression input."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    per_user = events.groupBy("user_id").agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("_first_us"),
        F.min(
            F.when(
                F.col("event_type") == "purchase",
                F.unix_micros(F.col("ts").cast("timestamp")),
            )
        ).alias("_buy_us"),
        F.count(F.lit(1)).alias("_nev"),
    )
    hours = F.expr("(_buy_us - _first_us) div 3600000000")
    died = F.when(hours < F.lit(72), F.lit(1)).otherwise(F.lit(0))
    return per_user.join(
        F.broadcast(customer), F.col("user_id") == F.col("c_custkey")
    ).select(
        F.col("c_mktsegment").alias("stratum"),
        F.least(F.coalesce(hours, F.lit(72)), F.lit(72))
        .cast("bigint")
        .alias("t_hour"),
        F.coalesce(died, F.lit(0)).cast("int").alias("died"),
        (F.least(F.col("_nev"), F.lit(20)).cast("double") / F.lit(10.0)).alias(
            "activity"
        ),
    )


_SQL_LIFETIMES_ACTIVITY = """
SELECT c.c_mktsegment AS stratum,
  CAST(LEAST(COALESCE((u._buy_us - u._first_us) // 3600000000, 72), 72)
       AS BIGINT) AS t_hour,
  COALESCE(CASE WHEN (u._buy_us - u._first_us) // 3600000000 < 72
                THEN 1 ELSE 0 END, 0) AS died,
  (CAST(LEAST(u._nev, 20) AS DOUBLE) / 10e0) AS activity
FROM (SELECT user_id, MIN(epoch_us(ts)) AS _first_us,
        MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS _buy_us,
        COUNT(*) AS _nev
      FROM events GROUP BY user_id) u
JOIN customer c ON u.user_id = c.c_custkey
"""


def q_cox_ph(spark, sf_dir):
    """Cox proportional-hazards fit per market segment (operators/
    coxph.cox_ph): does user activity level raise the conversion
    hazard?  Breslow partial likelihood, 3 unrolled Newton steps from
    β=0, exact quantized risk-set sums — the survival-INFERENCE layer
    (KM/NA describe, logrank compares, Cox quantifies), Newton-iterated
    yet hash-verifiable."""
    from timeseriesutils_spark.operators.coxph import cox_ph

    return cox_ph(
        _lifetimes_with_activity(spark, sf_dir),
        "t_hour", "died", "activity", ["stratum"],
    )


def _sql_cox_ph():
    from timeseriesutils_spark.operators.coxph import cox_ph_sql

    return cox_ph_sql(
        _SQL_LIFETIMES_ACTIVITY, "t_hour", "died", "activity", ["stratum"]
    )


QUERIES.update({"cox_ph": Q(q_cox_ph, _sql_cox_ph())})


def q_bayes_ab(spark, sf_dir):
    """Exact Bayesian A/B decision (analytics.bayes_ab): per-user
    purchase conversion under parity arms, per user-cohort experiment —
    P(p_B > p_A) in closed form from two ascending rational folds
    (Cook's Beta inequality; Beta(1,1) priors), bit-identical with no
    quantization because the arithmetic is mul/div of integers.  The
    decision-layer companion to ab_test_report's z-test."""
    from timeseriesutils_spark.operators.analytics import bayes_ab

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            (F.col("event_type") == F.lit("purchase")).cast("int")
        ).alias("converted")
    ).select(
        (F.col("user_id") % 4).cast("bigint").alias("cohort"),
        F.when((F.col("user_id") / F.lit(4)).cast("bigint") % 2 == 0, "ctl")
        .otherwise("trt")
        .alias("arm"),
        F.col("converted").cast("boolean").alias("converted"),
    )
    return bayes_ab(
        users, "arm", "ctl", "trt", "converted", ["cohort"]
    )


def _sql_bayes_ab():
    from timeseriesutils_spark.operators.analytics import bayes_ab_sql

    users = (
        "SELECT CAST(user_id % 4 AS BIGINT) AS cohort,"
        " CASE WHEN CAST(user_id // 4 AS BIGINT) % 2 = 0 THEN 'ctl'"
        " ELSE 'trt' END AS arm,"
        " CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        " AS BOOLEAN) AS converted"
        " FROM events GROUP BY user_id"
    )
    return bayes_ab_sql(users, "arm", "ctl", "trt", "converted", ["cohort"])


QUERIES.update({"bayes_ab": Q(q_bayes_ab, _sql_bayes_ab())})


def q_adamic_adar(spark, sf_dir):
    """Adamic–Adar link prediction (operators/graph.adamic_adar) on the
    supplier co-supply graph (the triangle_count edge set): score
    wedge-connected supplier pairs by common neighbors weighted
    1/ln(degree) — rare shared partners count more.  Quantized-ln
    integer scores, deterministic top-50."""
    from timeseriesutils_spark.operators.graph import adamic_adar

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") >= TRI_QTY
    )
    ps = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    edges = (
        ps.alias("a")
        .join(ps.alias("b"), "p")
        .where(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    return adamic_adar(edges, top_k=50)


def _sql_adamic_adar():
    from timeseriesutils_spark.operators.graph import adamic_adar_sql

    edges = f"""
  WITH ps AS (
    SELECT DISTINCT l_partkey AS p, l_suppkey AS s
    FROM lineitem WHERE l_quantity >= {TRI_QTY}
  )
  SELECT DISTINCT a.s AS src, b.s AS dst
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
"""
    return adamic_adar_sql(edges, top_k=50)


QUERIES.update({"adamic_adar": Q(q_adamic_adar, _sql_adamic_adar())})


def q_sequential_ab(spark, sf_dir):
    """O'Brien–Fleming group-sequential A/B monitor (analytics.
    sequential_ab): the peeking-correct weekly view of an event-level
    conversion experiment — parity arms over events, purchase as the
    success, each event entering at its week (look 1..5, later weeks
    fold into the final look), each look's pooled z compared against
    the strict-early OBF boundary z*(5)·sqrt(5/k).  One conditional-sum
    aggregation covers every look."""
    from timeseriesutils_spark.operators.analytics import sequential_ab

    ev = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    ).cast("bigint")
    base = ev.select(
        F.col("event_id"),
        day.alias("_d"),
        (F.col("event_type") == F.lit("purchase")).alias("converted"),
    )
    g = base.crossJoin(
        F.broadcast(base.agg(F.min("_d").alias("_d0")))
    ).select(
        F.when(F.col("event_id") % 2 == 0, "ctl").otherwise("trt").alias(
            "arm"
        ),
        "converted",
        F.least(
            F.expr("(_d - _d0) div 7 + 1"), F.lit(5).cast("bigint")
        ).cast("bigint").alias("look_week"),
    )
    return sequential_ab(
        g, "arm", "ctl", "trt", "converted", "look_week", n_looks=5
    )


def _sql_sequential_ab():
    from timeseriesutils_spark.operators.analytics import sequential_ab_sql

    base = (
        "SELECT event_id,"
        " CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))"
        " AS BIGINT) AS _d,"
        " event_type = 'purchase' AS converted"
        " FROM events"
    )
    g = (
        f"SELECT CASE WHEN event_id % 2 = 0 THEN 'ctl' ELSE 'trt' END AS arm,"
        f" converted,"
        f" CAST(LEAST((_d - _d0) // 7 + 1, 5) AS BIGINT) AS look_week"
        f" FROM ({base}) b CROSS JOIN"
        f" (SELECT MIN(_d) AS _d0 FROM ({base})) m"
    )
    return sequential_ab_sql(
        g, "arm", "ctl", "trt", "converted", "look_week", n_looks=5
    )


QUERIES.update({"sequential_ab": Q(q_sequential_ab, _sql_sequential_ab())})


def q_cmh_test(spark, sf_dir):
    """Cochran–Mantel–Haenszel stratified 2×2 (analytics.cmh_test):
    URGENT vs HIGH order fill rate stratified by order year — the
    Simpson's-paradox-proof comparison (year mix shifts confound the
    pooled z), with the Mantel–Haenszel common odds ratio and its
    Robins–Breslow–Greenland 95% CI.  Per-stratum quantized rationals,
    DECIMAL cross-stratum sums."""
    from timeseriesutils_spark.operators.analytics import cmh_test

    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.year(F.col("o_orderdate").cast("date")).cast("int").alias(
            "order_year"
        ),
        F.col("o_orderpriority").alias("prio"),
        (F.col("o_orderstatus") == F.lit("F")).alias("filled"),
    )
    return cmh_test(
        d, "prio", "1-URGENT", "2-HIGH", "filled", "order_year"
    )


def _sql_cmh_test():
    from timeseriesutils_spark.operators.analytics import cmh_test_sql

    d = (
        "SELECT CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS INT)"
        " AS order_year, o_orderpriority AS prio,"
        " o_orderstatus = 'F' AS filled FROM orders"
    )
    return cmh_test_sql(
        d, "prio", "1-URGENT", "2-HIGH", "filled", "order_year"
    )


QUERIES.update({"cmh_test": Q(q_cmh_test, _sql_cmh_test())})


def q_woolf_test(spark, sf_dir):
    """Woolf odds-ratio homogeneity across order years (analytics.
    woolf_test): the companion cmh_test needs — is a COMMON
    URGENT-vs-HIGH fill-rate odds ratio defensible across years, or
    does the effect differ by stratum?  Haldane +1/2 cells, quantized
    per-stratum ln-OR/weights, sufficient-stats collapse, WH chi2
    kernel."""
    from timeseriesutils_spark.operators.analytics import woolf_test

    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.year(F.col("o_orderdate").cast("date")).cast("int").alias(
            "order_year"
        ),
        F.col("o_orderpriority").alias("prio"),
        (F.col("o_orderstatus") == F.lit("F")).alias("filled"),
    )
    return woolf_test(
        d, "prio", "1-URGENT", "2-HIGH", "filled", "order_year"
    )


def _sql_woolf_test():
    from timeseriesutils_spark.operators.analytics import woolf_test_sql

    d = (
        "SELECT CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS INT)"
        " AS order_year, o_orderpriority AS prio,"
        " o_orderstatus = 'F' AS filled FROM orders"
    )
    return woolf_test_sql(
        d, "prio", "1-URGENT", "2-HIGH", "filled", "order_year"
    )


QUERIES.update({"woolf_test": Q(q_woolf_test, _sql_woolf_test())})


def q_label_propagation(spark, sf_dir):
    """Community detection via synchronous label propagation
    (operators/graph.label_propagation) on the supplier co-supply
    graph (the triangle_count edge set): 5 deterministic rounds
    (count-then-label tiebreak), Pregel-superstep shape with per-round
    lineage checkpoints."""
    from timeseriesutils_spark.operators.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") >= TRI_QTY
    )
    ps = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    edges = (
        ps.alias("a")
        .join(ps.alias("b"), "p")
        .where(F.col("a.s") < F.col("b.s"))
        .select(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .distinct()
    )
    return label_propagation(edges, n_iter=5)


def _sql_label_propagation():
    from timeseriesutils_spark.operators.graph import label_propagation_sql

    edges = f"""
  WITH ps AS (
    SELECT DISTINCT l_partkey AS p, l_suppkey AS s
    FROM lineitem WHERE l_quantity >= {TRI_QTY}
  )
  SELECT DISTINCT a.s AS src, b.s AS dst
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
"""
    return label_propagation_sql(edges, n_iter=5)


QUERIES.update(
    {"label_propagation": Q(q_label_propagation, _sql_label_propagation())}
)


def q_did_estimator(spark, sf_dir):
    """Difference-in-differences (operators/analytics.did_estimator):
    md5-parity treatment arms x a Jan-16 mid-range cutover on event values — the
    quasi-experimental companion to ab_test_report/cuped_adjust; one
    map-combinable 2x2 cell aggregation, closed-form DiD + unpooled SE."""
    from timeseriesutils_spark.operators.analytics import did_estimator

    return did_estimator(load_table(spark, sf_dir, "events"), "value")


def _sql_did_estimator():
    from timeseriesutils_spark.operators.analytics import did_estimator_sql

    return did_estimator_sql("events", "value")


QUERIES.update({"did_estimator": Q(q_did_estimator, _sql_did_estimator())})


def q_yuen_test(spark, sf_dir):
    """Yuen trimmed-mean robust two-sample test (operators/stats.
    yuen_test): 20%-trimmed order-value difference between urgent and
    low priority with the winsorized-variance SE — the heavy-tail-safe
    companion to welch_ttest on the same arms."""
    from timeseriesutils_spark.operators.stats import yuen_test

    return yuen_test(
        load_table(spark, sf_dir, "orders"), "o_totalprice",
        "o_orderpriority", "1-URGENT", "5-LOW", trim=0.2,
    )


def _sql_yuen_test():
    from timeseriesutils_spark.operators.stats import yuen_test_sql

    return yuen_test_sql(
        "orders", "o_totalprice", "o_orderpriority", "1-URGENT", "5-LOW",
        trim=0.2,
    )


QUERIES.update({"yuen_test": Q(q_yuen_test, _sql_yuen_test())})
