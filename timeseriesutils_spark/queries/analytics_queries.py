"""Declared queries for the event-analytics operators
(operators/analytics.py) plus the corpus-retrieval text ops — the
product-analytics / hypertable workload a time-series engine serves
(SURVEY.md §2.2 capability-parity; the reference delegates all
aggregation to its caller, SURVEY.md §2.3).
"""

from __future__ import annotations

from timeseriesutils_spark.operators.analytics import (
    cohort_retention,
    cohort_retention_sql,
    funnel_counts,
    funnel_counts_sql,
    time_rollup,
    time_rollup_sql,
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


QUERIES = {
    "time_rollup": Q(q_time_rollup, time_rollup_sql()),
    "funnel": Q(q_funnel, funnel_counts_sql(steps=FUNNEL_STEPS)),
    "cohort_retention": Q(q_cohort_retention, cohort_retention_sql()),
    "boilerplate_frac": Q(
        q_boilerplate_frac, cross_doc_dup_fraction_sql(n=5, min_docs=3)
    ),
    "bm25_search": Q(q_bm25, bm25_search_sql(terms=BM25_TERMS)),
}
