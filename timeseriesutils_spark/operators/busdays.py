"""Business-day arithmetic — SLA / lead-time analytics on a working
calendar: how many Mon–Fri days (minus holidays) elapsed between two
dates.  ``networkdays`` in spreadsheets, ``np.busday_count`` in numpy;
neither Spark nor ANSI SQL has it natively.

Closed form, no calendar table join: with m = days since a Monday epoch
(1970-01-05), the weekend days in (epoch, d] are

    w(m) = 2·⌊m/7⌋ + max(0, m mod 7 − 4)

so business days in (d1, d2] = (m2 − m1) − (w(m2) − w(m1)), pure int64
expressions.  Holidays are a small driver-side list: the operator
pre-filters it to weekdays and emits one literal range test per
holiday — O(|holidays|) comparisons per row, no join, exactly the
broadcast-literal pattern of calendar_features (operators/forecast.py).

Everything is exact integer arithmetic — bit-identical across engines.
Dates before the epoch Monday are supported via floored division
semantics (both engines' ``%``/``mod`` differ on negatives, so m is
shifted by a large multiple of 7 to stay positive — valid for any date
after year 1 CE).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH_MONDAY = "1970-01-05"
_SHIFT = 7 * 1_000_000  # keeps m positive for any date back to ~ year -740


def _w(m: Column) -> Column:
    """Weekend days from the (shifted) Monday epoch through day m."""
    return 2 * F.floor(m / 7).cast("bigint") + F.greatest(
        F.lit(0).cast("bigint"), (m % 7) - 4
    )


def business_days_between(d1: Column, d2: Column, holidays=()) -> Column:
    """Business days in the half-open interval (d1, d2] (0 when
    d2 ≤ d1 and the dates span no working day).  ``holidays``:
    iterable of 'YYYY-MM-DD' strings; weekend holidays are ignored."""
    m1 = (
        F.datediff(F.to_date(d1), F.to_date(F.lit(_EPOCH_MONDAY))).cast("bigint")
        + F.lit(_SHIFT)
    )
    m2 = (
        F.datediff(F.to_date(d2), F.to_date(F.lit(_EPOCH_MONDAY))).cast("bigint")
        + F.lit(_SHIFT)
    )
    out = (m2 - m1) - (_w(m2) - _w(m1))
    for h in holidays:
        if _dt.date.fromisoformat(h).weekday() >= 5:
            continue  # weekend holiday: already not a business day
        hd = F.to_date(F.lit(h))
        out = out - (
            (hd > F.to_date(d1)) & (hd <= F.to_date(d2))
        ).cast("bigint")
    return out


def business_days_between_sql(d1: str, d2: str, holidays=()) -> str:
    """DuckDB twin expression of :func:`business_days_between`."""

    def m(d: str) -> str:
        return (
            f"(date_diff('day', DATE '{_EPOCH_MONDAY}', CAST({d} AS DATE))"
            f" + {_SHIFT})"
        )

    def w(mm: str) -> str:
        return (
            f"(2 * CAST(FLOOR({mm} / 7) AS BIGINT)"
            f" + GREATEST(CAST(0 AS BIGINT), ({mm} % 7) - 4))"
        )

    m1, m2 = m(d1), m(d2)
    out = f"(({m2} - {m1}) - ({w(m2)} - {w(m1)}))"
    for h in holidays:
        if _dt.date.fromisoformat(h).weekday() >= 5:
            continue
        out += (
            f" - CAST(DATE '{h}' > CAST({d1} AS DATE)"
            f" AND DATE '{h}' <= CAST({d2} AS DATE) AS BIGINT)"
        )
    return out


def shipping_sla_report(
    lineitem: DataFrame,
    orders: DataFrame,
    holidays=(),
    group_col: str = "o_orderpriority",
) -> DataFrame:
    """Lead-time SLA rollup: business days from order date to ship date
    per priority class — (group, n, total_bdays, mean_bdays, max_bdays).
    One orderkey-keyed join, then a map-combinable reduce of exact
    integer day counts."""
    j = lineitem.join(
        orders.select("o_orderkey", "o_orderdate", group_col),
        lineitem["l_orderkey"] == orders["o_orderkey"],
    )
    bd = business_days_between(F.col("o_orderdate"), F.col("l_shipdate"), holidays)
    return (
        j.select(F.col(group_col), bd.alias("_bd"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_bd").alias("total_bdays"),
            (F.sum("_bd").cast("double") / F.count(F.lit(1))).alias("mean_bdays"),
            F.max("_bd").alias("max_bdays"),
        )
    )


def shipping_sla_report_sql(
    holidays=(),
    group_col: str = "o_orderpriority",
) -> str:
    """DuckDB twin of :func:`shipping_sla_report`."""
    bd = business_days_between_sql("o.o_orderdate", "l.l_shipdate", holidays)
    return f"""
WITH j AS (
  SELECT o.{group_col}, {bd} AS _bd
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT {group_col}, COUNT(*) AS n,
  CAST(SUM(_bd) AS BIGINT) AS total_bdays,
  CAST(SUM(_bd) AS DOUBLE) / COUNT(*) AS mean_bdays,
  MAX(_bd) AS max_bdays
FROM j GROUP BY {group_col}
"""
