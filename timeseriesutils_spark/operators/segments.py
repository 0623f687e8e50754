"""Customer/value segmentation: RFM scoring and ABC (Pareto) analysis —
the two canonical business-segmentation reports over a transaction log.

Both follow the same two-tier scale shape as ``quantile_bin`` and
``top_paths``: the heavy fact table is reduced by a map-combinable
per-entity aggregation first, and only the entity-sized result (one row
per customer / per part) crosses the final total-order window.  That
final window is a single-partition sort by construction — global
quantile assignment and global cumulative share require a total order —
which is fine for dimension-sized inputs (millions of entities); for
billions of entities swap the NTILE stage for approx-quantile
boundaries + broadcast classification (operators/stats.quantile_bins
documents the same trade).

Exactness: monetary values aggregate as exact integer cents in
DECIMAL(38,0); NTILE and cumulative sums order by (value, entity id) so
ties are deterministic; the only doubles are final single-op divisions
of exact integers — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rfm_segments(
    orders: DataFrame,
    customer_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> DataFrame:
    """Per-customer RFM (recency/frequency/monetary) quintile scores and
    a named segment.

    Scores are 1…``n_tiles`` with ``n_tiles`` best (most recent / most
    frequent / highest spend).  Segment rules (the standard marketing
    map): champions (R≥4, F≥4), loyal (F≥4), recent (R≥4, F≤2),
    at_risk (R≤2, F≥3), hibernating (R≤2, F≤2), else regular.
    """
    cents = F.floor(F.col(amount_col) * 100 + F.lit(0.5)).cast("bigint")
    per_cust = orders.groupBy(customer_col).agg(
        F.max(F.to_date(ts_col)).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents.cast("decimal(38,0)")).alias("_cents"),
    )
    ref = per_cust.agg(F.max("_last").alias("_ref"))
    base = per_cust.crossJoin(F.broadcast(ref)).select(
        F.col(customer_col),
        F.datediff(F.col("_ref"), F.col("_last")).cast("bigint").alias("recency_days"),
        "frequency",
        (F.col("_cents").cast("double") / 100).alias("monetary"),
        F.col("_cents"),
    )
    w_r = Window.orderBy(F.desc("recency_days"), F.asc(customer_col))
    w_f = Window.orderBy(F.asc("frequency"), F.asc(customer_col))
    w_m = Window.orderBy(F.asc("_cents"), F.asc(customer_col))
    scored = base.select(
        customer_col,
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(n_tiles).over(w_r).alias("r_score"),
        F.ntile(n_tiles).over(w_f).alias("f_score"),
        F.ntile(n_tiles).over(w_m).alias("m_score"),
    )
    r, f = F.col("r_score"), F.col("f_score")
    segment = (
        F.when((r >= 4) & (f >= 4), "champions")
        .when(f >= 4, "loyal")
        .when((r >= 4) & (f <= 2), "recent")
        .when((r <= 2) & (f >= 3), "at_risk")
        .when((r <= 2) & (f <= 2), "hibernating")
        .otherwise("regular")
    )
    return scored.withColumn("segment", segment)


def rfm_segments_sql(
    table: str = "orders",
    customer_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
) -> str:
    """DuckDB twin of :func:`rfm_segments`."""
    return f"""
WITH per_cust AS (
  SELECT {customer_col},
    MAX(CAST({ts_col} AS DATE)) AS _last,
    COUNT(*) AS frequency,
    SUM(CAST(FLOOR({amount_col} * 100 + 0.5) AS BIGINT)) AS _cents
  FROM {table} GROUP BY {customer_col}
),
base AS (
  SELECT {customer_col},
    CAST(date_diff('day', _last, (SELECT MAX(_last) FROM per_cust)) AS BIGINT)
      AS recency_days,
    frequency,
    CAST(_cents AS DOUBLE) / 100 AS monetary,
    _cents
  FROM per_cust
),
scored AS (
  SELECT {customer_col}, recency_days, frequency, monetary,
    CAST(ntile({n_tiles}) OVER (ORDER BY recency_days DESC, {customer_col} ASC) AS INT) AS r_score,
    CAST(ntile({n_tiles}) OVER (ORDER BY frequency ASC, {customer_col} ASC) AS INT) AS f_score,
    CAST(ntile({n_tiles}) OVER (ORDER BY _cents ASC, {customer_col} ASC) AS INT) AS m_score
  FROM base
)
SELECT {customer_col}, recency_days, frequency, monetary,
  r_score, f_score, m_score,
  CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champions'
       WHEN f_score >= 4 THEN 'loyal'
       WHEN r_score >= 4 AND f_score <= 2 THEN 'recent'
       WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
       WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
       ELSE 'regular' END AS segment
FROM scored
"""


def abc_analysis(
    facts: DataFrame,
    entity_col: str = "l_partkey",
    amount_col: str = "l_extendedprice",
    thresholds: tuple[float, float] = (0.8, 0.95),
) -> DataFrame:
    """ABC / Pareto classification: entities ranked by revenue, classed
    A while the cumulative revenue share (including the current entity)
    is ≤ ``thresholds[0]``, B while ≤ ``thresholds[1]``, else C.

    Returns (entity, revenue, cum_share, abc_class, rnk).
    """
    cents = F.floor(F.col(amount_col) * 100 + F.lit(0.5)).cast("bigint")
    rev = facts.groupBy(entity_col).agg(
        F.sum(cents.cast("decimal(38,0)")).alias("_cents")
    )
    w = Window.orderBy(F.desc("_cents"), F.asc(entity_col))
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = F.sum("_cents").over(w_cum).cast("double") / F.sum("_cents").over(
        w_all
    ).cast("double")
    a, b = thresholds
    return rev.select(
        entity_col,
        (F.col("_cents").cast("double") / 100).alias("revenue"),
        share.alias("cum_share"),
        F.when(share <= F.lit(a), "A")
        .when(share <= F.lit(b), "B")
        .otherwise("C")
        .alias("abc_class"),
        F.row_number().over(w).cast("int").alias("rnk"),
    )


def abc_analysis_sql(
    table: str = "lineitem",
    entity_col: str = "l_partkey",
    amount_col: str = "l_extendedprice",
    thresholds: tuple[float, float] = (0.8, 0.95),
) -> str:
    """DuckDB twin of :func:`abc_analysis`."""
    a, b = thresholds
    win = f"ORDER BY _cents DESC, {entity_col} ASC"
    cum = f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    alls = "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    share = (
        f"CAST(SUM(_cents) OVER ({win} {cum}) AS DOUBLE) / "
        f"CAST(SUM(_cents) OVER ({win} {alls}) AS DOUBLE)"
    )
    return f"""
WITH rev AS (
  SELECT {entity_col},
    SUM(CAST(FLOOR({amount_col} * 100 + 0.5) AS BIGINT)) AS _cents
  FROM {table} GROUP BY {entity_col}
)
SELECT {entity_col},
  CAST(_cents AS DOUBLE) / 100 AS revenue,
  {share} AS cum_share,
  CASE WHEN {share} <= {a!r} THEN 'A'
       WHEN {share} <= {b!r} THEN 'B' ELSE 'C' END AS abc_class,
  CAST(row_number() OVER ({win}) AS INT) AS rnk
FROM rev
"""
