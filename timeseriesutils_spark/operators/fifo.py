"""FIFO lot allocation — match outgoing quantities against incoming
lots in first-in-first-out order: inventory costing (COGS), tax-lot
matching for trades, capacity back-allocation.  The textbook "advanced
windowing" problem that looks sequential but has an exact closed form:

Per item, buys and sells are independently laid out on a cumulative-
quantity axis (running sums in arrival order).  Buy lot i occupies the
half-open interval [B_{i−1}, B_i); sell j occupies [S_{j−1}, S_j).
FIFO allocates sell j to buy i exactly where the intervals overlap:

    qty(i, j) = max(0, min(B_i, S_j) − max(B_{i−1}, S_{j−1}))

— two window passes (one per side) and ONE within-item interval-overlap
join.  No iteration, no per-item loop.

Scale shape: the join key is the item, so the pair work is Σ_item
(buys × sells) *candidate* checks but only O(buys + sells) survivors
(consecutive intervals on a shared axis interleave linearly).  For
monster items, bin the cumulative axis first and join on (item, bin) —
the same bounded-range-join trick as queries/relational_queries.
q_range_join; the declared query's per-item cardinalities don't need
it.  Quantities are exact int64 (quantize upstream); every interval
endpoint is an exact running sum — bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fifo_allocation(
    txns: DataFrame,
    item_col: str,
    qty_col: str,
    is_buy_col: str,
    order_cols: list[str],
    id_col: str,
) -> DataFrame:
    """FIFO-match sells to buy lots per item.

    ``txns`` holds both sides; ``is_buy_col`` (boolean) separates them;
    ``order_cols`` define the FIFO arrival order within item and side
    (must be a total order — include a unique tiebreak); ``qty_col``
    must be integral (bigint).  Returns one row per (item, buy, sell)
    allocation: (item, buy_id, sell_id, qty_alloc) — ``id_col`` values
    of the matched transactions.
    """
    order = [F.col(c).asc() for c in order_cols]
    w = (
        Window.partitionBy(item_col, is_buy_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = txns.select(
        F.col(item_col).alias("_item"),
        F.col(is_buy_col).alias("_buy"),
        F.col(id_col).alias("_id"),
        F.col(qty_col).alias("_q"),
        F.sum(qty_col).over(w).alias("_end"),
    ).withColumn("_start", F.col("_end") - F.col("_q"))
    buys = cum.filter(F.col("_buy")).select(
        F.col("_item"),
        F.col("_id").alias("buy_id"),
        F.col("_start").alias("_bs"),
        F.col("_end").alias("_be"),
    )
    sells = cum.filter(~F.col("_buy")).select(
        F.col("_item").alias("_item_s"),
        F.col("_id").alias("sell_id"),
        F.col("_start").alias("_ss"),
        F.col("_end").alias("_se"),
    )
    j = buys.join(
        sells,
        (F.col("_item") == F.col("_item_s"))
        & (F.col("_bs") < F.col("_se"))
        & (F.col("_ss") < F.col("_be")),
    )
    qty = F.least("_be", "_se") - F.greatest("_bs", "_ss")
    return j.select(
        F.col("_item").alias(item_col),
        "buy_id",
        "sell_id",
        qty.alias("qty_alloc"),
    ).filter(F.col("qty_alloc") > 0)  # zero-qty rows (zero-width lots) are noise


def fifo_allocation_sql(
    inner_sql: str,
    item_col: str,
    qty_col: str,
    is_buy_col: str,
    order_cols: list[str],
    id_col: str,
) -> str:
    """DuckDB twin of :func:`fifo_allocation` over ``inner_sql``."""
    order = ", ".join(f"{c} ASC" for c in order_cols)
    return f"""
WITH src AS ({inner_sql}),
cum AS (
  SELECT {item_col} AS _item, {is_buy_col} AS _buy, {id_col} AS _id,
    CAST(SUM({qty_col}) OVER (PARTITION BY {item_col}, {is_buy_col}
      ORDER BY {order} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) AS _end,
    CAST(SUM({qty_col}) OVER (PARTITION BY {item_col}, {is_buy_col}
      ORDER BY {order} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS BIGINT) - {qty_col} AS _start
  FROM src
)
SELECT b._item AS {item_col}, b._id AS buy_id, s._id AS sell_id,
  LEAST(b._end, s._end) - GREATEST(b._start, s._start) AS qty_alloc
FROM (SELECT * FROM cum WHERE _buy) b
JOIN (SELECT * FROM cum WHERE NOT _buy) s
  ON b._item = s._item AND b._start < s._end AND s._start < b._end
WHERE LEAST(b._end, s._end) - GREATEST(b._start, s._start) > 0
"""
