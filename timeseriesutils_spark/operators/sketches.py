"""Bounded-memory frequency sketching: exact heavy hitters in two passes.

The naive exact top-frequency query (``GROUP BY item HAVING count >
n·φ``) shuffles EVERY distinct item — at 100 TB the word/URL/n-gram
universe is billions of keys and the exchange dwarfs the answer.  The
classic fix is a two-pass plan whose state is bounded by 1/φ, not by the
universe:

  pass 1 (candidates): each partition runs a Misra–Gries summary with
      k = ⌈2/φ⌉ counters over its rows (``mapInPandas`` — one output row
      per surviving counter, so the driver collect is O(partitions·k)).
      MG's guarantee: an item with c occurrences in a partition of n_p
      rows keeps weight ≥ c − n_p/k there, so any item with global
      frequency > n·φ ≥ n·2/k retains positive weight in at least one
      partition summary → the candidate set is a SUPERSET of the true
      heavy hitters (false positives possible, false negatives not).
  pass 2 (exact): broadcast the candidate set, recount ONLY those items
      exactly, keep count ≥ ⌈n·φ⌉.

The result is EXACT (same rows as the full GROUP BY — that is what the
DuckDB oracle checks) while the shuffle carries at most |candidates|
keys and executor memory stays O(k) per task.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    min_frac: float = 0.001,
) -> DataFrame:
    """Items whose exact frequency is ≥ ``⌈min_frac · total rows⌉``, with
    their exact counts: (item, n) — identical rows to the full GROUP BY,
    computed with bounded memory (module docstring).

    Runs two small driver-blocking jobs up front (the total row count and
    the candidate collect, bounded by partitions × ⌈2/min_frac⌉) before
    returning the lazy exact recount plan.
    """
    if not 0 < min_frac < 1:
        raise ValueError("min_frac must be in (0, 1)")
    k = math.ceil(2.0 / min_frac)

    def part(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:  # MG state carries across Arrow batches
            for v in pdf[item_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [key for key, c in counters.items() if c == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"item": list(counters)})

    src = items.select(F.col(item_col).cast("string").alias(item_col)).filter(
        F.col(item_col).isNotNull()
    )
    cand = {
        r.item
        for r in src.mapInPandas(part, "item string").collect()
        if r.item is not None
    }
    threshold = math.ceil(src.count() * min_frac)
    cand_df = items.sparkSession.createDataFrame(
        [(c,) for c in sorted(cand)], f"{item_col} string"
    )
    return (
        src.join(F.broadcast(cand_df), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )


def heavy_hitters_sql(
    source_sql: str,
    item_col: str,
    min_frac: float = 0.001,
) -> str:
    """DuckDB twin: the full GROUP BY the two-pass plan is equivalent to.
    ``source_sql`` must yield one row per (non-null) item occurrence."""
    return f"""
WITH src AS (
  SELECT CAST({item_col} AS VARCHAR) AS {item_col} FROM ({source_sql})
  WHERE {item_col} IS NOT NULL
),
tot AS (SELECT COUNT(*) AS n FROM src)
SELECT {item_col}, COUNT(*) AS n
FROM src GROUP BY 1
HAVING COUNT(*) >= CEIL((SELECT n FROM tot) * {min_frac})
"""
