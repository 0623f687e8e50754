"""Z-order (Morton) layout keys for multi-dimensional data skipping.

The reference has no storage layer at all (eager in-memory pandas); at
100 TB the dominant cost is what you DON'T read, and min/max row-group
pruning only skips on the leading sort column.  Sorting by an
interleaved-bit Morton key makes files/row-groups tight in EVERY
interleaved dimension at once, so predicates on either column prune —
the standard lakehouse `ZORDER BY` technique, here as a plain column
expression + sorted parquet write (no table format required).

The key is pure integer bit arithmetic (shifts, masks, adds) — identical
in Spark and DuckDB, so the computation itself is oracle-checkable
exactly; the engineering claim (pruning) is asserted with row-group
statistics in tests.

Negative/NULL handling: inputs are rank-normalized by the caller or
assumed non-negative (< 2^bits); NULL propagates to a NULL key, which
sorts last — the "stats-less tail file" convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _interleave_sql(a: str, b: str, bits: int) -> str:
    """Bit-interleave expression text: a's bit i → position 2i, b's bit
    i → position 2i+1.  Plain shifts/ands/OR-as-sum — identical integer
    semantics in Spark SQL and DuckDB (operands are non-negative)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_key(col_a: str, col_b: str, bits: int = 21):
    """Morton key column for two non-negative integer columns
    (< 2^bits each; 21+21 bits fits a bigint with room to spare)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    a = f"CAST({col_a} AS BIGINT)"
    b = f"CAST({col_b} AS BIGINT)"
    return F.expr(
        f"CASE WHEN {col_a} IS NOT NULL AND {col_b} IS NOT NULL "
        f"THEN {_interleave_sql(a, b, bits)} END"
    )


def zorder_key_sql(col_a: str, col_b: str, bits: int = 21) -> str:
    """DuckDB twin expression text of :func:`zorder_key`."""
    a = f"CAST({col_a} AS BIGINT)"
    b = f"CAST({col_b} AS BIGINT)"
    return (
        f"CASE WHEN {col_a} IS NOT NULL AND {col_b} IS NOT NULL "
        f"THEN {_interleave_sql(a, b, bits)} END"
    )


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 21,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the (col_a, col_b) Morton
    key: range-repartition on the key (contiguous z-ranges per file —
    range, not hash, or file stats would overlap) then sort within
    partitions, so BOTH columns' parquet min/max stats are tight per
    file/row-group and predicate pushdown on either column skips.

    One range exchange (sampled bounds) + local sort — exactly the cost
    of any clustered write; the key column itself is dropped from the
    files (derivable, and keeping stats on it would add nothing)."""
    keyed = df.withColumn("_z", zorder_key(col_a, col_b, bits))
    # asc_nulls_last on BOTH the range partitioning and the local sort:
    # Spark's default ascending order places NULLs FIRST, which would put
    # the stats-less NULL-key rows in the leading file, violating the
    # documented tail-file convention.
    z_last = F.col("_z").asc_nulls_last()
    (
        keyed.repartitionByRange(n_files, z_last)
        .sortWithinPartitions(z_last)
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compaction_plan(
    file_stats: DataFrame,
    rows_col: str = "n_rows",
    order_cols=("part_key",),
    target_rows: int = 25_000,
) -> DataFrame:
    """Small-files compaction plan: assign each input file to an output
    bin of ~``target_rows`` rows, preserving the sort-key order.

    The 100 TB failure mode this serves: streaming / per-partition
    ingestion leaves millions of KB-sized files; listing and opening
    them dominates query time long before row decoding does.  Compaction
    = group adjacent files (adjacency preserves clustering/pruning) into
    bins near the target size, then rewrite one file per bin.

    The assignment is the metadata-sized part done here: bin id =
    start-offset binning, floor(cum_rows_before / target) over the
    key-ordered file list — a running sum + integer division, one window
    pass over a FILE-level relation (billions of data rows, ~thousands
    of file rows).  Deterministic, order-preserving, and every bin ends
    within one file of the target.  The rewrite itself is the engine's
    normal partitioned write (sources/sinks.py) driven by this plan.

    ``file_stats``: one row per file with ``rows_col`` and the ordering
    key columns.  Returns the input + ``bin_id`` + per-bin totals.
    """
    oc = list(order_cols)
    w = Window.orderBy(*oc).rowsBetween(Window.unboundedPreceding, -1)
    planned = file_stats.withColumn(
        "bin_id",
        # floor, not cast-truncation: DuckDB's double->bigint CAST rounds
        # while Spark's truncates; FLOOR is identical in both (operands
        # are non-negative file counts, < 2^53 by many orders)
        F.floor(
            F.coalesce(F.sum(rows_col).over(w), F.lit(0)) / F.lit(int(target_rows))
        ).cast("bigint"),
    )
    wb = Window.partitionBy("bin_id")
    return planned.withColumn("bin_rows", F.sum(rows_col).over(wb)).withColumn(
        "bin_files", F.count(F.lit(1)).over(wb)
    )


def compaction_plan_sql(
    inner_sql: str,
    rows_col: str = "n_rows",
    order_cols=("part_key",),
    target_rows: int = 25_000,
) -> str:
    """DuckDB twin of :func:`compaction_plan` over ``inner_sql``."""
    oc = ", ".join(order_cols)
    return f"""
WITH f AS ({inner_sql}),
p AS (
  SELECT *,
    CAST(FLOOR(COALESCE(SUM({rows_col}) OVER (ORDER BY {oc}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      / {int(target_rows)}) AS BIGINT) AS bin_id
  FROM f
)
SELECT *,
  CAST(SUM({rows_col}) OVER (PARTITION BY bin_id) AS BIGINT) AS bin_rows,
  COUNT(*) OVER (PARTITION BY bin_id) AS bin_files
FROM p
"""
