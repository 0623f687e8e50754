"""Incremental (watermark-bounded) trailing featurization.

The reference recomputes every feature over the whole frame on every
call (eager pandas, no notion of "new rows" —
``/root/reference/src/timeseriesutils/featurize.py:167,224``).  A
production ingestion pipeline can't: at 100 TB the daily increment is
~0.1% of the corpus, and trailing features for the increment depend
only on each group's last ``context_rows`` of history.  This operator
is the batch-incremental pattern:

    features(new rows)  =  apply_fn(context ∪ new)  restricted to new

where *context* is the trailing ``context_rows`` rows per group at or
before the watermark.  Identical mechanics to the intra-group seam
handling in ``operators/chunked.py`` (context overlap, compute, drop) —
there the seams are row-count chunks inside one job, here the seam is
the ingestion watermark between jobs.

Correctness contract (tested bit-identical): for any trailing feature
builder whose window frame spans ≤ ``context_rows`` rows,
incremental output == the full-recompute output filtered to the new
rows.  ``context_rows`` must be ≥ the builder's max window minus 1 for
rollmean/lag-style features, and ≥ window for the strict-edge taylor
dispatch (same +1 rationale as chunked_taylor_trailing).

Scale shape: ONE filter on the scan for the increment (partition-prunes
when data is date-partitioned), one per-group window pass over history
to pick context rows — at 100 TB with a bucketed+sorted history table
this is a map-stage tail read, no full-history shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list


def featurize_increment(
    data: DataFrame,
    watermark,
    apply_fn,
    group_columns,
    order_by,
    context_rows: int,
):
    """Features for rows strictly after ``watermark`` (compared on the
    first ``order_by`` column), computed with ``context_rows`` of
    trailing history per group.

    ``apply_fn(df, group_columns) -> (df, feature_names)`` — any of the
    engine's trailing feature builders partially applied (same contract
    as ``chunked.chunked_trailing_features``).

    Returns (DataFrame of NEW rows + features, feature_names).
    """
    if context_rows < 0:
        raise ValueError("context_rows must be ≥ 0")
    g = _as_list(group_columns)
    order = _as_list(order_by)
    wm_col = order[0]
    new = data.filter(F.col(wm_col) > F.lit(watermark)).withColumn(
        "_inc_new", F.lit(1)
    )
    hist = data.filter(F.col(wm_col) <= F.lit(watermark))
    wd = Window.partitionBy(*g).orderBy(*[F.col(c).desc() for c in order])
    ctx = (
        hist.withColumn("_inc_rn", F.row_number().over(wd))
        .filter(F.col("_inc_rn") <= context_rows)
        .drop("_inc_rn")
        .withColumn("_inc_new", F.lit(0))
    )
    out, names = apply_fn(ctx.unionByName(new), g)
    return out.filter(F.col("_inc_new") == 1).drop("_inc_new"), names
