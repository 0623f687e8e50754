"""Skewed-group mitigation for trailing window features (SURVEY §4.2).

A window over (group, time) serializes each group into one task; one
monster group (a single hot location/user/symbol) then bounds the whole
stage.  For TRAILING row-frame features (lag, rollmean, trailing
taylor), the fix is chunking: split each group's timeline into chunks,
prepend to every chunk the last ``context_rows`` rows of the previous
chunk, compute the features with the chunk id added to the partition
key (parallel across chunks), and drop the context rows.  A feature
whose frame reaches back at most ``context_rows`` rows sees exactly the
same window contents as in the unchunked plan — results are identical
(property-tested), but the parallelism is rows/chunk instead of
rows/group.

Requirements (checked where cheap, documented otherwise):
  * trailing frames only (a centered/leading frame would also need
    context from the NEXT chunk — not provided here);
  * ``context_rows`` ≥ the widest frame reach (w−1 for rollmean w,
    max lag for lag);
  * every non-first chunk of a group must have ≥ ``context_rows`` rows
    in its predecessor — guaranteed by construction here because chunks
    are built by row count, not by time bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list


def with_row_chunks(
    data: DataFrame,
    group_columns,
    order_by,
    chunk_rows: int,
) -> DataFrame:
    """Assign ``_chunk`` = row_number-within-group div chunk_rows.

    This itself is one pass of the group-serial window it is meant to
    relieve — but it is a *cheap* pass (one int per row, no feature
    arithmetic), and on a real deployment the chunk id comes for free
    from the ingestion layer (file/offset position per key) instead.
    """
    g = _as_list(group_columns)
    order = _as_list(order_by)
    w = Window.partitionBy(*g).orderBy(*order)
    return data.withColumn(
        "_chunk", ((F.row_number().over(w) - 1) / F.lit(chunk_rows)).cast("bigint")
    )


def chunked_trailing_features(
    data: DataFrame,
    group_columns,
    order_by,
    apply_fn,
    chunk_rows: int = 1_000_000,
    context_rows: int = 64,
):
    """Compute trailing window features chunk-parallel.

    ``apply_fn(df, group_columns) -> (df, feature_names)`` must build its
    windows as ``Window.partitionBy(*group_columns).orderBy(order_by)`` —
    i.e. any of the engine's trailing feature builders partially applied
    over everything except ``data`` and ``group_columns``.

    Returns the same (DataFrame, names) the unchunked call would, with
    partition key (groups…, _chunk) during the feature pass.
    """
    g = _as_list(group_columns)
    order = _as_list(order_by)
    d = with_row_chunks(data, g, order, chunk_rows)
    # context = last context_rows rows of each (group, chunk), re-tagged
    # to the NEXT chunk; row-count chunking guarantees every non-final
    # chunk has exactly chunk_rows ≥ context_rows rows
    wd = Window.partitionBy(*g, "_chunk").orderBy(
        *[F.col(c).desc() for c in order]
    )
    ctx = (
        d.withColumn("_rrn", F.row_number().over(wd))
        .filter(F.col("_rrn") <= context_rows)
        .drop("_rrn")
        .withColumn("_chunk", F.col("_chunk") + 1)
        .withColumn("_ctx", F.lit(1))
    )
    full = d.withColumn("_ctx", F.lit(0)).unionByName(ctx)
    out, names = apply_fn(full, g + ["_chunk"])
    return out.filter(F.col("_ctx") == 0).drop("_ctx", "_chunk"), names
