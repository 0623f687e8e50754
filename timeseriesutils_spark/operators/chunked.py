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
    if context_rows > chunk_rows:
        raise ValueError(
            f"context_rows ({context_rows}) must be ≤ chunk_rows ({chunk_rows}): "
            "a chunk must fully contain its successor's context"
        )
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


def chunked_domfreq(
    data: DataFrame,
    columns,
    group_columns,
    order_by,
    window_size: int = 21,
    n_domfreq: int = 5,
    fs: float = 1.0,
    detrend="linear",
    chunk_rows: int = 1_000_000,
):
    """Chunk-parallel trailing :func:`~.domfreq.domfreq` for monster groups.

    Trailing windows reach back w−1 rows, so ``context_rows = w−1``
    reproduces every complete window exactly; the duplicate-head padding
    only ever applies to the group's FIRST chunk (later chunks' original
    rows sit at synthetic positions ≥ context ≥ w−1, past the padded
    region), so results are bit-identical to the unchunked op
    (property-tested in tests/test_chunked.py).
    """
    w = max(_as_list(window_size))

    def apply_fn(df, g):
        from timeseriesutils_spark.operators.domfreq import domfreq

        return domfreq(
            df,
            columns,
            g,
            window_size=window_size,
            window_align="trailing",
            n_domfreq=n_domfreq,
            fs=fs,
            detrend=detrend,
            order_by=order_by,
        )

    return chunked_trailing_features(
        data, group_columns, order_by, apply_fn,
        chunk_rows=chunk_rows, context_rows=w - 1,
    )


def chunked_taylor_trailing(
    data: DataFrame,
    columns,
    group_columns,
    order_by,
    taylor_degree: int = 1,
    window_size: int = 21,
    ew_span=None,
    fill_edges: bool = True,
    strict_reference_edges: bool = True,
    chunk_rows: int = 1_000_000,
):
    """Chunk-parallel trailing :func:`~.taylor.windowed_taylor_coefs`.

    ``context_rows = w`` (not w−1): the trailing edge dispatch keys on the
    row index — under strict reference edges interior fills start at
    rn0 = w, so an original row must land at synthetic position ≥ w for
    the edge CASE to fall through to the interior fit, exactly as it does
    at its true group position.  Edge fits computed for context rows are
    dropped with them.  Bit-identical to unchunked (property-tested).
    """
    w = max(_as_list(window_size))

    def apply_fn(df, g):
        from timeseriesutils_spark.operators.taylor import windowed_taylor_coefs

        return windowed_taylor_coefs(
            df,
            columns,
            g,
            taylor_degree=taylor_degree,
            window_size=window_size,
            window_align="trailing",
            ew_span=ew_span,
            fill_edges=fill_edges,
            order_by=order_by,
            strict_reference_edges=strict_reference_edges,
        )

    return chunked_trailing_features(
        data, group_columns, order_by, apply_fn,
        chunk_rows=chunk_rows, context_rows=w,
    )
