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

Measured rule (round-6 monster-group study, BASELINE.md): chunk when
the largest group exceeds ~total_rows/cores rows — below that, the
plain window is already core-saturated and chunking only adds
overhead.  Use the DISTRIBUTED chunk-id assignment
(:func:`with_row_chunks_distributed`, via ``bucket=``) — the serial
row_number pass of :func:`with_row_chunks` is itself bounded by the
monster group and erased the entire win in measurement (4-group 64×:
32–34 s serial-chunked vs 28 s plain vs **8.3 s distributed-chunked**,
a 3.4× speedup over plain).  Pick ``chunk_rows`` so
monster_rows/chunk_rows ≈ a few × cores (32k for 2.4M rows on 32
cores; smaller chunks add per-chunk context overhead without extra
parallelism), and a bucket width ≈ 2× chunk_rows in order-key units.
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


def with_row_chunks_distributed(
    data: DataFrame,
    group_columns,
    order_by,
    chunk_rows: int,
    bucket,
) -> DataFrame:
    """Distributed twin of :func:`with_row_chunks` — the same ``_chunk``
    ids without the group-serial row_number pass (which itself bounds
    the stage by the monster group; measured: at 4 groups / 25% skew
    the serial chunk pass erased the whole chunking win, see
    BASELINE.md round-6 scaling table).

    ``bucket`` is a Column expression, monotone non-decreasing in the
    ``order_by`` key, with equal order values sharing a bucket (e.g.
    ``F.floor(F.col("t") / 86400)`` or ``F.date_trunc("month", ts)``) —
    on a real deployment this is the ingestion partition (file/day)
    and comes for free.  The global row number decomposes as

        rn = (rows of this group in EARLIER buckets) + rank within bucket

    so one map-combinable count per (group, bucket), a prefix-sum
    window over that DIMENSION-SIZED counts frame (group-serial but
    over bucket rows, not data rows — SURVEY §4.3 shape 4), a broadcast
    join back, and a per-(group, bucket) rank — every data-sized pass
    is parallel in the bucket dimension.  Choose the bucket width so
    buckets-per-group ≈ a few × cores; the counts frame stays
    dimension-sized.

    Bit-identical to :func:`with_row_chunks` whenever ``order_by`` is
    unique per group (property-tested in tests/test_chunked.py).
    """
    g = _as_list(group_columns)
    order = _as_list(order_by)
    d = data.withColumn("_bkt", bucket.cast("bigint"))
    counts = d.groupBy(*g, "_bkt").agg(F.count(F.lit(1)).alias("_c"))
    wb = (
        Window.partitionBy(*g)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        *g,
        "_bkt",
        F.coalesce(F.sum("_c").over(wb), F.lit(0)).alias("_off"),
    )
    wr = Window.partitionBy(*g, "_bkt").orderBy(*order)
    rn = F.row_number().over(wr) + F.col("_off")
    return (
        d.join(F.broadcast(offs), on=g + ["_bkt"])
        .withColumn("_chunk", ((rn - 1) / F.lit(chunk_rows)).cast("bigint"))
        .drop("_bkt", "_off")
    )


def chunked_trailing_features(
    data: DataFrame,
    group_columns,
    order_by,
    apply_fn,
    chunk_rows: int = 1_000_000,
    context_rows: int = 64,
    bucket=None,
):
    """Compute trailing window features chunk-parallel.

    ``apply_fn(df, group_columns) -> (df, feature_names)`` must build its
    windows as ``Window.partitionBy(*group_columns).orderBy(order_by)`` —
    i.e. any of the engine's trailing feature builders partially applied
    over everything except ``data`` and ``group_columns``.

    ``bucket`` (optional): a monotone order-value bucketing Column —
    when given, chunk ids are assigned by the fully-distributed
    :func:`with_row_chunks_distributed` instead of the group-serial
    row_number pass, removing the last serial data-sized stage.

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
    if bucket is not None:
        d = with_row_chunks_distributed(data, g, order, chunk_rows, bucket)
    else:
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
    bucket=None,
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
        chunk_rows=chunk_rows, context_rows=w - 1, bucket=bucket,
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
    bucket=None,
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
        chunk_rows=chunk_rows, context_rows=w, bucket=bucket,
    )
