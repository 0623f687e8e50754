"""Sinks: parquet writers shaped for the engine's read patterns.

Two layout decisions carry the 100 TB story:

  * ``partitionBy(group)`` when the group column is low-cardinality
    (region/nation-like): readers touching one group prune whole
    directories before any IO.
  * For high-cardinality groups (supplier/user), directory-per-group
    would melt the filesystem; instead ``write_series`` repartitions by a
    stable hash of the group (``n_files`` output files) and sorts within
    partitions by (group, time).  Every group lives in exactly one file,
    rows pre-sorted — window operators over (group, time) then read data
    already clustered, parquet min/max row-group stats prune time ranges,
    and a downstream engine can treat the layout as bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list


def write_partitioned(
    df: DataFrame, path: str, partition_cols, mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet — for LOW-cardinality partition keys."""
    df.write.partitionBy(*_as_list(partition_cols)).mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    group_columns,
    order_by,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Catalog-backed bucketed+sorted layout — the zero-shuffle path for
    window featurization.

    ``bucketBy(group)`` records hash-partitioning in the table metadata,
    so a later ``Window.partitionBy(group)`` (or groupBy/join on it)
    needs NO exchange — the scan already satisfies the distribution
    (asserted in tests/test_plans.py).  ``sortBy(group, time)`` sorts
    within each bucket file.  At 100 TB this converts every featurization
    run over the same keys from shuffle-the-world to a pure map stage.
    """
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    spark = df.sparkSession
    if mode == "overwrite":
        # an in-memory catalog forgets tables between sessions while their
        # warehouse files remain; saveAsTable then fails with
        # LOCATION_ALREADY_EXISTS.  Drop both halves so overwrite is
        # idempotent across sessions.  (Single-part table names in the
        # default database; a persistent metastore deployment wouldn't
        # hit this.)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        import os
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if wh.scheme in ("", "file"):
            shutil.rmtree(os.path.join(wh.path, table.lower()), ignore_errors=True)
    (
        df.write.bucketBy(n_buckets, groups[0], *groups[1:])
        .sortBy(*(groups + order))
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )


def write_series(
    df: DataFrame,
    path: str,
    group_columns,
    order_by,
    n_files: int = 200,
    mode: str = "overwrite",
) -> None:
    """Hash-clustered, time-sorted parquet for HIGH-cardinality groups.

    repartition(n_files, groups) keeps each group whole in one file;
    sortWithinPartitions(groups, time) gives in-file clustering so later
    ``Window.partitionBy(groups).orderBy(time)`` scans sorted runs.
    """
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    (
        df.repartition(n_files, *[F.col(g) for g in groups])
        .sortWithinPartitions(*groups, *order)
        .write.mode(mode)
        .parquet(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (columnar, compressed) — parquet-equivalent layout rules
    apply: pair with ``repartition``/``sortWithinPartitions`` upstream."""
    df.write.mode(mode).orc(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — the interchange format for downstream tokenizer
    / training-loader pipelines that stream text records."""
    df.write.mode(mode).json(path)
