"""Column-level data profiling: per-column null counts, cardinality,
range, and mean in one long-format frame — the data-quality /
schema-drift check every ingestion pipeline runs before training.

One aggregate job per profiled column, unioned (each is a narrow scan
of just that column — column pruning keeps the IO per column minimal);
all partial aggregates are map-side combinable, so the whole profile is
a handful of light reduce stages even at 100 TB.  Numeric min/max/mean
are emitted as DOUBLE and string min/max as VARCHAR in separate fields
— no cross-engine float→string formatting is ever involved.

Exact distinct by default (one shuffle per column); pass
``approximate=True`` for HyperLogLog cardinality (no extra shuffle,
rows-only vs the oracle).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import davg, davg_sql

_NUMERIC_KINDS = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def _is_numeric(df: DataFrame, col: str) -> bool:
    t = dict(df.dtypes)[col]
    return any(t.startswith(k) for k in _NUMERIC_KINDS)


def column_profile(
    df: DataFrame, columns: list[str], approximate: bool = False
) -> DataFrame:
    """Long-format profile: one row per column with ``col_name, n_rows, n_null,
    n_distinct, min_num, max_num, mean_num, min_str, max_str``."""
    parts = []
    for c in columns:
        num = _is_numeric(df, c)
        d = F.col(c).cast("double") if num else None
        parts.append(
            df.select(c).agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("bigint")).alias("n_null"),
                (
                    F.approx_count_distinct(c) if approximate else F.countDistinct(c)
                ).alias("n_distinct"),
                (F.min(d) if num else F.lit(None).cast("double")).alias("min_num"),
                (F.max(d) if num else F.lit(None).cast("double")).alias("max_num"),
                (davg(d) if num else F.lit(None).cast("double")).alias("mean_num"),
                (
                    F.lit(None).cast("string") if num else F.min(F.col(c).cast("string"))
                ).alias("min_str"),
                (
                    F.lit(None).cast("string") if num else F.max(F.col(c).cast("string"))
                ).alias("max_str"),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def column_profile_sql(table: str, columns: list[str], numeric: dict[str, bool]) -> str:
    """DuckDB twin of :func:`column_profile` (exact-distinct form)."""
    parts = []
    for c in columns:
        if numeric[c]:
            mn = f"MIN(CAST({c} AS DOUBLE))"
            mx = f"MAX(CAST({c} AS DOUBLE))"
            me = davg_sql(f"CAST({c} AS DOUBLE)")
            ms = "CAST(NULL AS VARCHAR)"
            xs = "CAST(NULL AS VARCHAR)"
        else:
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            me = "CAST(NULL AS DOUBLE)"
            ms = f"MIN(CAST({c} AS VARCHAR))"
            xs = f"MAX(CAST({c} AS VARCHAR))"
        parts.append(
            f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
  CAST(SUM(CAST({c} IS NULL AS BIGINT)) AS BIGINT) AS n_null,
  COUNT(DISTINCT {c}) AS n_distinct,
  {mn} AS min_num, {mx} AS max_num, {me} AS mean_num,
  {ms} AS min_str, {xs} AS max_str
FROM {table}"""
        )
    return "\nUNION ALL\n".join(parts)


def key_skew_report(
    df: DataFrame, key_cols, count_col_alias: str = "n_rows"
) -> DataFrame:
    """Join/aggregation-key skew diagnostic: the frequency histogram
    that decides whether a key needs salting (functions/skew.py) or AQE
    skew-join splitting BEFORE the expensive shuffle runs.

    Per key-frequency power-of-two bucket (floor(log2(count)) computed
    exactly via binary-string length — no float log edge at 2^k):
    number of distinct keys and total rows.  A healthy key space puts
    most rows in low buckets; a monster key shows up as a lonely
    high bucket carrying a visible row share.

    Two map-combinable aggregations (key counts → bucket rollup);
    output is bucket-count-sized (≤ 64 rows)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_c"))
    bucket = (F.length(F.bin(F.col("_c"))) - 1).cast("int").alias("freq_bucket")
    return (
        per_key.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("_c").alias(count_col_alias),
            F.max("_c").alias("max_key_rows"),
        )
    )


def key_skew_report_sql(
    table: str, key_cols, count_col_alias: str = "n_rows"
) -> str:
    """DuckDB twin of :func:`key_skew_report`."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    kc = ", ".join(keys)
    return f"""
WITH per_key AS (SELECT {kc}, COUNT(*) AS _c FROM {table} GROUP BY {kc})
SELECT CAST(length(bin(_c)) - 1 AS INT) AS freq_bucket,
  COUNT(*) AS n_keys,
  CAST(SUM(_c) AS BIGINT) AS {count_col_alias},
  MAX(_c) AS max_key_rows
FROM per_key GROUP BY 1
"""
