"""Declared query catalog: every operator in SURVEY.md §2 as a
(spark builder, DuckDB oracle SQL) pair.

``catalog()`` returns {name: Q}; Q.sql is None for genuinely
non-SQL-expressible ops (FFT, hash-seeded LSH) → driver rows-only check.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Q:
    spark: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]


def catalog() -> dict[str, Q]:
    from timeseriesutils_spark.queries import (
        analytics_queries,
        featurize_queries,
        forecast_queries,
        llm_queries,
        relational_queries,
        series_queries,
        streaming_queries,
    )

    out: dict[str, Q] = {}
    for mod in (
        featurize_queries,
        relational_queries,
        series_queries,
        forecast_queries,
        analytics_queries,
        llm_queries,
        streaming_queries,
    ):
        dup = set(out) & set(mod.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        out.update(mod.QUERIES)
    return out
