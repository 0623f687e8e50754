"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship featurization query at sf0.001 (smoke).
``queries()`` — one entry per implemented operator (SURVEY.md §2),
from the catalog in ``timeseriesutils_spark/queries/``.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (absent for
non-SQL-expressible ops → driver rows-only check).

Determinism (why value hashes match DuckDB bit-for-bit): total window
orders, exact DECIMAL accumulation for float aggregates, generated-twin
SQL for taylor, and the Java-regex ∩ RE2 syntax subset for text ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.pipeline import featurize_data
from timeseriesutils_spark.queries import catalog
from timeseriesutils_spark.queries.featurize_queries import LI_ORDER, _li
from timeseriesutils_spark.session import configure_session
from timeseriesutils_spark.sources.tables import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: scan → shared-window featurization (lag+rollmean+taylor)
    → broadcast dim joins (supplier→nation→region) → exact aggregation."""
    configure_session(spark)
    sf_dir = "/root/testdata/sf0.001"
    feats, names = featurize_data(
        _li(spark, sf_dir),
        group_columns=["l_suppkey"],
        features=[
            {"fun": "lag", "args": {"columns": "l_extendedprice", "window_size": 7}},
            {"fun": "rollmean", "args": {"columns": "l_extendedprice", "window_size": [7, 14]}},
            {
                "fun": "windowed_taylor_coefs",
                "args": {
                    "columns": "l_extendedprice",
                    "taylor_degree": 2,
                    "window_size": 14,
                    "window_align": "trailing",
                },
            },
        ],
        order_by=LI_ORDER,
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dim = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "n_name", "r_name")
    )
    from timeseriesutils_spark.functions.exact import davg

    return (
        feats.join(F.broadcast(dim), feats.l_suppkey == dim.s_suppkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[davg(nm).alias(f"avg_{nm}") for nm in names[:4]],
        )
        .orderBy("r_name", "n_name")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.spark) for name, q in catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in catalog().items() if q.sql is not None}
