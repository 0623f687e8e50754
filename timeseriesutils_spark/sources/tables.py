"""Sources: parquet/CSV readers for the engine.

The testdata star schema (TESTDATA.md / FIXTURES.md §F5) is plain parquet;
``spark.read.parquet`` gives predicate pushdown + column pruning for free.
The one wrinkle: ``events.parquet`` stores ``ts`` as parquet
TIMESTAMP(NANOS), which Spark 4 rejects unless
``spark.sql.legacy.parquet.nanosAsLong=true`` — then it arrives as a long
nanosecond count which we convert to TIMESTAMP_NTZ (microsecond precision,
truncating — same truncation DuckDB applies reading the same file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes the events nanos timestamp."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs truncation, matching DuckDB's read of the same file.
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def read_csv_timeseries(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
) -> DataFrame:
    """CSV reader for demo-data-shaped long-format series (FIXTURES §F3).

    With an explicit schema the read is single-pass (no inference job) —
    the right default at scale.
    """
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — same columnar pushdown/pruning story as parquet
    (predicate pushdown + column pruning via the vectorized ORC reader);
    interchange format for Hive-era warehouses."""
    return spark.read.orc(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines source with a REQUIRED explicit schema: schema-less
    JSON reads cost a full inference pass and type-drift silently at
    scale — the engine refuses to guess.  Fields absent in a line arrive
    NULL; extra fields are ignored (standard semi-structured contract).
    """
    return spark.read.schema(schema).json(path)
