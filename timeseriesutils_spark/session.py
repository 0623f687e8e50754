"""SparkSession builder with engine defaults.

Defaults are tuned for correctness-first local runs but chosen to be the
right call on a large cluster too: AQE on (runtime skew-join + partition
coalescing), Arrow on (every pandas UDF crossing is vectorized), UTC
session timezone (timestamp arithmetic must not depend on driver locale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# InferFiltersFromGenerate synthesizes `size(e) > 0 AND isnotnull(e)` from
# every explode() and pushes it into the scan — for the higher-order shingle
# expressions (transform/array_distinct over a regex split) that filter
# re-evaluates the WHOLE interpreted expression tree per row, with the split
# inlined once per occurrence (measured 6× slowdown on the n-gram dedup
# family at sf0.1: the generator input is never null/empty here, so the
# inferred filter only burns CPU).  Excluding the rule is safe for this
# engine: no declared query explodes a nullable/often-empty computed array
# where the pre-filter would prune meaningful work.
EXCLUDED_OPTIMIZER_RULES = (
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
)


def get_spark(
    app_name: str = "timeseriesutils_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS); Spark only reads it as
        # long when this legacy flag is set (sources/tables.py converts).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.optimizer.excludedRules", EXCLUDED_OPTIMIZER_RULES)
        # single-JVM local mode: the 1g driver default is the de-facto
        # executor heap; on the 128 GiB target box it GC-thrashes around
        # ~300k-doc shingle pipelines (observed at a 64x corpus scale
        # test).  Only effective at JVM creation — a pre-existing session
        # keeps its own setting (the driver's vanilla session does).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else int(cpus)),
        )
        # scan-parallelism floor = core count (guide §6): the testdata
        # parquet files are single-digit-MB, so without a floor every
        # scan is 1-2 splits and the decode runs on 1-2 of the session's
        # cores (measured −15% across six representative queries at
        # sf0.1/local[32]).  Derived from the core count, NOT a local
        # constant: on a production cluster the same rule floors scan
        # splits at total cores, and at 100 TB inputs the floor is inert
        # (split counts already exceed it).  Scan splits only — AQE's
        # shuffle-partition coalescing is unaffected.
        .config("spark.sql.files.minPartitionNum", str(int(cpus)))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally created session.

    The driver harness passes its own SparkSession to ``entry``/``queries``;
    these confs are all runtime-settable SQLConf entries.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.optimizer.excludedRules", EXCLUDED_OPTIMIZER_RULES)
    return spark
