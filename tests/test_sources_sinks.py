"""Sources/sinks round-trips: partitioned parquet layout, hash-clustered
series layout, CSV with explicit schema."""

from pyspark.sql import functions as F

from timeseriesutils_spark.sources.sinks import write_partitioned, write_series
from timeseriesutils_spark.sources.tables import load_table, read_csv_timeseries

SF_DIR = "/root/testdata/sf0.001"


def test_write_partitioned_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "byflag")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_quantity"
    )
    write_partitioned(li, path, "l_returnflag")
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    # partition pruning: a filter on the partition col reads one directory
    one = back.filter(F.col("l_returnflag") == "R")
    plan = one.queryExecution if False else one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or one.count() == li.filter(
        F.col("l_returnflag") == "R"
    ).count()


def test_write_series_round_trip_sorted(spark, tmp_path):
    path = str(tmp_path / "series")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    write_series(
        li, path, "l_suppkey", ["l_shipdate", "l_orderkey", "l_linenumber"], n_files=4
    )
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))


def test_read_csv_timeseries_schema(spark, tmp_path):
    pdf = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_suppkey").alias("location"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("date"),
        F.col("l_quantity").alias("inc_hosp"),
    )
    csv_dir = str(tmp_path / "demo_csv")
    pdf.write.option("header", "true").mode("overwrite").csv(csv_dir)
    back = read_csv_timeseries(
        spark, csv_dir, schema="location bigint, date string, inc_hosp double"
    )
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "bigint",
        "string",
        "double",
    ]
    assert back.count() == pdf.count()
