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


def test_orc_roundtrip(spark, tmp_path):
    from timeseriesutils_spark.sources.sinks import write_orc
    from timeseriesutils_spark.sources.tables import load_table, read_orc

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    p = str(tmp_path / "li.orc")
    write_orc(li, p)
    back = read_orc(spark, p)
    assert back.schema == li.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, li.collect()))
    # pushdown reaches the ORC scan
    ex = read_orc(spark, p).filter("l_quantity > 40")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in ex and "l_quantity" in ex.split("PushedFilters")[1][:200]


def test_jsonl_roundtrip(spark, tmp_path):
    from timeseriesutils_spark.sources.sinks import write_jsonl
    from timeseriesutils_spark.sources.tables import load_table, read_jsonl

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "lang")
    p = str(tmp_path / "docs.jsonl")
    write_jsonl(docs, p)
    back = read_jsonl(spark, p, "doc_id long, text string, lang string")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    # missing fields arrive NULL under the explicit schema
    extra = read_jsonl(spark, p, "doc_id long, nope string")
    row = extra.limit(1).collect()[0]
    assert row["nope"] is None and row["doc_id"] is not None
