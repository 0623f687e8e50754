from timeseriesutils_spark.sources.tables import load_table, load_all, read_csv_timeseries  # noqa: F401
