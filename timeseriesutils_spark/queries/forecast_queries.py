"""Declared queries for the forecast-support operators
(operators/forecast.py) plus the rolling-correlation signal and the
column profiler — the model-evaluation / covariate / data-quality loop
around the reference's featurization core.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseriesutils_spark.operators.forecast import (
    calendar_features,
    calendar_features_sql_columns,
    naive_forecast_eval,
    naive_forecast_eval_sql,
    target_encode_loo,
    target_encode_loo_sql_columns,
)
from timeseriesutils_spark.operators.profile import column_profile, column_profile_sql
from timeseriesutils_spark.operators.series_math import (
    rolling_corr,
    rolling_corr_sql_column,
)
from timeseriesutils_spark.queries import Q
from timeseriesutils_spark.queries.featurize_queries import LI_ORDER, LI_ORDER_SQL
from timeseriesutils_spark.sources.tables import load_table


def _li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


FC_PARAMS = dict(season=7)


def q_forecast_eval(spark, sf_dir):
    """Seasonal-naive baseline scorecard: per-supplier MAE / RMSE /
    bias / MAPE of the forecast ŷ_t = y_{t-7} on the price series —
    the yardstick every featurized model must beat
    (operators/forecast.naive_forecast_eval)."""
    return naive_forecast_eval(
        _li(spark, sf_dir), "l_extendedprice", ["l_suppkey"], LI_ORDER, **FC_PARAMS
    )


def q_calendar(spark, sf_dir):
    """Calendar covariates (year/quarter/month/ISO week & weekday,
    weekend + month-end flags) from the ship date — the standard
    forecasting covariates next to the lag/rollmean features."""
    li = _li(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )
    df, _ = calendar_features(li, "ship_date")
    # keys identify rows; raw DATE columns round-trip differently through
    # Arrow/pandas across engines (python date objects vs datetime64)
    return df.drop("ship_date")


def _sql_calendar():
    cols = ",\n  ".join(
        f"{expr} AS {name}" for name, expr in calendar_features_sql_columns("ship_date")
    )
    return (
        "SELECT l_orderkey, l_linenumber,\n  "
        + cols
        + "\nFROM (SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date FROM lineitem)"
    )


def q_target_encode(spark, sf_dir):
    """Leave-one-out supplier→price target encoding
    (operators/forecast.target_encode_loo): each line item gets the mean
    price of its supplier's OTHER line items — the leakage-free
    categorical encoding for the boosted-tree models the reference
    featurizes for."""
    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    return target_encode_loo(li, "l_suppkey", "l_extendedprice")


def _sql_target_encode():
    name, expr = target_encode_loo_sql_columns("l_suppkey", "l_extendedprice")
    return (
        "SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,\n  "
        f"{expr} AS {name}\nFROM lineitem"
    )


CORR_PARAMS = dict(window_size=30, scale_x=2, scale_y=2)


def q_rolling_corr(spark, sf_dir):
    """Trailing-30 Pearson correlation between quantity and price per
    supplier (series_math.rolling_corr) — co-movement of two series
    from exact quantized integer sums."""
    li = _li(spark, sf_dir).select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    out = rolling_corr(
        li, "l_quantity", "l_extendedprice", ["l_suppkey"], order_by=LI_ORDER, **CORR_PARAMS
    )
    return out.drop("l_shipdate")


def _sql_rolling_corr():
    name, expr = rolling_corr_sql_column(
        "l_quantity",
        "l_extendedprice",
        ["l_suppkey"],
        LI_ORDER_SQL.split(", "),
        **CORR_PARAMS,
    )
    return (
        "SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity,\n  "
        f"{expr} AS {name}\nFROM lineitem"
    )


PROFILE_COLS = [
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
]


def q_column_profile(spark, sf_dir):
    """Data-quality profile of six lineitem columns
    (operators/profile.column_profile): nulls, exact cardinality,
    range, exact-decimal mean — long format, one row per column."""
    return column_profile(_li(spark, sf_dir), PROFILE_COLS)


def _sql_column_profile():
    numeric = {c: not c.startswith("l_return") and not c.startswith("l_line") for c in PROFILE_COLS}
    return column_profile_sql("lineitem", PROFILE_COLS, numeric)


QUERIES = {
    "forecast_eval": Q(
        q_forecast_eval,
        naive_forecast_eval_sql(
            "SELECT * FROM lineitem",
            "l_extendedprice",
            ["l_suppkey"],
            LI_ORDER_SQL.split(", "),
            **FC_PARAMS,
        ),
    ),
    "calendar_features": Q(q_calendar, _sql_calendar()),
    "target_encode": Q(q_target_encode, _sql_target_encode()),
    "rolling_corr": Q(q_rolling_corr, _sql_rolling_corr()),
    "column_profile": Q(q_column_profile, _sql_column_profile()),
}


def q_group_mode(spark, sf_dir):
    """Deterministic per-customer modal order priority
    (operators/stats.mode_per_group): ties broken by smallest value —
    unlike mode(), stable across engines and partitionings."""
    from timeseriesutils_spark.operators.stats import mode_per_group

    return mode_per_group(
        load_table(spark, sf_dir, "orders"), ["o_custkey"], "o_orderpriority"
    )


WINS_PARAMS = dict(q_lo=0.05, q_hi=0.95)


def q_winsorize(spark, sf_dir):
    """Per-returnflag 5/95-percentile winsorization of the price column
    (operators/stats.winsorize): exact quantile_cont clip bounds
    broadcast back over one fact scan."""
    from timeseriesutils_spark.operators.stats import winsorize

    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    return winsorize(li, "l_extendedprice", ["l_returnflag"], **WINS_PARAMS)


def _sql_group_mode():
    from timeseriesutils_spark.operators.stats import mode_per_group_sql

    return mode_per_group_sql("orders", ["o_custkey"], "o_orderpriority")


def _sql_winsorize():
    from timeseriesutils_spark.operators.stats import winsorize_sql

    return winsorize_sql(
        "lineitem",
        "l_extendedprice",
        ["l_returnflag"],
        "t.l_orderkey, t.l_linenumber, t.l_returnflag, t.l_extendedprice",
        **WINS_PARAMS,
    )


QUERIES.update(
    {
        "group_mode": Q(q_group_mode, _sql_group_mode()),
        "winsorize": Q(q_winsorize, _sql_winsorize()),
    }
)


def q_group_trend(spark, sf_dir):
    """Per-supplier OLS price trend (operators/forecast.group_trend):
    slope/intercept against the row index from five exact quantized
    sums — the whole-series counterpart of taylor's local derivative."""
    from timeseriesutils_spark.operators.forecast import group_trend

    return group_trend(
        _li(spark, sf_dir), "l_extendedprice", ["l_suppkey"], LI_ORDER, scale=2
    )


def _sql_group_trend():
    from timeseriesutils_spark.operators.forecast import group_trend_sql

    return group_trend_sql(
        "SELECT * FROM lineitem",
        "l_extendedprice",
        ["l_suppkey"],
        LI_ORDER_SQL.split(", "),
        scale=2,
    )


QUERIES.update({"group_trend": Q(q_group_trend, _sql_group_trend())})


def q_seasonal_profile(spark, sf_dir):
    """Ship-day weekday profile per returnflag
    (operators/forecast.seasonal_profile): day-of-week means and ratios
    to the overall mean — the reporting-artifact signal of the
    reference's surveillance domain."""
    from timeseriesutils_spark.operators.forecast import seasonal_profile

    return seasonal_profile(
        _li(spark, sf_dir), "l_extendedprice", "l_shipdate", ["l_returnflag"]
    )


def _sql_seasonal_profile():
    from timeseriesutils_spark.operators.forecast import seasonal_profile_sql

    return seasonal_profile_sql(
        "lineitem", "l_extendedprice", "l_shipdate", ["l_returnflag"]
    )


QUERIES.update({"seasonal_profile": Q(q_seasonal_profile, _sql_seasonal_profile())})


CHECKSUM_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
_CHECKSUM_TYPES = {
    "event_id": "bigint", "ts": "timestamp_ntz", "user_id": "bigint",
    "event_type": "string", "value": "double", "props": "string",
}


def q_table_checksum(spark, sf_dir):
    """Order-insensitive table checksum (operators/stats.table_checksum):
    the 100 TB data-movement audit — three scalars (count, BIT_XOR of
    60-bit row md5s, exact decimal sum mod 1e18) that any engine can
    recompute to verify a copy, covering every column class (int /
    timestamp / string / double)."""
    from timeseriesutils_spark.operators.stats import table_checksum

    return table_checksum(
        load_table(spark, sf_dir, "events"), CHECKSUM_COLS
    )


def _sql_table_checksum():
    from timeseriesutils_spark.operators.stats import table_checksum_sql

    return table_checksum_sql("events", CHECKSUM_COLS, _CHECKSUM_TYPES)


QUERIES.update({"table_checksum": Q(q_table_checksum, _sql_table_checksum())})


def q_sink_roundtrip(spark, sf_dir):
    """Write paths inside the correctness gate (VERDICT r3 gap #3): write
    the events table as directory-partitioned parquet
    (sources/sinks.write_partitioned), read it back, and checksum the
    round-tripped rows (operators/stats.table_checksum).  The oracle is
    the SAME checksum over the SOURCE relation — hash-green means the
    write+read cycle preserved every row bit-for-bit across all column
    classes (int / timestamp_ntz / string / double), including values
    that traveled through partition-directory names."""
    import os

    from timeseriesutils_spark.operators.stats import table_checksum
    from timeseriesutils_spark.sources.sinks import write_partitioned

    path = "/tmp/tsu_spark_sink_roundtrip_" + os.path.basename(
        sf_dir.rstrip("/")
    )
    src = load_table(spark, sf_dir, "events").select(*CHECKSUM_COLS)
    write_partitioned(src, path, "event_type")
    back = spark.read.parquet(path)
    return table_checksum(back, CHECKSUM_COLS)


QUERIES.update({"sink_roundtrip": Q(q_sink_roundtrip, _sql_table_checksum())})


FOLD_ENDS = ["1997-06-30 00:00:00", "1997-12-31 00:00:00", "1998-06-30 00:00:00"]
FOLD_PARAMS = dict(horizon_days=60, embargo_days=7)


def q_backtest_folds(spark, sf_dir):
    """Rolling-origin backtest folds (operators/forecast.
    rolling_origin_folds): three walk-forward origins with a 7-day
    leakage embargo and 60-day test horizon — every (row, fold)
    membership labeled; the time-series cross-validation layout the
    reference's forecasting users evaluate with."""
    from timeseriesutils_spark.operators.forecast import rolling_origin_folds

    li = _li(spark, sf_dir)
    out = rolling_origin_folds(li, "l_shipdate", FOLD_ENDS, **FOLD_PARAMS)
    return out.select("l_orderkey", "l_linenumber", "fold", "origin", "split")


def _sql_backtest_folds():
    from timeseriesutils_spark.operators.forecast import rolling_origin_folds_sql

    inner = rolling_origin_folds_sql("lineitem", "l_shipdate", FOLD_ENDS, **FOLD_PARAMS)
    return (
        "SELECT l_orderkey, l_linenumber, fold, origin, split "
        f"FROM ({inner})"
    )


QUERIES.update({"backtest_folds": Q(q_backtest_folds, _sql_backtest_folds())})


SEASONAL_Z_PARAMS = dict(threshold=2.5, scale=2, min_n=5)
_SZ_COLS = "l_orderkey, l_linenumber, l_returnflag, l_shipdate, l_extendedprice"


def q_seasonal_zscore(spark, sf_dir):
    """Seasonal-adjusted anomaly scoring (forecast.seasonal_zscore):
    each lineitem price standardized against its (returnflag, weekday)
    stratum — the seasonality-robust counterpart of rolling_zscore;
    exact BIGINT stratum sums via one whole-partition window, no join."""
    from timeseriesutils_spark.operators.forecast import seasonal_zscore

    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate", "l_extendedprice"
    )
    out = seasonal_zscore(
        li, "l_extendedprice", "l_shipdate", ["l_returnflag"], **SEASONAL_Z_PARAMS
    )
    return out.drop("l_shipdate")


def _sql_seasonal_zscore():
    from timeseriesutils_spark.operators.forecast import seasonal_zscore_sql

    sql = seasonal_zscore_sql(
        "lineitem", _SZ_COLS, "l_extendedprice", "l_shipdate",
        ["l_returnflag"], **SEASONAL_Z_PARAMS
    )
    # outer projection drops the date column, mirroring the Spark side
    return (
        "SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, "
        f"isodow, seasonal_z, is_seasonal_anomaly FROM ({sql})"
    )


QUERIES.update({"seasonal_zscore": Q(q_seasonal_zscore, _sql_seasonal_zscore())})


_FK_EDGES_SQL = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def q_fk_audit(spark, sf_dir):
    """Referential-integrity audit (profile.fk_audit) across every
    foreign-key edge of the warehouse schema: child/distinct/NULL/orphan
    counts per edge — the pre-join data-quality gate."""
    from timeseriesutils_spark.operators.profile import fk_audit

    edges = [
        (name, load_table(spark, sf_dir, child), fk, load_table(spark, sf_dir, parent), pk)
        for name, child, fk, parent, pk in _FK_EDGES_SQL
    ]
    return fk_audit(edges)


def _sql_fk_audit():
    from timeseriesutils_spark.operators.profile import fk_audit_sql

    return fk_audit_sql(_FK_EDGES_SQL)


QUERIES.update({"fk_audit": Q(q_fk_audit, _sql_fk_audit())})


def q_benford_audit(spark, sf_dir):
    """Benford's-law first-digit audit (profile.benford_audit) of
    l_extendedprice per returnflag: observed vs expected leading-digit
    fractions with chi-square contributions — integer-exact digit
    extraction, no log10 boundary hazard."""
    from timeseriesutils_spark.operators.profile import benford_audit

    return benford_audit(
        _li(spark, sf_dir), "l_extendedprice", ["l_returnflag"], scale=2
    )


def _sql_benford_audit():
    from timeseriesutils_spark.operators.profile import benford_audit_sql

    return benford_audit_sql("lineitem", "l_extendedprice", ["l_returnflag"], scale=2)


QUERIES.update({"benford_audit": Q(q_benford_audit, _sql_benford_audit())})


HOLT_PARAMS = dict(alpha=0.3, beta=0.1, window_size=20)


def q_holt_smooth(spark, sf_dir):
    """Holt linear smoothing + one-step forecast (forecast.holt_smooth):
    double exponential smoothing as a bounded linear filter with
    driver-precomputed impulse weights — one window expression, single
    exchange, no per-group recursion."""
    from timeseriesutils_spark.operators.forecast import holt_smooth

    li = _li(spark, sf_dir).select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity", "l_shipdate"
    )
    out = holt_smooth(
        li, "l_extendedprice", ["l_suppkey"], LI_ORDER, **HOLT_PARAMS
    )
    return out.drop("l_shipdate")


def _sql_holt_smooth():
    from timeseriesutils_spark.operators.forecast import holt_smooth_sql_columns

    cols = holt_smooth_sql_columns(
        "l_extendedprice", ["l_suppkey"], LI_ORDER_SQL.split(", "), **HOLT_PARAMS
    )
    sel = ",\n  ".join(f"{expr} AS {name}" for name, expr in cols)
    return (
        "SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, l_quantity,\n  "
        f"{sel}\nFROM lineitem"
    )


QUERIES.update({"holt_smooth": Q(q_holt_smooth, _sql_holt_smooth())})


def q_categorical_assoc(spark, sf_dir):
    """Categorical association screen (stats.categorical_assoc):
    chi-square, Cramér's V and mutual information between returnflag and
    linestatus — exact contingency counts, per-cell terms quantized to
    int64 before the cross-cell sum."""
    from timeseriesutils_spark.operators.stats import categorical_assoc

    return categorical_assoc(_li(spark, sf_dir), "l_returnflag", "l_linestatus")


def _sql_categorical_assoc():
    from timeseriesutils_spark.operators.stats import categorical_assoc_sql

    return categorical_assoc_sql("lineitem", "l_returnflag", "l_linestatus")


QUERIES.update(
    {"categorical_assoc": Q(q_categorical_assoc, _sql_categorical_assoc())}
)


def q_value_entropy(spark, sf_dir):
    """Binned Shannon entropy (stats.value_entropy) of l_quantity per
    returnflag — concentration/dispersion screen; integer-exact bins,
    quantized -p·ln(p) terms summed as int64."""
    from timeseriesutils_spark.operators.stats import value_entropy

    return value_entropy(
        _li(spark, sf_dir), "l_quantity", ["l_returnflag"], bin_width=1.0, scale=2
    )


def _sql_value_entropy():
    from timeseriesutils_spark.operators.stats import value_entropy_sql

    return value_entropy_sql(
        "lineitem", "l_quantity", ["l_returnflag"], bin_width=1.0, scale=2
    )


QUERIES.update({"value_entropy": Q(q_value_entropy, _sql_value_entropy())})


def q_psi_drift(spark, sf_dir):
    """PSI feature-drift report (profile.psi_drift): l_extendedprice
    distribution before vs after 1995-01-01 per returnflag — smoothed
    per-bin (p_a−p_b)·ln(p_a/p_b) terms quantized to int64 before the
    sum."""
    from timeseriesutils_spark.operators.profile import psi_drift

    li = _li(spark, sf_dir)
    return psi_drift(
        li,
        "l_extendedprice",
        F.col("l_shipdate").cast("date") >= F.lit("1995-01-01").cast("date"),
        ["l_returnflag"],
        bin_width=5000.0,
        scale=2,
    )


def _sql_psi_drift():
    from timeseriesutils_spark.operators.profile import psi_drift_sql

    return psi_drift_sql(
        "lineitem",
        "l_extendedprice",
        "CAST(l_shipdate AS DATE) >= DATE '1995-01-01'",
        ["l_returnflag"],
        bin_width=5000.0,
        scale=2,
    )


QUERIES.update({"psi_drift": Q(q_psi_drift, _sql_psi_drift())})


_ORDER_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]
_ORDER_TYPES = {
    "o_orderkey": "bigint", "o_custkey": "bigint", "o_orderstatus": "string",
    "o_totalprice": "double", "o_orderdate": "timestamp", "o_orderpriority": "string",
}


def q_snapshot_diff(spark, sf_dir):
    """Row-level table-version diff (operators/stats.snapshot_diff):
    classify every order key as added / removed / changed between two
    snapshot versions, joining only narrow (key, canonical-row-hash)
    projections -- the change-data audit behind replication checks and
    incremental-load validation.  The 'new' version is derived
    deterministically from the same relation (md5 buckets: one removed,
    two repriced, one re-keyed as inserts) so both engines construct
    identical inputs."""
    from timeseriesutils_spark.operators.splits import hash_bucket
    from timeseriesutils_spark.operators.stats import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    base = orders.withColumn("_b", hash_bucket(F.col("o_orderkey"), 20))
    survived = base.filter(F.col("_b") != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("_b").isin(1, 2),
            F.floor(F.col("o_totalprice") * 1.05 * 100 + 0.5) / 100,
        ).otherwise(F.col("o_totalprice")),
    )
    added = base.filter(F.col("_b") == 3).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(1000000000)
    )
    new = survived.unionByName(added).drop("_b")
    return snapshot_diff(orders, new, ["o_orderkey"])


def _sql_snapshot_diff():
    from timeseriesutils_spark.operators.stats import snapshot_diff_sql

    cols = ", ".join(_ORDER_COLS)
    bucket = "CAST(CONCAT('0x', substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS INT) % 20"
    new_sql = f"""
WITH b AS (SELECT {cols}, {bucket} AS _b FROM orders)
SELECT o_orderkey, o_custkey, o_orderstatus,
  CASE WHEN _b IN (1, 2) THEN FLOOR(o_totalprice * 1.05 * 100 + 0.5) / 100
       ELSE o_totalprice END AS o_totalprice,
  o_orderdate, o_orderpriority
FROM b WHERE _b <> 0
UNION ALL
SELECT o_orderkey + 1000000000, o_custkey, o_orderstatus, o_totalprice,
  o_orderdate, o_orderpriority
FROM b WHERE _b = 3
"""
    return snapshot_diff_sql(
        f"SELECT {cols} FROM orders",
        new_sql,
        ["o_orderkey"],
        [c for c in _ORDER_COLS if c != "o_orderkey"],
        _ORDER_TYPES,
    )


QUERIES.update({"snapshot_diff": Q(q_snapshot_diff, _sql_snapshot_diff())})


_CONTRACT = [
    {"name": "orderkey_unique", "kind": "unique", "cols": ["o_orderkey"]},
    {"name": "custkey_not_null", "kind": "not_null", "col": "o_custkey"},
    {"name": "status_domain", "kind": "in_set", "col": "o_orderstatus",
     "values": ["O", "F", "P"]},
    {"name": "price_range", "kind": "range", "col": "o_totalprice",
     "lo": 0.0, "hi": 600000.0},
    {"name": "custkey_fk", "kind": "fk", "col": "o_custkey",
     "dim": "customer", "dim_col": "c_custkey"},
]


def q_constraint_audit(spark, sf_dir):
    """Declarative data-contract validation
    (operators/profile.constraint_audit): five constraints over orders
    (key uniqueness, required column, status domain, price range,
    customer FK) -- all row-local checks and the uniqueness check fold
    into ONE aggregation scan; the FK adds one left-anti join against
    the distinct-projected dimension."""
    from timeseriesutils_spark.operators.profile import constraint_audit

    return constraint_audit(
        load_table(spark, sf_dir, "orders"),
        _CONTRACT,
        dims={"customer": load_table(spark, sf_dir, "customer")},
    )


def _sql_constraint_audit():
    from timeseriesutils_spark.operators.profile import constraint_audit_sql

    return constraint_audit_sql(
        "orders", _CONTRACT, dim_tables={"customer": "customer"}
    )


QUERIES.update({"constraint_audit": Q(q_constraint_audit, _sql_constraint_audit())})


def q_grouped_ols2(spark, sf_dir):
    """Grouped two-feature OLS (operators/regression.grouped_ols2):
    l_extendedprice ~ l_quantity + l_discount per (returnflag,
    linestatus) via closed-form 2x2 normal equations from one pass of
    DECIMAL-exact quantized sufficient statistics -- the multivariate
    extension of group_trend, no driver linear algebra."""
    from timeseriesutils_spark.operators.regression import grouped_ols2

    return grouped_ols2(
        load_table(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        "l_discount",
        ["l_returnflag", "l_linestatus"],
    )


def _sql_grouped_ols2():
    from timeseriesutils_spark.operators.regression import grouped_ols2_sql

    return grouped_ols2_sql(
        "lineitem",
        "l_extendedprice",
        "l_quantity",
        "l_discount",
        ["l_returnflag", "l_linestatus"],
    )


QUERIES.update({"grouped_ols2": Q(q_grouped_ols2, _sql_grouped_ols2())})


def q_gini_index(spark, sf_dir):
    """Per-priority Gini concentration of order values
    (operators/stats.gini_index): the inequality scalar companion of
    abc_analysis -- rank window + DECIMAL-exact Sum(i*x) reduce, short
    double chain on exact integers."""
    from timeseriesutils_spark.operators.stats import gini_index

    return gini_index(
        load_table(spark, sf_dir, "orders"),
        ["o_orderpriority"],
        "o_totalprice",
        "o_orderkey",
    )


def _sql_gini_index():
    from timeseriesutils_spark.operators.stats import gini_index_sql

    return gini_index_sql("orders", ["o_orderpriority"], "o_totalprice", "o_orderkey")


QUERIES.update({"gini_index": Q(q_gini_index, _sql_gini_index())})


def q_weighted_median(spark, sf_dir):
    """Quantity-weighted median price per (returnflag, linestatus)
    (operators/stats.weighted_median): exact integer cumulative-weight
    halving test, no float compare -- the weighted quantile neither
    median() nor approx_percentile offers."""
    from timeseriesutils_spark.operators.stats import weighted_median

    return weighted_median(
        load_table(spark, sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        "l_extendedprice",
        "l_quantity",
        "l_orderkey",
    )


def _sql_weighted_median():
    from timeseriesutils_spark.operators.stats import weighted_median_sql

    return weighted_median_sql(
        "lineitem",
        ["l_returnflag", "l_linestatus"],
        "l_extendedprice",
        "l_quantity",
        "l_orderkey",
    )


QUERIES.update({"weighted_median": Q(q_weighted_median, _sql_weighted_median())})


def q_mahalanobis_outliers(spark, sf_dir):
    """Bivariate Mahalanobis outlier detection
    (operators/regression.mahalanobis_outliers): lineitems whose
    (quantity, extendedprice) pair sits off the group's correlation
    ridge (empirical-tail threshold; bounded synthetic data has no chi2 tail) -- per-returnflag covariance from one
    DECIMAL-exact pass, closed-form 2x2 inverse, broadcast scoring with
    the fact table never shuffled."""
    from timeseriesutils_spark.operators.regression import mahalanobis_outliers

    return mahalanobis_outliers(
        load_table(spark, sf_dir, "lineitem"),
        "l_quantity",
        "l_extendedprice",
        ["l_returnflag"],
        ["l_orderkey", "l_linenumber"],
        threshold=5.2,
    )


def _sql_mahalanobis():
    from timeseriesutils_spark.operators.regression import mahalanobis_outliers_sql

    return mahalanobis_outliers_sql(
        "lineitem",
        "l_quantity",
        "l_extendedprice",
        ["l_returnflag"],
        ["l_orderkey", "l_linenumber"],
        threshold=5.2,
    )


QUERIES.update(
    {"mahalanobis_outliers": Q(q_mahalanobis_outliers, _sql_mahalanobis())}
)


def q_bootstrap_ci(spark, sf_dir):
    """Deterministic Poisson-bootstrap CI for the mean extended price
    (operators/bootstrap.bootstrap_mean_ci): 32 replicates as extra
    aggregate expressions in ONE map-combinable pass -- no explode, no
    resampling jobs; md5-derived Poisson(1) weights, fixed-order
    replicate fold, bit-identical interval."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.bootstrap import bootstrap_mean_ci

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "line_id", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    return bootstrap_mean_ci(li, "l_extendedprice", "line_id")


def _sql_bootstrap_ci():
    from timeseriesutils_spark.operators.bootstrap import bootstrap_mean_ci_sql

    return bootstrap_mean_ci_sql(
        "(SELECT *, l_orderkey * 10 + l_linenumber AS line_id FROM lineitem)",
        "l_extendedprice",
        "line_id",
    )


QUERIES.update({"bootstrap_ci": Q(q_bootstrap_ci, _sql_bootstrap_ci())})


def q_anova(spark, sf_dir):
    """One-way ANOVA of order value on priority
    (operators/stats.anova_oneway): between/within decomposition, F and
    eta-squared from one per-level pass of DECIMAL-exact quantized
    sums."""
    from timeseriesutils_spark.operators.stats import anova_oneway

    return anova_oneway(
        load_table(spark, sf_dir, "orders"), "o_totalprice", "o_orderpriority"
    )


def _sql_anova():
    from timeseriesutils_spark.operators.stats import anova_oneway_sql

    return anova_oneway_sql("orders", "o_totalprice", "o_orderpriority")


QUERIES.update({"anova_oneway": Q(q_anova, _sql_anova())})


def q_histogram2d(spark, sf_dir):
    """2D density grid of (quantity, extendedprice)
    (operators/stats.histogram2d): the scatter-heatmap aggregation with
    caller-fixed ranges, clamped edge bins, one map-combinable pass."""
    from timeseriesutils_spark.operators.stats import histogram2d

    return histogram2d(
        load_table(spark, sf_dir, "lineitem"),
        "l_quantity",
        "l_extendedprice",
        (0.0, 55.0),
        (0.0, 120000.0),
        bins=(11, 24),
    )


def _sql_histogram2d():
    from timeseriesutils_spark.operators.stats import histogram2d_sql

    return histogram2d_sql(
        "lineitem",
        "l_quantity",
        "l_extendedprice",
        (0.0, 55.0),
        (0.0, 120000.0),
        bins=(11, 24),
    )


QUERIES.update({"histogram2d": Q(q_histogram2d, _sql_histogram2d())})


def q_gmean_exact(spark, sf_dir):
    """Hash-verifiable geometric mean of extended price per returnflag
    (operators/stats.gmean_exact): ln floor-quantized to int64 before
    the exact decimal sum, one exp at the end -- the deterministic
    counterpart of the rows-only gmean UDAF."""
    from timeseriesutils_spark.operators.stats import gmean_exact

    return gmean_exact(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice", ["l_returnflag"]
    )


def _sql_gmean_exact():
    from timeseriesutils_spark.operators.stats import gmean_exact_sql

    return gmean_exact_sql("lineitem", "l_extendedprice", ["l_returnflag"])


QUERIES.update({"gmean_exact": Q(q_gmean_exact, _sql_gmean_exact())})


_SLA_HOLIDAYS = ("1995-12-25", "1996-01-01", "1996-07-04", "2000-12-25")


def q_shipping_sla(spark, sf_dir):
    """Business-day lead-time SLA rollup (operators/busdays.
    shipping_sla_report): working days (Mon-Fri minus a holiday list)
    from order to ship per priority, via the closed-form weekend
    counter -- no calendar-table join, exact int64 throughout."""
    from timeseriesutils_spark.operators.busdays import shipping_sla_report

    return shipping_sla_report(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        holidays=_SLA_HOLIDAYS,
    )


def _sql_shipping_sla():
    from timeseriesutils_spark.operators.busdays import shipping_sla_report_sql

    return shipping_sla_report_sql(holidays=_SLA_HOLIDAYS)


QUERIES.update({"shipping_sla": Q(q_shipping_sla, _sql_shipping_sla())})


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson matrix over the lineitem numerics in one pass
    (operators/profile.corr_matrix): k+k+k(k-1)/2 DECIMAL-exact
    sufficient statistics, VARCHAR-routed big-int casts, long-format
    output."""
    from timeseriesutils_spark.operators.profile import corr_matrix

    return corr_matrix(load_table(spark, sf_dir, "lineitem"), _CORR_COLS)


def _sql_corr_matrix():
    from timeseriesutils_spark.operators.profile import corr_matrix_sql

    return corr_matrix_sql("lineitem", _CORR_COLS)


QUERIES.update({"corr_matrix": Q(q_corr_matrix, _sql_corr_matrix())})


_FD_DEPS = [
    ("l_orderkey", "l_returnflag"),
    ("l_partkey", "l_suppkey"),
    ("l_orderkey", "l_shipdate"),
]


def q_fd_audit(spark, sf_dir):
    """Functional-dependency audit (operators/profile.fd_audit): does
    orderkey determine returnflag / shipdate, does part determine
    supplier -- per-determinant distinct counts, one summary row per
    claimed dependency."""
    from timeseriesutils_spark.operators.profile import fd_audit

    return fd_audit(load_table(spark, sf_dir, "lineitem"), _FD_DEPS)


def _sql_fd_audit():
    from timeseriesutils_spark.operators.profile import fd_audit_sql

    return fd_audit_sql("lineitem", _FD_DEPS)


QUERIES.update({"fd_audit": Q(q_fd_audit, _sql_fd_audit())})


def q_growth_rates(spark, sf_dir):
    """Per-type compound growth rate (operators/forecast.growth_rates):
    log-linear OLS of ln(daily total value) on the day index --
    '%-per-day' with r2, ln-quantized exact sufficient statistics."""
    from timeseriesutils_spark.operators.forecast import growth_rates

    return growth_rates(load_table(spark, sf_dir, "events"))


def _sql_growth_rates():
    from timeseriesutils_spark.operators.forecast import growth_rates_sql

    return growth_rates_sql("events")


QUERIES.update({"growth_rates": Q(q_growth_rates, _sql_growth_rates())})


def q_id_gap_audit(spark, sf_dir):
    """Sequence-gap audit (operators/profile.id_gap_audit): the
    ingestion data-loss detector over a should-be-dense id sequence --
    the input simulates an incident by dropping one md5 bucket of
    orders (both engines construct the identical lossy feed), and the
    audit reports every missing id range."""
    from timeseriesutils_spark.operators.profile import id_gap_audit
    from timeseriesutils_spark.operators.splits import hash_bucket

    lossy = load_table(spark, sf_dir, "orders").filter(
        hash_bucket(F.col("o_orderkey"), 20) != 7
    )
    return id_gap_audit(lossy, "o_orderkey")


def _sql_id_gap_audit():
    from timeseriesutils_spark.operators.profile import id_gap_audit_sql

    lossy = """(
  SELECT * FROM orders
  WHERE CAST(CONCAT('0x', substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS INT)
        % 20 <> 7
)"""
    return id_gap_audit_sql(lossy, "o_orderkey")


QUERIES.update({"id_gap_audit": Q(q_id_gap_audit, _sql_id_gap_audit())})


# --- epi-forecast family (operators/epi.py) -------------------------------

_ORD_DAY_SQL = (
    "CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) "
    "AS BIGINT)"
)
_RT_WEIGHTS = (1, 2, 3, 2, 1)


def q_renewal_rt(spark, sf_dir):
    """Renewal-equation reproduction number (operators/epi.renewal_rt):
    daily order counts per priority class as the incidence series,
    integer serial-interval kernel (1,2,3,2,1)/9, zero-filled day grid.
    Exact int64 force of infection; Rt is one double division."""
    from timeseriesutils_spark.operators.epi import renewal_rt

    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.select(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day"),
        )
        .groupBy("o_orderpriority", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return renewal_rt(
        counts, "n", "day", ["o_orderpriority"], weights=_RT_WEIGHTS
    )


def _sql_renewal_rt():
    from timeseriesutils_spark.operators.epi import renewal_rt_sql

    counts = (
        f"SELECT o_orderpriority, {_ORD_DAY_SQL} AS day, COUNT(*) AS n "
        "FROM orders GROUP BY 1, 2"
    )
    return renewal_rt_sql(
        counts, "n", "day", ["o_orderpriority"], weights=_RT_WEIGHTS
    )


QUERIES.update({"renewal_rt": Q(q_renewal_rt, _sql_renewal_rt())})

_NOWCAST_MAX_DELAY = 4


def q_nowcast_triangle(spark, sf_dir):
    """Chain-ladder reporting-delay nowcast (operators/epi.
    nowcast_triangle): order week = occurrence period, weeks from order
    to line shipment = reporting delay (orders⋈lineitem — the broadcast
    star join); recent weeks are right-censored and the development
    factors (exact-int ratios) project their ultimates."""
    from timeseriesutils_spark.operators.epi import nowcast_triangle

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    oday = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    ).cast("bigint")
    sday = F.datediff(
        F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
    ).cast("bigint")
    ev = j.select(
        (oday / F.lit(7)).cast("bigint").alias("occ_week"),
        ((sday - oday) / F.lit(7)).cast("bigint").alias("delay_weeks"),
    )
    return nowcast_triangle(
        ev, "occ_week", "delay_weeks", max_delay=_NOWCAST_MAX_DELAY
    )


def _sql_nowcast_triangle():
    from timeseriesutils_spark.operators.epi import nowcast_triangle_sql

    ev = (
        "SELECT CAST(CAST(datediff('day', DATE '1992-01-01', "
        "CAST(o_orderdate AS DATE)) AS BIGINT) // 7 AS BIGINT) AS occ_week, "
        "CAST((CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) "
        "AS BIGINT) - CAST(datediff('day', DATE '1992-01-01', "
        "CAST(o_orderdate AS DATE)) AS BIGINT)) // 7 AS BIGINT) AS delay_weeks "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    )
    return nowcast_triangle_sql(
        ev, "occ_week", "delay_weeks", max_delay=_NOWCAST_MAX_DELAY
    )


QUERIES.update({"nowcast_triangle": Q(q_nowcast_triangle, _sql_nowcast_triangle())})


_PB_W = 28
_PB_QS = (0.1, 0.5, 0.9)


def q_pinball_eval(spark, sf_dir):
    """Quantile-forecast scoring (operators/epi.pinball_scores): the
    trailing-28-observation empirical-quantile forecaster (q ∈ {.1,.5,.9},
    the engine-pinned sorted-array lerp) is scored on each next
    observation of the per-supplier daily price series — pinball loss
    per level + mean + 80%-interval empirical coverage, aggregated per
    supplier cohort with the DECIMAL exact-mean discipline.  The whole
    pipeline (forecast construction + scoring) is two window passes and
    one map-combinable aggregation."""
    from timeseriesutils_spark.operators.epi import pinball_scores
    from timeseriesutils_spark.operators.series_math import _lerp_sorted_const
    from timeseriesutils_spark.queries.series_queries import _daily
    from pyspark.sql import Window

    d = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("ship_day")
        .rowsBetween(-_PB_W, -1)
    )
    arr = F.sort_array(F.collect_list("day_price").over(w))
    fc = (
        d.select(
            (F.col("l_suppkey") % 10).alias("cohort"),
            F.col("day_price"),
            arr.alias("_arr"),
        )
        .filter(F.size("_arr") == _PB_W)
        .select(
            "cohort",
            "day_price",
            *[
                _lerp_sorted_const(F.col("_arr"), q, _PB_W).alias(
                    f"f{int(q * 100):02d}"
                )
                for q in _PB_QS
            ],
        )
    )
    return pinball_scores(
        fc,
        "day_price",
        {q: f"f{int(q * 100):02d}" for q in _PB_QS},
        ["cohort"],
        interval=(0.1, 0.9),
    )


def _sql_pinball_eval():
    from timeseriesutils_spark.operators.epi import pinball_scores_sql
    from timeseriesutils_spark.operators.series_math import _lerp_sorted_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    over = (
        "(PARTITION BY l_suppkey ORDER BY ship_day "
        f"ROWS BETWEEN {_PB_W} PRECEDING AND 1 PRECEDING)"
    )
    qcols = ", ".join(
        f"{_lerp_sorted_sql('_arr', q)} AS f{int(q * 100):02d}" for q in _PB_QS
    )
    fc = f"""
SELECT cohort, day_price, {qcols}
FROM (
  SELECT l_suppkey % 10 AS cohort, day_price,
    list_sort(list(day_price) OVER {over}) AS _arr
  FROM ({_SQL_DAILY})
) WHERE len(_arr) = {_PB_W}
"""
    return pinball_scores_sql(
        fc,
        "day_price",
        {q: f"f{int(q * 100):02d}" for q in _PB_QS},
        ["cohort"],
        interval=(0.1, 0.9),
    )


QUERIES.update({"pinball_eval": Q(q_pinball_eval, _sql_pinball_eval())})


def q_wis_eval(spark, sf_dir):
    """Weighted interval score (operators/epi.wis_scores): the
    forecast-hub summary metric with its dispersion / overprediction /
    underprediction decomposition, scored on the same
    trailing-28-observation empirical-quantile forecaster as
    pinball_eval (median f50, central 80 % interval [f10, f90] — miss
    level α=0.2) over the per-supplier daily price series, aggregated
    per supplier cohort.  Same two-window + one-aggregation plan shape
    as pinball_eval; the decomposition identity wis = disp + over +
    under holds exactly by construction (three quantized DECIMAL
    sums)."""
    from timeseriesutils_spark.operators.epi import wis_scores
    from timeseriesutils_spark.operators.series_math import _lerp_sorted_const
    from timeseriesutils_spark.queries.series_queries import _daily
    from pyspark.sql import Window

    d = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("ship_day")
        .rowsBetween(-_PB_W, -1)
    )
    arr = F.sort_array(F.collect_list("day_price").over(w))
    fc = (
        d.select(
            (F.col("l_suppkey") % 10).alias("cohort"),
            F.col("day_price"),
            arr.alias("_arr"),
        )
        .filter(F.size("_arr") == _PB_W)
        .select(
            "cohort",
            "day_price",
            *[
                _lerp_sorted_const(F.col("_arr"), q, _PB_W).alias(
                    f"f{int(q * 100):02d}"
                )
                for q in _PB_QS
            ],
        )
    )
    return wis_scores(
        fc,
        "day_price",
        "f50",
        {0.2: ("f10", "f90")},
        ["cohort"],
    )


def _sql_wis_eval():
    from timeseriesutils_spark.operators.epi import wis_scores_sql
    from timeseriesutils_spark.operators.series_math import _lerp_sorted_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    over = (
        "(PARTITION BY l_suppkey ORDER BY ship_day "
        f"ROWS BETWEEN {_PB_W} PRECEDING AND 1 PRECEDING)"
    )
    qcols = ", ".join(
        f"{_lerp_sorted_sql('_arr', q)} AS f{int(q * 100):02d}" for q in _PB_QS
    )
    fc = f"""
SELECT cohort, day_price, {qcols}
FROM (
  SELECT l_suppkey % 10 AS cohort, day_price,
    list_sort(list(day_price) OVER {over}) AS _arr
  FROM ({_SQL_DAILY})
) WHERE len(_arr) = {_PB_W}
"""
    return wis_scores_sql(
        fc,
        "day_price",
        "f50",
        {0.2: ("f10", "f90")},
        ["cohort"],
    )


QUERIES.update({"wis_eval": Q(q_wis_eval, _sql_wis_eval())})


def q_theilsen(spark, sf_dir):
    """Theil–Sen robust trend of weekly order volume per priority class
    (operators/regression.theilsen_slope): median of all pairwise slopes
    + median-residual intercept — the trend estimate that survives
    corrupted subranges where group_trend's OLS does not.  The series is
    aggregated to weeks first (the documented O(n²)-pairs bound)."""
    from timeseriesutils_spark.operators.regression import theilsen_slope

    o = load_table(spark, sf_dir, "orders")
    weekly = (
        o.select(
            "o_orderpriority",
            (
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.lit("1992-01-01").cast("date"),
                ).cast("bigint")
                / F.lit(7)
            )
            .cast("bigint")
            .alias("week"),
        )
        .groupBy("o_orderpriority", "week")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return theilsen_slope(
        weekly, "n_orders", "week", ["o_orderpriority"], scale=0
    )


def _sql_theilsen():
    from timeseriesutils_spark.operators.regression import theilsen_slope_sql

    weekly = (
        "SELECT o_orderpriority, "
        f"CAST({_ORD_DAY_SQL} // 7 AS BIGINT) AS week, "
        "COUNT(*) AS n_orders FROM orders GROUP BY 1, 2"
    )
    return theilsen_slope_sql(
        weekly, "n_orders", "week", ["o_orderpriority"], scale=0
    )


QUERIES.update({"theilsen_trend": Q(q_theilsen, _sql_theilsen())})


_EXCESS_SPLIT_DAY = 2000


def q_excess_incidence(spark, sf_dir):
    """Excess incidence vs a day-of-week baseline (operators/epi.
    excess_incidence): order volume per priority class after day 2000
    compared to its pre-2000 weekday means; the cumulative excess runs
    as an exact integer window sum (no cross-engine float accumulation)."""
    from timeseriesutils_spark.operators.epi import excess_incidence

    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.select(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day"),
        )
        .groupBy("o_orderpriority", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return excess_incidence(
        counts, "n", "day", ["o_orderpriority"], split_day=_EXCESS_SPLIT_DAY
    )


def _sql_excess_incidence():
    from timeseriesutils_spark.operators.epi import excess_incidence_sql

    counts = (
        f"SELECT o_orderpriority, {_ORD_DAY_SQL} AS day, COUNT(*) AS n "
        "FROM orders GROUP BY 1, 2"
    )
    return excess_incidence_sql(
        counts, "n", "day", ["o_orderpriority"], split_day=_EXCESS_SPLIT_DAY
    )


QUERIES.update({"excess_incidence": Q(q_excess_incidence, _sql_excess_incidence())})


def q_croston(spark, sf_dir):
    """Croston intermittent-demand forecast (operators/forecast.
    croston_forecast): per-part daily shipment totals are sparse by
    nature; the EW mean demand size over the EW mean inter-demand
    interval gives the demand-rate forecast at each part's last
    shipment."""
    from timeseriesutils_spark.functions.exact import dsum
    from timeseriesutils_spark.operators.forecast import croston_forecast

    li = _li(spark, sf_dir)
    demand = (
        li.select(
            "l_partkey",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("bigint")
            .alias("ship_day"),
            "l_quantity",
        )
        .groupBy("l_partkey", "ship_day")
        .agg(dsum("l_quantity").alias("qty"))
    )
    return croston_forecast(demand, "qty", "ship_day", ["l_partkey"])


def _sql_croston():
    from timeseriesutils_spark.functions.exact import dsum_sql
    from timeseriesutils_spark.operators.forecast import croston_forecast_sql

    demand = (
        "SELECT l_partkey, "
        "CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)"
        " AS ship_day, "
        f"{dsum_sql('l_quantity')} AS qty FROM lineitem GROUP BY 1, 2"
    )
    return croston_forecast_sql(demand, "qty", "ship_day", ["l_partkey"])


QUERIES.update({"croston_demand": Q(q_croston, _sql_croston())})


_PSI_CURVE_SPLIT = 24  # months: first 24 = baseline


def q_psi_drift_curve(spark, sf_dir):
    """Temporal feature-drift curve (operators/profile.psi_drift_curve):
    monthly PSI of order totalprice against the first-24-months
    baseline — WHEN the distribution started moving, not just whether
    it did between two splits."""
    from timeseriesutils_spark.operators.profile import psi_drift_curve

    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            ).cast("bigint")
            / F.lit(30)
        )
        .cast("bigint")
        .alias("month"),
        "o_totalprice",
    )
    return psi_drift_curve(
        d, "o_totalprice", "month", _PSI_CURVE_SPLIT,
        bin_width=20000.0, scale=2,
    )


def _sql_psi_drift_curve():
    from timeseriesutils_spark.operators.profile import psi_drift_curve_sql

    inner = (
        f"SELECT CAST({_ORD_DAY_SQL} // 30 AS BIGINT) AS month, o_totalprice "
        "FROM orders"
    )
    return psi_drift_curve_sql(
        inner, "o_totalprice", "month", _PSI_CURVE_SPLIT,
        bin_width=20000.0, scale=2,
    )


QUERIES.update({"psi_drift_curve": Q(q_psi_drift_curve, _sql_psi_drift_curve())})


def q_quantile_transform(spark, sf_dir):
    """Per-flag empirical-CDF normalization of price
    (operators/stats.quantile_transform): midrank position in the
    group, deterministic tie order — the rank-uniform feature transform
    before modeling."""
    from timeseriesutils_spark.operators.stats import quantile_transform

    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    return quantile_transform(
        li, "l_extendedprice", ["l_returnflag"],
        F.struct("l_orderkey", "l_linenumber"),
    )


def _sql_quantile_transform():
    from timeseriesutils_spark.operators.stats import quantile_transform_sql

    return quantile_transform_sql(
        "lineitem",
        "l_orderkey, l_linenumber, l_returnflag, l_extendedprice",
        "l_extendedprice",
        ["l_returnflag"],
        "(l_orderkey, l_linenumber)",
    )


QUERIES.update(
    {"quantile_transform": Q(q_quantile_transform, _sql_quantile_transform())}
)


def q_decompose_robust(spark, sf_dir):
    """Robust median-based decomposition of daily order counts per
    priority (operators/decompose.decompose_robust): rolling-median
    trend + per-phase median seasonal, no cross-row float sums anywhere
    — the outlier-immune sibling of decompose_series."""
    from timeseriesutils_spark.operators.decompose import decompose_robust

    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.select(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day"),
        )
        .groupBy("o_orderpriority", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # dense grid contract: zero-fill missing days like the renewal query
    spine = (
        counts.groupBy("o_orderpriority")
        .agg(F.min("day").alias("_lo"), F.max("day").alias("_hi"))
        .select(
            "o_orderpriority", F.explode(F.sequence("_lo", "_hi")).alias("day")
        )
    )
    dense = spine.join(counts, on=["o_orderpriority", "day"], how="left").select(
        "o_orderpriority",
        "day",
        F.coalesce("n", F.lit(0).cast("bigint")).alias("n"),
    )
    return decompose_robust(dense, "n", "day", ["o_orderpriority"], period=7)


def _sql_decompose_robust():
    from timeseriesutils_spark.operators.decompose import decompose_robust_sql

    dense = f"""
WITH c AS (SELECT o_orderpriority, {_ORD_DAY_SQL} AS day, COUNT(*) AS n
           FROM orders GROUP BY 1, 2),
b AS (SELECT o_orderpriority, MIN(day) AS _lo, MAX(day) AS _hi FROM c GROUP BY 1),
s AS (SELECT o_orderpriority, UNNEST(generate_series(_lo, _hi)) AS day FROM b)
SELECT s.o_orderpriority, s.day, COALESCE(c.n, CAST(0 AS BIGINT)) AS n
FROM s LEFT JOIN c USING (o_orderpriority, day)
"""
    return decompose_robust_sql(
        dense, "n", "day", ["o_orderpriority"], period=7
    )


QUERIES.update({"decompose_robust": Q(q_decompose_robust, _sql_decompose_robust())})


def q_mase_eval(spark, sf_dir):
    """MASE scorecard of the trailing-7-mean forecast per supplier
    (operators/forecast.mase_eval): model MAE scaled by one-step-naive
    MAE -- the scale-free companion to forecast_eval's MAE/RMSE.
    Window-scaled integer errors, DECIMAL sums, one shared tree."""
    from timeseriesutils_spark.operators.forecast import mase_eval

    return mase_eval(
        _li(spark, sf_dir), "l_extendedprice", ["l_suppkey"], LI_ORDER,
        window=7, scale=2,
    )


def _sql_mase_eval():
    from timeseriesutils_spark.operators.forecast import mase_eval_sql

    return mase_eval_sql(
        "SELECT * FROM lineitem", "l_extendedprice", ["l_suppkey"],
        LI_ORDER_SQL.split(", "), window=7, scale=2,
    )


QUERIES.update({"mase_eval": Q(q_mase_eval, _sql_mase_eval())})


def q_diebold_mariano(spark, sf_dir):
    """Diebold–Mariano equal-accuracy test per supplier cohort
    (operators/forecast.diebold_mariano): mase_eval says the
    trailing-7-mean forecast errs less than the naive walk — this says
    whether the squared-error gap is SIGNIFICANT.  Per-supplier loss
    differentials, cohort-level DM statistic, engine-kernel p-value."""
    from timeseriesutils_spark.operators.forecast import diebold_mariano

    d = _li(spark, sf_dir).withColumn(
        "cohort", F.col("l_suppkey") % 10
    )
    return diebold_mariano(
        d, "l_extendedprice", ["l_suppkey"], LI_ORDER, ["cohort"],
        window=7, scale=2,
    )


def _sql_diebold_mariano():
    from timeseriesutils_spark.operators.forecast import diebold_mariano_sql

    return diebold_mariano_sql(
        "SELECT *, l_suppkey % 10 AS cohort FROM lineitem",
        "l_extendedprice", ["l_suppkey"], LI_ORDER_SQL.split(", "),
        ["cohort"], window=7, scale=2,
    )


QUERIES.update(
    {"diebold_mariano": Q(q_diebold_mariano, _sql_diebold_mariano())}
)


from timeseriesutils_spark.functions.exact import dsum_sql as _dsum_sql

_SQL_DAILY_PQ = f"""
  SELECT l_suppkey,
    CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_day,
    {_dsum_sql('l_extendedprice')} AS day_price,
    {_dsum_sql('l_quantity')} AS day_qty
  FROM lineitem GROUP BY 1, 2
"""


def _daily_pq(spark, sf_dir):
    """Per-(supplier, ship day) exact daily price AND quantity sums --
    the paired-series input the Granger test needs (same one-exchange
    shape as series_queries._daily)."""
    from timeseriesutils_spark.functions.exact import dsum
    from timeseriesutils_spark.sources.tables import load_table as _lt

    li = _lt(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_suppkey",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            .cast("bigint")
            .alias("ship_day"),
            "l_extendedprice",
            "l_quantity",
        )
        .repartition("l_suppkey")
        .groupBy("l_suppkey", "ship_day")
        .agg(
            dsum("l_extendedprice").alias("day_price"),
            dsum("l_quantity").alias("day_qty"),
        )
    )


def q_granger_lag(spark, sf_dir):
    """One-lag Granger-style nested OLS F-test per supplier: does
    yesterday's shipped QUANTITY help predict today's daily REVENUE
    beyond yesterday's revenue (operators/regression.granger_lag_test)?
    One window pass + one sufficient-statistics aggregation; F from
    R2_u vs R2_r in closed form."""
    from timeseriesutils_spark.operators.regression import granger_lag_test

    return granger_lag_test(
        _daily_pq(spark, sf_dir), "day_price", "day_qty",
        ["l_suppkey"], ["ship_day"], scale=2,
    )


def _sql_granger_lag():
    from timeseriesutils_spark.operators.regression import granger_lag_test_sql

    return granger_lag_test_sql(
        _SQL_DAILY_PQ, "day_price", "day_qty", ["l_suppkey"], ["ship_day"],
        scale=2,
    )


QUERIES.update({"granger_lag": Q(q_granger_lag, _sql_granger_lag())})


def q_adf_test(spark, sf_dir):
    """ADF(1) unit-root test per supplier daily price series
    (operators/regression.adf_test): is the series mean-reverting or
    does it need differencing?  One lag pass + one sufficient-stats
    aggregation, closed-form t_rho vs the MacKinnon 5% critical
    value."""
    from timeseriesutils_spark.operators.regression import adf_test

    return adf_test(
        _daily_pq(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        scale=2,
    )


def _sql_adf_test():
    from timeseriesutils_spark.operators.regression import adf_test_sql

    return adf_test_sql(
        _SQL_DAILY_PQ, "day_price", ["l_suppkey"], ["ship_day"], scale=2
    )


QUERIES.update({"adf_test": Q(q_adf_test, _sql_adf_test())})


def _weekly_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderpriority",
            (
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.lit("1992-01-01").cast("date"),
                ).cast("bigint")
                / F.lit(7)
            )
            .cast("bigint")
            .alias("week"),
        )
        .groupBy("o_orderpriority", "week")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# `//`: DuckDB CAST(DOUBLE AS BIGINT) rounds-to-nearest where Spark's
# double->bigint cast truncates — integer division avoids the double
_SQL_WEEKLY_ORDERS = """
  SELECT o_orderpriority,
    CAST(CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) // 7 AS BIGINT) AS week,
    COUNT(*) AS n_orders
  FROM orders GROUP BY 1, 2
"""


def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotonic-trend test of weekly order volume per
    priority class (operators/regression.mann_kendall): the
    nonparametric IS-there-a-trend companion to theilsen_trend's
    HOW-steep, same weekly aggregation and pair pass, tie-corrected
    variance, continuity-corrected z."""
    from timeseriesutils_spark.operators.regression import mann_kendall

    return mann_kendall(
        _weekly_orders(spark, sf_dir), "n_orders", ["o_orderpriority"],
        "week", scale=0,
    )


def _sql_mann_kendall():
    from timeseriesutils_spark.operators.regression import mann_kendall_sql

    return mann_kendall_sql(
        _SQL_WEEKLY_ORDERS, "n_orders", ["o_orderpriority"], "week", scale=0
    )


QUERIES.update({"mann_kendall": Q(q_mann_kendall, _sql_mann_kendall())})


# --- round-7 nonparametric battery (operators/nonparam.py) ----------------

_SQL_YEAR_RF = """
  SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT) AS ship_year,
    l_returnflag, l_extendedprice
  FROM lineitem
"""


def _year_rf(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias("ship_year"),
        "l_returnflag",
        "l_extendedprice",
    )


def q_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov per ship year: is the price
    DISTRIBUTION under returnflag A the same as under R?
    (operators/nonparam.ks_test) — welch_ttest compares means; this
    catches spread/tail drift the mean misses.  Exact integer ECDF-gap
    max over per-(year, quantized price) counts; asymptotic 5%
    critical-value flag."""
    from timeseriesutils_spark.operators.nonparam import ks_test

    return ks_test(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        "A", "R", ["ship_year"],
    )


def _sql_ks_test():
    from timeseriesutils_spark.operators.nonparam import ks_test_sql

    return ks_test_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", "A", "R",
        ["ship_year"],
    )


QUERIES.update({"ks_test": Q(q_ks_test, _sql_ks_test())})


def q_kruskal_wallis(spark, sf_dir):
    """Kruskal–Wallis rank ANOVA per ship year: does returnflag shift
    the price distribution at all?  (operators/nonparam.kruskal_wallis)
    — the rank-based anova_oneway: same question, no normality
    assumption, tie-corrected H."""
    from timeseriesutils_spark.operators.nonparam import kruskal_wallis

    return kruskal_wallis(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        ["ship_year"],
    )


def _sql_kruskal_wallis():
    from timeseriesutils_spark.operators.nonparam import kruskal_wallis_sql

    return kruskal_wallis_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", ["ship_year"]
    )


QUERIES.update({"kruskal_wallis": Q(q_kruskal_wallis, _sql_kruskal_wallis())})


def q_mann_whitney(spark, sf_dir):
    """Mann–Whitney U per order year: do URGENT orders run larger
    totals than LOW-priority ones?  (operators/nonparam.mann_whitney)
    — the DIRECTIONAL two-sample rank test: welch_ttest's
    skew/outlier-immune sibling, ks_test's located cousin.  Count-based
    tie-corrected ranks, z via the engine p-value kernel."""
    from timeseriesutils_spark.operators.nonparam import mann_whitney

    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.year(F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("order_year"),
        "o_orderpriority",
        "o_totalprice",
    )
    return mann_whitney(
        d, "o_totalprice", "o_orderpriority",
        "1-URGENT", "5-LOW", ["order_year"],
    )


def _sql_mann_whitney():
    from timeseriesutils_spark.operators.nonparam import mann_whitney_sql

    d = (
        "SELECT CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS INT)"
        " AS order_year, o_orderpriority, o_totalprice FROM orders"
    )
    return mann_whitney_sql(
        d, "o_totalprice", "o_orderpriority", "1-URGENT", "5-LOW",
        ["order_year"],
    )


QUERIES.update({"mann_whitney": Q(q_mann_whitney, _sql_mann_whitney())})


def q_spearman_corr(spark, sf_dir):
    """Per-supplier Spearman rank correlation between quantity and
    price (operators/nonparam.spearman_corr): the monotone-association
    sibling of corr_matrix's Pearson — outlier-immune, transform-
    invariant, average ranks exact in integers."""
    from timeseriesutils_spark.operators.nonparam import spearman_corr

    li = load_table(spark, sf_dir, "lineitem")
    return spearman_corr(
        li.select("l_suppkey", "l_quantity", "l_extendedprice"),
        "l_quantity", "l_extendedprice", ["l_suppkey"],
    )


def _sql_spearman_corr():
    from timeseriesutils_spark.operators.nonparam import spearman_corr_sql

    return spearman_corr_sql(
        "SELECT l_suppkey, l_quantity, l_extendedprice FROM lineitem",
        "l_quantity", "l_extendedprice", ["l_suppkey"],
    )


QUERIES.update({"spearman_corr": Q(q_spearman_corr, _sql_spearman_corr())})


_SQL_MONTHLY_SHIP = """
  SELECT l_suppkey,
    (CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS BIGINT) - 1992) * 12
      + CAST(EXTRACT(month FROM CAST(l_shipdate AS DATE)) AS BIGINT) - 1 AS mth,
    COUNT(*) AS n_ship
  FROM lineitem GROUP BY 1, 2
"""


def _monthly_ship(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    return (
        li.select(
            "l_suppkey",
            (
                (F.year(d).cast("bigint") - 1992) * 12
                + F.month(d).cast("bigint")
                - 1
            ).alias("mth"),
        )
        .groupBy("l_suppkey", "mth")
        .agg(F.count(F.lit(1)).alias("n_ship"))
    )


def q_bh_fdr_trend(spark, sf_dir):
    """Benjamini–Hochberg FDR control over a per-supplier trend-test
    battery (operators/nonparam.bh_fdr): Mann–Kendall z on monthly
    shipment counts per supplier → two-sided normal p (Bowling
    logistic kernel, 1e-9-quantized) → BH step-up at α = 0.05.  Tests
    run per group, so ~5% of naive 'significant' flags are false by
    construction; BH bounds the false-discovery rate — the meta-op
    that makes every grouped test family in the engine honest."""
    from timeseriesutils_spark.operators.nonparam import (
        bh_fdr,
        two_sided_p_expr,
    )
    from timeseriesutils_spark.operators.regression import mann_kendall

    mk = mann_kendall(
        _monthly_ship(spark, sf_dir), "n_ship", ["l_suppkey"], "mth", scale=0
    )
    p = mk.select("l_suppkey", two_sided_p_expr(F.col("z")).alias("p"))
    return bh_fdr(p, "p", ["l_suppkey"], alpha=0.05)


def _sql_bh_fdr_trend():
    from timeseriesutils_spark.operators.nonparam import (
        bh_fdr_sql,
        two_sided_p_sql,
    )
    from timeseriesutils_spark.operators.regression import mann_kendall_sql

    mk = mann_kendall_sql(_SQL_MONTHLY_SHIP, "n_ship", ["l_suppkey"], "mth",
                          scale=0)
    p = f"SELECT l_suppkey, {two_sided_p_sql('z')} AS p FROM ({mk})"
    return bh_fdr_sql(p, "p", ["l_suppkey"], alpha=0.05)


QUERIES.update({"bh_fdr_trend": Q(q_bh_fdr_trend, _sql_bh_fdr_trend())})


def q_runs_test(spark, sf_dir):
    """Wald–Wolfowitz runs test per supplier on the daily price series
    (operators/nonparam.runs_test): randomness around the mean — too
    few runs = trending, too many = oscillating; the sign-level
    randomness check beside mann_kendall (monotone trend) and
    acf_features (linear memory).  Exact integer mean dichotomy
    (q·n vs Σq), engine-kernel p-value."""
    from timeseriesutils_spark.operators.nonparam import runs_test
    from timeseriesutils_spark.queries.series_queries import _daily

    return runs_test(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"]
    )


def _sql_runs_test():
    from timeseriesutils_spark.operators.nonparam import runs_test_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    return runs_test_sql(
        _SQL_DAILY, "day_price", ["l_suppkey"], ["ship_day"]
    )


QUERIES.update({"runs_test": Q(q_runs_test, _sql_runs_test())})


def q_theta_forecast(spark, sf_dir):
    """Theta-method forecast per supplier on the daily price series
    (operators/forecast.theta_forecast): the M3-winning ½·trend-line +
    ½·SES(θ=2) combination at horizons 1/7/28 — the cross-learning
    benchmark beside holt_smooth and croston_demand.  One window chain
    (exact integer OLS sums + the truncated-SES lag filter), one row
    per supplier."""
    from timeseriesutils_spark.operators.forecast import theta_forecast
    from timeseriesutils_spark.queries.series_queries import _daily

    return theta_forecast(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        ses_alpha=0.5, window_size=28, horizons=(1, 7, 28),
    )


def _sql_theta_forecast():
    from timeseriesutils_spark.operators.forecast import theta_forecast_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    return theta_forecast_sql(
        _SQL_DAILY, "day_price", ["l_suppkey"], ["ship_day"],
        ses_alpha=0.5, window_size=28, horizons=(1, 7, 28),
    )


QUERIES.update({"theta_forecast": Q(q_theta_forecast, _sql_theta_forecast())})


def q_roc_auc(spark, sf_dir):
    """ROC AUC per ship year: how well does line-item price rank the
    returned items?  (operators/nonparam.roc_auc) — the rank-sum AUC
    identity on count-based midranks: classifier/score evaluation with
    the mann_whitney machinery (AUC = U/(n₊n₋)); gini rides along."""
    from timeseriesutils_spark.operators.nonparam import roc_auc

    return roc_auc(
        _year_rf(spark, sf_dir),
        "l_extendedprice",
        F.col("l_returnflag") == F.lit("R"),
        ["ship_year"],
    )


def _sql_roc_auc():
    from timeseriesutils_spark.operators.nonparam import roc_auc_sql

    return roc_auc_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag = 'R'",
        ["ship_year"],
    )


QUERIES.update({"roc_auc": Q(q_roc_auc, _sql_roc_auc())})


def q_calibration_curve(spark, sf_dir):
    """Reliability diagram + Brier/ECE per ship year
    (operators/forecast.calibration_curve): the 10×-scaled discount as
    a pseudo-probability of return — per-decile predicted-vs-observed
    rates, bin Brier contributions, and the group ECE/Brier summary on
    every row.  roc_auc checks RANKING; this checks CALIBRATION."""
    from timeseriesutils_spark.operators.forecast import calibration_curve

    li = _li(spark, sf_dir)
    d = li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        (F.col("l_discount") * 10.0).alias("p_ret"),
        "l_returnflag",
    )
    return calibration_curve(
        d, "p_ret", F.col("l_returnflag") == F.lit("R"), ["ship_year"],
        bins=10,
    )


def _sql_calibration_curve():
    from timeseriesutils_spark.operators.forecast import calibration_curve_sql

    d = (
        "SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)"
        " AS ship_year, l_discount * 10.0 AS p_ret, l_returnflag"
        " FROM lineitem"
    )
    return calibration_curve_sql(
        d, "p_ret", "l_returnflag = 'R'", ["ship_year"], bins=10
    )


QUERIES.update(
    {"calibration_curve": Q(q_calibration_curve, _sql_calibration_curve())}
)


def q_cochran_armitage(spark, sf_dir):
    """Cochran–Armitage dose-response trend per order status
    (operators/stats.cochran_armitage): does the URGENT-priority rate
    trend linearly across order YEARS?  categorical_assoc's χ² asks
    "different at all?"; this asks "monotone in the ordered score?" —
    one five-statistic aggregation, engine-kernel p-value."""
    from timeseriesutils_spark.operators.stats import cochran_armitage

    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderstatus",
        F.year(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("order_year"),
        "o_orderpriority",
    )
    return cochran_armitage(
        d, "order_year",
        F.col("o_orderpriority") == F.lit("1-URGENT"),
        ["o_orderstatus"],
    )


def _sql_cochran_armitage():
    from timeseriesutils_spark.operators.stats import cochran_armitage_sql

    d = (
        "SELECT o_orderstatus, CAST(EXTRACT(year FROM"
        " CAST(o_orderdate AS DATE)) AS BIGINT) AS order_year,"
        " o_orderpriority FROM orders"
    )
    return cochran_armitage_sql(
        d, "order_year", "o_orderpriority = '1-URGENT'", ["o_orderstatus"]
    )


QUERIES.update(
    {"cochran_armitage": Q(q_cochran_armitage, _sql_cochran_armitage())}
)


_HW_PARAMS = dict(alpha=0.3, beta=0.1, gamma=0.3, season=7, window_size=28)


def q_holt_winters(spark, sf_dir):
    """Additive Holt–Winters smoothing + one-step seasonal forecast on
    the per-supplier daily price series (operators/forecast.
    holt_winters): level + trend + rotating 7-slot seasonal state as a
    truncated linear filter — the seasonal member of the exponential
    family beside holt_smooth and theta_forecast.  One window
    expression, single exchange."""
    from timeseriesutils_spark.operators.forecast import holt_winters
    from timeseriesutils_spark.queries.series_queries import _daily

    return holt_winters(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        **_HW_PARAMS,
    )


def _sql_holt_winters():
    from timeseriesutils_spark.operators.forecast import (
        holt_winters_sql_columns,
    )
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    cols = holt_winters_sql_columns(
        "day_price", ["l_suppkey"], ["ship_day"], **_HW_PARAMS
    )
    sel = ",\n  ".join(f"{expr} AS {name}" for name, expr in cols)
    return (
        "SELECT l_suppkey, ship_day, day_price,\n  "
        f"{sel}\nFROM ({_SQL_DAILY})"
    )


QUERIES.update({"holt_winters": Q(q_holt_winters, _sql_holt_winters())})


def q_friedman_test(spark, sf_dir):
    """Friedman blocked rank test per order status
    (operators/nonparam.friedman_test): across order-month blocks,
    does priority shift order value when each month is only compared
    with itself?  The repeated-measures sibling of kruskal_wallis —
    blocking removes the months' level drift.  Complete-block rule,
    within-block midranks, DECIMAL rank-square reduce."""
    from timeseriesutils_spark.operators.nonparam import friedman_test

    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        "o_orderstatus",
        "o_orderpriority",
        (
            F.year(F.col("o_orderdate").cast("date")) * 12
            + F.month(F.col("o_orderdate").cast("date"))
        ).cast("bigint").alias("order_month"),
        "o_totalprice",
    )
    return friedman_test(
        d, "o_totalprice", "o_orderpriority", "order_month",
        ["o_orderstatus"],
    )


def _sql_friedman_test():
    from timeseriesutils_spark.operators.nonparam import friedman_test_sql

    d = (
        "SELECT o_orderstatus, o_orderpriority,"
        " CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) * 12"
        " + EXTRACT(month FROM CAST(o_orderdate AS DATE)) AS BIGINT)"
        " AS order_month, o_totalprice FROM orders"
    )
    return friedman_test_sql(
        d, "o_totalprice", "o_orderpriority", "order_month",
        ["o_orderstatus"],
    )


QUERIES.update({"friedman_test": Q(q_friedman_test, _sql_friedman_test())})


# --- round-8 wiring: the mleval/stats/sketch/nonparam appends --------------

_SQL_YEAR_PRET = (
    "SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)"
    " AS ship_year, l_discount * 10.0 AS p_ret,"
    " l_returnflag = 'R' AS is_ret FROM lineitem"
)


def _year_pret(spark, sf_dir):
    li = _li(spark, sf_dir)
    return li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        (F.col("l_discount") * 10.0).alias("p_ret"),
        (F.col("l_returnflag") == F.lit("R")).alias("is_ret"),
    )


def q_pr_curve(spark, sf_dir):
    """Precision/recall/F1 threshold sweep per ship year on the
    10×-discount pseudo-probability of return (operators/mleval.
    pr_curve): roc_auc scores the whole ordering, calibration_curve the
    probabilities — this is the table an operating point is picked
    from.  Rows collapse to per-(year, quantized score) counts before
    the 19-point grid fans out; tp/fp/fn are exact integers."""
    from timeseriesutils_spark.operators.mleval import pr_curve

    return pr_curve(_year_pret(spark, sf_dir), "p_ret", "is_ret",
                    ["ship_year"])


def _sql_pr_curve():
    from timeseriesutils_spark.operators.mleval import pr_curve_sql

    return pr_curve_sql(_SQL_YEAR_PRET, "p_ret", "is_ret", ["ship_year"])


QUERIES.update({"pr_curve": Q(q_pr_curve, _sql_pr_curve())})


def q_log_loss(spark, sf_dir):
    """Binary cross-entropy per ship year of the discount
    pseudo-probability (operators/mleval.log_loss): the proper scoring
    rule that punishes confident wrongness — per-row ln terms
    quantized at 1e-9 and DECIMAL-summed so the mean is bit-identical
    across engines."""
    from timeseriesutils_spark.operators.mleval import log_loss

    return log_loss(_year_pret(spark, sf_dir), "p_ret", "is_ret",
                    ["ship_year"])


def _sql_log_loss():
    from timeseriesutils_spark.operators.mleval import log_loss_sql

    return log_loss_sql(_SQL_YEAR_PRET, "p_ret", "is_ret", ["ship_year"])


QUERIES.update({"log_loss": Q(q_log_loss, _sql_log_loss())})


def q_jarque_bera(spark, sf_dir):
    """Jarque–Bera normality test per ship year on line-item prices
    (operators/stats.jarque_bera): the gatekeeper for every
    normal-theory p-value in the engine — skewness + excess kurtosis
    from one raw-power-sum aggregation (Σq..Σq⁴ exact through
    DECIMAL), χ²₂ survival p in closed form."""
    from timeseriesutils_spark.operators.stats import jarque_bera

    return jarque_bera(
        _year_rf(spark, sf_dir), "l_extendedprice", ["ship_year"], scale=2
    )


def _sql_jarque_bera():
    from timeseriesutils_spark.operators.stats import jarque_bera_sql

    return jarque_bera_sql(
        _SQL_YEAR_RF, "l_extendedprice", ["ship_year"], scale=2
    )


QUERIES.update({"jarque_bera": Q(q_jarque_bera, _sql_jarque_bera())})


def q_levene_bf(spark, sf_dir):
    """Brown–Forsythe Levene test per ship year: do the return-flag
    levels have the same price SPREAD?  (operators/stats.levene_bf) —
    the variance-homogeneity gate in front of anova_oneway, robust to
    location via median centering; one scan, per-level exact
    percentile window, anova reduce over |x − med| in doubled
    integers."""
    from timeseriesutils_spark.operators.stats import levene_bf

    return levene_bf(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        ["ship_year"], scale=2,
    )


def _sql_levene_bf():
    from timeseriesutils_spark.operators.stats import levene_bf_sql

    return levene_bf_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", ["ship_year"],
        scale=2,
    )


QUERIES.update({"levene_bf": Q(q_levene_bf, _sql_levene_bf())})


def q_mcnemar_test(spark, sf_dir):
    """McNemar paired-flag test per order status: are 'big ticket'
    (total > 150k) and 'high priority' (URGENT/HIGH) flags on the SAME
    orders symmetric in their disagreement?  (operators/stats.
    mcnemar_test) — the paired two-proportion test; only discordant
    pairs carry information, continuity-corrected χ²₁ via the engine
    p-value kernel."""
    from timeseriesutils_spark.operators.stats import mcnemar_test

    o = load_table(spark, sf_dir, "orders")
    d = o.select("o_orderstatus", "o_totalprice", "o_orderpriority")
    return mcnemar_test(
        d,
        F.col("o_totalprice") > 150000.0,
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        ["o_orderstatus"],
    )


def _sql_mcnemar_test():
    from timeseriesutils_spark.operators.stats import mcnemar_test_sql

    return mcnemar_test_sql(
        "SELECT o_orderstatus, o_totalprice, o_orderpriority FROM orders",
        "o_totalprice > 150000.0",
        "o_orderpriority IN ('1-URGENT', '2-HIGH')",
        ["o_orderstatus"],
    )


QUERIES.update({"mcnemar_test": Q(q_mcnemar_test, _sql_mcnemar_test())})


def q_cohens_kappa(spark, sf_dir):
    """Cohen's kappa per ship year between return flag and line status
    (operators/stats.cohens_kappa): chance-corrected agreement between
    two categorical labelings of the same rows — the labeling-QA score
    (human vs model labels); exact integer confusion cells and
    marginals, κ is the only double."""
    from timeseriesutils_spark.operators.stats import cohens_kappa

    li = _li(spark, sf_dir)
    d = li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        "l_returnflag",
        "l_linestatus",
    )
    return cohens_kappa(d, "l_returnflag", "l_linestatus", ["ship_year"])


def _sql_cohens_kappa():
    from timeseriesutils_spark.operators.stats import cohens_kappa_sql

    d = (
        "SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)"
        " AS ship_year, l_returnflag, l_linestatus FROM lineitem"
    )
    return cohens_kappa_sql(d, "l_returnflag", "l_linestatus",
                            ["ship_year"])


QUERIES.update({"cohens_kappa": Q(q_cohens_kappa, _sql_cohens_kappa())})


_SQL_MONTHLY_VOL_REV = """
  SELECT l_suppkey,
    (CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS BIGINT) - 1992) * 12
      + CAST(EXTRACT(month FROM CAST(l_shipdate AS DATE)) AS BIGINT) - 1 AS mth,
    CAST(COUNT(*) AS DOUBLE) AS n_ship,
    CAST(SUM(l_extendedprice) AS DOUBLE) AS rev
  FROM lineitem GROUP BY 1, 2
"""


def _monthly_vol_rev(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    return (
        li.select(
            "l_suppkey",
            (
                (F.year(d).cast("bigint") - 1992) * 12
                + F.month(d).cast("bigint")
                - 1
            ).alias("mth"),
            "l_extendedprice",
        )
        .groupBy("l_suppkey", "mth")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_ship"),
            F.sum("l_extendedprice").cast("double").alias("rev"),
        )
    )


def q_kendall_tau(spark, sf_dir):
    """Kendall's τ-b per supplier between monthly shipment volume and
    monthly revenue (operators/nonparam.kendall_tau): the concordance
    correlation — does more volume mean more revenue MONOTONICALLY?
    Spearman ranks values; τ counts pair orderings (mann_kendall's S
    against a second series).  Exact integer S and tie counts over the
    ~84-month series; verify-tier O(n²) pairs per group."""
    from timeseriesutils_spark.operators.nonparam import kendall_tau

    return kendall_tau(
        _monthly_vol_rev(spark, sf_dir), "n_ship", "rev", ["l_suppkey"],
        ["mth"], scale=2,
    )


def _sql_kendall_tau():
    from timeseriesutils_spark.operators.nonparam import kendall_tau_sql

    return kendall_tau_sql(
        _SQL_MONTHLY_VOL_REV, "n_ship", "rev", ["l_suppkey"], ["mth"],
        scale=2,
    )


QUERIES.update({"kendall_tau": Q(q_kendall_tau, _sql_kendall_tau())})


# --- round-8 second wave: classical-test + forecast additions --------------


def q_cvm_test(spark, sf_dir):
    """Two-sample Cramér–von Mises per ship year on the same A-vs-R
    price frame as ks_test (operators/nonparam.cvm_test): KS reacts to
    the single largest ECDF gap, CvM to the INTEGRATED squared gap —
    broad mild drift that KS underweights.  Exact integer d_v² sums
    through HUGEINT/DECIMAL; pinned asymptotic 5% threshold."""
    from timeseriesutils_spark.operators.nonparam import cvm_test

    return cvm_test(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        "A", "R", ["ship_year"],
    )


def _sql_cvm_test():
    from timeseriesutils_spark.operators.nonparam import cvm_test_sql

    return cvm_test_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", "A", "R",
        ["ship_year"],
    )


QUERIES.update({"cvm_test": Q(q_cvm_test, _sql_cvm_test())})


def q_pettitt_test(spark, sf_dir):
    """Pettitt rank change-point per supplier on monthly shipment
    counts (operators/nonparam.pettitt_test): WHERE does the level
    shift, and is it significant?  cusum_drift tracks a known
    baseline, best_breakpoint fits two lines — Pettitt needs no model:
    doubled midranks, exact integer U_t, closed-form p."""
    from timeseriesutils_spark.operators.nonparam import pettitt_test

    return pettitt_test(
        _monthly_ship(spark, sf_dir), "n_ship", ["l_suppkey"], ["mth"],
        scale=0,
    )


def _sql_pettitt_test():
    from timeseriesutils_spark.operators.nonparam import pettitt_test_sql

    return pettitt_test_sql(
        _SQL_MONTHLY_SHIP, "n_ship", ["l_suppkey"], ["mth"], scale=0
    )


QUERIES.update({"pettitt_test": Q(q_pettitt_test, _sql_pettitt_test())})


def q_cox_stuart(spark, sf_dir):
    """Cox–Stuart sign trend test per supplier on monthly shipment
    counts (operators/nonparam.cox_stuart): the one-pass paired-sign
    trend screen — mann_kendall weighs all O(n²) pairs, Cox–Stuart
    pairs each first-half point with its second-half counterpart."""
    from timeseriesutils_spark.operators.nonparam import cox_stuart

    return cox_stuart(
        _monthly_ship(spark, sf_dir), "n_ship", ["l_suppkey"], ["mth"],
        scale=0,
    )


def _sql_cox_stuart():
    from timeseriesutils_spark.operators.nonparam import cox_stuart_sql

    return cox_stuart_sql(
        _SQL_MONTHLY_SHIP, "n_ship", ["l_suppkey"], ["mth"], scale=0
    )


QUERIES.update({"cox_stuart": Q(q_cox_stuart, _sql_cox_stuart())})


def q_bartlett_test(spark, sf_dir):
    """Bartlett variance-homogeneity test per ship year
    (operators/stats.bartlett_test): the normal-theory counterpart of
    levene_bf on the same frame — more powerful under normality,
    fragile under heavy tails (jarque_bera is the gate).  Exact
    integer ssn = n·Σq²−(Σq)², HUGEINT/`div` pooled numerator,
    Wilson–Hilferty χ² p."""
    from timeseriesutils_spark.operators.stats import bartlett_test

    return bartlett_test(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        ["ship_year"], scale=0,
    )


def _sql_bartlett_test():
    from timeseriesutils_spark.operators.stats import bartlett_test_sql

    return bartlett_test_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", ["ship_year"],
        scale=0,
    )


QUERIES.update({"bartlett_test": Q(q_bartlett_test, _sql_bartlett_test())})


def q_ljung_box(spark, sf_dir):
    """Ljung–Box white-noise test at lag 7 per supplier on the daily
    price series (operators/acf.ljung_box_test): is there ANY
    autocorrelation left up to a week?  acf_features carries the
    running Q; this is its decision layer via the Wilson–Hilferty χ²
    survival kernel."""
    from timeseriesutils_spark.operators.acf import ljung_box_test
    from timeseriesutils_spark.queries.series_queries import _daily

    return ljung_box_test(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        h=7, scale=0,
    )


def _sql_ljung_box():
    from timeseriesutils_spark.operators.acf import ljung_box_test_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    return ljung_box_test_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"], ["ship_day"],
        h=7, scale=0,
    )


QUERIES.update({"ljung_box": Q(q_ljung_box, _sql_ljung_box())})


_HD_PARAMS = dict(alpha=0.3, beta=0.1, phi=0.9, window_size=28,
                  horizons=(1, 7))


def q_holt_damped(spark, sf_dir):
    """Damped-trend Holt per supplier on the daily price series
    (operators/forecast.holt_damped): the M3 workhorse whose h-step
    forecast flattens toward l + bφ(1−φ^h)/(1−φ) instead of
    extrapolating a line forever — one truncated-filter window
    expression, single exchange, horizons 1 and 7."""
    from timeseriesutils_spark.operators.forecast import holt_damped
    from timeseriesutils_spark.queries.series_queries import _daily

    return holt_damped(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        **_HD_PARAMS,
    )


def _sql_holt_damped():
    from timeseriesutils_spark.operators.forecast import (
        holt_damped_sql_columns,
    )
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    cols = holt_damped_sql_columns(
        "day_price", ["l_suppkey"], ["ship_day"], **_HD_PARAMS
    )
    sel = ",\n  ".join(f"{expr} AS {name}" for name, expr in cols)
    return (
        "SELECT l_suppkey, ship_day, day_price,\n  "
        f"{sel}\nFROM ({_SQL_DAILY})"
    )


QUERIES.update({"holt_damped": Q(q_holt_damped, _sql_holt_damped())})


def q_owa_eval(spark, sf_dir):
    """M4 OWA scorecard of the naive lag-1 forecaster vs the
    seasonal-naive reference on the per-supplier daily price series
    (operators/forecast.owa_eval): ½·(sMAPE/sMAPE_snaive + MASE) —
    the composite that catches forecasters gaming one metric.
    Complete-case rows, quantized per-row ratios, one lag window +
    one aggregation."""
    from timeseriesutils_spark.operators.forecast import owa_eval
    from timeseriesutils_spark.queries.series_queries import _daily

    d = _daily(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("l_suppkey").orderBy("ship_day")
    dd = d.select(
        "l_suppkey",
        "ship_day",
        "day_price",
        F.lag("day_price", 1).over(w).alias("f_lag1"),
    )
    return owa_eval(
        dd, "day_price", "f_lag1", ["l_suppkey"], ["ship_day"], season=7
    )


def _sql_owa_eval():
    from timeseriesutils_spark.operators.forecast import owa_eval_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    dd = (
        "SELECT l_suppkey, ship_day, day_price,"
        " LAG(day_price, 1) OVER (PARTITION BY l_suppkey ORDER BY ship_day)"
        f" AS f_lag1 FROM ({_SQL_DAILY})"
    )
    return owa_eval_sql(
        dd, "day_price", "f_lag1", ["l_suppkey"], ["ship_day"], season=7
    )


QUERIES.update({"owa_eval": Q(q_owa_eval, _sql_owa_eval())})


def q_theil_u(spark, sf_dir):
    """Theil's U2 of the weekly-naive forecaster (lag-7) against the
    daily-naive reference on the per-supplier daily price series
    (operators/forecast.theil_u): the RMSE-ratio companion of
    owa_eval's MASE — squared error punishes the occasional large
    miss that absolute error averages away.  Complete-case rows, one
    lag window + one map-combinable aggregation."""
    from timeseriesutils_spark.operators.forecast import theil_u
    from timeseriesutils_spark.queries.series_queries import _daily
    from pyspark.sql import Window as W

    d = _daily(spark, sf_dir)
    w = W.partitionBy("l_suppkey").orderBy("ship_day")
    dd = d.select(
        "l_suppkey",
        "ship_day",
        "day_price",
        F.lag("day_price", 7).over(w).alias("f_lag7"),
    )
    return theil_u(
        dd, "day_price", "f_lag7", ["l_suppkey"], ["ship_day"], scale=6
    )


def _sql_theil_u():
    from timeseriesutils_spark.operators.forecast import theil_u_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    dd = (
        "SELECT l_suppkey, ship_day, day_price,"
        " LAG(day_price, 7) OVER (PARTITION BY l_suppkey ORDER BY ship_day)"
        f" AS f_lag7 FROM ({_SQL_DAILY})"
    )
    return theil_u_sql(
        dd, "day_price", "f_lag7", ["l_suppkey"], ["ship_day"], scale=6
    )


QUERIES.update({"theil_u": Q(q_theil_u, _sql_theil_u())})


def q_ar2_forecast(spark, sf_dir):
    """AR(2) Yule–Walker fit + 1/7-step mean forecasts per supplier on
    the daily price series (operators/forecast.ar2_forecast): the
    autoregressive forecaster beside the smoothing family — the
    minimal model with oscillatory dynamics.  φs from acf_features'
    exact-integer r₁/r₂; one extra window/agg pass for (μ, last two
    values); group-on-group join of two collapsed frames."""
    from timeseriesutils_spark.operators.forecast import ar2_forecast
    from timeseriesutils_spark.queries.series_queries import _daily

    return ar2_forecast(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        horizons=(1, 7), scale=2, min_pairs=2,
    )


def _sql_ar2_forecast():
    from timeseriesutils_spark.operators.forecast import ar2_forecast_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    return ar2_forecast_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"], ["ship_day"],
        horizons=(1, 7), scale=2, min_pairs=2,
    )


QUERIES.update({"ar2_forecast": Q(q_ar2_forecast, _sql_ar2_forecast())})


def q_classification_report(spark, sf_dir):
    """Multiclass precision/recall/F1 per ship year for a rule-based
    pseudo-classifier of the return flag (operators/mleval.
    classification_report): the hard-label scorecard beside pr_curve's
    threshold sweep — per-class tp/fp/fn from ONE confusion-cell
    collapse, joinless F1."""
    from timeseriesutils_spark.operators.mleval import classification_report

    li = _li(spark, sf_dir)
    pred = F.when(
        F.col("l_linestatus") == "F",
        F.when(F.col("l_discount") > 0.05, F.lit("R")).otherwise(F.lit("A")),
    ).otherwise(F.lit("N"))
    d = li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        F.col("l_returnflag").alias("actual"),
        pred.alias("pred"),
    )
    return classification_report(d, "actual", "pred", ["ship_year"])


def _sql_classification_report():
    from timeseriesutils_spark.operators.mleval import (
        classification_report_sql,
    )

    d = (
        "SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)"
        " AS ship_year, l_returnflag AS actual,"
        " CASE WHEN l_linestatus = 'F' THEN"
        " (CASE WHEN l_discount > 0.05 THEN 'R' ELSE 'A' END)"
        " ELSE 'N' END AS pred FROM lineitem"
    )
    return classification_report_sql(d, "actual", "pred", ["ship_year"])


QUERIES.update(
    {
        "classification_report": Q(
            q_classification_report, _sql_classification_report()
        )
    }
)


def q_gains_curve(spark, sf_dir):
    """Cumulative gains + lift at decile cutoffs per ship year on the
    10×-discount return score (operators/mleval.gains_curve): the
    campaign-targeting view of ranking quality — deterministic
    whole-tie-block inclusion (no ntile: its tie assignment is
    row-order-dependent), exact integer cutoffs."""
    from timeseriesutils_spark.operators.mleval import gains_curve

    return gains_curve(
        _year_pret(spark, sf_dir), "p_ret", "is_ret", ["ship_year"]
    )


def _sql_gains_curve():
    from timeseriesutils_spark.operators.mleval import gains_curve_sql

    return gains_curve_sql(_SQL_YEAR_PRET, "p_ret", "is_ret", ["ship_year"])


QUERIES.update({"gains_curve": Q(q_gains_curve, _sql_gains_curve())})


def q_paired_ttest(spark, sf_dir):
    """Paired t-test per ship year: line 1 vs line 2 extended price
    within the same order (operators/stats.paired_ttest) — the
    within-subject counterpart of welch_ttest: differencing out the
    per-order level isolates the line-position effect.  One self-join
    on order key builds the pairs; exact (n, Σd, Σd²) sufficient
    statistics."""
    from timeseriesutils_spark.operators.stats import paired_ttest

    li = _li(spark, sf_dir)
    l1 = li.filter(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        F.col("l_extendedprice").alias("price_1"),
    )
    l2 = li.filter(F.col("l_linenumber") == 2).select(
        "l_orderkey", F.col("l_extendedprice").alias("price_2")
    )
    pairs = l1.join(l2, "l_orderkey")
    return paired_ttest(pairs, "price_1", "price_2", ["ship_year"])


def _sql_paired_ttest():
    from timeseriesutils_spark.operators.stats import paired_ttest_sql

    pairs = (
        "SELECT l1.l_orderkey,"
        " CAST(EXTRACT(year FROM CAST(l1.l_shipdate AS DATE)) AS INT)"
        " AS ship_year,"
        " l1.l_extendedprice AS price_1, l2.l_extendedprice AS price_2"
        " FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey"
        " AND l1.l_linenumber = 1 AND l2.l_linenumber = 2"
    )
    return paired_ttest_sql(pairs, "price_1", "price_2", ["ship_year"])


QUERIES.update({"paired_ttest": Q(q_paired_ttest, _sql_paired_ttest())})


def q_ad_test(spark, sf_dir):
    """Two-sample Anderson–Darling per ship year on the same A-vs-R
    price frame as ks_test/cvm_test (operators/nonparam.ad_test): the
    TAIL-weighted ECDF test — squared gaps weighted by 1/(F(1−F)),
    which is where price-distribution drift hides.  Scholz–Stephens
    k=2 standardization from 1e15-quantized integer harmonics; exact
    integer gaps; pinned 5% critical value 1.960."""
    from timeseriesutils_spark.operators.nonparam import ad_test

    return ad_test(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        "A", "R", ["ship_year"],
    )


def _sql_ad_test():
    from timeseriesutils_spark.operators.nonparam import ad_test_sql

    return ad_test_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", "A", "R",
        ["ship_year"],
    )


QUERIES.update({"ad_test": Q(q_ad_test, _sql_ad_test())})


def q_kalman_local_level(spark, sf_dir):
    """Local-level Kalman filter on the per-supplier daily price series
    (operators/forecast.kalman_local_level): the classical state-space
    forecaster beside holt_smooth — a diffuse prior renormalizes the
    warm-up weights (no zero-init bias) and the filter ships its own
    one-step forecast variance.  Sliding diffuse-restart contract =
    position-free driver impulse weights = one window expression,
    single exchange."""
    from timeseriesutils_spark.operators.forecast import kalman_local_level
    from timeseriesutils_spark.queries.series_queries import _daily

    return kalman_local_level(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        q=0.1, r=1.0, window_size=30,
    )


def _sql_kalman_local_level():
    from timeseriesutils_spark.operators.forecast import (
        kalman_local_level_sql_columns,
    )
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    cols = kalman_local_level_sql_columns(
        "day_price", ["l_suppkey"], ["ship_day"], q=0.1, r=1.0,
        window_size=30,
    )
    sel = ",\n  ".join(f"{expr} AS {name}" for name, expr in cols)
    return (
        "SELECT l_suppkey, ship_day, day_price,\n  "
        f"{sel}\nFROM ({_SQL_DAILY})"
    )


QUERIES.update(
    {"kalman_local_level": Q(q_kalman_local_level, _sql_kalman_local_level())}
)


def q_emd_1d(spark, sf_dir):
    """Two-sample 1-D earth mover's distance per ship year on the
    A-vs-R price frame (operators/nonparam.emd_1d): the ECDF-family
    member that reports drift IN PRICE UNITS — the literal area
    between the two ECDFs, i.e. the average dollars each unit of
    probability mass must move (ks/cvm/ad report unitless statistics;
    a drift dashboard thresholds THIS one in domain units).  Exact
    int64 gap×width terms through DECIMAL; one collapse + one
    window."""
    from timeseriesutils_spark.operators.nonparam import emd_1d

    return emd_1d(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        "A", "R", ["ship_year"],
    )


def _sql_emd_1d():
    from timeseriesutils_spark.operators.nonparam import emd_1d_sql

    return emd_1d_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", "A", "R",
        ["ship_year"],
    )


QUERIES.update({"emd_1d": Q(q_emd_1d, _sql_emd_1d())})


def q_isotonic_calibrate(spark, sf_dir):
    """Isotonic (PAV) recalibration of the pseudo-probability score per
    ship year (operators/mleval.isotonic_calibrate): calibration_curve
    SHOWS the miscalibration per decile; the isotonic fit is the
    monotone mapping that FIXES it.  Minimax identity over quantized
    score bins — exact int64 pooled sums, bounded O(B²) pair frame."""
    from timeseriesutils_spark.operators.mleval import isotonic_calibrate

    li = _li(spark, sf_dir)
    d = li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        (F.col("l_discount") * 10.0).alias("p_ret"),
        "l_returnflag",
    )
    return isotonic_calibrate(
        d, "p_ret", F.col("l_returnflag") == F.lit("R"), ["ship_year"]
    )


def _sql_isotonic_calibrate():
    from timeseriesutils_spark.operators.mleval import isotonic_calibrate_sql

    d = (
        "SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)"
        " AS ship_year, l_discount * 10.0 AS p_ret, l_returnflag"
        " FROM lineitem"
    )
    return isotonic_calibrate_sql(
        d, "p_ret", "l_returnflag = 'R'", ["ship_year"]
    )


QUERIES.update(
    {"isotonic_calibrate": Q(q_isotonic_calibrate, _sql_isotonic_calibrate())}
)


_VIF_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def q_vif_audit(spark, sf_dir):
    """Variance-inflation-factor multicollinearity screen over the
    lineitem numerics (operators/profile.vif_audit): corr_matrix shows
    the pairwise structure; VIF says which FEATURE to drop before a
    fit (extendedprice ~ quantity·price makes OLS standard errors
    explode silently).  Same one-pass exact Gram statistics, p=3
    closed-form inverse diagonal."""
    from timeseriesutils_spark.operators.profile import vif_audit

    return vif_audit(load_table(spark, sf_dir, "lineitem"), _VIF_COLS)


def _sql_vif_audit():
    from timeseriesutils_spark.operators.profile import vif_audit_sql

    return vif_audit_sql("lineitem", _VIF_COLS)


QUERIES.update({"vif_audit": Q(q_vif_audit, _sql_vif_audit())})


def q_mood_median_test(spark, sf_dir):
    """Mood's median test per ship year on the A-vs-R price frame
    (operators/nonparam.mood_median_test): the assumption-free member
    of the two-sample family — mann_whitney reads location only under
    comparable shapes; Mood's just asks whether each arm straddles the
    POOLED median alike.  Exact integer median rule + 2×2 χ² with the
    Wilson–Hilferty p kernel."""
    from timeseriesutils_spark.operators.nonparam import mood_median_test

    return mood_median_test(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        "A", "R", ["ship_year"],
    )


def _sql_mood_median_test():
    from timeseriesutils_spark.operators.nonparam import mood_median_test_sql

    return mood_median_test_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", "A", "R",
        ["ship_year"],
    )


QUERIES.update(
    {"mood_median_test": Q(q_mood_median_test, _sql_mood_median_test())}
)


def q_partial_corr(spark, sf_dir):
    """Partial correlations over the lineitem numerics
    (operators/profile.partial_corr): does quantity still track
    extendedprice once discount is held fixed?  The confounder screen
    beside corr_matrix (raw pairs) and vif_audit (inflation) — same
    one-pass exact Gram statistics, closed-form per rotation."""
    from timeseriesutils_spark.operators.profile import partial_corr

    return partial_corr(load_table(spark, sf_dir, "lineitem"), _VIF_COLS)


def _sql_partial_corr():
    from timeseriesutils_spark.operators.profile import partial_corr_sql

    return partial_corr_sql("lineitem", _VIF_COLS)


QUERIES.update({"partial_corr": Q(q_partial_corr, _sql_partial_corr())})


def q_trimmed_mean(spark, sf_dir):
    """10%-trimmed mean of order totals per priority
    (operators/stats.trimmed_mean): the robust location summary
    between the mean and the median — exact integer slice bounds,
    quantized ordered fold, one double division."""
    from timeseriesutils_spark.operators.stats import trimmed_mean

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    return trimmed_mean(o, "o_totalprice", ["o_orderpriority"])


def _sql_trimmed_mean():
    from timeseriesutils_spark.operators.stats import trimmed_mean_sql

    return trimmed_mean_sql("orders", "o_totalprice", ["o_orderpriority"])


QUERIES.update({"trimmed_mean": Q(q_trimmed_mean, _sql_trimmed_mean())})


def q_lorenz_curve(spark, sf_dir):
    """Lorenz concentration curve of order value per priority class
    (operators/analytics.lorenz_curve): gini_index's single number,
    unrolled into the decile curve a revenue-concentration dashboard
    plots — whole-tie-block ceil cutoffs (the gains_curve contract),
    exact DECIMAL value sums."""
    from timeseriesutils_spark.operators.analytics import lorenz_curve

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    return lorenz_curve(o, "o_totalprice", ["o_orderpriority"])


def _sql_lorenz_curve():
    from timeseriesutils_spark.operators.analytics import lorenz_curve_sql

    return lorenz_curve_sql(
        "SELECT o_orderpriority, o_totalprice FROM orders",
        "o_totalprice", ["o_orderpriority"],
    )


QUERIES.update({"lorenz_curve": Q(q_lorenz_curve, _sql_lorenz_curve())})


def q_quantile_mapping(spark, sf_dir):
    """Quantile mapping (CDF matching) of returned-item prices onto the
    accepted-item distribution per ship year
    (operators/stats.quantile_mapping): the non-parametric
    bias-correction transform — after mapping, the R arm's prices are
    directly comparable to the A arm's without assuming a shift model.
    Mid-rank ECDF positions from exact integer ranks, shared
    quantile_cont lerp."""
    from timeseriesutils_spark.operators.stats import quantile_mapping

    d = _year_rf(spark, sf_dir).filter(
        F.col("l_returnflag").isin(["A", "R"])
    )
    return quantile_mapping(
        d, "l_extendedprice", ["ship_year"], F.col("l_returnflag") == "A"
    )


def _sql_quantile_mapping():
    from timeseriesutils_spark.operators.stats import quantile_mapping_sql

    d = (
        f"(SELECT * FROM ({_SQL_YEAR_RF})"
        " WHERE l_returnflag IN ('A', 'R')) AS t"
    )
    return quantile_mapping_sql(
        d, "l_extendedprice", ["ship_year"], "l_returnflag = 'A'",
        "ship_year, l_returnflag, l_extendedprice",
    )


QUERIES.update(
    {"quantile_mapping": Q(q_quantile_mapping, _sql_quantile_mapping())}
)


def q_theil_index(spark, sf_dir):
    """Theil T inequality of order value per priority class
    (operators/analytics.theil_index): the decomposable member of the
    inequality family beside gini_index and lorenz_curve — quantized
    exact mean, 1e-9-quantized per-row entropy terms summed as
    integers."""
    from timeseriesutils_spark.operators.analytics import theil_index

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    return theil_index(o, "o_totalprice", ["o_orderpriority"])


def _sql_theil_index():
    from timeseriesutils_spark.operators.analytics import theil_index_sql

    return theil_index_sql(
        "SELECT o_orderpriority, o_totalprice FROM orders",
        "o_totalprice", ["o_orderpriority"],
    )


QUERIES.update({"theil_index": Q(q_theil_index, _sql_theil_index())})


def q_seasonal_mann_kendall(spark, sf_dir):
    """Seasonal Mann–Kendall trend test on monthly shipped quantity per
    supplier (operators/regression.seasonal_mann_kendall, Hirsch–Slack
    1984): each calendar month compares only with itself across years,
    so an annual cycle cannot masquerade as (or mask) a trend — the
    seasonal member beside mann_kendall/theilsen.  Exact-integer
    per-season variance numerators pooled as integers."""
    from timeseriesutils_spark.operators.regression import (
        seasonal_mann_kendall,
    )

    li = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    mq = li.select(
        "l_suppkey",
        F.year(d).cast("int").alias("yr"),
        F.month(d).cast("int").alias("mon"),
        "l_quantity",
    ).groupBy("l_suppkey", "yr", "mon").agg(
        F.sum("l_quantity").alias("qty")
    ).filter(F.col("l_suppkey") < 20)
    return seasonal_mann_kendall(
        mq, "qty", ["l_suppkey"], "yr", "mon"
    )


def _sql_seasonal_mann_kendall():
    from timeseriesutils_spark.operators.regression import (
        seasonal_mann_kendall_sql,
    )

    d = (
        "SELECT l_suppkey, yr, mon, qty FROM ("
        "SELECT l_suppkey,"
        " CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT) AS yr,"
        " CAST(EXTRACT(month FROM CAST(l_shipdate AS DATE)) AS INT) AS mon,"
        " CAST(SUM(l_quantity) AS DOUBLE) AS qty"
        " FROM lineitem GROUP BY 1, 2, 3) WHERE l_suppkey < 20"
    )
    return seasonal_mann_kendall_sql(d, "qty", ["l_suppkey"], "yr", "mon")


QUERIES.update({
    "seasonal_mann_kendall": Q(
        q_seasonal_mann_kendall, _sql_seasonal_mann_kendall()
    )
})


def q_cronbach_alpha(spark, sf_dir):
    """Cronbach's α over the three lineitem rate columns per return
    flag (operators/stats.cronbach_alpha): the internal-consistency
    reliability coefficient — here a capability row exercising the
    exact sufficient-statistics path (quantity/discount/tax are not a
    psychometric scale; the number is well-defined regardless)."""
    from timeseriesutils_spark.operators.stats import cronbach_alpha

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_tax"
    )
    return cronbach_alpha(
        li, ["l_quantity", "l_discount", "l_tax"], ["l_returnflag"]
    )


def _sql_cronbach_alpha():
    from timeseriesutils_spark.operators.stats import cronbach_alpha_sql

    return cronbach_alpha_sql(
        "lineitem", ["l_quantity", "l_discount", "l_tax"], ["l_returnflag"]
    )


QUERIES.update(
    {"cronbach_alpha": Q(q_cronbach_alpha, _sql_cronbach_alpha())}
)


def q_ks_uniform_audit(spark, sf_dir):
    """One-sample KS uniformity audit of the md5 sampling key per
    order priority (operators/profile.ks_uniform_audit): hash_split
    and every md5-deterministic sampler in this repo ASSUME the
    fractional hash is U(0,1) — this is the test that checks it
    (exact integer ECDF gaps, quantized 3-term Kolmogorov tail)."""
    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.operators.profile import ks_uniform_audit

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (
            (portable_hash64(F.col("o_orderkey").cast("string"))
             % F.lit(1000000)).cast("double") / F.lit(1000000.0)
        ).alias("u"),
    )
    return ks_uniform_audit(o, "u", ["o_orderpriority"])


def _sql_ks_uniform_audit():
    from timeseriesutils_spark.operators.dedup import portable_hash64_sql
    from timeseriesutils_spark.operators.profile import ks_uniform_audit_sql

    h = portable_hash64_sql("CAST(o_orderkey AS VARCHAR)")
    d = (
        f"SELECT o_orderpriority, CAST(({h}) % 1000000 AS DOUBLE)"
        " / 1000000.0 AS u FROM orders"
    )
    return ks_uniform_audit_sql(d, "u", ["o_orderpriority"])


QUERIES.update(
    {"ks_uniform_audit": Q(q_ks_uniform_audit, _sql_ks_uniform_audit())}
)


def q_cohens_d(spark, sf_dir):
    """Cohen's d / Hedges' g effect size per ship year on the A-vs-R
    price frame (operators/stats.cohens_d): welch_ttest says the means
    differ; d says by HOW MANY pooled standard deviations — the number
    that survives 100 TB sample sizes.  One exact sufficient-stats
    pass."""
    from timeseriesutils_spark.operators.stats import cohens_d

    return cohens_d(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        "A", "R", ["ship_year"],
    )


def _sql_cohens_d():
    from timeseriesutils_spark.operators.stats import cohens_d_sql

    return cohens_d_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", "A", "R",
        ["ship_year"],
    )


QUERIES.update({"cohens_d": Q(q_cohens_d, _sql_cohens_d())})


def q_cliffs_delta(spark, sf_dir):
    """Cliff's delta ordinal effect size per ship year
    (operators/nonparam.cliffs_delta): the distribution-free companion
    of cohens_d — pure order counts #{a>b} vs #{a<b} from ONE
    cumulative window over the collapsed value frame (never an O(n²)
    pair join), with the Romano magnitude bands."""
    from timeseriesutils_spark.operators.nonparam import cliffs_delta

    return cliffs_delta(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        "A", "R", ["ship_year"],
    )


def _sql_cliffs_delta():
    from timeseriesutils_spark.operators.nonparam import cliffs_delta_sql

    return cliffs_delta_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", "A", "R",
        ["ship_year"],
    )


QUERIES.update({"cliffs_delta": Q(q_cliffs_delta, _sql_cliffs_delta())})


def q_brier_decomposition(spark, sf_dir):
    """Murphy decomposition of the pseudo-probability Brier score per
    ship year (operators/mleval.brier_decomposition): splits the same
    frame calibration_curve plots into reliability (fixable by
    isotonic_calibrate), resolution (real discrimination), and the
    base-rate uncertainty floor — the three-number diagnosis."""
    from timeseriesutils_spark.operators.mleval import brier_decomposition

    li = _li(spark, sf_dir)
    d = li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        (F.col("l_discount") * 10.0).alias("p_ret"),
        "l_returnflag",
    )
    return brier_decomposition(
        d, "p_ret", F.col("l_returnflag") == F.lit("R"), ["ship_year"]
    )


def _sql_brier_decomposition():
    from timeseriesutils_spark.operators.mleval import (
        brier_decomposition_sql,
    )

    d = (
        "SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)"
        " AS ship_year, l_discount * 10.0 AS p_ret, l_returnflag"
        " FROM lineitem"
    )
    return brier_decomposition_sql(
        d, "p_ret", "l_returnflag = 'R'", ["ship_year"]
    )


QUERIES.update({
    "brier_decomposition": Q(
        q_brier_decomposition, _sql_brier_decomposition()
    )
})


def q_arma11_forecast(spark, sf_dir):
    """ARMA(1,1) method-of-moments fit + 1/7-step forecasts per
    supplier on the daily price series (operators/forecast.
    arma11_forecast): the moving-average member the forecaster family
    was missing — the innovations recursion collapses to a truncated
    geometric filter (φ+θ)Σ(−θ)^k(y_{t−k}−μ), the kalman/holt linear
    -filter discipline with a data-dependent ratio chained through
    named columns (never POWER)."""
    from timeseriesutils_spark.operators.forecast import arma11_forecast
    from timeseriesutils_spark.queries.series_queries import _daily

    return arma11_forecast(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        horizons=(1, 7), scale=2, min_pairs=2,
    )


def _sql_arma11_forecast():
    from timeseriesutils_spark.operators.forecast import arma11_forecast_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    return arma11_forecast_sql(
        f"({_SQL_DAILY})", "day_price", ["l_suppkey"], ["ship_day"],
        horizons=(1, 7), scale=2, min_pairs=2,
    )


QUERIES.update({"arma11_forecast": Q(q_arma11_forecast, _sql_arma11_forecast())})


def q_durbin_watson(spark, sf_dir):
    """Durbin–Watson first-order serial-correlation statistic per
    supplier over the daily price series (operators/stats.
    durbin_watson): the residual-diagnosis opener — DW ≈ 2(1−ρ₁);
    exact integer Δ² numerator (center-invariant), power-sum
    denominator, one window pass + one reduce."""
    from timeseriesutils_spark.operators.stats import durbin_watson
    from timeseriesutils_spark.queries.series_queries import _daily

    return durbin_watson(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        scale=2,
    )


def _sql_durbin_watson():
    from timeseriesutils_spark.operators.stats import durbin_watson_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    return durbin_watson_sql(
        _SQL_DAILY, "day_price", ["l_suppkey"], ["ship_day"], scale=2
    )


def q_dagostino_k2(spark, sf_dir):
    """D'Agostino K² omnibus normality test per ship year on line-item
    prices (operators/stats.dagostino_k2): the finite-sample-calibrated
    companion of jarque_bera — separately-normalized skewness/kurtosis
    z-scores (D'Agostino 1970, Anscombe–Glynn 1983), exact power sums,
    1e-9-quantized transform outputs, closed-form χ²₂ p."""
    from timeseriesutils_spark.operators.stats import dagostino_k2

    return dagostino_k2(
        _year_rf(spark, sf_dir), "l_extendedprice", ["ship_year"], scale=2
    )


def _sql_dagostino_k2():
    from timeseriesutils_spark.operators.stats import dagostino_k2_sql

    return dagostino_k2_sql(
        _SQL_YEAR_RF, "l_extendedprice", ["ship_year"], scale=2
    )


QUERIES.update(
    {
        "durbin_watson": Q(q_durbin_watson, _sql_durbin_watson()),
        "dagostino_k2": Q(q_dagostino_k2, _sql_dagostino_k2()),
    }
)


def q_hodges_lehmann(spark, sf_dir):
    """Hodges–Lehmann robust location per supplier over monthly
    revenue (operators/nonparam.hodges_lehmann): the median of Walsh
    averages — the signed-rank-inverted center between the mean and
    the median; exact integer Walsh sums + the shared lerp median.
    Declared engine = the Arrow numpy-broadcast kernel (the gibberish
    precedent: bit-identical to the expression engine on exact ints —
    pinned in tests — and ~2× faster; the expression form remains the
    twin mirror of the SQL oracle)."""
    from timeseriesutils_spark.operators.nonparam import hodges_lehmann

    return hodges_lehmann(
        _monthly_vol_rev(spark, sf_dir), "rev", ["l_suppkey"], scale=2,
        engine="arrow",
    )


def _sql_hodges_lehmann():
    from timeseriesutils_spark.operators.nonparam import hodges_lehmann_sql

    return hodges_lehmann_sql(
        _SQL_MONTHLY_VOL_REV, "rev", ["l_suppkey"], scale=2
    )


QUERIES.update(
    {"hodges_lehmann": Q(q_hodges_lehmann, _sql_hodges_lehmann())}
)


_JT_LEVELS = ["low", "mid", "high"]


def _year_band_qty(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_discount") < 0.03, "low")
        .when(F.col("l_discount") < 0.07, "mid")
        .otherwise("high")
    )
    return li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        band.alias("disc_band"),
        "l_quantity",
    )


_SQL_YEAR_BAND_QTY = """
  SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT) AS ship_year,
    CASE WHEN l_discount < 0.03e0 THEN 'low'
         WHEN l_discount < 0.07e0 THEN 'mid' ELSE 'high' END AS disc_band,
    l_quantity
  FROM lineitem
"""


def q_jonckheere_terpstra(spark, sf_dir):
    """Jonckheere–Terpstra ordered-trend test per ship year: does
    quantity rise across the ORDERED discount bands low→mid→high
    (operators/nonparam.jonckheere_terpstra)?  The a-priori-ordered
    replacement for kruskal_wallis — pooled upward Mann–Whitney
    counts from one cumulative window, tie-corrected normal null."""
    from timeseriesutils_spark.operators.nonparam import jonckheere_terpstra

    return jonckheere_terpstra(
        _year_band_qty(spark, sf_dir), "l_quantity", "disc_band",
        _JT_LEVELS, ["ship_year"], scale=2,
    )


def _sql_jonckheere_terpstra():
    from timeseriesutils_spark.operators.nonparam import (
        jonckheere_terpstra_sql,
    )

    return jonckheere_terpstra_sql(
        _SQL_YEAR_BAND_QTY, "l_quantity", "disc_band", _JT_LEVELS,
        ["ship_year"], scale=2,
    )


QUERIES.update(
    {
        "jonckheere_terpstra": Q(
            q_jonckheere_terpstra, _sql_jonckheere_terpstra()
        )
    }
)


_PAGE_QUARTERS = [1, 2, 3, 4]


def _supp_quarter_rev(spark, sf_dir):
    """One row per (supplier block, quarter treatment): exact decimal
    revenue sum — Page's complete-block input."""
    from timeseriesutils_spark.functions.exact import dsum

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_suppkey",
            F.quarter(F.col("l_shipdate").cast("date")).cast("int").alias(
                "qtr"
            ),
            "l_extendedprice",
        )
        .groupBy("l_suppkey", "qtr")
        .agg(dsum("l_extendedprice").alias("rev"))
    )


_SQL_SUPP_QUARTER_REV = f"""
  SELECT l_suppkey,
    CAST(EXTRACT(quarter FROM CAST(l_shipdate AS DATE)) AS INT) AS qtr,
    {_dsum_sql('l_extendedprice')} AS rev
  FROM lineitem GROUP BY 1, 2
"""


def q_page_trend(spark, sf_dir):
    """Page trend test across quarters (operators/nonparam.page_trend):
    blocks = suppliers, ordered treatments = Q1→Q4 revenue — does
    revenue rise through the year consistently across suppliers?
    friedman_test's directional sibling; doubled integer mid-ranks,
    complete blocks only."""
    from timeseriesutils_spark.operators.nonparam import page_trend

    return page_trend(
        _supp_quarter_rev(spark, sf_dir), "rev", "l_suppkey", "qtr",
        _PAGE_QUARTERS, scale=2,
    )


def _sql_page_trend():
    from timeseriesutils_spark.operators.nonparam import page_trend_sql

    return page_trend_sql(
        _SQL_SUPP_QUARTER_REV, "rev", "l_suppkey", "qtr", _PAGE_QUARTERS,
        scale=2,
    )


QUERIES.update({"page_trend": Q(q_page_trend, _sql_page_trend())})


def q_boxcox_guerrero(spark, sf_dir):
    """Guerrero Box–Cox λ per supplier over 28-day blocks of the daily
    price series (operators/forecast.boxcox_guerrero): the
    variance-stabilization pre-step for the additive forecaster family
    — argmin-CV over the literal λ grid with quantized-log block
    ratios and max-shifted exact exponential sums."""
    from timeseriesutils_spark.operators.forecast import boxcox_guerrero
    from timeseriesutils_spark.queries.series_queries import _daily

    d = _daily(spark, sf_dir).selectExpr(
        "*", "CAST(ship_day div 28 AS BIGINT) AS blk"
    )
    return boxcox_guerrero(d, "day_price", ["l_suppkey"], ["blk"])


def _sql_boxcox_guerrero():
    from timeseriesutils_spark.operators.forecast import boxcox_guerrero_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    inner = (
        f"SELECT *, CAST(ship_day // 28 AS BIGINT) AS blk FROM ({_SQL_DAILY})"
    )
    return boxcox_guerrero_sql(inner, "day_price", ["l_suppkey"], ["blk"])


QUERIES.update(
    {"boxcox_guerrero": Q(q_boxcox_guerrero, _sql_boxcox_guerrero())}
)


def _year_rf_qty(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        "l_returnflag",
        "l_quantity",
    )


_SQL_YEAR_RF_QTY = """
  SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT) AS ship_year,
    l_returnflag, l_quantity
  FROM lineitem
"""


def q_brunner_munzel(spark, sf_dir):
    """Brunner–Munzel robust two-sample test per ship year: quantity
    under returnflag A vs R (operators/nonparam.brunner_munzel) — the
    heteroscedasticity-robust replacement for mann_whitney (each arm's
    own rank variance; no equal-shape assumption).  Doubled integer
    midranks, shift-cancelled exact variance sums."""
    from timeseriesutils_spark.operators.nonparam import brunner_munzel

    return brunner_munzel(
        _year_rf_qty(spark, sf_dir), "l_quantity", "l_returnflag",
        "A", "R", ["ship_year"], scale=2,
    )


def _sql_brunner_munzel():
    from timeseriesutils_spark.operators.nonparam import brunner_munzel_sql

    return brunner_munzel_sql(
        _SQL_YEAR_RF_QTY, "l_quantity", "l_returnflag", "A", "R",
        ["ship_year"], scale=2,
    )


QUERIES.update(
    {"brunner_munzel": Q(q_brunner_munzel, _sql_brunner_munzel())}
)


def q_van_der_waerden(spark, sf_dir):
    """Van der Waerden normal-scores test per ship year across the
    three return-flag arms (operators/nonparam.van_der_waerden):
    kruskal_wallis's full-efficiency sibling — pooled midranks through
    the quantized Acklam Φ⁻¹ kernel, exact integer score sums, χ²
    decision via Wilson–Hilferty."""
    from timeseriesutils_spark.operators.nonparam import van_der_waerden

    return van_der_waerden(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        ["A", "N", "R"], ["ship_year"], scale=2,
    )


def _sql_van_der_waerden():
    from timeseriesutils_spark.operators.nonparam import van_der_waerden_sql

    return van_der_waerden_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", ["A", "N", "R"],
        ["ship_year"], scale=2,
    )


QUERIES.update(
    {"van_der_waerden": Q(q_van_der_waerden, _sql_van_der_waerden())}
)


def q_fligner_killeen(spark, sf_dir):
    """Fligner–Killeen robust scale test per ship year across the
    return-flag arms (operators/nonparam.fligner_killeen): do the arms
    differ in SPREAD?  The rank-based member completing the scale
    family (bartlett: normal-theory; levene_bf: deviation means) —
    median-centered |deviations| → pooled midranks → quantized Acklam
    normal scores → exact χ² statistic."""
    from timeseriesutils_spark.operators.nonparam import fligner_killeen

    return fligner_killeen(
        _year_rf(spark, sf_dir), "l_extendedprice", "l_returnflag",
        ["A", "N", "R"], ["ship_year"], scale=2,
    )


def _sql_fligner_killeen():
    from timeseriesutils_spark.operators.nonparam import fligner_killeen_sql

    return fligner_killeen_sql(
        _SQL_YEAR_RF, "l_extendedprice", "l_returnflag", ["A", "N", "R"],
        ["ship_year"], scale=2,
    )


QUERIES.update(
    {"fligner_killeen": Q(q_fligner_killeen, _sql_fligner_killeen())}
)


def _ens_forecast(spark, sf_dir):
    """Trailing-28-observation EMPIRICAL-SAMPLE forecaster over the
    per-supplier daily price series — the ensemble sibling of the
    pinball/wis empirical-quantile forecaster: the 28 historical values
    ARE the ensemble members (sorted ascending, full windows only)."""
    from pyspark.sql import Window

    from timeseriesutils_spark.queries.series_queries import _daily

    d = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("ship_day")
        .rowsBetween(-_PB_W, -1)
    )
    arr = F.sort_array(F.collect_list("day_price").over(w))
    return d.select(
        (F.col("l_suppkey") % 10).alias("cohort"),
        F.col("day_price"),
        arr.alias("ens"),
    ).filter(F.size("ens") == _PB_W)


def _sql_ens_forecast():
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    over = (
        "(PARTITION BY l_suppkey ORDER BY ship_day "
        f"ROWS BETWEEN {_PB_W} PRECEDING AND 1 PRECEDING)"
    )
    return f"""
SELECT cohort, day_price, _arr AS ens
FROM (
  SELECT l_suppkey % 10 AS cohort, day_price,
    list_sort(list(day_price) OVER {over}) AS _arr
  FROM ({_SQL_DAILY})
) WHERE len(_arr) = {_PB_W}
"""


def q_crps_sample(spark, sf_dir):
    """Sample-form CRPS (operators/epi.crps_sample): the
    trailing-28-member empirical ensemble scored against the realized
    daily price, per supplier cohort — the proper-score level metric
    for trajectory forecasters, beside pinball/WIS for quantile ones.
    Exact int64 absolute-error fold + unrolled sorted-pair spread."""
    from timeseriesutils_spark.operators.epi import crps_sample

    return crps_sample(
        _ens_forecast(spark, sf_dir), "day_price", "ens", _PB_W, ["cohort"]
    )


def _sql_crps_sample():
    from timeseriesutils_spark.operators.epi import crps_sample_sql

    return crps_sample_sql(
        _sql_ens_forecast(), "day_price", "ens", _PB_W, ["cohort"]
    )


QUERIES.update({"crps_sample": Q(q_crps_sample, _sql_crps_sample())})


def q_pit_histogram(spark, sf_dir):
    """Talagrand verification-rank histogram (operators/epi.
    pit_histogram) of the same 28-member empirical ensemble: where the
    observation lands among its members, binned 1..29 per cohort —
    the calibration diagnostic paired with crps_sample's level score.
    Deterministic middle-split tie rank."""
    from timeseriesutils_spark.operators.epi import pit_histogram

    return pit_histogram(
        _ens_forecast(spark, sf_dir), "day_price", "ens", _PB_W, ["cohort"]
    )


def _sql_pit_histogram():
    from timeseriesutils_spark.operators.epi import pit_histogram_sql

    return pit_histogram_sql(
        _sql_ens_forecast(), "day_price", "ens", _PB_W, ["cohort"]
    )


QUERIES.update({"pit_histogram": Q(q_pit_histogram, _sql_pit_histogram())})


def q_wallinga_teunis(spark, sf_dir):
    """Wallinga–Teunis case reproduction number (operators/epi.
    wallinga_teunis): the retrospective forward-attribution twin of
    renewal_rt on the same daily order-count incidence series and the
    same integer serial-interval kernel — one window pass computes
    both the lag force and the lead attribution sum."""
    from timeseriesutils_spark.operators.epi import wallinga_teunis

    o = load_table(spark, sf_dir, "orders")
    counts = (
        o.select(
            "o_orderpriority",
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("day"),
        )
        .groupBy("o_orderpriority", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return wallinga_teunis(
        counts, "n", "day", ["o_orderpriority"], weights=_RT_WEIGHTS
    )


def _sql_wallinga_teunis():
    from timeseriesutils_spark.operators.epi import wallinga_teunis_sql

    counts = (
        f"SELECT o_orderpriority, {_ORD_DAY_SQL} AS day, COUNT(*) AS n "
        "FROM orders GROUP BY 1, 2"
    )
    return wallinga_teunis_sql(
        counts, "n", "day", ["o_orderpriority"], weights=_RT_WEIGHTS
    )


QUERIES.update(
    {"wallinga_teunis": Q(q_wallinga_teunis, _sql_wallinga_teunis())}
)


def q_energy_distance(spark, sf_dir):
    """Székely–Rizzo two-sample energy distance per ship year
    (operators/nonparam.energy_distance): quantity under returnflag A
    vs R — the omnibus distributional companion to ks_test (worst ECDF
    gap) and brunner_munzel (stochastic order) on the same frame; zero
    iff the arms are identically distributed.  Sorted-order pair
    identity, exact DECIMAL cross-pair algebra, no pair join."""
    from timeseriesutils_spark.operators.nonparam import energy_distance

    return energy_distance(
        _year_rf_qty(spark, sf_dir), "l_quantity", "l_returnflag",
        "A", "R", ["ship_year"], scale=2,
    )


def _sql_energy_distance():
    from timeseriesutils_spark.operators.nonparam import energy_distance_sql

    return energy_distance_sql(
        _SQL_YEAR_RF_QTY, "l_quantity", "l_returnflag", "A", "R",
        ["ship_year"], scale=2,
    )


QUERIES.update(
    {"energy_distance": Q(q_energy_distance, _sql_energy_distance())}
)


def q_kpss_test(spark, sf_dir):
    """KPSS level-stationarity test per supplier daily price series
    (operators/regression.kpss_test): adf_test's reversed-null
    complement on the SAME series — the two-test confirmation protocol
    (reject ADF + accept KPSS = stationary).  Cleared-residual integer
    partial sums, Bartlett lag-4 long-run variance, one exact integer
    ratio per group."""
    from timeseriesutils_spark.operators.regression import kpss_test

    return kpss_test(
        _daily_pq(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        lags=4, scale=2,
    )


def _sql_kpss_test():
    from timeseriesutils_spark.operators.regression import kpss_test_sql

    return kpss_test_sql(
        _SQL_DAILY_PQ, "day_price", ["l_suppkey"], ["ship_day"],
        lags=4, scale=2,
    )


QUERIES.update({"kpss_test": Q(q_kpss_test, _sql_kpss_test())})


def q_icc_oneway(spark, sf_dir):
    """One-way random-effects intraclass correlation ICC(1,1)
    (operators/stats.icc_oneway): line-item quantities as replicate
    'ratings' of their order, per order cohort — how much quantity
    variance is BETWEEN orders (Shrout–Fleiss case 1, unbalanced-k₀
    ANOVA form).  Two map-combinable aggregations, per-unit quantized
    rational, shared double tree."""
    from timeseriesutils_spark.operators.stats import icc_oneway

    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        (F.col("l_orderkey") % 8).cast("bigint").alias("cohort"),
        "l_orderkey",
        "l_quantity",
    )
    return icc_oneway(d, "l_quantity", "l_orderkey", ["cohort"], scale=2)


def _sql_icc_oneway():
    from timeseriesutils_spark.operators.stats import icc_oneway_sql

    d = (
        "SELECT CAST(l_orderkey % 8 AS BIGINT) AS cohort, l_orderkey,"
        " l_quantity FROM lineitem"
    )
    return icc_oneway_sql(d, "l_quantity", "l_orderkey", ["cohort"], scale=2)


QUERIES.update({"icc_oneway": Q(q_icc_oneway, _sql_icc_oneway())})


def q_qini_curve(spark, sf_dir):
    """Qini / uplift curve per ship year (operators/mleval.qini_curve):
    gains_curve's uplift sibling on the same 10×-discount score —
    order-parity lines as the 'treated' arm, return as response; how
    many INCREMENTAL returns does targeting the top deciles isolate?
    Shared-cutoff whole-tie-block deciles, exact integer arm
    counters."""
    from timeseriesutils_spark.operators.mleval import qini_curve

    li = _li(spark, sf_dir)
    d = li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        (F.col("l_discount") * 10.0).alias("p_ret"),
        (F.col("l_orderkey") % 2 == 0).alias("treated"),
        (F.col("l_returnflag") == F.lit("R")).alias("is_ret"),
    )
    return qini_curve(d, "p_ret", "treated", "is_ret", ["ship_year"])


def _sql_qini_curve():
    from timeseriesutils_spark.operators.mleval import qini_curve_sql

    d = (
        "SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)"
        " AS ship_year, l_discount * 10.0 AS p_ret,"
        " l_orderkey % 2 = 0 AS treated,"
        " l_returnflag = 'R' AS is_ret FROM lineitem"
    )
    return qini_curve_sql(d, "p_ret", "treated", "is_ret", ["ship_year"])


QUERIES.update({"qini_curve": Q(q_qini_curve, _sql_qini_curve())})


def q_variance_ratio(spark, sf_dir):
    """Lo–MacKinlay variance-ratio test per supplier daily price series
    (operators/regression.variance_ratio): the random-walk screen
    completing the stationarity triage with adf_test and kpss_test on
    the SAME series — VR(5) with the drift cleared into exact integer
    sums and the overlapping-window normalizer collapsed to one integer
    ratio."""
    from timeseriesutils_spark.operators.regression import variance_ratio

    return variance_ratio(
        _daily_pq(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        q=5, scale=2,
    )


def _sql_variance_ratio():
    from timeseriesutils_spark.operators.regression import variance_ratio_sql

    return variance_ratio_sql(
        _SQL_DAILY_PQ, "day_price", ["l_suppkey"], ["ship_day"], q=5, scale=2
    )


QUERIES.update({"variance_ratio": Q(q_variance_ratio, _sql_variance_ratio())})


def q_ansari_bradley(spark, sf_dir):
    """Ansari–Bradley rank scale test per ship year (operators/
    nonparam.ansari_bradley): quantity dispersion under returnflag A vs
    R — the pure-rank member of the scale family beside bartlett
    (normal-theory), levene_bf, and fligner_killeen (normal scores),
    on the same two-arm frame as brunner_munzel.  Doubled end-distance
    scores, tie-robust conditional moments."""
    from timeseriesutils_spark.operators.nonparam import ansari_bradley

    return ansari_bradley(
        _year_rf_qty(spark, sf_dir), "l_quantity", "l_returnflag",
        "A", "R", ["ship_year"], scale=2,
    )


def _sql_ansari_bradley():
    from timeseriesutils_spark.operators.nonparam import ansari_bradley_sql

    return ansari_bradley_sql(
        _SQL_YEAR_RF_QTY, "l_quantity", "l_returnflag", "A", "R",
        ["ship_year"], scale=2,
    )


QUERIES.update(
    {"ansari_bradley": Q(q_ansari_bradley, _sql_ansari_bradley())}
)


def q_gumbel_lmom(spark, sf_dir):
    """Gumbel extreme-value fit over weekly peak daily revenue per
    supplier cohort (operators/forecast.gumbel_lmom): block maxima →
    L-moment fit → 10/52/100-week return levels — the capacity
    -planning layer of the forecast family, libm-free by
    construction (every transcendental is a compile-time literal)."""
    from timeseriesutils_spark.operators.forecast import gumbel_lmom
    from timeseriesutils_spark.queries.series_queries import _daily

    d = _daily(spark, sf_dir)
    blocks = (
        d.select(
            (F.col("l_suppkey") % 10).alias("cohort"),
            (F.col("ship_day") / F.lit(7)).cast("bigint").alias("week"),
            "day_price",
        )
        .groupBy("cohort", "week")
        .agg(F.max("day_price").alias("peak"))
    )
    return gumbel_lmom(blocks, "peak", ["cohort"], scale=2)


def _sql_gumbel_lmom():
    from timeseriesutils_spark.operators.forecast import gumbel_lmom_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    blocks = f"""
SELECT cohort, week, MAX(day_price) AS peak
FROM (
  SELECT l_suppkey % 10 AS cohort,
    CAST(ship_day // 7 AS BIGINT) AS week, day_price
  FROM ({_SQL_DAILY})
) GROUP BY cohort, week
"""
    return gumbel_lmom_sql(blocks, "peak", ["cohort"], scale=2)


QUERIES.update({"gumbel_lmom": Q(q_gumbel_lmom, _sql_gumbel_lmom())})


def q_forecast_e2e(spark, sf_dir):
    """The composed reference workflow as ONE plan (operators/
    forecast_pipeline.backtest_forecast_pipeline): per-supplier daily
    revenue → lag-7 + rollmean-7 features (the reference featurize
    grammar) → 7-day-ahead target → temporal fold at day 2000 →
    per-cohort closed-form OLS on the train side → broadcast apply →
    MAE/skill vs the lag-naive baseline on the test side.  Every stage
    is individually hash-green; this gate-checks the composition."""
    from timeseriesutils_spark.operators.forecast_pipeline import (
        backtest_forecast_pipeline,
    )
    from timeseriesutils_spark.queries.series_queries import _daily

    return backtest_forecast_pipeline(
        _daily(spark, sf_dir), "day_price", "ship_day", "l_suppkey",
    )


def _sql_forecast_e2e():
    from timeseriesutils_spark.operators.forecast_pipeline import (
        backtest_forecast_pipeline_sql,
    )
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    return backtest_forecast_pipeline_sql(
        _SQL_DAILY, "day_price", "ship_day", "l_suppkey",
    )


QUERIES.update({"forecast_e2e": Q(q_forecast_e2e, _sql_forecast_e2e())})


def q_kuiper_test(spark, sf_dir):
    """Two-sample Kuiper test per ship year (operators/nonparam.
    kuiper_test): quantity under returnflag A vs R — ks_test's
    tail-balanced sibling (V = D+ + D-), same exact integer ECDF-gap
    machinery with the signed gap kept in both directions."""
    from timeseriesutils_spark.operators.nonparam import kuiper_test

    return kuiper_test(
        _year_rf_qty(spark, sf_dir), "l_quantity", "l_returnflag",
        "A", "R", ["ship_year"], scale=2,
    )


def _sql_kuiper_test():
    from timeseriesutils_spark.operators.nonparam import kuiper_test_sql

    return kuiper_test_sql(
        _SQL_YEAR_RF_QTY, "l_quantity", "l_returnflag", "A", "R",
        ["ship_year"], scale=2,
    )


QUERIES.update({"kuiper_test": Q(q_kuiper_test, _sql_kuiper_test())})


def q_cucconi_test(spark, sf_dir):
    """Cucconi joint location–scale test per ship year (operators/
    nonparam.cucconi_test): the one-shot 'did it move OR widen' screen
    from squared midranks taken from both ends — mann_whitney ⊕
    ansari_bradley in a single exponential-null statistic, on the same
    two-arm frame."""
    from timeseriesutils_spark.operators.nonparam import cucconi_test

    return cucconi_test(
        _year_rf_qty(spark, sf_dir), "l_quantity", "l_returnflag",
        "A", "R", ["ship_year"], scale=2,
    )


def _sql_cucconi_test():
    from timeseriesutils_spark.operators.nonparam import cucconi_test_sql

    return cucconi_test_sql(
        _SQL_YEAR_RF_QTY, "l_quantity", "l_returnflag", "A", "R",
        ["ship_year"], scale=2,
    )


QUERIES.update({"cucconi_test": Q(q_cucconi_test, _sql_cucconi_test())})


def q_lepage_test(spark, sf_dir):
    """Lepage joint location–scale test per ship year (operators/
    nonparam.lepage_test): z_W² + z_AB² from ONE doubled-midrank pass
    (the Wilcoxon tie term collapses to a row-level Σ(t²−1)) — the
    classical companion to cucconi_test on the same two-arm frame."""
    from timeseriesutils_spark.operators.nonparam import lepage_test

    return lepage_test(
        _year_rf_qty(spark, sf_dir), "l_quantity", "l_returnflag",
        "A", "R", ["ship_year"], scale=2,
    )


def _sql_lepage_test():
    from timeseriesutils_spark.operators.nonparam import lepage_test_sql

    return lepage_test_sql(
        _SQL_YEAR_RF_QTY, "l_quantity", "l_returnflag", "A", "R",
        ["ship_year"], scale=2,
    )


QUERIES.update({"lepage_test": Q(q_lepage_test, _sql_lepage_test())})


_TOST_MARGIN = 0.5


def q_tost_equivalence(spark, sf_dir):
    """TOST equivalence screen per ship year (operators/stats.
    tost_equivalence): are A-flag and R-flag mean quantities equivalent
    within ±0.5 units?  The release-gate question a non-significant
    welch_ttest cannot answer — two one-sided Welch z tests, logistic
    tails, 1e-9-quantized p."""
    from timeseriesutils_spark.operators.stats import tost_equivalence

    return tost_equivalence(
        _year_rf_qty(spark, sf_dir), "l_quantity", "l_returnflag",
        "A", "R", ["ship_year"], margin=_TOST_MARGIN, scale=2,
    )


def _sql_tost_equivalence():
    from timeseriesutils_spark.operators.stats import tost_equivalence_sql

    return tost_equivalence_sql(
        _SQL_YEAR_RF_QTY, "l_quantity", "l_returnflag", "A", "R",
        ["ship_year"], margin=_TOST_MARGIN, scale=2,
    )


QUERIES.update(
    {"tost_equivalence": Q(q_tost_equivalence, _sql_tost_equivalence())}
)


def q_fleiss_kappa(spark, sf_dir):
    """Fleiss' kappa over 4-line orders (operators/stats.fleiss_kappa):
    an order's four line items as four 'raters' assigning the order a
    returnflag category, per order cohort — do lines of one order agree
    on disposition beyond chance?  The multi-rater member of the
    agreement family (cohens_kappa / icc_oneway / cronbach_alpha);
    exact integer ratios end to end, no quantization."""
    from timeseriesutils_spark.operators.stats import fleiss_kappa

    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        (F.col("l_orderkey") % 4).cast("bigint").alias("cohort"),
        F.col("l_orderkey").alias("okey"),
        F.col("l_returnflag").alias("flag"),
    )
    return fleiss_kappa(d, "okey", "flag", 4, ["cohort"])


def _sql_fleiss_kappa():
    from timeseriesutils_spark.operators.stats import fleiss_kappa_sql

    d = (
        "SELECT CAST(l_orderkey % 4 AS BIGINT) AS cohort,"
        " l_orderkey AS okey, l_returnflag AS flag FROM lineitem"
    )
    return fleiss_kappa_sql(d, "okey", "flag", 4, ["cohort"])


QUERIES.update({"fleiss_kappa": Q(q_fleiss_kappa, _sql_fleiss_kappa())})


def q_distance_corr(spark, sf_dir):
    """Distance correlation (operators/distcorr.distance_correlation)
    between monthly shipment volume and revenue per supplier — the
    independence-characterizing dependence measure (Székely 2007) that
    sees the nonlinear relationships pearson/spearman/kendall miss;
    exact integer double-centering over the kendall-'pairs'
    dimension-sized envelope."""
    from timeseriesutils_spark.operators.distcorr import distance_correlation

    return distance_correlation(
        _monthly_vol_rev(spark, sf_dir), "n_ship", "rev", ["l_suppkey"],
        scale=2,
    )


def _sql_distance_corr():
    from timeseriesutils_spark.operators.distcorr import (
        distance_correlation_sql,
    )

    return distance_correlation_sql(
        f"({_SQL_MONTHLY_VOL_REV})", "n_ship", "rev", ["l_suppkey"], scale=2
    )


QUERIES.update({"distance_corr": Q(q_distance_corr, _sql_distance_corr())})


def q_granger_causality(spark, sf_dir):
    """Granger causality F-test (operators/granger.granger_causality):
    does monthly shipment volume improve next-month revenue prediction
    beyond revenue's own past, per supplier — the nested-model test
    behind the granger_lag correlation screen; RSS via the
    Schur-complement determinant identity over exact moments, both
    engines evaluating one generated determinant expansion."""
    from timeseriesutils_spark.operators.granger import granger_causality

    return granger_causality(
        _monthly_vol_rev(spark, sf_dir), "rev", "n_ship", ["l_suppkey"],
        ["mth"], scale=2,
    )


def _sql_granger_causality():
    from timeseriesutils_spark.operators.granger import granger_causality_sql

    return granger_causality_sql(
        f"({_SQL_MONTHLY_VOL_REV})", "rev", "n_ship", ["l_suppkey"],
        ["mth"], scale=2,
    )


QUERIES.update(
    {"granger_causality": Q(q_granger_causality, _sql_granger_causality())}
)


_HIER_SQL = """
SELECT o_totalprice AS val, o_orderdate AS od, n_name, r_name
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


def q_reconcile_forecasts(spark, sf_dir):
    """Hierarchical forecast reconciliation (operators/reconcile.
    reconcile_forecasts): per-nation median base forecasts of daily
    order revenue over the trailing 28 days, made coherent across the
    nation -> region -> total hierarchy two ways — bottom-up and the
    closed-form OLS projection S(S'S)^-1 S' via block Sherman–Morrison
    (per-group aggregates + broadcasts, no matrix library).  The
    reference's own domain (reichlab hubs) is location-hierarchical;
    this is the coherence layer its forecasts assume."""
    from timeseriesutils_spark.operators.reconcile import reconcile_forecasts

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("o_totalprice").alias("val"),
            F.col("o_orderdate").alias("od"),
            "n_name", "r_name",
        )
    )
    return reconcile_forecasts(
        joined, "val", "od", "n_name", "r_name", window_days=28, scale=2
    )


def _sql_reconcile_forecasts():
    from timeseriesutils_spark.operators.reconcile import (
        reconcile_forecasts_sql,
    )

    return reconcile_forecasts_sql(
        f"({_HIER_SQL})", "val", "od", "n_name", "r_name",
        window_days=28, scale=2,
    )


QUERIES.update(
    {"reconcile_forecasts": Q(q_reconcile_forecasts, _sql_reconcile_forecasts())}
)


_ETS_PARAMS = dict(
    window_size=14, season=7, alpha=0.3, beta=0.1, phi=0.9, gamma=0.2,
    scale=2, min_obs=8,
)


def q_ets_select(spark, sf_dir):
    """Automatic forecast-model selection by AICc per supplier series
    (operators/ets.ets_select, Hyndman & Khandakar 2008 / FPP3 §7.5):
    eight candidate one-step structures (naive, seasonal-naive, drift,
    mean, SES, Holt, damped Holt, additive Holt–Winters — all
    truncated-linear-filter expressions over ONE window chain) scored
    in-sample by exact-integer SSE, penalized by AICc, per-group argmin
    with a total tiebreak.  The "which model do I run?" step the
    smoothing family was missing: one exchange + one aggregation, no
    joins, 100 TB-safe."""
    from timeseriesutils_spark.operators.ets import ets_select
    from timeseriesutils_spark.queries.series_queries import _daily

    return ets_select(
        _daily(spark, sf_dir), "day_price", ["l_suppkey"], ["ship_day"],
        **_ETS_PARAMS,
    )


def _sql_ets_select():
    from timeseriesutils_spark.operators.ets import ets_select_sql
    from timeseriesutils_spark.queries.series_queries import _SQL_DAILY

    return ets_select_sql(
        _SQL_DAILY, "day_price", ["l_suppkey"], ["ship_day"], **_ETS_PARAMS
    )


QUERIES.update({"ets_select": Q(q_ets_select, _sql_ets_select())})
