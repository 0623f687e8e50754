"""Capability-parity relational queries (SURVEY §2.2): scans, joins
(broadcast / semi / anti / as-of), aggregations (incl. rollup, cube,
distinct), ranking + frame windows, top-k, set ops, scalar/date/JSON
functions.

Determinism rules used throughout (see functions/exact.py):
  * double sums/averages go through exact DECIMAL accumulation;
  * every window/sort order is total (unique key tie-breaks);
  * timestamps never appear in outputs (converted to strings or dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import davg, davg_sql, dsum, dsum_sql
from timeseriesutils_spark.operators.relational import (
    asof_join,
    dedup_exact,
    interval_join,
    top_k_per_group,
)
from timeseriesutils_spark.queries import Q
from timeseriesutils_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --- aggregation ----------------------------------------------------------


def q_agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: filtered scan → grouped sums/avgs/count."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, scale=8).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=8).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_SQL_PRICING = f"""
SELECT l_returnflag, l_linestatus,
  {dsum_sql('l_quantity')} AS sum_qty,
  {dsum_sql('l_extendedprice')} AS sum_base_price,
  {dsum_sql('l_extendedprice * (1 - l_discount)', scale=8)} AS sum_disc_price,
  {davg_sql('l_quantity')} AS avg_qty,
  {davg_sql('l_extendedprice')} AS avg_price,
  {davg_sql('l_discount', scale=8)} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_rollup(spark, sf_dir):
    """Hierarchical totals region → nation → (all) via ROLLUP."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    n, r = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_orders",
            "revenue",
        )
    )


_SQL_ROLLUP = f"""
SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
  COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_agg_cube(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all 2^2 grouping combinations in one pass, exact decimal sums."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


_SQL_CUBE = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, COALESCE(l_linestatus, 'ALL') AS linestatus,
  COUNT(*) AS n, {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_agg_count_distinct(spark, sf_dir):
    """Exact per-group COUNT(DISTINCT) on two columns (one Expand pass)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


_SQL_COUNT_DISTINCT = """
SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers
FROM customer GROUP BY c_mktsegment
"""


def q_agg_approx_distinct(spark, sf_dir):
    """HLL++ sketch — algorithm-specific results, no cross-engine oracle
    (driver rows-only).  The scalable distinct-count at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )


# --- joins ----------------------------------------------------------------


def q_join_star(spark, sf_dir):
    """Fact-dims star join: broadcast every dim; revenue per region/nation."""
    li = _t(spark, sf_dir, "lineitem")
    s, n, r = (_t(spark, sf_dir, t) for t in ("supplier", "nation", "region"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue, scale=8).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


_SQL_JOIN_STAR = f"""
SELECT r_name, n_name, {dsum_sql('l_extendedprice * (1 - l_discount)', scale=8)} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_join_semi(spark, sf_dir):
    """Customers with at least one high-value order (left semi)."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_SQL_JOIN_SEMI = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


def q_join_anti(spark, sf_dir):
    """Customers with no 1995 order (left anti with a pushed-down filter
    on the right side — nontrivial result at every SF)."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    o95 = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    return c.join(o95, c.c_custkey == o95.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_SQL_JOIN_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1995-01-01'
                  AND o_orderdate < TIMESTAMP '1996-01-01')
"""


def q_asof_join(spark, sf_dir):
    """Time-series as-of join: for each purchase event, the most recent
    click (ts ≤ purchase ts) by the same user.  Union + last-value plan —
    no range-join explosion (operators/relational.py)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="click_ts",
        right_values=["click_id"],
        tie_break="click_id",
    )
    return out.select("user_id", "event_id", "value", "click_id")


_SQL_ASOF = """
SELECT e.user_id, e.event_id, e.value,
  (SELECT c.event_id FROM events c
     WHERE c.event_type = 'click' AND c.user_id = e.user_id AND c.ts <= e.ts
     ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id
FROM events e WHERE e.event_type = 'purchase'
"""


def q_merge_upsert(spark, sf_dir):
    """Batch MERGE semantics (operators/relational.merge_upsert): apply a
    change batch (updates + inserts + deletes) to a customer snapshot --
    one full-outer join + COALESCE, the engine's MERGE INTO."""
    from timeseriesutils_spark.operators.relational import merge_upsert

    c = _t(spark, sf_dir, "customer")
    base = c.filter(F.col("c_custkey") < 1000).select("c_custkey", "c_name", "c_acctbal")
    upd = c.filter(F.col("c_custkey").between(500, 1499)).select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("*")).alias("c_name"),
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        (F.col("c_custkey") % 10 == 0).alias("is_delete"),
    )
    return merge_upsert(base, upd, "c_custkey", delete_col="is_delete")


_SQL_MERGE_UPSERT = """
WITH base AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey < 1000
), upd AS (
  SELECT c_custkey, c_name || '*' AS c_name, c_acctbal + 100.0 AS c_acctbal,
         c_custkey % 10 = 0 AS is_delete
  FROM customer WHERE c_custkey BETWEEN 500 AND 1499
)
SELECT COALESCE(b.c_custkey, u.c_custkey) AS c_custkey,
  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE b.c_name END AS c_name,
  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE b.c_acctbal END AS c_acctbal
FROM base b FULL JOIN upd u ON b.c_custkey = u.c_custkey
WHERE NOT COALESCE(u.is_delete, FALSE)
"""


def q_asof_forward_tol(spark, sf_dir):
    """Forward as-of with staleness bound: for each click, the NEXT
    purchase by the same user within 10 minutes (direction='forward',
    tolerance_ms) -- merge_asof parity on the same union+last-value plan."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        left_time="ts",
        right_time="p_ts",
        right_values=["purchase_id"],
        tie_break="purchase_id",
        direction="forward",
        tolerance_ms=600_000,
    )
    return out.select("user_id", "event_id", "purchase_id")


_SQL_ASOF_FWD = """
SELECT c.user_id, c.event_id,
  (SELECT p.event_id FROM events p
     WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
       AND p.ts >= c.ts AND epoch_ms(p.ts) - epoch_ms(c.ts) <= 600000
     ORDER BY p.ts ASC, p.event_id DESC LIMIT 1) AS purchase_id
FROM events c WHERE c.event_type = 'click'
"""


# --- windows / ranking / top-k / sort ------------------------------------


def q_window_rank(spark, sf_dir):
    """Ranking trio + running exact sum, two window specs in one pass."""
    o = _t(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_time = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w_price).alias("rn"),
        F.rank().over(w_price).alias("rk"),
        F.dense_rank().over(w_price).alias("drk"),
        F.ntile(4).over(w_price).alias("quartile"),
        F.percent_rank().over(w_price).alias("pct_rk"),
        F.cume_dist().over(w_price).alias("cume"),
        F.first("o_orderkey").over(w_time).alias("first_order"),
        F.last("o_orderkey").over(w_time).alias("latest_order"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).over(w_time).cast("double").alias("running_spend"),
    )


_SQL_WINDOW_RANK = """
SELECT o_custkey, o_orderkey, o_totalprice,
  ROW_NUMBER() OVER wp AS rn, RANK() OVER wp AS rk, DENSE_RANK() OVER wp AS drk,
  CAST(NTILE(4) OVER wp AS INT) AS quartile,
  PERCENT_RANK() OVER wp AS pct_rk, CUME_DIST() OVER wp AS cume,
  FIRST_VALUE(o_orderkey) OVER wt AS first_order,
  LAST_VALUE(o_orderkey) OVER wt AS latest_order,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER wt AS DOUBLE) AS running_spend
FROM orders
WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
       wt AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_topk_per_group(spark, sf_dir):
    """Top-3 rows per group by value with a total-order tie-break (operators/relational.topk_per_group)."""
    o = _t(spark, sf_dir, "orders")
    return top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        "o_custkey",
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    )


_SQL_TOPK = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
  FROM orders) WHERE rn <= 3
"""


def q_sort_limit(spark, sf_dir):
    """Global ORDER BY + LIMIT 100 (TakeOrderedAndProject, no full sort at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


_SQL_SORT_LIMIT = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
"""


def q_dedup_keep_first(spark, sf_dir):
    """Deterministic relational dedup: one event per (user, type), keeping
    the earliest (ts, event_id) — dropDuplicates would be partitioning-
    dependent; this is reproducible (operators/relational.dedup_exact)."""
    ev = _t(spark, sf_dir, "events")
    out = dedup_exact(
        ev.select("user_id", "event_type", "ts", "event_id", "value"),
        ["user_id", "event_type"],
        tie_break=[F.col("ts"), F.col("event_id")],
    )
    return out.select("user_id", "event_type", "event_id", "value")


_SQL_DEDUP_FIRST = """
SELECT user_id, event_type, event_id, value FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
"""


# --- set ops --------------------------------------------------------------


def q_set_ops(spark, sf_dir):
    """UNION / INTERSECT / EXCEPT over customer vs supplier nation sets,
    tagged into one result."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return (
        c.union(s).distinct().select(F.lit("union").alias("op"), "nationkey")
        .unionByName(c.intersect(s).select(F.lit("intersect").alias("op"), "nationkey"))
        .unionByName(c.exceptAll(s).select(F.lit("except").alias("op"), "nationkey"))
    )


_SQL_SET_OPS = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
UNION ALL
SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
UNION ALL
SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
"""


# --- scalar / date / JSON functions --------------------------------------


def q_scalar_funcs(spark, sf_dir):
    """Scalar string/date/math function battery over lineitem (engine-portable function subset)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 8)).alias("prio_prefix"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").alias("prio_len"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        # NOT F.round: Spark rounds the shortest string repr, DuckDB the
        # binary value — they disagree exactly when the product has a short
        # decimal form.  Raw multiply is bit-identical.
        (F.col("o_totalprice") * 0.1).alias("tithe"),
        F.abs(F.col("o_totalprice") - 200000.0).alias("dist_200k"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("price_band"),
    )


_SQL_SCALAR = """
SELECT o_orderkey,
  UPPER(SUBSTRING(o_orderpriority, 1, 8)) AS prio_prefix,
  CONCAT_WS('-', o_orderstatus, o_orderpriority) AS status_prio,
  CAST(LENGTH(o_orderpriority) AS INT) AS prio_len,
  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
  CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS o_month,
  CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS o_day,
  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS o_quarter,
  o_totalprice * 0.1 AS tithe,
  ABS(o_totalprice - 200000.0) AS dist_200k,
  CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_band
FROM orders
"""


def q_pivot_wide(spark, sf_dir):
    """groupBy().pivot(): revenue per nation, one column per return flag.
    Explicit pivot values → no extra distinct-scan job, stable schema."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", "l_returnflag", "l_extendedprice")
    )
    return (
        joined.groupBy("n_name")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(dsum("l_extendedprice"))
        .select(
            "n_name",
            F.col("A").alias("rev_A"),
            F.col("N").alias("rev_N"),
            F.col("R").alias("rev_R"),
        )
    )


_SQL_PIVOT = f"""
SELECT n_name,
  {dsum_sql("CASE WHEN l_returnflag = 'A' THEN l_extendedprice END")} AS rev_A,
  {dsum_sql("CASE WHEN l_returnflag = 'N' THEN l_extendedprice END")} AS rev_N,
  {dsum_sql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice END")} AS rev_R
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q_agg_quantiles(spark, sf_dir):
    """Grouped exact percentiles (interpolating, percentile_cont
    semantics) + the approx_percentile sketch for the at-scale path.
    Exact interpolation is the same IEEE formula in Spark and DuckDB
    (quantile_cont) → oracle-checkable; the sketch column is excluded
    from the output for that reason (declared separately rows-only via
    agg_approx_distinct's pattern if needed)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("med_price"),
    )


# Spark's percentile() interpolates base + frac*(nxt-base)
# (Percentile.scala), which differs from DuckDB quantile_cont's
# base*(1-frac) + nxt*frac in the last ulp for some inputs — render
# Spark's exact form from sorted lists instead of calling quantile_cont.
def _duck_pct(col: str, q: float) -> str:
    arr = f"list_sort(list({col}))"
    n = f"len({arr})"
    h = f"(({n} - 1) * {q!r})"
    lo = f"CAST(FLOOR({h}) AS INT)"
    base = f"{arr}[{lo} + 1]"
    nxt = f"{arr}[LEAST({lo} + 2, {n})]"
    return f"({base} + ({h} - {lo}) * ({nxt} - {base}))"


_SQL_QUANTILES = f"""
SELECT l_returnflag,
  {_duck_pct('l_quantity', 0.5)} AS med_qty,
  {_duck_pct('l_quantity', 0.9)} AS p90_qty,
  {_duck_pct('l_extendedprice', 0.5)} AS med_price
FROM lineitem GROUP BY l_returnflag
"""


def q_unpivot_long(spark, sf_dir):
    """unpivot/melt — wide measure columns to long (metric, value) rows;
    the inverse of pivot_wide and the standard tidy-data reshape."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "value",
    )


_SQL_UNPIVOT = """
SELECT l_orderkey, l_linenumber, metric, value FROM (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount FROM lineitem
) UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount))
"""


def q_agg_quantiles_approx(spark, sf_dir):
    """approx_percentile (Greenwald-Khanna sketch) — the mergeable
    at-scale quantile path; algorithm-specific values → rows-only.
    Sketch outputs unpacked to scalar columns (array cells break the
    driver's canonicalizer even on rows-only checks)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("pcts")
        )
        .select(
            "l_returnflag",
            F.element_at("pcts", 1).alias("p50"),
            F.element_at("pcts", 2).alias("p90"),
            F.element_at("pcts", 3).alias("p99"),
        )
    )


def q_array_funcs(spark, sf_dir):
    """Array/lambda builtins over the embedding column: size, slice,
    element access, transform, higher-order aggregate (quantized-int64
    sum — the deterministic float-fold), array_max.  The slice/transform
    output is serialized to a string of quantized int64s — the driver's
    canonicalizer cannot sort array cells, and quantized ints (unlike
    double→string formatting) are cross-engine stable."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    l1q = (
        F.aggregate(
            F.transform(v, lambda x: F.floor(F.abs(x.cast("double")) * 1e14 + 0.5)),
            F.lit(0).cast("bigint"),
            lambda acc, p: acc + p,
        ).cast("double")
        / 1e14
    )
    head3 = F.concat_ws(
        ",",
        F.transform(
            F.slice(v, 1, 3),
            lambda x: F.floor(x.cast("double") * 1e14 + F.lit(0.5)).cast("bigint").cast("string"),
        ),
    )
    return e.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.element_at(v, 1).cast("double").alias("first_val"),
        F.element_at(v, -1).cast("double").alias("last_val"),
        head3.alias("head3"),
        l1q.alias("l1_norm"),
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))).alias("max_abs"),
    )


_SQL_ARRAY_FUNCS = """
SELECT vec_id,
  CAST(len(embedding) AS INT) AS dim,
  CAST(embedding[1] AS DOUBLE) AS first_val,
  CAST(embedding[-1] AS DOUBLE) AS last_val,
  array_to_string([CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1e14 + 0.5) AS BIGINT) AS VARCHAR) FOR x IN embedding[1:3]], ',') AS head3,
  CAST(list_sum([CAST(FLOOR(ABS(CAST(x AS DOUBLE)) * 1e14 + 0.5) AS BIGINT) FOR x IN embedding]) AS DOUBLE) / 1e14 AS l1_norm,
  list_max([ABS(CAST(x AS DOUBLE)) FOR x IN embedding]) AS max_abs
FROM embeddings
"""


def q_json_extract(spark, sf_dir):
    """JSON access on events.props + aggregation by extracted field."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )


_SQL_JSON = f"""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
  COUNT(*) AS n, {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1
"""


def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — the general form of rollup/cube: totals
    by (flag, status), by flag alone, and grand total, in one pass."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("sum_price"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_price",
        )
    )


_SQL_GROUPING_SETS = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, COALESCE(l_linestatus, 'ALL') AS linestatus,
  COUNT(*) AS n, {dsum_sql('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q_range_frame(spark, sf_dir):
    """RANGE-framed window (value-based, not row-based): per supplier, the
    trailing-7-calendar-day shipment revenue — rows on the same day share
    one frame, gaps shrink it; a ROWS frame can't express this."""
    li = _t(spark, sf_dir, "lineitem")
    day = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.col("_day"))
        .rangeBetween(-6, Window.currentRow)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            day.alias("_day"),
            F.col("l_extendedprice"),
        )
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.col("_day").alias("ship_day"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
            .over(w)
            .cast("double")
            .alias("rev_7d"),
            F.count(F.lit(1)).over(w).alias("n_7d"),
        )
    )


_SQL_RANGE_FRAME = """
WITH base AS (
  SELECT l_suppkey, l_orderkey, l_linenumber,
    datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS ship_day,
    l_extendedprice
  FROM lineitem
)
SELECT l_suppkey, l_orderkey, l_linenumber, CAST(ship_day AS INT) AS ship_day,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS rev_7d,
  COUNT(*) OVER w AS n_7d
FROM base
WINDOW w AS (PARTITION BY l_suppkey ORDER BY ship_day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_range_join(spark, sf_dir):
    """Keyed interval join via time binning (operators/relational.py
    interval_join): clicks attributed to a same-user purchase within the
    preceding hour.  No BroadcastNestedLoopJoin — candidate pairs come
    from an equi-join on (user, hour-bin)."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # UTC session tz
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (us - 3_600_000_000).alias("_start"),
        us.alias("_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("value").alias("click_value"), us.alias("_t")
    )
    pairs = interval_join(
        purchases, clicks, "_start", "_end", "_t", on="user_id", bucket=3_600_000_000
    )
    return pairs.groupBy("user_id", "purchase_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        dsum("click_value", scale=8).alias("click_value"),
    )


_SQL_RANGE_JOIN = f"""
SELECT p.user_id, p.event_id AS purchase_id, COUNT(*) AS n_clicks,
  {dsum_sql('c.value', scale=8)} AS click_value
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
 AND epoch_us(c.ts) < epoch_us(p.ts)
GROUP BY 1, 2
"""


QUERIES = {
    "agg_pricing_summary": Q(q_agg_pricing_summary, _SQL_PRICING),
    "agg_rollup": Q(q_agg_rollup, _SQL_ROLLUP),
    "agg_cube": Q(q_agg_cube, _SQL_CUBE),
    "agg_count_distinct": Q(q_agg_count_distinct, _SQL_COUNT_DISTINCT),
    "agg_approx_distinct": Q(q_agg_approx_distinct, None),  # sketch → rows-only
    "join_star": Q(q_join_star, _SQL_JOIN_STAR),
    "join_semi": Q(q_join_semi, _SQL_JOIN_SEMI),
    "join_anti": Q(q_join_anti, _SQL_JOIN_ANTI),
    "asof_join": Q(q_asof_join, _SQL_ASOF),
    "asof_forward_tol": Q(q_asof_forward_tol, _SQL_ASOF_FWD),
    "merge_upsert": Q(q_merge_upsert, _SQL_MERGE_UPSERT),
    "window_rank": Q(q_window_rank, _SQL_WINDOW_RANK),
    "topk_per_group": Q(q_topk_per_group, _SQL_TOPK),
    "sort_limit": Q(q_sort_limit, _SQL_SORT_LIMIT),
    "dedup_keep_first": Q(q_dedup_keep_first, _SQL_DEDUP_FIRST),
    "set_ops": Q(q_set_ops, _SQL_SET_OPS),
    "scalar_funcs": Q(q_scalar_funcs, _SQL_SCALAR),
    "json_extract": Q(q_json_extract, _SQL_JSON),
    "array_funcs": Q(q_array_funcs, _SQL_ARRAY_FUNCS),
    "pivot_wide": Q(q_pivot_wide, _SQL_PIVOT),
    "unpivot_long": Q(q_unpivot_long, _SQL_UNPIVOT),
    "agg_quantiles": Q(q_agg_quantiles, _SQL_QUANTILES),
    "agg_quantiles_approx": Q(q_agg_quantiles_approx, None),  # sketch → rows-only
    "grouping_sets": Q(q_grouping_sets, _SQL_GROUPING_SETS),
    "range_frame": Q(q_range_frame, _SQL_RANGE_FRAME),
    "range_join": Q(q_range_join, _SQL_RANGE_JOIN),
}


def q_skew_salted_agg(spark, sf_dir):
    """Two-stage salted aggregation (functions/skew.salted_agg) over the
    order-status hot keys: exact decimal sums sharded across 16 salts
    then merged — bit-identical to the plain GROUP BY, which is exactly
    what the oracle asserts (the skew-mitigation contract IS result
    equality)."""
    from timeseriesutils_spark.functions.exact import dsum
    from timeseriesutils_spark.functions.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {"s": dsum("l_extendedprice"), "n": F.count(F.lit(1))},
        {"s": dsum("s", scale=6), "n": F.sum("n")},
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("s").cast("double").alias("sum_price"),
        F.col("n").cast("bigint").alias("n_rows"),
    )


_SQL_SKEW_SALTED_AGG = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
  COUNT(*) AS n_rows
FROM lineitem GROUP BY 1, 2
"""


def q_skew_salted_join(spark, sf_dir):
    """Salted broadcast join (functions/skew.salted_broadcast_join):
    supplier dim replicated across 16 salts so a hot suppkey shards into
    bounded (key, salt) cells; results must equal the plain join — the
    oracle runs the plain join."""
    from timeseriesutils_spark.functions.skew import salted_broadcast_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_suppkey", "s_suppkey"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    j = salted_broadcast_join(li, sup, "s_suppkey", n_salts=16)
    return j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sum_qty"),
    )


_SQL_SKEW_SALTED_JOIN = """
SELECT s_nationkey, COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1
"""


QUERIES.update(
    {
        "skew_salted_agg": Q(q_skew_salted_agg, _SQL_SKEW_SALTED_AGG),
        "skew_salted_join": Q(q_skew_salted_join, _SQL_SKEW_SALTED_JOIN),
    }
)


def q_zorder_key(spark, sf_dir):
    """Morton (Z-order) clustering key over (l_partkey, l_suppkey)
    (operators/layout.zorder_key): the multi-dimensional data-skipping
    layout primitive — pure integer bit interleaving, identical in both
    engines; the write path + parquet-stats pruning claim are pinned in
    tests/test_layout.py."""
    from timeseriesutils_spark.operators.layout import zorder_key

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zorder_key("l_partkey", "l_suppkey").alias("zkey"),
    )


def _sql_zorder_key():
    from timeseriesutils_spark.operators.layout import zorder_key_sql

    return (
        "SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,\n  "
        f"{zorder_key_sql('l_partkey', 'l_suppkey')} AS zkey\nFROM lineitem"
    )


QUERIES.update({"zorder_key": Q(q_zorder_key, _sql_zorder_key())})


def q_variant_json(spark, sf_dir):
    """Semi-structured access through Spark 4's VARIANT type: props is
    parsed ONCE into the binary variant encoding (parse_json) and every
    field access is a typed try_variant_get — at scale this replaces
    re-tokenizing the JSON string per extraction (the get_json_object
    path exercised by `json_extract`); same rows, so the DuckDB JSON
    oracle checks the whole codepath."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props").alias("v")
    k = F.try_variant_get(F.col("v"), "$.k", "bigint")
    return (
        ev.select(v, "value", "event_type")
        .select(k.alias("k"), "value", "event_type")
        .groupBy("event_type", (F.col("k") % 7).alias("k_mod7"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            dsum("value").alias("sum_value"),
        )
    )


_SQL_VARIANT_JSON = f"""
SELECT event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod7,
  COUNT(*) AS n,
  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


QUERIES.update({"variant_json": Q(q_variant_json, _SQL_VARIANT_JSON)})


def q_compaction_plan(spark, sf_dir):
    """Small-files compaction planner (operators/layout.compaction_plan):
    simulate a file inventory (one 'file' per ship-month x returnflag x
    linestatus ingestion partition with its row count), then assign
    adjacent files to ~25k-row output bins by start-offset binning --
    the metadata-sized window pass that drives a rewrite; adjacency
    preserves the sort-key clustering that pruning depends on."""
    from timeseriesutils_spark.operators.layout import compaction_plan

    li = load_table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        # string month key: date dtypes canonicalize differently across
        # engines (driver hashes date-as-int vs date-as-str); VARCHAR is stable
        F.date_trunc("month", F.col("l_shipdate")).cast("date").cast("string").alias("ship_month"),
        "l_returnflag",
        "l_linestatus",
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    return compaction_plan(
        files,
        rows_col="n_rows",
        order_cols=("ship_month", "l_returnflag", "l_linestatus"),
        target_rows=25_000,
    )


def _sql_compaction_plan():
    from timeseriesutils_spark.operators.layout import compaction_plan_sql

    inner = """
  SELECT CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS VARCHAR) AS ship_month,
    l_returnflag, l_linestatus, COUNT(*) AS n_rows
  FROM lineitem GROUP BY 1, 2, 3
"""
    return compaction_plan_sql(
        inner,
        rows_col="n_rows",
        order_cols=("ship_month", "l_returnflag", "l_linestatus"),
        target_rows=25_000,
    )


QUERIES.update({"compaction_plan": Q(q_compaction_plan, _sql_compaction_plan())})


def q_skew_report(spark, sf_dir):
    """Aggregation-key skew diagnostic (profile.key_skew_report) on the
    orders customer key: per power-of-two key-frequency bucket, distinct
    keys / total rows / worst key -- the pre-shuffle health check that
    decides salting (functions/skew.py) or AQE skew splitting."""
    from timeseriesutils_spark.operators.profile import key_skew_report

    return key_skew_report(load_table(spark, sf_dir, "orders"), ["o_custkey"])


def _sql_skew_report():
    from timeseriesutils_spark.operators.profile import key_skew_report_sql

    return key_skew_report_sql("orders", ["o_custkey"])


def q_quantile_bin(spark, sf_dir):
    """Equal-frequency feature binning (stats.quantile_bins): decile
    NTILE of the price column per returnflag over a total order, with
    per-bin counts and value ranges -- the persisted bin-edge summary a
    feature store keeps."""
    from timeseriesutils_spark.operators.stats import quantile_bins

    return quantile_bins(
        load_table(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        ["l_returnflag"],
        n_bins=10,
        order_tiebreak=["l_orderkey", "l_linenumber"],
    )


def _sql_quantile_bin():
    from timeseriesutils_spark.operators.stats import quantile_bins_sql

    return quantile_bins_sql(
        "lineitem",
        "l_extendedprice",
        ["l_returnflag"],
        n_bins=10,
        order_tiebreak=["l_orderkey", "l_linenumber"],
    )


QUERIES.update(
    {
        "skew_report": Q(q_skew_report, _sql_skew_report()),
        "quantile_bin": Q(q_quantile_bin, _sql_quantile_bin()),
    }
)


def q_temporal_join(spark, sf_dir):
    """Point-in-time dimension lookup (relational.temporal_join):
    click/view/purchase events enriched with the signup/error "regime"
    interval active at event time (SCD-2 intervals built from the
    signup+error stream per user) — the as-of-with-validity-interval
    consumption pattern of scd2_history."""
    from timeseriesutils_spark.operators.relational import temporal_join
    from timeseriesutils_spark.operators.sessions import scd2_history

    ev = _t(spark, sf_dir, "events")
    dim_src = ev.filter(F.col("event_type").isin("signup", "error"))
    dim = scd2_history(dim_src).select(
        "user_id",
        "valid_from_ms",
        "valid_to_ms",
        F.col("event_type").alias("regime_type"),
        F.col("n_events").alias("regime_events"),
    )
    fact = ev.filter(~F.col("event_type").isin("signup", "error")).select(
        "event_id",
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "event_type",
    )
    return temporal_join(dim=dim, fact=fact, key="user_id", fact_ts_ms="ts_ms")


def _sql_temporal_join():
    from timeseriesutils_spark.operators.sessions import scd2_history_sql

    dim_sql = scd2_history_sql(
        table="(SELECT * FROM events WHERE event_type IN ('signup', 'error'))"
    )
    return f"""
WITH dim AS ({dim_sql}),
fact AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type
  FROM events WHERE event_type NOT IN ('signup', 'error')
)
SELECT f.event_id, f.user_id, f.ts_ms, f.event_type,
  d.valid_from_ms AS version_from_ms,
  d.event_type AS regime_type,
  d.n_events AS regime_events
FROM fact f
LEFT JOIN dim d
  ON f.user_id = d.user_id
  AND f.ts_ms >= d.valid_from_ms
  AND (d.valid_to_ms IS NULL OR f.ts_ms < d.valid_to_ms)
"""


QUERIES.update({"temporal_join": Q(q_temporal_join, _sql_temporal_join())})
