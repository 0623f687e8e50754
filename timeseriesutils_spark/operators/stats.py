"""Grouped statistics helpers: deterministic mode, percentile
winsorization.

Scale design: ``mode_per_group`` is two map-combinable aggregations
(value-count then arg-max) — no row explosion, two light exchanges.
``winsorize`` computes per-group clip bounds from an exact sorted-array
quantile (bounded by rows-per-group — the exact tier; swap the bounds
stage for ``approx_percentile`` at monster-group scale, the clip stage
is unchanged) and broadcast-joins them back: the fact table is scanned
once and never re-shuffled.  Clipping is pure selection
(least/greatest) — no float arithmetic, so results are bit-exact in any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit, sq
from timeseriesutils_spark.operators.window_features import _as_list

__all__ = ["mode_per_group", "mode_per_group_sql", "winsorize", "winsorize_sql"]


def mode_per_group(
    df: DataFrame, group_columns, value_col: str
) -> DataFrame:
    """Most frequent value of ``value_col`` per group, ties broken by
    smallest value — the deterministic categorical summary (Spark's
    ``mode()`` and DuckDB's ``mode()`` both pick an arbitrary tied
    value; an explicit (count DESC, value ASC) rank does not).

    Output: group columns, ``mode_value``, ``mode_count``.
    """
    g = list(group_columns) if not isinstance(group_columns, str) else [group_columns]
    counts = df.groupBy(*g, value_col).agg(F.count(F.lit(1)).alias("mode_count"))
    w = Window.partitionBy(*g).orderBy(F.desc("mode_count"), F.asc(value_col))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*g, F.col(value_col).alias("mode_value"), "mode_count")
    )


def mode_per_group_sql(table: str, group_columns, value_col: str) -> str:
    """DuckDB twin of :func:`mode_per_group`."""
    g = ", ".join(group_columns)
    return f"""
WITH c AS (
  SELECT {g}, {value_col}, COUNT(*) AS mode_count
  FROM {table} GROUP BY {g}, {value_col}
), r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {g} ORDER BY mode_count DESC, {value_col} ASC) AS _rn
  FROM c
)
SELECT {g}, {value_col} AS mode_value, mode_count FROM r WHERE _rn = 1
"""


def _qcont(arr, n, q: float):
    """quantile_cont over a sorted array column — selection plus the
    SAME lerp DuckDB computes: base·(1−frac) + nxt·frac.  The
    algebraically-equal base + frac·(nxt−base) rounds differently in
    the last ulp for some inputs (seen live at sf0.1), so the exact
    form of the interpolation is part of the cross-engine contract."""
    h = (n - 1).cast("double") * F.lit(float(q))
    lo = F.floor(h).cast("int")
    frac = h - lo.cast("double")
    base = F.element_at(arr, lo + 1).cast("double")
    nxt = F.element_at(arr, F.least(lo + 2, n)).cast("double")
    return base * (F.lit(1.0) - frac) + nxt * frac


def winsorize(
    df: DataFrame,
    column: str,
    group_columns,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
) -> DataFrame:
    """Clip ``column`` to its per-group [q_lo, q_hi] exact continuous
    quantiles (winsorization — the standard outlier treatment before
    fitting).  Appends ``{c}_wins``; clip bounds are quantile_cont
    semantics, the clip itself is least/greatest selection (bit-exact).
    """
    g = list(group_columns) if not isinstance(group_columns, str) else [group_columns]
    bounds = df.groupBy(*g).agg(
        F.sort_array(F.collect_list(column)).alias("_arr"),
    )
    arr, n = F.col("_arr"), F.size("_arr")
    bounds = bounds.select(
        *g,
        F.when(n > 0, _qcont(arr, n, q_lo)).alias("_lo"),
        F.when(n > 0, _qcont(arr, n, q_hi)).alias("_hi"),
    )
    out = df.join(F.broadcast(bounds), on=g, how="left")
    clipped = F.least(F.greatest(F.col(column).cast("double"), F.col("_lo")), F.col("_hi"))
    return out.select(*df.columns, clipped.alias(f"{column}_wins"))


def winsorize_sql(
    table: str,
    column: str,
    group_columns,
    select_cols: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
) -> str:
    """DuckDB twin of :func:`winsorize`; ``select_cols`` = the
    passthrough projection (must match the Spark frame's columns)."""
    g = ", ".join(group_columns)
    return f"""
WITH b AS (
  SELECT {g},
    quantile_cont({column}, {q_lo}) AS _lo,
    quantile_cont({column}, {q_hi}) AS _hi
  FROM {table} GROUP BY {g}
)
SELECT {select_cols},
  LEAST(GREATEST(CAST(t.{column} AS DOUBLE), b._lo), b._hi) AS {column}_wins
FROM {table} t LEFT JOIN b USING ({g})
"""


def _qcont_sql(arr: str, n: str, q: float) -> str:
    """DuckDB rendering of :func:`_qcont` (same lerp form).  The q
    literal carries an exponent suffix so DuckDB parses it as DOUBLE —
    a bare decimal literal would do DECIMAL arithmetic (exact) where
    Spark multiplies doubles, diverging at non-dyadic q like 0.9."""
    h = f"(({n} - 1) * {dlit(q)})"
    lo = f"CAST(FLOOR({h}) AS INT)"
    frac = f"({h} - {lo})"
    base = f"CAST({arr}[{lo} + 1] AS DOUBLE)"
    nxt = f"CAST({arr}[LEAST({lo} + 2, {n})] AS DOUBLE)"
    return f"({base} * (1.0 - {frac}) + {nxt} * {frac})"


def bucket_percentiles(
    df: DataFrame,
    value_col: str,
    bucket_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_columns=(),
) -> DataFrame:
    """Percentile bands per bucket — the P50/P90/P99-latency-per-hour
    shape of observability rollups.  One row per (group, bucket) with a
    ``p{q}`` column per requested quantile, all from ONE sorted array
    per bucket (not one aggregation per percentile).

    Exact-tier: per-bucket ``sort_array(collect_list)`` bounded by
    rows-per-bucket; at monster buckets swap for ``approx_percentile``
    (t-digest, mergeable) — the output contract is unchanged.  The
    interpolation is the engine-pinned lerp of :func:`_qcont`.
    """
    g = list(group_columns)
    agg = df.groupBy(*g, bucket_col).agg(
        F.sort_array(F.collect_list(value_col)).alias("_arr")
    )
    arr, n = F.col("_arr"), F.size("_arr")
    cols = [
        F.when(n > 0, _qcont(arr, n, q)).alias(f"p{int(q * 100)}") for q in qs
    ]
    return agg.select(*g, bucket_col, n.alias("n"), *cols)


def bucket_percentiles_sql(
    table: str,
    value_col: str,
    bucket_expr: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_columns=(),
) -> str:
    """DuckDB twin of :func:`bucket_percentiles`; ``bucket_expr`` is
    ``expr AS name`` for the bucket column."""
    g = ", ".join(group_columns)
    gsel = f"{g}, " if g else ""
    bucket_name = bucket_expr.split(" AS ")[-1].strip()
    arr, n = "_arr", "len(_arr)"
    cols = ",\n  ".join(
        f"CASE WHEN {n} > 0 THEN {_qcont_sql(arr, n, q)} END AS p{int(q * 100)}"
        for q in qs
    )
    return f"""
WITH b AS (
  SELECT {gsel}{bucket_expr}, list_sort(list({value_col})) AS _arr
  FROM {table} GROUP BY {gsel.rstrip(', ') + ', ' if g else ''}{bucket_name}
)
SELECT {gsel}{bucket_name}, CAST({n} AS BIGINT) AS n,
  {cols}
FROM b
"""


def mad_outliers(
    df: DataFrame,
    column: str,
    group_columns,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outlier score per row: |x − median| / (1.4826·MAD) — the
    median-absolute-deviation z-score, immune to the outliers it hunts
    (unlike mean/std control charts, whose own statistics the outliers
    inflate).  Appends ``{c}_robust_z`` and ``{c}_robust_outlier``
    (int; NULL where MAD = 0 or x is NULL).

    Two bounded per-group passes (median, then MAD over |x − median|)
    broadcast back to one fact scan; each uses the engine-pinned
    quantile lerp.  1.4826 ≈ 1/Φ⁻¹(3/4) rescales MAD to σ-units for a
    normal core, making ``threshold`` comparable to a classic z cutoff.
    """
    g = list(group_columns) if not isinstance(group_columns, str) else [group_columns]
    med_f = df.groupBy(*g).agg(
        F.sort_array(F.collect_list(column)).alias("_arr")
    )
    med_f = med_f.select(
        *g, F.when(F.size("_arr") > 0, _qcont(F.col("_arr"), F.size("_arr"), 0.5)).alias("_med")
    )
    with_med = df.join(F.broadcast(med_f), on=g, how="left")
    dev = F.abs(F.col(column).cast("double") - F.col("_med"))
    mad_f = with_med.groupBy(*g).agg(
        F.sort_array(F.collect_list(dev)).alias("_darr")
    )
    mad_f = mad_f.select(
        *g,
        F.when(F.size("_darr") > 0, _qcont(F.col("_darr"), F.size("_darr"), 0.5)).alias("_mad"),
    )
    out = with_med.join(F.broadcast(mad_f), on=g, how="left")
    z = F.abs(F.col(column).cast("double") - F.col("_med")) / (
        F.lit(1.4826) * F.col("_mad")
    )
    ok = F.col("_mad") > 0
    return out.select(
        *df.columns,
        F.when(ok, z).alias(f"{column}_robust_z"),
        F.when(ok, (z > F.lit(float(threshold))).cast("int")).alias(
            f"{column}_robust_outlier"
        ),
    )


def mad_outliers_sql(
    table: str,
    column: str,
    group_columns,
    select_cols: str,
    threshold: float = 3.5,
) -> str:
    """DuckDB twin of :func:`mad_outliers` (same lerp, same tree)."""
    g = ", ".join(group_columns)
    arr, n = "_arr", "len(_arr)"
    darr, dn = "_darr", "len(_darr)"
    med = f"CASE WHEN {n} > 0 THEN {_qcont_sql(arr, n, 0.5)} END"
    mad = f"CASE WHEN {dn} > 0 THEN {_qcont_sql(darr, dn, 0.5)} END"
    z = f"(ABS(CAST(t.{column} AS DOUBLE) - m._med) / (1.4826 * d._mad))"
    return f"""
WITH m AS (
  SELECT {g}, {med.replace('_arr', '_arr')} AS _med
  FROM (SELECT {g}, list_sort(list({column})) AS _arr FROM {table} GROUP BY {g})
),
d AS (
  SELECT {g}, {mad} AS _mad
  FROM (
    SELECT {g}, list_sort(list(ABS(CAST({column} AS DOUBLE) - _med) ORDER BY NULL)) AS _darr
    FROM (SELECT t.*, m._med FROM {table} t JOIN m USING ({g}))
    GROUP BY {g}
  )
)
SELECT {select_cols},
  CASE WHEN d._mad > 0 THEN {z} END AS {column}_robust_z,
  CASE WHEN d._mad > 0 THEN CAST({z} > {float(threshold)!r} AS INT) END AS {column}_robust_outlier
FROM {table} t JOIN m USING ({g}) JOIN d USING ({g})
"""


def row_hash(df, columns: list[str], decimal_scale: int = 6):
    """Canonical 60-bit per-row content hash — the shared encoding of
    :func:`table_checksum` and :func:`snapshot_diff` (see
    ``table_checksum``'s docstring for the cross-engine canonicalization
    rules: float→DECIMAL(38,s), timestamp→epoch-µs, NULL→``\\x01``,
    ``\\x1f``-joined, md5, first 15 hex digits)."""
    from pyspark.sql import functions as F

    enc = []
    dt = dict(df.dtypes)
    for c in columns:
        t = dt[c]
        if t in ("double", "float"):
            v = F.col(c).cast(f"decimal(38,{decimal_scale})").cast("string")
        elif t.startswith("timestamp"):
            # UTC session tz: NTZ→LTZ cast is wall-clock-identity
            v = F.unix_micros(F.col(c).cast("timestamp")).cast("string")
        else:
            v = F.col(c).cast("string")
        enc.append(F.coalesce(v, F.lit("\x01")))
    return F.conv(F.substring(F.md5(F.concat_ws("\x1f", *enc)), 1, 15), 16, 10).cast(
        "bigint"
    )


def row_hash_sql(columns: list[str], types: dict[str, str], decimal_scale: int = 6) -> str:
    """DuckDB twin expression of :func:`row_hash` (``types``: column →
    Spark dtype string)."""
    enc = []
    for c in columns:
        if types[c] in ("double", "float"):
            v = f"CAST(CAST({c} AS DECIMAL(38,{decimal_scale})) AS VARCHAR)"
        elif types[c].startswith("timestamp"):
            v = f"CAST(epoch_us({c}) AS VARCHAR)"
        else:
            v = f"CAST({c} AS VARCHAR)"
        enc.append(f"COALESCE({v}, chr(1))")
    joined = ", ".join(["chr(31)"] + enc)
    return f"CAST(CONCAT('0x', substring(md5(concat_ws({joined})), 1, 15)) AS BIGINT)"


def table_checksum(
    df,
    columns: list[str] | None = None,
    decimal_scale: int = 6,
):
    """Order-insensitive content checksum — the data-movement audit
    primitive: after a 100 TB copy/repartition/engine-migration, both
    sides compute ``(n_rows, xor_h, sum_h_mod)`` and compare three
    scalars instead of re-reading each other's data.

    Canonical per-row encoding (cross-engine stable — no raw
    float→string formatting is ever used):

    * float/double → ``CAST(x AS DECIMAL(38,s))`` rendered at full
      scale (both engines print fixed-scale decimals identically;
      precision 38 so any double magnitude ≤ ~1e31 at s=6 is
      representable — DECIMAL(18,s) would overflow at |x| ≥ 1e12,
      where Spark silently NULLs and DuckDB errors, breaking the
      cross-engine audit precisely when comparing);
    * timestamps → epoch microseconds (fractional-second STRING forms
      are engine-specific; the integer is not);
    * everything else → its SQL string cast; NULL → sentinel ``\\x01``;
    * fields joined with ``\\x1f`` (unit separator), md5-hashed, first
      15 hex digits → a 60-bit int ``h``.

    Aggregates: ``xor_h`` = BIT_XOR(h) (order-insensitive, O(1) state,
    duplicate rows cancel) and ``sum_h_mod`` = exact decimal SUM(h) mod
    10^18 (duplicate-sensitive — catches the double-copied-partition
    case XOR is blind to).  Map-side combinable, one reduce row total.

    Rounding note: double→DECIMAL ties round HALF_UP in Spark and
    HALF_EVEN in DuckDB; values whose 10^-(s+1) digit is exactly 5 can
    differ.  Business data at scale s is unaffected; pick ``decimal_scale``
    above the data's native precision (same rationale as functions/exact).
    """
    from pyspark.sql import functions as F

    cols = columns or df.columns
    h = row_hash(df, cols, decimal_scale)
    return df.select(h.alias("_h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_h)").alias("xor_h"),
        (F.sum(F.col("_h").cast("decimal(38,0)")) % F.lit(10**18))
        .cast("bigint")
        .alias("sum_h_mod"),
    )


def table_checksum_sql(
    table: str,
    columns: list[str],
    types: dict[str, str],
    decimal_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`table_checksum` (``types``: column → Spark
    dtype string, to mirror the float→decimal canonicalization)."""
    h = row_hash_sql(columns, types, decimal_scale)
    return f"""
WITH h AS (SELECT {h} AS _h FROM {table})
SELECT COUNT(*) AS n_rows, BIT_XOR(_h) AS xor_h,
  CAST(CAST(SUM(CAST(_h AS DECIMAL(38,0))) AS DECIMAL(38,0)) % 1000000000000000000
       AS BIGINT) AS sum_h_mod
FROM h
"""


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    decimal_scale: int = 6,
) -> DataFrame:
    """Row-level diff between two versions of a table — the change-data
    audit behind snapshot reconciliation, replication checks, and
    incremental-load validation: which keys were ``added``, ``removed``,
    or ``changed`` between version A and version B.

    Each side is first projected to (keys, canonical row hash over
    ``compare_cols`` — :func:`row_hash`, the :func:`table_checksum`
    encoding), then a single full-outer join on the keys classifies
    every key.  Unchanged keys are dropped.

    Scale shape: the exchanges carry only keys + one int64 hash — never
    the payload columns — so diffing two 100 TB snapshots shuffles two
    narrow key/hash projections (a few % of table bytes).  With both
    snapshots bucketed on the key the join needs no shuffle at all.
    Output is bounded by the churn, not the table size.
    """
    compare_cols = compare_cols or [c for c in new.columns if c not in key_cols]
    o = old.select(
        *key_cols, row_hash(old, compare_cols, decimal_scale).alias("old_hash")
    )
    n = new.select(
        *key_cols, row_hash(new, compare_cols, decimal_scale).alias("new_hash")
    )
    j = o.join(n, on=list(key_cols), how="full_outer")
    change = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type", "old_hash", "new_hash")
    )


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    key_cols: list[str],
    compare_cols: list[str],
    types: dict[str, str],
    decimal_scale: int = 6,
) -> str:
    """DuckDB twin of :func:`snapshot_diff` over two inner SELECTs."""
    h = row_hash_sql(compare_cols, types, decimal_scale)
    keys = ", ".join(key_cols)
    on = " AND ".join(f"o.{k} = n.{k}" for k in key_cols)
    key_out = ", ".join(f"COALESCE(o.{k}, n.{k}) AS {k}" for k in key_cols)
    return f"""
WITH o AS (SELECT {keys}, {h} AS old_hash FROM ({old_sql})),
n AS (SELECT {keys}, {h} AS new_hash FROM ({new_sql})),
j AS (
  SELECT {key_out}, o.old_hash, n.new_hash,
    CASE WHEN o.old_hash IS NULL THEN 'added'
         WHEN n.new_hash IS NULL THEN 'removed'
         WHEN o.old_hash <> n.new_hash THEN 'changed' END AS change_type
  FROM o FULL JOIN n ON {on}
)
SELECT {keys}, change_type, old_hash, new_hash
FROM j WHERE change_type IS NOT NULL
"""


def quantile_bins(
    df: DataFrame,
    column: str,
    group_columns,
    n_bins: int = 10,
    order_tiebreak=None,
) -> DataFrame:
    """Equal-frequency discretization (quantile binning) summary: NTILE
    over a TOTAL order (value + caller-supplied unique tie-break — ntile
    on a non-total order is nondeterministic under partitioning), then
    per-(group, bin) count and value range.

    The feature-engineering primitive behind rank-based encodings and
    monotone binning for gradient boosting; the summary output is what a
    feature store persists (bin edges per group).  One exchange on the
    group keys; ntile is a single window pass."""
    groups = [group_columns] if isinstance(group_columns, str) else list(group_columns)
    tb = list(order_tiebreak or [])
    w = Window.partitionBy(*groups).orderBy(column, *tb)
    return (
        df.withColumn("bin", F.ntile(int(n_bins)).over(w))
        .groupBy(*groups, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(column).alias("lo"),
            F.max(column).alias("hi"),
        )
    )


def quantile_bins_sql(
    table: str,
    column: str,
    group_columns,
    n_bins: int = 10,
    order_tiebreak=None,
) -> str:
    """DuckDB twin of :func:`quantile_bins`."""
    groups = [group_columns] if isinstance(group_columns, str) else list(group_columns)
    gc = ", ".join(groups)
    ob = ", ".join([column] + list(order_tiebreak or []))
    return f"""
WITH b AS (
  SELECT {gc}, {column},
    NTILE({int(n_bins)}) OVER (PARTITION BY {gc} ORDER BY {ob}) AS bin
  FROM {table}
)
SELECT {gc}, bin, COUNT(*) AS n, MIN({column}) AS lo, MAX({column}) AS hi
FROM b GROUP BY {gc}, bin
"""


def categorical_assoc(data: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Association statistics between two categorical columns in one
    pass: Pearson χ², degrees of freedom, Cramér's V, and mutual
    information (nats) — the feature-selection / dependence screen run
    before one-hot encoding or stratifying on a pair of columns.

    Exactness: cell/margin/total counts are exact BIGINTs (one
    map-combinable groupBy to the |X|·|Y| contingency table, margins as
    whole-partition window sums over that tiny table).  Each cell's χ²
    and MI contribution is a double computed by ONE fixed expression,
    then quantized to int64 units (1e-6 for χ², 1e-9 for MI —
    floor(x·s + 0.5), the one rounding both engines share) so the
    cross-cell summation is exact integer addition — immune to
    accumulation order, the unigram_logprob discipline.  ln() is applied
    once per cell to identical inputs (1-ulp libm variance absorbed by
    the quantization).

    Rows with a NULL in either column are EXCLUDED (complete-case
    analysis): counting NULL as a level would desynchronize the cell
    grouping (which keeps NULL) from COUNT(DISTINCT) (which drops it),
    corrupting dof/V — coalesce NULLs to a sentinel level upstream if
    they should participate.
    Output: one row — n, nx_cats, ny_cats, chi2, dof, cramers_v, mi.
    """
    cells = (
        data.filter(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
        .groupBy(F.col(col_x).alias("_x"), F.col(col_y).alias("_y"))
        .agg(F.count(F.lit(1)).alias("_o"))
    )
    wx = Window.partitionBy("_x")
    wy = Window.partitionBy("_y")
    wall = Window.partitionBy()
    m = cells.select(
        "_x",
        "_y",
        "_o",
        F.sum("_o").over(wx).alias("_nx"),
        F.sum("_o").over(wy).alias("_ny"),
        F.sum("_o").over(wall).alias("_n"),
    )
    o = F.col("_o").cast("double")
    e = (
        F.col("_nx").cast("double")
        * F.col("_ny").cast("double")
        / F.col("_n").cast("double")
    )
    # absent cells (o = 0) contribute e to χ² but never appear in the
    # contingency table; since Σ_all_cells e = N, fold them in exactly:
    # χ² = Σ_observed[(o−e)²/e − e] + N
    chi_term = (o - e) * (o - e) / e - e
    mi_term = (o / F.col("_n").cast("double")) * F.log(
        F.col("_n").cast("double")
        * o
        / (F.col("_nx").cast("double") * F.col("_ny").cast("double"))
    )
    q_chi = F.floor(chi_term * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    q_mi = F.floor(mi_term * F.lit(1e9) + F.lit(0.5)).cast("bigint")
    agg = m.agg(
        F.max("_n").alias("n"),
        F.countDistinct("_x").alias("nx_cats"),
        F.countDistinct("_y").alias("ny_cats"),
        F.sum(q_chi).alias("_qc"),
        F.sum(q_mi).alias("_qm"),
    )
    chi2 = F.col("_qc").cast("double") / F.lit(1e6) + F.col("n").cast("double")
    dof = ((F.col("nx_cats") - 1) * (F.col("ny_cats") - 1)).cast("bigint")
    mink = F.least(F.col("nx_cats") - 1, F.col("ny_cats") - 1).cast("double")
    v = F.when(
        mink > 0, F.sqrt(chi2 / (F.col("n").cast("double") * mink))
    )
    return agg.select(
        "n",
        "nx_cats",
        "ny_cats",
        chi2.alias("chi2"),
        dof.alias("dof"),
        v.alias("cramers_v"),
        (F.col("_qm").cast("double") / F.lit(1e9)).alias("mi"),
    )


def categorical_assoc_sql(table: str, col_x: str, col_y: str) -> str:
    """DuckDB twin of :func:`categorical_assoc`."""
    o = "CAST(_o AS DOUBLE)"
    e = "(CAST(_nx AS DOUBLE) * CAST(_ny AS DOUBLE) / CAST(_n AS DOUBLE))"
    chi = f"(({o} - {e}) * ({o} - {e}) / {e} - {e})"
    mi = (
        f"(({o} / CAST(_n AS DOUBLE)) * ln(CAST(_n AS DOUBLE) * {o} "
        f"/ (CAST(_nx AS DOUBLE) * CAST(_ny AS DOUBLE))))"
    )
    return f"""
WITH cells AS (
  SELECT {col_x} AS _x, {col_y} AS _y, COUNT(*) AS _o
  FROM {table}
  WHERE {col_x} IS NOT NULL AND {col_y} IS NOT NULL
  GROUP BY {col_x}, {col_y}
), m AS (
  SELECT _x, _y, _o,
    SUM(_o) OVER (PARTITION BY _x) AS _nx,
    SUM(_o) OVER (PARTITION BY _y) AS _ny,
    SUM(_o) OVER () AS _n
  FROM cells
), agg AS (
  SELECT MAX(_n) AS n,
    COUNT(DISTINCT _x) AS nx_cats,
    COUNT(DISTINCT _y) AS ny_cats,
    SUM(CAST(FLOOR({chi} * 1e6 + 0.5) AS BIGINT)) AS _qc,
    SUM(CAST(FLOOR({mi} * 1e9 + 0.5) AS BIGINT)) AS _qm
  FROM m
)
SELECT CAST(n AS BIGINT) AS n, nx_cats, ny_cats,
  CAST(_qc AS DOUBLE) / 1e6 + CAST(n AS DOUBLE) AS chi2,
  CAST((nx_cats - 1) * (ny_cats - 1) AS BIGINT) AS dof,
  CASE WHEN CAST(LEAST(nx_cats - 1, ny_cats - 1) AS DOUBLE) > 0 THEN
    SQRT((CAST(_qc AS DOUBLE) / 1e6 + CAST(n AS DOUBLE)) /
         (CAST(n AS DOUBLE) * CAST(LEAST(nx_cats - 1, ny_cats - 1) AS DOUBLE)))
  END AS cramers_v,
  CAST(_qm AS DOUBLE) / 1e9 AS mi
FROM agg
"""


def value_entropy(
    data: DataFrame,
    column: str,
    group_columns,
    bin_width: float = 1.0,
    scale: int = 2,
) -> DataFrame:
    """Per-group Shannon entropy of the binned value distribution (nats)
    plus the log-|bins|-normalized form in [0,1] — the dispersion /
    concentration diagnostic for feature screening ("is this column one
    spike or spread out?").

    Bins are integer-exact: floor(quantized / (bin_width·10^scale)).
    Per-bin −p·ln(p) terms are quantized to 1e-9 int64 units before the
    cross-bin sum (exact integer addition, order-immune); the normalized
    entropy divides by ln(n_bins) in one double op.  NULLs excluded.

    Shape: one map-combinable aggregate to (group, bin), one to group.
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    q = F.floor(F.col(column) * F.lit(float(10**scale)) + F.lit(0.5)).cast("bigint")
    width = int(round(bin_width * 10**scale))
    if width <= 0:
        raise ValueError("bin_width too small for scale")
    b = F.floor(q / F.lit(width)).cast("bigint")
    binned = (
        data.select(*g, b.alias("_b"))
        .filter(F.col("_b").isNotNull())
        .groupBy(*g, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    n = F.sum("_c").over(Window.partitionBy(*g))
    p = F.col("_c").cast("double") / n.cast("double")
    term = -(p * F.log(p))
    qterm = F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("bigint")
    staged = binned.select(*g, qterm.alias("_q"))
    agg = staged.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_bins"), F.sum("_q").alias("_sq")
    )
    ent = F.col("_sq").cast("double") / F.lit(1e9)
    norm = F.when(
        F.col("n_bins") > 1, ent / F.log(F.col("n_bins").cast("double"))
    )
    return agg.select(
        *g, "n_bins", ent.alias("entropy"), norm.alias("entropy_norm")
    )


def value_entropy_sql(
    table: str,
    column: str,
    group_columns,
    bin_width: float = 1.0,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`value_entropy`."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    width = int(round(bin_width * 10**scale))
    q = f"CAST(FLOOR({column} * {float(10 ** scale)!r} + 0.5) AS BIGINT)"
    b = f"CAST(FLOOR({q} / {width}) AS BIGINT)"
    p = "(CAST(_c AS DOUBLE) / CAST(_n AS DOUBLE))"
    term = f"(-({p} * ln({p})))"
    return f"""
WITH binned AS (
  SELECT {gsel}, _b, COUNT(*) AS _c FROM (
    SELECT {gsel}, {b} AS _b FROM {table}
  ) WHERE _b IS NOT NULL GROUP BY {gsel}, _b
), m AS (
  SELECT {gsel}, _c, SUM(_c) OVER (PARTITION BY {gsel}) AS _n FROM binned
), agg AS (
  SELECT {gsel}, COUNT(*) AS n_bins,
    SUM(CAST(FLOOR({term} * 1e9 + 0.5) AS BIGINT)) AS _sq
  FROM m GROUP BY {gsel}
)
SELECT {gsel}, n_bins,
  CAST(_sq AS DOUBLE) / 1e9 AS entropy,
  CASE WHEN n_bins > 1 THEN
    (CAST(_sq AS DOUBLE) / 1e9) / ln(CAST(n_bins AS DOUBLE))
  END AS entropy_norm
FROM agg
"""


def gini_index(
    df: DataFrame,
    group_columns,
    value_col: str,
    tie_break: str,
    scale: int = 2,
) -> DataFrame:
    """Per-group Gini concentration index — the inequality summary
    behind revenue-concentration and workload-skew dashboards (0 =
    perfectly even, →1 = winner-takes-all), the scalar companion of
    :func:`~timeseriesutils_spark.operators.segments.abc_analysis`.

    Sample Gini over sorted values x₁ ≤ … ≤ xₙ:

        G = 2·Σ i·xᵢ / (n·Σ xᵢ) − (n + 1)/n

    One (group)-keyed exchange: a rank window pass, then a
    map-combinable reduce of Σ xᵢ and Σ i·xᵢ.  Values quantize to
    integer units of 10^-scale; Σ i·x accumulates in DECIMAL(38,0)
    (rank × value products overflow int64 first at large n); the final
    formula is a short double chain on exact integers — bit-identical
    across engines.  Ranks order by (value, ``tie_break``) so ties are
    total; negative values are the caller's concern (Gini assumes ≥ 0).

    Returns (groups…, n, total, gini).
    """
    groups = _as_list(group_columns)
    mult = 10**scale
    q = F.floor(F.col(value_col) * F.lit(mult) + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy(*groups).orderBy(F.asc("_q"), F.asc(tie_break))
    # complete-case: NULL values would rank NULLS FIRST in Spark but
    # NULLS LAST in DuckDB, and n would count rows the sums skip
    d = df.filter(F.col(value_col).isNotNull()).select(
        *groups, q.alias("_q"), F.col(tie_break)
    ).withColumn("_i", F.row_number().over(w).cast("bigint"))
    agg = d.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_q").cast("decimal(38,0)")).alias("_sx"),
        F.sum((F.col("_i") * F.col("_q")).cast("decimal(38,0)")).alias("_six"),
    )
    nn = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    six = F.col("_six").cast("double")
    gini = F.when(
        F.col("_sx") != 0,
        F.lit(2.0) * six / (nn * sx) - (nn + F.lit(1.0)) / nn,
    )
    return agg.select(
        *groups,
        "n",
        (sx / F.lit(float(mult))).alias("total"),
        gini.alias("gini"),
    )


def gini_index_sql(
    table: str,
    group_columns,
    value_col: str,
    tie_break: str,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`gini_index`."""
    groups = _as_list(group_columns)
    g = ", ".join(groups)
    mult = 10**scale
    return f"""
WITH q AS (
  SELECT {g}, CAST(FLOOR({value_col} * {mult} + 0.5) AS BIGINT) AS _q, {tie_break}
  FROM {table}
  WHERE {value_col} IS NOT NULL
),
r AS (
  SELECT {g}, _q,
    CAST(row_number() OVER (PARTITION BY {g} ORDER BY _q ASC, {tie_break} ASC)
         AS BIGINT) AS _i
  FROM q
),
agg AS (
  SELECT {g}, COUNT(*) AS n, SUM(_q) AS _sx, SUM(_i * _q) AS _six
  FROM r GROUP BY {g}
)
SELECT {g}, n,
  CAST(_sx AS DOUBLE) / {float(mult)!r} AS total,
  CASE WHEN _sx <> 0 THEN
    2.0 * CAST(_six AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(_sx AS DOUBLE))
      - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) END AS gini
FROM agg
"""


def weighted_median(
    df: DataFrame,
    group_columns,
    value_col: str,
    weight_col: str,
    tie_break: str,
    scale: int = 2,
) -> DataFrame:
    """Per-group exact weighted (lower) median: the smallest value whose
    cumulative weight reaches half the total — e.g. the quantity-
    weighted median price, where each row counts ``weight`` times.
    Plain ``median`` ignores weights; ``approx_percentile`` has no
    weighted form at all.

    One exchange: a running-weight window over (value, tie_break)
    order, then a filtered min.  Weights and values quantize to exact
    integers; the halving test uses 2·cumw ≥ total in integers — no
    division, no float compare.  Returns (groups…, n, weight_total,
    wmedian).
    """
    groups = _as_list(group_columns)
    mult = 10**scale
    q = F.floor(F.col(value_col) * F.lit(mult) + F.lit(0.5)).cast("bigint")
    wq = F.floor(F.col(weight_col) * F.lit(mult) + F.lit(0.5)).cast("bigint")
    w_ord = Window.partitionBy(*groups).orderBy(F.asc("_q"), F.asc(tie_break))
    w_all = Window.partitionBy(*groups)
    # complete-case: a NULL value would order NULLS FIRST/LAST
    # differently across engines; a NULL weight poisons the cumulative
    d = (
        df.filter(F.col(value_col).isNotNull() & F.col(weight_col).isNotNull())
        .select(*groups, q.alias("_q"), wq.alias("_w"), F.col(tie_break))
        .withColumn("_cum", F.sum("_w").over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("_tot", F.sum("_w").over(w_all))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
    )
    hit = d.filter(F.lit(2) * F.col("_cum") >= F.col("_tot"))
    return hit.groupBy(*groups).agg(
        F.max("_n").alias("n"),
        (F.max("_tot").cast("double") / F.lit(float(mult))).alias("weight_total"),
        (F.min("_q").cast("double") / F.lit(float(mult))).alias("wmedian"),
    )


def weighted_median_sql(
    table: str,
    group_columns,
    value_col: str,
    weight_col: str,
    tie_break: str,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`weighted_median`."""
    groups = _as_list(group_columns)
    g = ", ".join(groups)
    mult = 10**scale
    return f"""
WITH q AS (
  SELECT {g},
    CAST(FLOOR({value_col} * {mult} + 0.5) AS BIGINT) AS _q,
    CAST(FLOOR({weight_col} * {mult} + 0.5) AS BIGINT) AS _w,
    {tie_break}
  FROM {table}
  WHERE {value_col} IS NOT NULL AND {weight_col} IS NOT NULL
),
c AS (
  SELECT {g}, _q, _w,
    CAST(SUM(_w) OVER (PARTITION BY {g} ORDER BY _q ASC, {tie_break} ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS _cum,
    CAST(SUM(_w) OVER (PARTITION BY {g}) AS BIGINT) AS _tot,
    COUNT(*) OVER (PARTITION BY {g}) AS _n
  FROM q
)
SELECT {g}, MAX(_n) AS n,
  CAST(MAX(_tot) AS DOUBLE) / {float(mult)!r} AS weight_total,
  CAST(MIN(_q) AS DOUBLE) / {float(mult)!r} AS wmedian
FROM c WHERE 2 * _cum >= _tot
GROUP BY {g}
"""


def anova_oneway(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    scale: int = 2,
) -> DataFrame:
    """One-way ANOVA: does ``factor_col`` explain ``value_col``?
    Between/within sum-of-squares decomposition, F statistic, and η²
    (variance explained) — the go/no-go test behind "does segment
    actually matter", the numeric-target counterpart of
    :func:`categorical_assoc`.

    Two tiny chained aggregations: per-level (n, Σx, Σx²) with quantized
    DECIMAL-exact sums, then the k-row reduce to the decomposition —
    identities SSW = Σ(Σx²_g − (Σx_g)²/n_g) and
    SSB = Σ(Σx_g)²/n_g − (Σx)²/n avoid any second data pass.  The only
    doubles are the final chain on exact integers, one shared tree.

    Returns one row: (k_levels, n, ss_between, ss_within, f_stat, eta_sq).
    """
    m = 10**scale
    x = F.floor(F.col(value_col) * F.lit(m) + F.lit(0.5)).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # complete-case: COUNT(*) must count exactly the rows the SUMs see,
    # else NULL values deflate the means and bias SS/F (ADVICE r4)
    per = df.filter(F.col(value_col).isNotNull()).select(
        F.col(factor_col).alias("_g"), x.alias("_x")
    ).groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec(F.col("_x"))).alias("_s"),
        F.sum(dec(F.col("_x") * F.col("_x"))).alias("_ss"),
    )
    # per-level contributions in double (exact ints in, one shared tree).
    # DECIMAL->DOUBLE goes VIA STRING: DuckDB's direct HUGEINT/DECIMAL ->
    # DOUBLE cast TRUNCATES above 2^53 while Spark rounds to nearest; both
    # engines' string->double parsers are correctly rounded, so the
    # string route is the portable conversion for big exact integers.
    sg = F.col("_s").cast("string").cast("double")
    ng = F.col("_n").cast("double")
    ssg = F.col("_ss").cast("string").cast("double")
    top = per.agg(
        F.count(F.lit(1)).alias("k_levels"),
        F.sum("_n").alias("n"),
        F.sum(dec(F.col("_s"))).alias("_st"),
        F.sum(dec(F.col("_ss"))).alias("_sst"),
        # per-level double contributions are floored IN THE DOUBLE DOMAIN
        # (c - c mod 1: exact for c >= 0 at any magnitude, no long
        # conversion to overflow, no decimal tie-rounding divergence —
        # Spark rounds HALF_UP, DuckDB HALF_EVEN at double->DECIMAL(38,6))
        # then accumulate through DECIMAL(38,0): exact, associative,
        # merge-order-free.
        F.sum(
            ((sg * sg / ng) - (sg * sg / ng) % F.lit(1.0)).cast("decimal(38,0)")
        ).alias("_sb_raw"),
        F.sum(
            (
                (ssg - sg * sg / ng) - (ssg - sg * sg / ng) % F.lit(1.0)
            ).cast("decimal(38,0)")
        ).alias("_ssw_q"),
    )
    mf = float(m * m)
    nn = F.col("n").cast("double")
    st = F.col("_st").cast("string").cast("double")
    ssb = (F.col("_sb_raw").cast("string").cast("double") - st * st / nn) / F.lit(mf)
    ssw = F.col("_ssw_q").cast("string").cast("double") / F.lit(mf)
    kk = F.col("k_levels").cast("double")
    f_stat = F.when(
        (F.col("k_levels") > 1) & (F.col("n") > F.col("k_levels")) & (ssw != 0),
        (ssb / (kk - 1)) / (ssw / (nn - kk)),
    )
    sst = ssb + ssw
    return top.select(
        "k_levels",
        "n",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        f_stat.alias("f_stat"),
        F.when(sst != 0, ssb / sst).alias("eta_sq"),
    )


def anova_oneway_sql(
    table: str,
    value_col: str,
    factor_col: str,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`anova_oneway`.

    Per-level s²/n contributions are floor-quantized to integers before
    the k-row reduce (double addition is order-dependent; the decimal
    sum is not), costing ≤ k quantized units of absolute SS precision.
    """
    m = 10**scale
    mf = float(m * m)
    x = f"CAST(FLOOR({value_col} * {m} + 0.5) AS BIGINT)"
    return f"""
WITH q AS (SELECT {factor_col} AS _g, {x} AS _x FROM {table}
           WHERE {value_col} IS NOT NULL),
per AS (
  SELECT _g, COUNT(*) AS _n, SUM(_x) AS _s, SUM(_x * _x) AS _ss
  FROM q GROUP BY _g
),
top AS (
  SELECT COUNT(*) AS k_levels, CAST(SUM(_n) AS BIGINT) AS n,
    SUM(_s) AS _st, SUM(_ss) AS _sst,
    SUM(CAST((CAST(CAST(_s AS VARCHAR) AS DOUBLE) * CAST(CAST(_s AS VARCHAR) AS DOUBLE)
        / CAST(_n AS DOUBLE))
        - (CAST(CAST(_s AS VARCHAR) AS DOUBLE) * CAST(CAST(_s AS VARCHAR) AS DOUBLE)
        / CAST(_n AS DOUBLE)) % 1.0 AS DECIMAL(38,0))) AS _sb_raw,
    SUM(CAST((CAST(CAST(_ss AS VARCHAR) AS DOUBLE)
        - CAST(CAST(_s AS VARCHAR) AS DOUBLE) * CAST(CAST(_s AS VARCHAR) AS DOUBLE)
          / CAST(_n AS DOUBLE))
        - (CAST(CAST(_ss AS VARCHAR) AS DOUBLE)
        - CAST(CAST(_s AS VARCHAR) AS DOUBLE) * CAST(CAST(_s AS VARCHAR) AS DOUBLE)
          / CAST(_n AS DOUBLE)) % 1.0 AS DECIMAL(38,0))) AS _ssw_q
  FROM per
)
SELECT k_levels, n,
  (CAST(CAST(_sb_raw AS VARCHAR) AS DOUBLE) - CAST(CAST(_st AS VARCHAR) AS DOUBLE) * CAST(CAST(_st AS VARCHAR) AS DOUBLE)
     / CAST(n AS DOUBLE)) / {mf!r} AS ss_between,
  CAST(CAST(_ssw_q AS VARCHAR) AS DOUBLE) / {mf!r} AS ss_within,
  CASE WHEN k_levels > 1 AND n > k_levels AND CAST(CAST(_ssw_q AS VARCHAR) AS DOUBLE) / {mf!r} <> 0 THEN
    (((CAST(CAST(_sb_raw AS VARCHAR) AS DOUBLE) - CAST(CAST(_st AS VARCHAR) AS DOUBLE) * CAST(CAST(_st AS VARCHAR) AS DOUBLE)
        / CAST(n AS DOUBLE)) / {mf!r}) / (CAST(k_levels AS DOUBLE) - 1))
    / ((CAST(CAST(_ssw_q AS VARCHAR) AS DOUBLE) / {mf!r})
       / (CAST(n AS DOUBLE) - CAST(k_levels AS DOUBLE)))
  END AS f_stat,
  CASE WHEN (CAST(CAST(_sb_raw AS VARCHAR) AS DOUBLE) - CAST(CAST(_st AS VARCHAR) AS DOUBLE) * CAST(CAST(_st AS VARCHAR) AS DOUBLE)
             / CAST(n AS DOUBLE)) / {mf!r} + CAST(CAST(_ssw_q AS VARCHAR) AS DOUBLE) / {mf!r} <> 0 THEN
    ((CAST(CAST(_sb_raw AS VARCHAR) AS DOUBLE) - CAST(CAST(_st AS VARCHAR) AS DOUBLE) * CAST(CAST(_st AS VARCHAR) AS DOUBLE)
       / CAST(n AS DOUBLE)) / {mf!r})
    / ((CAST(CAST(_sb_raw AS VARCHAR) AS DOUBLE) - CAST(CAST(_st AS VARCHAR) AS DOUBLE) * CAST(CAST(_st AS VARCHAR) AS DOUBLE)
        / CAST(n AS DOUBLE)) / {mf!r} + CAST(CAST(_ssw_q AS VARCHAR) AS DOUBLE) / {mf!r})
  END AS eta_sq
FROM top
"""


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    scale: int = 2,
) -> DataFrame:
    """Two-sample Welch t-test (unequal variances) between two levels of
    ``group_col`` — the numeric-metric A/B significance test
    (``ab_test_report`` covers proportions; this covers means: revenue
    per order, latency, tokens per doc).  One map-combinable pass of
    quantized DECIMAL-exact (n, Σx, Σx²) per arm, then the closed-form
    t statistic and Welch–Satterthwaite degrees of freedom on the
    two-row result.  Sample variance uses the n−1 denominator.

    Returns one row: (n_a, n_b, mean_a, mean_b, t_stat, dof).
    """
    m = 10**scale
    x = F.floor(F.col(value_col) * F.lit(m) + F.lit(0.5)).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # complete-case: drop NULL values so n_a/n_b count exactly the rows
    # the sums see (ADVICE r4)
    d = df.filter(
        F.col(group_col).isin([group_a, group_b])
        & F.col(value_col).isNotNull()
    ).select((F.col(group_col) == F.lit(group_a)).alias("_a"), x.alias("_x"))
    agg = d.groupBy().agg(
        F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("_a"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("_a"), dec(F.col("_x"))).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_sa"),
        F.sum(F.when(~F.col("_a"), dec(F.col("_x"))).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_sb"),
        F.sum(F.when(F.col("_a"), dec(F.col("_x") * F.col("_x"))).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_qa"),
        F.sum(F.when(~F.col("_a"), dec(F.col("_x") * F.col("_x"))).otherwise(F.lit(0).cast("decimal(38,0)"))).alias("_qb"),
    )
    mf = float(m)
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731  (>2^53-safe)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = s2d("_sa") / F.lit(mf) / na
    mb = s2d("_sb") / F.lit(mf) / nb
    va = (s2d("_qa") / F.lit(mf * mf) - na * ma * ma) / (na - 1)
    vb = (s2d("_qb") / F.lit(mf * mf) - nb * mb * mb) / (nb - 1)
    sea, seb = va / na, vb / nb
    t = (ma - mb) / F.sqrt(sea + seb)
    dof = (sea + seb) * (sea + seb) / (
        sea * sea / (na - 1) + seb * seb / (nb - 1)
    )
    # degenerate-arm guards (property-law find, round 6): an arm emptied
    # or reduced to one row by the complete-case filter must yield NULL,
    # not an ANSI DIVIDE_BY_ZERO; two constant arms (zero pooled
    # variance) likewise have no finite t.  The variance-positivity
    # check is NESTED inside the count guard — a conjoined predicate
    # would itself evaluate the guarded division.
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    se_pos = sea + seb > 0
    return agg.select(
        "n_a",
        "n_b",
        F.when(F.col("n_a") > 0, ma).alias("mean_a"),
        F.when(F.col("n_b") > 0, mb).alias("mean_b"),
        F.when(ok, F.when(se_pos, t)).alias("t_stat"),
        F.when(ok, F.when(se_pos, dof)).alias("dof"),
    )


def welch_ttest_sql(
    table: str,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`welch_ttest`."""
    m = 10**scale
    mf = float(m)
    mf2 = float(m * m)
    x = f"CAST(FLOOR({value_col} * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    na, nb = "CAST(n_a AS DOUBLE)", "CAST(n_b AS DOUBLE)"
    ma = f"({s2d('_sa')} / {mf!r} / {na})"
    mb = f"({s2d('_sb')} / {mf!r} / {nb})"
    va = f"(({s2d('_qa')} / {mf2!r} - {na} * {ma} * {ma}) / ({na} - 1))"
    vb = f"(({s2d('_qb')} / {mf2!r} - {nb} * {mb} * {mb}) / ({nb} - 1))"
    sea, seb = f"({va} / {na})", f"({vb} / {nb})"
    t = f"(({ma} - {mb}) / sqrt({sea} + {seb}))"
    dof = (
        f"(({sea} + {seb}) * ({sea} + {seb}) / "
        f"({sea} * {sea} / ({na} - 1) + {seb} * {seb} / ({nb} - 1)))"
    )
    return f"""
WITH d AS (
  SELECT {group_col} = {sq(group_a)} AS _a, {x} AS _x
  FROM {table} WHERE {group_col} IN ({sq(group_a)}, {sq(group_b)})
    AND {value_col} IS NOT NULL
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN _a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN NOT _a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    SUM(CASE WHEN _a THEN _x ELSE 0 END) AS _sa,
    SUM(CASE WHEN NOT _a THEN _x ELSE 0 END) AS _sb,
    SUM(CASE WHEN _a THEN _x * _x ELSE 0 END) AS _qa,
    SUM(CASE WHEN NOT _a THEN _x * _x ELSE 0 END) AS _qb
  FROM d
)
SELECT n_a, n_b,
  CASE WHEN n_a > 0 THEN {ma} END AS mean_a,
  CASE WHEN n_b > 0 THEN {mb} END AS mean_b,
  CASE WHEN n_a > 1 AND n_b > 1 THEN
    CASE WHEN ({sea} + {seb}) > 0 THEN {t} END END AS t_stat,
  CASE WHEN n_a > 1 AND n_b > 1 THEN
    CASE WHEN ({sea} + {seb}) > 0 THEN {dof} END END AS dof
FROM agg
"""


def histogram2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bins: tuple[int, int] = (20, 20),
) -> DataFrame:
    """Equi-width 2D density grid — the scatter-heatmap aggregation for
    dataviz/EDA at scales where plotting raw points is impossible.
    Caller-fixed ranges (no data-dependent bounds pass); out-of-range
    rows clamp into the edge bins, NULLs drop.  One map-combinable
    groupBy; bin ids are exact integer arithmetic on one double
    subtraction/division chain shared with the twin.

    Returns (bin_x, bin_y, x_lo, y_lo, n) — x_lo/y_lo are the bin's
    left edges for direct plotting.
    """
    (xl, xh), (yl, yh) = x_range, y_range
    nx, ny = bins
    wx = (xh - xl) / nx
    wy = (yh - yl) / ny
    bx = F.least(
        F.greatest(F.floor((F.col(x_col) - F.lit(xl)) / F.lit(wx)), F.lit(0)),
        F.lit(nx - 1),
    ).cast("int")
    by = F.least(
        F.greatest(F.floor((F.col(y_col) - F.lit(yl)) / F.lit(wy)), F.lit(0)),
        F.lit(ny - 1),
    ).cast("int")
    return (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(bx.alias("bin_x"), by.alias("bin_y"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin_x",
            "bin_y",
            (F.lit(xl) + F.col("bin_x") * F.lit(wx)).alias("x_lo"),
            (F.lit(yl) + F.col("bin_y") * F.lit(wy)).alias("y_lo"),
            "n",
        )
    )


def histogram2d_sql(
    table: str,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    bins: tuple[int, int] = (20, 20),
) -> str:
    """DuckDB twin of :func:`histogram2d`."""
    (xl, xh), (yl, yh) = x_range, y_range
    nx, ny = bins
    wx = (xh - xl) / nx
    wy = (yh - yl) / ny
    bx = f"CAST(LEAST(GREATEST(FLOOR(({x_col} - {xl!r}) / {wx!r}), 0), {nx - 1}) AS INT)"
    by = f"CAST(LEAST(GREATEST(FLOOR(({y_col} - {yl!r}) / {wy!r}), 0), {ny - 1}) AS INT)"
    return f"""
WITH b AS (
  SELECT {bx} AS bin_x, {by} AS bin_y
  FROM {table} WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
)
SELECT bin_x, bin_y,
  {xl!r} + bin_x * {wx!r} AS x_lo,
  {yl!r} + bin_y * {wy!r} AS y_lo,
  COUNT(*) AS n
FROM b GROUP BY bin_x, bin_y
"""


def gmean_exact(
    df: DataFrame,
    value_col: str,
    group_columns,
    ln_scale: int = 9,
    out_scale: int = 9,
) -> DataFrame:
    """Per-group geometric mean of a positive column, hash-verifiable:
    exp(Σ ln x / n) with each ln floor-quantized to int64 units of
    10^-``ln_scale`` BEFORE the sum (the ln-once-then-quantize
    discipline of unigram_logprob / kaplan_meier), so the aggregation is
    exact integer addition and the result is identical in any
    partitioning — the deterministic counterpart of
    ``functions/exact.gmean_udaf`` (which is rows-only by design: numpy
    sums doubles in data order).

    Non-positive values yield NULL for the whole group (the honest
    answer; filter upstream to opt out).  Output quantized to
    ``out_scale`` decimals after the single exp.

    Returns (groups…, n, gmean).
    """
    groups = _as_list(group_columns)
    lm = float(10**ln_scale)
    om = float(10**out_scale)
    bad = F.sum((F.col(value_col) <= 0).cast("bigint"))
    lq = F.floor(
        F.log(F.col(value_col).cast("double")) * F.lit(lm) + F.lit(0.5)
    ).cast("bigint")
    # complete-case: NULL values would inflate n while the ln sum and
    # the bad counter both skip them
    agg = df.filter(F.col(value_col).isNotNull()).groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(bad, F.lit(0)).alias("_bad"),
        F.sum(F.when(F.col(value_col) > 0, lq).cast("decimal(38,0)")).alias("_sl"),
    )
    # decimal -> double via string (the >2^53 portable-cast rule)
    g = F.floor(
        F.exp(
            F.col("_sl").cast("string").cast("double")
            / F.lit(lm)
            / F.col("n").cast("double")
        )
        * F.lit(om)
        + F.lit(0.5)
    ) / F.lit(om)
    return agg.select(
        *groups,
        "n",
        F.when(F.col("_bad") == 0, g).alias("gmean"),
    )


def gmean_exact_sql(
    table: str,
    value_col: str,
    group_columns,
    ln_scale: int = 9,
    out_scale: int = 9,
) -> str:
    """DuckDB twin of :func:`gmean_exact`."""
    groups = _as_list(group_columns)
    g = ", ".join(groups)
    lm = float(10**ln_scale)
    om = float(10**out_scale)
    return f"""
WITH agg AS (
  SELECT {g}, COUNT(*) AS n,
    SUM(CASE WHEN {value_col} <= 0 THEN 1 ELSE 0 END) AS _bad,
    SUM(CASE WHEN {value_col} > 0 THEN
      CAST(FLOOR(ln(CAST({value_col} AS DOUBLE)) * {dlit(lm)} + 0.5) AS BIGINT)
    END) AS _sl
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY {g}
)
SELECT {g}, n,
  CASE WHEN _bad = 0 THEN
    FLOOR(exp(CAST(CAST(_sl AS VARCHAR) AS DOUBLE) / {dlit(lm)} / CAST(n AS DOUBLE))
          * {dlit(om)} + 0.5) / {dlit(om)}
  END AS gmean
FROM agg
"""


def rolling_quantile(
    df: DataFrame,
    value_col: str,
    group_columns,
    order_by,
    qs: tuple[float, ...] = (0.5, 0.95),
    window_size: int = 100,
) -> DataFrame:
    """Per-row trailing exact quantiles: each row gets the q-quantiles of
    the last ``window_size`` observations of its group — the
    p50/p95-over-trailing-window shape of SLO monitoring, where
    :func:`bucket_percentiles` gives one row per bucket this gives one
    row per event (alert the moment p95 degrades, not at the next
    bucket boundary).

    Exact tier: one sorted window array per row
    (``sort_array(collect_list)`` over the frame — the rolling_mad
    machinery), quantiles via the engine-pinned lerp.  Cost is
    O(w log w) per row and bounded by ``window_size``; at monster
    windows swap the bounds for ``approx_percentile`` (t-digest) — the
    output contract is unchanged.  Appends ``{c}_p{q}_w{w}`` columns.
    """
    from timeseriesutils_spark.operators.window_features import make_window

    w = make_window(group_columns, _as_list(order_by)).rowsBetween(
        -(window_size - 1), Window.currentRow
    )
    arr = F.sort_array(F.collect_list(F.col(value_col)).over(w))
    tmp = df.select("*", arr.alias("_rq_arr"))
    cols = [
        _qcont(F.col("_rq_arr"), F.size("_rq_arr"), q).alias(
            f"{value_col}_p{int(q * 100)}_w{window_size}"
        )
        for q in qs
    ]
    return tmp.select(*df.columns, *cols)


def rolling_quantile_sql(
    table: str,
    select_cols: str,
    value_col: str,
    group_columns,
    order_by,
    qs: tuple[float, ...] = (0.5, 0.95),
    window_size: int = 100,
) -> str:
    """DuckDB twin of :func:`rolling_quantile` (full query text)."""
    over = (
        f"(PARTITION BY {', '.join(_as_list(group_columns))} "
        f"ORDER BY {', '.join(_as_list(order_by))} "
        f"ROWS BETWEEN {window_size - 1} PRECEDING AND CURRENT ROW)"
    )
    cols = ",\n  ".join(
        f"{_qcont_sql('_rq_arr', 'len(_rq_arr)', q)} AS {value_col}_p{int(q * 100)}_w{window_size}"
        for q in qs
    )
    return f"""
WITH a AS (
  SELECT {select_cols}, list_sort(list({value_col}) OVER {over}) AS _rq_arr
  FROM {table}
)
SELECT {select_cols},
  {cols}
FROM a
"""


def quantile_transform(
    df: DataFrame,
    value_col: str,
    group_columns,
    tie_break,
    out_col: str | None = None,
) -> DataFrame:
    """Per-group empirical-CDF normalization: each row's value maps to
    its midrank position (rank − 0.5)/n in the group — the
    quantile-uniform feature transform (rank-gauss minus the gauss)
    that makes skewed features comparable across groups before
    modeling.  Deterministic total order via ``tie_break``; the output
    is one exact-integer-derived double division per row.  NULL values
    pass through as NULL positions and do not consume ranks.

    One window pass on the group key — single exchange.  Appends
    ``out_col`` (default ``{value_col}_qt``).
    """
    g = _as_list(group_columns)
    out_col = out_col or f"{value_col}_qt"
    ok = F.col(value_col).isNotNull()
    w = Window.partitionBy(*g).orderBy(
        F.asc(value_col), F.asc(tie_break)
    )
    wg = Window.partitionBy(*g)
    rn = F.row_number().over(w)
    n = F.sum(ok.cast("bigint")).over(wg)
    # rows sort NULLS FIRST in Spark: rank among non-null = rn - n_null;
    # subtracting the group's null count keeps ranks 1..n over observed
    n_null = F.sum((~ok).cast("bigint")).over(wg)
    pos = F.when(
        ok,
        (rn.cast("double") - n_null.cast("double") - F.lit(0.5))
        / n.cast("double"),
    )
    return df.withColumn(out_col, pos)


def quantile_transform_sql(
    table: str,
    select_cols: str,
    value_col: str,
    group_columns,
    tie_break,
    out_col: str | None = None,
) -> str:
    """DuckDB twin of :func:`quantile_transform`.  DuckDB orders NULLS
    LAST by default where Spark orders NULLS FIRST — the twin pins
    NULLS FIRST explicitly so ranks agree."""
    g = ", ".join(_as_list(group_columns))
    out_col = out_col or f"{value_col}_qt"
    return f"""
WITH r AS (
  SELECT {select_cols},
    {value_col} AS _v,
    ROW_NUMBER() OVER (PARTITION BY {g}
      ORDER BY {value_col} ASC NULLS FIRST, {tie_break} ASC) AS _rn,
    CAST(SUM(CASE WHEN {value_col} IS NOT NULL THEN 1 ELSE 0 END)
         OVER (PARTITION BY {g}) AS BIGINT) AS _n,
    CAST(SUM(CASE WHEN {value_col} IS NULL THEN 1 ELSE 0 END)
         OVER (PARTITION BY {g}) AS BIGINT) AS _nn
  FROM {table}
)
SELECT {select_cols},
  CASE WHEN _v IS NOT NULL THEN
    (CAST(_rn AS DOUBLE) - CAST(_nn AS DOUBLE) - 0.5) / CAST(_n AS DOUBLE)
  END AS {out_col}
FROM r
"""


# --------------------------------------------------------------------------
# Cochran–Armitage trend test
# --------------------------------------------------------------------------


def cochran_armitage(
    df: DataFrame,
    score_col: str,
    success_col,
    group_columns,
) -> DataFrame:
    """Cochran–Armitage test for a linear trend in proportions across
    ORDERED categories — the dose-response test: χ² asks "are the
    rates different at all?", this asks "do they rise (or fall)
    MONOTONICALLY with the ordered score?" (conversion by cohort age,
    defect rate by machine wear bucket, severity by exposure level).
    ``score_col`` is the integer category score, ``success_col`` a
    boolean/0-1 outcome.

        T = Σ tᵢyᵢ − p̄·Σ tᵢ,   p̄ = R/N
        Var = p̄(1−p̄)·(Σ tᵢ² − (Σ tᵢ)²/N)
        z = T/√Var,  two-sided p via the engine p-value kernel

    ONE map-combinable aggregation of five exact integer sufficient
    statistics (N, R, Σt, Σt², Σty — DECIMAL accumulators), then a
    fixed double tree.  No windows, no joins; the cheapest test in the
    battery.

    Returns (groups…, n, n_success, z_stat, p_value, reject_05).
    """
    from timeseriesutils_spark.operators.nonparam import two_sided_p_expr

    g = _as_list(group_columns)
    lab = (
        F.col(success_col) if isinstance(success_col, str) else success_col
    )
    t = F.col(score_col).cast("bigint")
    y = lab.cast("boolean").cast("bigint")
    d = df.filter(
        F.col(score_col).isNotNull() & lab.isNotNull()
    ).select(*g, t.alias("_t"), y.alias("_y"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = d.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_y").alias("n_success"),
        F.sum(dec(F.col("_t"))).alias("_st"),
        F.sum(dec(F.col("_t") * F.col("_t"))).alias("_stt"),
        F.sum(dec(F.col("_t") * F.col("_y"))).alias("_sty"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    r = F.col("n_success").cast("double")
    pbar = r / nn
    tt = s2d("_st")
    tstat = s2d("_sty") - pbar * tt
    var = pbar * (F.lit(1.0) - pbar) * (s2d("_stt") - tt * tt / nn)
    ok = (F.col("n") > 1) & (var > 0)
    z = tstat / F.sqrt(var)
    p = two_sided_p_expr(z)
    return agg.select(
        *g,
        "n",
        "n_success",
        F.when(ok, z).alias("z_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def cochran_armitage_sql(
    data_sql: str,
    score_col: str,
    success_sql: str,
    group_columns,
) -> str:
    """DuckDB twin of :func:`cochran_armitage` (``success_sql`` is the
    boolean outcome expression)."""
    from timeseriesutils_spark.operators.nonparam import two_sided_p_sql

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    r = "CAST(n_success AS DOUBLE)"
    pbar = f"({r} / {nn})"
    tt = s2d("_st")
    tstat = f"({s2d('_sty')} - {pbar} * {tt})"
    var = f"({pbar} * (1.0 - {pbar}) * ({s2d('_stt')} - {tt} * {tt} / {nn}))"
    z = f"({tstat} / SQRT({var}))"
    p = two_sided_p_sql(z)
    ok = f"n > 1 AND {var} > 0"
    return f"""
WITH d AS (
  SELECT {gsel}, CAST({score_col} AS BIGINT) AS _t,
    CAST(CAST({success_sql} AS BOOLEAN) AS BIGINT) AS _y
  FROM ({data_sql})
  WHERE {score_col} IS NOT NULL AND ({success_sql}) IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    CAST(SUM(_y) AS BIGINT) AS n_success,
    SUM(CAST(_t AS DECIMAL(38,0))) AS _st,
    SUM(CAST(_t * _t AS DECIMAL(38,0))) AS _stt,
    SUM(CAST(_t * _y AS DECIMAL(38,0))) AS _sty
  FROM d GROUP BY {gsel}
)
SELECT {gsel}, n, n_success,
  CASE WHEN {ok} THEN {z} END AS z_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Jarque–Bera normality test
# --------------------------------------------------------------------------


def jarque_bera(
    df: DataFrame,
    value_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Jarque–Bera normality test — the gatekeeper for every
    z/t-flavored test in the engine (welch_ttest, diebold_mariano,
    grouped OLS): are the residuals even CLOSE to normal, or do skew
    and fat tails invalidate the normal-theory p-values?

        S = m3/m2^1.5,  K = m4/m2² − 3,  JB = n/6·(S² + K²/4)
        p = exp(−JB/2)          (χ²₂ survival — exact closed form)

    ONE aggregation: raw power sums Σq..Σq⁴ of the quantized values,
    exact through DECIMAL (q² stays BIGINT; q³/q⁴ are DECIMAL(19,0)
    products so a 1e7-unit value still fits 1e28 in DECIMAL(38,0)).
    Central moments come from the power sums in one shared double
    tree; S and K are scale-invariant so the quantization grid
    cancels.  p is floor-quantized at 1e-9 (engine convention).

    Returns (groups…, n, skewness, kurtosis_excess, jb_stat, p_value,
    reject_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(F.col(value_col).isNotNull()).select(
        *groups, q.alias("_q"), (q * q).alias("_q2")
    )
    dec19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    agg = d.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_q").cast("decimal(38,0)")).alias("_s1"),
        F.sum(F.col("_q2").cast("decimal(38,0)")).alias("_s2"),
        F.sum(dec19(F.col("_q2")) * dec19(F.col("_q"))).alias("_s3"),
        F.sum(dec19(F.col("_q2")) * dec19(F.col("_q2"))).alias("_s4"),
    )
    nn = F.col("n").cast("double")
    s1 = F.col("_s1").cast("string").cast("double")
    s2 = F.col("_s2").cast("string").cast("double")
    s3 = F.col("_s3").cast("string").cast("double")
    s4 = F.col("_s4").cast("string").cast("double")
    mean = s1 / nn
    m2 = s2 / nn - mean * mean
    m3 = s3 / nn - F.lit(3.0) * mean * (s2 / nn) + F.lit(2.0) * mean * mean * mean
    m4 = (
        s4 / nn
        - F.lit(4.0) * mean * (s3 / nn)
        + F.lit(6.0) * mean * mean * (s2 / nn)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurtx = m4 / (m2 * m2) - F.lit(3.0)
    jb = (nn / F.lit(6.0)) * (
        skew * skew + (kurtx * kurtx) / F.lit(4.0)
    )
    praw = F.exp(-jb / F.lit(2.0))
    p = F.floor(praw * F.lit(1.0e9) + F.lit(0.5)) / F.lit(1.0e9)
    ok = (F.col("n") > 3) & (m2 > 0)
    return agg.select(
        *groups,
        "n",
        F.when(ok, skew).alias("skewness"),
        F.when(ok, kurtx).alias("kurtosis_excess"),
        F.when(ok, jb).alias("jb_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def jarque_bera_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`jarque_bera` (same double tree)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = (
        f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    )
    vd = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    s1, s2, s3, s4 = vd("_s1"), vd("_s2"), vd("_s3"), vd("_s4")
    mean = f"({s1} / {nn})"
    m2 = f"({s2} / {nn} - {mean} * {mean})"
    m3 = (
        f"({s3} / {nn} - 3.0 * {mean} * ({s2} / {nn})"
        f" + 2.0 * {mean} * {mean} * {mean})"
    )
    m4 = (
        f"({s4} / {nn} - 4.0 * {mean} * ({s3} / {nn})"
        f" + 6.0 * {mean} * {mean} * ({s2} / {nn})"
        f" - 3.0 * {mean} * {mean} * {mean} * {mean})"
    )
    skew = f"({m3} / ({m2} * SQRT({m2})))"
    kurtx = f"({m4} / ({m2} * {m2}) - 3.0)"
    jb = f"(({nn} / 6.0) * ({skew} * {skew} + ({kurtx} * {kurtx}) / 4.0))"
    p = f"(FLOOR(EXP(-{jb} / 2.0) * 1000000000.0 + 0.5) / 1000000000.0)"
    ok = f"n > 3 AND {m2} > 0"
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q, {qq} * {qq} AS _q2
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_q AS DECIMAL(38,0))) AS _s1,
    SUM(CAST(_q2 AS DECIMAL(38,0))) AS _s2,
    SUM(CAST(_q2 AS DECIMAL(19,0)) * CAST(_q AS DECIMAL(19,0))) AS _s3,
    SUM(CAST(_q2 AS DECIMAL(19,0)) * CAST(_q2 AS DECIMAL(19,0))) AS _s4
  FROM d GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN {ok} THEN {skew} END AS skewness,
  CASE WHEN {ok} THEN {kurtx} END AS kurtosis_excess,
  CASE WHEN {ok} THEN {jb} END AS jb_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Brown–Forsythe Levene test (variance homogeneity)
# --------------------------------------------------------------------------


def levene_bf(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group Brown–Forsythe Levene test: do the levels of
    ``factor_col`` have the SAME SPREAD of ``value_col``?  The
    variance-homogeneity gate in front of anova_oneway (whose F
    assumes equal variances) — and a drift test in its own right
    (ks_test asks "same shape?", this asks "same dispersion?",
    robust to location shifts by centering on the MEDIAN, the
    Brown–Forsythe variant that survives heavy tails).

        z_ij = |x_ij − med_j|,  F = anova_oneway(z) over levels

    One scan: the per-level median comes from an exact interpolated
    percentile WINDOW over the quantized values (both engines define
    quantile_cont at (n−1)·p, so the even-n midpoint average is the
    same exact dyadic double), doubled into exact integers
    (z2 = |2q − 2·med| ∈ ℕ), then the anova sufficient-stats identity
    runs per (group, level) and reduces k rows — F is scale-invariant
    so the doubling cancels.  No joins, no second pass.

    Returns (groups…, k_levels, n, f_stat, df1, df2).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(
        F.col(value_col).isNotNull() & F.col(factor_col).isNotNull()
    ).select(*groups, F.col(factor_col).alias("_lvl"), q.alias("_q"))
    wl = Window.partitionBy(*groups, "_lvl")
    med2 = F.expr("percentile(_q, 0.5)").over(wl) * F.lit(2.0)
    z2 = F.abs(F.col("_q") * F.lit(2) - med2.cast("bigint"))
    zd = d.select(*groups, "_lvl", z2.alias("_z"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per = zd.groupBy(*groups, "_lvl").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec(F.col("_z"))).alias("_s"),
        F.sum(dec(F.col("_z") * F.col("_z"))).alias("_ss"),
    )
    # per-level Σz²/n floored as EXACT integer arithmetic: DECIMAL
    # square + integral division (`div`, truncation == floor for
    # positives).  The previous floor-in-double + cast-to-DECIMAL
    # breaks above 2^53: Spark's double→DECIMAL cast routes through
    # the shortest decimal repr (BigDecimal.valueOf) while DuckDB
    # converts the exact binary value — a sum of doubled cents over
    # ~90k rows squares past 2^53 and the two engines disagreed by a
    # few units (caught at sf0.1, round 8).  sg² ≤ 1e30 fits
    # DECIMAL(38,0)/HUGEINT; the quotient ≤ ~1e18 fits the BIGINT
    # that Spark's `div` returns.
    t_g = F.expr(
        "(CAST(_s AS DECIMAL(19,0)) * CAST(_s AS DECIMAL(19,0))) div _n"
    )
    top = per.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("k_levels"),
        F.sum("_n").alias("n"),
        F.sum(dec(F.col("_s"))).alias("_st"),
        F.sum(dec(t_g)).alias("_sb_raw"),
        (F.sum(dec(F.col("_ss"))) - F.sum(dec(t_g))).alias("_ssw_q"),
    )
    nn = F.col("n").cast("double")
    st = F.col("_st").cast("string").cast("double")
    ssb = F.col("_sb_raw").cast("string").cast("double") - st * st / nn
    ssw = F.col("_ssw_q").cast("string").cast("double")
    kk = F.col("k_levels").cast("double")
    ok = (F.col("k_levels") > 1) & (F.col("n") > F.col("k_levels")) & (ssw != 0)
    f_stat = (ssb / (kk - F.lit(1.0))) / (ssw / (nn - kk))
    return top.select(
        *groups,
        "k_levels",
        "n",
        F.when(ok, f_stat).alias("f_stat"),
        (F.col("k_levels") - 1).alias("df1"),
        (F.col("n") - F.col("k_levels")).alias("df2"),
    )


def levene_bf_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`levene_bf` (same double tree)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    wl = f"(PARTITION BY {gsel}, _lvl)"
    vd = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    st = vd("_st")
    ssb = f"({vd('_sb_raw')} - {st} * {st} / {nn})"
    ssw = vd("_ssw_q")
    kk = "CAST(k_levels AS DOUBLE)"
    ok = f"k_levels > 1 AND n > k_levels AND {ssw} <> 0"
    f_stat = f"(({ssb} / ({kk} - 1.0)) / ({ssw} / ({nn} - {kk})))"
    return f"""
WITH d AS (
  SELECT {gsel}, {factor_col} AS _lvl, {qq} AS _q
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL AND {factor_col} IS NOT NULL
),
zd AS (
  SELECT {gsel}, _lvl,
    ABS(_q * 2 - CAST(quantile_cont(_q, 0.5) OVER {wl} * 2.0 AS BIGINT))
      AS _z
  FROM d
),
per AS (
  SELECT {gsel}, _lvl, COUNT(*) AS _n,
    SUM(CAST(_z AS DECIMAL(38,0))) AS _s,
    SUM(CAST(_z * _z AS DECIMAL(38,0))) AS _ss
  FROM zd GROUP BY {gsel}, _lvl
),
top AS (
  -- Σz²/n floored via exact HUGEINT integer division (the Spark side
  -- uses DECIMAL `div`): flooring a >2^53 double then casting to
  -- DECIMAL diverges between engines (shortest-repr vs exact-binary
  -- conversion)
  SELECT {gsel}, COUNT(*) AS k_levels, CAST(SUM(_n) AS BIGINT) AS n,
    SUM(CAST(_s AS DECIMAL(38,0))) AS _st,
    SUM(CAST(CAST(_s AS HUGEINT) * CAST(_s AS HUGEINT)
        // CAST(_n AS HUGEINT) AS DECIMAL(38,0))) AS _sb_raw,
    SUM(CAST(_ss AS DECIMAL(38,0)))
      - SUM(CAST(CAST(_s AS HUGEINT) * CAST(_s AS HUGEINT)
          // CAST(_n AS HUGEINT) AS DECIMAL(38,0))) AS _ssw_q
  FROM per GROUP BY {gsel}
)
SELECT {gsel}, k_levels, n,
  CASE WHEN {ok} THEN {f_stat} END AS f_stat,
  k_levels - 1 AS df1,
  n - k_levels AS df2
FROM top
"""


# --------------------------------------------------------------------------
# McNemar paired-flag test
# --------------------------------------------------------------------------


def mcnemar_test(
    df: DataFrame,
    flag_a,
    flag_b,
    group_columns,
) -> DataFrame:
    """Per-group McNemar test on PAIRED binary flags: do two detectors
    (rules, classifiers, labelers) applied to the SAME rows disagree
    symmetrically, or is one systematically stricter?  The paired
    counterpart of the two-proportion z-test — only the DISCORDANT
    pairs carry information:

        b = #(a ∧ ¬b),  c = #(¬a ∧ b)
        χ²₁ = (|b − c| − 1)² / (b + c)      (continuity-corrected)
        p   = two-sided engine kernel on z = √χ²₁

    ``flag_a`` / ``flag_b`` may be column names or boolean Column
    expressions.  ONE map-combinable aggregation of exact integer
    counts; the χ²/z/p chain is one shared double tree.  Rows where
    either flag is NULL are dropped (complete-case discipline).

    Returns (groups…, n, n_a_only, n_b_only, chi2_stat, p_value,
    reject_05).
    """
    from timeseriesutils_spark.operators.nonparam import two_sided_p_expr

    groups = _as_list(group_columns)
    a = F.col(flag_a) if isinstance(flag_a, str) else flag_a
    b = F.col(flag_b) if isinstance(flag_b, str) else flag_b
    d = df.select(*groups, a.alias("_a"), b.alias("_b")).filter(
        F.col("_a").isNotNull() & F.col("_b").isNotNull()
    )
    agg = d.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("_a") & ~F.col("_b")).cast("bigint")).alias("n_a_only"),
        F.sum((~F.col("_a") & F.col("_b")).cast("bigint")).alias("n_b_only"),
    )
    bd = F.col("n_a_only").cast("double")
    cd = F.col("n_b_only").cast("double")
    num = F.greatest(F.abs(bd - cd) - F.lit(1.0), F.lit(0.0))
    chi2 = (num * num) / (bd + cd)
    z = F.sqrt(chi2)
    p = two_sided_p_expr(z)
    ok = (F.col("n_a_only") + F.col("n_b_only")) > 0
    return agg.select(
        *groups,
        "n",
        "n_a_only",
        "n_b_only",
        F.when(ok, chi2).alias("chi2_stat"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def mcnemar_test_sql(
    data_sql: str,
    flag_a_sql: str,
    flag_b_sql: str,
    group_columns,
) -> str:
    """DuckDB twin of :func:`mcnemar_test` (same double tree)."""
    from timeseriesutils_spark.operators.nonparam import two_sided_p_sql

    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    bd = "CAST(n_a_only AS DOUBLE)"
    cd = "CAST(n_b_only AS DOUBLE)"
    num = f"GREATEST(ABS({bd} - {cd}) - 1.0, 0.0)"
    chi2 = f"(({num}) * ({num}) / ({bd} + {cd}))"
    z = f"SQRT({chi2})"
    p = two_sided_p_sql(z)
    ok = "n_a_only + n_b_only > 0"
    return f"""
WITH d AS (
  SELECT {gsel},
    CAST({flag_a_sql} AS BOOLEAN) AS _a,
    CAST({flag_b_sql} AS BOOLEAN) AS _b
  FROM ({data_sql})
  WHERE ({flag_a_sql}) IS NOT NULL AND ({flag_b_sql}) IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    CAST(SUM(CAST(_a AND NOT _b AS BIGINT)) AS BIGINT) AS n_a_only,
    CAST(SUM(CAST(NOT _a AND _b AS BIGINT)) AS BIGINT) AS n_b_only
  FROM d GROUP BY {gsel}
)
SELECT {gsel}, n, n_a_only, n_b_only,
  CASE WHEN {ok} THEN {chi2} END AS chi2_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# Cohen's kappa (inter-annotator agreement)
# --------------------------------------------------------------------------


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group_columns,
) -> DataFrame:
    """Per-group Cohen's kappa between two categorical labelings of
    the SAME rows — the chance-corrected agreement score behind every
    labeling-QA loop (human vs model labels, declared vs detected
    language, two classifier generations):

        κ = (p_o − p_e) / (1 − p_e)
          = (N·Σ_k d_k − Σ_k r_k c_k) / (N² − Σ_k r_k c_k)

    with d_k the diagonal counts, r_k/c_k the row/column marginals.
    Exact integer sufficient statistics end to end: one (a,b) count
    aggregation, two marginal rollups joined on the label, and the
    κ ratio is the ONLY double (r·c sums run through DECIMAL so N up
    to ~1e18 cannot wrap).  NULL labels drop (complete-case).

    Returns (groups…, n, p_observed, p_expected, kappa).
    """
    groups = _as_list(group_columns)
    d = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    ).select(
        *groups,
        F.col(rater_a).cast("string").alias("_la"),
        F.col(rater_b).cast("string").alias("_lb"),
    )
    from timeseriesutils_spark.functions.cache import pin

    # cells (groups × labels² rows) feeds three consumers (row
    # marginals, column marginals, diagonal base) — pin it or each
    # branch re-runs the full scan+count (the decompose fork lesson)
    cells = pin(
        d.groupBy(*groups, "_la", "_lb").agg(F.count(F.lit(1)).alias("_c"))
    )
    rows = cells.groupBy(*groups, F.col("_la").alias("_lbl")).agg(
        F.sum("_c").alias("_rn")
    )
    cols = cells.groupBy(*groups, F.col("_lb").alias("_lbl")).agg(
        F.sum("_c").alias("_cn")
    )
    marg = rows.join(cols, [*groups, "_lbl"], "full_outer").select(
        *groups,
        (
            F.coalesce(F.col("_rn"), F.lit(0)).cast("decimal(19,0)")
            * F.coalesce(F.col("_cn"), F.lit(0)).cast("decimal(19,0)")
        ).alias("_rc"),
    )
    rc = marg.groupBy(*groups).agg(F.sum("_rc").alias("_src"))
    base = cells.groupBy(*groups).agg(
        F.sum("_c").alias("n"),
        F.sum(F.when(F.col("_la") == F.col("_lb"), F.col("_c"))).alias("_diag"),
    )
    out = base.join(rc, groups, "inner")
    nn = F.col("n").cast("double")
    diag = F.coalesce(F.col("_diag"), F.lit(0)).cast("double")
    src = F.col("_src").cast("string").cast("double")
    po = diag / nn
    pe = src / (nn * nn)
    ok = (F.col("n") > 0) & (pe != F.lit(1.0))
    kappa = (po - pe) / (F.lit(1.0) - pe)
    return out.select(
        *groups,
        "n",
        F.when(F.col("n") > 0, po).alias("p_observed"),
        F.when(F.col("n") > 0, pe).alias("p_expected"),
        F.when(ok, kappa).alias("kappa"),
    )


def cohens_kappa_sql(
    data_sql: str,
    rater_a_sql: str,
    rater_b_sql: str,
    group_columns,
) -> str:
    """DuckDB twin of :func:`cohens_kappa` (same double tree)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    nn = "CAST(n AS DOUBLE)"
    diag = "CAST(COALESCE(_diag, 0) AS DOUBLE)"
    src = "CAST(CAST(_src AS VARCHAR) AS DOUBLE)"
    po = f"({diag} / {nn})"
    pe = f"({src} / ({nn} * {nn}))"
    kappa = f"(({po} - {pe}) / (1.0 - {pe}))"
    return f"""
WITH d AS (
  SELECT {gsel},
    CAST({rater_a_sql} AS VARCHAR) AS _la,
    CAST({rater_b_sql} AS VARCHAR) AS _lb
  FROM ({data_sql})
  WHERE ({rater_a_sql}) IS NOT NULL AND ({rater_b_sql}) IS NOT NULL
),
cells AS (
  SELECT {gsel}, _la, _lb, COUNT(*) AS _c
  FROM d GROUP BY {gsel}, _la, _lb
),
rws AS (
  SELECT {gsel}, _la AS _lbl, CAST(SUM(_c) AS BIGINT) AS _rn
  FROM cells GROUP BY {gsel}, _la
),
cls AS (
  SELECT {gsel}, _lb AS _lbl, CAST(SUM(_c) AS BIGINT) AS _cn
  FROM cells GROUP BY {gsel}, _lb
),
marg AS (
  SELECT COALESCE(rws.{groups[0]}, cls.{groups[0]}) AS {groups[0]},
    {"".join(f"COALESCE(rws.{c}, cls.{c}) AS {c}, " for c in groups[1:])}
    CAST(COALESCE(_rn, 0) AS DECIMAL(19,0))
      * CAST(COALESCE(_cn, 0) AS DECIMAL(19,0)) AS _rc
  FROM rws FULL OUTER JOIN cls
    ON {" AND ".join(f"rws.{c} = cls.{c}" for c in groups)}
      AND rws._lbl = cls._lbl
),
rc AS (
  SELECT {gsel}, SUM(_rc) AS _src FROM marg GROUP BY {gsel}
),
base AS (
  SELECT {gsel}, CAST(SUM(_c) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN _la = _lb THEN _c END) AS BIGINT) AS _diag
  FROM cells GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN n > 0 THEN {po} END AS p_observed,
  CASE WHEN n > 0 THEN {pe} END AS p_expected,
  CASE WHEN n > 0 AND {pe} <> 1.0 THEN {kappa} END AS kappa
FROM base JOIN rc USING ({gsel})
"""


# --------------------------------------------------------------------------
# Bartlett variance-homogeneity test
# --------------------------------------------------------------------------


def bartlett_test(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    group_columns,
    scale: int = 0,
) -> DataFrame:
    """Per-group Bartlett test: do the ``factor_col`` levels share ONE
    variance?  The parametric (normal-theory) counterpart of
    :func:`levene_bf` — more powerful when the data really are normal,
    famously sensitive when they are not (run jarque_bera first; keep
    levene_bf for heavy tails):

        χ² = [(N−k)·ln S_p² − Σ_i (n_i−1)·ln S_i²] / C
        C  = 1 + (Σ_i 1/(n_i−1) − 1/(N−k)) / (3(k−1))

    Exactness: per-level variances come from the EXACT integer
    ssn_i = n_i·Σq² − (Σq)² (DECIMAL products, the >2⁵³-safe route);
    the pooled numerator Σ ssn_i/n_i uses exact integer division
    (`div`, the levene_bf rule) so the cross-level sums are
    order-free; each ln is 1e-9-floor-quantized and every cross-level
    double term is quantized to integer units before its DECIMAL sum.
    p comes from the Wilson–Hilferty χ² kernel (nonparam.chi2_sf).

    Envelope (documented): the integer quotient ssn_i/n_i must fit
    BIGINT — quantize coarsely for huge magnitudes (default scale=0;
    cents-scale data at ~1e5 rows/level needs value·10^scale ≤ ~1e5).

    Returns (groups…, k_levels, n, chi2_stat, df, p_value, reject_05).
    """
    from timeseriesutils_spark.operators.nonparam import chi2_sf_expr

    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(
        F.col(value_col).isNotNull() & F.col(factor_col).isNotNull()
    ).select(*groups, F.col(factor_col).alias("_lvl"), q.alias("_q"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dec19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    per = d.groupBy(*groups, "_lvl").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec(F.col("_q"))).alias("_s"),
        F.sum(dec19(F.col("_q")) * dec19(F.col("_q"))).alias("_ss"),
    )
    # exact ssn = n·Σq² − (Σq)²; per-level variance S² = ssn/(n(n−1))
    ssn = F.expr(
        "CAST(_n AS DECIMAL(19,0)) * _ss"
        " - CAST(_s AS DECIMAL(19,0)) * CAST(_s AS DECIMAL(19,0))"
    )
    lvl = per.filter(F.col("_n") > 1).select(
        *groups,
        "_n",
        ssn.alias("_ssn"),
        F.expr(
            "(CAST(_n AS DECIMAL(19,0)) * _ss"
            " - CAST(_s AS DECIMAL(19,0)) * CAST(_s AS DECIMAL(19,0)))"
            " div _n"
        ).alias("_ssn_div_n"),
    )
    nn1 = (F.col("_n") - 1).cast("double")
    s2 = F.col("_ssn").cast("string").cast("double") / (
        F.col("_n").cast("double") * nn1
    )
    ln_s2 = F.floor(F.log(s2) * F.lit(1.0e9) + F.lit(0.5)) / F.lit(1.0e9)
    # cross-level sums: quantize each double term to integer units
    # before the DECIMAL reduce (order-free)
    t_ln = F.floor(nn1 * ln_s2 * F.lit(1.0e6) + F.lit(0.5))
    t_inv = F.floor(F.lit(1.0e15) / nn1 + F.lit(0.5))
    top = lvl.filter(s2 > 0).groupBy(*groups).agg(
        F.count(F.lit(1)).alias("k_levels"),
        F.sum("_n").alias("n"),
        F.sum(dec(F.col("_ssn_div_n"))).alias("_sp_num"),
        F.sum(dec(t_ln)).alias("_sln"),
        F.sum(dec(t_inv)).alias("_sinv"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k_levels").cast("double")
    nk = nd - kd
    sp2 = F.col("_sp_num").cast("string").cast("double") / nk
    ln_sp2 = F.floor(F.log(sp2) * F.lit(1.0e9) + F.lit(0.5)) / F.lit(1.0e9)
    sum_ln = F.col("_sln").cast("string").cast("double") / F.lit(1.0e6)
    sum_inv = F.col("_sinv").cast("string").cast("double") / F.lit(1.0e15)
    c = F.lit(1.0) + (sum_inv - F.lit(1.0) / nk) / (
        F.lit(3.0) * (kd - F.lit(1.0))
    )
    chi2 = (nk * ln_sp2 - sum_ln) / c
    chi2 = F.greatest(chi2, F.lit(0.0))
    dfree = F.col("k_levels") - 1
    p = chi2_sf_expr(chi2, dfree)
    ok = (F.col("k_levels") > 1) & (sp2 > 0)
    return top.select(
        *groups,
        "k_levels",
        "n",
        F.when(ok, chi2).alias("chi2_stat"),
        dfree.alias("df"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def bartlett_test_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    group_columns,
    scale: int = 0,
) -> str:
    """DuckDB twin of :func:`bartlett_test` (same quantize points,
    HUGEINT integer division for the pooled numerator)."""
    from timeseriesutils_spark.operators.nonparam import chi2_sf_sql

    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    ssn = (
        "(CAST(_n AS HUGEINT) * CAST(_ss AS HUGEINT)"
        " - CAST(_s AS HUGEINT) * CAST(_s AS HUGEINT))"
    )
    nn1 = "CAST(_n - 1 AS DOUBLE)"
    s2 = (
        f"(CAST(CAST(_ssn AS VARCHAR) AS DOUBLE)"
        f" / (CAST(_n AS DOUBLE) * {nn1}))"
    )
    ln_s2 = f"(FLOOR(LN({s2}) * 1000000000.0 + 0.5) / 1000000000.0)"
    t_ln = f"FLOOR({nn1} * {ln_s2} * 1000000.0 + 0.5)"
    t_inv = f"FLOOR(1000000000000000.0 / {nn1} + 0.5)"
    nd = "CAST(n AS DOUBLE)"
    kd = "CAST(k_levels AS DOUBLE)"
    nk = f"({nd} - {kd})"
    sp2 = f"(CAST(CAST(_sp_num AS VARCHAR) AS DOUBLE) / {nk})"
    ln_sp2 = f"(FLOOR(LN({sp2}) * 1000000000.0 + 0.5) / 1000000000.0)"
    sum_ln = "(CAST(CAST(_sln AS VARCHAR) AS DOUBLE) / 1000000.0)"
    sum_inv = "(CAST(CAST(_sinv AS VARCHAR) AS DOUBLE) / 1000000000000000.0)"
    c = f"(1.0 + ({sum_inv} - 1.0 / {nk}) / (3.0 * ({kd} - 1.0)))"
    chi2 = f"GREATEST((({nk} * {ln_sp2} - {sum_ln}) / {c}), 0.0)"
    p = chi2_sf_sql(chi2, "(k_levels - 1)")
    ok = f"k_levels > 1 AND {sp2} > 0"
    return f"""
WITH d AS (
  SELECT {gsel}, {factor_col} AS _lvl, {qq} AS _q
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL AND {factor_col} IS NOT NULL
),
per AS (
  SELECT {gsel}, _lvl, COUNT(*) AS _n,
    SUM(CAST(_q AS DECIMAL(38,0))) AS _s,
    SUM(CAST(_q AS DECIMAL(19,0)) * CAST(_q AS DECIMAL(19,0))) AS _ss
  FROM d GROUP BY {gsel}, _lvl
),
lvl AS (
  SELECT {gsel}, _n, {ssn} AS _ssn,
    {ssn} // CAST(_n AS HUGEINT) AS _ssn_div_n
  FROM per WHERE _n > 1
),
top AS (
  SELECT {gsel}, COUNT(*) AS k_levels, CAST(SUM(_n) AS BIGINT) AS n,
    SUM(CAST(_ssn_div_n AS DECIMAL(38,0))) AS _sp_num,
    SUM(CAST({t_ln} AS DECIMAL(38,0))) AS _sln,
    SUM(CAST({t_inv} AS DECIMAL(38,0))) AS _sinv
  FROM lvl WHERE {s2} > 0 GROUP BY {gsel}
)
SELECT {gsel}, k_levels, n,
  CASE WHEN {ok} THEN {chi2} END AS chi2_stat,
  k_levels - 1 AS df,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM top
"""


# --------------------------------------------------------------------------
# paired t-test
# --------------------------------------------------------------------------


def paired_ttest(
    df: DataFrame,
    a_col: str,
    b_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group paired t-test on matched observations — welch_ttest's
    within-subject sibling (welch compares two INDEPENDENT arms; the
    paired design differences out per-subject variation first, which
    is why A/B-on-the-same-entities analyses use it):

        d_i = a_i − b_i,   t = d̄ / (s_d / √n),   df = n − 1

    Complete-case pairs (both sides non-null).  Differences quantize
    to 10^-scale ints; (n, Σd, Σd²) run through DECIMAL — the same
    exact-sufficient-statistics pass as welch_ttest, one
    map-combinable aggregation.  p uses the engine-pinned normal
    kernel (nonparam.two_sided_p_expr — documented normal
    approximation of the t reference, adequate at the corpus sizes
    this targets; df is emitted so a caller can apply an exact t
    correction off-engine).

    Returns (groups…, n, mean_diff, sd_diff, t_stat, df, p_value,
    reject_05).
    """
    from timeseriesutils_spark.operators.nonparam import two_sided_p_expr
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    m = 10**scale
    d_ = (
        F.col(a_col).cast("double") - F.col(b_col).cast("double")
    )
    q = F.floor(d_ * F.lit(float(m)) + F.lit(0.5)).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    dec19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    rows = df.filter(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    ).select(*g, q.alias("_d"))
    agg = rows.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_d"))).alias("_s"),
        F.sum(dec19(F.col("_d")) * dec19(F.col("_d"))).alias("_ss"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    mf = F.lit(float(m))
    nn = F.col("n").cast("double")
    mean = s2d("_s") / mf / nn
    # exact ssn = n·Σd² − (Σd)² in DECIMAL, variance = ssn/(n(n−1))
    ssn = F.expr(
        "CAST(n AS DECIMAL(19,0)) * _ss"
        " - CAST(_s AS DECIMAL(19,0)) * CAST(_s AS DECIMAL(19,0))"
    )
    var = ssn.cast("string").cast("double") / (mf * mf) / (
        nn * (nn - F.lit(1.0))
    )
    sd = F.sqrt(var)
    t = mean / (sd / F.sqrt(nn))
    p = two_sided_p_expr(t)
    ok = (F.col("n") > 1) & (var > 0)
    return agg.select(
        *g,
        "n",
        F.when(F.col("n") > 0, mean).alias("mean_diff"),
        F.when(ok, sd).alias("sd_diff"),
        F.when(ok, t).alias("t_stat"),
        (F.col("n") - 1).alias("df"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def paired_ttest_sql(
    data_sql: str,
    a_col: str,
    b_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`paired_ttest` (same exact sums, same
    p kernel)."""
    from timeseriesutils_spark.operators.nonparam import two_sided_p_sql
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    mf = f"{float(m)!r}"
    qq = (
        f"CAST(FLOOR((CAST({a_col} AS DOUBLE) - CAST({b_col} AS DOUBLE))"
        f" * {mf} + 0.5) AS BIGINT)"
    )
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    mean = f"({s2d('_s')} / {mf} / {nn})"
    ssn = (
        "(CAST(n AS DECIMAL(19,0)) * _ss"
        " - CAST(_s AS DECIMAL(19,0)) * CAST(_s AS DECIMAL(19,0)))"
    )
    var = f"({s2d(ssn)} / ({mf} * {mf}) / ({nn} * ({nn} - 1.0)))"
    sd = f"SQRT({var})"
    t = f"({mean} / ({sd} / SQRT({nn})))"
    p = two_sided_p_sql(t)
    ok = f"(n > 1 AND {var} > 0)"
    return f"""
WITH rows_ AS (
  SELECT {gsel}, {qq} AS _d
  FROM ({data_sql})
  WHERE {a_col} IS NOT NULL AND {b_col} IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_d AS DECIMAL(38,0))) AS _s,
    SUM(CAST(_d AS DECIMAL(19,0)) * CAST(_d AS DECIMAL(19,0))) AS _ss
  FROM rows_ GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN n > 0 THEN {mean} END AS mean_diff,
  CASE WHEN {ok} THEN {sd} END AS sd_diff,
  CASE WHEN {ok} THEN {t} END AS t_stat,
  n - 1 AS df,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# chi-square goodness-of-fit (uniformity screen)
# --------------------------------------------------------------------------


def chi2_gof(
    df: DataFrame,
    category_col: str,
    group_columns,
) -> DataFrame:
    """Per-group χ² goodness-of-fit of a categorical column against the
    UNIFORM null — the balance screen for hash splits, shard
    assignments, and round-robin routing (benford_audit is the
    non-uniform-null sibling with per-digit contributions;
    categorical_assoc tests independence between TWO columns; this
    asks one column "are your levels equally likely?"):

        χ² = Σ_c (O_c − N/C)² / (N/C)  =  C·ΣO² / N − N

    — the right-hand identity keeps everything EXACT: O_c and ΣO² are
    exact integers (DECIMAL products), so χ² is one double expression
    of exact sums with no per-category rounding.  df = C − 1; p from
    the Wilson–Hilferty kernel (engine-pinned).  Plan: one count
    collapse + one k-row rollup.

    Returns (groups…, n, n_categories, chi2_stat, df, p_value,
    reject_05).
    """
    from timeseriesutils_spark.operators.nonparam import chi2_sf_expr
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    d = df.filter(F.col(category_col).isNotNull()).select(
        *g, F.col(category_col).cast("string").alias("_c")
    )
    per = d.groupBy(*g, "_c").agg(F.count(F.lit(1)).alias("_o"))
    dec19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    agg = per.groupBy(*g).agg(
        F.sum("_o").alias("n"),
        F.count(F.lit(1)).alias("n_categories"),
        F.sum(dec19(F.col("_o")) * dec19(F.col("_o"))).alias("_oo"),
    )
    nn = F.col("n").cast("double")
    cc = F.col("n_categories").cast("double")
    chi2 = cc * F.col("_oo").cast("string").cast("double") / nn - nn
    dof = (F.col("n_categories") - 1).cast("double")
    p = chi2_sf_expr(chi2, dof)
    ok = F.col("n_categories") > 1
    return agg.select(
        *g,
        "n",
        "n_categories",
        F.when(ok, chi2).alias("chi2_stat"),
        (F.col("n_categories") - 1).alias("df"),
        F.when(ok, p).alias("p_value"),
        F.when(ok, p < F.lit(0.05)).alias("reject_05"),
    )


def chi2_gof_sql(
    data_sql: str,
    category_col: str,
    group_columns,
) -> str:
    """DuckDB twin of :func:`chi2_gof` (same exact-integer identity,
    same χ² kernel)."""
    from timeseriesutils_spark.operators.nonparam import chi2_sf_sql
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    chi2 = (
        f"(CAST(n_categories AS DOUBLE) * {s2d('_oo')} / {nn} - {nn})"
    )
    p = chi2_sf_sql(chi2, "CAST(n_categories - 1 AS DOUBLE)")
    return f"""
WITH per AS (
  SELECT {gsel}, CAST({category_col} AS VARCHAR) AS _c, COUNT(*) AS _o
  FROM ({data_sql}) WHERE {category_col} IS NOT NULL
  GROUP BY {gsel}, _c
),
agg AS (
  SELECT {gsel},
    CAST(SUM(_o) AS BIGINT) AS n,
    COUNT(*) AS n_categories,
    SUM(CAST(_o AS DECIMAL(19,0)) * CAST(_o AS DECIMAL(19,0))) AS _oo
  FROM per GROUP BY {gsel}
)
SELECT {gsel}, n, n_categories,
  CASE WHEN n_categories > 1 THEN {chi2} END AS chi2_stat,
  n_categories - 1 AS df,
  CASE WHEN n_categories > 1 THEN {p} END AS p_value,
  CASE WHEN n_categories > 1 THEN {p} < 0.05 END AS reject_05
FROM agg
"""


def robust_scaler(
    df: DataFrame,
    column: str,
    group_columns,
) -> DataFrame:
    """Median/IQR standardization (sklearn's RobustScaler contract,
    public): ``(x − median) / (q75 − q25)`` per group — the
    outlier-proof cousin of z-scoring for feature pipelines (one wild
    point moves a mean/std arbitrarily; the median and IQR have 50% /
    25% breakdown).  Exact quantile_cont bounds from one sorted
    collect per group (the winsorize machinery), broadcast back; a
    zero IQR (≥ half the group tied) yields NULL rather than a
    division blow-up.

    Appends {c}_robust, plus the per-group _median/_iqr columns the
    inverse transform needs.
    """
    g = _as_list(group_columns)
    # collect_list drops NULLs in Spark; the SQL twin's list() keeps
    # them — both sides filter IS NOT NULL explicitly so the bounds
    # see the identical sample (ADVICE r10).
    bounds = df.filter(F.col(column).isNotNull()).groupBy(*g).agg(
        F.sort_array(F.collect_list(column)).alias("_arr"),
    )
    arr, n = F.col("_arr"), F.size("_arr")
    bounds = bounds.select(
        *g,
        F.when(n > 0, _qcont(arr, n, 0.25)).alias("_q25"),
        F.when(n > 0, _qcont(arr, n, 0.50)).alias("_med"),
        F.when(n > 0, _qcont(arr, n, 0.75)).alias("_q75"),
    )
    out = df.join(F.broadcast(bounds), on=g, how="left")
    iqr = F.col("_q75") - F.col("_q25")
    scaled = F.when(
        iqr > 0, (F.col(column).cast("double") - F.col("_med")) / iqr
    )
    return out.select(
        *df.columns,
        scaled.alias(f"{column}_robust"),
        F.col("_med").alias(f"{column}_median"),
        iqr.alias(f"{column}_iqr"),
    )


def robust_scaler_sql(
    table: str,
    column: str,
    group_columns,
    select_cols: str,
) -> str:
    """DuckDB twin of :func:`robust_scaler` (same quantile_cont lerp
    form, same division tree)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    q25 = _qcont_sql("_arr", "len(_arr)", 0.25)
    med = _qcont_sql("_arr", "len(_arr)", 0.50)
    q75 = _qcont_sql("_arr", "len(_arr)", 0.75)
    return f"""
WITH b AS (
  SELECT {gsel}, list_sort(list({column})) AS _arr
  FROM {table} WHERE {column} IS NOT NULL GROUP BY {gsel}
),
q AS (
  SELECT {gsel},
    CASE WHEN len(_arr) > 0 THEN {q25} END AS _q25,
    CASE WHEN len(_arr) > 0 THEN {med} END AS _med,
    CASE WHEN len(_arr) > 0 THEN {q75} END AS _q75
  FROM b
)
SELECT {select_cols},
  CASE WHEN (_q75 - _q25) > 0
    THEN (CAST({column} AS DOUBLE) - _med) / (_q75 - _q25) END
    AS {column}_robust,
  _med AS {column}_median,
  (_q75 - _q25) AS {column}_iqr
FROM {table} LEFT JOIN q USING ({gsel})
"""


def trimmed_mean(
    df: DataFrame,
    column: str,
    group_columns,
    trim: float = 0.1,
    scale: int = 6,
) -> DataFrame:
    """Per-group α-trimmed mean: drop ⌊n·α⌋ observations from EACH end
    of the sorted sample, average the rest — the robust location
    estimate between the mean (α=0) and the median (α→0.5); the
    standard summary when a few wild rows would drag a plain mean but
    a median wastes too much data.

    Exact path: one sorted collect per group, integer slice bounds
    (⌊n·α⌋ via exact int arithmetic where α is a rational literal),
    kept values quantized to int64 and summed with an ORDERED fold —
    the mean is one final double division, identical cross-engine.

    Returns (groups…, n, n_trimmed_each, trimmed_mean).
    """
    g = _as_list(group_columns)
    b = df.groupBy(*g).agg(
        F.sort_array(F.collect_list(F.col(column).cast("double"))).alias(
            "_arr"
        )
    )
    n = F.size("_arr")
    # k = floor(n * trim) in EXACT integer arithmetic: trim is a
    # rational literal p/q — floor(n·p / q) with integer div
    from fractions import Fraction

    fr = Fraction(trim).limit_denominator(10**6)
    k = F.expr(f"CAST(size(_arr) * {fr.numerator} div {fr.denominator}"
               " AS INT)")
    mult = float(10**scale)
    kept = F.slice(F.col("_arr"), k + 1, F.greatest(n - 2 * k, F.lit(0)))
    qsum = F.aggregate(
        F.transform(
            kept,
            lambda x: F.floor(x * F.lit(mult) + F.lit(0.5)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    cnt = n - 2 * k
    tm = F.when(
        cnt > 0, qsum.cast("double") / cnt.cast("double") / F.lit(mult)
    )
    return b.select(
        *g,
        n.cast("bigint").alias("n"),
        k.cast("bigint").alias("n_trimmed_each"),
        tm.alias("trimmed_mean"),
    )


def trimmed_mean_sql(
    table: str,
    column: str,
    group_columns,
    trim: float = 0.1,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`trimmed_mean` (same integer bounds, same
    quantized fold)."""
    from fractions import Fraction

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    fr = Fraction(trim).limit_denominator(10**6)
    mult = float(10**scale)
    k = f"CAST(len(_arr) * {fr.numerator} // {fr.denominator} AS INT)"
    kept = f"_arr[{k} + 1 : len(_arr) - {k}]"
    qsum = (
        f"CAST(list_sum(list_transform({kept},"
        f" x -> CAST(floor(x * {mult!r} + 0.5) AS BIGINT))) AS BIGINT)"
    )
    cnt = f"(len(_arr) - 2 * {k})"
    return f"""
WITH b AS (
  SELECT {gsel}, list_sort(list(CAST({column} AS DOUBLE))) AS _arr
  FROM {table} WHERE {column} IS NOT NULL GROUP BY {gsel}
)
SELECT {gsel},
  CAST(len(_arr) AS BIGINT) AS n,
  CAST({k} AS BIGINT) AS n_trimmed_each,
  CASE WHEN {cnt} > 0 THEN
    CAST({qsum} AS DOUBLE) / CAST({cnt} AS DOUBLE) / {mult!r}
  END AS trimmed_mean
FROM b
"""


def quantile_mapping(
    df: DataFrame,
    column: str,
    group_columns,
    ref_col,
    scale_p: int = 9,
) -> DataFrame:
    """Quantile mapping (CDF matching — the standard bias-correction /
    domain-harmonization transform, public): re-express each
    NON-reference row's value on the REFERENCE group's distribution,

        mapped = F_ref⁻¹( F_src(x) )

    so a systematically-shifted source (a miscalibrated sensor, a new
    traffic mix, a different label vendor) becomes comparable to the
    reference without assuming a parametric form.  ``ref_col`` is the
    boolean reference-side flag; reference rows pass through unmapped.

    Determinism: F_src uses mid-rank ECDF positions ((rmin+rmax)/2 − 1)
    /(n_src − 1) from exact integer ranks (RANK + tie-block counts);
    F_ref⁻¹ is the shared quantile_cont lerp over the reference's
    sorted array at that variable position — every float op is one
    fixed tree of exact-int-derived doubles.  Plan: one rank window on
    the source side + one sorted collect of the reference per group,
    broadcast back.

    Appends {c}_mapped (reference rows: the original value).
    """
    g = _as_list(group_columns)
    ref = F.col(ref_col) if isinstance(ref_col, str) else ref_col
    # NULL values would shift every rank (Spark windows order NULLS
    # FIRST, DuckDB NULLS LAST) and pollute the reference array
    # (DuckDB list() keeps NULLs) — complete-case both sides (ADVICE
    # r10); NULL rows are dropped, matching the SQL twin.
    nn = F.col(column).isNotNull()
    src = df.filter(~ref & nn)
    refd = df.filter(ref & nn)
    arr = refd.groupBy(*g).agg(
        F.sort_array(F.collect_list(F.col(column).cast("double"))).alias(
            "_ra"
        )
    )
    wsrc = Window.partitionBy(*g).orderBy(F.col(column))
    tie = Window.partitionBy(*g, column)
    ranked = src.select(
        "*",
        F.rank().over(wsrc).alias("_rmin"),
        F.count(F.lit(1)).over(tie).alias("_tn"),
        F.count(F.lit(1)).over(Window.partitionBy(*g)).alias("_ns"),
    )
    ravg = F.col("_rmin").cast("double") + (
        F.col("_tn").cast("double") - F.lit(1.0)
    ) / F.lit(2.0)
    p = F.when(
        F.col("_ns") > 1,
        (ravg - F.lit(1.0)) / (F.col("_ns").cast("double") - F.lit(1.0)),
    ).otherwise(F.lit(0.5))
    j = ranked.join(F.broadcast(arr), on=g, how="left")
    nr = F.size("_ra")
    h = (nr - 1).cast("double") * p
    lo = F.floor(h).cast("int")
    frac = h - lo.cast("double")
    base = F.element_at(F.col("_ra"), lo + 1)
    nxt = F.element_at(F.col("_ra"), F.least(lo + 2, nr))
    mapped = F.when(nr > 0, base * (F.lit(1.0) - frac) + nxt * frac)
    out_src = j.select(
        *df.columns, mapped.alias(f"{column}_mapped")
    )
    out_ref = refd.select(
        *df.columns, F.col(column).cast("double").alias(f"{column}_mapped")
    )
    return out_src.unionByName(out_ref)


def quantile_mapping_sql(
    table: str,
    column: str,
    group_columns,
    ref_sql: str,
    select_cols: str,
) -> str:
    """DuckDB twin of :func:`quantile_mapping` (same mid-rank ECDF,
    same lerp).  Complete-case on ``column`` in every CTE — Spark and
    DuckDB disagree on NULL rank placement and list() NULL retention,
    so NULL rows are excluded on both engines (ADVICE r10)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    return f"""
WITH src AS (
  SELECT {select_cols},
    RANK() OVER (PARTITION BY {gsel} ORDER BY {column}) AS _rmin,
    COUNT(*) OVER (PARTITION BY {gsel}, {column}) AS _tn,
    COUNT(*) OVER (PARTITION BY {gsel}) AS _ns
  FROM {table} WHERE NOT ({ref_sql}) AND {column} IS NOT NULL
),
ra AS (
  SELECT {gsel}, list_sort(list(CAST({column} AS DOUBLE))) AS _ra
  FROM {table} WHERE ({ref_sql}) AND {column} IS NOT NULL GROUP BY {gsel}
),
m AS (
  SELECT src.*, _ra,
    CASE WHEN _ns > 1 THEN
      ((CAST(_rmin AS DOUBLE) + (CAST(_tn AS DOUBLE) - 1.0) / 2.0) - 1.0)
        / (CAST(_ns AS DOUBLE) - 1.0)
    ELSE 0.5 END AS _p
  FROM src LEFT JOIN ra USING ({gsel})
)
SELECT {select_cols},
  CASE WHEN len(_ra) > 0 THEN
    _ra[CAST(FLOOR((len(_ra) - 1) * _p) AS INT) + 1]
      * (1.0 - ((len(_ra) - 1) * _p - FLOOR((len(_ra) - 1) * _p)))
    + _ra[LEAST(CAST(FLOOR((len(_ra) - 1) * _p) AS INT) + 2, len(_ra))]
      * ((len(_ra) - 1) * _p - FLOOR((len(_ra) - 1) * _p))
  END AS {column}_mapped
FROM m
UNION ALL
SELECT {select_cols}, CAST({column} AS DOUBLE) AS {column}_mapped
FROM {table} WHERE ({ref_sql}) AND {column} IS NOT NULL
"""


def cronbach_alpha(
    df: DataFrame,
    item_cols: list[str],
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Cronbach's α internal-consistency coefficient per group
    (Cronbach 1951, public) — the "do these k columns measure one
    underlying thing?" reliability number (survey scales, ensembles of
    quality scores, multi-judge labels):

        α = k/(k−1) · (1 − Σ_i var_i / var_total)

    with var_total the variance of per-row item SUMS.  One pass of
    exact sufficient statistics: items quantize to int64, Σx / Σx² per
    item and for the row total accumulate in DECIMAL(38,0)
    (VARCHAR-routed casts), sample variances (n−1) form one shared
    double tree.  Complete-case rows only (the corr_matrix listwise
    rule).

    Returns (groups…, n, k_items, sum_item_var, total_var, alpha).
    """
    g = _as_list(group_columns)
    k = len(item_cols)
    if k < 2:
        raise ValueError("cronbach_alpha needs >= 2 item columns")
    m = 10**scale
    q = lambda c: F.floor(  # noqa: E731
        F.col(c).cast("double") * F.lit(m) + F.lit(0.5)
    ).cast("bigint")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    notnull = None
    for c in item_cols:
        cond = F.col(c).isNotNull()
        notnull = cond if notnull is None else (notnull & cond)
    d = df.filter(notnull).select(
        *g, *[q(c).alias(f"_q{i}") for i, c in enumerate(item_cols)]
    )
    tot = None
    for i in range(k):
        tot = F.col(f"_q{i}") if tot is None else tot + F.col(f"_q{i}")
    d = d.withColumn("_qt", tot)
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(k):
        aggs.append(F.sum(dec(F.col(f"_q{i}"))).alias(f"_s{i}"))
        aggs.append(
            F.sum(dec(F.col(f"_q{i}") * F.col(f"_q{i}"))).alias(f"_ss{i}")
        )
    aggs.append(F.sum(dec(F.col("_qt"))).alias("_st"))
    aggs.append(F.sum(dec(F.col("_qt") * F.col("_qt"))).alias("_sst"))
    one = d.groupBy(*g).agg(*aggs)
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")

    def var(s, ss):
        return (nn * s2d(ss) - s2d(s) * s2d(s)) / (nn * (nn - 1.0))

    iv = None
    for i in range(k):
        v = var(f"_s{i}", f"_ss{i}")
        iv = v if iv is None else iv + v
    tv = var("_st", "_sst")
    mscale = float(m * m)
    alpha = F.when(
        (F.col("n") > 1) & (tv > 0),
        F.lit(float(k) / (k - 1.0)) * (F.lit(1.0) - iv / tv),
    )
    return one.select(
        *g,
        "n",
        F.lit(k).alias("k_items"),
        (iv / F.lit(mscale)).alias("sum_item_var"),
        (tv / F.lit(mscale)).alias("total_var"),
        alpha.alias("alpha"),
    )


def cronbach_alpha_sql(
    table: str,
    item_cols: list[str],
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`cronbach_alpha`."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    k = len(item_cols)
    m = 10**scale
    qq = lambda c: (  # noqa: E731
        f"CAST(FLOOR(CAST({c} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    )
    qt = " + ".join(qq(c) for c in item_cols)
    sel = ["COUNT(*) AS n"]
    for i, c in enumerate(item_cols):
        sel.append(f"SUM(CAST({qq(c)} AS DECIMAL(38,0))) AS _s{i}")
        sel.append(
            f"SUM(CAST({qq(c)} * {qq(c)} AS DECIMAL(38,0))) AS _ss{i}"
        )
    sel.append(f"SUM(CAST(({qt}) AS DECIMAL(38,0))) AS _st")
    sel.append(f"SUM(CAST(({qt}) * ({qt}) AS DECIMAL(38,0))) AS _sst")
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"

    def var(s, ss):
        return (f"(({nn} * {s2d(ss)} - {s2d(s)} * {s2d(s)})"
                f" / ({nn} * ({nn} - 1.0)))")

    iv = "(" + " + ".join(var(f"_s{i}", f"_ss{i}") for i in range(k)) + ")"
    tv = var("_st", "_sst")
    mscale = float(m * m)
    where = " AND ".join(f"{c} IS NOT NULL" for c in item_cols)
    return f"""
WITH agg AS (
  SELECT {gsel}, {', '.join(sel)} FROM {table}
  WHERE {where} GROUP BY {gsel}
)
SELECT {gsel}, n, {k} AS k_items,
  {iv} / {mscale!r} AS sum_item_var,
  {tv} / {mscale!r} AS total_var,
  CASE WHEN n > 1 AND {tv} > 0
    THEN {float(k) / (k - 1.0)!r} * (1.0 - {iv} / {tv}) END AS alpha
FROM agg
"""


def cohens_d(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Cohen's d standardized mean difference per group (+ Hedges' g
    small-sample correction) — the EFFECT SIZE beside welch_ttest's
    significance: at 100 TB everything is "significant"; d says
    whether the difference is worth acting on (0.2/0.5/0.8 = the
    conventional small/medium/large bands):

        d = (x̄_a − x̄_b) / s_pooled,
        s²_pooled = ((n_a−1)s²_a + (n_b−1)s²_b) / (n_a+n_b−2),
        g = d · (1 − 3/(4(n_a+n_b) − 9))

    One pass of exact quantized sufficient statistics (the welch
    frame), one shared double tree.  Complete-case per the stats-family
    rule.

    Returns (groups…, n_a, n_b, mean_diff, cohens_d, hedges_g).
    """
    from timeseriesutils_spark.functions.exact import sq  # noqa: F401

    g = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    lvl = F.col(factor_col)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    d = df.filter(
        F.col(value_col).isNotNull() & lvl.isin([level_a, level_b])
    ).select(*g, q.alias("_q"), (lvl == level_a).alias("_ia"))
    agg = d.groupBy(*g).agg(
        F.sum(F.col("_ia").cast("bigint")).alias("n_a"),
        F.sum((~F.col("_ia")).cast("bigint")).alias("n_b"),
        F.sum(F.when(F.col("_ia"), dec(F.col("_q")))).alias("_sa"),
        F.sum(F.when(~F.col("_ia"), dec(F.col("_q")))).alias("_sb"),
        F.sum(F.when(F.col("_ia"), dec(F.col("_q") * F.col("_q"))))
        .alias("_ssa"),
        F.sum(F.when(~F.col("_ia"), dec(F.col("_q") * F.col("_q"))))
        .alias("_ssb"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    va = (na * s2d("_ssa") - s2d("_sa") * s2d("_sa")) / (na * (na - 1.0))
    vb = (nb * s2d("_ssb") - s2d("_sb") * s2d("_sb")) / (nb * (nb - 1.0))
    sp2 = ((na - 1.0) * va + (nb - 1.0) * vb) / (na + nb - 2.0)
    diff = s2d("_sa") / na - s2d("_sb") / nb
    dd = F.when(
        (F.col("n_a") > 1) & (F.col("n_b") > 1) & (sp2 > 0),
        diff / F.sqrt(sp2),
    )
    j = F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (na + nb) - F.lit(9.0))
    return agg.select(
        *g,
        "n_a",
        "n_b",
        (diff / F.lit(float(m))).alias("mean_diff"),
        dd.alias("cohens_d"),
        (dd * j).alias("hedges_g"),
    )


def cohens_d_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`cohens_d`."""
    from timeseriesutils_spark.functions.exact import sq

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    na = "CAST(n_a AS DOUBLE)"
    nb = "CAST(n_b AS DOUBLE)"
    va = (f"(({na} * {s2d('_ssa')} - {s2d('_sa')} * {s2d('_sa')})"
          f" / ({na} * ({na} - 1.0)))")
    vb = (f"(({nb} * {s2d('_ssb')} - {s2d('_sb')} * {s2d('_sb')})"
          f" / ({nb} * ({nb} - 1.0)))")
    sp2 = f"((({na} - 1.0) * {va} + ({nb} - 1.0) * {vb}) / ({na} + {nb} - 2.0))"
    diff = f"({s2d('_sa')} / {na} - {s2d('_sb')} / {nb})"
    dd = (f"(CASE WHEN n_a > 1 AND n_b > 1 AND {sp2} > 0"
          f" THEN {diff} / SQRT({sp2}) END)")
    j = f"(1.0 - 3.0 / (4.0 * ({na} + {nb}) - 9.0))"
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q, ({factor_col} = {sq(level_a)}) AS _ia
  FROM ({data_sql})
  WHERE {value_col} IS NOT NULL
    AND {factor_col} IN ({sq(level_a)}, {sq(level_b)})
),
agg AS (
  SELECT {gsel},
    CAST(SUM(CAST(_ia AS BIGINT)) AS BIGINT) AS n_a,
    CAST(SUM(CAST(NOT _ia AS BIGINT)) AS BIGINT) AS n_b,
    CAST(SUM(CASE WHEN _ia THEN CAST(_q AS DECIMAL(38,0)) END)
      AS DECIMAL(38,0)) AS _sa,
    CAST(SUM(CASE WHEN NOT _ia THEN CAST(_q AS DECIMAL(38,0)) END)
      AS DECIMAL(38,0)) AS _sb,
    CAST(SUM(CASE WHEN _ia THEN CAST(_q * _q AS DECIMAL(38,0)) END)
      AS DECIMAL(38,0)) AS _ssa,
    CAST(SUM(CASE WHEN NOT _ia THEN CAST(_q * _q AS DECIMAL(38,0)) END)
      AS DECIMAL(38,0)) AS _ssb
  FROM d GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  {diff} / {float(m)!r} AS mean_diff,
  {dd} AS cohens_d,
  ({dd} * {j}) AS hedges_g
FROM agg
"""


def durbin_watson(
    df: DataFrame,
    value_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> DataFrame:
    """Per-group Durbin–Watson statistic (Durbin & Watson 1950) over
    the ORDER-consecutive, mean-centered series:

        DW = Σ_{t=2..n} (e_t − e_{t−1})² / Σ e_t²,  e = y − ȳ

    the first-order serial-correlation check every regression-residual
    diagnosis starts with (DW ≈ 2(1−ρ₁); < 2 positive autocorrelation,
    > 2 negative).  Exactness: consecutive differences are
    CENTER-INVARIANT (Δ(q−μ) = Δq), so the numerator is an exact
    integer sum of squared quantized lags; the denominator is the
    exact power-sum identity Σq² − (Σq)²/n — one window pass for the
    lag, one reduce, one shared double division.

    Returns (groups…, n, dw_stat, rho1_approx); NULL when n < 2 or
    the series is constant.
    """
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    w = Window.partitionBy(*groups).orderBy(*order)
    # single pass: lag within the ordered window, then reduce
    src = df.filter(F.col(value_col).isNotNull()).select(
        *groups, *order, q.alias("_q")
    )
    lagged = src.select(
        *groups,
        "_q",
        (F.col("_q") - F.lag("_q").over(w)).alias("_dq"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = lagged.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("_q"))).alias("_s1"),
        F.sum(dec(F.col("_q") * F.col("_q"))).alias("_s2"),
        F.sum(dec(F.col("_dq") * F.col("_dq"))).alias("_sd2"),
    )
    nn = F.col("n").cast("double")
    s1 = F.col("_s1").cast("string").cast("double")
    s2 = F.col("_s2").cast("string").cast("double")
    sd2 = F.coalesce(F.col("_sd2").cast("string").cast("double"), F.lit(0.0))
    den = s2 - s1 * s1 / nn
    dw = sd2 / den
    ok = (F.col("n") >= 2) & (den > 0)
    return agg.select(
        *groups,
        "n",
        F.when(ok, dw).alias("dw_stat"),
        F.when(ok, F.lit(1.0) - dw / F.lit(2.0)).alias("rho1_approx"),
    )


def durbin_watson_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    order_by,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`durbin_watson` (same power-sum identity,
    same division tree)."""
    groups = _as_list(group_columns)
    order = _as_list(order_by)
    gsel = ", ".join(groups)
    osel = ", ".join(order)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    den = f"({s2d('_s2')} - {s2d('_s1')} * {s2d('_s1')} / {nn})"
    dw = f"(COALESCE({s2d('_sd2')}, 0e0) / {den})"
    return f"""
WITH src AS (
  SELECT {gsel}, {qq} AS _q,
    {qq} - LAG({qq}) OVER (PARTITION BY {gsel} ORDER BY {osel}) AS _dq
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_q AS DECIMAL(38,0))) AS _s1,
    SUM(CAST(_q * _q AS DECIMAL(38,0))) AS _s2,
    SUM(CAST(_dq * _dq AS DECIMAL(38,0))) AS _sd2
  FROM src GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN n >= 2 AND {den} > 0 THEN {dw} END AS dw_stat,
  CASE WHEN n >= 2 AND {den} > 0 THEN 1e0 - {dw} / 2e0 END AS rho1_approx
FROM agg
"""


def dagostino_k2(
    df: DataFrame,
    value_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group D'Agostino K² omnibus normality test — the
    finite-sample-calibrated sibling of :func:`jarque_bera` (JB's χ²
    limit is notoriously slow to arrive; K² transforms skewness
    (D'Agostino 1970) and kurtosis (Anscombe & Glynn 1983) to separate
    ~N(0,1) scores first, so the omnibus is usable from n ≈ 20):

        Z₁ = δ·asinh(Y/α)  (skewness transform)
        Z₂ = cube-root Wilson–Hilferty-style kurtosis transform
        K² = Z₁² + Z₂²,  p = exp(−K²/2)   (χ²₂ — exact closed form)

    Moments come from the same exact DECIMAL power sums as
    jarque_bera; the n-dependent constants are one shared double tree;
    Z₁/Z₂ pass through LN/CBRT/SQRT so each is floor-quantized at 1e-9
    BEFORE squaring (the libm rule) — K² and p are then bit-identical
    cross-engine.

    Returns (groups…, n, z_skew, z_kurt, k2_stat, p_value, reject_05);
    NULL for n ≤ 20 or a constant series (the transform's validity
    floor, pinned rather than extrapolated).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(F.col(value_col).isNotNull()).select(
        *groups, q.alias("_q"), (q * q).alias("_q2")
    )
    dec19 = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    agg = d.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_q").cast("decimal(38,0)")).alias("_s1"),
        F.sum(F.col("_q2").cast("decimal(38,0)")).alias("_s2"),
        F.sum(dec19(F.col("_q2")) * dec19(F.col("_q"))).alias("_s3"),
        F.sum(dec19(F.col("_q2")) * dec19(F.col("_q2"))).alias("_s4"),
    )
    nn = F.col("n").cast("double")
    s1 = F.col("_s1").cast("string").cast("double")
    s2 = F.col("_s2").cast("string").cast("double")
    s3 = F.col("_s3").cast("string").cast("double")
    s4 = F.col("_s4").cast("string").cast("double")
    mean = s1 / nn
    m2 = s2 / nn - mean * mean
    m3 = s3 / nn - F.lit(3.0) * mean * (s2 / nn) + F.lit(2.0) * mean * mean * mean
    m4 = (
        s4 / nn
        - F.lit(4.0) * mean * (s3 / nn)
        + F.lit(6.0) * mean * mean * (s2 / nn)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    g1 = m3 / (m2 * F.sqrt(m2))
    g2 = m4 / (m2 * m2)  # RAW kurtosis (not excess) for Anscombe–Glynn
    # --- D'Agostino (1970) skewness transform ---
    y = g1 * F.sqrt((nn + 1.0) * (nn + 3.0) / (F.lit(6.0) * (nn - 2.0)))
    b2 = (
        F.lit(3.0)
        * (nn * nn + F.lit(27.0) * nn - F.lit(70.0))
        * (nn + 1.0)
        * (nn + 3.0)
        / ((nn - 2.0) * (nn + 5.0) * (nn + 7.0) * (nn + 9.0))
    )
    w2 = F.sqrt(F.lit(2.0) * (b2 - 1.0)) - F.lit(1.0)
    delta = F.lit(1.0) / F.sqrt(F.log(F.sqrt(w2)))
    alpha = F.sqrt(F.lit(2.0) / (w2 - 1.0))
    z1raw = delta * F.log(
        y / alpha + F.sqrt((y / alpha) * (y / alpha) + F.lit(1.0))
    )
    # --- Anscombe & Glynn (1983) kurtosis transform ---
    eb = F.lit(3.0) * (nn - 1.0) / (nn + 1.0)
    vb = (
        F.lit(24.0) * nn * (nn - 2.0) * (nn - 3.0)
        / ((nn + 1.0) * (nn + 1.0) * (nn + 3.0) * (nn + 5.0))
    )
    x = (g2 - eb) / F.sqrt(vb)
    beta1 = (
        F.lit(6.0) * (nn * nn - F.lit(5.0) * nn + F.lit(2.0))
        / ((nn + 7.0) * (nn + 9.0))
        * F.sqrt(
            F.lit(6.0) * (nn + 3.0) * (nn + 5.0)
            / (nn * (nn - 2.0) * (nn - 3.0))
        )
    )
    a = F.lit(6.0) + F.lit(8.0) / beta1 * (
        F.lit(2.0) / beta1
        + F.sqrt(F.lit(1.0) + F.lit(4.0) / (beta1 * beta1))
    )
    inner = (F.lit(1.0) - F.lit(2.0) / a) / (
        F.lit(1.0) + x * F.sqrt(F.lit(2.0) / (a - 4.0))
    )
    z2raw = (
        (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * a) - F.cbrt(inner))
        * F.sqrt(F.lit(4.5) * a)
    )
    quant = lambda c: F.floor(c * F.lit(1.0e9) + F.lit(0.5)) / F.lit(1.0e9)  # noqa: E731
    # round-14 (guide §7.3 — the driver, not the cluster, was the
    # bottleneck): emitting all five outputs from ONE projection
    # re-inlined the z1/z2 trees (each expanding the four moment sums)
    # ~8x — k2 carries both, p carries k2, reject carries p — and the
    # per-write Catalyst/codegen pass over that duplicated tree cost
    # ~0.7 s per run at 5 output rows.  Staging at the z level computes
    # each tree once; the second projection re-references plain columns
    # (z1 is non-cheap and multiply-referenced, so CollapseProject
    # leaves the stage boundary alone).  Bit-identical: the same IEEE
    # doubles flow through the same op sequence, names notwithstanding.
    ok = (F.col("n") > 20) & (m2 > 0)
    zstage = agg.select(
        *groups,
        "n",
        quant(z1raw).alias("_z1"),
        quant(z2raw).alias("_z2"),
        ok.alias("_ok"),
    )
    z1 = F.col("_z1")
    z2 = F.col("_z2")
    okc = F.col("_ok")
    k2 = z1 * z1 + z2 * z2
    p = quant(F.exp(-k2 / F.lit(2.0)))
    return zstage.select(
        *groups,
        "n",
        F.when(okc, z1).alias("z_skew"),
        F.when(okc, z2).alias("z_kurt"),
        F.when(okc, k2).alias("k2_stat"),
        F.when(okc, p).alias("p_value"),
        F.when(okc, p < F.lit(0.05)).alias("reject_05"),
    )


def dagostino_k2_sql(
    data_sql: str,
    value_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`dagostino_k2` (same power sums, same
    transform trees, same 1e-9 quantization points)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    nn = "CAST(n AS DOUBLE)"
    mean = f"({s2d('_s1')} / {nn})"
    m2 = f"({s2d('_s2')} / {nn} - {mean} * {mean})"
    m3 = (
        f"({s2d('_s3')} / {nn} - 3.0 * {mean} * ({s2d('_s2')} / {nn})"
        f" + 2.0 * {mean} * {mean} * {mean})"
    )
    m4 = (
        f"({s2d('_s4')} / {nn} - 4.0 * {mean} * ({s2d('_s3')} / {nn})"
        f" + 6.0 * {mean} * {mean} * ({s2d('_s2')} / {nn})"
        f" - 3.0 * {mean} * {mean} * {mean} * {mean})"
    )
    g1 = f"({m3} / ({m2} * SQRT({m2})))"
    g2 = f"({m4} / ({m2} * {m2}))"
    y = f"({g1} * SQRT(({nn} + 1.0) * ({nn} + 3.0) / (6.0 * ({nn} - 2.0))))"
    b2 = (
        f"(3.0 * ({nn} * {nn} + 27.0 * {nn} - 70.0) * ({nn} + 1.0)"
        f" * ({nn} + 3.0) / (({nn} - 2.0) * ({nn} + 5.0) * ({nn} + 7.0)"
        f" * ({nn} + 9.0)))"
    )
    w2 = f"(SQRT(2.0 * ({b2} - 1.0)) - 1.0)"
    delta = f"(1.0 / SQRT(LN(SQRT({w2}))))"
    alpha = f"(SQRT(2.0 / ({w2} - 1.0)))"
    z1raw = (
        f"({delta} * LN({y} / {alpha}"
        f" + SQRT(({y} / {alpha}) * ({y} / {alpha}) + 1.0)))"
    )
    eb = f"(3.0 * ({nn} - 1.0) / ({nn} + 1.0))"
    vb = (
        f"(24.0 * {nn} * ({nn} - 2.0) * ({nn} - 3.0)"
        f" / (({nn} + 1.0) * ({nn} + 1.0) * ({nn} + 3.0) * ({nn} + 5.0)))"
    )
    x = f"(({g2} - {eb}) / SQRT({vb}))"
    beta1 = (
        f"(6.0 * ({nn} * {nn} - 5.0 * {nn} + 2.0)"
        f" / (({nn} + 7.0) * ({nn} + 9.0))"
        f" * SQRT(6.0 * ({nn} + 3.0) * ({nn} + 5.0)"
        f" / ({nn} * ({nn} - 2.0) * ({nn} - 3.0))))"
    )
    a = (
        f"(6.0 + 8.0 / {beta1} * (2.0 / {beta1}"
        f" + SQRT(1.0 + 4.0 / ({beta1} * {beta1}))))"
    )
    inner = (
        f"((1.0 - 2.0 / {a}) / (1.0 + {x} * SQRT(2.0 / ({a} - 4.0))))"
    )
    z2raw = (
        f"((1.0 - 2.0 / (9.0 * {a}) - CBRT({inner})) * SQRT(4.5 * {a}))"
    )
    quant = lambda c: f"(FLOOR({c} * 1e9 + 0.5) / 1e9)"  # noqa: E731
    z1, z2 = quant(z1raw), quant(z2raw)
    k2 = f"({z1} * {z1} + {z2} * {z2})"
    p = quant(f"EXP(-{k2} / 2.0)")
    ok = f"(n > 20 AND {m2} > 0)"
    dec19 = lambda c: f"CAST({c} AS DECIMAL(19,0))"  # noqa: E731
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q, {qq} * {qq} AS _q2
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n,
    SUM(CAST(_q AS DECIMAL(38,0))) AS _s1,
    SUM(CAST(_q2 AS DECIMAL(38,0))) AS _s2,
    SUM({dec19('_q2')} * {dec19('_q')}) AS _s3,
    SUM({dec19('_q2')} * {dec19('_q2')}) AS _s4
  FROM d GROUP BY {gsel}
)
SELECT {gsel}, n,
  CASE WHEN {ok} THEN {z1} END AS z_skew,
  CASE WHEN {ok} THEN {z2} END AS z_kurt,
  CASE WHEN {ok} THEN {k2} END AS k2_stat,
  CASE WHEN {ok} THEN {p} END AS p_value,
  CASE WHEN {ok} THEN {p} < 0.05 END AS reject_05
FROM agg
"""


# --------------------------------------------------------------------------
# one-way random-effects intraclass correlation — ICC(1,1)
# --------------------------------------------------------------------------


def icc_oneway(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Per-group one-way random-effects intraclass correlation
    ICC(1,1) (Shrout & Fleiss 1979 case 1): how much of the total
    rating variance is BETWEEN rated units — the reliability /
    agreement coefficient for replicate measurements (repeated lab
    readings per sample, multiple line items per order, raters per
    document) when raters are not crossed with units:

        ICC = (MSB − MSW) / (MSB + (k₀−1)·MSW)
        k₀  = (N − Σnᵢ²/N)/(I−1)     (the unbalanced-design ANOVA k)

    Exactness: values quantized to 10^-scale units; per-unit
    Σq, Σq², nᵢ are exact; the one cross-unit rational Σᵢ Sᵢ²/nᵢ is
    rounded per UNIT to the nearest 1 in q² units (each unit's double
    term is deterministic, the cross-unit sum then accumulates exact
    DECIMAL ints so group totals are order-free; the ≤ I/2 q²-unit
    bias is ~1e-14 relative for any real data, and Sᵢ²/nᵢ must stay
    below ~9·10^18 — the int64 floor range — which caps Σq per unit
    at ~3·10^9 quantized units).  MSB/MSW/k₀/ICC are one shared
    double tree.

    Scale shape: two map-combinable aggregations (unit, then group) —
    no windows, no joins; the unit aggregation is the only row-scale
    exchange.

    Returns (groups…, n_units, n_obs, msb, msw, k0, icc).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *groups, F.col(unit_col).alias("_u"), q.alias("_q")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_unit = rows.groupBy(*groups, "_u").agg(
        F.count(F.lit(1)).alias("_ni"),
        F.sum("_q").alias("_si"),
        F.sum(dec(F.col("_q")) * dec(F.col("_q"))).alias("_qq"),
    )
    s2du = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    term = F.floor(
        s2du("_si") * s2du("_si") / F.col("_ni").cast("double") + F.lit(0.5)
    ).cast("decimal(38,0)")
    agg = per_unit.select(
        *groups,
        "_ni",
        "_si",
        "_qq",
        term.alias("_term"),
        (dec(F.col("_ni")) * dec(F.col("_ni"))).alias("_ni2"),
    ).groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("_ni").alias("n_obs"),
        F.sum(dec(F.col("_si"))).alias("_s"),
        F.sum("_qq").alias("_q2"),
        F.sum("_term").alias("_usum"),
        F.sum("_ni2").alias("_p"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    ii = F.col("n_units").cast("double")
    nn = F.col("n_obs").cast("double")
    mf = F.lit(float(m))
    u = s2d("_usum")
    s2 = s2d("_s") * s2d("_s")
    ssb = (u - s2 / nn) / (mf * mf)
    ssw = (s2d("_q2") - u) / (mf * mf)
    msb = ssb / (ii - F.lit(1.0))
    msw = ssw / (nn - ii)
    k0 = (nn - s2d("_p") / nn) / (ii - F.lit(1.0))
    den = msb + (k0 - F.lit(1.0)) * msw
    ok = (F.col("n_units") > 1) & (F.col("n_obs") > F.col("n_units"))
    icc = F.when(ok & (den != 0), (msb - msw) / den)
    return agg.select(
        *groups,
        "n_units",
        "n_obs",
        F.when(ok, msb).alias("msb"),
        F.when(ok, msw).alias("msw"),
        F.when(ok, k0).alias("k0"),
        icc.alias("icc"),
    )


def icc_oneway_sql(
    data_sql: str,
    value_col: str,
    unit_col: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`icc_oneway` (same per-unit quantized
    rational, same ANOVA algebra)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2 = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    term = (
        f"CAST(FLOOR({s2('_si')} * {s2('_si')} / CAST(_ni AS DOUBLE)"
        f" + 0.5) AS DECIMAL(38,0))"
    )
    ii = "CAST(n_units AS DOUBLE)"
    nn = "CAST(n_obs AS DOUBLE)"
    mf = dlit(float(m))
    u = f"{s2('_usum')}"
    ssq = f"({s2('_s')} * {s2('_s')})"
    ssb = f"(({u} - {ssq} / {nn}) / ({mf} * {mf}))"
    ssw = f"(({s2('_q2')} - {u}) / ({mf} * {mf}))"
    msb = f"({ssb} / ({ii} - 1.0))"
    msw = f"({ssw} / ({nn} - {ii}))"
    k0 = f"(({nn} - {s2('_p')} / {nn}) / ({ii} - 1.0))"
    den = f"({msb} + ({k0} - 1.0) * {msw})"
    ok = "(n_units > 1 AND n_obs > n_units)"
    return f"""
WITH rows_q AS (
  SELECT {gsel}, {unit_col} AS _u, {qv} AS _q
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
per_unit AS (
  SELECT {gsel}, _u, COUNT(*) AS _ni,
    CAST(SUM(_q) AS BIGINT) AS _si,
    SUM(CAST(_q AS HUGEINT) * CAST(_q AS HUGEINT)) AS _qq
  FROM rows_q GROUP BY {gsel}, _u
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n_units,
    CAST(SUM(_ni) AS BIGINT) AS n_obs,
    SUM(CAST(_si AS HUGEINT)) AS _s,
    SUM(_qq) AS _q2,
    SUM({term}) AS _usum,
    SUM(CAST(_ni AS HUGEINT) * CAST(_ni AS HUGEINT)) AS _p
  FROM per_unit GROUP BY {gsel}
)
SELECT {gsel}, n_units, n_obs,
  CASE WHEN {ok} THEN {msb} END AS msb,
  CASE WHEN {ok} THEN {msw} END AS msw,
  CASE WHEN {ok} THEN {k0} END AS k0,
  CASE WHEN {ok} AND {den} != 0 THEN ({msb} - {msw}) / {den} END AS icc
FROM agg
"""


# --------------------------------------------------------------------------
# TOST equivalence test (two one-sided z tests)
# --------------------------------------------------------------------------


def tost_equivalence(
    df: DataFrame,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    margin: float,
    scale: int = 2,
) -> DataFrame:
    """Per-group TOST equivalence test (Schuirmann 1987): the
    significance family above answers "is there a difference?" — TOST
    answers the release-gate question "is the difference SMALLER than a
    margin we declared irrelevant?", which a non-significant t-test
    does NOT establish (absence of evidence ≠ evidence of absence):

        H₀: |μ_b − μ_a| ≥ δ   vs   H₁: |μ_b − μ_a| < δ
        z₁ = (Δ̂ + δ)/se,  z₂ = (δ − Δ̂)/se   (Welch se)
        p_tost = max(P(Z > z₁), P(Z > z₂));  equivalent ⇔ p_tost < α

    Exactness: Welch sufficient statistics from quantized ints (the
    welch_ttest machinery), one-sided normal tails via the engine's
    Bowling logistic kernel (shared literals), p floor-quantized at
    1e-9 — decisions bit-identical across engines.  One map-combinable
    aggregation.

    Returns (groups…, n_a, n_b, diff, se, p_tost, equivalent_05).
    """
    groups = _as_list(group_columns)
    m = 10**scale
    qv = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    arm = F.when(F.col(factor_col) == F.lit(level_a), 1).when(
        F.col(factor_col) == F.lit(level_b), 2
    )
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, arm.alias("_arm"), qv.alias("_qv"))
        .filter(F.col("_arm").isNotNull())
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = d.groupBy(*groups).agg(
        F.sum(F.when(F.col("_arm") == 1, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("_arm") == 2, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("_arm") == 1, dec(F.col("_qv")))).alias("_sa"),
        F.sum(F.when(F.col("_arm") == 2, dec(F.col("_qv")))).alias("_sb"),
        F.sum(
            F.when(F.col("_arm") == 1, dec(F.col("_qv")) * dec(F.col("_qv")))
        ).alias("_qa"),
        F.sum(
            F.when(F.col("_arm") == 2, dec(F.col("_qv")) * dec(F.col("_qv")))
        ).alias("_qb"),
    )
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    mf = F.lit(float(m))
    ma = s2d("_sa") / na / mf
    mb = s2d("_sb") / nb / mf
    va = (s2d("_qa") - s2d("_sa") * s2d("_sa") / na) / (na - 1.0) / (mf * mf)
    vb = (s2d("_qb") - s2d("_sb") * s2d("_sb") / nb) / (nb - 1.0) / (mf * mf)
    se = F.sqrt(va / na + vb / nb)
    diff = mb - ma
    delta = F.lit(float(margin))
    z1 = (diff + delta) / se
    z2 = (delta - diff) / se

    def tail(z):
        # P(Z > z) = 1 − Φ(z) via the Bowling logistic kernel (odd
        # symmetry makes one formula cover both signs)
        return F.lit(1.0) / (
            F.lit(1.0)
            + F.exp(F.lit(1.5976) * z + F.lit(0.070566) * z * z * z)
        )

    pq = F.lit(1.0e9)
    p = F.floor(F.greatest(tail(z1), tail(z2)) * pq + F.lit(0.5)) / pq
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1) & (se > 0)
    return agg.select(
        *groups,
        "n_a",
        "n_b",
        F.when(ok, diff).alias("diff"),
        F.when(ok, se).alias("se"),
        F.when(ok, p).alias("p_tost"),
        F.when(ok, p < F.lit(0.05)).alias("equivalent_05"),
    )


def tost_equivalence_sql(
    data_sql: str,
    value_col: str,
    factor_col: str,
    level_a: str,
    level_b: str,
    group_columns,
    margin: float,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`tost_equivalence` (same Welch statistics,
    same logistic tails)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 10**scale
    qv = f"CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    na = "CAST(n_a AS DOUBLE)"
    nb = "CAST(n_b AS DOUBLE)"
    mf = dlit(float(m))
    ma = f"({s2d('_sa')} / {na} / {mf})"
    mb = f"({s2d('_sb')} / {nb} / {mf})"
    va = (
        f"(({s2d('_qa')} - {s2d('_sa')} * {s2d('_sa')} / {na})"
        f" / ({na} - 1.0) / ({mf} * {mf}))"
    )
    vb = (
        f"(({s2d('_qb')} - {s2d('_sb')} * {s2d('_sb')} / {nb})"
        f" / ({nb} - 1.0) / ({mf} * {mf}))"
    )
    se = f"SQRT({va} / {na} + {vb} / {nb})"
    diff = f"({mb} - {ma})"
    delta = dlit(float(margin))
    z1 = f"(({diff} + {delta}) / {se})"
    z2 = f"(({delta} - {diff}) / {se})"
    tail = lambda z: (  # noqa: E731
        f"(1.0 / (1.0 + EXP(1.5976 * {z} + 0.070566 * {z} * {z} * {z})))"
    )
    p = (
        f"(FLOOR(GREATEST({tail(z1)}, {tail(z2)}) * 1000000000.0 + 0.5)"
        f" / 1000000000.0)"
    )
    ok = f"(n_a > 1 AND n_b > 1 AND {se} > 0)"
    return f"""
WITH d AS (
  SELECT {gsel},
    CASE WHEN {factor_col} = {level_a!r} THEN 1
         WHEN {factor_col} = {level_b!r} THEN 2 END AS _arm,
    {qv} AS _qv
  FROM ({data_sql}) WHERE {value_col} IS NOT NULL
),
agg AS (
  SELECT {gsel},
    CAST(SUM(CASE WHEN _arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(SUM(CASE WHEN _arm = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    SUM(CASE WHEN _arm = 1 THEN CAST(_qv AS HUGEINT) END) AS _sa,
    SUM(CASE WHEN _arm = 2 THEN CAST(_qv AS HUGEINT) END) AS _sb,
    SUM(CASE WHEN _arm = 1 THEN CAST(_qv AS HUGEINT) * _qv END) AS _qa,
    SUM(CASE WHEN _arm = 2 THEN CAST(_qv AS HUGEINT) * _qv END) AS _qb
  FROM d WHERE _arm IS NOT NULL
  GROUP BY {gsel}
)
SELECT {gsel}, n_a, n_b,
  CASE WHEN {ok} THEN {diff} END AS diff,
  CASE WHEN {ok} THEN {se} END AS se,
  CASE WHEN {ok} THEN {p} END AS p_tost,
  CASE WHEN {ok} THEN {p} < 0.05 END AS equivalent_05
FROM agg
"""


# --------------------------------------------------------------------------
# Fleiss' kappa (multi-rater categorical agreement)
# --------------------------------------------------------------------------


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    category_col: str,
    n_raters: int,
    group_columns,
) -> DataFrame:
    """Per-group Fleiss' kappa (1971): chance-corrected agreement when
    EVERY item is rated by n raters who need not be the same people —
    the multi-rater categorical member of the agreement family
    (cohens_kappa: two fixed raters; icc_oneway: continuous ratings;
    cronbach_alpha: scale consistency):

        P̄  = (ΣᵢΣⱼ nᵢⱼ² − N·n) / (N·n·(n−1))      (observed agreement)
        P̄ₑ = Σⱼ (Cⱼ/(N·n))²                        (chance agreement)
        κ  = (P̄ − P̄ₑ)/(1 − P̄ₑ)

    Items without exactly ``n_raters`` ratings are EXCLUDED (the
    balanced-panel contract Fleiss assumes; the count is reported so
    the exclusion is visible).  Exactness: ΣΣnᵢⱼ² and the category
    totals Cⱼ are exact integers from two map-combinable aggregations,
    so P̄ is an exact integer ratio and P̄ₑ a ratio of exact squares —
    κ is one shared double tree with NO quantization anywhere.

    Returns (groups…, n_items, n_excluded, p_bar, p_e, kappa).
    """
    groups = _as_list(group_columns)
    n = int(n_raters)
    d = df.filter(
        F.col(item_col).isNotNull() & F.col(category_col).isNotNull()
    ).select(*groups, F.col(item_col).alias("_it"), F.col(category_col).alias("_cat"))
    cell = d.groupBy(*groups, "_it", "_cat").agg(
        F.count(F.lit(1)).alias("_nij")
    )
    per_item = cell.groupBy(*groups, "_it").agg(
        F.sum("_nij").alias("_ni"),
        F.sum(F.col("_nij") * F.col("_nij")).alias("_sq"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    items = per_item.groupBy(*groups).agg(
        F.sum(F.when(F.col("_ni") == n, 1).otherwise(0)).alias("n_items"),
        F.sum(F.when(F.col("_ni") != n, 1).otherwise(0)).alias("n_excluded"),
        F.sum(F.when(F.col("_ni") == n, dec(F.col("_sq")))).alias("_ssq"),
    )
    # category totals over INCLUDED items only
    keep = per_item.filter(F.col("_ni") == n).select(*groups, "_it")
    cats = (
        cell.join(keep, [*groups, "_it"])
        .groupBy(*groups, "_cat")
        .agg(F.sum("_nij").alias("_cj"))
        .groupBy(*groups)
        .agg(F.sum(dec(F.col("_cj")) * dec(F.col("_cj"))).alias("_scj2"))
    )
    j = items.join(cats, groups, "left")
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    Ni = F.col("n_items").cast("double")
    nf = F.lit(float(n))
    p_bar = (s2d("_ssq") - Ni * nf) / (Ni * nf * (nf - F.lit(1.0)))
    p_e = s2d("_scj2") / (Ni * nf * Ni * nf)
    ok = (F.col("n_items") > 1) & (p_e < 1.0)
    kappa = F.when(ok, (p_bar - p_e) / (F.lit(1.0) - p_e))
    return j.select(
        *groups,
        "n_items",
        "n_excluded",
        F.when(F.col("n_items") > 0, p_bar).alias("p_bar"),
        F.when(F.col("n_items") > 0, p_e).alias("p_e"),
        kappa.alias("kappa"),
    )


def fleiss_kappa_sql(
    data_sql: str,
    item_col: str,
    category_col: str,
    n_raters: int,
    group_columns,
) -> str:
    """DuckDB twin of :func:`fleiss_kappa` (same exact integer
    ratios)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    n = int(n_raters)
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    Ni = "CAST(n_items AS DOUBLE)"
    nf = f"{float(n)!r}"
    p_bar = f"(({s2d('_ssq')} - {Ni} * {nf}) / ({Ni} * {nf} * ({nf} - 1.0)))"
    p_e = f"({s2d('_scj2')} / ({Ni} * {nf} * {Ni} * {nf}))"
    ok = f"(n_items > 1 AND {p_e} < 1.0)"
    return f"""
WITH d AS (
  SELECT {gsel}, {item_col} AS _it, {category_col} AS _cat
  FROM ({data_sql})
  WHERE {item_col} IS NOT NULL AND {category_col} IS NOT NULL
),
cell AS (
  SELECT {gsel}, _it, _cat, COUNT(*) AS _nij
  FROM d GROUP BY {gsel}, _it, _cat
),
per_item AS (
  SELECT {gsel}, _it, CAST(SUM(_nij) AS BIGINT) AS _ni,
    CAST(SUM(_nij * _nij) AS BIGINT) AS _sq
  FROM cell GROUP BY {gsel}, _it
),
items AS (
  SELECT {gsel},
    CAST(SUM(CASE WHEN _ni = {n} THEN 1 ELSE 0 END) AS BIGINT) AS n_items,
    CAST(SUM(CASE WHEN _ni != {n} THEN 1 ELSE 0 END) AS BIGINT)
      AS n_excluded,
    SUM(CASE WHEN _ni = {n} THEN CAST(_sq AS HUGEINT) END) AS _ssq
  FROM per_item GROUP BY {gsel}
),
cats AS (
  SELECT {gsel}, SUM(CAST(_cj AS HUGEINT) * _cj) AS _scj2
  FROM (
    SELECT {gsel}, _cat, CAST(SUM(_nij) AS BIGINT) AS _cj
    FROM cell JOIN (SELECT {gsel}, _it FROM per_item WHERE _ni = {n}) k
      USING ({gsel}, _it)
    GROUP BY {gsel}, _cat
  ) GROUP BY {gsel}
)
SELECT {gsel}, n_items, n_excluded,
  CASE WHEN n_items > 0 THEN {p_bar} END AS p_bar,
  CASE WHEN n_items > 0 THEN {p_e} END AS p_e,
  CASE WHEN {ok} THEN ({p_bar} - {p_e}) / (1.0 - {p_e}) END AS kappa
FROM items LEFT JOIN cats USING ({gsel})
"""


def yuen_test(
    df: DataFrame,
    value_col: str,
    arm_col: str,
    level_a: str,
    level_b: str,
    trim: float = 0.2,
    scale: int = 2,
) -> DataFrame:
    """Yuen's trimmed-mean two-sample test (Yuen 1974): the robust
    alternative to welch_ttest when tails are heavy — per arm, trim
    g = ⌊γ·n⌋ observations from EACH end, compare 20%-trimmed means
    with the winsorized-variance standard error:

        t = (x̄t_A − x̄t_B) / √(d_A + d_B),
        d = s²_w · (n−1) / (h·(h−1)),   h = n − 2g

    (s²_w the winsorized variance: extreme values replaced by the
    surviving order statistics, not dropped).  Fills the gap between
    welch_ttest (means, outlier-fragile) and mann_whitney /
    brunner_munzel (ranks only — no location scale): a trimmed MEAN
    difference with a defensible SE.  The df (Welch–Satterthwaite on
    h_A, h_B) is emitted for the caller's t-table lookup.

    Exactness: values quantize at 10^-scale; per arm a ROW_NUMBER rank
    over (value, ROW_NUMBER-free total order = value then an md5-free
    stable index is unnecessary — ties are interchangeable for sums),
    trimming and winsorizing are rank CASEs, and all sums (winsorized
    Σ and Σ², trimmed Σ) accumulate in DECIMAL/HUGEINT; t and df are
    one shared double tree, floor-quantized at 1e-9.

    Scale shape: one exchange per arm for the rank window, one
    map-combinable aggregation of 8 sums — no pairwise anything.

    Returns one row: (n_a, n_b, h_a, h_b, tmean_a, tmean_b, diff,
    se, t_stat, df).
    """
    from pyspark.sql import Window

    from timeseriesutils_spark.functions.exact import dlit  # noqa: F401

    m = 10 ** int(scale)
    gamma = float(trim)
    if not (0.0 <= gamma < 0.5):
        raise ValueError("trim must be in [0, 0.5)")
    vq = F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    arm = F.when(F.col(arm_col) == F.lit(level_a), 1).when(
        F.col(arm_col) == F.lit(level_b), 2
    )
    d = df.select(arm.alias("_arm"), vq.alias("_v")).filter(
        F.col("_arm").isNotNull() & F.col("_v").isNotNull()
    )
    w = Window.partitionBy("_arm").orderBy("_v")
    wn = Window.partitionBy("_arm")
    r = d.select(
        "_arm", "_v",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    g = F.floor(F.col("_n") * F.lit(gamma)).cast("bigint")
    lo = g + 1
    hi = F.col("_n") - g
    # winsorized value: clamp ranks outside [lo, hi] to the boundary
    # order statistics (computed as conditional MAX/MIN aggregates)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s2d = lambda c: c.cast("string").cast("double")  # noqa: E731
    agg = r.groupBy("_arm").agg(
        F.max("_n").alias("n"),
        F.max(g).alias("g"),
        F.max(F.when(F.col("_rn") == lo, F.col("_v"))).alias("vlo"),
        F.max(F.when(F.col("_rn") == hi, F.col("_v"))).alias("vhi"),
        F.sum(
            dec(F.when((F.col("_rn") >= lo) & (F.col("_rn") <= hi), F.col("_v")).otherwise(F.lit(0)))
        ).alias("tsum"),
        F.sum(
            dec(
                F.when(F.col("_rn") < lo, F.lit(1)).otherwise(F.lit(0))
            )
        ).alias("nlo"),
        F.sum(
            dec(F.when(F.col("_rn") > hi, F.lit(1)).otherwise(F.lit(0)))
        ).alias("nhi"),
        F.sum(
            dec(
                F.when(
                    (F.col("_rn") >= lo) & (F.col("_rn") <= hi),
                    # operand-first DECIMAL cast: BIGINT _v*_v wraps
                    # silently past ~9.2e18 in Spark (ADVICE r12)
                    dec(F.col("_v")) * dec(F.col("_v")),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            )
        ).alias("qsum"),
    )
    # winsorized moments from the trimmed sums + boundary clamps (all
    # exact integers): Sw = tsum + nlo*vlo + nhi*vhi, likewise squares
    sw = F.col("tsum") + F.col("nlo") * F.col("vlo") + F.col("nhi") * F.col("vhi")
    qw = (
        F.col("qsum")
        + F.col("nlo") * (dec(F.col("vlo")) * dec(F.col("vlo")))
        + F.col("nhi") * (dec(F.col("vhi")) * dec(F.col("vhi")))
    )
    one = agg.select(
        "_arm",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n") - 2 * F.col("g")).cast("bigint").alias("h"),
        s2d(F.col("tsum")).alias("ts"),
        s2d(sw).alias("sw"),
        s2d(qw).alias("qw"),
    )
    a = one.filter(F.col("_arm") == 1).alias("a")
    b = one.filter(F.col("_arm") == 2).alias("b")
    j = a.crossJoin(F.broadcast(b))
    md = F.lit(float(m))

    def side(p):
        n = F.col(f"{p}.n").cast("double")
        h = F.col(f"{p}.h").cast("double")
        tmean = F.col(f"{p}.ts") / h / md
        s2w = (
            (F.col(f"{p}.qw") - F.col(f"{p}.sw") * F.col(f"{p}.sw") / n)
            / (n - F.lit(1.0))
            / (md * md)
        )
        dterm = s2w * (n - F.lit(1.0)) / (h * (h - F.lit(1.0)))
        return tmean, dterm, h

    tma, da_, ha = side("a")
    tmb, db_, hb = side("b")
    diff = tma - tmb
    se = F.sqrt(da_ + db_)
    t = diff / se
    dfree = (da_ + db_) * (da_ + db_) / (
        da_ * da_ / (ha - F.lit(1.0)) + db_ * db_ / (hb - F.lit(1.0))
    )
    ok = (F.col("a.h") > 1) & (F.col("b.h") > 1) & (se > F.lit(0.0))
    q9 = 1.0e9
    qz = lambda c: F.floor(c * F.lit(q9) + F.lit(0.5)) / F.lit(q9)  # noqa: E731
    return j.select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.col("a.h").alias("h_a"),
        F.col("b.h").alias("h_b"),
        qz(tma).alias("tmean_a"),
        qz(tmb).alias("tmean_b"),
        qz(diff).alias("diff"),
        F.when(ok, qz(se)).alias("se"),
        F.when(ok, qz(t)).alias("t_stat"),
        F.when(ok, qz(dfree)).alias("df"),
    )


def yuen_test_sql(
    table: str,
    value_col: str,
    arm_col: str,
    level_a: str,
    level_b: str,
    trim: float = 0.2,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`yuen_test` (same rank CASEs, same exact
    integer moments, same double tree)."""
    from timeseriesutils_spark.functions.exact import dlit, sq

    m = 10 ** int(scale)
    gamma = float(trim)
    if not (0.0 <= gamma < 0.5):
        raise ValueError("trim must be in [0, 0.5)")
    md = dlit(float(m))
    s2d = lambda x: f"CAST(CAST(({x}) AS VARCHAR) AS DOUBLE)"  # noqa: E731
    qz = lambda x: f"(FLOOR(({x}) * 1000000000.0 + 0.5) / 1000000000.0)"  # noqa: E731

    def side(p):
        n = f"CAST({p}.n AS DOUBLE)"
        h = f"CAST({p}.h AS DOUBLE)"
        tmean = f"({s2d(f'{p}.ts')} / {h} / {md})"
        s2w = (
            f"(({s2d(f'{p}.qw')} - {s2d(f'{p}.sw')} * {s2d(f'{p}.sw')} / {n})"
            f" / ({n} - 1.0) / ({md} * {md}))"
        )
        dterm = f"({s2w} * ({n} - 1.0) / ({h} * ({h} - 1.0)))"
        return tmean, dterm, h

    tma, da, ha = side("a")
    tmb, db, hb = side("b")
    diff = f"({tma} - {tmb})"
    se = f"SQRT({da} + {db})"
    t = f"({diff} / {se})"
    dfree = (
        f"((({da} + {db}) * ({da} + {db})) / "
        f"(({da} * {da} / ({ha} - 1.0)) + ({db} * {db} / ({hb} - 1.0))))"
    )
    ok = "(a.h > 1 AND b.h > 1 AND " + se + " > 0.0)"
    return f"""
WITH d AS (
  SELECT CASE WHEN {arm_col} = {sq(level_a)} THEN 1
              WHEN {arm_col} = {sq(level_b)} THEN 2 END AS _arm,
    CAST(FLOOR(CAST({value_col} AS DOUBLE) * {m} + 0.5) AS BIGINT) AS _v
  FROM {table}
  WHERE {value_col} IS NOT NULL
    AND {arm_col} IN ({sq(level_a)}, {sq(level_b)})
),
r AS (
  SELECT _arm, _v,
    ROW_NUMBER() OVER (PARTITION BY _arm ORDER BY _v) AS _rn,
    COUNT(*) OVER (PARTITION BY _arm) AS _n,
    CAST(FLOOR(COUNT(*) OVER (PARTITION BY _arm) * {dlit(gamma)}) AS BIGINT) AS _g
  FROM d
),
agg AS (
  SELECT _arm, MAX(_n) AS n, MAX(_g) AS g,
    MAX(CASE WHEN _rn = _g + 1 THEN _v END) AS vlo,
    MAX(CASE WHEN _rn = _n - _g THEN _v END) AS vhi,
    SUM(CAST(CASE WHEN _rn >= _g + 1 AND _rn <= _n - _g THEN _v ELSE 0 END AS HUGEINT)) AS tsum,
    SUM(CAST(CASE WHEN _rn < _g + 1 THEN 1 ELSE 0 END AS HUGEINT)) AS nlo,
    SUM(CAST(CASE WHEN _rn > _n - _g THEN 1 ELSE 0 END AS HUGEINT)) AS nhi,
    SUM(CASE WHEN _rn >= _g + 1 AND _rn <= _n - _g THEN CAST(_v AS HUGEINT) * _v ELSE CAST(0 AS HUGEINT) END) AS qsum
  FROM r GROUP BY _arm
),
one AS (
  SELECT _arm, CAST(n AS BIGINT) AS n, CAST(n - 2 * g AS BIGINT) AS h,
    tsum AS ts,
    tsum + nlo * vlo + nhi * vhi AS sw,
    qsum + nlo * (CAST(vlo AS HUGEINT) * vlo) + nhi * (CAST(vhi AS HUGEINT) * vhi) AS qw
  FROM agg
)
SELECT a.n AS n_a, b.n AS n_b, a.h AS h_a, b.h AS h_b,
  {qz(tma)} AS tmean_a, {qz(tmb)} AS tmean_b, {qz(diff)} AS diff,
  CASE WHEN {ok} THEN {qz(se)} END AS se,
  CASE WHEN {ok} THEN {qz(t)} END AS t_stat,
  CASE WHEN {ok} THEN {qz(dfree)} END AS df
FROM (SELECT * FROM one WHERE _arm = 1) a
CROSS JOIN (SELECT * FROM one WHERE _arm = 2) b
"""
