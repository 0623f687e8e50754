"""Bounded-memory frequency sketching: exact heavy hitters in two passes.

The naive exact top-frequency query (``GROUP BY item HAVING count >
n·φ``) shuffles EVERY distinct item — at 100 TB the word/URL/n-gram
universe is billions of keys and the exchange dwarfs the answer.  The
classic fix is a two-pass plan whose state is bounded by 1/φ, not by the
universe:

  pass 1 (candidates): each partition runs a Misra–Gries summary with
      k = ⌈2/φ⌉ counters over its rows (``mapInPandas`` — one output row
      per surviving counter, so the driver collect is O(partitions·k)).
      MG's guarantee: an item with c occurrences in a partition of n_p
      rows keeps weight ≥ c − n_p/k there, so any item with global
      frequency > n·φ ≥ n·2/k retains positive weight in at least one
      partition summary → the candidate set is a SUPERSET of the true
      heavy hitters (false positives possible, false negatives not).
  pass 2 (exact): broadcast the candidate set, recount ONLY those items
      exactly, keep count ≥ ⌈n·φ⌉.

The result is EXACT (same rows as the full GROUP BY — that is what the
DuckDB oracle checks) while the shuffle carries at most |candidates|
keys and executor memory stays O(k) per task.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit
from timeseriesutils_spark.operators.window_features import _as_list


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    min_frac: float = 0.001,
) -> DataFrame:
    """Items whose exact frequency is ≥ ``⌈min_frac · total rows⌉``, with
    their exact counts: (item, n) — identical rows to the full GROUP BY,
    computed with bounded memory (module docstring).

    Runs two small driver-blocking jobs up front (the total row count and
    the candidate collect, bounded by partitions × ⌈2/min_frac⌉) before
    returning the lazy exact recount plan.
    """
    if not 0 < min_frac < 1:
        raise ValueError("min_frac must be in (0, 1)")
    k = math.ceil(2.0 / min_frac)

    def part(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:  # MG state carries across Arrow batches
            for v in pdf[item_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    dead = [key for key, c in counters.items() if c == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({"item": list(counters)})

    src = items.select(F.col(item_col).cast("string").alias(item_col)).filter(
        F.col(item_col).isNotNull()
    )
    cand = {
        r.item
        for r in src.mapInPandas(part, "item string").collect()
        if r.item is not None
    }
    threshold = math.ceil(src.count() * min_frac)
    cand_df = items.sparkSession.createDataFrame(
        [(c,) for c in sorted(cand)], f"{item_col} string"
    )
    return (
        src.join(F.broadcast(cand_df), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
    )


def heavy_hitters_sql(
    source_sql: str,
    item_col: str,
    min_frac: float = 0.001,
) -> str:
    """DuckDB twin: the full GROUP BY the two-pass plan is equivalent to.
    ``source_sql`` must yield one row per (non-null) item occurrence."""
    return f"""
WITH src AS (
  SELECT CAST({item_col} AS VARCHAR) AS {item_col} FROM ({source_sql})
  WHERE {item_col} IS NOT NULL
),
tot AS (SELECT COUNT(*) AS n FROM src)
SELECT {item_col}, COUNT(*) AS n
FROM src GROUP BY 1
HAVING COUNT(*) >= CEIL((SELECT n FROM tot) * {min_frac})
"""


# --------------------------------------------------------------------------
# Count-Min sketch (deterministic md5 rows -> exact cross-engine twin)
# --------------------------------------------------------------------------


def cms_estimate(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    top_k: int = 20,
) -> DataFrame:
    """Count-Min sketch frequency estimates vs truth for the top-k
    keys — the mergeable fixed-memory counter behind streaming
    heavy-hitter dashboards, built with DETERMINISTIC md5 row hashes
    so the sketch state (and therefore this audit) is bit-identical
    in any engine (the portable-hash discipline that made
    minhash/simhash exactly verifiable, dedup.py:84):

        bucket_j(x) = md5(j || '|' || x) mod width,  j < depth
        ĉ(x) = min_j counter[j][bucket_j(x)]   (ĉ ≥ c always)

    Plan: rows collapse to per-key counts ONCE; the sketch is a
    (depth × width)-cell aggregation OVER THOSE (map-combinable — at
    100 TB each executor merges local cells, the exchange moves
    ≤ depth·width rows); candidates come from the deterministic
    (count DESC, key ASC) top-k (TakeOrderedAndProject — never a
    global window); estimates broadcast-join candidates × depth
    against the cells.  Everything is exact integers.

    Returns (key, true_count, cms_count, overestimate), the audit
    that shows collision inflation directly.
    """
    from timeseriesutils_spark.functions.cache import pin

    # per-key counts feed both the sketch cells and the top-k candidate
    # cut — pin so the raw scan+count runs ONCE (the "rows collapse to
    # per-key counts once" contract in the docstring)
    counts = pin(
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    from timeseriesutils_spark.operators.dedup import portable_hash64

    rows = counts.select(
        "key",
        "true_count",
        F.explode(
            F.array(*[F.lit(j) for j in range(depth)])
        ).alias("_j"),
    ).select(
        "key",
        "true_count",
        "_j",
        F.pmod(
            portable_hash64(
                F.concat(
                    F.col("_j").cast("string"), F.lit("|"), F.col("key")
                )
            ),
            F.lit(width),
        ).alias("_b"),
    )
    cells = rows.groupBy("_j", "_b").agg(
        F.sum("true_count").alias("_cell")
    )
    cand = (
        counts.orderBy(F.desc("true_count"), F.asc("key"))
        .limit(top_k)
        .select("key", "true_count")
    )
    cand_rows = cand.select(
        "key",
        "true_count",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("_j"),
    ).select(
        "key",
        "true_count",
        "_j",
        F.pmod(
            portable_hash64(
                F.concat(F.col("_j").cast("string"), F.lit("|"), F.col("key"))
            ),
            F.lit(width),
        ).alias("_b"),
    )
    est = (
        cand_rows.join(F.broadcast(cells), ["_j", "_b"], "inner")
        .groupBy("key")
        .agg(
            F.min("true_count").alias("true_count"),
            F.min("_cell").alias("cms_count"),
        )
    )
    return est.select(
        "key",
        "true_count",
        "cms_count",
        (F.col("cms_count") - F.col("true_count")).alias("overestimate"),
    )


def cms_estimate_sql(
    data_sql: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    top_k: int = 20,
) -> str:
    """DuckDB twin of :func:`cms_estimate` (same md5 cells)."""
    js = ", ".join(str(j) for j in range(depth))
    h = (
        "CAST(CONCAT('0x', substring(md5(CONCAT(CAST(_j AS VARCHAR),"
        " '|', key)), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH counts AS (
  SELECT CAST({key_col} AS VARCHAR) AS key, COUNT(*) AS true_count
  FROM ({data_sql}) WHERE {key_col} IS NOT NULL GROUP BY 1
),
rows_ AS (
  SELECT key, true_count, UNNEST([{js}]) AS _j FROM counts
),
hashed AS (
  SELECT key, true_count, _j, {h} % {width} AS _b FROM rows_
),
cells AS (
  SELECT _j, _b, CAST(SUM(true_count) AS BIGINT) AS _cell
  FROM hashed GROUP BY _j, _b
),
cand AS (
  SELECT key, true_count FROM counts
  ORDER BY true_count DESC, key ASC LIMIT {top_k}
),
cand_rows AS (
  SELECT key, true_count, UNNEST([{js}]) AS _j FROM cand
),
cand_hashed AS (
  SELECT key, true_count, _j, {h} % {width} AS _b FROM cand_rows
),
est AS (
  SELECT key, MIN(true_count) AS true_count, MIN(_cell) AS cms_count
  FROM cand_hashed JOIN cells USING (_j, _b)
  GROUP BY key
)
SELECT key, true_count, cms_count,
  cms_count - true_count AS overestimate
FROM est
"""


# --------------------------------------------------------------------------
# HyperLogLog (deterministic md5 registers -> exact cross-engine twin)
# --------------------------------------------------------------------------


def hll_estimate(
    df: DataFrame,
    key_col: str,
    group_columns,
    b: int = 8,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate vs exact truth,
    with DETERMINISTIC md5 registers — the portable-sketch sibling of
    ``approx_count_distinct`` (Spark's HLL++ state is JVM-internal;
    this one's register array is pure SQL over md5, so the same
    sketch can be built, merged, and audited by ANY engine):

        bucket = first 8 md5 hex bits,  v = next 60 bits
        ρ = 61 − bitlength(v)  (position of the leading 1-bit)
        M_j = max ρ per bucket;  E = α_m m² / Σ_j 2^(−M_j)

    The harmonic sum is kept EXACT: Σ 2^(−M_j) is scaled by 2^61 into
    integers (Σ 2^(61−M_j) ≤ m·2^61 fits DECIMAL(38,0)) — a float sum
    of dyadic terms would be merge-order-dependent, the scaled
    integer sum is not.  The standard small-range correction
    (E ≤ 2.5m with empty registers → m·ln(m/V), ln quantized 1e-9)
    applies; the estimate is floor-quantized at 1e-6 before the
    relative-error division.  Plan: distinct (group, bucket, ρ)
    collapse, m-row register reduce per group — the exchange carries
    registers, never keys.

    Returns (groups…, exact_distinct, hll_count, rel_error).
    """
    groups = _as_list(group_columns)
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    hexb = b // 4  # bucket hex chars (b must be a multiple of 4)
    h = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, hexb), 16, 10).cast("bigint")
    v = F.conv(F.substring(h, hexb + 1, 15), 16, 10).cast("bigint")
    rho = F.when(F.col("_v") > 0, F.lit(61) - F.length(F.bin(F.col("_v")))).otherwise(
        F.lit(61)
    )
    d = df.filter(F.col(key_col).isNotNull()).select(
        *groups, F.col(key_col).cast("string").alias("_k"),
        bucket.alias("_bkt"), v.alias("_v"),
    )
    regs = d.select(*groups, "_bkt", rho.alias("_rho")).groupBy(
        *groups, "_bkt"
    ).agg(F.max("_rho").alias("_m"))
    two61 = F.lit(2305843009213693952).cast("decimal(38,0)")  # 2^61
    per = regs.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("_nb"),
        F.sum(
            F.pow(F.lit(2.0), (F.lit(61) - F.col("_m")).cast("double"))
            .cast("decimal(38,0)")
        ).alias("_zs"),
    )
    exact = d.groupBy(*groups).agg(
        F.countDistinct("_k").alias("exact_distinct")
    )
    out = per.join(exact, groups, "inner")
    md = float(m)
    nb = F.col("_nb").cast("double")
    zeros = F.lit(md) - nb  # empty registers (M_j = 0 -> 2^61 each)
    zs = (
        F.col("_zs").cast("string").cast("double")
        + zeros * F.lit(float(2305843009213693952))
    )
    e_raw = (
        F.lit(alpha * md * md) * F.lit(float(2305843009213693952)) / zs
    )
    vz = zeros  # V = count of empty registers
    ln_corr = F.floor(
        F.lit(md) * F.log(F.lit(md) / vz) * F.lit(1.0e9) + F.lit(0.5)
    ) / F.lit(1.0e9)
    est = F.when(
        (e_raw <= F.lit(2.5 * md)) & (vz > 0), ln_corr
    ).otherwise(e_raw)
    est_q = F.floor(est * F.lit(1.0e6) + F.lit(0.5)) / F.lit(1.0e6)
    dd = F.col("exact_distinct").cast("double")
    return out.select(
        *groups,
        "exact_distinct",
        est_q.alias("hll_count"),
        F.when(F.col("exact_distinct") > 0, (est_q - dd) / dd).alias(
            "rel_error"
        ),
    )


def hll_estimate_sql(
    data_sql: str,
    key_col: str,
    group_columns,
    b: int = 8,
) -> str:
    """DuckDB twin of :func:`hll_estimate` (same md5 registers)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    hexb = b // 4
    md = float(m)
    t61 = "2305843009213693952"
    h = f"md5(CAST({key_col} AS VARCHAR))"
    bucket = f"CAST(CONCAT('0x', substring({h}, 1, {hexb})) AS BIGINT)"
    v = f"CAST(CONCAT('0x', substring({h}, {hexb + 1}, 15)) AS BIGINT)"
    rho = "CASE WHEN _v > 0 THEN 61 - length(bin(_v)) ELSE 61 END"
    nb = "CAST(_nb AS DOUBLE)"
    zeros = f"({dlit(md)} - {nb})"
    zs = (
        f"(CAST(CAST(_zs AS VARCHAR) AS DOUBLE)"
        f" + {zeros} * {dlit(float(2305843009213693952))})"
    )
    e_raw = (
        f"({dlit(alpha * md * md)} * {dlit(float(2305843009213693952))}"
        f" / {zs})"
    )
    ln_corr = (
        f"(FLOOR({dlit(md)} * LN({dlit(md)} / {zeros}) * 1000000000.0"
        f" + 0.5) / 1000000000.0)"
    )
    est = (
        f"(CASE WHEN {e_raw} <= {dlit(2.5 * md)} AND {zeros} > 0"
        f" THEN {ln_corr} ELSE {e_raw} END)"
    )
    est_q = f"(FLOOR({est} * 1000000.0 + 0.5) / 1000000.0)"
    dd = "CAST(exact_distinct AS DOUBLE)"
    return f"""
WITH d AS (
  SELECT {gsel}, CAST({key_col} AS VARCHAR) AS _k,
    {bucket} AS _bkt, {v} AS _v
  FROM ({data_sql}) WHERE {key_col} IS NOT NULL
),
regs AS (
  SELECT {gsel}, _bkt, MAX({rho}) AS _m
  FROM d GROUP BY {gsel}, _bkt
),
per AS (
  SELECT {gsel}, COUNT(*) AS _nb,
    SUM(CAST(POW(2.0, CAST(61 - _m AS DOUBLE)) AS DECIMAL(38,0))) AS _zs
  FROM regs GROUP BY {gsel}
),
ex AS (
  SELECT {gsel}, COUNT(DISTINCT _k) AS exact_distinct
  FROM d GROUP BY {gsel}
)
SELECT {gsel}, exact_distinct,
  {est_q} AS hll_count,
  CASE WHEN exact_distinct > 0 THEN ({est_q} - {dd}) / {dd} END
    AS rel_error
FROM per JOIN ex USING ({gsel})
"""


# --------------------------------------------------------------------------
# KMV (bottom-k) distinct sketch: set-overlap estimates vs exact truth
# --------------------------------------------------------------------------


def kmv_overlap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-overlap audit between groups via KMV (bottom-k)
    sketches — the third portable-md5 sketch beside cms_estimate
    (frequencies) and hll_estimate (cardinality): KMV answers SET
    ALGEBRA — "how much do segment A's keys overlap segment B's?" —
    with k·|groups| state instead of the distinct-key universe:

        sketch(G)  = k smallest md5 hashes of G's distinct keys
        union_k    = k smallest of sketch(A) ∪ sketch(B)
        Ĵ(A,B)     = |union_k ∩ sketch(A) ∩ sketch(B)| / |union_k|

    (the standard KMV Jaccard estimator; ±1/√k error).  Deterministic
    md5 hashes make the sketch — and this audit — bit-identical in any
    engine.  The exact truth side computes true Jaccard per pair so
    the audit shows estimator error directly (the hll_estimate
    pattern).

    Scale: sketches reduce each group to k int64s (a window top-k over
    per-group distinct hashes — the exchange carries distinct keys
    once); the pair table is |G|²/2 rows of k-arrays, driver-scale for
    the segment/source cardinalities this audits.  The exact side is
    one distinct + one equi-join on key, the audit's verify-tier cost.

    Returns (group_a, group_b, exact_jaccard, kmv_jaccard, abs_error,
    k_used).
    """
    from pyspark.sql import Window

    from timeseriesutils_spark.operators.dedup import portable_hash64

    d = df.filter(
        F.col(key_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("_g"),
        F.col(key_col).cast("string").alias("_k"),
    ).distinct()
    hashed = d.select("_g", portable_hash64(F.col("_k")).alias("_h"))
    w = Window.partitionBy("_g").orderBy("_h")
    sk = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("_g")
        .agg(F.sort_array(F.collect_list("_h")).alias("_sk"))
    )
    a = sk.select(F.col("_g").alias("group_a"), F.col("_sk").alias("_ska"))
    b = sk.select(F.col("_g").alias("group_b"), F.col("_sk").alias("_skb"))
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    union_k = F.slice(
        F.array_sort(F.array_union(F.col("_ska"), F.col("_skb"))), 1, k
    )
    inter = F.array_intersect(F.col("_ska"), F.col("_skb"))
    match = F.size(F.array_intersect(union_k, inter))
    est = match.cast("double") / F.size(union_k).cast("double")
    kmv = pairs.select(
        "group_a",
        "group_b",
        est.alias("kmv_jaccard"),
        F.size(union_k).alias("k_used"),
    )
    # exact truth: |A∩B| via one self-join on key, sizes per group
    sizes = d.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    da = d.select(F.col("_g").alias("group_a"), "_k")
    db = d.select(F.col("_g").alias("group_b"), "_k")
    inter_n = (
        da.join(db, "_k")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    truth = (
        inter_n.join(
            F.broadcast(sizes.select(F.col("_g").alias("group_a"),
                                     F.col("_n").alias("_na"))),
            "group_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("_g").alias("group_b"),
                                     F.col("_n").alias("_nb"))),
            "group_b",
        )
        .select(
            "group_a",
            "group_b",
            (
                F.col("_i").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("_i")).cast("double")
            ).alias("exact_jaccard"),
        )
    )
    out = truth.join(F.broadcast(kmv), ["group_a", "group_b"])
    return out.select(
        "group_a",
        "group_b",
        "exact_jaccard",
        "kmv_jaccard",
        F.abs(F.col("kmv_jaccard") - F.col("exact_jaccard")).alias(
            "abs_error"
        ),
        "k_used",
    )


def kmv_overlap_sql(
    data_sql: str,
    key_col: str,
    group_col: str,
    k: int = 256,
) -> str:
    """DuckDB twin of :func:`kmv_overlap` (same md5 bottom-k)."""
    h = (
        "CAST(CONCAT('0x', substring(md5(_k), 1, 15)) AS BIGINT)"
    )
    return f"""
WITH d AS (
  SELECT DISTINCT CAST({group_col} AS VARCHAR) AS _g,
    CAST({key_col} AS VARCHAR) AS _k
  FROM ({data_sql})
  WHERE {key_col} IS NOT NULL AND {group_col} IS NOT NULL
),
hashed AS (SELECT _g, {h} AS _h FROM d),
sk AS (
  SELECT _g, list_sort(list(_h)) AS _sk
  FROM (
    SELECT _g, _h,
      ROW_NUMBER() OVER (PARTITION BY _g ORDER BY _h) AS _rn
    FROM hashed
  ) WHERE _rn <= {k} GROUP BY _g
),
pairs AS (
  SELECT a._g AS group_a, b._g AS group_b, a._sk AS _ska, b._sk AS _skb
  FROM sk a JOIN sk b ON a._g < b._g
),
est AS (
  SELECT group_a, group_b,
    CAST(len(list_intersect(
        list_sort(list_distinct(list_concat(_ska, _skb)))[1:{k}],
        list_intersect(_ska, _skb))) AS DOUBLE)
      / CAST(len(list_sort(list_distinct(list_concat(_ska, _skb)))[1:{k}])
             AS DOUBLE) AS kmv_jaccard,
    CAST(len(list_sort(list_distinct(list_concat(_ska, _skb)))[1:{k}])
         AS INT) AS k_used
  FROM pairs
),
sizes AS (SELECT _g, COUNT(*) AS _n FROM d GROUP BY _g),
inter_n AS (
  SELECT a._g AS group_a, b._g AS group_b, COUNT(*) AS _i
  FROM d a JOIN d b ON a._k = b._k AND a._g < b._g
  GROUP BY 1, 2
),
truth AS (
  SELECT group_a, group_b,
    CAST(_i AS DOUBLE)
      / CAST(na._n + nb._n - _i AS DOUBLE) AS exact_jaccard
  FROM inter_n
  JOIN sizes na ON na._g = group_a
  JOIN sizes nb ON nb._g = group_b
)
SELECT t.group_a, t.group_b, exact_jaccard, kmv_jaccard,
  ABS(kmv_jaccard - exact_jaccard) AS abs_error, k_used
FROM truth t JOIN est USING (group_a, group_b)
"""
