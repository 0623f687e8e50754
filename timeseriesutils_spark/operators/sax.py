"""SAX symbolization (Lin & Keogh): Piecewise Aggregate Approximation
of each group's series followed by Gaussian-breakpoint symbol binning —
the standard symbolic representation behind time-series indexing, motif
discovery, and cheap similarity search ("turn every series into a short
string, then treat it like text").

Pipeline per group (n observations, ``n_segments`` segments, alphabet
size a):

1. rank rows by the time order; segment s = ⌊(rank−1)·S/n⌋;
2. PAA value per segment = mean of the quantized values (exact BIGINT
   segment sums / counts);
3. z-normalize PAA against the group's own mean/std (population form,
   from the group's exact Σq / Σq²);
4. symbol = the z-bin under the standard normal equiprobable
   breakpoints (literal doubles, e.g. a=4 → −0.6745, 0, 0.6745);
5. the group's SAX word = symbols concatenated in segment order.

Exactness: every sum is an exact BIGINT; every double (PAA, mean, std,
z) is one fixed expression over them, identical in the DuckDB twin;
breakpoint comparisons are on identical doubles.  The word assembly is
an ordered string aggregation (collect→sort→join on Spark,
string_agg ORDER BY on DuckDB — both deterministic).

Scale shape: one hash exchange on the group key (rank window + segment
aggregation share it); the z/symbol stage runs on the tiny
(group × segment) relation; the word assembly is a groupBy over ≤
``n_segments`` rows per group.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list, make_window

# equiprobable N(0,1) breakpoints per alphabet size (literal doubles —
# scipy.stats.norm.ppf(i/a) values, hard-coded so no scipy dependency)
BREAKPOINTS = {
    3: [-0.4307272992954576, 0.4307272992954576],
    4: [-0.6744897501960817, 0.0, 0.6744897501960817],
    5: [-0.8416212335729142, -0.2533471031357997, 0.2533471031357997, 0.8416212335729142],
}
ALPHABET = "abcdefghij"


def sax_symbolize(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    n_segments: int = 8,
    alphabet: int = 4,
    scale: int = 0,
) -> DataFrame:
    """One row per group: ``n_obs`` and the group's SAX word
    (``sax`` — a ``n_segments``-char string over ``alphabet`` letters).
    Groups with zero variance emit the all-middle-symbol word guard
    (std = 0 → z undefined → NULL symbols → NULL word, documented)."""
    if alphabet not in BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {sorted(BREAKPOINTS)}")
    g = _as_list(group_columns)
    w = make_window(g, order_by)
    q = F.floor(F.col(column) * F.lit(float(10**scale)) + F.lit(0.5)).cast("bigint")
    # NULL values are dropped BEFORE ranking: rank and count must run on
    # the same row set or the last ranks overflow into a phantom segment
    ranked = (
        data.select(*g, q.alias("_q"), *[F.col(c) for c in _as_list(order_by) if c not in g])
        .filter(F.col("_q").isNotNull())
        .select(*g, "_q", F.row_number().over(w).alias("_rn"))
    )
    seg = F.floor(
        (F.col("_rn") - 1).cast("double")
        * F.lit(float(n_segments))
        / F.count("_q").over(Window.partitionBy(*g)).cast("double")
    ).cast("int")
    # NOTE: count over the unordered partition = group n; computed in the
    # same pass as the rank (shared exchange)
    segged = ranked.select(*g, "_q", seg.alias("_seg"))
    per_seg = segged.groupBy(*g, "_seg").agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum("_q").alias("_s"),
        F.sum(F.col("_q") * F.col("_q")).alias("_s2"),
    )
    wg = Window.partitionBy(*g)
    m = per_seg.select(
        *g,
        "_seg",
        "_c",
        "_s",
        F.sum("_c").over(wg).alias("_n"),
        F.sum("_s").over(wg).alias("_sx"),
        F.sum("_s2").over(wg).alias("_sxx"),
    )
    n_d = F.col("_n").cast("double")
    mean = F.col("_sx").cast("double") / n_d
    var = F.col("_sxx").cast("double") / n_d - mean * mean
    paa = F.col("_s").cast("double") / F.col("_c").cast("double")
    z = F.when(var > 0, (paa - mean) / F.sqrt(var))
    bps = BREAKPOINTS[alphabet]
    sym = None
    for i, b in enumerate(bps):
        clause = F.when(z < F.lit(b), F.lit(ALPHABET[i]))
        sym = clause if sym is None else F.coalesce(sym, clause)
    sym = F.coalesce(sym, F.when(z.isNotNull(), F.lit(ALPHABET[len(bps)])))
    scored = m.select(*g, "_seg", "_n", sym.alias("_sym"))
    word = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("_seg"), F.col("_sym")))),
            lambda e: e["_sym"],
        ),
        "",
    )
    return (
        scored.groupBy(*g)
        .agg(F.max("_n").alias("n_obs"), word.alias("sax"))
        .select(*g, "n_obs", F.when(F.length("sax") == n_segments, F.col("sax")).alias("sax"))
    )


def sax_symbolize_sql(
    relation: str,
    column: str,
    group_columns,
    order_by,
    n_segments: int = 8,
    alphabet: int = 4,
    scale: int = 0,
) -> str:
    """DuckDB twin of :func:`sax_symbolize`."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    order = ", ".join(_as_list(order_by))
    q = f"CAST(FLOOR({column} * {float(10 ** scale)!r} + 0.5) AS BIGINT)"
    bps = BREAKPOINTS[alphabet]
    n_d = "CAST(_n AS DOUBLE)"
    mean = f"(CAST(_sx AS DOUBLE) / {n_d})"
    var = f"(CAST(_sxx AS DOUBLE) / {n_d} - {mean} * {mean})"
    paa = "(CAST(_s AS DOUBLE) / CAST(_c AS DOUBLE))"
    z = f"CASE WHEN {var} > 0 THEN ({paa} - {mean}) / SQRT({var}) END"
    sym_cases = " ".join(
        f"WHEN ({z}) < CAST('{b!r}' AS DOUBLE) THEN '{ALPHABET[i]}'"
        for i, b in enumerate(bps)
    )
    sym = (
        f"CASE {sym_cases} WHEN ({z}) IS NOT NULL THEN '{ALPHABET[len(bps)]}' END"
    )
    return f"""
WITH ranked AS (
  SELECT {gsel}, _q,
    ROW_NUMBER() OVER (PARTITION BY {gsel} ORDER BY {order}) AS _rn,
    COUNT(_q) OVER (PARTITION BY {gsel}) AS _gn
  FROM (SELECT {gsel}, {order}, {q} AS _q FROM {relation})
  WHERE _q IS NOT NULL
), segged AS (
  SELECT {gsel}, _q,
    CAST(FLOOR(CAST(_rn - 1 AS DOUBLE) * {float(n_segments)!r} / CAST(_gn AS DOUBLE)) AS INT) AS _seg
  FROM ranked
), per_seg AS (
  SELECT {gsel}, _seg, COUNT(*) AS _c, SUM(_q) AS _s, SUM(_q * _q) AS _s2
  FROM segged GROUP BY {gsel}, _seg
), m AS (
  SELECT {gsel}, _seg, _c, _s,
    SUM(_c) OVER (PARTITION BY {gsel}) AS _n,
    SUM(_s) OVER (PARTITION BY {gsel}) AS _sx,
    SUM(_s2) OVER (PARTITION BY {gsel}) AS _sxx
  FROM per_seg
), scored AS (
  SELECT {gsel}, _seg, _n, {sym} AS _sym FROM m
), agg AS (
  SELECT {gsel}, CAST(MAX(_n) AS BIGINT) AS n_obs,
    string_agg(_sym, '' ORDER BY _seg) AS sax
  FROM scored GROUP BY {gsel}
)
SELECT {gsel}, n_obs,
  CASE WHEN length(sax) = {n_segments} THEN sax END AS sax
FROM agg
"""
