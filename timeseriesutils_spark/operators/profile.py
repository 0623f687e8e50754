"""Column-level data profiling: per-column null counts, cardinality,
range, and mean in one long-format frame — the data-quality /
schema-drift check every ingestion pipeline runs before training.

One aggregate job per profiled column, unioned (each is a narrow scan
of just that column — column pruning keeps the IO per column minimal);
all partial aggregates are map-side combinable, so the whole profile is
a handful of light reduce stages even at 100 TB.  Numeric min/max/mean
are emitted as DOUBLE and string min/max as VARCHAR in separate fields
— no cross-engine float→string formatting is ever involved.

Exact distinct by default (one shuffle per column); pass
``approximate=True`` for HyperLogLog cardinality (no extra shuffle,
rows-only vs the oracle).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.cache import pin
from timeseriesutils_spark.functions.exact import davg, davg_sql, sq
from timeseriesutils_spark.operators.window_features import _as_list

_NUMERIC_KINDS = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def _is_numeric(df: DataFrame, col: str) -> bool:
    t = dict(df.dtypes)[col]
    return any(t.startswith(k) for k in _NUMERIC_KINDS)


def column_profile(
    df: DataFrame, columns: list[str], approximate: bool = False
) -> DataFrame:
    """Long-format profile: one row per column with ``col_name, n_rows, n_null,
    n_distinct, min_num, max_num, mean_num, min_str, max_str``."""
    parts = []
    for c in columns:
        num = _is_numeric(df, c)
        d = F.col(c).cast("double") if num else None
        parts.append(
            df.select(c).agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("bigint")).alias("n_null"),
                (
                    F.approx_count_distinct(c) if approximate else F.countDistinct(c)
                ).alias("n_distinct"),
                (F.min(d) if num else F.lit(None).cast("double")).alias("min_num"),
                (F.max(d) if num else F.lit(None).cast("double")).alias("max_num"),
                (davg(d) if num else F.lit(None).cast("double")).alias("mean_num"),
                (
                    F.lit(None).cast("string") if num else F.min(F.col(c).cast("string"))
                ).alias("min_str"),
                (
                    F.lit(None).cast("string") if num else F.max(F.col(c).cast("string"))
                ).alias("max_str"),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def column_profile_sql(table: str, columns: list[str], numeric: dict[str, bool]) -> str:
    """DuckDB twin of :func:`column_profile` (exact-distinct form)."""
    parts = []
    for c in columns:
        if numeric[c]:
            mn = f"MIN(CAST({c} AS DOUBLE))"
            mx = f"MAX(CAST({c} AS DOUBLE))"
            me = davg_sql(f"CAST({c} AS DOUBLE)")
            ms = "CAST(NULL AS VARCHAR)"
            xs = "CAST(NULL AS VARCHAR)"
        else:
            mn = "CAST(NULL AS DOUBLE)"
            mx = "CAST(NULL AS DOUBLE)"
            me = "CAST(NULL AS DOUBLE)"
            ms = f"MIN(CAST({c} AS VARCHAR))"
            xs = f"MAX(CAST({c} AS VARCHAR))"
        parts.append(
            f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
  CAST(SUM(CAST({c} IS NULL AS BIGINT)) AS BIGINT) AS n_null,
  COUNT(DISTINCT {c}) AS n_distinct,
  {mn} AS min_num, {mx} AS max_num, {me} AS mean_num,
  {ms} AS min_str, {xs} AS max_str
FROM {table}"""
        )
    return "\nUNION ALL\n".join(parts)


def key_skew_report(
    df: DataFrame, key_cols, count_col_alias: str = "n_rows"
) -> DataFrame:
    """Join/aggregation-key skew diagnostic: the frequency histogram
    that decides whether a key needs salting (functions/skew.py) or AQE
    skew-join splitting BEFORE the expensive shuffle runs.

    Per key-frequency power-of-two bucket (floor(log2(count)) computed
    exactly via binary-string length — no float log edge at 2^k):
    number of distinct keys and total rows.  A healthy key space puts
    most rows in low buckets; a monster key shows up as a lonely
    high bucket carrying a visible row share.

    Two map-combinable aggregations (key counts → bucket rollup);
    output is bucket-count-sized (≤ 64 rows)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_c"))
    bucket = (F.length(F.bin(F.col("_c"))) - 1).cast("int").alias("freq_bucket")
    return (
        per_key.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("_c").alias(count_col_alias),
            F.max("_c").alias("max_key_rows"),
        )
    )


def key_skew_report_sql(
    table: str, key_cols, count_col_alias: str = "n_rows"
) -> str:
    """DuckDB twin of :func:`key_skew_report`."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    kc = ", ".join(keys)
    return f"""
WITH per_key AS (SELECT {kc}, COUNT(*) AS _c FROM {table} GROUP BY {kc})
SELECT CAST(length(bin(_c)) - 1 AS INT) AS freq_bucket,
  COUNT(*) AS n_keys,
  CAST(SUM(_c) AS BIGINT) AS {count_col_alias},
  MAX(_c) AS max_key_rows
FROM per_key GROUP BY 1
"""


def fk_audit(edges) -> DataFrame:
    """Cross-table referential-integrity audit: for each declared
    foreign-key edge (child.fk → parent.pk), the child row count,
    distinct/NULL key counts, and the number of *orphan* rows whose fk
    has no parent — the first data-quality gate any warehouse load runs
    before downstream joins silently drop rows.

    ``edges`` = list of (name, child_df, fk_col, parent_df, pk_col).

    Shape per edge: left join child → distinct parent keys, then ONE
    map-combinable global aggregate (conditional counts) — no
    count-distinct shuffle on the fact side beyond the join itself.
    Parent key sets are deduplicated first (primary keys are unique
    anyway; dedup keeps the audit honest if they are not) and joined
    without a broadcast hint — Catalyst/AQE picks broadcast when the
    parent fits, shuffle join when it doesn't (100 TB: a big dim still
    audits).  Edges union into one |edges|-row report.
    """
    from functools import reduce

    outs = []
    for name, child, fk_col, parent, pk_col in edges:
        pk = parent.select(F.col(pk_col).alias("_pk")).distinct()
        j = child.select(F.col(fk_col).alias("_fk")).join(
            pk, F.col("_fk") == F.col("_pk"), "left"
        )
        outs.append(
            j.agg(
                F.lit(name).alias("edge"),
                F.count(F.lit(1)).alias("child_rows"),
                F.countDistinct("_fk").alias("distinct_keys"),
                F.count(F.when(F.col("_fk").isNull(), F.lit(1))).alias("null_keys"),
                F.count(
                    F.when(F.col("_fk").isNotNull() & F.col("_pk").isNull(), F.lit(1))
                ).alias("orphan_rows"),
            )
        )
    return reduce(DataFrame.unionByName, outs)


def fk_audit_sql(edges) -> str:
    """DuckDB twin of :func:`fk_audit`; ``edges`` = list of
    (name, child_table, fk_col, parent_table, pk_col)."""
    parts = []
    for name, child, fk_col, parent, pk_col in edges:
        parts.append(
            f"""
SELECT '{name}' AS edge,
  COUNT(*) AS child_rows,
  COUNT(DISTINCT c._fk) AS distinct_keys,
  COUNT(CASE WHEN c._fk IS NULL THEN 1 END) AS null_keys,
  COUNT(CASE WHEN c._fk IS NOT NULL AND p._pk IS NULL THEN 1 END) AS orphan_rows
FROM (SELECT {fk_col} AS _fk FROM {child}) c
LEFT JOIN (SELECT DISTINCT {pk_col} AS _pk FROM {parent}) p ON c._fk = p._pk"""
        )
    return "\nUNION ALL\n".join(parts)


def benford_audit(
    data: DataFrame,
    column: str,
    group_columns=None,
    scale: int = 2,
) -> DataFrame:
    """Benford's-law first-digit audit of a positive measure: per
    (group, leading digit 1..9) the observed count, observed fraction,
    Benford's expected fraction log10(1 + 1/d), and the χ² contribution
    (n·(obs_frac − exp_frac)²/exp_frac) — the classic fabricated-data /
    unit-mixing screen for financial measures.

    Digit extraction is integer-exact and engine-portable: quantize to
    BIGINT (floor(v·10^s + 0.5)), render as a digit string, take the
    first character — no log10 boundary hazard (log10(1000) rounding
    differs across libm builds; string length of an integer does not).
    Non-positive and NULL values are excluded.  Expected fractions are
    Python-literal doubles, identical in both expression trees.

    One map-combinable aggregate to (group, digit) ≤ 9·|groups| rows.
    """
    import math

    g = _as_list(group_columns)
    q = F.floor(F.col(column) * F.lit(float(10**scale)) + F.lit(0.5)).cast("bigint")
    digit = F.substring(q.cast("string"), 1, 1).cast("int")
    base = data.select(*g, q.alias("_q"), digit.alias("digit")).filter(
        F.col("_q") > 0
    )
    counts = base.groupBy(*g, "digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = F.sum("n_obs").over(Window.partitionBy(*g))
    obs = F.col("n_obs").cast("double") / tot.cast("double")
    exp_expr = None
    for d in range(1, 10):
        p = math.log10(1.0 + 1.0 / d)
        e = F.when(F.col("digit") == d, F.lit(p))
        exp_expr = e if exp_expr is None else F.coalesce(exp_expr, F.when(F.col("digit") == d, F.lit(p)))
    chi2 = tot.cast("double") * (obs - exp_expr) * (obs - exp_expr) / exp_expr
    return counts.select(
        *g,
        "digit",
        "n_obs",
        obs.alias("obs_frac"),
        exp_expr.alias("benford_frac"),
        chi2.alias("chi2_term"),
    )


def benford_audit_sql(
    table: str,
    column: str,
    group_columns=None,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`benford_audit`."""
    import math

    g = _as_list(group_columns)
    gsel = (", ".join(g) + ", ") if g else ""
    part = f"PARTITION BY {', '.join(g)}" if g else ""
    q = f"CAST(FLOOR({column} * {float(10 ** scale)!r} + 0.5) AS BIGINT)"
    cases = " ".join(
        f"WHEN digit = {d} THEN CAST('{math.log10(1.0 + 1.0 / d)!r}' AS DOUBLE)"
        for d in range(1, 10)
    )
    exp = f"(CASE {cases} END)"
    tot = f"CAST(SUM(n_obs) OVER ({part}) AS DOUBLE)"
    obs = f"(CAST(n_obs AS DOUBLE) / {tot})"
    chi2 = f"{tot} * ({obs} - {exp}) * ({obs} - {exp}) / {exp}"
    return f"""
WITH base AS (
  SELECT {gsel}CAST(substr(CAST(_q AS VARCHAR), 1, 1) AS INT) AS digit
  FROM (SELECT {gsel}{q} AS _q FROM {table}) WHERE _q > 0
), counts AS (
  SELECT {gsel}digit, COUNT(*) AS n_obs FROM base GROUP BY {gsel}digit
)
SELECT {gsel}digit, n_obs,
  {obs} AS obs_frac,
  {exp} AS benford_frac,
  {chi2} AS chi2_term
FROM counts
"""


def psi_drift(
    data: DataFrame,
    column: str,
    period_b,
    group_columns=None,
    bin_width: float = 1.0,
    scale: int = 2,
) -> DataFrame:
    """Population Stability Index between two periods of the same
    column — the standard ML feature-drift monitor ("did this feature's
    distribution move between training and serving?").

    ``period_b``: a boolean Column marking the comparison period (False
    = baseline A, True = current B).  Values are binned integer-exactly
    (floor(quantized / width), the value_entropy convention); per-bin
    counts for A and B come from ONE conditional aggregation; each bin's
    PSI term

        (p_a − p_b) · ln(p_a / p_b)

    uses +0.5 Laplace smoothing (p = (c + 0.5)/(n + 0.5·n_bins)) so a
    bin empty on one side stays finite — the standard remedy, mirrored
    in the twin — and is quantized to 1e-9 int64 units before the
    cross-bin sum (exact integer addition, order-immune).

    Output per group: ``n_a``, ``n_b``, ``n_bins``, ``psi``.  Rule of
    thumb: psi < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major.

    Shape: one map-combinable aggregate to (group, bin), window margins
    over that tiny relation, one group aggregate.
    """
    g = _as_list(group_columns)
    q = F.floor(F.col(column) * F.lit(float(10**scale)) + F.lit(0.5)).cast("bigint")
    width = int(round(bin_width * 10**scale))
    if width <= 0:
        raise ValueError("bin_width too small for scale")
    b = F.floor(q / F.lit(width)).cast("bigint")
    binned = (
        data.select(*g, b.alias("_b"), period_b.cast("int").alias("_isb"))
        .filter(F.col("_b").isNotNull() & F.col("_isb").isNotNull())
        .groupBy(*g, "_b")
        .agg(
            F.count(F.when(F.col("_isb") == 0, F.lit(1))).alias("_ca"),
            F.count(F.when(F.col("_isb") == 1, F.lit(1))).alias("_cb"),
        )
    )
    wg = Window.partitionBy(*g)
    m = binned.select(
        *g,
        "_ca",
        "_cb",
        F.sum("_ca").over(wg).alias("_na"),
        F.sum("_cb").over(wg).alias("_nb"),
        F.count(F.lit(1)).over(wg).alias("_k"),
    )
    ka = F.col("_na").cast("double") + F.lit(0.5) * F.col("_k").cast("double")
    kb = F.col("_nb").cast("double") + F.lit(0.5) * F.col("_k").cast("double")
    pa = (F.col("_ca").cast("double") + F.lit(0.5)) / ka
    pb = (F.col("_cb").cast("double") + F.lit(0.5)) / kb
    term = (pa - pb) * F.log(pa / pb)
    qterm = F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("bigint")
    agg = m.select(*g, "_na", "_nb", "_k", qterm.alias("_q")).groupBy(*g).agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max("_k").alias("n_bins"),
        F.sum("_q").alias("_sq"),
    )
    return agg.select(
        *g,
        "n_a",
        "n_b",
        "n_bins",
        (F.col("_sq").cast("double") / F.lit(1e9)).alias("psi"),
    )


def psi_drift_sql(
    table: str,
    column: str,
    period_b_sql: str,
    group_columns=None,
    bin_width: float = 1.0,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`psi_drift`; ``period_b_sql`` is the boolean
    SQL expression marking period B."""
    g = _as_list(group_columns)
    gsel = (", ".join(g) + ", ") if g else ""
    part = f"PARTITION BY {', '.join(g)}" if g else ""
    width = int(round(bin_width * 10**scale))
    q = f"CAST(FLOOR({column} * {float(10 ** scale)!r} + 0.5) AS BIGINT)"
    b = f"CAST(FLOOR({q} / {width}) AS BIGINT)"
    ka = "(CAST(_na AS DOUBLE) + 0.5 * CAST(_k AS DOUBLE))"
    kb = "(CAST(_nb AS DOUBLE) + 0.5 * CAST(_k AS DOUBLE))"
    pa = f"((CAST(_ca AS DOUBLE) + 0.5) / {ka})"
    pb = f"((CAST(_cb AS DOUBLE) + 0.5) / {kb})"
    term = f"(({pa} - {pb}) * ln({pa} / {pb}))"
    return f"""
WITH binned AS (
  SELECT {gsel}_b,
    COUNT(CASE WHEN _isb = 0 THEN 1 END) AS _ca,
    COUNT(CASE WHEN _isb = 1 THEN 1 END) AS _cb
  FROM (
    SELECT {gsel}{b} AS _b, CAST(({period_b_sql}) AS INT) AS _isb FROM {table}
  ) WHERE _b IS NOT NULL AND _isb IS NOT NULL
  GROUP BY {gsel}_b
), m AS (
  SELECT {gsel}_ca, _cb,
    SUM(_ca) OVER ({part}) AS _na,
    SUM(_cb) OVER ({part}) AS _nb,
    COUNT(*) OVER ({part}) AS _k
  FROM binned
), agg AS (
  SELECT {gsel}CAST(MAX(_na) AS BIGINT) AS n_a, CAST(MAX(_nb) AS BIGINT) AS n_b,
    CAST(MAX(_k) AS BIGINT) AS n_bins,
    SUM(CAST(FLOOR({term} * 1e9 + 0.5) AS BIGINT)) AS _sq
  FROM m GROUP BY {gsel.rstrip(', ') if g else '()'}
)
SELECT {gsel}n_a, n_b, n_bins, CAST(_sq AS DOUBLE) / 1e9 AS psi FROM agg
"""


def constraint_audit(
    df: DataFrame,
    spec: list[dict],
    dims: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Declarative data-contract validation — the write-gate every
    production ingestion runs: evaluate a list of constraints against a
    relation and emit one row per constraint with its violation count.

    ``spec`` entries (``name`` + ``kind`` + kind-specific fields):

    * ``{"kind": "not_null", "col"}`` — NULLs in a required column;
    * ``{"kind": "unique", "cols": [...]}`` — duplicate key tuples
      (violations = rows − distinct tuples);
    * ``{"kind": "in_set", "col", "values": [...]}`` — non-NULL values
      outside an accepted domain;
    * ``{"kind": "range", "col", "lo", "hi"}`` — non-NULL numerics
      outside [lo, hi];
    * ``{"kind": "fk", "col", "dim", "dim_col"}`` — non-NULL keys with
      no match in ``dims[dim]`` (orphans).

    Scale shape: every row-local check (not_null / in_set / range) plus
    every ``unique`` check folds into ONE aggregation pass over the
    table — a single scan however many constraints are declared — then
    unpivots to the long report.  Each ``fk`` adds one left-anti join
    against its (distinct-projected) dimension.  All counts are exact.
    """
    dims = dims or {}
    agg_exprs = [F.count(F.lit(1)).alias("_total")]
    row_checks = []  # (name, kind)
    for c in spec:
        if c["kind"] == "fk":
            continue
        name, kind = c["name"], c["kind"]
        if kind == "not_null":
            v = F.sum(F.col(c["col"]).isNull().cast("bigint"))
        elif kind == "unique":
            cols = list(c["cols"])
            v = F.count(F.lit(1)) - F.count_distinct(F.struct(*cols))
        elif kind == "in_set":
            bad = F.col(c["col"]).isNotNull() & ~F.col(c["col"]).isin(
                list(c["values"])
            )
            v = F.sum(bad.cast("bigint"))
        elif kind == "range":
            col = F.col(c["col"])
            bad = col.isNotNull() & ((col < F.lit(c["lo"])) | (col > F.lit(c["hi"])))
            v = F.sum(bad.cast("bigint"))
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
        agg_exprs.append(F.coalesce(v, F.lit(0)).cast("bigint").alias(f"_v_{name}"))
        row_checks.append((name, kind))
    one = df.agg(*agg_exprs)
    stack_args = ", ".join(
        f"{sq(n)}, {sq(k)}, _v_{n}" for n, k in row_checks
    )
    report = one.selectExpr(
        f"stack({len(row_checks)}, {stack_args}) AS "
        "(constraint_name, kind, violations)",
        "_total AS total",
    )
    parts = [report]
    for c in spec:
        if c["kind"] != "fk":
            continue
        dim = dims[c["dim"]].select(F.col(c["dim_col"]).alias("_dk")).distinct()
        orphans = (
            df.filter(F.col(c["col"]).isNotNull())
            .join(dim, F.col(c["col"]) == F.col("_dk"), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        )
        parts.append(
            orphans.crossJoin(df.agg(F.count(F.lit(1)).alias("total"))).select(
                F.lit(c["name"]).alias("constraint_name"),
                F.lit("fk").alias("kind"),
                "violations",
                "total",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("pass", F.col("violations") == F.lit(0))


def constraint_audit_sql(
    table: str,
    spec: list[dict],
    dim_tables: dict[str, str] | None = None,
) -> str:
    """DuckDB twin of :func:`constraint_audit` (``dim_tables``: dim name
    → table name for fk constraints)."""
    dim_tables = dim_tables or {}
    sel, names = [], []
    for c in spec:
        if c["kind"] == "fk":
            continue
        name, kind = c["name"], c["kind"]
        if kind == "not_null":
            v = f"SUM(CASE WHEN {c['col']} IS NULL THEN 1 ELSE 0 END)"
        elif kind == "unique":
            cols = ", ".join(c["cols"])
            v = f"COUNT(*) - COUNT(DISTINCT ({cols}))"
        elif kind == "in_set":
            vals = ", ".join(sq(x) for x in c["values"])
            v = (
                f"SUM(CASE WHEN {c['col']} IS NOT NULL AND {c['col']} NOT IN ({vals}) "
                "THEN 1 ELSE 0 END)"
            )
        elif kind == "range":
            v = (
                f"SUM(CASE WHEN {c['col']} IS NOT NULL AND "
                f"({c['col']} < {c['lo']} OR {c['col']} > {c['hi']}) THEN 1 ELSE 0 END)"
            )
        sel.append(f"CAST(COALESCE({v}, 0) AS BIGINT) AS _v_{name}")
        names.append((name, kind))
    unions = [
        f"""SELECT '{n}' AS constraint_name, '{k}' AS kind,
  _v_{n} AS violations, _total AS total FROM agg"""
        for n, k in names
    ]
    for c in spec:
        if c["kind"] != "fk":
            continue
        dim = dim_tables[c["dim"]]
        unions.append(
            f"""SELECT '{c['name']}', 'fk',
  (SELECT CAST(COUNT(*) AS BIGINT) FROM {table} t
   WHERE t.{c['col']} IS NOT NULL AND NOT EXISTS
     (SELECT 1 FROM {dim} d WHERE d.{c['dim_col']} = t.{c['col']})),
  (SELECT CAST(COUNT(*) AS BIGINT) FROM {table})"""
        )
    body = "\nUNION ALL\n".join(unions)
    return f"""
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS _total, {', '.join(sel)} FROM {table}
),
rep AS (
{body}
)
SELECT constraint_name, kind, violations, total, violations = 0 AS pass FROM rep
"""


def corr_matrix(
    df: DataFrame,
    columns: list[str],
    scale: int = 2,
) -> DataFrame:
    """Pairwise Pearson correlation matrix over numeric columns in ONE
    aggregation pass — the EDA staple (k columns → k(k−1)/2 pairs from
    k + k + k(k−1)/2 sufficient statistics, never k² scans; Spark's own
    ``df.stat.corr`` does one pair per job).

    Exactness discipline: quantized int64 products accumulate in
    DECIMAL(38,0); decimal→double conversions route via VARCHAR (the
    >2^53 portable-cast rule, see operators/stats.anova_oneway); the
    correlation formula is one shared double tree.  Constant columns
    yield NULL correlations.

    Returns long format: (col_a, col_b, n, corr) for a < b.
    """
    m = 10**scale
    q = lambda c: F.floor(F.col(c) * F.lit(m) + F.lit(0.5)).cast("bigint")  # noqa: E731
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # listwise deletion: one shared n must count exactly the rows every
    # sum sees, else NULLs deflate the moments (ADVICE r4)
    notnull = reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in columns]
    )
    d = df.filter(notnull).select(*[q(c).alias(f"_q_{c}") for c in columns])
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in columns:
        aggs.append(F.sum(dec(F.col(f"_q_{c}"))).alias(f"_s_{c}"))
        aggs.append(
            F.sum(dec(F.col(f"_q_{c}") * F.col(f"_q_{c}"))).alias(f"_ss_{c}")
        )
    pairs = [
        (a, b) for i, a in enumerate(columns) for b in columns[i + 1:]
    ]
    for a, b in pairs:
        aggs.append(
            F.sum(dec(F.col(f"_q_{a}") * F.col(f"_q_{b}"))).alias(f"_sp_{a}_{b}")
        )
    one = d.agg(*aggs)
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")
    rows = []
    for a, b in pairs:
        cov = nn * s2d(f"_sp_{a}_{b}") - s2d(f"_s_{a}") * s2d(f"_s_{b}")
        va = nn * s2d(f"_ss_{a}") - s2d(f"_s_{a}") * s2d(f"_s_{a}")
        vb = nn * s2d(f"_ss_{b}") - s2d(f"_s_{b}") * s2d(f"_s_{b}")
        corr = F.when((va != 0) & (vb != 0), cov / F.sqrt(va * vb))
        rows.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col("n").alias("n"),
                corr.alias("corr"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.col_a", "r.col_b", "r.n", "r.corr"
    )


def corr_matrix_sql(
    table: str,
    columns: list[str],
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`corr_matrix`."""
    m = 10**scale
    qq = lambda c: f"CAST(FLOOR({c} * {m} + 0.5) AS BIGINT)"  # noqa: E731
    sel = ["COUNT(*) AS n"]
    for c in columns:
        sel.append(f"SUM({qq(c)}) AS _s_{c}")
        sel.append(f"SUM({qq(c)} * {qq(c)}) AS _ss_{c}")
    pairs = [(a, b) for i, a in enumerate(columns) for b in columns[i + 1:]]
    for a, b in pairs:
        sel.append(f"SUM({qq(a)} * {qq(b)}) AS _sp_{a}_{b}")
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    unions = []
    for a, b in pairs:
        cov = f"(CAST(n AS DOUBLE) * {s2d(f'_sp_{a}_{b}')} - {s2d(f'_s_{a}')} * {s2d(f'_s_{b}')})"
        va = f"(CAST(n AS DOUBLE) * {s2d(f'_ss_{a}')} - {s2d(f'_s_{a}')} * {s2d(f'_s_{a}')})"
        vb = f"(CAST(n AS DOUBLE) * {s2d(f'_ss_{b}')} - {s2d(f'_s_{b}')} * {s2d(f'_s_{b}')})"
        unions.append(
            f"""SELECT '{a}' AS col_a, '{b}' AS col_b, n,
  CASE WHEN {va} <> 0 AND {vb} <> 0 THEN {cov} / sqrt({va} * {vb}) END AS corr
FROM agg"""
        )
    body = "\nUNION ALL\n".join(unions)
    where = " AND ".join(f"{c} IS NOT NULL" for c in columns)
    return f"""
WITH agg AS (SELECT {', '.join(sel)} FROM {table} WHERE {where})
{body}
"""


def fd_audit(
    df: DataFrame,
    dependencies: list[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency audit: for each claimed ``A → B``, count
    the A-values that map to MORE than one distinct B — the schema-
    discovery / normalization check ("is p_brand really determined by
    p_partkey?", "does user imply country?").  Zero violations = the
    dependency holds exactly.

    One determinant-keyed aggregation per dependency (map-combinable
    count-distinct), then a one-row summary each, unioned.  Exact
    integer counts only.

    Returns (determinant, dependent, n_keys, violating_keys, holds).
    """
    parts = []
    for det, dep in dependencies:
        per = df.groupBy(det).agg(F.count_distinct(F.col(dep)).alias("_nd"))
        parts.append(
            per.agg(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum((F.col("_nd") > 1).cast("bigint")).alias("violating_keys"),
            ).withColumn("holds", F.col("violating_keys") == 0)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fd_audit_sql(table: str, dependencies: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`fd_audit`."""
    unions = []
    for det, dep in dependencies:
        unions.append(
            f"""SELECT '{det}' AS determinant, '{dep}' AS dependent,
  COUNT(*) AS n_keys,
  CAST(SUM(CASE WHEN _nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_keys,
  SUM(CASE WHEN _nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS _nd FROM {table} GROUP BY {det})"""
        )
    return "\nUNION ALL\n".join(unions)


def id_gap_audit(
    df: DataFrame,
    id_col: str,
    group_columns=None,
) -> DataFrame:
    """Sequence-gap audit over a should-be-dense id column: find every
    missing id range — the ingestion data-loss detector (dropped
    events, lost files, producer restarts) for monotonically-assigned
    ids.  Gaps-and-islands on the DISTINCT sorted ids: a LAG per
    series, emit one row per hole.

    One (group)-keyed exchange over the distinct ids; output is bounded
    by the number of holes, not the id range.

    Returns (groups…, gap_start, gap_end, missing) — the inclusive
    missing range and its size.
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    d = df.select(*groups, F.col(id_col).alias("_id")).distinct()
    w = Window.partitionBy(*groups).orderBy("_id") if groups else Window.orderBy("_id")
    d = d.withColumn("_prev", F.lag("_id").over(w))
    return (
        d.filter(F.col("_prev").isNotNull() & (F.col("_id") - F.col("_prev") > 1))
        .select(
            *groups,
            (F.col("_prev") + 1).alias("gap_start"),
            (F.col("_id") - 1).alias("gap_end"),
            (F.col("_id") - F.col("_prev") - 1).alias("missing"),
        )
    )


def id_gap_audit_sql(table: str, id_col: str, group_columns=None) -> str:
    """DuckDB twin of :func:`id_gap_audit`."""
    from timeseriesutils_spark.operators.window_features import _as_list

    groups = _as_list(group_columns)
    g = ", ".join(groups)
    gsel = f"{g}, " if groups else ""
    part = f"PARTITION BY {g} " if groups else ""
    return f"""
WITH d AS (SELECT DISTINCT {gsel}{id_col} AS _id FROM {table}),
l AS (
  SELECT *, LAG(_id) OVER ({part}ORDER BY _id) AS _prev FROM d
)
SELECT {gsel}_prev + 1 AS gap_start, _id - 1 AS gap_end,
  _id - _prev - 1 AS missing
FROM l WHERE _prev IS NOT NULL AND _id - _prev > 1
"""


def psi_drift_curve(
    data: DataFrame,
    column: str,
    period_col: str,
    baseline_end,
    bin_width: float = 1.0,
    scale: int = 2,
) -> DataFrame:
    """Temporal drift monitor: PSI of ``column`` for EVERY evaluation
    period against one fixed baseline — the "when did the feature start
    drifting" curve, where :func:`psi_drift` answers for a single split.

    ``period_col`` is an integer period index; periods < ``baseline_end``
    pool into the baseline, each later period gets its own PSI row.
    Same binning, +0.5 Laplace smoothing, and 1e-9 term quantization as
    psi_drift; per period, the bin universe is bins(baseline) ∪
    bins(period) — built by a (periods × baseline-bins) scaffold plus
    the period's own bins, so the fact table is scanned ONCE into
    (period, bin) counts and all PSI algebra runs on that tiny relation
    with the baseline margins broadcast.

    Returns one row per evaluation period: (period, n_a, n_b, n_bins,
    psi).
    """
    q = F.floor(F.col(column) * F.lit(float(10**scale)) + F.lit(0.5)).cast("bigint")
    width = int(round(bin_width * 10**scale))
    if width <= 0:
        raise ValueError("bin_width too small for scale")
    b = F.floor(q / F.lit(width)).cast("bigint")
    binned = pin(
        data.select(
            F.col(period_col).cast("bigint").alias("_m"), b.alias("_b")
        )
        .filter(F.col("_b").isNotNull() & F.col("_m").isNotNull())
        .groupBy("_m", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    bl = binned.filter(F.col("_m") < baseline_end).groupBy("_b").agg(
        F.sum("_c").alias("_ca")
    )
    ev = binned.filter(F.col("_m") >= baseline_end).select(
        "_m", "_b", F.col("_c").alias("_cb")
    )
    months = ev.select("_m").distinct()
    scaffold = (
        months.crossJoin(F.broadcast(bl.select("_b")))
        .unionByName(ev.select("_m", "_b"))
        .distinct()
    )
    j = (
        scaffold.join(F.broadcast(ev), on=["_m", "_b"], how="left")
        .join(F.broadcast(bl), on="_b", how="left")
        .select(
            "_m",
            "_b",
            F.coalesce("_ca", F.lit(0).cast("bigint")).alias("_ca"),
            F.coalesce("_cb", F.lit(0).cast("bigint")).alias("_cb"),
        )
    )
    wg = Window.partitionBy("_m")
    m = j.select(
        "_m",
        "_ca",
        "_cb",
        F.sum("_ca").over(wg).alias("_na"),
        F.sum("_cb").over(wg).alias("_nb"),
        F.count(F.lit(1)).over(wg).alias("_k"),
    )
    ka = F.col("_na").cast("double") + F.lit(0.5) * F.col("_k").cast("double")
    kb = F.col("_nb").cast("double") + F.lit(0.5) * F.col("_k").cast("double")
    pa = (F.col("_ca").cast("double") + F.lit(0.5)) / ka
    pb = (F.col("_cb").cast("double") + F.lit(0.5)) / kb
    term = (pa - pb) * F.log(pa / pb)
    qterm = F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("bigint")
    agg = m.select("_m", "_na", "_nb", "_k", qterm.alias("_q")).groupBy("_m").agg(
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
        F.max("_k").alias("n_bins"),
        F.sum("_q").alias("_sq"),
    )
    return agg.select(
        F.col("_m").alias("period"),
        "n_a",
        "n_b",
        "n_bins",
        (F.col("_sq").cast("double") / F.lit(1e9)).alias("psi"),
    )


def psi_drift_curve_sql(
    table_sql: str,
    column: str,
    period_col: str,
    baseline_end,
    bin_width: float = 1.0,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`psi_drift_curve`; ``table_sql`` produces
    (period_col, column)."""
    q = f"CAST(FLOOR({column} * {float(10 ** scale)!r} + 0.5) AS BIGINT)"
    width = int(round(bin_width * 10**scale))
    b = f"CAST(FLOOR({q} / {width}) AS BIGINT)"
    ka = "(CAST(_na AS DOUBLE) + 0.5 * CAST(_k AS DOUBLE))"
    kb = "(CAST(_nb AS DOUBLE) + 0.5 * CAST(_k AS DOUBLE))"
    pa = f"((CAST(_ca AS DOUBLE) + 0.5) / {ka})"
    pb = f"((CAST(_cb AS DOUBLE) + 0.5) / {kb})"
    term = f"(({pa} - {pb}) * ln({pa} / {pb}))"
    return f"""
WITH binned AS (
  SELECT _m, _b, COUNT(*) AS _c
  FROM (
    SELECT CAST({period_col} AS BIGINT) AS _m, {b} AS _b FROM ({table_sql})
  ) WHERE _b IS NOT NULL AND _m IS NOT NULL
  GROUP BY 1, 2
),
bl AS (
  SELECT _b, CAST(SUM(_c) AS BIGINT) AS _ca FROM binned
  WHERE _m < {baseline_end} GROUP BY 1
),
ev AS (SELECT _m, _b, _c AS _cb FROM binned WHERE _m >= {baseline_end}),
scaffold AS (
  SELECT m._m, b._b FROM (SELECT DISTINCT _m FROM ev) m CROSS JOIN bl b
  UNION SELECT _m, _b FROM ev
),
j AS (
  SELECT s._m, s._b,
    COALESCE(bl._ca, 0) AS _ca, COALESCE(ev._cb, 0) AS _cb
  FROM scaffold s
  LEFT JOIN ev ON ev._m = s._m AND ev._b = s._b
  LEFT JOIN bl ON bl._b = s._b
),
m AS (
  SELECT _m, _ca, _cb,
    CAST(SUM(_ca) OVER (PARTITION BY _m) AS BIGINT) AS _na,
    CAST(SUM(_cb) OVER (PARTITION BY _m) AS BIGINT) AS _nb,
    COUNT(*) OVER (PARTITION BY _m) AS _k
  FROM j
),
agg AS (
  SELECT _m, CAST(MAX(_na) AS BIGINT) AS n_a, CAST(MAX(_nb) AS BIGINT) AS n_b,
    CAST(MAX(_k) AS BIGINT) AS n_bins,
    CAST(SUM(CAST(FLOOR({term} * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS _sq
  FROM m GROUP BY _m
)
SELECT _m AS period, n_a, n_b, n_bins, CAST(_sq AS DOUBLE) / 1e9 AS psi
FROM agg
"""


def vif_audit(
    df: DataFrame,
    columns: list[str],
    scale: int = 2,
) -> DataFrame:
    """Variance-inflation-factor audit over a 3-feature set — the
    multicollinearity screen a feature pipeline runs before fitting
    (grouped_ols2's standard errors silently explode when regressors
    are collinear; VIF_j = 1/(1−R²_j) is the per-feature number that
    says WHICH one to drop; > 5-10 is the usual flag):

        VIF_j = [R⁻¹]_jj   over the Pearson correlation matrix R

    For p = 3 the inverse diagonal is closed-form in the three
    pairwise correlations (det = 1 + 2·r₁₂r₁₃r₂₃ − r₁₂² − r₁₃² −
    r₂₃²; VIF_1 = (1 − r₂₃²)/det, cyclically) — the SAME one-pass
    exact sufficient statistics as corr_matrix, then one fixed double
    tree per feature, so the twin is bit-identical.  For larger p the
    documented scale path is this same single-pass Gram aggregation +
    a driver-side p×p inverse (p is a feature count, never data-sized);
    the closed form keeps the CROSS-ENGINE-verifiable contract.

    Returns (feature, n, r_squared, vif, flag_5) — NULL when a
    feature is constant or the matrix is singular.
    """
    if len(columns) != 3:
        raise ValueError("vif_audit closed form takes exactly 3 columns")
    m = 10**scale
    q = lambda c: F.floor(F.col(c) * F.lit(m) + F.lit(0.5)).cast("bigint")  # noqa: E731
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    notnull = reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in columns]
    )
    d = df.filter(notnull).select(
        *[q(c).alias(f"_q{i}") for i, c in enumerate(columns)]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(3):
        aggs.append(F.sum(dec(F.col(f"_q{i}"))).alias(f"_s{i}"))
        aggs.append(
            F.sum(dec(F.col(f"_q{i}") * F.col(f"_q{i}"))).alias(f"_ss{i}")
        )
    for i, j in ((0, 1), (0, 2), (1, 2)):
        aggs.append(
            F.sum(dec(F.col(f"_q{i}") * F.col(f"_q{j}"))).alias(f"_sp{i}{j}")
        )
    one = d.agg(*aggs)
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")

    def corr(i, j):
        cov = nn * s2d(f"_sp{i}{j}") - s2d(f"_s{i}") * s2d(f"_s{j}")
        va = nn * s2d(f"_ss{i}") - s2d(f"_s{i}") * s2d(f"_s{i}")
        vb = nn * s2d(f"_ss{j}") - s2d(f"_s{j}") * s2d(f"_s{j}")
        return F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb))

    # chained selects, not one nested tree: det/vif reuse each r twice
    # and each r is itself a wide tree — inlined, the single-row plan
    # blew past janino's method limit (interpreted fallback)
    cors = one.select(
        "n",
        corr(0, 1).alias("_r12"),
        corr(0, 2).alias("_r13"),
        corr(1, 2).alias("_r23"),
    )
    r12, r13, r23 = F.col("_r12"), F.col("_r13"), F.col("_r23")
    withdet = cors.select(
        "*",
        (
            F.lit(1.0)
            + F.lit(2.0) * r12 * r13 * r23
            - r12 * r12 - r13 * r13 - r23 * r23
        ).alias("_det"),
    )
    det = F.col("_det")
    opp = {0: r23, 1: r13, 2: r12}
    rows = []
    for i, c in enumerate(columns):
        o = opp[i]
        vif = F.when(det != 0, (F.lit(1.0) - o * o) / det)
        rows.append(
            F.struct(
                F.lit(c).alias("feature"),
                F.col("n").alias("n"),
                (F.lit(1.0) - F.lit(1.0) / vif).alias("r_squared"),
                vif.alias("vif"),
                (vif > F.lit(5.0)).alias("flag_5"),
            )
        )
    return withdet.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.feature", "r.n", "r.r_squared", "r.vif", "r.flag_5"
    )


def vif_audit_sql(
    table: str,
    columns: list[str],
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`vif_audit` (same Gram pass, same closed
    form)."""
    if len(columns) != 3:
        raise ValueError("vif_audit closed form takes exactly 3 columns")
    m = 10**scale
    qq = lambda c: f"CAST(FLOOR({c} * {m} + 0.5) AS BIGINT)"  # noqa: E731
    sel = ["COUNT(*) AS n"]
    for i, c in enumerate(columns):
        sel.append(f"SUM({qq(c)}) AS _s{i}")
        sel.append(f"SUM({qq(c)} * {qq(c)}) AS _ss{i}")
    for i, j in ((0, 1), (0, 2), (1, 2)):
        a, b = columns[i], columns[j]
        sel.append(f"SUM({qq(a)} * {qq(b)}) AS _sp{i}{j}")
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731

    def corr(i, j):
        cov = (f"(CAST(n AS DOUBLE) * {s2d(f'_sp{i}{j}')} - "
               f"{s2d(f'_s{i}')} * {s2d(f'_s{j}')})")
        va = (f"(CAST(n AS DOUBLE) * {s2d(f'_ss{i}')} - "
              f"{s2d(f'_s{i}')} * {s2d(f'_s{i}')})")
        vb = (f"(CAST(n AS DOUBLE) * {s2d(f'_ss{j}')} - "
              f"{s2d(f'_s{j}')} * {s2d(f'_s{j}')})")
        return (f"(CASE WHEN {va} > 0 AND {vb} > 0 "
                f"THEN {cov} / sqrt({va} * {vb}) END)")

    r12, r13, r23 = corr(0, 1), corr(0, 2), corr(1, 2)
    det = (f"(1.0 + 2.0 * {r12} * {r13} * {r23}"
           f" - {r12} * {r12} - {r13} * {r13} - {r23} * {r23})")
    opp = {0: r23, 1: r13, 2: r12}
    unions = []
    for i, c in enumerate(columns):
        vif = (f"(CASE WHEN {det} <> 0 "
               f"THEN (1.0 - {opp[i]} * {opp[i]}) / {det} END)")
        unions.append(
            f"""SELECT '{c}' AS feature, n,
  (1.0 - 1.0 / {vif}) AS r_squared,
  {vif} AS vif,
  ({vif} > 5.0) AS flag_5
FROM agg"""
        )
    body = "\nUNION ALL\n".join(unions)
    where = " AND ".join(f"{c} IS NOT NULL" for c in columns)
    return f"""
WITH agg AS (SELECT {', '.join(sel)} FROM {table} WHERE {where})
{body}
"""


def partial_corr(
    df: DataFrame,
    columns: list[str],
    scale: int = 2,
) -> DataFrame:
    """Partial Pearson correlations over a 3-feature set — "do x and y
    still move together once z is held fixed?" (the confounder screen
    beside corr_matrix's raw pairs and vif_audit's inflation factors;
    a strong r_xy that vanishes partialled on z is z's doing):

        r_xy·z = (r_xy − r_xz·r_yz) / √((1 − r_xz²)(1 − r_yz²))

    Same ONE-pass exact Gram statistics as corr_matrix/vif_audit, one
    closed-form row per (pair | control) rotation, chained selects
    (the janino-width lesson).  NULL when a feature is constant or a
    control correlation is ±1.

    Returns (col_a, col_b, control, n, r_raw, r_partial).
    """
    if len(columns) != 3:
        raise ValueError("partial_corr closed form takes exactly 3 columns")
    m = 10**scale
    q = lambda c: F.floor(F.col(c) * F.lit(m) + F.lit(0.5)).cast("bigint")  # noqa: E731
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    notnull = reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in columns]
    )
    d = df.filter(notnull).select(
        *[q(c).alias(f"_q{i}") for i, c in enumerate(columns)]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(3):
        aggs.append(F.sum(dec(F.col(f"_q{i}"))).alias(f"_s{i}"))
        aggs.append(
            F.sum(dec(F.col(f"_q{i}") * F.col(f"_q{i}"))).alias(f"_ss{i}")
        )
    for i, j in ((0, 1), (0, 2), (1, 2)):
        aggs.append(
            F.sum(dec(F.col(f"_q{i}") * F.col(f"_q{j}"))).alias(f"_sp{i}{j}")
        )
    one = d.agg(*aggs)
    s2d = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    nn = F.col("n").cast("double")

    def corr(i, j):
        i, j = min(i, j), max(i, j)
        cov = nn * s2d(f"_sp{i}{j}") - s2d(f"_s{i}") * s2d(f"_s{j}")
        va = nn * s2d(f"_ss{i}") - s2d(f"_s{i}") * s2d(f"_s{i}")
        vb = nn * s2d(f"_ss{j}") - s2d(f"_s{j}") * s2d(f"_s{j}")
        return F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb))

    cors = one.select(
        "n",
        corr(0, 1).alias("_r01"),
        corr(0, 2).alias("_r02"),
        corr(1, 2).alias("_r12"),
    )
    r = {
        (0, 1): F.col("_r01"),
        (0, 2): F.col("_r02"),
        (1, 2): F.col("_r12"),
    }
    rows = []
    for (i, j), k in (((0, 1), 2), ((0, 2), 1), ((1, 2), 0)):
        rxy = r[(i, j)]
        rxz = r[tuple(sorted((i, k)))]
        ryz = r[tuple(sorted((j, k)))]
        den2 = (F.lit(1.0) - rxz * rxz) * (F.lit(1.0) - ryz * ryz)
        part = F.when(den2 > 0, (rxy - rxz * ryz) / F.sqrt(den2))
        rows.append(
            F.struct(
                F.lit(columns[i]).alias("col_a"),
                F.lit(columns[j]).alias("col_b"),
                F.lit(columns[k]).alias("control"),
                F.col("n").alias("n"),
                rxy.alias("r_raw"),
                part.alias("r_partial"),
            )
        )
    return cors.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.col_a", "r.col_b", "r.control", "r.n", "r.r_raw", "r.r_partial"
    )


def partial_corr_sql(
    table: str,
    columns: list[str],
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`partial_corr`."""
    if len(columns) != 3:
        raise ValueError("partial_corr closed form takes exactly 3 columns")
    m = 10**scale
    qq = lambda c: f"CAST(FLOOR({c} * {m} + 0.5) AS BIGINT)"  # noqa: E731
    sel = ["COUNT(*) AS n"]
    for i, c in enumerate(columns):
        sel.append(f"SUM({qq(c)}) AS _s{i}")
        sel.append(f"SUM({qq(c)} * {qq(c)}) AS _ss{i}")
    for i, j in ((0, 1), (0, 2), (1, 2)):
        a, b = columns[i], columns[j]
        sel.append(f"SUM({qq(a)} * {qq(b)}) AS _sp{i}{j}")
    s2d = lambda c: f"CAST(CAST({c} AS VARCHAR) AS DOUBLE)"  # noqa: E731

    def corr(i, j):
        i, j = min(i, j), max(i, j)
        cov = (f"(CAST(n AS DOUBLE) * {s2d(f'_sp{i}{j}')} - "
               f"{s2d(f'_s{i}')} * {s2d(f'_s{j}')})")
        va = (f"(CAST(n AS DOUBLE) * {s2d(f'_ss{i}')} - "
              f"{s2d(f'_s{i}')} * {s2d(f'_s{i}')})")
        vb = (f"(CAST(n AS DOUBLE) * {s2d(f'_ss{j}')} - "
              f"{s2d(f'_s{j}')} * {s2d(f'_s{j}')})")
        return (f"(CASE WHEN {va} > 0 AND {vb} > 0 "
                f"THEN {cov} / sqrt({va} * {vb}) END)")

    cors = (f"SELECT n, {corr(0, 1)} AS _r01, {corr(0, 2)} AS _r02, "
            f"{corr(1, 2)} AS _r12 FROM agg")
    rname = {(0, 1): "_r01", (0, 2): "_r02", (1, 2): "_r12"}
    unions = []
    for (i, j), k in (((0, 1), 2), ((0, 2), 1), ((1, 2), 0)):
        rxy = rname[(i, j)]
        rxz = rname[tuple(sorted((i, k)))]
        ryz = rname[tuple(sorted((j, k)))]
        den2 = f"((1.0 - {rxz} * {rxz}) * (1.0 - {ryz} * {ryz}))"
        part = (f"(CASE WHEN {den2} > 0 "
                f"THEN ({rxy} - {rxz} * {ryz}) / sqrt({den2}) END)")
        unions.append(
            f"""SELECT '{columns[i]}' AS col_a, '{columns[j]}' AS col_b,
  '{columns[k]}' AS control, n, {rxy} AS r_raw, {part} AS r_partial
FROM cors"""
        )
    body = "\nUNION ALL\n".join(unions)
    where = " AND ".join(f"{c} IS NOT NULL" for c in columns)
    return f"""
WITH agg AS (SELECT {', '.join(sel)} FROM {table} WHERE {where}),
cors AS ({cors})
{body}
"""


def mutual_info(
    df: DataFrame,
    col_x: str,
    col_y: str,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns, with
    the normalized coefficient — the dependence/leakage screen for
    categorical pairs (corr_matrix only sees numerics; categorical_assoc
    reports Cramér's V from χ²; MI is the information-theoretic number
    feature-selection and label-leakage audits threshold):

        I(X;Y) = Σ_xy p_xy·ln(p_xy / (p_x·p_y)),
        NMI = I / min(H(X), H(Y))   (0 = independent, 1 = determined)

    Exactness: all cell/marginal counts are exact int64; each cell's
    ln argument n_xy·N/(n_x·n_y) is a fixed double tree of exact ints,
    the ln and the weighted term quantize at 1e-9 and sum as integers
    (unordered-sum discipline); H(X), H(Y) use the same kernel.  One
    (x,y) collapse + two marginal rollups + broadcast joins — cell
    cardinality |X|·|Y| is the only size that matters.

    Returns one row: (n, k_x, k_y, h_x, h_y, mi, nmi).
    """
    d = df.filter(
        F.col(col_x).isNotNull() & F.col(col_y).isNotNull()
    ).select(F.col(col_x).alias("_x"), F.col(col_y).alias("_y"))
    cells = d.groupBy("_x", "_y").agg(F.count(F.lit(1)).alias("_nxy"))
    mx = cells.groupBy("_x").agg(F.sum("_nxy").alias("_nx"))
    my = cells.groupBy("_y").agg(F.sum("_nxy").alias("_ny"))
    tot = cells.agg(
        F.sum("_nxy").alias("_n"), F.count(F.lit(1)).alias("k_cells")
    )
    q9 = F.lit(1.0e9)

    def _hterm(cnt, n):
        p = cnt.cast("double") / n.cast("double")
        lnq = F.floor(F.log(p) * q9 + F.lit(0.5)) / q9
        return F.floor(-p * lnq * q9 + F.lit(0.5)).cast("decimal(38,0)")

    j = (
        cells.join(F.broadcast(mx), on="_x")
        .join(F.broadcast(my), on="_y")
        .crossJoin(F.broadcast(tot))
    )
    arg = (
        F.col("_nxy").cast("double") * F.col("_n").cast("double")
        / (F.col("_nx").cast("double") * F.col("_ny").cast("double"))
    )
    lnq = F.floor(F.log(arg) * q9 + F.lit(0.5)) / q9
    p_xy = F.col("_nxy").cast("double") / F.col("_n").cast("double")
    mterm = F.floor(p_xy * lnq * q9 + F.lit(0.5)).cast("decimal(38,0)")
    mi_sum = j.agg(F.sum(mterm).alias("_mi")).crossJoin(F.broadcast(tot))
    hx = mx.crossJoin(F.broadcast(tot)).agg(
        F.sum(_hterm(F.col("_nx"), F.col("_n"))).alias("_hx"),
        F.count(F.lit(1)).alias("k_x"),
    )
    hy = my.crossJoin(F.broadcast(tot)).agg(
        F.sum(_hterm(F.col("_ny"), F.col("_n"))).alias("_hy"),
        F.count(F.lit(1)).alias("k_y"),
    )
    out = mi_sum.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    s2d = lambda c: F.col(c).cast("string").cast("double") / F.lit(1.0e9)  # noqa: E731
    mi = s2d("_mi")
    hmin = F.least(s2d("_hx"), s2d("_hy"))
    return out.select(
        F.col("_n").alias("n"),
        "k_x",
        "k_y",
        s2d("_hx").alias("h_x"),
        s2d("_hy").alias("h_y"),
        mi.alias("mi"),
        F.when(hmin > 0, mi / hmin).otherwise(F.lit(0.0)).alias("nmi"),
    )


def mutual_info_sql(
    data_sql: str,
    col_x: str,
    col_y: str,
) -> str:
    """DuckDB twin of :func:`mutual_info` (same quantized kernels)."""
    q9 = "1000000000.0"

    def hterm(cnt, n):
        p = f"(CAST({cnt} AS DOUBLE) / CAST({n} AS DOUBLE))"
        lnq = f"(FLOOR(LN({p}) * {q9} + 0.5) / {q9})"
        return f"CAST(FLOOR(-{p} * {lnq} * {q9} + 0.5) AS DECIMAL(38,0))"

    arg = ("(CAST(_nxy AS DOUBLE) * CAST(_n AS DOUBLE)"
           " / (CAST(_nx AS DOUBLE) * CAST(_ny AS DOUBLE)))")
    lnq = f"(FLOOR(LN({arg}) * {q9} + 0.5) / {q9})"
    p_xy = "(CAST(_nxy AS DOUBLE) / CAST(_n AS DOUBLE))"
    mterm = f"CAST(FLOOR({p_xy} * {lnq} * {q9} + 0.5) AS DECIMAL(38,0))"
    s2d = lambda c: f"(CAST(CAST({c} AS VARCHAR) AS DOUBLE) / {q9})"  # noqa: E731
    mi = s2d("_mi")
    hmin = f"LEAST({s2d('_hx')}, {s2d('_hy')})"
    return f"""
WITH d AS (
  SELECT {col_x} AS _x, {col_y} AS _y FROM ({data_sql})
  WHERE {col_x} IS NOT NULL AND {col_y} IS NOT NULL
),
cells AS (SELECT _x, _y, COUNT(*) AS _nxy FROM d GROUP BY _x, _y),
mx AS (SELECT _x, CAST(SUM(_nxy) AS BIGINT) AS _nx FROM cells GROUP BY _x),
my AS (SELECT _y, CAST(SUM(_nxy) AS BIGINT) AS _ny FROM cells GROUP BY _y),
tot AS (
  SELECT CAST(SUM(_nxy) AS BIGINT) AS _n, COUNT(*) AS k_cells FROM cells
),
misum AS (
  SELECT CAST(SUM({mterm}) AS DECIMAL(38,0)) AS _mi
  FROM cells JOIN mx USING (_x) JOIN my USING (_y) CROSS JOIN tot
),
hx AS (
  SELECT CAST(SUM({hterm('_nx', '_n')}) AS DECIMAL(38,0)) AS _hx,
    COUNT(*) AS k_x
  FROM mx CROSS JOIN tot
),
hy AS (
  SELECT CAST(SUM({hterm('_ny', '_n')}) AS DECIMAL(38,0)) AS _hy,
    COUNT(*) AS k_y
  FROM my CROSS JOIN tot
)
SELECT _n AS n, k_x, k_y,
  {s2d('_hx')} AS h_x, {s2d('_hy')} AS h_y,
  {mi} AS mi,
  CASE WHEN {hmin} > 0 THEN {mi} / {hmin} ELSE 0.0 END AS nmi
FROM misum CROSS JOIN tot CROSS JOIN hx CROSS JOIN hy
"""


def ks_uniform_audit(
    df: DataFrame,
    u_col,
    group_columns,
) -> DataFrame:
    """One-sample Kolmogorov–Smirnov test against U(0,1) per group —
    the uniformity audit for anything that CLAIMS to be uniform: hash
    buckets (a biased hash_split skews every downstream sample),
    p-values under a true null, RNG-derived sampling keys.

        D = max over jumps of max(cum/n − u, u − (cum−t)/n)
        p ≈ 2·Σ_{k=1..3} (−1)^{k−1} e^{−2k²nD²}   (asymptotic tail)

    Exact path: the ECDF side of every gap is exact integers over the
    distinct-value collapse; u is the value itself (already the null
    CDF); each exp in the 3-term Kolmogorov tail quantizes at 1e-9
    (the exp/ln rule), so the verdict is engine-identical.

    Returns (groups…, n, d_stat, p_value, reject_05).
    """
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    u = F.col(u_col) if isinstance(u_col, str) else u_col
    d = df.filter(u.isNotNull()).select(*g, u.cast("double").alias("_u"))
    per = d.groupBy(*g, "_u").agg(F.count(F.lit(1)).alias("_t"))
    w = Window.partitionBy(*g).orderBy("_u")
    wg = Window.partitionBy(*g)
    cum = per.select(
        *g, "_u", "_t",
        F.sum("_t").over(w).alias("_cum"),
        F.sum("_t").over(wg).alias("_n"),
    )
    nn = F.col("_n").cast("double")
    hi = F.col("_cum").cast("double") / nn - F.col("_u")
    lo = F.col("_u") - (F.col("_cum") - F.col("_t")).cast("double") / nn
    gap = F.greatest(hi, lo)
    agg = cum.groupBy(*g).agg(
        F.max("_n").alias("n"), F.max(gap).alias("d_stat")
    )
    nd2 = F.col("n").cast("double") * F.col("d_stat") * F.col("d_stat")
    q9 = F.lit(1.0e9)
    terms = None
    for kk in range(1, 4):
        e = F.floor(
            F.exp(F.lit(-2.0 * kk * kk) * nd2) * q9 + F.lit(0.5)
        ) / q9
        t = e if kk % 2 == 1 else -e
        terms = t if terms is None else terms + t
    p = F.least(F.greatest(F.lit(2.0) * terms, F.lit(0.0)), F.lit(1.0))
    p = F.floor(p * q9 + F.lit(0.5)) / q9
    return agg.select(
        *g, "n", "d_stat", p.alias("p_value"),
        (p < F.lit(0.05)).alias("reject_05"),
    )


def ks_uniform_audit_sql(
    data_sql: str,
    u_sql: str,
    group_columns,
) -> str:
    """DuckDB twin of :func:`ks_uniform_audit` (same gap frame, same
    quantized 3-term tail)."""
    from timeseriesutils_spark.operators.window_features import _as_list

    g = _as_list(group_columns)
    gsel = ", ".join(g)
    nd2 = "(CAST(n AS DOUBLE) * d_stat * d_stat)"
    terms = []
    for kk in range(1, 4):
        e = (f"(FLOOR(EXP({-2.0 * kk * kk!r} * {nd2})"
             " * 1000000000.0 + 0.5) / 1000000000.0)")
        terms.append(e if kk % 2 == 1 else f"(-{e})")
    p = f"LEAST(GREATEST(2.0 * ({' + '.join(terms)}), 0.0), 1.0)"
    pq = f"(FLOOR({p} * 1000000000.0 + 0.5) / 1000000000.0)"
    return f"""
WITH d AS (
  SELECT {gsel}, CAST(({u_sql}) AS DOUBLE) AS _u
  FROM ({data_sql}) WHERE ({u_sql}) IS NOT NULL
),
per AS (
  SELECT {gsel}, _u, COUNT(*) AS _t FROM d GROUP BY {gsel}, _u
),
cum AS (
  SELECT {gsel}, _u, _t,
    CAST(SUM(_t) OVER w AS BIGINT) AS _cum,
    CAST(SUM(_t) OVER wg AS BIGINT) AS _n
  FROM per
  WINDOW w AS (PARTITION BY {gsel} ORDER BY _u
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
   wg AS (PARTITION BY {gsel})
),
agg AS (
  SELECT {gsel}, MAX(_n) AS n,
    MAX(GREATEST(
      CAST(_cum AS DOUBLE) / CAST(_n AS DOUBLE) - _u,
      _u - CAST(_cum - _t AS DOUBLE) / CAST(_n AS DOUBLE)
    )) AS d_stat
  FROM cum GROUP BY {gsel}
)
SELECT {gsel}, n, d_stat, {pq} AS p_value,
  ({pq} < 0.05) AS reject_05
FROM agg
"""
