"""Deterministic dataset splitting for training pipelines.

Train/val/test membership must be a pure function of a stable key —
never of partitioning, sampling order, or a seed that can drift between
runs — or examples leak across splits when the corpus is re-processed.
``hash_split`` buckets each row by an md5 prefix of its key: stable
across engines (md5 is bit-identical everywhere, unlike xxhash64 whose
seed/variant differs between Spark and other systems), across runs, and
across re-partitioning; adding documents never moves existing ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import sq


def hash_bucket(key_col, buckets: int = 100):
    """Stable bucket in [0, buckets): first 4 md5 hex digits of the
    stringified key, mod buckets.  Pure built-ins, engine-portable."""
    return (
        F.conv(F.substring(F.md5(key_col.cast("string")), 1, 4), 16, 10).cast("int")
        % buckets
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Append ``bucket`` (0-99) and ``split`` columns.

    ``weights``: ordered {split_name: percent} summing to ≤ 100 (default
    80/10/10 train/val/test).  Rows past the cumulative sum fall in the
    last split.
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    bucket = hash_bucket(F.col(key_col))
    names = list(weights)
    cum = 0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("bucket", bucket).withColumn("split", split)


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int = 16,
    seed: str = "s0",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the
    training-data writer primitive: every example gets a ``shard`` in
    [0, n_shards) and a ``shard_pos`` (0-based position within its shard
    under the seeded permutation).  Reading shards in order yields a
    reproducible global shuffle of the corpus; changing ``seed`` yields
    an independent permutation (epoch reshuffle) without touching data.

    Both outputs are pure functions of (seed, key): shard = first 8 md5
    hex digits mod n_shards, order within shard = the md5 itself (key as
    final tie-break for the astronomically-unlikely collision) — stable
    across engines, runs, and repartitioning (same md5 rationale as
    ``hash_bucket``; Spark's xxhash64/rand are not portable).

    Scale shape: one hash projection (no shuffle) + one exchange on
    ``shard`` for the per-shard ``row_number`` — exactly the shuffle the
    downstream partitioned write needs anyway, so the sort feeds
    ``write.partitionBy(shard)`` with no extra exchange.  Shards are
    md5-balanced (±√n), so the sort never sees a skewed partition.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be ≥ 1")
    # NULL keys hash via an explicit sentinel: Spark's concat_ws *skips*
    # NULL ("s0") while DuckDB's CONCAT renders it empty ("s0:"), so
    # without the coalesce a NULL-key row lands on different shards in
    # engine vs oracle.  The sentinel keeps the assignment total and
    # engine-portable (shard_assign_sql applies the same COALESCE).
    key_s = F.coalesce(F.col(key_col).cast("string"), F.lit("<NULL>"))
    h = F.md5(F.concat_ws(":", F.lit(seed), key_s))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("shard_pos", F.row_number().over(w) - 1)
        .drop("_h")
    )


def shard_assign_sql(
    table: str = "documents",
    key_col: str = "doc_id",
    n_shards: int = 16,
    seed: str = "s0",
) -> str:
    """DuckDB twin of :func:`shard_assign` (md5 is bit-identical)."""
    h = (
        f"md5(CONCAT('{seed}', ':', "
        f"COALESCE(CAST({key_col} AS VARCHAR), '<NULL>')))"
    )
    return f"""
WITH a AS (
  SELECT *, {h} AS _h,
    CAST(CAST(CONCAT('0x', substring({h}, 1, 8)) AS BIGINT) % {n_shards} AS INT)
      AS shard
  FROM {table}
)
SELECT * EXCLUDE (_h),
  CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY _h, {key_col}) - 1 AS INT)
    AS shard_pos
FROM a
"""


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the data-mixture
    primitive (e.g. keep 100% of one language, 10% of another when
    assembling a training blend).  A row survives iff its md5 bucket
    falls below ``round(rate · buckets)`` for its stratum; membership is
    a pure function of (key, stratum) — stable across runs, engines and
    partitionings, and adding rows never flips existing decisions.

    Per-row filter, no shuffle; at 100 TB this is a predicate on the
    scan, combinable with pushdown."""
    bucket = hash_bucket(F.col(key_col), buckets)
    expr = None
    for name, rate in rates.items():
        thr = int(round(rate * buckets))
        cond = F.col(strata_col) == name
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    thr_col = (
        F.lit(int(round(default_rate * buckets)))
        if expr is None
        else expr.otherwise(int(round(default_rate * buckets)))
    )
    return df.filter(bucket < thr_col)


def stratified_sample_sql_pred(
    key_col: str, strata_col: str, rates: dict[str, float],
    default_rate: float = 0.0, buckets: int = 100,
) -> str:
    """DuckDB WHERE-clause twin of :func:`stratified_sample`."""
    b = (
        f"(CAST(CONCAT('0x', substring(md5(CAST({key_col} AS VARCHAR)), 1, 4)) AS INT)"
        f" % {buckets})"
    )
    branches = " ".join(
        f"WHEN '{name}' THEN {int(round(rate * buckets))}"
        for name, rate in rates.items()
    )
    thr = f"CASE {strata_col} {branches} ELSE {int(round(default_rate * buckets))} END"
    return f"{b} < ({thr})"


def mixture_resample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    buckets: int = 100,
) -> DataFrame:
    """Weighted epoch expansion — the UPSAMPLING half of data-mixture
    assembly (``stratified_sample`` is the downsampling half): repeat
    each row ``weight(stratum)`` times, fractional weights resolved
    deterministically per row.

    A row of weight w emits ``floor(w)`` copies plus one more iff its
    md5 bucket < ``round(frac(w)·buckets)`` — so a 2.5-epoch source
    yields 2 copies for every row and 3 for a stable half of them, and
    the realized mix converges to the requested ratios at corpus scale.
    ``epoch`` (1-based) distinguishes the copies for downstream packing.

    Per-row explode, no shuffle; membership is a pure function of
    (key, stratum) — reprocessing or repartitioning never changes which
    rows get the extra epoch.
    """
    bucket = hash_bucket(F.col(key_col), buckets)
    whole = None
    extra = None
    for name, wt in weights.items():
        if wt < 0:
            raise ValueError(f"negative weight for {name!r}")
        cond = F.col(strata_col) == name
        w_i, t_i = int(wt), int(round((wt - int(wt)) * buckets))
        whole = (F.when(cond, w_i) if whole is None else whole.when(cond, w_i))
        extra = (F.when(cond, t_i) if extra is None else extra.when(cond, t_i))
    dw, dt = int(default_weight), int(round((default_weight - int(default_weight)) * buckets))
    whole = F.lit(dw) if whole is None else whole.otherwise(dw)
    extra = F.lit(dt) if extra is None else extra.otherwise(dt)
    n = whole + F.when(bucket < extra, 1).otherwise(0)
    seq = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.select("*", F.explode(seq).alias("epoch"))


def mixture_resample_sql(
    table: str,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    buckets: int = 100,
) -> str:
    """DuckDB twin of :func:`mixture_resample` (same md5-bucket
    arithmetic as the hash_split oracle)."""
    bucket = (
        f"CAST(CONCAT('0x', substring(md5(CAST({key_col} AS VARCHAR)), 1, 4)) AS INT)"
        f" % {buckets}"
    )
    whole = "CASE "
    extra = "CASE "
    for name, wt in weights.items():
        w_i, t_i = int(wt), int(round((wt - int(wt)) * buckets))
        whole += f"WHEN {strata_col} = {sq(name)} THEN {w_i} "
        extra += f"WHEN {strata_col} = {sq(name)} THEN {t_i} "
    dw, dt = int(default_weight), int(round((default_weight - int(default_weight)) * buckets))
    whole += f"ELSE {dw} END"
    extra += f"ELSE {dt} END"
    return f"""
WITH b AS (
  SELECT *, ({whole}) + CASE WHEN ({bucket}) < ({extra}) THEN 1 ELSE 0 END AS n
  FROM {table}
)
SELECT * EXCLUDE (n), CAST(unnest(generate_series(1, n)) AS INT) AS epoch
FROM b WHERE n >= 1
"""


def reservoir_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen uniformly-ish
    and DETERMINISTICALLY: rank rows within each stratum by
    (md5(key), key) and keep the first k — the distributed, re-runnable
    replacement for reservoir sampling (same sample every run, every
    partitioning, every engine; adding rows only perturbs the sample the
    way a true reservoir would).

    One exchange on the stratum key; the rank is a window row_number.
    For heavily skewed strata at extreme scale, pre-filter with
    ``hash_bucket < ~(k/|stratum| · buckets)`` to cut the sorted volume
    before ranking.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def reservoir_sample_sql(
    table: str,
    key_col: str,
    strata_col: str,
    k: int,
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`reservoir_sample`."""
    return f"""
SELECT {select} FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {strata_col}
    ORDER BY md5(CAST({key_col} AS VARCHAR)), {key_col}) AS rn
  FROM {table}
) WHERE rn <= {k}
"""


def cap_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Frequency cap per key: keep at most ``cap`` rows for each value
    of ``key_col`` — the Common-Crawl-style per-domain/per-source cap
    that stops one prolific site from dominating a training mix.

    Selection is deterministic and stable: rows rank within their key
    by ``md5(id)`` (the :func:`hash_split` rationale — bit-identical
    across engines, runs, and partitionings; adding new documents never
    evicts previously-kept ones ranked below the cap... new docs only
    enter if they hash under a kept one, the standard tradeoff of
    hash-ranked caps vs true arrival order, which distributed corpora
    don't have).

    Appends ``kept`` (boolean).  Scale shape: one hash-partitioned
    window by key; heavy keys are exactly the ones being capped, and
    the rank is a single streaming pass per key — no buffering beyond
    the sort.  For billion-row hot keys, pre-filter with an
    approx-frequency sketch so only keys above the cap enter the
    window (documented swap, not needed at tested scales).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col).cast("string")
    )
    rn = F.row_number().over(w)
    return df.withColumn("kept", rn <= cap)


def cap_per_key_sql(
    table: str,
    key_col: str,
    id_col: str,
    cap: int,
    select_cols: str,
) -> str:
    """DuckDB twin of :func:`cap_per_key`."""
    return f"""
SELECT {select_cols},
  ROW_NUMBER() OVER (
    PARTITION BY {key_col}
    ORDER BY md5(CAST({id_col} AS VARCHAR)), CAST({id_col} AS VARCHAR)
  ) <= {cap} AS kept
FROM {table}
"""


def unimax_mixture(
    docs: DataFrame,
    domain_col: str = "lang",
    text_col: str = "text",
    budget_num: int = 3,
    budget_den: int = 1,
    max_epochs: int = 4,
) -> DataFrame:
    """UniMax budget allocation across domains (Chung et al. 2023,
    "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining"): given per-domain token
    counts c_i, a total token budget B = T·budget_num/budget_den
    (T = corpus tokens; > T means oversampling epochs) and an epoch cap
    E, allocate each domain min(c_i·E, fair share) — low-resource
    domains take their full E epochs, high-resource domains split what
    remains equally (the water level).

    Closed form instead of the paper's sequential loop: with domains
    sorted ascending by cap_i = c_i·E, the greedy loop's remaining
    budget is B − P_{k−1} (prefix caps) and its water level is
    invariant once a domain goes uncapped, so

        capped_k  ⇔  cap_k·(N−k+1) ≤ B − P_{k−1}

    is monotone and the whole allocation is ONE rank window + prefix
    sums + one partition-wide conditional aggregate — fully relational,
    no driver loop, exact integers.  The greedy's integer-division
    remainder lands on the LAST r uncapped domains (simulating the
    loop: levels floor(R/m) rise by one exactly r = (B−ΣcapsT) mod M
    times), so the closed form reproduces the sequential allocation
    token-for-token, not just to ±1.

    Scale shape: the only corpus-sized work is the map-combinable
    token-count aggregation; everything after runs on the domain table
    (small by nature).  Returns one row per domain:
    (domain, n_tokens, cap_tokens, allocated, epochs, capped).
    """
    from timeseriesutils_spark.operators.text import words

    E = int(max_epochs)
    bn, bd = int(budget_num), int(budget_den)
    if E < 1 or bn < 1 or bd < 1:
        raise ValueError("need max_epochs >= 1 and positive budget frac")
    tok = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(domain_col).alias("domain"),
            F.size(words(F.col(text_col))).cast("bigint").alias("_t"),
        )
        .groupBy("domain")
        .agg(F.sum("_t").alias("n_tokens"))
    )
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(F.col("cap_tokens"), F.col("domain"))
    w_pre = (
        Window.partitionBy()
        .orderBy(F.col("cap_tokens"), F.col("domain"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = tok.select(
        "domain",
        "n_tokens",
        (F.col("n_tokens") * F.lit(E)).alias("cap_tokens"),
    ).select(
        "*",
        F.count(F.lit(1)).over(w_all).alias("_N"),
        F.expr(f"(sum(n_tokens) OVER () * {bn}) div {bd}").alias("_B"),
        F.row_number().over(w_rank).alias("_k"),
        F.coalesce(F.sum("cap_tokens").over(w_pre), F.lit(0)).alias("_P"),
    ).select(
        "*",
        (
            F.col("cap_tokens") * (F.col("_N") - F.col("_k") + 1)
            <= F.col("_B") - F.col("_P")
        ).alias("capped"),
    ).select(
        "*",
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap_tokens"))).over(w_all),
            F.lit(0),
        ).alias("_PC"),
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).over(w_all).alias("_nc"),
    )
    level = F.expr("(_B - _PC) div (_N - _nc)")
    rem = F.expr("(_B - _PC) % (_N - _nc)")
    # uncapped rank: capped domains form a prefix in cap order, so the
    # j-th uncapped domain is _k - _nc; the last `rem` of them get the
    # +1 the sequential greedy's rising floor(R/m) produces
    plus_one = (F.col("_k") - F.col("_nc")) > (
        F.col("_N") - F.col("_nc") - rem
    )
    alloc = F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
        level + F.when(plus_one, F.lit(1)).otherwise(F.lit(0))
    )
    return staged.select(
        "domain",
        "n_tokens",
        "cap_tokens",
        alloc.cast("bigint").alias("allocated"),
        (
            alloc.cast("double") / F.col("n_tokens").cast("double")
        ).alias("epochs"),
        "capped",
    )


def unimax_mixture_sql(
    table: str = "documents",
    domain_col: str = "lang",
    text_col: str = "text",
    budget_num: int = 3,
    budget_den: int = 1,
    max_epochs: int = 4,
) -> str:
    """DuckDB twin of :func:`unimax_mixture` — same closed form, same
    integer arithmetic, same total tiebreak."""
    E = int(max_epochs)
    bn, bd = int(budget_num), int(budget_den)
    return f"""
WITH tok AS (
  SELECT {domain_col} AS domain,
    CAST(SUM(len(string_split_regex(lower(trim({text_col})), '\\s+')))
         AS BIGINT) AS n_tokens
  FROM {table} WHERE {text_col} IS NOT NULL
  GROUP BY 1
),
staged AS (
  SELECT domain, n_tokens, n_tokens * {E} AS cap_tokens,
    COUNT(*) OVER () AS _N,
    (SUM(n_tokens) OVER () * {bn}) // {bd} AS _B,
    ROW_NUMBER() OVER (ORDER BY n_tokens * {E}, domain) AS _k,
    COALESCE(SUM(n_tokens * {E}) OVER (ORDER BY n_tokens * {E}, domain
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS _P
  FROM tok
),
flagged AS (
  SELECT *, cap_tokens * (_N - _k + 1) <= _B - _P AS capped
  FROM staged
),
tot AS (
  SELECT *,
    COALESCE(SUM(CASE WHEN capped THEN cap_tokens END) OVER (), 0) AS _PC,
    SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS _nc
  FROM flagged
),
alloc AS (
  SELECT *,
    CASE WHEN capped THEN cap_tokens
      ELSE (_B - _PC) // (_N - _nc)
        + CASE WHEN (_k - _nc) > (_N - _nc) - ((_B - _PC) % (_N - _nc))
          THEN 1 ELSE 0 END
    END AS allocated
  FROM tot
)
SELECT domain, n_tokens, CAST(cap_tokens AS BIGINT) AS cap_tokens,
  CAST(allocated AS BIGINT) AS allocated,
  CAST(allocated AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs,
  capped
FROM alloc
"""
