"""Model-evaluation scorecards: precision/recall threshold sweep,
log-loss, and ranking metrics (NDCG@k, MRR, hit-rate).

The supervised-eval layer beside the rank statistics in
operators/nonparam.py (roc_auc answers "does the score ORDER the
labels?"; pr_curve answers "what do I get at THIS cutoff?"; log_loss
scores the probabilities themselves; ranking_metrics scores a
retrieval/recommendation list the way search evals do).  Capability
parity: the reference's users run these via sklearn.metrics on
collected frames; here each is one or two distributed aggregations.

Scale design (100 TB answer): pr_curve aggregates to per-(group,
quantized-score) COUNTS first — the threshold fan-out explodes
DISTINCT scores x |grid|, never rows.  log_loss is a single
map-combinable aggregation.  ranking_metrics is one rank window per
query group over top-k row_number pruning, then a count-width
reduce per report group.  No joins against raw rows, no collects.

Exactness: counts are exact integers; every per-row transcendental
(ln in log_loss) is floor-quantized to 1e-9 and summed through
DECIMAL(38,0) (merge-order-free); NDCG discounts 1/log2(i+1) are
PRECOMPUTED python literals (rank i <= k), so no runtime libm call
can diverge between engines — the per-rank products quantize to
1e-9 ints before any cross-row sum.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit
from timeseriesutils_spark.operators.window_features import _as_list

_Q9 = 10**9


# --------------------------------------------------------------------------
# precision/recall/F1 threshold sweep
# --------------------------------------------------------------------------

_DEFAULT_GRID = [i / 20.0 for i in range(1, 20)]  # 0.05 .. 0.95


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col,
    group_columns,
    thresholds=None,
    scale: int = 6,
) -> DataFrame:
    """Per-group precision/recall/F1 at each cutoff of a literal
    threshold grid — the operating-point picker that complements
    roc_auc (AUC summarizes the whole ordering; shipping a filter
    needs ONE threshold, and this table is how it gets chosen).

    Rows collapse to per-(group, quantized score) counts first; the
    grid fans out over THOSE (|distinct scores| x |grid|, never raw
    rows), and tp/fp/fn are exact integer sums.  predicted-positive
    is ``score >= threshold`` (grid points quantized on the same
    1e-6 grid as the scores, so the comparison is integer-exact).
    F1 uses the joinless identity 2tp/(2tp+fp+fn).

    Returns (groups…, threshold, tp, fp, fn, precision, recall, f1).
    """
    groups = _as_list(group_columns)
    grid = list(thresholds) if thresholds is not None else list(_DEFAULT_GRID)
    m = 10**scale
    qts = [int(math.floor(t * m + 0.5)) for t in grid]
    lbl = F.col(label_col) if isinstance(label_col, str) else label_col
    q = F.floor(F.col(score_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    d = df.filter(
        F.col(score_col).isNotNull() & lbl.isNotNull()
    ).select(*groups, q.alias("_q"), lbl.cast("boolean").alias("_y"))
    per = d.groupBy(*groups, "_q").agg(
        F.sum(F.col("_y").cast("bigint")).alias("_pos"),
        F.sum((~F.col("_y")).cast("bigint")).alias("_neg"),
    )
    fan = per.select(
        *groups,
        "_q",
        "_pos",
        "_neg",
        F.explode(F.array(*[F.lit(t) for t in qts])).alias("_qt"),
    )
    hit = F.col("_q") >= F.col("_qt")
    agg = fan.groupBy(*groups, "_qt").agg(
        F.sum(F.when(hit, F.col("_pos")).otherwise(F.lit(0))).alias("tp"),
        F.sum(F.when(hit, F.col("_neg")).otherwise(F.lit(0))).alias("fp"),
        F.sum(F.when(~hit, F.col("_pos")).otherwise(F.lit(0))).alias("fn"),
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    return agg.select(
        *groups,
        (F.col("_qt").cast("double") / F.lit(float(m))).alias("threshold"),
        "tp",
        "fp",
        "fn",
        F.when(F.col("tp") + F.col("fp") > 0, tp / (tp + fp)).alias(
            "precision"
        ),
        F.when(F.col("tp") + F.col("fn") > 0, tp / (tp + fn)).alias("recall"),
        F.when(
            F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            F.lit(2.0) * tp / (F.lit(2.0) * tp + fp + fn),
        ).alias("f1"),
    )


def pr_curve_sql(
    data_sql: str,
    score_col: str,
    label_sql: str,
    group_columns,
    thresholds=None,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`pr_curve` (same grid literals)."""
    groups = _as_list(group_columns)
    grid = list(thresholds) if thresholds is not None else list(_DEFAULT_GRID)
    gsel = ", ".join(groups)
    m = 10**scale
    qts = ", ".join(str(int(math.floor(t * m + 0.5))) for t in grid)
    qq = f"CAST(FLOOR(CAST({score_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    tp, fp, fn = "CAST(tp AS DOUBLE)", "CAST(fp AS DOUBLE)", "CAST(fn AS DOUBLE)"
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q, CAST({label_sql} AS BOOLEAN) AS _y
  FROM ({data_sql})
  WHERE {score_col} IS NOT NULL AND ({label_sql}) IS NOT NULL
),
per AS (
  SELECT {gsel}, _q,
    CAST(SUM(CAST(_y AS BIGINT)) AS BIGINT) AS _pos,
    CAST(SUM(CAST(NOT _y AS BIGINT)) AS BIGINT) AS _neg
  FROM d GROUP BY {gsel}, _q
),
fan AS (
  SELECT {gsel}, _q, _pos, _neg, UNNEST([{qts}]) AS _qt FROM per
),
agg AS (
  SELECT {gsel}, _qt,
    CAST(SUM(CASE WHEN _q >= _qt THEN _pos ELSE 0 END) AS BIGINT) AS tp,
    CAST(SUM(CASE WHEN _q >= _qt THEN _neg ELSE 0 END) AS BIGINT) AS fp,
    CAST(SUM(CASE WHEN NOT _q >= _qt THEN _pos ELSE 0 END) AS BIGINT) AS fn
  FROM fan GROUP BY {gsel}, _qt
)
SELECT {gsel}, CAST(_qt AS DOUBLE) / {dlit(float(m))} AS threshold,
  tp, fp, fn,
  CASE WHEN tp + fp > 0 THEN {tp} / ({tp} + {fp}) END AS precision,
  CASE WHEN tp + fn > 0 THEN {tp} / ({tp} + {fn}) END AS recall,
  CASE WHEN 2 * tp + fp + fn > 0
    THEN 2.0 * {tp} / (2.0 * {tp} + {fp} + {fn}) END AS f1
FROM agg
"""


# --------------------------------------------------------------------------
# log-loss (cross-entropy of predicted probabilities)
# --------------------------------------------------------------------------


def log_loss(
    df: DataFrame,
    prob_col: str,
    label_col,
    group_columns,
    eps: float = 1.0e-6,
) -> DataFrame:
    """Per-group binary cross-entropy of predicted probabilities —
    the proper scoring rule that punishes CONFIDENT wrongness
    (roc_auc only sees the ordering; calibration_curve sees bins;
    log-loss is the per-row scalar that training objectives use):

        L = −mean(y·ln p + (1−y)·ln(1−p)),   p clamped to [ε, 1−ε]

    Each per-row ln term is floor-quantized at 1e-9 and summed
    through DECIMAL(38,0) — cross-engine ln can differ in final
    ulps, so the quantize-then-integer-sum discipline is what keeps
    the mean bit-identical.  One map-combinable aggregation.

    Returns (groups…, n, log_loss).
    """
    groups = _as_list(group_columns)
    lbl = F.col(label_col) if isinstance(label_col, str) else label_col
    p = F.col(prob_col).cast("double")
    pc = F.least(F.greatest(p, F.lit(eps)), F.lit(1.0 - eps))
    y = lbl.cast("boolean")
    term = -F.when(y, F.log(pc)).otherwise(F.log(F.lit(1.0) - pc))
    tq = F.floor(term * F.lit(float(_Q9)) + F.lit(0.5)).cast("decimal(38,0)")
    d = df.filter(p.isNotNull() & lbl.isNotNull()).select(
        *groups, tq.alias("_tq")
    )
    agg = d.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"), F.sum("_tq").alias("_s")
    )
    ll = (
        F.col("_s").cast("string").cast("double")
        / F.col("n").cast("double")
        / F.lit(float(_Q9))
    )
    return agg.select(
        *groups, "n", F.when(F.col("n") > 0, ll).alias("log_loss")
    )


def log_loss_sql(
    data_sql: str,
    prob_col: str,
    label_sql: str,
    group_columns,
    eps: float = 1.0e-6,
) -> str:
    """DuckDB twin of :func:`log_loss` (same clamp and quantize)."""
    groups = _as_list(group_columns)
    gsel = ", ".join(groups)
    p = f"CAST({prob_col} AS DOUBLE)"
    pc = f"LEAST(GREATEST({p}, {dlit(eps)}), {dlit(1.0 - eps)})"
    term = (
        f"-(CASE WHEN CAST({label_sql} AS BOOLEAN) THEN LN({pc})"
        f" ELSE LN(1.0 - {pc}) END)"
    )
    tq = f"CAST(FLOOR(({term}) * {dlit(float(_Q9))} + 0.5) AS DECIMAL(38,0))"
    ll = (
        f"(CAST(CAST(_s AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)"
        f" / {dlit(float(_Q9))})"
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {tq} AS _tq
  FROM ({data_sql})
  WHERE {prob_col} IS NOT NULL AND ({label_sql}) IS NOT NULL
),
agg AS (
  SELECT {gsel}, COUNT(*) AS n, SUM(_tq) AS _s FROM d GROUP BY {gsel}
)
SELECT {gsel}, n, CASE WHEN n > 0 THEN {ll} END AS log_loss
FROM agg
"""


# --------------------------------------------------------------------------
# ranking metrics: NDCG@k, MRR, hit-rate@k
# --------------------------------------------------------------------------


def ranking_metrics(
    df: DataFrame,
    query_columns,
    report_columns,
    score_col: str,
    rel_col,
    k: int = 10,
    tie_break=None,
) -> DataFrame:
    """Search/recommendation list quality per report group: mean
    NDCG@k, mean MRR, and hit-rate@k over the query groups — the
    eval battery for bm25_search / knn rankings (roc_auc scores ONE
    global ordering; these score MANY per-query lists the way IR
    evals do).

        DCG@k  = Σ_{i≤k} rel_i · w_i,   w_i = 1/log2(i+1)
        NDCG@k = DCG@k / IDCG@k   (IDCG from ALL judged rows in the
                 query group, rel sorted descending and truncated at k
                 — the standard sklearn/IR ideal, so missing a relevant
                 item outside the retrieved top-k costs NDCG)
        MRR    = 1 / rank of first relevant in the top-k   (0 if none)

    The discounts w_i are PRECOMPUTED literals (i ≤ k) — no runtime
    log can diverge across engines; each per-rank product quantizes
    to 1e-9 ints before the cross-row DECIMAL sums, and the per-query
    scalars re-quantize before the report-group mean (same
    discipline).  Two rank windows (system order + ideal order) share
    ONE exchange on the query key; rows outside both top-k lists are
    pruned before the reduce per report group.  ``tie_break`` columns
    (default:
    the query columns' complement is required) make the rank
    deterministic.

    Returns (report…, n_queries, mean_ndcg_at_k, mean_mrr,
    hit_rate_at_k).
    """
    qcols = _as_list(query_columns)
    rcols = _as_list(report_columns)
    tb = _as_list(tie_break) if tie_break is not None else []
    rel = F.col(rel_col) if isinstance(rel_col, str) else rel_col
    w = [1.0 / math.log2(i + 1) for i in range(1, k + 1)]
    wq = [int(math.floor(x * _Q9 + 0.5)) for x in w]  # 1e-9 ints
    order = [F.col("_s").desc()] + [F.col(c).asc() for c in tb]
    win = Window.partitionBy(*qcols).orderBy(*order)
    d = df.filter(F.col(score_col).isNotNull() & rel.isNotNull()).select(
        *qcols,
        *rcols,
        *tb,
        F.col(score_col).alias("_s"),
        rel.cast("bigint").alias("_rel"),
    )
    # Two ranks per row: _rk by retrieval score (the system's list) and
    # _rv by judged relevance (the IDEAL list).  IDCG must come from ALL
    # judged rows in the query group — computing it only over the
    # retrieved top-k inflates NDCG whenever relevant items were missed
    # (ADVICE r7); the standard sklearn/IR definition sorts the full
    # judgment set.  _rv's tie order is irrelevant to the sum (equal rel
    # values are interchangeable across rank positions), so the
    # secondary keys only make the plan deterministic.
    ideal = Window.partitionBy(*qcols).orderBy(
        F.col("_rel").desc(), *order
    )
    ranked = d.select(
        *qcols,
        *rcols,
        "_rel",
        F.row_number().over(win).alias("_rk"),
        F.row_number().over(ideal).alias("_rv"),
    ).filter((F.col("_rk") <= k) | (F.col("_rv") <= k))
    # per-rank discount as a literal lookup: element_at needs INT
    warr = F.array(*[F.lit(x) for x in wq])
    in_k = F.col("_rk") <= k
    dcg_t = F.when(
        in_k, F.col("_rel") * F.element_at(warr, F.col("_rk").cast("int"))
    ).otherwise(F.lit(0))
    idcg_t = F.when(
        F.col("_rv") <= k,
        F.col("_rel") * F.element_at(warr, F.col("_rv").cast("int")),
    ).otherwise(F.lit(0))
    per_q = ranked.groupBy(*qcols).agg(
        *[F.min(c).alias(c) for c in rcols],
        F.sum(dcg_t.cast("decimal(38,0)")).alias("_dcg_q"),
        F.sum(idcg_t.cast("decimal(38,0)")).alias("_idcg_q"),
        F.sum(F.when(in_k, F.col("_rel")).otherwise(F.lit(0))).alias(
            "_nrel"
        ),
        F.min(F.when(in_k & (F.col("_rel") > 0), F.col("_rk"))).alias(
            "_frank"
        ),
    )
    dcgd = F.col("_dcg_q").cast("string").cast("double")
    idcgd = F.col("_idcg_q").cast("string").cast("double")
    ndcg = F.when(F.col("_idcg_q") > 0, dcgd / idcgd).otherwise(F.lit(0.0))
    mrr = F.when(
        F.col("_frank").isNotNull(),
        F.lit(1.0) / F.col("_frank").cast("double"),
    ).otherwise(F.lit(0.0))
    hit = (F.col("_nrel") > 0).cast("bigint")
    q9 = F.lit(float(_Q9))
    scored = per_q.select(
        *rcols,
        F.floor(ndcg * q9 + F.lit(0.5)).cast("decimal(38,0)").alias("_nq"),
        F.floor(mrr * q9 + F.lit(0.5)).cast("decimal(38,0)").alias("_mq"),
        hit.alias("_hit"),
    )
    rep = scored.groupBy(*rcols).agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("_nq").alias("_sn"),
        F.sum("_mq").alias("_sm"),
        F.sum("_hit").alias("_sh"),
    )
    nn = F.col("n_queries").cast("double")
    return rep.select(
        *rcols,
        "n_queries",
        (F.col("_sn").cast("string").cast("double") / nn / q9).alias(
            "mean_ndcg_at_k"
        ),
        (F.col("_sm").cast("string").cast("double") / nn / q9).alias(
            "mean_mrr"
        ),
        (F.col("_sh").cast("double") / nn).alias("hit_rate_at_k"),
    )


def ranking_metrics_sql(
    data_sql: str,
    query_columns,
    report_columns,
    score_col: str,
    rel_sql: str,
    k: int = 10,
    tie_break=None,
) -> str:
    """DuckDB twin of :func:`ranking_metrics` (same discount
    literals, same quantize points)."""
    qcols = _as_list(query_columns)
    rcols = _as_list(report_columns)
    tb = _as_list(tie_break) if tie_break is not None else []
    qsel = ", ".join(qcols)
    rsel = ", ".join(rcols)
    w = [1.0 / math.log2(i + 1) for i in range(1, k + 1)]
    wq = ", ".join(str(int(math.floor(x * _Q9 + 0.5))) for x in w)
    order = "_s DESC" + "".join(f", {c} ASC" for c in tb)
    rfirst = ", ".join(f"MIN({c}) AS {c}" for c in rcols)
    nn = "CAST(n_queries AS DOUBLE)"
    q9 = dlit(float(_Q9))
    return f"""
WITH d AS (
  SELECT {qsel}, {rsel}{", " + ", ".join(tb) if tb else ""},
    {score_col} AS _s, CAST({rel_sql} AS BIGINT) AS _rel
  FROM ({data_sql})
  WHERE {score_col} IS NOT NULL AND ({rel_sql}) IS NOT NULL
),
ranked AS (
  SELECT {qsel}, {rsel}, _rel,
    ROW_NUMBER() OVER (PARTITION BY {qsel} ORDER BY {order}) AS _rk,
    ROW_NUMBER() OVER (PARTITION BY {qsel} ORDER BY _rel DESC, {order})
      AS _rv
  FROM d QUALIFY _rk <= {k} OR _rv <= {k}
),
wt AS (SELECT [{wq}] AS _w),
per_q AS (
  SELECT {qsel}, {rfirst},
    SUM(CAST(CASE WHEN _rk <= {k} THEN _rel * _w[_rk] ELSE 0 END
        AS DECIMAL(38,0))) AS _dcg_q,
    SUM(CAST(CASE WHEN _rv <= {k} THEN _rel * _w[_rv] ELSE 0 END
        AS DECIMAL(38,0))) AS _idcg_q,
    CAST(SUM(CASE WHEN _rk <= {k} THEN _rel ELSE 0 END) AS BIGINT)
      AS _nrel,
    MIN(CASE WHEN _rk <= {k} AND _rel > 0 THEN _rk END) AS _frank
  FROM ranked, wt GROUP BY {qsel}
),
scored AS (
  SELECT {rsel},
    CAST(FLOOR(CASE WHEN _idcg_q > 0
      THEN CAST(CAST(_dcg_q AS VARCHAR) AS DOUBLE)
         / CAST(CAST(_idcg_q AS VARCHAR) AS DOUBLE) ELSE 0.0 END
      * {q9} + 0.5) AS DECIMAL(38,0)) AS _nq,
    CAST(FLOOR(CASE WHEN _frank IS NOT NULL
      THEN 1.0 / CAST(_frank AS DOUBLE) ELSE 0.0 END
      * {q9} + 0.5) AS DECIMAL(38,0)) AS _mq,
    CAST(_nrel > 0 AS BIGINT) AS _hit
  FROM per_q
)
SELECT {rsel}, COUNT(*) AS n_queries,
  CAST(CAST(SUM(_nq) AS VARCHAR) AS DOUBLE) / {nn} / {q9}
    AS mean_ndcg_at_k,
  CAST(CAST(SUM(_mq) AS VARCHAR) AS DOUBLE) / {nn} / {q9} AS mean_mrr,
  CAST(SUM(_hit) AS DOUBLE) / {nn} AS hit_rate_at_k
FROM scored GROUP BY {rsel}
"""


# --------------------------------------------------------------------------
# multiclass classification report
# --------------------------------------------------------------------------


def classification_report(
    df: DataFrame,
    actual_col: str,
    pred_col: str,
    group_columns,
) -> DataFrame:
    """Per-(group, class) multiclass scorecard — pr_curve's sibling for
    CLASSIFIERS (pr_curve sweeps a binary score threshold; this scores
    hard multiclass predictions the way sklearn's classification_report
    does): per class c,

        tp = #{actual=c ∧ pred=c},  fp = #{pred=c ∧ actual≠c},
        fn = #{actual=c ∧ pred≠c},
        precision = tp/(tp+fp),  recall = tp/(tp+fn),
        f1 = 2tp/(2tp+fp+fn)    (joinless form, the pr_curve identity)

    Scale design: ONE count collapse on (group, actual, pred) — the
    confusion cells, |classes|² rows per group max — then each cell
    emits its ≤2 per-class contributions (diagonal → tp to class c;
    off-diagonal → fn to the actual class, fp to the predicted class)
    and ONE sum per (group, class).  Rows are never scanned twice; no
    class enumeration pass is needed because every class appears in
    some cell.  NULL actual/pred rows drop (complete-case).

    Returns (groups…, class, support, tp, fp, fn, precision, recall,
    f1); precision/recall NULL when their denominator is 0.
    """
    g = _as_list(group_columns)
    d = df.filter(
        F.col(actual_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(
        *g,
        F.col(actual_col).cast("string").alias("_a"),
        F.col(pred_col).cast("string").alias("_p"),
    )
    cells = d.groupBy(*g, "_a", "_p").agg(F.count(F.lit(1)).alias("_c"))
    diag = F.col("_a") == F.col("_p")
    contrib = F.explode(
        F.when(
            diag,
            F.array(
                F.struct(
                    F.col("_a").alias("cls"),
                    F.col("_c").alias("tp"),
                    F.lit(0).cast("bigint").alias("fp"),
                    F.lit(0).cast("bigint").alias("fn"),
                )
            ),
        ).otherwise(
            F.array(
                F.struct(
                    F.col("_a").alias("cls"),
                    F.lit(0).cast("bigint").alias("tp"),
                    F.lit(0).cast("bigint").alias("fp"),
                    F.col("_c").alias("fn"),
                ),
                F.struct(
                    F.col("_p").alias("cls"),
                    F.lit(0).cast("bigint").alias("tp"),
                    F.col("_c").alias("fp"),
                    F.lit(0).cast("bigint").alias("fn"),
                ),
            )
        )
    ).alias("_s")
    per = cells.select(*g, contrib).select(
        *g,
        F.col("_s.cls").alias("class"),
        F.col("_s.tp").alias("_tp"),
        F.col("_s.fp").alias("_fp"),
        F.col("_s.fn").alias("_fn"),
    )
    agg = per.groupBy(*g, "class").agg(
        F.sum("_tp").alias("tp"),
        F.sum("_fp").alias("fp"),
        F.sum("_fn").alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    td = tp.cast("double")
    return agg.select(
        *g,
        "class",
        (tp + fn).alias("support"),
        "tp",
        "fp",
        "fn",
        F.when(tp + fp > 0, td / (tp + fp).cast("double")).alias("precision"),
        F.when(tp + fn > 0, td / (tp + fn).cast("double")).alias("recall"),
        F.when(
            F.lit(2) * tp + fp + fn > 0,
            F.lit(2.0) * td / (F.lit(2) * tp + fp + fn).cast("double"),
        ).alias("f1"),
    )


def classification_report_sql(
    data_sql: str,
    actual_col: str,
    pred_col: str,
    group_columns,
) -> str:
    """DuckDB twin of :func:`classification_report` (same cell
    contributions via UNION ALL, same joinless F1)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    return f"""
WITH d AS (
  SELECT {gsel}, CAST({actual_col} AS VARCHAR) AS _a,
    CAST({pred_col} AS VARCHAR) AS _p
  FROM ({data_sql})
  WHERE {actual_col} IS NOT NULL AND {pred_col} IS NOT NULL
),
cells AS (
  SELECT {gsel}, _a, _p, COUNT(*) AS _c FROM d GROUP BY {gsel}, _a, _p
),
contrib AS (
  SELECT {gsel}, _a AS class,
    CASE WHEN _a = _p THEN _c ELSE 0 END AS _tp,
    CAST(0 AS BIGINT) AS _fp,
    CASE WHEN _a = _p THEN 0 ELSE _c END AS _fn
  FROM cells
  UNION ALL
  SELECT {gsel}, _p AS class, CAST(0 AS BIGINT), _c, CAST(0 AS BIGINT)
  FROM cells WHERE _a <> _p
),
agg AS (
  SELECT {gsel}, class,
    CAST(SUM(_tp) AS BIGINT) AS tp,
    CAST(SUM(_fp) AS BIGINT) AS fp,
    CAST(SUM(_fn) AS BIGINT) AS fn
  FROM contrib GROUP BY {gsel}, class
)
SELECT {gsel}, class, tp + fn AS support, tp, fp, fn,
  CASE WHEN tp + fp > 0
    THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
  CASE WHEN tp + fn > 0
    THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
  CASE WHEN 2 * tp + fp + fn > 0
    THEN 2.0 * CAST(tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
  END AS f1
FROM agg
"""


# --------------------------------------------------------------------------
# cumulative gains / lift at decile cutoffs
# --------------------------------------------------------------------------


def gains_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_columns,
    n_buckets: int = 10,
    scale: int = 6,
) -> DataFrame:
    """Cumulative gains + lift at score-ordered decile cutoffs — the
    campaign-targeting view of ranking quality beside roc_auc (global
    order) and pr_curve (one threshold): "contact the top d/10 of the
    population, capture what share of the positives?"

    Deterministic tie contract (NO ntile: its tie assignment is
    row-order-dependent and diverges across engines): scores quantize
    to 10^-scale ints and collapse to per-(group, score) counts; a
    score block is INCLUDED in bucket d iff the cumulative row count
    through the block ≤ ⌈n·d/B⌉ — whole tie-blocks in or out, exact
    integer comparisons end to end.

        gains_d = cum_pos(last included block) / total_pos
        lift_d  = gains_d / (cum_rows / n)

    One count collapse + one cumulative window over collapsed rows +
    one bucket fan-out (B literals × distinct-score rows, never raw
    rows).

    Returns (groups…, bucket, cutoff_frac, n_included, pos_included,
    gains, lift).
    """
    g = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(score_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    y = F.col(label_col).cast("boolean")
    d = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(*g, q.alias("_q"), y.cast("bigint").alias("_y"))
    per = d.groupBy(*g, "_q").agg(
        F.count(F.lit(1)).alias("_r"), F.sum("_y").alias("_p")
    )
    w = Window.partitionBy(*g).orderBy(F.col("_q").desc())
    wg = Window.partitionBy(*g)
    cum = per.select(
        *g,
        F.sum("_r").over(w).alias("_cr"),
        F.sum("_p").over(w).alias("_cp"),
        F.sum("_r").over(wg).alias("_n"),
        F.sum("_p").over(wg).alias("_np"),
    )
    buckets = []
    for b in range(1, n_buckets + 1):
        # cutoff rows = ceil(n*b/B), exact integer arithmetic: all terms
        # positive, so (x + B - 1) div B == ceil(x / B) under Spark's
        # truncate-toward-zero `div` (round-10 ADVICE: the old
        # -((-x) div B) form computed FLOOR, contradicting the contract)
        cut = F.expr(
            f"CAST((_n * {b} + {n_buckets - 1}) div {n_buckets} AS BIGINT)"
        )
        inc = F.col("_cr") <= cut
        buckets.append(
            F.struct(
                F.lit(b).alias("bucket"),
                F.max(F.when(inc, F.col("_cr"))).alias("n_included"),
                F.max(F.when(inc, F.col("_cp"))).alias("pos_included"),
            )
        )
    agg = cum.groupBy(*g).agg(
        F.max("_n").alias("_n"),
        F.max("_np").alias("_np"),
        F.array(*buckets).alias("_bs"),
    )
    exploded = agg.select(
        *g, "_n", "_np", F.explode("_bs").alias("_s")
    ).select(
        *g,
        "_n",
        "_np",
        F.col("_s.bucket").alias("bucket"),
        F.coalesce(F.col("_s.n_included"), F.lit(0)).alias("n_included"),
        F.coalesce(F.col("_s.pos_included"), F.lit(0)).alias("pos_included"),
    )
    ni = F.col("n_included").cast("double")
    pi = F.col("pos_included").cast("double")
    nn = F.col("_n").cast("double")
    np_ = F.col("_np").cast("double")
    gains = F.when(F.col("_np") > 0, pi / np_)
    lift = F.when(
        (F.col("_np") > 0) & (F.col("n_included") > 0),
        (pi / np_) / (ni / nn),
    )
    return exploded.select(
        *g,
        "bucket",
        (F.col("bucket").cast("double") / F.lit(float(n_buckets))).alias(
            "cutoff_frac"
        ),
        "n_included",
        "pos_included",
        gains.alias("gains"),
        lift.alias("lift"),
    )


def gains_curve_sql(
    data_sql: str,
    score_col: str,
    label_col: str,
    group_columns,
    n_buckets: int = 10,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`gains_curve` (same quantize, same
    whole-tie-block inclusion integers)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    qq = (
        f"CAST(FLOOR(CAST({score_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    )
    rows = " UNION ALL ".join(
        f"SELECT {gsel}, _n, _np, {b} AS bucket, "
        f"COALESCE(MAX(CASE WHEN _cr <= (_n * {b} + {n_buckets - 1}) // {n_buckets}"
        f" THEN _cr END), 0) AS n_included, "
        f"COALESCE(MAX(CASE WHEN _cr <= (_n * {b} + {n_buckets - 1}) // {n_buckets}"
        f" THEN _cp END), 0) AS pos_included "
        f"FROM cum GROUP BY {gsel}, _n, _np"
        for b in range(1, n_buckets + 1)
    )
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q,
    CAST(CAST({label_col} AS BOOLEAN) AS BIGINT) AS _y
  FROM ({data_sql})
  WHERE {score_col} IS NOT NULL AND {label_col} IS NOT NULL
),
per AS (
  SELECT {gsel}, _q, COUNT(*) AS _r, SUM(_y) AS _p
  FROM d GROUP BY {gsel}, _q
),
cum AS (
  SELECT {gsel},
    CAST(SUM(_r) OVER (PARTITION BY {gsel} ORDER BY _q DESC) AS BIGINT) AS _cr,
    CAST(SUM(_p) OVER (PARTITION BY {gsel} ORDER BY _q DESC) AS BIGINT) AS _cp,
    CAST(SUM(_r) OVER (PARTITION BY {gsel}) AS BIGINT) AS _n,
    CAST(SUM(_p) OVER (PARTITION BY {gsel}) AS BIGINT) AS _np
  FROM per
),
b AS ({rows})
SELECT {gsel}, bucket,
  CAST(bucket AS DOUBLE) / {float(n_buckets)!r} AS cutoff_frac,
  n_included, pos_included,
  CASE WHEN _np > 0
    THEN CAST(pos_included AS DOUBLE) / CAST(_np AS DOUBLE) END AS gains,
  CASE WHEN _np > 0 AND n_included > 0
    THEN (CAST(pos_included AS DOUBLE) / CAST(_np AS DOUBLE))
       / (CAST(n_included AS DOUBLE) / CAST(_n AS DOUBLE)) END AS lift
FROM b
"""


# --------------------------------------------------------------------------
# isotonic calibration (PAV via the minimax identity)
# --------------------------------------------------------------------------


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Isotonic regression of the positive rate on the score per group
    (the PAV calibrator — sklearn's IsotonicRegression contract,
    public): the non-parametric sibling of calibration_curve (fixed
    deciles show calibration; the isotonic FIT is the monotone mapping
    you actually apply to recalibrate scores).

    Pool-adjacent-violators is sequential, so this uses the EXACT
    minimax identity instead (Robertson-Wright-Dykstra 1988):

        ĝ_k = max_{i≤k} min_{j≥k} (Σ_{v=i..j} pos_v) / (Σ_{v=i..j} n_v)

    over score BINS: rows collapse to per-(group, quantized-score)
    counts first, so the O(B²) pair frame is bounded by the 10^scale
    quantization grid (B ≤ 101 at scale 2) regardless of row count —
    the collapse is what makes the quadratic identity 100 TB-safe.
    Each pooled average is one double division of exact int64 sums;
    min/max selection is order-free, so the twin is bit-identical.

    Plan: count collapse → cumulative window → bounded pair fan-out →
    right-running min window (per anchor i) → max over i≤k.

    Returns (groups…, score, n, n_pos, calibrated) — calibrated is
    non-decreasing in score within each group by construction.
    """
    g = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(score_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    d = df.filter(
        F.col(score_col).isNotNull() & y.isNotNull()
    ).select(*g, q.alias("_q"), y.cast("boolean").cast("bigint").alias("_y"))
    bins = d.groupBy(*g, "_q").agg(
        F.count(F.lit(1)).alias("_w"), F.sum("_y").alias("_p")
    )
    wo = Window.partitionBy(*g).orderBy("_q")
    cum = bins.select(
        *g, "_q", "_w", "_p",
        F.row_number().over(wo).alias("_rn"),
        F.sum("_w").over(wo).alias("_cw"),
        F.sum("_p").over(wo).alias("_cp"),
    )
    li = cum.select(
        *g,
        F.col("_rn").alias("_i"),
        (F.col("_cw") - F.col("_w")).alias("_wi0"),
        (F.col("_cp") - F.col("_p")).alias("_pi0"),
    )
    rj = cum.select(
        *g,
        F.col("_rn").alias("_j"),
        F.col("_cw").alias("_wj"),
        F.col("_cp").alias("_pj"),
    )
    pairs = li.join(rj, on=g).filter(F.col("_i") <= F.col("_j")).select(
        *g, "_i", "_j",
        (
            (F.col("_pj") - F.col("_pi0")).cast("double")
            / (F.col("_wj") - F.col("_wi0")).cast("double")
        ).alias("_avg"),
    )
    wmin = (
        Window.partitionBy(*g, "_i")
        .orderBy(F.col("_j").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mins = pairs.select(
        *g, "_i", F.col("_j").alias("_k"), F.min("_avg").over(wmin).alias("_m")
    )
    fit = mins.filter(F.col("_i") <= F.col("_k")).groupBy(*g, "_k").agg(
        F.max("_m").alias("calibrated")
    )
    out = cum.join(
        fit.withColumnRenamed("_k", "_rn"), on=[*g, "_rn"]
    )
    return out.select(
        *g,
        (F.col("_q").cast("double") / F.lit(float(m))).alias("score"),
        F.col("_w").alias("n"),
        F.col("_p").alias("n_pos"),
        "calibrated",
    )


def isotonic_calibrate_sql(
    data_sql: str,
    score_col: str,
    label_sql: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`isotonic_calibrate` (same minimax frame,
    same division trees)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({score_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q,
    CAST(CAST({label_sql} AS BOOLEAN) AS BIGINT) AS _y
  FROM ({data_sql})
  WHERE {score_col} IS NOT NULL AND ({label_sql}) IS NOT NULL
),
bins AS (
  SELECT {gsel}, _q, COUNT(*) AS _w,
    CAST(SUM(_y) AS BIGINT) AS _p
  FROM d GROUP BY {gsel}, _q
),
cum AS MATERIALIZED (
  SELECT {gsel}, _q, _w, _p,
    CAST(ROW_NUMBER() OVER wo AS BIGINT) AS _rn,
    CAST(SUM(_w) OVER wo AS BIGINT) AS _cw,
    CAST(SUM(_p) OVER wo AS BIGINT) AS _cp
  FROM bins
  WINDOW wo AS (PARTITION BY {gsel} ORDER BY _q
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pairs AS (
  SELECT a.{', a.'.join(g)}, a._rn AS _i, b._rn AS _j,
    CAST(b._cp - (a._cp - a._p) AS DOUBLE)
      / CAST(b._cw - (a._cw - a._w) AS DOUBLE) AS _avg
  FROM cum a JOIN cum b
    ON {' AND '.join(f'b.{c} = a.{c}' for c in g)} AND a._rn <= b._rn
),
mins AS (
  SELECT {gsel}, _i, _j AS _k,
    MIN(_avg) OVER (PARTITION BY {gsel}, _i ORDER BY _j DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _m
  FROM pairs
),
fit AS (
  SELECT {gsel}, _k, MAX(_m) AS calibrated
  FROM mins WHERE _i <= _k GROUP BY {gsel}, _k
)
SELECT {', '.join(f'cum.{c}' for c in g)},
  CAST(_q AS DOUBLE) / {float(m)!r} AS score,
  _w AS n, _p AS n_pos, calibrated
FROM cum JOIN fit
  ON {' AND '.join(f'fit.{c} = cum.{c}' for c in g)} AND fit._k = cum._rn
"""


# --------------------------------------------------------------------------
# Brier decomposition (Murphy 1973)
# --------------------------------------------------------------------------


def brier_decomposition(
    df: DataFrame,
    prob_col: str,
    label_col,
    group_columns,
    scale: int = 2,
) -> DataFrame:
    """Murphy (1973) decomposition of the binned Brier score per group
    — calibration_curve PLOTS the reliability diagram; this op turns
    it into the three-number diagnosis forecasters act on:

        brier = reliability − resolution + uncertainty
        reliability = Σ_b n_b·(p̄_b − ō_b)²/N   (miscalibration — fixable
                                                 by recalibrating, e.g.
                                                 isotonic_calibrate)
        resolution  = Σ_b n_b·(ō_b − ō)²/N      (discrimination — NOT
                                                 fixable by relabeling)
        uncertainty = ō·(1 − ō)                 (the data's own floor)

    over quantized-probability bins (10^-scale grid — the same
    whole-bin contract as the calibration family).  Exact path: bin
    counts/sums are exact int64; each bin's reliability/resolution
    term is one fixed double tree 1e-9-quantized and summed as
    integers (unordered-sum discipline); ō comes from exact totals.

    Returns (groups…, n, n_bins, reliability, resolution, uncertainty,
    brier).
    """
    g = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(prob_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    d = df.filter(
        F.col(prob_col).isNotNull() & y.isNotNull()
    ).select(*g, q.alias("_q"), y.cast("boolean").cast("bigint").alias("_y"))
    bins = d.groupBy(*g, "_q").agg(
        F.count(F.lit(1)).alias("_nb"),
        F.sum("_y").alias("_ob"),
    )
    tot = bins.groupBy(*g).agg(
        F.sum("_nb").alias("_n"),
        F.sum("_ob").alias("_o"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    j = bins.join(F.broadcast(tot), on=g)
    q9 = F.lit(1.0e9)
    nb = F.col("_nb").cast("double")
    pb = F.col("_q").cast("double") / F.lit(float(m))
    ob = F.col("_ob").cast("double") / nb
    obar = F.col("_o").cast("double") / F.col("_n").cast("double")
    relt = F.floor(nb * (pb - ob) * (pb - ob) * q9 + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    rest = F.floor(nb * (ob - obar) * (ob - obar) * q9 + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    agg = j.groupBy(*g).agg(
        F.max("_n").alias("n"),
        F.max("n_bins").alias("n_bins"),
        F.max("_o").alias("_o"),
        F.sum(relt).alias("_rel"),
        F.sum(rest).alias("_res"),
    )
    nn = F.col("n").cast("double")
    obar2 = F.col("_o").cast("double") / nn
    s2d = lambda c: F.col(c).cast("string").cast("double") / F.lit(1.0e9)  # noqa: E731
    rel = s2d("_rel") / nn
    res = s2d("_res") / nn
    unc = obar2 * (F.lit(1.0) - obar2)
    return agg.select(
        *g,
        "n",
        "n_bins",
        rel.alias("reliability"),
        res.alias("resolution"),
        unc.alias("uncertainty"),
        (rel - res + unc).alias("brier"),
    )


def brier_decomposition_sql(
    data_sql: str,
    prob_col: str,
    label_sql: str,
    group_columns,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`brier_decomposition` (same bin grid, same
    quantized term sums)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({prob_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    nb = "CAST(_nb AS DOUBLE)"
    pb = f"(CAST(_q AS DOUBLE) / {float(m)!r})"
    ob = f"(CAST(_ob AS DOUBLE) / {nb})"
    obar = "(CAST(_o AS DOUBLE) / CAST(_n AS DOUBLE))"
    relt = (f"CAST(FLOOR({nb} * ({pb} - {ob}) * ({pb} - {ob})"
            " * 1000000000.0 + 0.5) AS DECIMAL(38,0))")
    rest = (f"CAST(FLOOR({nb} * ({ob} - {obar}) * ({ob} - {obar})"
            " * 1000000000.0 + 0.5) AS DECIMAL(38,0))")
    s2d = lambda c: (  # noqa: E731
        f"(CAST(CAST({c} AS VARCHAR) AS DOUBLE) / 1000000000.0)"
    )
    nn = "CAST(n AS DOUBLE)"
    rel = f"({s2d('_rel')} / {nn})"
    res = f"({s2d('_res')} / {nn})"
    obar2 = f"(CAST(_o AS DOUBLE) / {nn})"
    unc = f"({obar2} * (1.0 - {obar2}))"
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q,
    CAST(CAST({label_sql} AS BOOLEAN) AS BIGINT) AS _y
  FROM ({data_sql})
  WHERE {prob_col} IS NOT NULL AND ({label_sql}) IS NOT NULL
),
bins AS (
  SELECT {gsel}, _q, COUNT(*) AS _nb, CAST(SUM(_y) AS BIGINT) AS _ob
  FROM d GROUP BY {gsel}, _q
),
tot AS (
  SELECT {gsel}, CAST(SUM(_nb) AS BIGINT) AS _n,
    CAST(SUM(_ob) AS BIGINT) AS _o, COUNT(*) AS n_bins
  FROM bins GROUP BY {gsel}
),
agg AS (
  SELECT {gsel}, MAX(_n) AS n, MAX(n_bins) AS n_bins, MAX(_o) AS _o,
    CAST(SUM({relt}) AS DECIMAL(38,0)) AS _rel,
    CAST(SUM({rest}) AS DECIMAL(38,0)) AS _res
  FROM bins JOIN tot USING ({gsel})
  GROUP BY {gsel}
)
SELECT {gsel}, n, n_bins,
  {rel} AS reliability,
  {res} AS resolution,
  {unc} AS uncertainty,
  ({rel} - {res} + {unc}) AS brier
FROM agg
"""


# --------------------------------------------------------------------------
# Qini / uplift curve (treatment vs control incremental response)
# --------------------------------------------------------------------------


def qini_curve(
    df: DataFrame,
    score_col: str,
    treat_col: str,
    label_col: str,
    group_columns,
    n_buckets: int = 10,
    scale: int = 6,
) -> DataFrame:
    """Qini curve at score-ordered decile cutoffs (Radcliffe 2007) —
    gains_curve's UPLIFT sibling: where gains asks "target the top
    d/10, capture what share of responders", Qini asks "target the top
    d/10, cause how many INCREMENTAL responders vs not targeting" —
    the standard evaluation of uplift/heterogeneous-treatment models:

        qini_d   = cp_t(d) − cp_c(d)·cn_t(d)/cn_c(d)
        uplift_d = cp_t(d)/cn_t(d) − cp_c(d)/cn_c(d)

    with cp/cn the cumulative responders/rows per arm through the
    bucket cutoff.  Same deterministic whole-tie-block decile contract
    as gains_curve (NO ntile: quantized scores collapse to per-(group,
    score) counts, a block enters bucket d iff cumulative TOTAL rows ≤
    ⌈n·d/B⌉ — exact integer comparisons; both arms share the cutoff,
    as a real campaign would).  Buckets whose included slice lacks a
    control (or treated) row report NULL.

    Scale shape: identical to gains_curve — one count collapse keyed
    on (group, score), one cumulative window over collapsed rows, one
    B-literal fan-out.

    Returns (groups…, bucket, cutoff_frac, n_treat, n_ctl, resp_treat,
    resp_ctl, uplift, qini).
    """
    g = _as_list(group_columns)
    m = 10**scale
    q = F.floor(F.col(score_col).cast("double") * F.lit(m) + F.lit(0.5)).cast(
        "bigint"
    )
    t = F.col(treat_col).cast("boolean").cast("bigint")
    y = F.col(label_col).cast("boolean").cast("bigint")
    d = df.filter(
        F.col(score_col).isNotNull()
        & F.col(treat_col).isNotNull()
        & F.col(label_col).isNotNull()
    ).select(*g, q.alias("_q"), t.alias("_t"), y.alias("_y"))
    per = d.groupBy(*g, "_q").agg(
        F.count(F.lit(1)).alias("_r"),
        F.sum("_t").alias("_nt"),
        F.sum(F.col("_t") * F.col("_y")).alias("_pt"),
        F.sum((F.lit(1) - F.col("_t")) * F.col("_y")).alias("_pc"),
    )
    w = Window.partitionBy(*g).orderBy(F.col("_q").desc())
    wg = Window.partitionBy(*g)
    cum = per.select(
        *g,
        F.sum("_r").over(w).alias("_cr"),
        F.sum("_nt").over(w).alias("_cnt"),
        F.sum("_pt").over(w).alias("_cpt"),
        F.sum("_pc").over(w).alias("_cpc"),
        F.sum("_r").over(wg).alias("_n"),
    )
    buckets = []
    for b in range(1, n_buckets + 1):
        cut = F.expr(
            f"CAST((_n * {b} + {n_buckets - 1}) div {n_buckets} AS BIGINT)"
        )
        inc = F.col("_cr") <= cut
        buckets.append(
            F.struct(
                F.lit(b).alias("bucket"),
                F.max(F.when(inc, F.col("_cr"))).alias("_in"),
                F.max(F.when(inc, F.col("_cnt"))).alias("_int"),
                F.max(F.when(inc, F.col("_cpt"))).alias("_ipt"),
                F.max(F.when(inc, F.col("_cpc"))).alias("_ipc"),
            )
        )
    agg = cum.groupBy(*g).agg(
        F.max("_n").alias("_n"), F.array(*buckets).alias("_bs")
    )
    z = F.lit(0).cast("bigint")
    exploded = agg.select(*g, "_n", F.explode("_bs").alias("_s")).select(
        *g,
        "_n",
        F.col("_s.bucket").alias("bucket"),
        F.coalesce(F.col("_s._in"), z).alias("_in"),
        F.coalesce(F.col("_s._int"), z).alias("n_treat"),
        F.coalesce(F.col("_s._ipt"), z).alias("resp_treat"),
        F.coalesce(F.col("_s._ipc"), z).alias("resp_ctl"),
    )
    n_ctl = (F.col("_in") - F.col("n_treat")).alias("n_ctl")
    exploded = exploded.select(
        *g, "_n", "bucket", "_in", "n_treat", n_ctl, "resp_treat", "resp_ctl"
    )
    ct = F.col("n_treat").cast("double")
    cc = F.col("n_ctl").cast("double")
    pt = F.col("resp_treat").cast("double")
    pc = F.col("resp_ctl").cast("double")
    ok = (F.col("n_treat") > 0) & (F.col("n_ctl") > 0)
    uplift = F.when(ok, pt / ct - pc / cc)
    qini = F.when(ok, pt - pc * ct / cc)
    return exploded.select(
        *g,
        "bucket",
        (F.col("bucket").cast("double") / F.lit(float(n_buckets))).alias(
            "cutoff_frac"
        ),
        "n_treat",
        "n_ctl",
        "resp_treat",
        "resp_ctl",
        uplift.alias("uplift"),
        qini.alias("qini"),
    )


def qini_curve_sql(
    data_sql: str,
    score_col: str,
    treat_col: str,
    label_col: str,
    group_columns,
    n_buckets: int = 10,
    scale: int = 6,
) -> str:
    """DuckDB twin of :func:`qini_curve` (same shared-cutoff
    whole-tie-block integers)."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    m = 10**scale
    qq = f"CAST(FLOOR(CAST({score_col} AS DOUBLE) * {m} + 0.5) AS BIGINT)"
    rows = " UNION ALL ".join(
        f"SELECT {gsel}, _n, {b} AS bucket, "
        f"COALESCE(MAX(CASE WHEN _cr <= (_n * {b} + {n_buckets - 1}) // {n_buckets}"
        f" THEN _cr END), 0) AS _in, "
        f"COALESCE(MAX(CASE WHEN _cr <= (_n * {b} + {n_buckets - 1}) // {n_buckets}"
        f" THEN _cnt END), 0) AS n_treat, "
        f"COALESCE(MAX(CASE WHEN _cr <= (_n * {b} + {n_buckets - 1}) // {n_buckets}"
        f" THEN _cpt END), 0) AS resp_treat, "
        f"COALESCE(MAX(CASE WHEN _cr <= (_n * {b} + {n_buckets - 1}) // {n_buckets}"
        f" THEN _cpc END), 0) AS resp_ctl "
        f"FROM cum GROUP BY {gsel}, _n"
        for b in range(1, n_buckets + 1)
    )
    ct = "CAST(n_treat AS DOUBLE)"
    cc = "CAST(_in - n_treat AS DOUBLE)"
    pt = "CAST(resp_treat AS DOUBLE)"
    pc = "CAST(resp_ctl AS DOUBLE)"
    ok = "(n_treat > 0 AND _in - n_treat > 0)"
    return f"""
WITH d AS (
  SELECT {gsel}, {qq} AS _q,
    CAST(CAST({treat_col} AS BOOLEAN) AS BIGINT) AS _t,
    CAST(CAST({label_col} AS BOOLEAN) AS BIGINT) AS _y
  FROM ({data_sql})
  WHERE {score_col} IS NOT NULL AND {treat_col} IS NOT NULL
    AND {label_col} IS NOT NULL
),
per AS (
  SELECT {gsel}, _q, COUNT(*) AS _r, SUM(_t) AS _nt,
    SUM(_t * _y) AS _pt, SUM((1 - _t) * _y) AS _pc
  FROM d GROUP BY {gsel}, _q
),
cum AS (
  SELECT {gsel},
    CAST(SUM(_r) OVER (PARTITION BY {gsel} ORDER BY _q DESC) AS BIGINT) AS _cr,
    CAST(SUM(_nt) OVER (PARTITION BY {gsel} ORDER BY _q DESC) AS BIGINT) AS _cnt,
    CAST(SUM(_pt) OVER (PARTITION BY {gsel} ORDER BY _q DESC) AS BIGINT) AS _cpt,
    CAST(SUM(_pc) OVER (PARTITION BY {gsel} ORDER BY _q DESC) AS BIGINT) AS _cpc,
    CAST(SUM(_r) OVER (PARTITION BY {gsel}) AS BIGINT) AS _n
  FROM per
),
b AS ({rows})
SELECT {gsel}, bucket,
  CAST(bucket AS DOUBLE) / {float(n_buckets)!r} AS cutoff_frac,
  n_treat, CAST(_in - n_treat AS BIGINT) AS n_ctl, resp_treat, resp_ctl,
  CASE WHEN {ok} THEN {pt} / {ct} - {pc} / {cc} END AS uplift,
  CASE WHEN {ok} THEN {pt} - {pc} * {ct} / {cc} END AS qini
FROM b
"""
