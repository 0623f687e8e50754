"""fastText-style hashed-subword linear classifier — the standard
production language-ID / quality-filter architecture (Joulin et al.
2016 "Bag of Tricks for Efficient Text Classification"; subword
features per Bojanowski et al. 2017; per-class salted projections per
Weinberger et al. 2009 "Feature Hashing for Large Scale Multitask
Learning"): hash character bigrams into a fixed number of signed
slots — SALTED BY CLASS, so each one-vs-rest task gets its own random
projection and the joint argmax sees C·B informative dimensions —
average per document, fit one linear layer per class, predict the
argmax.

Where :func:`text.nb_classifier` memorizes word-given-class counts
(zero signal on unseen words — its score collapses to the class prior
off-vocabulary), the hashed CHARACTER-bigram features generalize to
morphological variants and unseen vocabulary — the fastText subword
story, and why it is the production lang-ID default.  The optional
``fit_filter`` trains on a subset and scores everything, making that
generalization measurable (the declared query fits on a deterministic
md5 70% split).

This is the exact-verifiable GRID variant of the architecture: each
class's projection is the feature width the engine's 4×4 Cramer IRLS
substrate solves exactly (intercept + 3 signed slots; production
raises the width and swaps SGD for IRLS — the pipeline shape is
identical), and every training round runs in integer lockstep with the
DuckDB twin via :func:`logit.irls_sql_chain`.

Spark-first shape: one explode (words → char bigrams, fanout C per
bigram for the salted slots) + ONE map-combinable conditional-sum
aggregation builds the feature frame (pinned once); each training
round computes ALL classes' moments in ONE 14·C-sum aggregation + a
1-row collect with the C Cramer solves evaluated in the same
projection (4 rounds = 4 jobs total, not 4·C — bounded driver state:
C·4 coefficients, the kmeans/bpe precedent); scoring is a per-doc
argmax over a C-sized exploded struct array.  No joins on the
training path, no per-row Python.

Exactness: signed slot counts are exact integers; per-doc features are
ratios of exact ints quantized at 1e-6; β training follows the
quality_logit lockstep discipline (integer moments, shared Cramer
tree, η clamp); predicted = argmax over INTEGER 1e-6-grid
probabilities with a total tiebreak (pq DESC, class ASC) — both
engines pick the same class for every document.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.logit import (
    _dec,
    _ECAP,
    _FB,
    _FP,
    _FX,
    _s2d,
    eta_q_col,
    irls_sql_chain,
    pq_from_eq_col,
    solve_float,
)

__all__ = [
    "fasttext_features",
    "fasttext_classifier",
    "fasttext_classifier_sql",
]

_B = 3  # signed hash slots per class (feature width 4 with intercept)


def _class_cols(i: int) -> list[str]:
    return ["_x0"] + [f"_x{i}_{j}" for j in range(1, _B + 1)]


def fasttext_features(
    docs: DataFrame,
    classes: tuple,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """(_id, _lbl, _x0, _x{i}_{1..B} per class i): intercept + each
    class's salted signed hashed char-bigram ratio slots on the 1e-6
    grid.  One explode + one aggregation."""
    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.operators.text import words

    bg = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        F.explode(words(F.col(text_col))).alias("_w"),
        # length guard BEFORE the bigram transform: Spark's
        # sequence(1, 0) DESCENDS ([1, 0]) instead of being empty like
        # DuckDB's range(1, 1) — a 1-char word would emit two phantom
        # bigrams on one engine only
    ).filter(F.length("_w") >= 2).select(
        "_id",
        "_lbl",
        F.explode(
            F.expr(
                "transform(sequence(1, length(_w) - 1),"
                " i -> substring(_w, i, 2))"
            )
        ).alias("_bg"),
    )
    # Round-14 (guide §2.3 "aggregate before you shuffle", §2.4): the
    # class-salted md5 projections are evaluated once per DISTINCT
    # bigram (a vocabulary-bounded frame, broadcast back), not 15×
    # per bigram OCCURRENCE inside the aggregate expressions — the
    # measured feature build was md5-dominated (probe: 10.5 s as
    # shipped, 5.6 s of it the per-occurrence hashing).  Occurrence
    # counts partial-aggregate map-side before the shuffle.  The sums
    # are the identical integers: Σ_occ sign·[slot=j] =
    # Σ_bg cnt·sign·[slot=j].
    cnt = bg.groupBy("_id", "_lbl", "_bg").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    vproj = [F.col("_bg")]
    for i in range(len(classes)):
        # class-salted hash: each one-vs-rest task gets its own random
        # projection (Weinberger 2009 multitask hashing)
        h = portable_hash64(F.concat(F.lit(f"{i}|"), F.col("_bg")))
        vproj.append(
            ((h % F.lit(_B * 2) >= F.lit(_B)).cast("bigint") * 2 - 1)
            .alias(f"_sg{i}")
        )
        vproj.append((h % F.lit(_B)).cast("int").alias(f"_sl{i}"))
    vocab = bg.select("_bg").distinct().select(*vproj)
    joined = cnt.join(F.broadcast(vocab), "_bg")
    aggs = [F.sum("_cnt").alias("_n")]
    for i in range(len(classes)):
        for j in range(_B):
            aggs.append(
                F.sum(
                    F.when(
                        F.col(f"_sl{i}") == F.lit(j),
                        F.col(f"_sg{i}") * F.col("_cnt"),
                    ).otherwise(0)
                ).alias(f"_c{i}_{j + 1}")
            )
    per_doc = joined.groupBy("_id", "_lbl").agg(*aggs)
    qx = lambda c: F.floor(c * F.lit(float(_FX)) + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    return per_doc.select(
        "_id",
        "_lbl",
        F.lit(_FX).cast("bigint").alias("_x0"),
        *[
            qx(
                F.col(f"_c{i}_{j}").cast("double")
                / F.col("_n").cast("double")
            ).alias(f"_x{i}_{j}")
            for i in range(len(classes))
            for j in range(1, _B + 1)
        ],
    )


def _feature_sql(
    table: str,
    classes: tuple,
    id_col: str,
    text_col: str,
    label_col: str,
) -> str:
    """DuckDB twin of :func:`fasttext_features` (one CTE body)."""
    from timeseriesutils_spark.operators.dedup import portable_hash64_sql

    slots, xcols = [], []
    for i in range(len(classes)):
        h = portable_hash64_sql(f"'{i}|' || _bg")
        for j in range(1, _B + 1):
            slots.append(
                f"SUM(CASE WHEN CAST({h} % {_B} AS INT) = {j - 1} THEN "
                f"CAST(CASE WHEN {h} % {_B * 2} >= {_B} THEN 1 ELSE 0 END"
                f" AS BIGINT) * 2 - 1 ELSE 0 END) AS _c{i}_{j}"
            )
            xcols.append(
                f"CAST(FLOOR(CAST(_c{i}_{j} AS DOUBLE) / CAST(_n AS DOUBLE)"
                f" * {_FX} + 0.5) AS BIGINT) AS _x{i}_{j}"
            )
    slot_sel = ",\n    ".join(slots)
    x_sel = ",\n    ".join(xcols)
    return f"""
  SELECT _id, _lbl, CAST({_FX} AS BIGINT) AS _x0,
    {x_sel}
  FROM (
    SELECT _id, _lbl, CAST(COUNT(*) AS BIGINT) AS _n,
    {slot_sel}
    FROM (
      SELECT _id, _lbl, unnest([substring(_w, i, 2)
        FOR i IN range(1, len(_w))]) AS _bg
      FROM (
        SELECT {id_col} AS _id, {label_col} AS _lbl,
          unnest(string_split_regex(lower(trim({text_col})), '\\s+')) AS _w
        FROM {table} WHERE {text_col} IS NOT NULL
      ) WHERE len(_w) >= 2
    ) GROUP BY _id, _lbl
  )"""


def _irls_fit_joint(
    feats: DataFrame, classes: tuple, n_rounds: int
) -> list[list[int]]:
    """All classes' one-vs-rest IRLS fits driven together: per round
    ONE 14·C-sum aggregation over the (already fit-filtered) feature
    frame and ONE collected row carrying every class's Cramer solve.
    Returns [β_i] as 1e-6-grid ints.

    Round-14 (guide §7.3 — the driver, not the cluster, was the
    bottleneck): each round's ~90 staged columns + 70 aggregates were
    built with ~1000 py4j Column calls (~2.1 s measured per round,
    dominating the 0.23 s of actual execution over the cached frame).
    The round is now rendered as SQL TEXT (one ``selectExpr``/
    ``F.expr`` round trip per expression string) producing the
    IDENTICAL analyzed plan — β still enters as folded decimal
    literals, which land in the codegen references array, so rounds
    2..K also reuse the round-1 compiled stage.  The Column-API
    builder is kept as :func:`_irls_fit_joint_colapi` (the A/B
    control pinned by tests/test_round14_opt.py)."""
    C = len(classes)
    betas = [[0, 0, 0, 0] for _ in range(C)]
    d38 = lambda s: f"CAST({s} AS DECIMAL(38,0))"  # noqa: E731
    for _ in range(int(n_rounds)):
        eq_exprs = []
        for i in range(C):
            cols = _class_cols(i)
            etan = " + ".join(
                f"{d38(int(betas[i][j]))} * {d38(cols[j])}"
                for j in range(4)
            )
            eq_exprs.append(
                f"GREATEST({-_ECAP}, LEAST({_ECAP}, CAST(FLOOR("
                f"CAST(CAST(({etan}) AS STRING) AS DOUBLE) / 1.0E12"
                f" * {float(_FX)!r}D + 0.5D) AS BIGINT))) AS _eq{i}"
            )
        staged = feats.selectExpr("*", *eq_exprs)
        staged = staged.selectExpr(
            "*",
            *[
                f"GREATEST(1, LEAST({_FP - 1}, CAST(FLOOR("
                f"(1.0D / (1.0D + EXP(-(CAST(_eq{i} AS DOUBLE) /"
                f" {float(_FP)!r}D)))) * {float(_FP)!r}D + 0.5D)"
                f" AS BIGINT))) AS _pq{i}"
                for i in range(C)
            ],
        )
        wnz = []
        for i, k in enumerate(classes):
            lbl = str(k).replace("'", "''")
            y = f"CAST((_lbl = '{lbl}') AS INT)"
            w = f"(_pq{i} * ({_FP} - _pq{i}))"
            wnz.append(f"{w} AS _w{i}")
            wnz.append(
                f"(({d38(w)} * {d38(f'_eq{i}')} + "
                f"{d38(f'(({y} * {_FP} - _pq{i}) * {_FP})')} * {_FP})"
                f" * {_FB}) AS _nz{i}"
            )
        staged = staged.selectExpr("*", *wnz)
        aggs = []
        for i in range(C):
            cols = _class_cols(i)
            for j in range(4):
                for k2 in range(j, 4):
                    aggs.append(
                        F.expr(
                            f"SUM({d38(cols[j])} * {d38(cols[k2])}"
                            f" * {d38(f'_w{i}')})"
                        ).alias(f"c{i}a{j}{k2}")
                    )
            for j in range(4):
                aggs.append(
                    F.expr(f"SUM({d38(cols[j])} * _nz{i})").alias(
                        f"c{i}b{j}"
                    )
                )
        mom = staged.groupBy().agg(*aggs)
        row = mom.selectExpr(
            *[
                f"CAST(CAST({c} AS STRING) AS DOUBLE) AS {c}"
                for c in mom.columns
            ]
        ).collect()[0].asDict()
        names = [
            f"a{j}{k2}" for j in range(4) for k2 in range(j, 4)
        ] + [f"b{j}" for j in range(4)]
        for i in range(C):
            m = {n: row[f"c{i}{n}"] for n in names}
            if any(v is None for v in m.values()):
                continue  # degenerate moments: keep this class's β
            d, outs = solve_float(m)
            if d == 0.0:
                continue  # singular: keep this class's previous β
            betas[i] = [
                int(math.floor(outs[j] / d + 0.5)) for j in range(4)
            ]
    return betas


def _irls_fit_joint_colapi(
    feats: DataFrame, classes: tuple, n_rounds: int
) -> list[list[int]]:
    """Column-API builder of the SAME joint IRLS round — the r13 form,
    kept verbatim as the A/B control for :func:`_irls_fit_joint`."""
    C = len(classes)
    betas = [[0, 0, 0, 0] for _ in range(C)]
    for _ in range(int(n_rounds)):
        staged = feats
        proj = ["*"]
        for i in range(C):
            proj.append(
                eta_q_col(betas[i], _class_cols(i)).alias(f"_eq{i}")
            )
        staged = staged.select(*proj)
        staged = staged.select(
            "*",
            *[
                pq_from_eq_col(f"_eq{i}").alias(f"_pq{i}")
                for i in range(C)
            ],
        )
        nz_cols, w_cols = [], []
        for i, k in enumerate(classes):
            y = (F.col("_lbl") == F.lit(k)).cast("int")
            w = F.col(f"_pq{i}") * (F.lit(_FP) - F.col(f"_pq{i}"))
            w_cols.append(w.alias(f"_w{i}"))
            nz_cols.append(
                (
                    (
                        _dec(w) * _dec(F.col(f"_eq{i}"))
                        + _dec((y * F.lit(_FP) - F.col(f"_pq{i}")) * F.lit(_FP))
                        * F.lit(_FP)
                    )
                    * F.lit(_FB)
                ).alias(f"_nz{i}")
            )
        staged = staged.select("*", *w_cols, *nz_cols)
        aggs = []
        for i in range(C):
            cols = _class_cols(i)
            for j in range(4):
                for k2 in range(j, 4):
                    aggs.append(
                        F.sum(
                            _dec(F.col(cols[j])) * _dec(F.col(cols[k2]))
                            * _dec(F.col(f"_w{i}"))
                        ).alias(f"c{i}a{j}{k2}")
                    )
            for j in range(4):
                aggs.append(
                    F.sum(
                        _dec(F.col(cols[j])) * F.col(f"_nz{i}")
                    ).alias(f"c{i}b{j}")
                )
        mom = staged.groupBy().agg(*aggs)
        # one collected row carries every class's 14 string-cast double
        # moments; the C Cramer solves run driver-side, bit-identical
        # to the generated det expressions (logit._det_float)
        row = mom.select(
            *[_s2d(F.col(c)).alias(c) for c in mom.columns]
        ).collect()[0].asDict()
        names = [
            f"a{j}{k2}" for j in range(4) for k2 in range(j, 4)
        ] + [f"b{j}" for j in range(4)]
        for i in range(C):
            m = {n: row[f"c{i}{n}"] for n in names}
            if any(v is None for v in m.values()):
                continue  # degenerate moments: keep this class's β
            d, outs = solve_float(m)
            if d == 0.0:
                continue  # singular: keep this class's previous β
            betas[i] = [
                int(math.floor(outs[j] / d + 0.5)) for j in range(4)
            ]
    return betas


def fasttext_classifier(
    docs: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    classes: tuple | None = None,
    n_rounds: int = 4,
    fit_filter=None,
) -> DataFrame:
    """One-vs-rest salted-hashed-bigram linear classifier (module doc).

    ``classes``: the (sorted) label set; None collects it from the data
    (bounded driver state — the class count).  ``fit_filter``: optional
    boolean Column — train on the filtered subset, score EVERY doc (the
    train/test split that makes subword generalization measurable).
    Returns one row per document with ≥ 1 char bigram:
    (doc_id, label, predicted, correct, p_top).
    """
    from timeseriesutils_spark.functions.cache import pin

    if classes is None:
        classes = tuple(
            sorted(
                r[0]
                for r in docs.filter(F.col(label_col).isNotNull())
                .select(label_col)
                .distinct()
                .collect()
            )
        )
    feats = pin(
        fasttext_features(docs, classes, id_col, text_col, label_col)
    )
    train = feats.filter(fit_filter) if fit_filter is not None else feats
    betas = _irls_fit_joint(train, classes, n_rounds)
    # two projection layers total (η then p), not 2·C chained selects —
    # Catalyst collapses chained projections by INLINING, so a deep
    # chain re-embeds every η tree into every downstream consumer
    # (round-12 expression-inlining lesson)
    scored = feats.select(
        "*",
        *[
            eta_q_col(betas[i], _class_cols(i)).alias(f"_eqf{i}")
            for i in range(len(classes))
        ],
    ).select(
        "*",
        *[
            pq_from_eq_col(f"_eqf{i}").alias(f"_pqf{i}")
            for i in range(len(classes))
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("cls"), F.col(f"_pqf{i}").alias("pq")
            )
            for i, k in enumerate(classes)
        ]
    )
    exploded = scored.select("_id", "_lbl", F.explode(rows).alias("c"))
    w = Window.partitionBy("_id").orderBy(
        F.col("c.pq").desc(), F.col("c.cls")
    )
    return (
        exploded.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            F.col("_id").alias(id_col),
            F.col("_lbl").alias("label"),
            F.col("c.cls").alias("predicted"),
            (F.col("c.cls") == F.col("_lbl")).alias("correct"),
            (F.col("c.pq").cast("double") / F.lit(float(_FP))).alias("p_top"),
        )
    )


def fasttext_classifier_sql(
    table: str = "documents",
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    classes: tuple = ("de", "en", "es", "fr", "zh"),
    n_rounds: int = 4,
    fit_where: str | None = None,
) -> str:
    """DuckDB twin of :func:`fasttext_classifier` — the feature CTE,
    per-class projection CTEs feeding one :func:`logit.irls_sql_chain`
    each, then the shared argmax.  ``classes`` must be the explicit
    (sorted) label set: the oracle is a static statement, so the Spark
    query declares the same literal classes.  ``fit_where`` mirrors
    ``fit_filter`` (train subset; scoring covers every doc)."""
    ctes = [
        "f AS MATERIALIZED ("
        + _feature_sql(table, classes, id_col, text_col, label_col)
        + "\n)"
    ]
    train_src = "f"
    if fit_where:
        ctes.append(f"ftr AS (SELECT * FROM f WHERE {fit_where})")
        train_src = "ftr"
    score_sqls = []
    for i, k in enumerate(classes):
        cols = _class_cols(i)
        ctes.append(
            f"f{i} AS (SELECT _lbl, _x0, "
            + ", ".join(
                f"{cols[j]} AS _x{j}" for j in range(1, 4)
            )
            + f" FROM {train_src})"
        )
        chain, bfin = irls_sql_chain(
            f"c{i}", f"_lbl = '{k}'", n_rounds, feat_cte=f"f{i}"
        )
        ctes.extend(chain)
        etan = " + ".join(
            f"CAST(q{j} AS HUGEINT) * {cols[j]}" for j in range(4)
        )
        score_sqls.append(
            f"""SELECT _id, _lbl, '{k}' AS cls,
    GREATEST(1, LEAST({_FP - 1},
      CAST(FLOOR((1.0 / (1.0 + exp(-(
        CAST(GREATEST(CAST(-{_ECAP} AS BIGINT),
          LEAST(CAST({_ECAP} AS BIGINT),
          CAST(FLOOR((CAST(CAST(({etan}) AS VARCHAR) AS DOUBLE) / 1e12)
               * {_FX} + 0.5) AS BIGINT))) AS DOUBLE) / {float(_FP)!r}))))
        * {_FP} + 0.5) AS BIGINT))) AS pq
  FROM f CROSS JOIN {bfin}"""
        )
    unioned = "\n  UNION ALL\n  ".join(score_sqls)
    return (
        "WITH " + ",\n".join(ctes) + f""",
long AS (
  {unioned}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY _id
    ORDER BY pq DESC, cls) AS _r
  FROM long
)
SELECT _id AS {id_col}, _lbl AS label, cls AS predicted,
  cls = _lbl AS correct,
  CAST(pq AS DOUBLE) / {float(_FP)!r} AS p_top
FROM ranked WHERE _r = 1
"""
    )
