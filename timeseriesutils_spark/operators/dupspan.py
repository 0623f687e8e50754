"""Exact duplicated-span detection: substring-level dedup.

Document-level dedup (operators/dedup.py) drops whole near-duplicate
documents; training-data pipelines also need the finer op — find the
*spans inside* a document that are verbatim repeats of text in other
documents (boilerplate headers, license blocks, templated passages) so
they can be cut while keeping the unique remainder.  This is the
n-gram-window form of exact-substring deduplication from the
training-data dedup literature (suffix-array ExactSubstr dedup); the
reference engine family has nothing comparable (the reference is a
rolling-feature module, /root/reference/src/timeseriesutils/featurize.py).

Shape — three relational stages, no pair explosion anywhere:

1. **Window hashing**: every ``ngram_words``-word window (stride 1)
   per document → (doc_id, pos, h) with h an engine-portable 60-bit
   md5 hash of the window text (dedup.portable_hash64).  JVM-side
   ``transform(sequence(...))`` + explode — no Python.
2. **Duplicated-hash set**: GROUP BY h HAVING COUNT(DISTINCT doc) ≥
   min_docs.  Two-stage partial aggregation on an int64 key; a hot
   boilerplate window costs one counter, never a pairs blow-up —
   unlike pairwise dedup there is no quadratic term at any frequency,
   so no ``max_posting`` cap is needed.
3. **Span assembly**: join windows back to the duplicated set (int64
   shuffle join), then merge overlapping windows per document with the
   gaps-and-islands window trick (running max of span end → island id
   by prefix sum) — one exchange on doc_id.

Every stage is exact integer/string arithmetic → bit-identical to the
DuckDB twin (:func:`dup_spans_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.dedup import (
    portable_hash64,
    portable_hash64_sql,
)


def dup_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_words: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, span_start, span_end, n_windows): maximal word-offset
    spans [span_start, span_end) whose every ``ngram_words``-window
    also occurs in ≥ ``min_docs``−1 other documents.

    Tokenization matches operators/text.py: lowercase, trim, split on
    ``\\s+``.  Offsets are 0-based word positions.
    """
    n = int(ngram_words)
    words = docs.select(
        F.col(id_col), F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_w")
    ).where(F.size("_w") >= n)
    win = (
        words.select(
            id_col,
            F.explode(
                F.expr(f"transform(sequence(0, size(_w) - {n}), i -> "
                       f"named_struct('pos', CAST(i AS BIGINT), "
                       f"'txt', array_join(slice(_w, i + 1, {n}), ' ')))")
            ).alias("x"),
        )
        .select(id_col, F.col("x.pos").alias("pos"),
                portable_hash64(F.col("x.txt")).alias("h"))
    )
    dup = (
        win.groupBy("h")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("h")
    )
    hits = win.join(dup, "h").select(id_col, "pos")
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_pre = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = (
        hits.withColumn("_prev_end", F.max(F.col("pos") + n).over(w_prev))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev_end").isNull() | (F.col("pos") > F.col("_prev_end")), 1
            ).otherwise(0),
        )
        .withColumn("_island", F.sum("_new").over(w_pre))
    )
    return (
        isl.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("_island")
        .select(id_col, "span_start", "span_end", "n_windows")
    )


def dup_spans_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_words: int = 8,
    min_docs: int = 2,
) -> str:
    """DuckDB twin of :func:`dup_spans` — same tokenization, same md5
    window hashes, same island merge."""
    n = int(ngram_words)
    h = portable_hash64_sql(f"array_to_string(ws[i+1:i+{n}], ' ')")
    return f"""
WITH w AS (
  SELECT {id_col}, string_split_regex(lower(trim({text_col})), '\\s+') AS ws
  FROM {table}
),
win AS (
  SELECT {id_col}, CAST(i AS BIGINT) AS pos, {h} AS h
  FROM w, UNNEST(generate_series(0, len(ws) - {n})) AS t(i)
  WHERE len(ws) >= {n}
),
dup AS (SELECT h FROM win GROUP BY h HAVING COUNT(DISTINCT {id_col}) >= {min_docs}),
hits AS (SELECT win.{id_col}, pos FROM win JOIN dup USING (h)),
m AS (
  SELECT {id_col}, pos,
    MAX(pos + {n}) OVER (PARTITION BY {id_col} ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM hits
),
isl AS (
  SELECT {id_col}, pos,
    SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
      OVER (PARTITION BY {id_col} ORDER BY pos
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM m
)
SELECT {id_col}, MIN(pos) AS span_start, MAX(pos) + {n} AS span_end,
  COUNT(*) AS n_windows
FROM isl GROUP BY {id_col}, island
"""


def _wins(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, pos, h): every k-word window per document, md5-hashed —
    the dup_spans window builder, parameterized by width."""
    words = docs.select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_w"),
    ).where(F.size("_w") >= k)
    return words.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, size(_w) - {k}), i -> "
                f"named_struct('pos', CAST(i AS BIGINT), "
                f"'txt', array_join(slice(_w, i + 1, {k}), ' ')))"
            )
        ).alias("x"),
    ).select(
        id_col,
        F.col("x.pos").alias("pos"),
        portable_hash64(F.col("x.txt")).alias("h"),
    )


def dup_span_exact_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact_words: int = 4,
    ngram_words: int = 8,
    max_posting: int = 16,
    top_pairs: int = 64,
    engine: str = "pruned",
) -> DataFrame:
    """EXACT longest-duplicated-span recall audit for :func:`dup_spans`
    (Lee et al. 2021 "Deduplicating Training Data Makes Language Models
    Better" — ExactSubstr dedup): per candidate document pair, the true
    longest common word-span of length ≥ ``exact_words``, next to the
    longest span the production ``ngram_words``-window hashing can see
    for that pair — the minhash_estimate_audit pattern, quantifying
    exactly what the hash-granularity span detector misses (every span
    with length in [exact_words, ngram_words) is invisible to it).

    Exact form, relationally (no suffix array needed at audit scale): a
    common span of length s ≥ L is precisely a run of s−L+1 consecutive
    matching L-gram positions on one (pos_a − pos_b) DIAGONAL, so
    longest-span = longest diagonal island over the L-gram match set —
    the gaps-and-islands trick dup_spans already uses, applied per
    (pair, diagonal).  (Window hashes stand in for window text, the
    standing dup_spans convention; a 60-bit md5 collision is the only
    deviation from byte-exactness.)

    Scale bounds (the quadratic stages are explicitly capped, the
    dedup-family discipline): candidate pairs come from shared L-grams
    whose posting list has 2..``max_posting`` documents (hot
    boilerplate hashes are skipped, never exploded), and only the
    ``top_pairs`` pairs by shared-L-gram count (total order: count
    DESC, ids ASC) reach the diagonal stage.

    Returns one row per audited pair: (doc_a, doc_b, shared_lgrams,
    exact_len, exact_a_start, exact_b_start, detected_len, missed =
    exact_len − detected_len, recovered).
    """
    from timeseriesutils_spark.functions.cache import pin

    L = int(exact_words)
    n = int(ngram_words)
    if L > n:
        raise ValueError("exact_words must be <= ngram_words")
    # pinned: winL (one md5 per L-gram occurrence — the dominant
    # per-row cost) feeds BOTH the posting-count aggregate and the
    # eligible join; unpinned it runs twice
    winL = pin(_wins(docs, id_col, text_col, L))
    eligible = pin(
        winL.groupBy("h")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .where((F.col("_nd") >= 2) & (F.col("_nd") <= int(max_posting)))
        .select("h")
    )
    wl = winL.join(eligible, "h")
    a = wl.select(
        F.col("h"),
        F.col(id_col).alias("_a"),
        F.col("pos").alias("_pa"),
    )
    b = wl.select(
        F.col("h"),
        F.col(id_col).alias("_b"),
        F.col("pos").alias("_pb"),
    )
    pair_hits = a.join(b, "h").where(F.col("_a") < F.col("_b"))
    # pinned: the top-pairs frame is read three times (both hit tiers +
    # the output join) and each read would otherwise replay the full
    # corpus L-gram self-join (guide §2.4)
    pairs = pin(
        pair_hits.select("_a", "_b", "h")
        .distinct()
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("shared_lgrams"))
        .orderBy(F.col("shared_lgrams").desc(), "_a", "_b")
        .limit(int(top_pairs))
    )
    # round-14 (guide §2.3 "shuffle fewer bytes", §2.4): every stage
    # past the pair pick concerns at most 2·top_pairs documents — both
    # hit tiers now re-window ONLY those documents instead of the full
    # corpus (the N-gram tier previously self-joined every 8-word
    # window in the corpus before filtering to the ≤64 audited pairs).
    # Identical rows by construction: hits are filtered to audited
    # (_a,_b) pairs either way, and both pair members are audited docs.
    pair_ids = (
        pairs.select(F.col("_a").alias(id_col))
        .unionByName(pairs.select(F.col("_b").alias(id_col)))
        .distinct()
    )
    docs_top = docs.join(F.broadcast(pair_ids), id_col)

    def _longest_runs(hits, width):
        """Longest diagonal island per pair over a (pair, pa, pb) match
        frame: (pair, len, a_start, b_start) of the winner (total
        tiebreak: len DESC, a_start, b_start)."""
        d = hits.withColumn("_diag", F.col("_pa") - F.col("_pb"))
        w_lag = Window.partitionBy("_a", "_b", "_diag").orderBy("_pa")
        w_run = (
            Window.partitionBy("_a", "_b", "_diag")
            .orderBy("_pa")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        isl = (
            d.withColumn("_prev", F.lag("_pa").over(w_lag))
            .withColumn(
                "_new",
                F.when(
                    F.col("_prev").isNull()
                    | (F.col("_pa") != F.col("_prev") + 1),
                    1,
                ).otherwise(0),
            )
            .withColumn("_isl", F.sum("_new").over(w_run))
        )
        runs = isl.groupBy("_a", "_b", "_diag", "_isl").agg(
            (F.count(F.lit(1)) + F.lit(width - 1)).alias("_len"),
            F.min("_pa").alias("_as"),
            F.min("_pb").alias("_bs"),
        )
        w_best = Window.partitionBy("_a", "_b").orderBy(
            F.col("_len").desc(), F.col("_as"), F.col("_bs")
        )
        return (
            runs.withColumn("_r", F.row_number().over(w_best))
            .where(F.col("_r") == 1)
            .select("_a", "_b", "_len", "_as", "_bs")
        )

    pb = F.broadcast(pairs)
    if engine == "pruned":
        # L-gram hits for the audited pairs, rebuilt from the
        # ≤2·top_pairs documents; the corpus-global posting-eligibility
        # filter is kept (it decides WHICH windows may match, and is
        # already pinned)
        winL_top = _wins(docs_top, id_col, text_col, L).join(eligible, "h")
        aL = winL_top.select(
            "h", F.col(id_col).alias("_a"), F.col("pos").alias("_pa")
        )
        bL = winL_top.select(
            "h", F.col(id_col).alias("_b"), F.col("pos").alias("_pb")
        )
        hitsL = (
            aL.join(bL, "h")
            .where(F.col("_a") < F.col("_b"))
            .join(pb.select("_a", "_b"), ["_a", "_b"])
            .select("_a", "_b", "_pa", "_pb")
        )
        winN = _wins(docs_top, id_col, text_col, n)
    else:  # engine == "full": the pre-round-14 shape (A/B control)
        hitsL = pair_hits.join(pb.select("_a", "_b"), ["_a", "_b"]).select(
            "_a", "_b", "_pa", "_pb"
        )
        winN = _wins(docs, id_col, text_col, n)
    exact = _longest_runs(hitsL, L)
    an = winN.select(
        "h", F.col(id_col).alias("_a"), F.col("pos").alias("_pa")
    )
    bn = winN.select(
        "h", F.col(id_col).alias("_b"), F.col("pos").alias("_pb")
    )
    hitsN = (
        an.join(bn, "h")
        .where(F.col("_a") < F.col("_b"))
        .join(pb.select("_a", "_b"), ["_a", "_b"])
        .select("_a", "_b", "_pa", "_pb")
    )
    det = _longest_runs(hitsN, n).select(
        "_a", "_b", F.col("_len").alias("_dlen")
    )
    out = (
        pairs.join(exact, ["_a", "_b"])
        .join(det, ["_a", "_b"], "left")
        .select(
            F.col("_a").alias("doc_a"),
            F.col("_b").alias("doc_b"),
            F.col("shared_lgrams").cast("bigint").alias("shared_lgrams"),
            F.col("_len").cast("bigint").alias("exact_len"),
            F.col("_as").cast("bigint").alias("exact_a_start"),
            F.col("_bs").cast("bigint").alias("exact_b_start"),
            F.coalesce(F.col("_dlen"), F.lit(0)).cast("bigint").alias(
                "detected_len"
            ),
        )
        .withColumn(
            "missed", (F.col("exact_len") - F.col("detected_len")).cast("bigint")
        )
        .withColumn("recovered", F.col("detected_len") >= F.col("exact_len"))
    )
    return out


def dup_span_exact_audit_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    exact_words: int = 4,
    ngram_words: int = 8,
    max_posting: int = 16,
    top_pairs: int = 64,
) -> str:
    """DuckDB twin of :func:`dup_span_exact_audit` — same hashes, same
    caps, same diagonal islands, same tiebreaks."""
    L = int(exact_words)
    n = int(ngram_words)
    hL = portable_hash64_sql(f"array_to_string(ws[i+1:i+{L}], ' ')")
    hN = portable_hash64_sql(f"array_to_string(ws[i+1:i+{n}], ' ')")

    def runs_cte(src, width, out):
        return f"""{out}_isl AS (
  SELECT _a, _b, _pa - _pb AS _diag, _pa, _pb,
    LAG(_pa) OVER (PARTITION BY _a, _b, _pa - _pb ORDER BY _pa) AS _prev
  FROM {src}
),
{out}_isl2 AS (
  SELECT _a, _b, _diag, _pa, _pb,
    SUM(CASE WHEN _prev IS NULL OR _pa != _prev + 1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY _a, _b, _diag ORDER BY _pa
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _isl
  FROM {out}_isl
),
{out}_runs AS (
  SELECT _a, _b, _diag, _isl,
    COUNT(*) + {width - 1} AS _len, MIN(_pa) AS _as, MIN(_pb) AS _bs
  FROM {out}_isl2 GROUP BY _a, _b, _diag, _isl
),
{out} AS (
  SELECT _a, _b, _len, _as, _bs FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY _a, _b
      ORDER BY _len DESC, _as, _bs) AS _r
    FROM {out}_runs
  ) WHERE _r = 1
)"""

    return f"""
WITH w AS (
  SELECT {id_col} AS _id,
    string_split_regex(lower(trim({text_col})), '\\s+') AS ws
  FROM {table}
),
winL AS (
  SELECT _id, CAST(i AS BIGINT) AS pos, {hL} AS h
  FROM w, UNNEST(generate_series(0, len(ws) - {L})) AS t(i)
  WHERE len(ws) >= {L}
),
eligible AS (
  SELECT h FROM winL GROUP BY h
  HAVING COUNT(DISTINCT _id) BETWEEN 2 AND {int(max_posting)}
),
wl AS (SELECT winL.* FROM winL JOIN eligible USING (h)),
pair_hits AS (
  SELECT a.h, a._id AS _a, a.pos AS _pa, b._id AS _b, b.pos AS _pb
  FROM wl a JOIN wl b USING (h) WHERE a._id < b._id
),
pairs AS (
  SELECT _a, _b, CAST(COUNT(*) AS BIGINT) AS shared_lgrams
  FROM (SELECT DISTINCT _a, _b, h FROM pair_hits)
  GROUP BY _a, _b
  ORDER BY shared_lgrams DESC, _a, _b LIMIT {int(top_pairs)}
),
hitsL AS (
  SELECT ph._a, ph._b, ph._pa, ph._pb
  FROM pair_hits ph JOIN pairs USING (_a, _b)
),
{runs_cte('hitsL', L, 'exact')},
winN AS (
  SELECT _id, CAST(i AS BIGINT) AS pos, {hN} AS h
  FROM w, UNNEST(generate_series(0, len(ws) - {n})) AS t(i)
  WHERE len(ws) >= {n}
),
hitsN AS (
  SELECT a._id AS _a, a.pos AS _pa, b._id AS _b, b.pos AS _pb
  FROM winN a JOIN winN b USING (h)
  JOIN pairs ON a._id = pairs._a AND b._id = pairs._b
  WHERE a._id < b._id
),
{runs_cte('hitsN', n, 'det')}
SELECT p._a AS doc_a, p._b AS doc_b, p.shared_lgrams,
  CAST(e._len AS BIGINT) AS exact_len,
  CAST(e._as AS BIGINT) AS exact_a_start,
  CAST(e._bs AS BIGINT) AS exact_b_start,
  CAST(COALESCE(d._len, 0) AS BIGINT) AS detected_len,
  CAST(e._len - COALESCE(d._len, 0) AS BIGINT) AS missed,
  COALESCE(d._len, 0) >= e._len AS recovered
FROM pairs p
JOIN exact e USING (_a, _b)
LEFT JOIN det d USING (_a, _b)
"""
