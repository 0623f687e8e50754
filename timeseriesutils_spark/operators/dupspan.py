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
