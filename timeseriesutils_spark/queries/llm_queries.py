"""LLM-data-pipeline queries: dedup (exact / n-gram Jaccard / MinHash-LSH
/ SimHash), embedding similarity search (brute-force + LSH), text
analysis (stats, quality, language-ID, fingerprint, TF-IDF), multimodal
binary plumbing.

Oracles exist wherever the computation is cross-engine deterministic
(string ops restricted to the Java-regex ∩ RE2 syntax subset; decimal-
exact float accumulation).  xxhash64-seeded ops (MinHash, SimHash,
hyperplane LSH) have no DuckDB twin → rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseriesutils_spark.functions.cache import pin

from timeseriesutils_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
    ngram_jaccard_pairs,
    simhash_docs,
)
from timeseriesutils_spark.operators.multimodal import (
    attach_binary,
    extract_media_features,
    sample_frames,
)
from timeseriesutils_spark.operators.similarity import (
    embedding_lsh_pairs_sql,
    embedding_near_dup_pairs,
    knn_bruteforce,
    knn_ivf,
    knn_lsh,
    knn_lsh_sql,
)
from timeseriesutils_spark.operators.text import (
    EMAIL_PATTERN,
    TOKEN_PATTERN,
    URL_PATTERN,
    LANG_MARKERS,
    chunk_text,
    chunk_text_sql,
    clean_text,
    corpus_stats,
    fingerprint,
    lang_id,
    length_histogram,
    pii_scrub,
    pii_scrub_sql,
    quality_score,
    repetition_stats,
    text_stats,
    tf_idf,
)
from timeseriesutils_spark.queries import Q
from timeseriesutils_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


# --- dedup ----------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by full text: canonical (min) id + multiplicity."""
    return (
        _docs(spark, sf_dir)
        .groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("copies"))
        .select("doc_id", "copies")
    )


_SQL_DEDUP_EXACT = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS copies FROM documents GROUP BY text
"""


# Stop-shingle bound for the declared Jaccard family: a shingle shared by
# more than MAX_POSTING docs emits no pairs (it carries no near-dup signal
# and its C(k,2) pair expansion is the one unbounded term at corpus scale).
# Mirrored in the oracle SQL's `ok` CTE so both engines drop the same
# shingles; union sizes stay full-set, so Jaccard is a lower bound when a
# hot shingle is actually dropped (none is, at testdata scale).
MAX_POSTING = 128


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (≥ 0.6), hot shingles bounded."""
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.6, max_posting=MAX_POSTING
    )


def _sql_ngram_jaccard(threshold: float = 0.6) -> str:
    """Render the 3-gram Jaccard pair SQL at a given threshold — the
    threshold is a real parameter (not a post-hoc string replace, which
    would silently no-op if the literal drifted)."""
    return f"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents
),
sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(w) >= 3
      THEN [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
      ELSE [array_to_string(w, ' ')] END) AS shingles
  FROM words
),
ex AS (SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS s FROM sh),
ok AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= {MAX_POSTING}),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN ok ON ok.s = a.s
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, CAST(i AS DOUBLE) / (sz_a + sz_b - i) AS jaccard
FROM inter WHERE CAST(i AS DOUBLE) / (sz_a + sz_b - i) >= {threshold}
"""


_SQL_NGRAM_JACCARD = _sql_ngram_jaccard(0.6)


def q_dedup_apply(spark, sf_dir):
    """End-to-end near-dup removal: drop every doc whose n-gram Jaccard
    (≥0.6) matched a lower doc_id (dedup.dedup_near_keep_min); emit the
    surviving corpus stats."""
    from timeseriesutils_spark.operators.dedup import dedup_near_keep_min

    docs = _docs(spark, sf_dir)
    # persist: identical pair plans across the dedup query family hit
    # Spark's CacheManager, so the shingle/join pipeline runs once
    pairs = pin(ngram_jaccard_pairs(
        docs, n=3, threshold=0.6, max_posting=MAX_POSTING
    ))
    kept = dedup_near_keep_min(pairs, docs)
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


_SQL_DEDUP_APPLY = f"""
WITH pairs AS ({_SQL_NGRAM_JACCARD})
SELECT COUNT(*) AS n_kept, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.id_b = d.doc_id)
"""


def q_unigram_logprob(spark, sf_dir):
    """LM-perplexity proxy (operators/text.unigram_logprob): per-doc mean
    unigram NLL under the corpus's own unigram model, int64-quantized
    summation for cross-engine exactness."""
    from timeseriesutils_spark.operators.text import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir))


def q_media_features(spark, sf_dir):
    """Arrow-batched media feature extraction over mapInPandas
    (operators/multimodal.extract_media_features): binary payload ->
    (dims, 8-bin byte histogram) via the deterministic stub decoder.
    The fake kernel is arithmetic on bytes, so the DuckDB oracle can
    verify the WHOLE distributed plumbing end-to-end."""
    from timeseriesutils_spark.operators.multimodal import (
        attach_binary,
        extract_media_features,
    )

    feats = extract_media_features(attach_binary(_docs(spark, sf_dir)))
    return feats.select(
        "doc_id", "media_type", "n_bytes", "checksum", "width", "height",
        *[F.element_at("feature", i + 1).alias(f"f{i}") for i in range(8)],
    )


_SQL_MEDIA_FEATURES = """
WITH b AS (
  SELECT doc_id, 'text/plain' AS media_type,
    CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS checksum,
    CAST(16 + strlen(text) % 64 AS INT) AS width,
    CAST(16 + (strlen(text) // 64) % 64 AS INT) AS height,
    [ascii(text[i]) % 8 FOR i IN range(1, len(text) + 1)] AS codes,
    CAST(CASE WHEN strlen(text) = 0 THEN 1 ELSE strlen(text) END AS DOUBLE) AS tot
  FROM documents
)
SELECT doc_id, media_type, n_bytes, checksum, width, height,
  len(list_filter(codes, c -> c = 0)) / tot AS f0,
  len(list_filter(codes, c -> c = 1)) / tot AS f1,
  len(list_filter(codes, c -> c = 2)) / tot AS f2,
  len(list_filter(codes, c -> c = 3)) / tot AS f3,
  len(list_filter(codes, c -> c = 4)) / tot AS f4,
  len(list_filter(codes, c -> c = 5)) / tot AS f5,
  len(list_filter(codes, c -> c = 6)) / tot AS f6,
  len(list_filter(codes, c -> c = 7)) / tot AS f7
FROM b
"""


def q_heavy_hitters(spark, sf_dir):
    """Exact corpus heavy hitters (operators/sketches.heavy_hitters):
    words covering >= 1% of all word occurrences, via per-partition
    Misra-Gries candidates + broadcast exact recount -- bounded-memory
    two-pass, same rows as the full GROUP BY."""
    from timeseriesutils_spark.operators.sketches import heavy_hitters
    from timeseriesutils_spark.operators.text import words

    docs = _docs(spark, sf_dir)
    toks = docs.select(F.explode(words(F.col("text"))).alias("word"))
    return heavy_hitters(toks, "word", min_frac=0.01)


def _sql_unigram_logprob():
    from timeseriesutils_spark.operators.text import unigram_logprob_sql

    return unigram_logprob_sql()


def _sql_heavy_hitters():
    from timeseriesutils_spark.operators.sketches import heavy_hitters_sql

    src = (
        "SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word "
        "FROM documents"
    )
    return heavy_hitters_sql(src, "word", min_frac=0.01)


def q_top_ngrams(spark, sf_dir):
    """Corpus-level word-bigram frequencies, top 20 (total order tie-break
    on the bigram text)."""
    docs = _docs(spark, sf_dir)
    w = docs.select(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("_w")
    )
    bigrams = w.select(
        F.explode(
            F.when(
                F.size("_w") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("_w") - 2),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i + 1, 2)),
                ),
            ).otherwise(F.array())
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


_SQL_TOP_NGRAMS = """
WITH words AS (
  SELECT string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents
),
bg AS (
  SELECT unnest(CASE WHEN len(w) >= 2
    THEN [array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))]
    ELSE [] END) AS bigram
  FROM words
)
SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
ORDER BY n DESC, bigram LIMIT 20
"""


def q_dedup_components(spark, sf_dir):
    """Transitive near-dup clusters: min-label connected components over
    the n-gram Jaccard pair graph; one row per cluster with its size."""
    from timeseriesutils_spark.operators.dedup import connected_components

    pairs = pin(ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.6, max_posting=MAX_POSTING
    ))
    comp = connected_components(pairs)
    return comp.groupBy("comp").agg(F.count(F.lit(1)).alias("n_members"))


_SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE pairs AS ({_SQL_NGRAM_JACCARD}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
SELECT comp, COUNT(*) AS n_members FROM comp GROUP BY comp
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup pairs in the portable hash mode (md5 shingle
    hash + seeded affine permutations over GF(2^31−1) + md5 band
    buckets): every hash is engine-reproducible, so the DuckDB twin
    (dedup.minhash_lsh_pairs_sql) regenerates the exact candidate set
    and the query is hash-verified end-to-end — banding included, not
    just the Jaccard arithmetic."""
    return minhash_lsh_pairs(
        _docs(spark, sf_dir), n=3, num_hashes=32, bands=8, threshold=0.6,
        hash_mode="md5",
    )


def q_simhash(spark, sf_dir):
    """64-bit SimHash fingerprints, portable mode: md5-derived bit votes
    emitted as two 32-bit halves, reproduced exactly by the DuckDB twin
    (dedup.simhash_docs_portable_sql) → hash-green.  The xxhash64
    Arrow-UDF form (dedup.simhash_docs) remains the fast default."""
    from timeseriesutils_spark.operators.dedup import simhash_docs_portable

    return simhash_docs_portable(_docs(spark, sf_dir), n=2)


def _vocab_sql() -> str:
    from timeseriesutils_spark.operators.text import build_vocab_sql

    return build_vocab_sql(top_k=500)


def _bpe_sql() -> str:
    from timeseriesutils_spark.operators.text import bpe_pair_counts_sql

    return bpe_pair_counts_sql(top_k=200)


def _knn_ivf_portable_sql() -> str:
    from timeseriesutils_spark.operators.similarity import knn_ivf_portable_sql

    return knn_ivf_portable_sql(k=5, n_centroids=16, nprobe=4)


def q_pca_power(spark, sf_dir):
    """Top-principal-component projection via exact-integer power
    iteration (pca.pca_power_project): sufficient statistics, iteration,
    normalization, and projection all cross-engine deterministic, so PCA
    *training* is hash-verified — the eigh tier (pca_project) stays the
    general-k path with rows-only checks."""
    from timeseriesutils_spark.operators.pca import pca_power_project

    return pca_power_project(_emb(spark, sf_dir))


def _pca_power_sql() -> str:
    from timeseriesutils_spark.operators.pca import pca_power_project_sql

    return pca_power_project_sql()


def _simhash_portable_sql() -> str:
    from timeseriesutils_spark.operators.dedup import simhash_docs_portable_sql

    return simhash_docs_portable_sql(n=2)


def q_pca_project(spark, sf_dir):
    """Top-2 principal projection via exact-integer power iteration +
    integer Hotelling deflation (operators/pca.pca_power2_project) —
    the k=2 PCA made hash-verifiable: one exact distributed Gram pass,
    a fixed unrolled iteration schedule on the driver, JVM-side
    projection; the DuckDB twin renders the identical chain.  The
    general-k driver-eigh pca_project stays the production path
    (agreement to iteration convergence pinned in tests)."""
    from timeseriesutils_spark.operators.pca import pca_power2_project

    return pca_power2_project(_emb(spark, sf_dir))


def _sql_pca_project():
    from timeseriesutils_spark.operators.pca import pca_power2_project_sql

    return pca_power2_project_sql()


def q_quantize_embeddings(spark, sf_dir):
    """Symmetric int8 quantization audit (similarity.quantize_embeddings):
    per-vector scale + exact integer checksums of the quantized vector —
    the storage-prep step for a serving ANN index."""
    from timeseriesutils_spark.operators.similarity import quantize_embeddings

    return quantize_embeddings(_emb(spark, sf_dir))


def q_dedup_embedding(spark, sf_dir):
    """Semantic near-dup pairs: embedding cosine ≥ 0.45, exact all-pairs
    (blocked outer product) — the verify/small-corpus tier, oracle-checked
    bit-exact.  The declared 100 TB path is dedup_embedding_lsh below."""
    return embedding_near_dup_pairs(_emb(spark, sf_dir), threshold=0.45, method="exact")


def q_dedup_embedding_lsh(spark, sf_dir):
    """Semantic near-dup pairs via multi-table sign-LSH — the scale path:
    candidates from bucket collisions (T tables × bits hyperplanes), exact
    quantized-cosine filter on candidates only.  Hash-green: the seeded
    planes are literals and bucket bits come from quantized-int64 dot
    signs, so the DuckDB twin (similarity.embedding_lsh_pairs_sql)
    reproduces the exact candidate set and scores; recall vs the exact
    tier is additionally pinned in tests/test_llm_ops.py.  bits/tables tune to the threshold: at this
    moderate cosine (0.45, θ≈63°) the per-bit collision prob is ~0.65,
    so short codes + more tables (4 bits × 8 tables → recall ≈ 0.79
    expected, 14/14 measured at sf0.01) — a 0.9-threshold dedup would
    invert that (more bits, fewer tables) for a smaller candidate set."""
    return embedding_near_dup_pairs(
        _emb(spark, sf_dir), threshold=0.45, method="lsh", bits=4, tables=8
    )


# quantized int64 dot products (see operators/similarity._QUANT): every
# term is floor(x·y·1e14 + 0.5) — deterministic IEEE ops both engines
# compute identically; the int sum is order-independent.
_SQL_DEDUP_EMBEDDING = """
WITH n AS (
  SELECT vec_id, embedding,
    SQRT(CAST(SUM(CAST(FLOOR(CAST(embedding[t.i] AS DOUBLE) * CAST(embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT)) AS DOUBLE) / 1e14) AS nm
  FROM embeddings, range(1, 65) t(i)
  GROUP BY vec_id, embedding
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    CAST(SUM(CAST(FLOOR(CAST(a.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT)) AS DOUBLE) / 1e14 / (a.nm * b.nm) AS cos
  FROM n a JOIN n b ON a.vec_id < b.vec_id, range(1, 65) t(i)
  GROUP BY 1, 2, a.nm, b.nm
)
SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.45
"""


# --- similarity search ----------------------------------------------------


def q_knn_bruteforce(spark, sf_dir):
    """Exact top-5 cosine neighbors for 10 query vectors."""
    emb = _emb(spark, sf_dir)
    return knn_bruteforce(emb.filter(F.col("vec_id") < 10), emb, k=5)


def _sql_knn(k: int = 5) -> str:
    """Brute-force exact-cosine top-k oracle, parameterized on k so
    consumers (rrf_fusion's top-10 list) never do string surgery on
    the rendered text (ADVICE r10)."""
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.query_id, e.vec_id,
    CAST(SUM(CAST(FLOOR(CAST(q.qe[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT)) AS DOUBLE) / 1e14 AS dot,
    CAST(SUM(CAST(FLOOR(CAST(q.qe[t.i] AS DOUBLE) * CAST(q.qe[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT)) AS DOUBLE) / 1e14 AS qq,
    CAST(SUM(CAST(FLOOR(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT)) AS DOUBLE) / 1e14 AS cc
  FROM q, embeddings e, range(1, 65) t(i)
  WHERE e.vec_id <> q.query_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id, dot / (SQRT(qq) * SQRT(cc)) AS cos,
  CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot / (SQRT(qq) * SQRT(cc)) DESC, vec_id) AS INT) AS rn
FROM pairs QUALIFY rn <= {k}
"""


_SQL_KNN = _sql_knn(5)


def q_knn_lsh(spark, sf_dir):
    """Bucketed approximate KNN.  Hash-green despite the hashing: the
    hyperplanes are seeded literals and the bucket bit is the sign of a
    quantized-int64 dot (similarity.lsh_bucket), so Spark and the DuckDB
    twin (similarity.knn_lsh_sql) derive identical buckets, candidates,
    and rerank cosines."""
    emb = _emb(spark, sf_dir)
    return knn_lsh(emb.filter(F.col("vec_id") < 10), emb, k=5, bits=4, dim=64)


def q_knn_ivf(spark, sf_dir):
    """IVF approximate KNN, fully hash-checkable: the coarse quantizer is
    trained by quantized distributed Lloyd on an md5-ordered sample, so
    the DuckDB twin (similarity.knn_ivf_portable_sql) re-derives the
    identical centroids, inverted lists, probes, and rerank cosines —
    an exactly-verified approximate index, training included."""
    from timeseriesutils_spark.operators.similarity import knn_ivf_portable

    emb = _emb(spark, sf_dir)
    return knn_ivf_portable(
        emb.filter(F.col("vec_id") < 10), emb, k=5, n_centroids=16, nprobe=4
    )


# --- text analysis --------------------------------------------------------


def q_text_stats(spark, sf_dir):
    """Per-doc chars/words/tokens/distinct-ratio stats (operators/text.text_stats; BPE-style pre-token regex)."""
    return text_stats(_docs(spark, sf_dir))


_SQL_TEXT_STATS = f"""
SELECT doc_id,
  CAST(LENGTH(text) AS INT) AS n_chars_calc,
  CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INT) AS n_words,
  CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS INT) AS n_tokens,
  CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS DOUBLE)
    / len(string_split_regex(lower(trim(text)), '\\s+')) AS distinct_word_ratio,
  CAST(LENGTH(regexp_replace(lower(trim(text)), '\\s+', '', 'g')) AS DOUBLE)
    / len(string_split_regex(lower(trim(text)), '\\s+')) AS mean_word_len,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct
FROM documents
"""


def q_text_quality(spark, sf_dir):
    """Heuristic quality score in [0,1] from length/punctuation/stopword signals (operators/text.quality_score)."""
    return quality_score(_docs(spark, sf_dir))


_SQL_QUALITY = """
SELECT doc_id, (
    (CASE WHEN LENGTH(text) BETWEEN 100 AND 20000 THEN 1.0 ELSE 0.3 END)
  + (1.0 - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
           / GREATEST(LENGTH(text), 1))
  + (CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS DOUBLE)
     / GREATEST(len(string_split_regex(lower(trim(text)), '\\s+')), 1))
) / 3.0 AS quality
FROM documents
"""


def q_lang_id(spark, sf_dir):
    """N-gram-marker language identification (operators/text.lang_id) over the documents table."""
    return lang_id(_docs(spark, sf_dir))


def _sql_lang_id() -> str:
    # mirror the Spark fold: running (best, best_n), strictly-greater wins
    best, best_n = "'und'", "0"
    for lang, mk in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(mk) + r")\b"
        cnt = f"len(regexp_extract_all(lower(text), '{pat}'))"
        best = f"CASE WHEN {cnt} > {best_n} THEN '{lang}' ELSE {best} END"
        best_n = f"CASE WHEN {cnt} > {best_n} THEN {cnt} ELSE {best_n} END"
    return f"SELECT doc_id, {best} AS pred_lang, CAST({best_n} AS INT) AS marker_hits FROM documents"


def q_fingerprint(spark, sf_dir):
    """Order-sensitive rolling-hash document fingerprint (operators/text.fingerprint)."""
    return fingerprint(_docs(spark, sf_dir))


_SQL_FINGERPRINT = """
SELECT doc_id, md5(array_to_string(string_split_regex(lower(trim(text)), '\\s+'), ' ')) AS fp
FROM documents
"""


def q_clean_text(spark, sf_dir):
    """Corpus normalization: URL/e-mail scrub + whitespace collapse."""
    return clean_text(_docs(spark, sf_dir))


_SQL_CLEAN_TEXT = f"""
WITH c AS (
  SELECT doc_id, CAST(LENGTH(text) AS INT) AS n_chars_raw,
    trim(regexp_replace(regexp_replace(regexp_replace(text,
      '{URL_PATTERN}', ' ', 'g'), '{EMAIL_PATTERN}', ' ', 'g'), '\\s+', ' ', 'g')) AS t
  FROM documents
)
SELECT doc_id, n_chars_raw, CAST(LENGTH(t) AS INT) AS n_chars_clean, md5(t) AS clean_md5
FROM c
"""


def q_repetition_stats(spark, sf_dir):
    """Gopher-style duplicate-n-gram fraction per document."""
    return repetition_stats(_docs(spark, sf_dir), n=3)


_SQL_REPETITION = """
WITH w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents
),
g AS (
  SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
    CASE WHEN len(ws) >= 3
      THEN [array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws) - 1)]
      ELSE [array_to_string(ws, ' ')] END AS grams
  FROM w
)
SELECT doc_id, n_words, CAST(len(grams) AS INT) AS n_grams,
  CAST(len(list_distinct(grams)) AS INT) AS n_distinct_grams,
  1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / GREATEST(len(grams), 1) AS dup_gram_frac
FROM g
"""


def q_build_vocab(spark, sf_dir):
    """Tokenizer vocabulary (text.build_vocab): corpus-wide BPE-style
    pre-token frequencies, top-500 with rank — the tokenizer-trainer
    input table.  Pre-aggregates to the vocabulary before ranking."""
    from timeseriesutils_spark.operators.text import build_vocab

    return build_vocab(_docs(spark, sf_dir), top_k=500)


def q_bpe_pair_counts(spark, sf_dir):
    """BPE merge-candidate scoring (text.bpe_pair_counts): adjacent
    character pairs weighted by distinct-word frequency — the BPE
    training inner loop over the vocabulary-sized word table, not raw
    corpus tokens."""
    from timeseriesutils_spark.operators.text import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir), top_k=200)


def q_tf_idf(spark, sf_dir):
    """Exact TF-IDF over the corpus vocabulary (operators/text.tf_idf): two map-combinable shuffles, lazy corpus count."""
    return tf_idf(_docs(spark, sf_dir), min_df=2)


_SQL_TF_IDF = """
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
ex AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word FROM documents),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM ex GROUP BY 1, 2),
df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1 HAVING COUNT(*) >= 2)
SELECT tf.doc_id, tf.word, tf.tf, df.df,
  FLOOR(tf.tf * (LN((SELECT CAST(n_docs + 1 AS DOUBLE) FROM n) / (df.df + 1)) + 1.0) * 1e6 + 0.5) / 1e6 AS tfidf
FROM tf JOIN df USING (word)
"""


def q_seq_pack(spark, sf_dir):
    """Sequence packing (concat-then-chunk pretraining prep): shard-local
    running token sums assign each doc a (shard, seq, offset); this query
    emits the per-sequence QA summary (operators/packing.py)."""
    from timeseriesutils_spark.operators.packing import pack_stats

    return pack_stats(_docs(spark, sf_dir), budget=512, n_shards=16)


_SQL_SEQ_PACK = f"""
WITH t AS (
  SELECT doc_id, doc_id % 16 AS shard,
    CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS INT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS strt
  FROM t
)
SELECT shard, CAST(FLOOR(CAST(strt AS DOUBLE) / 512) AS BIGINT) AS seq_id,
  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  MIN(doc_id) AS first_doc
FROM c GROUP BY 1, 2
"""


def _sql_quantize():
    from timeseriesutils_spark.operators.similarity import quantize_embeddings_sql

    return quantize_embeddings_sql()


def q_decontaminate_pairs(spark, sf_dir):
    """Benchmark decontamination: treat even doc_ids as the training
    corpus and odd doc_ids as the held-out eval set; emit every train/eval
    pair with 3-gram Jaccard ≥ 0.5 (operators/dedup.ngram_jaccard_against
    — candidates only from the cross-corpus shingle join, never within
    one corpus)."""
    from timeseriesutils_spark.operators.dedup import (
        hashed_shingle_docs,
        ngram_jaccard_against,
    )

    # shingle the shared table ONCE (persisted fork), then split even/odd:
    # the regex shingle pipeline is the dominant per-row cost and must not
    # run per side when both corpora come from one scan
    sh = pin(hashed_shingle_docs(_docs(spark, sf_dir), "doc_id", "text", 3))
    train = sh.filter(F.col("id") % 2 == 0)
    ev = sh.filter(F.col("id") % 2 == 1)
    return ngram_jaccard_against(
        train, ev, n=3, threshold=0.5, max_posting=MAX_POSTING, pre_shingled=True
    )


_SQL_DECONTAMINATE = f"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents
),
sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(w) >= 3
      THEN [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
      ELSE [array_to_string(w, ' ')] END) AS shingles
  FROM words
),
ea0 AS (SELECT doc_id AS id_a, len(shingles) AS sz_a, unnest(shingles) AS s
        FROM sh WHERE doc_id % 2 = 0),
ea AS (SELECT * FROM ea0 WHERE s NOT IN
       (SELECT s FROM ea0 GROUP BY s HAVING COUNT(*) > {MAX_POSTING})),
eb AS (SELECT doc_id AS id_b, len(shingles) AS sz_b, unnest(shingles) AS s
       FROM sh WHERE doc_id % 2 = 1),
inter AS (
  SELECT id_a, id_b, sz_a, sz_b, COUNT(*) AS i
  FROM ea JOIN eb USING (s) GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, CAST(i AS DOUBLE) / (sz_a + sz_b - i) AS jaccard
FROM inter WHERE CAST(i AS DOUBLE) / (sz_a + sz_b - i) >= 0.5
"""


# --- multimodal -----------------------------------------------------------


def q_multimodal_meta(spark, sf_dir):
    """Binary-column pipeline: pack bytes+metadata, extract features via
    Arrow mapInPandas (stub decoder).  Oracle checks the deterministic
    metadata (byte length, md5 checksum); width/height/feature are
    stub-derived (n_bytes arithmetic) so they're oracle-checkable too."""
    media = attach_binary(_docs(spark, sf_dir))
    feats = extract_media_features(media)
    return feats.select("doc_id", "media_type", "n_bytes", "checksum", "width", "height")


_SQL_MULTIMODAL = """
SELECT doc_id, 'text/plain' AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS checksum,
  CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
  CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INT) AS height
FROM documents
"""


def q_frame_sample(spark, sf_dir):
    """Fixed-size frame sampling over the document payload (the video
    frame-sample plan shape, relationally expressed)."""
    return sample_frames(_docs(spark, sf_dir), frame_size=256, every=4)


_SQL_FRAME_SAMPLE = """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
e AS (SELECT doc_id, text, unnest(range(0, (n - 1) // 256 + 1)) AS frame_idx FROM d),
f AS (
  SELECT doc_id, frame_idx,
    substring(text, CAST(frame_idx * 256 + 1 AS INT), 256) AS frame
  FROM e WHERE frame_idx % 4 = 0
)
SELECT doc_id, frame_idx, CAST(length(frame) AS INT) AS frame_chars,
  md5(frame) AS frame_md5
FROM f
"""


def q_hash_split(spark, sf_dir):
    """Deterministic md5-bucket train/val/test assignment + per-split
    stats (operators/splits.py) — membership is a pure function of
    doc_id, stable across runs/engines/partitionings."""
    from timeseriesutils_spark.operators.splits import hash_split

    assigned = hash_split(_docs(spark, sf_dir), "doc_id")
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


_SQL_HASH_SPLIT = """
WITH a AS (
  SELECT doc_id,
    CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
  COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM a GROUP BY 1
"""


def q_pii_scrub(spark, sf_dir):
    """PII redaction pass (operators/text.pii_scrub): typed placeholder
    substitution + per-type counts, shared-regex-subset patterns."""
    return pii_scrub(_docs(spark, sf_dir))


def q_corpus_stats(spark, sf_dir):
    """Per-(lang, source) corpus accounting — exact integer totals."""
    return corpus_stats(_docs(spark, sf_dir))


_SQL_CORPUS_STATS = """
WITH b AS (
  SELECT lang, source, CAST(LENGTH(text) AS BIGINT) AS nc,
    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS nw
  FROM documents
)
SELECT lang, source, COUNT(*) AS n_docs,
  -- CAST: DuckDB SUM(BIGINT) is HUGEINT → float64 in pandas, which
  -- breaks the driver's int-vs-float value hash against Spark's BIGINT
  CAST(SUM(nc) AS BIGINT) AS total_chars,
  CAST(SUM(nw) AS BIGINT) AS total_words,
  CAST(SUM(nc) AS DOUBLE) / COUNT(*) AS mean_chars,
  CAST(SUM(nw) AS DOUBLE) / COUNT(*) AS mean_words
FROM b GROUP BY 1, 2
"""


def q_length_histogram(spark, sf_dir):
    """Doc-length histogram per language (operators/text.length_histogram)."""
    return length_histogram(_docs(spark, sf_dir), by="lang", bucket_width=200)


_SQL_LENGTH_HISTOGRAM = """
SELECT lang AS stratum,
  CAST(FLOOR(LENGTH(text) / 200.0) AS BIGINT) * 200 AS bucket_lo,
  COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


_MIX_RATES = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.1}


def q_reservoir_sample(spark, sf_dir):
    """Deterministic per-stratum k-sample (operators/splits.
    reservoir_sample): 5 docs per language by md5 rank -- the re-runnable
    reservoir."""
    from timeseriesutils_spark.operators.splits import reservoir_sample

    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    return reservoir_sample(docs, "doc_id", "lang", k=5)


def _sql_reservoir_sample():
    from timeseriesutils_spark.operators.splits import reservoir_sample_sql

    return reservoir_sample_sql(
        "(SELECT doc_id, lang FROM documents)", "doc_id", "lang", 5,
        select="doc_id, lang",
    )


MIX_WEIGHTS = {"src0": 2.5, "src1": 0.3, "src2": 0.0}


def q_mixture_resample(spark, sf_dir):
    """Weighted epoch expansion (operators/splits.mixture_resample):
    2.5 epochs of src0, 0.3 of src1, src2 dropped, everything else 1 —
    the upsampling half of data-mixture assembly."""
    from timeseriesutils_spark.operators.splits import mixture_resample

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    return mixture_resample(docs, "doc_id", "source", MIX_WEIGHTS)


def _sql_mixture_resample():
    from timeseriesutils_spark.operators.splits import mixture_resample_sql

    return mixture_resample_sql(
        "(SELECT doc_id, source FROM documents)", "doc_id", "source", MIX_WEIGHTS
    )


def q_stratified_sample(spark, sf_dir):
    """Deterministic data-mixture sampling (operators/splits.
    stratified_sample): per-language keep rates over md5 buckets;
    summarized per stratum so the output is small and stable."""
    from timeseriesutils_spark.operators.splits import stratified_sample

    kept = stratified_sample(
        _docs(spark, sf_dir), "doc_id", "lang", _MIX_RATES, default_rate=0.05
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def _sql_stratified_sample():
    from timeseriesutils_spark.operators.splits import stratified_sample_sql_pred

    pred = stratified_sample_sql_pred("doc_id", "lang", _MIX_RATES, default_rate=0.05)
    return (
        "SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id\n"
        f"FROM documents WHERE {pred} GROUP BY 1"
    )


CHUNK_PARAMS = dict(size=600, stride=450)


def q_chunk_text(spark, sf_dir):
    """Overlapping fixed-size character chunking of the corpus
    (operators/text.chunk_text): the RAG-indexing / context-packing
    step; emits per-chunk md5 keys, one explode pass, no shuffle."""
    return chunk_text(_docs(spark, sf_dir), **CHUNK_PARAMS)


QUERIES = {
    "chunk_text": Q(q_chunk_text, chunk_text_sql(**CHUNK_PARAMS)),
    "dedup_exact": Q(q_dedup_exact, _SQL_DEDUP_EXACT),
    "hash_split": Q(q_hash_split, _SQL_HASH_SPLIT),
    "frame_sample": Q(q_frame_sample, _SQL_FRAME_SAMPLE),
    "dedup_ngram_jaccard": Q(q_dedup_ngram_jaccard, _SQL_NGRAM_JACCARD),
    "dedup_apply": Q(q_dedup_apply, _SQL_DEDUP_APPLY),
    "dedup_components": Q(q_dedup_components, _SQL_DEDUP_COMPONENTS),
    "top_ngrams": Q(q_top_ngrams, _SQL_TOP_NGRAMS),
    "heavy_hitters": Q(q_heavy_hitters, _sql_heavy_hitters()),
    "media_features": Q(q_media_features, _SQL_MEDIA_FEATURES),
    "unigram_logprob": Q(q_unigram_logprob, _sql_unigram_logprob()),
    "dedup_minhash_lsh": Q(
        q_dedup_minhash_lsh,
        minhash_lsh_pairs_sql(n=3, num_hashes=32, bands=8, threshold=0.6),
    ),
    "dedup_embedding": Q(q_dedup_embedding, _SQL_DEDUP_EMBEDDING),
    "dedup_embedding_lsh": Q(
        q_dedup_embedding_lsh,
        embedding_lsh_pairs_sql(threshold=0.45, bits=4, tables=8),
    ),
    "simhash": Q(q_simhash, _simhash_portable_sql()),
    "knn_bruteforce": Q(q_knn_bruteforce, _SQL_KNN),
    "knn_lsh": Q(q_knn_lsh, knn_lsh_sql(k=5, bits=4, dim=64)),
    "knn_ivf": Q(q_knn_ivf, _knn_ivf_portable_sql()),
    "text_stats": Q(q_text_stats, _SQL_TEXT_STATS),
    "text_quality": Q(q_text_quality, _SQL_QUALITY),
    "lang_id": Q(q_lang_id, _sql_lang_id()),
    "doc_fingerprint": Q(q_fingerprint, _SQL_FINGERPRINT),
    "tf_idf": Q(q_tf_idf, _SQL_TF_IDF),
    "build_vocab": Q(q_build_vocab, _vocab_sql()),
    "bpe_pair_counts": Q(q_bpe_pair_counts, _bpe_sql()),
    "clean_text": Q(q_clean_text, _SQL_CLEAN_TEXT),
    "repetition_stats": Q(q_repetition_stats, _SQL_REPETITION),
    "multimodal_meta": Q(q_multimodal_meta, _SQL_MULTIMODAL),
    "seq_pack": Q(q_seq_pack, _SQL_SEQ_PACK),
    "decontaminate_pairs": Q(q_decontaminate_pairs, _SQL_DECONTAMINATE),
    "quantize_embeddings": Q(q_quantize_embeddings, _sql_quantize()),
    "pca_project": Q(q_pca_project, _sql_pca_project()),
    "pca_power": Q(q_pca_power, _pca_power_sql()),
    "pii_scrub": Q(q_pii_scrub, pii_scrub_sql()),
    "corpus_stats": Q(q_corpus_stats, _SQL_CORPUS_STATS),
    "length_histogram": Q(q_length_histogram, _SQL_LENGTH_HISTOGRAM),
    "stratified_sample": Q(q_stratified_sample, _sql_stratified_sample()),
    "mixture_resample": Q(q_mixture_resample, _sql_mixture_resample()),
    "reservoir_sample": Q(q_reservoir_sample, _sql_reservoir_sample()),
}


def q_embedding_centroids(spark, sf_dir):
    """Per-label vector mean in long format
    (operators/similarity.grouped_centroids) — the class-centroid /
    k-means-update primitive with exact decimal component sums."""
    from timeseriesutils_spark.operators.similarity import grouped_centroids

    return grouped_centroids(_emb(spark, sf_dir))


def q_fuzzy_match(spark, sf_dir):
    """Blocked fuzzy record linkage over customer names
    (operators/dedup.fuzzy_pairs): Levenshtein ≤ 1 within
    (length, stem) blocks — entity resolution without a cross join."""
    from timeseriesutils_spark.operators.dedup import fuzzy_pairs

    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=1, block_suffix_len=2)


def _sql_embedding_centroids():
    from timeseriesutils_spark.operators.similarity import grouped_centroids_sql

    return grouped_centroids_sql()


def _sql_fuzzy_match():
    from timeseriesutils_spark.operators.dedup import fuzzy_pairs_sql

    return fuzzy_pairs_sql("customer", "c_custkey", "c_name", max_dist=1, block_suffix_len=2)


QUERIES.update(
    {
        "embedding_centroids": Q(q_embedding_centroids, _sql_embedding_centroids()),
        "fuzzy_match": Q(q_fuzzy_match, _sql_fuzzy_match()),
    }
)


def q_chunk_dedup(spark, sf_dir):
    """Cross-document paragraph dedup: non-overlapping 200-char chunks
    (operators/text.chunk_text, stride=size) fingerprinted by md5,
    grouped to the chunks appearing in ≥2 documents — the
    shared-boilerplate report at paragraph granularity."""
    ch = chunk_text(_docs(spark, sf_dir), size=200, stride=200)
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def _sql_chunk_dedup():
    inner = chunk_text_sql(size=200, stride=200)
    return f"""
WITH chunks AS ({inner})
SELECT chunk_md5, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM chunks GROUP BY chunk_md5 HAVING COUNT(DISTINCT doc_id) >= 2
"""


QUERIES.update({"chunk_dedup": Q(q_chunk_dedup, _sql_chunk_dedup())})


QF_MIN_QUALITY, QF_MAX_DUP = 0.75, 0.2


def q_quality_filter(spark, sf_dir):
    """C4-style filtering funnel: compose the quality score and the
    Gopher repetition signal into a per-document keep/drop decision
    (keep = quality ≥ 0.75 AND dup 3-gram fraction ≤ 0.2).  Thresholds
    compare bit-identical deterministic doubles, so the decision itself
    is cross-engine exact.  Both signals are per-row projections; the
    doc_id join is co-partitioned at scale (no wide shuffle)."""
    docs = _docs(spark, sf_dir)
    q = quality_score(docs)
    r = repetition_stats(docs).select("doc_id", "dup_gram_frac")
    keep = (
        (F.col("quality") >= QF_MIN_QUALITY) & (F.col("dup_gram_frac") <= QF_MAX_DUP)
    ).cast("int")
    return (
        q.join(r, "doc_id")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "quality", "dup_gram_frac", keep.alias("keep"))
    )


_SQL_QUALITY_FILTER = f"""
WITH q AS ({_SQL_QUALITY}),
r AS ({_SQL_REPETITION})
SELECT q.doc_id, d.lang, q.quality, r.dup_gram_frac,
  CAST(q.quality >= {QF_MIN_QUALITY} AND r.dup_gram_frac <= {QF_MAX_DUP} AS INT) AS keep
FROM q JOIN r ON q.doc_id = r.doc_id JOIN documents d ON q.doc_id = d.doc_id
"""

QUERIES.update({"quality_filter": Q(q_quality_filter, _SQL_QUALITY_FILTER)})


KMEANS_PARAMS = dict(k=8, n_iter=3, scale=6)


def q_kmeans(spark, sf_dir):
    """Distributed Lloyd k-means over the embeddings corpus
    (operators/kmeans.kmeans_lloyd): fixed 3-iteration schedule,
    int64-quantized exact distances, lowest-id init — the iterative-ML
    op gate-checked against an unrolled-CTE SQL twin (most engines call
    this category "not oracle-able"; exact arithmetic makes it so)."""
    from timeseriesutils_spark.operators.kmeans import kmeans_lloyd

    return kmeans_lloyd(_emb(spark, sf_dir), **KMEANS_PARAMS)


def _sql_kmeans():
    from timeseriesutils_spark.operators.kmeans import kmeans_lloyd_sql

    return kmeans_lloyd_sql(**KMEANS_PARAMS)


SHARD_PARAMS = dict(n_shards=16, seed="s0")


def q_shard_assign(spark, sf_dir):
    """Deterministic global shuffle + shard assignment
    (operators/splits.shard_assign): the training-data writer layout —
    md5-seeded permutation, per-shard positions, reproducible across
    engines and repartitionings.  Narrow projection (no text)."""
    from timeseriesutils_spark.operators.splits import shard_assign

    return shard_assign(_docs(spark, sf_dir), "doc_id", **SHARD_PARAMS).select(
        "doc_id", "lang", "shard", "shard_pos"
    )


def _sql_shard_assign():
    from timeseriesutils_spark.operators.splits import shard_assign_sql

    inner = shard_assign_sql("documents", "doc_id", **SHARD_PARAMS)
    return f"SELECT doc_id, lang, shard, shard_pos FROM ({inner})"


QUERIES.update(
    {
        "kmeans": Q(q_kmeans, _sql_kmeans()),
        "shard_assign": Q(q_shard_assign, _sql_shard_assign()),
    }
)


SEMDEDUP_PARAMS = dict(k=8, n_iter=3, threshold=0.45, kmeans_scale=6)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (operators/similarity.semantic_dedup_pairs): k-means
    blocks bound the candidate pairs, quantized-exact cosine scores —
    the full iterative pipeline hash-checked against one SQL twin."""
    from timeseriesutils_spark.operators.similarity import semantic_dedup_pairs

    return semantic_dedup_pairs(_emb(spark, sf_dir), **SEMDEDUP_PARAMS)


def _sql_semantic_dedup():
    from timeseriesutils_spark.operators.kmeans import kmeans_lloyd_sql

    km = kmeans_lloyd_sql(
        k=SEMDEDUP_PARAMS["k"],
        n_iter=SEMDEDUP_PARAMS["n_iter"],
        scale=SEMDEDUP_PARAMS["kmeans_scale"],
    )
    thr = SEMDEDUP_PARAMS["threshold"]
    return f"""
WITH assign AS (SELECT vec_id, cluster FROM ({km}) t),
n AS (
  SELECT e.vec_id, e.embedding, a.cluster,
    SQRT(CAST(SUM(CAST(FLOOR(CAST(e.embedding[t.i] AS DOUBLE)
      * CAST(e.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT)) AS DOUBLE) / 1e14) AS nm
  FROM embeddings e JOIN assign a USING (vec_id), range(1, 65) t(i)
  GROUP BY e.vec_id, e.embedding, a.cluster
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
    CAST(SUM(CAST(FLOOR(CAST(a.embedding[t.i] AS DOUBLE)
      * CAST(b.embedding[t.i] AS DOUBLE) * 1e14 + 0.5) AS BIGINT)) AS DOUBLE)
      / 1e14 / (a.nm * b.nm) AS cos
  FROM n a JOIN n b ON a.cluster = b.cluster AND a.vec_id < b.vec_id,
       range(1, 65) t(i)
  GROUP BY 1, 2, 3, a.nm, b.nm
)
SELECT id_a, id_b, CAST(cluster AS INT) AS cluster, cos
FROM pairs WHERE cos >= {thr}
"""


QUERIES.update({"semantic_dedup": Q(q_semantic_dedup, _sql_semantic_dedup())})


def q_dup_spans(spark, sf_dir):
    """Exact duplicated-span detection (operators/dupspan.dup_spans):
    maximal word-offset spans whose every 8-word window also appears in
    >= 1 other document -- the substring-level complement of document
    dedup (cut the boilerplate, keep the unique remainder).  Posting
    counts on int64 window hashes + gaps-and-islands merge; no pairwise
    stage, so hot boilerplate costs one counter, not a pair explosion."""
    from timeseriesutils_spark.operators.dupspan import dup_spans

    return dup_spans(load_table(spark, sf_dir, "documents"))


def _sql_dup_spans():
    from timeseriesutils_spark.operators.dupspan import dup_spans_sql

    return dup_spans_sql()


QUERIES.update({"dup_spans": Q(q_dup_spans, _sql_dup_spans())})


def q_inverted_index(spark, sf_dir):
    """Capped inverted index (text.inverted_index): per word df /
    total_tf / top-10 "doc:tf" posting string, rank-filtered BEFORE
    list materialization so stopword postings stay bounded."""
    from timeseriesutils_spark.operators.text import inverted_index

    return inverted_index(load_table(spark, sf_dir, "documents"))


def _sql_inverted_index():
    from timeseriesutils_spark.operators.text import inverted_index_sql

    return inverted_index_sql("documents")


QUERIES.update({"inverted_index": Q(q_inverted_index, _sql_inverted_index())})


def q_pmi_cooccur(spark, sf_dir):
    """Collocation extraction (text.pmi_cooccur): top adjacent word
    pairs by quantized PMI — row-local bigram zip, two map-combinable
    count aggregates, broadcast totals."""
    from timeseriesutils_spark.operators.text import pmi_cooccur

    return pmi_cooccur(load_table(spark, sf_dir, "documents"))


def _sql_pmi_cooccur():
    from timeseriesutils_spark.operators.text import pmi_cooccur_sql

    return pmi_cooccur_sql("documents")


QUERIES.update({"pmi_cooccur": Q(q_pmi_cooccur, _sql_pmi_cooccur())})


INC_DEDUP_WM = 400  # doc_id >= WM is "the new ingest batch"


def q_incremental_dedup(spark, sf_dir):
    """Watermark-bounded near-dup detection
    (dedup.incremental_jaccard_pairs): pairs touching the new ingest
    batch (doc_id >= 400) only — untouched shingles never reach the pair
    explosion; bit-identical to the full recompute filtered to
    new-touching pairs."""
    from timeseriesutils_spark.operators.dedup import incremental_jaccard_pairs

    docs = _docs(spark, sf_dir).withColumn(
        "_new", (F.col("doc_id") >= INC_DEDUP_WM).cast("int")
    )
    return incremental_jaccard_pairs(
        docs, "_new", n=3, threshold=0.6, max_posting=MAX_POSTING
    )


_SQL_INCREMENTAL_DEDUP = f"""
WITH words AS (
  SELECT doc_id, (doc_id >= {INC_DEDUP_WM}) AS nw,
    string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents
),
sh AS (
  SELECT doc_id, nw,
    list_distinct(CASE WHEN len(w) >= 3
      THEN [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
      ELSE [array_to_string(w, ' ')] END) AS shingles
  FROM words
),
ex AS (SELECT doc_id, nw, len(shingles) AS sz, unnest(shingles) AS s FROM sh),
ok AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= {{mp}}),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id AND (a.nw OR b.nw)
  JOIN ok ON ok.s = a.s
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, CAST(i AS DOUBLE) / (sz_a + sz_b - i) AS jaccard
FROM inter WHERE CAST(i AS DOUBLE) / (sz_a + sz_b - i) >= 0.6
"""


QUERIES.update(
    {
        "incremental_dedup": Q(
            q_incremental_dedup,
            _SQL_INCREMENTAL_DEDUP.replace("{mp}", str(MAX_POSTING)),
        )
    }
)


def q_embedding_drift(spark, sf_dir):
    """Embedding-distribution drift monitor
    (operators/similarity.embedding_drift): per label, cosine drift and
    L2 shift between the centroids of the even- and odd-id halves of the
    corpus (the deterministic stand-in for old-vs-new snapshots) -- the
    embedding-space analogue of psi_drift, exact-decimal centroid sums
    and int64-quantized dot/norm reduction."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.similarity import embedding_drift

    emb = _emb(spark, sf_dir).withColumn(
        "split", F.when(F.col("vec_id") % 2 == 0, "a").otherwise("b")
    )
    return embedding_drift(emb, "split")


def _sql_embedding_drift():
    from timeseriesutils_spark.operators.similarity import embedding_drift_sql

    return embedding_drift_sql("CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END")


QUERIES.update({"embedding_drift": Q(q_embedding_drift, _sql_embedding_drift())})


def q_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency fit per language (operators/text.zipf_fit):
    OLS slope/r2 of ln(freq) on ln(rank) over the top-2000 vocabulary --
    the power-law corpus-quality diagnostic (natural text ~ slope -1);
    ln once then int64-quantized, DECIMAL-exact sufficient statistics."""
    from timeseriesutils_spark.operators.text import zipf_fit

    return zipf_fit(_docs(spark, sf_dir))


def _sql_zipf_fit():
    from timeseriesutils_spark.operators.text import zipf_fit_sql

    return zipf_fit_sql("documents")


QUERIES.update({"zipf_fit": Q(q_zipf_fit, _sql_zipf_fit())})


def q_canonical_pick(spark, sf_dir):
    """Quality-aware canonical selection for near-dup clusters: within
    each transitive n-gram-Jaccard component, keep the HIGHEST-quality
    copy (ties to lower id) instead of dedup_apply's keep-min-id -- the
    realistic LLM-corpus policy (keep the cleanest copy, not the first
    crawled).  Composition of three declared primitives: posting-list
    Jaccard pairs -> connected components -> quality_score argmax, one
    row per clustered doc with its cluster label, quality, and the
    cluster's canonical id."""
    from pyspark.sql import Window as W

    from timeseriesutils_spark.operators.dedup import connected_components
    from timeseriesutils_spark.operators.text import quality_score

    docs = _docs(spark, sf_dir)
    pairs = pin(ngram_jaccard_pairs(
        docs, n=3, threshold=0.6, max_posting=MAX_POSTING
    ))
    comp = connected_components(pairs)
    q = quality_score(docs)
    j = comp.join(q, comp["id"] == q["doc_id"]).select(
        "doc_id", "comp", "quality"
    )
    w = W.partitionBy("comp").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        j.withColumn("canonical_id", F.first("doc_id").over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
    )


_SQL_CANONICAL_PICK = f"""
WITH RECURSIVE pairs AS ({_SQL_NGRAM_JACCARD}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
q AS ({_SQL_QUALITY}),
j AS (
  SELECT q.doc_id, comp.comp, q.quality
  FROM comp JOIN q ON comp.id = q.doc_id
)
SELECT doc_id, comp, quality,
  first_value(doc_id) OVER (PARTITION BY comp ORDER BY quality DESC, doc_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS canonical_id,
  doc_id = first_value(doc_id) OVER (PARTITION BY comp
    ORDER BY quality DESC, doc_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS is_canonical
FROM j
"""


QUERIES.update({"canonical_pick": Q(q_canonical_pick, _SQL_CANONICAL_PICK)})


def q_novelty_scores(spark, sf_dir):
    """Per-doc n-gram novelty vs earlier crawl order
    (operators/dedup.novelty_scores): fraction of a doc's distinct
    3-grams first seen in that doc -- the incremental-curation signal;
    posting-list shuffle shape, int64 md5 shingle hashes only."""
    from timeseriesutils_spark.operators.dedup import novelty_scores

    return novelty_scores(_docs(spark, sf_dir))


def _sql_novelty_scores():
    from timeseriesutils_spark.operators.dedup import novelty_scores_sql

    return novelty_scores_sql("documents")


QUERIES.update({"novelty_scores": Q(q_novelty_scores, _sql_novelty_scores())})


def q_feature_hash(spark, sf_dir):
    """Hashing-trick bag-of-words features (operators/text.feature_hash):
    64 signed slots per doc from portable md5 hashes -- stateless
    fixed-width encoding with no vocabulary pass, the sparse long-format
    feed for linear probes / dedup sketches."""
    from timeseriesutils_spark.operators.text import feature_hash

    return feature_hash(_docs(spark, sf_dir))


def _sql_feature_hash():
    from timeseriesutils_spark.operators.text import feature_hash_sql

    return feature_hash_sql("documents")


QUERIES.update({"feature_hash": Q(q_feature_hash, _sql_feature_hash())})


def q_jsonl_pack(spark, sf_dir):
    """Training-data JSONL export lines (operators/text.jsonl_pack):
    byte-identical hand-built JSON (engines disagree on to_json
    spacing/key order), minimal escaper, per-line md5 -- the final
    packaging step before the dataloader."""
    from timeseriesutils_spark.operators.text import jsonl_pack

    return jsonl_pack(_docs(spark, sf_dir))


def _sql_jsonl_pack():
    from timeseriesutils_spark.operators.text import jsonl_pack_sql

    return jsonl_pack_sql("documents")


QUERIES.update({"jsonl_pack": Q(q_jsonl_pack, _sql_jsonl_pack())})


def q_dup_rate_by_source(spark, sf_dir):
    """Exact-duplicate rate per source (text.fingerprint composition):
    canonical-form md5 per doc, then per source: docs, distinct
    fingerprints, dup_rate = 1 - distinct/docs, plus how many docs are
    non-first copies corpus-wide -- the per-feed duplication dashboard
    that decides which sources to throttle."""
    from pyspark.sql import Window as W

    from timeseriesutils_spark.operators.text import fingerprint

    docs = _docs(spark, sf_dir)
    fp = fingerprint(docs).join(docs.select("doc_id", "source"), "doc_id")
    w = W.partitionBy("fp").orderBy("doc_id")
    marked = fp.withColumn(
        "_is_copy", (F.row_number().over(w) > 1).cast("bigint")
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fp").alias("n_distinct"),
        (1.0 - F.count_distinct("fp").cast("double") / F.count(F.lit(1))).alias(
            "dup_rate"
        ),
        F.sum("_is_copy").alias("n_copies_global"),
    )


_SQL_DUP_RATE_BY_SOURCE = """
WITH fp AS (
  SELECT doc_id, source,
    md5(array_to_string(string_split_regex(lower(trim(text)), '\\s+'), ' ')) AS fp
  FROM documents
),
m AS (
  SELECT *, CASE WHEN row_number() OVER (PARTITION BY fp ORDER BY doc_id) > 1
                 THEN 1 ELSE 0 END AS _is_copy
  FROM fp
)
SELECT source, COUNT(*) AS n_docs,
  COUNT(DISTINCT fp) AS n_distinct,
  1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*) AS dup_rate,
  CAST(SUM(_is_copy) AS BIGINT) AS n_copies_global
FROM m GROUP BY source
"""


QUERIES.update(
    {"dup_rate_by_source": Q(q_dup_rate_by_source, _SQL_DUP_RATE_BY_SOURCE)}
)


def q_minhash_audit(spark, sf_dir):
    """MinHash estimator-quality audit (dedup.minhash_estimate_audit):
    signature-estimated vs exact Jaccard with signed error for every LSH
    candidate pair — the "can we trust signatures without the verify
    join?" QA query, portable-hash mode so the twin reproduces the exact
    candidate set and signatures."""
    from timeseriesutils_spark.operators.dedup import minhash_estimate_audit

    return minhash_estimate_audit(_docs(spark, sf_dir))


def _sql_minhash_audit():
    from timeseriesutils_spark.operators.dedup import minhash_estimate_audit_sql

    return minhash_estimate_audit_sql()


QUERIES.update({"minhash_estimate_audit": Q(q_minhash_audit, _sql_minhash_audit())})


_CURVE_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def q_dedup_threshold_curve(spark, sf_dir):
    """Dedup threshold-sensitivity curve: pair count and affected-doc
    count at each candidate Jaccard threshold, from ONE pass of the
    exact n-gram pair machinery (dedup.ngram_jaccard_pairs at the
    loosest threshold, then a literal-threshold explode) — the tuning
    table that decides where to set the near-dup cut before a corpus-
    scale run."""
    pairs = pin(ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=min(_CURVE_THRESHOLDS),
        max_posting=MAX_POSTING,
    ))
    t = F.explode(
        F.array(*[F.lit(float(x)) for x in _CURVE_THRESHOLDS])
    ).alias("threshold")
    at_t = pairs.select("id_a", "id_b", "jaccard", t).filter(
        F.col("jaccard") >= F.col("threshold")
    )
    docs_t = at_t.select(
        "threshold", F.col("id_a").alias("doc_id")
    ).unionByName(at_t.select("threshold", F.col("id_b").alias("doc_id")))
    n_pairs = at_t.groupBy("threshold").agg(F.count(F.lit(1)).alias("n_pairs"))
    n_docs = docs_t.groupBy("threshold").agg(
        F.count_distinct("doc_id").alias("n_docs_affected")
    )
    return n_pairs.join(n_docs, on="threshold")


def _sql_dedup_threshold_curve():
    ts = ", ".join(str(float(x)) for x in _CURVE_THRESHOLDS)
    base = _sql_ngram_jaccard(min(_CURVE_THRESHOLDS))
    return f"""
WITH pairs AS ({base}),
th AS (SELECT UNNEST([{ts}]) AS threshold),
at_t AS (
  SELECT th.threshold, p.id_a, p.id_b FROM pairs p
  JOIN th ON p.jaccard >= th.threshold
),
docs_t AS (
  SELECT threshold, id_a AS doc_id FROM at_t
  UNION ALL SELECT threshold, id_b FROM at_t
)
SELECT a.threshold, a.n_pairs, d.n_docs_affected
FROM (SELECT threshold, COUNT(*) AS n_pairs FROM at_t GROUP BY 1) a
JOIN (SELECT threshold, COUNT(DISTINCT doc_id) AS n_docs_affected
      FROM docs_t GROUP BY 1) d USING (threshold)
"""


QUERIES.update(
    {"dedup_threshold_curve": Q(q_dedup_threshold_curve, _sql_dedup_threshold_curve())}
)


def q_bigram_logprob(spark, sf_dir):
    """Per-doc mean bigram NLL with add-one smoothing
    (text.bigram_logprob) — the word-ORDER quality proxy one rung up
    from unigram_logprob; exact-int probabilities, ln-quantized per-term
    sums."""
    from timeseriesutils_spark.operators.text import bigram_logprob

    return bigram_logprob(_docs(spark, sf_dir))


def _sql_bigram_logprob():
    from timeseriesutils_spark.operators.text import bigram_logprob_sql

    return bigram_logprob_sql()


QUERIES.update({"bigram_logprob": Q(q_bigram_logprob, _sql_bigram_logprob())})


def q_dup_cluster_sizes(spark, sf_dir):
    """Near-dup cluster-SIZE distribution: how many clusters of 2, 3,
    4… near-identical docs the corpus holds (components over the Jaccard
    pair graph → size histogram + docs involved) — the one-glance corpus
    duplication shape that decides between pairwise dedup and cluster
    canonicalization."""
    from timeseriesutils_spark.operators.dedup import connected_components

    pairs = pin(ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.6, max_posting=MAX_POSTING
    ))
    comp = connected_components(pairs)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("size"))
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("size")).cast("bigint").alias("n_docs"),
    )


_SQL_DUP_CLUSTER_SIZES = f"""
WITH RECURSIVE pairs AS ({_SQL_NGRAM_JACCARD}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
sizes AS (SELECT comp, COUNT(*) AS size FROM comp GROUP BY comp)
SELECT size, COUNT(*) AS n_clusters,
  CAST(COUNT(*) * size AS BIGINT) AS n_docs
FROM sizes GROUP BY size
"""


QUERIES.update(
    {"dup_cluster_sizes": Q(q_dup_cluster_sizes, _SQL_DUP_CLUSTER_SIZES)}
)


_RECALL_KS = (1, 3, 5)


def q_knn_recall_curve(spark, sf_dir):
    """ANN quality audit: recall@k of the IVF index against the exact
    brute-force neighbors for k ∈ {1,3,5} — the embedding-side sibling
    of minhash_estimate_audit (is nprobe=4 enough, and at which k does
    the index degrade?).  Both sides are the already-hash-green
    operators, so the curve itself is exactly verified."""
    from timeseriesutils_spark.operators.similarity import knn_ivf_portable

    emb = _emb(spark, sf_dir)
    q10 = emb.filter(F.col("vec_id") < 10)
    # NOT pinned (round-14 measured rejection): exact has two consumers
    # (match join + n_queries scaffold), but pinning it materializes
    # the full windowed pair frame and defeats the WindowGroupLimit
    # top-k pushdown — 3.47 s unpinned vs 4.83 s pinned at sf0.1
    exact = knn_bruteforce(q10, emb, k=max(_RECALL_KS))
    approx = knn_ivf_portable(
        q10, emb, k=max(_RECALL_KS), n_centroids=16, nprobe=4
    )
    # both sides are top-k result frames (n_queries*k rows) but arrive
    # behind window filters that hide their size from the planner —
    # broadcast explicitly, else these 50-row joins run as SMJs
    m = exact.select(
        "query_id", "vec_id", F.col("rn").alias("_re")
    ).join(
        F.broadcast(
            approx.select("query_id", "vec_id", F.col("rn").alias("_ra"))
        ),
        on=["query_id", "vec_id"],
    )
    ks = F.explode(F.array(*[F.lit(k) for k in _RECALL_KS])).alias("k")
    hits = (
        m.select("_re", "_ra", ks)
        .filter((F.col("_re") <= F.col("k")) & (F.col("_ra") <= F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    scaffold = exact.agg(
        F.count_distinct("query_id").alias("n_queries")
    ).select("n_queries", ks)
    return scaffold.join(F.broadcast(hits), on="k", how="left").select(
        "k",
        "n_queries",
        F.coalesce("n_matches", F.lit(0)).cast("bigint").alias("n_matches"),
        (
            F.coalesce("n_matches", F.lit(0)).cast("double")
            / (F.col("k") * F.col("n_queries")).cast("double")
        ).alias("recall"),
    )


def _sql_knn_recall_curve():
    from timeseriesutils_spark.operators.similarity import knn_ivf_portable_sql

    ks = ", ".join(str(k) for k in _RECALL_KS)
    approx = knn_ivf_portable_sql(
        k=max(_RECALL_KS), n_centroids=16, nprobe=4
    )
    return f"""
WITH exact AS ({_SQL_KNN}),
approx AS ({approx}),
m AS (
  SELECT e.query_id, e.vec_id, e.rn AS _re, a.rn AS _ra
  FROM exact e JOIN approx a USING (query_id, vec_id)
),
kk AS (SELECT UNNEST([{ks}]) AS k),
hits AS (
  SELECT kk.k, COUNT(*) AS n_matches
  FROM m JOIN kk ON m._re <= kk.k AND m._ra <= kk.k
  GROUP BY kk.k
),
scaffold AS (
  SELECT kk.k, nq.n_queries
  FROM kk CROSS JOIN (SELECT COUNT(DISTINCT query_id) AS n_queries FROM exact) nq
)
SELECT s.k, s.n_queries,
  CAST(COALESCE(h.n_matches, 0) AS BIGINT) AS n_matches,
  CAST(COALESCE(h.n_matches, 0) AS DOUBLE)
    / CAST(s.k * s.n_queries AS DOUBLE) AS recall
FROM scaffold s LEFT JOIN hits h ON s.k = h.k
"""


QUERIES.update(
    {"knn_recall_curve": Q(q_knn_recall_curve, _sql_knn_recall_curve())}
)


def q_langid_confusion(spark, sf_dir):
    """Language-ID confusion matrix: the n-gram-marker predictor
    (text.lang_id) against the corpus's labeled ``lang`` column —
    (labeled, predicted, n, frac_of_labeled), the classifier-quality
    audit run before trusting the heuristic for mixture decisions."""
    preds = lang_id(_docs(spark, sf_dir))
    labeled = _docs(spark, sf_dir).select("doc_id", F.col("lang").alias("label"))
    j = labeled.join(preds.select("doc_id", "pred_lang"), "doc_id")
    cm = j.groupBy("label", "pred_lang").agg(F.count(F.lit(1)).alias("n"))
    tot = j.groupBy("label").agg(F.count(F.lit(1)).alias("_t"))
    return cm.join(tot, "label").select(
        "label",
        "pred_lang",
        "n",
        (F.col("n").cast("double") / F.col("_t").cast("double")).alias(
            "frac_of_labeled"
        ),
    )


def _sql_langid_confusion() -> str:
    pred = _sql_lang_id()
    return f"""
WITH preds AS ({pred}),
j AS (
  SELECT d.doc_id, d.lang AS label, p.pred_lang
  FROM documents d JOIN preds p USING (doc_id)
),
cm AS (SELECT label, pred_lang, COUNT(*) AS n FROM j GROUP BY 1, 2),
tot AS (SELECT label, COUNT(*) AS _t FROM j GROUP BY 1)
SELECT cm.label, cm.pred_lang, cm.n,
  CAST(cm.n AS DOUBLE) / CAST(tot._t AS DOUBLE) AS frac_of_labeled
FROM cm JOIN tot ON cm.label = tot.label
"""


QUERIES.update(
    {"langid_confusion": Q(q_langid_confusion, _sql_langid_confusion())}
)


def q_gopher_rules(spark, sf_dir):
    """Gopher quality-rule scorecard by language
    (operators/text.gopher_rules): per-rule violation counts and the
    overall pass rate of the standard LLM-corpus pre-filter battery --
    the dashboard that says WHICH rule is rejecting a corpus slice,
    not just how much survives.  Doc flags are pure built-in
    expressions; the rollup is integer counts + one division."""
    from timeseriesutils_spark.operators.text import gopher_rules

    docs = _docs(spark, sf_dir)
    flags = gopher_rules(docs, keep_cols=("lang",))
    rules = [
        "r_words", "r_mwl", "r_alpha", "r_symbol",
        "r_bullet", "r_ellipsis", "r_stop",
    ]
    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.sum((~F.col(r)).cast("int")).cast("bigint").alias(f"viol_{r[2:]}")
                for r in rules
            ],
            F.sum(F.col("gopher_pass").cast("int")).cast("bigint").alias("n_pass"),
        )
        .withColumn(
            "pass_rate",
            F.col("n_pass").cast("double") / F.col("n_docs").cast("double"),
        )
    )


def _sql_gopher_rules():
    from timeseriesutils_spark.operators.text import gopher_rules_sql

    rules = [
        "r_words", "r_mwl", "r_alpha", "r_symbol",
        "r_bullet", "r_ellipsis", "r_stop",
    ]
    viols = ",\n  ".join(
        f"CAST(SUM(CAST(NOT {r} AS INT)) AS BIGINT) AS viol_{r[2:]}" for r in rules
    )
    return f"""
WITH j AS ({gopher_rules_sql("documents", keep_cols=("lang",))})
SELECT lang, COUNT(*) AS n_docs,
  {viols},
  CAST(SUM(CAST(gopher_pass AS INT)) AS BIGINT) AS n_pass,
  CAST(CAST(SUM(CAST(gopher_pass AS INT)) AS BIGINT) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS pass_rate
FROM j GROUP BY lang
"""


QUERIES.update({"gopher_rules": Q(q_gopher_rules, _sql_gopher_rules())})


def q_domain_caps(spark, sf_dir):
    """Per-source frequency cap audit (operators/splits.cap_per_key):
    cap every source at 200 docs with deterministic md5-ranked
    retention and report kept/total/cap_hit per source -- the
    Common-Crawl-style dominance control on the training mix."""
    from timeseriesutils_spark.operators.splits import cap_per_key

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    capped = cap_per_key(docs, "source", "doc_id", cap=200)
    return (
        capped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
        )
        .withColumn("cap_hit", F.col("n_docs") > F.col("n_kept"))
    )


def _sql_domain_caps():
    from timeseriesutils_spark.operators.splits import cap_per_key_sql

    inner = cap_per_key_sql(
        "documents", "source", "doc_id", 200, "doc_id, source"
    )
    return f"""
WITH capped AS ({inner})
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(CAST(kept AS INT)) AS BIGINT) AS n_kept,
  COUNT(*) > CAST(SUM(CAST(kept AS INT)) AS BIGINT) AS cap_hit
FROM capped GROUP BY source
"""


QUERIES.update({"domain_caps": Q(q_domain_caps, _sql_domain_caps())})


def q_containment_dedup(spark, sf_dir):
    """Shingle-containment near-dup pairs (dedup.containment_pairs):
    max(|A∩B|/|A|, |A∩B|/|B|) ≥ 0.5 — the asymmetric sibling of
    ``dedup_ngram_jaccard`` that catches subset duplication (doc quoted
    inside a longer doc scores ≈0 Jaccard but ≈1 containment), the
    usual shape of train/test contamination and boilerplate wrapping.
    Same posting-list machinery and hot-shingle cap."""
    from timeseriesutils_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.5, max_posting=MAX_POSTING
    )


def _sql_containment(threshold: float = 0.5) -> str:
    return f"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents
),
sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(w) >= 3
      THEN [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]
      ELSE [array_to_string(w, ' ')] END) AS shingles
  FROM words
),
ex AS (SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS s FROM sh),
ok AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= {MAX_POSTING}),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN ok ON ok.s = a.s
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, sz_a, sz_b,
  CAST(i AS DOUBLE) / LEAST(sz_a, sz_b) AS containment
FROM inter WHERE CAST(i AS DOUBLE) / LEAST(sz_a, sz_b) >= {threshold}
"""


QUERIES.update({"containment_dedup": Q(q_containment_dedup, _sql_containment())})


def q_dsir_select(spark, sf_dir):
    """DSIR data selection (operators/text.dsir_weights): English docs
    are the target domain; every non-English doc in the pool gets a
    hashed-unigram+bigram log importance weight under the add-1
    smoothed target/pool bucket model, and the derandomized
    Gumbel-top-k picks the 100 most target-like pool docs — the Xie et
    al. 2023 pretraining-data-selection recipe with a broadcast
    4096-row model and a TakeOrderedAndProject threshold (no global
    window)."""
    from timeseriesutils_spark.operators.text import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(
        docs.withColumn("_is_en", F.col("lang") == F.lit("en")),
        "_is_en",
        buckets=4096,
        top_k=100,
    )


def _sql_dsir_select():
    from timeseriesutils_spark.operators.text import dsir_weights_sql

    return dsir_weights_sql(
        "documents", target_expr="lang = 'en'", buckets=4096, top_k=100
    )


QUERIES.update({"dsir_select": Q(q_dsir_select, _sql_dsir_select())})


def q_distinct_ngrams(spark, sf_dir):
    """Distinct-1/2/3 diversity profile per language slice
    (operators/text.distinct_ngrams): the mode-collapse / template-spam
    indicator — low distinct-2/3 flags boilerplate-heavy slices long
    before exact dedup fires.  One n-gram union, exact count-distinct
    two-level aggregation."""
    from timeseriesutils_spark.operators.text import distinct_ngrams

    return distinct_ngrams(
        load_table(spark, sf_dir, "documents"), "lang", n_max=3
    )


def _sql_distinct_ngrams():
    from timeseriesutils_spark.operators.text import distinct_ngrams_sql

    return distinct_ngrams_sql("documents", "lang", n_max=3)


QUERIES.update({"distinct_ngrams": Q(q_distinct_ngrams, _sql_distinct_ngrams())})


# --- round-8 wiring: ranking eval + portable sketches ----------------------


def q_ranking_metrics(spark, sf_dir):
    """NDCG@5 / MRR / hit-rate@5 per ship year, treating each order as
    a retrieval query: items ranked by price, relevance = returned
    (operators/mleval.ranking_metrics).  The IR eval battery for
    bm25_search / knn rankings — IDCG from ALL judged rows in the
    query group (missing a relevant item outside the top-k costs
    NDCG), discounts as precomputed literals, per-query scalars
    1e-9-quantized before the report-group mean."""
    from timeseriesutils_spark.operators.mleval import ranking_metrics

    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        "l_orderkey",
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("score"),
        (F.col("l_returnflag") == F.lit("R")).cast("bigint").alias("rel"),
    )
    return ranking_metrics(
        d, ["l_orderkey"], ["ship_year"], "score", "rel", k=5,
        tie_break=["l_linenumber"],
    )


def _sql_ranking_metrics():
    from timeseriesutils_spark.operators.mleval import ranking_metrics_sql

    d = (
        "SELECT l_orderkey,"
        " CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)"
        " AS ship_year, l_linenumber,"
        " CAST(l_extendedprice AS DOUBLE) AS score,"
        " CAST(l_returnflag = 'R' AS BIGINT) AS rel FROM lineitem"
    )
    return ranking_metrics_sql(
        d, ["l_orderkey"], ["ship_year"], "score", "rel", k=5,
        tie_break=["l_linenumber"],
    )


QUERIES.update(
    {"ranking_metrics": Q(q_ranking_metrics, _sql_ranking_metrics())}
)


def q_cms_estimate(spark, sf_dir):
    """Count-Min sketch frequency audit over supplier keys
    (operators/sketches.cms_estimate): deterministic md5 rows make the
    sketch state bit-identical in any engine — estimate vs truth for
    the top-20 suppliers shows collision inflation directly.  The
    mergeable fixed-memory counter beside the exact heavy_hitters."""
    from timeseriesutils_spark.operators.sketches import cms_estimate

    return cms_estimate(
        load_table(spark, sf_dir, "lineitem"), "l_suppkey",
        depth=4, width=512, top_k=20,
    )


def _sql_cms_estimate():
    from timeseriesutils_spark.operators.sketches import cms_estimate_sql

    return cms_estimate_sql(
        "SELECT * FROM lineitem", "l_suppkey", depth=4, width=512,
        top_k=20,
    )


QUERIES.update({"cms_estimate": Q(q_cms_estimate, _sql_cms_estimate())})


def q_hll_estimate(spark, sf_dir):
    """HyperLogLog distinct-part estimate vs exact truth per ship year
    (operators/sketches.hll_estimate): the portable-sketch sibling of
    agg_approx_distinct — md5 registers are pure SQL, so the same
    sketch merges identically in any engine, and the harmonic sum is
    kept EXACT by scaling the dyadic terms to DECIMAL integers."""
    from timeseriesutils_spark.operators.sketches import hll_estimate

    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        F.year(F.col("l_shipdate").cast("date")).cast("int").alias(
            "ship_year"
        ),
        "l_partkey",
    )
    return hll_estimate(d, "l_partkey", ["ship_year"], b=8)


def _sql_hll_estimate():
    from timeseriesutils_spark.operators.sketches import hll_estimate_sql

    d = (
        "SELECT CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS INT)"
        " AS ship_year, l_partkey FROM lineitem"
    )
    return hll_estimate_sql(d, "l_partkey", ["ship_year"], b=8)


QUERIES.update({"hll_estimate": Q(q_hll_estimate, _sql_hll_estimate())})


def q_kmv_overlap(spark, sf_dir):
    """KMV bottom-k set-overlap audit between return-flag segments over
    part keys (operators/sketches.kmv_overlap): the third portable-md5
    sketch — cms counts frequencies, hll counts cardinality, KMV does
    SET ALGEBRA (segment overlap) in k int64s per group, with the
    exact Jaccard truth beside the estimate."""
    from timeseriesutils_spark.operators.sketches import kmv_overlap

    return kmv_overlap(
        load_table(spark, sf_dir, "lineitem"), "l_partkey",
        "l_returnflag", k=256,
    )


def _sql_kmv_overlap():
    from timeseriesutils_spark.operators.sketches import kmv_overlap_sql

    return kmv_overlap_sql(
        "SELECT * FROM lineitem", "l_partkey", "l_returnflag", k=256
    )


QUERIES.update({"kmv_overlap": Q(q_kmv_overlap, _sql_kmv_overlap())})


def q_intradoc_dedup(spark, sf_dir):
    """Intra-document line dedup over the documents corpus
    (operators/text.intradoc_dedup): corpus dedup removes repeated
    DOCUMENTS; crawled pages repeat nav chrome / banners / footers
    INSIDE one document — keep-first line dedup with duplication
    stats, pure per-row expressions, no shuffle."""
    from timeseriesutils_spark.operators.text import intradoc_dedup

    return intradoc_dedup(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        sep=". ",
    )


def _sql_intradoc_dedup():
    from timeseriesutils_spark.operators.text import intradoc_dedup_sql

    return intradoc_dedup_sql(
        "SELECT * FROM documents", "doc_id", "text", sep=". "
    )


QUERIES.update(
    {"intradoc_dedup": Q(q_intradoc_dedup, _sql_intradoc_dedup())}
)


def q_gibberish_score(spark, sf_dir):
    """Character-level gibberish/encoding-noise scores over the
    documents corpus (operators/text.gibberish_score): base64 blobs,
    hex dumps, and mojibake survive word-level filters but have
    degenerate CHARACTER statistics — letter-histogram entropy (exact
    length-difference counts, 26 pinned ln terms), max-letter share,
    longest consonant run, alpha fraction."""
    from timeseriesutils_spark.operators.text import gibberish_score

    return gibberish_score(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


def _sql_gibberish_score():
    from timeseriesutils_spark.operators.text import gibberish_score_sql

    return gibberish_score_sql("SELECT * FROM documents", "doc_id", "text")


QUERIES.update(
    {"gibberish_score": Q(q_gibberish_score, _sql_gibberish_score())}
)


def q_flesch(spark, sf_dir):
    """Flesch reading ease + Flesch–Kincaid grade over the documents
    corpus (operators/text.flesch_readability): surface readability
    for audience bucketing — boilerplate/legalese scores very low,
    word-salad implausibly high.  Exact regexp counts (Java∩RE2
    subset), pure per-row expressions."""
    from timeseriesutils_spark.operators.text import flesch_readability

    return flesch_readability(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


def _sql_flesch():
    from timeseriesutils_spark.operators.text import flesch_readability_sql

    return flesch_readability_sql("SELECT * FROM documents", "doc_id", "text")


QUERIES.update({"flesch_readability": Q(q_flesch, _sql_flesch())})


def q_simpson_diversity(spark, sf_dir):
    """Gini–Simpson lexical diversity per document source
    (operators/text.simpson_diversity): the probability two random
    tokens differ — template spam / mode collapse shows up as low D
    even when the distinct-token RATIO looks healthy, because D
    weights by frequency mass.  One token count collapse + one slice
    rollup."""
    from timeseriesutils_spark.operators.text import simpson_diversity

    return simpson_diversity(
        load_table(spark, sf_dir, "documents"), "source", "text"
    )


def _sql_simpson_diversity():
    from timeseriesutils_spark.operators.text import simpson_diversity_sql

    return simpson_diversity_sql("SELECT * FROM documents", "source", "text")


QUERIES.update(
    {"simpson_diversity": Q(q_simpson_diversity, _sql_simpson_diversity())}
)


def q_silhouette(spark, sf_dir):
    """Per-cluster simplified-silhouette audit of the deterministic
    Lloyd clustering over the embeddings corpus
    (operators/kmeans.silhouette_audit): the cluster-quality gauge
    behind the IVF coarse quantizer and the SemDeDup k ≈ N/cluster
    rule — exact int64 distances to all k centroids, one projection +
    one k-row aggregation."""
    from timeseriesutils_spark.operators.kmeans import silhouette_audit

    return silhouette_audit(_emb(spark, sf_dir), **KMEANS_PARAMS)


def _sql_silhouette():
    from timeseriesutils_spark.operators.kmeans import silhouette_audit_sql

    return silhouette_audit_sql(**KMEANS_PARAMS)


QUERIES.update({"silhouette_audit": Q(q_silhouette, _sql_silhouette())})


def q_knn_pq(spark, sf_dir):
    """Product-quantization ANN over the embeddings corpus
    (operators/similarity.knn_pq_portable): each 64-float vector
    compresses to 8 sub-space codes (8 bytes — 32× smaller); search
    scores asymmetric
    distances via per-query lookup tables over the CODES — the
    memory-side 100 TB lever beside knn_ivf's list pruning.  Fully
    hash-checkable: per-sub-space deterministic Lloyd codebooks from
    the md5-ordered sample, exact int64 codes and ADC sums — the twin
    re-derives everything, training included."""
    from timeseriesutils_spark.operators.similarity import knn_pq_portable

    emb = _emb(spark, sf_dir)
    return knn_pq_portable(
        emb.filter(F.col("vec_id") < 10), emb, k=5, m=8, n_codes=64,
        n_iter=3,
    )


def _sql_knn_pq():
    from timeseriesutils_spark.operators.similarity import knn_pq_portable_sql

    return knn_pq_portable_sql(k=5, m=8, n_codes=64, n_iter=3)


QUERIES.update({"knn_pq": Q(q_knn_pq, _sql_knn_pq())})


def q_pq_recall(spark, sf_dir):
    """PQ index-quality audit: recall@k of the 4-code ADC ranking
    against the EXACT quantized squared-L2 neighbors for k ∈ {1,3,5}
    (the knn_recall_curve pattern, L2-vs-L2 so the comparison is
    apples-to-apples) — how much neighbor quality does 32× compression
    cost?  Measured 0.38 recall@5 on the synthetic (near-random — the
    PQ worst case) corpus at m=8/64 codes; both sides exact-integer
    verified."""
    from timeseriesutils_spark.operators.kmeans import _quantize
    from timeseriesutils_spark.operators.similarity import knn_pq_portable
    from pyspark.sql import Window as W

    emb = _emb(spark, sf_dir)
    q10 = emb.filter(F.col("vec_id") < 10)
    kmax = max(_RECALL_KS)
    # exact quantized squared-L2 top-k (one broadcast cross join)
    c = emb.select(
        F.col("vec_id"), _quantize(F.col("embedding"), 6).alias("_cq")
    )
    qq = q10.select(
        F.col("vec_id").alias("query_id"),
        _quantize(F.col("embedding"), 6).alias("_qq"),
    )
    d = F.aggregate(
        F.zip_with(F.col("_qq"), F.col("_cq"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    w = W.partitionBy("query_id").orderBy(F.col("_d"), F.col("vec_id"))
    exact = (
        c.crossJoin(F.broadcast(qq))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", d.alias("_d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= kmax)
    )
    approx = knn_pq_portable(q10, emb, k=kmax, m=8, n_codes=64,
                             n_iter=3)
    m = exact.select(
        "query_id", "vec_id", F.col("rn").alias("_re")
    ).join(
        F.broadcast(
            approx.select("query_id", "vec_id", F.col("rn").alias("_ra"))
        ),
        on=["query_id", "vec_id"],
    )
    ks = F.explode(F.array(*[F.lit(k) for k in _RECALL_KS])).alias("k")
    hits = (
        m.select("_re", "_ra", ks)
        .filter((F.col("_re") <= F.col("k")) & (F.col("_ra") <= F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    scaffold = exact.agg(
        F.count_distinct("query_id").alias("n_queries")
    ).select("n_queries", ks)
    return scaffold.join(F.broadcast(hits), on="k", how="left").select(
        "k",
        "n_queries",
        F.coalesce("n_matches", F.lit(0)).cast("bigint").alias("n_matches"),
        (
            F.coalesce("n_matches", F.lit(0)).cast("double")
            / (F.col("k") * F.col("n_queries")).cast("double")
        ).alias("recall"),
    )


def _sql_pq_recall():
    from timeseriesutils_spark.operators.similarity import knn_pq_portable_sql

    ks = ", ".join(str(k) for k in _RECALL_KS)
    kmax = max(_RECALL_KS)
    approx = knn_pq_portable_sql(k=kmax, m=8, n_codes=64, n_iter=3)
    qi = ("CAST(floor(CAST(eq.embedding[t.i] AS DOUBLE) * 1000000.0 + 0.5)"
          " AS BIGINT)")
    ci = ("CAST(floor(CAST(ec.embedding[t.i] AS DOUBLE) * 1000000.0 + 0.5)"
          " AS BIGINT)")
    return f"""
WITH pairs AS (
  SELECT eq.vec_id AS query_id, ec.vec_id,
    CAST(SUM(({qi} - {ci}) * ({qi} - {ci})) AS BIGINT) AS _d
  FROM embeddings eq JOIN embeddings ec ON eq.vec_id <> ec.vec_id,
  range(1, 65) t(i)
  WHERE eq.vec_id < 10
  GROUP BY 1, 2
),
exact AS (
  SELECT query_id, vec_id,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY _d, vec_id) AS rn
  FROM pairs QUALIFY rn <= {kmax}
),
approx AS ({approx}),
m AS (
  SELECT e.query_id, e.vec_id, e.rn AS _re, a.rn AS _ra
  FROM exact e JOIN approx a USING (query_id, vec_id)
),
kk AS (SELECT UNNEST([{ks}]) AS k),
hits AS (
  SELECT kk.k, COUNT(*) AS n_matches
  FROM m JOIN kk ON m._re <= kk.k AND m._ra <= kk.k
  GROUP BY kk.k
),
scaffold AS (
  SELECT kk.k, nq.n_queries
  FROM kk CROSS JOIN
    (SELECT COUNT(DISTINCT query_id) AS n_queries FROM exact) nq
)
SELECT s.k, s.n_queries,
  CAST(COALESCE(h.n_matches, 0) AS BIGINT) AS n_matches,
  CAST(COALESCE(h.n_matches, 0) AS DOUBLE)
    / CAST(s.k * s.n_queries AS DOUBLE) AS recall
FROM scaffold s LEFT JOIN hits h ON s.k = h.k
"""


QUERIES.update({"pq_recall": Q(q_pq_recall, _sql_pq_recall())})


def q_knn_ivfpq(spark, sf_dir):
    """IVF + PQ compound ANN (operators/similarity.knn_ivfpq_portable,
    Jégou 2011 IVFADC): the coarse quantizer prunes which rows are
    scored (nprobe/n_centroids of the corpus) and PQ compresses what
    is scored (8 residual codes per row) — the two levers knn_ivf and
    knn_pq measure separately, composed into the standard
    billion-scale serving layout.  Fully hash-checkable, training
    included: coarse Lloyd + per-sub-space residual Lloyd, exact int64
    codes / per-(query, probed-list) tables / ADC sums."""
    from timeseriesutils_spark.operators.similarity import knn_ivfpq_portable

    emb = _emb(spark, sf_dir)
    return knn_ivfpq_portable(emb.filter(F.col("vec_id") < 10), emb)


def _sql_knn_ivfpq():
    from timeseriesutils_spark.operators.similarity import (
        knn_ivfpq_portable_sql,
    )

    return knn_ivfpq_portable_sql()


QUERIES.update({"knn_ivfpq": Q(q_knn_ivfpq, _sql_knn_ivfpq())})


def q_ann_recall_ivfpq(spark, sf_dir):
    """IVFADC index-quality audit: recall@k of the compound
    IVF-prune + PQ-compress ranking against the EXACT quantized
    squared-L2 neighbors for k ∈ {1,3,5} — the row that sits beside
    pq_recall (compression loss alone) and knn_recall_curve (pruning
    loss alone) and answers how much the COMPOSITION costs: unlike
    PQ-only, IVFADC can also MISS candidates whose list was never
    probed, so recall here ≤ pq_recall at equal code budgets."""
    from timeseriesutils_spark.operators.kmeans import _quantize
    from timeseriesutils_spark.operators.similarity import knn_ivfpq_portable
    from pyspark.sql import Window as W

    emb = _emb(spark, sf_dir)
    q10 = emb.filter(F.col("vec_id") < 10)
    kmax = max(_RECALL_KS)
    c = emb.select(
        F.col("vec_id"), _quantize(F.col("embedding"), 6).alias("_cq")
    )
    qq = q10.select(
        F.col("vec_id").alias("query_id"),
        _quantize(F.col("embedding"), 6).alias("_qq"),
    )
    d = F.aggregate(
        F.zip_with(F.col("_qq"), F.col("_cq"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    w = W.partitionBy("query_id").orderBy(F.col("_d"), F.col("vec_id"))
    exact = (
        c.crossJoin(F.broadcast(qq))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", d.alias("_d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= kmax)
    )
    approx = knn_ivfpq_portable(q10, emb, k=kmax)
    m = exact.select(
        "query_id", "vec_id", F.col("rn").alias("_re")
    ).join(
        F.broadcast(
            approx.select("query_id", "vec_id", F.col("rn").alias("_ra"))
        ),
        on=["query_id", "vec_id"],
    )
    ks = F.explode(F.array(*[F.lit(k) for k in _RECALL_KS])).alias("k")
    hits = (
        m.select("_re", "_ra", ks)
        .filter((F.col("_re") <= F.col("k")) & (F.col("_ra") <= F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    scaffold = exact.agg(
        F.count_distinct("query_id").alias("n_queries")
    ).select("n_queries", ks)
    return scaffold.join(F.broadcast(hits), on="k", how="left").select(
        "k",
        "n_queries",
        F.coalesce("n_matches", F.lit(0)).cast("bigint").alias("n_matches"),
        (
            F.coalesce("n_matches", F.lit(0)).cast("double")
            / (F.col("k") * F.col("n_queries")).cast("double")
        ).alias("recall"),
    )


def _sql_ann_recall_ivfpq():
    from timeseriesutils_spark.operators.similarity import (
        knn_ivfpq_portable_sql,
    )

    ks = ", ".join(str(k) for k in _RECALL_KS)
    kmax = max(_RECALL_KS)
    approx = knn_ivfpq_portable_sql(k=kmax)
    qi = ("CAST(floor(CAST(eq.embedding[t.i] AS DOUBLE) * 1000000.0 + 0.5)"
          " AS BIGINT)")
    ci = ("CAST(floor(CAST(ec.embedding[t.i] AS DOUBLE) * 1000000.0 + 0.5)"
          " AS BIGINT)")
    return f"""
WITH pairs AS (
  SELECT eq.vec_id AS query_id, ec.vec_id,
    CAST(SUM(({qi} - {ci}) * ({qi} - {ci})) AS BIGINT) AS _d
  FROM embeddings eq JOIN embeddings ec ON eq.vec_id <> ec.vec_id,
  range(1, 65) t(i)
  WHERE eq.vec_id < 10
  GROUP BY 1, 2
),
exact AS (
  SELECT query_id, vec_id,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY _d, vec_id) AS rn
  FROM pairs QUALIFY rn <= {kmax}
),
approx AS ({approx}),
m AS (
  SELECT e.query_id, e.vec_id, e.rn AS _re, a.rn AS _ra
  FROM exact e JOIN approx a USING (query_id, vec_id)
),
kk AS (SELECT UNNEST([{ks}]) AS k),
hits AS (
  SELECT kk.k, COUNT(*) AS n_matches
  FROM m JOIN kk ON m._re <= kk.k AND m._ra <= kk.k
  GROUP BY kk.k
),
scaffold AS (
  SELECT kk.k, nq.n_queries
  FROM kk CROSS JOIN
    (SELECT COUNT(DISTINCT query_id) AS n_queries FROM exact) nq
)
SELECT s.k, s.n_queries,
  CAST(COALESCE(h.n_matches, 0) AS BIGINT) AS n_matches,
  CAST(COALESCE(h.n_matches, 0) AS DOUBLE)
    / CAST(s.k * s.n_queries AS DOUBLE) AS recall
FROM scaffold s LEFT JOIN hits h ON s.k = h.k
"""


QUERIES.update(
    {"ann_recall_ivfpq": Q(q_ann_recall_ivfpq, _sql_ann_recall_ivfpq())}
)


def q_keyness_llr(spark, sf_dir):
    """Dunning log-likelihood keyness between the English and
    non-English corpus halves (operators/text.keyness_llr): corpus_jsd
    says THAT the token distributions differ; this ranks WHICH terms
    drive it — the curation table behind source mixing and contamination
    triage.  Exact int64 counts, 1e-9-quantized per-term ln trees,
    TakeOrderedAndProject top-k."""
    from timeseriesutils_spark.operators.text import keyness_llr

    return keyness_llr(_docs(spark, sf_dir), F.col("lang") == "en")


def _sql_keyness_llr():
    from timeseriesutils_spark.operators.text import keyness_llr_sql

    return keyness_llr_sql("SELECT * FROM documents", "lang = 'en'")


QUERIES.update({"keyness_llr": Q(q_keyness_llr, _sql_keyness_llr())})


def q_mmr_diversify(spark, sf_dir):
    """Maximal-marginal-relevance diversified top-5
    (operators/similarity.mmr_diversify, Carbonell 1998): knn returns
    the k MOST similar results even when they are near-duplicates of
    each other; MMR re-ranks the candidate pool so each pick is
    relevant to the query AND novel vs the picks so far — the
    retrieval-side diversifier beside the corpus-side dedup family.
    Exact pair cosines, fixed score tree, id tie-breaks; the unrolled
    greedy twin re-derives the identical picks."""
    from timeseriesutils_spark.operators.similarity import mmr_diversify

    emb = _emb(spark, sf_dir)
    return mmr_diversify(emb.filter(F.col("vec_id") < 10), emb)


def _sql_mmr_diversify():
    from timeseriesutils_spark.operators.similarity import mmr_diversify_sql

    return mmr_diversify_sql()


QUERIES.update({"mmr_diversify": Q(q_mmr_diversify, _sql_mmr_diversify())})


def q_dedup_band_audit(spark, sf_dir):
    """LSH banding tuner (operators/dedup.dedup_band_audit): the same
    32 portable minhash minima re-banded as (2,16)/(4,8)/(8,4)/(16,2),
    each config's measured candidate volume and true-near-dup recall
    beside the theoretical 1−(1−t^r)^b catch probability — the
    empirical (b, r) picker for dedup_minhash_lsh, and the drift gauge
    between the iid S-curve and this corpus's shingle reality."""
    from timeseriesutils_spark.operators.dedup import dedup_band_audit

    return dedup_band_audit(_docs(spark, sf_dir))


def _sql_dedup_band_audit():
    from timeseriesutils_spark.operators.dedup import dedup_band_audit_sql

    return dedup_band_audit_sql()


QUERIES.update(
    {"dedup_band_audit": Q(q_dedup_band_audit, _sql_dedup_band_audit())}
)


def q_hhi_concentration(spark, sf_dir):
    """Source-concentration HHI of the document corpus per language
    (operators/analytics.hhi_concentration): "is the German slice all
    one crawl?" — the one-number dominance gauge behind domain_caps
    and dup_rate_by_source; exact integer squared-count numerator."""
    from timeseriesutils_spark.operators.analytics import hhi_concentration

    return hhi_concentration(_docs(spark, sf_dir), "source", ["lang"])


def _sql_hhi_concentration():
    from timeseriesutils_spark.operators.analytics import (
        hhi_concentration_sql,
    )

    return hhi_concentration_sql("SELECT * FROM documents", "source",
                                 ["lang"])


QUERIES.update(
    {"hhi_concentration": Q(q_hhi_concentration, _sql_hhi_concentration())}
)


def q_mutual_info(spark, sf_dir):
    """Mutual information between document language and source
    (operators/profile.mutual_info): the categorical dependence /
    label-leakage screen — if source determines lang (NMI → 1), a
    lang-balanced sample is secretly a source-skewed one.  Exact cell
    counts, 1e-9-quantized ln kernels, cell-bounded cost."""
    from timeseriesutils_spark.operators.profile import mutual_info

    return mutual_info(_docs(spark, sf_dir), "lang", "source")


def _sql_mutual_info():
    from timeseriesutils_spark.operators.profile import mutual_info_sql

    return mutual_info_sql("SELECT * FROM documents", "lang", "source")


QUERIES.update({"mutual_info": Q(q_mutual_info, _sql_mutual_info())})


def q_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of the exact and LSH neighbor lists
    (operators/similarity.rrf_fuse, Cormack 2009): the hybrid-retrieval
    combiner — fuse top-10 rankings from two indexes with 1/(60+rank)
    scores, no score calibration needed.  Exact quantized reciprocals,
    integer fused order."""
    from timeseriesutils_spark.operators.similarity import (
        knn_bruteforce,
        knn_lsh,
        rrf_fuse,
    )

    emb = _emb(spark, sf_dir)
    q10 = emb.filter(F.col("vec_id") < 10)
    a = knn_bruteforce(q10, emb, k=10)
    b = knn_lsh(q10, emb, k=10, bits=4, dim=64)
    return rrf_fuse([a, b], top_k=5)


def _sql_rrf_fusion():
    from timeseriesutils_spark.operators.similarity import (
        knn_lsh_sql,
        rrf_fuse_sql,
    )

    brute = _sql_knn(k=10)
    lsh = knn_lsh_sql(k=10, bits=4, dim=64)
    return rrf_fuse_sql([brute, lsh], top_k=5)


QUERIES.update({"rrf_fusion": Q(q_rrf_fusion, _sql_rrf_fusion())})


E2E_PARAMS = dict(
    min_quality=QF_MIN_QUALITY,
    max_dup_gram_frac=QF_MAX_DUP,
    neardup_threshold=0.6,
    decontam_threshold=0.5,
    max_posting=MAX_POSTING,
    source_cap=100,
    mix_weights=MIX_WEIGHTS,
    n_shards=8,
    seed="e2e",
)


def q_pipeline_e2e(spark, sf_dir):
    """The composed training-data pipeline a 100 TB run actually
    executes (operators/corpus_pipeline.assemble_training_corpus):
    quality funnel → exact dedup → MinHash near-dup dedup →
    decontamination vs the odd-id eval slice → per-source cap →
    mixture epochs → shard assignment → JSONL lines, gate-checked as
    ONE plan against one composed DuckDB oracle.  Every stage is
    individually hash-green; this query verifies the COMPOSITION —
    pin lifetimes and survivor-chain reuse across stage tiers."""
    from timeseriesutils_spark.operators.corpus_pipeline import (
        assemble_training_corpus,
    )

    return assemble_training_corpus(_docs(spark, sf_dir), **E2E_PARAMS)


def _sql_pipeline_e2e():
    from timeseriesutils_spark.operators.corpus_pipeline import (
        assemble_training_corpus_sql,
    )

    return assemble_training_corpus_sql("documents", **E2E_PARAMS)


QUERIES.update({"pipeline_e2e": Q(q_pipeline_e2e, _sql_pipeline_e2e())})


def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer-fertility dashboard per (lang, source) stratum
    (operators/text.tokenizer_fertility): pre-tokens per word, chars
    per token, tokens per doc — the numbers that set per-language
    sampling weights and packing budgets in a training mix.  Exact
    integer counts, scan-bound."""
    from timeseriesutils_spark.operators.text import tokenizer_fertility

    return tokenizer_fertility(_docs(spark, sf_dir))


def _sql_tokenizer_fertility():
    from timeseriesutils_spark.operators.text import tokenizer_fertility_sql

    return tokenizer_fertility_sql("documents")


QUERIES.update(
    {"tokenizer_fertility": Q(q_tokenizer_fertility, _sql_tokenizer_fertility())}
)


def q_winnow_fingerprints(spark, sf_dir):
    """MOSS winnowing fingerprints over the corpus (operators/dedup.
    winnow_fingerprints): windowed-min selection of 3-gram hashes,
    rightmost ties via one packed-key window MIN — the position-aware
    local-dedup index (plagiarism spans, license blocks) beside the
    whole-doc MinHash family.  Guaranteed detection of shared spans
    ≥ window+n−1 grams at ~2/(w+1) index density."""
    from timeseriesutils_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), n=3, window=4)


def _sql_winnow():
    from timeseriesutils_spark.operators.dedup import winnow_fingerprints_sql

    return winnow_fingerprints_sql("documents", n=3, window=4)


QUERIES.update(
    {"winnow_fingerprints": Q(q_winnow_fingerprints, _sql_winnow())}
)


def _paired_docs(spark, sf_dir):
    """Even docs as candidates paired with the next odd doc as
    reference (pair = doc_id div 2) — the aligned-text eval frame."""
    docs = _docs(spark, sf_dir)
    cand = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.expr("CAST(doc_id div 2 AS BIGINT)").alias("pair"),
        F.col("text").alias("cand_text"),
    )
    ref = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.expr("CAST(doc_id div 2 AS BIGINT)").alias("pair"),
        F.col("text").alias("ref_text"),
    )
    return cand.join(ref, "pair")


_SQL_PAIRED_DOCS = """
SELECT c.pair, c.cand_text, r.ref_text
FROM (SELECT CAST(doc_id // 2 AS BIGINT) AS pair, text AS cand_text
      FROM documents WHERE doc_id % 2 = 0) c
JOIN (SELECT CAST(doc_id // 2 AS BIGINT) AS pair, text AS ref_text
      FROM documents WHERE doc_id % 2 = 1) r USING (pair)
"""


def q_rouge_n(spark, sf_dir):
    """ROUGE-2 over aligned doc pairs (operators/text.rouge_n):
    clipped bigram multiset overlap P/R/F1 — the summarization /
    paraphrase eval and pairwise near-dup score; distributed clipped
    -count join, never a per-row quadratic kernel."""
    from timeseriesutils_spark.operators.text import rouge_n

    return rouge_n(_paired_docs(spark, sf_dir), "pair", "cand_text",
                   "ref_text", n=2)


def _sql_rouge_n():
    from timeseriesutils_spark.operators.text import rouge_n_sql

    return rouge_n_sql(_SQL_PAIRED_DOCS, "pair", "cand_text", "ref_text",
                       n=2)


def q_cer_pairs(spark, sf_dir):
    """Character error rate over aligned doc pairs (operators/text.
    cer_pairs): exact Levenshtein / reference length on 200-char
    prefixes — the OCR/ASR transcription-quality metric."""
    from timeseriesutils_spark.operators.text import cer_pairs

    return cer_pairs(_paired_docs(spark, sf_dir), "pair", "cand_text",
                     "ref_text", max_chars=200)


def _sql_cer_pairs():
    from timeseriesutils_spark.operators.text import cer_pairs_sql

    return cer_pairs_sql(_SQL_PAIRED_DOCS, "pair", "cand_text", "ref_text",
                         max_chars=200)


QUERIES.update(
    {
        "rouge_n": Q(q_rouge_n, _sql_rouge_n()),
        "cer_pairs": Q(q_cer_pairs, _sql_cer_pairs()),
    }
)


def q_bleu_pairs(spark, sf_dir):
    """Sentence-BLEU over aligned doc pairs (operators/text.bleu_pairs):
    clipped 1–4-gram precisions, +1 smoothing on higher orders,
    brevity penalty — the MT/generation eval beside rouge_n; exact
    clipped-count joins, 1e-9-quantized ln/exp tree."""
    from timeseriesutils_spark.operators.text import bleu_pairs

    return bleu_pairs(_paired_docs(spark, sf_dir), "pair", "cand_text",
                      "ref_text", max_n=4)


def _sql_bleu_pairs():
    from timeseriesutils_spark.operators.text import bleu_pairs_sql

    return bleu_pairs_sql(_SQL_PAIRED_DOCS, "pair", "cand_text",
                          "ref_text", max_n=4)


QUERIES.update({"bleu_pairs": Q(q_bleu_pairs, _sql_bleu_pairs())})


def q_chrf_pairs(spark, sf_dir):
    """chrF2 over aligned doc pairs (operators/text.chrf_pairs):
    character 1..4-gram F_beta=2 on whitespace-stripped 200-char
    prefixes — the tokenizer-free generation eval beside bleu/rouge;
    one clipped-count join per order, macro-averaged P/R."""
    from timeseriesutils_spark.operators.text import chrf_pairs

    return chrf_pairs(
        _paired_docs(spark, sf_dir), "pair", "cand_text", "ref_text",
        max_n=4, beta=2.0, max_chars=200,
    )


def _sql_chrf_pairs():
    from timeseriesutils_spark.operators.text import chrf_pairs_sql

    return chrf_pairs_sql(
        _SQL_PAIRED_DOCS, "pair", "cand_text", "ref_text",
        max_n=4, beta=2.0, max_chars=200,
    )


def q_wer_pairs(spark, sf_dir):
    """Word error rate over aligned doc pairs (operators/text.
    wer_pairs): token-level edit distance via the per-pair token
    codebook (dense-rank codes -> one-char encoding -> native
    levenshtein), over 60-token prefixes; the ASR/MT sibling of
    cer_pairs."""
    from timeseriesutils_spark.operators.text import wer_pairs

    return wer_pairs(
        _paired_docs(spark, sf_dir), "pair", "cand_text", "ref_text",
        max_tokens=60,
    )


def _sql_wer_pairs():
    from timeseriesutils_spark.operators.text import wer_pairs_sql

    return wer_pairs_sql(
        _SQL_PAIRED_DOCS, "pair", "cand_text", "ref_text", max_tokens=60,
    )


QUERIES.update(
    {
        "chrf_pairs": Q(q_chrf_pairs, _sql_chrf_pairs()),
        "wer_pairs": Q(q_wer_pairs, _sql_wer_pairs()),
    }
)


def q_mmd_drift(spark, sf_dir):
    """Quadratic-kernel MMD between the two embedding half-corpora
    (operators/similarity.mmd_quad_drift): the shape-sensitive drift
    test beside embedding_drift's centroid audit — closed-form first/
    second moments (no pairwise), common-denominator integer
    numerators, one double division."""
    from timeseriesutils_spark.operators.similarity import mmd_quad_drift

    emb = _emb(spark, sf_dir)
    d = emb.select(
        ((F.col("vec_id") % 2) + 1).cast("int").alias("half"),
        F.col("embedding"),
    )
    return mmd_quad_drift(d, "embedding", "half", scale=4)


def _sql_mmd_drift():
    from timeseriesutils_spark.operators.similarity import mmd_quad_drift_sql

    d = (
        "SELECT CAST((vec_id % 2) + 1 AS INT) AS half, embedding"
        " FROM embeddings"
    )
    return mmd_quad_drift_sql(d, "embedding", "half", scale=4)


QUERIES.update({"mmd_drift": Q(q_mmd_drift, _sql_mmd_drift())})


def _shared_merge_table(spark, sf_dir):
    """The 8-round merge table feeds BOTH the ``bpe_train`` and
    ``bpe_encode`` queries — train once per process per sf_dir via the
    parquet-checkpoint memo (the matrix_profile shared-build
    pattern)."""
    from timeseriesutils_spark.functions.checkpoint import checkpoint_once
    from timeseriesutils_spark.operators.bpe import bpe_train

    return checkpoint_once(
        f"bpe_train:{sf_dir}",
        lambda: bpe_train(_docs(spark, sf_dir), n_merges=8),
        spark,
    )


def q_bpe_train(spark, sf_dir):
    """Iterative BPE tokenizer training (operators/bpe.bpe_train):
    8 merge rounds over the vocabulary-sized word-frequency frame —
    each round one map-combinable pair aggregation + a one-row argmax
    collect (kmeans bounded-driver-state precedent) + a JVM aggregate
    fold rewrite; emits the merge table a tokenizer ships.  Served
    from the shared checkpointed build (see _shared_merge_table)."""
    return _shared_merge_table(spark, sf_dir)


def _sql_bpe_train():
    from timeseriesutils_spark.operators.bpe import bpe_train_sql

    return bpe_train_sql("documents", n_merges=8)


QUERIES.update({"bpe_train": Q(q_bpe_train, _sql_bpe_train())})


def q_pipeline_incremental(spark, sf_dir):
    """Watermark-bounded incremental corpus assembly
    (operators/corpus_pipeline.incremental_training_corpus): the ingest
    batch (top ~20% of doc ids) processed against the corpus with the
    incremental pairing cuts — untouched MinHash buckets never explode,
    only new-touching pairs emit, rank stages ride the state∪batch
    union — hash-checked against the full recompute filtered past the
    watermark (the equivalence contract IS the oracle)."""
    from timeseriesutils_spark.operators.corpus_pipeline import (
        incremental_training_corpus,
    )

    docs = _docs(spark, sf_dir)
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    wm = int(float(max_id) * 0.8)  # floor, same IEEE product as the twin
    return incremental_training_corpus(docs, wm, **E2E_PARAMS)


def _sql_pipeline_incremental():
    from timeseriesutils_spark.operators.corpus_pipeline import (
        incremental_training_corpus_sql,
    )

    return incremental_training_corpus_sql(
        "documents",
        watermark_sql=(
            "SELECT CAST(FLOOR(CAST(MAX(doc_id) AS DOUBLE) * 0.8) AS BIGINT)"
            " FROM documents"
        ),
        **E2E_PARAMS,
    )


QUERIES.update(
    {"pipeline_incremental": Q(q_pipeline_incremental, _sql_pipeline_incremental())}
)


def q_bpe_encode(spark, sf_dir):
    """Tokenizer ENCODE pass (operators/bpe.bpe_encode): apply the
    8-round trained merge table to every document — per-doc post-merge
    token counts and fertility, the measured (not regex-proxy) version
    of tokenizer_fertility.  Encode cost is paid per DISTINCT word
    (vocabulary-sized), then one word-keyed join back to documents."""
    from timeseriesutils_spark.operators.bpe import bpe_encode

    return bpe_encode(
        _docs(spark, sf_dir), n_merges=8,
        merge_table=_shared_merge_table(spark, sf_dir),
    )


def _sql_bpe_encode():
    from timeseriesutils_spark.operators.bpe import bpe_encode_sql

    return bpe_encode_sql("documents", n_merges=8)


QUERIES.update({"bpe_encode": Q(q_bpe_encode, _sql_bpe_encode())})


def q_kn_trigram(spark, sf_dir):
    """Interpolated Kneser–Ney trigram perplexity scoring
    (operators/text.kn_trigram_logprob): the CCNet-style LM quality
    filter — per-doc mean trigram NLL under the corpus-trained KN
    model (continuation counts, D=3/4), fully relational count tables
    joined back by n-gram key; the smoothing family that separates
    'frequent word in a NEW context' from noise where add-one bigrams
    cannot."""
    from timeseriesutils_spark.operators.text import kn_trigram_logprob

    return kn_trigram_logprob(_docs(spark, sf_dir))


def _sql_kn_trigram():
    from timeseriesutils_spark.operators.text import kn_trigram_logprob_sql

    return kn_trigram_logprob_sql("documents")


QUERIES.update({"kn_trigram_logprob": Q(q_kn_trigram, _sql_kn_trigram())})


def q_nb_classifier(spark, sf_dir):
    """Multinomial Naive Bayes language classifier
    (operators/text.nb_classifier): the TRAINABLE supervised filter the
    catalog's heuristic lang_id is not — Laplace-smoothed word-given-
    class counts, exact-integer 1e-9-grid log scores, engine-
    independent argmax; one word explode + class-count join + a
    broadcast class grid."""
    from timeseriesutils_spark.operators.text import nb_classifier

    return nb_classifier(_docs(spark, sf_dir))


def _sql_nb_classifier():
    from timeseriesutils_spark.operators.text import nb_classifier_sql

    return nb_classifier_sql("documents")


QUERIES.update({"nb_classifier": Q(q_nb_classifier, _sql_nb_classifier())})


def q_quality_logit(spark, sf_dir):
    """IRLS-trained logistic quality classifier
    (operators/logit.quality_logit): the GPT-3-style DISCRIMINATIVE
    corpus filter — 4 IRLS rounds over (intercept, ln words, stopword
    ratio, mean word length), the 4x4 normal-equations solve by the
    generated Cramer expansion both engines share; per-round state is
    four collected scalars (bounded driver state), per-round corpus
    work one map-combinable 14-sum aggregation."""
    from timeseriesutils_spark.operators.logit import quality_logit

    return quality_logit(_docs(spark, sf_dir))


def _sql_quality_logit():
    from timeseriesutils_spark.operators.logit import quality_logit_sql

    return quality_logit_sql("documents")


QUERIES.update({"quality_logit": Q(q_quality_logit, _sql_quality_logit())})


_FT_CLASSES = ("de", "en", "es", "fr", "zh")


def q_fasttext_classifier(spark, sf_dir):
    """fastText-style hashed-subword linear classifier
    (operators/fasttext.fasttext_classifier, Joulin 2016 / Bojanowski
    2017 / Weinberger 2009): per-class salted signed char-bigram hash
    slots, one-vs-rest IRLS on the 4x4 Cramer substrate with ALL
    classes trained per round in ONE 14·C-sum aggregation, argmax
    prediction on the integer probability grid.  Fits on a
    deterministic md5 70% split and scores every document — the
    held-out generalization the word-memorizing nb_classifier cannot
    do (its score collapses to the prior on unseen vocabulary)."""
    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.operators.fasttext import fasttext_classifier

    split = portable_hash64(F.col("_id").cast("string")) % 10 < 7
    return fasttext_classifier(
        _docs(spark, sf_dir),
        classes=_FT_CLASSES,
        n_rounds=3,
        fit_filter=split,
    )


def _sql_fasttext_classifier():
    from timeseriesutils_spark.operators.dedup import portable_hash64_sql
    from timeseriesutils_spark.operators.fasttext import (
        fasttext_classifier_sql,
    )

    split = f"{portable_hash64_sql('CAST(_id AS VARCHAR)')} % 10 < 7"
    return fasttext_classifier_sql(
        "documents", classes=_FT_CLASSES, n_rounds=3, fit_where=split
    )


QUERIES.update(
    {"fasttext_classifier": Q(q_fasttext_classifier, _sql_fasttext_classifier())}
)


def q_dup_span_exact_audit(spark, sf_dir):
    """Exact longest-duplicated-span recall audit for dup_spans
    (operators/dupspan.dup_span_exact_audit, Lee et al. 2021
    ExactSubstr): per top candidate pair, the TRUE longest common
    word-span >= 4 (diagonal-island exact form) next to what the
    production 8-word-window hashing can see — quantifying the [4, 8)
    blind window, the minhash_estimate_audit pattern applied to the
    span family.  Posting-capped candidates + top-K pairs bound every
    quadratic stage."""
    from timeseriesutils_spark.operators.dupspan import dup_span_exact_audit

    return dup_span_exact_audit(_docs(spark, sf_dir))


def _sql_dup_span_exact_audit():
    from timeseriesutils_spark.operators.dupspan import (
        dup_span_exact_audit_sql,
    )

    return dup_span_exact_audit_sql("documents")


QUERIES.update(
    {
        "dup_span_exact_audit": Q(
            q_dup_span_exact_audit, _sql_dup_span_exact_audit()
        )
    }
)


def q_cluster_sample(spark, sf_dir):
    """Cluster-balanced data pruning over the embedding space
    (operators/kmeans.cluster_balanced_sample; Sorscher 2022
    prototypicality rule, SemDeDup-style cluster curation): Lloyd
    k-means then keep the 16 FARTHEST-from-centroid vectors per
    cluster (mode='hard' — the large-dataset pruning rule), exact
    integer distances, total tiebreaks.  Every semantic region
    contributes equally to the subset regardless of its mass."""
    from timeseriesutils_spark.operators.kmeans import (
        cluster_balanced_sample,
    )

    return cluster_balanced_sample(
        _emb(spark, sf_dir), per_cluster=16, mode="hard", **KMEANS_PARAMS
    )


def _sql_cluster_sample():
    from timeseriesutils_spark.operators.kmeans import (
        cluster_balanced_sample_sql,
    )

    return cluster_balanced_sample_sql(
        per_cluster=16, mode="hard", **KMEANS_PARAMS
    )


QUERIES.update({"cluster_sample": Q(q_cluster_sample, _sql_cluster_sample())})


def q_unimax_mixture(spark, sf_dir):
    """UniMax training-mixture allocation across languages
    (operators/splits.unimax_mixture, Chung et al. 2023): token budget
    3x the corpus under a 4-epoch cap — low-resource languages take
    their full epochs, high-resource ones split the remaining budget
    at the water level.  The paper's sequential greedy collapsed to a
    closed form: one rank window + prefix sums + one partition-wide
    conditional aggregate, exact integers throughout; the corpus-sized
    work is a single map-combinable token count."""
    from timeseriesutils_spark.operators.splits import unimax_mixture

    return unimax_mixture(_docs(spark, sf_dir))


def _sql_unimax_mixture():
    from timeseriesutils_spark.operators.splits import unimax_mixture_sql

    return unimax_mixture_sql("documents")


QUERIES.update({"unimax_mixture": Q(q_unimax_mixture, _sql_unimax_mixture())})
