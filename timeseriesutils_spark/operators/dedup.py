"""Deduplication operators for large-scale text pipelines.

Four tiers, trading recall for cost (all distributed, no driver loops):

  * exact        — hash-groupBy on the full text (relational.dedup_exact
                   or min-id per text).
  * ngram_jaccard— exact n-gram Jaccard similarity join: explode distinct
                   shingles, self-join on shingle, count intersections,
                   |A∩B| / (|A|+|B|−|A∩B|).  Exact but O(pairs sharing a
                   shingle); right for small/medium corpora or as the
                   verify stage after LSH candidate generation.
  * minhash_lsh  — MinHash signatures banded into buckets; candidate
                   pairs = same (band, band-hash); then exact-Jaccard
                   verification of candidates only.  The 100 TB path:
                   cost ~ |docs|·k plus the (tiny) candidate join; never
                   materializes all pairs.
  * simhash      — 64-bit SimHash fingerprint per doc (majority vote of
                   shingle-hash bits); near-dups = small Hamming distance.

Shuffle-size design: shingle *strings* are hashed to int64
(``xxhash64``) immediately after extraction, and every downstream
exchange (the Jaccard self-join, the LSH candidate join, the verify
arrays) moves 8-byte ints instead of ~25-byte strings — same results up
to 64-bit hash collisions (birthday bound ~1e-7 at 10⁶ distinct
shingles).  MinHash seeds re-hash the int (one string hash total instead
of k).  Everything except the SimHash bit-vote is built-in expressions;
the bit-vote is a vectorized Arrow pandas UDF (the expression form needs
a 64-wide array op per shingle — measured 10× slower than the UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shingles(text_col, n: int = 3):
    """Word n-gram shingles as an array column (lowercased, whitespace
    tokenized).  transform over a sequence keeps it JVM-side."""
    words = F.split(F.lower(F.trim(text_col)), r"\s+")
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def hashed_shingles(text_col, n: int = 3):
    """Distinct shingles as int64 xxhash64 values — the compact form every
    dedup join operates on."""
    return F.transform(
        F.array_distinct(shingles(text_col, n)), lambda s: F.xxhash64(s)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All pairs (a < b) with n-gram Jaccard ≥ threshold.  Exact (modulo
    64-bit shingle-hash collisions)."""
    sh = docs.select(
        F.col(id_col).alias("id"), hashed_shingles(F.col(text_col), n).alias("sh")
    )
    sized = sh.select("id", F.explode("sh").alias("s"), F.size("sh").alias("sz"))
    inter = (
        sized.alias("a")
        .join(sized.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(hsh_col, num_hashes: int = 32):
    """MinHash signature from hashed shingles: per seed i, min over
    shingles of xxhash64(h, i).  Pure expressions; array<bigint>."""
    return F.array(
        *[
            F.array_min(F.transform(hsh_col, lambda h: F.xxhash64(h, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    bands=8 × rows=4 over 32 hashes → candidate threshold s ≈ (1/8)^(1/4)
    ≈ 0.6; verification filters to true Jaccard ≥ threshold, so the band
    stage only needs high recall above it.
    """
    rows_per_band = num_hashes // bands
    base = docs.select(
        F.col(id_col).alias("id"), hashed_shingles(F.col(text_col), n).alias("sh")
    ).withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    banded = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", "bb.band", "bb.bucket")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _simhash_from_hashes_impl(hashes: pd.Series) -> pd.Series:
    out = np.zeros(len(hashes), dtype=np.int64)
    for i, arr in enumerate(hashes):
        a = np.asarray(arr, dtype=np.int64)
        if a.size == 0:
            continue
        # (n, 64) bit matrix via little-endian byte unpack
        bits = np.unpackbits(
            a.view(np.uint8).reshape(a.size, 8), axis=1, bitorder="little"
        )
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - a.size
        fp_bits = (votes > 0).astype(np.uint8)
        out[i] = np.packbits(fp_bits, bitorder="little").view(np.int64)[0]
    return pd.Series(out)


_simhash_udf_cache = None


def _simhash_udf():
    # pandas_udf needs an active SparkSession; build once, on first use
    global _simhash_udf_cache
    if _simhash_udf_cache is None:
        _simhash_udf_cache = F.pandas_udf(_simhash_from_hashes_impl, "bigint")
    return _simhash_udf_cache


def simhash64(text_col, n: int = 2):
    """64-bit SimHash over word n-gram shingles, as bigint.

    bit b = majority vote of bit b across shingle xxhash64 values.
    Shingle hashing stays JVM-side; the 64-way bit vote runs in one
    Arrow-vectorized pandas UDF call per batch.
    """
    return _simhash_udf()(hashed_shingles(text_col, n))


def dedup_near_keep_min(pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Greedy near-dup removal: drop any doc that matched a lower id.

    (Connected-component dedup would need iterative label propagation;
    the drop-the-larger-id rule is the standard single-pass policy.)
    """
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, on=id_col, how="left_anti")
