"""Deduplication operators for large-scale text pipelines.

Four tiers, trading recall for cost (all distributed, no driver loops):

  * exact        — hash-groupBy on the full text (relational.dedup_exact
                   or min-id per text).
  * ngram_jaccard— exact n-gram Jaccard similarity join: explode distinct
                   shingles, self-join on shingle, count intersections,
                   |A∩B| / (|A|+|B|−|A∩B|).  Exact but O(pairs sharing a
                   shingle); right for small/medium corpora or as the
                   verify stage after LSH candidate generation.
  * minhash_lsh  — MinHash signatures (xxhash64 with k seeds) banded into
                   buckets; candidate pairs = same (band, band-hash); then
                   exact-Jaccard verification of candidates only.  The
                   100 TB path: cost ~ |docs|·k plus the (tiny) candidate
                   join; never materializes all pairs.
  * simhash      — 64-bit SimHash fingerprint per doc (sign of weighted
                   bit sums); near-dups = small Hamming distance, found by
                   joining on rotated prefix blocks.

Everything uses built-in expressions (xxhash64, transform, aggregate) —
no Python UDFs — so signatures stay inside codegen and shuffle only on
(shingle) / (band, hash) keys.
"""

from __future__ import annotations

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


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All pairs (a < b) with n-gram Jaccard ≥ threshold. Exact."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("sh"),
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


def minhash_signature(sh_col, num_hashes: int = 32):
    """MinHash signature: per seed i, min over shingles of
    xxhash64(shingle, i).  Pure expressions; array<bigint> result."""
    return F.array(
        *[F.array_min(F.transform(sh_col, lambda s: F.xxhash64(s, F.lit(i)))) for i in range(num_hashes)]
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
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("sh"),
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


def simhash64(text_col, n: int = 2):
    """64-bit SimHash over word n-gram shingles, as bigint.

    bit b of the fingerprint = majority vote of bit b across shingle
    xxhash64 values.  aggregate() folds per-bit counts JVM-side.
    """
    hashes = F.transform(F.array_distinct(shingles(text_col, n)), lambda s: F.xxhash64(s))
    # single aggregate pass: accumulator = 64 per-bit net votes
    # (+1 if bit set else −1 per shingle); bit positions unrolled
    # Python-side (shiftright takes a literal count)
    zero = F.array_repeat(F.lit(0), 64)

    def merge(acc, h):
        bits = F.array(
            *[
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                for b in range(64)
            ]
        )
        return F.zip_with(acc, bits, lambda a, x: a + x)

    votes = F.aggregate(hashes, zero, merge)
    out = F.lit(0).cast("bigint")
    for b in range(64):
        # bit 63 in a signed bigint is −2^63
        bit_val = (1 << b) if b < 63 else -(1 << 63)
        out = out + F.when(
            F.element_at(votes, b + 1) > 0, F.lit(bit_val).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return out


def dedup_near_keep_min(pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Greedy near-dup removal: drop any doc that matched a lower id.

    (Connected-component dedup would need iterative label propagation;
    the drop-the-larger-id rule is the standard single-pass policy.)
    """
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, on=id_col, how="left_anti")
