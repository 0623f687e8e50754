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

Cache policy: operators persist at plan forks (posting lists, the
LSH verify join, CC iteration state) so a fork never re-tokenizes the
corpus; intermediates consumed within one call are unpersisted there,
but the fork a RETURNED plan still reads stays cached — the caller owns
eviction, because unpersisting before the caller materializes would
silently recompute the whole upstream pipeline.  Caller-owned persists
route through ``functions/cache.pin``, so the ownership is an explicit
API: wrap a query in ``functions.cache.cache_scope()`` (or call
``release_all()``) and no net cached blocks survive — gentler than
``spark.catalog.clearCache()``, which also evicts the user's frames.

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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.cache import pin


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


# Mersenne prime 2^31−1: the modulus for portable MinHash permutations.
# Affine maps h ↦ (a·h + b) mod P31 stay < 2^62 before reduction, so the
# arithmetic is exact int64 in Spark, DuckDB, and numpy alike.
P31 = 2_147_483_647


def portable_hash64(col):
    """Engine-portable 60-bit hash: integer value of the first 15 hex
    chars of md5(col).  md5 is bit-identical everywhere (Spark, DuckDB,
    Python hashlib), unlike xxhash64 whose seeding is Spark-specific;
    15 hex chars keep the value positive in a signed int64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB twin of :func:`portable_hash64`."""
    return f"CAST(CONCAT('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_perms(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Seeded affine permutation constants (a_i, b_i) over GF(P31) —
    driver-side literals shared by the Spark plan and the SQL twin."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, P31, num_hashes)
    b = rng.integers(0, P31, num_hashes)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def hashed_shingle_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id, sh) frame of hashed distinct shingles — the entry point every
    dedup op shares.

    Two projection steps on purpose: the tokenization (``split``) lands in
    its own select so the regex runs ONCE per row; inlining it into the
    shingle ``transform`` re-evaluates the split per shingle position
    (measured 6× slower at sf0.1).

    ``hash_mode``: ``'xxhash64'`` (default — fastest, Spark-specific) or
    ``'md5'`` (:func:`portable_hash64` — engine-portable, what the
    hash-green MinHash oracle requires).
    """
    hash_fn = F.xxhash64 if hash_mode == "xxhash64" else portable_hash64
    w = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_w"),
    )
    wc = F.col("_w")
    sh = F.when(
        F.size(wc) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(wc) - n),
            lambda i: F.concat_ws(" ", F.slice(wc, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", wc)))
    return w.select(
        "id", F.transform(F.array_distinct(sh), lambda s: hash_fn(s)).alias("sh")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with n-gram Jaccard ≥ threshold.  Exact (modulo
    64-bit shingle-hash collisions) when ``max_posting`` is None.

    Posting-list formulation, not a self-join: group by shingle →
    collect the (id, sz) posting list → emit the C(k,2) id pairs with a
    nested array ``transform`` → count per pair.  One scan of the corpus
    and two narrow shuffles (by shingle, by pair); no sort-merge join,
    no double evaluation of the shingle pipeline (measured 1.75× faster
    than the equivalent self-join at sf0.1).  At 100 TB the O(k²)
    per-shingle pair blowup is bounded by stop-shingle filtering
    (max_posting): a shingle shared by thousands of docs carries no
    near-dup signal and only inflates the pair shuffle.
    """
    sh = hashed_shingle_docs(docs, id_col, text_col, n)
    # one evaluation of the shingle pipeline feeds BOTH the posting lists
    # and the per-doc set sizes (the plan forks below this node; without
    # the persist Spark would re-tokenize the corpus per branch)
    sized = pin(sh.select("id", F.size("sh").alias("sz"), F.explode("sh").alias("s")))
    posting = (
        sized.groupBy("s")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_posting is not None:
        posting = posting.filter(F.size("ids") <= max_posting)
    # pair rows carry ONLY (id_a, id_b) — 16 bytes into the pair shuffle;
    # set sizes rejoin after aggregation (|docs| rows, broadcast)
    pairs = posting.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x: F.transform(
                        F.filter(F.col("ids"), lambda y: y > x),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    inter = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    sizes = sized.select("id", "sz").dropDuplicates(["id"])
    scored = inter.join(
        F.broadcast(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))),
        "id_a",
    ).join(
        F.broadcast(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))),
        "id_b",
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        scored.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(hsh_col, num_hashes: int = 32, perms=None):
    """MinHash signature from hashed shingles.  Pure expressions;
    array<bigint>.

    Default: per seed i, min over shingles of xxhash64(h, i) — fast,
    Spark-only.  With ``perms`` (from :func:`minhash_perms`): min of the
    affine map (a_i·(h mod P31) + b_i) mod P31 — exact int64 arithmetic
    any engine reproduces, the portable mode behind the hash-green
    MinHash oracle."""
    if perms is None:
        return F.array(
            *[
                F.array_min(F.transform(hsh_col, lambda h: F.xxhash64(h, F.lit(i))))
                for i in range(num_hashes)
            ]
        )
    def affine_min(a: int, b: int):
        return F.array_min(
            F.transform(hsh_col, lambda h: (F.lit(a) * (h % P31) + F.lit(b)) % P31)
        )

    return F.array(*[affine_min(a, b) for a, b in perms])


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    hash_mode: str = "xxhash64",
    seed: int = 42,
    new_flags: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    ``new_flags`` (optional, a frame of NEW ``id_col`` values) switches
    on the watermark-bounded incremental cuts: only band buckets
    touching a new doc explode, and only new-touching pairs are
    emitted — output == the full run's pairs restricted to pairs with
    at least one new side (the incremental_jaccard_pairs contract,
    applied to banding; equivalence pinned in tests).

    bands=8 × rows=4 over 32 hashes → candidate threshold s ≈ (1/8)^(1/4)
    ≈ 0.6; verification filters to true Jaccard ≥ threshold, so the band
    stage only needs high recall above it.

    ``hash_mode='md5'`` swaps every hash for an engine-portable one
    (md5-based shingle hash, seeded affine permutations over GF(P31),
    md5 band buckets) so the DuckDB twin
    (:func:`minhash_lsh_pairs_sql`) reproduces the exact candidate set —
    the hash-green declared mode.  Default xxhash64 is the faster
    production path (one JVM hash vs an md5 per shingle).
    """
    rows_per_band = num_hashes // bands
    portable = hash_mode == "md5"
    # the shingle frame feeds banding AND both sides of the verify join —
    # persist the fork so the corpus is tokenized once, not three times
    sh = pin(hashed_shingle_docs(docs, id_col, text_col, n, hash_mode))

    # candidate generation over (id, band, bucket) ONLY — 24 bytes/row.
    # The shingle arrays never enter the banding shuffle; they're fetched
    # once per *surviving* candidate id in the verify join below.
    if portable:
        # signature minima as EXPLODED codegen aggregates, not array
        # transforms: higher-order-function lambdas are interpreted per
        # element, and k·|shingles| affine maps through the interpreter
        # measured ~8× slower than the same arithmetic in whole-stage
        # codegen over an exploded frame.  The extra exchange (groupBy
        # id) carries k·8-byte minima per doc — the banding rows the
        # plan needs anyway.
        perms = minhash_perms(num_hashes, seed)
        hm = F.col("_h") % P31
        sig = (
            sh.select("id", F.explode("sh").alias("_h"))
            .groupBy("id")
            .agg(
                *[
                    F.min((F.lit(a) * hm + F.lit(b)) % P31).alias(f"_m{i}")
                    for i, (a, b) in enumerate(perms)
                ]
            )
        )

        def band_bucket(b: int):
            cols = [
                F.col(f"_m{i}").cast("string")
                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
            ]
            return portable_hash64(F.concat_ws(":", *cols))

        base = sig
    else:
        base = sh.withColumn("sig", minhash_signature(F.col("sh"), num_hashes))

        def band_bucket(b: int):
            cols = [
                F.col("sig")[i]
                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
            ]
            return F.xxhash64(*cols)

    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), band_bucket(b).alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    if new_flags is None:
        bucketed = (
            banded.groupBy("band", "bucket")
            .agg(F.collect_list("id").alias("ids"))
            .filter(F.size("ids") > 1)
        )
        cand = (
            bucketed.select(
                F.explode(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda x: F.transform(
                                F.filter(F.col("ids"), lambda y: y > x),
                                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                            ),
                        )
                    )
                ).alias("p")
            )
            .select("p.*")
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        # watermark-bounded variant (the incremental_jaccard_pairs cuts
        # applied to banding): buckets with no NEW member are dropped
        # before any pair forms — an untouched bucket cannot produce a
        # new-touching candidate — and within a surviving bucket only
        # pairs with a new side are emitted (old x old candidates were
        # this bucket's output in earlier batches).
        flags = new_flags.select(
            F.col(id_col).alias("id"), F.lit(1).alias("_nw")
        ).distinct()
        nbanded = banded.join(flags, "id", "left").select(
            "id", "band", "bucket", F.coalesce("_nw", F.lit(0)).alias("_nw")
        )
        bucketed = (
            nbanded.groupBy("band", "bucket")
            .agg(
                F.collect_list(F.struct(F.col("id"), F.col("_nw"))).alias("ids")
            )
            .filter(F.size("ids") > 1)
            .filter(F.exists("ids", lambda x: x["_nw"] == 1))
        )
        cand = (
            bucketed.select(
                F.explode(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda x: F.transform(
                                F.filter(
                                    F.col("ids"),
                                    lambda y: (y["id"] > x["id"])
                                    & ((x["_nw"] == 1) | (y["_nw"] == 1)),
                                ),
                                lambda y: F.struct(
                                    x["id"].alias("id_a"),
                                    y["id"].alias("id_b"),
                                ),
                            ),
                        )
                    )
                ).alias("p")
            )
            .select("p.*")
            .dropDuplicates(["id_a", "id_b"])
        )
    verify = cand.join(
        sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        verify.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    seed: int = 42,
) -> str:
    """DuckDB twin of ``minhash_lsh_pairs(hash_mode='md5')`` — the full
    LSH pipeline in one generated SQL: the same md5-based shingle
    hashes, the same seeded affine permutation minima, the same md5 band
    buckets, so candidate pairs (not just the verified Jaccard) match
    the Spark plan exactly."""
    rows_per_band = num_hashes // bands
    perms = minhash_perms(num_hashes, seed)
    h60 = portable_hash64_sql("s")
    mins = ",\n    ".join(
        f"MIN(({a} * (h % {P31}) + {b}) % {P31}) AS m{i}"
        for i, (a, b) in enumerate(perms)
    )
    band_selects = []
    for b in range(bands):
        ms = ", ".join(f"m{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band))
        bucket = portable_hash64_sql(f"CONCAT_WS(':', {ms})")
        band_selects.append(
            f"SELECT {id_col}, {b} AS band, {bucket} AS bucket FROM sig"
        )
    bands_sql = "\n  UNION ALL\n  ".join(band_selects)
    return f"""
WITH words AS (
  SELECT {id_col}, string_split_regex(lower(trim(text)), '\\s+') AS w FROM {table}
),
sg AS (
  SELECT {id_col},
    list_distinct(CASE WHEN len(w) >= {n}
      THEN [array_to_string(w[i:i+{n - 1}], ' ') FOR i IN range(1, len(w) - {n - 2})]
      ELSE [array_to_string(w, ' ')] END) AS sgl
  FROM words
),
ex AS (
  SELECT {id_col}, len(sgl) AS sz, {h60} AS h
  FROM (SELECT {id_col}, sgl, unnest(sgl) AS s FROM sg)
),
sig AS (
  SELECT {id_col},
    {mins}
  FROM ex GROUP BY {id_col}
),
bands AS (
  {bands_sql}
),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.{id_col} < b.{id_col}
),
inter AS (
  SELECT c.id_a, c.id_b, ea.sz AS sz_a, eb.sz AS sz_b, COUNT(*) AS i
  FROM cand c
  JOIN ex ea ON ea.{id_col} = c.id_a
  JOIN ex eb ON eb.{id_col} = c.id_b AND ea.h = eb.h
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, CAST(i AS DOUBLE) / (sz_a + sz_b - i) AS jaccard
FROM inter WHERE CAST(i AS DOUBLE) / (sz_a + sz_b - i) >= {threshold}
"""


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


def simhash_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """(id, simhash) fingerprints via the fast two-step shingle path."""
    sh = hashed_shingle_docs(docs, id_col, text_col, n)
    return sh.select(
        F.col("id").alias(id_col), _simhash_udf()(F.col("sh")).alias("simhash")
    )


def simhash_docs_portable(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2,
    engine: str = "sql",
) -> DataFrame:
    """(id, sig_hi, sig_lo) 64-bit SimHash in the engine-portable mode.

    Per distinct shingle, 64 bits come from the md5 hex digest (chars
    1–8 → ``lo`` bits 0–31, chars 9–16 → ``hi`` bits 32–63); per bit, a
    ±1 vote sum over the doc's shingles; signature bit = vote > 0.  The
    signature is emitted as two 32-bit halves — a single int64 would
    need a ``1<<63`` sign-bit pack that DuckDB rejects as overflow — and
    Hamming distance is ``bit_count(hi XOR hi') + bit_count(lo XOR
    lo')`` either way.  Everything is built-in expressions (explode →
    two conv(md5) ints → 64 SUM aggregates → pack), one exchange on id;
    the DuckDB twin (:func:`simhash_docs_portable_sql`) computes the
    identical integers, making the fingerprint hash-checkable.  The
    xxhash64 Arrow-UDF path (:func:`simhash_docs`) stays the fast
    production default (one hash per shingle vs an md5).

    Tokenization is split from shingling (same two-step rationale as
    :func:`hashed_shingle_docs`: inlining the regex split into the
    shingle transform re-runs it per shingle position — measured 6×).
    """
    wd = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_w"),
    )
    wc = F.col("_w")
    sh = F.when(
        F.size(wc) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(wc) - n),
            lambda i: F.concat_ws(" ", F.slice(wc, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", wc)))
    w = wd.select("id", F.explode(F.array_distinct(sh)).alias("_s"))
    h = F.md5(F.col("_s"))
    e = w.select(
        "id",
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint").alias("_lo"),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint").alias("_hi"),
    )
    if engine == "sql":
        # round-14 (guide §7.3, the fasttext/ets precedent): the 64
        # vote aggregates + two 32-term packs render as SQL text — a
        # handful of py4j round trips instead of ~900 Column calls;
        # all-integer arithmetic, so the parsed tree computes the
        # identical values (pinned vs engine="colapi").
        votes_t = [
            f"SUM(CASE WHEN (shiftright({'_lo' if b < 32 else '_hi'}, "
            f"{b % 32}) & 1) = 1 THEN 1 ELSE -1 END) AS _v{b}"
            for b in range(64)
        ]
        agg = e.groupBy("id").agg(
            F.expr(votes_t[0]), *[F.expr(t) for t in votes_t[1:]]
        )

        def pack_t(lo_bit: int) -> str:
            return " + ".join(
                ["CAST(0 AS BIGINT)"]
                + [
                    f"(CASE WHEN _v{lo_bit + b} > 0 THEN "
                    f"shiftleft(CAST(1 AS BIGINT), {b}) ELSE 0 END)"
                    for b in range(32)
                ]
            )

        return agg.selectExpr(
            f"id AS {id_col}",
            f"{pack_t(32)} AS sig_hi",
            f"{pack_t(0)} AS sig_lo",
        )

    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_lo" if b < 32 else "_hi"), b % 32).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(64)
    ]
    agg = e.groupBy("id").agg(*votes)

    def pack(lo_bit: int) -> F.Column:
        acc = F.lit(0).cast("bigint")
        for b in range(32):
            acc = acc + F.when(
                F.col(f"_v{lo_bit + b}") > 0,
                F.shiftleft(F.lit(1).cast("bigint"), b),
            ).otherwise(0)
        return acc

    return agg.select(
        F.col("id").alias(id_col), pack(32).alias("sig_hi"), pack(0).alias("sig_lo")
    )


def simhash_docs_portable_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> str:
    """DuckDB twin of :func:`simhash_docs_portable`."""
    votes = ",\n    ".join(
        "SUM(CASE WHEN ({col} >> {sh}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}".format(
            col="lo" if b < 32 else "hi", sh=b % 32, b=b
        )
        for b in range(64)
    )

    def pack(lo_bit: int) -> str:
        return " + ".join(
            f"(CASE WHEN v{lo_bit + b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END)"
            for b in range(32)
        )

    return f"""
WITH words AS (
  SELECT {id_col}, string_split_regex(lower(trim({text_col})), '\\s+') AS w FROM {table}
),
sg AS (
  SELECT {id_col},
    list_distinct(CASE WHEN len(w) >= {n}
      THEN [array_to_string(w[i:i+{n - 1}], ' ') FOR i IN range(1, len(w) - {n - 2})]
      ELSE [array_to_string(w, ' ')] END) AS sgl
  FROM words
),
e AS (
  SELECT {id_col},
    CAST(CONCAT('0x', substring(md5(s), 1, 8)) AS BIGINT) AS lo,
    CAST(CONCAT('0x', substring(md5(s), 9, 8)) AS BIGINT) AS hi
  FROM (SELECT {id_col}, unnest(sgl) AS s FROM sg)
),
v AS (
  SELECT {id_col},
    {votes}
  FROM e GROUP BY {id_col}
)
SELECT {id_col},
  CAST({pack(32)} AS BIGINT) AS sig_hi,
  CAST({pack(0)} AS BIGINT) AS sig_lo
FROM v
"""


def connected_components(
    pairs: DataFrame, max_iter: int = 25, driver_threshold: int = 5_000_000
) -> DataFrame:
    """Transitive near-dup clustering: (id, comp) where comp = min doc id
    reachable through the similarity-pair graph.

    Pairwise drop-the-larger-id (dedup_near_keep_min) under-merges chains
    (A~B, B~C but A≁C keeps A and C even though they are transitively
    "the same" document family); component labels give the exact cluster.

    Hybrid execution, same deterministic result either way:
      * the candidate-pair graph is orders of magnitude smaller than the
        corpus (only docs with a near-dup appear), so up to
        ``driver_threshold`` edges it is collected and solved with
        union-find on the driver — one job, no iteration;
      * beyond that, alternating large-star / small-star rounds (the
        MapReduce-CC formulation of Kiveris et al., "Connected Components
        in MapReduce and Beyond", SoCC'14): each round contracts the
        graph toward per-component stars and converges in O(log n)
        rounds REGARDLESS of graph diameter — a 10⁶-long chain resolves
        in ~20 rounds where plain min-label propagation needs 10⁶
        (pinned by tests/test_llm_ops.py chain-graph test).  Each round
        is two narrow (node-keyed) shuffles; the driver only sees a
        1-row convergence probe per round.
    """
    # persist: the pair pipeline upstream (shingle/jaccard) must run once,
    # not once for the size probe and again for collect/propagation
    edges = pin(pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ))
    n_edges = edges.count()
    id_type = pairs.schema["id_a"].dataType.simpleString()
    if n_edges <= driver_threshold:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        rows = edges.collect()
        for r in rows:
            a, b = r["u"], r["v"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min: smaller root wins → comp = min reachable id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = [(x, find(x)) for x in parent]
        edges.unpersist()
        return pairs.sparkSession.createDataFrame(
            out, f"id {id_type}, comp {id_type}"
        )

    def _sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    # Invariant between rounds: `e` is the undirected edge set stored once
    # per direction, no self-loops, distinct.  Each round ends in an EAGER
    # localCheckpoint: iterative DataFrame algorithms grow their logical
    # plan per round (union+distinct+exceptAll stack on the previous
    # round's plan) until Catalyst itself OOMs — checkpointing truncates
    # the lineage to the materialized edge set, so every round starts
    # from a flat scan.  (localCheckpoint = executor-local blocks: no
    # lineage-based fault recovery mid-algorithm; a lost executor costs a
    # rerun of the op.  Deliberately NOT the round-13 parquet tier:
    # large-star/small-star checkpoints THREE frames per round — the
    # highest checkpoint frequency in the repo — and the r13 A/B
    # measured +1.3 s per CC consumer at sf0.1 (canonical_pick 1.9 →
    # 3.3); the durable swap is one line via functions/checkpoint.py
    # where an hours-long 100 TB component build wants it.)
    e = (
        _sym(edges)
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # LARGE-STAR: per node u, m = min(u, neighbors); every neighbor
        # v > u re-attaches to m.  Keeps (u,m) too so u stays connected.
        mins = (
            e.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("u", "_mn").alias("m"))
        )
        ls = (
            e.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u"), F.col("m").alias("v")))
        )
        ls = (
            _sym(ls)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # SMALL-STAR: orient edges large→small (v < u); per node u,
        # m = min neighbor; all small neighbors AND u itself attach to m.
        d = ls.filter(F.col("v") < F.col("u"))
        mins2 = d.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            d.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins2.select(F.col("u"), F.col("m").alias("v")))
        )
        new = (
            _sym(ss)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # symmetric-difference probe: a one-sided subset check could stop
        # a round early while the edge set is still shrinking
        changed = (
            new.exceptAll(e).limit(1).count() or e.exceptAll(new).limit(1).count()
        )
        e = new
        if changed == 0:
            break
    # converged: every node's neighborhood contains its component min
    labels = (
        e.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select(F.col("u").alias("id"), F.least("u", "_mn").alias("comp"))
    )
    edges.unpersist()
    return labels


def ngram_jaccard_against(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int | None = None,
    pre_shingled: bool = False,
) -> DataFrame:
    """Cross-corpus contamination pairs: (corpus id_a, reference id_b,
    jaccard ≥ threshold) — the train-vs-eval overlap check (benchmark
    decontamination).  Unlike :func:`ngram_jaccard_pairs` this never
    pairs documents within one corpus: candidates come from an equi-join
    of the two shingle postings, so cost is Σ_s |A_s|·|B_s| — bounded by
    the (usually tiny) reference side, plus ``max_posting`` dropping
    corpus-side stop-shingles.  All joins move 8-byte shingle hashes.

    ``pre_shingled``: both inputs are already ``(id, sh)`` frames from
    :func:`hashed_shingle_docs` — the split-once path when corpus and
    reference are filters of ONE table (shingling is the dominant
    per-row cost; computing it per side doubles the scan work).
    """
    if pre_shingled:
        sa, sb = corpus, reference
    else:
        sa = hashed_shingle_docs(corpus, id_col, text_col, n)
        sb = hashed_shingle_docs(reference, id_col, text_col, n)
    ea = sa.select(
        F.col("id").alias("id_a"), F.size("sh").alias("sz_a"), F.explode("sh").alias("s")
    )
    if max_posting is not None:
        # the hot-shingle scan forks the plan (posting count + anti-join
        # probe both consume ea) — persist so the shingle pipeline runs
        # once, not per branch (cache policy: module docstring)
        ea = pin(ea)
        hot = (
            ea.groupBy("s")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > max_posting)
            .select("s")
        )
        ea = ea.join(hot, "s", "left_anti")
    eb = sb.select(
        F.col("id").alias("id_b"), F.size("sh").alias("sz_b"), F.explode("sh").alias("s")
    )
    inter = (
        ea.join(eb, "s")
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return inter.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def decontaminate(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int | None = None,
) -> DataFrame:
    """Drop every corpus document that near-matches ANY reference
    document (train-set minus eval-set, the decontamination pass)."""
    flagged = ngram_jaccard_against(
        corpus, reference, id_col, text_col, n, threshold, max_posting
    ).select(F.col("id_a").alias(id_col)).distinct()
    return corpus.join(flagged, on=id_col, how="left_anti")


def dedup_near_keep_min(pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Greedy near-dup removal: drop any doc that matched a lower id.

    (Connected-component dedup would need iterative label propagation;
    the drop-the-larger-id rule is the standard single-pass policy.)
    """
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, on=id_col, how="left_anti")


def fuzzy_pairs(
    records: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
    block_suffix_len: int = 2,
) -> DataFrame:
    """Blocked fuzzy record linkage: pairs of records whose names are
    within ``max_dist`` Levenshtein edits, candidates generated by exact
    equality on (length, all-but-last-``block_suffix_len`` chars) — the
    entity-resolution primitive for short identifier-like strings.

    The blocking key bounds candidate generation: cost is Σ_b C(|b|,2)
    over blocks, never an all-pairs cross join; a hot block is a skewed
    join key, which AQE splits.  The candidate contract (names may
    differ only in their last ``block_suffix_len`` characters) is part
    of the operator's semantics — recall beyond that needs a second
    blocking pass on a different key (standard multi-pass blocking),
    not a bigger block.  Levenshtein is exact integer — deterministic
    in any engine.  Output: (id_a, id_b, name_a, name_b, dist),
    id_a < id_b.
    """
    n = F.length(name_col)
    key = F.struct(
        n.alias("len"),
        F.col(name_col).substr(F.lit(1), (n - block_suffix_len).cast("int")).alias("stem"),
    )
    a = records.select(
        F.col(id_col).alias("id_a"), F.col(name_col).alias("name_a"), key.alias("_k")
    )
    b = records.select(
        F.col(id_col).alias("id_b"), F.col(name_col).alias("name_b"), key.alias("_k")
    )
    pairs = (
        a.join(b, "_k")
        .filter(F.col("id_a") < F.col("id_b"))
        # bounded levenshtein: early-exits once the running distance
        # exceeds max_dist (returns -1) — most candidate pairs are
        # non-matches, so the bound does the bulk of the work-saving;
        # distances actually emitted (0..max_dist) are exact, so the
        # unbounded oracle still hash-matches
        .withColumn("dist", F.levenshtein("name_a", "name_b", max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )
    return pairs.select("id_a", "id_b", "name_a", "name_b", "dist")


def fuzzy_pairs_sql(
    table: str,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
    block_suffix_len: int = 2,
) -> str:
    """DuckDB twin of :func:`fuzzy_pairs`."""
    stem = f"substr({name_col}, 1, CAST(LENGTH({name_col}) - {block_suffix_len} AS INT))"
    return f"""
WITH k AS (
  SELECT {id_col} AS rid, {name_col} AS nm,
    LENGTH({name_col}) AS _len, {stem} AS _stem
  FROM {table}
)
SELECT a.rid AS id_a, b.rid AS id_b, a.nm AS name_a, b.nm AS name_b,
  CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
FROM k a JOIN k b ON a._len = b._len AND a._stem = b._stem AND a.rid < b.rid
WHERE levenshtein(a.nm, b.nm) <= {max_dist}
"""


def incremental_jaccard_pairs(
    docs: DataFrame,
    new_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int | None = None,
) -> DataFrame:
    """Watermark-bounded near-dup detection: all n-gram-Jaccard pairs
    (a < b, ≥ threshold) where at least one side is NEW (``new_col`` =
    0/1 flag on ``docs``) — the production dedup shape: each ingest
    batch is checked against the corpus (and itself) without re-pairing
    the existing corpus against itself.

    Identical machinery to :func:`ngram_jaccard_pairs` with two
    incremental cuts, both applied BEFORE the pair explosion:

    * posting lists containing no new doc are dropped (an untouched
      shingle cannot produce a new-touching pair) — at 100 TB this is
      the dominant saving: the daily batch touches a small fraction of
      the shingle space, so the C(k,2) explosion runs only there;
    * within a surviving posting, only pairs with a new side are
      emitted (old×old pairs were reported by earlier batches).

    Output = exactly ``ngram_jaccard_pairs(all docs)`` filtered to
    new-touching pairs (bit-identical — property-tested); the scheduled
    recompute can therefore verify any incremental run.

    MAINTENANCE: this mirrors the posting/pair/score pipeline of
    :func:`ngram_jaccard_pairs` (kept separate so the hot full-corpus
    path carries no flag column); any change THERE must land HERE too —
    tests/test_llm_ops.py::test_incremental_dedup_equals_filtered_full
    pins the equivalence and fails on drift.
    """
    sh = hashed_shingle_docs(docs, id_col, text_col, n)
    flags = docs.select(F.col(id_col).alias("id"), F.col(new_col).cast("int").alias("nw"))
    sized = pin(
        sh.join(flags, "id")
        .select("id", "nw", F.size("sh").alias("sz"), F.explode("sh").alias("s"))
    )
    posting = (
        sized.groupBy("s")
        .agg(F.collect_list(F.struct(F.col("id"), F.col("nw"))).alias("ids"))
        .filter(F.size("ids") > 1)
        .filter(F.exists("ids", lambda x: x["nw"] == 1))
    )
    if max_posting is not None:
        posting = posting.filter(F.size("ids") <= max_posting)
    pairs = posting.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x: F.transform(
                        F.filter(
                            F.col("ids"),
                            lambda y: (y["id"] > x["id"])
                            & ((x["nw"] == 1) | (y["nw"] == 1)),
                        ),
                        lambda y: F.struct(
                            x["id"].alias("id_a"), y["id"].alias("id_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    inter = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    sizes = sized.select("id", "sz").dropDuplicates(["id"])
    scored = inter.join(
        F.broadcast(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))),
        "id_a",
    ).join(
        F.broadcast(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))),
        "id_b",
    )
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return scored.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def novelty_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty — the incremental-curation signal:
    what fraction of a doc's distinct n-grams has no earlier document
    (lower id = earlier in crawl order) already containing them?  Docs
    near 0 are recombinations of already-seen text (template spam,
    quote farms); high-novelty docs carry new content worth keeping —
    the ordered complement of ``cross_doc_dup_fraction``.

    One shingle explode + one (shingle)-keyed min-reduce + one join
    back: the exchanges carry (int64 hash, id) pairs only — the
    posting-list shape of the dedup family, never text.  first-seen =
    MIN(doc id) per shingle, exact and deterministic; novelty =
    n_novel / n_grams, one double division.

    Returns (doc_id, n_grams, n_novel, novelty).
    """
    ex = hashed_shingle_docs(docs, id_col, text_col, n, hash_mode="md5").select(
        "id", F.explode("sh").alias("_sh")
    )
    first = ex.groupBy("_sh").agg(F.min("id").alias("_first"))
    return (
        ex.join(first, "_sh")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("_first") == F.col("id")).cast("bigint")).alias("n_novel"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_grams")).alias("novelty"),
        )
    )


def novelty_scores_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> str:
    """DuckDB twin of :func:`novelty_scores` (same md5-derived shingle
    hashes, so hash collisions — if any — are identical)."""
    h = portable_hash64_sql("s")
    return f"""
WITH words AS (
  SELECT {id_col}, string_split_regex(lower(trim({text_col})), '\\s+') AS w
  FROM {table}
),
sh AS (
  SELECT {id_col},
    list_distinct(CASE WHEN len(w) >= {n}
      THEN [array_to_string(w[i:i+{n - 1}], ' ') FOR i IN range(1, len(w) - {n - 2})]
      ELSE [array_to_string(w, ' ')] END) AS shingles
  FROM words
),
ex AS (SELECT {id_col}, {h} AS sh FROM (SELECT {id_col}, unnest(shingles) AS s FROM sh)),
first AS (SELECT sh, MIN({id_col}) AS _first FROM ex GROUP BY sh)
SELECT ex.{id_col}, COUNT(*) AS n_grams,
  CAST(SUM(CASE WHEN first._first = ex.{id_col} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_novel,
  CAST(SUM(CASE WHEN first._first = ex.{id_col} THEN 1 ELSE 0 END) AS DOUBLE)
    / COUNT(*) AS novelty
FROM ex JOIN first USING (sh)
GROUP BY ex.{id_col}
"""


def minhash_estimate_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Estimator-quality audit of the MinHash index: for every LSH
    candidate pair, the signature-based Jaccard ESTIMATE (matching
    minima / num_hashes — what a signature-only pipeline would act on)
    next to the exact shingle Jaccard, with the signed error.  This is
    the dedup-QA query that answers "can we drop the verify join and
    trust signatures alone, and at what error?" — run it on a sample
    before loosening the pipeline at scale.

    Runs the engine-portable (md5/affine-GF(P31)) mode of
    :func:`minhash_lsh_pairs` so the DuckDB twin reproduces the exact
    candidate set, signatures included.  Same scale shape as the LSH
    pipeline: banding moves (id, band, bucket) rows only; signatures
    (k·8 bytes/doc) and shingle sets are joined per surviving candidate.

    Returns (id_a, id_b, est_jaccard, jaccard, err).
    """
    rows_per_band = num_hashes // bands
    sh = pin(hashed_shingle_docs(docs, id_col, text_col, n, "md5"))
    perms = minhash_perms(num_hashes, seed)
    hm = F.col("_h") % P31
    sig = pin(
        sh.select("id", F.explode("sh").alias("_h"))
        .groupBy("id")
        .agg(
            *[
                F.min((F.lit(a) * hm + F.lit(b)) % P31).alias(f"_m{i}")
                for i, (a, b) in enumerate(perms)
            ]
        )
    )

    def band_bucket(b: int):
        cols = [
            F.col(f"_m{i}").cast("string")
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        return portable_hash64(F.concat_ws(":", *cols))

    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    bucketed = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        bucketed.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda x: F.transform(
                            F.filter(F.col("ids"), lambda y: y > x),
                            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sig.select(
        F.col("id").alias("id_a"), *[F.col(f"_m{i}").alias(f"_a{i}") for i in range(num_hashes)]
    )
    sb = sig.select(
        F.col("id").alias("id_b"), *[F.col(f"_m{i}").alias(f"_b{i}") for i in range(num_hashes)]
    )
    withsig = cand.join(sa, "id_a").join(sb, "id_b")
    matches = None
    for i in range(num_hashes):
        ind = F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        matches = ind if matches is None else matches + ind
    est = matches.cast("double") / F.lit(float(num_hashes))
    verify = withsig.select("id_a", "id_b", est.alias("est_jaccard")).join(
        sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    exact = inter / union
    return verify.select(
        "id_a",
        "id_b",
        "est_jaccard",
        exact.alias("jaccard"),
        (F.col("est_jaccard") - exact).alias("err"),
    )


def minhash_estimate_audit_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> str:
    """DuckDB twin of :func:`minhash_estimate_audit` (same generated
    hashes/permutations/buckets as :func:`minhash_lsh_pairs_sql`)."""
    from timeseriesutils_spark.functions.exact import dlit

    rows_per_band = num_hashes // bands
    perms = minhash_perms(num_hashes, seed)
    h60 = portable_hash64_sql("s")
    mins = ",\n    ".join(
        f"MIN(({a} * (h % {P31}) + {b}) % {P31}) AS m{i}"
        for i, (a, b) in enumerate(perms)
    )
    band_selects = []
    for b in range(bands):
        ms = ", ".join(f"m{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band))
        bucket = portable_hash64_sql(f"CONCAT_WS(':', {ms})")
        band_selects.append(
            f"SELECT {id_col}, {b} AS band, {bucket} AS bucket FROM sig"
        )
    bands_sql = "\n  UNION ALL\n  ".join(band_selects)
    match_sum = " + ".join(
        f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    return f"""
WITH words AS (
  SELECT {id_col}, string_split_regex(lower(trim(text)), '\\s+') AS w FROM {table}
),
sg AS (
  SELECT {id_col},
    list_distinct(CASE WHEN len(w) >= {n}
      THEN [array_to_string(w[i:i+{n - 1}], ' ') FOR i IN range(1, len(w) - {n - 2})]
      ELSE [array_to_string(w, ' ')] END) AS sgl
  FROM words
),
ex AS (
  SELECT {id_col}, len(sgl) AS sz, {h60} AS h
  FROM (SELECT {id_col}, sgl, unnest(sgl) AS s FROM sg)
),
sig AS (
  SELECT {id_col},
    {mins}
  FROM ex GROUP BY {id_col}
),
bands AS (
  {bands_sql}
),
cand AS (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.{id_col} < b.{id_col}
),
withsig AS (
  SELECT c.id_a, c.id_b,
    CAST(({match_sum}) AS DOUBLE) / {dlit(float(num_hashes))} AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.{id_col} = c.id_a
  JOIN sig sb ON sb.{id_col} = c.id_b
),
isect AS (
  SELECT w.id_a, w.id_b, COUNT(*) AS i
  FROM withsig w
  JOIN ex ea ON ea.{id_col} = w.id_a
  JOIN ex eb ON eb.{id_col} = w.id_b AND ea.h = eb.h
  GROUP BY 1, 2
),
szs AS (SELECT {id_col}, MAX(sz) AS sz FROM ex GROUP BY 1),
final AS (
  -- LEFT join: a bucket-collision pair with zero shingle overlap keeps
  -- its row (jaccard 0), matching the Spark array_intersect path
  SELECT w.id_a, w.id_b, w.est_jaccard, za.sz AS sz_a, zb.sz AS sz_b,
    COALESCE(isect.i, 0) AS i
  FROM withsig w
  JOIN szs za ON za.{id_col} = w.id_a
  JOIN szs zb ON zb.{id_col} = w.id_b
  LEFT JOIN isect ON isect.id_a = w.id_a AND isect.id_b = w.id_b
)
SELECT id_a, id_b, est_jaccard,
  CAST(i AS DOUBLE) / (sz_a + sz_b - i) AS jaccard,
  est_jaccard - CAST(i AS DOUBLE) / (sz_a + sz_b - i) AS err
FROM final
"""


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int | None = None,
) -> DataFrame:
    """All pairs (a < b) where either doc's shingle set is ≥ threshold
    CONTAINED in the other: max(|A∩B|/|A|, |A∩B|/|B|) ≥ t.

    The asymmetric sibling of :func:`ngram_jaccard_pairs` — Jaccard
    misses subset duplication (a tweet quoted inside an article scores
    |A|/|B| ≈ 0 Jaccard but containment 1.0), which is the common
    shape of train/test contamination and boilerplate wrapping in LLM
    corpora.  Broder's containment measure over the same int64-shingle
    posting-list machinery: one corpus scan, two narrow shuffles, no
    self-join, hot shingles bounded by ``max_posting`` exactly as the
    Jaccard op (same 100 TB posting-cap argument).

    Returns (id_a, id_b, sz_a, sz_b, containment) — containment is the
    max of the two directions; direction recoverable from sz_a/sz_b
    (the smaller side is the contained one).
    """
    sh = hashed_shingle_docs(docs, id_col, text_col, n)
    sized = pin(
        sh.select("id", F.size("sh").alias("sz"), F.explode("sh").alias("s"))
    )
    posting = (
        sized.groupBy("s")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_posting is not None:
        posting = posting.filter(F.size("ids") <= max_posting)
    pairs = posting.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x: F.transform(
                        F.filter(F.col("ids"), lambda y: y > x),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    inter = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    sizes = sized.select("id", "sz").dropDuplicates(["id"])
    scored = inter.join(
        F.broadcast(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))),
        "id_a",
    ).join(
        F.broadcast(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))),
        "id_b",
    )
    cont = F.col("inter").cast("double") / F.least(
        F.col("sz_a"), F.col("sz_b")
    ).cast("double")
    return scored.select(
        "id_a", "id_b", "sz_a", "sz_b", cont.alias("containment")
    ).filter(F.col("containment") >= threshold)


def dedup_band_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    band_configs: tuple[int, ...] = (2, 4, 8, 16),
    threshold: float = 0.8,
    seed: int = 42,
    engine: str = "onepass",
) -> DataFrame:
    """LSH banding tuner: re-band the SAME ``num_hashes`` portable
    minhash minima under several (bands, rows) splits and report, per
    config, the measured candidate volume and the measured recall of
    true near-dups (exact Jaccard ≥ threshold) — the table that picks
    (b, r) for dedup_minhash_lsh empirically instead of from the
    asymptotic S-curve alone (the theoretical catch probability
    1−(1−t^r)^b is emitted beside the measured recall so drift
    between them is visible — it flags shingle-distribution
    pathologies the iid model misses).

    Ground truth = the MOST PERMISSIVE config's candidates (its
    low-similarity knee sits far below ``threshold``), verified by
    exact Jaccard — computed once, pinned, shared by every config row.
    Signature minima are computed ONCE and re-banded per config
    (banding is pure hashing over the k minima — the whole audit adds
    |configs| cheap band shuffles over 24-byte rows, never re-shingles).

    ``engine="onepass"`` (default, round-14): every config's band
    structs ride ONE explode → ONE (cfg, band, bucket) grouping → ONE
    pair dedup, and the per-config stats are a single groupBy("cfg") —
    the truth tier reads the cfg = max(bands) slice of the same pinned
    candidate frame instead of re-deriving it (guide §2.4: the five
    separately-planned candidate pipelines shared every input and
    differed only in a literal).  ``engine="relational"`` keeps the
    per-config pipelines (A/B control; bit-identical results).

    Returns (bands, rows_per_band, n_candidates, n_truth, n_caught,
    recall, p_catch_theory) — one row per config.
    """
    rows_of = {b: num_hashes // b for b in band_configs}
    max_b = max(band_configs)
    sh = pin(hashed_shingle_docs(docs, id_col, text_col, n, "md5"))
    perms = minhash_perms(num_hashes, seed)
    hm = F.col("_h") % P31
    sig = pin(
        sh.select("id", F.explode("sh").alias("_h"))
        .groupBy("id")
        .agg(
            *[
                F.min((F.lit(a) * hm + F.lit(b)) % P31).alias(f"_m{i}")
                for i, (a, b) in enumerate(perms)
            ]
        )
    )

    def band_bucket(b: int, rpb: int):
        cols = [
            F.col(f"_m{i}").cast("string")
            for i in range(b * rpb, (b + 1) * rpb)
        ]
        return portable_hash64(F.concat_ws(":", *cols))

    def cand_for(bands: int) -> DataFrame:
        rpb = rows_of[bands]
        banded = sig.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            band_bucket(b, rpb).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select("id", "bb.band", "bb.bucket")
        bucketed = (
            banded.groupBy("band", "bucket")
            .agg(F.collect_list("id").alias("ids"))
            .filter(F.size("ids") > 1)
        )
        return (
            bucketed.select(
                F.explode(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda x: F.transform(
                                F.filter(F.col("ids"), lambda y: y > x),
                                lambda y: F.struct(
                                    x.alias("id_a"), y.alias("id_b")
                                ),
                            ),
                        )
                    )
                ).alias("p")
            )
            .select("p.*")
            .dropDuplicates(["id_a", "id_b"])
        )

    if engine == "onepass":
        # every config's band structs in ONE explode: (cfg, band, bucket)
        all_structs = [
            F.struct(
                F.lit(bands).alias("cfg"),
                F.lit(b).alias("band"),
                band_bucket(b, rows_of[bands]).alias("bucket"),
            )
            for bands in band_configs
            for b in range(bands)
        ]
        banded = sig.select(
            "id", F.explode(F.array(*all_structs)).alias("bb")
        ).select("id", "bb.cfg", "bb.band", "bb.bucket")
        bucketed = (
            banded.groupBy("cfg", "band", "bucket")
            .agg(F.collect_list("id").alias("ids"))
            .filter(F.size("ids") > 1)
        )
        cand = pin(
            bucketed.select(
                "cfg",
                F.explode(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda x: F.transform(
                                F.filter(F.col("ids"), lambda y: y > x),
                                lambda y: F.struct(
                                    x.alias("id_a"), y.alias("id_b")
                                ),
                            ),
                        )
                    )
                ).alias("p"),
            )
            .select("cfg", "p.*")
            .dropDuplicates(["cfg", "id_a", "id_b"])
        )
        verify = (
            cand.filter(F.col("cfg") == max_b)
            .select("id_a", "id_b")
            .join(
                sh.select(
                    F.col("id").alias("id_a"), F.col("sh").alias("sh_a")
                ),
                "id_a",
            )
            .join(
                sh.select(
                    F.col("id").alias("id_b"), F.col("sh").alias("sh_b")
                ),
                "id_b",
            )
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        truth = pin(
            verify.select("id_a", "id_b", (inter / union).alias("_j"))
            .filter(F.col("_j") >= threshold)
            .select("id_a", "id_b")
        )
        tcnt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
        grouped = (
            cand.join(
                truth.withColumn("_t", F.lit(1)), on=["id_a", "id_b"],
                how="left",
            )
            .groupBy("cfg")
            .agg(
                F.count(F.lit(1)).alias("_nc"),
                F.coalesce(F.sum("_t"), F.lit(0)).cast("bigint").alias(
                    "_ng"
                ),
            )
        )
        # a config with ZERO candidates must still emit its row (the
        # relational form's global agg does; groupBy drops empty groups)
        cfg_frame = docs.sparkSession.createDataFrame(
            [(int(b),) for b in band_configs], "cfg int"
        )
        stats = cfg_frame.join(F.broadcast(grouped), "cfg", "left").select(
            "cfg",
            F.coalesce(F.col("_nc"), F.lit(0).cast("bigint")).alias(
                "n_candidates"
            ),
            F.coalesce(F.col("_ng"), F.lit(0).cast("bigint")).alias(
                "n_caught"
            ),
        )
        p_theory_expr = None
        rpb_expr = None
        for bands in band_configs:
            rpb = rows_of[bands]
            p_theory = 1.0 - (1.0 - threshold**rpb) ** bands
            lit_p = F.expr(f"CAST('{float(p_theory)!r}' AS DOUBLE)")
            cond = F.col("cfg") == bands
            p_theory_expr = (
                F.when(cond, lit_p)
                if p_theory_expr is None
                else p_theory_expr.when(cond, lit_p)
            )
            rpb_expr = (
                F.when(cond, F.lit(rpb))
                if rpb_expr is None
                else rpb_expr.when(cond, F.lit(rpb))
            )
        allc = stats.select(
            F.col("cfg").alias("bands"),
            rpb_expr.alias("rows_per_band"),
            "n_candidates",
            "n_caught",
            p_theory_expr.alias("p_catch_theory"),
        )
        out = allc.crossJoin(F.broadcast(tcnt))
        return out.select(
            "bands",
            "rows_per_band",
            "n_candidates",
            "n_truth",
            "n_caught",
            F.when(
                F.col("n_truth") > 0,
                F.col("n_caught").cast("double")
                / F.col("n_truth").cast("double"),
            ).alias("recall"),
            "p_catch_theory",
        )

    verify = (
        cand_for(max_b)
        .join(
            sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    truth = pin(
        verify.select("id_a", "id_b", (inter / union).alias("_j"))
        .filter(F.col("_j") >= threshold)
        .select("id_a", "id_b")
    )
    tcnt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    parts = []
    for bands in band_configs:
        rpb = rows_of[bands]
        p_theory = 1.0 - (1.0 - threshold**rpb) ** bands
        c = cand_for(bands)
        stats = (
            c.join(
                truth.withColumn("_t", F.lit(1)), on=["id_a", "id_b"],
                how="left",
            )
            .agg(
                F.count(F.lit(1)).alias("n_candidates"),
                F.coalesce(F.sum("_t"), F.lit(0)).cast("bigint").alias(
                    "n_caught"
                ),
            )
            .select(
                F.lit(bands).alias("bands"),
                F.lit(rpb).alias("rows_per_band"),
                "n_candidates",
                "n_caught",
                F.expr(f"CAST('{float(p_theory)!r}' AS DOUBLE)").alias(
                    "p_catch_theory"
                ),
            )
        )
        parts.append(stats)
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    out = allc.crossJoin(F.broadcast(tcnt))
    return out.select(
        "bands",
        "rows_per_band",
        "n_candidates",
        "n_truth",
        "n_caught",
        F.when(
            F.col("n_truth") > 0,
            F.col("n_caught").cast("double") / F.col("n_truth").cast("double"),
        ).alias("recall"),
        "p_catch_theory",
    )


def dedup_band_audit_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    band_configs: tuple[int, ...] = (2, 4, 8, 16),
    threshold: float = 0.8,
    seed: int = 42,
) -> str:
    """DuckDB twin of :func:`dedup_band_audit` (same minima, buckets,
    truth set, and theory literals)."""
    perms = minhash_perms(num_hashes, seed)
    h60 = portable_hash64_sql("s")
    mins = ",\n    ".join(
        f"MIN(({a} * (h % {P31}) + {b}) % {P31}) AS m{i}"
        for i, (a, b) in enumerate(perms)
    )
    max_b = max(band_configs)
    ctes = [
        f"""
words AS (
  SELECT {id_col}, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM {table}
),
sg AS (
  SELECT {id_col},
    list_distinct(CASE WHEN len(w) >= {n}
      THEN [array_to_string(w[i:i+{n - 1}], ' ')
            FOR i IN range(1, len(w) - {n - 2})]
      ELSE [array_to_string(w, ' ')] END) AS sgl
  FROM words
),
ex AS MATERIALIZED (
  SELECT {id_col}, len(sgl) AS sz, {h60} AS h
  FROM (SELECT {id_col}, sgl, unnest(sgl) AS s FROM sg)
),
sig AS MATERIALIZED (
  SELECT {id_col},
    {mins}
  FROM ex GROUP BY {id_col}
)"""
    ]
    for bands in band_configs:
        rpb = num_hashes // bands
        band_selects = []
        for b in range(bands):
            ms = ", ".join(f"m{i}" for i in range(b * rpb, (b + 1) * rpb))
            bucket = portable_hash64_sql(f"CONCAT_WS(':', {ms})")
            band_selects.append(
                f"SELECT {id_col}, {b} AS band, {bucket} AS bucket FROM sig"
            )
        bsql = "\n  UNION ALL\n  ".join(band_selects)
        ctes.append(
            f"""
bands{bands} AS (
  {bsql}
),
cand{bands} AS MATERIALIZED (
  SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
  FROM bands{bands} a JOIN bands{bands} b
    ON a.band = b.band AND a.bucket = b.bucket
    AND a.{id_col} < b.{id_col}
)"""
        )
    ctes.append(
        f"""
truth AS MATERIALIZED (
  SELECT id_a, id_b FROM (
    SELECT c.id_a, c.id_b, ea.sz AS sz_a, eb.sz AS sz_b, COUNT(*) AS i
    FROM cand{max_b} c
    JOIN ex ea ON ea.{id_col} = c.id_a
    JOIN ex eb ON eb.{id_col} = c.id_b AND ea.h = eb.h
    GROUP BY 1, 2, 3, 4
  ) WHERE CAST(i AS DOUBLE) / (sz_a + sz_b - i) >= {threshold}
),
tcnt AS (SELECT COUNT(*) AS n_truth FROM truth)"""
    )
    unions = []
    for bands in band_configs:
        rpb = num_hashes // bands
        p_theory = 1.0 - (1.0 - threshold**rpb) ** bands
        unions.append(
            f"""SELECT {bands} AS bands, {rpb} AS rows_per_band,
  COUNT(*) AS n_candidates,
  CAST(COALESCE(SUM(CASE WHEN t.id_a IS NOT NULL THEN 1 END), 0)
    AS BIGINT) AS n_caught,
  CAST('{float(p_theory)!r}' AS DOUBLE) AS p_catch_theory
FROM cand{bands} c
LEFT JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b"""
        )
    body = "\nUNION ALL\n".join(unions)
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
cfg AS ({body})
SELECT bands, rows_per_band, n_candidates, n_truth, n_caught,
  CASE WHEN n_truth > 0
    THEN CAST(n_caught AS DOUBLE) / CAST(n_truth AS DOUBLE) END AS recall,
  p_catch_theory
FROM cfg CROSS JOIN tcnt
"""
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): from each sliding window of
    ``window`` consecutive word-``n``-gram hashes, keep the minimum
    (rightmost on ties); the distinct kept (position, hash) pairs are
    the document's fingerprint index.  Guarantees every match of
    length ≥ window+n−1 grams shares a fingerprint, at expected
    density 2/(window+1) — the LOCAL, position-aware dedup index that
    whole-doc MinHash can't give (plagiarism spans, license blocks,
    quoted passages).

    Determinism/portability: gram hashes are the 40 low bits of
    :func:`portable_hash64`; the rightmost-tie rule is encoded in one
    packed int64 key (hash·2^20 + (2^20−1−pos)) whose window MIN picks
    (min hash, max pos) lexicographically — identical in both engines.
    Windows at the head (< window grams) winnow over what exists, so
    short documents still fingerprint.  Positions are capped at 2^20−1
    grams/doc (a ~5 MB document; chunk longer docs upstream).

    Output: (id, gram_pos, fp) distinct — one row per kept
    fingerprint.  Scale: per-row projection + one per-doc window, no
    joins; the index is ~2/(window+1) of the gram stream.
    """
    hr = portable_hash64  # 60-bit positive
    w = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_w"),
    )
    wc = F.col("_w")
    grams = F.when(
        F.size(wc) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(wc) - n),
            lambda i: F.concat_ws(" ", F.slice(wc, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", wc)))
    g = w.select(
        "id",
        F.posexplode(grams).alias("pos", "_g"),
    ).select(
        "id",
        F.col("pos").cast("bigint").alias("pos"),
        (hr(F.col("_g")) % F.lit(2**40)).alias("_hr"),
    )
    key = F.col("_hr") * F.lit(2**20) + (
        F.lit(2**20 - 1) - F.col("pos")
    )
    win = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    sel = g.select(
        "id", F.min(key).over(win).alias("_k")
    ).distinct()
    return sel.select(
        "id",
        (F.lit(2**20 - 1) - F.col("_k") % F.lit(2**20)).alias("gram_pos"),
        F.expr(f"CAST(_k div {2**20} AS BIGINT)").alias("fp"),
    )


def winnow_fingerprints_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    window: int = 4,
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` (same packed-key
    window min)."""
    h = portable_hash64_sql("u.g")
    return f"""
WITH words AS (
  SELECT {id_col} AS id, string_split_regex(lower(trim({text_col})), '\\s+') AS w
  FROM {table}
),
grams AS (
  SELECT id,
    unnest(CASE WHEN len(w) >= {n}
      THEN [{{'pos': i - 1, 'g': array_to_string(w[i:i+{n - 1}], ' ')}}
            FOR i IN range(1, len(w) - {n - 2})]
      ELSE [{{'pos': 0, 'g': array_to_string(w, ' ')}}] END) AS u
  FROM words
),
g AS (
  SELECT id, CAST(u.pos AS BIGINT) AS pos,
    ({h}) % {2**40} AS _hr
  FROM grams
),
sel AS (
  SELECT DISTINCT id,
    MIN(_hr * {2**20} + ({2**20 - 1} - pos)) OVER (
      PARTITION BY id ORDER BY pos
      ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW) AS _k
  FROM g
)
SELECT id, ({2**20 - 1} - _k % {2**20}) AS gram_pos,
  CAST(_k // {2**20} AS BIGINT) AS fp
FROM sel
"""
