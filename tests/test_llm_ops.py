import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from timeseriesutils_spark.operators.multimodal import attach_binary, extract_media_features
from timeseriesutils_spark.operators.similarity import knn_bruteforce, knn_lsh
from timeseriesutils_spark.operators.text import lang_id, text_stats


@pytest.fixture(scope="module")
def doc_frame(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    far = "completely different content about spark window functions at scale"
    return spark.createDataFrame(
        [(0, base), (1, near), (2, far), (3, base)], "doc_id bigint, text string"
    )


def test_ngram_jaccard_finds_near_and_exact(doc_frame):
    pairs = ngram_jaccard_pairs(doc_frame, n=3, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(0, 3)] == 1.0          # exact duplicate
    assert 0.5 <= got[(0, 1)] < 1.0    # near duplicate
    assert (0, 2) not in got and (1, 2) not in got


def test_minhash_lsh_recovers_exact_dup(doc_frame):
    pairs = minhash_lsh_pairs(doc_frame, n=3, num_hashes=16, bands=8, threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 3) in got  # identical docs always collide in every band


def test_minhash_portable_matches_xxhash_mode(doc_frame):
    """Both hash modes verify candidates with the exact Jaccard, so on a
    corpus where every true near-dup collides in some band the verified
    pair sets coincide — and the portable mode is what the DuckDB twin
    reproduces bit-for-bit (gate-checked)."""
    fast = minhash_lsh_pairs(doc_frame, n=3, num_hashes=16, bands=8, threshold=0.9)
    port = minhash_lsh_pairs(
        doc_frame, n=3, num_hashes=16, bands=8, threshold=0.9, hash_mode="md5"
    )
    f = {(r["id_a"], r["id_b"], r["jaccard"]) for r in fast.collect()}
    p = {(r["id_a"], r["id_b"], r["jaccard"]) for r in port.collect()}
    assert (0, 3, 1.0) in p
    assert f == p


def test_simhash_portable_properties(doc_frame):
    """Portable SimHash: identical docs → identical signatures, near-dups
    closer in Hamming distance than unrelated docs, and the signature is
    partition-invariant (integer vote sums are associative)."""
    from timeseriesutils_spark.operators.dedup import simhash_docs_portable

    rows = simhash_docs_portable(doc_frame, n=2).collect()
    sig = {r["doc_id"]: (r["sig_hi"] << 32) | r["sig_lo"] for r in rows}
    assert sig[0] == sig[3]
    ham_near = bin(sig[0] ^ sig[1]).count("1")
    ham_far = bin(sig[0] ^ sig[2]).count("1")
    assert ham_near < ham_far
    rep = simhash_docs_portable(doc_frame.repartition(7), n=2).collect()
    assert {r["doc_id"]: (r["sig_hi"], r["sig_lo"]) for r in rep} == {
        r["doc_id"]: (r["sig_hi"], r["sig_lo"]) for r in rows
    }


def test_simhash_close_for_near_dups(doc_frame):
    rows = doc_frame.select("doc_id", simhash64(F.col("text")).alias("h")).collect()
    h = {r["doc_id"]: r["h"] for r in rows}
    assert h[0] == h[3]
    ham_near = bin((h[0] ^ h[1]) & (2**64 - 1)).count("1")
    ham_far = bin((h[0] ^ h[2]) & (2**64 - 1)).count("1")
    assert ham_near < ham_far


@pytest.fixture(scope="module")
def emb_frame(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((40, 16)).astype("float32")
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16).astype("float32")  # near-dup
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_knn_bruteforce_finds_planted_neighbor(emb_frame):
    out = knn_bruteforce(emb_frame.filter("vec_id = 0"), emb_frame, k=3)
    top = out.filter("rn = 1").collect()[0]
    assert top["vec_id"] == 1 and top["cos"] > 0.99


def test_knn_lsh_subset_of_bruteforce_candidates(emb_frame):
    """LSH results must be genuine corpus vectors with correct cos values:
    every (query, hit) pair must appear in brute-force scoring with the
    same cosine."""
    bf = knn_bruteforce(emb_frame.filter("vec_id < 3"), emb_frame, k=39)
    ls = knn_lsh(emb_frame.filter("vec_id < 3"), emb_frame, k=5, bits=4, dim=16)
    bf_map = {(r["query_id"], r["vec_id"]): r["cos"] for r in bf.collect()}
    for r in ls.collect():
        assert bf_map[(r["query_id"], r["vec_id"])] == r["cos"]


def test_text_stats_values(spark):
    df = spark.createDataFrame([(1, "Hello world! hello")], "doc_id bigint, text string")
    row = text_stats(df).collect()[0]
    assert row["n_words"] == 3
    assert row["n_tokens"] == 4  # Hello / world / ! / hello
    assert row["n_punct"] == 1
    assert abs(row["distinct_word_ratio"] - 2 / 3) < 1e-12


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of the house"), (2, "el gato y la casa de los perros")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "es"}


def test_multimodal_plumbing(doc_frame):
    media = attach_binary(doc_frame)
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_bytes"] > 0 and len(r["checksum"]) == 32
        assert len(r["feature"]) == 8
        assert abs(sum(r["feature"]) - 1.0) < 1e-9  # normalized byte histogram


def test_embedding_near_dup_lsh_subset_of_exact(spark):
    from timeseriesutils_spark.operators.similarity import embedding_near_dup_pairs
    from timeseriesutils_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.3, method="exact").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.3, method="lsh", bits=4).collect()
    }
    assert exact, "threshold too high — test needs a nonempty exact set"
    assert lsh <= exact  # LSH may miss pairs, never invents them


def test_resize_media_plumbing(spark, doc_frame):
    from timeseriesutils_spark.operators.multimodal import attach_binary, resize_media

    media = attach_binary(doc_frame)
    out = resize_media(media, target_w=32, target_h=32)
    rows = out.collect()
    assert len(rows) == doc_frame.count()
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)
    assert all(1 <= len(bytes(r["media"])) <= 32 * 32 // 64 for r in rows)


def test_knn_ivf_scores_exact_and_recall(spark):
    from timeseriesutils_spark.operators.similarity import knn_bruteforce, knn_ivf
    from timeseriesutils_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = knn_bruteforce(q, emb, k=5).collect()
    ivf = knn_ivf(q, emb, k=5, n_centroids=8, nprobe=4).collect()
    exact_cos = {(r["query_id"], r["vec_id"]): r["cos"] for r in exact}
    # every IVF hit's score equals the exact cosine for that pair
    hits = 0
    for r in ivf:
        pair = (r["query_id"], r["vec_id"])
        if pair in exact_cos:
            assert r["cos"] == exact_cos[pair]  # same deterministic kernel
            hits += 1
    # ≤ k rows per query, rn dense from 1
    by_q = {}
    for r in ivf:
        by_q.setdefault(r["query_id"], []).append(r["rn"])
    for rns in by_q.values():
        assert sorted(rns) == list(range(1, len(rns) + 1))
    # probing half the lists should recover a healthy share of true top-5
    assert hits >= len(exact) // 2


def test_hash_split_stability(spark, doc_frame):
    from timeseriesutils_spark.operators.splits import hash_split

    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(doc_frame, "doc_id").collect()}
    # repartitioned input → identical assignment (pure function of the key)
    b = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in hash_split(doc_frame.repartition(7), "doc_id").collect()
    }
    assert a == b
    assert all(0 <= v[0] < 100 for v in a.values())
    assert {v[1] for v in a.values()} <= {"train", "val", "test"}


def test_connected_components_chain(spark):
    from timeseriesutils_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3, needs >1 propagation round), pair 10-11,
    # and 20-21 + 21-22 triangle-free fork
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_blocked_cosine_bitwise_equals_expression_path(spark):
    """The numpy block kernel must produce the IDENTICAL doubles the JVM
    expression path computes (same quantized-int64 op sequence)."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.similarity import (
        _dot_dec,
        embedding_near_dup_pairs,
    )
    from timeseriesutils_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    blocked = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(emb, threshold=0.3, method="exact").collect()
    }
    base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    base = base.withColumn("_n", F.sqrt(_dot_dec(F.col("v"), F.col("v"))))
    a, b = base.alias("a"), base.alias("b")
    cos = _dot_dec(F.col("a.v"), F.col("b.v")) / (F.col("a._n") * F.col("b._n"))
    expr = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos.alias("cos"))
        .filter(F.col("cos") >= 0.3)
        .collect()
    }
    assert blocked == expr and len(blocked) > 0  # keys AND doubles bitwise


def test_ngram_jaccard_max_posting_drops_hot_shingle(spark):
    """A shingle shared by more than max_posting docs must emit no pairs.

    Docs 0..5 share ONE hot boilerplate shingle (and nothing else), docs
    10/11 are true near-dups through ordinary shingles.  With
    max_posting=4 the hot shingle's C(6,2)=15 pair expansion is dropped;
    the real near-dup pair survives.
    """
    from timeseriesutils_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved"  # one 3-gram, shared by 6 docs
    rows = [(i, f"{boiler}") for i in range(6)]
    rows += [
        (10, "spark window functions compute lag features fast"),
        (11, "spark window functions compute lag features quickly"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    unbounded = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    bounded = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_posting=4).collect()
    ub = {(r["id_a"], r["id_b"]) for r in unbounded}
    bd = {(r["id_a"], r["id_b"]) for r in bounded}
    assert (0, 1) in ub and len([p for p in ub if p[0] < 6 and p[1] < 6]) == 15
    assert all(not (p[0] < 6 and p[1] < 6) for p in bd)  # hot shingle gone
    assert (10, 11) in bd  # ordinary near-dup survives the bound


def test_embedding_lsh_multitable_recall(spark):
    """The declared multi-table config (4 bits × 8 tables) must recover
    a large share of the exact near-dup pairs, with exact cosine scores
    (same quantized kernel) on every pair it reports."""
    from timeseriesutils_spark.operators.similarity import embedding_near_dup_pairs
    from timeseriesutils_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(emb, threshold=0.3, method="exact").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_near_dup_pairs(
            emb, threshold=0.3, method="lsh", bits=4, tables=8
        ).collect()
    }
    assert exact, "threshold too high — test needs a nonempty exact set"
    assert set(lsh) <= set(exact)  # never invents pairs
    for p, c in lsh.items():
        assert c == exact[p]  # bitwise-identical scores (same kernel)
    assert len(lsh) >= 0.7 * len(exact)  # multi-table recall bound


def test_connected_components_distributed_chain_low_rounds(spark):
    """Large-star/small-star must resolve a 64-node chain (diameter 63)
    within ~log rounds — plain min-label propagation would need 63."""
    from timeseriesutils_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(1, 64)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {
        r["id"]: r["comp"]
        for r in connected_components(
            pairs, max_iter=10, driver_threshold=0
        ).collect()
    }
    assert got == {i: 1 for i in range(1, 65)}


def test_connected_components_string_ids_driver_path(spark):
    """The driver union-find path must preserve non-bigint id types
    (regression: output schema was hardcoded to long)."""
    from timeseriesutils_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    out = connected_components(pairs)
    assert out.schema["id"].dataType.simpleString() == "string"
    got = {r["id"]: r["comp"] for r in out.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_pack_sequences_offsets(spark):
    """Shard-local concat-then-chunk layout: offsets advance by token
    counts, sequences cut every `budget` tokens."""
    from timeseriesutils_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a b c"), (2, "d e f g"), (4, "h i"), (6, "j k l")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["tok_offset"])
        for r in pack_sequences(docs, budget=5, n_shards=1).collect()
    }
    # stream: doc0 tokens[0,3) seq0 — doc2 [3,7) starts seq0@3 —
    # doc4 [7,9) starts seq1@2 — doc6 [9,12) starts seq1@4
    assert out == {0: (3, 0, 0), 2: (4, 0, 3), 4: (2, 1, 2), 6: (3, 1, 4)}


def test_pack_sequences_sharding_deterministic(spark):
    from timeseriesutils_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(40)], "doc_id bigint, text string"
    )
    a = {tuple(r) for r in pack_sequences(docs, budget=8, n_shards=4).collect()}
    b = {
        tuple(r)
        for r in pack_sequences(docs.repartition(13), budget=8, n_shards=4).collect()
    }
    assert a == b  # layout is a pure function of (id, text)
    assert {r[1] for r in a} == {0, 1, 2, 3}  # all shards used


def test_decontaminate_drops_eval_overlap(spark):
    from timeseriesutils_spark.operators.dedup import (
        decontaminate,
        ngram_jaccard_against,
    )

    train = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated training document about spark plans"),
        ],
        "doc_id bigint, text string",
    )
    ev = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    pairs = ngram_jaccard_against(train, ev, n=3, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["jaccard"] == 1.0
    kept = sorted(r["doc_id"] for r in decontaminate(train, ev, threshold=0.8).collect())
    assert kept == [2]  # contaminated doc dropped, unrelated doc kept


def test_quantize_embeddings_bounds(spark):
    """Quantized values must lie in [-127, 127] with the max-|x| element
    hitting exactly ±127, and checksums must be reconstructible from a
    local numpy quantization of the same vectors."""
    import numpy as np
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.similarity import quantize_embeddings

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(20)]
    vecs.append((99, [0.0] * 8))  # zero vector → dropped
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert 99 not in out
    assert len(out) == 20
    for i, v in vecs[:20]:
        a = np.array(v, dtype="float64")  # float32 storage round-trips below
        a32 = a.astype("float32").astype("float64")
        mx = np.abs(a32).max()
        q = np.sign(a32) * np.floor(np.abs(a32) * (127.0 / mx) + 0.5)
        r = out[i]
        assert r.q_sum == int(q.sum())
        assert r.q_l2 == int((q * q).sum())
        assert np.abs(q).max() == 127 and r.n_sat >= 1


def test_pca_project_matches_numpy_and_is_partition_invariant(spark):
    """Distributed PCA must match a driver-side numpy PCA on the same
    vectors (tolerance: quantization units) and be bit-identical across
    repartitionings."""
    import numpy as np

    from timeseriesutils_spark.operators.pca import pca_project

    rng = np.random.default_rng(3)
    base = rng.normal(size=(200, 6)) @ np.diag([5.0, 3.0, 1.0, 0.3, 0.2, 0.1])
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = pca_project(df, k=2).toPandas().set_index("vec_id").sort_index()
    got2 = (
        pca_project(df.repartition(7), k=2).toPandas().set_index("vec_id").sort_index()
    )
    assert (got["pc1"] == got2["pc1"]).all() and (got["pc2"] == got2["pc2"]).all()

    x = np.stack([np.array(v, dtype="float32").astype("float64") for _, v in rows])
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / (len(x) - 1)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :2]
    for j in range(2):
        i = int(np.abs(comps[:, j]).argmax())
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    want = (x - mu) @ comps
    np.testing.assert_allclose(got[["pc1", "pc2"]].to_numpy(), want, atol=1e-5)

    # projections onto orthonormal axes preserve total variance of top-2
    assert got["pc1"].var() > got["pc2"].var()


def test_mixture_resample_epochs(spark):
    """Weight 3.0 -> exactly 3 epochs each; weight 0 -> dropped; weight
    0.5 -> a stable subset gets 1 epoch; epoch numbering 1..n."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.splits import mixture_resample

    df = spark.createDataFrame(
        [(i, "a" if i < 40 else ("b" if i < 80 else "c")) for i in range(120)],
        "id long, src string",
    )
    out = mixture_resample(df, "id", "src", {"a": 3.0, "b": 0.5, "c": 0.0})
    agg = {
        r.src: (r.n, r.mx)
        for r in out.groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"), F.max("epoch").alias("mx"))
        .collect()
    }
    assert agg["a"] == (120, 3)
    assert "c" not in agg
    nb, mxb = agg["b"]
    assert 0 < nb < 40 and mxb == 1
    again = mixture_resample(df.repartition(5), "id", "src", {"a": 3.0, "b": 0.5, "c": 0.0})
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_heavy_hitters_exact_under_any_partitioning(spark):
    """Two-pass MG+recount must equal the full GROUP BY answer for every
    partitioning (candidate superset guarantee), incl. skewed layouts."""
    import random

    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.sketches import heavy_hitters

    rng = random.Random(5)
    # zipf-ish: item i has ~C/i occurrences over a 500-item universe
    vals = [f"w{i}" for i in range(1, 500) for _ in range(600 // i)]
    rng.shuffle(vals)
    df = spark.createDataFrame([(v,) for v in vals], "word string")
    n = len(vals)
    frac = 0.01
    exact = {
        (r.word, r.n)
        for r in df.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= -(-n * frac // 1))
        .collect()
    }
    assert exact  # fixture produces heavy hitters
    for parts in (1, 3, 16):
        got = {
            (r.word, r.n)
            for r in heavy_hitters(df.repartition(parts), "word", frac).collect()
        }
        assert got == exact


def test_grouped_centroids_matches_numpy(spark):
    import numpy as np

    from timeseriesutils_spark.operators.similarity import grouped_centroids

    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 1, (20, 4)).astype("float32")
    labels = [i % 3 for i in range(20)]
    df = spark.createDataFrame(
        [(i, labels[i], vecs[i].tolist()) for i in range(20)],
        "vec_id long, label int, embedding array<float>",
    )
    out = grouped_centroids(df)
    got = {(r["label"], r["dim_idx"]): r["centroid"] for r in out.collect()}
    for lb in range(3):
        want = vecs[np.array(labels) == lb].astype("float64").mean(axis=0)
        for d in range(4):
            assert got[(lb, d + 1)] == pytest.approx(want[d], abs=1e-6)


def test_fuzzy_pairs_blocked_linkage(spark):
    from timeseriesutils_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "Customer#01"),
            (2, "Customer#02"),   # dist 1 from #01 (same stem)
            (3, "Customer#11"),   # dist 1 from #01/#02 but same stem too
            (4, "Customer#999"),  # different length → different block
            (5, "Xustomer#01"),   # dist 1 from #01 but DIFFERENT stem → not a candidate
        ],
        "rid long, name string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(df, "rid", "name", max_dist=1).collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 1  # '0'→'1' one substitution, same stem block
    assert (2, 3) not in pairs  # "02"→"11" is two edits
    assert not any(4 in p or 5 in p for p in pairs)  # blocked out by design


def test_knn_ivf_recall_sf01_hash_ordered_sample(spark):
    """Recall pin at sf0.1 with the hash-ordered centroid sample
    (ivf_centroids orders by xxhash64(id), not an id prefix — a prefix
    correlates with content and would train the coarse quantizer on one
    corner of the corpus).  Queries are spread across the id space so a
    biased quantizer would show up as recall collapse."""
    from timeseriesutils_spark.operators.similarity import knn_bruteforce, knn_ivf
    from timeseriesutils_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    q = emb.filter(F.col("vec_id") % 100 == 0)  # 20 queries across the range
    exact = knn_bruteforce(q, emb, k=5).collect()
    ivf = knn_ivf(q, emb, k=5, n_centroids=16, nprobe=4).collect()
    exact_pairs = {(r["query_id"], r["vec_id"]) for r in exact}
    assert exact_pairs
    hits = sum(1 for r in ivf if (r["query_id"], r["vec_id"]) in exact_pairs)
    recall = hits / len(exact_pairs)
    assert recall >= 0.6, f"IVF recall {recall:.2f} below pin"


def test_decode_image_real_kernel(spark):
    """Pillow-backed decode path (skipped where the lib is absent — this
    container): a real PNG through the same mapInPandas plumbing must
    yield true dimensions and an 8-dim thumbnail feature."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from timeseriesutils_spark.operators.multimodal import (
        decode_image,
        extract_media_features,
    )

    buf = io.BytesIO()
    PIL_Image.new("RGB", (20, 10), (255, 0, 0)).save(buf, format="PNG")
    raw = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(raw), "image/png", len(raw), "x")],
        "doc_id long, media binary, media_type string, n_bytes long, checksum string",
    )
    out = extract_media_features(df, kernel=decode_image).collect()
    assert out[0]["width"] == 20 and out[0]["height"] == 10
    assert len(out[0]["feature"]) == 8
    assert all(f == pytest.approx(1.0 / 3.0, abs=0.02) for f in out[0]["feature"])


def test_decode_image_falls_back_to_stub_without_pil():
    """Without Pillow, decode_image must be the deterministic stub."""
    from timeseriesutils_spark.operators import multimodal

    if multimodal.HAS_PIL:
        pytest.skip("Pillow present; fallback path not reachable")
    raw = b"hello media bytes"
    assert multimodal.decode_image(raw) == multimodal.decode_image_stub(raw)


def test_build_vocab_counts_and_rank(spark):
    from timeseriesutils_spark.operators.text import build_vocab

    docs = spark.createDataFrame(
        [(0, "aa bb aa"), (1, "bb aa, cc")], "doc_id bigint, text string"
    )
    rows = {r["token"]: (r["freq"], r["rank"]) for r in build_vocab(docs).collect()}
    # "aa"×3, "bb"×2, ","×1, "cc"×1 — punctuation is its own pre-token
    assert rows["aa"] == (3, 1)
    assert rows["bb"] == (2, 2)
    assert rows[","] == (1, 3)  # freq ties break by token asc ("," < "cc")
    assert rows["cc"] == (1, 4)


def test_bpe_pair_counts_weighted_by_word_freq(spark):
    from timeseriesutils_spark.operators.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(0, "abab abab cd"), (1, "abab x")], "doc_id bigint, text string"
    )
    rows = {r["pair"]: r["score"] for r in bpe_pair_counts(docs).collect()}
    # "abab" appears 3× as a word: pairs ab, ba, ab → ab: 2·3=6, ba: 1·3=3
    # "cd" once; "x" has no pair (len<2, pruned)
    assert rows["ab"] == 6
    assert rows["ba"] == 3
    assert rows["cd"] == 1
    assert "x" not in rows


def test_pca_power_matches_eigh_top_component(spark):
    """The exact-integer power iteration must agree with the eigh tier on
    the top component (tolerance: iteration-quantization units) and be
    bit-identical across repartitionings."""
    import numpy as np

    from timeseriesutils_spark.operators.pca import pca_power_project, pca_project

    rng = np.random.default_rng(5)
    base = rng.normal(size=(150, 6)) @ np.diag([5.0, 2.0, 1.0, 0.5, 0.3, 0.1])
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    pw = pca_power_project(df).toPandas().set_index("vec_id").sort_index()
    pw2 = (
        pca_power_project(df.repartition(7))
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert (pw["pc1"] == pw2["pc1"]).all()

    eig = pca_project(df, k=1).toPandas().set_index("vec_id").sort_index()
    np.testing.assert_allclose(
        pw["pc1"].to_numpy(), eig["pc1"].to_numpy(), atol=1e-3
    )


def test_dup_spans_known_block(spark):
    """A shared 12-word block across two docs is found as one maximal
    span in each; unique docs report nothing; self-repetition within a
    single doc does NOT trigger (min_docs=2 distinct documents)."""
    from timeseriesutils_spark.operators.dupspan import dup_spans

    block = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, f"alpha beta {block} gamma delta"),
        (2, f"{block} epsilon zeta eta theta iota kappa"),
        (3, "totally unique words here that appear nowhere else at all ok"),
        (4, "rep rep rep rep rep rep rep rep rep rep rep rep rep rep"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.span_start, r.span_end, r.n_windows)
        for r in dup_spans(df, ngram_words=8, min_docs=2).collect()
    }
    # doc 1: block occupies words [2, 14) -> 5 windows of 8 words
    assert got[1] == (2, 14, 5)
    # doc 2: block at [0, 12)
    assert got[2] == (0, 12, 5)
    assert 3 not in got and 4 not in got


def test_dup_spans_merges_overlaps(spark):
    """Two duplicated regions separated by a gap stay separate spans;
    adjacent/overlapping windows merge into one."""
    from timeseriesutils_spark.operators.dupspan import dup_spans

    a = "one two three four five six seven eight"          # 8 words
    b = "n1 n2 n3 n4 n5 n6 n7 n8"                          # 8 words
    rows = [
        (1, f"{a} u1 u2 u3 u4 u5 u6 u7 u8 u9 {b}"),
        (2, f"{a} x1 x2 x3 x4 x5 x6 x7 x8 x9 {b}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in dup_spans(df, ngram_words=8, min_docs=2).collect()
    )
    assert got == [(1, 0, 8), (1, 17, 25), (2, 0, 8), (2, 17, 25)]


def test_incremental_dedup_equals_filtered_full(spark, doc_frame):
    """incremental_jaccard_pairs == full-corpus pairs filtered to
    new-touching — the verification contract of the incremental path."""
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.dedup import (
        incremental_jaccard_pairs,
        ngram_jaccard_pairs,
    )

    wm = 2
    flagged = doc_frame.withColumn("_new", (F.col("doc_id") >= wm).cast("int"))
    inc = {
        (r.id_a, r.id_b): r.jaccard
        for r in incremental_jaccard_pairs(
            flagged, "_new", n=2, threshold=0.3
        ).collect()
    }
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(doc_frame, n=2, threshold=0.3).collect()
        if r.id_a >= wm or r.id_b >= wm
    }
    assert inc == full and len(inc) > 0


def test_embedding_drift_identical_halves(spark):
    # identical distributions in both splits -> zero drift, zero shift
    from timeseriesutils_spark.operators.similarity import embedding_drift

    rows = []
    for i in range(8):
        vec = [float((i * 3 + d) % 5) / 5.0 + 0.1 for d in range(4)]
        rows.append((2 * i, "g", "a", vec))
        rows.append((2 * i + 1, "g", "b", vec))  # mirror in split b
    df = spark.createDataFrame(rows, "vec_id long, label string, split string, embedding array<float>")
    r = embedding_drift(df, "split", group_col="label").collect()[0]
    assert r.n_a == 8 and r.n_b == 8
    assert abs(r.drift) < 1e-9 and abs(r.l2_shift) < 1e-9
    assert abs(r.cos_sim - 1.0) < 1e-9


def test_embedding_drift_orthogonal(spark):
    from timeseriesutils_spark.operators.similarity import embedding_drift

    rows = [
        (0, "g", "a", [1.0, 0.0]),
        (1, "g", "b", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label string, split string, embedding array<float>")
    r = embedding_drift(df, "split", group_col="label").collect()[0]
    assert abs(r.cos_sim) < 1e-9 and abs(r.drift - 1.0) < 1e-9
    assert abs(r.l2_shift - 2 ** 0.5) < 1e-6


def test_canonical_pick_prefers_quality(spark):
    # two near-identical docs; the longer (higher-quality) copy wins even
    # though it has the HIGHER id — keep-min-id would pick the other one
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from timeseriesutils_spark.operators.text import quality_score

    base = "the quick brown fox jumps over the lazy dog " * 12
    docs = spark.createDataFrame(
        [(1, base[:200]), (2, base + "extra tail of clean varied prose here")],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.3, max_posting=128)
    comp = connected_components(pairs)
    q = quality_score(docs)
    j = comp.join(q, comp["id"] == q["doc_id"]).select("doc_id", "comp", "quality")
    w = W.partitionBy("comp").orderBy(F.desc("quality"), F.asc("doc_id"))
    out = {r.doc_id: r for r in
           j.withColumn("canonical_id", F.first("doc_id").over(w)).collect()}
    assert set(out) == {1, 2}
    quals = {d: out[d].quality for d in out}
    want = max(quals, key=lambda d: (quals[d], -d))
    assert all(r.canonical_id == want for r in out.values())


def test_novelty_scores_ordering(spark):
    from timeseriesutils_spark.operators.dedup import novelty_scores

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),     # all novel (first doc)
            (2, "alpha beta gamma delta epsilon"),     # exact copy -> 0 novelty
            (3, "alpha beta gamma zeta eta theta"),    # partial overlap
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in novelty_scores(docs, n=3).collect()}
    assert out[1].novelty == 1.0
    assert out[2].novelty == 0.0
    # doc3: 4 shingles, only 'alpha beta gamma' seen before -> 3/4 novel
    assert out[3].n_grams == 4 and out[3].n_novel == 3


def test_feature_hash_deterministic_and_signed(spark):
    from timeseriesutils_spark.operators.text import feature_hash

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple banana apple")],
        "doc_id long, text string",
    )
    out = feature_hash(docs, buckets=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.value
    # identical docs -> identical feature maps
    assert by_doc[1] == by_doc[2]
    # apple counted twice with one sign: |value| for its slot is 2 or, if
    # banana collides into the same slot, the signed sum of both
    assert all(0 <= b < 8 for b in by_doc[1])
    assert sum(abs(v) for v in by_doc[1].values()) >= 1


def test_feature_hash_partition_invariant(spark):
    from timeseriesutils_spark.operators.text import feature_hash

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 5} w{i % 3} common") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, feature_hash(docs.coalesce(1), buckets=16).collect()))
    b = sorted(map(tuple, feature_hash(docs.repartition(8), buckets=16).collect()))
    assert a == b


def test_minhash_estimate_audit_bounds_and_selfdup(spark):
    """Estimate and exact agree at 1.0 for identical docs; both lie in
    [0, 1]; err = est - exact by definition."""
    from timeseriesutils_spark.operators.dedup import minhash_estimate_audit

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again today"),
            (2, "the quick brown fox jumps over the lazy dog again today"),
            (3, "entirely different words that never overlap with anything"),
            (4, "the quick brown fox jumps over a sleepy dog again today"),
        ],
        "doc_id long, text string",
    )
    out = minhash_estimate_audit(docs).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs
    r12 = pairs[(1, 2)]
    assert r12.est_jaccard == 1.0 and r12.jaccard == 1.0 and r12.err == 0.0
    for r in out:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert 0.0 <= r.jaccard <= 1.0
        assert r.err == r.est_jaccard - r.jaccard


def test_bigram_logprob_order_sensitivity(spark):
    """A doc with corpus-frequent bigrams scores lower NLL than one with
    the same words in never-seen order; closed form checked on a tiny
    corpus."""
    import math

    from timeseriesutils_spark.operators.text import bigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat sat"),
            (3, "sat cat the"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    assert out[1].n_bigrams == 2
    assert out[1].mean_nll == out[2].mean_nll
    assert out[3].mean_nll > out[1].mean_nll
    # closed form for doc 1: V=3; 'the cat' (c=2, ctx(the)=2 -> P=3/5),
    # 'cat sat' (c=2, ctx(cat)=3 including doc 3's 'cat the' -> P=3/6)
    q1 = math.floor(-math.log((2 + 1) / (2 + 3)) * 1e9 + 0.5)
    q2 = math.floor(-math.log((2 + 1) / (3 + 3)) * 1e9 + 0.5)
    assert out[1].mean_nll == (q1 + q2) / 1e9 / 2
