"""Distributed Lloyd k-means (operators/kmeans) + shard assignment
(operators/splits.shard_assign): correctness on synthetic blobs,
determinism under repartitioning, empty-cluster policy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.kmeans import kmeans_lloyd
from timeseriesutils_spark.operators.splits import shard_assign


def _blobs(spark):
    # two well-separated 4-d blobs around (0,0,0,0) and (10,10,10,10)
    rows = []
    for i in range(20):
        off = 0.01 * i
        rows.append((i, [0.0 + off, 0.1, 0.0, 0.1 - off]))
        rows.append((100 + i, [10.0 + off, 10.1, 10.0, 10.1 - off]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_blobs(spark):
    # seed one centroid per blob (the documented quality-init path);
    # Lloyd must keep them there and pull every point to its own blob
    out = kmeans_lloyd(_blobs(spark), k=2, n_iter=3, init_ids=[0, 100]).collect()
    by_id = {r.vec_id: r.cluster for r in out}
    low = {by_id[i] for i in range(20)}
    high = {by_id[100 + i] for i in range(20)}
    assert len(low) == 1 and len(high) == 1 and low != high
    assert len(out) == 40


def test_kmeans_deterministic_under_repartition(spark):
    df = _blobs(spark)
    a = sorted(map(tuple, kmeans_lloyd(df, k=3, n_iter=2).collect()))
    b = sorted(map(tuple, kmeans_lloyd(df.repartition(7), k=3, n_iter=2).collect()))
    assert a == b


def test_kmeans_zero_iter_assigns_to_init(spark):
    # n_iter=0: assignment against the raw init centroids; the init
    # vectors themselves must land on their own centroid at distance 0
    out = {r.vec_id: r for r in kmeans_lloyd(_blobs(spark), k=2, n_iter=0).collect()}
    assert out[0].cluster == 0 and out[0].dist_q == 0
    assert out[1].cluster == 1 and out[1].dist_q == 0


def test_kmeans_identical_vectors_tie_break_and_empty_clusters(spark):
    # every vector identical: all distances tie → everything lands on
    # cluster 0 (lowest index wins); cluster 1 goes empty and must KEEP
    # its previous centroid (the documented empty-cluster policy) rather
    # than crash or drift
    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_lloyd(df, k=2, n_iter=2).collect()
    assert {r.cluster for r in out} == {0}
    assert all(r.dist_q == 0 for r in out)


def test_kmeans_validates(spark):
    df = _blobs(spark)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(df.limit(3), k=5)


def test_shard_assign_contract(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = shard_assign(df, "doc_id", n_shards=8, seed="s0").collect()
    assert len(out) == 500
    shards = {}
    for r in out:
        assert 0 <= r.shard < 8
        shards.setdefault(r.shard, []).append(r.shard_pos)
    # positions are exactly 0..n-1 within each shard
    for positions in shards.values():
        assert sorted(positions) == list(range(len(positions)))
    # md5 balance: no shard empty or dominant at n=500, k=8
    sizes = sorted(len(v) for v in shards.values())
    assert sizes[0] > 20 and sizes[-1] < 150


def test_shard_assign_deterministic_and_seeded(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = sorted(map(tuple, shard_assign(df, "doc_id", 4, "s0").collect()))
    b = sorted(map(tuple, shard_assign(df.repartition(5), "doc_id", 4, "s0").collect()))
    assert a == b
    c = sorted(map(tuple, shard_assign(df, "doc_id", 4, "s1").collect()))
    assert a != c  # a new seed is a new permutation
