"""Explicit cache ownership (functions/cache): ops that persist plan
forks register them in the pin ledger, and cache_scope() evicts them —
a catalog sweep leaves NO net cached blocks behind (VERDICT r3 #9: the
implicit caller-owns-clearCache contract accumulated executor memory
for library users who didn't know it)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _n_cached(spark) -> bool:
    """True if Spark's DataFrame cache manager holds any entry."""
    return not spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_cache_scope_sweeps_catalog_queries(spark):
    import __spark_entry__ as e

    from timeseriesutils_spark.functions.cache import cache_scope, release_all

    spark.catalog.clearCache()
    release_all()
    assert not _n_cached(spark)

    qs = e.queries()
    # the three cache-heaviest families: posting-list dedup (persisted
    # pair fork), iterative graph (edges/nodes/deg), distributed k-means
    # (quantized corpus)
    for name in ("dedup_ngram_jaccard", "pagerank", "kmeans"):
        with cache_scope():
            qs[name](spark, SF_DIR).collect()
        assert not _n_cached(spark), f"{name} leaked cached blocks"


def test_release_all_idempotent(spark):
    from timeseriesutils_spark.functions.cache import pin, release_all

    df = spark.range(10)
    pin(df)
    assert _n_cached(spark)
    assert release_all() == 1
    assert not _n_cached(spark)
    assert release_all() == 0


def test_cache_scope_nested(spark):
    from timeseriesutils_spark.functions.cache import cache_scope, pin

    with cache_scope():
        pin(spark.range(5))
        with cache_scope():
            pin(spark.range(6))
        # inner scope released its pin; outer pin still cached
        assert _n_cached(spark)
    assert not _n_cached(spark)


# --- round-13 parquet-checkpoint tier ---------------------------------------


def test_parquet_checkpoint_cuts_lineage_and_preserves_rows(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.functions.checkpoint import parquet_checkpoint

    df = spark.range(100).select("id", (F.col("id") * 2).alias("v"))
    out = parquet_checkpoint(df, "t")
    assert sorted(r["v"] for r in out.collect()) == sorted(
        r["v"] for r in df.collect()
    )
    # lineage is cut: the plan is a scan, no Range/Project chain
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Range" not in plan


def test_parquet_checkpoint_local_mode_env(spark, monkeypatch):
    from timeseriesutils_spark.functions.checkpoint import parquet_checkpoint

    monkeypatch.setenv("TSU_CHECKPOINT_MODE", "local")
    df = spark.range(10)
    out = parquet_checkpoint(df, "t")
    # localCheckpoint path: no parquet scan in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan
    assert out.count() == 10


def test_checkpoint_once_memoizes_per_key(spark):
    from timeseriesutils_spark.functions import checkpoint as ck

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(7)

    a = ck.checkpoint_once("test-memo-key", build, spark)
    b = ck.checkpoint_once("test-memo-key", build, spark)
    assert calls["n"] == 1  # second caller served from the memo
    assert a.count() == 7 and b.count() == 7
