"""Heavy-tail scale smoke (round-7, VERDICT r6 item 6): run the most
expensive catalog queries at a 10x-sf0.1-equivalent corpus and record
seconds-per-input-row curvature in BASELINE.md.

Replica construction (all distributed, deterministic, written to /tmp —
never to /root/testdata), designed so per-replica STRUCTURE is constant
as the corpus grows (the round-5 lesson: naive replication creates
dup-cliques and measures the clique blowup, not the engine):

* documents  xK — doc_id shifted by K*max; a replica token injected
  after every 3rd word makes shingle sets replica-disjoint, so the
  near-dup rate stays constant (same trick as the r5 curves).
* embeddings xK — vec_id shifted; every replica multiplies components
  by a deterministic +-1 sign pattern s_r (parity of xxhash64(r, i)).
  Cosine is exactly invariant under a shared sign flip, so each
  replica's internal neighbor structure is bit-identical to the base,
  while cross-replica dot products are random-sign sums ~ 0 — no
  planted cross-replica neighbors.
* lineitem   xK — l_suppkey / l_partkey / l_orderkey shifted per
  replica: K-times more suppliers and parts with identical per-entity
  series (the realistic growth axis for per-entity window/forecast
  ops; series LENGTH growth is the monster-group study's axis).

Both the 1x and Kx corpora are written by this script (multi-file,
snappy parquet), so file-layout effects cancel in the ratio — the sf0.1
originals are single-row-group files (BASELINE.md round-7 note) and
would understate the 1x denominator.

curvature := t_Kx / (K * t_1x); 1.0 = perfectly linear scaling, < 1 =
economies of scale (fixed per-query overhead amortizing), > 1 =
super-linear (a scale bug: clique blowup, bucket saturation, serial
stage).

Usage:  python tools/scaling_heavy_tail.py [K] [query ...]
        (default K=10, default queries = the round-6 top-10 list)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/tsspark_scale")

HEAVY = [
    "semantic_dedup", "knn_recall_curve", "pagerank", "tech_indicators",
    "dup_spans", "croston_demand", "rolling_mad", "dtw_pattern",
    "minhash_estimate_audit", "simhash",
]

# entity-id shift bases, > any sf0.1 key
SUPP_BASE = 10_000
PART_BASE = 100_000
ORDER_BASE = 10_000_000
DOC_BASE = 1_000_000
VEC_BASE = 1_000_000
EV_BASE = 10_000_000
USER_BASE = 1_000_000


def build(spark, k: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from timeseriesutils_spark.sources.tables import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(k).select(F.col("id").alias("_r"))

    def _write(df, name, n_files):
        df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out_dir, name + ".parquet")
        )

    docs = load_table(spark, SRC, "documents")
    # inject " ~r<replica>" after every 3rd word -> replica-disjoint
    # 3-gram shingles at constant per-replica dup structure
    d = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("_r") * DOC_BASE).alias("doc_id"),
        F.when(F.col("_r") == 0, F.col("text")).otherwise(
            F.concat_ws(
                " ",
                F.expr(
                    "flatten(transform(split(text, ' '), (w, i) -> "
                    "IF((i + 1) % 3 = 0, array(w, concat('zrep', _r)), array(w))))"
                ),
            )
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    ).withColumn("n_chars", F.length("text"))
    _write(d, "documents", 4 * k)

    emb = load_table(spark, SRC, "embeddings")
    e = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("_r") * VEC_BASE).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(x * "
            "IF(_r = 0 OR pmod(xxhash64(_r, i), 2) = 0, 1.0, -1.0) AS FLOAT))"
        ).alias("embedding"),
        "label",
    )
    _write(e, "embeddings", 2 * k)

    li = load_table(spark, SRC, "lineitem")
    l = li.crossJoin(F.broadcast(reps)).select(
        (F.col("l_orderkey") + F.col("_r") * ORDER_BASE).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("_r") * PART_BASE).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("_r") * SUPP_BASE).alias("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    )
    _write(l, "lineitem", 8 * k)

    # events/customer replicate on the USER axis (r11: the survival
    # family's growth dimension — K× more users with identical
    # per-user event histories, so per-segment lifetime samples grow
    # K× at constant distribution shape)
    ev = load_table(spark, SRC, "events")
    evr = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("event_id") + F.col("_r") * EV_BASE).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_r") * USER_BASE).alias("user_id"),
        "event_type", "value", "props",
    )
    _write(evr, "events", 2 * k)
    cust = load_table(spark, SRC, "customer")
    other = [c for c in cust.columns if c != "c_custkey"]
    cr = cust.crossJoin(F.broadcast(reps)).select(
        (F.col("c_custkey") + F.col("_r") * USER_BASE).alias("c_custkey"),
        *other,
    )
    _write(cr, "customer", 1)

    for t in TABLES:
        if t in ("documents", "embeddings", "lineitem", "events", "customer"):
            continue
        _write(load_table(spark, SRC, t), t, 1)


def main() -> None:
    argv = sys.argv[1:]
    k = int(argv[0]) if argv else 10
    names = argv[1:] or HEAVY

    import __spark_entry__ as e
    from timeseriesutils_spark.functions.cache import release_all
    from timeseriesutils_spark.session import get_spark

    spark = get_spark(app_name="heavy-tail-scale")
    qs = dict(e.queries())

    def _pq_encode_batch(s, d):
        # stream_pq_encode's batch side (r11 curvature row): train the
        # 8x64 codebooks on the same frozen 256-vector md5 sample the
        # streaming query uses, then ONE Arrow encode pass over the
        # full corpus — the per-row work every micro-batch repeats.
        from pyspark.sql import functions as F

        from timeseriesutils_spark.operators.dedup import portable_hash64
        from timeseriesutils_spark.operators.kmeans import _quantize
        from timeseriesutils_spark.operators.similarity import (
            _pq_train_books_driver,
        )

        m, n_codes, n_sample, n_iter, scale, dim = 8, 64, 256, 3, 6, 64
        emb = s.read.parquet(f"{d}/embeddings.parquet")
        sample = emb.orderBy(
            portable_hash64(F.col("vec_id").cast("string")), F.col("vec_id")
        ).limit(n_sample)
        qrows = [
            (r[0], list(r[1]))
            for r in sample.select(
                "vec_id", _quantize(F.col("embedding"), scale)
            ).orderBy("vec_id").collect()
        ]
        books = _pq_train_books_driver(qrows, m, dim // m, n_codes, n_iter)
        from timeseriesutils_spark.streaming.windows import stream_pq_encode

        return stream_pq_encode(emb, books, scale=scale)

    qs["pq_encode_batch"] = _pq_encode_batch

    def _stream_conformal_one_trigger(s, d):
        # VERDICT r13 #3: the controlled trigger-sizing re-run.  The
        # replica corpus writes 2*K event files, and the catalog
        # query's default maxFilesPerTrigger=1 turns the 10x corpus
        # into ~10x MORE micro-batches x 10x keys = ~100x per-key
        # state visits — the attributed super-linear artifact.  Holding
        # the micro-batch count constant (drain everything in ONE
        # trigger, the production trigger rule for replayable
        # backfills) isolates the true per-row cost.
        import uuid

        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        from timeseriesutils_spark.streaming.windows import (
            read_events_stream,
            streaming_conformal,
        )

        name = f"q_sconf1t_{uuid.uuid4().hex[:8]}"
        q = (
            streaming_conformal(
                read_events_stream(s, d, max_files_per_trigger=10_000),
                fit_window=14,
                cal_window=64,
                scale=2,
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        upd = s.sql(f"SELECT * FROM {name}")
        w = W.partitionBy("user_id").orderBy(F.col("n_seen").desc())
        return (
            upd.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                "user_id", "n_seen", "n_cal", "q_score",
                "point_forecast", "lo", "hi",
            )
        )

    qs["stream_conformal_one_trigger"] = _stream_conformal_one_trigger
    results: dict[str, dict] = {}
    for scale in (1, k):
        d = os.path.join(WORK, f"x{scale}")
        print(f"== building x{scale} corpus at {d}", flush=True)
        build(spark, scale, d)
        for name in names:
            fn = qs[name]
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            release_all()
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                release_all()
                spark.catalog.clearCache()
            results.setdefault(name, {})[f"x{scale}"] = round(best, 3)
            print(f"{name} x{scale}: {best:.3f} s", flush=True)
        if scale != 1:
            shutil.rmtree(d, ignore_errors=True)

    for name, r in results.items():
        r["curvature"] = round(r[f"x{k}"] / (k * r["x1"]), 3)
    print(json.dumps({"k": k, "results": results}))


if __name__ == "__main__":
    main()
