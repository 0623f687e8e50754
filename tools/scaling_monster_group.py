"""Monster-group scaling study for the window/featurize family — the
round-6 companion to the round-5 dedup/ANN curves (BASELINE.md): does
chunked_trailing_features actually buy wall-time once one group holds a
constant 25% share of a growing corpus, and at what chunk size?

Method: synthetic series built distributed (spark.range — no driver
data): SCALE x the 150k-row base, 256 normal groups sharing 75% of the
rows, ONE monster group holding 25%.  Values are a deterministic
function of the row id.  At each scale we time (best of 2 warm runs,
noop sink):

  * plain   — windowed_taylor_coefs degree-2 w14 trailing (the monster
              group serializes into a single window task),
  * chunked — chunked_taylor_trailing at chunk_rows in {4k, 32k}.

Bit-identity of the two paths is property-tested in tests/test_chunked
and cross-engine-gated by the `chunked_taylor` query; this script
asserts it once more at the smallest scale, then measures.

Usage:  python tools/scaling_monster_group.py [scales ...]
        (default: 4 16 64)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_ROWS = 150_000
# Two regimes, selected via MG_GROUPS:
#   256 (default) — groups >> cores at local[32]: plain is already
#                   core-saturated, chunking can only add overhead.
#   4             — groups << cores: the regime a monster group creates
#                   on a real cluster (executors idle behind one serial
#                   window task); chunking restores the parallelism.
N_GROUPS = int(os.environ.get("MG_GROUPS", "256"))
MONSTER_SHARE = 0.25
TAYLOR = dict(taylor_degree=2, window_size=14, ew_span=None, fill_edges=True)


def build(spark, scale: int):
    """Deterministic skewed series: 25% of rows in group 0, rest spread
    uniformly over groups 1..N_GROUPS."""
    from pyspark.sql import functions as F

    n = BASE_ROWS * scale
    n_monster = int(n * MONSTER_SHARE)
    df = spark.range(n).select(
        F.when(F.col("id") < n_monster, F.lit(0))
        .otherwise((F.col("id") % (N_GROUPS - 1)) + 1)
        .cast("bigint")
        .alias("g"),
        F.col("id").alias("t"),  # unique per row -> total order per group
        (
            (F.col("id") * 2654435761 % 1000003).cast("double") / 100.0
        ).alias("y"),
    )
    return df.repartition(32, "g", (F.col("t") % 64))


def run_plain(spark, df):
    from timeseriesutils_spark.operators.taylor import windowed_taylor_coefs

    out, _ = windowed_taylor_coefs(
        df, "y", ["g"], window_align="trailing", order_by=["t"], **TAYLOR
    )
    out.write.format("noop").mode("overwrite").save()


def run_chunked(spark, df, chunk_rows: int, distributed: bool = False):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.chunked import chunked_taylor_trailing

    # bucket width ~2x chunk_rows over the monster group's t-density:
    # t is dense over the monster prefix, so /8192 gives rows/bucket
    # ≈ 8192 there and fewer elsewhere — buckets-per-group stays
    # dimension-sized at every scale
    bucket = F.floor(F.col("t") / 8192) if distributed else None
    out, _ = chunked_taylor_trailing(
        df, "y", ["g"], ["t"], chunk_rows=chunk_rows, bucket=bucket, **TAYLOR
    )
    out.write.format("noop").mode("overwrite").save()


def best_of(fn, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scales = [int(s) for s in sys.argv[1:]] or [4, 16, 64]
    from timeseriesutils_spark.session import get_spark

    spark = get_spark(app_name="monster-group-scaling")

    # one-time identity check at the smallest scale
    df0 = build(spark, 1).cache()
    from timeseriesutils_spark.operators.chunked import chunked_taylor_trailing
    from timeseriesutils_spark.operators.taylor import windowed_taylor_coefs

    a, _ = windowed_taylor_coefs(
        df0, "y", ["g"], window_align="trailing", order_by=["t"], **TAYLOR
    )
    b, _ = chunked_taylor_trailing(df0, "y", ["g"], ["t"], chunk_rows=4096, **TAYLOR)
    from timeseriesutils_spark.functions.names import taylor_name

    feats = [
        taylor_name("y", TAYLOR["taylor_degree"], d, TAYLOR["window_size"],
                    "trailing", TAYLOR["ew_span"])
        for d in range(TAYLOR["taylor_degree"] + 1)
    ]
    cond = None
    for f in feats:
        eq = a[f].eqNullSafe(b[f])
        cond = eq if cond is None else (cond & eq)
    mism = a.join(b, ["g", "t"], "full").filter(~cond).count()
    print(f"identity check at 1x: {mism} mismatching rows", flush=True)
    assert mism == 0
    df0.unpersist()

    for scale in scales:
        df = build(spark, scale).cache()
        df.count()  # materialize the input once; time only the feature op
        n_monster = int(BASE_ROWS * scale * MONSTER_SHARE)
        t_plain = best_of(lambda: run_plain(spark, df))
        t_c4k = best_of(lambda: run_chunked(spark, df, 4096))
        t_c32k = best_of(lambda: run_chunked(spark, df, 32768))
        t_d32k = best_of(lambda: run_chunked(spark, df, 32768, distributed=True))
        print(
            f"scale {scale}x: rows={BASE_ROWS*scale:,} monster={n_monster:,} "
            f"plain={t_plain:.2f}s chunked4k={t_c4k:.2f}s "
            f"chunked32k={t_c32k:.2f}s distchunk32k={t_d32k:.2f}s",
            flush=True,
        )
        df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
