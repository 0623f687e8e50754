"""Group-SIZE crossover study: O(n²) expression form vs O(n log n)
Arrow kernel for kendall_tau and hodges_lehmann (VERDICT r11 item 3).

The r11 10x studies grew group COUNT (more groups of the same size) —
the axis where the O(n²) expression form wins on JVM-side constant
factors.  The crossover axis for pairwise-vs-sort kernels is rows PER
GROUP, so here the corpus is a FIXED 8 groups with n rows each,
n ∈ scales, built distributed (spark.range, deterministic id-derived
values, no driver data).

At the smallest n the two engines are asserted bit-identical (the
standing pin), then each is timed best-of-2 warm (noop sink).

Usage: python tools/scaling_group_size.py [n ...]   (default 250 2500 10000)
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_GROUPS = 8


def build(spark, n_per_group: int):
    from pyspark.sql import functions as F

    n = n_per_group * N_GROUPS
    df = (
        spark.range(n)
        .select(
            (F.col("id") % N_GROUPS).alias("g"),
            (F.col("id") / N_GROUPS).cast("bigint").alias("t"),
            # deterministic pseudo-noise with real tie mass at scale=2
            (
                F.sin(F.col("id").cast("double") * 0.7) * 50.0
                + (F.col("id") % 13).cast("double")
            ).alias("x"),
            (
                F.cos(F.col("id").cast("double") * 0.3) * 40.0
                + (F.col("id") % 7).cast("double")
            ).alias("y"),
        )
        .repartition("g")
    )
    df.persist().count()
    return df


def time_once(fn) -> float:
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    from timeseriesutils_spark.operators.nonparam import (
        hodges_lehmann,
        kendall_tau,
    )
    from timeseriesutils_spark.session import get_spark

    scales = [int(a) for a in sys.argv[1:]] or [250, 2500, 10000]
    spark = get_spark(app_name="tsspark-groupsize")
    out: dict[str, dict] = {}

    # bit-identity pin at a fixed small size (an O(n^2)-envelope OOM at
    # the pin would kill the shared JVM before any measurement)
    df0 = build(spark, 250)
    a = sorted(map(tuple, kendall_tau(df0, "x", "y", ["g"], ["t"], engine="pairs").collect()))
    b = sorted(map(tuple, kendall_tau(df0, "x", "y", ["g"], ["t"], engine="arrow").collect()))
    assert a == b, "kendall engines diverged"
    ha = sorted(map(tuple, hodges_lehmann(df0, "x", ["g"], engine="expr").collect()))
    hb = sorted(map(tuple, hodges_lehmann(df0, "x", ["g"], engine="arrow").collect()))
    assert ha == hb, "hodges_lehmann engines diverged"
    df0.unpersist()

    # the quadratic engines materialize n^2/2 pair rows per group; past
    # this cap they OOM the single shared JVM (that IS the envelope
    # finding) -- record the skip instead of killing the study
    pairs_max_n = int(os.environ.get("GS_PAIRS_MAX_N", "5000"))
    for n in scales:
        df = build(spark, n)
        row = {}
        for eng in ("pairs", "arrow"):
            if eng == "pairs" and n > pairs_max_n:
                row["kendall_pairs"] = row["hl_pairs"] = "SKIPPED: O(n^2) envelope"
                continue
            try:
                row[f"kendall_{eng}"] = round(
                    min(
                        time_once(lambda: kendall_tau(df, "x", "y", ["g"], ["t"], engine=eng))
                        for _ in range(2)
                    ),
                    3,
                )
            except Exception as ex:  # O(n^2) form past its envelope
                row[f"kendall_{eng}"] = f"FAILED: {type(ex).__name__}"
            try:
                row[f"hl_{eng}"] = round(
                    min(
                        time_once(lambda: hodges_lehmann(df, "x", ["g"], engine="expr" if eng == "pairs" else eng))
                        for _ in range(2)
                    ),
                    3,
                )
            except Exception as ex:
                row[f"hl_{eng}"] = f"FAILED: {type(ex).__name__}"
        out[str(n)] = row
        df.unpersist()
        print(f"n={n}: {row}", file=sys.stderr)

    print(json.dumps({"n_groups": N_GROUPS, "results": out}))


if __name__ == "__main__":
    main()
