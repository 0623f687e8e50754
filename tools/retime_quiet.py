"""Targeted quiet-window re-timer (round-10 attribution, VERDICT r9 #2/#8).

Times a named subset of catalog queries best-of-N at a given SF dir, with
the same warmup discipline as bench.py (footer reads, sf0.001 codegen warm,
one untimed measured-SF pass per query).  Prints one JSON line:
{"loadavg": [...], "runs": N, "sf_dir": ..., "timings": {name: best_sec}}.

Usage: python tools/retime_quiet.py [--runs 3] [--sf-dir DIR] name [name ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as e
    from timeseriesutils_spark.session import get_spark
    from timeseriesutils_spark.sources.tables import TABLES, load_table

    qs = e.queries()
    missing = [n for n in args.names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    load0 = os.getloadavg()
    spark = get_spark(app_name="tsspark-retime")
    for t in TABLES:
        load_table(spark, args.sf_dir, t).limit(1).count()
    warm_dir = "/root/testdata/sf0.001"
    for n in args.names:
        try:
            qs[n](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for n in args.names:
        fn = qs[n]
        # one untimed measured-SF pass (cold shuffle/file-handle init)
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(max(1, args.runs)):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[n] = round(best, 4)

    print(json.dumps({
        "loadavg": [load0[0], os.getloadavg()[0]],
        "runs": args.runs,
        "sf_dir": args.sf_dir,
        "timings": timings,
    }))


if __name__ == "__main__":
    main()
