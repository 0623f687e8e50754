"""Split a query's wall time into construction / planning / execution.

For each named catalog query, times (guide §7.3 — when the driver, not
the cluster, is the bottleneck):

  * construct — ``fn(spark, sf_dir)``: Python DataFrame building (py4j
    chatter, eager sub-jobs of iterative operators);
  * plan — first ``explain`` round-trip: Catalyst analysis +
    optimization + physical planning of the final frame;
  * execute — the noop write (includes AQE re-planning per stage).

Usage: python tools/attribute_time.py [--sf-dir DIR] [--runs N] name ...
Prints one JSON line per query.
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
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as e
    from timeseriesutils_spark.session import get_spark
    from timeseriesutils_spark.sources.tables import TABLES, load_table

    qs = e.queries()
    missing = [n for n in args.names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    spark = get_spark(app_name="tsspark-attribute")
    for t in TABLES:
        load_table(spark, args.sf_dir, t).limit(1).count()
    warm = "/root/testdata/sf0.001"
    for n in args.names:
        try:
            qs[n](spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()

    for n in args.names:
        best = None
        for _ in range(max(1, args.runs)):
            t0 = time.perf_counter()
            df = qs[n](spark, args.sf_dir)
            t1 = time.perf_counter()
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            cur = {
                "construct": round(t1 - t0, 3),
                "plan": round(t2 - t1, 3),
                "execute": round(t3 - t2, 3),
                "total": round(t3 - t0, 3),
            }
            if best is None or cur["total"] < best["total"]:
                best = cur
            spark.catalog.clearCache()
        print(json.dumps({"query": n, **best}))
    spark.stop()


if __name__ == "__main__":
    main()
