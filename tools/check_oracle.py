"""Local stand-in for the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given SF, then compares
row-count + schema (column names) + exact multiset of values (floats
compared bitwise — stricter than any reasonable driver hash).

Usage: python tools/check_oracle.py [--tier core|audit|demo|all]
       [sf_dir] [query ...]

Default runs the core tier only (catalog governance — see
queries/__init__.TIERS); explicit query names, ``--tier all``, and
``--json`` runs always sweep the full catalog.

With ``--json PATH``, also writes a driver-style correctness artifact
(one row per query: rows/schema/hash match booleans) covering the FULL
catalog — the driver itself caps at 50 rows per round, this file is the
repo's complete record (committed as CORRECTNESS_LOCAL.json).
"""

from __future__ import annotations

import json
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
        return problems
    s = spark_df[s_cols].copy()
    o = oracle_df[s_cols].copy()
    for c in s_cols:
        # normalize: decimals → float, timestamps → int64 ns, categories → str
        for df in (s, o):
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]").astype("int64")
            elif df[c].dtype == object:
                df[c] = df[c].astype(str)
    s = s.sort_values(s_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    o = o.sort_values(s_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    if len(s) != len(o):
        return problems
    for c in s_cols:
        a, b = s[c].to_numpy(), o[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            # the driver's value hash stringifies raw cells, so int64 5 vs
            # float64 5.0 is a hash MISMATCH even though values are equal —
            # flag dtype-class divergence (e.g. DuckDB SUM(int)→HUGEINT→f64)
            if (a.dtype.kind == "f") != (b.dtype.kind == "f"):
                problems.append(
                    f"col {c}: dtype class differs spark={a.dtype} oracle={b.dtype}"
                    " (int-vs-float breaks the driver hash)"
                )
            a = a.astype("float64")
            b = b.astype("float64")
            # equal iff bitwise-equal values or NaN on BOTH sides;
            # NaN-vs-value falls through to a mismatch
            bad = ~((a == b) | (np.isnan(a) & np.isnan(b)))
        else:
            bad = a != b
        nbad = int(np.asarray(bad).sum())
        if nbad:
            idx = np.asarray(bad).nonzero()[0][:3]
            problems.append(
                f"col {c}: {nbad} mismatched values, e.g. "
                + "; ".join(f"[{i}] spark={s[c].iloc[i]!r} oracle={o[c].iloc[i]!r}" for i in idx)
            )
    return problems


def main() -> int:
    argv = list(sys.argv[1:])
    json_path = None
    json_merge = False
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    if "--json-update" in argv:
        # incremental gate-record refresh: run only the NAMED queries
        # and merge their rows into the existing artifact — keeps the
        # find_ungated_queries() rule livable mid-round (full sweeps
        # stay the finalizer's job)
        i = argv.index("--json-update")
        json_path = argv[i + 1]
        json_merge = True
        del argv[i : i + 2]
    tier_sel = "core"
    if "--tier" in argv:
        i = argv.index("--tier")
        tier_sel = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e
    from timeseriesutils_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    # Tier gating (catalog governance): core-only by default for the
    # iteration loop; explicit names, --tier all, and --json artifact
    # runs (CORRECTNESS_LOCAL.json is the repo's complete record) always
    # sweep everything.
    from timeseriesutils_spark.queries import tier

    skipped_tiers = 0
    failed = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if (
            not only
            and json_path is None
            and tier_sel != "all"
            and tier(name) != tier_sel
        ):
            skipped_tiers += 1
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # record, keep checking the rest
            failed.append(name)
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "oracle_rows": None, "err": f"spark: {exc}"[:300]}
            print(f"{name}: FAIL (spark error: {exc})")
            continue
        spark.catalog.clearCache()  # evict per-query persist() forks
        if name not in oracles:
            # the driver canonicalizes rows-only results too: an array-typed
            # output column would crash its sort_values — reproduce that here
            try:
                sdf.sort_values(sorted(sdf.columns), kind="mergesort")
            except TypeError as exc:
                failed.append(name)
                report[name] = {"rows_match": None, "schema_match": None,
                                "hash_match": None, "spark_rows": len(sdf),
                                "oracle_rows": None, "err": f"canon: {exc}"[:300]}
                print(f"{name}: FAIL (rows-only result not canonicalizer-safe: {exc})")
                continue
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(sdf),
                            "oracle_rows": None, "err": "no_oracle"}
            print(f"{name}: rows-only ({len(sdf)} rows) — no oracle")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # record, keep checking the rest —
            # a parse/bind error in ONE oracle must not kill the sweep
            # (round-8: FROM (documents) aborted the gate run, VERDICT §3)
            failed.append(name)
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(sdf),
                            "oracle_rows": None, "err": f"oracle: {exc}"[:300]}
            print(f"{name}: FAIL (oracle error: {exc})")
            continue
        try:
            problems = compare(name, sdf, odf)
        except Exception as exc:
            failed.append(name)
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": len(sdf),
                            "oracle_rows": len(odf), "err": f"compare: {exc}"[:300]}
            print(f"{name}: FAIL (compare error: {exc})")
            continue
        schema_ok = not any(p.startswith("columns") for p in problems)
        rows_ok = len(sdf) == len(odf)
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": not problems, "spark_rows": len(sdf),
                        "oracle_rows": len(odf), "err": None}
        if problems:
            failed.append(name)
            print(f"{name}: FAIL")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"{name}: OK ({len(sdf)} rows, {len(sdf.columns)} cols)")
    spark.stop()
    if json_path:
        if json_merge:
            import os

            merged = {}
            if os.path.exists(json_path):
                with open(json_path) as f:
                    merged = json.load(f)
            merged.update(report)
            # prune rows for queries no longer in the catalog
            report = {k: v for k, v in merged.items() if k in qs}
        with open(json_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_path} ({len(report)} rows)")
    if skipped_tiers:
        print(
            f"(skipped {skipped_tiers} non-{tier_sel}-tier queries — "
            "use --tier all or --json for the full sweep)"
        )
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
