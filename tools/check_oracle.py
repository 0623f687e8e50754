"""Local stand-in for the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given SF, then compares
row-count + schema (column names) + exact multiset of values (floats
compared bitwise — stricter than any reasonable driver hash).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from timeseriesutils_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        spark.catalog.clearCache()  # evict per-query persist() forks
        if name not in oracles:
            # the driver canonicalizes rows-only results too: an array-typed
            # output column would crash its sort_values — reproduce that here
            try:
                sdf.sort_values(sorted(sdf.columns), kind="mergesort")
            except TypeError as exc:
                failed.append(name)
                print(f"{name}: FAIL (rows-only result not canonicalizer-safe: {exc})")
                continue
            print(f"{name}: rows-only ({len(sdf)} rows) — no oracle")
            continue
        odf = con.execute(oracles[name]).df()
        problems = compare(name, sdf, odf)
        if problems:
            failed.append(name)
            print(f"{name}: FAIL")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"{name}: OK ({len(sdf)} rows, {len(sdf.columns)} cols)")
    spark.stop()
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
