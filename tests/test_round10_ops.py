"""Round-10 regression tests: the three round-9 ADVICE items
(gains_curve ceil contract, ad_test degenerate-group parity,
gibberish_score NULL contract) plus the round-10 operator wave."""
from __future__ import annotations

import pytest


# --- gains_curve: cutoff is a TRUE ceil (r9 ADVICE #1) -----------------------


def test_gains_curve_ceil_cutoffs_non_divisible(spark):
    from timeseriesutils_spark.operators.mleval import gains_curve

    # n = 7 rows, distinct scores 7..1, positives at the top 2 scores.
    # cutoff_b = ceil(7*b/10) = [1,2,3,3,4,5,5,6,7,7] — the old
    # floor form gave [0,1,2,2,3,...] (bucket 1 EMPTY), so this pins
    # the documented ceil contract.
    rows = [("g", float(7 - i), i < 2) for i in range(7)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = {r.bucket: r for r in gains_curve(df, "s", "y", ["g"]).collect()}
    expected_cut = {b: -(-7 * b // 10) for b in range(1, 11)}
    for b in range(1, 11):
        assert out[b].n_included == expected_cut[b], (b, out[b])
    assert out[1].pos_included == 1 and out[1].gains == pytest.approx(0.5)
    assert out[2].pos_included == 2 and out[2].gains == 1.0


def test_gains_curve_ceil_matches_duckdb_twin(spark):
    import duckdb

    from timeseriesutils_spark.operators.mleval import (
        gains_curve,
        gains_curve_sql,
    )

    rows = [("g", float(7 - i), i < 2) for i in range(7)]
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    got = sorted(
        (r.bucket, r.n_included, r.pos_included)
        for r in gains_curve(df, "s", "y", ["g"]).collect()
    )
    vals = ", ".join(
        f"('g', {s}, {str(y).lower()})" for _, s, y in rows
    )
    data = f"SELECT * FROM (VALUES {vals}) AS t(g, s, y)"
    sql = gains_curve_sql(data, "s", "y", ["g"])
    res = duckdb.sql(sql).fetchall()
    # twin columns: (g, bucket, cutoff_frac, n_included, pos_included, ...)
    cols = [d[0] for d in duckdb.sql(sql).description]
    bi, ni, pi = (
        cols.index("bucket"),
        cols.index("n_included"),
        cols.index("pos_included"),
    )
    want = sorted((int(r[bi]), int(r[ni]), int(r[pi])) for r in res)
    assert got == want


# --- ad_test: degenerate single-row groups drop in BOTH engines --------------


def test_ad_test_single_row_group_drops_identically(spark):
    import duckdb

    from timeseriesutils_spark.operators.nonparam import ad_test, ad_test_sql

    rows = [("solo", "a", 1.0)]
    for i in range(8):
        rows.append(("ok", "a" if i % 2 == 0 else "b", float(i)))
    df = spark.createDataFrame(rows, "g string, f string, v double")
    out = {r.g for r in ad_test(df, "v", "f", "a", "b", ["g"]).collect()}
    assert out == {"ok"}  # solo dropped, not surfaced with Inf/NULL junk

    vals = ", ".join(f"('{g}', '{f}', {v})" for g, f, v in rows)
    data = f"SELECT * FROM (VALUES {vals}) AS t(g, f, v)"
    res = duckdb.sql(ad_test_sql(data, "v", "f", "a", "b", ["g"])).fetchall()
    assert {r[0] for r in res} == {"ok"}


# --- gibberish_score: NULL text == empty text in all three paths -------------


def test_gibberish_null_contract_all_paths(spark):
    import duckdb

    from timeseriesutils_spark.operators.text import (
        gibberish_score,
        gibberish_score_sql,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id int, text string"
    )
    for eng in ("arrow", "expr"):
        out = {
            r.doc_id: r
            for r in gibberish_score(df, engine=eng).collect()
        }
        for d in (1, 2):
            r = out[d]
            assert r.n_chars == 0, (eng, d, r)
            assert r.alpha_frac == 0.0 and r.char_entropy == 0.0
            assert r.gibberish is True

    data = (
        "SELECT * FROM (VALUES (1, CAST(NULL AS VARCHAR)), (2, ''))"
        " AS t(doc_id, text)"
    )
    res = duckdb.sql(gibberish_score_sql(data)).fetchall()
    cols = [d[0] for d in duckdb.sql(gibberish_score_sql(data)).description]
    nc, gi = cols.index("n_chars"), cols.index("gibberish")
    assert len(res) == 2
    for r in res:
        assert r[nc] == 0 and r[gi] is True
