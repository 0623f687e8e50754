import pytest
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.relational import asof_join, dedup_exact, top_k_per_group


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("A", 5, 99.0), ("B", 15, 50.0)],
        "sym string, t int, px double",
    )
    quotes = spark.createDataFrame(
        [("A", 4, 1), ("A", 10, 2), ("A", 10, 3), ("A", 18, 4), ("B", 99, 5)],
        "sym string, qt int, qid int",
    )
    return trades, quotes


def test_asof_backward_with_ties(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="qt",
        right_values=["qid"], tie_break="qid",
    )
    got = {(r["sym"], r["t"]): r["qid"] for r in out.collect()}
    assert got[("A", 5)] == 1       # only qt=4 precedes
    assert got[("A", 10)] == 3      # equal-ts match; tie → greatest qid
    assert got[("A", 20)] == 4
    assert got[("B", 15)] is None   # no quote at or before t=15


def test_asof_preserves_left_rowcount(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="qt", right_values=["qid"]
    )
    assert out.count() == trades.count()


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g", i, float(i % 5)) for i in range(20)], "g string, id int, v double"
    )
    out = top_k_per_group(df, "g", [F.col("v").desc(), F.col("id")], k=3)
    rows = out.orderBy("rn").collect()
    assert [r["id"] for r in rows] == [4, 9, 14]  # v=4.0 three times, id asc


def test_dedup_exact_deterministic(spark):
    df = spark.createDataFrame(
        [("k", 2, "b"), ("k", 1, "a"), ("k", 3, "c"), ("j", 9, "z")],
        "k string, ts int, payload string",
    )
    out = dedup_exact(df, "k", tie_break=[F.col("ts")])
    got = {r["k"]: r["payload"] for r in out.collect()}
    assert got == {"k": "a", "j": "z"}


def test_interval_join_matches_naive(spark):
    from timeseriesutils_spark.operators.relational import interval_join

    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i % 3, rng.randrange(0, 1000), i) for i in range(60)],
        "k int, s long, lid int",
    ).select("k", "s", (F.col("s") + 50).alias("e"), "lid")
    right = spark.createDataFrame(
        [(i % 3, rng.randrange(0, 1050), i) for i in range(80)],
        "k int, t long, rid int",
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_join(left, right, "s", "e", "t", on="k", bucket=64).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(
            right,
            (left.k == right.k) & (right.t >= left.s) & (right.t < left.e),
        ).collect()
    }
    assert got == naive and len(naive) > 0


def test_interval_join_bucket_smaller_than_span(spark):
    from timeseriesutils_spark.operators.relational import interval_join

    left = spark.createDataFrame([(1, 0, 100, 1)], "k int, s long, e long, lid int")
    right = spark.createDataFrame(
        [(1, t, t) for t in range(0, 120, 10)], "k int, t long, rid int"
    )
    out = interval_join(left, right, "s", "e", "t", on="k", bucket=7)
    # [0,100) covers t=0..90 → 10 matches, each exactly once (no dup bins)
    assert sorted(r["rid"] for r in out.collect()) == list(range(0, 100, 10))


def test_salted_agg_equals_plain(spark):
    from timeseriesutils_spark.functions.exact import dsum
    from timeseriesutils_spark.functions.skew import salted_agg
    from timeseriesutils_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    plain = {
        (r["l_returnflag"],): (r["s"], r["n"])
        for r in li.groupBy("l_returnflag")
        .agg(dsum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["s"], r["n"])
        for r in salted_agg(
            li,
            "l_returnflag",
            {"s": dsum("l_quantity"), "n": F.count(F.lit(1))},
            {"s": dsum("s"), "n": F.sum("n")},
            n_salts=16,
        ).collect()
    }
    # exact DECIMAL accumulation => bit-identical regardless of salting
    assert salted == plain


def test_gmean_pandas_udaf(spark):
    import math

    from timeseriesutils_spark.functions.exact import gmean_udaf
    from timeseriesutils_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    got = {
        r["l_returnflag"]: r["g"]
        for r in li.groupBy("l_returnflag")
        .agg(gmean_udaf()(F.col("l_quantity")).alias("g"))
        .collect()
    }
    rows = li.select("l_returnflag", "l_quantity").collect()
    by_flag = {}
    for r in rows:
        if r["l_quantity"] > 0:
            by_flag.setdefault(r["l_returnflag"], []).append(math.log(r["l_quantity"]))
    for flag, logs in by_flag.items():
        assert abs(got[flag] - math.exp(sum(logs) / len(logs))) < 1e-9


def test_asof_emits_time_column_once(spark, trades_quotes):
    """Regression: the left time column must appear exactly once and be
    selectable (it used to be emitted twice → AMBIGUOUS_REFERENCE)."""
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="qt",
        right_values=["qid"], tie_break="qid",
    )
    assert out.columns.count("t") == 1
    vals = {(r["sym"], r["t"]) for r in out.select("sym", "t").collect()}
    assert ("A", 5) in vals and ("B", 15) in vals


def test_asof_join_forward_and_tolerance(spark):
    """merge_asof parity: forward takes the nearest LATER right row;
    tolerance nulls matches beyond the bound; backward unchanged."""
    from timeseriesutils_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 50, "c")], "k long, t long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 90, 10.0), (1, 150, 20.0), (1, 400, 30.0)], "k long, rt long, px double"
    )

    def run(**kw):
        out = asof_join(
            left, right, on="k", left_time="t", right_time="rt",
            right_values=["px"], **kw
        )
        return {(r.k, r.t): r.px for r in out.collect()}

    assert run() == {(1, 100): 10.0, (1, 200): 20.0, (2, 50): None}
    assert run(direction="forward") == {
        (1, 100): 20.0, (1, 200): 30.0, (2, 50): None
    }
    # numeric time axis → tolerance in the same units
    assert run(direction="forward", tolerance_ms=60) == {
        (1, 100): 20.0, (1, 200): None, (2, 50): None
    }
    assert run(tolerance_ms=10) == {(1, 100): 10.0, (1, 200): None, (2, 50): None}


def test_merge_upsert(spark):
    from timeseriesutils_spark.operators.relational import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0, False), (4, "d", 40.0, False), (3, None, 0.0, True)],
        "k long, s string, v double, is_delete boolean",
    )
    got = {
        r.k: (r.s, r.v)
        for r in merge_upsert(base, updates, "k", delete_col="is_delete").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 4: ("d", 40.0)}  # 3 deleted

    # update with NULL value overwrites (update wins on matched rows)
    upd2 = spark.createDataFrame([(1, None, 11.0, False)], "k long, s string, v double, is_delete boolean")
    got2 = {r.k: (r.s, r.v) for r in merge_upsert(base, upd2, "k", "is_delete").collect()}
    assert got2[1] == (None, 11.0) and got2[2] == ("b", 20.0)

    # a NULL delete flag must mean "not a delete", and the update must
    # still APPLY (matched) / INSERT (unmatched) — the matched test uses
    # an independent presence marker, not the user's delete column
    upd3 = spark.createDataFrame(
        [(1, "A", 11.0, None), (5, "e", 50.0, None)],
        "k long, s string, v double, is_delete boolean",
    )
    got3 = {r.k: (r.s, r.v) for r in merge_upsert(base, upd3, "k", "is_delete").collect()}
    assert got3 == {
        1: ("A", 11.0), 2: ("b", 20.0), 3: ("c", 30.0), 5: ("e", 50.0)
    }


def test_key_skew_report_buckets(spark):
    """Power-of-two bucketing is exact at boundaries (2^k lands in
    bucket k) and totals reconcile."""
    from timeseriesutils_spark.operators.profile import key_skew_report

    rows = []
    for k, n in [(1, 1), (2, 2), (3, 4), (4, 8), (5, 1000)]:
        rows += [(k,)] * n
    df = spark.createDataFrame(rows, "k long")
    got = {r.freq_bucket: (r.n_keys, r.n_rows, r.max_key_rows)
           for r in key_skew_report(df, ["k"]).collect()}
    assert got[0] == (1, 1, 1)
    assert got[1] == (1, 2, 2)
    assert got[2] == (1, 4, 4)
    assert got[3] == (1, 8, 8)
    assert got[9] == (1, 1000, 1000)  # floor(log2(1000)) = 9
    assert sum(v[1] for v in got.values()) == len(rows)


def test_quantile_bins_equal_frequency(spark):
    """NTILE deciles: bin sizes differ by at most 1, ranges are
    non-overlapping and ordered."""
    from timeseriesutils_spark.operators.stats import quantile_bins

    rows = [(1, i, float((i * 37) % 101)) for i in range(95)]
    df = spark.createDataFrame(rows, "g long, id long, v double")
    got = sorted(
        (r.bin, r.n, r.lo, r.hi)
        for r in quantile_bins(df, "v", ["g"], n_bins=10, order_tiebreak=["id"]).collect()
    )
    sizes = [n for _, n, _, _ in got]
    assert len(got) == 10 and max(sizes) - min(sizes) <= 1 and sum(sizes) == 95
    for (b1, _, _, hi1), (b2, _, lo2, _) in zip(got, got[1:]):
        assert b2 == b1 + 1 and lo2 >= hi1


def test_temporal_join_picks_valid_version(spark):
    from timeseriesutils_spark.operators.relational import temporal_join

    dim = spark.createDataFrame(
        [
            (1, 0, 100, "v1"),
            (1, 100, None, "v2"),   # open-ended current version
            (2, 50, 60, "w1"),
        ],
        "k long, valid_from_ms long, valid_to_ms long, attr string",
    )
    fact = spark.createDataFrame(
        [(1, 0), (1, 99), (1, 100), (1, 5000), (2, 55), (2, 70), (3, 10)],
        "k long, ts long",
    )
    out = temporal_join(fact, dim, "k", "ts")
    got = {(r.k, r.ts): (r.attr, r.version_from_ms) for r in out.collect()}
    assert len(got) == 7                      # left join preserves rows
    assert got[(1, 0)] == ("v1", 0)           # inclusive from
    assert got[(1, 99)] == ("v1", 0)
    assert got[(1, 100)] == ("v2", 100)       # exclusive to
    assert got[(1, 5000)] == ("v2", 100)      # open interval
    assert got[(2, 55)] == ("w1", 50)
    assert got[(2, 70)] == (None, None)       # after the last closed version
    assert got[(3, 10)] == (None, None)       # unknown key
