"""Round-14 optimization equivalence pins.

Every optimization that changed an operator's internals keeps its old
path as an A/B control (or a pure-Python reference) and gets a
bit-identity test here — the OPTIMIZATION_r14.md contract that a
restructured query computes exactly what it computed before.
"""

from __future__ import annotations

import math

import numpy as np
import pytest


def _gappy_series(rng, n, base, spike_idx, spikes):
    t = np.arange(n)
    x = base + 3.0 * np.sin(2 * np.pi * t / 7) + rng.normal(0, 1.0, n)
    for i, s in zip(spike_idx, spikes):
        x[i] += s
    return x


@pytest.mark.parametrize("thresh", [2.5, 3.0])
def test_seasonal_esd_arrow_equals_relational(spark, thresh):
    """The grouped-Arrow GESD kernel is bit-identical to the relational
    K-round unroll (the r13 shape, kept as engine="relational") on
    multi-group data with planted anomaly clusters and exact ties."""
    from timeseriesutils_spark.operators.stl import seasonal_esd

    rng = np.random.default_rng(14)
    rows = []
    for gi, (n, spikes) in enumerate(
        [(180, [45.0, -38.0]), (150, [52.0, 50.0]), (120, [])]
    ):
        idx = [60, 61][: len(spikes)]
        x = _gappy_series(rng, n, 100.0 + 10 * gi, idx, spikes)
        rows += [(f"g{gi}", int(i), float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "g string, t int, v double")

    kw = dict(
        period=7, seasonal_h=3, trend_h=10, scale=2,
        max_anomalies=5, thresh=thresh,
    )
    got = sorted(
        map(tuple, seasonal_esd(df, "v", "t", ["g"], **kw).collect())
    )
    want = sorted(
        map(
            tuple,
            seasonal_esd(
                df, "v", "t", ["g"], engine="relational", **kw
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def _bitsame(a, b):
    if a.dtype.kind == "f":
        return bool(((np.isnan(a) & np.isnan(b)) | (a == b)).all())
    return bool((a == b).all())


def test_stl_arrow_equals_relational(spark):
    """The grouped-Arrow STL kernel (one pass per series, hi/lo-split
    trend numerator) is bit-identical to the relational window chain —
    including interior NULL values, groups shorter than the compound
    window reach, and ``keep`` passthrough columns."""
    from timeseriesutils_spark.operators.stl import stl_decompose

    rng = np.random.default_rng(14)
    rows = []
    for gi, n in enumerate([200, 48, 90]):  # 48 < 2*(hs*P+P+ht)
        t = np.arange(n)
        x = (
            50.0 + 20 * gi
            + 4.0 * np.sin(2 * np.pi * t / 7)
            + rng.normal(0, 2.0, n)
        )
        for i, v in enumerate(x):
            val = None if (gi == 0 and i in (70, 71)) else float(v)
            rows.append((f"g{gi}", int(i), val, float(i) * 0.5))
    df = spark.createDataFrame(rows, "g string, t int, v double, k double")

    kw = dict(period=7, seasonal_h=3, trend_h=10, scale=2, keep=("k",))
    a = (
        stl_decompose(df, "v", "t", ["g"], **kw)
        .toPandas().sort_values(["g", "t"]).reset_index(drop=True)
    )
    r = (
        stl_decompose(df, "v", "t", ["g"], engine="relational", **kw)
        .toPandas().sort_values(["g", "t"]).reset_index(drop=True)
    )
    assert len(a) == len(r) == sum((200, 48, 90))
    for c in a.columns:
        assert _bitsame(a[c].to_numpy(), r[c].to_numpy()), c
    # NULL margins must exist (edge discipline) and not cover everything
    assert a["trend"].isna().any() and a["trend"].notna().any()


def test_stl_robust_split_vs_duckdb_extreme_magnitudes(spark):
    """stl_robust's pass-2 hi/lo-split numerators (int64 partial
    convolutions + decimal recombination) stay in exact lockstep with
    the DuckDB twin's direct HUGEINT products — stressed with large
    values, heavy spikes (big |v − trend₁| limbs) and negatives."""
    import duckdb

    from timeseriesutils_spark.operators.stl import (
        stl_robust,
        stl_robust_sql,
    )

    rng = np.random.default_rng(41)
    rows = []
    for gi in range(2):
        n = 160
        t = np.arange(n)
        x = (
            (-1) ** gi * 9e4
            + 4e4 * np.sin(2 * np.pi * t / 7)
            + rng.normal(0, 1e3, n)
        )
        x[40] += 8e4  # spike: large detrended magnitude in pass 2
        x[41] -= 7e4
        rows.append(None)
        rows = rows[:-1] + [
            (gi, int(i), float(v)) for i, v in enumerate(x)
        ]
    df = spark.createDataFrame(rows, "g long, t long, v double")
    got = (
        stl_robust(df, "v", "t", ["g"])
        .toPandas().sort_values(["g", "t"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("src", df.toPandas())
    sql = stl_robust_sql("SELECT * FROM src", "v", "t", ["g"])
    want = (
        con.execute(sql).df().sort_values(["g", "t"]).reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert _bitsame(
            got[c].to_numpy(), want[c].to_numpy(float)
            if want[c].dtype.kind in "fiu" else want[c].to_numpy()
        ), c


@pytest.mark.parametrize("n", [1, 2, 3])
def test_rouge_arrow_equals_relational(spark, n):
    """The per-row clipped-overlap kernel matches the relational
    explode/shuffle form bit-for-bit — including repeated grams
    (clipping), empty-overlap pairs, and the short-text degenerate
    branch (|words| < n)."""
    from timeseriesutils_spark.operators.text import rouge_n

    rows = [
        (0, "the cat sat on the mat", "the cat sat on a mat"),
        (1, "a a a b b", "a a b b b"),
        (2, "one two three", "four five six"),
        (3, "hi", "hi"),  # shorter than the gram order for n>1
        (4, "x y x y x y", "y x y x y x"),
    ]
    df = spark.createDataFrame(rows, "pair long, c string, r string")
    a = sorted(map(tuple, rouge_n(df, "pair", "c", "r", n=n).collect()))
    b = sorted(
        map(
            tuple,
            rouge_n(df, "pair", "c", "r", n=n, engine="relational")
            .collect(),
        )
    )
    assert a == b and len(a) == 5


def test_fasttext_irls_sql_text_equals_colapi(spark):
    """The SQL-text-rendered joint IRLS round produces bit-identical
    β grids to the Column-API builder it replaced (kept as the A/B
    control), and the restructured distinct-bigram feature build feeds
    both the same integers."""
    from timeseriesutils_spark.operators.fasttext import (
        _irls_fit_joint,
        _irls_fit_joint_colapi,
        fasttext_features,
    )

    rng = np.random.default_rng(7)
    langs = ("aa", "bb", "cc")
    vocab = {
        "aa": ["der", "und", "nicht", "haus", "schnell"],
        "bb": ["the", "and", "not", "house", "quick"],
        "cc": ["le", "et", "pas", "maison", "vite"],
    }
    rows = []
    for i in range(240):
        lb = langs[i % 3]
        w = rng.choice(vocab[lb], size=rng.integers(3, 9))
        rows.append((i, lb, " ".join(w)))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    feats = fasttext_features(df, langs, "doc_id", "text", "lang")
    feats.persist().count()
    try:
        got = _irls_fit_joint(feats, langs, 4)
        want = _irls_fit_joint_colapi(feats, langs, 4)
    finally:
        feats.unpersist()
    assert got == want
    assert any(any(b) for b in got)  # a real fit, not all-zero


@pytest.mark.parametrize("lam", [0.3, 0.7, 1.0])
def test_mmr_arrow_equals_relational(spark, lam):
    """The grouped-Arrow MMR kernel reproduces the relational greedy
    unroll pick-for-pick AND score-bit-for-bit, including clusters of
    near-duplicate candidates (where max-sim dominates the argmax)."""
    import numpy as np

    from timeseriesutils_spark.operators.similarity import mmr_diversify

    rng = np.random.default_rng(41)
    base = rng.normal(0, 1, (6, 16))
    rows = []
    vid = 0
    for b in base:
        for _ in range(4):  # 4 near-copies of each of 6 prototypes
            v = b + rng.normal(0, 0.05, 16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id < 3")

    kw = dict(k=5, n_candidates=12, lam=lam)
    got = sorted(map(tuple, mmr_diversify(q, df, **kw).collect()))
    want = sorted(
        map(tuple, mmr_diversify(q, df, engine="relational", **kw).collect())
    )
    assert got == want and len(got) == 15


def test_mmr_arrow_fewer_candidates_than_k(spark):
    """A query whose candidate pool is smaller than k stops early in
    both engines with identical picks."""
    from timeseriesutils_spark.operators.similarity import mmr_diversify

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter("vec_id = 0")
    kw = dict(k=5, n_candidates=10, lam=0.6)
    got = sorted(map(tuple, mmr_diversify(q, df, **kw).collect()))
    want = sorted(
        map(tuple, mmr_diversify(q, df, engine="relational", **kw).collect())
    )
    assert got == want and len(got) == 3


def test_seasonal_esd_arrow_tie_on_maxdev_takes_min_t(spark):
    """Two actives at the exact same max deviation: the kernel must
    flag the smaller t, exactly like the relational MIN(t) hit rule."""
    from timeseriesutils_spark.operators.stl import seasonal_esd

    n = 140
    t = np.arange(n)
    x = 50.0 + 2.0 * np.sin(2 * np.pi * t / 7)
    # identical spikes, one full period apart → same remainder shape
    x[63] += 40.0
    x[70] += 40.0
    df = spark.createDataFrame(
        [("s", int(i), float(v)) for i, v in enumerate(x)],
        "g string, t int, v double",
    )
    kw = dict(period=7, seasonal_h=3, trend_h=10, scale=2,
              max_anomalies=2, thresh=3.0)
    got = {
        r["t"]: r["anom_rank"]
        for r in seasonal_esd(df, "v", "t", ["g"], **kw).collect()
    }
    want = {
        r["t"]: r["anom_rank"]
        for r in seasonal_esd(
            df, "v", "t", ["g"], engine="relational", **kw
        ).collect()
    }
    assert got == want and 63 in got


def test_band_audit_onepass_equals_relational(spark):
    """The single-explode multi-config band audit is row-identical to
    the per-config pipelines (engine="relational"), including a config
    with ZERO candidates (the groupBy-drops-empty-groups edge the
    onepass form must re-materialize)."""
    from timeseriesutils_spark.operators.dedup import dedup_band_audit

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the cat watches from the warm windowsill every day"
    )
    rows = []
    # near-dup cluster: high-Jaccard pairs every config should see
    for i in range(4):
        rows.append((i, base + f" tail{i % 2}"))
    # distinct documents: no pairs
    for i in range(4, 10):
        rows.append((i, f"document {i} has completely different words "
                        f"plus unique token set alpha{i} beta{i} gamma{i} "
                        f"delta{i} epsilon{i} zeta{i} eta{i} theta{i}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    kw = dict(n=3, num_hashes=32, band_configs=(2, 4, 8, 16), threshold=0.8)
    got = sorted(map(tuple, dedup_band_audit(docs, **kw).collect()))
    want = sorted(
        map(tuple, dedup_band_audit(docs, engine="relational", **kw).collect())
    )
    assert got == want
    assert len(got) == 4  # one row per config, zero-candidate configs included


def test_band_audit_onepass_zero_candidate_config_row(spark):
    """A corpus with NO near-dups at all must still yield all 4 config
    rows with n_candidates = 0 (the relational global-agg contract)."""
    from timeseriesutils_spark.operators.dedup import dedup_band_audit

    rows = [
        (i, f"totally unique sentence number {i} with tokens "
            f"a{i} b{i} c{i} d{i} e{i} f{i} g{i} h{i} i{i} j{i}")
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(n=3, num_hashes=32, band_configs=(2, 4, 8, 16), threshold=0.8)
    got = sorted(map(tuple, dedup_band_audit(docs, **kw).collect()))
    want = sorted(
        map(tuple, dedup_band_audit(docs, engine="relational", **kw).collect())
    )
    assert got == want
    assert len(got) == 4
    # ≥3 configs exercise the zero-candidate (empty-group) path; the
    # most permissive config may pick up a random 2-minima collision
    assert sum(1 for r in got if r[2] == 0) >= 3  # n_candidates


def test_dup_span_audit_pruned_equals_full(spark):
    """The pruned audit (top-pair docs re-windowed instead of the full
    corpus) is row-identical to the full-corpus form (engine="full"),
    including pairs whose long span is invisible to the 8-word windows
    and posting-capped hot windows."""
    from timeseriesutils_spark.operators.dupspan import dup_span_exact_audit

    shared6 = "alpha beta gamma delta epsilon zeta"  # 6-word shared span
    shared12 = ("one two three four five six seven eight nine ten "
                "eleven twelve")  # 12-word shared span (8-gram visible)
    hot = "common boilerplate header line"  # appears in MANY docs
    rows = [
        (1, f"{shared6} filler1a filler1b filler1c filler1d"),
        (2, f"prefix2a prefix2b {shared6} suffix2a suffix2b"),
        (3, f"{shared12} tail3a tail3b"),
        (4, f"head4a {shared12} tail4b"),
    ]
    for i in range(5, 25):
        rows.append((i, f"{hot} unique{i}a unique{i}b unique{i}c "
                        f"unique{i}d unique{i}e unique{i}f"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(exact_words=4, ngram_words=8, max_posting=8, top_pairs=16)
    got = sorted(map(tuple, dup_span_exact_audit(docs, **kw).collect()))
    want = sorted(
        map(tuple, dup_span_exact_audit(docs, engine="full", **kw).collect())
    )
    assert got == want and len(got) >= 2
    by_pair = {(r[0], r[1]): r for r in got}
    assert (1, 2) in by_pair and by_pair[(1, 2)][3] == 6  # exact_len 6
    assert by_pair[(1, 2)][6] == 0  # detected_len 0: invisible to 8-grams
    assert (3, 4) in by_pair and by_pair[(3, 4)][6] >= 8  # detected


def test_matrix_profile_arrow_equals_relational(spark):
    """The grouped-Arrow banded-STOMP kernel is bit-identical to the
    relational 16-lag DECIMAL window chain (kept as
    engine="relational") — incl. interior NULLs, a sub-w group, a
    constant (zero-variance) group, and magnitudes past the int64
    cumsum envelope (Python-int fallback) while still inside the
    relational product envelope."""
    from timeseriesutils_spark.operators.matrixprofile import matrix_profile

    rng = np.random.default_rng(21)
    rows = []
    x = np.cumsum(rng.normal(0, 2, 150)) + 80.0
    x[20:28] = x[90:98] = np.array([1, 9, 2, 8, 3, 7, 4, 6], float)
    for t, v in enumerate(x):
        rows.append(("g0", t, None if t in (55, 56) else float(v)))
    for t in range(5):  # shorter than w: no output rows
        rows.append(("g1", t, float(t * 2.5)))
    for t in range(40):  # constant: zero variance drops out
        rows.append(("g2", t, 5.0))
    for t in range(60):  # _xq ~ 2.5e9: n·A² ≥ 2^62 → object dtype
        rows.append(
            ("g3", t, 2.5e7 + 9.1e5 * math.sin(t / 5.0) + t * 31.0)
        )
    df = spark.createDataFrame(rows, "g string, t int, v double")
    kw = dict(w=8, band=20, excl=4, scale=2)
    got = sorted(
        map(tuple, matrix_profile(df, "v", ["g"], ["t"], **kw).collect())
    )
    want = sorted(
        map(
            tuple,
            matrix_profile(
                df, "v", ["g"], ["t"], engine="relational", **kw
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    assert not any(r[0] in ("g1", "g2") for r in got)
    # chunked arrow ≡ plain relational (cross-engine, cross-shape)
    ch = sorted(
        map(
            tuple,
            matrix_profile(
                df, "v", ["g"], ["t"], chunk_rows=40, **kw
            ).collect(),
        )
    )
    assert ch == want


def test_stl_chunked_arrow_equals_relational(spark):
    """The chunked STL scale path now runs the grouped-Arrow kernel per
    (group, chunk); it must equal the relational chunked chain (the
    kept engine="relational" control) bit-for-bit — the extended chunk
    frame is a standalone series to both."""
    from timeseriesutils_spark.operators.stl import stl_decompose

    rows = [
        ("s", i, 10.0 + 3.0 * math.sin(i / 3.0) + (0.37 * i % 2.1))
        for i in range(300)
    ] + [("t", i, 5.0 + (i * i * 0.37 % 7.0)) for i in range(97)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    kw = dict(period=7, seasonal_h=3, trend_h=10, scale=2, chunk_rows=64)
    got = sorted(
        map(tuple, stl_decompose(df, "v", "t", ["g"], **kw).collect())
    )
    want = sorted(
        map(
            tuple,
            stl_decompose(
                df, "v", "t", ["g"], engine="relational", **kw
            ).collect(),
        )
    )

    def eq(x, y):
        if x is None or y is None:
            return x is y
        if isinstance(x, float):
            return (math.isnan(x) and math.isnan(y)) or x == y
        return x == y

    assert len(got) == len(want) == 397
    assert all(
        all(eq(p, q) for p, q in zip(ra, rb)) for ra, rb in zip(got, want)
    )


@pytest.mark.parametrize("op", ["rolling_mad", "hampel_filter"])
def test_roll_med_mad_arrow_equals_relational(spark, op):
    """The shared sliding median/MAD Arrow kernel matches the
    collect_list→sort→transform HOF chain bit-for-bit — truncated edge
    windows, interior NULLs (windows with fewer values), an all-NULL
    stretch longer than the window (empty-window NULL row), exact
    spike repair/flag ties, and multi-column passthrough."""
    import timeseriesutils_spark.operators.series_math as sm

    rng = np.random.default_rng(43)
    rows = []
    for gi in range(3):
        n = 60
        x = rng.normal(50.0 + gi, 5.0, n)
        x[20] += 90.0  # spike
        for i in range(n):
            val = None
            if not (gi == 1 and 30 <= i < 50):  # 20-row NULL stretch
                if not (gi == 0 and i in (5, 6)):
                    val = float(x[i])
            rows.append((f"g{gi}", i, val, i * 2))
    df = spark.createDataFrame(rows, "g string, t int, v double, k int")
    fn = getattr(sm, op)
    kw = (
        dict(window_size=15)
        if op == "rolling_mad"
        else dict(half_window=7)
    )
    got = (
        fn(df, "v", ["g"], order_by=["t"], **kw)
        .toPandas().sort_values(["g", "t"]).reset_index(drop=True)
    )
    want = (
        fn(df, "v", ["g"], order_by=["t"], engine="relational", **kw)
        .toPandas().sort_values(["g", "t"]).reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) == 180
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f":
            assert (
                (a.isna() == b.isna()).all()
                and (a.dropna().to_numpy() == b.dropna().to_numpy()).all()
            ), c
        else:
            assert a.equals(b), c
    # the empty-window NULL row actually occurs (g1's NULL stretch)
    med_col = [c for c in got.columns if "_med" in c or "hampel" in c][0]
    assert got[med_col].isna().any()


def test_stl_robust_arrow_equals_relational(spark):
    """The full-robust-STL Arrow kernel (both passes + median join in
    one grouped pass) is bit-identical to the split-relational chain
    (kept as engine="relational") — incl. interior NULLs, planted
    spikes (ρ = 0 rows), a constant group (med2 = 0 → every ρ = 1),
    and a group too short to score (dropped by the median join)."""
    from timeseriesutils_spark.operators.stl import stl_robust

    rng = np.random.default_rng(47)
    rows = []
    for gi, n in enumerate([200, 150]):
        t = np.arange(n)
        x = (
            80.0 + 30 * gi
            + 5.0 * np.sin(2 * np.pi * t / 7)
            + rng.normal(0, 2.0, n)
        )
        x[60] += 70.0  # spike: rho -> 0
        x[61] -= 55.0
        for i, v in enumerate(x):
            val = None if (gi == 0 and i in (90, 91)) else float(v)
            rows.append((f"g{gi}", int(i), val))
    for i in range(120):  # constant series: med2 = 0, rho = 1
        rows.append(("gc", i, 42.0))
    for i in range(10):  # shorter than the compound reach: dropped
        rows.append(("gs", i, float(i)))
    df = spark.createDataFrame(rows, "g string, t int, v double")
    a = (
        stl_robust(df, "v", "t", ["g"])
        .toPandas().sort_values(["g", "t"]).reset_index(drop=True)
    )
    r = (
        stl_robust(df, "v", "t", ["g"], engine="relational")
        .toPandas().sort_values(["g", "t"]).reset_index(drop=True)
    )
    assert len(a) == len(r) == 470  # gs dropped entirely
    assert set(a["g"]) == {"g0", "g1", "gc"}
    for c in a.columns:
        assert _bitsame(a[c].to_numpy(), r[c].to_numpy()), c
    gc = a[a["g"] == "gc"]["rho"]
    # med2 = 0 → every SCOREABLE row gets rho 1; the compound-window
    # margin rows (NULL pass-1 remainder) carry rho 0
    assert (gc == 1.0).sum() > 0 and set(gc.unique()) == {0.0, 1.0}
    assert (a["rho"].min() == 0.0)  # the spikes are downweighted


def test_ets_sql_text_equals_colapi(spark):
    """The SQL-text-rendered candidate projection produces bit-identical
    ets_select output to the Column-API builder it replaced (kept as
    engine="colapi") — same dlit literals, same left-associated sums."""
    from timeseriesutils_spark.operators.ets import ets_select

    rng = np.random.default_rng(11)
    rows = []
    for gi in range(4):
        n = 40 + 7 * gi
        t = np.arange(n)
        x = 30.0 + gi * 5 + 2.5 * np.sin(2 * np.pi * t / 7) + 0.3 * t
        x += rng.normal(0, 0.8, n)
        rows += [(f"g{gi}", int(i), float(v)) for i, v in enumerate(x)]
    rows += [("tiny", 0, 1.0), ("tiny", 1, 2.0)]  # < min_obs: dropped
    df = spark.createDataFrame(rows, "g string, t int, v double")
    a = sorted(map(tuple, ets_select(df, "v", ["g"], ["t"]).collect()))
    b = sorted(
        map(
            tuple,
            ets_select(df, "v", ["g"], ["t"], engine="colapi").collect(),
        )
    )
    assert a == b and len(a) == 4


def test_simhash_sql_text_equals_colapi(spark):
    """The SQL-text vote/pack rendering of the portable SimHash is
    value-identical to the Column-API builder (all-integer votes and
    bit packs), incl. short texts that fall back to the whole-text
    shingle."""
    from timeseriesutils_spark.operators.dedup import simhash_docs_portable

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "hi"),  # shorter than the shingle order
        (4, "alpha beta gamma delta epsilon zeta eta theta"),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, simhash_docs_portable(docs, n=2).collect()))
    b = sorted(
        map(
            tuple,
            simhash_docs_portable(docs, n=2, engine="colapi").collect(),
        )
    )
    assert a == b and len(a) == 5


def test_hurst_sql_text_equals_colapi(spark):
    """The SQL-text level-ladder rendering of hurst_exponent matches
    the Column-API builder bit-for-bit — incl. a short group (NULL
    hurst) and an incomplete tail block."""
    from timeseriesutils_spark.operators.complexity import hurst_exponent

    rng = np.random.default_rng(5)
    rows = []
    walk = np.cumsum(rng.normal(0, 1, 203)) + 50  # 203: ragged tail
    rows += [("g0", i, float(v)) for i, v in enumerate(walk)]
    noise = rng.normal(100, 3, 130)
    rows += [("g1", i, float(v)) for i, v in enumerate(noise)]
    rows += [("gs", i, float(i)) for i in range(9)]  # < 2 top blocks
    df = spark.createDataFrame(rows, "g string, t int, v double")
    a = sorted(map(tuple, hurst_exponent(df, "v", ["g"], ["t"]).collect()))
    b = sorted(
        map(
            tuple,
            hurst_exponent(
                df, "v", ["g"], ["t"], engine="colapi"
            ).collect(),
        )
    )
    assert a == b and len(a) == 3


def test_mmd_moments_arrow_equals_relational(spark):
    """The batch-partial moment kernel (int64 Gram matmul) matches the
    d² posexplode chain bit-for-bit — incl. NULL vector elements
    (SUM-skip ≡ zero-fill), ragged dimensions, and a one-sided
    sample."""
    from timeseriesutils_spark.operators.similarity import mmd_quad_drift

    rng = np.random.default_rng(3)
    rows = []
    for i in range(60):
        v = [float(x) for x in rng.normal(0, 1, 8)]
        if i == 7:
            v[3] = None  # NULL element: contributes nothing
        if i == 11:
            v = v[:5]  # ragged dimension
        rows.append((1 if i % 2 else 2, v))
    df = spark.createDataFrame(rows, "half int, embedding array<double>")
    a = sorted(
        map(tuple, mmd_quad_drift(df, "embedding", "half", scale=4).collect())
    )
    b = sorted(
        map(
            tuple,
            mmd_quad_drift(
                df, "embedding", "half", scale=4, engine="relational"
            ).collect(),
        )
    )
    assert a == b and len(a) == 1
    one = spark.createDataFrame(
        [(1, [1.0, 2.0])], "half int, embedding array<double>"
    )
    a1 = mmd_quad_drift(one, "embedding", "half").collect()
    b1 = mmd_quad_drift(one, "embedding", "half", engine="relational").collect()
    assert [tuple(r) for r in a1] == [tuple(r) for r in b1]


def test_chrf_arrow_equals_relational(spark):
    """The per-pair Counter kernel matches the explode/clipped-count
    joins bit-for-bit — repeated grams, zero-overlap pairs, exact
    max_n-length texts, and a duplicate pair id whose gram multisets
    merge across rows."""
    from timeseriesutils_spark.operators.text import chrf_pairs

    rows = [
        (0, "The Quick  brown", "the quickbrown"),
        (1, "aaaaab", "aaab"),
        (2, "abcdefgh", "zyxwvuts"),
        (3, "abcd", "abcd"),  # exactly max_n after strip
        (4, "ab", "abcd"),  # too short: dropped
        (5, "xxyyzz", "xyzw"),
        (5, "zzyyxx", "zyxw"),  # duplicate pair id: counts merge
    ]
    df = spark.createDataFrame(rows, "pair long, c string, r string")
    a = sorted(map(tuple, chrf_pairs(df, "pair", "c", "r").collect()))
    b = sorted(
        map(
            tuple,
            chrf_pairs(df, "pair", "c", "r", engine="relational").collect(),
        )
    )
    assert a == b and len(a) == 6  # pair 4 dropped, pair 5 twice


def test_cox_ph_arrow_equals_relational(spark):
    """The grouped-Arrow Newton kernel is bit-identical to the relational
    4-pass unroll (kept as engine="relational") across the edges: a
    no-event group (NULL inference via the left-join contract), a
    constant-covariate group (I = 0 keeps beta at 0 and NULLs the
    inference), negative covariates, tied event times, and a censored
    mix."""
    from timeseriesutils_spark.operators.coxph import cox_ph

    rng = np.random.default_rng(14)
    rows = []
    # g0: ordinary mix — covariate drives the hazard, ties in t
    for i in range(120):
        x = float(rng.integers(0, 21)) / 10.0
        t = int(max(1, 40 - 12 * x + rng.normal(0, 4)))
        e = int(rng.random() < 0.8)
        rows.append(("g0", t, e, x))
    # g1: all censored — no event time, _u/_i NULL
    for i in range(30):
        rows.append(("g1", int(10 + i % 7), 0, float(i % 5) / 10.0))
    # g2: constant covariate — information 0, beta stays 0, NULL inference
    for i in range(40):
        rows.append(("g2", int(5 + i % 11), int(i % 2), 0.7))
    # g3: negative covariates
    for i in range(80):
        x = float(rng.integers(-10, 11)) / 10.0
        t = int(max(1, 30 + 8 * x + rng.normal(0, 3)))
        rows.append(("g3", t, int(rng.random() < 0.6), x))
    df = spark.createDataFrame(rows, "g string, t int, e int, x double")

    got = sorted(
        map(tuple, cox_ph(df, "t", "e", "x", ["g"]).collect())
    )
    want = sorted(
        map(
            tuple,
            cox_ph(df, "t", "e", "x", ["g"], engine="relational").collect(),
        )
    )
    assert len(got) == 4
    for ga, gr in zip(got, want):
        assert ga[0] == gr[0]
        for va, vr in zip(ga[1:], gr[1:]):
            if isinstance(va, float) and isinstance(vr, float):
                assert (math.isnan(va) and math.isnan(vr)) or va == vr, (
                    ga, gr,
                )
            else:
                assert va == vr, (ga, gr)
    # the no-event and constant-covariate groups NULL their inference
    by_g = {r[0]: r for r in got}
    assert by_g["g1"][3] is None and by_g["g2"][3] is None
    assert by_g["g0"][3] is not None and by_g["g3"][3] is not None


def test_bleu_arrow_equals_relational(spark):
    """The per-pair BLEU Counter kernel is bit-identical to the
    relational 8-explode/4-join chain (kept as engine="relational")
    across: repeated grams (clipping), zero overlap, texts shorter than
    max_n on either side (empty-gram orders), duplicate pair ids
    (cross-row gram merging), multi-space/trim tokenization, and the
    empty-string edge (split('') = [''])."""
    from timeseriesutils_spark.operators.text import bleu_pairs

    rows = [
        (1, "the cat sat on the mat", "the cat sat on a mat"),
        (2, "a a a a a", "a a b"),                    # clipping bites
        (3, "x y z w q", "alpha beta gamma delta"),    # zero overlap
        (4, "hi", "one two three four five"),          # cand shorter than n
        (5, "one two three four five", "yo"),          # ref shorter than n
        (6, "  spaced   out   text here ", "spaced out text here"),
        (7, "", "non empty ref"),                      # split('') edge
        (8, "dup pair first half", "dup pair ref one"),
        (8, "dup pair second half", "dup pair ref two"),  # duplicate id
    ]
    df = spark.createDataFrame(rows, "pair int, cand string, ref string")
    a = sorted(
        map(tuple, bleu_pairs(df, "pair", "cand", "ref", max_n=4).collect())
    )
    r = sorted(
        map(
            tuple,
            bleu_pairs(
                df, "pair", "cand", "ref", max_n=4, engine="relational"
            ).collect(),
        )
    )
    assert len(a) == len(rows)
    for x, y in zip(a, r):
        for va, vr in zip(x, y):
            if isinstance(va, float) and isinstance(vr, float):
                assert (math.isnan(va) and math.isnan(vr)) or va == vr, (x, y)
            else:
                assert va == vr, (x, y)
