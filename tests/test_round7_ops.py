"""Tests for the round-7 additions outside the nonparam module:
windowed spectral entropy (numpy mirror over the domfreq linear-map
matrices) and shingle-containment near-dup pairs."""

import math

import numpy as np
import pytest

from timeseriesutils_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)
from timeseriesutils_spark.operators.domfreq import (
    domfreq_matrix,
    spectral_entropy_sql_parts,
)


# --- spectral entropy -----------------------------------------------------


def _spec_entropy_numpy(ys, w=8):
    """Mirror of the SQL expression path: trailing window with head-
    block duplication, linear-detrend periodogram via domfreq_matrix,
    entropy over positive bins, 1e-9 floor quantization."""
    C, mult, _ = domfreq_matrix(w, 1.0, "linear")
    ext = np.concatenate([ys[:w], ys])
    out = []
    for r in range(len(ys)):
        x = ext[r + 1 : r + 1 + w]
        spec = C @ x
        psd = (spec.real**2 + spec.imag**2) * mult
        pos = psd[1:]
        s = pos.sum()
        if not s > 0:
            out.append(None)
            continue
        p = pos / s
        h = -(np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0)), 0.0)).sum()
        h /= math.log(len(pos))
        out.append(math.floor(h * 1e9 + 0.5) / 1e9)
    return out


def _entropy_df(spark, ys):
    rows = [("g", i, float(y)) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, seq long, y double")
    re_im, psd, ent = spectral_entropy_sql_parts("y", "g", seq="seq")
    b = df.selectExpr("g", "seq", *[f"{e} AS {n}" for n, e in re_im])
    p = b.selectExpr("g", "seq", *[f"{e} AS {n}" for n, e in psd])
    return p.selectExpr("g", "seq", f"{ent} AS spec_entropy")


def test_spectral_entropy_matches_numpy_mirror(spark):
    rng = np.random.RandomState(17)
    ys = rng.normal(0, 1, 40)
    got = {
        r["seq"]: r["spec_entropy"]
        for r in _entropy_df(spark, ys).collect()
    }
    expect = _spec_entropy_numpy(ys)
    for i, e in enumerate(expect):
        if e is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(e, abs=2e-9), i


def test_spectral_entropy_pure_tone_low_noise_high(spark):
    t = np.arange(64)
    tone = np.sin(2 * np.pi * t / 4.0) * 10  # bin 2 of w=8 exactly
    rng = np.random.RandomState(23)
    noise = rng.normal(0, 1, 64)
    h_tone = [
        r["spec_entropy"]
        for r in _entropy_df(spark, tone).collect()
        if r["spec_entropy"] is not None and r["seq"] >= 8
    ]
    h_noise = [
        r["spec_entropy"]
        for r in _entropy_df(spark, noise).collect()
        if r["spec_entropy"] is not None and r["seq"] >= 8
    ]
    assert np.mean(h_tone) < 0.35         # concentrated spectrum
    assert np.mean(h_noise) > 0.5         # spread spectrum
    assert all(0.0 <= h <= 1.0 + 1e-9 for h in h_tone + h_noise)


# --- containment ----------------------------------------------------------


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_containment_catches_subset_jaccard_misses(spark):
    inner = "the quick brown fox jumps over the lazy dog again and again"
    outer = (
        "prologue words here before anything relevant starts now . "
        + inner
        + " . epilogue content follows with many extra trailing words "
        + "one two three four five six seven eight nine ten eleven twelve"
    )
    other = "completely unrelated text about spark catalyst optimizer plans"
    docs = _docs_df(spark, [inner, outer, other])
    cont = containment_pairs(docs, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["id_a"], row["id_b"]) == (0, 1)
    assert row["containment"] == pytest.approx(1.0)
    # Jaccard at the same bar misses it
    jac = ngram_jaccard_pairs(docs, threshold=0.9).collect()
    assert jac == []


def test_containment_at_least_jaccard_on_shared_pairs(spark):
    rng = np.random.RandomState(29)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, 25)) for _ in range(12)
    ]
    docs = _docs_df(spark, texts)
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.0).collect()
    }
    jacc = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert set(jacc) == set(cont)
    for k, j in jacc.items():
        assert cont[k] >= j - 1e-12


def test_containment_threshold_filters(spark):
    docs = _docs_df(
        spark,
        [
            "a b c d e f g h",
            "a b c d e f g h",     # identical → containment 1
            "z y x w v u t s",
        ],
    )
    rows = containment_pairs(docs, threshold=0.99).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(0, 1)]
