"""Property tests for the banded DTW operator (rows-only op — these
tests are its correctness story)."""

import math
import random

import numpy as np
import pytest

from timeseriesutils_spark.operators.dtw import dtw_kernel, dtw_to_reference


def test_kernel_identity_is_zero():
    x = np.array([1.0, 5.0, 2.0, 8.0, 3.0])
    assert dtw_kernel(x, x, band=None) == 0.0
    assert dtw_kernel(x, x, band=2) == 0.0


def test_kernel_known_small_example():
    # x=[0,0,1], y=[0,1]: optimal alignment cost 0 (0->0, 0->0, 1->1)
    assert dtw_kernel(np.array([0.0, 0.0, 1.0]), np.array([0.0, 1.0]), None) == 0.0
    # pure offset: each of 3 points pays 1 against a flat reference
    assert dtw_kernel(np.array([1.0, 1.0, 1.0]), np.array([0.0]), None) == 3.0


def test_kernel_band_matches_full_when_wide():
    rng = random.Random(3)
    x = np.array([rng.uniform(0, 10) for _ in range(30)])
    y = np.array([rng.uniform(0, 10) for _ in range(25)])
    full = dtw_kernel(x, y, band=None)
    wide = dtw_kernel(x, y, band=100)
    assert full == pytest.approx(wide, rel=1e-12)
    # tightening the band can only increase (or keep) the cost
    assert dtw_kernel(x, y, band=3) >= full - 1e-12


def test_kernel_warping_beats_lockstep():
    # same shape, time-shifted: DTW cost stays near 0, lockstep L1 does not
    x = np.array([0.0] * 5 + [10.0] * 5)
    y = np.array([0.0] * 7 + [10.0] * 3)
    assert dtw_kernel(x, y, band=None) == 0.0


def test_operator_groups_and_determinism(spark):
    rng = random.Random(7)
    rows = []
    for gname, shift in (("a", 0), ("b", 3)):
        for t in range(40):
            rows.append((gname, t, float((t + shift) % 7) + rng.uniform(0, 0.2)))
    # a shuffled-noise control group with the same marginal distribution
    noise = [float(t % 7) for t in range(40)]
    rng.shuffle(noise)
    rows += [("noise", t, v) for t, v in enumerate(noise)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    ref = [float(t % 7) for t in range(14)]
    out = dtw_to_reference(df, "v", ["g"], ["t"], ref, band=None)
    got = {r.g: r for r in out.collect()}
    assert got["a"].n_obs == 40
    # pattern-following groups align far better than order-destroyed noise
    assert got["a"].dtw_per_step < got["noise"].dtw_per_step
    assert got["b"].dtw_per_step < got["noise"].dtw_per_step
    # partition-count invariance
    got2 = {r.g: r for r in dtw_to_reference(
        df.repartition(7), "v", ["g"], ["t"], ref, band=None
    ).collect()}
    assert got == got2


def test_kernel_length_skew_stays_finite():
    """Short series vs long reference must stay finite (code-review
    regression: band narrower than the length difference gave inf)."""
    x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    y = np.linspace(0, 10, 100)
    d = dtw_kernel(x, y, band=10)
    assert math.isfinite(d)


def test_kernel_engines_agree():
    """The vectorized min-plus-scan kernel is the loop spec: equal to
    1e-9 rel on float inputs, bit-identical on integer-valued inputs
    (exact cumsum below 2^53), across band settings and length skews."""
    from timeseriesutils_spark.operators.dtw import dtw_kernel_loop, dtw_kernel_vec

    rng = np.random.default_rng(42)
    for trial in range(120):
        n = int(rng.integers(1, 70))
        m = int(rng.integers(1, 70))
        band = (None, 1, 3, 10)[trial % 4]
        x, y = rng.normal(size=n), rng.normal(size=m)
        a, b = dtw_kernel_loop(x, y, band), dtw_kernel_vec(x, y, band)
        assert a == pytest.approx(b, rel=1e-9, abs=1e-12)
        xi = rng.integers(0, 50, size=n).astype(float)
        yi = rng.integers(0, 50, size=m).astype(float)
        assert dtw_kernel_loop(xi, yi, band) == dtw_kernel_vec(xi, yi, band)


def test_kernel_dispatcher_is_orientation_invariant():
    """Where DTW is mathematically symmetric — unbanded (any lengths)
    or banded with equal lengths (the Sakoe-Chiba window transposes
    onto itself) — the dispatcher gives the same double for (x, y) and
    (y, x) on every engine.  For banded length-skewed pairs the band is
    defined in the caller's orientation and symmetry does NOT hold;
    that contract is pinned by
    test_banded_dispatcher_matches_original_orientation_spec."""
    rng = np.random.default_rng(7)
    for trial in range(40):
        if trial % 3 == 0:
            n = m = int(rng.integers(1, 60))
            band = 2
        else:
            n = int(rng.integers(1, 60))
            m = int(rng.integers(1, 60))
            band = None
        x = rng.normal(size=n)
        y = rng.normal(size=m)
        for eng in ("vec", "loop"):
            # same cell set either way; the path sum reassociates under
            # transposition, so equality is to the last ulp, not bitwise
            assert dtw_kernel(x, y, band, eng) == pytest.approx(
                dtw_kernel(y, x, band, eng), rel=1e-12, abs=1e-12
            )


def test_kernel_full_band_symmetry():
    """Unbanded DTW cost is symmetric in its arguments (the DP cell set
    transposes exactly)."""
    from timeseriesutils_spark.operators.dtw import dtw_kernel_loop

    rng = np.random.default_rng(11)
    for _ in range(30):
        x = rng.normal(size=int(rng.integers(1, 40)))
        y = rng.normal(size=int(rng.integers(1, 40)))
        d1, d2 = dtw_kernel_loop(x, y, None), dtw_kernel_loop(y, x, None)
        assert d1 == pytest.approx(d2, rel=1e-9, abs=1e-12)


def test_banded_dispatcher_matches_original_orientation_spec():
    """Round-6 ADVICE regression: the Sakoe-Chiba window is NOT
    symmetric under transposition, so the shorter-outer swap must
    transpose the band back into the original (x, y) orientation.
    The dispatcher (any engine) must equal the unswapped loop spec
    bit-for-bit on the loop path for every length-skewed banded pair."""
    from timeseriesutils_spark.operators.dtw import (
        _band_arrays,
        _band_arrays_transposed,
        dtw_kernel_loop,
    )

    rng = np.random.default_rng(13)
    for trial in range(120):
        n = int(rng.integers(1, 70))
        m = int(rng.integers(1, 70))
        x = rng.normal(size=n)
        y = rng.normal(size=m)
        band = (1, 2, 3, 5, 10)[trial % 5]
        spec = dtw_kernel_loop(x, y, band)  # original orientation
        assert dtw_kernel(x, y, band, "loop") == spec
        assert dtw_kernel(x, y, band, "vec") == pytest.approx(
            spec, rel=1e-12, abs=1e-12
        )
        # the transposed window visits exactly the original cell set
        lo, hi = _band_arrays(n, m, band)
        cells = {
            (i + 1, j) for i in range(n) for j in range(lo[i], hi[i] + 1)
        }
        lot, hit = _band_arrays_transposed(n, m, band)
        cells_t = {
            (i, j + 1) for j in range(m) for i in range(lot[j], hit[j] + 1)
        }
        assert cells == cells_t
