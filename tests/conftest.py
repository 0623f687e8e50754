import sys
import types

import pytest


@pytest.fixture(scope="session")
def spark():
    from timeseriesutils_spark.session import get_spark

    spark = get_spark(
        app_name="tsspark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def reference_featurize():
    """Import the actual reference module for parity tests.

    scipy is not installed in this environment; only ``domfreq`` touches it
    (featurize.py:5,543), so stub ``scipy.signal.periodogram`` with a
    numpy equivalent for the import.
    """
    import numpy as np

    if "scipy" not in sys.modules:
        import importlib.machinery

        scipy = types.ModuleType("scipy")
        signal = types.ModuleType("scipy.signal")
        # a real ModuleSpec so importlib.util.find_spec("scipy") keeps working
        scipy.__spec__ = importlib.machinery.ModuleSpec("scipy", None)
        signal.__spec__ = importlib.machinery.ModuleSpec("scipy.signal", None)

        def periodogram(x, fs=1.0, detrend="linear"):  # numpy-FFT equivalent
            x = np.asarray(x, dtype="float64")
            n = len(x)
            if detrend == "linear" and n > 1:
                t = np.arange(n)
                slope, intercept = np.polyfit(t, x, 1)
                x = x - (slope * t + intercept)
            elif detrend == "constant":
                x = x - x.mean()
            spec = np.fft.rfft(x)
            psd = (spec.real**2 + spec.imag**2) / (fs * n)
            if n % 2 == 0:
                psd[1:-1] *= 2
            else:
                psd[1:] *= 2
            return np.fft.rfftfreq(n, 1.0 / fs), psd

        signal.periodogram = periodogram
        scipy.signal = signal
        sys.modules["scipy"] = scipy
        sys.modules["scipy.signal"] = signal

    sys.path.insert(0, "/root/reference/src")
    import timeseriesutils.featurize as ref

    return ref


@pytest.fixture()
def toy_frame(spark):
    """FIXTURES.md §F4 toy_interleaved, blocked ordering."""
    rows = []
    for g, base in (("a", 1.0), ("b", 10.0)):
        for t in range(6):
            rows.append((g, t, base * (t + 1)))
    return spark.createDataFrame(rows, "g string, t int, y double")


@pytest.fixture()
def toy_frame_shuffled(spark):
    rows = []
    for t in range(6):
        for g, base in (("b", 10.0), ("a", 1.0)):
            rows.append((g, t, base * (t + 1)))
    return spark.createDataFrame(rows, "g string, t int, y double")
