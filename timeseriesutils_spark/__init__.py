"""timeseriesutils_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of ``reichlab/timeseriesutils``.

The reference (``/root/reference/src/timeseriesutils/featurize.py``) is an
eager single-process pandas featurization library.  This package re-expresses
its operator surface — grouped lags, lead/horizon targets, rolling means,
windowed Taylor-polynomial coefficients, dominant-frequency features, the
``featurize_data`` pipeline driver and the train/test tensor handoff — as
lazy Spark DataFrame plans built from ``Window.partitionBy(groups)
.orderBy(time)`` expressions, plus the relational / streaming / LLM-pipeline
operators a 100 TB deployment needs (joins incl. as-of, aggregations,
dedup, similarity search, text analysis).

Design rules (see SURVEY.md §1.2/§4.2):
  * DataFrame API only — no RDDs; Catalyst owns physical planning.
  * Explicit ``order_by`` everywhere the reference assumed pre-sorted input
    (removes the reference's silent-misalignment hazard, SURVEY §2.4.1).
  * Python UDFs only where built-ins genuinely can't express the semantics
    (the FFT in domfreq); always Arrow-vectorized.
  * Deterministic results: exact decimal accumulation for floating-point
    aggregates so results are independent of partitioning / merge order —
    required both for the DuckDB oracle hash-gate and for run-to-run
    reproducibility on a real cluster.
"""

from timeseriesutils_spark.operators.window_features import (  # noqa: F401
    lag,
    rollmean,
    horizon_targets,
)
from timeseriesutils_spark.operators.pipeline import featurize_data  # noqa: F401
from timeseriesutils_spark.operators.taylor import windowed_taylor_coefs  # noqa: F401
from timeseriesutils_spark.operators.domfreq import domfreq  # noqa: F401
from timeseriesutils_spark.operators.matrices import df_to_train_test_matrices  # noqa: F401

__version__ = "0.1.0"
