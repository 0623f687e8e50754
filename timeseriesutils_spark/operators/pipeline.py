"""``featurize_data`` — the pipeline dispatcher.

Reference: featurize.py:7-49 — folds ``data.pipe(fun, feature_names=...,
**args)`` over a list of ``{fun, args}`` dicts, injecting ``group_columns``
into every args; resolves string ``fun`` via ``eval`` (featurize.py:43-44).

Deviation (SURVEY §2.4.6): string dispatch goes through an explicit
registry, not ``eval`` — ``eval`` on user strings is arbitrary code
execution; observable behavior for all documented inputs ('rollmean',
'lag', 'windowed_taylor_coefs', …) is identical.

Because every step only *builds* DataFrame expressions, the whole pipeline
stays one lazy Catalyst plan: shared (groups, order) windows collapse to a
single exchange + sort regardless of how many features are requested.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def _registry() -> dict[str, Callable]:
    from timeseriesutils_spark.operators.domfreq import domfreq
    from timeseriesutils_spark.operators.series_math import diff, ewma, pct_change
    from timeseriesutils_spark.operators.taylor import windowed_taylor_coefs
    from timeseriesutils_spark.operators.window_features import (
        horizon_targets,
        lag,
        rollmean,
    )

    return {
        "lag": lag,
        "rollmean": rollmean,
        "horizon_targets": horizon_targets,
        "windowed_taylor_coefs": windowed_taylor_coefs,
        "domfreq": domfreq,
        # engine-native derived signals (same (df, names) step contract)
        "ewma": ewma,
        "diff": diff,
        "pct_change": pct_change,
    }


def featurize_data(
    data: DataFrame,
    group_columns=None,
    features: list[dict] | None = None,
    order_by=None,
) -> tuple[DataFrame, list]:
    """Fold feature builders over ``data``; returns (df, feature_names).

    ``order_by`` is injected into every step the same way the reference
    injects ``group_columns`` (featurize.py:41) — Spark needs the explicit
    time order the reference left implicit.
    """
    registry = _registry()
    feature_names: list = []
    for feature in features or []:
        args = dict(feature["args"])
        args["group_columns"] = group_columns
        if order_by is not None and "order_by" not in args:
            args["order_by"] = order_by
        fun = feature["fun"]
        if isinstance(fun, str):
            try:
                fun = registry[fun]
            except KeyError:
                raise ValueError(
                    f"unknown feature function {fun!r}; "
                    f"known: {sorted(registry)}"
                ) from None
        data, feature_names = fun(data, feature_names=feature_names, **args)
    return data, feature_names
