"""Train/test tensor handoff — ``df_to_train_test_matrices``.

Reference: featurize.py:52-113.  Terminal, driver-side by nature (the
output is dense numpy for an ML library): take the max date as forecast
date T, build ``x_T`` from the rows at T (L,1,P), drop every row with any
NULL, pivot (location × date) and reshape Fortran-order to
``x_train_val (L,T',P)`` / ``y_train_val (L,T')``.

Reference hard-codes column names ``'location'``/``'date'`` (featurize.py:
86,89,99,110) — kept as defaults, made overridable.

Scale note: the tensors are inherently driver/ML-side; the distributed
part (filter, dropna, pivot) runs as DataFrame ops, and
:func:`df_to_grouped_arrays` keeps the per-group series fully distributed
(``sort_array(collect_list(struct(...)))``) for consumers that can take
one group per row instead of one dense tensor.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def df_to_train_test_matrices(
    data: DataFrame,
    feature_names: list[str],
    target_name: str,
    location_col: str = "location",
    date_col: str = "date",
):
    """Returns ``(x_train_val, y_train_val, x_T)`` numpy arrays.

    Matches the reference contract: pandas ``pivot`` sorts both the
    location index and date columns ascending, so rows/cols are ordered by
    location / date; Fortran-order reshape groups the P features last.
    Requires (as the reference implicitly does) that after dropna every
    location has the same set of dates — pandas pivot would emit NaN holes
    otherwise; we rely on the same rectangularity.
    """
    T = data.agg(F.max(date_col)).collect()[0][0]

    data_T = (
        data.filter(F.col(date_col) == F.lit(T))
        .orderBy(location_col)
        .select(*feature_names)
        .toPandas()
    )
    x_T = np.expand_dims(data_T.to_numpy(dtype="float64"), -2)

    train_val = (
        data.na.drop()
        .orderBy(location_col, date_col)
        .select(location_col, date_col, target_name, *feature_names)
        .toPandas()
    )
    x_train_val = train_val.pivot(
        index=location_col, columns=date_col, values=feature_names
    ).to_numpy()
    x_train_val = x_train_val.reshape(
        (
            x_train_val.shape[0],
            x_train_val.shape[1] // len(feature_names),
            len(feature_names),
        ),
        order="F",
    )
    y_train_val = train_val.pivot(
        index=location_col, columns=date_col, values=target_name
    ).to_numpy()
    return x_train_val, y_train_val, x_T


def df_to_grouped_arrays(
    data: DataFrame,
    feature_names: list[str],
    target_name: str,
    location_col: str = "location",
    date_col: str = "date",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Scale-path variant: one row per location with time-sorted feature
    arrays, never collected to the driver.

    Schema: ``location, dates array<date>, x array<array<double>> (T×P),
    y array<double>``.  Feeds distributed trainers (e.g. per-group model
    fit via applyInPandas) where a single dense (L,T,P) tensor would not
    fit on any one node.

    ``tie_break``: unique-key columns appended to the in-struct sort key
    so the array order is total when ``date_col`` has duplicates within a
    location (sort_array compares struct fields left to right).
    """
    packed = data.na.drop().select(
        F.col(location_col),
        F.struct(
            F.col(date_col).alias("d"),
            *[F.col(t) for t in (tie_break or [])],
            F.array(*[F.col(f).cast("double") for f in feature_names]).alias("x"),
            F.col(target_name).cast("double").alias("y"),
        ).alias("s"),
    )
    return packed.groupBy(location_col).agg(
        F.sort_array(F.collect_list("s")).alias("series")
    ).select(
        location_col,
        F.col("series.d").alias("dates"),
        F.col("series.x").alias("x"),
        F.col("series.y").alias("y"),
    )
