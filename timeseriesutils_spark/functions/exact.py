"""Deterministic floating-point aggregation.

Summing doubles is order-dependent; on a cluster the merge order of partial
aggregates is nondeterministic, so ``SUM(double)`` can differ run-to-run in
the last ulps (and will differ from any other engine computing the same
query).  The engine therefore accumulates through fixed-point DECIMAL —
decimal addition is exact and associative, so the result is identical for
*any* partitioning / merge order, matches DuckDB bit-for-bit, and is
reproducible at 100 TB.  The final value is cast back to DOUBLE; derived
ratios (averages) divide the exact sum by the exact count in double, which
is a single deterministic IEEE operation.

Cost: decimal partial aggregation is modestly slower than double but stays
inside whole-stage codegen (no UDFs, no extra shuffle).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits, `scale` fractional: plenty of headroom for petabyte-scale
# sums of business-magnitude values.
PRECISION = 38


def dlit(x: float) -> str:
    """Render a Python float as a SQL literal that DuckDB parses as
    DOUBLE (correctly rounded), never as DECIMAL.

    A bare decimal literal like ``3.8415999999999997`` is parsed by
    DuckDB as DECIMAL and then *truncated* to double, diverging from
    Spark's correctly-rounded parse — an exponent marker forces the
    DOUBLE parser.  Appending ``e0`` unconditionally is wrong when
    ``repr`` already uses exponent form (``1e-05`` → ``1e-05e0`` is a
    syntax error; ``1e+16`` likewise), so the suffix is added only when
    no exponent is present.  ``repr`` round-trips doubles exactly in
    both engines' parsers.
    """
    r = repr(float(x))
    if "e" in r or "E" in r:
        return r
    if "inf" in r or "nan" in r:
        raise ValueError(f"non-finite SQL literal: {r}")
    return r + "e0"


def sq(value) -> str:
    """Render a value as a single-quoted SQL string literal with
    embedded quotes doubled (``O'BRIEN`` → ``'O''BRIEN'``) — the shared
    quoting helper for every ``*_sql`` renderer that interpolates
    user-supplied level/type/name values into oracle SQL.  The Spark
    side passes the same values as Column parameters and needs no
    escaping; without this the rendered DuckDB twin would break (or
    become injectable) on a quote-bearing level."""
    return "'" + str(value).replace("'", "''") + "'"


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM over a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({PRECISION},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dsum_sql(expr: str, scale: int = 6) -> str:
    """ANSI-SQL equivalent of :func:`dsum` (for DuckDB oracles)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({PRECISION},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 6) -> str:
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"


def gmean_udaf():
    """Pandas UDAF (Series → scalar): geometric mean of a positive column.

    The UDF-surface example for aggregates Spark lacks natively — Arrow
    ships each group's column once; numpy reduces it vectorized.  Sum
    order inside a group is data-order-dependent in the last ulps, so
    queries using it are declared rows-only (no cross-engine hash).
    """
    import numpy as np
    import pandas as pd  # noqa: F401  (type-hint resolution)

    @F.pandas_udf("double")
    def gmean(v: pd.Series) -> float:
        a = v.to_numpy(dtype="float64")
        a = a[a > 0]
        if a.size == 0:
            return float("nan")
        return float(np.exp(np.log(a).mean()))

    return gmean
