"""Technical-analysis indicators over grouped ordered series: Cutler's
RSI, MACD with signal line, and Bollinger bands — the standard
momentum / trend / volatility triple of financial and demand series
dashboards, built entirely from bounded-window lag/sum expressions on
ONE series exchange (no recursion, no Python).

Conventions (documented intent, not reference parity — the reference
has no technical indicators):

* RSI uses Cutler's simple-moving-average form (equal-weight gains /
  losses over the window) rather than Wilder's recursive smoothing —
  the SMA form is windowed, exactly SQL-expressible, and a recognized
  variant (Cutler, Dow Theory Letters).
* MACD uses the truncated exponentially-weighted mean: standard
  α = 2/(span+1) weights α(1−α)^j, j = 0…W−1, renormalized to sum 1
  over the W-term window (W = the slow span), so each EW mean is a
  fixed linear combination of lags — the same bounded-EW convention as
  operators/series_math.ewma, with the standard α instead of the
  reference's quirk α.  The signal line applies the same truncated EW
  (span 9) to the macd column in a second window pass.
* Bollinger bands are the w-window mean ± k · population std.

Exactness: values quantize to 10^-scale integer units; every window
sum is an exact int64/DECIMAL aggregate; the EW means are fixed-order
double expression trees over exact integer lags.  All emitted columns
are bit-identical to the SQL twin.

Scale shape: two window passes over one HashPartitioning(group)
exchange (the second pass only for the MACD signal); everything stays
in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.functions.exact import dlit
from timeseriesutils_spark.operators.window_features import _as_list, make_window


def std_ew_weights(span: float, window: int) -> list[float]:
    """Standard-α truncated EW weights: α = 2/(span+1), renormalized
    over ``window`` terms (j = 0 is the current row)."""
    alpha = 2.0 / (span + 1.0)
    u = [alpha * (1.0 - alpha) ** j for j in range(window)]
    tot = sum(u)
    return [x / tot for x in u]


def tech_indicators(
    data: DataFrame,
    column: str,
    group_columns,
    order_by,
    rsi_window: int = 14,
    macd_fast: int = 12,
    macd_slow: int = 26,
    macd_signal: int = 9,
    boll_window: int = 20,
    boll_k: float = 2.0,
    scale: int = 2,
) -> DataFrame:
    """Append ``rsi``, ``macd``, ``macd_sig``, ``boll_mid``,
    ``boll_up``, ``boll_lo`` to each row of a grouped ordered series.

    Every indicator is NULL until its full window exists (standard
    complete-window discipline: NULL lags poison the sums, and counts
    guard the divisions).
    """
    g = _as_list(group_columns)
    order = _as_list(order_by)
    w = make_window(g, order)
    m = float(10**scale)
    q = F.floor(F.col(column) * F.lit(m) + F.lit(0.5)).cast("bigint")
    d = data.withColumn("_q", q)

    wf = w.rowsBetween(-(rsi_window - 1), 0)
    diff = F.col("_q") - F.lag("_q", 1).over(w)
    d = d.withColumn("_d", diff)
    gain = F.when(F.col("_d") > 0, F.col("_d")).otherwise(F.lit(0).cast("bigint"))
    loss = F.when(F.col("_d") < 0, -F.col("_d")).otherwise(F.lit(0).cast("bigint"))
    # complete window: rsi_window non-null diffs
    nd = F.count("_d").over(wf)
    ag = F.sum(F.when(F.col("_d").isNotNull(), gain)).over(wf).cast("double")
    al = F.sum(F.when(F.col("_d").isNotNull(), loss)).over(wf).cast("double")
    rsi = F.when(
        (nd == rsi_window) & ((ag + al) > 0), F.lit(100.0) * ag / (ag + al)
    )

    # truncated-EW MACD: both means over the SLOW window length so the
    # two lines share one completeness boundary
    W = macd_slow
    wt_f = std_ew_weights(macd_fast, W)
    wt_s = std_ew_weights(macd_slow, W)
    lagq = lambda j: (F.lag("_q", j).over(w) if j else F.col("_q"))  # noqa: E731
    ew = lambda wts: sum(  # noqa: E731
        (F.lit(wt) * lagq(j).cast("double") for j, wt in enumerate(wts[1:], 1)),
        F.lit(wts[0]) * lagq(0).cast("double"),
    )
    macd = (ew(wt_f) - ew(wt_s)) / F.lit(m)
    d = d.withColumn("_macd", macd)
    w2 = make_window(g, order)
    wt_g = std_ew_weights(macd_signal, macd_signal)
    lagm = lambda j: (F.lag("_macd", j).over(w2) if j else F.col("_macd"))  # noqa: E731
    sig = sum(
        (F.lit(wt) * lagm(j) for j, wt in enumerate(wt_g[1:], 1)),
        F.lit(wt_g[0]) * lagm(0),
    )

    wb = w.rowsBetween(-(boll_window - 1), 0)
    nb = F.count("_q").over(wb)
    s1 = F.sum("_q").over(wb).cast("double")
    s2 = F.sum(
        (F.col("_q").cast("decimal(38,0)") * F.col("_q").cast("decimal(38,0)"))
    ).over(wb).cast("double")
    nn = nb.cast("double")
    mid = s1 / nn / F.lit(m)
    sd = F.sqrt(F.greatest((nn * s2 - s1 * s1) / (nn * nn), F.lit(0.0))) / F.lit(m)
    full_b = nb == boll_window
    boll_mid = F.when(full_b, mid)
    boll_up = F.when(full_b, mid + F.lit(float(boll_k)) * sd)
    boll_lo = F.when(full_b, mid - F.lit(float(boll_k)) * sd)

    return d.select(
        *data.columns,
        rsi.alias("rsi"),
        F.col("_macd").alias("macd"),
        sig.alias("macd_sig"),
        boll_mid.alias("boll_mid"),
        boll_up.alias("boll_up"),
        boll_lo.alias("boll_lo"),
    )


def tech_indicators_sql(
    table: str,
    select_cols: str,
    column: str,
    group_columns,
    order_by,
    rsi_window: int = 14,
    macd_fast: int = 12,
    macd_slow: int = 26,
    macd_signal: int = 9,
    boll_window: int = 20,
    boll_k: float = 2.0,
    scale: int = 2,
) -> str:
    """DuckDB twin of :func:`tech_indicators` (full query text).
    ``select_cols`` is the comma-joined passthrough column list."""
    g = _as_list(group_columns)
    gsel = ", ".join(g)
    o = ", ".join(_as_list(order_by))
    over = f"(PARTITION BY {gsel} ORDER BY {o})"
    overf = (
        f"(PARTITION BY {gsel} ORDER BY {o} "
        f"ROWS BETWEEN {rsi_window - 1} PRECEDING AND CURRENT ROW)"
    )
    overb = (
        f"(PARTITION BY {gsel} ORDER BY {o} "
        f"ROWS BETWEEN {boll_window - 1} PRECEDING AND CURRENT ROW)"
    )
    m = float(10**scale)
    qx = f"CAST(FLOOR({column} * {dlit(m)} + 0.5) AS BIGINT)"

    W = macd_slow
    wt_f = std_ew_weights(macd_fast, W)
    wt_s = std_ew_weights(macd_slow, W)
    lagq = lambda j: (f"LAG(_q, {j}) OVER {over}" if j else "_q")  # noqa: E731
    ew = lambda wts: " + ".join(  # noqa: E731
        f"{dlit(wt)} * CAST({lagq(j)} AS DOUBLE)" for j, wt in enumerate(wts)
    )
    macd = f"(({ew(wt_f)}) - ({ew(wt_s)})) / {dlit(m)}"

    wt_g = std_ew_weights(macd_signal, macd_signal)
    lagm = lambda j: (f"LAG(_macd, {j}) OVER {over}" if j else "_macd")  # noqa: E731
    sig = " + ".join(f"{dlit(wt)} * {lagm(j)}" for j, wt in enumerate(wt_g))

    gain = "CASE WHEN _d > 0 THEN _d ELSE 0 END"
    loss = "CASE WHEN _d < 0 THEN -_d ELSE 0 END"
    nd = f"COUNT(_d) OVER {overf}"
    ag = f"CAST(SUM(CASE WHEN _d IS NOT NULL THEN {gain} END) OVER {overf} AS DOUBLE)"
    al = f"CAST(SUM(CASE WHEN _d IS NOT NULL THEN {loss} END) OVER {overf} AS DOUBLE)"
    rsi = (
        f"CASE WHEN {nd} = {rsi_window} AND ({ag} + {al}) > 0 "
        f"THEN 100.0 * {ag} / ({ag} + {al}) END"
    )

    nb = f"COUNT(_q) OVER {overb}"
    s1 = f"CAST(SUM(_q) OVER {overb} AS DOUBLE)"
    # Σq² can exceed 2^53 → VARCHAR-route the HUGEINT→DOUBLE cast so
    # DuckDB rounds-to-nearest like Spark instead of truncating
    s2 = (
        f"CAST(CAST(SUM(CAST(_q AS HUGEINT) * CAST(_q AS HUGEINT))"
        f" OVER {overb} AS VARCHAR) AS DOUBLE)"
    )
    nn = f"CAST({nb} AS DOUBLE)"
    mid = f"({s1} / {nn} / {dlit(m)})"
    sd = (
        f"(SQRT(GREATEST(({nn} * {s2} - {s1} * {s1}) / ({nn} * {nn}), 0.0))"
        f" / {dlit(m)})"
    )
    return f"""
WITH base AS (
  SELECT {select_cols}, {qx} AS _q FROM {table}
), dd AS (
  SELECT *, _q - LAG(_q, 1) OVER {over} AS _d FROM base
), mm AS (
  SELECT *, {macd} AS _macd,
    {rsi} AS rsi,
    CASE WHEN {nb} = {boll_window} THEN {mid} END AS boll_mid,
    CASE WHEN {nb} = {boll_window} THEN {mid} + {dlit(float(boll_k))} * {sd} END AS boll_up,
    CASE WHEN {nb} = {boll_window} THEN {mid} - {dlit(float(boll_k))} * {sd} END AS boll_lo
  FROM dd
)
SELECT {select_cols}, rsi, _macd AS macd,
  ({sig}) AS macd_sig,
  boll_mid, boll_up, boll_lo
FROM mm
"""
