"""Round-14 measurement probe (throwaway): variant timings that
localize WHERE inside a heavy query the execute time goes, per guide
§1.1 (empirical loop).  Variants may compute WRONG values on purpose —
they are timing probes, never declared queries.

Usage: python tools/probe_r14.py <probe> [...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, df, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    print(f"{label}: {best:.2f} s", flush=True)
    return best


def stl_variants(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.stl import (
        _lowpass_counts,
        _tricube_q,
        stl_decompose,
    )
    from timeseriesutils_spark.queries.series_queries import (
        _STL_PARAMS,
        _daily,
        regularize,
    )

    grid = regularize(_daily(spark, SF), "day_price", "ship_day",
                      ["l_suppkey"], how="interp")
    t("substrate (regularized grid)", grid)
    full = stl_decompose(grid, "day_price_interp", "ship_day",
                         ["l_suppkey"], **_STL_PARAMS)
    t("stl_decompose full", full)

    # hand-built chain matching stl_decompose but stopping early /
    # swapping the trend stage's arithmetic
    P, hs, ht = 7, 3, 10
    mult = 100
    Wq = _tricube_q(hs)
    Uq = _tricube_q(ht)
    cj = _lowpass_counts(P)
    base = grid.select(
        "l_suppkey",
        F.col("ship_day").cast("bigint").alias("_t"),
        F.col("day_price_interp").cast("double").alias("_v"),
        F.floor(F.col("day_price_interp").cast("double") * F.lit(mult)
                + F.lit(0.5)).cast("bigint").alias("_xq"),
    )
    wi = Window.partitionBy("l_suppkey").orderBy("_t")

    def off(col, k):
        return F.lead(col, k).over(wi) if k > 0 else (
            F.lag(col, -k).over(wi) if k < 0 else F.col(col))

    s_num = None
    for i, k in enumerate(range(-hs, hs + 1)):
        term = F.lit(Wq[i]) * off("_xq", k * P)
        s_num = term if s_num is None else s_num + term
    s1 = base.select("*", s_num.alias("_sn"))
    l_num = None
    for i, j in enumerate(range(-P, P + 1)):
        term = F.lit(cj[i]) * off("_sn", j)
        l_num = term if l_num is None else l_num + term
    s2 = s1.select("*", (F.col("_sn") * F.lit(3 * P * P) - l_num).alias("_seasn"))
    t("through seasonal (no trend)", s2)
    s3 = s2.select("*", (F.col("_xq") * F.lit(3 * P * P * sum(Wq))
                         - F.col("_seasn")).alias("_vn"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tn_dec = None
    for i, m in enumerate(range(-ht, ht + 1)):
        td = dec(F.lit(Uq[i])) * dec(off("_vn", m))
        tn_dec = td if tn_dec is None else tn_dec + td
    t("trend stage decimal38 (as shipped)", s3.select("*", tn_dec.alias("_trn")))
    # hi/lo split: 42 int64 ops + ONE decimal recombination
    bh = F.shiftright(F.col("_vn"), 31)
    bl = F.col("_vn") - (bh * F.lit(2 ** 31))
    s3b = s3.select("*", bh.alias("_vh"), bl.alias("_vl"))
    sh = None
    sl = None
    for i, m in enumerate(range(-ht, ht + 1)):
        thi = F.lit(Uq[i]) * off("_vh", m)
        tlo = F.lit(Uq[i]) * off("_vl", m)
        sh = thi if sh is None else sh + thi
        sl = tlo if sl is None else sl + tlo
    recomb = dec(sh) * dec(F.lit(2 ** 31)) + dec(sl)
    t("trend stage hi/lo split + 1 decimal recombine",
      s3b.select("*", recomb.alias("_trn")))


def fasttext_variants(spark):
    from pyspark.sql import functions as F

    from timeseriesutils_spark.operators.dedup import portable_hash64
    from timeseriesutils_spark.operators.fasttext import fasttext_features
    from timeseriesutils_spark.operators.text import words
    from timeseriesutils_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    classes = tuple(sorted(
        r[0] for r in docs.select("lang").distinct().collect()))
    print("classes:", classes, flush=True)
    feats = fasttext_features(docs, classes, "doc_id", "text", "lang")
    t("fasttext_features as shipped", feats)

    # variant: hash/sign/slot hoisted into a projection before groupBy
    _B = 3
    bg = docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("_id"),
        F.col("lang").alias("_lbl"),
        F.explode(words(F.col("text"))).alias("_w"),
    ).filter(F.length("_w") >= 2).select(
        "_id", "_lbl",
        F.explode(F.expr(
            "transform(sequence(1, length(_w) - 1), i -> substring(_w, i, 2))"
        )).alias("_bg"),
    )
    proj = ["_id", "_lbl"]
    for i in range(len(classes)):
        h = portable_hash64(F.concat(F.lit(f"{i}|"), F.col("_bg")))
        proj.append(h.alias(f"_h{i}"))
    hoisted = bg.select(*proj)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i in range(len(classes)):
        h = F.col(f"_h{i}")
        sign = (h % F.lit(_B * 2) >= F.lit(_B)).cast("bigint") * 2 - 1
        slot = (h % F.lit(_B)).cast("int")
        for j in range(_B):
            aggs.append(F.sum(
                F.when(slot == F.lit(j), sign).otherwise(0)
            ).alias(f"_c{i}_{j + 1}"))
    per_doc = hoisted.groupBy("_id", "_lbl").agg(*aggs)
    t("fasttext features w/ hoisted hashes", per_doc)

    # cost of the explode+md5 substrate alone
    t("bigram explode + 5 md5 (no agg)", hoisted)


def main():
    from timeseriesutils_spark.session import get_spark
    from timeseriesutils_spark.sources.tables import TABLES, load_table

    spark = get_spark(app_name="tsspark-probe-r14")
    for tb in TABLES:
        load_table(spark, SF, tb).limit(1).count()
    for probe in sys.argv[1:]:
        spark.sparkContext.setJobDescription(f"probe:{probe}")
        globals()[f"{probe}_variants"](spark)
    spark.stop()


if __name__ == "__main__":
    main()
