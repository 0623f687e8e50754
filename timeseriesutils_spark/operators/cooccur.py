"""Basket co-occurrence similarity — the item-item collaborative-
filtering primitive ("customers who bought X also bought Y"), also the
generic co-occurrence engine behind related-queries, tag affinity, and
substitute detection.

Cosine similarity on the binary basket-incidence matrix:

    sim(a, b) = cooc(a, b) / sqrt(cnt(a) · cnt(b))

Scale design (the classic all-pairs trap, avoided the same way the
dedup family avoids it — operators/dedup.py posting lists):

* pairs are generated PER BASKET from a sorted in-row array (one
  groupBy, then row-local ``transform``/``slice`` expansion — no
  self-join, no second shuffle of the fact table);
* a ``max_basket`` guard drops degenerate mega-baskets before the
  quadratic step, exactly like ``max_posting`` bounds hot shingles —
  a basket of b items emits b(b−1)/2 pairs, so the bound caps the
  blow-up at a constant while such baskets carry ~no signal;
* ``min_support`` prunes the long singleton tail BEFORE the count join,
  so the (item, neighbor) table that reaches ranking is the co-purchase
  core, not the cross product.

Exactness: cooc and the item counts are exact integers; sqrt is
IEEE-correctly-rounded in both engines, so ``sim`` is the same double
bit pattern; ranking ties break on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_cooccur(
    tx: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    top_k: int = 5,
    max_basket: int = 64,
) -> DataFrame:
    """Top-``top_k`` most-similar items per item by basket-cosine.

    Returns (item, neighbor, cooc, sim, rnk): both directions of every
    surviving pair, ranked per item by (sim DESC, neighbor ASC).
    """
    baskets = tx.select(basket_col, item_col).distinct()
    arrs = (
        baskets.groupBy(basket_col)
        .agg(F.sort_array(F.collect_set(item_col)).alias("_items"))
        .filter(F.size("_items").between(2, max_basket))
    )
    pairs = arrs.select(
        F.explode(
            F.expr(
                "flatten(transform(_items, (x, i) -> "
                "transform(slice(_items, i + 2, size(_items)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    cooc = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= min_support)
    )
    cnt = baskets.groupBy(item_col).agg(F.count(F.lit(1)).alias("_cnt"))
    sym = cooc.unionByName(
        cooc.select(
            F.col("b").alias("a"), F.col("a").alias("b"), F.col("cooc")
        )
    )
    j = (
        sym.join(cnt.select(F.col(item_col).alias("a"), F.col("_cnt").alias("_ca")), "a")
        .join(cnt.select(F.col(item_col).alias("b"), F.col("_cnt").alias("_cb")), "b")
    )
    sim = F.col("cooc").cast("double") / F.sqrt(
        (F.col("_ca") * F.col("_cb")).cast("double")
    )
    w = Window.partitionBy("a").orderBy(F.desc("sim"), F.asc("b"))
    return (
        j.withColumn("sim", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(
            F.col("a").alias("item"),
            F.col("b").alias("neighbor"),
            "cooc",
            "sim",
            "rnk",
        )
    )


def item_cooccur_sql(
    table: str = "lineitem",
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    top_k: int = 5,
    max_basket: int = 64,
) -> str:
    """DuckDB twin of :func:`item_cooccur` (pairs via self-join — the
    oracle favors clarity; the Spark path favors the single-shuffle
    row-local expansion, results identical)."""
    return f"""
WITH b AS (SELECT DISTINCT {basket_col} AS bk, {item_col} AS it FROM {table}),
ok AS (SELECT bk FROM b GROUP BY bk HAVING COUNT(*) BETWEEN 2 AND {max_basket}),
p AS (
  SELECT x.it AS a, y.it AS b
  FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
  WHERE x.bk IN (SELECT bk FROM ok)
),
c AS (SELECT a, b, COUNT(*) AS cooc FROM p GROUP BY a, b HAVING COUNT(*) >= {min_support}),
cnt AS (SELECT it, COUNT(*) AS n FROM b GROUP BY it),
sym AS (SELECT a, b, cooc FROM c UNION ALL SELECT b, a, cooc FROM c),
r AS (
  SELECT sym.a AS item, sym.b AS neighbor, sym.cooc,
    CAST(sym.cooc AS DOUBLE) / sqrt(CAST(ca.n * cb.n AS DOUBLE)) AS sim
  FROM sym JOIN cnt ca ON sym.a = ca.it JOIN cnt cb ON sym.b = cb.it
)
SELECT item, neighbor, cooc, sim,
  CAST(row_number() OVER (PARTITION BY item ORDER BY sim DESC, neighbor ASC) AS INT) AS rnk
FROM r QUALIFY rnk <= {top_k}
"""
