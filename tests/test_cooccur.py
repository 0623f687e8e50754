"""Unit tests for basket co-occurrence similarity
(operators/cooccur.py)."""

import math

import pytest

from timeseriesutils_spark.operators.cooccur import item_cooccur


def _tx(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_cooccur_cosine(spark):
    # items 1,2 together in 2 baskets; item 1 in 3 baskets, item 2 in 2
    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3), (13, 3)]
    out = item_cooccur(
        _tx(spark, rows), min_support=2, top_k=5
    ).collect()
    got = {(r.item, r.neighbor): r for r in out}
    assert got[(1, 2)].cooc == 2
    assert got[(1, 2)].sim == pytest.approx(2 / math.sqrt(3 * 2), rel=1e-12)
    # symmetric: both directions present with the same sim
    assert got[(2, 1)].sim == got[(1, 2)].sim
    # (1,3) support 1 -> pruned by min_support
    assert (1, 3) not in got


def test_cooccur_dedups_basket_lines(spark):
    # the same item twice in one basket counts once (distinct incidence)
    rows = [(10, 1), (10, 1), (10, 2), (11, 1), (11, 2)]
    out = item_cooccur(_tx(spark, rows), min_support=2, top_k=5).collect()
    got = {(r.item, r.neighbor): r.cooc for r in out}
    assert got[(1, 2)] == 2


def test_cooccur_max_basket_guard(spark):
    # a mega-basket beyond the bound contributes no pairs
    mega = [(99, i) for i in range(10)]
    normal = [(1, 1), (1, 2), (2, 1), (2, 2)]
    out = item_cooccur(
        _tx(spark, mega + normal), min_support=2, top_k=5, max_basket=5
    ).collect()
    assert {(r.item, r.neighbor) for r in out} == {(1, 2), (2, 1)}


def test_cooccur_top_k_rank_deterministic(spark):
    # item 1 co-occurs with 2,3,4 identically -> rank ties break by id
    rows = []
    for b in (10, 11):
        rows += [(b, 1), (b, 2), (b, 3), (b, 4)]
    out = item_cooccur(_tx(spark, rows), min_support=2, top_k=2).collect()
    n1 = sorted((r.rnk, r.neighbor) for r in out if r.item == 1)
    assert n1 == [(1, 2), (2, 3)]  # ties -> ascending neighbor id
