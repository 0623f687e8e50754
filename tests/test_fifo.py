"""Unit tests for FIFO lot allocation (operators/fifo.py)."""

from pyspark.sql import functions as F

from timeseriesutils_spark.operators.fifo import fifo_allocation


def _alloc(spark, rows):
    df = spark.createDataFrame(
        rows, "item long, qty long, is_buy boolean, seq long, id long"
    )
    return fifo_allocation(df, "item", "qty", "is_buy", ["seq"], "id").collect()


def test_fifo_splits_across_lots(spark):
    # buys: lot1 qty10, lot2 qty5; sells: s1 qty8, s2 qty7
    rows = [
        (1, 10, True, 1, 101),
        (1, 5, True, 2, 102),
        (1, 8, False, 1, 201),
        (1, 7, False, 2, 202),
    ]
    got = {(r.buy_id, r.sell_id): r.qty_alloc for r in _alloc(spark, rows)}
    # s1 takes 8 from lot1; s2 takes remaining 2 from lot1 + 5 from lot2
    assert got == {(101, 201): 8, (101, 202): 2, (102, 202): 5}


def test_fifo_oversell_and_leftover(spark):
    # sells exceed buys: the uncovered tail of s just gets no allocation
    rows = [
        (1, 4, True, 1, 101),
        (1, 9, False, 1, 201),
    ]
    got = {(r.buy_id, r.sell_id): r.qty_alloc for r in _alloc(spark, rows)}
    assert got == {(101, 201): 4}
    # leftover buy: second item with no sells allocates nothing
    rows2 = [(2, 5, True, 1, 103)]
    assert _alloc(spark, rows2) == []


def test_fifo_items_independent(spark):
    rows = [
        (1, 3, True, 1, 101),
        (2, 3, False, 1, 201),  # different item: must not match
    ]
    assert _alloc(spark, rows) == []


def test_fifo_conservation(spark):
    # total allocated = min(total buys, total sells) per item
    rows = []
    sid = 0
    for i, (b, s) in enumerate([(17, 13), (5, 9), (20, 20)], start=1):
        for q in (b // 2, b - b // 2):
            sid += 1
            rows.append((i, q, True, sid, 100 + sid))
        for q in (s // 3 or 1, max(s - 2 * (s // 3 or 1), 0) or 1, s // 3 or 1):
            sid += 1
            rows.append((i, q, False, sid, 200 + sid))
    out = _alloc(spark, [r for r in rows if r[1] > 0])
    per_item = {}
    for r in out:
        per_item[r.item] = per_item.get(r.item, 0) + r.qty_alloc
    buys = {i: sum(q for it, q, b, *_ in rows if it == i and b) for i in (1, 2, 3)}
    sells = {i: sum(q for it, q, b, *_ in rows if it == i and not b) for i in (1, 2, 3)}
    for i in (1, 2, 3):
        assert per_item.get(i, 0) == min(buys[i], sells[i])


def test_fifo_zero_qty_lot_emits_nothing(spark):
    rows = [
        (1, 0, True, 1, 101),   # zero-width lot
        (1, 5, True, 2, 102),
        (1, 5, False, 3, 201),
    ]
    got = {(r.buy_id, r.sell_id): r.qty_alloc for r in _alloc(spark, rows)}
    assert got == {(102, 201): 5}
