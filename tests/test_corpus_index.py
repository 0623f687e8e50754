"""Unit tests for text.inverted_index and text.pmi_cooccur."""

import math
import re

import pytest

from timeseriesutils_spark.operators.text import inverted_index, pmi_cooccur


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "new york is big"),
        (2, "new york new york"),
        (3, "big apple big apple big"),
        (4, "york is not new"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_inverted_index_postings(docs):
    out = {r.word: r for r in inverted_index(docs, min_df=2, max_postings=2).collect()}
    # 'new': doc1 tf1, doc2 tf2, doc4 tf1 -> df=3, total=4,
    # top-2 by (tf desc, doc asc) -> "2:2,1:1"
    assert out["new"].df == 3
    assert out["new"].total_tf == 4
    assert out["new"].postings == "2:2,1:1"
    # 'big': doc1 tf1, doc3 tf3 -> "3:3,1:1"
    assert out["big"].postings == "3:3,1:1"
    # df < min_df words absent
    assert "apple" not in out and "not" not in out


def test_inverted_index_plan_two_exchanges(docs, spark):
    plan = (
        inverted_index(docs, min_df=1, max_postings=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # (word, doc) count agg -> one exchange; word window -> second;
    # the final per-word groupBy must REUSE the window's partitioning
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_pmi_prefers_collocation(docs, spark):
    out = pmi_cooccur(docs, min_count=2, top_k=10).collect()
    ranked = {(r.w1, r.w2): r for r in out}
    assert ("new", "york") in ranked
    r = ranked[("new", "york")]
    assert r.c_xy == 3  # doc1, doc2 x2 ... doc2 "new york new york" has 2
    # manual PMI: pairs total = sum(len(toks)-1) = 3+3+4+3 = 13
    # c(new)=4, c(york)=4, N_uni=17
    expect = math.log((3 / 13) / ((4 / 17) * (4 / 17)))
    expect = math.floor(expect * 1e6 + 0.5) / 1e6
    assert r.pmi == pytest.approx(expect, abs=1e-12)
    # ranks are dense ints starting at 1
    assert sorted(x.rank for x in out) == list(range(1, len(out) + 1))
