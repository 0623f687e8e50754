"""Round-15 optimization-round pins: the ADVICE-r14 fixes.

1. cox_ph arrow kernel: the u/i envelope guard must not fail open on
   NaN (zero risk-set mass after q9(exp) underflow) — ADVICE r14 #2.
2. incremental_training_corpus checkpoint_once memo key must
   distinguish two different inputs with the same schema and
   parameters — ADVICE r14 #1 (high).
"""

import pytest
from pyspark.sql import functions as F


def test_cox_arrow_nonfinite_guard_raises(spark):
    """A perfectly-separated group whose first Newton step drives
    β·x < -21 makes every q9(exp) in the (single) event time's risk
    set quantize to 0 → s0 = 0 → u/i non-finite.  Pre-fix the int64
    envelope compare was False for NaN and the cast silently produced
    INT64_MIN garbage; the kernel must raise loudly instead (the
    relational chain's ANSI double→long cast raises here too)."""
    from timeseriesutils_spark.operators.coxph import _cox_newton_np

    cells = spark.createDataFrame(
        [("g", 2, 1000, 1, 1), ("g", 2, 2000, 30, 0)],
        "g string, _t long, _xq long, _cnt long, _d long",
    )
    out = _cox_newton_np(cells, ("g",), n_steps=4, mx=1)
    with pytest.raises(Exception, match="non-finite"):
        out.collect()


def test_cox_arrow_finite_groups_unaffected_by_guard(spark):
    """The guard must not fire on a normal group (same kernel path)."""
    from timeseriesutils_spark.operators.coxph import _cox_newton_np

    cells = spark.createDataFrame(
        [
            ("g", 1, 0, 3, 1),
            ("g", 2, 100, 2, 1),
            ("g", 3, 50, 2, 0),
        ],
        "g string, _t long, _xq long, _cnt long, _d long",
    )
    rows = _cox_newton_np(cells, ("g",), n_steps=3, mx=100).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["_u"] is not None and r["_i"] is not None
    assert r["n"] == 7 and r["n_events"] == 2


def test_incremental_memo_key_distinguishes_inputs(spark, tmp_path):
    """Two parquet datasets with the SAME schema and parameters but
    different corpus content must not share checkpoint_once state
    tiers (pre-fix, the canonicalized-plan key collided and the second
    input silently reused the first input's materialized d2/d3/d4
    state — ADVICE r14, high)."""
    from timeseriesutils_spark.functions.checkpoint import clear_memo
    from timeseriesutils_spark.operators.corpus_pipeline import (
        incremental_training_corpus,
    )
    from timeseriesutils_spark.queries.llm_queries import E2E_PARAMS
    from timeseriesutils_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    W = 30
    path_a = str(tmp_path / "docs_a")
    path_b = str(tmp_path / "docs_b")
    docs.write.parquet(path_a)
    # dataset B: same schema, same batch rows, but every CORPUS text is
    # replaced by a batch doc's text — under B's own state the exact
    # dedup drops those batch docs; under A's (colliding) state they
    # survive, so a memo collision changes the output rows.
    batch_text = (
        docs.filter(F.col("doc_id") == W).select("text").first()["text"]
    )
    docs.withColumn(
        "text",
        F.when(F.col("doc_id") < W, F.lit(batch_text)).otherwise(
            F.col("text")
        ),
    ).write.parquet(path_b)

    docs_a = spark.read.parquet(path_a)
    docs_b = spark.read.parquet(path_b)

    clear_memo()
    want_b = sorted(
        map(tuple, incremental_training_corpus(docs_b, W, **E2E_PARAMS).collect())
    )
    clear_memo()
    got_a = sorted(
        map(tuple, incremental_training_corpus(docs_a, W, **E2E_PARAMS).collect())
    )
    # A's run primed the memo; B must NOT read A's state tiers
    got_b = sorted(
        map(tuple, incremental_training_corpus(docs_b, W, **E2E_PARAMS).collect())
    )
    clear_memo()
    assert got_a != want_b  # the two inputs genuinely disagree
    assert got_b == want_b
