"""Sequence packing: assign documents to fixed-token-budget training
sequences — the concat-then-chunk preparation step of LLM pretraining
(each shard's documents are laid end to end in a deterministic order and
the token stream is cut every ``budget`` tokens).

The reference has no analogue (SURVEY §2.2 training-pipeline tier);
everything here is built-in expressions.

Scale design: a single global running sum would serialize the corpus
through one partition, so packing is SHARDED — ``shard = id % n_shards``
(deterministic, cross-engine exact, unlike engine-specific hash
functions), running token sum per shard.  Shards pack independently and
in parallel; each shard's final partially-filled sequence is the only
waste, amortized to nothing at corpus scale.  At 100 TB pick n_shards ≈
a few × cluster cores; the per-shard window is one narrow exchange on an
8-byte key.

Token counting uses the same BPE-ish ``TOKEN_PATTERN`` as text_stats —
a Java∩RE2 regex, so the DuckDB oracle counts identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.text import TOKEN_PATTERN


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document packing assignment.

    Output: (id, shard, n_tokens, seq_id, tok_offset) where ``seq_id`` is
    the shard-local sequence the document STARTS in and ``tok_offset`` its
    token offset inside that sequence.  Documents longer than the
    remaining room straddle sequence boundaries — the consumer cuts the
    concatenated stream every ``budget`` tokens (GPT-style packing keeps
    the stream dense; no padding, no truncation here).

    Deterministic: shard and order derive from the id alone, so the
    layout is stable across runs, partitionings, and engines.
    """
    t = docs.select(
        F.col(id_col),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)
        ).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_start")
    return t.select(
        id_col,
        "shard",
        "n_tokens",
        start,
    ).select(
        id_col,
        "shard",
        "n_tokens",
        F.floor(F.col("_start") / budget).cast("bigint").alias("seq_id"),
        (F.col("_start") % budget).cast("bigint").alias("tok_offset"),
    )


def pack_stats(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(shard, seq) packing summary: docs started, tokens started,
    span utilization — the QA view over :func:`pack_sequences`."""
    assigned = pack_sequences(docs, budget, n_shards, id_col, text_col)
    return assigned.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min(id_col).alias("first_doc"),
    )
