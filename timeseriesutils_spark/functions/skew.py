"""Skew mitigation for hot grouping keys.

AQE handles skewed *joins* at runtime, but a skewed ``groupBy`` (one
monster key) still funnels that key's rows into a single reduce task.
The classic fix is two-stage salted aggregation: shard each key across
``n_salts`` partial groups, aggregate, then merge the partials.  Works
for any algebraic aggregate (sum/count/min/max and anything with an
associative merge — including the engine's exact DECIMAL sums, which is
why the salted result is bit-identical to the unsalted one).

Window functions can't be salted this way (frame semantics need the
whole group); for those the documented mitigation is time-chunking with
overlap (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timeseriesutils_spark.operators.window_features import _as_list


def salted_agg(
    df: DataFrame,
    group_columns,
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) → groupBy(keys).

    ``partial_aggs``: name → aggregate over the raw rows (stage 1).
    ``merge_aggs``: name → aggregate over the stage-1 partials (stage 2),
    referring to stage-1 output columns by name.

    Example (exact skew-proof sum + count):

        salted_agg(df, "k",
                   {"s": dsum("v"), "n": F.count(F.lit(1))},
                   {"s": dsum("s"), "n": F.sum("n")})

    The salt is a deterministic hash shard of the full row via
    ``spark_partition_id``-independent ``xxhash64`` over a unique row key
    when available, else ``rand``-free ``monotonically_increasing_id`` —
    here: modulo over ``monotonically_increasing_id`` (stable within a
    plan, never crosses an exchange before stage 1).
    """
    groups = _as_list(group_columns)
    salted = df.withColumn(
        "_salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    stage1 = salted.groupBy(*groups, "_salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return stage1.groupBy(*groups).agg(
        *[c.alias(name) for name, c in merge_aggs.items()]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof fact⋈dim equi-join: replicate the (small) dim side
    ``n_salts`` times, shard the fact side's hot keys across the salt —
    every (key, salt) cell is then bounded by |key|/n_salts rows.

    When AQE's runtime skew-join split cannot apply (e.g. the join feeds
    a co-partitioned downstream op that must not be re-split), this is
    the explicit pre-salt.  The dim replication is a broadcast of
    n_salts·|dim| rows — use only for genuinely small dims.  Results are
    exactly the rows of the plain join (salt columns never leak).

    Only ``inner``/``left``-family joins are supported: under
    ``right``/``full`` outer the replicated dim side would emit each
    UNMATCHED dim row once per salt, breaking the plain-join equivalence.
    """
    if how.lower().replace("_outer", "") in ("right", "full", "outer", "fullouter"):
        raise ValueError(
            f"salted_broadcast_join does not support how={how!r}: unmatched "
            "dim rows are replicated n_salts times under right/full outer"
        )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    dim_rep = dim.select("*", salts)
    fact_s = fact.withColumn(
        "_salt", (F.monotonically_increasing_id() % n_salts).cast(
            dim_rep.schema["_salt"].dataType.simpleString()
        )
    )
    out = fact_s.join(F.broadcast(dim_rep), [on, "_salt"], how)
    return out.drop("_salt")
