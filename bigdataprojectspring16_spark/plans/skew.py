"""Skew mitigation: salting helpers (the manual lever next to AQE).

AQE's OptimizeSkewedJoin (enabled in the session factory) splits
oversized shuffle partitions at runtime — but only for sort-merge
joins. Aggregations on a hot key and pre-AQE-era clusters need
salting: explode the hot key into ``n_salts`` sub-keys, do the heavy
work per sub-key, then combine. Both steps stay algebraic, so the
rewrite is exact for any algebraic aggregate.

tests/test_skew.py asserts the salted forms equal the plain forms on
the fixture's natural skew (events.user_id covers only 10% of
customer keys, SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation through a salted intermediate key.

    ``aggs`` is a list of (function, column, alias) with function in
    {count, sum, min, max} — the algebraic aggregates whose partial
    results combine losslessly (count→sum, sum→sum, min→min,
    max→max). Phase 1 groups on (key, salt) — 8× more groups, 8×
    smaller hot partitions; phase 2 combines the per-salt partials
    on the real key.
    """
    combine = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    first = {
        "count": lambda c: F.count(F.lit(1)),
        "sum": lambda c: F.sum(c),
        "min": lambda c: F.min(c),
        "max": lambda c: F.max(c),
    }
    unsupported = [f for f, _, _ in aggs if f not in combine]
    if unsupported:
        raise ValueError(f"non-algebraic aggregate(s): {unsupported}")

    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(
        *[first[f](c).alias(a) for f, c, a in aggs]
    )
    return partial.groupBy(key).agg(
        *[combine[f](a).alias(a) for f, _, a in aggs]
    )


def salted_join_counts(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    n_salts: int = 8,
) -> tuple[Column, DataFrame, DataFrame]:
    """Salt a fact⋈dim equi-join: fact rows get a random salt, the
    dim side is replicated ``n_salts`` times so every (key, salt)
    pair still finds its dim row. Returns (join condition, salted
    fact, replicated dim) — the caller composes the join so any
    projection/aggregation can follow.

    This is the fallback when the dim is too big to broadcast AND
    AQE cannot help (e.g. the hot side feeds a non-SMJ plan); with a
    broadcastable dim, prefer ``F.broadcast`` (see
    join_skew_events_customers).
    """
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (F.col(fact_key) == F.col(dim_key)) & (
        salted_fact["__salt"] == replicated_dim["__salt"]
    )
    return cond, salted_fact, replicated_dim
