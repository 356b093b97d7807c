"""Skew-resistant aggregation and join helpers.

At 100 TB a handful of hot keys (one mega-customer, one dominant event
type) turn a single shuffle partition into the straggler that gates the
whole stage. Two mitigations, both pure DataFrame ops:

- **Two-stage salted aggregation**: append a deterministic salt, partial
  aggregate on (keys, salt) — spreading each hot key over N partitions —
  then merge the partials on the bare keys. For algebraic aggregates
  (count/sum/min/max) the result is bit-identical to the direct groupBy.
  (Spark's own map-side partial aggregation covers most of this; the
  explicit form matters for count_distinct-style aggs and as the
  building block of the salted join.)

- **Salted broadcast of replicated dimension**: for a skewed fact ⋈ dim
  join, explode the dim side over the salt domain and salt the fact side
  deterministically, so one hot fact key hash-spreads across N
  partitions. AQE's skew-join handles sort-merge cases at runtime; the
  salted form is for when you must pin the strategy.

Salting uses xxhash64 of stable columns, never rand() — plans stay
deterministic and re-runnable (idempotent retries, AQE re-planning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, salt_from: list[str], buckets: int = 16) -> DataFrame:
    """Deterministic salt in [0, buckets) from stable identifying cols."""
    return df.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in salt_from]), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_from: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """groupBy(keys) resistant to hot keys.

    ``partial_aggs`` run per (keys, salt); ``merge_aggs`` combine the
    partials per keys (e.g. partial count -> sum, partial sum -> sum,
    partial min -> min).
    """
    partial = (
        with_salt(df, salt_from, buckets)
        .groupBy(*keys, SALT)
        .agg(*[c.alias(n) for n, c in partial_aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(n) for n, c in merge_aggs.items()]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_from: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim with the dim side replicated across the salt domain so
    hot fact keys spread over ``buckets`` partitions. dim must be small
    enough to broadcast ×buckets (it is a dimension table by contract).
    """
    dim_rep = dim.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    salted_fact = with_salt(fact, salt_from, buckets)
    out = salted_fact.join(
        F.broadcast(dim_rep),
        (salted_fact[fact_key] == dim_rep[dim_key])
        & (salted_fact[SALT] == dim_rep[SALT]),
        how,
    )
    return out.drop(SALT)
