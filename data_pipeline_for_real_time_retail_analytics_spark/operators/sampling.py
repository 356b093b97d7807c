"""Deterministic sampling and dataset splits for training-data pipelines.

Beyond-reference scope. `df.sample()` is seed-dependent AND
partitioning-dependent — rerun the job with different parallelism and a
different sample comes back, which poisons train/eval splits. These
operators derive membership from a content hash of the row id:
reproducible across runs, partitionings, engines (md5 arithmetic matches
the DuckDB oracle bit-for-bit), and stable under corpus growth — a doc
keeps its split forever, new docs distribute uniformly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket resolution — rates are exact multiples of 1/BUCKETS
BUCKETS = 10_000


def hash_bucket(id_col: Column, buckets: int = BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from md5 of the id — the split
    authority. One md5 per row, no shuffle."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep ~rate of rows, chosen by id hash (stable across runs)."""
    return df.where(hash_bucket(F.col(id_col), buckets) < int(rate * buckets))


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    val_rate: float = 0.1,
    test_rate: float = 0.1,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Adds a ``split`` column: test = lowest hash range, then val, the
    rest train — disjoint, exhaustive, stable under corpus growth."""
    b = hash_bucket(F.col(id_col), buckets)
    test_hi = int(test_rate * buckets)
    val_hi = test_hi + int(val_rate * buckets)
    return df.withColumn(
        "split",
        F.when(b < test_hi, "test").when(b < val_hi, "val").otherwise("train"),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of rare
    languages, 5% of the head language) — the rebalancing primitive for
    corpus curation. Pure map-side: a literal map lookup + hash compare."""
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in (kv[0], int(kv[1] * buckets))]
    )
    threshold = F.coalesce(
        rate_map[F.col(strata_col)], F.lit(int(default_rate * buckets))
    )
    return df.where(hash_bucket(F.col(id_col), buckets) < threshold)
