"""Target-mixture corpus sampling (beyond-reference scope).

The dataset-curation step that turns "the training mix should be 40% en
/ 20% es / ..." into per-stratum keep decisions. Builds on the same
deterministic md5 hash-bucket membership as operators/sampling.py —
reproducible across runs, partitionings, and engines — but derives each
stratum's keep RATE from the data: the largest total T with
T·p_c ≤ n_c for every stratum c (T = min n_c/p_c), so the binding
stratum is kept in full and every other stratum is thinned to its
target proportion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import BUCKETS, hash_bucket


def mixture_thresholds(
    df: DataFrame,
    strata_col: str,
    targets: dict[str, float],
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum hash-bucket thresholds achieving the target mixture:
    ``(strata_col, __thr)`` with ``__thr = floor(T·p_c/n_c · buckets)``.

    Fully distributed: stratum counts are one partial-aggregated shuffle
    over a handful of groups; T is a one-row aggregate of that; both
    join back as broadcasts (stratum cardinality ≈ dozens, never
    data-scale). No collect, no driver loop — the same plan at 100 TB.
    All arithmetic is IEEE double in a fixed expression order, so the
    DuckDB oracle reproduces the thresholds bit-for-bit.

    A target stratum with ZERO rows in the data makes the mixture
    infeasible (the strict contract T = min n_c/p_c gives T = 0): the
    one-row T aggregate counts the strata it saw, and the threshold
    projection fails loudly if any target is missing, naming them —
    silently renormalizing over the present strata would return a
    sample claiming a mixture it does not have.
    """
    if not targets:
        raise ValueError(
            "targets must name at least one stratum with a positive "
            "share — an empty mixture is a config error, not a sample"
        )
    p_map = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in (kv[0], float(kv[1]))]
    )
    counts = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__p", p_map[F.col(strata_col)])
        .where(F.col("__p").isNotNull())
    )
    t_total = counts.select(
        F.min(F.col("__n") / F.col("__p")).alias("__t"),
        F.count(F.lit(1)).alias("__n_strata"),
    )
    n_expected = len(targets)
    t_total = t_total.select(
        F.when(F.col("__n_strata") == n_expected, F.col("__t"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("target mixture infeasible: only "),
                    F.col("__n_strata").cast("string"),
                    F.lit(
                        f" of {n_expected} target strata exist in the "
                        "data (a missing stratum forces T = 0)"
                    ),
                )
            )
        )
        .alias("__t")
    )
    return counts.crossJoin(F.broadcast(t_total)).select(
        strata_col,
        F.floor(F.col("__t") * F.col("__p") / F.col("__n") * F.lit(buckets)).alias(
            "__thr"
        ),
    )


def target_mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    targets: dict[str, float],
    buckets: int = BUCKETS,
) -> DataFrame:
    """Downsample ``df`` to the target domain mixture. Rows keep their
    membership decision forever (hash of ``id_col``), strata absent from
    ``targets`` are dropped, and the output totals ≈ T = min n_c/p_c
    rows distributed in the requested proportions."""
    thresholds = mixture_thresholds(df, strata_col, targets, buckets)
    return (
        df.join(F.broadcast(thresholds), strata_col)
        .where(hash_bucket(F.col(id_col), buckets) < F.col("__thr"))
        .drop("__thr")
    )
