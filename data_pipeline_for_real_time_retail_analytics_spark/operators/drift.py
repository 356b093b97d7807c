"""Distribution-drift profiling — Population Stability Index over
binned distributions (the standard monitoring statistic for "has this
feature's distribution moved", e.g. Siddiqi 2006, *Credit Risk
Scorecards*, and the symmetrized Kullback-Leibler divergence it equals:
PSI = KL(p‖q) + KL(q‖p)).

Why it belongs in a training-data pipeline: ingest drift (a crawl
snapshot whose length/quality/language mix shifted, an event stream
whose value distribution moved between weeks) silently changes what a
model trains on. The PSI over a fixed binning is the cheap, mergeable
per-window answer — and because it is a sum of per-bin terms computed
from two count vectors, it needs exactly one partial-aggregated pass
per window no matter the data size: the frame after the first groupBy
is bins × groups, never rows.

Determinism across engines: counts are exact BIGINTs; smoothed
probabilities are ONE IEEE-exact double division each; each bin's
addend ``(p−q)·ln(p/q)`` is quantized to micro-unit BIGINTs BEFORE the
sum (the bm25/token_entropy fold-order discipline — integer addition
is associative, double addition is not), so the DuckDB oracle matches
bit-for-bit. Add-one smoothing over the complete bin domain keeps the
logarithm total (no zero bins), which is also the standard production
guard against empty-bin blowups.

Spark-first shape: binning is map-side arithmetic; the count pass
partial-aggregates; domain completion is a generated bins-per-group
frame (``sequence`` + ``explode``) LEFT-joined against observed counts
— groups × n_bins rows, broadcast-sized. No UDFs, no driver data.

Reference parity: the reference's quality layer stops at rule checks
and column profiles (src/quality/, SURVEY §2.6); drift profiling
extends the mandated beyond-reference curation suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fixed_width_bin", "complete_bins", "psi_micro"]

#: default bin count for every drift profile in the repo
N_BINS = 10

MICRO = 1_000_000.0


def fixed_width_bin(value: Column, width: float, n_bins: int = N_BINS) -> Column:
    """Deterministic fixed-width bin id in [0, n_bins): floor(v/width)
    capped into the last bin. Fixed widths (not quantiles) on purpose:
    the bin edges are engine-independent constants, and two windows bin
    identically — quantile edges would move with the data and hide
    drift inside the binning itself."""
    return F.least(
        F.floor(value / F.lit(width)).cast("int"), F.lit(n_bins - 1)
    )


def complete_bins(
    counts: DataFrame,
    groups: DataFrame,
    group_cols: list[str],
    count_cols: list[str],
    n_bins: int = N_BINS,
) -> DataFrame:
    """LEFT-join observed (group, bin) counts onto the full group ×
    [0, n_bins) domain, zero-filling absent bins — PSI is a sum over
    the DOMAIN, and a bin observed in one window but not the other is
    exactly the drift signal, not a row to drop."""
    domain = groups.select(
        *group_cols,
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    filled = domain.join(counts, [*group_cols, "bin"], "left")
    return filled.select(
        *group_cols,
        "bin",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in count_cols
        ],
    )


def _smoothed(count: Column, total: Column, n_bins: int) -> Column:
    """Add-one-smoothed bin probability as one exact double division."""
    return (count + F.lit(1)).cast("double") / (
        (total + F.lit(n_bins)).cast("double")
    )


def psi_micro(
    completed: DataFrame,
    group_cols: list[str],
    ref_col: str = "c_ref",
    cur_col: str = "c_cur",
    n_bins: int = N_BINS,
) -> DataFrame:
    """(*group_cols, n_ref, n_cur, psi_micro) from a complete
    (group, bin, c_ref, c_cur) frame.

    psi_micro = Σ_bins round((p−q)·ln(p/q)·1e6) as BIGINT, with p, q
    the add-one-smoothed window probabilities. The per-group totals
    come from one aggregate over the same bins-bounded frame and join
    back broadcast (groups are few by construction)."""
    totals = completed.groupBy(*group_cols).agg(
        F.sum(ref_col).cast("long").alias("n_ref"),
        F.sum(cur_col).cast("long").alias("n_cur"),
    )
    joined = completed.join(F.broadcast(totals), group_cols)
    p = _smoothed(F.col(ref_col), F.col("n_ref"), n_bins)
    q = _smoothed(F.col(cur_col), F.col("n_cur"), n_bins)
    addend_micro = F.round((p - q) * F.log(p / q) * F.lit(MICRO), 0).cast(
        "long"
    )
    return (
        joined.select(*group_cols, "n_ref", "n_cur", addend_micro.alias("a"))
        .groupBy(*group_cols, "n_ref", "n_cur")
        .agg(F.sum("a").cast("long").alias("psi_micro"))
    )
