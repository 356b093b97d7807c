"""Deterministic weighted sampling without replacement (priority
sampling, Duffield–Lund–Thorup 2007).

Every item gets priority q = w / u with u uniform on (0, 1]; the
sample is the k items with the largest priorities, and with
τ = the (k+1)-th priority, ŵ = max(w, τ) is an unbiased estimator of
any subset's total weight from the sample alone. This is the standard
one-pass weighted subset selection for training-mix construction:
heavier (longer / higher-quality) documents are preferentially kept,
every item retains a nonzero inclusion probability min(1, w/τ), and
the estimator column makes downstream token accounting unbiased
instead of merely plausible.

Determinism / portability: u is derived from the item id through the
repo's portable md5 bridge (first 8 md5 hex chars as a BIGINT —
operators/cms.py precedent), so u = (h + 1) / 2^32 with h ∈ [0, 2^32);
the priority is computed as the exact integer floor
``(w · 2^32) DIV (h + 1)`` — identical BIGINT arithmetic on Spark and
DuckDB, no transcendental in sight. Ties (possible through the floor)
break on ascending id. Weights here are BIGINTs ≤ ~10^6 so the product
fits comfortably in BIGINT; a deployment with larger weights widens to
DECIMAL(38,0) (the repo's HUGEINT-bridge convention, see
plans/langquotaq.py).

Scale shape: one scan computes (w, h, priority) per row; the top
(k+1) selection is Spark's TakeOrderedAndProject (per-partition heads,
no global sort); the ≤ (k+1)-row head is localCheckpointed so τ, the
ranks and the estimator all derive from one pass. Nothing but the
first scan grows with the corpus.

Reference scope: the reference has no sampling tier at all; this is
part of the beyond-reference training-data surface (SURVEY.md §6)
alongside operators/sampling.py's stratified/split samplers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^32 — the u-hash denominator
_U_SCALE = 1 << 32


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    salt: str = "ps",
) -> DataFrame:
    """The k largest-priority rows of ``df`` plus the DLT columns:
    ``weight`` (the clamped BIGINT weight), ``priority`` (scaled
    BIGINT, weight units), ``rank`` (1-based) and ``est_weight`` =
    max(w, τ) with τ the (k+1)-th priority (0 when the input has ≤ k
    rows — the sample is then exhaustive and ŵ = w exactly, which is
    what τ = 0 yields).

    Rows with a NULL id are excluded (no deterministic u exists for
    them); NULL/non-positive weights clamp to 1 so every surviving row
    keeps a nonzero inclusion probability.

    The emitted/working column names (``weight``, ``priority``,
    ``rank``, ``est_weight``, ``tau``, ``__h``) are reserved: an input
    already carrying one would be silently overwritten (or break the
    τ cross-join drop), so it is rejected loudly instead — the
    rangejoin.py discipline. Rename or drop the clash upstream.
    """
    reserved = {"weight", "priority", "rank", "est_weight", "tau", "__h"} & set(
        df.columns
    )
    # weight_col == "weight" is the one legitimate overlap: the output
    # "weight" column IS the (clamped) input weight
    clash = reserved - ({"weight"} if weight_col == "weight" else set())
    if clash:
        raise ValueError(
            "input columns clash with priority_sample's reserved output/"
            f"working names: {sorted(clash)}; rename them upstream"
        )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = F.greatest(F.coalesce(F.col(weight_col).cast("long"), F.lit(1)), F.lit(1))
    head = (
        df.where(F.col(id_col).isNotNull())
        .withColumn("weight", w)
        .withColumn("__h", h)
        .withColumn("priority", F.expr(f"(weight * {_U_SCALE}L) DIV (__h + 1L)"))
        .drop("__h")
        .orderBy(F.desc("priority"), F.asc(id_col))
        .limit(k + 1)
        .localCheckpoint()
    )
    ranked = head.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("priority"), F.asc(id_col))),
    )
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rank") == k + 1, F.col("priority"))), F.lit(0)
        ).alias("tau")
    )
    return (
        ranked.where(F.col("rank") <= k)
        .join(F.broadcast(tau), how="cross")
        .withColumn(
            "est_weight", F.greatest(F.col("weight"), F.col("tau")).cast("long")
        )
        .drop("tau")
    )
