"""Order-independent numeric aggregation helpers.

Summing doubles is sensitive to reduction order: with AQE and dynamic
partitioning the same query can produce last-ulp-different sums run to
run, and a ROUND() on a half-way boundary then flips a cent. For money
columns (fixed 2-dp values stored as double) we sum in DECIMAL — exact,
associative, order-independent — and cast back to double after rounding.
This also guarantees Spark and the DuckDB oracle agree bit-for-bit.

Averages and stddevs are derived from the exact sums in double arithmetic
(sum/count, sqrt((Σx² − (Σx)²/n)/(n−1))), which is deterministic because
the inputs are single exact values, not stream reductions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: enough for TPC-H-ish money values (< 10^10) with 2 decimals
MONEY = "decimal(12,2)"
#: small ratio columns (discount, tax) in [0, 1] with 2 decimals
RATIO = "decimal(4,2)"


def money(c: Column) -> Column:
    return c.cast(MONEY)


def ratio(c: Column) -> Column:
    return c.cast(RATIO)


def exact_sum(c: Column, scale: int = 2) -> Column:
    """Σ of a decimal column, rounded to ``scale`` and returned as double."""
    return F.round(F.sum(c), scale).cast("double")


def exact_avg(c: Column, scale: int = 4) -> Column:
    """Mean from the exact decimal sum: cast-to-double AFTER the exact Σ."""
    return F.round(F.sum(c).cast("double") / F.count(c), scale)


def exact_std(c: Column, scale: int = 4) -> Column:
    """Sample stddev from exact Σx and Σx² (both decimal): deterministic
    regardless of partitioning. c must be a decimal column."""
    n = F.count(c).cast("double")
    sx = F.sum(c).cast("double")
    sxx = F.sum(c * c).cast("double")
    return F.round(F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0))), scale)
