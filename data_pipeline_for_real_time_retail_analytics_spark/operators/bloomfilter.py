"""Deterministic Bloom-filter pre-filter for incremental dedup.

The 100 TB incremental-dedup problem: every ingest batch must ask
"which of my chunks/documents already exist in the standing corpus?".
Joining the whole batch against the corpus-wide hash index is the
dominant cost — and almost all probes MISS (most new content is new).
A Bloom filter built over the corpus keys and broadcast to the batch
prunes the definite-misses map-side; only the (true hits ∪ false
positives) sliver pays the real verification join. This is the
standard big-data pre-filter (Spark itself injects runtime Bloom
filters for join pruning; Parquet footers carry them per column).

Representation here is the SET-BIT TABLE, not a packed bitmap: the
filter is the distinct ``(bit_row, bit_pos)`` pairs of the corpus keys
under k md5-derived hash functions (the operators/cms.py column hash —
``md5(key || ':' || row)`` first-8-hex-chars mod m). Bounded by
``k·m`` rows regardless of corpus size, broadcastable, and — the
repo-specific reason — expressible identically in DuckDB, so the
false-positive set is DETERMINISTIC and oracle-checkable, which no
library bitmap implementation guarantees. A production deployment
packs the same positions into a bitmap array for O(1) probes; the
positions themselves (and therefore the semantics measured here) are
unchanged.

Membership: a key hits iff ALL k of its positions are set — realized
as one broadcast join of the k probe rows per key against the bit
table plus a count-of-matches aggregate at key grain (map-side
broadcast, one small shuffle on the distinct keys only).

Sizing is the caller's contract, as with any Bloom filter: FP rate
≈ (1 - e^(-k·n/m))^k; the plan module documents its choice and the
measured FP count is part of the query output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cms import cms_col_hash

__all__ = ["bloom_bits", "bloom_probe"]


def _positions(key: F.Column, m: int, k: int) -> F.Column:
    """Array of k (bit_row, bit_pos) structs for one key."""
    return F.array(*[
        F.struct(
            F.lit(i).alias("bit_row"),
            cms_col_hash(key, i, m).alias("bit_pos"),
        )
        for i in range(k)
    ])


def _check_params(m: int, k: int) -> None:
    """m < 1 makes the position hash a mod-by-zero (NULL positions,
    silently empty filter); k < 1 makes EVERY probe a vacuous all-of-
    zero-positions hit. Both are loud errors, not quiet corruption."""
    if m < 1:
        raise ValueError(f"bloom m (bits per row) must be >= 1: {m}")
    if k < 1:
        raise ValueError(f"bloom k (hash count) must be >= 1: {k}")


def bloom_bits(keys: DataFrame, key_col: str, m: int, k: int = 3) -> DataFrame:
    """The filter: distinct ``(bit_row, bit_pos)`` set bits of the keys
    — ≤ ``k·m`` rows by construction, independent of corpus size."""
    _check_params(m, k)
    return (
        keys.select(
            F.explode(_positions(F.col(key_col), m, k)).alias("__b")
        )
        .select("__b.bit_row", "__b.bit_pos")
        .distinct()
    )


def bloom_probe(
    probes: DataFrame, key_col: str, bits: DataFrame, m: int, k: int = 3
) -> DataFrame:
    """``(key_col, bloom_hit)`` at distinct-key grain: hit iff all k
    positions of the key are set in ``bits``.

    ``bits`` is broadcast (bounded ≤ k·m rows); the probe side never
    shuffles at input grain — only its distinct keys do."""
    _check_params(m, k)
    keys = probes.select(F.col(key_col)).distinct()
    probe_rows = keys.select(
        key_col,
        F.explode(_positions(F.col(key_col), m, k)).alias("__b"),
    ).select(key_col, "__b.bit_row", "__b.bit_pos")
    matched = (
        probe_rows.join(F.broadcast(bits), ["bit_row", "bit_pos"], "inner")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__n_set"))
    )
    return keys.join(matched, key_col, "left").select(
        key_col,
        (F.coalesce(F.col("__n_set"), F.lit(0)) == F.lit(k)).alias(
            "bloom_hit"
        ),
    )
