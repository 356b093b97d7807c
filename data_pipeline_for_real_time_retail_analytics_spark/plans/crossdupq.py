"""Cross-source n-gram overlap matrix — staged for a round-11 driver
slot via plans/pending_r11.py.

``source_overlap_matrix``: for every pair of sources sharing at least
one distinct word 8-gram, the count of shared grams and a floor-ppm
containment rate (shared / the smaller source's kept-gram vocabulary).
This is the source-level syndication detector: document-level tiers
(MinHash, containment, chunk dedup) find individual copies, but a
mirror site / wire-service relationship shows up as a source PAIR with
an overlap rate far above the corpus background, and THIS table is
where a curation run sees it first (then prunes or down-weights one
side of the pair). The sf0.01 corpus genuinely contains the signal:
22 of 190 source pairs share grams, topping at 137 shared 8-grams —
the generator's cross-document repeated spans, the same ones
curation_funnel's span-clean stage surfaces.

Bounding discipline (the boilerplate_ngrams pattern): grams present in
more than ``SOURCE_CAP`` distinct sources are excluded before the pair
join — a ubiquitous gram carries no pairwise signal and is exactly the
posting-list blowup a quadratic fanout dies on at corpus scale. The
denominator uses the same kept-gram universe, so the ppm rate is a
containment over one consistent vocabulary.

Scale shape: distinct (source, gram) is one partial-aggregated pass;
the cap turns each gram's posting list into a bounded ≤ cap-element
collect_set (one gram-keyed shuffle, never a self-join — see the
query docstring for the measured pathology the first draft had), and
the pair expansion is a map-side array transform emitting at most
C(SOURCE_CAP, 2) structs per gram; per-source totals join back
broadcast. At production source counts the gram shuffle key takes the
md5-prefix treatment (operators/dedup.ngram_jaccard_pairs precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import word_shingles
from .corpusbase import _docs
from .llm_oracles import toks_expr

#: word n-gram width
N = 8
#: grams in more than this many distinct sources are background noise
SOURCE_CAP = 10


def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, shared_grams, grams_a, grams_b,
    overlap_ppm) per overlapping source pair, ascending pair.

    No self-join: the SOURCE_CAP bound means each kept gram's posting
    list fits in a ≤ cap-element ``collect_set`` — one shuffle on the
    gram key, then the pair expansion is a map-side array transform
    (≤ C(cap, 2) structs per gram). A first draft self-joined the
    posting table on the gram key; the executed-plan audit showed the
    posting subtree recomputed 4× (8 parquet scans, 26 shuffles) with
    ReuseExchange never firing, so the bounded-array shape replaced it
    (1 corpus scan, the gram-keyed exchange, two tiny aggregates). The
    DuckDB oracle still uses the self-join formulation — the parity
    gate is what proves the two shapes equivalent."""
    docs = _docs(spark, sf_dir).where(F.col("source").isNotNull())
    grams = (
        docs.select(
            "source", F.explode(word_shingles(F.col("text"), N)).alias("g")
        )
        .distinct()
    )
    # (g, sorted posting list) for grams within the cap; one row per
    # kept distinct gram. localCheckpoint: pairs and totals both consume
    # it — at production scale this frame persists to a warehouse table
    # per corpus epoch instead (the plans/copurchase.py convention).
    posting = (
        grams.groupBy("g")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .where(F.size("srcs") <= SOURCE_CAP)
        .localCheckpoint()
    )
    totals = (
        posting.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_grams"))
    )
    pairs = (
        posting.select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (x, i) ->"
                    " transform(slice(srcs, i + 2, size(srcs)),"
                    " y -> struct(x AS source_a, y AS source_b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.source_a").alias("source_a"),
                 F.col("p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_grams"))
    )
    return (
        pairs.join(
            F.broadcast(totals.withColumnRenamed("source", "source_a")
                        .withColumnRenamed("n_grams", "grams_a")),
            "source_a",
        )
        .join(
            F.broadcast(totals.withColumnRenamed("source", "source_b")
                        .withColumnRenamed("n_grams", "grams_b")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            "grams_a",
            "grams_b",
            F.expr(
                "CAST((1000000 * shared_grams)"
                " DIV least(grams_a, grams_b) AS BIGINT)"
            ).alias("overlap_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


QUERIES = {
    "source_overlap_matrix": q_source_overlap_matrix,
}

_TOKS = toks_expr()

ORACLES: dict[str, str] = {
    "source_overlap_matrix": f"""
        WITH tokd AS (
            SELECT source, {_TOKS} AS w FROM documents
            WHERE source IS NOT NULL
        ),
        grams AS (
            SELECT DISTINCT source, g
            FROM (
                SELECT source,
                       unnest(list_distinct(list_transform(
                           range(1, greatest(len(w) - {N - 1}, 0) + 1),
                           i -> array_to_string(list_slice(w, i, i + {N - 1}),
                                                ' ')))) AS g
                FROM tokd WHERE len(w) >= {N}
            )
        ),
        kept AS (
            SELECT source, g FROM grams
            WHERE g IN (SELECT g FROM grams GROUP BY g
                        HAVING COUNT(*) <= {SOURCE_CAP})
        ),
        totals AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
            FROM kept GROUP BY source
        ),
        pairs AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS shared_grams
            FROM kept a JOIN kept b
              ON a.g = b.g AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT p.source_a, p.source_b, p.shared_grams,
               ta.n_grams AS grams_a, tb.n_grams AS grams_b,
               CAST((1000000 * p.shared_grams)
                    // least(ta.n_grams, tb.n_grams) AS BIGINT)
                   AS overlap_ppm
        FROM pairs p
        JOIN totals ta ON ta.source = p.source_a
        JOIN totals tb ON tb.source = p.source_b
        ORDER BY p.source_a, p.source_b
    """,
}
