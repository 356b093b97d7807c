"""Okapi BM25 relevance scoring over a document corpus.

The retrieval-grade complement of ``textstats.tfidf_top_terms``: TF-IDF
ranks a document's own terms (corpus profiling), BM25 ranks DOCUMENTS
against a query bag with saturating term frequency and document-length
normalization — the scoring function behind classical search and the
standard lexical retriever for RAG / training-data curation stacks
(pair it with the ANN tier in operators/similarity.py for hybrid
retrieval). Pure column expressions; the reference has no search
scoring at all (its transform layer is row-level cleaning only,
src/processing/data_transformer.py).

Scale shape: the per-document token explode is map-side and the query
bag predicate filters generator output immediately, so the only
shuffled rows are (doc, query-term) MATCHES — at 100 TB the shuffle is
bounded by hit volume, not corpus token volume (contrast tfidf, whose
document-frequency pass must aggregate the full vocabulary). Corpus
statistics (N, average document length) ride one single-row aggregate
broadcast back; per-term document frequencies are a |query|-row
broadcast. Float determinism follows the tfidf discipline: identical
expression order in the Spark and DuckDB renderings (plans/searchq.py)
and a final ROUND to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import ws_tokens

__all__ = ["bm25_scores", "rrf_fuse"]


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bm25, matched_terms) for every document matching at
    least one query term.

    Per matching (document, term):
    ``idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with the
    BM25+-style non-negative idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``;
    the document score is the sum over its matched terms. ``tf``
    saturates (a term repeated 100x is not 100x as relevant) and the
    ``dl/avgdl`` factor discounts long documents — the two fixes BM25
    makes over raw TF-IDF retrieval. Tokenization is the corpus-wide
    lowercase whitespace discipline shared with tfidf.
    """
    if not query_terms:
        raise ValueError("BM25 needs at least one query term")
    toks = ws_tokens(F.lower(F.col(text_col)))
    with_len = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.size(toks).alias("dl"),
    )
    stats = with_len.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    # explode then filter: the predicate applies to generator output
    # map-side, so only query-term hits ever reach a shuffle
    tf = (
        with_len.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl
    )
    term_score = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    return scored.groupBy("doc_id").agg(
        F.round(F.sum(term_score), 6).alias("bm25"),
        F.count("*").alias("matched_terms"),
    )


def rrf_fuse(
    ranked_lists: list[tuple[DataFrame, str]],
    k: int = 60,
    top_n: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of retrieval lists: (id, rrf, n_lists)
    where ``rrf = Σ_lists 1/(k + rank)`` — the standard score-free way
    to combine a lexical (BM25) and a semantic (ANN cosine) retriever
    into hybrid search; ranks, not raw scores, so incomparable score
    scales fuse without calibration.

    Each input is ``(df, score_col)`` with higher-is-better scores;
    ranks are assigned with a deterministic ``(score DESC, id ASC)``
    tiebreak AFTER truncating to ``top_n`` via orderBy+limit — which
    compiles to TakeOrderedAndProject (per-partition top-n + merge),
    so the single-partition rank window only ever sees ``top_n`` rows.
    That bound is the scale contract: retrieval lists are small by
    construction, and fusing them is driver-free arithmetic over at
    most ``len(lists) * top_n`` rows."""
    if not ranked_lists:
        raise ValueError("RRF needs at least one ranked list")
    contribs = []
    for df, score_col in ranked_lists:
        top = df.orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        ).limit(top_n)
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        contribs.append(
            top.select(
                F.col(id_col),
                (
                    F.lit(1.0)
                    / (F.lit(float(k)) + F.row_number().over(w))
                ).alias("c"),
            )
        )
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    return unioned.groupBy(id_col).agg(
        F.round(F.sum("c"), 6).alias("rrf"),
        F.count("*").alias("n_lists"),
    )
