"""Okapi BM25 relevance scoring over a document corpus.

The retrieval-grade complement of ``textstats.tfidf_top_terms``: TF-IDF
ranks a document's own terms (corpus profiling), BM25 ranks DOCUMENTS
against a query bag with saturating term frequency and document-length
normalization — the scoring function behind classical search and the
standard lexical retriever for RAG / training-data curation stacks
(pair it with the ANN tier in operators/similarity.py for hybrid
retrieval). Pure column expressions; the reference has no search
scoring at all (its transform layer is dbt model declarations with
empty scaffolding SQL, config/pipelines/sample_pipeline.yaml:55-99).

Scale shape: the per-document token explode is map-side and the query
bag predicate filters generator output immediately, so the only
shuffled rows are (doc, query-term) MATCHES — at 100 TB the shuffle is
bounded by hit volume, not corpus token volume (contrast tfidf, whose
document-frequency pass must aggregate the full vocabulary). Corpus
statistics (N, average document length) ride one single-row aggregate
broadcast back; per-term document frequencies are a |query|-row
broadcast. Float determinism extends the tfidf discipline: identical
expression order in the Spark and DuckDB renderings (plans/searchq.py)
makes each per-term score bit-identical, and the per-document SUM is
taken over micro-unit BIGINTs (term scores quantized to 1e-6) so no
fold-order-dependent double accumulation ever reaches the value hash.
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
    # normalize the query bag to the token discipline (lowercase) and
    # dedupe order-preservingly — a mixed-case term would otherwise
    # never match the lowercased tokens and be silently ignored
    terms = list(dict.fromkeys(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("BM25 needs at least one query term")
    # a term containing whitespace can never equal a whitespace-split
    # token — it would be silently ignored, so reject it loudly
    bad = [t for t in terms if not t or any(ch.isspace() for ch in t)]
    if bad:
        raise ValueError(
            f"query terms must be single non-empty tokens "
            f"(whitespace can never match the tokenizer): {bad!r}"
        )
    toks = ws_tokens(F.lower(F.col(text_col)))
    # NULL-text documents carry no tokens: they can never match, and
    # keeping them in the corpus statistics would disagree with any
    # token-derived accounting (the oracle's unnest drops them)
    with_len = docs.where(F.col(text_col).isNotNull()).select(
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
        .where(F.col("term").isin(terms))
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
    # quantize per-term scores to an exact micro-unit BIGINT BEFORE the
    # document sum: a multi-addend double sum is fold-order-dependent
    # (IEEE addition is commutative but NOT associative), so Spark's
    # partial aggregation and an oracle's scan-order sum could round
    # differently at a 0.5e-6 boundary. Both engines compute the SAME
    # term_score double (expression-order parity), so the quantized
    # integers agree exactly, integer addition is associative, and the
    # final /1e6 is one deterministic double division.
    micro = F.round(term_score * F.lit(1_000_000.0), 0).cast("long")
    return scored.groupBy("doc_id").agg(
        (F.sum(micro).cast("double") / F.lit(1_000_000.0)).alias("bm25"),
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
        # micro-unit quantization, as in bm25_scores: with 3+ lists the
        # per-document double sum would be fold-order-dependent; the
        # integer sum is associative, so a value-hash gate stays exact
        contribs.append(
            top.select(
                F.col(id_col),
                F.round(
                    F.lit(1.0)
                    / (F.lit(float(k)) + F.row_number().over(w))
                    * F.lit(1_000_000.0),
                    0,
                )
                .cast("long")
                .alias("c_micro"),
            )
        )
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    return unioned.groupBy(id_col).agg(
        (F.sum("c_micro").cast("double") / F.lit(1_000_000.0)).alias("rrf"),
        F.count("*").alias("n_lists"),
    )
