"""Lexical + hybrid search showcase queries (registry-ready, round 7).

Two driver-gate queries over operators/bm25.py:

* ``bm25_search`` — rank the documents corpus against a fixed
  three-term query mixing one RARE term ("dup", df≈5% of docs in the
  synthetic corpus) with two common ones — the shape where BM25's idf
  weighting visibly dominates raw term counting (the rare-term hit
  outranks any pile-up of common terms; tests/test_searchq.py pins
  exactly that separation).
* ``hybrid_search`` — reciprocal-rank fusion of that lexical list
  with an exact cosine top-50 for a fixed query vector
  (operators/similarity.cosine_topk): the lexical and semantic
  retrievers fuse by RANK, so their incomparable score scales need no
  calibration. Both rank orders are deterministic in both engines:
  the lexical list by (round-6 bm25 DESC, doc_id ASC), the semantic
  list by cosine_topk's own (unrounded sim DESC, id ASC) rank.

The oracles mirror the Spark expression ORDER operation-for-operation
(the tfidf float-parity discipline — ln/div/mul associate identically
in both engines), and every multi-addend double sum is quantized to
micro-unit BIGINTs first (integer addition is associative, so the
totals cannot depend on accumulation order), so the driver's value
hash matches bit-for-bit; the BM25 scoring pipeline is one shared CTE
block used by both oracles (one definition, two finals).

NOT registered in ``__spark_entry__`` this round: the r6 front window
is exactly consumed and new entries are never-green by definition.
tests/test_searchq.py runs the driver-identical parity comparison
locally; flip in r7 alongside plans/zorderq.py (NOTES.md handoff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bm25 import bm25_scores, rrf_fuse
from ..operators.similarity import cosine_topk
from ..sources import load_table
from .llm_oracles import _cosine, toks_expr

#: one rare + two common terms from the synthetic documents vocabulary
QUERY_TERMS = ["dup", "spark", "window"]
# validate at module load: a term with whitespace can never match the
# whitespace tokenizer (silently ignored on both sides), and these
# terms are rendered into the oracle SQL, so keep the contract loud
for _t in QUERY_TERMS:
    assert _t and not any(ch.isspace() for ch in _t), (
        f"QUERY_TERMS must be single non-empty tokens: {_t!r}"
    )
K1 = 1.2
B = 0.75
#: hybrid: fixed semantic query vector + fusion parameters
HYBRID_QUERY_VEC = 0
TOP_N = 50
RRF_K = 60


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents ranked by BM25 against QUERY_TERMS."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        bm25_scores(docs, QUERY_TERMS, k1=K1, b=B)
        .orderBy(F.col("bm25").desc(), F.col("doc_id"))
    )


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of the BM25 list with exact cosine top-TOP_N for
    query vector HYBRID_QUERY_VEC."""
    docs = load_table(spark, sf_dir, "documents")
    embs = load_table(spark, sf_dir, "embeddings")
    lex = bm25_scores(docs, QUERY_TERMS, k1=K1, b=B)
    # carry cosine_topk's OWN rank (selection + order by UNROUNDED sim,
    # match_id tiebreak — the discipline the registered cosine_topk
    # query already proves against DuckDB) into the fusion as a
    # higher-is-better order key; re-ranking the ROUND-6 similarity
    # here could disagree with the oracle wherever rounding collapses
    # distinct sims at the top_n cutoff
    sem = cosine_topk(
        embs.where(F.col("vec_id") == HYBRID_QUERY_VEC), embs, k=TOP_N
    ).select(
        F.col("match_id").alias("doc_id"),
        (-F.col("rank")).alias("sem_order"),
    )
    fused = rrf_fuse(
        [(lex, "bm25"), (sem, "sem_order")], k=RRF_K, top_n=TOP_N
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id"))


def _sql_terms() -> str:
    # mirror bm25_scores' normalization (lowercase + order-preserving
    # dedupe) so a mixed-case term added to QUERY_TERMS cannot make the
    # two sides match different token sets; single quotes are escaped
    # by SQL doubling so a future quoted term cannot break the oracle
    return ", ".join(
        "'" + t.replace("'", "''") + "'"
        for t in dict.fromkeys(t.lower() for t in QUERY_TERMS)
    )


#: the BM25 scoring pipeline as shared WITH-clauses — mirrors
#: bm25_scores: same tokenizer as tfidf (lowercase whitespace), same
#: expression order for idf/denominator/score
_BM25_CTES = f"""
        tok AS (
            SELECT doc_id,
                   len({toks_expr("trim(lower(text))")}) AS dl,
                   unnest({toks_expr("trim(lower(text))")}) AS term
            FROM documents
        ),
        s AS (
            SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl
            FROM (SELECT doc_id, ANY_VALUE(dl) AS dl FROM tok GROUP BY 1)
        ),
        tf AS (
            SELECT doc_id, ANY_VALUE(dl) AS dl, term, COUNT(*) AS tf
            FROM tok WHERE term IN ({_sql_terms()})
            GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        scored AS (
            -- every float literal is CAST to DOUBLE: DuckDB parses a
            -- bare 2.2 as DECIMAL(2,1) and evaluates BIGINT*DECIMAL in
            -- exact decimal, yielding a DIFFERENT double than Spark's
            -- tf * lit(2.2) (verified: 6.5999999999999996 vs
            -- 6.6000000000000005) — which would void the bit-identical
            -- term_score premise the micro-quantization rests on
            SELECT tf.doc_id,
                   ln((s.n_docs - dfreq.df + CAST(0.5 AS DOUBLE))
                        / (dfreq.df + CAST(0.5 AS DOUBLE))
                        + CAST(1.0 AS DOUBLE))
                     * (tf.tf * CAST({K1 + 1.0} AS DOUBLE))
                     / (tf.tf + CAST({K1} AS DOUBLE) * (CAST(1.0 AS DOUBLE)
                        - CAST({B} AS DOUBLE)
                        + CAST({B} AS DOUBLE) * tf.dl
                          / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))
                       AS term_score
            FROM tf, dfreq, s
            WHERE tf.term = dfreq.term
        ),
        bm AS (
            -- micro-unit quantization before the sum: integer addition
            -- is associative, so the document total cannot depend on
            -- accumulation order (operators/bm25.py discipline)
            SELECT doc_id,
                   CAST(SUM(micro) AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
                       AS bm25,
                   COUNT(*) AS matched_terms
            FROM (
                SELECT doc_id,
                       CAST(ROUND(term_score * CAST(1000000.0 AS DOUBLE), 0)
                            AS BIGINT) AS micro
                FROM scored
            )
            GROUP BY doc_id
        )"""

ORACLES: dict[str, str] = {
    "bm25_search": f"""
        WITH {_BM25_CTES}
        SELECT doc_id, bm25, matched_terms
        FROM bm
        ORDER BY bm25 DESC, doc_id
    """,
    # lexical ranks come from the ROUND-6 bm25 scores (bit-identical
    # across engines), semantic ranks from cosine_topk's unrounded-sim
    # discipline — each list's rank assignment mirrors exactly how the
    # Spark side produces it
    "hybrid_search": f"""
        WITH {_BM25_CTES},
        lexr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
            FROM bm
            QUALIFY rank <= {TOP_N}
        ),
        q AS (SELECT embedding AS qv FROM embeddings
              WHERE vec_id = {HYBRID_QUERY_VEC}),
        c AS (SELECT vec_id AS doc_id, embedding AS cv FROM embeddings
              WHERE vec_id <> {HYBRID_QUERY_VEC}),
        sims AS (
            SELECT doc_id, {_cosine("qv", "cv")} AS sim
            FROM c, q
        ),
        semr AS (
            -- UNROUNDED sim, doc_id tiebreak: exactly cosine_topk's
            -- selection + rank, which the registered cosine_topk query
            -- already proves matches between engines
            SELECT doc_id,
                   row_number() OVER (ORDER BY sim DESC, doc_id) AS rank
            FROM sims
            QUALIFY rank <= {TOP_N}
        ),
        contrib AS (
            -- DOUBLE-cast literals for the same decimal-vs-double
            -- reason as the scored CTE
            SELECT doc_id,
                   CAST(ROUND(CAST(1.0 AS DOUBLE)
                              / (CAST({RRF_K}.0 AS DOUBLE) + rank)
                              * CAST(1000000.0 AS DOUBLE), 0)
                        AS BIGINT) AS c_micro
            FROM lexr
            UNION ALL
            SELECT doc_id,
                   CAST(ROUND(CAST(1.0 AS DOUBLE)
                              / (CAST({RRF_K}.0 AS DOUBLE) + rank)
                              * CAST(1000000.0 AS DOUBLE), 0)
                        AS BIGINT) AS c_micro
            FROM semr
        )
        SELECT doc_id,
               CAST(SUM(c_micro) AS DOUBLE) / CAST(1000000.0 AS DOUBLE)
                   AS rrf,
               COUNT(*) AS n_lists
        FROM contrib
        GROUP BY doc_id
        ORDER BY rrf DESC, doc_id
    """,
}

QUERIES = {
    "bm25_search": q_bm25_search,
    "hybrid_search": q_hybrid_search,
}
