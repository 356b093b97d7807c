"""Semantic-decontamination showcase query (registry-ready for round 7).

Eval set = an exact copy of every 100th embedding under offset ids —
the planted-leak convention the textual decontaminator and the
near-dup queries already use (plans/llm.py), so every eval vector has
a known cosine-1.0 twin in training data and the flag set is exactly
verifiable. NOT registered in ``__spark_entry__`` this round (r6 front
window exactly full); tests/test_contamq.py runs the driver-identical
parity. Flip in r7 per the NOTES.md handoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.semcontam import semantic_contamination_pairs
from .corpusbase import _embs
from .llm_oracles import _bucket_expr, _cosine

#: every Nth embedding doubles as a leaked eval example
EVAL_EVERY = 100
#: offset keeping eval ids disjoint from training ids
EVAL_ID_OFFSET = 10_000_000
THRESHOLD = 0.99


def q_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagged (eval, train) embedding matches at cosine ≥ THRESHOLD
    (operators/semcontam.py) — the embedding-space complement of the
    13-gram `contaminated_docs` decontaminator."""
    embs = _embs(spark, sf_dir)
    evalset = embs.where(F.col("vec_id") % EVAL_EVERY == 0).withColumn(
        "vec_id", F.col("vec_id") + EVAL_ID_OFFSET
    )
    return semantic_contamination_pairs(
        embs, evalset, threshold=THRESHOLD
    ).orderBy("eval_id", "train_id")


ORACLES: dict[str, str] = {
    "semantic_contamination": rf"""
        WITH tr AS (
            SELECT vec_id AS train_id, embedding,
                   {_bucket_expr()} AS bucket
            FROM embeddings
        ),
        ev AS (
            SELECT vec_id + {EVAL_ID_OFFSET} AS eval_id, embedding,
                   {_bucket_expr()} AS bucket
            FROM embeddings WHERE vec_id % {EVAL_EVERY} = 0
        )
        SELECT ev.eval_id, tr.train_id,
               ROUND({_cosine("ev.embedding", "tr.embedding")}, 6)
                   AS cosine_sim
        FROM ev JOIN tr USING (bucket)
        WHERE ROUND({_cosine("ev.embedding", "tr.embedding")}, 6)
              >= {THRESHOLD}
        ORDER BY eval_id, train_id
    """,
}

QUERIES = {
    "semantic_contamination": q_semantic_contamination,
}
