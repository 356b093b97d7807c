"""Property-based pins for the round-7 second-session operators
(hypothesis, the test_curation_properties.py strategy): on arbitrary
small inputs the Spark plans must agree with straightforward Python
reimplementations of their declared semantics.

* boilerplate removal: survivors == tokens at positions NOT covered by
  any flagged n-gram occurrence, flagged == grams in ≥ min_docs
  DISTINCT docs — ties, overlaps, intra-doc repeats, and sub-n docs
  included;
* PQ encoding: per-(vector, block) argmin over the seed codebook with
  micro-unit-quantized squared distances and low-code tie-break,
  packed at 4 bits per block.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_for_real_time_retail_analytics_spark.operators.boilerplate import (
    remove_boilerplate_spans,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.pq import (
    pq_codebooks,
    pq_codes,
)

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# ---------- boilerplate removal ----------

#: tiny vocabulary so cross-document n-gram collisions actually occur
word = st.sampled_from(["a", "b", "c", "d"])
doc = st.lists(word, min_size=0, max_size=12)


def _model_removal(docs: dict, n: int, min_docs: int) -> dict:
    grams = {}  # gram -> set of doc ids
    for did, toks in docs.items():
        for i in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[i : i + n]), set()).add(did)
    flagged = {g for g, ds in grams.items() if len(ds) >= min_docs}
    out = {}
    for did, toks in docs.items():
        covered = set()
        for i in range(len(toks) - n + 1):
            if tuple(toks[i : i + n]) in flagged:
                covered.update(range(i, i + n))
        kept = [t for q, t in enumerate(toks) if q not in covered]
        out[did] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@settings(**SETTINGS)
@given(
    docs=st.lists(doc, min_size=1, max_size=8),
    n=st.integers(min_value=2, max_value=4),
    min_docs=st.integers(min_value=2, max_value=3),
)
def test_removal_matches_python_model(spark, docs, n, min_docs):
    # NOTE: ws_tokens of "" is [""] (split semantics); keep the model
    # faithful by rendering empty docs as a single empty-string token
    toks_by_id = {
        i: (d if d else [""]) for i, d in enumerate(docs)
    }
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in toks_by_id.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_boilerplate_spans(df, n=n, min_docs=min_docs).collect()
    }
    want = _model_removal(toks_by_id, n, min_docs)
    assert got == want


# ---------- PQ encoding ----------

QUANT = 10**12


def _model_codes(vecs: dict, m: int, k: int) -> dict:
    seeds = sorted(vecs)[:k]
    dim = len(next(iter(vecs.values())))
    sub = dim // m
    # code = rank of seed id
    books = []  # per block: list of (code, subvec)
    for b in range(m):
        books.append(
            [
                (rank, vecs[sid][b * sub : (b + 1) * sub])
                for rank, sid in enumerate(seeds)
            ]
        )
    out = {}
    for vid, v in vecs.items():
        word_val = 0
        for b in range(m):
            x = v[b * sub : (b + 1) * sub]
            best = None
            for code, c in books[b]:
                qd = sum(
                    int(math.floor((xa - ca) * (xa - ca) * QUANT + 0.5))
                    for xa, ca in zip(x, c)
                )
                if best is None or (qd, code) < best:
                    best = (qd, code)
            word_val += best[1] << (4 * b)
        out[vid] = word_val
    return out


@settings(**SETTINGS)
@given(
    vecs=st.lists(
        st.lists(
            # exactly-representable floats: no float32 rounding between
            # the python model and Spark's FLOAT storage
            st.integers(min_value=-8, max_value=8).map(lambda i: i / 4.0),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=12,
    ),
    m=st.sampled_from([1, 2, 4]),
)
def test_pq_codes_match_python_model(spark, vecs, m):
    vd = {i: v for i, v in enumerate(vecs)}
    k = min(3, len(vd))
    df = spark.createDataFrame(
        list(vd.items()), "vec_id long, embedding array<float>"
    )
    cb = pq_codebooks(df, m=m, k=k)
    got = {
        r["vec_id"]: r["pq_word"] for r in pq_codes(df, cb).collect()
    }
    assert got == _model_codes(vd, m, k)


# ---------- SQ8 encoding ----------


def _model_sq8(vecs: dict) -> dict:
    dim = len(next(iter(vecs.values())))
    scales = [
        max(abs(v[d]) for v in vecs.values()) for d in range(dim)
    ]
    out = {}
    for vid, v in vecs.items():
        for d in range(dim):
            if scales[d] == 0.0:
                c = 0
            else:
                c = int(math.floor(v[d] / scales[d] * 127.0 + 0.5))
                c = max(min(c, 127), -127)
            out[(vid, d + 1)] = c
    return out


@settings(**SETTINGS)
@given(
    vecs=st.lists(
        st.lists(
            # exactly-representable floats (i/4): identical doubles in
            # the python model and Spark's FLOAT->DOUBLE widening; the
            # whole code path is +-*/floor, no transcendentals
            st.integers(min_value=-8, max_value=8).map(lambda i: i / 4.0),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_sq8_codes_match_python_model(spark, vecs):
    from data_pipeline_for_real_time_retail_analytics_spark.operators.sq import (
        sq8_codes,
        sq8_scales,
    )

    vd = {i: v for i, v in enumerate(vecs)}
    df = spark.createDataFrame(
        list(vd.items()), "vec_id long, embedding array<float>"
    )
    got = {
        (r["vec_id"], r["pos"]): r["code"]
        for r in sq8_codes(df, sq8_scales(df)).collect()
    }
    assert got == _model_sq8(vd)


# ---------- chunk-grain exact dedup (r9 addition) ----------


doc_words = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=20
)


def _chunks_of(tokens, k):
    return [tokens[i : i + k] for i in range(0, len(tokens), k)] or [[]]


@settings(**SETTINGS)
@given(
    docs=st.lists(doc_words, min_size=1, max_size=8),
    k=st.sampled_from([2, 3]),
)
def test_chunk_dedup_matches_python_model(spark, docs, k):
    """operators/chunkdedup.py vs the direct semantics: chunk at fixed
    k-token boundaries, keep only the first (doc_id, chunk_id)
    occurrence of each chunk TEXT corpus-wide, reassemble in order.
    Tiny vocabulary so cross-document chunk collisions actually occur."""
    from data_pipeline_for_real_time_retail_analytics_spark.operators.chunkdedup import (
        chunk_dedup,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.dedup_text)
        for r in chunk_dedup(df, chunk_tokens=k).collect()
    }

    seen: set[str] = set()
    want = {}
    for i, ws in enumerate(docs):
        chunks = _chunks_of(ws, k)
        kept = []
        for ch in chunks:
            text = " ".join(ch)
            if text not in seen:
                seen.add(text)
                kept.append(text)
        want[i] = (len(chunks), len(kept), " ".join(kept))
    assert got == want
