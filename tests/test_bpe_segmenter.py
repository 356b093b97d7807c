"""Pins for the production BPE segmenter (operators/bpe.py):
``bpe_segment_vocab`` greedy longest-match semantics, its agreement
with the expression replay on trainer-produced tables, the documented
divergence between the two on adversarial tables, the losslessness
law, and the broadcast/Arrow plumbing over the real documents table.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_for_real_time_retail_analytics_spark.operators.bpe import (
    bpe_learn,
    bpe_segment,
    bpe_segment_vocab,
    bpe_vocab,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"

#: the Sennrich classic corpus
CLASSIC = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _classic_docs(spark):
    text = " ".join(" ".join([w] * c) for w, c in CLASSIC.items())
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def _py_longest_match(tok: str, vocab: frozenset, max_len: int) -> list:
    """Independent pure-Python greedy longest-match reference."""
    out, i = [], 0
    while i < len(tok):
        j = min(len(tok), i + max_len)
        while j - i >= 2 and tok[i:j] not in vocab:
            j -= 1
        if j - i < 2:
            j = i + 1
        out.append(tok[i:j])
        i = j
    return out


def test_vocab_is_exactly_the_merge_products():
    merges = [("l", "o", 7), ("lo", "w", 7), ("e", "s", 9)]
    assert bpe_vocab(merges) == {"lo", "low", "es"}
    # 2-tuples (rank-only tables) work too
    assert bpe_vocab([("a", "b")]) == {"ab"}


def test_longest_match_agrees_with_replay_on_the_trainer_table(spark):
    """On a table bpe_learn produced, over both the training words and
    unseen text, the production longest-match path and the replay path
    segment identically (the agreement the fallback switch relies on)."""
    merges = bpe_learn(_classic_docs(spark), 6)
    vocab = bpe_vocab(merges)
    words = spark.createDataFrame(
        [(w,) for w in list(CLASSIC) + ["lowest", "newlow", "wid", "z"]],
        "text string",
    )
    replay = {
        r.text: list(r.sym_tokens) for r in bpe_segment(words, merges).collect()
    }
    lm = {
        r.text: list(r.sym_tokens)
        for r in bpe_segment_vocab(words, vocab).collect()
    }
    assert replay == lm


def test_longest_match_matches_the_python_reference_and_is_lossless(spark):
    """Over the real documents table with a trained vocab: the UDF
    output equals the independent per-token reference, every multi-char
    symbol is in the vocab, and concatenating the symbols reproduces
    the whitespace tokens exactly (losslessness — no <unk> collapse)."""
    merges = bpe_learn(_classic_docs(spark), 6)
    vocab = bpe_vocab(merges)
    max_len = max(len(v) for v in vocab)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = bpe_segment_vocab(docs, vocab).collect()
    assert len(rows) == docs.count()
    for r in rows:
        if r.text is None:
            assert r.sym_tokens is None
            continue
        want = [
            s
            for tok in r.text.split()
            for s in _py_longest_match(tok, vocab, max_len)
        ]
        assert list(r.sym_tokens) == want
        assert "".join(r.sym_tokens) == "".join(r.text.split())
        for s in r.sym_tokens:
            assert len(s) == 1 or s in vocab


def test_longest_match_vs_replay_divergence_is_the_documented_one(spark):
    """The adversarial table from the bpe_segment docstring: a later
    rule's product feeds an earlier rule. Replay (single-pass
    rank-order) leaves [x, yz]; longest-match finds the full product
    [xyz] — both semantics pinned on their own path."""
    docs = spark.createDataFrame([("xyz",)], "text string")
    table = [("x", "yz"), ("y", "z")]
    assert bpe_segment(docs, table).collect()[0].sym_tokens == ["x", "yz"]
    assert bpe_segment_vocab(docs, bpe_vocab(table)).collect()[
        0
    ].sym_tokens == ["xyz"]


def test_min_rank_mode_is_canonical_on_the_divergence_table(spark):
    """mode="min_rank" (Sennrich/HF apply_bpe) on the crafted two-rule
    table: after rule 2 merges (y,z), the re-scan revisits rule 1 and
    produces [xyz] — exactly where the single-pass replay stops at
    [x, yz]. Both modes pinned side by side on the same input."""
    docs = spark.createDataFrame([("xyz",)], "text string")
    table = [("x", "yz"), ("y", "z")]
    assert bpe_segment(docs, table, mode="replay").collect()[
        0
    ].sym_tokens == ["x", "yz"]
    assert bpe_segment(docs, table, mode="min_rank").collect()[
        0
    ].sym_tokens == ["xyz"]
    with pytest.raises(ValueError, match="unknown mode"):
        bpe_segment(docs, table, mode="longest")


def test_min_rank_agrees_with_replay_on_the_trainer_table(spark):
    """On trainer-consistent tables (a rule's inputs exist before it is
    learned) canonical min-rank and the single-pass replay coincide —
    over training words, unseen words, NULL, and empty text. min_rank
    applies the LOWEST rank first regardless of table order, so also
    pin a rank-priority case replay can't distinguish."""
    merges = bpe_learn(_classic_docs(spark), 6)
    words = spark.createDataFrame(
        [(w,) for w in list(CLASSIC) + ["lowest", "newlow", "wid", "z", ""]]
        + [(None,)],
        "text string",
    )
    replay = {
        r.text: r.sym_tokens and list(r.sym_tokens)
        for r in bpe_segment(words, merges).collect()
    }
    canon = {
        r.text: r.sym_tokens and list(r.sym_tokens)
        for r in bpe_segment(words, merges, mode="min_rank").collect()
    }
    assert replay == canon
    # rank priority: both (a,b) and (b,c) match "abc"; rank 0 wins even
    # though left-to-right scanning would find them in the same pass
    docs = spark.createDataFrame([("abc",)], "text string")
    assert bpe_segment(docs, [("b", "c"), ("a", "b")], mode="min_rank").collect()[
        0
    ].sym_tokens == ["a", "bc"]


def test_min_rank_is_the_sennrich_sweep_not_the_hf_queue(spark):
    """min_rank merges ALL occurrences of the chosen pair per sweep
    (subword-nmt apply_bpe). On the adversarial table
    [(aa,a) rank 0, (a,a) rank 3] over 'aaaa' the sweep merges both
    (a,a) occurrences before re-scanning -> [aa, aa]; HF tokenizers'
    one-merge-at-a-time queue would instead produce [aaa, a] (the
    first merge creates the rank-0 (aa,a) pair mid-token). The sweep
    behavior is the documented contract — pinned so a refactor to
    queue semantics is a deliberate, visible choice."""
    docs = spark.createDataFrame([("aaaa",)], "text string")
    table = [("aa", "a"), ("x", "x"), ("y", "y"), ("a", "a")]
    assert bpe_segment(docs, table, mode="min_rank").collect()[
        0
    ].sym_tokens == ["aa", "aa"]
    # and on a table where the sweep DOES feed the lower-rank rule
    # across re-scans (not mid-sweep), the revisit happens: after the
    # (a,a) sweep of "aaaa" -> [aa, aa], rule (aa,aa) applies
    assert bpe_segment(
        docs, [("aa", "aa"), ("a", "a")], mode="min_rank"
    ).collect()[0].sym_tokens == ["aaaa"]


def test_min_rank_duplicate_pairs_take_the_first_rank(spark):
    """subword-nmt builds its rank table with reversed(enumerate), so
    on a malformed table that lists the SAME pair twice the FIRST
    occurrence (lowest rank) wins. The r12 dict-comprehension build
    silently kept the last — pinned here via a table where precedence
    decides the output: on "abc", first-wins gives (a,b) rank 0 over
    (b,c) rank 1 -> [ab, c]; last-wins would demote the duplicate
    (a,b) to rank 2 and merge (b,c) first -> [a, bc]. bpe_learn never
    emits duplicates; this is hand-built-table hygiene only."""
    docs = spark.createDataFrame([("abc",)], "text string")
    table = [("a", "b"), ("b", "c"), ("a", "b")]
    assert bpe_segment(docs, table, mode="min_rank").collect()[
        0
    ].sym_tokens == ["ab", "c"]


def test_python_paths_tokenize_non_ascii_whitespace_like_ws_tokens(spark):
    """The r11 ADVICE divergence: Python str.split() splits on Unicode
    whitespace (NBSP, thin spaces, U+2028) where ws_tokens' Java \\s+
    is ASCII-only — so a UDF using it would tokenize multilingual text
    differently from every expression-path consumer. Pin: on NBSP/thin-
    space/line-separator text, both Python inference paths (vocab
    longest-match with an empty vocab == character segmentation, and
    min_rank with no applicable rule) equal the pure-expression
    ws_tokens+char-split plan exactly."""
    from pyspark.sql import functions as F

    from data_pipeline_for_real_time_retail_analytics_spark.operators.bpe import (
        _initial_symbols_col,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
        ws_tokens,
    )

    texts = [
        "a\u00a0b c",          # NBSP inside the first ws-token
        "\u2009x\u2009",       # thin spaces at both ends (not trimmed)
        "p\u2028q r",          # line separator inside a token
        " a  b\t",            # ASCII-only control case
        "\u00a0",              # lone NBSP: one single-char token
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    want = {
        r.text: list(r.syms)
        for r in docs.select(
            "text",
            F.flatten(
                F.transform(ws_tokens(F.col("text")), _initial_symbols_col)
            ).alias("syms"),
        ).collect()
    }
    got_vocab = {
        r.text: list(r.sym_tokens)
        for r in bpe_segment_vocab(docs, set()).collect()
    }
    got_rank = {
        r.text: list(r.sym_tokens)
        for r in bpe_segment(docs, [("q", "q")], mode="min_rank").collect()
    }
    assert got_vocab == want
    assert got_rank == want
    # the trap itself: NBSP text where str.split() WOULD differ
    assert got_vocab["a\u00a0b c"] == ["a", "\u00a0", "b", "c"]


def test_longest_match_prefers_the_longer_symbol(spark):
    """'abc' with vocab {ab, abc}: longest wins; with {ab, bc}: the
    greedy left-to-right scan takes 'ab' then passes 'c' through."""
    docs = spark.createDataFrame([("abc",)], "text string")
    assert bpe_segment_vocab(docs, {"ab", "abc"}).collect()[
        0
    ].sym_tokens == ["abc"]
    assert bpe_segment_vocab(docs, {"ab", "bc"}).collect()[
        0
    ].sym_tokens == ["ab", "c"]


def test_segmenters_reject_existing_out_col(spark):
    """withColumn on an existing out_col would silently clobber it —
    both inference paths refuse (the hilbert.py out_col discipline)."""
    docs = spark.createDataFrame([("x", 1)], "text string, sym_tokens long")
    with pytest.raises(ValueError, match="already exists"):
        bpe_segment_vocab(docs, {"ab"})
    with pytest.raises(ValueError, match="already exists"):
        bpe_segment(docs, [("a", "b")])


def test_longest_match_edge_inputs(spark):
    """NULL text → NULL; empty/whitespace-only text → empty array;
    unknown characters pass through as single symbols; an empty vocab
    degenerates to character segmentation."""
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "q7!")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.sym_tokens
        for r in bpe_segment_vocab(docs, {"ab"}).collect()
    }
    assert got[1] is None
    assert got[2] == [] and got[3] == []
    assert got[4] == ["q", "7", "!"]
    empty_vocab = bpe_segment_vocab(docs, set()).collect()
    assert {r.doc_id: r.sym_tokens for r in empty_vocab}[4] == ["q", "7", "!"]


#: letters plus BOTH whitespace classes: ASCII (Java \s — split points)
#: and non-ASCII Unicode whitespace (NOT split points for ws_tokens,
#: but split points for Python str.split() — the r11 ADVICE trap)
_WS_ALPHABET = "ab \t\n\r\x0b\f\u00a0\u2009\u3000"


@given(
    texts=st.lists(
        st.text(alphabet=_WS_ALPHABET, max_size=16), min_size=1, max_size=6
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_py_ws_tokens_law_vs_spark_expression(spark, texts):
    """_py_ws_tokens (the Python twin every UDF inference path splits
    with) must equal the ws_tokens expression on arbitrary mixes of
    ASCII and non-ASCII whitespace — the law the r11 ADVICE fix rests
    on, pinned under random pressure rather than only the crafted
    NBSP cases."""
    from pyspark.sql import functions as F

    from data_pipeline_for_real_time_retail_analytics_spark.operators.bpe import (
        _py_ws_tokens,
    )
    from data_pipeline_for_real_time_retail_analytics_spark.operators.textstats import (
        ws_tokens,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r.i: list(r.toks)
        for r in docs.select(
            "i", ws_tokens(F.col("text")).alias("toks")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_ws_tokens(t), repr(t)


_alpha = st.text(alphabet="abc", min_size=2, max_size=5)


@given(
    vocab=st.sets(_alpha, max_size=8),
    texts=st.lists(
        st.text(alphabet="abc ", max_size=24), min_size=1, max_size=4
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
def test_longest_match_property_vs_python_reference(spark, vocab, texts):
    """Under random small-alphabet vocabularies (maximal collision /
    prefix-overlap pressure) the UDF equals the independent pure-Python
    greedy reference and stays lossless on every row."""
    max_len = max((len(v) for v in vocab), default=1)
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    for r in bpe_segment_vocab(docs, vocab).collect():
        want = [
            s
            for tok in r.text.split()
            for s in _py_longest_match(tok, frozenset(vocab), max_len)
        ]
        assert list(r.sym_tokens) == want
        assert "".join(r.sym_tokens) == "".join(r.text.split())
