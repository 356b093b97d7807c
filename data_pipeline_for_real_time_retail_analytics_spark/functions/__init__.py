"""Scalar expression helpers (SURVEY.md §2.9).

Every function here returns a ``Column`` built from JVM-side
``pyspark.sql.functions`` — no Python UDFs — so Catalyst folds them into
whole-stage codegen. They encode the reference's quirky-but-defined
semantics exactly (boolean lexicon, coerce-to-null type checks, null
handling per rule) so the validation plan can cite one place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import BOOLEAN_LEXICON, EMAIL_REGEX, URL_REGEX

# ---------------------------------------------------------------------------
# semantic-type predicates (reference: src/ingestion/validators.py:218-272)
# ---------------------------------------------------------------------------


def is_valid_email(c: Column) -> Column:
    """Email regex check (reference: validators.py:253-256)."""
    return c.rlike(EMAIL_REGEX)


def is_valid_url(c: Column) -> Column:
    """URL regex check (reference: validators.py:257-260)."""
    return c.rlike(URL_REGEX)


def is_lexical_boolean(c: Column) -> Column:
    """Lexical boolean conformance (reference: validators.py:237-240):
    case-insensitive membership in {true,false,1,0,yes,no,t,f,y,n}."""
    return F.lower(c.cast("string")).isin(*BOOLEAN_LEXICON)


def is_valid_json(c: Column) -> Column:
    """JSON parse check via try-parse → null-on-fail
    (reference: validators.py:261-267)."""
    return F.try_parse_json(c).isNotNull()


def coerce_fails(c: Column, target: str) -> Column:
    """True where a non-null value fails to cast to ``target`` — the
    reference's coerce-then-count-new-nulls trick (validators.py:225-236)
    expressed as try_cast null-delta."""
    return c.isNotNull() & c.cast("string").try_cast(target).isNull()


def datetime_parse_fails(c: Column) -> Column:
    """True where a non-null value cannot be parsed as a timestamp
    (reference: validators.py:241-252)."""
    return c.isNotNull() & F.try_to_timestamp(c.cast("string")).isNull()


# ---------------------------------------------------------------------------
# text analysis primitives (beyond-reference LLM-data ops)
# ---------------------------------------------------------------------------


def token_count_ws(c: Column) -> Column:
    """Whitespace token count; empty/blank strings count 0."""
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count_bpe_ish(c: Column) -> Column:
    """BPE-ish token estimate: count of word / number / non-space-symbol
    runs (a GPT-2-style pre-tokenizer approximation, public knowledge)."""
    return F.size(
        F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    )


def stopword_ratio(c: Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of whitespace tokens that are stopwords (lowercased)."""
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def punct_ratio(c: Column) -> Column:
    """Punctuation characters / total characters (0 for empty)."""
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
