"""Corpus text cleaning for LLM training-data pipelines.

Beyond-reference scope: normalization and PII masking as pure column
expressions (`regexp_replace` chains — whole-stage codegen, no Python).
Regexes are restricted to the syntax Java regex and RE2 share (no
lookarounds/backrefs) so the DuckDB oracle applies the identical
transforms. Unicode NFC normalization needs an ICU call Spark lacks
natively; at deployment that one step runs as an Arrow-batched
`mapInPandas` (see operators/multimodal.py for the pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: conservative shared-dialect patterns (Java regex ∩ RE2)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
WS_RE = r"\s+"


def strip_control_chars(text: Column) -> Column:
    return F.regexp_replace(text, CONTROL_RE, "")


def collapse_whitespace(text: Column) -> Column:
    return F.trim(F.regexp_replace(text, WS_RE, " "))


def mask_pii(text: Column) -> Column:
    """Emails → <EMAIL>, URLs → <URL>, phone-like runs → <PHONE>.
    Order matters: URLs before phones (digits in URLs), emails first
    (@-host would half-match the URL pattern)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, URL_RE, "<URL>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def clean_text(text: Column, mask: bool = True) -> Column:
    """Full cleaning chain: control-strip → (PII mask) → ws collapse."""
    out = strip_control_chars(text)
    if mask:
        out = mask_pii(out)
    return collapse_whitespace(out)


def cleaned_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", mask: bool = True
) -> DataFrame:
    cleaned = clean_text(F.col(text_col), mask)
    return df.select(
        F.col(id_col),
        cleaned.alias("text_clean"),
        F.length(cleaned).alias("n_chars_clean"),
    )
