"""User-defined table / aggregate function surface (SURVEY.md §2.11).

The engine's position is that UDFs are the slow path: every hot-path
operator is built from JVM column expressions, and the Python escape
hatches that ARE used are Arrow-batched (mapInPandas for multimodal
payloads, applyInPandas for per-key interpolation, cogroup for the
merge_asof cross-check, applyInPandasWithState for custom streaming
state). This module completes the §2.11 triple with the two remaining
API shapes — a Python UDTF and a grouped-aggregate pandas UDF — each
implemented as a TWIN of a native formulation so tests can assert exact
agreement and the docstrings can say, with measurements behind them,
when NOT to use them.

Both are exposed as FACTORIES (``make_chunk_udtf`` /
``make_weighted_mean_udaf``): the pyspark decorators parse their DDL
return types eagerly and need an active SparkSession, so decorating at
module import time would break import-before-session callers.

- chunk UDTF: token-window chunker emitting one row per chunk. The
  production operator is textstats.chunk_documents (posexplode
  generator, whole-stage codegen, zero Python); the UDTF exists for
  logic that genuinely cannot be expressed as column generators.
- weighted-mean UDAF: grouped-aggregate pandas UDF (Arrow batches).
  The native twin is sum(v*w)/sum(w). Note the REAL scale caveat:
  pandas grouped aggregates receive each group's full column in memory
  (no partial aggregation), so a hot group is a straggler — the native
  expression partial-aggregates map-side.
"""

from __future__ import annotations

import re

import pandas as pd


class _ChunkUDTF:
    """Overlapping token-window chunker: yields (chunk_id, chunk_text,
    n_tokens) rows for one document per call. Mirrors
    textstats.chunk_documents(chunk_tokens, overlap) semantics exactly,
    INCLUDING ws_tokens' empty-string artifact (one "" token for blank
    text), so agreement holds on every document."""

    def eval(self, text: str, chunk_tokens: int, overlap: int):
        if text is None:
            return
        toks = re.split(r"\s+", text.strip())
        if not toks:
            return
        step = chunk_tokens - overlap
        if step <= 0:
            raise ValueError("overlap must be smaller than chunk_tokens")
        chunk_id = 0
        start = 0
        while start < len(toks):
            window = toks[start:start + chunk_tokens]
            yield chunk_id, " ".join(window), len(window)
            if start + chunk_tokens >= len(toks):
                break
            start += step
            chunk_id += 1


def make_chunk_udtf():
    """UDTF class wrapped with its return schema — register with
    ``spark.udtf.register(name, make_chunk_udtf())`` and invoke via
    ``LATERAL name(text, chunk_tokens, overlap)``."""
    from pyspark.sql.functions import udtf

    return udtf(
        _ChunkUDTF, returnType="chunk_id int, chunk_text string, n_tokens int"
    )


def make_median_udaf():
    """Grouped-aggregate pandas UDF: exact interpolated median of a
    BIGINT series (numpy's definition — mean of the two middle order
    statistics for even counts). Over integer inputs every possible
    result is an exactly-representable x.0/x.5 double, so it agrees
    bit-for-bit with any engine's exact interpolated percentile (Spark
    ``percentile(col, 0.5)``, DuckDB ``MEDIAN``) — the property that
    lets this drive the grouped-agg Arrow path through a value-checked
    oracle. Empty/all-NULL group → NULL."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def int_median(v: pd.Series) -> float:
        v = v.dropna()
        if v.empty:
            return None
        import numpy as np

        return float(np.median(v.to_numpy(dtype="int64")))

    return int_median


def make_count_udaf():
    """Grouped-aggregate pandas UDF counting group rows (incl. NULLs).
    Exists because Spark forbids mixing grouped-agg pandas UDFs with
    native aggregates in one ``agg`` (INVALID_PANDAS_UDF_PLACEMENT) —
    queries that already pay the Arrow agg path ride their counts
    through it. The float annotation only selects the grouped-agg eval
    type; the declared return type is long."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def arrow_count(v: pd.Series) -> float:
        return len(v)

    return arrow_count


def make_weighted_mean_udaf():
    """Grouped-aggregate pandas UDF: Σ(v·w)/Σ(w) over the group, NULL
    weights treated as 0, empty/zero-weight group → NULL. Exact-
    agreement twin of the native ``sum(v*w)/sum(w)`` expression
    (test-pinned)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        w = w.fillna(0.0)
        denom = float(w.sum())
        if denom == 0.0:
            return None
        return float((v * w).sum() / denom)

    return weighted_mean
