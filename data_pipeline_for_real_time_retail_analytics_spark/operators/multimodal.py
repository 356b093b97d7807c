"""Multimodal (binary) column plumbing for LLM training-data pipelines.

Beyond-reference scope. Pattern: media payloads travel as opaque
``binary`` columns next to a typed metadata struct; decode / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages so the bytes
never round-trip through Python row objects.

Codec access is Pillow-optional: ``decode_image`` uses PIL when installed
and raises ``NotImplementedError`` otherwise (this container ships no
codec library), with ``fake_decode_stats`` as the deterministic stand-in.
The Spark-side plumbing is real and tested either way: schema, Arrow
batch shape, partition-parallel UDF execution, and the metadata contract
are exactly what a codec-enabled deployment runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata contract carried beside every payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Wrap the documents table as a media table: utf-8 payload bytes +
    a typed metadata struct (dimensions derived deterministically from
    n_chars so tests are reproducible)."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.col("n_chars") % 640 + 16).alias("width"),
            (F.col("n_chars") * 7 % 480 + 16).alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> Any:
    """Decode an image payload to (width, height, mode) via Pillow when it
    is installed; this container ships no codec library, so without Pillow
    the call raises ``NotImplementedError`` and pipelines fall back to the
    deterministic ``fake_decode_stats`` stand-in. A codec-enabled
    deployment gets the real path with zero code changes."""
    try:
        import io

        from PIL import Image  # optional dependency — absent here
    except ImportError as exc:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use fake_decode_stats for deterministic tests"
        ) from exc
    with Image.open(io.BytesIO(payload)) as img:
        return img.width, img.height, img.mode


def fake_decode_stats(payload: bytes) -> tuple[int, str]:
    """Deterministic stand-in for decode+feature-extract: byte length and
    sha256 — same signature/cost-shape as a real thumbnail featurizer."""
    return len(payload), hashlib.sha256(payload).hexdigest()


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    `mapInPandas` streams record batches through one Python worker per
    partition — the payload bytes cross the JVM↔Python boundary once,
    columnar, and the output schema is fixed up front. Swap
    `fake_decode_stats` for a real codec and nothing else changes.

    Only the columns the function touches cross the boundary (guide
    §4.1, r13): ``meta`` is flattened to plain ``width``/``height``
    int columns BEFORE the map — the struct column otherwise
    materializes one Python dict per row in pandas (and ships the
    unused ``media_type`` string with it); a NULL meta flattens to
    NULL width/height, preserving the failed-fetch contract.
    """

    # NOTE: the closure must be self-contained (imports inside, no module
    # globals) — cloudpickle then ships it by value, so executors never
    # need this package importable on their PYTHONPATH.
    def _featurize(batches):
        import hashlib

        import pandas as _pd

        for pdf in batches:
            # NULL payload/meta rows (a failed fetch upstream) yield NULL
            # features — the batch must not crash the worker over them
            stats = [
                (None, None)
                if p is None
                else (len(p), hashlib.sha256(p).hexdigest())
                for p in pdf["payload"]
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [s[0] for s in stats],
                    "payload_sha256": [s[1] for s in stats],
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    slim = media.select(
        "doc_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return slim.mapInPandas(_featurize, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: take every Nth byte of the payload as a
    sampled frame offset list — exercises the array-of-binary output
    shape a real video frame sampler produces."""

    n = every_n_bytes  # bind locally so the closure carries a plain int

    def _sample(batches):
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frames": [
                        None
                        if p is None
                        else [bytes(p[i : i + 1]) for i in range(0, len(p), n)]
                        for p in pdf["payload"]
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frames", T.ArrayType(T.BinaryType())),
        ]
    )
    return media.mapInPandas(_sample, schema=schema)
