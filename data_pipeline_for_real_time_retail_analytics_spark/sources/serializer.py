"""Interchange serialization (S5/S6).

The reference round-trips frames through bytes in JSON / pickle / parquet /
CSV (reference: src/ingestion/extractors.py:30-35,353-413). On Spark the
equivalent is a distributed write/read of a directory per format; pickle is
deliberately unsupported (non-portable, insecure, and meaningless across
JVM executors) — callers get an explicit error instead of a footgun.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame, SparkSession


class SerializationFormat(Enum):
    JSON = "json"
    PARQUET = "parquet"
    CSV = "csv"
    PICKLE = "pickle"  # recognized so we can reject it with a clear message


class DataSerializer:
    """Distributed write/read round-trip per format.

    ``compression`` mirrors the reference's parquet compression option
    (extractors.py:365-372); CSV keeps a header so the round-trip preserves
    column names like the pandas version does.
    """

    def __init__(
        self,
        fmt: SerializationFormat = SerializationFormat.PARQUET,
        compression: str | None = "snappy",
    ) -> None:
        if fmt is SerializationFormat.PICKLE:
            raise ValueError(
                "pickle serialization is not supported on Spark: it is "
                "neither portable across executors nor safe; use parquet"
            )
        self.fmt = fmt
        self.compression = compression

    def serialize(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        writer = df.write.mode(mode)
        if self.compression:
            writer = writer.option("compression", self.compression)
        if self.fmt is SerializationFormat.CSV:
            writer = writer.option("header", "true")
        writer.format(self.fmt.value).save(path)

    def deserialize(self, spark: SparkSession, path: str, schema=None) -> DataFrame:
        reader = spark.read.format(self.fmt.value)
        if self.fmt is SerializationFormat.CSV:
            reader = reader.option("header", "true")
            if schema is None:
                reader = reader.option("inferSchema", "true")
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path)
