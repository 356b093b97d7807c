"""Interchange serialization (S5/S6).

The reference round-trips frames through bytes in JSON / pickle / parquet /
CSV (reference: src/ingestion/extractors.py:30-35,353-413). On Spark the
equivalent is a distributed write/read of a directory per format; pickle is
deliberately unsupported (non-portable, insecure, and meaningless across
JVM executors) — callers get an explicit error instead of a footgun.

Beyond the reference's format matrix, ORC and Avro are first-class columnar
/ row interchange formats, and ``merge_schema`` turns on Spark's
schema-evolution merge for parquet/ORC directories whose files were written
with drifting schemas (new columns appear as nulls in old files).
Avro ships in Spark as an *external* module (``spark-avro``); when the
deployment lacks it, serialization raises a clear error instead of Spark's
generic data-source failure. XML rides Spark 4's native xml data source
(rowTag-delimited records; nested structs become nested elements) — the
interchange format partner systems still speak most often after CSV.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


class SerializationFormat(Enum):
    JSON = "json"
    PARQUET = "parquet"
    CSV = "csv"
    ORC = "orc"
    AVRO = "avro"
    XML = "xml"
    PICKLE = "pickle"  # recognized so we can reject it with a clear message


_MERGEABLE = frozenset({"parquet", "orc"})


def _raise_if_avro_missing(exc: Exception, fmt: SerializationFormat) -> None:
    if fmt is SerializationFormat.AVRO and "Failed to find data source" in str(exc):
        raise RuntimeError(
            "Avro support requires the external spark-avro module "
            "(org.apache.spark:spark-avro) on the Spark classpath; this "
            "deployment does not ship it — add it via spark.jars.packages "
            "or use parquet/orc"
        ) from exc
    raise exc


class DataSerializer:
    """Distributed write/read round-trip per format.

    ``compression`` mirrors the reference's parquet compression option
    (extractors.py:365-372); CSV keeps a header so the round-trip preserves
    column names like the pandas version does. ``snappy`` is a valid codec
    for parquet, ORC, and Avro alike.
    """

    def __init__(
        self,
        fmt: SerializationFormat = SerializationFormat.PARQUET,
        compression: str | None = "snappy",
        xml_row_tag: str = "row",
    ) -> None:
        if fmt is SerializationFormat.PICKLE:
            raise ValueError(
                "pickle serialization is not supported on Spark: it is "
                "neither portable across executors nor safe; use parquet"
            )
        self.fmt = fmt
        self.compression = compression
        self.xml_row_tag = xml_row_tag

    def serialize(self, df: DataFrame, path: str, mode: str = "overwrite") -> None:
        writer = df.write.mode(mode)
        if self.compression:
            writer = writer.option("compression", self.compression)
        if self.fmt is SerializationFormat.CSV:
            writer = writer.option("header", "true")
        if self.fmt is SerializationFormat.XML:
            writer = writer.option("rowTag", self.xml_row_tag)
        try:
            writer.format(self.fmt.value).save(path)
        except AnalysisException as exc:
            _raise_if_avro_missing(exc, self.fmt)

    def deserialize(
        self,
        spark: SparkSession,
        path: str,
        schema=None,
        merge_schema: bool = False,
        multiline: bool = False,
    ) -> DataFrame:
        """Read the directory back; ``merge_schema=True`` unions the
        per-file schemas (parquet/ORC only — Spark's schema-evolution
        read) so a directory whose later files gained columns reads as
        the superset schema with nulls backfilled. ``multiline=True``
        (JSON only) parses pretty-printed / array-of-objects JSON files
        as whole documents instead of the newline-delimited default —
        the shape REST exports usually arrive in. Multiline files are
        NOT splittable (one file = one parse task), so it is an ingest
        convenience, never the layout to store at scale."""
        if multiline and self.fmt is not SerializationFormat.JSON:
            raise ValueError("multiline applies to JSON directories only")
        if merge_schema and self.fmt.value not in _MERGEABLE:
            raise ValueError(
                f"merge_schema applies to {sorted(_MERGEABLE)} directories, "
                f"not {self.fmt.value}"
            )
        reader = spark.read.format(self.fmt.value)
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        if self.fmt is SerializationFormat.CSV:
            reader = reader.option("header", "true")
            if schema is None:
                reader = reader.option("inferSchema", "true")
        if self.fmt is SerializationFormat.XML:
            reader = reader.option("rowTag", self.xml_row_tag)
        if multiline:
            reader = reader.option("multiLine", "true")
        if schema is not None:
            reader = reader.schema(schema)
        try:
            return reader.load(path)
        except AnalysisException as exc:
            _raise_if_avro_missing(exc, self.fmt)
