"""Declarative schema system.

Re-expresses the reference's two-layer type model (reference:
src/ingestion/validators.py:24-57 — a ``DataType`` enum of physical +
semantic types, and a ``SchemaDefinition`` of per-column declarations with
required / nullable / unique / primary-key constraints) on Spark types.

Semantic types (EMAIL, URL, JSON) stay ``StringType`` physically and are
enforced by validation expressions (see ``plans/validation.py``).
Beyond-reference: ARRAY_FLOAT for embedding columns and BINARY for
multimodal payloads, which the reference's pandas model cannot express.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T


class DataType(Enum):
    """Declared validation types (reference: src/ingestion/validators.py:24-34)."""

    STRING = "string"
    INTEGER = "integer"
    FLOAT = "float"
    BOOLEAN = "boolean"
    DATE = "date"
    DATETIME = "datetime"
    JSON = "json"
    EMAIL = "email"
    URL = "url"
    # beyond-reference types for LLM-data pipelines
    ARRAY_FLOAT = "array<float>"
    BINARY = "binary"


#: physical Spark type for each declared type. Semantic string types map to
#: StringType; their *semantics* are enforced by validation rules.
SPARK_TYPE: dict[DataType, T.DataType] = {
    DataType.STRING: T.StringType(),
    DataType.INTEGER: T.LongType(),
    DataType.FLOAT: T.DoubleType(),
    DataType.BOOLEAN: T.BooleanType(),
    DataType.DATE: T.DateType(),
    DataType.DATETIME: T.TimestampType(),
    DataType.JSON: T.StringType(),
    DataType.EMAIL: T.StringType(),
    DataType.URL: T.StringType(),
    DataType.ARRAY_FLOAT: T.ArrayType(T.FloatType()),
    DataType.BINARY: T.BinaryType(),
}

#: lexical values accepted as booleans (reference: src/ingestion/validators.py:237-240)
BOOLEAN_LEXICON = ("true", "false", "1", "0", "yes", "no", "t", "f", "y", "n")

#: email / URL regexes (reference: src/ingestion/validators.py:253-260)
EMAIL_REGEX = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"
URL_REGEX = r"^https?://[^\s/$.?#].[^\s]*$"


@dataclass
class SchemaDefinition:
    """Declared table schema (reference: src/ingestion/validators.py:49-57).

    ``columns`` maps column name → DataType. Constraint lists reference
    column names; ``primary_key`` is a composite tuple.
    """

    table_name: str
    columns: dict[str, DataType] = field(default_factory=dict)
    required_columns: list[str] = field(default_factory=list)
    nullable_columns: list[str] = field(default_factory=list)
    unique_columns: list[str] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)

    def to_struct_type(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(
                    name,
                    SPARK_TYPE[dtype],
                    nullable=name not in set(self.primary_key),
                )
                for name, dtype in self.columns.items()
            ]
        )


# ---------------------------------------------------------------------------
# Registry of the synthetic star-schema tables (see TESTDATA.md); used by the
# sources layer so every read is schema-on-read (no runtime inference).
# ---------------------------------------------------------------------------

_D = DataType
TABLE_SCHEMAS: dict[str, SchemaDefinition] = {
    "region": SchemaDefinition(
        "region",
        {"r_regionkey": _D.INTEGER, "r_name": _D.STRING},
        required_columns=["r_regionkey", "r_name"],
        unique_columns=["r_regionkey"],
        primary_key=["r_regionkey"],
    ),
    "nation": SchemaDefinition(
        "nation",
        {"n_nationkey": _D.INTEGER, "n_name": _D.STRING, "n_regionkey": _D.INTEGER},
        required_columns=["n_nationkey", "n_name"],
        unique_columns=["n_nationkey"],
        primary_key=["n_nationkey"],
    ),
    "customer": SchemaDefinition(
        "customer",
        {
            "c_custkey": _D.INTEGER,
            "c_name": _D.STRING,
            "c_nationkey": _D.INTEGER,
            "c_acctbal": _D.FLOAT,
            "c_mktsegment": _D.STRING,
        },
        required_columns=["c_custkey", "c_name"],
        nullable_columns=["c_acctbal", "c_mktsegment"],
        unique_columns=["c_custkey"],
        primary_key=["c_custkey"],
    ),
    "supplier": SchemaDefinition(
        "supplier",
        {"s_suppkey": _D.INTEGER, "s_name": _D.STRING, "s_nationkey": _D.INTEGER},
        required_columns=["s_suppkey"],
        unique_columns=["s_suppkey"],
        primary_key=["s_suppkey"],
    ),
    "part": SchemaDefinition(
        "part",
        {
            "p_partkey": _D.INTEGER,
            "p_name": _D.STRING,
            "p_brand": _D.STRING,
            "p_type": _D.STRING,
            "p_retailprice": _D.FLOAT,
        },
        required_columns=["p_partkey"],
        unique_columns=["p_partkey"],
        primary_key=["p_partkey"],
    ),
    "orders": SchemaDefinition(
        "orders",
        {
            "o_orderkey": _D.INTEGER,
            "o_custkey": _D.INTEGER,
            "o_orderstatus": _D.STRING,
            "o_totalprice": _D.FLOAT,
            "o_orderdate": _D.DATETIME,
            "o_orderpriority": _D.STRING,
        },
        required_columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        unique_columns=["o_orderkey"],
        primary_key=["o_orderkey"],
    ),
    "lineitem": SchemaDefinition(
        "lineitem",
        {
            "l_orderkey": _D.INTEGER,
            "l_partkey": _D.INTEGER,
            "l_suppkey": _D.INTEGER,
            "l_linenumber": _D.INTEGER,
            "l_quantity": _D.FLOAT,
            "l_extendedprice": _D.FLOAT,
            "l_discount": _D.FLOAT,
            "l_tax": _D.FLOAT,
            "l_returnflag": _D.STRING,
            "l_linestatus": _D.STRING,
            "l_shipdate": _D.DATETIME,
        },
        required_columns=["l_orderkey", "l_linenumber"],
        primary_key=["l_orderkey", "l_linenumber"],
    ),
    "events": SchemaDefinition(
        "events",
        {
            "event_id": _D.INTEGER,
            "ts": _D.DATETIME,
            "user_id": _D.INTEGER,
            "event_type": _D.STRING,
            "value": _D.FLOAT,
            "props": _D.JSON,
        },
        required_columns=["event_id", "ts"],
        unique_columns=["event_id"],
        primary_key=["event_id"],
    ),
    "documents": SchemaDefinition(
        "documents",
        {
            "doc_id": _D.INTEGER,
            "text": _D.STRING,
            "lang": _D.STRING,
            "source": _D.STRING,
            "n_chars": _D.INTEGER,
        },
        required_columns=["doc_id"],
        unique_columns=["doc_id"],
        primary_key=["doc_id"],
    ),
    "embeddings": SchemaDefinition(
        "embeddings",
        {"vec_id": _D.INTEGER, "embedding": _D.ARRAY_FLOAT, "label": _D.INTEGER},
        required_columns=["vec_id"],
        unique_columns=["vec_id"],
        primary_key=["vec_id"],
    ),
}
