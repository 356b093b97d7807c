from .registry import (
    APISource,
    DataSourceError,
    FileSource,
    JDBCSource,
    SourceRegistry,
    load_table,
    load_tables,
)
from .serializer import DataSerializer, SerializationFormat

__all__ = [
    "APISource",
    "DataSerializer",
    "DataSourceError",
    "FileSource",
    "JDBCSource",
    "SerializationFormat",
    "SourceRegistry",
    "load_table",
    "load_tables",
]
