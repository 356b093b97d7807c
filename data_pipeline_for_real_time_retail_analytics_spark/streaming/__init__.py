from .ingest import (
    dedup_stream,
    file_stream,
    run_available_now,
    sessionize,
    validated_foreach_batch,
    windowed_aggregate,
)
from .stateful import running_totals_stream, ttl_dedup_stream

__all__ = [
    "dedup_stream",
    "file_stream",
    "run_available_now",
    "running_totals_stream",
    "sessionize",
    "ttl_dedup_stream",
    "validated_foreach_batch",
    "windowed_aggregate",
]
