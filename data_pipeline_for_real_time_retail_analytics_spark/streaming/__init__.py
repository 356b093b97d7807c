from .ingest import (
    dedup_stream,
    file_stream,
    run_available_now,
    sessionize,
    validated_foreach_batch,
    windowed_aggregate,
)

__all__ = [
    "dedup_stream",
    "file_stream",
    "run_available_now",
    "sessionize",
    "validated_foreach_batch",
    "windowed_aggregate",
]
