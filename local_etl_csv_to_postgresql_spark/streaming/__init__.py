"""Structured Streaming surface: windowed/session aggregation operators
shared between batch and stream, and the incremental-load stream wrapper
(the reference's idempotent append, SURVEY §2.10, as a file-source
stream + foreachBatch)."""

from .incremental import (
    start_incremental_load,
    start_windowed_rollup_stream,
    transactions_stream,
)
from .windows import (
    session_rollup,
    session_summary,
    sliding_rollup,
    tumbling_rollup,
)

__all__ = [
    "session_rollup",
    "session_summary",
    "sliding_rollup",
    "start_incremental_load",
    "start_windowed_rollup_stream",
    "transactions_stream",
    "tumbling_rollup",
]
