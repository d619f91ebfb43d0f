"""Structured Streaming execution of the shipper pipeline (S1 complete).

The batch transforms (decode -> parse -> split -> sink) are pure
DataFrame functions; this package wraps them in a streaming source +
foreachBatch sink with checkpointing — one code path, two execution
modes (SURVEY.md §3 EP1).
"""

from .pipeline import (  # noqa: F401
    StreamingShipper,
    correlate_error_context,
    dedup_stream,
    sessionized_request_stats,
    stream_kinesis_event_files,
    windowed_severity_counts,
)
from .neardup import StreamingNearDup  # noqa: F401
from .stateful import running_function_totals  # noqa: F401
