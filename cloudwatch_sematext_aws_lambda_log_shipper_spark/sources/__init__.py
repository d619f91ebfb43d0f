"""Record sources: Kinesis-shaped batch/streaming readers (S1)."""

from .kinesis import (  # noqa: F401
    read_kinesis_event_file,
    stream_kinesis_event_files,
)
