"""Structured Streaming variants of the events operators (SURVEY §2 C4/C5)."""

from .events import (
    read_event_stream,
    run_file_sink,
    run_foreach_batch,
    stream_sessionize_stateful,
    stream_static_join,
    stream_tumbling,
)

__all__ = [
    "read_event_stream",
    "stream_tumbling",
    "stream_sessionize_stateful",
    "stream_static_join",
    "run_file_sink",
    "run_foreach_batch",
]
