"""Structured Streaming variants of the events operators (SURVEY §2 C4/C5)."""

from .events import (
    read_document_stream,
    read_event_stream,
    run_file_sink,
    run_foreach_batch,
    stream_dedup_exact,
    stream_session_window,
    stream_sessionize_stateful,
    stream_static_join,
    stream_tumbling,
)

__all__ = [
    "read_event_stream",
    "stream_tumbling",
    "stream_sessionize_stateful",
    "stream_static_join",
    "stream_session_window",
    "stream_dedup_exact",
    "read_document_stream",
    "run_file_sink",
    "run_foreach_batch",
]
