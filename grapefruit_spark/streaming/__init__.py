"""Structured Streaming variants of the events operators (SURVEY §2 C4/C5)."""

from .events import (
    read_event_stream,
    stream_sessionize_stateful,
    stream_tumbling,
)

__all__ = ["read_event_stream", "stream_tumbling", "stream_sessionize_stateful"]
