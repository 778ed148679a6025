"""Structured Streaming surface."""

from .decode_stream import decode_stream  # noqa: F401
from .encode_stream import encode_stream  # noqa: F401
from .upsert_stream import upsert_stream  # noqa: F401
from .window_stats import windowed_event_stats  # noqa: F401
