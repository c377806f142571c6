from .events import stream_events, streaming_tumbling  # noqa: F401
