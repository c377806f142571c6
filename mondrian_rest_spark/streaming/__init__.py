from .events import (stream_events, streaming_sessionize,  # noqa: F401
                     streaming_tumbling)
