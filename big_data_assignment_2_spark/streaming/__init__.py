from .windows import (  # noqa: F401
    events_stream, session_agg, sliding_agg, stream_to_memory, tumbling_agg)
