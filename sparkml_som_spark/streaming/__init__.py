from sparkml_som_spark.streaming.windows import (
    session_window_stream,
    sliding_window_stream,
    tumbling_window_stream,
)

__all__ = [
    "tumbling_window_stream",
    "sliding_window_stream",
    "session_window_stream",
]
