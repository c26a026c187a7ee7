"""Structured Streaming surface for the sketch library."""

from .sketches import (
    streaming_approx_distinct,
    streaming_sketch_agg,
    streaming_windowed_distinct,
)

__all__ = [
    "streaming_sketch_agg",
    "streaming_approx_distinct",
    "streaming_windowed_distinct",
]
