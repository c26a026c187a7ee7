"""Structured Streaming surface for the sketch library."""

from .sessions import session_window_stats
from .sketches import (
    sketch_shard_sink,
    streaming_approx_distinct,
    streaming_approx_quantiles,
    streaming_approx_quantiles_weighted,
    streaming_cms_sketches,
    streaming_sketch_agg,
    streaming_windowed_distinct,
)

__all__ = [
    "session_window_stats",
    "sketch_shard_sink",
    "streaming_sketch_agg",
    "streaming_approx_distinct",
    "streaming_approx_quantiles",
    "streaming_approx_quantiles_weighted",
    "streaming_cms_sketches",
    "streaming_windowed_distinct",
]
