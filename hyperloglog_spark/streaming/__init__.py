"""Structured Streaming surface for the sketch library."""

from .sketches import (
    sketch_shard_sink,
    streaming_approx_distinct,
    streaming_approx_quantiles,
    streaming_cms_sketches,
    streaming_sketch_agg,
    streaming_windowed_distinct,
)

__all__ = [
    "sketch_shard_sink",
    "streaming_sketch_agg",
    "streaming_approx_distinct",
    "streaming_approx_quantiles",
    "streaming_cms_sketches",
    "streaming_windowed_distinct",
]
