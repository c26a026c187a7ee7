"""hyperloglog_spark — PySpark-native distributed sketch library.

Mergeable sketches (HyperLogLog++, count-min, Bloom, KLL, t-digest) as
BinaryType aggregators with explicit two-phase partial aggregation, built
for transcripts-scale tables (see SURVEY.md / BASELINE.json).
"""

from .functions import (
    approx_distinct,
    hll_estimate_udf,
    hll_merged_sketch,
    hll_sketch_agg,
)

__version__ = "0.1.0"

__all__ = [
    "approx_distinct",
    "hll_estimate_udf",
    "hll_merged_sketch",
    "hll_sketch_agg",
]
