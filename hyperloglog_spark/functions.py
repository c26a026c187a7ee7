"""Public DataFrame-level API: approximate distinct (HLL), sketch columns,
and estimate UDFs.

Usage:
    from hyperloglog_spark import approx_distinct, hll_sketch_agg, hll_estimate

    approx_distinct(df, "conv_id")                       # 1-row DataFrame
    approx_distinct(df, ["conv_id", "tool"])             # composite distinct
    approx_distinct(df, "text", group_by=["role","tool"])
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .engine.aggregate import SketchAggregator, collect_merged, sketch_agg
from .sketch import hll
from .sketch.hashing import fnv1a64_binary, fnv1a64_utf16le, mix64

__all__ = [
    "HllAggregator",
    "approx_distinct",
    "hll_sketch_agg",
    "hll_estimate_udf",
    "hll_merged_sketch",
]


def _to_numpy_u64(arr: pa.Array) -> np.ndarray:
    """int64 arrow array (xxhash64 output) -> uint64 view, nulls dropped."""
    if arr.null_count:
        arr = arr.drop_null()
    return arr.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)


class HllAggregator(SketchAggregator):
    """HLL over one or more columns.

    hashing="spark"  (default): F.xxhash64(cols...) JVM-side — whole-stage
        codegen, only 8-byte hashes cross the Arrow boundary. The scale path.
    hashing="parity": reference-parity hashes computed in numpy — FNV-1a 64
        over UTF-16-LE code units for strings, Murmur finalizer for integers
        (semantics of /root/reference/HyperLogLog/HyperLogLog.cs:143-159,
        809-817). Single column only.
    """

    name = "hll"

    def __init__(self, p: int = hll.DEFAULT_P, hashing: str = "spark"):
        if hashing not in ("spark", "parity"):
            raise ValueError(f"hashing must be 'spark' or 'parity': {hashing}")
        if not 4 <= p <= 16:  # fail fast on the driver, not in an executor
            raise ValueError(f"precision p must be in [4, 16], got {p}")
        self.p = p
        self.hashing = hashing
        self.finalize_fields = [
            T.StructField("approx_distinct", T.LongType(), False)
        ]

    def prepare_columns(self, df: DataFrame, cols: list[str]):
        if self.hashing == "spark":
            # null semantics of count(distinct): drop rows where all key
            # columns are null; composite keys hash the tuple.
            return [F.xxhash64(*[F.col(c) for c in cols])]
        if len(cols) != 1:
            raise ValueError("parity hashing supports a single column")
        return [F.col(cols[0])]

    def _hashes(self, arr: pa.Array) -> np.ndarray:
        if self.hashing == "spark":
            return _to_numpy_u64(arr)
        if arr.null_count:
            arr = arr.drop_null()
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            return fnv1a64_utf16le(arr.to_pandas())
        if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
            return fnv1a64_binary(arr.to_pandas())
        return mix64(arr.to_numpy(zero_copy_only=False).astype(np.int64))

    def build_grouped(self, codes, values, n_groups) -> list[bytes]:
        (arr,) = values.values()
        if self.hashing == "parity" and arr.null_count:
            mask = ~np.asarray(arr.is_null())
            codes = codes[mask]
        elif self.hashing == "spark":
            pass  # xxhash64 never yields null for non-null input rows
        hashes = self._hashes(arr)
        return hll.group_from_hashes(codes, hashes, n_groups, self.p)

    def merge_many(self, sketches: list[bytes]) -> bytes:
        return hll.merge_many(sketches)

    def finalize(self, sketch: bytes) -> dict[str, Any]:
        return {"approx_distinct": hll.estimate(sketch)}


def _drop_null_rows(df: DataFrame, cols: list[str]) -> DataFrame:
    # COUNT(DISTINCT a, b, ...) semantics: skip rows where any key is NULL
    cond = None
    for c in cols:
        this = F.col(c).isNotNull()
        cond = this if cond is None else (cond & this)
    return df.filter(cond)


def approx_distinct(
    df: DataFrame,
    cols: str | list[str],
    group_by: str | list[str] | None = None,
    p: int = hll.DEFAULT_P,
    hashing: str = "spark",
    alias: str = "approx_distinct",
) -> DataFrame:
    """HLL approximate count-distinct of ``cols`` (optionally per group).

    Matches COUNT(DISTINCT ...) null semantics: rows where any key column is
    NULL are excluded. On empty input the result has zero rows (not a 0-count
    row) — the grouped-aggregation convention.
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    group_by = (
        [group_by] if isinstance(group_by, str) else list(group_by or [])
    )
    agg = HllAggregator(p=p, hashing=hashing)
    agg.finalize_fields = [T.StructField(alias, T.LongType(), False)]
    base_finalize = agg.finalize

    if alias != "approx_distinct":
        def renamed(sketch: bytes) -> dict:
            return {alias: base_finalize(sketch)["approx_distinct"]}

        agg.finalize = renamed  # type: ignore[method-assign]
    out = sketch_agg(_drop_null_rows(df, cols), cols, agg, group_by)
    return out


def hll_sketch_agg(
    df: DataFrame,
    cols: str | list[str],
    group_by: str | list[str] | None = None,
    p: int = hll.DEFAULT_P,
    hashing: str = "spark",
) -> DataFrame:
    """Like approx_distinct but returns the merged sketch (BinaryType) per
    group — composable: store it, merge it later, estimate at the driver."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    group_by = (
        [group_by] if isinstance(group_by, str) else list(group_by or [])
    )
    agg = HllAggregator(p=p, hashing=hashing)
    return sketch_agg(
        _drop_null_rows(df, cols), cols, agg, group_by, finalize=False
    )


def hll_merged_sketch(
    df: DataFrame,
    cols: str | list[str],
    p: int = hll.DEFAULT_P,
    hashing: str = "spark",
) -> bytes:
    """Distributed partial build + driver tree-merge; returns sketch bytes."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    agg = HllAggregator(p=p, hashing=hashing)
    return collect_merged(_drop_null_rows(df, cols), cols, agg)


@F.pandas_udf(T.LongType())
def hll_estimate_udf(sketches):
    """Scalar pandas UDF: sketch binary column -> cardinality estimate."""
    import pandas as pd

    return pd.Series(
        [hll.estimate(bytes(s)) if s is not None else None for s in sketches],
        dtype="int64",
    )
