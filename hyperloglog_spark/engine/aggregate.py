"""Two-phase distributed sketch aggregation.

Python UDAFs get no automatic partial aggregation from Catalyst, so the
map-side combine is built explicitly (SURVEY.md §3.4):

    phase 1 (mapInArrow):  per-partition, per-group vectorized sketch build —
                           one output row per (partition, group), each a
                           BinaryType sketch (16 KB dense / smaller sparse)
    phase 2 (shuffle):     groupBy(group_cols).applyInPandas — associative
                           merge of the tiny partials, then finalize

The shuffle therefore moves #partitions x #groups sketch rows, never data
rows — this is what makes the pipeline scan-bound and embarrassingly parallel
at 100 TB (the reference's designed-in distribution hook is the register-max
monoid, /root/reference/HyperLogLog/HyperLogLog.cs:733-781; we exploit the
same property for every sketch kind).

Hashing runs JVM-side by default (``F.xxhash64``, whole-stage codegen; only
8-byte hashes cross the Arrow boundary, not strings). ``hashing="parity"``
instead ships raw values to Python and applies the reference's FNV-1a 64 /
Murmur-finalizer for bit-parity with the reference sketches.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SKETCH_COL = "sketch"
_GLOBAL_KEY = "__all__"


class SketchAggregator:
    """Adapter every sketch kind implements to ride the two-phase pipeline.

    build_grouped: (codes int64[n], values dict[col -> np.ndarray/pd.Series],
                    n_groups) -> list[bytes]   (vectorized batch build)
    merge_many:    (list[bytes]) -> bytes
    finalize:      (bytes) -> dict[field -> python value]
    finalize_schema: pyspark StructType fields for the finalized values
    """

    name: str = "sketch"

    def prepare_columns(self, df: DataFrame, cols: list[str]) -> list[Column]:
        """Spark-side (JVM) preparation of the value columns."""
        raise NotImplementedError

    def build_grouped(self, codes, values, n_groups) -> list[bytes]:
        raise NotImplementedError

    def merge_many(self, sketches: list[bytes]) -> bytes:
        raise NotImplementedError

    def finalize(self, sketch: bytes) -> dict[str, Any]:
        raise NotImplementedError

    finalize_fields: list[T.StructField] = []


def _isna(v) -> bool:
    import pandas as pd

    try:
        return v is None or bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _group_field(df: DataFrame, name: str) -> T.StructField:
    for f in df.schema.fields:
        if f.name == name:
            return f
    raise ValueError(f"group column {name!r} not in schema {df.schema.simpleString()}")


def sketch_partials(
    df: DataFrame,
    value_cols: list[str],
    agg: SketchAggregator,
    group_cols: list[str] | None = None,
    with_rows: bool = False,
) -> DataFrame:
    """Phase 1: one sketch row per (partition, group).

    with_rows=True adds a ``rows`` LongType column counting the input rows
    each partial consumed (lineage/metrics come free from the same scan)."""
    group_cols = list(group_cols or [])
    prepared = agg.prepare_columns(df, value_cols)
    value_names = [f"__v{i}" for i in range(len(prepared))]
    proj = df.select(
        *[F.col(c) for c in group_cols],
        *[c.alias(n) for c, n in zip(prepared, value_names)],
    )

    out_fields = [_group_field(df, c) for c in group_cols] + [
        T.StructField(SKETCH_COL, T.BinaryType(), False)
    ]
    if with_rows:
        out_fields.append(T.StructField("rows", T.LongType(), False))
    out_schema = T.StructType(out_fields)
    out_arrow = pa.schema(
        [pa.field(f.name, _to_arrow(f.dataType)) for f in out_fields]
    )

    n_groups_cols = len(group_cols)
    build_grouped = agg.build_grouped
    merge_many = agg.merge_many

    def build_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: dict[tuple, bytes] = {}
        nrows: dict[tuple, int] = {}
        for batch in batches:
            if batch.num_rows == 0:
                continue
            values = {
                n: batch.column(n_groups_cols + i)
                for i, n in enumerate(value_names)
            }
            if n_groups_cols == 0:
                codes = np.zeros(batch.num_rows, dtype=np.int64)
                uniques: list[tuple] = [(_GLOBAL_KEY,)]
            else:
                import pandas as pd

                key_cols = [
                    batch.column(i).to_pandas() for i in range(n_groups_cols)
                ]
                if n_groups_cols == 1:
                    codes_arr, uniq = pd.factorize(key_cols[0], use_na_sentinel=False)
                    uniques = [(u,) for u in uniq]
                else:
                    # radix-combine per-column codes, then factorize the
                    # int64 keys — O(n) hash path; MultiIndex.factorize
                    # materializes python tuples and is ~10x slower
                    col_codes, col_uniqs = [], []
                    for kc in key_cols:
                        c, u = pd.factorize(kc, use_na_sentinel=False)
                        col_codes.append(c.astype(np.int64))
                        col_uniqs.append(u)
                    combined = col_codes[0]
                    for c, u in zip(col_codes[1:], col_uniqs[1:]):
                        combined = combined * np.int64(len(u)) + c
                    codes_arr, _ = pd.factorize(combined)
                    first_pos = (
                        pd.Series(codes_arr).drop_duplicates().index.values
                    )
                    uniques = [
                        tuple(col_uniqs[j][col_codes[j][fp]]
                              for j in range(n_groups_cols))
                        for fp in first_pos
                    ]
                codes = codes_arr.astype(np.int64)
            sketches = build_grouped(codes, values, len(uniques))
            counts = np.bincount(codes, minlength=len(uniques))
            for gi, (key, sk) in enumerate(zip(uniques, sketches)):
                prev = acc.get(key)
                acc[key] = sk if prev is None else merge_many([prev, sk])
                nrows[key] = nrows.get(key, 0) + int(counts[gi])
        if not acc:
            return
        keys = list(acc.keys())
        arrays = []
        for i in range(n_groups_cols):
            col_vals = [None if _isna(k[i]) else k[i] for k in keys]
            arrays.append(pa.array(col_vals, type=out_arrow.field(i).type))
        arrays.append(
            pa.array([acc[k] for k in keys], type=pa.binary())
        )
        if with_rows:
            arrays.append(pa.array([nrows[k] for k in keys], type=pa.int64()))
        yield pa.RecordBatch.from_arrays(arrays, schema=out_arrow)

    return proj.mapInArrow(build_partition, out_schema)


def sketch_agg(
    df: DataFrame,
    value_cols: list[str],
    agg: SketchAggregator,
    group_cols: list[str] | None = None,
    finalize: bool = True,
) -> DataFrame:
    """Full two-phase aggregation. Returns group_cols + finalized fields
    (or group_cols + the merged sketch when finalize=False)."""
    group_cols = list(group_cols or [])
    partials = sketch_partials(df, value_cols, agg, group_cols)

    dummy = not group_cols
    if dummy:
        partials = partials.withColumn("__g", F.lit(1))
        key_cols = ["__g"]
    else:
        key_cols = group_cols

    if finalize:
        tail_fields = list(agg.finalize_fields)
    else:
        tail_fields = [T.StructField(SKETCH_COL, T.BinaryType(), False)]
    out_schema = T.StructType(
        [_group_field(partials, c) for c in key_cols] + tail_fields
    )
    merge_many = agg.merge_many
    fin = agg.finalize
    tail_names = [f.name for f in tail_fields]

    def merge_group(pdf):
        import pandas as pd

        merged = merge_many(list(pdf[SKETCH_COL]))
        row = {c: [pdf[c].iloc[0]] for c in key_cols}
        if finalize:
            vals = fin(merged)
            for n in tail_names:
                row[n] = [vals[n]]
        else:
            row[SKETCH_COL] = [merged]
        return pd.DataFrame(row)

    out = partials.groupBy(*key_cols).applyInPandas(merge_group, out_schema)
    if dummy:
        out = out.drop("__g")
    return out


def _to_arrow(dt: T.DataType) -> pa.DataType:
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(dt)


def tree_merge_rows(
    partials: DataFrame,
    merge_many: Callable[[list[bytes]], bytes],
    fan_in: int = 32,
    n_partials: int | None = None,
) -> DataFrame:
    """Tree-reduce a one-sketch-row-per-partition DataFrame to ONE row.

    The rows are reduced on the cluster in ``ceil(log_fan_in(P))`` grouped
    levels: each level buckets CONTIGUOUS runs of ``fan_in`` partials
    (``bucket = origin // fan_in``) and merges each bucket sorted by origin,
    so the whole tree is a pure RE-BRACKETING of the sequential left-to-right
    merge — byte-identical for every sketch kind with the re-bracketing law
    (HLL/CMS/Bloom/CBF/Count-Sketch/theta/KMV: exact monoids; KLL/t-digest:
    shuffled-merge byte-identity is tested; FD: identical in the exact regime,
    certificate-lawful otherwise). No level's task ever holds more than
    ``fan_in`` partials. Returns a DataFrame with the single SKETCH_COL
    column and at most one row (zero when ``partials`` is empty)."""
    if fan_in < 2:
        raise ValueError(f"fan_in must be >= 2 (got {fan_in})")
    # upper bound on partial rows (empty partitions emit no row); callers
    # that already know the partition count pass it to avoid a second
    # DataFrame->RDD conversion
    n = (partials.rdd.getNumPartitions()
         if n_partials is None else n_partials)
    schema = T.StructType(
        [
            T.StructField("__b", T.LongType(), False),
            T.StructField(SKETCH_COL, T.BinaryType(), False),
        ]
    )

    def merge_bucket(pdf):
        import pandas as pd

        # sort by origin index -> the bucket merge replays left-to-right
        # order; the emitted row takes the (dense, order-preserving) bucket
        # index as its new origin so the next level buckets contiguously
        ordered = pdf.sort_values("__b")
        return pd.DataFrame(
            {
                "__b": [int(ordered["__g"].iloc[0])],
                SKETCH_COL: [merge_many(list(ordered[SKETCH_COL]))],
            }
        )

    level = partials.select(
        F.spark_partition_id().cast("long").alias("__b"), F.col(SKETCH_COL)
    )
    while n > fan_in:
        # contiguous runs of fan_in origins -> one bucket
        level = (
            level.withColumn("__g", F.floor(F.col("__b") / F.lit(int(fan_in))))
            .groupBy("__g")
            .applyInPandas(merge_bucket, schema)
        )
        n = -(-n // fan_in)
    return (
        level.withColumn("__g", F.lit(0).cast("long"))
        .groupBy("__g")
        .applyInPandas(merge_bucket, schema)
        .select(SKETCH_COL)
    )


def premerged_sketch(
    df: DataFrame,
    value_cols: list[str],
    agg: SketchAggregator,
    fan_in: int = 32,
) -> DataFrame:
    """Distributed tree-merge of the phase-1 partials down to ONE sketch row.

    Phase 1 emits one partial per scan partition; at 100 TB that is 1e5-1e6
    rows, and for byte-heavy sketches (a billion-key Bloom partial is ~1 GiB)
    a driver collect() of all of them is a genuine memory cliff — see
    ``tree_merge_rows`` for the reduction shape and its byte-identity
    guarantee."""
    partials = sketch_partials(df, value_cols, agg)
    return tree_merge_rows(partials, agg.merge_many, fan_in=fan_in)


def collect_merged(
    df: DataFrame,
    value_cols: list[str],
    agg: SketchAggregator,
    fan_in: int = 32,
) -> bytes:
    """Driver-side variant: build partials distributed, reduce to one
    sketch, collect it. Driver memory is bounded by ``fan_in`` partials at
    any partition count — the same bound every tree task holds:

    - P <= fan_in partitions: collect the partials directly (at most
      fan_in rows — exactly what a single merge task would hold) and fold
      them in partition order on the driver. No extra stage; this is the
      common small-job case and the left-to-right fold the tree
      re-brackets, so bytes are identical to the tree path.
    - P > fan_in: tree-merge ON THE CLUSTER (see premerged_sketch) and
      collect exactly one row. At 10^6 scan partitions and GiB-sized
      Bloom partials the driver sees one sketch, not a PiB."""
    if fan_in < 2:
        raise ValueError(f"fan_in must be >= 2 (got {fan_in})")
    partials = sketch_partials(df, value_cols, agg)
    n = partials.rdd.getNumPartitions()
    if n <= fan_in:
        rows = partials.select(
            F.spark_partition_id().alias("__b"), F.col(SKETCH_COL)
        ).collect()
        if not rows:
            raise ValueError("no input rows")
        ordered = sorted(rows, key=lambda r: r["__b"])
        return agg.merge_many([r[SKETCH_COL] for r in ordered])
    rows = tree_merge_rows(
        partials, agg.merge_many, fan_in=fan_in, n_partials=n
    ).collect()
    if not rows:
        raise ValueError("no input rows")
    return rows[0][SKETCH_COL]
