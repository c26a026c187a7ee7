"""Regression tests for the round-3 ADVICE findings.

Each test pins the exact failure mode the advisor described:
  1. theta_estimate_udf must propagate NULL sketches (nullable Int64),
     not raise TypeError inside the executor.
  2. rollup.merge_sketches must handle the countsketch / cbf / fd kinds
     its docstring promises (previously a bare KeyError).
  3. countsketch must not silently use the upper-middle order statistic
     for even d — even d is rejected at construction, and a foreign
     even-d sketch gets the mean of the two middles.
  4. cms/cs point-query UDFs and bloom/cbf probes must map NULL hash
     inputs to NULL outputs, not to the answer for hash key 0.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- 1. theta


def test_theta_estimate_udf_null_sketch_rows(spark):
    from hyperloglog_spark.setops import theta_estimate_udf
    from hyperloglog_spark.sketch import theta

    sk = theta.build(np.arange(100, dtype=np.uint64), k=64)
    df = spark.createDataFrame(
        [(1, bytearray(sk)), (2, None), (3, bytearray(sk))],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("sk", T.BinaryType()),
            ]
        ),
    )
    rows = {
        r["id"]: r["est"]
        for r in df.select(
            "id", theta_estimate_udf(F.col("sk")).alias("est")
        ).collect()
    }
    assert rows[2] is None
    assert rows[1] == rows[3] and rows[1] is not None


def test_theta_intersect_then_estimate_with_null(spark):
    # The registered SQL pattern theta_estimate(theta_intersect(a, b))
    # where one side is NULL: intersect treats NULL as empty-set-absorbing
    # per its own docs; the estimate over whatever it yields must not
    # crash the task.
    from hyperloglog_spark.setops import (
        theta_estimate_udf,
        theta_intersect_udf,
    )
    from hyperloglog_spark.sketch import theta

    a = theta.build(np.arange(50, dtype=np.uint64), k=64)
    df = spark.createDataFrame(
        [(bytearray(a), None)],
        T.StructType(
            [
                T.StructField("a", T.BinaryType()),
                T.StructField("b", T.BinaryType()),
            ]
        ),
    )
    out = df.select(
        theta_estimate_udf(theta_intersect_udf(F.col("a"), F.col("b"))).alias(
            "est"
        )
    ).collect()
    assert len(out) == 1  # no executor TypeError


# --------------------------------------------------------------- 2. rollup


@pytest.mark.parametrize("kind", ["countsketch", "cbf", "fd"])
def test_merge_sketches_covers_all_codec_kinds(spark, kind):
    from hyperloglog_spark import rollup

    if kind == "countsketch":
        from hyperloglog_spark.sketch import countsketch as mod

        parts = [
            mod.from_hashes(
                np.arange(i * 100, i * 100 + 100, dtype=np.uint64),
                d=5,
                log2_w=10,
            )
            for i in range(3)
        ]
        direct = mod.merge_many(parts)
    elif kind == "cbf":
        from hyperloglog_spark.sketch import cbf as mod

        parts = [
            mod.from_hashes(
                np.arange(i * 100, i * 100 + 100, dtype=np.uint64),
                log2_m=12,
                k=4,
            )
            for i in range(3)
        ]
        direct = mod.merge_many(parts)
    else:
        from hyperloglog_spark.sketch import fd as mod

        rng = np.random.default_rng(7)
        parts = [
            mod.append(mod.empty(ell=4, dim=8), rng.normal(size=(20, 8)))
            for _ in range(3)
        ]
        direct = mod.merge_many(parts)

    df = spark.createDataFrame(
        [(bytearray(p),) for p in parts],
        T.StructType([T.StructField("sketch", T.BinaryType())]),
    )
    merged = rollup.merge_sketches(df).collect()
    assert len(merged) == 1
    got = bytes(merged[0][0])
    if kind == "fd":
        # FD merge is order-dependent in its internal shrink sequence;
        # assert the result decodes with the right (ell, dim, n) instead.
        assert mod.params(got)[:3] == mod.params(direct)[:3]
    else:
        assert got == direct


# ---------------------------------------------------------- 3. countsketch


def test_countsketch_even_d_rejected():
    from hyperloglog_spark.sketch import countsketch as cs

    with pytest.raises(ValueError, match="odd"):
        cs.empty(d=4)
    with pytest.raises(ValueError, match="odd"):
        cs.from_hashes(np.arange(10, dtype=np.uint64), d=2, log2_w=8)


def test_countsketch_foreign_even_d_uses_middle_mean():
    from hyperloglog_spark.sketch import countsketch as cs
    from hyperloglog_spark.sketch.countsketch import _serialize

    # Craft an even-d sketch directly (as a foreign system might).
    d, log2_w = 4, 6
    h = np.arange(1, 257, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    w = 1 << log2_w
    tbl = np.zeros((d, w), dtype=np.int64)
    pos, signs = cs.positions_signs(h, d, log2_w)
    for j in range(d):
        np.add.at(tbl[j], pos[j], signs[j])
    sk = _serialize(d, log2_w, len(h), tbl)

    est = cs.point_query(sk, h[:8])
    pos8, signs8 = cs.positions_signs(h[:8], d, log2_w)
    per_row = np.sort(signs8 * tbl[np.arange(d)[:, None], pos8], axis=0)
    expect = (per_row[d // 2 - 1] + per_row[d // 2]) // 2
    assert np.array_equal(est, expect)

    row_sums = np.sort((tbl.astype(object) ** 2).sum(axis=1))
    assert cs.f2_estimate(sk) == int(
        (row_sums[d // 2 - 1] + row_sums[d // 2]) // 2
    )


# ------------------------------------------------------- 4. NULL hash keys


def test_cms_point_query_udf_null_hash_gives_null(spark):
    from hyperloglog_spark.frequency import cms_point_query_udf
    from hyperloglog_spark.sketch import cms

    sk = cms.from_hashes(
        np.zeros(1000, dtype=np.uint64), d=4, log2_w=10
    )  # hash 0 has count 1000
    udf = cms_point_query_udf(sk)
    df = spark.createDataFrame(
        [(0,), (None,)],
        T.StructType([T.StructField("h", T.LongType())]),
    )
    rows = df.select(udf(F.col("h")).alias("c")).collect()
    assert rows[0]["c"] == 1000
    assert rows[1]["c"] is None  # NOT 1000


def test_cs_point_query_udf_null_hash_gives_null(spark):
    from hyperloglog_spark.frequency import cs_point_query_udf
    from hyperloglog_spark.sketch import countsketch

    sk = countsketch.from_hashes(
        np.zeros(500, dtype=np.uint64), d=5, log2_w=10
    )
    udf = cs_point_query_udf(sk)
    df = spark.createDataFrame(
        [(0,), (None,)],
        T.StructType([T.StructField("h", T.LongType())]),
    )
    rows = df.select(udf(F.col("h")).alias("c")).collect()
    assert abs(rows[0]["c"]) >= 1  # hash 0 seen
    assert rows[1]["c"] is None


def test_hll_estimate_udf_null_sketch(spark):
    from hyperloglog_spark.functions import hll_estimate_udf
    from hyperloglog_spark.sketch import hll

    sk = hll.from_hashes(np.arange(1000, dtype=np.uint64), p=12)
    df = spark.createDataFrame(
        [(bytearray(sk),), (None,)],
        T.StructType([T.StructField("sk", T.BinaryType())]),
    )
    rows = df.select(hll_estimate_udf(F.col("sk")).alias("est")).collect()
    assert rows[0]["est"] is not None
    assert rows[1]["est"] is None
