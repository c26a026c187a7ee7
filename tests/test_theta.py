"""Theta sketch: kernel properties + DataFrame surface.

The kernel claims (sketch/theta docstring): exact below k; exclusive
theta = (k+1)-th smallest distinct key; union is the min-k merge law
(associative, commutative, partition-invariant); intersect / a_not_b are
closed over the state with theta = min(theta_a, theta_b); estimates are
``floor(count / theta_frac)``. The reference has no set-operation sketch
(HLL merge is union-only, /root/reference/HyperLogLog/HyperLogLog.cs
Merge) — correctness here is vs exact set arithmetic on the same keys.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hyperloglog_spark.sketch import theta

I64 = np.int64
i64_arrays = st.lists(
    st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1),
    min_size=0, max_size=400,
).map(lambda xs: np.array(xs, dtype=I64))


def _est(buf: bytes) -> int:
    return theta.estimate(buf)


# ---------------------------------------------------------------- kernel

def test_exact_regime_roundtrip():
    keys = np.array([5, -3, 5, 7, -3, 11], dtype=I64)
    buf = theta.build(keys, k=16)
    st_ = theta.decode(buf)
    assert st_.is_exact and st_.theta_frac == 1.0
    assert _est(buf) == 4
    assert np.array_equal(st_.keys, np.array([-3, 5, 7, 11], dtype=I64))


def test_estimation_regime_theta_is_k_plus_1th():
    keys = np.arange(100, dtype=I64)
    buf = theta.build(keys, k=8)
    st_ = theta.decode(buf)
    assert not st_.is_exact
    assert st_.theta_key == 8          # (k+1)-th smallest of 0..99
    assert np.array_equal(st_.keys, np.arange(8, dtype=I64))
    # all retained strictly below theta
    assert (st_.keys < st_.theta_key).all()


def test_estimate_unbiased_shape_u60():
    """MODE_U60: est = floor(k / (theta_key / 2^60)) exactly."""
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 60, size=50_000, dtype=I64)
    k = 512
    buf = theta.build(keys, k=k, mode=theta.MODE_U60)
    st_ = theta.decode(buf)
    expect = int(np.floor(k / (float(st_.theta_key) / float(1 << 60))))
    assert _est(buf) == expect
    n_true = np.unique(keys).size
    # ~1/sqrt(k) rse; 5 sigma
    assert abs(_est(buf) - n_true) <= 5 * n_true / np.sqrt(k)


def test_estimate_error_bound_i64():
    rng = np.random.default_rng(11)
    keys = rng.integers(-(2 ** 63), 2 ** 63 - 1, size=80_000, dtype=I64)
    buf = theta.build(keys, k=1024)
    n_true = np.unique(keys).size
    assert abs(_est(buf) - n_true) <= 5 * n_true / np.sqrt(1024)


@settings(max_examples=60, deadline=None)
@given(a=i64_arrays, b=i64_arrays, c=i64_arrays)
def test_union_monoid_laws(a, b, c):
    k = 32
    sa, sb, sc = (theta.build(x, k) for x in (a, b, c))
    u = theta.union
    assert u(sa, sb) == u(sb, sa)
    assert u(u(sa, sb), sc) == u(sa, u(sb, sc))
    assert u(sa, sa) == sa


@settings(max_examples=40, deadline=None)
@given(vals=i64_arrays, splits=st.integers(min_value=1, max_value=7))
def test_union_partition_invariance(vals, splits):
    if len(vals) == 0:
        return
    whole = theta.build(vals, 24)
    parts = [theta.build(ch, 24)
             for ch in np.array_split(vals, splits) if len(ch)]
    assert theta.union_many(parts) == whole


@settings(max_examples=60, deadline=None)
@given(a=i64_arrays, b=i64_arrays)
def test_set_ops_exact_regime_match_numpy(a, b):
    """When both inputs are exact, every derived estimate is exact."""
    k = 1024  # > max array size => exact
    sa, sb = theta.build(a, k), theta.build(b, k)
    ua, ub = np.unique(a), np.unique(b)
    assert _est(theta.union(sa, sb)) == np.union1d(ua, ub).size
    assert _est(theta.intersect(sa, sb)) == np.intersect1d(ua, ub).size
    assert _est(theta.a_not_b(sa, sb)) == np.setdiff1d(ua, ub).size
    assert _est(theta.a_not_b(sb, sa)) == np.setdiff1d(ub, ua).size


def test_intersect_estimation_regime_accuracy():
    rng = np.random.default_rng(3)
    common = rng.integers(0, 1 << 60, size=30_000, dtype=I64)
    only_a = rng.integers(0, 1 << 60, size=20_000, dtype=I64)
    only_b = rng.integers(0, 1 << 60, size=20_000, dtype=I64)
    k = 2048
    sa = theta.build(np.concatenate([common, only_a]), k, theta.MODE_U60)
    sb = theta.build(np.concatenate([common, only_b]), k, theta.MODE_U60)
    n_int = np.intersect1d(
        np.unique(np.concatenate([common, only_a])),
        np.unique(np.concatenate([common, only_b])),
    ).size
    n_uni = np.union1d(
        np.concatenate([common, only_a]), np.concatenate([common, only_b])
    ).size
    est = _est(theta.intersect(sa, sb))
    # rse ~ sqrt(union/result)/sqrt(k); 6 sigma slack
    sigma = n_int * np.sqrt(n_uni / n_int) / np.sqrt(k)
    assert abs(est - n_int) <= 6 * sigma


def test_a_not_b_disjoint_and_subset():
    a = np.arange(0, 500, dtype=I64)
    b = np.arange(500, 900, dtype=I64)
    k = 4096
    sa, sb = theta.build(a, k), theta.build(b, k)
    assert _est(theta.a_not_b(sa, sb)) == 500
    assert _est(theta.intersect(sa, sb)) == 0
    assert _est(theta.a_not_b(sa, sa)) == 0


def test_mixed_exactness_uses_other_theta():
    rng = np.random.default_rng(19)
    big = rng.integers(0, 1 << 60, size=50_000, dtype=I64)
    small = big[:100]  # subset, exact
    k = 512
    s_big = theta.build(big, k, theta.MODE_U60)
    s_small = theta.build(small, k, theta.MODE_U60)
    t_big = theta.decode(s_big).theta_key
    inter = theta.decode(theta.intersect(s_big, s_small))
    assert not inter.is_exact and inter.theta_key == t_big
    # intersection keys = small's keys below big's theta
    expect = np.unique(small)
    expect = expect[expect < t_big]
    assert np.array_equal(inter.keys, expect)


def test_jaccard_identical_and_disjoint():
    a = np.arange(1000, dtype=I64)
    sa = theta.build(a, 256)
    assert theta.jaccard(sa, sa) == 1.0
    sb = theta.build(a + 10_000, 256)
    assert theta.jaccard(sa, sb) < 0.2
    empty = theta.build(np.empty(0, dtype=I64), 256)
    assert theta.jaccard(empty, empty) == 1.0


def test_mode_mismatch_and_bad_k_raise():
    sa = theta.build(np.arange(5, dtype=I64), 16, theta.MODE_I64)
    sb = theta.build(np.arange(5, dtype=I64), 16, theta.MODE_U60)
    with pytest.raises(ValueError, match="key domains"):
        theta.union(sa, sb)
    with pytest.raises(ValueError, match="k must be >= 2"):
        theta.build(np.arange(5, dtype=I64), 1)
    with pytest.raises(ValueError):
        theta.union_many([])


def test_codec_roundtrip_and_kind_guard():
    from hyperloglog_spark.sketch import codec, hll

    buf = theta.build(np.arange(100, dtype=I64), 8)
    st_ = theta.decode(buf)
    assert theta.decode(theta._encode(st_)) == st_
    hbuf = hll.from_hashes(np.arange(10, dtype=np.uint64), 10)
    with pytest.raises(ValueError):
        theta.decode(hbuf)
    with pytest.raises(ValueError):
        codec.check_header(buf, codec.KIND_HLL)


def test_mismatched_k_union_takes_min():
    a = np.arange(1000, dtype=I64)
    sa = theta.build(a, 64)
    sb = theta.build(a, 256)
    merged = theta.decode(theta.union(sa, sb))
    assert merged.k == 64 and merged.keys.size <= 64


# ------------------------------------------------------------- DataFrame

@pytest.fixture(scope="module")
def events(spark, sf001_dir):
    return spark.read.parquet(f"{sf001_dir}/events.parquet")


def test_theta_distinct_matches_kernel(spark, events):
    """DataFrame agg == single-threaded kernel build on the same hashes
    (partition invariance of the distributed path)."""
    from pyspark.sql import functions as F

    from hyperloglog_spark.setops import theta_distinct

    got = theta_distinct(events, "user_id", k=8).collect()[0][0]
    hashes = np.array(
        [r[0] for r in
         events.select(F.xxhash64("user_id", F.lit(0))).collect()],
        dtype=I64,
    )
    assert got == theta.estimate(theta.build(hashes, 8))


def test_theta_distinct_exact_below_k(spark, events):
    from hyperloglog_spark.setops import theta_distinct

    got = theta_distinct(events, "user_id", k=4096).collect()[0][0]
    exact = events.select("user_id").distinct().count()
    assert got == exact


def test_theta_grouped_and_null_rows(spark):
    from hyperloglog_spark.setops import theta_distinct

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", 1), ("b", 1)],
        "g string, v int",
    )
    rows = {
        r["g"]: r["n_distinct_est"]
        for r in theta_distinct(df, "v", group_by="g", k=64).collect()
    }
    assert rows == {"a": 2, "b": 1}


def test_theta_set_cardinalities_lazy_and_correct(spark, events):
    from hyperloglog_spark.setops import theta_set_cardinalities, theta_sketch_agg

    va = theta_sketch_agg(events.filter("event_type = 'view'"), "user_id",
                          k=4096)
    vb = theta_sketch_agg(events.filter("event_type = 'purchase'"),
                          "user_id", k=4096)
    out = theta_set_cardinalities(va, vb)
    row = out.collect()[0]
    a = {r[0] for r in
         events.filter("event_type = 'view'").select("user_id").collect()}
    b = {r[0] for r in
         events.filter("event_type = 'purchase'").select("user_id").collect()}
    assert row["n_union"] == len(a | b)
    assert row["n_intersect"] == len(a & b)
    assert row["n_a_not_b"] == len(a - b)
    assert row["n_b_not_a"] == len(b - a)


def test_theta_sql_surface(spark, events):
    from hyperloglog_spark.setops import (
        register_theta_sql_functions,
        theta_sketch_agg,
    )

    register_theta_sql_functions(spark)
    theta_sketch_agg(events, "user_id", group_by="event_type", k=4096) \
        .createOrReplaceTempView("theta_by_type")
    got = spark.sql("""
        SELECT theta_estimate(theta_intersect(a.sketch, b.sketch)) AS n
        FROM theta_by_type a, theta_by_type b
        WHERE a.event_type = 'view' AND b.event_type = 'error'
    """).collect()[0]["n"]
    a = {r[0] for r in
         events.filter("event_type = 'view'").select("user_id").collect()}
    b = {r[0] for r in
         events.filter("event_type = 'error'").select("user_id").collect()}
    assert got == len(a & b)


def test_theta_md5_mode_matches_sql_hash(spark, events):
    """md5-mode DataFrame estimate == DuckDB replay of the same
    arithmetic — the driver-gate oracle contract."""
    import duckdb

    from hyperloglog_spark.setops import theta_distinct

    got = theta_distinct(events, "user_id", k=8, hashing="md5") \
        .collect()[0][0]
    want = duckdb.sql("""
        WITH h AS (
          SELECT DISTINCT ('0x' || substr(md5(concat(CAST(user_id AS VARCHAR), '#', '0')), 1, 15))::BIGINT AS hk
          FROM '/root/testdata/sf0.001/events.parquet'
        ), topk AS (SELECT hk FROM h ORDER BY hk LIMIT 8),
        th AS (SELECT hk AS tk FROM h ORDER BY hk LIMIT 1 OFFSET 8),
        s AS (SELECT count(*) AS cnt FROM topk)
        SELECT CASE WHEN (SELECT count(*) FROM th) = 0 THEN (SELECT cnt FROM s)
               ELSE CAST(floor((SELECT cnt FROM s) /
                    (CAST((SELECT tk FROM th) AS DOUBLE) / 1152921504606846976.0)) AS BIGINT)
               END AS est
    """).fetchone()[0]
    assert got == want
