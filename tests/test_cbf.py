"""Counting Bloom filter: deletion, group-merge laws, probe guarantees."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hyperloglog_spark.membership import (
    cbf_agg,
    cbf_build,
    with_cbf_might_contain,
)
from hyperloglog_spark.sketch import cbf

RNG = np.random.default_rng(7)


def _h(n, seed=0):
    return np.random.default_rng(seed).integers(
        0, 2**63, size=n, dtype=np.int64
    ).astype(np.uint64)


# ------------------------------------------------------------------- kernel


def test_insert_then_delete_is_empty():
    h = _h(500)
    sk = cbf.from_hashes(h, np.ones(500, dtype=np.int64), log2_m=10, k=4)
    sk = cbf.update(sk, h, -np.ones(500, dtype=np.int64))
    assert not cbf.counters(sk).any()
    m, k, net = cbf.params(sk)
    assert net == 0


def test_merge_is_commutative_group():
    h = _h(300)
    ins = cbf.from_hashes(h, np.ones(300, dtype=np.int64), log2_m=9, k=3)
    dele = cbf.from_hashes(h[:100], -np.ones(100, dtype=np.int64),
                           log2_m=9, k=3)
    extra = cbf.from_hashes(_h(50, seed=1), np.ones(50, dtype=np.int64),
                            log2_m=9, k=3)
    # any order, any bracketing -> identical bytes
    a = cbf.merge_many([ins, dele, extra])
    b = cbf.merge_many([extra, cbf.merge_many([dele, ins])])
    assert a == b
    # delete-only partial is legitimately negative pre-merge
    assert cbf.counters(dele).min() < 0
    # ...but the merged filter validates
    cbf.validate(a)


def test_no_false_negatives_after_deletion():
    kept, dropped = _h(400, seed=2), _h(400, seed=3)
    allh = np.concatenate([kept, dropped])
    sk = cbf.from_hashes(allh, np.ones(800, dtype=np.int64), log2_m=13, k=4)
    sk = cbf.update(sk, dropped, -np.ones(400, dtype=np.int64))
    assert cbf.might_contain(sk, kept).all()


def test_overdelete_raises_at_probe():
    h = _h(10)
    sk = cbf.from_hashes(h, np.ones(10, dtype=np.int64), log2_m=8, k=2)
    sk = cbf.update(sk, h[:3], -2 * np.ones(3, dtype=np.int64))
    with pytest.raises(ValueError, match="negative counters"):
        cbf.might_contain(sk, h)


def test_param_mismatch_and_bad_params_raise():
    a = cbf.empty(8, 2)
    b = cbf.empty(9, 2)
    with pytest.raises(ValueError, match="cannot merge"):
        cbf.merge_many([a, b])
    with pytest.raises(ValueError):
        cbf.empty(2, 2)
    with pytest.raises(ValueError):
        cbf.empty(8, 0)


# -------------------------------------------------------------- Spark layer


def test_spark_build_probe_and_partition_invariance(spark):
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    ins = orders.select(F.col("o_custkey").alias("key"),
                        F.lit(1).alias("d"))
    dele = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("key"), F.lit(-1).alias("d"))
    upd = ins.unionByName(dele)
    sk = cbf_build(upd, "key", delta_col="d", log2_m=15, k=4)
    sk2 = cbf_build(upd.repartition(13), "key", delta_col="d",
                    log2_m=15, k=4)
    assert sk == sk2  # vector addition: partitioning never changes bytes

    cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    probed = {
        r["c_custkey"]: r["has_open"]
        for r in with_cbf_might_contain(
            cust, "c_custkey", sk, alias="has_open"
        ).select("c_custkey", "has_open").collect()
    }
    # exact truth: custkeys with at least one non-F order
    truth = {
        r["o_custkey"]
        for r in orders.filter(F.col("o_orderstatus") != "F")
        .select("o_custkey").distinct().collect()
    }
    # no false negatives
    assert all(probed[k] for k in truth if k in probed)
    fp = sum(1 for k, v in probed.items() if v and k not in truth)
    assert fp / max(len(probed), 1) < 0.05


def test_cbf_agg_grouped_merges_to_global(spark):
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    upd = orders.select(F.col("o_custkey").alias("key"),
                        F.lit(1).alias("d"),
                        F.col("o_orderpriority").alias("g"))
    per_group = cbf_agg(upd, "key", group_by="g", delta_col="d",
                        log2_m=12, k=3).collect()
    merged = cbf.merge_many([r["sketch"] for r in per_group])
    direct = cbf_build(upd, "key", delta_col="d", log2_m=12, k=3)
    assert merged == direct
