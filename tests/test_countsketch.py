"""Count sketch (signed, Charikar et al. 2002) + CMS inner product.

Kernel laws (merge associativity/commutativity via byte identity, exact
point queries below saturation, F2 accuracy), Spark partition invariance,
and the md5-mode ANSI-SQL replay that backs the driver-gate oracles."""

from __future__ import annotations

import numpy as np
import pytest

from hyperloglog_spark.sketch import cms, countsketch as cs
from hyperloglog_spark.sketch.hashing import mix64


def _hashes(n: int, n_distinct: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, n_distinct, size=n).astype(np.uint64)
    return mix64(vals), vals


class TestCountSketchKernel:
    def test_merge_is_order_independent_and_matches_direct(self):
        h, _ = _hashes(30_000, 700)
        direct = cs.from_hashes(h)
        parts = [cs.from_hashes(h[i::5]) for i in range(5)]
        assert cs.merge_many(parts) == direct
        assert cs.merge_many(parts[::-1]) == direct
        # rebracketed
        left = cs.merge_many(parts[:2])
        right = cs.merge_many(parts[2:])
        assert cs.merge_many([left, right]) == direct

    def test_point_query_exact_when_unsaturated(self):
        # 700 distinct in w=32768: some collisions per row, but the median
        # over 5 rows repairs every one of them at this density
        h, vals = _hashes(30_000, 700)
        sk = cs.from_hashes(h)
        u, c = np.unique(vals, return_counts=True)
        est = cs.point_query(sk, mix64(u))
        assert (est == c).all()

    def test_point_query_is_unbiased_under_saturation(self):
        # cram 60k distinct into w=256: heavy collisions; the signed design
        # keeps the estimator centred (CMS would only inflate)
        h, vals = _hashes(120_000, 60_000, seed=3)
        sk = cs.from_hashes(h, d=5, log2_w=8)
        u, c = np.unique(vals, return_counts=True)
        est = cs.point_query(sk, mix64(u)).astype(np.float64)
        bias = float((est - c).mean())
        assert abs(bias) < 1.0          # mean error ~0; CMS-style would be ~n/w ~ 470

    def test_f2_estimate_within_bound(self):
        h, vals = _hashes(50_000, 900, seed=11)
        sk = cs.from_hashes(h)
        _, c = np.unique(vals, return_counts=True)
        f2 = int((c.astype(object) ** 2).sum())
        est = cs.f2_estimate(sk)
        assert abs(est - f2) <= cs.f2_relative_error(sk) * f2

    def test_f2_exact_in_collision_free_regime(self):
        # 5 distinct values in w=32768: no per-row collisions -> every row
        # sum equals F2 exactly, so the median does too
        h, vals = _hashes(10_000, 5, seed=2)
        sk = cs.from_hashes(h)
        _, c = np.unique(vals, return_counts=True)
        assert cs.f2_estimate(sk) == int((c ** 2).sum())

    def test_weighted_counts(self):
        h = mix64(np.arange(10, dtype=np.uint64))
        w = np.arange(1, 11, dtype=np.int64)
        sk = cs.from_hashes(h, counts=w)
        assert (cs.point_query(sk, h) == w).all()
        _, _, n = cs.params(sk)
        assert n == int(w.sum())

    def test_sparse_dense_roundtrip_and_mode_boundary(self):
        h, _ = _hashes(200, 200)
        small = cs.from_hashes(h)           # sparse payload
        big = cs.from_hashes(_hashes(100_000, 90_000, seed=5)[0])  # dense
        for sk in (small, big):
            assert (cs.table(cs.merge_many([sk])) == cs.table(sk)).all()

    def test_shape_mismatch_rejected(self):
        a = cs.from_hashes(mix64(np.arange(5, dtype=np.uint64)), d=5, log2_w=10)
        b = cs.from_hashes(mix64(np.arange(5, dtype=np.uint64)), d=3, log2_w=10)
        with pytest.raises(ValueError, match="different shape"):
            cs.merge_many([a, b])

    def test_param_validation(self):
        with pytest.raises(ValueError):
            cs.empty(d=0)
        with pytest.raises(ValueError):
            cs.empty(log2_w=30)


class TestCmsInnerProduct:
    def test_join_size_overestimates_within_bound(self):
        rng = np.random.default_rng(13)
        a_vals = rng.integers(0, 2_000, size=40_000).astype(np.uint64)
        b_vals = rng.integers(0, 2_000, size=9_000).astype(np.uint64)
        a = cms.from_hashes(mix64(a_vals))
        b = cms.from_hashes(mix64(b_vals))
        ua, ca = np.unique(a_vals, return_counts=True)
        ub, cb = np.unique(b_vals, return_counts=True)
        common, ia, ib = np.intersect1d(ua, ub, return_indices=True)
        exact = int((ca[ia].astype(object) * cb[ib].astype(object)).sum())
        est = cms.inner_product(a, b)
        eps, _ = cms.error_bound(a)
        assert exact <= est <= exact + eps * len(a_vals) * len(b_vals)

    def test_shape_mismatch_rejected(self):
        a = cms.from_hashes(mix64(np.arange(5, dtype=np.uint64)), log2_w=10)
        b = cms.from_hashes(mix64(np.arange(5, dtype=np.uint64)), log2_w=12)
        with pytest.raises(ValueError, match="different shape"):
            cms.inner_product(a, b)


@pytest.fixture(scope="module")
def events(spark, sf001_dir):
    return spark.read.parquet(f"{sf001_dir}/events.parquet")


class TestCountSketchSpark:
    def test_partition_invariance(self, spark, events):
        from hyperloglog_spark import countsketch_f2

        base = countsketch_f2(events, "event_type").collect()[0]
        re = countsketch_f2(events.repartition(16, "user_id"),
                            "event_type").collect()[0]
        assert base.asDict() == re.asDict()

    def test_grouped_f2_matches_exact_sql(self, spark, events):
        # exact regime: event_type space tiny vs w
        from hyperloglog_spark import countsketch_f2

        got = {
            r["event_type"]: (r["f2_est"], r["n_total"])
            for r in countsketch_f2(
                events, "user_id", group_by="event_type", log2_w=20
            ).collect()
        }
        events.createOrReplaceTempView("ev_cs")
        exact = {
            r["event_type"]: (r["f2"], r["n"])
            for r in spark.sql(
                "SELECT event_type, sum(c * c) AS f2, sum(c) AS n FROM ("
                "  SELECT event_type, user_id, count(*) AS c FROM ev_cs"
                "  WHERE user_id IS NOT NULL GROUP BY event_type, user_id"
                ") GROUP BY event_type"
            ).collect()
        }
        # w=2^20 >> distinct users: every group lands collision-free
        assert got == exact

    def test_md5_mode_replays_in_duckdb(self, spark, events):
        import duckdb

        from hyperloglog_spark import countsketch_f2

        got = countsketch_f2(events, "event_type", hashing="md5").collect()[0]
        pdf = events.select("event_type").toPandas()
        mirror = duckdb.sql("""
WITH h AS (
  SELECT ('0x' || substr(md5(concat(CAST(event_type AS VARCHAR), '#', '0')), 1, 15))::BIGINT AS hv,
         count(*) AS cnt
  FROM pdf WHERE event_type IS NOT NULL GROUP BY event_type
), g AS (
  SELECT t.j, (h.hv + t.j * ((h.hv >> 32) | 1)) AS gj, h.cnt FROM h, range(5) t(j)
), counters AS (
  SELECT j, gj & 32767 AS pos,
         sum(CASE WHEN (gj >> 15) & 1 = 1 THEN cnt ELSE -cnt END) AS c
  FROM g GROUP BY j, pos
), rowsums AS (
  SELECT j, CAST(sum(c * c) AS BIGINT) AS s FROM counters GROUP BY j
)
SELECT s FROM rowsums ORDER BY s LIMIT 1 OFFSET 2
""").fetchall()
        assert got["f2_est"] == mirror[0][0]

    def test_point_query_udf(self, spark, events):
        from pyspark.sql import functions as F

        from hyperloglog_spark import countsketch_agg, cs_point_query_udf

        sk = countsketch_agg(events, "event_type").collect()[0]["sketch"]
        out = (
            events.groupBy("event_type").count()
            .withColumn("est", cs_point_query_udf(sk)(
                F.xxhash64("event_type")))
            .collect()
        )
        for r in out:
            assert r["est"] == r["count"]


class TestCmsJoinSizeSpark:
    def test_join_size_bounds_exact(self, spark, sf001_dir):
        from hyperloglog_spark import cms_join_size

        orders = spark.read.parquet(f"{sf001_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf001_dir}/customer.parquet")
        row = cms_join_size(orders, "o_custkey", customer, "c_custkey") \
            .collect()[0]
        exact = orders.join(
            customer, orders.o_custkey == customer.c_custkey).count()
        assert exact <= row["est_join_size"] <= exact + row["eps_n_a_n_b"]
        assert row["n_a"] == orders.count()
        assert row["n_b"] == customer.count()
