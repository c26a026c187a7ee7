"""Kernel + Spark tests for KLL and t-digest quantile sketches
(SURVEY.md §2.4, §5.2 layer 8): rank-error bounds vs exact, determinism,
order-independent merges, cross-check between the two backends."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hyperloglog_spark.quantiles import approx_quantiles, kll_agg
from hyperloglog_spark.sketch import kll, tdigest

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_of(sorted_vals: np.ndarray, v: float) -> float:
    return np.searchsorted(sorted_vals, v, side="right") / len(sorted_vals)


def _max_rank_err(module, sketch: bytes, values: np.ndarray) -> float:
    sv = np.sort(values)
    est = module.quantiles(sketch, QS)
    return max(abs(_rank_of(sv, v) - q) for q, v in zip(QS, est))


@pytest.mark.parametrize("module,tol", [(kll, 0.025), (tdigest, 0.02)])
class TestQuantileKernels:
    def test_rank_error_uniform(self, module, tol):
        vals = np.random.default_rng(1).uniform(0, 1000, 100_000)
        sk = module.from_values(vals)
        assert _max_rank_err(module, sk, vals) <= tol

    def test_rank_error_lognormal(self, module, tol):
        vals = np.random.default_rng(2).lognormal(4.0, 0.8, 100_000)
        sk = module.from_values(vals)
        assert _max_rank_err(module, sk, vals) <= tol

    def test_merge_preserves_accuracy(self, module, tol):
        rng = np.random.default_rng(3)
        chunks = [rng.normal(50, 10, 20_000) for _ in range(8)]
        merged = module.merge_many([module.from_values(c) for c in chunks])
        allv = np.concatenate(chunks)
        assert _max_rank_err(module, merged, allv) <= 2 * tol
        assert module.n_items(merged) == len(allv)

    def test_shuffled_merge_byte_identical(self, module, tol):
        parts = [module.from_values(
            np.random.default_rng(10 + i).normal(0, 1, 5_000)) for i in range(6)]
        base = module.merge_many(parts)
        rng = np.random.default_rng(0)
        for _ in range(4):
            order = rng.permutation(6)
            assert module.merge_many([parts[i] for i in order]) == base

    def test_min_max_exact(self, module, tol):
        vals = np.random.default_rng(4).uniform(-5, 5, 10_000)
        sk = module.from_values(vals)
        q = module.quantiles(sk, [0.0, 1.0])
        assert q[0] == vals.min() and q[1] == vals.max()

    def test_small_n_exact(self, module, tol):
        vals = np.array([3.0, 1.0, 2.0])
        sk = module.from_values(vals)
        assert module.quantiles(sk, [0.5])[0] == pytest.approx(2.0, abs=1.0)
        assert module.n_items(sk) == 3

    def test_empty_and_nan(self, module, tol):
        sk = module.from_values(np.array([np.nan, np.nan]))
        assert module.n_items(sk) == 0
        assert np.isnan(module.quantiles(sk, [0.5])[0])

    def test_deterministic_rebuild(self, module, tol):
        vals = np.random.default_rng(5).normal(0, 1, 30_000)
        assert module.from_values(vals) == module.from_values(vals)

    def test_incremental_update(self, module, tol):
        rng = np.random.default_rng(6)
        a, b = rng.uniform(0, 1, 10_000), rng.uniform(0, 1, 10_000)
        sk = module.update(module.from_values(a), b)
        assert module.n_items(sk) == 20_000
        assert _max_rank_err(module, sk, np.concatenate([a, b])) <= 2 * tol


class TestKllVsTdigestCross:
    def test_backends_agree(self):
        vals = np.random.default_rng(7).lognormal(4, 0.8, 50_000)
        k_est = kll.quantiles(kll.from_values(vals), [0.5, 0.9])
        t_est = tdigest.quantiles(tdigest.from_values(vals), [0.5, 0.9])
        for a, b in zip(k_est, t_est):
            assert abs(a - b) / b < 0.05


class TestQuantileSpark:
    @pytest.fixture(scope="class")
    def lineitem(self, spark, sf01_dir):
        return spark.read.parquet(f"{sf01_dir}/lineitem.parquet").cache()

    @pytest.mark.parametrize("method", ["kll", "tdigest"])
    def test_vs_exact_percentile(self, lineitem, method):
        got = approx_quantiles(
            lineitem, "l_extendedprice", [0.5, 0.9, 0.99], method=method
        ).collect()[0]
        exact = lineitem.select(
            F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
        ).collect()[0][0]
        vals = np.sort(
            np.array([r[0] for r in lineitem.select("l_extendedprice").collect()])
        )
        for est, q in zip([got["q5"], got["q9"], got["q99"]], [0.5, 0.9, 0.99]):
            assert abs(_rank_of(vals, est) - q) <= 0.03, (method, q, est, exact)

    def test_grouped_quantiles(self, lineitem):
        out = approx_quantiles(
            lineitem, "l_quantity", [0.5], group_by="l_returnflag"
        ).collect()
        assert len(out) == 3
        for r in out:
            assert 20 <= r["q5"] <= 30  # quantity is uniform 1..50

    def test_sketch_column_mergeable(self, lineitem):
        per_flag = kll_agg(lineitem, "l_extendedprice", group_by="l_returnflag")
        merged = kll.merge_many([r["sketch"] for r in per_flag.collect()])
        assert kll.n_items(merged) == lineitem.count()

    def test_deterministic_across_partitioning(self, lineitem):
        """Same rows, different partitioning: estimates stay within the
        sketch's rank-error bound of each other (exact byte equality is not
        expected — partial sketches differ — but answers must be stable)."""
        a = approx_quantiles(lineitem.repartition(2), "l_extendedprice", [0.5]
                             ).collect()[0]["q5"]
        b = approx_quantiles(lineitem.repartition(16), "l_extendedprice", [0.5]
                             ).collect()[0]["q5"]
        vals = np.sort(np.array(
            [r[0] for r in lineitem.select("l_extendedprice").collect()]))
        assert abs(_rank_of(vals, a) - _rank_of(vals, b)) <= 0.03


class TestWeightedTDigest:
    def test_unit_weights_match_plain_build(self):
        from hyperloglog_spark.sketch import tdigest

        rng = np.random.default_rng(11)
        vals = rng.standard_normal(5000)
        a = tdigest.from_values(vals)
        b = tdigest.from_weighted(vals, np.ones(len(vals)))
        assert a == b  # identical compress path, byte-identical

    def test_weighted_equals_exploded_rows_rank(self):
        """Integer weights == repeating the row that many times, up to
        t-digest rank accuracy: exact weighted rank of each estimate must
        sit within q +/- 2% (delta=100)."""
        from hyperloglog_spark.sketch import tdigest

        rng = np.random.default_rng(13)
        vals = rng.standard_normal(2000)
        w = rng.integers(1, 50, size=2000).astype(np.float64)
        sk = tdigest.from_weighted(vals, w)
        order = np.argsort(vals)
        sv, sw = vals[order], w[order]
        cum = np.cumsum(sw)
        total = cum[-1]
        for q in (0.1, 0.25, 0.5, 0.75, 0.9):
            est = float(tdigest.quantiles(sk, [q])[0])
            # exact weighted rank of est
            rank = cum[np.searchsorted(sv, est, side="right") - 1] / total \
                if est >= sv[0] else 0.0
            assert abs(rank - q) <= 0.02, (q, est, rank)

    def test_zero_and_nan_weights_dropped(self):
        from hyperloglog_spark.sketch import tdigest

        sk = tdigest.from_weighted(
            np.array([1.0, 2.0, np.nan, 4.0]),
            np.array([1.0, 0.0, 3.0, np.nan]),
        )
        assert tdigest.n_items(sk) == 1
        assert float(tdigest.quantiles(sk, [0.5])[0]) == 1.0

    def test_spark_weighted_quantiles(self, spark):
        from hyperloglog_spark import approx_quantiles_weighted

        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        out = approx_quantiles_weighted(
            li, "l_extendedprice", "l_quantity", [0.25, 0.5, 0.75]
        ).collect()[0]
        rows = li.select("l_extendedprice", "l_quantity").collect()
        vals = np.array([r[0] for r in rows], dtype=np.float64)
        ws = np.array([float(r[1]) for r in rows])
        order = np.argsort(vals)
        sv, cum = vals[order], np.cumsum(ws[order])
        total = cum[-1]
        for q, name in ((0.25, "q25"), (0.5, "q5"), (0.75, "q75")):
            est = out[name]
            rank = cum[np.searchsorted(sv, est, side="right") - 1] / total
            assert abs(rank - q) <= 0.02, (q, est, rank)

    def test_grouped_weighted(self, spark):
        from hyperloglog_spark import approx_quantiles_weighted

        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        out = approx_quantiles_weighted(
            li, "l_extendedprice", "l_quantity", [0.5],
            group_by="l_returnflag",
        ).collect()
        assert len(out) == li.select("l_returnflag").distinct().count()
        assert all(r["q5"] is not None for r in out)


class TestWeightedKll:
    """Weighted KLL (binary-decomposition placement): the KLL mirror of the
    weighted t-digest contract — unit weights byte-identical to the plain
    build, integer weights equivalent to exploded rows (exactly in the
    no-compaction regime, within rank error beyond), deterministic."""

    def test_unit_weights_match_plain_build(self):
        from hyperloglog_spark.sketch import kll

        rng = np.random.default_rng(11)
        vals = rng.standard_normal(5000)
        assert kll.from_weighted(vals, np.ones(5000)) == kll.from_values(vals)

    def test_exact_regime_equals_exploded(self):
        """Below compaction thresholds both paths are exact, so every
        quantile matches the exploded build exactly."""
        from hyperloglog_spark.sketch import kll

        vals = np.array([1.0, 5.0, 2.0, 9.0])
        w = np.array([3.0, 1.0, 4.0, 2.0])
        wsk = kll.from_weighted(vals, w)
        esk = kll.from_values(np.repeat(vals, w.astype(int)))
        assert kll.n_items(wsk) == 10
        qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
        assert np.array_equal(kll.quantiles(wsk, qs), kll.quantiles(esk, qs))

    def test_weighted_equals_exploded_rows_rank(self):
        from hyperloglog_spark.sketch import kll

        rng = np.random.default_rng(13)
        vals = rng.standard_normal(2000)
        w = rng.integers(1, 50, size=2000).astype(np.float64)
        sk = kll.from_weighted(vals, w)
        order = np.argsort(vals)
        sv, sw = vals[order], w[order]
        cum = np.cumsum(sw)
        total = cum[-1]
        for q in (0.1, 0.25, 0.5, 0.75, 0.9):
            est = float(kll.quantiles(sk, [q])[0])
            rank = cum[np.searchsorted(sv, est, side="right") - 1] / total \
                if est >= sv[0] else 0.0
            assert abs(rank - q) <= 0.03, (q, est, rank)

    def test_deterministic_and_merges_with_unweighted(self):
        from hyperloglog_spark.sketch import kll

        rng = np.random.default_rng(17)
        vals = rng.standard_normal(3000)
        w = rng.integers(1, 20, size=3000).astype(np.float64)
        assert kll.from_weighted(vals, w) == kll.from_weighted(vals, w)
        merged = kll.merge_many(
            [kll.from_weighted(vals, w), kll.from_values(vals)]
        )
        assert kll.n_items(merged) == int(w.sum()) + 3000

    def test_non_integer_weight_raises(self):
        from hyperloglog_spark.sketch import kll

        with pytest.raises(ValueError, match="integer"):
            kll.from_weighted(np.array([1.0]), np.array([1.5]))

    def test_zero_and_nan_weights_dropped(self):
        from hyperloglog_spark.sketch import kll

        sk = kll.from_weighted(
            np.array([1.0, 2.0, np.nan, 4.0]),
            np.array([1.0, 0.0, 3.0, np.nan]),
        )
        assert kll.n_items(sk) == 1
        assert float(kll.quantiles(sk, [0.5])[0]) == 1.0

    def test_spark_weighted_kll(self, spark):
        from hyperloglog_spark import approx_quantiles_weighted

        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        out = approx_quantiles_weighted(
            li, "l_extendedprice", "l_quantity", [0.25, 0.5, 0.75],
            method="kll",
        ).collect()[0]
        rows = li.select("l_extendedprice", "l_quantity").collect()
        vals = np.array([r[0] for r in rows], dtype=np.float64)
        ws = np.array([float(r[1]) for r in rows])
        order = np.argsort(vals)
        sv, cum = vals[order], np.cumsum(ws[order])
        total = cum[-1]
        for q, name in ((0.25, "q25"), (0.5, "q5"), (0.75, "q75")):
            est = out[name]
            rank = cum[np.searchsorted(sv, est, side="right") - 1] / total
            assert abs(rank - q) <= 0.03, (q, est, rank)

    def test_spark_grouped_weighted_kll(self, spark):
        from hyperloglog_spark import approx_quantiles_weighted

        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        out = approx_quantiles_weighted(
            li, "l_extendedprice", "l_quantity", [0.5],
            group_by="l_returnflag", method="kll",
        ).collect()
        assert len(out) == li.select("l_returnflag").distinct().count()
        assert all(r["q5"] is not None for r in out)


class TestApproxRank:
    """approx_rank: the CDF companion surface (fraction of rows <= v)."""

    def test_exact_regime_bit_exact(self, spark):
        from hyperloglog_spark import approx_rank

        rows = [(float(i),) for i in range(150)]
        df = spark.createDataFrame(rows, ["x"])
        out = approx_rank(df, "x", [10.0, 74.5, 149.0, -1.0]).collect()[0]
        assert out["r10"] == 11 / 150        # x <= 10 -> 0..10
        assert out["r74_5"] == 75 / 150
        assert out["r149"] == 1.0
        assert out["rm1"] == 0.0

    def test_estimation_regime_within_bound(self, spark):
        from hyperloglog_spark import approx_rank

        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        n = li.count()
        for probe in (20_000.0, 50_000.0, 80_000.0):
            est = approx_rank(li, "l_extendedprice", [probe]).collect()[0][0]
            exact = li.filter(F.col("l_extendedprice") <= probe).count() / n
            assert abs(est - exact) <= 0.05, (probe, est, exact)

    def test_grouped(self, spark):
        from hyperloglog_spark import approx_rank

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        out = approx_rank(ev, "value", [0.0], group_by="event_type").collect()
        assert len(out) == 5
        for r in out:
            assert 0.0 <= r["r0"] <= 1.0

    def test_empty_probe_raises(self, spark):
        from hyperloglog_spark import approx_rank

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        with pytest.raises(ValueError, match="probe"):
            approx_rank(ev, "value", [])


class TestBoundedQuantiles:
    """bounds=True: q_lo/q_hi columns at ranks q -/+ eps (whp bound)."""

    def test_bounds_cover_exact_quantile(self, spark):
        from hyperloglog_spark import approx_quantiles

        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        out = approx_quantiles(
            li, "l_extendedprice", [0.25, 0.5, 0.9], bounds=True
        ).collect()[0]
        vals = np.sort(np.array(
            [r[0] for r in li.select("l_extendedprice").collect()]))
        n = len(vals)
        for q, name in ((0.25, "q25"), (0.5, "q5"), (0.9, "q9")):
            exact = vals[min(int(np.ceil(q * n)) - 1, n - 1)]
            assert out[name + "_lo"] <= exact <= out[name + "_hi"], (
                q, out[name + "_lo"], exact, out[name + "_hi"])
            assert out[name + "_lo"] <= out[name] <= out[name + "_hi"]

    def test_column_order_and_grouped(self, spark):
        from hyperloglog_spark import approx_quantiles

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        df = approx_quantiles(ev, "value", [0.5], group_by="event_type",
                              bounds=True)
        assert df.columns == ["event_type", "q5_lo", "q5", "q5_hi"]
        assert df.count() == 5

    def test_tdigest_bounds_rejected(self, spark):
        from hyperloglog_spark import approx_quantiles

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        with pytest.raises(ValueError, match="bounds"):
            approx_quantiles(ev, "value", [0.5], method="tdigest",
                             bounds=True)


class TestTrimmedMean:
    """approx_trimmed_mean: robust mean by rank-interval overlap."""

    def test_exact_regime_matches_fractional_overlap_rule(self, spark):
        from hyperloglog_spark import approx_trimmed_mean

        cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
        got = approx_trimmed_mean(
            cust, "c_acctbal", 0.1, 0.9, k=65535
        ).collect()[0]["trimmed_mean"]
        vals = np.sort(np.array(
            [r[0] for r in cust.select("c_acctbal").collect()]))
        n = len(vals)
        p = np.arange(1, n + 1, dtype=np.float64)
        ov = np.clip(np.minimum(p, 0.9 * n) - np.maximum(p - 1, 0.1 * n),
                     0, None)
        want = (vals * ov).sum() / ov.sum()
        assert abs(got - want) < 1e-9, (got, want)

    def test_full_window_is_plain_mean(self, spark):
        from hyperloglog_spark import approx_trimmed_mean

        cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
        got = approx_trimmed_mean(
            cust, "c_acctbal", 0.0, 1.0, k=65535
        ).collect()[0]["trimmed_mean"]
        want = cust.agg(F.avg("c_acctbal")).collect()[0][0]
        assert abs(got - want) < 1e-9

    def test_estimation_regime_and_tdigest(self, spark):
        from hyperloglog_spark import approx_trimmed_mean

        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        vals = np.sort(np.array(
            [r[0] for r in li.select("l_extendedprice").collect()]))
        n = len(vals)
        p = np.arange(1, n + 1, dtype=np.float64)
        ov = np.clip(np.minimum(p, 0.9 * n) - np.maximum(p - 1, 0.1 * n),
                     0, None)
        exact = (vals * ov).sum() / ov.sum()
        for method in ("kll", "tdigest"):
            est = approx_trimmed_mean(
                li, "l_extendedprice", 0.1, 0.9, method=method
            ).collect()[0]["trimmed_mean"]
            assert abs(est - exact) / abs(exact) < 0.01, (method, est, exact)

    def test_grouped_and_bad_window(self, spark):
        from hyperloglog_spark import approx_trimmed_mean

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        out = approx_trimmed_mean(
            ev, "value", 0.25, 0.75, group_by="event_type").collect()
        assert len(out) == 5
        with pytest.raises(ValueError, match="q0"):
            approx_trimmed_mean(ev, "value", 0.9, 0.1)


class TestTDigestRank:
    """t-digest backend of approx_rank: centroid-midrank interpolation."""

    def test_kernel_accuracy_vs_exact_cdf(self):
        from hyperloglog_spark.sketch import tdigest

        rng = np.random.default_rng(11)
        vals = rng.standard_normal(5000)
        sk = tdigest.from_values(vals)
        sv = np.sort(vals)
        for v in np.linspace(-2.5, 2.5, 21):
            est = float(tdigest.rank(sk, [v])[0])
            exact = np.searchsorted(sv, v, side="right") / len(sv)
            assert abs(est - exact) < 0.006, (v, est, exact)
        assert float(tdigest.rank(sk, [sv[0] - 1])[0]) == 0.0
        assert float(tdigest.rank(sk, [sv[-1] + 1])[0]) == 1.0
        assert np.isnan(tdigest.rank(tdigest.empty(), [0.0])[0])

    def test_spark_method_tdigest(self, spark):
        from hyperloglog_spark import approx_rank

        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        n = li.count()
        for probe in (20_000.0, 50_000.0, 80_000.0):
            est = approx_rank(li, "l_extendedprice", [probe],
                              method="tdigest").collect()[0][0]
            exact = li.filter(
                F.col("l_extendedprice") <= probe).count() / n
            assert abs(est - exact) <= 0.01, (probe, est, exact)
