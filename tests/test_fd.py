"""Frequent Directions: exact-regime equality, PSD certificate, merge law."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hyperloglog_spark.linalg import fd_agg, fd_build, fd_gram_long
from hyperloglog_spark.sketch import fd

EMB = "/root/testdata/sf0.01/embeddings.parquet"

GRID = "transform(embedding, x -> floor(cast(x as double) * 100))"


def _rand(n, d, seed=0):
    return np.random.default_rng(seed).standard_normal((n, d))


# ------------------------------------------------------------------- kernel


def test_exact_regime_is_bit_exact_on_integer_grid():
    mat = np.floor(_rand(50, 8, seed=1) * 100)
    sk = fd.append(fd.empty(ell=64), mat)
    _, _, n, delta, fro2 = fd.params(sk)
    assert delta == 0.0 and n == 50
    assert fro2 == float((mat * mat).sum())
    assert np.array_equal(fd.gram(sk), mat.T @ mat)


def test_psd_certificate_under_shrinkage():
    mat = _rand(400, 16, seed=2)
    sk = fd.append(fd.empty(ell=8), mat)
    ell, _, n, delta, fro2 = fd.params(sk)
    assert n <= 2 * 8
    assert delta > 0
    err = mat.T @ mat - fd.gram(sk)
    ev = np.linalg.eigvalsh(err)
    assert ev.min() >= -1e-8                    # A^T A - B^T B is PSD
    assert ev.max() <= delta + 1e-8             # ...and bounded by delta_sum
    assert delta <= 2 * fro2 / 8 + 1e-8         # FD guarantee (loose form)


def test_merge_certificate_and_exact_regime_merge():
    a, b = np.floor(_rand(30, 6, seed=3) * 50), np.floor(_rand(25, 6, seed=4) * 50)
    ska = fd.append(fd.empty(ell=64), a)
    skb = fd.append(fd.empty(ell=64), b)
    merged = fd.merge_many([ska, skb])
    both = np.vstack([a, b])
    # 55 rows <= 2*ell: merge stays exact, integer grid -> bit-exact gram
    assert np.array_equal(fd.gram(merged), both.T @ both)
    # shrinking merge keeps the certificate
    sk1 = fd.append(fd.empty(ell=8), _rand(200, 16, seed=5))
    sk2 = fd.append(fd.empty(ell=8), _rand(300, 16, seed=6))
    m = fd.merge_many([sk1, sk2])
    allm = np.vstack([_rand(200, 16, seed=5), _rand(300, 16, seed=6)])
    _, _, _, delta, _ = fd.params(m)
    ev = np.linalg.eigvalsh(allm.T @ allm - fd.gram(m))
    assert ev.min() >= -1e-8 and ev.max() <= delta + 1e-8


def test_param_validation():
    with pytest.raises(ValueError):
        fd.empty(0)
    with pytest.raises(ValueError, match="cannot merge"):
        fd.merge_many([fd.empty(8), fd.empty(9)])
    with pytest.raises(ValueError, match="dim mismatch"):
        fd.append(fd.append(fd.empty(8), _rand(2, 4)), _rand(2, 5))


# -------------------------------------------------------------- Spark layer


def test_fd_build_exact_regime_matches_numpy(spark):
    emb = spark.read.parquet(EMB).filter(F.col("vec_id") < 100)
    grid = emb.select(F.expr(GRID).alias("vec"))
    sk = fd_build(grid, "vec", ell=128)
    mat = np.floor(np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64) * 100)
    # 100 rows <= 2*128: no shrink anywhere (incl. merges), integer grid
    assert np.array_equal(fd.gram(sk), mat.T @ mat)
    _, _, _, delta, _ = fd.params(sk)
    assert delta == 0.0
    # gram is partitioning-invariant in the exact regime
    sk2 = fd_build(grid.repartition(17), "vec", ell=128)
    assert np.array_equal(fd.gram(sk), fd.gram(sk2))


def test_fd_build_shrunk_certificate_on_real_embeddings(spark):
    emb = spark.read.parquet(EMB)
    sk = fd_build(emb.select("embedding"), "embedding", ell=16)
    mat = np.array([r["embedding"] for r in emb.select("embedding").collect()],
                   dtype=np.float64)
    _, _, n, delta, fro2 = fd.params(sk)
    assert n <= 32 and delta > 0
    assert abs(fro2 - (mat * mat).sum()) < 1e-6 * fro2
    ev = np.linalg.eigvalsh(mat.T @ mat - fd.gram(sk))
    assert ev.min() >= -1e-6 and ev.max() <= delta + 1e-6


def test_fd_agg_grouped_merges_to_global_exact_regime(spark):
    emb = spark.read.parquet(EMB).filter(F.col("vec_id") < 120)
    grid = emb.select(F.col("label"), F.expr(GRID).alias("vec"))
    per = fd_agg(grid, "vec", group_by="label", ell=128).collect()
    merged = fd.merge_many([r["sketch"] for r in per])
    direct = fd_build(grid, "vec", ell=128)
    assert np.array_equal(fd.gram(merged), fd.gram(direct))


def test_fd_gram_long_shape(spark):
    emb = spark.read.parquet(EMB).filter(F.col("vec_id") < 10)
    sk = fd_build(emb.select("embedding"), "embedding", ell=32)
    out = fd_gram_long(spark, sk, dims=4).collect()
    assert len(out) == 10  # 4*5/2 upper-triangular entries
    assert {(r["i"], r["j"]) for r in out} == {
        (i, j) for i in range(4) for j in range(i, 4)
    }


def test_principal_components_exact_regime_and_certificate(spark):
    from hyperloglog_spark.linalg import fd_build, principal_components

    emb = spark.read.parquet(EMB).filter(F.col("vec_id") < 100)
    sk = fd_build(emb.select("embedding"), "embedding", ell=128)
    vals, comps = principal_components(sk, 5)
    mat = np.array([r["embedding"] for r in emb.select("embedding").collect()],
                   dtype=np.float64)
    true_vals = np.sort(np.linalg.eigvalsh(mat.T @ mat))[::-1][:5]
    # exact regime: spectrum matches numpy exactly (same Gram matrix)
    assert np.allclose(vals, true_vals, rtol=1e-10)
    assert comps.shape == (5, 64)
    # shrunk sketch: Weyl bound |lam_est - lam_true| <= delta_sum
    sk2 = fd_build(spark.read.parquet(EMB).select("embedding"),
                   "embedding", ell=16)
    from hyperloglog_spark.sketch import fd as fdk
    _, _, _, delta, _ = fdk.params(sk2)
    v2, _ = principal_components(sk2, 3)
    full = np.array([r["embedding"] for r in
                     spark.read.parquet(EMB).select("embedding").collect()],
                    dtype=np.float64)
    tv = np.sort(np.linalg.eigvalsh(full.T @ full))[::-1][:3]
    assert np.all(np.abs(v2 - tv) <= delta + 1e-6)
