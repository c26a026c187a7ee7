"""Property-based tests (hypothesis) for the sketch kernels, plus
high-cardinality grouped aggregation stress (the sparse-sketch scale claim).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from hyperloglog_spark.sketch import bloom, cms, hll, kll, tdigest

u64_arrays = st.lists(
    st.integers(min_value=0, max_value=2 ** 64 - 1), min_size=0, max_size=300
).map(lambda xs: np.array(xs, dtype=np.uint64))


@st.composite
def hll_sketches(draw, p=10):
    vals = draw(u64_arrays)
    return hll.from_hashes(vals, p) if len(vals) else hll.empty(p)


@settings(max_examples=60, deadline=None)
@given(a=hll_sketches(), b=hll_sketches(), c=hll_sketches())
def test_hll_merge_monoid_laws(a, b, c):
    m = hll.merge
    # commutative + associative on REGISTERS (codec envelope may differ
    # sparse-vs-dense; registers are the semantic state)
    assert np.array_equal(hll.registers(m(a, b)), hll.registers(m(b, a)))
    assert np.array_equal(
        hll.registers(m(m(a, b), c)), hll.registers(m(a, m(b, c)))
    )
    assert np.array_equal(hll.registers(m(a, a)), hll.registers(a))  # idem
    # estimates from equal registers are equal
    assert hll.estimate(m(a, b)) == hll.estimate(m(b, a))


@settings(max_examples=40, deadline=None)
@given(vals=u64_arrays, splits=st.integers(min_value=1, max_value=7))
def test_hll_partition_invariance(vals, splits):
    """Any partitioning of the input merges to the same registers as a
    single-pass build — THE distributed-correctness property."""
    if len(vals) == 0:
        return
    whole = hll.from_hashes(vals, 10)
    chunks = np.array_split(vals, splits)
    parts = [hll.from_hashes(ch, 10) for ch in chunks if len(ch)]
    merged = hll.merge_many(parts)
    assert np.array_equal(hll.registers(whole), hll.registers(merged))


@settings(max_examples=40, deadline=None)
@given(vals=u64_arrays)
def test_cms_merge_is_counter_sum(vals):
    if len(vals) < 2:
        return
    half = len(vals) // 2
    a = cms.from_hashes(vals[:half])
    b = cms.from_hashes(vals[half:])
    merged = cms.merge_many([a, b])
    whole = cms.from_hashes(vals)
    q = np.unique(vals)
    assert np.array_equal(cms.point_query(merged, q), cms.point_query(whole, q))


@settings(max_examples=40, deadline=None)
@given(vals=u64_arrays)
def test_bloom_no_false_negatives_any_input(vals):
    f = bloom.from_hashes(vals)
    if len(vals):
        assert bool(np.all(bloom.might_contain(f, vals)))


@settings(max_examples=30, deadline=None)
@given(
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1, max_size=500,
    ).map(np.array),
    splits=st.integers(min_value=1, max_value=5),
)
def test_quantile_sketches_track_n_and_bounds(vals, splits):
    for mod in (kll, tdigest):
        parts = [
            mod.from_values(ch) for ch in np.array_split(vals, splits)
            if len(ch)
        ]
        merged = mod.merge_many(parts)
        assert mod.n_items(merged) == len(vals)
        lo, hi = mod.min_max(merged)
        assert lo == vals.min() and hi == vals.max()


# --------------------------------------------- high-cardinality grouped


def test_high_cardinality_grouped_sparse_shuffle(spark):
    """20k groups, ~7 rows each: phase-1 partial sketches must stay SPARSE
    (bytes ∝ observed cardinality, not 16 KB dense) — the property that
    keeps per-conv_id sketching viable at 10^12 turns."""
    from pyspark.sql import functions as F

    from hyperloglog_spark import approx_distinct
    from hyperloglog_spark.engine.aggregate import sketch_partials
    from hyperloglog_spark.functions import HllAggregator

    n = 150_000
    df = (
        spark.range(n)
        .withColumn("g", (F.col("id") % 20_000).cast("string"))
        .withColumn("v", F.col("id") % 37)
        .repartition(8)
    )
    partials = sketch_partials(df, ["v"], HllAggregator(), ["g"]).collect()
    sizes = np.array([len(r["sketch"]) for r in partials])
    assert sizes.max() < 200          # sparse: ~3B/register + header
    assert len(partials) <= 8 * 20_000

    out = {r["g"]: r["approx_distinct"]
           for r in approx_distinct(df, "v", group_by="g").collect()}
    assert len(out) == 20_000
    # v = id % 37 within each group of ~7-8 members: exact tiny counts
    exact = {r["g"]: r["n"] for r in
             df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()}
    assert out == exact               # LC regime: exact at these sizes


def test_skewed_group_bounded_partials(spark):
    """A 90%-hot key must not produce more partial rows or bigger sketches
    than any other key (map-side combine bounds skew by construction)."""
    from pyspark.sql import functions as F

    from hyperloglog_spark.engine.aggregate import sketch_partials
    from hyperloglog_spark.functions import HllAggregator

    df = (
        spark.range(100_000)
        .withColumn(
            "g", F.when(F.col("id") % 10 < 9, "hot").otherwise(
                (F.col("id") % 97).cast("string"))
        )
        .withColumn("v", F.col("id"))
        .repartition(8)
    )
    partials = sketch_partials(df, ["v"], HllAggregator(), ["g"]).collect()
    per_group = {}
    for r in partials:
        per_group.setdefault(r["g"], []).append(len(r["sketch"]))
    assert len(per_group["hot"]) <= 8          # ≤ one partial per partition
    # hot sketch is dense-capped at 16 KB + header, never larger
    assert max(per_group["hot"]) <= (1 << 14) + 16


@settings(max_examples=60, deadline=None)
@given(
    vals=u64_arrays,
    p_hi=st.integers(min_value=5, max_value=16),
    d=st.integers(min_value=1, max_value=8),
)
def test_fold_equals_direct_build_property(vals, p_hi, d):
    p_lo = max(4, p_hi - d)
    hi = hll.from_hashes(vals, p_hi) if len(vals) else hll.empty(p_hi)
    direct = hll.from_hashes(vals, p_lo) if len(vals) else hll.empty(p_lo)
    assert hll.fold(hi, p_lo) == direct


# --------------------------------------------- round-3 kernels (cbf/cs/fd)


@settings(max_examples=60, deadline=None)
@given(vals=u64_arrays, dels=st.integers(min_value=0, max_value=300),
       splits=st.integers(min_value=1, max_value=5))
def test_cbf_group_laws_any_split(vals, dels, splits):
    """Counting bloom: any partitioning of (inserts ++ deletes) merges to
    the same bytes, and deleting a subset never produces false negatives
    on the rest."""
    from hyperloglog_spark.sketch import cbf

    dels = min(dels, len(vals))
    h = np.concatenate([vals, vals[:dels]])
    d = np.concatenate([np.ones(len(vals), dtype=np.int64),
                        -np.ones(dels, dtype=np.int64)])
    direct = cbf.from_hashes(h, d, log2_m=8, k=3)
    idx = np.arange(len(h))
    parts = np.array_split(idx, splits)
    merged = cbf.merge_many([
        cbf.from_hashes(h[p], d[p], log2_m=8, k=3) for p in parts
    ])
    assert merged == direct
    kept = vals[dels:]
    if len(kept):
        assert cbf.might_contain(direct, kept).all()


@settings(max_examples=60, deadline=None)
@given(vals=u64_arrays, splits=st.integers(min_value=1, max_value=5))
def test_countsketch_merge_is_counter_sum(vals, splits):
    from hyperloglog_spark.sketch import countsketch as cs

    direct = cs.from_hashes(vals, d=3, log2_w=6)
    parts = np.array_split(np.arange(len(vals)), splits)
    merged = cs.merge_many([
        cs.from_hashes(vals[p], d=3, log2_w=6) for p in parts
    ])
    assert merged == direct


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=120),
    dim=st.sampled_from([4, 8]),
    ell=st.sampled_from([4, 8, 64]),
    splits=st.integers(min_value=1, max_value=4),
)
def test_fd_certificate_any_split(n, dim, ell, splits):
    """FD: under ANY partitioning + merge order, the PSD sandwich
    0 <= A'A - B'B <= delta_sum*I holds, and in the exact regime
    (n <= 2*ell) the Gram is bit-exact on an integer grid."""
    from hyperloglog_spark.sketch import fd

    rng = np.random.default_rng(n * 7 + dim + ell + splits)
    mat = np.floor(rng.standard_normal((n, dim)) * 40)
    parts = np.array_split(np.arange(n), splits)
    sketches = [fd.append(fd.empty(ell), mat[p]) for p in parts]
    merged = fd.merge_many(sketches)
    _, _, nrows, delta, fro2 = fd.params(merged)
    if n == 0:
        assert nrows == 0 and delta == 0.0 and fro2 == 0.0
        return
    err = mat.T @ mat - fd.gram(merged)
    ev = np.linalg.eigvalsh(err)
    assert ev.min() >= -1e-6
    assert ev.max() <= delta + 1e-6
    if n <= 2 * ell:
        assert delta == 0.0
        assert np.array_equal(fd.gram(merged), mat.T @ mat)
