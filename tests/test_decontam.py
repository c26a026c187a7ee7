"""Decontamination: n-gram containment vs a pure-Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyperloglog_spark.pipeline.decontam import ngram_contamination


def _grams(text: str, n: int) -> set[str]:
    toks = text.split(" ")
    if len(toks) < n:
        return {text}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _oracle(docs, bench, n):
    bench_set = set().union(*(_grams(t, n) for _, t in bench))
    out = {}
    for did, text in docs:
        g = _grams(text, n)
        m = len(g & bench_set)
        out[did] = (len(g), m, 1000 * m // len(g))
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox sat still"),          # shares a prefix
    (3, "completely unrelated text about spark"),
    (4, "tiny"),                                    # < n tokens
    (5, "the lazy dog sleeps all day long"),
]
BENCH = [
    (100, "the quick brown fox jumps high"),
    (101, "tiny"),
]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    return docs, bench


@pytest.mark.parametrize("n", [2, 3])
def test_exact_matches_python_oracle(spark, frames, n):
    docs, bench = frames
    got = {
        r["doc_id"]: (r["n_grams"], r["n_matched"],
                      r["contamination_permille"])
        for r in ngram_contamination(docs, bench, n=n).collect()
    }
    assert got == _oracle(DOCS, BENCH, n)


def test_threshold_flag_and_full_containment(spark, frames):
    docs, bench = frames
    rows = {
        r["doc_id"]: r
        for r in ngram_contamination(
            docs, bench, n=3, threshold_permille=500
        ).collect()
    }
    # short doc == a benchmark doc verbatim -> fully contaminated
    assert rows[4]["contamination_permille"] == 1000
    assert rows[4]["contaminated"]
    assert not rows[3]["contaminated"]
    for r in rows.values():
        assert r["contaminated"] == (r["contamination_permille"] >= 500)


def test_bloom_method_no_false_negatives(spark, frames):
    docs, bench = frames
    exact = {
        r["doc_id"]: r["n_matched"]
        for r in ngram_contamination(docs, bench, n=3).collect()
    }
    blm = {
        r["doc_id"]: r["n_matched"]
        for r in ngram_contamination(
            docs, bench, n=3, method="bloom", fpp=1e-6
        ).collect()
    }
    # Bloom can only over-count (fp), never under-count (no fn); at this
    # fpp and input the deterministic filter has zero fps
    assert all(blm[d] >= exact[d] for d in exact)
    assert blm == exact


def test_md5_mode_matches_xxhash_counts(spark, frames):
    docs, bench = frames
    a = sorted(ngram_contamination(docs, bench, n=3).collect())
    b = sorted(
        ngram_contamination(docs, bench, n=3, hashing="md5").collect()
    )
    assert a == b


def test_rejects_bad_args(spark, frames):
    docs, bench = frames
    with pytest.raises(ValueError, match="threshold"):
        ngram_contamination(docs, bench, threshold_permille=0)
    with pytest.raises(ValueError, match="method"):
        ngram_contamination(docs, bench, method="semi")


def test_exact_plan_broadcast_no_shuffle_join(spark, frames):
    from hyperloglog_spark.engine.plans import n_exchanges

    docs, bench = frames
    q = ngram_contamination(docs, bench, n=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # corpus grams shuffle once (the per-doc agg); bench side broadcasts.
    # budget: doc-agg Exchange + bench distinct pair + broadcast prep
    assert n_exchanges(q) <= 4
