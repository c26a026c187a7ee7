"""Training-data decontamination: n-gram containment against a benchmark.

The standard eval-contamination check for LLM corpora: a training
document is contaminated when a large fraction of its word n-grams also
appear in an evaluation benchmark. This module scores every document
with ``contamination_permille = floor(1000 * |doc_grams ∩ bench_grams|
/ |doc_grams|)`` over per-document DISTINCT n-grams and flags docs at or
above a threshold.

Scale shape (the benchmark side is small — MBs of eval sets vs 100 TB of
corpus — and the design leans on that asymmetry):

- Shingling is the same whole-stage-codegen ``shingle_hashes`` expression
  the dedup family uses (``split`` + ``slice`` + ``xxhash64``/md5): no
  Python strings, only 64-bit hashes leave the scan.
- ``method="exact"``: the distinct benchmark-gram set is broadcast and
  the doc-gram stream probes it with a broadcast LEFT SEMI-shaped flag
  join — zero shuffle of corpus grams across the join; the only Exchange
  is the per-doc count aggregation.
- ``method="bloom"``: the benchmark grams are folded into a Bloom filter
  (``membership.bloom_agg``) and probed via ``might_contain`` — no join
  at all, one corpus shuffle (the per-doc agg); matches can only
  OVER-count by the filter's fpp, so the flag has no false negatives
  (contaminated docs are never missed). Use when the benchmark-gram set
  outgrows comfortable broadcast (~100s of MB).

``hashing="md5"`` makes every hash (and therefore every count) exactly
reproducible in ANSI SQL — the driver-gate oracle mode.

No reference counterpart (the reference is a sketch library); this is
the §2-extension pipeline scope: composition of the existing shingle,
broadcast, and Bloom primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..membership import bloom_build, with_might_contain
from .dedup import shingle_hashes

__all__ = ["ngram_contamination"]


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 3,
    threshold_permille: int = 500,
    method: str = "exact",
    fpp: float = 1e-6,
    hashing: str = "xxhash64",
) -> DataFrame:
    """Per-document benchmark-containment report: ``(id_col, n_grams,
    n_matched, contamination_permille, contaminated)``.

    Documents shorter than ``n`` tokens contribute their whole text as a
    single gram (the ``shingle_hashes`` short-text rule), so every doc
    has ``n_grams >= 1`` and the permille is always defined.
    """
    if not 0 < threshold_permille <= 1000:
        raise ValueError(
            f"threshold_permille must be in (0, 1000]: {threshold_permille}"
        )
    if method not in ("exact", "bloom"):
        raise ValueError(f"method must be 'exact' or 'bloom': {method!r}")
    bench_text_col = bench_text_col or text_col

    grams = docs.select(
        F.col(id_col),
        F.explode(shingle_hashes(text_col, n, hashing)).alias("__g"),
    )
    bench_grams = benchmark.select(
        F.explode(shingle_hashes(bench_text_col, n, hashing)).alias("__g")
    ).distinct()

    if method == "exact":
        flagged = grams.join(
            F.broadcast(bench_grams.withColumn("__hit", F.lit(1))),
            on="__g", how="left",
        ).select(id_col, F.coalesce("__hit", F.lit(0)).alias("__hit"))
    else:
        # grams are already 64-bit hashes; bloom_build / with_might_contain
        # re-hash the bigint identically on build and probe sides. The
        # bench-side count() sizing job is cheap by the operator's own
        # premise that the benchmark is the small side.
        flt = bloom_build(bench_grams, "__g",
                          expected_items=bench_grams.count(), fpp=fpp)
        flagged = with_might_contain(
            grams, "__g", flt, alias="__hit"
        ).select(id_col, F.col("__hit").cast("int").alias("__hit"))

    counts = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("__hit").cast("long").alias("n_matched"),
    )
    permille = F.expr("1000 * n_matched div n_grams")
    return counts.select(
        id_col,
        "n_grams",
        "n_matched",
        permille.alias("contamination_permille"),
        (permille >= F.lit(threshold_permille)).alias("contaminated"),
    )
