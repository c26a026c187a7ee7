"""One-call training-data curation: the composition every LLM data pipeline
runs, as a single DataFrame plan.

    curated = curate_documents(docs, "text", "doc_id",
                               benchmark=eval_slice, langs=("en",),
                               min_quality=300, sample_permille=800)
    kept = curated.filter("keep")

Stage order (and what each adds):

1. language ID          -> ``lang_pred``, ``lang_ok``       (codegen only)
2. quality score        -> ``score``, ``quality_ok``        (codegen only)
3. repetition filters   -> ``repetitive``                   (codegen only)
4. exact dedup          -> ``is_canonical``                 (1 Exchange)
5. decontamination      -> ``contaminated``                 (optional)
6. deterministic sample -> ``sampled``                      (codegen only)
7. ``keep`` = canonical AND lang_ok AND quality_ok AND NOT repetitive
              AND NOT contaminated AND sampled

Stages 1-3 and 6 are pure Catalyst column expressions computed in a single
codegen pass over the text; the TEXT COLUMN NEVER CROSSES AN EXCHANGE
(plan-asserted). Dedup runs on a narrow (fingerprint, id) projection — a
second scan of two columns beats shuffling uncompressed text rows by
orders of magnitude at 100 TB — and the verdicts join on bare ids, so
every shuffled row is a few dozen bytes of id + integer flags. The result
deliberately does NOT carry the text: materialize the training set with a
semi-join of ``filter("keep")`` ids back to the corpus (broadcast it when
the kept set is small; the ids are exactly the Bloom-semi-join shape of
``membership.bloom_filtered_join`` when it is not).

Every flag is deterministic and (in md5 hashing mode) exactly replayable
in ANSI SQL — the driver oracle checks the whole composition end-to-end,
not just the stages.

Scale notes: the dedup window partitions by the 128-bit md5 fingerprint; a
pathological mass-duplicate fingerprint lands in one task, but its rows
are 24-byte (fp, id) pairs and Spark's window sort spills rather than
OOMs. When the corpus is known to contain million-copy boilerplate, use
``pipeline.dedup.exact_dedup`` (groupBy with map-side combine collapses
hot fingerprints before the shuffle) and join its representatives
instead — same semantics, one more Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..frequency import _hash_expr
from .decontam import ngram_contamination
from .text import lang_id, quality_score, repetition_stats

__all__ = ["curate_documents"]


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
    bench_text_col: str | None = None,
    langs: tuple[str, ...] = ("en",),
    min_quality: int = 300,
    flag_top_bigram_permille: int = 180,
    flag_dup_trigram_permille: int = 300,
    flag_dup_word_permille: int = 700,
    decontam_n: int = 3,
    decontam_threshold_permille: int = 500,
    sample_permille: int = 1000,
    hashing: str = "xxhash64",
) -> DataFrame:
    """Per-document curation verdicts; filter on ``keep`` to materialize the
    training set, or inspect the per-stage flags to audit why a document
    fell out. ``sample_permille=1000`` keeps everything; lower values apply
    a deterministic hash-of-id downsample AFTER the quality gates so the
    rate applies to surviving documents."""
    if not 0 < sample_permille <= 1000:
        raise ValueError(
            f"sample_permille must be in (0, 1000]: {sample_permille}"
        )
    d = df.select(F.col(id_col), F.col(text_col))
    d = lang_id(d, text_col)                                   # lang_pred
    d = quality_score(d, text_col, id_col, append=True)        # score, ...
    d = repetition_stats(                                      # repetitive
        d, text_col, id_col,
        flag_top_bigram_permille=flag_top_bigram_permille,
        flag_dup_trigram_permille=flag_dup_trigram_permille,
        flag_dup_word_permille=flag_dup_word_permille,
        append=True,
    )
    # deterministic sample on the id hash — partitioning-invariant,
    # md5 mode replays as (hv % 1000) < rate in SQL
    d = d.withColumn(
        "sampled",
        F.pmod(_hash_expr([id_col], hashing), F.lit(1000))
        < F.lit(sample_permille),
    )
    # the text has served its purpose: drop it BEFORE anything shuffles,
    # so every Exchange below moves id + integer-flag rows only
    d = d.drop(text_col)

    # exact dedup: canonical = smallest id among byte-identical texts.
    # Computed on a narrow (md5 fingerprint, id) second scan — 24-byte
    # rows through the window shuffle instead of text payloads — then
    # joined back on the id.
    w = Window.partitionBy("__fp")
    canon = (
        df.select(F.md5(F.col(text_col)).alias("__fp"), F.col(id_col))
        .withColumn(
            "is_canonical", F.col(id_col) == F.min(id_col).over(w)
        )
        .drop("__fp")
    )
    d = d.join(canon, id_col, "inner")

    if benchmark is not None:
        cont = ngram_contamination(
            df, benchmark, text_col, id_col,
            bench_text_col=bench_text_col, n=decontam_n,
            threshold_permille=decontam_threshold_permille,
            hashing=hashing,
        ).select(id_col, "contaminated")
        d = d.join(cont, id_col, "left").withColumn(
            "contaminated", F.coalesce("contaminated", F.lit(False))
        )
    else:
        d = d.withColumn("contaminated", F.lit(False))

    d = d.withColumn("lang_ok", F.col("lang_pred").isin(*langs))
    d = d.withColumn("quality_ok", F.col("score") >= F.lit(min_quality))
    return d.withColumn(
        "keep",
        F.col("is_canonical")
        & F.col("lang_ok")
        & F.col("quality_ok")
        & ~F.col("repetitive")
        & ~F.col("contaminated")
        & F.col("sampled"),
    )
