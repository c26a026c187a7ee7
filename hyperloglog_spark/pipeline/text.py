"""Text-analysis operators: language ID, quality scoring, token stats,
document fingerprints.

Everything here is pure Catalyst expressions (whole-stage codegen, no
Python in the hot path). Scores and ratios are emitted as integer permille
(``floor(x * 1000)``) so results compare bit-exactly across engines — the
DuckDB oracles in ``__spark_entry__.py`` mirror these formulas verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deliberately tiny, order-sensitive rule chain — deterministic and
# SQL-mirrorable (this is a heuristic language ID, not a model)
_CJK = "[\\u4e00-\\u9fff\\u3040-\\u30ff\\uac00-\\ud7af]"
_CYR = "[\\u0400-\\u04ff]"
_DE = "[äöüßÄÖÜ]"
_ES = "[ñ¿¡]"
_FR = "[èêëçàâîôûœ]"

STOPWORDS_EN = (
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for",
)


def lang_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """Charset/stopword heuristic language ID (rule chain, deterministic)."""
    t = F.col(text_col)
    stop_hits = F.size(
        F.array_intersect(
            F.split(F.lower(t), " "), F.array(*[F.lit(w) for w in STOPWORDS_EN])
        )
    )
    pred = (
        F.when(t.rlike(_CJK), F.lit("zh"))
        .when(t.rlike(_CYR), F.lit("ru"))
        .when(t.rlike(_DE), F.lit("de"))
        .when(t.rlike(_ES), F.lit("es"))
        .when(t.rlike(_FR), F.lit("fr"))
        .when(stop_hits > 0, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )
    return df.withColumn(out_col, pred)


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, n_types, ttr_permille): whitespace tokens +
    type/token ratio. ttr_permille = floor(n_types * 1000 / n_tokens)."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        F.floor(
            n_types.cast("double") * F.lit(1000.0) / n_tokens.cast("double")
        ).cast("long").alias("ttr_permille"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Integer-arithmetic quality heuristic (length, stopword ratio,
    punctuation ratio, lexical diversity). All components are exposed so a
    pipeline can filter on any of them; ``score`` ∈ [0, 1000]."""
    t = F.col(text_col)
    toks = F.split(F.lower(t), " ")
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_stop = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS_EN]))
    )
    n_punct = n_chars - F.length(F.regexp_replace(t, "[^\\w\\s]", ""))
    n_types = F.size(F.array_distinct(toks))
    stop_pm = F.floor(
        n_stop.cast("double") * F.lit(1000.0) / n_tokens.cast("double")
    ).cast("long")
    punct_pm = F.floor(
        n_punct.cast("double") * F.lit(1000.0)
        / F.greatest(n_chars, F.lit(1)).cast("double")
    ).cast("long")
    ttr_pm = F.floor(
        n_types.cast("double") * F.lit(1000.0) / n_tokens.cast("double")
    ).cast("long")
    # length term: saturate at 200 tokens; penalize punctuation walls
    score = (
        F.least(n_tokens, F.lit(200)) * F.lit(2)
        + F.least(stop_pm, F.lit(300))
        + ttr_pm / F.lit(5)
        - F.least(punct_pm, F.lit(300))
    )
    score = F.greatest(F.least(F.floor(score).cast("long"), F.lit(1000)),
                       F.lit(0))
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        stop_pm.alias("stop_permille"),
        punct_pm.alias("punct_permille"),
        ttr_pm.alias("ttr_permille"),
        score.alias("score"),
    )


def doc_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_len: int = 3,
    bottom_k: int = 4,
    hashing: str = "xxhash64",
) -> DataFrame:
    """Bottom-k fingerprint: fold of the ``bottom_k`` smallest shingle
    hashes. Equal fingerprints ⇒ near-identical shingle prefixes — a cheap
    blocking key for dedup at scale (one bigint per doc, groupBy-able).

    JVM-side end to end: shingle hashing, sort, slice, fold. The fold is an
    xxhash64 chain by default; with ``hashing="md5"`` both the shingle hash
    (top 60 md5 bits) and the fold (sum of the bottom_k — ≤ 4·2^60, no
    overflow) are exactly reproducible in ANSI SQL, which is how the
    driver's DuckDB oracle checks this operator.
    """
    from .dedup import shingle_hashes

    sh = shingle_hashes(text_col, shingle_len, hashing=hashing)
    df2 = df.select(F.col(id_col), sh.alias("__sh"))
    if hashing == "md5":
        fp_col = F.expr(
            f"aggregate(slice(array_sort(__sh), 1, {bottom_k}), "
            "cast(0 as bigint), (acc, x) -> acc + x)"
        )
    else:
        fp_col = F.expr(
            f"aggregate(slice(array_sort(__sh), 1, {bottom_k}), "
            "cast(0 as bigint), (acc, x) -> xxhash64(acc, x))"
        )
    return df2.select(
        F.col(id_col),
        fp_col.alias("fingerprint"),
        F.size("__sh").alias("n_shingles"),
    )
