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


# BPE-ish pre-tokenizer: letter runs | digit runs | punctuation runs — the
# GPT-2-family split boundaries without merges. ASCII classes on purpose:
# Java (Spark) and RE2/PCRE (DuckDB and most oracles) agree on them exactly,
# so the count is engine-reproducible; a real tokenizer plugs in behind a
# mapInPandas if an exact vocab count is needed.
_SUBTOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, n_types, ttr_permille, n_subtokens):
    whitespace tokens + type/token ratio, plus a BPE-ish subtoken count
    (letter/digit/punctuation runs — the pre-merge token boundary count, a
    deterministic proxy for tokenizer cost when budgeting a corpus)."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    n_sub = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(_SUBTOKEN_RE), 0)
    )
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        F.floor(
            n_types.cast("double") * F.lit(1000.0) / n_tokens.cast("double")
        ).cast("long").alias("ttr_permille"),
        n_sub.cast("long").alias("n_subtokens"),
    )


def quality_score(
    df: DataFrame, text_col: str, id_col: str, append: bool = False
) -> DataFrame:
    """Integer-arithmetic quality heuristic (length, stopword ratio,
    punctuation ratio, lexical diversity). All components are exposed so a
    pipeline can filter on any of them; ``score`` ∈ [0, 1000].
    ``append=True`` keeps the input columns (for single-pass pipeline
    composition) instead of projecting down to (id, metrics)."""
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
    metrics = {
        "n_tokens": n_tokens,
        "stop_permille": stop_pm,
        "punct_permille": punct_pm,
        "ttr_permille": ttr_pm,
        "score": score,
    }
    if append:
        return df.withColumns(metrics)
    return df.select(
        F.col(id_col), *[c.alias(n) for n, c in metrics.items()]
    )


def _ngram_array(words_col: str, n: int) -> F.Column:
    """Word n-grams as an array<string> (space-joined), empty when the doc
    has fewer than ``n`` tokens. Pure Catalyst (transform over sequence)."""
    joined = " , ' ', ".join(f"{words_col}[i + {j}]" for j in range(n))
    return F.expr(
        f"IF(size({words_col}) >= {n}, "
        f"transform(sequence(0, size({words_col}) - {n}), "
        f"i -> concat({joined})), "
        f"cast(array() as array<string>))"
    )


def _run_length_stats(arr_col: str) -> F.Column:
    """Fold a SORTED string array into struct(maxr, dup): the longest run of
    equal adjacent elements (= the max multiplicity of any element) and the
    number of occurrences belonging to elements with multiplicity >= 2.

    One O(n log n) sort + O(n) fold per row, entirely in whole-stage
    codegen — the shuffle-free alternative to explode + groupBy for per-doc
    n-gram multiplicity stats (at 100 TB an explode would shuffle ~n_tokens
    rows per document; this shuffles nothing).
    """
    return F.expr(
        f"aggregate(array_sort({arr_col}), "
        "named_struct('prev', cast(null as string), 'run', 0L, "
        "'maxr', 0L, 'dup', 0L), "
        "(a, x) -> named_struct("
        "'prev', x, "
        "'run', IF(x <=> a.prev, a.run + 1L, 1L), "
        "'maxr', greatest(a.maxr, IF(x <=> a.prev, a.run + 1L, 1L)), "
        "'dup', a.dup + IF(x <=> a.prev, IF(a.run = 1L, 2L, 1L), 0L)), "
        "a -> named_struct('maxr', a.maxr, 'dup', a.dup))"
    )


def repetition_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    flag_top_bigram_permille: int = 180,
    flag_dup_trigram_permille: int = 300,
    flag_dup_word_permille: int = 700,
    append: bool = False,
) -> DataFrame:
    """Gopher-style repetition metrics (Rae et al. 2021 §A1.1, public) for
    training-data quality filtering, word-level:

    - ``dup_word_permille``   — 1000·(n_tokens − n_types)/n_tokens
    - ``top_bigram_permille`` — occurrences of the most frequent bigram /
      total bigram occurrences (and the trigram analogue)
    - ``dup_bigram_permille`` — occurrences belonging to bigrams seen ≥2×
      (and the trigram analogue)
    - ``repetitive``          — any metric over its (documented) threshold

    All metrics are exact integers (floor permille), so the DuckDB oracle —
    which recomputes the same multiplicities via unnest + GROUP BY — must
    hash-match bit-for-bit. The Spark plan computes multiplicities per row
    with a sort+fold inside codegen instead of exploding n-grams into a
    shuffle: zero Exchanges for the stats themselves.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    temps = ["__w", "__nt", "__ty", "__bg", "__tg", "__nbg", "__ntg",
             "__bs", "__ts"]
    df2 = (
        df.withColumn("__w", toks)
        .withColumns({
            "__nt": F.size("__w"),
            "__ty": F.size(F.array_distinct("__w")),
            "__bg": _ngram_array("__w", 2),
            "__tg": _ngram_array("__w", 3),
        })
        .withColumns({
            "__nbg": F.size("__bg"),
            "__ntg": F.size("__tg"),
            "__bs": _run_length_stats("__bg"),
            "__ts": _run_length_stats("__tg"),
        })
    )

    def permille(num: F.Column, den: F.Column) -> F.Column:
        return F.when(den > 0, F.floor(
            num.cast("double") * F.lit(1000.0) / den.cast("double")
        ).cast("long")).otherwise(F.lit(0).cast("long"))

    dup_word = permille(F.col("__nt") - F.col("__ty"), F.col("__nt"))
    top_bg = permille(F.col("__bs.maxr"), F.col("__nbg"))
    dup_bg = permille(F.col("__bs.dup"), F.col("__nbg"))
    top_tg = permille(F.col("__ts.maxr"), F.col("__ntg"))
    dup_tg = permille(F.col("__ts.dup"), F.col("__ntg"))
    metrics = {
        "n_tokens": F.col("__nt").cast("long"),
        "dup_word_permille": dup_word,
        "top_bigram_permille": top_bg,
        "dup_bigram_permille": dup_bg,
        "top_trigram_permille": top_tg,
        "dup_trigram_permille": dup_tg,
        "repetitive": (
            (dup_word > F.lit(flag_dup_word_permille))
            | (top_bg > F.lit(flag_top_bigram_permille))
            | (dup_tg > F.lit(flag_dup_trigram_permille))
        ),
    }
    if append:
        return df2.withColumns(metrics).drop(*temps)
    return df2.select(
        F.col(id_col), *[c.alias(n) for n, c in metrics.items()]
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
