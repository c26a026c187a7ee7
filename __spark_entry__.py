"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 exercised on the
driver's testdata tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL.

Sketch estimates are deterministic functions of the input (fixed hashes, no
RNG), so queries whose estimate provably equals the exact answer at this
data scale carry an exact SQL oracle; genuinely approximate outputs
(documented per query) are listed without an oracle and get the driver's
rows-only check — their accuracy is asserted by `python -m pytest -x -q`
instead (vs exact countDistinct / percentile, see tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- queries


def q_hll_distinct_region(spark, sf_dir):
    from hyperloglog_spark import approx_distinct

    return approx_distinct(_t(spark, sf_dir, "region"), "r_regionkey",
                           alias="n_regions")


def q_hll_distinct_nation(spark, sf_dir):
    from hyperloglog_spark import approx_distinct

    return approx_distinct(_t(spark, sf_dir, "nation"), "n_nationkey",
                           alias="n_nations")


def q_hll_distinct_event_users_p16(spark, sf_dir):
    """p=16 linear-counting regime: estimate == exact at this cardinality."""
    from hyperloglog_spark import approx_distinct

    return approx_distinct(_t(spark, sf_dir, "events"), "user_id", p=16,
                           alias="n_users")


def q_hll_distinct_doc_text_by_lang(spark, sf_dir):
    from hyperloglog_spark import approx_distinct

    return approx_distinct(
        _t(spark, sf_dir, "documents"), "text", group_by="lang", p=16,
        alias="n_texts",
    ).orderBy("lang")


def q_hll_distinct_customers(spark, sf_dir):
    """Larger cardinality -> genuinely approximate (rows-only check; accuracy
    asserted in tests vs countDistinct within 3 * 1.04/sqrt(m))."""
    from hyperloglog_spark import approx_distinct

    return approx_distinct(_t(spark, sf_dir, "customer"), "c_custkey",
                           alias="n_customers")


def q_hll_distinct_order_cust_pairs(spark, sf_dir):
    """Composite-key distinct, approximate (rows-only)."""
    from hyperloglog_spark import approx_distinct

    return approx_distinct(
        _t(spark, sf_dir, "orders"), ["o_custkey", "o_orderpriority"],
        alias="n_pairs",
    )


def q_hll_jvm_engine_event_users(spark, sf_dir):
    """engine='jvm': register reduction in whole-stage codegen; registers
    (hence estimates) bit-identical to the arrow UDAF engine. Exact here
    (linear-counting regime)."""
    from hyperloglog_spark import approx_distinct

    return approx_distinct(
        _t(spark, sf_dir, "events"), "user_id", p=16, alias="n_users",
        engine="jvm",
    )


def q_hll_rollup_event_users(spark, sf_dir):
    """Stored-sketch rollup: per-(event_type, day) HLL sketch rows merged
    up to event_type with ZERO rescan of the data rows — the lakehouse
    pattern that turns a 100 TB rescan into a merge of KB-sized cells.
    Registers are byte-identical to a direct build (tests/test_rollup.py);
    exact here (p=16 linear-counting regime)."""
    from hyperloglog_spark import hll_rollup, hll_sketch_agg

    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("date")
    )
    daily = hll_sketch_agg(ev, "user_id", group_by=["event_type", "day"], p=16)
    return hll_rollup(
        daily, group_by="event_type", alias="n_users"
    ).orderBy("event_type")


def q_hll_set_algebra_users(spark, sf_dir):
    """HLL set algebra over stored sketches: |click|, |view|, |click ∪ view|
    (lossless register-max merge), |click ∩ view| (inclusion-exclusion).
    Exact here — every term sits in the p=16 linear-counting regime, so
    the inclusion-exclusion has no error to amplify."""
    from hyperloglog_spark.functions import hll_sketch_agg
    from hyperloglog_spark.sketch import hll

    ev = _t(spark, sf_dir, "events")
    sk = {
        r["event_type"]: bytes(r["sketch"])
        for r in hll_sketch_agg(
            ev.filter(F.col("event_type").isin("click", "view")),
            "user_id", group_by="event_type", p=16, engine="jvm",
        ).collect()
    }
    a, b = sk["click"], sk["view"]
    return spark.createDataFrame(
        [(hll.estimate(a), hll.estimate(b), hll.union_estimate([a, b]),
          hll.intersection_estimate(a, b))],
        "n_click long, n_view long, n_union long, n_intersection long",
    )


def q_hll_multi_column_profile(spark, sf_dir):
    """N per-column distinct counts in ONE scan (the ANALYZE-TABLE shape;
    plan audited: single FileScan, single Exchange). Exact here (p=16
    linear-counting regime)."""
    from hyperloglog_spark import approx_distinct_multi

    return approx_distinct_multi(
        _t(spark, sf_dir, "events"), ["user_id", "event_type"], p=16
    )


def q_hll_bounded_event_users(spark, sf_dir):
    """Estimate with its published 3-sigma interval columns
    (with_error_bounds: pure JVM arithmetic, se = 3·1.04/√m). Exact
    estimate here (p=16 LC regime), so the oracle mirrors the identical
    double arithmetic on the exact count."""
    from hyperloglog_spark import approx_distinct, with_error_bounds

    est = approx_distinct(
        _t(spark, sf_dir, "events"), "user_id", p=16, alias="n_users"
    )
    return with_error_bounds(est, "n_users", p=16)


def q_cms_rollup_top_event_types(spark, sf_dir):
    """Heavy hitters from STORED shards: per-day (CMS + candidate list)
    rows merged and re-ranked with zero data rescan (candidate union ∪
    merged-sketch point query). Exact here (value space << width)."""
    from hyperloglog_spark.frequency import cms_topk_rollup, cms_topk_shards

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    shards = cms_topk_shards(ev, "event_type", shard_by="day")
    return cms_topk_rollup(shards, "event_type", k=5)


def q_hll_packed_binary(spark, sf_dir):
    """AddAs* packed-binary ingest: document texts as utf-8 byte buffers
    reinterpreted as packed int32 values, approximate distinct of the
    values (rows-only: byte-reinterpretation is not SQL-expressible;
    estimator parity asserted in tests/test_engines_packed.py)."""
    from hyperloglog_spark.functions import approx_distinct_packed

    docs = _t(spark, sf_dir, "documents")
    payload = docs.select(
        F.encode("text", "utf-8").alias("payload")
    )
    return approx_distinct_packed(payload, "payload", "int32",
                                  alias="n_packed_values")


def q_cms_event_type_counts(spark, sf_dir):
    """CMS point estimates: exact here (value space far below sketch width)."""
    from hyperloglog_spark import cms_topk

    return cms_topk(_t(spark, sf_dir, "events"), "event_type", k=20)


def q_cms_top5_partkeys(spark, sf_dir):
    """Exact-ranking regime at sf0.01 (count gaps >> CMS overestimate). At
    sf0.1 l_partkey counts are near-uniform ties (~51-53 in 600k rows — no
    true heavy hitters), where any εN-guarantee method misranks; the gate
    runs at sf0.01."""
    from hyperloglog_spark import cms_topk

    return cms_topk(_t(spark, sf_dir, "lineitem"), "l_partkey", k=5)


def q_bloom_custkey_members(spark, sf_dir):
    """No-false-negative guarantee: every inserted key probes true."""
    from hyperloglog_spark import bloom_build, with_might_contain

    cust = _t(spark, sf_dir, "customer")
    flt = bloom_build(cust, "c_custkey", expected_items=200_000, fpp=0.001)
    return with_might_contain(
        cust.select("c_custkey"), "c_custkey", flt, alias="seen"
    )


def q_bloom_orders_covered(spark, sf_dir):
    """Referential integrity via Bloom: every order's custkey was seen in
    customer (distinct probe keys, all must be members)."""
    from hyperloglog_spark import bloom_build, with_might_contain

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    flt = bloom_build(cust, "c_custkey", expected_items=200_000, fpp=0.001)
    return with_might_contain(orders, "o_custkey", flt, alias="seen")


def q_kll_price_quantiles(spark, sf_dir):
    """Approximate (rows-only): rank error <= 2.5% asserted in tests."""
    from hyperloglog_spark import approx_quantiles

    return approx_quantiles(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", [0.5, 0.9, 0.99]
    )


def q_tdigest_event_value_quantiles(spark, sf_dir):
    """Approximate (rows-only)."""
    from hyperloglog_spark import approx_quantiles

    return approx_quantiles(
        _t(spark, sf_dir, "events"), "value", [0.5, 0.9, 0.99],
        method="tdigest",
    )


def q_dedup_exact_documents(spark, sf_dir):
    """Exact dedup: one representative doc_id per distinct text (grouped on
    a 192-bit fingerprint, not the payload)."""
    from hyperloglog_spark.pipeline import exact_dedup

    return exact_dedup(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).orderBy("doc_id")


def q_neardup_minhash_pairs(spark, sf_dir):
    """MinHash->LSH->exact-verify near-duplicate pairs (J >= 0.5 on word
    3-gram shingles). (b=64, r=2) gives miss prob ~1e-8 at J=0.5; every
    emitted pair is exactly verified, so this matches exhaustive SQL."""
    from hyperloglog_spark.pipeline import near_dup_pairs

    return near_dup_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        threshold_permille=500,
    )


def q_simhash_neardup_pairs(spark, sf_dir):
    """SimHash Hamming<=3 pairs via exact pigeonhole blocking (rows-only:
    brute-force parity asserted in tests/test_pipeline.py)."""
    from hyperloglog_spark.pipeline import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=3
    ).orderBy("id_a", "id_b")


def q_embedding_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-5 neighbors for query vectors vec_id<10."""
    from hyperloglog_spark.pipeline import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5
    )


def q_embedding_topk_lsh(spark, sf_dir):
    """LSH-bucketed ANN top-5 (rows-only: recall asserted in tests)."""
    from hyperloglog_spark.pipeline import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk(
        emb, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5
    )


def q_text_token_stats(spark, sf_dir):
    from hyperloglog_spark.pipeline import token_stats

    return token_stats(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).orderBy("doc_id")


def q_text_lang_id(spark, sf_dir):
    from hyperloglog_spark.pipeline import lang_id

    return (
        lang_id(_t(spark, sf_dir, "documents"), "text")
        .groupBy("lang_pred").agg(F.count("*").alias("n_docs"))
        .orderBy("lang_pred")
    )


def q_text_quality(spark, sf_dir):
    """Integer-permille quality components — fully SQL-mirrored oracle
    (all-integer arithmetic, engine-independent)."""
    from hyperloglog_spark.pipeline import quality_score

    return quality_score(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).orderBy("doc_id")


def q_doc_fingerprints(spark, sf_dir):
    """Bottom-k shingle fingerprints (rows-only: xxhash64 has no DuckDB
    equivalent; determinism asserted in tests)."""
    from hyperloglog_spark.pipeline import doc_fingerprints

    return doc_fingerprints(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).orderBy("doc_id")


def q_multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction (deterministic fake decoder; the
    codec step is a documented stub, the Spark plumbing is real)."""
    from hyperloglog_spark.pipeline.multimodal import (
        extract_features, synthesize_assets,
    )

    assets = synthesize_assets(_t(spark, sf_dir, "documents"), "text", "doc_id")
    return (
        extract_features(assets)
        .select("asset_id", "kind", "n_bytes")
        .orderBy("asset_id")
    )


def q_orders_per_priority(spark, sf_dir):
    """Exact composition query (engine + oracle plumbing sanity)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_custs"),
        )
        .orderBy("o_orderpriority")
    )


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "hll_distinct_region": q_hll_distinct_region,
    "hll_distinct_nation": q_hll_distinct_nation,
    "hll_distinct_event_users_p16": q_hll_distinct_event_users_p16,
    "hll_jvm_engine_event_users": q_hll_jvm_engine_event_users,
    "hll_packed_binary": q_hll_packed_binary,
    "hll_rollup_event_users": q_hll_rollup_event_users,
    "hll_set_algebra_users": q_hll_set_algebra_users,
    "cms_rollup_top_event_types": q_cms_rollup_top_event_types,
    "hll_multi_column_profile": q_hll_multi_column_profile,
    "hll_bounded_event_users": q_hll_bounded_event_users,
    "hll_distinct_doc_text_by_lang": q_hll_distinct_doc_text_by_lang,
    "hll_distinct_customers": q_hll_distinct_customers,
    "hll_distinct_order_cust_pairs": q_hll_distinct_order_cust_pairs,
    "cms_event_type_counts": q_cms_event_type_counts,
    "cms_top5_partkeys": q_cms_top5_partkeys,
    "bloom_custkey_members": q_bloom_custkey_members,
    "bloom_orders_covered": q_bloom_orders_covered,
    "kll_price_quantiles": q_kll_price_quantiles,
    "tdigest_event_value_quantiles": q_tdigest_event_value_quantiles,
    "orders_per_priority": q_orders_per_priority,
    "dedup_exact_documents": q_dedup_exact_documents,
    "neardup_minhash_pairs": q_neardup_minhash_pairs,
    "simhash_neardup_pairs": q_simhash_neardup_pairs,
    "embedding_topk_bruteforce": q_embedding_topk_bruteforce,
    "embedding_topk_lsh": q_embedding_topk_lsh,
    "text_token_stats": q_text_token_stats,
    "text_lang_id": q_text_lang_id,
    "text_quality": q_text_quality,
    "doc_fingerprints": q_doc_fingerprints,
    "multimodal_features": q_multimodal_features,
}

_ORACLES: dict[str, str] = {
    "hll_distinct_region":
        "SELECT count(DISTINCT r_regionkey) AS n_regions FROM region",
    "hll_distinct_nation":
        "SELECT count(DISTINCT n_nationkey) AS n_nations FROM nation",
    "hll_distinct_event_users_p16":
        "SELECT count(DISTINCT user_id) AS n_users FROM events",
    "hll_jvm_engine_event_users":
        "SELECT count(DISTINCT user_id) AS n_users FROM events",
    "hll_rollup_event_users":
        "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events "
        "GROUP BY event_type ORDER BY event_type",
    "hll_multi_column_profile":
        "SELECT count(DISTINCT user_id) AS n_user_id, "
        "count(DISTINCT event_type) AS n_event_type FROM events",
    "hll_bounded_event_users":
        "SELECT n_users, "
        "GREATEST(CAST(FLOOR(n_users * (1.0 - 3.0*(1.04/sqrt(65536)))) "
        "AS BIGINT), 0) AS n_users_lo, "
        "CAST(CEIL(n_users * (1.0 + 3.0*(1.04/sqrt(65536)))) AS BIGINT) "
        "AS n_users_hi FROM "
        "(SELECT count(DISTINCT user_id) AS n_users FROM events)",
    "hll_set_algebra_users":
        "SELECT "
        "count(DISTINCT CASE WHEN event_type='click' THEN user_id END) "
        "  AS n_click, "
        "count(DISTINCT CASE WHEN event_type='view' THEN user_id END) "
        "  AS n_view, "
        "count(DISTINCT CASE WHEN event_type IN ('click','view') "
        "  THEN user_id END) AS n_union, "
        "(SELECT count(*) FROM "
        " (SELECT user_id FROM events WHERE event_type='click' "
        "  INTERSECT "
        "  SELECT user_id FROM events WHERE event_type='view') t) "
        "  AS n_intersection "
        "FROM events",
    "hll_distinct_doc_text_by_lang":
        "SELECT lang, count(DISTINCT text) AS n_texts FROM documents "
        "GROUP BY lang ORDER BY lang",
    "cms_event_type_counts":
        "SELECT event_type, count(*) AS approx_count FROM events "
        "GROUP BY event_type ORDER BY approx_count DESC, event_type "
        "LIMIT 20",
    "cms_rollup_top_event_types":
        "SELECT event_type, count(*) AS approx_count FROM events "
        "GROUP BY event_type ORDER BY approx_count DESC, event_type LIMIT 5",
    "cms_top5_partkeys":
        "SELECT l_partkey, count(*) AS approx_count FROM lineitem "
        "GROUP BY l_partkey ORDER BY approx_count DESC, l_partkey LIMIT 5",
    "bloom_custkey_members":
        "SELECT c_custkey, TRUE AS seen FROM customer",
    "bloom_orders_covered":
        "SELECT DISTINCT o_custkey, TRUE AS seen FROM orders",
    "orders_per_priority":
        "SELECT o_orderpriority, count(*) AS n_orders, "
        "count(DISTINCT o_custkey) AS n_custs FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    "dedup_exact_documents":
        "SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents "
        "GROUP BY text ORDER BY doc_id",
    "neardup_minhash_pairs": """
WITH s AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) < 3 THEN [text]
              ELSE list_distinct([array_to_string(string_split(text, ' ')[i:i+2], ' ')
                                  for i in range(1, len(string_split(text, ' ')) - 1)])
         END AS sh
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(floor(len(list_intersect(a.sh, b.sh)) * 1000.0 /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) AS BIGINT)
         AS jaccard_permille
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE floor(len(list_intersect(a.sh, b.sh)) * 1000.0 /
      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) >= 500
ORDER BY id_a, id_b
""",
    "embedding_topk_bruteforce": """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id,
         list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y * y)))) AS u
  FROM e
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(floor(1000.0 * list_sum(list_transform(range(1, len(q.u) + 1),
              i -> q.u[i] * c.u[i]))) AS BIGINT) AS score_permille
  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT query_id, CAST(row_number() OVER w AS INTEGER) AS rank, neighbor_id, score_permille
FROM scored
WINDOW w AS (PARTITION BY query_id ORDER BY score_permille DESC, neighbor_id)
QUALIFY rank <= 5
ORDER BY query_id, rank
""",
    "text_token_stats": """
SELECT doc_id, length(text) AS n_chars,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_types,
       CAST(floor(len(list_distinct(string_split(text, ' '))) * 1000.0
            / len(string_split(text, ' '))) AS BIGINT) AS ttr_permille
FROM documents ORDER BY doc_id
""",
    "text_lang_id": r"""
SELECT CASE
  WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}\x{3040}-\x{30ff}\x{ac00}-\x{d7af}]') THEN 'zh'
  WHEN regexp_matches(text, '[\x{0400}-\x{04ff}]') THEN 'ru'
  WHEN regexp_matches(text, '[äöüßÄÖÜ]') THEN 'de'
  WHEN regexp_matches(text, '[ñ¿¡]') THEN 'es'
  WHEN regexp_matches(text, '[èêëçàâîôûœ]') THEN 'fr'
  WHEN len(list_intersect(string_split(lower(text), ' '),
       ['the','a','an','and','of','to','in','is','it','that','for'])) > 0 THEN 'en'
  ELSE 'unknown' END AS lang_pred, count(*) AS n_docs
FROM documents GROUP BY lang_pred ORDER BY lang_pred
""",
    "text_quality": r"""
WITH t AS (
  SELECT doc_id, text, string_split(lower(text), ' ') AS toks,
         length(text) AS n_chars
  FROM documents
), c AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_intersect(toks,
             ['the','a','an','and','of','to','in','is','it','that','for'])) AS n_stop,
         n_chars - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS n_punct,
         len(list_distinct(toks)) AS n_types,
         n_chars
  FROM t
), pm AS (
  SELECT doc_id, n_tokens,
         CAST(floor(n_stop * 1000.0 / n_tokens) AS BIGINT) AS stop_permille,
         CAST(floor(n_punct * 1000.0 / greatest(n_chars, 1)) AS BIGINT) AS punct_permille,
         CAST(floor(n_types * 1000.0 / n_tokens) AS BIGINT) AS ttr_permille
  FROM c
)
SELECT doc_id, n_tokens, stop_permille, punct_permille, ttr_permille,
       greatest(least(CAST(floor(
         least(n_tokens, 200) * 2 + least(stop_permille, 300)
         + ttr_permille / 5 - least(punct_permille, 300)) AS BIGINT),
         1000), 0) AS score
FROM pm ORDER BY doc_id
""",
    "multimodal_features":
        "SELECT doc_id AS asset_id, "
        "(['image','audio','video'])[doc_id % 3 + 1] AS kind, "
        "octet_length(encode(text)) AS n_bytes "
        "FROM documents ORDER BY asset_id",
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-event-type approximate
    distinct users (HLL two-phase aggregation)."""
    from hyperloglog_spark import approx_distinct

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    return approx_distinct(
        events, "user_id", group_by="event_type", alias="approx_users"
    ).orderBy("event_type")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
