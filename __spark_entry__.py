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


def q_cms_event_type_counts(spark, sf_dir):
    """CMS point estimates: exact here (value space far below sketch width)."""
    from hyperloglog_spark import cms_topk

    return cms_topk(_t(spark, sf_dir, "events"), "event_type", k=20)


def q_cms_top5_partkeys(spark, sf_dir):
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
}

_ORACLES: dict[str, str] = {
    "hll_distinct_region":
        "SELECT count(DISTINCT r_regionkey) AS n_regions FROM region",
    "hll_distinct_nation":
        "SELECT count(DISTINCT n_nationkey) AS n_nations FROM nation",
    "hll_distinct_event_users_p16":
        "SELECT count(DISTINCT user_id) AS n_users FROM events",
    "hll_distinct_doc_text_by_lang":
        "SELECT lang, count(DISTINCT text) AS n_texts FROM documents "
        "GROUP BY lang ORDER BY lang",
    "cms_event_type_counts":
        "SELECT event_type, count(*) AS approx_count FROM events "
        "GROUP BY event_type ORDER BY approx_count DESC, event_type "
        "LIMIT 20",
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
