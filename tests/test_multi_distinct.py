"""approx_distinct_multi: N per-column distinct counts in ONE scan —
estimates bit-identical to per-column approx_distinct, per-column null
semantics, single FileScan + single Exchange in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hyperloglog_spark import approx_distinct, approx_distinct_multi
from hyperloglog_spark.engine.plans import (
    assert_max_exchanges,
    assert_pruned_scan,
)


@pytest.fixture(scope="module")
def events(spark, sf01_dir):
    return spark.read.parquet(f"{sf01_dir}/events.parquet").cache()


class TestMultiDistinct:
    def test_matches_per_column_runs(self, events):
        row = approx_distinct_multi(
            events, ["user_id", "event_type", "value"]
        ).collect()[0]
        for c in ("user_id", "event_type", "value"):
            single = approx_distinct(events, c).collect()[0][0]
            assert row[f"n_{c}"] == single, c

    def test_grouped(self, events):
        got = {
            r["event_type"]: (r["n_user_id"], r["n_value"])
            for r in approx_distinct_multi(
                events, ["user_id", "value"], group_by="event_type"
            ).collect()
        }
        for et, (nu, nv) in got.items():
            sub = events.filter(F.col("event_type") == et)
            assert nu == approx_distinct(sub, "user_id").collect()[0][0]
            assert nv == approx_distinct(sub, "value").collect()[0][0]

    def test_per_column_null_semantics(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("b", None), (None, 2), ("a", 2), (None, None)],
            "s string, i int",
        )
        row = approx_distinct_multi(df, ["s", "i"]).collect()[0]
        assert row["n_s"] == 2        # a, b — NULLs dropped per column
        assert row["n_i"] == 2        # 1, 2

    def test_single_scan_single_shuffle(self, spark, events, sf01_dir):
        spark.catalog.clearCache()
        fresh = spark.read.parquet(f"{sf01_dir}/events.parquet")
        q = approx_distinct_multi(fresh, ["user_id", "event_type"])
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan") == 1      # ONE pass over the data
        assert_max_exchanges(q, 1)
        assert_pruned_scan(q, {"user_id", "event_type"})

    def test_all_null_column_counts_zero(self, spark):
        df = spark.createDataFrame(
            [("x", None), ("y", None)], "s string, i int"
        )
        row = approx_distinct_multi(df, ["s", "i"]).collect()[0]
        assert row["n_s"] == 2
        assert row["n_i"] == 0
