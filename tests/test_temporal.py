"""As-of join: parity with pandas merge_asof, bucketed-path equivalence.

pandas.merge_asof is the reference semantics (backward/forward inclusive
nearest match, tolerance, by-keys); the bucketed scale path must be
row-identical to the single-window path at every bucket width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hyperloglog_spark.pipeline.temporal import asof_join


def _mk(spark, seed: int, n_left: int = 400, n_right: int = 150,
        n_keys: int = 7):
    rng = np.random.default_rng(seed)
    lpd = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left).astype("int64"),
        "ts": rng.integers(0, 10_000, n_left).astype("int64"),
        "lv": np.arange(n_left, dtype="int64"),
    })
    rpd = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right).astype("int64"),
        "ts": rng.integers(0, 10_000, n_right).astype("int64"),
        "rv": rng.integers(0, 1_000_000, n_right).astype("int64"),
    }).drop_duplicates(["k", "ts"])  # unique per (by, right_on)
    # one key with zero right rows; one key with zero left rows
    rpd = rpd[rpd.k != 0]
    lpd = lpd[lpd.k != n_keys - 1]
    return lpd, rpd


def _expected(lpd, rpd, direction, tolerance=None):
    exp = pd.merge_asof(
        lpd.sort_values(["ts", "lv"]),
        rpd.sort_values("ts").rename(columns={"ts": "ts_r", "rv": "rv_r"}),
        left_on="ts", right_on="ts_r", by="k", direction=direction,
        tolerance=tolerance, allow_exact_matches=True,
    )
    return {
        (int(r.k), int(r.ts), int(r.lv)):
            (None if pd.isna(r.ts_r) else int(r.ts_r),
             None if pd.isna(r.rv_r) else int(r.rv_r))
        for r in exp.itertuples()
    }


def _got(df):
    return {
        (r["k"], r["ts"], r["lv"]): (r["ts_r"], r["rv_r"])
        for r in df.collect()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("seed", [1, 2])
def test_asof_matches_pandas(spark, direction, seed):
    lpd, rpd = _mk(spark, seed)
    out = asof_join(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd),
        by="k", left_on="ts", direction=direction,
    )
    assert _got(out) == _expected(lpd, rpd, direction)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_tolerance(spark, direction):
    lpd, rpd = _mk(spark, 3)
    out = asof_join(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd),
        by="k", left_on="ts", direction=direction, tolerance_s=500,
    )
    assert _got(out) == _expected(lpd, rpd, direction, tolerance=500)


@pytest.mark.parametrize("bucket_s", [100, 1_000, 50_000])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_bucketed_path_identical(spark, bucket_s, direction):
    """The skew-safe bucketed path is row-identical to the single-window
    path at any bucket width (50_000 = everything in one bucket)."""
    lpd, rpd = _mk(spark, 4)
    l, r = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    plain = _got(asof_join(l, r, by="k", left_on="ts",
                           direction=direction))
    bucketed = _got(asof_join(l, r, by="k", left_on="ts",
                              direction=direction, bucket_s=bucket_s))
    assert bucketed == plain


def test_asof_timestamp_columns_and_exact_match(spark):
    l = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00"), (1, "2024-01-01 00:00:00")],
        "k int, ts string",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"))
    r = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", "exact"),
         (1, "2024-01-01 00:05:00", "mid")],
        "k int, ts string, tag string",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"), "tag")
    rows = {r["ts"].minute: r["tag_r"]
            for r in asof_join(l, r, by="k", left_on="ts").collect()}
    # coincident right row matches (inclusive); earlier left row has none
    assert rows == {10: "exact", 0: None}


def test_asof_rejects_bad_args(spark):
    l = spark.createDataFrame([(1, 1)], "k int, ts int")
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, l, by="k", left_on="ts", direction="nearest")
    with pytest.raises(ValueError, match="bucket_s"):
        asof_join(l, l, by="k", left_on="ts", bucket_s=0)


def test_asof_single_shuffle_plan(spark):
    from hyperloglog_spark.engine.plans import n_exchanges

    lpd, rpd = _mk(spark, 5)
    q = asof_join(spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                  by="k", left_on="ts")
    # union -> one window sort: exactly one Exchange, no join operator
    assert n_exchanges(q) == 1
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
