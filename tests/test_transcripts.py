"""Transcripts generator + flagship-query tests (SURVEY.md §5.2 layers 4-5):
the north_star query set against exact answers on a 50k-turn table, plus the
per-row text-equality invariant and skew behavior."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hyperloglog_spark import transcripts as tq
from hyperloglog_spark.data import transcripts as tgen
from hyperloglog_spark.sketch import hll


@pytest.fixture(scope="module")
def tpath(tmp_path_factory):
    path = tmp_path_factory.mktemp("transcripts") / "t2"
    return tgen.write(str(path), n_turns=50_000, n_convs=5_000, seed=42)


@pytest.fixture(scope="module")
def tdf(spark, tpath):
    return tq.load(spark, tpath).cache()


class TestGenerator:
    def test_deterministic(self):
        a = tgen.generate(5_000, 500, seed=7)
        b = tgen.generate(5_000, 500, seed=7)
        assert a.equals(b)

    def test_schema_and_invariants(self, tdf):
        assert [f.name for f in tdf.schema.fields] == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts"]
        n = tdf.count()
        assert n == 50_000
        # dense unique turn_idx per conv
        bad = (
            tdf.groupBy("conv_id")
            .agg(F.min("turn_idx").alias("mn"), F.max("turn_idx").alias("mx"),
                 F.count("*").alias("c"),
                 F.countDistinct("turn_idx").alias("d"))
            .filter((F.col("mn") != 0) | (F.col("mx") != F.col("c") - 1)
                    | (F.col("c") != F.col("d")))
        )
        assert bad.count() == 0

    def test_skew_present(self, tdf):
        top = (tdf.groupBy("conv_id").count()
               .orderBy(F.desc("count")).first()["count"])
        assert top > 50_000 * 0.05  # hottest conversation owns > 5% of turns

    def test_tool_only_on_tool_role(self, tdf):
        assert tdf.filter(
            (F.col("role") != "tool") & F.col("tool").isNotNull()).count() == 0
        assert tdf.filter(
            (F.col("role") == "tool") & F.col("tool").isNull()).count() == 0


class TestFlagshipQueries:
    def test_distinct_conversations(self, tdf):
        est = tq.distinct_conversations(tdf).collect()[0]["approx_convs"]
        exact = tdf.select(F.countDistinct("conv_id")).collect()[0][0]
        assert abs(est - exact) <= 3 * hll.error_bound(14) * exact + 2

    def test_distinct_texts_by_role_tool(self, tdf):
        got = {
            (r["role"], r["tool"]): r["approx_texts"]
            for r in tq.distinct_texts_by_role_tool(tdf).collect()
        }
        exact = {
            (r["role"], r["tool"]): r["n"]
            for r in tdf.groupBy("role", "tool")
            .agg(F.countDistinct("text").alias("n")).collect()
        }
        assert got.keys() == exact.keys()
        for key in exact:
            assert abs(got[key] - exact[key]) <= (
                3 * hll.error_bound(14) * exact[key] + 2), key

    def test_distinct_conv_tool_pairs(self, tdf):
        est = tq.distinct_conv_tool_pairs(tdf).collect()[0]["approx_pairs"]
        exact = tdf.select(F.countDistinct("conv_id", "tool")).collect()[0][0]
        assert abs(est - exact) <= 3 * hll.error_bound(14) * exact + 2

    def test_heavy_hitter_tools(self, tdf):
        got = [(r[0], r[1]) for r in tq.heavy_hitter_tools(tdf, k=5).collect()]
        exact = [
            (r[0], r[1])
            for r in tdf.filter(F.col("tool").isNotNull())
            .groupBy("tool").count()
            .orderBy(F.desc("count"), F.asc("tool")).limit(5).collect()
        ]
        assert got == exact

    def test_turn_length_quantiles(self, tdf):
        got = tq.turn_length_quantiles(tdf).collect()[0]
        lens = np.sort(np.array(
            [r[0] for r in tdf.select(F.length("text")).collect()]))
        for q, est in zip([0.5, 0.9, 0.99], [got["q5"], got["q9"], got["q99"]]):
            rank = np.searchsorted(lens, est, side="right") / len(lens)
            assert abs(rank - q) <= 0.03, (q, est, rank)

    def test_latency_quantiles(self, tdf):
        got = tq.latency_quantiles(tdf).collect()[0]
        # exp(mean=8s): median ~ 8*ln2 = 5.54s
        assert 4.5 <= got["q5"] <= 6.5
        assert got["q9"] < got["q99"]

    def test_conversation_membership(self, tdf, spark):
        probe = tdf.select(F.col("conv_id").alias("key")).distinct()
        out = tq.conversation_membership(tdf, probe, "key")
        assert out.filter(~F.col("seen")).count() == 0

    def test_ordering_invariant(self, tdf, spark, tpath):
        source = tq.load(spark, tpath)
        transformed = tdf.repartition(16, "conv_id").sortWithinPartitions(
            "conv_id", "turn_idx")
        assert tq.ordering_invariant_violations(transformed, source).count() == 0
        # and it actually detects corruption
        corrupted = tdf.withColumn(
            "text",
            F.when((F.col("turn_idx") == 0) & (F.col("conv_id") == "conv-00000000"),
                   F.lit("CORRUPTED")).otherwise(F.col("text")),
        )
        assert tq.ordering_invariant_violations(corrupted, source).count() == 1

    def test_sliding_windows_membership_and_fanout(self, tdf):
        """Every row lands in exactly window/slide windows, each of which
        actually contains its timestamp."""
        out = tq.with_sliding_windows(tdf, "ts", window_s=3600, slide_s=900)
        n = tdf.count()
        assert out.count() == 4 * n
        e = F.col("ts").cast("timestamp").cast("double")
        ws = F.col("window_start_epoch")
        violations = out.filter(~((ws <= e) & (e < ws + 3600))).count()
        assert violations == 0
        # window starts align to the slide grid
        assert out.filter(F.col("window_start_epoch") % 900 != 0).count() == 0
        with pytest.raises(ValueError, match="multiple"):
            tq.with_sliding_windows(tdf, "ts", window_s=3600, slide_s=1000)

    def test_salting_preserves_exact_counts(self, tdf):
        salted = tq.with_salted_key(tdf, "conv_id", buckets=8)
        two_stage = (
            salted.groupBy("conv_id__salted")
            .agg(F.count("*").alias("c"),
                 F.first(F.split("conv_id__salted", "#")[0]).alias("conv_id"))
            .groupBy("conv_id").agg(F.sum("c").alias("n"))
        )
        direct = tdf.groupBy("conv_id").agg(F.count("*").alias("n"))
        diff = two_stage.join(direct, "conv_id") \
            .filter(two_stage["n"] != direct["n"]).count()
        assert diff == 0

    def test_sketch_insensitive_to_salting(self, tdf):
        """Sketch merges make salting lossless: distinct-text estimate is
        identical whether or not rows were salted/repartitioned."""
        from hyperloglog_spark import hll_merged_sketch

        a = hll_merged_sketch(tdf, "text")
        b = hll_merged_sketch(
            tq.with_salted_key(tdf, "conv_id").repartition(16, "conv_id__salted"),
            "text",
        )
        assert a == b


class TestSessionize:
    def _frame(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        # user 1: gaps 10, 10, 5000, 10 -> sessions [0,0,0,1,1] at gap 100
        for i, off in enumerate([0, 10, 20, 5020, 5030]):
            rows.append((1, i, base + dt.timedelta(seconds=off)))
        # user 2: single event
        rows.append((2, 0, base))
        # user 3: gap exactly == gap_s stays in-session; +1s starts a new one
        rows.append((3, 0, base))
        rows.append((3, 1, base + dt.timedelta(seconds=100)))
        rows.append((3, 2, base + dt.timedelta(seconds=201)))
        return spark.createDataFrame(rows, ["uid", "eid", "ts"])

    def test_assignment_and_boundary(self, spark):
        out = tq.sessionize(
            self._frame(spark), "uid", "ts", gap_s=100, order_by="eid"
        )
        got = {
            (r["uid"], r["eid"]): r["session_idx"] for r in out.collect()
        }
        assert got == {
            (1, 0): 0, (1, 1): 0, (1, 2): 0, (1, 3): 1, (1, 4): 1,
            (2, 0): 0,
            (3, 0): 0, (3, 1): 0,  # gap == gap_s continues the session
            (3, 2): 1,             # gap_s + 1 starts a new one
        }

    def test_partitioning_invariant(self, spark):
        df = self._frame(spark)
        a = sorted(
            tq.sessionize(df, "uid", "ts", 100, order_by="eid").collect()
        )
        b = sorted(
            tq.sessionize(
                df.repartition(7), "uid", "ts", 100, order_by="eid"
            ).collect()
        )
        assert a == b

    def test_session_stats(self, spark):
        out = tq.session_stats(
            self._frame(spark), "uid", "ts", gap_s=100, order_by="eid"
        )
        got = {
            (r["uid"], r["session_idx"]): (r["n_events"], r["duration_ms"])
            for r in out.collect()
        }
        assert got == {
            (1, 0): (3, 20_000), (1, 1): (2, 10_000),
            (2, 0): (1, 0),
            (3, 0): (2, 100_000), (3, 1): (1, 0),
        }

    def test_one_shuffle(self, spark):
        """lag + running sum must share ONE Window shuffle+sort — the
        point of giving both the same window spec."""
        from hyperloglog_spark.engine.plans import assert_max_exchanges

        q = tq.sessionize(self._frame(spark), "uid", "ts", 100,
                          order_by="eid")
        assert_max_exchanges(q, 1)


def test_chunked_write_disjoint_conv_namespaces(tmp_path):
    """Uneven trailing chunk must not reuse earlier conv-id ranges
    (ADVICE round 1: per-chunk ci*convs_c offsets overlapped)."""
    import duckdb

    path = str(tmp_path / "chunked")
    # 3 chunks of 400/400/200 turns -> conv targets 40/40/20
    tgen.write(path, n_turns=1_000, n_convs=100, seed=5, n_files=3,
               chunk_turns=400)
    n_convs, n_rows = duckdb.sql(
        f"SELECT count(DISTINCT conv_id), count(*) FROM '{path}/*.parquet'"
    ).fetchone()
    assert n_rows == 1_000
    # disjoint namespaces: distinct convs ~= requested total (every chunk
    # touches nearly all of its Zipf range at 10 turns/conv)
    assert n_convs > 80, n_convs
    # dense turn_idx per conv survives chunking: max(turn_idx)+1 == count
    bad = duckdb.sql(
        f"""SELECT count(*) FROM (
             SELECT conv_id FROM '{path}/*.parquet'
             GROUP BY conv_id HAVING max(turn_idx) + 1 <> count(*)
                 OR count(DISTINCT turn_idx) <> count(*))"""
    ).fetchone()[0]
    assert bad == 0


def test_chunked_write_more_chunks_than_files(tmp_path):
    """When chunks outnumber n_files every chunk must still write its data
    (the old `or 1` clamp let the per-chunk file count go NEGATIVE there,
    silently dropping the leading chunks)."""
    import duckdb

    path = str(tmp_path / "manychunks")
    # 6 chunks of 200 turns, but only 3 files requested
    tgen.write(path, n_turns=1_200, n_convs=60, seed=3, n_files=3,
               chunk_turns=200, parallel=2)
    n_rows, n_convs = duckdb.sql(
        f"SELECT count(*), count(DISTINCT conv_id) FROM '{path}/*.parquet'"
    ).fetchone()
    assert n_rows == 1_200          # no chunk silently dropped
    assert n_convs > 40


class TestConversationIntegrity:
    def _df(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
        rows = [
            # c1: clean alternating conversation
            ("c1", 0, "user", s(0)), ("c1", 1, "assistant", s(1)),
            ("c1", 2, "user", s(2)), ("c1", 3, "assistant", s(3)),
            # c2: duplicate idx 1, ts inversion at idx 2, role repeat
            ("c2", 0, "user", s(0)), ("c2", 1, "assistant", s(5)),
            ("c2", 1, "assistant", s(6)), ("c2", 2, "user", s(3)),
            # c3: hole (idx 0, 2) and a role repeat
            ("c3", 0, "user", s(0)), ("c3", 2, "user", s(1)),
        ]
        return spark.createDataFrame(
            rows, ["conv_id", "turn_idx", "role", "ts"])

    def test_hand_cases(self, spark):
        from hyperloglog_spark.transcripts import conversation_integrity

        got = {r["conv_id"]: r.asDict() for r in conversation_integrity(
            self._df(spark), "conv_id", "turn_idx", "role", "ts").collect()}
        assert got["c1"] == {
            "conv_id": "c1", "n_turns": 4, "n_roles": 2, "dup_turn_idx": 0,
            "missing_turn_idx": 0, "ts_inversions": 0, "role_repeats": 0,
            "is_valid": True}
        c2 = got["c2"]
        assert c2["dup_turn_idx"] == 1
        assert c2["missing_turn_idx"] == 0   # idx {0,1,2}: no hole
        assert c2["ts_inversions"] == 1      # s(3) after s(6)
        assert c2["role_repeats"] == 1       # assistant, assistant
        assert not c2["is_valid"]
        c3 = got["c3"]
        assert c3["missing_turn_idx"] == 1 and c3["dup_turn_idx"] == 0
        assert c3["role_repeats"] == 1 and not c3["is_valid"]

    def test_single_exchange_plan(self, spark):
        from hyperloglog_spark.transcripts import conversation_integrity

        spark.catalog.clearCache()
        plan = conversation_integrity(
            self._df(spark), "conv_id", "turn_idx", "role", "ts"
        )._jdf.queryExecution().executedPlan().toString()
        # the groupBy(conv) must reuse the window's hash partitioning
        assert plan.count("Exchange") <= 1


def test_transition_counts_hand_case(spark):
    from hyperloglog_spark.transcripts import transition_counts

    rows = [("c1", 0, "a"), ("c1", 1, "b"), ("c1", 2, "a"),
            ("c2", 0, "a"), ("c2", 1, "a")]
    df = spark.createDataFrame(rows, ["conv", "idx", "tool"])
    got = {(r["from_state"], r["to_state"]): r["n_transitions"]
           for r in transition_counts(df, "conv", "idx", "tool").collect()}
    assert got == {(None, "a"): 2, ("a", "b"): 1, ("b", "a"): 1,
                   ("a", "a"): 1}


def test_conversation_fingerprints_order_and_partition_invariant(spark):
    from hyperloglog_spark.transcripts import conversation_fingerprints

    rows = [("c1", 0, "hello"), ("c1", 1, "world"),
            ("c2", 0, "hello"), ("c2", 1, "world"),
            ("c3", 1, "world"), ("c3", 0, "hello"),   # same multiset as c1
            ("c4", 0, "world"), ("c4", 1, "hello")]   # different pairing
    df = spark.createDataFrame(rows, ["conv", "idx", "text"])
    got = {r["conv"]: r["fingerprint"]
           for r in conversation_fingerprints(
               df, "conv", "idx", "text").collect()}
    assert got["c1"] == got["c2"] == got["c3"]  # multiset equality
    assert got["c4"] != got["c1"]               # (idx, text) pairing matters
    again = {r["conv"]: r["fingerprint"]
             for r in conversation_fingerprints(
                 df.repartition(7), "conv", "idx", "text").collect()}
    assert got == again


def test_salted_grouped_hll_byte_identical(spark):
    """Salted vs unsalted grouped HLL: the register-max monoid makes the
    32-way salted rollup byte-identical in its ESTIMATES to the direct
    grouped sketch (the skew-handling path loses nothing)."""
    from hyperloglog_spark import approx_distinct, hll_rollup, hll_sketch_agg
    from hyperloglog_spark.transcripts import with_salted_key

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    plain = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct(ev, "user_id", group_by="event_type").collect()
    }
    salted = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(
            hll_sketch_agg(
                with_salted_key(ev, "event_type", buckets=32,
                                salt_col="user_id"),
                "user_id", group_by=["event_type", "event_type__salted"],
            ),
            group_by="event_type",
        ).collect()
    }
    assert plain == salted
