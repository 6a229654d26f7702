"""Tests for as-of join, salted join, and bucketed co-located joins."""

import re

import pytest
from pyspark.sql import functions as F

from caspr_spark.operators.joins import asof_join, salted_join
from caspr_spark.sources import write_bucketed_table
from tests.test_plans import plan_of, shuffle_count


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [(1, "2024-01-01 10:00:05", 100.0), (1, "2024-01-01 10:00:20", 101.0),
         (2, "2024-01-01 10:00:03", 50.0), (2, "2024-01-01 09:00:00", 49.0),
         (3, "2024-01-01 10:00:00", 7.0)],
        "sym long, ts_s string, px double") \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    quotes = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 99.5), (1, "2024-01-01 10:00:10", 100.5),
         (2, "2024-01-01 10:00:03", 49.9),
         (3, "2024-01-02 00:00:00", 7.5)],
        "sym long, ts_s string, bid double") \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    return quotes, trades


class TestAsofJoin:
    def test_backward_semantics(self, quotes_trades):
        quotes, trades = quotes_trades
        out = asof_join(trades, quotes, on=["sym"], value_cols=["bid"])
        got = {(r["sym"], r["px"]): r["bid_asof"] for r in out.collect()}
        assert got[(1, 100.0)] == 99.5    # 10:00:05 -> quote 10:00:00
        assert got[(1, 101.0)] == 100.5   # 10:00:20 -> quote 10:00:10
        assert got[(2, 50.0)] == 49.9     # equal ts matches (<=)
        assert got[(2, 49.0)] is None     # no earlier quote
        assert got[(3, 7.0)] is None      # only later quote exists

    def test_tolerance(self, quotes_trades):
        quotes, trades = quotes_trades
        out = asof_join(trades, quotes, on=["sym"], value_cols=["bid"],
                        tolerance_days=0)
        got = {(r["sym"], r["px"]): r["bid_asof"] for r in out.collect()}
        assert got[(1, 100.0)] == 99.5    # same day -> kept
        assert got[(2, 49.0)] is None

    def test_forward_semantics(self, quotes_trades):
        quotes, trades = quotes_trades
        out = asof_join(trades, quotes, on=["sym"], value_cols=["bid"],
                        direction="forward")
        got = {(r["sym"], r["px"]): r["bid_asof"] for r in out.collect()}
        assert got[(1, 100.0)] == 100.5   # 10:00:05 -> next quote 10:00:10
        assert got[(1, 101.0)] is None    # no later quote
        assert got[(2, 50.0)] == 49.9     # equal ts matches (>=)
        assert got[(2, 49.0)] == 49.9     # 09:00 -> next quote 10:00:03
        assert got[(3, 7.0)] == 7.5       # later quote exists forward

    def test_forward_tolerance(self, quotes_trades):
        quotes, trades = quotes_trades
        out = asof_join(trades, quotes, on=["sym"], value_cols=["bid"],
                        direction="forward", tolerance_days=0)
        got = {(r["sym"], r["px"]): r["bid_asof"] for r in out.collect()}
        assert got[(2, 49.0)] == 49.9     # same day forward -> kept
        assert got[(3, 7.0)] is None      # next day -> nulled by tolerance

    def test_bad_direction(self, quotes_trades):
        quotes, trades = quotes_trades
        with pytest.raises(ValueError, match="backward|forward"):
            asof_join(trades, quotes, on=["sym"], direction="nearest")

    def test_single_shuffle(self, quotes_trades):
        quotes, trades = quotes_trades
        plan = plan_of(asof_join(trades, quotes, on=["sym"], value_cols=["bid"]))
        # union + window: one hash exchange on the key, no join at all
        assert shuffle_count(plan) == 1
        assert "Join" not in plan

    def test_matches_duckdb_asof(self, events, spark):
        """Spark asof_join == DuckDB's native ASOF JOIN on real data."""
        import duckdb
        purch = (events.filter(F.col("event_type") == "purchase")
                 .groupBy("user_id", "ts").agg(F.max("value").alias("pval")))
        out = asof_join(events, purch, on=["user_id"], value_cols=["pval"]) \
            .select("event_id", "pval_asof").toPandas() \
            .sort_values("event_id").reset_index(drop=True)

        con = duckdb.connect()
        ev = events.toPandas()
        con.register("ev", ev)
        want = con.sql("""
            WITH p AS (SELECT user_id, ts, max(value) AS pval FROM ev
                       WHERE event_type = 'purchase' GROUP BY 1, 2)
            SELECT e.event_id, p.pval AS pval_asof
            FROM ev e ASOF LEFT JOIN p
              ON e.user_id = p.user_id AND p.ts <= e.ts
            ORDER BY e.event_id""").df()
        assert len(out) == len(want)
        a = out["pval_asof"].fillna(-1).values
        b = want["pval_asof"].fillna(-1).values
        assert (abs(a - b) < 1e-9).all()


class TestSaltedJoin:
    def test_same_result_as_plain_join(self, events, spark):
        dim = events.groupBy("event_type").agg(F.avg("value").alias("avg_v"))
        plain = events.join(dim, on="event_type").agg(
            F.count("*"), F.round(F.sum(F.col("value") * F.col("avg_v")), 4)
        ).collect()[0]
        salted = salted_join(events, dim, on=["event_type"], salt=4).agg(
            F.count("*"), F.round(F.sum(F.col("value") * F.col("avg_v")), 4)
        ).collect()[0]
        assert tuple(plain) == tuple(salted)


class TestBucketedJoin:
    def test_colocated_join_no_shuffle(self, events, spark):
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t1 = write_bucketed_table(
                events.select("event_id", "user_id", "value"),
                "t_bucket_events", ["user_id"], num_buckets=8,
                sort_cols=["user_id"])
            t2 = write_bucketed_table(
                events.groupBy("user_id").agg(F.count("*").alias("n")),
                "t_bucket_users", ["user_id"], num_buckets=8,
                sort_cols=["user_id"])
            joined = t1.join(t2, on="user_id")
            plan = plan_of(joined)
            assert shuffle_count(plan) == 0   # co-located: no exchange
            assert joined.count() == events.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS t_bucket_events")
            spark.sql("DROP TABLE IF EXISTS t_bucket_users")


class TestAsofReviewRegressions:
    def test_null_value_in_latest_right_row_not_resurrected(self, spark):
        from pyspark.sql import functions as F
        from caspr_spark.operators.joins import asof_join
        right = spark.createDataFrame(
            [(1, "2024-01-01", 5.0), (1, "2024-04-10", None)],
            "k long, ts_s string, bid double") \
            .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
        left = spark.createDataFrame([(1, "2024-04-11")], "k long, ts_s string") \
            .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
        out = asof_join(left, right, on=["k"], value_cols=["bid"],
                        tolerance_days=2)
        # latest right row HAS null bid: result must be NULL, not the
        # 100-day-old 5.0 validated against the newest timestamp
        assert out.collect()[0]["bid_asof"] is None

    def test_multi_value_cols_no_row_tearing(self, spark):
        from pyspark.sql import functions as F
        from caspr_spark.operators.joins import asof_join
        right = spark.createDataFrame(
            [(1, "2024-01-01", 5.0, 50.0), (1, "2024-02-01", None, 60.0)],
            "k long, ts_s string, bid double, ask double") \
            .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
        left = spark.createDataFrame([(1, "2024-03-01")], "k long, ts_s string") \
            .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
        r = asof_join(left, right, on=["k"], value_cols=["bid", "ask"]) \
            .collect()[0]
        # both values come from the SAME (latest) right row
        assert r["bid_asof"] is None and r["ask_asof"] == 60.0


class TestDedupReviewRegressions:
    def test_bands_must_divide(self, spark, documents):
        from caspr_spark.llm.dedup import minhash_lsh_dedup
        import pytest as _pytest
        with _pytest.raises(ValueError):
            minhash_lsh_dedup(documents, num_hashes=64, bands=12)

    def test_minhash_slots_decorrelated(self, documents):
        """With mod-p slots, distinct docs should NOT share most slots."""
        import numpy as np
        from caspr_spark.llm.dedup import minhash_signatures
        sigs = minhash_signatures(documents, num_hashes=64).limit(20).collect()
        S = np.array([r["minhash"] for r in sigs])
        # fraction of matching slots between different docs ~ their
        # jaccard (low); correlated slots would push this toward 1
        frac = np.mean([(S[i] == S[j]).mean()
                        for i in range(len(S)) for j in range(i + 1, len(S))])
        assert frac < 0.5

    def test_cc_nonconvergence_raises(self, spark):
        from caspr_spark.llm.dedup import connected_components
        chain = spark.createDataFrame([(i, i + 1) for i in range(10)],
                                      "id_a long, id_b long")
        import pytest as _pytest
        with _pytest.raises(RuntimeError):
            connected_components(chain, max_iter=3, strict=True)
        # non-strict completes with a warning instead
        out = connected_components(chain, max_iter=3, strict=False)
        assert out.count() == 11


class TestMetricsEmpty:
    def test_classification_report_empty(self, spark):
        from caspr_spark.metrics import classification_report
        df = spark.createDataFrame([], "y int, pred int")
        rep = classification_report(df, "y", "pred")
        assert rep["accuracy"] == 0.0 and rep["f1"] == 0.0


class TestBloomSemiJoin:
    """bloom_semi_join must be bit-identical to the plain semi/anti join —
    the bloom prefilter only prunes, never decides."""

    @pytest.fixture(scope="class")
    def sides(self, spark):
        from pyspark.sql import functions as F2
        left = spark.range(0, 3000).select(
            F2.col("id").alias("k"), (F2.col("id") % 13).alias("v"))
        right = spark.range(0, 3000, 11).select(F2.col("id").alias("k"))
        return left, right

    def test_semi_equals_plain(self, sides):
        from caspr_spark.operators.joins import bloom_semi_join
        left, right = sides
        got = sorted(r.k for r in
                     bloom_semi_join(left, right, "k", n_items=300).collect())
        want = sorted(r.k for r in left.join(right, "k", "left_semi").collect())
        assert got == want

    def test_anti_equals_plain(self, sides):
        from caspr_spark.operators.joins import bloom_semi_join
        left, right = sides
        got = sorted(r.k for r in
                     bloom_semi_join(left, right, "k", n_items=300,
                                     how="left_anti").collect())
        want = sorted(r.k for r in left.join(right, "k", "left_anti").collect())
        assert got == want

    def test_undersized_filter_still_exact(self, sides):
        # n_items far too small -> high fpp -> prefilter keeps extra rows,
        # but the scrub join must still produce the exact result
        from caspr_spark.operators.joins import bloom_semi_join
        left, right = sides
        got = sorted(r.k for r in
                     bloom_semi_join(left, right, "k", n_items=4).collect())
        want = sorted(r.k for r in left.join(right, "k", "left_semi").collect())
        assert got == want

    def test_empty_right(self, sides):
        from caspr_spark.operators.joins import bloom_semi_join
        left, right = sides
        assert bloom_semi_join(left, right.filter("k < 0"), "k",
                               n_items=1).count() == 0

    def test_probe_is_codegen_prefilter(self, sides):
        # the probe must be a native Filter (shiftrightunsigned over the
        # word-array literal) with no Python eval anywhere in the plan
        from caspr_spark.operators.joins import bloom_semi_join
        left, right = sides
        plan = plan_of(bloom_semi_join(left, right, "k", n_items=300))
        assert "shiftrightunsigned" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_rejects_outer(self, sides):
        from caspr_spark.operators.joins import bloom_semi_join
        left, right = sides
        with pytest.raises(ValueError, match="left_semi/left_anti"):
            bloom_semi_join(left, right, "k", n_items=10, how="inner")

    def test_mismatched_int_dtypes_no_false_negatives(self, sides):
        # xxhash64 is type-sensitive: int vs bigint keys hash differently,
        # so without reconciliation the prefilter would silently drop every
        # matching row. The widening cast must make bloom == plain join.
        from pyspark.sql import functions as F2
        from caspr_spark.operators.joins import bloom_semi_join
        left, right = sides
        left_int = left.withColumn("k", F2.col("k").cast("int"))
        got = sorted(r.k for r in
                     bloom_semi_join(left_int, right, "k", n_items=300).collect())
        want = sorted(r.k for r in
                      left_int.join(right, "k", "left_semi").collect())
        assert got == want and len(got) > 0

    def test_mismatched_string_dtype_raises(self, sides):
        from pyspark.sql import functions as F2
        from caspr_spark.operators.joins import bloom_semi_join
        left, right = sides
        with pytest.raises(ValueError, match="dtypes differ"):
            bloom_semi_join(left.withColumn("k", F2.col("k").cast("string")),
                            right, "k", n_items=10)

    def test_filter_size_clamp_warns_and_stays_exact(self, sides):
        import warnings as w
        import caspr_spark.operators.joins as joins_mod
        left, right = sides
        orig = joins_mod._BLOOM_MAX_BITS
        joins_mod._BLOOM_MAX_BITS = 1 << 12  # 4096 bits, forces the clamp
        try:
            with w.catch_warnings(record=True) as caught:
                w.simplefilter("always")
                got = sorted(r.k for r in joins_mod.bloom_semi_join(
                    left, right, "k", n_items=3000).collect())
            assert any("clamping" in str(c.message) for c in caught)
            want = sorted(r.k for r in
                          left.join(right, "k", "left_semi").collect())
            assert got == want
        finally:
            joins_mod._BLOOM_MAX_BITS = orig


class TestIntervalOverlapJoin:
    def _mk(self, spark, rows, cols):
        return spark.createDataFrame(rows, cols)

    def test_hand_computed_overlaps(self, spark):
        from caspr_spark.operators import interval_overlap_join
        L = self._mk(spark, [
            (1, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
            (2, "2024-01-05 12:00:00", "2024-01-06 00:00:00"),
            (3, "2024-01-10 00:00:00", "2024-01-11 00:00:00"),
        ], "lid long, a string, b string").select(
            "lid", F.to_timestamp("a").alias("ls"),
            F.to_timestamp("b").alias("le"))
        R = self._mk(spark, [
            (10, "2024-01-02 00:00:00", "2024-01-06 00:00:00"),
            (20, "2024-01-06 00:00:00", "2024-01-07 00:00:00"),
        ], "rid long, a string, b string").select(
            "rid", F.to_timestamp("a").alias("rs"),
            F.to_timestamp("b").alias("re"))
        out = interval_overlap_join(L, R, "ls", "le", "rs", "re",
                                    bucket_hours=24)
        got = {(r.lid, r.rid) for r in out.collect()}
        # 1 overlaps 10; 2 overlaps 10 (ends exactly at 10's end -> half
        # open, le=06:00? no: 2 ends 01-06 00:00 == start of 20 -> NOT 20);
        # 3 overlaps nothing
        assert got == {(1, 10), (2, 10)}

    def test_no_duplicate_pairs_across_shared_buckets(self, spark):
        """A pair sharing many buckets must appear exactly once (the
        first-shared-bucket rule replaces a global distinct)."""
        from caspr_spark.operators import interval_overlap_join
        L = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", "2024-01-20 00:00:00")],
            "lid long, a string, b string").select(
            "lid", F.to_timestamp("a").alias("ls"),
            F.to_timestamp("b").alias("le"))
        R = spark.createDataFrame(
            [(9, "2024-01-02 00:00:00", "2024-01-18 00:00:00")],
            "rid long, a string, b string").select(
            "rid", F.to_timestamp("a").alias("rs"),
            F.to_timestamp("b").alias("re"))
        out = interval_overlap_join(L, R, "ls", "le", "rs", "re",
                                    bucket_hours=6)
        assert out.count() == 1

    def test_matches_theta_join_on_random_intervals(self, spark):
        import random
        from caspr_spark.operators import interval_overlap_join
        rnd = random.Random(3)
        base = 1704067200

        def mk(n, pfx):
            rows = []
            for i in range(n):
                s = base + rnd.randrange(0, 30 * 86400)
                rows.append((i, s, s + rnd.randrange(3600, 5 * 86400)))
            return spark.createDataFrame(
                rows, f"{pfx}id long, s long, e long").select(
                f"{pfx}id", F.timestamp_seconds("s").alias(f"{pfx}s"),
                F.timestamp_seconds("e").alias(f"{pfx}e"))
        L, R = mk(40, "l"), mk(40, "r")
        got = {(r.lid, r.rid) for r in interval_overlap_join(
            L, R, "ls", "le", "rs", "re", bucket_hours=48).collect()}
        want = {(r.lid, r.rid) for r in L.crossJoin(R).filter(
            (F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")))
            .collect()}
        assert got == want

    def test_validation(self, spark):
        from caspr_spark.operators import interval_overlap_join
        df = spark.createDataFrame([(1,)], "x long")
        with pytest.raises(ValueError, match="collision"):
            interval_overlap_join(df, df, "x", "x", "x", "x")
        with pytest.raises(ValueError, match="bucket_hours"):
            interval_overlap_join(df, df.withColumnRenamed("x", "y"),
                                  "x", "x", "y", "y", bucket_hours=0)

    def test_span_guard_raises(self, spark):
        from caspr_spark.operators import interval_overlap_join
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import SparkRuntimeException
        L = spark.createDataFrame(
            [(1, "2020-01-01 00:00:00", "2024-01-01 00:00:00")],
            "lid long, a string, b string").select(
            "lid", F.to_timestamp("a").alias("ls"),
            F.to_timestamp("b").alias("le"))
        R = spark.createDataFrame(
            [(9, "2020-01-02 00:00:00", "2020-01-03 00:00:00")],
            "rid long, a string, b string").select(
            "rid", F.to_timestamp("a").alias("rs"),
            F.to_timestamp("b").alias("re"))
        with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                           match="spans"):
            interval_overlap_join(L, R, "ls", "le", "rs", "re",
                                  bucket_hours=1,
                                  max_span_buckets=100).collect()


class TestSortedNeighborhood:
    def _df(self, spark, names):
        return spark.createDataFrame(list(enumerate(names)),
                                     "id long, name string")

    def test_catches_first_char_typo_prefix_blocking_misses(self, spark):
        from caspr_spark.operators.joins import (fuzzy_join,
                                                 sorted_neighborhood_pairs)
        names = ["walter", "valter", "zzz unrelated", "aaa other"]
        df = self._df(spark, names)
        snp = sorted_neighborhood_pairs(df, "name", id_col="id",
                                        window=2, max_distance=1)
        got = {(r.id_a, r.id_b) for r in snp.collect()}
        assert (1, 0) in got or (0, 1) in got   # valter ~ walter adjacent
        # prefix blocking misses it: first char differs
        fj = fuzzy_join(df.select(F.col("id").alias("lid"),
                                  F.col("name").alias("lname")),
                        df.select("id", "name"), "lname", "name",
                        max_distance=1, block_len=3)
        pairs = {(r.lid, r.id) for r in fj.collect() if r.lid != r.id}
        assert not any(p in pairs for p in [(0, 1), (1, 0)])

    def test_window_bound_is_the_stated_recall_limit(self, spark):
        from caspr_spark.operators.joins import sorted_neighborhood_pairs
        # sort order: abc1 < abc2 < abc3; window 1 pairs only adjacents
        df = self._df(spark, ["abc1", "abc2", "abc3"])
        got = {(r.id_a, r.id_b)
               for r in sorted_neighborhood_pairs(
                   df, "name", id_col="id", window=1,
                   max_distance=2).collect()}
        assert got == {(0, 1), (1, 2)}          # (0,2) beyond the window

    def test_candidate_count_is_window_times_n(self, spark):
        from caspr_spark.operators.joins import sorted_neighborhood_pairs
        df = self._df(spark, [f"name{i:03d}" for i in range(50)])
        out = sorted_neighborhood_pairs(df, "name", id_col="id", window=3)
        # no threshold: every in-range neighbor pair appears exactly once
        assert out.count() == 3 * 50 - (1 + 2 + 3)

    def test_deterministic_across_runs(self, spark):
        from caspr_spark.operators.joins import sorted_neighborhood_pairs
        df = self._df(spark, [f"n{i % 7}x{i}" for i in range(40)])
        a = {tuple(r) for r in sorted_neighborhood_pairs(
            df, "name", id_col="id", window=2).collect()}
        b = {tuple(r) for r in sorted_neighborhood_pairs(
            df, "name", id_col="id", window=2).collect()}
        assert a == b

    def test_validation(self, spark):
        from caspr_spark.operators.joins import sorted_neighborhood_pairs
        df = self._df(spark, ["a"])
        with pytest.raises(ValueError, match="window"):
            sorted_neighborhood_pairs(df, "name", id_col="id", window=0)
