"""Cohort retention + RFM scoring: hand-computed matrices, and the
distributed closed-form ntile must equal the real window function."""

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from caspr_spark.operators.retention import (_ntile_distributed,
                                             cohort_retention, rfm_scores)


class TestCohortRetention:
    def test_hand_computed_weekly_matrix(self, spark):
        rows = [
            # cohort of week 2024-01-01: users 1,2 — 1 returns in wk2
            (1, "2024-01-02 10:00:00"), (2, "2024-01-03 10:00:00"),
            (1, "2024-01-09 10:00:00"),
            # cohort of week 2024-01-08: user 3
            (3, "2024-01-10 10:00:00"),
        ]
        ev = spark.createDataFrame(rows, "user_id long, s string") \
            .select("user_id", F.to_timestamp("s").alias("ts"))
        out = cohort_retention(ev, "user_id", "ts", period="week")
        got = {(str(r.cohort), r.period_offset):
               (r.n_active, r.n_cohort, r.retention)
               for r in out.collect()}
        assert got == {
            ("2024-01-01", 0): (2, 2, 1.0),
            ("2024-01-01", 1): (1, 2, 0.5),
            ("2024-01-08", 0): (1, 1, 1.0),
        }

    def test_offset_zero_always_full(self, spark):
        ev = spark.createDataFrame(
            [(i, "2024-01-0%d 00:00:01" % (i % 5 + 1)) for i in range(20)],
            "user_id long, s string").select(
            "user_id", F.to_timestamp("s").alias("ts"))
        out = cohort_retention(ev, period="day")
        zero = out.filter(F.col("period_offset") == 0).collect()
        assert all(r.retention == 1.0 for r in zero)

    def test_validation(self, spark):
        ev = spark.createDataFrame([(1,)], "user_id long")
        with pytest.raises(ValueError, match="period"):
            cohort_retention(ev, period="month")


class TestRfmScores:
    def _events(self, spark, n_users=37, seed=0):
        rng = np.random.default_rng(seed)
        rows = []
        eid = 0
        for u in range(n_users):
            for _ in range(int(rng.integers(1, 6))):
                rows.append((eid, u,
                             1704067200 + int(rng.integers(0, 20 * 86400)),
                             round(float(rng.uniform(1, 100)), 2)))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, user_id long, sec long, value double") \
            .select("event_id", "user_id",
                    F.timestamp_seconds("sec").alias("ts"), "value")

    def test_closed_form_ntile_equals_window_ntile(self, spark):
        """The distributed prefix-scan + remainder rule must reproduce
        SQL ntile exactly, including the uneven-bucket remainder."""
        for n in (7, 35, 37):   # n % bins = 2, 0, 2
            df = spark.range(n).select(
                F.col("id"), (F.col("id") * 37 % 11).alias("k"))
            got = _ntile_distributed(df, [F.col("k").asc(),
                                          F.col("id").asc()],
                                     5, n, "b")
            w = Window.orderBy(F.col("k").asc(), F.col("id").asc())
            want = df.withColumn("b", F.ntile(5).over(w))
            g = {r.id: r.b for r in got.collect()}
            x = {r.id: r.b for r in want.collect()}
            assert g == x, n

    def test_fewer_rows_than_bins(self, spark):
        df = spark.range(3)
        got = _ntile_distributed(df, [F.col("id").asc()], 5, 3, "b")
        assert {r.id: r.b for r in got.collect()} == {0: 1, 1: 2, 2: 3}

    def test_scores_and_monetary(self, spark):
        ev = self._events(spark)
        out = rfm_scores(ev, asof="2024-02-01 00:00:00", n_bins=5)
        rows = out.collect()
        assert len(rows) == 37
        for r in rows:
            assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 \
                and 1 <= r.m_score <= 5
            assert r.rfm == f"{r.r_score}{r.f_score}{r.m_score}"
        # monetary equals the exact cents sum of that user's events
        sums = {r.user_id: r.s for r in ev.groupBy("user_id").agg(
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0)
            .alias("s")).collect()}
        for r in rows:
            assert r.monetary == pytest.approx(sums[r.user_id], abs=1e-9)

    def test_no_single_task_global_window(self, spark):
        """The plan must contain no unpartitioned Window node — the
        ranking runs through repartitionByRange + per-partition
        windows keyed on the partition id."""
        ev = self._events(spark)
        plan = rfm_scores(ev, asof="2024-02-01 00:00:00") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Window [ntile" not in plan
        assert "SinglePartition" not in plan.split("AdaptiveSparkPlan")[0] \
            or "broadcast" in plan.lower()

    def test_validation(self, spark):
        ev = self._events(spark, n_users=3)
        with pytest.raises(ValueError, match="n_bins"):
            rfm_scores(ev, n_bins=1)
