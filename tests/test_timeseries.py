"""Tests for range join, time-bucket rollups, and the conversion funnel."""

import pytest
from pyspark.sql import functions as F

from caspr_spark.operators.joins import range_join
from caspr_spark.operators.timeseries import (
    continuous_rollup, funnel, hourly_aggregate, time_bucket,
)
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def intervals(spark):
    # overlapping windows, incl. one spanning several buckets and one empty
    return spark.createDataFrame(
        [(0, "2024-01-01 00:00:00", "2024-01-01 12:00:00"),
         (1, "2024-01-01 06:00:00", "2024-01-02 18:00:00"),
         (2, "2024-03-01 00:00:00", "2024-03-02 00:00:00")],
        "iv_id int, s string, e string") \
        .select("iv_id", F.to_timestamp("s").alias("start_ts"),
                F.to_timestamp("e").alias("end_ts"))


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(10, "2024-01-01 00:00:00"),   # == start of iv0 (inclusive)
         (11, "2024-01-01 07:30:00"),   # inside iv0 AND iv1
         (12, "2024-01-01 12:00:00"),   # == end of iv0 (exclusive) -> iv1 only
         (13, "2024-01-02 17:59:59"),   # tail of iv1
         (14, "2024-02-15 00:00:00")],  # matches nothing
        "ev_id int, s string") \
        .select("ev_id", F.to_timestamp("s").alias("ts"))


class TestRangeJoin:
    def test_matches_theta_join(self, points, intervals):
        got = range_join(points, intervals, bucket_hours=6) \
            .select("ev_id", "iv_id").collect()
        want = points.join(
            intervals,
            (points.ts >= intervals.start_ts) & (points.ts < intervals.end_ts)) \
            .select("ev_id", "iv_id").collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    def test_boundary_semantics(self, points, intervals):
        pairs = sorted(
            (r.ev_id, r.iv_id)
            for r in range_join(points, intervals, bucket_hours=6)
            .select("ev_id", "iv_id").collect())
        assert (10, 0) in pairs          # start inclusive
        assert (12, 0) not in pairs      # end exclusive
        assert (12, 1) in pairs
        assert (11, 0) in pairs and (11, 1) in pairs   # overlap -> both
        assert all(e != 14 for e, _ in pairs)

    def test_bucket_width_invariance(self, points, intervals):
        a = sorted((r.ev_id, r.iv_id) for r in
                   range_join(points, intervals, bucket_hours=1)
                   .select("ev_id", "iv_id").collect())
        b = sorted((r.ev_id, r.iv_id) for r in
                   range_join(points, intervals, bucket_hours=48)
                   .select("ev_id", "iv_id").collect())
        assert a == b

    def test_no_nested_loop_join(self, points, intervals):
        plan = plan_of(range_join(points, intervals, bucket_hours=6,
                                  broadcast_right=True))
        assert "BroadcastNestedLoop" not in plan
        assert "CartesianProduct" not in plan


class TestTimeBucket:
    def test_one_hour_is_date_trunc(self, spark):
        df = spark.createDataFrame([("2024-05-07 13:47:31",)], "s string") \
            .select(F.to_timestamp("s").alias("ts"))
        row = df.select(time_bucket("ts", "hour").alias("a"),
                        F.date_trunc("hour", "ts").alias("b")).first()
        assert row.a == row.b

    def test_n_hour_floor(self, spark):
        df = spark.createDataFrame(
            [("2024-05-07 13:47:31",), ("2024-05-07 11:59:59",)], "s string") \
            .select(F.to_timestamp("s").alias("ts"))
        got = [r.b.hour for r in
               df.select(time_bucket("ts", "hour", 6).alias("b")).collect()]
        assert got == [12, 6]


class TestContinuousRollup:
    def test_rollup_equals_direct_daily(self, spark, events):
        hourly = hourly_aggregate(events, "ts", ["event_type"], "value")
        daily = continuous_rollup(hourly, "day", ["event_type"])
        direct = (events.groupBy(
            F.date_trunc("day", "ts").alias("bucket_day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value")))
        key = lambda r: (r.bucket_day, r.event_type)
        got = {key(r): (r.n_events, r.sum_value)
               for r in daily.collect()}
        want = {key(r): (r.n_events, r.sum_value)
                for r in direct.collect()}
        assert got == want

    def test_weekly_from_hourly(self, spark, events):
        hourly = hourly_aggregate(events, "ts", [], "value")
        weekly = continuous_rollup(hourly, "week", [])
        total = weekly.agg(F.sum("n_events").alias("n")).first().n
        assert total == events.count()


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # u1 completes in order
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-02 00:00:00", "click"),
        (1, "2024-01-03 00:00:00", "buy"),
        # u2: click BEFORE its first view -> stalls at view
        (2, "2024-01-05 00:00:00", "click"),
        (2, "2024-01-06 00:00:00", "view"),
        (2, "2024-01-07 00:00:00", "buy"),
        # u3: buy without any click -> stalls at view
        (3, "2024-01-01 00:00:00", "view"),
        (3, "2024-01-02 00:00:00", "buy"),
        # u4: click at the SAME instant as view -> strictness blocks it
        (4, "2024-01-01 00:00:00", "view"),
        (4, "2024-01-01 00:00:00", "click"),
        # u5: never views -> not in the funnel at all
        (5, "2024-01-01 00:00:00", "click"),
        (5, "2024-01-02 00:00:00", "buy"),
    ]
    return spark.createDataFrame(rows, "user_id long, s string, event_type string") \
        .select("user_id", F.to_timestamp("s").alias("ts"), "event_type")


class TestFunnel:
    def test_ordered_strict_semantics(self, funnel_events):
        out = {r.stage: r.n_entities
               for r in funnel(funnel_events, ["view", "click", "buy"]).collect()}
        # view: u1..u4; click after view: u1 only (u2 clicked before its
        # view... but u2 has no click AFTER the view; u4 tied); buy: u1
        assert out == {"view": 4, "click": 1, "buy": 1}

    def test_stage_rows_and_order(self, funnel_events):
        rows = funnel(funnel_events, ["view", "click"]).orderBy("stage_idx") \
            .collect()
        assert [(r.stage_idx, r.stage) for r in rows] == [(0, "view"), (1, "click")]

    def test_conversion_window(self, funnel_events):
        # u1 clicks 1 day after view, buys 1 day after click; a 0-day
        # window kills both conversions, a 1-day window keeps them
        tight = {r.stage: r.n_entities for r in
                 funnel(funnel_events, ["view", "click", "buy"],
                        max_gap_days=0).collect()}
        assert tight == {"view": 4, "click": 0, "buy": 0}
        loose = {r.stage: r.n_entities for r in
                 funnel(funnel_events, ["view", "click", "buy"],
                        max_gap_days=1).collect()}
        assert loose == {"view": 4, "click": 1, "buy": 1}

    def test_monotone_nonincreasing(self, events):
        rows = funnel(events, ["view", "click", "purchase", "signup"]) \
            .orderBy("stage_idx").collect()
        counts = [r.n_entities for r in rows]
        assert counts == sorted(counts, reverse=True)


class TestDistinctSketch:
    def test_rollup_matches_exact_at_low_cardinality(self, spark, events):
        from pyspark.sql import functions as F
        from caspr_spark.operators.timeseries import (
            distinct_rollup, distinct_sketch_layer, distinct_total)
        layer = distinct_sketch_layer(events, "user_id",
                                      keys=["event_type"])
        tot = distinct_total(layer, keys=["event_type"])
        exact = events.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("exact"))
        for r in tot.join(exact, "event_type").collect():
            # sparse-mode HLL is exact at cardinalities << 2^lgk
            assert r["n_distinct"] == r["exact"]
        # daily rollup from the hourly layer == daily straight from raw
        day = distinct_rollup(layer, "day", keys=["event_type"])
        from caspr_spark.operators.timeseries import time_bucket
        direct = events.groupBy(
            time_bucket("ts", "day").alias("bucket_day"), "event_type") \
            .agg(F.countDistinct("user_id").alias("exact"))
        j = day.join(direct, ["bucket_day", "event_type"])
        assert j.filter("n_distinct != exact").count() == 0
        assert j.count() == day.count()

    def test_error_bound_at_high_cardinality(self, spark):
        from pyspark.sql import functions as F
        from caspr_spark.operators.timeseries import (
            distinct_sketch_layer, distinct_total)
        df = spark.range(200_000).select(
            F.col("id").alias("user_id"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400)
             .alias("ts"))
        layer = distinct_sketch_layer(df, "user_id")
        est = distinct_total(layer).collect()[0]["n_distinct"]
        # lgk=12 -> ~1.6% relative standard error; allow 4 sigma
        assert abs(est - 200_000) / 200_000 < 0.065

    def test_union_is_order_and_split_invariant(self, spark, events):
        """Sketch of the union == union of per-bucket sketches: the
        mergeability contract that makes the layer re-aggregable."""
        from caspr_spark.operators.timeseries import (
            distinct_sketch_layer, distinct_total)
        hourly = distinct_sketch_layer(events, "user_id", width="hour")
        weekly = distinct_sketch_layer(events, "user_id", width="week")
        a = distinct_total(hourly).collect()[0]["n_distinct"]
        b = distinct_total(weekly).collect()[0]["n_distinct"]
        assert a == b


class TestAttribution:
    def _events(self, spark):
        rows = [
            # user 1: view -> click -> purchase -> purchase
            (1, 1, "view", "2024-01-01 10:00:00"),
            (2, 1, "click", "2024-01-01 11:00:00"),
            (3, 1, "purchase", "2024-01-01 12:00:00"),
            (4, 1, "purchase", "2024-01-01 13:00:00"),
            # user 2: direct purchase, no touches
            (5, 2, "purchase", "2024-01-01 09:00:00"),
            # user 3: touch AFTER the purchase must not attribute
            (6, 3, "purchase", "2024-01-02 08:00:00"),
            (7, 3, "click", "2024-01-02 09:00:00"),
        ]
        return spark.createDataFrame(
            [(i, u, t, ts) for i, u, t, ts in rows],
            "event_id long, user_id long, event_type string, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")

    def test_last_touch(self, spark):
        from caspr_spark.operators.timeseries import attribute_conversions
        got = {r.event_id: r.touch_type for r in attribute_conversions(
            self._events(spark), tiebreak=["event_id"]).collect()}
        assert got == {3: "click", 4: "click", 5: None, 6: None}

    def test_first_touch(self, spark):
        from caspr_spark.operators.timeseries import attribute_conversions
        got = {r.event_id: r.touch_type for r in attribute_conversions(
            self._events(spark), model="first",
            tiebreak=["event_id"]).collect()}
        assert got == {3: "view", 4: "view", 5: None, 6: None}

    def test_validation(self, spark):
        from caspr_spark.operators.timeseries import attribute_conversions
        ev = self._events(spark)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="model"):
            attribute_conversions(ev, model="linear")
        with _pytest.raises(ValueError, match="touch_types"):
            attribute_conversions(ev, touch_types=())

    def test_same_ts_tiebreak_excludes_self_row(self, spark):
        # conversion at the same ts as a touch: ROWS frame ends 1
        # PRECEDING in (ts, event_id) order, so the touch with a lower
        # event_id at the same ts IS credited
        from caspr_spark.operators.timeseries import attribute_conversions
        ev = spark.createDataFrame(
            [(1, 1, "click", "2024-01-01 10:00:00"),
             (2, 1, "purchase", "2024-01-01 10:00:00")],
            "event_id long, user_id long, event_type string, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        got = attribute_conversions(ev, tiebreak=["event_id"]).collect()
        assert got[0].touch_type == "click"


class TestResample:
    def _ev(self, spark):
        rows = [
            (1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 11:00:00", 2.0),
            # gap on the 2nd
            (1, "2024-01-03 09:00:00", 4.0),
            (2, "2024-01-05 00:00:00", 7.0),
        ]
        return spark.createDataFrame(rows,
            "user_id long, ts_s string, value double") \
            .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")

    def test_zero_fill_and_grid(self, spark):
        from caspr_spark.operators.timeseries import resample_entities
        out = {(r.user_id, str(r.bucket)[:10]): r.value
               for r in resample_entities(
                   self._ev(spark), value_cols=["value"]).collect()}
        assert out == {(1, "2024-01-01"): 3.0, (1, "2024-01-02"): 0.0,
                       (1, "2024-01-03"): 4.0, (2, "2024-01-05"): 7.0}

    def test_ffill(self, spark):
        from caspr_spark.operators.timeseries import resample_entities
        out = {(r.user_id, str(r.bucket)[:10]): r.value
               for r in resample_entities(
                   self._ev(spark), value_cols=["value"],
                   fill="ffill").collect()}
        assert out[(1, "2024-01-02")] == 3.0   # carried forward

    def test_null_fill_and_count(self, spark):
        from caspr_spark.operators.timeseries import resample_entities
        out = {(r.user_id, str(r.bucket)[:10]): r.n_events
               for r in resample_entities(
                   self._ev(spark), agg="count", fill="null").collect()}
        assert out[(1, "2024-01-02")] is None
        assert out[(1, "2024-01-01")] == 2

    def test_validation(self, spark):
        from caspr_spark.operators.timeseries import resample_entities
        ev = self._ev(spark)
        with pytest.raises(ValueError, match="agg"):
            resample_entities(ev, value_cols=["value"], agg="median")
        with pytest.raises(ValueError, match="fill"):
            resample_entities(ev, value_cols=["value"], fill="bfill")
        with pytest.raises(ValueError, match="value_cols"):
            resample_entities(ev, agg="sum")
        with pytest.raises(ValueError, match="unit steps"):
            resample_entities(ev, value_cols=["value"], step="2 days")


class TestMultitouch:
    def _events(self, spark):
        rows = [
            # user 1, journey 0: three touches -> U-shape 0.4/0.2/0.4
            (1, 1, "view", "2024-01-01 08:00:00"),
            (2, 1, "click", "2024-01-01 09:00:00"),
            (3, 1, "view", "2024-01-01 10:00:00"),
            (4, 1, "purchase", "2024-01-01 12:00:00"),
            # user 1, journey 1: ONE touch after the first purchase
            (5, 1, "click", "2024-01-01 13:00:00"),
            (6, 1, "purchase", "2024-01-01 14:00:00"),
            # user 2: direct purchase
            (7, 2, "purchase", "2024-01-01 09:00:00"),
            # user 3: two touches
            (8, 3, "view", "2024-01-02 07:00:00"),
            (9, 3, "click", "2024-01-02 08:00:00"),
            (10, 3, "purchase", "2024-01-02 09:00:00"),
            # user 3 trailing touch with no later conversion: no credit
            (11, 3, "view", "2024-01-02 10:00:00"),
        ]
        return spark.createDataFrame(
            [(i, u, t, ts) for i, u, t, ts in rows],
            "event_id long, user_id long, event_type string, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")

    def test_position_model(self, spark):
        from caspr_spark.operators.timeseries import attribute_multitouch
        out = attribute_multitouch(self._events(spark), model="position",
                                   tiebreak=["event_id"]).collect()
        by_conv = {}
        for r in out:
            by_conv.setdefault(r.event_id, []).append(r)
        # journey 0 of user 1: 0.4 first, 0.2 middle, 0.4 last
        j0 = sorted(by_conv[4], key=lambda r: r.touch_ts)
        assert [r.credit for r in j0] == [0.4, 0.2, 0.4]
        assert [r.touch_type for r in j0] == ["view", "click", "view"]
        # journey 1: single touch gets 1.0, and it is the post-purchase click
        assert [(r.touch_type, r.credit) for r in by_conv[6]] == [("click", 1.0)]
        # direct conversion: null touch, credit 1.0
        assert by_conv[7][0].touch_type is None
        assert by_conv[7][0].credit == 1.0
        # two touches -> 0.5 / 0.5
        assert sorted(r.credit for r in by_conv[10]) == [0.5, 0.5]
        # trailing touch (event 11) appears in no journey
        assert all(r.touch_ts is None or r.touch_ts.hour != 10
                   for r in by_conv.get(10, []))

    def test_credit_sums_to_one_per_conversion(self, spark):
        from caspr_spark.operators.timeseries import attribute_multitouch
        for model in ("linear", "position", "time_decay"):
            out = attribute_multitouch(self._events(spark), model=model,
                                       tiebreak=["event_id"]).collect()
            sums = {}
            for r in out:
                sums[r.event_id] = sums.get(r.event_id, 0.0) + r.credit
            assert set(sums) == {4, 6, 7, 10}
            for v in sums.values():
                assert abs(v - 1.0) < 1e-6, (model, sums)

    def test_time_decay_prefers_recent(self, spark):
        from caspr_spark.operators.timeseries import attribute_multitouch
        out = attribute_multitouch(self._events(spark), model="time_decay",
                                   half_life=3600.0,
                                   tiebreak=["event_id"]).collect()
        j0 = sorted((r for r in out if r.event_id == 4),
                    key=lambda r: r.touch_ts)
        assert j0[0].credit < j0[1].credit < j0[2].credit
        # exact weights: deltas 4h/3h/2h at 1h half-life -> 2^-4,2^-3,2^-2
        w = [2.0 ** -4, 2.0 ** -3, 2.0 ** -2]
        expect = [round(x / sum(w), 9) for x in w]
        assert [r.credit for r in j0] == pytest.approx(expect, abs=1e-9)

    def test_validation(self, spark):
        from caspr_spark.operators.timeseries import attribute_multitouch
        with pytest.raises(ValueError, match="model"):
            attribute_multitouch(self._events(spark), model="shapley")
        with pytest.raises(ValueError, match="touch_types"):
            attribute_multitouch(self._events(spark), touch_types=())


class TestRollingFeatures:
    def _events(self, spark):
        rows = [
            (1, 1, 10.0, "2024-01-01 00:00:00"),
            (2, 1, 20.0, "2024-01-03 00:00:00"),
            (3, 1, 30.0, "2024-01-09 00:00:00"),   # 1 falls out of 7d here
            (4, 1, 40.0, "2024-01-09 00:00:00"),   # same ts as 3: excluded
            (5, 2, 5.5, "2024-01-05 00:00:00"),
        ]
        return spark.createDataFrame(
            [(i, u, v, ts) for i, u, v, ts in rows],
            "event_id long, user_id long, value double, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")

    def test_trailing_window_values(self, spark):
        from caspr_spark.operators.timeseries import rolling_features
        got = {r.event_id: r for r in
               rolling_features(self._events(spark)).collect()}
        # event 1: empty frame
        assert (got[1].count_7d, got[1].sum_7d, got[1].avg_7d) == (0, None, None)
        # event 2: sees event 1 only
        assert (got[2].count_7d, got[2].sum_7d, got[2].min_7d) == (1, 10.0, 10.0)
        # events 3 and 4 (same ts): event 1 is 8 days old -> out;
        # event 2 in; the SAME-ts sibling is excluded by the -1 bound
        for e in (3, 4):
            assert (got[e].count_7d, got[e].sum_7d, got[e].max_7d) == \
                (1, 20.0, 20.0), e
        # other entity unaffected
        assert got[5].count_7d == 0

    def test_include_current_and_suffix(self, spark):
        from caspr_spark.operators.timeseries import rolling_features
        got = {r.event_id: r for r in
               rolling_features(self._events(spark), window="30 days",
                                include_current=True, suffix="m").collect()}
        assert got[1].count_m == 1 and got[1].sum_m == 10.0
        assert got[4].count_m == 4 and got[4].sum_m == 100.0
        assert got[4].avg_m == 25.0

    def test_single_window_node_single_exchange(self, spark):
        import re

        from tests.test_plans import shuffle_count

        from caspr_spark.operators.timeseries import rolling_features
        plan = plan_of(rolling_features(self._events(spark)))
        assert shuffle_count(plan) == 1
        assert len(re.findall(r"^\s*\(\d+\) Window\s*$", plan,
                              re.M)) == 1

    def test_validation(self, spark):
        from caspr_spark.operators.timeseries import rolling_features
        with pytest.raises(ValueError, match="window"):
            rolling_features(self._events(spark), window="7")
        with pytest.raises(ValueError, match="unit"):
            rolling_features(self._events(spark), window="2 fortnights")


class TestQuantileSketch:
    def _events(self, spark, n=5000, users=1):
        import numpy as np
        rng = np.random.default_rng(7)
        vals = rng.uniform(0, 100, n)
        rows = [(i, float(vals[i]),
                 f"2024-01-0{1 + (i % 3)} {i % 24:02d}:00:01")
                for i in range(n)]
        return spark.createDataFrame(
            [(i, v, ts) for i, v, ts in rows],
            "event_id long, value double, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")

    def test_rollup_equals_direct_day_sketch(self, spark):
        """Bottom-k merge exactness: daily rollup OF the hourly layer
        == a layer built directly at day width."""
        from caspr_spark.operators.timeseries import (quantile_rollup,
                                                      quantile_sketch_layer)
        ev = self._events(spark)
        hourly = quantile_sketch_layer(ev, keys=[], width="hour",
                                       reservoir=32)
        via_rollup = quantile_rollup(hourly, width="day", keys=[],
                                     reservoir=32).collect()
        direct = quantile_rollup(
            quantile_sketch_layer(ev, keys=[], width="day", reservoir=32),
            width="day", keys=[], bucket_col="bucket_day",
            reservoir=32).collect()
        key = lambda r: r.bucket_day
        assert sorted([r.asDict() for r in via_rollup], key=lambda d: d["bucket_day"]) == \
            sorted([r.asDict() for r in direct], key=lambda d: d["bucket_day"])

    def test_exact_when_bucket_fits_reservoir(self, spark):
        """A bucket with <= R rows keeps EVERY value: sample quantile
        == exact quantile."""
        from caspr_spark.operators.timeseries import (quantile_rollup,
                                                      quantile_sketch_layer)
        ev = self._events(spark, n=40)      # 3 day-buckets, <=14 rows each
        out = quantile_rollup(
            quantile_sketch_layer(ev, keys=[], width="day", reservoir=64),
            width="day", keys=[], bucket_col="bucket_day",
            reservoir=64).collect()
        import numpy as np
        pdf = ev.toPandas()
        pdf["day"] = pdf.ts.dt.floor("D")
        for r in out:
            vals = np.sort(pdf[pdf.day == r.bucket_day].value.values)
            m = len(vals)
            assert r.n_events == m
            assert r.p50 == vals[max(1, int(np.ceil(0.5 * m))) - 1]
            assert r.p99 == vals[max(1, int(np.ceil(0.99 * m))) - 1]

    def test_error_bound(self, spark):
        """Sampled p50 within 4-sigma rank error of the exact median
        (R=256 over 5000 uniform values -> rank sd ~ sqrt(.25/256))."""
        from caspr_spark.operators.timeseries import (quantile_rollup,
                                                      quantile_sketch_layer)
        ev = self._events(spark, n=5000)
        out = quantile_rollup(
            quantile_sketch_layer(ev, keys=[], width="day", reservoir=256),
            width="day", keys=[], bucket_col="bucket_day",
            reservoir=256).collect()
        import numpy as np
        pdf = ev.toPandas()
        pdf["day"] = pdf.ts.dt.floor("D")
        tol = 4 * (0.25 / 256) ** 0.5          # rank-space 4 sigma
        for r in out:
            vals = pdf[pdf.day == r.bucket_day].value.values
            rank = (vals <= r.p50).mean()
            assert abs(rank - 0.5) < tol, (r.bucket_day, rank)


class TestNewOpPlans:
    """Plan-regression pins for the round-5 timeseries additions."""

    def _events(self, spark):
        return spark.createDataFrame(
            [(1, 1, "view", 1.0, "2024-01-01 00:00:00")],
            "event_id long, user_id long, event_type string, value double, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")

    def test_quantile_layer_skew_hardened(self, spark):
        from tests.test_plans import shuffle_count

        from caspr_spark.operators.timeseries import quantile_sketch_layer
        plan = plan_of(quantile_sketch_layer(self._events(spark),
                                             keys=["event_type"]))
        # the FULL input is only ever sorted under the salted 64-way
        # key; the (bucket, keys)-only window runs on the reduced
        # candidate set, and row counts come from a hash agg (map-side
        # combined), never a whole-partition window frame
        assert "__salt" in plan
        assert shuffle_count(plan) <= 4

    def test_multitouch_no_cartesian_no_python(self, spark):
        from caspr_spark.operators.timeseries import attribute_multitouch
        plan = plan_of(attribute_multitouch(self._events(spark)))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestReviewFixValidation:
    def test_multitouch_overlapping_types_raises(self, spark):
        from caspr_spark.operators.timeseries import attribute_multitouch
        df = spark.createDataFrame(
            [(1, 1, "purchase", "2024-01-01 00:00:00")],
            "event_id long, user_id long, event_type string, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        with pytest.raises(ValueError, match="touch_types"):
            attribute_multitouch(df, conversion_type="purchase",
                                 touch_types=("view", "purchase"))

    def test_rolling_rejects_nonpositive_span(self, spark):
        from caspr_spark.operators.timeseries import rolling_features
        df = spark.createDataFrame(
            [(1, 1, 1.0, "2024-01-01 00:00:00")],
            "event_id long, user_id long, value double, ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        for bad in ("0 days", "-3 days", "7.5 days"):
            with pytest.raises(ValueError, match="positive integer"):
                rolling_features(df, window=bad)


class TestTransitionMatrix:
    def test_counts_and_probabilities(self, spark):
        from caspr_spark.operators.timeseries import transition_matrix
        rows = [
            (1, 1, "a", "2024-01-01 00:00:00"),
            (2, 1, "b", "2024-01-01 01:00:00"),
            (3, 1, "a", "2024-01-01 02:00:00"),
            (4, 1, "c", "2024-01-01 03:00:00"),
            (5, 2, "a", "2024-01-01 00:00:00"),
            (6, 2, "b", "2024-01-01 01:00:00"),
            (7, 3, "z", "2024-01-01 00:00:00"),   # singleton: no pairs
        ]
        df = (spark.createDataFrame(
                rows, "event_id long, user_id long, event_type string, ts_s string")
              .withColumn("ts", F.col("ts_s").cast("timestamp"))
              .drop("ts_s"))
        out = {(r.from_type, r.to_type): (r.n, r.p)
               for r in transition_matrix(df, tiebreak=["event_id"]).collect()}
        # a->b twice (u1, u2), a->c once; b->a once
        assert out[("a", "b")] == (2, round(2 / 3, 9))
        assert out[("a", "c")] == (1, round(1 / 3, 9))
        assert out[("b", "a")] == (1, 1.0)
        # transitions never cross entities; singleton contributes nothing
        assert ("b", "z") not in out and ("z", "a") not in out
        assert ("c", "a") not in out       # u1 ends at c
        # rows normalize to 1 per from_type
        sums = {}
        for (f, _), (_, p) in out.items():
            sums[f] = sums.get(f, 0.0) + p
        for s in sums.values():
            assert abs(s - 1.0) < 1e-9


class TestEwmaSmooth:
    def _events(self, spark):
        rows = [(i, 1, float(i)) for i in range(6)]
        return spark.createDataFrame(rows, "event_id long, user_id long, "
                                     "value double").withColumn(
            "ts", F.timestamp_seconds(1704067200 + F.col("event_id")))

    def test_matches_pandas_ewm_adjust(self, spark):
        """With lags >= n-1 the truncated chain equals pandas
        ewm(adjust=True) exactly (same weights, same normalization)."""
        import pandas as pd
        from caspr_spark.operators.timeseries import ewma_smooth
        ev = self._events(spark)
        out = (ewma_smooth(ev, "user_id", "ts", "value", alpha=0.3,
                           lags=10, tiebreak=["event_id"])
               .orderBy("event_id").toPandas())
        want = (pd.Series([float(i) for i in range(6)])
                .ewm(alpha=0.3, adjust=True).mean())
        assert abs(out["ewma"].to_numpy() - want.to_numpy()).max() < 1e-8

    def test_truncation_window(self, spark):
        """lags=0 degenerates to the value itself."""
        from caspr_spark.operators.timeseries import ewma_smooth
        ev = self._events(spark)
        out = ewma_smooth(ev, "user_id", "ts", "value", alpha=0.4,
                          lags=0, tiebreak=["event_id"])
        got = {r.event_id: r.ewma for r in out.collect()}
        assert got == {i: float(i) for i in range(6)}

    def test_single_window_node(self, spark):
        from caspr_spark.operators.timeseries import ewma_smooth
        ev = self._events(spark)
        plan = ewma_smooth(ev, "user_id", "ts", "value", lags=8,
                           tiebreak=["event_id"]) \
            ._jdf.queryExecution().executedPlan().toString()
        import re
        assert len(re.findall(r"\bWindow\b", plan)) == 1
        assert len(re.findall(r"\bExchange\b", plan)) == 1

    def test_validation(self, spark):
        from caspr_spark.operators.timeseries import ewma_smooth
        ev = self._events(spark)
        with pytest.raises(ValueError, match="alpha"):
            ewma_smooth(ev, alpha=0.0)
        with pytest.raises(ValueError, match="lags"):
            ewma_smooth(ev, lags=-1)


class TestCountMinSketch:
    def _events(self, spark, n=400):
        rows = [(i, ["a", "b", "c", "hot"][i % 4] if i % 4 else "hot",
                 1704067200 + (i % 48) * 3600) for i in range(n)]
        return spark.createDataFrame(rows, "event_id long, k string, "
                                     "sec long").select(
            "event_id", "k", F.timestamp_seconds("sec").alias("ts"))

    def test_estimate_upper_bounds_truth_and_is_exact_when_sparse(self, spark):
        from caspr_spark.operators.timeseries import (cm_estimate,
                                                      cm_rollup,
                                                      cm_sketch_layer)
        ev = self._events(spark)
        layer = cm_sketch_layer(ev, "k", width="hour", depth=4, w=256)
        day = cm_rollup(layer, "day", bucket_col="bucket_hour")
        probes = ev.select("k").distinct()
        est = cm_estimate(day, probes, "k", depth=4, w=256,
                          bucket_col="bucket_day")
        got = {(str(r.bucket), r.k): r.est_cnt for r in est.collect()}
        true = {(str(r.bucket), r.k): r.cnt for r in
                ev.groupBy(F.date_trunc("day", "ts").alias("bucket"), "k")
                  .agg(F.count(F.lit(1)).alias("cnt")).collect()}
        assert set(got) == set(true)
        for key, t in true.items():
            assert got[key] >= t            # CM guarantee
        # 4 keys in 256 cells x 4 rows: no collision -> exact
        assert got == true

    def test_union_of_partial_layers_merges_exactly(self, spark):
        """A sketch that is a UNION of partial layers (per-source layers
        concatenated without a rollup) must estimate EXACTLY like the
        rolled-up sketch: cells are summed per hash row before the min —
        min over raw partial rows would take the smallest layer's count
        and underestimate, breaking the overcount-only guarantee."""
        from caspr_spark.operators.timeseries import (cm_estimate,
                                                      cm_sketch_layer)
        ev = self._events(spark)
        half_a = ev.filter(F.col("event_id") % 2 == 0)
        half_b = ev.filter(F.col("event_id") % 2 == 1)
        full = cm_sketch_layer(ev, "k", width="day", depth=4, w=256)
        parts = cm_sketch_layer(half_a, "k", width="day", depth=4,
                                w=256).union(
            cm_sketch_layer(half_b, "k", width="day", depth=4, w=256))
        probes = ev.select("k").distinct().limit(3)
        merged = {(str(r["bucket"]), r["k"]): r["est_cnt"]
                  for r in cm_estimate(full, probes, "k", depth=4, w=256,
                                       bucket_col="bucket_day").collect()}
        unioned = {(str(r["bucket"]), r["k"]): r["est_cnt"]
                   for r in cm_estimate(parts, probes, "k", depth=4,
                                        w=256, bucket_col="bucket_day")
                   .collect()}
        assert merged == unioned
        assert any(v > 0 for v in merged.values())

    def test_self_union_double_counts_but_never_undercounts(self, spark):
        """union(day, day) literally feeds every row twice, so the merged
        estimate is exactly 2x — overcount-only holds; the old behavior
        (min over duplicate rows) would have quietly returned the
        single-layer value for genuinely distinct partial layers."""
        from caspr_spark.operators.timeseries import (cm_estimate,
                                                      cm_sketch_layer)
        ev = self._events(spark)
        day = cm_sketch_layer(ev, "k", width="day", depth=4, w=256)
        probes = ev.select("k").distinct().limit(3)
        clean = {(str(r["bucket"]), r["k"]): r["est_cnt"]
                 for r in cm_estimate(day, probes, "k", depth=4, w=256,
                                      bucket_col="bucket_day").collect()}
        dup = {(str(r["bucket"]), r["k"]): r["est_cnt"]
               for r in cm_estimate(day.union(day), probes, "k", depth=4,
                                    w=256, bucket_col="bucket_day")
               .collect()}
        assert dup == {kk: 2 * v for kk, v in clean.items()}
        assert any(v > 0 for v in clean.values())

    def test_absent_probe_key_reports_zero_every_bucket(self, spark):
        """A probe key the corpus never saw must report est_cnt = 0 in
        EVERY bucket (any absent cell floors the min to 0) — not vanish
        from the output or pick up a collision-only estimate."""
        from caspr_spark.operators.timeseries import (cm_estimate,
                                                      cm_sketch_layer)
        ev = self._events(spark)
        day = cm_sketch_layer(ev, "k", width="day", depth=4, w=256)
        probes = spark.createDataFrame([("never-seen",)], "k string")
        est = cm_estimate(day, probes, "k", depth=4, w=256,
                          bucket_col="bucket_day")
        rows = est.collect()
        n_days = ev.select(F.date_trunc("day", "ts")).distinct().count()
        assert len(rows) == n_days
        assert all(r.est_cnt == 0 for r in rows)

    def test_partially_present_cells_floor_to_zero(self, spark):
        """With w=2 a dense corpus fills both cells of every row, so a
        never-seen probe key's cells ALL collide — the depth counter
        must see every cell present and report the plain min-over-cells
        collision bound, NOT the absent-cell floor of 0. The expected
        value is recomputed directly from the sketch cells, so a
        regression in the depth-counter logic (flooring valid estimates
        to 0, or min-ing over a partial cell set) fails the equality."""
        from caspr_spark.operators.timeseries import (_cm_cell,
                                                      cm_estimate,
                                                      cm_sketch_layer)
        ev = self._events(spark)
        day = cm_sketch_layer(ev, "k", width="day", depth=4, w=2)
        probes = spark.createDataFrame([("never-seen",)], "k string")
        est = cm_estimate(day, probes, "k", depth=4, w=2,
                          bucket_col="bucket_day")
        # the probe key's cell per hash row, straight from the cell rule
        crow = probes.select(*[_cm_cell("k", d, 2).alias(f"c{d}")
                               for d in range(4)]).first()
        cells = {d: crow[f"c{d}"] for d in range(4)}
        sk = {(str(r["bucket_day"]), r["d"], r["cell"]): r["cnt"]
              for r in day.collect()}
        got = {str(r["bucket"]): r["est_cnt"] for r in est.collect()}
        assert got                         # every bucket reports a row
        for b in got:
            want = min(sk.get((b, d, cells[d]), 0) for d in range(4))
            # dense w=2 corpus: all 4 cells hit -> strictly positive
            # collision bound, which the estimate must equal exactly
            assert want > 0
            assert got[b] == want, b

    def test_rollup_merge_equals_direct_sketch(self, spark):
        """Cell-wise integer addition is an EXACT merge: the day rollup
        of the hour layer equals the sketch built at day width."""
        from caspr_spark.operators.timeseries import (cm_rollup,
                                                      cm_sketch_layer)
        ev = self._events(spark)
        rolled = cm_rollup(cm_sketch_layer(ev, "k", width="hour"),
                           "day", bucket_col="bucket_hour")
        direct = cm_sketch_layer(ev, "k", width="day")
        a = {(str(r[0]), r.d, r.cell): r.cnt for r in rolled.collect()}
        b = {(str(r[0]), r.d, r.cell): r.cnt for r in direct.collect()}
        assert a == b

    def test_layer_size_independent_of_cardinality(self, spark):
        from caspr_spark.operators.timeseries import cm_sketch_layer
        rows = [(i, f"key{i}", 1704067200) for i in range(5000)]
        ev = spark.createDataFrame(rows, "event_id long, k string, sec long") \
            .select("event_id", "k", F.timestamp_seconds("sec").alias("ts"))
        layer = cm_sketch_layer(ev, "k", width="hour", depth=4, w=64)
        assert layer.count() <= 4 * 64     # bounded by depth*w, not keys

    def test_validation(self, spark):
        from caspr_spark.operators.timeseries import cm_sketch_layer
        ev = self._events(spark, n=4)
        with pytest.raises(ValueError, match="depth"):
            cm_sketch_layer(ev, "k", depth=0)
