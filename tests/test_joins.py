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
