"""A6/A7 + sliding-window helpers — data-driven hyperparameter probes.

These answer "what seq_len / lookback should I use?" from the data itself.
All are small-output aggregations; safe at any scale.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def get_sequence_length(df: DataFrame, tgt_ids: list[str], percentile: float,
                        relative_error: float = 0.001) -> int:
    """``percentile`` of the per-entity event-count distribution (A6).

    Greenwald-Khanna approximate quantile, same relative error as the
    reference (caspr/utils/spark/preprocess.py:485-490).
    """
    counts = df.groupBy(*tgt_ids).count()
    return int(counts.approxQuantile(["count"], [percentile], relative_error)[0][0])


def get_lookback_period(df: DataFrame, user_id: str, activity_date: str,
                        max_avg_sequence_length: int,
                        latest_prediction_date: datetime | None = None) -> int:
    """Days of history needed for ~``max_avg_sequence_length`` events/entity (A7).

    Buckets the trailing four 30-day windows plus a catch-all bucket for
    anything older, averages events-per-active-user per bucket (the
    catch-all is INCLUDED in the mean, matching the reference exactly —
    on data much older than 120 days this skews the per-month rate, so
    prefer passing a recent ``latest_prediction_date``).
    Reference: caspr/utils/spark/preprocess.py:493-528.
    """
    if latest_prediction_date is None:
        latest_prediction_date = df.agg(F.max(activity_date)).collect()[0][0]

    spans = [latest_prediction_date - timedelta(days=30 * i) for i in range(5)]
    bracket = F.when(
        (F.col(activity_date) <= F.lit(spans[0])) & (F.col(activity_date) > F.lit(spans[1])), 0)
    for i in range(1, 4):
        bracket = bracket.when(
            (F.col(activity_date) <= F.lit(spans[i])) & (F.col(activity_date) > F.lit(spans[i + 1])), i)
    bracket = bracket.otherwise(-1)

    counts = (df.withColumn("date_bracket", bracket)
                .groupBy("date_bracket")
                .agg(F.countDistinct(user_id).alias("user_count"),
                     F.count(user_id).alias("total_count"))
                .withColumn("avg_count",
                            F.when(F.col("user_count") != 0,
                                   F.col("total_count") / F.col("user_count"))
                             .otherwise(F.lit(0.0)))
                .collect())
    avgs = [r["avg_count"] for r in counts]
    avg_per_month = sum(avgs) / len(avgs)
    return int(float(max_avg_sequence_length) * 30 / float(avg_per_month))


def column_cardinalities(df: DataFrame, cols: list[str]) -> dict[str, int]:
    """Exact distinct count per column in one agg pass (A11).

    Reference: ``get_num_activities`` (caspr/utils/spark/preprocess.py:25-44)
    and the pandas ``nunique`` twin (caspr/utils/preprocess.py:199-207) —
    both probe one column per job; this fits every column in a single
    distributed aggregate.
    """
    row = df.agg(*[F.countDistinct(F.col(c)).alias(c) for c in cols]).collect()[0]
    return {c: int(row[c]) for c in cols}


def distinct_values_sorted(df: DataFrame, column: str) -> DataFrame:
    """Distinct values of ``column`` with a deterministic 0-based index (A8).

    Reference: the collect-strategy encoder fit gathers ``collect_set`` per
    column and sorts for determinism (caspr/utils/spark/preprocess.py:331-339).
    Returned as rows ``(pos, value)`` — ``posexplode(sort_array(collect_set))``
    — rather than a driver-side list, so it composes with joins at scale.
    """
    return (df.na.drop(subset=[column])
              .agg(F.sort_array(F.collect_set(column)).alias("__vals"))
              .select(F.posexplode("__vals").alias("pos", column)))


def get_sliding_window_dates(df: DataFrame, data_rows_needed: int, user_id: str,
                             activity_date: str, history_days: int,
                             overlap_percentage: float,
                             latest_prediction_date: datetime | None = None) -> list[datetime]:
    """Cutoff dates for sliding-window trainset augmentation (X3 support).

    ``ceil(rows_needed / distinct_users)`` windows, strided by
    ``history * (1 - overlap)``. Reference: preprocess.py:468-482.
    """
    history_secs = history_days * 24 * 3600
    rows_available = df.select(user_id).distinct().count()
    window_count = int(data_rows_needed / rows_available) + 1
    if latest_prediction_date is None:
        latest_prediction_date = df.agg(F.max(activity_date)).collect()[0][0]
    stride = history_secs * (1 - overlap_percentage)
    return [datetime.fromtimestamp(int(latest_prediction_date.timestamp() - i * stride))
            for i in range(window_count)]
