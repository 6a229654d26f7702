"""A9/J5 — multi-hot label construction from a future activity window.

Reference: the pandas sliding-window trainset builder pivots the events in
``(train_end, label_end)`` into per-activity counts clipped to {0,1}
(``pd.pivot_table(index=id, columns=activity, aggfunc='size').clip_upper(1)``,
caspr/utils/preprocess.py:143-150), then joins them onto the feature rows
(J5, :152-159).

Spark-first shape: ``groupBy(id).pivot(activity, values).count()`` with an
explicit, deterministically-sorted value list — no value-discovery job when
the caller passes ``activities``; ``least(count, 1)`` clips; unseen
combinations fill 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_multi_hot_labels(df: DataFrame, tgt_id: list[str], activity_col: str,
                           activity_date: str | None = None,
                           label_start=None, label_end=None,
                           activities: list[str] | None = None,
                           prefix: str = "label_") -> DataFrame:
    """One row per entity: ``{prefix}{activity} ∈ {0,1}`` multi-hot labels.

    ``label_start``/``label_end`` bound the label window (exclusive /
    inclusive, matching the pandas twin's ``(train_end, label_end]``). Pass
    ``activities`` to pin the output schema (skips the distinct-discovery
    job — at 100 TB the label vocabulary is a constant, not a query).
    """
    if activity_date is not None:
        if label_start is not None:
            df = df.filter(F.col(activity_date) > F.lit(label_start))
        if label_end is not None:
            df = df.filter(F.col(activity_date) <= F.lit(label_end))
    if activities is None:
        activities = sorted(
            r[0] for r in df.select(activity_col).distinct().collect())
    pivoted = (df.groupBy(*tgt_id)
                 .pivot(activity_col, activities)
                 .count())
    for a in activities:
        pivoted = pivoted.withColumn(
            a, F.least(F.coalesce(F.col(f"`{a}`"), F.lit(0)), F.lit(1)).cast("int"))
    renamed = pivoted.withColumnsRenamed({a: f"{prefix}{a}" for a in activities})
    return renamed


def join_labels(features: DataFrame, labels: DataFrame, tgt_id: list[str],
                how: str = "inner") -> DataFrame:
    """Attach a label table to a feature table on the entity key (J5).

    Reference: caspr/utils/preprocess.py:152-159 (inner both directions).
    """
    return features.join(labels, on=tgt_id, how=how)
