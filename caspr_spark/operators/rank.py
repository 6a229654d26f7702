"""W1/W2 — per-entity event ranking and inter-event intervals.

Scale notes: both operators are single window shuffles partitioned by the
entity key — the natural partitioning for everything downstream (pivot,
profile join), so Catalyst reuses the exchange. No global windows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def get_rank(df: DataFrame, tgt_id: list[str], activity_date: str,
             tiebreak: list[str] | None = None) -> DataFrame:
    """Add ``seq_len``, ``rank_desc``, ``rank_asc`` per entity (W1).

    Semantics match the reference (caspr/utils/spark/preprocess.py:531-539):
    ``seq_len = count(ts) over (partition by tgt_id)``,
    ``rank_desc = row_number() ordered by ts desc`` (1 = most recent),
    ``rank_asc = seq_len - rank_desc + 1`` (1 = oldest) — so the invariant
    ``rank_asc + rank_desc == seq_len + 1`` always holds.

    ``tiebreak`` columns extend the ordering so duplicate timestamps rank
    deterministically (ordered descending, i.e. a larger tiebreak value is
    treated as the later event); the reference omits this and is
    nondeterministic under ties.

    NULL activity dates: ``seq_len`` counts non-null dates (SQL count
    semantics, same as the reference) while ``row_number`` ranks every
    row, so the invariant only holds when null-date rows are dropped
    first (F6) — the featurization pipeline's history filter already
    excludes them.
    """
    keys = [F.col(c) for c in tgt_id]
    order = [F.col(activity_date).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys)
    w_desc = w.orderBy(*order)
    return (
        df.withColumn("seq_len", F.count(activity_date).over(w))
          .withColumn("rank_desc", F.row_number().over(w_desc))
          .withColumn("rank_asc", F.col("seq_len") - F.col("rank_desc") + 1)
    )


def sessionize(df: DataFrame, tgt_id: list[str] | str, activity_date: str,
               gap_minutes: int = 30, session_col: str = "session_id",
               tiebreak: list[str] | None = None) -> DataFrame:
    """Assign per-entity session ids: a new session starts whenever the gap
    to the previous event exceeds ``gap_minutes``.

    The classic event-log operator (absent from the reference, whose
    interval featurization W2 stops at raw gaps): one lag + one running
    sum over the same entity-partitioned window — a single shuffle that
    downstream per-session aggregations reuse. Sessions number 1..k per
    entity in time order.
    """
    if isinstance(tgt_id, str):
        tgt_id = [tgt_id]
    order = [F.col(activity_date)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*[F.col(c) for c in tgt_id]).orderBy(*order)
    gap = (F.unix_timestamp(F.col(activity_date))
           - F.unix_timestamp(F.lag(F.col(activity_date), 1).over(w)))
    new_session = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
         .cast("int"))


def rolling_aggregate(df: DataFrame, tgt_id: list[str] | str,
                      activity_date: str, value_col: str,
                      days: int = 7,
                      prefix: str | None = None) -> DataFrame:
    """Per-entity trailing-``days`` window aggregates (sum/avg/count).

    A RANGE frame over event-time seconds — ``[ts − days, ts]`` inclusive
    — so results are frame-determined and independent of tie order (frames
    include all peers). The reference has no sliding frame specs (SURVEY
    §2.5 "not present"); this is the extension an activity-feature store
    needs (trailing spend, trailing event rate).
    """
    if isinstance(tgt_id, str):
        tgt_id = [tgt_id]
    p = prefix if prefix is not None else f"r{days}d_"
    w = (Window.partitionBy(*[F.col(c) for c in tgt_id])
         .orderBy(F.unix_timestamp(F.col(activity_date)))
         .rangeBetween(-days * 86400, 0))
    return (df.withColumn(f"{p}sum", F.sum(value_col).over(w))
              .withColumn(f"{p}avg", F.avg(value_col).over(w))
              .withColumn(f"{p}count", F.count(value_col).over(w).cast("long")))


def timestamps_to_intervals(df: DataFrame, tgt_id: list[str] | str,
                            activity_date: str,
                            interval_col: str = "interval",
                            tiebreak: list[str] | None = None) -> DataFrame:
    """Add day gaps between consecutive events per entity (W2).

    ``interval = datediff(ts, lag(ts) over (partition by entity order by ts))``
    — first event of each entity gets NULL, exactly as the reference
    (caspr/utils/spark/preprocess.py:438-444).
    """
    if isinstance(tgt_id, str):
        tgt_id = [tgt_id]
    order = [F.col(activity_date)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*[F.col(c) for c in tgt_id]).orderBy(*order)
    return df.withColumn(
        interval_col,
        F.datediff(F.col(activity_date), F.lag(F.col(activity_date), 1).over(w)),
    )


def topk_per_group(df: DataFrame, keys: list[str], order_by: list,
                   k: int, rank_col: str = "rk") -> DataFrame:
    """Top-``k`` rows per group — the grouped-limit primitive (latest k
    orders per customer, best k candidates per query, ...).

    One ``row_number`` window; Spark ≥3.5 plans it as
    **WindowGroupLimit**, which pushes the per-group limit below the
    sort so each map task keeps only k rows per group before the
    exchange — the shuffle moves O(groups · k), not O(rows). Pass
    fully-deterministic ``order_by`` (append a unique id) or row
    membership at rank boundaries is nondeterministic.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not keys:
        raise ValueError("topk_per_group needs at least one key column")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= k))
