"""Temporal and skew-aware join operators.

The reference has no theta/as-of/anti joins (SURVEY §2.3) — its temporal
alignment is the history filter + window rank. These are the *extension*
joins a large-scale event pipeline needs:

- ``asof_join``: for each left event, the latest right event at-or-before
  it (per key). Implemented as union + last-value window — ONE shuffle on
  (key), no range cross-product, no per-key collect; this is the
  scale-correct shape (the naive ts-inequality join is quadratic per key).
- ``salted_join``: explicit key-salting for skewed equi-joins — the
  left side's hot keys spread over ``salt`` sub-keys, the right side
  replicated ``salt`` ways. AQE's skew-join handles most cases at runtime;
  salting is the deterministic fallback when one key dwarfs a task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              tolerance_days: int | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Backward as-of join: attach each right row's ``value_cols`` to every
    left row with ``right_ts <= left_ts`` (latest such, per ``on`` key).

    Union the two sides tagged by origin, sort per key by (ts, origin),
    and carry the right values forward with ``last(..., ignorenulls)``
    over an unbounded-preceding frame. Ties (equal timestamps) resolve to
    the right row (the tag orders right before left). ``tolerance_days``
    nulls out matches older than the window.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in on and c != right_ts]

    # every right row contributes ONE struct of (all values + its ts); the
    # struct itself is never null for right rows, so last(..., ignorenulls)
    # always picks the latest right ROW atomically — a legitimately-NULL
    # value field stays NULL (no resurrection of older rows, no tearing
    # across value columns)
    lt = left.withColumn("__src", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.select(*on, F.col(right_ts).alias("__ts"), *value_cols) \
              .withColumn("__src", F.lit(0))
    rt = rt.withColumn("__rrow", F.struct(
        *[F.col(c).alias(c) for c in value_cols],
        F.col("__ts").alias("__rts")))
    lt = lt.withColumn("__rrow", F.lit(None).cast(dict(rt.dtypes)["__rrow"]))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    rt = rt.drop(*value_cols)
    unioned = lt.unionByName(rt.select(*lt.columns))

    w = (Window.partitionBy(*on).orderBy(F.col("__ts").asc(), F.col("__src").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    out = unioned.withColumn("__rrow",
                             F.last(F.col("__rrow"), ignorenulls=True).over(w))
    out = out.filter(F.col("__src") == 1)

    stale = F.lit(False)
    if tolerance_days is not None:
        stale = F.datediff(F.col("__ts"), F.col("__rrow.__rts")) > tolerance_days
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(F.col("__rrow").isNull() | stale, F.lit(None))
             .otherwise(F.col(f"__rrow.{c}")))
    return out.drop("__src", "__ts", "__rrow")


def range_join(left: DataFrame, right: DataFrame,
               left_ts: str = "ts", right_start: str = "start_ts",
               right_end: str = "end_ts", bucket_hours: int = 24,
               broadcast_right: bool | None = None) -> DataFrame:
    """Interval (range) join: pair each left row with every right interval
    containing its timestamp (``start <= ts < end``), without the
    quadratic theta-join.

    Scale shape: a raw ``ON ts BETWEEN start AND end`` join has no equi
    key, so Spark plans a broadcast-nested-loop — O(|L|·|R|) at 100 TB.
    Instead both sides get discretized to ``bucket_hours`` time buckets:
    each left row lands in exactly ONE bucket; each right interval
    explodes to the buckets it covers (``sequence`` + ``explode``, a few
    rows for sane widths). The join becomes a hash equi-join on the
    bucket with the range predicate as a post-filter, and because a left
    row has a single bucket, no dedup pass is needed. Pick
    ``bucket_hours`` near the median interval length: wider buckets
    replicate intervals less but keep more non-matching pairs to filter.

    ``broadcast_right``: force (True) or suppress (False) broadcasting
    the exploded interval side; default broadcasts only when the plan is
    already loaded (None lets AQE decide from runtime stats).
    """
    sec = F.lit(bucket_hours * 3600).cast("long")
    lb = left.withColumn(
        "__bucket", (F.unix_timestamp(F.col(left_ts)) / sec).cast("long"))
    rb = right.withColumn("__bucket", F.explode(F.sequence(
        (F.unix_timestamp(F.col(right_start)) / sec).cast("long"),
        (F.unix_timestamp(F.col(right_end)) / sec).cast("long"))))
    if broadcast_right:
        rb = F.broadcast(rb)
    joined = lb.join(rb, on="__bucket", how="inner").filter(
        (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) < F.col(right_end)))
    return joined.drop("__bucket")


def salted_join(left: DataFrame, right: DataFrame, on: list[str],
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with explicit key salting for skew.

    Left rows get a random salt in ``[0, salt)``; the right side is
    replicated once per salt value, so each hot key spreads over ``salt``
    tasks. Use when a single key's row count dwarfs a task's memory and
    AQE's skew splitting isn't available (e.g. bucketed inputs).

    Only inner/left joins: a right or full outer join would surface each
    unmatched right row once per replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}: "
                         "right/full would duplicate unmatched right rows "
                         "once per salt replica")
    lsalt = left.withColumn("__salt",
                            (F.rand(seed=42) * salt).cast("int"))
    rsalt = right.crossJoin(
        F.broadcast(left.sparkSession.range(salt)
                    .select(F.col("id").cast("int").alias("__salt"))))
    return (lsalt.join(rsalt, on=[*on, "__salt"], how=how)
            .drop("__salt"))
