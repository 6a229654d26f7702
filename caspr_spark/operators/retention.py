"""Cohort retention and RFM scoring — the product-analytics staples.

Both are pure DataFrame aggregations with deterministic tie-breaks, so
they carry full SQL oracles:

- :func:`cohort_retention` — the activation/retention matrix every
  growth dashboard starts from: entities grouped by first-activity
  period, fraction still active N periods later.
- :func:`rfm_scores` — recency / frequency / monetary quintile scoring,
  the classic customer-value segmentation.

Scale shape: each is one or two keyed aggregations over the activity
table (entity-keyed, then cohort/period-keyed); the score windows rank
the ENTITY-level relation (one row per entity, not per event), so the
single global sort each ``ntile`` needs runs on the small aggregate,
never the raw events — at 100 TB the event table is touched once,
map-side-combined, and everything after is entity-cardinality work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from caspr_spark.cache import register_cache

_PERIODS = {"day": 1, "week": 7}


def cohort_retention(df: DataFrame, entity_col: str = "user_id",
                     ts_col: str = "ts",
                     period: str = "week") -> DataFrame:
    """Retention matrix: for each cohort (entities sharing a
    first-activity ``period``) and each period offset, the number and
    fraction still active.

    Returns ``(cohort, period_offset, n_active, n_cohort, retention)``
    — one row per (cohort, offset) that has any activity; offset 0 is
    the cohort itself (retention 1.0 by construction). ``period``:
    ``day`` or ``week`` (ISO weeks — ``date_trunc`` Monday truncation,
    identical in Spark and standard SQL engines).

    Plan: first-activity per entity is one entity-keyed aggregation;
    activity periods per entity one distinct; the matrix one
    (cohort, offset) aggregation over the entity-period relation.
    """
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}, "
                         f"got {period!r}")
    span = _PERIODS[period]
    p = F.date_trunc(period, F.col(ts_col)).cast("date")
    first = (df.groupBy(entity_col)
             .agg(F.min(p).alias("cohort")))
    active = (df.select(F.col(entity_col), p.alias("__p")).distinct())
    joined = active.join(first, on=entity_col).withColumn(
        "period_offset",
        (F.datediff(F.col("__p"), F.col("cohort")) / span).cast("int"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_cohort"))
    mat = (joined.groupBy("cohort", "period_offset")
           .agg(F.count(F.lit(1)).alias("n_active")))
    return (mat.join(sizes, on="cohort")
            .select("cohort", "period_offset",
                    F.col("n_active").cast("long").alias("n_active"),
                    F.col("n_cohort").cast("long").alias("n_cohort"),
                    F.round(F.col("n_active") / F.col("n_cohort"), 6)
                    .alias("retention")))


def _ntile_distributed(df: DataFrame, order_by: list, n_bins: int,
                       n_total: int, out_col: str) -> DataFrame:
    """Moved to :func:`caspr_spark.operators.sampling.ntile_distributed`
    (round 9 — :func:`caspr_spark.segment.quantile_scores` needed it
    too); kept as a delegate so existing callers/tests stay valid."""
    from caspr_spark.operators.sampling import ntile_distributed

    return ntile_distributed(df, order_by, n_bins, n_total, out_col)


def rfm_scores(df: DataFrame, entity_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               asof=None, n_bins: int = 5) -> DataFrame:
    """Recency / Frequency / Monetary quintile segmentation.

    Per entity: ``recency_days`` (days from last activity to ``asof``,
    default the corpus max timestamp — pass an explicit timestamp
    string in production so the score is reproducible), ``frequency``
    (event count), ``monetary`` (value sum, accumulated in integer
    cents so the sum is order-exact). Scores are SQL ``ntile(n_bins)``
    semantics — higher = better (more recent / more frequent / more
    spend) — with the entity id as the deterministic tie-break, plus
    the combined ``rfm`` string ("555" = best).

    Scale shape: the raw events collapse to one row per entity in one
    keyed aggregation; each score then needs a GLOBAL rank of that
    entity relation, computed with the three-phase distributed prefix
    scan + the closed-form ntile bucket rule
    (:func:`_ntile_distributed`) — no single-task global window
    anywhere, at any entity cardinality. The default ``asof`` anchor
    is one single-row aggregate broadcast back.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    cents = F.round(F.col(value_col) * 100).cast("long")
    # persisted: the entity aggregate feeds the anchor agg, the count,
    # and three rank passes — without the pin each would re-scan events
    per = register_cache(
        (df.groupBy(entity_col)
         .agg(F.max(F.col(ts_col)).alias("__last"),
              F.count(F.lit(1)).alias("frequency"),
              F.sum(cents).alias("__cents"))).persist())
    if asof is not None:
        per = per.withColumn("__asof", F.lit(asof).cast("timestamp"))
    else:
        per = per.crossJoin(F.broadcast(
            per.agg(F.max("__last").alias("__asof"))))
    per = per.withColumn(
        "recency_days",
        F.datediff(F.to_date("__asof"), F.to_date("__last")).cast("int"))
    n_total = per.count()
    ent = F.col(entity_col)
    per = _ntile_distributed(per, [F.col("recency_days").desc(), ent],
                             n_bins, n_total, "r_score")
    per = _ntile_distributed(per, [F.col("frequency").asc(), ent],
                             n_bins, n_total, "f_score")
    per = _ntile_distributed(per, [F.col("__cents").asc(), ent],
                             n_bins, n_total, "m_score")
    return per.select(
        entity_col, "recency_days",
        F.col("frequency").cast("long").alias("frequency"),
        F.round(F.col("__cents") / 100.0, 2).alias("monetary"),
        "r_score", "f_score", "m_score",
        F.concat(F.col("r_score").cast("string"),
                 F.col("f_score").cast("string"),
                 F.col("m_score").cast("string")).alias("rfm"))
