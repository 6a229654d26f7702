"""E5/E6 — min-max / standard scaling as native column expressions.

The reference implements scaling as one scalar pandas UDF per column
(caspr/utils/spark/preprocess.py:161-234) — an Arrow round-trip per column
per row batch. Here both directions are pure column arithmetic, so they
stay inside whole-stage codegen and cost nothing beyond the expression.

The fitted state ("summary") is a plain dict ``col -> {min,max,mean,stddev}``
computed in ONE aggregation pass (vs the reference's ``describe().toPandas()``).
``stddev`` is the sample standard deviation, matching both Spark ``describe``
and the oracle's SQL ``stddev``.
"""

from __future__ import annotations

import json
import logging
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

Summary = dict[str, dict[str, float]]


def fit_summary(df: DataFrame, cols: list[str]) -> Summary:
    """min/max/mean/stddev per column in a single distributed agg pass (A3)."""
    if not cols:
        return {}
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max"),
                 F.avg(c).alias(f"{c}__mean"), F.stddev_samp(c).alias(f"{c}__std")]
    row = df.agg(*aggs).collect()[0]
    return {c: {"min": _f(row[f"{c}__min"]), "max": _f(row[f"{c}__max"]),
                "mean": _f(row[f"{c}__mean"]), "stddev": _f(row[f"{c}__std"])}
            for c in cols}


def _f(v):
    return None if v is None else float(v)


def _check_scaling(scaling: str) -> None:
    if scaling not in ("min_max", "standard"):
        raise ValueError(f"scaler type not supported: {scaling}")


def normalize_value(x: float, col: str, summary: Summary, scaling: str = "min_max") -> float:
    """Normalize one scalar with a fitted summary (driver-side helper).

    Mirrors ``normalize_value`` (caspr/utils/spark/preprocess.py:65-85),
    including the pass-through on zero variance.
    """
    _check_scaling(scaling)
    s = summary[col]
    if scaling == "min_max":
        return (x - s["min"]) / (s["max"] - s["min"]) if s["max"] != s["min"] else x
    return (x - s["mean"]) / s["stddev"] if s["stddev"] else x


def normalize_columns(df: DataFrame, cols: list[str], summary: Summary | None = None,
                      scaling: str = "min_max"):
    """Scale ``cols`` in place; returns ``(df, summary)`` (E5).

    Zero-variance columns are left untouched with a warning, exactly like
    the reference (preprocess.py:178-180, 188-190).
    """
    _check_scaling(scaling)
    if summary is None:
        summary = fit_summary(df, cols)
    for c in cols:
        s = summary[c]
        if scaling == "min_max":
            if s["min"] == s["max"]:
                logger.info("no variance to normalize, consider dropping: %s", c)
                continue
            expr = (F.col(c) - F.lit(s["min"])) / F.lit(s["max"] - s["min"])
        else:
            if not s["stddev"]:
                logger.info("no variance to normalize, consider dropping: %s", c)
                continue
            expr = (F.col(c) - F.lit(s["mean"])) / F.lit(s["stddev"])
        df = df.withColumn(c, expr.cast("double"))
    return df, summary


def denormalize_columns(df: DataFrame, cols: list[str], summary: Summary,
                        scaling: str = "min_max") -> DataFrame:
    """Inverse of ``normalize_columns`` (E6; preprocess.py:202-234)."""
    _check_scaling(scaling)
    for c in cols:
        s = summary[c]
        if scaling == "min_max":
            if s["min"] == s["max"]:
                continue
            expr = F.col(c) * F.lit(s["max"] - s["min"]) + F.lit(s["min"])
        else:
            if not s["stddev"]:
                continue
            expr = F.col(c) * F.lit(s["stddev"]) + F.lit(s["mean"])
        df = df.withColumn(c, expr.cast("double"))
    return df


def save_summary(summary: Summary, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(summary, f)


def load_summary(path: str) -> Summary:
    with open(path) as f:
        return json.load(f)


def fit_group_summary(df: DataFrame, cols: list[str],
                      group_cols: list[str]) -> DataFrame:
    """Per-GROUP min/max/mean/stddev for ``cols`` in one distributed agg.

    The group-wise twin of :func:`fit_summary`: fitted state is a
    DataFrame keyed by ``group_cols`` (a dict would force the key space
    through the driver — per-entity normalization at 1e9 entities is
    exactly when that breaks), so apply is a keyed join that AQE
    broadcasts while the stats relation is small and sort-merges when it
    is not.
    """
    if not cols or not group_cols:
        raise ValueError("cols and group_cols must be non-empty")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__{c}_min"), F.max(c).alias(f"__{c}_max"),
                 F.avg(c).alias(f"__{c}_mean"),
                 F.stddev_samp(c).alias(f"__{c}_std")]
    return df.groupBy(*group_cols).agg(*aggs)


def normalize_by_group(df: DataFrame, cols: list[str],
                       group_cols: list[str],
                       stats: DataFrame | None = None,
                       scaling: str = "min_max"):
    """Group-wise E5: scale ``cols`` within each ``group_cols`` key
    (per-entity z-scores / min-max — the feature-store normalization the
    global :func:`normalize_columns` cannot express when entities live
    on different value scales). Returns ``(df, stats)``; pass a fitted
    ``stats`` back in for the train/apply leakage discipline.

    Zero-variance groups keep their original values (the reference's
    per-column rule, applied per group — a constant entity has no scale
    to remove). Plan: one agg exchange for the fit + one keyed join for
    apply; the scaling itself is pure column arithmetic in codegen.
    """
    _check_scaling(scaling)
    if stats is None:
        stats = fit_group_summary(df, cols, group_cols)
    out = df.join(stats, on=group_cols, how="left")
    for c in cols:
        mn, mx = F.col(f"__{c}_min"), F.col(f"__{c}_max")
        mean, std = F.col(f"__{c}_mean"), F.col(f"__{c}_std")
        if scaling == "min_max":
            expr = F.when(mx > mn, (F.col(c) - mn) / (mx - mn)) \
                    .otherwise(F.col(c))
        else:
            expr = F.when(std > 0, (F.col(c) - mean) / std) \
                    .otherwise(F.col(c))
        # unseen group (null stats) also falls through to the original
        out = out.withColumn(c, F.coalesce(expr.cast("double"),
                                           F.col(c).cast("double")))
    drop = [f"__{c}_{s}" for c in cols for s in ("min", "max", "mean", "std")]
    return out.drop(*drop), stats
