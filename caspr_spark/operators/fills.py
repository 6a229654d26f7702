"""E8/E9 — NaN-fill semantics, including the subtle date-fill modes.

Reference: ``fill_date_nans_sp`` / ``fill_nans_sp``
(caspr/utils/spark/preprocess.py:88-158). The four date modes:

| interval | summary | fill value |
|---|---|---|
| True  | None | ``history_days`` (raw day count) |
| False | None | ``unix_timestamp(date_sub(prediction_date, history_days))`` |
| True  | yes  | ``normalize(history_days)`` under the fitted summary |
| False | yes  | normalized start-of-window epoch (per base date column) |

Works on both the long layout and the pivoted ``{slot}_{col}`` layout — the
slot prefix is stripped to find the base column's summary entry, so all
slots of one date column fill with the same value (preprocess.py:108-133).

Everything is ``when/otherwise`` / ``fillna`` column expressions — no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from caspr_spark.operators.scale import Summary, normalize_columns, normalize_value

_PIVOTED = re.compile(r"(\d+)_(\w+)")


def _base_name(c: str) -> str:
    """``3_ts`` -> ``ts``; non-pivoted names pass through."""
    return c.split("_", 1)[-1] if _PIVOTED.match(c) else c


def fill_date_nans(df: DataFrame, date_cols: list[str], history_days: int = 365,
                   prediction_date: str = "prediction_date", interval: bool = False,
                   summary_date: Summary | None = None,
                   scaling: str = "min_max") -> DataFrame:
    """Fill null date features with the start-of-window default (E8)."""
    if not interval and prediction_date not in df.columns:
        raise ValueError(f"{prediction_date!r} not found in the DataFrame")

    if summary_date is None:
        if interval:
            return df.fillna(history_days, subset=date_cols)
        default = F.unix_timestamp(F.date_sub(F.col(prediction_date), history_days))
        for c in date_cols:
            # fill nulls only — non-null values and the column dtype are
            # preserved (the epoch feature is a double in this engine)
            df = df.withColumn(
                c, F.coalesce(F.col(c), default.cast(dict(df.dtypes)[c])))
        return df

    if interval:
        for c in date_cols:
            df = df.fillna(
                normalize_value(history_days, _base_name(c), summary_date, scaling),
                subset=[c])
        return df

    # absolute mode with summary: fill with the *normalized* start-of-window
    # epoch of each base date column (reference preprocess.py:115-134)
    base_cols = sorted({_base_name(c) for c in date_cols})
    sow = {b: f"__start_of_window_{b}" for b in base_cols}
    for b in base_cols:
        df = df.withColumn(
            sow[b], F.unix_timestamp(F.date_sub(F.col(prediction_date), history_days))
                     .cast("double"))
    sow_summary = {sow[b]: summary_date[b] for b in base_cols}
    df, _ = normalize_columns(df, list(sow.values()), sow_summary, scaling)
    for c in date_cols:
        df = df.withColumn(c, F.coalesce(F.col(c), F.col(sow[_base_name(c)])))
    return df.drop(*sow.values())


def fill_nans(df: DataFrame, cat_cols: list[str] | None = None,
              cont_cols: list[str] | None = None,
              date_cols: list[str] | None = None, history_days: int = 365,
              prediction_date: str = "prediction_date", interval: bool = False,
              summary_date: Summary | None = None,
              scaling: str = "min_max") -> DataFrame:
    """Date nulls -> start-of-window; categorical/continuous nulls -> 0 (E9).

    Reference: ``fill_nans_sp`` (caspr/utils/spark/preprocess.py:138-158).
    """
    if date_cols:
        df = fill_date_nans(df, date_cols, history_days, prediction_date,
                            interval, summary_date, scaling)
    if cont_cols:
        df = df.fillna(0, subset=cont_cols)
    if cat_cols:
        df = df.fillna(0, subset=cat_cols)
    return df
