"""Table profiling — the data-quality report a pipeline runs on arrival.

One long-format relation (column, metric, value) covering null counts,
distinct cardinalities, min/max, and the modal (most frequent) value
per column — the checks that catch a broken upstream export (all-null
column, cardinality collapse, out-of-range values) before it poisons a
training run.

Two passes, regardless of column count:

1. ONE aggregation computes nulls / distincts / min / max for every
   profiled column simultaneously (a single scan; exact ``countDistinct``
   by default, ``approx_count_distinct`` as the 100 TB path where ±2%
   on cardinality is fine and the distinct-expand shuffle is not).
2. ONE melt (explode of (column, value) structs) + keyed count + top-1
   window finds each column's modal value — column name is part of the
   grouping key, so k columns profile in the same shuffle, not k
   shuffles.

Values are rendered as strings so heterogeneous column types share one
report schema — standard for profiling output (the caller casts back
when consuming a specific metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None,
                  approx_distinct: bool = False,
                  include_modal: bool = True) -> DataFrame:
    """Profile ``cols`` (default: all) into (column, metric, value) rows.

    Metrics per column: ``n_nulls``, ``n_distinct``, ``min``, ``max``,
    and (``include_modal``) ``top_value`` / ``top_count`` with a
    deterministic smallest-string tie-break. The scalar metrics ride one
    aggregation row collected to the driver (k·4 values — bytes); the
    modal pass stays fully distributed.
    """
    cols = list(cols) if cols else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    nd = (F.approx_count_distinct if approx_distinct else F.count_distinct)
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
             .alias(f"nn_{c}"),
            nd(F.col(c)).alias(f"nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"mx_{c}"),
        ]
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    scalar_rows = []
    for c in cols:
        scalar_rows += [
            (c, "n_nulls", str(row[f"nn_{c}"])),
            (c, "n_distinct", str(row[f"nd_{c}"])),
            (c, "min", row[f"mn_{c}"]),
            (c, "max", row[f"mx_{c}"]),
        ]
    out = spark.createDataFrame(scalar_rows,
                                "column string, metric string, value string")
    if not include_modal:
        return out
    melted = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("value"))
        for c in cols])).alias("kv")) \
        .select("kv.column", "kv.value") \
        .filter(F.col("value").isNotNull())
    counts = melted.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("column").orderBy(F.col("cnt").desc(),
                                             F.col("value").asc())
    modal = (counts.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1))
    modal_rows = (modal.select(
        "column",
        F.lit("top_value").alias("metric"),
        F.col("value"))
        .unionByName(modal.select(
            "column",
            F.lit("top_count").alias("metric"),
            F.col("cnt").cast("string").alias("value"))))
    return out.unionByName(modal_rows)
