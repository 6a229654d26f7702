"""Z-order data layout — multi-dimensional clustering for data skipping.

The lakehouse OPTIMIZE ZORDER primitive: interleave the bits of several
columns' normalized values into one sort key, so that range-partitioning
by that key co-locates rows that are close in EVERY dimension. Files
written in Z-order carry narrow per-file min/max ranges on all the
z-ordered columns at once, which is what makes parquet footer pruning
(data skipping) effective for multi-predicate scans — a lexicographic
sort only prunes on its leading column.

Implementation: per-column min/max from ONE aggregation (fit-time
scalars, the `scale.fit_summary` pattern), quantization and the bit
interleave as pure column arithmetic (shift/and/or terms — all codegen,
no UDF), then ``repartitionByRange`` on the z-value. At 100 TB the only
data-sized movement is that final range exchange, which a layout rewrite
pays by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16,
                 out_col: str = "zvalue") -> DataFrame:
    """Add ``out_col``: the Z-order (Morton) key over ``cols``.

    Each column is min-max scaled to ``[0, 2^bits)`` (nulls quantize to
    0 — they cluster at the origin rather than poisoning the key), then
    bit ``i`` of column ``c`` lands at position ``i·len(cols) + c`` of
    the key. ``bits · len(cols)`` must fit a signed 64-bit key (≤ 63).

    The quantization expression ``floor((v - min) · (2^bits - 1) /
    (max - min))`` is plain IEEE double arithmetic, so any engine
    evaluating the same expression reproduces the key bit-for-bit.
    """
    if not cols or len(cols) < 2:
        raise ValueError("zorder needs at least 2 columns "
                         "(1 column is a plain sort)")
    if bits * len(cols) > 63:
        raise ValueError(f"bits·cols = {bits * len(cols)} exceeds the "
                         "63-bit signed key budget")
    row = df.agg(*[F.min(F.col(c).cast("double")).alias(f"mn_{c}")
                   for c in cols],
                 *[F.max(F.col(c).cast("double")).alias(f"mx_{c}")
                   for c in cols]).first()
    top = (1 << bits) - 1
    nd = len(cols)
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
        if mn is None or mx is None or mx == mn:
            continue  # constant / all-null column contributes no bits
        q = F.floor((F.col(c).cast("double") - F.lit(mn)) * F.lit(float(top))
                    / F.lit(mx - mn)).cast("long")
        q = F.coalesce(q, F.lit(0))
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)),
                            i * nd + ci))
    return df.withColumn(out_col, z)


def zorder_repartition(df: DataFrame, cols: list[str],
                       num_partitions: int, bits: int = 16,
                       keep_key: bool = False) -> DataFrame:
    """Cluster ``df`` into ``num_partitions`` Z-ordered ranges — the
    shuffle a ``write.parquet`` then turns into min/max-tight files.
    ``keep_key`` retains the ``zvalue`` column for inspection."""
    out = (zorder_value(df, cols, bits)
           .repartitionByRange(num_partitions, F.col("zvalue"))
           .sortWithinPartitions("zvalue"))
    return out if keep_key else out.drop("zvalue")
