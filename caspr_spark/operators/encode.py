"""E1/E3 — frequency-ranked label encoding with cardinality capping.

Semantics (reference: caspr/utils/spark/preprocess.py:237-290
``encode_cat_columns_sparkrank``):

- fit: per categorical column, rank distinct values by (frequency desc,
  value asc) and keep the top ``max_cardinality``; codes are 1..K, with 0
  reserved for unknown / unseen / null / pruned values.
- transform: replace each value with its code; anything outside the fitted
  dictionary becomes 0.
- prune stats: ``pruned_product`` = mean fraction of distinct values pruned
  across over-cap columns; ``pruned_rows`` = fraction of input rows holding
  at least one pruned value.

Scale design vs the reference:

- The reference ranks via a **global unpartitioned window** over the
  grouped counts (preprocess.py:247) — a single-task sort. We use
  ``orderBy(...).limit(K)`` instead, which Spark executes as a distributed
  TakeOrdered: each partition keeps its local top-K, the driver merges.
- The fitted dictionary is capped at 30k rows per column, far below the
  broadcast threshold, so transform is a **broadcast hash join per column**
  — zero shuffles of the fact table regardless of its size.
- The reference's pandas-UDF variant (preprocess.py:293-352) does an O(V)
  ``list.index`` per value; deliberately not reproduced.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_CAT_CARDINALITY = 30000
PRUNED_ITEMS = "pruned_product"
PRUNED_ROWS = "pruned_rows"
UNKNOWN_CODE = 0

logger = logging.getLogger(__name__)


@dataclass
class CategoricalEncoding:
    """Fitted per-column dictionaries: ``col -> [(value, code), ...]`` with codes 1..K."""

    mappings: dict[str, list[tuple]] = field(default_factory=dict)
    stats: dict[str, float] = field(
        default_factory=lambda: {PRUNED_ITEMS: 0.0, PRUNED_ROWS: 0.0})

    def vocab_sizes(self) -> dict[str, int]:
        """Per-column vocabulary size *including* the reserved 0/UNK slot.

        Mirrors ``get_num_activities`` (caspr/utils/spark/preprocess.py:25-44).
        """
        return {c: len(m) + 1 for c, m in self.mappings.items()}

    def apply(self, df: DataFrame, cols: list[str] | None = None) -> DataFrame:
        """Replace each categorical value with its code (unknown -> 0).

        One broadcast join per column; original column order preserved.
        """
        spark = df.sparkSession
        out_cols = list(df.columns)
        for c in (cols or self.mappings.keys()):
            m = self.mappings[c]
            code_col = f"__{c}_code"
            map_df = spark.createDataFrame(
                [(v, k) for v, k in m], schema=f"`{c}` {dict(df.dtypes)[c]}, `{code_col}` int")
            df = (df.join(F.broadcast(map_df), on=c, how="left")
                    .withColumn(c, F.coalesce(F.col(code_col), F.lit(UNKNOWN_CODE)))
                    .drop(code_col))
        return df.select(*out_cols)

    def decode(self, df: DataFrame, cols: list[str] | None = None,
               unknown_token: str = "UNK") -> DataFrame:
        """Inverse transform: code -> original value, 0 -> ``unknown_token`` (E3).

        Reference: caspr/utils/spark/preprocess.py:355-370 (pandas-UDF map
        lookup there; broadcast join here).
        """
        spark = df.sparkSession
        out_cols = list(df.columns)
        for c in (cols or self.mappings.keys()):
            val_col = f"__{c}_val"
            map_df = spark.createDataFrame(
                [(k, str(v)) for v, k in self.mappings[c]],
                schema=f"`{c}` int, `{val_col}` string")
            df = (df.join(F.broadcast(map_df), on=c, how="left")
                    .withColumn(c, F.coalesce(F.col(val_col), F.lit(unknown_token)))
                    .drop(val_col))
        return df.select(*out_cols)

    def to_json(self) -> str:
        return json.dumps({"mappings": {c: [[v, k] for v, k in m]
                                        for c, m in self.mappings.items()},
                           "stats": self.stats})

    @classmethod
    def from_json(cls, s: str) -> "CategoricalEncoding":
        d = json.loads(s)
        return cls(mappings={c: [tuple(e) for e in m]
                             for c, m in d["mappings"].items()},
                   stats=d["stats"])

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "CategoricalEncoding":
        with open(path) as f:
            return cls.from_json(f.read())


def top_k_by_frequency(df: DataFrame, column: str, k: int) -> DataFrame:
    """Distinct values of ``column`` ranked 1..k by (count desc, value asc).

    The deterministic tie-break matches the reference's
    ``filter_cat_cardinality`` (caspr/utils/spark/preprocess.py:246-251) but
    replaces its global single-partition window with a distributed
    TakeOrdered (``orderBy().limit(k)``).
    """
    return (df.na.drop(subset=[column])
              .groupBy(column).count()
              .orderBy(F.col("count").desc(), F.col(column).asc())
              .limit(k))


def fit_encoding(df: DataFrame, cols: list[str],
                 max_cardinality: int = MAX_CAT_CARDINALITY) -> CategoricalEncoding:
    """Fit frequency-ranked capped dictionaries for ``cols`` (E1 fit phase)."""
    enc = CategoricalEncoding()
    if not cols:
        return enc

    # one TakeOrdered job per column, submitted concurrently — Spark's
    # scheduler interleaves them, so a 3-cat-col fit costs ~1 job latency
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(len(cols), 8)) as pool:
        tops = list(pool.map(
            lambda c: top_k_by_frequency(df, c, max_cardinality).collect(), cols))

    saturated: list[str] = []
    for c, top in zip(cols, tops):
        # rows arrive already ordered by (count desc, value asc)
        enc.mappings[c] = [(r[c], i + 1) for i, r in enumerate(top)]
        if len(top) == max_cardinality:
            saturated.append(c)

    # true distinct counts are only needed for columns that filled the cap
    # (vs the reference's unconditional per-column distinct().count(),
    # preprocess.py:261); one agg pass covers them all
    cardinalities = {c: len(enc.mappings[c]) for c in cols}
    if saturated:
        card_row = df.agg(*[F.countDistinct(F.col(c)).alias(c)
                            for c in saturated]).collect()[0]
        cardinalities.update({c: card_row[c] for c in saturated})

    pruned_fracs = []
    over_cap: list[str] = []
    for c in cols:
        if cardinalities[c] > max_cardinality:
            over_cap.append(c)
            pruned_fracs.append(1 - max_cardinality / cardinalities[c])
            logger.info("column %s: pruned %d of %d distinct values",
                        c, cardinalities[c] - max_cardinality, cardinalities[c])

    if over_cap:
        total = df.count()
        kept = df
        for c in over_cap:
            keep_vals = {v for v, _ in enc.mappings[c]}
            kept_df = df.sparkSession.createDataFrame(
                [(v,) for v in sorted(keep_vals)], schema=f"`{c}` {dict(df.dtypes)[c]}")
            kept = kept.join(F.broadcast(kept_df), on=c, how="left_semi")
        kept_count = kept.count()
        enc.stats[PRUNED_ITEMS] = sum(pruned_fracs) / len(pruned_fracs)
        enc.stats[PRUNED_ROWS] = 1 - kept_count / total if total else 0.0
    return enc


def fit_encoding_collect(df: DataFrame, cols: list[str],
                         max_cardinality: int = 100_000) -> CategoricalEncoding:
    """E2 fit: dictionary from *sorted distinct values*, codes 1..V (0=UNK).

    The reference's collect-strategy encoder gathers ``collect_set`` per
    column and sorts for determinism, reserving index 0 for the UNK
    sentinel (caspr/utils/spark/preprocess.py:293-352, :331-339). Its
    transform does an O(V) ``list.index`` per value inside a pandas UDF —
    here transform stays ``CategoricalEncoding.apply`` (broadcast join),
    only the fit ordering differs from ``fit_encoding`` (alphabetical vs
    frequency-ranked).

    ``max_cardinality`` guards the driver: the reference collects the full
    distinct set unconditionally and OOMs the driver on a miscategorized
    high-cardinality column; here the cheap ``approx_count_distinct``
    pre-check raises loudly instead. Use the capped ``fit_encoding`` (E1)
    path for genuinely huge vocabularies.
    """
    enc = CategoricalEncoding()
    if not cols:
        return enc
    approx = df.agg(*[F.approx_count_distinct(c).alias(c) for c in cols]) \
               .collect()[0]
    # approx_count_distinct's default rsd is 5%; use a 1.2 slack factor so
    # the guard never false-positives near the cap
    over = {c: int(approx[c]) for c in cols
            if approx[c] > max_cardinality * 1.2}
    if over:
        raise ValueError(
            f"fit_encoding_collect: column(s) exceed max_cardinality="
            f"{max_cardinality}: {over} (approximate counts). Collecting "
            "the full dictionary would risk driver OOM — raise "
            "max_cardinality explicitly or use the capped fit_encoding (E1).")
    row = df.agg(*[F.sort_array(F.collect_set(c)).alias(c) for c in cols]) \
            .collect()[0]
    for c in cols:
        enc.mappings[c] = [(v, i + 1) for i, v in enumerate(row[c])]
    return enc


def encode_cat_columns(df: DataFrame, cols: list[str],
                       encoding: CategoricalEncoding | None = None,
                       max_cardinality: int = MAX_CAT_CARDINALITY):
    """Fit-or-reapply convenience mirroring the reference call shape.

    Returns ``(encoded_df, encoding, stats)`` like
    ``encode_cat_columns_sparkrank`` (caspr/utils/spark/preprocess.py:237-290).
    """
    if encoding is None:
        encoding = fit_encoding(df, cols, max_cardinality)
    return encoding.apply(df, cols), encoding, dict(encoding.stats)
