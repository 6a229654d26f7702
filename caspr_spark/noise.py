"""E11/E12 — sequence noise + minority oversampling, Spark-side.

Reference: caspr/utils/noise.py:6-77 (gaussian noise on continuous,
random category substitution, both p=0.1 — torch-side there, seeded
``rand()``-gated column expressions here) and the SMOTE-NC oversampler
(caspr/utils/preprocess.py:365-385). SMOTE interpolates synthetic
neighbors — sklearn/imblearn territory; the scale-correct Spark
alternative implemented here is stratified resampling-with-replacement
to parity (the standard class-imbalance treatment when interpolation
isn't available; combine with class weights downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_gaussian_noise(df: DataFrame, cols: list[str], p: float = 0.1,
                       sigma: float = 0.1, seed: int = 42) -> DataFrame:
    """With prob ``p`` per value, add N(0, sigma) noise (E12 continuous)."""
    for i, c in enumerate(cols):
        gate = F.rand(seed + 2 * i) < p
        noise = F.randn(seed + 2 * i + 1) * sigma
        df = df.withColumn(c, F.when(gate, F.col(c) + noise).otherwise(F.col(c)))
    return df


def random_category_substitution(df: DataFrame, cols: list[str],
                                 vocab_sizes: dict[str, int], p: float = 0.1,
                                 seed: int = 42) -> DataFrame:
    """With prob ``p``, replace an encoded category with a random *fitted*
    code (E12 categorical — the reference swaps in a random in-vocab
    category).

    ``vocab_sizes`` follows ``CategoricalEncoding.vocab_sizes()`` —
    fitted codes are ``1..V-1`` with 0 reserved for UNK, so the draw is
    uniform over ``1..V-1`` (never UNK, never out-of-vocabulary).
    """
    for i, c in enumerate(cols):
        v = vocab_sizes[c]
        gate = F.rand(seed + 2 * i) < p
        sub = (F.floor(F.rand(seed + 2 * i + 1) * (v - 1)) + 1) \
            .cast(dict(df.dtypes)[c])
        df = df.withColumn(c, F.when(gate, sub).otherwise(F.col(c)))
    return df


def oversample_to_parity(df: DataFrame, label_col: str,
                         seed: int = 42) -> DataFrame:
    """Resample every minority class (with replacement) up to the majority
    class size — the SMOTE-NC stand-in (E11)."""
    counts = {r[label_col]: r["n"] for r in
              df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n")).collect()}
    majority = max(counts.values())
    out = df
    for lbl, n in counts.items():
        if n < majority:
            extra = (df.filter(F.col(label_col) == lbl)
                       .sample(withReplacement=True,
                               fraction=(majority - n) / n, seed=seed))
            out = out.unionByName(extra)
    return out
