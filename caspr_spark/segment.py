"""Segmentation — KMeans / PCA / quantile scoring over embeddings.

Reference: caspr/utils/segmentation/pandas.py (sklearn KMeans with a
silhouette-driven k sweep, PCA by explained-variance threshold, qcut
decile scoring, per-cluster profiling). Rebuilt on MLlib so the fit is
distributed: ``pyspark.ml.clustering.KMeans`` (seeded, k-means||),
``pyspark.ml.feature.PCA``, ``ClusteringEvaluator`` (silhouette).
DEC (deep embedded clustering, caspr/models/dec.py) lives in
``caspr_spark.dec`` — torch-free: closed-form student-t assignment as
Spark expressions, KL centroid refinement in numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import ClusteringEvaluator
from pyspark.ml.feature import PCA, VectorAssembler
from pyspark.ml.functions import array_to_vector


def _featurize(df: DataFrame, cols: list[str] | None, vec_col: str | None):
    if vec_col is not None:
        return df.withColumn("features", array_to_vector(F.col(vec_col)))
    return VectorAssembler(inputCols=cols, outputCol="features",
                           handleInvalid="skip").transform(df)


def kmeans_segment(df: DataFrame, feature_cols: list[str] | None = None,
                   vec_col: str | None = None, k: int = 4, seed: int = 42,
                   out_col: str = "segment"):
    """Fit seeded KMeans; returns ``(df + segment column, model)``."""
    feat = _featurize(df, feature_cols, vec_col)
    model = KMeans(k=k, seed=seed, featuresCol="features",
                   predictionCol=out_col).fit(feat)
    return model.transform(feat).drop("features"), model


def silhouette_score(df: DataFrame, feature_cols: list[str] | None = None,
                     vec_col: str | None = None,
                     pred_col: str = "segment") -> float:
    feat = _featurize(df, feature_cols, vec_col)
    return ClusteringEvaluator(featuresCol="features",
                               predictionCol=pred_col).evaluate(feat)


def choose_k(df: DataFrame, feature_cols: list[str] | None = None,
             vec_col: str | None = None, k_range=range(2, 9),
             seed: int = 42) -> tuple[int, dict[int, float]]:
    """Silhouette-driven k sweep (reference pandas.py:su silhouette loop)."""
    feat = _featurize(df, feature_cols, vec_col).cache()
    scores: dict[int, float] = {}
    for k in k_range:
        model = KMeans(k=k, seed=seed, featuresCol="features",
                       predictionCol="__p").fit(feat)
        pred = model.transform(feat)
        scores[k] = ClusteringEvaluator(featuresCol="features",
                                        predictionCol="__p").evaluate(pred)
    best = max(scores, key=scores.get)
    feat.unpersist()
    return best, scores


def pca_reduce(df: DataFrame, feature_cols: list[str] | None = None,
               vec_col: str | None = None, k: int | None = None,
               var_threshold: float = 0.9, out_col: str = "pca_features"):
    """PCA to ``k`` components, or to the smallest k explaining
    ``var_threshold`` of variance (two-fit probe, like the reference's
    explained-variance scan)."""
    feat = _featurize(df, feature_cols, vec_col)
    dim = (len(feature_cols) if feature_cols
           else len(df.select(vec_col).first()[0]))
    if k is None:
        probe = PCA(k=dim, inputCol="features", outputCol=out_col).fit(feat)
        cum = 0.0
        k = dim
        for i, v in enumerate(probe.explainedVariance):
            cum += v
            if cum >= var_threshold:
                k = i + 1
                break
    model = PCA(k=k, inputCol="features", outputCol=out_col).fit(feat)
    return model.transform(feat).drop("features"), model


def segment_profile(df: DataFrame, segment_col: str,
                    cont_cols: list[str]) -> DataFrame:
    """Per-segment means + sizes (A10; reference pandas.py:228-249)."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    aggs += [F.avg(c).alias(f"avg_{c}") for c in cont_cols]
    return df.groupBy(segment_col).agg(*aggs)


def quantile_scores(df: DataFrame, cols: list[str], q: int = 10,
                    reverse_cols: set[str] = frozenset(),
                    tiebreak: list[str] | None = None) -> DataFrame:
    """E10 qcut-style 1..q scores per column (reverse for R-type cols).

    ``ntile`` over a global order — exact; use ``quantile_scores_approx``
    as the 100 TB path. NULL values sort first (ascending), so they land
    in score 1 (or q for reversed columns) — fill or drop nulls first if
    that's not wanted; the approx path scores them NULL instead.
    """
    from pyspark.sql import Window
    for c in cols:
        direction = F.col(c).desc() if c in reverse_cols else F.col(c).asc()
        order = [direction] + [F.col(t).asc() for t in (tiebreak or [])]
        df = df.withColumn(f"{c}_score",
                           F.ntile(q).over(Window.orderBy(*order)).cast("int"))
    return df


def quantile_scores_approx(df: DataFrame, cols: list[str], q: int = 10,
                           relative_error: float = 0.0001,
                           reverse_cols: set[str] = frozenset()) -> DataFrame:
    """Scale path for E10: Greenwald-Khanna cutpoints + a when-chain bucket
    assignment — no global sort/window, one approxQuantile pass per batch
    of columns, then pure map-side expressions.

    Ties share a bucket (value-determined, unlike ntile's row-count
    balancing), which is the semantics a distributed scorer wants anyway.
    NULL values score NULL (the exact path buckets them at the extreme).
    """
    probs = [i / q for i in range(1, q)]
    cuts = df.stat.approxQuantile(cols, probs, relative_error)
    for c, cut in zip(cols, cuts):
        expr = F.lit(1)
        for edge in cut:
            expr = expr + (F.col(c) > F.lit(edge)).cast("int")
        score = expr.cast("int")
        if c in reverse_cols:
            score = (F.lit(q + 1) - score).cast("int")
        df = df.withColumn(f"{c}_score", score)
    return df
