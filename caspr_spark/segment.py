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

import numpy as np
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


def kmeans_assign(df: DataFrame, centroids: list,
                  vec_col: str = "embedding",
                  out_col: str = "segment") -> DataFrame:
    """Closed-form KMeans ASSIGNMENT under pinned centroid literals —
    the deterministic half of :func:`kmeans_segment` (reference
    caspr/utils/segmentation/pandas.py's predict step), split out so it
    can be certified exactly: with the centroids given, cluster
    membership is ``argmin_j ||x - c_j||²`` — pure arithmetic, no
    iteration, no RNG. Same election expression as the IVF coarse
    quantizer (:func:`caspr_spark.llm.similarity.cosine_topk_ivf`
    ``centroids=``): per-centroid ``struct(d, cell)`` columns with the
    left-associative euclidean² fold, array-sorted so ties break
    first-min-wins — numpy/MLlib argmin's rule — giving the whole
    assignment an exact SQL twin. Map-side only: no shuffle, fuses
    into the scan; the per-row cost is k·dim codegen flops.

    The KMeans FIT (:func:`kmeans_segment`) stays rows-only-checkable
    by nature (iterative, seeded); production uses
    ``model.clusterCenters()`` from a fit as the pinned literals here,
    making every downstream assignment/profile auditable even though
    the fit is not."""
    from caspr_spark.llm.similarity import nearest_centroid

    return df.withColumn(out_col, nearest_centroid(vec_col, centroids))


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

    Exact SQL ``ntile`` semantics over a global order — but computed
    WITHOUT the single-task global sort ``F.ntile().over(
    Window.orderBy(...))`` plans (the last such window in a hot path
    after the round-8 ROC-AUC rework): each column's global rank comes
    from the three-phase distributed prefix scan and the bucket from
    the closed-form ntile remainder rule
    (:func:`~caspr_spark.operators.sampling.ntile_distributed`,
    bit-equal to the window function, parity-tested), so every sort
    runs range-partitioned in parallel at any row count. The input is
    pinned once for the row count all columns share and the per-column
    scan passes. ``quantile_scores_approx`` remains the cheaper
    one-pass path when value-determined buckets are acceptable. NULL
    values sort first (ascending), so they land in score 1 (or q for
    reversed columns — Spark desc places nulls last) — fill or drop
    nulls first if that's not wanted; the approx path scores them NULL
    instead. Pass ``tiebreak`` (e.g. the id column) to make the order
    total and the scores deterministic.

    Cache lifetime: this pins the input copy plus one scan frame per
    scored column (each ``ntile_distributed`` call persists between its
    totals and scan passes — unpersisting earlier would let the range
    partitioner re-sample and break pass coherence). Loop-shaped or
    multi-query callers should materialize inside a
    :func:`caspr_spark.cache.cache_scope`, which releases all k+1
    relations on exit; one-shot callers fall back to LRU eviction (the
    drivers in ``bench.py`` / ``tools/check_correctness.py`` scope every
    query for exactly this reason).
    """
    from caspr_spark.cache import register_cache
    from caspr_spark.operators.sampling import ntile_distributed

    # persist a DERIVED copy, never the caller's own handle — pinning
    # the input in place would let a cache_scope exit evict a relation
    # the caller still holds persisted (the same hazard the joint-DEC
    # fit fixed in round 9)
    df = register_cache(df.select(*df.columns).persist())
    n_total = df.count()
    for c in cols:
        direction = F.col(c).desc() if c in reverse_cols else F.col(c).asc()
        order = [direction] + [F.col(t).asc() for t in (tiebreak or [])]
        df = ntile_distributed(df, order, q, n_total, f"{c}_score")
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


def tsne_sample_frame(df: DataFrame, feature_cols: list[str] | None = None,
                      vec_col: str | None = None,
                      label_col: str = "segment", sample_n: int = 1000,
                      seed: int = 1):
    """Bounded driver-side sample for the t-SNE cluster plot.

    The reference visualizes clusters by sampling <= ``tsne_sample``
    rows and running 2-D t-SNE on them
    (caspr/utils/segmentation/pandas.py:121-130, plt_tsne :369-370);
    t-SNE is O(n²)-ish and inherently local, so the ONLY distributed
    part is this bounded sample — the collect is capped at ``sample_n``
    rows by construction (never data-sized). Returns ``(X [n, d]
    float64, labels [n])`` ready for any manifold embedder. Ungated:
    the sampling/assembly math is testable without sklearn.
    """
    if sample_n < 1:
        raise ValueError(f"sample_n must be >= 1, got {sample_n}")
    cols = [vec_col] if vec_col is not None else list(feature_cols or [])
    if not cols:
        raise ValueError("pass feature_cols or vec_col")
    total = df.count()
    frac = min(1.0, (sample_n * 1.2) / max(total, 1))   # oversample, trim
    pdf = (df.select(*cols, label_col).sample(fraction=frac, seed=seed)
             .limit(sample_n).toPandas())
    if vec_col is not None:
        X = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in pdf[vec_col]])
    else:
        X = pdf[list(feature_cols)].to_numpy(dtype=np.float64)
    return X, pdf[label_col].to_numpy()


def tsne_layout(df: DataFrame, feature_cols: list[str] | None = None,
                vec_col: str | None = None, label_col: str = "segment",
                sample_n: int = 1000, seed: int = 1,
                perplexity: float = 30.0):
    """2-D t-SNE coordinates + cluster labels for the sampled rows.

    Gated on scikit-learn (absent from this container — same pattern as
    the matplotlib-gated ``explain.visualize`` and the onnx-gated
    export): the reference's ``plt_tsne``
    (caspr/utils/segmentation/pandas.py:369-383) minus the plotting
    shell. Returns ``(coords [n, 2], labels [n])``.
    """
    try:
        from sklearn.manifold import TSNE
    except ImportError as exc:  # pragma: no cover - container lacks sklearn
        raise NotImplementedError(
            "tsne_layout requires scikit-learn; install it or use "
            "tsne_sample_frame() for the sampled feature matrix") from exc
    X, labels = tsne_sample_frame(df, feature_cols, vec_col, label_col,
                                  sample_n, seed)
    per = min(perplexity, max(1.0, (len(X) - 1) / 3.0))
    coords = TSNE(n_components=2, perplexity=per,
                  random_state=seed).fit_transform(X)
    return coords, labels


def plot_tsne(df: DataFrame, feature_cols: list[str] | None = None,
              vec_col: str | None = None, label_col: str = "segment",
              sample_n: int = 1000, seed: int = 1,
              save_fig: str | None = None):
    """Scatter of the t-SNE layout colored by cluster — the reference's
    ``plt_tsne`` plot (caspr/utils/segmentation/pandas.py:369-383).
    Gated on matplotlib on top of the sklearn gate in
    :func:`tsne_layout`."""
    try:
        import matplotlib.pyplot as plt
    except ImportError as exc:  # pragma: no cover - no matplotlib here
        raise NotImplementedError(
            "plot_tsne requires matplotlib; tsne_layout() returns the "
            "underlying coordinates") from exc
    coords, labels = tsne_layout(df, feature_cols, vec_col, label_col,
                                 sample_n, seed)
    # plt.cm.get_cmap was deprecated in matplotlib 3.7 and removed in
    # 3.9; the colormaps registry is available from 3.5 on
    import matplotlib
    try:
        cmap = matplotlib.colormaps["jet"].resampled(256)
    except AttributeError:  # pragma: no cover - matplotlib < 3.5
        cmap = plt.get_cmap("jet", 256)
    plt.figure(figsize=(12, 8))
    plt.scatter(coords[:, 0], coords[:, 1], c=labels, cmap=cmap)
    plt.colorbar(ticks=range(256))
    plt.clim(-0.5, 9.5)
    if save_fig:
        plt.savefig(save_fig, bbox_inches="tight")
    else:  # pragma: no cover - interactive path
        plt.show()
    return coords, labels
