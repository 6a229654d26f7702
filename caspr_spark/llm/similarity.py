"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline: queries are broadcast, the
corpus streams once, the per-query top-k heap is a TakeOrdered-style window
over (query, similarity). The LSH-bucketed variant is the scale path — it
prunes the corpus to same-bucket candidates before the exact re-rank.

Dot products are pure ``zip_with``/``aggregate`` expressions in double
precision — JVM-side, no Arrow hop.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity_col(a, b):
    """Cosine similarity between two array columns, computed in double."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id", round_digits: int | None = 6,
                exclude_self: bool = True) -> DataFrame:
    """Exact top-``k`` neighbors per query by cosine (brute force).

    Output: (query_id, vec_id, cosine, rank). ``queries`` is broadcast —
    the corpus is never shuffled; ties break on neighbor id ascending.
    ``round_digits`` rounds the similarity *before* ranking so orderings
    are reproducible across engines/float orders.
    """
    from caspr_spark.sources import ensure_parallelism

    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec"))
    joined = ensure_parallelism(corpus.select(id_col, vec_col)) \
        .crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    sim = cosine_similarity_col(F.col("__qvec"), F.col(vec_col))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = joined.withColumn("cosine", sim)
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(),
                                                 F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id_col, id_col, "cosine", "rank"))


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (driver-side, tiny)."""
    planes = []
    state = seed
    for p in range(n_planes):
        vals = []
        for i in range(dim):
            # xorshift64* — deterministic across platforms, no numpy needed
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            u = ((state * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF) / 2**64
            vals.append(u - 0.5)
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / n for v in vals])
    return planes


def add_lsh_bucket(df: DataFrame, vec_col: str = "embedding", n_planes: int = 8,
                   seed: int = 42, out_col: str = "lsh_bucket") -> DataFrame:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) per vector.

    Cosine-similar vectors land in the same bucket with high probability;
    the bucket id is a join/cluster key that prunes candidate sets at scale.
    """
    dim = len(df.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bucket = bucket + F.when(_dot(vd, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn(out_col, bucket)


def cosine_topk_lsh(corpus: DataFrame, queries: DataFrame, k: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id", n_planes: int = 6,
                    seed: int = 42) -> DataFrame:
    """Approximate top-k: LSH-bucket join prunes candidates, exact re-rank.

    The scale path: at 100 TB the corpus is bucketed once (and can be
    written bucketed-by ``lsh_bucket``); each query only scans its bucket.
    """
    c = add_lsh_bucket(corpus, vec_col, n_planes, seed)
    q = add_lsh_bucket(
        queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec")), "__qvec", n_planes, seed)
    joined = (c.join(F.broadcast(q), on="lsh_bucket")
               .filter(F.col(id_col) != F.col(query_id_col)))
    scored = joined.withColumn(
        "cosine", F.round(cosine_similarity_col(F.col("__qvec"), F.col(vec_col)), 6))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(),
                                                 F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id_col, id_col, "cosine", "rank"))


def ivf_index(corpus: DataFrame, n_cells: int = 16, id_col: str = "vec_id",
              vec_col: str = "embedding", seed: int = 42):
    """IVF coarse quantizer: seeded MLlib KMeans centroids + cell assignment.

    Returns ``(indexed_corpus, centroids)`` where ``indexed_corpus`` carries
    an ``ivf_cell`` column and ``centroids`` is the driver-side list of
    centroid vectors. At scale, write the corpus partitioned/bucketed by
    ``ivf_cell`` so a probe touches only its cells' files.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.withColumn("__features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=n_cells, seed=seed, featuresCol="__features",
                   predictionCol="ivf_cell").fit(feat)
    indexed = model.transform(feat).drop("__features")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return indexed, centroids


def cosine_topk_ivf(corpus: DataFrame, queries: DataFrame, k: int,
                    n_cells: int = 16, n_probe: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id", seed: int = 42) -> DataFrame:
    """IVF ANN: probe the ``n_probe`` nearest cells per query, exact re-rank.

    The second scale path beside LSH: cluster-aware pruning (recall degrades
    gracefully with ``n_probe``; ``n_probe = n_cells`` is exact). The
    query-to-cell assignment is a driver-side product against the tiny
    centroid list, shipped as a broadcast (query_id, cell) pair table.
    """
    indexed, centroids = ivf_index(corpus, n_cells, id_col, vec_col, seed)

    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec"))
    # rank centroids per query by (euclidean, to match KMeans assignment)
    cent = [(i, F.array(*[F.lit(v) for v in c])) for i, c in enumerate(centroids)]
    dist_cols = [
        F.struct(
            F.aggregate(F.zip_with(F.transform(F.col("__qvec"),
                                               lambda x: x.cast("double")), c,
                                   lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0), lambda acc, v: acc + v).alias("d"),
            F.lit(i).alias("cell"))
        for i, c in cent]
    probes = q.withColumn(
        "__cells",
        F.slice(F.array_sort(F.array(*dist_cols)), 1, n_probe)) \
        .select(query_id_col, "__qvec",
                F.explode(F.transform("__cells", lambda s: s["cell"]))
                 .alias("ivf_cell"))

    joined = (indexed.join(F.broadcast(probes), on="ivf_cell")
              .filter(F.col(id_col) != F.col(query_id_col)))
    scored = joined.withColumn(
        "cosine", F.round(cosine_similarity_col(F.col("__qvec"),
                                                F.col(vec_col)), 6))
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(),
                                                 F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(query_id_col, id_col, "cosine", "rank"))


def embedding_near_duplicates(df: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id", vec_col: str = "embedding",
                              n_planes: int = 6, seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    LSH-bucketed self-join: only same-bucket pairs are scored, so the
    quadratic blowup is bounded by bucket size, not corpus size.
    """
    from caspr_spark.sources import ensure_parallelism
    b = add_lsh_bucket(ensure_parallelism(df.select(id_col, vec_col)),
                       vec_col, n_planes, seed)
    left = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__v_a"), "lsh_bucket")
    right = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__v_b"), "lsh_bucket")
    return (left.join(right, on="lsh_bucket")
                .filter(F.col("id_a") < F.col("id_b"))
                .withColumn("cosine",
                            F.round(cosine_similarity_col(F.col("__v_a"), F.col("__v_b")), 6))
                .filter(F.col("cosine") >= threshold)
                .select("id_a", "id_b", "cosine").distinct())
