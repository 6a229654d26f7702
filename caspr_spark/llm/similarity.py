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


def lsh_plan(n_rows: int, threshold: float = 0.3, target_recall: float = 0.9,
             n_planes: int | None = None, target_bucket_rows: int = 128,
             max_tables: int = 64) -> tuple[int, int]:
    """Size an OR-amplified hyperplane-LSH index for a corpus of ``n_rows``.

    ``n_planes`` scales with corpus size so the *expected* bucket holds
    ~``target_bucket_rows`` vectors — the per-bucket self-join stays bounded
    as the corpus grows (1e9 vectors → 23 planes → ~128-row buckets), which
    is what keeps the candidate set O(N·bucket) instead of O(N²).

    ``n_tables`` comes from the OR-amplification recall bound: a pair at
    cosine ``threshold`` collides per plane with p1 = 1 − acos(s)/π, per
    table with p1^n_planes, and across b independent tables with
    1 − (1 − p1^n_planes)^b ≥ ``target_recall``. Higher thresholds (true
    near-dups, s ≥ 0.9) need few tables even at 20+ planes; low-similarity
    targets on near-uniform data are intrinsically expensive (ρ → 1) and
    the formula makes that cost explicit instead of silently missing pairs.
    """
    if n_planes is None:
        n_planes = max(4, min(24, math.ceil(
            math.log2(max(n_rows, 1) / target_bucket_rows))
            if n_rows > target_bucket_rows else 4))
    p1 = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    p_table = p1 ** n_planes
    if p_table >= 1.0 - 1e-12:
        n_tables = 1
    else:
        n_tables = max(1, min(max_tables, math.ceil(
            math.log(max(1.0 - target_recall, 1e-12)) / math.log(1.0 - p_table))))
    return n_planes, n_tables


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bucket = bucket + F.when(_dot(vd, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def add_lsh_bucket(df: DataFrame, vec_col: str = "embedding", dim: int = 64,
                   n_planes: int = 8, seed: int = 42,
                   out_col: str = "lsh_bucket") -> DataFrame:
    """Random-hyperplane LSH bucket id (0..2^n_planes-1) per vector.

    Cosine-similar vectors land in the same bucket with high probability;
    the bucket id is a join/cluster key that prunes candidate sets at scale.
    ``dim`` is an explicit parameter — no driver-side action is fired to
    infer it (the planes are a pure driver-side constant).
    """
    return df.withColumn(
        out_col, _bucket_expr(vec_col, random_hyperplanes(dim, n_planes, seed)))


def add_lsh_buckets(df: DataFrame, vec_col: str, dim: int, n_planes: int,
                    n_tables: int = 1, seed: int = 42,
                    out_col: str = "lsh_buckets") -> DataFrame:
    """``n_tables`` independent LSH bucket ids per vector (array column).

    Table ``t`` uses its own plane set (seed + 1000·t); a candidate pair
    only needs to collide in *one* table (OR-amplification), mirroring the
    banding of the MinHash path in ``dedup.minhash_lsh_dedup``.
    """
    buckets = [_bucket_expr(vec_col, random_hyperplanes(dim, n_planes,
                                                        seed + 1000 * t))
               for t in range(n_tables)]
    return df.withColumn(out_col, F.array(*buckets))


def _explode_buckets(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(*cols, F.posexplode("lsh_buckets").alias("__t", "__b"))


def cosine_topk_lsh(corpus: DataFrame, queries: DataFrame, k: int,
                    dim: int = 64, id_col: str = "vec_id",
                    vec_col: str = "embedding", query_id_col: str = "query_id",
                    n_planes: int | None = None, n_tables: int | None = None,
                    threshold: float = 0.3, target_recall: float = 0.9,
                    n_corpus: int | None = None, seed: int = 42) -> DataFrame:
    """Approximate top-k: OR-amplified LSH candidate pruning, exact re-rank.

    ``n_tables`` independent plane sets are OR-ed — a corpus vector is a
    candidate for a query if they share a bucket in *any* table — then the
    candidate set is exactly re-ranked by cosine. Leave ``n_planes``/
    ``n_tables`` unset to have :func:`lsh_plan` size them from the corpus
    (pass ``n_corpus`` to avoid the sizing ``count()``; at scale it is a
    known catalog statistic). At 100 TB the corpus is bucketed once and can
    be written partitioned by (table, bucket); each query probes only its
    n_tables buckets.
    """
    if n_planes is None or n_tables is None:
        n = n_corpus if n_corpus is not None else corpus.count()
        auto_planes, auto_tables = lsh_plan(n, threshold, target_recall, n_planes)
        n_planes = n_planes if n_planes is not None else auto_planes
        n_tables = n_tables if n_tables is not None else auto_tables
    c = _explode_buckets(
        add_lsh_buckets(corpus.select(id_col, vec_col), vec_col, dim,
                        n_planes, n_tables, seed), [id_col, vec_col])
    q = _explode_buckets(
        add_lsh_buckets(
            queries.select(F.col(id_col).alias(query_id_col),
                           F.col(vec_col).alias("__qvec")),
            "__qvec", dim, n_planes, n_tables, seed), [query_id_col, "__qvec"])
    joined = (c.join(F.broadcast(q), on=["__t", "__b"])
               .filter(F.col(id_col) != F.col(query_id_col)))
    # distinct collapses multi-table duplicate candidates; cosine is a
    # deterministic function of the pair so it can ride through the distinct
    scored = (joined.withColumn(
        "cosine", F.round(cosine_similarity_col(F.col("__qvec"), F.col(vec_col)), 6))
        .select(query_id_col, id_col, "cosine").distinct())
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
                              dim: int = 64, n_planes: int | None = None,
                              n_tables: int | None = None,
                              target_recall: float = 0.9,
                              n_corpus: int | None = None,
                              seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    OR-amplified LSH self-join: a pair is scored if it shares a bucket in
    any of ``n_tables`` independent plane sets, so the quadratic blowup is
    bounded by bucket size (× tables), not corpus size — and recall at the
    ``threshold`` similarity is the explicit :func:`lsh_plan` target rather
    than whatever a single table happens to deliver. The plan uses
    ``threshold`` itself as the collision similarity: high-threshold
    near-dup detection (0.9+) stays cheap even at 20+ planes.
    """
    from caspr_spark.sources import ensure_parallelism
    if n_planes is None or n_tables is None:
        n = n_corpus if n_corpus is not None else df.count()
        auto_planes, auto_tables = lsh_plan(n, threshold, target_recall, n_planes)
        n_planes = n_planes if n_planes is not None else auto_planes
        n_tables = n_tables if n_tables is not None else auto_tables
    b = _explode_buckets(
        add_lsh_buckets(ensure_parallelism(df.select(id_col, vec_col)),
                        vec_col, dim, n_planes, n_tables, seed),
        [id_col, vec_col])
    left = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__v_a"),
                    "__t", "__b")
    right = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__v_b"),
                     "__t", "__b")
    return (left.join(right, on=["__t", "__b"])
                .filter(F.col("id_a") < F.col("id_b"))
                .withColumn("cosine",
                            F.round(cosine_similarity_col(F.col("__v_a"), F.col("__v_b")), 6))
                .filter(F.col("cosine") >= threshold)
                .select("id_a", "id_b", "cosine").distinct())
