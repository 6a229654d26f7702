"""Graph centrality over pair tables — PageRank on DataFrames.

The dedup stack already produces similarity GRAPHS (winnowing pairs,
LSH near-dup pairs, related-docs edges) and resolves them with
connected components (llm/dedup.py). PageRank adds the centrality
complement: rank documents/entities by link structure — canonical-page
election inside near-dup clusters, influence scoring over interaction
graphs, seed selection for crawl frontiers.

Scale shape per iteration: one equi-join of the rank relation to the
edge table on ``src`` + one hash aggregation on ``dst`` + one left
join back to the node set — the standard distributed formulation
(edges partition by src once and every iteration reuses that
partitioning; ranks are node-sized, edges are never materialized
beyond their table). Iterations are bounded and each result is
``localCheckpoint``-ed so the lineage stays O(1) instead of O(k).

Determinism (what makes a DuckDB oracle possible for an iterative
float algorithm): per-iteration contributions are accumulated as
**fixed-point BIGINTs** (``round(rank · 1e12 / degree)``), whose sum
is exact and order-independent — the same discipline as the bigram-LM
log-prob sums in ``llm/lm.py``. Every engine that replays the same
arithmetic reproduces the ranks bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from caspr_spark.cache import checkpoint_leaf, register_cache

FP_SCALE = 1_000_000_000_000  # 1e12 fixed-point contribution scale


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iterations: int = 10,
             undirected: bool = True, id_out: str = "id",
             rank_out: str = "rank") -> DataFrame:
    """PageRank over an edge table; returns (``id_out``, ``rank_out``).

    Nodes are the distinct endpoint set of ``edges`` (an isolated node
    has no edges to define it — filter-join your full entity table
    afterwards if you need rank 0 rows). ``undirected=True`` (the
    similarity-graph case) mirrors every edge. Dangling nodes cannot
    exist in the undirected case; in the directed case a sink node's
    rank mass is dropped (the "no outlinks" simplification — callers
    that need the redistribute variant can add self-loops). Ranks sum
    to ~1 over the node set (minus dropped dangling mass); output
    rounded to 9 dp.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    e = e.distinct()
    # repartition by src once; every iteration's join reuses the layout.
    # localCheckpoint (not persist): a persist caches the DATA but keeps
    # the full logical plan, so an upstream edge producer (e.g. the
    # winnowing fingerprint self-join) is re-analyzed inside every
    # iteration's nested plan and Catalyst analysis cost grows
    # geometrically with iteration depth (measured: 5.6 s/iteration on a
    # 24-edge winnow graph vs 0.6 s with a leaf plan). The checkpoint
    # materializes the edge table once as a LEAF plan; its storage is
    # ContextCleaner-managed.
    e, e_handle = checkpoint_leaf(e.repartition("src"))
    nodes = (e.select(F.col("src").alias("id"))
              .unionByName(e.select(F.col("dst").alias("id")))
              .distinct().persist())
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        e_handle.unpersist()
        # a FRESH empty relation, not a projection of the just-released
        # checkpoint (whose truncated lineage cannot recompute)
        spark = edges.sparkSession
        return spark.createDataFrame(
            [], schema=nodes.select(F.col("id").alias(id_out)).schema) \
            .withColumn(rank_out, F.lit(0.0))
    deg = e.groupBy(F.col("src").alias("id")) \
           .agg(F.count(F.lit(1)).alias("deg"))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    prev = None
    mid_handle = None
    for it in range(iterations):
        contrib = (ranks.join(deg, on="id")
                   .join(e, ranks["id"] == e["src"])
                   .groupBy("dst")
                   .agg(F.sum(F.round(F.col("rank") * F.lit(float(FP_SCALE))
                                      / F.col("deg")).cast("long"))
                        .alias("fp")))
        ranks = (nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
                 .select(nodes["id"],
                         (F.lit(base) + F.lit(damping)
                          * (F.coalesce(F.col("fp"), F.lit(0))
                             / F.lit(float(FP_SCALE)))).alias("rank")))
        # persist+count materializes the iteration (node-sized, cheap —
        # the plans stay small because e/checkpoints are leaf plans) and
        # lets the superseded iteration free its storage NOW; every ~10
        # iterations a leaf checkpoint re-truncates the (tiny-plan)
        # nesting so analysis cost stays flat at any iteration count.
        ranks = ranks.persist()
        ranks.count()
        if prev is not None:
            prev.unpersist()
        prev = ranks
        if (it + 1) % 10 == 0 and it + 1 < iterations:
            ranks, h = checkpoint_leaf(ranks)
            prev.unpersist()
            prev = None
            if mid_handle is not None:
                mid_handle.unpersist()
            mid_handle = h
    # Leaf-checkpoint the final iteration so the returned (lazy) result
    # references ONLY its own materialized data — then every upstream
    # handle (edge checkpoint, node cache, intermediate persists) can be
    # released deterministically right here. The final checkpoint itself
    # goes to the active cache_scope() if any; one-shot callers fall
    # back to ContextCleaner GC like the LSH projections' LRU. NOTE:
    # unlike persist-backed results, a checkpoint cannot recompute after
    # release — materialize INSIDE the scope (which is the cache_scope
    # contract anyway).
    final, final_handle = checkpoint_leaf(ranks)
    if prev is not None:
        prev.unpersist()
    if mid_handle is not None:
        mid_handle.unpersist()
    nodes.unpersist()
    e_handle.unpersist()
    register_cache(final_handle)
    return final.select(F.col("id").alias(id_out),
                        F.round(F.col("rank"), 9).alias(rank_out))


def pagerank_sql(edges_cte: str, damping: float = 0.85,
                 iterations: int = 10, id_a: str = "id_a",
                 id_b: str = "id_b") -> str:
    """DuckDB twin of :func:`pagerank` (undirected) — ``edges_cte`` is
    any SQL relation with two endpoint columns; iterations unroll into
    chained CTEs (recursive-term aggregation is not portable), each
    replaying the exact fixed-point arithmetic of the operator. The
    shared relations are MATERIALIZED so DuckDB evaluates the edge
    subquery once instead of re-inlining it into every iteration. The
    (1 - damping) base is emitted as the PRE-COMPUTED Python double
    (repr round-trips exactly) cast to DOUBLE — DuckDB would otherwise
    evaluate ``1.0 - 0.85`` in exact DECIMAL arithmetic and diverge
    from IEEE by one ulp, enough to flip a 9-dp rounding knife edge."""
    fp = float(FP_SCALE)
    sql = f"""
WITH raw_edges AS MATERIALIZED ({edges_cte}),
dedges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT {id_a} AS src, {id_b} AS dst FROM raw_edges
    UNION ALL
    SELECT {id_b} AS src, {id_a} AS dst FROM raw_edges)),
nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM dedges),
deg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM dedges GROUP BY src),
nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes),
pr0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    for i in range(1, iterations + 1):
        sql += f""",
pr{i} AS (
  SELECT nodes.id,
         CAST({(1.0 - damping)!r} AS DOUBLE) / (SELECT n FROM nn)
         + CAST({damping!r} AS DOUBLE)
           * (COALESCE(s.fp, 0) / {fp!r}) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id,
           SUM(CAST(round(p.rank * {fp!r} / d.deg) AS BIGINT)) AS fp
    FROM pr{i - 1} p
    JOIN deg d ON d.id = p.id
    JOIN dedges e ON e.src = p.id
    GROUP BY e.dst) s ON nodes.id = s.id)"""
    sql += f"\nSELECT id, round(rank, 9) AS rank FROM pr{iterations}"
    return sql
