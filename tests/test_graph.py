"""PageRank over pair tables (operators/graph.py): hand-checked ranks,
mass conservation, determinism, and the fixed-point discipline that
makes the iterative oracle exact."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from caspr_spark.operators.graph import FP_SCALE, pagerank


def _numpy_pagerank(edges, damping=0.85, iterations=10):
    """Reference twin with the SAME fixed-point arithmetic."""
    dedges = set()
    for a, b in edges:
        dedges.add((a, b))
        dedges.add((b, a))
    nodes = sorted({x for e in dedges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = {v: 0 for v in nodes}
    for s, _ in dedges:
        deg[s] += 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        fp = {v: 0 for v in nodes}
        for s, d in dedges:
            fp[d] += int(np.round(rank[s] * FP_SCALE / deg[s]))
        rank = {v: (1 - damping) / n + damping * (fp[v] / FP_SCALE)
                for v in nodes}
    return {v: round(rank[v], 9) for v in nodes}, idx


class TestPagerank:
    def test_star_center_dominates(self, spark):
        edges = [(0, i) for i in range(1, 6)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.id: r.rank for r in pagerank(df, iterations=20).collect()}
        assert got[0] > max(got[i] for i in range(1, 6)) * 2
        leaf = [got[i] for i in range(1, 6)]
        assert max(leaf) - min(leaf) < 1e-12   # symmetry

    def test_matches_fixed_point_reference(self, spark):
        rng = np.random.default_rng(5)
        edges = {(int(a), int(b)) for a, b in
                 rng.integers(0, 12, size=(30, 2)) if a != b}
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        got = {r.id: r.rank for r in
               pagerank(df, iterations=6).collect()}
        want, _ = _numpy_pagerank(sorted(edges), iterations=6)
        assert got.keys() == want.keys()
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-9)

    def test_mass_conserved_undirected(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)],
                                   "src long, dst long")
        total = pagerank(df, iterations=15).agg(F.sum("rank")).first()[0]
        assert total == pytest.approx(1.0, abs=1e-6)

    def test_directed_sink_drops_mass(self, spark):
        # 1 -> 2, 2 has no outlinks: its mass drains (documented)
        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        out = pagerank(df, iterations=10, undirected=False)
        total = out.agg(F.sum("rank")).first()[0]
        assert total < 1.0

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping=1.5)
        with pytest.raises(ValueError, match="iterations"):
            pagerank(df, iterations=0)

    def test_cache_scope_releases_everything(self, spark):
        from caspr_spark import cache_scope

        def ids():
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            return {int(k) for k in jmap.keySet().toArray()}
        before = ids()
        df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        with cache_scope():
            pagerank(df, iterations=2).collect()
        # edge/node persists are released by the operator itself; the
        # final lineage-anchoring checkpoint by the scope. Assert no NEW
        # id survives rather than exact set equality: `before` can
        # contain relations earlier suite tests left to ContextCleaner,
        # which may release them asynchronously WHILE this test runs —
        # a shrinking baseline is not a leak (observed flake in the
        # full-suite run, passes in isolation).
        assert ids() - before == set()

    def test_at_most_final_checkpoint_survives(self, spark):
        def ids():
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            return {int(k) for k in jmap.keySet().toArray()}
        before = ids()
        df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        pagerank(df, iterations=4).collect()
        # superseded per-iteration checkpoints are unpersisted eagerly;
        # only the final one (the result's data) may remain
        assert len(ids() - before) <= 1


class TestPagerankEdgeCases:
    def test_empty_edge_table_collects(self, spark):
        """The n==0 early return must NOT reference the released edge
        checkpoint (regression: CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)."""
        empty = spark.createDataFrame([], "src long, dst long")
        out = pagerank(empty, iterations=3)
        assert out.collect() == []
        assert out.columns == ["id", "rank"]

    def test_checkpoint_leaf_captures_only_own_rdd(self, spark):
        from caspr_spark.cache import checkpoint_leaf

        def ids():
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            return {int(k) for k in jmap.keySet().toArray()}
        other = spark.range(50).persist()
        other.count()                      # unrelated live cache
        before = ids()
        leaf, handle = checkpoint_leaf(spark.range(10).selectExpr("id"))
        created = ids() - before
        assert len(created) == 1           # exactly the checkpoint RDD
        assert handle._ids == created      # captured directly, no diff
        handle.unpersist()
        assert ids() == before             # other's cache untouched
        other.unpersist()


class TestTriangleCount:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src long, dst long")

    def test_hand_computed(self, spark):
        from caspr_spark.operators.graph import triangle_count
        # K4 on {1,2,3,4} (4 triangles) + pendant 5 (0 triangles)
        k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        per_node, total = triangle_count(self._edges(spark, k4 + [(4, 5)]))
        got = {r.id: r.triangles for r in per_node.collect()}
        # each K4 vertex sits in C(3,2)=3 triangles
        assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}
        assert total == 4

    def test_orientation_and_duplicates_collapse(self, spark):
        from caspr_spark.operators.graph import triangle_count
        tri = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)]
        per_node, total = triangle_count(self._edges(spark, tri))
        assert total == 1
        assert {r.triangles for r in per_node.collect()} == {1}

    def test_degree_cap_drops_hub_triangles(self, spark):
        from caspr_spark.operators.graph import triangle_count
        # star hub 0 connected to 1..5, plus a triangle 1-2 edge
        edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
        _, total_uncapped = triangle_count(self._edges(spark, edges))
        per_node, total = triangle_count(self._edges(spark, edges),
                                         max_degree=3)
        assert total_uncapped == 1          # 0-1-2
        assert total == 0                   # hub dropped, stated recall
        assert 0 not in {r.id for r in per_node.collect()}

    def test_validation(self, spark):
        from caspr_spark.operators.graph import triangle_count
        with pytest.raises(ValueError, match="max_degree"):
            triangle_count(self._edges(spark, [(1, 2)]), max_degree=1)


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, spark):
        from caspr_spark.operators.graph import label_propagation
        c1 = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a < b]
        c2 = [(a, b) for a in (10, 11, 12) for b in (10, 11, 12) if a < b]
        edges = spark.createDataFrame(c1 + c2 + [(3, 10)],
                                      "src long, dst long")
        out = label_propagation(edges, iterations=4)
        lab = {r.id: r.label for r in out.collect()}
        # each clique converges to its smallest member's label
        assert lab[1] == lab[2] == lab[3] == 1
        assert lab[10] == lab[11] == lab[12]

    def test_deterministic_across_runs(self, spark):
        from caspr_spark.operators.graph import label_propagation
        import random
        rnd = random.Random(7)
        edges = spark.createDataFrame(
            [(rnd.randrange(30), rnd.randrange(30)) for _ in range(80)],
            "src long, dst long")
        a = {(r.id, r.label)
             for r in label_propagation(edges, iterations=3).collect()}
        b = {(r.id, r.label)
             for r in label_propagation(edges, iterations=3).collect()}
        assert a == b

    def test_validation(self, spark):
        from caspr_spark.operators.graph import label_propagation
        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="iterations"):
            label_propagation(edges, iterations=0)
