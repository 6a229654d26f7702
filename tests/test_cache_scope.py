"""Cache-lifetime discipline (r4 verdict item 8): operators that
persist() intermediates release them deterministically when the caller
wraps the call in ``cache_scope()`` — and keep the historical LRU
behavior when no scope is active."""

import pytest
from pyspark.sql import functions as F

from caspr_spark import cache_scope
from caspr_spark.cache import register_cache


def _cached_rdd_ids(spark):
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


@pytest.fixture()
def docs(spark):
    rows = [(i, f"the quick brown fox jumps over dog number {i % 7} "
                f"again and again and again word{i}") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCacheScope:
    def test_scope_registers_and_releases(self, spark):
        before = _cached_rdd_ids(spark)
        df = spark.range(100)
        with cache_scope() as handles:
            register_cache(df.persist())
            assert df.count() == 100
            assert len(handles) == 1
            assert _cached_rdd_ids(spark) - before
        assert df.storageLevel.useMemory is False
        assert _cached_rdd_ids(spark) == before

    def test_no_scope_is_noop(self, spark):
        df = spark.range(50).persist()
        try:
            assert register_cache(df) is df          # passthrough
            df.count()
            assert df.storageLevel.useMemory is True  # LRU contract kept
        finally:
            df.unpersist(blocking=True)

    def test_scopes_nest(self, spark):
        a, b = spark.range(10), spark.range(20)
        with cache_scope() as outer:
            register_cache(a.persist())
            with cache_scope() as inner:
                register_cache(b.persist())
                assert [d.count() for d in (a, b)] == [10, 20]
            assert len(inner) == 1
            assert b.storageLevel.useMemory is False   # inner released
            assert a.storageLevel.useMemory is True    # outer still live
        assert a.storageLevel.useMemory is False

    def test_minhash_lsh_dedup_no_leak(self, spark, docs):
        from caspr_spark.llm.dedup import minhash_lsh_dedup
        before = _cached_rdd_ids(spark)
        with cache_scope() as handles:
            dedup, pairs = minhash_lsh_dedup(docs, threshold=0.5)
            dedup.collect(); pairs.collect()
            assert handles, "operator did not register its persist()"
        assert _cached_rdd_ids(spark) == before

    def test_winnow_pairs_no_leak(self, spark, docs):
        from caspr_spark.llm.dedup import winnow_pairs
        before = _cached_rdd_ids(spark)
        with cache_scope() as handles:
            winnow_pairs(docs, k=4, window=3, min_shared=1).collect()
            assert handles
        assert _cached_rdd_ids(spark) == before

    def test_embedding_near_duplicates_no_leak(self, spark):
        from caspr_spark.llm.similarity import embedding_near_duplicates
        emb = spark.createDataFrame(
            [(i, [float((i * 7 + j) % 5 - 2) for j in range(8)])
             for i in range(30)],
            "vec_id long, embedding array<double>")
        before = _cached_rdd_ids(spark)
        with cache_scope() as handles:
            embedding_near_duplicates(emb, threshold=0.8, dim=8,
                                      n_planes=4, n_tables=2).collect()
            assert handles
        assert _cached_rdd_ids(spark) == before

    def test_related_documents_no_leak(self, spark, docs):
        from caspr_spark.llm.search import related_documents
        before = _cached_rdd_ids(spark)
        with cache_scope() as handles:
            related_documents(docs, k=2).collect()
            assert handles
        assert _cached_rdd_ids(spark) == before
