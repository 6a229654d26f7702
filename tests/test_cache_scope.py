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


def _assert_no_new(spark, before):
    # "nothing NEW survives the scope", not exact set equality: `before`
    # may hold relations earlier suite tests left to ContextCleaner,
    # which can release them asynchronously WHILE this test runs — a
    # shrinking baseline is not a leak (same flake test_graph.py hit).
    assert _cached_rdd_ids(spark) - before == set()


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
        _assert_no_new(spark, before)

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
        _assert_no_new(spark, before)

    def test_winnow_pairs_no_leak(self, spark, docs):
        from caspr_spark.llm.dedup import winnow_pairs
        before = _cached_rdd_ids(spark)
        with cache_scope() as handles:
            winnow_pairs(docs, k=4, window=3, min_shared=1).collect()
            assert handles
        _assert_no_new(spark, before)

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
        _assert_no_new(spark, before)

    def test_related_documents_no_leak(self, spark, docs):
        from caspr_spark.llm.search import related_documents
        before = _cached_rdd_ids(spark)
        with cache_scope() as handles:
            related_documents(docs, k=2).collect()
            assert handles
        _assert_no_new(spark, before)


class TestQuantileScoresScope:
    def test_quantile_scores_no_leak(self, spark):
        """quantile_scores pins k+1 relations (input copy + one scan
        frame per scored column); a cache_scope releases all of them on
        exit (round-10 ADVICE fix — bench.py / check_correctness.py
        scope every query so sweeps don't pin hundreds of relations)."""
        from caspr_spark.segment import quantile_scores
        rows = [(i, float(i % 13), float((i * 7) % 11)) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, a double, b double")
        before = _cached_rdd_ids(spark)
        with cache_scope() as handles:
            out = quantile_scores(df, ["a", "b"], q=4, tiebreak=["id"])
            assert out.count() == 200
            assert len(handles) == 3      # input copy + 2 scan frames
        _assert_no_new(spark, before)

    def test_decontaminate_guard_no_leak(self, spark):
        """The broadcast size guard's persisted gram set releases with
        the scope too."""
        from caspr_spark.llm.filtering import decontaminate
        train = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "unrelated text here ok")],
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [(10, "x alpha beta gamma delta y")], "doc_id long, text string")
        before = _cached_rdd_ids(spark)
        with cache_scope() as handles:
            kept = decontaminate(train, bench, n=4,
                                 broadcast_limit=10_000).collect()
            assert handles
        assert [r.doc_id for r in kept] == [2]
        _assert_no_new(spark, before)


class TestStrictScope:
    """Round-12 stale-offset tripwire: global_running_sum results carry
    driver-collected per-partition offsets valid only against the
    pinned range boundaries. Escaping the scope then materializing is
    the silent-wrong-rows hazard (cache.py module docstring); strict
    mode converts it to a loud failure."""

    def _df(self, spark):
        # integral value column: global_running_sum's offset frame is
        # typed long (every consumer sums counts/tokens)
        return spark.createDataFrame(
            [(i, (i % 7)) for i in range(300)], "id long, v long")

    def test_strict_matches_default_inside_scope(self, spark):
        """While the scope lives, strict mode changes NOTHING about the
        result — the checkpoint freezes the same boundaries the persist
        pinned."""
        from caspr_spark.operators.sampling import global_running_sum
        df = self._df(spark)
        with cache_scope():
            want = {r.id: r.running_sum for r in
                    global_running_sum(df, "v", ["id"]).collect()}
        with cache_scope(strict=True):
            got = {r.id: r.running_sum for r in
                   global_running_sum(df, "v", ["id"]).collect()}
        assert got == want

    def test_strict_escape_fails_loudly(self, spark):
        """The tripwire itself: default mode lets an escaped consumer
        return (possibly re-sampled) rows; strict mode raises because
        the released checkpoint has no lineage to recompute."""
        from caspr_spark.operators.sampling import global_running_sum
        df = self._df(spark)
        # default: escape "works" (the documented hazard — rows come
        # back with no error even though the offsets may be stale)
        with cache_scope():
            escaped_default = global_running_sum(df, "v", ["id"])
        assert escaped_default.count() == 300
        # strict: escape raises on materialization
        with cache_scope(strict=True):
            escaped_strict = global_running_sum(df, "v", ["id"])
        with pytest.raises(Exception):
            escaped_strict.collect()

    def test_strict_env_var(self, spark, monkeypatch):
        """CASPR_STRICT_SCOPE=1 arms every scope without code changes —
        the debug-run switch."""
        from caspr_spark.cache import strict_scope_active
        assert strict_scope_active() is False
        monkeypatch.setenv("CASPR_STRICT_SCOPE", "1")
        assert strict_scope_active() is True
        from caspr_spark.operators.sampling import global_running_sum
        with cache_scope():
            escaped = global_running_sum(self._df(spark), "v", ["id"])
        with pytest.raises(Exception):
            escaped.collect()

    def test_strict_consumer_stratified_sample(self, spark):
        """A real prefix-scan consumer under strict mode: identical
        sample inside the scope, loud failure on escape."""
        from caspr_spark.operators.sampling import stratified_sample_exact
        df = spark.createDataFrame(
            [(i, "ab"[i % 2]) for i in range(200)], "id long, s string")
        with cache_scope():
            want = sorted(r.id for r in stratified_sample_exact(
                df, "s", 0.25, ["id"]).collect())
        with cache_scope(strict=True):
            got = sorted(r.id for r in stratified_sample_exact(
                df, "s", 0.25, ["id"]).collect())
        assert got == want and len(got) == 50
        with cache_scope(strict=True):
            escaped = stratified_sample_exact(df, "s", 0.25, ["id"])
        with pytest.raises(Exception):
            escaped.collect()

    def test_nested_plain_scope_keeps_outer_strict(self, spark):
        """A helper's plain cache_scope() nested inside a strict one
        must NOT disarm the tripwire — strictness is an outer
        promise."""
        from caspr_spark.cache import strict_scope_active
        from caspr_spark.operators.sampling import global_running_sum
        with cache_scope(strict=True):
            with cache_scope():
                assert strict_scope_active() is True
                escaped = global_running_sum(self._df(spark), "v", ["id"])
        with pytest.raises(Exception):
            escaped.collect()

    def test_fractional_value_col_raises_up_front(self, spark):
        """A double value column used to die deep in createDataFrame
        with a type error about the offset frame; the exact-integer
        contract (float partial sums drift by fold order) is now a
        loud up-front ValueError."""
        from caspr_spark.operators.sampling import global_running_sum
        df = spark.createDataFrame([(1, 1.5)], "id long, v double")
        with pytest.raises(ValueError, match="exact-integer"):
            global_running_sum(df, "v", ["id"])

    def test_missing_value_col_raises_up_front(self, spark):
        """A value_col absent from the frame used to slide past the
        type guard (dtypes lookup returned None) and surface as a
        late, less clear analysis error — now a loud ValueError
        naming the available columns."""
        from caspr_spark.operators.sampling import global_running_sum
        df = spark.createDataFrame([(1, 2)], "id long, v long")
        with pytest.raises(ValueError, match="not a column"):
            global_running_sum(df, "nope", ["id"])
