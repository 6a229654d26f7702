"""Training-mixture composition: domain weighting, sequence packing,
diversity-balanced sampling (caspr_spark/llm/mixture.py)."""

import pytest
from pyspark.sql import functions as F

from caspr_spark.llm.mixture import (cluster_balanced_sample, mixture_sample,
                                     pack_sequences_nextfit,
                                     pack_sequences_offset)
from caspr_spark.llm.text import add_token_counts


class TestMixtureSample:
    def test_hits_budget_and_deterministic(self, documents):
        out = mixture_sample(documents, "source", budget=200, alpha=0.5,
                             id_cols=["doc_id"])
        n = out.count()
        # md5-threshold sampling is binomial per domain; ±40% at n=200
        assert 120 <= n <= 280
        again = mixture_sample(documents, "source", budget=200, alpha=0.5,
                               id_cols=["doc_id"])
        assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) \
            == sorted(r["doc_id"] for r in again.select("doc_id").collect())

    def test_alpha_zero_uniformizes(self, documents):
        """alpha=0 targets equal per-domain counts regardless of size."""
        nat = dict(documents.groupBy("lang").count().collect()
                   and [(r["lang"], r["count"]) for r in
                        documents.groupBy("lang").count().collect()])
        out = mixture_sample(documents, "lang", budget=100, alpha=0.0,
                             id_cols=["doc_id"])
        got = {r["lang"]: r["count"]
               for r in out.groupBy("lang").count().collect()}
        # every language targeted at 20 docs; allow binomial noise
        assert set(got) <= set(nat)
        for lang, c in got.items():
            assert c <= max(40, nat[lang])

    def test_alpha_one_is_natural_rate(self, documents):
        """alpha=1: every domain sampled at the same budget/total rate."""
        out = mixture_sample(documents, "lang", budget=250, alpha=1.0,
                             id_cols=["doc_id"], rate_col="rate")
        rates = {round(r["rate"], 9) for r in
                 out.select("rate").distinct().collect()}
        assert len(rates) == 1  # uniform rate across domains
        assert abs(next(iter(rates)) - 0.5) < 1e-9  # 250 / 500

    def test_budget_above_corpus_keeps_all(self, documents):
        out = mixture_sample(documents, "lang", budget=10_000, alpha=0.7,
                             id_cols=["doc_id"])
        assert out.count() == documents.count()


class TestPackOffset:
    def test_assignment_and_offsets(self, documents):
        toks = add_token_counts(documents)
        out = pack_sequences_offset(toks, "n_tokens_ws", 512,
                                    group_cols=["lang"])
        rows = out.select("lang", "doc_id", "n_tokens_ws", "seq_id",
                          "seq_offset").collect()
        assert len(rows) == documents.count()
        assert all(0 <= r["seq_offset"] < 512 for r in rows)
        # recompute per group in python
        by_lang = {}
        for r in sorted(rows, key=lambda r: (r["lang"], r["doc_id"])):
            cum = by_lang.get(r["lang"], 0)
            assert r["seq_id"] == cum // 512
            assert r["seq_offset"] == cum % 512
            by_lang[r["lang"]] = cum + r["n_tokens_ws"]

    def test_global_tape_when_no_groups(self, documents):
        toks = add_token_counts(documents).limit(50)
        out = pack_sequences_offset(toks, "n_tokens_ws", 256)
        assert out.select("seq_id").distinct().count() >= 2


class TestPackNextfit:
    def test_budget_invariant(self, documents):
        toks = add_token_counts(documents)
        out = pack_sequences_nextfit(toks, "n_tokens_ws", 512,
                                     group_cols=["lang"])
        stats = (out.groupBy("lang", "seq_id")
                 .agg(F.sum("n_tokens_ws").alias("total"),
                      F.count("*").alias("docs")).collect())
        for r in stats:
            # a multi-doc sequence never exceeds the budget; a single
            # over-long doc may
            assert r["docs"] == 1 or r["total"] <= 512
        assert out.count() == documents.count()

    def test_matches_python_walk(self, documents):
        toks = add_token_counts(documents).filter("lang = 'en'")
        out = {r["doc_id"]: (r["seq_id"], r["seq_fill"])
               for r in pack_sequences_nextfit(
                   toks, "n_tokens_ws", 300, group_cols=["lang"]).collect()}
        rows = sorted(toks.select("doc_id", "n_tokens_ws").collect(),
                      key=lambda r: r["doc_id"])
        cur, fill = 0, 0
        for r in rows:
            tok = r["n_tokens_ws"]
            if fill > 0 and fill + tok > 300:
                cur, fill = cur + 1, 0
            fill += tok
            assert out[r["doc_id"]] == (cur, fill)

    def test_requires_groups(self, documents):
        with pytest.raises(ValueError, match="group_cols"):
            pack_sequences_nextfit(documents, "n_chars", 512, group_cols=[])


class TestClusterBalanced:
    def test_cap_via_lsh(self, embeddings):
        out = cluster_balanced_sample(embeddings, cap=5, vec_col="embedding",
                                      id_col="vec_id",
                                      keep_cluster_col="cluster")
        per = out.groupBy("cluster").count().collect()
        assert all(r["count"] <= 5 for r in per)
        assert out.count() < embeddings.count()

    def test_precomputed_cluster_col(self, documents):
        out = cluster_balanced_sample(documents, cap=3, cluster_col="lang",
                                      id_col="doc_id")
        per = out.groupBy("lang").count().collect()
        assert all(r["count"] == 3 for r in per)  # every lang has >= 3 docs

    def test_requires_cluster_or_vec(self, documents):
        with pytest.raises(ValueError, match="cluster_col or vec_col"):
            cluster_balanced_sample(documents, cap=3)


class TestDsirSelect:
    """DSIR importance resampling (Xie et al. 2023): hashed n-gram
    bucket log-ratios in fixed-point, Gumbel-top-k via md5 uniforms."""

    def test_deterministic_and_seed_sensitive(self, documents):
        from caspr_spark.llm.mixture import dsir_select
        target = documents.filter(F.col("lang") == "en")
        a = dsir_select(documents, target, k=50, n_buckets=128, seed=42)
        b = dsir_select(documents, target, k=50, n_buckets=128, seed=42)
        ids = lambda d: [r["doc_id"] for r in d.select("doc_id").collect()]
        assert sorted(ids(a)) == sorted(ids(b))
        c = dsir_select(documents, target, k=50, n_buckets=128, seed=7)
        assert sorted(ids(a)) != sorted(ids(c))  # Gumbel noise is seeded

    def test_shifts_toward_target(self, documents):
        """Selected docs must over-represent the target distribution:
        with target = English, the English share among the selected k
        must exceed the raw corpus's English share."""
        from caspr_spark.llm.mixture import dsir_select
        target = documents.filter(F.col("lang") == "en")
        sel = dsir_select(documents, target, k=100, n_buckets=256, seed=42)
        picked = sel.join(documents.select("doc_id", "lang"), on="doc_id")
        share = (picked.filter(F.col("lang") == "en").count()
                 / picked.count())
        raw_share = (documents.filter(F.col("lang") == "en").count()
                     / documents.count())
        assert share > raw_share + 0.15

    def test_log_ratios_bounded_and_finite(self, documents):
        from caspr_spark.llm.mixture import dsir_log_ratios
        target = documents.filter(F.col("lang") == "en")
        lr = dsir_log_ratios(target, documents, n_buckets=64).collect()
        assert 0 < len(lr) <= 64
        for r in lr:
            assert r["log_ratio_fx"] is not None  # smoothing keeps finite

    def test_k_above_corpus_returns_all(self, documents):
        from caspr_spark.llm.mixture import dsir_select
        target = documents.filter(F.col("lang") == "en")
        out = dsir_select(documents, target, k=10_000, n_buckets=64)
        assert out.count() == documents.count()

    def test_k_validation(self, documents):
        from caspr_spark.llm.mixture import dsir_select
        with pytest.raises(ValueError, match="k must be > 0"):
            dsir_select(documents, documents, k=0)

    def test_plan_broadcast_and_takeordered(self, documents):
        """Scale contract: the weight join must broadcast (never
        sort-merge the corpus against the bucket relation) and the
        top-k must plan TakeOrderedAndProject, not a global sort."""
        import contextlib
        import io

        from caspr_spark.llm.mixture import dsir_select
        target = documents.filter(F.col("lang") == "en")
        out = dsir_select(documents, target, k=20, n_buckets=128)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert "TakeOrderedAndProject" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan


class TestDsirPythonModel:
    """End-to-end pure-python replay of dsir_select: same md5 bucket
    hashing, same Laplace log-ratios in 1e9 fixed-point, same
    md5-uniform Gumbel keys — the selected set and every log_w must
    match exactly (the fixed-point design means no float-sum slack)."""

    @staticmethod
    def _model(raw, target, k, n_buckets, seed=42, alpha=1.0):
        import hashlib
        import math

        def grams(text):
            w = text.strip().lower().split()
            return w + [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) \
                % n_buckets

        tc, rc = {}, {}
        for t in target.values():
            for g in grams(t):
                b = bucket(g); tc[b] = tc.get(b, 0) + 1
        for t in raw.values():
            for g in grams(t):
                b = bucket(g); rc[b] = rc.get(b, 0) + 1
        tt, rt = sum(tc.values()), sum(rc.values())

        def half_away(x):
            return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

        lrfx = {b: half_away(
            (math.log((tc.get(b, 0) + alpha) / (tt + alpha * n_buckets))
             - math.log((c + alpha) / (rt + alpha * n_buckets))) * 1e9)
            for b, c in rc.items()}
        rows = []
        for d, t in raw.items():
            wfx = sum(lrfx[bucket(g)] for g in grams(t))
            u = (int(hashlib.md5(f"{seed}|{d}".encode())
                     .hexdigest()[:8], 16) + 1.0) / 4294967297.0
            key = round(wfx / 1e9 - math.log(-math.log(u)), 6)
            rows.append((d, round(wfx / 1e9, 6), key))
        rows.sort(key=lambda r: (-r[2], r[0]))
        return rows[:k]

    def test_selected_set_and_weights_match(self, spark, documents):
        from caspr_spark.llm.mixture import dsir_select
        raw = {r["doc_id"]: r["text"]
               for r in documents.select("doc_id", "text").collect()}
        target = {r["doc_id"]: r["text"]
                  for r in documents.filter(F.col("lang") == "en")
                                    .select("doc_id", "text").collect()}
        want = self._model(raw, target, k=50, n_buckets=128)
        got = [(r["doc_id"], r["log_w"], r["key"])
               for r in dsir_select(
                   documents, documents.filter(F.col("lang") == "en"),
                   k=50, n_buckets=128).collect()]
        got.sort(key=lambda r: (-r[2], r[0]))
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert g[1] == w[1], (g, w)         # exact fixed-point log_w
            assert abs(g[2] - w[2]) <= 1e-6     # key: one float ln-ln


class TestDsirSharedGrams:
    """Round-11: dsir_select fed from persisted n=1/n=2 gram tables
    must reproduce the raw-text path bit-for-bit (a DSIR bucket is a
    pure function of the gram md5 the tables store)."""

    def test_gram_table_path_identical(self, documents):
        from caspr_spark.llm.dedup import gram_table
        from caspr_spark.llm.mixture import dsir_select
        target = documents.filter(F.col("lang") == "en")
        kw = dict(k=25, id_col="doc_id", text_col="text", n_buckets=64,
                  alpha=1.0, include_bigrams=True, seed=7)
        want = [tuple(r) for r in
                dsir_select(documents, target, **kw).collect()]
        got = [tuple(r) for r in
               dsir_select(documents, target, **kw,
                           raw_grams_uni=gram_table(documents, n=1),
                           raw_grams_bi=gram_table(documents, n=2))
               .collect()]
        assert got == want

    def test_unigram_only_path_identical(self, documents):
        from caspr_spark.llm.dedup import gram_table
        from caspr_spark.llm.mixture import dsir_select
        target = documents.filter(F.col("lang") == "en")
        kw = dict(k=25, n_buckets=64, include_bigrams=False, seed=7)
        want = [tuple(r) for r in
                dsir_select(documents, target, **kw).collect()]
        got = [tuple(r) for r in
               dsir_select(documents, target, **kw,
                           raw_grams_uni=gram_table(documents, n=1))
               .collect()]
        assert got == want

    def test_width_and_arg_guards(self, documents):
        import pytest
        from caspr_spark.llm.dedup import gram_table
        from caspr_spark.llm.mixture import dsir_select
        target = documents.limit(5)
        with pytest.raises(ValueError, match="raw_grams_bi"):
            dsir_select(documents, target, k=5,
                        raw_grams_uni=gram_table(documents, n=1))
        with pytest.raises(ValueError, match="raw_grams_uni"):
            dsir_select(documents, target, k=5,
                        raw_grams_bi=gram_table(documents, n=2))
        # wrong-width table fails loudly at execution (in-plan guard)
        wrong = dsir_select(documents, target, k=5,
                            raw_grams_uni=gram_table(documents, n=2),
                            raw_grams_bi=gram_table(documents, n=2))
        with pytest.raises(Exception, match="gram_table built with n=2"):
            wrong.collect()
