"""Unit tests for the corpus-filtering + search suite (filtering.py, search.py)."""

import math

import pytest
from pyspark.sql import functions as F

from caspr_spark.llm.filtering import (
    repetition_signals, redact_pii, ngram_hashes, decontaminate,
)
from caspr_spark.llm.search import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionSignals:
    def test_hand_computed(self, spark):
        df = _docs(spark, [(1, "a a a b")])
        r = repetition_signals(df).collect()[0]
        assert r.n_words == 4
        assert r.distinct_ratio == pytest.approx(2 / 4)
        assert r.top_word_frac == pytest.approx(3 / 4)
        # bigrams: "a a", "a a", "a b" -> top 2/3
        assert r.top_bigram_frac == pytest.approx(2 / 3)

    def test_all_distinct(self, spark):
        df = _docs(spark, [(1, "w x y z")])
        r = repetition_signals(df).collect()[0]
        assert r.distinct_ratio == 1.0
        assert r.top_word_frac == pytest.approx(1 / 4)
        assert r.top_bigram_frac == pytest.approx(1 / 3)

    def test_single_word_doc_has_zero_bigram_frac(self, spark):
        r = repetition_signals(_docs(spark, [(1, "solo")])).collect()[0]
        assert r.n_words == 1
        assert r.top_bigram_frac == 0.0

    def test_case_insensitive(self, spark):
        r = repetition_signals(_docs(spark, [(1, "Spam SPAM spam")])).collect()[0]
        assert r.top_word_frac == 1.0


class TestRedactPII:
    def test_all_three_kinds(self, spark):
        df = _docs(spark, [(1, "mail a.b@x.co.uk ip 10.0.0.1 tel +44 20 7946 0958 end")])
        r = redact_pii(df).collect()[0]
        assert "[EMAIL]" in r.redacted and "[IP]" in r.redacted and "[PHONE]" in r.redacted
        assert "a.b@x.co.uk" not in r.redacted and "10.0.0.1" not in r.redacted
        assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)

    def test_clean_text_untouched(self, spark):
        df = _docs(spark, [(1, "no pii here just words and a 3.14 constant")])
        r = redact_pii(df).collect()[0]
        assert r.redacted == "no pii here just words and a 3.14 constant"
        assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)

    def test_phone_does_not_eat_ip_or_email(self, spark):
        # digits in the email local part / IP octets must not leak into a
        # phone match after their own placeholders are substituted
        df = _docs(spark, [(1, "u123456789@d.com 192.168.001.001")])
        r = redact_pii(df).collect()[0]
        assert r.redacted == "[EMAIL] [IP]"
        assert r.n_phones == 0


class TestDecontaminate:
    def test_shared_ngram_removed(self, spark):
        train = _docs(spark, [(1, "alpha beta gamma delta"),
                              (2, "totally unrelated content here")])
        bench = _docs(spark, [(10, "x alpha beta gamma delta y")])
        kept = decontaminate(train, bench, n=4).select("doc_id").collect()
        assert [r.doc_id for r in kept] == [2]

    def test_short_doc_never_contaminated(self, spark):
        # shorter than n words -> no n-grams -> cannot collide
        train = _docs(spark, [(1, "alpha beta")])
        bench = _docs(spark, [(10, "alpha beta gamma delta")])
        assert decontaminate(train, bench, n=4).count() == 1

    def test_ngram_hashes_counts(self, spark):
        df = _docs(spark, [(1, "a b c d e")])
        assert ngram_hashes(df, n=3).count() == 3  # abc bcd cde
        assert ngram_hashes(df, n=5).count() == 1
        assert ngram_hashes(df, n=6).count() == 0

    def test_hash_is_order_sensitive(self, spark):
        h1 = ngram_hashes(_docs(spark, [(1, "a b c")]), n=3).collect()[0].gram_hash
        h2 = ngram_hashes(_docs(spark, [(1, "c b a")]), n=3).collect()[0].gram_hash
        assert h1 != h2

    def test_from_census_equals_text_path(self, spark):
        """Round-14 state-fed form: decontaminating against the
        benchmark's gram census (build_gram_census — the same md5
        gram hashing) keeps exactly the docs the text path keeps,
        and a census built at another width refuses in-plan."""
        import pytest

        from caspr_spark.llm.dedup import build_gram_census
        from caspr_spark.llm.filtering import decontaminate_from_census
        train = _docs(spark, [(1, "alpha beta gamma delta"),
                              (2, "totally unrelated content here")])
        bench = _docs(spark, [(10, "x alpha beta gamma delta y")])
        want = {r.doc_id for r in
                decontaminate(train, bench, n=4).collect()}
        census = build_gram_census(bench, n=4)
        got = {r.doc_id for r in
               decontaminate_from_census(train, census, n=4).collect()}
        assert got == want == {2}
        wrong = build_gram_census(bench, n=3)
        with pytest.raises(Exception, match="operator expects n=4"):
            decontaminate_from_census(train, wrong, n=4).collect()


class TestBM25:
    def test_hand_computed_score(self, spark):
        df = _docs(spark, [(1, "cat dog"), (2, "cat cat cat cat"),
                           (3, "bird bird bird bird bird bird")])
        out = {r.doc_id: r.score for r in bm25_topk(df, ["cat"], k=3).collect()}
        n, avgdl, k1, b = 3, 4.0, 1.2, 0.75
        idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

        def s(tf, dl):
            return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

        assert out[1] == pytest.approx(s(1, 2))
        assert out[2] == pytest.approx(s(2 * 2, 4))
        assert 3 not in out  # no query term -> unscored

    def test_rank_deterministic_on_ties(self, spark):
        df = _docs(spark, [(5, "cat"), (3, "cat"), (9, "cat")])
        ranks = [(r.doc_id, r.rank) for r in
                 bm25_topk(df, ["cat"], k=3).orderBy("rank").collect()]
        assert ranks == [(3, 1), (5, 2), (9, 3)]  # score ties -> id asc

    def test_empty_terms_raises(self, spark):
        with pytest.raises(ValueError):
            bm25_topk(_docs(spark, [(1, "x")]), [], k=1)

    def test_multi_term_sum(self, spark):
        df = _docs(spark, [(1, "cat dog"), (2, "cat mouse")])
        one = {r.doc_id: r.score for r in bm25_topk(df, ["cat"], k=2).collect()}
        both = {r.doc_id: r.score for r in bm25_topk(df, ["cat", "dog"], k=2).collect()}
        assert both[1] > one[1]  # doc 1 gains the dog term
        assert both[2] == one[2]  # doc 2 unchanged

    def test_plan_is_take_ordered(self, spark):
        df = _docs(spark, [(1, "cat dog")])
        plan = bm25_topk(df, ["cat"], k=5)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestTrainQualityClassifier:
    def _labeled(self, spark):
        rows = [(i, "alpha beta gamma shared words", 1.0) for i in range(12)]
        rows += [(100 + i, "delta epsilon zeta shared words", 0.0)
                 for i in range(10)]
        return spark.createDataFrame(rows,
                                     "doc_id long, text string, y double")

    @staticmethod
    def _train_numpy(rows, n_buckets=1024, iterations=3, lr=20.0,
                     fx=10**9):
        """In-memory twin of the distributed trainer — same md5
        bucketing, 6dp sigmoid, fixed-point residuals, half-away
        rounding — asserts the distributed integer sums are EXACT."""
        import hashlib
        import math

        import numpy as np

        def rhalf(x):
            return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

        docs = []
        for did, text, y in rows:
            toks = text.strip().lower().split()
            cnt = {}
            for tok in toks:
                b = int(hashlib.md5(tok.encode()).hexdigest()[:8],
                        16) % n_buckets
                cnt[b] = cnt.get(b, 0) + 1
            docs.append((cnt, len(toks), y))
        n = len(docs)
        wq = np.zeros(n_buckets, dtype=np.int64)
        bias_fx = 0
        for _ in range(iterations):
            g = np.zeros(n_buckets, dtype=np.int64)
            gb = 0
            for cnt, ntok, y in docs:
                s_fx = sum(c * int(wq[b]) for b, c in cnt.items())
                z = bias_fx / fx + s_fx / fx / ntok
                p = round(1.0 / (1.0 + np.exp(-z)), 6)
                rq = rhalf((p - y) / ntok * fx)
                gb += rhalf((p - y) * fx)
                for b, c in cnt.items():
                    g[b] += c * rq
            for b in range(n_buckets):
                wq[b] -= rhalf(lr * int(g[b]) / n)
            bias_fx -= rhalf(lr * gb / n)
        return wq, bias_fx

    def test_exact_match_with_numpy_twin(self, spark):
        from caspr_spark.llm.filtering import train_quality_classifier
        df = self._labeled(spark)
        got = {r.bucket: r.weight_fx
               for r in train_quality_classifier(df, "y").collect()}
        rows = [(r.doc_id, r.text, r.y) for r in df.collect()]
        wq, bias_fx = self._train_numpy(rows)
        assert got[-1] == bias_fx
        for b in range(1024):
            assert got[b] == int(wq[b]), b

    def test_learned_weights_separate_classes(self, spark):
        from caspr_spark.llm.filtering import (quality_score_hashed_bow,
                                               train_quality_classifier)
        df = self._labeled(spark)
        w = {r.bucket: r.weight_fx
             for r in train_quality_classifier(df, "y", iterations=6,
                                               lr=50.0).collect()}
        weights = [w.get(b, 0) / 1e9 for b in range(1024)]
        scored = quality_score_hashed_bow(df, weights=weights,
                                          bias=w[-1] / 1e9) \
            .join(df.select("doc_id", "y"), "doc_id")
        rows = scored.select("y", "quality").collect()
        pos = [r.quality for r in rows if r.y == 1.0]
        neg = [r.quality for r in rows if r.y == 0.0]
        assert min(pos) > max(neg)   # perfectly separable toy corpus

    def test_empty_input_raises(self, spark):
        from caspr_spark.llm.filtering import train_quality_classifier
        df = spark.createDataFrame([], "doc_id long, text string, y double")
        with pytest.raises(ValueError, match="empty"):
            train_quality_classifier(df, "y")


class TestClassifierPlanGuard:
    """broadcast_weights_from: above the threshold the per-epoch weight
    lookup joins a broadcast (bucket, weight) relation instead of
    embedding an n_buckets-literal array — identical integers, bounded
    logical plan at any vocabulary size (r7 verdict item 5)."""

    def _labeled(self, spark):
        rows = [(i, ("good clean prose " * 5) if i % 2 else
                 ("spam spam buy now " * 5), float(i % 2))
                for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, text string, y double")

    def test_join_path_matches_literal_path_exactly(self, spark):
        from caspr_spark.llm.filtering import train_quality_classifier
        df = self._labeled(spark)
        lit = {(r.bucket): r.weight_fx for r in
               train_quality_classifier(df, "y", n_buckets=256,
                                        iterations=3).collect()}
        join = {(r.bucket): r.weight_fx for r in
                train_quality_classifier(df, "y", n_buckets=256,
                                         iterations=3,
                                         broadcast_weights_from=1)
                .collect()}
        assert lit == join     # every fixed-point integer identical

    def test_large_vocab_plan_stays_bounded(self, spark):
        """At 50k buckets the literal array would put 50k * iterations
        expressions into the plan; the join path must both run and keep
        the logit stage's plan independent of n_buckets."""
        from caspr_spark.llm.filtering import train_quality_classifier
        df = self._labeled(spark)
        out = train_quality_classifier(df, "y", n_buckets=50_000,
                                       iterations=1)
        rows = out.collect()
        assert len(rows) == 50_001                  # bias + every bucket
        nonzero = [r for r in rows if r.weight_fx != 0 and r.bucket >= 0]
        assert nonzero                              # it actually trained


class TestBroadcastGuard:
    """Round-10: the decontamination operators' benchmark broadcast is
    size-guarded — an over-limit 'benchmark' degrades to an AQE-planned
    join instead of a forced broadcast (and, at real scale, a driver
    OOM). Results must be identical on both sides of the threshold."""

    def test_helper_hints_under_limit_only(self, spark):
        import io, contextlib
        from pyspark.sql import functions as F
        from caspr_spark.llm.dedup import _maybe_broadcast_gram_set
        gs = spark.range(100).select(
            F.md5(F.col("id").cast("string")).alias("__h"))
        try:
            def joined_plan(limit):
                right = _maybe_broadcast_gram_set(gs, limit)
                big = spark.range(1000).select(
                    F.md5((F.col("id") % 50).cast("string")).alias("__h"))
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    big.join(right, on="__h", how="left_semi") \
                       .explain("formatted")
                return buf.getvalue()

            assert "BroadcastExchange" in joined_plan(limit=1000)
            assert "BroadcastExchange" in joined_plan(limit=None)
            # over the limit: no FORCED broadcast hint; pin by disabling
            # auto-broadcast so the assertion is strategy-deterministic
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                assert "BroadcastExchange" not in joined_plan(limit=10)
            finally:
                spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        finally:
            spark.catalog.clearCache()

    def test_decontaminate_same_result_over_limit(self, spark):
        train = _docs(spark, [(1, "alpha beta gamma delta"),
                              (2, "totally unrelated content here")])
        bench = _docs(spark, [(10, "x alpha beta gamma delta y")])
        try:
            kept = decontaminate(train, bench, n=4,
                                 broadcast_limit=0).select("doc_id").collect()
        finally:
            spark.catalog.clearCache()
        assert [r.doc_id for r in kept] == [2]

    def test_contamination_fraction_same_result_over_limit(self, spark):
        from caspr_spark.llm.dedup import contamination_fraction
        train = _docs(spark, [(1, "a b c d e f g h i j"),
                              (2, "clean text with no overlap at all ok")])
        bench = _docs(spark, [(10, "a b c d e f g h")])
        try:
            forced = {r.doc_id: r.contam_fraction
                      for r in contamination_fraction(
                          train, bench, n=8,
                          broadcast_limit=None).collect()}
            guarded = {r.doc_id: r.contam_fraction
                       for r in contamination_fraction(
                           train, bench, n=8,
                           broadcast_limit=0).collect()}
        finally:
            spark.catalog.clearCache()
        assert forced == guarded
        assert forced[1] > 0 and forced[2] == 0.0
