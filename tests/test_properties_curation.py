"""Property-based tests (hypothesis) for the round-4 curation and
data-engineering operators: paragraph dedup vs a python model,
merge_upsert vs a dict model, global_running_sum vs an exact prefix sum
under arbitrary partitionings, heavy hitters vs exact counts."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from caspr_spark.llm.clean import paragraph_dedup
from caspr_spark.operators.merge import merge_upsert
from caspr_spark.operators.sampling import global_running_sum
from caspr_spark.operators.frequent import heavy_hitters

SETTINGS = dict(max_examples=10, deadline=None, derandomize=True,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

# tiny alphabet so duplicate units actually occur across documents
_UNIT = st.sampled_from(["u1", "u2", "u3", "v"])


class TestParagraphDedupModel:
    @given(docs=st.lists(st.lists(_UNIT, min_size=1, max_size=5),
                         min_size=1, max_size=6))
    @settings(**SETTINGS)
    def test_matches_python_model(self, spark, docs):
        df = spark.createDataFrame(
            [(i, "|".join(units)) for i, units in enumerate(docs)],
            "doc_id long, text string")
        got = {r.doc_id: r.text_dedup
               for r in paragraph_dedup(df, sep="|").collect()}
        seen, want = set(), {}
        for i, units in enumerate(docs):
            kept = []
            for u in units:
                if u not in seen:
                    seen.add(u)
                    kept.append(u)
            if kept:
                want[i] = "|".join(kept)
        assert got == want


class TestMergeUpsertModel:
    @given(base=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 9)),
                         max_size=8, unique_by=lambda t: t[0]),
           upd=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 9),
                                  st.booleans()),
                        max_size=8, unique_by=lambda t: t[0]))
    @settings(**SETTINGS)
    def test_matches_dict_model(self, spark, base, upd):
        bdf = spark.createDataFrame(base or [(99, 0)], "k long, ver long")
        udf_ = spark.createDataFrame(
            [(k, v, d) for k, v, d in upd] or [(98, 0, False)],
            "k long, ver long, deleted boolean")
        base = base or [(99, 0)]
        upd = upd or [(98, 0, False)]
        got = {r.k: r.ver for r in merge_upsert(
            bdf, udf_, keys=["k"], version_cols=["ver"],
            delete_col="deleted").collect()}
        want = {}
        for k, v in base:
            want[k] = (v, 0, False)
        for k, v, d in upd:
            # update wins at equal version (src tiebreak)
            if k not in want or (v, 1) >= (want[k][0], want[k][1]):
                want[k] = (v, 1, d)
        want = {k: v for k, (v, _, d) in want.items() if not d}
        assert got == want


class TestGlobalRunningSumPartitioning:
    @given(vals=st.lists(st.integers(0, 50), min_size=1, max_size=40),
           parts=st.integers(1, 9))
    @settings(**SETTINGS)
    def test_any_partitioning_matches_exact_prefix_sum(self, spark, vals,
                                                       parts):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v long") \
            .repartition(3)  # scrambled input layout
        out = (global_running_sum(df, "v", [F.col("id")],
                                  num_partitions=parts)
               .orderBy("id").collect())
        acc, want = 0, []
        for v in vals:
            acc += v
            want.append(acc)
        assert [r.running_sum for r in out] == want


class TestHeavyHittersModel:
    @given(tokens=st.lists(st.sampled_from("abcde"), min_size=1,
                           max_size=120),
           frac=st.sampled_from([0.1, 0.25, 0.5]))
    @settings(**SETTINGS)
    def test_matches_exact_counts(self, spark, tokens, frac):
        df = spark.createDataFrame([(t,) for t in tokens],
                                   "tok string").repartition(4)
        got = {r.tok: r.cnt for r in heavy_hitters(df, "tok",
                                                   frac).collect()}
        from collections import Counter
        c = Counter(tokens)
        want = {t: n for t, n in c.items() if n > frac * len(tokens)}
        assert got == want


class TestScd2Model:
    @given(obs=st.lists(st.tuples(st.integers(0, 2),     # key
                                  st.integers(1, 8),     # day
                                  st.sampled_from("AB")),  # state
                        min_size=1, max_size=14))
    @settings(**SETTINGS)
    def test_intervals_tile_and_asof_reconstructs(self, spark, obs):
        from caspr_spark.operators.merge import scd2_history
        rows = [(k, f"2024-01-0{d}", s, i)
                for i, (k, d, s) in enumerate(obs)]
        df = spark.createDataFrame(
            rows, "k long, d_s string, status string, id long"
        ).withColumn("d", F.col("d_s").cast("date")).drop("d_s")
        hist = scd2_history(df, ["k"], "d", ["status"],
                            tiebreak=["id"]).collect()
        by_key = {}
        for r in hist:
            by_key.setdefault(r.k, []).append(r)
        for k, ivs in by_key.items():
            ivs.sort(key=lambda r: r.valid_from)
            # intervals tile: each valid_to == next valid_from; exactly
            # one current version per key
            for a, b in zip(ivs, ivs[1:]):
                assert a.valid_to == b.valid_from
            assert [r.is_current for r in ivs].count(True) == 1
            assert ivs[-1].is_current
            # consecutive intervals always change state
            for a, b in zip(ivs, ivs[1:]):
                assert a.status != b.status
        # every interval's key exists in the input and its valid_from
        # is one of that key's observation dates
        in_days = {(k, f"2024-01-0{d}") for k, d, _ in obs}
        for r in hist:
            assert (r.k, str(r.valid_from)) in in_days


class TestNormalizeIdempotent:
    @given(texts=st.lists(st.text(
        alphabet=st.sampled_from(list("ab \t‘“– \x07…")),
        max_size=18), min_size=1, max_size=6))
    @settings(**SETTINGS)
    def test_normalize_twice_equals_once(self, spark, texts):
        from caspr_spark.llm.text import normalize_text
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string")
        once = normalize_text(df, lowercase=True)
        twice = normalize_text(once.select(
            "id", F.col("text_norm").alias("text")), lowercase=True)
        a = {r.id: r.text_norm for r in once.collect()}
        b = {r.id: r.text_norm for r in twice.collect()}
        assert a == b


class TestAttributionModel:
    @given(evs=st.lists(st.tuples(st.integers(0, 2),        # user
                                  st.integers(0, 20),       # minute
                                  st.sampled_from(["view", "click",
                                                   "purchase"])),
                        min_size=1, max_size=16))
    @settings(**SETTINGS)
    def test_matches_bruteforce(self, spark, evs):
        from caspr_spark.operators.timeseries import attribute_conversions
        rows = [(i, u, t, f"2024-01-01 00:{m:02d}:00")
                for i, (u, m, t) in enumerate(evs)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "ts_s string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        got = {r.event_id: r.touch_type for r in attribute_conversions(
            df, tiebreak=["event_id"]).collect()}
        # brute force: sort per user by (minute, event_id); last touch
        # strictly before in that order
        want = {}
        for i, (u, m, t) in enumerate(evs):
            if t != "purchase":
                continue
            prior = [(m2, i2, t2) for i2, (u2, m2, t2) in enumerate(evs)
                     if u2 == u and t2 in ("view", "click")
                     and (m2, i2) < (m, i)]
            want[i] = max(prior)[2] if prior else None
        assert got == want


class TestResampleModel:
    @given(evs=st.lists(st.tuples(st.integers(0, 1),       # user
                                  st.integers(1, 9),       # day
                                  st.integers(0, 50)),     # value
                        min_size=1, max_size=12))
    @settings(**SETTINGS)
    def test_grid_complete_and_sums_exact(self, spark, evs):
        from caspr_spark.operators.timeseries import resample_entities
        rows = [(u, f"2024-01-0{d} 12:00:00", float(v))
                for u, d, v in evs]
        df = spark.createDataFrame(
            rows, "user_id long, ts_s string, value double"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        out = resample_entities(df, value_cols=["value"]).collect()
        got = {(r.user_id, str(r.bucket)[:10]): r.value for r in out}
        by_user_days = {}
        sums = {}
        for u, d, v in evs:
            by_user_days.setdefault(u, []).append(d)
            sums[(u, d)] = sums.get((u, d), 0.0) + v
        want = {}
        for u, days in by_user_days.items():
            for d in range(min(days), max(days) + 1):
                want[(u, f"2024-01-0{d}")] = sums.get((u, d), 0.0)
        assert got == want


def _dup_spans_model(docs: dict, n: int, min_count: int = 2):
    """Python reference for duplicated_spans/trim_duplicated_spans:
    brute-force gram census, interval union, keep-first trimming."""
    grams = {}     # gram -> list[(doc, pos)] in (doc, pos) order
    toks = {d: t.strip().lower().split() for d, t in docs.items()}
    for d in sorted(toks):
        t = toks[d]
        for p in range(len(t) - n + 1):
            grams.setdefault(" ".join(t[p:p + n]), []).append((d, p))
    dup_hits, rm_hits = {}, {}
    for occ in grams.values():
        if len(occ) >= min_count:
            for d, p in occ:
                dup_hits.setdefault(d, []).append(p)
            for d, p in occ[1:]:          # keep-first arbitration
                rm_hits.setdefault(d, []).append(p)

    def covered(pos_list):
        return set(i for p in pos_list for i in range(p, p + n))

    def runs(cov):
        if not cov:
            return 0
        best = cur = 1
        prev = None
        for i in sorted(cov):
            cur = cur + 1 if prev is not None and i == prev + 1 else 1
            best = max(best, cur)
            prev = i
        return best

    meas, trim = {}, {}
    for d, t in toks.items():
        cov = covered(dup_hits.get(d, []))
        meas[d] = {"n_tokens": len(t), "dup_tokens": len(cov),
                   "max_dup_run": runs(cov),
                   "n_dup_grams": len(dup_hits.get(d, []))}
        rm = covered(rm_hits.get(d, []))
        trim[d] = {"n_removed": len(rm),
                   "trimmed_text": " ".join(
                       tok for i, tok in enumerate(t) if i not in rm)}
    return meas, trim


class TestStratifiedSamplerModel:
    """The round-10 prefix-scan rank path must reproduce the stated
    contract exactly: per stratum keep the ``ceil(f·n)`` (or ``cap``)
    rows with the LOWEST ``md5(seed|id)`` — brute-forced in python via
    hashlib, since the ordering hash is engine-portable md5, under
    arbitrary strata skew (one hot stratum) and input partitioning."""

    @given(rows=st.lists(st.tuples(st.integers(0, 40),          # id
                                   st.sampled_from(["en", "en", "en", "fr"])),
                         min_size=1, max_size=30,
                         unique_by=lambda t: t[0]),
           frac=st.sampled_from([0.0, 0.3, 0.5, 1.0]),
           seed=st.integers(0, 3))
    @settings(**SETTINGS)
    def test_exact_sampler_matches_bruteforce(self, spark, rows, frac, seed):
        import hashlib
        import math
        from caspr_spark.operators.sampling import stratified_sample_exact
        df = spark.createDataFrame(rows, "id long, s string").repartition(5)
        got = sorted(r.id for r in stratified_sample_exact(
            df, "s", frac, ["id"], seed=seed).collect())
        want = []
        by_s = {}
        for i, s in rows:
            by_s.setdefault(s, []).append(i)
        for s, ids in by_s.items():
            ids.sort(key=lambda i: hashlib.md5(
                f"{seed}|{i}".encode()).hexdigest())
            want += ids[:math.ceil(frac * len(ids))]
        assert got == sorted(want)

    @given(rows=st.lists(st.tuples(st.integers(0, 40),
                                   st.sampled_from(["en", "en", "en", "fr"])),
                         min_size=1, max_size=30,
                         unique_by=lambda t: t[0]),
           cap=st.integers(0, 8),
           seed=st.integers(0, 3))
    @settings(**SETTINGS)
    def test_cap_downsampler_matches_bruteforce(self, spark, rows, cap, seed):
        import hashlib
        from caspr_spark.operators.sampling import downsample_to_cap
        df = spark.createDataFrame(rows, "id long, s string").repartition(5)
        got = sorted(r.id for r in downsample_to_cap(
            df, "s", cap, ["id"], seed=seed).collect())
        want = []
        by_s = {}
        for i, s in rows:
            by_s.setdefault(s, []).append(i)
        for s, ids in by_s.items():
            ids.sort(key=lambda i: hashlib.md5(
                f"{seed}|{i}".encode()).hexdigest())
            want += ids[:cap]
        assert got == sorted(want)


class TestGramTableEquivalence:
    """The shared featurization (dedup.gram_table) must be
    indistinguishable from the direct text path for EVERY consumer, on
    arbitrary corpora — including docs shorter than the gram width
    (empty __hs arrays) and hot duplicate grams."""

    @given(docs=st.lists(st.lists(_UNIT, min_size=1, max_size=8),
                         min_size=1, max_size=6),
           n=st.integers(2, 3))
    @settings(**SETTINGS)
    def test_span_ops_equal_direct_path(self, spark, docs, n):
        from caspr_spark.llm.dedup import (duplicated_spans, gram_table,
                                           trim_duplicated_spans)
        df = spark.createDataFrame(
            [(i, " ".join(u)) for i, u in enumerate(docs)],
            "doc_id long, text string")
        gt = gram_table(df, n=n)
        for op in (duplicated_spans, trim_duplicated_spans):
            direct = sorted(map(tuple, op(df, n=n).collect()))
            via_gt = sorted(map(tuple, op(gt, n=n).collect()))
            assert direct == via_gt, op.__name__

    @given(train=st.lists(st.lists(_UNIT, min_size=1, max_size=8),
                          min_size=1, max_size=4),
           bench=st.lists(st.lists(_UNIT, min_size=1, max_size=6),
                          min_size=1, max_size=3),
           n=st.integers(2, 3))
    @settings(**SETTINGS)
    def test_decontaminate_equal_direct_path(self, spark, train, bench, n):
        from caspr_spark.llm.dedup import contamination_fraction, gram_table
        from caspr_spark.llm.filtering import decontaminate
        tdf = spark.createDataFrame(
            [(i, " ".join(u)) for i, u in enumerate(train)],
            "doc_id long, text string")
        bdf = spark.createDataFrame(
            [(i, " ".join(u)) for i, u in enumerate(bench)],
            "doc_id long, text string")
        tgt, bgt = gram_table(tdf, n=n), gram_table(bdf, n=n)
        kept_direct = sorted(
            r.doc_id for r in decontaminate(tdf, bdf, n=n).collect())
        kept_gt = sorted(
            r.doc_id for r in decontaminate(tgt, bgt, n=n).collect())
        assert kept_direct == kept_gt
        frac_direct = sorted(map(tuple,
                             contamination_fraction(tdf, bdf, n=n).collect()))
        frac_gt = sorted(map(tuple,
                         contamination_fraction(tgt, bgt, n=n).collect()))
        assert frac_direct == frac_gt


class TestIncrementalCensusInvariant:
    """duplicated_spans_incremental(batch, census(history)) must equal
    the full-corpus census over history ∪ batch restricted to the batch
    docs, for arbitrary random corpora and splits — including empty
    history, within-batch-only duplication, and sub-width docs."""

    @given(docs=st.lists(st.lists(_UNIT, min_size=1, max_size=8),
                         min_size=1, max_size=7),
           n_hist=st.integers(0, 3),
           n=st.integers(2, 3))
    @settings(**SETTINGS)
    def test_matches_full_corpus(self, spark, docs, n_hist, n):
        from caspr_spark.llm.dedup import (build_gram_census,
                                           duplicated_spans,
                                           duplicated_spans_incremental)
        rows = [(i, " ".join(u)) for i, u in enumerate(docs)]
        n_hist = min(n_hist, len(rows) - 1)    # batch: non-empty tail,
        hist_rows = rows[:n_hist]              # ids disjoint from history
        hist = spark.createDataFrame(hist_rows or [(99, "")],
                                     "doc_id long, text string")
        if not hist_rows:
            hist = hist.limit(0)
        batch = spark.createDataFrame(rows[n_hist:],
                                      "doc_id long, text string")
        census = build_gram_census(hist, n=n)
        inc = sorted(map(tuple, duplicated_spans_incremental(
            batch, census, n=n, min_count=2).collect()))
        full = sorted(map(tuple, duplicated_spans(
            hist.unionByName(batch), n=n, min_count=2)
            .join(batch.select("doc_id"), "doc_id", "left_semi")
            .collect()))
        assert inc == full

    @given(docs=st.lists(st.lists(_UNIT, min_size=1, max_size=8),
                         min_size=1, max_size=7),
           n_hist=st.integers(0, 3),
           n=st.integers(2, 3))
    @settings(**SETTINGS)
    def test_trim_matches_full_corpus(self, spark, docs, n_hist, n):
        from caspr_spark.llm.dedup import (build_gram_census,
                                           trim_duplicated_spans,
                                           trim_duplicated_spans_incremental)
        rows = [(i, " ".join(u)) for i, u in enumerate(docs)]
        n_hist = min(n_hist, len(rows) - 1)
        hist_rows = rows[:n_hist]
        hist = spark.createDataFrame(hist_rows or [(99, "")],
                                     "doc_id long, text string")
        if not hist_rows:
            hist = hist.limit(0)
        batch = spark.createDataFrame(rows[n_hist:],
                                      "doc_id long, text string")
        census = build_gram_census(hist, n=n, track_first=True)
        inc = sorted(map(tuple, trim_duplicated_spans_incremental(
            batch, census, n=n, min_count=2).collect()))
        full = sorted(map(tuple, trim_duplicated_spans(
            hist.unionByName(batch), n=n, min_count=2)
            .join(batch.select("doc_id"), "doc_id", "left_semi")
            .collect()))
        assert inc == full


class TestDuplicatedSpansModel:
    @given(docs=st.lists(st.lists(_UNIT, min_size=1, max_size=8),
                         min_size=1, max_size=6),
           n=st.integers(2, 3))
    @settings(**SETTINGS)
    def test_census_matches_python_model(self, spark, docs, n):
        from caspr_spark.llm.dedup import duplicated_spans
        corpus = {i: " ".join(u) for i, u in enumerate(docs)}
        df = spark.createDataFrame(list(corpus.items()),
                                   "doc_id long, text string")
        want, _ = _dup_spans_model(corpus, n)
        got = {r["doc_id"]: r.asDict()
               for r in duplicated_spans(df, n=n).collect()}
        assert set(got) == set(want)
        for d, w in want.items():
            for k in ("n_tokens", "dup_tokens", "max_dup_run",
                      "n_dup_grams"):
                assert got[d][k] == w[k], (d, k, got[d], w)

    @given(docs=st.lists(st.lists(_UNIT, min_size=1, max_size=8),
                         min_size=1, max_size=6),
           n=st.integers(2, 3))
    @settings(**SETTINGS)
    def test_trim_matches_python_model(self, spark, docs, n):
        from caspr_spark.llm.dedup import trim_duplicated_spans
        corpus = {i: " ".join(u) for i, u in enumerate(docs)}
        df = spark.createDataFrame(list(corpus.items()),
                                   "doc_id long, text string")
        _, want = _dup_spans_model(corpus, n)
        got = {r["doc_id"]: r.asDict()
               for r in trim_duplicated_spans(df, n=n).collect()}
        assert set(got) == set(want)
        for d, w in want.items():
            assert got[d]["n_removed"] == w["n_removed"], (d, got[d], w)
            assert got[d]["trimmed_text"] == w["trimmed_text"], (d, got, w)
