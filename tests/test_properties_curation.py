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
