"""Unit tests for the round-4 curation operators: structural cleaning
(clean.py), hashed-BoW quality scoring, budget selection (sampling.py),
upsert compaction (merge.py), RRF fusion, keep-best dedup."""

import math

import pytest
from pyspark.sql import functions as F

from caspr_spark.llm.clean import (
    split_units, paragraph_dedup, remove_boilerplate,
)
from caspr_spark.llm.filtering import quality_score_hashed_bow
from caspr_spark.llm.dedup import dedup_keep_best
from caspr_spark.llm.search import rrf_fuse
from caspr_spark.operators.merge import merge_upsert
from caspr_spark.operators.sampling import (
    global_running_sum, select_to_token_budget,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSplitUnits:
    def test_positions_and_filter(self, spark):
        df = _docs(spark, [(1, "aa|bb||cc")])
        u = {(r.pos, r.unit)
             for r in split_units(df, sep="|").collect()}
        # the empty unit between || is dropped, positions keep gaps
        assert u == {(0, "aa"), (1, "bb"), (3, "cc")}

    def test_regex_metachars_escaped(self, spark):
        df = _docs(spark, [(1, "a.b")])
        u = [r.unit for r in split_units(df, sep=".").collect()]
        assert sorted(u) == ["a", "b"]  # literal dot, not regex any-char


class TestParagraphDedup:
    def test_first_occurrence_wins(self, spark):
        df = _docs(spark, [(1, "x|y"), (2, "y|z"), (3, "x|z")])
        out = {r.doc_id: r.text_dedup
               for r in paragraph_dedup(df, sep="|").collect()}
        # doc1 keeps both; doc2 keeps z (y seen in doc1); doc3 empties out
        assert out == {1: "x|y", 2: "z"}

    def test_order_preserved_within_doc(self, spark):
        df = _docs(spark, [(1, "c|a|b")])
        out = paragraph_dedup(df, sep="|").collect()[0]
        assert out.text_dedup == "c|a|b"

    def test_intra_doc_repeat_collapses(self, spark):
        df = _docs(spark, [(1, "x|x|y")])
        out = paragraph_dedup(df, sep="|").collect()[0]
        assert out.text_dedup == "x|y"


class TestRemoveBoilerplate:
    def test_frequent_unit_dropped_row_count_stable(self, spark):
        df = _docs(spark, [(1, "nav|body1"), (2, "nav|body2"),
                           (3, "nav|body3"), (4, "nav")])
        out = {r.doc_id: (r.text_clean, r.n_kept)
               for r in remove_boilerplate(df, sep="|",
                                           min_docs=3).collect()}
        assert out == {1: ("body1", 1), 2: ("body2", 1),
                       3: ("body3", 1), 4: ("", 0)}

    def test_below_threshold_kept(self, spark):
        df = _docs(spark, [(1, "nav|a"), (2, "nav|b")])
        out = {r.doc_id: r.text_clean
               for r in remove_boilerplate(df, sep="|",
                                           min_docs=3).collect()}
        assert out == {1: "nav|a", 2: "nav|b"}


class TestQualityHashedBow:
    def test_placeholder_matches_manual(self, spark):
        import hashlib
        df = _docs(spark, [(1, "Hello world")])
        r = quality_score_hashed_bow(df, n_buckets=64).collect()[0]
        assert r.n_tokens == 2

        def w(tok):
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64
            return b / 64 - 0.5
        mean = (w("hello") + w("world")) / 2
        assert r.quality == pytest.approx(1 / (1 + math.exp(-mean)))

    def test_trained_weights_path(self, spark):
        df = _docs(spark, [(1, "a b")])
        weights = [1.0] * 16
        r = quality_score_hashed_bow(df, n_buckets=16, weights=weights,
                                     bias=-1.0).collect()[0]
        # every bucket weighs 1.0 -> mean 1.0, bias -1 -> sigmoid(0)=0.5
        assert r.quality == pytest.approx(0.5)

    def test_weight_length_mismatch_raises(self, spark):
        df = _docs(spark, [(1, "a")])
        with pytest.raises(ValueError, match="weights"):
            quality_score_hashed_bow(df, n_buckets=16, weights=[1.0])


class TestGlobalRunningSum:
    def test_matches_pandas_cumsum(self, spark):
        rows = [(i, (i * 37) % 11 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, v long")
        out = (global_running_sum(df, "v", [F.col("id")], num_partitions=7)
               .orderBy("id").toPandas())
        assert list(out.running_sum) == list(out.v.cumsum())

    def test_desc_order(self, spark):
        df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                                   "id long, v long")
        out = {r.id: r.running_sum for r in global_running_sum(
            df, "v", [F.col("id").desc()], num_partitions=2).collect()}
        assert out == {3: 30, 2: 50, 1: 60}

    def test_budget_selection_boundary(self, spark):
        df = spark.createDataFrame([(1, 5), (2, 5), (3, 5)],
                                   "id long, tok long")
        kept = sorted(r.id for r in select_to_token_budget(
            df, budget=10, token_col="tok",
            order_by=[F.col("id")]).collect())
        assert kept == [1, 2]  # third row would exceed the budget

    def test_negative_budget_raises(self, spark):
        df = spark.createDataFrame([(1, 5)], "id long, tok long")
        with pytest.raises(ValueError, match="budget"):
            select_to_token_budget(df, budget=-1, token_col="tok",
                                   order_by=["id"])


class TestMergeUpsert:
    def _frames(self, spark):
        base = spark.createDataFrame(
            [(1, 1, "old1"), (2, 1, "old2"), (3, 1, "old3")],
            "k long, ver long, val string")
        upd = spark.createDataFrame(
            [(1, 2, "new1", False),   # newer version wins
             (2, 1, "tie2", False),   # same version: update wins
             (3, 2, "gone", True),    # tombstone deletes the key
             (4, 1, "ins4", False)],  # brand-new key inserts
            "k long, ver long, val string, deleted boolean")
        return base, upd

    def test_upsert_semantics(self, spark):
        base, upd = self._frames(spark)
        out = {r.k: r.val for r in merge_upsert(
            base, upd, keys=["k"], version_cols=["ver"],
            delete_col="deleted").collect()}
        assert out == {1: "new1", 2: "tie2", 4: "ins4"}

    def test_no_delete_col(self, spark):
        base, upd = self._frames(spark)
        out = {r.k: r.val for r in merge_upsert(
            base, upd.drop("deleted"), keys=["k"],
            version_cols=["ver"]).collect()}
        assert out == {1: "new1", 2: "tie2", 3: "gone", 4: "ins4"}

    def test_stale_update_loses(self, spark):
        base = spark.createDataFrame([(1, 5, "cur")],
                                     "k long, ver long, val string")
        upd = spark.createDataFrame([(1, 3, "stale")],
                                    "k long, ver long, val string")
        out = merge_upsert(base, upd, keys=["k"],
                           version_cols=["ver"]).collect()
        assert out[0].val == "cur"

    def test_validation(self, spark):
        base, upd = self._frames(spark)
        with pytest.raises(ValueError, match="key"):
            merge_upsert(base, upd, keys=[], version_cols=["ver"])
        with pytest.raises(ValueError, match="version"):
            merge_upsert(base, upd, keys=["k"], version_cols=[])
        with pytest.raises(ValueError, match="delete_col"):
            merge_upsert(base, upd.drop("deleted"), keys=["k"],
                         version_cols=["ver"], delete_col="deleted")


class TestRrfFuse:
    def test_formula(self, spark):
        a = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank int")
        b = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank int")
        out = {r.doc_id: (r.rrf_score, r.n_lists, r.rank)
               for r in rrf_fuse([a, b], k0=60).collect()}
        assert out[20][0] == pytest.approx(
            round(1 / 61 + 1 / 62, 9))
        assert out[20][1] == 2 and out[20][2] == 1
        assert out[10][1] == 1
        # doc 10 (rank 1 in list a) beats doc 30 (rank 2 in list b)
        assert out[10][2] == 2 and out[30][2] == 3

    def test_topk_and_validation(self, spark):
        a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                                  "doc_id long, rank int")
        assert rrf_fuse([a], topk=2).count() == 2
        with pytest.raises(ValueError, match="ranking"):
            rrf_fuse([])


class TestDedupKeepBest:
    def test_best_member_survives(self, spark):
        docs = spark.createDataFrame(
            [(1, 10), (2, 99), (3, 50), (4, 7)], "doc_id long, q long")
        # component {1,2,3} via chain 1-2, 2-3; doc 4 untouched
        pairs = spark.createDataFrame([(1, 2), (2, 3)],
                                      "id_a long, id_b long")
        kept = sorted(r.doc_id for r in dedup_keep_best(
            docs, pairs, quality_col="q").collect())
        assert kept == [2, 4]

    def test_tie_breaks_to_lowest_id(self, spark):
        docs = spark.createDataFrame([(5, 1), (6, 1)], "doc_id long, q long")
        pairs = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
        kept = [r.doc_id for r in dedup_keep_best(
            docs, pairs, quality_col="q").collect()]
        assert kept == [5]

    def test_nan_quality_raises(self, spark):
        # -NaN still sorts largest in the ascending election struct, so
        # without the guard a NaN-scored doc would silently WIN; the
        # in-plan tripwire raises at execution instead (r11 verdict
        # wrong-list item 3)
        docs = spark.createDataFrame(
            [(1, 1.0), (2, float("nan")), (3, 2.0)],
            "doc_id long, q double")
        pairs = spark.createDataFrame([(1, 2), (2, 3)],
                                      "id_a long, id_b long")
        with pytest.raises(Exception, match="NaN in quality column"):
            dedup_keep_best(docs, pairs, quality_col="q").collect()

    def test_float_quality_without_nan_unchanged(self, spark):
        # the guard is a no-op expression for NaN-free floats — same
        # winners as the long-typed election
        docs = spark.createDataFrame(
            [(1, 10.0), (2, 99.0), (3, 50.0), (4, 7.0)],
            "doc_id long, q double")
        pairs = spark.createDataFrame([(1, 2), (2, 3)],
                                      "id_a long, id_b long")
        kept = sorted(r.doc_id for r in dedup_keep_best(
            docs, pairs, quality_col="q").collect())
        assert kept == [2, 4]


class TestHeavyHitters:
    def _tokens(self, spark, n_parts=8):
        # 'hot' appears 120x, 'warm' 40x, tail words once each (total 560)
        rows = ([("hot",)] * 120 + [("warm",)] * 40
                + [(f"tail{i}",) for i in range(400)])
        return spark.createDataFrame(rows, "token string") \
                    .repartition(n_parts)

    def test_exact_vs_groupby(self, spark):
        from caspr_spark.operators.frequent import heavy_hitters
        toks = self._tokens(spark)
        got = {r.token: r.cnt
               for r in heavy_hitters(toks, "token", 0.05).collect()}
        n = toks.count()
        want = {r.token: r["count"] for r in
                toks.groupBy("token").count()
                    .filter(F.col("count") > 0.05 * n).collect()}
        assert got == want == {"hot": 120, "warm": 40}

    def test_partitioning_independent(self, spark):
        from caspr_spark.operators.frequent import heavy_hitters
        for p in (1, 3, 16):
            got = {r.token: r.cnt for r in heavy_hitters(
                self._tokens(spark, p), "token", 0.1).collect()}
            assert got == {"hot": 120}

    def test_validation(self, spark):
        from caspr_spark.operators.frequent import heavy_hitters
        toks = self._tokens(spark)
        with pytest.raises(ValueError, match="threshold_frac"):
            heavy_hitters(toks, "token", 1.5)
        with pytest.raises(ValueError, match="width"):
            heavy_hitters(toks, "token", 0.1, width=5)  # < 1/0.1


class TestFuzzyJoin:
    def test_typo_matches_within_block(self, spark):
        from caspr_spark.operators.joins import fuzzy_join
        left = spark.createDataFrame([(1, "jonathan smith")],
                                     "lid long, lname string")
        right = spark.createDataFrame(
            [(10, "jonathan smyth"),   # distance 1, same prefix
             (11, "jonathan smith jr"),  # distance 3 > max
             (12, "bonathan smith")],  # distance 1, DIFFERENT block
            "rid long, rname string")
        got = [(r.lid, r.rid, r.edit_distance) for r in fuzzy_join(
            left, right, "lname", "rname", max_distance=2,
            block_len=3).collect()]
        # the cross-block typo is missed by design (documented recall
        # contract); the over-distance candidate is scrubbed
        assert got == [(1, 10, 1)]

    def test_exact_match_distance_zero(self, spark):
        from caspr_spark.operators.joins import fuzzy_join
        left = spark.createDataFrame([(1, "acme corp")],
                                     "lid long, lname string")
        got = fuzzy_join(left, left.select(
            F.col("lid").alias("rid"), F.col("lname").alias("rname")),
            "lname", "rname").collect()
        assert got[0].edit_distance == 0

    def test_validation(self, spark):
        from caspr_spark.operators.joins import fuzzy_join
        df = spark.createDataFrame([(1, "x")], "i long, s string")
        with pytest.raises(ValueError, match="max_distance"):
            fuzzy_join(df, df, "s", "s2", max_distance=-1)
        with pytest.raises(ValueError, match="both"):
            fuzzy_join(df, df, "s", "s")


class TestZorder:
    def test_corner_values(self, spark):
        from caspr_spark.operators.layout import zorder_value
        df = spark.createDataFrame([(0, 0.0), (3, 3.0), (0, 3.0)],
                                   "x long, y double")
        got = {(r.x, r.y): r.zvalue for r in
               zorder_value(df, ["x", "y"], bits=2).collect()}
        # quantized to [0,3]: (0,0)->0; (3,3)->interleave(11,11)=1111b=15;
        # (0,3)->y bits at odd positions: 1010b=10
        assert got == {(0, 0.0): 0, (3, 3.0): 15, (0, 3.0): 10}

    def test_locality_of_range_partitioning(self, spark):
        """Z-ordered ranges are tight in BOTH dims; a 1-D sort is not."""
        from caspr_spark.operators.layout import zorder_repartition
        rows = [(i, float(j)) for i in range(32) for j in range(32)]
        df = spark.createDataFrame(rows, "x long, y double")
        parts = (zorder_repartition(df, ["x", "y"], 4, bits=5)
                 .withColumn("pid", F.spark_partition_id())
                 .groupBy("pid")
                 .agg((F.max("x") - F.min("x")).alias("rx"),
                      (F.max("y") - F.min("y")).alias("ry"))
                 .collect())
        # 4 z-range quarters of a 32x32 grid are 16x32 strips at worst
        # (never full-extent in both dims); a lexicographic sort would
        # give ry = 31 in every partition
        assert all(r.rx + r.ry < 62 for r in parts)

    def test_null_and_constant_columns(self, spark):
        from caspr_spark.operators.layout import zorder_value
        df = spark.createDataFrame([(None, 1.0, 5), (2, 2.0, 5)],
                                   "x long, y double, c long")
        out = zorder_value(df, ["x", "y", "c"], bits=4).collect()
        assert all(r.zvalue is not None for r in out)

    def test_validation(self, spark):
        from caspr_spark.operators.layout import zorder_value
        df = spark.createDataFrame([(1, 2)], "x long, y long")
        with pytest.raises(ValueError, match="63-bit"):
            zorder_value(df, ["x", "y"], bits=32)
        with pytest.raises(ValueError, match="2 columns"):
            zorder_value(df, ["x"])


class TestWeightedSample:
    def _docs(self, spark, n=100):
        return spark.createDataFrame(
            [(i, float((i % 7) + 1)) for i in range(n)],
            "id long, w double")

    def test_partitioning_independent(self, spark):
        from caspr_spark.operators.sampling import weighted_sample_topk
        a = sorted(r.id for r in weighted_sample_topk(
            self._docs(spark), 20, "w", ["id"]).collect())
        b = sorted(r.id for r in weighted_sample_topk(
            self._docs(spark).repartition(13), 20, "w", ["id"]).collect())
        assert a == b and len(a) == 20

    def test_seed_changes_sample(self, spark):
        from caspr_spark.operators.sampling import weighted_sample_topk
        a = sorted(r.id for r in weighted_sample_topk(
            self._docs(spark), 20, "w", ["id"], seed=1).collect())
        b = sorted(r.id for r in weighted_sample_topk(
            self._docs(spark), 20, "w", ["id"], seed=2).collect())
        assert a != b

    def test_nonpositive_weights_excluded(self, spark):
        from caspr_spark.operators.sampling import weighted_sample_topk
        df = spark.createDataFrame(
            [(1, 1.0), (2, 0.0), (3, -4.0), (4, None)],
            "id long, w double")
        got = [r.id for r in weighted_sample_topk(df, 10, "w",
                                                  ["id"]).collect()]
        assert got == [1]

    def test_weight_bias(self, spark):
        """An item with overwhelming weight is (essentially) always in."""
        from caspr_spark.operators.sampling import weighted_sample_topk
        df = spark.createDataFrame(
            [(0, 1e12)] + [(i, 1.0) for i in range(1, 50)],
            "id long, w double")
        got = {r.id for r in weighted_sample_topk(df, 5, "w",
                                                  ["id"]).collect()}
        assert 0 in got

    def test_validation(self, spark):
        from caspr_spark.operators.sampling import weighted_sample_topk
        with pytest.raises(ValueError, match="k"):
            weighted_sample_topk(self._docs(spark), 0, "w", ["id"])


class TestAssignFolds:
    def test_deterministic_and_bounded(self, spark):
        from caspr_spark.operators.sampling import assign_folds
        df = spark.createDataFrame([(i,) for i in range(500)], "id long")
        a = {r.id: r.fold for r in assign_folds(df, ["id"], 5).collect()}
        b = {r.id: r.fold for r in assign_folds(
            df.repartition(7), ["id"], 5).collect()}
        assert a == b
        assert set(a.values()) == {0, 1, 2, 3, 4}
        # roughly even: each fold within 3 sigma of 100
        from collections import Counter
        counts = Counter(a.values())
        assert all(60 <= c <= 140 for c in counts.values())

    def test_validation(self, spark):
        from caspr_spark.operators.sampling import assign_folds
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="k"):
            assign_folds(df, ["id"], 1)


class TestCsvJsonSources:
    def test_csv_roundtrip(self, spark, tmp_path):
        from caspr_spark.sources import write_table, read_table
        df = spark.createDataFrame(
            [(1, "a,b", 1.5), (2, 'quo"te', -0.25), (3, None, None)],
            "id long, s string, v double")
        p = str(tmp_path / "t_csv")
        write_table(df, p, format="csv")
        back = read_table(spark, p, format="csv", schema=df.schema)
        assert sorted(back.collect()) == sorted(df.collect())

    def test_json_roundtrip(self, spark, tmp_path):
        from caspr_spark.sources import write_table, read_table
        df = spark.createDataFrame(
            [(1, "x", 2.5), (2, "y", None)], "id long, s string, v double")
        p = str(tmp_path / "t_json")
        write_table(df, p, format="json", compression="gzip")
        back = read_table(spark, p, format="json", schema=df.schema)
        assert sorted(back.collect()) == sorted(df.collect())

    def test_format_validation(self, spark, tmp_path):
        from caspr_spark.sources import write_table, read_table
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="format"):
            write_table(df, str(tmp_path / "x"), format="orc")
        with pytest.raises(ValueError, match="format"):
            read_table(spark, str(tmp_path / "x"), format="avro")


class TestCurateV2:
    def test_composition_semantics(self, spark):
        from caspr_spark.llm.curate import curate_corpus_v2
        # docs 1-3 share the 'nav' boilerplate unit; doc 4 is ONLY
        # boilerplate and must vanish; doc 5's 'body1' dedups into doc 1
        df = _docs(spark, [(1, "nav|body1 x"), (2, "nav|body2 y z"),
                           (3, "nav|body3"), (4, "nav"),
                           (5, "body1 x|extra w")])
        out = {r.doc_id: (r.n_tokens, r.cum_tokens) for r in
               curate_corpus_v2(df, sep="|", min_docs=3,
                                budget=100).collect()}
        assert 4 not in out            # emptied by the boilerplate scrub
        assert out[5][0] == 2          # 'body1 x' deduped away, 'extra w' stays
        assert out[1][0] == 2          # doc 1 keeps its first occurrence
        # cumulative totals equal the sum of selected doc tokens
        assert max(c for _, c in out.values()) == \
            sum(n for n, _ in out.values())

    def test_budget_cuts(self, spark):
        from caspr_spark.llm.curate import curate_corpus_v2
        df = _docs(spark, [(i, f"w{i}a w{i}b w{i}c") for i in range(20)])
        out = curate_corpus_v2(df, sep="|", min_docs=99,
                               budget=9).collect()
        assert len(out) == 3 and all(r.cum_tokens <= 9 for r in out)


class TestDiffSnapshots:
    def _snaps(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
             (4, None, 40.0)],
            "k long, s string, v double")
        new = spark.createDataFrame(
            [(1, "a", 10.0),     # unchanged -> absent from the diff
             (2, "B", 20.0),     # updated (string change)
             (4, "d", 40.0),     # updated (null -> value)
             (5, "e", 50.0)],    # inserted; key 3 deleted
            "k long, s string, v double")
        return old, new

    def test_change_types(self, spark):
        from caspr_spark.operators.merge import diff_snapshots
        old, new = self._snaps(spark)
        got = {r.k: r.change_type for r in diff_snapshots(
            old, new, keys=["k"]).collect()}
        assert got == {2: "updated", 3: "deleted", 4: "updated",
                       5: "inserted"}

    def test_compare_cols_subset(self, spark):
        from caspr_spark.operators.merge import diff_snapshots
        old, new = self._snaps(spark)
        got = {r.k: r.change_type for r in diff_snapshots(
            old, new, keys=["k"], compare_cols=["v"]).collect()}
        # v never changes: only membership diffs remain
        assert got == {3: "deleted", 5: "inserted"}

    def test_validation(self, spark):
        from caspr_spark.operators.merge import diff_snapshots
        old, new = self._snaps(spark)
        with pytest.raises(ValueError, match="key"):
            diff_snapshots(old, new, keys=[])
        with pytest.raises(ValueError, match="compare_cols"):
            diff_snapshots(old, new, keys=["k"], compare_cols=["nope"])


class TestProfileTable:
    def test_metrics(self, spark):
        from caspr_spark.operators.profile import profile_table
        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, None), (4, "y")],
            "id long, s string")
        got = {(r.column, r.metric): r.value
               for r in profile_table(df).collect()}
        assert got[("s", "n_nulls")] == "1"
        assert got[("s", "n_distinct")] == "2"
        assert got[("s", "top_value")] == "x"
        assert got[("s", "top_count")] == "2"
        assert got[("id", "min")] == "1" and got[("id", "max")] == "4"
        assert got[("id", "n_nulls")] == "0"

    def test_modal_tiebreak_smallest_string(self, spark):
        from caspr_spark.operators.profile import profile_table
        df = spark.createDataFrame([("b",), ("a",)], "s string")
        got = {(r.column, r.metric): r.value
               for r in profile_table(df).collect()}
        assert got[("s", "top_value")] == "a"

    def test_validation_and_no_modal(self, spark):
        from caspr_spark.operators.profile import profile_table
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="columns"):
            profile_table(df, ["ghost"])
        out = profile_table(df, include_modal=False)
        assert {r.metric for r in out.collect()} == \
            {"n_nulls", "n_distinct", "min", "max"}


class TestQuantizeEmbeddings:
    def test_roundtrip_fidelity(self, spark, embeddings):
        from caspr_spark.llm.similarity import (
            quantize_embeddings, dequantize_embeddings)
        q = quantize_embeddings(embeddings)
        back = dequantize_embeddings(q.drop("embedding"), out_col="emb2")
        err = (back.join(embeddings, "vec_id")
               .select(F.aggregate(
                   F.zip_with("embedding", "emb2",
                              lambda a, b: F.abs(a - b)),
                   F.lit(0.0), lambda acc, x: F.greatest(acc, x))
                   .alias("maxerr"))
               .agg(F.max("maxerr")).first()[0])
        # absmax SQ8: error bound is scale/2 = absmax/254 per component
        mx = embeddings.select(F.max(F.array_max(F.transform(
            "embedding", lambda x: F.abs(x))))).first()[0]
        assert err <= mx / 254 + 1e-9

    def test_codes_bounded_and_zero_vector(self, spark):
        from caspr_spark.llm.similarity import quantize_embeddings
        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, -2.0])],
            "vec_id long, embedding array<double>")
        got = {r.vec_id: (r.scale, list(r.qvec))
               for r in quantize_embeddings(df).collect()}
        assert got[1] == (0.0, [0, 0])
        s, qv = got[2]
        assert s == pytest.approx(2.0 / 127)
        assert qv == [64, -127] or qv == [63, -127]  # 1.0/s = 63.5 rounds


class TestCovarianceMatrix:
    def test_matches_numpy(self, spark):
        import numpy as np
        from caspr_spark.operators.profile import covariance_matrix
        rng = np.random.default_rng(7)
        x = rng.normal(size=300)
        y = 2 * x + rng.normal(size=300)
        z = rng.normal(size=300)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
            "x double, y double, z double")
        got = {(r.col_a, r.col_b): (r.cov, r.corr)
               for r in covariance_matrix(df, ["x", "y", "z"]).collect()}
        c = np.cov(np.vstack([x, y, z]), ddof=0)
        r = np.corrcoef(np.vstack([x, y, z]))
        for i, a in enumerate("xyz"):
            for j, b in enumerate("xyz"):
                if i <= j:
                    assert got[(a, b)][0] == pytest.approx(c[i, j])
                    assert got[(a, b)][1] == pytest.approx(r[i, j])

    def test_nulls_dropped_listwise(self, spark):
        from caspr_spark.operators.profile import covariance_matrix
        df = spark.createDataFrame(
            [(1.0, 2.0), (2.0, 4.0), (None, 100.0), (3.0, 6.0)],
            "x double, y double")
        got = {(r.col_a, r.col_b): r.corr
               for r in covariance_matrix(df, ["x", "y"]).collect()}
        assert got[("x", "y")] == pytest.approx(1.0)

    def test_validation(self, spark):
        from caspr_spark.operators.profile import covariance_matrix
        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError, match="2 columns"):
            covariance_matrix(df, ["x"])
        df2 = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
        with pytest.raises(ValueError, match="ddof"):
            covariance_matrix(df2, ["x", "y"], ddof=2)


class TestMergeRollupDelta:
    def test_merge_equals_full(self, spark, events):
        from caspr_spark.operators.timeseries import (
            hourly_aggregate, merge_rollup_delta)
        cut = "2024-01-15"
        base = hourly_aggregate(events.filter(F.col("ts") < cut),
                                "ts", ["event_type"], "value")
        delta = hourly_aggregate(events.filter(F.col("ts") >= cut),
                                 "ts", ["event_type"], "value")
        merged = (merge_rollup_delta(base, delta, ["event_type"])
                  .orderBy("bucket_hour", "event_type").collect())
        full = (hourly_aggregate(events, "ts", ["event_type"], "value")
                .orderBy("bucket_hour", "event_type").collect())
        assert merged == full  # decimal sums: bit-exact, not approx

    def test_empty_delta_is_identity(self, spark, events):
        from caspr_spark.operators.timeseries import (
            hourly_aggregate, merge_rollup_delta)
        base = hourly_aggregate(events, "ts", ["event_type"], "value")
        empty = base.filter(F.lit(False))
        merged = (merge_rollup_delta(base, empty, ["event_type"])
                  .orderBy("bucket_hour", "event_type").collect())
        assert merged == base.orderBy("bucket_hour", "event_type").collect()


class TestRobustOutliers:
    def test_resists_contamination(self, spark):
        from caspr_spark.operators.filters import (
            remove_outliers, remove_outliers_robust)
        # 70 inliers around 0, 30 points at 1e6: 30% contamination
        # inflates mean and σ enough that the classic ±3σ rule keeps the
        # junk (|1e6 - mean| < 3σ); the 50%-breakdown MAD rule doesn't
        rows = [(i, float(i % 7) - 3.0) for i in range(70)] + \
               [(100 + i, 1e6 + i) for i in range(30)]
        df = spark.createDataFrame(rows, "id long, v double")
        robust = {r.id for r in remove_outliers_robust(
            df, ["v"], k=3.5).collect()}
        assert all(i < 70 for i in robust) and len(robust) == 70
        classic = {r.id for r in remove_outliers(df, ["v"], k=3.0).collect()}
        assert any(i >= 100 for i in classic)  # σ blown up -> keeps junk

    def test_approx_path_close_to_exact(self, spark, events):
        from caspr_spark.operators.filters import remove_outliers_robust
        exact = remove_outliers_robust(events, ["value"], k=3.5).count()
        approx = remove_outliers_robust(events, ["value"], k=3.5,
                                        relative_error=0.001).count()
        assert abs(exact - approx) <= 0.02 * exact

    def test_zero_mad_keeps_all(self, spark):
        from caspr_spark.operators.filters import remove_outliers_robust
        df = spark.createDataFrame([(i, 5.0) for i in range(10)],
                                   "id long, v double")
        assert remove_outliers_robust(df, ["v"]).count() == 10


class TestCalibrationBins:
    def test_hand_computed(self, spark):
        from caspr_spark.metrics import calibration_bins
        df = spark.createDataFrame(
            [(1, 0.05), (0, 0.08),   # bin 0
             (1, 0.95), (1, 1.00)],  # bin 9 (score 1.0 folds in)
            "y int, score double")
        got = {r.bin: (r.n, r.mean_score, r.positive_rate)
               for r in calibration_bins(df, "y", "score").collect()}
        assert set(got) == {0, 9}
        assert got[0] == (2, pytest.approx(0.065), pytest.approx(0.5))
        assert got[9] == (2, pytest.approx(0.975), pytest.approx(1.0))

    def test_validation(self, spark):
        from caspr_spark.metrics import calibration_bins
        df = spark.createDataFrame([(1, 0.5)], "y int, score double")
        with pytest.raises(ValueError, match="n_bins"):
            calibration_bins(df, "y", "score", n_bins=0)


class TestDriftPsi:
    def test_identical_distributions_score_zero(self, spark):
        from caspr_spark.metrics import drift_psi
        df = spark.createDataFrame([(float(i % 10),) for i in range(1000)],
                                   "v double")
        out = {r.bin: r.psi for r in drift_psi(df, df, "v").collect()}
        assert out[-1] == pytest.approx(0.0, abs=1e-9)

    def test_shift_detected_and_clamping(self, spark):
        from caspr_spark.metrics import drift_psi
        base = spark.createDataFrame([(float(i % 10),) for i in range(1000)],
                                     "v double")
        # current values beyond the baseline range clamp into the top bin
        cur = spark.createDataFrame([(50.0,)] * 1000, "v double")
        rows = {r.bin: r for r in drift_psi(base, cur, "v").collect()}
        assert rows[-1].psi > 0.25          # strong drift flagged
        assert rows[9].q == pytest.approx(1.0)  # all mass clamped to bin 9

    def test_validation(self, spark):
        from caspr_spark.metrics import drift_psi
        const = spark.createDataFrame([(1.0,)] * 5, "v double")
        with pytest.raises(ValueError, match="spread"):
            drift_psi(const, const, "v")


class TestExpectedCalibrationError:
    def test_perfectly_calibrated_scores(self, spark):
        from caspr_spark.metrics import expected_calibration_error
        # score 0.25 bin: 1 of 4 positive; score 0.75 bin: 3 of 4
        rows = [(1 if i == 0 else 0, 0.25) for i in range(4)] + \
               [(0 if i == 0 else 1, 0.75) for i in range(4)]
        df = spark.createDataFrame(rows, "y int, score double")
        assert expected_calibration_error(df, "y", "score") == \
            pytest.approx(0.0, abs=1e-12)

    def test_overconfident_scores(self, spark):
        from caspr_spark.metrics import expected_calibration_error
        df = spark.createDataFrame([(0, 0.95)] * 10, "y int, score double")
        assert expected_calibration_error(df, "y", "score") == \
            pytest.approx(0.95)


class TestReviewRegressions:
    """Regression pins for the round-4 code-review findings."""

    def test_covariance_underscore_columns_do_not_collide(self, spark):
        # (a, b_c) and (a_b, c) used to alias to the same agg column
        from caspr_spark.operators.profile import covariance_matrix
        df = spark.createDataFrame(
            [(1.0, 2.0, 10.0, 3.0), (2.0, 1.0, 20.0, 5.0),
             (3.0, 5.0, 30.0, 7.0)],
            "a double, b_c double, a_b double, c double")
        got = {(r.col_a, r.col_b): r.cov for r in covariance_matrix(
            df, ["a", "b_c", "a_b", "c"]).collect()}
        import numpy as np
        a = np.array([1.0, 2.0, 3.0]); bc = np.array([2.0, 1.0, 5.0])
        ab = np.array([10.0, 20.0, 30.0]); c = np.array([3.0, 5.0, 7.0])
        assert got[("a", "b_c")] == pytest.approx(
            np.cov(a, bc, ddof=0)[0, 1])
        assert got[("a_b", "c")] == pytest.approx(
            np.cov(ab, c, ddof=0)[0, 1])

    def test_keep_best_with_id_named_id(self, spark):
        docs = spark.createDataFrame([(1, 10), (2, 99)], "id long, q long")
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        kept = [r.id for r in dedup_keep_best(
            docs, pairs, quality_col="q", id_col="id").collect()]
        assert kept == [2]

    def test_mixture_null_domain_does_not_deflate_rates(self, spark):
        from caspr_spark.llm.mixture import mixture_sample
        rows = [(i, "a") for i in range(100)] + \
               [(100 + i, None) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, dom string")
        # budget covers the whole non-null domain: rate must clamp to 1
        out = mixture_sample(df, "dom", budget=100, id_cols=["doc_id"])
        assert out.count() == 100  # was ~50 when the null group diluted

    def test_profile_empty_table_renders_zero_nulls(self, spark):
        from caspr_spark.operators.profile import profile_table
        df = spark.createDataFrame([], "c long")
        got = {(r.column, r.metric): r.value
               for r in profile_table(df, include_modal=False).collect()}
        assert got[("c", "n_nulls")] == "0"
        assert got[("c", "n_distinct")] == "0"

    def test_drift_psi_empty_current_raises(self, spark):
        from caspr_spark.metrics import drift_psi
        base = spark.createDataFrame([(float(i),) for i in range(10)],
                                     "v double")
        empty = base.filter(F.lit(False))
        with pytest.raises(ValueError, match="current sample"):
            drift_psi(base, empty, "v")


class TestFuzzyJoinBlockCap:
    def test_hot_block_dropped_with_warning(self, spark):
        import warnings as w
        from caspr_spark.operators.joins import fuzzy_join
        left = spark.createDataFrame(
            [(i, "aaax") for i in range(20)] + [(100, "zzzq")],
            "lid long, lname string")
        right = spark.createDataFrame(
            [(i, "aaay") for i in range(20)] + [(200, "zzzw")],
            "rid long, rname string")
        with w.catch_warnings(record=True) as caught:
            w.simplefilter("always")
            out = fuzzy_join(left, right, "lname", "rname",
                             max_distance=2, block_len=3,
                             max_block_pairs=100).collect()
        # the 20x20 'aaa' block exceeds the cap and is dropped; the
        # 1x1 'zzz' block survives
        assert [(r.lid, r.rid) for r in out] == [(100, 200)]
        assert any("hot block" in str(c.message) for c in caught)

    def test_no_cap_keeps_everything(self, spark):
        from caspr_spark.operators.joins import fuzzy_join
        left = spark.createDataFrame([(1, "abcd")], "lid long, lname string")
        assert fuzzy_join(left, left.select(
            F.col("lid").alias("rid"), F.col("lname").alias("rname")),
            "lname", "rname").count() == 1

    def test_cap_validation(self, spark):
        from caspr_spark.operators.joins import fuzzy_join
        df = spark.createDataFrame([(1, "x")], "i long, s string")
        df2 = df.select(F.col("i").alias("j"), F.col("s").alias("t"))
        with pytest.raises(ValueError, match="max_block_pairs"):
            fuzzy_join(df, df2, "s", "t", max_block_pairs=0)

    def test_cap_is_default(self):
        # r4 verdict item 2: a 100 TB caller on defaults must NOT hit
        # the quadratic hot-block pathology (481 s vs 6.4 s at sf1,
        # SCALING_r04.md) — the cap ships ON; None is the opt-out
        import inspect
        from caspr_spark.operators.joins import fuzzy_join
        default = inspect.signature(fuzzy_join).parameters[
            "max_block_pairs"].default
        assert default == 1_000_000


class TestScd2History:
    def _log(self, spark):
        rows = [
            (1, "2024-01-01", "A", 10),
            (1, "2024-01-02", "A", 11),   # same state -> collapses
            (1, "2024-01-03", "B", 12),   # change -> new version
            (1, "2024-01-04", "A", 13),   # re-appearing state re-opens
            (2, "2024-01-01", "X", 14),
        ]
        return spark.createDataFrame(
            [(k, d, s, i) for k, d, s, i in rows],
            "k long, d_s string, status string, id long"
        ).withColumn("d", F.col("d_s").cast("date")).drop("d_s")

    def test_versions_and_intervals(self, spark):
        from caspr_spark.operators.merge import scd2_history
        out = scd2_history(self._log(spark), keys=["k"], ts_col="d",
                           attr_cols=["status"], tiebreak=["id"])
        got = sorted([(r.k, r.status, str(r.valid_from),
                       str(r.valid_to), r.is_current)
                      for r in out.collect()])
        assert got == [
            (1, "A", "2024-01-01", "2024-01-03", False),
            (1, "A", "2024-01-04", "None", True),
            (1, "B", "2024-01-03", "2024-01-04", False),
            (2, "X", "2024-01-01", "None", True),
        ]

    def test_null_transition_opens_version(self, spark):
        from caspr_spark.operators.merge import scd2_history
        df = spark.createDataFrame(
            [(1, "2024-01-01", None, 1), (1, "2024-01-02", "A", 2)],
            "k long, d_s string, status string, id long"
        ).withColumn("d", F.col("d_s").cast("date")).drop("d_s")
        out = scd2_history(df, ["k"], "d", ["status"], tiebreak=["id"])
        assert out.count() == 2

    def test_validation(self, spark):
        from caspr_spark.operators.merge import scd2_history
        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError, match="key"):
            scd2_history(df, [], "d", ["s"])
        with pytest.raises(ValueError, match="attribute"):
            scd2_history(df, ["k"], "d", [])


class TestNormalizeText:
    def test_all_steps(self, spark):
        from caspr_spark.llm.text import normalize_text
        df = spark.createDataFrame(
            [(1, "He said “hi” — twice…\tok\x00now")],
            "id long, text string")
        r = normalize_text(df, lowercase=True).first()
        assert r.text_norm == 'he said "hi" - twice... ok now'

    def test_steps_toggle(self, spark):
        from caspr_spark.llm.text import normalize_text
        df = spark.createDataFrame([(1, "  A’s   B  ")],
                                   "id long, text string")
        keep = normalize_text(df, lowercase=False,
                              collapse_whitespace=False).first().text_norm
        assert keep == "  A's   B  "
        norm = normalize_text(df).first().text_norm
        assert norm == "A's B"

    def test_control_replacement_does_not_fuse_words(self, spark):
        from caspr_spark.llm.text import normalize_text
        df = spark.createDataFrame([(1, "more\x0bjunk")],
                                   "id long, text string")
        assert normalize_text(df).first().text_norm == "more junk"


class TestValidateExpectations:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "a", 5.0), (2, "b", 50.0), (2, "zz", None),
             (None, "a", -1.0)],
            "k long, s string, v double")

    def test_all_rules_one_pass(self, spark):
        from caspr_spark.operators.expect import validate_expectations
        rules = [
            {"rule": "not_null", "col": "k"},
            {"rule": "unique", "col": "k"},
            {"rule": "in_range", "col": "v", "min": 0, "max": 10},
            {"rule": "in_set", "col": "s", "values": ["a", "b"]},
            {"rule": "matches", "col": "s", "pattern": "[a-y]+"},
            {"rule": "row_count_between", "min": 1, "max": 3},
        ]
        rep = {r.rule_id: (r.n_checked, r.n_violations, r.passed)
               for r in validate_expectations(
                   self._df(spark), rules).collect()}
        assert rep[0] == (4, 1, False)   # one null k
        assert rep[1] == (3, 1, False)   # k=2 duplicated (nulls skip)
        assert rep[2] == (3, 2, False)   # 50.0 and -1.0 out of range
        assert rep[3] == (4, 1, False)   # 'zz' not in set
        assert rep[4] == (4, 1, False)   # 'zz' fails the [a-y]+ shape
        assert rep[5] == (4, 1, False)   # 4 rows > max 3

    def test_passing_report(self, spark):
        from caspr_spark.operators.expect import validate_expectations
        df = spark.createDataFrame([(1, "a"), (2, "b")],
                                   "k long, s string")
        rep = validate_expectations(df, [
            {"rule": "not_null", "col": "k"},
            {"rule": "unique", "col": "k"},
            {"rule": "row_count_between", "min": 1},
        ]).collect()
        assert all(r.passed for r in rep)
        assert all(r.n_violations == 0 for r in rep)

    def test_validation_errors(self, spark):
        from caspr_spark.operators.expect import validate_expectations
        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError, match="at least one"):
            validate_expectations(df, [])
        with pytest.raises(ValueError, match="unknown rule"):
            validate_expectations(df, [{"rule": "nope", "col": "k"}])
        with pytest.raises(ValueError, match="in_range"):
            validate_expectations(df, [{"rule": "in_range", "col": "k"}])
        with pytest.raises(ValueError, match="in_set"):
            validate_expectations(df, [{"rule": "in_set", "col": "k",
                                        "values": []}])


class TestDiagnoseSkew:
    def test_hot_key_surfaces(self, spark):
        from caspr_spark.operators.profile import diagnose_skew
        rows = [(1, i) for i in range(90)] + [(k, 0) for k in range(2, 12)]
        df = spark.createDataFrame(rows, "k long, x long")
        rep = diagnose_skew(df, ["k"], top_n=3).collect()
        assert rep[0].key == "1" and rep[0].cnt == 90
        # 11 keys, 100 rows -> mean 100/11; imbalance of the hot key
        assert rep[0].imbalance == pytest.approx(90 / (100 / 11), abs=1e-6)
        assert rep[0].frac == pytest.approx(0.9, abs=1e-6)

    def test_composite_key_and_ties(self, spark):
        from caspr_spark.operators.profile import diagnose_skew
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (2, "b"), (1, "b")], "k long, s string")
        rep = diagnose_skew(df, ["k", "s"], top_n=10).collect()
        assert rep[0].key == "1\x1fa" and rep[0].cnt == 2
        # ties order by key asc
        assert [r.key for r in rep[1:]] == ["1\x1fb", "2\x1fb"]

    def test_validation(self, spark):
        from caspr_spark.operators.profile import diagnose_skew
        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError, match="key"):
            diagnose_skew(df, [])
        with pytest.raises(ValueError, match="top_n"):
            diagnose_skew(df, ["k"], top_n=0)


class TestTrainingShards:
    def _df(self, spark):
        return spark.createDataFrame(
            [(i, f"v{i}") for i in range(200)], "id long, v string")

    def test_roundtrip_and_manifest(self, spark, tmp_path):
        from caspr_spark.sources import (read_training_shards,
                                         write_training_shards)
        path = str(tmp_path / "shards")
        man = write_training_shards(self._df(spark), path, 4, "id")
        assert man["total_rows"] == 200
        assert sum(v["rows"] for v in man["shards"].values()) == 200
        # no empty shards at this size and every shard reasonably loaded
        assert all(v["rows"] > 20 for v in man["shards"].values())
        back = read_training_shards(spark, path)
        assert back.count() == 200
        assert {r.id for r in back.select("id").collect()} == set(range(200))

    def test_assignment_deterministic_across_partitionings(self, spark,
                                                           tmp_path):
        from caspr_spark.sources import write_training_shards
        df = self._df(spark)
        m1 = write_training_shards(df.repartition(3), str(tmp_path / "a"),
                                   4, "id")
        m2 = write_training_shards(df.repartition(11), str(tmp_path / "b"),
                                   4, "id")
        assert m1["shards"] == m2["shards"]

    def test_verification_catches_tampering(self, spark, tmp_path):
        import glob
        import os
        from caspr_spark.sources import (read_training_shards,
                                         write_training_shards)
        path = str(tmp_path / "shards")
        write_training_shards(self._df(spark), path, 2, "id")
        # drop one shard's files -> read must fail loudly
        victim = glob.glob(os.path.join(path, "__shard=1", "*.parquet"))
        for f in victim:
            os.remove(f)
        with pytest.raises(ValueError, match="manifest verification"):
            read_training_shards(spark, path)

    def test_validation(self, spark, tmp_path):
        from caspr_spark.sources import write_training_shards
        with pytest.raises(ValueError, match="n_shards"):
            write_training_shards(self._df(spark), str(tmp_path / "x"),
                                  0, "id")
