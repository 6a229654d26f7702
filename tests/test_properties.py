"""Property-based tests (hypothesis) for the padding truth table, rank
invariants, and scaling round-trips — the fiddly semantics SURVEY §7.3
flags as highest-risk."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from caspr_spark.operators import (
    get_rank, featurize_sequential, collect_sequences,
    normalize_columns, denormalize_columns,
)

SETTINGS = dict(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def _events_df(spark, seq_lens):
    rows = []
    eid = 0
    for u, m in enumerate(seq_lens):
        for i in range(m):
            rows.append((eid, u, f"2024-01-{i + 1:02d} 12:00:00", float(eid)))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_s", "val"])
    return (spark.createDataFrame(pdf)
            .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s"))


class TestPaddingProperties:
    @given(seq_lens=st.lists(st.integers(1, 9), min_size=1, max_size=5),
           n=st.integers(1, 7), left_pad=st.booleans())
    @settings(**SETTINGS)
    def test_padding_truth_table(self, spark, seq_lens, n, left_pad):
        """For every (seq_len, n, pad) combination:
        - filled slot count = min(seq_len, n)
        - right pad, short: slots 1..seq_len filled, tail NULL
        - left pad, short: head NULL, slots (n-seq_len+1)..n filled
        - long histories: all n slots filled with the *latest* n values
          in ascending time order."""
        df = _events_df(spark, seq_lens)
        ranked = get_rank(df, ["user_id"], "ts", tiebreak=["event_id"])
        wide = featurize_sequential(ranked, ["user_id"], n, ["val"], left_pad)
        out = wide.toPandas().set_index("user_id").sort_index()
        assert len(out) == len(seq_lens)
        for u, m in enumerate(seq_lens):
            vals = [out.loc[u, f"{s}_val"] for s in range(1, n + 1)]
            filled = [v for v in vals if pd.notna(v)]
            assert len(filled) == min(m, n)
            # events for user u are consecutive eids ascending in time
            last = [float(e) for e in range(sum(seq_lens[:u]),
                                            sum(seq_lens[:u]) + m)][-n:]
            assert filled == last[-min(m, n):]
            if m < n:
                if left_pad:
                    assert all(pd.isna(v) for v in vals[:n - m])
                else:
                    assert all(pd.isna(v) for v in vals[m:])

    @given(seq_lens=st.lists(st.integers(1, 8), min_size=1, max_size=4),
           n=st.integers(1, 6), left_pad=st.booleans())
    @settings(**SETTINGS)
    def test_array_layout_equals_wide(self, spark, seq_lens, n, left_pad):
        """collect_sequences (scale path) == featurize_sequential (pivot)."""
        df = _events_df(spark, seq_lens)
        ranked = get_rank(df, ["user_id"], "ts", tiebreak=["event_id"])
        wide = featurize_sequential(ranked, ["user_id"], n, ["val"], left_pad) \
            .toPandas().set_index("user_id").sort_index()
        arr = collect_sequences(ranked, ["user_id"], n, ["val"], left_pad) \
            .toPandas().set_index("user_id").sort_index()
        for u in wide.index:
            seq = list(arr.loc[u, "val_seq"])
            for s in range(1, n + 1):
                w = wide.loc[u, f"{s}_val"]
                a = seq[s - 1]
                assert (pd.isna(w) and (a is None or pd.isna(a))) or w == a


class TestRankProperties:
    @given(seq_lens=st.lists(st.integers(1, 10), min_size=1, max_size=6))
    @settings(**SETTINGS)
    def test_rank_invariants(self, spark, seq_lens):
        df = _events_df(spark, seq_lens)
        ranked = get_rank(df, ["user_id"], "ts", tiebreak=["event_id"]).toPandas()
        assert (ranked.rank_asc + ranked.rank_desc == ranked.seq_len + 1).all()
        for u, grp in ranked.groupby("user_id"):
            assert sorted(grp.rank_desc) == list(range(1, len(grp) + 1))
            assert (grp.seq_len == len(grp)).all()


class TestScalingProperties:
    @given(vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=2,
                         max_size=30),
           scaling=st.sampled_from(["min_max", "standard"]))
    @settings(**SETTINGS)
    def test_roundtrip_identity(self, spark, vals, scaling):
        pdf = pd.DataFrame({"x": vals})
        sdf = spark.createDataFrame(pdf)
        normed, summary = normalize_columns(sdf, ["x"], None, scaling)
        back = denormalize_columns(normed, ["x"], summary, scaling).toPandas()
        for orig, rt in zip(sorted(vals), sorted(back["x"])):
            assert rt == pytest.approx(orig, rel=1e-9, abs=1e-6)
