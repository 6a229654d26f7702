"""The CASPR featurization pipeline as an MLlib-style Estimator/Model pair.

``SequenceFeaturizer.fit_transform(train)`` runs the full chain —

1. F1 history-window filter (per-entity prediction-date cutoff)
2. W1 per-entity ranking (deterministic tie-break)
3. E7 date featurization (interval days or epoch seconds)
4. E1 capped frequency label-encoding      [fitted state]
5. E5 min-max / standard scaling           [fitted state]
6. E8/E9 NaN fills (long layout)
7. P1-P3 fixed-length sequence pivot
8. J4 profile join (non-sequential + label columns)
9. E8/E9 NaN fills (pivoted layout)

— and returns ``(wide_df, model)``; ``model.transform(val)`` reapplies the
train-fitted encoding + summary so val/test see exactly the train-time
feature space (leakage discipline of ``data_process_all_sp``,
caspr/utils/spark/preprocess.py:615-632). Stage order matches the
reference ``pipeline`` (preprocess.py:542-612).

Scale notes: the only shuffles are the W1 window and the P3 pivot — both
hash-partitioned by the entity key, so AQE reuses one exchange; encode
joins broadcast (dictionaries capped at 30k rows); scaling/fills are pure
expressions inside whole-stage codegen. The reference's mid-pipeline
``repartition`` (preprocess.py:594-596) is unnecessary here — broadcast
joins never skew the fact table.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from caspr_spark.cache import register_cache
from caspr_spark.roles import ColumnRoles
from caspr_spark.operators.encode import (CategoricalEncoding, fit_encoding,
                                          MAX_CAT_CARDINALITY)
from caspr_spark.operators.fills import fill_nans
from caspr_spark.operators.filters import filter_history_window, filter_last_n
from caspr_spark.operators.pivot import collect_sequences, featurize_sequential, sequences_to_wide
from caspr_spark.operators.rank import get_rank
from caspr_spark.operators.scale import (Summary, fit_summary, load_summary,
                                         normalize_columns, save_summary)


@dataclass
class SequenceFeaturizer:
    """Configuration (the unfitted Estimator). Defaults match the reference
    ``pipeline`` signature (caspr/utils/spark/preprocess.py:542-544)."""

    roles: ColumnRoles
    history_days: int = 365
    seq_len: int = 15
    left_pad: bool = False
    interval: bool = False
    scaling: str = "min_max"
    max_cardinality: int = MAX_CAT_CARDINALITY
    layout: str = "wide"  # "wide" (reference-compatible) or "array" (scale path)
    # persist the filtered prefix across the fit actions + featurization
    # (one materialization instead of one scan per fit job); disable when
    # the filtered window exceeds cluster storage
    cache_fit: bool = True

    def fit(self, df: DataFrame) -> "SequenceFeaturizerModel":
        _, model = self.fit_transform(df, _materialize=False)
        return model

    def fit_transform(self, df: DataFrame, _materialize: bool = True):
        """Fit encoding + summary on ``df`` and featurize it in one pass.

        The fit aggregations (per-column top-K, one stats pass) run on the
        pre-rank plan — they don't depend on W1, so the fit jobs never
        execute the entity window. Only the final featurization pays for
        it, once.
        """
        r = self.roles
        r.validate(df)
        long_df = self._prefix(df)
        if self.cache_fit:
            # Cache only the columns the fit jobs and the featurization
            # consume: persist() materializes EVERY column of the plan it
            # is handed (the cache is opaque to Catalyst's pruning), so
            # without this projection a payload column the roles never
            # reference — a props/body blob on the event row — is built
            # into the cache and paid for on every fit pass. Pure column
            # pruning: the downstream stages select from exactly this set,
            # so results are unchanged.
            long_df = long_df.select(*self._consumed_cols(long_df))
            long_df = register_cache(long_df.persist())

        norm_cols = r.date_cols + r.cont_cols
        if set(norm_cols) & set(r.cat_cols):
            # a column both encoded and scaled must see the encoded values
            # in its summary — keep the sequential order for that (unusual)
            # role layout
            encoding = fit_encoding(long_df, r.cat_cols, self.max_cardinality)
            long_df = encoding.apply(long_df, r.cat_cols)
            long_df, summary = normalize_columns(long_df, norm_cols, None,
                                                 self.scaling)
        else:
            # The summary aggregation only reads date/cont columns, which
            # the encoding joins never touch — so the stats pass and the
            # per-cat-column top-K jobs are independent and can share the
            # cluster (guide-style concurrent driver actions): the summary
            # job back-fills executors the TakeOrdered tails leave idle
            # instead of paying one extra sequential job latency. Values
            # are identical to the sequential order by construction.
            from concurrent.futures import ThreadPoolExecutor

            # Spark job groups / descriptions / scheduler pools are JVM
            # thread-locals: a plain pool thread would submit the summary
            # job OUTSIDE any job group or label the caller set, so
            # cancellation scopes and bench/UI labels would silently not
            # cover it. inheritable_thread_target captures the current
            # thread's local properties and re-applies them in the worker
            # (the documented PySpark idiom for driver-side concurrency);
            # if the pinned-thread contract it needs is unavailable, fall
            # back to the bare call — correctness is unaffected either
            # way (fit_summary persists nothing and reads disjoint
            # columns).
            def _summary():
                return fit_summary(long_df, norm_cols)
            try:
                from pyspark import inheritable_thread_target
                _summary_job = inheritable_thread_target(_summary)
            except Exception:
                _summary_job = _summary
            with ThreadPoolExecutor(max_workers=1) as pool:
                summary_fut = pool.submit(_summary_job)
                encoding = fit_encoding(long_df, r.cat_cols,
                                        self.max_cardinality)
                summary = summary_fut.result()
            long_df = encoding.apply(long_df, r.cat_cols)
            long_df, _ = normalize_columns(long_df, norm_cols, summary,
                                           self.scaling)

        model = SequenceFeaturizerModel(self, encoding, summary)
        wide = model._finish(self._rank(long_df)) if _materialize else None
        return wide, model

    def _prefix(self, df: DataFrame) -> DataFrame:
        """F1 filter + E7 date featurization (window-free stateless prefix).

        The raw activity timestamp is stashed as ``__rank_ts`` so ranking
        stays ordered by event time even after date columns become
        interval/epoch features."""
        r = self.roles
        df = filter_history_window(df, r.activity_date, r.prediction_date, self.history_days)
        df = df.withColumn("__rank_ts", F.col(r.activity_date))
        for d in r.date_cols:
            if self.interval:
                df = df.withColumn(d, F.datediff(F.col(r.prediction_date), F.col(d)))
            else:
                df = df.withColumn(d, F.unix_timestamp(F.col(d)).cast("double"))
        return df

    def _rank(self, df: DataFrame) -> DataFrame:
        """W1 on the stashed raw timestamp; drops the stash.

        The collect-based featurization paths (array layout, and the
        wide layout with profile columns — see ``_finish``) consume only
        ``rank_desc``, so they rank with a single ``row_number`` window
        instead of get_rank's row_number + count pair: one window
        function pass over the entity partition instead of two (the
        padding slots resolve post-aggregation in
        ``collect_sequences``). The pivot path keeps the full get_rank
        (its slot arithmetic needs ``seq_len``/``rank_asc`` pre-pivot).
        """
        from pyspark.sql import Window

        r = self.roles
        if self.layout == "array" or self._profile_cols():
            order = ([F.col("__rank_ts").desc()]
                     + [F.col(c).desc() for c in (r.order_tiebreak or [])])
            w = Window.partitionBy(*[F.col(c) for c in r.tgt_id]).orderBy(*order)
            return df.withColumn("rank_desc",
                                 F.row_number().over(w)).drop("__rank_ts")
        return get_rank(df, r.tgt_id, "__rank_ts",
                        tiebreak=r.order_tiebreak).drop("__rank_ts")

    def _consumed_cols(self, long_df: DataFrame) -> list[str]:
        """Every column of the post-``_prefix`` long relation that any
        later stage reads: entity key, ranking timestamp + tie-breaks,
        role columns (sequence, categorical, continuous, date), profile
        carries, and the prediction date (consumed by absolute-mode
        fills). Order-preserving dedup against the actual columns."""
        r = self.roles
        wanted = (r.tgt_id + ["__rank_ts"] + list(r.order_tiebreak or [])
                  + r.seq_cols + r.cat_cols + r.cont_cols + r.date_cols
                  + self._profile_cols() + [r.prediction_date])
        present = set(long_df.columns)
        seen: set[str] = set()
        out: list[str] = []
        for c in wanted:
            if c in present and c not in seen:
                seen.add(c)
                out.append(c)
        return out

    def _profile_cols(self) -> list[str]:
        """The non-sequential columns carried through the featurization
        (shared by ``_rank``'s light-mode decision and ``_finish``).
        Order-preserving dedup: ``prediction_date`` may already appear in
        ``output_cols`` (without being declared non-sequential), and a
        duplicate here would alias the same aggregate twice — the fused
        wide+profile select would then raise an ambiguous-column
        AnalysisException (the old join path silently duplicated the
        column instead)."""
        r = self.roles
        extra = ([r.prediction_date]
                 if not self.interval and r.prediction_date not in r.non_seq_cols
                 else [])
        wanted = r.non_seq_cols + r.output_cols + extra
        seen: set[str] = set()
        out: list[str] = []
        for c in wanted:
            if c not in seen:
                seen.add(c)
                out.append(c)
        return out

    def _prepare(self, df: DataFrame) -> DataFrame:
        """Stages 1-3 complete (transform path, no fitting)."""
        return self._rank(self._prefix(df))


@dataclass
class SequenceFeaturizerModel:
    """Fitted featurizer: reapplies train-time encoding + summary."""

    params: SequenceFeaturizer
    encoding: CategoricalEncoding
    summary: Summary

    def transform(self, df: DataFrame) -> DataFrame:
        p = self.params
        p.roles.validate(df)
        long_df = p._prepare(df)
        long_df = self.encoding.apply(long_df, p.roles.cat_cols)
        long_df, _ = normalize_columns(long_df, p.roles.date_cols + p.roles.cont_cols,
                                       self.summary, p.scaling)
        return self._finish(long_df)

    # -- shared tail (stages 6-9) ------------------------------------------

    def _finish(self, long_df: DataFrame) -> DataFrame:
        p, r = self.params, self.params.roles
        summary_date = {d: self.summary[d] for d in r.date_cols}

        long_df = fill_nans(long_df, r.cat_cols, r.cont_cols, r.date_cols,
                            p.history_days, r.prediction_date, p.interval,
                            summary_date, p.scaling)

        # carry prediction_date through the pivot when absolute-mode date
        # fills will need it on the wide layout (the reference requires the
        # caller to declare it non-sequential; we carry it implicitly)
        prof_vals = p._profile_cols()
        # the implicitly-carried columns (not declared non-seq/output) are
        # dropped after the wide fills; membership, not a length slice —
        # _profile_cols dedups, so positional slicing would mis-split when
        # prediction_date is also a declared output column
        declared = set(r.non_seq_cols) | set(r.output_cols)
        extra_profile = [c for c in prof_vals if c not in declared]
        # profile columns ride the sequence aggregate itself (max over the
        # single rank-1 row is deterministic): the whole featurization —
        # sequences + profile — is ONE hash aggregate, zero joins, the
        # 100 TB shape. Both layouts use it; they differ only in how the
        # aggregate is materialized into columns.
        prof_aggs = [F.max(F.when(F.col("rank_desc") == 1, F.col(c)))
                     .alias(c) for c in prof_vals]
        if p.layout == "array":
            feat = collect_sequences(long_df, r.tgt_id, p.seq_len, r.seq_cols,
                                     p.left_pad, extra_aggs=prof_aggs)
            wide = sequences_to_wide(feat, r.seq_cols, p.seq_len)
        elif prof_vals:
            # wide layout WITH profile columns: the former shape — pivot,
            # then join the rank-1 profile rows back on tgt_id — executed
            # the windowed long table twice and joined the two one-row-per-
            # entity relations with a sort-merge join (2 extra sorts + a
            # second Exchange+Window pass over the fact table, seen in the
            # r15 before-plan). Fusing the profile into the one sequence
            # aggregate removes the join and the second window execution;
            # the select below reproduces the pivot layout's exact
            # slot-major column order (tgt_id, {slot}_{col}..., profile),
            # so the output is column-for-column identical to the join
            # form (oracle-verified at both SFs).
            feat = collect_sequences(long_df, r.tgt_id, p.seq_len, r.seq_cols,
                                     p.left_pad, extra_aggs=prof_aggs)
            exprs = [F.col(c) for c in r.tgt_id]
            exprs += [F.col(f"{c}_seq")[s - 1].alias(f"{s}_{c}")
                      for s in range(1, p.seq_len + 1) for c in r.seq_cols]
            exprs += [F.col(c) for c in prof_vals]
            wide = feat.na.drop(subset=r.tgt_id).select(*exprs)
        else:
            wide = featurize_sequential(long_df, r.tgt_id, p.seq_len, r.seq_cols, p.left_pad)

        cat_w, cont_w, _, _, date_w = r.wide_lists(p.seq_len, p.left_pad)
        present = set(wide.columns)
        wide = fill_nans(wide,
                         [c for c in cat_w if c in present],
                         [c for c in cont_w if c in present],
                         [c for c in date_w if c in present],
                         p.history_days, r.prediction_date, p.interval,
                         {d: self.summary[d] for d in r.date_cols}, p.scaling)
        return wide.drop(*[c for c in extra_profile])

    # -- persistence --------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        cfg = {k: getattr(self.params, k)
               for k in ("history_days", "seq_len", "left_pad", "interval",
                          "scaling", "max_cardinality", "layout", "cache_fit")}
        cfg["roles"] = self.params.roles.to_dict()
        with open(os.path.join(path, "params.json"), "w") as f:
            json.dump(cfg, f)
        self.encoding.save(os.path.join(path, "encoding.json"))
        save_summary(self.summary, os.path.join(path, "summary.json"))

    @classmethod
    def load(cls, path: str) -> "SequenceFeaturizerModel":
        with open(os.path.join(path, "params.json")) as f:
            cfg = json.load(f)
        roles = ColumnRoles.from_dict(cfg.pop("roles"))
        params = SequenceFeaturizer(roles=roles, **cfg)
        return cls(params,
                   CategoricalEncoding.load(os.path.join(path, "encoding.json")),
                   load_summary(os.path.join(path, "summary.json")))


def data_process_all(train: DataFrame, val: DataFrame, test: DataFrame,
                     featurizer: SequenceFeaturizer):
    """Fit on train; reapply to val/test (X-split leakage discipline).

    Reference: ``data_process_all_sp`` (caspr/utils/spark/preprocess.py:615-632).
    """
    train_wide, model = featurizer.fit_transform(train)
    return train_wide, model.transform(val), model.transform(test), model


def build_sliding_window_trainset(df: DataFrame, featurizer: SequenceFeaturizer,
                                  cutoffs: list, label_window_days: int = 0,
                                  activity_col: str | None = None,
                                  activities: list[str] | None = None):
    """X3: time-based data augmentation — one feature(+label) set per
    cutoff date, unioned with a ``window_id``.

    For each cutoff ``t``: features come from the history window ending at
    ``t`` (the featurizer's F1 filter), labels (optional) are the multi-hot
    of ``activity_col`` over ``(t, t + label_window_days]``. The featurizer
    is fitted once on the latest cutoff and *reapplied* to earlier windows,
    so every window shares one feature space (the train-time encoding
    discipline of data_process_all). Reference: the pandas sliding-window
    builder caspr/utils/preprocess.py:116-169 with window dates from
    ``get_sliding_window_dates`` (caspr/utils/spark/preprocess.py:468-482).

    Returns ``(unioned_wide_df, model)``.
    """
    from datetime import timedelta
    from caspr_spark.operators.labels import build_multi_hot_labels, join_labels

    r = featurizer.roles
    model = None
    out = None
    for i, cut in enumerate(cutoffs):
        part = df.withColumn(r.prediction_date, F.lit(cut))
        if model is None:
            wide, model = featurizer.fit_transform(part)
        else:
            wide = model.transform(part)
        if label_window_days and activity_col:
            labels = build_multi_hot_labels(
                df, r.tgt_id, activity_col, r.activity_date,
                label_start=cut, label_end=cut + timedelta(days=label_window_days),
                activities=activities)
            wide = join_labels(wide, labels, r.tgt_id, how="inner")
        wide = wide.withColumn("window_id", F.lit(i))
        out = wide if out is None else out.unionByName(wide)
    return out, model
