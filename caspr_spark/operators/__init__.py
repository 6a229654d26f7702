"""Featurization operators — each a pure function DataFrame -> DataFrame.

Operator IDs (W1, F1, E5, ...) refer to SURVEY.md §2's inventory of the
reference's capabilities.
"""

from caspr_spark.operators.rank import (
    get_rank, timestamps_to_intervals, sessionize,
)
from caspr_spark.operators.filters import (
    filter_history_window, filter_last_n, remove_outliers,
)
from caspr_spark.operators.encode import CategoricalEncoding, fit_encoding
from caspr_spark.operators.scale import fit_summary, normalize_columns, denormalize_columns
from caspr_spark.operators.fills import fill_nans, fill_date_nans
from caspr_spark.operators.pivot import (
    featurize_sequential, collect_sequences, sequences_to_wide,
    petastorm_rename, petastorm_rename_list, pack_feature_arrays,
)
from caspr_spark.operators.probes import (
    get_sequence_length, get_lookback_period, get_sliding_window_dates,
    column_cardinalities, distinct_values_sorted,
)
from caspr_spark.operators.labels import build_multi_hot_labels, join_labels
from caspr_spark.operators.joins import (
    asof_join, bloom_semi_join, interval_overlap_join, range_join,
    salted_join, sorted_neighborhood_pairs,
)
from caspr_spark.operators.timeseries import (
    continuous_rollup, funnel, hourly_aggregate, time_bucket,
)
from caspr_spark.operators.joins import fuzzy_join
from caspr_spark.operators.merge import merge_upsert, diff_snapshots
from caspr_spark.operators.frequent import heavy_hitters
from caspr_spark.operators.layout import zorder_value, zorder_repartition
from caspr_spark.operators.profile import profile_table, covariance_matrix
from caspr_spark.operators.filters import remove_outliers_robust
from caspr_spark.operators.timeseries import (
    merge_rollup_delta, distinct_sketch_layer, distinct_rollup,
    distinct_total,
)
from caspr_spark.operators.sampling import (
    stratified_sample_hash, stratified_sample_exact, downsample_to_cap,
    global_running_sum, select_to_token_budget, weighted_sample_topk,
    assign_folds,
)

__all__ = [
    "get_rank", "timestamps_to_intervals", "sessionize",
    "filter_history_window", "filter_last_n", "remove_outliers",
    "CategoricalEncoding", "fit_encoding",
    "fit_summary", "normalize_columns", "denormalize_columns",
    "fill_nans", "fill_date_nans",
    "featurize_sequential", "collect_sequences", "sequences_to_wide",
    "petastorm_rename", "petastorm_rename_list", "pack_feature_arrays",
    "get_sequence_length", "get_lookback_period", "get_sliding_window_dates",
    "column_cardinalities", "distinct_values_sorted",
    "build_multi_hot_labels", "join_labels",
    "asof_join", "bloom_semi_join", "interval_overlap_join",
    "range_join", "salted_join", "sorted_neighborhood_pairs",
    "time_bucket", "hourly_aggregate", "continuous_rollup", "funnel",
    "fuzzy_join", "merge_upsert", "diff_snapshots", "heavy_hitters",
    "zorder_value", "zorder_repartition",
    "profile_table", "covariance_matrix", "remove_outliers_robust",
    "merge_rollup_delta", "distinct_sketch_layer", "distinct_rollup",
    "distinct_total",
    "stratified_sample_hash", "stratified_sample_exact",
    "downsample_to_cap", "global_running_sum", "select_to_token_budget",
    "weighted_sample_topk", "assign_folds",
]
