"""Regenerate tests/plan_snapshots.json — the pinned physical-plan digests.

Run after an INTENTIONAL plan change:

    python tools/gen_plan_snapshots.py

Builds each snapshot query from ``__spark_entry__.queries()`` at sf0.001
(plans only; construction-time fits/collects run on the tiny SF) and
writes the ``caspr_spark.plans.plan_digest`` of each. tests/test_plans.py
fails on any drift, so a broadcast join degrading to sort-merge or a
Python eval node sneaking into a hot path is caught in CI, not at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SNAP_SF_DIR", "/root/testdata/sf0.001")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "plan_snapshots.json")

# batch headliners with a lazily-planned result DataFrame (streaming memory
# sinks and driver-side training loops have no single plan to pin)
SNAPSHOT_QUERIES = [
    "pipeline_events",
    "pipeline_events_array",
    "pipeline_orders_profile",
    "pipeline_lineitem",
    "asof_join",
    "w1_rank",
    "f1_history_window",
    "e1_encode_capped",
    "e5_normalize_minmax",
    "p3_pivot_last5",
    "x3_sliding_union",
    "range_join_campaigns",
    "hypertable_rollup",
    "funnel_conversion",
    "bloom_semi_join",
    "a9_label_multihot",
    "e8_date_fill_pivoted",
    "w5_sessionize",
    "j2_semi_prune",
    "dedup_exact",
    "text_token_counts",
    "text_quality",
    "text_langid",
    "simsearch_topk",
    "simsearch_topk_lsh",
    "score_linear",
    "segment_dec",
    "multimodal_features",
    "pipeline_events_percutoff",
    "pipeline_orders_composite",
    "e12_time_shuffle",
    "emb_near_dup",
    "seq_pack_offset",
    "seq_pack_nextfit",
    "mixture_sample",
    "cluster_balanced",
    "lm_perplexity",
    "doc_chunks",
    "winnow_pairs",
    "related_docs",
    "sketch_distinct_rollup",
    # round-4 part five (dedup_keep_best excluded: its iterative
    # connected-components localCheckpoint makes the final plan a
    # checkpoint scan, not a stable declarative plan)
    "clean_paragraph_dedup",
    "clean_boilerplate",
    "quality_hashed_bow",
    "token_budget_select",
    "merge_upsert_orders",
    "hybrid_search_rrf",
    "heavy_hitters",
    "fuzzy_join_parts",
    "zorder_layout",
    "weighted_sample",
    "cv_folds",
    "llm_curate_v2",
    "diff_snapshots",
    "profile_table",
    "quantize_embeddings",
    "rollup_incremental",
    "outlier_robust",
    "calibration_bins",
    # round-5 additions
    "scd2_orders",
    "text_normalize",
    "attribution_last_touch",
    "resample_daily",
    # round-9 additions: the distributed-ntile exact quantile path and
    # the new curation operators (substring-dedup pair, DSIR selection)
    "e10_quantile_bucket",
    "dsir_select",
    "duplicated_spans",
    "trim_duplicated_spans",
    "contamination_fraction",
    # round-10 additions: the shared-gram-table composition and the
    # prefix-scan stratum samplers (skew fix — no stratum-keyed window)
    "span_shared_grams",
    "span_census_incremental",
    "span_trim_incremental",
    "stratified_sample_exact",
    "downsample_cap",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from caspr_spark import get_spark
    from caspr_spark.plans import plan_digest

    spark = get_spark("plan-snapshots", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    snaps: dict[str, dict[str, int]] = {}
    for name in SNAPSHOT_QUERIES:
        spark.catalog.clearCache()  # digests are pinned against a cold cache
        snaps[name] = plan_digest(qs[name](spark, SF_DIR))
        print(f"{name}: {snaps[name]}")
    with open(OUT, "w") as f:
        json.dump(snaps, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
