"""Round-12 sf0.1 -> sf1 scale-stress sweep (SCALING_r12.md).

Covers what the round-12 code deltas touched:

- the four NEW/NEWLY-CERTIFIED queries — ``emb_near_dup_auto`` (now a
  full oracle, redefined 0.9/0.9 -> 0.45/0.5),
  ``stream_gram_census_state`` (the foreachBatch versioned-state
  census sink incl. its restart boundary),
  ``dedup_incremental_portable`` (portable family through the
  batch-vs-history path), ``segment_kmeans_fixed`` (pinned-centroid
  assignment + fixed-point profile);
- the PORTABLE-FAMILY PREMIUM on the incremental path: near-mode
  dedup_against_history fast vs portable at both SFs (the r11
  addendum measured the one-shot premium; this is the production
  decision path);
- the STRICT-SCOPE tripwire cost: global_running_sum under the
  default persist vs the strict-mode eager localCheckpoint, so the
  "leave strict off the hot path" advice carries a number;
- the emb_near_dup_auto REDEFINITION delta: the old 0.9/0.9 plan vs
  the new 0.45/0.5 plan at sf0.1, for the bench-series comparability
  note (the 0.9 result set is empty on this data; the work differs
  only in table count).

Timing protocol identical to r08-r11: full-column
``max(xxhash64(<every column>))`` materialization, one shared warmed
session, sf0.1 first.

Usage: python tools/scale_sweep_r12.py [sf1_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"

ROUND12 = [
    "emb_near_dup_auto",
    "stream_gram_census_state",
    "stream_gram_census_delta",
    "dedup_incremental_portable",
    "dedup_incremental_state",
    "segment_kmeans_fixed",
]


def force_all_columns(df):
    from pyspark.sql import functions as F
    return df.agg(F.max(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()


def main():
    import __spark_entry__ as em
    from caspr_spark import get_spark
    from caspr_spark.cache import cache_scope

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()

    from pyspark.sql import functions as F
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    emb.groupBy((F.crc32(F.col("vec_id").cast("string")) % 8)
                .alias("g")).count().collect()

    out = {}
    for name in ROUND12:
        out[name] = {}
        for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.time()
            with cache_scope():
                force_all_columns(qs[name](spark, sf_dir))
            dt = round(time.time() - t0, 2)
            out[name][sf_label] = {"sec": dt}
            print(f"{name:28s} {sf_label:6s} {dt:8.2f}s", flush=True)

    # --- incremental portable premium -------------------------------
    from caspr_spark.llm.dedup import dedup_against_history
    for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                    .select("doc_id", "text")
        history = docs.filter(F.col("doc_id") % 2 == 0)
        batch = (docs.filter(F.col("doc_id") % 2 == 1)
                 .unionByName(docs.filter(F.col("doc_id") % 4 == 0)
                              .withColumn("doc_id",
                                          F.col("doc_id") + 10_000_000)))
        row = {}
        for fam in ("fast", "portable"):
            t0 = time.time()
            with cache_scope():
                _, m = dedup_against_history(
                    batch, history, mode="near", num_hashes=64,
                    bands=16, threshold=0.8, hash_family=fam)
                force_all_columns(m)
            row[fam] = round(time.time() - t0, 2)
            print(f"incr_premium {sf_label:6s} {fam:8s} {row[fam]:8.2f}s",
                  flush=True)
        out[f"incremental_premium_{sf_label}"] = row

    # --- strict-scope tripwire cost ---------------------------------
    # global_running_sum over a 2M-row tape: default persist vs the
    # strict eager localCheckpoint. The delta is the price of loud
    # escape failure — paid only when strict mode is armed.
    from caspr_spark.operators.sampling import global_running_sum
    tape = (spark.range(2_000_000)
            .select(F.col("id"), (F.col("id") % 300 + 10).alias("tok")))
    row = {}
    for label, strict in (("default", False), ("strict", True)):
        t0 = time.time()
        with cache_scope(strict=strict):
            force_all_columns(global_running_sum(tape, "tok", ["id"]))
        row[label] = round(time.time() - t0, 2)
        print(f"strict_cost  {label:8s} {row[label]:8.2f}s", flush=True)
    out["strict_scope_cost_2m_rows"] = row

    # --- emb_near_dup_auto redefinition delta (sf0.1) ---------------
    from caspr_spark.llm.similarity import embedding_near_duplicates
    emb01 = spark.read.parquet(f"{SF01}/embeddings.parquet")
    row = {}
    for label, thr, rec in (("old_0.9_0.9", 0.9, 0.9),
                            ("new_0.45_0.5", 0.45, 0.5)):
        t0 = time.time()
        with cache_scope():
            force_all_columns(embedding_near_duplicates(
                emb01, threshold=thr, dim=64, target_recall=rec))
        row[label] = round(time.time() - t0, 2)
        print(f"auto_redef   {label:12s} {row[label]:8.2f}s", flush=True)
    out["emb_near_dup_auto_redef_sf0.1"] = row

    print(json.dumps(out))


if __name__ == "__main__":
    main()
