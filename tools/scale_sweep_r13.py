"""Round-13 sf0.1 -> sf1 scale-stress sweep (SCALING_r13.md).

Covers what the round-13 code deltas touched:

- the three NEW queries — ``dedup_signature_state`` (versioned LSM
  signature state incl. a replayed fold), ``bpe_tokenize_fixed``
  (pinned-merges Arrow-batched BPE apply over the full corpus),
  ``stream_dedup_corpus`` (exactly-once streaming corpus dedup incl.
  stream startups + a restart boundary by design);
- the SIGNATURE-STATE LSM claim measured directly (the r12 census
  measurement, repeated for this round's table): folding a tiny crawl
  batch into a large signature state as an O(batch) delta vs the old
  O(state) full-table append+rewrite — the ratio is the point, and it
  grows unboundedly in the direction 100 TB pushes;
- probe numbers are READ FROM the committed bench record (r12 verdict
  item 5: the sweep re-measuring them is how SCALING_r12 and
  BENCH_r12_local came to disagree), pass its path as argv[2].

Timing protocol identical to r08-r12: full-column
``max(xxhash64(<every column>))`` materialization, one shared warmed
session, sf0.1 first.

Usage: python tools/scale_sweep_r13.py [sf1_dir] [bench_record.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
BENCH = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_r13_local.json"

ROUND13 = [
    "dedup_signature_state",
    "bpe_tokenize_fixed",
    "stream_dedup_corpus",
]


def force_all_columns(df):
    from pyspark.sql import functions as F
    return df.agg(F.max(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()


def main():
    import tempfile

    import __spark_entry__ as em
    from caspr_spark import get_spark
    from caspr_spark.cache import cache_scope

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()

    from pyspark.sql import functions as F
    # warm the session with one small shuffle
    spark.range(1_000_000).groupBy((F.col("id") % 8).alias("g")) \
         .count().collect()

    out = {}
    for name in ROUND13:
        out[name] = {}
        for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.time()
            with cache_scope():
                force_all_columns(qs[name](spark, sf_dir))
            dt = round(time.time() - t0, 2)
            out[name][sf_label] = {"sec": dt}
            print(f"{name:28s} {sf_label:6s} {dt:8.2f}s", flush=True)

    # --- signature-state LSM: O(batch) delta vs O(state) rewrite ----
    # History = the sf1 documents corpus (50k docs, shingle arrays make
    # the signature table corpus-sized); the daily batch = 500 docs.
    # Old loop: append_history_signatures + full-table rewrite.
    # New loop: append_history_signatures_state delta fold.
    from caspr_spark.llm.dedup import (append_history_signatures,
                                       append_history_signatures_state,
                                       build_history_signatures,
                                       load_history_keys,
                                       save_history_keys)
    docs = spark.read.parquet(f"{SF1}/documents.parquet") \
                .select("doc_id", "text")
    history = docs.filter(F.col("doc_id") % 100 != 0)
    batch = (docs.filter(F.col("doc_id") % 100 == 0)
             .withColumn("doc_id", F.col("doc_id") + 10_000_000))
    base = tempfile.mkdtemp(prefix="sig_sweep_")
    row = {"history_docs": history.count(), "batch_docs": batch.count()}

    # seed BOTH layouts with the same prebuilt history signatures
    plain_path = f"{base}/plain"
    with cache_scope():
        save_history_keys(build_history_signatures(history), plain_path)
    state_dir = f"{base}/state"
    with cache_scope():
        append_history_signatures_state(spark, state_dir, 1, history,
                                        compact_every=8)

    t0 = time.time()
    with cache_scope():
        sigs = load_history_keys(spark, plain_path)
        save_history_keys(append_history_signatures(sigs, batch),
                          f"{base}/plain_next")
    row["plain_rewrite_sec"] = round(time.time() - t0, 2)
    print(f"sig_state plain_rewrite  {row['plain_rewrite_sec']:8.2f}s",
          flush=True)

    t0 = time.time()
    with cache_scope():
        append_history_signatures_state(spark, state_dir, 2, batch,
                                        compact_every=8)
    row["lsm_delta_sec"] = round(time.time() - t0, 2)
    print(f"sig_state lsm_delta      {row['lsm_delta_sec']:8.2f}s",
          flush=True)
    out["signature_state_fold_sf1"] = row

    # --- probes: quoted from the committed bench record -------------
    try:
        with open(BENCH) as fh:
            rec = json.load(fh)
        out["calibration_from_bench_record"] = {
            "source": os.path.basename(BENCH),
            **rec.get("calibration", {}),
            "value_per_shuffle_unit": rec.get("value_per_shuffle_unit"),
            "value_per_smalljob_unit": rec.get("value_per_smalljob_unit"),
        }
    except OSError:
        out["calibration_from_bench_record"] = {
            "source": None, "note": f"{BENCH} not found — run bench.py "
            "first; this sweep never re-measures probes"}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
