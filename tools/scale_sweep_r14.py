"""Round-14 sf0.1 -> sf1 scale-stress sweep (SCALING_r14.md).

The r13 sweep script (tools/scale_sweep_r13.py) was written but its
outputs were never committed — this is that sweep, re-run at r14 code
with the round-14 addition folded in:

- the three round-13 queries (``dedup_signature_state``,
  ``bpe_tokenize_fixed``, ``stream_dedup_corpus``) plus the NEW
  round-14 ``stream_dedup_corpus_near`` (near-mode streaming corpus
  dedup: signature-state folds + banded joins + two stream startups
  across a restart boundary, timed from birth);
- the SIGNATURE-STATE LSM claim measured directly (the r12 census
  measurement, repeated for this round's table): folding a tiny crawl
  batch into a large signature state as an O(batch) delta vs the old
  O(state) full-table append+rewrite — the ratio is the point, and it
  grows unboundedly in the direction 100 TB pushes;
- probe numbers are READ FROM the committed bench record (r12 verdict
  item 5: the sweep re-measuring them is how SCALING_r12 and
  BENCH_r12_local came to disagree), pass its path as argv[2].

Timing protocol identical to r08-r13: full-column
``max(xxhash64(<every column>))`` materialization, one shared warmed
session, sf0.1 first.

Usage: python tools/scale_sweep_r14.py [sf1_dir] [bench_record.json]
       python tools/scale_sweep_r14.py --amplified-only
           (just the big-state fold A/B below — the sf1 signature
           table is ~50k rows, small enough that per-write fixed
           costs mask the O(state)-vs-O(batch) gap; the amplified
           block unions 20 id-shifted COPIES of the prebuilt
           signature frame into a ~1M-row state, the regime the LSM
           layout exists for, mirroring SCALING_r12's 5.8M-gram
           census A/B)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF1 = _pos[0] if len(_pos) > 0 else "/root/repo/testdata_sf1"
BENCH = _pos[1] if len(_pos) > 1 else "/root/repo/BENCH_r14_local.json"

QUERIES = [
    "dedup_signature_state",
    "bpe_tokenize_fixed",
    "stream_dedup_corpus",
    "stream_dedup_corpus_near",
]


def force_all_columns(df):
    from pyspark.sql import functions as F
    return df.agg(F.max(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()


def amplified_fold_ab(spark, out):
    """Big-state signature fold A/B at ~1M and ~5M rows: id-shifted
    copies of the sf1 signature frame (built ONCE, materialized to
    parquet, then amplified by FILE-BACKED scans — a lazy-frame union
    would recompute the shingle+minhash pipeline per copy and OOM the
    broadcast planner at the 100x point) seed both layouts, then one
    500-doc batch folds into each. The plain loop pays load + append
    + full-table rewrite (O(state) IO); the LSM fold pays the guard
    probe + an O(batch) delta write. This is the regime the versioned
    state exists for — the sf1-sized A/B in the main sweep is
    fixed-cost-bound at ~50k rows."""
    import tempfile

    from pyspark.sql import functions as F

    from caspr_spark.cache import cache_scope
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
    base = tempfile.mkdtemp(prefix="sig_sweep_big_")
    with cache_scope():
        save_history_keys(build_history_signatures(history),
                          f"{base}/seed")
    seed = spark.read.parquet(f"{base}/seed")
    for n_copies in (20, 100):
        tag = f"{n_copies}x"
        big = None
        for i in range(n_copies):
            c = seed.withColumn(
                "history_id",
                F.col("history_id") + F.lit(i * 10_000_000))
            big = c if big is None else big.unionByName(c)
        big.write.parquet(f"{base}/plain_{tag}")       # seed, untimed
        # seed the state layout with the SAME frame as its first
        # compact (fold_commit writes exactly build_history_signatures
        # output, so a direct parquet write of that frame is a valid
        # c1; Spark's _SUCCESS marker is the commit)
        spark.read.parquet(f"{base}/plain_{tag}") \
             .write.parquet(f"{base}/state_{tag}/c1")
        row = {"history_rows":
               spark.read.parquet(f"{base}/plain_{tag}").count(),
               "batch_docs": batch.count()}

        t0 = time.time()
        with cache_scope():
            s = load_history_keys(spark, f"{base}/plain_{tag}")
            save_history_keys(append_history_signatures(s, batch),
                              f"{base}/plain_{tag}_next")
        row["plain_rewrite_sec"] = round(time.time() - t0, 2)
        print(f"BIG({tag}) sig_state plain_rewrite "
              f"{row['plain_rewrite_sec']:8.2f}s", flush=True)

        t0 = time.time()
        with cache_scope():
            append_history_signatures_state(spark, f"{base}/state_{tag}",
                                            2, batch, compact_every=8)
        row["lsm_delta_sec"] = round(time.time() - t0, 2)
        print(f"BIG({tag}) sig_state lsm_delta     "
              f"{row['lsm_delta_sec']:8.2f}s", flush=True)
        out[f"signature_state_fold_amplified_{tag}"] = row


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
    if "--amplified-only" in sys.argv:
        amplified_fold_ab(spark, out)
        print(json.dumps(out))
        return
    for name in QUERIES:
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
    amplified_fold_ab(spark, out)

    # --- compact_corpus: read cost, many k-dirs vs one merge --------
    # The round-14 retention operator's claim is read-side: a corpus
    # sink that ran for months accumulates one parquet dir per batch,
    # and every full read pays per-dir listing + footer opens. 40
    # small k-dirs (the sink's own fold path, exact mode) vs the same
    # rows after compact_corpus(keep_last=0).
    from caspr_spark.streaming import (compact_corpus, dedup_corpus_sink,
                                       read_dedup_corpus)
    docs01 = spark.read.parquet(f"{SF01}/documents.parquet") \
                  .select("doc_id", "text")
    cc_base = tempfile.mkdtemp(prefix="cc_sweep_")
    sink = dedup_corpus_sink(f"{cc_base}/state", f"{cc_base}/out")
    for b in range(40):
        sink(docs01.filter(F.col("doc_id") % 40 == b), b + 1)
    crow = {"k_dirs": 40}
    t0 = time.time()
    crow["read_40_dirs_sec"] = None
    n_before = read_dedup_corpus(spark, f"{cc_base}/out").count()
    crow["read_40_dirs_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    compact_corpus(spark, f"{cc_base}/out", keep_last=0)
    crow["compact_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    n_after = read_dedup_corpus(spark, f"{cc_base}/out").count()
    crow["read_merged_sec"] = round(time.time() - t0, 2)
    assert n_before == n_after, (n_before, n_after)
    crow["rows"] = n_after
    out["compact_corpus_sf0.1"] = crow
    print(f"compact_corpus read 40 dirs {crow['read_40_dirs_sec']:6.2f}s"
          f"  merged {crow['read_merged_sec']:6.2f}s"
          f"  (compact {crow['compact_sec']:6.2f}s)", flush=True)

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
