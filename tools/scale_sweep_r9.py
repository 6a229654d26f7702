"""Round-9 sf0.1 -> sf1 scale-stress sweep.

Covers (a) the full streaming-operator suite — last stress-swept in
SCALING_r06, re-certified green through the r8/r9 driver windows but
never re-stressed since (VERDICT r8 item 7) — and (b) the round-9
REWORKED hot paths: the world_size-bounded joint-DEC fold, the new
end-to-end segment_dec_chain, the cursor-sliced SGD minibatch kernel,
the decimal-exact bounded-exchange ROC-AUC, and the layer-merging
cm_estimate. The operators round 9 newly ADDED (dsir_select, the
substring-span family, the distributed-ntile e10 path) were not in
this list — tools/scale_sweep_r10.py stress-sweeps them at sf1
(SCALING_r10.md), timed with a full-column aggregate so count()-only
column pruning can't flatter the census legs.

One shared warmed session; each query runs once per SF, sf0.1 first,
so the sf1 column is the cleaner per-query signal (same protocol as
SCALING_r08.md). Prints one line per (query, sf) plus a JSON summary.

Usage: python tools/scale_sweep_r9.py [sf1_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"

STREAMING = [
    "stream_sessions", "stream_anomaly", "stream_topk",
    "stream_dedup_history", "stream_windowed_stats", "stream_last3_state",
    "stream_dedup", "stream_static_join", "w5_sessionize",
    "stream_stream_join",
]
ROUND9 = [
    "metrics_roc_auc", "cm_frequency_rollup", "train_ae_sgd",
    "segment_dec_joint", "segment_dec_chain",
]


def main():
    import __spark_entry__ as em
    from caspr_spark import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()

    # warmup: parquet scan + shuffle + a pandas UDF so JVM/Python workers
    # and Arrow paths are alive before the first timed row
    from pyspark.sql import functions as F
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    emb.groupBy((F.crc32(F.col("vec_id").cast("string")) % 8)
                .alias("g")).count().collect()

    out = {}
    for name in STREAMING + ROUND9:
        out[name] = {}
        for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            dt = round(time.time() - t0, 2)
            out[name][sf_label] = {"sec": dt, "rows": n}
            print(f"{name:28s} {sf_label:6s} rows={n:>9d} {dt:8.2f}s",
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
