"""Round-15 scale sweep (SCALING_r15.md): measure the DPP claim.

Two parts, closing r14 verdict item 1:

1. **The ``partition_by_cell`` A/B** — the one r14 scale property that
   was plan-verified but never measured: ``append_ivf_state(...,
   partition_by_cell=True)`` hive-partitions each frame on
   ``ivf_cell`` so a probe search's broadcast join fires dynamic
   partition pruning and reads only its cells' files
   (llm/similarity.py, the claim under test). Here an AMPLIFIED index
   (id-shifted file-backed copies of the assigned sf1 embeddings —
   the SCALING_r14 amplification discipline: the seed assignment is
   computed ONCE and materialized, copies are parquet scans, never
   lazy recomputes) seeds BOTH layouts as their first compact, and the
   same ``cosine_topk_ivf_state`` probe runs against each at ~1M and
   ~5M vectors. Reported per layout: probe wall-clock (3 runs), the
   ground-truth bytes a pruned scan touches (filesystem listing of the
   probed cells' partition dirs vs the whole frame), and whether the
   executed plan actually contains a dynamic-pruning partition filter.
   64 cells / ``n_probe=4`` / 4 queries ≈ 16 of 64 cells probed — the
   realistic regime where pruning pays (8 cells at sf0.01 is the
   CORRECTNESS shape, not the scale shape).

2. **sf0.1 -> sf1 sweep of the three unswept r14 rows**
   (``simsearch_ivf_state``, ``stream_ann_index``,
   ``decontaminate_state``) plus the NEW r15 tombstone row
   (``simsearch_ivf_deleted``), timing protocol identical to
   r08-r14: full-column ``max(xxhash64(*))`` materialization, one
   shared warmed session, sf0.1 first.

Usage: python tools/scale_sweep_r15.py [sf1_dir]
       python tools/scale_sweep_r15.py --dpp-only      (part 1 only)
       python tools/scale_sweep_r15.py --queries-only  (part 2 only)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF1 = _pos[0] if len(_pos) > 0 else "/root/repo/testdata_sf1"

QUERIES = [
    "simsearch_ivf_state",
    "stream_ann_index",
    "decontaminate_state",
    "simsearch_ivf_deleted",
    "simsearch_pq_state",
]

ID_STRIDE = 10_000_000


def force_all_columns(df):
    from pyspark.sql import functions as F
    return df.agg(F.max(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()


def _dir_bytes(root):
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def dpp_ab(spark, out):
    from pyspark.sql import functions as F

    from caspr_spark.cache import cache_scope
    from caspr_spark.llm.similarity import (_centroid_fingerprint,
                                            cosine_topk_ivf_state,
                                            nearest_centroid)
    import tempfile

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet") \
               .select("vec_id", "embedding")
    # 64 pinned centroids: the first 64 corpus vectors by id — any
    # deterministic quantizer works, the A/B measures layout not recall
    cents = [[float(v) for v in r.embedding]
             for r in emb.orderBy("vec_id").limit(64).collect()]
    fp = _centroid_fingerprint(cents)

    base = tempfile.mkdtemp(prefix="ivf_dpp_")
    # one-time assignment of the 20k seed, materialized (untimed)
    seed_path = f"{base}/seed"
    with cache_scope():
        emb.select("vec_id", "embedding",
                   nearest_centroid("embedding", cents).alias("ivf_cell"),
                   F.lit(fp).alias("centroid_fp")) \
           .write.parquet(seed_path)
    seed = spark.read.parquet(seed_path)

    n_probe, k = 4, 10
    # two probe shapes: a 4-query batch (the certified row's shape —
    # ~16 of 64 cells) and a single-query point lookup (the online
    # probe DPP exists for — ~4 of 64 cells)
    from caspr_spark.llm.similarity import _cell_distance_structs

    def probed_cells_of(qdf):
        rows = (qdf.select(
            F.explode(F.slice(F.array_sort(
                _cell_distance_structs("embedding", cents)), 1, n_probe))
            .alias("s")).select(F.col("s.cell").alias("c")).distinct()
            .collect())
        return sorted(r.c for r in rows)

    shapes = [("batch4", emb.filter(F.col("vec_id") < 4)),
              ("point1", emb.filter(F.col("vec_id") == 7))]

    for n_copies in (50, 250):          # ~1M / ~5M vectors
        tag = f"{n_copies}x"
        big = None
        for i in range(n_copies):
            c = seed.withColumn("vec_id",
                                F.col("vec_id") + F.lit(i * ID_STRIDE))
            big = c if big is None else big.unionByName(c)
        big = big.repartition("ivf_cell")
        plain_dir = f"{base}/plain_{tag}"
        part_dir = f"{base}/part_{tag}"
        # seed both layouts with the SAME frame as their first compact
        # (fold_commit writes exactly this frame; _SUCCESS is the
        # commit marker) — the r14 sweep's seeding discipline
        big.write.parquet(f"{plain_dir}/c1")
        big.write.partitionBy("ivf_cell").parquet(f"{part_dir}/c1")

        total_b = _dir_bytes(f"{part_dir}/c1")
        n_rows = spark.read.parquet(f"{plain_dir}/c1").count()
        for shape, queries in shapes:
            probed_cells = probed_cells_of(queries)
            probed_b = sum(_dir_bytes(f"{part_dir}/c1/ivf_cell={c}")
                           for c in probed_cells
                           if os.path.isdir(f"{part_dir}/c1/ivf_cell={c}"))
            row = {"index_rows": n_rows, "n_cells": 64,
                   "n_probe": n_probe, "shape": shape,
                   "cells_probed": len(probed_cells),
                   "frame_bytes": total_b,
                   "probed_cells_bytes": probed_b,
                   "bytes_fraction": round(probed_b / total_b, 4)}
            for label, d in (("plain", plain_dir),
                             ("partitioned", part_dir)):
                runs = []
                plan_has_dpp = None
                for _ in range(3):
                    t0 = time.time()
                    with cache_scope():
                        # static_prune=False pins the DYNAMIC path —
                        # the A/B SCALING_r15 documents (the static
                        # default landed after this measurement and is
                        # A/B'd separately there)
                        res = cosine_topk_ivf_state(spark, d, queries,
                                                    k=k, n_probe=n_probe,
                                                    centroids=cents,
                                                    static_prune=False)
                        res.collect()
                    runs.append(round(time.time() - t0, 2))
                    if plan_has_dpp is None:
                        plan = res._jdf.queryExecution().executedPlan() \
                                  .toString()
                        plan_has_dpp = "dynamicpruning" in plan.lower()
                row[f"{label}_probe_sec"] = runs
                row[f"{label}_probe_median_sec"] = sorted(runs)[1]
                row[f"{label}_plan_has_dpp"] = bool(plan_has_dpp)
                print(f"DPP({tag}/{shape}) {label:12s} probe "
                      f"{sorted(runs)[1]:7.2f}s  runs={runs} "
                      f"dpp={plan_has_dpp}", flush=True)
            row["speedup"] = round(row["plain_probe_median_sec"]
                                   / row["partitioned_probe_median_sec"],
                                   2)
            print(f"DPP({tag}/{shape}) bytes {probed_b/1e6:.1f} of "
                  f"{total_b/1e6:.1f} MB ({row['bytes_fraction']:.1%}), "
                  f"speedup {row['speedup']}x", flush=True)
            out[f"ivf_dpp_ab_{tag}_{shape}"] = row


def main():
    import __spark_entry__ as em
    from caspr_spark import get_spark
    from caspr_spark.cache import cache_scope

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F
    spark.range(1_000_000).groupBy((F.col("id") % 8).alias("g")) \
         .count().collect()

    out = {}
    if "--queries-only" not in sys.argv:
        dpp_ab(spark, out)
    if "--dpp-only" not in sys.argv:
        qs = em.queries()
        for name in QUERIES:
            out[name] = {}
            for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
                t0 = time.time()
                with cache_scope():
                    force_all_columns(qs[name](spark, sf_dir))
                dt = round(time.time() - t0, 2)
                out[name][sf_label] = {"sec": dt}
                print(f"{name:28s} {sf_label:6s} {dt:8.2f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
