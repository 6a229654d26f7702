"""Round-11 sf0.1 -> sf1 scale-stress sweep (SCALING_r11.md).

Covers the operators the round-11 code deltas touched:

- the two SKEW-FIXED plans — ``dedup_keep_best`` (per-component
  row_number election -> map-side-combinable min-struct aggregate +
  join-back) and ``seq_pack_offset`` (per-group ordered window ->
  three-phase distributed prefix scan),
- the rank==1 election work — ``lpa_docs`` (label election converted
  to a min-struct aggregate) and ``profile_table`` (modal top-1 kept,
  WindowGroupLimit partial pinned in-plan),
- the two NEW round-11 operators — ``stream_gram_census`` (the
  streaming census fold) and ``dsir_shared_grams`` (DSIR fed from
  persisted n=1/n=2 gram tables).

Timing protocol: full-column ``max(xxhash64(<every column>))``
materialization, same as the r10 sweep (count() lets Spark prune
columns the operator claims to produce).

A second section stress-tests the two skew fixes directly:

- hot-CLUSTER keep_best: a synthetic pairs graph where ONE near-dup
  component spans ``mult`` documents (a template page at web scale) —
  the shape whose election previously funneled into a single window
  task — at two multiplicities, to show flat-to-linear scaling.
- hot-GROUP pack_sequences_offset: one group owning ~85% of the
  corpus (English on a web tape), at two sizes.

A third section measures the dsir gram-table reuse delta (verdict
item 6's done-criterion): dsir_select re-tokenizing raw text vs
dsir_select fed ALREADY-PERSISTED n=1/n=2 gram tables — the marginal
cost a curation pipeline pays for DSIR once the span census has built
the tables. The table-build cost is excluded from the fed timing
because the pipeline pays it ONCE for census+decontamination+DSIR
(that sharing is the point); the build cost is reported separately so
the ledger is honest.

One shared warmed session; sf0.1 first (same protocol as r08-r10).

Usage: python tools/scale_sweep_r11.py [sf1_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"

ROUND11 = [
    "dedup_keep_best",
    "seq_pack_offset",
    "lpa_docs",
    "profile_table",
    "stream_gram_census",
    "dsir_select",
    "dsir_shared_grams",
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
    for name in ROUND11:
        out[name] = {}
        for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.time()
            with cache_scope():
                force_all_columns(qs[name](spark, sf_dir))
            dt = round(time.time() - t0, 2)
            out[name][sf_label] = {"sec": dt}
            print(f"{name:24s} {sf_label:6s} {dt:8.2f}s", flush=True)

    # --- hot-cluster keep_best stress -------------------------------
    # One component spanning `mult` docs: a star pairs graph
    # (0 -- i for all i) collapses to one connected component; quality
    # favors the highest id so the election cannot shortcut on id
    # order. Previously every member funneled into ONE window task;
    # the min-struct aggregate partial-combines per input partition.
    from caspr_spark.llm.dedup import dedup_keep_best
    for mult in (50_000, 200_000):
        docs = (spark.range(mult)
                .select(F.col("id").alias("doc_id"),
                        F.col("id").cast("double").alias("quality")))
        pairs = (spark.range(1, mult)
                 .select(F.lit(0).cast("long").alias("id_a"),
                         F.col("id").alias("id_b")))
        t0 = time.time()
        with cache_scope():
            kept = dedup_keep_best(docs, pairs, quality_col="quality",
                                   id_col="doc_id")
            n = kept.count()
        dt = round(time.time() - t0, 2)
        assert n == 1, n  # the whole corpus is one component
        out[f"skew_hotcluster_{mult}"] = {"keep_best_sec": dt}
        print(f"skew hot-cluster x{mult:>7d}  keep_best {dt:6.2f}s",
              flush=True)

    # --- hot-group pack_sequences_offset stress ---------------------
    # One group owns ~85% of rows (English on a web corpus). The old
    # plan put the whole hot tape in one window task; the prefix scan
    # keys every window on __pid.
    from caspr_spark.llm.mixture import pack_sequences_offset
    for mult in (500_000, 2_000_000):
        docs = (spark.range(mult)
                .select(F.col("id").alias("doc_id"),
                        F.when(F.col("id") % 100 < 85, F.lit("en"))
                         .otherwise(F.concat(F.lit("l"),
                                             (F.col("id") % 100)
                                             .cast("string")))
                         .alias("lang"),
                        (F.col("id") % 300 + 10).alias("n_tok")))
        t0 = time.time()
        with cache_scope():
            packed = pack_sequences_offset(docs, "n_tok", 512,
                                           group_cols=["lang"])
            force_all_columns(packed)
        dt = round(time.time() - t0, 2)
        out[f"skew_hotgroup_{mult}"] = {"pack_offset_sec": dt}
        print(f"skew hot-group  x{mult:>7d}  pack_offset {dt:6.2f}s",
              flush=True)

    # --- dsir gram-table reuse delta --------------------------------
    # raw path: dsir_select tokenizes+hashes text twice (uni + bi).
    # fed path: the SAME md5s come from persisted gram tables the span
    # census already built. Build cost reported separately (paid once
    # per pipeline, amortized over census+decontamination+DSIR).
    from caspr_spark.cache import register_cache
    from caspr_spark.llm.dedup import gram_table
    from caspr_spark.llm.mixture import dsir_select
    for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                    .select("doc_id", "text", "lang")
        target = docs.filter(F.col("lang") == "en")
        t0 = time.time()
        with cache_scope():
            raw = dsir_select(docs, target, k=100, n_buckets=256,
                              include_bigrams=True, seed=42)
            force_all_columns(raw)
        t_raw = round(time.time() - t0, 2)
        with cache_scope():
            t0 = time.time()
            uni = register_cache(gram_table(docs, n=1).persist())
            bi = register_cache(gram_table(docs, n=2).persist())
            uni.count(), bi.count()
            t_build = round(time.time() - t0, 2)
            t0 = time.time()
            fed = dsir_select(docs, target, k=100, n_buckets=256,
                              include_bigrams=True, seed=42,
                              raw_grams_uni=uni, raw_grams_bi=bi)
            force_all_columns(fed)
            t_fed = round(time.time() - t0, 2)
        out[f"dsir_reuse_{sf_label}"] = {
            "raw_text_sec": t_raw, "fed_from_tables_sec": t_fed,
            "table_build_sec": t_build}
        print(f"dsir reuse {sf_label:6s}  raw {t_raw:6.2f}s  "
              f"fed {t_fed:6.2f}s  (+build {t_build:6.2f}s, paid once "
              f"per pipeline)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
