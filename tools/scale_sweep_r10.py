"""Round-10 sf0.1 -> sf1 scale-stress sweep (SCALING_r10.md).

Covers the operators the round-10 code deltas touched plus the round-9
additions the r9 sweep list omitted (its docstring now says so):

- the two SKEW-FIXED elections — ``trim_duplicated_spans`` and
  ``clean_paragraph_dedup`` (content-hash keep-first windows replaced
  by map-side-combinable min-struct aggregates),
- the rest of the span family (``duplicated_spans``,
  ``contamination_fraction`` — the latter now carrying the broadcast
  size guard) and the new shared-gram composition
  ``span_shared_grams``,
- ``dsir_select`` and the distributed-ntile ``e10_quantile_bucket``
  path, never sf1-stressed before,
- ``decontaminate`` (size-guarded broadcast).

Timing protocol: every query is forced through a FULL-COLUMN aggregate
(``max(xxhash64(<every column>))``) instead of ``count()`` — the r9
sweep's census timings carried a count()-pruning caveat (Spark prunes
columns a count never reads, so e.g. the trimmed text rebuild was
never actually executed); hashing every output column makes the timed
work the honest full-operator cost at both SFs.

A second section stress-tests the skew fix directly: a synthetic
corpus where ONE paragraph (and its 8-grams) appears in 200k documents
— the hot-key shape that previously funneled into a single window
task — run through both fixed operators at two hot-key multiplicities
to show the scaling stays flat-to-linear, never key-bound.

One shared warmed session; sf0.1 first, so the sf1 column is the
cleaner per-query signal (same protocol as SCALING_r08/r09).

Usage: python tools/scale_sweep_r10.py [sf1_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"

ROUND10 = [
    "trim_duplicated_spans",
    "clean_paragraph_dedup",
    "duplicated_spans",
    "contamination_fraction",
    "span_shared_grams",
    "span_census_incremental",
    "span_trim_incremental",
    "dsir_select",
    "e10_quantile_bucket",
    "decontaminate",
    # late round-10 addition: the LR trainer's per-epoch bias+bucket
    # gradient merge (one aggregation job per epoch instead of two)
    "quality_train_classifier",
]


def force_all_columns(df):
    """Materialize EVERY output column: max(xxhash64(*cols)) cannot be
    column-pruned, so the timed run pays the full operator (text
    rebuilds included), unlike count()."""
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
    for name in ROUND10:
        out[name] = {}
        for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.time()
            with cache_scope():
                force_all_columns(qs[name](spark, sf_dir))
            dt = round(time.time() - t0, 2)
            out[name][sf_label] = {"sec": dt}
            print(f"{name:28s} {sf_label:6s} {dt:8.2f}s", flush=True)

    # hot-key skew stress: one paragraph / one 8-gram shared by `mult`
    # docs — the exact shape the aggregate election fixes. Per-doc
    # unique tails keep the corpus realistic (the hot unit is a small
    # fraction of tokens, as boilerplate is).
    from caspr_spark.llm.clean import paragraph_dedup
    from caspr_spark.llm.dedup import trim_duplicated_spans
    hot_p = "please accept our cookie policy before continuing to the site"
    for mult in (50_000, 200_000):
        docs = (spark.range(mult)
                .select(F.col("id").alias("doc_id"),
                        F.concat(F.lit(hot_p + "\n\nunique passage "),
                                 F.col("id").cast("string"),
                                 F.lit(" tail words here "),
                                 F.col("id").cast("string"))
                        .alias("text")))
        t0 = time.time()
        with cache_scope():
            force_all_columns(paragraph_dedup(docs))
        t_pd = round(time.time() - t0, 2)
        t0 = time.time()
        with cache_scope():
            force_all_columns(trim_duplicated_spans(docs, n=8))
        t_tr = round(time.time() - t0, 2)
        out[f"skew_hotkey_{mult}"] = {"paragraph_dedup_sec": t_pd,
                                      "trim_spans_sec": t_tr}
        print(f"skew hot-key x{mult:>7d}  paragraph_dedup {t_pd:6.2f}s  "
              f"trim_spans {t_tr:6.2f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
