"""Measure the portable hash family's honest cost vs the fast default.

MinHash: same corpus, same parameterization (16 hashes x 8 bands,
shingle 3, threshold 0.2, verify on), both SFs; the only delta is the
hash family (xxhash64 + hashed band keys vs md5-60-bit + raw-string
band keys). SimHash: full fingerprint table, 60 bits both families so
the vote width is identical. Timed via the full-column protocol.
Feeds the SCALING_r11.md addendum: the portable families buy
engine-exact auditability, and this records what that costs.

Usage: python tools/minhash_family_cost.py [sf1_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"


def main():
    from caspr_spark import get_spark
    from caspr_spark.cache import cache_scope
    from caspr_spark.llm.dedup import minhash_lsh_dedup
    from pyspark.sql import functions as F

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # warm the session
    spark.range(1000).groupBy((F.col("id") % 8).alias("g")).count().collect()

    from caspr_spark.llm.dedup import simhash

    out = {}
    for sf_label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                    .select("doc_id", "text")
        out[sf_label] = {}
        # two rounds; report the warm (second) one — the cold first run
        # absorbs per-plan codegen compile and flattered the portable
        # family in the first cut of this tool
        for rnd in (1, 2):
            for family in ("fast", "portable"):
                t0 = time.time()
                with cache_scope():
                    _, pairs = minhash_lsh_dedup(
                        docs, "doc_id", "text", num_hashes=16, bands=8,
                        shingle_size=3, threshold=0.2, hash_family=family)
                    pairs.agg(F.max(F.xxhash64("id_a", "id_b", "jaccard"))) \
                         .collect()
                dt = round(time.time() - t0, 2)
                t0 = time.time()
                with cache_scope():
                    simhash(docs, bits=60, hash_family=family) \
                        .agg(F.max(F.xxhash64("doc_id", "simhash"))).collect()
                dt_sh = round(time.time() - t0, 2)
                if rnd == 2:
                    out[sf_label][family] = {"minhash": dt, "simhash": dt_sh}
                    print(f"{sf_label:6s} {family:9s} minhash {dt:7.2f}s  "
                          f"simhash {dt_sh:7.2f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
