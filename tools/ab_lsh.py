"""A/B the packed vs array LSH layouts under bench-like conditions:
one session, JVM/Python-worker warmup first, then time the FIRST
execution of each variant (bench.py's 'cold') and a second ('warm').
Usage: python tools/ab_lsh.py {ap|pa} [sf_dir]  (order of variants)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

order = sys.argv[1] if len(sys.argv) > 1 else "ap"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F  # noqa: E402

from caspr_spark.llm.similarity import (  # noqa: E402
    _pair_cosine, embedding_near_duplicates)

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
# warmup: parquet scan + shuffle + pandas UDF so Python workers are alive
emb.withColumn("c", _pair_cosine(F.col("embedding"), F.col("embedding"))) \
   .groupBy((F.col("vec_id") % 7).alias("g")).count().collect()


def run(packed):
    t0 = time.time()
    n = embedding_near_duplicates(emb, threshold=0.45, n_planes=4,
                                  n_tables=12, packed=packed).count()
    cold = time.time() - t0
    t0 = time.time()
    embedding_near_duplicates(emb, threshold=0.45, n_planes=4,
                              n_tables=12, packed=packed).count()
    warm = time.time() - t0
    label = "PKD" if packed else "ARR"
    print(f"{label} rows={n} cold={cold:.2f} warm={warm:.2f}", flush=True)


for ch in order:
    run(ch == "p")
spark.stop()
