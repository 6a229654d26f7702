"""Profile emb_near_dup variants in bench context (after simsearch warmup).
Usage: python tools/ab_lsh2.py [sf_dir]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as em  # noqa: E402
from caspr_spark.llm import similarity as S  # noqa: E402

# bench-like preamble
em.queries()["simsearch_topk_lsh"](spark, sf_dir).count()

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def t(label, fn):
    t0 = time.time()
    n = fn().count()
    c = time.time() - t0
    t0 = time.time()
    fn().count()
    w = time.time() - t0
    print(f"{label:16s} rows={n} cold={c:.2f} warm={w:.2f}", flush=True)


t("packed", lambda: S.embedding_near_duplicates(
    emb, threshold=0.45, n_planes=4, n_tables=12, packed=True))
t("array", lambda: S.embedding_near_duplicates(
    emb, threshold=0.45, n_planes=4, n_tables=12, packed=False))
t("packed2", lambda: S.embedding_near_duplicates(
    emb, threshold=0.45, n_planes=4, n_tables=12, packed=True))
t("array2", lambda: S.embedding_near_duplicates(
    emb, threshold=0.45, n_planes=4, n_tables=12, packed=False))

df = S.embedding_near_duplicates(emb, threshold=0.45, n_planes=4,
                                 n_tables=12, packed=True)
df.explain("formatted")
spark.stop()
