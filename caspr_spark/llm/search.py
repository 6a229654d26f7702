"""Keyword search over a document corpus: TF-IDF / BM25 ranking.

A training-data pipeline needs targeted corpus probes ("show me the
documents about X") long before it needs a serving stack; BM25 over a
tokenized corpus is the standard answer and maps cleanly onto Spark
aggregations:

1. tokenize + explode → (doc, term) postings, **filtered to the query
   terms before any shuffle** (predicate on the exploded term pushes the
   row-multiplication down to only matching postings),
2. per-(doc, term) term frequencies — one keyed agg, map-side combined,
3. per-term document frequencies — an agg over the tiny tf relation,
4. corpus stats (N, avgdl) — a single global agg, broadcast back,
5. the BM25 formula as pure column arithmetic; top-k via row_number
   with a deterministic doc-id tie-break.

Everything is native `pyspark.sql.functions`; the only data-sized
shuffle is the postings agg keyed by (doc, term) over query terms only.
At 100 TB the postings for a handful of query terms are a vanishingly
small fraction of the corpus, and the df/stats relations are bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.

    Okapi BM25 with the standard "+1" idf smoothing (Lucene flavor):
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``, score summed over query
    terms of ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.

    Returns (id, score, rank) — rank 1..k ordered by rounded score desc
    then id asc, so results are deterministic under float ties.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = [t.lower() for t in terms]
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")

    lengths = docs.select(F.col(id_col), F.size(words).alias("dl"))
    # dl rides along in the postings so tf never joins back to the
    # corpus-sized lengths relation; the exploded rows are filtered to the
    # query terms BEFORE the aggregation shuffle.
    postings = (docs.select(F.col(id_col), F.size(words).alias("dl"),
                            F.explode(words).alias("term"))
                    .filter(F.col("term").isin(terms)))
    tf = postings.groupBy(id_col, "term").agg(F.count("*").alias("tf"),
                                              F.first("dl").alias("dl"))
    df_ = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    stats = lengths.agg(F.count("*").alias("n_docs"),
                        F.avg("dl").alias("avgdl"))

    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom

    scored = (tf.join(F.broadcast(df_), on="term")
                .crossJoin(F.broadcast(stats))
                .groupBy(id_col)
                .agg(F.round(F.sum(contrib), 6).alias("score")))
    # orderBy+limit plans TakeOrderedAndProject (per-partition top-k then a
    # k-row merge on the driver) — never a global single-task sort. The
    # row_number window then runs over only k rows.
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w))
