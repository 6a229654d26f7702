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

from caspr_spark.cache import register_cache


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


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             rank_col: str = "rank", k0: int = 60,
             topk: int | None = None) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval rankings (Cormack et al.):
    ``rrf = Σ_r 1/(k0 + rank_r)`` over the rankings that returned the
    document. The standard way to combine a lexical (BM25) and a dense
    (embedding ANN) retriever without score calibration — ranks are
    comparable even when scores aren't.

    Each input carries (id, rank). Returns (id, rrf_score, n_lists,
    rank) — ``n_lists`` = how many rankings contained the doc, ``rank``
    = 1.. by fused score (doc-id tie-break). The union is candidate-
    sized (Σ k_i rows, not corpus-sized), so the fuse is a single tiny
    keyed agg no matter how large the corpus behind the retrievers is.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [r.select(F.col(id_col),
                      (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col)))
                      .alias("__contrib"))
             for r in rankings]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (u.groupBy(id_col)
              .agg(F.round(F.sum("__contrib"), 9).alias("rrf_score"),
                   F.count("*").alias("n_lists")))
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    out = fused.withColumn("rank", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("rank") <= topk)
    return out


_FX = 10 ** 9  # fixed-point scale: engine-portable exact accumulation


def tfidf_weights(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_df: int | float | None = None) -> DataFrame:
    """Sparse TF-IDF document vectors as a (doc, term, weight) relation.

    ``weight = tf · (ln((N+1)/(df+1)) + 1)`` with raw term counts —
    integer tf and a per-term idf from single ``ln`` calls, so every
    weight is a deterministic double (no float accumulation anywhere;
    the norm consumers need is computed downstream in fixed point).
    ``max_df`` drops corpus-boilerplate terms before anything else — at
    web scale a term in half the corpus adds no signal and quadratic
    join fan-out.

    The sparse relation IS the representation: at 100 TB a dense
    vocabulary vector per doc is impossible, while (doc, term, w) rows
    partition, join, and aggregate like any other table.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
         .alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.countDistinct(id_col).alias("n_docs"))
    if max_df is not None:
        if isinstance(max_df, float):
            # fractional cap scales with the corpus — an absolute cap
            # tuned on a sample silently drops the whole vocabulary when
            # the corpus grows 10x
            if not 0.0 < max_df <= 1.0:
                raise ValueError(f"fractional max_df must be in (0, 1], "
                                 f"got {max_df}")
            df_ = (df_.crossJoin(F.broadcast(stats))
                   .filter(F.col("df")
                           <= F.ceil(F.lit(max_df) * F.col("n_docs")))
                   .select("term", "df"))
        else:
            df_ = df_.filter(F.col("df") <= max_df)
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    # the df relation is vocabulary-sized — under Zipf the rare tail IS
    # the vocabulary, so no broadcast hint: AQE broadcasts it when small
    # and plans a shuffle join when it isn't
    return (tf.join(df_, on="term")
              .crossJoin(F.broadcast(stats))
              .select(id_col, "term",
                      (F.col("tf") * idf).alias("weight")))


def related_documents(docs: DataFrame, k: int = 5, id_col: str = "doc_id",
                      text_col: str = "text",
                      max_df: int | float | None = 0.1,
                      min_cosine: float = 0.0) -> DataFrame:
    """Top-``k`` most similar documents per document by TF-IDF cosine.

    The related-content / more-like-this retrieval primitive, computed
    corpus-wide: documents pair through SHARED TERMS only (an inverted-
    index self-join — never an all-pairs product), per-pair dot products
    and per-doc norms accumulate as 1e-9 fixed-point BIGINTs (exact
    integer sums, immune to accumulation-order drift), and the top-k per
    document is a window over the scored pairs. ``max_df`` bounds the
    join fan-out: a term shared by m docs contributes m² pair rows, so
    boilerplate terms are dropped — same hot-key discipline as
    ``winnow_pairs``/``decontaminate``.
    """
    # persisted because the weights relation feeds three consumers
    # (norms + both join sides); lives until LRU eviction, same contract
    # as the persisted shingles/buckets in dedup.py / similarity.py —
    # loop callers scope the lifetime with caspr_spark.cache_scope()
    w = register_cache(
        tfidf_weights(docs, id_col, text_col, max_df).persist())
    # Fixed-point accumulation overflows silently (Spark wraps longs) if
    # any single weight² · 1e9 approaches 2^63 — a degenerate doc with a
    # term at tf ≈ 1e4 gets there. Guard loudly with a 1e4-term headroom
    # budget; cost is one agg over the already-persisted weights.
    max_w = w.agg(F.max(F.abs(F.col("weight")))).first()[0] or 0.0
    if max_w * max_w * _FX > (1 << 62) / 1e4:
        raise ValueError(
            f"max |tf-idf weight| {max_w:.1f} would overflow the 1e-9 "
            "fixed-point accumulators; cap term frequency upstream (clip "
            "tf, drop degenerate documents) or lower max_df")
    fx = F.round(F.col("weight") * F.col("weight") * _FX).cast("long")
    norms = (w.withColumn("__w2", fx)
              .groupBy(id_col).agg(F.sum("__w2").alias("__n2fx"))
              .select(id_col,
                      F.sqrt(F.col("__n2fx") / float(_FX)).alias("__norm")))
    a = w.select(F.col(id_col).alias("id_a"), "term",
                 F.col("weight").alias("__wa"))
    b = w.select(F.col(id_col).alias("id_b"), "term",
                 F.col("weight").alias("__wb"))
    dots = (a.join(b, on="term")
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("__pfx", F.round(F.col("__wa") * F.col("__wb")
                                          * _FX).cast("long"))
             .groupBy("id_a", "id_b")
             .agg(F.sum("__pfx").alias("__dotfx")))
    na = norms.select(F.col(id_col).alias("id_a"),
                      F.col("__norm").alias("__na"))
    nb = norms.select(F.col(id_col).alias("id_b"),
                      F.col("__norm").alias("__nb"))
    sym = (dots.join(na, "id_a").join(nb, "id_b")
               .withColumn("cosine", F.round(
                   (F.col("__dotfx") / float(_FX))
                   / (F.col("__na") * F.col("__nb")), 6))
               .filter(F.col("cosine") >= min_cosine)
               .select("id_a", "id_b", "cosine"))
    # both directions so every doc ranks its neighbors
    both = sym.union(sym.select(F.col("id_b").alias("id_a"),
                                F.col("id_a").alias("id_b"), "cosine"))
    rk = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(),
                                            F.col("id_b").asc())
    return (both.withColumn("rank", F.row_number().over(rk))
                .filter(F.col("rank") <= k)
                .select(F.col("id_a").alias(id_col),
                        F.col("id_b").alias("related_id"), "cosine",
                        "rank"))
