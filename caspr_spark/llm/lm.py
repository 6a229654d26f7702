"""N-gram language-model quality scoring (CCNet-style perplexity filter).

The classic web-corpus quality signal: fit a smoothed bigram model on a
reference corpus, score every document by per-token cross-entropy, and
filter/bucket on the resulting pseudo-perplexity — boilerplate and
gibberish score high, fluent prose low. Here the model is fit AND applied
distributed: counts live in DataFrames (vocabulary never collected to the
driver), scoring is a token-explode + two count joins + one exact
integer aggregation.

Engine-portability: per-token log-probabilities are rounded to 9 decimals
and summed as scaled BIGINTs, so the per-document sum is exact integer
arithmetic — immune to the float accumulation-order drift that otherwise
makes distributed sums disagree across engines/partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 10 ** 9  # fixed-point scale for exact log-prob accumulation


def _tokens(text_col: str):
    """Lowercased whitespace tokens with begin-of-doc sentinel."""
    return F.concat(
        F.array(F.lit("<s>")),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))


def _bigram_pairs(df: DataFrame, text_col: str,
                  id_col: str | None = None) -> DataFrame:
    """(w1, w2) bigram rows — self-zip inside the token array, no
    positional self-join. One definition shared by fit and score so the
    two can never silently disagree on pair construction."""
    t = _tokens(text_col)
    zipped = F.explode(F.arrays_zip(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1))).alias("__bg")
    cols = ([F.col(id_col)] if id_col else []) + [zipped]
    out = df.select(*cols)
    keep = ([id_col] if id_col else [])
    return out.select(*keep, F.col("__bg.0").alias("w1"),
                      F.col("__bg.1").alias("w2"))


def fit_bigram_model(df: DataFrame, text_col: str = "text"
                     ) -> tuple[DataFrame, DataFrame, int]:
    """Fit corpus bigram/unigram counts.

    Returns ``(unigrams, bigrams, vocab_size)``: two count DataFrames
    (``w, c_uni`` and ``w1, w2, c_bi``) and the context vocabulary size
    used by add-one smoothing. Both aggregations map-side combine; the
    model stays distributed — at web scale the bigram table is billions
    of rows and is exactly what a join (not a broadcast) is for. The
    unigram relation is persisted: the sizing ``count()`` is an eager
    action and scoring joins the same relation again — without the
    persist the corpus scan + explode + agg would run twice (LRU-lived,
    like the other fitted-state caches in this package).
    """
    toks = df.select(F.explode(_tokens(text_col)).alias("w"))
    unigrams = (toks.groupBy("w")
                .agg(F.count(F.lit(1)).alias("c_uni")).persist())
    bigrams = _bigram_pairs(df, text_col).groupBy("w1", "w2") \
        .agg(F.count(F.lit(1)).alias("c_bi"))
    vocab = unigrams.count()
    return unigrams, bigrams, vocab


def score_perplexity(df: DataFrame, unigrams: DataFrame, bigrams: DataFrame,
                     vocab_size: int, id_col: str = "doc_id",
                     text_col: str = "text",
                     out_col: str = "perplexity") -> DataFrame:
    """Per-document bigram pseudo-perplexity under add-one smoothing.

    p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V); the document score is
    exp(−mean log p) over its bigrams. Unseen bigrams fall back to the
    smoothing floor via left joins (c_bi -> 0, c_uni -> 0), so scoring a
    NEW corpus against a fitted model needs no special casing.

    Scale shape: explode to bigram rows, two hash joins against the count
    relations (AQE handles the hot-token skew; the count side has one row
    per gram), then ONE groupBy on the doc id summing 1e-9-rounded
    log-probs as exact integers.
    """
    pairs = _bigram_pairs(df, text_col, id_col)
    scored = (pairs
              .join(bigrams, on=["w1", "w2"], how="left")
              .join(unigrams.withColumnRenamed("w", "w1"), on="w1",
                    how="left")
              .withColumn("__logp", F.log(
                  (F.coalesce(F.col("c_bi"), F.lit(0)) + 1.0)
                  / (F.coalesce(F.col("c_uni"), F.lit(0))
                     + F.lit(float(vocab_size)))))
              .withColumn("__lp_fx", F.round(F.col("__logp") * _SCALE)
                          .cast("long")))
    return (scored.groupBy(id_col)
            .agg(F.sum("__lp_fx").alias("__sum_fx"),
                 F.count(F.lit(1)).alias("n_bigrams"))
            .withColumn(out_col, F.round(
                F.exp(-(F.col("__sum_fx") / F.lit(float(_SCALE)))
                      / F.col("n_bigrams")), 4))
            .select(id_col, "n_bigrams", out_col))


def perplexity_buckets(scores: DataFrame, n_buckets: int = 3,
                       ppl_col: str = "perplexity",
                       bucket_col: str = "ppl_bucket") -> DataFrame:
    """CCNet's head/middle/tail split: equal-frequency perplexity buckets
    (0 = lowest perplexity = highest quality).

    Thin wrapper over the engine's quantile bucketing (E10): exact
    ntile semantics via the distributed prefix scan (range-partitioned
    sorts, no single-task global window — round 9), so it holds at any
    corpus size; :func:`caspr_spark.segment.quantile_scores_approx`
    remains the cheaper one-pass Greenwald-Khanna path when
    value-determined buckets are acceptable.
    """
    from caspr_spark.segment import quantile_scores
    out = quantile_scores(scores, [ppl_col], q=n_buckets,
                          tiebreak=[c for c in scores.columns
                                    if c != ppl_col][:1])
    return out.withColumn(bucket_col,
                          (F.col(f"{ppl_col}_score") - 1).cast("long")) \
              .drop(f"{ppl_col}_score")
