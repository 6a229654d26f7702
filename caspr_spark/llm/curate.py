"""End-to-end corpus curation — the composed LLM-training-data pipeline.

Chains the individual operators the way a production data-curation run
does: quality signals -> threshold filters -> language filter -> exact
dedup -> (optional) near-dup removal -> per-source accounting. Every
stage is a native-expression operator from this package, so the composed
plan is still one scan + one dedup shuffle + one accounting aggregate —
filters and signal projections all fuse into the scan stage under
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from caspr_spark.llm.text import (
    add_language_id, add_quality_signals, add_token_counts,
)
from caspr_spark.llm.dedup import exact_dedup, minhash_lsh_dedup


def curate_corpus(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  min_tokens: int = 10, max_tokens: int = 100000,
                  min_alpha_ratio: float = 0.5, max_punct_ratio: float = 0.2,
                  languages: tuple[str, ...] = ("en",),
                  near_dedup: bool = False,
                  near_dedup_threshold: float = 0.8) -> DataFrame:
    """The curated corpus: quality-filtered, language-filtered, deduped.

    Returns the surviving rows with the quality/token columns attached
    (near-dedup off by default: it adds the MinHash shuffle; at 100 TB
    run it as a separate pass over the already-curated corpus).
    """
    from caspr_spark.sources import ensure_parallelism
    out = add_token_counts(add_quality_signals(ensure_parallelism(df), text_col),
                           text_col)
    out = out.filter(
        (F.col("n_tokens_ws") >= min_tokens) &
        (F.col("n_tokens_ws") <= max_tokens) &
        (F.col("q_alpha_ratio") >= min_alpha_ratio) &
        (F.col("q_punct_ratio") <= max_punct_ratio))
    out = add_language_id(out, text_col)
    out = out.filter(F.col("lang_pred").isin(*languages))
    # Persist the filtered+scored relation before dedup: exact_dedup
    # consumes its input TWICE (the content-key aggregate and the
    # left-semi join back), and each pass would otherwise re-run the
    # whole regex signal + language-ID chain over every surviving doc —
    # measured ~2x the stage cost at sf0.1. One materialization (MEMORY_
    # AND_DISK, LRU-evictable with recompute fallback; released by the
    # caller's cache_scope) makes the chain run once; at corpus scale
    # the cached bytes are the curated survivors only, and re-reading
    # them beats re-running ~14 regex passes per document.
    from caspr_spark.cache import register_cache
    out = register_cache(out.persist())
    out = exact_dedup(out, text_col, id_col)
    if near_dedup:
        out, _ = minhash_lsh_dedup(out, id_col, text_col,
                                   threshold=near_dedup_threshold)
    return out


def curation_report(df: DataFrame, curated: DataFrame,
                    source_col: str = "source") -> DataFrame:
    """Per-source accounting: input docs, kept docs, kept tokens."""
    inp = df.groupBy(source_col).agg(F.count("*").alias("docs_in"))
    kept = curated.groupBy(source_col).agg(
        F.count("*").alias("docs_kept"),
        F.sum("n_tokens_ws").alias("tokens_kept"))
    return (inp.join(kept, on=source_col, how="left")
            .fillna(0, subset=["docs_kept", "tokens_kept"]))


def curate_corpus_v2(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", sep: str = "\n\n",
                     min_docs: int = 5, budget: int = 20000,
                     n_buckets: int = 1024,
                     weights: list[float] | None = None) -> DataFrame:
    """The C4/RefinedWeb-shaped curation pipeline, composed end-to-end:

    1. boilerplate-unit removal (``clean.remove_boilerplate``) — docs
       emptied by the scrub drop out,
    2. corpus-global paragraph dedup (``clean.paragraph_dedup``),
    3. hashed-BoW quality scoring (``filtering.quality_score_hashed_bow``)
       over the CLEANED text,
    4. greedy token-budget selection (``sampling.select_to_token_budget``)
       best-quality-first.

    Returns the selected documents as (id, n_tokens, q6, cum_tokens).
    Every stage is the scale-shaped operator it composes — all
    exchanges are keyed on unit-hash / doc-id / the budget range
    partition, all joins broadcast, scoring is map-only; nothing is
    quadratic and nothing driver-sized except the prefix-sum offsets.
    """
    from caspr_spark.llm.clean import paragraph_dedup, remove_boilerplate
    from caspr_spark.llm.filtering import quality_score_hashed_bow
    from caspr_spark.operators.sampling import select_to_token_budget

    clean = (remove_boilerplate(df, id_col, text_col, sep, min_docs)
             .filter(F.col("n_kept") > 0))
    ded = paragraph_dedup(clean, id_col, "text_clean", sep)
    scored = quality_score_hashed_bow(ded, id_col, "text_dedup",
                                      n_buckets, weights)
    scored = scored.withColumn("q6", F.round("quality", 6))
    return select_to_token_budget(
        scored.select(id_col, "n_tokens", "q6"), budget, "n_tokens",
        [F.col("q6").desc(), F.col(id_col)])
