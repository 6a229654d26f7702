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
