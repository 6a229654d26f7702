"""Structural corpus cleaning: global paragraph dedup + boilerplate removal.

The C4/RefinedWeb-style *sub-document* cleaning passes that run before
model training (reference scope: CASPR stops at featurization — these
extend the engine to the LLM-curation surface the task brief asks for):

- **Global paragraph dedup** — across the WHOLE corpus, keep only the
  first occurrence of each distinct paragraph (C4 did this at the
  three-sentence-span level; RefinedWeb at the line level), then
  reassemble each document from its surviving paragraphs in order.
- **Boilerplate removal** — drop units (lines / paragraphs) that occur
  in at least ``min_docs`` distinct documents: nav bars, cookie notices,
  and share buttons repeat across a domain, real prose does not.

Plan shapes (both scale-safe at 100 TB):

- Splitting is codegen (`split` + `posexplode`); the unit relation is
  (id, pos, unit) — the only row-multiplying step.
- Paragraph dedup's winner election is ONE map-side-combinable
  aggregate keyed on the 128-bit unit hash — `min(struct(id, pos,
  unit))`, lexicographic on (id, pos), so the first occurrence wins
  deterministically and a ubiquitous boilerplate paragraph collapses
  to one row per input partition BEFORE the exchange — then one
  regroup on id to reassemble. No joins, no windows, nothing
  quadratic.
- Boilerplate's frequent-unit set is ``count(distinct id) >= min_docs``
  — a keyed agg with map-side partial aggregation — applied as an anti
  join with no forced broadcast (the set grows with the corpus; AQE
  broadcasts it while it fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_units(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", sep: str = "\n\n",
                min_chars: int = 1) -> DataFrame:
    """Explode documents into (id, pos, unit) rows.

    ``sep`` is a literal separator (regex metacharacters are escaped
    before the split so Spark's regex `split` and a literal-splitting
    oracle agree). Units that trim to fewer than ``min_chars`` characters
    are dropped — they carry no content and would otherwise make the
    global first-occurrence election depend on separator run lengths.
    """
    import re
    units = F.split(F.col(text_col), re.escape(sep))
    out = (df.select(F.col(id_col), F.posexplode(units).alias("pos", "unit"))
             .filter(F.length(F.trim(F.col("unit"))) >= min_chars))
    return out


def _reassemble(units: DataFrame, id_col: str, sep: str,
                out_col: str, count_col: str | None = None) -> DataFrame:
    """(id, pos, unit) -> one row per id with units rejoined in pos order.

    collect_list + array_sort(struct(pos, unit)) keeps the regroup a
    single keyed aggregation (no window, no second sort exchange).
    ``count_col`` optionally adds the surviving-unit count in the same
    aggregation."""
    aggs = [F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "unit"))),
            lambda s: s["unit"]),
        sep).alias(out_col)]
    if count_col is not None:
        aggs.append(F.count("*").alias(count_col))
    return units.groupBy(id_col).agg(*aggs)


def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", sep: str = "\n\n",
                    out_col: str = "text_dedup",
                    min_chars: int = 1) -> DataFrame:
    """Corpus-global paragraph dedup (C4 §2.2 / RefinedWeb line dedup).

    Keep only the FIRST occurrence — lowest ``(id, pos)`` — of each
    distinct unit across the whole corpus, then rebuild each document
    from its surviving units in original order. Documents whose every
    unit was seen earlier disappear from the output (they contributed
    nothing new), matching C4's behavior of dropping emptied pages.

    One exchange on the unit hash (winner election), one on id
    (reassembly). The election is ``min(struct(id, pos, unit))`` per
    unit hash — struct ordering is lexicographic on (id, pos), exactly
    the old orderBy — as a map-side-combinable AGGREGATE, not a
    ``row_number`` window: windows cannot partial-aggregate, so a
    cookie-notice paragraph occurring 10⁸ times corpus-wide would
    funnel all 10⁸ rows into one window task, while the aggregate
    collapses them to one row per input partition before the exchange.
    The winner's unit text rides inside the min struct (all rows under
    one md5 share the unit anyway), so no join-back is needed.
    """
    units = split_units(df, id_col, text_col, sep, min_chars)
    first = (units.groupBy(F.md5(F.col("unit")).alias("__h"))
                  .agg(F.min(F.struct(F.col(id_col), F.col("pos"),
                                      F.col("unit"))).alias("__w"))
                  .select("__w.*"))
    return _reassemble(first, id_col, sep, out_col)


def remove_boilerplate(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", sep: str = "\n\n",
                       min_docs: int = 5, out_col: str = "text_clean",
                       min_chars: int = 1) -> DataFrame:
    """Strip units that occur in >= ``min_docs`` distinct documents.

    Returns ONE row per input document — ``out_col`` (empty string when
    every unit was boilerplate) plus ``n_kept``, the surviving unit
    count — so the pass never changes corpus cardinality (filtering on
    emptiness is the caller's policy decision).

    The frequent-unit set is usually small, but it grows with the
    corpus (any sentence repeated across >= ``min_docs`` pages
    qualifies), so it carries NO broadcast hint — AQE broadcasts it
    while it fits and plans a shuffle anti join when it doesn't. The
    two keyed shuffles (unit-frequency agg, id regroup) are both
    map-side combinable.
    """
    units = split_units(df, id_col, text_col, sep, min_chars)
    units = units.withColumn("__h", F.md5(F.col("unit")))
    frequent = (units.groupBy("__h")
                .agg(F.count_distinct(F.col(id_col)).alias("__df"))
                .filter(F.col("__df") >= min_docs)
                .select("__h"))
    kept = units.join(frequent, on="__h", how="left_anti")
    body = _reassemble(kept, id_col, sep, out_col, count_col="n_kept")
    base = df.select(id_col)
    return (base.join(body, on=id_col, how="left")
                .select(F.col(id_col),
                        F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
                        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept")))
