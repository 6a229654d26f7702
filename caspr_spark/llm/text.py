"""Text-analysis operators over a document table — all native expressions.

Language ID, quality scoring, token counting, fingerprinting. Every
operator is pure `pyspark.sql.functions` column arithmetic (regexes,
hashes), so the whole stage stays in JVM codegen — no Python in the loop
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A "BPE-ish" pre-tokenizer: letter runs, digit runs, or single punctuation
# marks — the shape GPT-2-style byte-pair pre-tokenization produces.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword inventories for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "con", "por", "una"],
    "de": ["der", "die", "und", "das", "mit", "von", "ein", "nicht"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
}


def add_token_counts(df: DataFrame, text_col: str = "text",
                     ws_col: str = "n_tokens_ws",
                     bpe_col: str = "n_tokens_bpe") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return (df.withColumn(ws_col, F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
              .withColumn(bpe_col, F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE))))


def add_quality_signals(df: DataFrame, text_col: str = "text",
                        prefix: str = "q_") -> DataFrame:
    """Length / alpha-ratio / punctuation-ratio / mean-word-length signals.

    The classic cheap quality filters for web-scale corpora (C4/Gopher
    style): each is a single regexp_replace + length expression.
    """
    t = F.col(text_col)
    n = F.length(t).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double")
    digits = F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
    words = F.size(F.split(F.trim(t), r"\s+")).cast("double")
    sw_pat = r"\b(" + "|".join(LANG_STOPWORDS["en"]) + r")\b"
    stops = F.regexp_count(F.lower(t), F.lit(sw_pat)).cast("double")
    return (df.withColumn(f"{prefix}chars", n.cast("long"))
              .withColumn(f"{prefix}alpha_ratio", alpha / n)
              .withColumn(f"{prefix}punct_ratio", punct / n)
              .withColumn(f"{prefix}digit_ratio", digits / n)
              .withColumn(f"{prefix}mean_word_len", alpha / words)
              .withColumn(f"{prefix}stopword_ratio", stops / words))


def _word_hits(text_col: str, words: list[str]):
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(F.col(text_col)), F.lit(pat))


def add_language_id(df: DataFrame, text_col: str = "text",
                    out_col: str = "lang_pred",
                    stopwords: dict[str, list[str]] | None = None) -> DataFrame:
    """Stopword-hit language ID: argmax of per-language stopword matches.

    Adds ``{lang}_hits`` per candidate plus ``out_col``; ties and all-zero
    rows resolve to the lexicographically first language for determinism.
    """
    sw = stopwords or LANG_STOPWORDS
    langs = sorted(sw)
    for lang in langs:
        df = df.withColumn(f"{lang}_hits", _word_hits(text_col, sw[lang]))
    # argmax via array_position(max) over a fixed language order
    hits = F.array(*[F.col(f"{l}_hits") for l in langs])
    best = F.array_position(hits, F.array_max(hits)).cast("int")
    lang_arr = F.array(*[F.lit(l) for l in langs])
    return df.withColumn(out_col, F.element_at(lang_arr, best))


def add_fingerprint(df: DataFrame, text_col: str = "text",
                    out_col: str = "fingerprint") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lower-cased, whitespace collapsed) — the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.md5(norm))


def chunk_documents(df: DataFrame, chunk_tokens: int = 128, overlap: int = 32,
                    id_col: str = "doc_id", text_col: str = "text",
                    chunk_id_col: str = "chunk_id",
                    chunk_col: str = "chunk_text") -> DataFrame:
    """Split documents into overlapping fixed-token-window chunks.

    Retrieval/embedding prep: chunk i covers whitespace tokens
    ``[i·stride, i·stride + chunk_tokens)`` with
    ``stride = chunk_tokens − overlap``; the last chunk starts at the
    final stride position that still introduces new tokens, so every
    token appears in ≥1 chunk and no empty trailing chunk is emitted.

    Pure narrow expressions — split once, ``sequence`` + ``explode`` +
    per-chunk ``slice``/``array_join``; no shuffle at all (the explode
    fan-out is bounded by doc length / stride). Output grain is one row
    per (document, chunk).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap ({overlap}) < chunk_tokens "
                         f"({chunk_tokens})")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # number of stride starts that introduce new tokens:
    # ceil(max(n - overlap, 1) / stride)
    n_chunks = F.ceil(F.greatest(n - F.lit(overlap), F.lit(1))
                      / F.lit(stride)).cast("int")
    return (df.withColumn("__toks", toks)
              .withColumn(chunk_id_col,
                          F.explode(F.sequence(F.lit(0), n_chunks - 1)))
              .withColumn("n_chunk_tokens", F.least(
                  F.lit(chunk_tokens),
                  F.size("__toks") - F.col(chunk_id_col) * stride)
                  .cast("long"))
              .withColumn(chunk_col, F.array_join(
                  F.slice("__toks", F.col(chunk_id_col) * stride + 1,
                          chunk_tokens), " "))
              .drop("__toks"))


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str = "text_norm", lowercase: bool = False,
                   strip_control: bool = True,
                   normalize_punct: bool = True,
                   collapse_whitespace: bool = True) -> DataFrame:
    """Structural text normalization — the first pass of every corpus
    pipeline (C4/CCNet run an equivalent before any filtering so that
    dedup hashes and quality signals see canonical bytes).

    Composable steps, all pure codegen expressions (zero shuffles, zero
    Python — the normalizer runs inside the document scan):

    - ``strip_control`` — replace C0/C1 control characters (except
      newline and tab) with a space: crawl text embeds NUL/VT/escape
      bytes that break downstream tokenizers, and replacing rather than
      deleting keeps words the control byte separated from fusing.
    - ``normalize_punct`` — map typographic variants to ASCII
      (curly quotes -> straight, en/em-dash -> hyphen, ellipsis
      character -> dots, non-breaking space -> space) via one
      ``translate`` + one ``replace`` (the ellipsis expands to three
      chars, which translate cannot do).
    - ``collapse_whitespace`` — runs of whitespace -> single space,
      trimmed (runs after control-stripping so its replacement spaces
      collapse away).
    - ``lowercase`` — off by default (dedup wants it, quality scoring
      and PII detection often do not).

    Every pattern is Java∩RE2∩PCRE-portable (same discipline as
    ``filtering.redact_pii``), so an engine-independent oracle can
    reproduce the output byte-for-byte.
    """
    c = F.col(text_col)
    if strip_control:
        # C0 minus \t \n, DEL, C1 — explicit ranges, no \p classes
        c = F.regexp_replace(
            c, "[\\x00-\\x08\\x0B-\\x1F\\x7F\\x80-\\x9F]", " ")
    if normalize_punct:
        punct_from = "\u2018\u2019\u201c\u201d\u2013\u2014\u00a0"
        punct_to = "''\"\"-- "
        c = F.translate(c, punct_from, punct_to)
        c = F.replace(c, F.lit("…"), F.lit("..."))
    if collapse_whitespace:
        c = F.trim(F.regexp_replace(c, "\\s+", " "))
    if lowercase:
        c = F.lower(c)
    return df.withColumn(out_col, c)
