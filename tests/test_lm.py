"""Bigram-LM perplexity scoring + document chunking."""

import math

import pytest
from pyspark.sql import functions as F

from caspr_spark.llm.lm import (fit_bigram_model, perplexity_buckets,
                                score_perplexity)
from caspr_spark.llm.text import chunk_documents


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    rows = [(1, "the cat sat on the mat"),
            (2, "the cat sat"),
            (3, "zq xv qqq zzz xv zq")]  # gibberish: unseen-ish bigrams
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestBigramModel:
    def test_counts_match_python(self, tiny_corpus):
        uni, bi, v = fit_bigram_model(tiny_corpus)
        u = {r["w"]: r["c_uni"] for r in uni.collect()}
        assert u["the"] == 3 and u["cat"] == 2 and u["<s>"] == 3
        b = {(r["w1"], r["w2"]): r["c_bi"] for r in bi.collect()}
        assert b[("the", "cat")] == 2 and b[("<s>", "the")] == 2
        assert v == len(u)

    def test_perplexity_orders_quality(self, tiny_corpus):
        """Fluent repeated text scores lower than one-off gibberish."""
        uni, bi, v = fit_bigram_model(tiny_corpus)
        sc = {r["doc_id"]: r["perplexity"]
              for r in score_perplexity(tiny_corpus, uni, bi, v).collect()}
        assert sc[2] < sc[3]  # doc2's bigrams all seen twice+

    def test_matches_python_model(self, tiny_corpus):
        uni_df, bi_df, v = fit_bigram_model(tiny_corpus)
        uni = {r["w"]: r["c_uni"] for r in uni_df.collect()}
        bi = {(r["w1"], r["w2"]): r["c_bi"] for r in bi_df.collect()}
        out = {r["doc_id"]: (r["n_bigrams"], r["perplexity"])
               for r in score_perplexity(tiny_corpus, uni_df, bi_df,
                                         v).collect()}
        for doc_id, text in [(1, "the cat sat on the mat"),
                             (2, "the cat sat"),
                             (3, "zq xv qqq zzz xv zq")]:
            toks = ["<s>"] + text.lower().split()
            lps = [round(math.log((bi.get((a, b), 0) + 1.0)
                                  / (uni.get(a, 0) + float(v))) * 1e9)
                   for a, b in zip(toks, toks[1:])]
            ppl = round(math.exp(-(sum(lps) / 1e9) / len(lps)), 4)
            assert out[doc_id] == (len(lps), ppl)

    def test_unseen_corpus_scores_via_smoothing(self, tiny_corpus, spark):
        uni, bi, v = fit_bigram_model(tiny_corpus)
        new = spark.createDataFrame([(9, "entirely novel words here")],
                                    ["doc_id", "text"])
        row = score_perplexity(new, uni, bi, v).collect()[0]
        assert row["n_bigrams"] == 4 and row["perplexity"] > 0

    def test_buckets(self, documents):
        uni, bi, v = fit_bigram_model(documents)
        sc = score_perplexity(documents, uni, bi, v)
        b = perplexity_buckets(sc, 4)
        counts = [r["count"] for r in
                  b.groupBy("ppl_bucket").count().collect()]
        assert len(counts) == 4 and max(counts) - min(counts) <= 1


class TestChunking:
    def test_coverage_and_overlap(self, documents):
        out = chunk_documents(documents, chunk_tokens=48, overlap=16)
        rows = out.select("doc_id", "chunk_id", "n_chunk_tokens",
                          "chunk_text").collect()
        n_toks = {r["doc_id"]: r["n"] for r in documents.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
            .collect()}
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        stride = 32
        for doc_id, chunks in by_doc.items():
            chunks.sort(key=lambda r: r["chunk_id"])
            n = n_toks[doc_id]
            assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
            # every token covered: last chunk reaches the end
            last = chunks[-1]
            assert last["chunk_id"] * stride + last["n_chunk_tokens"] == n
            # no chunk is empty, none exceeds the budget
            assert all(1 <= c["n_chunk_tokens"] <= 48 for c in chunks)
            assert all(len(c["chunk_text"].split()) == c["n_chunk_tokens"]
                       for c in chunks)

    def test_short_doc_single_chunk(self, spark):
        df = spark.createDataFrame([(1, "just four little words")],
                                   ["doc_id", "text"])
        rows = chunk_documents(df, 48, 16).collect()
        assert len(rows) == 1 and rows[0]["n_chunk_tokens"] == 4
        assert rows[0]["chunk_text"] == "just four little words"

    def test_overlap_validation(self, documents):
        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(documents, 32, 32)
