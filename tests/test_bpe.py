"""BPE vocabulary learning + tokenization (llm/bpe.py) vs a
straightforward reference implementation of Sennrich et al. 2016."""

import pytest
from pyspark.sql import functions as F

from caspr_spark.llm.bpe import (EOW, apply_bpe, bpe_encode_word, fit_bpe)


def _ref_bpe(word_counts, num_merges):
    """Textbook BPE on a word-count dict (the arXiv:1508.07909 figure)."""
    vocab = {tuple(w) + (EOW,): n for w, n in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, n in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] < 2 and merges:
            break
        a, b = best[0]
        merges.append((a, b))
        nv = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    return merges


class TestFitBpe:
    def test_matches_reference_on_classic_example(self, spark):
        # the canonical low/lower/newest/widest corpus
        words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        text = " ".join(w for w, n in words.items() for _ in range(n))
        df = spark.createDataFrame([(1, text)], "id long, text string")
        got = fit_bpe(df, num_merges=10)
        want = _ref_bpe(words, 10)
        assert got == want
        # the freq-9 't▁'/'s'/'e' chain merges first (tie-break here is
        # lexicographic-max among the freq-9 pairs, so the 'est' unit
        # builds right-to-left: t+EOW, s+t EOW, e+st EOW)
        assert got[0] == ("t", EOW)
        assert got[2] == ("e", "st" + EOW)

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, f"alpha beta gamma{i % 3} alpha") for i in range(60)]
        df = spark.createDataFrame(rows, "id long, text string")
        a = fit_bpe(df.repartition(1), num_merges=15)
        b = fit_bpe(df.repartition(13), num_merges=15)
        assert a == b

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, text string")
        with pytest.raises(ValueError, match="num_merges"):
            fit_bpe(df, num_merges=0)
        with pytest.raises(ValueError, match="max_words"):
            fit_bpe(df, max_words=0)


class TestApplyBpe:
    def test_roundtrip_concatenation(self, spark):
        df = spark.createDataFrame(
            [(1, "the lowest newest low"), (2, "wider and widest")],
            "id long, text string")
        merges = fit_bpe(df, num_merges=30)
        out = apply_bpe(df, merges).collect()
        for r in out:
            # tokens concatenate back to the words (EOW marks ends)
            joined = "".join(r.bpe_tokens).replace(EOW, " ").strip()
            assert joined == r.text.lower()
            assert r.n_bpe_tokens == len(r.bpe_tokens)

    def test_trained_merges_compress(self, spark):
        rows = [(i, "tokenization tokenizer tokenized token") for i in
                range(5)]
        df = spark.createDataFrame(rows, "id long, text string")
        merges = fit_bpe(df, num_merges=40)
        with_merges = apply_bpe(df, merges).first().n_bpe_tokens
        chars = apply_bpe(df, [("\x00", "\x01")]).first().n_bpe_tokens
        assert with_merges < chars  # learned merges actually compress

    def test_encode_word_respects_priority(self):
        # 'ab' learned before 'bc': "abc" -> ["ab","c"] not ["a","bc"]
        ranks = {("a", "b"): 0, ("b", "c"): 1,
                 ("c", EOW): 2}
        assert bpe_encode_word("abc", ranks) == ["ab", "c" + EOW]

    def test_null_and_empty_text(self, spark):
        df = spark.createDataFrame([(1, None), (2, "")],
                                   "id long, text string")
        out = {r.id: r.n_bpe_tokens for r in apply_bpe(df, []).collect()}
        assert out == {1: 0, 2: 0}  # str.split() drops empties
