"""Unit tests for int8 embedding quantization stats and the bigram
language-model scorer, against Python references."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from symtseries_spark.operators.pq import int8_quantize_stats
from symtseries_spark.operators.retrieval import bigram_logprob


def py_int8(vec):
    amax = max((abs(x) for x in vec), default=0.0)
    if amax <= 0:
        return 0.0, 0, 0.0
    scale = amax / 127.0
    codes = [min(max(math.floor(x / scale + 0.5), -127), 127) for x in vec]
    mse = sum((x - q * scale) ** 2 for x, q in zip(vec, codes)) / len(vec)
    return scale, sum(codes), mse


class TestInt8Quant:
    def test_matches_python_oracle(self, spark):
        vecs = [
            (0, [1.0, -2.0, 0.5, 3.75]),
            (1, [0.001, 0.002, -0.003, 0.0]),
            (2, [100.0, -100.0, 50.0, -50.0]),
        ]
        df = spark.createDataFrame(
            [Row(vec_id=i, embedding=v) for i, v in vecs],
            "vec_id long, embedding array<double>",
        )
        out = {r.vec_id: r for r in int8_quantize_stats(df).collect()}
        for i, v in vecs:
            scale, code_sum, mse = py_int8(v)
            assert out[i].scale == pytest.approx(scale, abs=1e-8)
            assert out[i].code_sum == code_sum
            assert out[i].mse == pytest.approx(mse, abs=1e-8)

    def test_zero_vector(self, spark):
        df = spark.createDataFrame(
            [Row(vec_id=0, embedding=[0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        r = int8_quantize_stats(df).first()
        assert r.scale == 0.0 and r.code_sum == 0 and r.mse == 0.0

    def test_extreme_codes_clamped(self, spark):
        # max element quantizes to exactly +/-127 (never beyond)
        df = spark.createDataFrame(
            [Row(vec_id=0, embedding=[3.0, -3.0, 1.5])],
            "vec_id long, embedding array<double>",
        )
        r = int8_quantize_stats(df).first()
        # codes: 127, -127, 64 (1.5/scale = 63.5 -> floor(64.0) = 64)
        assert r.code_sum == 127 - 127 + 64

    def test_float32_input(self, spark):
        # the real embeddings table carries float32; cast path must work
        df = spark.createDataFrame(
            [Row(vec_id=0, embedding=[1.5, -0.25])],
            "vec_id long, embedding array<float>",
        )
        r = int8_quantize_stats(df).first()
        scale, code_sum, mse = py_int8([1.5, -0.25])
        assert r.scale == pytest.approx(scale, abs=1e-8)
        assert r.code_sum == code_sum


def py_bigram_lm(docs):
    from collections import Counter

    def toks(s):
        out, cur = [], []
        for ch in s.lower():
            if ch.isalnum() and ch.isascii():
                cur.append(ch)
            elif cur:
                out.append("".join(cur))
                cur = []
        if cur:
            out.append("".join(cur))
        return out

    pair_c, ctx_c, vocab = Counter(), Counter(), set()
    doc_pairs = {}
    for doc_id, text in docs:
        t = toks(text)
        vocab.update(t)
        pairs = [f"{a} {b}" for a, b in zip(t, t[1:])]
        doc_pairs[doc_id] = pairs
        for p in pairs:
            pair_c[p] += 1
            ctx_c[p.split(" ")[0]] += 1
    v = len(vocab)
    out = {}
    for doc_id, pairs in doc_pairs.items():
        if not pairs:
            out[doc_id] = (0, None)
        else:
            lps = [
                math.log((pair_c[p] + 1.0) / (ctx_c[p.split(" ")[0]] + v))
                for p in pairs
            ]
            out[doc_id] = (len(pairs), sum(lps) / len(lps))
    return out


class TestBigramLogprob:
    DOCS = [
        (0, "the cat sat on the mat"),
        (1, "the cat ran"),
        (2, "dogs bark loudly at night"),
        (3, "the cat sat on the mat again"),
        (4, "single"),
    ]

    def test_matches_python_oracle(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in self.DOCS]
        )
        out = {r.doc_id: r for r in bigram_logprob(df).collect()}
        exp = py_bigram_lm(self.DOCS)
        for doc_id, (n_pairs, alp) in exp.items():
            assert out[doc_id].n_pairs == n_pairs
            if alp is None:
                assert out[doc_id].avg_logprob is None
            else:
                assert out[doc_id].avg_logprob == pytest.approx(alp, abs=1e-5)

    def test_repeated_pairs_score_higher(self, spark):
        # a doc made of the corpus' most frequent bigram outscores one
        # made of a singleton bigram
        df = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in self.DOCS]
        )
        out = {r.doc_id: r.avg_logprob for r in bigram_logprob(df).collect()}
        assert out[0] > out[2]  # "the cat"/"sat on" seen twice vs singletons
