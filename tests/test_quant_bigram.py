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


class TestMmrRerank:
    def _emb(self, spark):
        # query 0 = x-axis; 1 and 2 near-duplicates of each other
        # (sim ~0.99996) and both highly relevant; 3 relevant via a
        # DIFFERENT component (low sim to 1, so the diversity penalty
        # beats its small relevance gap); 4 anti-relevant
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.20, 0.0, 0.0]),
            (2, [1.0, 0.21, 0.0, 0.0]),
            (3, [1.0, 0.0, 0.6, 0.0]),
            (4, [-0.5, 1.0, 0.0, 0.0]),
        ]
        return spark.createDataFrame(
            [Row(vec_id=i, embedding=v) for i, v in rows],
            "vec_id long, embedding array<double>",
        )

    def test_diversity_demotes_near_duplicate(self, spark):
        from symtseries_spark.operators.simsearch import mmr_rerank

        out = mmr_rerank(
            self._emb(spark), query_id=0, n_candidates=4, k=3, lam=0.5
        ).orderBy("rank").collect()
        ids = [r.vec_id for r in out]
        # pure relevance order would be [1, 2, 3]; MMR keeps 1 first,
        # then prefers the diverse 3 over the near-duplicate 2
        assert ids[0] == 1
        assert ids[1] == 3
        assert ids[2] == 2
        # first score = lam * rel; later scores strictly smaller
        assert out[0].mmr_score > out[1].mmr_score

    def test_matches_python_greedy(self, spark):
        import math as m

        from symtseries_spark.operators.simsearch import mmr_rerank

        df = self._emb(spark)
        vecs = {r.vec_id: r.embedding for r in df.collect()}

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = m.sqrt(sum(x * x for x in a))
            nb = m.sqrt(sum(x * x for x in b))
            return round(d / (na * nb), 6)

        rel = {i: cos(v, vecs[0]) for i, v in vecs.items() if i != 0}
        cand = sorted(rel, key=lambda i: (-rel[i], i))[:4]
        selected, remaining = [], list(cand)
        for _ in range(3):
            scored = [
                (
                    0.5 * rel[c]
                    - 0.5
                    * max((cos(vecs[c], vecs[s]) for s, _ in selected),
                          default=0.0),
                    c,
                )
                for c in remaining
            ]
            s, c = max(scored, key=lambda t: (t[0], -t[1]))
            selected.append((c, s))
            remaining.remove(c)
        out = mmr_rerank(
            df, query_id=0, n_candidates=4, k=3, lam=0.5
        ).orderBy("rank").collect()
        for r, (c, s) in zip(out, selected):
            assert r.vec_id == c
            assert r.mmr_score == pytest.approx(s, abs=1e-6)

    def test_param_validation(self, spark):
        from symtseries_spark.operators.simsearch import mmr_rerank

        df = self._emb(spark)
        with pytest.raises(ValueError):
            mmr_rerank(df, query_id=0, n_candidates=4, k=5)
        with pytest.raises(ValueError):
            mmr_rerank(df, query_id=0, n_candidates=4, k=3, lam=1.5)


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
