"""Tests for the round-3 LLM-pipeline extensions: benchmark
decontamination, RAG chunking, pattern scrubbing, and unigram-LM
scoring — hand-computed fixtures, no external oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from symtseries_spark.operators.decontam import benchmark_contamination
from symtseries_spark.operators.pipeline import chunk_documents, pattern_scrub
from symtseries_spark.operators.retrieval import unigram_logprob


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


class TestContamination:
    def test_overlap_counts(self, spark):
        corpus = _docs(
            spark,
            [
                # shares "the quick brown" and "quick brown fox" -> 2 of 4
                (1, "the quick brown fox jumps"),
                (2, "totally unrelated words here"),
            ],
        )
        bench = _docs(spark, [(100, "the quick brown fox")])
        out = {
            r["doc_id"]: r
            for r in benchmark_contamination(corpus, bench, k=3).collect()
        }
        assert set(out) == {1}
        r = out[1]
        # doc 1 has 3 distinct 3-shingles, 2 appear in the benchmark
        assert r["matched_shingles"] == 2
        assert r["total_shingles"] == 3
        assert r["contamination"] == pytest.approx(
            math.floor(2 / 3 * 1e6 + 0.5) / 1e6
        )

    def test_short_docs_never_flagged(self, spark):
        corpus = _docs(spark, [(1, "quick brown")])  # < k tokens
        bench = _docs(spark, [(100, "the quick brown fox")])
        assert benchmark_contamination(corpus, bench, k=3).count() == 0

    def test_min_matches_threshold(self, spark):
        corpus = _docs(spark, [(1, "the quick brown cat sat down")])
        bench = _docs(spark, [(100, "the quick brown fox")])
        # only "the quick brown" matches -> filtered at min_matches=2
        assert (
            benchmark_contamination(corpus, bench, k=3, min_matches=2).count()
            == 0
        )


class TestChunking:
    def test_boundaries_and_tail(self, spark):
        docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(10)))])
        rows = sorted(
            chunk_documents(docs, chunk_tokens=4, stride=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        # starts 0,3,6,9: three full chunks + 1-token tail
        assert [r["start_token"] for r in rows] == [0, 3, 6, 9]
        assert [r["n_tokens"] for r in rows] == [4, 4, 4, 1]
        assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
        assert rows[-1]["chunk_text"] == "t9"

    def test_short_doc_single_chunk(self, spark):
        docs = _docs(spark, [(1, "just three tokens")])
        rows = chunk_documents(docs, chunk_tokens=16, stride=12).collect()
        assert len(rows) == 1
        assert rows[0]["n_tokens"] == 3
        assert rows[0]["start_token"] == 0

    def test_exact_multiple_no_empty_tail(self, spark):
        # 6 tokens, chunk 3 stride 3: starts 0 and 3 only (no start 6)
        docs = _docs(spark, [(1, "a b c d e f")])
        rows = chunk_documents(docs, chunk_tokens=3, stride=3).collect()
        assert sorted(r["start_token"] for r in rows) == [0, 3]

    def test_invalid_params(self, spark):
        docs = _docs(spark, [(1, "a b c")])
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=0, stride=3)
        with pytest.raises(ValueError):
            chunk_documents(docs, chunk_tokens=4, stride=0)


class TestPatternScrub:
    PATTERNS = {
        "email": "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
        "url": "https?://[^ ]+",
    }

    def test_counts_and_redaction(self, spark):
        docs = _docs(
            spark,
            [
                (1, "mail bob@example.com and visit https://x.io now"),
                (2, "nothing sensitive here"),
            ],
        )
        out = {
            r["doc_id"]: r for r in pattern_scrub(docs, self.PATTERNS).collect()
        }
        assert out[1]["email_hits"] == 1
        assert out[1]["url_hits"] == 1
        assert (
            out[1]["scrubbed_text"]
            == "mail <scrubbed> and visit <scrubbed> now"
        )
        assert out[1]["chars_removed"] == len(
            "mail bob@example.com and visit https://x.io now"
        ) - len(out[1]["scrubbed_text"])
        assert out[2]["email_hits"] == 0
        assert out[2]["scrubbed_text"] == "nothing sensitive here"
        assert out[2]["chars_removed"] == 0

    def test_empty_patterns_rejected(self, spark):
        docs = _docs(spark, [(1, "x")])
        with pytest.raises(ValueError):
            pattern_scrub(docs, {})


class TestUnigramLogprob:
    def test_hand_computed(self, spark):
        # corpus: "a a b" + "b c" -> counts a:2 b:2 c:1, total 5
        docs = _docs(spark, [(1, "a a b"), (2, "b c")])
        out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
        lp = {t: math.log(c / 5) for t, c in {"a": 2, "b": 2, "c": 1}.items()}
        exp1 = (lp["a"] + lp["a"] + lp["b"]) / 3
        exp2 = (lp["b"] + lp["c"]) / 2
        assert out[1]["n_tokens"] == 3
        assert out[1]["avg_logprob"] == pytest.approx(exp1, abs=1e-6)
        assert out[2]["avg_logprob"] == pytest.approx(exp2, abs=1e-6)

    def test_uniform_corpus_score(self, spark):
        # every token unique -> every doc scores ln(1/N)
        docs = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
        out = unigram_logprob(docs).collect()
        for r in out:
            assert r["avg_logprob"] == pytest.approx(math.log(0.25), abs=1e-6)


class TestVocabCoverage:
    def test_hand_computed(self, spark):
        from symtseries_spark.operators.pipeline import vocab_coverage

        # counts: a:3 b:2 c:1 d:1 -> top-2 vocab = {a, b}
        docs = _docs(spark, [(1, "a a b c"), (2, "a b d")])
        out = {
            r["doc_id"]: r
            for r in vocab_coverage(docs, vocab_size=2).collect()
        }
        assert out[1]["n_tokens"] == 4 and out[1]["oov_tokens"] == 1
        assert out[2]["n_tokens"] == 3 and out[2]["oov_tokens"] == 1
        assert out[1]["oov_ratio"] == pytest.approx(0.25)

    def test_tie_breaks_on_term(self, spark):
        from symtseries_spark.operators.pipeline import vocab_coverage

        # b and c tie at 1; vocab_size=2 with a:2 -> {a, b} (term order)
        docs = _docs(spark, [(1, "a a b c")])
        r = vocab_coverage(docs, vocab_size=2).collect()[0]
        assert r["oov_tokens"] == 1  # only c is OOV


class TestMixtureSample:
    def _src_docs(self, spark, n=400):
        return spark.createDataFrame(
            [
                Row(doc_id=i, text="x", source=f"src{(i % 4) + 1}")
                for i in range(n)
            ]
        )

    def test_rates_respected(self, spark):
        from symtseries_spark.operators.pipeline import mixture_sample

        docs = self._src_docs(spark)
        kept = mixture_sample(
            docs, {"src1": 1.0, "src2": 0.0}, default_rate=0.5
        )
        by_src = {
            r["source"]: r["n"]
            for r in kept.groupBy("source").agg(
                F.count("*").alias("n")
            ).collect()
        }
        assert by_src.get("src1") == 100  # rate 1.0 keeps everything
        assert "src2" not in by_src  # rate 0.0 drops everything
        # default 0.5 on src3/src4: binomial around 50 of 100
        assert 25 <= by_src.get("src3", 0) <= 75
        assert 25 <= by_src.get("src4", 0) <= 75

    def test_deterministic_and_partition_independent(self, spark):
        from symtseries_spark.operators.pipeline import mixture_sample

        docs = self._src_docs(spark)
        ids1 = sorted(
            r["doc_id"]
            for r in mixture_sample(docs, {}, default_rate=0.5).collect()
        )
        ids2 = sorted(
            r["doc_id"]
            for r in mixture_sample(
                docs.repartition(7), {}, default_rate=0.5
            ).collect()
        )
        assert ids1 == ids2 and len(ids1) > 0

    def test_invalid_rate_rejected(self, spark):
        from symtseries_spark.operators.pipeline import mixture_sample

        docs = self._src_docs(spark, 4)
        with pytest.raises(ValueError):
            mixture_sample(docs, {"src1": 1.5})
        with pytest.raises(ValueError):
            mixture_sample(docs, {}, default_rate=-0.1)


class TestGlobalOrderIndex:
    def test_matches_single_task_form(self, spark):
        from symtseries_spark.operators.pipeline import global_order_index
        import hashlib

        docs = spark.createDataFrame(
            [Row(doc_id=i, text="x") for i in range(200)]
        )
        got = {
            r["doc_id"]: r["train_order"]
            for r in global_order_index(docs, shards=16).collect()
        }

        def h(i):
            return int(hashlib.md5(f"order{i}".encode()).hexdigest()[:15], 16)

        expect = {
            did: idx
            for idx, did in enumerate(
                sorted(range(200), key=lambda i: (h(i), i))
            )
        }
        assert got == expect

    def test_partition_independent(self, spark):
        from symtseries_spark.operators.pipeline import global_order_index

        docs = spark.createDataFrame(
            [Row(doc_id=i, text="x") for i in range(100)]
        )
        a = sorted(
            (r["doc_id"], r["train_order"])
            for r in global_order_index(docs, shards=8).collect()
        )
        b = sorted(
            (r["doc_id"], r["train_order"])
            for r in global_order_index(
                docs.repartition(13), shards=8
            ).collect()
        )
        assert a == b
        assert sorted(t for _, t in a) == list(range(100))

    def test_single_shard_degenerate(self, spark):
        from symtseries_spark.operators.pipeline import global_order_index

        docs = spark.createDataFrame([Row(doc_id=i, text="x") for i in range(10)])
        out = global_order_index(docs, shards=1).collect()
        assert sorted(r["train_order"] for r in out) == list(range(10))


class TestIvfAtRest:
    def _emb(self, spark, n=64, dim=8):
        import random

        rng = random.Random(11)
        return spark.createDataFrame(
            [
                Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(dim)])
                for i in range(n)
            ]
        )

    def test_full_probe_equals_brute_force(self, spark, tmp_path):
        from symtseries_spark.operators.simsearch import cosine_topk
        from symtseries_spark.sources import (
            read_ivf_probe,
            write_ivf_partitioned,
        )

        emb = self._emb(spark)
        qvec = emb.where(F.col("vec_id") == 3).first()["embedding"]
        path = str(tmp_path / "ivf")
        write_ivf_partitioned(emb, path, num_lists=4, dim=8)
        got = read_ivf_probe(
            spark, path, qvec, k=10, nprobe=4, exclude_id=3
        ).collect()
        exp = cosine_topk(emb, query_id=3, k=10).collect()
        assert [(r["vec_id"], r["cos"]) for r in got] == [
            (r["vec_id"], r["cos"]) for r in exp
        ]

    def test_partial_probe_partition_prunes(self, spark, tmp_path):
        from symtseries_spark.sources import (
            read_ivf_probe,
            write_ivf_partitioned,
        )

        emb = self._emb(spark)
        qvec = emb.where(F.col("vec_id") == 3).first()["embedding"]
        path = str(tmp_path / "ivf")
        write_ivf_partitioned(emb, path, num_lists=4, dim=8)
        probed = read_ivf_probe(spark, path, qvec, k=10, nprobe=1)
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "list_id" in plan
        # pruned probe returns <= full corpus and is a subset of it
        ids = {r["vec_id"] for r in probed.collect()}
        assert 0 < len(ids) <= 10


class TestDhashAtRest:
    def test_probe_equals_brute_force_and_prunes(self, spark, tmp_path):
        from symtseries_spark.operators.multimodal import (
            media_dhash_wide,
            media_from_documents,
        )
        from symtseries_spark.sources import (
            read_dhash_probe,
            write_dhash_index,
        )

        texts = [
            "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii",
            "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiij",
            "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr",
            "mmmm nnnn oooo pppp qqqq rrrr ssss tttt uuuu",
        ]
        media = media_from_documents(
            spark.createDataFrame(
                [(i, t) for i, t in enumerate(texts)],
                "doc_id long, text string",
            )
        )
        path = str(tmp_path / "dhash")
        write_dhash_index(media, path, rows=13)
        wide = {
            r["media_id"]: list(r["dhash_rows"])
            for r in media_dhash_wide(media).collect()
        }
        probe = wide[0]
        got = read_dhash_probe(
            spark, path, probe, max_hamming=12, exclude_id=0
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        # band is the partition column, chunk is pushed to the scan
        assert "PartitionFilters" in plan and "band" in plan
        assert "PushedFilters" in plan and "chunk" in plan

        def ham(a, b):
            return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

        want = sorted(
            (ham(probe, w), i)
            for i, w in wide.items()
            if i != 0 and ham(probe, w) <= 12
        )
        assert [(r["hamming"], r["media_id"]) for r in got.collect()] == want
        with pytest.raises(ValueError, match="pigeonhole"):
            read_dhash_probe(spark, path, probe, max_hamming=13)


class TestIncrementalDedup:
    def test_admits_only_fresh_content(self, spark):
        from symtseries_spark.operators.dedup import incremental_dedup

        existing = _docs(spark, [(1, "old news"), (2, "evergreen text")])
        incoming = _docs(
            spark,
            [
                (10, "old news"),        # dup of existing -> rejected
                (11, "brand new words"), # fresh -> admitted
                (12, "brand new words"), # in-batch dup -> rejected
                (13, "Evergreen   TEXT"),# normalized dup -> rejected
                (14, "also fresh"),
            ],
        )
        got = sorted(
            r["doc_id"]
            for r in incremental_dedup(incoming, existing).collect()
        )
        assert got == [11, 14]

    def test_empty_existing_reduces_to_batch_dedup(self, spark):
        from symtseries_spark.operators.dedup import incremental_dedup

        existing = _docs(spark, []) if False else _docs(
            spark, [(0, "placeholder")]
        ).where("doc_id < 0")
        incoming = _docs(spark, [(5, "x y z"), (6, "x y z"), (7, "q")])
        got = sorted(
            r["doc_id"]
            for r in incremental_dedup(incoming, existing).collect()
        )
        assert got == [5, 7]


class TestPmiBigrams:
    def test_hand_computed(self, spark):
        from symtseries_spark.operators.retrieval import pmi_bigrams

        # tokens: doc1/doc2 = x y a b z (5 each), doc3 = x y z x (4)
        # -> T = 14 (x:4 y:3 a:2 b:2 z:3); bigrams 4+4+3 -> B = 11
        docs = _docs(
            spark,
            [(1, "x y a b z"), (2, "x y a b z"), (3, "x y z x")],
        )
        rows = pmi_bigrams(docs, topk=50, min_count=2).collect()
        got = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi"]) for r in rows}
        T, B = 14, 11
        exp_xy = math.log((3 / B) / ((4 / T) * (3 / T)))
        n, p = got[("x", "y")]
        assert n == 3
        assert p == pytest.approx(
            math.floor(exp_xy * 1e6 + 0.5) / 1e6, abs=1e-9
        )
        # singleton pairs are filtered by min_count
        assert ("b", "z") in got and got[("b", "z")][0] == 2
        assert ("z", "x") not in got  # count 1

    def test_ordering_deterministic(self, spark):
        from symtseries_spark.operators.retrieval import pmi_bigrams

        docs = _docs(spark, [(1, "a b a b c d c d")])
        r1 = [(r["w1"], r["w2"]) for r in pmi_bigrams(docs, topk=5).collect()]
        r2 = [(r["w1"], r["w2"]) for r in pmi_bigrams(docs, topk=5).collect()]
        assert r1 == r2


class TestLshAtRest:
    def test_probe_equals_brute_force_and_prunes(self, spark, tmp_path):
        from symtseries_spark.operators.dedup import minhash_signatures
        from symtseries_spark.sources import read_lsh_probe, write_lsh_index

        texts = [
            "the quick brown fox jumps over the lazy dog by the river",
            "the quick brown fox jumps over the lazy dog by the shore",
            "completely unrelated content about catalyst physical plans",
            "another unrelated passage on shuffle partitions and skew",
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        path = str(tmp_path / "lsh")
        nh, bands, k, seed = 32, 8, 3, 7
        write_lsh_index(
            docs, path, k=k, num_hashes=nh, bands=bands, seed=seed
        )
        sigs = {
            r["doc_id"]: [int(r[f"m{i}"]) for i in range(nh)]
            for r in minhash_signatures(
                docs, k=k, num_hashes=nh, seed=seed
            ).collect()
        }
        r = nh // bands
        probe_sig = sigs[0]
        probe_bands = [
            "_".join(str(probe_sig[b * r + j]) for j in range(r))
            for b in range(bands)
        ]
        got = read_lsh_probe(
            spark, path, probe_bands, probe_sig, threshold=0.35,
            exclude_id=0,
        )
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "band" in plan
        assert "PushedFilters" in plan and "band_key" in plan

        def est(a, b):
            return round(sum(x == y for x, y in zip(a, b)) / nh, 4)

        # brute-force truth restricted to band-sharing candidates
        def shares_band(a, b):
            return any(
                a[i * r : (i + 1) * r] == b[i * r : (i + 1) * r]
                for i in range(bands)
            )

        want = {
            i: est(probe_sig, s)
            for i, s in sigs.items()
            if i != 0 and shares_band(probe_sig, s)
            and est(probe_sig, s) >= 0.35
        }
        got_map = {
            r["doc_id"]: r["est_jaccard"] for r in got.collect()
        }
        assert got_map == want and 1 in got_map

    def test_validation(self, spark, tmp_path):
        from symtseries_spark.sources import read_lsh_probe, write_lsh_index

        docs = spark.createDataFrame(
            [(0, "a b c d")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="divide"):
            write_lsh_index(
                docs, str(tmp_path / "x"), k=3, num_hashes=32, bands=7
            )
        with pytest.raises(ValueError, match="threshold"):
            read_lsh_probe(spark, "/nonexistent", ["0"], [1], threshold=0.0)
        with pytest.raises(ValueError, match="probe bands"):
            read_lsh_probe(spark, "/nonexistent", [], [1], threshold=0.5)
