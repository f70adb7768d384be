#!/usr/bin/env python3
"""Scale probe for pipeline.bpe_merges under the two corpus growth
models (replica builders shared with scale_probe_hot_ngrams):

- **Leg B — self-repeating growth** (verbatim replicas): every pair
  count multiplies by the factor, so the LEARNED MERGE SEQUENCE is
  invariant and each pair_count is exactly ``factor x`` the base —
  both asserted closed-form. This is the property that makes the
  word-frequency-table formulation correct at 100 TB: the algorithm
  sees counts, not rows.
- **Leg A — fresh-content growth** (vowel x consonant translated
  replicas): the vocab TABLE grows ~linearly (each replica brings a
  translated vocab; worst case vs the Heaps-law sublinearity of real
  corpora), measuring the per-iteration cost driver — the vocab
  groupBy — under vocab growth. Merges differ from the base (letters
  are permuted per replica), so only wall/vocab are recorded.

- **Leg C — realistic vocab width** (SPARK_GRAFT_BPE_LEG=wide runs it
  alone): the replica legs inherit the testdata's 31-word lexicon, so
  they measure count-scaling but not the per-iteration vocab-groupBy
  constant. Leg C synthesizes a Zipf-ish corpus over a ~50k-word
  vocabulary (per-token rank LOG-UNIFORM in [1, V] => df ~ 1/rank —
  the Heaps/Zipf shape; rank digits mapped to letters so symbol
  sequences are realistic) and measures wall per merge iteration at
  that width, where each iteration's pair groupBy reads a 50k-row
  symbol table instead of 31 rows.

Usage: SPARK_GRAFT_SCALE_FACTOR=10 python3 scripts/scale_probe_bpe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
N_MERGES = 10
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# scale_probe_hot_ngrams is a script (importing it would run its main
# body), so rebuild the two corpus builders here from the shared
# permutation tables.
from scale_probe_pairs import _CONS, _VOWELS, _perm_tables  # noqa: E402
from symtseries_spark.functions.text import tokens  # noqa: E402
from symtseries_spark.operators.pipeline import bpe_merges  # noqa: E402

docs = spark.read.parquet(f"{BASE}/documents.parquet")


def fresh_corpus(factor: int):
    perms = _perm_tables(factor)
    parts = []
    for i in range(factor):
        vp, cp = perms[i]
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"),
                F.translate(F.col("text"), _VOWELS + _CONS, vp + cp).alias(
                    "text"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def repeat_corpus(factor: int):
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"), "text"
        )
        for i in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def vocab_size(corpus) -> int:
    return (
        corpus.select(F.explode(tokens(F.col("text"))).alias("w"))
        .distinct()
        .count()
    )


def run(corpus):
    t0 = time.time()
    rows = sorted(
        bpe_merges(corpus, n_merges=N_MERGES).collect(),
        key=lambda r: r["merge_rank"],
    )
    return time.time() - t0, [
        (r["left_sym"], r["right_sym"], r["pair_count"]) for r in rows
    ]


import math  # noqa: E402


def wide_vocab_corpus(v_target: int, n_docs: int, toks_per_doc: int):
    u = (
        F.pmod(
            F.xxhash64(F.col("id") * toks_per_doc + F.col("t")),
            F.lit(10**9),
        ).cast("double")
        / 1e9
    )
    rank = (F.floor(F.exp(u * F.lit(math.log(v_target)))).cast("long"))
    word = F.translate(rank.cast("string"), "0123456789", "abcdefghij")
    return (
        spark.range(n_docs)
        .select(
            "id",
            F.explode(
                F.sequence(F.lit(0), F.lit(toks_per_doc - 1))
            ).alias("t"),
        )
        .select("id", word.alias("w"))
        .groupBy("id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
        .select(F.col("id").alias("doc_id"), "text")
    )


def wide_leg():
    print("# leg C: vocab-width constant (Zipf-ish 50k-word lexicon)")
    print("| leg | docs | tokens | vocab | wall_s | s_per_merge |")
    print("|---|---|---|---|---|---|")
    for v_target, n_docs, tpd in ((50_000, 50_000, 100),
                                  (200_000, 200_000, 100)):
        c = wide_vocab_corpus(v_target, n_docs, tpd).persist()
        c.count()
        v = vocab_size(c)
        w, merges = run(c)
        print(
            f"| C wide | {n_docs} | {n_docs * tpd} | {v} | {w:.1f} "
            f"| {w / N_MERGES:.2f} |",
            flush=True,
        )
        assert v > 0.8 * v_target, (v, v_target)
        c.unpersist()


if os.environ.get("SPARK_GRAFT_BPE_LEG") == "wide":
    wide_leg()
    print("leg C done")
    sys.exit(0)

print(f"# bpe_merges scale probe  base={BASE}  factor={FACTOR}")
print("| leg | factor | vocab | wall_s | first merge | last merge |")
print("|---|---|---|---|---|---|")

base_vocab = vocab_size(docs)
w, base_merges = run(docs)
print(
    f"| base | 1 | {base_vocab} | {w:.1f} "
    f"| {base_merges[0]} | {base_merges[-1]} |"
)

for f in (10, FACTOR) if FACTOR != 10 else (10,):
    c = repeat_corpus(f).persist()
    c.count()
    w, merges = run(c)
    print(
        f"| B repeat | {f} | {base_vocab} | {w:.1f} "
        f"| {merges[0]} | {merges[-1]} |"
    )
    # count-scaling invariance: same merges, counts exactly x factor
    assert [(l, r) for l, r, _ in merges] == [
        (l, r) for l, r, _ in base_merges
    ], "merge sequence changed under replication"
    assert [cnt for _, _, cnt in merges] == [
        f * cnt for _, _, cnt in base_merges
    ], "pair counts not count-scaled"
    c.unpersist()

for f in (10, FACTOR) if FACTOR != 10 else (10,):
    c = fresh_corpus(f).persist()
    c.count()
    v = vocab_size(c)
    w, merges = run(c)
    print(f"| A fresh | {f} | {v} | {w:.1f} | {merges[0]} | {merges[-1]} |")
    c.unpersist()

print("all invariants OK")
