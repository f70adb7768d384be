#!/usr/bin/env python3
"""Scale probe for the suffix family (operators/suffix.py).

The claim under test is the family's headline scale property:
**doubling-round count depends on max DOC length, not corpus size**
(suffixes never cross documents). The probe grows the corpus 1x -> Rx
with the vowel-permutation replica scheme (scale_probe_pairs.py:
per-replica ``translate`` keeps every word shape and document length,
so max doc length — and therefore the round count — is invariant by
construction, while vocabulary and position volume grow linearly).

Asserted invariants (not just timings):
- LAST_ROUNDS identical at 1x and Rx;
- position volume grows exactly Rx (replicas preserve token counts);
- a PLANTED duplicated span (one mirrored doc per replica) is found at
  both scales with the same length — occurrences scale with replicas
  only through the replicas' own mirrors (the vowel permutation makes
  cross-replica text disjoint, so no accidental cross-replica spans at
  the max length).

Timings are recorded for the ratio table; near-linear wall growth is
the expectation (each round is a position self-join + distinct +
two-pass rank + pair join-back, all linear shuffles), but wall is
reported, not asserted — local[32] hides little here since no stage is
single-task.
"""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from symtseries_spark.operators import suffix as sx

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("PROBE_FACTOR", "10"))
PERMS = [
    "aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "aeiuo", "eioau", "iouea", "ouaie", "uaeoi",
]


def corpus(spark, replicas: int):
    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )
    parts = []
    for i in range(replicas):
        # mirror subset chosen on the BASE id (before the replica
        # offset) so every replica mirrors the SAME documents — the
        # planted max span length is then replica-invariant.
        rep = base.unionByName(
            base.where(F.col("doc_id") % 97 == 0).select(
                (F.col("doc_id") + F.lit(1 << 50)).alias("doc_id"), "text"
            )
        ).select(
            (F.col("doc_id") + F.lit(i * (1 << 32))).alias("doc_id"),
            F.translate(F.col("text"), "aeiou", PERMS[i % len(PERMS)]).alias(
                "text"
            ),
        )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run(spark, replicas: int):
    docs = corpus(spark, replicas)
    t0 = time.time()
    n_pos = sx.token_positions(docs).count()
    spans = sx.longest_dup_span(docs).collect()
    sa_rounds = sx.LAST_ROUNDS
    wall = time.time() - t0
    max_len = max((r.len_words for r in spans), default=0)
    return {
        "replicas": replicas,
        "positions": n_pos,
        "rounds": sa_rounds,
        "span_len": max_len,
        "n_spans": len(spans),
        "wall_s": round(wall, 1),
    }


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    r1 = run(spark, 1)
    print(f"1x : {r1}")
    rn = run(spark, FACTOR)
    print(f"{FACTOR}x: {rn}")

    assert rn["rounds"] == r1["rounds"], (
        "doubling rounds must be corpus-size independent",
        r1["rounds"],
        rn["rounds"],
    )
    # replicas preserve token counts exactly (translate keeps word
    # shapes); mirrors add the same planted share per replica.
    assert rn["positions"] == FACTOR * r1["positions"], (
        r1["positions"],
        rn["positions"],
    )
    assert rn["span_len"] == r1["span_len"], (r1, rn)
    print(
        f"| scale | positions | rounds | wall_s |\n|---|---|---|---|\n"
        f"| 1x | {r1['positions']} | {r1['rounds']} | {r1['wall_s']} |\n"
        f"| {FACTOR}x | {rn['positions']} | {rn['rounds']} | "
        f"{rn['wall_s']} | (x{rn['wall_s'] / max(r1['wall_s'], 0.1):.1f})"
    )
    print("PROBE PASS")
    spark.stop()


if __name__ == "__main__":
    main()
