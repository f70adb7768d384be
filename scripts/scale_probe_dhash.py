#!/usr/bin/env python3
"""Scale probe for the dHash banded pair join (r11 verdict item #1).

Measures the one number that decides whether the (band, chunk)
self-join survives a corpus scale-up: the CANDIDATE pair count
``sum over buckets of C(n, 2)``. Three legs at sf0.1 x FACTOR:

1. base (N docs), wide hash 13 rows x 8-bit chunks, radius 12 — the
   registered media_dhash_wide_pairs shape; full join executed.
2. 10N, SAME chunk width — the anti-pattern: occupancy grows
   linearly, candidates ~quadratically (expected ratio ~FACTOR^2).
   The join is NOT executed (that is the point); instead the probe
   verifies the ``max_bucket`` fail-fast trips at the registered cap.
3. 10N, chunk width grown by log2(FACTOR) (13 rows x 12-bit chunks:
   cols 9 -> 13) — the documented 100 TB rule (chunk bits must track
   log2(corpus), i.e. widen the HASH): occupancy held ~constant,
   candidates ~linear (expected ratio ~FACTOR); full join executed.

Corpus growth follows scale_probe_pairs.py: each replica's text goes
through a distinct letter translation, so replica hashes decorrelate
(fresh content), while planted 1-byte-perturbation twins (the
registered %41 rule) grow linearly — output pairs must track them.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from symtseries_spark.operators.multimodal import (
    dhash_pairs_wide,
    media_dhash_wide,
    media_from_documents,
)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
RADIUS = 12
ROWS = 13
TWIN_MOD = 41
TWIN_OFF = 1 << 40
CAP = 512

# per-replica letter rotations (replica 0 = identity): translate both
# a vowel and a consonant group so replica hashes decorrelate
SRC = "aeioubcdfg"
PERMS = [
    # independent vowel / consonant rotations: (i % 5, i // 5) pairs
    # are distinct for i < 25, so every replica gets its own map
    SRC[i % 5:5] + SRC[:i % 5]
    + SRC[5 + (i // 5) % 5:] + SRC[5:5 + (i // 5) % 5]
    for i in range(25)
]


def corpus(spark: SparkSession, factor: int) -> DataFrame:
    docs = spark.read.parquet(f"{BASE}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    parts = []
    for i in range(factor):
        perm = PERMS[i % len(PERMS)]
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                F.translate(F.col("text"), SRC, perm).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    twins = out.where(
        (F.col("doc_id") % TWIN_MOD == 0) & (F.length("text") >= 63)
    ).select(
        (F.col("doc_id") + F.lit(TWIN_OFF)).alias("doc_id"),
        F.concat(
            F.lit("~"), F.expr("substring(text, 2, length(text) - 1)")
        ).alias("text"),
    )
    return media_from_documents(out.unionByName(twins))


def candidates(media: DataFrame, *, rows: int, cols: int) -> int:
    """sum over (band, chunk) buckets of C(n, 2) — the join's true
    cost, from ONE combinable groupBy over the chunk index."""
    h = media_dhash_wide(media, rows=rows, cols=cols)
    return (
        h.select(F.posexplode("dhash_rows").alias("band", "chunk"))
        .groupBy("band", "chunk")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) div 2")).alias("c"))
        .collect()[0]["c"]
    )


def run_leg(media: DataFrame, *, cols: int, label: str) -> dict:
    t0 = time.time()
    cand = candidates(media, rows=ROWS, cols=cols)
    pairs = dhash_pairs_wide(
        media, max_hamming=RADIUS, rows=ROWS, cols=cols
    )
    twin_rows = pairs.where(F.col("media_b") >= TWIN_OFF).count()
    out_rows = pairs.count()
    dt = time.time() - t0
    print(
        f"| {label} | {cols - 1} | {cand:,} | {out_rows:,} "
        f"| {twin_rows:,} | {dt:.1f}s |"
    )
    return {"cand": cand, "out": out_rows, "twins": twin_rows, "t": dt}


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-probe-dhash")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = corpus(spark, 1).persist()
    big = corpus(spark, FACTOR).persist()
    n_base, n_big = base.count(), big.count()
    print(f"corpus: base {n_base:,} -> {FACTOR}x {n_big:,} media\n")
    print("| leg | chunk bits | candidates | pairs out | twin pairs | time |")
    print("|---|---|---|---|---|---|")

    r1 = run_leg(base, cols=9, label=f"base N={n_base:,}")

    # anti-pattern leg: fixed 8-bit chunks at FACTOR x — count
    # candidates only (executing the join is what we refuse to do)
    t0 = time.time()
    cand_fixed = candidates(big, rows=ROWS, cols=9)
    worst = (
        media_dhash_wide(big, rows=ROWS, cols=9)
        .select(F.posexplode("dhash_rows").alias("band", "chunk"))
        .groupBy("band", "chunk")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()[0]["mx"]
    )
    print(
        f"| {FACTOR}x fixed width | 8 | {cand_fixed:,} | (not run) "
        f"| — | {time.time() - t0:.1f}s |"
    )
    tripped = False
    try:
        dhash_pairs_wide(big, max_hamming=RADIUS, rows=ROWS, max_bucket=CAP)
    except ValueError as e:
        tripped = "max_bucket" in str(e)
    print(
        f"|   worst bucket {worst:,} vs max_bucket={CAP}: "
        f"fail-fast tripped={tripped} | | | | | |"
    )

    r3 = run_leg(big, cols=13, label=f"{FACTOR}x scaled width")

    cand_ratio_fixed = cand_fixed / max(1, r1["cand"])
    cand_ratio_scaled = r3["cand"] / max(1, r1["cand"])
    twin_ratio = r3["twins"] / max(1, r1["twins"])
    print(
        f"\ncandidate ratio at {FACTOR}x: fixed-width "
        f"{cand_ratio_fixed:.1f}x (quadratic regime ~{FACTOR**2}x), "
        f"scaled-width {cand_ratio_scaled:.1f}x (linear regime "
        f"~{FACTOR}x); twin output ratio {twin_ratio:.1f}x"
    )
    # the guard must agree with the measured occupancy: trip iff the
    # worst fixed-width bucket actually exceeds the registered cap
    assert tripped == (worst > CAP), (
        f"fail-fast inconsistent: worst={worst}, cap={CAP}, "
        f"tripped={tripped}"
    )
    assert cand_ratio_scaled < cand_ratio_fixed / 3, (
        "scaled chunk width did not flatten candidate growth"
    )
    print("PROBE PASS")


if __name__ == "__main__":
    main()
