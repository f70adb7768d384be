#!/usr/bin/env python3
"""100x-class scale probe for the PAIR-GENERATING dedup/ANN legs (r3
verdict item #6): dedup_winnow_pairs / dedup_jaccard / dedup_containment
(inverted-index self-join fanout under the hot-key caps) and
emb_near_dup_lsh (bucket collision growth) at sf1-equivalent volume
(FACTOR=10 x sf0.1 = 50k docs / 20k vectors — 100x the sf0.01
correctness tables).

These operators were deliberately EXCLUDED from scripts/scale_probe.py
because naive replication inflates their OUTPUT quadratically (replicas
are near-dups of each other), which measures the replication trick, not
the operator. This probe replicates the way real corpora grow instead:

- documents: each replica's text goes through a DISTINCT vowel
  permutation (``translate(text, 'aeiou', perm_i)``) — word shapes,
  lengths, and per-replica term-frequency distributions are preserved,
  but shingle/fingerprint SETS are disjoint across replicas, so the
  inverted index grows linearly in rows with per-key frequency held
  constant (how fresh content behaves). Intra-replica duplicate
  structure is preserved, so pair OUTPUT grows linearly too.
- embeddings: each replica applies a per-replica dimension ROTATION +
  sign flip to every vector — norms and intra-replica cosines are
  EXACTLY preserved (the original near-dup pair set reappears once per
  replica => linear output), while cross-replica cosines scramble to
  background level.

For emb_near_dup_lsh the probe runs TWO legs:
- fixed num_planes=3 (the registered validation config): in-bucket
  candidate pairs grow ~quadratically because occupancy n/2^planes
  grows linearly — the measured anti-pattern;
- planes scaled with data (3 + log2(FACTOR) ~ 6-7): occupancy held
  ~constant, candidate pairs ~linear — the documented 100 TB rule
  (planes must track log2(n); see BASELINE.md).

Prints a markdown ratio table (time, output rows, and for LSH the
candidate-pair count sum over C(bucket_size, 2)).
"""
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as E

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))

# distinct per-replica letter permutations (perm 0 = identity). The
# 5 vowels alone give 120 permutations — enough for FACTOR <= 120 —
# but at FACTOR=100 most pairs of replicas would differ in vowels
# only, and high-frequency short shingles can still collide. So each
# replica also permutes a consonant group, with the SAME permutation
# structure as its vowel permutation (one shared index, not a cross
# product): 120 translations total, but any two replicas now differ
# in BOTH groups — the pairwise-disjointness the probe needs.
_VOWELS = "aeiou"
_CONS = "rstln"


def _perm_tables(n: int) -> list[tuple[str, str]]:
    """First ``n`` (vowel_perm, consonant_perm) pairs, identity first,
    enumerated so no two replicas share EITHER group's permutation."""
    from itertools import permutations

    vps = ["".join(p) for p in permutations(_VOWELS)]
    if n > len(vps):
        raise SystemExit(
            f"FACTOR={n} exceeds the {len(vps)} distinct permutations"
        )
    # pair vowel perm i with consonant perm i (both sequences distinct
    # => any two replicas differ in both groups)
    return [(vps[i], vps[i].translate(str.maketrans(_VOWELS, _CONS)))
            for i in range(n)]


def _write_single_file(df, dest: str) -> None:
    import glob

    tmp = dest + "_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    if os.path.exists(dest):
        shutil.rmtree(dest) if os.path.isdir(dest) else os.remove(dest)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def _rotation(i: int, dim: int) -> tuple[list[int], list[int]]:
    """Deterministic per-replica dimension permutation + sign pattern."""
    import random

    rng = random.Random(1000 + i)
    perm = list(range(dim))
    if i:
        rng.shuffle(perm)
    signs = [1] * dim if not i else [rng.choice((-1, 1)) for _ in range(dim)]
    return perm, signs


def build_scaled(
    spark: SparkSession,
    out: str,
    dim: int = 64,
    factor: int | None = None,
) -> None:
    """``factor`` defaults to this module's env-read FACTOR; callers
    from other scripts (scale_probe_funnel) MUST pass their own — the
    r10 funnel probe's first run built a 10x corpus under a 100x
    label because the two modules read the env independently."""
    factor = FACTOR if factor is None else factor
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    perms = _perm_tables(factor)
    dparts = []
    for i in range(factor):
        vp, cp = perms[i]
        dparts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"),
                F.translate(F.col("text"), _VOWELS + _CONS, vp + cp)
                .alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    scaled = dparts[0]
    for p in dparts[1:]:
        scaled = scaled.unionByName(p)
    _write_single_file(scaled, f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    others = [c for c in emb.columns if c not in ("vec_id", "embedding")]
    eparts = []
    for i in range(factor):
        perm, signs = _rotation(i, dim)
        rotated = F.array(
            *[
                (F.element_at(F.col("embedding"), perm[j] + 1) * signs[j]).cast(
                    "float"
                )
                for j in range(dim)
            ]
        )
        eparts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * 10**9)).alias("vec_id"),
                rotated.alias("embedding"),
                *others,
            )
        )
    scaled_e = eparts[0]
    for p in eparts[1:]:
        scaled_e = scaled_e.unionByName(p)
    _write_single_file(scaled_e, f"{out}/embeddings.parquet")

    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        src = f"{BASE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if os.path.isfile(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)


def lsh_candidate_pairs(spark, sf_dir: str, num_planes: int, dim: int) -> int:
    """sum over buckets of C(n_b, 2) — the join's candidate volume."""
    from symtseries_spark.operators.simsearch import hyperplanes, lsh_bucket
    from symtseries_spark.sources import load

    planes = hyperplanes(num_planes, dim, 13)
    occ = (
        load(spark, sf_dir, "embeddings")
        .select(lsh_bucket(F.col("embedding"), planes).alias("b"))
        .groupBy("b")
        .count()
    )
    row = occ.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs")
    ).first()
    return int(row["pairs"] or 0)


def timed(fn, spark, sf_dir):
    df = fn(spark, sf_dir)
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-probe-pairs")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = os.path.join(tempfile.gettempdir(), f"scaled_pairs_{FACTOR}x")
    print(f"[probe] building {FACTOR}x pair-probe replica at {out}",
          file=sys.stderr)
    build_scaled(spark, out)

    try:
        with open("/proc/loadavg") as fh:
            print(f"[probe] loadavg: {fh.read().strip()}", file=sys.stderr)
    except OSError:
        pass

    qdict = E.queries()
    rows = []
    for name in ("dedup_winnow_pairs", "dedup_jaccard", "dedup_containment"):
        fn = qdict[name]
        fn(spark, BASE).write.format("noop").mode("overwrite").save()  # warm
        tb, nb = timed(fn, spark, BASE)
        ts, ns = timed(fn, spark, out)
        rows.append((name, tb, nb, ts, ns))
        print(f"[probe] {name}: base {tb:.2f}s/{nb} rows  "
              f"{FACTOR}x {ts:.2f}s/{ns} rows  time x{ts/tb:.2f} "
              f"rows x{ns/max(nb,1):.2f}", file=sys.stderr)

    # emb_near_dup_lsh fixed-planes leg at scale is the measured
    # ANTI-pattern (first probe run: it alone exceeded a 10-minute
    # budget at 10x — candidate pairs grow ~x100 for x10 rows at
    # constant plane count). Execute only the base leg; quantify the
    # scaled fixed-planes leg by its candidate-pair volume instead of
    # burning the quadratic join, and execute the occupancy-held
    # (scaled-planes) leg in full.
    fn = qdict["emb_near_dup_lsh"]
    fn(spark, BASE).write.format("noop").mode("overwrite").save()  # warm
    lsh_tb, lsh_nb = timed(fn, spark, BASE)
    print(f"[probe] emb_near_dup_lsh: base {lsh_tb:.2f}s/{lsh_nb} rows",
          file=sys.stderr)

    # scaled-planes leg: num_planes tracking log2(n) keeps bucket
    # occupancy constant — the 100 TB deployment rule
    from symtseries_spark.operators import embedding_near_dup_lsh
    from symtseries_spark.sources import load

    extra = max(1, round(math.log2(FACTOR)))
    scaled_planes = E.NEAR_DUP_PLANES + extra
    df = embedding_near_dup_lsh(
        load(spark, out, "embeddings"),
        threshold=E.EMB_NEAR_DUP_LSH,
        num_planes=scaled_planes,
        seed=13,
        dim=E.EMB_DIM,
    )
    t0 = time.perf_counter()
    n_sp = df.count()
    t_sp = time.perf_counter() - t0

    cand = {
        "base_p3": lsh_candidate_pairs(spark, BASE, E.NEAR_DUP_PLANES, E.EMB_DIM),
        "scaled_p3": lsh_candidate_pairs(spark, out, E.NEAR_DUP_PLANES, E.EMB_DIM),
        "scaled_pN": lsh_candidate_pairs(spark, out, scaled_planes, E.EMB_DIM),
    }

    # round-4 embedding analytics at 10x vectors. kmeans with k held
    # FIXED is broadcast-argmin work linear in rows (the PAIR stage is
    # where fixed-k goes quadratic — measured separately via the
    # in-cluster pair-volume table in BASELINE.md); pca is pure
    # two-pass scan arithmetic, the most linear thing in the repo.
    for name in ("emb_kmeans", "emb_pca_power", "emb_abtt_topk"):
        fn = qdict[name]
        fn(spark, BASE).write.format("noop").mode("overwrite").save()  # warm
        tb, nb = timed(fn, spark, BASE)
        ts, ns = timed(fn, spark, out)
        rows.append((name, tb, nb, ts, ns))
        print(f"[probe] {name}: base {tb:.2f}s/{nb} rows  "
              f"{FACTOR}x {ts:.2f}s/{ns} rows  time x{ts/tb:.2f} "
              f"rows x{ns/max(nb,1):.2f}", file=sys.stderr)

    print(f"\n| query | sf0.1 time/rows | {FACTOR}x time/rows | time ratio |"
          " rows ratio |")
    print("|---|---|---|---|---|")
    for name, tb, nb, ts, ns in rows:
        print(f"| {name} | {tb:.2f}s / {nb} | {ts:.2f}s / {ns} "
              f"| {ts/tb:.2f}x | {ns/max(nb,1):.2f}x |")
    print(f"| emb_near_dup_lsh (planes={scaled_planes} at {FACTOR}x) "
          f"| {lsh_tb:.2f}s / {lsh_nb} | {t_sp:.2f}s / {n_sp} "
          f"| {t_sp/lsh_tb:.2f}x | {n_sp/max(lsh_nb,1):.2f}x |")
    print(f"\nemb_near_dup_lsh candidate pairs (sum C(bucket,2)):")
    print(f"- planes=3 @1x: {cand['base_p3']:,}")
    print(f"- planes=3 @{FACTOR}x: {cand['scaled_p3']:,} "
          f"(x{cand['scaled_p3']/max(cand['base_p3'],1):.1f} — the quadratic"
          f" anti-pattern; join deliberately NOT executed)")
    print(f"- planes={scaled_planes} @{FACTOR}x: {cand['scaled_pN']:,} "
          f"(x{cand['scaled_pN']/max(cand['base_p3'],1):.1f} vs 1x baseline "
          f"— occupancy-held leg, executed above)")
    spark.stop()


if __name__ == "__main__":
    main()
