#!/usr/bin/env python3
"""Measured scale probe for the streaming KEYED-STATE operators — the
last operator family without beyond-suite volume evidence (r9 verdict
ask #1). Targets the two state layouts the engine ships:

- ``streaming/sliding.py sliding_sax_stream`` — per-SERIES ring-buffer
  state (<= n doubles/key), the Spark twin of the reference's whole
  product (src/symtseries.c:481-492). Axes: event volume at fixed key
  cardinality, and key cardinality at fixed volume (state rows == keys;
  the handler runs once per key per micro-batch, so Python per-group
  overhead is the scaling liability to measure).
- ``streaming/minhash.py streaming_minhash_dedup`` — per-LSH-BUCKET
  claimant state (one long/bucket). Axes: document volume (occupied
  buckets ~ docs x bands, so state rows AND per-batch handler calls
  scale with volume) in BOTH state layouts (per-bucket vs hash-sharded
  ``shard_state``), and band count at fixed volume (key cardinality at
  constant input rows).

Every leg replays BATCHES id-ordered parquet files through a real
``writeStream`` (parquet sink + checkpoint — rows never collect to the
driver), records per-batch wall / state rows / state-store bytes from
the progress events, then verifies the full output against the BATCH
twin (``operators/windows.sliding_sax``; the grouped min-claimant rule
for minhash) via count + bit_xor(xxhash64(...)) checksums — the same
parity contract the registered stream queries' oracles gate at suite
scale. The minhash corpus embeds exact replicas (1 in 10), so a
closed-form invariant (every replica flagged) runs too.

Env knobs: SPARK_GRAFT_STREAM_BASE_ROWS (default 1e6 events),
SPARK_GRAFT_STREAM_BASE_KEYS (1e3), SPARK_GRAFT_STREAM_BASE_DOCS (1e4),
SPARK_GRAFT_STREAM_FACTORS (1,10,100), SPARK_GRAFT_STREAM_BATCHES (8),
SPARK_GRAFT_CPUS, SPARK_GRAFT_DRIVER_MEM, SPARK_GRAFT_STREAM_LEGS
(csv subset of: slide_vol, slide_keys, mh_vol, mh_bands).
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from symtseries_spark.operators.windows import sliding_sax
from symtseries_spark.streaming.minhash import (
    minhash_band_structs,
    streaming_minhash_dedup,
)
from symtseries_spark.streaming.sliding import sliding_sax_stream

BASE_ROWS = int(os.environ.get("SPARK_GRAFT_STREAM_BASE_ROWS", "1000000"))
BASE_KEYS = int(os.environ.get("SPARK_GRAFT_STREAM_BASE_KEYS", "1000"))
BASE_DOCS = int(os.environ.get("SPARK_GRAFT_STREAM_BASE_DOCS", "10000"))
FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_STREAM_FACTORS", "1,10,100").split(",")
]
BATCHES = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "8"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
LEGS = set(
    os.environ.get(
        "SPARK_GRAFT_STREAM_LEGS", "slide_vol,slide_keys,mh_vol,mh_bands"
    ).split(",")
)

SAX = dict(n=8, w=4, c=8)  # the registered sliding-SAX suite params
MH = dict(k=7, num_hashes=16, bands=8, seed=7)

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("streaming-state-scale-probe")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.sql.adaptive.enabled", "true")
    .config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    )
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def stage_batches(make_batch, n_rows: int, tmp: str) -> str:
    """Write BATCHES id-ordered parquet files (file b = ids
    [b*n/B, (b+1)*n/B), increasing mtimes + lexicographic names) so the
    file stream replays them as id-ordered micro-batches — the same
    convention the registered stream queries use. Generation stays
    parallel; repartition(1) only gates the writer (row order within a
    file is irrelevant: both state handlers sort within the batch)."""
    import glob as globmod

    indir = f"{tmp}/in"
    os.makedirs(indir, exist_ok=True)
    per = n_rows // BATCHES
    t0 = 1_000_000_000
    for b in range(BATCHES):
        lo, hi = b * per, (b + 1) * per if b < BATCHES - 1 else n_rows
        staged = f"{tmp}/staged_{b}"
        make_batch(lo, hi).repartition(1).write.parquet(staged)
        part = globmod.glob(f"{staged}/part-*.parquet")[0]
        dst = f"{indir}/b{b:04d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (t0 + b, t0 + b))
        shutil.rmtree(staged)
    return indir


def run_stream(stream_df, tmp: str):
    """Drive the stream to a parquet sink (never the driver), return
    (wall_seconds, progress_metrics)."""
    out, chk = f"{tmp}/out", f"{tmp}/chk"
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .start()
    )
    t0 = time.perf_counter()
    q.processAllAvailable()
    wall = time.perf_counter() - t0
    progress = []
    for p in q.recentProgress:
        progress.append(p if isinstance(p, dict) else json.loads(p.json))
    q.stop()
    return wall, out, progress


def prog_summary(progress) -> dict:
    rows = [p for p in progress if p.get("numInputRows", 0) > 0]
    trig = [p.get("durationMs", {}).get("triggerExecution", 0) for p in rows]
    ops = [
        (p.get("stateOperators") or [{}])[0] for p in rows
    ]
    return {
        "batches": len(rows),
        "max_trigger_s": max(trig, default=0) / 1000.0,
        "state_rows": max((o.get("numRowsTotal") or 0) for o in ops) if ops else 0,
        "state_mb": max((o.get("memoryUsedBytes") or 0) for o in ops) / 1e6
        if ops
        else 0.0,
    }


def checksum(df, *cols):
    """Order-insensitive exact fingerprint: (count, bit_xor of row
    hashes). NULLs are canonicalized so both sides hash identically."""
    h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in cols])
    row = df.select(h.alias("__h")).agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(__h)").alias("x")
    )
    r = row.first()
    return (r["n"], r["x"])


results = []


def leg(name: str, factor: int, n_rows: int, wall: float, summary: dict,
        parity_ok: bool, t1: dict, extra: str = ""):
    base = t1.setdefault(name, wall)
    line = (
        f"{name:10s} x{factor:<4d} rows={n_rows:>12,d} wall={wall:8.2f}s "
        f"ratio={wall / base:6.2f} batch_max={summary['max_trigger_s']:7.2f}s "
        f"state_rows={summary['state_rows']:>11,d} "
        f"state_mb={summary['state_mb']:8.1f} "
        f"parity={'OK' if parity_ok else 'FAIL'}{extra}"
    )
    print(line, flush=True)
    results.append(parity_ok)


# ---------------------------------------------------------------- sliding SAX

def slide_batch_maker(n_keys: int):
    def make(lo: int, hi: int):
        return spark.range(lo, hi).select(
            (F.col("id") % n_keys).alias("series_id"),
            F.col("id").alias("seq"),
            (F.sin(F.col("id") * 0.001) * 10.0 + (F.col("id") % 17))
            .cast("double")
            .alias("value"),
        )
    return make


def run_slide(factor: int, n_rows: int, n_keys: int, axis: str, t1: dict):
    tmp = tempfile.mkdtemp(prefix=f"probe_slide_{axis}_")
    try:
        indir = stage_batches(slide_batch_maker(n_keys), n_rows, tmp)
        schema = "series_id bigint, seq bigint, value double"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(indir)
        )
        words = sliding_sax_stream(
            stream, key="series_id", order=["seq"], value="value", **SAX
        )
        wall, out, progress = run_stream(words, tmp)
        got = spark.read.parquet(out)
        want = sliding_sax(
            spark.read.parquet(indir),
            key="series_id", order="seq", value="value", **SAX,
        ).select("series_id", "seq", "sax_word")
        ok = checksum(got, "series_id", "seq", "sax_word") == checksum(
            want, "series_id", "seq", "sax_word"
        )
        leg(f"slide_{axis}", factor, n_rows, wall, prog_summary(progress),
            ok, t1, extra=f" keys={n_keys:,}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ------------------------------------------------------------- minhash dedup

def mh_batch_maker():
    def make(lo: int, hi: int):
        # 1 doc in 10 is an EXACT replica of its group's first doc: the
        # closed-form invariant (every replica must be flagged dup)
        base = F.when(
            F.col("id") % 10 == 9, F.col("id") - 9
        ).otherwise(F.col("id"))
        token = lambda j: F.substring(
            F.md5(F.concat_ws("_", base.cast("string"), j.cast("string"))), 1, 8
        )
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ", F.transform(F.sequence(F.lit(1), F.lit(30)), token)
            ).alias("text"),
        )
    return make


def mh_batch_verdicts(docs, bands: int, num_hashes: int):
    """The id-ordered replay rule in batch form: a doc's dup_of is the
    bucket-global min id when that min precedes it — exactly what the
    stream's running claimant yields when micro-batches arrive in id
    order (the registered oracle's rule, at probe scale)."""
    banded = docs.select(
        "doc_id",
        F.explode(
            minhash_band_structs(
                F.col("text"), k=MH["k"], num_hashes=num_hashes,
                bands=bands, seed=MH["seed"],
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band_id", "bk.band_key")
    claim = banded.groupBy("band_id", "band_key").agg(
        F.min("doc_id").alias("claimant")
    )
    return (
        banded.join(claim, ["band_id", "band_key"])
        .groupBy("doc_id")
        .agg(
            F.min(
                F.when(F.col("claimant") < F.col("doc_id"), F.col("claimant"))
            ).alias("dup_min")
        )
    )


def run_mh(factor: int, n_docs: int, bands: int, num_hashes: int, axis: str,
           t1: dict, shard_state=None):
    tmp = tempfile.mkdtemp(prefix=f"probe_mh_{axis}_")
    try:
        indir = stage_batches(mh_batch_maker(), n_docs, tmp)
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(indir)
        )
        per_band = streaming_minhash_dedup(
            stream, k=MH["k"], num_hashes=num_hashes, bands=bands,
            seed=MH["seed"], shard_state=shard_state,
        )
        wall, out, progress = run_stream(per_band, tmp)
        got = (
            spark.read.parquet(out)
            .groupBy("doc_id")
            .agg(F.min("dup_of").alias("dup_min"))
        )
        want = mh_batch_verdicts(
            spark.read.parquet(indir), bands=bands, num_hashes=num_hashes
        )
        ok = checksum(got, "doc_id", "dup_min") == checksum(
            want, "doc_id", "dup_min"
        )
        # closed-form: every exact replica (id%10==9) must be flagged
        missed = got.where(
            (F.col("doc_id") % 10 == 9) & F.col("dup_min").isNull()
        ).count()
        mode = f" shard={shard_state}" if shard_state else " per-bucket"
        leg(f"mh_{axis}", factor, n_docs, wall, prog_summary(progress),
            ok and missed == 0, t1,
            extra=f" bands={bands}{mode} missed_replicas={missed}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


print(
    f"streaming keyed-state scale probe: base_rows={BASE_ROWS:,} "
    f"base_keys={BASE_KEYS:,} base_docs={BASE_DOCS:,} "
    f"factors={FACTORS} batches={BATCHES} cpus={CPUS} legs={sorted(LEGS)}",
    flush=True,
)

if "slide_vol" in LEGS:
    t1 = {}
    for f_ in FACTORS:
        run_slide(f_, BASE_ROWS * f_, 10 * BASE_KEYS, "vol", t1)
if "slide_keys" in LEGS:
    t1 = {}
    for f_ in FACTORS:
        run_slide(f_, 10 * BASE_ROWS, BASE_KEYS * f_, "keys", t1)
if "mh_vol" in LEGS:
    t1 = {}
    for f_ in FACTORS:
        run_mh(f_, BASE_DOCS * f_, MH["bands"], MH["num_hashes"], "vol", t1)
    t1 = {}
    for f_ in FACTORS:
        run_mh(f_, BASE_DOCS * f_, MH["bands"], MH["num_hashes"], "vol_shard",
               t1, shard_state=int(CPUS) * 2)
if "mh_bands" in LEGS:
    t1 = {}
    for bands in (2, 8, 32):
        run_mh(bands // 2, 10 * BASE_DOCS, bands, 32, "bands", t1)

sys.exit(0 if all(results) else 1)
