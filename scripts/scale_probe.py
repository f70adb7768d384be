#!/usr/bin/env python3
"""Measured scaling probe: replicate the sf0.1 events/documents tables
``FACTOR``x into a temp directory (key-shifted so the data grows the way
real data grows — more users / more documents over the same time span,
no artificial duplicate content) and run the volume-driven driver
queries at both scales. Prints a per-query ratio table; a ratio near the
data factor means linear scaling on a fixed-core host (the best a CPU-
bound operator can do); sublinear means fixed costs still dominate at
sf0.1.

Replication scheme:
- events: user_id' = user_id + i*1_000_000, event_id' shifted by
  i*10**12 — every replica is a fresh cohort of users over the same
  period, so sessions/as-of/rolling windows per key keep their shape and
  the KEY CARDINALITY grows 10x (the dimension that matters for state
  and shuffle width).
- documents: doc_id' shifted by i*10**9; every replica's text gets a
  distinct ``repN`` trailing token, so exact/incremental dedup stays
  honest (replicas are NOT byte-duplicates) while length/term statistics
  are preserved to first order.

Self-joins whose cost is output-bound (near-dup pair generation at a
fixed threshold over replicated content) are deliberately excluded:
replication inflates their OUTPUT quadratically, which measures the
replication trick, not the operator.
"""
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

QUERIES = [
    # events: windowed / sessionized / joined — key-cardinality-driven
    "events_sessions",
    "events_asof_join",
    "events_interval_agg",
    "events_rolling_1h",
    "events_anomaly",
    "events_gapfill",
    "events_funnel",
    "events_cube",
    "events_ewma",
    "events_quantiles",
    # documents: scan-stage + broadcast-agg pipeline ops
    "text_quality",
    "docs_chunk",
    "docs_scrub",
    "docs_unigram_lp",
    "docs_vocab_coverage",
    "docs_train_order",
    "docs_contamination",
    "dedup_exact",
    "dedup_incremental",
    "docs_pmi_bigrams",
    # round-3 continuation ops: trend/robust-anomaly/CUSUM/Holt are
    # key-cardinality-driven windows; boilerplate/bigram/HLL are
    # scan + vocabulary-bounded broadcast aggregates; winnow is the
    # fingerprint inverted index (content unique per replica, so the
    # index grows linearly and pair output stays output-bound-honest)
    "events_cusum",
    "events_holt",
    "events_mad_anomaly",
    "events_trend",
    "docs_boilerplate",
    "docs_bigram_lp",
    "docs_hll_distinct",
    "docs_winnow",
    "emb_int8_quant",
    # round-4 additions: STL/ACF/seasonal-anomaly are key-cardinality-
    # driven series passes; numerosity is the sliding shuffle shape;
    # discords' candidate set is rare-word-bounded; the docs ops are
    # scan + bounded-key-space aggregates (dsir: 1024 buckets; entropy:
    # alphabet; novelty: linear first-occurrence index; ccnet: global
    # rank over doc-count rows)
    "events_stl",
    "events_acf",
    "events_seasonal_anomaly",
    "sax_numerosity",
    "sax_discords",
    "docs_novelty",
    "docs_char_entropy",
    "docs_dsir_weights",
    "docs_ccnet_bucket",
    # round-4 third batch: HW is the heaviest window fold in the repo
    # (O(window x season)/row); the backtest runs all three family
    # folds plus evaluation joins; the funnel chains three dedup stages
    # (content unique per replica keeps its pair stages output-honest)
    "events_hw",
    "events_forecast_backtest",
    "docs_dedup_funnel",
    # round-4 fourth batch: changepoint/STL-strength are single-shuffle
    # series passes (candidate rows = input rows); zipf is the
    # top-terms shuffle + a |lang|*100-row OLS; pagerank's edge list is
    # replica-local (content unique per replica keeps the pair graph
    # linear in replicas), so 5 rounds scale with |pairs|
    "events_changepoint",
    "events_stl_strength",
    "docs_zipf_slope",
    "dedup_pagerank",
    # round-4 fifth batch: changepoint2 doubles the window stack on the
    # same shuffle; PH/TWAP/OHLC/moments are single-pass series ops;
    # hist-quantiles collapses to 256 rows; RFM/skew/audience run over
    # key-cardinality tables; session-sizes rides the sessionize
    # window; hll_by_type is groups x m registers; triangles' pair
    # graph stays replica-local (content unique per replica)
    "events_changepoint2",
    "events_page_hinkley",
    "events_twap",
    "events_ohlc",
    "events_moments",
    "events_hist_quantiles",
    "events_rfm",
    "events_session_sizes",
    "events_key_skew",
    "events_hll_by_type",
    "events_audience_overlap",
    "events_dominant_period",
    "dedup_triangles",
]

# Stateful streaming replays: timed WITHOUT a warm pass (each call
# rebuilds its own checkpoint/replay staging, so the measurement is the
# full replay at each scale). The interesting dimension is keyed-state
# cardinality: 10x the users = 10x session/join state rows.
STREAMING_QUERIES = [
    "events_sessions_stream",
    "events_stream_join",
    "events_ewma_stream",
    "dedup_exact_stream",
]


def _write_single_file(df, dest: str) -> None:
    """Write as ONE parquet FILE named like the testdata layout (the
    streaming loader's pathGlobFilter matches files, not directories)."""
    import glob

    tmp = dest + "_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    if os.path.exists(dest):
        shutil.rmtree(dest) if os.path.isdir(dest) else os.remove(dest)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def build_scaled(spark: SparkSession, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    parts = []
    for i in range(FACTOR):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * 10**12)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    scaled_ev = parts[0]
    for p in parts[1:]:
        scaled_ev = scaled_ev.unionByName(p)
    _write_single_file(scaled_ev, f"{out}/events.parquet")

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    dparts = []
    for i in range(FACTOR):
        dparts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10**9)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" rep{i}")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + F.lit(5)).alias("n_chars"),
            )
        )
    scaled_docs = dparts[0]
    for p in dparts[1:]:
        scaled_docs = scaled_docs.unionByName(p)
    _write_single_file(scaled_docs, f"{out}/documents.parquet")

    # embeddings: id-shifted replicas (vectors unchanged — the probed
    # query is a per-row scan, so row count is the scaling dimension;
    # pair-generating queries are excluded from the probe by design)
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    eparts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * 10**9)).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        for i in range(FACTOR)
    ]
    scaled_emb = eparts[0]
    for p in eparts[1:]:
        scaled_emb = scaled_emb.unionByName(p)
    _write_single_file(scaled_emb, f"{out}/embeddings.parquet")

    # remaining tables unscaled so load() never fails
    for t in (
        "region nation customer supplier part orders lineitem"
    ).split():
        src = f"{BASE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if os.path.isfile(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = os.path.join(tempfile.gettempdir(), f"scaled_{FACTOR}x")
    print(f"[probe] building {FACTOR}x replica at {out}", file=sys.stderr)
    build_scaled(spark, out)

    qdict = E.queries()
    rows = []
    only = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
    names = QUERIES + STREAMING_QUERIES
    if only:
        keep = {n.strip() for n in only.split(",")}
        names = [n for n in names if n in keep]
    for name in names:
        fn = qdict[name]
        # warm plan/codegen at base scale (batch only), then time both
        if name not in STREAMING_QUERIES:
            fn(spark, BASE).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        fn(spark, BASE).write.format("noop").mode("overwrite").save()
        t_base = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, out).write.format("noop").mode("overwrite").save()
        t_scaled = time.perf_counter() - t0
        rows.append((name, t_base, t_scaled, t_scaled / t_base))
        print(
            f"[probe] {name}: base {t_base:.2f}s  {FACTOR}x {t_scaled:.2f}s"
            f"  ratio {t_scaled / t_base:.2f}",
            file=sys.stderr,
        )
    print(f"\n| query | sf0.1 | {FACTOR}x data | time ratio |")
    print("|---|---|---|---|")
    for name, tb, ts, r in rows:
        print(f"| {name} | {tb:.2f}s | {ts:.2f}s | {r:.2f}x |")
    geo = 1.0
    for *_, r in rows:
        geo *= r
    geo **= 1.0 / len(rows)
    print(
        f"\ngeometric-mean time ratio at {FACTOR}x data: {geo:.2f}x "
        f"(1.0 = fully fixed-cost-dominated, {FACTOR}.0 = perfectly "
        f"linear CPU-bound on fixed cores)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
