#!/usr/bin/env python3
"""Regenerate docs/PLANS.md: capture `.explain("formatted")` for the
flagship queries at sf0.01 and emit the operator tree + scan pushdown
details under a hand-maintained commentary paragraph per query."""
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as E

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# query -> commentary (the claim the tree below must witness)
SECTIONS = {
    "sax_sliding_words": """One shuffle (Exchange on user_id), one Sort, ONE Window
operator computing the 2w+2 running aggregates (after the plan-shape fix
— Spark does not CSE repeated window expressions), then plain
projections: the letter CASE arithmetic runs codegen'd above the window
pass. The scan reads only the four needed columns.""",
    "sax_allpairs": """The scale-critical shape: distances over DISTINCT words only
(BroadcastNestedLoopJoin over <= c^w rows on both sides), surviving word
pairs broadcast, then two shuffle-free equi-joins expand back to key
pairs — row-pair work proportional to OUTPUT size, not |rows|^2. The
word table is computed once (eager localCheckpoint, freed on release —
the `Scan ExistingRDD` leaves).""",
    "sax_allpairs_refined": """Prune-then-refine end to end, FUSED (round 4): the
z-normalized windows are attached to both (small) key sides BEFORE the
pair expansion (allpairs_within's attach payload), so the exact
distance is a zip_with/aggregate over the two payload arrays computed
scan-stage on the expansion output — the former euclidean_refine step's
two joins against the candidate-sized relation are gone from the plan.
Each window still z-normalizes exactly once (eager-checkpointed payload
table feeding both sides).""",
    "sax_event_windows": """Batch path of the event-time operator: fully
long-form (row_number + frame groupBy + stats join + w-row collect) —
no per-window array, so window size is unbounded. Streaming runs the
collect_list form instead (chained aggregations are unsupported on
streams); both are tested equal, and the stream path is oracle-gated
end to end by sax_event_windows_stream (late data under watermark).""",
    "dedup_minhash_lsh": """After the posexplode restructure: the shingle explode + 32-way
min() signature aggregation runs ONCE PER SELF-JOIN SIDE (two scans
total, was 18) — each side builds its band array<struct> in a single
projection and explodes it, carrying the signature through the
(band_id, band_key) equi-join so the similarity estimate needs no
join-back. No nested loop anywhere.""",
    "dedup_simhash_pairs": """Same single-pass shape as minhash: one fingerprint aggregation
per self-join side (was ~8x recompute), chunk fan-out via posexplode of
a built array, candidates from the (chunk_id, chunk_key) equi-join,
exact Hamming verify inline.""",
    "emb_lsh_recall": """Recall@k report: both legs are broadcast-query plans — the
LSH leg probes buckets against the broadcast panel and ranks inside
probed buckets, the exact leg is the knn_join shape — and the final
joins are per-query-small (<= k rows each side). Norms and double-casts
are computed once per row BELOW the joins (the round-4 prenorm rule), so
every scored pair pays a single dot fold.""",
    "emb_cosine_topk": """Single-row query side broadcast; cosine computed in
the scan-stage projection; TakeOrderedAndProject does the global top-k
as per-partition partial top-k + driver merge of k rows — no full sort,
no shuffle of the scored set.""",
    "emb_ivf_topk": """Fully distributed IVF (no driver collect, no unrolled centroid
literals): seeds and Lloyd means are DataFrames; assignment is a
broadcast-joined centroid table with a map-side-combinable min_by
argmin (the Exchange after it carries ONE row per vector, never the
fan-out); probe selection is a broadcast join of the centroid table
against the query vector; final rerank is TakeOrderedAndProject.""",
    "tpch_q3": """Classic plan: filters pushed to the parquet scans
(PushedFilters on o_orderdate / l_shipdate / c_mktsegment), customer
broadcast, lineitem-orders shuffle join on the key, partial aggregation
before the exchange, TakeOrderedAndProject for the top-10.""",
    "tpch_q17": """Correlated scalar subquery, written as SQL and decorrelated by
Catalyst: the per-partkey avg becomes its own aggregate subtree joined
back on l_partkey; the brand filter is pushed to the part scan and the
part join is broadcast. Proves the planner surface beyond star joins.""",
    "tpch_q22": """Correlated NOT EXISTS planned as a broadcast left-anti hash join
on o_custkey (the o_orderpriority filter pushed to the orders scan),
then one map-side-combinable aggregate per nation.""",
    "events_asof_join": """Distributed as-of join: both sides union into ONE
Exchange on the key; a single Window pass (last ignorenulls over the
running frame) carries the latest build row to each probe row. No join
operator at all — the naive `p.ts <= c.ts` formulation would plan a
BroadcastNestedLoopJoin whose cost is |clicks| x |purchases| per user.""",
    "events_interval_agg": """Bounded interval join as a time-bucketed equi-join:
the probe side posexplodes into <= 2 adjacent buckets, the range
predicate is a residual filter on a plain hash join keyed
(user, bucket) — AQE can size and skew-split it; never a nested loop.
The left join-back preserves zero-click purchases.""",
    "events_sessions": """Gap sessionization in one window partitioning: lag ->
boundary flag -> running sum share a single Exchange + Sort (two
WindowExec passes, no re-shuffle), then the per-session rollup is a
map-side-combinable groupBy on (user, session_id).""",
    "docs_kmv_distinct": """KMV sketch: the raw text never leaves the scan (hash
projected immediately), distinct is a two-phase hash aggregate, and the
per-key rank is one window pass; the estimate is pure arithmetic above
it. State per key is k longs — the same footprint a production sketch
keeps.""",
    "tpch_q19": """OR-of-ANDs disjunction: Catalyst extracts the common
p_partkey = l_partkey conjunct, so the join stays a broadcast hash join
with the disjunction evaluated as a post-join filter; the residual
brand/size/type predicates are pushed into the part scan as an OR
filter.""",
    "tpch_q18": """HAVING-driven join: the big-order aggregate (tiny after the
sum > 250 filter) joins orders first, then customer — both hash joins
with the aggregate side build; quantities never re-scan lineitem
because the HAVING subquery IS the quantity source.""",
    "text_bm25": """BM25: per-term tf columns are scan-stage array expressions
(no explode), corpus stats collapse to ONE row broadcast back over the
scan (the 1-row BroadcastNestedLoopJoin is the scalar cross-join
pattern), and the ranking is TakeOrderedAndProject — partial top-k per
partition, k rows to the driver, no full sort.""",
    "events_pivot": """PIVOT with explicit values: one hash aggregate computes all
five conditional counts (no distinct-scan of the pivot column, no
per-value union); the value-sum side joins back broadcast.""",
    "tpch_q8": """Market share: six-table join where every dimension side
(part, both nation roles, region-restricted customer-nation semi-join)
broadcasts — the fact table shuffles exactly once, for the final
per-year aggregate. The part filter and region restriction prune
BEFORE the fact joins.""",
    "tpch_q21": """The q21 EXISTS / NOT EXISTS pair collapsed into ONE per-order
aggregate (countDistinct suppliers + countDistinct R-suppliers), so the
plan is a single lineitem shuffle on l_orderkey instead of two
self-joins of the fact table — the difference between one pass and
three at 100 TB. The supplier dim broadcasts onto the tiny qualified
set.""",
    "events_anomaly": """Rolling z-score: the scan feeds ONE Window operator
computing count/sum/sum-of-squares over the bounded 32-row frame in a
single pass (sum-based moments, not stddev builtins, so any engine
reproduces the exact expression); the anomaly filter runs codegen'd
above it on the ROUNDED z.""",
    "events_rolling_1h": """Time-range rolling window: RANGE frame on the
microsecond axis — one shuffle on user_id, one WindowExec whose frame
is bounded by TIME, so memory per series is capped by event rate, not
series length.""",
    "docs_top_terms": """Exact heavy hitters: explode -> one groupBy(term) with
map-side partial aggregation, doc_freq as a two-phase distinct over the
same shuffle, and the top-k is TakeOrderedAndProject — k rows to the
driver, never the full term table.""",
    "docs_bloom_prefilter": """Bloom sketch: the build side collapses to <= m/32
shuffled rows (bit_or partially aggregates map-side) and ONE dense-array
row; the probe is a BroadcastNestedLoopJoin of that single row + a
codegen'd forall over the bits — the probe scan has NO shuffle, exactly
the shape that replaces an unbroadcastable semi-join at 100 TB.""",
    "emb_pq_topk": """Product quantization: codebook (m*ks rows) and the query
LUT broadcast; encode shuffles one min_by-reduced row per (vector,
subspace); ADC is a broadcast LUT join + per-vector sum; final top-k is
TakeOrderedAndProject. The raw embedding column is read ONCE (codes are
derived in-plan) — at rest the codes table replaces the float scan.""",
    "events_funnel": """Funnel: every stage aggregate and join keys on user_id —
the exchange is reused across stages (one physical shuffle of events
per stage pass, no windows, no event-history collection).""",
    "tpch_q2": """Correlated MAX over a DERIVED aggregate: Catalyst decorrelates
the subquery into a per-partkey max over the same ps aggregate joined
back — the ps relation computes once per side from one lineitem shuffle,
and the part filter prunes before the final joins.""",
    "events_cube": """CUBE: ONE Expand (4 grouping sets) feeding ONE hash
aggregate — no per-grouping-set scan or union; the scan is read once.""",
    "docs_contamination": """Decontamination: the benchmark shingle set reduces to a
broadcast hash table (BroadcastExchange after its distinct); the corpus
side explodes shingles inside the scan and probes map-side
(BroadcastHashJoin LeftOuter) — the only corpus shuffle is the per-doc
re-aggregation, whose partial aggregate collapses each document before
the Exchange.""",
    "docs_chunk": """RAG chunking: ZERO Exchange operators — tokenize, sequence the
chunk starts, posexplode the slices, all inside one WholeStageCodegen
span over the scan. Output inherits the input partitioning.""",
    "docs_train_order": """Global training order without a global window: shard counts
(tiny aggregate) -> cumulative offsets (window over shard-count rows,
the only serial step) -> BroadcastHashJoin back -> per-shard
row_number. No PARTITION-BY-less WindowExec over the corpus anywhere in
the tree.""",
    "emb_ivf_at_rest": """At-rest IVF probe: the scan carries PartitionFilters on
list_id (only probed directories are opened); the cosine rerank runs
above the pruned scan; final top-k is a TakeOrderedAndProject.""",
    "dedup_incremental": """Ingest dedup: the historical corpus enters as a distinct
hash table on the build side of a LeftAnti hash join (never as text);
the in-batch min-id groupBy partially aggregates map-side.""",
    "docs_pmi_bigrams": """PMI collocations: ordered pairs explode once inside the scan
(token array bound once — no per-element re-tokenization); pair and
unigram counts both partially aggregate before their exchanges; the
vocabulary-sized unigram table and the two scalar totals re-enter as
BroadcastExchanges; the final ranking is a TakeOrderedAndProject.""",
    "dedup_lsh_refined": """Dedup prune-then-refine: the banded-candidate plan
(one signature aggregation + posexplode band join) feeds an exact-Jaccard
verify that joins candidates to the per-doc shingle arrays — refine work
scales with CANDIDATE volume (LSH recall), never |docs|^2. The shingle
arrays compute scan-stage per JOIN LEG (the plan shows one document scan
per side; persist the sets relation to collapse them when the corpus
scan dominates) — never per candidate pair.""",
    "docs_lang_confusion": """Classifier QA crosstab: the lang-ID marker counts
are scan-stage array expressions (one tokenization per row via the _let
binding), so the whole confusion matrix is one scan + one tiny
groupBy.""",
    "dedup_winnow_pairs": """Substring-level dup pairs over winnowing fingerprints:
fingerprint selection (k-gram hash windows -> array_min -> distinct) is
pure scan-stage array math inside the Generate; the exploded index
shuffles ONCE on fp (the hot-fp window count reuses that exact
partitioning), then the pair count is the standard inverted-index
equi-join — the jaccard_pairs shape on an index ~2/(w+1) the size of
the shingle table. Size dims re-enter as BroadcastExchanges.""",
    "docs_boilerplate": """Per-doc boilerplate share: one exploded gram-hash scan
feeds (a) the distinct-doc frequency aggregate whose >= min_df survivor
set is the small Zipf head — re-entering as a BroadcastExchange into
(b) the join back over the same exploded relation; the per-doc re-agg
is map-side combinable. No pairwise work anywhere in the plan.""",
    "events_holt": """Holt level+trend: identical single-shuffle WindowExec shape
as events_ewma — collect_list over the bounded frame, then the
struct-accumulator higher-order fold runs codegen'd in the projection
above the window pass. The fold is bound ONCE as a named column (the
plan shows two Project boundaries): inlining it into each quantized
output would evaluate it 8x per row.""",
    "events_cusum": """CUSUM via the prefix identity: ONE Exchange + Sort feeding
TWO chained Window operators (running sum, then running min of that
sum) — the recursion itself would need an O(series) fold per row. No
second shuffle: both windows share the same partitioning/ordering.""",
    "events_mad_anomaly": """Median/MAD robust z: one WindowExec collecting the
frame, then a single projection whose nested HOF lambdas bind each
intermediate (sorted frame, median, sorted deviations) exactly once —
the named-column formulation re-inlined the median into the deviation
lambda and re-evaluated it per element (measured 10x).""",
    "emb_kmeans": """Lloyd iterations as pure plan: each assignment is a
BroadcastNestedLoopJoin of the corpus against the k-row centroid
relation (IdentityBroadcastMode — centroids are kilobytes) followed by
a map-side-combinable min_by argmin; each mean is one groupBy with
k x dim aggregation state, re-broadcast into the seed-fallback join.
The corpus is never shuffled on a cluster key; the only corpus-wide
Exchanges are the argmin pre-aggregations.""",
    "emb_semdedup": """SemDeDup pair stage: the within-cluster self-join is an
equi-join ON cluster (no cartesian), with both sides prenormed below
the join so a scored pair is one dot fold; the drop set re-enters the
keep anti-join as a broadcast. Candidate volume is bounded by cluster
size — the k knob, not the plan, is the scale lever.""",
    "docs_source_cap": """The salted two-stage top-k: Exchange on
(source, doc_id % 32) for the stage-1 window rank (caps every slice at
k rows), then Exchange on source alone for the final rank over the
pruned survivors — the plan witnesses that the corpus-sized shuffle is
the SALTED one, and the per-source shuffle sees at most
n_salts * per_source rows per source.""",
    "sax_discords": """HOT-SAX candidate-bounded refine: the word histogram and
rare-word limit reduce to a tiny relation that re-enters as a
BroadcastExchange against the window-values table; the exact-NN join
is BroadcastHashJoin with the CANDIDATES broadcast (the corpus-sized
window relation streams), and the per-candidate argmin collapses in a
map-side partial aggregate.""",
    "events_hw": """Holt-Winters as ONE WindowExec pass (the events_holt shape
with a flat array accumulator): collect_list of [x, phase] pairs over
the bounded frame, then the O(window x season) higher-order fold runs
codegen'd in the projection above the window pass — the fold is bound
once as a named column and the four quantized outputs extract from it
(the 8x re-evaluation lesson). The Exchange is an EXPLICIT
series-key repartition at the session's shuffle parallelism: the fold
is CPU-bound per row, and AQE's byte-based coalescing otherwise
collapses the stage to 2 tasks (measured 4.1s -> 1.2s).""",
    "events_stl": """Two bounded-state window passes sharing no join: Exchange
on the series key for the centered-moving-average trend WindowExec,
then Exchange on (series, season-bucket) for the whole-partition
seasonal mean — the detrend/residual arithmetic is plain projection
between them. No collect, no join, no third shuffle.""",
    "emb_abtt_topk": """Whitening as scan arithmetic: the power-iteration (mu, v)
1-row relations enter as IdentityBroadcast cross joins; each row's
centered array and its projection bind ONCE (lambda variables), the
whitened vector never materializes at rest, and the final top-k is
TakeOrderedAndProject over the quantized cosine.""",
    "events_forecast_backtest": """The capstone composition plan, round-7
shape: ONE explicit series-key Exchange + ONE Sort feed stacked
WindowExecs computing the lead() actual and all THREE method folds
(EWMA / Holt / Holt-Winters share the partitioning; different frames
stack without re-shuffling or re-sorting), then a single partial+final
HashAggregate produces the six per-arm stats and a generator explodes
them to the 3-row report — no joins, no union, one pass over the
input (the previous shape ran three operator arms joined back to an
actuals frame: four scans/sorts + three join shuffles, 11.5s -> 2.2s
at sf0.1).""",
    "docs_ccnet_bucket": """The distributed exact global rank
(operators/rank.py) in its flagship use: the persisted unigram-LM
score table feeds (1) an approxQuantile boundary job, (2) a bucket
count job (driver traffic = buckets rows), and the final plan shown
here — Exchange ON THE BUCKET KEY, partition-local Sort, ONE Window
partitioned by bucket, plus the broadcast-free literal offset map and
the tercile CASE against the count-pass total as a plan literal. No
global Sort node anywhere (tests/test_no_global_sort_regression.py
pins this); the DuckDB oracle runs the literal global window and
hash-matches.""",
    "events_rfm": """Three chained distributed ntiles
(operators/rank.py) over the per-user table: each metric's tile is a
bucket-partitioned Window plus pure int64 arithmetic against
driver-side tile boundaries from the count pass — the plan shows
three Exchange-on-bucket / local-Sort / Window blocks and zero global
Sorts, where the window form would funnel |users| rows through one
task three times.""",
    "events_changepoint": """Changepoint: ONE Exchange on the series key feeds two
stacked WindowExecs over the same partitioning — running prefix sums,
then full-frame count/last for the per-key totals — so the totals
come from the SAME materialized rows (the groupBy+join formulation
re-scanned and re-shuffled the input; exchange reuse does not unify
differently-pruned subtrees). Filter + min(struct) argmin finish on
the same keys. No join, no second scan, candidate rows = input rows.""",
    "dedup_pagerank": """Fixed-round PageRank: the symmetric edge list enters as a
checkpointed `Scan ExistingRDD` reused by all 5 rounds; each round is
one equi-join of edges against the previous rank table + one hash
aggregate on the dst key, with the degree table joined and the 1-row
node count as an IdentityBroadcast cross join — per-round cost is
|pairs| shuffle bytes, and no scalar ever returns to the driver.""",
    "events_twap": """Time-weighted average: one Exchange on the series key, one
WindowExec for the lead() interval close, then a map-side-combinable
aggregate on the SAME partitioning — the sum(v*dt)/sum(dt) ratio is
pure projection arithmetic above it. No join, no second shuffle.""",
    "events_hist_quantiles": """Histogram quantile sketch: the corpus collapses to a
256-row histogram in ONE combinable hash aggregate (the 1-row
min/max/percentile stats enter as an IdentityBroadcast cross join);
the quantile pick is a broadcast non-equi join over 256 x 3 rows —
driver never sees data, exact leg shares the same single scan.""",
    "emb_silhouette": """Silhouette: the fitted centroids arrive as a broadcast
k-row relation; candidate distances are scan-stage array folds; the
own/runner-up split is ONE WindowExec over (id, d2, cluster) rows
(k per vector, pre-pruned by the rank filter) and the per-cluster
report is one final combinable aggregate.""",
    "docs_scorecard": """The capstone composition: six independent legs (count,
exact-dedup filter-count, MinHash pair count, pair-incident distinct,
quality mean, contamination count) each collapse to a 1-row aggregate
before the chain of BroadcastNestedLoopJoin cross products — the
joins multiply single rows, so the scorecard costs exactly the sum
of its legs plus six trivial broadcasts.""",
}

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

qs = E.queries()


def formatted_plan(df) -> tuple[str, list[str]]:
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    text = buf.getvalue()
    tree = text.split("\n\n")[0]
    details = re.findall(r"(PushedFilters: \[.*?\]|PartitionFilters: \[.*?\]|ReadSchema: \S+)", text)
    seen, uniq = set(), []
    for d in details:
        if d not in seen:
            seen.add(d)
            uniq.append(d)
    return tree, uniq


out = [
    "# PLANS — physical-plan review of flagship queries",
    "",
    "Evidence that the declared DataFrame plans compile to the intended",
    "physical shapes (captured with `.explain(\"formatted\")` at sf0.01 by",
    "`scripts/dump_plans.py`; `AdaptiveSparkPlan isFinalPlan=false` because",
    "AQE re-plans at runtime — the operator skeleton below is what AQE",
    "starts from). Commentary first, then the operator tree; scan details",
    "show pushdown/pruning.",
    "",
]
for name, commentary in SECTIONS.items():
    df = qs[name](spark, SF)
    tree, details = formatted_plan(df)
    out += [f"## {name}", "", commentary, "", "```", tree.rstrip(), "```", ""]
    if details:
        out += ["Scan details:", "", "```", *details, "```", ""]
    print(f"dumped {name}", file=sys.stderr)

path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "PLANS.md")
with open(path, "w") as fh:
    fh.write("\n".join(out))
print(f"wrote {path}", file=sys.stderr)
