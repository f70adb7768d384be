"""Bloom-filter sketch: a deterministic, engine-reproducible membership
filter for pipeline pre-filtering (e.g. "is this document's content hash
in the known-duplicate set?").

Why a sketch instead of a semi-join: at 100 TB the suspect set can be
billions of keys — too big to broadcast as a hash set — while the bloom
filter is a FIXED m-bit array (kilobytes) regardless of build-set size.
The probe is a pure scan-stage expression over the broadcast bits: no
shuffle, no explode, no join on the probe side. False positives are an
accepted, tunable property (~(1-e^{-kn/m})^k); false negatives are
impossible.

Determinism: bit positions derive from md5 (``functions.text.doc_hash60``
convention) and the bit array uses 32-bit words whose masks are exact
``pow(2, b)`` doubles, so any engine reproduces the exact same filter
bits and the exact same false positives — which is what lets the driver
hash-compare results against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import doc_hash60

__all__ = [
    "bloom_build",
    "bloom_positions",
    "bloom_probe",
    "cms_build",
    "cms_estimate",
    "grid_quantiles",
    "grid_quantiles_from_counts",
    "hll_estimate",
    "hll_rank_width",
    "hll_registers",
]

WORD_BITS = 32  # 32-bit words: masks stay exactly representable as pow(2, b)


def bloom_positions(el: Column, *, m_bits: int, k: int) -> Column:
    """The ``k`` bit positions for element ``el``: independent hashes via
    md5 of the salted element (``el || ':' || i``), each reduced mod m."""
    return F.array(
        *[
            doc_hash60(F.concat(el.cast("string"), F.lit(f":{i}"))) % m_bits
            for i in range(k)
        ]
    )


def _mask(p: Column) -> Column:
    """Bit mask for position ``p`` within its 32-bit word: 2^(p % 32),
    exact as a double (< 2^53), cast back to long."""
    return F.pow(F.lit(2.0), (p % WORD_BITS).cast("double")).cast("long")


def bloom_build(
    df: DataFrame, *, col: str, m_bits: int = 1024, k: int = 3
) -> DataFrame:
    """Aggregate the build set into ONE row holding the dense bit array
    (``bloom: array<long>`` of ``m_bits / 32`` words).

    Shape: explode the k positions per element, partial-aggregate
    ``bit_or`` masks per word index map-side (the shuffle carries at most
    m/32 rows per partition however large the build set is), then fold
    the sparse words into the dense array on the final single row."""
    if m_bits % WORD_BITS:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    m_words = m_bits // WORD_BITS
    pos = df.select(
        F.explode(bloom_positions(F.col(col), m_bits=m_bits, k=k)).alias("pos")
    )
    sparse = (
        pos.select(
            (F.col("pos") / WORD_BITS).cast("int").alias("word_idx"),
            _mask(F.col("pos")).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )

    def set_word(acc: Column, x: Column) -> Column:
        return F.transform(
            acc,
            lambda el, i: F.when(
                i == x["word_idx"], el.bitwiseOR(x["word"])
            ).otherwise(el),
        )

    return sparse.agg(
        F.aggregate(
            F.collect_list(F.struct("word_idx", "word")),
            F.array_repeat(F.lit(0).cast("long"), m_words),
            set_word,
        ).alias("bloom")
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    *,
    col: str,
    m_bits: int = 1024,
    k: int = 3,
    out: str = "bloom_hit",
) -> DataFrame:
    """Membership test per row of ``df``: true iff ALL k bit positions of
    ``col`` are set in the filter. The 1-row ``bloom`` side broadcasts;
    the test is a ``forall`` over the k positions — scan-stage only, no
    shuffle and no explode on the probe side."""

    def bit_set(p: Column) -> Column:
        word = F.element_at(
            F.col("__bloom_bits"), (p / WORD_BITS).cast("int") + 1
        )
        return word.bitwiseAND(_mask(p)) == _mask(p)

    probed = df.crossJoin(
        F.broadcast(bloom.select(F.col("bloom").alias("__bloom_bits")))
    )
    hit = F.forall(bloom_positions(F.col(col), m_bits=m_bits, k=k), bit_set)
    return probed.withColumn(out, hit).drop("__bloom_bits")


def _cms_positions(el: Column, *, width: int, depth: int) -> Column:
    """array<struct<row_id, col_id>>: the depth counter addresses for
    ``el`` — md5 of the '#'-salted value, reduced mod width. Build and
    probe MUST address identically; this is the single definition."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("row_id"),
                (
                    doc_hash60(F.concat(el.cast("string"), F.lit(f"#{r}")))
                    % width
                ).alias("col_id"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, *, col: str, width: int = 256, depth: int = 3
) -> DataFrame:
    """Count-min sketch over the values of ``col`` (one count per ROW —
    pre-aggregate upstream if you want distinct counts): returns the
    sparse counter table ``(row_id, col_id, cnt)``.

    The shuffle carries at most ``depth * width`` rows however large the
    input is (map-side partial sums), and sketches merge by plain
    addition — the property that makes CMS the scale answer for
    heavy-hitter estimation when the exact term table would itself be
    too big to shuffle. Counters are integers: no float determinism
    caveats at all."""
    rows = df.select(
        F.explode(_cms_positions(F.col(col), width=width, depth=depth)).alias(
            "rc"
        )
    )
    return (
        rows.select("rc.row_id", "rc.col_id")
        .groupBy("row_id", "col_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    queries: DataFrame, cms: DataFrame, *, col: str, width: int = 256,
    depth: int = 3, out: str = "cms_est"
) -> DataFrame:
    """Point-estimate the count of each value in ``queries[col]``:
    ``min`` over the value's ``depth`` counters (the classic CMS
    guarantee: est >= true, overshoot bounded by collisions). The sparse
    sketch broadcasts; each probe is a ``depth``-row equi-join + min.

    ``queries`` rows must be distinct: the final groupBy keys on every
    query column, so duplicate probe rows collapse to one output row
    (dedupe or add a surrogate id upstream if multiset probes matter)."""
    probes = (
        queries.select(
            "*",
            F.explode(
                _cms_positions(F.col(col), width=width, depth=depth)
            ).alias("__rc"),
        )
        .select(
            "*",
            F.col("__rc.row_id").alias("__cms_row"),
            F.col("__rc.col_id").alias("__cms_col"),
        )
        .drop("__rc")
    )
    others = [c for c in queries.columns]
    counters = cms.select(
        F.col("row_id").alias("__cms_row"),
        F.col("col_id").alias("__cms_col"),
        F.col("cnt").alias("__cms_cnt"),
    )
    joined = probes.join(
        F.broadcast(counters), ["__cms_row", "__cms_col"], "left"
    ).fillna({"__cms_cnt": 0})
    return joined.groupBy(*others).agg(F.min("__cms_cnt").alias(out))


# ---------------------------------------------------------------------------
# HyperLogLog (deterministic registers)

def hll_rank_width(p: int) -> int:
    """Rank field width: the 60-bit hash minus the ``p`` bucket bits."""
    return 60 - p


def hll_registers(
    df: DataFrame, *, col: str, p: int = 9
) -> DataFrame:
    """HyperLogLog register table over the values of ``col`` ->
    ``(bucket, max_rank)`` for the occupied buckets of an
    ``m = 2^p``-register sketch.

    Registers here are NOT implementation-defined (the usual objection
    to cross-engine HLL): bucket = low ``p`` bits of the md5-derived
    60-bit hash, rank = leading-zero count of the remaining
    ``60 - p``-bit field + 1 (computed exactly as
    ``W - len(bin(w)) + 1``, integer-only) — so any engine reproduces
    the register table bit-for-bit.

    Scale: one map-side-combinable groupBy bounded at ``m`` output rows
    however large the input; registers merge by ``max`` (cross-shard /
    cross-day rollup), the property that makes HLL the standard
    cardinality sketch at 100 TB.
    """
    if not 4 <= p <= 14:
        raise ValueError("hll_registers needs 4 <= p <= 14")
    m = 1 << p
    width = hll_rank_width(p)
    h = doc_hash60(F.col(col).cast("string"))
    bucket = (h % m).alias("bucket")
    w = F.shiftrightunsigned(h, p)
    rank = F.when(w > 0, F.lit(width) - F.length(F.bin(w)) + 1).otherwise(
        F.lit(width + 1)
    )
    # NULLs are skipped (count-distinct semantics); without the filter a
    # NULL value would form a phantom bucket=NULL register at the
    # maximum rank and inflate the estimate
    return (
        df.where(F.col(col).isNotNull())
        .select(bucket, rank.alias("__r"))
        .groupBy("bucket")
        .agg(F.max("__r").alias("max_rank"))
    )


def hll_alpha(m: int) -> float:
    """The standard HLL bias constant for ``m >= 128`` registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(registers: DataFrame, *, p: int = 9) -> DataFrame:
    """Cardinality estimate from a register table -> one row
    ``(n_buckets_used, hll_est)`` (estimate quantized to 4 decimals).

    The harmonic sum ``sum 2^-M_j`` is computed EXACTLY: each term is
    lifted to the integer ``2^(L - M_j)`` with ``L = 60 - p + 1`` (the
    maximum possible rank, so the exponent is never negative and the
    total stays <= 2^61 < int64) and summed as a bigint — no
    float-summation-order caveat exists; the only float ops are one
    division and the small-range ``m * ln(m / V)`` correction, identical
    expression shape on any engine."""
    m = 1 << p
    alpha = hll_alpha(m)
    lift = hll_rank_width(p) + 1  # >= any max_rank
    scale = 1 << lift
    agg = registers.agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        # pyspark's shiftleft() helper only takes an int bit count; the
        # SQL form accepts the per-row expression
        F.sum(F.expr(f"shiftleft(1L, cast({lift} - max_rank as int))"))
        .alias("__s_used"),
    )
    s_int = F.col("__s_used") + (F.lit(m) - F.col("n_buckets_used")) * F.lit(
        scale
    ).cast("long")
    raw = F.lit(alpha * m * m) * F.lit(float(scale)) / s_int.cast("double")
    zeros = (F.lit(m) - F.col("n_buckets_used")).cast("double")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), small).otherwise(raw)
    return agg.select(
        "n_buckets_used",
        (F.floor(est * 1e4 + F.lit(0.5)) / 1e4).alias("hll_est"),
    )


def grid_quantiles(
    df: DataFrame,
    *,
    value: str,
    probs: list[tuple[int, int, str]],
    n_alias: str = "n",
    weight: str | None = None,
) -> DataFrame:
    """Exact nearest-rank quantiles over an already-QUANTIZED integer
    column -> one row ``(n_alias, <name per prob>)`` — the 100 TB
    scale path for the exact-``percentile()`` queries whose
    single-reducer buffer grows with DISTINCT input values
    (docs/PLAN_AUDIT.md Class-A caveat).

    ``probs`` are exact fractions ``(num, den, out_name)`` — e.g.
    ``(1, 2, "p50")`` — so the rank ``k = ceil(num*n/den)`` is pure
    integer arithmetic, identical in any engine (no float probability
    touches the data). Each output is the SMALLEST grid value whose
    cumulative count reaches k: the nearest-rank (type-1) quantile,
    deterministic and engine-portable, unlike interpolated percentiles
    whose averaging step reintroduces float averaging of unbounded
    distinct values.

    Scale shape: one map-side-combinable ``groupBy(value)`` (output
    bounded by the GRID, not the row count — that is the caller's
    contract: quantize first), a cumulative window over that bounded
    distinct-value table (single-partition but grid-sized, the same
    Class-A budget as a bounded final aggregate), and a broadcast of
    the 1-row total. Nothing row-scaled crosses a single task.

    With ``weight`` (an INTEGER column — integer mass keeps the rank
    arithmetic exact), each row counts ``weight`` times: the output is
    the smallest grid value whose cumulative WEIGHT reaches
    ``ceil(num*W/den)`` of the total weight W — e.g. token-mass
    quantiles of document length ("the median token lives in a doc of
    length p50"). Rows with NULL or non-positive weight are excluded
    (they carry no mass; negative mass has no quantile meaning).

    Nulls are excluded (consistent with ``percentile``).
    """
    if not probs:
        raise ValueError("grid_quantiles needs at least one (num, den, name)")
    for num, den, _name in probs:
        if not (0 < num <= den):
            raise ValueError(f"prob {num}/{den} must be in (0, 1]")
    v = F.col(value)
    if weight is None:
        vals = df.select(v.alias("__v")).where(v.isNotNull())
        mass = F.lit(1).cast("long")
    else:
        wc = F.col(weight).cast("long")
        vals = df.select(v.alias("__v"), wc.alias("__w")).where(
            v.isNotNull() & wc.isNotNull() & (wc > 0)
        )
        mass = F.col("__w")
    counts = vals.groupBy("__v").agg(F.sum(mass).alias("__c"))
    return grid_quantiles_from_counts(
        counts, value="__v", count="__c", probs=probs, n_alias=n_alias
    )


def grid_quantiles_from_counts(
    counts: DataFrame,
    *,
    value: str,
    count: str,
    probs: list[tuple[int, int, str]],
    n_alias: str = "n",
) -> DataFrame:
    """The rank stage of :func:`grid_quantiles`, entered at the
    PRE-AGGREGATED level: ``counts`` holds one row per grid value with
    its positive integer mass — e.g. the final state table of a
    complete-mode streaming ``groupBy(value).sum(mass)``, which is
    exactly how the streaming twin keeps quantile state bounded by the
    grid instead of the stream. Same contract and integer rank math as
    :func:`grid_quantiles` (which delegates here)."""
    if not probs:
        raise ValueError("grid_quantiles needs at least one (num, den, name)")
    for num, den, _name in probs:
        if not (0 < num <= den):
            raise ValueError(f"prob {num}/{den} must be in (0, 1]")
    base = counts.select(
        F.col(value).alias("__v"), F.col(count).cast("long").alias("__c")
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = base.select("__v", F.sum("__c").over(w).alias("__cum"))
    tot = base.agg(F.sum("__c").alias("__n"))
    j = cum.crossJoin(F.broadcast(tot))
    # ceil(num*n/den) = (num*n + den - 1) DIV den — pure LONG integer
    # arithmetic end to end (a double division + floor can flip by one
    # at exact multiples of den)
    # empty input: one agg row with n=0 and NULL quantiles (mirrors
    # count()=0 + percentile()=NULL on the exact form)
    aggs = [F.coalesce(F.max("__n"), F.lit(0).cast("long")).alias(n_alias)]
    for num, den, name in probs:
        k = F.expr(f"({num}L * __n + {den - 1}L) DIV {den}L")
        aggs.append(
            F.min(F.when(F.col("__cum") >= k, F.col("__v"))).alias(name)
        )
    return j.agg(*aggs)


def histogram_quantiles(
    df: DataFrame,
    *,
    value: str,
    bins: int = 256,
    quantiles: tuple = (0.5, 0.9, 0.99),
    round_to: int = 6,
) -> DataFrame:
    """Fixed-width histogram quantile ESTIMATION with its accuracy
    report -> ``(quantile, est, exact, abs_err)``: each requested
    quantile estimated from a ``bins``-bucket equi-width histogram
    (right bucket edge of the first bucket whose cumulative count
    reaches ``ceil(q*n)``) beside the exact interpolated percentile.

    This is the sketch a 100 TB profile actually ships — the histogram
    is FIXED-SIZE and MERGEABLE (bins ints per partition, one
    map-side-combinable groupBy; the exact leg's full sort is the
    test-time reference only, same contract as the recall family's
    exact legs). Deterministic: bucket math is closed-form double
    arithmetic on the exact min/max, the bucket pick is a min() over
    an integer predicate, and Spark's ``percentile`` == DuckDB's
    ``quantile_cont`` (the events_quantiles precedent).
    Flat inputs (min == max) estimate every quantile at that value.
    """
    if bins < 2:
        raise ValueError("histogram_quantiles needs bins >= 2")
    if not quantiles or not all(0.0 < q < 1.0 for q in quantiles):
        raise ValueError("histogram_quantiles needs 0 < q < 1")
    v = F.col(value).cast("double")
    b = df.select(v.alias("__v")).where(v.isNotNull())
    qarr = ", ".join(repr(float(q)) + "D" for q in quantiles)
    st = b.agg(
        F.min("__v").alias("__lo"),
        F.max("__v").alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
        F.expr(f"percentile(__v, array({qarr}))").alias("__ex"),
    )
    w = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    bin_ = F.when(
        F.col("__hi") > F.col("__lo"),
        F.least(
            F.floor((F.col("__v") - F.col("__lo")) / w),
            F.lit(bins - 1),
        ),
    ).otherwise(F.lit(0)).cast("long")
    hist = (
        b.crossJoin(F.broadcast(st))
        .select(bin_.alias("__bin"))
        .groupBy("__bin")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    from pyspark.sql import Window

    cum = hist.select(
        "__bin",
        # unpartitioned window is BOUNDED: the histogram has at most
        # `bins` rows (fixed sketch width), never data-sized
        F.sum("__c")
        .over(
            Window.orderBy("__bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("__cum"),
    )
    qdf = st.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("quantile"),
                        F.round(
                            F.element_at(F.col("__ex"), i + 1), round_to
                        ).alias("exact"),
                    )
                    for i, q in enumerate(quantiles)
                ]
            )
        ).alias("__q"),
        "__lo",
        "__hi",
        "__n",
    ).select("__q.quantile", "__q.exact", "__lo", "__hi", "__n")
    sel = (
        qdf.join(
            F.broadcast(cum),
            F.col("__cum")
            >= F.ceil(F.col("quantile") * F.col("__n")).cast("long"),
        )
        .groupBy("quantile", "exact", "__lo", "__hi")
        .agg(F.min("__bin").alias("__bin"))
    )
    est = F.when(
        F.col("__hi") > F.col("__lo"),
        F.col("__lo")
        + (F.col("__bin") + 1)
        * ((F.col("__hi") - F.col("__lo")) / F.lit(float(bins))),
    ).otherwise(F.col("__lo"))
    from .timeseries import quantize

    return sel.select(
        "quantile",
        quantize(est, round_to).alias("est"),
        "exact",
        quantize(F.abs(est - F.col("exact")), round_to).alias("abs_err"),
    )


def hll_grouped(
    df: DataFrame,
    *,
    group: str,
    col: str,
    p: int = 9,
    round_to: int = 4,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate WITH its exact
    reference -> ``(group, exact_distinct, n_buckets_used, hll_est,
    rel_err)`` — the sketch used the way production uses it: as a
    GROUPED aggregate (distinct users per event type / distinct urls
    per domain), with the accuracy driver-visible per group like the
    recall family. Registers are the deterministic md5 bucket/rank of
    :func:`hll_registers`, keyed by (group, bucket) — still bounded at
    ``|groups| * m`` rows and still max-mergeable across shards. The
    exact leg is one count-distinct sharing the same shuffle key; at
    100 TB you drop it and keep the sketch."""
    if not 4 <= p <= 14:
        raise ValueError("hll_grouped needs 4 <= p <= 14")
    m = 1 << p
    width = hll_rank_width(p)
    h = doc_hash60(F.col(col).cast("string"))
    w = F.shiftrightunsigned(h, p)
    rank = F.when(w > 0, F.lit(width) - F.length(F.bin(w)) + 1).otherwise(
        F.lit(width + 1)
    )
    regs = (
        df.where(F.col(col).isNotNull())
        .select(F.col(group), (h % m).alias("bucket"), rank.alias("__r"))
        .groupBy(group, "bucket")
        .agg(F.max("__r").alias("max_rank"))
    )
    alpha = hll_alpha(m)
    lift = width + 1
    scale = 1 << lift
    agg = regs.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_buckets_used"),
        F.sum(F.expr(f"shiftleft(1L, cast({lift} - max_rank as int))"))
        .alias("__s_used"),
    )
    s_int = F.col("__s_used") + (F.lit(m) - F.col("n_buckets_used")) * F.lit(
        scale
    ).cast("long")
    raw = F.lit(alpha * m * m) * F.lit(float(scale)) / s_int.cast("double")
    zeros = (F.lit(m) - F.col("n_buckets_used")).cast("double")
    small = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    est = F.when((raw <= 2.5 * m) & (zeros > 0), small).otherwise(raw)
    q = float(10 ** round_to)
    est_q = F.floor(est * q + F.lit(0.5)) / q
    exact = df.where(F.col(col).isNotNull()).groupBy(group).agg(
        F.countDistinct(col).alias("exact_distinct")
    )
    return exact.join(agg, group).select(
        group,
        "exact_distinct",
        "n_buckets_used",
        est_q.alias("hll_est"),
        (
            F.floor(
                F.abs(est_q - F.col("exact_distinct").cast("double"))
                / F.col("exact_distinct").cast("double")
                * q
                + F.lit(0.5)
            )
            / q
        ).alias("rel_err"),
    )
