"""Distributed generalized suffix array + LCP over tokenized documents.

The window-hash family (``dedup.exact_substring_stats``) answers "is
this fixed-L window duplicated?"; the suffix array answers the question
it approximates: "what is the LONGEST duplicated token span, at any
length?" — the structure Lee et al. 2022 (*Deduplicating Training Data
Makes Language Models Better*, §4) actually build. Reference parity:
the C reference has no corpus-scale text machinery (its scope is SAX
words, src/symtseries.c); this module is part of the mandated
large-scale training-data extension surface.

Spark-first construction — **prefix doubling** (Manber & Myers 1993;
distributed formulation as in Flick & Aluru 2015), not a single-node
suffix sort:

1. Positions ``(doc_id, pos, tok)`` via one ``posexplode`` — suffixes
   never cross documents, so the position key is ``(doc_id, pos)`` and
   NO global offset pass is needed.
2. ``rank_1`` = lexicographic dense rank of the vocabulary (a
   vocab-bounded window: |vocab| ≪ corpus by Heaps' law, the same
   allowance the BPE family carries).
3. Each doubling round h → 2h: pair ``(rank_h[p], rank_h[p+h])`` via
   ``lead(rank, h)`` over a per-document window — ``pos`` is 1-based
   consecutive per doc (the :func:`token_positions` contract), so the
   window IS the ``pos+h`` lookup with one corpus exchange instead of
   a self-join's two (missing = past-end = -1, which sorts first —
   the ``$ <`` everything convention, matching string-prefix order),
   then a dense re-rank of the pairs carried DIRECTLY on the paired
   rows through :func:`operators.rank.dense_ranked_with_total` — the
   repo's two-pass distributed rank fused with the join-back it used
   to need (r13: the count pass partially dedups map-side so only
   ~distinct-sized traffic crosses the wire, and the old
   distinct-exchange + corpus-sized join-back disappear outright),
   never a single-task global window. The rank pass's free ``total``
   (the distinct-class count) doubles as the convergence test
   (``total == n_positions`` ⇒ all suffixes separated ⇒ stop).
4. Rounds terminate at ``h >= max doc length`` even without
   separation: surviving ties are exactly the identical whole-tails
   (e.g. mirrored documents), and the final rank is a true DENSE rank
   over suffix equivalence classes — bit-comparable to DuckDB
   ``dense_rank() OVER (ORDER BY suffix_string)``.

Because tokens are non-empty ``[a-z0-9]+`` runs and the join separator
(space, 0x20) sorts below every token character, word-lexicographic
order of token arrays equals byte-lexicographic order of the
space-joined strings — which is what makes the DuckDB string-sort
oracle exact.

LCP of SA-adjacent suffixes runs the classic descending-power walk over
the retained per-round rank tables: ``lcp += h`` iff both walked
positions exist and their ``rank_h`` agree. Adjacency itself needs no
global sort: final ranks are dense consecutive integers, so cross-class
neighbours come from an equi-join on ``rank + 1`` and within-class
(tie) neighbours from a window partitioned by ``rank`` (bounded by the
duplicate multiplicity).

Scale shape (100 TB): rounds = ⌈log₂ max-DOC-length⌉ — independent of
corpus size (suffixes are per-document). Each round is one per-doc
``lead`` window (partition size ≤ max doc length — the same bound the
round count rests on; set ``max_tokens`` on corpora with unbounded
document lengths, since both the round count AND the window-partition
size rest on per-doc length) and one fused two-pass dense rank over
the paired rows (count pass partially dedups map-side, rank pass is
one bucket exchange + in-bucket window — no distinct relation and no
join-back; r13). Peak cache holds this round's AND the previous
round's paired tables between the count and rank actions (2× pair
footprint; released per-round in sequence, and on error by the
loop's finally block).
Driver actions are all bounded: the max-doc-length scalar, the
n_positions count, the per-round rank totals, and the 1-row max-LCP
literal. Per-round ``localCheckpoint`` truncates the iterative lineage
(the connected-components convention, operators/graph.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from symtseries_spark.functions.text import tokens
from symtseries_spark.operators.rank import (
    _default_buckets,
    dense_ranked_with_total,
)

__all__ = [
    "token_positions",
    "suffix_ranks",
    "adjacent_sa_pairs",
    "pair_lcp",
    "max_lcp_winners",
    "longest_dup_span",
]

#: doubling rounds executed by the most recent :func:`suffix_ranks`
#: call (the graph.py LAST_ROUNDS convention) — probe scripts assert
#: corpus-size independence on it.
LAST_ROUNDS = 0


def token_positions(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int | None = None,
) -> DataFrame:
    """``(doc_id, pos, tok)`` with 1-based consecutive ``pos`` per doc.

    ``max_tokens`` optionally truncates every document to its first N
    tokens (the knob that bounds doubling rounds — and oracle cost —
    independently of document length).
    """
    toks = tokens(F.col(text_col))
    if max_tokens is not None:
        if max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")
        toks = F.slice(toks, 1, max_tokens)
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).cast("int").alias("pos"), "tok")


def _vocab_ranks(positions: DataFrame) -> DataFrame:
    """Dense lexicographic rank of the distinct tokens.

    Vocab-bounded single-task window (row_number over DISTINCT tokens
    == dense rank of tokens): |vocab| grows ~O(corpus^0.5) (Heaps), and
    the result broadcasts back — the BPE-family allowance, not a
    corpus-scale sort.
    """
    return (
        positions.select("tok")
        .distinct()
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy("tok")).cast("long"),
        )
    )


def suffix_ranks(
    positions: DataFrame,
    *,
    buckets: int | None = None,
    keep_rounds: bool = False,
    totals_out: dict[int, int] | None = None,
) -> tuple[DataFrame, dict[int, DataFrame]]:
    """Dense rank of every suffix ``(doc_id, pos)`` in word-lex order.

    Precondition: ``positions`` carries 1-based CONSECUTIVE ``pos`` per
    document (what :func:`token_positions` emits — every caller) — the
    doubling rounds read ``rank[pos+h]`` as ``lead(rank, h)`` over the
    per-doc pos order, which is only the ``pos+h`` lookup when positions
    are gap-free.

    Returns ``(ranks, rounds)`` where ``ranks`` is
    ``(doc_id, pos, sa_rank)`` — ``sa_rank`` dense over suffix
    equivalence classes, 1-based, identical whole-tail suffixes sharing
    a rank — and ``rounds`` maps prefix length h → the ``rank_h`` table
    (only populated when ``keep_rounds``; required by :func:`pair_lcp`).

    ``totals_out`` (r12): pass a dict to receive the per-round class
    counts the loop already computes for its convergence test — key h →
    number of distinct rank classes at prefix length h, plus key 0 →
    total position count. ``totals_out[h] == totals_out[0]`` means all
    h-prefixes are distinct corpus-wide, which is what lets
    :func:`max_lcp_winners` skip that power outright (no two positions
    can agree on an h-prefix at ANY offset). Free — no extra job.
    """
    # eager=False: the stats action below materializes the checkpoint
    # in the same job (r12 fusion — was a materialization job + a stats
    # job over the same rows)
    pos_tbl = positions.select("doc_id", "pos", "tok").localCheckpoint(
        eager=False
    )
    stats = pos_tbl.groupBy("doc_id").count().agg(
        F.count("*").alias("docs"),
        F.coalesce(F.max("count"), F.lit(0)).alias("max_len"),
        F.sum("count").alias("n"),
    ).first()
    max_len = int(stats["max_len"] or 0)
    n_positions = int(stats["n"] or 0)
    if totals_out is not None:
        totals_out[0] = n_positions
    if n_positions == 0:
        empty = pos_tbl.select(
            "doc_id", "pos", F.lit(0).cast("long").alias("sa_rank")
        )
        return empty, ({1: empty} if keep_rounds else {})

    vocab = _vocab_ranks(pos_tbl)
    # eager=False: the vmax action below materializes the checkpoint in
    # the same job (the pos_tbl/stats fusion above, applied here in r12
    # session 4 — was a dedicated materialization job).
    cur = pos_tbl.join(F.broadcast(vocab), "tok").select(
        "doc_id", "pos", "rank"
    ).localCheckpoint(eager=False)

    global LAST_ROUNDS
    LAST_ROUNDS = 0
    rounds: dict[int, DataFrame] = {1: cur} if keep_rounds else {}
    h = 1
    # Round 1's r1 domain is ALSO known — vocab ranks are dense in
    # [1, |vocab|] — so seed prev_total from the checkpointed rank-1
    # table (max(rank) over materialized blocks: one small scan, no
    # recompute) and EVERY round (round 1 included) takes the
    # key_bounds fast path. The adaptive approxQuantile pass cost
    # ~5.9s on the 962 distinct round-1 pairs at sf0.1 vs ~2s for the
    # bounded path (r12.2 profile); the fixed-point break stays sound
    # (it compares (r1, r2)-class counts across ROUNDS — round 1's
    # 'prev' is the h=1 class count, exactly the partition the h=2
    # pairing refines).
    vmax = cur.agg(F.max("rank")).first()[0]
    prev_total = int(vmax or 0)
    if totals_out is not None:
        totals_out[1] = prev_total
    # Pairing is a WINDOW, not a self-join (r12 session 4): ``pos`` is
    # 1-based and CONSECUTIVE per document (the token_positions
    # contract every caller feeds), so rank_h[pos + h] is exactly
    # ``lead(rank, h)`` over (doc_id, pos-order) — one exchange + one
    # sort over the corpus per round instead of the join's two of each,
    # and the join operator itself disappears (guide §2.3/§3.4: the
    # cheapest join is the one you don't run). Past-end stays NULL →
    # -1. Window partitions are per-document, bounded by max doc
    # length / ``max_tokens`` — the same bound the round count already
    # rests on, never corpus-scale.
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    paired: DataFrame | None = None
    prev_paired: DataFrame | None = None
    try:
        while h < max_len:
            LAST_ROUNDS += 1
            # persist, not eager localCheckpoint: lineage is one window
            # off the checkpointed cur, so truncation buys nothing —
            # the fused rank's count action fills the cache and the
            # final rank plan reuses it, saving the per-round
            # materialization job (r12). The persist is also what
            # makes the fused rank's two driver actions see the SAME
            # rows (its determinism contract).
            paired = (
                cur.select(
                    "doc_id",
                    "pos",
                    F.col("rank").alias("r1"),
                    F.coalesce(
                        F.lead("rank", h).over(w_doc), F.lit(-1).cast("long")
                    ).alias("r2"),
                )
                .persist()
            )
            # Fused two-pass dense rank CARRIED ON the paired rows
            # (r13): dense_rank over (r1, r2) == the old row_number
            # over DISTINCT (r1, r2) joined back, with the distinct
            # exchange and the corpus-sized join-back both gone — the
            # count pass's count_distinct partially dedups map-side,
            # so shuffled bytes stay ~distinct-sized. r1 < 2^53 is
            # double-exact; r2 is the numeric tiebreak. r1 is a DENSE
            # rank in [1, prev_total] every round (round 1: vocab
            # ranks, vmax-seeded above), so uniform precomputed bounds
            # replace the approxQuantile pass (r12: one less full pass
            # per round; boundary placement is balance-only). The
            # trade documented on ranked_with_total applies: a single
            # class with very many distinct continuations lands in one
            # bucket — bounded by the geometric class shrink per
            # round, and never a correctness concern.
            nb = buckets if buckets is not None else _default_buckets(paired)
            kb = [float(1 + (i * prev_total) // nb) for i in range(1, nb)]
            ranked, total = dense_ranked_with_total(
                paired,
                "r1",
                tiebreak="r2",
                out="nr",
                key_bounds=kb,
            )
            # The fused rank's count action just ran: it materialized
            # this round's paired cache AND the previous round's LAZY
            # cur checkpoint (see below), so the previous paired cache
            # has no remaining consumer and can be released here (r12
            # session 4).
            if prev_paired is not None:
                prev_paired.unpersist()
            # The stop decision only needs `total`, which is already
            # in hand — so the checkpoint can be lazy on every
            # CONTINUING round (the next round's count action
            # materializes it while this paired cache is still alive)
            # and eager only on the final one (after the loop nothing
            # is guaranteed to run before paired is released). Saves
            # one blocking materialization job per round.
            stop = (
                total == n_positions
                or total == prev_total
                or h * 2 >= max_len
            )
            cur = ranked.select(
                "doc_id", "pos", F.col("nr").cast("long").alias("rank")
            ).localCheckpoint(eager=stop)
            if stop:
                paired.unpersist()
                paired = None
                prev_paired = None
            else:
                prev_paired, paired = paired, None
            h *= 2
            if keep_rounds:
                rounds[h] = cur
            if totals_out is not None:
                totals_out[h] = int(total)
            if total == n_positions:
                break  # every suffix separated: ranks are final
            if total == prev_total:
                # Fixed point: the class partition did not refine from
                # h/2 to h, so no further doubling can refine it (same
                # class at stale h ⇒ the h-shifted positions share a
                # class too, by induction every future pairing agrees).
                # Surviving ties are exactly the identical whole-tail
                # suffixes, and the rank values are already the final
                # dense ranks — the loop to h >= max_len would
                # re-derive the same table each round (r12: saves
                # ⌈log₂ max_len⌉ − rounds-to-stability full doubling
                # rounds; the planted-mirror corpora stabilize long
                # before max_len).
                break
            prev_total = total
    except BaseException:
        # release both in-flight pair caches on error — without this,
        # an exception inside the fused rank leaked up to two
        # corpus-sized persists for the session's lifetime (ADVICE r12)
        for p in (paired, prev_paired):
            if p is not None:
                p.unpersist()
        raise
    else:
        if prev_paired is not None:
            prev_paired.unpersist()

    return cur.select(
        "doc_id", "pos", F.col("rank").alias("sa_rank")
    ), rounds


def adjacent_sa_pairs(ranks: DataFrame) -> DataFrame:
    """SA-order neighbour pairs ``(a_doc, a_pos, b_doc, b_pos)``.

    Dense ranks make adjacency join-shaped: consecutive classes meet on
    ``rank + 1`` (last member of r, by (doc_id, pos), to first member
    of r+1), and tie-class members chain through a window partitioned
    by ``rank`` — per-partition size = duplicate multiplicity, never a
    global sort. Exactly n-1 pairs come back; max adjacent LCP over
    them equals max LCP over ALL suffix pairs (the SA adjacency
    property, alphabet-order invariant).
    """
    member = F.struct(F.col("doc_id"), F.col("pos"))
    w = Window.partitionBy("sa_rank").orderBy("doc_id", "pos")
    within = (
        ranks.withColumn("nxt", F.lead(member).over(w))
        .where(F.col("nxt").isNotNull())
        .select(
            F.col("doc_id").alias("a_doc"),
            F.col("pos").alias("a_pos"),
            F.col("nxt.doc_id").alias("b_doc"),
            F.col("nxt.pos").alias("b_pos"),
        )
    )
    ends = ranks.groupBy("sa_rank").agg(
        F.min(member).alias("first"), F.max(member).alias("last")
    )
    across = (
        ends.alias("lo")
        .join(
            ends.alias("hi"),
            F.col("lo.sa_rank") + 1 == F.col("hi.sa_rank"),
        )
        .select(
            F.col("lo.last.doc_id").alias("a_doc"),
            F.col("lo.last.pos").alias("a_pos"),
            F.col("hi.first.doc_id").alias("b_doc"),
            F.col("hi.first.pos").alias("b_pos"),
        )
    )
    return within.unionByName(across)


def pair_lcp(pairs: DataFrame, rounds: dict[int, DataFrame]) -> DataFrame:
    """Exact LCP (in tokens) for each position pair, appended as ``lcp``.

    Descending-power walk over the per-round rank tables: at power h,
    ``lcp += h`` iff positions ``a+lcp`` and ``b+lcp`` both exist and
    their h-prefix ranks agree. log₂(max doc length) rounds, each two
    equi-joins keyed by ``(doc_id, pos)`` — position keys are unique,
    so the joins are skew-free at any scale.

    Generalized-SA twist the classic walk (which assumes all suffixes
    distinct) lacks: when both tails are EXHAUSTED and equal —
    identical whole-tails across documents — ``rank_h`` agreement at
    h > tail length is $-padding agreement, and the raw walk adds h.
    In that case the true LCP is the full (equal) tail, so the final
    value is clamped to the min remaining tail length: a no-op on
    every non-degenerate pair, exact on the degenerate ones.
    """
    out = pairs.withColumn("lcp", F.lit(0).cast("int"))
    powers = sorted(rounds, reverse=True)
    for step, h in enumerate(powers):
        rk = rounds[h].select(
            F.col("doc_id").alias("__d"),
            F.col("pos").alias("__p"),
            F.col("rank").alias("__r"),
        )
        ra = rk.select(
            F.col("__d").alias("__da"),
            F.col("__p").alias("__pa"),
            F.col("__r").alias("__ra"),
        )
        rb = rk.select(
            F.col("__d").alias("__db"),
            F.col("__p").alias("__pb"),
            F.col("__r").alias("__rb"),
        )
        out = (
            out.join(
                ra,
                (F.col("a_doc") == F.col("__da"))
                & (F.col("a_pos") + F.col("lcp") == F.col("__pa")),
                "left",
            )
            .join(
                rb,
                (F.col("b_doc") == F.col("__db"))
                & (F.col("b_pos") + F.col("lcp") == F.col("__pb")),
                "left",
            )
            .withColumn(
                "lcp",
                F.col("lcp")
                + F.when(
                    F.col("__ra").isNotNull()
                    & (F.col("__ra") == F.col("__rb")),
                    F.lit(h),
                ).otherwise(F.lit(0)),
            )
            .drop("__da", "__pa", "__ra", "__db", "__pb", "__rb")
        )
        # Unlike the doubling loop (whose table is referenced TWICE per
        # round — exponential lineage without a cut), the walk grows
        # linearly (2 joins/round), so a cut every 3rd round bounds
        # plan size without paying a materialization per power —
        # eager=False (r12): each cut still truncates lineage when the
        # consumer's job runs, but the whole walk pipelines into ONE
        # job instead of one blocking job per cut.
        if step % 3 == 2 or h == powers[-1]:
            out = out.localCheckpoint(eager=False)
    lens = (
        rounds[min(rounds)]
        .groupBy("doc_id")
        .agg(F.max("pos").alias("__len"))
    )
    out = (
        out.join(
            lens.select(
                F.col("doc_id").alias("a_doc"), F.col("__len").alias("__la")
            ),
            "a_doc",
        )
        .join(
            lens.select(
                F.col("doc_id").alias("b_doc"), F.col("__len").alias("__lb")
            ),
            "b_doc",
        )
        .withColumn(
            "lcp",
            F.least(
                F.col("lcp"),
                F.col("__la") - F.col("a_pos") + 1,
                F.col("__lb") - F.col("b_pos") + 1,
            ).cast("int"),
        )
        .drop("__la", "__lb")
    )
    return out


def max_lcp_winners(
    pairs: DataFrame,
    rounds: dict[int, DataFrame],
    totals: dict[int, int],
) -> tuple[int, DataFrame]:
    """MAX adjacent-pair LCP + every argmax pair, via a PRUNED
    descending-power walk -> ``(max_lcp, winners)`` with ``winners``
    the pairs whose clamped LCP equals the max (superset columns of
    ``pairs`` plus ``lcp``).

    Exactly :func:`pair_lcp`'s arithmetic (same rank-agreement joins,
    same whole-tail clamp — applied per step, which commutes with the
    final ``least`` because the cap is constant per pair), but scoped
    to the MAX question, which licenses two exact cuts the per-pair
    walk cannot make:

    * **Power skip**: ``totals[h] == totals[0]`` means every h-prefix
      is distinct corpus-wide, so NO two positions can agree on an
      h-prefix at any offset — the power h join is a guaranteed no-op
      and is skipped without running it. The walk therefore STARTS at
      the largest power that still has prefix ties (free knowledge
      from the doubling loop's own convergence totals).
    * **Branch-and-bound prune**: after each power h, a pair's best
      possible final value is ``min(lcp + (h - 1), cap)`` (remaining
      powers sum to h - 1; the whole-tail cap is a hard ceiling).
      Pairs whose bound falls below the current best are dropped —
      they cannot be argmax. At the first walked power the agreeing
      pairs (>= h) immediately dominate the rest (< h <= their own
      bound h - 1), so the surviving set collapses to the pairs
      sharing that prefix — duplication-bounded, not corpus-bounded —
      and every later join runs on it.

    Per walked power this costs one bounded scalar action (the
    running max — the connected-components convergence convention);
    in exchange all but the FIRST walked power join a
    duplication-sized pair set instead of the corpus-sized one, and
    the padding-power joins above the tie ceiling never run at all.
    """
    n = totals.get(0, 0)
    lens = (
        rounds[min(rounds)]
        .groupBy("doc_id")
        .agg(F.max("pos").alias("__len"))
    )
    out = (
        pairs.join(
            lens.select(
                F.col("doc_id").alias("a_doc"), F.col("__len").alias("__la")
            ),
            "a_doc",
        )
        .join(
            lens.select(
                F.col("doc_id").alias("b_doc"), F.col("__len").alias("__lb")
            ),
            "b_doc",
        )
        .withColumn(
            "__cap",
            F.least(
                F.col("__la") - F.col("a_pos"), F.col("__lb") - F.col("b_pos")
            ).cast("int")
            + F.lit(1),
        )
        .drop("__la", "__lb")
        .withColumn("lcp", F.lit(0).cast("int"))
    )
    best = 0
    walked = [h for h in sorted(rounds, reverse=True) if totals.get(h, 0) < n]
    for h in walked:
        rk = rounds[h].select(
            F.col("doc_id").alias("__d"),
            F.col("pos").alias("__p"),
            F.col("rank").alias("__r"),
        )
        ra = rk.select(
            F.col("__d").alias("__da"),
            F.col("__p").alias("__pa"),
            F.col("__r").alias("__ra"),
        )
        rb = rk.select(
            F.col("__d").alias("__db"),
            F.col("__p").alias("__pb"),
            F.col("__r").alias("__rb"),
        )
        out = (
            out.join(
                ra,
                (F.col("a_doc") == F.col("__da"))
                & (F.col("a_pos") + F.col("lcp") == F.col("__pa")),
                "left",
            )
            .join(
                rb,
                (F.col("b_doc") == F.col("__db"))
                & (F.col("b_pos") + F.col("lcp") == F.col("__pb")),
                "left",
            )
            .withColumn(
                "lcp",
                F.least(
                    F.col("lcp")
                    + F.when(
                        F.col("__ra").isNotNull()
                        & (F.col("__ra") == F.col("__rb")),
                        F.lit(h),
                    ).otherwise(F.lit(0)),
                    F.col("__cap"),
                ),
            )
            .drop("__da", "__pa", "__ra", "__db", "__pb", "__rb")
            .localCheckpoint(eager=False)
        )
        # bounded scalar: the running max (materializes the checkpoint)
        row = out.agg(F.max("lcp").alias("m")).first()
        best = int(row["m"]) if row and row["m"] is not None else 0
        out = out.where(
            F.least(F.col("lcp") + F.lit(h - 1), F.col("__cap"))
            >= F.lit(best)
        )
    return best, out.where(F.col("lcp") == F.lit(best))


def longest_dup_span(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Longest token span occurring ≥2 times corpus-wide →
    ``(span_text, len_words, occurrences)`` (one row per distinct
    max-length span; empty when the corpus has no repeated token).

    ``occurrences`` counts positions whose window equals the span: all
    suffixes sharing the span as a prefix form one contiguous SA run,
    so it equals (adjacent pairs at max LCP for that span) + 1.
    """
    from symtseries_spark.cache import persist_tracked

    # persist: the token table feeds BOTH the rank construction (which
    # checkpoints its own projection) and the span-text reconstruction
    # join at the end — unpersisted, the tokenize+posexplode scan ran
    # twice (r12)
    positions = persist_tracked(
        token_positions(
            docs, id_col=id_col, text_col=text_col, max_tokens=max_tokens
        )
    )
    totals: dict[int, int] = {}
    ranks, rounds = suffix_ranks(
        positions, buckets=buckets, keep_rounds=True, totals_out=totals
    )
    pairs = adjacent_sa_pairs(ranks)
    # pruned walk (r12): only the max and its argmax pairs are needed
    # here, so the padding powers above the tie ceiling are skipped and
    # the pair set collapses to the duplication-sized survivors after
    # the first walked power — see max_lcp_winners. pair_lcp (the
    # exact per-pair walk) remains the API for callers that need every
    # pair's value.
    max_lcp, winner_pairs = max_lcp_winners(pairs, rounds, totals)
    if max_lcp == 0:
        return pairs.select(
            F.lit("").alias("span_text"),
            F.lit(0).cast("int").alias("len_words"),
            F.lit(0).cast("long").alias("occurrences"),
        ).limit(0)
    winners = winner_pairs.select("a_doc", "a_pos")
    # Span text: explode the max_lcp-long position range (a literal
    # int) and equi-join the token table — no range join.
    span_pos = winners.select(
        "a_doc",
        "a_pos",
        F.posexplode(
            F.sequence(
                F.col("a_pos"), F.col("a_pos") + F.lit(max_lcp - 1)
            )
        ).alias("i", "pos"),
    )
    with_toks = span_pos.join(
        positions.withColumnRenamed("doc_id", "a_doc"),
        ["a_doc", "pos"],
    )
    spans = with_toks.groupBy("a_doc", "a_pos").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("i"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("span_text")
    )
    return (
        spans.groupBy("span_text")
        .agg((F.count("*") + 1).cast("long").alias("occurrences"))
        .select(
            "span_text",
            F.lit(max_lcp).cast("int").alias("len_words"),
            "occurrences",
        )
    )
