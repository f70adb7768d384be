"""Distributed suffix array / LCP (operators/suffix.py).

Parity model: brute force over materialized suffix strings (the same
formulation the DuckDB oracles run), plus hand-computed goldens.
"""

from collections import Counter

import pytest

from symtseries_spark.operators.suffix import (
    adjacent_sa_pairs,
    longest_dup_span,
    pair_lcp,
    suffix_ranks,
    token_positions,
)


def _brute_ranks(rows):
    sufs = [
        (d, p + 1, " ".join(t.split()[p:]))
        for d, t in rows
        for p in range(len(t.split()))
    ]
    dense = {s: i + 1 for i, s in enumerate(sorted({s for _, _, s in sufs}))}
    return {(d, p): dense[s] for d, p, s in sufs}


def _brute_span(rows):
    win = Counter()
    for _, t in rows:
        toks = t.split()
        for p in range(len(toks)):
            for length in range(1, len(toks) - p + 1):
                win[" ".join(toks[p : p + length])] += 1
    dups = {w: c for w, c in win.items() if c >= 2}
    if not dups:
        return []
    mx = max(len(w.split()) for w in dups)
    return sorted(
        (w, mx, c) for w, c in dups.items() if len(w.split()) == mx
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _got_span(spark, rows):
    res = longest_dup_span(_df(spark, rows)).collect()
    return sorted((r.span_text, r.len_words, r.occurrences) for r in res)


def test_banana_hand_golden(spark):
    # suffixes of "b a n a n a" word-wise == suffixes of banana:
    # sorted: a(6) ana(4) anana(2) banana(1) na(5) nana(3)
    ranks, _ = suffix_ranks(
        token_positions(_df(spark, [(1, "b a n a n a")]))
    )
    got = {r.pos: r.sa_rank for r in ranks.collect()}
    assert got == {6: 1, 4: 2, 2: 3, 1: 4, 5: 5, 3: 6}


def test_mirrored_docs_tie_dense(spark):
    rows = [(1, "x q x q z"), (2, "x q x q z")]
    ranks, _ = suffix_ranks(token_positions(_df(spark, rows)))
    by_pos = {}
    for r in ranks.collect():
        by_pos.setdefault(r.pos, set()).add(r.sa_rank)
    # identical tails share ONE dense rank per position
    assert all(len(v) == 1 for v in by_pos.values())
    assert {v.pop() for v in by_pos.values()} == {1, 2, 3, 4, 5}


def test_ranks_match_brute_force(spark):
    rows = [
        (1, "a a a c b a c"),
        (2, "a c"),
        (3, "c a c c b a a a c a b"),
        (4, "a c a c b c c"),
    ]
    ranks, _ = suffix_ranks(token_positions(_df(spark, rows)))
    got = {(r.doc_id, r.pos): r.sa_rank for r in ranks.collect()}
    assert got == _brute_ranks(rows)


def test_longest_dup_span_cross_doc(spark):
    rows = [(1, "p q r s t u"), (2, "z z q r s t y")]
    assert _got_span(spark, rows) == [("q r s t", 4, 2)]


def test_longest_dup_span_self_overlap(spark):
    # "a a a a": span "a a a" occurs at pos 1 and 2 (overlapping)
    assert _got_span(spark, [(1, "a a a a")]) == [("a a a", 3, 2)]


def test_longest_dup_span_whole_tail_tie(spark):
    rows = [(1, "b a n a n a"), (2, "b a n a n a")]
    assert _got_span(spark, rows) == [("b a n a n a", 6, 2)]


def test_longest_dup_span_matches_brute(spark):
    rows = [
        (1, "b b b c b b b a a"),
        (2, "a a c b c b b c b b c a"),
        (3, "c b"),
        (4, "b a b"),
        (5, "a c a c c b b"),
        (6, "b c b c b a a b b c c a"),
    ]
    assert _got_span(spark, rows) == _brute_span(rows)


def test_no_duplicates_empty(spark):
    res = longest_dup_span(_df(spark, [(1, "a b c"), (2, "d e f")]))
    assert res.count() == 0
    assert [f.name for f in res.schema.fields] == [
        "span_text",
        "len_words",
        "occurrences",
    ]


def test_pair_lcp_values_exact(spark):
    rows = [(1, "a b c a b d"), (2, "a b d")]
    positions = token_positions(_df(spark, rows))
    ranks, rounds = suffix_ranks(positions, keep_rounds=True)
    pairs = adjacent_sa_pairs(ranks)
    got = {
        ((r.a_doc, r.a_pos), (r.b_doc, r.b_pos)): r.lcp
        for r in pair_lcp(pairs, rounds).collect()
    }
    # brute-force every adjacent pair's LCP
    toks = {d: t.split() for d, t in rows}

    def lcp(a, b):
        ta, tb = toks[a[0]][a[1] - 1 :], toks[b[0]][b[1] - 1 :]
        n = 0
        while n < min(len(ta), len(tb)) and ta[n] == tb[n]:
            n += 1
        return n

    assert len(got) == sum(len(t) for t in toks.values()) - 1
    for (a, b), v in got.items():
        assert v == lcp(a, b), (a, b, v)


def test_max_tokens_truncation(spark):
    rows = [(1, "a b c d e f"), (2, "x a b c y z")]
    pos = token_positions(_df(spark, rows), max_tokens=3)
    assert pos.groupBy("doc_id").count().agg({"count": "max"}).first()[
        0
    ] == 3
    trunc = [(1, "a b c"), (2, "x a b")]
    assert _got_span(spark, trunc) == _brute_span(trunc)


def test_max_tokens_validation(spark):
    with pytest.raises(ValueError):
        token_positions(_df(spark, [(1, "a")]), max_tokens=0)


def test_empty_corpus(spark):
    ranks, _ = suffix_ranks(
        token_positions(_df(spark, [(1, ""), (2, "   ")]))
    )
    assert ranks.count() == 0


def test_max_lcp_winners_matches_pair_lcp(spark):
    """The pruned max walk (r12) must agree with the exact per-pair
    walk on the max AND the argmax pair set — including the whole-tail
    clamp (docs 4/5 are verbatim mirrors) and the padding-power skip
    (totals gate)."""
    from pyspark.sql import functions as F

    from symtseries_spark.operators.suffix import max_lcp_winners

    rows = [
        (1, "p q r the quick brown fox ends here"),
        (2, "z z the quick brown fox another tail"),
        (3, "lone words only once each time"),
        (4, "mirror twin body match"),
        (5, "mirror twin body match"),
    ]
    positions = token_positions(_df(spark, rows))
    totals: dict[int, int] = {}
    ranks, rounds = suffix_ranks(
        positions, keep_rounds=True, totals_out=totals
    )
    pairs = adjacent_sa_pairs(ranks)
    lcps = pair_lcp(pairs, rounds)
    exact_max = lcps.agg(F.max("lcp")).first()[0]
    exact_winners = {
        (r.a_doc, r.a_pos, r.b_doc, r.b_pos)
        for r in lcps.where(F.col("lcp") == exact_max).collect()
    }
    got_max, got = max_lcp_winners(pairs, rounds, totals)
    assert got_max == exact_max
    assert {
        (r.a_doc, r.a_pos, r.b_doc, r.b_pos) for r in got.collect()
    } == exact_winners
    # the totals gate recorded every stored round plus the n sentinel
    assert totals[0] == positions.count()
    assert set(totals) - {0} == set(rounds)


def test_max_lcp_winners_no_repeats(spark):
    """All-unique corpus: every power is skipped (totals[1] == n) and
    the result is max 0 with every pair surviving at lcp 0."""
    rows = [(1, "a b c"), (2, "d e f")]
    positions = token_positions(_df(spark, rows))
    totals: dict[int, int] = {}
    ranks, rounds = suffix_ranks(
        positions, keep_rounds=True, totals_out=totals
    )
    from symtseries_spark.operators.suffix import max_lcp_winners

    pairs = adjacent_sa_pairs(ranks)
    got_max, got = max_lcp_winners(pairs, rounds, totals)
    assert got_max == 0
    assert got.count() == pairs.count()
