"""At-rest inverted index + BM25 probe (sources write_postings_index /
read_postings_topk)."""

import math
import tempfile

import pytest

from symtseries_spark.sources import (
    read_postings_topk,
    write_postings_index,
)

DOCS = [
    (1, "spark join hash join"),
    (2, "hash map and hash set"),
    (3, "spark shuffle spark spark"),
    (4, "nothing relevant here at all"),
    (5, "join the club"),
]


def _brute_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in rows}
    n = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    out = {}
    for d, t in toks.items():
        parts = []
        for q in sorted(terms):
            tf = t.count(q)
            if tf == 0:
                continue
            idf = math.log(
                1.0 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5)
            )
            parts.append(
                idf
                * tf
                * (k1 + 1.0)
                / (tf + k1 * (1.0 - b + b * len(t) / avgdl))
            )
        if parts:
            acc = 0.0
            for p in parts:
                acc += p
            out[d] = round(acc, 6)
    return out


@pytest.fixture(scope="module")
def index(spark):
    path = tempfile.mkdtemp(prefix="postings_test_") + "/idx"
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    write_postings_index(df, path, num_buckets=8)
    return path


def test_scores_match_brute_force(spark, index):
    got = {
        r.doc_id: r.score
        for r in read_postings_topk(
            spark, index, ["hash", "join", "spark"], topk=10, num_buckets=8
        ).collect()
    }
    assert got == _brute_bm25(DOCS, ["hash", "join", "spark"])


def test_only_matching_docs_returned(spark, index):
    got = read_postings_topk(
        spark, index, ["club"], topk=10, num_buckets=8
    ).collect()
    assert [r.doc_id for r in got] == [5]


def test_scan_is_pruned(spark, index):
    got = read_postings_topk(
        spark, index, ["spark"], topk=3, num_buckets=8
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tb" in plan
    assert "PushedFilters" in plan and "term" in plan
    # top-k must be a partial TakeOrdered, never a global Sort
    assert "TakeOrderedAndProject" in plan


def test_unknown_term_empty(spark, index):
    assert (
        read_postings_topk(
            spark, index, ["zzznope"], topk=5, num_buckets=8
        ).count()
        == 0
    )


def test_topk_truncates_with_tie_order(spark, index):
    got = read_postings_topk(
        spark, index, ["hash", "join", "spark"], topk=2, num_buckets=8
    ).collect()
    full = _brute_bm25(DOCS, ["hash", "join", "spark"])
    want = sorted(full.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r.doc_id, r.score) for r in got] == want


def test_validation(spark, index):
    with pytest.raises(ValueError):
        read_postings_topk(spark, index, [], topk=5)
    with pytest.raises(ValueError):
        read_postings_topk(spark, index, ["a"], topk=0)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        write_postings_index(df, "/tmp/x", num_buckets=0)


NEW_DOCS = [
    (6, "spark hash spark"),
    (7, "completely unrelated words"),
]


def test_append_equals_rebuild(spark):
    """Appending a batch must be score-identical to rebuilding the
    index over the union corpus."""
    from symtseries_spark.sources import append_postings_index

    p_inc = tempfile.mkdtemp(prefix="postings_inc_") + "/idx"
    p_all = tempfile.mkdtemp(prefix="postings_all_") + "/idx"
    d0 = spark.createDataFrame(DOCS, "doc_id long, text string")
    d1 = spark.createDataFrame(NEW_DOCS, "doc_id long, text string")
    write_postings_index(d0, p_inc, num_buckets=8)
    append_postings_index(d1, p_inc, num_buckets=8)
    write_postings_index(d0.unionByName(d1), p_all, num_buckets=8)
    terms = ["hash", "join", "spark"]
    got_inc = {
        r.doc_id: r.score
        for r in read_postings_topk(
            spark, p_inc, terms, topk=10, num_buckets=8
        ).collect()
    }
    got_all = {
        r.doc_id: r.score
        for r in read_postings_topk(
            spark, p_all, terms, topk=10, num_buckets=8
        ).collect()
    }
    assert got_inc == got_all
    assert got_inc == _brute_bm25(DOCS + NEW_DOCS, terms)


def test_phrase_match_counts(spark):
    from symtseries_spark.sources import read_phrase_match

    docs = [
        (1, "a b c a b"),       # "a b" twice
        (2, "b a b a"),          # "a b" once (pos 2)
        (3, "a a a"),            # never "a b"
        (4, "x a b x a b x a b"),  # three times
    ]
    path = tempfile.mkdtemp(prefix="phrase_test_") + "/idx"
    df = spark.createDataFrame(docs, "doc_id long, text string")
    write_postings_index(df, path, num_buckets=4)
    got = {
        r.doc_id: r.n_occurrences
        for r in read_phrase_match(
            spark, path, ["a", "b"], num_buckets=4
        ).collect()
    }
    assert got == {1: 2, 2: 1, 4: 3}


def test_phrase_three_terms_and_repeated_term(spark):
    from symtseries_spark.sources import read_phrase_match

    docs = [
        (1, "q q r s q q r"),   # "q q r" at 1 and 5
        (2, "q r s"),            # no "q q r"
    ]
    path = tempfile.mkdtemp(prefix="phrase3_test_") + "/idx"
    df = spark.createDataFrame(docs, "doc_id long, text string")
    write_postings_index(df, path, num_buckets=4)
    got = {
        r.doc_id: r.n_occurrences
        for r in read_phrase_match(
            spark, path, ["q", "q", "r"], num_buckets=4
        ).collect()
    }
    assert got == {1: 2}


def test_phrase_validation(spark, index):
    from symtseries_spark.sources import read_phrase_match

    with pytest.raises(ValueError):
        read_phrase_match(spark, index, ["solo"])


def test_duplicate_terms_rejected(spark, index):
    with pytest.raises(ValueError):
        read_postings_topk(
            spark, index, ["hash", "hash"], topk=5, num_buckets=8
        )
