"""Property tests for the engine's central semantic claims.

The headline invariant (the whole point of SAX/iSAX, README.md:27-34 of
the reference): MINDIST between two SAX words NEVER overestimates the
true Euclidean distance between the two z-normalized series. Every
pruning operator in the engine (allpairs, isax_topk) relies on it.
"""

from __future__ import annotations

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from symtseries_spark import pykernel as pk


def _znorm(vals: list[float]) -> list[float]:
    mu, std = pk.mu_std(vals)
    if std < 1e-2:
        return [0.0 for _ in vals]
    return [(v - mu) / std for v in vals]


def _euclid(a: list[float], b: list[float]) -> float:
    return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))


series_strategy = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    min_size=8,
    max_size=8,
)


class TestMindistLowerBound:
    @given(series_strategy, series_strategy, st.sampled_from([2, 4, 8, 16]))
    @settings(max_examples=300, deadline=None)
    def test_mindist_lower_bounds_euclidean(self, a, b, c):
        w = 4
        wa, wb = pk.encode(a, w, c), pk.encode(b, w, c)
        d = pk.mindist(pk.parse(wa, c), pk.parse(wb, c), c=c, n_a=8, n_b=8)
        true_d = _euclid(_znorm(a), _znorm(b))
        # float32 tables + per-frame aggregation: small tolerance
        assert d <= true_d + 1e-4, (a, b, wa, wb, d, true_d)

    @given(series_strategy, st.sampled_from([4, 8]))
    @settings(max_examples=100, deadline=None)
    def test_mindist_self_is_zero(self, a, c):
        wa = pk.encode(a, 4, c)
        assert pk.mindist(pk.parse(wa, c), pk.parse(wa, c), c=c) == 0.0

    @given(series_strategy, series_strategy, st.sampled_from([4, 8]))
    @settings(max_examples=100, deadline=None)
    def test_mindist_symmetric_with_swapped_decomposition(self, a, b, c):
        wa, wb = pk.encode(a, 4, c), pk.encode(b, 4, c)
        d1 = pk.mindist_parts(pk.parse(wa, c), pk.parse(wb, c), c=c)
        d2 = pk.mindist_parts(pk.parse(wb, c), pk.parse(wa, c), c=c)
        assert d1 is not None and d2 is not None
        assert math.isclose(d1[0], d2[0], abs_tol=1e-9)
        assert math.isclose(d1[1], d2[2], abs_tol=1e-9)  # above <-> below
        assert math.isclose(d1[2], d2[1], abs_tol=1e-9)


class TestCoarseningMonotone:
    @given(series_strategy, series_strategy)
    @settings(max_examples=100, deadline=None)
    def test_coarse_mindist_never_exceeds_fine(self, a, b):
        """iSAX tree soundness: distance at a coarser cardinality is a
        lower bound of the distance at the finer one (so pruning a whole
        coarse node never loses a true match)."""
        wa8, wb8 = pk.encode(a, 4, 8), pk.encode(b, 4, 8)
        wa2, wb2 = pk.coarsen(wa8, 8, 2), pk.coarsen(wb8, 8, 2)
        d8 = pk.mindist(pk.parse(wa8, 8), pk.parse(wb8, 8), c=8, n_a=8, n_b=8)
        d2 = pk.mindist(pk.parse(wa2, 2), pk.parse(wb2, 2), c=2, n_a=8, n_b=8)
        assert d2 <= d8 + 1e-6


class TestTextKernelFuzz:
    """Fuzz the Spark text kernels against a pure-Python oracle over
    random printable-ASCII strings (regex edge cases: runs of
    punctuation, digits, empty tokens, leading/trailing separators)."""

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=32, max_codepoint=126
                ),
                max_size=40,
            ),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=30, deadline=None)
    def test_tokens_and_fingerprint_match_python(self, texts):
        import hashlib

        from pyspark.sql import Row
        from pyspark.sql import functions as F

        from symtseries_spark.functions import text as T
        from tests.test_pipeline_operators import py_hash60, py_tokens

        spark = TestTextKernelFuzz._spark
        df = spark.createDataFrame(
            [Row(i=i, text=t) for i, t in enumerate(texts)]
        )
        rows = df.select(
            "i",
            T.tokens(F.col("text")).alias("toks"),
            T.rolling_fingerprint(F.col("text")).alias("fp"),
            T.shingles(F.col("text"), 2).alias("sh2"),
        ).collect()
        for r in rows:
            t = texts[r.i]
            ptoks = py_tokens(t)
            assert r.toks == ptoks, t
            acc = 0
            for tok in ptoks:
                acc = (acc * 31 + py_hash60(tok) % T.HASH_PRIME) % 1_000_000_007
            assert r.fp == acc, t
            psh = {" ".join(ptoks[i : i + 2]) for i in range(len(ptoks) - 1)}
            assert set(r.sh2) == psh, t


import pytest as _pytest


@_pytest.fixture(scope="module", autouse=True)
def _bind_spark(spark):
    TestTextKernelFuzz._spark = spark
    yield
