"""Golden-vector tests for the pure-Python SAX kernels.

Vectors are the reference's own asserted outputs
(/root/reference/src/symtseries.c:698-967, /root/reference/lua/test.lua),
catalogued in FIXTURES.md. Distances compare at 1e-5 (lua/test.lua:18).
"""

import math

import pytest

from symtseries_spark import pykernel as pk
from symtseries_spark.constants import BREAKPOINTS, MINDIST_LUT, LETTERS

NAN = float("nan")
INF = float("inf")

ENCODE_GOLDENS = [
    # (case_id, series, w, c, expected_sax) — FIXTURES.md §1
    ("sample_haed", [5, 6, 7, -5, -6, -7, 0.25, 0.17, 0.04, -0.04, -0.17, -0.25], 4, 8, "HAED"),
    ("readme_fc", [10.3, 7, 1, -5, -5, 7.2], 2, 8, "FC"),
    ("window_ad", [1, 2, 3, 10.1], 2, 4, "AD"),
    ("nan_inf_mix", [NAN, NAN, INF, -INF, INF, 1, -INF, -1, NAN, -5, 5, NAN], 6, 8, "##HAAH"),
    ("inf_only", [INF, INF, INF, INF, INF, INF, -INF, -INF, -INF], 3, 5, "EEA"),
    ("inf_scalar_mix", [INF, INF, 5, 0, 0, 0, -INF, -INF, -5], 3, 5, "ECA"),
    ("inf_zero", [INF, INF, INF, 0, 0, 0, -INF, -INF, -INF], 3, 5, "ECA"),
    ("nan_scalar_mix", [NAN, 5, 5, 0, 0, 0, NAN, -5, -5], 3, 5, "ECA"),
    ("nan_inf_frames", [NAN, INF, INF, 0, 0, 0, NAN, -INF, -INF], 3, 5, "ECA"),
    ("nan_frame_mid", [INF, INF, 5, NAN, NAN, NAN, -INF, -INF, -5], 3, 5, "E#A"),
    ("all_nan", [NAN] * 9, 3, 5, "###"),
    ("nan_edges", [NAN, INF, NAN], 3, 5, "#E#"),
]


@pytest.mark.parametrize("case_id,series,w,c,expected", ENCODE_GOLDENS, ids=[g[0] for g in ENCODE_GOLDENS])
def test_encode_goldens(case_id, series, w, c, expected):
    assert pk.encode([float(v) for v in series], w, c) == expected


def test_zero_maps_to_middle_symbol_every_cardinality():
    # symtseries.c:704-712: z=0 buckets to the middle letter for every c
    for c in range(2, 17):
        idx = pk.bucket(0.0, c)
        # reference symbol (c/2)-1+(c%2), reversed to letter index:
        ref_symbol = (c // 2) - 1 + (c % 2)
        assert idx == c - 1 - ref_symbol


def test_break_boundaries_strict_less():
    # symtseries.c:714-733: value just below a break -> lower bucket;
    # value exactly at a break -> upper bucket (strict <)
    for c in range(2, 17):
        for i, b in enumerate(BREAKPOINTS[c]):
            assert pk.bucket(b - 1e-9, c) == i
            assert pk.bucket(b, c) == i + 1


def test_stationary_series_all_middle():
    # symtseries.c:761-794: sigma < 1e-2 => every frame reads flat
    series = [8.0 + (1e-2 if i % 2 else -1e-2) for i in range(60)]
    for c in range(2, 17):
        for w in (2, 3, 4, 5, 6, 10, 12, 15, 20, 30, 60):
            word = pk.encode(series, w, c)
            middle = LETTERS[pk.bucket(0.0, c)]
            assert word == middle * w, (c, w, word)


MINDIST_GOLDENS = [
    # (case_id, word_a, n_a, word_b, n_b, c, (dist, above, below))
    ("abdd_dbaa", "ABDD", 0, "DBAA", 0, 4, (2.336536, 1.907774, 1.349000)),
    ("hash_hash", "####", 0, "####", 0, 4, (0.0, 0.0, 0.0)),
]


@pytest.mark.parametrize("case_id,wa,na,wb,nb,c,expected", MINDIST_GOLDENS, ids=[g[0] for g in MINDIST_GOLDENS])
def test_mindist_goldens(case_id, wa, na, wb, nb, c, expected):
    a, b = pk.parse(wa, c), pk.parse(wb, c)
    got = pk.mindist_parts(a, b, c=c, n_a=na, n_b=nb)
    assert got is not None
    for g, e in zip(got, expected):
        assert abs(g - e) < 1e-5, (case_id, got, expected)


def test_mindist_readme_window():
    # lua/test.lua:12-18: two encoded n=6 series, w=2, c=8 -> 1.560325
    a = pk.encode_indices([10.3, 7, 1, -5, -5, 7.2], 2, 8)
    b = pk.encode_indices([-9, -8, -7, -5, -5, 7.2], 2, 8)
    d, above, below = pk.mindist_parts(a, b, c=8, n_a=6, n_b=6)
    assert abs(d - 1.560325) < 1e-5
    assert abs(above - 1.103316) < 1e-5
    assert abs(below - 1.103316) < 1e-5


def test_hash_substitutes_furthest_symbol():
    # test.lua:168-187: mindist(x, "####") == mindist(x, furthest word)
    c = 4
    x = pk.parse("ABCD", c)
    hash4 = pk.parse("####", c)
    furthest = pk.parse("DDAA", c)
    assert pk.mindist(x, hash4, c=c) == pytest.approx(pk.mindist(x, furthest, c=c))
    # symmetric under operand flip
    assert pk.mindist(hash4, x, c=c) == pytest.approx(pk.mindist(x, hash4, c=c))


def test_ccccc_hash_above_only():
    c = 5
    x = pk.parse("CCCCC", c)
    h = pk.parse("#####", c)
    d, above, below = pk.mindist_parts(x, h, c=c)
    d2, _, _ = pk.mindist_parts(x, pk.parse("AAAAA", c), c=c)
    assert d == pytest.approx(d2)
    assert above == pytest.approx(d)
    assert below == 0.0


def test_mindist_wildcard_n_and_incompatibility():
    c = 8
    a = pk.encode_indices([10.3, 7, 1, -5, -5, 7.2], 2, c)  # n=6
    b = pk.parse("FC", c)  # parsed word: n=0 wildcard
    # wildcard adopts n=6 -> same as mindist with itself at n=6
    assert pk.mindist(a, b, c=c, n_a=6, n_b=0) == pytest.approx(0.0)
    # differing non-zero n -> incompatible
    assert pk.mindist_parts(a, a, c=c, n_a=6, n_b=12) is None
    # differing w -> incompatible
    assert pk.mindist_parts(pk.parse("AB", 4), pk.parse("ABC", 4), c=4) is None


def test_invalid_argument_table():
    """The reference's invalid-argument error table (lua/test.lua:67-117),
    row by row, for every case that maps to this API surface. Lua-only
    rows (wrong arg counts / wrong Lua types / method-vs-field calls)
    have no Python analogue and are covered by TypeError naturally."""
    from symtseries_spark.constants import validate_params

    # window.new out-of-bounds parameters (test.lua:73-78)
    for n, w, c in [
        (1, 3, 3),      # n too small
        (9, 1, 3),      # w too small
        (9, 3, 1),      # c below MIN_CARDINALITY
        (9, 3, 17),     # c above MAX_CARDINALITY
        (5000, 5, 5),   # n above MAX_WINDOW
        (10, 3, 3),     # n not divisible by w
    ]:
        with pytest.raises(ValueError):
            validate_params(n, w, c)

    # word.new out-of-bounds parameters (test.lua:85-94)
    for word, c in [
        ("", 5),         # empty word
        ("AAABF", 5),    # 'F' is index 5, outside cardinality 5
        ("aaabc", 5),    # lowercase letters invalid
        ("AABBC", 1),    # cardinality below domain
        ("AABBC", 17),   # cardinality above domain
    ]:
        with pytest.raises(ValueError):
            pk.parse(word, c)

    # from-array out-of-bounds (test.lua:91-94): w must divide n, domains
    data_n = 6
    with pytest.raises(ValueError):
        pk.encode([1.0] * data_n, 4, 5)   # 4 does not divide 6
    with pytest.raises(ValueError):
        pk.encode([1.0] * data_n, 3, 1)   # c below domain
    with pytest.raises(ValueError):
        pk.encode([1.0] * data_n, 3, 17)  # c above domain

    # mindist incompatibility -> None (the NaN analogue; src/symtseries.c:591-609)
    a6 = pk.parse("FC", 8)
    assert pk.mindist_parts(a6, pk.parse("FCA", 8), c=8) is None  # w mismatch
    assert pk.mindist_parts(a6, a6, c=8, n_a=6, n_b=12) is None   # n conflict


def test_nan_word_equality_semantics():
    c = 5
    e_hash_a = pk.encode_indices([INF, INF, 5, NAN, NAN, NAN, -INF, -INF, -5], 3, c)
    eca = pk.parse("ECA", c)
    assert not pk.words_equal(e_hash_a, eca)
    assert pk.mindist(e_hash_a, eca, c=c, n_a=9) > 0
    e_hash = pk.encode_indices([NAN, INF, NAN], 3, c)
    assert pk.format_word(e_hash, c) == "#E#"
    assert pk.words_equal(e_hash, pk.parse("#E#", c))
    assert pk.mindist(e_hash, pk.parse("#E#", c), c=c, n_a=3) == 0.0


def test_sliding_window_replay():
    # test.lua:21-65 scenario: n=4, w=2, c=4
    win = pk.SlidingWindow(4, 2, 4)
    assert win.append(23.0) == "#C"
    for v in (1.0, 2.0, 3.0):
        win.append(v)
    assert win.append(10.1) == "AD"  # 23 evicted; equals batch [1,2,3,10.1]
    assert win.clear() == "##"
    assert win.append_array([23.0]) == "#C"


def test_sliding_equals_batch_metamorphic():
    # symtseries.c:816-850: feeding one-by-one == batch encode of last n
    import random

    rng = random.Random(42)
    series = [rng.uniform(-10, 10) for _ in range(100)]
    for c in (2, 4, 7, 16):
        for w in (2, 4, 8):
            n = 16
            win = pk.SlidingWindow(n, w, c)
            last = None
            for v in series:
                last = win.append(v)
            assert last == pk.encode(series[-n:], w, c)
            # bulk add longer than n keeps last n (symtseries.c:506-511)
            win2 = pk.SlidingWindow(n, w, c)
            assert win2.append_array(series) == last


def test_param_validation():
    with pytest.raises(ValueError):
        pk.encode([1.0, 2.0, 3.0], 2, 8)  # w does not divide n
    with pytest.raises(ValueError):
        pk.encode([1.0, 2.0], 2, 17)  # c too large
    with pytest.raises(ValueError):
        pk.encode([1.0, 2.0], 2, 1)  # c too small
    with pytest.raises(ValueError):
        pk.parse("A", 4)  # length-1 string
    with pytest.raises(ValueError):
        pk.parse("AZ", 4)  # letter beyond cardinality
    with pytest.raises(ValueError):
        pk.parse("ab", 4)  # lowercase


def test_lut_consistency_with_breakpoints():
    # dist(i, j) for |i-j|>1 approximates breaks[max-1]-breaks[min]
    # (3-decimal rounding of exact quantiles vs truncation of breaks can
    # differ by ~2e-3)
    for c in range(2, 17):
        lut = MINDIST_LUT[c]
        brk = BREAKPOINTS[c]
        for i in range(c):
            for j in range(c):
                d = lut[i * c + j]
                assert d == lut[j * c + i]  # symmetric
                if abs(i - j) <= 1:
                    assert d == 0.0
                else:
                    assert abs(d - (brk[max(i, j) - 1] - brk[min(i, j)])) < 3e-3


def test_version_string():
    """Reference parity L9: lua_sax.c:381-385 exposes sax.version();
    the package equivalent is symtseries_spark.__version__ — a
    non-empty dotted semver string, importable without a SparkSession."""
    import symtseries_spark

    v = symtseries_spark.__version__
    parts = v.split(".")
    assert len(parts) >= 2 and all(p.isdigit() for p in parts)
