"""Pure-Python SAX kernels.

These are the *semantic reference* for the Spark expression kernels in
:mod:`symtseries_spark.functions.sax`: small, obviously-correct scalar
implementations used by

* unit tests (golden vectors from the reference's own test corpus),
* the Structured Streaming state handler (per-key ring buffers are tiny,
  n <= 4096, so scalar Python inside an Arrow-batched pandas UDF is fine),
* driver-side utilities (validating literal query patterns).

Semantics contract: SURVEY.md Appendix A, derived from
/root/reference/src/symtseries.c (encode :245-396,515-532; mindist
:585-636; window :301-351,416-513).
"""

from __future__ import annotations

import math
from collections import deque
from collections.abc import Iterable, Sequence

from .constants import (
    BREAKPOINTS,
    MINDIST_LUT,
    MISSING,
    STAT_EPS,
    index_of,
    letter_of,
    validate_params,
)


def mu_std(values: Iterable[float]) -> tuple[float, float]:
    """Mean and *population* std over the finite values only
    (non-finite values are ignored entirely; src/symtseries.c:257-280)."""
    finite = [v for v in values if math.isfinite(v)]
    if not finite:
        return 0.0, 0.0
    n = len(finite)
    mu = math.fsum(finite) / n
    var = math.fsum((v - mu) ** 2 for v in finite) / n
    return mu, math.sqrt(var)


def bucket(z: float, c: int) -> int:
    """Letter index for a z-scored value: the number of breakpoints <= z
    (strict ``value < break`` boundary semantics; src/symtseries.c:245-254).
    NaN maps to the missing index ``c``."""
    if math.isnan(z):
        return c
    return sum(1 for b in BREAKPOINTS[c] if b <= z)


def encode_indices(values: Sequence[float], w: int, c: int) -> list[int]:
    """SAX-encode a series to letter indices (0..c-1, c = missing).

    PAA frame mean skips NaN; all-NaN frame or Inf+(-Inf) -> missing;
    +/-Inf frame sums bypass normalization; sigma < STAT_EPS flattens
    every finite frame to z=0 (src/symtseries.c:358-396).
    """
    n = len(values)
    validate_params(n, w, c)
    mu, std = mu_std(values)
    f = n // w
    out = []
    for i in range(w):
        frame = values[i * f : (i + 1) * f]
        nonnan = [v for v in frame if not math.isnan(v)]
        # plain sum, not fsum: Inf + (-Inf) must yield NaN (-> '#'),
        # matching the reference's naive accumulation
        s = sum(nonnan)
        if not nonnan or math.isnan(s):
            out.append(c)
            continue
        if math.isinf(s):
            z = s
        elif std < STAT_EPS:
            z = 0.0
        else:
            z = (s - len(nonnan) * mu) / (len(nonnan) * std)
        out.append(bucket(z, c))
    return out


def encode(values: Sequence[float], w: int, c: int) -> str:
    """SAX-encode a series to its canonical letter-string form."""
    return "".join(letter_of(i, c) for i in encode_indices(values, w, c))


def parse(word: str, c: int) -> list[int]:
    """Parse a SAX string to letter indices, validating against ``c``
    (src/symtseries.c:534-554; length > 1 per lua/lua_sax.c:251;
    cardinality domain per lua/test.lua:89-90)."""
    from .constants import MAX_CARDINALITY, MIN_CARDINALITY

    if not MIN_CARDINALITY <= c <= MAX_CARDINALITY:
        raise ValueError(f"cardinality must be in [2, 16], got {c}")
    if len(word) < 2:
        raise ValueError("SAX strings must have length > 1")
    return [index_of(ch, c) for ch in word]


def format_word(indices: Sequence[int], c: int) -> str:
    """Letter-index list -> SAX string (inverse of :func:`parse_word`).

    ``c`` is required even though :func:`encode` returns a string
    directly: the missing-value sentinel is the INDEX ``c`` itself
    (rendered ``#``), so a bare index list is ambiguous — ``[4, 2]``
    at c=4 is ``#``+letter, at c=8 two letters. The two-layer API is
    deliberate: ``encode``/``parse_word`` speak strings (self-
    describing), ``encode_indices``/``format_word`` speak raw indices
    and always carry ``c`` alongside."""
    return "".join(letter_of(i, c) for i in indices)


def mindist_parts(
    a: Sequence[int],
    b: Sequence[int],
    *,
    c: int,
    n_a: int = 0,
    n_b: int = 0,
) -> tuple[float, float, float] | None:
    """MINDIST between two letter-index words of equal (w, c).

    Returns ``(distance, above, below)`` — ``above`` accumulates positions
    where a's bucket is *higher*-valued than b's. ``n = 0`` means "adopt the
    other word's n"; both 0 means compression ratio 1 (n = w). Returns None
    on incompatible operands (the reference returns NaN;
    src/symtseries.c:585-636).
    """
    if len(a) != len(b):
        return None
    if n_a != n_b and n_a != 0 and n_b != 0:
        return None
    w = len(a)
    n = n_a if n_a > 0 else n_b
    if n == 0:
        n = w
    lut = MINDIST_LUT[c]
    above = below = 0.0
    for la, lb in zip(a, b):
        if la == lb:
            continue
        la2, lb2 = la, lb
        if la == c:  # missing: substitute the bucket furthest from lb
            la2 = c - 1 if lb < c - 1 - lb else 0
        elif lb == c:
            lb2 = c - 1 if la < c - 1 - la else 0
        d = lut[la2 * c + lb2]
        d2 = d * d
        if la2 > lb2:
            above += d2
        else:
            below += d2
    comp = math.sqrt(n / w)
    return (
        comp * math.sqrt(above + below),
        comp * math.sqrt(above),
        comp * math.sqrt(below),
    )


def mindist(
    a: Sequence[int],
    b: Sequence[int],
    *,
    c: int,
    n_a: int = 0,
    n_b: int = 0,
) -> float | None:
    parts = mindist_parts(a, b, c=c, n_a=n_a, n_b=n_b)
    return parts[0] if parts is not None else None


def coarsen(word: str, c: int, c2: int) -> str:
    """iSAX cardinality reduction (see functions.sax.sax_coarsen):
    power-of-two breakpoints nest, so this equals re-encoding at c2."""
    if c2 < 2 or c % c2 or (c & (c - 1)) or (c2 & (c2 - 1)):
        raise ValueError("cardinalities must be powers of two with c2 | c")
    k = c // c2
    return "".join(
        ch if ch == MISSING else chr(ord("A") + (ord(ch) - ord("A")) // k)
        for ch in word
    )


def words_equal(a: Sequence[int], b: Sequence[int]) -> bool:
    """Structural equality on (w, symbols); '#' matches only '#'
    (n_values deliberately not compared; src/symtseries.c:638-645)."""
    return len(a) == len(b) and all(x == y for x, y in zip(a, b))


class SlidingWindow:
    """Streaming sliding-window SAX encoder: the reference's ``sts_window``
    (src/symtseries.c:301-351,416-513) re-expressed with stats recomputed
    per append over the <=4096-value buffer. The reference maintains online
    Welford stats for speed but its own property test asserts batch
    recompute equivalence (src/symtseries.c:867-920), so recompute is the
    simpler exact choice here.
    """

    def __init__(self, n: int, w: int, c: int):
        validate_params(n, w, c)
        self.n, self.w, self.c = n, w, c
        self.buf: deque[float] = deque([math.nan] * n, maxlen=n)

    def append(self, value: float) -> str:
        """Append one value (evicting the oldest) and return the current
        word — emitted on *every* append, '#'-padded while partially full."""
        self.buf.append(value)
        return self.word()

    def append_array(self, values: Sequence[float]) -> str:
        """Bulk append; only the last n values take effect
        (src/symtseries.c:494-513)."""
        for v in values[-self.n :]:
            self.buf.append(v)
        return self.word()

    def clear(self) -> str:
        self.buf = deque([math.nan] * self.n, maxlen=self.n)
        return self.word()

    def word(self) -> str:
        return encode(list(self.buf), self.w, self.c)

    def state(self) -> list[float]:
        return list(self.buf)

    @classmethod
    def from_state(cls, n: int, w: int, c: int, state: Sequence[float]) -> "SlidingWindow":
        win = cls(n, w, c)
        for v in state:
            win.buf.append(v)
        return win


__all__ = [
    "MISSING",
    "SlidingWindow",
    "bucket",
    "encode",
    "encode_indices",
    "format_word",
    "mindist",
    "mindist_parts",
    "mu_std",
    "parse",
    "coarsen",
    "words_equal",
]
