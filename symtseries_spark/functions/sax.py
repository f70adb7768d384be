"""SAX kernels as pure PySpark Column expressions.

Everything here compiles to Catalyst expression trees over built-in
higher-order array functions (``transform`` / ``aggregate`` / ``filter`` /
``zip_with`` / ``slice``) — no Python UDFs, so the hot path stays inside
whole-stage codegen and scales with executors, not with the Python GIL.

Parameters ``w`` (word length) and ``c`` (cardinality) are plan-time
Python ints: the breakpoint and distance tables become literal arrays
that Catalyst constant-folds, exactly like the reference's compile-time
tables (/root/reference/src/symtseries.c:26-243).

Semantics contract: SURVEY.md Appendix A
(encode: src/symtseries.c:245-396,515-532; parse/format: :534-576;
mindist: :585-636). The scalar twin of every function lives in
:mod:`symtseries_spark.pykernel` and the two are property-tested equal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import (
    BREAKPOINTS,
    LETTERS,
    MINDIST_LUT,
    MISSING,
    STAT_EPS,
    validate_params,
)

_INF = float("inf")


def _let(value: Column, body) -> Column:
    """Bind ``value`` once and use it many times inside ``body``.

    Catalyst has no let-expression, and repeating an O(n) aggregate
    sub-expression per PAA frame would multiply work by w. Wrapping the
    value in a 1-element array and applying ``transform`` gives genuine
    single-evaluation binding semantics.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def is_finite(col: Column) -> Column:
    """True for non-NaN, non-±Inf values (C ``isfinite``). NULL-safe:
    NULL input yields NULL, which every filter below treats as not-finite."""
    return ~F.isnan(col) & (F.abs(col) != F.lit(_INF))


def _finite(arr: Column) -> Column:
    return F.filter(arr, lambda x: is_finite(x))


def _stats(arr: Column) -> Column:
    """STRUCT(mu, std) over the finite elements of ``arr`` — mean and
    *population* stddev, 0 when no finite values (src/symtseries.c:257-280).

    Two-pass form: mean first, then sum of squared deviations. This matches
    the numerical quality of the reference's Welford pass (its own property
    test equates them at 1e-2; src/symtseries.c:867-920).
    """

    def with_finite(fin: Column) -> Column:
        cnt = F.size(fin)
        total = F.aggregate(fin, F.lit(0.0), lambda acc, x: acc + x)
        mu = F.when(cnt > 0, total / cnt).otherwise(F.lit(0.0))

        def with_mu(m: Column) -> Column:
            ssd = F.aggregate(fin, F.lit(0.0), lambda acc, x: acc + (x - m) * (x - m))
            std = F.when(cnt > 0, F.sqrt(ssd / cnt)).otherwise(F.lit(0.0))
            return F.struct(m.alias("mu"), std.alias("std"))

        return _let(mu, with_mu)

    return _let(_finite(arr), with_finite)


def _breaks_lit(c: int) -> Column:
    return F.array(*[F.lit(b) for b in BREAKPOINTS[c]])


def _bucket(z: Column, c: int) -> Column:
    """Letter index of a z-scored value: #breakpoints <= z (strict
    ``value < break`` boundary rule, src/symtseries.c:245-254). ±Inf
    saturates to the extreme buckets naturally."""
    return F.size(F.filter(_breaks_lit(c), lambda b: b <= z))


def sax_letters(arr: Column, w: int, c: int) -> Column:
    """SAX-encode an ``array<double>`` column to an ``array<int>`` of
    letter indices (0 = 'A' = lowest bucket, c-1 = highest, c = missing).

    The array length must be a multiple of ``w`` (rows violating this
    yield NULL — the expression equivalent of the reference's NULL return,
    src/symtseries.c:515-521).
    """
    validate_params(w * 2, w, c)  # validates (w, c) domains; n checked per-row

    def encode_with(stats: Column) -> Column:
        mu, std = stats["mu"], stats["std"]
        f = F.floor(F.size(arr) / w).cast("int")  # frame size n/w

        def frame_letter(i: Column) -> Column:
            frame = F.slice(arr, i * f + 1, f)
            nonnan = F.filter(frame, lambda x: ~F.isnan(x))
            fcnt = F.size(nonnan)
            fsum = F.aggregate(nonnan, F.lit(0.0), lambda acc, x: acc + x)
            z = F.when(std < F.lit(STAT_EPS), F.lit(0.0)).otherwise(
                (fsum - fcnt * mu) / (fcnt * std)
            )
            return (
                F.when((fcnt == 0) | F.isnan(fsum), F.lit(c))  # '#'
                .when(fsum == F.lit(_INF), F.lit(c - 1))
                .when(fsum == F.lit(-_INF), F.lit(0))
                .otherwise(_bucket(z, c))
            )

        return F.transform(F.sequence(F.lit(0), F.lit(w - 1)), frame_letter)

    result = _let(_stats(arr), encode_with)
    valid = arr.isNotNull() & (F.size(arr) % w == 0) & (F.size(arr) > 0)
    return F.when(valid, result)


def _letters_lit(c: int) -> Column:
    return F.array(*[F.lit(ch) for ch in LETTERS[:c]], F.lit(MISSING))


def sax_format(indices: Column, c: int) -> Column:
    """Letter-index array -> canonical SAX string (src/symtseries.c:556-576).
    NULL in, NULL out (``concat_ws`` would otherwise turn NULL into '')."""
    letters = _letters_lit(c)
    return F.when(
        indices.isNotNull(),
        F.concat_ws("", F.transform(indices, lambda i: F.element_at(letters, i + 1))),
    )


def sax_encode(arr: Column, w: int, c: int) -> Column:
    """``array<double>`` -> SAX string; the flagship batch expression
    (reference ``sts_from_double_array`` + ``to_sax_string``)."""
    return _let(sax_letters(arr, w, c), lambda idx: sax_format(idx, c))


def sax_parse(word: Column, c: int, *, strict: bool = False) -> Column:
    """SAX string -> ``array<int>`` letter indices.

    Default (lenient): invalid letters for the cardinality yield NULL
    ELEMENTS — useful for exploratory parsing where per-letter validity
    matters. ``strict=True`` mirrors the reference's hard reject
    (src/symtseries.c:534-554 returns NULL for ANY out-of-range letter):
    the whole word parses to NULL if any letter is invalid, so
    downstream distance/equality expressions see the same all-or-nothing
    contract the C API gives. Pair with :func:`sax_parse_valid` to
    separate "invalid" from "missing" in data columns. The cardinality
    domain (2..16, lua/test.lua:89-90) is checked at PLAN time — a bad
    ``c`` is a query bug, not a data condition.

    Empty or NULL words yield NULL — the reference rejects w == 0 words
    (src/symtseries.c:539-542); without the guard ``sequence(1, 0)``
    would count DOWN and fabricate a 2-element array."""
    from .. import constants

    if not constants.MIN_CARDINALITY <= c <= constants.MAX_CARDINALITY:
        raise ValueError(f"cardinality must be in [2, 16], got {c}")
    chars = F.transform(F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1)))
    parsed = F.transform(
        chars,
        lambda ch: F.when(ch == MISSING, F.lit(c)).otherwise(
            F.when(
                (F.ascii(ch) >= 65) & (F.ascii(ch) < 65 + c), F.ascii(ch) - 65
            )
        ),
    )
    lenient = F.when(F.length(word) > 0, parsed)
    if not strict:
        return lenient
    return F.when(~F.exists(parsed, lambda x: x.isNull()), lenient)


def sax_parse_valid(word: Column, c: int) -> Column:
    """Boolean validity of a SAX string column under the reference's
    parse rules (src/symtseries.c:534-554): non-NULL, non-empty, every
    letter either ``#`` or in the first ``c`` letters. NULL word ->
    NULL (missing, not invalid)."""
    from .. import constants

    if not constants.MIN_CARDINALITY <= c <= constants.MAX_CARDINALITY:
        raise ValueError(f"cardinality must be in [2, 16], got {c}")
    chars = F.transform(F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1)))
    ok = F.forall(
        chars,
        lambda ch: (ch == MISSING)
        | ((F.ascii(ch) >= 65) & (F.ascii(ch) < 65 + c)),
    )
    return F.when(word.isNotNull(), (F.length(word) > 0) & ok)


def sax_parse_literal(pattern: str, c: int) -> Column:
    """Parse a LITERAL pattern eagerly, raising ``ValueError`` at plan
    time on any invalid letter / cardinality / empty word — the Spark
    twin of the reference's ``sax.word.new(str, c)`` argument errors
    (lua/test.lua:78-90). Returns the letter-index array as a literal
    column, so pattern-match queries fail fast instead of silently
    matching nothing."""
    from ..pykernel import parse

    return F.array(*[F.lit(i) for i in parse(pattern, c)])


def _resolve_n(
    n_a: Column | int | None, n_b: Column | int | None, w: Column
) -> tuple[Column, Column]:
    """(effective n, per-row conflict flag) under the reference's
    wildcard rule (src/symtseries.c:594-601): n == 0 (or NULL) adopts
    the other side's n; both wildcard -> n = w (compression 1); two
    conflicting nonzero n values -> incompatible (NaN there, NULL here).
    """
    def to_col(x: Column | int | None) -> Column | None:
        return F.lit(x) if isinstance(x, int) else x

    na, nb = to_col(n_a), to_col(n_b)
    if na is None and nb is None:
        return w, F.lit(False)
    na0 = F.coalesce(na.cast("long"), F.lit(0)) if na is not None else F.lit(0)
    nb0 = F.coalesce(nb.cast("long"), F.lit(0)) if nb is not None else F.lit(0)
    conflict = (na0 > 0) & (nb0 > 0) & (na0 != nb0)
    n_eff = F.when(na0 > 0, na0).otherwise(F.when(nb0 > 0, nb0).otherwise(w))
    return n_eff, conflict


def sax_mindist_parts(
    a: Column,
    b: Column,
    *,
    c: int,
    n: Column | int | None = None,
    n_b: Column | int | None = None,
) -> Column:
    """MINDIST between two equal-length letter-index arrays of cardinality
    ``c`` -> STRUCT(dist, above, below).

    ``n`` / ``n_b`` are the number of raw values each word summarizes
    (the compression scale √(n/w)), with the reference's wildcard rule
    (src/symtseries.c:591-601): 0 (or NULL) adopts the other side's n;
    both 0 -> compression 1 (n = w). Per-row incompatibility gates
    mirror the reference's NaN returns as NULL: length (w) mismatch, and
    — when both ``n`` and ``n_b`` are supplied — conflicting nonzero n
    values. ``above`` accumulates positions where a's bucket is
    higher-valued than b's.

    **c-compatibility is plan-time, by construction**: the LUT for ``c``
    is baked into the expression, and both operands are parsed/encoded
    against that same ``c`` — two words of different cardinality can
    only meet in one call through caller error. Coarsen to a common
    cardinality first (:func:`sax_coarsen`); there is no per-row c gate
    because a Column cannot carry a conflicting LUT (the reference's
    per-object ``a->c != b->c`` NaN gate, src/symtseries.c:591, has no
    row-level analogue here).
    """
    lut = F.array(*[F.lit(d) for d in MINDIST_LUT[c]])

    def contrib(la: Column, lb: Column) -> Column:
        la2 = F.when(
            la == c, F.when(lb < F.lit(c - 1) - lb, F.lit(c - 1)).otherwise(F.lit(0))
        ).otherwise(la)
        lb2 = F.when(
            lb == c, F.when(la < F.lit(c - 1) - la, F.lit(c - 1)).otherwise(F.lit(0))
        ).otherwise(lb)

        def with_pair(pair: Column) -> Column:
            d = F.element_at(lut, pair["x"] * c + pair["y"] + 1)
            return F.struct(
                (d * d).alias("d2"), (pair["x"] > pair["y"]).alias("is_above")
            )

        return F.when(
            la == lb, F.struct(F.lit(0.0).alias("d2"), F.lit(False).alias("is_above"))
        ).otherwise(_let(F.struct(la2.alias("x"), lb2.alias("y")), with_pair))

    pairs = F.zip_with(a, b, contrib)
    sums = F.aggregate(
        pairs,
        F.struct(F.lit(0.0).alias("ab"), F.lit(0.0).alias("be")),
        lambda acc, p: F.struct(
            (acc["ab"] + F.when(p["is_above"], p["d2"]).otherwise(0.0)).alias("ab"),
            (acc["be"] + F.when(~p["is_above"], p["d2"]).otherwise(0.0)).alias("be"),
        ),
    )

    w = F.size(a)
    n_eff, conflict = _resolve_n(n, n_b, w)

    def finish(s: Column) -> Column:
        comp = F.sqrt(n_eff.cast("double") / w)
        return F.struct(
            (comp * F.sqrt(s["ab"] + s["be"])).alias("dist"),
            (comp * F.sqrt(s["ab"])).alias("above"),
            (comp * F.sqrt(s["be"])).alias("below"),
        )

    compatible = (
        a.isNotNull() & b.isNotNull() & (F.size(a) == F.size(b)) & ~conflict
    )
    return F.when(compatible, _let(sums, finish))


def sax_znorm(arr: Column) -> Column:
    """z-normalize an ``array<double>`` with the kernel's stats rules
    (finite-only mean, population sigma — src/symtseries.c:257-280). A
    flat window (sigma < STAT_EPS) normalizes to all zeros, matching the
    encoder's z = 0 rule. Non-finite elements pass through unchanged and
    are skipped by :func:`sax_zeuclidean`."""

    def with_stats(st: Column) -> Column:
        mu, std = st["mu"], st["std"]
        return F.transform(
            arr,
            lambda x: F.when(~is_finite(x), x)
            .when(std < F.lit(STAT_EPS), F.lit(0.0))
            .otherwise((x - mu) / std),
        )

    return _let(_stats(arr), with_stats)


def sax_zeuclidean(za: Column, zb: Column, n: int | None = None) -> Column:
    """Exact Euclidean distance between two z-normalized arrays — the
    refine step of the reference's prune-then-refine story
    (/root/reference/README.md:29-34: MINDIST lower-bounds exactly this
    quantity, include/symtseries.h:5-7). Positions where either side is
    non-finite contribute 0 (the exact-distance analogue of '#' frames);
    NULL or length-mismatched inputs yield NULL.

    ``n`` (r13): callers whose windows have a KNOWN fixed length may
    pass it to unroll the per-pair sum into a flat n-term expression —
    ``zip_with``/``aggregate`` are interpreted per element while the
    flat form whole-stage-codegens (measured ~30% off the 14M-pair
    refine fold at n=16; bit-identical output — same guarded term,
    same left-to-right addition order as the fold). Arrays whose size
    is not ``n`` fall back to the generic form, so the value contract
    is unchanged; keep ``n`` well under the repo's documented
    ~1000-term flat-expression cliff."""
    d2 = F.zip_with(
        za,
        zb,
        lambda x, y: F.when(
            is_finite(x) & is_finite(y), (x - y) * (x - y)
        ).otherwise(F.lit(0.0)),
    )
    ok = za.isNotNull() & zb.isNotNull() & (F.size(za) == F.size(zb))
    hof = F.when(ok, F.sqrt(F.aggregate(d2, F.lit(0.0), lambda a, v: a + v)))
    if n is None:
        return hof

    def term(i: int) -> Column:
        x, y = F.element_at(za, i), F.element_at(zb, i)
        return F.when(
            is_finite(x) & is_finite(y), (x - y) * (x - y)
        ).otherwise(F.lit(0.0))

    flat = term(1)
    for i in range(2, n + 1):
        flat = flat + term(i)
    return F.when(
        ok & (F.size(za) == F.lit(int(n))), F.sqrt(flat)
    ).otherwise(hof)


def sax_mindist(
    a: Column,
    b: Column,
    *,
    c: int,
    n: Column | int | None = None,
    n_b: Column | int | None = None,
) -> Column:
    """Scalar MINDIST (the reference's ``sts_mindist`` wrapper)."""
    return sax_mindist_parts(a, b, c=c, n=n, n_b=n_b)["dist"]


def sax_coarsen(word: Column, c: int, c2: int) -> Column:
    """Reduce a SAX word's cardinality from ``c`` to ``c2`` (both powers
    of two, ``c2 | c``) — the iSAX idea: the reference's breakpoint
    tables nest exactly for power-of-two cardinalities (verified against
    src/symtseries.c:26-48), so encoding at ``c`` then coarsening equals
    encoding at ``c2`` directly. Letter ℓ maps to ℓ // (c/c2); '#' is
    preserved. One ``translate`` call — a single codegen'd string op —
    which makes coarse words a free prefix-tree bucket key for indexed
    similarity search (prune on coarse equality, refine with mindist).
    """
    if c2 < 2 or c % c2 or (c & (c - 1)) or (c2 & (c2 - 1)):
        raise ValueError("cardinalities must be powers of two with c2 | c")
    k = c // c2
    src = LETTERS[:c]
    dst = "".join(LETTERS[i // k] for i in range(c))
    return F.translate(word, src, dst)


# ---------------------------------------------------------------------------
# codegen-path variants
#
# The array/HOF kernels above are the general form, but Spark evaluates
# higher-order functions interpreted (outside whole-stage codegen), which
# costs ~µs per call — too slow for per-row sliding windows or per-pair
# all-pairs joins at scale. The variants below unroll the fixed plan-time
# (w, c) into flat scalar expressions (substring/ascii/element_at on
# literal arrays/CASE), which codegen compiles to tight JVM loops.


def _contrib_const(la: int, lb: int, c: int) -> tuple[float, bool]:
    """(d2, is_above) for a known symbol pair (plan-time)."""
    if la == lb:
        return 0.0, False
    la2, lb2 = la, lb
    if la == c:
        la2 = c - 1 if lb < c - 1 - lb else 0
    elif lb == c:
        lb2 = c - 1 if la < c - 1 - la else 0
    d = MINDIST_LUT[c][la2 * c + lb2]
    return d * d, la2 > lb2


def sax_mindist_to_literal(
    word: Column, pattern_indices: list[int], *, c: int, n: Column | int | None = None
) -> Column:
    """MINDIST from a SAX-string column to a *literal* pattern ->
    STRUCT(dist, above, below). Every position's contribution is
    precomputed per possible letter at plan time, so the expression is a
    flat sum of CASE lookups — fully inside whole-stage codegen."""
    w = len(pattern_indices)
    alphabet = [*LETTERS[:c], MISSING]
    total_terms: list[Column] = []
    above_terms: list[Column] = []
    for i, lb in enumerate(pattern_indices, start=1):
        ch = F.substring(word, i, 1)
        t: Column | None = None
        a: Column | None = None
        for la_pos, la_ch in enumerate(alphabet):
            la = c if la_ch == MISSING else la_pos
            d2, is_above = _contrib_const(la, lb, c)
            if d2:
                t = (F.when(ch == la_ch, d2) if t is None else t.when(ch == la_ch, d2))
                if is_above:
                    a = (F.when(ch == la_ch, d2) if a is None else a.when(ch == la_ch, d2))
        if t is not None:
            total_terms.append(t.otherwise(0.0))
        if a is not None:
            above_terms.append(a.otherwise(0.0))

    total = sum(total_terms, F.lit(0.0))
    above = sum(above_terms, F.lit(0.0))
    # the literal pattern side is n = 0 (wildcard) by definition, so the
    # row's n wins; n = 0/NULL rows fall back to compression 1 (n = w)
    n_eff, _ = _resolve_n(n, None, F.lit(w))
    comp = F.sqrt(n_eff.cast("double") / F.lit(w))
    return F.struct(
        (comp * F.sqrt(total)).alias("dist"),
        (comp * F.sqrt(above)).alias("above"),
        (comp * F.sqrt(total - above)).alias("below"),
    )


def sax_word_mindist(
    word_a: Column,
    word_b: Column,
    *,
    w: int,
    c: int,
    n: Column | int | None = None,
    n_b: Column | int | None = None,
) -> Column:
    """MINDIST between two SAX-string columns of known (w, c) ->
    STRUCT(dist, above, below), unrolled per position with literal-array
    lookups — codegen-friendly for all-pairs joins.

    Letter chars map to letter indices via one CASE each, then a SHARED
    pair index drives two ``element_at`` lookups into plan-time
    (c+1)²-entry literal LUTs (src/symtseries.c:585-636). The
    '#'-substitution rule and the above/below orientation are baked
    INTO the LUT values at plan time (via :func:`_contrib_const`), not
    unrolled as per-position CASE logic — ~3x less generated code per
    position, which keeps janino compile + JIT warm-up of the
    whole-stage method cheap and stable (the unrolled form made the
    w=4/c=8 all-pairs plan's first execution swing by multiple seconds
    on cold code caches). ``n``/``n_b`` follow the same wildcard +
    per-row conflict rules as :func:`sax_mindist_parts` (conflicting
    nonzero n values -> NULL).
    """
    size = c + 1  # letter index c encodes '#'
    d2_flat: list[float] = []
    ab_flat: list[float] = []
    for la_i in range(size):
        for lb_i in range(size):
            d2v, is_above = _contrib_const(la_i, lb_i, c)
            d2_flat.append(d2v)
            ab_flat.append(d2v if is_above else 0.0)
    lut_d2 = F.array(*[F.lit(v) for v in d2_flat])
    lut_ab = F.array(*[F.lit(v) for v in ab_flat])

    def letter_idx(ch: Column) -> Column:
        # '#' -> c, letters -> 0..c-1 (ascii('A') = 65)
        return F.when(ch == MISSING, F.lit(c)).otherwise(F.ascii(ch) - 65)

    total = F.lit(0.0)
    above = F.lit(0.0)
    for i in range(1, w + 1):
        idx = (
            letter_idx(F.substring(word_a, i, 1)) * size
            + letter_idx(F.substring(word_b, i, 1))
            + 1
        )
        total = total + F.element_at(lut_d2, idx)
        above = above + F.element_at(lut_ab, idx)

    n_eff, conflict = _resolve_n(n, n_b, F.lit(w))
    comp = F.sqrt(n_eff.cast("double") / F.lit(w))
    return F.when(
        ~conflict,
        F.struct(
            (comp * F.sqrt(total)).alias("dist"),
            (comp * F.sqrt(above)).alias("above"),
            (comp * F.sqrt(total - above)).alias("below"),
        ),
    )
