"""Text-analysis kernels for large-scale training-data pipelines.

All functions return pure PySpark Column expressions (JVM-side, inside
whole-stage codegen) — the same design rule as :mod:`.sax`. Every kernel
has an exact SQL mirror in :mod:`symtseries_spark.oracle_text` used by
the driver's DuckDB correctness gate, so the arithmetic here is chosen to
be engine-independent:

* ``doc_hash60``: first 15 hex digits of md5 → 60-bit non-negative int.
  md5 is bit-identical everywhere; 15 hex digits fit a signed int64.
* modular arithmetic stays under 2^63 (see :data:`HASH_PRIME`).

Scale notes: everything is per-row projection (no shuffle); the
aggregating consumers (dedup/minhash) group on doc_id with map-side
combine. At 100 TB these expressions run inside the parquet scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1 (Mersenne): keeps a*h + b < 2^62 for a,h < 2^31 — overflow-free
# in int64 on every engine.
HASH_PRIME = 2_147_483_647

# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space
# punctuation — a deterministic stand-in for a real BPE vocab's pre-split.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n]"

# Marker stopwords per language for the n-gram/stopword lang-ID heuristic.
# Deliberately tiny and deterministic; ties broken by list order.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "les", "une", "et", "est", "dans"],
    "es": ["el", "los", "una", "y", "es", "que"],
}

EN_STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "for"]


def tokens(text: Column) -> Column:
    """Lowercased alphanumeric tokens (``array<string>``); empty strings
    from leading/trailing separators are dropped."""
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != ""
    )


def token_count(text: Column) -> Column:
    """Whitespace-ish token count (size of :func:`tokens`)."""
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Deterministic BPE-ish token count: matches of :data:`BPE_REGEX`
    over the lowercased text."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_REGEX), 0)).cast(
        "long"
    )


def shingles(text: Column, k: int) -> Column:
    """Distinct word ``k``-shingles (space-joined token k-grams).
    Documents with fewer than ``k`` tokens yield an empty array."""

    def from_tokens(toks: Column) -> Column:
        m = F.size(toks) - k
        grams = F.transform(
            F.sequence(F.lit(0), m),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
        return F.when(m >= 0, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    # bind tokens once (see functions/sax.py _let rationale)
    return F.element_at(F.transform(F.array(tokens(text)), from_tokens), 1)


def doc_hash60(s: Column) -> Column:
    """Engine-independent 60-bit hash: ``int(md5(s)[:15], 16)``.
    DuckDB mirror: ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash_mod_prime(s: Column) -> Column:
    """:func:`doc_hash60` reduced into the MinHash permutation field."""
    return doc_hash60(s) % HASH_PRIME


def normalized_text(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse all whitespace
    runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def _fingerprint_build(toks: Column) -> Column:
    mod = 1_000_000_007
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + hash_mod_prime(t)) % mod,
    )


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    the per-token 60-bit hashes, ``acc = (acc * 31 + h % P) % 1e9+7``.
    Two documents get equal fingerprints iff their token sequences match
    (mod collisions) — robust to whitespace/punctuation differences."""
    return _fingerprint_build(tokens(text))


def kgram_hashes(text: Column, k: int) -> Column:
    """POSITIONAL word k-gram hashes (``array<long>``, one per k-gram in
    sequence order, duplicates kept) — the rolling-hash sequence that
    winnowing selects from. Unlike :func:`shingles` this keeps order and
    multiplicity. Documents with fewer than ``k`` tokens yield an empty
    array."""

    def from_tokens(toks: Column) -> Column:
        m = F.size(toks) - k
        grams = F.transform(
            F.sequence(F.lit(0), m),
            lambda i: hash_mod_prime(F.array_join(F.slice(toks, i + 1, k), " ")),
        )
        return F.when(m >= 0, grams).otherwise(F.array().cast("array<long>"))

    return F.element_at(F.transform(F.array(tokens(text)), from_tokens), 1)


def winnow_fingerprints(text: Column, k: int, w: int) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 —
    the MOSS algorithm): slide a ``w``-wide window over the positional
    k-gram hash sequence, select the MINIMUM hash of each window, return
    the sorted distinct selections (``array<long>``).

    Guarantee: any shared token run of length >= ``k + w - 1`` between
    two documents contributes at least one IDENTICAL fingerprint to both
    — substring-level duplicate detection, where shingle Jaccard only
    sees whole-document overlap. Density is ~2/(w+1) of the k-grams, so
    the fingerprint set is a bounded fraction of the document size.

    Per-row array expression (scan-stage, O(len*w) JVM work, no
    shuffle). Documents with fewer than ``k + w - 1`` tokens yield an
    empty array. DuckDB mirror: oracle_text.winnow_expr."""

    def select_mins(h: Column) -> Column:
        n_win = F.size(h) - w + 1
        mins = F.transform(
            F.sequence(F.lit(1), n_win),
            lambda p: F.array_min(F.slice(h, p, w)),
        )
        # sequence(1, n) counts DOWN when n < 1 — guard short docs
        return F.when(n_win >= 1, F.array_sort(F.array_distinct(mins))).otherwise(
            F.array().cast("array<long>")
        )

    return F.element_at(
        F.transform(F.array(kgram_hashes(text, k)), select_mins), 1
    )


def _ratio(num: Column, den: Column) -> Column:
    return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))


def quality_metrics(text: Column) -> Column:
    """STRUCT of deterministic quality signals:

    ``n_chars, n_tokens, avg_token_len, stopword_ratio, digit_ratio,
    space_ratio, quality_score`` — the standard cheap filters a pretraining
    pipeline runs before anything expensive. ``quality_score`` is a fixed
    0..1 combination: high stopword presence and mid-length tokens score
    high; digit-heavy or token-free rows score low."""
    return F.element_at(
        F.transform(F.array(tokens(text)), lambda t: _quality_build(text, t)), 1
    )


def _quality_build(text: Column, toks: Column) -> Column:
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    avg_len = _ratio(tok_chars, n_tokens)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stop_ratio = _ratio(n_stop, n_tokens)
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    digit_ratio = _ratio(n_digit, n_chars)
    n_space = F.length(F.regexp_replace(text, "[^ ]", ""))
    space_ratio = _ratio(n_space, n_chars)
    score = (
        F.least(stop_ratio * 4, F.lit(1.0)) * 0.4
        + F.when((avg_len >= 3) & (avg_len <= 10), 0.4).otherwise(0.0)
        + F.when(digit_ratio < 0.3, 0.2).otherwise(0.0)
    )
    return F.struct(
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(space_ratio, 4).alias("space_ratio"),
        F.round(F.when(n_tokens > 0, score).otherwise(0.0), 4).alias(
            "quality_score"
        ),
    )


def lang_id(text: Column) -> Column:
    """Stopword-marker language heuristic: count marker-token hits per
    language; predict the argmax (ties and zero hits -> first/'und').
    Deterministic by construction — the DuckDB oracle mirrors it exactly."""
    return F.element_at(F.transform(F.array(tokens(text)), _lang_build), 1)


def _lang_build(toks: Column) -> Column:
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            (lang, F.size(F.filter(toks, lambda t: F.array_contains(arr, t))))
        )
    best_lang: Column = F.lit("und")
    best_score: Column = F.lit(0)
    # process in reverse with >= so earlier-listed languages win ties;
    # score 0 never wins -> 'und' for marker-free text
    for lang, score in reversed(scores):
        better = (score > 0) & (score >= best_score)
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def text_profile(text: Column) -> Column:
    """One-pass combined profile: STRUCT(quality STRUCT, lang_pred,
    fingerprint) with the token array bound ONCE — Catalyst's
    CollapseProject re-inlines shared projected columns, so computing
    the three metrics separately tokenizes three times; this form
    guarantees a single tokenization per row."""

    def build(toks: Column) -> Column:
        return F.struct(
            _quality_build(text, toks).alias("quality"),
            _lang_build(toks).alias("lang_pred"),
            _fingerprint_build(toks).alias("fingerprint"),
        )

    return F.element_at(F.transform(F.array(tokens(text)), build), 1)
