"""Column-expression kernels (JVM-side, whole-stage-codegen friendly)."""

from .sax import (
    is_finite,
    sax_coarsen,
    sax_encode,
    sax_format,
    sax_letters,
    sax_mindist,
    sax_mindist_parts,
    sax_mindist_to_literal,
    sax_parse,
    sax_word_mindist,
)
from .text import (
    bpe_token_count,
    doc_hash60,
    lang_id,
    normalized_text,
    quality_metrics,
    rolling_fingerprint,
    shingles,
    token_count,
    tokens,
)

__all__ = [
    "bpe_token_count",
    "doc_hash60",
    "is_finite",
    "lang_id",
    "normalized_text",
    "quality_metrics",
    "rolling_fingerprint",
    "sax_coarsen",
    "sax_encode",
    "sax_format",
    "sax_letters",
    "sax_mindist",
    "sax_mindist_parts",
    "sax_mindist_to_literal",
    "sax_parse",
    "sax_word_mindist",
    "shingles",
    "token_count",
    "tokens",
]
