"""Column-expression kernels (JVM-side, whole-stage-codegen friendly)."""

from .sax import (
    is_finite,
    sax_encode,
    sax_format,
    sax_letters,
    sax_mindist,
    sax_mindist_parts,
    sax_parse,
)

__all__ = [
    "is_finite",
    "sax_encode",
    "sax_format",
    "sax_letters",
    "sax_mindist",
    "sax_mindist_parts",
    "sax_parse",
]
