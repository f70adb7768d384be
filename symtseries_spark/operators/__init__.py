"""DataFrame-level operators: windowed SAX extraction and SAX-space search."""

from .windows import sliding_sax, tumbling_sax, whole_series_sax
from .search import (
    allpairs_within,
    match_pattern,
    mindist_to_pattern,
    motif_counts,
    topk_nearest,
)

__all__ = [
    "allpairs_within",
    "match_pattern",
    "mindist_to_pattern",
    "motif_counts",
    "sliding_sax",
    "topk_nearest",
    "tumbling_sax",
    "whole_series_sax",
]
