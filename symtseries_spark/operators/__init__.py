"""DataFrame-level operators: windowed SAX extraction, SAX-space search,
training-data dedup, and embedding similarity search."""

from .windows import (
    sliding_sax,
    sliding_sax_chunked,
    tumbling_sax,
    tumbling_values,
    whole_series_sax,
)
from .search import (
    allpairs_within,
    euclidean_refine,
    isax_buckets,
    isax_topk,
    match_pattern,
    mindist_to_pattern,
    motif_counts,
    topk_nearest,
)
from .joins import (
    asof_join,
    gapfill_locf,
    interval_join,
    salted_join,
    sessionize,
)
from .funnel import funnel_counts
from .sketches import (
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
)
from .timeseries import (
    ewma,
    quantize,
    rolling_zscore,
)
from .dedup import (
    exact_dedup_map,
    jaccard_pairs,
    jaccard_refine,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
    simhash_pairs,
)
from .simsearch import (
    ann_lsh_topk,
    cosine_topk,
    embedding_near_dup,
    embedding_near_dup_lsh,
    ivf_index,
    ivf_topk,
    knn_join,
    knn_join_vectorized,
)

__all__ = [
    "allpairs_within",
    "asof_join",
    "bloom_build",
    "bloom_probe",
    "cms_build",
    "cms_estimate",
    "ewma",
    "quantize",
    "funnel_counts",
    "gapfill_locf",
    "rolling_zscore",
    "interval_join",
    "salted_join",
    "sessionize",
    "ann_lsh_topk",
    "cosine_topk",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "euclidean_refine",
    "exact_dedup_map",
    "isax_buckets",
    "isax_topk",
    "ivf_index",
    "ivf_topk",
    "jaccard_pairs",
    "jaccard_refine",
    "knn_join",
    "knn_join_vectorized",
    "match_pattern",
    "mindist_to_pattern",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "motif_counts",
    "simhash",
    "simhash_pairs",
    "sliding_sax",
    "sliding_sax_chunked",
    "topk_nearest",
    "tumbling_sax",
    "tumbling_values",
    "whole_series_sax",
]
