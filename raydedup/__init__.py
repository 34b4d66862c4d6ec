"""raydedup — a Ray-Data-native near-duplicate detection + clustering engine.

Built from scratch with the query/data-processing capabilities of the
reference (vtsynergy/SYCL-Jaccard, read-only at /root/reference): its
batch-parallel sorted-set-intersection Jaccard kernel is recast as
vectorized Arrow batch UDFs, lifted into a web-scale dedup pipeline
(k-shingles → 128-perm MinHash → LSH banding → exact Jaccard
re-verification → hash-min connected components) per BASELINE.json.
"""

from .config import DEFAULT_CONFIG, PipelineConfig

__all__ = ["PipelineConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
