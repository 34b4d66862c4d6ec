"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the ``raydedup`` library) calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: MinHash-LSH near-dup detection with exact
    Jaccard verification over the sf0.001 documents corpus."""
    import ray.data as rd
    from raydedup.config import DEFAULT_CONFIG
    from raydedup.pipelines.neardup import near_dup_pairs

    cfg = DEFAULT_CONFIG.with_(num_partitions=8)
    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    return near_dup_pairs(docs, cfg)


def queries() -> dict[str, Callable[[str], Any]]:
    from raydedup.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raydedup.pipelines.queries import ORACLES
    return dict(ORACLES)
