"""Incremental exact dedup (stages/incremental.py)."""

import pyarrow as pa

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.incremental import incremental_exact_dedup

CFG = DEFAULT_CONFIG.with_(num_partitions=4, batch_size=3)


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(2)


def test_corpus_wins_and_increment_keep_min(ray_session):
    corpus = _ds([(0, "old one"), (1, "old two"), (2, "old three")])
    inc = _ds([
        (100, "old two"),        # exists in corpus -> dropped
        (101, "brand new"),      # fresh -> kept
        (102, "inc dup"),        # min of its increment group -> kept
        (103, "inc dup"),        # same text, higher id -> dropped
        (104, "old one"),        # exists in corpus -> dropped
        (105, "another fresh"),  # kept
    ])
    out = incremental_exact_dedup(inc, corpus, CFG).to_pandas()
    assert sorted(out["doc_id"]) == [101, 102, 105]
    assert set(out.columns) == {"doc_id", "text"}


def test_empty_corpus_reduces_to_exact_dedup(ray_session):
    import ray.data as rd
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    inc = _ds([(1, "a"), (2, "a"), (3, "b")])
    out = incremental_exact_dedup(inc, corpus, CFG).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_all_duplicate_increment(ray_session):
    corpus = _ds([(0, "x"), (1, "y")])
    inc = _ds([(10, "x"), (11, "y")])
    out = incremental_exact_dedup(inc, corpus, CFG).to_pandas()
    assert len(out) == 0
