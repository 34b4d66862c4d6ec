"""Inverted index: truth comparison, max_df cap, partition invariance."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.vocab import inverted_index

CFG = DEFAULT_CONFIG.with_(num_partitions=8)


def _docs(n=300, vocab=40, seed=9):
    rng = np.random.RandomState(seed)
    texts = [" ".join(f"t{v}" for v in rng.randint(0, vocab, size=12))
             for _ in range(n)]
    ids = rng.permutation(n * 3)[:n].astype(np.int64)  # sparse, unordered
    return texts, ids


def _truth(texts, ids):
    post = collections.defaultdict(set)
    for t, i in zip(texts, ids):
        for w in t.split(" "):
            if w:
                post[w].add(int(i))
    return {t: sorted(s) for t, s in post.items()}


def _run(texts, ids, cfg=CFG, n_blocks=5, **kw):
    import ray.data as rd
    tabs = [pa.table({"text": pa.array(list(tc), pa.string()),
                      "doc_id": pa.array(list(ic), pa.int64())})
            for tc, ic in zip(np.array_split(np.asarray(texts, object),
                                             n_blocks),
                              np.array_split(ids, n_blocks))]
    out = inverted_index(rd.from_arrow(tabs), cfg, **kw).to_pandas()
    return {r["token"]: (list(r["postings"]), int(r["df"]))
            for _, r in out.iterrows()}


class TestInvertedIndex:
    def test_matches_truth(self, ray_session):
        texts, ids = _docs()
        got = _run(texts, ids)
        want = _truth(texts, ids)
        assert set(got) == set(want)
        for tok, (post, df) in got.items():
            assert post == want[tok], tok
            assert df == len(want[tok])

    def test_max_df_cap(self, ray_session):
        texts, ids = _docs()
        texts = [t + " common" for t in texts]       # df == n_docs
        got = _run(texts, ids, max_df=100)
        assert "common" not in got
        want = _truth(texts, ids)
        assert set(got) == {t for t, p in want.items() if len(p) <= 100}

    def test_partition_invariance(self, ray_session):
        texts, ids = _docs(seed=21)
        a = _run(texts, ids, CFG, n_blocks=3)
        b = _run(texts, ids, DEFAULT_CONFIG.with_(num_partitions=19),
                 n_blocks=11)
        assert a == b

    def test_duplicate_mentions_collapse(self, ray_session):
        got = _run(["x x x x", "x y"], np.array([5, 2], np.int64))
        assert got["x"] == ([2, 5], 2)
        assert got["y"] == ([2], 1)
