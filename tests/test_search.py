"""BM25 ranking: pure-python reference agreement, rank-k tie-break
determinism, partition invariance, and input validation."""

import math

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG
from raydedup.stages.search import bm25_topk

CFG = DEFAULT_CONFIG.with_(num_partitions=4)


def _ds(docs, ids=None, n_blocks=4):
    import ray.data as rd
    ids = list(range(len(docs))) if ids is None else ids
    tab = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(docs, pa.string())})
    step = max(1, len(docs) // n_blocks)
    return rd.from_arrow([tab.slice(i, step)
                          for i in range(0, len(docs), step)])


def _ref_bm25(docs, terms, k, k1=1.2, b=0.75):
    """Pure-python reference with the SAME e6-per-term integer-sum
    contract as the stage (and the SQL oracle).  N counts only docs
    with >=1 non-empty token — the oracle's dl-CTE convention."""
    toksets = [[w for w in d.split(" ") if w] for d in docs]
    dls = [len(t) for t in toksets]
    n = sum(1 for d in dls if d > 0)
    avgdl = sum(dls) / n
    dfs = {t: sum(1 for ts in toksets if t in ts) for t in terms}
    out = []
    for i, ts in enumerate(toksets):
        score = 0
        hit = False
        for t in terms:
            tf = ts.count(t)
            if tf == 0:
                continue
            hit = True
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1)
            c = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b
                                                    + b * dls[i] / avgdl))
            score += int(math.copysign(math.floor(abs(c * 1e6) + 0.5), c))
        if hit:
            out.append((i, score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def _mk_docs(n=200, seed=11):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(50)] + ["hash", "join", "scan"]
    return [" ".join(rng.choice(vocab, size=rng.randint(4, 40)))
            for _ in range(n)]


class TestBM25:
    def test_matches_reference(self, ray_session):
        docs = _mk_docs()
        got = bm25_topk(_ds(docs), ["hash", "join"], CFG,
                        k=15).to_pandas()
        want = _ref_bm25(docs, ["hash", "join"], 15)
        assert list(zip(got["doc_id"], got["score_e6"])) == want

    def test_partition_invariance(self, ray_session):
        docs = _mk_docs(seed=29)
        a = bm25_topk(_ds(docs, n_blocks=2), ["hash", "scan"], CFG,
                      k=10).to_pandas()
        b = bm25_topk(_ds(docs, n_blocks=13), ["hash", "scan"],
                      DEFAULT_CONFIG.with_(num_partitions=7,
                                           batch_size=17),
                      k=10).to_pandas()
        assert a.values.tolist() == b.values.tolist()

    def test_rank_boundary_tie_break(self, ray_session):
        # four identical docs tie; k=2 must keep the two smallest ids
        docs = ["hash join", "hash join", "hash join", "hash join",
                "other words here"]
        got = bm25_topk(_ds(docs, n_blocks=3), ["hash"], CFG,
                        k=2).to_pandas()
        assert list(got["doc_id"]) == [0, 1]
        assert got["score_e6"].nunique() == 1

    def test_only_matching_docs_ranked(self, ray_session):
        docs = ["hash a b", "c d e", "f g h"]
        got = bm25_topk(_ds(docs, n_blocks=1), ["hash"], CFG, k=10).to_pandas()
        assert list(got["doc_id"]) == [0]

    def test_longer_doc_scores_lower(self, ray_session):
        # same tf, longer doc => larger denominator => smaller score
        docs = ["hash x", "hash " + " ".join(f"y{i}" for i in range(30))]
        got = bm25_topk(_ds(docs, n_blocks=1), ["hash"], CFG, k=2).to_pandas()
        assert list(got["doc_id"]) == [0, 1]
        assert got["score_e6"].iloc[0] > got["score_e6"].iloc[1]

    def test_empty_docs_excluded_from_stats(self, ray_session):
        """Empty / whitespace-only docs must not count toward N or
        avgdl — the SQL oracle's dl CTE has no row for them (review
        finding: the engine used to count them, shifting every idf)."""
        docs = _mk_docs(n=50, seed=17) + ["", "   ", ""]
        got = bm25_topk(_ds(docs), ["hash", "scan"], CFG,
                        k=10).to_pandas()
        want = _ref_bm25(docs, ["hash", "scan"], 10)
        assert list(zip(got["doc_id"], got["score_e6"])) == want

    def test_cli_search(self, ray_session, tmp_path, capsys):
        import argparse

        import pyarrow.parquet as pq

        from raydedup.__main__ import cmd_search
        docs = _mk_docs(n=60, seed=3)
        tab = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                        "text": pa.array(docs, pa.string())})
        pq.write_table(tab, tmp_path / "docs.parquet")
        cmd_search(argparse.Namespace(
            input=str(tmp_path / "docs.parquet"), terms="hash,join", k=5))
        out = capsys.readouterr().out
        want = _ref_bm25(docs, ["hash", "join"], 5)
        assert [int(line.split()[0]) for line in out.strip().splitlines()[1:]] \
            == [d for d, _ in want]

    def test_validation(self, ray_session):
        ds = _ds(["a b"], n_blocks=1)
        with pytest.raises(ValueError):
            bm25_topk(ds, [], CFG)
        with pytest.raises(ValueError):
            bm25_topk(ds, ["a", "a"], CFG)
        with pytest.raises(ValueError):
            bm25_topk(ds, ["a b"], CFG)
        with pytest.raises(ValueError):
            bm25_topk(ds, [""], CFG)
