"""ngram_novelty / dedup_weights / cross_source_overlap vs pure-python
references over planted fixtures (both broadcast and exchange paths)."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import DEFAULT_CONFIG

CFG = DEFAULT_CONFIG.with_(num_partitions=4, batch_size=3)


def _shingles(text: str, k: int = 5) -> set:
    toks = text.split(" ")
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)} \
        if len(toks) >= k else set()


def _novelty_reference(ids, texts):
    sets = {i: _shingles(t) for i, t in zip(ids, texts)}
    first = {}
    for i in sorted(ids):
        for s in sets[i]:
            first.setdefault(s, i)
    return {
        i: (len(sets[i]),
            sum(1 for s in sets[i] if first[s] == i))
        for i in ids
    }


@pytest.fixture(scope="module")
def corpus():
    # doc 1 introduces everything; 2 copies half of 1; 3 is fresh;
    # 4 copies 3 exactly; 5 too short for any shingle; 6 mixes 1+3
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta nu xi omicron pi",
        "one two three four five six seven eight nine ten",
        "one two three four five six seven eight nine ten",
        "tiny doc",
        "gamma delta epsilon zeta eta three four five six seven",
    ]
    ids = list(range(1, len(texts) + 1))
    return ids, texts


def test_ngram_novelty_reference(ray_session, corpus):
    import ray.data as rd

    from raydedup.stages.novelty import ngram_novelty

    ids, texts = corpus
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": texts}))
    out = ngram_novelty(docs, CFG).to_pandas().set_index("doc_id")
    want = _novelty_reference(ids, texts)
    assert len(out) == len(ids)
    for i, (ns, nn) in want.items():
        row = out.loc[i]
        assert row["n_shingles"] == ns, i
        assert row["n_novel"] == nn, i
        assert row["novelty"] == nn / max(ns, 1)
    # doc 4 (exact copy of 3) introduces nothing; doc 5 has no shingles
    assert out.loc[4, "n_novel"] == 0
    assert out.loc[5, "n_shingles"] == 0 and out.loc[5, "novelty"] == 0.0


def test_ngram_novelty_partition_invariance(ray_session, corpus):
    """Novelty totals must not depend on the partition/chunk layout."""
    import ray.data as rd

    from raydedup.stages.novelty import ngram_novelty

    ids, texts = corpus
    tab = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    a = ngram_novelty(rd.from_arrow(tab), CFG).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = ngram_novelty(rd.from_arrow(tab).repartition(5),
                      DEFAULT_CONFIG.with_(num_partitions=9, batch_size=1)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def _dup_corpus():
    base = "the quick brown fox jumps over the lazy dog today"
    texts, ids, srcs = [], [], []
    for i in range(12):
        if i < 4:            # one 4-member near-dup cluster
            texts.append(base)
            srcs.append("cc" if i % 2 == 0 else "web")
        elif i < 6:          # a 2-member cluster in one source
            texts.append("red green blue cyan magenta yellow black white "
                         "gray pink")
            srcs.append("web")
        else:                # singletons
            texts.append(f"unique doc number {i} with words "
                         f"{'x%d ' % i * 6}trail")
            srcs.append("cc")
        ids.append(i + 1)
    return ids, texts, srcs


def test_dedup_weights_both_paths(ray_session, monkeypatch):
    import ray.data as rd

    import raydedup.pipelines.neardup as nd

    ids, texts, _ = _dup_corpus()
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": texts}))
    want_sizes = {i: (4 if i <= 4 else 2 if i <= 6 else 1) for i in ids}

    out = nd.dedup_weights(docs, CFG).to_pandas().set_index("doc_id")
    assert len(out) == len(ids)
    for i, s in want_sizes.items():
        assert out.loc[i, "cluster_size"] == s, i
        assert out.loc[i, "weight"] == 1.0 / s
    # the weighted corpus mass equals the deduped doc count
    assert np.isclose(out["weight"].sum(), 1 + 1 + 6)

    monkeypatch.setattr(nd, "NEAR_DEDUP_BROADCAST_MAX_DROPS", 0)
    out_p = nd.dedup_weights(docs, CFG).to_pandas().set_index("doc_id")
    assert out_p.sort_index().equals(out.sort_index())


def test_cross_source_overlap(ray_session):
    import ray.data as rd

    import raydedup.pipelines.neardup as nd

    ids, texts, srcs = _dup_corpus()
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "text": texts, "source": srcs}))
    out = nd.cross_source_overlap(docs, CFG).to_pandas()
    got = {(r.source_a, r.source_b): r.n_pairs for r in out.itertuples()}
    # cluster 1 = docs 1-4 sources cc,web,cc,web -> pairs: cc-cc 1,
    # web-web 1, cc-web 4; cluster 2 = docs 5,6 both web -> web-web +1
    assert got == {("cc", "cc"): 1, ("cc", "web"): 4, ("web", "web"): 2}


def test_cross_source_overlap_empty(ray_session):
    import ray.data as rd

    import raydedup.pipelines.neardup as nd

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["totally unique alpha beta gamma delta epsilon",
                 "another one zeta eta theta iota kappa lambda"],
        "source": ["a", "b"]}))
    out = nd.cross_source_overlap(docs, CFG)
    # return type must be a Dataset regardless of whether dup pairs
    # exist (review finding: the no-pairs path returned a bare Table)
    assert isinstance(out, rd.Dataset)
    assert out.count() == 0
    assert out.schema().names == ["source_a", "source_b", "n_pairs"]


class TestClusterProfile:
    def _corpus(self):
        """Two planted clusters: A = 3 near-identical docs (ids 0,1,2;
        sources s0,s0,s1; lengths 100,120,110), B = 2 docs (ids 10,11;
        both s2; lengths 50,60); singletons elsewhere."""
        base_a = " ".join(f"a{i}" for i in range(40))
        base_b = " ".join(f"b{i}" for i in range(40))
        rows = [
            (0, base_a, "s0", 100),
            (1, base_a + " x", "s0", 120),
            (2, base_a + " y", "s1", 110),
            (10, base_b, "s2", 50),
            (11, base_b + " z", "s2", 60),
            (20, " ".join(f"u{i}" for i in range(30)), "s3", 70),
        ]
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([r[3] for r in rows], pa.int64())})

    def test_planted_clusters(self, ray_session):
        import ray.data as rd

        from raydedup.pipelines.neardup import cluster_profile
        got = cluster_profile(rd.from_arrow(self._corpus()), CFG) \
            .to_pandas().set_index("component").sort_index()
        assert list(got.index) == [0, 10]
        a = got.loc[0]
        assert (a["size"], a["n_sources"], a["max_chars"],
                a["sum_chars"], a["keep_id"]) == (3, 2, 120, 330, 0)
        b = got.loc[10]
        assert (b["size"], b["n_sources"], b["max_chars"],
                b["sum_chars"], b["keep_id"]) == (2, 1, 60, 110, 10)

    def test_no_clusters_returns_empty_dataset(self, ray_session):
        import ray.data as rd

        from raydedup.pipelines.neardup import cluster_profile
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["totally unique alpha beta gamma delta epsilon",
                     "another one zeta eta theta iota kappa lambda"],
            "source": ["a", "b"],
            "n_chars": pa.array([10, 20], pa.int64())}))
        out = cluster_profile(docs, CFG)
        assert isinstance(out, rd.Dataset)
        assert out.count() == 0
        assert out.schema().names == ["component", "size", "n_sources",
                                      "max_chars", "sum_chars", "keep_id"]

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from raydedup.pipelines.neardup import cluster_profile
        tab = self._corpus()
        a = cluster_profile(rd.from_arrow(tab), CFG).to_pandas()
        b = cluster_profile(
            rd.from_arrow([tab.slice(i, 2) for i in range(0, 6, 2)]),
            DEFAULT_CONFIG.with_(num_partitions=7, batch_size=2)) \
            .to_pandas()
        assert sorted(map(tuple, a.values.tolist())) == \
            sorted(map(tuple, b.values.tolist()))

    def test_partitioned_path_identical(self, ray_session, monkeypatch):
        """Above the broadcast gate the union-schema exchange path must
        produce the same profile (review finding: the gate was
        missing entirely)."""
        import ray.data as rd

        import raydedup.pipelines.neardup as nd
        tab = self._corpus()
        want = nd.cluster_profile(rd.from_arrow(tab), CFG).to_pandas()
        monkeypatch.setattr(nd, "NEAR_DEDUP_BROADCAST_MAX_DROPS", 0)
        got = nd.cluster_profile(rd.from_arrow(tab), CFG).to_pandas()
        assert sorted(map(tuple, got.values.tolist())) == \
            sorted(map(tuple, want.values.tolist()))

    def test_null_source_not_counted_distinct(self, ray_session):
        """NULL sources count toward size/sums but not n_sources —
        SQL count(DISTINCT) semantics (review finding)."""
        import ray.data as rd

        from raydedup.pipelines.neardup import cluster_profile
        base = " ".join(f"n{i}" for i in range(40))
        tab = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([base, base + " x", base + " y"]),
            "source": pa.array(["web", None, None], pa.string()),
            "n_chars": pa.array([10, 20, 30], pa.int64())})
        got = cluster_profile(rd.from_arrow(tab), CFG).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (r["size"], r["n_sources"], r["sum_chars"]) == (3, 1, 60)
