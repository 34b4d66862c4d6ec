"""End-to-end pipeline tests: the golden-comparison gate (SURVEY.md §5).

The brute-force Python oracle (tests/oracle.py) plays the role the
reference's compareCoords tool plays: the engine's verified dup pairs
must reach recall ≥ 0.99 against the oracle's all-pairs exact Jaccard at
the same shingle/signature config, with matched pairs score-identical
within float tolerance, and clustering must equal union-find components.
"""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig
from raydedup.sources.synth import synth_pages

from .oracle import true_dup_pairs, union_find_components

CFG = PipelineConfig(num_partitions=4, batch_size=512)
N_DOCS = 600


@pytest.fixture(scope="module")
def corpus():
    pages, truth = synth_pages(N_DOCS, seed=42)
    return pages, truth


@pytest.fixture(scope="module")
def oracle_pairs(corpus):
    pages, _ = corpus
    texts = dict(zip(pages["doc_id"].to_pylist(), pages["text"].to_pylist()))
    return true_dup_pairs(texts, CFG.k_shingle, CFG.verify_threshold)


@pytest.fixture(scope="module")
def engine_pairs(ray_session, corpus):
    import ray.data as rd
    from raydedup.pipelines.neardup import near_dup_pairs
    pages, _ = corpus
    docs = rd.from_arrow(pages.select(["doc_id", "text"]))
    return near_dup_pairs(docs, CFG).to_pandas()


class TestNearDupRecall:
    def test_recall_ge_099(self, engine_pairs, oracle_pairs):
        got = set(zip(engine_pairs["a"], engine_pairs["b"]))
        want = set(oracle_pairs)
        assert len(want) > 20, "fixture must plant enough true dup pairs"
        recall = len(got & want) / len(want)
        assert recall >= 0.99, f"recall {recall}: missing {sorted(want - got)[:5]}"

    def test_no_false_positives(self, engine_pairs, oracle_pairs):
        # verification is exact, so every reported pair must be a true pair
        got = set(zip(engine_pairs["a"], engine_pairs["b"]))
        want = set(oracle_pairs)
        assert got <= want, f"false positives: {sorted(got - want)[:5]}"

    def test_scores_match_oracle(self, engine_pairs, oracle_pairs):
        # tolerance comparison, as compareCoords.cpp:219
        for _, row in engine_pairs.iterrows():
            key = (int(row["a"]), int(row["b"]))
            assert key in oracle_pairs
            assert row["jaccard"] == pytest.approx(oracle_pairs[key], abs=1e-9)


@pytest.fixture(scope="module")
def engine_labels(ray_session, engine_pairs):
    import ray.data as rd
    from raydedup.stages.cc import connected_components
    pairs_ds = rd.from_pandas(engine_pairs[["a", "b"]])
    # cross-implementation agreement (the EC-vs-VC analogue): the
    # distributed hash-min path and the driver union-find path must
    # produce identical partitions
    dist = connected_components(pairs_ds, CFG, mode="distributed").to_pandas()
    local = connected_components(pairs_ds, CFG, mode="local").to_pandas()
    d = dict(zip(dist["node"], dist["component"]))
    l = dict(zip(local["node"], local["component"]))
    assert d == l
    return d


class TestClustering:
    def test_components_match_union_find(self, engine_labels, oracle_pairs):
        want = union_find_components(oracle_pairs.keys())
        # engine may differ from oracle only via LSH-missed pairs (recall
        # gate above bounds that); demand identical partitions here
        assert engine_labels == want

    def test_exact_dup_group_clustered_together(self, corpus, engine_labels):
        pages, truth = corpus
        comp = engine_labels
        tdf = truth.to_pandas()
        for gid, grp in tdf[tdf["kind"] == "exact"].groupby("group_id"):
            ids = sorted(grp["doc_id"])
            comps = {comp.get(i, i) for i in ids}
            assert len(comps) == 1, f"exact group {gid} split: {comps}"


class TestExactDedup:
    def test_exact_dedup_keeps_one_per_text(self, ray_session, corpus):
        import ray.data as rd
        from raydedup.stages.dedup import exact_dedup, exact_dup_groups
        pages, _ = corpus
        docs = rd.from_arrow(pages.select(["doc_id", "text"]))
        n_distinct = len(set(pages["text"].to_pylist()))
        groups = exact_dup_groups(docs, CFG).to_pandas()
        assert len(groups) == n_distinct
        deduped = exact_dedup(docs, CFG).to_pandas()
        assert len(deduped) == n_distinct
        # canonical keep: min doc_id per text group
        texts = pages["text"].to_pylist()
        first_seen = {}
        for i, t in enumerate(texts):
            first_seen.setdefault(t, i)
        assert set(deduped["doc_id"]) == set(first_seen.values())

    def test_exact_dup_pairs(self, ray_session, corpus):
        import ray.data as rd
        from raydedup.stages.dedup import exact_dup_pairs
        pages, _ = corpus
        docs = rd.from_arrow(pages.select(["doc_id", "text"]))
        pairs = exact_dup_pairs(docs, CFG).to_pandas()
        texts = pages["text"].to_pylist()
        want = {(a, b)
                for a in range(len(texts)) for b in range(a + 1, len(texts))
                if texts[a] == texts[b]}
        got = set(zip(pairs["a"], pairs["b"]))
        assert got == want

    def test_keep_earliest(self, ray_session):
        import ray.data as rd
        from raydedup.stages.dedup import keep_earliest
        # 12 docs / 4 distinct texts; crawl_ts shuffled so the earliest
        # crawl is NOT the smallest doc_id, plus a planted ts tie
        ids = list(range(12))
        texts = [f"page {i // 3}" for i in ids]
        ts = [(i * 7 + 5) % 12 for i in ids]
        ts[9] = ts[10] = 1   # tie inside the "page 3" group → min id wins
        tab = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "crawl_ts": pa.array(ts, pa.int64()),
        })
        out = keep_earliest(rd.from_arrow(tab), CFG).to_pandas()
        best = {}
        for i, t, s in zip(ids, texts, ts):
            if t not in best or (s, i) < best[t]:
                best[t] = (s, i)
        assert set(out["doc_id"]) == {i for (_, i) in best.values()}
        assert len(out) == 4
        assert list(out.columns) == ["doc_id", "text", "crawl_ts"]


class TestExtractionInvariant:
    def test_byte_identical_roundtrip(self, corpus):
        from raydedup.sources.pages import extract_text
        pages, _ = corpus
        out = extract_text(pages["html"].combine_chunks())
        assert out.to_pylist() == pages["text"].to_pylist()

    def test_extraction_stage(self, ray_session, corpus):
        import ray.data as rd
        from raydedup.sources.pages import extract_text_stage
        pages, _ = corpus
        ds = extract_text_stage(rd.from_arrow(pages))
        df = ds.to_pandas()
        assert (df["extracted_text"] == df["text"]).all()


class TestSimHashPath:
    def test_simhash_finds_exact_dups(self, ray_session, corpus):
        import ray.data as rd
        from raydedup.stages.lsh import simhash_candidate_pairs
        from raydedup.stages.signatures import signatures
        from raydedup.stages.verify import verify_pairs
        pages, truth = corpus
        docs = rd.from_arrow(pages.select(["doc_id", "text"]))
        sig = signatures(docs, CFG).materialize()
        cands = simhash_candidate_pairs(sig, CFG)
        ver = verify_pairs(cands, sig, CFG, threshold=0.999).to_pandas()
        got = set(zip(ver["a"], ver["b"]))
        texts = pages["text"].to_pylist()
        # every exact-dup pair with non-empty shingles must be found
        from .oracle import shingle_set
        want = {(a, b)
                for a in range(len(texts)) for b in range(a + 1, len(texts))
                if texts[a] == texts[b] and shingle_set(texts[a], CFG.k_shingle)}
        assert want <= got


class TestNearDupDedup:
    def test_keeps_one_per_cluster_both_paths(self, ray_session, corpus,
                                              monkeypatch):
        import ray.data as rd
        import raydedup.pipelines.neardup as nd
        pages, _ = corpus
        docs = rd.from_arrow(pages.select(["doc_id", "text"]))
        labels = nd.near_dup_clusters(docs, CFG).to_pandas()
        drop = set(labels.loc[labels["node"] != labels["component"], "node"])
        keep_want = set(pages["doc_id"].to_pylist()) - drop
        assert len(drop) > 0

        out_b = nd.near_dup_dedup(docs, CFG).to_pandas()
        assert set(out_b["doc_id"]) == keep_want
        assert list(out_b.columns) == ["doc_id", "text"]

        # force the partitioned anti-join path
        monkeypatch.setattr(nd, "NEAR_DEDUP_BROADCAST_MAX_DROPS", 0)
        out_p = nd.near_dup_dedup(docs, CFG).to_pandas()
        assert set(out_p["doc_id"]) == keep_want
        # text survives the anti-join untouched
        orig = dict(zip(pages["doc_id"].to_pylist(),
                        pages["text"].to_pylist()))
        got = dict(zip(out_p["doc_id"], out_p["text"]))
        assert all(got[i] == orig[i] for i in got)


def test_weighted_jaccard_adjacent_reference(ray_session, tmp_path):
    """Σmin/Σmax multiset Jaccard vs a pure-python reference over a
    planted fixture with repeats, empties and a boundary doc."""
    import collections

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.pipelines.queries import q_weighted_jaccard_adjacent

    texts = ["a a a b", "a b b", "a b", "c c d", "", "x y"]
    tab = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tab, tmp_path / "documents.parquet")
    out = q_weighted_jaccard_adjacent(str(tmp_path)).to_pandas()
    got = {(r["a"], r["b"]): (r["minsum"], r["maxsum"])
           for _, r in out.iterrows()}
    tf = [collections.Counter(t.split(" ")) - collections.Counter([""])
          for t in texts]
    want = {}
    for a in range(len(texts) - 1):
        ca, cb = tf[a], tf[a + 1]
        if not ca or not cb:
            continue                      # empty doc drops its pairs
        mins = sum(min(ca[t], cb[t]) for t in set(ca) & set(cb))
        maxs = sum(ca.values()) + sum(cb.values()) - mins
        want[(a, a + 1)] = (mins, maxs)
    assert got == want
    # sanity on a known pair: "a a a b" vs "a b b" -> min 1+1=2? no:
    # min(3,1)+min(1,2)=2, max = 4+3-2=5
    assert got[(0, 1)] == (2, 5)
