"""Cross-implementation agreement + determinism — the reference's
run_proteus.sh strategy (same input through both physical
implementations, outputs must agree; SURVEY.md §5.1)."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig
from raydedup.sources.synth import synth_pages

CFG = PipelineConfig(num_partitions=4, batch_size=256)


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data as rd
    pages, _ = synth_pages(400, seed=7)
    return rd.from_arrow(pages.select(["doc_id", "text"]))


def _sorted_pairs(df):
    cols = ["a", "b", "intersection", "union", "jaccard"]
    return sorted(map(tuple, df[cols].values.tolist()))


class TestPhysicalPlanAgreement:
    def test_broadcast_vs_partitioned_verify(self, ray_session, corpus_ds):
        """The two verification plans (broadcast pack vs partitioned
        hash join) must score identical pair sets identically."""
        from raydedup.stages.lsh import candidate_pairs, explode_bands
        from raydedup.stages.signatures import signatures
        from raydedup.stages.verify import verify_pairs
        sig = signatures(corpus_ds, CFG, with_simhash=False).materialize()
        cands = candidate_pairs(explode_bands(sig, CFG), CFG).materialize()
        assert cands.count() > 0
        v_b = verify_pairs(cands, sig, CFG, assume_small=True).to_pandas()
        v_p = verify_pairs(cands, sig, CFG, assume_small=False).to_pandas()
        assert _sorted_pairs(v_b) == _sorted_pairs(v_p)

    def test_oph_vs_perm_minhash_recall_agreement(self, ray_session, corpus_ds):
        """Both signature families must find the same VERIFIED pair set
        (candidates differ; exact verification normalizes them)."""
        from raydedup.pipelines.neardup import near_dup_pairs
        p_oph = near_dup_pairs(corpus_ds, CFG.with_(minhash_mode="oph")) \
            .to_pandas()
        p_perm = near_dup_pairs(corpus_ds, CFG.with_(minhash_mode="perm")) \
            .to_pandas()
        assert _sorted_pairs(p_oph) == _sorted_pairs(p_perm)

    def test_pipeline_deterministic(self, ray_session, corpus_ds):
        from raydedup.pipelines.neardup import near_dup_pairs
        r1 = near_dup_pairs(corpus_ds, CFG).to_pandas()
        r2 = near_dup_pairs(corpus_ds, CFG).to_pandas()
        assert _sorted_pairs(r1) == _sorted_pairs(r2)

    def test_fused_vs_staged_candidates_identical(self, ray_session,
                                                  corpus_ds):
        """candidate_pairs_from_docs (map side fused into the exchange's
        split tasks) must emit EXACTLY the pair set of the staged
        signatures -> explode_bands -> candidate_pairs path."""
        from raydedup.stages.lsh import (
            candidate_pairs, candidate_pairs_from_docs, explode_bands)
        from raydedup.stages.signatures import signatures
        sig = signatures(corpus_ds, CFG, keep_shingles=False,
                         keep_minhash=False, with_simhash=False)
        staged = candidate_pairs(explode_bands(sig, CFG), CFG).to_pandas()
        fused = candidate_pairs_from_docs(corpus_ds, CFG).to_pandas()
        assert len(staged) > 0
        assert sorted(map(tuple, staged[["a", "b"]].values.tolist())) \
            == sorted(map(tuple, fused[["a", "b"]].values.tolist()))

    def test_slim_vs_full_strategy_identical(self, ray_session, corpus_ds):
        from raydedup.pipelines.neardup import near_dup_pairs
        p_slim = near_dup_pairs(corpus_ds, CFG, strategy="slim").to_pandas()
        p_full = near_dup_pairs(corpus_ds, CFG, strategy="full").to_pandas()
        assert _sorted_pairs(p_slim) == _sorted_pairs(p_full)

    def test_distributed_vs_local_cc_random_graph(self, ray_session):
        """hash-min label propagation == driver union-find on a 100k-edge
        random graph with mixed component shapes (chains + blobs)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from raydedup.stages.cc import connected_components
        rng = np.random.default_rng(3)
        blob_a = rng.integers(0, 30_000, 60_000)
        blob_b = rng.integers(0, 30_000, 60_000)
        chain_n = np.arange(100_000, 140_000)
        edges_a = np.concatenate([blob_a, chain_n[:-1]])
        edges_b = np.concatenate([blob_b, chain_n[1:]])
        keep = edges_a != edges_b
        a = np.minimum(edges_a, edges_b)[keep]
        b = np.maximum(edges_a, edges_b)[keep]
        pairs = rd.from_arrow(pa.table({"a": pa.array(a, pa.int64()),
                                        "b": pa.array(b, pa.int64())}))
        d = connected_components(pairs, CFG, mode="distributed").to_pandas()
        l = connected_components(pairs, CFG, mode="local").to_pandas()
        got_d = dict(zip(d["node"], d["component"]))
        got_l = dict(zip(l["node"], l["component"]))
        assert got_d == got_l


class TestDebugDumps:
    def test_fused_debug_bands_match_staged_explode(self, ray_session,
                                                    corpus_ds, tmp_path):
        """debug_dir mode dumps the fused path's band rows; they must
        equal the staged explode_bands output exactly — the DEBUG_2
        localization hook (reference jaccard.cpp:823-867)."""
        import glob
        import pyarrow.parquet as pq
        from raydedup.stages.lsh import candidate_pairs_from_docs, explode_bands
        from raydedup.stages.signatures import signatures
        dbg = str(tmp_path / "dbg")
        cands = candidate_pairs_from_docs(
            corpus_ds, CFG, debug_dir=dbg).to_pandas()
        band_files = glob.glob(f"{dbg}/bands/*.parquet")
        cand_files = glob.glob(f"{dbg}/candidates/*.parquet")
        assert band_files and cand_files
        dumped = pa.concat_tables([pq.read_table(f) for f in band_files]) \
            .to_pandas()
        sig = signatures(corpus_ds, CFG, with_simhash=False)
        staged = explode_bands(sig, CFG).to_pandas()
        key = lambda df: sorted(zip(df["band_key"], df["doc_id"]))
        assert key(dumped) == key(staged)
        # dumped per-bucket candidates cover the final candidate set
        dcand = pa.concat_tables([pq.read_table(f).select(["a", "b"])
                                  for f in cand_files]).to_pandas()
        assert set(zip(cands["a"], cands["b"])) <= set(zip(dcand["a"],
                                                           dcand["b"]))
