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
