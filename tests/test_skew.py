"""Skew-handling tests: over-cap LSH buckets, sampled hot detection,
distributed-CC checkpoint rounds."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig


def _docs_ds(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


BASE = " ".join(f"w{i}" for i in range(40))


class TestBucketCap:
    def test_over_cap_bucket_dropped_without_blowup(self, ray_session):
        # 60 identical docs with cap=20: the identical-signature buckets
        # exceed the cap in every band → all dropped → no candidate
        # pairs from LSH (exact dedup is the designed fallback for
        # identical docs).  The point: no 60^2 pair explosion.
        from raydedup.pipelines.neardup import near_dup_pairs
        cfg = PipelineConfig(num_partitions=4, batch_size=64,
                             band_bucket_cap=20)
        texts = [BASE] * 60 + [f"u{i} " * 30 + BASE[:10] for i in range(20)]
        pairs = near_dup_pairs(_docs_ds(texts), cfg).to_pandas()
        dup_ids = set(range(60))
        got_dup_pairs = [(a, b) for a, b in zip(pairs.get("a", []),
                                                pairs.get("b", []))
                         if a in dup_ids and b in dup_ids]
        assert got_dup_pairs == []

    def test_under_cap_bucket_kept(self, ray_session):
        from raydedup.pipelines.neardup import near_dup_pairs
        cfg = PipelineConfig(num_partitions=4, batch_size=64,
                             band_bucket_cap=100)
        texts = [BASE] * 10 + [f"u{i} " * 30 for i in range(20)]
        pairs = near_dup_pairs(_docs_ds(texts), cfg).to_pandas()
        got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
        want = {(a, b) for a in range(10) for b in range(a + 1, 10)}
        assert want <= got


class TestSampledHotDetection:
    def test_sampled_mode_finds_hot_key(self, ray_session, monkeypatch):
        import raydedup.stages.lsh as lsh
        import ray.data as rd
        # force the sampled path by shrinking the target
        monkeypatch.setattr(lsh, "HOT_DETECT_SAMPLE_TARGET", 1000)
        rng = np.random.default_rng(0)
        hot_key = 777
        keys = np.concatenate([
            np.full(3000, hot_key, dtype=np.int64),          # hot bucket
            rng.integers(10**6, 10**7, size=7000),           # singletons
        ])
        ids = np.arange(len(keys), dtype=np.int64)
        band_ds = rd.from_arrow(pa.table({
            "band_key": pa.array(keys, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
        }))
        cfg = PipelineConfig(num_partitions=4, band_bucket_cap=512)
        hot = lsh._hot_bucket_keys(band_ds, cfg)
        assert hot_key in hot
        # singletons must not be flagged
        assert len(hot) == 1

    def test_exact_mode_threshold_boundary(self, ray_session):
        import raydedup.stages.lsh as lsh
        import ray.data as rd
        cfg = PipelineConfig(num_partitions=4, band_bucket_cap=10)
        keys = np.concatenate([np.full(10, 1), np.full(11, 2)]).astype(np.int64)
        band_ds = rd.from_arrow(pa.table({
            "band_key": pa.array(keys, pa.int64()),
            "doc_id": pa.array(np.arange(len(keys)), pa.int64()),
        }))
        hot = lsh._hot_bucket_keys(band_ds, cfg)
        assert hot == [2]    # strictly greater than cap


class TestDistributedCCCheckpoint:
    def test_checkpoint_fn_called_and_result_correct(self, ray_session):
        import ray.data as rd
        from raydedup.stages.cc import connected_components
        from tests.oracle import union_find_components
        rng = np.random.default_rng(1)
        # chain graph forces multiple propagation rounds
        edges = [(i, i + 1) for i in range(0, 40)] + \
                [(100 + i, 100 + rng.integers(0, i + 1)) for i in range(1, 30)]
        pairs = rd.from_arrow(pa.table({
            "a": pa.array([min(e) for e in edges], pa.int64()),
            "b": pa.array([max(e) for e in edges], pa.int64()),
        }))
        rounds = []

        def ckpt(i, labels_ds):
            rounds.append(i)
            return labels_ds

        cfg = PipelineConfig(num_partitions=4, cc_max_iters=50)
        out = connected_components(pairs, cfg, checkpoint_fn=ckpt,
                                   mode="distributed").to_pandas()
        got = dict(zip(out["node"], out["component"]))
        want = union_find_components(edges)
        assert got == want
        assert len(rounds) >= 2     # the chain needs several rounds
