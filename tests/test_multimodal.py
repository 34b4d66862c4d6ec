"""Multimodal plumbing tests (stubbed codecs, real Ray-side shape)."""

import numpy as np
import pyarrow as pa
import pytest

from raydedup.config import PipelineConfig

CFG = PipelineConfig(num_partitions=2)


def _media_ds(n=10, seed=0):
    import ray.data as rd
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(int(rng.integers(100, 5000))) for _ in range(n)]
    return rd.from_arrow(pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "media_type": pa.array(["image/fake"] * n),
        "media": pa.array(payloads, pa.binary()),
    }))


class TestMultimodal:
    def test_decode_schema_and_determinism(self, ray_session):
        from raydedup.stages.multimodal import MediaDecodeStage, decode_media
        ds = _media_ds(8, seed=1)
        out = decode_media(ds, CFG).to_pandas().sort_values("media_id")
        assert len(out) == 8
        assert all(len(f) == MediaDecodeStage.FEATURE_DIM
                   for f in out["features"])
        assert (out["media_bytes"] > 0).all()
        # deterministic: same payloads → same features
        out2 = decode_media(_media_ds(8, seed=1), CFG).to_pandas() \
            .sort_values("media_id")
        for f1, f2 in zip(out["features"], out2["features"]):
            assert np.allclose(np.asarray(f1), np.asarray(f2))

    def test_real_codec_is_explicitly_stubbed(self):
        from raydedup.stages.multimodal import MediaDecodeStage
        with pytest.raises(NotImplementedError):
            MediaDecodeStage(fake=False)

    def test_frame_sampling_explode(self, ray_session):
        from raydedup.stages.multimodal import frame_sample_stage
        ds = _media_ds(5, seed=2)
        out = frame_sample_stage(ds, every_n=2).to_pandas()
        # 1→N explode with parent ids carried, media column dropped
        assert set(out.columns) == {"media_id", "media_type", "frame_no"}
        assert (out.groupby("media_id").size() >= 1).all()
        assert (out["frame_no"] % 2 == 0).all()
