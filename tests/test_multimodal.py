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

    def test_resize_geometry(self, ray_session):
        import ray.data as rd
        from raydedup.stages.multimodal import resize_stage
        tab = pa.table({
            "media_id": pa.array([0, 1, 2, 3], pa.int64()),
            "media": pa.array([b"x", b"y", b"z", b"w"], pa.binary()),
            "width": pa.array([4000, 100, 1024, 3000], pa.int64()),
            "height": pa.array([2000, 50, 2048, 6000], pa.int64()),
        })
        out = resize_stage(rd.from_arrow(tab), 1024, 1024).to_pandas() \
            .sort_values("media_id").reset_index(drop=True)
        # 4000x2000 -> fit 1024 wide: scale .256 -> 1024x512
        # 100x50 within bounds -> unchanged, scale 1.0
        # 1024x2048 -> fit 1024 tall: 512x1024
        # 3000x6000 -> fit 1024 tall: scale 1024/6000 -> 512x1024
        assert out["out_width"].tolist() == [1024, 100, 512, 512]
        assert out["out_height"].tolist() == [512, 50, 1024, 1024]
        assert out["scale_e6"].tolist()[1] == 1_000_000
        assert "media" in out.columns  # payload passes through

    def test_resize_rejects_bad_bounds(self, ray_session):
        import ray.data as rd
        from raydedup.stages.multimodal import resize_stage
        with pytest.raises(ValueError):
            resize_stage(_media_ds(), 0, 100)
