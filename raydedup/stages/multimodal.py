"""Multimodal columns: opaque binary payloads + typed metadata, with the
Ray-side plumbing (schema, actor signature, batch sizing, output layout)
real and tested, and the codec itself stubbed — the image/audio codecs
aren't in this container (task contract: stub decode behind a
deterministic fake / NotImplementedError, keep the plumbing real).

Pattern: media travels as a ``binary`` column plus metadata columns
(``media_type``, ``width``, ``height``, ``sample_rate``...).  Decode /
feature-extract stages are actor pools (a real codec loads libraries or
models once per actor in ``__init__``), with SMALL batch sizes — a batch
of large binary payloads times the pool concurrency must fit worker
heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.numeric import round_half_away
from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.hashing import hash_strings


class MediaDecodeStage:
    """Actor-pool decode stage.  ``fake=True`` (default in this
    container) produces a deterministic pseudo-decode — a seeded feature
    vector derived from the payload bytes — so the full pipeline shape
    (schema in/out, batching, actor lifecycle) runs and is testable;
    ``fake=False`` raises NotImplementedError where a real codec
    (Pillow / torchaudio / pyav) would be loaded in __init__."""

    FEATURE_DIM = 64

    def __init__(self, media_col: str = "media", fake: bool = True):
        self.media_col = media_col
        if not fake:
            raise NotImplementedError(
                "real media codecs are not available in this environment; "
                "construct with fake=True for the deterministic stub")
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.media_col]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        n = len(payloads)
        feats = np.zeros((n, self.FEATURE_DIM), dtype=np.float32)
        sizes = np.zeros(n, dtype=np.int64)
        for i in range(n):
            buf = payloads[i].as_py() or b""
            sizes[i] = len(buf)
            # deterministic fake decode: bytes → seeded feature vector
            h = hash_strings([buf.hex()])[0] if buf else np.uint64(0)
            rng = np.random.default_rng(int(h) & 0x7FFFFFFF)
            feats[i] = rng.standard_normal(self.FEATURE_DIM).astype(np.float32)
        batch = batch.append_column(
            "media_bytes", pa.array(sizes, pa.int64()))
        return batch.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.FEATURE_DIM),
        )


def decode_media(ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                 media_col: str = "media", concurrency=(1, 4),
                 batch_size: int = 64):
    """Attach decoded features to a media Dataset.  batch_size is small
    on purpose: batch × payload size × concurrency bounds worker heap."""
    return ds.map_batches(
        MediaDecodeStage, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs=dict(media_col=media_col, fake=True),
    )


def frame_sample_stage(ds, every_n: int = 10, media_col: str = "media"):
    """Video frame-sampling plumbing: emits one row per sampled frame
    index with the parent row id — the decode of the actual frame is the
    stubbed stage above.  Demonstrates the 1→N explode layout for video."""

    def _sample(batch: pa.Table) -> pa.Table:
        sizes = pa.compute.binary_length(
            batch[media_col].combine_chunks()
            if isinstance(batch[media_col], pa.ChunkedArray)
            else batch[media_col])
        n_frames = np.maximum(np.asarray(sizes, dtype=np.int64) // 1000, 1)
        n_samples = (n_frames + every_n - 1) // every_n
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), n_samples)
        frame_no = _concat_ranges(n_samples) * every_n
        cols = {c: batch[c].take(pa.array(idx, pa.int64()))
                for c in batch.column_names if c != media_col}
        cols["frame_no"] = pa.array(frame_no, pa.int64())
        return pa.table(cols)

    return ds.map_batches(_sample, batch_format="pyarrow", batch_size=64)


def resize_stage(ds, max_width: int, max_height: int,
                 media_col: str = "media",
                 width_col: str = "width", height_col: str = "height"):
    """Image-resize plumbing: compute each row's output geometry for an
    aspect-preserving fit into (max_width, max_height) — ``out_width``,
    ``out_height``, ``scale_e6`` columns appended, payload passed
    through untouched (the pixel work itself is the stubbed codec,
    MediaDecodeStage).  Pure vectorized metadata math, zero shuffle;
    rows already within bounds keep their dimensions (scale 1.0).
    Demonstrates the metadata-in/metadata-out layout a real resize
    actor pool would use around the codec call."""
    if max_width <= 0 or max_height <= 0:
        raise ValueError("max_width/max_height must be positive")

    def _resize(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch[width_col], dtype=np.float64)
        h = np.asarray(batch[height_col], dtype=np.float64)
        scale = np.minimum(1.0, np.minimum(max_width / np.maximum(w, 1),
                                           max_height / np.maximum(h, 1)))
        out_w = np.maximum(np.floor(w * scale), 1).astype(np.int64)
        out_h = np.maximum(np.floor(h * scale), 1).astype(np.int64)
        return (batch
                .append_column("out_width", pa.array(out_w, pa.int64()))
                .append_column("out_height", pa.array(out_h, pa.int64()))
                .append_column("scale_e6", pa.array(
                    round_half_away(scale * 1e6).astype(np.int64), pa.int64())))

    return ds.map_batches(_resize, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=64)


def _concat_ranges(lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(offs, lens)
