"""Multimodal column stages: opaque ``binary`` payloads + typed metadata.

Audio is the REAL modality in this engine (functions/audio.py — full decode).
Images are ALSO real: PPM/BMP decode + area-resize features are pure numpy
(functions/images.py), no Pillow needed — backend="numpy" exercises the
pixel path end-to-end. Video is real against the RAWV uncompressed format
(functions/video.py — zero-copy frame decode, sampling, motion features);
only external-codec formats (JPEG/PNG via Pillow, H.264 etc. via ffmpeg)
remain stubbed per the task brief, with the Ray-side plumbing (schema
contract, actor-pool signature, batch sizing, output layout) real and
tested either way.

Batch-size note: binary payload stages must size batches by BYTES not rows —
``batch_size`` here defaults low and callers should lower it further for
megabyte-scale payloads so batch × concurrency fits worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META_SCHEMA = pa.schema([
    ("item_id", pa.string()),
    ("bytes", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


class ImageDecodeStage:
    """Actor-pool stage: binary image → fixed-size feature vector.

    ``backend="numpy"`` (the default) REALLY decodes PPM/BMP payloads with
    the pure-numpy codecs in functions/images.py and emits grayscale
    area-resize features; ``backend="pil"`` would use Pillow where it exists
    (not this sandbox — still a declared stub); ``backend="fake"`` keeps the
    digest-based pseudo-feature double for plumbing-only tests.
    """

    def __init__(self, feature_dim: int = 16, backend: str = "numpy"):
        self.dim = feature_dim
        if backend == "auto":
            try:
                import PIL.Image  # noqa: F401

                backend = "pil"
            except ImportError:
                backend = "numpy"
        self.backend = backend

    def _fake_features(self, b: bytes) -> np.ndarray:
        d = hashlib.blake2b(b, digest_size=min(self.dim * 4, 64)).digest()
        d = (d * (self.dim * 4 // len(d) + 1))[: self.dim * 4]
        u = np.frombuffer(bytes(d), dtype=np.uint32)
        return (u / np.float64(2**32)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from data_quality_framework_ray.functions import images

        feats = []
        for b in batch["bytes"].to_pylist():  # payloads are per-item blobs
            if b is None:
                feats.append(np.zeros(self.dim, dtype=np.float32))
            elif self.backend == "numpy":
                feats.append(images.image_features(b, self.dim))
            elif self.backend == "fake":
                feats.append(self._fake_features(b))
            else:  # pragma: no cover - lib absent here
                raise NotImplementedError("PIL decode path: resize → mean-pool "
                                          "channels; implement where Pillow exists")
        out = batch.drop_columns(["bytes"])  # features replace payload downstream
        return out.append_column("features",
                                 pa.array([f.tolist() for f in feats],
                                          type=pa.list_(pa.float32())))


class VideoFrameStage:
    """Actor-pool video stage: RAWV payload → one row per SAMPLED frame with
    luma + motion features (functions/video.frame_stats). flat_map-shaped:
    input rows (item_id, bytes) fan out to (item_id, frame_index,
    frame_ts_ms, mean_luma, motion). Payloads decode zero-copy inside the
    task; sampled-frame stats, never pixel buffers, are what leaves the
    stage. Swap decode_rawv for an ffmpeg-backed decoder where one exists —
    this class signature and output schema are the contract."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        from data_quality_framework_ray.functions import video as V

        ids, idxs, tss, lumas, motions = [], [], [], [], []
        id_np = batch["item_id"].to_pylist()
        for row, b in enumerate(batch["bytes"].to_pylist()):
            if b is None:
                continue
            idx, ts, luma, motion = V.frame_stats(b, self.every_ms)
            ids.extend([id_np[row]] * len(idx))
            idxs.append(idx)
            tss.append(ts)
            lumas.append(luma)
            motions.append(motion)
        if not idxs:
            return pa.table({"item_id": pa.array([], type=pa.string()),
                             "frame_index": pa.array([], type=pa.int32()),
                             "frame_ts_ms": pa.array([], type=pa.int32()),
                             "mean_luma": pa.array([], type=pa.float64()),
                             "motion": pa.array([], type=pa.float64())})
        return pa.table({
            "item_id": pa.array(ids, type=pa.string()),
            "frame_index": pa.array(np.concatenate(idxs), type=pa.int32()),
            "frame_ts_ms": pa.array(np.concatenate(tss), type=pa.int32()),
            "mean_luma": pa.array(np.concatenate(lumas), type=pa.float64()),
            "motion": pa.array(np.concatenate(motions), type=pa.float64()),
        })


class FrameSampleStage:
    """Metadata-only frame-sampling planner: emits (item_id, frame_index)
    plan rows from dur_ms without touching payload bytes (used when the
    payload lives elsewhere and only the sampling schedule is needed).
    ``VideoFrameStage`` is the payload-decoding counterpart."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["item_id"].to_pylist()
        durs = batch["dur_ms"].to_pylist()
        out_ids, out_idx, out_ts = [], [], []
        for i, dur in zip(ids, durs):
            n = max(int((dur or 0) // self.every_ms), 1)
            for j in range(n):
                out_ids.append(i)
                out_idx.append(j)
                out_ts.append(j * self.every_ms)
        return pa.table({"item_id": pa.array(out_ids, type=pa.string()),
                         "frame_index": pa.array(out_idx, type=pa.int32()),
                         "frame_ts_ms": pa.array(out_ts, type=pa.int32())})
