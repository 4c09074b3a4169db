"""Pure-numpy raw-video codec ("RAWV") + frame sampling / motion features.

Real video containers need ffmpeg (absent from this container), so the video
modality is exercised end-to-end against a trivial but REAL uncompressed
format — the same approach that makes audio (LUT G.711) and images (PPM/BMP)
real here. A RAWV payload is:

    magic b"RAWV" | u16 width | u16 height | u16 fps | u32 n_frames
    | n_frames × (width × height) uint8 grayscale planes, row-major

Decode is a header parse + ``np.frombuffer(...).reshape`` — zero-copy over
the payload buffer. The format carries everything the Ray-side plumbing
needs to be honest about: per-item variable byte length, frame geometry in
the header (not the schema), and payload sizes that force byte-based batch
sizing. Swap ``decode_rawv`` for an ffmpeg/PyAV call where those exist; the
stage contract (stages/multimodal.VideoFrameStage) does not change.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RAWV"
_HEADER = struct.Struct("<4sHHHI")


def encode_rawv(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode ``(n_frames, height, width)`` uint8 grayscale frames."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError("frames must be (n, h, w)")
    n, h, w = frames.shape
    return _HEADER.pack(MAGIC, w, h, fps, n) + frames.tobytes()


def decode_rawv(b: bytes) -> tuple[np.ndarray, int]:
    """Decode a RAWV payload → ``((n, h, w) uint8 view, fps)``. The frame
    array is a zero-copy view over the payload bytes."""
    if len(b) < _HEADER.size or b[:4] != MAGIC:
        raise ValueError("not a RAWV payload")
    _, w, h, fps, n = _HEADER.unpack_from(b)
    need = n * h * w
    body = np.frombuffer(b, dtype=np.uint8, offset=_HEADER.size)
    if len(body) < need:
        raise ValueError("truncated RAWV payload")
    return body[:need].reshape(n, h, w), fps


def frame_stats(b: bytes, every_ms: int = 1000):
    """Sample one frame every ``every_ms`` and return per-sampled-frame
    stats as plain numpy arrays:

    ``frame_index``, ``frame_ts_ms``, ``mean_luma`` (0..1), ``motion``
    (mean |frame − previous sampled frame| / 255; 0.0 for the first).

    All reductions are whole-frame numpy ops over the zero-copy decode view;
    temporaries are O(one frame), mirroring the audio decode_stats contract.
    """
    frames, fps = decode_rawv(b)
    n = len(frames)
    step = max(int(round(fps * every_ms / 1000.0)), 1)
    idx = np.arange(0, n, step, dtype=np.int32)
    ts = (idx.astype(np.int64) * 1000 // fps).astype(np.int32)
    mean_luma = np.empty(len(idx), dtype=np.float64)
    motion = np.zeros(len(idx), dtype=np.float64)
    prev = None
    for j, i in enumerate(idx):
        f = frames[i]
        mean_luma[j] = float(f.mean()) / 255.0
        if prev is not None:
            motion[j] = float(
                np.abs(f.astype(np.int16) - prev).mean()) / 255.0
        prev = f.astype(np.int16)
    return idx, ts, mean_luma, motion


def synth_video(item_seed: int, *, w: int = 32, h: int = 24,
                n_frames: int = 40, fps: int = 10) -> bytes:
    """Deterministic synthetic clip: a moving bright square over a static
    noise background, one scene change mid-clip. Datagen fixture — keeps
    video tests/bench hermetic (no external data, per the task brief)."""
    rng = np.random.default_rng(item_seed)
    bg = rng.integers(0, 60, size=(h, w), dtype=np.uint8)
    frames = np.repeat(bg[None, :, :], n_frames, axis=0).copy()
    side = max(h // 4, 2)
    for i in range(n_frames):
        if i == n_frames // 2:  # scene change: invert background
            frames[i:] = 255 - frames[i:]
        x = (i * 3) % max(w - side, 1)
        y = (i * 2) % max(h - side, 1)
        frames[i, y:y + side, x:x + side] = 220
    return encode_rawv(frames, fps=fps)
