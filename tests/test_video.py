"""RAWV video codec + frame-sampling stage (real multimodal video path)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from data_quality_framework_ray.functions.video import (
    decode_rawv,
    encode_rawv,
    frame_stats,
    synth_video,
)
from data_quality_framework_ray.stages.multimodal import VideoFrameStage


def test_rawv_roundtrip_fuzz():
    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(1, 30))
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        fps = int(rng.integers(1, 60))
        frames = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
        dec, got_fps = decode_rawv(encode_rawv(frames, fps=fps))
        assert got_fps == fps
        assert dec.shape == (n, h, w)
        assert (dec == frames).all()


def test_rawv_rejects_garbage():
    with pytest.raises(ValueError):
        decode_rawv(b"nope")
    with pytest.raises(ValueError):
        # valid header claiming more frames than the body carries
        decode_rawv(encode_rawv(np.zeros((2, 4, 4), np.uint8))[:-5])


def test_frame_stats_scene_change_motion():
    b = synth_video(3, n_frames=40, fps=10)
    idx, ts, luma, motion = frame_stats(b, every_ms=100)  # every frame
    assert len(idx) == 40 and motion[0] == 0.0
    assert (ts == idx * 100).all()
    # the mid-clip inversion must be the biggest motion spike
    assert np.argmax(motion) == 20
    # luma jumps across the scene change
    assert abs(luma[20] - luma[19]) > 0.3


def test_frame_stats_sampling_step():
    b = synth_video(1, n_frames=30, fps=10)
    idx, ts, _, _ = frame_stats(b, every_ms=500)  # every 5th frame
    assert list(idx) == [0, 5, 10, 15, 20, 25]
    assert list(ts) == [0, 500, 1000, 1500, 2000, 2500]


def test_video_stage_end_to_end(ray_session):
    rows = [{"item_id": f"v{i}", "bytes": synth_video(i, n_frames=20)}
            for i in range(10)]
    rows.append({"item_id": "null", "bytes": None})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = (ds.map_batches(VideoFrameStage,
                          fn_constructor_kwargs={"every_ms": 500},
                          concurrency=(1, 2), batch_size=4,
                          batch_format="pyarrow")
           .to_pandas())
    # 20 frames @10fps, every 500ms -> 4 samples per clip; null row dropped
    assert len(out) == 10 * 4
    assert set(out.columns) == {"item_id", "frame_index", "frame_ts_ms",
                                "mean_luma", "motion"}
    assert "null" not in set(out["item_id"])
    one = out[out["item_id"] == "v0"].sort_values("frame_index")
    i0, t0, l0, m0 = frame_stats(synth_video(0, n_frames=20), every_ms=500)
    assert (one["frame_index"].to_numpy() == i0).all()
    assert np.allclose(one["mean_luma"].to_numpy(), l0)
    assert np.allclose(one["motion"].to_numpy(), m0)
