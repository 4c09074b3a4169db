"""Pure-numpy image codecs + real multimodal decode path (VERDICT.md item 9).

The decode fixtures are built BYTE BY HAND here (struct-packed headers,
spelled-out pixel bytes) — independent of the module's own encoders — so a
decoder bug can't cancel against an encoder bug."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from data_quality_framework_ray.functions import images as I


def test_decode_ppm_p6_handbuilt():
    # 2x2 image: red, green / blue, white — header with a comment line
    body = bytes([255, 0, 0, 0, 255, 0,
                  0, 0, 255, 255, 255, 255])
    b = b"P6\n# comment\n2 2\n255\n" + body
    img = I.decode_ppm(b)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    assert img[1, 1].tolist() == [255, 255, 255]


def test_decode_ppm_p3_handbuilt():
    b = b"P3\n2 1\n255\n255 0 0  0 128 255\n"
    img = I.decode_ppm(b)
    assert img.shape == (1, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 128, 255]


def test_decode_bmp_handbuilt():
    # 2x2 24-bit BMP, bottom-up, rows padded to 4 bytes (2*3=6 -> pad 2).
    # stored row 0 = IMAGE BOTTOM row: blue, white; row 1 = top: red, green
    pixel_rows = (bytes([255, 0, 0,  255, 255, 255]) + b"\x00\x00"   # BGR!
                  + bytes([0, 0, 255,  0, 255, 0]) + b"\x00\x00")
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_rows),
                       0, 0, 0, 0)
    img = I.decode_bmp(header + info + pixel_rows)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]      # top-left red
    assert img[0, 1].tolist() == [0, 255, 0]      # top-right green
    assert img[1, 0].tolist() == [0, 0, 255]      # bottom-left blue
    assert img[1, 1].tolist() == [255, 255, 255]  # bottom-right white


def test_encoders_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(I.decode_ppm(I.encode_ppm(img)), img)
    np.testing.assert_array_equal(I.decode_bmp(I.encode_bmp(img)), img)
    np.testing.assert_array_equal(I.decode_image(I.encode_bmp(img)), img)


def test_resize_area_means():
    img = np.zeros((4, 4, 1))
    img[:2, :2, 0] = 100.0  # top-left quadrant
    small = I.resize_area(img, 2, 2)
    assert small[0, 0, 0] == 100.0
    assert small[0, 1, 0] == 0.0
    assert small[1, 1, 0] == 0.0


def test_image_features_deterministic_and_sized():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
    b = I.encode_ppm(img)
    f1 = I.image_features(b, 16)
    f2 = I.image_features(b, 16)
    assert f1.shape == (16,) and f1.dtype == np.float32
    np.testing.assert_array_equal(f1, f2)
    assert (f1 >= 0).all() and (f1 <= 1).all()
    # a genuinely different image gives different features
    img2 = 255 - img
    assert not np.array_equal(I.image_features(I.encode_ppm(img2), 16), f1)


def test_image_decode_stage_real_backend(ray_session):
    """The multimodal stage runs the REAL numpy decode path end-to-end."""
    import ray.data as rd

    from data_quality_framework_ray.stages.multimodal import ImageDecodeStage

    rng = np.random.default_rng(7)
    rows = []
    for k in range(12):
        img = rng.integers(0, 256, size=(16 + k, 12, 3), dtype=np.uint8)
        enc = I.encode_ppm(img) if k % 2 == 0 else I.encode_bmp(img)
        rows.append({"item_id": f"i{k}", "bytes": enc,
                     "mime": "image/ppm" if k % 2 == 0 else "image/bmp",
                     "width": 12, "height": 16 + k})
    rows.append({"item_id": "null", "bytes": None, "mime": "image/ppm",
                 "width": 0, "height": 0})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
                         batch_size=4, concurrency=2).take_all()
    assert len(out) == 13
    by_id = {r["item_id"]: r["features"] for r in out}
    assert all(len(f) == 16 for f in by_id.values())
    assert list(by_id["null"]) == [0.0] * 16
    # features must equal a direct driver-side decode (same kernel, via Ray)
    want = I.image_features(rows[0]["bytes"], 16)
    np.testing.assert_allclose(by_id["i0"], want, rtol=0, atol=0)


def test_resize_area_matches_naive_block_mean():
    """Property fuzz: for divisible shapes, area-resize equals the naive
    reshaped block mean on both axes (downsample/identity coverage)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 6), st.integers(1, 6), st.integers(1, 4),
           st.integers(1, 4), st.integers(0, 10**6))
    def run(oh, ow, fy, fx, seed):
        rng = np.random.default_rng(seed)
        h, w = oh * fy, ow * fx
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.float64)
        got = I.resize_area(img, oh, ow)
        want = img.reshape(oh, fy, ow, fx, 3).mean(axis=(1, 3))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    run()


def test_resize_area_mixed_down_up():
    """Mixed resize: the DOWN axis stays area-averaged while the UP axis is
    nearest-repeated (each source column repeated evenly)."""
    img = np.zeros((4, 2, 1))
    img[:2, 0, 0] = 100.0  # top half of column 0
    out = I.resize_area(img, 2, 4)  # height 4->2 (down), width 2->4 (up)
    assert out.shape == (2, 4, 1)
    # height averaged: row 0 = mean of source rows 0-1 (100 in col 0)
    np.testing.assert_allclose(out[0, :, 0], [100.0, 100.0, 0.0, 0.0])
    np.testing.assert_allclose(out[1, :, 0], [0.0, 0.0, 0.0, 0.0])
