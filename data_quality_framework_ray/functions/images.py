"""Pure-numpy image codecs: PPM (P6/P3) and BMP (24-bit BI_RGB) decode, plus
encoders for datagen fixtures.

Makes the image modality REAL end-to-end without Pillow (absent from this
container): formats are decoded from the public format specs (netpbm PPM;
Windows BITMAPINFOHEADER). The reference has no image path at all (SURVEY.md
§2.2) — this backs the multimodal ImageDecodeStage (stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np


def _ppm_tokens(b: bytes, count: int) -> tuple[list[int], int]:
    """Read `count` whitespace-separated integer tokens from a netpbm header,
    skipping '#' comments. Returns (tokens, offset past the final token's
    single trailing whitespace byte)."""
    toks: list[int] = []
    i = 0
    n = len(b)
    while len(toks) < count:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if i < n and b[i : i + 1] == b"#":
            while i < n and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(int(b[i:j]))
        i = j
    return toks, i + 1  # exactly ONE whitespace byte after maxval per spec


def decode_ppm(b: bytes) -> np.ndarray:
    """P6 (binary) or P3 (ascii) PPM → (H, W, 3) uint8."""
    magic = b[:2]
    if magic == b"P6":
        (w, h, maxval), off = _ppm_tokens(b[2:], 3)
        off += 2
        if maxval > 255:
            raise ValueError("16-bit PPM unsupported")
        data = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=off)
        return data.reshape(h, w, 3).copy()
    if magic == b"P3":
        body = b[2:].split(b"\n")
        toks: list[int] = []
        for line in body:
            line = line.split(b"#", 1)[0]
            toks.extend(int(t) for t in line.split())
        w, h, maxval = toks[0], toks[1], toks[2]
        if maxval > 255:
            raise ValueError("16-bit PPM unsupported")
        arr = np.asarray(toks[3 : 3 + w * h * 3], dtype=np.uint8)
        return arr.reshape(h, w, 3)
    raise ValueError(f"not a PPM: magic {magic!r}")


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → (H, W, 3) uint8 (RGB order)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER unsupported")
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4-byte boundary
    rows = np.frombuffer(b, dtype=np.uint8, count=row_bytes * h,
                         offset=pixel_off).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if bottom_up:
        rgb = rgb[::-1]
    return rgb.copy()


def decode_image(b: bytes) -> np.ndarray:
    """Sniff magic and decode → (H, W, 3) uint8."""
    if b[:2] in (b"P6", b"P3"):
        return decode_ppm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    raise ValueError(f"unsupported image magic {b[:2]!r}")


def _resize_axis(img: np.ndarray, out_n: int, axis: int) -> np.ndarray:
    """One axis: area-average when downsampling, nearest when upsampling —
    handled independently per axis so a mixed resize (one axis down, one up)
    still area-averages the downsampled axis and never computes work it
    then discards."""
    n = img.shape[axis]
    if out_n == n:
        return img
    moved = np.moveaxis(img, axis, 0)
    if out_n < n:  # area average: bincount rows into target bins
        bins = (np.arange(n) * out_n) // n
        counts = np.bincount(bins, minlength=out_n).astype(np.float64)
        flat = moved.reshape(n, -1)
        out = np.zeros((out_n, flat.shape[1]))
        np.add.at(out, bins, flat)
        out /= counts[:, None]
        res = out.reshape((out_n,) + moved.shape[1:])
    else:  # nearest upsample
        idx = (np.arange(out_n) * n) // out_n
        res = moved[idx]
    return np.moveaxis(res, 0, axis)


def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Resize to (out_h, out_w, C): per-axis area-average down / nearest up."""
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    flat = img.reshape(h, w, c).astype(np.float64)
    return _resize_axis(_resize_axis(flat, out_h, 0), out_w, 1)


def image_features(b: bytes, dim: int) -> np.ndarray:
    """Deterministic feature vector: grayscale area-resize to g×g (g=⌈√dim⌉),
    flatten, truncate to ``dim``, scale to [0, 1] float32."""
    img = decode_image(b)
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    g = int(np.ceil(np.sqrt(dim)))
    small = resize_area(gray[:, :, None], g, g)[:, :, 0]
    feat = small.ravel()[:dim]
    if len(feat) < dim:
        feat = np.pad(feat, (0, dim - len(feat)))
    return (feat / 255.0).astype(np.float32)


# ---- encoders (datagen/test fixtures; not in the hot path) ----

def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    bgr = np.ascontiguousarray(img[::-1, :, ::-1], dtype=np.uint8)  # bottom-up BGR
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    return header + info + pixels
