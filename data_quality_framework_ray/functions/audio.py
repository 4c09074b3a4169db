"""Audio codec kernels: G.711 µ-law / A-law / PCM16 decode, vectorized over whole
Arrow batches.

The decoders are built from the public G.711 / CCITT definitions as 256-entry
numpy lookup tables, so an entire ``binary`` column decodes with ONE numpy
fancy-index over the column's contiguous data buffer — no per-row Python work.
The independent test oracle decodes with stdlib ``audioop`` instead
(tests/oracle.py); the two must agree exactly (verified in tests/test_audio.py,
per-row invariant: allclose + SNR ≥ 30 dB, BASELINE.json input_hint).

Reference parity: the reference has no audio path at all (SURVEY.md §2.2) —
these kernels exist for the north rule's clip table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CODEC_BPS = {"pcm16": 2, "ulaw": 1, "alaw": 1}

# Clipping = samples at ≥99.9% of the CODEC's own decoded full scale. A
# single global cutoff (the old 0.985) can never fire for G.711 — µ-law
# decodes to at most 32124/32768 ≈ 0.9803 and A-law to 32256/32768 =
# 0.984375 — so fully clipped telephony audio reported clip_frac 0.0.
CLIP_LEVEL = {"pcm16": 0.999 * (32767.0 / 32768.0),
              "ulaw": 0.999 * (32124.0 / 32768.0),
              "alaw": 0.999 * (32256.0 / 32768.0)}


def _build_ulaw_table() -> np.ndarray:
    """µ-law byte → 16-bit linear PCM (G.711 decode formula)."""
    u = np.arange(256, dtype=np.int32) ^ 0xFF  # stored form is complemented
    sign = (u & 0x80) != 0
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    sample = (((mantissa << 3) + 0x84) << exponent) - 0x84
    sample = np.where(sign, -sample, sample)
    return sample.astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    """A-law byte → 16-bit linear PCM (G.711 decode formula)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    positive = (a & 0x80) != 0  # A-law sign convention: MSB set = positive
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    base = np.where(exponent == 0, (mantissa << 4) + 8,
                    ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0))
    sample = np.where(positive, base, -base)
    return sample.astype(np.int16)


ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()


def binary_column_buffers(col: pa.ChunkedArray | pa.Array) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Zero-copy views of a binary column: per chunk (data_u8, offsets, valid_mask).

    Handles both ``binary`` (int32 offsets) and ``large_binary`` (int64
    offsets — what Arrow promotes to when a chunk's payload bytes exceed
    2 GiB, the normal case for audio columns at production block sizes);
    reading large offsets as int32 would silently yield garbage spans.
    Sliced chunks (non-zero ``ch.offset``) are honored: the offsets view
    starts at the slice and its values index the UNsliced data buffer.
    """
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out = []
    for ch in chunks:
        if pa.types.is_large_binary(ch.type) or pa.types.is_large_string(ch.type):
            odtype, owidth = np.int64, 8
        elif pa.types.is_binary(ch.type) or pa.types.is_string(ch.type):
            odtype, owidth = np.int32, 4
        else:
            raise TypeError(
                f"binary_column_buffers: unsupported column type {ch.type}")
        offsets = np.frombuffer(ch.buffers()[1], dtype=odtype,
                                count=len(ch) + 1, offset=ch.offset * owidth)
        data_buf = ch.buffers()[2]
        data = (np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None
                else np.empty(0, dtype=np.uint8))
        valid = np.asarray(ch.is_valid())
        out.append((data, offsets, valid))
    return out


def decode_rows(bytes_col, codec_col) -> list[np.ndarray | None]:
    """Decode each row's bytes to float32 PCM in [-1, 1); None for null/unknown.

    Used for the sampled per-row PCM audit and tests; the streaming pipeline
    uses :func:`decode_stats` instead (it never materializes per-row PCM
    beyond the batch).
    """
    out: list[np.ndarray | None] = []
    codecs = codec_col.to_pylist() if not isinstance(codec_col, list) else codec_col
    raw = bytes_col.to_pylist() if not isinstance(bytes_col, list) else bytes_col
    for b, c in zip(raw, codecs):
        if b is None or c not in CODEC_BPS:
            out.append(None)
            continue
        out.append(decode_one(b, c))
    return out


def iter_decoded(batch: pa.Table):
    """Yield ``(row_index, float32 PCM | None)`` per row of a clip table,
    decoding straight from zero-copy Arrow buffer views. ``to_pylist`` on
    the binary column materializes EVERY payload as Python bytes first —
    a full copy of the audio at ~25 ms/MB of fresh pages in this cgroup,
    often costlier than the decode itself. None for null bytes / unknown
    codec. Same per-row decode kernel (``_decode_span``) as the batch
    transforms, so results are bit-identical to ``decode_one``."""
    codec_np = np.asarray(batch["codec"].to_pandas(), dtype=object)
    row_base = 0
    for data, offsets, valid in binary_column_buffers(batch["bytes"]):
        for i in range(len(offsets) - 1):
            r = row_base + i
            codec = codec_np[r]
            if not valid[i] or codec not in CODEC_BPS:
                yield r, None
            else:
                yield r, _decode_span(data, int(offsets[i]),
                                      int(offsets[i + 1]), codec)
        row_base += len(offsets) - 1


DROPOUT_THRESHOLD = 1e-3  # |sample| below this counts as dead air (same
                          # level as decode_stats' silence_frac)


def dropout_stats(batch: pa.Table, *, min_run_ms: int = 20) -> dict:
    """Per-clip dropout detection: runs of consecutive near-zero samples
    lasting ≥ ``min_run_ms`` (dead air from packet loss / recording
    faults — a keep/drop quality signal the amplitude stats miss, since a
    clip can have healthy RMS around a dropped span). Vectorized per clip:
    one diff over the below-threshold mask yields every zero-run's start
    and length. Returns arrays ``n_dropouts`` (runs ≥ min), ``max_run_ms``
    (longest run, any length), ``dropout_frac`` (fraction of samples
    inside qualifying runs); 0/NaN for undecodable rows."""
    n = batch.num_rows
    sr = np.asarray(batch["sr_hz"].to_pandas(), dtype=np.float64)
    n_drop = np.zeros(n, dtype=np.int64)
    max_run_ms = np.zeros(n, dtype=np.float64)
    frac = np.full(n, np.nan, dtype=np.float64)
    for r, x in iter_decoded(batch):
        if x is None or len(x) == 0 or not np.isfinite(sr[r]) or sr[r] <= 0:
            continue
        m = np.abs(x) < DROPOUT_THRESHOLD
        d = np.diff(np.concatenate([[0], m.view(np.int8), [0]]))
        starts = np.flatnonzero(d == 1)
        runs = np.flatnonzero(d == -1) - starts
        min_run = max(1, int(sr[r] * min_run_ms / 1000.0))
        sel = runs >= min_run
        n_drop[r] = int(sel.sum())
        max_run_ms[r] = float(runs.max()) * 1000.0 / sr[r] if len(runs) \
            else 0.0
        frac[r] = float(runs[sel].sum()) / len(x)
    return {"n_dropouts": n_drop, "max_run_ms": max_run_ms,
            "dropout_frac": frac}


def decode_one(b: bytes, codec: str) -> np.ndarray:
    # ONE temporary per clip: G.711 decodes as a single float32 LUT gather,
    # pcm16 as frombuffer view → f32 cast scaled in place. Bit-identical to
    # the previous int32→f64-divide→f32 chain (int16 values are exact in
    # f32; ÷2¹⁵ is a power-of-two scale, exact in both precisions) but
    # skips two full-length intermediates — fresh page touches are ~25 ms/MB
    # in this cgroup, and VAD/trim/fingerprint queries decode every clip.
    if codec == "pcm16":
        n = len(b) - (len(b) % 2)
        pcm = np.frombuffer(b, dtype="<i2", count=n // 2).astype(np.float32)
        pcm *= np.float32(1.0 / 32768.0)
        return pcm
    if codec == "ulaw":
        return _F32_ULAW[np.frombuffer(b, dtype=np.uint8)]
    if codec == "alaw":
        return _F32_ALAW[np.frombuffer(b, dtype=np.uint8)]
    raise ValueError(codec)  # pragma: no cover - guarded by caller


# float32 decoded values per byte: G.711 decode = one 256-entry LUT gather
_F32_ULAW = (ULAW_TABLE.astype(np.float32) / np.float32(32768.0))
_F32_ALAW = (ALAW_TABLE.astype(np.float32) / np.float32(32768.0))

FFT_CAP = 1 << 17  # spectral features use the first FFT_CAP samples (≈ full clip)


def decode_stats(batch: pa.Table, *, spectral: bool = True) -> dict[str, np.ndarray]:
    """Per-clip audio stats (``n_samples:int64, rms:float64``; 0/NaN for null
    bytes or unknown codec) over a whole Arrow batch.

    ``spectral=False`` skips the FFT features (centroid/flatness stay NaN):
    the rfft is ~2/3 of this kernel's time AND its dominant memory traffic,
    and memory bandwidth is the resource that stops scaling first on a
    many-core node — stages that don't consume the spectral columns (the
    flagship keep/drop rules, the audio_stats query) must not pay for them.

    Implementation note: each row is one C-level numpy reduction over its
    10–100 KB slice of the column's contiguous data buffer (zero-copy view).
    Peak temporaries are O(one row), NOT O(batch) — an earlier whole-batch
    gather built ~16 B of index/float temporaries per audio byte, and the
    resulting multi-GB concurrent allocations across a worker pool collapsed
    into kernel mmap/page-accounting contention (measured 60 s/batch vs
    0.3 s). The per-row loop is ~5 µs of Python overhead per row against
    ~100 µs of numpy work — vectorization lives inside the row.
    """
    n = batch.num_rows
    n_samples = np.zeros(n, dtype=np.int64)
    sumsq = np.full(n, np.nan, dtype=np.float64)
    clip_frac = np.full(n, np.nan, dtype=np.float64)
    silence_frac = np.full(n, np.nan, dtype=np.float64)
    centroid = np.full(n, np.nan, dtype=np.float64)
    flatness = np.full(n, np.nan, dtype=np.float64)
    codec_np = np.asarray(batch["codec"].to_pandas(), dtype=object)

    row_base = 0
    for data, offsets, valid in binary_column_buffers(batch["bytes"]):
        chunk_rows = len(offsets) - 1
        for i in range(chunk_rows):
            codec = codec_np[row_base + i]
            if not valid[i] or codec not in CODEC_BPS:
                continue
            s, e = int(offsets[i]), int(offsets[i + 1])
            if codec == "pcm16":
                e = s + ((e - s) // 2) * 2
                if e <= s:
                    continue
                raw = data[s:e]
                if s % 2:  # realign the rare odd-offset row with a tiny copy
                    raw = np.frombuffer(raw.tobytes(), dtype=np.uint8)
                pcm = raw.view("<i2").astype(np.float32)
                pcm /= np.float32(32768.0)
            else:
                table = _F32_ULAW if codec == "ulaw" else _F32_ALAW
                pcm = table[data[s:e]]
            r = row_base + i
            k = len(pcm)
            n_samples[r] = k
            if k == 0:
                continue
            # float32 throughout: the decode/feature path is memory-bandwidth
            # bound across a full worker pool — float64 doubles the traffic
            # for no fidelity gain at 16-bit source depth
            a = np.abs(pcm)
            sumsq[r] = float(a @ a)
            clip_frac[r] = float(np.count_nonzero(a >= CLIP_LEVEL[codec])) / k
            silence_frac[r] = float(np.count_nonzero(a < 1e-3)) / k
            if not spectral:
                continue
            # spectral quality features over the first FFT_CAP samples
            # (centroid normalized 0..1, log-spectral flatness); zero-pad to
            # the next power of two — pocketfft's awkward-length paths cost
            # several× more for no feature benefit
            n_fft_in = min(k, FFT_CAP)
            n_fft = 1 << (n_fft_in - 1).bit_length()
            spec = np.abs(np.fft.rfft(pcm[:n_fft_in], n=n_fft))
            power = spec * spec + np.float32(1e-12)
            freqs = np.arange(len(power), dtype=np.float32)
            centroid[r] = float((freqs @ power) / (power.sum() * max(len(power) - 1, 1)))
            flatness[r] = float(np.exp(np.mean(np.log(power))) / np.mean(power))
        row_base += chunk_rows

    rms = np.sqrt(sumsq / np.maximum(n_samples, 1))
    return {"n_samples": n_samples, "rms": rms, "clip_frac": clip_frac,
            "silence_frac": silence_frac, "spectral_centroid": centroid,
            "spectral_flatness": flatness}


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """10·log10(‖ref‖² / ‖ref−test‖²); inf when identical."""
    ref = np.asarray(ref, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    noise = float(np.sum((ref - test) ** 2))
    if noise == 0.0:
        return float("inf")
    sig = float(np.sum(ref**2))
    return 10.0 * np.log10(sig / noise) if sig > 0 else float("-inf")


# ---- transform kernels (ad-hoc audio stages; not in the flagship rule set) ----

def resample_linear(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resample of float PCM. Vectorized: one
    ``np.interp`` over the target time grid; O(row) temporaries (the
    sandbox memcg constraint — see decode_stats note)."""
    if sr_in == sr_out or len(pcm) == 0:
        return np.asarray(pcm, dtype=np.float32)
    n_out = int(round(len(pcm) * sr_out / sr_in))
    if n_out <= 0:
        return np.empty(0, dtype=np.float32)
    t_out = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    return np.interp(t_out, np.arange(len(pcm), dtype=np.float64),
                     np.asarray(pcm, dtype=np.float64)).astype(np.float32)


def frame_energies(pcm: np.ndarray, frame: int = 400, hop: int = 160) -> np.ndarray:
    """Per-frame RMS energies (frame/hop in samples), vectorized via a
    cumulative-sum-of-squares difference — no strided copies."""
    x = np.asarray(pcm)
    # square straight into float64 (one ufunc, one temporary) instead of
    # casting the whole clip to f64 first and squaring that copy —
    # bit-identical (each f32 value converts exactly to f64 either way)
    xsq = np.multiply(x, x, dtype=np.float64)
    if len(x) < frame:
        return (np.sqrt(np.mean(xsq))[None] if len(x) else
                np.empty(0, dtype=np.float64))
    csq = np.concatenate([[0.0], np.cumsum(xsq)])
    starts = np.arange(0, len(x) - frame + 1, hop)
    sums = csq[starts + frame] - csq[starts]
    return np.sqrt(sums / frame)


def snr_estimate_db(pcm: np.ndarray, sr: int, *, frame_ms: int = 25,
                    hop_ms: int = 10) -> float:
    """Blind per-clip SNR estimate: 20·log10(p95 / p10) of frame RMS
    energies — loud (speech) frames over the noise floor. NaN when the
    clip yields no frames or the floor is zero (pure digital silence has
    no defined SNR). Shares ``frame_energies``; the harness gate replays
    with an independent audioop decode + direct numpy quantiles."""
    if len(pcm) == 0 or not sr or sr <= 0:
        return float("nan")
    e = frame_energies(pcm, frame=int(sr * frame_ms / 1000),
                       hop=int(sr * hop_ms / 1000))
    if len(e) == 0:
        return float("nan")
    hi = float(np.quantile(e, 0.95))
    lo = float(np.quantile(e, 0.10))
    if lo <= 0.0:
        return float("nan")
    return float(20.0 * np.log10(hi / lo))


def snr_stats(batch: pa.Table) -> dict:
    """Vectorized-over-rows per-clip SNR estimates (decode per row from
    zero-copy buffer views, one cumsum pass per clip)."""
    n = batch.num_rows
    sr = np.asarray(batch["sr_hz"].to_pandas(), dtype=np.float64)
    out = np.full(n, np.nan, dtype=np.float64)
    for r, x in iter_decoded(batch):
        if x is not None and np.isfinite(sr[r]):
            out[r] = snr_estimate_db(x, int(sr[r]))
    return {"snr_db": out}


def speech_ratio(pcm: np.ndarray, sr: int, *, threshold_db: float = -35.0,
                 frame_ms: int = 25, hop_ms: int = 10) -> float:
    """Energy-gate VAD: fraction of frames whose RMS exceeds
    ``threshold_db`` relative to full scale. A deterministic, model-free
    speech-activity proxy (public energy-gating technique)."""
    frame = max(int(sr * frame_ms / 1000), 1)
    hop = max(int(sr * hop_ms / 1000), 1)
    e = frame_energies(pcm, frame=frame, hop=hop)
    if len(e) == 0:
        return float("nan")
    gate = 10.0 ** (threshold_db / 20.0)
    return float(np.count_nonzero(e > gate)) / len(e)


def vad_segments(pcm: np.ndarray, sr: int, *, threshold_db: float = -35.0,
                 frame_ms: int = 25, hop_ms: int = 10,
                 min_gap_frames: int = 3,
                 min_seg_frames: int = 2) -> list[tuple[int, int]]:
    """Speech segments as (start_ms, end_ms): energy-gate VAD frames, merge
    gaps shorter than ``min_gap_frames``, drop segments shorter than
    ``min_seg_frames``. Vectorized: one framing pass + numpy run-length
    boundary arithmetic — no per-frame Python."""
    frame = max(int(sr * frame_ms / 1000), 1)
    hop = max(int(sr * hop_ms / 1000), 1)
    e = frame_energies(pcm, frame=frame, hop=hop)
    if len(e) == 0:
        return []
    gate = 10.0 ** (threshold_db / 20.0)
    active = e > gate
    if not active.any():
        return []
    # run boundaries over the active mask
    d = np.diff(active.astype(np.int8))
    starts = list(np.flatnonzero(d == 1) + 1)
    ends = list(np.flatnonzero(d == -1) + 1)
    if active[0]:
        starts.insert(0, 0)
    if active[-1]:
        ends.append(len(active))
    segs = list(zip(starts, ends))
    # merge short gaps
    merged: list[list[int]] = []
    for s, t in segs:
        if merged and s - merged[-1][1] < min_gap_frames:
            merged[-1][1] = t
        else:
            merged.append([s, t])
    out = []
    for s, t in merged:
        if t - s >= min_seg_frames:
            start_ms = int(s * hop * 1000 / sr)
            end_ms = int(((t - 1) * hop + frame) * 1000 / sr)
            out.append((start_ms, end_ms))
    return out


# ---- encoders (datagen-side; not in the hot path) ----

def encode_pcm16(x: np.ndarray) -> bytes:
    pcm = np.clip(np.rint(np.asarray(x) * 32767.0), -32768, 32767).astype("<i2")
    return pcm.tobytes()


def encode(x: np.ndarray, codec: str) -> bytes:
    pcm_bytes = encode_pcm16(x)
    if codec == "pcm16":
        return pcm_bytes
    import audioop  # stdlib in py≤3.12; datagen-only dependency

    if codec == "ulaw":
        return audioop.lin2ulaw(pcm_bytes, 2)
    if codec == "alaw":
        return audioop.lin2alaw(pcm_bytes, 2)
    raise ValueError(codec)


# ---- transform kernels: loudness + trimming (engine-side, audioop-free) ----

def normalize_loudness_batch(batch: pa.Table, *, target_rms: float = 0.1,
                             max_gain: float = 100.0) -> pa.Table:
    """Gain every clip to ``target_rms`` (clipping-safe) and STANDARDIZE the
    codec to pcm16 — the usual 'make the corpus uniform' preprocessing step
    before ASR training. Per-row O(row) temporaries (same memory contract as
    decode_stats).

    Rows that cannot be decoded (null bytes, unknown codec) KEEP their
    original bytes and codec untouched — a transform must never silently
    destroy payloads it does not understand; silent decodable rows
    re-encode unchanged. ``gain_db`` is NaN wherever no gain was applied.

    Output columns: ``bytes`` (pcm16 for transformed rows, original
    otherwise), ``codec`` ('pcm16' or the original), ``gain_db``."""
    n = batch.num_rows
    codec_np = np.asarray(batch["codec"].to_pandas(), dtype=object)
    gain_db = np.full(n, np.nan, dtype=np.float64)
    out_bytes: list = [None] * n
    touched = np.zeros(n, dtype=bool)

    row_base = 0
    for data, offsets, valid in binary_column_buffers(batch["bytes"]):
        for i in range(len(offsets) - 1):
            r = row_base + i
            codec = codec_np[r]
            if not valid[i] or codec not in CODEC_BPS:
                continue  # undecodable: original bytes+codec pass through
            pcm = _decode_span(data, int(offsets[i]), int(offsets[i + 1]),
                               codec)
            touched[r] = True
            if pcm is None or len(pcm) == 0:
                out_bytes[r] = b""
                continue
            rms = float(np.sqrt(np.mean(np.square(pcm, dtype=np.float64))))
            if rms <= 0.0:
                out_bytes[r] = encode_pcm16(pcm)
                continue
            g = min(target_rms / rms, max_gain)
            gain_db[r] = 20.0 * np.log10(g)
            out_bytes[r] = encode_pcm16(np.clip(pcm * g, -1.0, 1.0))
        row_base += len(offsets) - 1

    return (_replace_payload(batch, out_bytes, touched)
            .append_column("gain_db", pa.array(gain_db, type=pa.float64())))


def _replace_payload(batch: pa.Table, out_bytes: list,
                     touched: np.ndarray) -> pa.Table:
    """Swap in transformed pcm16 bytes where ``touched``; preserve the
    original bytes and codec everywhere else."""
    if touched.all():
        # common case (every row decodable): skip materializing the original
        # payloads — to_pylist would copy the whole audio column for rows
        # whose bytes are all being replaced anyway
        merged_b = out_bytes
        merged_c = ["pcm16"] * len(out_bytes)
    else:
        orig_b = batch["bytes"].to_pylist()
        orig_c = batch["codec"].to_pylist()
        merged_b = [ob if t else o
                    for ob, o, t in zip(out_bytes, orig_b, touched)]
        merged_c = ["pcm16" if t else o for o, t in zip(orig_c, touched)]
    return (batch.drop_columns(["bytes", "codec"])
            .append_column("bytes", pa.array(merged_b, type=pa.binary()))
            .append_column("codec", pa.array(merged_c, type=pa.string())))


def chunk_clips_batch(batch: pa.Table, *, chunk_s: float = 10.0) -> pa.Table:
    """Split every clip into ≤``chunk_s``-second segments by slicing the
    ENCODED payload on sample boundaries — no decode at all: every
    supported codec is fixed bytes-per-sample with no framing
    (``CODEC_BPS``), so a byte slice IS a valid clip of the same codec.
    This is the flat_map that turns long recordings into training-length
    rows; concatenating a clip's chunks in ``chunk_idx`` order reproduces
    its payload byte-for-byte (trimmed to whole samples — pytest pins the
    round-trip). Undecodable rows (null bytes, unknown codec, missing sr)
    emit NOTHING (the filter stage upstream owns rejects). Output rows:
    (clip_id, chunk_idx, start_sample, n_samples, bytes, codec, sr_hz)."""
    ids, idxs, starts, nsamps, blobs, codecs, srs = [], [], [], [], [], [], []
    codec_np = np.asarray(batch["codec"].to_pandas(), dtype=object)
    sr_np = np.asarray(batch["sr_hz"].to_pandas(), dtype=object)
    id_np = batch["clip_id"].to_pylist()
    row_base = 0
    for data, offsets, valid in binary_column_buffers(batch["bytes"]):
        for i in range(len(offsets) - 1):
            r = row_base + i
            codec, sr = codec_np[r], sr_np[r]
            if not valid[i] or codec not in CODEC_BPS or not sr or sr != sr:
                continue
            bps = CODEC_BPS[codec]
            raw = data[int(offsets[i]):int(offsets[i + 1])]
            n = len(raw) // bps  # whole samples only
            step = max(int(chunk_s * int(sr)), 1)
            for ci, s in enumerate(range(0, n, step)):
                e = min(s + step, n)
                ids.append(id_np[r])
                idxs.append(ci)
                starts.append(s)
                nsamps.append(e - s)
                blobs.append(raw[s * bps:e * bps].tobytes())
                codecs.append(codec)
                srs.append(int(sr))
        row_base += len(offsets) - 1
    return pa.table({
        "clip_id": pa.array(ids, batch["clip_id"].type),
        "chunk_idx": pa.array(idxs, pa.int64()),
        "start_sample": pa.array(starts, pa.int64()),
        "n_samples": pa.array(nsamps, pa.int64()),
        "bytes": pa.array(blobs, pa.binary()),
        "codec": pa.array(codecs, pa.string()),
        "sr_hz": pa.array(srs, pa.int64())})


def resample_batch(batch: pa.Table, *, sr_out: int = 16000) -> pa.Table:
    """Sample-rate conversion to a uniform target rate (``resample_linear``
    — one vectorized np.interp per clip) and STANDARDIZE to pcm16@sr_out:
    the 'make the corpus one sample rate' preprocessing step before
    feature extraction / ASR training. Per-row O(row) temporaries (same
    memory contract as decode_stats).

    Same pass-through contract as normalize_loudness_batch: rows that
    cannot be decoded (null bytes, unknown codec, missing sr) keep their
    original bytes/codec untouched; clips already at ``sr_out`` re-encode
    to pcm16 without interpolation (resample_linear's identity path).

    Output columns: ``bytes``/``codec`` (pcm16 where transformed),
    ``sr_hz`` (= sr_out where transformed, original otherwise),
    ``in_samples``/``out_samples`` (-1 where untouched), ``out_rms``
    (double RMS of the resampled float signal; NaN where untouched or
    empty — the cheap scalar a correctness gate can recompute
    independently)."""
    n = batch.num_rows
    codec_np = np.asarray(batch["codec"].to_pandas(), dtype=object)
    sr_np = np.asarray(batch["sr_hz"].to_pandas(), dtype=object)
    out_bytes: list = [None] * n
    touched = np.zeros(n, dtype=bool)
    in_samples = np.full(n, -1, dtype=np.int64)
    out_samples = np.full(n, -1, dtype=np.int64)
    out_rms = np.full(n, np.nan, dtype=np.float64)

    row_base = 0
    for data, offsets, valid in binary_column_buffers(batch["bytes"]):
        for i in range(len(offsets) - 1):
            r = row_base + i
            codec, sr = codec_np[r], sr_np[r]
            # `sr != sr` catches NaN (null sr_hz arrives as float NaN via
            # the pandas view) — `not NaN` is False, so it needs its own arm
            if not valid[i] or codec not in CODEC_BPS or not sr or sr != sr:
                continue  # undecodable: original payload passes through
            pcm = _decode_span(data, int(offsets[i]), int(offsets[i + 1]),
                               codec)
            touched[r] = True
            in_samples[r] = 0 if pcm is None else len(pcm)
            if pcm is None or len(pcm) == 0:
                out_bytes[r] = b""
                out_samples[r] = 0
                continue
            y = resample_linear(pcm, int(sr), sr_out)
            out_samples[r] = len(y)
            if len(y):
                out_rms[r] = float(np.sqrt(np.mean(
                    np.square(y, dtype=np.float64))))
            out_bytes[r] = encode_pcm16(y)
        row_base += len(offsets) - 1

    out = _replace_payload(batch, out_bytes, touched)
    sr_col = np.asarray(
        [sr_out if t else (int(s) if (s and s == s) else 0)
         for s, t in zip(sr_np, touched)], dtype=np.int64)
    out = out.drop_columns(["sr_hz"]) if "sr_hz" in out.column_names else out
    return (out.append_column("sr_hz", pa.array(sr_col, type=pa.int64()))
            .append_column("in_samples", pa.array(in_samples, type=pa.int64()))
            .append_column("out_samples", pa.array(out_samples, type=pa.int64()))
            .append_column("out_rms", pa.array(out_rms, type=pa.float64())))


def trim_silence_batch(batch: pa.Table, *, threshold_db: float = -35.0,
                       sr_col: str = "sr_hz") -> pa.Table:
    """Strip leading/trailing silence using the SAME energy-gate framing as
    vad_segments (one source of truth for 'speech'): keep the span from the
    first active segment's start to the last one's end; all-silent clips
    become empty. Transformed output is standardized pcm16; undecodable rows
    (null bytes, unknown codec, sr<=0) keep their original bytes and codec
    with NaN trim columns, and clips TOO SHORT to frame (< 2 VAD frames)
    pass through untrimmed (0/0) rather than being misread as silence."""
    n = batch.num_rows
    codec_np = np.asarray(batch["codec"].to_pandas(), dtype=object)
    sr_np = np.asarray(batch[sr_col].to_pandas(), dtype="float64")
    start_ms = np.full(n, np.nan, dtype=np.float64)
    end_ms = np.full(n, np.nan, dtype=np.float64)
    out_bytes: list = [None] * n
    touched = np.zeros(n, dtype=bool)

    row_base = 0
    for data, offsets, valid in binary_column_buffers(batch["bytes"]):
        for i in range(len(offsets) - 1):
            r = row_base + i
            codec = codec_np[r]
            sr = sr_np[r]
            if not valid[i] or codec not in CODEC_BPS or not sr > 0:
                continue
            pcm = _decode_span(data, int(offsets[i]), int(offsets[i + 1]),
                               codec)
            if pcm is None:
                continue
            touched[r] = True
            dur_ms = len(pcm) * 1000.0 / sr
            frame = max(int(sr * 25 / 1000), 1)
            hop = max(int(sr * 10 / 1000), 1)
            if len(pcm) < frame + hop:  # < 2 frames: unanalyzable, keep all
                out_bytes[r] = encode_pcm16(pcm)
                start_ms[r] = 0.0
                end_ms[r] = 0.0
                continue
            segs = vad_segments(pcm, int(sr), threshold_db=threshold_db)
            if not segs:
                out_bytes[r] = b""
                start_ms[r] = dur_ms
                end_ms[r] = 0.0
                continue
            s_ms, e_ms = segs[0][0], segs[-1][1]
            s = int(s_ms * sr / 1000.0)
            e = min(int(np.ceil(e_ms * sr / 1000.0)), len(pcm))
            out_bytes[r] = encode_pcm16(pcm[s:e])
            start_ms[r] = s_ms
            end_ms[r] = max(dur_ms - e_ms, 0.0)
        row_base += len(offsets) - 1

    return (_replace_payload(batch, out_bytes, touched)
            .append_column("trim_start_ms", pa.array(start_ms))
            .append_column("trim_end_ms", pa.array(end_ms)))


def _decode_span(data: np.ndarray, s: int, e: int, codec: str):
    """Decode one row's byte span with the LUT/view kernels (float32)."""
    if codec == "pcm16":
        e = s + ((e - s) // 2) * 2
        if e <= s:
            return np.zeros(0, dtype=np.float32)
        raw = data[s:e]
        if s % 2:
            raw = np.frombuffer(raw.tobytes(), dtype=np.uint8)
        pcm = raw.view("<i2").astype(np.float32)
        pcm /= np.float32(32768.0)
        return pcm
    table = _F32_ULAW if codec == "ulaw" else _F32_ALAW
    return table[data[s:e]]


def audio_fingerprint_batch(batch: pa.Table, *, frame_ms: int = 50,
                            max_bits: int = 63,
                            sr_col: str = "sr_hz") -> pa.Table:
    """Codec-invariant audio content fingerprint (Chromaprint-lite): decode,
    frame into ``frame_ms`` windows, pack the SIGN OF THE FRAME-ENERGY DELTA
    of the first ``max_bits`` deltas into a uint64. Identical audio re-encoded
    through a different G.711 codec produces the same fingerprint (quantization
    noise is far below the energy-delta scale), unlike the byte-level content
    hash the flagship dedups on — this is the audio analogue of text
    near-dup fingerprints. Adds ``audio_fp`` (uint64) and ``fp_frames``
    (int32; cluster on the PAIR — sub-2-frame clips all hash to fp=0 and
    must not cross-match). Undecodable rows with non-null bytes (unknown
    codec, missing sample rate) fall back to a BYTE-level FNV hash with
    fp_frames = -1: byte-identical duplicates still co-cluster even when the
    payload can't be decoded; only null-bytes rows get fp null."""
    from data_quality_framework_ray.functions.hashing import fnv1a64
    n = batch.num_rows
    codec_np = np.asarray(batch["codec"].to_pandas(), dtype=object)
    sr_np = np.asarray(batch[sr_col].to_pandas(), dtype="float64")
    fps = np.zeros(n, dtype=np.uint64)
    nframes = np.zeros(n, dtype=np.int32)
    ok = np.zeros(n, dtype=bool)

    row_base = 0
    for data, offsets, valid in binary_column_buffers(batch["bytes"]):
        for i in range(len(offsets) - 1):
            r = row_base + i
            codec = codec_np[r]
            sr = sr_np[r]
            if not valid[i]:
                continue
            if codec not in CODEC_BPS or not sr > 0:
                raw = data[int(offsets[i]):int(offsets[i + 1])]
                fps[r] = np.uint64(fnv1a64(raw.tobytes()))
                nframes[r] = -1
                ok[r] = True
                continue
            pcm = _decode_span(data, int(offsets[i]), int(offsets[i + 1]),
                               codec)
            if pcm is None or len(pcm) == 0:
                continue
            frame = max(int(sr * frame_ms / 1000), 1)
            nf = len(pcm) // frame
            ok[r] = True
            nframes[r] = nf
            if nf < 2:
                continue  # fp stays 0; fp_frames disambiguates
            e = np.square(pcm[: nf * frame].astype(np.float64)
                          .reshape(nf, frame)).mean(axis=1)
            bits = (np.diff(e) > 0)[:max_bits]
            set_idx = np.flatnonzero(bits).astype(np.uint64)
            if len(set_idx):
                fps[r] = np.bitwise_or.reduce(np.uint64(1) << set_idx)
        row_base += len(offsets) - 1

    fp_col = pa.array([int(v) if o else None for v, o in zip(fps, ok)],
                      type=pa.uint64())
    nf_col = pa.array([int(v) if o else None for v, o in zip(nframes, ok)],
                      type=pa.int32())
    return (batch.append_column("audio_fp", fp_col)
            .append_column("fp_frames", nf_col))
