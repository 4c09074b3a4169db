"""Codec kernels vs the independent audioop oracle + the per-row PCM audit
(BASELINE.json input_hint: decoded-PCM allclose, SNR ≥ 30 dB)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_quality_framework_ray.functions import audio as A
from tests import oracle


def test_lut_tables_match_audioop_exactly():
    import audioop

    all_bytes = bytes(range(256))
    assert np.array_equal(np.frombuffer(audioop.ulaw2lin(all_bytes, 2), dtype="<i2"),
                          A.ULAW_TABLE)
    assert np.array_equal(np.frombuffer(audioop.alaw2lin(all_bytes, 2), dtype="<i2"),
                          A.ALAW_TABLE)


@pytest.mark.parametrize("codec", ["pcm16", "ulaw", "alaw"])
def test_roundtrip_snr(codec):
    rng = np.random.default_rng(7)
    x = 0.4 * np.sin(np.linspace(0, 300, 16000)) + 0.01 * rng.standard_normal(16000)
    dec = A.decode_one(A.encode(x, codec), codec)
    assert A.snr_db(x, dec) >= 30.0


def test_decode_stats_matches_per_row():
    rng = np.random.default_rng(3)
    rows = []
    for i in range(60):
        n = int(rng.integers(5, 400))
        x = 0.5 * np.sin(np.arange(n) * 0.1) + 0.01 * rng.standard_normal(n)
        codec = ["pcm16", "ulaw", "alaw"][i % 3]
        rows.append({"clip_id": str(i), "bytes": A.encode(x, codec), "codec": codec})
    rows.append({"clip_id": "null", "bytes": None, "codec": "pcm16"})
    rows.append({"clip_id": "unk", "bytes": b"abc", "codec": "opus"})
    t = pa.Table.from_pylist(rows)
    stats = A.decode_stats(t)
    for i, r in enumerate(rows):
        if r["bytes"] is None or r["codec"] not in A.CODEC_BPS:
            assert stats["n_samples"][i] == 0
            continue
        pcm = A.decode_one(r["bytes"], r["codec"]).astype(np.float64)
        assert stats["n_samples"][i] == len(pcm)
        # engine accumulates in float32 (bandwidth-bound path); 1e-6 relative
        # tolerance is far below any rule threshold's sensitivity
        assert abs(stats["rms"][i] - np.sqrt(np.mean(pcm**2))) < 1e-6


def test_decode_stats_multichunk_matches_singlechunk():
    """Regression: a bytes column split across multiple Arrow chunks must
    produce identical stats to the same rows in one chunk (the inner FFT
    length once shadowed the chunk row count, corrupting row_base)."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        n = int(rng.integers(5, 300))
        x = 0.4 * np.sin(np.arange(n) * 0.07) + 0.01 * rng.standard_normal(n)
        codec = ["pcm16", "ulaw", "alaw"][i % 3]
        rows.append({"clip_id": str(i), "bytes": A.encode(x, codec), "codec": codec})
    single = pa.Table.from_pylist(rows)
    # build a 4-chunk bytes column over the same rows
    parts = [pa.Table.from_pylist(rows[i:i + 10]) for i in range(0, 40, 10)]
    multi = pa.concat_tables(parts)
    assert multi["bytes"].num_chunks > 1
    s1 = A.decode_stats(single)
    s2 = A.decode_stats(multi)
    for key in s1:
        np.testing.assert_array_equal(
            np.isnan(s1[key]) if s1[key].dtype.kind == "f" else np.zeros(0),
            np.isnan(s2[key]) if s2[key].dtype.kind == "f" else np.zeros(0))
        np.testing.assert_allclose(
            np.nan_to_num(s1[key]), np.nan_to_num(s2[key]), rtol=0, atol=0)


def test_per_row_pcm_audit_vs_oracle(clips_dir):
    """Sampled per-row invariant: engine LUT decode vs independent audioop
    decode — allclose and SNR ≥ 30 dB (identical is expected)."""
    from data_quality_framework_ray.datagen.clips import fragment_paths

    t = pq.read_table(fragment_paths(clips_dir)[0])
    rng = np.random.default_rng(11)
    idx = rng.choice(t.num_rows, size=min(200, t.num_rows), replace=False)
    n_checked = 0
    for i in idx:
        codec = t["codec"][int(i)].as_py()
        b = t["bytes"][int(i)].as_py()
        if b is None or codec not in A.CODEC_BPS:
            continue
        ours = A.decode_one(b, codec).astype(np.float64)
        ref = oracle.decode_audioop(b, codec)
        assert len(ours) == len(ref)
        assert np.allclose(ours, ref, atol=1e-9)
        assert A.snr_db(ref, ours) >= 30.0
        n_checked += 1
    assert n_checked > 50


def test_resample_linear_tone():
    """Resampling a pure tone preserves frequency content: a 440 Hz tone at
    16 kHz resampled to 8 kHz still correlates >0.99 with an analytically
    generated 440 Hz tone at 8 kHz."""
    sr_in, sr_out, f = 16000, 8000, 440.0
    t_in = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f * t_in).astype(np.float32)
    y = A.resample_linear(x, sr_in, sr_out)
    assert len(y) == sr_out
    t_out = np.arange(sr_out) / sr_out
    ref = np.sin(2 * np.pi * f * t_out)
    corr = np.corrcoef(y, ref)[0, 1]
    assert corr > 0.99
    # identity + empty edge cases
    np.testing.assert_array_equal(A.resample_linear(x, sr_in, sr_in), x)
    assert len(A.resample_linear(np.empty(0), 8000, 16000)) == 0


def test_frame_energies_and_speech_ratio():
    sr = 16000
    rng = np.random.default_rng(4)
    speech = 0.3 * np.sin(np.arange(sr) * 0.2)          # 1 s loud
    silence = 0.0001 * rng.standard_normal(sr)           # 1 s near-silence
    clip = np.concatenate([speech, silence]).astype(np.float32)
    r = A.speech_ratio(clip, sr)
    assert 0.4 < r < 0.6  # about half the frames are speech
    assert A.speech_ratio(np.zeros(sr, dtype=np.float32), sr) == 0.0
    assert np.isnan(A.speech_ratio(np.empty(0, dtype=np.float32), sr))
    # cumulative-sum framing matches a naive loop
    e = A.frame_energies(clip, frame=400, hop=160)
    naive = [np.sqrt(np.mean(clip[s:s+400] ** 2))
             for s in range(0, len(clip) - 400 + 1, 160)]
    # cumsum-difference framing carries benign cancellation error (~1e-13
    # absolute) relative to the naive per-frame sum
    np.testing.assert_allclose(e, naive, rtol=1e-5, atol=1e-9)


def test_vad_segments_planted():
    """Planted speech/silence layout recovers the expected segments."""
    sr = 16000
    def tone(sec): return 0.3 * np.sin(np.arange(int(sr * sec)) * 0.2)
    def silence(sec): return np.zeros(int(sr * sec))
    clip = np.concatenate([silence(0.5), tone(1.0), silence(1.0),
                           tone(0.5), silence(0.3)]).astype(np.float32)
    segs = A.vad_segments(clip, sr)
    assert len(segs) == 2, segs
    (s0, e0), (s1, e1) = segs
    assert abs(s0 - 500) < 60 and abs(e0 - 1500) < 60
    assert abs(s1 - 2500) < 60 and abs(e1 - 3000) < 60
    # a short dropout inside speech merges into one segment
    clip2 = np.concatenate([tone(0.5), silence(0.015), tone(0.5)]).astype(np.float32)
    assert len(A.vad_segments(clip2, sr)) == 1
    assert A.vad_segments(np.zeros(sr, dtype=np.float32), sr) == []
    assert A.vad_segments(np.empty(0, dtype=np.float32), sr) == []


def test_spectral_features_flag_and_properties():
    """spectral=False must skip (NaN) only the FFT features; with
    spectral=True a pure tone has low flatness + a centroid matching its
    frequency, white noise has flatness near 1."""
    import numpy as np
    import pyarrow as pa

    from data_quality_framework_ray.functions import audio as A

    rng = np.random.default_rng(5)
    sr = 8000
    n = 4096
    tone = 0.5 * np.sin(2 * np.pi * 1000.0 * np.arange(n) / sr)
    noise = 0.3 * rng.standard_normal(n)
    t = pa.Table.from_pylist([
        {"clip_id": "tone", "bytes": A.encode(tone, "pcm16"), "codec": "pcm16"},
        {"clip_id": "noise", "bytes": A.encode(noise, "pcm16"), "codec": "pcm16"},
    ])
    full = A.decode_stats(t, spectral=True)
    fast = A.decode_stats(t, spectral=False)
    np.testing.assert_array_equal(full["n_samples"], fast["n_samples"])
    np.testing.assert_array_equal(full["rms"], fast["rms"])
    assert np.isnan(fast["spectral_centroid"]).all()
    assert np.isnan(fast["spectral_flatness"]).all()
    # tone: centroid ≈ 1000 Hz / (sr/2) = 0.25, near-zero flatness
    assert abs(full["spectral_centroid"][0] - 0.25) < 0.02
    assert full["spectral_flatness"][0] < 0.05
    # noise: flat spectrum
    assert full["spectral_flatness"][1] > 0.5


def test_normalize_loudness_batch_edges():
    import numpy as np
    import pyarrow as pa

    from data_quality_framework_ray.functions import audio as A

    x = 0.05 * np.sin(np.arange(2000) * 0.05)
    rows = [
        {"clip_id": "quiet", "bytes": A.encode(x, "ulaw"), "codec": "ulaw"},
        {"clip_id": "silent", "bytes": A.encode(np.zeros(100), "pcm16"),
         "codec": "pcm16"},
        {"clip_id": "null", "bytes": None, "codec": "pcm16"},
        {"clip_id": "unk", "bytes": b"ab", "codec": "opus"},
        {"clip_id": "empty", "bytes": b"", "codec": "pcm16"},
    ]
    out = A.normalize_loudness_batch(pa.Table.from_pylist(rows),
                                     target_rms=0.1)
    got = {r["clip_id"]: r for r in out.to_pylist()}
    # quiet clip: output decodes to RMS ≈ 0.1 and is pcm16
    y = A.decode_one(got["quiet"]["bytes"], "pcm16")
    assert abs(float(np.sqrt(np.mean(y.astype(np.float64) ** 2))) - 0.1) < 2e-3
    assert got["quiet"]["gain_db"] > 0 and got["quiet"]["codec"] == "pcm16"
    # silent: passthrough length, NaN gain
    assert len(got["silent"]["bytes"]) == 200
    assert got["silent"]["gain_db"] is None or np.isnan(got["silent"]["gain_db"])
    assert got["null"]["bytes"] is None and got["null"]["codec"] == "pcm16"
    # unknown codec: ORIGINAL bytes and codec preserved (no data loss)
    assert got["unk"]["bytes"] == b"ab" and got["unk"]["codec"] == "opus"
    assert got["empty"]["bytes"] == b"" and got["empty"]["codec"] == "pcm16"


def test_trim_silence_batch_bounds():
    import numpy as np
    import pyarrow as pa

    from data_quality_framework_ray.functions import audio as A

    sr = 8000
    sil = np.zeros(sr // 2)                      # 500 ms silence
    speech = 0.5 * np.sin(np.arange(sr) * 0.3)   # 1 s tone
    x = np.concatenate([sil, speech, sil])
    rows = [
        {"clip_id": "pad", "bytes": A.encode(x, "pcm16"), "codec": "pcm16",
         "sr_hz": sr},
        {"clip_id": "allsil", "bytes": A.encode(np.zeros(sr), "pcm16"),
         "codec": "pcm16", "sr_hz": sr},
    ]
    out = A.trim_silence_batch(pa.Table.from_pylist(rows))
    got = {r["clip_id"]: r for r in out.to_pylist()}
    p = got["pad"]
    assert 400 <= p["trim_start_ms"] <= 520  # ~500 ms each side
    assert 380 <= p["trim_end_ms"] <= 520
    y = A.decode_one(p["bytes"], "pcm16")
    # trimmed audio keeps (nearly) all the speech energy
    assert abs(len(y) - len(speech)) < sr // 5
    assert float(np.sqrt(np.mean(y.astype(np.float64) ** 2))) > 0.2
    a = got["allsil"]
    assert a["bytes"] == b"" and a["trim_end_ms"] == 0.0
    assert abs(a["trim_start_ms"] - 1000.0) < 1e-6


def test_trim_silence_short_and_undecodable_passthrough():
    import numpy as np
    import pyarrow as pa

    from data_quality_framework_ray.functions import audio as A

    sr = 8000
    short_loud = 0.5 * np.sin(np.arange(int(sr * 0.030)) * 0.3)  # 30 ms
    rows = [
        {"clip_id": "short", "bytes": A.encode(short_loud, "pcm16"),
         "codec": "pcm16", "sr_hz": sr},
        {"clip_id": "unk", "bytes": b"xyz", "codec": "opus", "sr_hz": sr},
    ]
    out = A.trim_silence_batch(pa.Table.from_pylist(rows))
    got = {r["clip_id"]: r for r in out.to_pylist()}
    s = got["short"]
    # too short to frame: untouched audio, zero trim — NOT misread as silence
    assert len(s["bytes"]) == 2 * len(short_loud)
    assert s["trim_start_ms"] == 0.0 and s["trim_end_ms"] == 0.0
    u = got["unk"]
    assert u["bytes"] == b"xyz" and u["codec"] == "opus"
    assert u["trim_start_ms"] is None or np.isnan(u["trim_start_ms"])


def test_audio_fingerprint_codec_invariance():
    """The SAME audio encoded as pcm16 vs ulaw must produce the SAME
    fingerprint (byte hashes differ — this is the property that makes the
    fingerprint an audio-content dedup key); different audio must differ."""
    import numpy as np
    import pyarrow as pa

    from data_quality_framework_ray.functions import audio as A

    rng = np.random.default_rng(21)
    sr = 8000
    x = 0.4 * np.sin(np.arange(sr * 2) * 0.05) \
        + 0.2 * np.sin(np.arange(sr * 2) * 0.013)
    y = 0.4 * rng.standard_normal(sr * 2)
    rows = [
        {"clip_id": "x_pcm", "bytes": A.encode(x, "pcm16"),
         "codec": "pcm16", "sr_hz": sr},
        {"clip_id": "x_ulaw", "bytes": A.encode(x, "ulaw"),
         "codec": "ulaw", "sr_hz": sr},
        {"clip_id": "x_alaw", "bytes": A.encode(x, "alaw"),
         "codec": "alaw", "sr_hz": sr},
        {"clip_id": "y_pcm", "bytes": A.encode(y, "pcm16"),
         "codec": "pcm16", "sr_hz": sr},
        {"clip_id": "undec", "bytes": b"opaque-bytes", "codec": "mp3",
         "sr_hz": sr},
        {"clip_id": "undec2", "bytes": b"opaque-bytes", "codec": "mp3",
         "sr_hz": sr},
        {"clip_id": "nul", "bytes": None, "codec": "pcm16", "sr_hz": sr},
    ]
    out = A.audio_fingerprint_batch(pa.Table.from_pylist(rows))
    got = {r["clip_id"]: (r["audio_fp"], r["fp_frames"])
           for r in out.to_pylist()}
    assert got["x_pcm"] == got["x_ulaw"] == got["x_alaw"]  # codec-invariant
    assert got["x_pcm"] != got["y_pcm"]                     # content-sensitive
    # byte-identical undecodables co-key with fp_frames = -1
    assert got["undec"] == got["undec2"] and got["undec"][1] == -1
    assert got["nul"] == (None, None)


def _mixed_clip_table(n: int = 24) -> pa.Table:
    """Mixed-codec batch with nulls, empties, odd lengths and unknown codecs
    — odd-length ulaw rows force later pcm16 spans to start at ODD byte
    offsets in the shared data buffer (the unaligned int16 view path)."""
    rng = np.random.default_rng(5)
    rows = []
    for i in range(n):
        codec = ["pcm16", "ulaw", "alaw"][i % 3]
        k = int(rng.integers(0, 301))  # includes length-0 payloads
        if i % 3 == 1:
            k |= 1  # odd ulaw byte length → misaligns the next span
        x = 0.4 * np.sin(np.arange(k) * 0.07 + i)
        rows.append({"clip_id": str(i), "bytes": A.encode(x, codec),
                     "codec": codec})
    rows.append({"clip_id": "null", "bytes": None, "codec": "pcm16"})
    rows.append({"clip_id": "unk", "bytes": b"xyz", "codec": "opus"})
    return pa.Table.from_pylist(rows)


def _assert_iter_matches_decode_rows(t: pa.Table):
    want = A.decode_rows(t["bytes"], t["codec"])
    got = dict(A.iter_decoded(t))
    assert len(got) == t.num_rows == len(want)
    for i, w in enumerate(want):
        if w is None:
            assert got[i] is None
        else:
            assert got[i].dtype == np.float32
            assert np.array_equal(got[i], w)


def test_iter_decoded_matches_decode_rows_mixed():
    _assert_iter_matches_decode_rows(_mixed_clip_table())


def test_iter_decoded_sliced_table():
    """Non-zero chunk offset: a sliced batch must honor ch.offset in both the
    offsets view and the validity mask (Parquet row-group slices and Ray
    block splits hand transforms sliced Arrow arrays routinely)."""
    t = _mixed_clip_table()
    _assert_iter_matches_decode_rows(t.slice(7, 13))


def test_iter_decoded_multichunk_row_base():
    t = _mixed_clip_table()
    chunked = pa.Table.from_batches(
        t.slice(0, 9).to_batches() + t.slice(9).to_batches())
    assert chunked.column("bytes").num_chunks >= 2
    _assert_iter_matches_decode_rows(chunked)


def test_iter_decoded_large_binary_offsets():
    """large_binary carries int64 offsets — what Arrow promotes binary
    columns to past 2 GiB per chunk. Reading them as int32 yields garbage
    spans; this pins the width switch in binary_column_buffers."""
    t = _mixed_clip_table()
    big = t.set_column(t.schema.get_field_index("bytes"), "bytes",
                       t["bytes"].cast(pa.large_binary()))
    _assert_iter_matches_decode_rows(big)
    # and the sliced large-offset path (8-byte stride into the offsets buf)
    _assert_iter_matches_decode_rows(big.slice(5, 11))


def test_binary_column_buffers_rejects_non_binary():
    arr = pa.array([b"abcd", b"efgh"], type=pa.binary(4))  # fixed-size
    with pytest.raises(TypeError):
        A.binary_column_buffers(arr)


def test_resample_batch_contract():
    """Pass-through for undecodable/NaN-sr rows; identity path at the
    target rate; counts/RMS/bytes consistent with a fresh np.interp."""
    t = _mixed_clip_table()
    srs = []
    for i in range(t.num_rows):
        srs.append([8000, 16000, 22050, None][i % 4])
    t = t.append_column("sr_hz", pa.array(
        [float(s) if s else None for s in srs], type=pa.float64()))
    out = A.resample_batch(t, sr_out=16000)
    assert out.num_rows == t.num_rows
    dec = A.decode_rows(t["bytes"], t["codec"])
    for r in range(t.num_rows):
        codec = t["codec"][r].as_py()
        sr = srs[r]
        x = dec[r]
        o_codec = out["codec"][r].as_py()
        if x is None or not sr:
            # untouched: original payload and codec, sentinel stats
            assert o_codec == codec
            assert out["bytes"][r].as_py() == t["bytes"][r].as_py()
            assert out["in_samples"][r].as_py() == -1
            assert out["out_samples"][r].as_py() == -1
            continue
        assert o_codec == "pcm16"
        assert out["in_samples"][r].as_py() == len(x)
        if len(x) == 0:
            assert out["out_samples"][r].as_py() == 0
            assert out["bytes"][r].as_py() == b""
            continue
        if sr == 16000:
            y = np.asarray(x, dtype=np.float64)  # identity: no interp
        else:
            n_out = int(round(len(x) * 16000 / sr))
            y = np.interp(np.arange(n_out) * (sr / 16000.0),
                          np.arange(len(x), dtype=np.float64),
                          np.asarray(x, dtype=np.float64))
        assert out["out_samples"][r].as_py() == len(y)
        b = out["bytes"][r].as_py()
        assert len(b) == 2 * len(y)
        got_rms = out["out_rms"][r].as_py()
        want_rms = float(np.sqrt(np.mean(y ** 2)))
        assert abs(got_rms - want_rms) < 1e-6  # float32 quantization slack
        # output sample rate column standardized where touched
        assert out["sr_hz"][r].as_py() == 16000


def test_chunk_clips_batch_roundtrip():
    """Byte-level reassembly, odd-offset slices (mixed codecs misalign the
    shared buffer), exact-boundary clips (n == k*step), and reject rows
    emitting nothing."""
    t = _mixed_clip_table()
    sr_col = [[8000, 16000, None][i % 3] for i in range(t.num_rows)]
    t = t.append_column("sr_hz", pa.array(
        [float(s) if s else None for s in sr_col], pa.float64()))
    out = A.chunk_clips_batch(t, chunk_s=0.01)  # tiny chunks -> many slices
    by_clip = {}
    for r in out.to_pylist():
        by_clip.setdefault(r["clip_id"], []).append(r)
    for i in range(t.num_rows):
        cid = t["clip_id"][i].as_py()
        bts = t["bytes"][i].as_py()
        codec = t["codec"][i].as_py()
        sr = sr_col[i]
        if bts is None or codec not in A.CODEC_BPS or not sr:
            assert cid not in by_clip
            continue
        bps = A.CODEC_BPS[codec]
        n = len(bts) // bps
        chunks = sorted(by_clip.get(cid, []), key=lambda r: r["chunk_idx"])
        if n == 0:
            assert chunks == []
            continue
        step = max(int(0.01 * sr), 1)
        assert len(chunks) == -(-n // step)  # ceil
        recon = b"".join(c["bytes"] for c in chunks)
        assert recon == bts[: n * bps]  # byte-exact, codec untouched
        assert all(c["codec"] == codec and c["sr_hz"] == sr for c in chunks)
        assert sum(c["n_samples"] for c in chunks) == n
