"""Deterministic synthetic clip-table generator (FIXTURES.md §1).

Writes a Lance-style fragment directory: ``frag_{k:05d}.parquet`` files + a
``manifest.json`` (fragment id → path, row count) + a hidden ``_truth.parquet``
sidecar recording which defect class was planted per clip (tests/oracle only —
the engine never reads it).

Everything is a pure function of ``(seed, frag_id)`` so fragments can be
generated independently (and in parallel via Ray tasks when a session exists)
with identical bytes either way.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from data_quality_framework_ray.datagen import corpora
from data_quality_framework_ray.functions import audio as audio_fn

CODECS = np.array(["pcm16", "ulaw", "alaw"])
CODEC_P = np.array([0.70, 0.25, 0.05])
SRS = np.array([8000, 16000, 22050, 44100])
SR_P = np.array([0.40, 0.40, 0.15, 0.05])
LANGS = np.array(["en", "fr", "de", "es", "it", "xx"])
LANG_P = np.array([0.57, 0.19, 0.10, 0.07, 0.04, 0.03])

DEFECTS = [
    "short_transcript", "long_transcript", "repetition", "symbol",
    "rate_mismatch", "corrupt_audio", "null_transcript", "null_sr",
    "bad_sr", "bad_dur", "pii", "toxicity", "codec_unknown", "duplicate",
]
CLEAN_P = 0.70  # remaining mass split evenly across DEFECTS

# bump when generation logic changes so cached /tmp tables regenerate
DATAGEN_VERSION = 2

SCHEMA = pa.schema([
    ("clip_id", pa.string()),
    ("bytes", pa.binary()),
    ("sr_hz", pa.int32()),
    ("dur_ms", pa.int32()),
    ("codec", pa.string()),
    ("transcript", pa.string()),
    ("frag_id", pa.int32()),
])


def _synth_audio(rng: np.random.Generator, n: int) -> np.ndarray:
    """Seeded harmonic mixture + noise, n samples in [-1, 1)."""
    k = np.arange(n)
    f1, f2 = rng.uniform(0.005, 0.05), rng.uniform(0.05, 0.3)
    x = (0.45 * np.sin(2 * np.pi * f1 * k)
         + 0.25 * np.sin(2 * np.pi * f2 * k)
         + 0.02 * rng.standard_normal(n))
    return np.clip(x, -0.999, 0.999)


def _pii_sentence(rng: np.random.Generator, base: str) -> str:
    kind = int(rng.integers(0, 4))
    if kind == 0:
        pii = f"user{int(rng.integers(1, 999))}@example.com"
    elif kind == 1:
        pii = f"+{int(rng.integers(1, 99))} {int(rng.integers(100, 999))} {int(rng.integers(100, 999))} {int(rng.integers(1000, 9999))}"
    elif kind == 2:
        pii = f"{int(rng.integers(100, 999))}-{int(rng.integers(10, 99))}-{int(rng.integers(1000, 9999))}"
    else:
        g = [str(int(rng.integers(1000, 9999))) for _ in range(4)]
        pii = " ".join(g)
    words = base.split()
    pos = int(rng.integers(0, len(words) + 1))
    return " ".join(words[:pos] + [pii] + words[pos:])


def generate_fragment(seed: int, frag_id: int, n_rows: int,
                      max_dur_s: float = 6.0) -> tuple[pa.Table, pa.Table]:
    """One fragment (clips table, truth table) — pure function of args.

    Duration is derived from transcript length at a plausible chars-per-second
    rate (8–35 cps, capped at ``max_dur_s``) so clean clips pass the rate rule;
    defect plants push specific rules out of range.
    """
    rng = np.random.default_rng([seed, frag_id])
    rows: list[dict] = []
    truth: list[dict] = []
    for i in range(n_rows):
        clip_id = f"clip_{frag_id:05d}_{i:07d}"
        lang = str(LANGS[rng.choice(len(LANGS), p=LANG_P)])
        codec = str(CODECS[rng.choice(len(CODECS), p=CODEC_P)])
        sr = int(SRS[rng.choice(len(SRS), p=SR_P)])
        transcript = corpora.sentence(lang, rng, int(rng.integers(3, 11)))
        defect = "clean"
        if rng.random() > CLEAN_P:
            defect = DEFECTS[int(rng.integers(0, len(DEFECTS)))]

        if defect == "duplicate" and rows:
            src = rows[int(rng.integers(0, len(rows)))]
            rows.append({**src, "clip_id": clip_id})
            truth.append({"clip_id": clip_id, "defect": "duplicate",
                          "lang_true": None, "dup_of": src["clip_id"]})
            continue

        if defect == "short_transcript":
            transcript = "ab"[: int(rng.integers(1, 3))]
        elif defect == "long_transcript":
            transcript = " ".join(corpora.sentence(lang, rng, 20) for _ in range(45))
            sr, codec = 8000, "ulaw"  # bound the buffer for the long clip
        elif defect == "repetition":
            w = corpora.sentence(lang, rng, 1)
            transcript = " ".join([w] * int(rng.integers(10, 30)))
        elif defect == "symbol":
            base = corpora.sentence(lang, rng, 4)
            transcript = base + " " + "#$%@!&*" * int(rng.integers(2, 6))
        elif defect == "null_transcript":
            transcript = None if rng.random() < 0.5 else "   "
        elif defect == "pii":
            transcript = _pii_sentence(rng, transcript)
        elif defect == "toxicity":
            words = transcript.split()
            tox = ["frak", "blargh", "drekk", "gorram", "smeg"][int(rng.integers(0, 5))]
            pos = int(rng.integers(0, len(words) + 1))
            transcript = " ".join(words[:pos] + [tox] + words[pos:])

        nchars = len(transcript) if transcript else 3
        cps = rng.uniform(8.0, 35.0)
        dur_s = min(nchars / cps, max_dur_s)
        if defect == "rate_mismatch":
            if rng.random() < 0.5:  # too slow: < 1 cps
                transcript = corpora.sentence(lang, rng, 2)[:10]
                dur_s = len(transcript) / rng.uniform(0.3, 0.8)
                sr, codec = 8000, "ulaw"
            else:  # too fast: > 50 cps
                dur_s = nchars / rng.uniform(60.0, 150.0)
        dur_ms = max(int(dur_s * 1000), 40)

        n = round(dur_ms * sr / 1000)
        x = _synth_audio(rng, n)
        enc_codec = codec if codec in audio_fn.CODEC_BPS else "pcm16"
        b = audio_fn.encode(x, enc_codec)

        if defect == "corrupt_audio":
            b = b[: int(len(b) * 0.7)]
        elif defect == "null_sr":
            sr = None
        elif defect == "bad_sr":
            sr = 12345
        elif defect == "bad_dur":
            dur_ms = int(rng.integers(-5, 1))
        elif defect == "codec_unknown":
            codec = "mp3"

        rows.append({"clip_id": clip_id, "bytes": b, "sr_hz": sr,
                     "dur_ms": dur_ms, "codec": codec,
                     "transcript": transcript, "frag_id": frag_id})
        truth.append({"clip_id": clip_id, "defect": defect,
                      "lang_true": lang, "dup_of": None})

    t = pa.Table.from_pylist(rows, schema=SCHEMA)
    tt = pa.Table.from_pylist(truth)
    return t, tt


def generate_clips(out_dir: str, n_clips: int, n_fragments: int, seed: int = 42,
                   max_dur_s: float = 6.0,
                   use_ray: bool = False) -> dict:
    """Write the fragment directory; returns the manifest dict. Idempotent:
    if a manifest with identical params exists, generation is skipped."""
    os.makedirs(out_dir, exist_ok=True)
    man_path = os.path.join(out_dir, "manifest.json")
    params = {"seed": seed, "n_clips": n_clips, "n_fragments": n_fragments,
              "max_dur_s": max_dur_s, "datagen_version": DATAGEN_VERSION}
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if man.get("params") == params:
            return man

    per = [n_clips // n_fragments + (1 if k < n_clips % n_fragments else 0)
           for k in range(n_fragments)]

    def write_frag(k: int) -> dict:
        t, tt = generate_fragment(seed, k, per[k], max_dur_s)
        path = os.path.join(out_dir, f"frag_{k:05d}.parquet")
        pq.write_table(t, path)
        pq.write_table(tt, os.path.join(out_dir, f"_truth_{k:05d}.parquet"))
        return {"frag_id": k, "path": os.path.basename(path), "num_rows": t.num_rows}

    frags: list[dict]
    if use_ray:
        import ray

        if not ray.is_initialized():  # never init from library code (driver contract)
            raise RuntimeError("use_ray=True requires an active Ray session")
        f = ray.remote(num_cpus=1)(lambda k: write_frag(k))
        frags = ray.get([f.remote(k) for k in range(n_fragments)])
    else:
        frags = [write_frag(k) for k in range(n_fragments)]

    man = {"params": params, "fragments": frags,
           "schema_version": 1, "truth_glob": "_truth_*.parquet"}
    with open(man_path, "w") as f:
        json.dump(man, f, indent=1)
    return man


def append_fragment(out_dir: str, n_rows: int, seed: int | None = None) -> dict:
    """Append ONE new fragment to an existing clip table (the Lance
    append-fragment analogue): writes frag_<N> + its truth file and extends
    the manifest in place. Existing fragments are untouched, so a resume-
    aware consumer reprocesses only the new fragment."""
    man_path = os.path.join(out_dir, "manifest.json")
    with open(man_path) as f:
        man = json.load(f)
    k = 1 + max(fr["frag_id"] for fr in man["fragments"])
    t, tt = generate_fragment(seed if seed is not None
                              else man["params"]["seed"], k, n_rows,
                              man["params"]["max_dur_s"])
    path = os.path.join(out_dir, f"frag_{k:05d}.parquet")
    pq.write_table(t, path)
    pq.write_table(tt, os.path.join(out_dir, f"_truth_{k:05d}.parquet"))
    man["fragments"].append({"frag_id": k, "path": os.path.basename(path),
                             "num_rows": t.num_rows})
    man["params"] = {**man["params"],
                     "n_clips": man["params"]["n_clips"] + t.num_rows,
                     "n_fragments": man["params"]["n_fragments"] + 1}
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, man_path)
    return man


def fragment_paths(out_dir: str) -> list[str]:
    with open(os.path.join(out_dir, "manifest.json")) as f:
        man = json.load(f)
    return [os.path.join(out_dir, fr["path"]) for fr in man["fragments"]]
