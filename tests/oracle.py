"""Independent reference labeler (SPEC.md implemented twice — this side on
purpose shares NO code with the engine: plain Python/pandas/re/audioop row
loops, engine-side is vectorized numpy/polars/pyarrow inside Ray stages).

Only the serialized model *data* (models/*.npz) is shared, per SPEC.
Thresholds are deliberately re-hardcoded here; if SPEC.md changes, change
both sides.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

# ---- thresholds re-hardcoded from SPEC.md (do not import engine config) ----
LEN_MIN, LEN_MAX = 3, 5000
REP_MIN_TOKENS, REP_MAX = 5, 0.5
SYMBOL_MAX = 0.30
CPS_MIN, CPS_MAX = 1.0, 50.0
ALLOWED_SR = {8000, 16000, 22050, 44100}
BPS = {"pcm16": 2, "ulaw": 1, "alaw": 1}
ALLOW_LANGS = {"en", "fr", "de", "es"}
CONF_MIN = 0.60
PPL_MAX = 25.0
TOX = re.compile(r"\b(?:frak|blargh|drekk|gorram|smeg)\b", re.IGNORECASE)


def n_symbols(t: str) -> int:
    """SPEC symbol count: chars not (category L*/N*, '_', or Python ws)."""
    import unicodedata

    n = 0
    for c in t:
        if c == "_" or c.isspace() or c in "\x1c\x1d\x1e\x1f":
            continue
        if unicodedata.category(c)[0] in ("L", "N"):
            continue
        n += 1
    return n
PII = [
    (re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"), "<EMAIL>"),
    (re.compile(r"\b(?:\d[ -]?){15}\d\b"), "<CARD>"),
    (re.compile(r"\+\d{1,3}(?:[ -]\d{2,4}){2,4}\b"), "<PHONE>"),
    (re.compile(r"\b\d{3}-\d{2}-\d{4}\b"), "<SSN>"),
]
LANG_CLASSES = ["en", "fr", "de", "es", "it", "xx"]
BUCKETS = 32768
M61 = (1 << 61) - 1


def _ngram_bucket(cps: list[int]) -> int:
    h = 0
    for c in cps:
        h = (h * 31 + c) % M61
    return h % BUCKETS


def langid_score_one(text: str, logp: np.ndarray) -> tuple[int, float]:
    cps = [ord(c) for c in text.lower()]
    scores = np.zeros(logp.shape[0], dtype=np.float64)
    found = False
    for n in (1, 2, 3):
        for i in range(len(cps) - n + 1):
            scores += logp[:, _ngram_bucket(cps[i:i + n])]
            found = True
    if not found:
        return -1, float("nan")
    pred = int(np.argmax(scores))
    e = np.exp(scores - scores.max())
    return pred, float(e[pred] / e.sum())


def ppl_one(text: str, alphabet: np.ndarray, logp3: np.ndarray) -> float:
    amap = {int(cp): i + 1 for i, cp in enumerate(alphabet)}
    x = [amap.get(ord(c), 0) for c in text.lower()]
    if len(x) < 3:
        return float("nan")
    s = 0.0
    for t in range(2, len(x)):
        s += float(logp3[x[t - 2], x[t - 1], x[t]])
    return math.exp(-s / (len(x) - 2))


def decode_audioop(b: bytes, codec: str) -> np.ndarray:
    import audioop

    if codec == "pcm16":
        n = len(b) - (len(b) % 2)
        return np.frombuffer(b[:n], dtype="<i2").astype(np.float64) / 32768.0
    if codec == "ulaw":
        return np.frombuffer(audioop.ulaw2lin(b, 2), dtype="<i2").astype(np.float64) / 32768.0
    if codec == "alaw":
        return np.frombuffer(audioop.alaw2lin(b, 2), dtype="<i2").astype(np.float64) / 32768.0
    raise ValueError(codec)


def scrub_one(text: str) -> tuple[str, int]:
    cur, total = text, 0
    for rx, repl in PII:
        cur, n = rx.subn(repl, cur)
        total += n
    return cur, total


def label_clips(df: pd.DataFrame, models_dir: str) -> pd.DataFrame:
    """df columns: clip_id, bytes, sr_hz, dur_ms, codec, transcript.
    Returns the SPEC output table (plus nothing else)."""
    with np.load(f"{models_dir}/langid.npz") as z:
        logp = z["logp"].astype(np.float64)
    with np.load(f"{models_dir}/charlm.npz") as z:
        alphabet, logp3 = z["alphabet"], z["logp3"].astype(np.float64)

    # duplicate winners: min clip_id per exact (transcript, bytes) content
    key = list(zip(df["transcript"].map(lambda t: t if isinstance(t, str) else ""),
                   df["bytes"].map(lambda b: bytes(b) if b is not None else b"")))
    winners = pd.Series(df["clip_id"].values).groupby(pd.Series(key)).transform("min")
    is_dup = (winners.values != df["clip_id"].values)

    out = []
    for i, row in enumerate(df.itertuples(index=False)):
        reasons: list[str] = []
        t = row.transcript
        blank = t is None or (isinstance(t, str) and t.strip() == "")
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        dur = None if pd.isna(row.dur_ms) else int(row.dur_ms)
        b = bytes(row.bytes) if row.bytes is not None else None

        sr_ok = sr is not None and sr in ALLOWED_SR
        dur_ok = dur is not None and dur > 0
        codec_known = row.codec in BPS
        if not sr_ok:
            reasons.append("sr_range")
        if not dur_ok:
            reasons.append("dur_range")
        if not codec_known:
            reasons.append("codec_unknown")
        if sr_ok and dur_ok and codec_known:
            expected = round(dur * sr / 1000) * BPS[row.codec]
            if b is None or len(b) != expected:
                reasons.append("corrupt_audio")

        lang = None
        conf = float("nan")
        ppl = float("nan")
        scrubbed = None
        n_pii = 0
        if blank:
            reasons.append("null_transcript")
        else:
            nchars = len(t)
            toks = t.split()
            if nchars < LEN_MIN or nchars > LEN_MAX:
                reasons.append("length")
            if len(toks) >= REP_MIN_TOKENS and 1 - len(set(toks)) / len(toks) > REP_MAX:
                reasons.append("repetition")
            if nchars > 0 and n_symbols(t) / nchars > SYMBOL_MAX:
                reasons.append("symbol")
            if dur_ok:
                cps = nchars / (dur / 1000.0)
                if cps < CPS_MIN or cps > CPS_MAX:
                    reasons.append("rate_mismatch")
            if TOX.search(t):
                reasons.append("toxicity")
            pred, conf = langid_score_one(t, logp)
            lang = LANG_CLASSES[pred] if pred >= 0 else None
            if lang not in ALLOW_LANGS or not (conf >= CONF_MIN):
                reasons.append("lang")
            ppl = ppl_one(t, alphabet, logp3)
            if ppl > PPL_MAX:  # NaN never triggers
                reasons.append("perplexity")
            scrubbed, n_pii = scrub_one(t)

        if is_dup[i]:
            reasons.append("duplicate")

        reasons.sort()
        out.append({"clip_id": row.clip_id, "keep": len(reasons) == 0,
                    "drop_reasons": reasons, "lang": lang, "lang_conf": conf,
                    "ppl": ppl, "scrubbed_transcript": scrubbed, "n_pii": n_pii})
    return pd.DataFrame(out)
