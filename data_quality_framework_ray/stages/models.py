"""Language-ID and perplexity models (SPEC.md "Language ID" / "Perplexity").

Built from scratch on public techniques only: a fastText-style hashed
char-n-gram multinomial model for language ID, and a KenLM-style char trigram
LM with stupid backoff for perplexity (``fasttext``/``kenlm`` are not
installable in this sandbox, SURVEY.md §7.0).

Training (``scripts/train_models.py``) is deterministic from the corpora seed
and serializes to ``models/langid.npz`` / ``models/charlm.npz``; the test
oracle loads the same npz but reimplements scoring independently. Scoring here
is fully numpy-vectorized over whole Arrow batches — no per-row Python.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from data_quality_framework_ray import config
from data_quality_framework_ray.functions.hashing import char_ngram_hashes, expand_ranges

_LOWER = None  # lazy polars import guard


def _lower(text: pa.ChunkedArray | pa.Array | list[str]) -> pa.Array:
    import polars as pl

    if isinstance(text, list):
        text = pa.array(text, type=pa.string())
    s = pl.from_arrow(pa.table({"t": text}))["t"].str.to_lowercase()
    arr = s.to_arrow()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


# ---------------- language ID ----------------

def langid_bucket_counts(texts, counts: np.ndarray) -> None:
    """Accumulate hashed n-gram bucket counts (in-place) for training."""
    low = _lower(texts)
    for n in range(1, config.LANGID_NGRAM_MAX + 1):
        h, _ = char_ngram_hashes(low, n)
        buckets = (h % np.uint64(config.LANGID_BUCKETS)).astype(np.int64)
        np.add.at(counts, buckets, 1)


def train_langid(corpus: dict[str, list[str]]) -> dict[str, np.ndarray]:
    langs = list(config.LANGID_CLASSES)
    B = config.LANGID_BUCKETS
    logp = np.zeros((len(langs), B), dtype=np.float64)
    for li, lang in enumerate(langs):
        counts = np.zeros(B, dtype=np.int64)
        langid_bucket_counts(corpus[lang], counts)
        logp[li] = np.log((counts + 1.0) / (counts.sum() + B))
    return {"langs": np.array(langs), "logp": logp.astype(np.float32)}


def langid_scores(texts, model: dict[str, np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Predict (lang_index int64, confidence float64) per row; empty rows get
    index -1 / NaN. Vectorized: one reduceat per n-gram order."""
    low = _lower(texts)
    logp = model["logp"].astype(np.float64)
    L = logp.shape[0]
    n_rows = len(low)
    scores = np.zeros((L, n_rows), dtype=np.float64)
    any_feat = np.zeros(n_rows, dtype=bool)
    for n in range(1, config.LANGID_NGRAM_MAX + 1):
        h, off = char_ngram_hashes(low, n)
        if len(h) == 0:
            continue
        buckets = (h % np.uint64(config.LANGID_BUCKETS)).astype(np.int64)
        lens = np.diff(off)
        rows = lens > 0
        starts = off[:-1][rows]
        vals = logp[:, buckets]  # (L, total_occurrences)
        scores[:, rows] += np.add.reduceat(vals, starts, axis=1)
        any_feat |= rows
    pred = np.argmax(scores, axis=0)
    m = scores.max(axis=0, keepdims=True)
    e = np.exp(scores - m)
    conf = e[pred, np.arange(n_rows)] / e.sum(axis=0)
    pred = np.where(any_feat, pred, -1)
    conf = np.where(any_feat, conf, np.nan)
    return pred.astype(np.int64), conf


# ---------------- char trigram LM ----------------

def build_alphabet(corpus_texts: list[str]) -> np.ndarray:
    """Most frequent ≤63 codepoints of the lowercased corpus (ties by
    codepoint), sorted ascending for searchsorted mapping."""
    all_cps = np.frombuffer("".join(corpus_texts).lower().encode("utf-32-le"), dtype=np.uint32)
    cps, counts = np.unique(all_cps, return_counts=True)
    order = np.lexsort((cps, -counts))
    keep = cps[order[: config.CHARLM_MAX_ALPHABET]]
    return np.sort(keep).astype(np.uint32)


def map_to_alphabet(cps: np.ndarray, alphabet: np.ndarray) -> np.ndarray:
    """Codepoints → indices 1..V-1, UNK=0 (SPEC 'Perplexity')."""
    pos = np.searchsorted(alphabet, cps)
    pos = np.minimum(pos, len(alphabet) - 1)
    return np.where(alphabet[pos] == cps, pos + 1, 0).astype(np.int64)


def train_charlm(sentences: list[str]) -> dict[str, np.ndarray]:
    alphabet = build_alphabet(sentences)
    V = len(alphabet) + 1
    c1 = np.zeros(V, dtype=np.int64)
    c2 = np.zeros((V, V), dtype=np.int64)
    c3 = np.zeros((V, V, V), dtype=np.int64)
    for s in sentences:  # train-time only; scoring is vectorized
        x = map_to_alphabet(np.frombuffer(s.lower().encode("utf-32-le"), dtype=np.uint32), alphabet)
        np.add.at(c1, x, 1)
        if len(x) >= 2:
            np.add.at(c2, (x[:-1], x[1:]), 1)
        if len(x) >= 3:
            np.add.at(c3, (x[:-2], x[1:-1], x[2:]), 1)
    N = float(c1.sum())
    alpha = config.CHARLM_BACKOFF
    p1 = np.where(c1 > 0, c1 / N, 0.5 / N)  # (V,)
    with np.errstate(divide="ignore", invalid="ignore"):
        p2 = np.where(c2 > 0, c2 / np.maximum(c1[:, None], 1), 0.0)  # p(c|b) = c2(b,c)/c1(b)
        back2 = np.where(c2 > 0, alpha * p2, (alpha ** 2) * p1[None, :])  # (V,V) indexed [b,c]
        p3 = np.where(c3 > 0, c3 / np.maximum(c2[:, :, None], 1), 0.0)
        logp3 = np.log(np.where(c3 > 0, p3, back2[None, :, :]))
    return {"alphabet": alphabet, "logp3": logp3.astype(np.float32)}


def perplexities(texts, model: dict[str, np.ndarray]) -> np.ndarray:
    """Per-row char-trigram perplexity (float64; NaN for rows with < 3 chars).
    Vectorized: one tensor gather + one reduceat per batch."""
    from data_quality_framework_ray.functions.hashing import _codepoint_rows

    low = _lower(texts)
    cps, offsets = _codepoint_rows(low)
    alphabet = model["alphabet"]
    logp3 = model["logp3"].astype(np.float64)
    x = map_to_alphabet(cps, alphabet)
    starts = offsets[:-1]
    lens = np.diff(offsets) - 1  # drop separator
    n_pred = np.maximum(lens - 2, 0)
    n_rows = len(lens)
    out = np.full(n_rows, np.nan, dtype=np.float64)
    total = int(n_pred.sum())
    if total == 0:
        return out
    idx = expand_ranges(starts, n_pred)  # first char of each trigram window
    lp = logp3[x[idx], x[idx + 1], x[idx + 2]]
    rows = n_pred > 0
    row_starts = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_pred, out=row_starts[1:])
    sums = np.add.reduceat(lp, row_starts[:-1][rows])
    out[rows] = np.exp(-sums / n_pred[rows])
    return out


# ---------------- persistence ----------------

def models_dir() -> str:
    return os.path.abspath(config.MODELS_DIR)


def save_models(langid: dict[str, np.ndarray], charlm: dict[str, np.ndarray], dirpath: str | None = None) -> None:
    d = dirpath or models_dir()
    os.makedirs(d, exist_ok=True)
    np.savez_compressed(os.path.join(d, "langid.npz"), **langid)
    np.savez_compressed(os.path.join(d, "charlm.npz"), **charlm)


_CACHE: dict[str, dict[str, np.ndarray]] = {}


def load_langid(dirpath: str | None = None) -> dict[str, np.ndarray]:
    d = dirpath or models_dir()
    key = "langid:" + d
    if key not in _CACHE:
        with np.load(os.path.join(d, "langid.npz")) as z:
            _CACHE[key] = {k: z[k] for k in z.files}
    return _CACHE[key]


def load_charlm(dirpath: str | None = None) -> dict[str, np.ndarray]:
    d = dirpath or models_dir()
    key = "charlm:" + d
    if key not in _CACHE:
        with np.load(os.path.join(d, "charlm.npz")) as z:
            _CACHE[key] = {k: z[k] for k in z.files}
    return _CACHE[key]
