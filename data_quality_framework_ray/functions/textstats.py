"""Vectorized text heuristics (SPEC.md "Rules" 2–5, toxicity).

Kernels run inside ``map_batches`` over Arrow batches; the heavy lifting is
polars (Rust, vectorized) operating zero-copy on the Arrow string column.
``POLARS_MAX_THREADS=1`` is pinned before polars import so each Ray worker
stays within its 1-CPU reservation (pool parallelism comes from Ray, not from
nested polars thread pools).

Reference parity: the reference's only text ops are lower/strip/empty-string
tests (SURVEY.md §2.8, /root/reference/core/quality_checks.py:465-467); the
rule set here is mandated by BASELINE.json north_rule.
"""

from __future__ import annotations

import os

os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import polars as pl
import pyarrow as pa

from data_quality_framework_ray import config

_TOX_RE = r"(?i)\b(?:" + "|".join(config.TOXICITY_LEXICON) + r")\b"

# Python str.split()/strip() whitespace = Unicode White_Space plus \x1c-\x1f;
# the token regex and the blank test must match it exactly (SPEC tokens =
# T.split(), blank = T.strip()==""; found by hypothesis counterexamples
# "0\x1f0" and "\x1f")
TOKEN_RE = r"[^\s\x1c-\x1f]+"
PY_WS_RE = r"[\s\x1c-\x1f]"
# SPEC symbol class, defined by Unicode general category so Python
# (unicodedata.category in the oracle) and Rust regex agree exactly —
# \w differs between the two engines on No/Nl digits and combining marks
SYMBOL_RE = r"[^\p{L}\p{N}_\s\x1c-\x1f]"


def text_stats(transcript: pa.ChunkedArray | pa.Array) -> dict[str, np.ndarray]:
    """Per-row stats for the rule stage.

    Returns int64/float64 numpy arrays: ``nchars, ntok, ndistinct, nsym,
    tox_hit, is_null_or_blank`` (stats are 0 for null rows; ``is_null_or_blank``
    flags NULL or whitespace-only).
    """
    s = pl.from_arrow(pa.table({"t": transcript}))["t"]
    null = s.is_null()
    t = s.fill_null("")
    toks = t.str.extract_all(TOKEN_RE)
    out = pl.DataFrame(
        {
            "nchars": t.str.len_chars(),
            "ntok": toks.list.len(),
            "ndistinct": toks.list.n_unique(),
            "nsym": t.str.count_matches(SYMBOL_RE),
            "tox_hit": t.str.contains(_TOX_RE),
            "blank": null | (t.str.len_chars() - t.str.count_matches(PY_WS_RE) == 0),
        }
    )
    return {
        "nchars": out["nchars"].to_numpy().astype(np.int64),
        "ntok": out["ntok"].to_numpy().astype(np.int64),
        "ndistinct": out["ndistinct"].to_numpy().astype(np.int64),
        "nsym": out["nsym"].to_numpy().astype(np.int64),
        "tox_hit": out["tox_hit"].to_numpy().astype(bool),
        "is_null_or_blank": out["blank"].to_numpy().astype(bool),
    }


STOPWORDS = frozenset(
    "the and of to in is that it was for a on are as with be this have from or "
    "had by but not what all were when we you your can said".split()
)
_STOP_RE = r"(?i)\b(?:" + "|".join(sorted(STOPWORDS)) + r")\b"


def quality_stats(text: pa.ChunkedArray | pa.Array) -> dict[str, np.ndarray]:
    """Generic document-quality stats (documents table; SURVEY §2 extensions):
    length, token count, distinct-token ratio, symbol ratio, stopword ratio,
    mean word length."""
    s = pl.from_arrow(pa.table({"t": text}))["t"].fill_null("")
    toks = s.str.extract_all(TOKEN_RE)
    df = pl.DataFrame(
        {
            "n_chars": s.str.len_chars(),
            "n_tokens": toks.list.len(),
            "n_distinct": toks.list.n_unique(),
            "n_sym": s.str.count_matches(SYMBOL_RE),
            "n_stop": s.str.count_matches(_STOP_RE),
            "n_alpha": s.str.count_matches(r"[A-Za-z]"),
        }
    )
    n_chars = df["n_chars"].to_numpy().astype(np.float64)
    n_tok = df["n_tokens"].to_numpy().astype(np.float64)
    return {
        "n_chars": df["n_chars"].to_numpy().astype(np.int64),
        "n_tokens": df["n_tokens"].to_numpy().astype(np.int64),
        "distinct_ratio": df["n_distinct"].to_numpy() / np.maximum(n_tok, 1.0),
        "symbol_ratio": df["n_sym"].to_numpy() / np.maximum(n_chars, 1.0),
        "stopword_ratio": df["n_stop"].to_numpy() / np.maximum(n_tok, 1.0),
        "alpha_ratio": df["n_alpha"].to_numpy() / np.maximum(n_chars, 1.0),
    }


_BPE_ISH = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"


def token_counts(text: pa.ChunkedArray | pa.Array) -> dict[str, np.ndarray]:
    """Whitespace tokens + a BPE-ish regex token count (letters runs / digit
    runs / single symbols) — the standard cheap proxy for subword token
    budgeting in training-data pipelines."""
    s = pl.from_arrow(pa.table({"t": text}))["t"].fill_null("")
    df = pl.DataFrame(
        {
            "ws_tokens": s.str.extract_all(TOKEN_RE).list.len(),
            "bpe_ish_tokens": s.str.count_matches(_BPE_ISH),
        }
    )
    return {
        "ws_tokens": df["ws_tokens"].to_numpy().astype(np.int64),
        "bpe_ish_tokens": df["bpe_ish_tokens"].to_numpy().astype(np.int64),
    }
