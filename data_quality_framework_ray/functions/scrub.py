"""Compiled-regex PII / toxicity scrub (SPEC.md "PII scrub").

Patterns are module-level constants; polars compiles each Rust regex once per
worker process (module import), satisfying the north rule's "compiled-regex
scrub" with zero per-batch setup. Substitution ORDER is part of the spec
(EMAIL → CARD → PHONE → SSN) — counting happens against the intermediate
string before each replacement, exactly like the oracle's sequential re.sub.
"""

from __future__ import annotations

import os

os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import polars as pl
import pyarrow as pa

from data_quality_framework_ray import config


def scrub(transcript: pa.ChunkedArray | pa.Array) -> dict[str, np.ndarray | pa.Array]:
    """Returns ``scrubbed`` (pyarrow string array, null where input null) and
    ``n_pii`` (int32 numpy, 0 where null)."""
    s = pl.from_arrow(pa.table({"t": transcript}))["t"]
    cur = s
    n_pii = None
    for _name, pattern, repl in config.PII_PATTERNS:
        hits = cur.str.count_matches(pattern).fill_null(0)
        n_pii = hits if n_pii is None else n_pii + hits
        cur = cur.str.replace_all(pattern, repl)
    return {
        "scrubbed": cur.to_arrow(),
        "n_pii": n_pii.to_numpy().astype(np.int32),
    }
