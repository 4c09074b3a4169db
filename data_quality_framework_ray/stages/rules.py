"""Heuristic rule + scrub stage (SPEC.md "Rules" / "PII scrub").

One stateless ``map_batches`` pass computes every per-row rule flag, the PII
scrub and the 128-bit content hash, then PROJECTS AWAY the audio ``bytes``
column — nothing heavier than the transcript crosses a stage boundary after
this point (dedup shuffle ships only hashes + ids; SURVEY.md §7.4).

The rule registry replaces the reference's per-check enable flags
(/root/reference/config/settings.py:119-154): disable a rule and its reason
never fires, but the stat columns still flow.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from data_quality_framework_ray import config
from data_quality_framework_ray.functions.hashing import content_hash_128
from data_quality_framework_ray.functions.scrub import scrub
from data_quality_framework_ray.functions.textstats import text_stats


@dataclass(frozen=True)
class Rule:
    """A named drop rule (reason = name; dimension per the reference's
    four-dimension scoring, /root/reference/storage/postgres_storage.py:424-439)."""

    name: str
    dimension: str
    enabled: bool = True


RULES = tuple(
    Rule(*r) for r in [
        ("codec_unknown", "validity"),
        ("corrupt_audio", "validity"),
        ("duplicate", "uniqueness"),
        ("dur_range", "validity"),
        ("lang", "accuracy"),
        ("length", "completeness"),
        ("null_transcript", "completeness"),
        ("perplexity", "accuracy"),
        ("rate_mismatch", "consistency"),
        ("repetition", "accuracy"),
        ("sr_range", "validity"),
        ("symbol", "accuracy"),
        ("toxicity", "accuracy"),
    ]
)
RULE_DIMENSION = {r.name: r.dimension for r in RULES}


def enabled_set(disabled: tuple[str, ...] = ()) -> frozenset[str]:
    return frozenset(r.name for r in RULES if r.enabled and r.name not in disabled)


def rules_and_scrub(batch: pa.Table) -> pa.Table:
    """Flags + scrub + content hash; drops ``bytes``."""
    n = batch.num_rows
    st = text_stats(batch["transcript"])
    blank = st["is_null_or_blank"]
    nchars, ntok = st["nchars"], st["ntok"]

    import pyarrow.compute as pc

    # direct arrow→numpy (no pandas Series round-trip; nulls → NaN for
    # numerics exactly as before — round-2 verdict #8)
    sr = batch["sr_hz"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    dur = batch["dur_ms"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    codec = batch["codec"].to_numpy(zero_copy_only=False)
    bl = pc.binary_length(batch["bytes"])
    byte_len = pc.fill_null(bl, -1).to_numpy(zero_copy_only=False).astype(np.int64)  # -1 = null

    sr_ok = ~np.isnan(sr) & np.isin(sr, np.asarray(config.ALLOWED_SR, dtype=np.float64))
    dur_ok = ~np.isnan(dur) & (dur > 0)
    bps = np.full(n, -1, dtype=np.int64)
    for c, b in config.CODEC_BYTES_PER_SAMPLE.items():
        bps[codec == c] = b
    codec_known = bps > 0

    # expected byte length; np.round matches Python round (banker's) on .5
    exp_samples = np.round(dur * sr / 1000.0)
    exp_bytes = exp_samples * bps
    audio_checkable = sr_ok & dur_ok & codec_known

    flags = {
        "codec_unknown": ~codec_known,
        "corrupt_audio": audio_checkable & ((byte_len < 0) | (byte_len != exp_bytes)),
        "dur_range": ~dur_ok,
        "length": ~blank & ((nchars < config.LEN_MIN) | (nchars > config.LEN_MAX)),
        "null_transcript": blank,
        "rate_mismatch": np.zeros(n, dtype=bool),
        "repetition": np.zeros(n, dtype=bool),
        "sr_range": ~sr_ok,
        "symbol": np.zeros(n, dtype=bool),
        "toxicity": ~blank & st["tox_hit"],
    }
    rep_applicable = ~blank & (ntok >= config.REPETITION_MIN_TOKENS)
    with np.errstate(invalid="ignore", divide="ignore"):
        rep = 1.0 - st["ndistinct"] / np.maximum(ntok, 1)
        flags["repetition"][rep_applicable & (rep > config.REPETITION_MAX)] = True
        sym = st["nsym"] / np.maximum(nchars, 1)
        flags["symbol"][~blank & (nchars > 0) & (sym > config.SYMBOL_RATIO_MAX)] = True
        cps = nchars / np.where(dur_ok, dur / 1000.0, np.nan)
        flags["rate_mismatch"][~blank & dur_ok
                               & ((cps < config.CPS_MIN) | (cps > config.CPS_MAX))] = True

    sc = scrub(batch["transcript"])
    scrubbed = sc["scrubbed"]
    if isinstance(scrubbed, pa.ChunkedArray):
        scrubbed = scrubbed.combine_chunks()
    # blank transcript → scrubbed NULL (SPEC: null_transcript row outputs)
    if blank.any():
        keep_mask = pa.array(~blank)
        scrubbed = pc.if_else(keep_mask, scrubbed, pa.scalar(None, type=pa.string()))

    h1, h2 = content_hash_128(batch["transcript"], batch["bytes"])

    out = batch.drop_columns(["bytes"])
    for name in sorted(flags):
        out = out.append_column("flag_" + name, pa.array(flags[name]))
    out = (out
           .append_column("scrubbed_transcript", scrubbed)
           .append_column("n_pii", pa.array(sc["n_pii"], type=pa.int32()))
           .append_column("h1", pa.array(h1, type=pa.int64()))
           .append_column("h2", pa.array(h2, type=pa.int64())))
    return out
