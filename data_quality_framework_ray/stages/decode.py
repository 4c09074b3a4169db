"""Audio decode stage: stateless ``map_batches`` fn over zero-copy Arrow.

Adds ``n_samples``/``rms`` per clip via the whole-batch LUT decode
(functions/audio.py). Stateless tasks (not an actor pool): the LUTs are
module-level constants, initialized once per worker process by Ray's worker
reuse — no per-batch setup cost.
"""

from __future__ import annotations

import pyarrow as pa

from data_quality_framework_ray.functions.audio import decode_stats


def decode_stats_stage(batch: pa.Table) -> pa.Table:
    # spectral=False: no keep/drop rule consumes centroid/flatness, and the
    # rfft is both ~2/3 of decode time and its dominant memory traffic —
    # the first resource to saturate as actors scale up on one node. The
    # columns stay in the schema (NaN) so downstream layouts are unchanged;
    # consumers that want them call decode_stats(spectral=True) directly
    # (spectral-feature tests; ad-hoc analysis).
    stats = decode_stats(batch, spectral=False)
    batch = batch.append_column("n_samples",
                                pa.array(stats["n_samples"], type=pa.int64()))
    for col in ("rms", "clip_frac", "silence_frac", "spectral_centroid",
                "spectral_flatness"):
        batch = batch.append_column(col, pa.array(stats[col], type=pa.float64()))
    return batch
