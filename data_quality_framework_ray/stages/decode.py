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
    stats = decode_stats(batch)
    return (batch
            .append_column("n_samples", pa.array(stats["n_samples"], type=pa.int64()))
            .append_column("rms", pa.array(stats["rms"], type=pa.float64())))
