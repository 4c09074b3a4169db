"""Join / lookup operators.

The reference has NO dataflow join (SURVEY.md §2.4 — its only analogue is the
driver-dict DEV↔PROD comparison, /root/reference/main.py:226-253), but a
complete engine needs them. Three shapes, picked by side sizes and semantics:

- **broadcast_hash_join** — small side shipped once via ``ray.put``, looked up
  with a vectorized pandas merge per batch. No shuffle; the default whenever
  one side fits in worker memory (dimension tables, winner maps, vocab).
- **hash_join** — both sides large: ``Dataset.join`` (hash-partitioned on the
  key, ``num_partitions`` sized to cluster CPUs). All-to-all exchange; salt
  hot keys upstream if skewed.
- **asof_join_per_key** — per-key "most recent earlier" semantics:
  groupby(key) shuffle → per-group sorted searchsorted (pandas). Requires the
  key to be hash-partitionable; within-group sort is in-memory, so a single
  key's history must fit in a worker (salt by time-range for pathological
  keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from data_quality_framework_ray import config


def broadcast_hash_join(ds, small_df: pd.DataFrame, left_on: str, right_on: str,
                        how: str = "inner"):
    """Join a Dataset against a small pandas table (broadcast once)."""
    import ray

    ref = ray.put(small_df)

    def lookup(batch: pa.Table) -> pa.Table:
        small = ray.get(ref) if not isinstance(ref, pd.DataFrame) else ref
        left = batch.to_pandas()
        merged = left.merge(small, how=how, left_on=left_on, right_on=right_on)
        if right_on != left_on and right_on in merged.columns:
            merged = merged.drop(columns=[right_on])
        return pa.Table.from_pandas(merged, preserve_index=False)

    return ds.map_batches(lookup, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE)


def hash_join(left, right, on: str | tuple[str, ...],
              right_on: str | tuple[str, ...] | None = None, *,
              join_type: str = "inner", num_partitions: int | None = None):
    """Large-large equi-join via Ray Data's hash-partitioned join."""
    import ray

    if num_partitions is None:
        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 8)))
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on))
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=on_t, right_on=r_t)


def asof_join_prev(ds, key: str, ts: str, value_cols: list[str] | None = None):
    """For every row, attach ``prev_<ts>`` = the greatest ts of an EARLIER row
    with the same key (strictly less; rows with no earlier row are dropped —
    inner as-of semantics). Deterministic under ts ties because only the ts
    value (not an arbitrary tie row) is emitted."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="mergesort").reset_index(drop=True)
        arr = g[ts].to_numpy()
        pos = np.searchsorted(arr, arr, side="left") - 1
        keep = pos >= 0
        out = g.loc[keep, [c for c in ([key, ts] + (value_cols or [])) ]].copy()
        out[f"prev_{ts}"] = arr[pos[keep]]
        return out

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
