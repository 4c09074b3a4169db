"""Append-only metrics history + dynamic row-count thresholds.

Re-expresses the reference's closed feedback loop (its most interesting
semantic, SURVEY.md §3.3): run N's row counts parametrize run N+1's
expectation. Reference: history write
/root/reference/storage/postgres_storage.py:540-606, threshold math
/root/reference/core/quality_checks.py:516-625 (increments :581-589, range
:594-605, <2-history fallback :565-572), tolerance
/root/reference/config/settings.py:125-131.

Storage is an append-only directory of small per-run parquet files (the
Postgres replacement, SURVEY.md §1.3); history volume is O(runs × fragments),
never O(data), so driver-side pandas is the right tool here.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from data_quality_framework_ray import config


class MetricsHistory:
    def __init__(self, history_dir: str):
        self.dir = history_dir
        os.makedirs(self.dir, exist_ok=True)

    def append(self, run_id: str, rows: list[dict]) -> None:
        if not rows:
            return
        path = os.path.join(self.dir, f"{run_id}.parquet")
        pq.write_table(pa.Table.from_pylist(rows), path)

    def load(self) -> pd.DataFrame:
        files = sorted(glob.glob(os.path.join(self.dir, "*.parquet")))
        if not files:
            return pd.DataFrame(columns=["run_id", "ts", "partition_key",
                                         "row_count", "kept", "dropped"])
        return pd.concat([pq.read_table(f).to_pandas() for f in files],
                         ignore_index=True)

    def recent_counts(self, partition_key: str,
                      limit: int = config.DYNAMIC_THRESHOLD_HISTORY) -> list[int]:
        """Last ≤limit row counts, newest first (the reference's
        ORDER BY execution_timestamp DESC LIMIT n,
        /root/reference/storage/postgres_storage.py:624-630)."""
        df = self.load()
        df = df[df["partition_key"] == partition_key].sort_values("ts", ascending=False)
        return [int(x) for x in df["row_count"].head(limit)]


def dynamic_row_count_threshold(history_desc: list[int],
                                tolerance: float = config.DYNAMIC_THRESHOLD_TOLERANCE,
                                static_min: int = config.STATIC_ROW_COUNT_MIN) -> dict:
    """Expected [lo, hi] for the next run's row count (SPEC.md; reference
    semantics at /root/reference/core/quality_checks.py:516-625).

    ``history_desc`` is newest-first. With < 2 rows → static fallback
    (min=static_min, no upper bound). Else: avg of consecutive increments over
    the oldest→newest series, range = latest + avg·(1 ± tolerance), lower
    clamped at ≥ 0.
    """
    if len(history_desc) < 2:
        return {"method": "static_fallback", "lo": static_min, "hi": None}
    asc = list(reversed(history_desc))
    increments = [b - a for a, b in zip(asc, asc[1:])]
    avg = sum(increments) / len(increments)
    latest = asc[-1]
    delta_lo, delta_hi = avg * (1 - tolerance), avg * (1 + tolerance)
    if avg < 0:
        delta_lo, delta_hi = delta_hi, delta_lo
    return {"method": "increment_trend",
            "lo": max(0, latest + delta_lo),
            "hi": latest + delta_hi,
            "avg_increment": avg, "latest": latest}
