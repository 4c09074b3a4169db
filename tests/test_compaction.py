"""Small-file compaction: file-count reduction, row/schema preservation,
value-exact round trip."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from data_quality_framework_ray.pipelines.compaction import compact_parquet


def _write_small_files(d: str, n_files: int = 24, rows_per: int = 50):
    os.makedirs(d, exist_ok=True)
    k = 0
    for i in range(n_files):
        ids = list(range(k, k + rows_per))
        k += rows_per
        pq.write_table(pa.table({
            "id": pa.array(ids, pa.int64()),
            "grp": pa.array([x % 7 for x in ids], pa.int64()),
            "txt": pa.array([f"r{x}" for x in ids])}),
            os.path.join(d, f"part-{i:05d}.parquet"))
    return n_files * rows_per


def test_compact_reduces_files_preserves_rows(ray_session, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    total = _write_small_files(src)
    st = compact_parquet(src, dst, target_files=3)
    assert st["files_in"] == 24
    assert st["files_out"] <= 3
    assert st["rows"] == total
    before = pq.read_table(src).sort_by("id")
    after = pq.read_table(dst)
    assert after.schema.equals(before.schema)
    assert after.sort_by("id").equals(before)


def test_compact_single_target(ray_session, tmp_path):
    src, dst = str(tmp_path / "s2"), str(tmp_path / "c2")
    total = _write_small_files(src, n_files=5, rows_per=11)
    st = compact_parquet(src, dst, target_files=1)
    assert st["files_out"] == 1
    assert pq.read_table(dst).num_rows == total
