"""Small-file compaction — the 100-TB operational primitive the reference
(single-process, one CSV/table at a time) never needed: long-running
ingestion leaves partition directories with thousands of few-MB parquet
files, and read throughput collapses on per-file open costs. Compaction
rewrites a directory to few right-sized files WITHOUT an all-to-all
shuffle: ``Dataset.repartition(n, shuffle=False)`` only splits/coalesces
adjacent blocks, so data moves at most once between neighbouring tasks.

At fleet scale each partition directory compacts independently (call this
per directory, exactly like the flagship's per-fragment phase A), which
keeps the job resumable — a finished directory is skipped by the caller's
DONE marker, a failed one recompacts alone. The write is atomic-ish per
directory: output lands in ``out_dir`` only after the full pipeline runs;
callers own the final rename/swap like ``quality_filter``'s finalize."""

from __future__ import annotations

import os


def compact_parquet(in_dir: str, out_dir: str, target_files: int) -> dict:
    """Rewrite the parquet files under ``in_dir`` into ``target_files``
    files at ``out_dir`` (no shuffle — block split/coalesce only; row
    content and schema are preserved bit-for-bit modulo row order across
    file boundaries). Returns ``{files_in, files_out, rows}``."""
    import ray.data as rd

    files_in = sum(1 for f in os.listdir(in_dir) if f.endswith(".parquet"))
    ds = rd.read_parquet(in_dir)
    n = max(1, int(target_files))
    ds.repartition(n, shuffle=False).write_parquet(out_dir)
    files_out = sum(1 for f in os.listdir(out_dir) if f.endswith(".parquet"))
    return {"files_in": files_in, "files_out": files_out,
            "rows": ds.count()}
