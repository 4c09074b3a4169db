"""Run metrics: the reference's Postgres metric tables re-expressed as
parquet datasets computed by Ray Data aggregations.

Mirrors (SURVEY.md §2.1 S6, §2.5 A5/A6): summary pass counts, per-dimension
scores, row-count history rows (consumed by the dynamic-threshold expectation,
/root/reference/storage/postgres_storage.py:540-606 +
/root/reference/core/quality_checks.py:516-625).

The metric partials are emitted by the final sink itself
(quality_filter._final_sink) as generic (kind, k1, k2, rows, kept) rows, so
metrics cost ZERO extra passes over the data — this module only aggregates
the partials (one tiny groupby) and persists the three metric tables.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def aggregate_final_partials(partials) -> list[dict]:
    """(kind, k1, k2, rows, kept) partials → fully combined rows.

    The partial set is O(#batches × #keys) — bounded by fragments + codec×lang
    + reasons per batch, never by data rows — so the final combine happens
    driver-side (polars) instead of paying a distributed groupby's shuffle
    latency. At extreme batch counts this is still a ~10M-row local groupby.
    """
    import polars as pl

    rows = partials.take_all()
    if not rows:
        return []
    df = pl.DataFrame(rows)
    out = df.group_by(["kind", "k1", "k2"]).agg(pl.col("rows").sum(),
                                                pl.col("kept").sum())
    return out.to_dicts()


def write_metrics_from_agg(out_dir: str, run_id: str, agg_rows: list[dict]) -> dict:
    """Persist per_fragment / codec_lang / reasons tables + history append."""
    from data_quality_framework_ray.state.history import MetricsHistory

    per_frag = sorted((r for r in agg_rows if r["kind"] == "frag"),
                      key=lambda r: int(r["k1"]))
    codec_lang = [r for r in agg_rows if r["kind"] == "codec_lang"]
    reasons = sorted((r for r in agg_rows if r["kind"] == "reason"),
                     key=lambda r: r["k1"])

    mdir = os.path.join(out_dir, "metrics", run_id)
    os.makedirs(mdir, exist_ok=True)
    pq.write_table(pa.table({
        "frag_id": pa.array([int(r["k1"]) for r in per_frag], type=pa.int64()),
        "rows": pa.array([int(r["rows"]) for r in per_frag], type=pa.int64()),
        "kept": pa.array([int(r["kept"]) for r in per_frag], type=pa.int64()),
    }), os.path.join(mdir, "per_fragment.parquet"))
    pq.write_table(pa.table({
        "codec": pa.array([r["k1"] for r in codec_lang], type=pa.string()),
        "lang": pa.array([r["k2"] for r in codec_lang], type=pa.string()),
        "rows": pa.array([int(r["rows"]) for r in codec_lang], type=pa.int64()),
        "kept": pa.array([int(r["kept"]) for r in codec_lang], type=pa.int64()),
    }), os.path.join(mdir, "codec_lang.parquet"))
    pq.write_table(pa.table({
        "reason": pa.array([r["k1"] for r in reasons], type=pa.string()),
        "cnt": pa.array([int(r["rows"]) for r in reasons], type=pa.int64()),
    }), os.path.join(mdir, "reasons.parquet"))

    hist = MetricsHistory(os.path.join(out_dir, "metrics", "history"))
    now = time.time()
    total = sum(int(r["rows"]) for r in per_frag)
    kept = sum(int(r["kept"]) for r in per_frag)
    hist.append(run_id,
                [{"run_id": run_id, "ts": now, "partition_key": f"frag:{int(r['k1'])}",
                  "row_count": int(r["rows"]), "kept": int(r["kept"]),
                  "dropped": int(r["rows"]) - int(r["kept"])} for r in per_frag]
                + [{"run_id": run_id, "ts": now, "partition_key": "__table__",
                    "row_count": total, "kept": kept, "dropped": total - kept}])
    return {"rows": total, "kept": kept, "dropped": total - kept}
