"""Run metrics: the reference's Postgres metric tables re-expressed as
parquet datasets computed by Ray Data aggregations.

Mirrors (SURVEY.md §2.1 S6, §2.5 A5/A6): summary pass counts, per-dimension
scores, row-count history rows (consumed by the dynamic-threshold expectation,
/root/reference/storage/postgres_storage.py:540-606 +
/root/reference/core/quality_checks.py:516-625).

Every aggregate is partial-first: map_batches emits one row per key per batch
(polars combine), then a tiny groupby over the partials — the shuffle carries
counters, never data rows.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _partial_frag_counts(batch: pa.Table) -> pa.Table:
    import polars as pl

    df = pl.from_arrow(batch.select(["frag_id", "keep"]))
    return (df.group_by("frag_id")
            .agg(pl.len().alias("rows"), pl.col("keep").sum().alias("kept"))
            .to_arrow())


def _partial_codec_lang(batch: pa.Table) -> pa.Table:
    import polars as pl

    df = pl.from_arrow(batch.select(["codec", "lang", "keep"]))
    # Ray's sort-based groupby can't order null keys — use a sentinel
    df = df.with_columns(pl.col("codec").fill_null("__null__"),
                         pl.col("lang").fill_null("__null__"))
    return (df.group_by(["codec", "lang"])
            .agg(pl.len().alias("rows"), pl.col("keep").sum().alias("kept"))
            .to_arrow())


def _partial_reasons(batch: pa.Table) -> pa.Table:
    import polars as pl

    df = pl.from_arrow(batch.select(["drop_reasons"]))
    ex = (df.explode("drop_reasons").drop_nulls()
          .group_by("drop_reasons").agg(pl.len().alias("cnt"))
          .rename({"drop_reasons": "reason"}))
    return ex.to_arrow()


def run_metrics_tables(final) -> dict[str, pa.Table]:
    """Three small metric tables from the final decisions Dataset."""
    from ray.data.aggregate import Sum

    per_frag = (final.map_batches(_partial_frag_counts, batch_format="pyarrow")
                .groupby("frag_id").aggregate(Sum("rows", alias_name="rows"),
                                              Sum("kept", alias_name="kept"))
                .sort("frag_id"))
    codec_lang = (final.map_batches(_partial_codec_lang, batch_format="pyarrow")
                  .groupby(["codec", "lang"]).aggregate(Sum("rows", alias_name="rows"),
                                                        Sum("kept", alias_name="kept")))
    reasons = (final.map_batches(_partial_reasons, batch_format="pyarrow")
               .groupby("reason").aggregate(Sum("cnt", alias_name="cnt"))
               .sort("reason"))
    # all three are O(#fragments + #codec×lang + #reasons) rows — tiny
    return {"per_fragment": pa.Table.from_pylist(per_frag.take_all()),
            "codec_lang": pa.Table.from_pylist(codec_lang.take_all()),
            "reasons": pa.Table.from_pylist(reasons.take_all())}


def write_run_metrics(out_dir: str, run_id: str) -> dict:
    """Compute + persist metrics for a finished run; append row-count history."""
    import ray.data as rd

    from data_quality_framework_ray.state.history import MetricsHistory

    final = rd.read_parquet(os.path.join(out_dir, "final"))
    tables = run_metrics_tables(final)
    mdir = os.path.join(out_dir, "metrics", run_id)
    os.makedirs(mdir, exist_ok=True)
    for name, t in tables.items():
        pq.write_table(t, os.path.join(mdir, f"{name}.parquet"))

    hist = MetricsHistory(os.path.join(out_dir, "metrics", "history"))
    now = time.time()
    frag_rows = tables["per_fragment"].to_pylist()
    hist.append(run_id, [{"run_id": run_id, "ts": now,
                          "partition_key": f"frag:{r['frag_id']}",
                          "row_count": r["rows"], "kept": r["kept"],
                          "dropped": r["rows"] - r["kept"]} for r in frag_rows]
                + [{"run_id": run_id, "ts": now, "partition_key": "__table__",
                    "row_count": sum(r["rows"] for r in frag_rows),
                    "kept": sum(r["kept"] for r in frag_rows),
                    "dropped": sum(r["rows"] - r["kept"] for r in frag_rows)}])

    total = sum(r["rows"] for r in frag_rows)
    kept = sum(r["kept"] for r in frag_rows)
    return {"rows": total, "kept": kept, "dropped": total - kept}
