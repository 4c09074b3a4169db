"""Flagship pipeline: audio-clip quality filter (BASELINE.json north_star).

Composition (all streaming, no driver-side materialization of data):

    read fragments (not-DONE only)                      # resume filter
      → map_batches(decode_stats_stage)                 # zero-copy Arrow, LUT decode
      → map_batches(rules_and_scrub)                    # flags+scrub+hash, drops bytes
      → map_batches(LangIdScorer,  concurrency=pool)    # actor pool, model in __init__
      → map_batches(PerplexityScorer, concurrency=pool)
      → map_batches(combine_decisions)                  # drop_reasons list, keep
      → FragmentSink                                    # per-fragment parquet + lineage
    then a cheap global pass over the (bytes-free) decisions:
      partial dup counts → groupby(h1,h2) → dup groups (small) → broadcast
      → mark duplicates → final output + metrics

Shuffle inventory (SURVEY.md §7.3): the ONLY all-to-all is the dedup groupby,
and it ships two int64 hashes + clip_id + a per-batch partial count — the
audio bytes never cross a shuffle. Dup groups are broadcast via ``ray.put``
(guarded by config.BROADCAST_DUP_LIMIT; beyond it, fall back to
``Dataset.join`` on (h1,h2) — documented, not needed at sandbox scale).

Resume: phase A checkpoints per fragment chunk (LineageLog); phase B is
derived + cheap and reruns every time, so fragment restarts can never change
survivors (winner = min clip_id is order-free; SURVEY.md §7.4).
"""

from __future__ import annotations

import bisect
import os
import shutil
import time
import uuid
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from data_quality_framework_ray import config
from data_quality_framework_ray.sources.fragments import FragmentStore
from data_quality_framework_ray.stages.decode import decode_stats_stage
from data_quality_framework_ray.stages.rules import RULES, rules_and_scrub
from data_quality_framework_ray.stages.scorers import LangIdScorer, PerplexityScorer
from data_quality_framework_ray.state.checkpoint import LineageLog, clear_partial_outputs

# phase-A reasons in lexicographic order ("duplicate" is inserted in phase B)
PHASE_A_REASONS = tuple(sorted(r.name for r in RULES if r.name != "duplicate"))


def combine_decisions(batch: pa.Table, enabled: frozenset[str] | None = None) -> pa.Table:
    """Flags + model scores → sorted drop_reasons list + keep bool."""
    n = batch.num_rows
    blank = np.asarray(batch["flag_null_transcript"].to_pandas(), dtype=bool)
    lang = np.asarray(batch["lang"].to_pandas(), dtype=object)
    conf = np.asarray(batch["lang_conf"].to_pandas(), dtype=np.float64)
    ppl = np.asarray(batch["ppl"].to_pandas(), dtype=np.float64)

    masks = {}
    for name in PHASE_A_REASONS:
        col = "flag_" + name
        if col in batch.column_names:
            masks[name] = np.asarray(batch[col].to_pandas(), dtype=bool)
    with np.errstate(invalid="ignore"):
        lang_ok = np.isin(lang.astype("U8"), np.asarray(config.LANG_ALLOWLIST))
        masks["lang"] = ~blank & (~lang_ok | ~(conf >= config.LANG_CONF_MIN))
        masks["perplexity"] = ~blank & (ppl > config.PPL_MAX)  # NaN-safe: False

    if enabled is not None:
        for name in masks:
            if name not in enabled:
                masks[name] = np.zeros(n, dtype=bool)

    mask = np.stack([masks[name] for name in PHASE_A_REASONS], axis=1)
    reasons = _reasons_list_array(mask, PHASE_A_REASONS)
    keep = ~mask.any(axis=1)

    # blank rows: models/scrub outputs are NULL per SPEC
    lang_arr = pc.if_else(pa.array(~blank), batch["lang"].combine_chunks()
                          if isinstance(batch["lang"], pa.ChunkedArray) else batch["lang"],
                          pa.scalar(None, type=pa.string()))
    conf_arr = pa.array(np.where(blank, np.nan, conf), type=pa.float64())
    ppl_arr = pa.array(np.where(blank, np.nan, ppl), type=pa.float64())

    out = batch.drop_columns([c for c in batch.column_names if c.startswith("flag_")]
                             + ["lang", "lang_conf", "ppl"])
    return (out
            .append_column("lang", lang_arr)
            .append_column("lang_conf", conf_arr)
            .append_column("ppl", ppl_arr)
            .append_column("keep", pa.array(keep))
            .append_column("drop_reasons", reasons))


def _reasons_list_array(mask: np.ndarray, names: tuple[str, ...]) -> pa.ListArray:
    """Row-major nonzero of a (rows × reasons-in-sorted-order) mask → per-row
    lexicographically sorted list<string>, fully vectorized."""
    rows, cols = np.nonzero(mask)
    values = pa.array(np.asarray(names, dtype=object)[cols], type=pa.string())
    offsets = np.zeros(mask.shape[0] + 1, dtype=np.int32)
    np.cumsum(mask.sum(axis=1), out=offsets[1:])
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)


def pipeline_stages(ds, models_dir: str | None = None, *,
                    batch_size: int = config.DEFAULT_BATCH_SIZE,
                    model_concurrency=config.MODEL_POOL_SIZE,
                    disabled_rules: tuple[str, ...] = ()):
    """Phase-A transform chain on a clips Dataset (lazy)."""
    enabled = frozenset(r.name for r in RULES if r.name not in disabled_rules)
    kw = {"models_dir": models_dir} if models_dir else {}
    ds = ds.map_batches(decode_stats_stage, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(rules_and_scrub, batch_format="pyarrow", batch_size=batch_size)
    ds = ds.map_batches(LangIdScorer, fn_constructor_kwargs=kw,
                        batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE,
                        concurrency=model_concurrency)
    ds = ds.map_batches(PerplexityScorer, fn_constructor_kwargs=kw,
                        batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE,
                        concurrency=model_concurrency)
    ds = ds.map_batches(partial(combine_decisions, enabled=enabled),
                        batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)
    return ds


# ---------------- phase-A sink ----------------

def _sink_batch(batch: pa.Table, stage_dir: str) -> pa.Table:
    """Write each fragment's slice of the batch under ``frag=<id>/`` and emit a
    tiny (frag_id, rows) summary — the pipeline's consumed output is ONLY the
    summaries, so nothing big flows back to the driver."""
    frag = np.asarray(batch["frag_id"].to_pandas(), dtype=np.int64)
    out = []
    for fid in np.unique(frag):
        sl = batch.filter(pc.equal(batch["frag_id"], pa.scalar(int(fid))))
        # dash (not '=') so readers don't hive-parse a duplicate partition col
        d = os.path.join(stage_dir, f"frag-{int(fid):05d}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(sl, os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"))
        out.append({"frag_id": int(fid), "rows": sl.num_rows})
    return pa.Table.from_pylist(out, schema=pa.schema([("frag_id", pa.int64()),
                                                       ("rows", pa.int64())]))


# ---------------- phase B: dedup ----------------

def _partial_dup_counts(batch: pa.Table) -> pa.Table:
    """Map-side combine before the dedup groupby: one row per (h1,h2) per batch."""
    import polars as pl

    df = pl.from_arrow(batch.select(["h1", "h2", "clip_id"]))
    g = df.group_by(["h1", "h2"]).agg(pl.col("clip_id").min().alias("min_clip"),
                                      pl.len().alias("cnt"))
    return g.to_arrow()


def dup_winner_map(decisions) -> dict[tuple[int, int], str]:
    """(h1,h2) → winning clip_id for content groups with > 1 member. The
    result is SMALL (only actual duplicate groups); guarded by
    BROADCAST_DUP_LIMIT."""
    from ray.data.aggregate import Min, Sum

    pairs = decisions.select_columns(["h1", "h2", "clip_id"]).map_batches(
        _partial_dup_counts, batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)
    g = pairs.groupby(["h1", "h2"]).aggregate(Min("min_clip"), Sum("cnt"))
    dups = g.map_batches(lambda t: t.filter(pc.greater(t["sum(cnt)"], 1)),
                         batch_format="pyarrow")
    rows = dups.take_all()
    if len(rows) > config.BROADCAST_DUP_LIMIT:  # pragma: no cover - scale guard
        raise RuntimeError(
            f"{len(rows)} duplicate groups exceeds broadcast limit; switch the "
            "dedup path to Dataset.join on (h1, h2)")
    return {(r["h1"], r["h2"]): r["min(min_clip)"] for r in rows}


def mark_duplicates(batch: pa.Table, dup_ref) -> pa.Table:
    """Append the 'duplicate' reason for losers of content groups (winner =
    min clip_id). Lookup is a vectorized pandas merge against the broadcast
    dup table (ray.get is zero-copy from the local object store)."""
    import pandas as pd
    import ray

    dups = ray.get(dup_ref) if not isinstance(dup_ref, dict) else dup_ref
    n = batch.num_rows
    if not dups:
        is_dup = np.zeros(n, dtype=bool)
    else:
        left = pd.DataFrame({"h1": batch["h1"].to_numpy(zero_copy_only=False),
                             "h2": batch["h2"].to_numpy(zero_copy_only=False),
                             "clip_id": batch["clip_id"].to_pandas()})
        right = pd.DataFrame([(h1, h2, w) for (h1, h2), w in dups.items()],
                             columns=["h1", "h2", "winner"])
        merged = left.merge(right, on=["h1", "h2"], how="left")
        is_dup = (merged["winner"].notna() & (merged["winner"] != merged["clip_id"])).to_numpy()

    if not is_dup.any():
        return batch
    reasons = batch["drop_reasons"].to_pylist()
    keep = np.asarray(batch["keep"].to_pandas(), dtype=bool)
    for i in np.nonzero(is_dup)[0]:  # touched rows only (few per batch)
        lst = reasons[i]
        bisect.insort(lst, "duplicate")
        reasons[i] = lst
    keep[is_dup] = False
    out = batch.drop_columns(["keep", "drop_reasons"])
    return (out
            .append_column("keep", pa.array(keep))
            .append_column("drop_reasons", pa.array(reasons, type=pa.list_(pa.string()))))


# ---------------- full run ----------------

def run(in_dir: str, out_dir: str, models_dir: str | None = None, *,
        batch_size: int = config.DEFAULT_BATCH_SIZE,
        model_concurrency=config.MODEL_POOL_SIZE,
        chunk_frags: int | None = None,
        disabled_rules: tuple[str, ...] = (),
        run_id: str | None = None) -> dict:
    """Resume-aware end-to-end run. Returns a small summary dict; all data
    outputs land under ``out_dir`` (decisions/, final/, metrics/, lineage/)."""
    import ray.data as rd

    t0 = time.time()
    run_id = run_id or time.strftime("run_%Y%m%d_%H%M%S")
    store = FragmentStore(in_dir)
    lineage = LineageLog(out_dir)
    stage_dir = os.path.join(out_dir, "decisions")

    done = lineage.done_frag_ids()
    todo = [f for f in store.frag_ids() if f not in done]
    clear_partial_outputs(stage_dir, set(todo))

    # phase A in fragment chunks: each chunk is one streaming pipeline; a chunk
    # is the checkpoint/failure domain (finished chunks are skipped on resume)
    if chunk_frags is None:
        chunk_frags = max(4, -(-len(todo) // 6)) if todo else 1
    for c0 in range(0, len(todo), chunk_frags):
        chunk = todo[c0:c0 + chunk_frags]
        ds = store.read(chunk)
        out = pipeline_stages(ds, models_dir, batch_size=batch_size,
                              model_concurrency=model_concurrency,
                              disabled_rules=disabled_rules)
        summaries = out.map_batches(partial(_sink_batch, stage_dir=stage_dir),
                                    batch_format="pyarrow").take_all()
        per_frag: dict[int, int] = {}
        for s in summaries:
            per_frag[s["frag_id"]] = per_frag.get(s["frag_id"], 0) + s["rows"]
        for fid in chunk:
            lineage.mark_done(fid, {"run_id": run_id,
                                    "rows_in": store.num_rows(fid),
                                    "rows_out": per_frag.get(fid, 0)})

    # phase B: global dedup + final output (cheap: no audio bytes anywhere)
    decisions = rd.read_parquet(stage_dir)
    import ray
    dup_ref = ray.put(dup_winner_map(decisions))
    final = decisions.map_batches(partial(mark_duplicates, dup_ref=dup_ref),
                                  batch_format="pyarrow",
                                  batch_size=config.TEXT_BATCH_SIZE)
    final_dir = os.path.join(out_dir, "final")
    tmp_dir = final_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    final.write_parquet(tmp_dir, partition_cols=["frag_id"])
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp_dir, final_dir)

    from data_quality_framework_ray.pipelines.metrics import write_run_metrics

    metrics_summary = write_run_metrics(out_dir, run_id)
    return {"run_id": run_id, "frags_total": len(store.frag_ids()),
            "frags_processed": len(todo), "elapsed_s": round(time.time() - t0, 3),
            **metrics_summary}


def read_final(out_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(out_dir, "final"))
