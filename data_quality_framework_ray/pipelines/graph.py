"""Distributed graph algorithms over edge-list Datasets.

The reference (`/root/reference`, a single-process pandas validation
framework) has no graph operators; this module extends the engine's
iterative-algorithm family (``similarity.kmeans_lloyd``) to edge-partitioned
message passing — the shape a 100-TB lineage/link-graph analysis needs:
edges stay distributed and are streamed once per iteration, per-iteration
traffic is per-batch sparse (dst, contribution) partials folded through the
same bounded driver-combine / distributed-groupby switch as every other
partial fold in this engine (``stats._fold_partials``).

Vertex-state assumption (documented, same class as kmeans' centroids): the
rank vector is O(nodes)·8 B and is broadcast once per iteration via
``ray.put`` (zero-copy shared per NODE in the object store, not shipped per
task) — at 10^9 nodes that is an 8 GB shared block per machine, the standard
"vertex program state fits on a worker" regime of Pregel-style systems. Edge
count is unbounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_framework_ray import config
from data_quality_framework_ray.pipelines.stats import _fold_partials


def pagerank(edges_ds, src_col: str = "src", dst_col: str = "dst",
             iters: int = 3, damping: float = 0.85) -> pa.Table:
    """Fixed-iteration PageRank over a directed edge list (parallel edges
    count with multiplicity). Returns one (node:int64, rank:float64) row per
    distinct node, sorted by node.

    Determinism contract (for the replay gate): init rank = 1/N for the
    sorted distinct node set; each iteration computes
    ``r' = (1-d)/N + d·(Aᵀ(r/outdeg) + dangling_mass/N)`` in float64.
    Partial-sum fold order is not pinned (float noise ~1e-15 relative);
    the gate compares against a plain-numpy replay at rel ≤ 1e-9.
    """
    import ray

    # --- pass 1: distinct nodes + out-degree, one distributed fold.
    # Every node appears as a partial row (dst-only nodes with out_deg 0),
    # so the folded frame IS the node table.
    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "out_deg": pa.array([], pa.int64())})
        s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(s, return_inverse=True)
        cnt = np.bincount(inv)
        du = np.setdiff1d(np.unique(d), u, assume_unique=True)
        return pa.table({
            "node": pa.array(np.concatenate([u, du])),
            "out_deg": pa.array(np.concatenate(
                [cnt, np.zeros(len(du), dtype=np.int64)]))})

    parts = edges_ds.map_batches(deg_partial, batch_format="pyarrow")
    deg = _fold_partials(parts, ["node"], ["out_deg"]).sort("node")
    if deg.height == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})
    nodes = deg["node"].to_numpy().astype(np.int64)
    out_deg = deg["out_deg"].to_numpy().astype(np.int64)
    n = len(nodes)
    r = np.full(n, 1.0 / n, dtype=np.float64)

    def contrib_fn(ref):
        def f(t: pa.Table) -> pa.Table:
            empty = pa.table({"node": pa.array([], pa.int64()),
                              "contrib": pa.array([], pa.float64())})
            if t.num_rows == 0:
                return empty
            nodes_b, w_b = ray.get(ref)
            s = t[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
            si = np.searchsorted(nodes_b, s)
            di = np.searchsorted(nodes_b, d)
            u, inv = np.unique(di, return_inverse=True)
            c = np.bincount(inv, weights=w_b[si])
            return pa.table({"node": pa.array(nodes_b[u]),
                             "contrib": pa.array(c, pa.float64())})
        return f

    dangling = out_deg == 0
    for _ in range(iters):
        w = np.where(dangling, 0.0, damping * r / np.maximum(out_deg, 1))
        ref = ray.put((nodes, w))
        folded = _fold_partials(
            edges_ds.map_batches(contrib_fn(ref), batch_format="pyarrow",
                                 batch_size=config.TEXT_BATCH_SIZE),
            ["node"], ["contrib"])
        acc = np.zeros(n, dtype=np.float64)
        if folded.height:
            idx = np.searchsorted(nodes, folded["node"].to_numpy())
            acc[idx] = folded["contrib"].to_numpy()
        dm = float(r[dangling].sum())
        r = (1.0 - damping) / n + acc + damping * dm / n

    return pa.table({"node": pa.array(nodes),
                     "rank": pa.array(r, pa.float64())})
