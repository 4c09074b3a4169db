"""PageRank: closed-form / numpy-replay parity, dangling mass, the
distributed-fold path, and empties."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from data_quality_framework_ray.pipelines.graph import pagerank


def _ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}))


def _replay(src, dst, iters, damping=0.85):
    src, dst = np.asarray(src), np.asarray(dst)
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    out_deg = np.bincount(si, minlength=len(nodes))
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    dang = out_deg == 0
    for _ in range(iters):
        w = np.where(dang, 0.0, damping * r / np.maximum(out_deg, 1))
        acc = np.zeros(n)
        np.add.at(acc, di, w[si])
        r = (1 - damping) / n + acc + damping * float(r[dang].sum()) / n
    return nodes, r


def test_cycle_is_uniform(ray_session):
    # 4-cycle: stationary by symmetry; every iterate stays uniform
    t = pagerank(_ds([0, 1, 2, 3], [1, 2, 3, 0]), iters=5)
    assert t["node"].to_pylist() == [0, 1, 2, 3]
    assert np.allclose(t["rank"].to_numpy(), 0.25, rtol=0, atol=1e-15)


def test_star_matches_replay_and_sums_to_one(ray_session):
    # hub 0 pointed at by 1..6, hub dangling in reverse direction for
    # leaves; parallel edge 1->0 doubled to check multiplicity counts
    src = [1, 2, 3, 4, 5, 6, 1, 0]
    dst = [0, 0, 0, 0, 0, 0, 0, 1]
    t = pagerank(_ds(src, dst), iters=4)
    nodes, want = _replay(src, dst, iters=4)
    assert t["node"].to_pylist() == nodes.tolist()
    got = t["rank"].to_numpy()
    assert np.allclose(got, want, rtol=1e-12, atol=0)
    assert abs(got.sum() - 1.0) < 1e-12
    # node 1 receives the hub's entire out-mass, so it ends highest;
    # the hub (aggregating 7 leaf edges) is second
    assert int(np.argmax(got)) == 1
    assert got[0] > got[2]


def test_dangling_mass_redistributed(ray_session):
    # 0->1, 1 dangling: without dangling handling rank leaks each iter
    t = pagerank(_ds([0], [1]), iters=10)
    s = float(np.sum(t["rank"].to_numpy()))
    assert abs(s - 1.0) < 1e-12
    nodes, want = _replay([0], [1], iters=10)
    assert np.allclose(t["rank"].to_numpy(), want, rtol=1e-12)


def test_distributed_fold_path_matches(ray_session, monkeypatch):
    # force the over-limit branch of _fold_partials so the groupby-Sum
    # fallback runs for both the degree pass and every contribution fold
    from data_quality_framework_ray import config

    rng = np.random.default_rng(7)
    src = rng.integers(0, 50, size=400)
    dst = rng.integers(0, 50, size=400)
    base = pagerank(_ds(src, dst), iters=3)
    monkeypatch.setattr(config, "PARTIAL_FOLD_LIMIT", 1)
    forced = pagerank(_ds(src, dst), iters=3)
    assert base["node"].to_pylist() == forced["node"].to_pylist()
    assert np.allclose(base["rank"].to_numpy(), forced["rank"].to_numpy(),
                       rtol=1e-9)
    nodes, want = _replay(src, dst, iters=3)
    assert np.allclose(base["rank"].to_numpy(), want, rtol=1e-9)


def test_empty_edges(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    t = pagerank(empty, iters=3)
    assert t.num_rows == 0
    assert t.schema.names == ["node", "rank"]
