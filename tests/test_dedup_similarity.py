"""Dedup family + similarity search vs planted ground truth / DuckDB."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    """Documents with planted exact + near duplicates."""
    import ray.data as rd

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(300)]
    base = [" ".join(rng.choice(vocab, size=40)) for _ in range(200)]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": f"d{i:04d}", "text": t})
    # exact dups of docs 0..9
    for i in range(10):
        rows.append({"doc_id": f"x{i:04d}", "text": base[i]})
    # near dups of docs 20..29 (one token changed out of 40)
    for i in range(20, 30):
        toks = base[i].split()
        toks[5] = "CHANGED"
        rows.append({"doc_id": f"n{i:04d}", "text": " ".join(toks)})
    return rd.from_arrow(pa.Table.from_pylist(rows)), rows


def test_exact_dedup(docs_ds):
    from data_quality_framework_ray.pipelines.dedup import exact_dedup

    ds, rows = docs_ds
    survivors = {r["doc_id"] for r in exact_dedup(ds, ["text"], "doc_id").take_all()}
    assert len(survivors) == len(rows) - 10
    for i in range(10):
        assert f"d{i:04d}" in survivors      # min id wins
        assert f"x{i:04d}" not in survivors  # exact dup dropped
    assert all(f"n{i:04d}" in survivors for i in range(20, 30))  # near-dups stay


def test_minhash_lsh_finds_near_dups(docs_ds):
    from data_quality_framework_ray.pipelines.dedup import minhash_lsh_dup_groups

    ds, rows = docs_ds
    comp = minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.7)
    # every planted near-dup (and exact dup) should cluster with its source
    for i in range(20, 30):
        assert comp.get(f"n{i:04d}") == f"d{i:04d}", i
    for i in range(10):
        assert comp.get(f"x{i:04d}") == f"d{i:04d}", i
    # distinct random docs must not collapse together
    reps = {v for k, v in comp.items()}
    assert len(reps) >= 20


def test_simhash_near_dups(docs_ds):
    from data_quality_framework_ray.pipelines.dedup import simhash_dup_groups

    ds, rows = docs_ds
    comp = simhash_dup_groups(ds, "text", "doc_id", hamming_max=3)
    for i in range(10):  # exact dups have hamming 0
        assert comp.get(f"x{i:04d}") == f"d{i:04d}", i


def test_embedding_dedup(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import embedding_dup_groups

    rng = np.random.default_rng(4)
    emb = rng.standard_normal((100, 32))
    emb[50] = emb[10] + 0.001 * rng.standard_normal(32)  # planted near-dup
    emb[51] = emb[11] * 2.0                               # same direction
    rows = [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(100)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    comp = embedding_dup_groups(ds, "embedding", "vec_id", threshold=0.99)
    assert comp.get(50) == 10
    assert comp.get(51) == 11
    assert len(comp) <= 8  # random 32-dim vectors don't collide


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.similarity import brute_force_topk

    rng = np.random.default_rng(12)
    emb = rng.standard_normal((500, 16))
    rows = [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(500)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    q = emb[:4]
    got = brute_force_topk(ds, q, k=7)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = qn @ en.T
    for qi in range(4):
        want = list(np.argsort(-sims[qi])[:7])
        ids = [r["id"] for r in got.to_pylist() if r["query_id"] == qi]
        assert ids == want, qi


def test_ivf_topk_high_recall(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.similarity import (
        brute_force_topk, ivf_topk, train_codebook)

    rng = np.random.default_rng(13)
    emb = rng.standard_normal((800, 16))
    rows = [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(800)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    cb = train_codebook(ds, n_cells=8)
    q = emb[:5]
    exact = brute_force_topk(ds, q, k=10).to_pylist()
    approx = ivf_topk(ds, q, cb, k=10, nprobe=4).to_pylist()
    recall = 0
    for qi in range(5):
        e = {r["id"] for r in exact if r["query_id"] == qi}
        a = {r["id"] for r in approx if r["query_id"] == qi}
        recall += len(e & a) / len(e)
    assert recall / 5 >= 0.6  # nprobe=4 of 8 cells


def test_multimodal_stub_plumbing(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.stages.multimodal import (
        FrameSampleStage, ImageDecodeStage)

    rows = [{"item_id": f"i{k}", "bytes": bytes([k] * 64), "mime": "image/fake",
             "width": 8, "height": 8} for k in range(20)]
    rows.append({"item_id": "null", "bytes": None, "mime": "image/fake",
                 "width": 0, "height": 0})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = ds.map_batches(ImageDecodeStage, fn_constructor_kwargs={"backend": "fake"},
                         batch_format="pyarrow", batch_size=8, concurrency=2).take_all()
    assert len(out) == 21
    assert all(len(r["features"]) == 16 for r in out)
    # deterministic: same bytes → same features
    again = ds.map_batches(ImageDecodeStage, fn_constructor_kwargs={"backend": "fake"},
                           batch_format="pyarrow", batch_size=8, concurrency=2).take_all()
    assert sorted(map(str, (r["features"] for r in out))) == \
        sorted(map(str, (r["features"] for r in again)))

    vids = rd.from_arrow(pa.Table.from_pylist(
        [{"item_id": "v1", "dur_ms": 3500}, {"item_id": "v2", "dur_ms": 500}]))
    frames = vids.map_batches(FrameSampleStage, fn_constructor_kwargs={"every_ms": 1000},
                              batch_format="pyarrow", concurrency=1).take_all()
    assert len([f for f in frames if f["item_id"] == "v1"]) == 3
    assert len([f for f in frames if f["item_id"] == "v2"]) == 1


def test_brute_force_topk_distributed_merge_nq200(ray_session, monkeypatch):
    """Round-2 verdict #5: with nq=200 and TOPK_MERGE_LIMIT forced to 0 the
    merge must run as a distributed groupby (driver only ever sees nq x k
    final rows) and produce rows identical to the driver-merge path,
    including deterministic score-desc / id-asc tie ordering."""
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines import similarity

    rng = np.random.default_rng(21)
    emb = rng.standard_normal((600, 12))
    rows = [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(600)]
    # force many small blocks so every query has many partials to merge
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(16)
    q = rng.standard_normal((200, 12))
    driver = similarity.brute_force_topk(ds, q, k=5).to_pylist()
    monkeypatch.setattr(config, "TOPK_MERGE_LIMIT", 0)
    dist = similarity.brute_force_topk(ds, q, k=5).to_pylist()
    assert dist == driver
    assert len(dist) == 200 * 5


def test_pq_topk_recall_on_clustered_corpus(ray_session):
    """PQ + exact refine must recover the exact top-k on a corpus with
    planted clusters (and the encode must be a real 8-byte code per row)."""
    import numpy as np
    import ray.data as rd

    from data_quality_framework_ray.pipelines.similarity import (
        brute_force_topk, pq_encode, pq_topk, train_pq)

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(5, 64))
    rows = []
    for i in range(400):
        c = centers[i % 5]
        rows.append({"vec_id": i,
                     "embedding": (c + 0.1 * rng.normal(size=64)).tolist()})
    ds = rd.from_items(rows)
    books = train_pq(ds, m=8, nbits=6, seed=3)
    assert books.shape == (8, 64, 8)

    enc = pq_encode(ds, books).take(2)
    assert all(len(r["pq_code"]) == 8 for r in enc)

    # 80 near-identical members per cluster: the ADC ordering inside a
    # cluster is noise, so the refine window must cover the whole cluster
    q = np.stack([np.asarray(rows[i]["embedding"]) for i in (0, 1)])
    got = pq_topk(ds, q, books, k=5, refine_factor=20)
    want = brute_force_topk(ds, q, k=5)
    gp = set(zip(got["query_id"].to_pylist(), got["id"].to_pylist()))
    wp = set(zip(want["query_id"].to_pylist(), want["id"].to_pylist()))
    assert len(gp & wp) / len(wp) >= 0.9
