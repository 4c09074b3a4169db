"""Round-2 dedup fixes: within-bucket pair recall, distributed fallbacks,
hot-bucket caps, distributed connected components (VERDICT.md items 1-3, 8)."""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pytest

from data_quality_framework_ray import config
from data_quality_framework_ray.functions import hashing as H


def test_pair_indices_all_pairs_under_cap():
    from data_quality_framework_ray.pipelines.dedup import _pair_indices

    ia, ib = _pair_indices(5, max_pairs=100)
    assert len(ia) == 10  # C(5,2)
    assert set(zip(ia.tolist(), ib.tolist())) == {
        (i, j) for i in range(5) for j in range(i + 1, 5)}


def test_pair_indices_star_chain_over_cap():
    from data_quality_framework_ray.pipelines.dedup import _pair_indices

    k = 100
    ia, ib = _pair_indices(k, max_pairs=10)
    assert len(ia) == 2 * k - 3
    # connectivity: union of pairs connects all k members
    parent = list(range(k))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ia.tolist(), ib.tolist()):
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(k)}) == 1


def test_simhash_bc_pair_not_masked_by_bucket_min(ray_session):
    """Plant a B-C near-dup pair that shares a bucket with a lower-sorting A
    which is NOT within hamming_max of either. The round-1 star-pair
    emission (bucket-min only) dropped B-C; full within-bucket pairs keep it."""
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import simhash_dup_groups

    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(500)]

    def sim_of(text: str) -> np.uint64:
        th, off = H.token_hashes(pa.array([text], type=pa.string()))
        return H.simhash64(th, off)[0]

    def hamming(a, b) -> int:
        return int(H.hamming64(np.array([a]), np.array([b]))[0])

    # B and C: one-token variants until hamming(B, C) <= 3
    b_text = c_text = None
    for _ in range(500):
        toks = list(rng.choice(vocab, size=60))
        cand_b = " ".join(toks)
        toks2 = toks.copy()
        toks2[7] = str(rng.choice(vocab))
        cand_c = " ".join(toks2)
        if 0 < hamming(sim_of(cand_b), sim_of(cand_c)) <= 3:
            b_text, c_text = cand_b, cand_c
            break
    assert b_text is not None
    sb, sc = sim_of(b_text), sim_of(c_text)
    shared_bands = [i for i in range(4)
                    if (int(sb) >> (16 * i)) & 0xFFFF == (int(sc) >> (16 * i)) & 0xFFFF]
    assert shared_bands  # pigeonhole: d<=3 over 4 bands

    # A: modify B until it keeps one of B's shared bands but is > 3 bits
    # from BOTH B and C (so star verification vs A fails for both)
    a_text = None
    for _ in range(3000):
        toks = b_text.split()
        for j in rng.choice(len(toks), size=3, replace=False):
            toks[j] = str(rng.choice(vocab))
        cand = " ".join(toks)
        sa = sim_of(cand)
        same_band = any((int(sa) >> (16 * i)) & 0xFFFF == (int(sb) >> (16 * i)) & 0xFFFF
                        for i in shared_bands)
        if same_band and hamming(sa, sb) > 3 and hamming(sa, sc) > 3:
            a_text = cand
            break
    assert a_text is not None, "search failed to plant the A doc"

    rows = [{"doc_id": "a0", "text": a_text},   # sorts first -> bucket min
            {"doc_id": "b1", "text": b_text},
            {"doc_id": "c2", "text": c_text}]
    # pad with unrelated docs so buckets aren't trivially tiny
    for i in range(30):
        rows.append({"doc_id": f"z{i:03d}",
                     "text": " ".join(rng.choice(vocab, size=60))})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    comp = simhash_dup_groups(ds, "text", "doc_id", hamming_max=3)
    assert comp.get("b1") == "b1" and comp.get("c2") == "b1", comp
    assert "a0" not in comp  # A verified against nothing successfully


def test_minhash_bc_pair_not_masked_by_bucket_min(ray_session):
    """Same shape for MinHash: A co-buckets with near-identical B and C but
    fails signature verification against both; B-C must still cluster."""
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import minhash_lsh_dup_groups

    rng = np.random.default_rng(17)
    vocab = [f"t{i}" for i in range(500)]

    def sig_of(text: str, num_perm=128) -> np.ndarray:
        sh, off = H.shingle_hashes(pa.array([text], type=pa.string()), 3)
        return H.minhash_signatures(sh, off, num_perm=num_perm)[0]

    def bandhash(sig: np.ndarray, bands=32) -> np.ndarray:
        r = len(sig) // bands
        views = sig.reshape(bands, r)
        with np.errstate(over="ignore"):
            bh = np.zeros(bands, dtype=np.uint64)
            P = np.uint64(1099511628211)
            for j in range(r):
                bh = bh * P + views[:, j]
        return bh

    found = None
    for _ in range(2000):
        toks = list(rng.choice(vocab, size=50))
        b_text = " ".join(toks)
        toks_c = toks.copy()
        toks_c[3] = str(rng.choice(vocab))
        c_text = " ".join(toks_c)   # near-identical to B
        # A: keep ~60% of B's tokens -> est-Jaccard well below 0.8 but with a
        # real chance of one band collision out of 32
        toks_a = toks.copy()
        for j in rng.choice(len(toks), size=20, replace=False):
            toks_a[j] = str(rng.choice(vocab))
        a_text = " ".join(toks_a)
        sa, sb_, scn = sig_of(a_text), sig_of(b_text), sig_of(c_text)
        est_ab = float((sa == sb_).mean())
        est_ac = float((sa == scn).mean())
        est_bc = float((sb_ == scn).mean())
        share_b = bool((bandhash(sa) == bandhash(sb_)).any())
        share_c = bool((bandhash(sa) == bandhash(scn)).any())
        if (share_b or share_c) and est_ab < 0.8 and est_ac < 0.8 and est_bc >= 0.8:
            found = (a_text, b_text, c_text)
            break
    assert found is not None, "search failed to plant the A doc"
    a_text, b_text, c_text = found

    rows = [{"doc_id": "a0", "text": a_text},
            {"doc_id": "b1", "text": b_text},
            {"doc_id": "c2", "text": c_text}]
    for i in range(30):
        rows.append({"doc_id": f"z{i:03d}",
                     "text": " ".join(rng.choice(vocab, size=50))})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    comp = minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.8)
    assert comp.get("b1") == "b1" and comp.get("c2") == "b1", comp
    assert "a0" not in comp


@pytest.fixture()
def planted_docs(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(300)]
    base = [" ".join(rng.choice(vocab, size=40)) for _ in range(120)]
    rows = []
    for i, t in enumerate(base):
        rows.append({"doc_id": f"d{i:04d}", "text": t})
    for i in range(10):
        rows.append({"doc_id": f"x{i:04d}", "text": base[i]})
    for i in range(20, 30):
        toks = base[i].split()
        toks[5] = "CHANGED"
        rows.append({"doc_id": f"n{i:04d}", "text": " ".join(toks)})
    return rd.from_arrow(pa.Table.from_pylist(rows)), rows


def test_exact_dedup_join_fallback_identical_survivors(planted_docs, monkeypatch):
    """Forcing BROADCAST_DUP_LIMIT below the dup-group count must switch to
    the Dataset.join path and keep IDENTICAL survivors."""
    from data_quality_framework_ray.pipelines import dedup

    ds, rows = planted_docs
    broadcast = {r["doc_id"] for r in
                 dedup.exact_dedup(ds, ["text"], "doc_id").take_all()}
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 2)
    joined = {r["doc_id"] for r in
              dedup.exact_dedup(ds, ["text"], "doc_id").take_all()}
    assert joined == broadcast
    assert all(f"x{i:04d}" not in joined for i in range(10))


def test_minhash_distributed_fallback_same_clusters(planted_docs, monkeypatch):
    from data_quality_framework_ray.pipelines import dedup

    ds, rows = planted_docs
    comp_b = dedup.minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.7)
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 10)
    comp_d = dedup.minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.7)
    assert comp_d == comp_b
    for i in range(10):
        assert comp_d.get(f"x{i:04d}") == f"d{i:04d}"


def test_simhash_distributed_fallback_same_clusters(planted_docs, monkeypatch):
    from data_quality_framework_ray.pipelines import dedup

    ds, rows = planted_docs
    comp_b = dedup.simhash_dup_groups(ds, "text", "doc_id", hamming_max=3)
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 10)
    comp_d = dedup.simhash_dup_groups(ds, "text", "doc_id", hamming_max=3)
    assert comp_d == comp_b


def test_components_distributed_matches_union_find(ray_session):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import (_components,
                                                            components_distributed)

    rng = np.random.default_rng(2)
    # several 4-node chains + an isolated pair (label diameter 3 keeps the
    # propagation loop short — each iteration is 2 joins + 2 groupbys)
    edges = []
    for start in range(0, 20, 4):  # 5 chains of 4
        for i in range(start, start + 3):
            edges.append((f"v{i:03d}", f"v{i + 1:03d}"))
    edges.append(("v900", "v901"))
    rng.shuffle(edges)
    want = _components(edges, {x for e in edges for x in e})
    got_rows = components_distributed(
        rd.from_items([{"a": a, "b": b} for a, b in edges])).take_all()
    got = {r["id"]: r["rep"] for r in got_rows}
    assert got == want


def test_embedding_hot_bucket_bounded(ray_session):
    """1,000 near-identical embeddings land in ONE hyperplane bucket; the
    capped/recursive verifier must finish fast and produce one component."""
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import embedding_dup_groups

    rng = np.random.default_rng(6)
    center = rng.standard_normal(32)
    emb = center[None, :] + 1e-4 * rng.standard_normal((1000, 32))
    rows = [{"vec_id": i, "embedding": emb[i].tolist()} for i in range(1000)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    t0 = time.time()
    comp = embedding_dup_groups(ds, "embedding", "vec_id", threshold=0.99)
    elapsed = time.time() - t0
    assert elapsed < 60
    # all 1000 form one component with rep = min id 0
    assert len(comp) == 1000
    assert set(comp.values()) == {0}


def test_verify_emb_members_recursion_matches_bruteforce():
    """Moderate hot bucket: recursive verifier's components must equal the
    brute-force all-pairs components."""
    from data_quality_framework_ray.pipelines.dedup import (_components,
                                                            _verify_emb_members)

    rng = np.random.default_rng(12)
    # 3 tight clusters of 150 + 50 loners, all in "one bucket"
    centers = rng.standard_normal((3, 16)) * 5
    parts = [centers[i][None, :] + 0.01 * rng.standard_normal((150, 16))
             for i in range(3)]
    loners = rng.standard_normal((50, 16)) * 5
    emb = np.vstack(parts + [loners])
    norm = np.linalg.norm(emb, axis=1)
    ids = np.arange(len(emb))

    # brute force ground truth
    sims = (emb @ emb.T) / np.outer(norm, norm)
    iu = np.triu_indices(len(emb), k=1)
    hit = sims[iu] >= 0.995
    truth_pairs = list(zip(ids[iu[0][hit]].tolist(), ids[iu[1][hit]].tolist()))
    truth = _components(truth_pairs, {x for p in truth_pairs for x in p})

    pairs = _verify_emb_members(emb, norm, ids, 0.995, cap=64, seed=3)
    got = _components(pairs, {x for p in pairs for x in p})
    assert got == truth


def test_semi_anti_join_paths_agree(ray_session, monkeypatch):
    """semi_join broadcast path ≡ Dataset.join path (forced by dropping the
    broadcast limit; high-cardinality keys keep every partition non-empty,
    away from the Ray 2.49 empty-partition join bug)."""
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.joins import semi_join

    rng = np.random.default_rng(3)
    left = rd.from_items([{"k": int(k), "v": i}
                          for i, k in enumerate(rng.integers(0, 500, size=800))])
    right = rd.from_items([{"rk": int(k)}
                           for k in rng.integers(0, 500, size=600)])

    def run(anti):
        out = semi_join(left, right, on="k", right_on="rk", anti=anti).take_all()
        return sorted((r["k"], r["v"]) for r in out)

    semi_b, anti_b = run(False), run(True)
    assert len(semi_b) + len(anti_b) == 800
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)
    assert run(False) == semi_b
    assert run(True) == anti_b


@pytest.fixture()
def planted_docs_int_ids(ray_session):
    """Same planted corpus but with INT64 ids (the documents-table shape)."""
    import ray.data as rd

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(300)]
    base = [" ".join(rng.choice(vocab, size=40)) for _ in range(100)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    rows += [{"doc_id": 1000 + i, "text": base[i]} for i in range(10)]
    for i in range(20, 30):
        toks = base[i].split()
        toks[5] = "CHANGED"
        rows.append({"doc_id": 2000 + i, "text": " ".join(toks)})
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_minhash_distributed_int_ids(planted_docs_int_ids, monkeypatch):
    """Regression (round-2 review): the distributed fallback used to cast
    pair ids to string and join them against the int64 id column — crash or
    silent no-op. Must now produce identical clusters for int64 ids."""
    from data_quality_framework_ray.pipelines import dedup

    ds = planted_docs_int_ids
    comp_b = dedup.minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.7)
    assert comp_b, "expected planted clusters"
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 10)
    comp_d = dedup.minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.7)
    assert comp_d == comp_b
    for i in range(10):
        assert comp_d.get(1000 + i) == i


def test_simhash_distributed_int_ids(planted_docs_int_ids, monkeypatch):
    from data_quality_framework_ray.pipelines import dedup

    ds = planted_docs_int_ids
    comp_b = dedup.simhash_dup_groups(ds, "text", "doc_id", hamming_max=3)
    assert comp_b
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 10)
    comp_d = dedup.simhash_dup_groups(ds, "text", "doc_id", hamming_max=3)
    assert comp_d == comp_b


def test_minhash_distributed_exact_verify(planted_docs_int_ids, monkeypatch):
    """verify='exact' must keep exact n-gram Jaccard semantics in the
    distributed path (it used to silently degrade to signature estimates)."""
    from data_quality_framework_ray.pipelines import dedup

    ds = planted_docs_int_ids
    comp_b = dedup.minhash_lsh_dup_groups(ds, "text", "doc_id",
                                          threshold=0.8, verify="exact")
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 10)
    comp_d = dedup.minhash_lsh_dup_groups(ds, "text", "doc_id",
                                          threshold=0.8, verify="exact")
    assert comp_d == comp_b
    for i in range(10):  # exact dups have Jaccard 1.0 under both paths
        assert comp_d.get(1000 + i) == i


def test_jaccard_dedup_matches_bruteforce(ray_session):
    """Property check: exact-verify MinHash clusters == brute-force all-pairs
    3-gram Jaccard union-find, across several random corpora with planted
    dups at clear margins (J > 0.9 planted, random pairs ≪ 0.8 — away from
    the LSH S-curve knee so candidate recall is ~1)."""
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import (_components,
                                                            minhash_lsh_dup_groups)

    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        vocab = [f"w{i}" for i in range(400)]
        base = [" ".join(rng.choice(vocab, size=30)) for _ in range(60)]
        texts = list(base)
        # planted: exact dups + one- and two-token variants
        for i in range(8):
            texts.append(base[i])
        for i in range(10, 18):
            toks = base[i].split()
            for j in rng.choice(30, size=int(rng.integers(1, 3)), replace=False):
                toks[j] = "ALT"
            texts.append(" ".join(toks))
        ids = [f"doc{i:03d}" for i in range(len(texts))]

        # brute force ground truth
        def sh_set(t):
            w = t.split()
            return set(zip(*[w[j:] for j in range(3)])) or {tuple(w)}

        sets = [sh_set(t) for t in texts]
        truth_pairs = []
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                jac = len(sets[i] & sets[j]) / max(len(sets[i] | sets[j]), 1)
                if jac >= 0.8:
                    truth_pairs.append((ids[i], ids[j]))
        truth = _components(truth_pairs, {x for p in truth_pairs for x in p})

        ds = rd.from_arrow(pa.Table.from_pylist(
            [{"doc_id": d, "text": t} for d, t in zip(ids, texts)]))
        comp = minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.8,
                                      verify="exact")
        assert comp == truth, f"seed {seed}"


def test_resolve_components_distributed_path(ray_session, monkeypatch):
    """Forcing DRIVER_PAIR_LIMIT to 0 routes _resolve_components through the
    label-propagation Dataset path — result must equal union-find."""
    from data_quality_framework_ray.pipelines.dedup import (_components,
                                                            _resolve_components)

    pairs = [("a", "b"), ("b", "c"), ("x", "y"), ("m", "n"), ("n", "o")]
    want = _components(pairs, {v for p in pairs for v in p})
    monkeypatch.setattr(config, "DRIVER_PAIR_LIMIT", 0)
    got = _resolve_components(pairs)
    assert got == want


def test_emit_pairs_arrays_properties():
    """Property fuzz over random bucket shapes: below-cap buckets emit ALL
    within-bucket pairs with a < b; above-cap buckets still connect all
    members; no cross-bucket pairs ever."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_quality_framework_ray.pipelines.dedup import _emit_pairs_arrays

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 4),
                              st.integers(0, 30)),
                    min_size=0, max_size=80),
           st.integers(1, 40))
    def run(rows, cap):
        band = np.array([r[0] for r in rows], dtype=np.int64)
        bh = np.array([r[1] for r in rows], dtype=np.int64)
        ids = np.array([f"id{r[2]:03d}_{i}" for i, r in enumerate(rows)],
                       dtype=object)
        a, b, _ = _emit_pairs_arrays(band, bh, ids, max_pairs=cap)
        by_id = {i: (bd, h) for bd, h, i in zip(band, bh, ids)}
        buckets: dict = {}
        for bd, h, i in zip(band, bh, ids):
            buckets.setdefault((bd, h), []).append(i)
        # no cross-bucket pairs; a < b always
        for x, y in zip(a, b):
            assert by_id[x] == by_id[y]
            assert x < y
        got = {(x, y) for x, y in zip(a, b)}
        for key, members in buckets.items():
            ms = sorted(members)
            k = len(ms)
            expect_all = k * (k - 1) // 2 <= cap
            in_bucket = {(x, y) for x, y in got if by_id[x] == key}
            if expect_all:
                want = {(ms[i], ms[j]) for i in range(k) for j in range(i + 1, k)}
                assert in_bucket == want
            elif k >= 2:
                # connectivity: union-find over emitted pairs joins the bucket
                parent = {m: m for m in ms}

                def find(x):
                    while parent[x] != x:
                        parent[x] = parent[parent[x]]
                        x = parent[x]
                    return x

                for x, y in in_bucket:
                    parent[find(x)] = find(y)
                assert len({find(m) for m in ms}) == 1

    run()


def test_streaming_labels_no_driver_pair_collect(planted_docs_int_ids,
                                                 monkeypatch):
    """Round-2 verdict #1 done-criterion: with DRIVER_PAIR_LIMIT forced to 0
    and the broadcast limit forced down, `as_dataset=True` must resolve
    clusters with NO driver-side pair resolution at all — `_components`
    (the driver union-find) is stubbed to raise, and the legacy
    `_resolve_components` (list-in) must never be called. The returned
    (id, rep) labels Dataset must equal the broadcast-path dict, and
    `near_dedup_filter` must consume it directly via anti-join."""
    from data_quality_framework_ray.pipelines import dedup

    ds = planted_docs_int_ids
    comp_b = dedup.minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.7)
    assert comp_b, "expected planted clusters"
    survivors_b = sorted(
        r["doc_id"]
        for r in dedup.near_dedup_filter(ds, "doc_id", comp_b).take_all())

    def boom(*a, **k):
        raise AssertionError("driver-side pair resolution ran on the "
                             "streaming path")

    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 10)
    monkeypatch.setattr(config, "DRIVER_PAIR_LIMIT", 0)
    monkeypatch.setattr(dedup, "_components", boom)
    monkeypatch.setattr(dedup, "_resolve_components", boom)
    labels_ds = dedup.minhash_lsh_dup_groups(ds, "text", "doc_id",
                                             threshold=0.7, as_dataset=True)
    import ray.data as rd

    assert isinstance(labels_ds, rd.Dataset)
    got = {r["id"]: r["rep"] for r in labels_ds.take_all()}
    assert got == comp_b
    survivors_s = sorted(
        r["doc_id"]
        for r in dedup.near_dedup_filter(ds, "doc_id", labels_ds).take_all())
    assert survivors_s == survivors_b


def test_simhash_streaming_labels(planted_docs_int_ids, monkeypatch):
    """Same streaming-path guarantee for SimHash."""
    from data_quality_framework_ray.pipelines import dedup

    ds = planted_docs_int_ids
    comp_b = dedup.simhash_dup_groups(ds, "text", "doc_id", hamming_max=3)
    assert comp_b

    def boom(*a, **k):
        raise AssertionError("driver-side pair resolution ran on the "
                             "streaming path")

    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 10)
    monkeypatch.setattr(config, "DRIVER_PAIR_LIMIT", 0)
    monkeypatch.setattr(dedup, "_components", boom)
    monkeypatch.setattr(dedup, "_resolve_components", boom)
    labels_ds = dedup.simhash_dup_groups(ds, "text", "doc_id", hamming_max=3,
                                         as_dataset=True)
    got = {r["id"]: r["rep"] for r in labels_ds.take_all()}
    assert got == comp_b


def test_embedding_streaming_labels_string_ids(ray_session, monkeypatch):
    """Embedding near-dup streaming path with STRING ids — covers both the
    round-2 advice regression (np.minimum on unicode ids raised TypeError)
    and the no-driver-collection guarantee."""
    import ray.data as rd

    from data_quality_framework_ray.pipelines import dedup

    rng = np.random.default_rng(11)
    emb = rng.standard_normal((60, 16))
    emb[40] = emb[0] + 1e-6  # planted near-dup pair
    emb[41] = emb[1] + 1e-6
    rows = [{"vec_id": f"v{i:03d}", "embedding": emb[i].tolist()}
            for i in range(60)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    comp_b = dedup.embedding_dup_groups(ds, "embedding", "vec_id",
                                        threshold=0.999)
    assert comp_b.get("v040") == "v000" and comp_b.get("v041") == "v001"

    def boom(*a, **k):
        raise AssertionError("driver-side pair resolution ran on the "
                             "streaming path")

    monkeypatch.setattr(config, "DRIVER_PAIR_LIMIT", 0)
    monkeypatch.setattr(dedup, "_components", boom)
    monkeypatch.setattr(dedup, "_resolve_components", boom)
    labels_ds = dedup.embedding_dup_groups(ds, "embedding", "vec_id",
                                           threshold=0.999, as_dataset=True)
    got = {r["id"]: r["rep"] for r in labels_ds.take_all()}
    assert got == comp_b


def test_semi_anti_join_null_keys_sql_parity(ray_session, monkeypatch):
    """SQL EXISTS/NOT EXISTS parity for NULL keys on BOTH semi_join paths
    (round-2 advice): a null left key never matches — semi drops it, anti
    keeps it; null right keys match nothing."""
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.joins import semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 2, None, 3], type=pa.int64()),
        "v": pa.array([0, 1, 2, 3, 4], type=pa.int64())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 3, None], type=pa.int64())}))

    def run(anti):
        out = semi_join(left, right, on="k", right_on="rk", anti=anti).take_all()
        return sorted(r["v"] for r in out)

    # broadcast path
    assert run(False) == [2, 4]          # semi: only real matches
    assert run(True) == [0, 1, 3]        # anti: null-keyed rows KEPT
    # join path (forced)
    monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)
    assert run(False) == [2, 4]
    assert run(True) == [0, 1, 3]


def test_bucket_membership_broadcast_equals_join(ray_session, monkeypatch):
    """_bucket_membership must return the same member rows through the
    broadcast pc.is_in path and the semi-join path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.dedup import (_bucket_membership,
                                                            _hot_buckets)
    import polars as pl

    rows = [{"band": int(b), "bh": int(h), "id": f"d{i}"}
            for i, (b, h) in enumerate([(0, 5), (0, 5), (1, 7), (1, 7),
                                        (1, 7), (2, 9), (3, 5)])]
    bands = rd.from_items(rows).repartition(3).materialize()
    counts = bands.map_batches(
        lambda t: pl.from_arrow(t).group_by(["band", "bh"])
        .agg(pl.len().alias("cnt")).to_arrow(), batch_format="pyarrow")
    hot = _hot_buckets(counts, 4).materialize()

    def collect(ds):
        return sorted((r["band"], r["bh"], r["id"])
                      for r in ds.take_all())

    want = collect(_bucket_membership(bands, hot, 4))
    assert {x[2] for x in want} == {"d0", "d1", "d2", "d3", "d4"}
    monkeypatch.setattr(config, "MEMBERSHIP_BROADCAST_LIMIT", 0)
    got = collect(_bucket_membership(bands, hot, 4))
    assert got == want


def test_keyed_dup_groups_broadcast_equals_join(ray_session):
    """keyed_dup_groups must emit identical (id, cluster_rep) rows through
    the broadcast-merge path and the combined-key join path, bit-cast uint64
    keys >= 2^63 (the round-4 bench crash), drop null-key rows, and keep
    groups with equal fp but different frame counts apart."""
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import keyed_dup_groups

    big = (1 << 63) + 12345  # uint64 beyond int64 range
    rows = [
        {"clip_id": "c1", "fp": big, "nf": 10},
        {"clip_id": "c2", "fp": big, "nf": 10},
        {"clip_id": "c5", "fp": big, "nf": 10},
        {"clip_id": "c3", "fp": 7, "nf": 4},
        {"clip_id": "c4", "fp": 7, "nf": 4},
        {"clip_id": "c6", "fp": 7, "nf": 5},   # same fp, different frames
        {"clip_id": "c7", "fp": 99, "nf": 3},  # singleton
        {"clip_id": "c8", "fp": None, "nf": None},  # null key dropped
    ]
    t = pa.Table.from_pylist(rows, schema=pa.schema([
        ("clip_id", pa.string()), ("fp", pa.uint64()), ("nf", pa.int32())]))
    ds = rd.from_arrow(t).repartition(3).materialize()

    def collect(out):
        return sorted((r["clip_id"], r["cluster_rep"])
                      for r in out.take_all())

    want = [("c1", "c1"), ("c2", "c1"), ("c3", "c3"), ("c4", "c3"),
            ("c5", "c1")]
    got_bc = collect(keyed_dup_groups(ds, ["fp", "nf"], "clip_id"))
    assert got_bc == want
    got_join = collect(keyed_dup_groups(ds, ["fp", "nf"], "clip_id",
                                        broadcast_limit=0))
    assert got_join == want


def test_keyed_dup_groups_no_dups_empty(ray_session):
    """All-singleton input yields an empty result with the right schema on
    both paths."""
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import keyed_dup_groups

    t = pa.Table.from_pylist(
        [{"clip_id": f"c{i}", "fp": i, "nf": 1} for i in range(5)],
        schema=pa.schema([("clip_id", pa.string()), ("fp", pa.uint64()),
                          ("nf", pa.int32())]))
    ds = rd.from_arrow(t).materialize()
    for lim in (None, 0):
        out = keyed_dup_groups(ds, ["fp", "nf"], "clip_id",
                               broadcast_limit=lim)
        assert out.take_all() == []


def test_emit_pairs_uncapped_override():
    """max_pairs override must reach the per-bucket emitter: an over-cap
    bucket emits all C(k,2) pairs instead of star+chain (the SQL-oracled
    simhash path relies on this, ADVICE r4)."""
    from data_quality_framework_ray.pipelines.dedup import _emit_pairs_arrays

    k = 100
    band = np.zeros(k, dtype=np.int64)
    bh = np.zeros(k, dtype=np.int64)
    ids = np.arange(k)
    a, b, _ = _emit_pairs_arrays(band, bh, ids, max_pairs=10)
    assert len(a) == 2 * k - 3
    a2, b2, _ = _emit_pairs_arrays(band, bh, ids, max_pairs=1 << 62)
    assert len(a2) == k * (k - 1) // 2


def test_keyed_dup_groups_timestamp_key_join_path(ray_session):
    """Composite (int, timestamp) key must work through BOTH assignment
    paths — the join path hashes non-integer keys via polars row hash
    (content_hash_128's string fill_null would break on temporal cols)."""
    import datetime as dt

    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import keyed_dup_groups

    d1 = dt.datetime(2024, 1, 1)
    d2 = dt.datetime(2024, 1, 2)
    t = pa.Table.from_pylist([
        {"ok": 10, "cust": 1, "d": d1},
        {"ok": 11, "cust": 1, "d": d1},
        {"ok": 12, "cust": 1, "d": d2},   # same cust, other day
        {"ok": 13, "cust": 2, "d": d1},   # other cust, same day
        {"ok": 14, "cust": 2, "d": d1},
        {"ok": 15, "cust": 3, "d": None},  # null key dropped
    ], schema=pa.schema([("ok", pa.int64()), ("cust", pa.int64()),
                         ("d", pa.timestamp("us"))]))
    ds = rd.from_arrow(t).repartition(2).materialize()
    want = [(10, 10), (11, 10), (13, 13), (14, 13)]
    for lim in (None, 0):
        out = keyed_dup_groups(ds, ["cust", "d"], "ok", broadcast_limit=lim)
        got = sorted((r["ok"], r["cluster_rep"]) for r in out.take_all())
        assert got == want, (lim, got)


def test_keyed_dup_groups_distributed_fold_branch(ray_session, monkeypatch):
    """Force PARTIAL_FOLD_LIMIT=0 so the winner aggregation takes the
    distributed Ray groupby branch (otherwise unreachable at test sizes),
    through BOTH member-assignment paths — this is the branch where Ray's
    hash aggregate silently changes timestamp units, which the int64
    bit-cast in _key_i64 must neutralize."""
    import datetime as dt

    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.dedup import keyed_dup_groups

    monkeypatch.setattr(config, "PARTIAL_FOLD_LIMIT", 0)
    d1 = dt.datetime(2024, 1, 1)
    t = pa.Table.from_pylist([
        {"ok": 10, "cust": 1, "d": d1},
        {"ok": 11, "cust": 1, "d": d1},
        {"ok": 12, "cust": 2, "d": d1},
    ], schema=pa.schema([("ok", pa.int64()), ("cust", pa.int64()),
                         ("d", pa.timestamp("us"))]))
    ds = rd.from_arrow(t).repartition(2).materialize()
    want = [(10, 10), (11, 10)]
    for lim in (None, 0):
        out = keyed_dup_groups(ds, ["cust", "d"], "ok", broadcast_limit=lim)
        got = sorted((r["ok"], r["cluster_rep"]) for r in out.take_all())
        assert got == want, (lim, got)


def test_exact_dedup_distributed_fold_branch(ray_session, monkeypatch):
    """Same forced-limit coverage for _exact_dup_groups_ds's groupby branch."""
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.dedup import exact_dedup

    monkeypatch.setattr(config, "PARTIAL_FOLD_LIMIT", 0)
    t = pa.Table.from_pylist([
        {"id": 1, "text": "aa"}, {"id": 2, "text": "aa"},
        {"id": 3, "text": "bb"},
    ])
    ds = rd.from_arrow(t).repartition(2).materialize()
    kept = sorted(r["id"] for r in
                  exact_dedup(ds, ["text"], "id").take_all())
    assert kept == [1, 3]


def test_minhash_partial_gate_skips_driver_fold(planted_docs, monkeypatch):
    """PARTIAL_FOLD_LIMIT=0 must route minhash through the pre-driver scale
    gate (dedup.py bucket-partial count check) straight to the distributed
    path — and produce the same clusters as the broadcast route. Pins the
    round-5 fix that replaced the unconditional take_all() of bucket-count
    partials with a metadata-only count gate."""
    from data_quality_framework_ray.pipelines import dedup

    ds, rows = planted_docs
    comp_b = dedup.minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.7)
    monkeypatch.setattr(config, "PARTIAL_FOLD_LIMIT", 0)
    comp_g = dedup.minhash_lsh_dup_groups(ds, "text", "doc_id", threshold=0.7)
    assert comp_g == comp_b


def test_simhash_partial_gate_skips_driver_fold(planted_docs, monkeypatch):
    from data_quality_framework_ray.pipelines import dedup

    ds, rows = planted_docs
    comp_b = dedup.simhash_dup_groups(ds, "text", "doc_id", hamming_max=3)
    monkeypatch.setattr(config, "PARTIAL_FOLD_LIMIT", 0)
    comp_g = dedup.simhash_dup_groups(ds, "text", "doc_id", hamming_max=3)
    assert comp_g == comp_b


def test_dedupe_pair_blocks_schemaless_empty_and_string_promotion():
    """Empty hash partitions emit zero-column blocks; polars promotes
    string→large_string. _dedupe_pair_blocks must normalize both so the
    trailing cast(pair_schema) never rejects a block."""
    from data_quality_framework_ray.pipelines.dedup import _dedupe_pair_blocks

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    out = _dedupe_pair_blocks(pa.Table.from_pylist([]), pair_schema)
    assert out.schema == pair_schema and out.num_rows == 0

    b = pa.table({"a": pa.array(["x", "x", "y"]),
                  "b": pa.array(["y", "y", "z"])})
    out = _dedupe_pair_blocks(b, pair_schema)
    assert out.schema == pair_schema
    assert sorted(zip(out["a"].to_pylist(), out["b"].to_pylist())) == [
        ("x", "y"), ("y", "z")]


def test_broadcast_member_rows_matches_set_probe(ray_session):
    """The vectorized combined-key is_in membership filter must keep exactly
    the rows a per-row (band, bh) set probe keeps."""
    import polars as pl
    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import \
        _broadcast_member_rows

    rng = np.random.default_rng(11)
    n = 5_000
    band = rng.integers(0, 8, size=n)
    bh = rng.integers(-(2**62), 2**62, size=n)
    t = pa.table({"band": pa.array(band, type=pa.int64()),
                  "bh": pa.array(bh, type=pa.int64()),
                  "id": pa.array([f"r{i}" for i in range(n)])})
    # pick ~40 real buckets as the "dup" set
    pick = rng.choice(n, size=40, replace=False)
    agg = pl.DataFrame({"band": band[pick].astype(np.int64),
                        "bh": bh[pick].astype(np.int64)})
    want = {(int(a), int(b)) for a, b in zip(band[pick], bh[pick])}
    expect = sorted(t["id"].to_pylist()[i] for i in range(n)
                    if (int(band[i]), int(bh[i])) in want)
    got_tbl = _broadcast_member_rows(
        rd.from_arrow(t).repartition(4), agg).take_all()
    got = sorted(r["id"] for r in got_tbl)
    assert got == expect


def test_keyed_dup_groups_randomized_vs_bruteforce(ray_session):
    """Seeded randomized sweep of keyed_dup_groups against a brute-force
    oracle: uint64 keys spanning the full 64-bit range (the r4 crash class),
    null keys, both assignment paths (broadcast_limit 0 forces the join
    path), and varied partitioning."""
    import random

    import ray.data as rd

    from data_quality_framework_ray.pipelines.dedup import keyed_dup_groups

    rng = random.Random(20260819)
    for trial in range(8):
        n = rng.choice([2, 50, 500])
        keyspace = [rng.getrandbits(64)
                    for _ in range(max(1, n // rng.choice([2, 5, 20])))]
        ids = [f"id{i:05d}" for i in range(n)]
        rng.shuffle(ids)
        k1 = [rng.choice(keyspace) if rng.random() > 0.05 else None
              for _ in range(n)]
        k2 = [rng.choice(["a", "b", "c"]) if rng.random() > 0.05 else None
              for _ in range(n)]
        t = pa.table({"k_fp": pa.array(k1, type=pa.uint64()),
                      "k_s": pa.array(k2, type=pa.string()),
                      "the_id": pa.array(ids, type=pa.string())})
        ds = rd.from_arrow(t).repartition(rng.choice([1, 3]))
        limit = rng.choice([0, 10 ** 9])
        got = keyed_dup_groups(ds, ["k_fp", "k_s"], "the_id",
                               broadcast_limit=limit)
        rows = got.take_all() if hasattr(got, "take_all") else got.to_pylist()
        gd = {r["the_id"]: r["cluster_rep"] for r in rows}

        groups: dict = {}
        for a, b, i in zip(k1, k2, ids):
            if a is not None and b is not None:
                groups.setdefault((a, b), []).append(i)
        want = {m: min(mem) for mem in groups.values() if len(mem) > 1
                for m in mem}
        assert gd == want, (trial, n, limit)
