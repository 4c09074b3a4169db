"""Incremental cross-corpus dedup (pipelines/incremental.py): persisted
fingerprint index, anti-filter on both execution paths (broadcast merge and
distributed hash-only join + semi_join), and append-mode ingest."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _corpus_and_new():
    corpus = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                       "text": pa.array([f"doc {i}" for i in range(100)])})
    new_rows = ([(1000 + i, f"doc {i}") for i in range(30)]      # index hits
                + [(2000 + i, f"new {i}") for i in range(50)]    # fresh
                + [(3000, "new 7"), (3001, "new 7"),             # within-new
                   (3002, "dupme"), (3003, "dupme")])            # dup pairs
    new = pa.table({"doc_id": pa.array([r[0] for r in new_rows], pa.int64()),
                    "text": pa.array([r[1] for r in new_rows])})
    want = sorted([2000 + i for i in range(50)] + [3002])
    return corpus, new, want


@pytest.mark.parametrize("force_join", [False, True])
def test_dedup_against_index_both_paths(ray_session, tmp_path, monkeypatch,
                                        force_join):
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.incremental import (
        build_content_index,
        dedup_against_index,
        index_size,
    )

    corpus, new, want = _corpus_and_new()
    idx = str(tmp_path / "idx")
    build_content_index(rd.from_arrow(corpus).repartition(4), ["text"], idx)
    assert index_size(idx) == 100

    if force_join:
        monkeypatch.setattr(config, "BROADCAST_DUP_LIMIT", 0)
    out = dedup_against_index(rd.from_arrow(new).repartition(3),
                              ["text"], "doc_id", idx)
    got = sorted(r["doc_id"] for r in out.take_all())
    # 3000/3001 ("new 7") lose to 2007; "dupme" keeps min id 3002; all
    # "doc *" raw texts are index hits
    assert got == want


def test_index_append_and_second_ingest(ray_session, tmp_path):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.incremental import (
        build_content_index,
        dedup_against_index,
        index_size,
    )

    corpus, new, _ = _corpus_and_new()
    idx = str(tmp_path / "idx")
    build_content_index(rd.from_arrow(corpus), ["text"], idx)
    survivors = dedup_against_index(rd.from_arrow(new), ["text"],
                                    "doc_id", idx)
    # ingest: append the survivors' fingerprints — same call, new files only
    build_content_index(survivors, ["text"], idx)
    assert index_size(idx) == 100 + 51  # 50 fresh + the "dupme" winner
    batch2 = pa.table({"doc_id": pa.array([5000, 5001, 5002], pa.int64()),
                       "text": pa.array(["new 3", "doc 99", "totally fresh"])})
    out2 = dedup_against_index(rd.from_arrow(batch2), ["text"],
                               "doc_id", idx)
    assert sorted(r["doc_id"] for r in out2.take_all()) == [5002]


@pytest.mark.parametrize("force_distributed", [False, True])
def test_near_dedup_against_minhash_index(ray_session, tmp_path, monkeypatch,
                                          force_distributed):
    """Persisted MinHash LSH index: near-dups of indexed docs are dropped,
    fresh and sub-threshold docs survive, zero-shingle docs pass through,
    appends extend the index, parameter mismatch is rejected — on BOTH the
    broadcast/driver-verify path and the fully distributed join path."""
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.incremental import (
        build_minhash_index,
        near_dedup_against_index,
    )

    if force_distributed:
        monkeypatch.setattr(config, "MEMBERSHIP_BROADCAST_LIMIT", 0)
        monkeypatch.setattr(config, "DRIVER_PAIR_LIMIT", 0)

    base = " ".join(f"tokenword{j}" for j in range(60))
    corpus_texts = [f"{base} corpus doc {i} extra {i * 7} {i * 13}"
                    for i in range(50)]
    corpus = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                       "text": pa.array(corpus_texts)})
    new_texts = (
        [corpus_texts[i].replace("tokenword7 ", "changed7 ")
         for i in range(5)]                                   # near-dups
        + [f"different content {i} " + " ".join(
            f"other{i}w{j}" for j in range(30)) for i in range(5)]  # fresh
        + [""])                                               # zero-shingle
    new = pa.table({"doc_id": pa.array(range(100, 111), pa.int64()),
                    "text": pa.array(new_texts)})

    idx = str(tmp_path / "mh")
    build_minhash_index(rd.from_arrow(corpus).repartition(3),
                        "text", "doc_id", idx)
    out = near_dedup_against_index(rd.from_arrow(new).repartition(2),
                                   "text", "doc_id", idx)
    got = sorted(r["doc_id"] for r in out.take_all())
    assert got == [105, 106, 107, 108, 109, 110]

    # append one of the fresh docs to the index → it now drops its twin
    build_content = pa.table({"doc_id": pa.array([60], pa.int64()),
                              "text": pa.array([new_texts[5]])})
    build_minhash_index(rd.from_arrow(build_content), "text", "doc_id", idx)
    got2 = sorted(r["doc_id"] for r in near_dedup_against_index(
        rd.from_arrow(new), "text", "doc_id", idx).take_all())
    assert 105 not in got2 and 106 in got2

    with pytest.raises(ValueError, match="parameters"):
        build_minhash_index(rd.from_arrow(corpus), "text", "doc_id", idx,
                            num_perm=64)


@pytest.mark.parametrize("force_distributed", [False, True])
def test_near_dedup_embedding_index(ray_session, tmp_path, monkeypatch,
                                    force_distributed):
    """Persisted hyperplane-LSH vector index: exact-cosine verification
    drops scaled copies (cos=1), keeps fresh vectors and zero-norm rows,
    appends extend — on both the broadcast/driver and distributed paths."""
    import numpy as np
    import ray.data as rd

    from data_quality_framework_ray import config
    from data_quality_framework_ray.pipelines.incremental import (
        build_embedding_index,
        near_dedup_embedding_against_index,
    )

    if force_distributed:
        monkeypatch.setattr(config, "MEMBERSHIP_BROADCAST_LIMIT", 0)
        monkeypatch.setattr(config, "DRIVER_PAIR_LIMIT", 0)

    rng = np.random.default_rng(9)
    corpus_v = rng.standard_normal((80, 16)).astype(np.float32)
    lt = pa.list_(pa.float32())
    corpus = pa.table({"vec_id": pa.array(range(80), pa.int64()),
                       "embedding": pa.array([list(v) for v in corpus_v],
                                             type=lt)})
    new_v = np.concatenate([corpus_v[:10] * 1.001,
                            rng.standard_normal((10, 16)).astype(np.float32),
                            np.zeros((1, 16), dtype=np.float32)])
    new = pa.table({"vec_id": pa.array(range(100, 121), pa.int64()),
                    "embedding": pa.array([list(v) for v in new_v],
                                          type=lt)})
    idx = str(tmp_path / "emb")
    build_embedding_index(rd.from_arrow(corpus).repartition(3),
                          "embedding", "vec_id", idx)
    out = near_dedup_embedding_against_index(
        rd.from_arrow(new).repartition(2), "embedding", "vec_id", idx)
    got = sorted(r["vec_id"] for r in out.take_all())
    # 100-109 are scaled corpus copies (dropped); 110-119 fresh; 120 is the
    # zero vector (cosine undefined → never flagged, passes through)
    assert got == list(range(110, 121))

    build_embedding_index(rd.from_arrow(pa.table(
        {"vec_id": pa.array([200], pa.int64()),
         "embedding": pa.array([list(new_v[10])], type=lt)})),
        "embedding", "vec_id", idx)
    got2 = sorted(r["vec_id"] for r in near_dedup_embedding_against_index(
        rd.from_arrow(new), "embedding", "vec_id", idx).take_all())
    assert 110 not in got2 and 111 in got2

    with pytest.raises(ValueError, match="parameters"):
        build_embedding_index(rd.from_arrow(corpus), "embedding", "vec_id",
                              idx, n_planes=4)


def test_minhash_incremental_vs_exact_all_tiers(ray_session):
    """The oracled query's signature verify must agree with the EXACT
    cross-split Jaccard restatement at every driver tier — including sf0.1,
    which contains a pair at J≈0.80 right on the threshold (fixed data +
    fixed seed make the agreement deterministic once observed)."""
    import os

    import duckdb

    import __ray_entry__ as entrymod

    sql = entrymod.oracle_sql()["dedup_minhash_incremental"]
    for sf in ("0.001", "0.01"):
        d = f"/root/testdata/sf{sf}"
        if not os.path.isdir(d):
            pytest.skip(f"{d} missing")
        got = entrymod.queries()["dedup_minhash_incremental"](d)
        con = duckdb.connect()
        con.sql("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
        want = [r[0] for r in con.sql(sql).fetchall()]
        assert got["doc_id"].to_pylist() == want, sf


def test_empty_new_and_empty_corpus(ray_session, tmp_path):
    import ray.data as rd

    from data_quality_framework_ray.pipelines.incremental import (
        build_content_index,
        dedup_against_index,
    )

    corpus, new, _ = _corpus_and_new()
    idx = str(tmp_path / "idx")
    build_content_index(rd.from_arrow(corpus), ["text"], idx)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    assert dedup_against_index(rd.from_arrow(empty), ["text"], "doc_id",
                               idx).take_all() == []
    # empty corpus: index of an empty dataset → everything survives dedup
    # (build creates the dir even when no files are written; index_size=0
    # short-circuits before any read)
    idx2 = str(tmp_path / "idx2")
    build_content_index(rd.from_arrow(empty), ["text"], idx2)
    out = dedup_against_index(rd.from_arrow(corpus), ["text"], "doc_id",
                              idx2)
    assert len(out.take_all()) == 100
